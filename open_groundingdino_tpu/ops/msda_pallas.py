"""Pallas TPU kernel for multi-scale deformable attention (forward).

Why a kernel: XLA's gather on this TPU sustains ~70M rows/s — the deformable
attention of one encoder layer needs ~41M bilinear-corner fetches, making the
reference-style gather formulation ~0.5 s/layer.  This kernel reaches the
VPU's shuffle throughput instead:

  * `value` is stored TRANSPOSED per (batch, head): (D, L) with the
    level-concatenated spatial axis in *lanes*,
  * a query block (128 queries) processes its 64 taps (4 levels x 4 points x
    4 bilinear corners); for each tap the kernel computes the dynamic range
    of 128-lane source tiles its indices touch and sweeps only those tiles,
  * within a tile, the fetch is a per-lane `take_along_axis` shuffle — the
    one gather form Mosaic executes at full vector throughput (sublane-axis
    gathers miscompile on this stack; see CLAUDE.md),
  * contributions are masked by tile membership and accumulated in fp32.

Exact for arbitrary sampling locations (the tile sweep covers outliers, just
more slowly); fast when sampling is local, which trained deformable
attention is.  Corner indices/weights (grid_sample align_corners=False,
zero padding) are precomputed by ops/msda._corner_indices_and_weights so the
numerics match the XLA reference bit-for-bit at fp32.

Backward: custom VJP falls back to the XLA formulation's autodiff (correct,
slower); a scatter kernel is the planned optimization.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .msda import _corner_indices_and_weights, ms_deform_attn_xla

Shapes = Tuple[Tuple[int, int], ...]

QBLOCK = 128
TILE = 128


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _msda_kernel(value_ref, idx_ref, w_ref, out_ref, *, n_taps: int, l_pad: int):
    """Grid: (BH, NQB).
    value_ref: (1, D, L_pad)   — this (b, h)'s transposed value map
    idx_ref:   (1, n_taps, QBLOCK) int32 — flat corner index per tap/query
    w_ref:     (1, n_taps, QBLOCK) f32   — combined bilinear*attention weight
    out_ref:   (1, D, QBLOCK)
    """
    D = value_ref.shape[1]
    n_tiles = l_pad // TILE

    acc0 = jnp.zeros((D, QBLOCK), jnp.float32)

    def tap_body(t, acc):
        row_idx = idx_ref[0, t, :].reshape(1, QBLOCK)      # (1, 128) int32
        row_w = w_ref[0, t, :].reshape(1, QBLOCK)          # (1, 128) f32
        live = row_w != 0.0
        # dynamic tile range for this tap (masked-out taps contribute the
        # full range of a single tile so the loop stays cheap)
        sel = jnp.where(live, row_idx, row_idx[0, 0])
        tmin = jnp.min(sel) // TILE
        tmax = jnp.max(sel) // TILE

        def tile_body(tt, acc):
            src = value_ref[0, :, pl.ds(tt * TILE, TILE)]   # (D, 128)
            local = row_idx - tt * TILE
            ok = (local >= 0) & (local < TILE)
            localc = jnp.clip(local, 0, TILE - 1)
            g = jnp.take_along_axis(
                src.astype(jnp.float32),
                jnp.broadcast_to(localc, (D, QBLOCK)),
                axis=1,
            )
            contrib = jnp.where(ok, row_w, 0.0)             # (1, 128)
            return acc + g * contrib

        return jax.lax.fori_loop(tmin, tmax + 1, tile_body, acc)

    acc = jax.lax.fori_loop(0, n_taps, tap_body, acc0)
    out_ref[0] = acc.astype(out_ref.dtype)


def _msda_pallas_fwd_impl(
    value_t: jnp.ndarray,   # (BH, D, L_pad)
    idx: jnp.ndarray,       # (BH, n_taps, Q_pad) int32
    w: jnp.ndarray,         # (BH, n_taps, Q_pad) f32
) -> jnp.ndarray:           # (BH, D, Q_pad)
    BH, D, L_pad = value_t.shape
    _, n_taps, Q_pad = idx.shape
    nqb = Q_pad // QBLOCK

    kernel = functools.partial(_msda_kernel, n_taps=n_taps, l_pad=L_pad)
    interpret = jax.devices()[0].platform != "tpu"  # CPU tests
    return pl.pallas_call(
        kernel,
        interpret=interpret,
        grid=(BH, nqb),
        in_specs=[
            pl.BlockSpec((1, D, L_pad), lambda bh, qb: (bh, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_taps, QBLOCK), lambda bh, qb: (bh, 0, qb),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_taps, QBLOCK), lambda bh, qb: (bh, 0, qb),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, D, QBLOCK), lambda bh, qb: (bh, 0, qb),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((BH, D, Q_pad), value_t.dtype),
    )(value_t, idx, w)


def _prepare(value, spatial_shapes, sampling_locations, attention_weights):
    """Compute kernel-layout corner indices/weights + transposed value."""
    B, L, H, D = value.shape
    _, Q, _, NL, P, _ = sampling_locations.shape

    idx, bw = _corner_indices_and_weights(
        sampling_locations.astype(jnp.float32), spatial_shapes
    )  # (B, Q, H, NL, P, 4)
    w = bw * attention_weights.astype(jnp.float32)[..., None]

    n_taps = NL * P * 4
    # (B, Q, H, NL, P, 4) -> (B, H, taps, Q)
    idx_k = jnp.transpose(idx, (0, 2, 3, 4, 5, 1)).reshape(B * H, n_taps, Q)
    w_k = jnp.transpose(w, (0, 2, 3, 4, 5, 1)).reshape(B * H, n_taps, Q)

    Q_pad = _round_up(Q, QBLOCK)
    if Q_pad != Q:
        idx_k = jnp.pad(idx_k, ((0, 0), (0, 0), (0, Q_pad - Q)))
        w_k = jnp.pad(w_k, ((0, 0), (0, 0), (0, Q_pad - Q)))

    L_pad = _round_up(L, TILE)
    value_t = jnp.transpose(value, (0, 2, 3, 1)).reshape(B * H, D, L)
    if L_pad != L:
        value_t = jnp.pad(value_t, ((0, 0), (0, 0), (0, L_pad - L)))
    return value_t, idx_k, w_k, Q_pad


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def ms_deform_attn_pallas(
    value: jnp.ndarray,
    spatial_shapes: Shapes,
    sampling_locations: jnp.ndarray,
    attention_weights: jnp.ndarray,
) -> jnp.ndarray:
    """Same contract as ops.msda.ms_deform_attn_xla; Pallas forward."""
    B, L, H, D = value.shape
    Q = sampling_locations.shape[1]
    value_t, idx_k, w_k, Q_pad = _prepare(
        value, spatial_shapes, sampling_locations, attention_weights
    )
    out_t = _msda_pallas_fwd_impl(value_t, idx_k, w_k)  # (BH, D, Q_pad)
    out = out_t.reshape(B, H, D, Q_pad)[:, :, :, :Q]
    return jnp.transpose(out, (0, 3, 1, 2)).reshape(B, Q, H * D)


def _fwd(value, spatial_shapes, sampling_locations, attention_weights):
    out = ms_deform_attn_pallas(
        value, spatial_shapes, sampling_locations, attention_weights
    )
    return out, (value, sampling_locations, attention_weights)


def _bwd(spatial_shapes, residuals, g):
    value, locs, attn = residuals
    # backward through the XLA reference formulation (identical math)
    _, vjp = jax.vjp(
        lambda v, l, a: ms_deform_attn_xla(v, spatial_shapes, l, a),
        value, locs, attn,
    )
    return vjp(g)


ms_deform_attn_pallas.defvjp(_fwd, _bwd)
