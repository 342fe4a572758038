"""Banded-separable Pallas kernel for multi-scale deformable attention.

The sweep kernel (ops/msda_pallas.py) builds a full scatter matrix S over
every swept source position with VPU relu-distance taps — profiling pins
encoder MSDA at ~1.1us per tile-iteration, dominated by the S-build VPU
chain (the (tile, 128) relu build per row-tap), with the MXU mostly idle
(its dot runs at N=32 of 128 output lanes).

This kernel splits the bilinear interpolation into its separable factors:

  per (query block, head, level, point):
    x-interp (MXU):  C[(y, d), q] = sum_x  V[y, d, x] * relu(1 - |px_q - x|)
                     — ONE dot (BAND*D, W) @ (W, 128q): K = W, N = 128 full
    y-interp (VPU):  acc[d, q]   += relu(1 - |py_q - y|) * wxe_q * a_q * C[(y, d), q]
                     — BAND tiny (D, 128) FMAs

over a dynamic y-BAND of rows around the point's block-min row (scalar
prefetch, fori over ceil(span/BAND) sub-bands — one iteration in the common
case).  The x relu build is (W, 128) per point — ~8x fewer VPU ops than the
sweep's per-position build — and the dot runs all 128 output lanes.

Numerics: exactly grid_sample(align_corners=False, padding_mode='zeros'):
x zero-padding via the rowtap edge-collapse (interior points keep
fractional px with weight 1; edge points collapse to the single valid
integer column with the partial weight, folded into wxe); y zero-padding
falls out of the relu — out-of-image rows are never materialized, and a
valid row's relu weight equals its bilinear factor by construction.

Value layout: per-level (BH, H_l*D, W_l) arrays (y-major, D on sublanes
within the row, x on lanes) so a y-band is a dynamic SUBLANE slice —
supported and cheap, unlike dynamic lane slices.  models/deformable.py
emits the projection directly in this layout (einsum), so no extra
relayout of the 40 MB value tensor.

Replaces: reference CUDA op ms_deform_im2col_cuda.cuh:238-299 (forward).

Backward (ms_deform_col2im_cuda.cuh equivalent): same banded structure,
env knob MSDA_BANDED_BWD.  Per (point, y-band window):
  C  = A @ Sx,  Cp = A @ Sx'   — the forward dot + the d/dpx derivative
                                 dot (Sx' = -sign(px - x) on the support)
  gV[band] += B @ Sx^T          — B[(y,d), q] = wy*wa*g (the y-interp
                                 factors applied to the upstream grad);
                                 accumulated into the (H*D, W) grad ref at
                                 a dynamic sublane offset, across the
                                 sequential q-block grid axis
  g_wa/g_px/g_py               — (D, 128) FMA accumulations over band rows
                                 then one cross-sublane d-reduction each.
Gradients w.r.t. locations/attention chain through _banded_prep via
jax.vjp (the edge-collapse/clip prep is plain differentiable XLA).
"""
from __future__ import annotations

import functools
import os
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .msda_pallas import (
    QBLOCK,
    _batch_partitioned,
    _round_up,
)

Shapes = Tuple[Tuple[int, int], ...]

BAND = int(os.environ.get("MSDA_BAND", "4"))


def _banded_prep(locs_t, attn_t, spatial_shapes, xy=False):
    """Kernel-layout separable factors.

    locs_t: (BH, NL, P, 2, Q) f32 — or, with xy=True, the XY-MAJOR form
    (BH, 2, NL, P, Q) (MSDA_XY path: no minor-2 dim anywhere, so XLA never
    materializes the T(2,128)-tiled layouts); attn_t: (BH, NL, P, Q) f32.
    Returns (px, py, wa): each (BH, NL*P, Q) f32 —
      px: continuous x position within the row (edge-collapsed, clipped),
      py: continuous y position (clipped to [-1, H] so ranges stay sane;
          the relu-vs-materialized-rows handles zero padding exactly),
      wa: edge-x partial weight * attention weight (0 kills the point).
    """
    px_parts, py_parts, wa_parts = [], [], []
    for lvl, (Hl, Wl) in enumerate(spatial_shapes):
        if xy:
            pxc = locs_t[:, 0, lvl] * Wl - 0.5     # (BH, P, Q)
            pyc = locs_t[:, 1, lvl] * Hl - 0.5
        else:
            pxc = locs_t[:, lvl, :, 0, :] * Wl - 0.5   # (BH, P, Q)
            pyc = locs_t[:, lvl, :, 1, :] * Hl - 0.5
        a = attn_t[:, lvl]
        x0 = jnp.floor(pxc)
        fx = pxc - x0
        x0i = x0.astype(jnp.int32)

        v0 = (x0i >= 0) & (x0i <= Wl - 1)
        v1 = (x0i + 1 >= 0) & (x0i + 1 <= Wl - 1)
        interior = v0 & v1
        edge_px = jnp.where(v0, x0, x0 + 1.0)
        edge_wx = jnp.where(v0, 1.0 - fx, jnp.where(v1, fx, 0.0))
        px_x = jnp.where(interior, pxc, edge_px)
        wx = jnp.where(interior, 1.0, edge_wx)
        px_x = jnp.clip(px_x, 0.0, float(max(Wl - 1, 0)))

        py = jnp.clip(pyc, -1.0, float(Hl))
        px_parts.append(px_x)
        py_parts.append(py)
        wa_parts.append(wx * a)
    BH, Q = locs_t.shape[0], locs_t.shape[-1]
    px = jnp.stack(px_parts, axis=1).reshape(BH, -1, Q)
    py = jnp.stack(py_parts, axis=1).reshape(BH, -1, Q)
    wa = jnp.stack(wa_parts, axis=1).reshape(BH, -1, Q)
    return px, py, wa


def _band_ranges(locs_t, spatial_shapes, nqb, bands, xy=False):
    """Per (bh, block, level, point) [ylo, n_iters]: ylo = block-min first
    tap row (clipped to a valid band start), n_iters = ceil(rowspan/BAND_l).
    -> (BH, nqb*NL*P*2) int32 scalar-prefetch."""
    BH = locs_t.shape[0]
    Q = locs_t.shape[-1]
    Q_pad = nqb * QBLOCK
    parts = []
    for lvl, (Hl, Wl) in enumerate(spatial_shapes):
        band = bands[lvl]
        pyc = (locs_t[:, 1, lvl] if xy
               else locs_t[:, lvl, :, 1, :]) * Hl - 0.5   # (BH, P, Q)
        y0 = jnp.floor(pyc).astype(jnp.int32)
        y_lo = jnp.clip(y0, 0, Hl - 1)
        y_hi = jnp.clip(y0 + 1, 0, Hl - 1)
        if Q_pad != Q:
            pad = ((0, 0), (0, 0), (0, Q_pad - Q))
            y_lo = jnp.pad(y_lo, pad, constant_values=Hl - 1)
            y_hi = jnp.pad(y_hi, pad)
        blk = lambda t, red: red(
            t.reshape(BH, -1, nqb, QBLOCK), axis=3
        )  # (BH, P, nqb)
        lo = blk(y_lo, jnp.min)
        hi = blk(y_hi, jnp.max)
        # non-overlapping band windows [lo + i*band, +band) cover [lo, hi];
        # the value arrays carry band-1 zero pad rows so the last window
        # never reads out of bounds (and pad rows contribute exact zeros)
        n_it = (hi - lo) // band + 1
        parts.append(jnp.stack([lo, n_it], axis=-1))   # (BH, P, nqb, 2)
    ranges = jnp.stack(parts, axis=1)                  # (BH, NL, P, nqb, 2)
    ranges = jnp.moveaxis(ranges, 3, 1)                # (BH, nqb, NL, P, 2)
    return ranges.reshape(BH, -1).astype(jnp.int32)


def _msda_banded_kernel(
    ranges_ref,   # scalar prefetch (BH*nqb*NL*P*2,) int32
    *refs,
    spatial_shapes: Shapes,
    bands: Tuple[int, ...],
    n_points: int,
):
    """Grid (BH, NQB).  refs = [value_l x NL, px, py, wa, out, acc]."""
    NL = len(spatial_shapes)
    values = refs[:NL]
    px_ref, py_ref, wa_ref, out_ref, acc_ref = refs[NL : NL + 5]
    D = acc_ref.shape[0]
    P = n_points
    bh = pl.program_id(0)
    qb = pl.program_id(1)
    nqb = pl.num_programs(1)

    acc_ref[:] = jnp.zeros(acc_ref.shape, jnp.float32)
    rbase = (bh * nqb + qb) * NL * P * 2

    for lvl, (Hl, Wl) in enumerate(spatial_shapes):
        band = bands[lvl]
        vref = values[lvl]
        bf16 = vref.dtype == jnp.bfloat16
        # x-lane index (W_l sublanes, 128 lanes is wrong orientation —
        # the relu matrix is (W, 128q): source column on sublanes)
        colpos = jax.lax.broadcasted_iota(
            jnp.int32, (Wl, QBLOCK), 0
        ).astype(jnp.float32)

        for p in range(P):
            t = lvl * P + p
            px = px_ref[0, t : t + 1, :]      # (1, 128)
            py = py_ref[0, t : t + 1, :]
            wa = wa_ref[0, t : t + 1, :]
            # Sx[(x), q] = relu(1 - |px_q - x|): zero except the point's
            # two x-corners (or one, edge-collapsed)
            sx = jnp.maximum(1.0 - jnp.abs(px - colpos), 0.0)  # (W, 128)
            sx_mm = sx.astype(jnp.bfloat16) if bf16 else sx

            ylo = ranges_ref[rbase + 2 * t]
            n_it = ranges_ref[rbase + 2 * t + 1]

            def band_body(bi, _, ylo=ylo, band=band, vref=vref,
                          sx_mm=sx_mm, py=py, wa=wa):
                ybase = ylo + bi * band
                A = vref[0, pl.ds(ybase * D, band * D), :]  # (band*D, W)
                C = jax.lax.dot_general(
                    A, sx_mm,
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    precision=(jax.lax.Precision.DEFAULT if bf16
                               else jax.lax.Precision.HIGHEST),
                    preferred_element_type=jnp.float32,
                )  # (band*D, 128)
                yb = ybase.astype(jnp.float32)
                # per-row RMW — the measured-27.761 form (the SSA-chunked
                # variant measured neutral 2026-08-18; pruned round 4)
                for r in range(band):
                    wy = jnp.maximum(
                        1.0 - jnp.abs(py - (yb + r)), 0.0
                    ) * wa                                 # (1, 128)
                    acc_ref[:] = acc_ref[:] + wy * C[r * D : (r + 1) * D, :]
                return 0

            jax.lax.fori_loop(0, n_it, band_body, 0)

    out_ref[0] = acc_ref[:].astype(out_ref.dtype)


def _banded_call(values, px, py, wa, ranges, spatial_shapes, n_points,
                 band):
    """values: list of (BH, H_l*D, W_l); px/py/wa: (BH, NL*P, Q_pad);
    ranges flat int32 -> out (BH, D, Q_pad) (D-major: consumers absorb the
    orientation into their einsums)."""
    NL = len(spatial_shapes)
    BH = px.shape[0]
    Q_pad = px.shape[-1]
    nqb = Q_pad // QBLOCK
    bands = tuple(min(band, h) for h, w in spatial_shapes)
    # values arrive with band-1 zero pad rows per level
    D = values[0].shape[1] // (spatial_shapes[0][0] + bands[0] - 1)

    kernel = functools.partial(
        _msda_banded_kernel, spatial_shapes=spatial_shapes, bands=bands,
        n_points=n_points,
    )
    interpret = jax.devices()[0].platform != "tpu"
    in_specs = [
        pl.BlockSpec((1, (h + b - 1) * D, w), (lambda bh, qb, r: (bh, 0, 0)),
                     memory_space=pltpu.VMEM)
        for (h, w), b in zip(spatial_shapes, bands)
    ] + [
        pl.BlockSpec((1, px.shape[1], QBLOCK),
                     lambda bh, qb, r: (bh, 0, qb), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, px.shape[1], QBLOCK),
                     lambda bh, qb, r: (bh, 0, qb), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, px.shape[1], QBLOCK),
                     lambda bh, qb, r: (bh, 0, qb), memory_space=pltpu.VMEM),
    ]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(BH, nqb),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, D, QBLOCK), lambda bh, qb, r: (bh, 0, qb),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((D, QBLOCK), jnp.float32)],
    )
    return pl.pallas_call(
        kernel,
        interpret=interpret,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((BH, D, Q_pad), values[0].dtype),
    )(ranges, *values, px, py, wa)


@functools.lru_cache(maxsize=None)
def _banded_partitioned(spatial_shapes: Shapes, n_points: int, band: int):
    NL = len(spatial_shapes)

    def impl(*args):
        values = list(args[:NL])
        px, py, wa, ranges2d = args[NL : NL + 4]
        return _banded_call(values, px, py, wa, ranges2d.reshape(-1),
                            spatial_shapes, n_points, band)

    factors = [("b", f"l{i}", f"w{i}") for i in range(NL)] + [
        ("b", "n", "q"), ("b", "n", "q"), ("b", "n", "q"), ("b", "r"),
        ("b", "d", "q"),
    ]
    return _batch_partitioned(impl, NL + 4, 1, factors)


def _band_ranges_mp(locs_t, spatial_shapes, nqb, bands, xy=False):
    """Union-over-points ranges for the multi-point kernel: per (bh, block,
    level) [ylo, n_iters] over ALL P points' tap rows ->
    (BH, nqb*NL*2) int32 scalar-prefetch."""
    BH = locs_t.shape[0]
    Q = locs_t.shape[-1]
    Q_pad = nqb * QBLOCK
    parts = []
    for lvl, (Hl, Wl) in enumerate(spatial_shapes):
        band = bands[lvl]
        pyc = (locs_t[:, 1, lvl] if xy
               else locs_t[:, lvl, :, 1, :]) * Hl - 0.5   # (BH, P, Q)
        y0 = jnp.floor(pyc).astype(jnp.int32)
        y_lo = jnp.clip(y0, 0, Hl - 1)
        y_hi = jnp.clip(y0 + 1, 0, Hl - 1)
        if Q_pad != Q:
            pad = ((0, 0), (0, 0), (0, Q_pad - Q))
            y_lo = jnp.pad(y_lo, pad, constant_values=Hl - 1)
            y_hi = jnp.pad(y_hi, pad)
        lo = jnp.min(y_lo.reshape(BH, -1, nqb, QBLOCK), axis=(1, 3))
        hi = jnp.max(y_hi.reshape(BH, -1, nqb, QBLOCK), axis=(1, 3))
        n_it = (hi - lo) // band + 1                  # (BH, nqb)
        parts.append(jnp.stack([lo, n_it], axis=-1))  # (BH, nqb, 2)
    ranges = jnp.stack(parts, axis=2)                 # (BH, nqb, NL, 2)
    return ranges.reshape(BH, -1).astype(jnp.int32)


def _msda_banded_mp_kernel(
    ranges_ref,   # scalar prefetch (BH*nqb*NL*2,) int32
    *refs,
    spatial_shapes: Shapes,
    bands: Tuple[int, ...],
    n_points: int,
):
    """Multi-point grid (BH, NQB).  refs = [value_l x NL, px, py, wa, out,
    acc4].  One union-band sweep per (level, block): the P points' relu
    matrices stand side by side on lanes (built per point from the
    original (NL*P, 128) tap rows and lane-concatenated in-register — no
    XLA-side relayout), so each window costs ONE (band*D, W) @ (W, P*128)
    dot and band (D, P*128) FMAs; the P point slices fold with P-1 static
    128-lane adds at the end."""
    NL = len(spatial_shapes)
    values = refs[:NL]
    px_ref, py_ref, wa_ref, out_ref, acc_ref = refs[NL : NL + 5]
    D = out_ref.shape[1]
    P = n_points
    PQ = P * QBLOCK
    bh = pl.program_id(0)
    qb = pl.program_id(1)
    nqb = pl.num_programs(1)

    acc_ref[:] = jnp.zeros(acc_ref.shape, jnp.float32)
    rbase = (bh * nqb + qb) * NL * 2

    for lvl, (Hl, Wl) in enumerate(spatial_shapes):
        band = bands[lvl]
        vref = values[lvl]
        bf16 = vref.dtype == jnp.bfloat16
        colpos = jax.lax.broadcasted_iota(
            jnp.int32, (Wl, QBLOCK), 0
        ).astype(jnp.float32)

        ts = [lvl * P + p for p in range(P)]
        sx = jnp.concatenate(
            [
                jnp.maximum(
                    1.0 - jnp.abs(px_ref[0, t : t + 1, :] - colpos), 0.0
                )
                for t in ts
            ],
            axis=1,
        )                                     # (W, P*128)
        py = jnp.concatenate(
            [py_ref[0, t : t + 1, :] for t in ts], axis=1
        )                                     # (1, P*128)
        wa = jnp.concatenate(
            [wa_ref[0, t : t + 1, :] for t in ts], axis=1
        )
        sx_mm = sx.astype(jnp.bfloat16) if bf16 else sx

        ylo = ranges_ref[rbase + 2 * lvl]
        n_it = ranges_ref[rbase + 2 * lvl + 1]

        def band_body(bi, _, ylo=ylo, band=band, vref=vref,
                      sx_mm=sx_mm, py=py, wa=wa):
            ybase = ylo + bi * band
            A = vref[0, pl.ds(ybase * D, band * D), :]  # (band*D, W)
            C = jax.lax.dot_general(
                A, sx_mm,
                dimension_numbers=(((1,), (0,)), ((), ())),
                precision=(jax.lax.Precision.DEFAULT if bf16
                           else jax.lax.Precision.HIGHEST),
                preferred_element_type=jnp.float32,
            )  # (band*D, P*128)
            yb = ybase.astype(jnp.float32)
            # per-row RMW — the measured-27.761 form (SSA-chunked variant
            # measured neutral; colpos-as-VMEM-operand MP_V2 measured -1.2%
            # e2e — register-generated iotas beat VMEM operand fetches in
            # per-step-bound kernels.  Both pruned round 4; BENCH_NOTES
            # keeps the rows)
            for r in range(band):
                wy = jnp.maximum(
                    1.0 - jnp.abs(py - (yb + r)), 0.0
                ) * wa                                 # (1, P*128)
                acc_ref[:] = acc_ref[:] + wy * C[r * D : (r + 1) * D, :]
            return 0

        jax.lax.fori_loop(0, n_it, band_body, 0)

    acc = acc_ref[:]
    out = acc[:, 0:QBLOCK]
    for p in range(1, P):
        out = out + acc[:, p * QBLOCK : (p + 1) * QBLOCK]
    out_ref[0] = out.astype(out_ref.dtype)


def _banded_mp_call(values, px, py, wa, ranges, spatial_shapes,
                    n_points, band):
    """values: per-level (BH, (H_l+band-1)*D, W_l); px/py/wa in the
    ORIGINAL (BH, NL*P, Q_pad) layout -> out (BH, D, Q_pad)."""
    NL = len(spatial_shapes)
    BH = px.shape[0]
    P = n_points
    PQ = P * QBLOCK
    nqb = px.shape[-1] // QBLOCK
    bands = tuple(min(band, h) for h, w in spatial_shapes)
    D = values[0].shape[1] // (spatial_shapes[0][0] + bands[0] - 1)

    kernel = functools.partial(
        _msda_banded_mp_kernel,
        spatial_shapes=spatial_shapes, bands=bands,
        n_points=n_points,
    )
    interpret = jax.devices()[0].platform != "tpu"
    in_specs = [
        pl.BlockSpec((1, (h + b - 1) * D, w), (lambda bh, qb, r: (bh, 0, 0)),
                     memory_space=pltpu.VMEM)
        for (h, w), b in zip(spatial_shapes, bands)
    ]
    in_specs += [
        pl.BlockSpec((1, NL * P, QBLOCK), lambda bh, qb, r: (bh, 0, qb),
                     memory_space=pltpu.VMEM)
        for _ in range(3)
    ]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(BH, nqb),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, D, QBLOCK), lambda bh, qb, r: (bh, 0, qb),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((D, PQ), jnp.float32)],
    )
    return pl.pallas_call(
        kernel,
        interpret=interpret,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            (BH, D, nqb * QBLOCK), values[0].dtype
        ),
    )(ranges, *values, px, py, wa)


@functools.lru_cache(maxsize=None)
def _banded_mp_partitioned(spatial_shapes: Shapes, n_points: int,
                           band: int):
    NL = len(spatial_shapes)

    def impl(*args):
        values = list(args[:NL])
        px, py, wa, ranges2d = args[NL : NL + 4]
        return _banded_mp_call(values, px, py, wa, ranges2d.reshape(-1),
                               spatial_shapes, n_points, band)

    factors = [("b", f"l{i}", f"w{i}") for i in range(NL)] + [
        ("b", "n", "q"), ("b", "n", "q"), ("b", "n", "q"), ("b", "r"),
        ("b", "d", "q"),
    ]
    return _batch_partitioned(impl, NL + 4, 1, factors)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 4, 5, 6))
def _banded_core(
    values,                 # tuple of (BH, H_l*D, W_l) per level
    spatial_shapes: Shapes,
    locs_t: jnp.ndarray,    # (BH, NL, P, 2, Q) f32 (xy: (BH, 2, NL, P, Q))
    attn_t: jnp.ndarray,    # (BH, NL, P, Q) f32
    n_points: int,
    band: int,
    xy: bool = False,
) -> jnp.ndarray:           # (BH, D, Q)
    BH = locs_t.shape[0]
    Q = locs_t.shape[-1]
    bands = tuple(min(band, h) for h, w in spatial_shapes)
    D = values[0].shape[1] // spatial_shapes[0][0]
    px, py, wa = _banded_prep(
        locs_t.astype(jnp.float32), attn_t.astype(jnp.float32),
        spatial_shapes, xy=xy,
    )
    Q_pad = _round_up(Q, QBLOCK)
    if Q_pad != Q:
        pad = ((0, 0), (0, 0), (0, Q_pad - Q))
        # pad px in-range / wa zero so padded queries sample row 0 cheaply
        px = jnp.pad(px, pad)
        py = jnp.pad(py, pad)
        wa = jnp.pad(wa, pad)
    # band-1 zero tail rows per level: the last band window of a point near
    # the bottom edge reads them and they contribute exact zeros
    values = tuple(
        jnp.pad(v, ((0, 0), (0, (b - 1) * D), (0, 0)))
        for v, b in zip(values, bands)
    )
    NL = len(spatial_shapes)
    if bool(int(os.environ.get("MSDA_BANDED_MP", "1"))):
        ranges = _band_ranges_mp(
            locs_t.astype(jnp.float32), spatial_shapes, Q_pad // QBLOCK,
            bands, xy=xy,
        )
        out = _banded_mp_partitioned(tuple(spatial_shapes), n_points,
                                     band)(
            *values, px, py, wa, ranges
        )
        return out[:, :, :Q]
    ranges = _band_ranges(
        locs_t.astype(jnp.float32), spatial_shapes, Q_pad // QBLOCK, bands,
        xy=xy,
    )
    out = _banded_partitioned(tuple(spatial_shapes), n_points, band)(
        *values, px, py, wa, ranges
    )
    return out[:, :, :Q]


def _bwd_debug_skip() -> str:
    """MSDA_BWD_DEBUG_SKIP in {"", "gv", "cterms"}: attribution-only knob
    that deletes one half of the backward kernel's work ("gv" keeps only
    the loc/attn-grad C/Cp passes; "cterms" keeps only the grad_value
    pass).  WRONG MATH — microbench attribution only, never a default."""
    return os.environ.get("MSDA_BWD_DEBUG_SKIP", "")


def _msda_banded_bwd_kernel(
    ranges_ref,   # scalar prefetch (BH*nqb*NL*P*2,) int32
    *refs,
    spatial_shapes: Shapes,
    bands: Tuple[int, ...],
    n_points: int,
):
    """Grid (BH, NQB).  refs = [value_l x NL, px, py, wa, g, gv_l x NL,
    gpx, gpy, gwa].  gv blocks are revisited across the sequential qb axis
    (zeroed at qb==0, read-modify-write after).

    Measured round-3/4 dead ends pruned from this kernel (BENCH_NOTES keeps
    the rows): colpos-as-VMEM-operand (BWD_V2, mb 145 vs 96 ms/layer),
    lane-concat [sx|sxp] C+Cp merged dot (BWD_CCP, -2.6% device bwd), and
    the union-range gV hybrid (BWD_GV_MP, -7.6% train) — per-point ranges
    beat every union variant because backward work scales with the sweep
    range (dot K-width, B build, RMW bytes)."""
    NL = len(spatial_shapes)
    values = refs[:NL]
    px_ref, py_ref, wa_ref, g_ref = refs[NL : NL + 4]
    gv = refs[NL + 4 : NL + 4 + NL]
    gpx_ref, gpy_ref, gwa_ref = refs[NL + 4 + NL :]
    D = g_ref.shape[1]
    P = n_points
    bh = pl.program_id(0)
    qb = pl.program_id(1)
    nqb = pl.num_programs(1)

    @pl.when(qb == 0)
    def _zero():
        for r in gv:
            r[:] = jnp.zeros(r.shape, r.dtype)

    g = g_ref[0].astype(jnp.float32)            # (D, 128)
    rbase = (bh * nqb + qb) * NL * P * 2
    skip = _bwd_debug_skip()

    for lvl, (Hl, Wl) in enumerate(spatial_shapes):
        band = bands[lvl]
        vref = values[lvl]
        gvref = gv[lvl]
        bf16 = vref.dtype == jnp.bfloat16
        colpos = jax.lax.broadcasted_iota(
            jnp.int32, (Wl, QBLOCK), 0
        ).astype(jnp.float32)

        for p in range(P):
            t = lvl * P + p
            px = px_ref[0, t : t + 1, :]        # (1, 128)
            py = py_ref[0, t : t + 1, :]
            wa = wa_ref[0, t : t + 1, :]
            dxc = px - colpos                   # (W, 128)
            adx = jnp.abs(dxc)
            sx = jnp.maximum(1.0 - adx, 0.0)
            # d sx / d px on the open support (measure-zero kinks dropped,
            # matching the CUDA op's subgradient choice)
            sxp = jnp.where(adx < 1.0, -jnp.sign(dxc), 0.0)
            if bf16:
                sx_mm = sx.astype(jnp.bfloat16)
                sxp_mm = sxp.astype(jnp.bfloat16)
            else:
                sx_mm, sxp_mm = sx, sxp
            prec = (jax.lax.Precision.DEFAULT if bf16
                    else jax.lax.Precision.HIGHEST)

            ylo = ranges_ref[rbase + 2 * t]
            n_it = ranges_ref[rbase + 2 * t + 1]

            def band_body(bi, carry, ylo=ylo, band=band, vref=vref,
                          gvref=gvref, sx_mm=sx_mm, sxp_mm=sxp_mm,
                          py=py, wa=wa, g=g, prec=prec, D=D):
                s_wa, s_px, s_py = carry
                ybase = ylo + bi * band
                A = vref[0, pl.ds(ybase * D, band * D), :]  # (band*D, W)
                yb = ybase.astype(jnp.float32)
                if skip != "cterms":
                    C = jax.lax.dot_general(
                        A, sx_mm,
                        dimension_numbers=(((1,), (0,)), ((), ())),
                        precision=prec,
                        preferred_element_type=jnp.float32,
                    )                                   # (band*D, 128)
                    Cp = jax.lax.dot_general(
                        A, sxp_mm,
                        dimension_numbers=(((1,), (0,)), ((), ())),
                        precision=prec,
                        preferred_element_type=jnp.float32,
                    )
                b_rows = []
                for r in range(band):
                    dy = py - (yb + r)                      # (1, 128)
                    ady = jnp.abs(dy)
                    wy = jnp.maximum(1.0 - ady, 0.0)
                    if skip != "cterms":
                        dwy = jnp.where(ady < 1.0, -jnp.sign(dy), 0.0)
                        Cr = C[r * D : (r + 1) * D, :]
                        Cpr = Cp[r * D : (r + 1) * D, :]
                        s_wa = s_wa + wy * Cr
                        s_px = s_px + wy * Cpr
                        s_py = s_py + dwy * Cr
                    if skip != "gv":
                        b_rows.append((wy * wa) * g)        # (D, 128)
                if skip != "gv":
                    B = jnp.concatenate(b_rows, axis=0)     # (band*D, 128)
                    if gvref.dtype == jnp.bfloat16:
                        B = B.astype(jnp.bfloat16)
                    gvc = jax.lax.dot_general(
                        B, sx_mm, dimension_numbers=(((1,), (1,)), ((), ())),
                        precision=prec, preferred_element_type=jnp.float32,
                    )                                       # (band*D, W)
                    sl = pl.ds(ybase * D, band * D)
                    gvref[0, sl, :] = (
                        gvref[0, sl, :] + gvc.astype(gvref.dtype)
                    )
                return (s_wa, s_px, s_py)

            zero = jnp.zeros((D, QBLOCK), jnp.float32)
            s_wa, s_px, s_py = jax.lax.fori_loop(
                0, n_it, band_body, (zero, zero, zero)
            )
            gwa_ref[0, t : t + 1, :] = jnp.sum(
                g * s_wa, axis=0, keepdims=True
            )
            gpx_ref[0, t : t + 1, :] = wa * jnp.sum(
                g * s_px, axis=0, keepdims=True
            )
            gpy_ref[0, t : t + 1, :] = wa * jnp.sum(
                g * s_py, axis=0, keepdims=True
            )


def _banded_bwd_call(values, px, py, wa, g, ranges, spatial_shapes,
                     n_points, band):
    """values: per-level (BH, (H_l+band-1)*D, W_l) (zero tail rows);
    px/py/wa: (BH, NL*P, Q_pad); g: (BH, D, Q_pad) ->
    (gv per level f32, gpx, gpy, gwa)."""
    NL = len(spatial_shapes)
    BH = px.shape[0]
    Q_pad = px.shape[-1]
    nqb = Q_pad // QBLOCK
    bands = tuple(min(band, h) for h, w in spatial_shapes)
    D = g.shape[1]
    NP = px.shape[1]

    kernel = functools.partial(
        _msda_banded_bwd_kernel, spatial_shapes=spatial_shapes,
        bands=bands, n_points=n_points,
    )
    interpret = jax.devices()[0].platform != "tpu"
    # block heights follow the caller's padding (band-1 zero tail rows)
    val_specs = [
        pl.BlockSpec((1, v.shape[1], w), (lambda bh, qb, r: (bh, 0, 0)),
                     memory_space=pltpu.VMEM)
        for v, (h, w) in zip(values, spatial_shapes)
    ]
    tap_spec = lambda: pl.BlockSpec(
        (1, NP, QBLOCK), lambda bh, qb, r: (bh, 0, qb),
        memory_space=pltpu.VMEM,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(BH, nqb),
        in_specs=val_specs + [
            tap_spec(), tap_spec(), tap_spec(),
            pl.BlockSpec((1, D, QBLOCK), lambda bh, qb, r: (bh, 0, qb),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=val_specs + [tap_spec(), tap_spec(), tap_spec()],
    )
    # MSDA_BWD_GV_BF16 (default ON, measured 2026-08-20): accumulate the
    # grad_value buffers in bf16 when values are bf16 — halves the gv RMW
    # bytes and runs the B@sx dot single-pass.  Two same-session train
    # A/Bs: 0.4974 vs 0.5018 and 0.4979 vs 0.4999 s/step; fixed-seed
    # 40-step loss curves identical for 3 steps then chaotically diverging
    # with the same dynamics, both finite (the documented reassociation
    # behavior).  The e2e path cast gv to value dtype afterwards anyway
    # (_banded_bwd_native), so only the ACCUMULATION precision changed.
    gv_bf16 = (
        bool(int(os.environ.get("MSDA_BWD_GV_BF16", "1")))
        and values[0].dtype == jnp.bfloat16
    )
    out_shape = [
        jax.ShapeDtypeStruct(
            ((BH,) + v.shape[1:]),
            jnp.bfloat16 if gv_bf16 else jnp.float32,
        )
        for v in values
    ] + [
        jax.ShapeDtypeStruct((BH, NP, Q_pad), jnp.float32)
        for _ in range(3)
    ]
    return pl.pallas_call(
        kernel,
        interpret=interpret,
        grid_spec=grid_spec,
        out_shape=out_shape,
    )(ranges, *values, px, py, wa, g)


@functools.lru_cache(maxsize=None)
def _banded_bwd_partitioned(spatial_shapes: Shapes, n_points: int,
                            band: int):
    NL = len(spatial_shapes)

    def impl(*args):
        values = list(args[:NL])
        px, py, wa, g, ranges2d = args[NL : NL + 5]
        return tuple(
            _banded_bwd_call(values, px, py, wa, g, ranges2d.reshape(-1),
                             spatial_shapes, n_points, band)
        )

    in_factors = [("b", f"l{i}", f"w{i}") for i in range(NL)] + [
        ("b", "n", "q"), ("b", "n", "q"), ("b", "n", "q"), ("b", "d", "q"),
        ("b", "r"),
    ]
    out_factors = [("b", f"l{i}", f"w{i}") for i in range(NL)] + [
        ("b", "n", "q"), ("b", "n", "q"), ("b", "n", "q"),
    ]
    return _batch_partitioned(impl, NL + 5, NL + 3,
                              in_factors + out_factors)


def _banded_fwd(values, spatial_shapes, locs_t, attn_t, n_points, band,
                xy=False):
    out = _banded_core(values, spatial_shapes, locs_t, attn_t, n_points,
                       band, xy)
    return out, (values, locs_t, attn_t)


def _banded_bwd(spatial_shapes, n_points, band, xy, residuals, g):
    """Backward dispatch: native banded backward kernel (default), or the
    corner-sweep backward via layout conversion (MSDA_BANDED_BWD=0).
    g: (BH, D, Q)."""
    if bool(int(os.environ.get("MSDA_BANDED_BWD", "1"))):
        return _banded_bwd_native(spatial_shapes, n_points, band,
                                  residuals, g, xy=xy)
    if xy:
        # legacy corner backward expects (BH, NL, P, 2, Q); pay the
        # transpose only on this fallback path
        values, locs_t, attn_t = residuals
        locs_l = jnp.moveaxis(locs_t, 1, 3)
        gvs, g_locs, g_attn = _banded_bwd_corner(
            spatial_shapes, n_points, (values, locs_l, attn_t), g)
        return gvs, jnp.moveaxis(g_locs, 3, 1), g_attn
    return _banded_bwd_corner(spatial_shapes, n_points, residuals, g)


def _banded_bwd_native(spatial_shapes, n_points, band, residuals, g,
                       xy=False):
    values, locs_t, attn_t = residuals
    BH = locs_t.shape[0]
    Q = locs_t.shape[-1]
    # The backward's cost profile differs from the forward's (cross-sublane
    # gw/gpx reductions scale with band height; the fwd's per-window fixed
    # costs shrink with it), so the band is independently overridable:
    # MSDA_BAND_BWD=0 (default) follows the forward band.
    band = int(os.environ.get("MSDA_BAND_BWD", "0")) or band
    bands = tuple(min(band, h) for h, w in spatial_shapes)
    (px, py, wa), prep_vjp = jax.vjp(
        lambda l, a: _banded_prep(l, a, spatial_shapes, xy=xy),
        locs_t.astype(jnp.float32), attn_t.astype(jnp.float32),
    )
    Q_pad = _round_up(Q, QBLOCK)
    if Q_pad != Q:
        pad = ((0, 0), (0, 0), (0, Q_pad - Q))
        px = jnp.pad(px, pad)
        py = jnp.pad(py, pad)
        wa = jnp.pad(wa, pad)
        g = jnp.pad(g, ((0, 0), (0, 0), (0, Q_pad - Q)))
    values_p = tuple(
        jnp.pad(v, ((0, 0), (0, (b - 1) * (v.shape[1] // h)), (0, 0)))
        for v, b, (h, _w) in zip(values, bands, spatial_shapes)
    )
    NL = len(spatial_shapes)
    # The backward always runs per-point ranges: every multi-point/union
    # variant measured slower (MP_BWD 13.4 s vreg spill, restructured
    # -10%, GV_MP hybrid -7.6% — BENCH_NOTES round-3 trail; pruned round 4)
    # because backward work scales with the sweep range.
    ranges = _band_ranges(
        locs_t.astype(jnp.float32), spatial_shapes, Q_pad // QBLOCK,
        bands, xy=xy,
    )
    outs = _banded_bwd_partitioned(
        tuple(spatial_shapes), n_points, band
    )(
        *values_p, px, py, wa, g, ranges
    )
    gvs = tuple(
        o[:, : v.shape[1], :].astype(v.dtype)
        for o, v in zip(outs[:NL], values)
    )
    gpx, gpy, gwa = (o[:, :, :Q] for o in outs[NL:])
    g_locs, g_attn = prep_vjp((gpx, gpy, gwa))
    return gvs, g_locs.astype(locs_t.dtype), g_attn.astype(attn_t.dtype)


def _banded_bwd_corner(spatial_shapes, n_points, residuals, g):
    """Corner-sweep backward via layout conversion (ops/msda_pallas._bwd_t):
    per-level banded values -> (BH, D, L) raster, proven corner backward,
    grads converted back."""
    from .msda_pallas import _bwd_t

    values, locs_t, attn_t = residuals
    BH = locs_t.shape[0]
    D = g.shape[1]
    # per-level (BH, H*D, W) -> (BH, D, H*W) raster concat
    vs = []
    for v, (h, w) in zip(values, spatial_shapes):
        vs.append(
            jnp.transpose(v.reshape(BH, h, D, w), (0, 2, 1, 3)).reshape(
                BH, D, h * w
            )
        )
    value_t = jnp.concatenate(vs, axis=-1)
    g_q = jnp.transpose(g, (0, 2, 1))  # (BH, Q, D)
    gv_t, g_locs, g_attn = _bwd_t(
        tuple(spatial_shapes), "raster", (value_t, locs_t, attn_t), g_q
    )
    # raster grad -> per-level banded layouts
    gvs = []
    start = 0
    for v, (h, w) in zip(values, spatial_shapes):
        gl = gv_t[:, :, start : start + h * w].reshape(BH, D, h, w)
        gvs.append(
            jnp.transpose(gl, (0, 2, 1, 3)).reshape(BH, h * D, w).astype(
                v.dtype
            )
        )
        start += h * w
    return tuple(gvs), g_locs, g_attn


_banded_core.defvjp(_banded_fwd, _banded_bwd)


def ms_deform_attn_banded(values, spatial_shapes, locs_t, attn_t, n_points,
                          band=None, xy=False):
    """Public entry; band = y-rows per sub-band window (None -> MSDA_BAND
    env, default 4).  Encoder and decoder callers pick different bands
    (measured: encoder prefers 8, sorted decoder prefers 4).  xy=True:
    locs_t arrives XY-MAJOR (BH, 2, NL, P, Q) — see _banded_prep."""
    return _banded_core(values, spatial_shapes, locs_t, attn_t, n_points,
                        int(band or BAND), xy)


def ms_deform_attn_banded_sorted(values, spatial_shapes, locs_t, attn_t,
                                 n_points, band=None, xy=False):
    """Decoder-style entry (Q != number of tokens): queries are spatially
    unsorted, so a 128-query block's y-band would span the whole map.  Sort
    queries by the (y, x) center of their first finest-level point — any
    permutation is exact for independent queries — run the banded kernel,
    un-sort the outputs.  Differentiable (plain take_along_axis around the
    custom-VJP core)."""
    H0, W0 = spatial_shapes[0]
    if xy:
        y = jnp.clip(locs_t[:, 1, 0, 0, :].astype(jnp.float32), -0.1, 1.1)
        x = jnp.clip(locs_t[:, 0, 0, 0, :].astype(jnp.float32), -0.1, 1.1)
    else:
        y = jnp.clip(locs_t[:, 0, 0, 1, :].astype(jnp.float32), -0.1, 1.1)
        x = jnp.clip(locs_t[:, 0, 0, 0, :].astype(jnp.float32), -0.1, 1.1)
    key = y * H0 * (W0 + 2) + x * W0
    order = jnp.argsort(key, axis=1)                     # (BH, Q)
    inv = jnp.argsort(order, axis=1)
    locs_s = jnp.take_along_axis(
        locs_t, order[:, None, None, None, :], axis=4
    )
    attn_s = jnp.take_along_axis(attn_t, order[:, None, None, :], axis=3)
    out = ms_deform_attn_banded(values, spatial_shapes, locs_s, attn_s,
                                n_points, band, xy)      # (BH, D, Q)
    return jnp.take_along_axis(out, inv[:, None, :], axis=2)
