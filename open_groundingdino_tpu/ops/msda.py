"""Multi-scale deformable attention core op, TPU-native.

This replaces the reference's hand-written CUDA extension
(models/GroundingDINO/ops/src/cuda/ms_deform_im2col_cuda.cuh) and its
pure-PyTorch grid_sample fallback (models/GroundingDINO/ms_deform_attn.py:94-134).

Semantics: for every (batch, query, head), sample the per-level value feature
maps at `num_levels * num_points` predicted locations with bilinear
interpolation (align_corners=False, zero padding — exactly
F.grid_sample(mode='bilinear', padding_mode='zeros') on grids `2*loc-1`)
and reduce with softmaxed attention weights.

Two device implementations:
  * `ms_deform_attn_xla`   — a single fused XLA gather (take_along_axis) over
    the level-concatenated value tensor.  Fully differentiable via autodiff
    (the VJP's scatter-add plays the role of the CUDA backward's atomicAdd).
    This is the correctness reference and the fallback on CPU.
  * `ms_deform_attn_pallas` (ops/msda_pallas.py) — a Pallas kernel that keeps
    each level's value tile in VMEM and streams query blocks.

Spatial shapes are a *static* python tuple — the bucketed static-shape
discipline of the framework makes that free, and it is what lets XLA tile
the gather.
"""
from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp

Shapes = Tuple[Tuple[int, int], ...]


def _corner_indices_and_weights(
    sampling_locations: jnp.ndarray,  # (B, Q, H, L, P, 2) in [0, 1]
    spatial_shapes: Shapes,
):
    """Compute flattened gather indices and bilinear weights for all four
    corners of every sampling point.

    Returns:
      idx: (B, Q, H, L, P, 4) int32 indices into the level-concatenated
           spatial axis (each level offset by its start).
      w:   (B, Q, H, L, P, 4) float32 bilinear weights, zeroed for corners
           that fall outside the level's map (grid_sample zero-padding).
    """
    num_levels = len(spatial_shapes)
    assert sampling_locations.shape[3] == num_levels

    level_starts = []
    s = 0
    for (h, w_) in spatial_shapes:
        level_starts.append(s)
        s += h * w_

    idx_levels = []
    w_levels = []
    for lvl, (H, W) in enumerate(spatial_shapes):
        loc = sampling_locations[:, :, :, lvl]  # (B, Q, Hh, P, 2)
        px = loc[..., 0] * W - 0.5
        py = loc[..., 1] * H - 0.5
        x0 = jnp.floor(px)
        y0 = jnp.floor(py)
        fx = px - x0
        fy = py - y0

        corner_w = jnp.stack(
            [
                (1.0 - fx) * (1.0 - fy),  # (x0, y0)
                fx * (1.0 - fy),          # (x1, y0)
                (1.0 - fx) * fy,          # (x0, y1)
                fx * fy,                  # (x1, y1)
            ],
            axis=-1,
        )
        x0i = x0.astype(jnp.int32)
        y0i = y0.astype(jnp.int32)
        xs = jnp.stack([x0i, x0i + 1, x0i, x0i + 1], axis=-1)
        ys = jnp.stack([y0i, y0i, y0i + 1, y0i + 1], axis=-1)

        valid = (xs >= 0) & (xs <= W - 1) & (ys >= 0) & (ys <= H - 1)
        corner_w = jnp.where(valid, corner_w, 0.0)
        xs = jnp.clip(xs, 0, W - 1)
        ys = jnp.clip(ys, 0, H - 1)
        idx = level_starts[lvl] + ys * W + xs

        idx_levels.append(idx)
        w_levels.append(corner_w)

    return jnp.stack(idx_levels, axis=3), jnp.stack(w_levels, axis=3)


def ms_deform_attn_xla(
    value: jnp.ndarray,                # (B, L, H, D)  padded positions pre-zeroed
    spatial_shapes: Shapes,            # static ((h1,w1), ...), sum(h*w) == L
    sampling_locations: jnp.ndarray,   # (B, Q, H, NL, P, 2)
    attention_weights: jnp.ndarray,    # (B, Q, H, NL, P)
) -> jnp.ndarray:                      # (B, Q, H*D)
    B, L, H, D = value.shape
    _, Q, _, NL, P, _ = sampling_locations.shape
    assert sum(h * w for h, w in spatial_shapes) == L

    idx, bweights = _corner_indices_and_weights(
        sampling_locations.astype(jnp.float32), spatial_shapes
    )
    # combine bilinear weight with attention weight: (B, Q, H, NL, P, 4)
    w = bweights * attention_weights.astype(jnp.float32)[..., None]

    # Scan over the NL*P*4 "taps" instead of one giant gather: each step
    # gathers (B, H, Q, D) and accumulates the weighted contribution.  This
    # keeps live memory at O(B*H*Q*D) — the monolithic gather materializes
    # (B, H, Q, NL*P*4, D), which is ~5 GB at encoder scale (Q = L ~ 20k)
    # and OOMs a v5e chip.
    K = NL * P * 4
    # (B, Q, H, NL, P, 4) -> (K, B, H, Q)
    idx_t = jnp.transpose(idx, (3, 4, 5, 0, 2, 1)).reshape(K, B, H, Q)
    w_t = jnp.transpose(w, (3, 4, 5, 0, 2, 1)).reshape(K, B, H, Q)

    value_bh = jnp.transpose(value, (0, 2, 1, 3))  # (B, H, L, D)

    def tap(acc, tap_inputs):
        tap_idx, tap_w = tap_inputs  # (B, H, Q), (B, H, Q)
        g = jnp.take_along_axis(
            value_bh, tap_idx[..., None], axis=2
        )  # (B, H, Q, D)
        return acc + g * tap_w[..., None].astype(g.dtype), None

    out0 = jnp.zeros((B, H, Q, D), value.dtype)
    out, _ = jax.lax.scan(tap, out0, (idx_t, w_t))
    return jnp.transpose(out, (0, 2, 1, 3)).reshape(B, Q, H * D)


def ms_deform_attn(
    value: jnp.ndarray,
    spatial_shapes: Shapes,
    sampling_locations: jnp.ndarray,
    attention_weights: jnp.ndarray,
    impl: str = "auto",
) -> jnp.ndarray:
    """Dispatching front-end. impl: 'xla' | 'pallas' | 'auto'."""
    if impl == "auto":
        try:
            impl = "pallas" if jax.devices()[0].platform == "tpu" else "xla"
        except Exception:
            impl = "xla"
    if impl == "pallas":
        from . import msda_pallas

        return msda_pallas.ms_deform_attn_pallas(
            value, spatial_shapes, sampling_locations, attention_weights
        )
    return ms_deform_attn_xla(
        value, spatial_shapes, sampling_locations, attention_weights
    )
