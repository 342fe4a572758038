"""Multi-scale deformable attention module (projections around the core op).

Semantics of reference models/GroundingDINO/ms_deform_attn.py:137-363
(mmcv MultiScaleDeformableAttention): value projection with padding-mask
zeroing, per-query sampling offsets + softmaxed attention weights, sampling
grid construction from 2-d or 4-d reference points, output projection.
The gather itself is ops/msda (Pallas kernel on TPU, XLA gather fallback).

Includes the module's distinctive initialization: sampling_offsets starts at
zero weight with a rotated-grid bias (reference ms_deform_attn.py:198-221) —
required both for train-from-scratch parity and because published
checkpoints are fine-tuned from it.
"""
from __future__ import annotations

import math
from typing import Tuple

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from ..ops.msda import ms_deform_attn


def _sampling_offsets_bias_init(num_heads: int, num_levels: int, num_points: int):
    thetas = np.arange(num_heads, dtype=np.float32) * (2.0 * math.pi / num_heads)
    grid = np.stack([np.cos(thetas), np.sin(thetas)], -1)  # (H, 2)
    grid = grid / np.abs(grid).max(-1, keepdims=True)
    grid = np.tile(grid.reshape(num_heads, 1, 1, 2), (1, num_levels, num_points, 1))
    for i in range(num_points):
        grid[:, :, i, :] *= i + 1
    flat = grid.reshape(-1)

    def init(key, shape, dtype=jnp.float32):
        assert shape == flat.shape
        return jnp.asarray(flat, dtype)

    return init


class MSDeformAttn(nn.Module):
    embed_dim: int = 256
    num_heads: int = 8
    num_levels: int = 4
    num_points: int = 4
    impl: str = "auto"  # ops/msda dispatch

    @nn.compact
    def __call__(
        self,
        query: jnp.ndarray,              # (B, Q, C) — query (+pos already added)
        value: jnp.ndarray,              # (B, L, C) — flattened multi-level features
        reference_points: jnp.ndarray,   # (B, Q, num_levels, 2|4) normalized
        spatial_shapes: Tuple[Tuple[int, int], ...],  # static
        key_padding_mask: jnp.ndarray = None,  # (B, L) bool, True = pad
    ) -> jnp.ndarray:
        B, Q, C = query.shape
        L = value.shape[1]
        H, NL, P = self.num_heads, self.num_levels, self.num_points
        D = C // H
        assert sum(h * w for h, w in spatial_shapes) == L

        v = nn.Dense(C, name="value_proj")(value)
        if key_padding_mask is not None:
            v = jnp.where(key_padding_mask[..., None], 0.0, v)
        v = v.reshape(B, L, H, D)

        offsets = nn.Dense(
            H * NL * P * 2,
            kernel_init=nn.initializers.zeros,
            bias_init=_sampling_offsets_bias_init(H, NL, P),
            name="sampling_offsets",
        )(query).reshape(B, Q, H, NL, P, 2)

        attn = nn.Dense(
            H * NL * P,
            kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.zeros,
            name="attention_weights",
        )(query).reshape(B, Q, H, NL * P)
        attn = nn.softmax(attn.astype(jnp.float32), axis=-1).astype(query.dtype)
        attn = attn.reshape(B, Q, H, NL, P)

        if reference_points.shape[-1] == 2:
            # normalize offsets by each level's (W, H)
            wh = jnp.asarray(
                [[w, h] for h, w in spatial_shapes], jnp.float32
            )  # (NL, 2) as (W, H)
            locs = (
                reference_points[:, :, None, :, None, :]
                + offsets / wh[None, None, None, :, None, :]
            )
        elif reference_points.shape[-1] == 4:
            locs = (
                reference_points[:, :, None, :, None, :2]
                + offsets / P * reference_points[:, :, None, :, None, 2:] * 0.5
            )
        else:
            raise ValueError("reference_points last dim must be 2 or 4")

        out = ms_deform_attn(v, spatial_shapes, locs, attn, impl=self.impl)
        return nn.Dense(C, name="output_proj")(out)
