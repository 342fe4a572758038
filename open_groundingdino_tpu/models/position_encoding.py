"""Sine position embeddings as pure JAX functions.

Reproduces the numerics of the reference's
models/GroundingDINO/backbone/position_encoding.py:78-131
(PositionEmbeddingSineHW with separate H/W temperatures, normalize=True) and
models/GroundingDINO/utils.py:24-53,204-230 (get_sine_pos_embed,
gen_sineembed_for_position), but NHWC / batch-first and functional.
"""
from __future__ import annotations

import math

import jax.numpy as jnp


def position_embedding_sine_hw(
    pad_mask: jnp.ndarray,
    num_pos_feats: int = 128,
    temperature_h: float = 20.0,
    temperature_w: float = 20.0,
    scale: float = 2 * math.pi,
) -> jnp.ndarray:
    """Sine embedding from the padding mask.

    Args:
      pad_mask: (B, H, W) bool, True on *padded* pixels.
    Returns:
      (B, H, W, 2*num_pos_feats) float32, channel-last (reference returns
      NCHW; we are NHWC throughout).
    """
    not_mask = (~pad_mask).astype(jnp.float32)
    y_embed = jnp.cumsum(not_mask, axis=1)
    x_embed = jnp.cumsum(not_mask, axis=2)

    eps = 1e-6
    y_embed = y_embed / (y_embed[:, -1:, :] + eps) * scale
    x_embed = x_embed / (x_embed[:, :, -1:] + eps) * scale

    dim_i = jnp.arange(num_pos_feats, dtype=jnp.float32)
    dim_tx = temperature_w ** (2 * jnp.floor(dim_i / 2) / num_pos_feats)
    dim_ty = temperature_h ** (2 * jnp.floor(dim_i / 2) / num_pos_feats)

    pos_x = x_embed[..., None] / dim_tx
    pos_y = y_embed[..., None] / dim_ty
    # interleave sin on even channels / cos on odd channels
    pos_x = jnp.stack([jnp.sin(pos_x[..., 0::2]), jnp.cos(pos_x[..., 1::2])], axis=-1)
    pos_x = pos_x.reshape(*pos_x.shape[:-2], -1)
    pos_y = jnp.stack([jnp.sin(pos_y[..., 0::2]), jnp.cos(pos_y[..., 1::2])], axis=-1)
    pos_y = pos_y.reshape(*pos_y.shape[:-2], -1)
    return jnp.concatenate([pos_y, pos_x], axis=-1)


def get_sine_pos_embed(
    pos: jnp.ndarray,
    num_pos_feats: int = 128,
    temperature: float = 10000.0,
    exchange_xy: bool = True,
) -> jnp.ndarray:
    """Per-coordinate sine embedding; pos: (..., n) -> (..., n*num_pos_feats).

    Mirrors reference models/GroundingDINO/utils.py:24-53 (used for text
    position ids and decoder query positions).
    """
    scale = 2 * math.pi
    dim_i = jnp.arange(num_pos_feats, dtype=jnp.float32)
    dim_t = temperature ** (2 * jnp.floor(dim_i / 2) / num_pos_feats)

    def sine(x):  # x: (..., 1)
        sin_x = x * scale / dim_t
        out = jnp.stack([jnp.sin(sin_x[..., 0::2]), jnp.cos(sin_x[..., 1::2])], axis=-1)
        return out.reshape(*out.shape[:-2], -1)

    parts = [sine(pos[..., i : i + 1]) for i in range(pos.shape[-1])]
    if exchange_xy and len(parts) >= 2:
        parts[0], parts[1] = parts[1], parts[0]
    return jnp.concatenate(parts, axis=-1)


def gen_sineembed_for_position(pos: jnp.ndarray) -> jnp.ndarray:
    """Decoder query sine embedding from (B, Q, 2|4) normalized boxes.

    Output ordering (y, x[, w, h]) with 128 feats each, matching reference
    models/GroundingDINO/utils.py:204-230 (batch-first here).
    """
    scale = 2 * math.pi
    dim_i = jnp.arange(128, dtype=jnp.float32)
    dim_t = 10000.0 ** (2 * jnp.floor(dim_i / 2) / 128)

    def embed(coord):  # (B, Q) -> (B, Q, 128)
        v = coord[..., None] * scale / dim_t
        out = jnp.stack([jnp.sin(v[..., 0::2]), jnp.cos(v[..., 1::2])], axis=-1)
        return out.reshape(*out.shape[:-2], -1)

    pos_x = embed(pos[..., 0])
    pos_y = embed(pos[..., 1])
    if pos.shape[-1] == 2:
        return jnp.concatenate([pos_y, pos_x], axis=-1)
    if pos.shape[-1] == 4:
        pos_w = embed(pos[..., 2])
        pos_h = embed(pos[..., 3])
        return jnp.concatenate([pos_y, pos_x, pos_w, pos_h], axis=-1)
    raise ValueError(f"pos last dim must be 2 or 4, got {pos.shape[-1]}")
