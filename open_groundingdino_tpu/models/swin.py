"""Swin Transformer backbone in Flax (NHWC, TPU-native).

Capabilities and numerics match the reference backbone
(models/GroundingDINO/backbone/swin_transformer.py): patch-embed conv 4x4,
[2,2,6,2]-style stages with (shifted-)window attention + relative position
bias, PatchMerging between stages, per-out-stage LayerNorm, window padding
when H/W aren't multiples of the window.

TPU-first divergences:
  * channel-last end to end; window partitioning is pure reshape/transpose,
  * all shapes are static (bucketed inputs), so the shifted-window attention
    mask is built *in numpy at trace time* and baked into the program as a
    constant — zero device work, vs the reference rebuilding it on-GPU every
    forward (reference swin_transformer.py:416-443),
  * stochastic depth / dropout default to 0 (detection configs use 0);
    gradient checkpointing is applied per-block via jax.checkpoint when
    `use_checkpoint` is set.

Swin variants (T/B/L) as in reference swin_transformer.py:762-791.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from .layers import LayerNorm


SWIN_VARIANTS = {
    # nano variant for CI/tests only (no published checkpoint)
    "swin_nano_test": dict(embed_dim=8, depths=(1, 1, 1, 1), num_heads=(1, 2, 2, 4), window_size=4),
    "swin_T_224_1k": dict(embed_dim=96, depths=(2, 2, 6, 2), num_heads=(3, 6, 12, 24), window_size=7),
    "swin_B_224_22k": dict(embed_dim=128, depths=(2, 2, 18, 2), num_heads=(4, 8, 16, 32), window_size=7),
    "swin_B_384_22k": dict(embed_dim=128, depths=(2, 2, 18, 2), num_heads=(4, 8, 16, 32), window_size=12),
    "swin_L_224_22k": dict(embed_dim=192, depths=(2, 2, 18, 2), num_heads=(6, 12, 24, 48), window_size=7),
    "swin_L_384_22k": dict(embed_dim=192, depths=(2, 2, 18, 2), num_heads=(6, 12, 24, 48), window_size=12),
}


@dataclass(frozen=True)
class SwinConfig:
    embed_dim: int = 96
    depths: Tuple[int, ...] = (2, 2, 6, 2)
    num_heads: Tuple[int, ...] = (3, 6, 12, 24)
    window_size: int = 7
    patch_size: int = 4
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    out_indices: Tuple[int, ...] = (1, 2, 3)
    use_checkpoint: bool = False

    @property
    def num_features(self) -> Tuple[int, ...]:
        return tuple(self.embed_dim * (2 ** i) for i in range(len(self.depths)))

    @classmethod
    def from_name(cls, name: str, out_indices=(1, 2, 3), use_checkpoint=False) -> "SwinConfig":
        return cls(out_indices=tuple(out_indices), use_checkpoint=use_checkpoint,
                   **{k: (tuple(v) if isinstance(v, (list, tuple)) else v)
                      for k, v in SWIN_VARIANTS[name].items()})


def _relative_position_index(ws: int) -> np.ndarray:
    """(ws*ws, ws*ws) indices into the (2*ws-1)^2 relative-bias table."""
    coords = np.stack(np.meshgrid(np.arange(ws), np.arange(ws), indexing="ij"))
    flat = coords.reshape(2, -1)
    rel = flat[:, :, None] - flat[:, None, :]
    rel = rel.transpose(1, 2, 0)
    rel[:, :, 0] += ws - 1
    rel[:, :, 1] += ws - 1
    rel[:, :, 0] *= 2 * ws - 1
    return rel.sum(-1)


def _shift_attn_mask(Hp: int, Wp: int, ws: int, shift: int) -> np.ndarray:
    """Static (nW, ws*ws, ws*ws) additive mask (0 / -100) for SW-MSA."""
    img = np.zeros((Hp, Wp), np.int32)
    cnt = 0
    for hs in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
        for wslice in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
            img[hs, wslice] = cnt
            cnt += 1
    win = img.reshape(Hp // ws, ws, Wp // ws, ws).transpose(0, 2, 1, 3).reshape(-1, ws * ws)
    diff = win[:, None, :] - win[:, :, None]
    return np.where(diff != 0, -100.0, 0.0).astype(np.float32)


def window_partition(x: jnp.ndarray, ws: int) -> jnp.ndarray:
    """(B, H, W, C) -> (B*nW, ws*ws, C); H, W divisible by ws."""
    B, H, W, C = x.shape
    x = x.reshape(B, H // ws, ws, W // ws, ws, C)
    return jnp.transpose(x, (0, 1, 3, 2, 4, 5)).reshape(-1, ws * ws, C)


def window_reverse(wins: jnp.ndarray, ws: int, B: int, H: int, W: int) -> jnp.ndarray:
    x = wins.reshape(B, H // ws, W // ws, ws, ws, -1)
    return jnp.transpose(x, (0, 1, 3, 2, 4, 5)).reshape(B, H, W, -1)


class WindowAttention(nn.Module):
    dim: int
    num_heads: int
    window_size: int
    qkv_bias: bool = True

    @nn.compact
    def __call__(self, x, attn_mask=None):
        """x: (B_, N, C) windows; attn_mask: (nW, N, N) static or None."""
        B_, N, C = x.shape
        H = self.num_heads
        D = C // H
        ws = self.window_size

        # One fused qkv parameter (checkpoint layout) but three separate
        # head-split einsums: materializing the single (B_, N, 3, H, D) qkv
        # array forced a full layout copy (~1.2 ms/stage at bench shapes)
        # before the attention matmuls — per-slice einsums let XLA fold the
        # head split into each matmul's output layout.
        from .deformable import _DenseParams

        assert self.qkv_bias, "fused-qkv param layout assumes qkv_bias=True"
        wqkv, bqkv = _DenseParams(C, 3 * C, name="qkv")()
        wqkv = wqkv.astype(x.dtype).reshape(C, 3, H, D)
        bqkv = bqkv.astype(x.dtype).reshape(3, H, D)

        # Measured round-3 dead ends pruned from this module (BENCH_NOTES
        # keeps the rows): the fused Pallas window-attention kernel
        # (SWIN_ATTN_PALLAS, -12% e2e), the batch-major bhnd qkv layout
        # (SWIN_BHND, neutral), and the fused Pallas Swin MLP
        # (MLP_PALLAS_SWIN, part of the MLP_PALLAS dead-end family).
        import os as _os

        headloop = bool(int(_os.environ.get("SWIN_HEADLOOP", "1")))
        scale = jnp.asarray(D ** -0.5, x.dtype)
        if headloop:
            # SWIN_HEADLOOP=1: never materialize a 4-D (B_, N, H, D) head
            # split.  q/k/v are plain (B_, N, C) dense outputs (one dot each,
            # natural row-major layout) and each head is a static lane slice
            # fed to a 3-D batched dot — the 4-D forms profiled as ~0.42 ms
            # relayout copies x ~26 per forward (bf16[5104,49,3,32]
            # {0,3,2,1}->{1,3,2,0}).  Same contraction, same numerics.
            qkv_flat = [
                jnp.einsum("bnc,cf->bnf", x, wqkv[:, i].reshape(C, C))
                + bqkv[i].reshape(C)
                for i in range(3)
            ]
            table = self.param(
                "relative_position_bias_table",
                nn.initializers.truncated_normal(0.02),
                ((2 * ws - 1) * (2 * ws - 1), H),
            )
            rel_idx = _relative_position_index(ws).reshape(-1)
            bias = table[rel_idx].reshape(N, N, H)  # (N, N, H)
            outs = []
            for h in range(H):
                qh, kh, vh = (
                    jax.lax.slice_in_dim(t, h * D, (h + 1) * D, axis=2)
                    for t in qkv_flat
                )
                attn = jnp.einsum("bnd,bmd->bnm", qh * scale, kh)
                attn = attn + bias[:, :, h][None].astype(attn.dtype)
                if attn_mask is not None:
                    nW = attn_mask.shape[0]
                    attn = attn.reshape(B_ // nW, nW, N, N) + jnp.asarray(
                        attn_mask, attn.dtype
                    )[None]
                    attn = attn.reshape(B_, N, N)
                attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1)
                outs.append(jnp.einsum("bnm,bmd->bnd", attn.astype(x.dtype), vh))
            out = jnp.concatenate(outs, axis=-1)
            return nn.Dense(C, name="proj")(out)
        def proj(i):
            return jnp.einsum("bnc,chd->bnhd", x, wqkv[:, i]) + bqkv[i]

        q, k, v = proj(0), proj(1), proj(2)
        attn = jnp.einsum("bnhd,bmhd->bhnm", q * scale, k)

        table = self.param(
            "relative_position_bias_table",
            nn.initializers.truncated_normal(0.02),
            ((2 * ws - 1) * (2 * ws - 1), H),
        )
        rel_idx = _relative_position_index(ws).reshape(-1)
        bias = table[rel_idx].reshape(N, N, H)
        attn = attn + jnp.transpose(bias, (2, 0, 1))[None].astype(attn.dtype)

        if attn_mask is not None:
            nW = attn_mask.shape[0]
            attn = attn.reshape(B_ // nW, nW, H, N, N) + jnp.asarray(
                attn_mask, attn.dtype
            )[None, :, None]
            attn = attn.reshape(B_, H, N, N)

        attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(x.dtype)
        out = jnp.einsum("bhnm,bmhd->bnhd", attn, v).reshape(B_, N, C)
        return nn.Dense(C, name="proj")(out)


class SwinBlock(nn.Module):
    dim: int
    num_heads: int
    window_size: int
    shift_size: int
    mlp_ratio: float
    qkv_bias: bool
    H: int = 0  # static spatial extent (set per stage; bucketed shapes)
    W: int = 0

    @nn.compact
    def __call__(self, x):
        """x: (B, H*W, C)."""
        B, L, C = x.shape
        H, W = self.H, self.W
        ws = self.window_size
        shortcut = x
        x = LayerNorm(epsilon=1e-5, name="norm1")(x).reshape(B, H, W, C)

        pad_b = (ws - H % ws) % ws
        pad_r = (ws - W % ws) % ws
        if pad_b or pad_r:
            x = jnp.pad(x, ((0, 0), (0, pad_b), (0, pad_r), (0, 0)))
        Hp, Wp = H + pad_b, W + pad_r

        if self.shift_size > 0:
            x = jnp.roll(x, (-self.shift_size, -self.shift_size), axis=(1, 2))
            mask = _shift_attn_mask(Hp, Wp, ws, self.shift_size)
        else:
            mask = None

        wins = window_partition(x, ws)
        wins = WindowAttention(
            self.dim, self.num_heads, ws, self.qkv_bias, name="attn"
        )(wins, mask)
        x = window_reverse(wins, ws, B, Hp, Wp)

        if self.shift_size > 0:
            x = jnp.roll(x, (self.shift_size, self.shift_size), axis=(1, 2))
        if pad_b or pad_r:
            x = x[:, :H, :W]
        x = shortcut + x.reshape(B, L, C)

        h = LayerNorm(epsilon=1e-5, name="norm2")(x)
        h = nn.Dense(int(C * self.mlp_ratio), name="fc1")(h)
        h = nn.gelu(h, approximate=False)
        h = nn.Dense(C, name="fc2")(h)
        return x + h


class PatchMerging(nn.Module):
    dim: int

    @nn.compact
    def __call__(self, x, H: int, W: int):
        B, L, C = x.shape
        x = x.reshape(B, H, W, C)
        if H % 2 or W % 2:
            x = jnp.pad(x, ((0, 0), (0, H % 2), (0, W % 2), (0, 0)))
        x0 = x[:, 0::2, 0::2]
        x1 = x[:, 1::2, 0::2]
        x2 = x[:, 0::2, 1::2]
        x3 = x[:, 1::2, 1::2]
        x = jnp.concatenate([x0, x1, x2, x3], axis=-1).reshape(B, -1, 4 * C)
        x = LayerNorm(epsilon=1e-5, name="norm")(x)
        return nn.Dense(2 * C, use_bias=False, name="reduction")(x)


class SwinTransformer(nn.Module):
    """Returns a list of NHWC feature maps for cfg.out_indices."""

    cfg: SwinConfig

    @nn.compact
    def __call__(self, images: jnp.ndarray):
        """images: (B, H, W, 3), H/W multiples of patch_size (bucketed)."""
        c = self.cfg
        B, H, W, _ = images.shape
        ps = c.patch_size

        x = nn.Conv(
            c.embed_dim, (ps, ps), strides=(ps, ps), padding="VALID", name="patch_embed"
        )(images)
        Wh, Ww = x.shape[1], x.shape[2]
        x = x.reshape(B, Wh * Ww, c.embed_dim)
        x = LayerNorm(epsilon=1e-5, name="patch_norm")(x)

        outs = []
        block_cls = nn.remat(SwinBlock) if c.use_checkpoint else SwinBlock
        for i, depth in enumerate(c.depths):
            dim = c.num_features[i]
            for b in range(depth):
                x = block_cls(
                    dim=dim,
                    num_heads=c.num_heads[i],
                    window_size=c.window_size,
                    shift_size=0 if b % 2 == 0 else c.window_size // 2,
                    mlp_ratio=c.mlp_ratio,
                    qkv_bias=c.qkv_bias,
                    H=Wh,
                    W=Ww,
                    name=f"layer_{i}_block_{b}",
                )(x)
            if i in c.out_indices:
                y = LayerNorm(epsilon=1e-5, name=f"out_norm_{i}")(x)
                outs.append(y.reshape(B, Wh, Ww, dim))
            if i < len(c.depths) - 1:
                x = PatchMerging(dim, name=f"downsample_{i}")(x, Wh, Ww)
                Wh, Ww = (Wh + 1) // 2, (Ww + 1) // 2
        return outs
