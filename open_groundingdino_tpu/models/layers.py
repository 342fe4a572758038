"""Shared transformer building blocks.

Includes a MultiHeadAttention with torch.nn.MultiheadAttention's packed-QKV
parameterization (so published checkpoints convert 1:1), the GLIP-style
bidirectional image<->text fusion attention with its bf16 stability clamps
(reference fuse_modules.py:99-295), the text-enhancer layer
(reference transformer_vanilla.py:72-123), and small utilities
(MLP, ContrastiveEmbed — reference models/GroundingDINO/utils.py:171-273).
"""
from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from .position_encoding import get_sine_pos_embed

NEG_INF = float("-inf")


class LayerNorm(nn.Module):
    """Drop-in `nn.LayerNorm` (same param names/shapes: scale, bias; same
    fast-variance f32 math and output promotion), with an optional fused
    residual argument: LN(x + residual) in one call.

    The Pallas LN / LN+residual kernels this class once dispatched to
    measured as e2e dead ends (26.51 / 26.01 vs 27.84 img/s — breaking
    XLA's LN+residual+elementwise fusions costs more than the standalone
    LN bandwidth win; BENCH_NOTES 2026-08-18) and were pruned in round 4."""

    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x, residual=None):
        C = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (C,))
        bias = self.param("bias", nn.initializers.zeros, (C,))
        if residual is not None:
            x = x + residual
        out_dtype = jnp.result_type(x.dtype, scale.dtype, bias.dtype)
        xf = x.astype(jnp.float32)
        mu = jnp.mean(xf, axis=-1, keepdims=True)
        m2 = jnp.mean(xf * xf, axis=-1, keepdims=True)
        var = jnp.maximum(m2 - mu * mu, 0.0)
        y = (xf - mu) * jax.lax.rsqrt(var + self.epsilon)
        y = y * scale.astype(jnp.float32) + bias.astype(jnp.float32)
        return y.astype(out_dtype)


class MultiHeadAttention(nn.Module):
    """torch.nn.MultiheadAttention-compatible MHA (packed in_proj, out_proj).

    q, k, v: (B, Tq|Tk, E).  attn_mask: additive-or-bool (B, Tq, Tk) or
    (Tq, Tk); key_padding_mask: (B, Tk) bool, True = pad.
    """

    embed_dim: int
    num_heads: int

    @nn.compact
    def __call__(self, q, k, v, attn_mask=None, key_padding_mask=None):
        E, H = self.embed_dim, self.num_heads
        D = E // H
        B, Tq, _ = q.shape
        Tk = k.shape[1]

        in_proj_w = self.param(
            "in_proj_weight", nn.initializers.xavier_uniform(), (3 * E, E)
        )
        in_proj_b = self.param("in_proj_bias", nn.initializers.zeros, (3 * E,))
        qp = q @ in_proj_w[:E].T + in_proj_b[:E]
        kp = k @ in_proj_w[E : 2 * E].T + in_proj_b[E : 2 * E]
        vp = v @ in_proj_w[2 * E :].T + in_proj_b[2 * E :]

        qp = qp.reshape(B, Tq, H, D)
        kp = kp.reshape(B, Tk, H, D)
        vp = vp.reshape(B, Tk, H, D)

        scale = jnp.asarray(D ** -0.5, q.dtype)
        logits = jnp.einsum("bqhd,bkhd->bhqk", qp * scale, kp)

        neg = jnp.asarray(-1e9, logits.dtype)
        if attn_mask is not None:
            if attn_mask.dtype == jnp.bool_:
                bias = jnp.where(attn_mask, neg, 0.0)  # True = NOT allowed (torch)
            else:
                bias = attn_mask.astype(logits.dtype)
            if bias.ndim == 2:
                bias = bias[None, None]
            else:
                bias = bias[:, None]
            logits = logits + bias
        if key_padding_mask is not None:
            logits = jnp.where(
                key_padding_mask[:, None, None, :], neg, logits
            )

        probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(q.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", probs, vp).reshape(B, Tq, E)
        return nn.Dense(E, name="out_proj")(out)


class BiMultiHeadAttention(nn.Module):
    """Bidirectional image<->text cross-attention from one logits matrix
    (reference fuse_modules.py:99-248), stability clamps included.

    impl: 'xla' keeps the literal reference formulation (materialized
    logits, global-max shift, clamps); 'pallas' streams image-token blocks
    through ops/fusion_pallas.fused_bi_attention and never materializes the
    (B, H, Nv, Nl) logits (~330 MB/layer at encoder scale).  Softmax
    shift-invariance makes the two numerically equal while the +-50000
    clamps don't bind (parity-tested); 'auto' = pallas on TPU."""

    v_dim: int
    l_dim: int
    embed_dim: int
    num_heads: int
    impl: str = "auto"

    @nn.compact
    def __call__(self, v, l, attention_mask_v=None, attention_mask_l=None):
        """v: (B, Nv, v_dim) image tokens; l: (B, Nl, l_dim) text tokens.
        attention_mask_*: (B, N*) bool, True = PAD (masked out)."""
        B, Nv, _ = v.shape
        Nl = l.shape[1]
        H = self.num_heads
        D = self.embed_dim // H
        scale = D ** -0.5

        q = nn.Dense(self.embed_dim, name="v_proj")(v) * scale
        k = nn.Dense(self.embed_dim, name="l_proj")(l)
        val_v = nn.Dense(self.embed_dim, name="values_v_proj")(v)
        val_l = nn.Dense(self.embed_dim, name="values_l_proj")(l)

        impl = self.impl
        if impl == "auto":
            try:
                impl = "pallas" if jax.devices()[0].platform == "tpu" else "xla"
            except Exception:
                impl = "xla"
        if impl == "pallas":
            from ..ops.fusion_pallas import fused_bi_attention

            # the kernel takes the projections' RAW (B, N, E) outputs and
            # slices heads as static 256-aligned lanes internally — the
            # earlier (B*H, N, D) interface cost ~0.7 ms of XLA layout
            # copies per 20k-token operand
            mk = lambda m, N: (
                m if m is not None else jnp.zeros((B, N), bool)
            )
            out_v, out_l = fused_bi_attention(
                q, k, val_v, val_l,
                mk(attention_mask_v, Nv), mk(attention_mask_l, Nl),
                num_heads=H,
            )
            out_v = nn.Dense(self.v_dim, name="out_v_proj")(
                out_v.reshape(B, Nv, self.embed_dim)
            )
            out_l = nn.Dense(self.l_dim, name="out_l_proj")(
                out_l.reshape(B, Nl, self.embed_dim)
            )
            return out_v, out_l

        q = q.reshape(B, Nv, H, D)
        k = k.reshape(B, Nl, H, D)
        val_v = val_v.reshape(B, Nv, H, D)
        val_l = val_l.reshape(B, Nl, H, D)

        logits = jnp.einsum("bvhd,blhd->bhvl", q, k)  # (B, H, Nv, Nl)
        # stable_softmax_2d + clamps (reference fuse_modules.py:181-202):
        # subtract the global max, clamp to +-50000 in both directions.
        logits = logits - jax.lax.stop_gradient(jnp.max(logits))
        logits = jnp.clip(logits, -50000.0, 50000.0)

        logits_t = jnp.swapaxes(logits, -1, -2)  # (B, H, Nl, Nv)
        logits_l = logits_t - jax.lax.stop_gradient(
            jnp.max(logits_t, axis=-1, keepdims=True)
        )
        logits_l = jnp.clip(logits_l, -50000.0, 50000.0)

        neg = jnp.asarray(-1e9, logits.dtype)
        if attention_mask_v is not None:  # mask image tokens for text->image attn
            logits_l = jnp.where(attention_mask_v[:, None, None, :], neg, logits_l)
        attn_l = jax.nn.softmax(logits_l.astype(jnp.float32), axis=-1).astype(l.dtype)

        if attention_mask_l is not None:  # mask text tokens for image->text attn
            logits = jnp.where(attention_mask_l[:, None, None, :], neg, logits)
        attn_v = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(v.dtype)

        out_v = jnp.einsum("bhvl,blhd->bvhd", attn_v, val_l).reshape(
            B, Nv, self.embed_dim
        )
        out_l = jnp.einsum("bhlv,bvhd->blhd", attn_l, val_v).reshape(
            B, Nl, self.embed_dim
        )
        out_v = nn.Dense(self.v_dim, name="out_v_proj")(out_v)
        out_l = nn.Dense(self.l_dim, name="out_l_proj")(out_l)
        return out_v, out_l


def drop_path(x, rate: float, deterministic: bool, rng) -> jnp.ndarray:
    """Stochastic depth on the residual branch (reference fuse_modules.py
    DropPath / timm drop_path): per-sample Bernoulli keep with 1/keep
    rescale; identity at inference or rate 0."""
    if deterministic or rate == 0.0:
        return x
    keep = 1.0 - rate
    shape = (x.shape[0],) + (1,) * (x.ndim - 1)
    mask = jax.random.bernoulli(rng, keep, shape).astype(x.dtype)
    return x * mask / keep


class BiAttentionBlock(nn.Module):
    """Pre-LN fusion block with layer-scale residuals + stochastic depth
    (reference fuse_modules.py:252-295; gamma init 1e-4; drop_path applied
    to both residual branches during training, identity at inference)."""

    v_dim: int
    l_dim: int
    embed_dim: int
    num_heads: int
    init_values: float = 1e-4
    droppath: float = 0.0
    # static module attribute, NOT a call argument: under nn.remat every
    # call argument is traced, and the droppath branch needs a Python bool
    deterministic: bool = True
    fusion_impl: str = "auto"

    @nn.compact
    def __call__(self, v, l, attention_mask_v=None, attention_mask_l=None):
        deterministic = self.deterministic
        impl = self.fusion_impl
        vn = LayerNorm(epsilon=1e-5, name="layer_norm_v")(v)
        ln = LayerNorm(epsilon=1e-5, name="layer_norm_l")(l)
        dv, dl = BiMultiHeadAttention(
            self.v_dim, self.l_dim, self.embed_dim, self.num_heads,
            impl=impl, name="attn",
        )(vn, ln, attention_mask_v, attention_mask_l)
        gamma_v = self.param(
            "gamma_v", nn.initializers.constant(self.init_values), (self.v_dim,)
        )
        gamma_l = self.param(
            "gamma_l", nn.initializers.constant(self.init_values), (self.l_dim,)
        )
        use_dp = self.droppath > 0.0 and not deterministic
        # two draws — the reference calls its DropPath module once per branch
        rng_v = self.make_rng("dropout") if use_dp else None
        rng_l = self.make_rng("dropout") if use_dp else None
        return (
            vn + drop_path(gamma_v * dv, self.droppath, not use_dp, rng_v),
            ln + drop_path(gamma_l * dl, self.droppath, not use_dp, rng_l),
        )


class TextEnhancerLayer(nn.Module):
    """Post-norm transformer encoder layer over text tokens with sine pos
    embeds from position_ids and a block-diagonal attention mask
    (reference transformer_vanilla.py:72-123 + transformer.py:571-577)."""

    d_model: int
    nhead: int
    dim_feedforward: int

    @nn.compact
    def __call__(self, text, text_self_attention_masks, position_ids):
        """text: (B, T, C); text_self_attention_masks: (B, T, T) bool
        True = may attend; position_ids: (B, T) int."""
        pos = get_sine_pos_embed(
            position_ids[..., None].astype(jnp.float32),
            num_pos_feats=self.d_model,
            exchange_xy=False,
        ).astype(text.dtype)
        q = text + pos
        # torch convention: attn_mask True = NOT allowed
        attn_out = MultiHeadAttention(self.d_model, self.nhead, name="self_attn")(
            q, q, text, attn_mask=~text_self_attention_masks
        )
        x = LayerNorm(epsilon=1e-5, name="norm1")(text, attn_out)
        h = nn.Dense(self.dim_feedforward, name="linear1")(x)
        h = nn.relu(h)
        h = nn.Dense(self.d_model, name="linear2")(h)
        return LayerNorm(epsilon=1e-5, name="norm2")(x, h)


class MLP(nn.Module):
    """Simple ReLU MLP head (reference models/GroundingDINO/utils.py:171-185)."""

    hidden_dim: int
    output_dim: int
    num_layers: int

    @nn.compact
    def __call__(self, x):
        for i in range(self.num_layers):
            out = self.output_dim if i == self.num_layers - 1 else self.hidden_dim
            x = nn.Dense(out, name=f"layers_{i}")(x)
            if i < self.num_layers - 1:
                x = nn.relu(x)
        return x


def contrastive_embed(
    queries: jnp.ndarray,        # (B, Q, C)
    encoded_text: jnp.ndarray,   # (B, T, C)
    text_token_mask: jnp.ndarray,  # (B, T) bool, True = real token
    max_text_len: int = 256,
) -> jnp.ndarray:
    """Token-level contrastive classification logits, padded to max_text_len
    with -inf on pad/overflow positions (reference utils.py:233-273).
    No learnable parameters."""
    res = jnp.einsum("bqc,btc->bqt", queries, encoded_text)
    res = jnp.where(text_token_mask[:, None, :], res, NEG_INF)
    T = res.shape[-1]
    if T < max_text_len:
        pad = jnp.full((*res.shape[:-1], max_text_len - T), NEG_INF, res.dtype)
        res = jnp.concatenate([res, pad], axis=-1)
    else:
        res = res[..., :max_text_len]
    return res
