"""Fused Pallas LayerNorm for the large token streams.

Motivation (round-3 profile at 27.8 img/s): XLA lowers each
`nn.LayerNorm` on the (B, 20224, 256) encoder stream / (B, 60800, 96)
Swin streams as a `convert_reduce_fusion` that materializes f32 mean/var
arrays in an L-minor layout ({1,2,0}: channels on SUBLANES), paying a
cross-sublane reduction plus layout copies around it — ~1.0 ms per LN at
bench shapes (~20 GB/s effective, vs ~52 us at HBM speed-of-light for
read+write).  12 encoder LNs + 28 Swin LNs ≈ 13 ms/batch of pure
normalization overhead.

This kernel keeps channels on LANES: the stream is viewed as (R, C) rows
(R = B*L), the grid tiles R, and mean/variance are single-direction LANE
reductions of an (TILE_R, C) block — no layout change, one read, one
write, output written in the producer/consumer-native C-minor layout.

MEASURED DEAD END on the e2e forward (round 3): LN_PALLAS=1 26.51 img/s
vs 27.84 with the identical-math XLA path (LN_PALLAS=0, now the default).
The standalone-LN bandwidth argument ignored that XLA *fuses* each LN
with its residual add and neighboring elementwise producers — the opaque
pallas_call breaks those fusions and adds its own grid/dispatch overhead,
a net ~1.3 img/s loss.  Kept env-gated (LN_PALLAS=1) with parity tests
(tests/test_layernorm_pallas.py) as the starting point for a future
fused LN+residual(+FFN-bias) kernel, which is what it would take to win.

Replaces: the reference's `nn.LayerNorm` calls inside the transformer /
Swin hot loops (reference models/GroundingDINO/transformer.py:792-799,
backbone/swin_transformer.py:175-207 use torch.nn.LayerNorm, which CUDA
serves with a dedicated fused kernel; XLA:TPU has no equivalent for this
layout, hence this op).

Forward only: the backward falls back to the plain-XLA vjp of the same
math (the train step remats these anyway; the XLA backward fuses into
the surrounding gradient fusions acceptably).  Exactness: mean/var in
f32 regardless of input dtype, matching flax's
`nn.LayerNorm(use_fast_variance=False)` ordering closely enough that
parity tests hold at 1e-6 (f32) / 1e-2 (bf16).
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .msda_pallas import _batch_partitioned
from .tiling import pick_row_tile


def _ln_kernel(x_ref, s_ref, b_ref, o_ref, *, eps: float):
    # fast-variance form (mean(x^2) - mean(x)^2), matching flax
    # nn.LayerNorm's default so outputs agree with the golden tests
    x = x_ref[...].astype(jnp.float32)              # (TILE, C)
    c = x.shape[-1]
    mu = jnp.sum(x, axis=-1, keepdims=True) * (1.0 / c)
    m2 = jnp.sum(x * x, axis=-1, keepdims=True) * (1.0 / c)
    var = jnp.maximum(m2 - mu * mu, 0.0)
    rstd = jax.lax.rsqrt(var + eps)
    y = (x - mu) * rstd * s_ref[...].astype(jnp.float32) + b_ref[...].astype(
        jnp.float32
    )
    o_ref[...] = y.astype(o_ref.dtype)


def _pick_tile(r: int) -> int:
    # tiles below 128 would be re-padded by the caller anyway, so the tier
    # list stops at 128 (shared helper: ops/tiling.py)
    return pick_row_tile(r, (1024, 512, 256, 128))


def _ln_call(x2, scale, bias, eps, out_dtype):
    """x2: (R, C) -> (R, C) in `out_dtype` (the jnp promotion of input and
    param dtypes — bf16 stays bf16 when params are bf16-cast, matching
    `nn.LayerNorm`; forcing f32 here measured a 27.8 -> 12.9 img/s e2e
    collapse by dragging the whole downstream program to f32).  Rows
    padded to a >=128 tile when R does not divide cleanly (pad rows
    normalize garbage-free zeros; sliced)."""
    R, C = x2.shape
    tile = _pick_tile(R)
    if tile < 128:
        R_pad = ((R + 255) // 256) * 256
        x2 = jnp.pad(x2, ((0, R_pad - R), (0, 0)))
        out = _ln_call(x2, scale, bias, eps, out_dtype)
        return out[:R]
    interpret = jax.devices()[0].platform != "tpu"
    return pl.pallas_call(
        functools.partial(_ln_kernel, eps=eps),
        interpret=interpret,
        grid=(R // tile,),
        in_specs=[
            pl.BlockSpec((tile, C), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile, C), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((R, C), out_dtype),
    )(x2, scale, bias)


@functools.lru_cache(maxsize=None)
def _ln_partitioned(eps: float, out_dtype: str):
    """Batch-partitioned (B, L, C) entry (per-shard reshape to rows).
    scale/bias arrive broadcast to (B, 1, C) so every operand carries the
    shardable leading batch axis `_batch_partitioned` requires; the impl
    uses the shard's first (identical) copy."""

    def impl(x, scale, bias):
        B, L, C = x.shape
        y = _ln_call(x.reshape(B * L, C), scale[0], bias[0], eps,
                     jnp.dtype(out_dtype))
        return y.reshape(B, L, C)

    return _batch_partitioned(
        impl, 3, 1,
        [("b", "l", "c"), ("b", "s1", "c"), ("b", "s1", "c"),
         ("b", "l", "c")],
    )


def _lnres_kernel(x_ref, r_ref, s_ref, b_ref, o_ref, *, eps: float):
    """LN(x + r) in one pass — the residual add rides the same read, so
    unlike the standalone LN kernel this does not force XLA to materialize
    the sum separately (the measured cause of the LN_PALLAS e2e loss)."""
    x = x_ref[...].astype(jnp.float32) + r_ref[...].astype(jnp.float32)
    c = x.shape[-1]
    mu = jnp.sum(x, axis=-1, keepdims=True) * (1.0 / c)
    m2 = jnp.sum(x * x, axis=-1, keepdims=True) * (1.0 / c)
    var = jnp.maximum(m2 - mu * mu, 0.0)
    rstd = jax.lax.rsqrt(var + eps)
    y = (x - mu) * rstd * s_ref[...].astype(jnp.float32) + b_ref[...].astype(
        jnp.float32
    )
    o_ref[...] = y.astype(o_ref.dtype)


def _lnres_call(x2, r2, scale, bias, eps, out_dtype):
    R, C = x2.shape
    tile = _pick_tile(R)
    if tile < 128:
        R_pad = ((R + 255) // 256) * 256
        x2 = jnp.pad(x2, ((0, R_pad - R), (0, 0)))
        r2 = jnp.pad(r2, ((0, R_pad - R), (0, 0)))
        return _lnres_call(x2, r2, scale, bias, eps, out_dtype)[:R]
    interpret = jax.devices()[0].platform != "tpu"
    row_spec = pl.BlockSpec((tile, C), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    par_spec = pl.BlockSpec((1, C), lambda i: (0, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_lnres_kernel, eps=eps),
        interpret=interpret,
        grid=(R // tile,),
        in_specs=[row_spec, row_spec, par_spec, par_spec],
        out_specs=row_spec,
        out_shape=jax.ShapeDtypeStruct((R, C), out_dtype),
    )(x2, r2, scale, bias)


@functools.lru_cache(maxsize=None)
def _lnres_partitioned(eps: float, out_dtype: str):
    def impl(x, r, scale, bias):
        B, L, C = x.shape
        y = _lnres_call(x.reshape(B * L, C), r.reshape(B * L, C),
                        scale[0], bias[0], eps, jnp.dtype(out_dtype))
        return y.reshape(B, L, C)

    return _batch_partitioned(
        impl, 4, 1,
        [("b", "l", "c"), ("b", "l", "c"), ("b", "s1", "c"), ("b", "s1", "c"),
         ("b", "l", "c")],
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def fused_layernorm_residual(x, res, scale, bias, eps=1e-5):
    """LayerNorm(x + res) over the last axis — identical math to
    `fused_layernorm(x + res, ...)`; the Pallas path (LN_PALLAS_RES=1)
    folds the residual add into the kernel's read so the surrounding XLA
    program never materializes the sum."""
    B, L, C = x.shape
    if (
        not bool(int(os.environ.get("LN_PALLAS_RES", "0")))
        or B * L < 8192
        or C < 96
    ):
        return _ln_ref(x + res, scale, bias, eps)
    out_dtype = jnp.result_type(x.dtype, res.dtype, scale.dtype, bias.dtype)
    return _lnres_partitioned(eps, jnp.dtype(out_dtype).name)(
        x, res,
        jnp.broadcast_to(scale.reshape(1, 1, C), (B, 1, C)),
        jnp.broadcast_to(bias.reshape(1, 1, C), (B, 1, C)),
    )


def _lnres_fwd(x, res, scale, bias, eps):
    return fused_layernorm_residual(x, res, scale, bias, eps), (
        x, res, scale, bias
    )


def _lnres_bwd(eps, resids, g):
    x, res, scale, bias = resids
    _, vjp = jax.vjp(
        lambda x_, s_, b_: _ln_ref(x_, s_, b_, eps), x + res, scale, bias
    )
    gin, gs, gb = vjp(g)
    return gin.astype(x.dtype), gin.astype(res.dtype), gs, gb


fused_layernorm_residual.defvjp(_lnres_fwd, _lnres_bwd)


def _ln_ref(x, scale, bias, eps):
    """Plain-XLA reference (also the vjp backward path).  Same fast-variance
    math as flax `nn.LayerNorm` incl. its maximum(0, .) clamp; f32
    internal math, output in the promoted dtype of (x, scale, bias) —
    exactly `nn.LayerNorm`'s return dtype (bf16 in the bf16-cast-params
    bench path, f32 when params are f32)."""
    out_dtype = jnp.result_type(x.dtype, scale.dtype, bias.dtype)
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    m2 = jnp.mean(xf * xf, axis=-1, keepdims=True)
    var = jnp.maximum(m2 - mu * mu, 0.0)
    y = (xf - mu) * jax.lax.rsqrt(var + eps) * scale.astype(
        jnp.float32
    )[None, None]
    return (y + bias.astype(jnp.float32)[None, None]).astype(out_dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def fused_layernorm(x, scale, bias, eps=1e-5):
    """LayerNorm over the last axis.  x: (B, L, C); scale/bias: (C,);
    returns the promoted dtype of (x, scale, bias) — `nn.LayerNorm`
    semantics.

    Pallas lane-reduction kernel on TPU (and in interpret mode under
    tests); identical-math XLA fallback for small streams / LN_PALLAS=0."""
    B, L, C = x.shape
    if (
        not bool(int(os.environ.get("LN_PALLAS", "0")))
        or B * L < 8192
        or C < 96
    ):
        return _ln_ref(x, scale, bias, eps)
    out_dtype = jnp.result_type(x.dtype, scale.dtype, bias.dtype)
    return _ln_partitioned(eps, jnp.dtype(out_dtype).name)(
        x,
        jnp.broadcast_to(scale.reshape(1, 1, C), (B, 1, C)),
        jnp.broadcast_to(bias.reshape(1, 1, C), (B, 1, C)),
    )


def _ln_fwd(x, scale, bias, eps):
    return fused_layernorm(x, scale, bias, eps), (x, scale, bias)


def _ln_bwd(eps, res, g):
    x, scale, bias = res
    _, vjp = jax.vjp(lambda x_, s_, b_: _ln_ref(x_, s_, b_, eps), x, scale,
                     bias)
    return vjp(g)


fused_layernorm.defvjp(_ln_fwd, _ln_bwd)
