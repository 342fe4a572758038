"""Fused two-layer MLP (linear1 -> relu -> linear2) Pallas kernel.

Motivation (trace at 21.7 img/s, fusion bucket): the encoder FFN's
(B*L, d_ffn) intermediate — bf16[80896, 2048] = 331 MB at bench shapes —
is written to and re-read from HBM by XLA's two-dot lowering, ~0.8 ms of
pure bandwidth per encoder layer x 6 layers on top of the ~0.86 ms of
matmul.  This kernel runs both dots per row-block with the intermediate
held in VMEM, so the d_ffn activation never touches HBM.

Math matches the XLA path bit-for-bit in structure: first dot with f32
accumulation, bias add + relu in f32, intermediate cast to the weight
dtype (bf16 under mixed precision — exactly what flax Dense emits as its
output dtype), second dot f32-accumulated, bias add, cast to the input
dtype.  Backward falls back to the plain-XLA vjp of the same math (the
encoder layers remat anyway, and the XLA backward fuses into the
surrounding gradient program).

Replaces: the reference's nn.Linear/relu/nn.Linear FFN blocks
(reference models/GroundingDINO/transformer.py:292-296, 857-861), which
CUDA serves with cuBLAS + a separate elementwise kernel.

Env gate MLP_PALLAS=1 (default off until the on-chip A/B lands).
"""
from __future__ import annotations

import functools
import math
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .msda_pallas import _batch_partitioned
from .tiling import pick_row_tile


def _erf_poly(x):
    """erf via the Abramowitz-Stegun 7.1.26 rational approximation
    (|err| <= 1.5e-7): Mosaic's TPU lowering has no `erf` primitive
    (NotImplementedError at trace time on real hardware — interpret mode
    hides it), but abs/where/exp and polynomials all lower fine."""
    a1, a2, a3, a4, a5 = (
        0.254829592, -0.284496736, 1.421413741, -1.453152027, 1.061405429
    )
    p = 0.3275911
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + p * ax)
    poly = ((((a5 * t + a4) * t + a3) * t + a2) * t + a1) * t
    y = 1.0 - poly * jnp.exp(-(ax * ax))
    return jnp.where(x >= 0, y, -y)


def _apply_act(h, act: str, in_kernel: bool = False):
    """Activation on the f32 accumulator (caller casts after)."""
    if act == "relu":
        return jnp.maximum(h, 0.0)
    if act == "gelu":  # exact (erf) form, matching nn.gelu(approximate=False)
        erf = _erf_poly if in_kernel else jax.lax.erf
        return 0.5 * h * (1.0 + erf(h * (1.0 / math.sqrt(2.0))))
    raise ValueError(f"unsupported activation {act!r}")


def _mlp_kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, o_ref, *, act):
    x = x_ref[...]                                   # (TILE, C) in dtype
    h = jax.lax.dot_general(
        x, w1_ref[...],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b1_ref[...].astype(jnp.float32)              # (TILE, F) f32
    h = _apply_act(h, act, in_kernel=True).astype(w2_ref.dtype)
    o = jax.lax.dot_general(
        h, w2_ref[...],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b2_ref[...].astype(jnp.float32)
    o_ref[...] = o.astype(o_ref.dtype)


def _mlp_call(x2, w1, b1, w2, b2, act="relu"):
    R, C = x2.shape
    F = w1.shape[1]
    # tiers capped at 512: the kernel holds a (tile, d_ffn) f32
    # intermediate in VMEM (shared helper: ops/tiling.py)
    tile = pick_row_tile(R, (512, 256, 128))
    if tile == 0:
        R_pad = ((R + 511) // 512) * 512
        x2 = jnp.pad(x2, ((0, R_pad - R), (0, 0)))
        return _mlp_call(x2, w1, b1, w2, b2, act)[:R]
    interpret = jax.devices()[0].platform != "tpu"
    full = lambda shape: pl.BlockSpec(
        shape, lambda i: tuple(0 for _ in shape), memory_space=pltpu.VMEM
    )
    return pl.pallas_call(
        functools.partial(_mlp_kernel, act=act),
        interpret=interpret,
        grid=(R // tile,),
        in_specs=[
            pl.BlockSpec((tile, C), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            full((C, F)), full((1, F)), full((F, C)), full((1, C)),
        ],
        out_specs=pl.BlockSpec((tile, C), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((R, C), x2.dtype),
    )(x2, w1, b1, w2, b2)


@functools.lru_cache(maxsize=None)
def _mlp_partitioned(act="relu"):
    def impl(x, w1, b1, w2, b2):
        B, L, C = x.shape
        y = _mlp_call(x.reshape(B * L, C), w1[0], b1[0], w2[0], b2[0], act)
        return y.reshape(B, L, C)

    return _batch_partitioned(
        impl, 5, 1,
        [("b", "l", "c"), ("b", "c", "f"), ("b", "s1", "f"),
         ("b", "f", "c"), ("b", "s1", "c"), ("b", "l", "c")],
    )


def _mlp_ref(x, w1, b1, w2, b2, act="relu"):
    """Plain-XLA reference — the exact math of
    Dense(F)(x) |> act |> Dense(C), including the bf16 intermediate cast
    flax emits under mixed precision (activation applied on the f32
    accumulator, same order as the kernel)."""
    h = jax.lax.dot_general(
        x, w1.astype(x.dtype),
        dimension_numbers=(((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b1.astype(jnp.float32)
    h = _apply_act(h, act).astype(x.dtype)
    o = jax.lax.dot_general(
        h, w2.astype(x.dtype),
        dimension_numbers=(((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b2.astype(jnp.float32)
    return o.astype(x.dtype)


def _gate_on(gate_env: str) -> bool:
    """Gate value for a fused-MLP call site.  A site-specific env var
    (e.g. MLP_PALLAS_SWIN) overrides the global MLP_PALLAS when set, so
    the on-chip A/B can attribute encoder-FFN vs Swin-MLP effects
    separately; unset, every site follows MLP_PALLAS."""
    v = os.environ.get(gate_env)
    if gate_env != "MLP_PALLAS" and v is None:
        v = os.environ.get("MLP_PALLAS")
    return bool(int(v or "0"))


@functools.lru_cache(maxsize=None)
def _fused_mlp_for(act: str, gate_env: str = "MLP_PALLAS"):
    @jax.custom_vjp
    def _fused(x, w1, b1, w2, b2):
        B, L, C = x.shape
        if not _gate_on(gate_env) or B * L < 8192:
            return _mlp_ref(x, w1, b1, w2, b2, act)
        F = w1.shape[1]
        dt = x.dtype
        return _mlp_partitioned(act)(
            x,
            jnp.broadcast_to(w1.astype(dt)[None], (B,) + w1.shape),
            jnp.broadcast_to(b1.reshape(1, 1, F), (B, 1, F)),
            jnp.broadcast_to(w2.astype(dt)[None], (B,) + w2.shape),
            jnp.broadcast_to(b2.reshape(1, 1, C), (B, 1, C)),
        )

    def _fwd(x, w1, b1, w2, b2):
        return _fused(x, w1, b1, w2, b2), (x, w1, b1, w2, b2)

    def _bwd(res, g):
        x, w1, b1, w2, b2 = res
        _, vjp = jax.vjp(
            lambda *a: _mlp_ref(*a, act), x, w1, b1, w2, b2)
        return vjp(g)

    _fused.defvjp(_fwd, _bwd)
    return _fused


def fused_mlp(x, w1, b1, w2, b2, activation="relu", gate_env="MLP_PALLAS"):
    """Two-dot MLP over the last axis.  x: (B, L, C); w1: (C, F);
    w2: (F, C); activation 'relu' (encoder FFN) or 'gelu' (Swin MLP).
    Pallas fused path on TPU under the gate env var (default MLP_PALLAS;
    site-specific gates fall back to MLP_PALLAS when unset) for big
    streams; identical-math XLA fallback otherwise."""
    return _fused_mlp_for(activation, gate_env)(x, w1, b1, w2, b2)
