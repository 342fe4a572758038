"""Pallas TPU kernel for Swin (shifted-)window attention.

Reference semantics: swin_transformer.py:77-176 WindowAttention — per
window of N = ws*ws = 49 tokens, per head of D = 32 channels:
softmax(q k^T / sqrt(D) + rel-pos bias [+ shift mask]) v.

Why a kernel: the XLA formulations (4-D head-split tensors, or the
SWIN_HEADLOOP per-head 3-D batched dots) all materialize per-head
(B_, 49, 32) operands whose D=32-minor layouts force relayout copies —
~6.4 ms/forward across stages at bench shapes (profiled 2026-08-19) —
and the (49, 49) attention dots are far below MXU tile size.

Design — block-diagonal contraction packing, NO dense superwindow matrix:
  * windows padded N 49 -> 64 rows ONCE on the pre-projection stream (the
    pad cost is one 21 MB write; q/k/v are then produced padded by the
    plain (B_*64, C) @ (C, C) projection matmuls, natural layout, no
    head-split tensors anywhere in XLA),
  * grid over groups of TW windows; blocks are (R = TW*64, C) row slabs
    of the flattened streams,
  * per head h (static lane slice [h*32, (h+1)*32)):
      Qp  = lane-tile(qh, TW) * blockdiag        (R, TW*32)
      KB  = lane-concat of TW window row-slabs   (64, TW*32)
      L   = Qp @ KB^T  (contract TW*32 lanes)    (R, 64)  — one MXU dot:
            L[r, m] = q_r . k_{win(r), m}; the blockdiag zeroing of Qp
            kills every cross-window term inside the contraction
      L  += bias_h (keys >= 49 at -1e9) [+ shift-mask row slab]
      P   = softmax_f32(L)
      VB  = lane-concat of TW window row-slabs of vh
      OP  = P @ VB                               (R, TW*32)
      out_h = band-fold(OP * blockdiag)          (R, 32)
  so the whole attention is 2 MXU dots per (group, head) with all lane
  slices 32-aligned and all sublane slices 64-aligned; the wasted TW-x
  FLOPs are noise (the dots are tiny) and the MXU runs full 128+ lanes.

Shift masks: the per-window (nW, 49, 49) additive mask (0/-100, built in
numpy at trace time exactly like models/swin.py) is laid out as an
(nW*64, 64) operand whose row slab per group is selected with a modulo
block index map — requires TW | nW, which the TW choice guarantees (the
non-shifted kernel has no such operand and only needs TW | B_).

Backward: jax.vjp of the identical-math XLA formulation (per-head einsums)
— the kernel is used for the forward/recompute path only; a native
backward is a future candidate.

Replaces: reference swin_transformer.py:115-175 (attention math only; the
qkv/proj linears stay outside).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NP_PAD = 64   # window rows padded 49 -> 64 (sublane-aligned slabs)
NEG = -1e9


def _choose_tw(divisor_of: int, max_r: int = 512) -> int:
    tw = 1
    for cand in (2, 3, 4, 5, 6, 7, 8):
        if divisor_of % cand == 0 and cand * NP_PAD <= max_r:
            tw = cand
    return tw


def _swin_attn_kernel(*refs, num_heads: int, tw: int, has_shift: bool):
    """refs: q, k, v (R, C); bias (H*64, 64) f32; [am (R, 64) f32];
    out (R, C)."""
    if has_shift:
        q_ref, k_ref, v_ref, bias_ref, am_ref, out_ref = refs
    else:
        q_ref, k_ref, v_ref, bias_ref, out_ref = refs
        am_ref = None
    R = q_ref.shape[0]
    C = q_ref.shape[1]
    H = num_heads
    D = C // H
    Np = NP_PAD
    TD = tw * D

    f32 = q_ref.dtype == jnp.float32
    prec = jax.lax.Precision.HIGHEST if f32 else jax.lax.Precision.DEFAULT
    mm_dtype = jnp.float32 if f32 else jnp.bfloat16

    # blockdiag selector (R, TW*D): row r (window r//64) keeps lane band
    # [win*D, (win+1)*D); head-independent, built once per grid step
    rwin = jax.lax.broadcasted_iota(jnp.int32, (R, TD), 0) // Np
    cwin = jax.lax.broadcasted_iota(jnp.int32, (R, TD), 1) // D
    bd = (rwin == cwin).astype(mm_dtype)

    scale = D ** -0.5
    if has_shift:
        am = am_ref[:]                                   # (R, 64)

    for h in range(H):
        sl = slice(h * D, (h + 1) * D)
        qh = q_ref[:, sl]                                # (R, D)
        kh = k_ref[:, sl]
        vh = v_ref[:, sl]

        qp = jnp.concatenate([qh] * tw, axis=1).astype(mm_dtype) * bd
        kb = jnp.concatenate(
            [kh[w * Np : (w + 1) * Np, :] for w in range(tw)], axis=1
        ).astype(mm_dtype)                               # (64, TW*D)
        logits = jax.lax.dot_general(
            qp, kb, dimension_numbers=(((1,), (1,)), ((), ())),
            precision=prec, preferred_element_type=jnp.float32,
        ) * scale                                        # (R, 64)

        bias_h = bias_ref[h * Np : (h + 1) * Np, :]      # (64, 64)
        bias_tile = jnp.concatenate([bias_h] * tw, axis=0)  # (R, 64)
        logits = logits + bias_tile
        if has_shift:
            logits = logits + am

        m = jnp.max(logits, axis=1, keepdims=True)
        e = jnp.exp(logits - m)
        p = e / jnp.sum(e, axis=1, keepdims=True)

        vb = jnp.concatenate(
            [vh[w * Np : (w + 1) * Np, :] for w in range(tw)], axis=1
        ).astype(mm_dtype)                               # (64, TW*D)
        op = jax.lax.dot_general(
            p.astype(mm_dtype), vb,
            dimension_numbers=(((1,), (0,)), ((), ())),
            precision=prec, preferred_element_type=jnp.float32,
        ) * bd.astype(jnp.float32)                       # (R, TW*D)
        out_h = op[:, 0:D]
        for w in range(1, tw):
            out_h = out_h + op[:, w * D : (w + 1) * D]
        out_ref[:, sl] = out_h.astype(out_ref.dtype)


@functools.lru_cache(maxsize=None)
def _shift_mask_rows(Hp: int, Wp: int, ws: int, shift: int) -> np.ndarray:
    """(nW*64, 64) f32 additive roll mask (0 / -100), rows padded with 0
    (padded keys/queries are handled by the bias constant)."""
    from ..models.swin import _shift_attn_mask

    m = _shift_attn_mask(Hp, Wp, ws, shift)              # (nW, N, N)
    nW, N, _ = m.shape
    out = np.zeros((nW, NP_PAD, NP_PAD), np.float32)
    out[:, :N, :N] = m
    return out.reshape(nW * NP_PAD, NP_PAD)


def swin_window_attention(
    q: jnp.ndarray,        # (B_, N, C) pre-scaled?  no — raw projections
    k: jnp.ndarray,
    v: jnp.ndarray,
    bias: jnp.ndarray,     # (H, N, N) f32 relative-position bias
    num_heads: int,
    n_windows: int,        # windows per image (for the shift-mask layout)
    shift_spec=None,       # (Hp, Wp, ws, shift) or None
) -> jnp.ndarray:
    """Fused window attention; returns (B_, N, C) (pre-output-proj).

    Numerics: identical contraction to the XLA path, with bias/mask added
    in f32 (the XLA path rounds the bias to bf16 first — the kernel is
    the more precise of the two)."""
    B_, N, C = q.shape
    H = num_heads
    assert N <= NP_PAD

    def pad(t):
        return jnp.pad(t, ((0, 0), (0, NP_PAD - N), (0, 0)))

    q2, k2, v2 = (pad(t).reshape(B_ * NP_PAD, C) for t in (q, k, v))

    bias_pad = jnp.full((H, NP_PAD, NP_PAD), NEG, jnp.float32)
    bias_pad = bias_pad.at[:, :, :N].set(
        jnp.pad(bias.astype(jnp.float32), ((0, 0), (0, NP_PAD - N), (0, 0)))
    )
    bias_rows = bias_pad.reshape(H * NP_PAD, NP_PAD)

    has_shift = shift_spec is not None
    tw = _choose_tw(n_windows if has_shift else B_)
    assert B_ % tw == 0
    R = tw * NP_PAD
    grid = (B_ // tw,)

    kernel = functools.partial(
        _swin_attn_kernel, num_heads=H, tw=tw, has_shift=has_shift,
    )
    in_specs = [
        pl.BlockSpec((R, C), lambda g: (g, 0), memory_space=pltpu.VMEM)
        for _ in range(3)
    ] + [
        pl.BlockSpec((H * NP_PAD, NP_PAD), lambda g: (0, 0),
                     memory_space=pltpu.VMEM)
    ]
    ops = [q2, k2, v2, bias_rows]
    if has_shift:
        am = jnp.asarray(_shift_mask_rows(*shift_spec))
        ngroups_per_img = n_windows // tw
        in_specs.append(pl.BlockSpec(
            (R, NP_PAD), lambda g: (g % ngroups_per_img, 0),
            memory_space=pltpu.VMEM))
        ops.append(am)

    interpret = jax.devices()[0].platform != "tpu"
    out = pl.pallas_call(
        kernel,
        interpret=interpret,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((R, C), lambda g: (g, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B_ * NP_PAD, C), q.dtype),
    )(*ops)
    return out.reshape(B_, NP_PAD, C)[:, :N]


def _xla_ref_math(q, k, v, bias, num_heads, shift_mask):
    """Identical math to the kernel in plain XLA (per-head 3-D dots):
    the parity oracle and the backward path (jax.vjp of this)."""
    B_, N, C = q.shape
    H = num_heads
    D = C // H
    scale = D ** -0.5
    outs = []
    for h in range(H):
        sl = slice(h * D, (h + 1) * D)
        qh, kh, vh = q[..., sl], k[..., sl], v[..., sl]
        logits = jnp.einsum(
            "bnd,bmd->bnm", qh, kh,
            preferred_element_type=jnp.float32,
        ) * scale
        logits = logits + bias[h][None].astype(jnp.float32)
        if shift_mask is not None:
            nW = shift_mask.shape[0]
            logits = (logits.reshape(B_ // nW, nW, N, N)
                      + shift_mask[None]).reshape(B_, N, N)
        p = jax.nn.softmax(logits, axis=-1)
        outs.append(jnp.einsum("bnm,bmd->bnd", p.astype(q.dtype), vh))
    return jnp.concatenate(outs, axis=-1)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def swin_window_attention_fused(q, k, v, bias, num_heads, n_windows,
                                shift_spec):
    return swin_window_attention(q, k, v, bias, num_heads, n_windows,
                                 shift_spec)


def _fused_fwd(q, k, v, bias, num_heads, n_windows, shift_spec):
    out = swin_window_attention(q, k, v, bias, num_heads, n_windows,
                                shift_spec)
    return out, (q, k, v, bias)


def _fused_bwd(num_heads, n_windows, shift_spec, res, g):
    q, k, v, bias = res
    if shift_spec is not None:
        from ..models.swin import _shift_attn_mask

        sm = jnp.asarray(_shift_attn_mask(*shift_spec))
    else:
        sm = None
    _, vjp = jax.vjp(
        lambda q_, k_, v_, b_: _xla_ref_math(q_, k_, v_, b_, num_heads, sm),
        q, k, v, bias,
    )
    return vjp(g)


swin_window_attention_fused.defvjp(_fused_fwd, _fused_bwd)
