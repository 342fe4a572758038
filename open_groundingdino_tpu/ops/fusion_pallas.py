"""Pallas TPU kernel for the GLIP bidirectional image<->text fusion attention.

Reference semantics: fuse_modules.py:99-248 BiMultiHeadAttention — ONE
logits matrix  L[v, l] = (q_v . k_l)  softmaxed in both directions:
row-softmax over text for the image-side output, column-softmax over image
tokens for the text-side output.

Why a kernel: at encoder scale the logits tensor is (B, H, ~20k, 256) f32
— ~330 MB per fusion layer.  The XLA formulation materializes and re-reads
it several times (stable-shift, clamp, two masked softmaxes), which showed
up as the third-largest bucket in the forward profile.  This kernel streams
128-image-token blocks and never materializes logits:

  per (b*h, v-block):
    L_blk   = q_blk @ K^T                       (one MXU matmul)
    out_v   = row_softmax(L_blk, text mask) @ val_l
    text side: online (flash-style) column softmax with running
    (max, sum, acc) carried in scratch across the sequential v-block grid;
    acc is accumulated in (D, Nl) orientation so the per-text-token rescale
    broadcasts along lanes (no in-kernel transposes).

Numerics note: the reference subtracts a global max and clamps to +-50000
before each softmax (fp16 guards).  Softmax is shift-invariant, so as long
as the clamps do not bind (they cannot after a max-shift unless the logit
range exceeds 50000), the flash max-shift computes the same probabilities;
ops/../models/layers.py keeps the literal formulation as the XLA fallback
and the parity oracle.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

VBLOCK = 128
NEG = -1e9


def _fused_bi_attn_kernel(
    q_ref,       # (1, VBLOCK, D)   image queries (pre-scaled)
    k_ref,       # (1, Nl, D)       text keys
    vv_ref,      # (1, VBLOCK, D)   image values
    vl_ref,      # (1, Nl, D)       text values
    mv_ref,      # (1, VBLOCK, 1)   f32: 1 = live, 0 = padded image token
    ml_ref,      # (1, 1, Nl)       f32: 0 = live, 1 = padded text token
    ov_ref,      # (1, VBLOCK, D)   out: image-side attention output
    ol_ref,      # (1, D, Nl)       out: text-side output (D-major)
    ml_out_ref,  # (1, 1, Nl) f32   out: final column max (bwd residual)
    sl_out_ref,  # (1, 1, Nl) f32   out: final column exp sum (bwd residual)
    m_ref,       # (1, Nl) f32 scratch: running column max
    s_ref,       # (1, Nl) f32 scratch: running exp sum
    acc_ref,     # (D, Nl) f32 scratch: running weighted sum (D-major)
):
    nvb = pl.num_programs(1)
    vb = pl.program_id(1)

    @pl.when(vb == 0)
    def _():
        m_ref[:] = jnp.full(m_ref.shape, NEG, jnp.float32)
        s_ref[:] = jnp.zeros(s_ref.shape, jnp.float32)
        acc_ref[:] = jnp.zeros(acc_ref.shape, jnp.float32)

    q = q_ref[0]                      # (128, D)
    k = k_ref[0]                      # (Nl, D)
    lmask = ml_ref[0]                 # (1, Nl)  1 = pad
    vkeep = mv_ref[0]                 # (128, 1) 1 = live

    # one logits block: (128 v, Nl)
    logits = jax.lax.dot_general(
        q, k, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    logits = logits + lmask * NEG     # text padding -> -inf both directions

    # ---- image-side: row softmax over text, out_v = P @ val_l ----
    m_v = jnp.max(logits, axis=1, keepdims=True)          # (128, 1)
    p_v = jnp.exp(logits - m_v)
    denom = jnp.sum(p_v, axis=1, keepdims=True)
    p_v = p_v / denom
    ov_ref[0] = jax.lax.dot_general(
        p_v.astype(vl_ref.dtype), vl_ref[0],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(ov_ref.dtype)

    # ---- text-side: online column softmax over image tokens ----
    # padded image rows are zeroed AFTER the exp (a padded row holding the
    # block max only over-shifts consistently — probabilities stay exact)
    bmax = jnp.max(logits, axis=0, keepdims=True)            # (1, Nl)
    m_old = m_ref[:]                                         # (1, Nl)
    m_new = jnp.maximum(m_old, bmax)
    scale = jnp.exp(m_old - m_new)                           # (1, Nl)
    p_l = jnp.exp(logits - m_new) * vkeep                    # (128, Nl)
    s_ref[:] = s_ref[:] * scale + jnp.sum(p_l, axis=0, keepdims=True)
    # acc[d, l] = acc*scale + sum_v val_v[v, d] * p_l[v, l]
    acc_ref[:] = acc_ref[:] * scale + jax.lax.dot_general(
        vv_ref[0].astype(jnp.float32), p_l,
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    m_ref[:] = m_new

    @pl.when(vb == nvb - 1)
    def _():
        # PADDED text tokens: their columns carry the constant lmask*NEG
        # shift, which cancels in the softmax mathematically but drowns the
        # raw logits in f32 — their rows come out near-uniform instead of
        # exact.  Harmless: padded text tokens are key-masked at every
        # downstream consumer (text enhancer, decoder ca_text,
        # contrastive_embed), so their values never reach live outputs.
        ol_ref[0] = (acc_ref[:] / s_ref[:]).astype(ol_ref.dtype)
        ml_out_ref[0] = m_ref[:]
        sl_out_ref[0] = s_ref[:]


def _fused_fwd_impl(q, k, val_v, val_l, mv, ml):
    """Padded-shape forward.  q/val_v (BH, Nv_pad, D); mv (BH, Nv_pad, 1)
    f32 1=live; ml (BH, 1, Nl) f32 1=pad.
    Returns out_v (BH, Nv_pad, D), out_l (BH, Nl, D), ml_max/sl (BH, 1, Nl)."""
    BH, Nv_pad, D = q.shape
    Nl = k.shape[1]
    nvb = Nv_pad // VBLOCK

    interpret = jax.devices()[0].platform != "tpu"
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(BH, nvb),
        in_specs=[
            pl.BlockSpec((1, VBLOCK, D), lambda bh, vb: (bh, vb, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Nl, D), lambda bh, vb: (bh, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, VBLOCK, D), lambda bh, vb: (bh, vb, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Nl, D), lambda bh, vb: (bh, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, VBLOCK, 1), lambda bh, vb: (bh, vb, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, Nl), lambda bh, vb: (bh, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, VBLOCK, D), lambda bh, vb: (bh, vb, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D, Nl), lambda bh, vb: (bh, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, Nl), lambda bh, vb: (bh, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, Nl), lambda bh, vb: (bh, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((1, Nl), jnp.float32),
            pltpu.VMEM((1, Nl), jnp.float32),
            pltpu.VMEM((D, Nl), jnp.float32),
        ],
    )
    out_v, out_l_t, ml_max, sl = pl.pallas_call(
        _fused_bi_attn_kernel,
        interpret=interpret,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((BH, Nv_pad, D), q.dtype),
            jax.ShapeDtypeStruct((BH, D, Nl), q.dtype),
            jax.ShapeDtypeStruct((BH, 1, Nl), jnp.float32),
            jax.ShapeDtypeStruct((BH, 1, Nl), jnp.float32),
        ),
    )(q, k, val_v, val_l, mv, ml)
    out_l = jnp.transpose(out_l_t, (0, 2, 1))  # (BH, Nl, D)
    return out_v, out_l, ml_max, sl


def _fused_bwd_kernel(
    q_ref, k_ref, vv_ref, vl_ref, mv_ref, ml_ref, mlmax_ref, sl_ref,
    cl_ref, rv_ref, gov_ref, gol_ref,
    gq_ref, gvv_ref, gk_ref, gvl_ref,
):
    """Flash backward: recompute the logits block, local row softmax,
    column softmax from the saved (max, sum) stats, then four MXU matmuls.

      dL = P_v*(G1 - rv) + P_l*(G2 - cl)
      gq = dL @ K         gk += dL^T @ q_blk
      gvv = P_l @ g_ol    gvl += P_v^T @ g_ov
    """
    nvb = pl.num_programs(1)
    vb = pl.program_id(1)

    @pl.when(vb == 0)
    def _():
        gk_ref[0] = jnp.zeros_like(gk_ref[0])
        gvl_ref[0] = jnp.zeros_like(gvl_ref[0])

    q = q_ref[0]
    k = k_ref[0]
    lmask = ml_ref[0]                  # (1, Nl) 1 = pad
    vkeep = mv_ref[0]                  # (128, 1) 1 = live
    g_ov = gov_ref[0].astype(jnp.float32)   # (128, D)
    g_ol = gol_ref[0]                  # (Nl, D)

    logits = jax.lax.dot_general(
        q, k, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    logits = logits + lmask * NEG

    m_v = jnp.max(logits, axis=1, keepdims=True)
    p_v = jnp.exp(logits - m_v)
    P_v = p_v / jnp.sum(p_v, axis=1, keepdims=True)       # (128, Nl)
    P_l = jnp.exp(logits - mlmax_ref[0]) * vkeep / sl_ref[0]

    dt = q.dtype
    G1 = jax.lax.dot_general(                             # (128, Nl)
        g_ov.astype(dt), vl_ref[0],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    G2 = jax.lax.dot_general(
        vv_ref[0], g_ol.astype(dt),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dL = P_v * (G1 - rv_ref[0]) + P_l * (G2 - cl_ref[0])

    dL_c = dL.astype(dt)
    gq_ref[0] = jax.lax.dot_general(                      # (128, D)
        dL_c, k, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(gq_ref.dtype)
    gvv_ref[0] = jax.lax.dot_general(                     # (128, D)
        P_l.astype(dt), g_ol.astype(dt),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(gvv_ref.dtype)
    gk_ref[0] = gk_ref[0] + jax.lax.dot_general(          # (Nl, D)
        dL_c, q, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(gk_ref.dtype)
    gvl_ref[0] = gvl_ref[0] + jax.lax.dot_general(        # (Nl, D)
        P_v.astype(dt), g_ov.astype(dt),
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(gvl_ref.dtype)


def _fused_bwd_impl(q, k, val_v, val_l, mv, ml, ml_max, sl, out_v, out_l,
                    g_ov, g_ol):
    BH, Nv_pad, D = q.shape
    Nl = k.shape[1]
    nvb = Nv_pad // VBLOCK

    # per-token correction terms (tiny, computed in XLA):
    #   rv[v] = g_ov . out_v   (row-softmax colsum identity)
    #   cl[l] = g_ol . out_l
    rv = jnp.sum(
        g_ov.astype(jnp.float32) * out_v.astype(jnp.float32), axis=-1
    ).reshape(BH, Nv_pad, 1)
    cl = jnp.sum(
        g_ol.astype(jnp.float32) * out_l.astype(jnp.float32), axis=-1
    ).reshape(BH, 1, Nl)

    interpret = jax.devices()[0].platform != "tpu"
    whole = lambda bh, vb: (bh, 0, 0)
    blk = lambda bh, vb: (bh, vb, 0)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(BH, nvb),
        in_specs=[
            pl.BlockSpec((1, VBLOCK, D), blk, memory_space=pltpu.VMEM),   # q
            pl.BlockSpec((1, Nl, D), whole, memory_space=pltpu.VMEM),     # k
            pl.BlockSpec((1, VBLOCK, D), blk, memory_space=pltpu.VMEM),   # vv
            pl.BlockSpec((1, Nl, D), whole, memory_space=pltpu.VMEM),     # vl
            pl.BlockSpec((1, VBLOCK, 1), blk, memory_space=pltpu.VMEM),   # mv
            pl.BlockSpec((1, 1, Nl), whole, memory_space=pltpu.VMEM),     # ml
            pl.BlockSpec((1, 1, Nl), whole, memory_space=pltpu.VMEM),     # mlmax
            pl.BlockSpec((1, 1, Nl), whole, memory_space=pltpu.VMEM),     # sl
            pl.BlockSpec((1, 1, Nl), whole, memory_space=pltpu.VMEM),     # cl
            pl.BlockSpec((1, VBLOCK, 1), blk, memory_space=pltpu.VMEM),   # rv
            pl.BlockSpec((1, VBLOCK, D), blk, memory_space=pltpu.VMEM),   # gov
            pl.BlockSpec((1, Nl, D), whole, memory_space=pltpu.VMEM),     # gol
        ],
        out_specs=(
            pl.BlockSpec((1, VBLOCK, D), blk, memory_space=pltpu.VMEM),   # gq
            pl.BlockSpec((1, VBLOCK, D), blk, memory_space=pltpu.VMEM),   # gvv
            pl.BlockSpec((1, Nl, D), whole, memory_space=pltpu.VMEM),     # gk
            pl.BlockSpec((1, Nl, D), whole, memory_space=pltpu.VMEM),     # gvl
        ),
    )
    return pl.pallas_call(
        _fused_bwd_kernel,
        interpret=interpret,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((BH, Nv_pad, D), jnp.float32),
            jax.ShapeDtypeStruct((BH, Nv_pad, D), jnp.float32),
            jax.ShapeDtypeStruct((BH, Nl, D), jnp.float32),
            jax.ShapeDtypeStruct((BH, Nl, D), jnp.float32),
        ),
    )(q, k, val_v, val_l, mv, ml, ml_max, sl, cl, rv, g_ov, g_ol)


@jax.custom_vjp
def _fused_core(q, k, val_v, val_l, mv, ml):
    out_v, out_l, _, _ = _fused_fwd_impl(q, k, val_v, val_l, mv, ml)
    return out_v, out_l


def _fused_core_fwd(q, k, val_v, val_l, mv, ml):
    out_v, out_l, ml_max, sl = _fused_fwd_impl(q, k, val_v, val_l, mv, ml)
    return (out_v, out_l), (
        q, k, val_v, val_l, mv, ml, ml_max, sl, out_v, out_l
    )


def _fused_core_bwd(res, cot):
    q, k, val_v, val_l, mv, ml, ml_max, sl, out_v, out_l = res
    g_ov, g_ol = cot
    gq, gvv, gk, gvl = _fused_bwd_impl(
        q, k, val_v, val_l, mv, ml, ml_max, sl, out_v, out_l, g_ov, g_ol
    )
    return (
        gq.astype(q.dtype), gk.astype(k.dtype), gvv.astype(val_v.dtype),
        gvl.astype(val_l.dtype), jnp.zeros_like(mv), jnp.zeros_like(ml),
    )


_fused_core.defvjp(_fused_core_fwd, _fused_core_bwd)


def fused_bi_attention(
    q: jnp.ndarray,       # (BH, Nv, D) image queries (already scaled)
    k: jnp.ndarray,       # (BH, Nl, D) text keys
    val_v: jnp.ndarray,   # (BH, Nv, D)
    val_l: jnp.ndarray,   # (BH, Nl, D)
    mask_v: jnp.ndarray,  # (BH, Nv) bool, True = pad
    mask_l: jnp.ndarray,  # (BH, Nl) bool, True = pad
):
    """Returns (out_v (BH, Nv, D), out_l (BH, Nl, D)) — the two attention
    outputs of reference fuse_modules.py:163-246 (pre out-projection).
    Differentiable: custom flash backward (_fused_bwd_kernel)."""
    BH, Nv, D = q.shape
    Nv_pad = -(-Nv // VBLOCK) * VBLOCK
    if Nv_pad != Nv:
        pad = ((0, 0), (0, Nv_pad - Nv), (0, 0))
        q = jnp.pad(q, pad)
        val_v = jnp.pad(val_v, pad)
        mask_v = jnp.pad(mask_v, ((0, 0), (0, Nv_pad - Nv)),
                         constant_values=True)

    mv = (~mask_v).astype(jnp.float32).reshape(BH, Nv_pad, 1)  # 1 = live
    ml = mask_l.astype(jnp.float32).reshape(BH, 1, k.shape[1])  # 1 = pad
    out_v, out_l = _fused_core(q, k, val_v, val_l, mv, ml)
    return out_v[:, :Nv], out_l
