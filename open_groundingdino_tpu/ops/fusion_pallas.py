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

  per (b, v-block), per head h (static unrolled loop over 256-lane slices):
    L_blk   = q_blk[:, hD:hD+D] @ K[:, hD:hD+D]^T     (one MXU matmul)
    out_v   = row_softmax(L_blk, text mask) @ val_l
    text side: online (flash-style) column softmax with running
    (max, sum, acc) carried in scratch across the sequential v-block grid;
    acc is accumulated in (E, Nl) orientation so the per-text-token rescale
    broadcasts along lanes (no in-kernel transposes).

Layout: operands are the projections' RAW (B, N, E=H*D) outputs — heads are
static lane slices inside the kernel.  The earlier (B*H, N, D) interface
forced XLA to materialize a (B, N, H, D) -> (B*H, N, D) transpose of every
20k-token operand (~0.7 ms x 12 per forward, profiled as the
concatenate/reshape bucket); per-head BlockSpecs don't lower (Mosaic
requires the last two block dims full or (8,128)-divisible).

Numerics note: the reference subtracts a global max and clamps to +-50000
before each softmax (fp16 guards).  Softmax is shift-invariant, so as long
as the clamps do not bind (they cannot after a max-shift unless the logit
range exceeds 50000), the flash max-shift computes the same probabilities;
ops/../models/layers.py keeps the literal formulation as the XLA fallback
and the parity oracle.
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

VBLOCK = 128
NEG = -1e9


def _fused_bi_attn_kernel(
    q_ref,       # (1, VBLOCK, E)   image queries (pre-scaled)
    k_ref,       # (1, Nl, E)       text keys
    vv_ref,      # (1, VBLOCK, E)   image values
    vl_ref,      # (1, Nl, E)       text values
    mv_ref,      # (1, VBLOCK, 1)   f32: 1 = live, 0 = padded image token
    ml_ref,      # (1, 1, Nl)       f32: 0 = live, 1 = padded text token
    ov_ref,      # (1, VBLOCK, E)   out: image-side attention output
    ol_ref,      # (1, E, Nl)       out: text-side output (E-major)
    ml_out_ref,  # (1, H, Nl) f32   out: final column max (bwd residual)
    sl_out_ref,  # (1, H, Nl) f32   out: final column exp sum (bwd residual)
    m_ref,       # (H, Nl) f32 scratch: running column max
    s_ref,       # (H, Nl) f32 scratch: running exp sum
    acc_ref,     # (E, Nl) f32 scratch: running weighted sum (E-major)
    *, num_heads: int,
):
    nvb = pl.num_programs(1)
    vb = pl.program_id(1)
    E = q_ref.shape[2]
    D = E // num_heads

    @pl.when(vb == 0)
    def _():
        m_ref[:] = jnp.full(m_ref.shape, NEG, jnp.float32)
        s_ref[:] = jnp.zeros(s_ref.shape, jnp.float32)
        acc_ref[:] = jnp.zeros(acc_ref.shape, jnp.float32)

    lmask = ml_ref[0]                 # (1, Nl)  1 = pad
    vkeep = mv_ref[0]                 # (128, 1) 1 = live

    for h in range(num_heads):
        hs = slice(h * D, (h + 1) * D)
        q = q_ref[0, :, hs]           # (128, D) — static 256-aligned lanes
        k = k_ref[0, :, hs]           # (Nl, D)
        vl = vl_ref[0, :, hs]

        # one logits block: (128 v, Nl)
        logits = jax.lax.dot_general(
            q, k, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        logits = logits + lmask * NEG  # text padding -> -inf both directions

        # ---- image-side: row softmax over text, out_v = P @ val_l ----
        m_v = jnp.max(logits, axis=1, keepdims=True)          # (128, 1)
        p_v = jnp.exp(logits - m_v)
        denom = jnp.sum(p_v, axis=1, keepdims=True)
        p_v = p_v / denom
        ov_ref[0, :, hs] = jax.lax.dot_general(
            p_v.astype(vl.dtype), vl,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(ov_ref.dtype)

        # ---- text-side: online column softmax over image tokens ----
        # padded image rows are zeroed AFTER the exp (a padded row holding
        # the block max only over-shifts consistently — probabilities exact)
        bmax = jnp.max(logits, axis=0, keepdims=True)            # (1, Nl)
        m_old = m_ref[h : h + 1, :]                              # (1, Nl)
        m_new = jnp.maximum(m_old, bmax)
        scale = jnp.exp(m_old - m_new)                           # (1, Nl)
        p_l = jnp.exp(logits - m_new) * vkeep                    # (128, Nl)
        s_ref[h : h + 1, :] = s_ref[h : h + 1, :] * scale + jnp.sum(
            p_l, axis=0, keepdims=True
        )
        # acc[d, l] = acc*scale + sum_v val_v[v, d] * p_l[v, l]
        acc_ref[hs, :] = acc_ref[hs, :] * scale + jax.lax.dot_general(
            vv_ref[0, :, hs].astype(jnp.float32), p_l,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        m_ref[h : h + 1, :] = m_new

    @pl.when(vb == nvb - 1)
    def _():
        # PADDED text tokens: their columns carry the constant lmask*NEG
        # shift, which cancels in the softmax mathematically but drowns the
        # raw logits in f32 — their rows come out near-uniform instead of
        # exact.  Harmless: padded text tokens are key-masked at every
        # downstream consumer (text enhancer, decoder ca_text,
        # contrastive_embed), so their values never reach live outputs.
        for h in range(num_heads):
            hs = slice(h * D, (h + 1) * D)
            ol_ref[0, hs, :] = (
                acc_ref[hs, :] / s_ref[h : h + 1, :]
            ).astype(ol_ref.dtype)
        ml_out_ref[0] = m_ref[:]
        sl_out_ref[0] = s_ref[:]


def _fused_fwd_impl(q, k, val_v, val_l, mv, ml, num_heads):
    """Padded-shape forward.  q/val_v (B, Nv_pad, E); k/val_l (B, Nl, E);
    mv (B, Nv_pad, 1) f32 1=live; ml (B, 1, Nl) f32 1=pad.
    Returns out_v (B, Nv_pad, E), out_l (B, Nl, E), ml_max/sl (B, H, Nl)."""
    B, Nv_pad, E = q.shape
    Nl = k.shape[1]
    H = num_heads
    nvb = Nv_pad // VBLOCK

    interpret = jax.devices()[0].platform != "tpu"
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(B, nvb),
        in_specs=[
            pl.BlockSpec((1, VBLOCK, E), lambda b, vb: (b, vb, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Nl, E), lambda b, vb: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, VBLOCK, E), lambda b, vb: (b, vb, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Nl, E), lambda b, vb: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, VBLOCK, 1), lambda b, vb: (b, vb, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, Nl), lambda b, vb: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, VBLOCK, E), lambda b, vb: (b, vb, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, E, Nl), lambda b, vb: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H, Nl), lambda b, vb: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H, Nl), lambda b, vb: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((H, Nl), jnp.float32),
            pltpu.VMEM((H, Nl), jnp.float32),
            pltpu.VMEM((E, Nl), jnp.float32),
        ],
    )
    out_v, out_l_t, ml_max, sl = pl.pallas_call(
        functools.partial(_fused_bi_attn_kernel, num_heads=H),
        interpret=interpret,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((B, Nv_pad, E), q.dtype),
            jax.ShapeDtypeStruct((B, E, Nl), q.dtype),
            jax.ShapeDtypeStruct((B, H, Nl), jnp.float32),
            jax.ShapeDtypeStruct((B, H, Nl), jnp.float32),
        ),
    )(q, k, val_v, val_l, mv, ml)
    out_l = jnp.transpose(out_l_t, (0, 2, 1))  # (B, Nl, E) — tiny
    return out_v, out_l, ml_max, sl


def _fused_bwd_kernel(
    q_ref, k_ref, vv_ref, vl_ref, mv_ref, ml_ref, mlmax_ref, sl_ref,
    cl_ref, rv_ref, gov_ref, gol_ref,
    gq_ref, gvv_ref, gk_ref, gvl_ref,
    *, num_heads: int,
):
    """Flash backward: recompute the logits block, local row softmax,
    column softmax from the saved (max, sum) stats, then four MXU matmuls
    per head.

      dL = P_v*(G1 - rv) + P_l*(G2 - cl)
      gq = dL @ K         gk += dL^T @ q_blk
      gvv = P_l @ g_ol    gvl += P_v^T @ g_ov
    """
    nvb = pl.num_programs(1)
    vb = pl.program_id(1)
    E = q_ref.shape[2]
    D = E // num_heads

    @pl.when(vb == 0)
    def _():
        gk_ref[0] = jnp.zeros_like(gk_ref[0])
        gvl_ref[0] = jnp.zeros_like(gvl_ref[0])

    lmask = ml_ref[0]                  # (1, Nl) 1 = pad
    vkeep = mv_ref[0]                  # (128, 1) 1 = live

    for h in range(num_heads):
        hs = slice(h * D, (h + 1) * D)
        q = q_ref[0, :, hs]
        k = k_ref[0, :, hs]
        vl = vl_ref[0, :, hs]
        g_ov = gov_ref[0, :, hs].astype(jnp.float32)   # (128, D)
        g_ol = gol_ref[0, :, hs]                       # (Nl, D)

        logits = jax.lax.dot_general(
            q, k, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        logits = logits + lmask * NEG

        m_v = jnp.max(logits, axis=1, keepdims=True)
        p_v = jnp.exp(logits - m_v)
        P_v = p_v / jnp.sum(p_v, axis=1, keepdims=True)       # (128, Nl)
        P_l = (
            jnp.exp(logits - mlmax_ref[0, h : h + 1, :]) * vkeep
            / sl_ref[0, h : h + 1, :]
        )

        dt = q.dtype
        G1 = jax.lax.dot_general(                             # (128, Nl)
            g_ov.astype(dt), vl,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        G2 = jax.lax.dot_general(
            vv_ref[0, :, hs], g_ol.astype(dt),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dL = P_v * (G1 - rv_ref[0, :, h : h + 1]) + P_l * (
            G2 - cl_ref[0, h : h + 1, :]
        )

        dL_c = dL.astype(dt)
        gq_ref[0, :, hs] = jax.lax.dot_general(               # (128, D)
            dL_c, k, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(gq_ref.dtype)
        gvv_ref[0, :, hs] = jax.lax.dot_general(              # (128, D)
            P_l.astype(dt), g_ol.astype(dt),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(gvv_ref.dtype)
        gk_ref[0, :, hs] = gk_ref[0, :, hs] + jax.lax.dot_general(
            dL_c, q, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(gk_ref.dtype)
        gvl_ref[0, :, hs] = gvl_ref[0, :, hs] + jax.lax.dot_general(
            P_v.astype(dt), g_ov.astype(dt),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(gvl_ref.dtype)


def _fused_bwd_impl(q, k, val_v, val_l, mv, ml, ml_max, sl, out_v, out_l,
                    g_ov, g_ol, num_heads):
    B, Nv_pad, E = q.shape
    Nl = k.shape[1]
    H = num_heads
    D = E // H
    nvb = Nv_pad // VBLOCK

    # per-(token, head) correction terms (tiny, computed in XLA):
    #   rv[b,v,h] = g_ov . out_v   (row-softmax colsum identity)
    #   cl[b,h,l] = g_ol . out_l
    if bool(int(os.environ.get("FUSION_RV_SLICES", "1"))):
        # per-head static lane slices instead of reshape(B,N,H,D)+sum:
        # the reshape retiles the (B, 20224, 1024) f32 stream
        # T(8,128)->T(4,128) (~1 ms x 6 layers/step in the train trace);
        # lane-boundary slices (D = 2x128 lanes) are layout-preserving and
        # the sum fuses into the multiply.  Same values, same reduce order.
        # Measured 0.5059 vs 0.5128 s/step same-session (2026-08-19).
        prod_v = g_ov.astype(jnp.float32) * out_v.astype(jnp.float32)
        rv = jnp.concatenate(
            [prod_v[..., h * D:(h + 1) * D].sum(-1, keepdims=True)
             for h in range(H)],
            axis=-1,
        )  # (B, Nv_pad, H)
    else:
        rv = jnp.sum(
            (g_ov.astype(jnp.float32) * out_v.astype(jnp.float32)).reshape(
                B, Nv_pad, H, D
            ),
            axis=-1,
        )  # (B, Nv_pad, H)
    cl = jnp.sum(
        (g_ol.astype(jnp.float32) * out_l.astype(jnp.float32)).reshape(
            B, Nl, H, D
        ),
        axis=-1,
    )  # (B, Nl, H)
    cl = jnp.transpose(cl, (0, 2, 1))  # (B, H, Nl) — tiny

    interpret = jax.devices()[0].platform != "tpu"
    whole = lambda b, vb: (b, 0, 0)
    blk = lambda b, vb: (b, vb, 0)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(B, nvb),
        in_specs=[
            pl.BlockSpec((1, VBLOCK, E), blk, memory_space=pltpu.VMEM),   # q
            pl.BlockSpec((1, Nl, E), whole, memory_space=pltpu.VMEM),     # k
            pl.BlockSpec((1, VBLOCK, E), blk, memory_space=pltpu.VMEM),   # vv
            pl.BlockSpec((1, Nl, E), whole, memory_space=pltpu.VMEM),     # vl
            pl.BlockSpec((1, VBLOCK, 1), blk, memory_space=pltpu.VMEM),   # mv
            pl.BlockSpec((1, 1, Nl), whole, memory_space=pltpu.VMEM),     # ml
            pl.BlockSpec((1, H, Nl), whole, memory_space=pltpu.VMEM),     # mlmax
            pl.BlockSpec((1, H, Nl), whole, memory_space=pltpu.VMEM),     # sl
            pl.BlockSpec((1, H, Nl), whole, memory_space=pltpu.VMEM),     # cl
            pl.BlockSpec((1, VBLOCK, H), blk, memory_space=pltpu.VMEM),   # rv
            pl.BlockSpec((1, VBLOCK, E), blk, memory_space=pltpu.VMEM),   # gov
            pl.BlockSpec((1, Nl, E), whole, memory_space=pltpu.VMEM),     # gol
        ],
        out_specs=(
            pl.BlockSpec((1, VBLOCK, E), blk, memory_space=pltpu.VMEM),   # gq
            pl.BlockSpec((1, VBLOCK, E), blk, memory_space=pltpu.VMEM),   # gvv
            pl.BlockSpec((1, Nl, E), whole, memory_space=pltpu.VMEM),     # gk
            pl.BlockSpec((1, Nl, E), whole, memory_space=pltpu.VMEM),     # gvl
        ),
    )
    return pl.pallas_call(
        functools.partial(_fused_bwd_kernel, num_heads=H),
        interpret=interpret,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((B, Nv_pad, E), jnp.float32),
            jax.ShapeDtypeStruct((B, Nv_pad, E), jnp.float32),
            jax.ShapeDtypeStruct((B, Nl, E), jnp.float32),
            jax.ShapeDtypeStruct((B, Nl, E), jnp.float32),
        ),
    )(q, k, val_v, val_l, mv, ml, ml_max, sl, cl, rv, g_ov, g_ol)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6,))
def _fused_core(q, k, val_v, val_l, mv, ml, num_heads):
    out_v, out_l, _, _ = _fused_fwd_impl(q, k, val_v, val_l, mv, ml,
                                         num_heads)
    return out_v, out_l


def _fused_core_fwd(q, k, val_v, val_l, mv, ml, num_heads):
    out_v, out_l, ml_max, sl = _fused_fwd_impl(q, k, val_v, val_l, mv, ml,
                                               num_heads)
    # tag outputs AND softmax stats so the encoder remat policy
    # (transformer._encode, save_only_these_names("fusion_attn_out", ...))
    # saves every kernel-produced residual — the rematerialized forward
    # pallas_call then has no live consumers and DCE removes it from the
    # backward program
    from jax.ad_checkpoint import checkpoint_name as _nm
    out_v = _nm(out_v, "fusion_attn_out")
    out_l = _nm(out_l, "fusion_attn_out")
    ml_max = _nm(ml_max, "fusion_attn_out")
    sl = _nm(sl, "fusion_attn_out")
    return (out_v, out_l), (
        q, k, val_v, val_l, mv, ml, ml_max, sl, out_v, out_l
    )


def _fused_core_bwd(num_heads, res, cot):
    q, k, val_v, val_l, mv, ml, ml_max, sl, out_v, out_l = res
    g_ov, g_ol = cot
    gq, gvv, gk, gvl = _fused_bwd_impl(
        q, k, val_v, val_l, mv, ml, ml_max, sl, out_v, out_l, g_ov, g_ol,
        num_heads,
    )
    return (
        gq.astype(q.dtype), gk.astype(k.dtype), gvv.astype(val_v.dtype),
        gvl.astype(val_l.dtype), jnp.zeros_like(mv), jnp.zeros_like(ml),
    )


_fused_core.defvjp(_fused_core_fwd, _fused_core_bwd)


def fused_bi_attention(
    q: jnp.ndarray,       # (B, Nv, E) image queries (already scaled)
    k: jnp.ndarray,       # (B, Nl, E) text keys
    val_v: jnp.ndarray,   # (B, Nv, E)
    val_l: jnp.ndarray,   # (B, Nl, E)
    mask_v: jnp.ndarray,  # (B, Nv) bool, True = pad
    mask_l: jnp.ndarray,  # (B, Nl) bool, True = pad
    num_heads: int,
):
    """Returns (out_v (B, Nv, E), out_l (B, Nl, E)) — the two attention
    outputs of reference fuse_modules.py:163-246 (pre out-projection), in
    the projections' raw (B, N, E) layout: no head transposes anywhere.
    Differentiable: custom flash backward (_fused_bwd_kernel)."""
    B, Nv, E = q.shape
    Nv_pad = -(-Nv // VBLOCK) * VBLOCK
    if Nv_pad != Nv:
        pad = ((0, 0), (0, Nv_pad - Nv), (0, 0))
        q = jnp.pad(q, pad)
        val_v = jnp.pad(val_v, pad)
        mask_v = jnp.pad(mask_v, ((0, 0), (0, Nv_pad - Nv)),
                         constant_values=True)

    mv = (~mask_v).astype(jnp.float32).reshape(B, Nv_pad, 1)  # 1 = live
    ml = mask_l.astype(jnp.float32).reshape(B, 1, k.shape[1])  # 1 = pad
    out_v, out_l = _fused_core(q, k, val_v, val_l, mv, ml, num_heads)
    return out_v[:, :Nv], out_l
