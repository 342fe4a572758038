"""Two-stage deformable transformer with image<->text fusion (the
GroundingDINO "neck": reference models/GroundingDINO/transformer.py).

Encoder layer = BiAttention fusion -> text self-attention enhancer ->
multi-scale deformable self-attention + FFN (reference transformer.py:550-598,
747-808).  Two-stage query selection picks the top-num_queries encoder tokens
by max text-contrastive logit and turns them into anchor boxes
(reference transformer.py:285-328).  Decoder layer = self-attn -> text
cross-attn -> deformable cross-attn -> FFN with per-layer box refinement on
detached reference points (reference transformer.py:672-736, 811-936).

TPU-first notes:
  * level spatial shapes are static (bucketed inputs); all proposal grids and
    reference-point lattices are trace-time constants,
  * masks/valid-ratios are computed analytically from per-image valid sizes,
  * remat (jax.checkpoint) wraps fusion/encoder layers when configured,
  * the decoder FFN runs in fp32 as the reference forces under AMP
    (reference transformer.py:871).
"""
from __future__ import annotations

from typing import List, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..utils.misc import inverse_sigmoid
from .deformable import MSDeformAttn
from .layers import (
    BiAttentionBlock,
    LayerNorm,
    MLP,
    MultiHeadAttention,
    TextEnhancerLayer,
    contrastive_embed,
)
from .position_encoding import gen_sineembed_for_position

Shapes = Tuple[Tuple[int, int], ...]


def encoder_reference_points(
    spatial_shapes: Shapes, valid_ratios: jnp.ndarray
) -> jnp.ndarray:
    """(B, sum(HW), NL, 2) reference points for encoder deformable self-attn
    (reference transformer.py:470-485)."""
    ref_list = []
    for lvl, (H, W) in enumerate(spatial_shapes):
        gy, gx = np.meshgrid(
            np.arange(H, dtype=np.float32) + 0.5,
            np.arange(W, dtype=np.float32) + 0.5,
            indexing="ij",
        )
        grid = jnp.asarray(np.stack([gx.reshape(-1), gy.reshape(-1)], -1))  # static
        # normalize by the valid extent of *this* level
        denom = valid_ratios[:, None, lvl, :] * jnp.asarray([W, H], jnp.float32)
        ref_list.append(grid[None] / denom)
    ref = jnp.concatenate(ref_list, axis=1)  # (B, sumHW, 2)
    return ref[:, :, None, :] * valid_ratios[:, None, :, :]


def make_level_masks(
    image_sizes: jnp.ndarray, spatial_shapes: Shapes, strides: Tuple[int, ...]
) -> List[jnp.ndarray]:
    """Analytic per-level padding masks from valid image sizes.

    Equivalent to the reference's nearest-neighbour mask interpolation
    (F.interpolate in backbone/groundingdino.py:308): for integer stride s,
    row i of the feature map is valid iff i < ceil(valid_h / s).

    image_sizes: (B, 2) int32 [h, w] valid pixels.  Returns list of (B, H, W)
    bool masks, True = PAD.
    """
    masks = []
    for (H, W), s in zip(spatial_shapes, strides):
        vh = (image_sizes[:, 0] + s - 1) // s  # (B,)
        vw = (image_sizes[:, 1] + s - 1) // s
        rows = jnp.arange(H)[None, :, None]
        cols = jnp.arange(W)[None, None, :]
        valid = (rows < vh[:, None, None]) & (cols < vw[:, None, None])
        masks.append(~valid)
    return masks


def compute_valid_ratios(masks: List[jnp.ndarray]) -> jnp.ndarray:
    """(B, NL, 2) [w_ratio, h_ratio] (reference transformer.py:200-207)."""
    ratios = []
    for m in masks:
        _, H, W = m.shape
        valid_h = jnp.sum(~m[:, :, 0], axis=1).astype(jnp.float32)
        valid_w = jnp.sum(~m[:, 0, :], axis=1).astype(jnp.float32)
        ratios.append(jnp.stack([valid_w / W, valid_h / H], axis=-1))
    return jnp.stack(ratios, axis=1)


def gen_encoder_output_proposals(
    memory: jnp.ndarray,            # (B, S, C)
    memory_padding_mask: jnp.ndarray,  # (B, S) True = pad
    spatial_shapes: Shapes,
):
    """Anchor-box proposals from the encoder token lattice
    (reference models/GroundingDINO/utils.py:56-116)."""
    B, S, C = memory.shape
    proposals = []
    cur = 0
    for lvl, (H, W) in enumerate(spatial_shapes):
        mask_l = memory_padding_mask[:, cur : cur + H * W].reshape(B, H, W)
        valid_h = jnp.sum(~mask_l[:, :, 0], axis=1).astype(jnp.float32)
        valid_w = jnp.sum(~mask_l[:, 0, :], axis=1).astype(jnp.float32)

        gy, gx = np.meshgrid(
            np.arange(H, dtype=np.float32),
            np.arange(W, dtype=np.float32),
            indexing="ij",
        )
        grid = jnp.asarray(np.stack([gx, gy], -1))  # (H, W, 2) static
        scale = jnp.stack([valid_w, valid_h], -1).reshape(B, 1, 1, 2)
        grid = (grid[None] + 0.5) / scale
        wh = jnp.ones_like(grid) * (0.05 * (2.0 ** lvl))
        proposals.append(jnp.concatenate([grid, wh], -1).reshape(B, -1, 4))
        cur += H * W

    output_proposals = jnp.concatenate(proposals, axis=1)  # (B, S, 4)
    valid = jnp.all(
        (output_proposals > 0.01) & (output_proposals < 0.99), axis=-1, keepdims=True
    )
    output_proposals = jnp.log(output_proposals / (1 - output_proposals))
    inf = jnp.asarray(jnp.inf, output_proposals.dtype)
    output_proposals = jnp.where(memory_padding_mask[..., None], inf, output_proposals)
    output_proposals = jnp.where(~valid, inf, output_proposals)

    output_memory = jnp.where(memory_padding_mask[..., None], 0.0, memory)
    output_memory = jnp.where(~valid, 0.0, output_memory)
    return output_memory, output_proposals


def two_stage_select(
    output_memory: jnp.ndarray,     # (B, S, C) projected+normed encoder out
    output_proposals: jnp.ndarray,  # (B, S, 4) unsigmoid anchors (inf = masked)
    enc_delta: jnp.ndarray,         # (B, S, 4) box-head deltas
    enc_logits: jnp.ndarray,        # (B, S, T) contrastive class logits
    num_queries: int,
):
    """Two-stage 'standard' query selection (reference transformer.py:285-328):
    rank tokens by max token logit, take top num_queries, gather unsigmoid
    refpoints (delta + proposal), sigmoid init proposals, and token features.
    Returns (refpoint_undetach, init_box_proposal, tgt_undetach)."""
    topk_logits = jnp.max(enc_logits, axis=-1)            # (B, S)
    enc_coords_unsel = enc_delta + output_proposals        # (B, S, 4) unsigmoid
    _, topk_idx = jax.lax.top_k(topk_logits, num_queries)  # (B, Q)
    gather = lambda t: jnp.take_along_axis(
        t, topk_idx[..., None].astype(jnp.int32), axis=1
    )
    refpoint_undetach = gather(enc_coords_unsel)           # (B, Q, 4)
    init_box_proposal = jax.nn.sigmoid(gather(output_proposals))
    tgt_undetach = gather(output_memory)                   # (B, Q, C)
    return refpoint_undetach, init_box_proposal, tgt_undetach


def _interleaved_query_order(spatial_shapes: Shapes) -> np.ndarray:
    """Static spatially-interleaved order for the concatenated multi-level
    encoder token sequence: all levels' ROWS sorted together by normalized
    y-center, each row contiguous (ops/interleave.row_band_layout).

    Level-major order (the reference's flatten(2) concat) makes each
    128-query kernel block of a *coarse* level span the whole image, so its
    deformable-attention taps into the fine levels sweep the entire fine
    value map.  Interleaving dilutes coarse tokens among the fine raster:
    every block becomes a thin horizontal strip of the image across all
    levels.  With the VALUE also stored in this order the strip's taps form
    one contiguous span, so the kernel sweeps a single merged range and
    tap positions have a closed form (no device gathers).  The permutation
    is a trace-time constant — queries of deformable attention are
    independent, so results are exact up to reordering."""
    from ..ops.interleave import row_band_layout

    return row_band_layout(spatial_shapes)[0]


import functools as _functools


@_functools.lru_cache(maxsize=None)
def _injective_take_fn(bwd_pad: int):
    """jnp.take(t, idx, axis=1) whose VJP is itself a take (ENC_TAKE_GATHER).

    Autodiff of a take by a traced index transposes to a scatter-add — a
    kCustom sort-based scatter costing ~1.2 ms per (B, 20224, 256) stream
    in the train trace, 7x/step (6 per-layer value takes + the final
    unpermute).  For an INJECTIVE trace-time index the transpose is exact
    as a gather: grad[s] = g[j] when idx[j] == s else 0, i.e. a take by
    the inverse mapping.  bwd_idx maps source positions -> consumer rows
    (the inverse permutation); bwd_pad appends zero rows for source
    positions beyond bwd_idx's range (the 128-pad tail, which receives no
    gradient).

    The index arrays are explicit ARGUMENTS (int-typed, zero-tangent), not
    closure constants: a closed-over `jnp.asarray` built inside flax's
    nn.scan broadcast-probe trace leaks that trace's tracer into the real
    scan body (UnexpectedTracerError) — with arguments, the scan path
    passes the indices as broadcast inputs and nothing is created in-body."""

    @jax.custom_vjp
    def f(t, idx, bidx):
        return jnp.take(t, idx, axis=1)

    def fwd(t, idx, bidx):
        return jnp.take(t, idx, axis=1), (bidx, idx.shape)

    def bwd(res, g):
        bidx, idx_shape = res
        gt = jnp.take(g, bidx, axis=1)
        if bwd_pad:
            pad = [(0, 0)] * gt.ndim
            pad[1] = (0, bwd_pad)
            gt = jnp.pad(gt, pad)
        z = lambda shape: np.zeros(shape, dtype=jax.dtypes.float0)
        return (gt, z(idx_shape), z(bidx.shape))

    f.defvjp(fwd, bwd)
    return f


def _make_injective_take(idx_np, bwd_idx_np, bwd_pad: int):
    """Closure-style wrapper over _injective_take_fn for non-scan call
    sites (constants created in the caller's own trace)."""
    idx = jnp.asarray(idx_np)
    bidx = jnp.asarray(bwd_idx_np)
    take = _injective_take_fn(int(bwd_pad))
    return lambda t: take(t, idx, bidx)


class DeformableEncoderLayer(nn.Module):
    d_model: int
    d_ffn: int
    n_levels: int
    n_heads: int
    n_points: int
    msda_impl: str = "auto"
    spatial_shapes: Shapes = ()
    msda_value_layout: str = "raster"

    @nn.compact
    def __call__(self, src, pos, reference_points, key_padding_mask, value=None):
        """value: deformable value tokens; defaults to src.  When the
        encoder runs in interleaved order (see _interleaved_query_order),
        src/pos/reference_points/key_padding_mask AND value are all in that
        order and msda_value_layout='interleaved' makes the kernel remap
        tap positions in closed form (single merged sweep range)."""
        if value is None:
            value = src
        src2 = MSDeformAttn(
            self.d_model, self.n_heads, self.n_levels, self.n_points,
            impl=self.msda_impl, value_layout=self.msda_value_layout,
            presorted_queries=True,
            name="self_attn",
        )(src + pos, value, reference_points, self.spatial_shapes, key_padding_mask)
        # the "msda_out" remat-policy name lives on the RAW kernel output
        # inside MSDeformAttn (models/deformable.py) — naming src2 here
        # (post output_proj) still replayed the kernel in the backward,
        # because the projection's weight grad needed its unsaved input
        src = LayerNorm(epsilon=1e-5, name="norm1")(src, src2)
        # (the fused Pallas FFN this site once dispatched to measured as a
        # dead end — 26.18 vs 27.84 img/s, BENCH_NOTES 2026-08-18; pruned)
        h = nn.Dense(self.d_ffn, name="linear1")(src)
        h = nn.relu(h)
        h = nn.Dense(self.d_model, name="linear2")(h)
        return LayerNorm(epsilon=1e-5, name="norm2")(src, h)


class _EncoderScanBlock(nn.Module):
    """One encoder iteration (fusion -> text enhancer -> deformable layer)
    in lax.scan form: called under nn.scan with variable_axes={'params': 0}
    so the six layers' params stack on a leading axis and XLA compiles the
    layer body ONCE (ENC_SCAN=1; reference runs the same loop eagerly,
    transformer.py:550-598).  Param names inside the block match the
    per-layer path minus the _{i} suffix ('fusion', 'text_layer',
    'enc_layer'); utils/checkpoint.stack_encoder_scan_params maps between
    the two layouts."""

    d_model: int
    nhead: int
    dim_feedforward: int
    num_feature_levels: int
    enc_n_points: int
    use_fusion_layer: bool
    use_text_enhancer: bool
    fusion_droppath: float
    deterministic: bool
    msda_impl: str
    spatial_shapes: Shapes
    use_ilv: bool
    use_perm: bool
    take_gather: bool
    n_pad: int

    @nn.compact
    def __call__(self, carry, pos, reference_points, kpm_q,
                 key_padding_mask, text_sam, text_pos_ids, text_pad,
                 take_idx, take_bidx):
        output, memory_text = carry
        if self.use_fusion_layer:
            output, memory_text = BiAttentionBlock(
                v_dim=self.d_model, l_dim=self.d_model,
                embed_dim=self.dim_feedforward // 2,
                num_heads=self.nhead // 2,
                droppath=self.fusion_droppath,
                deterministic=self.deterministic,
                name="fusion",
            )(output, memory_text, kpm_q, text_pad)
        if self.use_text_enhancer:
            memory_text = TextEnhancerLayer(
                d_model=self.d_model, nhead=self.nhead // 2,
                dim_feedforward=self.dim_feedforward // 2,
                name="text_layer",
            )(memory_text, text_sam, text_pos_ids)
        value = None
        if not self.use_ilv and self.use_perm:
            if self.take_gather:
                value = _injective_take_fn(self.n_pad)(
                    output, take_idx, take_bidx
                )
            else:
                value = jnp.take(output, take_idx, axis=1)
        output = DeformableEncoderLayer(
            d_model=self.d_model, d_ffn=self.dim_feedforward,
            n_levels=self.num_feature_levels, n_heads=self.nhead,
            n_points=self.enc_n_points, msda_impl=self.msda_impl,
            spatial_shapes=self.spatial_shapes,
            msda_value_layout="interleaved" if self.use_ilv else "raster",
            name="enc_layer",
        )(
            output, pos, reference_points,
            kpm_q if self.use_ilv else key_padding_mask, value,
        )
        return (output, memory_text), None


class DeformableDecoderLayer(nn.Module):
    d_model: int
    d_ffn: int
    n_levels: int
    n_heads: int
    n_points: int
    use_text_cross_attention: bool = True
    msda_impl: str = "auto"
    spatial_shapes: Shapes = ()
    # decoder stream pre-sorted by reference centers (see _decode) — the
    # deformable cross-attn skips its per-call query sort
    presorted_queries: bool = False

    @nn.compact
    def __call__(
        self,
        tgt,                   # (B, Q, C)
        query_pos,             # (B, Q, C)
        reference_points,      # (B, Q, NL, 4)
        memory,                # (B, S, C)
        memory_key_padding_mask,  # (B, S)
        memory_text,           # (B, T, C)
        text_attention_mask,   # (B, T) True = pad
    ):
        # self attention
        q = k = tgt + query_pos
        sa = MultiHeadAttention(self.d_model, self.n_heads, name="self_attn")(q, k, tgt)
        tgt = LayerNorm(epsilon=1e-5, name="norm2")(tgt, sa)

        # text cross attention
        if self.use_text_cross_attention:
            ca = MultiHeadAttention(self.d_model, self.n_heads, name="ca_text")(
                tgt + query_pos, memory_text, memory_text,
                key_padding_mask=text_attention_mask,
            )
            tgt = LayerNorm(epsilon=1e-5, name="catext_norm")(tgt, ca)

        # deformable image cross attention
        ca2 = MSDeformAttn(
            self.d_model, self.n_heads, self.n_levels, self.n_points,
            impl=self.msda_impl,
            presorted_queries=self.presorted_queries, name="cross_attn",
        )(
            tgt + query_pos, memory, reference_points, self.spatial_shapes,
            memory_key_padding_mask,
        )
        tgt = LayerNorm(epsilon=1e-5, name="norm1")(tgt, ca2)

        # FFN in fp32 (reference transformer.py:871 forces fp32 under AMP)
        t32 = tgt.astype(jnp.float32)
        h = nn.Dense(self.d_ffn, name="linear1")(t32)
        h = nn.relu(h)
        h = nn.Dense(self.d_model, name="linear2")(h)
        return LayerNorm(epsilon=1e-5, name="norm3")(t32, h).astype(tgt.dtype)


class Transformer(nn.Module):
    d_model: int = 256
    nhead: int = 8
    num_queries: int = 900
    num_encoder_layers: int = 6
    num_decoder_layers: int = 6
    dim_feedforward: int = 2048
    num_feature_levels: int = 4
    enc_n_points: int = 4
    dec_n_points: int = 4
    use_text_enhancer: bool = True
    use_fusion_layer: bool = True
    use_text_cross_attention: bool = True
    use_checkpoint: bool = False        # remat fusion layers
    use_transformer_ckpt: bool = False  # remat deformable encoder layers
    max_text_len: int = 256
    msda_impl: str = "auto"
    fusion_droppath: float = 0.0        # stochastic depth on fusion residuals
    spatial_shapes: Shapes = ()         # static, set per bucket

    @nn.compact
    def __call__(
        self,
        srcs: List[jnp.ndarray],        # per level (B, H, W, C)
        masks: List[jnp.ndarray],       # per level (B, H, W) True = pad
        pos_embeds: List[jnp.ndarray],  # per level (B, H, W, C)
        text_dict: dict,
        deterministic: bool = True,
    ):
        assert len(srcs) == self.num_feature_levels
        B = srcs[0].shape[0]
        C = self.d_model
        shapes = tuple((s.shape[1], s.shape[2]) for s in srcs)
        assert shapes == tuple(self.spatial_shapes), (shapes, self.spatial_shapes)

        level_embed = self.param(
            "level_embed", nn.initializers.normal(1.0),
            (self.num_feature_levels, C),
        )

        src_flat = jnp.concatenate([s.reshape(B, -1, C) for s in srcs], axis=1)
        mask_flat = jnp.concatenate([m.reshape(B, -1) for m in masks], axis=1)
        pos_flat = jnp.concatenate(
            [
                (p + level_embed[l][None, None, None, :]).reshape(B, -1, C)
                for l, p in enumerate(pos_embeds)
            ],
            axis=1,
        )
        valid_ratios = compute_valid_ratios(masks)  # (B, NL, 2)

        # ---------------- encoder ----------------
        memory, memory_text = self._encode(
            src_flat, pos_flat, mask_flat, valid_ratios, shapes, text_dict,
            deterministic=deterministic,
        )

        # ---------------- two-stage query selection ----------------
        output_memory, output_proposals = gen_encoder_output_proposals(
            memory, mask_flat, shapes
        )
        output_memory = nn.Dense(C, name="enc_output")(output_memory)
        output_memory = LayerNorm(epsilon=1e-5, name="enc_output_norm")(output_memory)

        enc_logits = contrastive_embed(
            output_memory, memory_text, text_dict["text_token_mask"],
            self.max_text_len,
        )
        # enc_out_bbox_embed lives on the top model for weight sharing — the
        # delta MLP is created here but shared by name from GroundingDINO.
        enc_delta = MLP(C, 4, 3, name="enc_out_bbox_embed")(output_memory)
        refpoint_undetach, init_box_proposal, tgt_undetach = two_stage_select(
            output_memory, output_proposals, enc_delta, enc_logits,
            self.num_queries,
        )
        refpoint = jax.lax.stop_gradient(refpoint_undetach)

        tgt_embed = self.param(
            "tgt_embed", nn.initializers.normal(1.0), (self.num_queries, C)
        )
        tgt = jnp.broadcast_to(tgt_embed[None], (B, self.num_queries, C)).astype(
            memory.dtype
        )

        # ---------------- decoder ----------------
        hs, outputs_coord, references = self._decode(
            tgt, refpoint, memory, mask_flat, valid_ratios, shapes,
            memory_text, text_dict,
        )

        return {
            "hs": hs,                        # list[n_dec] of (B, Q, C)
            "outputs_coord": outputs_coord,  # list[n_dec] of (B, Q, 4) sigmoid
            "references": references,        # list[n_dec+1] of (B, Q, 4)
            "memory_text": memory_text,      # (B, T, C) fused text
            "hs_enc": tgt_undetach,          # (B, Q, C)
            "ref_enc": jax.nn.sigmoid(refpoint_undetach),  # (B, Q, 4)
            "init_box_proposal": init_box_proposal,        # (B, Q, 4)
        }

    # ------------------------------------------------------------------
    def _encode(self, src, pos, key_padding_mask, valid_ratios, shapes,
                text_dict, deterministic=True):
        memory_text = text_dict["encoded_text"]
        text_pad = ~text_dict["text_token_mask"]  # True = pad
        reference_points = encoder_reference_points(shapes, valid_ratios)

        # remat policy: rematerialize everything EXCEPT the named Pallas
        # kernel outputs — re-running the deformable/fusion kernels in the
        # backward costs far more than storing their activations.  Default
        # ON since the 2026-08-19 on-chip A/B: 0.6162 vs 0.6270 s/step wall,
        # and -58 ms/step DEVICE busy (self_attn kernel replays 18 -> 12
        # per step) once the "msda_out" name moved onto the raw kernel
        # output; the wall delta is smaller than the device delta because
        # the bench step is partly host-transfer-bound on the axon tunnel.
        import os as _os0

        if bool(int(_os0.environ.get("REMAT_SAVE_KERNELS", "1"))):
            _policy = jax.checkpoint_policies.save_only_these_names(
                "msda_out", "fusion_attn_out"
            )
        else:
            _policy = None
        fusion_cls = (
            nn.remat(BiAttentionBlock, policy=_policy)
            if self.use_checkpoint
            else BiAttentionBlock
        )
        enc_cls = (
            nn.remat(DeformableEncoderLayer, policy=_policy)
            if self.use_transformer_ckpt
            else DeformableEncoderLayer
        )

        # run the encoder in spatially-interleaved QUERY order so every
        # Pallas kernel block is image-local across levels (exact — a pure
        # static reordering of independent queries; unpermuted before
        # returning).  The deformable *value* stays level-major raster:
        # storing the value interleaved too (MSDA_VALUE_LAYOUT=interleaved,
        # merged single-range sweep) measured 4.6 vs 14.3 img/s — a coarse
        # level's rows sit ~#levels x W1 apart in interleaved order, so its
        # +-k-row tap spread explodes the merged range (BENCH_NOTES r3).
        import os as _os

        from .deformable import resolve_msda_impl

        impl_resolved = resolve_msda_impl(self.msda_impl)
        use_perm = impl_resolved != "xla" and len(shapes) > 1
        use_ilv = (
            use_perm
            and _os.environ.get("MSDA_VALUE_LAYOUT", "raster") == "interleaved"
        )
        # gather-based VJPs for the injective takes: measured 0.4989 vs
        # 0.5061 s/step same-session (2026-08-19); fwd program identical.
        take_gather = bool(int(_os.environ.get("ENC_TAKE_GATHER", "1")))
        if use_perm:
            perm_np = _interleaved_query_order(shapes)
            inv_np = np.argsort(perm_np).astype(np.int32)
            perm = jnp.asarray(perm_np)
            inv = jnp.asarray(inv_np)
            take = lambda t, idx: jnp.take(t, idx, axis=1)
            if take_gather:
                tp = _make_injective_take(perm_np, inv_np, 0)
                output, pos = tp(src), tp(pos)
            else:
                output = take(src, perm)
                pos = take(pos, perm)
            reference_points = take(reference_points, perm)
            kpm_q = take(key_padding_mask, perm)  # query-order image mask
        else:
            output = src
            kpm_q = key_padding_mask

        # pad the QUERY stream once to the kernels' 128-block multiple so
        # neither the fusion kernel (VBLOCK) nor the banded MSDA (QBLOCK)
        # re-pads (B, S, E)-sized operands every layer (~0.5 ms per pad at
        # bench shapes, 12+ pads/fwd).  Tail queries are key-masked
        # everywhere (kpm True) and dropped by the final inv-take; the
        # deformable VALUE stream stays exactly L (take(output, inv) below
        # extracts the live tokens).  Edge-mode reference points keep the
        # tail block spatially coherent for the banded kernel's y-ranges.
        S = output.shape[1]
        S_pad = -(-S // 128) * 128
        if use_perm and S_pad != S:
            pn = S_pad - S
            output = jnp.pad(output, ((0, 0), (0, pn), (0, 0)))
            pos = jnp.pad(pos, ((0, 0), (0, pn), (0, 0)))
            reference_points = jnp.pad(
                reference_points, ((0, 0), (0, pn), (0, 0), (0, 0)),
                mode="edge",
            )
            kpm_q = jnp.pad(kpm_q, ((0, 0), (0, pn)), constant_values=True)

        if use_perm:
            take_live = (
                _make_injective_take(inv_np, perm_np, output.shape[1] - S)
                if take_gather else (lambda t: take(t, inv))
            )

        # ENC_SCAN=1: run the 6 structurally-identical encoder iterations as
        # ONE lax.scan over stacked per-layer params (fewer unique XLA
        # programs: targets the >20-min fresh-compile cost and the 153
        # ms/step fusion long tail — BENCH_NOTES round-4 lever 2; reference
        # executes the same layer loop eagerly, transformer.py:550-598).
        # Default OFF until a measured A/B row; parity test
        # tests/test_encoder_scan.py.
        if bool(int(_os.environ.get("ENC_SCAN", "0"))):
            block_cls = _EncoderScanBlock
            if self.use_checkpoint or self.use_transformer_ckpt:
                # NOTE (ADVICE r4): scan mode remats the ENTIRE scan block
                # (fusion + text enhancer + deformable layer) when EITHER
                # flag is set, while the eager loop below remats fusion
                # only under use_checkpoint and the deformable layer only
                # under use_transformer_ckpt (never the text enhancer).
                # Coarser memory/recompute granularity, identical numerics.
                block_cls = nn.remat(
                    block_cls, policy=_policy,
                    static_argnums=(),
                )
            scan_cls = nn.scan(
                block_cls,
                variable_axes={"params": 0},
                split_rngs={"params": True, "dropout": True},
                in_axes=(nn.broadcast,) * 9,
                length=self.num_encoder_layers,
            )
            if use_perm:
                # live-token take indices for the per-layer value stream,
                # passed as broadcast scan inputs (in-body constants leak
                # flax's broadcast-probe tracers — see _injective_take_fn)
                take_idx = jnp.asarray(inv_np)
                take_bidx = jnp.asarray(perm_np)
                n_pad = output.shape[1] - S
            else:
                take_idx = take_bidx = jnp.zeros((0,), jnp.int32)
                n_pad = 0
            (output, memory_text), _ = scan_cls(
                d_model=self.d_model, nhead=self.nhead,
                dim_feedforward=self.dim_feedforward,
                num_feature_levels=self.num_feature_levels,
                enc_n_points=self.enc_n_points,
                use_fusion_layer=self.use_fusion_layer,
                use_text_enhancer=self.use_text_enhancer,
                fusion_droppath=self.fusion_droppath,
                deterministic=deterministic,
                msda_impl=impl_resolved,
                spatial_shapes=shapes,
                use_ilv=use_ilv,
                use_perm=use_perm,
                take_gather=take_gather,
                n_pad=n_pad,
                name="enc_scan",
            )(
                (output, memory_text),
                pos, reference_points, kpm_q, key_padding_mask,
                text_dict["text_self_attention_masks"],
                text_dict["position_ids"], text_pad,
                take_idx, take_bidx,
            )
        else:
            for i in range(self.num_encoder_layers):
                if self.use_fusion_layer:
                    output, memory_text = fusion_cls(
                        v_dim=self.d_model, l_dim=self.d_model,
                        embed_dim=self.dim_feedforward // 2, num_heads=self.nhead // 2,
                        droppath=self.fusion_droppath,
                        deterministic=deterministic,
                        name=f"fusion_{i}",
                    )(output, memory_text, kpm_q, text_pad)
                if self.use_text_enhancer:
                    memory_text = TextEnhancerLayer(
                        d_model=self.d_model, nhead=self.nhead // 2,
                        dim_feedforward=self.dim_feedforward // 2,
                        name=f"text_layer_{i}",
                    )(
                        memory_text,
                        text_dict["text_self_attention_masks"],
                        text_dict["position_ids"],
                    )
                value = None if use_ilv else (
                    take_live(output) if use_perm else None
                )
                output = enc_cls(
                    d_model=self.d_model, d_ffn=self.dim_feedforward,
                    n_levels=self.num_feature_levels, n_heads=self.nhead,
                    n_points=self.enc_n_points, msda_impl=impl_resolved,
                    spatial_shapes=shapes,
                    msda_value_layout="interleaved" if use_ilv else "raster",
                    name=f"enc_layer_{i}",
                )(
                    output, pos, reference_points,
                    kpm_q if use_ilv else key_padding_mask, value,
                )
        if use_perm:
            output = take_live(output)
        return output, memory_text

    # ------------------------------------------------------------------
    def _decode(
        self, tgt, refpoints_unsig, memory, memory_mask, valid_ratios, shapes,
        memory_text, text_dict,
    ):
        """Returns (hs, outputs_coord, ref_points):
          hs[i]            — normed layer-i queries (for the class head),
          outputs_coord[i] — sigmoid boxes = bbox_embed(hs[i]) + inv_sig(ref
                             before layer i's update), the exact head math of
                             reference groundingdino.py:320-329,
          ref_points       — n_dec+1 reference boxes (refinement chain).
        The refinement MLP and the prediction head share weights
        (dec_pred_bbox_embed_share=True, reference groundingdino.py:173-182):
        both are this single `bbox_embed` module.
        """
        text_pad = ~text_dict["text_token_mask"]
        reference_points = jax.nn.sigmoid(refpoints_unsig)

        # sort the decoder query stream ONCE by initial reference centers
        # (row-major over the finest level) so every layer's banded
        # deformable cross-attn runs on spatially-coherent blocks without
        # its own per-call sort — the per-layer sort gathers the 32x-larger
        # (BH, NL, P, 2, Q) tap tensors (~4-5 ms/fwd at bench shapes).
        # Exact: decoder self/text attention is dense and unmasked across
        # queries, every other op is per-query; all collected outputs are
        # un-sorted on append.  Refined references drift from the initial
        # centers, slightly widening late-layer y-ranges — measured
        # cheaper than re-sorting.
        import os as _os

        from .deformable import resolve_msda_impl

        sort_once = (
            resolve_msda_impl(self.msda_impl) == "pallas"
            and len(shapes) > 1
            and bool(int(_os.environ.get("MSDA_BANDED", "1")))
            and bool(int(_os.environ.get("MSDA_DEC_SORT_ONCE", "1")))
        )
        if sort_once:
            H0, W0 = shapes[0]
            key = (reference_points[..., 1] * (H0 * (W0 + 2))
                   + reference_points[..., 0] * W0)       # (B, Q)
            order = jnp.argsort(key, axis=1)
            inv = jnp.argsort(order, axis=1)
            tgt = jnp.take_along_axis(tgt, order[..., None], axis=1)
            reference_points = jnp.take_along_axis(
                reference_points, order[..., None], axis=1
            )
            un = lambda t: jnp.take_along_axis(
                t, inv.reshape(inv.shape + (1,) * (t.ndim - 2)), axis=1
            )
        else:
            un = lambda t: t

        # shared-across-layers modules (instantiated once)
        ref_point_head = MLP(self.d_model, self.d_model, 2, name="ref_point_head")
        bbox_embed = MLP(self.d_model, 4, 3, name="bbox_embed")
        dec_norm = LayerNorm(epsilon=1e-5, name="dec_norm")

        intermediate = []
        outputs_coord = []
        ref_points = [reference_points]      # sorted-order (head_ref reads)
        ref_points_out = [un(reference_points)]

        output = tgt
        for i in range(self.num_decoder_layers):
            ref_before = reference_points  # detached
            # the head sees the *un-detached* previous reference so gradients
            # reach the previous layer's delta (reference groundingdino.py:326
            # uses reference[:-1][i] from the undetached ref_points list)
            head_ref = ref_points[i]
            ref_input = (
                ref_before[:, :, None]
                * jnp.concatenate([valid_ratios, valid_ratios], -1)[:, None]
            )  # (B, Q, NL, 4)
            query_sine = gen_sineembed_for_position(ref_input[:, :, 0, :]).astype(
                output.dtype
            )
            query_pos = ref_point_head(query_sine)

            output = DeformableDecoderLayer(
                d_model=self.d_model, d_ffn=self.dim_feedforward,
                n_levels=self.num_feature_levels, n_heads=self.nhead,
                n_points=self.dec_n_points,
                use_text_cross_attention=self.use_text_cross_attention,
                msda_impl=self.msda_impl, spatial_shapes=shapes,
                presorted_queries=sort_once,
                name=f"dec_layer_{i}",
            )(
                output, query_pos, ref_input, memory, memory_mask,
                memory_text, text_pad,
            )

            # refinement on the raw output (reference transformer.py:728-733)
            delta = bbox_embed(output.astype(jnp.float32))
            new_ref = jax.nn.sigmoid(delta + inverse_sigmoid(ref_before))
            reference_points = jax.lax.stop_gradient(new_ref)
            ref_points.append(new_ref)
            ref_points_out.append(un(new_ref))

            hs_i = dec_norm(output.astype(jnp.float32))
            intermediate.append(un(hs_i))
            # prediction head on the normed output with the same shared MLP
            coord = jax.nn.sigmoid(bbox_embed(hs_i) + inverse_sigmoid(head_ref))
            outputs_coord.append(un(coord))

        return intermediate, outputs_coord, ref_points_out
