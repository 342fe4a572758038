"""Composed full-model torch-oracle parity (round-2 VERDICT missing #3).

Assembles a reference-faithful torch GroundingDINO — HF BERT with 3-D mask
injection, Swin backbone, input projections + extra stride-2 level, sine-HW
position embeds, 6-step encoder (fusion -> text enhancer -> deformable
self-attn), two-stage selection, decoder with iterative box refinement and
shared bbox head (reference models/GroundingDINO/groundingdino.py:216-392,
transformer.py:212-736) — with reference state-dict KEY NAMES, random
weights.  The state dict goes through the REAL converter
(utils/checkpoint.convert_groundingdino_checkpoint) and the flax model's
pred_logits / pred_boxes / interm_outputs must match end to end.

This is the strongest weight-free proxy for the mAP-within-0.3 gate: it
certifies inter-module wiring (detach points, norm placement, ref-point
plumbing, head math) and converter key coverage in one pass — things the
per-module parity tests cannot see.

Torch building blocks are reused from the per-module oracle tests where
their shapes are general (Swin, fusion, text enhancer, proposals); the
deformable attention / encoder / decoder layers are re-instantiated here
with general spatial shapes (the decoder-parity copies pin a module-level
SHAPES constant).
"""
import math

import numpy as np
import pytest
import torch
import torch.nn as tnn
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from open_groundingdino_tpu.models.bert import BertConfig
from open_groundingdino_tpu.models.groundingdino import GroundingDINO
from open_groundingdino_tpu.models.swin import SwinConfig
from open_groundingdino_tpu.utils.checkpoint import convert_groundingdino_checkpoint

from tests.test_fusion_text_parity import (
    TorchBiBlock,
    TorchTextEnhancer,
    torch_gen_proposals,
)
from tests.test_swin_parity import TorchSwin

# ---- nano dimensions (converter-roundtrip scale) --------------------------
T, QN, C, NHEAD, FFN = 16, 12, 32, 4, 64
NL, P = 4, 4
ENC, DEC = 2, 2
IMG_H, IMG_W = 64, 96
SWIN = SwinConfig(
    embed_dim=8, depths=(1, 1, 1, 1), num_heads=(1, 2, 2, 4), window_size=4,
    out_indices=(1, 2, 3),
)
BERT = BertConfig(
    vocab_size=40, hidden_size=32, num_hidden_layers=2, num_attention_heads=4,
    intermediate_size=32, max_position_embeddings=32,
    hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
)


# ---------------------------------------------------------------------------
# general-shape torch pieces (reference semantics)
# ---------------------------------------------------------------------------


def grid_sample_msda(value, locs, attn, shapes):
    """multi_scale_deformable_attn_pytorch (reference ms_deform_attn.py:94-134)."""
    bs, _, nh, hd = value.shape
    q, p = locs.shape[1], locs.shape[4]
    outs = []
    start = 0
    for lvl, (h, w) in enumerate(shapes):
        v = value[:, start : start + h * w]
        start += h * w
        v = v.permute(0, 2, 3, 1).reshape(bs * nh, hd, h, w)
        grid = 2 * locs[:, :, :, lvl] - 1
        grid = grid.permute(0, 2, 1, 3, 4).reshape(bs * nh, q, p, 2)
        outs.append(F.grid_sample(v, grid, mode="bilinear",
                                  padding_mode="zeros", align_corners=False))
    stacked = torch.stack(outs, dim=-2)
    aw = attn.permute(0, 2, 1, 3, 4).reshape(bs * nh, 1, q, len(shapes) * p)
    out = (stacked.flatten(-2) * aw).sum(-1)
    return out.reshape(bs, nh, hd, q).permute(0, 3, 1, 2).reshape(bs, q, nh * hd)


class TMSDeformAttn(tnn.Module):
    """reference ms_deform_attn.py:137-363 with 2-d OR 4-d reference points."""

    def __init__(self, d_model, n_heads, n_levels, n_points):
        super().__init__()
        self.nh, self.nl, self.np_ = n_heads, n_levels, n_points
        self.value_proj = tnn.Linear(d_model, d_model)
        self.sampling_offsets = tnn.Linear(d_model, n_heads * n_levels * n_points * 2)
        self.attention_weights = tnn.Linear(d_model, n_heads * n_levels * n_points)
        self.output_proj = tnn.Linear(d_model, d_model)

    def forward(self, query, value, reference_points, shapes,
                key_padding_mask=None):
        bs, nq, _ = query.shape
        nv = value.shape[1]
        v = self.value_proj(value)
        if key_padding_mask is not None:
            v = v.masked_fill(key_padding_mask[..., None], 0.0)
        v = v.view(bs, nv, self.nh, -1)
        offs = self.sampling_offsets(query).view(
            bs, nq, self.nh, self.nl, self.np_, 2
        )
        aw = self.attention_weights(query).view(
            bs, nq, self.nh, self.nl * self.np_
        ).softmax(-1).view(bs, nq, self.nh, self.nl, self.np_)
        if reference_points.shape[-1] == 2:
            wh = torch.tensor([[w, h] for h, w in shapes], dtype=torch.float32)
            locs = (
                reference_points[:, :, None, :, None, :]
                + offs / wh[None, None, None, :, None, :]
            )
        else:
            locs = (
                reference_points[:, :, None, :, None, :2]
                + offs / self.np_ * reference_points[:, :, None, :, None, 2:] * 0.5
            )
        return self.output_proj(grid_sample_msda(v, locs, aw, shapes))


class TEncoderLayer(tnn.Module):
    """reference transformer.py:747-808 (eval)."""

    def __init__(self, d_model, d_ffn, n_heads, n_levels, n_points):
        super().__init__()
        self.self_attn = TMSDeformAttn(d_model, n_heads, n_levels, n_points)
        self.norm1 = tnn.LayerNorm(d_model)
        self.linear1 = tnn.Linear(d_model, d_ffn)
        self.linear2 = tnn.Linear(d_ffn, d_model)
        self.norm2 = tnn.LayerNorm(d_model)

    def forward(self, src, pos, reference_points, shapes, key_padding_mask):
        src2 = self.self_attn(src + pos, src, reference_points, shapes,
                              key_padding_mask)
        src = self.norm1(src + src2)
        h = self.linear2(F.relu(self.linear1(src)))
        return self.norm2(src + h)


class TDecoderLayer(tnn.Module):
    """reference transformer.py:811-936 (eval)."""

    def __init__(self, d_model, d_ffn, n_heads, n_levels, n_points):
        super().__init__()
        self.cross_attn = TMSDeformAttn(d_model, n_heads, n_levels, n_points)
        self.norm1 = tnn.LayerNorm(d_model)
        self.ca_text = tnn.MultiheadAttention(d_model, n_heads, batch_first=True)
        self.catext_norm = tnn.LayerNorm(d_model)
        self.self_attn = tnn.MultiheadAttention(d_model, n_heads, batch_first=True)
        self.norm2 = tnn.LayerNorm(d_model)
        self.linear1 = tnn.Linear(d_model, d_ffn)
        self.linear2 = tnn.Linear(d_ffn, d_model)
        self.norm3 = tnn.LayerNorm(d_model)

    def forward(self, tgt, query_pos, reference_points, shapes, memory,
                memory_kpm, memory_text, text_pad):
        q = k = tgt + query_pos
        sa = self.self_attn(q, k, tgt, need_weights=False)[0]
        tgt = self.norm2(tgt + sa)
        ca = self.ca_text(tgt + query_pos, memory_text, memory_text,
                          key_padding_mask=text_pad, need_weights=False)[0]
        tgt = self.catext_norm(tgt + ca)
        ca2 = self.cross_attn(tgt + query_pos, memory, reference_points,
                              shapes, memory_kpm)
        tgt = self.norm1(tgt + ca2)
        h = self.linear2(F.relu(self.linear1(tgt)))
        return self.norm3(tgt + h)


class TMLP(tnn.Module):
    """reference utils.py:171-185."""

    def __init__(self, in_dim, hidden, out_dim, n_layers):
        super().__init__()
        h = [hidden] * (n_layers - 1)
        self.layers = tnn.ModuleList(
            tnn.Linear(a, b) for a, b in zip([in_dim] + h, h + [out_dim])
        )

    def forward(self, x):
        for i, layer in enumerate(self.layers):
            x = layer(x)
            if i < len(self.layers) - 1:
                x = F.relu(x)
        return x


def t_sine_hw(mask, npf, tH=20.0, tW=20.0):
    """reference position_encoding.py:78-131 -> (B, HW, 2*npf) flat."""
    not_mask = (~mask).float()
    y = not_mask.cumsum(1)
    x = not_mask.cumsum(2)
    scale = 2 * math.pi
    y = y / (y[:, -1:, :] + 1e-6) * scale
    x = x / (x[:, :, -1:] + 1e-6) * scale
    i = torch.arange(npf, dtype=torch.float32)
    dtx = tW ** (2 * torch.div(i, 2, rounding_mode="floor") / npf)
    dty = tH ** (2 * torch.div(i, 2, rounding_mode="floor") / npf)
    px = x[..., None] / dtx
    py = y[..., None] / dty

    def ileave(p):
        return torch.stack(
            [p[..., 0::2].sin(), p[..., 1::2].cos()], -1
        ).flatten(-2)

    pos = torch.cat([ileave(py), ileave(px)], dim=-1)  # (B, H, W, 2npf)
    return pos.flatten(1, 2)


def t_gen_sineembed(pos):
    """reference utils.py:204-230: (B, Q, 4) -> (B, Q, 512), order y,x,w,h."""
    scale = 2 * math.pi
    i = torch.arange(128, dtype=torch.float32)
    dim_t = 10000.0 ** (2 * torch.div(i, 2, rounding_mode="floor") / 128)

    def embed(c):
        v = c[..., None] * scale / dim_t
        return torch.stack([v[..., 0::2].sin(), v[..., 1::2].cos()], -1).flatten(-2)

    return torch.cat(
        [embed(pos[..., 1]), embed(pos[..., 0]),
         embed(pos[..., 2]), embed(pos[..., 3])], dim=-1,
    )


def t_contrastive(x, text, text_token_mask):
    res = torch.einsum("bqc,btc->bqt", x, text)
    return res.masked_fill(~text_token_mask[:, None, :], float("-inf"))


def t_inverse_sigmoid(x, eps=1e-3):
    x = x.clamp(min=0, max=1)
    return torch.log(x.clamp(min=eps) / (1 - x).clamp(min=eps))


class TorchGroundingDINO(tnn.Module):
    """Reference-composed model with reference state-dict key names."""

    def __init__(self):
        super().__init__()
        import transformers

        self.bert = transformers.BertModel(
            transformers.BertConfig(
                vocab_size=BERT.vocab_size, hidden_size=BERT.hidden_size,
                num_hidden_layers=BERT.num_hidden_layers,
                num_attention_heads=BERT.num_attention_heads,
                intermediate_size=BERT.intermediate_size,
                max_position_embeddings=BERT.max_position_embeddings,
                hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
            ),
            add_pooling_layer=False,
        )
        self.feat_map = tnn.Linear(BERT.hidden_size, C)
        self.backbone = tnn.ModuleList(
            [TorchSwin(SWIN.embed_dim, SWIN.depths, SWIN.num_heads,
                       SWIN.window_size, SWIN.out_indices)]
        )
        chans = [SWIN.embed_dim * (2 ** i) for i in SWIN.out_indices]
        projs = []
        for c_in in chans:
            projs.append(tnn.Sequential(tnn.Conv2d(c_in, C, 1),
                                        tnn.GroupNorm(32, C)))
        projs.append(tnn.Sequential(
            tnn.Conv2d(chans[-1], C, 3, stride=2, padding=1),
            tnn.GroupNorm(32, C),
        ))
        self.input_proj = tnn.ModuleList(projs)

        tr = tnn.Module()
        tr.level_embed = tnn.Parameter(torch.randn(NL, C))
        tr.tgt_embed = tnn.Embedding(QN, C)
        tr.enc_output = tnn.Linear(C, C)
        tr.enc_output_norm = tnn.LayerNorm(C)
        tr.encoder = tnn.Module()
        tr.encoder.layers = tnn.ModuleList(
            TEncoderLayer(C, FFN, NHEAD, NL, P) for _ in range(ENC)
        )
        tr.encoder.fusion_layers = tnn.ModuleList(
            TorchBiBlock(C, C, FFN // 2, NHEAD // 2) for _ in range(ENC)
        )
        tr.encoder.text_layers = tnn.ModuleList(
            TorchTextEnhancer(C, NHEAD // 2, FFN // 2) for _ in range(ENC)
        )
        tr.decoder = tnn.Module()
        tr.decoder.layers = tnn.ModuleList(
            TDecoderLayer(C, FFN, NHEAD, NL, P) for _ in range(DEC)
        )
        tr.decoder.ref_point_head = TMLP(512, C, C, 2)
        tr.decoder.norm = tnn.LayerNorm(C)
        tr.enc_out_bbox_embed = TMLP(C, C, 4, 3)
        self.transformer = tr
        shared = TMLP(C, C, 4, 3)
        self.bbox_embed = tnn.ModuleList([shared])  # shared across layers

    def forward(self, images, image_sizes, input_ids, text_token_mask,
                position_ids, text_self_attention_masks):
        B = images.shape[0]
        # ---- text ----
        bert_out = self.bert(
            input_ids=input_ids.long(),
            attention_mask=text_self_attention_masks.long(),
            position_ids=position_ids.long(),
        ).last_hidden_state
        memory_text = self.feat_map(bert_out)
        text_pad = ~text_token_mask

        # ---- image ----
        # TorchSwin takes NCHW; returns channel-last (B, H, W, Cf) stages
        feats = self.backbone[0](images.permute(0, 3, 1, 2))
        srcs = [self.input_proj[l](f.permute(0, 3, 1, 2))
                for l, f in enumerate(feats)]
        srcs.append(self.input_proj[-1](feats[-1].permute(0, 3, 1, 2)))
        shapes = tuple((s.shape[2], s.shape[3]) for s in srcs)

        strides = [4 * (2 ** i) for i in SWIN.out_indices]
        strides.append(strides[-1] * 2)
        masks, poss = [], []
        for (H, W), s in zip(shapes, strides):
            vh = torch.div(image_sizes[:, 0] + s - 1, s, rounding_mode="floor")
            vw = torch.div(image_sizes[:, 1] + s - 1, s, rounding_mode="floor")
            rows = torch.arange(H)[None, :, None]
            cols = torch.arange(W)[None, None, :]
            valid = (rows < vh[:, None, None]) & (cols < vw[:, None, None])
            masks.append(~valid)
            poss.append(t_sine_hw(masks[-1], C // 2))

        src_flat = torch.cat([s.flatten(2).transpose(1, 2) for s in srcs], 1)
        mask_flat = torch.cat([m.flatten(1) for m in masks], 1)
        pos_flat = torch.cat(
            [p + self.transformer.level_embed[l][None, None]
             for l, p in enumerate(poss)], 1,
        )
        ratios = []
        for m in masks:
            vh = (~m[:, :, 0]).sum(1).float()
            vw = (~m[:, 0, :]).sum(1).float()
            ratios.append(torch.stack([vw / m.shape[2], vh / m.shape[1]], -1))
        valid_ratios = torch.stack(ratios, 1)  # (B, NL, 2)

        # encoder reference points (reference transformer.py:470-485)
        refs = []
        for lvl, (H, W) in enumerate(shapes):
            gy, gx = torch.meshgrid(
                torch.arange(H, dtype=torch.float32) + 0.5,
                torch.arange(W, dtype=torch.float32) + 0.5, indexing="ij",
            )
            grid = torch.stack([gx.reshape(-1), gy.reshape(-1)], -1)
            denom = valid_ratios[:, None, lvl, :] * torch.tensor(
                [W, H], dtype=torch.float32
            )
            refs.append(grid[None] / denom)
        ref = torch.cat(refs, 1)
        enc_ref = ref[:, :, None, :] * valid_ratios[:, None, :, :]

        # ---- encoder ----
        output = src_flat
        for i in range(ENC):
            output, memory_text = self.transformer.encoder.fusion_layers[i](
                output, memory_text, mask_flat, text_pad
            )
            memory_text = self.transformer.encoder.text_layers[i](
                memory_text, text_self_attention_masks, position_ids
            )
            output = self.transformer.encoder.layers[i](
                output, pos_flat, enc_ref, shapes, mask_flat
            )
        memory = output

        # ---- two-stage ----
        out_mem, out_props = torch_gen_proposals(memory, mask_flat, shapes)
        out_mem = self.transformer.enc_output_norm(
            self.transformer.enc_output(out_mem)
        )
        enc_logits = t_contrastive(out_mem, memory_text, text_token_mask)
        enc_delta = self.transformer.enc_out_bbox_embed(out_mem)
        topk = enc_logits.max(-1)[0].topk(QN, dim=1)[1]  # (B, QN)
        gather = lambda t: torch.gather(
            t, 1, topk[..., None].expand(-1, -1, t.shape[-1])
        )
        refpoint_undetach = gather(enc_delta + out_props)
        init_box_proposal = gather(out_props).sigmoid()
        tgt_undetach = gather(out_mem)
        refpoint = refpoint_undetach.detach()
        tgt = self.transformer.tgt_embed.weight[None].expand(B, -1, -1)

        # ---- decoder ----
        reference_points = refpoint.sigmoid()
        ref_chain = [reference_points]
        hs_list, coord_list = [], []
        output = tgt
        bbox_embed = self.bbox_embed[0]
        for i in range(DEC):
            ref_before = reference_points
            head_ref = ref_chain[i]
            ref_input = (
                ref_before[:, :, None]
                * torch.cat([valid_ratios, valid_ratios], -1)[:, None]
            )
            query_pos = self.transformer.decoder.ref_point_head(
                t_gen_sineembed(ref_input[:, :, 0, :])
            )
            output = self.transformer.decoder.layers[i](
                output, query_pos, ref_input, shapes, memory, mask_flat,
                memory_text, text_pad,
            )
            delta = bbox_embed(output)
            new_ref = (delta + t_inverse_sigmoid(ref_before)).sigmoid()
            reference_points = new_ref.detach()
            ref_chain.append(new_ref)
            hs_i = self.transformer.decoder.norm(output)
            hs_list.append(hs_i)
            coord_list.append(
                (bbox_embed(hs_i) + t_inverse_sigmoid(head_ref)).sigmoid()
            )

        return {
            "pred_logits": t_contrastive(hs_list[-1], memory_text,
                                         text_token_mask),
            "pred_boxes": coord_list[-1],
            "interm_logits": t_contrastive(tgt_undetach, memory_text,
                                           text_token_mask),
            "interm_boxes": refpoint_undetach.sigmoid(),
            "aux_logits": [t_contrastive(h, memory_text, text_token_mask)
                           for h in hs_list[:-1]],
            "aux_boxes": coord_list[:-1],
        }


def _run_composed_parity(tol=2e-3, B=2, msda_impl="xla"):
    """Build the torch oracle + flax model at the CURRENT module-global
    dimensions, push the oracle state dict through the real converter, and
    assert output parity.  test_composed_flagship_width_parity re-enters
    with flagship-width globals monkeypatched."""
    torch.manual_seed(0)
    oracle = TorchGroundingDINO().eval()
    # zero-weight sampling offsets make the deformable locs path trivial;
    # randomize them (small) so the grid-sample geometry is exercised
    with torch.no_grad():
        for m in oracle.modules():
            if isinstance(m, TMSDeformAttn):
                m.sampling_offsets.weight += (
                    torch.randn_like(m.sampling_offsets.weight) * 0.05
                )

    rng = np.random.RandomState(0)
    images = rng.randn(B, IMG_H, IMG_W, 3).astype(np.float32)
    sizes = [[IMG_H, IMG_W], [IMG_H * 3 // 4, IMG_W * 3 // 4]][:B]
    image_sizes = np.asarray(sizes * (B // len(sizes) or 1), np.int64)[:B]
    ids = rng.randint(5, BERT.vocab_size, size=(B, T)).astype(np.int64)
    ids[:, 0], ids[:, 10] = 2, 3  # CLS ... SEP-ish
    token_mask = np.zeros((B, T), bool)
    token_mask[:, :11] = True
    # two phrase blocks + specials, per-phrase position ids
    attn3 = np.zeros((B, T, T), bool)
    for b in range(B):
        attn3[b, 0, 0] = True
        attn3[b, 1:5, 1:5] = True
        attn3[b, 5:10, 5:10] = True
        attn3[b, 10, 10] = True
        for t in range(11, T):
            attn3[b, t, t] = True
    pos_row = [0, 0, 1, 2, 3, 0, 1, 2, 3, 4, 0] + [0] * (T - 11)
    pos_ids = np.asarray([pos_row] * B, np.int64)

    with torch.no_grad():
        ref = oracle(
            torch.from_numpy(images), torch.from_numpy(image_sizes),
            torch.from_numpy(ids), torch.from_numpy(token_mask),
            torch.from_numpy(pos_ids), torch.from_numpy(attn3),
        )

    # ---- through the real converter ----
    sd = {k: v.numpy() for k, v in oracle.state_dict().items()}
    params = convert_groundingdino_checkpoint(
        sd, swin_depths=SWIN.depths, out_indices=SWIN.out_indices,
        num_feature_levels=NL, enc_layers=ENC, dec_layers=DEC,
        bert_layers=BERT.num_hidden_layers,
    )
    model = GroundingDINO(
        swin_cfg=SWIN, bert_cfg=BERT, hidden_dim=C, num_queries=QN,
        nheads=NHEAD, num_feature_levels=NL, enc_layers=ENC, dec_layers=DEC,
        dim_feedforward=FFN, max_text_len=T, msda_impl=msda_impl,
    )
    out = model.apply(
        {"params": params},
        images=jnp.asarray(images),
        image_sizes=jnp.asarray(image_sizes, jnp.int32),
        input_ids=jnp.asarray(ids, jnp.int32),
        text_token_mask=jnp.asarray(token_mask),
        position_ids=jnp.asarray(pos_ids, jnp.int32),
        text_self_attention_masks=jnp.asarray(attn3),
    )

    def cmp_logits(mine, theirs, name):
        mine = np.asarray(mine, np.float32)[..., :T]
        theirs = theirs.numpy()
        finite = np.isfinite(theirs)
        assert (np.isfinite(mine) == finite).all(), f"{name}: -inf mask differs"
        np.testing.assert_allclose(
            mine[finite], theirs[finite], rtol=tol, atol=tol, err_msg=name
        )

    cmp_logits(out["pred_logits"], ref["pred_logits"], "pred_logits")
    np.testing.assert_allclose(
        np.asarray(out["pred_boxes"], np.float32), ref["pred_boxes"].numpy(),
        rtol=tol, atol=tol, err_msg="pred_boxes",
    )
    cmp_logits(out["interm_outputs"]["pred_logits"], ref["interm_logits"],
               "interm_logits")
    np.testing.assert_allclose(
        np.asarray(out["interm_outputs"]["pred_boxes"], np.float32),
        ref["interm_boxes"].numpy(), rtol=tol, atol=tol,
        err_msg="interm_boxes",
    )
    for i, aux in enumerate(out.get("aux_outputs", [])):
        cmp_logits(aux["pred_logits"], ref["aux_logits"][i], f"aux_logits_{i}")
        np.testing.assert_allclose(
            np.asarray(aux["pred_boxes"], np.float32),
            ref["aux_boxes"][i].numpy(), rtol=tol, atol=tol,
            err_msg=f"aux_boxes_{i}",
        )


@pytest.mark.slow
def test_composed_full_model_parity():
    _run_composed_parity()


@pytest.mark.slow
def test_composed_flagship_width_parity(monkeypatch):
    """Flagship-WIDTH composed torch-oracle parity (VERDICT r4 item 4):
    hidden 256, 8 heads, FFN 2048, Q=900, BERT hidden 768 — every
    width-dependent numeric path at production scale (nano runs at hidden
    32 / embed 8).  Depths stay 1 and the bucket is the smallest real
    ladder rung (192x320, 1275 tokens >= 900 two-stage proposals) to keep
    CPU runtime sane; widths, not depths, are what the nano tier cannot
    witness."""
    import tests.test_composed_model_parity as mod

    monkeypatch.setattr(mod, "T", 48)
    monkeypatch.setattr(mod, "QN", 900)
    monkeypatch.setattr(mod, "C", 256)
    monkeypatch.setattr(mod, "NHEAD", 8)
    monkeypatch.setattr(mod, "FFN", 2048)
    monkeypatch.setattr(mod, "ENC", 1)
    monkeypatch.setattr(mod, "DEC", 1)
    monkeypatch.setattr(mod, "IMG_H", 192)
    monkeypatch.setattr(mod, "IMG_W", 320)
    monkeypatch.setattr(mod, "SWIN", SwinConfig(
        embed_dim=96, depths=(1, 1, 1, 1), num_heads=(3, 6, 12, 24),
        window_size=7, out_indices=(1, 2, 3),
    ))
    monkeypatch.setattr(mod, "BERT", BertConfig(
        vocab_size=512, hidden_size=768, num_hidden_layers=1,
        num_attention_heads=12, intermediate_size=768,
        max_position_embeddings=512, hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0,
    ))
    # wider accumulations (K=256/768/2048 dots) widen f32 spread vs torch
    _run_composed_parity(tol=5e-3, B=1)
