"""Decoder layer numeric parity vs a hand-built torch oracle.

Torch side: reference DeformableTransformerDecoderLayer semantics
(reference transformer.py:811-936 — self-attn, text cross-attn, deformable
image cross-attn with 4-d reference points, fp32 FFN) with the mmcv-style
MSDeformAttn module (reference ms_deform_attn.py:137-363) whose core op is
torch grid_sample.  State-dict keys match what
convert_groundingdino_checkpoint's dec_layer mapping consumes, so this also
certifies the decoder part of the checkpoint converter.
"""
import numpy as np
import torch
import torch.nn as tnn
import torch.nn.functional as F

import jax.numpy as jnp

from open_groundingdino_tpu.models.transformer import DeformableDecoderLayer
from open_groundingdino_tpu.utils import torch_convert as tc

SHAPES = ((6, 8), (3, 4), (2, 2))
NL = len(SHAPES)
B, Q, T, C, H, P, FFN = 2, 9, 11, 16, 4, 4, 32
S = sum(h * w for h, w in SHAPES)


def _grid_sample_msda(value, locs, attn):
    """Core op via grid_sample (independently re-derived reference fallback,
    multi_scale_deformable_attn_pytorch semantics)."""
    bs, _, nh, hd = value.shape
    q = locs.shape[1]
    p = locs.shape[4]
    outs = []
    start = 0
    for lvl, (h, w) in enumerate(SHAPES):
        v = value[:, start: start + h * w]
        start += h * w
        v = v.permute(0, 2, 3, 1).reshape(bs * nh, hd, h, w)
        grid = 2 * locs[:, :, :, lvl] - 1  # (B, Q, H, P, 2)
        grid = grid.permute(0, 2, 1, 3, 4).reshape(bs * nh, q, p, 2)
        outs.append(F.grid_sample(v, grid, mode="bilinear",
                                  padding_mode="zeros", align_corners=False))
    stacked = torch.stack(outs, dim=-2)  # (B*H, D, Q, NL, P)
    aw = attn.permute(0, 2, 1, 3, 4).reshape(bs * nh, 1, q, NL * p)
    out = (stacked.flatten(-2) * aw).sum(-1)
    return out.reshape(bs, nh, hd, q).permute(0, 3, 1, 2).reshape(bs, q, nh * hd)


class TorchMSDeformAttn(tnn.Module):
    """reference ms_deform_attn.py:137-363 module (batch_first)."""

    def __init__(self, d_model, n_heads, n_levels, n_points):
        super().__init__()
        self.nh, self.nl, self.np_ = n_heads, n_levels, n_points
        self.value_proj = tnn.Linear(d_model, d_model)
        self.sampling_offsets = tnn.Linear(d_model, n_heads * n_levels * n_points * 2)
        self.attention_weights = tnn.Linear(d_model, n_heads * n_levels * n_points)
        self.output_proj = tnn.Linear(d_model, d_model)

    def forward(self, query, value, reference_points, key_padding_mask=None):
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
        assert reference_points.shape[-1] == 4
        locs = (
            reference_points[:, :, None, :, None, :2]
            + offs / self.np_ * reference_points[:, :, None, :, None, 2:] * 0.5
        )
        return self.output_proj(_grid_sample_msda(v, locs, aw))


class TorchDecoderLayer(tnn.Module):
    """reference transformer.py:811-936 (eval, dropout identity)."""

    def __init__(self, d_model, d_ffn, n_heads, n_levels, n_points):
        super().__init__()
        self.cross_attn = TorchMSDeformAttn(d_model, n_heads, n_levels, n_points)
        self.norm1 = tnn.LayerNorm(d_model)
        self.ca_text = tnn.MultiheadAttention(d_model, n_heads, batch_first=True)
        self.catext_norm = tnn.LayerNorm(d_model)
        self.self_attn = tnn.MultiheadAttention(d_model, n_heads, batch_first=True)
        self.norm2 = tnn.LayerNorm(d_model)
        self.linear1 = tnn.Linear(d_model, d_ffn)
        self.linear2 = tnn.Linear(d_ffn, d_model)
        self.norm3 = tnn.LayerNorm(d_model)

    def forward(self, tgt, query_pos, reference_points, memory,
                memory_key_padding_mask, memory_text, text_attention_mask):
        q = k = tgt + query_pos
        sa = self.self_attn(q, k, tgt, need_weights=False)[0]
        tgt = self.norm2(tgt + sa)
        ca = self.ca_text(
            tgt + query_pos, memory_text, memory_text,
            key_padding_mask=text_attention_mask, need_weights=False,
        )[0]
        tgt = self.catext_norm(tgt + ca)
        ca2 = self.cross_attn(
            tgt + query_pos, memory, reference_points, memory_key_padding_mask
        )
        tgt = self.norm1(tgt + ca2)
        h = self.linear2(F.relu(self.linear1(tgt)))
        return self.norm3(tgt + h)


def test_decoder_layer_parity():
    torch.manual_seed(0)
    layer = TorchDecoderLayer(C, FFN, H, NL, P).eval()
    # offsets init at zero would make the locs path trivial; randomize
    with torch.no_grad():
        layer.cross_attn.sampling_offsets.weight += (
            torch.randn_like(layer.cross_attn.sampling_offsets.weight) * 0.1
        )

    tgt = torch.randn(B, Q, C)
    query_pos = torch.randn(B, Q, C)
    # (B, Q, NL, 4) boxes: cxcywh in [0,1]
    base = torch.rand(B, Q, 1, 4) * torch.tensor([1, 1, 0.4, 0.4]) + \
        torch.tensor([0.0, 0.0, 0.05, 0.05])
    reference_points = base.expand(B, Q, NL, 4).contiguous()
    memory = torch.randn(B, S, C)
    kpm = torch.zeros(B, S, dtype=torch.bool)
    kpm[0, -7:] = True
    memory_text = torch.randn(B, T, C)
    text_mask = torch.zeros(B, T, dtype=torch.bool)
    text_mask[1, -4:] = True

    with torch.no_grad():
        ref = layer(tgt, query_pos, reference_points, memory, kpm,
                    memory_text, text_mask)

    sd = {k: v.numpy() for k, v in layer.state_dict().items()}

    def mha(prefix):
        return {
            "in_proj_weight": sd[f"{prefix}.in_proj_weight"],
            "in_proj_bias": sd[f"{prefix}.in_proj_bias"],
            "out_proj": tc.linear(sd, f"{prefix}.out_proj"),
        }

    params = {
        "cross_attn": {
            "value_proj": tc.linear(sd, "cross_attn.value_proj"),
            "sampling_offsets": tc.linear(sd, "cross_attn.sampling_offsets"),
            "attention_weights": tc.linear(sd, "cross_attn.attention_weights"),
            "output_proj": tc.linear(sd, "cross_attn.output_proj"),
        },
        "norm1": tc.layernorm(sd, "norm1"),
        "ca_text": mha("ca_text"),
        "catext_norm": tc.layernorm(sd, "catext_norm"),
        "self_attn": mha("self_attn"),
        "norm2": tc.layernorm(sd, "norm2"),
        "linear1": tc.linear(sd, "linear1"),
        "linear2": tc.linear(sd, "linear2"),
        "norm3": tc.layernorm(sd, "norm3"),
    }

    mine = DeformableDecoderLayer(
        d_model=C, d_ffn=FFN, n_levels=NL, n_heads=H, n_points=P,
        msda_impl="xla", spatial_shapes=SHAPES,
    ).apply(
        {"params": params},
        jnp.asarray(tgt.numpy()), jnp.asarray(query_pos.numpy()),
        jnp.asarray(reference_points.numpy()), jnp.asarray(memory.numpy()),
        jnp.asarray(kpm.numpy()), jnp.asarray(memory_text.numpy()),
        jnp.asarray(text_mask.numpy()),
    )
    np.testing.assert_allclose(np.asarray(mine), ref.numpy(),
                               rtol=1e-4, atol=1e-4)
