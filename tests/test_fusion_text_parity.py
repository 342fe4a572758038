"""Numeric parity vs hand-built torch oracles for the modules the round-1
review flagged as evidence-free: BiMultiHeadAttention / BiAttentionBlock
(reference fuse_modules.py:99-295), the text enhancer layer
(reference transformer_vanilla.py:72-123), get_sine_pos_embed
(reference models/GroundingDINO/utils.py:24-53), and
gen_encoder_output_proposals (reference utils.py:56-116).

The torch modules are written from the reference's *semantics* (same
math, standard ops) with reference-compatible state-dict key names, so the
tests double as converter-correctness evidence on the exact keys
convert_groundingdino_checkpoint consumes.
"""
import math

import numpy as np
import pytest
import torch
import torch.nn as tnn
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from open_groundingdino_tpu.models.layers import (
    BiAttentionBlock,
    TextEnhancerLayer,
)
from open_groundingdino_tpu.models.position_encoding import get_sine_pos_embed
from open_groundingdino_tpu.models.transformer import (
    gen_encoder_output_proposals,
    two_stage_select,
)
from open_groundingdino_tpu.utils import torch_convert as tc


# ---------------------------------------------------------------------------
# torch oracles (reference math, hand-built)
# ---------------------------------------------------------------------------


class TorchBiMHA(tnn.Module):
    """reference fuse_modules.py:99-248: one QK^T logits matrix softmaxed in
    both directions, global-max subtraction + +-50000 clamps."""

    def __init__(self, v_dim, l_dim, embed_dim, num_heads):
        super().__init__()
        self.num_heads = num_heads
        self.head_dim = embed_dim // num_heads
        self.scale = self.head_dim ** -0.5
        self.embed_dim = embed_dim
        self.v_proj = tnn.Linear(v_dim, embed_dim)
        self.l_proj = tnn.Linear(l_dim, embed_dim)
        self.values_v_proj = tnn.Linear(v_dim, embed_dim)
        self.values_l_proj = tnn.Linear(l_dim, embed_dim)
        self.out_v_proj = tnn.Linear(embed_dim, v_dim)
        self.out_l_proj = tnn.Linear(embed_dim, l_dim)

    def forward(self, v, l, attention_mask_v=None, attention_mask_l=None):
        B, Nv, _ = v.shape
        Nl = l.shape[1]
        H, D = self.num_heads, self.head_dim

        q = (self.v_proj(v) * self.scale).view(B, Nv, H, D)
        k = self.l_proj(l).view(B, Nl, H, D)
        val_v = self.values_v_proj(v).view(B, Nv, H, D)
        val_l = self.values_l_proj(l).view(B, Nl, H, D)

        logits = torch.einsum("bvhd,blhd->bhvl", q, k)
        logits = logits - logits.max()
        logits = logits.clamp(min=-50000, max=50000)

        logits_t = logits.transpose(-1, -2)
        logits_l = logits_t - logits_t.max(dim=-1, keepdim=True)[0]
        logits_l = logits_l.clamp(min=-50000, max=50000)

        if attention_mask_v is not None:
            logits_l = logits_l.masked_fill(
                attention_mask_v[:, None, None, :], float("-inf")
            )
        attn_l = logits_l.softmax(dim=-1)
        if attention_mask_l is not None:
            logits = logits.masked_fill(
                attention_mask_l[:, None, None, :], float("-inf")
            )
        attn_v = logits.softmax(dim=-1)

        out_v = torch.einsum("bhvl,blhd->bvhd", attn_v, val_l).reshape(
            B, Nv, self.embed_dim
        )
        out_l = torch.einsum("bhlv,bvhd->blhd", attn_l, val_v).reshape(
            B, Nl, self.embed_dim
        )
        return self.out_v_proj(out_v), self.out_l_proj(out_l)


class TorchBiBlock(tnn.Module):
    """reference fuse_modules.py:252-295 (eval: drop_path = identity)."""

    def __init__(self, v_dim, l_dim, embed_dim, num_heads, init_values=1e-4):
        super().__init__()
        self.layer_norm_v = tnn.LayerNorm(v_dim)
        self.layer_norm_l = tnn.LayerNorm(l_dim)
        self.attn = TorchBiMHA(v_dim, l_dim, embed_dim, num_heads)
        self.gamma_v = tnn.Parameter(init_values * torch.ones(v_dim))
        self.gamma_l = tnn.Parameter(init_values * torch.ones(l_dim))

    def forward(self, v, l, attention_mask_v=None, attention_mask_l=None):
        v = self.layer_norm_v(v)
        l = self.layer_norm_l(l)
        dv, dl = self.attn(v, l, attention_mask_v, attention_mask_l)
        return v + self.gamma_v * dv, l + self.gamma_l * dl


def torch_sine_pos_embed(pos, num_pos_feats=128, temperature=10000,
                         exchange_xy=True):
    """reference utils.py:24-53."""
    scale = 2 * math.pi
    dim_t = torch.arange(num_pos_feats, dtype=torch.float32)
    dim_t = temperature ** (2 * torch.div(dim_t, 2, rounding_mode="floor")
                            / num_pos_feats)

    def sine(x):
        sx = x * scale / dim_t
        return torch.stack(
            (sx[..., 0::2].sin(), sx[..., 1::2].cos()), dim=-1
        ).flatten(-2)

    parts = [sine(x) for x in pos.split([1] * pos.shape[-1], dim=-1)]
    if exchange_xy:
        parts[0], parts[1] = parts[1], parts[0]
    return torch.cat(parts, dim=-1)


class TorchTextEnhancer(tnn.Module):
    """reference transformer_vanilla.py:72-123 TransformerEncoderLayer
    (post-norm, relu, eval mode) with sine pos from position_ids."""

    def __init__(self, d_model, nhead, dim_feedforward):
        super().__init__()
        self.self_attn = tnn.MultiheadAttention(d_model, nhead, batch_first=True)
        self.linear1 = tnn.Linear(d_model, dim_feedforward)
        self.linear2 = tnn.Linear(dim_feedforward, d_model)
        self.norm1 = tnn.LayerNorm(d_model)
        self.norm2 = tnn.LayerNorm(d_model)
        self.nhead = nhead
        self.d_model = d_model

    def forward(self, text, text_self_attention_masks, position_ids):
        pos = torch_sine_pos_embed(
            position_ids[..., None].float(), num_pos_feats=self.d_model,
            exchange_xy=False,
        )
        q = text + pos
        # torch attn_mask: True = not allowed; (B*nhead, T, T)
        mask = ~text_self_attention_masks
        mask = mask.repeat_interleave(self.nhead, dim=0)
        src2 = self.self_attn(q, q, text, attn_mask=mask, need_weights=False)[0]
        x = self.norm1(text + src2)
        h = self.linear2(F.relu(self.linear1(x)))
        return self.norm2(x + h)


def torch_gen_proposals(memory, memory_padding_mask, spatial_shapes):
    """reference utils.py:56-116 (learnedwh=None path)."""
    N, S, C = memory.shape
    proposals = []
    cur = 0
    for lvl, (H, W) in enumerate(spatial_shapes):
        mask_l = memory_padding_mask[:, cur: cur + H * W].view(N, H, W, 1)
        valid_H = torch.sum(~mask_l[:, :, 0, 0], 1)
        valid_W = torch.sum(~mask_l[:, 0, :, 0], 1)
        gy, gx = torch.meshgrid(
            torch.arange(H, dtype=torch.float32),
            torch.arange(W, dtype=torch.float32), indexing="ij",
        )
        grid = torch.cat([gx.unsqueeze(-1), gy.unsqueeze(-1)], -1)
        scale = torch.cat(
            [valid_W.unsqueeze(-1), valid_H.unsqueeze(-1)], 1
        ).view(N, 1, 1, 2).float()
        grid = (grid.unsqueeze(0).expand(N, -1, -1, -1) + 0.5) / scale
        wh = torch.ones_like(grid) * 0.05 * (2.0 ** lvl)
        proposals.append(torch.cat((grid, wh), -1).view(N, -1, 4))
        cur += H * W
    out = torch.cat(proposals, 1)
    valid = ((out > 0.01) & (out < 0.99)).all(-1, keepdim=True)
    out = torch.log(out / (1 - out))
    out = out.masked_fill(memory_padding_mask.unsqueeze(-1), float("inf"))
    out = out.masked_fill(~valid, float("inf"))
    mem = memory.masked_fill(memory_padding_mask.unsqueeze(-1), 0.0)
    mem = mem.masked_fill(~valid, 0.0)
    return mem, out


# ---------------------------------------------------------------------------
# tests
# ---------------------------------------------------------------------------


def _np(t):
    return t.detach().numpy()


def test_bi_attention_block_parity():
    torch.manual_seed(0)
    B, Nv, Nl, v_dim, l_dim, E, H = 2, 24, 11, 16, 12, 16, 4
    blk = TorchBiBlock(v_dim, l_dim, E, H).eval()
    # non-trivial norms/gammas so the scale path is exercised
    with torch.no_grad():
        blk.gamma_v += torch.randn(v_dim) * 0.01
        blk.gamma_l += torch.randn(l_dim) * 0.01

    v = torch.randn(B, Nv, v_dim)
    l = torch.randn(B, Nl, l_dim)
    mask_v = torch.zeros(B, Nv, dtype=torch.bool)
    mask_l = torch.zeros(B, Nl, dtype=torch.bool)
    mask_v[0, -5:] = True   # padded image tokens in sample 0
    mask_l[1, -3:] = True   # padded text tokens in sample 1
    with torch.no_grad():
        ref_v, ref_l = blk(v, l, mask_v, mask_l)

    sd = {k: _np(p) for k, p in blk.state_dict().items()}
    params = {
        "layer_norm_v": tc.layernorm(sd, "layer_norm_v"),
        "layer_norm_l": tc.layernorm(sd, "layer_norm_l"),
        "gamma_v": sd["gamma_v"],
        "gamma_l": sd["gamma_l"],
        "attn": {
            name: tc.linear(sd, f"attn.{name}")
            for name in ("v_proj", "l_proj", "values_v_proj",
                         "values_l_proj", "out_v_proj", "out_l_proj")
        },
    }
    out_v, out_l = BiAttentionBlock(v_dim, l_dim, E, H).apply(
        {"params": params}, jnp.asarray(_np(v)), jnp.asarray(_np(l)),
        jnp.asarray(_np(mask_v)), jnp.asarray(_np(mask_l)),
    )
    np.testing.assert_allclose(np.asarray(out_v), _np(ref_v),
                               rtol=1e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(out_l), _np(ref_l),
                               rtol=1e-4, atol=2e-5)


def test_sine_pos_embed_parity():
    pos = torch.rand(2, 7, 2) * 30
    for npf, exch in ((128, True), (64, False)):
        ref = torch_sine_pos_embed(pos, num_pos_feats=npf, exchange_xy=exch)
        mine = get_sine_pos_embed(
            jnp.asarray(_np(pos)), num_pos_feats=npf, exchange_xy=exch
        )
        np.testing.assert_allclose(np.asarray(mine), _np(ref),
                                   rtol=1e-5, atol=1e-5)


def test_text_enhancer_parity():
    torch.manual_seed(1)
    B, T, C, H, FF = 2, 13, 16, 4, 32
    layer = TorchTextEnhancer(C, H, FF).eval()

    text = torch.randn(B, T, C)
    # block-diagonal self-attention (two phrases + specials)
    sam = torch.zeros(B, T, T, dtype=torch.bool)
    for b in range(B):
        sam[b, :1, :1] = True
        sam[b, 1:6, 1:6] = True
        sam[b, 6:T, 6:T] = True
    position_ids = torch.tensor(
        [[0, 0, 1, 2, 3, 4] + list(range(T - 6))] * B
    )
    with torch.no_grad():
        ref = layer(text, sam, position_ids)

    sd = {k: _np(p) for k, p in layer.state_dict().items()}
    params = {
        "self_attn": {
            "in_proj_weight": sd["self_attn.in_proj_weight"],
            "in_proj_bias": sd["self_attn.in_proj_bias"],
            "out_proj": tc.linear(sd, "self_attn.out_proj"),
        },
        "linear1": tc.linear(sd, "linear1"),
        "linear2": tc.linear(sd, "linear2"),
        "norm1": tc.layernorm(sd, "norm1"),
        "norm2": tc.layernorm(sd, "norm2"),
    }
    mine = TextEnhancerLayer(C, H, FF).apply(
        {"params": params}, jnp.asarray(_np(text)),
        jnp.asarray(_np(sam)), jnp.asarray(_np(position_ids)),
    )
    np.testing.assert_allclose(np.asarray(mine), _np(ref),
                               rtol=1e-4, atol=2e-5)


def test_two_stage_select_parity():
    """reference transformer.py:285-328 'standard' two-stage selection:
    topk by max token logit, gather unsigmoid refpoints / sigmoid proposals
    / token features."""
    torch.manual_seed(4)
    B, S, C, T, NQ = 2, 40, 8, 6, 7
    memory = torch.randn(B, S, C)
    proposals = torch.randn(B, S, 4)
    # mask a few proposal rows to +inf like gen_encoder_output_proposals does
    proposals[0, -4:] = float("inf")
    delta = torch.randn(B, S, 4)
    logits = torch.randn(B, S, T)
    logits[0, -4:] = float("-inf")  # masked tokens never selected

    # torch oracle
    topk_logits = logits.max(-1)[0]
    coords_unsel = delta + proposals
    topk_idx = torch.topk(topk_logits, NQ, dim=1)[1]
    ref_refpoint = torch.gather(
        coords_unsel, 1, topk_idx.unsqueeze(-1).repeat(1, 1, 4)
    )
    ref_init = torch.gather(
        proposals, 1, topk_idx.unsqueeze(-1).repeat(1, 1, 4)
    ).sigmoid()
    ref_tgt = torch.gather(memory, 1, topk_idx.unsqueeze(-1).repeat(1, 1, C))

    refpoint, init_box, tgt = two_stage_select(
        jnp.asarray(_np(memory)), jnp.asarray(_np(proposals)),
        jnp.asarray(_np(delta)), jnp.asarray(_np(logits)), NQ,
    )
    np.testing.assert_allclose(np.asarray(refpoint), _np(ref_refpoint),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(init_box), _np(ref_init),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(tgt), _np(ref_tgt),
                               rtol=1e-5, atol=1e-6)


def test_gen_encoder_output_proposals_parity():
    torch.manual_seed(2)
    shapes = ((6, 8), (3, 4), (2, 2))
    S = sum(h * w for h, w in shapes)
    B, C = 2, 10
    memory = torch.randn(B, S, C)
    # realistic top-left-valid padding rectangles per level
    mask = torch.zeros(B, S, dtype=torch.bool)
    cur = 0
    for (H, W) in shapes:
        m = torch.zeros(B, H, W, dtype=torch.bool)
        m[0, :, W - max(1, W // 4):] = True   # sample 0: right pad
        m[1, H - max(1, H // 3):, :] = True   # sample 1: bottom pad
        mask[:, cur: cur + H * W] = m.reshape(B, -1)
        cur += H * W

    ref_mem, ref_prop = torch_gen_proposals(memory, mask, shapes)
    mem, prop = gen_encoder_output_proposals(
        jnp.asarray(_np(memory)), jnp.asarray(_np(mask)), shapes
    )
    np.testing.assert_allclose(np.asarray(mem), _np(ref_mem),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(prop), _np(ref_prop),
                               rtol=1e-5, atol=1e-5)


def test_fused_bi_attention_pallas_matches_xla():
    """ops/fusion_pallas flash kernel vs the literal XLA formulation
    (interpret mode on CPU; same test compiles on TPU).  Covers both
    directions, text padding, image padding, and Nv not a multiple of the
    128 block."""
    from open_groundingdino_tpu.models.layers import BiMultiHeadAttention

    torch.manual_seed(7)
    B, Nv, Nl, v_dim, l_dim, E, H = 2, 150, 16, 24, 20, 32, 4
    rng = np.random.RandomState(7)
    v = jnp.asarray(rng.randn(B, Nv, v_dim), jnp.float32)
    l = jnp.asarray(rng.randn(B, Nl, l_dim), jnp.float32)
    mask_v = np.zeros((B, Nv), bool)
    mask_v[0, -17:] = True
    mask_l = np.zeros((B, Nl), bool)
    mask_l[1, -5:] = True
    mask_v = jnp.asarray(mask_v)
    mask_l = jnp.asarray(mask_l)

    mod_x = BiMultiHeadAttention(v_dim, l_dim, E, H, impl="xla")
    params = mod_x.init(jax.random.PRNGKey(0), v, l, mask_v, mask_l)
    ref_v, ref_l = mod_x.apply(params, v, l, mask_v, mask_l)

    mod_p = BiMultiHeadAttention(v_dim, l_dim, E, H, impl="pallas")
    out_v, out_l = mod_p.apply(params, v, l, mask_v, mask_l)
    np.testing.assert_allclose(np.asarray(out_v), np.asarray(ref_v),
                               rtol=1e-4, atol=1e-5)
    # padded text rows carry garbage in the flash path (masked downstream):
    # compare live rows only
    live_l = np.asarray(~mask_l)
    np.testing.assert_allclose(
        np.asarray(out_l)[live_l], np.asarray(ref_l)[live_l],
        rtol=1e-4, atol=1e-5,
    )


@pytest.mark.parametrize("rv_slices", ["0", "1"])
def test_fused_bi_attention_grads_match_xla(rv_slices, monkeypatch):
    """Flash backward (_fused_bwd_kernel) vs autodiff of the XLA
    formulation: full param + input grads through BiMultiHeadAttention.
    Parametrized over FUSION_RV_SLICES (per-head lane-slice rv term)."""
    monkeypatch.setenv("FUSION_RV_SLICES", rv_slices)
    from open_groundingdino_tpu.models.layers import BiMultiHeadAttention

    B, Nv, Nl, v_dim, l_dim, E, H = 2, 140, 12, 16, 12, 32, 4
    rng = np.random.RandomState(3)
    v = jnp.asarray(rng.randn(B, Nv, v_dim), jnp.float32)
    l = jnp.asarray(rng.randn(B, Nl, l_dim), jnp.float32)
    mask_v = np.zeros((B, Nv), bool)
    mask_v[1, -11:] = True
    mask_l = np.zeros((B, Nl), bool)
    mask_l[0, -3:] = True
    mask_v, mask_l = jnp.asarray(mask_v), jnp.asarray(mask_l)

    mod_x = BiMultiHeadAttention(v_dim, l_dim, E, H, impl="xla")
    mod_p = BiMultiHeadAttention(v_dim, l_dim, E, H, impl="pallas")
    params = mod_x.init(jax.random.PRNGKey(2), v, l, mask_v, mask_l)

    live_l = (~mask_l)[..., None]

    def loss(mod, p, v_, l_):
        ov, ol = mod.apply(p, v_, l_, mask_v, mask_l)
        # padded text rows diverge (documented f32 shift effect) and are
        # key-masked downstream; exclude them from the scalar
        return jnp.sum(ov ** 2) + jnp.sum(jnp.where(live_l, ol, 0.0) ** 2)

    gx = jax.grad(lambda p, v_, l_: loss(mod_x, p, v_, l_),
                  argnums=(0, 1, 2))(params, v, l)
    gp = jax.grad(lambda p, v_, l_: loss(mod_p, p, v_, l_),
                  argnums=(0, 1, 2))(params, v, l)
    for a, b in zip(jax.tree_util.tree_leaves(gp),
                    jax.tree_util.tree_leaves(gx)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4)
