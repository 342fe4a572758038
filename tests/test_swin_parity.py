"""Swin backbone numeric parity vs a hand-built torch oracle.

The torch side re-implements the reference Swin semantics
(models/GroundingDINO/backbone/swin_transformer.py:77-176 WindowAttention +
SwinTransformerBlock, :222-249 PatchMerging, :378-460 BasicLayer,
:550-690 SwinTransformer) with reference-compatible state-dict keys, so the
test also certifies convert_swin_state_dict on the exact keys a published
checkpoint provides.  Covers: patch embed, window attention with relative
position bias, SHIFTED windows with the -100 additive mask, window padding
(non-divisible extents), patch merging with odd-extent padding, and
per-out-stage LayerNorms.
"""
import numpy as np
import torch
import torch.nn as tnn
import torch.nn.functional as F

import jax.numpy as jnp

from open_groundingdino_tpu.models.swin import SwinConfig, SwinTransformer
from open_groundingdino_tpu.utils.torch_convert import convert_swin_state_dict


def _rel_index(ws):
    coords = torch.stack(
        torch.meshgrid(torch.arange(ws), torch.arange(ws), indexing="ij")
    )
    flat = coords.flatten(1)
    rel = flat[:, :, None] - flat[:, None, :]
    rel = rel.permute(1, 2, 0).contiguous()
    rel[:, :, 0] += ws - 1
    rel[:, :, 1] += ws - 1
    rel[:, :, 0] *= 2 * ws - 1
    return rel.sum(-1)


class TorchWindowAttention(tnn.Module):
    def __init__(self, dim, num_heads, ws):
        super().__init__()
        self.num_heads = num_heads
        self.ws = ws
        self.scale = (dim // num_heads) ** -0.5
        self.qkv = tnn.Linear(dim, dim * 3, bias=True)
        self.proj = tnn.Linear(dim, dim)
        self.relative_position_bias_table = tnn.Parameter(
            torch.randn((2 * ws - 1) ** 2, num_heads) * 0.02
        )
        self.register_buffer("rel_idx", _rel_index(ws), persistent=False)

    def forward(self, x, mask=None):
        B_, N, C = x.shape
        H = self.num_heads
        qkv = self.qkv(x).reshape(B_, N, 3, H, C // H).permute(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        attn = (q * self.scale) @ k.transpose(-2, -1)
        bias = self.relative_position_bias_table[self.rel_idx.view(-1)].view(
            N, N, H
        ).permute(2, 0, 1)
        attn = attn + bias.unsqueeze(0)
        if mask is not None:
            nW = mask.shape[0]
            attn = attn.view(B_ // nW, nW, H, N, N) + mask[None, :, None]
            attn = attn.view(B_, H, N, N)
        attn = attn.softmax(dim=-1)
        out = (attn @ v).transpose(1, 2).reshape(B_, N, C)
        return self.proj(out)


class TorchSwinBlock(tnn.Module):
    def __init__(self, dim, num_heads, ws, shift, mlp_ratio=4.0):
        super().__init__()
        self.ws, self.shift = ws, shift
        self.norm1 = tnn.LayerNorm(dim)
        self.attn = TorchWindowAttention(dim, num_heads, ws)
        self.norm2 = tnn.LayerNorm(dim)
        self.mlp = tnn.Module()
        self.mlp.fc1 = tnn.Linear(dim, int(dim * mlp_ratio))
        self.mlp.fc2 = tnn.Linear(int(dim * mlp_ratio), dim)

    def forward(self, x, H, W):
        B, L, C = x.shape
        ws = self.ws
        shortcut = x
        x = self.norm1(x).view(B, H, W, C)
        pad_b = (ws - H % ws) % ws
        pad_r = (ws - W % ws) % ws
        x = F.pad(x, (0, 0, 0, pad_r, 0, pad_b))
        Hp, Wp = H + pad_b, W + pad_r
        if self.shift > 0:
            x = torch.roll(x, (-self.shift, -self.shift), dims=(1, 2))
            img = torch.zeros(Hp, Wp)
            cnt = 0
            for hs in (slice(0, -ws), slice(-ws, -self.shift),
                       slice(-self.shift, None)):
                for wsl in (slice(0, -ws), slice(-ws, -self.shift),
                            slice(-self.shift, None)):
                    img[hs, wsl] = cnt
                    cnt += 1
            win = img.view(Hp // ws, ws, Wp // ws, ws).permute(
                0, 2, 1, 3
            ).reshape(-1, ws * ws)
            mask = win.unsqueeze(1) - win.unsqueeze(2)
            mask = mask.masked_fill(mask != 0, -100.0).masked_fill(
                mask == 0, 0.0
            )
        else:
            mask = None
        wins = x.view(B, Hp // ws, ws, Wp // ws, ws, C).permute(
            0, 1, 3, 2, 4, 5
        ).reshape(-1, ws * ws, C)
        wins = self.attn(wins, mask)
        x = wins.view(B, Hp // ws, Wp // ws, ws, ws, C).permute(
            0, 1, 3, 2, 4, 5
        ).reshape(B, Hp, Wp, C)
        if self.shift > 0:
            x = torch.roll(x, (self.shift, self.shift), dims=(1, 2))
        x = x[:, :H, :W].reshape(B, L, C)
        x = shortcut + x
        return x + self.mlp.fc2(F.gelu(self.mlp.fc1(self.norm2(x))))


class TorchPatchMerging(tnn.Module):
    def __init__(self, dim):
        super().__init__()
        self.norm = tnn.LayerNorm(4 * dim)
        self.reduction = tnn.Linear(4 * dim, 2 * dim, bias=False)

    def forward(self, x, H, W):
        B, L, C = x.shape
        x = x.view(B, H, W, C)
        if H % 2 or W % 2:
            x = F.pad(x, (0, 0, 0, W % 2, 0, H % 2))
        x0 = x[:, 0::2, 0::2]
        x1 = x[:, 1::2, 0::2]
        x2 = x[:, 0::2, 1::2]
        x3 = x[:, 1::2, 1::2]
        x = torch.cat([x0, x1, x2, x3], -1).view(B, -1, 4 * C)
        return self.reduction(self.norm(x))


class TorchSwin(tnn.Module):
    """Reference-shaped Swin with reference state-dict keys."""

    def __init__(self, embed_dim, depths, num_heads, ws, out_indices):
        super().__init__()
        self.depths, self.out_indices = depths, out_indices
        self.patch_embed = tnn.Module()
        self.patch_embed.proj = tnn.Conv2d(3, embed_dim, 4, stride=4)
        self.patch_embed.norm = tnn.LayerNorm(embed_dim)
        self.layers = tnn.ModuleList()
        for i, d in enumerate(depths):
            dim = embed_dim * (2 ** i)
            stage = tnn.Module()
            stage.blocks = tnn.ModuleList(
                [
                    TorchSwinBlock(dim, num_heads[i], ws,
                                   0 if b % 2 == 0 else ws // 2)
                    for b in range(d)
                ]
            )
            if i < len(depths) - 1:
                stage.downsample = TorchPatchMerging(dim)
            self.layers.append(stage)
        for i in out_indices:
            setattr(self, f"norm{i}", tnn.LayerNorm(embed_dim * (2 ** i)))

    def forward(self, x):
        x = self.patch_embed.proj(x)  # (B, C, Wh, Ww)
        B, C, Wh, Ww = x.shape
        x = x.flatten(2).transpose(1, 2)
        x = self.patch_embed.norm(x)
        outs = []
        for i, stage in enumerate(self.layers):
            for blk in stage.blocks:
                x = blk(x, Wh, Ww)
            if i in self.out_indices:
                y = getattr(self, f"norm{i}")(x)
                outs.append(y.view(B, Wh, Ww, -1))
            if i < len(self.depths) - 1:
                x = stage.downsample(x, Wh, Ww)
                Wh, Ww = (Wh + 1) // 2, (Ww + 1) // 2
        return outs


def test_swin_parity_vs_torch():
    torch.manual_seed(0)
    embed_dim, depths, heads, ws = 8, (2, 2), (2, 4), 4
    out_indices = (0, 1)
    # 36x44 image -> 9x11 tokens: window padding (to 12x12), shifted blocks,
    # and odd-extent patch merging are all exercised
    model = TorchSwin(embed_dim, depths, heads, ws, out_indices).eval()
    x = torch.randn(2, 3, 36, 44)
    with torch.no_grad():
        ref = [t.numpy() for t in model(x)]

    sd = {k: v.numpy() for k, v in model.state_dict().items()}
    params = convert_swin_state_dict(sd, depths, out_indices)
    cfg = SwinConfig(
        embed_dim=embed_dim, depths=depths, num_heads=heads, window_size=ws,
        out_indices=out_indices,
    )
    feats = SwinTransformer(cfg).apply(
        {"params": params}, jnp.asarray(x.numpy().transpose(0, 2, 3, 1))
    )
    assert len(feats) == len(ref)
    for mine, theirs in zip(feats, ref):
        assert mine.shape == theirs.shape
        np.testing.assert_allclose(
            np.asarray(mine), theirs, rtol=1e-4, atol=1e-4
        )


def test_swin_parity_divisible_no_shift_pad():
    """Clean path: extents divisible by window and by 2 at merging."""
    torch.manual_seed(3)
    embed_dim, depths, heads, ws = 8, (1, 1), (2, 4), 4
    out_indices = (0, 1)
    model = TorchSwin(embed_dim, depths, heads, ws, out_indices).eval()
    x = torch.randn(1, 3, 32, 64)  # 8x16 tokens
    with torch.no_grad():
        ref = [t.numpy() for t in model(x)]
    sd = {k: v.numpy() for k, v in model.state_dict().items()}
    params = convert_swin_state_dict(sd, depths, out_indices)
    cfg = SwinConfig(
        embed_dim=embed_dim, depths=depths, num_heads=heads, window_size=ws,
        out_indices=out_indices,
    )
    feats = SwinTransformer(cfg).apply(
        {"params": params}, jnp.asarray(x.numpy().transpose(0, 2, 3, 1))
    )
    for mine, theirs in zip(feats, ref):
        np.testing.assert_allclose(
            np.asarray(mine), theirs, rtol=1e-4, atol=1e-4
        )
