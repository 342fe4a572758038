"""Torch-oracle numeric parity for the RepViT segmentor (pave/repvit_seg.py).

A reference-faithful torch mirror of the RepViT block family (RepVGG-style
dw token mixer with identity BN, SE with hard-sigmoid gate, 2x conv FFN,
stride-2 downsample; the structure of the RepViT paper the reference's
mmseg backbone instantiates, `/root/reference/inference_on_a_image_pave.py:187-283`)
plus an FPN/FPNHead mirror is built in torch eval mode with random weights,
converted through the real helpers (fold_torch_bn / torch_conv_kernel),
and compared against the Flax model."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
import torch.nn as tnn
import torch.nn.functional as tF

from open_groundingdino_tpu.pave.repvit_seg import (
    RepViTBackbone, RepViTConfig, RepViTSegmentor, fold_torch_bn,
    torch_conv_kernel,
)

CFG = RepViTConfig(widths=(8, 16, 24, 32), depths=(1, 1, 2, 1), fpn_dim=16)


class TConvBN(tnn.Module):
    def __init__(self, ci, co, k, s=1, groups=1):
        super().__init__()
        self.conv = tnn.Conv2d(ci, co, k, s, k // 2, groups=groups, bias=False)
        self.bn = tnn.BatchNorm2d(co)

    def forward(self, x):
        return self.bn(self.conv(x))


class TSE(tnn.Module):
    def __init__(self, c):
        super().__init__()
        self.fc1 = tnn.Conv2d(c, max(c // 4, 8), 1)
        self.fc2 = tnn.Conv2d(max(c // 4, 8), c, 1)

    def forward(self, x):
        s = x.mean((2, 3), keepdim=True)
        s = self.fc2(tF.relu(self.fc1(s)))
        return x * torch.clamp(s / 6.0 + 0.5, 0.0, 1.0)


class TRepVGGDW(tnn.Module):
    def __init__(self, c):
        super().__init__()
        self.dw3 = TConvBN(c, c, 3, groups=c)
        self.dw1 = tnn.Conv2d(c, c, 1, groups=c, bias=False)
        self.out_bn = tnn.BatchNorm2d(c)

    def forward(self, x):
        return self.out_bn(self.dw3(x) + self.dw1(x) + x)


class TFFN(tnn.Module):
    def __init__(self, c, co=None):
        super().__init__()
        co = co or c
        self.up = TConvBN(co, 2 * co, 1)
        self.down = TConvBN(2 * co, co, 1)

    def forward(self, x):
        return x + self.down(tF.gelu(self.up(x), approximate="none"))


class TBlock(tnn.Module):
    def __init__(self, c, use_se):
        super().__init__()
        self.mixer = TRepVGGDW(c)
        self.se = TSE(c) if use_se else tnn.Identity()
        self.ffn = TFFN(c)

    def forward(self, x):
        return self.ffn(self.se(self.mixer(x)))


class TDown(tnn.Module):
    def __init__(self, ci, co):
        super().__init__()
        self.dw = TConvBN(ci, ci, 3, s=2, groups=ci)
        self.se = TSE(ci)
        self.pw = TConvBN(ci, co, 1)
        self.ffn = TFFN(co)

    def forward(self, x):
        return self.ffn(self.pw(self.se(self.dw(x))))


class TBackbone(tnn.Module):
    def __init__(self, cfg):
        super().__init__()
        w = cfg.widths
        self.stem0 = TConvBN(3, w[0] // 2, 3, s=2)
        self.stem1 = TConvBN(w[0] // 2, w[0], 3, s=2)
        self.stages = tnn.ModuleList()
        self.downs = tnn.ModuleList()
        for s, (width, depth) in enumerate(zip(w, cfg.depths)):
            self.downs.append(TDown(w[s - 1], width) if s > 0
                              else tnn.Identity())
            self.stages.append(tnn.ModuleList(
                [TBlock(width, b % 2 == 0) for b in range(depth)]))

    def forward(self, x):
        x = self.stem1(tF.gelu(self.stem0(x), approximate="none"))
        feats = []
        for down, stage in zip(self.downs, self.stages):
            x = down(x)
            for blk in stage:
                x = blk(x)
            feats.append(x)
        return feats


class THead(tnn.Module):
    """mmseg sem_fpn mirror matching SemanticFPN (nearest top-down FPN,
    per-octave conv-GN-ReLU scale heads with 2x bilinear upsamples)."""

    def __init__(self, cfg):
        super().__init__()
        d, groups = cfg.fpn_dim, np.gcd(cfg.fpn_dim, 32)
        self.lats = tnn.ModuleList(
            [tnn.Conv2d(w, d, 1) for w in cfg.widths])
        self.outs = tnn.ModuleList(
            [tnn.Conv2d(d, d, 3, padding=1) for _ in cfg.widths])
        self.scales = tnn.ModuleList()
        for i in range(len(cfg.widths)):
            convs = tnn.ModuleList()
            for _ in range(max(1, i)):
                convs.append(tnn.ModuleList(
                    [tnn.Conv2d(d, d, 3, padding=1),
                     tnn.GroupNorm(groups, d, eps=1e-5)]))
            self.scales.append(convs)
        self.cls = tnn.Conv2d(d, cfg.num_classes, 1)

    def forward(self, feats):
        lat = [l(f) for l, f in zip(self.lats, feats)]
        for i in range(len(lat) - 2, -1, -1):
            lat[i] = lat[i] + tF.interpolate(
                lat[i + 1], size=lat[i].shape[2:], mode="nearest")
        outs = [o(l) for o, l in zip(self.outs, lat)]
        base = outs[0].shape[2:]
        acc = None
        for i, o in enumerate(outs):
            for conv, gn in self.scales[i]:
                o = tF.relu(gn(conv(o)))
                if o.shape[2:] != base:
                    o = tF.interpolate(
                        o, size=(min(base[0], o.shape[2] * 2),
                                 min(base[1], o.shape[3] * 2)),
                        mode="bilinear", align_corners=False)
            acc = o if acc is None else acc + o
        return self.cls(acc)


def _randomize(m, seed):
    g = torch.Generator().manual_seed(seed)
    for p in m.parameters():
        with torch.no_grad():
            p.copy_(torch.randn(p.shape, generator=g) * 0.1)
    for mod in m.modules():
        if isinstance(mod, tnn.BatchNorm2d):
            with torch.no_grad():
                mod.running_mean.copy_(
                    torch.randn(mod.running_mean.shape, generator=g) * 0.1)
                mod.running_var.copy_(
                    torch.rand(mod.running_var.shape, generator=g) + 0.5)


def _cv(sd, prefix):  # conv kernel
    return jnp.asarray(torch_conv_kernel(sd, prefix))


def _cb(sd, prefix):  # conv bias
    return jnp.asarray(np.asarray(sd[f"{prefix}.bias"]))


def _bn(sd, prefix):
    f = fold_torch_bn(sd, prefix)
    return {k: jnp.asarray(v) for k, v in f.items()}


def _convbn_into(tree, flax_name, sd, torch_prefix):
    tree[f"{flax_name}_conv"] = {"kernel": _cv(sd, f"{torch_prefix}.conv")}
    tree[f"{flax_name}_bn"] = _bn(sd, f"{torch_prefix}.bn")


def _se_params(sd, p):
    return {"fc1": {"kernel": _cv(sd, f"{p}.fc1"), "bias": _cb(sd, f"{p}.fc1")},
            "fc2": {"kernel": _cv(sd, f"{p}.fc2"), "bias": _cb(sd, f"{p}.fc2")}}


def _ffn_into(tree, sd, p):
    _convbn_into(tree, "ffn_up", sd, f"{p}.up")
    _convbn_into(tree, "ffn_down", sd, f"{p}.down")


def _block_params(sd, p, use_se):
    mixer = {}
    _convbn_into(mixer, "dw3", sd, f"{p}.mixer.dw3")
    mixer["dw1_conv"] = {"kernel": _cv(sd, f"{p}.mixer.dw1")}
    mixer["out_bn"] = _bn(sd, f"{p}.mixer.out_bn")
    tree = {"mixer": mixer}
    if use_se:
        tree["se"] = _se_params(sd, f"{p}.se")
    _ffn_into(tree, sd, f"{p}.ffn")
    return tree


def _down_params(sd, p):
    tree = {"se": _se_params(sd, f"{p}.se")}
    _convbn_into(tree, "dw", sd, f"{p}.dw")
    _convbn_into(tree, "pw", sd, f"{p}.pw")
    _ffn_into(tree, sd, f"{p}.ffn")
    return tree


def _backbone_params(sd, cfg, prefix=""):
    tree = {}
    _convbn_into(tree, "stem0", sd, f"{prefix}stem0")
    _convbn_into(tree, "stem1", sd, f"{prefix}stem1")
    for s, depth in enumerate(cfg.depths):
        if s > 0:
            tree[f"down{s}"] = _down_params(sd, f"{prefix}downs.{s}")
        for b in range(depth):
            tree[f"stage{s}_block{b}"] = _block_params(
                sd, f"{prefix}stages.{s}.{b}", b % 2 == 0)
    return tree


def _head_params(sd, cfg, prefix=""):
    tree = {}
    for i in range(len(cfg.widths)):
        tree[f"lateral{i}"] = {"kernel": _cv(sd, f"{prefix}lats.{i}"),
                               "bias": _cb(sd, f"{prefix}lats.{i}")}
        tree[f"fpn_out{i}"] = {"kernel": _cv(sd, f"{prefix}outs.{i}"),
                               "bias": _cb(sd, f"{prefix}outs.{i}")}
        for r in range(max(1, i)):
            tree[f"scale{i}_conv{r}"] = {
                "kernel": _cv(sd, f"{prefix}scales.{i}.{r}.0"),
                "bias": _cb(sd, f"{prefix}scales.{i}.{r}.0")}
            tree[f"scale{i}_gn{r}"] = {
                "scale": jnp.asarray(
                    np.asarray(sd[f"{prefix}scales.{i}.{r}.1.weight"])),
                "bias": jnp.asarray(
                    np.asarray(sd[f"{prefix}scales.{i}.{r}.1.bias"]))}
    tree["cls"] = {"kernel": _cv(sd, f"{prefix}cls"),
                   "bias": _cb(sd, f"{prefix}cls")}
    return tree


def test_backbone_matches_torch_mirror():
    tm = TBackbone(CFG).eval()
    _randomize(tm, 0)
    sd = tm.state_dict()
    x = np.random.RandomState(1).randn(2, 64, 96, 3).astype(np.float32)
    with torch.no_grad():
        want = [t.permute(0, 2, 3, 1).numpy()
                for t in tm(torch.from_numpy(x).permute(0, 3, 1, 2))]

    params = {"params": _backbone_params(sd, CFG)}
    got = jax.jit(RepViTBackbone(CFG).apply)(params, jnp.asarray(x))
    assert len(got) == len(want)
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), w, rtol=2e-4, atol=2e-4)


def test_full_segmentor_matches_torch_mirror():
    tb, th = TBackbone(CFG).eval(), THead(CFG).eval()
    _randomize(tb, 2)
    _randomize(th, 3)
    x = np.random.RandomState(4).randn(1, 64, 64, 3).astype(np.float32)
    with torch.no_grad():
        xt = torch.from_numpy(x).permute(0, 3, 1, 2)
        logits = th(tb(xt))
        want = tF.interpolate(logits, size=(64, 64), mode="bilinear",
                              align_corners=False)
        want = want.permute(0, 2, 3, 1).numpy()

    params = {"params": {
        "backbone": _backbone_params(tb.state_dict(), CFG),
        "head": _head_params(th.state_dict(), CFG),
    }}
    got = jax.jit(RepViTSegmentor(CFG).apply)(params, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), want, rtol=3e-4, atol=3e-4)
