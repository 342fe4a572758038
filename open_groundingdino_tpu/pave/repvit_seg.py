"""RepViT + Semantic-FPN car segmentor for the PAVE crop pipeline
(TPU-native Flax, NHWC).

The reference's single-image PAVE flow first runs an mmseg Semantic-FPN
segmentor with a RepViT backbone over the frame, takes the car-class mask,
and derives a tight bbox that seeds the sliding-crop grid
(`/root/reference/inference_on_a_image_pave.py:187-283` ``repvit_stuff`` —
mmseg ``build_segmentor`` on a ``sem_fpn`` config — and ``:337-357``
``get_tight_bbox``).  That stage depends on an external repo, mmcv/mmseg,
and author-machine checkpoint paths, none of which exist here; this module
re-implements the architecture natively so the bbox can be *derived* from a
segmentation checkpoint instead of supplied by the caller.

Architecture (RepViT paper, CVPR'24 "RepViT: Revisiting Mobile CNN From ViT
Perspective" — M1.1 scaling by default):
  stem:   3x3/s2 conv-BN -> GELU -> 3x3/s2 conv-BN            (1/4 scale)
  stages: RepViT blocks = RepVGG-style depthwise token mixer
          (3x3 dw conv-BN + 1x1 dw conv + identity BN, additively merged —
          reparameterizable at deploy) -> optional SE (every other block)
          -> residual 2x channel-mixer FFN (1x1 conv-BN, GELU, 1x1 conv-BN)
  downsample between stages: stride-2 dw conv-BN -> SE -> 1x1 conv-BN to
          the new width, then a residual FFN.
  head:   FPN neck (1x1 laterals to 256, top-down upsample+add, 3x3 outs)
          + mmseg-style FPNHead (per-level 3x3 conv-GN-ReLU scale heads
          upsampled to 1/4 scale, summed, 1x1 classifier).

Inference-only: BN is the frozen affine form (stats folded server-side,
mirroring the repo's ResNet FrozenBatchNorm and mmseg deploy behavior).
``car_mask_to_bbox`` reproduces ``get_tight_bbox``'s tight min/max over
mask-covered coordinates, returned in the (x0, y0, x1, y1) frame-pixel
order ``pave.crop_utils.create_crop_boxes`` consumes.
"""
from __future__ import annotations

import functools
import math
from dataclasses import dataclass, field
from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class RepViTConfig:
    """M1.1 scaling by default: 4 stages, widths x2 per stage, SE on every
    other non-downsample block (paper Table 1)."""

    widths: Tuple[int, ...] = (64, 128, 256, 512)
    depths: Tuple[int, ...] = (2, 2, 12, 2)
    num_classes: int = 2          # background / car
    car_class: int = 1
    fpn_dim: int = 128            # mmseg sem_fpn default is 256; PAVE's
    # checkpoint config is private — keep configurable.

    @staticmethod
    def from_name(name: str) -> "RepViTConfig":
        if name in ("m0_9", "repvit_m0_9"):
            return RepViTConfig(widths=(48, 96, 192, 384),
                                depths=(2, 2, 14, 2))
        if name in ("m1_1", "repvit_m1_1"):
            return RepViTConfig()
        if name in ("m1_5", "repvit_m1_5"):
            return RepViTConfig(widths=(64, 128, 256, 512),
                                depths=(4, 4, 24, 4))
        if name in ("m2_3", "repvit_m2_3"):
            return RepViTConfig(widths=(80, 160, 320, 640),
                                depths=(6, 6, 34, 2))
        if name == "nano_test":  # CI-sized, mirrors swin_nano_test
            return RepViTConfig(widths=(8, 16, 24, 32), depths=(1, 1, 2, 1),
                                fpn_dim=16)
        raise ValueError(f"unknown RepViT variant {name!r}")


class FrozenBN(nn.Module):
    """Inference BatchNorm as a learned affine (scale, bias) pair — the
    deploy form after folding running stats, same contract as
    models/resnet.FrozenBatchNorm."""

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        return x * scale + bias


def _conv_bn(x, features: int, kernel: int, stride: int = 1,
             groups: int = 1, *, name: str):
    x = nn.Conv(features, (kernel, kernel), strides=(stride, stride),
                padding=kernel // 2, feature_group_count=groups,
                use_bias=False, name=f"{name}_conv")(x)
    return FrozenBN(name=f"{name}_bn")(x)


class SqueezeExcite(nn.Module):
    """SE with the paper's 1/4 reduction (ReLU -> hard-sigmoid gate)."""

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        s = jnp.mean(x, axis=(1, 2), keepdims=True)
        s = nn.Conv(max(c // 4, 8), (1, 1), name="fc1")(s)
        s = nn.relu(s)
        s = nn.Conv(c, (1, 1), name="fc2")(s)
        gate = jnp.clip(s / 6.0 + 0.5, 0.0, 1.0)
        return x * gate


class RepVGGDW(nn.Module):
    """Additive 3x3-dw + 1x1-dw + identity token mixer (train form; a
    deploy-time reparameterization would fold all three into one 3x3 dw
    conv — XLA already fuses the adds, so we keep the faithful form)."""

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        a = _conv_bn(x, c, 3, groups=c, name="dw3")
        b = nn.Conv(c, (1, 1), feature_group_count=c, use_bias=False,
                    name="dw1_conv")(x)
        return FrozenBN(name="out_bn")(a + b + x)


class RepViTBlock(nn.Module):
    use_se: bool

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        t = RepVGGDW(name="mixer")(x)
        if self.use_se:
            t = SqueezeExcite(name="se")(t)
        x = t
        # residual 2x FFN of 1x1 convs (channel mixer)
        h = _conv_bn(x, 2 * c, 1, name="ffn_up")
        h = nn.gelu(h, approximate=False)
        h = _conv_bn(h, c, 1, name="ffn_down")
        return x + h


class RepViTDownsample(nn.Module):
    out_width: int

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        t = _conv_bn(x, c, 3, stride=2, groups=c, name="dw")
        t = SqueezeExcite(name="se")(t)
        x = _conv_bn(t, self.out_width, 1, name="pw")
        h = _conv_bn(x, 2 * self.out_width, 1, name="ffn_up")
        h = nn.gelu(h, approximate=False)
        h = _conv_bn(h, self.out_width, 1, name="ffn_down")
        return x + h


class RepViTBackbone(nn.Module):
    cfg: RepViTConfig

    @nn.compact
    def __call__(self, x):
        w = self.cfg.widths
        x = _conv_bn(x, w[0] // 2, 3, stride=2, name="stem0")
        x = nn.gelu(x, approximate=False)
        x = _conv_bn(x, w[0], 3, stride=2, name="stem1")
        feats = []
        for s, (width, depth) in enumerate(zip(w, self.cfg.depths)):
            if s > 0:
                x = RepViTDownsample(width, name=f"down{s}")(x)
            for b in range(depth):
                x = RepViTBlock(use_se=(b % 2 == 0),
                                name=f"stage{s}_block{b}")(x)
            feats.append(x)
        return feats  # 1/4, 1/8, 1/16, 1/32 NHWC


def _resize_nearest(x, hw):
    return jax.image.resize(x, (x.shape[0], hw[0], hw[1], x.shape[-1]),
                            method="nearest")


def _resize_bilinear(x, hw):
    return jax.image.resize(x, (x.shape[0], hw[0], hw[1], x.shape[-1]),
                            method="bilinear")


class SemanticFPN(nn.Module):
    """mmseg ``sem_fpn``: FPN neck + FPNHead, logits at 1/4 scale."""

    cfg: RepViTConfig

    @nn.compact
    def __call__(self, feats):
        d = self.cfg.fpn_dim
        lat = [nn.Conv(d, (1, 1), name=f"lateral{i}")(f)
               for i, f in enumerate(feats)]
        for i in range(len(lat) - 2, -1, -1):
            lat[i] = lat[i] + _resize_nearest(lat[i + 1], lat[i].shape[1:3])
        outs = [nn.Conv(d, (3, 3), padding=1, name=f"fpn_out{i}")(l)
                for i, l in enumerate(lat)]
        base_hw = outs[0].shape[1:3]
        # largest power-of-two divisor of d up to 32, so any fpn_dim works
        groups = math.gcd(d, 32)
        acc = None
        for i, o in enumerate(outs):
            # scale head: one conv-GN-ReLU (+2x upsample) per octave above
            # the base scale (mmseg FPNHead)
            for r in range(max(1, i)):
                o = nn.Conv(d, (3, 3), padding=1,
                            name=f"scale{i}_conv{r}")(o)
                o = nn.GroupNorm(num_groups=groups, epsilon=1e-5,
                                 name=f"scale{i}_gn{r}")(o)
                o = nn.relu(o)
                if o.shape[1] != base_hw[0]:
                    o = _resize_bilinear(
                        o, (min(base_hw[0], o.shape[1] * 2),
                            min(base_hw[1], o.shape[2] * 2)))
            acc = o if acc is None else acc + o
        return nn.Conv(self.cfg.num_classes, (1, 1), name="cls")(acc)


class RepViTSegmentor(nn.Module):
    """Whole-frame semantic segmentation: logits upsampled to input size."""

    cfg: RepViTConfig = field(default_factory=RepViTConfig)

    @nn.compact
    def __call__(self, images):
        feats = RepViTBackbone(self.cfg, name="backbone")(images)
        logits = SemanticFPN(self.cfg, name="head")(feats)
        return _resize_bilinear(logits, images.shape[1:3])


@functools.lru_cache(maxsize=4)
def _jitted_segment(cfg: RepViTConfig):
    model = RepViTSegmentor(cfg)

    @jax.jit
    def run(params, images):
        logits = model.apply(params, images)
        return jnp.argmax(logits, axis=-1) == cfg.car_class

    return run


def segment_car_mask(params, images, cfg: RepViTConfig | None = None):
    """argmax-class mask (B, H, W) == cfg.car_class. Jitted per config —
    eager dispatch of the ~100-layer segmentor costs seconds/frame on the
    per-op-dispatch axon runtime."""
    return _jitted_segment(cfg or RepViTConfig())(params, images)


def car_mask_to_bbox(mask: np.ndarray) -> Tuple[float, float, float, float] | None:
    """Tight bbox over mask-true pixels, (x0, y0, x1, y1) frame pixels.

    Equivalent of the reference's ``get_tight_bbox``
    (`/root/reference/inference_on_a_image_pave.py:337-357`), which builds a
    meshgrid over (rows, cols), masks it, and takes per-axis min/max — its
    "x" axis is the ROW axis; we return the crop_utils (x=col, y=row)
    ordering the downstream crop grid expects.  Returns None for an empty
    mask (the reference would crash on it)."""
    ys, xs = np.nonzero(np.asarray(mask))
    if ys.size == 0:
        return None
    return float(xs.min()), float(ys.min()), float(xs.max()), float(ys.max())


def derive_car_bbox(params, image: np.ndarray,
                    cfg: RepViTConfig | None = None,
                    infer_size: Tuple[int, int] = (512, 1024),
                    ) -> Tuple[float, float, float, float] | None:
    """Frame -> car bbox: resize to the inference size (multiple of 32),
    segment, tight-bbox, rescale to frame pixels."""
    cfg = cfg or RepViTConfig()
    H, W = image.shape[:2]
    ih, iw = infer_size
    x = jax.image.resize(
        jnp.asarray(image, jnp.float32)[None] / 255.0, (1, ih, iw, 3),
        method="bilinear")
    mean = jnp.asarray([0.485, 0.456, 0.406])
    std = jnp.asarray([0.229, 0.224, 0.225])
    mask = np.asarray(segment_car_mask(params, (x - mean) / std, cfg)[0])
    bbox = car_mask_to_bbox(mask)
    if bbox is None:
        return None
    sx, sy = W / iw, H / ih
    x0, y0, x1, y1 = bbox
    return x0 * sx, y0 * sy, x1 * sx, y1 * sy


def init_segmentor_params(cfg: RepViTConfig | None = None, seed: int = 0,
                          infer_size: Tuple[int, int] = (64, 64)):
    cfg = cfg or RepViTConfig()
    model = RepViTSegmentor(cfg)
    dummy = jnp.zeros((1, infer_size[0], infer_size[1], 3), jnp.float32)
    return jax.jit(model.init)(jax.random.PRNGKey(seed), dummy)


def save_segmentor_params(params, path: str) -> None:
    from flax import serialization

    with open(path, "wb") as f:
        f.write(serialization.msgpack_serialize(
            jax.tree_util.tree_map(np.asarray, params)))


def load_segmentor_params(path: str, cfg: RepViTConfig | None = None):
    """Load a msgpack param tree saved by ``save_segmentor_params``,
    restored against the model's init structure (shape-checked)."""
    from flax import serialization

    template = init_segmentor_params(cfg)
    with open(path, "rb") as f:
        restored = serialization.from_bytes(template, f.read())
    return restored


# -- torch-checkpoint ingestion helpers -------------------------------------
# The reference's segmentation checkpoint (``repvit-Sep2.pth``) and its mmseg
# config live on the author's machine
# (`/root/reference/inference_on_a_image_pave.py:188-189`) and are not
# redistributable, so a full verified key map cannot exist in this
# environment.  These cover the two mechanical parts a caller with the
# checkpoint needs: BN folding to the FrozenBN affine form and OIHW->HWIO
# conv transposition.


def fold_torch_bn(state_dict, prefix: str, eps: float = 1e-5):
    """torch BatchNorm at ``prefix`` -> FrozenBN {scale, bias} (stats folded)."""
    w = np.asarray(state_dict[f"{prefix}.weight"])
    b = np.asarray(state_dict[f"{prefix}.bias"])
    m = np.asarray(state_dict[f"{prefix}.running_mean"])
    v = np.asarray(state_dict[f"{prefix}.running_var"])
    scale = w / np.sqrt(v + eps)
    return {"scale": scale, "bias": b - m * scale}


def torch_conv_kernel(state_dict, prefix: str):
    """torch Conv2d weight at ``prefix`` (OIHW) -> flax kernel (HWIO)."""
    return np.transpose(np.asarray(state_dict[f"{prefix}.weight"]),
                        (2, 3, 1, 0))
