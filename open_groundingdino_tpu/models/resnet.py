"""ResNet-50/101 backbone with frozen BatchNorm (Flax, NHWC, TPU-native).

Capability parity with the reference's torchvision-ResNet backbone path
(reference models/GroundingDINO/backbone/backbone.py:33-143): the v1.5
bottleneck trunk (stride-2 on the 3x3 conv), FrozenBatchNorm2d everywhere
(eps=1e-5 added before rsqrt, backbone.py:62-71), optional last-stage
dilation (replace_stride_with_dilation, backbone.py:130-135), and
intermediate feature returns for return_interm_indices in
[[0,1,2,3], [1,2,3], [3]] (backbone.py:140-142).

TPU-first divergences:
  * NHWC end to end — convolutions land directly on the MXU with no layout
    transposes,
  * frozen BN is folded into a single fused scale+shift that XLA merges
    into the convolution epilogue (no separate normalization pass),
  * the reference's requires_grad_(False) freezing of BN buffers and the
    stem/layer1 (backbone.py:82-89) is expressed functionally instead:
    `frozen_param_keys(train_backbone)` returns path substrings for the
    optimizer's zero-update group (parallel/optim.py `frozen_keys`),
  * optional per-block jax.checkpoint for training memory.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

RESNET_VARIANTS = {
    # nano variant for CI/tests only
    "resnet_nano_test": dict(depths=(1, 1, 1, 1), base_width=8),
    "resnet50": dict(depths=(3, 4, 6, 3), base_width=64),
    "resnet101": dict(depths=(3, 4, 23, 3), base_width=64),
}


@dataclass(frozen=True)
class ResNetConfig:
    name: str = "resnet50"
    out_indices: Tuple[int, ...] = (1, 2, 3)
    dilation: bool = False  # replace layer4 stride with dilation
    use_checkpoint: bool = False

    @property
    def depths(self) -> Tuple[int, ...]:
        return tuple(RESNET_VARIANTS[self.name]["depths"])

    @property
    def base_width(self) -> int:
        return int(RESNET_VARIANTS[self.name]["base_width"])

    @property
    def num_features(self) -> Tuple[int, ...]:
        # bottleneck expansion 4
        return tuple(self.base_width * 4 * (2 ** i) for i in range(4))


class FrozenBatchNorm(nn.Module):
    """BatchNorm with fixed statistics and affine params
    (reference backbone.py:33-71; eps=1e-5 added before rsqrt).

    Parameters keep torchvision's names so checkpoints convert 1:1; they
    live under a module named 'frozen_bn*' so one optimizer path-substring
    ('frozen_bn') freezes all of them (they are buffers in torch — never
    trained)."""

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        w = self.param("weight", nn.initializers.ones, (c,))
        b = self.param("bias", nn.initializers.zeros, (c,))
        rm = self.param("running_mean", nn.initializers.zeros, (c,))
        rv = self.param("running_var", nn.initializers.ones, (c,))
        scale = w.astype(jnp.float32) * jax.lax.rsqrt(
            rv.astype(jnp.float32) + 1e-5
        )
        shift = b.astype(jnp.float32) - rm.astype(jnp.float32) * scale
        return x * scale.astype(x.dtype) + shift.astype(x.dtype)


class Bottleneck(nn.Module):
    """torchvision Bottleneck (v1.5: stride on conv2), frozen BN."""

    width: int
    stride: int
    dilation: int
    downsample: bool

    @nn.compact
    def __call__(self, x):
        d = self.dilation
        out = nn.Conv(self.width, (1, 1), use_bias=False, name="conv1")(x)
        out = nn.relu(FrozenBatchNorm(name="frozen_bn1")(out))
        out = nn.Conv(
            self.width, (3, 3), strides=(self.stride, self.stride),
            padding=((d, d), (d, d)), kernel_dilation=(d, d),
            use_bias=False, name="conv2",
        )(out)
        out = nn.relu(FrozenBatchNorm(name="frozen_bn2")(out))
        out = nn.Conv(4 * self.width, (1, 1), use_bias=False, name="conv3")(out)
        out = FrozenBatchNorm(name="frozen_bn3")(out)
        if self.downsample:
            idt = nn.Conv(
                4 * self.width, (1, 1), strides=(self.stride, self.stride),
                use_bias=False, name="downsample_conv",
            )(x)
            idt = FrozenBatchNorm(name="downsample_frozen_bn")(idt)
        else:
            idt = x
        return nn.relu(out + idt)


class ResNet(nn.Module):
    """Returns a list of NHWC feature maps for cfg.out_indices
    (stage i has stride 4*2^i; with cfg.dilation, stage 3 keeps stride 16)."""

    cfg: ResNetConfig

    @nn.compact
    def __call__(self, images: jnp.ndarray):
        c = self.cfg
        x = nn.Conv(
            c.base_width, (7, 7), strides=(2, 2), padding=((3, 3), (3, 3)),
            use_bias=False, name="conv1",
        )(images)
        x = nn.relu(FrozenBatchNorm(name="frozen_bn1")(x))
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        block_cls = nn.remat(Bottleneck) if c.use_checkpoint else Bottleneck
        outs = []
        dilation = 1
        for i, depth in enumerate(c.depths):
            width = c.base_width * (2 ** i)
            stride = 1 if i == 0 else 2
            prev_dilation = dilation
            if c.dilation and i == 3:  # replace_stride_with_dilation
                dilation *= stride
                stride = 1
            for b in range(depth):
                x = block_cls(
                    width=width,
                    stride=stride if b == 0 else 1,
                    dilation=prev_dilation if b == 0 else dilation,
                    downsample=(b == 0),
                    name=f"layer{i + 1}_block{b}",
                )(x)
            if i in c.out_indices:
                outs.append(x)
        return outs


def frozen_param_keys(train_backbone: bool = True) -> Tuple[str, ...]:
    """Path substrings for the optimizer's zero-update group, mirroring the
    reference's requires_grad policy (backbone.py:82-89): BN buffers always;
    stem + layer1 always; the whole trunk when not train_backbone."""
    if not train_backbone:
        return ("backbone/",)
    return ("frozen_bn", "backbone/conv1", "backbone/layer1_")
