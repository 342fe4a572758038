"""ResNet backbone: numerical parity vs a torch reference trunk, stride
lattice, dilation, and freeze policy.

The torch side is a minimal Bottleneck trunk with torchvision-compatible
state-dict names (torchvision itself is not shipped), matching the modules
the reference builds in backbone.py:130-143 with FrozenBatchNorm2d —
BatchNorm2d in eval mode computes the identical expression (eps=1e-5).
"""
import numpy as np
import pytest
import torch
import torch.nn as tnn

from open_groundingdino_tpu.models.resnet import (
    ResNet,
    ResNetConfig,
    frozen_param_keys,
)
from open_groundingdino_tpu.utils.torch_convert import convert_resnet_state_dict

import jax
import jax.numpy as jnp


class TorchBottleneck(tnn.Module):
    def __init__(self, inplanes, planes, stride=1, dilation=1, prev_dilation=1):
        super().__init__()
        self.conv1 = tnn.Conv2d(inplanes, planes, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(planes)
        self.conv2 = tnn.Conv2d(
            planes, planes, 3, stride=stride, padding=prev_dilation,
            dilation=prev_dilation, bias=False,
        )
        self.bn2 = tnn.BatchNorm2d(planes)
        self.conv3 = tnn.Conv2d(planes, 4 * planes, 1, bias=False)
        self.bn3 = tnn.BatchNorm2d(4 * planes)
        self.relu = tnn.ReLU()
        self.downsample = None
        if stride != 1 or inplanes != 4 * planes:
            self.downsample = tnn.Sequential(
                tnn.Conv2d(inplanes, 4 * planes, 1, stride=stride, bias=False),
                tnn.BatchNorm2d(4 * planes),
            )

    def forward(self, x):
        idt = x if self.downsample is None else self.downsample(x)
        out = self.relu(self.bn1(self.conv1(x)))
        out = self.relu(self.bn2(self.conv2(out)))
        out = self.bn3(self.conv3(out))
        return self.relu(out + idt)


class TorchTrunk(tnn.Module):
    """torchvision-resnet-shaped trunk (state-dict-key compatible)."""

    def __init__(self, depths, base=8, dilate_last=False):
        super().__init__()
        self.conv1 = tnn.Conv2d(3, base, 7, stride=2, padding=3, bias=False)
        self.bn1 = tnn.BatchNorm2d(base)
        self.relu = tnn.ReLU()
        self.maxpool = tnn.MaxPool2d(3, stride=2, padding=1)
        inplanes = base
        dilation = 1
        for i, depth in enumerate(depths):
            planes = base * (2 ** i)
            stride = 1 if i == 0 else 2
            prev = dilation
            if dilate_last and i == 3:
                dilation *= stride
                stride = 1
            blocks = [TorchBottleneck(inplanes, planes, stride, dilation, prev)]
            inplanes = 4 * planes
            for _ in range(1, depth):
                blocks.append(
                    TorchBottleneck(inplanes, planes, 1, dilation, dilation)
                )
            setattr(self, f"layer{i + 1}", tnn.Sequential(*blocks))

    def forward(self, x):
        x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
        outs = []
        for i in range(4):
            x = getattr(self, f"layer{i + 1}")(x)
            outs.append(x)
        return outs


def _randomize_bn(model):
    """Non-trivial frozen statistics so the BN math is actually exercised."""
    g = torch.Generator().manual_seed(0)
    for m in model.modules():
        if isinstance(m, tnn.BatchNorm2d):
            m.weight.data = torch.rand(m.weight.shape, generator=g) + 0.5
            m.bias.data = torch.randn(m.bias.shape, generator=g) * 0.1
            m.running_mean = torch.randn(m.running_mean.shape, generator=g) * 0.2
            m.running_var = torch.rand(m.running_var.shape, generator=g) + 0.5


@pytest.mark.parametrize("dilation", [False, True])
def test_resnet_parity_vs_torch(dilation):
    torch.manual_seed(1)
    depths = (1, 1, 1, 1)
    trunk = TorchTrunk(depths, base=8, dilate_last=dilation).eval()
    _randomize_bn(trunk)

    x = torch.randn(2, 3, 64, 96)
    with torch.no_grad():
        ref = [t.numpy().transpose(0, 2, 3, 1) for t in trunk(x)]

    sd = {k: v.numpy() for k, v in trunk.state_dict().items()}
    params = convert_resnet_state_dict(sd, depths)

    cfg = ResNetConfig(
        name="resnet_nano_test", out_indices=(0, 1, 2, 3), dilation=dilation
    )
    feats = ResNet(cfg).apply(
        {"params": params}, jnp.asarray(x.numpy().transpose(0, 2, 3, 1))
    )
    assert len(feats) == 4
    for mine, theirs in zip(feats, ref):
        assert mine.shape == theirs.shape
        np.testing.assert_allclose(np.asarray(mine), theirs, atol=2e-4, rtol=1e-4)


def test_resnet_stride_lattice_and_channels():
    cfg = ResNetConfig(name="resnet_nano_test", out_indices=(1, 2, 3))
    model = ResNet(cfg)
    x = jnp.zeros((1, 70, 102, 3))  # non-divisible sizes: ceil-division lattice
    params = model.init(jax.random.PRNGKey(0), x)
    feats = model.apply(params, x)
    # strides 8/16/32 with ceil division at every downsampling conv
    assert [f.shape[1:3] for f in feats] == [(9, 13), (5, 7), (3, 4)]
    assert [f.shape[-1] for f in feats] == list(cfg.num_features[1:])


def test_resnet_dilation_keeps_stride16():
    cfg = ResNetConfig(name="resnet_nano_test", out_indices=(2, 3), dilation=True)
    model = ResNet(cfg)
    x = jnp.zeros((1, 64, 64, 3))
    params = model.init(jax.random.PRNGKey(0), x)
    c4, c5 = model.apply(params, x)
    assert c4.shape[1:3] == c5.shape[1:3] == (4, 4)


def test_resnet_in_groundingdino_and_freeze_policy():
    """End-to-end wiring: build with a resnet backbone, forward, and check
    the frozen groups produce zero updates (reference backbone.py:82-89)."""
    from types import SimpleNamespace

    from open_groundingdino_tpu.models.groundingdino import build_groundingdino
    from open_groundingdino_tpu.parallel.optim import make_optimizer

    args = SimpleNamespace(
        backbone="resnet_nano_test",
        return_interm_indices=[1, 2, 3],
        hidden_dim=32, num_queries=18, nheads=4, num_feature_levels=4,
        enc_layers=1, dec_layers=1, dim_feedforward=64,
        enc_n_points=4, dec_n_points=4, max_text_len=32,
        pe_temperatureH=20, pe_temperatureW=20,
        use_text_enhancer=True, use_fusion_layer=True,
        use_text_cross_attention=True, aux_loss=True,
        bert_vocab_size=64, bert_hidden_size=32, bert_layers=1,
        bert_heads=4, bert_intermediate=64, bert_max_position=64,
        msda_impl="xla",
    )
    model = build_groundingdino(args)
    B, H, W, T = 1, 64, 96, 32
    rng = np.random.RandomState(0)
    inputs = dict(
        images=jnp.asarray(rng.randn(B, H, W, 3), jnp.float32),
        image_sizes=jnp.asarray([[H, W]], jnp.int32),
        input_ids=jnp.asarray(rng.randint(1, 60, (B, T)), jnp.int32),
        text_token_mask=jnp.ones((B, T), bool),
        position_ids=jnp.tile(jnp.arange(T, dtype=jnp.int32)[None], (B, 1)),
        text_self_attention_masks=jnp.ones((B, T, T), bool),
    )
    params = model.init(jax.random.PRNGKey(0), **inputs)["params"]
    out = model.apply({"params": params}, **inputs)
    assert out["pred_boxes"].shape == (B, 18, 4)
    assert np.isfinite(np.asarray(out["pred_boxes"])).all()

    tx = make_optimizer(
        params, lr=1e-4, lr_backbone=1e-5,
        frozen_keys=frozen_param_keys(train_backbone=True),
    )
    state = tx.init(params)
    grads = jax.tree_util.tree_map(jnp.ones_like, params)
    updates, _ = tx.update(grads, state, params)

    flat = jax.tree_util.tree_flatten_with_path(updates)[0]
    n_frozen = 0
    for kp, u in flat:
        path = "/".join(getattr(k, "key", str(k)) for k in kp)
        frozen = any(s in path for s in frozen_param_keys(True))
        if frozen:
            n_frozen += 1
            assert not np.any(np.asarray(u)), path
        elif "backbone" in path:  # trainable trunk params must move
            assert np.any(np.asarray(u)), path
    assert n_frozen > 0


def test_resnet_export_roundtrip():
    """export_resnet_state_dict inverts convert_resnet_state_dict exactly
    (every torchvision key except the dropped num_batches_tracked)."""
    from open_groundingdino_tpu.utils.torch_convert import (
        export_resnet_state_dict,
    )

    depths = (1, 1, 1, 1)
    trunk = TorchTrunk(depths, base=8).eval()
    _randomize_bn(trunk)
    sd = {
        k: v.numpy() for k, v in trunk.state_dict().items()
        if "num_batches_tracked" not in k
    }
    params = convert_resnet_state_dict(sd, depths)
    back = export_resnet_state_dict(params)
    assert set(back) == set(sd)
    for k, v in sd.items():
        np.testing.assert_array_equal(back[k], v, err_msg=k)
