"""Fused MLP kernel (ops/mlp_pallas.py): parity vs the flax Dense/relu/Dense
chain, gradient parity through the custom vjp, sharded execution, and the
encoder-layer integration under MLP_PALLAS=1."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp


def _flax_chain(x, w1, b1, w2, b2):
    import flax.linen as nn

    class M(nn.Module):
        @nn.compact
        def __call__(self, a):
            h = nn.Dense(w1.shape[1], name="l1")(a)
            h = nn.relu(h)
            return nn.Dense(w2.shape[1], name="l2")(h)

    params = {
        "l1": {"kernel": w1, "bias": b1},
        "l2": {"kernel": w2, "bias": b2},
    }
    return M().apply({"params": params}, x)


def _inputs(seed, dtype, B=2, L=4160, C=128, F=512):
    rng = np.random.RandomState(seed)
    return (
        jnp.asarray(rng.randn(B, L, C), dtype),
        jnp.asarray(rng.randn(C, F) * 0.05, dtype),
        jnp.asarray(rng.randn(F) * 0.1, dtype),
        jnp.asarray(rng.randn(F, C) * 0.05, dtype),
        jnp.asarray(rng.randn(C) * 0.1, dtype),
    )


@pytest.mark.parametrize("dtype,tol", [(jnp.float32, 2e-5), (jnp.bfloat16, 3e-2)])
def test_fused_mlp_forward_parity(dtype, tol, monkeypatch):
    monkeypatch.setenv("MLP_PALLAS", "1")
    from open_groundingdino_tpu.ops.mlp_pallas import fused_mlp

    x, w1, b1, w2, b2 = _inputs(0, dtype)
    got = jax.jit(fused_mlp)(x, w1, b1, w2, b2)
    want = _flax_chain(x, w1, b1, w2, b2)
    assert got.dtype == want.dtype
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        rtol=tol, atol=tol,
    )


def test_fused_mlp_row_padding(monkeypatch):
    """R not divisible by 128 exercises the pad-and-slice path."""
    monkeypatch.setenv("MLP_PALLAS", "1")
    from open_groundingdino_tpu.ops.mlp_pallas import fused_mlp

    x, w1, b1, w2, b2 = _inputs(1, jnp.float32, B=1, L=8300)
    got = jax.jit(fused_mlp)(x, w1, b1, w2, b2)
    want = _flax_chain(x, w1, b1, w2, b2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_fused_mlp_grad_parity(monkeypatch):
    monkeypatch.setenv("MLP_PALLAS", "1")
    from open_groundingdino_tpu.ops.mlp_pallas import fused_mlp

    x, w1, b1, w2, b2 = _inputs(2, jnp.float32)
    g = jnp.asarray(np.random.RandomState(3).randn(*x.shape), jnp.float32)

    got = jax.grad(
        lambda *a: jnp.sum(fused_mlp(*a) * g), argnums=(0, 1, 2, 3, 4)
    )(x, w1, b1, w2, b2)
    want = jax.grad(
        lambda *a: jnp.sum(_flax_chain(*a) * g), argnums=(0, 1, 2, 3, 4)
    )(x, w1, b1, w2, b2)
    for gv, wv, name in zip(got, want, ("x", "w1", "b1", "w2", "b2")):
        np.testing.assert_allclose(
            np.asarray(gv), np.asarray(wv), rtol=2e-4, atol=2e-4,
            err_msg=f"grad_{name}",
        )


def test_fused_mlp_sharded(monkeypatch):
    monkeypatch.setenv("MLP_PALLAS", "1")
    from jax.sharding import Mesh, NamedSharding, PartitionSpec

    from open_groundingdino_tpu.ops.mlp_pallas import fused_mlp

    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("needs 8 devices")
    mesh = Mesh(np.array(devs[:8]), ("dp",))
    x, w1, b1, w2, b2 = _inputs(4, jnp.float32, B=8, L=1088)
    xs = jax.device_put(x, NamedSharding(mesh, PartitionSpec("dp")))
    got = jax.jit(fused_mlp)(xs, w1, b1, w2, b2)
    want = _flax_chain(x, w1, b1, w2, b2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def _flax_gelu_chain(x, w1, b1, w2, b2):
    import flax.linen as nn

    class M(nn.Module):
        @nn.compact
        def __call__(self, a):
            h = nn.Dense(w1.shape[1], name="l1")(a)
            h = nn.gelu(h, approximate=False)
            return nn.Dense(w2.shape[1], name="l2")(h)

    params = {
        "l1": {"kernel": w1, "bias": b1},
        "l2": {"kernel": w2, "bias": b2},
    }
    return M().apply({"params": params}, x)


def test_fused_mlp_gelu_forward_and_grad_parity(monkeypatch):
    """activation='gelu' (the Swin MLP form) vs the Dense/gelu/Dense chain."""
    monkeypatch.setenv("MLP_PALLAS", "1")
    from open_groundingdino_tpu.ops.mlp_pallas import fused_mlp

    x, w1, b1, w2, b2 = _inputs(7, jnp.float32)
    got = jax.jit(lambda *a: fused_mlp(*a, activation="gelu"))(
        x, w1, b1, w2, b2)
    want = _flax_gelu_chain(x, w1, b1, w2, b2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)

    g = jnp.asarray(np.random.RandomState(8).randn(*got.shape), jnp.float32)
    grads = jax.grad(
        lambda *a: jnp.sum(fused_mlp(*a, activation="gelu") * g),
        argnums=(0, 1, 2, 3, 4),
    )(x, w1, b1, w2, b2)
    wants = jax.grad(
        lambda *a: jnp.sum(_flax_gelu_chain(*a) * g), argnums=(0, 1, 2, 3, 4)
    )(x, w1, b1, w2, b2)
    for gv, wv in zip(grads, wants):
        np.testing.assert_allclose(np.asarray(gv), np.asarray(wv),
                                   rtol=2e-4, atol=2e-4)


def test_swin_block_mlp_pallas_matches_default(monkeypatch):
    """SwinBlock under MLP_PALLAS=1 vs default: same param tree, same
    outputs (stream below the size gate falls back — use L >= 8192)."""
    from open_groundingdino_tpu.models.swin import SwinBlock

    B, C = 1, 16
    H = W = 96  # L = 9216 >= 8192 engages the fused path
    rng = np.random.RandomState(11)
    x = jnp.asarray(rng.randn(B, H * W, C), jnp.float32)

    def build(env):
        monkeypatch.setenv("MLP_PALLAS", env)
        blk = SwinBlock(dim=C, num_heads=4, window_size=8, shift_size=0,
                        mlp_ratio=2.0, qkv_bias=True, H=H, W=W)
        p = blk.init(jax.random.PRNGKey(0), x)
        return p, blk.apply(p, x)

    p0, out0 = build("0")
    p1, out1 = build("1")
    assert jax.tree_util.tree_structure(p0) == jax.tree_util.tree_structure(p1)
    np.testing.assert_allclose(
        np.asarray(out0), np.asarray(out1), rtol=2e-5, atol=2e-5
    )


def test_encoder_layer_mlp_pallas_matches_default(monkeypatch):
    """DeformableEncoderLayer under MLP_PALLAS=1 vs default: same param
    tree, same outputs (the fused path only reorders the bias-add
    rounding, invisible at f32)."""
    from open_groundingdino_tpu.models.transformer import (
        DeformableEncoderLayer,
    )

    B, C, FF = 1, 32, 64
    shapes = ((8, 8), (4, 4))
    L = sum(h * w for h, w in shapes)
    rng = np.random.RandomState(5)
    src = jnp.asarray(rng.randn(B, L, C), jnp.float32)
    pos = jnp.asarray(rng.randn(B, L, C), jnp.float32)
    ref = jnp.asarray(rng.uniform(0.2, 0.8, (B, L, len(shapes), 2)),
                      jnp.float32)

    def build(env):
        monkeypatch.setenv("MLP_PALLAS", env)
        layer = DeformableEncoderLayer(
            d_model=C, d_ffn=FF, n_heads=4, n_levels=len(shapes),
            n_points=2, spatial_shapes=shapes,
        )
        p = layer.init(jax.random.PRNGKey(0), src, pos, ref, None, None)
        out = layer.apply(p, src, pos, ref, None, None)
        return p, out

    p0, out0 = build("0")
    p1, out1 = build("1")
    assert jax.tree_util.tree_structure(p0) == jax.tree_util.tree_structure(p1)
    np.testing.assert_allclose(
        np.asarray(out0), np.asarray(out1), rtol=2e-5, atol=2e-5
    )


def test_swin_site_gate_semantics(monkeypatch):
    """MLP_PALLAS_SWIN pins the Swin call site independently for the
    on-chip A/B: unset it follows MLP_PALLAS; set, it overrides —
    so `MLP_PALLAS=1 MLP_PALLAS_SWIN=0` measures the encoder FFN alone."""
    from open_groundingdino_tpu.ops.mlp_pallas import _gate_on

    monkeypatch.delenv("MLP_PALLAS", raising=False)
    monkeypatch.delenv("MLP_PALLAS_SWIN", raising=False)
    assert not _gate_on("MLP_PALLAS_SWIN")      # measured default: off
    monkeypatch.setenv("MLP_PALLAS", "1")
    assert _gate_on("MLP_PALLAS_SWIN")          # follows the global gate
    assert _gate_on("MLP_PALLAS")
    monkeypatch.setenv("MLP_PALLAS_SWIN", "0")
    assert not _gate_on("MLP_PALLAS_SWIN")      # site override wins
    assert _gate_on("MLP_PALLAS")
    monkeypatch.setenv("MLP_PALLAS", "0")
    monkeypatch.setenv("MLP_PALLAS_SWIN", "1")
    assert _gate_on("MLP_PALLAS_SWIN")
