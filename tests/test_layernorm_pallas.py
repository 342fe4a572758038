"""Fused Pallas LayerNorm (ops/layernorm_pallas.py) vs flax nn.LayerNorm:
forward parity (f32 + bf16), gradient parity through the custom-vjp, and
the module drop-in under an 8-device sharded jit."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp


@pytest.fixture(autouse=True)
def _ln_on(monkeypatch):
    monkeypatch.setenv("LN_PALLAS", "1")


def _flax_ln(x, scale, bias, eps=1e-5):
    import flax.linen as nn

    mod = nn.LayerNorm(epsilon=eps)
    return mod.apply({"params": {"scale": scale, "bias": bias}}, x)


@pytest.mark.parametrize("dtype,tol", [(jnp.float32, 2e-6), (jnp.bfloat16, 2e-2)])
def test_fused_ln_forward_parity(dtype, tol):
    from open_groundingdino_tpu.ops.layernorm_pallas import fused_layernorm

    rng = np.random.RandomState(0)
    B, L, C = 2, 4160, 256          # B*L = 8320 >= 8192 -> kernel path
    x = jnp.asarray(rng.randn(B, L, C) * 3 + 1, dtype)
    scale = jnp.asarray(rng.randn(C), jnp.float32)
    bias = jnp.asarray(rng.randn(C), jnp.float32)
    got = jax.jit(lambda a, s, b: fused_layernorm(a, s, b, 1e-5))(
        x, scale, bias
    )
    want = _flax_ln(x, scale, bias)
    assert got.dtype == want.dtype
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=tol, atol=tol)


def test_fused_ln_row_padding():
    """R not divisible by 128 exercises the pad-and-slice path."""
    from open_groundingdino_tpu.ops.layernorm_pallas import fused_layernorm

    rng = np.random.RandomState(1)
    B, L, C = 1, 8300, 96           # 8300 % 128 != 0
    x = jnp.asarray(rng.randn(B, L, C), jnp.float32)
    scale = jnp.ones((C,), jnp.float32)
    bias = jnp.zeros((C,), jnp.float32)
    got = jax.jit(lambda a: fused_layernorm(a, scale, bias, 1e-5))(x)
    want = _flax_ln(x, scale, bias)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-6, atol=2e-6)


def test_fused_ln_grad_parity():
    from open_groundingdino_tpu.ops.layernorm_pallas import fused_layernorm

    rng = np.random.RandomState(2)
    B, L, C = 2, 4160, 128
    x = jnp.asarray(rng.randn(B, L, C), jnp.float32)
    scale = jnp.asarray(rng.randn(C), jnp.float32)
    bias = jnp.asarray(rng.randn(C), jnp.float32)
    g = jnp.asarray(rng.randn(B, L, C), jnp.float32)

    def loss_f(fn):
        def f(a, s, b):
            return jnp.sum(fn(a, s, b) * g)
        return f

    gx, gs, gb = jax.grad(
        loss_f(lambda a, s, b: fused_layernorm(a, s, b, 1e-5)),
        argnums=(0, 1, 2),
    )(x, scale, bias)
    wx, ws, wb = jax.grad(
        loss_f(lambda a, s, b: _flax_ln(a, s, b)), argnums=(0, 1, 2)
    )(x, scale, bias)
    for got, want, name in ((gx, wx, "x"), (gs, ws, "scale"), (gb, wb, "bias")):
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5,
            err_msg=f"grad_{name}",
        )


def test_module_small_stream_fallback():
    """Small streams use the XLA reference path inside the module."""
    from open_groundingdino_tpu.models.layers import LayerNorm

    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(2, 50, 256), jnp.float32)
    mod = LayerNorm(epsilon=1e-5)
    import flax.linen as nn

    ref = nn.LayerNorm(epsilon=1e-5)
    p = ref.init(jax.random.PRNGKey(0), x)
    np.testing.assert_allclose(
        np.asarray(mod.apply(p, x)), np.asarray(ref.apply(p, x)),
        rtol=2e-6, atol=2e-6,
    )


def test_fused_ln_sharded():
    """The batch-partitioned entry runs under a sharded jit on the 8-dev
    CPU mesh without replication errors."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec

    from open_groundingdino_tpu.ops.layernorm_pallas import fused_layernorm

    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("needs 8 devices")
    mesh = Mesh(np.array(devs[:8]), ("dp",))
    rng = np.random.RandomState(4)
    B, L, C = 8, 1088, 128
    x = jnp.asarray(rng.randn(B, L, C), jnp.float32)
    scale = jnp.asarray(rng.randn(C), jnp.float32)
    bias = jnp.asarray(rng.randn(C), jnp.float32)
    xs = jax.device_put(x, NamedSharding(mesh, PartitionSpec("dp")))
    got = jax.jit(lambda a: fused_layernorm(a, scale, bias, 1e-5))(xs)
    want = _flax_ln(x, scale, bias)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-6, atol=2e-6)


@pytest.mark.parametrize("dtype,tol", [(jnp.float32, 2e-6), (jnp.bfloat16, 2e-2)])
def test_fused_lnres_forward_parity(dtype, tol, monkeypatch):
    """LN_PALLAS_RES=1: LN(x + r) fused kernel vs flax LN of the sum."""
    monkeypatch.setenv("LN_PALLAS_RES", "1")
    from open_groundingdino_tpu.ops.layernorm_pallas import (
        fused_layernorm_residual,
    )

    rng = np.random.RandomState(5)
    B, L, C = 2, 4160, 256
    x = jnp.asarray(rng.randn(B, L, C) * 2, dtype)
    r = jnp.asarray(rng.randn(B, L, C), dtype)
    scale = jnp.asarray(rng.randn(C), jnp.float32)
    bias = jnp.asarray(rng.randn(C), jnp.float32)
    got = jax.jit(
        lambda a, b, s, c: fused_layernorm_residual(a, b, s, c, 1e-5)
    )(x, r, scale, bias)
    want = _flax_ln((x.astype(jnp.float32) + r.astype(jnp.float32)).astype(dtype),
                    scale, bias)
    assert got.dtype == want.dtype
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=tol, atol=tol)


def test_fused_lnres_grad_parity(monkeypatch):
    monkeypatch.setenv("LN_PALLAS_RES", "1")
    from open_groundingdino_tpu.ops.layernorm_pallas import (
        fused_layernorm_residual,
    )

    rng = np.random.RandomState(6)
    B, L, C = 2, 4160, 128
    x = jnp.asarray(rng.randn(B, L, C), jnp.float32)
    r = jnp.asarray(rng.randn(B, L, C), jnp.float32)
    scale = jnp.asarray(rng.randn(C), jnp.float32)
    bias = jnp.asarray(rng.randn(C), jnp.float32)
    g = jnp.asarray(rng.randn(B, L, C), jnp.float32)

    gx, gr, gs, gb = jax.grad(
        lambda a, b, s, c: jnp.sum(
            fused_layernorm_residual(a, b, s, c, 1e-5) * g
        ),
        argnums=(0, 1, 2, 3),
    )(x, r, scale, bias)
    wx, ws, wb = jax.grad(
        lambda a, s, c: jnp.sum(_flax_ln(a, s, c) * g), argnums=(0, 1, 2)
    )(x + r, scale, bias)
    for got, want, name in (
        (gx, wx, "x"), (gr, wx, "res"), (gs, ws, "scale"), (gb, wb, "bias")
    ):
        # scale/bias grads reduce over 8320 rows — summation order differs
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-4,
            err_msg=f"grad_{name}",
        )


def test_module_residual_form_matches_sum(monkeypatch):
    """LayerNorm(x, residual) must equal LayerNorm()(x + residual) on both
    the default XLA path and the fused kernel path."""
    from open_groundingdino_tpu.models.layers import LayerNorm

    rng = np.random.RandomState(7)
    x = jnp.asarray(rng.randn(2, 4160, 128), jnp.float32)
    r = jnp.asarray(rng.randn(2, 4160, 128), jnp.float32)
    mod = LayerNorm(epsilon=1e-5)
    p = mod.init(jax.random.PRNGKey(0), x)
    want = mod.apply(p, x + r)
    for env in ("0", "1"):
        monkeypatch.setenv("LN_PALLAS_RES", env)
        got = mod.apply(p, x, r)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=2e-6, atol=2e-6,
            err_msg=f"LN_PALLAS_RES={env}",
        )
