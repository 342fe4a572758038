"""MSDeformAttn core-op parity vs torch.nn.functional.grid_sample.

This reproduces the role of the reference's ops/test.py: the pure-framework
path (here: torch grid_sample on CPU) is the numerical oracle for the
device op (here: the XLA gather implementation), plus gradient checks.
"""
import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from open_groundingdino_tpu.ops.msda import ms_deform_attn_xla

SHAPES = ((6, 4), (3, 2), (2, 2))
B, H, D, Q, P = 2, 4, 8, 10, 3
L = sum(h * w for h, w in SHAPES)
NL = len(SHAPES)


def _torch_oracle(value, locs, attn):
    """Multi-scale deformable attention via grid_sample (the reference's
    fallback semantics, independently re-derived)."""
    bs = value.shape[0]
    out_per_level = []
    start = 0
    for lvl, (h, w) in enumerate(SHAPES):
        v = value[:, start : start + h * w]  # (B, hw, H, D)
        start += h * w
        v = v.permute(0, 2, 3, 1).reshape(bs * H, D, h, w)
        grid = 2 * locs[:, :, :, lvl] - 1  # (B, Q, H, P, 2)
        grid = grid.permute(0, 2, 1, 3, 4).reshape(bs * H, Q, P, 2)
        sampled = F.grid_sample(
            v, grid, mode="bilinear", padding_mode="zeros", align_corners=False
        )  # (B*H, D, Q, P)
        out_per_level.append(sampled)
    stacked = torch.stack(out_per_level, dim=-2)  # (B*H, D, Q, NL, P)
    aw = attn.permute(0, 2, 1, 3, 4).reshape(bs * H, 1, Q, NL * P)
    out = (stacked.flatten(-2) * aw).sum(-1)  # (B*H, D, Q)
    return out.reshape(bs, H, D, Q).permute(0, 3, 1, 2).reshape(bs, Q, H * D)


def _rand_inputs(seed=0):
    rng = np.random.RandomState(seed)
    value = rng.randn(B, L, H, D).astype(np.float32)
    # locations mostly inside [0,1], some outside to test zero padding
    locs = rng.uniform(-0.2, 1.2, size=(B, Q, H, NL, P, 2)).astype(np.float32)
    attn = rng.uniform(size=(B, Q, H, NL, P)).astype(np.float32)
    attn /= attn.reshape(B, Q, H, -1).sum(-1).reshape(B, Q, H, 1, 1)
    return value, locs, attn


def test_forward_matches_grid_sample():
    value, locs, attn = _rand_inputs(0)
    ours = ms_deform_attn_xla(
        jnp.asarray(value), SHAPES, jnp.asarray(locs), jnp.asarray(attn)
    )
    ref = _torch_oracle(
        torch.from_numpy(value), torch.from_numpy(locs), torch.from_numpy(attn)
    )
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(), rtol=1e-4, atol=1e-5)


def test_forward_jit_and_bf16():
    value, locs, attn = _rand_inputs(1)
    f = jax.jit(
        lambda v, l, a: ms_deform_attn_xla(v, SHAPES, l, a)
    )
    out32 = f(jnp.asarray(value), jnp.asarray(locs), jnp.asarray(attn))
    out16 = f(
        jnp.asarray(value, dtype=jnp.bfloat16),
        jnp.asarray(locs),
        jnp.asarray(attn),
    )
    assert out16.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(out16, dtype=np.float32), np.asarray(out32), rtol=0.05, atol=0.05
    )


def test_gradients_match_torch():
    value, locs, attn = _rand_inputs(2)

    def loss_jax(v, l, a):
        out = ms_deform_attn_xla(v, SHAPES, l, a)
        return jnp.sum(out * jnp.cos(jnp.arange(out.size).reshape(out.shape)))

    gv, gl, ga = jax.grad(loss_jax, argnums=(0, 1, 2))(
        jnp.asarray(value), jnp.asarray(locs), jnp.asarray(attn)
    )

    tv = torch.from_numpy(value).requires_grad_(True)
    tl = torch.from_numpy(locs).requires_grad_(True)
    ta = torch.from_numpy(attn).requires_grad_(True)
    out = _torch_oracle(tv, tl, ta)
    w = torch.cos(torch.arange(out.numel(), dtype=torch.float32).reshape(out.shape))
    (out * w).sum().backward()

    np.testing.assert_allclose(np.asarray(gv), tv.grad.numpy(), rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(ga), ta.grad.numpy(), rtol=1e-3, atol=1e-4)
    # location grads: grid_sample's zero-padding boundary subgradients differ
    # exactly at integer lattice crossings; compare only clearly-interior pts
    interior = (
        (locs > 0.05) & (locs < 0.95)
    ).all(-1, keepdims=True)
    interior = np.broadcast_to(interior, gl.shape)
    np.testing.assert_allclose(
        np.asarray(gl)[interior], tl.grad.numpy()[interior], rtol=1e-3, atol=1e-3
    )
