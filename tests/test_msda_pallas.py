"""Pallas MSDA kernel vs the XLA reference (interpret mode on CPU; the same
test runs compiled on TPU)."""
import jax
import jax.numpy as jnp
import numpy as np

from open_groundingdino_tpu.ops.msda import ms_deform_attn_xla
from open_groundingdino_tpu.ops.msda_pallas import ms_deform_attn_pallas

SHAPES = ((12, 16), (6, 8), (3, 4))
B, H, D, P = 2, 4, 8, 4
L = sum(h * w for h, w in SHAPES)
NL = len(SHAPES)


def _inputs(Q, seed=0):
    rng = np.random.RandomState(seed)
    value = rng.randn(B, L, H, D).astype(np.float32)
    locs = rng.uniform(-0.1, 1.1, size=(B, Q, H, NL, P, 2)).astype(np.float32)
    attn = rng.uniform(size=(B, Q, H, NL, P)).astype(np.float32)
    attn /= attn.reshape(B, Q, H, -1).sum(-1).reshape(B, Q, H, 1, 1)
    return jnp.asarray(value), jnp.asarray(locs), jnp.asarray(attn)


def test_pallas_matches_xla_forward():
    value, locs, attn = _inputs(Q=50)
    ref = ms_deform_attn_xla(value, SHAPES, locs, attn)
    out = ms_deform_attn_pallas(value, SHAPES, locs, attn)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_pallas_q_not_multiple_of_block():
    value, locs, attn = _inputs(Q=173, seed=1)
    ref = ms_deform_attn_xla(value, SHAPES, locs, attn)
    out = ms_deform_attn_pallas(value, SHAPES, locs, attn)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_pallas_bf16():
    value, locs, attn = _inputs(Q=64, seed=2)
    v16 = value.astype(jnp.bfloat16)
    ref = ms_deform_attn_xla(v16, SHAPES, locs, attn)
    out = ms_deform_attn_pallas(v16, SHAPES, locs, attn)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        rtol=0.05, atol=0.05,
    )


def test_pallas_bf16_vjp():
    """bf16 values route the kernel dots through single-pass DEFAULT
    matmuls; grads must still track the XLA reference at bf16 tolerance."""
    value, locs, attn = _inputs(Q=48, seed=5)
    v16 = value.astype(jnp.bfloat16)

    def loss_p(v, l, a):
        return jnp.sum(ms_deform_attn_pallas(v, SHAPES, l, a).astype(jnp.float32) ** 2)

    def loss_x(v, l, a):
        return jnp.sum(ms_deform_attn_xla(v, SHAPES, l, a).astype(jnp.float32) ** 2)

    gp = jax.grad(loss_p, argnums=(0, 1, 2))(v16, locs, attn)
    gx = jax.grad(loss_x, argnums=(0, 1, 2))(v16, locs, attn)
    for a, b in zip(gp, gx):
        np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b, np.float32),
            rtol=0.08, atol=0.08,
        )


def test_pallas_vjp_matches_xla():
    value, locs, attn = _inputs(Q=40, seed=3)

    def loss_p(v, l, a):
        return jnp.sum(ms_deform_attn_pallas(v, SHAPES, l, a) ** 2)

    def loss_x(v, l, a):
        return jnp.sum(ms_deform_attn_xla(v, SHAPES, l, a) ** 2)

    gp = jax.grad(loss_p, argnums=(0, 1, 2))(value, locs, attn)
    gx = jax.grad(loss_x, argnums=(0, 1, 2))(value, locs, attn)
    # atol 2e-4: the rowtap forward's different mul ordering shifts the
    # sum(out^2) cotangent by ~1e-6, which the x W-scale amplifies in the
    # location grads (measured max 9e-5); the backward itself is corner-exact
    for a, b in zip(gp, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=2e-4)


def test_msda_module_transposed_path_matches_xla():
    """models/deformable.MSDeformAttn impl='pallas' (the einsum kernel-layout
    flow + ms_deform_attn_pallas_t) vs impl='xla' with identical params —
    both the encoder case (Q == L, 2-d refs) and the decoder case (Q != L,
    4-d refs, query sorting)."""
    from open_groundingdino_tpu.models.deformable import MSDeformAttn

    rng = np.random.RandomState(11)
    C, Hh = 16, 4
    query_l = jnp.asarray(rng.randn(B, L, C), jnp.float32)
    value = jnp.asarray(rng.randn(B, L, C), jnp.float32)
    kpm = np.zeros((B, L), bool)
    kpm[0, -9:] = True
    kpm = jnp.asarray(kpm)

    # encoder case: 2-d reference points
    ref2 = jnp.asarray(rng.rand(B, L, NL, 2), jnp.float32)
    mod_x = MSDeformAttn(C, Hh, NL, P, impl="xla")
    params = mod_x.init(jax.random.PRNGKey(0), query_l, value, ref2,
                        SHAPES, kpm)
    out_x = mod_x.apply(params, query_l, value, ref2, SHAPES, kpm)
    mod_p = MSDeformAttn(C, Hh, NL, P, impl="pallas")
    out_p = mod_p.apply(params, query_l, value, ref2, SHAPES, kpm)
    np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_x),
                               rtol=1e-4, atol=1e-5)

    # decoder case: Q != L, 4-d reference boxes + grads through both paths
    Qd = 7
    query_d = jnp.asarray(rng.randn(B, Qd, C), jnp.float32)
    ref4 = jnp.asarray(
        np.concatenate([rng.rand(B, Qd, NL, 2),
                        rng.uniform(0.05, 0.4, (B, Qd, NL, 2))], -1),
        jnp.float32,
    )

    def loss(mod, p):
        return jnp.sum(
            mod.apply(p, query_d, value, ref4, SHAPES, kpm) ** 2
        )

    out_x = mod_x.apply(params, query_d, value, ref4, SHAPES, kpm)
    out_p = mod_p.apply(params, query_d, value, ref4, SHAPES, kpm)
    np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_x),
                               rtol=1e-4, atol=1e-5)

    gx = jax.grad(lambda p: loss(mod_x, p))(params)
    gp = jax.grad(lambda p: loss(mod_p, p))(params)
    flat_x = jax.tree_util.tree_leaves_with_path(gx)
    flat_p = dict(
        (jax.tree_util.keystr(k), v)
        for k, v in jax.tree_util.tree_leaves_with_path(gp)
    )
    for k, vx in flat_x:
        vp = flat_p[jax.tree_util.keystr(k)]
        np.testing.assert_allclose(
            np.asarray(vp), np.asarray(vx), rtol=5e-4, atol=5e-4,
            err_msg=jax.tree_util.keystr(k),
        )
