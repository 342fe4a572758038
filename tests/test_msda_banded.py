"""Banded-separable MSDA kernel (ops/msda_banded.py): forward + gradient
parity vs the XLA reference, including out-of-image sampling locations
(grid_sample zero padding), plus the full MSDeformAttn module with
MSDA_BANDED=1 vs the XLA impl."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from open_groundingdino_tpu.ops.msda import ms_deform_attn_xla
from open_groundingdino_tpu.ops.msda_banded import ms_deform_attn_banded

B, H, D, NL, NP = 2, 2, 8, 4, 4
SHAPES = ((8, 12), (4, 6), (2, 3), (1, 2))
L = sum(h * w for h, w in SHAPES)
Q = L


def _inputs(seed=0, loc_lo=-0.1, loc_hi=1.1):
    rng = np.random.RandomState(seed)
    v_t = rng.randn(B * H, D, L).astype(np.float32)
    locs = rng.uniform(loc_lo, loc_hi, (B * H, NL, NP, 2, Q)).astype(
        np.float32
    )
    attn = rng.uniform(0, 1, (B * H, NL, NP, Q)).astype(np.float32)
    return v_t, locs, attn


def _banded_values(v_t):
    values, start = [], 0
    for (h, w) in SHAPES:
        vl = v_t[:, :, start : start + h * w].reshape(B * H, D, h, w)
        values.append(
            np.ascontiguousarray(
                vl.transpose(0, 2, 1, 3).reshape(B * H, h * D, w)
            )
        )
        start += h * w
    return tuple(values)


def _xla_ref_dq(v_t, locs, attn):
    value = jnp.transpose(jnp.asarray(v_t).reshape(B, H, D, L), (0, 3, 1, 2))
    locs_b = jnp.transpose(
        locs.reshape(B, H, NL, NP, 2, Q), (0, 5, 1, 2, 3, 4)
    )
    attn_b = jnp.transpose(attn.reshape(B, H, NL, NP, Q), (0, 4, 1, 2, 3))
    ref = ms_deform_attn_xla(value, SHAPES, locs_b, attn_b)
    return jnp.transpose(
        ref.reshape(B, Q, H, D), (0, 2, 3, 1)
    ).reshape(B * H, D, Q)


def test_banded_forward_parity_with_padding():
    v_t, locs, attn = _inputs()
    out = jax.jit(
        lambda vs, l, a: ms_deform_attn_banded(vs, SHAPES, l, a, NP)
    )(_banded_values(v_t), locs, attn)
    ref = _xla_ref_dq(v_t, locs, attn)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("bwd,bwd_band", [("1", "0"), ("0", "0"),
                                          ("1", "2"), ("1", "8")])
def test_banded_grads_parity(bwd, bwd_band, monkeypatch):
    # "1" = native banded backward kernel, "0" = corner-sweep fallback;
    # bwd_band exercises the backward-specific band override (MSDA_BAND_BWD,
    # 0 = follow the forward band)
    monkeypatch.setenv("MSDA_BANDED_BWD", bwd)
    monkeypatch.setenv("MSDA_BAND_BWD", bwd_band)
    v_t, locs, attn = _inputs(1)
    values = _banded_values(v_t)

    def loss_b(vs, l, a):
        return jnp.sum(jnp.sin(ms_deform_attn_banded(vs, SHAPES, l, a, NP)))

    def loss_x(v, l, a):
        return jnp.sum(jnp.sin(_xla_ref_dq(v, l, a)))

    gb = jax.jit(jax.grad(loss_b, argnums=(0, 1, 2)))(
        values, jnp.asarray(locs), jnp.asarray(attn)
    )
    gx = jax.jit(jax.grad(loss_x, argnums=(0, 1, 2)))(
        jnp.asarray(v_t), jnp.asarray(locs), jnp.asarray(attn)
    )
    start = 0
    for i, (h, w) in enumerate(SHAPES):
        gr = (
            np.asarray(gx[0][:, :, start : start + h * w])
            .reshape(B * H, D, h, w)
            .transpose(0, 2, 1, 3)
            .reshape(B * H, h * D, w)
        )
        np.testing.assert_allclose(
            np.asarray(gb[0][i]), gr, rtol=5e-4, atol=5e-4,
            err_msg=f"grad_value level {i}",
        )
        start += h * w
    for i, name in ((1, "locs"), (2, "attn")):
        np.testing.assert_allclose(
            np.asarray(gb[i]), np.asarray(gx[i]), rtol=5e-4, atol=5e-4,
            err_msg=f"grad_{name}",
        )


def test_banded_bwd_gv_bf16_gate(monkeypatch):
    """MSDA_BWD_GV_BF16=1 (candidate, default off — VERDICT r4 item 7):
    bf16 grad_value accumulation must stay within bf16 rounding of the
    f32-accumulated path on bf16 values, and leave grad_locs/grad_attn
    (separate f32 outputs) bitwise unchanged."""
    monkeypatch.setenv("MSDA_BANDED_BWD", "1")
    v_t, locs, attn = _inputs(3)
    values = tuple(v.astype(jnp.bfloat16) for v in _banded_values(v_t))

    def grads(gate):
        monkeypatch.setenv("MSDA_BWD_GV_BF16", gate)
        return jax.jit(jax.grad(
            lambda vs, l, a: jnp.sum(
                jnp.sin(ms_deform_attn_banded(vs, SHAPES, l, a, NP)
                        .astype(jnp.float32))
            ),
            argnums=(0, 1, 2),
        ))(values, jnp.asarray(locs), jnp.asarray(attn))

    g0 = grads("0")
    g1 = grads("1")
    for i in range(len(SHAPES)):
        a, b = np.asarray(g0[0][i], np.float32), np.asarray(g1[0][i], np.float32)
        assert a.dtype == b.dtype
        np.testing.assert_allclose(b, a, rtol=3e-2, atol=3e-2,
                                   err_msg=f"gv level {i}")
    for i, name in ((1, "locs"), (2, "attn")):
        np.testing.assert_array_equal(np.asarray(g0[i]), np.asarray(g1[i]),
                                      err_msg=f"grad_{name}")


def test_banded_module_matches_xla(monkeypatch):
    """Full MSDeformAttn with MSDA_BANDED=1 (projections + kernel + VJP +
    masks) vs impl='xla' — forward and all parameter grads."""
    monkeypatch.setenv("MSDA_BANDED", "1")
    from open_groundingdino_tpu.models.deformable import MSDeformAttn

    C = H * D * 2  # 4 heads of D=8
    heads = 4
    rng = np.random.RandomState(2)
    query = rng.randn(B, Q, C).astype(np.float32)
    value = rng.randn(B, L, C).astype(np.float32)
    ref_pts = rng.uniform(0.05, 0.95, (B, Q, NL, 2)).astype(np.float32)
    kpm = np.zeros((B, L), bool)
    kpm[1, -5:] = True

    mx = MSDeformAttn(embed_dim=C, num_heads=heads, num_levels=NL,
                      num_points=NP, impl="xla")
    mp = MSDeformAttn(embed_dim=C, num_heads=heads, num_levels=NL,
                      num_points=NP, impl="pallas")
    params = mx.init(jax.random.PRNGKey(0), query, value, ref_pts, SHAPES,
                     kpm)
    ox = mx.apply(params, query, value, ref_pts, SHAPES, kpm)
    op = jax.jit(
        lambda p: mp.apply(p, query, value, ref_pts, SHAPES, kpm)
    )(params)
    np.testing.assert_allclose(np.asarray(op), np.asarray(ox),
                               rtol=2e-4, atol=2e-4)

    gx = jax.jit(jax.grad(
        lambda p: jnp.sum(jnp.sin(mx.apply(p, query, value, ref_pts,
                                           SHAPES, kpm)))
    ))(params)
    gp = jax.jit(jax.grad(
        lambda p: jnp.sum(jnp.sin(mp.apply(p, query, value, ref_pts,
                                           SHAPES, kpm)))
    ))(params)
    for (kp, a), (_, b) in zip(
        jax.tree_util.tree_leaves_with_path(gp),
        jax.tree_util.tree_leaves_with_path(gx),
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-3,
            err_msg=jax.tree_util.keystr(kp),
        )


def test_banded_multipoint_forward_parity(monkeypatch):
    """MSDA_BANDED_MP=1: union-band multi-point kernel (one (band*D, W) @
    (W, P*128) dot per (level, block)) must match the XLA reference."""
    monkeypatch.setenv("MSDA_BANDED_MP", "1")
    v_t, locs, attn = _inputs(3)
    out = jax.jit(
        lambda vs, l, a: ms_deform_attn_banded(vs, SHAPES, l, a, NP)
    )(_banded_values(v_t), locs, attn)
    ref = _xla_ref_dq(v_t, locs, attn)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_banded_sorted_decoder_queries():
    """Decoder-style Q != L: the sorted wrapper must match the XLA
    reference (4-d reference-point style locations already folded in by
    the caller, so plain random locs exercise the same math)."""
    from open_groundingdino_tpu.ops.msda_banded import (
        ms_deform_attn_banded_sorted,
    )

    Qd = 300
    rng = np.random.RandomState(5)
    v_t = rng.randn(B * H, D, L).astype(np.float32)
    locs = rng.uniform(-0.05, 1.05, (B * H, NL, NP, 2, Qd)).astype(
        np.float32
    )
    attn = rng.uniform(0, 1, (B * H, NL, NP, Qd)).astype(np.float32)

    out = jax.jit(
        lambda vs, l, a: ms_deform_attn_banded_sorted(vs, SHAPES, l, a, NP)
    )(_banded_values(v_t), locs, attn)

    value = jnp.transpose(jnp.asarray(v_t).reshape(B, H, D, L), (0, 3, 1, 2))
    locs_b = jnp.transpose(
        locs.reshape(B, H, NL, NP, 2, Qd), (0, 5, 1, 2, 3, 4)
    )
    attn_b = jnp.transpose(attn.reshape(B, H, NL, NP, Qd), (0, 4, 1, 2, 3))
    ref = ms_deform_attn_xla(value, SHAPES, locs_b, attn_b)
    ref_dq = jnp.transpose(
        ref.reshape(B, Qd, H, D), (0, 2, 3, 1)
    ).reshape(B * H, D, Qd)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref_dq),
                               rtol=1e-4, atol=1e-4)

    # grads flow through the sort wrapper
    g = jax.jit(jax.grad(
        lambda l: jnp.sum(
            jnp.sin(ms_deform_attn_banded_sorted(
                _banded_values(v_t), SHAPES, l, attn, NP
            ))
        )
    ))(jnp.asarray(locs))
    assert np.isfinite(np.asarray(g)).all()


def test_banded_module_xy_parity(monkeypatch):
    """MSDA_XY=1 (XY-major sampling locations, no minor-2 dims) must match
    the default layout exactly — forward and all parameter grads, both the
    encoder-style (Q == L) and decoder-style (Q != L, sorted wrapper)."""
    monkeypatch.setenv("MSDA_BANDED", "1")
    from open_groundingdino_tpu.models.deformable import MSDeformAttn

    C = H * D * 2
    heads = 4
    rng = np.random.RandomState(17)
    kpm = np.zeros((B, L), bool)
    kpm[1, -5:] = True

    for Qd in (Q, 32):
        query = rng.randn(B, Qd, C).astype(np.float32)
        value = rng.randn(B, L, C).astype(np.float32)
        ref_pts = rng.uniform(0.05, 0.95, (B, Qd, NL, 2)).astype(np.float32)

        def run(env):
            monkeypatch.setenv("MSDA_XY", env)
            m = MSDeformAttn(embed_dim=C, num_heads=heads, num_levels=NL,
                             num_points=NP, impl="pallas")
            p = m.init(jax.random.PRNGKey(0), query, value, ref_pts,
                       SHAPES, kpm)
            out = m.apply(p, query, value, ref_pts, SHAPES, kpm)
            g = jax.grad(
                lambda pp: jnp.sum(jnp.sin(
                    m.apply(pp, query, value, ref_pts, SHAPES, kpm)))
            )(p)
            return p, out, g

        p0, o0, g0 = run("0")
        p1, o1, g1 = run("1")
        assert (jax.tree_util.tree_structure(p0)
                == jax.tree_util.tree_structure(p1))
        np.testing.assert_allclose(np.asarray(o0), np.asarray(o1),
                                   rtol=2e-4, atol=2e-4)
        for (kp, a), (_, b) in zip(
            jax.tree_util.tree_leaves_with_path(g0),
            jax.tree_util.tree_leaves_with_path(g1),
        ):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-3,
                err_msg=jax.tree_util.keystr(kp),
            )
