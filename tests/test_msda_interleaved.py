"""Interleaved-value MSDA path (merged-range sweep): numeric + gradient
parity vs the raster pallas path and the XLA reference, on the 8-device CPU
mesh in interpret mode.

The encoder stores hidden states AND deformable values in the row-band
interleaved order (ops/interleave.py); tap positions are remapped in closed
form and the kernel sweeps ONE merged range per query block instead of one
per level.  Since the op is a gather, outputs must be bit-for-bit the same
function of the inputs — the layout is an internal permutation."""
import jax
import jax.numpy as jnp
import numpy as np

from open_groundingdino_tpu.ops.interleave import row_band_layout
from open_groundingdino_tpu.ops.msda import ms_deform_attn_xla
from open_groundingdino_tpu.ops.msda_pallas import ms_deform_attn_pallas_t

B, H, D, NL, NP = 2, 2, 8, 4, 4
SHAPES = ((8, 12), (4, 6), (2, 3), (1, 2))
L = sum(h * w for h, w in SHAPES)
Q = L  # encoder: queries == tokens


def _inputs(seed=0):
    rng = np.random.RandomState(seed)
    v_t = rng.randn(B * H, D, L).astype(np.float32)
    locs = rng.uniform(0.02, 0.98, (B * H, NL, NP, 2, Q)).astype(np.float32)
    attn = rng.uniform(0, 1, (B * H, NL, NP, Q)).astype(np.float32)
    return v_t, locs, attn


def _xla_ref(v_t, locs, attn):
    value = jnp.transpose(v_t.reshape(B, H, D, L), (0, 3, 1, 2))
    locs_b = jnp.transpose(
        locs.reshape(B, H, NL, NP, 2, Q), (0, 5, 1, 2, 3, 4)
    )
    attn_b = jnp.transpose(attn.reshape(B, H, NL, NP, Q), (0, 4, 1, 2, 3))
    out = ms_deform_attn_xla(value, SHAPES, locs_b, attn_b)
    return jnp.transpose(
        out.reshape(B, Q, H, D), (0, 2, 1, 3)
    ).reshape(B * H, Q, D)


def test_interleaved_forward_matches_raster_and_xla():
    v_t, locs, attn = _inputs()
    perm, _ = row_band_layout(SHAPES)
    v_int = v_t[:, :, perm]

    out_int = jax.jit(
        lambda v, l, a: ms_deform_attn_pallas_t(v, SHAPES, l, a, "interleaved")
    )(v_int, locs, attn)
    out_ras = jax.jit(
        lambda v, l, a: ms_deform_attn_pallas_t(v, SHAPES, l, a)
    )(v_t, locs, attn)
    ref = _xla_ref(v_t, locs, attn)

    # merged sweep sums taps in a different order than per-level sweeps:
    # pure f32 accumulation-order noise
    np.testing.assert_allclose(np.asarray(out_int), np.asarray(out_ras),
                               rtol=5e-4, atol=5e-4)
    np.testing.assert_allclose(np.asarray(out_int), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_interleaved_grads_match_raster():
    v_t, locs, attn = _inputs(1)
    perm, _ = row_band_layout(SHAPES)
    inv = np.argsort(perm)
    v_int = v_t[:, :, perm]

    def loss_int(v, l, a):
        return jnp.sum(
            jnp.sin(ms_deform_attn_pallas_t(v, SHAPES, l, a, "interleaved"))
        )

    def loss_ras(v, l, a):
        return jnp.sum(jnp.sin(ms_deform_attn_pallas_t(v, SHAPES, l, a)))

    gi = jax.jit(jax.grad(loss_int, argnums=(0, 1, 2)))(v_int, locs, attn)
    gr = jax.jit(jax.grad(loss_ras, argnums=(0, 1, 2)))(v_t, locs, attn)

    # grad wrt value comes back in interleaved layout: un-permute
    np.testing.assert_allclose(
        np.asarray(gi[0])[:, :, inv], np.asarray(gr[0]),
        rtol=5e-4, atol=5e-4, err_msg="grad_value",
    )
    for a, b, name in ((gi[1], gr[1], "locs"), (gi[2], gr[2], "attn")):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=5e-4, err_msg=name)


def test_encoder_layer_interleaved_matches_raster_module():
    """DeformableEncoderLayer with interleaved inputs/value must equal the
    raster-layout layer on un-permuted inputs (full module: projections,
    kernel, custom VJP, LN/FFN)."""
    from open_groundingdino_tpu.models.transformer import (
        DeformableEncoderLayer,
    )

    C = H * D
    rng = np.random.RandomState(3)
    src = rng.randn(B, Q, C).astype(np.float32)
    pos = rng.randn(B, Q, C).astype(np.float32)
    ref_pts = rng.uniform(0.1, 0.9, (B, Q, NL, 2)).astype(np.float32)
    kpm = np.zeros((B, Q), bool)
    kpm[1, -5:] = True

    perm, _ = row_band_layout(SHAPES)
    inv = np.argsort(perm)

    ras = DeformableEncoderLayer(
        d_model=C, d_ffn=32, n_levels=NL, n_heads=H, n_points=NP,
        msda_impl="pallas", spatial_shapes=SHAPES,
    )
    params = ras.init(jax.random.PRNGKey(0), src, pos, ref_pts, kpm)
    out_ras = ras.apply(params, src, pos, ref_pts, kpm)

    ilv = DeformableEncoderLayer(
        d_model=C, d_ffn=32, n_levels=NL, n_heads=H, n_points=NP,
        msda_impl="pallas", spatial_shapes=SHAPES,
        msda_value_layout="interleaved",
    )
    out_int = ilv.apply(
        params, src[:, perm], pos[:, perm], ref_pts[:, perm], kpm[:, perm]
    )
    np.testing.assert_allclose(
        np.asarray(out_int)[:, inv], np.asarray(out_ras),
        rtol=2e-4, atol=2e-4,
    )
