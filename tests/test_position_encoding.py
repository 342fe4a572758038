"""Position-embedding numerics vs an independent numpy oracle implementing the
published DETR/DINO sine-embedding formulas (separate H/W temperatures,
normalized cumsum; interleaved sin/cos)."""
import math

import jax.numpy as jnp
import numpy as np

from open_groundingdino_tpu.models import position_encoding as pe


def _oracle_sine_hw(mask, npf=128, tH=20.0, tW=20.0):
    not_mask = (~mask).astype(np.float32)
    y = not_mask.cumsum(1)
    x = not_mask.cumsum(2)
    scale = 2 * math.pi
    y = y / (y[:, -1:, :] + 1e-6) * scale
    x = x / (x[:, :, -1:] + 1e-6) * scale
    i = np.arange(npf, dtype=np.float32)
    dtx = tW ** (2 * (i // 2) / npf)
    dty = tH ** (2 * (i // 2) / npf)
    px = x[..., None] / dtx
    py = y[..., None] / dty

    def ileave(p):
        return np.stack([np.sin(p[..., 0::2]), np.cos(p[..., 1::2])], -1).reshape(
            *p.shape[:-1], -1
        )

    return np.concatenate([ileave(py), ileave(px)], axis=-1)


def test_sine_hw_matches_oracle():
    mask = np.zeros((2, 10, 14), dtype=bool)
    mask[0, 7:, :] = True
    mask[0, :, 9:] = True
    out = pe.position_embedding_sine_hw(jnp.asarray(mask))
    ref = _oracle_sine_hw(mask)
    assert out.shape == (2, 10, 14, 256)
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-4)


def test_gen_sineembed_shapes_and_range():
    pos4 = jnp.asarray(np.random.RandomState(0).uniform(size=(2, 5, 4)).astype(np.float32))
    emb = pe.gen_sineembed_for_position(pos4)
    assert emb.shape == (2, 5, 512)
    assert np.all(np.abs(np.asarray(emb)) <= 1.0 + 1e-6)
    pos2 = pos4[..., :2]
    emb2 = pe.gen_sineembed_for_position(pos2)
    assert emb2.shape == (2, 5, 256)
    # y-embedding occupies the first 128 channels in both variants
    np.testing.assert_allclose(np.asarray(emb2), np.asarray(emb[..., :256]), atol=1e-6)


def test_get_sine_pos_embed_exchange():
    pos = jnp.asarray(np.random.RandomState(1).uniform(size=(3, 7, 1)).astype(np.float32))
    emb = pe.get_sine_pos_embed(pos, num_pos_feats=256, exchange_xy=False)
    assert emb.shape == (3, 7, 256)
