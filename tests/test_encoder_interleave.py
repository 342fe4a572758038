"""Interleaved encoder query ordering is exact: a static permutation of
independent deformable-attention queries, unpermuted on exit.

On CPU both msda_impl='xla' and msda_impl='auto' compute attention with the
XLA path, but 'auto' additionally routes the encoder through the interleaved
ordering — so comparing the two isolates the permutation logic exactly.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from open_groundingdino_tpu.models.transformer import _interleaved_query_order


def test_order_is_permutation():
    shapes = ((10, 16), (5, 8), (3, 4), (2, 2))
    perm = _interleaved_query_order(shapes)
    S = sum(h * w for h, w in shapes)
    assert sorted(perm.tolist()) == list(range(S))
    # blocks mix levels: the first 32 entries must not all come from level 0
    assert (perm[:32] >= 10 * 16).any()


@pytest.fixture(scope="module")
def tiny_inputs():
    B, H, W, T = 2, 64, 96, 32
    rng = np.random.RandomState(7)
    return dict(
        images=jnp.asarray(rng.randn(B, H, W, 3), jnp.float32),
        image_sizes=jnp.asarray([[H, W], [48, 80]], jnp.int32),
        input_ids=jnp.asarray(rng.randint(1, 60, (B, T)), jnp.int32),
        text_token_mask=jnp.asarray(np.arange(T)[None] < np.array([[T], [20]])),
        position_ids=jnp.tile(jnp.arange(T, dtype=jnp.int32)[None], (B, 1)),
        text_self_attention_masks=jnp.ones((B, T, T), bool),
    )


def _build(impl):
    from open_groundingdino_tpu.models.bert import BertConfig
    from open_groundingdino_tpu.models.groundingdino import GroundingDINO
    from open_groundingdino_tpu.models.swin import SwinConfig

    return GroundingDINO(
        swin_cfg=SwinConfig.from_name("swin_nano_test"),
        bert_cfg=BertConfig(
            vocab_size=64, hidden_size=32, num_hidden_layers=1,
            num_attention_heads=4, intermediate_size=64,
            max_position_embeddings=64,
        ),
        hidden_dim=32, num_queries=18, nheads=4, num_feature_levels=4,
        enc_layers=2, dec_layers=1, dim_feedforward=64, max_text_len=32,
        msda_impl=impl,
    )


def test_interleaved_encoder_matches_level_major(tiny_inputs):
    m_ref = _build("xla")
    m_perm = _build("auto")
    params = m_ref.init(jax.random.PRNGKey(0), **tiny_inputs)
    out_ref = m_ref.apply(params, **tiny_inputs)
    out_perm = m_perm.apply(params, **tiny_inputs)
    np.testing.assert_allclose(
        np.asarray(out_perm["pred_boxes"]),
        np.asarray(out_ref["pred_boxes"]),
        atol=2e-5, rtol=1e-4,
    )
    lg_ref = np.asarray(out_ref["pred_logits"])
    lg_perm = np.asarray(out_perm["pred_logits"])
    finite = np.isfinite(lg_ref)
    assert (finite == np.isfinite(lg_perm)).all()
    np.testing.assert_allclose(
        lg_perm[finite], lg_ref[finite], atol=2e-5, rtol=1e-4
    )
