"""The encoder's one-shot 128-alignment stream padding (transformer.py
_encode) is exact: full nano model with msda_impl='pallas' (interpret mode
on CPU — banded encoder kernel + sorted decoder kernel + fusion kernel, all
fed the pre-padded stream) vs msda_impl='xla' (no perm, no pad).

Nano shapes give S=510 -> S_pad=512, so the pad path (2 masked tail
queries) is genuinely exercised.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp


@pytest.fixture(scope="module")
def tiny_inputs():
    B, H, W, T = 2, 64, 96, 32
    rng = np.random.RandomState(11)
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


def test_padded_stream_full_model_matches_xla(tiny_inputs):
    m_ref = _build("xla")
    m_pal = _build("pallas")
    params = jax.jit(lambda: m_ref.init(jax.random.PRNGKey(0),
                                        **tiny_inputs))()
    out_ref = m_ref.apply(params, **tiny_inputs)
    out_pal = jax.jit(lambda p: m_pal.apply(p, **tiny_inputs))(params)
    np.testing.assert_allclose(
        np.asarray(out_pal["pred_boxes"]),
        np.asarray(out_ref["pred_boxes"]),
        atol=5e-4, rtol=5e-4,
    )
    lg_ref = np.asarray(out_ref["pred_logits"])
    lg_pal = np.asarray(out_pal["pred_logits"])
    finite = np.isfinite(lg_ref)
    assert (finite == np.isfinite(lg_pal)).all()
    np.testing.assert_allclose(
        lg_pal[finite], lg_ref[finite], atol=5e-4, rtol=5e-4
    )
