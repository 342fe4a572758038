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


def test_injective_take_vjp_matches_autodiff():
    """_make_injective_take: gather-based VJP == jnp.take's scatter-add
    transpose, for both the forward permutation (no pad) and the
    live-extraction shape (padded source, injective index)."""
    from open_groundingdino_tpu.models.transformer import _make_injective_take

    rng = np.random.RandomState(0)
    L, S_pad, E = 21, 32, 8
    perm = rng.permutation(L).astype(np.int32)
    inv = np.argsort(perm).astype(np.int32)
    t = jnp.asarray(rng.randn(2, L, E), jnp.float32)
    g = jnp.asarray(rng.randn(2, L, E), jnp.float32)

    f = _make_injective_take(perm, inv, 0)
    ref_fn = lambda x: jnp.take(x, jnp.asarray(perm), axis=1)
    np.testing.assert_array_equal(np.asarray(f(t)), np.asarray(ref_fn(t)))
    gt = jax.vjp(f, t)[1](g)[0]
    gt_ref = jax.vjp(ref_fn, t)[1](g)[0]
    np.testing.assert_array_equal(np.asarray(gt), np.asarray(gt_ref))

    # padded-source extraction: take L live rows out of S_pad
    tp = jnp.asarray(rng.randn(2, S_pad, E), jnp.float32)
    f2 = _make_injective_take(inv, perm, S_pad - L)
    ref2 = lambda x: jnp.take(x, jnp.asarray(inv), axis=1)
    np.testing.assert_array_equal(np.asarray(f2(tp)), np.asarray(ref2(tp)))
    gt2 = jax.vjp(f2, tp)[1](g)[0]
    gt2_ref = jax.vjp(ref2, tp)[1](g)[0]
    np.testing.assert_array_equal(np.asarray(gt2), np.asarray(gt2_ref))


def test_enc_take_gather_full_model_grads(tiny_inputs, monkeypatch):
    """ENC_TAKE_GATHER=1 (gather-based take VJPs in _encode) must leave
    full-model gradients unchanged vs the scatter-add default."""
    m = _build("pallas")
    params = jax.jit(lambda: m.init(jax.random.PRNGKey(0), **tiny_inputs))()

    def loss(p):
        out = m.apply(p, **tiny_inputs)
        lg = out["pred_logits"]
        return (
            jnp.sum(out["pred_boxes"] ** 2)
            + jnp.sum(jnp.where(jnp.isfinite(lg), lg, 0.0) ** 2)
        )

    monkeypatch.setenv("ENC_TAKE_GATHER", "0")
    g0 = jax.grad(loss)(params)
    monkeypatch.setenv("ENC_TAKE_GATHER", "1")
    g1 = jax.grad(loss)(params)
    for a, b in zip(jax.tree_util.tree_leaves(g1),
                    jax.tree_util.tree_leaves(g0)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-6
        )
