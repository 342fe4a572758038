"""Golden-chain regression: a fixed nano model on a fixed input must keep
producing the same outputs across refactors.

The per-module torch-oracle tests (test_swin_parity, test_fusion_text_parity,
test_decoder_parity, test_bert, test_resnet, test_msda*) pin each module to
the reference semantics; this test pins their COMPOSITION — the full
tokenize -> backbone -> fusion encoder -> two-stage -> decoder -> heads
chain (tools/save_goldens.py captures the same tensors from a real
checkpoint).  Any change that alters eval numerics beyond float noise
(kernel rewrites, layout changes, layer-order edits) fails here first.

Regenerate (only after an INTENDED semantic change, with justification):
    python -m pytest tests/test_goldens.py --regen-goldens
"""
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

GOLDEN = os.path.join(os.path.dirname(__file__), "goldens", "nano_chain.npz")


def _build():
    from open_groundingdino_tpu.models.bert import BertConfig
    from open_groundingdino_tpu.models.groundingdino import GroundingDINO
    from open_groundingdino_tpu.models.swin import SwinConfig

    B, T, IMG = 2, 20, 48
    model = GroundingDINO(
        swin_cfg=SwinConfig(
            embed_dim=8, depths=(1, 1, 1, 1), num_heads=(1, 2, 2, 4),
            window_size=4, out_indices=(1, 2, 3),
        ),
        bert_cfg=BertConfig(
            vocab_size=48, hidden_size=24, num_hidden_layers=1,
            num_attention_heads=4, intermediate_size=32,
            max_position_embeddings=32, hidden_dropout_prob=0.0,
            attention_probs_dropout_prob=0.0,
        ),
        hidden_dim=32, num_queries=10, nheads=4, num_feature_levels=4,
        enc_layers=2, dec_layers=2, dim_feedforward=48, max_text_len=T,
    )
    rng = np.random.RandomState(42)
    sam = np.tile(np.eye(T, dtype=bool)[None], (B, 1, 1))
    sam[:, 1:8, 1:8] = True
    inputs = dict(
        images=jnp.asarray(rng.randn(B, IMG, IMG, 3), jnp.float32),
        image_sizes=jnp.asarray([[IMG, IMG], [40, 36]], jnp.int32),
        input_ids=jnp.asarray(rng.randint(4, 48, (B, T)), jnp.int32),
        text_token_mask=jnp.asarray(np.arange(T)[None] < 12).repeat(B, 0),
        position_ids=jnp.tile(jnp.arange(T, dtype=jnp.int32)[None], (B, 1)),
        text_self_attention_masks=jnp.asarray(sam),
    )
    params = jax.jit(model.init)(jax.random.PRNGKey(7), **inputs)
    return model, params, inputs


def test_golden_chain(request):
    model, params, inputs = _build()
    out = jax.jit(model.apply)(params, **inputs)
    got = {
        "pred_logits": np.asarray(out["pred_logits"], np.float32),
        "pred_boxes": np.asarray(out["pred_boxes"], np.float32),
        "interm_logits": np.asarray(
            out["interm_outputs"]["pred_logits"], np.float32
        ),
        "interm_boxes": np.asarray(
            out["interm_outputs"]["pred_boxes"], np.float32
        ),
    }
    # -inf padding positions: compare finiteness separately, values on finite
    if request.config.getoption("--regen-goldens"):
        os.makedirs(os.path.dirname(GOLDEN), exist_ok=True)
        np.savez(GOLDEN, **got)
        pytest.skip("goldens regenerated")
    assert os.path.exists(GOLDEN), "run --regen-goldens once to create"
    want = np.load(GOLDEN)
    for k in got:
        w, g = want[k], got[k]
        assert w.shape == g.shape, k
        fin = np.isfinite(w)
        np.testing.assert_array_equal(fin, np.isfinite(g), err_msg=k)
        np.testing.assert_allclose(g[fin], w[fin], rtol=2e-4, atol=2e-4,
                                   err_msg=k)
