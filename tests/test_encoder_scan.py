"""ENC_SCAN=1 (lax.scan over stacked encoder-layer params) must be a pure
restructuring: same outputs and same parameter gradients as the eager
per-layer loop, through the stack/unstack param-layout adapters
(utils/checkpoint.stack_encoder_scan_params)."""
import jax
import jax.numpy as jnp
import numpy as np

from open_groundingdino_tpu.models.bert import BertConfig
from open_groundingdino_tpu.models.groundingdino import GroundingDINO
from open_groundingdino_tpu.models.swin import SwinConfig
from open_groundingdino_tpu.utils.checkpoint import (
    stack_encoder_scan_params,
    unstack_encoder_scan_params,
)

T, QN, NE = 16, 12, 2


def _model():
    return GroundingDINO(
        swin_cfg=SwinConfig(
            embed_dim=8, depths=(1, 1, 1, 1), num_heads=(1, 2, 2, 4),
            window_size=4, out_indices=(1, 2, 3),
        ),
        bert_cfg=BertConfig(
            vocab_size=40, hidden_size=32, num_hidden_layers=1,
            num_attention_heads=4, intermediate_size=32,
            max_position_embeddings=32, hidden_dropout_prob=0.0,
            attention_probs_dropout_prob=0.0,
        ),
        hidden_dim=32, num_queries=QN, nheads=4, num_feature_levels=4,
        enc_layers=NE, dec_layers=1, dim_feedforward=64, max_text_len=T,
        msda_impl="pallas",
    )


def _inputs():
    rng = np.random.RandomState(0)
    B = 2
    return dict(
        images=jnp.asarray(rng.randn(B, 32, 48, 3).astype(np.float32)),
        image_sizes=jnp.asarray([[32, 48]] * B, jnp.int32),
        input_ids=jnp.asarray(rng.randint(5, 40, (B, T)), jnp.int32),
        text_token_mask=jnp.ones((B, T), bool),
        position_ids=jnp.tile(jnp.arange(T, dtype=jnp.int32)[None], (B, 1)),
        text_self_attention_masks=jnp.ones((B, T, T), bool),
    )


def test_encoder_scan_matches_loop(monkeypatch):
    model = _model()
    inputs = _inputs()

    monkeypatch.setenv("ENC_SCAN", "0")
    p_loop = model.init(jax.random.PRNGKey(0), **inputs)["params"]
    out_loop = model.apply({"params": p_loop}, **inputs)

    # stacked layout must match a fresh ENC_SCAN init structurally
    monkeypatch.setenv("ENC_SCAN", "1")
    p_scan_init = model.init(jax.random.PRNGKey(0), **inputs)["params"]
    p_scan = dict(p_loop)
    p_scan["transformer"] = stack_encoder_scan_params(
        p_loop["transformer"], NE
    )
    assert (
        jax.tree_util.tree_structure(p_scan_init)
        == jax.tree_util.tree_structure(
            jax.tree_util.tree_map(jnp.asarray, p_scan)
        )
    )
    for (kp, a), (_, b) in zip(
        jax.tree_util.tree_flatten_with_path(p_scan_init)[0],
        jax.tree_util.tree_flatten_with_path(p_scan)[0],
    ):
        assert a.shape == np.asarray(b).shape, jax.tree_util.keystr(kp)

    out_scan = model.apply({"params": p_scan}, **inputs)
    for k in ("pred_logits", "pred_boxes"):
        np.testing.assert_allclose(
            np.asarray(out_scan[k]), np.asarray(out_loop[k]),
            rtol=2e-4, atol=2e-4, err_msg=k,
        )

    # round-trip the layout adapter
    back = unstack_encoder_scan_params(p_scan["transformer"])
    for kp, v in jax.tree_util.tree_flatten_with_path(
        p_loop["transformer"]
    )[0]:
        got = back
        for k in kp:
            got = got[k.key]
        np.testing.assert_array_equal(np.asarray(got), np.asarray(v),
                                      err_msg=str(kp))

    # gradients agree (scan grads unstacked back to per-layer layout)
    def loss_loop(p):
        monkeypatch.setenv("ENC_SCAN", "0")
        out = model.apply({"params": p}, **inputs)
        return jnp.sum(jnp.sin(out["pred_boxes"])) + jnp.sum(
            jnp.cos(out["pred_logits"]) * 1e-3
        )

    def loss_scan(p):
        out = model.apply({"params": p}, **inputs)
        return jnp.sum(jnp.sin(out["pred_boxes"])) + jnp.sum(
            jnp.cos(out["pred_logits"]) * 1e-3
        )

    monkeypatch.setenv("ENC_SCAN", "0")
    g_loop = jax.grad(loss_loop)(p_loop)
    monkeypatch.setenv("ENC_SCAN", "1")
    g_scan = jax.grad(loss_scan)(
        jax.tree_util.tree_map(jnp.asarray, p_scan)
    )
    g_scan_t = unstack_encoder_scan_params(g_scan["transformer"])
    # scan reassociates f32 accumulation vs the unrolled loop; for the
    # MSDA loc-grad chain a 1-ulp shift in a sampling location can flip a
    # bilinear-kink subgradient branch, giving O(1) relative error on
    # ISOLATED elements (measure-zero support edges — the CUDA reference
    # makes the same arbitrary choice at kinks).  Assert agreement in
    # aggregate: at most a handful of flipped elements per leaf, and a
    # small GLOBAL relative L2 distance over all encoder grads.
    num = 0.0
    den = 0.0
    for kp, v in jax.tree_util.tree_flatten_with_path(
        g_loop["transformer"]
    )[0]:
        got = g_scan_t
        for k in kp:
            got = got[k.key]
        a, b = np.asarray(got), np.asarray(v)
        bad = ~np.isclose(a, b, rtol=2e-3, atol=2e-3)
        # measured (scan_diag 2026-08-20): flips land ONLY on the
        # sampling_offsets leaves, <=15 elements of 4096 (1-2 flipped
        # (query, point) pairs x the C-row outer product); everything
        # else matches tightly
        limit = 32 if "sampling_offsets" in str(kp) else 0
        assert bad.sum() <= limit, (str(kp), int(bad.sum()), a.size)
        num += float(np.sum((a - b) ** 2))
        den += float(np.sum(b ** 2))
    assert (num / max(den, 1e-12)) ** 0.5 < 2e-3, (num, den)
