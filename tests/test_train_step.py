"""Jitted train step over the 8-device CPU mesh: data-parallel sharded batch,
replicated params, on-device matching — loss must fall on a fixed batch.
This is the pjit/psum capability test the torch reference cannot run without
a GPU cluster (SURVEY.md section 4)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from open_groundingdino_tpu.models.bert import BertConfig
from open_groundingdino_tpu.models.criterion import SetCriterion
from open_groundingdino_tpu.models.groundingdino import GroundingDINO
from open_groundingdino_tpu.models.swin import SwinConfig
from open_groundingdino_tpu.parallel.mesh import make_mesh, replicate_tree, shard_batch
from open_groundingdino_tpu.parallel.optim import make_optimizer
from open_groundingdino_tpu.parallel.train_state import TrainState, make_train_step

B, T, QN, G = 8, 16, 12, 3
IMG = 32


def _tiny_model():
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
        enc_layers=1, dec_layers=2, dim_feedforward=64, max_text_len=T,
    )


def _batch(seed=0):
    rng = np.random.RandomState(seed)
    pos_maps = np.zeros((B, G, T), np.float32)
    pos_maps[:, :, 2:4] = 1.0
    return {
        "images": rng.randn(B, IMG, IMG, 3).astype(np.float32),
        "image_sizes": np.full((B, 2), IMG, np.int32),
        "input_ids": rng.randint(5, 40, size=(B, T)).astype(np.int32),
        "text_token_mask": np.ones((B, T), bool),
        "position_ids": np.tile(np.arange(T, dtype=np.int32)[None], (B, 1)),
        "text_self_attention_masks": np.tile(np.eye(T, dtype=bool)[None], (B, 1, 1))
        | True,
        "gt_boxes": (
            rng.uniform(0.3, 0.7, (B, G, 4)) * np.asarray([1, 1, 0.3, 0.3])
        ).astype(np.float32),
        "gt_pos_maps": pos_maps,
        "gt_valid": np.ones((B, G), bool),
    }


@pytest.mark.slow
def test_train_step_8dev_mesh_loss_decreases():
    assert jax.device_count() == 8
    mesh = make_mesh()
    model = _tiny_model()
    batch = _batch()

    init_batch = {
        k: v for k, v in batch.items()
        if k not in ("gt_boxes", "gt_pos_maps", "gt_valid")
    }
    params = jax.jit(model.init)(jax.random.PRNGKey(0), **init_batch)["params"]
    tx = make_optimizer(params, lr=1e-3, lr_backbone=1e-4, clip_max_norm=0.1)
    state = TrainState.create(params, tx)
    state = replicate_tree(state, mesh)

    crit = SetCriterion(num_queries=QN)
    train_step = jax.jit(make_train_step(model, crit), donate_argnums=(0,))

    sharded = shard_batch(batch, mesh)
    losses = []
    for _ in range(4):
        state, metrics = train_step(state, sharded)
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], losses
    assert float(metrics["grad_norm"]) > 0


def test_frozen_params_do_not_update():
    mesh = make_mesh()
    model = _tiny_model()
    batch = _batch(1)
    init_batch = {
        k: v for k, v in batch.items()
        if k not in ("gt_boxes", "gt_pos_maps", "gt_valid")
    }
    params = jax.jit(model.init)(jax.random.PRNGKey(1), **init_batch)["params"]
    tx = make_optimizer(
        params, lr=1e-3, lr_backbone=1e-4, frozen_keys=("bert",)
    )
    state = TrainState.create(params, tx)
    crit = SetCriterion(num_queries=QN)
    train_step = jax.jit(make_train_step(model, crit))
    new_state, _ = train_step(state, shard_batch(batch, mesh))
    before = np.asarray(params["bert"]["layer_0"]["q"]["kernel"])
    after = np.asarray(new_state.params["bert"]["layer_0"]["q"]["kernel"])
    np.testing.assert_array_equal(before, after)
    fm_before = np.asarray(params["feat_map"]["kernel"])
    fm_after = np.asarray(new_state.params["feat_map"]["kernel"])
    assert np.abs(fm_before - fm_after).max() > 0


def test_remat_droppath_train_step():
    """Regression: nn.remat traces every call argument, so the fusion
    droppath branch must read `deterministic` as a static module attribute
    — with use_checkpoint + fusion_droppath the default-config train path
    crashed (TracerBoolConversionError) when it was a call kwarg."""
    mesh = make_mesh()
    model = GroundingDINO(
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
        enc_layers=1, dec_layers=2, dim_feedforward=64, max_text_len=T,
        use_checkpoint=True, use_transformer_ckpt=True, fusion_droppath=0.1,
    )
    batch = _batch(3)
    init_batch = {
        k: v for k, v in batch.items()
        if k not in ("gt_boxes", "gt_pos_maps", "gt_valid")
    }
    params = jax.jit(model.init)(jax.random.PRNGKey(3), **init_batch)["params"]
    tx = make_optimizer(params, lr=1e-3, lr_backbone=1e-4)
    state = TrainState.create(params, tx)
    step = jax.jit(make_train_step(model, SetCriterion(num_queries=QN)))
    new_state, metrics = step(state, shard_batch(batch, mesh))
    assert np.isfinite(float(metrics["loss"]))


def test_remat_save_kernels_grad_parity(monkeypatch):
    """REMAT_SAVE_KERNELS=1 swaps the remat policy to
    save_only_these_names("msda_out", "fusion_attn_out") so the backward
    reuses stored kernel outputs instead of re-running the forwards — a
    scheduling change only.  One train step must produce the same params
    as the default everything-rematerialized policy."""
    mesh = make_mesh()

    def run(env):
        monkeypatch.setenv("REMAT_SAVE_KERNELS", env)
        model = GroundingDINO(
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
            enc_layers=1, dec_layers=2, dim_feedforward=64, max_text_len=T,
            use_checkpoint=True, use_transformer_ckpt=True,
        )
        batch = _batch(7)
        init_batch = {
            k: v for k, v in batch.items()
            if k not in ("gt_boxes", "gt_pos_maps", "gt_valid")
        }
        params = jax.jit(model.init)(jax.random.PRNGKey(7), **init_batch)["params"]
        tx = make_optimizer(params, lr=1e-3, lr_backbone=1e-4)
        state = TrainState.create(params, tx)
        step = jax.jit(make_train_step(model, SetCriterion(num_queries=QN)))
        new_state, metrics = step(state, shard_batch(batch, mesh))
        assert np.isfinite(float(metrics["loss"]))
        return new_state.params

    p0 = run("0")
    p1 = run("1")
    for path, a in jax.tree_util.tree_leaves_with_path(p0):
        b = p1
        for k in path:
            b = b[k.key]
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-7,
            err_msg=jax.tree_util.keystr(path),
        )


def test_nonfinite_step_skips_update():
    """Per-step device-side NaN guard (reference engine_multi.py:544-547):
    a batch that produces a non-finite loss must leave params/opt_state
    untouched and bump nonfinite_count; a clean batch afterwards updates."""
    mesh = make_mesh()
    model = _tiny_model()
    batch = _batch(5)
    init_batch = {
        k: v for k, v in batch.items()
        if k not in ("gt_boxes", "gt_pos_maps", "gt_valid")
    }
    params = jax.jit(model.init)(jax.random.PRNGKey(5), **init_batch)["params"]
    tx = make_optimizer(params, lr=1e-3, lr_backbone=1e-4)
    state = TrainState.create(params, tx, use_ema=True)
    step = jax.jit(
        make_train_step(model, SetCriterion(num_queries=QN), ema_decay=0.99)
    )

    bad = dict(batch)
    bad["images"] = np.full_like(batch["images"], np.nan)
    state1, metrics = step(state, shard_batch(bad, mesh))
    assert not np.isfinite(float(metrics["loss"]))
    assert int(metrics["nonfinite_count"]) == 1
    np.testing.assert_array_equal(
        np.asarray(state.params["feat_map"]["kernel"]),
        np.asarray(state1.params["feat_map"]["kernel"]),
    )
    # the skipped step is a no-op for the EMA weights too
    np.testing.assert_array_equal(
        np.asarray(state.ema_params["feat_map"]["kernel"]),
        np.asarray(state1.ema_params["feat_map"]["kernel"]),
    )
    # opt_state moments untouched too — no NaN can hide there
    for leaf in jax.tree_util.tree_leaves(state1.opt_state):
        if hasattr(leaf, "dtype") and jnp.issubdtype(leaf.dtype, jnp.floating):
            assert np.isfinite(np.asarray(leaf)).all()

    state2, metrics2 = step(state1, shard_batch(batch, mesh))
    assert np.isfinite(float(metrics2["loss"]))
    assert int(metrics2["nonfinite_count"]) == 1  # no new bad steps
    assert (
        np.abs(
            np.asarray(state2.params["feat_map"]["kernel"])
            - np.asarray(state1.params["feat_map"]["kernel"])
        ).max()
        > 0
    )
    assert (
        np.abs(
            np.asarray(state2.ema_params["feat_map"]["kernel"])
            - np.asarray(state1.ema_params["feat_map"]["kernel"])
        ).max()
        > 0
    )


def test_bf16_train_step():
    """Mixed-precision step: fp32 params, bf16 compute."""
    mesh = make_mesh()
    model = _tiny_model()
    batch = _batch(2)
    init_batch = {
        k: v for k, v in batch.items()
        if k not in ("gt_boxes", "gt_pos_maps", "gt_valid")
    }
    params = jax.jit(model.init)(jax.random.PRNGKey(2), **init_batch)["params"]
    tx = make_optimizer(params, lr=1e-3, lr_backbone=1e-4)
    state = TrainState.create(params, tx)
    step = jax.jit(make_train_step(model, crit := SetCriterion(num_queries=QN),
                                   compute_dtype=jnp.bfloat16))
    new_state, metrics = step(state, shard_batch(batch, mesh))
    assert np.isfinite(float(metrics["loss"]))
    # params remain fp32 masters
    assert new_state.params["feat_map"]["kernel"].dtype == jnp.float32


def test_multi_step_matches_single_steps():
    """make_multi_train_step (lax.scan, one dispatch per n steps) must be
    numerically equivalent to running make_train_step n times: same
    per-step losses and matching params (dropout is keyed by the carried
    state.step, so the scan body sees the same rng sequence; XLA fuses
    the scanned body differently, so the comparison is tight-tolerance
    rather than bitwise)."""
    from open_groundingdino_tpu.parallel.train_state import (
        make_multi_train_step,
    )

    mesh = make_mesh()
    model = _tiny_model()
    crit = SetCriterion(num_queries=QN)
    b0, b1 = _batch(11), _batch(12)
    init_batch = {
        k: v for k, v in b0.items()
        if k not in ("gt_boxes", "gt_pos_maps", "gt_valid")
    }
    params = jax.jit(model.init)(jax.random.PRNGKey(5), **init_batch)["params"]
    tx = make_optimizer(params, lr=1e-3, lr_backbone=1e-4)

    s_single = TrainState.create(params, tx)
    step = jax.jit(make_train_step(model, crit))
    losses_single = []
    for b in (b0, b1):
        s_single, m = step(s_single, shard_batch(b, mesh))
        losses_single.append(float(m["loss"]))

    s_multi = TrainState.create(params, tx)
    multi = jax.jit(make_multi_train_step(model, crit, 2))
    stacked = {
        k: np.stack([b0[k], b1[k]]) for k in b0
    }
    s_multi, ms = multi(s_multi, stacked)

    assert int(s_multi.step) == 2
    np.testing.assert_allclose(
        np.asarray(ms["loss"]), np.asarray(losses_single), rtol=1e-6
    )
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-5
        ),
        s_single.params, s_multi.params,
    )
