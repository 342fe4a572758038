"""Full-checkpoint converter: a synthetic torch-layout state_dict with the
reference module key names must convert to a tree that exactly matches the
flax init tree (names + shapes) and run.  The reverse exporter
(export_groundingdino_checkpoint) must invert it leaf-for-leaf, including
the reference's shared-box-head key aliases and the .pth container
roundtrip."""
import jax
import jax.numpy as jnp
import numpy as np

from open_groundingdino_tpu.models.bert import BertConfig
from open_groundingdino_tpu.models.groundingdino import GroundingDINO
from open_groundingdino_tpu.models.swin import SwinConfig
from open_groundingdino_tpu.utils.checkpoint import (
    convert_groundingdino_checkpoint,
    export_groundingdino_checkpoint,
    load_torch_state_dict,
    save_torch_checkpoint,
)

T, QN = 16, 12
SWIN = SwinConfig(
    embed_dim=8, depths=(1, 1, 1, 1), num_heads=(1, 2, 2, 4), window_size=4,
    out_indices=(1, 2, 3),
)
BERT = BertConfig(
    vocab_size=40, hidden_size=32, num_hidden_layers=2, num_attention_heads=4,
    intermediate_size=32, max_position_embeddings=32,
    hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
)


def _model():
    return GroundingDINO(
        swin_cfg=SWIN, bert_cfg=BERT, hidden_dim=32, num_queries=QN, nheads=4,
        num_feature_levels=4, enc_layers=2, dec_layers=2, dim_feedforward=64,
        max_text_len=T,
    )


def _torch_layout_state_dict(flax_params):
    """Reverse-map the flax init tree into reference-named torch tensors.
    This validates converter mechanics (shape transposes + tree paths)."""
    rng = np.random.RandomState(0)
    sd = {}

    def lin(prefix, tree):
        sd[f"{prefix}.weight"] = np.asarray(tree["kernel"]).T
        if "bias" in tree:
            sd[f"{prefix}.bias"] = np.asarray(tree["bias"])

    def ln(prefix, tree):
        sd[f"{prefix}.weight"] = np.asarray(tree["scale"])
        sd[f"{prefix}.bias"] = np.asarray(tree["bias"])

    p = flax_params

    # bert
    be = p["bert"]["embeddings"]
    sd["bert.embeddings.word_embeddings.weight"] = np.asarray(
        be["word_embeddings"]["embedding"]
    )
    sd["bert.embeddings.position_embeddings.weight"] = np.asarray(
        be["position_embeddings"]["embedding"]
    )
    sd["bert.embeddings.token_type_embeddings.weight"] = np.asarray(
        be["token_type_embeddings"]["embedding"]
    )
    ln("bert.embeddings.LayerNorm", be["ln"])
    for i in range(BERT.num_hidden_layers):
        l = p["bert"][f"layer_{i}"]
        pre = f"bert.encoder.layer.{i}"
        lin(f"{pre}.attention.self.query", l["q"])
        lin(f"{pre}.attention.self.key", l["k"])
        lin(f"{pre}.attention.self.value", l["v"])
        lin(f"{pre}.attention.output.dense", l["attn_out"])
        ln(f"{pre}.attention.output.LayerNorm", l["attn_ln"])
        lin(f"{pre}.intermediate.dense", l["inter"])
        lin(f"{pre}.output.dense", l["out"])
        ln(f"{pre}.output.LayerNorm", l["out_ln"])
    lin("feat_map", p["feat_map"])

    # swin backbone
    bb = p["backbone"]
    sd["backbone.0.patch_embed.proj.weight"] = np.asarray(
        bb["patch_embed"]["kernel"]
    ).transpose(3, 2, 0, 1)
    sd["backbone.0.patch_embed.proj.bias"] = np.asarray(bb["patch_embed"]["bias"])
    ln("backbone.0.patch_embed.norm", bb["patch_norm"])
    for i, depth in enumerate(SWIN.depths):
        for b in range(depth):
            blk = bb[f"layer_{i}_block_{b}"]
            pre = f"backbone.0.layers.{i}.blocks.{b}"
            ln(f"{pre}.norm1", blk["norm1"])
            sd[f"{pre}.attn.relative_position_bias_table"] = np.asarray(
                blk["attn"]["relative_position_bias_table"]
            )
            lin(f"{pre}.attn.qkv", blk["attn"]["qkv"])
            lin(f"{pre}.attn.proj", blk["attn"]["proj"])
            ln(f"{pre}.norm2", blk["norm2"])
            lin(f"{pre}.mlp.fc1", blk["fc1"])
            lin(f"{pre}.mlp.fc2", blk["fc2"])
        if i < len(SWIN.depths) - 1:
            ds = bb[f"downsample_{i}"]
            ln(f"backbone.0.layers.{i}.downsample.norm", ds["norm"])
            sd[f"backbone.0.layers.{i}.downsample.reduction.weight"] = np.asarray(
                ds["reduction"]["kernel"]
            ).T
    for i in SWIN.out_indices:
        ln(f"backbone.0.norm{i}", bb[f"out_norm_{i}"])

    # input projections
    for l in range(4):
        conv = p[f"input_proj_{l}_conv"]
        sd[f"input_proj.{l}.0.weight"] = np.asarray(conv["kernel"]).transpose(
            3, 2, 0, 1
        )
        sd[f"input_proj.{l}.0.bias"] = np.asarray(conv["bias"])
        gn = p[f"input_proj_{l}_gn"]
        sd[f"input_proj.{l}.1.weight"] = np.asarray(gn["scale"])
        sd[f"input_proj.{l}.1.bias"] = np.asarray(gn["bias"])

    # transformer
    t = p["transformer"]
    sd["transformer.level_embed"] = np.asarray(t["level_embed"])
    sd["transformer.tgt_embed.weight"] = np.asarray(t["tgt_embed"])
    lin("transformer.enc_output", t["enc_output"])
    ln("transformer.enc_output_norm", t["enc_output_norm"])

    def msd(prefix, tree):
        for k in ("value_proj", "sampling_offsets", "attention_weights", "output_proj"):
            lin(f"{prefix}.{k}", tree[k])

    def mha(prefix, tree):
        sd[f"{prefix}.in_proj_weight"] = np.asarray(tree["in_proj_weight"])
        sd[f"{prefix}.in_proj_bias"] = np.asarray(tree["in_proj_bias"])
        lin(f"{prefix}.out_proj", tree["out_proj"])

    def mlp(prefix, tree):
        for name, sub in tree.items():
            i = name.split("_")[-1]
            lin(f"{prefix}.layers.{i}", sub)

    for i in range(2):  # enc_layers
        e = t[f"enc_layer_{i}"]
        pre = f"transformer.encoder.layers.{i}"
        msd(f"{pre}.self_attn", e["self_attn"])
        ln(f"{pre}.norm1", e["norm1"])
        lin(f"{pre}.linear1", e["linear1"])
        lin(f"{pre}.linear2", e["linear2"])
        ln(f"{pre}.norm2", e["norm2"])
        f = t[f"fusion_{i}"]
        fpre = f"transformer.encoder.fusion_layers.{i}"
        ln(f"{fpre}.layer_norm_v", f["layer_norm_v"])
        ln(f"{fpre}.layer_norm_l", f["layer_norm_l"])
        sd[f"{fpre}.gamma_v"] = np.asarray(f["gamma_v"])
        sd[f"{fpre}.gamma_l"] = np.asarray(f["gamma_l"])
        for k in ("v_proj", "l_proj", "values_v_proj", "values_l_proj",
                  "out_v_proj", "out_l_proj"):
            lin(f"{fpre}.attn.{k}", f["attn"][k])
        tl = t[f"text_layer_{i}"]
        tpre = f"transformer.encoder.text_layers.{i}"
        mha(f"{tpre}.self_attn", tl["self_attn"])
        lin(f"{tpre}.linear1", tl["linear1"])
        lin(f"{tpre}.linear2", tl["linear2"])
        ln(f"{tpre}.norm1", tl["norm1"])
        ln(f"{tpre}.norm2", tl["norm2"])

    for i in range(2):  # dec_layers
        d = t[f"dec_layer_{i}"]
        pre = f"transformer.decoder.layers.{i}"
        msd(f"{pre}.cross_attn", d["cross_attn"])
        ln(f"{pre}.norm1", d["norm1"])
        mha(f"{pre}.ca_text", d["ca_text"])
        ln(f"{pre}.catext_norm", d["catext_norm"])
        mha(f"{pre}.self_attn", d["self_attn"])
        ln(f"{pre}.norm2", d["norm2"])
        lin(f"{pre}.linear1", d["linear1"])
        lin(f"{pre}.linear2", d["linear2"])
        ln(f"{pre}.norm3", d["norm3"])

    mlp("transformer.decoder.ref_point_head", t["ref_point_head"])
    ln("transformer.decoder.norm", t["dec_norm"])
    mlp("bbox_embed.0", t["bbox_embed"])
    mlp("transformer.enc_out_bbox_embed", t["enc_out_bbox_embed"])
    return sd


def test_converter_roundtrip():
    model = _model()
    B = 1
    rng = np.random.RandomState(0)
    inputs = dict(
        images=jnp.asarray(rng.randn(B, 32, 32, 3).astype(np.float32)),
        image_sizes=jnp.full((B, 2), 32, jnp.int32),
        input_ids=jnp.asarray(rng.randint(5, 40, (B, T)), jnp.int32),
        text_token_mask=jnp.ones((B, T), bool),
        position_ids=jnp.tile(jnp.arange(T, dtype=jnp.int32)[None], (B, 1)),
        text_self_attention_masks=jnp.ones((B, T, T), bool),
    )
    init = model.init(jax.random.PRNGKey(0), **inputs)["params"]
    sd = _torch_layout_state_dict(init)
    converted = convert_groundingdino_checkpoint(
        sd, swin_depths=SWIN.depths, out_indices=SWIN.out_indices,
        num_feature_levels=4, enc_layers=2, dec_layers=2,
        bert_layers=BERT.num_hidden_layers,
    )
    ref = jax.tree_util.tree_map(lambda a: np.asarray(a), init)
    got = jax.tree_util.tree_map(lambda a: np.asarray(a), converted)
    ref_flat = jax.tree_util.tree_flatten_with_path(ref)[0]
    got_flat = {tuple(str(k) for k in kp): v
                for kp, v in jax.tree_util.tree_flatten_with_path(got)[0]}
    assert set(got_flat) == {
        tuple(str(k) for k in kp) for kp, _ in ref_flat
    }
    for kp, v in ref_flat:
        key = tuple(str(k) for k in kp)
        np.testing.assert_allclose(got_flat[key], v, atol=1e-6, err_msg=str(key))

    out = model.apply({"params": converted}, **inputs)
    assert out["pred_logits"].shape == (B, QN, T)


def _init_params():
    model = _model()
    rng = np.random.RandomState(0)
    inputs = dict(
        images=jnp.asarray(rng.randn(1, 32, 32, 3).astype(np.float32)),
        image_sizes=jnp.full((1, 2), 32, jnp.int32),
        input_ids=jnp.asarray(rng.randint(5, 40, (1, T)), jnp.int32),
        text_token_mask=jnp.ones((1, T), bool),
        position_ids=jnp.tile(jnp.arange(T, dtype=jnp.int32)[None], (1, 1)),
        text_self_attention_masks=jnp.ones((1, T, T), bool),
    )
    return model.init(jax.random.PRNGKey(0), **inputs)["params"]


def test_export_convert_identity(tmp_path):
    """convert(export(params)) must equal params leaf-for-leaf, the export
    must emit the helper's exact torch key/value set plus the reference's
    shared-box-head aliases, and the .pth container must roundtrip through
    load_torch_state_dict."""
    init = _init_params()
    sd = export_groundingdino_checkpoint(jax.device_get(init))

    # exporter ⊇ the hand-written reverse map used by the converter test
    manual = _torch_layout_state_dict(init)
    missing = set(manual) - set(sd)
    assert not missing, sorted(missing)[:5]
    for k, v in manual.items():
        np.testing.assert_array_equal(sd[k], v, err_msg=k)

    # shared decoder box head emitted under every reference alias
    for i in range(2):  # dec_layers
        for j in range(3):
            assert f"bbox_embed.{i}.layers.{j}.weight" in sd
            assert f"transformer.decoder.bbox_embed.{i}.layers.{j}.weight" in sd
    np.testing.assert_array_equal(
        sd["bbox_embed.1.layers.0.weight"], sd["bbox_embed.0.layers.0.weight"]
    )

    converted = convert_groundingdino_checkpoint(
        sd, swin_depths=SWIN.depths, out_indices=SWIN.out_indices,
        num_feature_levels=4, enc_layers=2, dec_layers=2,
        bert_layers=BERT.num_hidden_layers,
    )
    for kp, v in jax.tree_util.tree_flatten_with_path(jax.device_get(init))[0]:
        got = converted
        for k in kp:
            got = got[k.key]
        np.testing.assert_array_equal(np.asarray(got), np.asarray(v),
                                      err_msg=str(kp))

    # .pth container roundtrip (the format the reference loaders unwrap)
    pth = str(tmp_path / "export.pth")
    save_torch_checkpoint(pth, init, epoch=3)
    loaded = load_torch_state_dict(pth)
    assert set(loaded) == set(sd)
    np.testing.assert_allclose(
        loaded["transformer.level_embed"], sd["transformer.level_embed"]
    )


def test_converter_composes_with_enc_scan(monkeypatch):
    """ADVICE r4 (medium): the torch converter and the exporter must
    compose with the ENC_SCAN=1 stacked param layout — converting a
    reference checkpoint inside an ENC_SCAN process yields the stacked
    tree, and exporting an ENC_SCAN-trained tree auto-unstacks."""
    from open_groundingdino_tpu.utils.checkpoint import (
        adapt_encoder_layout,
        stack_encoder_scan_params,
    )

    init = _init_params()  # per-layer layout (ENC_SCAN unset in conftest)
    sd = export_groundingdino_checkpoint(jax.device_get(init))

    monkeypatch.setenv("ENC_SCAN", "1")
    converted = convert_groundingdino_checkpoint(
        sd, swin_depths=SWIN.depths, out_indices=SWIN.out_indices,
        num_feature_levels=4, enc_layers=2, dec_layers=2,
        bert_layers=BERT.num_hidden_layers,
    )
    assert "enc_scan" in converted["transformer"]
    assert "enc_layer_0" not in converted["transformer"]
    # values match the explicit stack of the per-layer conversion
    expect = stack_encoder_scan_params(jax.device_get(init)["transformer"], 2)
    for kp, v in jax.tree_util.tree_flatten_with_path(
        expect["enc_scan"]
    )[0]:
        got = converted["transformer"]["enc_scan"]
        for k in kp:
            got = got[k.key]
        np.testing.assert_allclose(np.asarray(got), np.asarray(v),
                                   atol=1e-6, err_msg=str(kp))

    # exporter accepts the stacked tree and emits the identical state_dict
    sd_scan = export_groundingdino_checkpoint(converted)
    assert set(sd_scan) == set(sd)
    for k in sd:
        np.testing.assert_allclose(sd_scan[k], sd[k], atol=1e-6, err_msg=k)

    # adapt_encoder_layout is idempotent and env-driven
    again = adapt_encoder_layout(converted)
    assert "enc_scan" in again["transformer"]
    monkeypatch.setenv("ENC_SCAN", "0")
    back = adapt_encoder_layout(converted)
    assert "enc_layer_0" in back["transformer"]


def test_adapt_train_state_layout_roundtrip(monkeypatch):
    """adapt_train_state_layout must adapt params AND the optimizer moment
    trees (cross-layout resume, ADVICE r4) and round-trip exactly."""
    import optax

    from open_groundingdino_tpu.parallel.train_state import TrainState
    from open_groundingdino_tpu.utils.checkpoint import (
        adapt_train_state_layout,
    )

    monkeypatch.setenv("ENC_SCAN", "0")
    init = _init_params()
    tx = optax.adamw(1e-4)
    state = jax.device_get(TrainState.create(init, tx))

    scan_state = adapt_train_state_layout(state, enc_scan=True)
    assert "enc_scan" in scan_state.params["transformer"]
    mu = scan_state.opt_state[0].mu
    assert "enc_scan" in mu["transformer"]

    back = adapt_train_state_layout(scan_state, enc_scan=False)
    for kp, v in jax.tree_util.tree_flatten_with_path(state.params)[0]:
        got = back.params
        for k in kp:
            got = got[k.key]
        np.testing.assert_array_equal(np.asarray(got), np.asarray(v),
                                      err_msg=str(kp))
    for kp, v in jax.tree_util.tree_flatten_with_path(
        state.opt_state[0].nu
    )[0]:
        got = back.opt_state[0].nu
        for k in kp:
            got = got[k.key]
        np.testing.assert_array_equal(np.asarray(got), np.asarray(v),
                                      err_msg=str(kp))
