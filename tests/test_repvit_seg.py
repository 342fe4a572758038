"""RepViT + Semantic-FPN car segmentor (pave/repvit_seg.py) — the native
equivalent of the reference's mmseg car-segmentation stage
(`/root/reference/inference_on_a_image_pave.py:187-283,337-357`)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from open_groundingdino_tpu.pave.repvit_seg import (
    RepViTConfig, RepViTSegmentor, RepViTBackbone, car_mask_to_bbox,
    derive_car_bbox, init_segmentor_params, save_segmentor_params,
    load_segmentor_params, segment_car_mask,
)

NANO = RepViTConfig.from_name("nano_test")


@pytest.fixture(scope="module")
def seg_params():
    return init_segmentor_params(NANO)


def test_backbone_feature_pyramid_shapes():
    x = jnp.zeros((1, 64, 96, 3))
    model = RepViTBackbone(NANO)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), x)
    feats = jax.jit(model.apply)(params, x)
    assert [f.shape for f in feats] == [
        (1, 16, 24, 8), (1, 8, 12, 16), (1, 4, 6, 24), (1, 2, 3, 32)]


def test_segmentor_logits_full_resolution(seg_params):
    x = jnp.zeros((2, 64, 64, 3))
    logits = jax.jit(RepViTSegmentor(NANO).apply)(seg_params, x)
    assert logits.shape == (2, 64, 64, 2)
    assert bool(jnp.all(jnp.isfinite(logits)))


def test_mask_to_bbox_matches_reference_tight_rule():
    # reference get_tight_bbox: min/max of mask-covered coords per axis
    # (its meshgrid "x" is the ROW axis; ours returns x=col, y=row)
    mask = np.zeros((40, 60), bool)
    mask[10:25, 7:31] = True
    mask[5, 50] = True  # stray pixel must extend the box (tight rule)
    assert car_mask_to_bbox(mask) == (7.0, 5.0, 50.0, 24.0)
    assert car_mask_to_bbox(np.zeros((4, 4), bool)) is None


def test_derive_car_bbox_scales_to_frame(seg_params, monkeypatch):
    # pin the mask so the rescale math is checked exactly
    import open_groundingdino_tpu.pave.repvit_seg as m

    def fake_mask(params, images, cfg):
        mk = np.zeros((1, 32, 64), bool)
        mk[0, 8:16, 16:48] = True
        return jnp.asarray(mk)

    monkeypatch.setattr(m, "segment_car_mask", fake_mask)
    frame = np.zeros((320, 1280, 3), np.uint8)
    bbox = m.derive_car_bbox(seg_params, frame, NANO, infer_size=(32, 64))
    # cols 16..47 of 64 -> x in [320, 940]; rows 8..15 of 32 -> y in [80, 150]
    assert bbox == (320.0, 80.0, 940.0, 150.0)


def test_segment_car_mask_jits_and_is_deterministic(seg_params):
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(1, 64, 64, 3).astype(np.float32))
    f = jax.jit(lambda p, im: segment_car_mask(p, im, NANO))
    m1, m2 = np.asarray(f(seg_params, x)), np.asarray(f(seg_params, x))
    assert m1.shape == (1, 64, 64) and m1.dtype == bool
    np.testing.assert_array_equal(m1, m2)


def test_inference_pave_cli_derives_bbox_from_segmentor(
        tmp_path, seg_params, monkeypatch, capsys):
    """tools/inference_pave.py --car_seg_checkpoint wiring: the car bbox is
    derived from the segmentor (detector stubbed — its own path is covered
    by tests/test_pave.py and the inference e2e tests)."""
    import sys
    import tools.inference_pave as tool

    # bias the classifier so every pixel is car -> full-frame bbox
    # (tree_map rebuilds the dict structure: the shared fixture stays intact)
    params = jax.tree_util.tree_map(lambda x: x, seg_params)
    params["params"]["head"]["cls"]["bias"] = (
        params["params"]["head"]["cls"]["bias"] + np.asarray([-5.0, 5.0]))
    ckpt = str(tmp_path / "seg.msgpack")
    save_segmentor_params(params, ckpt)

    from PIL import Image
    frame = str(tmp_path / "frame.jpg")
    Image.fromarray(np.zeros((96, 128, 3), np.uint8)).save(frame)

    seen = {}
    monkeypatch.setattr(tool, "load_model", lambda *a, **k: object())

    def fake_predict(model, img, prompt, **kw):
        seen["n"] = seen.get("n", 0) + 1
        return np.zeros((0, 4), np.float32), np.zeros((0,), np.float32), []

    monkeypatch.setattr(tool, "predict", fake_predict)
    out = str(tmp_path / "out")
    monkeypatch.setattr(sys, "argv", [
        "inference_pave.py", "-c", "cfg", "-p", "ckpt", "--vocab", "v",
        "-i", frame, "--car_seg_checkpoint", ckpt,
        "--car_seg_variant", "nano_test", "--car_seg_infer_size", "32,64",
        "-o", out])
    tool.main()
    assert "car bbox from segmentation" in capsys.readouterr().out
    assert seen["n"] >= 1  # crops were generated from the derived bbox
    import json as _json
    with open(f"{out}/pred.json") as f:
        assert _json.load(f)["n_crops"] >= 1


def test_params_save_load_roundtrip(tmp_path, seg_params):
    p = str(tmp_path / "seg.msgpack")
    save_segmentor_params(seg_params, p)
    restored = load_segmentor_params(p, NANO)
    leaves0 = jax.tree_util.tree_leaves(seg_params)
    leaves1 = jax.tree_util.tree_leaves(restored)
    assert len(leaves0) == len(leaves1)
    for a, b in zip(leaves0, leaves1):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
