"""Serving export roundtrip: InferenceModel -> jax.export StableHLO
artifact -> load_exported -> numerically identical forward, and the shared
host-side predict() path working on the deserialized model (no flax/model
code involved at serving time)."""
import os
import sys

import jax.numpy as jnp
import numpy as np
import pytest
from PIL import Image

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from open_groundingdino_tpu.inference import load_model, predict
from open_groundingdino_tpu.serving import (
    export_model,
    load_exported,
    _flatten_params,
    _unflatten_params,
)
from tests.test_inference_e2e import workspace  # noqa: F401  (fixture)


def test_flatten_roundtrip():
    params = {"a": {"b": np.ones((2, 3)), "c": np.arange(4)}, "d": np.zeros(1)}
    flat = _flatten_params(params)
    assert set(flat) == {"a/b", "a/c", "d"}
    back = _unflatten_params(flat)
    np.testing.assert_array_equal(back["a"]["b"], params["a"]["b"])
    np.testing.assert_array_equal(back["a"]["c"], params["a"]["c"])


@pytest.fixture(scope="module")
def artifact(workspace, tmp_path_factory):  # noqa: F811
    d = workspace
    im = load_model(
        str(d / "cfg_nano.py"), str(d / "ckpt.pth"), str(d / "vocab.txt")
    )
    out = tmp_path_factory.mktemp("artifact")
    written = export_model(
        im, str(out), buckets=[(64, 96)], batch=1,
        vocab_path=str(d / "vocab.txt"),
    )
    assert {"meta.json", "params.npz", "fwd_64x96.jaxexp", "vocab.txt"} == set(
        written
    )
    return im, str(out)


def test_export_roundtrip_numerics(artifact):
    im, out_dir = artifact
    sm = load_exported(out_dir)

    T = im.max_text_len
    rng = np.random.RandomState(3)
    ids = rng.randint(5, 10, (1, T)).astype(np.int32)
    ids[0, 0], ids[0, 5] = 2, 3  # CLS/SEP positions in the tiny vocab
    inputs = (
        jnp.asarray(rng.randn(1, 64, 96, 3).astype(np.float32)),
        jnp.asarray([[60, 90]], jnp.int32),
        jnp.asarray(ids),
        jnp.ones((1, T), bool),
        jnp.tile(jnp.arange(T, dtype=jnp.int32)[None], (1, 1)),
        jnp.ones((1, T, T), bool),
    )
    ref = im.forward_fn()(im.params, *inputs)
    got = sm.forward_fn()(sm.params, *inputs)
    np.testing.assert_allclose(
        np.asarray(got["pred_boxes"]), np.asarray(ref["pred_boxes"]),
        rtol=1e-5, atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(got["pred_logits"]), np.asarray(ref["pred_logits"]),
        rtol=1e-4, atol=1e-4,
    )


def test_exported_predict_and_bucket_guard(artifact):
    _, out_dir = artifact
    sm = load_exported(out_dir)
    rng = np.random.RandomState(4)
    image = Image.fromarray(rng.randint(0, 255, (120, 160, 3), np.uint8))
    boxes, scores, phrases = predict(
        sm, image, "dog . cat .", box_threshold=0.0, text_threshold=0.05,
        size=64, max_size=96,
    )
    assert len(boxes) == len(scores) == len(phrases) and len(boxes) > 0
    assert (boxes >= 0).all() and (boxes <= 1).all()

    # a shape with no exported bucket must fail loudly, naming the buckets
    T = sm.max_text_len
    with pytest.raises(ValueError, match="64, 96"):
        sm.forward_fn()(
            sm.params,
            jnp.zeros((1, 96, 96, 3), jnp.float32),
            jnp.asarray([[96, 96]], jnp.int32),
            jnp.zeros((1, T), jnp.int32),
            jnp.ones((1, T), bool),
            jnp.zeros((1, T), jnp.int32),
            jnp.ones((1, T, T), bool),
        )
