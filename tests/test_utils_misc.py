"""Coverage for the small utility modules: ema/best-metric, time counter,
slio, visualizer, vl_utils, inverse_sigmoid, clean_state_dict."""
import numpy as np
import jax.numpy as jnp
from PIL import Image

from open_groundingdino_tpu.data.tokenization import BertWordPieceTokenizer
from open_groundingdino_tpu.data.vl_utils import (
    build_captions_and_token_span,
    create_positive_map_from_span,
)
from open_groundingdino_tpu.utils.ema import BestMetricHolder, ema_update
from open_groundingdino_tpu.utils.misc import clean_state_dict, inverse_sigmoid
from open_groundingdino_tpu.utils.slio import sldump, slload
from open_groundingdino_tpu.utils.time_counter import TimeHolder
from open_groundingdino_tpu.utils.visualizer import draw_boxes, draw_cxcywh_norm

VOCAB = "[PAD] [UNK] [CLS] [SEP] [MASK] . ? dog cat".split()


def test_best_metric_holder():
    b = BestMetricHolder()
    assert b.update(0.3, 0)
    assert not b.update(0.2, 1)
    assert b.update(0.5, 2)
    assert b.summary()["best_all"] == 0.5


def test_ema_update():
    ema = {"w": jnp.zeros((3,))}
    new = {"w": jnp.ones((3,))}
    out = ema_update(ema, new, decay=0.9)
    np.testing.assert_allclose(np.asarray(out["w"]), 0.1, atol=1e-6)


def test_time_holder():
    th = TimeHolder()
    with th.section("a"):
        pass
    with th.section("a"):
        pass
    assert th.summary()["a"] >= 0
    assert th.meters["a"].count == 2


def test_slio_roundtrip(tmp_path):
    obj = {"x": [1, 2], "y": "z"}
    for ext in (".json", ".yaml", ".pkl"):
        p = str(tmp_path / f"f{ext}")
        sldump(obj, p)
        assert slload(p) == obj


def test_inverse_sigmoid_clamps():
    x = jnp.asarray([0.0, 0.5, 1.0])
    out = np.asarray(inverse_sigmoid(x))
    assert np.isfinite(out).all()
    np.testing.assert_allclose(out[1], 0.0, atol=1e-6)
    assert out[0] < -6 and out[2] > 6


def test_clean_state_dict():
    sd = {"module.a.b": 1, "c": 2}
    assert clean_state_dict(sd) == {"a.b": 1, "c": 2}


def test_visualizer_draws():
    img = Image.new("RGB", (64, 48))
    out = draw_boxes(img, np.asarray([[4, 4, 30, 30]]), ["dog"], np.asarray([0.9]))
    assert np.asarray(out).sum() > 0  # something was drawn
    out2 = draw_cxcywh_norm(img, np.asarray([[0.5, 0.5, 0.4, 0.4]]))
    assert np.asarray(out2).sum() > 0


def test_vl_utils_span_map(tmp_path):
    p = tmp_path / "vocab.txt"
    p.write_text("\n".join(VOCAB) + "\n")
    tok = BertWordPieceTokenizer(str(p))
    caption, spans = build_captions_and_token_span(["dog", "cat"])
    assert caption == "dog . cat ."
    t = tok([caption], padding=16)
    pm = create_positive_map_from_span(
        t, [spans["dog"], spans["cat"]], max_text_len=16
    )
    assert pm.shape == (2, 16)
    np.testing.assert_allclose(pm.sum(-1), 1.0)   # normalized rows
    assert pm[0, 1] > 0   # 'dog' token
    assert pm[1, 3] > 0   # 'cat' token
