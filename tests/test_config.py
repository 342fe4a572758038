import os

from open_groundingdino_tpu.config import SLConfig
from open_groundingdino_tpu.config.slconfig import parse_override_value

CFG_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "open_groundingdino_tpu",
    "config",
)


def test_base_inheritance():
    cfg = SLConfig.fromfile(os.path.join(CFG_DIR, "cfg_coco.py"))
    assert cfg.hidden_dim == 256          # from base
    assert cfg.use_coco_eval is True      # child override
    assert cfg.num_queries == 900


def test_swinb_override():
    cfg = SLConfig.fromfile(os.path.join(CFG_DIR, "cfg_swinb.py"))
    assert cfg.backbone == "swin_B_384_22k"
    assert cfg.enc_layers == 6


def test_merge_from_dict(tmp_path):
    p = tmp_path / "c.py"
    p.write_text("a = 1\nnested = dict(x=2, y=3)\n")
    cfg = SLConfig.fromfile(str(p))
    cfg.merge_from_dict({"a": 5, "nested.x": 9})
    assert cfg.a == 5
    assert cfg.nested.x == 9 and cfg.nested.y == 3


def test_parse_override_value():
    assert parse_override_value("1e-4") == 1e-4
    assert parse_override_value("true") is True
    assert parse_override_value("[1,2]") == [1, 2]
    assert parse_override_value("swin_T") == "swin_T"


def test_attr_and_item_access():
    cfg = SLConfig({"k": {"v": 3}})
    assert cfg.k.v == 3
    assert cfg["k"]["v"] == 3
    cfg.new = 7
    assert cfg["new"] == 7
