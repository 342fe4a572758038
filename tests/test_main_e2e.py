"""End-to-end driver test: `main.py` trains debug steps + runs COCO eval on
synthetic data with a nano config — the full user path (config -> datasets
manifest -> loader -> jitted train step -> orbax checkpoint -> eval ->
stats).

Runs main.py as a SUBPROCESS: it is an honest CLI test, and running main()
in-process corrupts jax's executable cache for later tests on this stack
("Execution supplied N buffers but compiled program expected M").
"""
import json
import os
import subprocess
import sys

import numpy as np
import pytest
from PIL import Image

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_main(args):
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = (
        env.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
    ).strip()
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "main.py")] + args,
        capture_output=True, text=True, timeout=1200, cwd=REPO, env=env,
    )
    assert proc.returncode == 0, proc.stdout[-3000:] + proc.stderr[-3000:]

VOCAB = "[PAD] [UNK] [CLS] [SEP] [MASK] . ? dog cat bird".split()

TINY_CFG = """
_base_ = "{base}"
backbone = "swin_nano_test"
hidden_dim = 32
nheads = 4
enc_layers = 1
dec_layers = 2
dim_feedforward = 64
num_queries = 12
max_text_len = 24
bert_vocab_size = 16
bert_hidden_size = 32
bert_layers = 1
bert_heads = 4
bert_intermediate = 32
batch_size = 1
epochs = 1
max_gt_boxes = 8
image_buckets = [(64, 96), (96, 96), (128, 128)]
eval_shortest_edge = 64
eval_max_size = 96
data_aug_scales = [48, 64]
data_aug_max_size = 96
data_aug_scales2_resize = [48]
data_aug_scales2_crop = [32, 48]
num_select = 10
use_checkpoint = False
use_transformer_ckpt = False
"""


@pytest.fixture(scope="module")
def workspace(tmp_path_factory):
    d = tmp_path_factory.mktemp("e2e")
    (d / "images").mkdir()
    rng = np.random.RandomState(0)
    for i in range(8):
        arr = rng.randint(0, 255, (80, 110, 3), np.uint8)
        Image.fromarray(arr).save(d / "images" / f"img_{i}.jpg")
    coco = {
        "images": [
            {"id": i, "file_name": f"images/img_{i}.jpg", "width": 110, "height": 80}
            for i in range(8)
        ],
        "categories": [
            {"id": 1, "name": "dog"}, {"id": 2, "name": "cat"},
            {"id": 3, "name": "bird"},
        ],
        "annotations": [
            {"id": i + 1, "image_id": i, "category_id": (i % 3) + 1,
             "bbox": [10, 10, 50, 40], "area": 2000, "iscrowd": 0}
            for i in range(8)
        ],
    }
    (d / "coco.json").write_text(json.dumps(coco))
    manifest = {
        "train": [{"root": str(d), "anno": str(d / "coco.json"),
                   "dataset_mode": "coco"}],
        "val": [{"root": str(d), "anno": str(d / "coco.json"),
                 "dataset_mode": "coco"}],
    }
    (d / "datasets.json").write_text(json.dumps(manifest))
    (d / "vocab.txt").write_text("\n".join(VOCAB) + "\n")

    base = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "open_groundingdino_tpu", "config", "cfg_base.py",
    )
    (d / "cfg_tiny.py").write_text(TINY_CFG.format(base=base))
    return d


@pytest.mark.slow
def test_main_train_and_eval(workspace):
    d = workspace
    out_dir = str(d / "out")
    _run_main(
        [
            "-c", str(d / "cfg_tiny.py"),
            "--datasets", str(d / "datasets.json"),
            "--output_dir", out_dir,
            "--vocab", str(d / "vocab.txt"),
            "--debug",
        ]
    )

    # artifacts: config snapshot, per-epoch log with train + eval stats,
    # checkpoint directory
    assert os.path.exists(os.path.join(out_dir, "config_cfg.py"))
    with open(os.path.join(out_dir, "log.txt")) as f:
        rec = json.loads(f.readline())
    assert "loss" in rec and "AP" in rec
    assert np.isfinite(rec["loss"])
    ckpts = [n for n in os.listdir(out_dir) if n.startswith("checkpoint_")]
    assert ckpts, os.listdir(out_dir)

    # eval-only path
    _run_main(
        [
            "-c", str(d / "cfg_tiny.py"),
            "--datasets", str(d / "datasets.json"),
            "--output_dir", str(d / "out_eval"),
            "--vocab", str(d / "vocab.txt"),
            "--eval", "--debug",
        ]
    )
    with open(os.path.join(str(d / "out_eval"), "eval_stats.json")) as f:
        stats = json.load(f)
    assert "AP" in stats

    # auto-resume path (reference main.py:348-381 semantics): rerunning with
    # the same output_dir picks up the latest checkpoint and continues from
    # the next epoch — with epochs raised to 2, exactly one more epoch runs.
    _run_main(
        [
            "-c", str(d / "cfg_tiny.py"),
            "--datasets", str(d / "datasets.json"),
            "--output_dir", out_dir,
            "--vocab", str(d / "vocab.txt"),
            "--debug",
            "--options", "epochs=2",
        ]
    )
    with open(os.path.join(out_dir, "log.txt")) as f:
        recs = [json.loads(line) for line in f if line.strip()]
    assert len(recs) == 2, recs  # epoch 0 (first run) + epoch 1 (resumed)
    assert all(np.isfinite(r["loss"]) for r in recs)


@pytest.mark.slow
def test_main_train_odvg(workspace):
    """The reference's primary training mode — ODVG jsonl grounding data
    (reference main.py:214-224 + datasets/odvg.py) — driven through the
    real CLI: od.jsonl train split + coco val split, one debug epoch."""
    d = workspace
    label_map = {"0": "dog", "1": "cat", "2": "bird"}
    (d / "label_map.json").write_text(json.dumps(label_map))
    with open(d / "od.jsonl", "w") as f:
        for i in range(8):
            rec = {
                "filename": f"images/img_{i}.jpg",
                "detection": {
                    "instances": [
                        {"bbox": [10, 10, 60, 50], "label": i % 3},
                        {"bbox": [30, 20, 100, 70], "label": (i + 1) % 3},
                    ]
                },
            }
            f.write(json.dumps(rec) + "\n")
    manifest = {
        "train": [{"root": str(d), "anno": str(d / "od.jsonl"),
                   "label_map": str(d / "label_map.json"),
                   "dataset_mode": "odvg"}],
        "val": [{"root": str(d), "anno": str(d / "coco.json"),
                 "dataset_mode": "coco"}],
    }
    (d / "datasets_odvg.json").write_text(json.dumps(manifest))
    out_dir = str(d / "out_odvg")
    _run_main(
        [
            "-c", str(d / "cfg_tiny.py"),
            "--datasets", str(d / "datasets_odvg.json"),
            "--output_dir", out_dir,
            "--vocab", str(d / "vocab.txt"),
            "--debug",
            "--options", "max_labels=3",
        ]
    )
    with open(os.path.join(out_dir, "log.txt")) as f:
        rec = json.loads(f.readline())
    assert "loss" in rec and "AP" in rec
    assert np.isfinite(rec["loss"])
