"""Node-local dataset staging (reference datasets/data_util.py:117-169):
copy/unzip manifest paths to a local dir, idempotently, with cleanup."""
import json
import os
import zipfile

from open_groundingdino_tpu.data.staging import (
    cleanup_staged, stage_datasets,
)


def _make_src(tmp_path):
    src = tmp_path / "shared"
    (src / "imgs").mkdir(parents=True)
    (src / "imgs" / "a.jpg").write_bytes(b"\xff\xd8jpg")
    (src / "anno.json").write_text(json.dumps({"images": []}))
    (src / "label_map.json").write_text(json.dumps({"0": "dog"}))
    zpath = src / "imgs2.zip"
    with zipfile.ZipFile(zpath, "w") as zf:
        zf.writestr("b.jpg", b"\xff\xd8jpg2")
    return src


def test_stage_and_cleanup(tmp_path):
    src = _make_src(tmp_path)
    stage = str(tmp_path / "local")
    manifest = {
        "train": [{"root": str(src / "imgs"), "anno": str(src / "anno.json"),
                   "label_map": str(src / "label_map.json"),
                   "dataset_mode": "odvg"}],
        "val": [{"root": str(src / "imgs2.zip"),
                 "anno": str(src / "anno.json"), "dataset_mode": "coco"}],
    }
    staged, copylist = stage_datasets(manifest, stage)

    tr = staged["train"][0]
    assert tr["dataset_mode"] == "odvg"  # non-path keys preserved
    assert tr["root"].startswith(stage)
    assert os.path.exists(os.path.join(tr["root"], "a.jpg"))
    assert os.path.exists(tr["anno"]) and os.path.exists(tr["label_map"])
    # zip extracted; manifest points at the extraction dir
    va = staged["val"][0]
    assert os.path.isdir(va["root"])
    assert os.path.exists(os.path.join(va["root"], "b.jpg"))
    assert copylist

    # idempotent: second call copies nothing new (markers short-circuit)
    import open_groundingdino_tpu.data.staging as mod
    calls = []
    orig = mod.shutil.copy2
    mod.shutil.copy2 = lambda *a, **k: (calls.append(a), orig(*a, **k))
    try:
        staged2, copylist2 = stage_datasets(manifest, stage)
    finally:
        mod.shutil.copy2 = orig
    assert staged2 == staged
    assert not calls and not copylist2

    cleanup_staged(copylist)
    assert not os.path.exists(tr["root"])
    assert not os.path.exists(va["root"])


def test_stage_basename_collision(tmp_path):
    """Two different sources with the same basename must not overwrite
    each other (hash-disambiguated)."""
    a = tmp_path / "dsA"; a.mkdir()
    b = tmp_path / "dsB"; b.mkdir()
    (a / "anno.json").write_text("A")
    (b / "anno.json").write_text("B")
    stage = str(tmp_path / "local")
    manifest = {
        "train": [{"root": str(a), "anno": str(a / "anno.json")}],
        "val": [{"root": str(b), "anno": str(b / "anno.json")}],
    }
    staged, _ = stage_datasets(manifest, stage)
    pa = staged["train"][0]["anno"]
    pb = staged["val"][0]["anno"]
    assert pa != pb
    assert open(pa).read() == "A" and open(pb).read() == "B"
    ra = staged["train"][0]["root"]
    rb = staged["val"][0]["root"]
    assert ra != rb


def test_stage_dir_inside_source_root(tmp_path):
    """Staging a root that CONTAINS the stage dir must not recurse into
    itself (caught by the round-5 verify drive)."""
    src = tmp_path / "ws"
    (src / "images").mkdir(parents=True)
    (src / "images" / "a.jpg").write_bytes(b"x")
    (src / "anno.json").write_text("{}")
    stage = str(src / "staged")  # inside the root being staged
    manifest = {"val": [{"root": str(src), "anno": str(src / "anno.json")}]}
    staged, _ = stage_datasets(manifest, stage)
    root = staged["val"][0]["root"]
    assert os.path.exists(os.path.join(root, "images", "a.jpg"))
    assert not os.path.exists(os.path.join(root, "staged"))
