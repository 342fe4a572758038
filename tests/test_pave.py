"""PAVE crop pipeline + metrics tests."""
import json
import os
import numpy as np

from open_groundingdino_tpu.pave import crop_utils
from open_groundingdino_tpu.pave.engine import (
    crops_to_samples,
    evaluate_frames,
    merge_crop_predictions,
)
from open_groundingdino_tpu.pave.metrics import (
    count_tp_fp_fn,
    per_image_records,
    summarize,
    threshold_sweep,
)


def test_crop_boxes_cover_car_bbox():
    boxes = crop_utils.create_crop_boxes((1080, 1920), (500, 300, 1400, 900))
    assert len(boxes) > 1
    for (x0, y0), (x1, y1) in boxes:
        assert x1 - x0 == 512 and y1 - y0 == 512
        assert 0 <= x0 and x1 <= 1920 and 0 <= y0 and y1 <= 1080


def test_box_translate_roundtrip():
    cb = ((100, 200), (612, 712))
    box = (150.0, 260.0, 300.0, 400.0)
    local = crop_utils.translate_box_to_crop(box, cb)
    back = crop_utils.translate_box_to_image(local, cb)
    assert back == box
    assert crop_utils.is_inside(box, cb)
    assert not crop_utils.is_inside((0, 0, 50, 50), cb)


def test_crops_with_boxes_filters_and_translates():
    img = np.zeros((1080, 1920, 3), np.uint8)
    gt = np.asarray([[600, 500, 700, 560]], np.float32)
    crops = crop_utils.crops_with_boxes(
        img, (400, 300, 1500, 900), gt, np.asarray([0])
    )
    assert len(crops) >= 1
    for c in crops:
        assert c["image"].shape == (512, 512, 3)
        for b in c["boxes"]:
            assert (b >= 0).all()
            assert b[2] <= 512 and b[3] <= 512


def test_crops_to_samples_and_merge():
    img = np.zeros((1080, 1920, 3), np.uint8)
    gt = np.asarray([[600, 500, 700, 560]], np.float32)
    samples, crop_boxes = crops_to_samples(
        img, (400, 300, 1500, 900), gt, np.asarray([0]), "dent .", ["dent"]
    )
    assert len(samples) == len(crop_boxes)
    # simulate a perfect detection in the first crop
    local = crop_utils.translate_box_to_crop((600, 500, 700, 560), crop_boxes[0])
    results = [{"scores": np.asarray([0.9]), "boxes": np.asarray([local])}]
    results += [
        {"scores": np.zeros((0,)), "boxes": np.zeros((0, 4))}
        for _ in crop_boxes[1:]
    ]
    merged = merge_crop_predictions(results, crop_boxes)
    np.testing.assert_allclose(
        merged["boxes"][0], [600, 500, 700, 560], atol=1e-5
    )


def test_metrics_tp_fp_fn():
    pred = np.asarray([[0, 0, 100, 100], [1000, 1000, 1100, 1100]], np.float32)
    gt = np.asarray([[10, 10, 110, 110]], np.float32)
    per_pred, per_gt = per_image_records(pred, gt)
    tp, fp, fn = count_tp_fp_fn(per_pred, per_gt, iou_thresh=0.5, dist_thresh=50)
    assert (tp, fp, fn) == (1, 1, 0)
    # strict thresholds: nothing matches
    tp, fp, fn = count_tp_fp_fn(per_pred, per_gt, iou_thresh=0.95, dist_thresh=1)
    assert (tp, fp, fn) == (0, 2, 1)


def test_summarize_and_sweep():
    pred = np.asarray([[0, 0, 100, 100]], np.float32)
    gt = np.asarray([[0, 0, 100, 100]], np.float32)
    rec = [per_image_records(pred, gt)]
    s = summarize(rec, 0.5, 400)
    assert s["precision"] == 1.0 and s["recall"] == 1.0
    sweep = threshold_sweep(rec, (0.5,), (100,))
    assert sweep[0]["precision"] == 1.0

    e = evaluate_frames([pred], [gt])
    assert e["recall"] == 1.0


def test_get_metrics_cli(tmp_path):
    """tools/get_metrics.py end to end on a batch-eval-schema CSV
    (reference get_metrics.py table output)."""
    import csv
    import json
    import subprocess
    import sys

    rows = [
        {"image": "a.jpg",
         "metrics_per_pred": json.dumps({0: (0.8, 0, 12.0, 0),
                                         1: (0.2, 0, 600.0, 0)}),
         "metrics_per_gt": json.dumps({0: (0.8, 0, 12.0, 0)})},
        {"image": "b.jpg",
         "metrics_per_pred": json.dumps({}),
         "metrics_per_gt": json.dumps({0: (0.0, -1, 1e9, -1)})},
    ]
    path = tmp_path / "results.csv"
    with open(path, "w", newline="") as f:
        w = csv.DictWriter(
            f, fieldnames=["image", "metrics_per_pred", "metrics_per_gt"]
        )
        w.writeheader()
        w.writerows(rows)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    p = subprocess.run(
        [sys.executable, os.path.join(repo, "tools", "get_metrics.py"), str(path)],
        capture_output=True, text=True, cwd=repo,
    )
    assert p.returncode == 0, p.stderr
    # frame-averaged over {P=0.5 frame a, P=0 frame b} at the default thresholds
    assert "precision: 0.2500" in p.stdout
    assert "recall: 0.5000" in p.stdout
    assert "threshold sweep:" in p.stdout


def test_crop_cap_at_max_crops():
    """>max_crops candidate crops are randomly sampled down to the cap
    (reference engine_multi.py random.sample(crops, 64))."""
    # 4K-ish photo: a 1080p frame tops out at 32 windows, the >64 cap path
    # only triggers on high-res source imagery
    img = np.zeros((2160, 3840, 3), np.uint8)
    car = (0, 0, 3840, 2160)
    # full-car bbox + keep_empty => every sliding window is a candidate
    crops_all = crop_utils.crops_with_boxes(
        img, car, np.zeros((0, 4), np.float32),
        np.zeros((0,), np.int64), keep_empty=True, max_crops=10_000,
    )
    assert len(crops_all) > 64
    crops = crop_utils.crops_with_boxes(
        img, car, np.zeros((0, 4), np.float32),
        np.zeros((0,), np.int64), keep_empty=True, max_crops=64,
        rng=np.random.RandomState(7),
    )
    assert len(crops) == 64
    # deterministic under a fixed rng
    crops2 = crop_utils.crops_with_boxes(
        img, car, np.zeros((0, 4), np.float32),
        np.zeros((0,), np.int64), keep_empty=True, max_crops=64,
        rng=np.random.RandomState(7),
    )
    assert [c["crop_box"] for c in crops] == [c["crop_box"] for c in crops2]


def test_empty_crop_drop_vs_keep():
    img = np.zeros((1080, 1920, 3), np.uint8)
    gt = np.asarray([[600, 500, 700, 560]], np.float32)
    car = (400, 300, 1500, 900)
    kept = crop_utils.crops_with_boxes(
        img, car, gt, np.asarray([0]), keep_empty=True, max_crops=10_000
    )
    dropped = crop_utils.crops_with_boxes(
        img, car, gt, np.asarray([0]), keep_empty=False, max_crops=10_000
    )
    assert len(dropped) < len(kept)
    assert all(len(c["boxes"]) > 0 for c in dropped)


def test_boundary_box_contained_in_overlapping_crop():
    """A GT spanning one crop's boundary must still be fully inside some
    other (stride-overlapped) crop and be translated correctly there."""
    img = np.zeros((1080, 1920, 3), np.uint8)
    car = (100, 100, 1800, 1000)
    # box deliberately straddles x=712 (the first crop's right edge region)
    gt = np.asarray([[650, 400, 800, 470]], np.float32)
    crops = crop_utils.crops_with_boxes(
        img, car, gt, np.asarray([0]), keep_empty=False, max_crops=10_000
    )
    assert crops, "no crop fully contains the boundary box"
    for c in crops:
        (cx0, cy0), (cx1, cy1) = c["crop_box"]
        # containment in frame coords
        assert cx0 <= 650 and 800 <= cx1 and cy0 <= 400 and 470 <= cy1
        np.testing.assert_allclose(
            c["boxes"][0],
            [650 - cx0, 400 - cy0, 800 - cx0, 470 - cy0],
        )


def test_merge_nms_dedups_across_overlapping_crops():
    """The same physical detection reported by two overlapping crops must
    collapse to one frame-level box after NMS (reference
    test_inference_new.py full-frame torchvision.nms merge)."""
    cb_a = ((100, 100), (612, 612))
    cb_b = ((356, 100), (868, 612))
    frame_box = (400.0, 300.0, 500.0, 380.0)  # inside both crops
    res_a = {
        "scores": np.asarray([0.9]),
        "boxes": np.asarray(
            [crop_utils.translate_box_to_crop(frame_box, cb_a)], np.float32
        ),
    }
    # crop B sees it 2px shifted at lower confidence
    shifted = (frame_box[0] + 2, frame_box[1], frame_box[2] + 2, frame_box[3])
    res_b = {
        "scores": np.asarray([0.7]),
        "boxes": np.asarray(
            [crop_utils.translate_box_to_crop(shifted, cb_b)], np.float32
        ),
    }
    merged = merge_crop_predictions([res_a, res_b], [cb_a, cb_b], nms_iou=0.5)
    assert merged["boxes"].shape == (1, 4)
    np.testing.assert_allclose(merged["boxes"][0], frame_box, atol=1e-5)
    np.testing.assert_allclose(merged["scores"][0], 0.9)


def test_full_frame_pipeline_perfect_predictions():
    """1920x1080 frame, several damages, crops -> simulated perfect per-crop
    detections -> merge -> frame metrics must be P=R=1."""
    rng = np.random.RandomState(3)
    img = np.zeros((1080, 1920, 3), np.uint8)
    car = (200, 150, 1700, 950)
    gt = np.stack(
        [
            np.stack([x, y, x + w, y + h])
            for x, y, w, h in zip(
                rng.uniform(300, 1500, 6), rng.uniform(250, 800, 6),
                rng.uniform(30, 120, 6), rng.uniform(30, 100, 6),
            )
        ]
    ).astype(np.float32)
    samples, crop_boxes = crops_to_samples(
        img, car, gt, np.zeros(len(gt), np.int64), "damage .", ["damage"]
    )
    assert samples and len(samples) == len(crop_boxes)
    assert all(s.image.size == (512, 512) for s in samples)
    # simulate: each crop perfectly detects the GT it contains
    results = []
    for s, cb in zip(samples, crop_boxes):
        results.append(
            {"scores": np.full(len(s.boxes), 0.9), "boxes": s.boxes}
        )
    merged = merge_crop_predictions(results, crop_boxes)
    stats = evaluate_frames([merged["boxes"]], [gt])
    assert stats["precision"] == 1.0 and stats["recall"] == 1.0


def test_dmg_dataset(tmp_path):
    """pave/dmg_dataset.DmgDataset: CSV manifest -> frames with
    keypoint-derived GT boxes (reference dmg_dataset.py +
    test_inference_new.py:494-517)."""
    import csv
    import json as _json
    from PIL import Image as PILImage

    from open_groundingdino_tpu.pave.dmg_dataset import (
        DmgDataset, damage_name_to_category, get_coco_bbox,
    )

    assert get_coco_bbox([0.5, 0.5], 100, 200, "small") == [84.0, 34.0, 116.0, 66.0]
    assert damage_name_to_category("MAJOR_DENT") == ("dent", "large")
    assert damage_name_to_category("MINOR_SCRATCH") == ("scratch", "small")
    assert damage_name_to_category("weird") == ("others", "small")

    img = np.zeros((120, 160, 3), np.uint8)
    PILImage.fromarray(img).save(tmp_path / "frame0.jpg")
    rows = [
        {"file_name": "frame0.jpg", "dmg_count": "2",
         "dmg_kpts": _json.dumps([[0.25, 0.5], [0.75, 0.5]]),
         # reference ordering [ymin, ymax, xmin, xmax]
         "car_bbox": _json.dumps([10, 110, 20, 150]),
         "dmg_names": _json.dumps(["MINOR_DENT", "MEDIUM_SCRATCH"])},
        {"file_name": "frame0.jpg", "dmg_count": "0",
         "dmg_kpts": "[]", "car_bbox": "[0,0,0,0]", "dmg_names": "[]"},
    ]
    path = tmp_path / "manifest.csv"
    with open(path, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=list(rows[0].keys()))
        w.writeheader()
        w.writerows(rows)

    ds = DmgDataset(str(path))
    assert len(ds) == 1  # dmg_count == 0 dropped
    item = ds[0]
    assert item["image"].shape == (120, 160, 3)
    np.testing.assert_allclose(item["car_bbox"], [20, 10, 150, 110])
    assert item["gt_boxes"].shape == (2, 4)
    # first kpt (0.25, 0.5) on 160x120 -> center (40, 60), small half 16
    np.testing.assert_allclose(item["gt_boxes"][0], [24, 44, 56, 76])
    assert item["gt_label_names"] == ["dent", "scratch"]


def test_inference_from_csv_and_reliable_data_cli(tmp_path):
    """tools/get_reliable_data.py agreement filter end to end; the
    inference CSV schema matches tools/inference_from_csv.py output."""
    import csv
    import json as _json
    import subprocess
    import sys as _sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    rows = [
        {"input": "a.jpg", "dino_bbox": _json.dumps([10, 10, 110, 110]),
         "swints_bbox": _json.dumps([12, 11, 112, 108])},     # agree
        {"input": "b.jpg", "dino_bbox": _json.dumps([10, 10, 110, 110]),
         "swints_bbox": _json.dumps([300, 300, 400, 400])},   # disagree
        {"input": "c.jpg", "dino_bbox": "garbage",
         "swints_bbox": _json.dumps([0, 0, 1, 1])},           # malformed
    ]
    path = tmp_path / "merged.csv"
    with open(path, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=list(rows[0].keys()))
        w.writeheader()
        w.writerows(rows)
    out = tmp_path / "reliable.csv"
    p = subprocess.run(
        [_sys.executable, os.path.join(repo, "tools", "get_reliable_data.py"),
         "--csv", str(path), "-o", str(out)],
        capture_output=True, text=True, cwd=repo,
    )
    assert p.returncode == 0, p.stderr
    with open(out) as f:
        kept = list(csv.DictReader(f))
    assert len(kept) == 1 and kept[0]["input"] == "a.jpg"
    assert float(kept[0]["tl_loss"]) <= 20


def test_plot_utils(tmp_path):
    """utils/plot_utils.plot_logs renders our JSON-lines log.txt
    (reference util/plot_utils.py:13-80)."""
    from open_groundingdino_tpu.utils.plot_utils import (
        plot_logs, plot_precision_recall,
    )

    d = tmp_path / "run1"
    d.mkdir()
    with open(d / "log.txt", "w") as f:
        for e in range(3):
            f.write(json.dumps({"epoch": e, "loss": 10.0 - e,
                                "loss_bbox": 1.0 / (e + 1), "AP": 0.1 * e})
                    + "\n")
    fig, axs = plot_logs([str(d)], fields=("loss", "AP"), ewm_com=1.0)
    assert len(axs) == 2
    fig2, ax = plot_precision_recall(
        [("run1", [0.0, 0.5, 1.0], [1.0, 0.8, 0.3])]
    )
    assert ax is not None
