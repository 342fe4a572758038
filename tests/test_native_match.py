"""Native C++ greedy COCO matcher vs the numpy implementation."""
import numpy as np
import pytest

from open_groundingdino_tpu.data.coco import CocoIndex
from open_groundingdino_tpu.eval.coco_eval import CocoBboxEvaluator
from open_groundingdino_tpu.utils.native import coco_greedy_match


def test_native_builds_and_matches_numpy_matcher():
    rng = np.random.RandomState(0)
    D, G, T = 20, 6, 10
    ious = rng.rand(D, G)
    gt_ignore = np.zeros(G, bool)
    gt_ignore[4:] = True  # sorted: non-ignored first
    iscrowd = np.zeros(G, bool)
    iscrowd[5] = True
    thrs = np.linspace(0.5, 0.95, T)

    out = coco_greedy_match(ious, gt_ignore, iscrowd, thrs)
    if out is None:
        pytest.skip("no native toolchain")
    dt_m, gt_m, dt_ig = out

    # numpy reference (same logic as the evaluator's fallback branch)
    col_ids = np.arange(G)
    for t, thr in enumerate(thrs):
        gt_used = np.full(G, -1, np.int64)
        thr_eff = min(thr, 1 - 1e-10)
        for d in range(D):
            avail = (gt_used < 0) | iscrowd
            cand = np.where(avail, ious[d], -1.0)
            real = np.where(~gt_ignore, cand, -1.0)
            best = -1
            if real.max() >= thr_eff:
                # ties resolve to the LAST max in the C++ (>= update);
                # reproduce that here
                best = int(np.where(real == real.max())[0][-1])
            else:
                ig = np.where(gt_ignore, cand, -1.0)
                if ig.max() >= thr_eff:
                    best = int(np.where(ig == ig.max())[0][-1])
            assert dt_m[t, d] == best, (t, d, best, dt_m[t, d])
            if best >= 0:
                gt_used[best] = d
                assert bool(dt_ig[t, d]) == bool(gt_ignore[best])


def test_evaluator_native_equals_python():
    anns = [
        (1, 1, (10, 10, 50, 60)), (1, 1, (200, 100, 40, 40)),
        (2, 1, (5, 5, 30, 30)), (2, 1, (100, 100, 80, 80)),
    ]
    ds = {
        "images": [{"id": i} for i in (1, 2)],
        "categories": [{"id": 1, "name": "c"}],
        "annotations": [
            {"id": k + 1, "image_id": a[0], "category_id": a[1],
             "bbox": list(a[2]), "area": a[2][2] * a[2][3], "iscrowd": 0}
            for k, a in enumerate(anns)
        ],
    }
    rng = np.random.RandomState(1)
    preds = {}
    for img in (1, 2):
        boxes = rng.uniform(0, 300, (15, 2))
        wh = rng.uniform(20, 120, (15, 2))
        preds[img] = {
            "scores": rng.rand(15),
            "labels": np.ones(15, np.int64),
            "boxes": np.concatenate([boxes, boxes + wh], axis=1),
        }

    stats = []
    for use_native in (True, False):
        ev = CocoBboxEvaluator(CocoIndex(dataset=ds), use_native=use_native)
        ev.update({k: dict(v) for k, v in preds.items()})
        ev.accumulate()
        stats.append(ev.summarize())
    for k in stats[0]:
        assert abs(stats[0][k] - stats[1][k]) < 1e-9, k
