"""Worker script for tests/test_two_process_distributed.py.

Runs as one of two real OS processes, each with 4 virtual CPU devices:
jax.distributed.initialize over a localhost coordinator, per-process slice of
synthetic predictions into CocoBboxEvaluator, cross-host merge via
engine._merge_eval_across_hosts (multihost_utils.process_allgather), then
process 0 writes the accumulated stats JSON.  This exercises the transport
the reference exercises with NCCL all_gather of pickled eval arrays
(reference util/misc.py:96-137, datasets/cocogrounding_eval.py:181-210).

Not a pytest file — invoked by the test as `python two_process_eval_worker.py
<coordinator> <process_id> <num_processes> <workdir>`.
"""
import json
import os
import sys

import numpy as np

N_IMGS = 8


def make_index():
    """Deterministic synthetic COCO GT: 8 images, 2 categories."""
    from open_groundingdino_tpu.data.coco import CocoIndex

    rng = np.random.RandomState(7)
    anns = []
    for i in range(N_IMGS):
        for k in range(3):
            x, y = rng.randint(0, 400, 2)
            w, h = rng.randint(20, 120, 2)
            anns.append(
                {"id": len(anns) + 1, "image_id": i, "category_id": 1 + (k % 2),
                 "bbox": [float(x), float(y), float(w), float(h)],
                 "area": float(w * h), "iscrowd": 0}
            )
    ds = {
        "images": [{"id": i, "width": 640, "height": 480} for i in range(N_IMGS)],
        "categories": [{"id": 1, "name": "a"}, {"id": 2, "name": "b"}],
        "annotations": anns,
    }
    return CocoIndex(dataset=ds)


def make_predictions():
    """Noisy detections around the GT plus false positives."""
    index = make_index()
    rng = np.random.RandomState(11)
    preds = {}
    for i in range(N_IMGS):
        boxes, scores, labels = [], [], []
        for a in index.load_anns_for_img(i):
            x, y, w, h = a["bbox"]
            jx, jy = rng.uniform(-8, 8, 2)
            boxes.append([x + jx, y + jy, x + w + jx, y + h + jy])
            scores.append(float(rng.uniform(0.5, 1.0)))
            labels.append(a["category_id"])
        boxes.append([0.0, 0.0, 30.0, 30.0])  # FP
        scores.append(float(rng.uniform(0.1, 0.4)))
        labels.append(1)
        preds[i] = {
            "scores": np.asarray(scores),
            "labels": np.asarray(labels),
            "boxes": np.asarray(boxes, np.float64),
        }
    return preds


def main():
    coordinator, pid, nproc, workdir = (
        sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), sys.argv[4]
    )
    os.environ.pop("PALLAS_AXON_POOL_IPS", None)
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=4"
    ).strip()

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=coordinator, num_processes=nproc, process_id=pid
    )
    assert jax.process_count() == nproc
    assert jax.device_count() == 4 * nproc, jax.devices()

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from open_groundingdino_tpu.engine import _merge_eval_across_hosts
    from open_groundingdino_tpu.eval.coco_eval import CocoBboxEvaluator

    index = make_index()
    evaluator = CocoBboxEvaluator(index, use_native=False)
    preds = make_predictions()
    # deterministic per-process slice (the DistributedSampler analog)
    img_ids = sorted(preds)
    mine = {i: preds[i] for k, i in enumerate(img_ids) if k % nproc == pid}
    evaluator.update(mine)

    _merge_eval_across_hosts(evaluator)
    evaluator.accumulate()
    stats = evaluator.summarize()
    if pid == 0:
        with open(os.path.join(workdir, "dist_stats.json"), "w") as f:
            json.dump(stats, f)
    jax.distributed.shutdown()


if __name__ == "__main__":
    main()
