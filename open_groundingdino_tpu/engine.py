"""Train / eval loops (reference engine_multi.py:353-949, minus the PAVE
crop pipeline which lives in pave/).

train_one_epoch: one jitted step per batch (forward + on-device matching +
losses + grads + AdamW, see parallel/train_state.py); metrics come back as
device scalars fetched once per log interval.  NaN/Inf loss aborts like the
reference's isfinite guard (engine_multi.py:544-547).

evaluate: jitted forward + PostProcess -> CocoBboxEvaluator (multi-host
merge via process_allgather of per-image records happens in the evaluator's
caller when process_count > 1).
"""
from __future__ import annotations

import math
import sys
from typing import Dict, Optional

import jax
import numpy as np

from .eval.coco_eval import CocoBboxEvaluator
from .models.postprocess import PostProcess
from .parallel.mesh import shard_batch, shard_stacked_batch
from .utils.logger import MetricLogger


def _shape_key(batch) -> tuple:
    return tuple(sorted((k, np.shape(v)) for k, v in batch.items()))


def _chunk_same_shape(loader, n: int):
    """Group consecutive loader batches into lists of up to n with identical
    shapes (static buckets make long runs of equal shapes the common case);
    a bucket switch flushes the current partial chunk."""
    chunk, key = [], None
    for batch in loader:
        k = _shape_key(batch)
        if chunk and (k != key or len(chunk) == n):
            yield chunk
            chunk = []
        chunk.append(batch)
        key = k
    if chunk:
        yield chunk


def train_one_epoch(
    train_step,
    state,
    loader,
    mesh,
    epoch: int,
    logger=None,
    print_freq: int = 50,
    max_steps: Optional[int] = None,
    multi_step=None,
    steps_per_call: int = 1,
):
    """One epoch.  With steps_per_call > 1 (and `multi_step` = the jitted
    make_multi_train_step(..., steps_per_call)), full chunks of same-shape
    batches are stacked and dispatched as ONE device call — measured -10%
    wall/step on the axon tunnel (BENCH_NOTES 2026-08-19); partial chunks
    (epoch tail, bucket switches) fall back to the per-batch step."""
    metric_logger = MetricLogger(logger=logger)
    header = f"Epoch [{epoch}]"
    # nonfinite_count is cumulative across the training run (it rides the
    # checkpoint); abort on growth since epoch start, not on absolute value,
    # so resuming a checkpoint that once skipped a bad batch stays runnable
    base_nonfinite = int(jax.device_get(state.nonfinite_count))
    use_multi = multi_step is not None and steps_per_call > 1

    def _check_and_log(metrics, idx=None):
        pick = (lambda v: v if idx is None else v[idx])
        host = {
            k: float(pick(v)) for k, v in metrics.items()
            if np.ndim(pick(v)) == 0
        }
        loss = host.get("loss", 0.0)
        # the train step itself skips updates on non-finite loss/grads
        # (train_state.py), so params are clean; the host aborts as soon
        # as the counter is observed non-zero — within print_freq steps,
        # with zero per-step device syncs
        if (
            not math.isfinite(loss)
            or host.get("nonfinite_count", 0) > base_nonfinite
        ):
            (logger.error if logger else print)(
                f"Loss is {loss} "
                f"(nonfinite steps: {host.get('nonfinite_count', 0)}), "
                f"stopping training: {host}"
            )
            sys.exit(1)
        metric_logger.update(**{
            k: v for k, v in host.items()
            if k in ("loss", "loss_ce", "loss_bbox", "loss_giou", "grad_norm")
        })

    if not use_multi:
        for i, batch in enumerate(
            metric_logger.log_every(loader, print_freq, header)
        ):
            sharded = shard_batch(batch, mesh)
            state, metrics = train_step(state, sharded)
            if i % print_freq == 0:
                _check_and_log(metrics)
            if max_steps is not None and i + 1 >= max_steps:
                break
        stats = {k: m.global_avg for k, m in metric_logger.meters.items()}
        return state, stats

    i = 0  # optimizer-step counter (log cadence/max_steps stay per STEP)
    for chunk in metric_logger.log_every(
        _chunk_same_shape(loader, steps_per_call), print_freq, header
    ):
        if len(chunk) == steps_per_call and not (
            max_steps is not None and i + len(chunk) > max_steps
        ):
            stacked = {
                k: np.stack([b[k] for b in chunk]) for k in chunk[0]
                if k not in ("image_ids", "orig_sizes", "label_maps", "n_real")
            }
            sharded = shard_stacked_batch(stacked, mesh)
            state, metrics = multi_step(state, sharded)
            for j in range(len(chunk)):
                if (i + j) % print_freq == 0:
                    _check_and_log(metrics, idx=j)
            i += len(chunk)
        else:
            for b in chunk:
                sharded = shard_batch(b, mesh)
                state, metrics = train_step(state, sharded)
                if i % print_freq == 0:
                    _check_and_log(metrics)
                i += 1
                if max_steps is not None and i >= max_steps:
                    break
        if max_steps is not None and i >= max_steps:
            break
    stats = {k: m.global_avg for k, m in metric_logger.meters.items()}
    return state, stats


def _pack_eval_records(evaluator) -> np.ndarray:
    """Evaluator records -> one uint8 pickle buffer (numpy-only payload)."""
    import pickle

    payload = pickle.dumps((evaluator.img_ids, evaluator.eval_imgs))
    return np.frombuffer(payload, np.uint8)


def _merge_packed_records(
    evaluator, gathered: np.ndarray, sizes, own_index: int
) -> None:
    """Merge other hosts' packed records into this evaluator.
    gathered: (P, maxlen) uint8, row p valid up to sizes[p]."""
    import pickle

    for p in range(gathered.shape[0]):
        if p == own_index:
            continue
        img_ids, eval_imgs = pickle.loads(
            gathered[p, : int(sizes[p])].tobytes()
        )
        evaluator.img_ids.extend(img_ids)
        evaluator.eval_imgs.update(eval_imgs)


def _merge_eval_across_hosts(evaluator) -> None:
    """All-gather per-image match records so every host can accumulate the
    full-dataset metrics — the single-controller analog of the reference's
    pickled all_gather merge (util/misc.py:96-137, cocogrounding_eval.py:66-69).

    Records are numpy-only dicts; they are serialized to one uint8 buffer per
    host, padded to the global max, and exchanged with
    multihost_utils.process_allgather (host callbacks are unavailable on this
    runtime, but allgather of host arrays is supported).
    """
    from jax.experimental import multihost_utils

    local = _pack_eval_records(evaluator)
    n = np.asarray([len(local)], np.int64)
    sizes = multihost_utils.process_allgather(n).reshape(-1)
    maxlen = int(sizes.max())
    padded = np.zeros((maxlen,), np.uint8)
    padded[: len(local)] = local
    gathered = multihost_utils.process_allgather(padded)  # (P, maxlen)
    _merge_packed_records(evaluator, gathered, sizes, jax.process_index())


def evaluate_coco(
    eval_step,
    params,
    loader,
    mesh,
    postprocessor: PostProcess,
    coco_index,
    contiguous_to_catid: Dict[int, int],
    logger=None,
    print_freq: int = 50,
    max_steps: Optional[int] = None,
    precast_dtype=None,
):
    """Zero-shot / fine-tuned COCO eval: forward -> token->class projection ->
    top-k -> numpy COCO mAP.

    SOFTWARE-PIPELINED (1 deep): batch i+1's forward + device postprocess
    are dispatched (async jax) BEFORE batch i's host half (device->host
    fetch, NMS, evaluator.update) runs, so host work overlaps device
    execution — the reference's eval loop serializes these
    (engine_multi.py:596-949; its per-batch .cpu() blocks the GPU queue)."""
    # EVAL_PRECAST (default ON, measured 2026-08-20): cast the f32 master
    # params to the eval compute dtype ONCE on device instead of inside
    # every dispatch (make_eval_step's cast_floating re-converts all
    # ~172M params per batch; the in-step cast becomes a no-op on
    # already-bf16 leaves).  Device-resident eval pipeline A/B: 3.89 ->
    # 7.64 img/s (+96%) — the per-dispatch cast was ~125 ms/batch.
    # Identical numerics by construction (same bf16 params reach apply).
    import os as _os

    if precast_dtype is not None and \
            _os.environ.get("EVAL_PRECAST", "1") == "1":
        from .parallel.train_state import cast_floating

        params = jax.jit(
            lambda p: cast_floating(p, precast_dtype)
        )(params)

    evaluator = CocoBboxEvaluator(coco_index)
    metric_logger = MetricLogger(logger=logger)

    def finish(pending):
        batch, dev_res, out_loss = pending
        results = postprocessor.host(dev_res)
        preds = {}
        n_real = batch.get("n_real", len(results))
        for img_id, res in list(zip(batch["image_ids"].tolist(), results))[:n_real]:
            # map contiguous label ids back to COCO category ids unless the
            # postprocessor already emitted COCO ids (coco_id_remap=True)
            labels = res["labels"]
            if not getattr(postprocessor, "emits_coco_ids", False):
                labels = np.asarray(
                    [contiguous_to_catid.get(int(l), int(l)) for l in labels]
                )
            preds[img_id] = {
                "scores": res["scores"],
                "labels": labels,
                "boxes": res["boxes"],
            }
        evaluator.update(preds)
        if out_loss is not None:
            metric_logger.update(loss=float(out_loss))

    pending = None
    for i, batch in enumerate(metric_logger.log_every(loader, print_freq, "Eval")):
        sharded = shard_batch(batch, mesh)
        out = eval_step(params, sharded)
        dev_res = postprocessor.device(
            {"pred_logits": out["pred_logits"], "pred_boxes": out["pred_boxes"]},
            batch["orig_sizes"],
        )
        if pending is not None:
            finish(pending)
        pending = (batch, dev_res, out.get("loss"))
        if max_steps is not None and i + 1 >= max_steps:
            break
    if pending is not None:
        finish(pending)

    if jax.process_count() > 1:
        _merge_eval_across_hosts(evaluator)
    evaluator.accumulate()
    stats = evaluator.summarize()
    if logger:
        logger.info(
            "COCO bbox: " + " ".join(f"{k}={v:.4f}" for k, v in stats.items())
        )
    return stats
