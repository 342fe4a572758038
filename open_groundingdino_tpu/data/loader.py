"""Batch assembly + input pipeline.

Turns host-side Samples into the model's static-shape numpy batch:
bucket-padded images, fixed-width tokenized captions with sub-sentence
masks, GT padded to max_gt with per-GT token positive maps.  This is the
TPU replacement for the reference's collate_fn/NestedTensor
(util/misc.py:285-397) + the host parts of the criterion
(groundingdino.py:535-547).

Distributed input: `shard_iter` slices the dataset by process the way
DistributedSampler does (main.py:316-323); a background thread double-buffers
batches ahead of the device.
"""
from __future__ import annotations

import queue
import threading
from typing import Dict, Iterator, List, Optional, Sequence

import numpy as np

from .tokenization import (
    BertWordPieceTokenizer,
    build_label_maps,
    generate_masks_with_special_tokens,
)
from .transforms import Bucketer, Sample, boxes_to_cxcywh_norm, normalize_image


class Collator:
    def __init__(
        self,
        tokenizer: BertWordPieceTokenizer,
        buckets: Sequence,
        max_text_len: int = 256,
        max_gt: int = 128,
        u8_images: bool = False,
    ):
        self.tokenizer = tokenizer
        self.bucketer = Bucketer(buckets)
        self.max_text_len = max_text_len
        self.max_gt = max_gt
        self.special_ids = tokenizer.special_token_ids()
        # u8_images: ship RAW uint8 pixels (3 B/px instead of 12) and
        # normalize + zero-pad ON DEVICE (train_state._maybe_device_
        # normalize) — quarters host->device input bandwidth, the measured
        # eval-pipeline bottleneck (BENCH_NOTES 2026-08-20).  Exact: PIL
        # images are u8 already; the device does the identical
        # (x/255 - mean)/std in f32 and re-zeros the pad region.
        self.u8_images = u8_images

    def __call__(self, samples: List[Sample]) -> Dict[str, np.ndarray]:
        B = len(samples)
        if self.u8_images:
            images = [
                np.asarray(s.image.convert("RGB"), np.uint8)
                for s in samples
            ]
        else:
            images = [normalize_image(s.image) for s in samples]
        batch_images, image_sizes = self.bucketer.pad_batch(images)

        captions = [s.caption for s in samples]
        tok = self.tokenizer(captions, padding=self.max_text_len)
        attn_mask, position_ids = generate_masks_with_special_tokens(
            tok.input_ids, self.special_ids
        )
        label_maps = build_label_maps(
            tok,
            [s.cap_list for s in samples],
            captions,
            self.max_text_len,
        )  # list of (n_cats, T)

        G = self.max_gt
        gt_boxes = np.zeros((B, G, 4), np.float32)
        gt_pos_maps = np.zeros((B, G, self.max_text_len), np.float32)
        gt_valid = np.zeros((B, G), bool)
        for b, s in enumerate(samples):
            h, w = s.image.size[1], s.image.size[0]
            n = min(len(s.boxes), G)
            if n == 0:
                continue
            gt_boxes[b, :n] = boxes_to_cxcywh_norm(s.boxes[:n], h, w)
            rows = label_maps[b][s.labels[:n]]
            gt_pos_maps[b, :n] = rows
            # a GT whose label found no tokens can never be matched usefully;
            # keep it valid for box losses exactly like the reference does.
            gt_valid[b, :n] = True

        return {
            "images": batch_images,
            "image_sizes": image_sizes,
            "input_ids": tok.input_ids,
            "text_token_mask": tok.attention_mask.astype(bool),
            "position_ids": position_ids.astype(np.int32),
            "text_self_attention_masks": attn_mask,
            "gt_boxes": gt_boxes,
            "gt_pos_maps": gt_pos_maps,
            "gt_valid": gt_valid,
            # eval-side metadata (host only, not fed to jit)
            "image_ids": np.asarray([s.image_id for s in samples], np.int64),
            "orig_sizes": np.asarray([s.orig_size for s in samples], np.int64),
            "label_maps": label_maps,
        }


def shard_iter(
    n: int,
    process_index: int,
    process_count: int,
    shuffle: bool,
    seed: int,
    drop_last: bool = True,
) -> List[int]:
    """Per-process index list, DistributedSampler semantics: pad to a
    multiple of process_count by wrapping, then stride."""
    idx = np.arange(n)
    if shuffle:
        idx = np.random.RandomState(seed).permutation(n)
    if n % process_count != 0:
        pad = process_count - n % process_count
        idx = np.concatenate([idx, idx[:pad]])
    return idx[process_index::process_count].tolist()


class DataLoader:
    """Minimal multi-threaded prefetching loader (no torch dependency)."""

    def __init__(
        self,
        dataset,
        collator: Collator,
        batch_size: int,
        shuffle: bool = False,
        seed: int = 0,
        process_index: int = 0,
        process_count: int = 1,
        num_threads: int = 4,
        prefetch: int = 2,
        drop_last: Optional[bool] = None,
    ):
        self.dataset = dataset
        self.collator = collator
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.process_index = process_index
        self.process_count = process_count
        self.num_threads = num_threads
        self.prefetch = prefetch
        self.drop_last = drop_last if drop_last is not None else shuffle
        self.epoch = 0

    def set_epoch(self, epoch: int):
        self.epoch = epoch

    def __len__(self):
        n = len(
            shard_iter(len(self.dataset), self.process_index, self.process_count,
                       False, 0)
        )
        if self.drop_last:
            return n // self.batch_size
        return -(-n // self.batch_size)

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        indices = shard_iter(
            len(self.dataset), self.process_index, self.process_count,
            self.shuffle, self.seed + self.epoch,
        )
        batches = []
        for i in range(0, len(indices), self.batch_size):
            b = indices[i : i + self.batch_size]
            if len(b) < self.batch_size:
                if self.drop_last and batches:
                    continue
                # pad to the static batch size (padded entries flagged via
                # n_real; eval skips them).  A dataset smaller than one
                # global batch still yields one padded batch even with
                # drop_last — silently yielding nothing stalls training.
                b = b + [b[-1]] * (self.batch_size - len(b))
                batches.append((b, len(indices) - i))
            else:
                batches.append((b, self.batch_size))

        # Thread pool: num_threads workers pull batch jobs from an input
        # queue and deposit collated batches into per-slot result boxes; the
        # consumer yields them strictly in order.  In-flight work is bounded
        # by prefetch + num_threads so decode/augment overlaps the device
        # step without unbounded memory (the torch DataLoader num_workers
        # analog, reference main.py:324-333).
        n_workers = max(1, int(self.num_threads))
        in_q: "queue.Queue" = queue.Queue()
        results: Dict[int, object] = {}
        results_lock = threading.Condition()
        stop = threading.Event()

        def worker():
            while not stop.is_set():
                job = in_q.get()
                if job is None:
                    return
                slot, (batch_idx, n_real) = job
                try:
                    samples = [self.dataset[i] for i in batch_idx]
                    collated = self.collator(samples)
                    collated["n_real"] = n_real
                    item: object = collated
                except Exception as e:  # surface loader errors to consumer
                    item = e
                with results_lock:
                    results[slot] = item
                    results_lock.notify_all()

        threads = [
            threading.Thread(target=worker, daemon=True)
            for _ in range(n_workers)
        ]
        for t in threads:
            t.start()

        max_inflight = max(n_workers, self.prefetch + n_workers - 1)
        try:
            submitted = 0
            for want in range(len(batches)):
                while submitted < len(batches) and submitted - want < max_inflight:
                    in_q.put((submitted, batches[submitted]))
                    submitted += 1
                with results_lock:
                    while want not in results:
                        results_lock.wait()
                    item = results.pop(want)
                if isinstance(item, Exception):
                    raise item
                yield item
        finally:
            stop.set()
            for _ in threads:
                in_q.put(None)
