"""Hungarian matching designed for jit — cost on device, assignment on
device by default.

The reference computes cost matrices on GPU, copies to CPU, and runs scipy's
linear_sum_assignment per sample (reference matcher.py:25-120).  Here the
cost tensor is computed *inside* the jitted train step with static shapes
(GT padded to max_gt), and the assignment runs *on device* through the
Jonker-Volgenant solver in ops/hungarian.py (scipy-parity tested) — no
host round-trip at all, which the axon runtime requires (no host
callbacks) and which removes the per-step device→host sync the reference
pays with `C.cpu()`.  A host pure_callback path
(`hungarian_assign(method='callback')`) is kept for platforms where
callbacks are available and G is large.

Static-shape contract: every image has exactly G = max_gt GT slots with a
validity mask; invalid columns get a large constant cost so the LSA still
runs, and their assignments are discarded via the mask.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from scipy.optimize import linear_sum_assignment

from ..utils import box_ops

BIG_COST = 1e6


def compute_cost_matrix(
    pred_logits: jnp.ndarray,   # (B, Q, 256)
    pred_boxes: jnp.ndarray,    # (B, Q, 4) cxcywh sigmoid
    gt_boxes: jnp.ndarray,      # (B, G, 4) cxcywh normalized
    gt_pos_maps: jnp.ndarray,   # (B, G, 256) 0/1 token map per GT (unnormalized)
    gt_valid: jnp.ndarray,      # (B, G) bool
    cost_class: float = 1.0,
    cost_bbox: float = 5.0,
    cost_giou: float = 2.0,
    focal_alpha: float = 0.25,
    focal_gamma: float = 2.0,
) -> jnp.ndarray:
    """(B, Q, G) matching cost (reference matcher.py:66-106 semantics,
    vectorized over the batch with masked invalid columns)."""
    prob = jax.nn.sigmoid(pred_logits.astype(jnp.float32))
    neg = (1 - focal_alpha) * (prob ** focal_gamma) * (-jnp.log(1 - prob + 1e-8))
    pos = focal_alpha * ((1 - prob) ** focal_gamma) * (-jnp.log(prob + 1e-8))

    # normalize each GT's token map to sum 1 (reference matcher.py:90)
    denom = jnp.clip(gt_pos_maps.sum(-1, keepdims=True), min=1e-6)
    maps = gt_pos_maps / denom
    c_class = jnp.einsum("bqt,bgt->bqg", pos - neg, maps)

    c_bbox = jnp.sum(
        jnp.abs(pred_boxes[:, :, None, :] - gt_boxes[:, None, :, :]), axis=-1
    )
    giou = jax.vmap(box_ops.generalized_box_iou)(
        box_ops.box_cxcywh_to_xyxy(pred_boxes),
        box_ops.box_cxcywh_to_xyxy(gt_boxes),
    )
    C = cost_bbox * c_bbox + cost_class * c_class + cost_giou * (-giou)
    C = jnp.where(jnp.isfinite(C), C, 0.0)  # reference matcher.py:105-106
    # disable padded GT columns
    C = jnp.where(gt_valid[:, None, :], C, BIG_COST)
    return C


def _host_lsa(cost: np.ndarray, valid: np.ndarray) -> np.ndarray:
    """cost: (N, Q, G), valid: (N, G) -> src queries (N, G) int32; invalid
    slots get sentinel Q (dropped by scatter mode='drop' downstream)."""
    N, Q, G = cost.shape
    out = np.full((N, G), Q, np.int32)
    for n in range(N):
        cols = np.nonzero(valid[n])[0]
        if len(cols) == 0:
            continue
        c = cost[n][:, cols]
        try:
            rows, cidx = linear_sum_assignment(c)
        except ValueError:
            # greedy fallback (reference matcher.py:112-119)
            rows = np.argmin(c, axis=0)[np.arange(len(cols))]
            cidx = np.arange(len(cols))
        out[n, cols[cidx]] = rows.astype(np.int32)
    return out


def minsum_assign(cost: jnp.ndarray, gt_valid: jnp.ndarray) -> jnp.ndarray:
    """SimpleMinsumMatcher semantics (reference matcher.py:123-201,
    selectable via args.matcher_type, build_matcher 204-217): every GT
    independently takes its min-cost query.  NOT injective — two GTs may
    claim the same query, exactly as upstream (`weight_mat.min(0)[1]`).
    (N, Q, G) costs -> (N, G) query indices, sentinel Q on invalid slots."""
    cost = jax.lax.stop_gradient(cost)
    src = jnp.argmin(cost, axis=1).astype(jnp.int32)  # (N, G)
    return jnp.where(gt_valid, src, jnp.int32(cost.shape[1]))


def hungarian_assign(
    cost: jnp.ndarray, gt_valid: jnp.ndarray, method: str = "device"
) -> jnp.ndarray:
    """Jit-safe Hungarian assignment: (N, Q, G) costs -> (N, G) query indices
    (sentinel Q for invalid GT).

    method='device' (default): on-device Jonker-Volgenant (ops/hungarian.py)
      — no host sync, works everywhere including the axon TPU runtime which
      has no host-callback support.
    method='callback': scipy on host via pure_callback (CPU-backend tests /
      parity validation only).
    """
    cost = jax.lax.stop_gradient(cost)
    if method == "device":
        from ..ops.hungarian import hungarian_device

        return hungarian_device(cost, gt_valid)
    N, Q, G = cost.shape
    result_shape = jax.ShapeDtypeStruct((N, G), jnp.int32)
    return jax.pure_callback(
        _host_lsa, result_shape, cost, gt_valid, vmap_method="sequential"
    )
