"""Box utilities in JAX.

Semantics mirror the reference's util/box_ops.py (cxcywh<->xyxy conversions,
pairwise/elementwise IoU and generalized IoU) but are written for XLA: pure
functions, no asserts on traced values, fully broadcastable.
"""
from __future__ import annotations

import jax.numpy as jnp


def box_cxcywh_to_xyxy(x: jnp.ndarray) -> jnp.ndarray:
    """(..., 4) center-size -> corner format."""
    cx, cy, w, h = jnp.split(x, 4, axis=-1)
    return jnp.concatenate(
        [cx - 0.5 * w, cy - 0.5 * h, cx + 0.5 * w, cy + 0.5 * h], axis=-1
    )


def box_xyxy_to_cxcywh(x: jnp.ndarray) -> jnp.ndarray:
    """(..., 4) corner -> center-size format."""
    x0, y0, x1, y1 = jnp.split(x, 4, axis=-1)
    return jnp.concatenate(
        [(x0 + x1) / 2, (y0 + y1) / 2, x1 - x0, y1 - y0], axis=-1
    )


def box_area(boxes: jnp.ndarray) -> jnp.ndarray:
    """(..., 4) xyxy -> (...,) area."""
    return (boxes[..., 2] - boxes[..., 0]) * (boxes[..., 3] - boxes[..., 1])


def box_iou(boxes1: jnp.ndarray, boxes2: jnp.ndarray):
    """Pairwise IoU.  boxes1: (N, 4), boxes2: (M, 4), xyxy.  -> (N, M), (N, M)."""
    area1 = box_area(boxes1)
    area2 = box_area(boxes2)

    lt = jnp.maximum(boxes1[..., :, None, :2], boxes2[..., None, :, :2])
    rb = jnp.minimum(boxes1[..., :, None, 2:], boxes2[..., None, :, 2:])
    wh = jnp.clip(rb - lt, min=0)
    inter = wh[..., 0] * wh[..., 1]

    union = area1[..., :, None] + area2[..., None, :] - inter
    iou = inter / union
    return iou, union


def generalized_box_iou(boxes1: jnp.ndarray, boxes2: jnp.ndarray) -> jnp.ndarray:
    """Pairwise GIoU (https://giou.stanford.edu/), boxes in xyxy.  -> (N, M).

    NOTE: unlike the torch reference there are no degeneracy asserts; invalid
    boxes produce invalid values the caller must mask (the matcher zeroes
    NaN/Inf exactly like the reference does).
    """
    iou, union = box_iou(boxes1, boxes2)

    lt = jnp.minimum(boxes1[..., :, None, :2], boxes2[..., None, :, :2])
    rb = jnp.maximum(boxes1[..., :, None, 2:], boxes2[..., None, :, 2:])
    wh = jnp.clip(rb - lt, min=0)
    area = wh[..., 0] * wh[..., 1]

    return iou - (area - union) / area


def box_iou_elementwise(boxes1: jnp.ndarray, boxes2: jnp.ndarray):
    """Elementwise IoU for same-shaped (..., 4) xyxy boxes."""
    area1 = box_area(boxes1)
    area2 = box_area(boxes2)

    lt = jnp.maximum(boxes1[..., :2], boxes2[..., :2])
    rb = jnp.minimum(boxes1[..., 2:], boxes2[..., 2:])
    wh = jnp.clip(rb - lt, min=0)
    inter = wh[..., 0] * wh[..., 1]
    union = area1 + area2 - inter
    return inter / union, union


def generalized_box_iou_elementwise(boxes1, boxes2):
    """Elementwise GIoU for same-shaped (..., 4) xyxy boxes."""
    iou, union = box_iou_elementwise(boxes1, boxes2)
    lt = jnp.minimum(boxes1[..., :2], boxes2[..., :2])
    rb = jnp.maximum(boxes1[..., 2:], boxes2[..., 2:])
    wh = jnp.clip(rb - lt, min=0)
    area = wh[..., 0] * wh[..., 1]
    return iou - (area - union) / area
