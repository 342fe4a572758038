"""Box utilities in JAX.

Semantics mirror the reference's util/box_ops.py (cxcywh<->xyxy conversions,
pairwise/elementwise IoU and generalized IoU) but are written for XLA: pure
functions, no asserts on traced values, fully broadcastable.
"""
from __future__ import annotations

import jax
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


def ciou_loss(bboxes1: jnp.ndarray, bboxes2: jnp.ndarray) -> jnp.ndarray:
    """Complete-IoU loss, 1 - CIoU (reference util/box_loss.py:7-57).

    Faithful to the reference's (unusual) parameterization: inputs are raw
    box params passed through sigmoid, with widths/heights exp'd from the
    sigmoided values.  Elementwise over matched pairs (N, 4) -> (N,).
    Unused by the shipped configs (box loss is L1 + GIoU) but part of the
    reference surface."""
    import math as _math

    b1 = jax.nn.sigmoid(bboxes1.astype(jnp.float32))
    b2 = jax.nn.sigmoid(bboxes2.astype(jnp.float32))
    w1, h1 = jnp.exp(b1[:, 2]), jnp.exp(b1[:, 3])
    w2, h2 = jnp.exp(b2[:, 2]), jnp.exp(b2[:, 3])
    area1, area2 = w1 * h1, w2 * h2
    cx1, cy1, cx2, cy2 = b1[:, 0], b1[:, 1], b2[:, 0], b2[:, 1]

    inter_w = jnp.clip(
        jnp.minimum(cx1 + w1 / 2, cx2 + w2 / 2)
        - jnp.maximum(cx1 - w1 / 2, cx2 - w2 / 2), 0)
    inter_h = jnp.clip(
        jnp.minimum(cy1 + h1 / 2, cy2 + h2 / 2)
        - jnp.maximum(cy1 - h1 / 2, cy2 - h2 / 2), 0)
    inter = inter_w * inter_h
    c_w = jnp.clip(
        jnp.maximum(cx1 + w1 / 2, cx2 + w2 / 2)
        - jnp.minimum(cx1 - w1 / 2, cx2 - w2 / 2), 0)
    c_h = jnp.clip(
        jnp.maximum(cy1 + h1 / 2, cy2 + h2 / 2)
        - jnp.minimum(cy1 - h1 / 2, cy2 - h2 / 2), 0)
    inter_diag = (cx2 - cx1) ** 2 + (cy2 - cy1) ** 2
    c_diag = c_w ** 2 + c_h ** 2
    union = area1 + area2 - inter
    u = inter_diag / c_diag
    iou = inter / union
    v = (4 / _math.pi ** 2) * (jnp.arctan(w2 / h2) - jnp.arctan(w1 / h1)) ** 2
    alpha = jax.lax.stop_gradient(
        jnp.where(iou > 0.5, v / (1 - iou + v), 0.0)
    )
    cious = jnp.clip(iou - u - alpha * v, -1.0, 1.0)
    return 1 - cious


def diou_loss(bboxes1: jnp.ndarray, bboxes2: jnp.ndarray) -> jnp.ndarray:
    """Distance-IoU loss, 1 - DIoU (reference util/box_loss.py:59-111);
    same parameterization notes as ciou_loss."""
    b1 = jax.nn.sigmoid(bboxes1.astype(jnp.float32))
    b2 = jax.nn.sigmoid(bboxes2.astype(jnp.float32))
    w1, h1 = jnp.exp(b1[:, 2]), jnp.exp(b1[:, 3])
    w2, h2 = jnp.exp(b2[:, 2]), jnp.exp(b2[:, 3])
    area1, area2 = w1 * h1, w2 * h2
    cx1, cy1, cx2, cy2 = b1[:, 0], b1[:, 1], b2[:, 0], b2[:, 1]

    inter_w = jnp.clip(
        jnp.minimum(cx1 + w1 / 2, cx2 + w2 / 2)
        - jnp.maximum(cx1 - w1 / 2, cx2 - w2 / 2), 0)
    inter_h = jnp.clip(
        jnp.minimum(cy1 + h1 / 2, cy2 + h2 / 2)
        - jnp.maximum(cy1 - h1 / 2, cy2 - h2 / 2), 0)
    inter = inter_w * inter_h
    c_w = jnp.clip(
        jnp.maximum(cx1 + w1 / 2, cx2 + w2 / 2)
        - jnp.minimum(cx1 - w1 / 2, cx2 - w2 / 2), 0)
    c_h = jnp.clip(
        jnp.maximum(cy1 + h1 / 2, cy2 + h2 / 2)
        - jnp.minimum(cy1 - h1 / 2, cy2 - h2 / 2), 0)
    inter_diag = (cx2 - cx1) ** 2 + (cy2 - cy1) ** 2
    c_diag = c_w ** 2 + c_h ** 2
    union = area1 + area2 - inter
    dious = jnp.clip(inter / union - inter_diag / c_diag, -1.0, 1.0)
    return 1 - dious
