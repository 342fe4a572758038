"""Box ops parity vs a numpy oracle implementing the published IoU/GIoU
definitions (inter/union; GIoU = IoU - (hull - union)/hull)."""
import jax.numpy as jnp
import numpy as np

from open_groundingdino_tpu.utils import box_ops


def _np_iou(a, b):
    area_a = (a[:, 2] - a[:, 0]) * (a[:, 3] - a[:, 1])
    area_b = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
    lt = np.maximum(a[:, None, :2], b[None, :, :2])
    rb = np.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = np.clip(rb - lt, 0, None)
    inter = wh[..., 0] * wh[..., 1]
    union = area_a[:, None] + area_b[None, :] - inter
    return inter / union, union


def _np_giou(a, b):
    iou, union = _np_iou(a, b)
    lt = np.minimum(a[:, None, :2], b[None, :, :2])
    rb = np.maximum(a[:, None, 2:], b[None, :, 2:])
    wh = np.clip(rb - lt, 0, None)
    hull = wh[..., 0] * wh[..., 1]
    return iou - (hull - union) / hull


def _rand_boxes(n, seed):
    rng = np.random.RandomState(seed)
    cxcywh = rng.uniform(0.2, 0.8, size=(n, 4)).astype(np.float32)
    cxcywh[:, 2:] *= 0.3
    return cxcywh


def test_cxcywh_xyxy_roundtrip():
    b = jnp.asarray(_rand_boxes(17, 0))
    out = box_ops.box_xyxy_to_cxcywh(box_ops.box_cxcywh_to_xyxy(b))
    np.testing.assert_allclose(np.asarray(out), np.asarray(b), atol=1e-6)


def test_pairwise_iou_vs_oracle():
    a = box_ops.box_cxcywh_to_xyxy(jnp.asarray(_rand_boxes(11, 1)))
    b = box_ops.box_cxcywh_to_xyxy(jnp.asarray(_rand_boxes(7, 2)))
    iou, _ = box_ops.box_iou(a, b)
    ref, _ = _np_iou(np.asarray(a), np.asarray(b))
    np.testing.assert_allclose(np.asarray(iou), ref, atol=1e-5)


def test_pairwise_giou_vs_oracle():
    a = box_ops.box_cxcywh_to_xyxy(jnp.asarray(_rand_boxes(9, 3)))
    b = box_ops.box_cxcywh_to_xyxy(jnp.asarray(_rand_boxes(13, 4)))
    giou = box_ops.generalized_box_iou(a, b)
    ref = _np_giou(np.asarray(a), np.asarray(b))
    np.testing.assert_allclose(np.asarray(giou), ref, atol=1e-5)


def test_elementwise_matches_diagonal():
    a = box_ops.box_cxcywh_to_xyxy(jnp.asarray(_rand_boxes(6, 5)))
    b = box_ops.box_cxcywh_to_xyxy(jnp.asarray(_rand_boxes(6, 6)))
    g_pair = box_ops.generalized_box_iou(a, b)
    g_elem = box_ops.generalized_box_iou_elementwise(a, b)
    np.testing.assert_allclose(np.asarray(jnp.diag(g_pair)), np.asarray(g_elem), atol=1e-6)
