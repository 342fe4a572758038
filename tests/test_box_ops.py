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


def test_ciou_diou_vs_torch_oracle():
    """ciou_loss/diou_loss vs a hand-built torch implementation of the
    reference formula (util/box_loss.py:7-111), including the sigmoid+exp
    parameterization and the alpha gating at IoU>0.5."""
    import math
    import torch

    from open_groundingdino_tpu.utils.box_ops import ciou_loss, diou_loss

    def t_ciou(b1, b2):
        b1, b2 = torch.sigmoid(b1), torch.sigmoid(b2)
        w1, h1 = torch.exp(b1[:, 2]), torch.exp(b1[:, 3])
        w2, h2 = torch.exp(b2[:, 2]), torch.exp(b2[:, 3])
        a1, a2 = w1 * h1, w2 * h2
        cx1, cy1, cx2, cy2 = b1[:, 0], b1[:, 1], b2[:, 0], b2[:, 1]
        il = torch.max(cx1 - w1 / 2, cx2 - w2 / 2)
        ir = torch.min(cx1 + w1 / 2, cx2 + w2 / 2)
        it = torch.max(cy1 - h1 / 2, cy2 - h2 / 2)
        ib = torch.min(cy1 + h1 / 2, cy2 + h2 / 2)
        inter = (ir - il).clamp(min=0) * (ib - it).clamp(min=0)
        cl = torch.min(cx1 - w1 / 2, cx2 - w2 / 2)
        cr = torch.max(cx1 + w1 / 2, cx2 + w2 / 2)
        ct = torch.min(cy1 - h1 / 2, cy2 - h2 / 2)
        cb = torch.max(cy1 + h1 / 2, cy2 + h2 / 2)
        idiag = (cx2 - cx1) ** 2 + (cy2 - cy1) ** 2
        cdiag = (cr - cl).clamp(min=0) ** 2 + (cb - ct).clamp(min=0) ** 2
        union = a1 + a2 - inter
        iou = inter / union
        u = idiag / cdiag
        v = (4 / math.pi ** 2) * (torch.atan(w2 / h2) - torch.atan(w1 / h1)) ** 2
        S = (iou > 0.5).float()
        alpha = S * v / (1 - iou + v)
        return 1 - torch.clamp(iou - u - alpha * v, min=-1.0, max=1.0)

    def t_diou(b1, b2):
        b1, b2 = torch.sigmoid(b1), torch.sigmoid(b2)
        w1, h1 = torch.exp(b1[:, 2]), torch.exp(b1[:, 3])
        w2, h2 = torch.exp(b2[:, 2]), torch.exp(b2[:, 3])
        a1, a2 = w1 * h1, w2 * h2
        cx1, cy1, cx2, cy2 = b1[:, 0], b1[:, 1], b2[:, 0], b2[:, 1]
        il = torch.max(cx1 - w1 / 2, cx2 - w2 / 2)
        ir = torch.min(cx1 + w1 / 2, cx2 + w2 / 2)
        it = torch.max(cy1 - h1 / 2, cy2 - h2 / 2)
        ib = torch.min(cy1 + h1 / 2, cy2 + h2 / 2)
        inter = (ir - il).clamp(min=0) * (ib - it).clamp(min=0)
        cl = torch.min(cx1 - w1 / 2, cx2 - w2 / 2)
        cr = torch.max(cx1 + w1 / 2, cx2 + w2 / 2)
        ct = torch.min(cy1 - h1 / 2, cy2 - h2 / 2)
        cb = torch.max(cy1 + h1 / 2, cy2 + h2 / 2)
        idiag = (cx2 - cx1) ** 2 + (cy2 - cy1) ** 2
        cdiag = (cr - cl).clamp(min=0) ** 2 + (cb - ct).clamp(min=0) ** 2
        union = a1 + a2 - inter
        return 1 - torch.clamp(inter / union - idiag / cdiag, min=-1.0, max=1.0)

    x = torch.randn(32, 4, generator=torch.Generator().manual_seed(0))
    y = torch.randn(32, 4, generator=torch.Generator().manual_seed(1))
    np.testing.assert_allclose(
        np.asarray(ciou_loss(jnp.asarray(x.numpy()), jnp.asarray(y.numpy()))),
        t_ciou(x, y).numpy(), rtol=1e-5, atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(diou_loss(jnp.asarray(x.numpy()), jnp.asarray(y.numpy()))),
        t_diou(x, y).numpy(), rtol=1e-5, atol=1e-6,
    )
