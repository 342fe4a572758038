"""SetCriterion: token-level sigmoid focal CE + L1 + GIoU box losses over
Hungarian-matched query/GT pairs, repeated for every aux decoder layer and
the encoder's interm outputs (reference groundingdino.py:407-639).

Everything is static-shape and runs inside jit: GT are padded to max_gt with
a validity mask, matching happens through models/matcher.hungarian_assign
(device-native Jonker-Volgenant solver, ops/hungarian.py; a pure_callback
host fallback exists only for impl='callback'), and per-layer losses are
computed vectorized.
Loss normalizers follow the reference: boxes by the (all-reduce'd) total GT
count, CE by the number of matched pairs — under our global-batch jit both
are global sums, which is the single-controller equivalent of the
reference's dist.all_reduce(num_boxes) (groundingdino.py:570-576).
"""
from __future__ import annotations

from typing import Dict, List

import jax
import jax.numpy as jnp

from ..utils import box_ops
from .matcher import compute_cost_matrix, hungarian_assign, minsum_assign


def build_one_hot_targets(
    src_idx: jnp.ndarray,      # (B, G) query index per GT, sentinel Q if invalid
    gt_pos_maps: jnp.ndarray,  # (B, G, T) 0/1 token map per GT
    gt_valid: jnp.ndarray,     # (B, G)
    num_queries: int,
) -> jnp.ndarray:
    """(B, Q, T) one-hot token targets (reference groundingdino.py:560-565)."""
    B, G, T = gt_pos_maps.shape
    rows = jnp.where(gt_valid[..., None], gt_pos_maps, 0.0)
    tgt = jnp.zeros((B, num_queries, T), rows.dtype)
    # scatter rows at query positions; sentinel Q drops out of bounds
    return tgt.at[
        jnp.arange(B)[:, None], src_idx
    ].set(rows, mode="drop")


def token_sigmoid_focal_loss(
    pred_logits: jnp.ndarray,  # (B, Q, T)
    one_hot: jnp.ndarray,      # (B, Q, T)
    text_mask: jnp.ndarray,    # (B, T) bool
    num_pos: jnp.ndarray,      # scalar
    alpha: float,
    gamma: float,
) -> jnp.ndarray:
    """Reference groundingdino.py:467-501 (masked-select replaced by masked
    sum, identical value)."""
    logits = pred_logits.astype(jnp.float32)
    tgt = one_hot.astype(jnp.float32)
    # guard: padded text positions carry -inf logits; mask them out before BCE
    mask = text_mask[:, None, :]
    safe_logits = jnp.where(mask, logits, 0.0)
    p = jax.nn.sigmoid(safe_logits)
    ce = jnp.maximum(safe_logits, 0) - safe_logits * tgt + jnp.log1p(
        jnp.exp(-jnp.abs(safe_logits))
    )
    p_t = p * tgt + (1 - p) * (1 - tgt)
    loss = ce * (1 - p_t) ** gamma
    if alpha >= 0:
        loss = (alpha * tgt + (1 - alpha) * (1 - tgt)) * loss
    loss = jnp.where(mask, loss, 0.0)
    return loss.sum() / num_pos


def _matched_box_losses(pred_boxes, src_idx, gt_boxes, gt_valid, num_boxes):
    """L1 + GIoU over matched pairs (reference groundingdino.py:438-464)."""
    B, Q, _ = pred_boxes.shape
    idx = jnp.minimum(src_idx, Q - 1)  # clip sentinel; contribution masked
    matched = jnp.take_along_axis(pred_boxes, idx[..., None], axis=1)  # (B, G, 4)
    valid = gt_valid[..., None].astype(pred_boxes.dtype)

    l1 = jnp.abs(matched - gt_boxes) * valid
    loss_bbox = l1.sum() / num_boxes
    loss_xy = l1[..., :2].sum() / num_boxes
    loss_hw = l1[..., 2:].sum() / num_boxes

    giou = box_ops.generalized_box_iou_elementwise(
        box_ops.box_cxcywh_to_xyxy(matched), box_ops.box_cxcywh_to_xyxy(gt_boxes)
    )
    loss_giou = ((1.0 - giou) * gt_valid).sum() / num_boxes
    return loss_bbox, loss_giou, loss_xy, loss_hw


class SetCriterion:
    """Functional criterion; call inside the jitted loss function."""

    def __init__(
        self,
        num_queries: int = 900,
        cost_class: float = 1.0,
        cost_bbox: float = 5.0,
        cost_giou: float = 2.0,
        cls_loss_coef: float = 2.0,
        bbox_loss_coef: float = 5.0,
        giou_loss_coef: float = 2.0,
        interm_loss_coef: float = 1.0,
        focal_alpha: float = 0.25,
        focal_gamma: float = 2.0,
        matcher_type: str = "HungarianMatcher",
    ):
        assert matcher_type in ("HungarianMatcher", "SimpleMinsumMatcher"), (
            f"Unknown matcher_type: {matcher_type}"  # reference matcher.py:205
        )
        self.matcher_type = matcher_type
        self.num_queries = num_queries
        self.cost_class = cost_class
        self.cost_bbox = cost_bbox
        self.cost_giou = cost_giou
        self.weight_dict = {
            "loss_ce": cls_loss_coef,
            "loss_bbox": bbox_loss_coef,
            "loss_giou": giou_loss_coef,
        }
        self.interm_loss_coef = interm_loss_coef
        self.focal_alpha = focal_alpha
        self.focal_gamma = focal_gamma

    def __call__(
        self,
        outputs: Dict,
        gt_boxes: jnp.ndarray,     # (B, G, 4) cxcywh normalized
        gt_pos_maps: jnp.ndarray,  # (B, G, T) 0/1 token maps
        gt_valid: jnp.ndarray,     # (B, G) bool
    ):
        """Returns (total_loss, loss_dict).  `outputs` is the model dict with
        pred_logits/pred_boxes, aux_outputs, interm_outputs."""
        text_mask = outputs["text_mask"]
        sets: List[Dict] = [
            {"pred_logits": outputs["pred_logits"], "pred_boxes": outputs["pred_boxes"]}
        ]
        suffixes = [""]
        for i, aux in enumerate(outputs.get("aux_outputs", [])):
            sets.append(aux)
            suffixes.append(f"_{i}")
        if "interm_outputs" in outputs:
            sets.append(outputs["interm_outputs"])
            suffixes.append("_interm")

        # one stacked cost tensor -> one host round-trip for all layers
        costs = jnp.stack(
            [
                compute_cost_matrix(
                    s["pred_logits"], s["pred_boxes"], gt_boxes, gt_pos_maps,
                    gt_valid, self.cost_class, self.cost_bbox, self.cost_giou,
                    self.focal_alpha, self.focal_gamma,
                )
                for s in sets
            ]
        )  # (S, B, Q, G)
        S, B, Q, G = costs.shape
        assign = (
            minsum_assign if self.matcher_type == "SimpleMinsumMatcher"
            else hungarian_assign
        )
        src_idx = assign(
            costs.reshape(S * B, Q, G),
            jnp.tile(gt_valid, (S, 1)),
        ).reshape(S, B, G)

        num_boxes = jnp.clip(gt_valid.sum().astype(jnp.float32), min=1.0)
        losses: Dict[str, jnp.ndarray] = {}
        total = 0.0
        for s_i, (s, sfx) in enumerate(zip(sets, suffixes)):
            idx = src_idx[s_i]
            matched = (idx < Q) & gt_valid
            num_pos = jnp.clip(matched.sum().astype(jnp.float32), min=1.0)

            one_hot = build_one_hot_targets(idx, gt_pos_maps, gt_valid, Q)
            loss_ce = token_sigmoid_focal_loss(
                s["pred_logits"], one_hot, text_mask, num_pos,
                self.focal_alpha, self.focal_gamma,
            )
            loss_bbox, loss_giou, loss_xy, loss_hw = _matched_box_losses(
                s["pred_boxes"].astype(jnp.float32), idx,
                gt_boxes.astype(jnp.float32), gt_valid, num_boxes,
            )
            losses[f"loss_ce{sfx}"] = loss_ce
            losses[f"loss_bbox{sfx}"] = loss_bbox
            losses[f"loss_giou{sfx}"] = loss_giou
            losses[f"loss_xy{sfx}"] = loss_xy
            losses[f"loss_hw{sfx}"] = loss_hw

            coef = self.interm_loss_coef if sfx == "_interm" else 1.0
            total = total + coef * (
                self.weight_dict["loss_ce"] * loss_ce
                + self.weight_dict["loss_bbox"] * loss_bbox
                + self.weight_dict["loss_giou"] * loss_giou
            )
        return total, losses
