"""Optimizer construction: AdamW with the reference's parameter groups.

Reference util/get_param_dicts.py 'ddetr_in_mmdet' mode (the one the configs
use): backbone + text-encoder params at lr_backbone, linear-projection
modules (ref_point_head, sampling_offsets) at lr * lr_linear_proj_mult,
everything else at base lr; weight decay uniform; global-norm gradient clip
(main.py clip_max_norm).  Realized as optax.multi_transform keyed by
parameter path.
"""
from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import optax


def safe_global_norm(tree) -> jnp.ndarray:
    """Overflow-safe global L2 norm: at a fresh random init individual
    gradients can be ~1e19 (finite) and the naive f32 sum of squares
    overflows to inf, which makes clip_by_global_norm zero every update and
    silently stall training.  Rescale by the global max first."""
    leaves = [jnp.asarray(g, jnp.float32) for g in jax.tree_util.tree_leaves(tree)]
    if not leaves:
        return jnp.zeros(())
    gmax = jnp.maximum(
        jnp.asarray(1e-30, jnp.float32),
        jnp.max(jnp.stack([jnp.max(jnp.abs(g)) for g in leaves])),
    )
    ssq = sum(jnp.sum((g / gmax) ** 2) for g in leaves)
    return gmax * jnp.sqrt(ssq)


def safe_clip_by_global_norm(max_norm: float) -> optax.GradientTransformation:
    def init_fn(params):
        return optax.EmptyState()

    def update_fn(updates, state, params=None):
        norm = safe_global_norm(updates)
        scale = jnp.minimum(1.0, max_norm / jnp.maximum(norm, 1e-30))
        return jax.tree_util.tree_map(lambda g: g * scale, updates), state

    return optax.GradientTransformation(init_fn, update_fn)


def _label_for_path(path: str, backbone_keys: Sequence[str], proj_keys: Sequence[str]) -> str:
    for k in backbone_keys:
        if k in path:
            return "backbone"
    for k in proj_keys:
        if k in path:
            return "linear_proj"
    return "base"


def label_params(params, backbone_keys=("backbone", "bert"),
                 proj_keys=("ref_point_head", "sampling_offsets")):
    flat = jax.tree_util.tree_flatten_with_path(params)[0]

    def path_str(kp):
        return "/".join(getattr(k, "key", str(k)) for k in kp)

    labels = jax.tree_util.tree_unflatten(
        jax.tree_util.tree_structure(params),
        [_label_for_path(path_str(kp), backbone_keys, proj_keys) for kp, _ in flat],
    )
    return labels


def make_optimizer(
    params,
    lr,
    lr_backbone: float,
    lr_linear_proj_mult: float = 0.1,
    weight_decay: float = 1e-4,
    clip_max_norm: float = 0.1,
    frozen_keys: Sequence[str] = (),
    base_lr: float = None,
):
    """lr may be a float or an optax schedule (applied proportionally to all
    groups).  frozen_keys: parameter-path substrings to freeze entirely
    (reference main.py:269-290 keyword freezing).

    base_lr: the nominal base learning rate the schedule peaks at — required
    when lr is a schedule, because the backbone multiplier is defined as
    lr_backbone / base_lr (reference get_param_dicts.py:34-53), NOT relative
    to the schedule's value at step 0 (OneCycle warms up from peak/25, so
    deriving the mult from lr(0) would train the backbone ~25x too hot)."""

    def scaled(schedule_or_lr, mult):
        if callable(schedule_or_lr):
            return lambda step: schedule_or_lr(step) * mult
        return schedule_or_lr * mult

    base_mult = 1.0
    if callable(lr):
        if base_lr is None:
            raise ValueError(
                "make_optimizer: pass base_lr (the schedule's nominal peak) "
                "when lr is a schedule"
            )
        backbone_mult = lr_backbone / float(base_lr)
    else:
        backbone_mult = lr_backbone / lr

    def adamw(mult):
        return optax.adamw(
            learning_rate=scaled(lr, mult), b1=0.9, b2=0.999,
            weight_decay=weight_decay,
        )

    labels = label_params(params)
    if frozen_keys:
        flat = jax.tree_util.tree_flatten_with_path(labels)[0]

        def path_str(kp):
            return "/".join(getattr(k, "key", str(k)) for k in kp)

        new_leaves = []
        for kp, lbl in flat:
            p = path_str(kp)
            new_leaves.append(
                "frozen" if any(k in p for k in frozen_keys) else lbl
            )
        labels = jax.tree_util.tree_unflatten(
            jax.tree_util.tree_structure(labels), new_leaves
        )

    import os

    if bool(int(os.environ.get("OPT_FLAT", "0"))):
        return _flat_grouped_adamw(
            labels,
            {"base": base_mult, "backbone": backbone_mult,
             "linear_proj": lr_linear_proj_mult},
            lr, weight_decay, clip_max_norm,
        )

    tx = optax.multi_transform(
        {
            "base": adamw(base_mult),
            "backbone": adamw(backbone_mult),
            "linear_proj": adamw(lr_linear_proj_mult),
            "frozen": optax.set_to_zero(),
        },
        labels,
    )
    return optax.chain(safe_clip_by_global_norm(clip_max_norm), tx)


def _flat_grouped_adamw(labels, mults, lr, weight_decay, clip_max_norm,
                        b1=0.9, b2=0.999, eps=1e-8):
    """OPT_FLAT=1: AdamW over ONE concatenated 1-D buffer per param group.

    The per-leaf optax lowering emits one fused multiply-add (+reduce for
    the clip) PER LEAF per step — 858 leaves x ~24 us of fixed per-op cost
    = 20.6 ms device/step measured at flagship params (opt_microbench
    2026-08-20), almost all dispatch overhead on <1 ms of actual FLOPs.
    Flattening each group to a single vector turns that into ~4 large
    fused ops + one concat/split round-trip (~1.4 GB of HBM traffic,
    ~2 ms).  Same math: global-norm clip (overflow-safe, like
    safe_clip_by_global_norm), per-group lr multipliers, decoupled weight
    decay — bitwise order differs only in f32 reduction association.

    State: {group: {"m": vec, "v": vec}, "count": scalar} — NOTE a
    different opt_state tree than the optax chain; checkpoints written
    with one layout don't resume into the other (gate accordingly)."""
    lbl_leaves = jax.tree_util.tree_leaves(labels)
    group_names = sorted({l for l in lbl_leaves if l != "frozen"})

    # flat buffers are 2-D (rows, LANE) rather than 1-D: XLA tiled a
    # 136M-element 1-D concat intermediate as f32[...,3]{T(8,128)} and
    # tried to allocate 23 GB (opt-microbench 2026-08-20 OOM); (rows,
    # 1024) tiles cleanly.  Zero padding is exact: grad/param pads are 0,
    # so m/v/update pads stay 0 and the clip norm is unchanged.
    LANE = 1024

    def _group_ravel(tree):
        """leaves grouped by label, each group one zero-padded 2-D buffer."""
        leaves = jax.tree_util.tree_leaves(tree)
        out = {}
        for g in group_names:
            sel = [l for l, lab in zip(leaves, lbl_leaves) if lab == g]
            if not sel:
                out[g] = jnp.zeros((0, LANE), jnp.float32)
                continue
            vec = jnp.concatenate([jnp.ravel(x) for x in sel])
            pad = (-vec.size) % LANE
            if pad:
                vec = jnp.pad(vec, (0, pad))
            out[g] = vec.reshape(-1, LANE)
        return out

    def _group_unravel(vecs, template):
        leaves = jax.tree_util.tree_leaves(template)
        flat = {g: v.reshape(-1) for g, v in vecs.items()}
        offs = {g: 0 for g in group_names}
        new = []
        for l, lab in zip(leaves, lbl_leaves):
            if lab == "frozen":
                new.append(jnp.zeros_like(l))
                continue
            n = l.size
            seg = flat[lab][offs[lab]: offs[lab] + n]
            offs[lab] += n
            new.append(seg.reshape(l.shape).astype(l.dtype))
        return jax.tree_util.tree_unflatten(
            jax.tree_util.tree_structure(template), new
        )

    def sched(step, mult):
        base = lr(step) if callable(lr) else lr
        return base * mult

    def init_fn(params):
        vecs = _group_ravel(params)
        return {
            "count": jnp.zeros((), jnp.int32),
            "m": {g: jnp.zeros_like(v) for g, v in vecs.items()},
            "v": {g: jnp.zeros_like(v) for g, v in vecs.items()},
        }

    def update_fn(updates, state, params=None):
        assert params is not None, "flat AdamW needs params (weight decay)"
        g_vecs = {g: v.astype(jnp.float32)
                  for g, v in _group_ravel(updates).items()}
        p_vecs = _group_ravel(params)
        # overflow-safe global-norm clip over the group vectors.
        # KNOWN DEVIATION (ADVICE r4, gate default-off): the norm here runs
        # over NON-FROZEN groups only, while the default optax chain clips
        # over ALL leaves (safe_clip_by_global_norm runs before
        # multi_transform zeroes 'frozen' grads) — with nonzero
        # frozen-param grads the two paths clip differently, on top of the
        # documented reassociation-only difference.
        gmax = jnp.maximum(
            jnp.asarray(1e-30, jnp.float32),
            jnp.max(jnp.stack([
                jnp.max(jnp.abs(v)) if v.size else jnp.zeros(())
                for v in g_vecs.values()
            ])),
        )
        ssq = sum(jnp.sum((v / gmax) ** 2) for v in g_vecs.values())
        norm = gmax * jnp.sqrt(ssq)
        scale = jnp.minimum(1.0, clip_max_norm / jnp.maximum(norm, 1e-30))

        count = state["count"] + 1
        cf = count.astype(jnp.float32)
        bc1 = 1.0 - b1 ** cf
        bc2 = 1.0 - b2 ** cf
        new_m, new_v, out_vecs = {}, {}, {}
        for g in group_names:
            gv = g_vecs[g] * scale
            # optimization_barriers serialize the m / v / update chains:
            # without them XLA horizontally fuses the three same-shape
            # elementwise loops into ONE interleaved f32[N,3] intermediate
            # and tiles it T(8,128) — 3 lanes padded to 128, a 23 GB
            # allocation at flagship params (measured OOM 2026-08-20).
            # Three separate (rows, 1024) passes cost ~3x180 MB of HBM
            # traffic instead.
            m = b1 * state["m"][g] + (1.0 - b1) * gv
            m, gv = jax.lax.optimization_barrier((m, gv))
            v = b2 * state["v"][g] + (1.0 - b2) * gv * gv
            v, m = jax.lax.optimization_barrier((v, m))
            step_lr = sched(state["count"], mults[g])
            upd = (m / bc1) / (jnp.sqrt(v / bc2) + eps)
            upd = upd + weight_decay * p_vecs[g].astype(jnp.float32)
            out_vecs[g] = -step_lr * upd
            new_m[g] = m
            new_v[g] = v
        return (
            _group_unravel(out_vecs, params),
            {"count": count, "m": new_m, "v": new_v},
        )

    return optax.GradientTransformation(init_fn, update_fn)


def make_lr_schedule(args, steps_per_epoch: int):
    """Reference main.py:334-339: OneCycle / MultiStep / StepLR."""
    base = float(args.lr)
    total_steps = int(args.epochs) * steps_per_epoch
    if getattr(args, "onecyclelr", False):
        return optax.cosine_onecycle_schedule(
            transition_steps=total_steps, peak_value=base, pct_start=0.2
        )
    if getattr(args, "multi_step_lr", False):
        bounds = {
            int(e) * steps_per_epoch: 0.1 for e in args.lr_drop_list
        }
        return optax.piecewise_constant_schedule(base, bounds)
    return optax.piecewise_constant_schedule(
        base, {int(args.lr_drop) * steps_per_epoch: 0.1}
    )
