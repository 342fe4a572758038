"""Train state + jitted train/eval steps.

The reference's step = AMP forward, criterion with host Hungarian, scaled
backward, DDP all-reduce, grad clip, AdamW (engine_multi.py:353-593).
Here the entire step — forward, on-device Hungarian matching, losses,
gradients, clip, AdamW — is ONE jitted function; data parallelism comes
from sharded batch inputs over the mesh (no loss scaling needed in bf16).
"""
from __future__ import annotations

from functools import partial
from typing import Any, Callable, Dict, Tuple

import flax.struct
import jax
import jax.numpy as jnp
import optax


@flax.struct.dataclass
class TrainState:
    step: jnp.ndarray
    params: Any
    opt_state: Any
    tx: optax.GradientTransformation = flax.struct.field(pytree_node=False)
    # exponential moving average of params (reference util/utils.py:373-396
    # ModelEma); None unless use_ema is configured
    ema_params: Any = None
    # device-side count of steps whose loss/grads were non-finite; those
    # steps skip the update entirely, so params can never absorb a NaN even
    # though the host only inspects metrics every print_freq steps (the
    # reference guards every iteration, engine_multi.py:544-547 — this is
    # the sync-free equivalent)
    nonfinite_count: jnp.ndarray = None

    @classmethod
    def create(cls, params, tx, use_ema: bool = False):
        return cls(
            step=jnp.zeros((), jnp.int32),
            params=params,
            opt_state=tx.init(params),
            tx=tx,
            ema_params=jax.tree_util.tree_map(lambda x: x, params)
            if use_ema else None,
            nonfinite_count=jnp.zeros((), jnp.int32),
        )


MODEL_INPUT_KEYS = (
    "images", "image_sizes", "input_ids", "text_token_mask",
    "position_ids", "text_self_attention_masks",
)


def cast_floating(tree, dtype):
    """Cast float leaves (differentiable — gradients accumulate in the
    original dtype, giving fp32 master params with bf16 compute)."""
    return jax.tree_util.tree_map(
        lambda x: x.astype(dtype)
        if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating)
        else x,
        tree,
    )


def make_train_step(model, criterion, compute_dtype=None,
                    ema_decay: float = 0.0, dropout_seed: int = 0) -> Callable:
    """Returns train_step(state, batch) -> (state, metrics); jit it once.

    compute_dtype=jnp.bfloat16 enables mixed precision: params/optimizer stay
    fp32, the forward runs in bf16 (the decoder FFN/heads force fp32
    internally, mirroring the reference's AMP policy, transformer.py:871).
    No loss scaling — bf16 has fp32's exponent range.

    ema_decay > 0 updates state.ema_params each step (reference
    util/utils.py:373-396 ModelEma; requires TrainState.create(use_ema=True)).
    The forward runs non-deterministic (dropout / fusion droppath active,
    reference fuse_modules.py:281-283) keyed by fold_in(dropout_seed, step).
    """

    def train_step(state: TrainState, batch: Dict) -> Tuple[TrainState, Dict]:
        model_inputs = {k: batch[k] for k in MODEL_INPUT_KEYS}
        model_inputs = dict(
            model_inputs,
            images=_maybe_device_normalize(model_inputs["images"],
                                           model_inputs["image_sizes"]),
        )
        dropout_rng = jax.random.fold_in(
            jax.random.PRNGKey(dropout_seed), state.step
        )

        def loss_fn(params):
            p = params
            inputs = model_inputs
            if compute_dtype is not None:
                p = cast_floating(p, compute_dtype)
                inputs = dict(inputs, images=inputs["images"].astype(compute_dtype))
            out = model.apply(
                {"params": p}, **inputs, deterministic=False,
                rngs={"dropout": dropout_rng},
            )
            total, losses = criterion(
                out, batch["gt_boxes"], batch["gt_pos_maps"], batch["gt_valid"]
            )
            return total, losses

        (total, losses), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        from ..parallel.optim import safe_global_norm
        grad_norm = safe_global_norm(grads)
        # Per-step guard: a non-finite loss or gradient skips the whole
        # update (params/opt_state/EMA keep their previous values) and bumps
        # nonfinite_count, which the host checks at its logging cadence.
        finite = jnp.logical_and(jnp.isfinite(total), jnp.isfinite(grad_norm))
        grads = jax.tree_util.tree_map(
            lambda g: jnp.where(finite, g, jnp.zeros_like(g)), grads
        )
        updates, opt_state = state.tx.update(grads, state.opt_state, state.params)
        updates = jax.tree_util.tree_map(
            lambda u: jnp.where(finite, u, jnp.zeros_like(u)), updates
        )
        opt_state = jax.tree_util.tree_map(
            lambda new, old: jnp.where(finite, new, old)
            if hasattr(new, "dtype") else new,
            opt_state, state.opt_state,
        )
        params = optax.apply_updates(state.params, updates)
        metrics = dict(losses)
        metrics["loss"] = total
        metrics["grad_norm"] = grad_norm
        ema_params = state.ema_params
        if ema_params is not None and ema_decay > 0.0:
            from ..utils.ema import ema_update
            new_ema = ema_update(ema_params, params, ema_decay)
            # a skipped non-finite step must be a no-op for the EMA too —
            # otherwise it decays toward the (unchanged) params anyway
            ema_params = jax.tree_util.tree_map(
                lambda n, o: jnp.where(finite, n, o), new_ema, ema_params
            )
        new_state = state.replace(
            step=state.step + 1, params=params, opt_state=opt_state,
            ema_params=ema_params,
            nonfinite_count=state.nonfinite_count
            + (1 - finite.astype(jnp.int32)),
        )
        metrics["nonfinite_count"] = new_state.nonfinite_count
        return new_state, metrics

    return train_step


def make_multi_train_step(model, criterion, n_steps: int, **step_kwargs
                          ) -> Callable:
    """lax.scan over `n_steps` leading-axis-stacked batches: ONE device
    dispatch (and one host sync point) per n_steps optimizer updates.

    Amortizes per-execute host/runtime overhead — measured ~54 ms/step of
    wall-vs-device gap on the axon tunnel at bench shapes (562 ms device
    vs 616 ms wall, BENCH_NOTES 2026-08-19).  The per-step math is
    identical to make_train_step (the scan body IS that function, traced
    once): dropout stays keyed by the carried state.step, the non-finite
    guard applies per inner step, and metrics come back with a leading
    (n_steps,) axis so per-step logging is preserved.

    batches: a batch dict whose every leaf is stacked to (n_steps, ...).
    The reference has no equivalent (its DDP loop dispatches per step,
    main.py:259-261); this is TPU-native dispatch amortization.
    """
    step = make_train_step(model, criterion, **step_kwargs)

    def multi_step(state: TrainState, batches: Dict
                   ) -> Tuple[TrainState, Dict]:
        return jax.lax.scan(step, state, batches)

    return multi_step


def _maybe_device_normalize(images, image_sizes):
    """uint8 batches normalize ON DEVICE (ImageNet mean/std — identical
    math to data/transforms.normalize_image): the Collator's u8_images
    mode ships 3 bytes/pixel instead of 12, quartering the host->device
    input bandwidth of the eval pipeline (the measured bottleneck on
    bandwidth-constrained hosts — BENCH_NOTES 2026-08-20; the reference
    uploads normalized f32 from its dataloader).  The pad region is
    re-zeroed AFTER normalization so the result matches the f32 path
    exactly (which pads with 0 in normalized space, like the reference's
    NestedTensor).  Trace-time dtype dispatch: f32 batches pass through."""
    if images.dtype != jnp.uint8:
        return images
    from ..data.transforms import IMAGENET_MEAN, IMAGENET_STD

    x = images.astype(jnp.float32) / 255.0
    x = (x - jnp.asarray(IMAGENET_MEAN)) / jnp.asarray(IMAGENET_STD)
    B, H, W, _ = x.shape
    rows = jnp.arange(H)[None, :, None, None] < image_sizes[:, 0, None, None, None]
    cols = jnp.arange(W)[None, None, :, None] < image_sizes[:, 1, None, None, None]
    return jnp.where(rows & cols, x, 0.0)


def make_eval_step(model, criterion=None, compute_dtype=None) -> Callable:
    def eval_step(params, batch):
        model_inputs = {k: batch[k] for k in MODEL_INPUT_KEYS}
        model_inputs = dict(
            model_inputs,
            images=_maybe_device_normalize(model_inputs["images"],
                                           model_inputs["image_sizes"]),
        )
        if compute_dtype is not None:
            params = cast_floating(params, compute_dtype)
            model_inputs = dict(
                model_inputs,
                images=model_inputs["images"].astype(compute_dtype),
            )
        out = model.apply({"params": params}, **model_inputs)
        result = {
            "pred_logits": out["pred_logits"],
            "pred_boxes": out["pred_boxes"],
        }
        if criterion is not None and "gt_boxes" in batch:
            total, losses = criterion(
                out, batch["gt_boxes"], batch["gt_pos_maps"], batch["gt_valid"]
            )
            result["loss"] = total
            result["losses"] = losses
        return result

    return eval_step
