#!/usr/bin/env python3
"""Training/eval driver (reference main.py CLI surface, TPU-native runtime).

    python main.py -c open_groundingdino_tpu/config/cfg_coco.py \
        --datasets datasets.json --output_dir out [--eval] \
        [--pretrain_model_path ckpt.pth] [--vocab vocab.txt] \
        [--options lr=1e-4 batch_size=8]

datasets.json manifest (reference config/datasets_mixed_odvg.json shape):
    {"train": [{"root": ..., "anno": ..., "label_map": ..., "dataset_mode": "odvg"}],
     "val":   [{"root": ..., "anno": ..., "dataset_mode": "coco"}]}
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import numpy as np


def get_args_parser():
    p = argparse.ArgumentParser("GroundingDINO-TPU", add_help=False)
    p.add_argument("--config_file", "-c", type=str, required=True)
    p.add_argument("--options", nargs="+", default=None,
                   help="override config keys: key=value ...")
    p.add_argument("--datasets", type=str, help="dataset manifest json")
    p.add_argument("--output_dir", default="output")
    p.add_argument("--eval", action="store_true")
    p.add_argument("--resume", default="", help="orbax checkpoint path")
    p.add_argument("--pretrain_model_path", default="",
                   help="torch .pth or orbax checkpoint to initialize from")
    p.add_argument("--finetune_ignore", type=str, nargs="+", default=None,
                   help="skip pretrain keys containing any of these keywords "
                        "(reference main.py:343-358, e.g. label_enc.weight "
                        "class_embed)")
    p.add_argument("--frozen_weights", type=str, default=None,
                   help="checkpoint whose params are loaded AND frozen "
                        "(reference main.py:338-341)")
    p.add_argument("--vocab", default="", help="bert vocab.txt path")
    p.add_argument("--stage_dir", default="",
                   help="stage dataset files to this node-local dir before "
                        "training (reference datasets/data_util.py "
                        "preparing_dataset; zips are extracted)")
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--num_workers", type=int, default=4)
    p.add_argument("--debug", action="store_true",
                   help="truncate loops after 15 iterations")
    return p


def build_datasets(manifest: dict, split: str, args, tokenizer):
    from open_groundingdino_tpu.data.coco import CocoDetection
    from open_groundingdino_tpu.data.odvg import ConcatDataset, ODVGDataset
    from open_groundingdino_tpu.data.transforms import EvalTransform, TrainTransform

    if split == "train":
        tf = TrainTransform(
            scales=args.data_aug_scales, max_size=args.data_aug_max_size,
            scales2_resize=args.data_aug_scales2_resize,
            scales2_crop=args.data_aug_scales2_crop,
        )
    else:
        tf = EvalTransform(args.eval_shortest_edge, args.eval_max_size)

    parts = []
    for entry in manifest[split]:
        mode = entry.get("dataset_mode", "coco")
        if mode == "coco":
            parts.append(CocoDetection(entry["root"], entry["anno"], transform=tf))
        elif mode == "odvg":
            parts.append(
                ODVGDataset(
                    entry["root"], entry["anno"], entry.get("label_map"),
                    max_labels=args.max_labels, transform=tf,
                )
            )
        else:
            raise ValueError(f"unknown dataset_mode {mode}")
    return parts[0] if len(parts) == 1 else ConcatDataset(parts)


def main(cli):
    from open_groundingdino_tpu.config import SLConfig
    from open_groundingdino_tpu.config.slconfig import parse_override_value
    from open_groundingdino_tpu.data.loader import Collator, DataLoader
    from open_groundingdino_tpu.data.tokenization import build_tokenizer
    from open_groundingdino_tpu.engine import evaluate_coco, train_one_epoch
    from open_groundingdino_tpu.models.criterion import SetCriterion
    import open_groundingdino_tpu.models.groundingdino  # noqa: F401 — registers 'groundingdino'
    from open_groundingdino_tpu.models.registry import build_model_main
    from open_groundingdino_tpu.models.postprocess import PostProcess
    from open_groundingdino_tpu.parallel.mesh import make_mesh, replicate_tree
    from open_groundingdino_tpu.parallel.optim import make_lr_schedule, make_optimizer
    from open_groundingdino_tpu.parallel.train_state import (
        TrainState, make_eval_step, make_train_step,
    )
    from open_groundingdino_tpu.utils import checkpoint as ckpt_utils
    from open_groundingdino_tpu.utils.ema import BestMetricHolder
    from open_groundingdino_tpu.utils.logger import setup_logger

    # multi-host: initialize the JAX distributed runtime before first device
    # use (reference util/misc.py:520-558 init_distributed_mode).  Env-gated:
    # single-host runs (and the CPU test mesh) skip it.
    #   JAX_MULTIHOST=1            -> initialize() with auto-detection (TPU
    #                                 pod metadata / cloud environment)
    #   JAX_COORDINATOR_ADDRESS=.. -> explicit rendezvous (the reference's
    #                                 env:// MASTER_ADDR path)
    if os.environ.get("JAX_COORDINATOR_ADDRESS"):
        jax.distributed.initialize(
            coordinator_address=os.environ["JAX_COORDINATOR_ADDRESS"],
            num_processes=int(os.environ.get("JAX_NUM_PROCESSES", "1")),
            process_id=int(os.environ.get("JAX_PROCESS_ID", "0")),
        )
    elif os.environ.get("JAX_MULTIHOST"):
        jax.distributed.initialize()

    args = SLConfig.fromfile(cli.config_file)
    if cli.options:
        args.merge_from_dict(
            {
                kv.split("=", 1)[0]: parse_override_value(kv.split("=", 1)[1])
                for kv in cli.options
            }
        )
    # fail fast on malformed numeric overrides (--options epochs=abc would
    # otherwise surface minutes later, after the first compile)
    for key in ("epochs", "batch_size", "num_queries", "max_text_len",
                "max_gt_boxes", "save_checkpoint_interval"):
        int(args.get(key))
    for key in ("lr", "lr_backbone", "weight_decay", "clip_max_norm"):
        float(args.get(key))

    os.makedirs(cli.output_dir, exist_ok=True)
    args.dump(os.path.join(cli.output_dir, "config_cfg.py"))
    logger = setup_logger(cli.output_dir, process_index=jax.process_index())
    logger.info(f"devices: {jax.devices()}")
    logger.info(f"config: {cli.config_file} output: {cli.output_dir}")

    if not cli.vocab:
        raise SystemExit("--vocab path to bert vocab.txt is required")
    tokenizer = build_tokenizer(cli.vocab)

    # reference main.py:85-92 build_model_main: dispatch through the
    # name->builder registry so alternate model families plug in by config
    model = build_model_main(args)
    crit = SetCriterion(
        num_queries=args.num_queries,
        cost_class=args.set_cost_class, cost_bbox=args.set_cost_bbox,
        cost_giou=args.set_cost_giou, cls_loss_coef=args.cls_loss_coef,
        bbox_loss_coef=args.bbox_loss_coef, giou_loss_coef=args.giou_loss_coef,
        interm_loss_coef=args.interm_loss_coef,
        focal_alpha=args.focal_alpha, focal_gamma=args.focal_gamma,
        matcher_type=str(getattr(args, "matcher_type", "HungarianMatcher")),
    )

    with open(cli.datasets) as f:
        manifest = json.load(f)
    if cli.stage_dir:
        # node-local dataset staging (reference datasets/data_util.py:117-169
        # preparing_dataset): copy/unzip to local disk once per host, then
        # barrier so no process reads a half-staged copy
        from open_groundingdino_tpu.data.staging import stage_datasets

        manifest, copyfilelist = stage_datasets(manifest, cli.stage_dir)
        if jax.process_count() > 1:
            from jax.experimental import multihost_utils

            multihost_utils.sync_global_devices("dataset_staging")
        logger.info(f"staged {len(copyfilelist)} dataset paths to "
                    f"{cli.stage_dir}")

    collator = Collator(
        tokenizer, args.image_buckets, args.max_text_len, args.max_gt_boxes,
        u8_images=bool(getattr(args, "u8_images", False)),
    )
    mesh = make_mesh()
    max_steps = 15 if cli.debug else None
    # reference batch_size is per device (per-GPU); the jitted step consumes
    # the per-process global batch sharded over the mesh
    global_batch = int(args.batch_size) * jax.local_device_count()

    # ---- initialize params -------------------------------------------------
    val_dataset = build_datasets(manifest, "val", args, tokenizer)
    sample_batch = collator([val_dataset[0]])
    init_inputs = {
        k: sample_batch[k]
        for k in ("images", "image_sizes", "input_ids", "text_token_mask",
                  "position_ids", "text_self_attention_masks")
    }
    # converter geometry depends on the backbone family (inference.py:85-100)
    if str(args.backbone).startswith("resnet"):
        from open_groundingdino_tpu.models.resnet import RESNET_VARIANTS

        depths = tuple(RESNET_VARIANTS[args.backbone]["depths"])
    else:
        from open_groundingdino_tpu.models.swin import SWIN_VARIANTS

        depths = tuple(SWIN_VARIANTS[args.backbone]["depths"])
    convert_kwargs = dict(
        swin_depths=depths,
        out_indices=tuple(args.return_interm_indices),
        num_feature_levels=args.num_feature_levels,
        enc_layers=args.enc_layers, dec_layers=args.dec_layers,
        bert_layers=int(getattr(args, "bert_layers", 12)),
    )

    pretrain_path = cli.frozen_weights or cli.pretrain_model_path
    if pretrain_path.endswith((".pth", ".pt")):
        sd = ckpt_utils.load_torch_state_dict(pretrain_path)
        if cli.finetune_ignore:
            # keyword filter, reference main.py:343-358 check_keep: ignored
            # keys keep their fresh init (the reference's strict=False load)
            fresh = jax.jit(model.init)(
                jax.random.PRNGKey(cli.seed), **init_inputs
            )["params"]
            params = ckpt_utils.convert_with_ignore(
                sd, cli.finetune_ignore, fresh, **convert_kwargs
            )
            logger.info(f"finetune_ignore: {cli.finetune_ignore}")
        else:
            params = ckpt_utils.convert_groundingdino_checkpoint(
                sd, **convert_kwargs
            )
        logger.info(f"loaded torch pretrain {pretrain_path}")
    else:
        params = jax.jit(model.init)(jax.random.PRNGKey(cli.seed), **init_inputs)["params"]
        if pretrain_path:
            restored = ckpt_utils.restore_checkpoint(pretrain_path)
            # adapt between per-layer and ENC_SCAN stacked encoder layouts
            # so orbax pretrains compose with the scan gate (ADVICE r4)
            params = ckpt_utils.adapt_encoder_layout(
                restored.get("params", restored)
            )

    # ---- eval-only ----------------------------------------------------------
    cat_list = getattr(val_dataset, "cat_list", None) or args.label_list
    postprocessor = PostProcess(
        tokenizer, cat_list, num_select=args.num_select,
        max_text_len=args.max_text_len,
        nms_iou_threshold=args.nms_iou_threshold,
    )
    eval_loader = DataLoader(
        val_dataset, collator, batch_size=global_batch,
        process_index=jax.process_index(), process_count=jax.process_count(),
        num_threads=cli.num_workers,
    )
    # bf16 compute by default (cfg compute_dtype), fp32 numerics in the
    # checkpoint; eval runs the criterion too so epoch logs carry val loss
    # (reference engine_multi.py:781-800 runs criterion during eval)
    import jax.numpy as jnp

    compute_dtype = {
        "bfloat16": jnp.bfloat16, "float32": None, "fp32": None,
    }.get(str(getattr(args, "compute_dtype", "bfloat16")), jnp.bfloat16)
    eval_step = jax.jit(
        make_eval_step(model, criterion=crit, compute_dtype=compute_dtype)
    )

    if cli.eval:
        params = replicate_tree(params, mesh)
        stats = evaluate_coco(
            eval_step, params, eval_loader, mesh, postprocessor,
            val_dataset.coco, val_dataset.contiguous_to_catid, logger,
            max_steps=max_steps, precast_dtype=compute_dtype,
        )
        with open(os.path.join(cli.output_dir, "eval_stats.json"), "w") as f:
            json.dump(stats, f, indent=2)
        return

    # ---- train ---------------------------------------------------------------
    train_dataset = build_datasets(manifest, "train", args, tokenizer)
    train_loader = DataLoader(
        train_dataset, collator, batch_size=global_batch, shuffle=True,
        seed=cli.seed, process_index=jax.process_index(),
        process_count=jax.process_count(), num_threads=cli.num_workers,
    )
    steps_per_epoch = max(len(train_loader), 1)
    schedule = make_lr_schedule(args, steps_per_epoch)
    frozen_keys = tuple(args.freeze_keywords or ())
    if cli.frozen_weights:
        # reference main.py:338-341: with --frozen_weights only the head
        # that is NOT in the loaded checkpoint trains; freezing everything
        # the checkpoint provided is the strict equivalent here
        frozen_keys = frozen_keys + ("backbone", "bert", "transformer",
                                     "feat_map", "input_proj")
        logger.info("frozen_weights: loaded params frozen")
    tx = make_optimizer(
        params, lr=schedule, base_lr=float(args.lr),
        lr_backbone=float(args.lr_backbone),
        lr_linear_proj_mult=float(args.lr_linear_proj_mult),
        weight_decay=float(args.weight_decay),
        clip_max_norm=float(args.clip_max_norm),
        frozen_keys=frozen_keys,
    )
    use_ema = bool(getattr(args, "use_ema", False))
    state = TrainState.create(params, tx, use_ema=use_ema)

    start_epoch = 0
    resume_path = cli.resume or ckpt_utils.latest_checkpoint(cli.output_dir)
    if resume_path:
        cur = jax.device_get(state)
        try:
            restored = ckpt_utils.restore_checkpoint(
                resume_path, {"state": cur, "epoch": 0}
            )
            state = restored["state"]
        except Exception:
            try:
                # checkpoints written before TrainState grew nonfinite_count
                # lack that leaf; restore against the legacy structure and
                # reinitialize the counter
                legacy = cur.replace(nonfinite_count=None)
                restored = ckpt_utils.restore_checkpoint(
                    resume_path, {"state": legacy, "epoch": 0}
                )
                state = restored["state"].replace(
                    nonfinite_count=jnp.zeros((), jnp.int32)
                )
            except Exception:
                # checkpoint written in the other encoder param layout
                # (ENC_SCAN gate flipped between runs, ADVICE r4): restore
                # against the opposite-layout template, adapt back
                cur_scan = os.environ.get("ENC_SCAN", "0") == "1"
                other = ckpt_utils.adapt_train_state_layout(
                    cur, enc_scan=not cur_scan
                )
                restored = ckpt_utils.restore_checkpoint(
                    resume_path, {"state": other, "epoch": 0}
                )
                state = ckpt_utils.adapt_train_state_layout(
                    restored["state"], enc_scan=cur_scan
                )
                logger.info("resume: adapted encoder param layout "
                            f"(ENC_SCAN={int(cur_scan)})")
        start_epoch = int(restored["epoch"]) + 1
        logger.info(f"resumed from {resume_path} at epoch {start_epoch}")

    state = replicate_tree(state, mesh)
    step_kwargs = dict(
        compute_dtype=compute_dtype,
        ema_decay=float(getattr(args, "ema_decay", 0.9997)) if use_ema else 0.0,
        dropout_seed=cli.seed,
    )
    train_step = jax.jit(
        make_train_step(model, crit, **step_kwargs), donate_argnums=(0,)
    )
    # steps_per_call > 1: lax.scan N optimizer steps per device dispatch
    # (parallel/train_state.make_multi_train_step) — measured -10% wall
    # per step at bench shapes (BENCH_NOTES 2026-08-19)
    steps_per_call = int(getattr(args, "steps_per_call", 1))
    multi_step = None
    if steps_per_call > 1:
        from open_groundingdino_tpu.parallel.train_state import (
            make_multi_train_step,
        )
        multi_step = jax.jit(
            make_multi_train_step(model, crit, steps_per_call, **step_kwargs),
            donate_argnums=(0,),
        )

    best = BestMetricHolder(use_ema=use_ema)
    for epoch in range(start_epoch, int(args.epochs)):
        train_loader.set_epoch(epoch)
        t0 = time.time()
        state, stats = train_one_epoch(
            train_step, state, train_loader, mesh, epoch, logger,
            max_steps=max_steps,
            multi_step=multi_step, steps_per_call=steps_per_call,
        )
        logger.info(f"epoch {epoch} train stats: {stats} ({time.time()-t0:.1f}s)")

        if jax.process_index() == 0 and (
            (epoch + 1) % int(args.save_checkpoint_interval) == 0
            or epoch == int(args.epochs) - 1
        ):
            ckpt_utils.save_checkpoint(
                cli.output_dir, epoch,
                {"state": jax.device_get(state), "epoch": epoch},
            )

        eval_stats = evaluate_coco(
            eval_step, state.params, eval_loader, mesh, postprocessor,
            val_dataset.coco, val_dataset.contiguous_to_catid, logger,
            max_steps=max_steps, precast_dtype=compute_dtype,
        )
        if best.update(float(eval_stats.get("AP", -1.0)), epoch) and (
            jax.process_index() == 0
        ):
            ckpt_utils.save_checkpoint(
                os.path.join(cli.output_dir, "best"), 0,
                {"state": jax.device_get(state), "epoch": epoch},
            )
            logger.info(f"new best AP {best.best_all:.4f} at epoch {epoch}")
        ema_stats = {}
        if use_ema and state.ema_params is not None:
            # second eval pass on the EMA weights (reference main.py:481-494)
            ema_raw = evaluate_coco(
                eval_step, state.ema_params, eval_loader, mesh, postprocessor,
                val_dataset.coco, val_dataset.contiguous_to_catid, logger,
                max_steps=max_steps, precast_dtype=compute_dtype,
            )
            ema_stats = {f"ema_{k}": v for k, v in ema_raw.items()}
            if best.update(
                float(ema_raw.get("AP", -1.0)), epoch, is_ema=True
            ) and jax.process_index() == 0:
                ckpt_utils.save_checkpoint(
                    os.path.join(cli.output_dir, "best_ema"), 0,
                    {"state": jax.device_get(state), "epoch": epoch},
                )
                logger.info(f"new best EMA AP {best.best_ema:.4f}")
        with open(os.path.join(cli.output_dir, "log.txt"), "a") as f:
            f.write(
                json.dumps({"epoch": epoch, **stats, **eval_stats,
                            **ema_stats, "best_AP": best.best_all}) + "\n"
            )


if __name__ == "__main__":
    parser = argparse.ArgumentParser(
        "GroundingDINO-TPU training/eval", parents=[get_args_parser()]
    )
    main(parser.parse_args())
