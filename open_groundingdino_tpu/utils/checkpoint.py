"""Checkpoint save/resume (Orbax) + published-PyTorch-checkpoint ingestion.

Save format: {params, opt_state, step, epoch} per save_checkpoint_interval,
auto-resume from the latest checkpoint in output_dir — the semantics of
reference main.py:348-381 / util/utils.py:22-28, with Orbax replacing
torch.save.
"""
from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax
import numpy as np


def _ocp():
    import orbax.checkpoint as ocp

    return ocp


def save_checkpoint(ckpt_dir: str, step: int, payload: Dict[str, Any]) -> None:
    ocp = _ocp()
    path = os.path.join(os.path.abspath(ckpt_dir), f"checkpoint_{step}")
    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(path, jax.device_get(payload), force=True)


def latest_checkpoint(ckpt_dir: str) -> Optional[str]:
    if not os.path.isdir(ckpt_dir):
        return None
    steps = []
    for name in os.listdir(ckpt_dir):
        if name.startswith("checkpoint_"):
            try:
                steps.append(int(name.split("_")[-1]))
            except ValueError:
                pass
    if not steps:
        return None
    return os.path.join(ckpt_dir, f"checkpoint_{max(steps)}")


def restore_checkpoint(path: str, template: Optional[Dict] = None) -> Dict:
    ocp = _ocp()
    with ocp.PyTreeCheckpointer() as ckptr:
        if template is not None:
            return ckptr.restore(path, item=jax.device_get(template))
        return ckptr.restore(path)


# ---------------------------------------------------------------------------
# PyTorch GroundingDINO checkpoint -> full framework params
# ---------------------------------------------------------------------------

def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Load a torch .pth checkpoint into numpy (CPU, no grad), applying
    clean_state_dict (strip 'module.') and unwrapping {'model': ...}."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt.get("model", ckpt) if isinstance(ckpt, dict) else ckpt
    out = {}
    for k, v in sd.items():
        if k.startswith("module."):
            k = k[len("module."):]
        if hasattr(v, "detach"):
            out[k] = v.detach().cpu().numpy()
    return out


def convert_groundingdino_checkpoint(
    sd: Dict[str, np.ndarray],
    swin_depths=(2, 2, 6, 2),
    out_indices=(1, 2, 3),
    num_feature_levels: int = 4,
    enc_layers: int = 6,
    dec_layers: int = 6,
    bert_layers: int = 12,
    enc_scan: Optional[bool] = None,
) -> Dict:
    """Map a published GroundingDINO state_dict (keys per reference
    groundingdino.py/transformer.py module names) onto this framework's
    parameter tree.  The returned tree is in whatever encoder layout the
    current process expects (adapt_encoder_layout reads the ENC_SCAN env
    var), so loading a reference checkpoint composes with the scan gate."""
    from . import torch_convert as tc

    p: Dict = {}

    # --- text tower ---
    bert_sd = tc.strip_prefix(sd, "bert.")
    p["bert"] = tc.convert_bert_state_dict(bert_sd, num_layers=bert_layers)
    p["feat_map"] = tc.linear(sd, "feat_map")

    # --- backbone ---
    if any(k.startswith("backbone.0.body.layer1.") for k in sd):
        # ResNet trunk (reference wraps torchvision in BackboneBase.body)
        rn_sd = tc.strip_prefix(sd, "backbone.0.body.")
        p["backbone"] = tc.convert_resnet_state_dict(rn_sd, swin_depths)
    else:
        swin_sd = tc.strip_prefix(sd, "backbone.0.")
        p["backbone"] = tc.convert_swin_state_dict(swin_sd, swin_depths, out_indices)

    # --- input projections (Sequential: .0 conv, .1 groupnorm) ---
    for l in range(num_feature_levels):
        p[f"input_proj_{l}_conv"] = tc.conv2d(sd, f"input_proj.{l}.0")
        p[f"input_proj_{l}_gn"] = {
            "scale": tc._t(sd[f"input_proj.{l}.1.weight"]),
            "bias": tc._t(sd[f"input_proj.{l}.1.bias"]),
        }

    # --- transformer ---
    t: Dict = {
        "level_embed": tc._t(sd["transformer.level_embed"]),
        "tgt_embed": tc._t(sd["transformer.tgt_embed.weight"]),
        "enc_output": tc.linear(sd, "transformer.enc_output"),
        "enc_output_norm": tc.layernorm(sd, "transformer.enc_output_norm"),
    }

    def mha(prefix):
        # our MultiHeadAttention stores in_proj_weight in torch layout (3E, E)
        return {
            "in_proj_weight": tc._t(sd[f"{prefix}.in_proj_weight"]),
            "in_proj_bias": tc._t(sd[f"{prefix}.in_proj_bias"]),
            "out_proj": tc.linear(sd, f"{prefix}.out_proj"),
        }

    def msdeform(prefix):
        return {
            "value_proj": tc.linear(sd, f"{prefix}.value_proj"),
            "sampling_offsets": tc.linear(sd, f"{prefix}.sampling_offsets"),
            "attention_weights": tc.linear(sd, f"{prefix}.attention_weights"),
            "output_proj": tc.linear(sd, f"{prefix}.output_proj"),
        }

    def mlp(prefix, n):
        return {
            f"layers_{i}": tc.linear(sd, f"{prefix}.layers.{i}") for i in range(n)
        }

    for i in range(enc_layers):
        pre = f"transformer.encoder.layers.{i}"
        t[f"enc_layer_{i}"] = {
            "self_attn": msdeform(f"{pre}.self_attn"),
            "norm1": tc.layernorm(sd, f"{pre}.norm1"),
            "linear1": tc.linear(sd, f"{pre}.linear1"),
            "linear2": tc.linear(sd, f"{pre}.linear2"),
            "norm2": tc.layernorm(sd, f"{pre}.norm2"),
        }
        fpre = f"transformer.encoder.fusion_layers.{i}"
        t[f"fusion_{i}"] = {
            "layer_norm_v": tc.layernorm(sd, f"{fpre}.layer_norm_v"),
            "layer_norm_l": tc.layernorm(sd, f"{fpre}.layer_norm_l"),
            "gamma_v": tc._t(sd[f"{fpre}.gamma_v"]),
            "gamma_l": tc._t(sd[f"{fpre}.gamma_l"]),
            "attn": {
                name: tc.linear(sd, f"{fpre}.attn.{name}")
                for name in (
                    "v_proj", "l_proj", "values_v_proj", "values_l_proj",
                    "out_v_proj", "out_l_proj",
                )
            },
        }
        tpre = f"transformer.encoder.text_layers.{i}"
        t[f"text_layer_{i}"] = {
            "self_attn": mha(f"{tpre}.self_attn"),
            "linear1": tc.linear(sd, f"{tpre}.linear1"),
            "linear2": tc.linear(sd, f"{tpre}.linear2"),
            "norm1": tc.layernorm(sd, f"{tpre}.norm1"),
            "norm2": tc.layernorm(sd, f"{tpre}.norm2"),
        }

    for i in range(dec_layers):
        pre = f"transformer.decoder.layers.{i}"
        t[f"dec_layer_{i}"] = {
            "cross_attn": msdeform(f"{pre}.cross_attn"),
            "norm1": tc.layernorm(sd, f"{pre}.norm1"),
            "ca_text": mha(f"{pre}.ca_text"),
            "catext_norm": tc.layernorm(sd, f"{pre}.catext_norm"),
            "self_attn": mha(f"{pre}.self_attn"),
            "norm2": tc.layernorm(sd, f"{pre}.norm2"),
            "linear1": tc.linear(sd, f"{pre}.linear1"),
            "linear2": tc.linear(sd, f"{pre}.linear2"),
            "norm3": tc.layernorm(sd, f"{pre}.norm3"),
        }

    t["ref_point_head"] = mlp("transformer.decoder.ref_point_head", 2)
    t["dec_norm"] = tc.layernorm(sd, "transformer.decoder.norm")
    # shared box head: bbox_embed.0 == transformer.decoder.bbox_embed.0 (shared)
    t["bbox_embed"] = mlp("bbox_embed.0", 3)
    # two-stage enc box head (NOT shared in config: separate weights)
    t["enc_out_bbox_embed"] = mlp("transformer.enc_out_bbox_embed", 3)

    p["transformer"] = t
    return adapt_encoder_layout(p, enc_scan=enc_scan)


def export_groundingdino_checkpoint(params: Dict) -> Dict[str, np.ndarray]:
    """Inverse of convert_groundingdino_checkpoint: map this framework's
    parameter tree back to a reference-named torch-layout state_dict, so
    TPU-trained weights can be loaded by the upstream PyTorch code (its
    tools load with `strict=False` after clean_state_dict — reference
    tools/inference_on_a_image.py:84-87 — so buffers the reference
    recomputes, e.g. Swin relative_position_index and the frozen BERT
    pooler, are legitimately absent here).

    The shared decoder box head is emitted under every alias the reference
    model registers (`bbox_embed.{i}` and `transformer.decoder.bbox_embed.{i}`
    for all layers — groundingdino.py:173-182 shares one MLP), so the
    export loads cleanly whichever alias downstream code indexes.  Layer
    counts / depths / out_indices are derived from the tree itself.

    Accepts either encoder param layout: an ENC_SCAN-trained tree (stacked
    'enc_scan' subtree) is unstacked to per-layer form first (ADVICE r4)."""
    from . import torch_convert as tc

    params = adapt_encoder_layout(params, enc_scan=False)
    sd: Dict[str, np.ndarray] = {}

    sd.update(tc.export_bert_state_dict(params["bert"], prefix="bert."))
    tc.rlinear(sd, "feat_map", params["feat_map"])

    bb = params["backbone"]
    if "patch_embed" in bb:
        sd.update(tc.export_swin_state_dict(bb, prefix="backbone.0."))
    else:
        sd.update(tc.export_resnet_state_dict(bb, prefix="backbone.0.body."))

    for name in sorted(k for k in params if k.startswith("input_proj_")):
        l = name.split("_")[2]
        if name.endswith("_conv"):
            tc.rconv2d(sd, f"input_proj.{l}.0", params[name])
        else:
            sd[f"input_proj.{l}.1.weight"] = np.asarray(params[name]["scale"])
            sd[f"input_proj.{l}.1.bias"] = np.asarray(params[name]["bias"])

    t = params["transformer"]
    sd["transformer.level_embed"] = np.asarray(t["level_embed"])
    sd["transformer.tgt_embed.weight"] = np.asarray(t["tgt_embed"])
    tc.rlinear(sd, "transformer.enc_output", t["enc_output"])
    tc.rlayernorm(sd, "transformer.enc_output_norm", t["enc_output_norm"])

    def mha(prefix, tree):
        sd[f"{prefix}.in_proj_weight"] = np.asarray(tree["in_proj_weight"])
        sd[f"{prefix}.in_proj_bias"] = np.asarray(tree["in_proj_bias"])
        tc.rlinear(sd, f"{prefix}.out_proj", tree["out_proj"])

    def msdeform(prefix, tree):
        for k in ("value_proj", "sampling_offsets", "attention_weights",
                  "output_proj"):
            tc.rlinear(sd, f"{prefix}.{k}", tree[k])

    def mlp(prefix, tree):
        for name, sub in tree.items():
            tc.rlinear(sd, f"{prefix}.layers.{name.split('_')[-1]}", sub)

    enc_ids = sorted(
        int(k.split("_")[-1]) for k in t if k.startswith("enc_layer_")
    )
    for i in enc_ids:
        e = t[f"enc_layer_{i}"]
        pre = f"transformer.encoder.layers.{i}"
        msdeform(f"{pre}.self_attn", e["self_attn"])
        for n in ("norm1", "norm2"):
            tc.rlayernorm(sd, f"{pre}.{n}", e[n])
        for n in ("linear1", "linear2"):
            tc.rlinear(sd, f"{pre}.{n}", e[n])
        f = t[f"fusion_{i}"]
        fpre = f"transformer.encoder.fusion_layers.{i}"
        tc.rlayernorm(sd, f"{fpre}.layer_norm_v", f["layer_norm_v"])
        tc.rlayernorm(sd, f"{fpre}.layer_norm_l", f["layer_norm_l"])
        sd[f"{fpre}.gamma_v"] = np.asarray(f["gamma_v"])
        sd[f"{fpre}.gamma_l"] = np.asarray(f["gamma_l"])
        for k in ("v_proj", "l_proj", "values_v_proj", "values_l_proj",
                  "out_v_proj", "out_l_proj"):
            tc.rlinear(sd, f"{fpre}.attn.{k}", f["attn"][k])
        tl = t[f"text_layer_{i}"]
        tpre = f"transformer.encoder.text_layers.{i}"
        mha(f"{tpre}.self_attn", tl["self_attn"])
        for n in ("linear1", "linear2"):
            tc.rlinear(sd, f"{tpre}.{n}", tl[n])
        for n in ("norm1", "norm2"):
            tc.rlayernorm(sd, f"{tpre}.{n}", tl[n])

    dec_ids = sorted(
        int(k.split("_")[-1]) for k in t if k.startswith("dec_layer_")
    )
    for i in dec_ids:
        d = t[f"dec_layer_{i}"]
        pre = f"transformer.decoder.layers.{i}"
        msdeform(f"{pre}.cross_attn", d["cross_attn"])
        mha(f"{pre}.ca_text", d["ca_text"])
        mha(f"{pre}.self_attn", d["self_attn"])
        for n in ("norm1", "catext_norm", "norm2", "norm3"):
            tc.rlayernorm(sd, f"{pre}.{n}", d[n])
        for n in ("linear1", "linear2"):
            tc.rlinear(sd, f"{pre}.{n}", d[n])

    mlp("transformer.decoder.ref_point_head", t["ref_point_head"])
    tc.rlayernorm(sd, "transformer.decoder.norm", t["dec_norm"])
    # shared decoder box head: every alias the reference registers
    for i in dec_ids:
        mlp(f"bbox_embed.{i}", t["bbox_embed"])
        mlp(f"transformer.decoder.bbox_embed.{i}", t["bbox_embed"])
    mlp("transformer.enc_out_bbox_embed", t["enc_out_bbox_embed"])
    return sd


_ENC_SCAN_BASES = ("fusion", "text_layer", "enc_layer")


def stack_encoder_scan_params(transformer_params: Dict, n_layers: int) -> Dict:
    """Per-layer encoder params (fusion_{i} / text_layer_{i} / enc_layer_{i})
    -> the ENC_SCAN=1 stacked layout (one 'enc_scan' subtree whose leaves
    carry a leading n_layers axis).  Inverse: unstack_encoder_scan_params."""
    out = {
        k: v for k, v in transformer_params.items()
        if not any(
            k.startswith(f"{b}_") and k[len(b) + 1:].isdigit()
            for b in _ENC_SCAN_BASES
        )
    }
    scan: Dict = {}
    for base in _ENC_SCAN_BASES:
        per = [
            transformer_params.get(f"{base}_{i}") for i in range(n_layers)
        ]
        if per[0] is None:
            continue
        scan[base] = jax.tree_util.tree_map(
            lambda *xs: np.stack([np.asarray(x) for x in xs]), *per
        )
    out["enc_scan"] = scan
    return out


def unstack_encoder_scan_params(transformer_params: Dict) -> Dict:
    """ENC_SCAN stacked layout -> per-layer fusion_{i}/text_layer_{i}/
    enc_layer_{i} subtrees (the converter/exporter layout)."""
    out = {k: v for k, v in transformer_params.items() if k != "enc_scan"}
    scan = transformer_params.get("enc_scan", {})
    for base, tree in scan.items():
        n = jax.tree_util.tree_leaves(tree)[0].shape[0]
        for i in range(n):
            out[f"{base}_{i}"] = jax.tree_util.tree_map(
                lambda x: np.asarray(x)[i], tree
            )
    return out


def _adapt_tree(obj, to_scan: bool):
    """Recursively adapt every transformer-shaped dict in a pytree between
    the per-layer and ENC_SCAN stacked encoder layouts.  Works on params
    trees and on optimizer-moment trees (which mirror the param structure
    inside optax namedtuple states)."""
    if isinstance(obj, dict):
        keys = obj.keys()
        enc_ids = [
            int(k.split("_")[-1]) for k in keys
            if k.startswith("enc_layer_") and k.split("_")[-1].isdigit()
        ]
        if to_scan and enc_ids:
            return stack_encoder_scan_params(obj, 1 + max(enc_ids))
        if not to_scan and "enc_scan" in keys:
            return unstack_encoder_scan_params(obj)
        return {k: _adapt_tree(v, to_scan) for k, v in obj.items()}
    if isinstance(obj, tuple) and hasattr(obj, "_fields"):  # namedtuple
        return type(obj)(*(_adapt_tree(v, to_scan) for v in obj))
    if isinstance(obj, (list, tuple)):
        return type(obj)(_adapt_tree(v, to_scan) for v in obj)
    return obj


def adapt_encoder_layout(tree, enc_scan: Optional[bool] = None):
    """Adapt a params (or optimizer-state) pytree to the encoder param
    layout the current process expects (ADVICE r4: the ENC_SCAN=1 gate,
    models/transformer.py, uses a stacked 'enc_scan' subtree; checkpoints
    and the torch converter use per-layer fusion_{i}/text_layer_{i}/
    enc_layer_{i} subtrees).  enc_scan=None reads the ENC_SCAN env var —
    the same switch the model reads — so load paths compose with the gate
    automatically.  No-op when the tree is already in the target layout."""
    if enc_scan is None:
        enc_scan = os.environ.get("ENC_SCAN", "0") == "1"
    return _adapt_tree(tree, bool(enc_scan))


def adapt_train_state_layout(state, enc_scan: Optional[bool] = None):
    """adapt_encoder_layout over every param-structured field of a
    TrainState (params, ema_params, and the optimizer moment trees inside
    opt_state all mirror the param structure), so resuming a checkpoint
    written in the other encoder layout composes with the ENC_SCAN gate."""
    return state.replace(
        params=adapt_encoder_layout(state.params, enc_scan),
        opt_state=adapt_encoder_layout(state.opt_state, enc_scan),
        ema_params=(
            adapt_encoder_layout(state.ema_params, enc_scan)
            if state.ema_params is not None else None
        ),
    )


def save_torch_checkpoint(path: str, params: Dict, **meta) -> None:
    """Write params as a reference-compatible torch .pth:
    {"model": state_dict, **meta} — the container format the reference's
    loaders unwrap (main.py resume + tools).  Round-trips through
    load_torch_state_dict / convert_groundingdino_checkpoint."""
    import torch

    sd = {
        k: torch.from_numpy(np.ascontiguousarray(v))
        for k, v in export_groundingdino_checkpoint(jax.device_get(params)).items()
    }
    torch.save({"model": sd, **meta}, path)


def convert_with_ignore(
    sd: Dict[str, np.ndarray],
    ignore_keywords,
    fresh_params: Dict,
    **convert_kwargs,
) -> Dict:
    """convert_groundingdino_checkpoint with the reference's finetune_ignore
    semantics (reference main.py:343-358 check_keep + strict=False load):
    any param leaf sourced from a torch key containing an ignore keyword
    keeps its fresh initialization instead of the pretrain value.

    Mechanism: convert twice — once verbatim, once with ignored keys'
    arrays overwritten by a sentinel constant — and take the fresh leaf
    wherever the two conversions disagree.  This tracks torch-key->leaf
    provenance through arbitrary converter reshapes/transposes without
    instrumenting the converter.  (If a leaf mixes kept and ignored torch
    keys — e.g. a fused qkv — the whole leaf conservatively stays fresh.)
    """
    sentinel = np.float32(3.14159e33)
    marked = {
        k: (np.full_like(v, sentinel) if any(kw in k for kw in ignore_keywords)
            else v)
        for k, v in sd.items()
    }
    # diff at PER-LAYER granularity (enc_scan=False) so an ignored keyword
    # inside one encoder layer doesn't mark the whole stacked leaf fresh;
    # adapt to the process layout only after picking
    a = convert_groundingdino_checkpoint(sd, enc_scan=False, **convert_kwargs)
    b = convert_groundingdino_checkpoint(
        marked, enc_scan=False, **convert_kwargs
    )
    fresh_params = adapt_encoder_layout(
        jax.device_get(fresh_params), enc_scan=False
    )

    def pick(fresh, va, vb):
        va = np.asarray(va)
        return va if np.array_equal(va, np.asarray(vb)) else np.asarray(fresh)

    picked = jax.tree_util.tree_map(pick, fresh_params, a, b)
    return adapt_encoder_layout(picked)
