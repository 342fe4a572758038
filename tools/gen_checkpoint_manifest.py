#!/usr/bin/env python
"""Generate the reference-checkpoint key manifest (names + shapes).

Enumerates, from first principles, every tensor a PyTorch GroundingDINO
checkpoint saved by the reference contains — the `state_dict()` of the
model that `build_groundingdino` constructs (reference
models/GroundingDINO/groundingdino.py:55-214 + transformer.py:41-217 +
backbone/*), at a given config.  This is written from the reference
module DEFINITIONS, deliberately NOT from this repo's converter, so
tests/test_checkpoint_manifest.py can assert the converter maps 100% of
keys in both directions without circularity.

Manifest JSON schema:
  {"params":  {key: [shape...]},     # learnable tensors the converter
                                     # must consume / the exporter emit
   "ignored": {key: [shape...]},     # tensors legitimately not mapped:
                                     # frozen BERT pooler (reference
                                     # groundingdino.py:113-114) and
                                     # recomputed static buffers (Swin
                                     # relative_position_index,
                                     # swin_transformer.py:124)
   "aliases": {key: canonical_key}}  # shared modules registered under
                                     # several names (the shared decoder
                                     # box head, groundingdino.py:173-182)

Regenerate with:  python tools/gen_checkpoint_manifest.py
"""
from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

# -- shape rule helpers (torch layouts) --------------------------------------


def _linear(d, prefix, out_f, in_f, bias=True):
    d[f"{prefix}.weight"] = [out_f, in_f]
    if bias:
        d[f"{prefix}.bias"] = [out_f]


def _ln(d, prefix, c):
    d[f"{prefix}.weight"] = [c]
    d[f"{prefix}.bias"] = [c]


def _conv(d, prefix, out_c, in_c, k, bias=True):
    d[f"{prefix}.weight"] = [out_c, in_c, k, k]
    if bias:
        d[f"{prefix}.bias"] = [out_c]


def _mha(d, prefix, e):
    # torch.nn.MultiheadAttention packed projections
    d[f"{prefix}.in_proj_weight"] = [3 * e, e]
    d[f"{prefix}.in_proj_bias"] = [3 * e]
    _linear(d, f"{prefix}.out_proj", e, e)


def _msdeform(d, prefix, dm, heads, levels, points):
    # mmcv MultiScaleDeformableAttention (reference transformer.py:29 import;
    # same four projections as the local ms_deform_attn.py:137-363 module)
    _linear(d, f"{prefix}.sampling_offsets", heads * levels * points * 2, dm)
    _linear(d, f"{prefix}.attention_weights", heads * levels * points, dm)
    _linear(d, f"{prefix}.value_proj", dm, dm)
    _linear(d, f"{prefix}.output_proj", dm, dm)


def _mlp(d, prefix, dims):
    # reference utils.py:171-185 MLP: Linear chain dims[i] -> dims[i+1]
    for i in range(len(dims) - 1):
        _linear(d, f"{prefix}.layers.{i}", dims[i + 1], dims[i])


# -- towers ------------------------------------------------------------------


def bert_keys(params, ignored, layers=12, hidden=768, inter=3072,
              vocab=30522, max_pos=512, type_vocab=2):
    """HF bert-base-uncased inside BertModelWarper (bertwarper.py:17-166);
    pooler present-but-frozen (groundingdino.py:113-114)."""
    p = "bert.embeddings"
    params[f"{p}.word_embeddings.weight"] = [vocab, hidden]
    params[f"{p}.position_embeddings.weight"] = [max_pos, hidden]
    params[f"{p}.token_type_embeddings.weight"] = [type_vocab, hidden]
    _ln(params, f"{p}.LayerNorm", hidden)
    # registered buffer in transformers<4.31 checkpoints; absent in newer —
    # either way not a learnable tensor
    ignored["bert.embeddings.position_ids"] = [1, max_pos]
    for i in range(layers):
        pre = f"bert.encoder.layer.{i}"
        for n in ("query", "key", "value"):
            _linear(params, f"{pre}.attention.self.{n}", hidden, hidden)
        _linear(params, f"{pre}.attention.output.dense", hidden, hidden)
        _ln(params, f"{pre}.attention.output.LayerNorm", hidden)
        _linear(params, f"{pre}.intermediate.dense", inter, hidden)
        _linear(params, f"{pre}.output.dense", hidden, inter)
        _ln(params, f"{pre}.output.LayerNorm", hidden)
    _linear(ignored, "bert.pooler.dense", hidden, hidden)


def swin_keys(params, ignored, embed_dim, depths, num_heads, window_size,
              out_indices):
    """Reference backbone/swin_transformer.py:501-760 under the Joiner's
    'backbone.0.' prefix (backbone.py:146-159)."""
    pre = "backbone.0"
    _conv(params, f"{pre}.patch_embed.proj", embed_dim, 3, 4)
    _ln(params, f"{pre}.patch_embed.norm", embed_dim)
    for i, depth in enumerate(depths):
        dim = embed_dim * (2 ** i)
        for b in range(depth):
            bp = f"{pre}.layers.{i}.blocks.{b}"
            _ln(params, f"{bp}.norm1", dim)
            params[f"{bp}.attn.relative_position_bias_table"] = [
                (2 * window_size - 1) ** 2, num_heads[i]
            ]
            # static buffer, recomputed from window_size
            # (swin_transformer.py:111-124)
            ignored[f"{bp}.attn.relative_position_index"] = [
                window_size ** 2, window_size ** 2
            ]
            _linear(params, f"{bp}.attn.qkv", 3 * dim, dim)
            _linear(params, f"{bp}.attn.proj", dim, dim)
            _ln(params, f"{bp}.norm2", dim)
            _linear(params, f"{bp}.mlp.fc1", 4 * dim, dim)
            _linear(params, f"{bp}.mlp.fc2", dim, 4 * dim)
        if i < len(depths) - 1:
            # PatchMerging (swin_transformer.py:301-340): 4dim -> 2dim,
            # bias-free reduction
            dp = f"{pre}.layers.{i}.downsample"
            _linear(params, f"{dp}.reduction", 2 * dim, 4 * dim, bias=False)
            _ln(params, f"{dp}.norm", 4 * dim)
    for i in out_indices:
        _ln(params, f"{pre}.norm{i}", embed_dim * (2 ** i))


def resnet50_keys(params, depths=(3, 4, 6, 3)):
    """torchvision resnet50 under 'backbone.0.body.' (backbone.py:119-143);
    FrozenBatchNorm2d keeps weight/bias/running_mean/running_var as
    checkpoint tensors (backbone.py:33-70) and they ARE consumed (the
    frozen stats fold into the conv affine at load)."""
    pre = "backbone.0.body"

    def bn(prefix, c):
        for n in ("weight", "bias", "running_mean", "running_var"):
            params[f"{prefix}.{n}"] = [c]

    _conv(params, f"{pre}.conv1", 64, 3, 7, bias=False)
    bn(f"{pre}.bn1", 64)
    in_c = 64
    for li, depth in enumerate(depths):
        mid = 64 * (2 ** li)
        out = mid * 4
        for b in range(depth):
            bp = f"{pre}.layer{li + 1}.{b}"
            _conv(params, f"{bp}.conv1", mid, in_c if b == 0 else out, 1,
                  bias=False)
            bn(f"{bp}.bn1", mid)
            _conv(params, f"{bp}.conv2", mid, mid, 3, bias=False)
            bn(f"{bp}.bn2", mid)
            _conv(params, f"{bp}.conv3", out, mid, 1, bias=False)
            bn(f"{bp}.bn3", out)
            if b == 0:
                _conv(params, f"{bp}.downsample.0", out, in_c, 1, bias=False)
                bn(f"{bp}.downsample.1", out)
        in_c = out


# -- full model --------------------------------------------------------------


def reference_manifest(backbone="swin_T_224_1k", hidden_dim=256, nheads=8,
                       num_feature_levels=4, enc_layers=6, dec_layers=6,
                       dim_feedforward=2048, num_queries=900,
                       enc_n_points=4, dec_n_points=4,
                       return_interm_indices=(1, 2, 3)):
    params, ignored, aliases = {}, {}, {}
    dm = hidden_dim

    bert_keys(params, ignored)
    _linear(params, "feat_map", dm, 768)  # groundingdino.py:116-118

    if backbone == "resnet50":
        resnet50_keys(params)
        backbone_channels = [256 * (2 ** i) for i in return_interm_indices]
    else:
        from open_groundingdino_tpu.models.swin import SWIN_VARIANTS

        v = SWIN_VARIANTS[backbone]
        swin_keys(params, ignored, v["embed_dim"], v["depths"],
                  v["num_heads"], v["window_size"], return_interm_indices)
        backbone_channels = [
            v["embed_dim"] * (2 ** i) for i in return_interm_indices
        ]

    # input projections (groundingdino.py:126-155): 1x1 conv + GroupNorm per
    # backbone level, then 3x3 stride-2 convs for extra pyramid levels
    for l in range(num_feature_levels):
        if l < len(backbone_channels):
            in_c, k = backbone_channels[l], 1
        else:
            in_c, k = (backbone_channels[-1] if l == len(backbone_channels)
                       else dm), 3
        _conv(params, f"input_proj.{l}.0", dm, in_c, k)
        _ln(params, f"input_proj.{l}.1", dm)  # GroupNorm(32, dm)

    # transformer (transformer.py:41-217)
    params["transformer.level_embed"] = [num_feature_levels, dm]
    params["transformer.tgt_embed.weight"] = [num_queries, dm]  # :166
    _linear(params, "transformer.enc_output", dm, dm)           # :177
    _ln(params, "transformer.enc_output_norm", dm)

    for i in range(enc_layers):
        pre = f"transformer.encoder.layers.{i}"
        _msdeform(params, f"{pre}.self_attn", dm, nheads,
                  num_feature_levels, enc_n_points)
        _ln(params, f"{pre}.norm1", dm)
        _linear(params, f"{pre}.linear1", dim_feedforward, dm)
        _linear(params, f"{pre}.linear2", dm, dim_feedforward)
        _ln(params, f"{pre}.norm2", dm)
        # fusion (BiAttentionBlock, fuse_modules.py:99-295; embed_dim =
        # dim_feedforward // 2, heads = nheads // 2 — transformer.py:100-107)
        fe = dim_feedforward // 2
        fp = f"transformer.encoder.fusion_layers.{i}"
        _ln(params, f"{fp}.layer_norm_v", dm)
        _ln(params, f"{fp}.layer_norm_l", dm)
        params[f"{fp}.gamma_v"] = [dm]
        params[f"{fp}.gamma_l"] = [dm]
        for n in ("v_proj", "l_proj", "values_v_proj", "values_l_proj"):
            _linear(params, f"{fp}.attn.{n}", fe, dm)
        for n in ("out_v_proj", "out_l_proj"):
            _linear(params, f"{fp}.attn.{n}", dm, fe)
        # text enhancer (transformer_vanilla.py:72-97; nhead//2, ffn//2 —
        # transformer.py:89-95)
        tp = f"transformer.encoder.text_layers.{i}"
        _mha(params, f"{tp}.self_attn", dm)
        _linear(params, f"{tp}.linear1", dim_feedforward // 2, dm)
        _linear(params, f"{tp}.linear2", dm, dim_feedforward // 2)
        _ln(params, f"{tp}.norm1", dm)
        _ln(params, f"{tp}.norm2", dm)

    for i in range(dec_layers):
        pre = f"transformer.decoder.layers.{i}"
        _msdeform(params, f"{pre}.cross_attn", dm, nheads,
                  num_feature_levels, dec_n_points)
        _ln(params, f"{pre}.norm1", dm)
        _mha(params, f"{pre}.ca_text", dm)          # transformer.py:824-827
        _ln(params, f"{pre}.catext_norm", dm)
        _mha(params, f"{pre}.self_attn", dm)
        _ln(params, f"{pre}.norm2", dm)
        _linear(params, f"{pre}.linear1", dim_feedforward, dm)
        _linear(params, f"{pre}.linear2", dm, dim_feedforward)
        _ln(params, f"{pre}.norm3", dm)

    # decoder head glue (transformer.py:631-644)
    _mlp(params, "transformer.decoder.ref_point_head", (2 * dm, dm, dm))
    _ln(params, "transformer.decoder.norm", dm)

    # shared decoder box head: ONE MLP registered under every per-layer name
    # (groundingdino.py:173-182 dec_pred_bbox_embed_share=True); canonical
    # key bbox_embed.0, all other names are aliases of it
    _mlp(params, "bbox_embed.0", (dm, dm, dm, 4))
    for i in range(dec_layers):
        for j, (o, ii) in enumerate(((dm, dm), (dm, dm), (4, dm))):
            for suffix in ("weight", "bias"):
                canon = f"bbox_embed.0.layers.{j}.{suffix}"
                if i > 0:
                    aliases[f"bbox_embed.{i}.layers.{j}.{suffix}"] = canon
                aliases[
                    f"transformer.decoder.bbox_embed.{i}.layers.{j}.{suffix}"
                ] = canon
    # two-stage encoder box head, separate weights
    # (two_stage_bbox_embed_share=False — groundingdino.py:185-197)
    _mlp(params, "transformer.enc_out_bbox_embed", (dm, dm, dm, 4))

    return {"params": params, "ignored": ignored, "aliases": aliases}


CONFIGS = {
    "swint": dict(backbone="swin_T_224_1k"),
    "swinb": dict(backbone="swin_B_384_22k"),
    "resnet50": dict(backbone="resnet50"),
}


def main():
    out_dir = os.path.join(os.path.dirname(__file__), os.pardir,
                           "open_groundingdino_tpu", "config", "manifests")
    os.makedirs(out_dir, exist_ok=True)
    for name, kw in CONFIGS.items():
        m = reference_manifest(**kw)
        path = os.path.join(out_dir, f"{name}_keys.json")
        with open(path, "w") as f:
            json.dump(m, f, indent=0, sort_keys=True)
        n_par = len(m["params"])
        n_el = sum(
            int(__import__("numpy").prod(s)) for s in m["params"].values()
        )
        print(f"{name}: {n_par} param tensors, {n_el/1e6:.1f}M elements, "
              f"{len(m['ignored'])} ignored, {len(m['aliases'])} aliases "
              f"-> {path}")


if __name__ == "__main__":
    sys.exit(main())
