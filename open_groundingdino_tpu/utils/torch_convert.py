"""PyTorch checkpoint -> JAX pytree converters.

Converts published GroundingDINO checkpoints (torch `state_dict`s, e.g.
groundingdino_swint_ogc.pth) into this framework's Flax parameter trees.
Mirrors the reference's loading semantics: `clean_state_dict` strips DDP
'module.' prefixes (reference util/utils.py:22-28) and loading is lenient.

Each converter takes a flat {torch_key: np.ndarray} dict (already sliced to
the submodule's prefix) and returns a nested Flax params dict.
"""
from __future__ import annotations

from typing import Dict

import numpy as np


def _t(x) -> np.ndarray:  # torch tensor (or ndarray) -> np.ndarray fp32
    if hasattr(x, "detach"):
        x = x.detach().cpu().numpy()
    return np.asarray(x)


def strip_prefix(sd: Dict[str, np.ndarray], prefix: str) -> Dict[str, np.ndarray]:
    pl = len(prefix)
    return {k[pl:]: v for k, v in sd.items() if k.startswith(prefix)}


def linear(sd: Dict, key: str) -> Dict:
    """torch nn.Linear -> flax nn.Dense (kernel transposed)."""
    return {"kernel": _t(sd[f"{key}.weight"]).T, "bias": _t(sd[f"{key}.bias"])}


def layernorm(sd: Dict, key: str) -> Dict:
    return {"scale": _t(sd[f"{key}.weight"]), "bias": _t(sd[f"{key}.bias"])}


def embedding(sd: Dict, key: str) -> Dict:
    return {"embedding": _t(sd[f"{key}.weight"])}


def conv2d(sd: Dict, key: str) -> Dict:
    """torch nn.Conv2d (OIHW) -> flax nn.Conv (HWIO)."""
    w = _t(sd[f"{key}.weight"]).transpose(2, 3, 1, 0)
    out = {"kernel": w}
    if f"{key}.bias" in sd:
        out["bias"] = _t(sd[f"{key}.bias"])
    return out


def convert_swin_state_dict(sd: Dict[str, np.ndarray], depths, out_indices) -> Dict:
    """Swin backbone state_dict (keys like 'patch_embed.proj.weight',
    'layers.0.blocks.1.attn.qkv.weight') -> models/swin.SwinTransformer
    params.  Buffers (relative_position_index, attn_mask) are recomputed
    statically and skipped."""
    p: Dict = {
        "patch_embed": conv2d(sd, "patch_embed.proj"),
        "patch_norm": layernorm(sd, "patch_embed.norm"),
    }
    for i, depth in enumerate(depths):
        for b in range(depth):
            pre = f"layers.{i}.blocks.{b}"
            p[f"layer_{i}_block_{b}"] = {
                "norm1": layernorm(sd, f"{pre}.norm1"),
                "attn": {
                    "qkv": linear(sd, f"{pre}.attn.qkv"),
                    "proj": linear(sd, f"{pre}.attn.proj"),
                    "relative_position_bias_table": _t(
                        sd[f"{pre}.attn.relative_position_bias_table"]
                    ),
                },
                "norm2": layernorm(sd, f"{pre}.norm2"),
                "fc1": linear(sd, f"{pre}.mlp.fc1"),
                "fc2": linear(sd, f"{pre}.mlp.fc2"),
            }
        if i < len(depths) - 1:
            p[f"downsample_{i}"] = {
                "norm": layernorm(sd, f"layers.{i}.downsample.norm"),
                "reduction": {
                    "kernel": _t(sd[f"layers.{i}.downsample.reduction.weight"]).T
                },
            }
    for i in out_indices:
        p[f"out_norm_{i}"] = layernorm(sd, f"norm{i}")
    return p


def frozen_bn(sd: Dict, key: str) -> Dict:
    """torchvision BN buffers -> models/resnet.FrozenBatchNorm params
    (num_batches_tracked dropped, as reference backbone.py:50-56 does)."""
    return {
        "weight": _t(sd[f"{key}.weight"]),
        "bias": _t(sd[f"{key}.bias"]),
        "running_mean": _t(sd[f"{key}.running_mean"]),
        "running_var": _t(sd[f"{key}.running_var"]),
    }


def convert_resnet_state_dict(sd: Dict[str, np.ndarray], depths) -> Dict:
    """torchvision ResNet state_dict (keys like 'conv1.weight',
    'layer1.0.downsample.0.weight') -> models/resnet.ResNet params."""
    p: Dict = {
        "conv1": conv2d(sd, "conv1"),
        "frozen_bn1": frozen_bn(sd, "bn1"),
    }
    for i, depth in enumerate(depths):
        for b in range(depth):
            pre = f"layer{i + 1}.{b}"
            blk = {
                "conv1": conv2d(sd, f"{pre}.conv1"),
                "frozen_bn1": frozen_bn(sd, f"{pre}.bn1"),
                "conv2": conv2d(sd, f"{pre}.conv2"),
                "frozen_bn2": frozen_bn(sd, f"{pre}.bn2"),
                "conv3": conv2d(sd, f"{pre}.conv3"),
                "frozen_bn3": frozen_bn(sd, f"{pre}.bn3"),
            }
            if f"{pre}.downsample.0.weight" in sd:
                blk["downsample_conv"] = conv2d(sd, f"{pre}.downsample.0")
                blk["downsample_frozen_bn"] = frozen_bn(sd, f"{pre}.downsample.1")
            p[f"layer{i + 1}_block{b}"] = blk
    return p


# ---------------------------------------------------------------------------
# Reverse direction: JAX pytree -> torch-layout state_dict entries.
# Exact inverses of the loaders above, so export(convert(sd)) == sd on every
# key the converter reads and convert(export(params)) == params leaf-for-leaf.
# ---------------------------------------------------------------------------

def rlinear(sd: Dict, key: str, tree: Dict) -> None:
    sd[f"{key}.weight"] = np.asarray(tree["kernel"]).T
    if "bias" in tree:
        sd[f"{key}.bias"] = np.asarray(tree["bias"])


def rlayernorm(sd: Dict, key: str, tree: Dict) -> None:
    sd[f"{key}.weight"] = np.asarray(tree["scale"])
    sd[f"{key}.bias"] = np.asarray(tree["bias"])


def rembedding(sd: Dict, key: str, tree: Dict) -> None:
    sd[f"{key}.weight"] = np.asarray(tree["embedding"])


def rconv2d(sd: Dict, key: str, tree: Dict) -> None:
    sd[f"{key}.weight"] = np.asarray(tree["kernel"]).transpose(3, 2, 0, 1)
    if "bias" in tree:
        sd[f"{key}.bias"] = np.asarray(tree["bias"])


def rfrozen_bn(sd: Dict, key: str, tree: Dict) -> None:
    for name in ("weight", "bias", "running_mean", "running_var"):
        sd[f"{key}.{name}"] = np.asarray(tree[name])


def export_swin_state_dict(p: Dict, prefix: str = "") -> Dict[str, np.ndarray]:
    """models/swin.SwinTransformer params -> Swin torch keys (inverse of
    convert_swin_state_dict; depths/out_indices derived from the tree)."""
    sd: Dict[str, np.ndarray] = {}
    rconv2d(sd, f"{prefix}patch_embed.proj", p["patch_embed"])
    rlayernorm(sd, f"{prefix}patch_embed.norm", p["patch_norm"])
    for name in sorted(k for k in p if k.startswith("layer_")):
        _, i, _, b = name.split("_")
        pre = f"{prefix}layers.{i}.blocks.{b}"
        blk = p[name]
        rlayernorm(sd, f"{pre}.norm1", blk["norm1"])
        sd[f"{pre}.attn.relative_position_bias_table"] = np.asarray(
            blk["attn"]["relative_position_bias_table"]
        )
        rlinear(sd, f"{pre}.attn.qkv", blk["attn"]["qkv"])
        rlinear(sd, f"{pre}.attn.proj", blk["attn"]["proj"])
        rlayernorm(sd, f"{pre}.norm2", blk["norm2"])
        rlinear(sd, f"{pre}.mlp.fc1", blk["fc1"])
        rlinear(sd, f"{pre}.mlp.fc2", blk["fc2"])
    for name in sorted(k for k in p if k.startswith("downsample_")):
        i = name.split("_")[-1]
        rlayernorm(sd, f"{prefix}layers.{i}.downsample.norm", p[name]["norm"])
        sd[f"{prefix}layers.{i}.downsample.reduction.weight"] = np.asarray(
            p[name]["reduction"]["kernel"]
        ).T
    for name in sorted(k for k in p if k.startswith("out_norm_")):
        i = name.split("_")[-1]
        rlayernorm(sd, f"{prefix}norm{i}", p[name])
    return sd


def export_resnet_state_dict(p: Dict, prefix: str = "") -> Dict[str, np.ndarray]:
    """models/resnet.ResNet params -> torchvision ResNet torch keys
    (inverse of convert_resnet_state_dict)."""
    sd: Dict[str, np.ndarray] = {}
    rconv2d(sd, f"{prefix}conv1", p["conv1"])
    rfrozen_bn(sd, f"{prefix}bn1", p["frozen_bn1"])
    for name in sorted(k for k in p if k.startswith("layer")):
        stage, b = name.split("_block")
        pre = f"{prefix}{stage}.{b}"
        blk = p[name]
        for j in (1, 2, 3):
            rconv2d(sd, f"{pre}.conv{j}", blk[f"conv{j}"])
            rfrozen_bn(sd, f"{pre}.bn{j}", blk[f"frozen_bn{j}"])
        if "downsample_conv" in blk:
            rconv2d(sd, f"{pre}.downsample.0", blk["downsample_conv"])
            rfrozen_bn(sd, f"{pre}.downsample.1", blk["downsample_frozen_bn"])
    return sd


def export_bert_state_dict(p: Dict, prefix: str = "") -> Dict[str, np.ndarray]:
    """models/bert.BertModel params -> HF BertModel torch keys (inverse of
    convert_bert_state_dict)."""
    sd: Dict[str, np.ndarray] = {}
    e = p["embeddings"]
    rembedding(sd, f"{prefix}embeddings.word_embeddings", e["word_embeddings"])
    rembedding(sd, f"{prefix}embeddings.position_embeddings",
               e["position_embeddings"])
    rembedding(sd, f"{prefix}embeddings.token_type_embeddings",
               e["token_type_embeddings"])
    rlayernorm(sd, f"{prefix}embeddings.LayerNorm", e["ln"])
    for name in sorted(k for k in p if k.startswith("layer_")):
        i = name.split("_")[-1]
        l = p[name]
        pre = f"{prefix}encoder.layer.{i}"
        rlinear(sd, f"{pre}.attention.self.query", l["q"])
        rlinear(sd, f"{pre}.attention.self.key", l["k"])
        rlinear(sd, f"{pre}.attention.self.value", l["v"])
        rlinear(sd, f"{pre}.attention.output.dense", l["attn_out"])
        rlayernorm(sd, f"{pre}.attention.output.LayerNorm", l["attn_ln"])
        rlinear(sd, f"{pre}.intermediate.dense", l["inter"])
        rlinear(sd, f"{pre}.output.dense", l["out"])
        rlayernorm(sd, f"{pre}.output.LayerNorm", l["out_ln"])
    return sd


def convert_bert_state_dict(sd: Dict[str, np.ndarray], num_layers: int = 12) -> Dict:
    """HF BertModel state_dict (keys like 'embeddings.word_embeddings.weight',
    'encoder.layer.0.attention.self.query.weight') -> models/bert.BertModel
    params."""
    p: Dict = {
        "embeddings": {
            "word_embeddings": embedding(sd, "embeddings.word_embeddings"),
            "position_embeddings": embedding(sd, "embeddings.position_embeddings"),
            "token_type_embeddings": embedding(sd, "embeddings.token_type_embeddings"),
            "ln": layernorm(sd, "embeddings.LayerNorm"),
        }
    }
    for i in range(num_layers):
        pre = f"encoder.layer.{i}"
        p[f"layer_{i}"] = {
            "q": linear(sd, f"{pre}.attention.self.query"),
            "k": linear(sd, f"{pre}.attention.self.key"),
            "v": linear(sd, f"{pre}.attention.self.value"),
            "attn_out": linear(sd, f"{pre}.attention.output.dense"),
            "attn_ln": layernorm(sd, f"{pre}.attention.output.LayerNorm"),
            "inter": linear(sd, f"{pre}.intermediate.dense"),
            "out": linear(sd, f"{pre}.output.dense"),
            "out_ln": layernorm(sd, f"{pre}.output.LayerNorm"),
        }
    return p
