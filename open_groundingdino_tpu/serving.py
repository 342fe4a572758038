"""Compile-free serving artifacts via jax.export (StableHLO).

The reference deploys by shipping the torch checkpoint + source and paying
model build + CUDA-extension JIT at process start (reference
groundingdino/util/inference.py:53-66 rebuilds the model per process).  The
TPU-native deployment story is ahead-of-time: `export_model` serializes the
jitted forward as portable StableHLO (one artifact per static image bucket
— the same static-shape discipline the rest of the framework uses), and
`load_exported` rebuilds a servable model with NO flax/model code on the
serving host: just deserialize + call.  The host-side pre/post-processing
(tokenizer, bucket padding, phrase decode) is shared with
`inference.predict` / `predict_with_spans`, which accept a ServingModel
anywhere an InferenceModel is accepted.

Artifact layout (a directory):
    meta.json              format version, batch, buckets, max_text_len
    params.npz             flattened f32 weights ("a/b/c" path keys)
    fwd_<H>x<W>.jaxexp     serialized jax.export.Exported per bucket
    vocab.txt              WordPiece vocab (copied when provided)

Pallas kernels export as `tpu_custom_call`s: portable across same-generation
TPUs, so exporting ON a TPU backend (or with platforms=["tpu"]) embeds the
Mosaic kernels; the CPU/XLA fallback path exports everywhere.
"""
from __future__ import annotations

import json
import os
import shutil
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import export as jax_export

from .data.tokenization import BertWordPieceTokenizer, build_tokenizer
from .data.transforms import Bucketer

FORMAT_VERSION = 1


def _flatten_params(params) -> Dict[str, np.ndarray]:
    flat: Dict[str, np.ndarray] = {}

    def rec(prefix: Tuple[str, ...], node) -> None:
        if hasattr(node, "items"):
            for k, v in node.items():
                rec(prefix + (str(k),), v)
        else:
            flat["/".join(prefix)] = np.asarray(node)

    rec((), params)
    return flat


def _unflatten_params(flat: Dict[str, np.ndarray]) -> Dict:
    root: Dict = {}
    for key, v in flat.items():
        parts = key.split("/")
        d = root
        for p in parts[:-1]:
            d = d.setdefault(p, {})
        d[parts[-1]] = v
    return root


def export_model(
    im,
    out_dir: str,
    buckets: Optional[Sequence[Tuple[int, int]]] = None,
    batch: int = 1,
    platforms: Optional[Sequence[str]] = None,
    vocab_path: Optional[str] = None,
) -> List[str]:
    """Serialize `im` (an inference.InferenceModel) for serving.

    buckets: static (H, W) shapes to export; defaults to the model config's
    image_buckets.  platforms: jax.export lowering platforms (None = the
    current backend).  Returns the artifact file names written."""
    os.makedirs(out_dir, exist_ok=True)
    buckets = [
        (int(h), int(w)) for h, w in (buckets or im.bucketer.buckets)
    ]
    T = int(im.max_text_len)
    fn = im.forward_fn()

    np.savez(os.path.join(out_dir, "params.npz"), **_flatten_params(im.params))
    written = ["params.npz"]

    pspec = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(np.shape(x), np.asarray(x).dtype),
        im.params,
    )
    # Mosaic kernels serialize as tpu_custom_call — portable within a TPU
    # generation, but jax.export is conservative and wants an explicit ack.
    disabled = [jax_export.DisabledSafetyCheck.custom_call("tpu_custom_call")]
    for H, W in buckets:
        args = (
            pspec,
            jax.ShapeDtypeStruct((batch, H, W, 3), jnp.float32),
            jax.ShapeDtypeStruct((batch, 2), jnp.int32),
            jax.ShapeDtypeStruct((batch, T), jnp.int32),
            jax.ShapeDtypeStruct((batch, T), jnp.bool_),
            jax.ShapeDtypeStruct((batch, T), jnp.int32),
            jax.ShapeDtypeStruct((batch, T, T), jnp.bool_),
        )
        exp = jax_export.export(
            fn, platforms=platforms, disabled_checks=disabled
        )(*args)
        name = f"fwd_{H}x{W}.jaxexp"
        with open(os.path.join(out_dir, name), "wb") as f:
            f.write(exp.serialize())
        written.append(name)

    if vocab_path:
        shutil.copyfile(vocab_path, os.path.join(out_dir, "vocab.txt"))
        written.append("vocab.txt")

    meta = {
        "format": FORMAT_VERSION,
        "batch": int(batch),
        "buckets": [list(b) for b in buckets],
        "max_text_len": T,
        "platforms": list(platforms) if platforms else None,
    }
    with open(os.path.join(out_dir, "meta.json"), "w") as f:
        json.dump(meta, f, indent=1)
    written.append("meta.json")
    return written


@dataclass
class ServingModel:
    """Deserialized serving bundle; duck-types InferenceModel so
    inference.predict / predict_with_spans / Model wrappers work on it."""

    params: Dict
    tokenizer: BertWordPieceTokenizer
    bucketer: Bucketer
    max_text_len: int
    batch: int
    _calls: Dict[Tuple[int, int], object]
    _jitted: Dict = field(default_factory=dict)

    def forward_fn(self):
        calls = self._calls

        def fn(params, images, *rest):
            key = (int(images.shape[1]), int(images.shape[2]))
            if key not in calls:
                raise ValueError(
                    f"no exported bucket for image shape {key}; "
                    f"available: {sorted(calls)}"
                )
            return calls[key](params, images, *rest)

        return fn


def load_exported(
    out_dir: str, vocab_path: Optional[str] = None
) -> ServingModel:
    """Rebuild a servable model from an export_model artifact directory."""
    with open(os.path.join(out_dir, "meta.json")) as f:
        meta = json.load(f)
    if meta.get("format") != FORMAT_VERSION:
        raise ValueError(f"unsupported artifact format {meta.get('format')}")

    with np.load(os.path.join(out_dir, "params.npz")) as z:
        params = _unflatten_params({k: z[k] for k in z.files})

    calls = {}
    for h, w in meta["buckets"]:
        path = os.path.join(out_dir, f"fwd_{h}x{w}.jaxexp")
        with open(path, "rb") as f:
            exp = jax_export.deserialize(bytearray(f.read()))
        calls[(int(h), int(w))] = jax.jit(exp.call)

    vocab = vocab_path or os.path.join(out_dir, "vocab.txt")
    if not os.path.exists(vocab):
        raise ValueError(
            "vocab.txt not found in the artifact; pass vocab_path="
        )
    return ServingModel(
        params=params,
        tokenizer=build_tokenizer(vocab),
        bucketer=Bucketer([tuple(b) for b in meta["buckets"]]),
        max_text_len=int(meta["max_text_len"]),
        batch=int(meta["batch"]),
        _calls=calls,
    )
