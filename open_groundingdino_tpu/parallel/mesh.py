"""Device mesh + sharding helpers.

The reference's distributed runtime is DDP over NCCL (util/misc.py:520-558).
The TPU-native equivalent is single-controller JAX: one
jax.sharding.Mesh over all devices with the batch sharded on the 'data'
axis and parameters replicated; XLA inserts the gradient all-reduce over
ICI automatically when the jitted train step consumes sharded inputs.

Multi-host: call jax.distributed.initialize() per host (initialize()
no-ops on single host), shard input files by jax.process_index().
"""
from __future__ import annotations

from typing import Any, Dict

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), ("data",))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Dict[str, Any], mesh: Mesh) -> Dict[str, Any]:
    """device_put every array on the data axis (first dim).  Values that
    are already device-resident jax Arrays skip the host round-trip
    (device_put with an identical sharding is a no-op) — this is what
    makes pre-uploaded batches (eval_pipeline_bench --device_resident)
    free to re-shard."""
    sh = batch_sharding(mesh)
    out = {}
    for k, v in batch.items():
        if k in ("image_ids", "orig_sizes", "label_maps", "n_real"):
            continue  # host-side metadata
        out[k] = jax.device_put(
            v if isinstance(v, jax.Array) else np.asarray(v), sh
        )
    return out


def shard_stacked_batch(batch: Dict[str, Any], mesh: Mesh) -> Dict[str, Any]:
    """Like shard_batch but for (steps_per_call, B, ...) stacked batches
    (engine multi-step dispatch): the scan axis stays whole on every
    device, the per-step batch dim shards on 'data'."""
    sh = NamedSharding(mesh, P(None, "data"))
    out = {}
    for k, v in batch.items():
        if k in ("image_ids", "orig_sizes", "label_maps", "n_real"):
            continue  # host-side metadata
        out[k] = jax.device_put(np.asarray(v), sh)
    return out


def replicate_tree(tree, mesh: Mesh):
    return jax.device_put(tree, replicated(mesh))
