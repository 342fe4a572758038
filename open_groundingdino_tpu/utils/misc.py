"""Small numeric/host helpers shared across the framework."""
from __future__ import annotations

import jax.numpy as jnp


def inverse_sigmoid(x: jnp.ndarray, eps: float = 1e-3) -> jnp.ndarray:
    """Logit with clamping, matching reference util/misc.py:614-618."""
    x = jnp.clip(x, 0.0, 1.0)
    x1 = jnp.clip(x, min=eps)
    x2 = jnp.clip(1.0 - x, min=eps)
    return jnp.log(x1 / x2)


def clean_state_dict(state_dict: dict) -> dict:
    """Strip a leading 'module.' from checkpoint keys (DDP artifact), the
    semantics of reference util/utils.py:22-28 — needed to ingest published
    PyTorch checkpoints."""
    return {
        (k[len("module."):] if k.startswith("module.") else k): v
        for k, v in state_dict.items()
    }
