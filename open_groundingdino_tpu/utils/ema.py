"""Model EMA + best-metric tracking (reference util/utils.py:373-470).

EMA is a pure pytree transform here (decay * ema + (1-decay) * params) —
apply after each optimizer step when enabled (configs default use_ema=False,
matching the reference)."""
from __future__ import annotations

from typing import Dict, Optional

import jax


def ema_update(ema_params, new_params, decay: float = 0.9997):
    return jax.tree_util.tree_map(
        lambda e, p: e * decay + p.astype(e.dtype) * (1.0 - decay),
        ema_params, new_params,
    )


class BestMetricHolder:
    """Track best mAP across epochs, with/without EMA slots
    (reference util/utils.py:433-470, used main.py:400)."""

    def __init__(self, use_ema: bool = False):
        self.best_all: float = -1.0
        self.best_regular: float = -1.0
        self.best_ema: float = -1.0
        self.use_ema = use_ema

    def update(self, new_res: float, epoch: int, is_ema: bool = False) -> bool:
        """Returns True if new_res is the new overall best."""
        if not self.use_ema:
            is_best = new_res > self.best_regular
            if is_best:
                self.best_regular = new_res
                self.best_all = new_res
            return is_best
        if is_ema:
            self.best_ema = max(self.best_ema, new_res)
        else:
            self.best_regular = max(self.best_regular, new_res)
        if new_res > self.best_all:
            self.best_all = new_res
            return True
        return False

    def summary(self) -> Dict[str, float]:
        return {
            "best_all": self.best_all,
            "best_regular": self.best_regular,
            "best_ema": self.best_ema,
        }
