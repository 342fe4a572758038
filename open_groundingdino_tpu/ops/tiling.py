"""Shared row-tiling helper for the elementwise-ish Pallas kernels.

Each kernel picks the largest row tile from its own tier list that divides
the row count exactly (tier lists differ by VMEM footprint: the fused MLP
holds a (tile, d_ffn) f32 intermediate, LayerNorm only (tile, C)); callers
pad-and-recurse on the 0 sentinel.  Tier changes motivated by Mosaic
compile limits (see CLAUDE.md) belong here so both kernels inherit them.
"""
from __future__ import annotations

from typing import Sequence


def pick_row_tile(rows: int, tiers: Sequence[int] = (512, 256, 128)) -> int:
    """Largest tier that divides ``rows``; 0 when none does (caller pads)."""
    for t in tiers:
        if rows % t == 0:
            return t
    return 0
