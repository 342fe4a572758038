"""Row-band interleaved token layout for multi-level feature maps.

The encoder's deformable self-attention runs over the concatenation of all
pyramid levels.  In level-major raster order, a block of spatially-adjacent
queries taps positions in four widely-separated regions of the value array
(one per level), so the Pallas sweep kernel needs FOUR separate tile sweeps
per query block.  This module defines a single canonical *interleaved*
order — all levels' ROWS sorted together by normalized y-center, each row
kept contiguous — in which a thin horizontal strip of the image occupies
ONE contiguous span of the array across all levels: the kernel sweeps one
merged range instead of four, and the encoder's hidden states can stay in
this order end-to-end (no per-layer inverse gathers).

Key property: row starts have an exact closed form (`rowstart_dyn`) in the
dynamic row index, so the kernel prep can remap tap coordinates to
interleaved positions with a handful of integer VPU ops — no device
gathers.  Ties between levels' centers (possible when level heights share
odd factors, e.g. H=25 vs H=13 both produce center 1/2) are broken by
level index, and the closed form accounts for them exactly
(`tests/test_interleave.py` checks it against the explicit sort for a
battery of real bucket shapes).

Replaces round-1's `_interleaved_query_order` lexsort (same locality idea,
token-granular sort, no closed form — reference for the history:
BENCH_NOTES.md round-1 notes).
"""
from __future__ import annotations

from fractions import Fraction
from typing import List, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

Shapes = Tuple[Tuple[int, int], ...]


def row_band_layout(shapes: Shapes):
    """Canonical interleaved layout.

    Returns (perm, rowstarts):
      perm: (L,) int32 — perm[i] = level-major raster index of the token at
            interleaved position i (use as jnp.take(x, perm, axis=...)).
      rowstarts: list of (H_l,) int64 — interleaved position of (l, y, 0).
    """
    rows = []
    level_start = 0
    for l, (H, W) in enumerate(shapes):
        for y in range(H):
            rows.append((Fraction(2 * y + 1, 2 * H), l, y, W,
                         level_start + y * W))
        level_start += H * W
    rows.sort(key=lambda r: (r[0], r[1]))
    perm = np.concatenate(
        [np.arange(r[4], r[4] + r[3]) for r in rows]
    ).astype(np.int32)
    rowstarts = [np.zeros(H, np.int64) for (H, W) in shapes]
    pos = 0
    for _, l, y, W, _base in rows:
        rowstarts[l][y] = pos
        pos += W
    return perm, rowstarts


def rowstart_dyn(shapes: Shapes, level: int, y: jnp.ndarray) -> jnp.ndarray:
    """Closed-form interleaved row start for dynamic int32 row indices `y`
    of `level` — exactly row_band_layout(shapes)[1][level][y], but computed
    with vectorized integer ops (no gather).

    Derivation: position of row (l, y) = sum over levels l' of
    W_l' * (# rows of l' strictly before it).  Strictly-before count for
    l' != l is the number of y' with center (2y'+1)/(2H') < (2y+1)/(2H),
    i.e. (2y'+1) H < K where K = (2y+1) H'; the largest such y' gives
    count = floor((K + H - 1) / (2H)) clipped to [0, H'].  An exact
    center tie ((K - H) divisible by 2H with the quotient a valid row)
    sorts by level index: it precedes iff l' < l."""
    H_l = shapes[level][0]
    y = y.astype(jnp.int32)
    total = jnp.zeros_like(y)
    for lp, (Hp, Wp) in enumerate(shapes):
        if lp == level:
            c = y
        else:
            K = (2 * y + 1) * Hp
            c = jnp.clip((K + H_l - 1) // (2 * H_l), 0, Hp)
            if lp < level:
                q, r = jnp.divmod(K - H_l, 2 * H_l)
                tie = (r == 0) & (q >= 0) & (q < Hp)
                c = c + tie.astype(jnp.int32)
        total = total + Wp * c
    return total


def rowstart_tables(shapes: Shapes) -> List[np.ndarray]:
    """Static per-level rowstart tables (trace-time constants)."""
    return row_band_layout(shapes)[1]
