"""Row-band interleaved layout: closed-form row starts must equal the
explicit sort construction for a battery of real bucket shapes, including
odd heights that produce exact center ties between levels (H=25 vs H=13
both contain a center-1/2 row)."""
import jax.numpy as jnp
import numpy as np
import pytest

from open_groundingdino_tpu.ops.interleave import (
    row_band_layout,
    rowstart_dyn,
)

SHAPE_SETS = [
    # 800x1216 eval bucket (strides 8/16/32/64)
    ((100, 152), (50, 76), (25, 38), (13, 19)),
    # odd cascade with centre ties (25 vs 13)
    ((25, 38), (13, 19), (7, 10), (4, 5)),
    # nano test shapes
    ((8, 12), (4, 6), (2, 3), (1, 2)),
    # two levels, heights sharing an odd factor (ties at several rows)
    ((9, 12), (3, 4)),
    # single level degenerates to raster
    ((16, 24),),
]


@pytest.mark.parametrize("shapes", SHAPE_SETS)
def test_rowstart_closed_form_matches_sort(shapes):
    _, tables = row_band_layout(shapes)
    for l, (H, W) in enumerate(shapes):
        ys = jnp.arange(H, dtype=jnp.int32)
        got = np.asarray(rowstart_dyn(shapes, l, ys))
        np.testing.assert_array_equal(got, tables[l], err_msg=f"level {l}")


@pytest.mark.parametrize("shapes", SHAPE_SETS)
def test_perm_is_row_contiguous_permutation(shapes):
    perm, tables = row_band_layout(shapes)
    L = sum(h * w for h, w in shapes)
    assert sorted(perm.tolist()) == list(range(L))
    # each raster row occupies one contiguous ascending run at its rowstart
    level_start = 0
    for l, (H, W) in enumerate(shapes):
        for y in range(H):
            pos = tables[l][y]
            np.testing.assert_array_equal(
                perm[pos : pos + W],
                np.arange(level_start + y * W, level_start + (y + 1) * W),
            )
        level_start += H * W


def test_rows_sorted_by_center_with_level_tiebreak():
    shapes = ((25, 4), (13, 4))
    perm, tables = row_band_layout(shapes)
    # center 0.5 rows: level0 y=12, level1 y=6 — level 0 must come first
    assert tables[0][12] < tables[1][6]
    # and they are adjacent bands
    assert tables[1][6] == tables[0][12] + 4
