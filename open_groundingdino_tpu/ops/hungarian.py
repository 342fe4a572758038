"""Device-side Hungarian assignment (Jonker-Volgenant shortest augmenting
path) as a pure JAX op.

Why this exists: the reference ships cost matrices to CPU and calls scipy's
linear_sum_assignment per image per decoder layer (reference matcher.py:104-110)
— a device->host sync in the middle of every train step.  On TPU under jit
we instead solve the LSAP *on device* with lax loops: no host round-trip, no
callback (the axon PJRT runtime does not support host callbacks at all), and
it vmaps over (batch x decoder-layer) so all matchings run in parallel.

Algorithm: classic O(n^2 m) shortest-augmenting-path ("e-maxx Hungarian")
over the transposed problem — rows = GT boxes (n = max_gt, padded rows get
uniform zero cost so they never distort real assignments), cols = queries.
Float costs; exactness equals scipy up to tie-breaking.

Degenerate inputs (reference matcher.py:112-119 falls back to a greedy
SimpleMinsumMatcher when scipy THROWS): this solver cannot throw — the
augmenting-path loop always terminates in n iterations with an injective
assignment.  All-equal cost rows resolve by scan order (optimal — every
assignment is); nonfinite entries never reach it on the production path
(models/matcher.compute_cost_matrix zeroes nonfinite costs per reference
matcher.py:105-106 and pads invalid columns with BIG_COST), and a
directly-fed +/-inf matrix still yields a bounded injective result
(pinned by tests/test_matcher_criterion.test_device_lsap_degenerate_
matrices), so no greedy fallback is needed.
"""
from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp

INF = jnp.float32(1e18)


def _masked_u() -> bool:
    """HUNGARIAN_MASKED=1: replace the Dijkstra body's u-scatter
    (`u.at[p].add` — a (m+1)->(n+1) scatter-add, the single hottest fusion
    in the train-step trace at ~0.22 ms x ~33 data-dependent iterations)
    with a (n+1,) row mask maintained by one single-element update.  Exact:
    the rows matched to used columns are pairwise distinct, so the
    scatter-add is the same set of adds as the masked elementwise add.
    Measured 0.5131 vs 0.5190 s/step same-session (2026-08-19); default ON."""
    return bool(int(os.environ.get("HUNGARIAN_MASKED", "1")))


def _row_reduce() -> bool:
    """HUNGARIAN_RR=1: Jonker-Volgenant ROW-REDUCTION pre-pass.

    The e-maxx formulation runs one Dijkstra (a data-dependent while loop
    whose body is several small fused kernels — the 15.7 ms "Hungarian
    while-loops" bucket of the train profile) per GT row.  JV first sets
    u[i] = min_j cost[i, j] and greedily assigns each row to its argmin
    column (collisions: lowest row wins) — duals stay feasible with v = 0
    and claimed pairs tight, so shortest-path augmentation is only needed
    for the rows that LOST a collision (rare: a handful of GT rows over
    hundreds of query columns).  Exact: same optimal total cost; the
    assignment may differ from the un-reduced solve under ties (tests
    compare cost, not indices).

    NOT column reduction: v[j] = min_i cost[i, j] is only valid for square
    problems.  Rectangular (n rows << m cols) optimality needs v == 0 on
    every unmatched column (the dual LSAP has v <= 0 with complementary
    slackness on the <=1 column constraints; the e-maxx Dijkstra preserves
    this by construction — it only ever decreases v on columns that end up
    matched).  A column-reduction variant measured suboptimal on random
    matrices for exactly this reason.  Default ON: measured 0.4996 vs
    0.5070 s/step same-session (+1.5%, identical loss; BENCH_NOTES
    2026-08-20)."""
    return bool(int(os.environ.get("HUNGARIAN_RR", "1")))


def _lsap_single(cost: jnp.ndarray, n_rows: jnp.ndarray) -> jnp.ndarray:
    """cost: (n, m) float32 (rows = GT, cols = queries), n <= m.
    n_rows: scalar int — only the first n_rows rows are assigned.
    Returns col index per row (m for unassigned rows)."""
    n, m = cost.shape
    masked = _masked_u()
    rr = _row_reduce()
    # 1-indexed potentials/assignment arrays; col 0 is the virtual column.
    u = jnp.zeros((n + 1,), jnp.float32)
    v = jnp.zeros((m + 1,), jnp.float32)
    p = jnp.zeros((m + 1,), jnp.int32)  # p[j] = row assigned to col j (0 = free)
    cost1 = jnp.pad(cost, ((1, 0), (1, 0)))  # 1-indexed view

    col_ids = jnp.arange(m + 1, dtype=jnp.int32)

    def assign_row(i, state, active=None):
        """One shortest-augmenting-path step for row i.  `active` (CR path
        only) skips the Dijkstra entirely by starting done=True — the
        batched while_loop runs elements in lockstep, so inactive lanes
        must no-op cheaply; with active=None the program is bit-identical
        to the measured default."""
        u, v, p = state

        p = p.at[0].set(i)
        minv = jnp.full((m + 1,), INF)
        used = jnp.zeros((m + 1,), bool)
        way = jnp.zeros((m + 1,), jnp.int32)
        j0 = jnp.int32(0)

        def cond(carry):
            return ~carry[-1]

        def body(carry):
            # carry layout: (u, v, p, minv, used, way[, rowmask], j0, done);
            # rowmask (rows on the alternating tree) exists only under the
            # HUNGARIAN_MASKED gate so the default program stays the
            # measured one bit-for-bit.
            if masked:
                u, v, p, minv, used, way, rowmask, j0, _ = carry
            else:
                u, v, p, minv, used, way, j0, _ = carry
            used = used.at[j0].set(True)
            i0 = p[j0]
            cur = cost1[i0] - u[i0] - v  # (m+1,)
            better = (cur < minv) & ~used & (col_ids > 0)
            minv = jnp.where(better, cur, minv)
            way = jnp.where(better, j0, way)

            cand = jnp.where(used | (col_ids == 0), INF, minv)
            j1 = jnp.argmin(cand).astype(jnp.int32)
            delta = cand[j1]

            if masked:
                rowmask = rowmask.at[i0].set(True)
                u = jnp.where(rowmask, u + delta, u)
            else:
                u = u.at[p].add(jnp.where(used, delta, 0.0))
            v = jnp.where(used, v - delta, v)
            minv = jnp.where(used, minv, minv - delta)
            j0 = j1
            done = p[j0] == 0
            if masked:
                return (u, v, p, minv, used, way, rowmask, j0, done)
            return (u, v, p, minv, used, way, j0, done)

        done0 = jnp.asarray(False) if active is None else ~active
        init = (u, v, p, minv, used, way, j0, done0)
        if masked:
            rowmask0 = jnp.zeros((n + 1,), bool)
            init = init[:6] + (rowmask0,) + init[6:]
        out = jax.lax.while_loop(cond, body, init)
        u, v, p, minv, used, way = out[:6]
        j0 = out[-2]

        # augment along the alternating path
        def aug_cond(carry):
            p, j0 = carry
            return j0 != 0

        def aug_body(carry):
            p, j0 = carry
            j1 = way[j0]
            p = p.at[j0].set(p[j1])
            return (p, j1)

        p, _ = jax.lax.while_loop(aug_cond, aug_body, (p, j0))
        return (u, v, p)

    if rr:
        # ---- JV row reduction: u[i] = min over real columns, greedy claim
        # of each row's argmin column (collisions: lowest row id wins).
        # v stays 0 -> rectangular duals feasible, claimed pairs tight,
        # unmatched columns keep v = 0 (required for optimality; see
        # _row_reduce docstring).
        row_ids = jnp.arange(n + 1, dtype=jnp.int32)
        valid_row = (row_ids >= 1) & (row_ids <= n_rows)        # (n+1,)
        costu = jnp.where(col_ids[None, :] >= 1, cost1, INF)    # (n+1, m+1)
        u_rr = jnp.min(costu, axis=1)                           # (n+1,)
        u = jnp.where(valid_row & jnp.isfinite(u_rr), u_rr, 0.0)
        amin_col = jnp.argmin(costu, axis=1).astype(jnp.int32)  # (n+1,)
        # winner per column: lowest valid row whose argmin is that column
        winner = jnp.full((m + 1,), n + 1, jnp.int32)
        winner = winner.at[jnp.where(valid_row, amin_col, m + 1)].min(
            jnp.where(valid_row, row_ids, n + 1), mode="drop"
        )
        claim = valid_row & (winner[amin_col] == row_ids)
        p = p.at[jnp.where(claim, amin_col, m + 1)].set(
            jnp.where(claim, row_ids, 0), mode="drop"
        )
        # ordered free-row list; augment only those
        free_mask = valid_row & ~claim
        free_rows = jnp.sort(jnp.where(free_mask, row_ids, n + 1))
        n_free = free_mask.sum().astype(jnp.int32)

        def outer_cond(carry):
            return carry[0] < n_free

        def outer_body(carry):
            k, u, v, p = carry
            i = jnp.minimum(free_rows[jnp.minimum(k, n)], jnp.int32(n))
            u, v, p = assign_row(i, (u, v, p), active=k < n_free)
            return (k + 1, u, v, p)

        _, u, v, p = jax.lax.while_loop(
            outer_cond, outer_body, (jnp.int32(0), u, v, p)
        )
    else:
        u, v, p = jax.lax.fori_loop(
            1, n_rows.astype(jnp.int32) + 1, assign_row, (u, v, p)
        )

    # invert p: row -> col (0-indexed; unassigned rows -> m)
    rows_for_cols = p[1:]  # (m,) row (1-indexed) per col, 0 = free
    row_to_col = jnp.full((n + 2,), m, jnp.int32)
    row_to_col = row_to_col.at[rows_for_cols].set(
        jnp.arange(m, dtype=jnp.int32), mode="drop"
    )
    return row_to_col[1 : n + 1]


def hungarian_device(cost_qg: jnp.ndarray, gt_valid: jnp.ndarray) -> jnp.ndarray:
    """Batched LSAP on device.

    cost_qg: (N, Q, G) matching costs (queries x GT).
    gt_valid: (N, G) bool.
    Returns (N, G) int32: assigned query per GT, sentinel Q for invalid GT.
    """
    N, Q, G = cost_qg.shape
    cost_gq = jnp.swapaxes(cost_qg.astype(jnp.float32), 1, 2)  # rows = GT
    # move invalid GT rows to the *end* and give them uniform cost 0 so the
    # first n_rows rows are exactly the valid GT
    order = jnp.argsort(~gt_valid, axis=1, stable=True)  # valid first
    cost_sorted = jnp.take_along_axis(cost_gq, order[..., None], axis=1)
    n_rows = gt_valid.sum(axis=1).astype(jnp.int32)

    assigned_sorted = jax.vmap(_lsap_single)(cost_sorted, n_rows)  # (N, G)
    # scatter back to the original GT order
    assigned = jnp.full((N, G), Q, jnp.int32)
    assigned = jax.vmap(lambda a, o, s: a.at[o].set(s))(
        assigned, order, assigned_sorted
    )
    return jnp.where(gt_valid, jnp.minimum(assigned, Q), Q)
