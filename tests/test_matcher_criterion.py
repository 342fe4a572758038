"""Matcher + criterion: assignment correctness vs scipy, loss sanity, and
jit/grad compatibility of the pure_callback matching path."""
import jax
import jax.numpy as jnp
import numpy as np
from scipy.optimize import linear_sum_assignment

from open_groundingdino_tpu.models.criterion import SetCriterion, build_one_hot_targets
from open_groundingdino_tpu.models.matcher import (
    compute_cost_matrix,
    hungarian_assign,
)

B, Q, G, T = 2, 12, 5, 16


def _inputs(seed=0, n_valid=(3, 5)):
    rng = np.random.RandomState(seed)
    logits = rng.randn(B, Q, T).astype(np.float32) * 2
    boxes = rng.uniform(0.2, 0.8, (B, Q, 4)).astype(np.float32) * np.asarray(
        [1, 1, 0.3, 0.3], np.float32
    )
    gt_boxes = rng.uniform(0.2, 0.8, (B, G, 4)).astype(np.float32) * np.asarray(
        [1, 1, 0.3, 0.3], np.float32
    )
    pos_maps = np.zeros((B, G, T), np.float32)
    for b in range(B):
        for g in range(G):
            s = rng.randint(1, T - 2)
            pos_maps[b, g, s : s + 2] = 1
    valid = np.zeros((B, G), bool)
    for b, n in enumerate(n_valid):
        valid[b, :n] = True
    return logits, boxes, gt_boxes, pos_maps, valid


def _check_vs_scipy(src, Cn, valid, exact_indices):
    """Device/callback result must reach scipy's optimal total cost."""
    for b in range(Cn.shape[0]):
        cols = np.nonzero(valid[b])[0]
        if len(cols) == 0:
            assert (src[b] == Cn.shape[1]).all()
            continue
        rows, cidx = linear_sum_assignment(Cn[b][:, cols])
        opt = Cn[b][rows, cols[cidx]].sum()
        got_rows = src[b][cols]
        assert (got_rows < Cn.shape[1]).all()
        got = Cn[b][got_rows, cols].sum()
        # injective
        assert len(set(got_rows.tolist())) == len(got_rows)
        np.testing.assert_allclose(got, opt, rtol=1e-5, atol=1e-5)
        if exact_indices:
            expect = np.full(src.shape[1], Cn.shape[1], np.int32)
            expect[cols[cidx]] = rows
            np.testing.assert_array_equal(src[b], expect)


def test_assignment_matches_scipy():
    logits, boxes, gt_boxes, pos_maps, valid = _inputs()
    C = compute_cost_matrix(
        jnp.asarray(logits), jnp.asarray(boxes), jnp.asarray(gt_boxes),
        jnp.asarray(pos_maps), jnp.asarray(valid),
    )
    Cn = np.asarray(C)
    src_cb = np.asarray(hungarian_assign(C, jnp.asarray(valid), method="callback"))
    _check_vs_scipy(src_cb, Cn, valid, exact_indices=True)
    src_dev = np.asarray(hungarian_assign(C, jnp.asarray(valid), method="device"))
    _check_vs_scipy(src_dev, Cn, valid, exact_indices=False)


def test_device_lsap_random_matrices():
    rng = np.random.RandomState(7)
    for trial in range(5):
        Qn, Gn = 40, rng.randint(1, 12)
        cost = rng.randn(3, Qn, Gn).astype(np.float32) * 10
        valid = rng.rand(3, Gn) > 0.3
        src = np.asarray(
            hungarian_assign(jnp.asarray(cost), jnp.asarray(valid), method="device")
        )
        _check_vs_scipy(src, cost, valid, exact_indices=False)
        # sentinel on invalid slots
        assert (src[~valid] == Qn).all()


def test_device_lsap_masked_u_variant(monkeypatch):
    """HUNGARIAN_MASKED=1 (row-mask u update instead of the scatter-add)
    must be exact: same adds in the same order -> bitwise-equal result."""
    rng = np.random.RandomState(11)
    cost = rng.randn(3, 40, 9).astype(np.float32) * 10
    valid = rng.rand(3, 9) > 0.3
    base = np.asarray(
        hungarian_assign(jnp.asarray(cost), jnp.asarray(valid), method="device")
    )
    monkeypatch.setenv("HUNGARIAN_MASKED", "1")
    got = np.asarray(
        hungarian_assign(jnp.asarray(cost), jnp.asarray(valid), method="device")
    )
    np.testing.assert_array_equal(got, base)
    _check_vs_scipy(got, cost, valid, exact_indices=False)


def test_device_lsap_row_reduction_variant(monkeypatch):
    """HUNGARIAN_RR=1 (JV row-reduction pre-pass + free-row-only
    augmentation) must reach the scipy-optimal cost on every matrix; the
    assignment itself may differ from the un-reduced solve under ties."""
    rng = np.random.RandomState(13)
    monkeypatch.setenv("HUNGARIAN_RR", "1")
    for trial in range(6):
        Qn, Gn = 40, int(rng.randint(1, 12))
        cost = rng.randn(3, Qn, Gn).astype(np.float32) * 10
        valid = rng.rand(3, Gn) > 0.3
        if trial == 0:
            valid[0] = False      # n_rows == 0 lane in a mixed batch
            valid[1] = True       # all-valid lane
        got = np.asarray(
            hungarian_assign(jnp.asarray(cost), jnp.asarray(valid), method="device")
        )
        _check_vs_scipy(got, cost, valid, exact_indices=False)
        assert (got[~valid] == Qn).all()
    # degenerate: heavy ties (integer costs) — greedy claims collide hard,
    # so most rows go through the augmentation path; must stay injective
    # and optimal
    cost = rng.randint(0, 3, (2, 15, 8)).astype(np.float32)
    valid = np.ones((2, 8), bool)
    got = np.asarray(
        hungarian_assign(jnp.asarray(cost), jnp.asarray(valid), method="device")
    )
    _check_vs_scipy(got, cost, valid, exact_indices=False)
    # adversarial: every row's argmin is the SAME column (one very cheap
    # query) — exactly one greedy claim wins, all other rows augment
    cost = np.full((1, 10, 5), 7.0, np.float32)
    cost[0, 3, :] = -50.0                      # column 3 wins every argmin
    cost[0] += rng.rand(10, 5).astype(np.float32)  # break remaining ties
    valid = np.ones((1, 5), bool)
    got = np.asarray(
        hungarian_assign(jnp.asarray(cost), jnp.asarray(valid), method="device")
    )
    _check_vs_scipy(got, cost, valid, exact_indices=False)


def test_device_lsap_degenerate_matrices():
    """Degenerate inputs (VERDICT r4 missing #4): the reference falls back
    to a greedy matcher when scipy THROWS (matcher.py:112-119 catches
    infeasible/nonfinite inputs); the device JV solver cannot throw, so
    its behavior on those inputs is pinned here instead.

    - all-equal costs (every assignment optimal): still injective, optimal;
    - nonfinite entries: the PRODUCTION path never passes them (
      compute_cost_matrix zeroes nonfinite costs, matcher.py:105-106
      parity, and pads invalid columns with BIG_COST) — asserted here;
    - a directly-fed +/-inf matrix must still return an injective
      in-range assignment (no hang, no sentinel leak on valid columns)."""
    # complete ties
    cost = np.zeros((2, 12, 6), np.float32)
    valid = np.ones((2, 6), bool)
    got = np.asarray(
        hungarian_assign(jnp.asarray(cost), jnp.asarray(valid), method="device")
    )
    _check_vs_scipy(got, cost, valid, exact_indices=False)

    # the production cost build sanitizes nonfinite entries
    rng = np.random.RandomState(3)
    logits = rng.randn(1, 12, T).astype(np.float32)
    logits[0, 0, :] = 80.0   # sigmoid==1 -> -log(1-p+eps) large but finite
    boxes = rng.uniform(0.1, 0.9, (1, 12, 4)).astype(np.float32)
    gtb = rng.uniform(0.3, 0.7, (1, 4, 4)).astype(np.float32)
    pm = np.zeros((1, 4, T), np.float32)
    pm[:, :, 1:3] = 1
    gv = np.asarray([[True, True, False, False]])
    C = np.asarray(compute_cost_matrix(
        jnp.asarray(logits), jnp.asarray(boxes), jnp.asarray(gtb),
        jnp.asarray(pm), jnp.asarray(gv),
    ))
    assert np.isfinite(C).all()

    # direct +/-inf feed: bounded, injective, in-range on valid columns
    cost = rng.randn(1, 10, 5).astype(np.float32)
    cost[0, 2, :] = np.inf
    cost[0, :, 3] = -np.inf
    valid = np.ones((1, 5), bool)
    got = np.asarray(
        hungarian_assign(jnp.asarray(cost), jnp.asarray(valid), method="device")
    )
    rows = got[0]
    assert (rows < 10).all()
    assert len(set(rows.tolist())) == len(rows)


def test_minsum_matcher():
    """SimpleMinsumMatcher (reference matcher.py:123-201, matcher_type
    config): per-GT argmin over queries, collisions allowed, sentinel on
    invalid slots — and the criterion runs end to end with it."""
    from open_groundingdino_tpu.models.matcher import minsum_assign

    rng = np.random.RandomState(5)
    cost = rng.randn(3, 20, 6).astype(np.float32)
    valid = rng.rand(3, 6) > 0.3
    got = np.asarray(minsum_assign(jnp.asarray(cost), jnp.asarray(valid)))
    expect = cost.argmin(axis=1)
    assert (got[valid] == expect[valid]).all()
    assert (got[~valid] == 20).all()

    logits, boxes, gt_boxes, pos_maps, gvalid = _inputs()
    crit = SetCriterion(num_queries=Q, matcher_type="SimpleMinsumMatcher")
    outputs = {
        "pred_logits": jnp.asarray(logits),
        "pred_boxes": jnp.asarray(boxes),
        "text_mask": jnp.ones((B, T), bool),
    }
    total, losses = jax.jit(
        lambda o, gb, pm, gv: crit(o, gb, pm, gv)
    )(outputs, jnp.asarray(gt_boxes), jnp.asarray(pos_maps),
      jnp.asarray(gvalid))
    assert np.isfinite(float(total))
    assert "loss_ce" in losses

    import pytest as _pytest
    with _pytest.raises(AssertionError):
        SetCriterion(matcher_type="NoSuchMatcher")


def test_one_hot_scatter():
    _, _, _, pos_maps, valid = _inputs()
    src = np.full((B, G), Q, np.int32)
    src[0, :3] = [4, 7, 0]
    src[1] = [1, 2, 3, 4, 5]
    oh = np.asarray(
        build_one_hot_targets(
            jnp.asarray(src), jnp.asarray(pos_maps), jnp.asarray(valid), Q
        )
    )
    np.testing.assert_array_equal(oh[0, 4], pos_maps[0, 0])
    np.testing.assert_array_equal(oh[0, 7], pos_maps[0, 1])
    np.testing.assert_array_equal(oh[0, 0], pos_maps[0, 2])
    # invalid GT rows contribute nothing
    assert oh[0].sum() == pos_maps[0, :3].sum()
    assert oh[1].sum() == pos_maps[1].sum()


def _outputs_from(logits, boxes):
    return {
        "pred_logits": jnp.asarray(logits),
        "pred_boxes": jnp.asarray(boxes),
        "text_mask": jnp.ones((B, T), bool),
        "aux_outputs": [
            {"pred_logits": jnp.asarray(logits), "pred_boxes": jnp.asarray(boxes)}
        ],
        "interm_outputs": {
            "pred_logits": jnp.asarray(logits),
            "pred_boxes": jnp.asarray(boxes),
        },
    }


def test_perfect_predictions_low_loss():
    crit = SetCriterion(num_queries=Q)
    _, _, gt_boxes, pos_maps, valid = _inputs()
    # construct predictions equal to GT with confident logits on GT tokens
    logits = np.full((B, Q, T), -20.0, np.float32)
    boxes = np.tile(gt_boxes[:, :1], (1, Q, 1)).copy()
    boxes[:, :G] = gt_boxes
    for b in range(B):
        for g in range(G):
            if valid[b, g]:
                logits[b, g] = np.where(pos_maps[b, g] > 0, 20.0, -20.0)
    total, losses = crit(
        _outputs_from(logits, boxes), jnp.asarray(gt_boxes),
        jnp.asarray(pos_maps), jnp.asarray(valid),
    )
    assert float(losses["loss_bbox"]) < 1e-6
    assert float(losses["loss_giou"]) < 1e-5
    assert float(losses["loss_ce"]) < 1e-3
    assert float(total) < 1e-2


def test_criterion_jit_and_grad():
    # jax-0.9.0 executable-cache bug (see NOTE below) is test-order
    # sensitive; start from a clean trace cache
    jax.clear_caches()
    crit = SetCriterion(num_queries=Q)
    logits, boxes, gt_boxes, pos_maps, valid = _inputs(3)

    # NOTE: jit only the OUTERMOST transform, with device arrays as
    # arguments.  Reusing one jitted callable both under grad and directly
    # trips a jax-0.9.0 executable-cache bug on this stack ("Execution
    # supplied N buffers but compiled program expected M").
    def loss_fn(lg, bx, gtb, gpm, gv):
        total, _ = crit(_outputs_from(lg, bx), gtb, gpm, gv)
        return total

    grad_fn = jax.jit(jax.grad(loss_fn, argnums=(0, 1)))
    loss_jit = jax.jit(loss_fn)

    args = (
        jnp.asarray(gt_boxes), jnp.asarray(pos_maps), jnp.asarray(valid)
    )
    g_lg, g_bx = grad_fn(jnp.asarray(logits), jnp.asarray(boxes), *args)
    assert np.isfinite(np.asarray(g_lg)).all()
    assert np.isfinite(np.asarray(g_bx)).all()
    # improving predictions lowers loss
    l0 = float(loss_jit(jnp.asarray(logits), jnp.asarray(boxes), *args))
    l1 = float(
        loss_jit(
            jnp.asarray(logits) - 0.5 * g_lg,
            jnp.asarray(boxes) - 0.05 * g_bx,
            *args,
        )
    )
    assert l1 < l0


def test_safe_global_norm_no_overflow():
    from open_groundingdino_tpu.parallel.optim import (
        safe_clip_by_global_norm, safe_global_norm,
    )
    big = {"a": jnp.full((4, 4), 1e20, jnp.float32), "b": jnp.ones((3,))}
    n = float(safe_global_norm(big))
    assert np.isfinite(n) and n > 1e20
    clip = safe_clip_by_global_norm(0.1)
    state = clip.init(big)
    clipped, _ = clip.update(big, state)
    cn = float(safe_global_norm(clipped))
    assert np.isfinite(cn) and abs(cn - 0.1) < 1e-3
    # naive optax norm overflows on the same input
    import optax
    assert not np.isfinite(float(optax.global_norm(big)))
