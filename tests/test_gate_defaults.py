"""Measured-defaults contract: the env-gate defaults compiled into the
package must stay exactly the configuration the driver bench measured
(BENCH_NOTES round-3 trail, 30.277 img/s fwd / 0.5182 s train step).

Round 1 shipped an unmeasured kernel rewrite at HEAD and the recorded
bench regressed 9.05 -> 6.39 (VERDICT r1); this test makes that mistake
loud: flipping any default requires editing BOTH the source and this
table, and the table's docstring demands a same-day on-chip A/B number."""
import re
from pathlib import Path

SRC = Path(__file__).resolve().parents[1] / "open_groundingdino_tpu"

# gate -> default the bench measured (flip ONLY with a new measured row in
# BENCH_NOTES.md)
MEASURED_DEFAULTS = {
    # NOTE (round 4): measured dead-end variant PATHS were deleted outright
    # (MSDA_SSA_BAND, MSDA_MP_V2, MSDA_BWD_V2, MSDA_BWD_CCP, MSDA_BWD_GV_MP,
    # MSDA_BANDED_MP_BWD, SWIN_BHND, SWIN_ATTN_PALLAS, LN_PALLAS,
    # LN_PALLAS_RES, MLP_PALLAS) — BENCH_NOTES keeps their rows; this table
    # now pins only gates whose code paths still exist.
    "MSDA_BANDED": "1",
    "MSDA_BANDED_DEC": "1",
    "MSDA_BANDED_MP": "1",
    "MSDA_BANDED_BWD": "1",
    "MSDA_DEC_SORT_ONCE": "1",
    "MSDA_XY": "1",              # measured 28.121 fwd, 0.5568 train (2026-08-19)
    "MSDA_BAND": "4",
    "MSDA_QBLOCK": "256",        # measured 30.277 fwd / 0.5182 s train at
                                 # band 4 (2026-08-19); 128 was 28.121/0.5568
    "MSDA_BAND_BWD": "0",        # 0 = follow MSDA_BAND; 2 and 8 measured
                                 # dead ends (0.527/0.558 vs 0.521 s/step)
    "SWIN_HEADLOOP": "1",        # measured 28.027 vs 27.779 fwd, train
                                 # neutral 0.5627 vs 0.5639 (2026-08-19)
    "REMAT_SAVE_KERNELS": "1",   # measured 0.6162 vs 0.6270 s/step (2026-08-19)
    "ENC_TAKE_GATHER": "1",      # measured 0.4989 vs 0.5061 s/step
                                 # same-session (2026-08-19): gather-based
                                 # VJPs for the encoder's injective takes
    "FUSION_RV_SLICES": "1",     # measured 0.5059 vs 0.5128 s/step
                                 # same-session (2026-08-19): per-head lane
                                 # slices for the bwd rv term instead of
                                 # the reshape(B,N,H,D) retile
    "HUNGARIAN_MASKED": "1",     # measured 0.5131 vs 0.5190 s/step
                                 # same-session (2026-08-19): row-mask u
                                 # update replacing the JV scatter-add
    "HUNGARIAN_RR": "1",         # measured 0.4996 vs 0.5070 s/step
                                 # same-session (2026-08-20): JV
                                 # row-reduction pre-pass
    "ENC_SCAN": "0",             # measured -3.0% train / -0.3% fwd
                                 # (2026-08-20); kept as the documented
                                 # fast-compile iteration mode only
    "OPT_FLAT": "0",             # compile-INFEASIBLE on this XLA (23 GB
                                 # T(8,128) relayout of the flat buffer,
                                 # 2026-08-20); env-gated for a future XLA
    "EVAL_PRECAST": "1",         # measured 3.89 -> 7.64 img/s (+96%)
                                 # device-resident eval pipeline
                                 # same-session (2026-08-20): one-time
                                 # device param cast replaces the
                                 # per-dispatch cast_floating
    "MSDA_BWD_GV_BF16": "1",     # measured 0.4974 vs 0.5018 AND 0.4979
                                 # vs 0.4999 s/step same-session
                                 # (2026-08-20): bf16 gv accumulation in
                                 # the banded backward; loss curves clean
}

GATE_RE = re.compile(r"environ\.get\(\s*\"([A-Z0-9_]+)\"\s*,\s*\"([^\"]*)\"")


def _collect():
    found = {}
    for p in SRC.rglob("*.py"):
        for name, default in GATE_RE.findall(p.read_text()):
            if name in MEASURED_DEFAULTS:
                found.setdefault(name, set()).add(default)
    return found


def test_gate_defaults_match_measured_configuration():
    found = _collect()
    for name, want in MEASURED_DEFAULTS.items():
        assert name in found, f"gate {name} no longer exists in source"
        assert found[name] == {want}, (
            f"{name} default changed to {found[name]} — measured default is "
            f"{want!r}; land a measured BENCH_NOTES row before flipping"
        )
