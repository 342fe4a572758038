"""Model-wide matmul precision POLICY pin (VERDICT r4 item 3).

Declared policy (BENCH_NOTES round-5 precision audit):
  - stock-XLA dots (fusion attention, Swin, BERT, heads) run at DEFAULT
    matmul precision — on this stack an f32 dot lowers to a single bf16
    MXU pass, and the production eval path computes in bf16 anyway;
  - the Pallas MSDA/fusion kernels pin their OWN dot precisions
    (HIGHEST for f32 operands, single-pass DEFAULT for bf16 —
    ops/msda_pallas.py, ops/msda_banded.py);
  - nothing in the package may set a GLOBAL precision override: users
    opt into full-f32 numerics with jax.default_matmul_precision(
    'highest') around their own calls (tools/precision_audit.py measures
    the delta + cost), and a silent global flip would invalidate every
    cached program and recorded bench row.

This test makes the third clause a contract, like test_gate_defaults
does for env gates.
"""
import re
from pathlib import Path

SRC = Path(__file__).resolve().parents[1] / "open_groundingdino_tpu"

GLOBAL_OVERRIDES = [
    # config-level global flips (allowed only in user code / tools)
    re.compile(r"jax\.config\.update\(\s*[\"']jax_default_matmul_precision"),
    re.compile(r"default_matmul_precision\s*\("),
]


def test_no_global_matmul_precision_override_in_package():
    hits = []
    for p in SRC.rglob("*.py"):
        text = p.read_text()
        for rx in GLOBAL_OVERRIDES:
            if rx.search(text):
                hits.append((str(p), rx.pattern))
    assert not hits, (
        "global matmul-precision override found in the package — the "
        "declared policy is DEFAULT outside the Pallas kernels; flip only "
        f"with a measured BENCH_NOTES row: {hits}"
    )


def test_kernels_pin_their_own_precision():
    """The Pallas kernels must keep explicit per-dot precision requests
    (HIGHEST for f32 — Mosaic's single-pass f32 dot rounds through bf16)."""
    for name in ("msda_pallas.py", "msda_banded.py"):
        text = (SRC / "ops" / name).read_text()
        assert "Precision.HIGHEST" in text, name
