"""Test env: CPU backend with 8 virtual devices so pjit/Mesh/psum logic is
exercised without TPU hardware (the capability the torch reference lacks —
its distributed path is only testable on a real cluster)."""
import os
import sys

# force the CPU backend even inside the axon-TPU container: the axon
# sitecustomize pins JAX_PLATFORMS=axon when PALLAS_AXON_POOL_IPS is set
os.environ.pop("PALLAS_AXON_POOL_IPS", None)
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# the axon sitecustomize may have programmatically pinned the platform;
# override it before any backend initialization
jax.config.update("jax_platforms", "cpu")

assert jax.devices()[0].platform == "cpu", "tests must run on the CPU mesh"

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


# Quick tier (`pytest -m quick`, CLAUDE.md workflow): one fast module per
# subsystem — kernels, model blocks, data, eval, matching, config/gates,
# checkpointing, utils.  Keep the tier under ~10 min on the 1-core CPU
# container; `slow`-marked tests inside these modules stay excluded.
QUICK_MODULES = {
    "test_msda.py",            # MSDA XLA reference + wrappers (L0/L1)
    "test_msda_banded.py",     # banded Pallas kernels, interpret parity
    "test_swin.py",            # Swin backbone + converter
    "test_bert.py",            # text tower + 3-D mask injection
    "test_fusion_text_parity.py",  # fusion + text-enhancer torch parity
    "test_box_ops.py",
    "test_matcher_criterion.py",   # Hungarian + SetCriterion
    "test_native_match.py",        # C++ coco_match + device JV
    "test_data_pipeline.py",       # transforms/bucketer/collator
    "test_tokenization.py",
    "test_coco_eval.py",           # evaluator semantics
    "test_config.py",              # SLConfig semantics
    "test_gate_defaults.py",       # measured-defaults contract
    "test_converter_roundtrip.py",
    "test_position_encoding.py",
    "test_utils_misc.py",
    "test_optim.py",               # param groups / schedules
    "test_interleave.py",
}


def pytest_collection_modifyitems(config, items):
    """Pin full-model integration tests to run LAST, explicitly (not via
    alphabetical test_zz_ naming): compiling the full-model grad program
    corrupts jax-0.9.0's in-process executable cache for later unrelated jit
    programs (see tests/test_zz_model_full.py docstring).  Robust under -k
    filters and reordering plugins.

    Also applies the `quick` marker to QUICK_MODULES (minus `slow` tests)."""
    import pytest as _pytest

    for it in items:
        name = os.path.basename(str(it.fspath))
        if name in QUICK_MODULES and it.get_closest_marker("slow") is None:
            it.add_marker(_pytest.mark.quick)
    last = [it for it in items if "test_zz_model_full" in str(it.fspath)]
    rest = [it for it in items if "test_zz_model_full" not in str(it.fspath)]
    items[:] = rest + last


def pytest_addoption(parser):
    parser.addoption(
        "--regen-goldens", action="store_true", default=False,
        help="regenerate tests/goldens/*.npz (only after an intended "
             "semantic change)",
    )
