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


def pytest_collection_modifyitems(config, items):
    """Pin full-model integration tests to run LAST, explicitly (not via
    alphabetical test_zz_ naming): compiling the full-model grad program
    corrupts jax-0.9.0's in-process executable cache for later unrelated jit
    programs (see tests/test_zz_model_full.py docstring).  Robust under -k
    filters and reordering plugins."""
    last = [it for it in items if "test_zz_model_full" in str(it.fspath)]
    rest = [it for it in items if "test_zz_model_full" not in str(it.fspath)]
    items[:] = rest + last


def pytest_addoption(parser):
    parser.addoption(
        "--regen-goldens", action="store_true", default=False,
        help="regenerate tests/goldens/*.npz (only after an intended "
             "semantic change)",
    )
