"""Test configuration: force a virtual 8-device CPU backend.

Must run before jax is imported anywhere (pytest imports conftest first), so that
multi-device sharding logic is testable without TPU hardware — the standard JAX
"fake backend" answer to distributed testing (SURVEY.md §4).
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)
# Keep XLA from oversubscribing the (single) test CPU.
os.environ.setdefault("XLA_PYTHON_CLIENT_PREALLOCATE", "false")

# Hermetic compilation cache: some tests exercise CLI entry points that call
# config.enable_compilation_cache(); without this override they would share
# the production cache at ~/.cache/srcgan_tpu/jax — and a suite run killed
# mid-write can poison it (observed: a truncated entry SEGFAULTS jax's cache
# deserializer on the next read).  A per-run temp dir keeps test artifacts
# out of the real cache and makes every run start clean.
import atexit  # noqa: E402
import shutil  # noqa: E402
import tempfile  # noqa: E402

_jax_cache_dir = tempfile.mkdtemp(prefix="srcgan_test_jax_")
os.environ["SRCGAN_JAX_CACHE"] = _jax_cache_dir
# each process (xdist controller + workers) removes its own dir — without
# this every suite run leaks tens of MB of compiled programs into /tmp
atexit.register(shutil.rmtree, _jax_cache_dir, ignore_errors=True)

# The axon TPU plugin in this image re-forces JAX_PLATFORMS=axon via site hooks,
# so pin the platform through jax.config too (this wins).
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert jax.devices()[0].platform == "cpu", jax.devices()
assert jax.device_count() == 8, jax.devices()


import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_per_module():
    """Cap in-process executable accumulation.

    Thousands of compiled programs alive in one process push the XLA CPU
    client toward a late-run segfault (see addopts note in pyproject.toml);
    dropping the pjit caches between modules keeps the resident compile
    state bounded.  Costs nothing across modules — they compile disjoint
    programs anyway.
    """
    yield
    import jax

    jax.clear_caches()
