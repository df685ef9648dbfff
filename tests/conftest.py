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

# The axon TPU plugin in this image re-forces JAX_PLATFORMS=axon via site hooks,
# so pin the platform through jax.config too (this wins).
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert jax.devices()[0].platform == "cpu", jax.devices()
assert jax.device_count() == 8, jax.devices()
