"""Test configuration: force an 8-device CPU mesh before JAX initializes.

Multi-chip sharding tests run on virtual CPU devices
(``--xla_force_host_platform_device_count=8``), emulating the >=2-replica
collectives the reference requires (reference: arguments.py:15-21 forces
world_size >= 2 for shuffle-BN).
"""
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

# The axon TPU plugin force-rewrites jax_platforms to "axon,cpu" on import,
# clobbering the env var — pin the config explicitly before any device use.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert jax.devices()[0].platform == "cpu", (
    "tests must run on the virtual CPU mesh, not the TPU")
assert jax.device_count() == 8, "expected 8 virtual CPU devices"

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REFERENCE_ROOT = "/root/reference"
