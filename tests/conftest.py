"""Test configuration: force an 8-device virtual CPU mesh.

Multi-chip TPU hardware is not available in CI; all sharding logic is
exercised on a virtual CPU mesh (jax's xla_force_host_platform_device_count),
mirroring the reference's single-host "fake cluster" test strategy
(ref: tests/integration/distributed/distributed_dataset_test.py:34-60 spawns
localhost process groups instead of a real cluster).
"""

import os

# Force-override (not setdefault): the CI/dev environment may export
# JAX_PLATFORMS pointing at a remote single TPU chip; sharding tests need
# the 8-device virtual CPU mesh and must never ride the remote tunnel.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platform_name", "cpu")
