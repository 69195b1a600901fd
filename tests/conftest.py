"""Test configuration: force a virtual 8-device CPU mesh.

Multi-chip hardware is not available in CI; sharding tests run on
xla_force_host_platform_device_count=8 CPU devices, mirroring how the driver
dry-runs the multi-chip path (see __graft_entry__.dryrun_multichip).

The ambient environment preselects the axon TPU platform (remote-compile
tunnel) via a sitecustomize hook that overrides JAX_PLATFORMS, so the
override must go through jax.config after import. The axon TPU is the bench
path (bench.py), never the test path.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: the limb kernels compile once per shape; cache
# them across test runs to keep the suite fast.
jax.config.update("jax_compilation_cache_dir", "/root/.cache/zelana_tpu_xla")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
