"""Test configuration: force a virtual 8-device CPU mesh.

Multi-chip hardware is not available in CI; sharding tests run on
xla_force_host_platform_device_count=8 CPU devices, mirroring how the driver
dry-runs the multi-chip path (see __graft_entry__.dryrun_multichip).
"""

import os

# Force CPU: the ambient environment preselects the axon TPU platform with
# remote compilation, which is the bench path, not the test path.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
