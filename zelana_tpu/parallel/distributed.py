"""Multi-host (pod / DCN) initialization + the 2^24-scale MSM plan.

The reference scales across hosts with coordinator->worker HTTP
(forge/crates/prover-coordinator); the TPU-native equivalent is
`jax.distributed` + a global mesh whose collectives ride ICI within a
slice and DCN across hosts (BASELINE config 5: 2^24-point MSM + full
proof pipeline on N >= 2 hosts).

This module is the host-plane glue. It cannot be exercised on this
single-host environment (the driver validates the mesh program on a
virtual device mesh instead — `__graft_entry__.dryrun_multichip`), but the
compute path it feeds is the SAME `parallel.sharded` program: per-host
point shards, run-scan bucket accumulation per device, recursive-halving
reduce-scatter + all-gather allreduce (intra-slice hops first = ICI with
the LARGEST halves, the final log2(n_hosts) hops cross DCN carrying the
smallest — the bandwidth hierarchy and the halving series line up).

2^24-point plan (per BASELINE config 5), with D devices over H hosts:
- each host OWNS only its N/H point slice: `prepare_g1_sharded` is called
  with the host-local slice, so no host ever materializes the full basis
  (2^24 G1 affine points = 1.5 GB total; 8 hosts hold ~190 MB each);
- per-device shard = N/D points -> pool of ~(N/D) * 64 B in HBM plus the
  2-byte/element stream schedule, built by the native C++ scheduler on
  each host for its own shards;
- the reduction exchanges C x 8192 x 4 B = 768 KB per hop regardless of N
  (log2(D) hops) — bandwidth-trivial on both ICI and DCN; MSM scaling is
  therefore compute-bound, and per-chip speed-of-light is set by the
  multiplier rate (docs/PERFORMANCE.md).
"""

from __future__ import annotations

import os

import jax
import numpy as np
from jax.sharding import Mesh


def init_distributed(coordinator_address: str | None = None,
                     num_processes: int | None = None,
                     process_id: int | None = None) -> bool:
    """Initialize jax.distributed from args or the standard env
    (JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID;
    TPU pods auto-detect all three). Returns True when running
    multi-process."""
    addr = coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS")
    nproc = num_processes or int(os.environ.get("JAX_NUM_PROCESSES", "0"))
    pid = process_id if process_id is not None else int(
        os.environ.get("JAX_PROCESS_ID", "0"))
    if not addr and nproc <= 1:
        return False  # single-process: nothing to initialize
    jax.distributed.initialize(
        coordinator_address=addr,
        num_processes=nproc or None,
        process_id=pid,
    )
    return jax.process_count() > 1


def global_mesh(axis: str = "dp") -> Mesh:
    """One mesh over every device of every process. With the default
    device order, consecutive devices are intra-host; the reduce-scatter
    runs its early (largest) hops on ICI and only the final log2(hosts)
    (smallest) hops cross DCN."""
    return Mesh(np.array(jax.devices()), (axis,))


def host_point_slice(n_total: int) -> tuple[int, int]:
    """[start, end) of the point range THIS host owns for an n_total-point
    MSM: each host loads/prepares only its slice (no host materializes the
    full 2^24 basis)."""
    h = jax.process_index()
    nh = jax.process_count()
    per = -(-n_total // nh)
    return h * per, min(n_total, (h + 1) * per)
