"""parallel/distributed.py: multi-host glue, unit-tested on one host.

Real multi-host cannot run here; what CAN be tested is the host-slicing
arithmetic (every point owned exactly once, no host over-allocates), the
global mesh construction over the virtual 8-device CPU mesh, and the
single-process no-op path of init_distributed.
"""

import jax
import numpy as np
import pytest

from zelana_tpu.parallel import distributed as D


def test_init_distributed_single_process_is_noop(monkeypatch):
    monkeypatch.delenv("JAX_COORDINATOR_ADDRESS", raising=False)
    monkeypatch.delenv("JAX_NUM_PROCESSES", raising=False)
    assert D.init_distributed() is False


def test_global_mesh_covers_all_devices():
    mesh = D.global_mesh()
    assert mesh.devices.size == len(jax.devices()) == 8
    assert mesh.axis_names == ("dp",)


def test_global_mesh_runs_a_collective():
    from jax.sharding import PartitionSpec as P

    mesh = D.global_mesh()
    x = np.arange(8, dtype=np.float32)
    fn = jax.shard_map(
        lambda v: jax.lax.psum(v, "dp"), mesh=mesh,
        in_specs=P("dp"), out_specs=P(),
    )
    assert float(np.asarray(fn(x))[0]) == x.sum()


@pytest.mark.parametrize("n_total,n_hosts", [
    (1 << 24, 8), (1 << 20, 4), (100, 8), (7, 8), (1, 2), (65536, 3),
])
def test_host_point_slice_partition(monkeypatch, n_total, n_hosts):
    """Slices tile [0, n_total) exactly: disjoint, ordered, complete."""
    slices = []
    for h in range(n_hosts):
        monkeypatch.setattr(jax, "process_index", lambda h=h: h)
        monkeypatch.setattr(jax, "process_count", lambda: n_hosts)
        slices.append(D.host_point_slice(n_total))
    # complete + disjoint coverage
    covered = 0
    for lo, hi in slices:
        assert lo <= hi <= n_total
        assert lo == min(covered, n_total)
        covered = hi if hi > covered else covered
    assert covered == n_total
    # balanced: no slice exceeds ceil(n/h)
    per = -(-n_total // n_hosts)
    assert all(hi - lo <= per for lo, hi in slices)


def test_host_point_slice_single_host(monkeypatch):
    monkeypatch.setattr(jax, "process_index", lambda: 0)
    monkeypatch.setattr(jax, "process_count", lambda: 1)
    assert D.host_point_slice(12345) == (0, 12345)
