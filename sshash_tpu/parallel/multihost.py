"""Multi-host execution helpers (jax.distributed + global meshes).

The sharded engine (sharded.py) is host-count agnostic: `shard_map` over a
Mesh built from `jax.devices()` works identically whether the devices live
on one host or many — XLA routes the `ppermute`/`psum` combines over ICI
within a slice and DCN across slices (SURVEY.md §2.5). What multi-host adds
is (1) process bootstrap and (2) host-local data feeding. This module wraps
both. It is exercised for real with 2 processes x 4 CPU devices in
tests/test_multihost.py (gloo cross-process collectives), and degrades to
no-ops single-process.

Recipe (one process per host):

    from sshash_tpu.parallel import multihost
    multihost.initialize()                   # jax.distributed bootstrap
    mesh = multihost.global_mesh(bucket=4)   # all hosts' devices
    eng = ShardedEngine(index, mesh)         # same code as single-host
    # feed each host its own rows, then assemble the global batch:
    local = multihost.host_local_batch(kmers, mesh)
    garr = multihost.make_global_batch(local, mesh, kmers.shape)
    res, report = eng.lookup_device(garr)
    # or simply eng.lookup_multiprocess(kmers) with the global batch

Index construction at multi-host scale reuses the out-of-core builder's
hash-range decomposition (builder/external.py): every host scans its input
shard and routes tuples by minimizer-hash range; ranges are value-disjoint,
so each host assembles its assigned MPHF partitions independently and the
results concatenate — the same invariant that makes the single-host spill
build bit-identical to the in-RAM build. This is implemented:
builder/distributed.py `scan_shard` runs on any process/host that sees the
spill directory (`--scan-procs N` demonstrates it with local processes).
"""

import numpy as np


def initialize(coordinator_address=None, num_processes=None, process_id=None):
    """jax.distributed bootstrap (no-op when single-process or already
    initialized). Arguments default to the JAX_* environment variables.
    On CPU fleets set jax_cpu_collectives_implementation=gloo first."""
    import jax

    if num_processes in (None, 1) and coordinator_address is None:
        import os

        if "JAX_COORDINATOR_ADDRESS" not in os.environ:
            return False  # single-process: nothing to do
    try:
        jax.distributed.initialize(coordinator_address=coordinator_address,
                                   num_processes=num_processes,
                                   process_id=process_id)
        return True
    except RuntimeError:  # already initialized
        return False


def global_mesh(bucket=None, axis_names=("data", "bucket")):
    """2D mesh over ALL processes' devices (jax.devices() is global after
    jax.distributed.initialize)."""
    import jax
    from jax.sharding import Mesh

    devices = np.asarray(jax.devices())
    n = devices.size
    if bucket is None:
        bucket = 2 if n % 2 == 0 and n >= 2 else 1
    if n % bucket:
        raise ValueError(f"{n} devices not divisible by bucket={bucket}")
    return Mesh(devices.reshape(n // bucket, bucket), axis_names)


def _data_sharding(mesh, shape, data_axis):
    from jax.sharding import NamedSharding, PartitionSpec

    spec = PartitionSpec(*([data_axis] + [None] * (len(shape) - 1)))
    return NamedSharding(mesh, spec)


def local_row_range(mesh, n, data_axis="data", ndim=1):
    """[lo, hi) rows of a length-n batch owned by THIS process's devices
    under P(data_axis) sharding over `mesh` — derived from the sharding's
    device->index map, NOT from a uniform process_index split (with a
    nontrivial mesh layout the rows a host feeds need not be a uniform
    split)."""
    sh = _data_sharding(mesh, (n,) + (1,) * (ndim - 1), data_axis)
    idx_map = sh.addressable_devices_indices_map((n,) + (1,) * (ndim - 1))
    ranges = set()
    for idx in idx_map.values():
        s = idx[0]
        ranges.add((s.start or 0, n if s.stop is None else s.stop))
    lo = min(r[0] for r in ranges)
    hi = max(r[1] for r in ranges)
    cur = lo
    for a, b in sorted(ranges):
        if a > cur:
            raise ValueError(
                "this process's rows are not contiguous on the data axis; "
                "feed per-device with jax.make_array_from_single_device_arrays")
        cur = max(cur, b)
    assert cur == hi
    return lo, hi


def host_local_batch(global_array, mesh, data_axis="data"):
    """Slice a conceptually-global batch down to the rows THIS process's
    devices own under P(data_axis) over `mesh`."""
    lo, hi = local_row_range(mesh, len(global_array), data_axis,
                             np.ndim(global_array))
    return global_array[lo:hi]


def make_global_batch(local_rows, mesh, global_shape, data_axis="data"):
    """Assemble the global sharded device array from THIS process's rows
    (the output of host_local_batch). Single-process it is a plain
    device_put; multi-process it uses
    jax.make_array_from_process_local_data so each host uploads only its
    own rows."""
    import jax

    local_rows = np.asarray(local_rows)
    sh = _data_sharding(mesh, global_shape, data_axis)
    if jax.process_count() == 1:
        return jax.device_put(local_rows, sh)
    return jax.make_array_from_process_local_data(sh, local_rows,
                                                  tuple(global_shape))
