"""Multi-host execution helpers (jax.distributed + global meshes).

The sharded engine (sharded.py) is host-count agnostic: `shard_map` over a
Mesh built from `jax.devices()` works identically whether the devices live
on one host or many — XLA routes the `ppermute`/`psum` combines over ICI
within a slice and DCN across slices (SURVEY.md §2.5). What multi-host adds
is (1) process bootstrap and (2) host-local data feeding. This module wraps
both; it is exercised single-process in CI (this environment has one host)
and carries the documented recipe for real fleets.

Recipe (one process per host):

    from sshash_tpu.parallel import multihost
    multihost.initialize()                   # jax.distributed bootstrap
    mesh = multihost.global_mesh(bucket=4)   # all hosts' devices
    eng = ShardedEngine(index, mesh)         # same code as single-host
    # feed each host its local slice of the read batch:
    batch = multihost.host_local_batch(kmers, mesh)

Index construction at multi-host scale reuses the out-of-core builder's
hash-range decomposition (builder/external.py): every host scans its input
shard and routes tuples by minimizer-hash range; ranges are value-disjoint,
so each host assembles its assigned MPHF partitions independently and the
results concatenate — the same invariant that makes the single-host spill
build bit-identical to the in-RAM build.
"""

import numpy as np


def initialize(coordinator_address=None, num_processes=None, process_id=None):
    """jax.distributed bootstrap (no-op when single-process or already
    initialized). Arguments default to the JAX_* environment variables."""
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


def host_local_batch(global_array, mesh, data_axis="data"):
    """Slice a conceptually-global batch down to this process's rows (each
    host feeds only its own shard; jax.make_array_from_process_local_data
    assembles the global array)."""
    import jax

    n_proc = jax.process_count()
    pid = jax.process_index()
    n = len(global_array)
    per = -(-n // n_proc)
    return global_array[pid * per : (pid + 1) * per]
