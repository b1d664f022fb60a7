"""Thread-parallel build: bit-identical output at any thread count (the
reference's -t flag; scan chunks, parallel tuple sort, MPHF partition pilot
searches all run on worker threads)."""

import numpy as np

from sshash_tpu import BuildConfig, Dictionary
from sshash_tpu import native

from conftest import SE_K31
from test_external_build import _assert_index_equal


def test_threads_bit_identical():
    """threads=2 must produce the EXACT index of threads=1, including the
    partitioned-MPHF internals (per-partition sub-seeds are deterministic
    and order-independent)."""
    avg = 20_000  # force a multi-partition MPHF so partitions parallelize
    d1 = Dictionary.build(SE_K31, BuildConfig(k=31, m=13, verbose=False,
                                              avg_partition_size=avg))
    d2 = Dictionary.build(SE_K31, BuildConfig(k=31, m=13, verbose=False,
                                              avg_partition_size=avg,
                                              threads=2))
    _assert_index_equal(d1.index, d2.index)


def test_native_sort_tuples_matches_lexsort(rng):
    """The native chunked parallel sort must be bit-identical to the stable
    np.lexsort((pos, minimizer)) — including full-tie stability (canonical
    builds emit duplicate (minimizer, pos) tuples)."""
    if not native.available():
        import pytest

        pytest.skip("native library unavailable")
    n = 300_000
    mn = rng.integers(0, 1 << 20, n, dtype=np.uint64)  # many key collisions
    pos = rng.integers(0, 1 << 8, n, dtype=np.uint64)  # many full ties
    want = np.lexsort((pos, mn))
    for threads in (1, 2, 5):
        got = native.sort_tuples(mn, pos, threads)
        np.testing.assert_array_equal(got, want, err_msg=f"threads={threads}")


def test_lambda_flag_builds_and_answers(rng):
    """-a analog: a non-default pilot-search lambda builds a working index
    (different MPHF geometry, same query semantics)."""
    from sshash_tpu import oracle

    d = Dictionary.build(SE_K31, BuildConfig(k=31, m=13, verbose=False,
                                             lmbda=7.0))
    idx = d.index
    ids = rng.integers(0, idx.num_kmers, 1024)
    km = oracle.access(idx, ids)
    got = oracle.lookup(idx, km)
    np.testing.assert_array_equal(got["kmer_id"], ids.astype(np.uint64))
