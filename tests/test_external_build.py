"""Out-of-core build: bit-identical arrays vs the in-RAM path, RAM-bounded
spilling exercised, and the device engine answers from the result."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow

from sshash_tpu import BuildConfig, Dictionary
from sshash_tpu.mphf import PartitionedMPHF

from conftest import SE_K31, WEIGHTED_K31


def _assert_index_equal(a, b):
    for name in ("codewords", "mid_load_buckets", "heavy_load_buckets",
                 "begin_buckets_of_size", "strings64", "string_endpoints"):
        np.testing.assert_array_equal(getattr(a, name), getattr(b, name),
                                      err_msg=name)
    fa, fb = a.minimizer_mphf, b.minimizer_mphf
    assert isinstance(fa, PartitionedMPHF) and isinstance(fb, PartitionedMPHF)
    for name in ("n", "seed", "num_partitions", "part_table", "part_buckets"):
        assert getattr(fa, name) == getattr(fb, name), name
    for name in ("seeds", "pilots", "part_n", "cum_n", "remap", "remap_off"):
        np.testing.assert_array_equal(getattr(fa, name), getattr(fb, name),
                                      err_msg=name)
    assert len(a.skew_partitions) == len(b.skew_partitions)
    for pa, pb in zip(a.skew_partitions, b.skew_partitions):
        np.testing.assert_array_equal(pa.positions, pb.positions)
        np.testing.assert_array_equal(pa.mphf.pilots, pb.mphf.pilots)
        np.testing.assert_array_equal(pa.hindex, pb.hindex)


@pytest.mark.parametrize("m,canonical", [(13, False), (15, True)])
def test_external_build_bit_identical(tmp_path, m, canonical):
    """Same avg_partition_size => the spilled ranged build must produce the
    EXACT arrays of the in-RAM build (layout order is partition-major within
    each size class in both)."""
    avg = 20_000  # force multiple partitions on salmonella's minimizers
    ram = dict(ram_limit_mb=8, tmp_dir=str(tmp_path))  # tiny cap -> many spills
    d_ext = Dictionary.build(SE_K31, BuildConfig(k=31, m=m, canonical=canonical,
                                                 verbose=False,
                                                 avg_partition_size=avg, **ram))
    d_ram = Dictionary.build(SE_K31, BuildConfig(k=31, m=m, canonical=canonical,
                                                 verbose=False,
                                                 avg_partition_size=avg))
    _assert_index_equal(d_ext.index, d_ram.index)
    assert d_ext.index.stats["num_minimizers"] == d_ram.index.stats["num_minimizers"]
    assert d_ext.index.stats["max_bucket_size"] == d_ram.index.stats["max_bucket_size"]


def test_external_build_weighted_and_queries(tmp_path, rng):
    d = Dictionary.build(WEIGHTED_K31,
                         BuildConfig(k=31, m=13, weighted=True, verbose=False,
                                     avg_partition_size=50_000,
                                     ram_limit_mb=8, tmp_dir=str(tmp_path)))
    ids = rng.integers(0, d.num_kmers(), 2048)
    kms = d.access(ids)
    res = d.lookup(kms)
    np.testing.assert_array_equal(res["kmer_id"], ids.astype(np.uint64))
    assert (d.weight(ids) > 0).all()
    eng = d.to_device()
    np.testing.assert_array_equal(eng.lookup(kms)["kmer_id"], ids.astype(np.uint64))
