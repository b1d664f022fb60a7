"""Partitioned MPHF (PTHash partitioned layout): minimality, device-eval
parity through the full engine, and serialization."""

import numpy as np
import pytest

from sshash_tpu import BuildConfig, Dictionary
from sshash_tpu import kmer as K
from sshash_tpu import oracle
from sshash_tpu.mphf import MPHF, PartitionedMPHF

from conftest import SE_K31


def test_partitioned_is_minimal_perfect():
    rng = np.random.default_rng(11)
    n = 300_000
    keys = np.unique(rng.integers(0, 1 << 63, 2 * n, dtype=np.uint64))[:n]
    f = PartitionedMPHF.build_u64(keys, seed=1, avg_partition_size=40_000)
    assert f.num_partitions == 8
    pos = f(keys)
    assert pos.min() == 0 and pos.max() == n - 1
    assert len(np.unique(pos)) == n  # perfect + minimal
    # stable under reconstruction from fields (serialization contract)
    g = PartitionedMPHF(f.n, f.seed, f.num_partitions, f.part_table,
                        f.part_buckets, f.seeds, f.pilots, f.part_n, f.cum_n,
                        f.remap, f.remap_off)
    assert np.array_equal(g(keys[:1000]), pos[:1000])


def test_partitioned_expand_matches_raw_slots():
    rng = np.random.default_rng(12)
    n = 50_000
    keys = np.unique(rng.integers(0, 1 << 63, 2 * n, dtype=np.uint64))[:n]
    f = PartitionedMPHF.build_u64(keys, seed=3, avg_partition_size=9_000)
    vals = rng.integers(0, 1 << 31, n, dtype=np.uint32)
    expanded = f.expand_to_slots(vals)
    from sshash_tpu import hashing as H
    h = H.hash64_u64(keys, np.uint64(f.seed))
    np.testing.assert_array_equal(expanded[f.raw_slots(h)], vals[f(keys)])


@pytest.fixture(scope="module")
def dict_partitioned():
    # force ~18 partitions on the bundled salmonella minimizers
    return Dictionary.build(SE_K31, BuildConfig(k=31, m=13, verbose=False,
                                                avg_partition_size=20_000))


def test_partitioned_dictionary_parity(dict_partitioned, dict_k31, rng):
    """A dictionary whose minimizer MPHF is partitioned must answer every
    query identically to the single-table build."""
    d = dict_partitioned
    assert isinstance(d.index.minimizer_mphf, PartitionedMPHF)
    assert isinstance(dict_k31.index.minimizer_mphf, MPHF)
    ids = rng.integers(0, d.num_kmers(), 4096)
    kms = dict_k31.access(ids)  # same input file => same id space
    np.testing.assert_array_equal(d.access(ids), kms)
    half = len(ids) // 2
    kms[:half] = K.revcomp_kmers(kms[:half], 31)
    want = dict_k31.lookup(kms)
    got = d.lookup(kms)
    for key in ("kmer_id", "kmer_offset", "string_id", "kmer_orientation"):
        np.testing.assert_array_equal(got[key], want[key], err_msg=key)
    # device engine parity (partitioned mphf eval kernel)
    eng = d.to_device()
    dev = eng.lookup(kms)
    for key in ("kmer_id", "kmer_offset", "string_id", "kmer_orientation"):
        np.testing.assert_array_equal(dev[key], want[key], err_msg=f"device {key}")
    neg = rng.integers(0, 1 << 62, (2048, 1), dtype=np.uint64)
    np.testing.assert_array_equal(eng.lookup(neg)["kmer_id"],
                                  oracle.lookup(d.index, neg)["kmer_id"])


def test_partitioned_save_load_roundtrip(dict_partitioned, tmp_path, rng):
    d = dict_partitioned
    path = str(tmp_path / "part.npz")
    d.save(path)
    d2 = Dictionary.load(path)
    assert isinstance(d2.index.minimizer_mphf, PartitionedMPHF)
    ids = rng.integers(0, d.num_kmers(), 1024)
    kms = d.access(ids)
    np.testing.assert_array_equal(d2.lookup(kms)["kmer_id"], ids.astype(np.uint64))
    # dir (mmap) format too
    dpath = str(tmp_path / "part_dir")
    d.save(dpath)
    d3 = Dictionary.load(dpath)
    np.testing.assert_array_equal(d3.lookup(kms)["kmer_id"], ids.astype(np.uint64))
