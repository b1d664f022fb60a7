"""Regression tests for the round-1 advisor findings (ADVICE.md)."""

import numpy as np
import pytest

from sshash_tpu import BuildConfig, Dictionary
from sshash_tpu import kmer as K
from sshash_tpu import oracle


def _write_fasta(path, seqs):
    with open(path, "w") as f:
        for i, s in enumerate(seqs):
            f.write(f">{i}\n{s}\n")


def _random_distinct_kmer_strings(rng, k, n):
    """n length-k strings, all kmers distinct under RC equivalence."""
    seen = set()
    out = []
    while len(out) < n:
        s = "".join(rng.choice(list("ACGT"), size=k))
        canon = min(s, K.revcomp_str(s.encode()))
        if canon in seen:
            continue
        seen.add(canon)
        out.append(s)
    return out


def test_access_with_length_k_strings(tmp_path, rng):
    """ADVICE high: make_access's block-hint bound must hold in KMER-ID
    space, where up to 32 single-kmer strings can share a 32-id block."""
    k = 31
    seqs = _random_distinct_kmer_strings(rng, k, 200)
    path = tmp_path / "short.fa"
    _write_fasta(path, seqs)
    d = Dictionary.build(str(path), BuildConfig(k=k, m=13, verbose=False))
    eng = d.to_device()
    assert eng.cfg.access_C > 32 // k + 1  # the old bound is too small here
    ids = np.arange(d.num_kmers(), dtype=np.uint32)
    np.testing.assert_array_equal(oracle.access(d.index, ids), eng.access(ids))
    # and mixed short+long strings
    seqs2 = seqs[:50] + ["".join(rng.choice(list("ACGT"), size=400))]
    path2 = tmp_path / "mixed.fa"
    _write_fasta(path2, seqs2)
    d2 = Dictionary.build(str(path2), BuildConfig(k=k, m=13, verbose=False))
    eng2 = d2.to_device()
    ids2 = np.arange(d2.num_kmers(), dtype=np.uint32)
    np.testing.assert_array_equal(oracle.access(d2.index, ids2), eng2.access(ids2))


def test_sharded_report_unpadded_counts(dict_k31, rng):
    """ADVICE medium: the psum'd lookup report must not count pad lanes."""
    from sshash_tpu.parallel import ShardedEngine, make_mesh

    index = dict_k31.index
    eng = ShardedEngine(index, make_mesh(shape=(4, 2)))
    n = 515  # deliberately not a multiple of the data axis (4)
    ids = rng.integers(0, index.num_kmers, n)
    kmers = oracle.access(index, ids)
    got, report = eng.lookup(kmers)
    assert report["num_kmers"] == n
    assert report["num_positive"] == n  # all positive; padding must not inflate
    # mostly-negative batch: padded lanes replicate a negative -> would have
    # undercounted nothing but overcounted num_kmers
    neg = rng.integers(0, 1 << 62, (n, index.kmer_words64), dtype=np.uint64)
    neg &= np.uint64((1 << min(2 * index.k, 63)) - 1)
    gotn, repn = eng.lookup(neg)
    want = int((oracle.lookup(index, neg)["kmer_id"] != np.uint64(0xFFFFFFFFFFFFFFFF)).sum())
    assert repn["num_kmers"] == n
    assert repn["num_positive"] == want


def test_sequence_reader_single_pass(tmp_path):
    """ADVICE low: a second iteration must raise, not double-count."""
    from sshash_tpu.builder.parse import SequenceReader

    path = tmp_path / "x.fa"
    _write_fasta(path, ["ACGTACGTACGT"])
    r = SequenceReader(str(path), k=5)
    list(r)
    with pytest.raises(RuntimeError):
        list(r)


def test_permute_rejects_short_sequences(tmp_path):
    """ADVICE low: permute must raise on sequences shorter than k (matching
    the build parser), not silently drop records."""
    from sshash_tpu.cover import permute_file

    path = tmp_path / "w.fa"
    with open(path, "w") as f:
        f.write(">s LN:i:4 ab:Z:2 2\nACG\n")  # len 3 < k=5
    with pytest.raises(ValueError):
        permute_file(str(path), 5, str(tmp_path / "out.fa"))
