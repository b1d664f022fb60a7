"""Permute/cover tool: run-minimization validity + weighted index round-trip
(reference tools/permute.cpp, README Example 4: ecoli_sakai 5820->3723 runs)."""

import os
import tempfile

import numpy as np
import pytest

from sshash_tpu.cover import Cover, parse_weighted_headers, permute_file

WEIGHTED = "/root/reference/data/unitigs_stitched/with_weights/ecoli_sakai.ust.k31.fa.gz"
K = 31


def _global_runs(path):
    """Ground truth: weight runs across the whole permuted file in order."""
    runs, prev = 0, None
    with open(path, "rb") as f:
        while True:
            h = f.readline()
            if not h:
                break
            f.readline()
            for w in h[h.index(b"ab:Z:") + 5 :].split():
                if w != prev:
                    runs += 1
                prev = w
    return runs


@pytest.fixture(scope="module")
def permuted(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("perm") / "ecoli_sakai.permuted.fa")
    stats = permute_file(WEIGHTED, K, out)
    return out, stats


def test_run_minimization(permuted):
    out, stats = permuted
    assert stats["num_sequences"] == 2115
    # reference README example 4 achieves 3723 final runs; we must at least
    # match the same ballpark (walks are iteration-order dependent)
    assert stats["final_runs"] <= 3800
    assert stats["final_runs"] < stats["initial_runs"]
    # the predicted run count must equal the true global run count
    assert _global_runs(out) == stats["final_runs"]


def test_permutation_is_bijection(permuted):
    out, stats = permuted
    data = parse_weighted_headers(WEIGHTED, K)
    perm, signs, _ = Cover(data).compute().permutation_and_signs()
    assert sorted(perm) == list(range(data.num_sequences))


def test_permuted_file_preserves_kmer_set(permuted):
    """Permuting reorders/RCs strings; the canonical kmer multiset of the
    collection must be unchanged."""
    out, _ = permuted
    from sshash_tpu import kmer as Km
    from sshash_tpu.builder.parse import parse_input

    a = parse_input(WEIGHTED, K, weighted=False)
    b = parse_input(out, K, weighted=False)
    assert a.num_kmers == b.num_kmers

    def canon_set(parsed):
        words = Km.pack_codes(parsed.codes, pad_words=Km.num_words64(K) + 1)
        ep = parsed.endpoints.astype(np.int64)
        outk = []
        for s in range(len(ep) - 1):
            offs = np.arange(ep[s], ep[s + 1] - K + 1)
            kms = Km.read_kmers_at(words, offs, K)
            rc = Km.revcomp_kmers(kms, K)
            outk.append(np.minimum(kms[:, 0], rc[:, 0]))
        return np.sort(np.concatenate(outk))

    np.testing.assert_array_equal(canon_set(a), canon_set(b))


def test_weighted_build_on_permuted(permuted):
    """Build a weighted index on the permuted file: weights must round-trip
    and occupy fewer bits than on the original order."""
    out, stats = permuted
    from sshash_tpu import BuildConfig, Dictionary
    from sshash_tpu.builder.parse import parse_input

    d_perm = Dictionary.build(out, BuildConfig(k=K, m=13, weighted=True, verbose=False))
    d_orig = Dictionary.build(WEIGHTED, BuildConfig(k=K, m=13, weighted=True, verbose=False))
    assert d_perm.index.weights is not None
    # same number of intervals as predicted runs
    assert len(d_perm.index.weights.interval_value_ids) == stats["final_runs"]
    assert d_perm.index.weights.num_bits() < d_orig.index.weights.num_bits()
    # spot-check weight round-trip on the permuted file
    parsed = parse_input(out, K, weighted=True)
    expanded = np.repeat(parsed.weight_interval_values,
                         np.diff(parsed.weight_interval_lengths.astype(np.int64)))
    ids = np.arange(0, d_perm.num_kmers(), 97)
    np.testing.assert_array_equal(d_perm.weight(ids), expanded[ids])
