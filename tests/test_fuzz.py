"""Randomized end-to-end fuzz: random tiny collections x random (k, m,
canonical, weighted) -> build -> full self-check + oracle/device parity.

Covers corner shapes the bundled data doesn't: strings of length exactly k,
k at word boundaries (16, 32, 33), tiny m, weighted runs crossing sequence
boundaries.
"""

import numpy as np
import pytest

pytestmark = pytest.mark.slow

from sshash_tpu import BuildConfig, Dictionary
from sshash_tpu import kmer as K
from sshash_tpu import oracle
from sshash_tpu.check import (
    check_dictionary,
    check_iterator,
    check_navigation,
    check_negative_lookups,
    check_string_iterator,
)

CASES = [
    # (seed, k, m, canonical, weighted, num_strings, min_len, max_len)
    (1, 31, 13, False, False, 40, 31, 200),
    (2, 31, 15, True, False, 40, 31, 120),
    (3, 16, 7, False, False, 60, 16, 90),     # k at one u32 word exactly
    (4, 33, 11, True, False, 30, 33, 150),    # k spans 3 u32 words
    (5, 21, 9, False, True, 50, 21, 100),     # weighted
    (6, 63, 25, True, False, 20, 63, 260),    # two-word kmers
    (7, 13, 5, False, False, 80, 13, 40),     # tiny k, strings near k
    (8, 31, 13, True, True, 40, 31, 120),     # weighted + canonical combo
    (9, 47, 17, False, False, 25, 47, 200),   # k=47 (reference mid-size)
    (10, 65, 21, False, False, 15, 65, 260),  # k>63: beyond the reference's
                                              # bitpack cap (bitpack.hpp:9-63)
    (11, 65, 23, True, False, 15, 65, 200),   # k>63 canonical
]


def _gen_unique(rng, n, lo, hi, k):
    """Random collection with NO duplicate kmers under RC-equality (the
    reference's input contract: 'without duplicate kmers', RCs equal)."""
    while True:
        seqs = ["".join("ACGT"[c] for c in rng.integers(0, 4, int(rng.integers(lo, hi + 1))))
                for _ in range(n)]
        seen = set()
        dup = False
        for s in seqs:
            for i in range(len(s) - k + 1):
                km = s[i : i + k]
                canon = min(km, K.revcomp_str(km))
                if canon in seen:
                    dup = True
                    break
                seen.add(canon)
            if dup:
                break
        if not dup:
            return seqs


def _write_fasta(path, rng, n, lo, hi, weighted, k):
    seqs = _gen_unique(rng, n, lo, hi, k)
    with open(path, "w") as f:
        for i, seq in enumerate(seqs):
            L = len(seq)
            if weighted:
                w = rng.integers(1, 5, L - k + 1)
                # make runs: smooth by repeating values
                w = np.repeat(w[:: 3], 3)[: L - k + 1]
                f.write(f">{i} LN:i:{L} ab:Z:{' '.join(map(str, w))}\n{seq}\n")
            else:
                f.write(f">{i}\n{seq}\n")
    return path


@pytest.mark.parametrize("seed,k,m,canonical,weighted,n,lo,hi", CASES)
def test_fuzz_build_and_verify(tmp_path, seed, k, m, canonical, weighted, n, lo, hi):
    rng = np.random.default_rng(seed * 7919)
    path = _write_fasta(str(tmp_path / "in.fa"), rng, n, lo, hi, weighted, k)
    d = Dictionary.build(path, BuildConfig(k=k, m=m, canonical=canonical,
                                           weighted=weighted, verbose=False))
    index = d.index
    assert index.num_kmers > 0

    # exhaustive self-consistency (host oracle)
    check_dictionary(index)
    check_negative_lookups(index, num=4096, seed=seed)
    check_iterator(index)
    check_string_iterator(index)
    check_navigation(index, d, num=64, seed=seed)

    # device parity on a sample (jitted engine, CPU backend in tests)
    eng = d.to_device()
    ids = rng.integers(0, index.num_kmers, 256)
    kmers = oracle.access(index, ids)
    half = len(ids) // 2
    kmers[:half] = K.revcomp_kmers(kmers[:half], k)
    want = oracle.lookup(index, kmers)
    got = eng.lookup(kmers)
    for key in ("kmer_id", "kmer_offset", "string_id", "kmer_orientation",
                "kmer_id_in_string"):
        np.testing.assert_array_equal(got[key], want[key], err_msg=f"{key} seed={seed}")

    if weighted:
        from sshash_tpu.builder.parse import parse_input

        parsed = parse_input(path, k, weighted=True)
        expanded = np.repeat(parsed.weight_interval_values,
                             np.diff(parsed.weight_interval_lengths.astype(np.int64)))
        np.testing.assert_array_equal(
            d.weight(np.arange(index.num_kmers)), expanded)
