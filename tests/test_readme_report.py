"""Pinned query-report anchors on the bundled data.

The reference README (README.md:220-227) publishes an exact report for its
Example 2/3 — but on the `salmonella_100` pangenome, which is NOT bundled in
this checkout, and the reference binary cannot be built here (the pthash
submodule directory is empty, zero egress). This module pins the equivalent
anchor that IS reproducible: the exact streaming-query report of
`SRR5833294.10K.fastq.gz` (the same query file as the README example: 10K
reads x 46 kmers = 460000, matching the published num_kmers) against the
bundled salmonella sets, with the positive count independently verified by a
brute-force membership oracle built from the INPUT FILE (test/check.cpp
style), not from the index. Any regression in parsing, validity counting,
membership, or the searches/extensions derivation breaks these constants.
"""

import numpy as np
import pytest

from sshash_tpu import BuildConfig, Dictionary
from sshash_tpu import kmer as K
from sshash_tpu.streaming import parse_reads

from conftest import DATA, QUERIES_FASTQ

SE_PANGENOME = f"{DATA}/unitigs_stitched/se.ust.k31.fa.gz"

# measured once with the host (oracle) path and pinned; invalid=857 counts
# positions whose k-window covers an N in the reads (pure input property)
PINNED = {
    "num_kmers": 460000,
    "num_positive_kmers": 5,
    "num_negative_kmers": 459138,
    "num_invalid_kmers": 857,
    "num_searches": 5,
    "num_extensions": 0,
}


def _file_kmer_set(path, k):
    """All canonical kmers of the input FASTA — independent of the index."""
    out = []
    for seq in parse_reads(path, fmt="fasta"):
        codes, ok = K.encode_chars(seq)
        assert ok.all()
        words = K.pack_codes(codes, pad_words=K.num_words64(k) + 1)
        kms = K.read_kmers_at(words, np.arange(len(seq) - k + 1), k)
        rc = K.revcomp_kmers(kms, k)
        out.append(np.minimum(kms[:, 0], rc[:, 0]))
    return np.unique(np.concatenate(out))


def _brute_force_report_positives(member, path, k):
    count = 0
    for seq in parse_reads(path):
        if len(seq) < k:
            continue
        codes, ok = K.encode_chars(seq)
        npos = len(seq) - k + 1
        words = K.pack_codes(np.where(ok, codes, 0), pad_words=K.num_words64(k) + 1)
        kms = K.read_kmers_at(words, np.arange(npos), k)
        rc = K.revcomp_kmers(kms, k)
        q = np.minimum(kms[:, 0], rc[:, 0])
        okc = np.concatenate([[0], np.cumsum(ok)])
        valid = (okc[k:] - okc[:-k]) == k
        idx = np.clip(np.searchsorted(member, q), 0, len(member) - 1)
        count += int(((member[idx] == q) & valid).sum())
    return count


@pytest.mark.parametrize("m,canonical", [(15, False), (13, True)])
def test_pinned_streaming_report_se_pangenome(m, canonical):
    """README Examples 2/3 analog: regular m15 and canonical m13 builds must
    produce the SAME report (canonicity affects speed, not membership)."""
    d = Dictionary.build(SE_PANGENOME, BuildConfig(k=31, m=m, canonical=canonical,
                                                   verbose=False))
    rep = d.streaming_query_from_file(QUERIES_FASTQ)
    rep.pop("elapsed_millisec", None)
    assert rep == PINNED


def test_pinned_positive_count_is_ground_truth():
    """The pinned positive count is verified against a brute-force oracle
    built from the input file alone (no index involved)."""
    member = _file_kmer_set(SE_PANGENOME, 31)
    got = _brute_force_report_positives(member, QUERIES_FASTQ, 31)
    assert got == PINNED["num_positive_kmers"]
