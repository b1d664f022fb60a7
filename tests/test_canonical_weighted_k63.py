"""Canonical mode, weighted mode, and wide-kmer (k=47/63) builds."""

import gzip

import numpy as np
import pytest

pytestmark = pytest.mark.slow

from sshash_tpu import BuildConfig, Dictionary
from sshash_tpu import kmer as K
from tests.conftest import SE_K47, SE_K63, WEIGHTED_K31

INVALID = np.uint64(0xFFFFFFFFFFFFFFFF)


def test_canonical_lookup_both_strands(dict_k31_canonical, rng):
    d = dict_k31_canonical
    ids = rng.integers(0, d.num_kmers(), size=50_000)
    kms = d.access(ids)
    res_f = d.lookup(kms)
    assert (res_f["kmer_id"] == ids.astype(np.uint64)).all()
    assert (res_f["kmer_orientation"] == 1).all()
    rc = K.revcomp_kmers(kms, 31)
    res_r = d.lookup(rc)
    assert (res_r["kmer_id"] == ids.astype(np.uint64)).all()
    assert (res_r["kmer_orientation"] == -1).all()


def test_canonical_negative(dict_k31_canonical, rng):
    neg = rng.integers(0, 1 << 62, size=30_000, dtype=np.uint64).reshape(-1, 1)
    res = dict_k31_canonical.lookup(neg)
    assert (res["kmer_id"] != INVALID).mean() < 0.001


def _weights_from_headers(path, k):
    """Ground truth: per-kmer weights in file order."""
    weights = []
    with gzip.open(path, "rb") as f:
        while True:
            header = f.readline()
            if not header:
                break
            seq = f.readline()
            if not seq:
                break
            idx = header.index(b"ab:Z:") + 5
            weights.append(np.array(header[idx:].split(), dtype=np.uint64))
    return np.concatenate(weights)


def test_weighted_parity(dict_weighted, rng):
    d = dict_weighted
    assert d.weighted()
    truth = _weights_from_headers(WEIGHTED_K31, 31)
    assert len(truth) == d.num_kmers()
    ids = rng.integers(0, d.num_kmers(), size=200_000)
    got = d.weight(ids)
    assert (got == truth[ids]).all()


@pytest.mark.parametrize("path,k,m", [(SE_K47, 47, 15), (SE_K63, 63, 17)])
def test_wide_kmers(path, k, m, rng):
    d = Dictionary.build(path, BuildConfig(k=k, m=m, verbose=False))
    ids = rng.integers(0, d.num_kmers(), size=20_000)
    kms = d.access(ids)
    rc_mask = rng.random(len(ids)) < 0.5
    kms[rc_mask] = K.revcomp_kmers(kms[rc_mask], k)
    res = d.lookup(kms)
    assert (res["kmer_id"] == ids.astype(np.uint64)).all()
    assert (res["kmer_orientation"] == np.where(rc_mask, -1, 1)).all()
    neg = rng.integers(0, 1 << 63, size=(5000, K.num_words64(k)), dtype=np.uint64)
    from sshash_tpu.dictionary import _mask_k

    res_n = d.lookup(_mask_k(neg, k))
    assert (res_n["kmer_id"] != INVALID).mean() < 0.001
