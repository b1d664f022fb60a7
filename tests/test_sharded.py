"""Multi-chip sharded lookup must agree with the NumPy oracle
(2D mesh: data-parallel batch x bucket-sharded codewords)."""

import numpy as np
import pytest

from sshash_tpu import kmer as K
from sshash_tpu import oracle
from sshash_tpu.constants import INVALID_UINT64

INVALID = np.uint64(INVALID_UINT64)


def _mesh(data, bucket):
    from sshash_tpu.parallel import make_mesh

    return make_mesh(shape=(data, bucket))


def _mixed_batch(index, rng, n=512):
    ids = rng.integers(0, index.num_kmers, n)
    kmers = oracle.access(index, ids)
    half = n // 2
    kmers[:half] = K.revcomp_kmers(kmers[:half], index.k)
    # sprinkle negatives
    neg = rng.integers(0, 1 << 62, (n // 4, index.kmer_words64), dtype=np.uint64)
    mask = np.uint64((1 << min(2 * index.k, 63)) - 1)
    return np.concatenate([kmers, neg & mask])


@pytest.mark.parametrize("mesh_shape", [(4, 2), (2, 4), (8, 1)])
def test_sharded_matches_oracle_regular(dict_k31, rng, mesh_shape):
    from sshash_tpu.parallel import ShardedEngine

    index = dict_k31.index
    eng = ShardedEngine(index, _mesh(*mesh_shape))
    kmers = _mixed_batch(index, rng)
    want = oracle.lookup(index, kmers)
    got, report = eng.lookup(kmers)
    for key in ("kmer_id", "kmer_offset", "string_id", "kmer_id_in_string",
                "kmer_orientation", "minimizer_found"):
        np.testing.assert_array_equal(got[key], want[key], err_msg=key)
    assert report["num_positive"] == int((want["kmer_id"] != INVALID).sum())


def test_sharded_matches_oracle_canonical(dict_k31_canonical, rng):
    from sshash_tpu.parallel import ShardedEngine

    index = dict_k31_canonical.index
    eng = ShardedEngine(index, _mesh(4, 2))
    kmers = _mixed_batch(index, rng)
    want = oracle.lookup(index, kmers)
    got, _ = eng.lookup(kmers)
    for key in ("kmer_id", "kmer_offset", "string_id", "kmer_orientation"):
        np.testing.assert_array_equal(got[key], want[key], err_msg=key)
