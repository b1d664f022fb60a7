"""Build-vs-input oracle: the strongest contract of the reference — ids are
assigned sequentially in input file order (model: test/check_from_file.hpp).
50% of queried kmers are reverse-complemented to exercise orientation."""

import numpy as np

from sshash_tpu import kmer as K
from sshash_tpu.builder.minimizers import _ranges

INVALID = np.uint64(0xFFFFFFFFFFFFFFFF)


def _all_kmers(parsed, k):
    """All kmers of the input in file order + their (string_id, pos_in_string)."""
    words = K.pack_codes(parsed.codes, pad_words=K.num_words64(k) + 1)
    ep = parsed.endpoints.astype(np.int64)
    starts = ep[:-1]
    counts = np.diff(ep) - k + 1
    offs = _ranges(starts, counts)
    sids = np.repeat(np.arange(len(starts)), counts)
    kmers = K.read_kmers_at(words, offs, k)
    pos_in_string = offs - starts[sids]
    return kmers, sids, pos_in_string


def test_ids_sequential_in_file_order(dict_k31, parsed_k31, rng):
    d = dict_k31
    kmers, sids, pis = _all_kmers(parsed_k31, 31)
    n = len(kmers)
    expected_ids = np.arange(n, dtype=np.uint64)

    # query on a large sample (full set is ~4.5M; sample keeps CI fast)
    sel = rng.choice(n, size=150_000, replace=False)
    sel.sort()
    q = kmers[sel]
    rc_mask = rng.random(len(sel)) < 0.5
    q[rc_mask] = K.revcomp_kmers(q[rc_mask], 31)

    res = d.lookup(q)
    assert (res["kmer_id"] == expected_ids[sel]).all()
    assert (res["string_id"] == sids[sel].astype(np.uint64)).all()
    assert (res["kmer_id_in_string"] == pis[sel].astype(np.uint64)).all()
    # orientation: forward unless we RC'd the query
    assert (res["kmer_orientation"] == np.where(rc_mask, -1, 1)).all()
    assert res["minimizer_found"].all()


def test_access_roundtrip_all_sampled(dict_k31, rng):
    d = dict_k31
    ids = rng.integers(0, d.num_kmers(), size=100_000)
    kms = d.access(ids)
    res = d.lookup(kms)
    assert (res["kmer_id"] == ids.astype(np.uint64)).all()
    assert d.is_member(kms).all()


def test_negative_lookup(dict_k31, rng):
    neg = rng.integers(0, 1 << 62, size=100_000, dtype=np.uint64).reshape(-1, 1)
    res = dict_k31.lookup(neg)
    found = res["kmer_id"] != INVALID
    # overwhelmingly not found (check.hpp:79-96 tolerates rare real hits)
    assert found.mean() < 0.001


def test_string_sizes(dict_k31, parsed_k31):
    lens = np.diff(parsed_k31.endpoints.astype(np.int64))
    for sid in range(0, dict_k31.num_strings(), max(1, dict_k31.num_strings() // 50)):
        assert dict_k31.string_size(sid) == lens[sid] - 31 + 1


def test_iterator_matches_access(dict_k31):
    d = dict_k31
    got = []
    it = d.at_kmer_id(1000, 1100)
    for kid, km in it:
        got.append((kid, km))
    assert [g[0] for g in got] == list(range(1000, 1100))
    kms = d.access(np.arange(1000, 1100))
    for (kid, km), expect in zip(got, kms):
        assert (km == expect).all()


def test_string_neighbours_and_iteration(dict_k31):
    """string_neighbours must equal kmer-level neighbours at string ends
    (reference check_correctness_navigational_string_query, check.hpp:99-174);
    at_string_id windows partition the id space."""
    import numpy as np
    from sshash_tpu.oracle import access

    d = dict_k31
    for sid in (0, 7, d.num_strings() - 1):
        b, e = d.string_offsets(sid)
        size = e - b - d.k + 1
        first_id = b - sid * (d.k - 1)
        # iteration window
        ids = [i for i, _ in d.at_string_id(sid)]
        assert ids == list(range(first_id, first_id + size))
        # string-level navigation == kmer-level at the ends
        sn = d.string_neighbours(sid)
        first_kmer = access(d.index, [first_id])
        last_kmer = access(d.index, [first_id + size - 1])
        fwd = d.kmer_forward_neighbours(last_kmer)
        bwd = d.kmer_backward_neighbours(first_kmer)
        np.testing.assert_array_equal(sn["forward"]["kmer_id"], fwd["kmer_id"])
        np.testing.assert_array_equal(sn["backward"]["kmer_id"], bwd["kmer_id"])
