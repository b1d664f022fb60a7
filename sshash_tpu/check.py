"""Self-consistency check suite (reference test/check.hpp + sshash check).

Everything is batched NumPy/JAX instead of the reference's thread-sharded
id loops (test/check.hpp:7-76): the id space is swept in large batches.
"""

import numpy as np

from . import kmer as K
from . import oracle
from .constants import BACKWARD_ORIENTATION, FORWARD_ORIENTATION, INVALID_UINT64

INVALID = np.uint64(INVALID_UINT64)


def check_dictionary(index, batch=1 << 16, verbose=False, engine=None):
    """access(id) -> lookup must round-trip for EVERY id (check.hpp:7-76)."""
    n = index.num_kmers
    for lo in range(0, n, batch):
        ids = np.arange(lo, min(lo + batch, n))
        kmers = oracle.access(index, ids)
        # 50% reverse-complemented, like check_correctness_lookup
        half = len(ids) // 2
        kmers[:half] = K.revcomp_kmers(kmers[:half], index.k)
        if engine is not None:
            res = engine.lookup(kmers)
        else:
            res = oracle.lookup(index, kmers)
        got = res["kmer_id"]
        if not (got == ids.astype(np.uint64)).all():
            bad = np.flatnonzero(got != ids)[0]
            raise AssertionError(
                f"check_dictionary failed at id {ids[bad]}: lookup returned {got[bad]}")
        orient = res["kmer_orientation"]
        want_orient = np.where(np.arange(len(ids)) < half,
                               BACKWARD_ORIENTATION, FORWARD_ORIENTATION)
        # palindromic kmers may legitimately report forward
        mism = (orient != want_orient) & (kmers != K.revcomp_kmers(kmers, index.k)).any(axis=1)
        if mism.any():
            bad = np.flatnonzero(mism)[0]
            raise AssertionError(f"orientation mismatch at id {ids[bad]}")
        if verbose:
            print(f"checked ids [{lo}, {lo + len(ids)})")
    return True


def check_negative_lookups(index, num=1 << 16, seed=0, engine=None):
    """Random kmers should (overwhelmingly) not be found (check.hpp:79-96).
    Returns the number of (legitimately possible) hits."""
    rng = np.random.default_rng(seed)
    W = index.kmer_words64
    kmers = rng.integers(0, 1 << 62, (num, W), dtype=np.uint64)
    rem = 2 * index.k - 64 * (W - 1)
    mask = np.uint64(0xFFFFFFFFFFFFFFFF) if rem == 64 else np.uint64((1 << rem) - 1)
    kmers[:, W - 1] &= mask
    if engine is not None:
        res = engine.lookup(kmers)
    else:
        res = oracle.lookup(index, kmers)
    hits = int((res["kmer_id"] != INVALID).sum())
    # verify every reported hit is a true member (id round-trips)
    if hits:
        hit = res["kmer_id"] != INVALID
        back = oracle.access(index, res["kmer_id"][hit].astype(np.int64))
        fwd_eq = (back == kmers[hit]).all(axis=1)
        rc_eq = (back == K.revcomp_kmers(kmers[hit], index.k)).all(axis=1)
        assert (fwd_eq | rc_eq).all(), "negative lookup returned a non-member id"
    return hits


def check_iterator(index, batch=1 << 16):
    """Iteration must equal access for sequential ids (check.hpp:177-231)."""
    n = index.num_kmers
    ep = index.string_endpoints.astype(np.int64)
    k = index.k
    for lo in range(0, n, batch):
        ids = np.arange(lo, min(lo + batch, n))
        kmers = oracle.access(index, ids)
        # string-piece-aware re-read: offsets must lie inside strings
        kmer_cum = ep - np.arange(len(ep)) * (k - 1)
        sid = np.searchsorted(kmer_cum, ids, side="right") - 1
        off = ids + sid * (k - 1)
        assert (off >= ep[sid]).all() and (off + k <= ep[sid + 1]).all()
        re_read = K.read_kmers_at(index.strings64, off, k)
        assert (re_read == kmers).all()
    return True


def check_string_iterator(index):
    """Per-string windows partition the id space (check.hpp:234-295)."""
    ep = index.string_endpoints.astype(np.int64)
    k = index.k
    total = 0
    for s in range(index.num_strings):
        size = int(ep[s + 1] - ep[s]) - k + 1
        assert size >= 1
        total += size
    assert total == index.num_kmers, (total, index.num_kmers)
    return True


def check_navigation(index, dictionary, num=256, seed=1):
    """Navigational query check (check.hpp:99-174 style): the true next/prev
    kmers in each string must appear in the neighbourhood."""
    rng = np.random.default_rng(seed)
    ep = index.string_endpoints.astype(np.int64)
    k = index.k
    kmer_cum = ep - np.arange(len(ep)) * (k - 1)
    ids = rng.integers(0, index.num_kmers, num)
    sid = np.searchsorted(kmer_cum, ids, side="right") - 1
    off = ids + sid * (k - 1)
    # only positions with a forward neighbour inside the string
    has_next = off + k < ep[sid + 1]
    ids_n = ids[has_next]
    off_n = off[has_next]
    kmers = K.read_kmers_at(index.strings64, off_n, k)
    nxt = dictionary.kmer_forward_neighbours(kmers)
    found_next = (nxt["kmer_id"] == (ids_n + 1).astype(np.uint64)[:, None]).any(axis=1)
    assert found_next.all(), "forward neighbour missing"
    has_prev = off > ep[sid]
    ids_p = ids[has_prev]
    off_p = off[has_prev]
    kmers_p = K.read_kmers_at(index.strings64, off_p, k)
    prv = dictionary.kmer_backward_neighbours(kmers_p)
    found_prev = (prv["kmer_id"] == (ids_p - 1).astype(np.uint64)[:, None]).any(axis=1)
    assert found_prev.all(), "backward neighbour missing"
    return True


def check_weights(index, parsed_weights):
    """Every header weight equals dict.weight(kmer_id)
    (check_from_file.hpp:229-278)."""
    vals, lens = parsed_weights
    expanded = np.repeat(vals, np.diff(lens.astype(np.int64)))
    assert len(expanded) == index.num_kmers
    got = index.weights.weight(np.arange(index.num_kmers))
    assert (got == expanded).all()
    return True


def check_all(dictionary, verbose=False, engine=None):
    index = dictionary.index
    check_dictionary(index, verbose=verbose, engine=engine)
    hits = check_negative_lookups(index, engine=engine)
    check_iterator(index)
    check_string_iterator(index)
    check_navigation(index, dictionary)
    if verbose:
        print(f"check_all OK (negative probe hits: {hits})")
    return True
