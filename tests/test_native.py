"""Native C++ hot loops must be bit-identical to their NumPy references."""

import numpy as np
import pytest

from sshash_tpu import kmer as K
from sshash_tpu import native
from sshash_tpu.builder import minimizers as M
from sshash_tpu.hashing import mixer_magic
from sshash_tpu.mphf import MPHF

pytestmark = pytest.mark.skipif(not native.available(), reason="no native lib")


@pytest.fixture(scope="module")
def synth():
    rng = np.random.default_rng(0xFACE)
    lens = rng.integers(31, 400, 300)
    codes = rng.integers(0, 4, int(lens.sum())).astype(np.uint8)
    endpoints = np.zeros(len(lens) + 1, dtype=np.uint64)
    np.cumsum(lens, out=endpoints[1:])
    words64 = K.pack_codes(codes, pad_words=K.num_words64(31) + 1)
    return codes, endpoints, words64


@pytest.mark.parametrize("canonical", [False, True])
@pytest.mark.parametrize("k,m", [(31, 13), (21, 9), (31, 20)])
def test_tuple_scan_matches_numpy(synth, canonical, k, m):
    codes, endpoints, words64 = synth
    magic = mixer_magic(1)
    tn = M.compute_tuples(words64, endpoints, k, m, magic, canonical, codes=codes)
    tv = M.compute_tuples(words64, endpoints, k, m, magic, canonical, codes=None)
    np.testing.assert_array_equal(tn.minimizer, tv.minimizer)
    np.testing.assert_array_equal(tn.pos_in_seq, tv.pos_in_seq)
    np.testing.assert_array_equal(tn.pos_in_kmer, tv.pos_in_kmer)
    np.testing.assert_array_equal(tn.count, tv.count)


def test_pilot_search_matches_numpy():
    import sshash_tpu.native as nat

    rng = np.random.default_rng(3)
    keys = np.unique(rng.integers(0, 1 << 63, 30000, dtype=np.uint64))
    f1 = MPHF.build_u64(keys, seed=7)
    saved = (nat._lib, nat._tried)
    nat._lib, nat._tried = None, True  # force NumPy fallback
    try:
        f2 = MPHF.build_u64(keys, seed=7)
    finally:
        nat._lib, nat._tried = saved
    np.testing.assert_array_equal(f1.pilots, f2.pilots)
    np.testing.assert_array_equal(f1.remap, f2.remap)
    pos = f1(keys)
    assert len(np.unique(pos)) == len(keys)


def test_stream_build_chunking_bit_identical():
    """Multi-chunk streaming build (carry-aligned packing + tuple rebase)
    must equal the single-chunk result, and the whole streaming path must
    equal the NumPy-fallback build bit-for-bit."""
    import sshash_tpu.native as nat
    from sshash_tpu import BuildConfig, Dictionary
    from sshash_tpu.builder.build import _stream_parse_pack_scan
    from sshash_tpu.hashing import mixer_magic

    p = "/root/reference/data/unitigs_stitched/ecoli1_k31_ust.fa.gz"
    cfg = BuildConfig(k=31, m=13, verbose=False)
    magic = mixer_magic(cfg.seed)
    pa, wa, ta = _stream_parse_pack_scan(p, 31, 13, magic, cfg)
    pb, wb, tb = _stream_parse_pack_scan(p, 31, 13, magic, cfg, chunk_chars=100_000)
    np.testing.assert_array_equal(wa, wb)
    for f in ("minimizer", "pos_in_seq", "pos_in_kmer", "count"):
        np.testing.assert_array_equal(getattr(ta, f), getattr(tb, f))

    d1 = Dictionary.build(p, cfg)
    saved = (nat._lib, nat._tried)
    nat._lib, nat._tried = None, True
    try:
        d2 = Dictionary.build(p, cfg)
    finally:
        nat._lib, nat._tried = saved
    for name in ("strings64", "string_endpoints", "codewords",
                 "mid_load_buckets", "heavy_load_buckets"):
        np.testing.assert_array_equal(getattr(d1.index, name),
                                      getattr(d2.index, name), err_msg=name)
