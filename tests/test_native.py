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


def test_encode_stream_matches_numpy():
    """The SWAR 16-chars/iter fast path of encode_stream must be
    bit-identical to the NumPy fallback, including mixed case, invalid
    chars landing mid-block, segment boundaries off 16-char alignment, and
    the k-1 warmup run at every segment start."""
    rng = np.random.default_rng(0xE5C0)
    ALPH = np.frombuffer(b"ACGTacgtNnX-", dtype=np.uint8)

    def numpy_ref(joined, cstarts, lens, k, CW):
        words32 = np.zeros(CW, dtype=np.uint32)
        npos = lens - k + 1
        total = int(npos.sum())
        valid_bits = np.zeros(total // 32 + 2, dtype=np.uint32)
        codes, ok = K.encode_chars(joined)
        w32 = K.pack_words_to_u32(K.pack_codes(np.where(ok, codes, 0)))
        words32[: len(w32)] = w32
        pstart = np.cumsum(npos) - npos
        pos_all = np.repeat(cstarts, npos) + (
            np.arange(total) - np.repeat(pstart, npos))
        okc = np.zeros(len(ok) + 1, dtype=np.int64)
        np.cumsum(ok, out=okc[1:])
        valid = (okc[pos_all + k] - okc[pos_all]) == k
        vb = np.packbits(valid, bitorder="little")
        valid_bits[: (len(vb) + 3) // 4] = np.pad(
            vb, (0, (-len(vb)) % 4)).view(np.uint32)
        return words32, valid_bits, total

    for trial in range(60):
        k = int(rng.integers(2, 40))
        nseg = int(rng.integers(1, 6))
        lens = rng.integers(k, 200, nseg).astype(np.int64)
        ends = np.cumsum(lens)
        cstarts = ends - lens
        n = int(ends[-1])
        p_junk = [0.0, 0.02, 0.3][trial % 3]
        idx = rng.integers(0, 4, n) + np.where(rng.random(n) < 0.2, 4, 0)
        idx = np.where(rng.random(n) < p_junk, rng.integers(8, 12, n), idx)
        joined = ALPH[idx].tobytes()
        CW = (n + 15) // 16 + 2
        w_ref, v_ref, tot = numpy_ref(joined, cstarts, lens, k, CW)
        w_nat = np.zeros(CW, dtype=np.uint32)
        v_nat = np.zeros(len(v_ref), dtype=np.uint32)
        t = native.encode_stream(joined, cstarts, lens, k, w_nat, v_nat)
        assert t == tot
        np.testing.assert_array_equal(w_nat, w_ref)
        np.testing.assert_array_equal(v_nat, v_ref)


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
