"""Codec tests (model: reference test/test_alphabet.cpp:23-120)."""

import numpy as np
import pytest

from sshash_tpu import kmer as K


def test_char_codes():
    codes, ok = K.encode_chars(b"ACGTacgt")
    assert ok.all()
    assert list(codes) == [0, 1, 3, 2, 0, 1, 3, 2]  # A=00 C=01 G=11 T=10
    _, ok = K.encode_chars(b"ACGNT")
    assert list(ok) == [True, True, True, False, True]


@pytest.mark.parametrize("k", [1, 2, 5, 15, 16, 17, 31, 32, 33, 47, 63, 64, 100, 255])
def test_string_roundtrip_and_revcomp(k, rng):
    for _ in range(10):
        s = "".join("ACGT"[c] for c in rng.integers(0, 4, size=k))
        km = K.string_to_kmer(s, k)
        assert K.kmer_to_string(km, k) == s
        rc = K.revcomp_kmers(km[None, :], k)[0]
        assert K.kmer_to_string(rc, k) == K.revcomp_str(s)
        # involution
        rcrc = K.revcomp_kmers(rc[None, :], k)[0]
        assert (rcrc == km).all()


def test_lowercase_equal():
    a = K.string_to_kmer("ACGTACGTA", 9)
    b = K.string_to_kmer("acgtacgta", 9)
    assert (a == b).all()


@pytest.mark.parametrize("k", [5, 31, 33, 63])
def test_read_kmers_at(k, rng):
    n = 300
    codes = rng.integers(0, 4, size=n).astype(np.uint8)
    words = K.pack_codes(codes, pad_words=K.num_words64(k) + 1)
    offs = np.arange(n - k + 1)
    out = K.read_kmers_at(words, offs, k)
    seq = K.decode_codes(codes).decode()
    for i in range(0, n - k + 1, 7):
        assert K.kmer_to_string(out[i], k) == seq[i : i + k]


def test_u32_conversion(rng):
    for k in [7, 16, 31, 32, 47, 63]:
        kms = rng.integers(0, 1 << 63, size=(50, K.num_words64(k)), dtype=np.uint64)
        # mask to valid width
        from sshash_tpu.dictionary import _mask_k

        kms = _mask_k(kms, k)
        w32 = K.kmers_to_u32(kms, k)
        back = K.u32_to_kmers64(w32, k)
        assert (back == kms).all()


def test_revcomp_mmers(rng):
    for m in [1, 4, 13, 21, 31]:
        s = "".join("ACGT"[c] for c in rng.integers(0, 4, size=m))
        v = K.string_to_kmer(s, m)[0]
        rc = K.revcomp_mmers(np.array([v], dtype=np.uint64), m)[0]
        assert K.kmer_to_string(np.array([rc]), m) == K.revcomp_str(s)


def test_aa_alphabet_roundtrip():
    """5-bit protein codec (reference kmer.hpp:258-301): encode/pack/unpack
    round-trips for every k up to 12 (uint64) and 25 (two words)."""
    import numpy as np
    from sshash_tpu import kmer as K

    rng = np.random.default_rng(5)
    for k in list(range(1, 13)) + [20, 25]:
        s = bytes(ord("A") + int(c) for c in rng.integers(0, 26, k))
        codes, ok = K.aa_encode_chars(s)
        assert ok.all()
        packed = K.aa_pack(codes)
        assert len(packed) == K.aa_num_words64(k)
        back = K.aa_unpack(packed, k)
        assert K.aa_decode_codes(back) == s
        # case-insensitive like the reference char_to_aa
        codes2, ok2 = K.aa_encode_chars(s.lower())
        assert ok2.all() and (codes2 == codes).all()
    bad, okb = K.aa_encode_chars(b"AB*Z")
    assert list(okb) == [True, True, False, True]
