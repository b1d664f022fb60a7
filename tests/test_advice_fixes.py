"""Regression tests for the round-1 advisor findings (ADVICE.md)."""

import numpy as np
import pytest

from sshash_tpu import BuildConfig, Dictionary
from sshash_tpu import kmer as K
from sshash_tpu import oracle


def _write_fasta(path, seqs):
    with open(path, "w") as f:
        for i, s in enumerate(seqs):
            f.write(f">{i}\n{s}\n")


def _random_distinct_kmer_strings(rng, k, n):
    """n length-k strings, all kmers distinct under RC equivalence."""
    seen = set()
    out = []
    while len(out) < n:
        s = "".join(rng.choice(list("ACGT"), size=k))
        canon = min(s, K.revcomp_str(s.encode()))
        if canon in seen:
            continue
        seen.add(canon)
        out.append(s)
    return out


def test_access_with_length_k_strings(tmp_path, rng):
    """ADVICE high: make_access's block-hint bound must hold in KMER-ID
    space, where up to 32 single-kmer strings can share a 32-id block."""
    k = 31
    seqs = _random_distinct_kmer_strings(rng, k, 200)
    path = tmp_path / "short.fa"
    _write_fasta(path, seqs)
    d = Dictionary.build(str(path), BuildConfig(k=k, m=13, verbose=False))
    eng = d.to_device()
    assert eng.cfg.access_C > 32 // k + 1  # the old bound is too small here
    ids = np.arange(d.num_kmers(), dtype=np.uint32)
    np.testing.assert_array_equal(oracle.access(d.index, ids), eng.access(ids))
    # and mixed short+long strings
    seqs2 = seqs[:50] + ["".join(rng.choice(list("ACGT"), size=400))]
    path2 = tmp_path / "mixed.fa"
    _write_fasta(path2, seqs2)
    d2 = Dictionary.build(str(path2), BuildConfig(k=k, m=13, verbose=False))
    eng2 = d2.to_device()
    ids2 = np.arange(d2.num_kmers(), dtype=np.uint32)
    np.testing.assert_array_equal(oracle.access(d2.index, ids2), eng2.access(ids2))


def test_sharded_report_unpadded_counts(dict_k31, rng):
    """ADVICE medium: the psum'd lookup report must not count pad lanes."""
    from sshash_tpu.parallel import ShardedEngine, make_mesh

    index = dict_k31.index
    eng = ShardedEngine(index, make_mesh(shape=(4, 2)))
    n = 515  # deliberately not a multiple of the data axis (4)
    ids = rng.integers(0, index.num_kmers, n)
    kmers = oracle.access(index, ids)
    got, report = eng.lookup(kmers)
    assert report["num_kmers"] == n
    assert report["num_positive"] == n  # all positive; padding must not inflate
    # mostly-negative batch: padded lanes replicate a negative -> would have
    # undercounted nothing but overcounted num_kmers
    neg = rng.integers(0, 1 << 62, (n, index.kmer_words64), dtype=np.uint64)
    neg &= np.uint64((1 << min(2 * index.k, 63)) - 1)
    gotn, repn = eng.lookup(neg)
    want = int((oracle.lookup(index, neg)["kmer_id"] != np.uint64(0xFFFFFFFFFFFFFFFF)).sum())
    assert repn["num_kmers"] == n
    assert repn["num_positive"] == want


def test_sequence_reader_single_pass(tmp_path):
    """ADVICE low: a second iteration must raise, not double-count."""
    from sshash_tpu.builder.parse import SequenceReader

    path = tmp_path / "x.fa"
    _write_fasta(path, ["ACGTACGTACGT"])
    r = SequenceReader(str(path), k=5)
    list(r)
    with pytest.raises(RuntimeError):
        list(r)


# --------------------------------------------------------- round-2 findings


@pytest.fixture(scope="module")
def dict_m9():
    """m=9 forces heavy (skew) buckets on salmonella — shared by the round-2
    regressions below."""
    from conftest import SE_K31

    return Dictionary.build(SE_K31, BuildConfig(k=31, m=9, verbose=False))


def test_sharded_heavy_bucket_sizes_with_duplicate_slots(dict_m9, rng):
    """ADVICE r2 high: _expand_to_slots duplicates remapped codeword entries,
    so the same heavy-bucket begin lands at several slots; recovering sizes
    via a plain diff over sorted begins handed the REAL slot size 0 and
    silently dropped whole heavy buckets from ShardedEngine lookups."""
    from sshash_tpu.engine import _expand_to_slots
    from sshash_tpu.index import decode_codeword
    from sshash_tpu.parallel import ShardedEngine, make_mesh

    idx = dict_m9.index
    k, m = idx.k, idx.m
    cw = np.asarray(idx.codewords, dtype=np.uint64)
    status, a, _ = decode_codeword(cw)
    f = idx.minimizer_mphf
    hslot = _expand_to_slots((status == 2).astype(np.uint8), f).astype(bool)
    hb_slot = _expand_to_slots(np.where(status == 2, a, 0), f)[hslot]
    ub, counts = np.unique(hb_slot, return_counts=True)
    dup_begins = ub[counts > 1]
    assert len(dup_begins) > 0, "dataset no longer produces duplicate slots"

    # bucket sizes from the MINIMAL (pre-expansion) codewords, where begins
    # are unique by construction
    beg_min = np.sort(a[status == 2].astype(np.int64))
    heavy = np.asarray(idx.heavy_load_buckets, dtype=np.int64)
    sz = dict(zip(beg_min, np.diff(np.concatenate([beg_min, [len(heavy)]]))))

    # candidate kmers: every valid kmer start covering an occurrence offset
    # of a duplicated-begin bucket (a superset of the bucket's member kmers)
    ep = idx.string_endpoints.astype(np.int64)
    starts = []
    for b in dup_begins:
        offs = heavy[int(b) : int(b) + int(sz[int(b)])]
        s = (offs[:, None] - np.arange(k - m + 1)[None, :]).ravel()
        sid = np.searchsorted(ep, np.repeat(offs, k - m + 1), side="right") - 1
        okv = (s >= ep[sid]) & (s + k <= ep[sid + 1])
        starts.append(s[okv])
    starts = np.unique(np.concatenate(starts))
    if len(starts) > 20000:
        starts = rng.choice(starts, 20000, replace=False)
    kmers = K.read_kmers_at(np.asarray(idx.strings64), starts, k)

    want = oracle.lookup(idx, kmers)
    assert (want["kmer_id"] != np.uint64(0xFFFFFFFFFFFFFFFF)).all()
    eng = ShardedEngine(idx, make_mesh(shape=(2, 4)))
    got, _ = eng.lookup(kmers)
    np.testing.assert_array_equal(got["kmer_id"], want["kmer_id"])
    np.testing.assert_array_equal(got["kmer_offset"], want["kmer_offset"])


def test_device_stream_long_read_small_k(tmp_path, rng):
    """ADVICE r2 medium: one >=P-position segment exceeded the streaming char
    buffer for k <= 16 (the native encoder then wrote out of bounds); the
    segment split must respect the char budget."""
    from sshash_tpu.streaming import _Batcher, _DeviceStream, _host_lookup

    k = 11

    # a VALID SPSS input: all kmers distinct under RC equivalence (random
    # 11-mers collide by birthday at this size; on duplicated kmers an
    # extension cache legitimately diverges from fresh lookups — the
    # reference's cache does too, streaming_query.hpp:86-100)
    def gen():
        while True:
            seqs = ["".join(rng.choice(list("ACGT"), size=1000))
                    for _ in range(2)]
            seen = set()
            if all(
                not (c := min(s[i:i + k], K.revcomp_str(s[i:i + k].encode())))
                in seen and not seen.add(c)
                for s in seqs for i in range(len(s) - k + 1)
            ):
                return seqs

    seqs = gen()
    path = tmp_path / "t.fa"
    _write_fasta(path, seqs)
    d = Dictionary.build(str(path), BuildConfig(k=k, m=5, verbose=False))
    eng = d.to_device()
    st = _DeviceStream(eng, k, pmax=1 << 16)
    # the char budget must always fit one full-P segment (the advisor bug:
    # it didn't for k <= 16, and the native encoder wrote out of bounds)
    assert st.CW * 16 >= st.P + k - 1
    # index strings separated by N's (invalid positions, no junction kmers);
    # repeated past the char budget to force chunked flushes
    read = ((seqs[0] + "N" + seqs[1] + "N").encode()) * 40
    assert len(read) - k + 1 > st.CW * 16 - (k - 1)
    st.add_read(read)
    got = st.finalize()
    hb = _Batcher(d.index, _host_lookup(d.index), k)
    hb.add_read(read)
    want = hb.finalize()
    assert got == want


def test_load_legacy_skew_array_names(dict_m9, tmp_path, rng):
    """ADVICE r2 medium: version-1.0.0 files stored skew arrays as
    skew_pilots_{i}/skew_remap_{i}; they pass the major-version gate, so the
    1.1.x loader must still read them."""
    import json

    from sshash_tpu.index import Index

    idx = dict_m9.index
    assert any(p.mphf.n > 0 for p in idx.skew_partitions)
    path = str(tmp_path / "idx.npz")
    idx.save(path)
    z = dict(np.load(path))
    meta = json.loads(bytes(z.pop("meta_json")).decode())
    for i, sm in enumerate(meta["skew_mphfs"]):
        p = idx.skew_partitions[i].mphf
        z[f"skew_pilots_{i}"] = np.asarray(p.pilots, dtype=np.uint64).astype(np.uint32)
        z[f"skew_remap_{i}"] = np.asarray(p.remap, dtype=np.uint64).astype(np.uint32)
        sm["pilots_cv"] = None
        sm["remap_cv"] = None
        drop = {f"skew_{i}_{base}{suf}" for base in ("pilots", "remap")
                for suf in ("", "_words", "_dict")}
        for key in list(z):
            if key in drop:
                del z[key]
    z["meta_json"] = np.frombuffer(json.dumps(meta).encode(), dtype=np.uint8)
    legacy = str(tmp_path / "legacy.npz")
    np.savez_compressed(legacy, **z)
    idx2 = Index.load(legacy)
    ids = rng.integers(0, idx.num_kmers, 512)
    km = oracle.access(idx, ids)
    np.testing.assert_array_equal(oracle.lookup(idx2, km)["kmer_id"],
                                  ids.astype(np.uint64))


def test_permute_rejects_short_sequences(tmp_path):
    """ADVICE low: permute must raise on sequences shorter than k (matching
    the build parser), not silently drop records."""
    from sshash_tpu.cover import permute_file

    path = tmp_path / "w.fa"
    with open(path, "w") as f:
        f.write(">s LN:i:4 ab:Z:2 2\nACG\n")  # len 3 < k=5
    with pytest.raises(ValueError):
        permute_file(str(path), 5, str(tmp_path / "out.fa"))
