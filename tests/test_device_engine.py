"""Device (JAX) engine parity vs the NumPy oracle — the 'fast path must equal
slow path' pattern of the reference (streaming_query.hpp:107)."""

import numpy as np
import pytest

from sshash_tpu import kmer as K
from sshash_tpu.engine import DeviceEngine


def _parity(d, eng, q, rng):
    res_o = d.lookup(q)
    res_d = eng.lookup(q)
    for key in res_o:
        assert np.array_equal(np.asarray(res_o[key]), np.asarray(res_d[key])), key


@pytest.fixture(scope="module")
def eng_k31(dict_k31):
    return DeviceEngine(dict_k31.index)


def test_device_positive_and_rc(dict_k31, eng_k31, rng):
    ids = rng.integers(0, dict_k31.num_kmers(), size=8192)
    kms = dict_k31.access(ids)
    rc_mask = rng.random(len(ids)) < 0.5
    kms[rc_mask] = K.revcomp_kmers(kms[rc_mask], 31)
    _parity(dict_k31, eng_k31, kms, rng)


def test_device_negative(dict_k31, eng_k31, rng):
    neg = rng.integers(0, 1 << 62, size=8192, dtype=np.uint64).reshape(-1, 1)
    _parity(dict_k31, eng_k31, neg, rng)


def test_device_access(dict_k31, eng_k31, rng):
    ids = rng.integers(0, dict_k31.num_kmers(), size=8192)
    assert np.array_equal(dict_k31.access(ids), eng_k31.access(ids.astype(np.uint32)))


def test_device_canonical(dict_k31_canonical, rng):
    eng = DeviceEngine(dict_k31_canonical.index)
    ids = rng.integers(0, dict_k31_canonical.num_kmers(), size=8192)
    kms = dict_k31_canonical.access(ids)
    rc_mask = rng.random(len(ids)) < 0.5
    kms[rc_mask] = K.revcomp_kmers(kms[rc_mask], 31)
    _parity(dict_k31_canonical, eng, kms, rng)
    neg = rng.integers(0, 1 << 62, size=4096, dtype=np.uint64).reshape(-1, 1)
    _parity(dict_k31_canonical, eng, neg, rng)


def test_pair_window_divisor_bit_exact(dict_k31, eng_k31, monkeypatch, rng):
    """SSHASH_PAIR_DIV changes only the compacted pair sweep's window
    width (cost shape), never results — a narrow window forces multiple
    while_loop iterations over the same pair buffer."""
    monkeypatch.setenv("SSHASH_PAIR_DIV", "4096")  # PMAX floors at 128
    eng_narrow = DeviceEngine(dict_k31.index)
    ids = rng.integers(0, dict_k31.num_kmers(), size=4096)
    kms = dict_k31.access(ids)
    kms[::2] = K.revcomp_kmers(kms[::2], 31)
    kms[-512:] = rng.integers(0, 1 << 62, size=512, dtype=np.uint64).reshape(-1, 1)
    a = eng_k31.lookup(kms)
    b = eng_narrow.lookup(kms)
    for key in a:
        assert np.array_equal(np.asarray(a[key]), np.asarray(b[key])), key


def test_fb_window_divisor_bit_exact(dict_k31, eng_k31, monkeypatch, rng):
    """SSHASH_FB_DIV changes only the regular-mode RC-fallback window
    width (cost shape), never results — a narrow window forces multiple
    while_loop iterations over the compacted misses."""
    monkeypatch.setenv("SSHASH_FB_DIV", "4096")  # Wf floors at 128
    eng_narrow = DeviceEngine(dict_k31.index)
    ids = rng.integers(0, dict_k31.num_kmers(), size=4096)
    kms = dict_k31.access(ids)
    kms[::2] = K.revcomp_kmers(kms[::2], 31)  # 50% RC: fallback-heavy
    kms[-512:] = rng.integers(0, 1 << 62, size=512, dtype=np.uint64).reshape(-1, 1)
    a = eng_k31.lookup(kms)
    b = eng_narrow.lookup(kms)
    for key in a:
        assert np.array_equal(np.asarray(a[key]), np.asarray(b[key])), key


def test_ids_mode_matches_full(dict_k31, eng_k31, dict_k31_canonical, rng):
    """fields="ids" (the bench kernel) must agree with the full kernel on
    kmer_id/orientation/found — including pair-sweep hits, where ids mode
    scatters the in-register-resolved id instead of (offset, sid)."""
    import jax

    for d, eng in ((dict_k31, eng_k31),
                   (dict_k31_canonical, DeviceEngine(dict_k31_canonical.index))):
        ids = rng.integers(0, d.num_kmers(), size=8192)
        kms = d.access(ids)
        kms[::2] = K.revcomp_kmers(kms[::2], 31)
        kms[-1024:] = rng.integers(0, 1 << 62, size=1024,
                                   dtype=np.uint64).reshape(-1, 1)
        km32 = K.kmers_to_u32(kms, 31)
        full = eng._lookup(eng.arrs, km32)
        idsr = jax.jit(eng._lookup_ids_fn)(eng.arrs, km32)
        for key in ("found", "kmer_id", "kmer_orientation", "minimizer_found"):
            assert np.array_equal(np.asarray(full[key]),
                                  np.asarray(idsr[key])), key


def test_device_weight(dict_weighted, rng):
    eng = DeviceEngine(dict_weighted.index)
    ids = rng.integers(0, dict_weighted.num_kmers(), size=8192)
    assert np.array_equal(dict_weighted.weight(ids), eng.weight(ids))


def test_device_neighbours_match_oracle(dict_k31, rng):
    """Batched device navigation == host facade navigation."""
    import numpy as np
    from sshash_tpu import oracle

    index = dict_k31.index
    eng = dict_k31.to_device()
    ids = rng.integers(0, index.num_kmers, 64)
    kmers = oracle.access(index, ids)
    dev = eng.kmer_neighbours(kmers)
    want = dict_k31.kmer_neighbours(kmers)
    np.testing.assert_array_equal(dev["kmer_id"][:, :4], want["forward"]["kmer_id"])
    np.testing.assert_array_equal(dev["kmer_id"][:, 4:], want["backward"]["kmer_id"])


def test_skew_partitioned_classes(tmp_path, rng):
    """v1.2: skew size classes build PartitionedMPHFs; classes past
    avg_partition_size get P>1 (reference per-partition PTHash,
    build_sparse_and_skew_index.cpp:312-478). Engine + oracle + sharded +
    save/load parity."""
    import numpy as np
    from conftest import SE_K31
    from sshash_tpu import BuildConfig, Dictionary
    from sshash_tpu import oracle
    from sshash_tpu.index import Index
    from sshash_tpu.mphf import PartitionedMPHF
    from sshash_tpu.parallel import ShardedEngine, make_mesh

    d = Dictionary.build(SE_K31, BuildConfig(k=31, m=9, verbose=False,
                                             avg_partition_size=2000))
    idx = d.index
    assert any(isinstance(p.mphf, PartitionedMPHF)
               and p.mphf.num_partitions > 1
               for p in idx.skew_partitions if p.mphf.n > 0)
    ids = rng.integers(0, idx.num_kmers, 2048)
    km = oracle.access(idx, ids)
    eng = d.to_device()
    assert eng.cfg.skew_partitioned and eng.cfg.skew_hrows
    np.testing.assert_array_equal(eng.lookup(km)["kmer_id"],
                                  ids.astype(np.uint64))
    sh = ShardedEngine(idx, make_mesh(shape=(2, 4)))
    got, _ = sh.lookup(km)
    np.testing.assert_array_equal(got["kmer_id"], ids.astype(np.uint64))
    path = str(tmp_path / "p.npz")
    idx.save(path)
    idx2 = Index.load(path)
    np.testing.assert_array_equal(oracle.lookup(idx2, km)["kmer_id"],
                                  ids.astype(np.uint64))


def test_skew_index_device_parity(rng):
    """HEAVYLOAD path: m=9 forces buckets past 2^MIN_L into the skew index;
    device lookup must stay bit-exact (engine.skew_eval vs oracle)."""
    import numpy as np
    from sshash_tpu import BuildConfig, Dictionary
    from sshash_tpu import kmer as K
    from sshash_tpu import oracle
    from conftest import SE_K31

    for canonical in (False, True):
        d = Dictionary.build(SE_K31, BuildConfig(k=31, m=9, canonical=canonical,
                                                 verbose=False))
        idx = d.index
        assert idx.stats["num_partitions"] > 0 and len(idx.heavy_load_buckets) > 0
        eng = d.to_device()
        assert eng.cfg.has_skew
        ids = rng.integers(0, idx.num_kmers, 2048)
        km = oracle.access(idx, ids)
        km[:1024] = K.revcomp_kmers(km[:1024], 31)
        want = oracle.lookup(idx, km)
        got = eng.lookup(km)
        for key in ("kmer_id", "kmer_offset", "string_id", "kmer_orientation"):
            np.testing.assert_array_equal(got[key], want[key],
                                          err_msg=f"{key} canonical={canonical}")
        # negatives through the skew decode too
        neg = rng.integers(0, 1 << 62, (2048, 1), dtype=np.uint64)
        wantn = oracle.lookup(idx, neg)
        gotn = eng.lookup(neg)
        np.testing.assert_array_equal(gotn["kmer_id"], wantn["kmer_id"])


def test_u32_ceiling_contract(dict_k31):
    """Capacity contract (round 5): >= 2^32 chars auto-select the rebased
    v2 row format (no failure — see tests/test_row_v2.py for bit-equality);
    >= 2^32-1 kmers exceed uint32 ids + the INVALID sentinel and must fail
    loudly, never wrap."""
    import dataclasses

    import pytest

    from sshash_tpu.engine import StaticCfg, _device_arrays, use_row_v2

    big_chars = dataclasses.replace(dict_k31.index, num_chars=1 << 32)
    assert use_row_v2(big_chars)
    assert StaticCfg(big_chars).row_v2
    assert not use_row_v2(dict_k31.index)

    big_ids = dataclasses.replace(dict_k31.index, num_kmers=(1 << 32) - 1)
    with pytest.raises(ValueError, match="uint32"):
        _device_arrays(big_ids)


def test_tie_retry_variant_matches(dict_k31_canonical, rng, monkeypatch):
    """SSHASH_TIE_RETRY=1 (cond-gated tie retry) is bit-exact vs the
    default 4-try fold on a 50% RC + negative canonical batch."""
    import numpy as np

    from sshash_tpu import kmer as K
    from sshash_tpu import oracle
    from sshash_tpu.engine import DeviceEngine

    idx = dict_k31_canonical.index
    ids = rng.integers(0, idx.num_kmers, 4096)
    km = oracle.access(idx, ids)
    km[::2] = K.revcomp_kmers(km[::2], 31)
    neg = rng.integers(0, 1 << 61, (1024, 1), dtype=np.uint64)
    allk = np.concatenate([km, neg])

    base = dict_k31_canonical.to_device().lookup(allk)
    monkeypatch.setenv("SSHASH_TIE_RETRY", "1")
    alt = DeviceEngine(idx).lookup(allk)
    for key in ("kmer_id", "kmer_orientation", "string_id", "kmer_offset"):
        np.testing.assert_array_equal(alt[key], base[key], err_msg=key)


def test_sequential_iterator_matches_access(dict_k31, eng_k31):
    """The sequential-decode iterator (one linear shift-window pass, no
    gathers) yields exactly the num_kmers valid starts, in id order, each
    bit-equal to access(id) (reference iterator contract,
    test/check.hpp:177-231)."""
    import jax

    from sshash_tpu import oracle
    from sshash_tpu.engine import make_iterator, vstart32_from_index

    index = dict_k31.index
    valid, kmers = jax.jit(make_iterator(eng_k31.cfg, materialize=True))(
        eng_k31.arrs)
    valid = np.asarray(valid)
    assert valid.sum() == index.num_kmers
    want = K.kmers_to_u32(oracle.access(index, np.arange(index.num_kmers)),
                          index.k)
    np.testing.assert_array_equal(np.asarray(kmers)[valid], want)

    # reduce variant (the perf-harness shape) agrees: count == num_kmers
    # and the checksum XOR-folds ALL words of every valid kmer (so the
    # full decode is live), summed mod 2^32
    cnt, chk = jax.tree.map(int, eng_k31._iterator(eng_k31.arrs))
    assert cnt == index.num_kmers
    fold = want[:, 0].copy()
    for j in range(1, want.shape[1]):
        fold ^= want[:, j]
    assert chk == int(fold.astype(np.uint64).sum() & 0xFFFFFFFF)

    # the stale-cache top-up path produces the identical bitmask
    np.testing.assert_array_equal(np.asarray(eng_k31.arrs["vstart32"]),
                                  vstart32_from_index(index))
