"""Capacity-format coverage: rebased v2 rows + wide-id packing.

Round-5 ceiling work (VERDICT r4 missing #1): indexes with >= 2^31 kmers
switch the packed id scatter to two columns (StaticCfg.wide_ids), and
indexes with >= 2^32 chars switch to rebased v2 rows whose resolve quad
lives in kmer-ID space (engine.use_row_v2). Both formats are forced onto
the small salmonella index here and must be bit-identical to the default
v1 path. Reference capacity contract: include/dictionary.hpp:28-136
(64-bit ids/offsets throughout).
"""

import dataclasses

import numpy as np
import pytest

from sshash_tpu import kmer as K
from sshash_tpu.engine import DeviceEngine, StaticCfg, use_row_v2
from sshash_tpu.oracle import access


def _pos_neg(idx, rng, B=1 << 13):
    ids = rng.integers(0, idx.num_kmers, B)
    km = access(idx, ids)
    km[: B // 2] = K.revcomp_kmers(km[: B // 2], idx.k)
    neg = rng.integers(0, 1 << 62, (B, idx.kmer_words64), dtype=np.uint64)
    neg &= np.uint64((1 << min(2 * idx.k, 63)) - 1)
    return ids, km, neg


@pytest.mark.parametrize("mode", ["regular", "canonical"])
def test_row_v2_bit_equal(mode, dict_k31, dict_k31_canonical, rng, monkeypatch):
    d = dict_k31_canonical if mode == "canonical" else dict_k31
    idx = d.index
    ids, km, neg = _pos_neg(idx, rng)

    eng1 = DeviceEngine(idx)
    r1, n1 = eng1.lookup(km), eng1.lookup(neg)
    a1 = eng1.access(ids[:2048].astype(np.uint32))

    monkeypatch.setenv("SSHASH_ROW_V2", "1")
    assert use_row_v2(idx)
    eng2 = DeviceEngine(idx)
    assert eng2.cfg.row_v2 and eng2.cfg.quad_w == 3
    r2, n2 = eng2.lookup(km), eng2.lookup(neg)
    assert np.array_equal(r2["kmer_id"], r1["kmer_id"])
    assert np.array_equal(r2["kmer_orientation"], r1["kmer_orientation"])
    assert np.array_equal(r2["minimizer_found"], r1["minimizer_found"])
    assert np.array_equal(n2["kmer_id"], n1["kmer_id"])
    assert np.array_equal(eng2.access(ids[:2048].astype(np.uint32)), a1)
    # v2 neighbours serve ids too
    nb1 = eng1.kmer_neighbours(km[:512])
    nb2 = eng2.kmer_neighbours(km[:512])
    assert np.array_equal(nb1["kmer_id"], nb2["kmer_id"])


def test_wide_ids_bit_equal(dict_k31, rng, monkeypatch):
    idx = dict_k31.index
    ids, km, neg = _pos_neg(idx, rng)
    eng1 = DeviceEngine(idx)
    r1, n1 = eng1.lookup(km), eng1.lookup(neg)

    monkeypatch.setenv("SSHASH_WIDE_IDS", "1")
    eng3 = DeviceEngine(idx)
    assert eng3.cfg.wide_ids
    r3, n3 = eng3.lookup(km), eng3.lookup(neg)
    for key in r1:
        assert np.array_equal(r3[key], r1[key]), key
    assert np.array_equal(n3["kmer_id"], n1["kmer_id"])


def test_no_c1_bit_equal(dict_k31_canonical, rng, monkeypatch):
    """SSHASH_NO_C1 drops the candidate-1 row block (22 -> 12 u32; size-2
    buckets ride the pair sweep) — the GB-scale HBM-locality experiment
    format must stay bit-identical."""
    idx = dict_k31_canonical.index
    ids, km, neg = _pos_neg(idx, rng)
    eng1 = DeviceEngine(idx)
    r1, n1 = eng1.lookup(km), eng1.lookup(neg)
    monkeypatch.setenv("SSHASH_NO_C1", "1")
    eng2 = DeviceEngine(idx)
    assert not eng2.cfg.c1_in_row
    r2, n2 = eng2.lookup(km), eng2.lookup(neg)
    for key in r1:
        assert np.array_equal(r2[key], r1[key]), key
    assert np.array_equal(n2["kmer_id"], n1["kmer_id"])
    monkeypatch.setenv("SSHASH_ROW_V2", "1")
    eng3 = DeviceEngine(idx)
    assert np.array_equal(eng3.lookup(km)["kmer_id"], r1["kmer_id"])


def test_c1_auto_gate(dict_k31_canonical, rng):
    """use_c1 gates the candidate-1 row block on the index's own bucket
    histogram (round 5): human-config m builds are ~99.998% singleton
    buckets, where the block is pure row bloat (measured slower at 200M,
    BENCH_NOTES round-5 A/B). An all-singleton histogram must auto-drop
    the block and stay bit-identical — size-2 buckets ride the pair sweep."""
    from sshash_tpu.engine import use_c1

    idx = dict_k31_canonical.index
    hist = idx.stats.get("bucket_size_histogram") or {}
    nmini = int(idx.stats.get("num_minimizers", 0))
    assert hist and nmini, "fixture index must record a bucket histogram"
    # the m13 salmonella-style fixture has a fat multi-bucket tail
    assert use_c1(idx)

    ids, km, neg = _pos_neg(idx, rng)
    eng1 = DeviceEngine(idx)
    r1, n1 = eng1.lookup(km), eng1.lookup(neg)
    assert eng1.cfg.c1_in_row

    # fabricate a human-config histogram (>99% singletons): the histogram
    # only selects the row FORMAT, never the semantics, so lookups through
    # the auto-narrowed rows must match bit for bit
    stats2 = dict(idx.stats)
    stats2["bucket_size_histogram"] = {"1": nmini}
    idx2 = dataclasses.replace(idx, stats=stats2)
    assert not use_c1(idx2)
    eng2 = DeviceEngine(idx2)
    assert not eng2.cfg.c1_in_row
    from sshash_tpu.engine import cand_block_width, row_width

    assert row_width(eng2.cfg) == 2 + cand_block_width(eng2.cfg)
    r2, n2 = eng2.lookup(km), eng2.lookup(neg)
    for key in r1:
        assert np.array_equal(r2[key], r1[key]), key
    assert np.array_equal(n2["kmer_id"], n1["kmer_id"])


def test_c1_auto_gate_regular(dict_k31, rng):
    """Regular mode under the auto-dropped candidate-1 block: the fused
    dual-strand LIGHT probe marks size>1 buckets unresolved when c1 is off
    (jmin drops 2 -> 1) and the compacted fallback must still resolve them
    bit-exactly."""
    from sshash_tpu.engine import use_c1

    idx = dict_k31.index
    ids, km, neg = _pos_neg(idx, rng)
    eng1 = DeviceEngine(idx)
    r1, n1 = eng1.lookup(km), eng1.lookup(neg)

    stats2 = dict(idx.stats)
    stats2["bucket_size_histogram"] = {"1": int(idx.stats["num_minimizers"])}
    idx2 = dataclasses.replace(idx, stats=stats2)
    assert not use_c1(idx2)
    eng2 = DeviceEngine(idx2)
    assert eng2.cfg.reg_dual and not eng2.cfg.c1_in_row
    r2, n2 = eng2.lookup(km), eng2.lookup(neg)
    for key in r1:
        assert np.array_equal(r2[key], r1[key]), key
    assert np.array_equal(n2["kmer_id"], n1["kmer_id"])


def test_v2_full_fields_raise(dict_k31, monkeypatch):
    monkeypatch.setenv("SSHASH_ROW_V2", "1")
    from sshash_tpu.engine import make_lookup

    cfg = StaticCfg(dict_k31.index)
    with pytest.raises(ValueError, match="v2"):
        make_lookup(cfg, fields="full")
    from sshash_tpu.streaming import make_stream_step

    with pytest.raises(ValueError, match="streaming"):
        make_stream_step(cfg, lambda a, x: None, 1 << 16, 1 << 12)


def test_id_capacity_guard(dict_k31):
    from sshash_tpu.engine import _device_arrays

    idx = dataclasses.replace(dict_k31.index, num_kmers=(1 << 32) - 1)
    with pytest.raises(ValueError, match="uint32"):
        _device_arrays(idx)


def test_v2_sharded_lookup(dict_k31, rng, monkeypatch):
    """The >= 2^32-char capacity path: rebased rows served sharded over the
    virtual 8-device mesh (data x bucket), bit-equal to the local v1 engine.
    This is the layout the >2^31-kmer capacity artifact runs at scale
    (scripts/exp_big_capacity.py)."""
    from sshash_tpu.parallel import ShardedEngine, make_mesh

    idx = dict_k31.index
    ids, km, neg = _pos_neg(idx, rng, B=1 << 10)
    eng1 = DeviceEngine(idx)
    r1, n1 = eng1.lookup(km), eng1.lookup(neg)

    monkeypatch.setenv("SSHASH_ROW_V2", "1")
    monkeypatch.setenv("SSHASH_WIDE_IDS", "1")
    se = ShardedEngine(idx, make_mesh((4, 2)))
    assert se.cfg.row_v2 and se.cfg.wide_ids
    r2, rep = se.lookup(km)
    assert np.array_equal(r2["kmer_id"], r1["kmer_id"])
    assert np.array_equal(r2["kmer_orientation"], r1["kmer_orientation"])
    assert rep["num_positive"] == len(km)
    n2, nrep = se.lookup(neg)
    assert np.array_equal(n2["kmer_id"], n1["kmer_id"])
