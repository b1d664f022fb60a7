"""At-rest index formats: compressed npz vs mmap directory; MIN_L load gate;
sweep-min-l script smoke."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

from sshash_tpu import BuildConfig, Dictionary
from sshash_tpu.index import Index

from conftest import SE_K31


@pytest.fixture(scope="module")
def small_dict(tmp_path_factory):
    rng = np.random.default_rng(3)
    path = tmp_path_factory.mktemp("fmt") / "in.fa"
    with open(path, "w") as f:
        for i in range(60):
            f.write(f">{i}\n{''.join('ACGT'[c] for c in rng.integers(0, 4, 150))}\n")
    return Dictionary.build(str(path), BuildConfig(k=21, m=9, verbose=False))


def test_dir_format_roundtrip_mmap(small_dict, tmp_path):
    """Directory save -> mmap load must reproduce the npz load bit-exactly,
    and actually memory-map (reference --mmap, tools/common.hpp:19-29)."""
    d = small_dict
    dir_path = str(tmp_path / "idx_dir")
    npz_path = str(tmp_path / "idx.npz")
    d.save(dir_path)
    d.save(npz_path)
    assert os.path.isdir(dir_path) and os.path.exists(os.path.join(dir_path, "meta.json"))
    a = Index.load(dir_path)
    b = Index.load(npz_path)
    assert isinstance(a.strings64, np.memmap)  # zero-copy until touched
    for name in ("strings64", "string_endpoints", "codewords",
                 "mid_load_buckets", "heavy_load_buckets"):
        np.testing.assert_array_equal(np.asarray(getattr(a, name)),
                                      np.asarray(getattr(b, name)), err_msg=name)
    # a loaded-from-dir dictionary answers queries
    da = Dictionary(a)
    ids = np.arange(min(500, d.num_kmers()))
    np.testing.assert_array_equal(da.lookup(d.access(ids))["kmer_id"],
                                  ids.astype(np.uint64))


def test_min_l_load_gate(small_dict, tmp_path):
    """An index built under a different MIN_L must refuse to load (the
    codeword bit format depends on it)."""
    dir_path = str(tmp_path / "gate_dir")
    small_dict.save(dir_path)
    meta = json.load(open(os.path.join(dir_path, "meta.json")))
    assert meta["min_l"] == 6
    meta["min_l"] = 8
    json.dump(meta, open(os.path.join(dir_path, "meta.json"), "w"))
    with pytest.raises(RuntimeError, match="MIN_L"):
        Index.load(dir_path)


def test_sweep_min_l_script(tmp_path):
    """Subprocess sweep over SSHASH_MIN_L produces valid json lines with
    differing skew layouts (reference script/sweep-min-l.py analog)."""
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = subprocess.run(
        [sys.executable, os.path.join(repo, "scripts", "sweep_min_l.py"),
         "-i", SE_K31, "-k", "31", "-m", "13", "--l-values", "4,6"],
        capture_output=True, text=True, timeout=540)
    assert out.returncode == 0, out.stderr[-800:]
    rows = [json.loads(line) for line in out.stdout.strip().splitlines()]
    assert [r["min_l"] for r in rows] == [4, 6]
    assert all("error" not in r for r in rows), rows
    # lower MIN_L pushes more buckets into the skew index
    assert rows[0]["num_heavy_positions"] > rows[1]["num_heavy_positions"]


def test_elias_fano_roundtrip():
    """EF coder: random monotone sequences round-trip exactly and beat the
    raw-u64 size (reference offsets.hpp:115-155 stores endpoints EF-coded)."""
    from sshash_tpu.compact import ef_decode, ef_encode

    rng = np.random.default_rng(11)
    for n, span in [(1, 10), (100, 10_000), (5000, 1 << 33), (3, 1)]:
        vals = np.sort(rng.integers(0, span, n).astype(np.uint64))
        lo, hi, meta = ef_encode(vals)
        got = ef_decode(lo, hi, meta)
        assert got.dtype == np.uint64 and (got == vals).all(), (n, span)
        if n >= 100:
            assert lo.nbytes + hi.nbytes < vals.nbytes
    lo, hi, meta = ef_encode(np.zeros(0, dtype=np.uint64))
    assert len(ef_decode(lo, hi, meta)) == 0


def test_endpoints_ef_on_disk_and_legacy_raw_load(small_dict, tmp_path):
    """v1.3 files store endpoint arrays EF-coded; loading reproduces them
    exactly, and pre-1.3 files (raw 'string_endpoints' array, no meta.ef)
    still load."""
    ix = small_dict.index
    npz = str(tmp_path / "ix.npz")
    small_dict.save(npz)
    z = np.load(npz)
    assert "string_endpoints" not in z.files
    assert "string_endpoints_ef_low" in z.files
    ld = Index.load(npz)
    assert (np.asarray(ld.string_endpoints, dtype=np.uint64)
            == np.asarray(ix.string_endpoints, dtype=np.uint64)).all()

    # synthesize a legacy (pre-1.3) file: raw endpoints, no meta["ef"]
    arrays, meta = ix._arrays_and_meta()
    for k2 in list(arrays):
        if k2.endswith("_ef_low") or k2.endswith("_ef_high"):
            del arrays[k2]
    del meta["ef"]
    meta["version"] = [1, 2, 0]
    arrays["string_endpoints"] = np.asarray(ix.string_endpoints, dtype=np.uint64)
    arrays["meta_json"] = np.frombuffer(json.dumps(meta).encode(), dtype=np.uint8)
    legacy = str(tmp_path / "legacy.npz")
    np.savez_compressed(legacy, **arrays)
    ld2 = Index.load(legacy)
    assert (np.asarray(ld2.string_endpoints, dtype=np.uint64)
            == np.asarray(ix.string_endpoints, dtype=np.uint64)).all()
