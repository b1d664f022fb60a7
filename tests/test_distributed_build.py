"""Multi-process (multi-host analog) build: the minimizer-tuple scan shards
across worker PROCESSES sharing only a spill directory; the assembled index
must be bit-identical to the single-process in-RAM build
(builder/distributed.py; reference contrast: one machine's threads,
src/builder/compute_minimizer_tuples.cpp:19-117)."""

import numpy as np
import pytest

from sshash_tpu import BuildConfig, Dictionary
from sshash_tpu import native

from conftest import SE_K31
from test_external_build import _assert_index_equal

pytestmark = [pytest.mark.skipif(not native.available(),
                                 reason="needs the native scanner"),
              pytest.mark.slow]


@pytest.mark.parametrize("canonical", [False, True])
def test_distributed_build_bit_identical(tmp_path, canonical):
    """2 spawned worker processes scan disjoint sequence blocks; canonical
    mode exercises the one real ordering hazard (fwd/RC tuples at EQUAL
    (slot, position) must keep their in-file order through the union)."""
    avg = 20_000
    d_dist = Dictionary.build(SE_K31, BuildConfig(
        k=31, m=13, canonical=canonical, verbose=False,
        avg_partition_size=avg, scan_procs=2, tmp_dir=str(tmp_path),
        ram_limit_mb=8))
    d_ram = Dictionary.build(SE_K31, BuildConfig(
        k=31, m=13, canonical=canonical, verbose=False,
        avg_partition_size=avg))
    _assert_index_equal(d_dist.index, d_ram.index)
    assert d_dist.index.stats["num_minimizers"] == d_ram.index.stats["num_minimizers"]


def test_scan_shard_blocks_partition_tuples(tmp_path):
    """The workers' spills together carry exactly the tuple multiset of a
    single scan: every (minimizer, position) appears in exactly one worker's
    files, and block assignment is derivable by any process from the file."""
    import json
    import os

    from sshash_tpu.builder.distributed import scan_shard
    from sshash_tpu.builder.external import TUPLE_DT

    W = 3
    counts = []
    for w in range(W):
        counts.append(scan_shard(SE_K31, 31, 13, 1, False, w, W,
                                 str(tmp_path), block_chars=1 << 18))
    assert sum(counts) > 0 and all(c > 0 for c in counts)
    recs = []
    for name in sorted(os.listdir(tmp_path)):
        if name.endswith(".bin"):
            recs.append(np.fromfile(tmp_path / name, dtype=TUPLE_DT))
    allr = np.concatenate(recs)
    assert len(allr) == sum(counts)
    # positions are globally unique per (mn, pos, pik): no double-scanning
    key = np.stack([allr["mn"], allr["pos"].astype(np.uint64),
                    allr["pik"].astype(np.uint64)], axis=1)
    assert len(np.unique(key, axis=0)) == len(key)
    for w in range(W):
        meta = json.load(open(tmp_path / f"meta_w{w}.json"))
        assert meta["tuples"] == counts[w]


def test_assemble_from_prespilled_dir(tmp_path, rng):
    """The real multi-host recipe: ranks run the worker CLI against a shared
    directory; the coordinator assembles with BuildConfig(scan_dir=...) —
    bit-identical to the in-RAM build, meta files verified."""
    import json
    import subprocess
    import sys

    W = 2
    for w in range(W):
        subprocess.run([sys.executable, "-m", "sshash_tpu.builder.distributed",
                        "--input", SE_K31, "-k", "31", "-m", "13",
                        "--seed", "1", "--wid", str(w), "--nworkers", str(W),
                        "--dir", str(tmp_path)], check=True)
    d = Dictionary.build(SE_K31, BuildConfig(
        k=31, m=13, verbose=False, avg_partition_size=20_000,
        scan_procs=W, scan_dir=str(tmp_path)))
    d_ram = Dictionary.build(SE_K31, BuildConfig(
        k=31, m=13, verbose=False, avg_partition_size=20_000))
    _assert_index_equal(d.index, d_ram.index)

    # a rank that scanned with different parameters must be rejected
    with pytest.raises(RuntimeError, match="different parameters"):
        Dictionary.build(SE_K31, BuildConfig(
            k=31, m=15, verbose=False, scan_procs=W, scan_dir=str(tmp_path)))
    # a stale extra rank's meta (from an older, wider run) must be rejected
    import shutil

    shutil.copy(tmp_path / "meta_w1.json", tmp_path / "meta_w5.json")
    with pytest.raises(RuntimeError, match="beyond rank 1"):
        Dictionary.build(SE_K31, BuildConfig(
            k=31, m=13, verbose=False, scan_procs=W, scan_dir=str(tmp_path)))
    (tmp_path / "meta_w5.json").unlink()
    # and a rank that scanned a different/stale input
    meta = json.load(open(tmp_path / "meta_w0.json"))
    meta["chars_seen"] -= 1
    json.dump(meta, open(tmp_path / "meta_w0.json", "w"))
    with pytest.raises(RuntimeError, match="same input"):
        Dictionary.build(SE_K31, BuildConfig(
            k=31, m=13, verbose=False, scan_procs=W, scan_dir=str(tmp_path)))
    # and a missing rank
    meta["chars_seen"] += 1
    json.dump(meta, open(tmp_path / "meta_w0.json", "w"))
    (tmp_path / "meta_w1.json").unlink()
    with pytest.raises(RuntimeError, match="rank 1"):
        Dictionary.build(SE_K31, BuildConfig(
            k=31, m=13, verbose=False, scan_procs=W, scan_dir=str(tmp_path)))
