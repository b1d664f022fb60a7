"""CLI round-trip, self-check suite, info/space breakdown, save/load — on a
small synthetic collection (fast)."""

import json
import os
import sys

import numpy as np
import pytest


@pytest.fixture(scope="module")
def tiny_fa(tmp_path_factory):
    rng = np.random.default_rng(42)
    path = tmp_path_factory.mktemp("cli") / "tiny.fa"
    with open(path, "w") as f:
        for i in range(80):
            seq = "".join("ACGT"[c] for c in rng.integers(0, 4, 120))
            f.write(f">{i}\n{seq}\n")
    return str(path)


@pytest.fixture(scope="module")
def built(tiny_fa, tmp_path_factory):
    from sshash_tpu.tools.cli import main

    out = str(tmp_path_factory.mktemp("idx") / "tiny.npz")
    rc = main(["build", "-i", tiny_fa, "-k", "21", "-m", "9", "-o", out])
    assert rc == 0 and os.path.exists(out)
    return out


def test_cli_check(built, capsys):
    from sshash_tpu.tools.cli import main

    assert main(["check", "-i", built]) == 0
    assert "check: OK" in capsys.readouterr().out


def test_cli_query(built, tiny_fa, tmp_path, capsys):
    from sshash_tpu.tools.cli import main

    # query the build input itself as a 2-line fasta: all kmers positive
    q = str(tmp_path / "q.fa")
    with open(tiny_fa) as f, open(q, "w") as g:
        g.write(f.read())
    assert main(["query", "-i", built, "-q", q]) == 0
    out = capsys.readouterr().out
    rep = json.loads(out.strip().splitlines()[-1])
    assert rep["num_positive_kmers"] == rep["num_kmers"] == 80 * (120 - 21 + 1)
    assert rep["num_extensions"] > rep["num_searches"]


def test_cli_bench_host(built, capsys):
    from sshash_tpu.tools.cli import main

    assert main(["bench", "-i", built, "--batch", "4096", "--runs", "1", "--host"]) == 0
    rows = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert "positive_lookup (avg_nanosec_per_kmer)" in rows


def test_check_all_and_weights(dict_weighted):
    from sshash_tpu.check import check_all, check_weights
    from sshash_tpu.builder.parse import parse_input
    from conftest import WEIGHTED_K31

    check_all(dict_weighted)
    parsed = parse_input(WEIGHTED_K31, 31, weighted=True)
    check_weights(dict_weighted.index,
                  (parsed.weight_interval_values, parsed.weight_interval_lengths))


def test_info_space_breakdown(dict_weighted, capsys):
    from sshash_tpu.info import print_info, space_breakdown

    parts = space_breakdown(dict_weighted.index)
    assert parts["strings"] == 2 * dict_weighted.index.num_chars
    assert "weights" in parts
    d = print_info(dict_weighted.index)
    out = capsys.readouterr().out
    assert "SPACE BREAKDOWN" in out and d["weighted"] is True


def test_save_load_roundtrip_queries(built):
    from sshash_tpu.dictionary import Dictionary
    from sshash_tpu.oracle import access, lookup
    from sshash_tpu.constants import INVALID_UINT64

    d = Dictionary.load(built)
    ids = np.arange(0, d.num_kmers(), 37)
    km = access(d.index, ids)
    res = lookup(d.index, km)
    np.testing.assert_array_equal(res["kmer_id"], ids.astype(np.uint64))

    # version gate: major bump must refuse to load
    import json as _json
    z = np.load(built)
    meta = _json.loads(bytes(z["meta_json"]).decode())
    meta["version"][0] += 1
    arrays = {k: z[k] for k in z.files}
    arrays["meta_json"] = np.frombuffer(_json.dumps(meta).encode(), dtype=np.uint8)
    bad = built + ".bad.npz"
    np.savez_compressed(bad, **arrays)
    with pytest.raises(RuntimeError, match="rebuild"):
        Dictionary.load(bad)


def test_cf_seg_format(tmp_path):
    """cf_seg build inputs: '<id>\\t<sequence>' lines (encode_strings.cpp)."""
    import numpy as np
    from sshash_tpu import BuildConfig, Dictionary
    from sshash_tpu.oracle import access, lookup

    rng = np.random.default_rng(11)
    path = str(tmp_path / "in.cf_seg")
    with open(path, "w") as f:
        for i in range(30):
            seq = "".join("ACGT"[c] for c in rng.integers(0, 4, 90))
            f.write(f"{i}\t{seq}\n")
    d = Dictionary.build(path, BuildConfig(k=21, m=9, verbose=False))
    ids = np.arange(0, d.num_kmers(), 13)
    res = lookup(d.index, access(d.index, ids))
    np.testing.assert_array_equal(res["kmer_id"], ids.astype(np.uint64))


def test_invalid_char_rejected(tmp_path):
    import pytest
    from sshash_tpu import BuildConfig, Dictionary

    path = str(tmp_path / "bad.fa")
    with open(path, "w") as f:
        f.write(">0\n" + "ACGT" * 10 + "N" + "ACGT" * 10 + "\n")
    with pytest.raises(ValueError, match="invalid character"):
        Dictionary.build(path, BuildConfig(k=21, m=9, verbose=False))


def test_cli_bench_device(built, capsys):
    from sshash_tpu.tools.cli import main

    assert main(["bench", "-i", built, "--batch", "2048", "--runs", "1"]) == 0
    rows = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    for key in ("positive_lookup", "negative_lookup", "access", "iterator"):
        assert f"{key} (avg_nanosec_per_kmer)" in rows


def test_cli_bench_weighted_rows(dict_weighted, tmp_path, capsys):
    """Weighted indexes add the lookup+weight perf axis (reference
    perf_test_lookup_weight, tools/perf.hpp:110-155) in both engines."""
    from sshash_tpu.tools.cli import main

    p = str(tmp_path / "w.npz")
    dict_weighted.save(p)
    assert main(["bench", "-i", p, "--batch", "2048", "--runs", "1",
                 "--host"]) == 0
    rows = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert "positive_lookup_weight (avg_nanosec_per_kmer)" in rows
    assert "iterator (avg_nanosec_per_kmer)" in rows
    assert main(["bench", "-i", p, "--batch", "1024", "--runs", "1"]) == 0
    rows = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert "positive_lookup_weight (avg_nanosec_per_kmer)" in rows
