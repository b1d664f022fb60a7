#!/usr/bin/env python3
"""Merge per-directory build/bench/streaming json-lines into one CSV row
per (collection, mode) — the reference's benchmarks/print_csv.py for this
repo's outputs.

Input dir layout (same naming scheme as the reference):
  {regular,canon}-build.json   — json lines from `sshash_tpu build` /
                                  info.print_info (num_kmers, bits_per_kmer
                                  or index_size_in_bytes, build time in
                                  total_build_time_sec or ..._in_microsec)
  {regular,canon}-bench.json   — json lines from `sshash_tpu bench`
                                  (accepts both "positive_lookup (...)" and
                                  the reference's "positive lookup (...)")
  {regular,canon}-streaming-queries-high-hit.json — query report lines

Usage: python scripts/print_csv.py results_dir
"""

import json
import math
import os
import sys
from statistics import StatisticsError, mean


def _lines(path):
    if not os.path.exists(path):
        return
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            try:
                yield json.loads(line)
            except json.JSONDecodeError:
                print(f"Skipping invalid JSON line in {path}", file=sys.stderr)


def _collection(d):
    for key in ("input_filename", "index_filename", "input"):
        if key in d:
            return os.path.basename(d[key]).split(".")[0].capitalize()
    return "Unknown"


def _fmt_time(seconds):
    return f"{int(seconds // 60)}:{int(seconds % 60):02d}"


def parse_build(path, canonical):
    rows = []
    for d in _lines(path):
        if "num_kmers" not in d:
            continue
        n = int(d["num_kmers"])
        if "index_size_in_bytes" in d:
            bpk = int(d["index_size_in_bytes"]) * 8 / n
            gb = int(d["index_size_in_bytes"]) / 1e9
        else:
            bpk = float(d.get("bits_per_kmer", float("nan")))
            gb = bpk * n / 8 / 1e9
        if "total_build_time_in_microsec" in d:
            secs = int(d["total_build_time_in_microsec"]) / 1e6
        else:
            secs = float(d.get("total_build_time_sec", 0.0))
        rows.append({
            "k": d.get("k", "NA"), "Collection": _collection(d),
            "m": d.get("m", "NA"), "canonical": "yes" if canonical else "no",
            "bits_per_kmer": f"{bpk:.2f}", "total_GB": f"{gb:.2f}",
            "build_time": _fmt_time(secs),
        })
    return rows


def _bench_val(d, stem):
    for key in (f"{stem} (avg_nanosec_per_kmer)",
                f"{stem.replace('_', ' ')} (avg_nanosec_per_kmer)"):
        if key in d:
            return float(d[key])
    return None


def parse_bench(path, canonical):
    data = {}
    for d in _lines(path):
        key = (_collection(d), d.get("m", "NA"), "yes" if canonical else "no")
        e = data.setdefault(key, {"k": d.get("k", "NA"), "pos": [], "neg": [],
                                  "access": [], "iter": []})
        for name, stem in (("pos", "positive_lookup"), ("neg", "negative_lookup"),
                           ("access", "access"), ("iter", "iterator")):
            v = _bench_val(d, stem)
            if v is not None:
                e[name].append(v)
    out = {}
    for key, v in data.items():
        try:
            out[key] = {"k": v["k"],
                        "pos": f"{mean(v['pos']) / 1000:.2f}",
                        "neg": f"{mean(v['neg']) / 1000:.2f}",
                        "access": f"{mean(v['access']) / 1000:.2f}",
                        "iter": f"{mean(v['iter']):.2f}"}
        except StatisticsError:
            out[key] = {"k": v["k"], "pos": "NA", "neg": "NA", "access": "NA",
                        "iter": "NA"}
    return out


def parse_streaming(path, canonical):
    out = {}
    for d in _lines(path):
        if "num_kmers" not in d:
            continue
        n, pos = int(d["num_kmers"]), int(d["num_positive_kmers"])
        ext = int(d.get("num_extensions", 0))
        ms = int(d.get("elapsed_millisec", 0))
        out[(_collection(d), "yes" if canonical else "no")] = {
            "ns_per_kmer": f"{math.ceil(ms * 1e6 / n)}" if n else "NA",
            "hit_rate": f"{100 * pos / n:.2f}" if n else "NA",
            "extension_rate": f"{100 * ext / pos:.2f}" if pos else "NA",
        }
    return out


def main():
    if len(sys.argv) != 2:
        print("Usage: print_csv.py input_dir", file=sys.stderr)
        return 1
    dd = sys.argv[1]
    builds, bench, stream = [], {}, {}
    for prefix, canon in (("regular", False), ("canon", True)):
        builds += parse_build(os.path.join(dd, f"{prefix}-build.json"), canon)
        bench.update(parse_bench(os.path.join(dd, f"{prefix}-bench.json"), canon))
        stream.update(parse_streaming(
            os.path.join(dd, f"{prefix}-streaming-queries-high-hit.json"), canon))

    print("k,Collection,m,canonical,bits_per_kmer,total_GB,build_time,"
          "positive_lookup_ns,negative_lookup_ns,access_ns,iteration_ns,"
          "ns_per_kmer,hit_rate,extension_rate")
    na_b = {"pos": "NA", "neg": "NA", "access": "NA", "iter": "NA"}
    na_s = {"ns_per_kmer": "NA", "hit_rate": "NA", "extension_rate": "NA"}
    for r in sorted(builds, key=lambda x: (str(x["k"]), x["Collection"],
                                           x["canonical"])):
        lk = bench.get((r["Collection"], r["m"], r["canonical"]), na_b)
        st = stream.get((r["Collection"], r["canonical"]), na_s)
        print(f"{r['k']},{r['Collection']},{r['m']},{r['canonical']},"
              f"{r['bits_per_kmer']},{r['total_GB']},{r['build_time']},"
              f"{lk['pos']},{lk['neg']},{lk['access']},{lk['iter']},"
              f"{st['ns_per_kmer']},{st['hit_rate']},{st['extension_rate']}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
