"""Sweep the skew-index threshold MIN_L and report space/time trade-offs
(reference script/sweep-min-l.py:34-70, which edits constants.hpp and
recompiles; the process-level analog here is the SSHASH_MIN_L env override
read once at import, so each l runs in a fresh subprocess).

Usage: python scripts/sweep_min_l.py -i input.fa.gz -k 31 -m 15 [--l-values 4,6,8]
Prints one json line per l.
"""

import argparse
import json
import os
import subprocess
import sys

REPO = __file__.rsplit("/", 2)[0]

_CHILD = r"""
import json, sys, time
sys.path.insert(0, %(repo)r)
import jax
jax.config.update("jax_platforms", "cpu")
from sshash_tpu import BuildConfig, Dictionary
from sshash_tpu.constants import MIN_L, MAX_L
from sshash_tpu.info import space_breakdown
t0 = time.perf_counter()
d = Dictionary.build(%(input)r, BuildConfig(k=%(k)d, m=%(m)d, canonical=%(canonical)r,
                                            verbose=False))
build_s = time.perf_counter() - t0
parts = space_breakdown(d.index)
n = d.num_kmers()
print(json.dumps({
    "min_l": MIN_L, "max_l": MAX_L, "k": %(k)d, "m": %(m)d,
    "num_kmers": n,
    "num_heavy_partitions": d.index.stats.get("num_partitions", 0),
    "num_heavy_positions": int(len(d.index.heavy_load_buckets)),
    "bits_per_kmer": round(sum(parts.values()) / n, 4),
    "skew_bits_per_kmer": round(parts.get("skew_index", 0) / n, 4),
    "build_sec": round(build_s, 2),
}))
"""


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-i", "--input", required=True)
    ap.add_argument("-k", type=int, default=31)
    ap.add_argument("-m", type=int, default=15)
    ap.add_argument("--l-values", default="4,6,8,10")
    ap.add_argument("--canonical", action="store_true")
    args = ap.parse_args()

    code = _CHILD % {"repo": REPO, "input": args.input, "k": args.k,
                     "m": args.m, "canonical": args.canonical}
    for l in (int(x) for x in args.l_values.split(",")):
        env = dict(os.environ, SSHASH_MIN_L=str(l), SSHASH_MAX_L=str(l + 7))
        out = subprocess.run([sys.executable, "-c", code], env=env,
                             capture_output=True, text=True)
        if out.returncode != 0:
            print(json.dumps({"min_l": l, "error": out.stderr.strip()[-500:]}))
        else:
            print(out.stdout.strip().splitlines()[-1])


if __name__ == "__main__":
    main()
