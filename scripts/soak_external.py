"""Out-of-core build soak: >=200M-kmer synthetic collection under a RAM cap.

Generates a synthetic unitig set (~210M chars), builds with the external
(hash-range spilled) pipeline while polling peak RssAnon, then validates
sampled round-trips against the oracle. Prints json lines.

Usage: python scripts/soak_external.py [--kmers 200000000] [--ram-mb 2048]
"""

import argparse
import json
import os
import subprocess
import sys
import tempfile
import time

import numpy as np

REPO = __file__.rsplit("/", 2)[0]
sys.path.insert(0, REPO)


def generate(path, num_kmers, k, seed=7):
    rng = np.random.default_rng(seed)
    seq_len = 100_000
    per_seq = seq_len - k + 1
    n_seq = -(-num_kmers // per_seq)
    lut = np.frombuffer(b"ACGT", dtype=np.uint8)
    t0 = time.perf_counter()
    with open(path, "wb") as f:
        for i in range(n_seq):
            s = lut[rng.integers(0, 4, seq_len, dtype=np.uint8)]
            f.write(b">" + str(i).encode() + b"\n")
            f.write(s.tobytes() + b"\n")
    print(json.dumps({"generated_seqs": n_seq, "chars": n_seq * seq_len,
                      "kmers": n_seq * per_seq,
                      "gen_sec": round(time.perf_counter() - t0, 1)}), flush=True)
    return n_seq * per_seq


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--kmers", type=int, default=200_000_000)
    ap.add_argument("--ram-mb", type=int, default=2048)
    ap.add_argument("-k", type=int, default=31)
    ap.add_argument("-m", type=int, default=21)
    ap.add_argument("--workdir", default=None)
    args = ap.parse_args()

    wd = args.workdir or tempfile.mkdtemp(prefix="sshash_soak_")
    fa = os.path.join(wd, "soak.fa")
    if not os.path.exists(fa):
        generate(fa, args.kmers, args.k)

    # build in a child process so RssAnon reflects the build alone
    child = f"""
import json, sys, time
sys.path.insert(0, {REPO!r})
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np
from sshash_tpu import BuildConfig, Dictionary
from sshash_tpu import oracle
from sshash_tpu import kmer as K
t0 = time.perf_counter()
d = Dictionary.build({fa!r}, BuildConfig(k={args.k}, m={args.m}, verbose=True,
                                         ram_limit_mb={args.ram_mb},
                                         tmp_dir={wd!r}))
build_s = time.perf_counter() - t0
rng = np.random.default_rng(1)
ids = rng.integers(0, d.num_kmers(), 20000)
kms = d.access(ids)
half = len(ids) // 2
kms[:half] = K.revcomp_kmers(kms[:half], {args.k})
res = d.lookup(kms)
ok = bool((res["kmer_id"] == ids.astype(np.uint64)).all())
neg = rng.integers(0, 1 << 62, (20000, d.index.kmer_words64), dtype=np.uint64)
negres = d.lookup(neg)
print(json.dumps({{"num_kmers": d.num_kmers(),
                   "num_minimizers": d.index.stats["num_minimizers"],
                   "mphf_partitions": d.index.minimizer_mphf.num_partitions,
                   "build_sec": round(build_s, 1),
                   "ns_per_kmer": round(build_s * 1e9 / d.num_kmers(), 1),
                   "roundtrip_ok": ok,
                   "negative_hits": int((negres["kmer_id"] != np.uint64(0xFFFFFFFFFFFFFFFF)).sum())}}),
      flush=True)
assert ok
"""
    sys.path.insert(0, os.path.join(REPO, "scripts"))
    from rss_anon import peak_rss_anon

    rc, peak = peak_rss_anon([sys.executable, "-c", child])
    print(json.dumps({"returncode": rc, "peak_rss_anon_mb": peak // 1024,
                      "ram_limit_mb": args.ram_mb}), flush=True)
    return rc


if __name__ == "__main__":
    sys.exit(main())
