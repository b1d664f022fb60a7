"""Build and SAVE the 200M-kmer synthetic index for the single-chip scale
measurement (scripts/exp_scale_device.py). Human-config k31 m21, external
(out-of-core) pipeline; the saved artifact is the mmap directory format so
the device script's load is O(metadata).

Usage: python scripts/build_scale_index.py [--kmers 200000000] \
           [--out /tmp/scale/idx200m] [--ram-mb 16384]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

REPO = __file__.rsplit("/", 2)[0]
sys.path.insert(0, REPO)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--kmers", type=int, default=200_000_000)
    ap.add_argument("--out", default=None,
                    help="index output dir; default derives from --kmers and "
                         "--canonical (e.g. /tmp/scale/idx200m_canon) so the "
                         "two modes can never collide on one path")
    ap.add_argument("--ram-mb", type=int, default=16384)
    ap.add_argument("-k", type=int, default=31)
    ap.add_argument("-m", type=int, default=21)
    ap.add_argument("--canonical", action="store_true",
                    help="canonical index (reference human canon rows: "
                         "592/420 ns pos/neg, BASELINE.md)")
    ap.add_argument("--no-arrs", action="store_true",
                    help="skip the slot-expanded device-pytree cache")
    args = ap.parse_args()
    if args.out is None:
        mm = args.kmers // 1_000_000
        tag = f"idx{mm}m" if mm < 1000 else f"idx{mm / 1000:g}g"
        if args.canonical:
            tag += "_canon"
        args.out = f"/tmp/scale/{tag}"

    import jax

    jax.config.update("jax_platforms", "cpu")
    from soak_external import generate  # synthetic unitig generator

    from sshash_tpu import BuildConfig, Dictionary

    wd = os.path.dirname(args.out) or "/tmp/scale"
    os.makedirs(wd, exist_ok=True)
    # kmers/k ride the filename so a re-run with different parameters can
    # never silently reuse a mismatched FASTA
    fa = os.path.join(wd, f"scale_{args.kmers}_k{args.k}.fa")
    if not os.path.exists(fa):
        generate(fa, args.kmers, args.k)

    t0 = time.perf_counter()
    d = Dictionary.build(fa, BuildConfig(k=args.k, m=args.m, verbose=True,
                                         canonical=args.canonical,
                                         ram_limit_mb=args.ram_mb,
                                         tmp_dir=wd))
    build_s = time.perf_counter() - t0
    print(json.dumps({"stage": "build", "sec": round(build_s, 1),
                      "num_kmers": d.num_kmers(),
                      "ns_per_kmer": round(build_s * 1e9 / d.num_kmers(), 1)}),
          flush=True)

    t0 = time.perf_counter()
    d.save(args.out)
    print(json.dumps({"stage": "save", "sec": round(time.perf_counter() - t0, 1),
                      "out": args.out}), flush=True)

    if args.no_arrs:
        return 0
    # precompute the slot-expanded device pytree too (the multi-pass host
    # job exp_scale_device would otherwise do inline), so the TPU step is
    # pure upload + kernel
    cache = args.out.rstrip("/") + ".arrs"
    if os.path.isdir(cache):
        print(json.dumps({"stage": "device_arrays_cache", "skipped": True,
                          "cache": cache}), flush=True)
        return 0
    t0 = time.perf_counter()
    from sshash_tpu.engine import _device_arrays

    host_arrs = _device_arrays(d.index)
    # mode metadata rides the cache so a mismatched reuse fails loudly
    # (a regular-mode .arrs must never serve a canonical engine)
    meta = {"k": args.k, "m": args.m, "canonical": bool(args.canonical),
            "num_kmers": d.num_kmers()}
    # a stale .tmp from a crashed run must not leak leftover .npy files into
    # the renamed cache (exp_scale_device loads every *.npy wholesale)
    import shutil

    shutil.rmtree(cache + ".tmp", ignore_errors=True)
    os.makedirs(cache + ".tmp")
    for k2, v in host_arrs.items():
        np.save(os.path.join(cache + ".tmp", k2 + ".npy"), v)
    with open(os.path.join(cache + ".tmp", "meta.json"), "w") as f:
        json.dump(meta, f)
    os.rename(cache + ".tmp", cache)
    print(json.dumps({"stage": "device_arrays_cache",
                      "sec": round(time.perf_counter() - t0, 1),
                      "bytes": int(sum(a.nbytes for a in host_arrs.values()))}),
          flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
