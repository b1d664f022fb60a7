"""Compute and cache the slot-expanded device pytree for a saved index.

The expansion is a multi-pass host job (~4 min at 33M slots, ~45 min at
263M slots on the throttled 1-vCPU dev host); caching it to <index>.arrs
(directory of .npy + meta.json) makes engine construction O(mmap).

Usage: python scripts/cache_device_arrays.py <index_dir> [--v2] [--out DIR]
  --v2 forces rebased v2 rows (engine.use_row_v2) — the >= 2^32-char
  capacity format, also the narrower-row layout measured at scale.
"""

import argparse
import json
import os
import shutil
import sys
import time

import numpy as np

REPO = __file__.rsplit("/", 2)[0]
sys.path.insert(0, REPO)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("index_dir")
    ap.add_argument("--v2", action="store_true")
    ap.add_argument("--no-c1", action="store_true",
                    help="drop the candidate-1 row block (SSHASH_NO_C1)")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    if args.v2:
        os.environ["SSHASH_ROW_V2"] = "1"
    if args.no_c1:
        os.environ["SSHASH_NO_C1"] = "1"

    import jax

    jax.config.update("jax_platforms", "cpu")
    from sshash_tpu.engine import _device_arrays, use_row_v2
    from sshash_tpu.index import Index

    t0 = time.perf_counter()
    idx = Index.load(args.index_dir)
    print(json.dumps({"stage": "load", "sec": round(time.perf_counter() - t0, 1),
                      "num_kmers": int(idx.num_kmers)}), flush=True)

    cache = args.out or args.index_dir.rstrip("/") + ".arrs"
    t0 = time.perf_counter()
    host_arrs = _device_arrays(idx)
    meta = {"k": idx.k, "m": idx.m, "canonical": bool(idx.canonical),
            "num_kmers": int(idx.num_kmers), "row_v2": use_row_v2(idx),
            "cw_cols": int(host_arrs["cw_row"].shape[1])}
    shutil.rmtree(cache + ".tmp", ignore_errors=True)
    os.makedirs(cache + ".tmp")
    for k2, v in host_arrs.items():
        np.save(os.path.join(cache + ".tmp", k2 + ".npy"), v)
    with open(os.path.join(cache + ".tmp", "meta.json"), "w") as f:
        json.dump(meta, f)
    shutil.rmtree(cache, ignore_errors=True)
    os.rename(cache + ".tmp", cache)
    print(json.dumps({"stage": "device_arrays_cache",
                      "sec": round(time.perf_counter() - t0, 1),
                      "bytes": int(sum(a.nbytes for a in host_arrs.values())),
                      "meta": meta, "cache": cache}), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
