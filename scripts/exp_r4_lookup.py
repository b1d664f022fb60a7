"""Round-4 north-star sweep: cand1-in-row + packed 1-col ids scatter.

Times the id-only canonical lookup kernel (the bench headline) across
m / PAIR_DIV / batch-size variants on the real chip.

Usage: python scripts/exp_r4_lookup.py [m ...]   (default: 17 18 19)
Env: SSHASH_PAIR_DIV sweeps inside; B=4M and 8M rows.
"""

import json
import os
import sys
import time

import numpy as np

REPO = __file__.rsplit("/", 2)[0]
sys.path.insert(0, REPO)

INPUT = "/root/reference/data/unitigs_stitched/salmonella_enterica_k31_ust.fa.gz"


def bench_engine(d, B, runs=5):
    import jax
    import jax.numpy as jnp

    from sshash_tpu import kmer as K
    from sshash_tpu.oracle import access

    from sshash_tpu.engine import DeviceEngine

    index = d.index
    # fresh engine per call: SSHASH_PAIR_DIV is read at trace time
    eng = DeviceEngine(index)
    rng = np.random.default_rng(0xBE7C)
    ids = rng.integers(0, index.num_kmers, B)
    kmers64 = access(index, ids)
    kmers64[: B // 2] = K.revcomp_kmers(kmers64[: B // 2], index.k)
    km32 = jax.device_put(jnp.asarray(K.kmers_to_u32(kmers64, index.k)))
    red = jax.jit(lambda a, x: eng._lookup_ids_fn(a, x)["kmer_id"].sum())
    np.asarray(red(eng.arrs, km32))
    # correctness spot check on this batch
    out = eng._lookup_ids(eng.arrs, km32)
    ok = int((np.asarray(out["kmer_id"]) == ids.astype(np.uint32)).sum())
    assert ok == B, f"ids mismatch {ok}/{B}"
    best = float("inf")
    for _ in range(runs):
        t0 = time.perf_counter()
        np.asarray(red(eng.arrs, km32))
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    from sshash_tpu import BuildConfig, Dictionary

    ms = [int(x) for x in sys.argv[1:]] or [17, 18, 19]
    for m in ms:
        d = Dictionary.build(INPUT, BuildConfig(k=31, m=m, canonical=True,
                                                verbose=False))
        for div in (8, 32):
            os.environ["SSHASH_PAIR_DIV"] = str(div)
            for B in ((1 << 22,) if div != 8 else (1 << 22, 1 << 23)):
                t = bench_engine(d, B)
                print(json.dumps({
                    "exp": "r4_lookup", "m": m, "pair_div": div, "B": B,
                    "ns_per_kmer": round(t * 1e9 / B, 2),
                    "lookups_per_s": round(B / t),
                    "vs_523ns": round((B / t) / (1e9 / 523.0), 2),
                }), flush=True)


if __name__ == "__main__":
    main()
