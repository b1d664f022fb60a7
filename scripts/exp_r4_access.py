"""Round-4 secondary-axis session: fused access row + negative lookup in
BOTH index modes, timed on the real chip.

- access: the new 2-dependent-round kernel (fused per-block acc_rows)
  vs BENCH_r03's 59 ns / 16.9M per s (3 rounds).
- negative lookup: canonical is a SINGLE probe (no RC fallback pass) so it
  should run at ~positive-canonical speed; the reference shows the same
  shape (negative canonical 420 ns vs regular 791, BASELINE.md).

Usage: python scripts/exp_r4_access.py
"""

import json
import sys
import time

import numpy as np

REPO = __file__.rsplit("/", 2)[0]
sys.path.insert(0, REPO)

INPUT = "/root/reference/data/unitigs_stitched/salmonella_enterica_k31_ust.fa.gz"


def timed(fn, *args, runs=5):
    np.asarray(fn(*args))  # compile + warm
    best = float("inf")
    for _ in range(runs):
        t0 = time.perf_counter()
        np.asarray(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    import jax
    import jax.numpy as jnp

    from sshash_tpu import BuildConfig, Dictionary
    from sshash_tpu import kmer as K
    from sshash_tpu.oracle import access as oracle_access

    B = 1 << 23
    rng = np.random.default_rng(0xACC)
    for mode in ("regular", "canonical"):
        d = Dictionary.build(INPUT, BuildConfig(k=31, m=17, verbose=False,
                                                canonical=(mode == "canonical")))
        index = d.index
        eng = d.to_device()

        # ---- access (mode-independent kernel, time it once under regular)
        if mode == "regular":
            ids = rng.integers(0, index.num_kmers, B)
            ids32 = jax.device_put(jnp.asarray(ids.astype(np.uint32)))
            # correctness on a slice first (full batch compare is a 32MB
            # download over the 10-30 MB/s tunnel)
            got = np.asarray(eng._access(eng.arrs, ids32[:4096]))
            want = K.kmers_to_u32(oracle_access(index, ids[:4096]), index.k)
            assert np.array_equal(got, want), "access mismatch vs oracle"
            acc = jax.jit(lambda a, i: eng._access(a, i)[:, 0].sum())
            t = timed(acc, eng.arrs, ids32)
            print(json.dumps({"axis": "access", "mode": mode,
                              "ns_per_kmer": round(t * 1e9 / B, 1),
                              "per_s": round(B / t)}), flush=True)
            del ids32

        # ---- negative lookup in this mode
        neg64 = rng.integers(0, 1 << 62, (B, index.kmer_words64),
                             dtype=np.uint64)
        neg64 &= np.uint64((1 << min(2 * index.k, 63)) - 1)
        neg32 = jax.device_put(jnp.asarray(K.kmers_to_u32(neg64, index.k)))
        red = jax.jit(lambda a, x: eng._lookup_ids_fn(a, x)["kmer_id"].sum())
        t = timed(red, eng.arrs, neg32)
        print(json.dumps({"axis": "negative_lookup", "mode": mode,
                          "ns_per_kmer": round(t * 1e9 / B, 1),
                          "per_s": round(B / t)}), flush=True)
        del neg32

        # ---- positive lookup sanity row (tracks the headline)
        ids = rng.integers(0, index.num_kmers, B)
        kmers64 = oracle_access(index, ids)
        kmers64[: B // 2] = K.revcomp_kmers(kmers64[: B // 2], index.k)
        km32 = jax.device_put(jnp.asarray(K.kmers_to_u32(kmers64, index.k)))
        t = timed(red, eng.arrs, km32)
        print(json.dumps({"axis": "positive_lookup", "mode": mode,
                          "ns_per_kmer": round(t * 1e9 / B, 1),
                          "per_s": round(B / t)}), flush=True)
        del km32


if __name__ == "__main__":
    sys.exit(main())
