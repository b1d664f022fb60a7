"""Headline benchmark: batched positive-lookup throughput on one chip.

Builds the index from the reference's bundled salmonella k31 unitigs
(the largest dataset shipped in-tree), then times the jitted device lookup
kernel on a large random batch with 50% of the queries reverse-complemented
(the reference's own perf recipe, tools/perf.hpp:9-157).

Baseline: the reference's best single-thread positive-lookup figure on its
smallest benchmarked dataset, 523 ns/kmer on ncbi-virus k31
(benchmarks/results-21-01-26/k31/regular-bench.json) = 1.912M lookups/s.
Prints ONE json line {metric, value, unit, vs_baseline}.
"""

import json
import sys
import time

import numpy as np

BASELINE_LOOKUPS_PER_S = 1e9 / 523.0  # reference fastest positive-lookup row
INPUT = "/root/reference/data/unitigs_stitched/salmonella_enterica_k31_ust.fa.gz"


def main():
    import jax
    import jax.numpy as jnp

    from sshash_tpu import BuildConfig, Dictionary
    from sshash_tpu import kmer as K
    from sshash_tpu.oracle import access

    d = Dictionary.build(INPUT, BuildConfig(k=31, m=15, verbose=False))
    index = d.index
    eng = d.to_device()

    rng = np.random.default_rng(0xBE7C)
    B = 1 << 22
    ids = rng.integers(0, index.num_kmers, B)
    kmers64 = access(index, ids)
    half = B // 2
    kmers64[:half] = K.revcomp_kmers(kmers64[:half], index.k)
    kmers32 = jax.device_put(jnp.asarray(K.kmers_to_u32(kmers64, index.k)))

    # timing note: block_until_ready does not truly block over the axon
    # tunnel, so every timed iteration fetches a scalar reduction to force
    # execution end-to-end.
    reduced = jax.jit(lambda a, x: eng._lookup_fn(a, x)["kmer_id"].sum())

    # warmup / compile + correctness
    res = eng.lookup_device(kmers32)
    n_found = int(np.asarray(res["found"]).sum())
    assert n_found == B, f"expected all positive, found {n_found}/{B}"
    want = int(np.asarray(res["kmer_id"]).astype(np.uint64).sum() & 0xFFFFFFFF)
    s = int(np.asarray(reduced(eng.arrs, kmers32)))
    assert s & 0xFFFFFFFF == want

    reps = 5
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(reduced(eng.arrs, kmers32))
        best = min(best, time.perf_counter() - t0)

    lookups_per_s = B / best
    print(json.dumps({
        "metric": "positive_lookup_throughput",
        "value": round(lookups_per_s),
        "unit": "lookups/s",
        "vs_baseline": round(lookups_per_s / BASELINE_LOOKUPS_PER_S, 2),
    }))


if __name__ == "__main__":
    sys.exit(main())
