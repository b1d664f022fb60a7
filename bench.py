"""Headline benchmark: batched positive-lookup throughput on one chip.

Builds indexes from the reference's bundled salmonella k31 unitigs, then
times (a) the jitted batched lookup on 4M random queries with 50% of them
reverse-complemented, in BOTH index modes (regular + canonical — the
reference's perf recipe, tools/perf.hpp:9-157, measures regular; canonical
is the reference's own recommendation for mixed-strand workloads), and
(b) warm device streaming of the salmonella genome against its own index
(reference src/query.cpp high-hit workload).

Baseline: the reference's best single-thread positive-lookup figure,
523 ns/kmer on ncbi-virus k31 (benchmarks/results-21-01-26) = 1.912M
lookups/s; streaming reference: 11.2M kmers/s high-hit (human k31).
Prints ONE json line {metric, value, unit, vs_baseline, ...extras}.
"""

import json
import sys
import time

import numpy as np

BASELINE_LOOKUPS_PER_S = 1e9 / 523.0  # reference fastest positive-lookup row
BASELINE_STREAMING_KMERS_PER_S = 11.2e6  # reference high-hit human k31
INPUT = "/root/reference/data/unitigs_stitched/salmonella_enterica_k31_ust.fa.gz"
GENOME = "/root/reference/data/queries/salmonella_enterica.fasta.gz"


def _bench_lookup(eng, kmers32, B):
    import jax

    # timing note: block_until_ready does not truly block over the axon
    # tunnel, so every timed iteration fetches a scalar reduction to force
    # execution end-to-end.
    reduced = jax.jit(lambda a, x: eng._lookup_fn(a, x)["kmer_id"].sum())
    np.asarray(reduced(eng.arrs, kmers32))  # compile + warm
    best = float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        np.asarray(reduced(eng.arrs, kmers32))
        best = min(best, time.perf_counter() - t0)
    return B / best


def main():
    import jax
    import jax.numpy as jnp

    from sshash_tpu import BuildConfig, Dictionary
    from sshash_tpu import kmer as K
    from sshash_tpu.oracle import access
    from sshash_tpu.streaming import streaming_query_from_file

    rng = np.random.default_rng(0xBE7C)
    B = 1 << 22
    rates = {}
    engines = {}
    for mode in ("regular", "canonical"):
        d = Dictionary.build(INPUT, BuildConfig(k=31, m=15, verbose=False,
                                                canonical=(mode == "canonical")))
        index = d.index
        eng = d.to_device()
        engines[mode] = d
        ids = rng.integers(0, index.num_kmers, B)
        kmers64 = access(index, ids)
        half = B // 2
        kmers64[:half] = K.revcomp_kmers(kmers64[:half], index.k)
        kmers32 = jax.device_put(jnp.asarray(K.kmers_to_u32(kmers64, index.k)))
        res = eng.lookup_device(kmers32)
        n_found = int(np.asarray(res["found"]).sum())
        assert n_found == B, f"{mode}: expected all positive, found {n_found}/{B}"
        rates[mode] = _bench_lookup(eng, kmers32, B)
        del kmers32

    # warm device streaming: run once to compile, then time a second pass.
    # chunk = 5M positions -> the whole genome is ONE chunk (one compiled
    # shape; remote compiles cost ~1-3 min each on this setup)
    d = engines["regular"]
    CH = 5 << 20
    rep = streaming_query_from_file(d, GENOME, multiline=True, use_device=True,
                                    chunk=CH)
    assert rep["num_positive_kmers"] == rep["num_kmers"], "genome should self-hit"
    rep = streaming_query_from_file(d, GENOME, multiline=True, use_device=True,
                                    chunk=CH)
    stream_rate = rep["num_kmers"] / (rep["elapsed_millisec"] / 1e3)

    best_mode = max(rates, key=rates.get)
    value = rates[best_mode]
    print(json.dumps({
        "metric": "positive_lookup_throughput",
        "value": round(value),
        "unit": "lookups/s",
        "vs_baseline": round(value / BASELINE_LOOKUPS_PER_S, 2),
        "mode": best_mode,
        "regular_lookups_per_s": round(rates["regular"]),
        "canonical_lookups_per_s": round(rates["canonical"]),
        "streaming_kmers_per_s": round(stream_rate),
        "streaming_vs_ref_high_hit": round(
            stream_rate / BASELINE_STREAMING_KMERS_PER_S, 2),
    }))


if __name__ == "__main__":
    sys.exit(main())
