"""Headline benchmark: batched positive-lookup throughput on one chip.

Builds indexes from the reference's bundled salmonella k31 unitigs, then
times every perf axis of the reference's recipe (tools/perf.hpp:9-157):
(a) positive lookup on random queries with 50% reverse-complemented, in
BOTH index modes (regular + canonical), (b) negative lookup on random
kmers, (c) access, (d) the full-iteration analog, (e) warm device
streaming of the salmonella genome against its own index (high-hit,
reference src/query.cpp) and of the bundled SRR fastq reads (low-hit).

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
# the reference's BEST published streaming row (cod k31, 163.3M kmers in
# 4.94 s — results-21-01-26/k31/regular-streaming-queries-high-hit.json:1);
# report both denominators (VERDICT r4 weak #2: the human-row ratio alone
# reads flattering)
BASELINE_STREAMING_BEST_KMERS_PER_S = 33.0e6
# reference human k31 m21 rows for the 200M-scale block (BASELINE.md)
REF_SCALE_NS = {"regular_pos": 735.0, "regular_neg": 791.0,
                "canonical_pos": 592.0, "canonical_neg": 420.0,
                "access": 350.0}
SCALE_DIR = "/tmp/scale"
INPUT = "/root/reference/data/unitigs_stitched/salmonella_enterica_k31_ust.fa.gz"
GENOME = "/root/reference/data/queries/salmonella_enterica.fasta.gz"
READS = "/root/reference/data/queries/SRR5833294.10K.fastq.gz"


def _time_reduced(fn, *args, reps=5):
    """Best-of-reps wall time; every rep fetches a scalar (block_until_ready
    does not truly block over the axon tunnel)."""
    np.asarray(fn(*args))  # compile + warm
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best


def _bench_lookup(eng, kmers32, B):
    import jax

    # the id-only kernel — what the reference's perf recipe measures
    # (lookup(kmer) -> id, tools/perf.hpp:29-47)
    reduced = jax.jit(lambda a, x: eng._lookup_ids_fn(a, x)["kmer_id"].sum())
    return B / _time_reduced(reduced, eng.arrs, kmers32)


def _bench_scale(B=1 << 24):
    """200M-kmer (human-config k31 m21) rows from the cached scale indexes
    (built by scripts/build_scale_index.py). Regressions at GB scale get a
    driver-visible tripwire (VERDICT r4 weak #5); returns a nested dict for
    the single bench JSON line, or None when no cache is present.

    B sweep at 200M canonical (r5c): div64 B4M/8M/16M = 62.5/59.4/61.3 ns,
    div512 (the singleton-rich auto-default) B8M/16M = 58.8/58.5 — narrow
    pair windows make the larger batch's amortization win."""
    import gc
    import os

    import jax
    import jax.numpy as jnp

    from sshash_tpu import kmer as K
    from sshash_tpu import oracle
    from sshash_tpu.engine import DeviceEngine, StaticCfg, row_width
    from sshash_tpu.index import Index

    # upload-health probe: the scale rows ship ~3.4-3.8 GB tables; on a
    # degraded tunnel (observed r5) the large-transfer path stalls while
    # small transfers flow. 32 MB must clear in 90 s (healthy: ~1-3 s) or
    # the multi-GB upload would take hours — skip rather than hang.
    probe = jnp.asarray(np.zeros(8 << 20, np.uint32))
    t0 = time.perf_counter()
    np.asarray(jax.device_put(probe)[:1])
    probe_s = time.perf_counter() - t0
    del probe
    if probe_s > 90:
        raise TimeoutError(
            f"32 MB upload probe took {probe_s:.0f}s — tunnel too degraded "
            f"for the multi-GB scale tables, skipping scale rows")

    out = {}
    rng = np.random.default_rng(11)
    for mode, name in (("regular", "idx200m"), ("canonical", "idx200m_canon")):
        path = os.path.join(SCALE_DIR, name)
        cache = path + ".arrs"
        if not (os.path.isdir(path) and os.path.isdir(cache)):
            continue
        try:
            idx = Index.load(path)
            host_arrs = {f[:-4]: np.load(os.path.join(cache, f), mmap_mode="r")
                         for f in sorted(os.listdir(cache))
                         if f.endswith(".npy")}
            if host_arrs["cw_row"].shape[1] != row_width(StaticCfg(idx)):
                raise ValueError(f"stale .arrs cache at {cache}")
            eng = DeviceEngine(idx, host_arrs=host_arrs)
            red = jax.jit(lambda a, x: eng._lookup_ids_fn(a, x)["kmer_id"].sum())
            ids = rng.integers(0, idx.num_kmers, B)
            km = oracle.access(idx, ids)
            km[: B // 2] = K.revcomp_kmers(km[: B // 2], idx.k)
            km32 = jax.device_put(jnp.asarray(K.kmers_to_u32(km, idx.k)))
            # correctness gate before timing: all ids must round-trip
            got = np.asarray(eng._lookup_ids(eng.arrs, km32)["kmer_id"])
            assert np.array_equal(got, ids.astype(np.uint32)), \
                f"scale {mode}: id round-trip failed"
            pos_ns = _time_reduced(red, eng.arrs, km32) / B * 1e9
            neg64 = rng.integers(0, 1 << 62, (B, idx.kmer_words64),
                                 dtype=np.uint64)
            neg64 &= np.uint64((1 << min(2 * idx.k, 63)) - 1)
            neg32 = jax.device_put(jnp.asarray(K.kmers_to_u32(neg64, idx.k)))
            neg_ns = _time_reduced(red, eng.arrs, neg32) / B * 1e9
            row = {"num_kmers": int(idx.num_kmers),
                   "positive_ns_per_kmer": round(pos_ns, 1),
                   "negative_ns_per_kmer": round(neg_ns, 1),
                   "positive_vs_ref": round(
                       REF_SCALE_NS[f"{mode}_pos"] / pos_ns, 2),
                   "negative_vs_ref": round(
                       REF_SCALE_NS[f"{mode}_neg"] / neg_ns, 2)}
            if mode == "regular":
                ids32 = jax.device_put(jnp.asarray(
                    rng.integers(0, idx.num_kmers, B).astype(np.uint32)))
                acc = jax.jit(lambda a, i: eng._access(a, i)[:, 0].sum())
                acc_ns = _time_reduced(acc, eng.arrs, ids32) / B * 1e9
                row["access_ns_per_kmer"] = round(acc_ns, 1)
                row["access_vs_ref"] = round(REF_SCALE_NS["access"] / acc_ns, 2)
                del ids32
            out[mode] = row
            del eng, km32, neg32, host_arrs
            gc.collect()
        except Exception as e:  # noqa: BLE001 — scale rows must not lose line 1
            print(f"scale bench ({mode}) failed: {type(e).__name__}: {e}",
                  file=sys.stderr)
    return out or None


def main():
    import jax
    import jax.numpy as jnp

    from sshash_tpu import BuildConfig, Dictionary
    from sshash_tpu import kmer as K
    from sshash_tpu.oracle import access
    from sshash_tpu.streaming import streaming_query_from_file

    rng = np.random.default_rng(0xBE7C)
    # B=8M: +1.6 ns/kmer better dispatch amortization than 4M on the
    # round-4 kernel (48.5 vs 50.1 ns, scripts/exp_r4_lookup.py)
    B = 1 << 23
    rates = {}
    neg_rates = {}
    kmers32_by_mode = {}
    engines = {}
    # m=17 over m=15: +0.4 ref-format bits/kmer buys ~17% fewer candidate
    # probes (more singleton buckets) — the speed-optimal sweep point on
    # this dataset (scripts/exp_r3_lookup*.py)
    for mode in ("regular", "canonical"):
        d = Dictionary.build(INPUT, BuildConfig(k=31, m=17, verbose=False,
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
        # HARD on-chip canary for the k31 linear minimizer-select chain
        # (the tournament tree is gated to nw > 24; this assert is the
        # mandatory pass/fail artifact that a toolchain update cannot
        # silently dodge — see ops/packed.compute_minimizer and the k63
        # miscompile record in BENCH_NOTES.md)
        assert n_found == B, f"{mode}: expected all positive, found {n_found}/{B}"
        rates[mode] = _bench_lookup(eng, kmers32, B)
        kmers32_by_mode[mode] = kmers32

        # negative lookup (perf.hpp:60-76): random kmers through the same
        # compiled kernel, in BOTH modes — canonical is a SINGLE probe (no
        # RC fallback pass), the same shape as the reference's faster
        # canonical-negative row (420 vs 791 ns, BASELINE.md). Secondary
        # axes must not lose the lookup headline: degrade to null.
        try:
            neg64 = rng.integers(0, 1 << 62, (B, index.kmer_words64),
                                 dtype=np.uint64)
            neg64 &= np.uint64((1 << min(2 * index.k, 63)) - 1)
            neg32 = jax.device_put(jnp.asarray(K.kmers_to_u32(neg64, index.k)))
            neg_rates[mode] = _bench_lookup(eng, neg32, B)
            del neg32
        except Exception as e:  # noqa: BLE001 — report partial results
            print(f"negative bench ({mode}) failed: {type(e).__name__}: {e}",
                  file=sys.stderr)

        if mode == "regular":
            access_rate = iterator_rate = None
            try:
                # access (perf.hpp:78-96): random ids -> packed kmers
                ids32 = jax.device_put(jnp.asarray(
                    rng.integers(0, index.num_kmers, B).astype(np.uint32)))
                acc = jax.jit(lambda a, i: eng._access(a, i)[:, 0].sum())
                access_rate = B / _time_reduced(acc, eng.arrs, ids32)
                # full iteration (perf.hpp:10-24): the SEQUENTIAL-DECODE
                # kernel — one linear shift-window pass over strings32, no
                # gathers (engine.make_iterator); at this index size the
                # end-to-end rate is dispatch-bound (~40 ms/call), the
                # kernel itself runs ~0.4 ns/kmer (scripts/exp_r4_iterator)
                it = jax.jit(lambda a: eng._iterator(a)[1])
                iterator_rate = index.num_kmers / _time_reduced(it, eng.arrs)
                del ids32
            except Exception as e:  # noqa: BLE001 — report partial results
                print(f"secondary bench axes failed: {type(e).__name__}: {e}",
                      file=sys.stderr)
        # kmers32 stays referenced in kmers32_by_mode (32 MB HBM/mode) for
        # the late positive re-time below

    # warm device streaming: run once to compile, then time a second pass.
    # chunk = 5M positions -> the whole genome is ONE chunk (one compiled
    # shape; remote compiles cost ~1-3 min each on this setup). A failure in
    # a streaming stage must not lose the lookup headline: degrade to null.
    d = engines["regular"]
    stream_rate = low_rate = None
    try:
        CH = 5 << 20
        rep = streaming_query_from_file(d, GENOME, multiline=True,
                                        use_device=True, chunk=CH)
        assert rep["num_positive_kmers"] == rep["num_kmers"], \
            "genome should self-hit"
        rep = streaming_query_from_file(d, GENOME, multiline=True,
                                        use_device=True, chunk=CH)
        stream_rate = rep["num_kmers"] / (rep["elapsed_millisec"] / 1e3)

        # low-hit streaming: the bundled SRR reads vs salmonella (the README
        # workload: ~46 positives in 460K kmers) amplified 10x by gzip
        # concatenation (same read/hit profile, 4.6M kmers) so the ~40ms
        # dispatch round trips amortize — the un-amplified row was
        # latency-bound at ~2.2M kmers/s (round 3)
        import os

        amp = "/tmp/sshash_bench_srr_x10.fastq.gz"
        if not os.path.exists(amp):
            with open(READS, "rb") as fi, open(amp, "wb") as fo:
                blob = fi.read()
                for _ in range(10):
                    fo.write(blob)
        low = streaming_query_from_file(d, amp, use_device=True)
        low = streaming_query_from_file(d, amp, use_device=True)
        low_rate = low["num_kmers"] / (low["elapsed_millisec"] / 1e3)
    except Exception as e:  # noqa: BLE001 — report partial results
        print(f"streaming bench failed: {type(e).__name__}: {e}",
              file=sys.stderr)

    # low-hit KERNEL-ONLY: re-time the captured compiled steps on their
    # device-resident buffers — separates the run-skip machinery cost from
    # the tunnel's upload/dispatch wall (VERDICT r4 weak #3)
    low_kernel_rate = None
    try:
        from sshash_tpu.streaming import _DeviceStream, parse_reads

        ds = _DeviceStream(d.to_device(), d.index.k, pmax=1 << 22,
                           rmax_shift=4)
        ds._capture = []
        for seq in parse_reads(amp):
            ds.add_read(seq)
        rep_k = ds.finalize()
        total = 0.0
        for fn, jbuf in ds._capture:
            np.asarray(fn(ds.engine.arrs, jbuf)[0])  # warm
            best_s = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                np.asarray(fn(ds.engine.arrs, jbuf)[0])
                best_s = min(best_s, time.perf_counter() - t0)
            total += best_s
        low_kernel_rate = rep_k["num_kmers"] / total
    except Exception as e:  # noqa: BLE001 — report partial results
        print(f"low-hit kernel bench failed: {type(e).__name__}: {e}",
              file=sys.stderr)

    # LATE positive re-time: the tunnel's dispatch/transfer latency varies
    # on ~10-min timescales (observed r5: a sustained degradation halved
    # the positive rate while the SAME compiled kernel timed 2x faster on
    # negatives minutes later). Sample a second, well-separated window per
    # mode and keep the best — best-of is already the timing policy.
    for mode, d2 in engines.items():
        try:
            rates[mode] = max(rates[mode],
                              _bench_lookup(d2.to_device(),
                                            kmers32_by_mode[mode], B))
        except Exception as e:  # noqa: BLE001 — report partial results
            print(f"late re-time ({mode}) failed: {type(e).__name__}: {e}",
                  file=sys.stderr)

    # 200M-kmer human-config scale rows (nested; present when the cached
    # scale indexes exist — scripts/build_scale_index.py). SIGALRM watchdog:
    # a degraded tunnel can HANG the multi-GB table upload indefinitely
    # (observed r5: large-transfer path stalls while small transfers flow)
    # — a hang here must not eat the headline line 1 either.
    scale = None
    import signal

    def _scale_timeout(signum, frame):
        raise TimeoutError("scale-row upload/measure watchdog expired")

    old = signal.signal(signal.SIGALRM, _scale_timeout)
    signal.alarm(int(__import__("os").environ.get("SSHASH_SCALE_WATCHDOG",
                                                  "2400")))
    try:
        scale = _bench_scale()
    except Exception as e:  # noqa: BLE001
        print(f"scale bench failed: {type(e).__name__}: {e}", file=sys.stderr)
    finally:
        signal.alarm(0)
        signal.signal(signal.SIGALRM, old)

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
        "negative_lookups_per_s": round(max(neg_rates.values())) if neg_rates else None,
        "negative_mode": max(neg_rates, key=neg_rates.get) if neg_rates else None,
        "negative_regular_per_s": round(neg_rates["regular"]) if "regular" in neg_rates else None,
        "negative_canonical_per_s": round(neg_rates["canonical"]) if "canonical" in neg_rates else None,
        "access_per_s": round(access_rate) if access_rate else None,
        "iterator_kmers_per_s": round(iterator_rate) if iterator_rate else None,
        "streaming_kmers_per_s": round(stream_rate) if stream_rate else None,
        "streaming_vs_ref_high_hit": round(
            stream_rate / BASELINE_STREAMING_KMERS_PER_S, 2)
        if stream_rate else None,
        "streaming_vs_ref_best": round(
            stream_rate / BASELINE_STREAMING_BEST_KMERS_PER_S, 2)
        if stream_rate else None,
        "streaming_low_hit_kmers_per_s": round(low_rate) if low_rate else None,
        "streaming_low_hit_kernel_kmers_per_s": round(low_kernel_rate)
        if low_kernel_rate else None,
        "k31_linear_chain_canary": "pass",  # the n_found == B asserts above
        "scale_200m": scale,
    }))


if __name__ == "__main__":
    sys.exit(main())
