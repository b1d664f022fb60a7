"""Single-chip SCALE point: load a ~200M-kmer synthetic index (built by the
out-of-core path at the reference's human config k31 m21 — see
scripts/soak_external.py for the generator) and time the id-only batched
lookup on the real chip. Complements the salmonella headline (4.8M kmers)
with evidence the 2-gather-round design holds at human-scale table sizes
(reference human k31 m21 rows: 735-746 ns/kmer, BASELINE.md).

Usage: python scripts/exp_scale_device.py [index_dir] [axes]
  axes: comma list of lookup,access,iterator,streaming (default: all) —
  e.g. the canonical-index run passes "lookup" since access/iterator/
  streaming are orientation-independent and already measured on the
  regular index.
Prints json lines (load / upload / lookup timings + a correctness count).
"""

import json
import sys
import time

import numpy as np

REPO = __file__.rsplit("/", 2)[0]
sys.path.insert(0, REPO)


class _Skip(Exception):
    """Axis disabled by the axes argument (never reported as an error)."""


def main():
    path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/scale/idx200m"
    axes = set((sys.argv[2] if len(sys.argv) > 2
                else "lookup,access,iterator,streaming").split(","))
    known_axes = {"lookup", "access", "iterator", "streaming"}
    unknown = axes - known_axes
    if unknown:
        sys.exit(f"unknown axes {sorted(unknown)}; known: {sorted(known_axes)}")
    import jax
    import jax.numpy as jnp

    from sshash_tpu import kmer as K
    from sshash_tpu import oracle
    from sshash_tpu.engine import DeviceEngine
    from sshash_tpu.index import Index

    t0 = time.perf_counter()
    idx = Index.load(path)
    print(json.dumps({"stage": "load", "sec": round(time.perf_counter() - t0, 1),
                      "num_kmers": int(idx.num_kmers),
                      "num_minimizers": int(idx.stats.get("num_minimizers", 0))}),
          flush=True)

    # the slot expansion is a multi-pass host job (~16 min at 33M slots on
    # the throttled dev host): cache it to disk so a tunnel-window retry
    # pays only the upload
    import os

    t0 = time.perf_counter()
    # SSHASH_ARRS_DIR points at an alternate cached pytree (row-format A/B:
    # v2 / no-c1 variants built by scripts/cache_device_arrays.py under the
    # matching SSHASH_ROW_V2 / SSHASH_NO_C1 env)
    cache = os.environ.get("SSHASH_ARRS_DIR") or path.rstrip("/") + ".arrs"
    host_arrs = None
    if os.path.isdir(cache):
        host_arrs = {f[:-4]: np.load(os.path.join(cache, f), mmap_mode="r")
                     for f in sorted(os.listdir(cache)) if f.endswith(".npy")}
        from sshash_tpu.engine import StaticCfg, row_width

        meta_p = os.path.join(cache, "meta.json")
        if os.path.exists(meta_p):
            with open(meta_p) as f:
                meta = json.load(f)
            assert meta["canonical"] == bool(idx.canonical) \
                and meta["k"] == idx.k and meta["m"] == idx.m, \
                f"cache {cache} was built for {meta}, index is " \
                f"k={idx.k} m={idx.m} canonical={idx.canonical}"
        cfg = StaticCfg(idx)
        want_w = row_width(cfg)
        if host_arrs["cw_row"].shape[1] != want_w:
            print(json.dumps({"stage": "cache_stale",
                              "have_cols": int(host_arrs["cw_row"].shape[1]),
                              "want_cols": want_w}), flush=True)
            host_arrs = None
            import shutil

            shutil.rmtree(cache)
    if host_arrs is None:
        from sshash_tpu.engine import _device_arrays

        host_arrs = _device_arrays(idx)
        import shutil

        shutil.rmtree(cache + ".tmp", ignore_errors=True)
        os.makedirs(cache + ".tmp")
        for k2, v in host_arrs.items():
            np.save(os.path.join(cache + ".tmp", k2 + ".npy"), v)
        os.rename(cache + ".tmp", cache)
    eng = DeviceEngine(idx, host_arrs=host_arrs)
    dev_bytes = int(sum(np.asarray(a).nbytes for a in eng.arrs.values()))
    print(json.dumps({"stage": "device_arrays",
                      "sec": round(time.perf_counter() - t0, 1),
                      "device_bytes": dev_bytes}), flush=True)

    B = int(os.environ.get("SSHASH_SCALE_B", 1 << 22))
    rng = np.random.default_rng(7)
    if "lookup" not in axes:
        print(json.dumps({"exp": "scale_lookup_m21", "skipped": True}),
              flush=True)
        print(json.dumps({"exp": "scale_negative_lookup", "skipped": True}),
              flush=True)
    else:
        ids = rng.integers(0, idx.num_kmers, B)
        km = oracle.access(idx, ids)
        km[: B // 2] = K.revcomp_kmers(km[: B // 2], idx.k)
        km32 = jax.device_put(jnp.asarray(K.kmers_to_u32(km, idx.k)))

        red = jax.jit(lambda a, x: eng._lookup_ids_fn(a, x)["kmer_id"].sum())
        t0 = time.perf_counter()
        np.asarray(red(eng.arrs, km32))  # compile + upload the index arrays
        print(json.dumps({"stage": "compile+upload",
                          "sec": round(time.perf_counter() - t0, 1)}),
              flush=True)

        best = float("inf")
        for _ in range(5):
            t0 = time.perf_counter()
            np.asarray(red(eng.arrs, km32))
            best = min(best, time.perf_counter() - t0)
        # correctness spot-check on the same batch (ids round-trip)
        out = eng._lookup_ids(eng.arrs, km32)
        ok = int((np.asarray(out["kmer_id"]) == ids.astype(np.uint32)).sum())
        print(json.dumps({"exp": "scale_lookup_m21",
                          "mode": "canonical" if idx.canonical else "regular",
                          "num_kmers": int(idx.num_kmers),
                          "B": B,
                          "ns_per_kmer": round(best / B * 1e9, 1),
                          "lookups_per_s": round(B / best),
                          "ids_ok": ok,
                          "device_bytes": dev_bytes}), flush=True)
        assert ok == B, f"id round-trip failed: {ok}/{B}"

        # negative lookup at scale (random kmers, same compiled kernel)
        try:
            neg64 = rng.integers(0, 1 << 62, (B, idx.kmer_words64),
                                 dtype=np.uint64)
            neg64 &= np.uint64((1 << min(2 * idx.k, 63)) - 1)
            neg32 = jax.device_put(jnp.asarray(K.kmers_to_u32(neg64, idx.k)))
            np.asarray(red(eng.arrs, neg32))
            best_n = float("inf")
            for _ in range(5):
                t0 = time.perf_counter()
                np.asarray(red(eng.arrs, neg32))
                best_n = min(best_n, time.perf_counter() - t0)
            print(json.dumps({"exp": "scale_negative_lookup",
                              "ns_per_kmer": round(best_n / B * 1e9, 1),
                              "lookups_per_s": round(B / best_n)}), flush=True)
            del neg32
        except Exception as e:  # noqa: BLE001
            print(json.dumps({"exp": "scale_negative_lookup",
                              "error": repr(e)}), flush=True)

    # access at scale (the fused-row kernel; also exercises the acc_rows
    # synthesis path for pre-acc_rows .arrs caches)
    if "access" not in axes:
        print(json.dumps({"exp": "scale_access", "skipped": True}), flush=True)
    try:
        if "access" not in axes:
            raise _Skip
        ids_a = rng.integers(0, idx.num_kmers, B)
        ids32 = jax.device_put(jnp.asarray(ids_a.astype(np.uint32)))
        got = np.asarray(eng._access(eng.arrs, ids32[:4096]))
        want = K.kmers_to_u32(oracle.access(idx, ids_a[:4096]), idx.k)
        assert np.array_equal(got, want), "access mismatch vs oracle at scale"
        acc = jax.jit(lambda a, i: eng._access(a, i)[:, 0].sum())
        np.asarray(acc(eng.arrs, ids32))
        best_a = float("inf")
        for _ in range(5):
            t0 = time.perf_counter()
            np.asarray(acc(eng.arrs, ids32))
            best_a = min(best_a, time.perf_counter() - t0)
        print(json.dumps({"exp": "scale_access",
                          "ns_per_kmer": round(best_a / B * 1e9, 1),
                          "access_per_s": round(B / best_a)}), flush=True)
        del ids32
    except _Skip:
        pass
    except Exception as e:  # noqa: BLE001
        print(json.dumps({"exp": "scale_access", "error": repr(e)}), flush=True)

    # sequential-decode full iteration at scale: one linear pass over all
    # ~200M kmers per call — the per-call ~40ms dispatch is amortized here,
    # unlike the 4.8M-kmer salmonella bench (reference iterator axis:
    # 2.5 ns/kmer single thread, tools/perf.hpp:10-24)
    if "iterator" not in axes:
        print(json.dumps({"exp": "scale_iterator", "skipped": True}),
              flush=True)
    try:
        if "iterator" not in axes:
            raise _Skip
        from sshash_tpu.engine import make_iterator

        it = jax.jit(make_iterator(eng.cfg))
        t0 = time.perf_counter()
        cnt, chk = jax.tree.map(np.asarray, it(eng.arrs))
        print(json.dumps({"stage": "iterator_compile",
                          "sec": round(time.perf_counter() - t0, 1)}), flush=True)
        best_it = float("inf")
        for _ in range(5):
            t0 = time.perf_counter()
            np.asarray(it(eng.arrs)[1])
            best_it = min(best_it, time.perf_counter() - t0)
        print(json.dumps({"exp": "scale_iterator",
                          "num_kmers": int(cnt),
                          "count_ok": int(cnt) == int(idx.num_kmers),
                          "sec": round(best_it, 3),
                          "ns_per_kmer": round(best_it * 1e9 / int(cnt), 3),
                          "kmers_per_s": round(int(cnt) / best_it)}), flush=True)
    except _Skip:
        pass
    except Exception as e:  # noqa: BLE001
        print(json.dumps({"exp": "scale_iterator", "error": repr(e)}), flush=True)

    # one warm streaming pass (high-hit: the source FASTA self-hits) over
    # the first reads of the scale collection
    if "streaming" not in axes:
        print(json.dumps({"exp": "scale_streaming_high_hit", "skipped": True}),
              flush=True)
        print(json.dumps({"exp": "scale_streaming_kernel_only",
                          "skipped": True}), flush=True)
    try:
        if "streaming" not in axes:
            raise _Skip
        from sshash_tpu.streaming import streaming_query_from_file

        src = None
        base = os.path.dirname(path) or "."
        for f in sorted(os.listdir(base)):
            if f.startswith("scale") and f.endswith(".fa"):
                src = os.path.join(base, f)
                break
        if src is None:
            raise FileNotFoundError("scale FASTA not found next to the index")
        # limit to ~10M chars: copy the first 100 records
        part = os.path.join(base, "stream_part.fa")
        if not os.path.exists(part):
            with open(src) as fin, open(part, "w") as fout:
                for i, line in enumerate(fin):
                    if i >= 200:
                        break
                    fout.write(line)

        class _D:  # minimal Dictionary-like shim for streaming_query_from_file
            index = idx

            def to_device(self):
                return eng

        CH = 5 << 20
        rep = streaming_query_from_file(_D(), part, use_device=True, chunk=CH)
        rep = streaming_query_from_file(_D(), part, use_device=True, chunk=CH)
        print(json.dumps({"exp": "scale_streaming_high_hit",
                          "num_kmers": int(rep["num_kmers"]),
                          "positive": int(rep["num_positive_kmers"]),
                          "kmers_per_s": round(rep["num_kmers"] /
                                               (rep["elapsed_millisec"] / 1e3))}),
              flush=True)
    except _Skip:
        pass
    except Exception as e:  # noqa: BLE001
        print(json.dumps({"exp": "scale_streaming_high_hit", "error": repr(e)}),
              flush=True)

    # kernel-only streaming: re-time the captured compiled steps on their
    # device-resident buffers (no host parse, no upload) — the capability
    # number once inputs are co-located (the ~28 MB/s tunnel upload is the
    # end-to-end wall on this setup; real deployments feed from HBM/ICI)
    try:
        if "streaming" not in axes:
            raise _Skip
        from sshash_tpu.streaming import _DeviceStream, parse_reads

        ds = _DeviceStream(eng, idx.k, pmax=5 << 20, rmax_shift=12)
        ds._capture = []
        for seq in parse_reads(part, multiline=True):
            ds.add_read(seq)
        rep_k = ds.finalize()
        total = 0.0
        for fn, jbuf in ds._capture:
            np.asarray(fn(eng.arrs, jbuf)[0])  # warm (already compiled)
            best_s = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                np.asarray(fn(eng.arrs, jbuf)[0])
                best_s = min(best_s, time.perf_counter() - t0)
            total += best_s
        nk = int(rep_k["num_kmers"])
        print(json.dumps({"exp": "scale_streaming_kernel_only",
                          "num_kmers": nk, "chunks": len(ds._capture),
                          "sec": round(total, 3),
                          "ns_per_kmer": round(total * 1e9 / nk, 2),
                          "kmers_per_s": round(nk / total)}), flush=True)
    except _Skip:
        pass
    except Exception as e:  # noqa: BLE001
        print(json.dumps({"exp": "scale_streaming_kernel_only",
                          "error": repr(e)}), flush=True)


if __name__ == "__main__":
    main()
