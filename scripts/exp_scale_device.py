"""Single-chip SCALE point: load a ~200M-kmer synthetic index (built by the
out-of-core path at the reference's human config k31 m21 — see
scripts/soak_external.py for the generator) and time the id-only batched
lookup on the real chip. Complements the salmonella headline (4.8M kmers)
with evidence the 2-gather-round design holds at human-scale table sizes
(reference human k31 m21 rows: 735-746 ns/kmer, BASELINE.md).

Usage: python scripts/exp_scale_device.py [index_dir]
Prints json lines (load / upload / lookup timings + a correctness count).
"""

import json
import sys
import time

import numpy as np

REPO = __file__.rsplit("/", 2)[0]
sys.path.insert(0, REPO)


def main():
    path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/scale/idx200m"
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
    cache = path.rstrip("/") + ".arrs"
    if os.path.isdir(cache):
        host_arrs = {f[:-4]: np.load(os.path.join(cache, f), mmap_mode="r")
                     for f in sorted(os.listdir(cache)) if f.endswith(".npy")}
    else:
        from sshash_tpu.engine import _device_arrays

        host_arrs = _device_arrays(idx)
        os.makedirs(cache + ".tmp", exist_ok=True)
        for k2, v in host_arrs.items():
            np.save(os.path.join(cache + ".tmp", k2 + ".npy"), v)
        os.rename(cache + ".tmp", cache)
    eng = DeviceEngine(idx, host_arrs=host_arrs)
    dev_bytes = int(sum(np.asarray(a).nbytes for a in eng.arrs.values()))
    print(json.dumps({"stage": "device_arrays",
                      "sec": round(time.perf_counter() - t0, 1),
                      "device_bytes": dev_bytes}), flush=True)

    B = 1 << 22
    rng = np.random.default_rng(7)
    ids = rng.integers(0, idx.num_kmers, B)
    km = oracle.access(idx, ids)
    km[: B // 2] = K.revcomp_kmers(km[: B // 2], idx.k)
    km32 = jax.device_put(jnp.asarray(K.kmers_to_u32(km, idx.k)))

    red = jax.jit(lambda a, x: eng._lookup_ids_fn(a, x)["kmer_id"].sum())
    t0 = time.perf_counter()
    np.asarray(red(eng.arrs, km32))  # compile + upload the index arrays
    print(json.dumps({"stage": "compile+upload",
                      "sec": round(time.perf_counter() - t0, 1)}), flush=True)

    best = float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        np.asarray(red(eng.arrs, km32))
        best = min(best, time.perf_counter() - t0)
    # correctness spot-check on the same batch (ids round-trip)
    out = eng._lookup_ids(eng.arrs, km32)
    ok = int((np.asarray(out["kmer_id"]) == ids.astype(np.uint32)).sum())
    print(json.dumps({"exp": "scale_lookup_m21",
                      "num_kmers": int(idx.num_kmers),
                      "B": B,
                      "ns_per_kmer": round(best / B * 1e9, 1),
                      "lookups_per_s": round(B / best),
                      "ids_ok": ok,
                      "device_bytes": dev_bytes}), flush=True)
    assert ok == B, f"id round-trip failed: {ok}/{B}"


if __name__ == "__main__":
    main()
