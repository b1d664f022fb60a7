"""Round-4: k63 TPU lookup rows + the lookup+weight axis (VERDICT #6).

k63 (se.ust.k63, two-u64 kmers, W=4 device words) times the id-only kernel
in both index modes at the reference's human m=25 config — the wide-kmer
tie path takes the cond-gated retry branch (engine.make_lookup), untimed
until now. The weighted row times weight(lookup(x)) fused on device
(reference perf_test_lookup_weight, tools/perf.hpp:110-155).

Usage: python scripts/exp_r4_k63_weight.py
"""

import json
import sys
import time

import numpy as np

REPO = __file__.rsplit("/", 2)[0]
sys.path.insert(0, REPO)

K63 = "/root/reference/data/unitigs_stitched/se.ust.k63.fa.gz"
WEIGHTED = ("/root/reference/data/unitigs_stitched/with_weights/"
            "salmonella_enterica.ust.k31.fa.gz")


def _bench(fn, *args, runs=5):
    np.asarray(fn(*args))
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
    from sshash_tpu.oracle import access

    B = 1 << 22
    rng = np.random.default_rng(0x63)

    for mode in ("regular", "canonical"):
        d = Dictionary.build(K63, BuildConfig(
            k=63, m=25, canonical=(mode == "canonical"), verbose=False))
        index = d.index
        eng = d.to_device()
        ids = rng.integers(0, index.num_kmers, B)
        km = access(index, ids)
        km[: B // 2] = K.revcomp_kmers(km[: B // 2], index.k)
        km32 = jax.device_put(jnp.asarray(K.kmers_to_u32(km, index.k)))
        red = jax.jit(lambda a, x: eng._lookup_ids_fn(a, x)["kmer_id"].sum())
        out = eng._lookup_ids(eng.arrs, km32)
        got = np.asarray(out["kmer_id"])
        fnd = np.asarray(out["found"])
        # regular mode: an RC'd query whose reverse complement is ITSELF a
        # distinct index kmer returns that kmer's id (the forward probe hits
        # first, src/dictionary.cpp:64-70) — so exact-id equality holds only
        # on the non-RC'd half; the RC'd half asserts membership
        assert fnd.all(), f"k63 {mode}: {int((~fnd).sum())} misses"
        exact = int((got[B // 2:] == ids[B // 2:].astype(np.uint32)).sum())
        assert exact == B - B // 2, f"k63 {mode}: ids mismatch {exact}"
        t = _bench(red, eng.arrs, km32)
        print(json.dumps({
            "exp": "r4_k63_lookup", "mode": mode, "m": 25,
            "num_kmers": int(index.num_kmers),
            "ns_per_kmer": round(t * 1e9 / B, 2),
            "lookups_per_s": round(B / t),
            "ref_ns": {"regular": 823, "canonical": 699}[mode],
            "speedup": round((B / t) / (1e9 / {"regular": 823,
                                               "canonical": 699}[mode]), 2),
        }), flush=True)
        del eng, km32

    # weight(lookup(x)) on the bundled weighted salmonella
    d = Dictionary.build(WEIGHTED, BuildConfig(k=31, m=17, weighted=True,
                                               verbose=False))
    index = d.index
    eng = d.to_device()
    ids = rng.integers(0, index.num_kmers, B)
    km = access(index, ids)
    km[: B // 2] = K.revcomp_kmers(km[: B // 2], index.k)
    km32 = jax.device_put(jnp.asarray(K.kmers_to_u32(km, index.k)))
    lw = jax.jit(lambda a, x: eng._weight(
        a, eng._lookup_ids_fn(a, x)["kmer_id"]).sum())
    # correctness: device weights equal the oracle's on this batch
    wdev = np.asarray(jax.jit(lambda a, x: eng._weight(
        a, eng._lookup_ids_fn(a, x)["kmer_id"]))(eng.arrs, km32))
    want = d.weight(ids)
    assert (wdev.astype(np.uint64) == want).all(), "weight mismatch"
    t = _bench(lw, eng.arrs, km32)
    print(json.dumps({
        "exp": "r4_lookup_weight", "num_kmers": int(index.num_kmers),
        "ns_per_kmer": round(t * 1e9 / B, 2),
        "lookups_per_s": round(B / t),
    }), flush=True)


if __name__ == "__main__":
    main()
