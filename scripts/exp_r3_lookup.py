"""Round-3 lookup design experiments on the real TPU.

1. Fused-row gather width sweep (is widening cw_row 8 -> 12 words free?)
2. B-wide scatter-max cost (the pair sweep would scatter 3 more fields)
3. m sweep m15/m17/m19 of the full canonical lookup (bucket-size
   distribution vs probe work) + batch-size 4M vs 8M.

Prints json lines. Timing per CLAUDE.md: fetch a scalar per rep.
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

INPUT = "/root/reference/data/unitigs_stitched/salmonella_enterica_k31_ust.fa.gz"
B = 1 << 22


def timeit(fn, *args, reps=3):
    float(np.asarray(fn(*args)).ravel()[0])
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        float(np.asarray(out).ravel()[0])
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    import jax
    import jax.numpy as jnp

    from sshash_tpu import BuildConfig, Dictionary
    from sshash_tpu import kmer as K
    from sshash_tpu.oracle import access

    print(json.dumps({"devices": [str(d) for d in jax.devices()]}), flush=True)
    rng = np.random.default_rng(0xBE7C)

    # ---- 1. row-width sweep over a 1M-row table
    N = 1 << 20
    idx = jax.device_put(jnp.asarray(rng.integers(0, N, B, dtype=np.int32)))
    for w in (4, 5, 8, 12, 16):
        tbl = jax.device_put(jnp.asarray(
            rng.integers(0, 1 << 30, (N, w), dtype=np.uint32)))
        t = timeit(jax.jit(lambda T, i: jnp.take(T, i, axis=0, mode="clip").sum()),
                   tbl, idx)
        print(json.dumps({"exp": f"row_gather_w{w}",
                          "ns_per_lane": round(t / B * 1e9, 1)}), flush=True)
        del tbl

    # ---- 2. scatter-max cost at B lanes (pair-sweep window PMAX = B//8)
    PM = B // 8
    lanes = jax.device_put(jnp.asarray(rng.integers(0, B, PM, dtype=np.int32)))
    vals = jax.device_put(jnp.asarray(
        rng.integers(0, 1 << 30, PM, dtype=np.uint32)))

    def scat(n):
        @jax.jit
        def fn(l, v):
            acc = jnp.uint32(0)
            for j in range(n):
                tgt = jnp.zeros((B,), dtype=jnp.uint32).at[l].max(
                    v + jnp.uint32(j), mode="drop")
                acc = acc + tgt.sum()
            return acc
        return fn

    for n in (1, 2, 5):
        t = timeit(scat(n), lanes, vals)
        print(json.dumps({"exp": f"scatter_max_x{n}_PMwide",
                          "ns_per_lane_of_B": round(t / B * 1e9, 1)}), flush=True)

    # ---- 3. m sweep, canonical full lookup
    for m in (15, 17, 19):
        d = Dictionary.build(INPUT, BuildConfig(k=31, m=m, canonical=True,
                                                verbose=False))
        index = d.index
        eng = d.to_device()
        ids = rng.integers(0, index.num_kmers, B)
        kmers64 = access(index, ids)
        kmers64[: B // 2] = K.revcomp_kmers(kmers64[: B // 2], index.k)
        kmers32 = jax.device_put(jnp.asarray(K.kmers_to_u32(kmers64, index.k)))
        fn = jax.jit(lambda a, x: eng._lookup_fn(a, x)["kmer_id"].sum())
        t = timeit(fn, eng.arrs, kmers32)
        st = index.stats
        print(json.dumps({
            "exp": f"canonical_m{m}_B4M",
            "ns_per_kmer": round(t / B * 1e9, 1),
            "num_minimizers": int(index.num_minimizers),
            "ref_bits_per_kmer": round(index.num_bits() / index.num_kmers, 2),
            "num_heavy": int(len(index.heavy_load_buckets)),
            "num_mid": int(len(index.mid_load_buckets)),
        }), flush=True)
        if m == 17:
            B8 = 1 << 23
            ids = rng.integers(0, index.num_kmers, B8)
            kmers64 = access(index, ids)
            kmers64[: B8 // 2] = K.revcomp_kmers(kmers64[: B8 // 2], index.k)
            k32 = jax.device_put(jnp.asarray(K.kmers_to_u32(kmers64, index.k)))
            t = timeit(fn, eng.arrs, k32)
            print(json.dumps({"exp": "canonical_m17_B8M",
                              "ns_per_kmer": round(t / B8 * 1e9, 1)}), flush=True)
            del k32
        del kmers32, eng


if __name__ == "__main__":
    main()
