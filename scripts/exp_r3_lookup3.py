"""Post tie-fold + grouped-prefix-sums + ids-mode lookup timing (json)."""

import json
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

INPUT = "/root/reference/data/unitigs_stitched/salmonella_enterica_k31_ust.fa.gz"


def timeit(fn, *args, reps=4):
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

    rng = np.random.default_rng(0xBE7C)
    # m15 is characterized in earlier sessions; m19 probes whether a higher
    # singleton fraction (smaller pair sweep) buys more than the extra
    # minimizers cost (reference-recipe m for this input is 13; m17 is the
    # current headline at +0.4 ref-format bits/kmer)
    for m in (17, 19):
        d = Dictionary.build(INPUT, BuildConfig(k=31, m=m, canonical=True,
                                                verbose=False))
        index = d.index
        eng = d.to_device()
        ids_fn = jax.jit(lambda a, x: eng._lookup_ids_fn(a, x)["kmer_id"].sum())
        full_fn = jax.jit(lambda a, x: eng._lookup_fn(a, x)["kmer_id"].sum())
        for B in (1 << 22, 1 << 23):
            ids = rng.integers(0, index.num_kmers, B)
            kmers64 = access(index, ids)
            kmers64[: B // 2] = K.revcomp_kmers(kmers64[: B // 2], index.k)
            k32 = jax.device_put(jnp.asarray(K.kmers_to_u32(kmers64, index.k)))
            for name, fn in (("ids", ids_fn), ("full", full_fn)):
                t = timeit(fn, eng.arrs, k32)
                print(json.dumps({
                    "exp": f"canon_m{m}_B{B >> 20}M_{name}",
                    "ns_per_kmer": round(t / B * 1e9, 1),
                    "Mlookups_per_s": round(B / t / 1e6, 2)}), flush=True)
            del k32
        del eng


if __name__ == "__main__":
    main()
