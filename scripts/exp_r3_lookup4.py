"""A/B the canonical tie handling on TPU: 4-try fold (default) vs
cond-gated dense retry (SSHASH_TIE_RETRY=1). Ties (both strand minimizer
values equal) are rare, so the fold's tries 3-4 are usually wasted
full-width verify work; the retry's lax.cond is usually skipped. Also
sweeps B = 4M/8M. Verifies bit-exactness of both variants first.
Prints json lines."""

import json
import os
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
    from sshash_tpu.engine import DeviceEngine, make_lookup
    from sshash_tpu.oracle import access

    rng = np.random.default_rng(0xAB17)
    d = Dictionary.build(INPUT, BuildConfig(k=31, m=17, verbose=False,
                                            canonical=True))
    index = d.index

    # small bit-exactness cross-check of the two variants first
    ids_s = rng.integers(0, index.num_kmers, 1 << 16)
    km_s = access(index, ids_s)
    km_s[::2] = K.revcomp_kmers(km_s[::2], 31)
    km32_s = jnp.asarray(K.kmers_to_u32(km_s, 31))
    outs = {}
    for name, env in (("fold", "0"), ("retry", "1")):
        os.environ["SSHASH_TIE_RETRY"] = env
        eng = DeviceEngine(index)
        outs[name] = np.asarray(eng._lookup(eng.arrs, km32_s)["kmer_id"])
    assert (outs["fold"] == outs["retry"]).all(), "variants disagree!"
    print(json.dumps({"exactness": "ok", "n": len(ids_s)}), flush=True)

    for B in (1 << 22, 1 << 23):
        ids = rng.integers(0, index.num_kmers, B)
        km = access(index, ids)
        km[: B // 2] = K.revcomp_kmers(km[: B // 2], 31)
        km32 = jax.device_put(jnp.asarray(K.kmers_to_u32(km, 31)))
        for name, env in (("fold", "0"), ("retry", "1")):
            os.environ["SSHASH_TIE_RETRY"] = env
            eng = DeviceEngine(index)
            red = jax.jit(lambda a, x, e=eng: e._lookup_ids_fn(a, x)["kmer_id"].sum())
            t = timeit(red, eng.arrs, km32)
            print(json.dumps({
                "exp": f"canon_m17_B{B >> 20}M_{name}",
                "ns_per_kmer": round(t / B * 1e9, 1),
                "Mlookups_per_s": round(B / t / 1e6, 2)}), flush=True)
        del km32


if __name__ == "__main__":
    main()
