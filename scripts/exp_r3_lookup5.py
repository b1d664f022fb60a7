"""Sweep the pair-window width divisor (SSHASH_PAIR_DIV) on TPU.

The compacted pair sweep runs ceil(total/PMAX) windows of width
PMAX = B/div; each window's cost is dominated by its PMAX-wide 12-word
mrow gather, while random batches over a mostly-singleton index (m17:
99.7% singleton buckets) put only a few % of B lanes into the pair
buffer. Narrower windows should be pure savings until `total` spills
into a second window. Verifies bit-exactness per divisor, then times the
ids kernel at B=4M (the headline shape). Prints json lines."""

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
    from sshash_tpu.engine import DeviceEngine
    from sshash_tpu.oracle import access

    rng = np.random.default_rng(0x5EED)
    d = Dictionary.build(INPUT, BuildConfig(k=31, m=17, verbose=False,
                                            canonical=True))
    index = d.index

    B = 1 << 22
    ids = rng.integers(0, index.num_kmers, B)
    km = access(index, ids)
    km[: B // 2] = K.revcomp_kmers(km[: B // 2], 31)
    km32 = jax.device_put(jnp.asarray(K.kmers_to_u32(km, 31)))

    ref = None
    for div in (8, 16, 32, 64):
        os.environ["SSHASH_PAIR_DIV"] = str(div)
        eng = DeviceEngine(index)
        fn = jax.jit(lambda a, x, e=eng: e._lookup_ids_fn(a, x)["kmer_id"].sum())
        # exactness first (the sum is a sufficient fingerprint here only if
        # the full vector matches; check the vector on a 64K slice)
        out = np.asarray(eng._lookup_ids(eng.arrs, km32[: 1 << 16])["kmer_id"])
        if ref is None:
            ref = out
        else:
            assert (out == ref).all(), f"div={div} disagrees"
        t = timeit(fn, eng.arrs, km32)
        print(json.dumps({"exp": f"pair_div{div}_B4M_ids",
                          "ns_per_kmer": round(t / B * 1e9, 1),
                          "Mlookups_per_s": round(B / t / 1e6, 2)}), flush=True)
        del eng
    os.environ.pop("SSHASH_PAIR_DIV", None)


if __name__ == "__main__":
    main()
