"""Round-4: time the sequential-decode iterator kernel on the real chip.

End-to-end (one call, includes ~40ms dispatch) + kernel-only via an
on-device R-rep scan whose input XORs the carry checksum into the packed
words each rep (funnel shifts are XOR-linear, so per-rep cost is identical
while the data differs -> XLA cannot hoist the pass out of the loop).

Usage: python scripts/exp_r4_iterator.py [R]
"""

import json
import sys
import time

import numpy as np

REPO = __file__.rsplit("/", 2)[0]
sys.path.insert(0, REPO)

INPUT = "/root/reference/data/unitigs_stitched/salmonella_enterica_k31_ust.fa.gz"


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    from sshash_tpu import BuildConfig, Dictionary
    from sshash_tpu.engine import U32, make_iterator

    R = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    d = Dictionary.build(INPUT, BuildConfig(k=31, m=17, verbose=False))
    eng = d.to_device()
    n = d.num_kmers()

    it_raw = make_iterator(eng.cfg)
    one = jax.jit(it_raw)

    def reps(arrs):
        s0 = arrs["strings32"]
        v32 = arrs["vstart32"]

        def body(c, _):
            # the CURRENT reduce kernel on carry-XOR'd words (funnel shifts
            # are XOR-linear: identical cost per rep, different data)
            _, chk = it_raw({"strings32": s0 ^ c, "vstart32": v32})
            return chk, None

        chk, _ = lax.scan(body, U32(1), None, length=R)
        return chk

    repsj = jax.jit(reps)

    def best(fn, *a, runs=5):
        np.asarray(jax.tree.leaves(fn(*a))[0])  # compile+warm
        b = float("inf")
        for _ in range(runs):
            t0 = time.perf_counter()
            np.asarray(jax.tree.leaves(fn(*a))[0])
            b = min(b, time.perf_counter() - t0)
        return b

    t1 = best(one, eng.arrs)
    tR = best(repsj, eng.arrs)
    t_kernel = (tR - t1) / (R - 1) if R > 1 else t1
    print(json.dumps({
        "exp": "iterator_seq_decode", "num_kmers": n,
        "end_to_end_sec": round(t1, 4),
        "end_to_end_kmers_per_s": round(n / t1),
        "reps": R, "reps_sec": round(tR, 4),
        "kernel_only_sec": round(t_kernel, 5),
        "kernel_only_kmers_per_s": round(n / max(t_kernel, 1e-9)),
        "kernel_ns_per_kmer": round(t_kernel * 1e9 / n, 3),
    }), flush=True)


if __name__ == "__main__":
    main()
