"""Round-4 regular-mode sweep: RC-fallback window width (SSHASH_FB_DIV).

The regular-index 50%-RC positive workload pays the RC fallback for half
the batch: compaction prep (B-wide) + ceil(miss/Wf) windows of full probe
at Wf = B/FB_DIV width. Sweeps FB_DIV on the real chip; also times the
negative workload (mostly-miss -> the dense full_width branch, unaffected
by Wf) as a control.

Usage: python scripts/exp_r4_fbdiv.py [div ...]   (default: 1 2 4 8)
"""

import json
import os
import sys
import time

import numpy as np

REPO = __file__.rsplit("/", 2)[0]
sys.path.insert(0, REPO)

INPUT = "/root/reference/data/unitigs_stitched/salmonella_enterica_k31_ust.fa.gz"


def timed(fn, *args, runs=5):
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
    from sshash_tpu.engine import DeviceEngine
    from sshash_tpu.oracle import access

    divs = [int(x) for x in sys.argv[1:]] or [1, 2, 4, 8]
    B = 1 << 23
    d = Dictionary.build(INPUT, BuildConfig(k=31, m=17, verbose=False))
    index = d.index
    rng = np.random.default_rng(0xFBD)
    ids = rng.integers(0, index.num_kmers, B)
    kmers64 = access(index, ids)
    kmers64[: B // 2] = K.revcomp_kmers(kmers64[: B // 2], index.k)
    km32 = jax.device_put(jnp.asarray(K.kmers_to_u32(kmers64, index.k)))

    for div in divs:
        os.environ["SSHASH_FB_DIV"] = str(div)
        eng = DeviceEngine(index)  # fresh trace: env read at trace time
        red = jax.jit(lambda a, x, e=eng: e._lookup_ids_fn(a, x)["kmer_id"].sum())
        out = eng._lookup_ids(eng.arrs, km32)
        ok = int((np.asarray(out["kmer_id"]) == ids.astype(np.uint32)).sum())
        assert ok == B, f"div={div}: ids mismatch {ok}/{B}"
        t = timed(red, eng.arrs, km32)
        print(json.dumps({"fb_div": div,
                          "positive_regular_ns": round(t * 1e9 / B, 1),
                          "per_s": round(B / t)}), flush=True)


if __name__ == "__main__":
    sys.exit(main())
