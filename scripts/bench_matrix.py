"""Cross-mode TPU benchmark matrix: k31/k63 x regular/canonical x
positive-forward / positive-50%RC / negative, at 4M-lane batches.

Timing fetches a scalar per iteration (block_until_ready does not truly
block over tunneled backends) and asserts result correctness before timing.

Usage: python scripts/bench_matrix.py [k31|k31c|k63] (default: all)
"""

import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np

DATA = "/root/reference/data/unitigs_stitched"
B = 1 << 22


def bench_cfg(name, path, k, m, canonical, rng):
    import jax
    import jax.numpy as jnp

    from sshash_tpu import BuildConfig, Dictionary
    from sshash_tpu import kmer as K
    from sshash_tpu.engine import StaticCfg, _device_arrays, make_lookup
    from sshash_tpu.oracle import access

    d = Dictionary.build(path, BuildConfig(k=k, m=m, canonical=canonical, verbose=False))
    idx = d.index
    cfg = StaticCfg(idx)
    arrs = {k2: jax.device_put(jnp.asarray(v)) for k2, v in _device_arrays(idx).items()}
    full = jax.jit(lambda a, x: make_lookup(cfg)(a, x))

    ids = rng.integers(0, idx.num_kmers, B)
    km = access(idx, ids)
    half = B // 2
    km_rc = km.copy()
    km_rc[:half] = K.revcomp_kmers(km_rc[:half], k)
    W = idx.kmer_words64
    neg = rng.integers(0, 1 << 62, (B, W), dtype=np.uint64)
    rem = 2 * k - 64 * (W - 1)
    neg[:, -1] &= np.uint64((1 << rem) - 1) if rem < 64 else np.uint64(2**64 - 1)

    def t(batch64, label, expect=None):
        x = jax.device_put(jnp.asarray(K.kmers_to_u32(batch64, k)))
        r = full(arrs, x)
        if expect is not None:
            got = np.asarray(r["kmer_id"])
            assert np.asarray(r["found"]).all() and (got == expect).all(), label
        else:
            np.asarray(r["kmer_id"][:1])
        t0 = time.perf_counter()
        np.asarray(full(arrs, x)["kmer_id"][:1])
        dt = time.perf_counter() - t0
        print(f"{name} {label}: {dt*1e9/B:.0f} ns/kmer ({B/dt/1e6:.1f}M/s)", flush=True)

    t(km, "positive fwd", ids)
    t(km_rc, "positive 50%RC", ids)
    t(neg, "negative")


def main():
    rng = np.random.default_rng(7)
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    se31 = f"{DATA}/salmonella_enterica_k31_ust.fa.gz"
    if which in ("k31", "all"):
        bench_cfg("k31 regular m15", se31, 31, 15, False, rng)
    if which in ("k31c", "all"):
        bench_cfg("k31 canonical m15", se31, 31, 15, True, rng)
    if which in ("k63", "all"):
        bench_cfg("k63 regular m25", f"{DATA}/se.ust.k63.fa.gz", 63, 25, False, rng)


if __name__ == "__main__":
    main()
