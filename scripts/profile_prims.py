"""Primitive-cost microbench at P=4M lanes: cumsum, bit-expand, rolls,
relayout, scatters, small-table gathers. Prints json lines."""

import json
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

P = 1 << 22
A = P // 16


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

    rng = np.random.default_rng(0)
    x = jax.device_put(jnp.asarray(rng.integers(0, 2, P, dtype=np.int32)))
    bits = jax.device_put(jnp.asarray(
        rng.integers(0, 1 << 31, P // 32 + 1, dtype=np.uint32)))
    small = jax.device_put(jnp.asarray(
        rng.integers(0, 1 << 30, 1 << 17, dtype=np.uint32)))
    idx = jax.device_put(jnp.asarray(rng.integers(0, 1 << 17, P, dtype=np.int32)))

    cases = []
    cases.append(("cumsum_P", jax.jit(lambda v: jnp.cumsum(v).sum()), (x,)))
    lane = jnp.arange(P, dtype=jnp.int32)

    @jax.jit
    def bit_expand(b):
        return ((((b[lane >> 5]) >> (lane & 31).astype(jnp.uint32)) & 1) != 0).sum()

    cases.append(("bit_expand_P", bit_expand, (bits,)))
    cases.append(("roll_P", jax.jit(lambda v: jnp.roll(v, 1).sum()), (x,)))

    @jax.jit
    def relayout(v):
        return v.reshape(A, 16).T.reshape(-1)[::7].sum()

    cases.append(("reshape_T_P", relayout, (x,)))
    cases.append(("gather_small_P", jax.jit(
        lambda t, i: jnp.take(t, i, mode="clip").sum()), (small, idx)))

    @jax.jit
    def scatter_P(v):
        tgt = jnp.zeros((P,), dtype=jnp.int32)
        return tgt.at[v * 3 % P].add(1, mode="drop").sum()

    cases.append(("scatter_P", scatter_P, (jnp.abs(x) + lane,)))

    @jax.jit
    def popcount_r(b):
        w = b[lane >> 5]
        mask = (jnp.uint32(1) << (lane & 31).astype(jnp.uint32)) - 1
        lo = w & mask

        def pc(v):
            v = v - ((v >> 1) & jnp.uint32(0x55555555))
            v = (v & jnp.uint32(0x33333333)) + ((v >> 2) & jnp.uint32(0x33333333))
            return (((v + (v >> 4)) & jnp.uint32(0x0F0F0F0F)) * jnp.uint32(0x01010101)) >> 24

        wpc = pc(b).astype(jnp.int32)
        base = jnp.cumsum(wpc)  # small cumsum (P/32)
        base = jnp.concatenate([jnp.zeros(1, jnp.int32), base[:-1]])
        return (base[lane >> 5] + pc(lo).astype(jnp.int32)).sum()

    cases.append(("popcount_rank_P", popcount_r, (bits,)))

    for name, fn, args in cases:
        t = timeit(fn, *args)
        print(json.dumps({"case": name, "ms": round(t * 1e3, 1),
                          "ns_per_lane": round(t / P * 1e9, 2)}), flush=True)


if __name__ == "__main__":
    main()
