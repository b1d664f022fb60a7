"""Microbench: cost of the fused-row gather + in-register extraction, and
whether an explicit transpose of the (B, W) row matrix helps (layout puts
the row dim on the 128-lane axis otherwise). Prints json lines."""

import json
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

B = 1 << 22
N = 500_000
WR = 10


def timeit(fn, *args, reps=3):
    np.asarray(fn(*args)).ravel()[:1]
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

    rng = np.random.default_rng(1)
    tab = jax.device_put(jnp.asarray(
        rng.integers(0, 1 << 31, (N, WR), dtype=np.int32).view(np.int32)))
    idx = jax.device_put(jnp.asarray(rng.integers(0, N, B, dtype=np.int32)))
    bpos = jax.device_put(jnp.asarray(
        (2 * rng.integers(0, 32, B, dtype=np.int32)).astype(np.uint32)))
    U32 = jnp.uint32

    def extract_cols(row, bitpos):
        # verify-like: 2-word funnel shift from cols 4..7, 2 variants
        w0 = (bitpos >> U32(5)).astype(U32)
        b = (bitpos & U32(31)).astype(U32)
        up = (U32(32) - b) & U32(31)
        nz = b != 0

        def word(i):
            return row[:, 4 + i].astype(U32)

        outs = []
        for v in range(2):
            cols = [(word(v + j) >> b) | jnp.where(nz, word(v + j + 1) << up, U32(0))
                    for j in range(2)]
            outs.append(cols)
        pick = w0 == 1
        c0 = jnp.where(pick, outs[1][0], outs[0][0])
        c1 = jnp.where(pick, outs[1][1], outs[0][1])
        return c0, c1

    @jax.jit
    def g_sum(t, i):
        return jnp.take(t, i, axis=0, mode="clip").sum()

    @jax.jit
    def g_extract(t, i, bp):
        row = jnp.take(t, i, axis=0, mode="clip")
        c0, c1 = extract_cols(row, bp)
        return c0.sum() + c1.sum() + row[:, 0].sum()

    @jax.jit
    def g_extract_T(t, i, bp):
        row = jnp.take(t, i, axis=0, mode="clip").T  # (WR, B) relayout once
        row = row.T  # logical view back; ops below slice columns of the T'd buffer

        # identical math but on the transposed layout
        c0, c1 = extract_cols(row, bp)
        return c0.sum() + c1.sum() + row[:, 0].sum()

    @jax.jit
    def g_extract_cols_sep(t, i, bp):
        rowT = jnp.take(t, i, axis=0, mode="clip").T  # (WR, B)
        w0 = (bp >> U32(5)).astype(U32)
        b = (bp & U32(31)).astype(U32)
        up = (U32(32) - b) & U32(31)
        nz = b != 0

        def word(j):
            return rowT[4 + j].astype(U32)

        outs = []
        for v in range(2):
            outs.append([(word(v + j) >> b) | jnp.where(nz, word(v + j + 1) << up, U32(0))
                         for j in range(2)])
        pick = w0 == 1
        c0 = jnp.where(pick, outs[1][0], outs[0][0])
        c1 = jnp.where(pick, outs[1][1], outs[0][1])
        return c0.sum() + c1.sum() + rowT[0].sum()

    for name, fn, args in [
        ("gather_sum", g_sum, (tab, idx)),
        ("gather_extract", g_extract, (tab, idx, bpos)),
        ("gather_extract_after_T", g_extract_cols_sep, (tab, idx, bpos)),
    ]:
        t = timeit(fn, *args)
        print(json.dumps({"case": name, "ns_per_lane": round(t / B * 1e9, 1)}),
              flush=True)


if __name__ == "__main__":
    main()
