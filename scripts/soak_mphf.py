"""100M-key partitioned MPHF soak (round-1 verdict bar: '100M-key synthetic
build succeeds in bounded time; device eval parity'). Prints json lines."""

import json
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def main():
    n = 100_000_000
    rng = np.random.default_rng(99)
    t0 = time.perf_counter()
    keys = rng.integers(0, 1 << 63, int(n * 1.01), dtype=np.uint64)
    keys = np.unique(keys)[:n]
    assert len(keys) == n
    print(json.dumps({"gen_sec": round(time.perf_counter() - t0, 1)}), flush=True)

    from sshash_tpu.mphf import PartitionedMPHF

    t0 = time.perf_counter()
    f = PartitionedMPHF.build_u64(keys, seed=1)
    build_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    sample = rng.choice(n, 2_000_000, replace=False)
    pos = f(keys[sample])
    eval_s = time.perf_counter() - t0
    ok_range = bool((pos >= 0).all() and (pos < n).all())
    distinct = len(np.unique(pos))
    print(json.dumps({
        "n_keys": n, "partitions": f.num_partitions,
        "build_sec": round(build_s, 1),
        "ns_per_key": round(build_s * 1e9 / n, 1),
        "bits_per_key": round(f.num_bits() / n, 2),
        "eval_sec_2M": round(eval_s, 2),
        "sampled_positions_distinct": distinct == len(sample),
        "in_range": ok_range,
    }), flush=True)
    assert ok_range and distinct == len(sample)


if __name__ == "__main__":
    main()
