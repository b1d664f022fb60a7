"""Kernel-only vs transfer cost of the real streaming step at P=2^22:
times the compiled step on device-resident inputs (no re-upload), the
upload alone, and the full pipeline. Prints json lines."""

import json
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

INPUT = "/root/reference/data/unitigs_stitched/salmonella_enterica_k31_ust.fa.gz"
GENOME = "/root/reference/data/queries/salmonella_enterica.fasta.gz"
P_ = 1 << 22


def main():
    import jax
    import jax.numpy as jnp

    from sshash_tpu import BuildConfig, Dictionary
    from sshash_tpu import native
    from sshash_tpu.streaming import _DeviceStream, parse_reads

    d = Dictionary.build(INPUT, BuildConfig(k=31, m=15, verbose=False))
    eng = d.to_device()
    k = 31
    ds = _DeviceStream(eng, k, pmax=P_)
    R_ = ds.R

    reads = list(parse_reads(GENOME, multiline=True))
    seq = bytes(reads[0][: P_ + k - 1])
    lens = np.array([len(seq)], dtype=np.int64)
    cstarts = np.array([0], dtype=np.int64)
    words32 = np.zeros(ds.CW, dtype=np.uint32)
    valid_bits = np.zeros(P_ // 32 + 1, dtype=np.uint32)
    native.encode_stream(seq, cstarts, lens, k, words32, valid_bits)
    rnpos = np.zeros(R_, dtype=np.uint32)
    rnpos[0] = P_
    rfirst = np.zeros(R_ // 32 + 1, dtype=np.uint32)
    rfirst[0] = 1

    host_args = (words32, rnpos, rfirst, valid_bits)
    dev_args = tuple(jax.device_put(jnp.asarray(a)) for a in host_args)

    def run(args):
        out = ds._step(eng.arrs, *args, jnp.uint32(P_), jnp.uint32(1))
        return int(np.asarray(out)[0][1])  # n_pos scalar fetch

    n_pos = run(dev_args)  # compile
    print(json.dumps({"compiled": True, "n_pos": n_pos}), flush=True)

    for name, args in [("kernel_only_device_resident", dev_args)]:
        best = float("inf")
        for _ in range(4):
            t0 = time.perf_counter()
            run(args)
            best = min(best, time.perf_counter() - t0)
        print(json.dumps({"case": name, "ms": round(best * 1e3, 1),
                          "ns_per_pos": round(best / P_ * 1e9, 1)}), flush=True)

    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        da = tuple(jax.device_put(jnp.asarray(a)) for a in host_args)
        float(np.asarray(da[0][:1])[0])
        best = min(best, time.perf_counter() - t0)
    print(json.dumps({"case": "upload_only", "ms": round(best * 1e3, 1),
                      "bytes": sum(a.nbytes for a in host_args)}), flush=True)

    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        da = tuple(jax.device_put(jnp.asarray(a)) for a in host_args)
        run(da)
        best = min(best, time.perf_counter() - t0)
    print(json.dumps({"case": "upload_plus_kernel", "ms": round(best * 1e3, 1)}),
          flush=True)


if __name__ == "__main__":
    main()
