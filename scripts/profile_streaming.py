"""Break down warm device-streaming time: parse, host encode, upload,
dispatch, kernel, fetch. Prints json lines."""

import json
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

INPUT = "/root/reference/data/unitigs_stitched/salmonella_enterica_k31_ust.fa.gz"
GENOME = "/root/reference/data/queries/salmonella_enterica.fasta.gz"


def main():
    import jax
    import jax.numpy as jnp

    from sshash_tpu import BuildConfig, Dictionary
    from sshash_tpu.streaming import _DeviceStream, parse_reads

    d = Dictionary.build(INPUT, BuildConfig(k=31, m=15, verbose=False))
    eng = d.to_device()

    t0 = time.perf_counter()
    reads = list(parse_reads(GENOME, multiline=True))
    t_parse = time.perf_counter() - t0
    nchars = sum(len(r) for r in reads)
    print(json.dumps({"parse_sec": round(t_parse, 3), "chars": nchars,
                      "reads": len(reads)}), flush=True)

    # cold pass (compile)
    t0 = time.perf_counter()
    ds = _DeviceStream(eng, 31)
    for r in reads:
        ds.add_read(r)
    rep = ds.finalize()
    print(json.dumps({"cold_sec": round(time.perf_counter() - t0, 3),
                      "kmers": rep["num_kmers"],
                      "pos": rep["num_positive_kmers"]}), flush=True)

    # warm passes with instrumented flush
    for it in range(3):
        ds = _DeviceStream(eng, 31)
        t0 = time.perf_counter()
        for r in reads:
            ds.add_read(r)
        t_add_wo_flush = time.perf_counter() - t0

        # instrument: wrap flush timing by monkey-watching _inflight growth
        t1 = time.perf_counter()
        rep = ds.finalize()
        t_fin = time.perf_counter() - t1
        total = time.perf_counter() - t0
        print(json.dumps({"iter": it, "warm_total_sec": round(total, 3),
                          "add_reads_sec": round(t_add_wo_flush, 3),
                          "finalize_sec": round(t_fin, 3),
                          "kmers_per_s": round(rep["num_kmers"] / total)}),
              flush=True)

    # host encode cost for one full chunk (properly sized buffers)
    import sshash_tpu.native as native

    k = 31
    P = 1 << 22
    seq = bytes(reads[0][: P + k - 1])
    lens = np.array([len(seq)], dtype=np.int64)
    cstarts = np.array([0], dtype=np.int64)
    CW = (P + ((P >> 4) * (k - 1)) + 31) // 32 + 4
    words32 = np.zeros(CW, dtype=np.uint32)
    valid_bits = np.zeros(P // 32 + 1, dtype=np.uint32)
    t0 = time.perf_counter()
    t = native.encode_stream(seq, cstarts, lens, k, words32, valid_bits)
    print(json.dumps({"host_encode_sec_per_chunk":
                      round(time.perf_counter() - t0, 3),
                      "chunk_positions": int(t)}), flush=True)


if __name__ == "__main__":
    main()
