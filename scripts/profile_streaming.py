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

    # isolate: host-prep only (no device call)
    ds = _DeviceStream(eng, 31)
    step_orig = ds._step
    ds._step = lambda *a: step_orig(*a)  # keep same; instead time sub-parts
    import sshash_tpu.streaming as S

    # manual: one full-size chunk prep
    seqs = []
    tot = 0
    for r in reads:
        seqs.append((bytes(r), True))
        tot += len(r) - 30
        if tot > ds.P // 2:
            break
    ds2 = _DeviceStream(eng, 31)
    ds2._seqs = seqs
    ds2._pending = sum(len(s) - 30 for s, _ in seqs)
    ds2._chars = sum(len(s) for s, _ in seqs)
    import sshash_tpu.native as native

    k = 31
    seqs_b = [s for s, _ in seqs]
    lens = np.array([len(s) for s in seqs_b], dtype=np.int64)
    ends = np.cumsum(lens)
    cstarts = ends - lens
    t0 = time.perf_counter()
    joined = b"".join(seqs_b)
    words32 = np.zeros(ds2.CW, dtype=np.uint32)
    valid_bits = np.zeros(ds2.P // 32 + 1, dtype=np.uint32)
    t = native.encode_stream(joined, cstarts, lens, k, words32, valid_bits)
    t_encode = time.perf_counter() - t0
    print(json.dumps({"host_encode_sec_per_chunk": round(t_encode, 3),
                      "chunk_positions": int(t)}), flush=True)

    t0 = time.perf_counter()
    dev = jax.device_put(jnp.asarray(words32))
    np.asarray(dev[:1])
    t_upload = time.perf_counter() - t0
    print(json.dumps({"upload_sec_per_chunk": round(t_upload, 3),
                      "upload_bytes": int(words32.nbytes)}), flush=True)


if __name__ == "__main__":
    main()
