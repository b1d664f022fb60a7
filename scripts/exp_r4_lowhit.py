"""Round-4: AMORTIZED low-hit streaming (VERDICT #5).

The bundled SRR workload (10K reads, 460K kmers, ~0.01% hit rate vs
salmonella) is dispatch-latency-bound at ~40ms/round-trip. Amplify it 10x
by gzip concatenation (100K reads, 4.6M kmers — same read/hit profile) and
measure warm end-to-end in BOTH index modes (the reference claims canonical
is "up to 2x faster" on low-hit, README.md:222-229) plus a kernel-only
companion via the _DeviceStream capture hook (re-times the compiled steps
on device-resident buffers, no upload).

Usage: python scripts/exp_r4_lowhit.py
"""

import json
import os
import sys
import time

import numpy as np

REPO = __file__.rsplit("/", 2)[0]
sys.path.insert(0, REPO)

INPUT = "/root/reference/data/unitigs_stitched/salmonella_enterica_k31_ust.fa.gz"
SRR = "/root/reference/data/queries/SRR5833294.10K.fastq.gz"
AMP = "/tmp/srr_x10.fastq.gz"
COPIES = 10


def main():
    import jax

    from sshash_tpu import BuildConfig, Dictionary
    from sshash_tpu.streaming import (_DeviceStream, parse_reads,
                                      streaming_query_from_file)

    if not os.path.exists(AMP):
        with open(SRR, "rb") as f:
            blob = f.read()
        with open(AMP, "wb") as f:
            for _ in range(COPIES):
                f.write(blob)  # concatenated gzip members decode as one

    for mode in ("regular", "canonical"):
        d = Dictionary.build(INPUT, BuildConfig(
            k=31, m=17, canonical=(mode == "canonical"), verbose=False))
        rep = streaming_query_from_file(d, AMP, use_device=True)  # compile
        rep = streaming_query_from_file(d, AMP, use_device=True)  # warm
        print(json.dumps({
            "exp": "r4_lowhit", "mode": mode,
            "num_kmers": int(rep["num_kmers"]),
            "positive": int(rep["num_positive_kmers"]),
            "kmers_per_s": round(rep["num_kmers"] /
                                 (rep["elapsed_millisec"] / 1e3)),
        }), flush=True)

        # kernel-only: capture the per-chunk compiled fns + device buffers,
        # then re-run them without upload
        eng = d.to_device()
        ds = _DeviceStream(eng, d.index.k, pmax=1 << 22, rmax_shift=4)
        ds._capture = []
        for seq in parse_reads(AMP):
            ds.add_read(seq)
        rep2 = ds.finalize()
        nk = rep2["num_kmers"]

        def run_all():
            outs = [fn(eng.arrs, buf) for fn, buf in ds._capture]
            np.asarray(outs[-1])

        run_all()
        best = float("inf")
        for _ in range(4):
            t0 = time.perf_counter()
            run_all()
            best = min(best, time.perf_counter() - t0)
        print(json.dumps({
            "exp": "r4_lowhit_kernel_only", "mode": mode,
            "num_kmers": int(nk), "chunks": len(ds._capture),
            "sec": round(best, 3),
            "kmers_per_s": round(nk / best),
        }), flush=True)


if __name__ == "__main__":
    main()
