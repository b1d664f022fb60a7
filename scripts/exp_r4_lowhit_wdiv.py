"""Round-4 low-hit sweep: fallback window divisor (SSHASH_STREAM_WDIV)
on the 10x-amplified SRR workload (the bench.py low-hit row).

Low-hit chunks route through derive_full: run-skip hashing picks the
miss-run heads, then ceil(heads/Wp) windows of compacted full lookups at
Wp = P/WDIV width. Window padding vs per-window fixed passes trade off
with the head density, so sweep it on the real workload.

Usage: python scripts/exp_r4_lowhit_wdiv.py [wdiv ...]  (default 16 64 256)
"""

import json
import os
import sys
import time

import numpy as np  # noqa: F401

REPO = __file__.rsplit("/", 2)[0]
sys.path.insert(0, REPO)

INPUT = "/root/reference/data/unitigs_stitched/salmonella_enterica_k31_ust.fa.gz"
READS = "/root/reference/data/queries/SRR5833294.10K.fastq.gz"


def main():
    from sshash_tpu import BuildConfig, Dictionary
    from sshash_tpu.streaming import streaming_query_from_file

    amp = "/tmp/sshash_bench_srr_x10.fastq.gz"
    if not os.path.exists(amp):
        with open(READS, "rb") as fi, open(amp, "wb") as fo:
            blob = fi.read()
            for _ in range(10):
                fo.write(blob)

    divs = [int(x) for x in sys.argv[1:]] or [16, 64, 256]
    d = Dictionary.build(INPUT, BuildConfig(k=31, m=17, verbose=False))
    want = None
    for div in divs:
        os.environ["SSHASH_STREAM_WDIV"] = str(div)
        d._jax = None  # fresh engine (+step cache): env read at trace time
        rep = streaming_query_from_file(d, amp, use_device=True)
        t0 = time.perf_counter()
        rep = streaming_query_from_file(d, amp, use_device=True)
        el = time.perf_counter() - t0
        key = {k2: rep[k2] for k2 in ("num_kmers", "num_positive_kmers",
                                      "num_searches", "num_extensions")}
        if want is None:
            want = key
        assert key == want, (div, key, want)  # counters invariant to WDIV
        print(json.dumps({"wdiv": div, "sec": round(el, 3),
                          "kmers_per_s": round(rep["num_kmers"] / el)}),
              flush=True)


if __name__ == "__main__":
    sys.exit(main())
