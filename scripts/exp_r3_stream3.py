"""Round-3 streaming experiment: packed single-upload chunks on real TPU.

Measures end-to-end warm genome streaming at several chunk sizes (smaller
chunks let chunk i+1's host encode + upload overlap chunk i's device
compute; bigger chunks amortize per-dispatch round trips — this sweep finds
the crossover on the live tunnel), plus the low-hit fastq workload.
Usage: python scripts/exp_r3_stream3.py [chunk_shift ...]  (default 22 21)
Prints json lines."""

import json
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

INPUT = "/root/reference/data/unitigs_stitched/salmonella_enterica_k31_ust.fa.gz"
GENOME = "/root/reference/data/queries/salmonella_enterica.fasta.gz"
READS = "/root/reference/data/queries/SRR5833294.10K.fastq.gz"


def main():
    from sshash_tpu import BuildConfig, Dictionary
    from sshash_tpu.streaming import streaming_query_from_file

    shifts = [int(a) for a in sys.argv[1:]] or [22, 21]
    # 5<<19 = 2.5M splits the 4.86M-position genome into two equal chunks of
    # one compiled shape — the cleanest upload/compute overlap test
    chunks = [5 << 20, 5 << 19] + [1 << s for s in shifts
                                   if (1 << s) != (5 << 20)]

    d = Dictionary.build(INPUT, BuildConfig(k=31, m=17, verbose=False))
    d.to_device()

    for ch in chunks:
        rates = []
        for rep in range(3):
            t0 = time.perf_counter()
            r = streaming_query_from_file(d, GENOME, multiline=True,
                                          use_device=True, chunk=ch)
            dt = time.perf_counter() - t0
            rates.append(r["num_kmers"] / dt)
        print(json.dumps({"workload": "genome", "chunk": ch,
                          "kmers": r["num_kmers"],
                          "warm_kmers_per_s": round(max(rates[1:])),
                          "rates": [round(x) for x in rates]}), flush=True)

    rates = []
    for rep in range(3):
        t0 = time.perf_counter()
        r = streaming_query_from_file(d, READS, use_device=True)
        dt = time.perf_counter() - t0
        rates.append(r["num_kmers"] / dt)
    print(json.dumps({"workload": "fastq_low_hit", "kmers": r["num_kmers"],
                      "pos": r["num_positive_kmers"],
                      "warm_kmers_per_s": round(max(rates[1:])),
                      "rates": [round(x) for x in rates]}), flush=True)


if __name__ == "__main__":
    main()
