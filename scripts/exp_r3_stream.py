"""Streaming e2e timing matrix on the real TPU: m15/m17 x rmax_shift (json)."""

import json
import sys

import numpy as np  # noqa: F401

sys.path.insert(0, __file__.rsplit("/", 2)[0])

INPUT = "/root/reference/data/unitigs_stitched/salmonella_enterica_k31_ust.fa.gz"
GENOME = "/root/reference/data/queries/salmonella_enterica.fasta.gz"


def main():
    from sshash_tpu import BuildConfig, Dictionary
    from sshash_tpu.streaming import streaming_query_from_file

    CH = 5 << 20
    for m in (17, 15):
        d = Dictionary.build(INPUT, BuildConfig(k=31, m=m, verbose=False))
        for sh in (12, 4):
            streaming_query_from_file(d, GENOME, multiline=True,
                                      use_device=True, chunk=CH, rmax_shift=sh)
            best = None
            for _ in range(3):
                rep = streaming_query_from_file(d, GENOME, multiline=True,
                                                use_device=True, chunk=CH,
                                                rmax_shift=sh)
                el = rep["elapsed_millisec"]
                best = el if best is None else min(best, el)
            rate = rep["num_kmers"] / best * 1e3
            print(json.dumps({"exp": f"stream_m{m}_rshift{sh}",
                              "elapsed_ms": round(best),
                              "Mkmers_per_s": round(rate / 1e6, 2)}), flush=True)


if __name__ == "__main__":
    main()
