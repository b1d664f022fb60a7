"""Sweep the minimizer length m and report space/time trade-offs
(reference script/sweep-m.py + plot-trade-off-m.py, as json lines).

Usage: python scripts/sweep_m.py -i input.fa.gz -k 31 [--m-values 13,15,17,19]
"""

import argparse
import json
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-i", "--input", required=True)
    ap.add_argument("-k", type=int, default=31)
    ap.add_argument("--m-values", default=None,
                    help="comma-separated; default k-18..k-8 step 2, clipped >= 7")
    ap.add_argument("--canonical", action="store_true")
    args = ap.parse_args()

    from sshash_tpu import BuildConfig, Dictionary
    from sshash_tpu.info import space_breakdown

    if args.m_values:
        ms = [int(x) for x in args.m_values.split(",")]
    else:
        ms = [m for m in range(max(7, args.k - 18), args.k - 7, 2)]

    for m in ms:
        t0 = time.perf_counter()
        d = Dictionary.build(args.input, BuildConfig(k=args.k, m=m,
                                                     canonical=args.canonical,
                                                     verbose=False))
        build_s = time.perf_counter() - t0
        parts = space_breakdown(d.index)
        total_bits = sum(parts.values())
        n = d.num_kmers()
        print(json.dumps({
            "k": args.k, "m": m, "canonical": args.canonical,
            "num_kmers": n,
            "num_minimizers": d.index.num_minimizers,
            "max_bucket_size": d.index.stats.get("max_bucket_size"),
            "bits_per_kmer": round(total_bits / n, 4),
            "build_sec": round(build_s, 2),
        }))


if __name__ == "__main__":
    main()
