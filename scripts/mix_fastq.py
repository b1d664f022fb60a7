"""Build a hit-rate-controlled query workload by mixing reads from two
fastq files (the analog of reference script/mix_fastq_files.py: interleave
reads from a "positive" file — sampled from the indexed dataset — and a
"negative" file at a chosen ratio, preserving 4-line fastq records).

    python scripts/mix_fastq.py pos.fastq.gz neg.fastq.gz out.fastq.gz \
        --ratio 0.5 --max-reads 100000 --seed 7
"""

import argparse
import gzip
import random


def fastq_reader(path):
    op = gzip.open if path.endswith(".gz") else open
    with op(path, "rt") as f:
        while True:
            rec = [f.readline() for _ in range(4)]
            if not rec[0]:
                return
            yield "".join(rec)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("positive")
    ap.add_argument("negative")
    ap.add_argument("out")
    ap.add_argument("--ratio", type=float, default=0.5,
                    help="fraction of reads drawn from the positive file")
    ap.add_argument("--max-reads", type=int, default=None)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    rng = random.Random(args.seed)
    pos, neg = fastq_reader(args.positive), fastq_reader(args.negative)
    op = gzip.open if args.out.endswith(".gz") else open
    n = npos = 0
    with op(args.out, "wt") as f:
        while args.max_reads is None or n < args.max_reads:
            take_pos = rng.random() < args.ratio
            rec = next(pos if take_pos else neg, None)
            if rec is None:  # chosen stream exhausted: try the other
                rec = next(neg if take_pos else pos, None)
                if rec is None:
                    break
                take_pos = not take_pos
            f.write(rec)
            n += 1
            npos += take_pos
    print(f"wrote {n} reads ({npos} from positive, "
          f"{n - npos} from negative) to {args.out}")


if __name__ == "__main__":
    main()
