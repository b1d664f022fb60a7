"""Space/time trade-off CSV + plot from sweep json lines (the analog of
reference script/plot-trade-off-m.py and plot-trade-off-l.py, which parse a
results directory into pandas and render matplotlib twin-axis charts).

Feed it the json-lines output of scripts/sweep_m.py or scripts/sweep_min_l.py:

    python scripts/sweep_m.py -i in.fa.gz -k 31 > sweep.jsonl
    python scripts/plot_trade_off.py sweep.jsonl -x m -o trade_off

Always writes <out>.csv; also writes <out>.png when matplotlib is present
(it is not baked into this image — the CSV feeds any plotter).
"""

import argparse
import csv
import json
import sys


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("jsonl", help="json-lines file from a sweep script, or - for stdin")
    ap.add_argument("-x", default="m", help="x-axis field (m, min_l, ...)")
    ap.add_argument("--space", default="bits_per_kmer",
                    help="space field for the left axis")
    ap.add_argument("--time", dest="time_field", default="lookup_ns",
                    help="time field for the right axis")
    ap.add_argument("-o", "--out", default="trade_off")
    args = ap.parse_args()

    fh = sys.stdin if args.jsonl == "-" else open(args.jsonl)
    rows = [json.loads(line) for line in fh if line.strip()]
    rows = [r for r in rows if "error" not in r]
    if not rows:
        sys.exit("no usable rows")
    rows.sort(key=lambda r: r.get(args.x, 0))

    fields = sorted({k for r in rows for k in r})
    with open(args.out + ".csv", "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=fields)
        w.writeheader()
        w.writerows(rows)
    print(f"wrote {args.out}.csv ({len(rows)} rows)")

    try:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except ImportError:
        print("matplotlib not available; csv only")
        return

    xs = [r[args.x] for r in rows]
    fig, ax1 = plt.subplots(figsize=(7, 4.5))
    ax2 = ax1.twinx()
    if all(args.space in r for r in rows):
        ax1.plot(xs, [r[args.space] for r in rows], "o-", label=args.space)
        ax1.set_ylabel(args.space)
    if all(args.time_field in r for r in rows):
        ax2.plot(xs, [r[args.time_field] for r in rows], "s--",
                 color="tab:red", label=args.time_field)
        ax2.set_ylabel(args.time_field)
    ax1.set_xlabel(args.x)
    ax1.grid(True, alpha=0.3)
    fig.tight_layout()
    fig.savefig(args.out + ".png", dpi=150)
    print(f"wrote {args.out}.png")


if __name__ == "__main__":
    main()
