#!/usr/bin/env python
"""Multi-seed parity analysis: medians and seed bands for PARITY.md.

Takes N reference log.txt files and M framework log.txt files from runs
with matched configs (same dataset/corpus/horizon, different seeds) and
prints, at the matched horizon (the shortest run):

  * per-seed best cross-domain average dice (best-over-training, the
    reference's success criterion, train.py:913-954) for EMA + student;
  * median and min-max band per side;
  * the median-vs-median delta against the 0.5-pt north-star bar;
  * a per-eval-point median trajectory table.

Usage:
  python tools/parity_multiseed.py --parts cup,disc \
      --ref  <ref_log1> <ref_log2> ... \
      --tpu  <tpu_log1> <tpu_log2> ... \
      --iters-per-eval 25
"""

import argparse
import statistics
import sys

sys.path.insert(0, __file__.rsplit("/", 1)[0])
from parity_report import parse_log  # noqa: E402


def series(records, model):
    """-> list of avg-dice per eval point for one model."""
    return [sum(r["dice"].values()) / max(len(r["dice"]), 1)
            for r in records if r["model"] == model]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ref", nargs="+", required=True)
    ap.add_argument("--tpu", nargs="+", required=True)
    ap.add_argument("--parts", default="cup,disc")
    ap.add_argument("--iters-per-eval", type=int, default=25)
    ap.add_argument("--bar", type=float, default=0.5,
                    help="pass bar in dice points (default 0.5)")
    args = ap.parse_args()
    parts = args.parts.split(",")

    runs = {"ref": [parse_log(p, parts) for p in args.ref],
            "tpu": [parse_log(p, parts) for p in args.tpu]}
    # matched horizon = shortest eval-point count across every run
    horizon = min(len(series(r, "ema")) for rs in runs.values() for r in rs)
    print(f"matched horizon: {horizon} eval points "
          f"({horizon * args.iters_per_eval} iters); "
          f"runs: {len(args.ref)} ref, {len(args.tpu)} tpu\n")

    for model in ("ema", "stu"):
        print(f"## {model}: best avg dice within matched horizon")
        med = {}
        for side in ("ref", "tpu"):
            bests = [max(series(r, model)[:horizon]) for r in runs[side]]
            med[side] = statistics.median(bests)
            print(f"  {side}: " + "  ".join(f"{b:.4f}" for b in bests)
                  + f"   median={med[side]:.4f} "
                  f"band=[{min(bests):.4f},{max(bests):.4f}]")
        delta = 100 * abs(med["ref"] - med["tpu"])
        print(f"  median-vs-median delta: {delta / 100:.4f} "
              f"({delta:.1f} pts) -> "
              f"{'PASS' if delta <= args.bar else 'FAIL'} vs "
              f"{args.bar}-pt bar\n")

    print("## median trajectory (avg dice per eval point)")
    print("| iter | ref ema | tpu ema | ref stu | tpu stu |")
    print("|---|---|---|---|---|")
    for i in range(horizon):
        row = [f"| {(i + 1) * args.iters_per_eval} "]
        for model in ("ema", "stu"):
            for side in ("ref", "tpu"):
                vals = [series(r, model)[i] for r in runs[side]
                        if len(series(r, model)) > i]
                row.append(f"| {statistics.median(vals):.4f} ")
        # column order: ref ema, tpu ema, ref stu, tpu stu
        print(row[0] + row[1] + row[2] + row[3] + row[4] + "|")


if __name__ == "__main__":
    main()
