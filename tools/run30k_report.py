#!/usr/bin/env python
"""Summarize a full-budget training run's log.txt into RUN30K.md/RUN60K
content: per-epoch throughput stability, best-dice trajectory,
queue/choice_th behaviour, checkpoint cadence, and the mid-run
kill+resume seam. Handles both the train.py (cup/disc) and
train_mnms.py (lv/myo/rv) log shapes.

log.txt APPENDS across runs sharing a save_name, so by default the
report covers only the LAST fresh (non---load) invocation onward —
earlier lineages in the same file are dropped. --all-runs keeps
everything.

Usage: python tools/run30k_report.py <log.txt> [--every 5] [--all-runs]
"""

import argparse
import re


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("log")
    ap.add_argument("--every", type=int, default=5,
                    help="print every Nth epoch row")
    ap.add_argument("--all-runs", action="store_true",
                    help="include every invocation in the appended log, "
                         "not just the last fresh lineage")
    args = ap.parse_args()
    text = open(args.log).read()

    if not args.all_runs:
        # slice at the last invocation that did NOT resume (--load):
        # that invocation plus its resumes form the current lineage
        fresh = [m for m in re.finditer(
            r"^\[[0-9:.]+\] python train(?:_mnms)?\.py.*$", text, flags=re.M)
            if "--load" not in m.group(0)]
        if fresh:
            text = text[fresh[-1].start():]

    starts = re.findall(
        r"^\[([0-9:.]+)\] python (train(?:_mnms)?\.py.*)$", text, flags=re.M)
    print("## invocations")
    for ts, cmd in starts:
        print(f"* `{ts}` `{cmd[:110]}`")
    print()

    rows = []
    for m in re.finditer(
            r"\[([0-9:.]+)\] epoch (\d+): ([\d.]+) it/s, ([\d.]+) images/s",
            text):
        rows.append((int(m.group(2)), m.group(1), float(m.group(3)),
                     float(m.group(4))))
    bests = re.findall(
        r"(?:stu_)?val_cup_best_dice: ([\d.]+) at (\d+) iter, "
        r"(?:stu_)?val_disc_best_dice: ([\d.]+) at (\d+) iter, "
        r"val_best_avg_dice: ([\d.]+) at (\d+) iter", text)
    part_names = ("cup", "disc")
    if not bests:  # train_mnms.py shape (3 parts, train_mnms.py:372-388)
        bests = [(m[0], m[1], m[2], m[3], m[6], m[7]) for m in re.findall(
            r"(?:stu_)?val_lv_best_dice: ([\d.]+) at (\d+) iter, "
            r"(?:stu_)?val_myo_best_dice: ([\d.]+) at (\d+) iter, "
            r"(?:stu_)?val_rv_best_dice: ([\d.]+) at (\d+) iter, "
            r"val_best_avg_dice: ([\d.]+) at (\d+) iter", text)]
        part_names = ("lv", "myo")
    ckpts = re.findall(r"\[([0-9:.]+)\] save checkpoint to", text)

    print("## per-epoch throughput (images/s, sampled)")
    print("| epoch | wall time | it/s | images/s |")
    print("|---|---|---|---|")
    for e, ts, its, imgs in rows:
        if e % args.every == 0 or e == 1 or e == rows[-1][0]:
            print(f"| {e} | {ts} | {its:.1f} | {imgs:.1f} |")
    if rows:
        vals = [r[3] for r in rows]
        import statistics
        print(f"\nepochs: {len(rows)}; images/s median="
              f"{statistics.median(vals):.1f} "
              f"min={min(vals):.1f} max={max(vals):.1f}")
    if bests:
        b = bests[-1]
        print(f"\nfinal best: {part_names[0]} {b[0]} @ iter {b[1]}, "
              f"{part_names[1]} {b[2]} @ iter {b[3]}, "
              f"avg {b[4]} @ iter {b[5]}")
    print(f"checkpoint saves: {len(ckpts)} "
          f"(first {ckpts[0] if ckpts else '-'}, "
          f"last {ckpts[-1] if ckpts else '-'})")


if __name__ == "__main__":
    main()
