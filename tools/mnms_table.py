#!/usr/bin/env python
"""Build the PARITY.md MNMS matched-horizon table from two train_mnms-shaped
log.txt files (reference via tools/ref_cpu_launch.py, and this framework's).

train_mnms.py's eval (train_mnms.py:253-388) prints, per eval point, an EMA
block then a student block; each block is 5 "val_lv_dice: x, val_myo_dice: y,
val_rv_dice: z," lines — 4 unlabeled domains followed by the cross-domain
aggregate — closed by a best-tracking summary line. We read the aggregate
(5th) line of each block as that eval's current per-part dice.

Usage:
  python tools/mnms_table.py ref_log.txt tpu_log.txt [--per-part]
"""

import argparse
import gzip
import re

VAL = re.compile(
    r"val_lv_dice: ([\d.]+), val_myo_dice: ([\d.]+), val_rv_dice: ([\d.]+)")
ITER = re.compile(r"iteration (\d+) :")
BEST = re.compile(r"(stu_)?val_lv_best_dice")


def parse(path):
    """-> {iter: {'ema': (lv,myo,rv), 'stu': (lv,myo,rv)}}"""
    op = gzip.open if path.endswith(".gz") else open
    out, cur_iter, block = {}, None, []
    with op(path, "rt") as f:
        for line in f:
            m = ITER.search(line)
            if m:
                cur_iter = int(m.group(1))
                out.setdefault(cur_iter, {})
                continue
            m = VAL.search(line)
            if m and not BEST.search(line):
                block.append(tuple(float(g) for g in m.groups()))
                continue
            if BEST.search(line) and cur_iter is not None and block:
                model = "stu" if line and "stu_val" in line else "ema"
                out[cur_iter][model] = block[-1]  # aggregate line
                block = []
    return {k: v for k, v in out.items() if v}


def avg(t):
    return sum(t) / len(t)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("ref")
    ap.add_argument("tpu")
    ap.add_argument("--per-part", action="store_true")
    args = ap.parse_args()
    ref, tpu = parse(args.ref), parse(args.tpu)
    common = sorted(set(ref) & set(tpu))
    print("| iter | ref ema avg | tpu ema avg | ref stu avg | tpu stu avg |")
    print("|---|---|---|---|---|")
    for it in common:
        r, t = ref[it], tpu[it]
        cells = []
        for model in ("ema", "stu"):
            for side in (r, t):
                cells.append("%.4f" % avg(side[model])
                             if model in side else "—")
        print("| %d | %s |" % (it, " | ".join(cells)))
    if args.per_part:
        print()
        print("| iter | part | ref ema | tpu ema | ref stu | tpu stu |")
        print("|---|---|---|---|---|---|")
        for it in common:
            for i, part in enumerate(("lv", "myo", "rv")):
                row = [str(it), part]
                for model in ("ema", "stu"):
                    for side in (ref[it], tpu[it]):
                        row.append("%.4f" % side[model][i]
                                   if model in side else "—")
                print("| " + " | ".join(row) + " |")


if __name__ == "__main__":
    main()
