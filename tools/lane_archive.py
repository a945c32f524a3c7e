#!/usr/bin/env python
"""Archive a training lane's log.txt, keeping only the LAST lineage.

`--overwrite` reuses the snapshot dir, so log.txt accumulates one
lineage per launch (each starting with its "python train*.py ..."
command echo). Parity analysis must see exactly one run, so this slices
from the final command echo to EOF and writes it gzip-compressed to the
artifacts directory.

Usage: python tools/lane_archive.py <log.txt> <out.gz>
"""

import gzip
import re
import sys


def last_lineage(text):
    starts = [m.start() for m in
              re.finditer(r"^\[[0-9:.]+\] python train", text, flags=re.M)]
    return text[starts[-1]:] if starts else text


def main():
    src, dst = sys.argv[1], sys.argv[2]
    with open(src) as f:
        text = last_lineage(f.read())
    with gzip.open(dst, "wt") as f:
        f.write(text)
    print(f"{dst}: {len(text)} chars, "
          f"{len(re.findall(r'val_best_avg_dice', text))} best-lines")


if __name__ == "__main__":
    main()
