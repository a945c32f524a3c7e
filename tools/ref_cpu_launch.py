#!/usr/bin/env python
"""Run the UNMODIFIED reference entry scripts on CPU for baseline/parity
measurement (VERDICT r1 items 1-2).

The reference hardcodes `.cuda()` on models/tensors (train.py:503,589,...)
and seeds CUDA (train.py:981). This launcher monkeypatches torch so those
calls become no-ops on a CPU-only build, then executes the requested
reference script with the remaining argv, unchanged. Combine with
PYTHONPATH=tools/medpy_shim for the medpy/torchvision stand-ins.

Usage:
    cd <sandbox with reference scripts>  # see tools/parity/README
    PYTHONPATH=/root/repo/tools/medpy_shim \
        python /root/repo/tools/ref_cpu_launch.py train.py --dataset ... args
"""

import argparse
import runpy
import sys

import torch

torch.Tensor.cuda = lambda self, *a, **k: self
torch.nn.Module.cuda = lambda self, *a, **k: self
torch.cuda.manual_seed = lambda *a, **k: None
torch.cuda.manual_seed_all = lambda *a, **k: None
torch.cuda.is_available = lambda: False

# Latent reference bug: train_mnms.py:318 reads `args.save_img` inside the
# epoch%10==0 eval branch, but only test.py:31 defines that flag — an
# unmodified train_mnms.py run crashes with AttributeError at the epoch-10
# eval (observed 2026-08-18, iter-250 eval of the MNMS parity lane). Shim
# the missing attribute to its store_true default (False) so long lanes
# survive; behavior is identical to what the author's parser would produce.
_orig_parse_args = argparse.ArgumentParser.parse_args


def _parse_args(self, *a, **k):
    ns = _orig_parse_args(self, *a, **k)
    if ns is not None and not hasattr(ns, "save_img"):
        ns.save_img = False
    return ns


argparse.ArgumentParser.parse_args = _parse_args


def main():
    import os
    script = sys.argv[1]
    sys.argv = sys.argv[1:]
    sys.path.insert(0, os.path.dirname(os.path.abspath(script)))
    runpy.run_path(script, run_name="__main__")


if __name__ == "__main__":
    main()
