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

import runpy
import sys

import torch

torch.Tensor.cuda = lambda self, *a, **k: self
torch.nn.Module.cuda = lambda self, *a, **k: self
torch.cuda.manual_seed = lambda *a, **k: None
torch.cuda.manual_seed_all = lambda *a, **k: None
torch.cuda.is_available = lambda: False


def main():
    import os
    script = sys.argv[1]
    sys.argv = sys.argv[1:]
    sys.path.insert(0, os.path.dirname(os.path.abspath(script)))
    runpy.run_path(script, run_name="__main__")


if __name__ == "__main__":
    main()
