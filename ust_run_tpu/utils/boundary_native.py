"""ctypes bridge to the native boundary-metric engine (native/boundary.cc).

Builds the shared library on first use (g++ -O3) into native/_build/ and
falls back silently to the scipy implementation (utils/boundary.py) when a
compiler is unavailable. The native path computes dc/jc/hd95/asd in one
call per (pred, gt) pair — the per-sample evaluation metrics of reference
train.py:306-325 — an order of magnitude faster than four separate scipy
pipelines on this single-core host.
"""

import ctypes
import logging
import os
import subprocess

import numpy as np

_LIB = None
_TRIED = False


def _repo_root():
    return os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))


def _build_and_load():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    root = _repo_root()
    src = os.path.join(root, "native", "boundary.cc")
    build_dir = os.path.join(root, "native", "_build")
    so = os.path.join(build_dir, "libboundary.so")
    try:
        if (not os.path.exists(so)
                or os.path.getmtime(so) < os.path.getmtime(src)):
            os.makedirs(build_dir, exist_ok=True)
            # no -march=native: the library is rebuilt-on-first-use but a
            # stale _build/ may travel across machines (the exact SIGILL
            # hazard XLA:CPU AOT shows on this fleet); portable codegen
            # costs ~nothing for an EDT that is memory-bound anyway.
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", "-o", so, src],
                check=True, capture_output=True)
        lib = ctypes.CDLL(so)
        lib.boundary_metrics.restype = ctypes.c_int
        lib.boundary_metrics.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int, ctypes.c_int, ctypes.POINTER(ctypes.c_double)]
        _LIB = lib
    except Exception as e:  # no compiler / load failure -> scipy fallback
        logging.warning("native boundary engine unavailable (%s); "
                        "using scipy fallback", e)
        _LIB = None
    return _LIB


def available():
    return _build_and_load() is not None


def boundary_metrics(pred, gt):
    """(dc, jc, hd95, asd) for two 2-D boolean masks.

    hd95/asd are NaN when either mask is empty (caller applies the
    reference's empty-prediction convention, train.py:313-315).
    """
    lib = _build_and_load()
    pred = np.ascontiguousarray(pred, np.uint8)
    gt = np.ascontiguousarray(gt, np.uint8)
    if lib is not None:
        out = np.zeros(4, np.float64)
        lib.boundary_metrics(
            pred.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            gt.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            pred.shape[0], pred.shape[1],
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)))
        return tuple(out)
    from ust_run_tpu.utils import boundary as B
    dc = B.dc(pred, gt)
    jc = B.jc(pred, gt)
    if pred.any() and gt.any():
        hd95 = B.hd95(pred, gt)
        asd = B.asd(pred, gt)
    else:
        hd95 = float("nan")
        asd = float("nan")
    return dc, jc, hd95, asd
