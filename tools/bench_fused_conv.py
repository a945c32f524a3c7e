#!/usr/bin/env python
"""On-chip microbenchmark: Pallas fused BN+ReLU+conv3x3 (+moment
epilogue) vs the exact XLA chain it would replace (VERDICT r3 item 1).

Times the DoubleConv interior boundary at the fused step's real
shapes — the student megabatch (21 images) and teacher batch at the
64/128-channel levels that dominate PERF.md's bucket table. Timing
uses a host fetch of a scalar checksum (block_until_ready does not
wait on the tunneled axon platform — see .claude/skills/verify).

Usage: PYTHONPATH=/root/repo python tools/bench_fused_conv.py
       [--repeats 20] [--interpret]  (interpret: CPU correctness run)

Prints one JSON line per (shape, block_rows) with ms/call for both
sides and the ratio; the PERF.md dead-end-table standard either way.
"""

import argparse
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from ust_run_tpu.ops.fused_conv import bn_relu_conv3x3, xla_reference_chain

# (label, B, H, W, C, Co): the fused step's conv shapes (PERF.md bucket
# table; 21 = 4 lb + 4 s_ul + 4 s_lu + 8 ulb_s + 1 lq student megabatch,
# 12 = the 3x4 teacher no-grad megabatch).
SHAPES = [
    ("L1 student 256x64", 21, 256, 256, 64, 64),
    ("L1 teacher 256x64", 12, 256, 256, 64, 64),
    ("L2 student 128x128", 21, 128, 128, 128, 128),
    ("L3 student 64x256", 21, 64, 64, 256, 256),
]


def timeit(fn, args, repeats):
    out = fn(*args)
    chk = jnp.sum(out[0][0, 0, 0].astype(jnp.float32))
    float(np.asarray(chk))  # warm + sync
    t0 = time.perf_counter()
    for _ in range(repeats):
        out = fn(*args)
    chk = jnp.sum(out[0][0, 0, 0].astype(jnp.float32))
    float(np.asarray(chk))
    return (time.perf_counter() - t0) / repeats * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--repeats", type=int, default=20)
    ap.add_argument("--interpret", action="store_true")
    ap.add_argument("--dtype", default="bfloat16")
    args = ap.parse_args()
    dtype = jnp.dtype(args.dtype)

    for label, b, h, w, c, co in SHAPES:
        k = jax.random.split(jax.random.PRNGKey(0), 4)
        y = jax.random.normal(k[0], (b, h, w, c), jnp.float32).astype(dtype)
        inv = jax.random.uniform(k[1], (b, c), jnp.float32, 0.5, 1.5)
        shift = jax.random.normal(k[2], (b, c), jnp.float32) * 0.3
        wk = jax.random.normal(k[3], (3, 3, c, co), jnp.float32) * 0.05

        ms_xla = timeit(jax.jit(xla_reference_chain), (y, inv, shift, wk),
                        args.repeats)
        # unique HBM traffic if perfectly fused: read y + write out (+w)
        gb = (y.nbytes + b * h * w * co * dtype.itemsize) / 1e9
        for rows in (16, 32, 64):
            if h % rows:
                continue
            try:
                ms_k = timeit(
                    lambda *a: bn_relu_conv3x3(
                        *a, block_rows=rows, interpret=args.interpret),
                    (y, inv, shift, wk), args.repeats)
            except Exception as e:  # noqa: BLE001 — report and continue
                print(json.dumps({"shape": label, "block_rows": rows,
                                  "error": str(e)[:200]}), flush=True)
                continue
            print(json.dumps({
                "shape": label, "block_rows": rows,
                "xla_ms": round(ms_xla, 3), "pallas_ms": round(ms_k, 3),
                "speedup": round(ms_xla / ms_k, 3),
                "pallas_gbps": round(gb / (ms_k / 1e3), 1),
            }), flush=True)


if __name__ == "__main__":
    main()
