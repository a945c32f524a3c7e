"""Tensorboard-free xplane.pb parsing for TPU device traces.

The tensorboard_plugin_profile converter in this environment fails on a
protobuf/tensorflow version skew, so jax.profiler traces are parsed
directly: the device plane's "XLA Ops" line carries one event per HLO op
execution with its duration; aggregating by op name/bucket reproduces the
framework_op_stats table this repo's PERF.md is built from.
"""

import collections
import re


def load_xla_ops(xplane_path):
    """-> list of (hlo_instruction_text, total_ms) summed over the trace."""
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    xs = xplane_pb2.XSpace()
    with open(xplane_path, "rb") as f:
        xs.ParseFromString(f.read())
    planes = [p for p in xs.planes if p.name == "/device:TPU:0"]
    if not planes:
        raise SystemExit(f"no TPU device plane in {xplane_path}")
    plane = planes[0]
    emeta = plane.event_metadata
    agg = collections.Counter()
    for line in plane.lines:
        if line.name != "XLA Ops":
            continue
        for ev in line.events:
            agg[emeta[ev.metadata_id].name] += ev.duration_ps / 1e9
    return sorted(agg.items(), key=lambda kv: -kv[1])


def bucket(name):
    """Coarse performance bucket for one HLO instruction text."""
    root = name.split(" = ", 1)
    body = root[1] if len(root) == 2 else name
    if re.match(r"\(?[a-z0-9]+\[[0-9,]*\][^ ]* convolution", body):
        return "convolution"
    if "select-and-scatter" in body:
        return "maxpool-bwd"
    if "reduce-window" in body:
        return "maxpool-fwd"
    for kw in ("convert", "copy", "transpose", "reverse", "scatter",
               "sort", "rng", "dynamic-slice", "dynamic-update-slice",
               "gather"):
        if body.startswith(kw) or body.startswith(f"{kw}("):
            return kw
    m = re.match(r"\(?([a-z0-9]+)\[([0-9,]*)\]", body)
    if m and "fusion" in body:
        dims = m.group(2).split(",") if m.group(2) else []
        # conv(+epilogue) fusions name their fused conv in the operand
        # list; multiply_add weight-grad fusions keep their r2 names
        if "multiply_add_fusion" in name:
            return "conv-weight-grad"
        if "convolution" in name:
            return "convolution(+fused epilogue)"
        if len(dims) == 4 and dims[1] == "2" and dims[2] == "2":
            return "aug-patch-gather"
        if len(dims) == 2:
            return "BN stat/bwd reductions (N,C)"
        if len(dims) == 4:
            return "elementwise on activations"
        if len(dims) == 1:
            return "flat vector fusion"
        return "other fusion"
    return "other"


def print_table(xplane_path, steps=10, top=30):
    ops = load_xla_ops(xplane_path)
    total = sum(t for _, t in ops)
    buckets = collections.Counter()
    for n, t in ops:
        buckets[bucket(n)] += t
    print(f"{'bucket':<36}{'ms/step':>9}{'%':>7}")
    for b, t in buckets.most_common():
        print(f"{b:<36}{t / steps:>9.2f}{100 * t / total:>6.1f}%")
    print(f"{'TOTAL':<36}{total / steps:>9.2f}")
    print()
    print(f"{'top ops':<70}{'ms/step':>9}")
    for n, t in ops[:top]:
        print(f"{n[:68]:<70}{t / steps:>9.2f}")


if __name__ == "__main__":
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("xplane")
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--top", type=int, default=30)
    a = ap.parse_args()
    print_table(a.xplane, a.steps, a.top)
