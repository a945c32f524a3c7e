#!/usr/bin/env python
"""Retry protocol for the 2x4 multi-host fused-step proof (VERDICT r3
item 7).

The 8-rank Gloo context init stands up 28 TCP pairs under XLA's
hardcoded 30 s rendezvous deadline; on a single-core host a starved
worker thread can miss the handshake (MULTIHOST_PROOF.json
fused_step_8rank.failure_modes). The flake is load-dependent, so the
protocol is: (1) quiesce — callers SIGSTOP any background load first;
(2) attempt `tools/multihost_step_demo.py` with UST_MH_DEVS=4 up to
--attempts times with a fresh coordinator port per attempt (a failed
rendezvous can leave the port in TIME_WAIT); (3) report the first pass
and the attempt count. Exit 0 iff one attempt passes.

Usage: python tools/multihost_retry.py [--attempts 8] [--devs 4]
"""

import argparse
import os
import signal
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--attempts", type=int, default=8)
    ap.add_argument("--devs", type=int, default=4)
    ap.add_argument("--timeout", type=int, default=900, help="per attempt")
    args = ap.parse_args()

    for k in range(1, args.attempts + 1):
        env = dict(os.environ)
        env["UST_MH_DEVS"] = str(args.devs)
        env["UST_MH_PORT"] = str(12800 + k)
        t0 = time.time()
        print(f"[attempt {k}/{args.attempts}] port {env['UST_MH_PORT']} "
              f"devs {args.devs}", flush=True)
        # start_new_session puts the demo AND the rank workers it spawns
        # into one process group, so a timeout can kill the whole tree —
        # an orphaned rank worker would keep pegging the single-core
        # host (worsening the load flake) and hold the coordinator port.
        proc = subprocess.Popen(
            [sys.executable,
             os.path.join(ROOT, "tools", "multihost_step_demo.py")],
            env=env, start_new_session=True)
        try:
            rc = proc.wait(timeout=args.timeout)
        except subprocess.TimeoutExpired:
            try:
                os.killpg(os.getpgid(proc.pid), signal.SIGKILL)
            except (ProcessLookupError, PermissionError):
                pass
            proc.wait()
            rc = -1
        dt = time.time() - t0
        print(f"[attempt {k}] rc={rc} ({dt:.0f}s)", flush=True)
        if rc == 0:
            print(f"multihost_retry: PASS on attempt {k}/{args.attempts}")
            return 0
    print(f"multihost_retry: FAIL after {args.attempts} attempts")
    return 1


if __name__ == "__main__":
    sys.exit(main())
