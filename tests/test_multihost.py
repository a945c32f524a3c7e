"""Multi-host (DCN) path: cli.maybe_init_distributed + a real 2-process
CPU run with Gloo collectives over a global 8-device mesh
(VERDICT r1 item 6; SURVEY sections 5/7.5)."""

import os
import subprocess
import sys

import pytest

pytestmark = pytest.mark.slow

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_maybe_init_distributed_gated_off(monkeypatch):
    from ust_run_tpu.cli import maybe_init_distributed
    monkeypatch.delenv("UST_MULTIHOST", raising=False)
    assert maybe_init_distributed() is False


def test_two_process_cpu_mesh():
    env = dict(os.environ)
    env.pop("UST_MULTIHOST", None)
    env.pop("UST_MULTIHOST_WORKER", None)
    out = subprocess.run(
        [sys.executable, os.path.join(ROOT, "tools",
                                      "multihost_cpu_demo.py")],
        env=env, capture_output=True, text=True, timeout=300)
    assert out.returncode == 0, out.stderr[-2000:]
    assert "2 processes x 4 devices OK" in out.stdout


@pytest.mark.skipif((os.cpu_count() or 1) < 4,
                    reason="two concurrent workers on a starved host "
                           "miss Gloo's 30s collective deadline "
                           "intermittently; run tools/multihost_step_demo"
                           ".py standalone there (passes when the core "
                           "is free)")
def test_two_process_fused_step():
    """The REAL fused SSL train step across 2 processes x 4 devices:
    replicated state via make_array_from_callback, batch constraints over
    the global 'data' axis, identical losses on both processes."""
    env = dict(os.environ)
    env.pop("UST_MULTIHOST", None)
    env.pop("UST_MULTIHOST_STEP_WORKER", None)
    for attempt, port in enumerate(("12907", "12917")):
        env["UST_MH_PORT"] = port
        out = subprocess.run(
            [sys.executable, os.path.join(ROOT, "tools",
                                          "multihost_step_demo.py")],
            env=env, capture_output=True, text=True, timeout=1700)
        if out.returncode == 0:
            break
    assert out.returncode == 0, out.stderr[-2000:]
    assert "fused step across 2 processes OK" in out.stdout
