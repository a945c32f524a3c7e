"""Every --model zoo family must train through the fused SSL step.

Regression for the r3 DeepLab lane crash: the LQ-fold perf change
(semisup/step.py:399-408) passes `group_sizes`/`group_valid` to the
student call, which only UNet accepted at the time — `--model
deeplabv2_r50` / `unet2d` died on the first step with an unexpected
keyword. The zoo models here run the REAL Trainer loop (fused jitted
step incl. queue/LQ curriculum) for a few iterations on tiny shapes.

`unet` itself is covered by tests/test_engine.py; `unet2d_dsbn` is
excluded: DSBN requires a per-call domain_label the SSL step never
supplies — the reference likewise never trains DSBN variants from its
entry points (networks/unet.py is unused by train.py).
"""

import os

import numpy as np
import pytest

from ust_run_tpu.config import TrainConfig
from ust_run_tpu.data import synthetic
from ust_run_tpu.engine.trainer import Trainer

pytestmark = pytest.mark.slow


@pytest.mark.parametrize("model", ["unet2d", "deeplabv2_r50"])
def test_zoo_model_trains_through_fused_step(model, tmp_path):
    data_root = str(tmp_path / "data")
    model_root = str(tmp_path / "model")
    synthetic.generate("prostate", data_root, n_train=6, n_test=2, size=64)
    cfg = TrainConfig(dataset="prostate", save_name=f"zoo_{model}",
                      model=model, lb_domain=1, lb_num=4,
                      data_root=data_root, model_root=model_root,
                      eval_batch=4, patch_override=32, num_eval_iter=2,
                      unroll_steps=2, log_interval=1, amp=0).resolve()
    cfg.max_iterations = 2
    snapshot = os.path.join(model_root, "prostate", f"zoo_{model}") + "/"
    os.makedirs(snapshot, exist_ok=True)
    tr = Trainer(cfg, snapshot, use_mesh=False)
    tr.train()
    assert int(tr.state.step) == 2
    # the step must leave finite params behind
    leaf = next(iter(np.asarray(x) for x in
                     __import__("jax").tree_util.tree_leaves(tr.state.params)))
    assert np.isfinite(leaf).all()
