"""End-to-end trainer/evaluator/checkpoint tests on tiny CPU shapes."""

import logging
import os

import numpy as np
import pytest

from ust_run_tpu.config import TrainConfig
from ust_run_tpu.data import synthetic
from ust_run_tpu.engine import checkpoint as ckpt
from ust_run_tpu.engine.trainer import Trainer

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def tiny_run(tmp_path_factory):
    """Train a tiny model once; all tests share the run + artifacts."""
    data_root = str(tmp_path_factory.mktemp("prost_data"))
    model_root = str(tmp_path_factory.mktemp("model"))
    synthetic.generate("prostate", data_root, n_train=6, n_test=2, size=64)
    # amp=0: XLA:CPU emulates bf16 convolutions at glacial speed — the
    # fp32 path is what every other CPU test exercises and is ~10x
    # faster here; bf16 is covered on the real TPU by the verify drive.
    cfg = TrainConfig(dataset="prostate", save_name="t", lb_domain=1,
                      lb_num=4, data_root=data_root, model_root=model_root,
                      eval_batch=4, patch_override=64, num_eval_iter=2,
                      unroll_steps=2, log_interval=1, amp=0).resolve()
    cfg.max_iterations = 4
    snapshot = os.path.join(model_root, "prostate", "t") + "/"
    os.makedirs(snapshot, exist_ok=True)
    tr = Trainer(cfg, snapshot, use_mesh=False)
    tr.train()
    return cfg, data_root, model_root, tr


def test_trainer_end_to_end_and_resume(tiny_run, caplog):
    cfg, data_root, model_root, tr = tiny_run
    snapshot = os.path.join(model_root, "prostate", "t") + "/"
    # artifacts with the reference's names (train.py:946-958)
    assert os.path.exists(snapshot + "checkpoint.pth")
    assert os.path.exists(snapshot + "unet_avg_dice_best_model.pth")
    assert int(tr.state.step) == 4
    log_txt = open(snapshot + "log.txt").read() if os.path.exists(
        snapshot + "log.txt") else caplog.text
    del log_txt  # log routing depends on basicConfig ownership in pytest

    # resume (--load): restores epoch + state (train.py:542-548)
    cfg2 = TrainConfig(**{f: getattr(cfg, f)
                          for f in cfg.__dataclass_fields__})
    cfg2.load = True
    tr2 = Trainer(cfg2, snapshot, use_mesh=False)
    assert tr2.start_epoch == 2
    assert int(tr2.state.step) == 4
    np.testing.assert_allclose(
        np.asarray(tr2.state.params["outc"]["kernel"]),
        np.asarray(tr.state.params["outc"]["kernel"]))


def test_best_model_roundtrip(tiny_run):
    cfg, data_root, model_root, _tr = tiny_run
    snapshot = os.path.join(model_root, "prostate", "t") + "/"
    payload = ckpt.load_best_model(snapshot + "unet_avg_dice_best_model.pth")
    assert "params" in payload and "batch_stats" in payload
    # usable by the standalone evaluator (test.py path)
    from ust_run_tpu.data.datasets import SegmentationDataset
    from ust_run_tpu.data.pipeline import TestLoader
    from ust_run_tpu.engine.evaluator import Evaluator
    from ust_run_tpu.engine.trainer import build_model
    from ust_run_tpu.semisup import HyperParams
    hp = HyperParams.from_config(cfg)
    model = build_model(cfg)
    loaders = [TestLoader(SegmentationDataset(
        "prostate", cfg.profile(), data_root, "test", -1, [1]), 4)]
    ev = Evaluator(model, hp, loaders, ["base"])
    dice = ev.run(payload["params"], payload["batch_stats"], 1)
    assert len(dice) == 1 and 0.0 <= dice[0] <= 1.0
