"""Evaluator correctness: exact padded-tail accounting and mesh-sharded
equivalence (VERDICT r1 item 8).

The reference evaluates with batch_size=1 (train.py:493), so per-domain
loss/dice are plain means over samples. Our padded fixed-batch evaluator
must produce identical numbers for ANY eval batch size, including tails,
and identical numbers again when the forward is sharded over the mesh."""

import logging

import jax
import numpy as np
import pytest

from ust_run_tpu.config import TrainConfig
from ust_run_tpu.data import synthetic
from ust_run_tpu.data.datasets import SegmentationDataset
from ust_run_tpu.data.pipeline import TestLoader
from ust_run_tpu.engine.evaluator import Evaluator
from ust_run_tpu.models import UNet
from ust_run_tpu.parallel import make_mesh
from ust_run_tpu.semisup import HyperParams, create_train_state

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("prost"))
    # 5 test images per domain: batch 4 leaves a 1-sample padded tail
    synthetic.generate("prostate", root, n_train=2, n_test=5, size=48)
    cfg = TrainConfig(dataset="prostate", domain_num=2, patch_override=48,
                      data_root=root).resolve()
    p = cfg.profile()
    hp = HyperParams.from_config(cfg)
    model = UNet(n_channels=p.num_channels, n_classes=p.num_classes)
    state = create_train_state(model, hp, seed=0)
    datasets = [SegmentationDataset("prostate", p, root, "test", -1, [i])
                for i in (1, 2)]
    return hp, model, state, datasets


def _collect(records, caplog):
    return [r.message for r in records if "val_base_dice" in r.message]


def _run(hp, model, state, datasets, batch, mesh=None):
    loaders = [TestLoader(ds, batch) for ds in datasets]
    ev = Evaluator(model, hp, loaders, ["base"], mesh=mesh)
    return ev


def test_tail_batches_are_exact(setup, caplog):
    hp, model, state, datasets = setup
    outs = {}
    for batch in (1, 4):
        ev = _run(hp, model, state, datasets, batch)
        with caplog.at_level(logging.INFO):
            caplog.clear()
            dice = ev.run(state.params, state.batch_stats, 0, ema=False)
        # parse the logged per-domain loss lines for exactness too
        losses = [m.split("loss : ")[1].split("\n")[0]
                  for m in (r.message for r in caplog.records)
                  if "loss :" in m]
        outs[batch] = (np.asarray(dice), [float(x) for x in losses])
    np.testing.assert_allclose(outs[1][0], outs[4][0], rtol=1e-5)
    np.testing.assert_allclose(outs[1][1], outs[4][1], rtol=1e-5)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_indivisible_eval_batch_stays_sharded(setup, caplog):
    """eval_batch=6 on an 8-device mesh: the evaluator pads each dispatch
    batch to the next mesh multiple (VERDICT r3 item 8) instead of
    replicating, and the numbers are unchanged."""
    hp, model, state, datasets = setup
    ev1 = _run(hp, model, state, datasets, 6)
    with caplog.at_level(logging.INFO):
        evm = _run(hp, model, state, datasets, 6,
                   mesh=make_mesh(8, spatial=1))
    assert evm._pad_rows == 2
    assert any("padding dispatch batches" in r.message
               for r in caplog.records)
    d1 = ev1.run(state.params, state.batch_stats, 0, ema=False)
    dm = evm.run(state.params, state.batch_stats, 0, ema=False)
    np.testing.assert_allclose(np.asarray(d1), np.asarray(dm),
                               rtol=1e-5, atol=1e-6)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_sharded_eval_matches_single(setup):
    hp, model, state, datasets = setup
    ev1 = _run(hp, model, state, datasets, 8)
    evm = _run(hp, model, state, datasets, 8, mesh=make_mesh(8, spatial=1))
    d1 = ev1.run(state.params, state.batch_stats, 0, ema=False)
    dm = evm.run(state.params, state.batch_stats, 0, ema=False)
    np.testing.assert_allclose(np.asarray(d1), np.asarray(dm),
                               rtol=1e-5, atol=1e-6)
