"""Mesh-parallel correctness: the sharded step must reproduce the
single-device step bit-for-bit-ish (GSPMD inserts collectives; grouped-BN
statistics become cross-replica reductions — same math, different
schedule)."""

import jax
import numpy as np
import pytest

from ust_run_tpu.models import UNet
from ust_run_tpu.parallel import batch_sharding, make_mesh, replicated_sharding
from ust_run_tpu.semisup import create_train_state, make_train_step
from ust_run_tpu.semisup.step import unpack_metrics
from tests.test_train_step import fake_batch, fake_data, tiny_hp

pytestmark = pytest.mark.slow


def test_make_mesh_validates_device_count():
    with pytest.raises(ValueError, match="only"):
        make_mesh(len(jax.devices()) + 1)
    with pytest.raises(ValueError, match="divisor"):
        make_mesh(4, spatial=3)
    with pytest.raises(ValueError, match="positive"):
        make_mesh(0)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_data_only_mesh_8x1_runs():
    """The driver's dryrun shape: 8-way data-parallel, no spatial axis."""
    import dataclasses
    hp = dataclasses.replace(tiny_hp(), label_bs=4, unlabel_bs=4)
    model = UNet(n_channels=hp.channels, n_classes=hp.num_classes)
    mesh = make_mesh(8, spatial=1)
    assert dict(mesh.shape) == {"data": 8, "space": 1}
    repl = replicated_sharding(mesh)
    stepm = make_train_step(model, hp, mesh=mesh,
                            data_sharding=batch_sharding(mesh),
                            repl_sharding=repl)
    sm = jax.device_put(create_train_state(model, hp, seed=0), repl)
    datam = jax.device_put(fake_data(hp), repl)
    sm, mm = stepm(sm, datam, fake_batch(hp))
    m = unpack_metrics(np.asarray(mm), hp)
    assert np.isfinite(float(m["loss"]))
    assert int(sm.step) == 1


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_sharded_step_matches_single_device():
    hp = tiny_hp()
    model = UNet(n_channels=hp.channels, n_classes=hp.num_classes)
    data = fake_data(hp)
    batch = fake_batch(hp)

    # single device
    step1 = make_train_step(model, hp)
    s1 = create_train_state(model, hp, seed=0)
    s1, m1 = step1(s1, data, batch)
    m1 = unpack_metrics(np.asarray(m1), hp)

    # 2-D mesh: 2-way data parallel x 2-way spatial conv partitioning
    mesh = make_mesh(4, spatial=2)
    repl = replicated_sharding(mesh)
    stepm = make_train_step(model, hp, mesh=mesh,
                            data_sharding=batch_sharding(mesh),
                            repl_sharding=repl)
    sm = create_train_state(model, hp, seed=0)
    sm = jax.device_put(sm, repl)
    datam = jax.device_put(data, repl)
    sm, mm = stepm(sm, datam, batch)
    mm = unpack_metrics(np.asarray(mm), hp)

    assert np.isclose(float(m1["loss"]), float(mm["loss"]),
                      rtol=1e-4, atol=1e-5)
    assert np.isclose(float(m1["sup_loss"]), float(mm["sup_loss"]),
                      rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(m1["ulb_dice"], mm["ulb_dice"],
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(s1.params["outc"]["kernel"]),
        np.asarray(sm.params["outc"]["kernel"]), rtol=1e-3, atol=1e-5)
