import numpy as np
import pytest

from ust_run_tpu.models import UNet
from ust_run_tpu.semisup import create_train_state
from ust_run_tpu.semisup.step import make_train_multi_step, unpack_metrics
from tests.test_train_step import fake_batch, fake_data, tiny_hp

pytestmark = pytest.mark.slow


def test_multi_step_equals_k_steps():
    hp = tiny_hp()
    model = UNet(n_channels=hp.channels, n_classes=hp.num_classes)
    k = 3
    multi = make_train_multi_step(model, hp)
    state = create_train_state(model, hp, seed=0)
    batches = [fake_batch(hp, seed=s) for s in range(k)]
    stacked = {key: np.stack([b[key] for b in batches])
               for key in batches[0]}
    new_state, metrics = multi(state, fake_data(hp), stacked)
    arr = np.asarray(metrics)
    assert arr.shape[0] == k
    assert int(new_state.step) == k
    for j in range(k):
        m = unpack_metrics(arr[j], hp)
        assert np.isfinite(float(m["loss"]))
    # losses should decrease-ish over the scan (learning sanity)
    m0 = unpack_metrics(arr[0], hp)
    mk = unpack_metrics(arr[k - 1], hp)
    assert float(mk["sup_loss"]) < float(m0["sup_loss"]) * 2
