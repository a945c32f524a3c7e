import numpy as np
import pytest

from ust_run_tpu.config import PROFILES
from ust_run_tpu.data import synthetic
from ust_run_tpu.data.datasets import SegmentationDataset, build_manifest
from ust_run_tpu.data.pipeline import BatchPipeline, TestLoader


@pytest.fixture(scope="module")
def fundus_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("fundus")
    synthetic.generate("fundus", str(root), n_train=6, n_test=2, size=64)
    return str(root)


@pytest.fixture(scope="module")
def busi_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("busi")
    synthetic.generate("BUSI", str(root), n_train=8, n_test=2, size=64)
    return str(root)


def test_fundus_split_semantics(fundus_root):
    # labeled = first 2 of domain 1; unlabeled = rest of domain 1 + all others
    lb = build_manifest("fundus", fundus_root, "train", 1, [1],
                        selected_idxs=[0, 1])
    assert len(lb) == 2
    ulb = build_manifest("fundus", fundus_root, "train", 1, [1, 2, 3, 4],
                         selected_idxs=list(range(2, 6)))
    assert len(ulb) == 4 + 6 * 3
    # no overlap between lb and ulb of the labeled domain
    assert not ({r.image_path for r in lb} &
                {r.image_path for r in ulb})
    test = build_manifest("fundus", fundus_root, "test", -1, [2])
    assert len(test) == 2
    assert all(r.domain_code == 2 for r in test)


def test_fundus_dataset_decode(fundus_root):
    ds = SegmentationDataset("fundus", PROFILES["fundus"], fundus_root,
                             "train", 1, [1], selected_idxs=[0, 1, 2])
    assert ds.images.shape == (3, 256, 256, 3)  # fundus resizes to 256
    assert ds.labels.shape == (3, 256, 256, 1)
    assert set(np.unique(ds.labels)).issubset({0, 128, 255})
    assert ds.images.dtype == np.uint8


def test_busi_pairing_and_split(busi_root):
    # 10 samples per domain, last 20% (=2) test, first 8 train
    tr = build_manifest("BUSI", busi_root, "train", -1, [1, 2])
    te = build_manifest("BUSI", busi_root, "test", -1, [1, 2])
    assert len(tr) == 16 and len(te) == 4
    assert all("mask" not in r.image_path for r in tr)
    assert all(all("mask" in m for m in r.mask_paths) for r in tr)
    ds = SegmentationDataset("BUSI", PROFILES["BUSI"], busi_root,
                             "test", -1, [1])
    assert ds.images.shape[1:] == (256, 256, 1)
    assert set(np.unique(ds.labels)).issubset({0, 255})


def test_batch_pipeline_epoch_shuffle(fundus_root):
    ds = SegmentationDataset("fundus", PROFILES["fundus"], fundus_root,
                             "train", -1, [1])  # 6 samples
    pipe = BatchPipeline(ds, 2, seed=0)
    seen = []
    for _ in range(3):  # one epoch of 3 batches
        b = pipe.next()
        assert b["image"].shape == (2, 256, 256, 3)
        seen.extend(b["names"])
    assert sorted(seen) == sorted(ds.names)  # full epoch, no repeats
    # next epoch reshuffles
    again = [pipe.next()["names"] for _ in range(3)]
    assert sorted(n for bn in again for n in bn) == sorted(ds.names)


def test_batch_pipeline_small_dataset():
    class Tiny:
        images = np.zeros((2, 8, 8, 1), np.uint8)
        labels = np.zeros((2, 8, 8, 1), np.uint8)
        dc = np.ones(2, np.int32)
        names = ["a", "b"]

        def __len__(self):
            return 2

    pipe = BatchPipeline(Tiny(), 4, seed=0)
    b = pipe.next()
    assert b["image"].shape[0] == 4  # samples with replacement


def test_test_loader_padding(fundus_root):
    ds = SegmentationDataset("fundus", PROFILES["fundus"], fundus_root,
                             "test", -1, [1])  # 2 samples
    loader = TestLoader(ds, batch=8)
    batches = list(loader)
    assert len(batches) == 1
    assert batches[0]["image"].shape == (8, 256, 256, 3)
    assert batches[0]["valid"].sum() == 2


def test_mnms_three_channel_masks(tmp_path):
    root = tmp_path / "mnms"
    synthetic.generate("MNMS", str(root), n_train=2, n_test=1, size=64)
    ds = SegmentationDataset("MNMS", PROFILES["MNMS"], str(root),
                             "train", -1, [1, 2])
    assert ds.labels.shape[-1] == 3
    assert ds.images.shape[1:] == (288, 288, 1)


def test_prostate_no_resize(tmp_path):
    root = tmp_path / "prost"
    synthetic.generate("prostate", str(root), n_train=2, n_test=1, size=96)
    ds = SegmentationDataset("prostate", PROFILES["prostate"], str(root),
                             "train", -1, [1])
    # prostate keeps native resolution (dataloader.py:222-231: no resize)
    assert ds.images.shape[1:] == (96, 96, 1)
