"""Batch assembly for training and evaluation.

Replaces the reference's `cycle(DataLoader(shuffle=True, num_workers=2,
drop_last=True))` pattern (train.py:95-105, 490-491). Sampling semantics
match torch's RandomSampler: a fresh permutation each epoch, consecutive
batches, partial trailing batch dropped. Batches are raw uint8 arrays —
augmentation happens on-device inside the jitted step, so host work per
step is a couple of numpy gathers.
"""

import numpy as np


class BatchPipeline:
    """Infinite shuffled batch iterator over a SegmentationDataset."""

    def __init__(self, dataset, batch_size, seed=0):
        self.ds = dataset
        self.bs = batch_size
        if len(dataset) < batch_size:
            # torch drop_last would yield nothing; sample with replacement
            # instead so tiny smoke datasets still train.
            self._small = True
        else:
            self._small = False
        self.rng = np.random.RandomState(seed)
        self._order = None
        self._pos = 0

    def _reshuffle(self):
        self._order = self.rng.permutation(len(self.ds))
        self._pos = 0

    def next_indices(self):
        """Sampled indices only — the training path keeps the decoded
        corpus resident in device HBM and ships just these."""
        if self._small:
            return self.rng.randint(0, len(self.ds), self.bs)
        if self._order is None or self._pos + self.bs > len(self.ds):
            self._reshuffle()
        idx = self._order[self._pos:self._pos + self.bs]
        self._pos += self.bs
        return np.asarray(idx)

    def next(self):
        idx = self.next_indices()
        return {
            "image": self.ds.images[idx],
            "label": self.ds.labels[idx],
            "dc": self.ds.dc[idx],
            "names": [self.ds.names[i] for i in idx],
        }


class TestLoader:
    """Sequential fixed-size padded batches over a test dataset.

    The reference evaluates with batch_size=1 (train.py:493); here samples
    are packed into fixed `batch` chunks (padded at the tail, with a
    validity mask) so the jitted forward compiles once.
    """

    __test__ = False  # keep pytest from collecting this as a test class

    def __init__(self, dataset, batch):
        self.ds = dataset
        self.batch = batch

    def __iter__(self):
        n = len(self.ds)
        for start in range(0, n, self.batch):
            idx = np.arange(start, min(start + self.batch, n))
            pad = self.batch - len(idx)
            pidx = np.concatenate([idx, np.zeros(pad, np.int64)]) if pad \
                else idx
            valid = np.concatenate([np.ones(len(idx), bool),
                                    np.zeros(pad, bool)])
            yield {
                "image": self.ds.images[pidx],
                "label": self.ds.labels[pidx],
                "dc": self.ds.dc[pidx],
                "valid": valid,
                "names": [self.ds.names[i] for i in idx],
            }

    def __len__(self):
        return (len(self.ds) + self.batch - 1) // self.batch
