"""Grain-backed input pipeline (optional production backend).

An alternative to data/pipeline.FlowDataLoader built on `grain` (Google's
deterministic, multi-process data loader — the production-grade replacement for
the reference's torch DataLoader workers). Wraps a FlowDataset as a grain
RandomAccessDataSource; decode + augmentation run in grain worker processes with
reproducible per-record RNG derived from (seed, epoch, index).

Use when input pipelines must scale past the thread-pool loader (true process
parallelism, checkpointable iterators):

    loader = GrainFlowLoader(dataset, batch_size=8, num_workers=4, seed=1234)
    for batch in loader:  # dict of numpy arrays, epochs chained
        ...
"""

from __future__ import annotations

from typing import Dict

import numpy as np


class _FlowRecordSource:
    """grain RandomAccessDataSource over a FlowDataset's base records."""

    def __init__(self, dataset, seed: int):
        self._dataset = dataset
        self._seed = seed

    def __len__(self):
        return len(self._dataset)

    def __getitem__(self, index: int):
        rng = np.random.default_rng((self._seed, int(index)))
        img1, img2, flow, valid = self._dataset.__getitem__(int(index), rng=rng)
        return {"image1": img1, "image2": img2, "flow": flow, "valid": valid}


class GrainFlowLoader:
    """Endless batch iterator over a FlowDataset via grain.

    Yields the same dict batches as data/pipeline.FlowDataLoader.
    """

    def __init__(
        self,
        dataset,
        batch_size: int,
        shuffle: bool = True,
        num_workers: int = 4,
        drop_last: bool = True,
        seed: int = 1234,
    ):
        import grain.python as gp

        self._source = _FlowRecordSource(dataset, seed)
        sampler = gp.IndexSampler(
            num_records=len(self._source),
            shard_options=gp.NoSharding(),
            shuffle=shuffle,
            num_epochs=None,  # endless
            seed=seed,
        )
        self._loader = gp.DataLoader(
            data_source=self._source,
            sampler=sampler,
            operations=[gp.Batch(batch_size=batch_size, drop_remainder=drop_last)],
            worker_count=num_workers,
        )

    def __iter__(self):
        for batch in self._loader:
            yield {k: np.asarray(v) for k, v in batch.items()}
