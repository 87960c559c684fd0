"""Host input pipeline: shuffling, parallel decode/augment workers, device feed.

Replaces the reference's `torch.utils.data.DataLoader(batch_size, shuffle=True,
num_workers=4, drop_last=True)` (`core/datasets.py:324-325`) with a torch-free
pipeline shaped for TPU feeding:

  - Deterministic per-epoch shuffling and per-sample RNG derived from a single seed
    (the reference seeds each torch worker once, `core/datasets.py:96-102`; here
    every sample gets its own child Generator so results are independent of worker
    scheduling).
  - A thread pool decodes + augments samples (cv2/PIL release the GIL for the heavy
    kernels; the native C++ decoders in data/native.py release it entirely).
  - `prefetch_to_device` keeps N batches in flight as device arrays, optionally
    sharded over a mesh 'data' axis — the per-host input split of the SPMD design.
"""

from __future__ import annotations

import collections
import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Dict, Iterator

import numpy as np


def _collate(samples) -> Dict[str, np.ndarray]:
    img1, img2, flow, valid = zip(*samples)
    return {
        "image1": np.stack(img1),
        "image2": np.stack(img2),
        "flow": np.stack(flow),
        "valid": np.stack(valid),
    }


class FlowDataLoader:
    """Iterable over batches of a FlowDataset.

    Yields dict batches {image1, image2 [N,H,W,3] float32 0-255, flow [N,H,W,2],
    valid [N,H,W]} indefinitely (epochs chained), like the reference's training
    loop expects.
    """

    def __init__(
        self,
        dataset,
        batch_size: int,
        shuffle: bool = True,
        num_workers: int = 4,
        drop_last: bool = True,
        seed: int = 1234,
        prefetch_batches: int = 2,
        num_shards: int = 1,
        shard_id: int = 0,
    ):
        """batch_size is the GLOBAL batch size. With num_shards > 1 (multi-host:
        num_shards=jax.process_count(), shard_id=jax.process_index()), every
        process walks the same deterministic global index stream but loads only
        its contiguous batch_size/num_shards slice of each global batch — the
        global batch content and per-sample augmentation RNG are independent of
        the process count, so a multi-host run reproduces the single-host run
        exactly."""
        if num_shards > 1:
            if batch_size % num_shards:
                raise ValueError(
                    f"batch_size {batch_size} not divisible by num_shards {num_shards}"
                )
            if not drop_last:
                raise ValueError("num_shards > 1 requires drop_last=True")
        if not 0 <= shard_id < num_shards:
            raise ValueError(f"shard_id {shard_id} out of range for {num_shards} shards")
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.num_workers = max(1, num_workers)
        self.drop_last = drop_last
        self.seed = seed
        self.prefetch_batches = prefetch_batches
        self.num_shards = num_shards
        self.shard_id = shard_id
        self.local_batch_size = batch_size // num_shards

    def __len__(self):
        n = len(self.dataset) // self.batch_size
        if not self.drop_last and len(self.dataset) % self.batch_size:
            n += 1
        return n

    def _epoch_indices(self, epoch: int) -> np.ndarray:
        idx = np.arange(len(self.dataset))
        if self.shuffle:
            np.random.default_rng((self.seed, epoch)).shuffle(idx)
        if self.drop_last:
            idx = idx[: (len(idx) // self.batch_size) * self.batch_size]
        return idx

    def _load_one(self, epoch: int, index: int):
        rng = np.random.default_rng((self.seed, epoch, int(index)))
        return self.dataset.__getitem__(int(index), rng=rng)

    def epochs(self, skip_batches: int = 0) -> Iterator[Dict[str, np.ndarray]]:
        """Endless batch iterator (epochs chained).

        skip_batches fast-forwards the deterministic index stream without
        loading any data, so a resumed run (trainer step restored to N)
        continues on the exact samples it would have seen — the reference's
        resume restarts the shuffled stream from scratch instead.
        """
        local_bs = self.local_batch_size
        with ThreadPoolExecutor(self.num_workers) as pool:
            pending = collections.deque()
            max_pending = self.prefetch_batches * local_bs

            def index_stream():
                # Walk the global index stream; yield only this shard's slice of
                # each global batch (the whole stream when num_shards == 1).
                e = 0
                skip = skip_batches * self.batch_size
                lo = self.shard_id * local_bs
                while True:
                    idx = self._epoch_indices(e)
                    if skip >= len(idx):
                        skip -= len(idx)
                    elif self.num_shards == 1:
                        for i in idx[skip:]:
                            yield e, i
                        skip = 0
                    else:
                        # skip is a whole number of batches here (skip_batches
                        # counts batches; drop_last makes epochs batch-aligned)
                        for b0 in range(skip, len(idx), self.batch_size):
                            for i in idx[b0 + lo : b0 + lo + local_bs]:
                                yield e, i
                        skip = 0
                    e += 1

            stream = index_stream()
            while True:
                while len(pending) < max_pending + local_bs:
                    e, i = next(stream)
                    pending.append(pool.submit(self._load_one, e, i))
                batch = [pending.popleft().result() for _ in range(local_bs)]
                yield _collate(batch)

    def __iter__(self):
        return self.epochs()


def prefetch_to_device(iterator, size: int = 2, mesh=None):
    """Wrap a host batch iterator with an N-deep device prefetch queue.

    If `mesh` is given, batches are sharded over its 'data' axis (per-host input
    split); otherwise they are placed on the default device.
    """
    import jax

    if mesh is not None:
        from raft_optical_flow_tpu.parallel.mesh import shard_batch

        put = lambda b: shard_batch(b, mesh)  # noqa: E731
    else:
        put = lambda b: jax.tree.map(jax.device_put, b)  # noqa: E731

    q: "queue.Queue" = queue.Queue(maxsize=size)
    sentinel = object()

    def producer():
        # Propagate decode/IO errors to the consumer instead of ending the
        # stream cleanly (a swallowed exception here would surface as a bare
        # StopIteration in the training loop, hiding the real cause).
        try:
            for batch in iterator:
                q.put(put(batch))
            q.put(sentinel)
        except BaseException as exc:  # noqa: BLE001 - re-raised in consumer
            q.put(exc)

    t = threading.Thread(target=producer, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is sentinel:
            return
        if isinstance(item, BaseException):
            raise item
        yield item
