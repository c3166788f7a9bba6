"""Optional Grain-backed input pipeline.

SURVEY.md §2.10 calls for a "Grain-style prefetching loader" in front of the
HDF5 store.  The default loader (data/loader.py) implements that contract
directly; this module additionally exposes the SAME dataset through Google
Grain (`grain.python`) for users who want Grain's deterministic, multi-worker,
checkpointable input pipelines on TPU-VM hosts:

    loader = make_grain_loader(paths, batch_size=5, seed=1234)
    for batch in loader:   # dict of numpy arrays, same keys as Batch
        ...

Worker processes each open their own HDF5 handles (LazyDataset handles are
thread/process-local), so the reference's fork-shared-handle hazard
(SURVEY.md §5.2) does not apply.
"""

from __future__ import annotations

import numpy as np

from phantom_vlb_tpu.data.loader import LazyDataset
from phantom_vlb_tpu.data.schemas import LazySample

__all__ = ["LazyGrainSource", "make_grain_loader", "GrainBatchLoader"]

_DTYPES = {
    "timeseries": np.float32,
    "vision": np.float32,
    "language": np.int32,
    "vis_weights": np.float32,
    "lang_weights": np.float32,
    "padvals": np.int32,
}


class LazyGrainSource:
    """Grain RandomAccessDataSource over lazy-load files."""

    def __init__(self, paths: list[str]):
        self._paths = list(paths)
        self._dataset = None  # opened lazily per worker process

    def _ds(self) -> LazyDataset:
        if self._dataset is None:
            self._dataset = LazyDataset(self._paths)
        return self._dataset

    def __len__(self) -> int:
        return len(self._ds())

    def __getitem__(self, idx: int) -> dict:
        sample = self._ds()[int(idx)]
        return {
            field: np.asarray(getattr(sample, field), _DTYPES[field])
            for field in LazySample.FIELDS
        }

    # Grain pickles the source into workers; drop open handles.
    def __getstate__(self):
        return {"_paths": self._paths, "_dataset": None}

    def __setstate__(self, state):
        self.__dict__.update(state)


def make_grain_loader(
    paths: list[str],
    batch_size: int,
    seed: int = 0,
    shuffle: bool = True,
    num_epochs: int | None = 1,
    worker_count: int = 0,
):
    """A ``grain.python.DataLoader`` yielding dict batches with ``row_mask``."""
    import grain.python as pygrain

    source = LazyGrainSource(paths)
    sampler = pygrain.IndexSampler(
        num_records=len(source),
        shard_options=pygrain.NoSharding(),
        shuffle=shuffle,
        num_epochs=num_epochs,
        seed=seed,
    )

    class _AddMask(pygrain.MapTransform):
        def map(self, item):
            item = dict(item)
            item["row_mask"] = np.float32(1.0)
            return item

    return pygrain.DataLoader(
        data_source=source,
        sampler=sampler,
        operations=[
            _AddMask(),
            pygrain.Batch(batch_size=batch_size, drop_remainder=False),
        ],
        worker_count=worker_count,
    )


class GrainBatchLoader:
    """Trainer-compatible wrapper: fixed-shape batches + ``len()``.

    Drop-in for :class:`phantom_vlb_tpu.data.loader.BatchLoader` backed by
    Grain (``datamodule.loader=grain``): the remainder batch is zero-padded to
    ``batch_size`` with ``row_mask=0`` so every step reuses one compiled
    shape, exactly like the native loader.
    """

    def __init__(
        self,
        paths: list[str],
        batch_size: int,
        seed: int = 0,
        shuffle: bool = True,
        worker_count: int = 0,
    ):
        self._paths = list(paths)
        self.batch_size = int(batch_size)
        self._seed = seed
        self._shuffle = shuffle
        self._worker_count = worker_count
        self._num_samples = len(LazyGrainSource(paths))
        self._epoch = 0

    def __len__(self) -> int:
        return -(-self._num_samples // self.batch_size)

    def __iter__(self):
        # Reshuffle per epoch (seed + epoch), matching the native BatchLoader
        # and the reference torch DataLoader — a fixed seed would replay the
        # identical sample order every epoch (ADVICE.md round 1).
        epoch, self._epoch = self._epoch, self._epoch + 1
        loader = make_grain_loader(
            self._paths, self.batch_size, seed=self._seed + epoch,
            shuffle=self._shuffle, num_epochs=1,
            worker_count=self._worker_count,
        )
        for batch in loader:
            n = batch["row_mask"].shape[0]
            if n != self.batch_size:
                pad = self.batch_size - n
                batch = {
                    k: np.concatenate(
                        [v, np.zeros((pad,) + v.shape[1:], v.dtype)]
                    )
                    for k, v in batch.items()
                }
            yield batch
