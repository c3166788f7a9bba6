"""Host-side data pipeline: lazy HDF5 reading, batching, prefetch.

Replaces the reference's torch ``DataLoader`` + 39 worker processes
(datamodule.py:190-238) with a TPU-idiomatic host pipeline:

- files stay open in the reader (like VLB_Dataset, datamodule.py:83-93) but
  are opened lazily *per thread* so background prefetch threads never share
  h5py handles (the reference shares parent handles into forked workers —
  the latent race called out in SURVEY.md §5.2);
- batches are fixed-shape numpy structs (padded + row-validity mask, so jit
  never sees a dynamic batch dimension);
- a bounded background thread pool prefetches and collates ahead of the
  device step, and the train loop overlaps host->HBM transfer via
  ``jax.device_put`` on the next batch while the current step runs.

Split semantics reproduce datamodule.py:130-153 exactly: validation = one
file chosen by ``np.random.RandomState(random_state).choice`` over the sorted
glob expansion; train = the rest.
"""

from __future__ import annotations

import dataclasses
import glob as globlib
import os
import queue
import threading
from pathlib import Path
from typing import Iterator

import h5py
import numpy as np

from phantom_vlb_tpu.data.schemas import LazySample

__all__ = [
    "LazyDataset",
    "Batch",
    "BatchLoader",
    "expand_lazyload_glob",
    "split_train_val",
]


def expand_lazyload_glob(pattern: str, seasons: list[str]) -> list[str]:
    """Expand a ``.../friends_llFile_{subject}_s*_n*.h5`` pattern per season.

    Mirrors datamodule.py:136-139: ``$SCRATCH_PATH`` comes from the
    environment and the ``s*`` wildcard is substituted per season before
    globbing; per-season lists are sorted then concatenated.
    """
    f_list: list[str] = []
    for s in seasons:
        pat = pattern
        if "$SCRATCH_PATH" in pat:
            pat = pat.replace("$SCRATCH_PATH", os.environ["SCRATCH_PATH"])
        pat = pat.replace("s*", f"{s}")
        f_list += sorted(globlib.glob(pat))
    return f_list


def split_train_val(files: list[str], random_state: int) -> tuple[list[str], list[str]]:
    """val = 1 RandomState-chosen file, train = rest (datamodule.py:141-145)."""
    r = np.random.RandomState(random_state)
    val_file = r.choice(files, 1).tolist()
    train_files = [x for x in files if x not in val_file]
    return train_files, val_file


class LazyDataset:
    """Concatenated view over lazy-load HDF5 files with thread-local handles."""

    def __init__(self, paths: list[str]):
        if not paths:
            raise ValueError("no lazy-load files given")
        self.paths = [str(Path(p)) for p in paths]
        self._local = threading.local()

        self.ranges: list[tuple[int, int]] = []
        self.length = 0
        for p in self.paths:
            with h5py.File(p, "r") as f:
                n = int(np.asarray(f["dset_len"])[0])
            self.ranges.append((self.length, self.length + n))
            self.length += n

    def _files(self) -> list[h5py.File]:
        if not hasattr(self._local, "files"):
            self._local.files = [h5py.File(p, "r") for p in self.paths]
        return self._local.files

    def close(self) -> None:
        """Close this thread's handles (other threads' close on GC)."""
        for f in getattr(self._local, "files", []):
            try:
                f.close()
            except Exception:
                pass
        if hasattr(self._local, "files"):
            del self._local.files

    def __len__(self) -> int:
        return self.length

    def _locate(self, idx: int) -> tuple[int, int]:
        for i, (lo, hi) in enumerate(self.ranges):
            if lo <= idx < hi:
                return i, idx - lo
        raise IndexError(idx)

    def __getitem__(self, idx: int) -> LazySample:
        i, local_idx = self._locate(idx)
        f = self._files()[i]
        g = f[f"{local_idx}"]
        return LazySample(
            **{
                field: np.asarray(g[f"{local_idx}_{field}"])
                for field in LazySample.FIELDS
            }
        )


@dataclasses.dataclass
class Batch:
    """Fixed-shape host batch. ``row_mask`` marks real (non-padding) rows."""

    timeseries: np.ndarray    # (B, num_parcels) f32
    vision: np.ndarray        # (B, F, 3, H, W) f32
    language: np.ndarray      # (B, L) i32
    vis_weights: np.ndarray   # (B, D) f32
    lang_weights: np.ndarray  # (B, W) f32
    padvals: np.ndarray       # (B, 3) i32
    row_mask: np.ndarray      # (B,) f32

    def as_dict(self) -> dict[str, np.ndarray]:
        return dataclasses.asdict(self)


def _collate(samples: list[LazySample], batch_size: int) -> Batch:
    n = len(samples)
    pad = batch_size - n

    def stack(field: str, dtype) -> np.ndarray:
        arr = np.stack([np.asarray(getattr(s, field)) for s in samples]).astype(dtype)
        if pad:
            arr = np.concatenate([arr, np.repeat(arr[-1:], pad, axis=0)], axis=0)
        return arr

    return Batch(
        timeseries=stack("timeseries", np.float32),
        # Pixel samples are f32; vision-token-cache samples are bf16 (V, E)
        # tokens (data/token_cache.py) — keep their dtype through collation.
        vision=stack("vision", samples[0].vision.dtype),
        language=stack("language", np.int32),
        vis_weights=stack("vis_weights", np.float32),
        lang_weights=stack("lang_weights", np.float32),
        padvals=stack("padvals", np.int32),
        row_mask=np.concatenate(
            [np.ones(n, np.float32), np.zeros(pad, np.float32)]
        ),
    )


class BatchLoader:
    """Shuffling, prefetching batch iterator over a :class:`LazyDataset`."""

    def __init__(
        self,
        dataset: LazyDataset,
        batch_size: int,
        shuffle: bool = True,
        seed: int = 0,
        drop_last: bool = False,
        prefetch: int = 4,
        num_threads: int = 4,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.drop_last = drop_last
        self.prefetch = prefetch
        self.num_threads = max(1, num_threads)
        self._epoch = 0

    def __len__(self) -> int:
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def _batch_indices(self) -> list[np.ndarray]:
        idx = np.arange(len(self.dataset))
        if self.shuffle:
            rng = np.random.default_rng(self.seed + self._epoch)
            rng.shuffle(idx)
        n_full = len(idx) // self.batch_size
        batches = [
            idx[i * self.batch_size : (i + 1) * self.batch_size]
            for i in range(n_full)
        ]
        rem = idx[n_full * self.batch_size :]
        if len(rem) and not self.drop_last:
            batches.append(rem)
        return batches

    def __iter__(self) -> Iterator[Batch]:
        batches = self._batch_indices()
        self._epoch += 1
        if self.prefetch <= 0:
            for b in batches:
                yield _collate([self.dataset[int(i)] for i in b], self.batch_size)
            return
        yield from self._prefetch_iter(batches)

    def _prefetch_iter(self, batches: list[np.ndarray]) -> Iterator[Batch]:
        """Ordered multi-threaded prefetch with a bounded queue."""
        results: dict[int, Batch] = {}
        results_lock = threading.Condition()
        task_q: "queue.Queue[tuple[int, np.ndarray] | None]" = queue.Queue()
        stop = threading.Event()
        # Bound total in-flight work so memory stays flat.
        inflight = threading.Semaphore(self.prefetch + self.num_threads)

        for item in enumerate(batches):
            task_q.put(item)
        for _ in range(self.num_threads):
            task_q.put(None)

        def worker():
            while not stop.is_set():
                item = task_q.get()
                if item is None:
                    return
                bi, indices = item
                inflight.acquire()
                if stop.is_set():
                    return
                batch = _collate(
                    [self.dataset[int(i)] for i in indices], self.batch_size
                )
                with results_lock:
                    results[bi] = batch
                    results_lock.notify_all()

        threads = [
            threading.Thread(target=worker, daemon=True)
            for _ in range(self.num_threads)
        ]
        for t in threads:
            t.start()
        try:
            for bi in range(len(batches)):
                with results_lock:
                    while bi not in results:
                        results_lock.wait(timeout=60.0)
                    batch = results.pop(bi)
                inflight.release()
                yield batch
        finally:
            stop.set()
            # Unblock any workers parked on the semaphore.
            for _ in threads:
                inflight.release()
