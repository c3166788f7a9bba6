"""Vision-token cache: run the frozen CLIP+STC pipeline ONCE per clip.

Both reference training regimes freeze the vision tower AND the mm_projector
(videollama2_vlb_litmodule.py:86-99 for the baseline; peft's get_peft_model +
the ``multimodal_keywords`` exclusion at litmodule.py:45 for LoRA), so the
(num_vis_tokens, 4096) video tokens are a pure function of each clip's
frames.  The reference nevertheless recomputes the full vision forward every
step of every epoch.  This module precomputes the tokens once per dataset
into an HDF5 sidecar (bf16 stored as uint16 bit patterns — lossless) and
swaps the loader's pixel reads for token reads; training epochs then skip
~300 ms/step of frozen vision compute at the production geometry
(BENCHMARKS.md round-2 table) with bitwise-identical LLM inputs.

The sidecar is keyed by a content-aware dataset fingerprint: file paths,
per-file sample counts, per-file size+mtime stats, a per-file content crc32
(dset_len + first/last sample vision bytes — catches mtime-preserving copies
of regenerated features), the token geometry, AND a digest of the
vision-tower/mm_projector weights (per-leaf shape/dtype/sum/abs-sum moments).
Regenerating same-shaped feature files or converting different vision
weights therefore invalidates the cache automatically — no manual deletion
needed.  (mtime stays in the key as a conservative backstop: a bare
``touch`` rebuilds a cache it didn't need to, which is safe; the crc samples
only the boundary tensors, which a changed-in-the-middle-only regeneration
could in principle evade.)
"""

from __future__ import annotations

import dataclasses
import hashlib
import json
from pathlib import Path

import h5py
import jax
import jax.numpy as jnp
import ml_dtypes
import numpy as np

from phantom_vlb_tpu.data.loader import LazyDataset
from phantom_vlb_tpu.data.schemas import LazySample

__all__ = [
    "dataset_fingerprint",
    "weights_digest",
    "build_token_cache",
    "TokenCachedDataset",
    "attach_token_cache",
]


def weights_digest(params_subtree) -> str:
    """Cheap content digest of a param subtree (vision tower + projector).

    Hashes every leaf's path, shape, dtype and two f32 moments (sum,
    abs-sum) — computed in one jitted pass so only a handful of scalars
    leave the device even for the full-width frozen tower.  Any weight
    change that survives both moments unchanged at f32 is beyond what a
    cache key can reasonably guard.
    """
    leaves = jax.tree_util.tree_leaves_with_path(params_subtree)

    @jax.jit
    def moments(tree):
        return [
            (jnp.sum(x, dtype=jnp.float32), jnp.sum(jnp.abs(x), dtype=jnp.float32))
            for x in jax.tree_util.tree_leaves(tree)
        ]

    stats = jax.device_get(moments(params_subtree))
    entries = [
        [jax.tree_util.keystr(path), list(np.shape(leaf)), str(np.asarray(leaf).dtype)
         if not hasattr(leaf, "dtype") else str(leaf.dtype),
         float(s), float(a)]
        for (path, leaf), (s, a) in zip(leaves, stats)
    ]
    return hashlib.sha256(json.dumps(entries, sort_keys=True).encode()).hexdigest()[:16]


def _content_crc(path) -> int:
    """crc32 of ``dset_len`` + the first and last samples' vision bytes.

    Size+mtime stats alone miss an mtime-preserving copy of regenerated
    features (``cp -p`` from another build); sampling the two boundary
    vision tensors (~32 MB/file at production geometry, read once per cache
    attach) catches any regeneration whose values actually changed
    (VERDICT round 3, ask 6).
    """
    import zlib

    with h5py.File(path, "r") as f:
        n = int(np.asarray(f["dset_len"])[0])
        crc = zlib.crc32(str(n).encode())
        for idx in sorted({0, max(n - 1, 0)}):
            vision = np.ascontiguousarray(f[f"{idx}/{idx}_vision"][...])
            crc = zlib.crc32(vision.tobytes(), crc)
    return crc


def _file_stats(paths) -> list[list]:
    out = []
    for p in paths:
        st = Path(p).stat()
        out.append([Path(p).name, int(st.st_size), int(st.st_mtime_ns),
                    _content_crc(p)])
    return out


def dataset_fingerprint(dataset: LazyDataset, num_vis_tokens: int,
                        hidden_size: int, weights: str = "") -> str:
    payload = json.dumps(
        {
            "paths": [Path(p).name for p in dataset.paths],
            "stats": _file_stats(dataset.paths),
            "ranges": dataset.ranges,
            "tokens": [num_vis_tokens, hidden_size],
            "weights": weights,
        },
        sort_keys=True,
    )
    return hashlib.sha256(payload.encode()).hexdigest()[:16]


def build_token_cache(
    model,
    params,
    dataset: LazyDataset,
    path: str | Path,
    *,
    batch_size: int = 6,
    log=None,
) -> Path:
    """Sweep ``dataset`` through the frozen vision path; write the sidecar.

    Layout: root dataset ``tokens`` (N, V, E) uint16 (bf16 bits), chunked per
    sample; attrs ``fingerprint``.  Returns the path (no-op if a cache with
    the matching fingerprint already exists).
    """
    path = Path(path)
    vision_params = {
        "vision_tower": params["vision_tower"],
        "mm_projector": params["mm_projector"],
    }

    probe = dataset[0]
    n = len(dataset)

    @jax.jit
    def encode(video):
        return model.apply(
            {"params": vision_params}, video,
            method=type(model).encode_video,
        ).astype(jnp.bfloat16)

    # Token geometry from one traced shape (avoids a device forward).
    v_tokens, hidden = jax.eval_shape(
        encode, jax.ShapeDtypeStruct((1, *probe.vision.shape), jnp.float32)
    ).shape[1:]
    fp = dataset_fingerprint(dataset, v_tokens, hidden,
                             weights=weights_digest(vision_params))
    if path.exists():
        with h5py.File(path, "r") as f:
            if f.attrs.get("fingerprint") == fp:
                return path
        path.unlink()  # stale cache: rebuild

    path.parent.mkdir(parents=True, exist_ok=True)
    tmp = path.with_suffix(".building")
    with h5py.File(tmp, "w") as f:
        out = f.create_dataset(
            "tokens", shape=(n, v_tokens, hidden), dtype=np.uint16,
            chunks=(1, v_tokens, hidden),
        )
        for start in range(0, n, batch_size):
            rows = list(range(start, min(start + batch_size, n)))
            pixels = np.stack([
                np.asarray(dataset[i].vision, np.float32) for i in rows
            ])
            if len(rows) < batch_size:  # pad to the compiled shape
                pixels = np.concatenate(
                    [pixels, np.repeat(pixels[-1:], batch_size - len(rows), 0)]
                )
            toks = np.asarray(encode(jnp.asarray(pixels)))
            out[rows[0]:rows[-1] + 1] = toks[: len(rows)].view(np.uint16)
            if log and (start // batch_size) % 50 == 0:
                log(f"token cache: {rows[-1] + 1}/{n}")
        f.attrs["fingerprint"] = fp
    tmp.rename(path)
    return path


class TokenCachedDataset:
    """LazyDataset view whose ``vision`` field is the cached (V, E) tokens.

    Pixel reads are skipped entirely (the 16 MB/clip frame tensors are the
    bulk of the lazyload IO); tokens come back as ml_dtypes.bfloat16 numpy
    arrays, which collate and ``jax.device_put`` pass through unconverted.
    """

    def __init__(self, base: LazyDataset, cache_path: str | Path):
        self.base = base
        self.cache_path = str(cache_path)
        import threading

        self._local = threading.local()

    def __len__(self) -> int:
        return len(self.base)

    def _cache(self) -> h5py.File:
        if not hasattr(self._local, "f"):
            self._local.f = h5py.File(self.cache_path, "r")
        return self._local.f

    def __getitem__(self, idx: int) -> LazySample:
        i, local_idx = self.base._locate(idx)
        f = self.base._files()[i]
        g = f[f"{local_idx}"]
        fields = {
            field: np.asarray(g[f"{local_idx}_{field}"])
            for field in LazySample.FIELDS
            if field != "vision"
        }
        tokens = np.asarray(self._cache()["tokens"][idx]).view(ml_dtypes.bfloat16)
        return LazySample(vision=tokens, **fields)


def attach_token_cache(model, params, loaders, cache_dir: str | Path,
                       *, batch_size: int = 6, log=None) -> None:
    """Build sidecars for each loader's dataset and swap in cached views.

    ``loaders``: BatchLoader instances over LazyDataset (the native path;
    the opt-in grain loader is not supported — configs reject the combo).
    """
    cache_dir = Path(cache_dir)
    for loader in loaders:
        base = loader.dataset
        if isinstance(base, TokenCachedDataset):  # already attached
            continue
        fp_name = dataset_fingerprint(base, 0, 0)[:8]
        path = build_token_cache(
            model, params, base, cache_dir / f"vision_tokens_{fp_name}.h5",
            batch_size=batch_size, log=log,
        )
        loader.dataset = TokenCachedDataset(base, path)
