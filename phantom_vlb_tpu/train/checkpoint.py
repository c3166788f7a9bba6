"""Orbax checkpointing: best-on-val + last, plus adapter-only export.

Reference behavior (train.py:20-27, :58): Lightning ``ModelCheckpoint``
monitoring ``val/brain_loss`` (min), filename
``best_brainloss_{epoch}-{step}``, ``save_last=True``, plus a final full save.
The acknowledged TODO at train.py:60 — save only LoRA adapters when using
LoRA — is implemented here as :func:`export_adapters`.

Checkpoints are sharded by construction: Orbax saves each param with its live
sharding, so an FSDP-sharded state never gathers onto one host (the property
the reference's graveyard chased with ``state_dict_type="sharded"``,
fsdp.yaml:12).
"""

from __future__ import annotations

from pathlib import Path
from typing import Any, Callable

import jax
import orbax.checkpoint as ocp

__all__ = ["CheckpointManager", "export_adapters", "load_adapters"]


class CheckpointManager:
    """best/last checkpoint policy over an Orbax StandardCheckpointer."""

    def __init__(self, directory: str | Path):
        self.directory = Path(directory).resolve()
        self.directory.mkdir(parents=True, exist_ok=True)
        self._ckpt = ocp.StandardCheckpointer()
        self.best_metric = float("inf")
        self.best_path: Path | None = None

    def save(self, name: str, state: Any, overwrite: bool = True) -> Path:
        path = self.directory / name
        if path.exists() and overwrite:
            import shutil

            shutil.rmtree(path)
        self._ckpt.save(path, state)
        self._ckpt.wait_until_finished()
        return path

    def save_on_validation(
        self, state: Any, metric: float, epoch: int, step: int
    ) -> bool:
        """Save ``best_brainloss_<epoch>-<step>`` when the metric improves."""
        improved = metric < self.best_metric
        if improved:
            if self.best_path is not None and self.best_path.exists():
                import shutil

                shutil.rmtree(self.best_path)
            self.best_metric = metric
            self.best_path = self.save(f"best_brainloss_{epoch}-{step}", state)
        return improved

    def save_last(self, state: Any) -> Path:
        return self.save("last", state)

    def save_metadata(self, meta: dict) -> None:
        """Persist small host-side trainer state (early-stop window, best
        metric) alongside the checkpoints, so a preempted-and-resumed run
        does not reset its patience window or re-save a worse 'best'
        (ADVICE round 3)."""
        import json

        (self.directory / "trainer_state.json").write_text(json.dumps(meta))

    def load_metadata(self) -> dict:
        import json

        path = self.directory / "trainer_state.json"
        if not path.exists():
            return {}
        try:
            return json.loads(path.read_text())
        except ValueError:
            return {}

    def restore(self, name: str, target: Any) -> Any:
        """Restore into the structure/shardings of ``target``."""
        return self.restore_path(self.directory / name, target)

    def restore_path(self, path, target: Any) -> Any:
        """Restore from an arbitrary checkpoint directory."""
        from pathlib import Path as _P

        abstract = jax.tree.map(ocp.utils.to_shape_dtype_struct, target)
        return self._ckpt.restore(_P(path).resolve(), abstract)


def _filter_tree(tree: Any, keep: Callable[[str], bool], prefix: str = "") -> Any:
    """Keep leaves whose '/'-joined path satisfies ``keep``; prune empties."""
    if isinstance(tree, dict):
        out = {}
        for k, v in tree.items():
            path = f"{prefix}/{k}" if prefix else str(k)
            sub = _filter_tree(v, keep, path)
            if sub is not None:
                out[k] = sub
        return out or None
    return tree if keep(prefix) else None


def export_adapters(
    params: Any,
    path: str | Path,
    keep: Callable[[str], bool],
) -> Any:
    """Save only the param subtree selected by ``keep`` (e.g. LoRA + head)."""
    subtree = _filter_tree(params, keep)
    if subtree is None:
        raise ValueError("adapter filter selected no parameters")
    ckpt = ocp.StandardCheckpointer()
    path = Path(path).resolve()
    ckpt.save(path, subtree)
    ckpt.wait_until_finished()
    return subtree


def load_adapters(params: Any, path: str | Path, keep: Callable[[str], bool]) -> Any:
    """Merge an adapter checkpoint back into a full param tree."""
    subtree = _filter_tree(params, keep)
    abstract = jax.tree.map(ocp.utils.to_shape_dtype_struct, subtree)
    ckpt = ocp.StandardCheckpointer()
    restored = ckpt.restore(Path(path).resolve(), abstract)

    def merge(full: Any, sub: Any) -> Any:
        if isinstance(full, dict):
            return {
                k: merge(v, sub[k]) if isinstance(sub, dict) and k in sub else v
                for k, v in full.items()
            }
        return sub if sub is not None else full

    return merge(params, restored)
