"""Assembly: config tree -> loaders, model, trainer (the train.py composition).

Mirrors the reference's Hydra-driven assembly (train.py:7-58): seed, build
datamodule (train/val split), build the model for the selected regime, build
the trainer (callbacks/loggers equivalent), fit.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from phantom_vlb_tpu.core.config import Config
from phantom_vlb_tpu.core.mesh import MeshConfig, build_mesh
from phantom_vlb_tpu.data.loader import (
    BatchLoader,
    LazyDataset,
    expand_lazyload_glob,
    split_train_val,
)
from phantom_vlb_tpu.models.lora import LoRAConfig
from phantom_vlb_tpu.models.videollama2 import (
    VLBConfig,
    VideoLLaMA2VLB,
    trainable_predicate,
    vlb_forward_fn,
)
from phantom_vlb_tpu.parallel.sharding import shard_params
from phantom_vlb_tpu.train.loop import TrainLoopConfig, VLBTrainer
from phantom_vlb_tpu.train.optim import OptimConfig, trainable_labels

__all__ = ["build_loaders", "build_model_config", "build_trainer", "run_training"]


def build_loaders(dm: Config) -> tuple[BatchLoader, BatchLoader, dict]:
    files = expand_lazyload_glob(dm.lazyload_path, list(dm.seasons))
    if not files:
        raise FileNotFoundError(
            f"no lazy-load files match {dm.lazyload_path!r} for seasons {dm.seasons}"
        )
    train_files, val_files = split_train_val(files, int(dm.random_state))
    dset_names = {
        "val_set": [f.rsplit("/", 1)[-1] for f in val_files],
        "train_set": [f.rsplit("/", 1)[-1] for f in train_files],
    }
    if str(dm.get("loader", "native")) == "grain":
        from phantom_vlb_tpu.data.grain_loader import GrainBatchLoader

        train_loader = GrainBatchLoader(
            train_files, batch_size=int(dm.batch_size), shuffle=True,
            seed=int(dm.random_state),
            worker_count=int(dm.get("num_workers", 0)),
        )
        val_loader = GrainBatchLoader(
            val_files, batch_size=int(dm.batch_size),
            shuffle=bool(dm.get("shuffle_val_data", False)),
            seed=int(dm.random_state),
            worker_count=int(dm.get("num_workers", 0)),
        )
        return train_loader, val_loader, dset_names
    train_loader = BatchLoader(
        LazyDataset(train_files),
        batch_size=int(dm.batch_size),
        shuffle=True,
        seed=int(dm.random_state),
        prefetch=int(dm.get("prefetch", 4)),
        num_threads=int(dm.get("num_workers", 4)),
    )
    val_loader = BatchLoader(
        LazyDataset(val_files),
        batch_size=int(dm.batch_size),
        shuffle=bool(dm.get("shuffle_val_data", False)),
        seed=int(dm.random_state),
        prefetch=int(dm.get("prefetch", 4)),
        num_threads=int(dm.get("num_workers", 4)),
    )
    return train_loader, val_loader, dset_names


def build_model_config(m: Config) -> VLBConfig:
    use_lora = bool(m.get("use_lora", False))
    lora = None
    if use_lora:
        lora = LoRAConfig(
            rank=int(m.lora_r),
            alpha=float(m.lora_alpha),
            dropout=float(m.lora_dropout),
            shared_dropout=bool(m.get("lora_shared_dropout", False)),
            dropout_bits=int(m.get("lora_dropout_bits", 32)),
            fused_dropout=bool(m.get("lora_fused_dropout", False)),
        )
    common = dict(
        num_target=int(m.num_target),
        l2_lambda=float(m.l2_lambda),
        dropout_rate=float(m.dropout_rate),
        freeze_backbone=bool(m.get("freeze_backbone", True)),
    )
    # int8 MXU quantization of the frozen base: None | 'int8' | 'w8a8' |
    # 'w8a8g8' (BENCHMARKS.md). Applies to both the LLM base and the CLIP
    # tower; the trainable head/adapters stay bf16/f32.
    base_quant = m.get("base_quant", None) or None
    preset = m.get("preset", "full")
    if preset == "tiny":
        cfg = VLBConfig.tiny(use_lora=use_lora)
        cfg = dataclasses.replace(
            cfg,
            mistral=dataclasses.replace(
                cfg.mistral,
                lora=lora if use_lora else cfg.mistral.lora,
                base_quant=base_quant,
            ),
            clip=dataclasses.replace(cfg.clip, base_quant=base_quant),
            **{k: v for k, v in common.items() if k != "num_target"},
            num_target=cfg.geometry.num_parcels,
        )
        return cfg
    if preset == "full":
        cfg = VLBConfig.full(use_lora=use_lora)
        cfg = dataclasses.replace(
            cfg,
            mistral=dataclasses.replace(cfg.mistral, lora=lora,
                                        base_quant=base_quant),
            clip=dataclasses.replace(cfg.clip, base_quant=base_quant),
            **common,
        )
        cfg.validate()
        return cfg
    raise ValueError(f"unknown model preset {preset!r}")


def init_model_params(model: VideoLLaMA2VLB, geometry, vocab: int, seed: int):
    from __graft_entry__ import _example_batch

    batch = _example_batch(geometry, 1, vocab)
    return model.init(
        jax.random.key(seed),
        batch["language"], batch["vision"], batch["padvals"],
        batch["vis_weights"], batch["lang_weights"],
    )["params"]


def load_pretrained_params(model_cfg: VLBConfig, checkpoint_path: str, params,
                           sd=None):
    """Merge converted VideoLLaMA2 weights into initialized params.

    Accepts an Orbax checkpoint dir of the full param tree, or a directory of
    HF safetensors shards to convert on the fly (models/convert.py).
    ``sd`` optionally supplies a preloaded/lazy key->array mapping for the
    safetensors branch (e.g. ``LazySafetensorsDir`` for streaming, or the
    read-accounting proxy in scripts/parity_real.py).
    """
    from pathlib import Path

    p = Path(checkpoint_path)
    if (p / "_METADATA").exists() or (p / "manifest.ocdbt").exists() or (
        p / "d"
    ).exists():
        import orbax.checkpoint as ocp

        ckpt = ocp.StandardCheckpointer()
        abstract = jax.tree.map(ocp.utils.to_shape_dtype_struct, params)
        return ckpt.restore(p.resolve(), abstract)
    if sd is not None or list(p.glob("*.safetensors")):
        from phantom_vlb_tpu.models.convert import (
            convert_clip_vision,
            convert_mistral,
            convert_stc_connector,
            load_safetensors_dir,
        )

        if sd is None:
            sd = load_safetensors_dir(p)

        def _maybe_quantize(tree, quant, targets):
            # Quantized configs store kernel_q/kernel_scale; the converter
            # yields fp 'kernel' trees, so quantize them before merging —
            # otherwise _merge would silently keep the random-init int8 base.
            if quant is None:
                return tree
            from phantom_vlb_tpu.ops.quant import quantize_tree

            return quantize_tree(
                tree, lambda path, w: any(t in path for t in targets)
            )

        # Structural tripwire (VERDICT round 1: the STC internals are a
        # reconstruction): any checkpoint key under mm_projector that the
        # converter does not consume means a wrong architecture assumption
        # (e.g. BatchNorm running stats instead of LayerNorm2d, different
        # SE placement) — fail loudly instead of silently dropping it.
        _assert_keys_consumed(
            sd, "model.mm_projector.",
            _stc_expected_keys(model_cfg.stc),
        )

        merged = dict(params)
        merged["model"] = _merge(
            params["model"],
            _maybe_quantize(
                convert_mistral(
                    sd,
                    model_cfg.mistral.num_hidden_layers,
                    lm_head=False,
                    scan=model_cfg.mistral.scan_layers,
                    scan_group=model_cfg.mistral.scan_group,
                )["model"],
                model_cfg.mistral.base_quant,
                ("q_proj", "k_proj", "v_proj", "o_proj",
                 "gate_proj", "up_proj", "down_proj"),
            ),
        )
        if any(k.startswith("model.vision_tower") for k in sd):
            merged["vision_tower"] = _merge(
                params["vision_tower"],
                _maybe_quantize(
                    convert_clip_vision(
                        sd,
                        model_cfg.clip.effective_layers
                        if model_cfg.clip.scan_layers
                        else model_cfg.clip.num_hidden_layers,
                        prefix="model.vision_tower.vision_tower.vision_model.",
                        scan=model_cfg.clip.scan_layers,
                    ),
                    model_cfg.clip.base_quant,
                    ("q_proj", "k_proj", "v_proj", "out_proj", "fc1", "fc2"),
                ),
            )
        if any(k.startswith("model.mm_projector") for k in sd):
            merged["mm_projector"] = _merge(
                params["mm_projector"],
                convert_stc_connector(sd, model_cfg.stc.depth, model_cfg.stc.mlp_depth),
            )
        return merged
    raise FileNotFoundError(f"no checkpoint found at {checkpoint_path}")


def _stc_expected_keys(stc_cfg) -> set[str]:
    """Exact key set convert_stc_connector consumes (relative to its prefix)."""
    keys = set()
    # A block carries a 1x1-conv shortcut only when its in/out widths differ
    # (timm Bottleneck downsample rule): stage s1's first block only.
    downsample_blocks = (
        {"s1.b1"} if stc_cfg.encoder_hidden_size != stc_cfg.hidden_size else set()
    )
    for stage in ("s1", "s2"):
        for j in range(stc_cfg.depth):
            p = f"{stage}.b{j + 1}"
            for conv in ("conv1", "conv2", "conv3"):
                keys |= {f"{p}.{conv}.conv.weight", f"{p}.{conv}.bn.weight",
                         f"{p}.{conv}.bn.bias"}
            keys |= {f"{p}.se.fc1.weight", f"{p}.se.fc1.bias",
                     f"{p}.se.fc2.weight", f"{p}.se.fc2.bias"}
            if p in downsample_blocks:
                keys |= {f"{p}.downsample.conv.weight",
                         f"{p}.downsample.bn.weight", f"{p}.downsample.bn.bias"}
    keys |= {"sampler.0.weight", "sampler.0.bias"}
    keys |= {"readout.0.weight", "readout.0.bias"}
    for i in range(1, stc_cfg.mlp_depth):
        keys |= {f"readout.{2 * i}.weight", f"readout.{2 * i}.bias"}
    return keys


def _assert_keys_consumed(sd, prefix: str, expected: set[str]) -> None:
    present = {k[len(prefix):] for k in sd if k.startswith(prefix)}
    if not present:
        return  # subtree absent from the checkpoint (partial shards)
    unconsumed = present - expected
    missing = expected - present
    if unconsumed or missing:
        raise ValueError(
            f"checkpoint/{prefix}* does not match the reconstructed "
            f"architecture: unconsumed keys {sorted(unconsumed)[:8]}..., "
            f"missing keys {sorted(missing)[:8]}... — the STC/connector "
            "reconstruction assumptions (DEVIATIONS.md) do not hold for "
            "this checkpoint."
        )


def _merge(base: Any, override: Any) -> Any:
    if isinstance(base, dict) and isinstance(override, dict):
        return {
            k: _merge(v, override[k]) if k in override else v
            for k, v in base.items()
        }
    base_shape = tuple(getattr(base, "shape", ()))
    over_shape = tuple(np.shape(override))
    if base_shape != over_shape:
        raise ValueError(
            f"pretrained weight shape {over_shape} does not match the "
            f"initialized parameter shape {base_shape} — architecture "
            "reconstruction mismatch."
        )
    return jnp.asarray(override, dtype=getattr(base, "dtype", None))


def build_trainer(config: Config):
    """Full assembly; returns (trainer, train_loader, val_loader)."""
    seed = int(config.random_state)
    np.random.seed(seed)

    train_loader, val_loader, dset_names = build_loaders(config.datamodule)

    model_cfg = build_model_config(config.model)
    model = VideoLLaMA2VLB(model_cfg)
    params = init_model_params(
        model, model_cfg.geometry, model_cfg.mistral.vocab_size, seed
    )
    ckpt_path = config.model.get("checkpoint_path")
    if ckpt_path:
        params = load_pretrained_params(model_cfg, ckpt_path, params)

    mesh_cfg = config.get("mesh", Config())
    env = build_mesh(
        MeshConfig(
            data=int(mesh_cfg.get("data", 1)),
            fsdp=int(mesh_cfg.get("fsdp", -1)),
            tensor=int(mesh_cfg.get("tensor", 1)),
        )
    )
    params, _ = shard_params(params, env)

    # Vision-token cache (data/token_cache.py): precompute the frozen
    # CLIP+STC forward once per clip; epochs then read (V, E) bf16 tokens.
    cache_dir = config.datamodule.get("vision_token_cache")
    if cache_dir:
        if str(config.datamodule.get("loader", "native")) == "grain":
            raise ValueError(
                "vision_token_cache requires the native loader "
                "(datamodule.loader=grain builds its own dataset views)"
            )
        from phantom_vlb_tpu.data.token_cache import attach_token_cache

        attach_token_cache(
            model, params, [train_loader, val_loader],
            os.path.expandvars(str(cache_dir)),
            batch_size=int(config.datamodule.get("batch_size", 6)),
            log=lambda m: print(f"[build] {m}"),
        )

    labels = trainable_labels(params, trainable_predicate)
    optim = config.optim
    optim_cfg = OptimConfig(
        lr=float(optim.lr),
        betas=tuple(optim.betas),
        eps=float(optim.eps),
        weight_decay=float(optim.weight_decay),
        lr_scheduler_name=str(optim.lr_scheduler_name),
        t_max=int(optim.t_max),
        grad_clip=float(optim.get("grad_clip", 1.0)),
    )
    tr = config.trainer
    loop_cfg = TrainLoopConfig(
        max_epochs=int(tr.max_epochs),
        val_check_interval=float(tr.val_check_interval),
        log_every_n_steps=int(tr.log_every_n_steps),
        seed=seed,
        output_dir=str(config.output_dir),
        run_name=str(config.get("run_name", "vlb")),
        num_target=model_cfg.num_target,
        early_stop_patience=int(tr.get("early_stop_patience", 0)),
        early_stop_min_delta=float(tr.get("early_stop_min_delta", 0.0)),
    )
    # Dual loggers like the reference (train.py:32-39): CSV (the brain-maps
    # API) always; Comet when configured; console for interactive runs.
    from phantom_vlb_tpu.utils.logging import CometLoggerSink, ConsoleLogger

    extra_loggers: list = [ConsoleLogger()]
    comet_cfg = config.get("comet", None)
    if comet_cfg and comet_cfg.get("enabled", False):
        extra_loggers.append(
            CometLoggerSink(
                api_key=comet_cfg.get("api_key"),
                workspace=comet_cfg.get("workspace"),
                project=comet_cfg.get("project", "phantom_mm"),
                name=config.get("run_name"),
            )
        )

    trainer = VLBTrainer(
        vlb_forward_fn(model),
        params,
        optim_cfg,
        loop_cfg,
        trainable_label_tree=labels,
        mesh_env=env,
        extra_loggers=extra_loggers,
    )
    # H-params logged twice, like the reference (train.py:35 full config,
    # train.py:50 train/val file lists).
    from phantom_vlb_tpu.core.config import to_dict

    trainer.csv_logger.log_hyperparams(to_dict(config))
    trainer.csv_logger.log_hyperparams(dset_names)
    return trainer, train_loader, val_loader


def run_cached_training(config: Config) -> dict:
    """Frozen-baseline fast path: precompute backbone features once, then
    train only the head over the cache (BASELINE.md config #2;
    train/precompute.py). ~max_epochs x fewer backbone passes than the
    reference recipe with identical math (tested to f16-cache tolerance)."""
    from pathlib import Path

    from phantom_vlb_tpu.models.heads import BrainReadoutHead
    from phantom_vlb_tpu.train.precompute import (
        CachedFeatureLoader,
        build_feature_cache,
        head_forward_fn,
    )

    m = config.model
    assert bool(m.get("freeze_backbone", True)) and not bool(
        m.get("use_lora", False)
    ), "cache_features requires the frozen-baseline regime"

    seed = int(config.random_state)
    np.random.seed(seed)
    train_loader, val_loader, dset_names = build_loaders(config.datamodule)

    model_cfg = build_model_config(m)
    model = VideoLLaMA2VLB(model_cfg)
    params = init_model_params(
        model, model_cfg.geometry, model_cfg.mistral.vocab_size, seed
    )
    ckpt_path = m.get("checkpoint_path")
    if ckpt_path:
        params = load_pretrained_params(model_cfg, ckpt_path, params)

    out_dir = Path(str(config.output_dir))
    out_dir.mkdir(parents=True, exist_ok=True)
    caches = {}
    for split, loader in (("train", train_loader), ("val", val_loader)):
        path = out_dir / f"feature_cache_{split}.h5"
        if not path.exists():
            print(f"building {split} feature cache -> {path}")
            build_feature_cache(model, params, loader, path, model_cfg.geometry)
        caches[split] = path

    batch_size = int(config.datamodule.batch_size)
    cached_train = CachedFeatureLoader(
        caches["train"], batch_size, shuffle=True, seed=seed
    )
    cached_val = CachedFeatureLoader(
        caches["val"], batch_size,
        shuffle=bool(config.datamodule.get("shuffle_val_data", False)),
    )

    head = BrainReadoutHead(
        hidden_size=model_cfg.mistral.hidden_size,
        num_target=model_cfg.num_target,
        l2_lambda=model_cfg.l2_lambda,
        dropout_rate=model_cfg.dropout_rate,
    )
    optim = config.optim
    optim_cfg = OptimConfig(
        lr=float(optim.lr), betas=tuple(optim.betas), eps=float(optim.eps),
        weight_decay=float(optim.weight_decay),
        lr_scheduler_name=str(optim.lr_scheduler_name),
        t_max=int(optim.t_max), grad_clip=float(optim.get("grad_clip", 1.0)),
    )
    tr = config.trainer
    loop_cfg = TrainLoopConfig(
        max_epochs=int(tr.max_epochs),
        val_check_interval=float(tr.val_check_interval),
        log_every_n_steps=int(tr.log_every_n_steps),
        seed=seed,
        output_dir=str(config.output_dir),
        run_name=str(config.get("run_name", "vlb")),
        num_target=model_cfg.num_target,
        early_stop_patience=int(tr.get("early_stop_patience", 0)),
        early_stop_min_delta=float(tr.get("early_stop_min_delta", 0.0)),
    )
    trainer = VLBTrainer(
        head_forward_fn(head), params["head"], optim_cfg, loop_cfg
    )
    trainer.csv_logger.log_hyperparams(dset_names)
    return trainer.fit(cached_train, cached_val)


def run_training(config: Config) -> dict:
    if bool(config.get("model", {}).get("cache_features", False)):
        return run_cached_training(config)
    trainer, train_loader, val_loader = build_trainer(config)
    if bool(config.get("trainer", {}).get("resume", False)):
        if trainer.maybe_resume():
            print(f"resumed from step {trainer.global_step}")
    return trainer.fit(train_loader, val_loader)
