"""Quantized-regime accuracy evidence at production geometry (VERDICT #10).

Teacher-student LoRA recovery on the REAL 7B geometry (32 layers, 4096/14336,
seq 2048, 1183 video tokens): a teacher model with nonzero adapters + head
generates BOLD-like targets from synthetic inputs; students with base_quant
in {None(bf16), w8a8, w8a8g8} must recover them through the quantized frozen
base.  Val Pearson r (the metric of record, utils.py:101-110) is reported per
config — equal curves mean the int8 bench headline trains at bf16 quality.

Run:  python scripts/quant_quality_run.py [--steps 150] [--configs bf16,w8a8g8]
Writes one JSON line per config; paste into BENCHMARKS.md.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np


def log(msg):
    print(f"[quantq {time.strftime('%H:%M:%S')}] {msg}", file=sys.stderr, flush=True)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=150)
    ap.add_argument("--batch", type=int, default=6)
    ap.add_argument("--layers", type=int, default=32)
    ap.add_argument("--n-train", type=int, default=8, help="train batches")
    ap.add_argument("--n-val", type=int, default=2)
    ap.add_argument("--eval-every", type=int, default=50)
    ap.add_argument("--configs", default="bf16,w8a8,w8a8g8")
    ap.add_argument("--teacher", default="auto",
                    help="teacher base quant: auto|bf16|w8a8|w8a8g8")
    ap.add_argument("--lr", type=float, default=1e-3)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    from __graft_entry__ import _example_batch
    from phantom_vlb_tpu.models.clip_vit import CLIPVisionConfig
    from phantom_vlb_tpu.models.lora import LoRAConfig
    from phantom_vlb_tpu.models.mistral import MistralConfig
    from phantom_vlb_tpu.models.stc_connector import STCConfig
    from phantom_vlb_tpu.models.videollama2 import (
        VLBConfig, VideoLLaMA2VLB, trainable_predicate, vlb_forward_fn,
    )
    from phantom_vlb_tpu.ops.quant import quantize_tree
    from phantom_vlb_tpu.train.metrics import (
        pearson_compute, pearson_init, pearson_update,
    )
    from phantom_vlb_tpu.train.optim import (
        OptimConfig, make_optimizer, trainable_labels,
    )
    from phantom_vlb_tpu.train.step import init_train_state, make_train_step

    def build_cfg(quant):
        cfg = VLBConfig(
            clip=CLIPVisionConfig(param_dtype=jnp.bfloat16, scan_layers=True,
                                  base_quant=quant),
            stc=STCConfig(param_dtype=jnp.bfloat16),
            mistral=MistralConfig(
                num_hidden_layers=args.layers, param_dtype=jnp.bfloat16,
                lora=LoRAConfig(dropout=0.0), scan_layers=True,
                base_quant=quant,
            ),
            freeze_backbone=False,
            dropout_rate=0.0,
        )
        cfg.validate()
        return cfg

    # ------------------------------------------------------------------
    # Shared synthetic inputs (CPU numpy, deterministic).
    rng = np.random.default_rng(0)
    cfg0 = build_cfg(None)
    g = cfg0.geometry
    batches = []
    for i in range(args.n_train + args.n_val):
        b = dict(_example_batch(g, args.batch, cfg0.mistral.vocab_size))
        # vary language/vision across batches
        b["language"] = np.asarray(b["language"])
        b["vision"] = (
            np.asarray(b["vision"])
            + rng.standard_normal(b["vision"].shape).astype(np.float32) * 0.3
        )
        batches.append(b)

    # ------------------------------------------------------------------
    # Teacher: frozen base + nonzero adapters + random head -> targets.
    # Any FIXED teacher works (students chase its targets); default bf16,
    # but when bf16 isn't among the configs (e.g. 32L, where a bf16 model
    # cannot exist on one 16 GB chip) the teacher uses the first config's
    # quantization so the comparison stays runnable.
    teacher_quant = None
    if args.teacher != "auto":
        teacher_quant = None if args.teacher == "bf16" else args.teacher
    elif "bf16" not in args.configs.split(","):
        teacher_quant = args.configs.split(",")[0]
    if teacher_quant is not None:
        cfg0 = build_cfg(teacher_quant)
    log(f"building teacher ({teacher_quant or 'bf16'}) ...")
    model0 = VideoLLaMA2VLB(cfg0)
    init = jax.jit(lambda key: model0.init(
        key, batches[0]["language"], jnp.asarray(batches[0]["vision"]),
        batches[0]["padvals"], batches[0]["vis_weights"],
        batches[0]["lang_weights"],
    )["params"])
    params0 = init(jax.random.key(0))

    t_rng = np.random.default_rng(7)

    def perturb(path, leaf):
        name = "/".join(str(getattr(p, "key", p)) for p in path)
        if "lora_b" in name:
            return jnp.asarray(
                t_rng.standard_normal(leaf.shape).astype(np.float32)
                * (0.5 / max(1, leaf.shape[0]))
            ).astype(leaf.dtype)
        return leaf

    teacher_params = jax.tree_util.tree_map_with_path(perturb, params0)
    teacher_fwd = jax.jit(
        lambda p, lang, vis, pv, vw, lw: model0.apply(
            {"params": p}, lang, vis, pv, vw, lw, deterministic=True,
        )[0]
    )
    for b in batches:
        pred = teacher_fwd(
            teacher_params, b["language"], jnp.asarray(b["vision"]),
            b["padvals"], b["vis_weights"], b["lang_weights"],
        )
        y = np.asarray(pred, np.float32)
        y = (y - y.mean(0)) / (y.std(0) + 1e-6)
        b["timeseries"] = y + rng.standard_normal(y.shape).astype(np.float32) * 0.3
    log("teacher targets done")

    # NO host round-trip of the weights (7-15 GB through the axon tunnel is
    # tens of minutes): every student re-inits on device with the SAME key —
    # bitwise-identical starting weights — and quantizes device-side.
    del teacher_params, params0

    # ------------------------------------------------------------------
    # Device-side mirror of ops.quant.quantize_tree (same arithmetic, jnp):
    # avoids fetching the multi-GB base to host just to re-upload it.
    def q8_dev(w):
        w32 = w.astype(jnp.float32)
        absmax = jnp.max(jnp.abs(w32), axis=-2, keepdims=True)
        scale = jnp.where(absmax == 0.0, 1.0, absmax / 127.0)
        q = jnp.clip(jnp.rint(w32 / scale), -127, 127).astype(jnp.int8)
        return q, jnp.squeeze(scale, axis=-2)

    def quantize_tree_dev(node, should, prefix=""):
        out = {}
        for k, v in node.items():
            path = f"{prefix}/{k}" if prefix else k
            if (isinstance(v, dict) and "kernel" in v
                    and not isinstance(v["kernel"], dict) and should(path)):
                q, s = q8_dev(v["kernel"])
                nv = {kk: quantize_tree_dev(vv, should, f"{path}/{kk}")
                      if isinstance(vv, dict) else vv
                      for kk, vv in v.items() if kk != "kernel"}
                nv["kernel_q"], nv["kernel_scale"] = q, s
                out[k] = nv
            elif isinstance(v, dict):
                out[k] = quantize_tree_dev(v, should, path)
            else:
                out[k] = v
        return out

    _ = quantize_tree  # host variant kept for reference/tests

    results = []
    for quant_name in args.configs.split(","):
        quant = None if quant_name == "bf16" else quant_name
        cfg = build_cfg(quant)
        model = VideoLLaMA2VLB(cfg)
        # Re-init with the TEACHER's init fn/key: bitwise the teacher's base
        # (students must chase targets through the same base weights).
        params = init(jax.random.key(0))
        if quant is not None and teacher_quant is None:
            targets = ("q_proj", "k_proj", "v_proj", "o_proj",
                       "gate_proj", "up_proj", "down_proj",
                       "out_proj", "fc1", "fc2")
            params = jax.jit(
                lambda p: quantize_tree_dev(
                    p,
                    # mm_projector (STC) is never quantized — its se.fc1/fc2
                    # convs would otherwise match the CLIP fc names.
                    lambda path: "mm_projector" not in path
                    and any(t in path for t in targets),
                ),
                donate_argnums=0,
            )(params)
        labels = trainable_labels(params, trainable_predicate)
        tx = make_optimizer(OptimConfig(lr=args.lr))
        state, frozen = init_train_state(params, tx, labels)
        del params
        step = make_train_step(vlb_forward_fn(model), tx, labels, donate=True)
        key = jax.random.key(3, impl="rbg")

        log(f"[{quant_name}] compiling + training {args.steps} steps ...")
        curve = []
        for it in range(args.steps):
            b = batches[it % args.n_train]
            state, metrics = step(state, frozen, b, jax.random.fold_in(key, it))
            if (it + 1) % args.eval_every == 0 or it == args.steps - 1:
                from phantom_vlb_tpu.train.step import combine_params

                full = combine_params(state.params, frozen)
                pear = pearson_init(cfg.num_target)
                for vb in batches[args.n_train:]:
                    pred = model.apply(
                        {"params": full}, vb["language"],
                        jnp.asarray(vb["vision"]), vb["padvals"],
                        vb["vis_weights"], vb["lang_weights"],
                        deterministic=True,
                    )[0]
                    pear = pearson_update(
                        pear, pred, jnp.asarray(vb["timeseries"]),
                        jnp.ones(args.batch),
                    )
                r = float(np.nanmean(np.asarray(pearson_compute(pear))))
                # Release the combined tree before the next train step /
                # config (a lingering 7.5 GB clone OOMs the next init).
                del full, pear, pred
                curve.append({"step": it + 1, "val_pearson_avg": round(r, 4)})
                log(f"[{quant_name}] step {it + 1}: val pearson {r:.4f}")
        row = {
            "config": quant_name,
            "geometry": f"{args.layers}L/4096/seq2048/batch{args.batch}",
            "curve": curve,
        }
        results.append(row)
        print(json.dumps(row), flush=True)
        del state, frozen, step
        import gc

        gc.collect()

    best = {r["config"]: r["curve"][-1]["val_pearson_avg"] for r in results}
    log(f"final: {best}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
