"""Planted-HRF plateau evidence at production geometry (VERDICT r2 ask 5).

Unlike the teacher-student proxy (scripts/quant_quality_run.py), the target
here is defined by the stimulus as seen by the FROZEN vision tower — never
by any trained parameter: per clip

    z[b]   = sum_f vis_w[b, f] * mean_t tok[b, f, t] @ R     (K latent dims)
    y[b]   = zscore(z[b] @ P) + sigma * eps                  (num_parcels ROIs)

where tok[b, f, t] are the CLIP+STC video tokens of ds-frame f (the vision
tower is frozen in EVERY reference regime — litmodule.py:95-99 — so z is a
deterministic stimulus feature, independent of everything that trains), the
HRF lag weights vis_w mirror the reference target construction
(videollama2_vlb_lazyloading.py:108-131, weight layout litmodule.py:178-203),
and the KNOWN noise ceiling is r_max = 1/sqrt(1 + sigma^2).

Feature level chosen by measurement (/tmp/plant_probe.py, 900 clips, 16L):
ridge from the head's exact input (LN -> HRF-mask pooled rep) recovers a
token-level code at val r ~ 0.82-0.85 from as few as 96 train clips, while
raw-pixel and token-EMBEDDING codes are NOT linearly recoverable through a
random-init frozen backbone (r ~ 0 at every sample count) — pixel programs
do not survive 16 layers of random mixing, so planting there would measure
nothing.  The token level keeps the task de-circularized (frozen untrained
weights define the feature; LoRA + head must recover it) with a linear
ceiling high enough to watch a plateau.

Each config trains the RECIPE-OF-RECORD path: real VLBTrainer loop (epochs,
val cadence, early stopping on val/brain_loss), real per-ROI streaming
Pearson, LoRA + head trainable, vision-token cache, AdamW + cosine at the
reference lr.  Reported per config: val_corr_avg / val brain-loss curves,
the early-stop trigger step, and walltime — bf16 vs int8 curves coinciding
is the evidence that quantization does not delay time-to-plateau, which is
what the "v5e-8 + early stopping in ~1 h" projection (BENCHMARKS.md) needs.

Run (real TPU):
  python scripts/plateau_run.py --layers 16 --configs bf16,w8a8g8
  python scripts/plateau_run.py --layers 32 --configs w8a8g8

Writes one JSON line per config; paste into BENCHMARKS.md.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np

# Runnable as `python scripts/plateau_run.py` without PYTHONPATH.
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def log(msg):
    print(f"[plateau {time.strftime('%H:%M:%S')}] {msg}", file=sys.stderr, flush=True)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--layers", type=int, default=16)
    ap.add_argument("--batch", type=int, default=6)
    ap.add_argument("--train-batches", type=int, default=16)
    ap.add_argument("--val-batches", type=int, default=3)
    ap.add_argument("--max-epochs", type=int, default=20)
    ap.add_argument("--patience", type=int, default=3,
                    help="early-stop patience in validations (0 = off)")
    ap.add_argument("--min-delta", type=float, default=1e-4)
    ap.add_argument("--noise", type=float, default=0.3,
                    help="target noise sigma (ceiling r = 1/sqrt(1+s^2))")
    ap.add_argument("--latent", type=int, default=32, help="planted latent dims")
    ap.add_argument("--configs", default="bf16,w8a8g8")
    ap.add_argument("--lr", type=float, default=1e-4,
                    help="recipe-of-record lr (train/optim.py OptimConfig)")
    ap.add_argument("--out", default="/tmp/plateau")
    ap.add_argument("--plant", choices=("token", "self"), default="token",
                    help="token: stimulus code via the shared bf16 vision "
                         "tokens (de-circularized, but its linear ceiling "
                         "collapses through a QUANTIZED random backbone); "
                         "self: code planted in each config's own frozen "
                         "pooled rep (same ceiling per config by "
                         "construction -> fair time-to-plateau comparison)")
    ap.add_argument("--probe", action="store_true",
                    help="closed-form ridge achievability probe only")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    from phantom_vlb_tpu.data.synthetic import synth_language_row
    from phantom_vlb_tpu.models.clip_vit import CLIPVisionConfig
    from phantom_vlb_tpu.models.lora import LoRAConfig
    from phantom_vlb_tpu.models.mistral import MistralConfig
    from phantom_vlb_tpu.models.stc_connector import STCConfig
    from phantom_vlb_tpu.models.videollama2 import (
        VLBConfig, VideoLLaMA2VLB, trainable_predicate, vlb_forward_fn,
    )
    from phantom_vlb_tpu.train.loop import TrainLoopConfig, VLBTrainer
    from phantom_vlb_tpu.train.metrics import CSVMetricsLogger
    from phantom_vlb_tpu.train.optim import OptimConfig, trainable_labels

    def build_cfg(quant):
        # CLIP stays bf16 in every config: production trains from the bf16
        # vision-token cache (data/token_cache.py), and identical tokens +
        # identical targets across configs are what make the bf16-vs-int8
        # curves comparable.
        cfg = VLBConfig(
            clip=CLIPVisionConfig(param_dtype=jnp.bfloat16, scan_layers=True),
            stc=STCConfig(param_dtype=jnp.bfloat16),
            mistral=MistralConfig(
                num_hidden_layers=args.layers, param_dtype=jnp.bfloat16,
                lora=LoRAConfig(dropout=0.1, dropout_bits=8),
                scan_layers=True, base_quant=quant,
            ),
            freeze_backbone=False,
        )
        cfg.validate()
        return cfg

    cfg0 = build_cfg(None if "bf16" in args.configs else
                     args.configs.split(",")[0])
    g = cfg0.geometry
    B = args.batch
    n_clips = (args.train_batches + args.val_batches) * B
    K = args.latent

    # ------------------------------------------------------------------
    # Host dataset: language rows + HRF weights now; pixels regenerated
    # per-clip from a fixed seed when needed (2.6 GB would not fit resident).
    rng = np.random.default_rng(0)
    lang_rows, padval_rows, visw_rows, langw_rows = [], [], [], []
    for i in range(n_clips):
        ids, _onsets, maskvals = synth_language_row(
            g, rng, tr_time=(i % 40 + 1) * g.tr, vocab_size=cfg0.mistral.vocab_size
        )
        lang_rows.append(ids)
        padval_rows.append(maskvals)
        visw_rows.append(rng.uniform(0, 0.3, g.num_ds_frames))
        langw_rows.append(rng.uniform(0, 0.3, g.onsets_width))
    language = np.stack(lang_rows).astype(np.int32)           # (N, T)
    padvals = np.stack(padval_rows).astype(np.int32)          # (N, 3)
    vis_w = np.stack(visw_rows).astype(np.float32)            # (N, D)
    lang_w = np.stack(langw_rows).astype(np.float32)          # (N, W)

    def clip_pixels(i: int) -> np.ndarray:
        r = np.random.default_rng(10_000 + i)
        return r.standard_normal(
            (g.num_frames, 3, g.image_size, g.image_size)
        ).astype(np.float32)

    # ------------------------------------------------------------------
    # One canonical bf16 vision pass (identical across configs): encode all
    # clips' video tokens on device, batches are shared by every config.
    # nn.Module.init via method=encode_video initializes exactly the vision
    # modules, with the SAME params the full init would produce (flax derives
    # param keys from the module path) — no 16/32L LLM init needed here.
    enc_model = VideoLLaMA2VLB(build_cfg(None))
    px0 = jnp.asarray(clip_pixels(0))[None].repeat(B, 0)
    vis_params = jax.jit(lambda key: enc_model.init(
        key, px0, method=VideoLLaMA2VLB.encode_video)["params"])(jax.random.key(0))
    encode = jax.jit(
        lambda p, v: enc_model.apply(
            {"params": p}, v, method=VideoLLaMA2VLB.encode_video,
        ).astype(jnp.bfloat16)
    )
    n_batches = args.train_batches + args.val_batches
    log(f"encoding vision tokens ({n_batches} batches, on-device, bf16)...")
    batches, tok_means = [], []
    for bi in range(n_batches):
        s = bi * B
        px = jnp.asarray(np.stack([clip_pixels(s + j) for j in range(B)]))
        tokens = encode(vis_params, px)            # stays on device
        tok_means.append(np.asarray(
            tokens.reshape(B, g.num_ds_frames, g.tokens_per_frame, -1)
            .mean(2), np.float32))
        batches.append({
            "language": language[s : s + B],
            "vision": tokens,
            "padvals": padvals[s : s + B],
            "vis_weights": vis_w[s : s + B],
            "lang_weights": lang_w[s : s + B],
            "row_mask": np.ones((B,), np.float32),
        })
    tok_mean = np.concatenate(tok_means)           # (N, D, E)
    del vis_params

    # ------------------------------------------------------------------
    # Planted latent: token-level stimulus code (see module docstring).
    prng = np.random.default_rng(42)
    e_llm = tok_mean.shape[-1]
    r_tok = prng.standard_normal((e_llm, K)).astype(np.float32) / np.sqrt(e_llm)
    p_out = prng.standard_normal((K, g.num_parcels)).astype(np.float32) / np.sqrt(K)

    def zs(a):
        return (a - a.mean(0)) / (a.std(0) + 1e-9)

    z = np.einsum("nd,ndk->nk", vis_w, tok_mean @ r_tok)
    y = zs(zs(z) @ p_out)
    y = y + args.noise * rng.standard_normal(y.shape).astype(np.float32)
    for bi in range(n_batches):
        batches[bi]["timeseries"] = y[bi * B : (bi + 1) * B]
    ceiling = 1.0 / np.sqrt(1.0 + args.noise**2)
    log(f"targets planted: {y.shape}, noise ceiling r = {ceiling:.3f}")

    # ------------------------------------------------------------------
    class ListLoader:
        def __init__(self, batches):
            self.batches = batches

        def __iter__(self):
            return iter(self.batches)

        def __len__(self):
            return len(self.batches)

    results = []
    for quant_name in args.configs.split(","):
        quant = None if quant_name == "bf16" else quant_name
        cfg = build_cfg(quant)
        model = VideoLLaMA2VLB(cfg)
        log(f"[{quant_name}] init at {args.layers}L ...")
        px0 = jnp.asarray(clip_pixels(0))[None].repeat(B, 0)
        init = jax.jit(lambda key: model.init(
            key, jnp.asarray(language[:B]), px0, jnp.asarray(padvals[:B]),
            jnp.asarray(vis_w[:B]), jnp.asarray(lang_w[:B]),
        )["params"])
        params = init(jax.random.key(0))
        # Vision path trains from the shared precomputed tokens (above).
        params = {k: v for k, v in params.items()
                  if k not in ("vision_tower", "mm_projector")}

        def _ln(a):
            mu = a.mean(-1, keepdims=True)
            var = ((a - mu) ** 2).mean(-1, keepdims=True)
            return (a - mu) / np.sqrt(var + 1e-6)

        def pooled_reps():
            # The head's exact input: HRF-mask-pooled backbone rep
            # (models/heads.py), through THIS config's frozen backbone.
            from phantom_vlb_tpu.ops.weight_mask import build_weight_mask

            pooled_fn = jax.jit(lambda p, b: (
                lambda hidden_valid: jnp.einsum(
                    "bse,bs->be",
                    hidden_valid[0].astype(jnp.float32),
                    build_weight_mask(b["padvals"], b["vis_weights"],
                                      b["lang_weights"], g),
                ))(model.apply({"params": p}, b["language"], b["vision"],
                               method=lambda m, l, v: m.backbone(l, v)))
            )
            reps = []
            for bt in batches:
                dev = {k: jnp.asarray(v) for k, v in bt.items()}
                reps.append(np.asarray(pooled_fn(params, dev), np.float32))
            return np.concatenate(reps)

        cfg_batches = batches
        y_cfg = y
        if args.plant == "self":
            # Fair cross-config time-to-plateau: plant the code in THIS
            # config's own frozen pooled rep (LoRA starts at zero, so the
            # rep at init IS the frozen rep).  Every config then has the
            # same noise ceiling by construction — unlike the token-level
            # plant, whose linear trace through a QUANTIZED random-init
            # backbone collapses (measured: probe r 0.45 bf16 vs 0.08
            # w8a8g8 at 16L — int8 noise on unstructured random weights
            # erases the code; with pretrained structure the quant-quality
            # teacher-student curves bound the effect instead).
            X0 = _ln(pooled_reps())
            r_self = prng.standard_normal(
                (X0.shape[-1], K)).astype(np.float32) / np.sqrt(X0.shape[-1])
            z_self = X0 @ r_self
            y_cfg = zs(zs(z_self) @ p_out)
            y_cfg = (y_cfg + args.noise
                     * np.random.default_rng(7).standard_normal(y_cfg.shape)
                     .astype(np.float32))
            cfg_batches = [dict(bt) for bt in batches]
            for bi in range(n_batches):
                cfg_batches[bi]["timeseries"] = y_cfg[bi * B : (bi + 1) * B]
            log(f"[{quant_name}] self-plant targets built "
                f"(ceiling r = {ceiling:.3f} by construction)")
        train_loader = ListLoader(cfg_batches[: args.train_batches])
        val_loader = ListLoader(cfg_batches[args.train_batches :])

        if args.probe:
            # Closed-form achievability probe: solve ridge on host from the
            # pooled reps and report the best LINEAR val r — the ceiling SGD
            # can reach with LoRA off.  Cheap sanity before an hour of
            # training.
            X = _ln(pooled_reps())                           # (N, E) like LN2
            n_tr = args.train_batches * B
            Xt, Xv = X[:n_tr], X[n_tr:]
            yt, yv = y_cfg[:n_tr], y_cfg[n_tr:]
            for alpha in (1e0, 1e2, 1e4):
                w = np.linalg.solve(
                    Xt.T @ Xt + alpha * np.eye(X.shape[1], dtype=np.float64),
                    Xt.T @ yt,
                )
                pv = Xv @ w
                num = ((pv - pv.mean(0)) * (yv - yv.mean(0))).sum(0)
                den = (np.linalg.norm(pv - pv.mean(0), axis=0)
                       * np.linalg.norm(yv - yv.mean(0), axis=0) + 1e-9)
                print(json.dumps({
                    "config": quant_name, "probe_alpha": alpha,
                    "probe_val_r": round(float(np.mean(num / den)), 4),
                }), flush=True)
            continue

        out_dir = f"{args.out}_{quant_name}_{args.layers}L"
        trainer = VLBTrainer(
            vlb_forward_fn(model),
            params,
            OptimConfig(lr=args.lr),
            TrainLoopConfig(
                max_epochs=args.max_epochs, val_check_interval=0.0,
                log_every_n_steps=args.train_batches, output_dir=out_dir,
                run_name="plateau", num_target=g.num_parcels, checkpoint=False,
                early_stop_patience=args.patience,
                early_stop_min_delta=args.min_delta,
            ),
            trainable_label_tree=trainable_labels(params, trainable_predicate),
            csv_logger=CSVMetricsLogger(out_dir, "plateau"),
        )
        del params
        t0 = time.perf_counter()
        final = trainer.fit(train_loader, val_loader)
        walltime = time.perf_counter() - t0

        # Curve: (step, val_corr_avg, val_loss) per validation, from the CSV.
        import csv as _csv

        curve = []
        with open(trainer.csv_logger.path) as f:
            for row in _csv.DictReader(f):
                if row.get("val_corr_avg"):
                    curve.append((int(row["step"]),
                                  round(float(row["val_corr_avg"]), 4),
                                  round(float(row["val/brain_loss"]), 4)))
        rec = {
            "config": quant_name,
            "layers": args.layers,
            "noise_ceiling_r": round(float(ceiling), 4),
            "final_val_corr_avg": round(float(final["val_corr_avg"]), 4),
            "stopped_early": trainer.stopped_early,
            "stop_step": trainer.global_step,
            "walltime_s": round(walltime, 1),
            "curve": curve,
        }
        results.append(rec)
        print(json.dumps(rec), flush=True)
        del trainer
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
