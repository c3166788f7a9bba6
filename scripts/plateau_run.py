"""Planted-HRF plateau evidence at production geometry (VERDICT r2 ask 5).

Unlike the teacher-student proxy (scripts/quant_quality_run.py), the target
here is defined by the STIMULUS, not by any model: per clip

    z[b] = 0.5 * z_vis[b] + 0.5 * z_lang[b]                 (K latent dims)
    z_vis[b]  = sum_f vis_w[b, f] * phi(ds-frame f pixels) @ R_vis
    z_lang[b] = sum_w lang_w[b, w] * E[dialogue id at onset w]
    y[b]      = zscore(z[b] @ P) + sigma * eps               (num_parcels ROIs)

— exactly the generative assumption of the brain-encoding task (BOLD =
HRF-lag-weighted readout of stimulus features; reference target construction
in videollama2_vlb_lazyloading.py:108-131, weight layout litmodule.py:178-203),
with a KNOWN noise ceiling r_max = 1/sqrt(1 + sigma^2).  phi is per-ds-frame
6x6 patch-mean color statistics; E a fixed random token table.  Nothing about
the network enters the target, so recovery requires the frozen backbone to
carry stimulus information to the head — the de-circularized version of
tests/test_e2e_learnability.py at full width.

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
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    from phantom_vlb_tpu.core.geometry import VIDEO_TOKEN_ID
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
        cfg = VLBConfig(
            clip=CLIPVisionConfig(param_dtype=jnp.bfloat16, scan_layers=True,
                                  base_quant=quant),
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
    # Planted latent: stimulus features only (no model anywhere).
    ds_src = np.round(np.linspace(0, g.num_frames - 1, g.num_ds_frames)).astype(int)
    prng = np.random.default_rng(42)
    # phi: 6x6 patch means per channel = 108 dims -> K.
    r_vis = prng.standard_normal((108, K)).astype(np.float32) / np.sqrt(108)
    e_tab = prng.standard_normal((cfg0.mistral.vocab_size, K)).astype(np.float32)
    p_out = prng.standard_normal((K, g.num_parcels)).astype(np.float32) / np.sqrt(K)

    def patch_means(frame: np.ndarray) -> np.ndarray:   # (3, H, W) -> (108,)
        c, h, w = frame.shape
        f = frame[:, : h - h % 6, : w - w % 6]
        f = f.reshape(c, 6, (h // 6), 6, (w // 6)).mean(axis=(2, 4))
        return f.reshape(-1)

    jp = g.max_lang_tokens  # ids layout: [prefix, VID, pre+inst, diag, post, pad]
    z_vis = np.zeros((n_clips, K), np.float32)
    z_lang = np.zeros((n_clips, K), np.float32)
    for i in range(n_clips):
        px = clip_pixels(i)
        phi = np.stack([patch_means(px[s]) for s in ds_src])      # (D, 108)
        z_vis[i] = (vis_w[i] @ phi) @ r_vis
        pad_len, inst_len, diag_len = padvals[i]
        from phantom_vlb_tpu.ops.weight_mask import JOINER_POST, JOINER_PRE
        prefix_len = jp - 1 - JOINER_PRE - inst_len - diag_len - JOINER_POST - pad_len
        d0 = prefix_len + 1 + JOINER_PRE + inst_len
        diag_ids = language[i, d0 : d0 + diag_len]
        assert not np.any(diag_ids == VIDEO_TOKEN_ID)
        z_lang[i] = lang_w[i, :diag_len] @ e_tab[diag_ids]

    def zs(a):
        return (a - a.mean(0)) / (a.std(0) + 1e-9)

    z = 0.5 * zs(z_vis) + 0.5 * zs(z_lang)
    y = zs(z @ p_out)
    y = y + args.noise * rng.standard_normal(y.shape).astype(np.float32)
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

        encode = jax.jit(
            lambda p, v: model.apply(
                {"params": {"vision_tower": p["vision_tower"],
                            "mm_projector": p["mm_projector"]}},
                v, method=VideoLLaMA2VLB.encode_video,
            ).astype(jnp.bfloat16)
        )
        log(f"[{quant_name}] precomputing vision tokens "
            f"({args.train_batches + args.val_batches} batches, on-device)...")
        batches = []
        for bi in range(args.train_batches + args.val_batches):
            s = bi * B
            px = jnp.asarray(np.stack([clip_pixels(s + j) for j in range(B)]))
            tokens = encode(params, px)            # stays on device
            batches.append({
                "language": language[s : s + B],
                "vision": tokens,
                "padvals": padvals[s : s + B],
                "vis_weights": vis_w[s : s + B],
                "lang_weights": lang_w[s : s + B],
                "timeseries": y[s : s + B],
                "row_mask": np.ones((B,), np.float32),
            })
        params = {k: v for k, v in params.items()
                  if k not in ("vision_tower", "mm_projector")}
        train_loader = ListLoader(batches[: args.train_batches])
        val_loader = ListLoader(batches[args.train_batches :])

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
        del trainer, batches
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
