"""Benchmark: VLB LoRA train-step throughput on one TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Metric: Friends clips/sec/chip for the jitted LoRA training step (the
reference's hot path: train_run_lora.sh recipe — VideoLLaMA2 backbone at the
production geometry, 2048-token multimodal sequence, LoRA r=16, HRF head,
AdamW+cosine+clip), measured end-to-end including host sync.

``vs_baseline``: the reference publishes no numbers (BASELINE.md), so the
denominator is an engineering estimate of the reference recipe's throughput
on its actual hardware (1x H100 80GB, batch 3, bf16): analytic train
FLOPs/clip from this exact model config divided by H100 bf16 peak (989
TFLOP/s) at 45% MFU. The estimate's derivation is printed to stderr; it will
be replaced by a measured PyTorch-reference number when the full-scale
measurement lands.

Scale: VLB_BENCH_LAYERS controls decoder depth (default 32 = full 7B,
falling back 16 -> 8 on OOM so the bench always reports something honest —
the metric name carries the layer count when truncated).
"""

import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

# Persistent compilation cache: amortizes the big-model compile across bench
# invocations (first 32-layer compile takes minutes over the remote tunnel).
_CACHE_DIR = os.environ.get("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
try:
    jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
except Exception:
    pass


def _log(msg: str) -> None:
    print(f"[bench {time.strftime('%H:%M:%S')}] {msg}", file=sys.stderr, flush=True)


def build(layers: int, batch_size: int, quant: str | None = None,
          regime: str = "lora"):
    from phantom_vlb_tpu.models.clip_vit import CLIPVisionConfig
    from phantom_vlb_tpu.models.lora import LoRAConfig
    from phantom_vlb_tpu.models.mistral import MistralConfig
    from phantom_vlb_tpu.models.stc_connector import STCConfig
    from phantom_vlb_tpu.models.videollama2 import (
        VLBConfig,
        VideoLLaMA2VLB,
        trainable_predicate,
        vlb_forward_fn,
    )
    from phantom_vlb_tpu.train.optim import OptimConfig, make_optimizer, trainable_labels
    from phantom_vlb_tpu.train.step import init_train_state, make_train_step
    from __graft_entry__ import _example_batch

    # Full production geometry; bf16 master params to fit one 16 GB chip.
    # regime='baseline' is the reference's PRIMARY recipe
    # (train_run_baseline.sh:6-11, freeze logic litmodule.py:86-99): no
    # LoRA, whole backbone frozen, only the HRF head trains.
    lora_cfg = None if regime == "baseline" else LoRAConfig(
        shared_dropout=os.environ.get("VLB_BENCH_SHARED_DROPOUT", "0") == "1",
        dropout=float(os.environ.get("VLB_BENCH_DROPOUT", "0.1")),
        # u8-threshold masks (effective p 26/256=0.1016 vs 0.1,
        # unbiased; DEVIATIONS.md): -317 ms/step vs exact bernoulli.
        dropout_bits=int(os.environ.get("VLB_BENCH_DROPOUT_BITS", "8")),
        # Default ON (round 4): the Pallas fused dropout+rank-r kernel
        # measured 2750.7 vs 2803.9 ms/step in the full w8a8g8 step
        # (clean bench, one v5e) with peft-faithful INDEPENDENT
        # per-site masks — strictly closer to the reference recipe
        # than any mask-materializing variant at lower cost.
        fused_dropout=os.environ.get("VLB_BENCH_FUSED_DROPOUT", "1") == "1",
        # Pallas rank-r epilogue kernels (round 5): '' off (measured
        # default: the full Pallas vjp was a net -29 ms regression),
        # 'pallas' fwd+bwd, 'fwd' Pallas fwd + XLA bwd.
        fused_epilogue=os.environ.get("VLB_BENCH_FUSED_EPILOGUE", ""),
    )
    config = VLBConfig(
        clip=CLIPVisionConfig(param_dtype=jnp.bfloat16, scan_layers=True,
                              base_quant=quant),
        stc=STCConfig(param_dtype=jnp.bfloat16),
        mistral=MistralConfig(
            num_hidden_layers=layers,
            param_dtype=jnp.bfloat16,
            lora=lora_cfg,
            scan_layers=os.environ.get("VLB_BENCH_SCAN", "1") == "1",
            base_quant=quant,
            remat_policy=os.environ.get("VLB_BENCH_REMAT", "nothing"),
            scan_unroll=int(os.environ.get("VLB_BENCH_UNROLL", "1")),
            scan_group=int(os.environ.get("VLB_BENCH_GROUP", "1")),
        ),
        freeze_backbone=(regime == "baseline"),
    )
    config.validate()
    model = VideoLLaMA2VLB(config)
    batch = _example_batch(config.geometry, batch_size, config.mistral.vocab_size)
    vision_cache = os.environ.get("VLB_BENCH_VISION_CACHE", "1") == "1"

    _log(f"building model: layers={layers} batch={batch_size} quant={quant}")
    init = jax.jit(
        lambda key: model.init(
            key, batch["language"], batch["vision"], batch["padvals"],
            batch["vis_weights"], batch["lang_weights"],
        )["params"]
    )
    params = init(jax.random.key(0))
    jax.block_until_ready(params)
    _log("params initialized")

    if vision_cache:
        # Vision-token-cache regime (data/token_cache.py): the frozen
        # CLIP+STC tokens are precomputed once per clip; the steady-state
        # step consumes (B, V, E) bf16 tokens.  The one-time cache build
        # (~1 vision forward per clip) amortizes to <2% over the reference
        # recipe's 10 epochs and is excluded from steady-state step time.
        encode = jax.jit(
            lambda p, v: model.apply(
                {"params": {"vision_tower": p["vision_tower"],
                            "mm_projector": p["mm_projector"]}},
                v, method=VideoLLaMA2VLB.encode_video,
            ).astype(jnp.bfloat16)
        )
        batch = dict(batch)
        batch["vision"] = encode(params, batch["vision"])
        _log(f"vision tokens precomputed: {batch['vision'].shape}")
        # The frozen vision params are dead weight in this regime; dropping
        # them frees ~1 GB of HBM for larger batches.
        params = {k: v for k, v in params.items()
                  if k not in ("vision_tower", "mm_projector")}

    labels = trainable_labels(params, trainable_predicate)
    tx = make_optimizer(OptimConfig())
    state, frozen = init_train_state(params, tx, labels)
    del params
    step = make_train_step(vlb_forward_fn(model), tx, labels, donate=True)
    return config, state, frozen, step, batch


def train_flops_per_clip(config) -> float:
    """Analytic train FLOPs per clip for the active regime.

    LoRA recipe: fwd + activation backward (3x fwd matmuls).  Frozen
    baseline recipe (freeze_backbone=True): backbone forward only — no
    gradient flows below the HRF head (litmodule.py:86-99), so the head's
    own backward is negligible next to the 7B forward."""
    g = config.geometry
    m = config.mistral
    seq = g.feature_len
    # Mistral matmul params per layer.
    attn = m.hidden_size * m.head_dim * (
        m.num_attention_heads * 2 + m.num_key_value_heads * 2
    )
    mlp = 3 * m.hidden_size * m.intermediate_size
    layer_params = attn + mlp
    fwd = 2 * layer_params * seq * m.num_hidden_layers
    fwd += 2 * 2 * seq * seq * m.head_dim * m.num_attention_heads * m.num_hidden_layers * 0.5
    # LoRA backward: activations-grad path (~2x fwd matmuls), no base dW.
    llm = fwd * (1 if config.freeze_backbone else 3)
    # Frozen CLIP tower forward: 12 frames x 577 tokens.
    c = config.clip
    clip_params = c.num_hidden_layers * (
        4 * c.hidden_size * c.hidden_size + 2 * c.hidden_size * c.intermediate_size
    )
    clip = 2 * clip_params * 577 * g.num_frames
    return llm + clip


def param_bytes_estimate(layers: int, quant: str | None = None) -> int:
    """Rough parameter footprint of the bench model."""
    h, inter, vocab = 4096, 14336, 32000
    proj = layers * (h * 128 * (32 * 2 + 8 * 2) + 3 * h * inter)
    other = vocab * h + layers * 2 * h
    clip = 24 * (4 * 1024 * 1024 + 2 * 1024 * 4096) + 577 * 1024
    stc = 500e6  # RegNet stages + Conv3d sampler + readout
    proj_bytes = proj * (1 if quant in ("int8", "w8a8", "w8a8g8") else 2)
    return int(proj_bytes + (other + clip + stc) * 2)


def _fits_device(layers: int, quant: str | None, bytes_limit: float | None) -> bool:
    """HBM-fit estimate. ``bytes_limit`` comes from the backend probe (the
    parent process never touches ``jax.devices()`` itself — backend init over
    the axon tunnel can hang or raise, see _probe_backend)."""
    limit = bytes_limit or float(
        os.environ.get("VLB_BENCH_HBM_BYTES", 16e9)  # v5e default
    )
    needed = param_bytes_estimate(layers, quant) + int(2.5e9)
    return needed < limit


_LAST_GOOD = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".bench_last.json")


def _probe_backend() -> dict | None:
    """Check TPU availability in a throwaway subprocess, with retry/backoff.

    Backend init through the tunnel has two observed failure modes: a raised
    ``UNAVAILABLE`` (round-3 BENCH artifact) and an indefinite hang inside
    ``make_c_api_client`` (NOTES_ROUND3).  A subprocess with a hard timeout
    handles both; the tunnel often recovers, so we retry with backoff.
    Returns {'n', 'kind', 'bytes_limit'} on success, None if the backend
    never comes up.
    """
    import subprocess

    code = (
        "import jax, json\n"
        "d = jax.devices()\n"
        "s = getattr(d[0], 'memory_stats', lambda: None)() or {}\n"
        "print(json.dumps({'n': len(d), 'kind': str(getattr(d[0], 'device_kind', '?')),"
        " 'bytes_limit': s.get('bytes_limit')}))\n"
    )
    timeout_s = float(os.environ.get("VLB_BENCH_PROBE_TIMEOUT", "180"))
    attempts = int(os.environ.get("VLB_BENCH_PROBE_ATTEMPTS", "3"))
    for i in range(attempts):
        try:
            proc = subprocess.run(
                [sys.executable, "-c", code],
                capture_output=True, text=True, timeout=timeout_s,
            )
            if proc.returncode == 0 and proc.stdout.strip():
                info = json.loads(proc.stdout.strip().splitlines()[-1])
                _log(f"backend up: {info}")
                return info
            err = (proc.stderr.strip().splitlines() or ["?"])[-1]
            _log(f"backend probe {i + 1}/{attempts} rc={proc.returncode}: {err}")
        except subprocess.TimeoutExpired:
            _log(f"backend probe {i + 1}/{attempts} hung >{timeout_s:.0f}s (killed)")
        except Exception as e:  # malformed probe output etc.
            _log(f"backend probe {i + 1}/{attempts} failed: {e!r}")
        if i + 1 < attempts:
            wait = 30.0 * (i + 1)
            _log(f"retrying backend probe in {wait:.0f}s...")
            time.sleep(wait)
    return None


def _emit_fallback(reason: str) -> None:
    """TPU unavailable: emit ONE well-formed JSON line carrying the last
    verified number with an explicit staleness flag, never a traceback.

    The bench is the single driver-visible perf artifact; an environment
    outage must degrade to an honest stale record, not a crashed round
    (round 3 lost its artifact exactly this way)."""
    fallback = {
        # Last driver-verified figure (BENCH_r02.json) as the floor default;
        # overwritten by .bench_last.json whenever a newer run succeeded.
        "metric": "lora_train_clips_per_sec_per_chip_w8a8g8",
        "value": 2.0106,
        "unit": "clips/s",
        "vs_baseline": 0.4212,
        "source": "BENCH_r02.json (driver-verified round-2 run)",
    }
    try:
        with open(_LAST_GOOD) as f:
            fallback = json.load(f)
    except Exception:
        pass
    fallback["stale"] = True
    fallback["error"] = reason
    print(json.dumps(fallback))


def _attempt(layers: int, batch_size: int, steps: int, quant: str | None,
             regime: str = "lora") -> dict:
    """One bench attempt; raising frees this frame's device arrays."""
    config, state, frozen, step, batch = build(layers, batch_size, quant, regime)
    # rbg dropout keys: ~0.8 s/step cheaper than threefry at this geometry
    # (the trainer uses the same impl, train/loop.py).
    rng = jax.random.key(1, impl="rbg")
    _log("compiling train step...")
    state, metrics = step(state, frozen, batch, rng)
    _ = float(metrics["brain_loss"])
    _log("train step compiled; timing...")
    # Two timing windows, best-of: the axon tunnel occasionally has sustained
    # slow spells (observed 20% swings); min over windows rejects them.
    dt = float("inf")
    for w in range(2):
        t0 = time.perf_counter()
        for i in range(steps):
            state, metrics = step(
                state, frozen, batch, jax.random.fold_in(rng, w * steps + i)
            )
        _ = float(metrics["brain_loss"])  # host fetch = sync
        dt = min(dt, (time.perf_counter() - t0) / steps)
    clips_per_sec = batch_size / dt

    # Reference-estimate denominator (see module docstring).
    ref_flops = train_flops_per_clip(config)
    ref_clips_per_sec = 989e12 * 0.45 / ref_flops
    _log(
        f"layers={layers} batch={batch_size} step={dt * 1e3:.1f} ms "
        f"flops/clip={ref_flops / 1e12:.1f}T "
        f"ref_H100_est={ref_clips_per_sec:.2f} clips/s"
    )
    suffix = "" if layers == 32 else f"@{layers}L"
    if quant:
        suffix = f"_{quant}{suffix}"
    return {
        "metric": f"{regime}_train_clips_per_sec_per_chip{suffix}",
        "value": round(clips_per_sec, 4),
        "unit": "clips/s",
        "vs_baseline": round(clips_per_sec / ref_clips_per_sec, 4),
    }


def main():
    # Throughput-optimal single-chip batch (BENCHMARKS.md: 6 > 3 by ~9%,
    # 8 OOMs); the reference recipe's own batch is 3 (lora.yaml:16).
    batch_size = int(os.environ.get("VLB_BENCH_BATCH", "6"))
    steps = int(os.environ.get("VLB_BENCH_STEPS", "10"))

    if len(sys.argv) > 2 and sys.argv[1] == "--single":
        # Child mode: one attempt, one process (a hard OOM poisons the TPU
        # client, so each scale gets a fresh process).
        quant = sys.argv[3] if len(sys.argv) > 3 and sys.argv[3] != "none" else None
        regime = sys.argv[4] if len(sys.argv) > 4 else "lora"
        if regime == "baseline":
            # The reference's primary recipe has no LoRA state; batch 6 is
            # throughput-optimal here too (BENCHMARKS.md round 5).
            batch_size = int(os.environ.get("VLB_BENCH_BASE_BATCH", "6"))
        result = _attempt(int(sys.argv[2]), batch_size, steps, quant, regime)
        print(json.dumps(result))
        return

    import subprocess

    backend = _probe_backend()
    if backend is None:
        _emit_fallback("tpu_unavailable: backend init failed/hung after retries")
        return

    layers_env = int(os.environ.get("VLB_BENCH_LAYERS", "32"))
    # Candidate ladder: full 32L with w8a8g8 frozen base (int8 MXU on both
    # passes — the fastest single-chip full-7B config; adapter-grad cosine
    # >0.98 vs the exact backward, test_quant.py), then forward-only w8a8,
    # weight-only int8, then bf16 at reduced depth.
    candidates = [
        (32, "w8a8g8"), (32, "w8a8"), (32, "int8"),
        (layers_env, None), (16, None), (8, None),
    ]
    candidates = [
        (l, q) for l, q in candidates if l <= max(layers_env, 32)
    ]
    child_timeout = float(os.environ.get("VLB_BENCH_CHILD_TIMEOUT", "2700"))
    last_err = "no scale attempted"
    for layers, quant in candidates:
        if not _fits_device(layers, quant, backend.get("bytes_limit")):
            print(
                f"[bench] layers={layers} quant={quant}: est. params "
                f"{param_bytes_estimate(layers, quant) / 1e9:.1f} GB exceed "
                "single-chip HBM; skipping (full-scale bf16 uses the FSDP "
                "multi-chip path)",
                file=sys.stderr,
            )
            continue
        try:
            proc = subprocess.run(
                [
                    sys.executable, os.path.abspath(__file__),
                    "--single", str(layers), quant or "none",
                ],
                capture_output=True,
                text=True,
                timeout=child_timeout,
            )
        except subprocess.TimeoutExpired as e:
            last_err = f"layers={layers} quant={quant} hung >{child_timeout:.0f}s"
            sys.stderr.write((e.stderr or b"").decode(errors="replace")
                             if isinstance(e.stderr, bytes) else (e.stderr or ""))
            print(f"[bench] {last_err}", file=sys.stderr)
            continue
        sys.stderr.write(proc.stderr)
        if proc.returncode == 0 and proc.stdout.strip():
            line = proc.stdout.strip().splitlines()[-1]
            # Only a RECIPE-FAITHFUL run may become the outage fallback:
            # experiment knobs (dropout off, alternate scales, ...) must not
            # masquerade as the verified headline in .bench_last.json.
            recipe_faithful = not any(
                os.environ.get(k) is not None
                for k in (
                    "VLB_BENCH_DROPOUT", "VLB_BENCH_DROPOUT_BITS",
                    "VLB_BENCH_SHARED_DROPOUT", "VLB_BENCH_FUSED_DROPOUT",
                    "VLB_BENCH_FUSED_EPILOGUE",
                    "VLB_BENCH_BATCH", "VLB_BENCH_STEPS", "VLB_BENCH_LAYERS",
                    "VLB_BENCH_SCAN", "VLB_BENCH_REMAT", "VLB_BENCH_UNROLL",
                    "VLB_BENCH_GROUP", "VLB_BENCH_VISION_CACHE",
                )
            )
            try:  # record the verified number for future outage fallbacks
                parsed = json.loads(line)
                parsed["source"] = (
                    f"measured {time.strftime('%Y-%m-%dT%H:%M:%S')} "
                    f"on {backend.get('kind', '?')}"
                )
                if recipe_faithful:
                    with open(_LAST_GOOD, "w") as f:
                        json.dump(parsed, f)
            except Exception:
                parsed = None
            # Second metric (VERDICT r4 ask 2): the reference's PRIMARY
            # recipe — frozen backbone, head-only training
            # (train_run_baseline.sh:6-11).  Guarded: a failure or timeout
            # only omits the key, never breaks the headline line.
            if parsed is not None and os.environ.get(
                "VLB_BENCH_BASELINE_REGIME", "1"
            ) == "1":
                try:
                    bproc = subprocess.run(
                        [sys.executable, os.path.abspath(__file__),
                         "--single", str(layers), "w8a8", "baseline"],
                        capture_output=True, text=True,
                        timeout=float(os.environ.get(
                            "VLB_BENCH_BASELINE_TIMEOUT", "1500")),
                    )
                    sys.stderr.write(bproc.stderr)
                    if bproc.returncode == 0 and bproc.stdout.strip():
                        parsed["baseline_regime"] = json.loads(
                            bproc.stdout.strip().splitlines()[-1])
                        line = json.dumps(parsed)
                except Exception as e:
                    print(f"[bench] baseline-regime child failed: {e!r}",
                          file=sys.stderr)
            print(line)
            return
        last_err = f"layers={layers} quant={quant} rc={proc.returncode}"
        print(f"[bench] {last_err}", file=sys.stderr)
    _emit_fallback(f"bench failed at all scales: {last_err}")


if __name__ == "__main__":
    main()
