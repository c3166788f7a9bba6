"""bench.py unit checks (the driver-facing script must never break)."""

import json
import subprocess
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))

import bench  # noqa: E402


def test_param_bytes_estimate_scales():
    b32 = bench.param_bytes_estimate(32)
    b16 = bench.param_bytes_estimate(16)
    b32_q = bench.param_bytes_estimate(32, "int8")
    assert b32 > b16 > 0
    assert b32_q < b32
    # Full bf16 7B ~ 15-16 GB; int8 ~ 8-9 GB.
    assert 14e9 < b32 < 17e9
    assert 7e9 < b32_q < 10e9


def test_flops_estimate_order_of_magnitude():
    import jax.numpy as jnp

    from phantom_vlb_tpu.models.clip_vit import CLIPVisionConfig
    from phantom_vlb_tpu.models.lora import LoRAConfig
    from phantom_vlb_tpu.models.mistral import MistralConfig
    from phantom_vlb_tpu.models.videollama2 import VLBConfig

    cfg = VLBConfig(
        clip=CLIPVisionConfig(),
        mistral=MistralConfig(num_hidden_layers=32, lora=LoRAConfig()),
        freeze_backbone=False,
    )
    fl = bench.train_flops_per_clip(cfg)
    # ~90-100 TFLOP per clip at the production geometry.
    assert 5e13 < fl < 2e14


def test_bench_single_arg_parsing():
    """--single mode must not run in this CPU test env; just check the CLI
    wiring rejects nonsense."""
    proc = subprocess.run(
        [sys.executable, str(ROOT / "bench.py"), "--single", "notanumber"],
        capture_output=True, text=True, timeout=120,
        env={"PATH": "/usr/bin:/bin", "JAX_PLATFORMS": "cpu",
             "HOME": "/root", "PYTHONPATH": str(ROOT)},
    )
    assert proc.returncode != 0
