"""Collective-traffic audit of the sharded LoRA train step (VERDICT r4 ask 5).

The multi-chip walltime projection (BENCHMARKS.md) assumed "adapters+head
~= 120 MB/step all-reduce" without measurement.  This script compiles the
PRODUCTION-WIDTH LoRA train step (hidden 4096 / inter 14336 / seq 2048 /
1183 vision tokens / 1000 parcels; vision-token-cache regime, exactly the
bench step) over a virtual 8-device ``data2 x fsdp4`` CPU mesh and counts
every collective the GSPMD partitioner actually emitted — op by op, with
shapes and bytes, no estimates.

Depth is swept (default 2 and 4 layers, scan off so every instruction is
explicit in the HLO and static byte counts are exact) and the per-layer
slope extrapolates to the full 32L model:

  bytes(32L) = bytes(d0) + (bytes(d1) - bytes(d0)) / (d1 - d0) * (32 - d0)

Emits a markdown table (stdout) + docs/bench_logs/collectives_audit.json.
Scaling claim audited: graveyard FSDP capability /root/reference/fsdp.yaml:3-14,
train_dev_nohydra.py:80-97.

Run:  JAX_PLATFORMS=cpu python scripts/collectives_audit.py
"""

from __future__ import annotations

import json
import os
import re
import sys
from collections import defaultdict
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8"
)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

jax.config.update("jax_platforms", "cpu")

_DTYPE_BYTES = {
    "pred": 1, "s8": 1, "u8": 1, "s16": 2, "u16": 2, "f16": 2, "bf16": 2,
    "s32": 4, "u32": 4, "f32": 4, "s64": 8, "u64": 8, "f64": 8,
}
_COLLECTIVES = (
    "all-reduce", "all-gather", "reduce-scatter", "collective-permute",
    "all-to-all",
)
_SHAPE_RE = re.compile(r"([a-z]+\d+)\[([\d,]*)\]")


def _shape_bytes(text: str) -> int:
    """Total bytes of an HLO result shape (sums tuple elements)."""
    total = 0
    for m in _SHAPE_RE.finditer(text):
        dt, dims = m.group(1), m.group(2)
        n = int(np.prod([int(d) for d in dims.split(",") if d] or [1]))
        total += n * _DTYPE_BYTES.get(dt, 4)
    return total


def collect_collectives(hlo_text: str) -> list[dict]:
    """Every collective instruction: kind, result bytes, shape text.

    With scan off the entry computation is fully unrolled, so a static count
    is the per-step count.  A collective inside a `while` body would execute
    trip-count times — flag those instead of silently under-counting.
    """
    ops = []
    cur_comp = None
    in_while_body = False
    for line in hlo_text.splitlines():
        mc = re.match(r"^(?:ENTRY\s+)?%?([\w.\-]+)\s+\(.*\)\s*->", line)
        if mc and line.rstrip().endswith("{"):
            cur_comp = mc.group(1)
            in_while_body = "while" in cur_comp or "body" in cur_comp
            continue
        for kind in _COLLECTIVES:
            if f" {kind}(" in line or f" {kind}-start(" in line:
                md = re.match(r"^\s*(?:ROOT\s+)?%?([\w.\-]+)\s*=\s*(.+?)\s+\w", line)
                shape_txt = md.group(2) if md else line
                ops.append({
                    "kind": kind,
                    "name": (md.group(1) if md else "?"),
                    "bytes": _shape_bytes(shape_txt),
                    "shape": shape_txt.strip()[:80],
                    "computation": cur_comp,
                    "in_loop": in_while_body,
                })
                break
    return ops


def build_and_compile(layers: int, quant: str | None = None):
    """Production-width LoRA train step over data2 x fsdp4 (8 virt devices)."""
    from phantom_vlb_tpu.core.mesh import MeshConfig, build_mesh
    from phantom_vlb_tpu.models.lora import LoRAConfig
    from phantom_vlb_tpu.models.mistral import MistralConfig
    from phantom_vlb_tpu.models.videollama2 import (
        VLBConfig, VideoLLaMA2VLB, trainable_predicate, vlb_forward_fn,
    )
    from phantom_vlb_tpu.models.clip_vit import CLIPVisionConfig
    from phantom_vlb_tpu.models.stc_connector import STCConfig
    from phantom_vlb_tpu.parallel.sharding import shard_params
    from phantom_vlb_tpu.train.optim import (
        OptimConfig, make_optimizer, trainable_labels,
    )
    from phantom_vlb_tpu.train.step import init_train_state, make_train_step
    from __graft_entry__ import _example_batch

    env = build_mesh(MeshConfig(data=2, fsdp=4), jax.devices()[:8])

    config = VLBConfig(
        clip=CLIPVisionConfig(param_dtype=jnp.bfloat16),
        stc=STCConfig(param_dtype=jnp.bfloat16),
        mistral=MistralConfig(
            num_hidden_layers=layers,
            param_dtype=jnp.bfloat16,
            lora=LoRAConfig(dropout=0.1, dropout_bits=8),
            base_quant=quant,
            # scan off: every layer's collectives are explicit instructions,
            # so the static byte count is exact (no while-loop trip counts).
            scan_layers=False,
        ),
        freeze_backbone=False,
    )
    config.validate()
    model = VideoLLaMA2VLB(config)
    g = config.geometry
    batch = _example_batch(g, 8, config.mistral.vocab_size)
    # Vision-token-cache regime (the bench step): precomputed (B, V, E)
    # tokens, no vision tower in the trained graph.
    rng = np.random.default_rng(0)
    batch["vision"] = jnp.asarray(
        rng.standard_normal((8, g.num_vis_tokens, config.mistral.hidden_size)),
        jnp.bfloat16,
    )

    # Abstract init -> sharded zeros: we only compile, never run, so the
    # (expensive at this width) real init is skipped.
    params = jax.eval_shape(
        lambda: model.init(
            jax.random.key(0), batch["language"], batch["vision"],
            batch["padvals"], batch["vis_weights"], batch["lang_weights"],
        )["params"]
    )
    params, _ = shard_params(
        jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), params), env
    )

    # Param dtype census: settles what the gathered FSDP shards actually are
    # (the reference-regime bf16 store vs the int8 bench store) — the HLO
    # byte counts below must be read against this, not assumed.
    census = defaultdict(int)
    for leaf in jax.tree.leaves(params):
        census[str(leaf.dtype)] += leaf.size * leaf.dtype.itemsize
    print("[audit] param bytes by dtype: "
          + ", ".join(f"{k}={v / 1e6:.0f}MB" for k, v in sorted(census.items())),
          file=sys.stderr, flush=True)

    labels = trainable_labels(params, trainable_predicate)
    tx = make_optimizer(OptimConfig())
    state, frozen = init_train_state(params, tx, labels)
    batch = {k: jax.device_put(v, env.batch() if v.ndim else env.replicated())
             for k, v in batch.items()}
    step = make_train_step(vlb_forward_fn(model), tx, labels, donate=False)
    compiled = step.lower(state, frozen, batch, jax.random.key(1)).compile()
    return compiled.as_text(), env


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--quant")]
    quant = None
    for a in sys.argv[1:]:
        if a.startswith("--quant="):
            quant = a.split("=", 1)[1] or None
    depths = [int(d) for d in (args or ["2", "4"])]
    per_depth = {}
    for d in depths:
        print(f"[audit] compiling {d}-layer production-width step "
              f"(quant={quant}) over data2 x fsdp4 ...",
              file=sys.stderr, flush=True)
        text, env = build_and_compile(d, quant)
        ops = collect_collectives(text)
        looped = [o for o in ops if o["in_loop"]]
        if looped:
            print(f"[audit] WARNING: {len(looped)} collectives inside loop "
                  "bodies — static counts under-estimate those",
                  file=sys.stderr)
        per_depth[d] = ops
        print(f"[audit] {d}L: {len(ops)} collectives, "
              f"{sum(o['bytes'] for o in ops) / 1e6:.1f} MB/step",
              file=sys.stderr, flush=True)

    # Per-category totals and the depth extrapolation.
    cats = {}
    for d, ops in per_depth.items():
        tot = defaultdict(int)
        cnt = defaultdict(int)
        for o in ops:
            tot[o["kind"]] += o["bytes"]
            cnt[o["kind"]] += 1
        cats[d] = {"bytes": dict(tot), "count": dict(cnt)}

    d0, d1 = depths[0], depths[-1]
    kinds = sorted({k for d in cats.values() for k in d["bytes"]})
    proj = {}
    print("\n## Collective traffic, production-width LoRA step, "
          "data2 x fsdp4 (8 virtual devices)\n")
    print(f"| kind | {d0}L ops | {d0}L MB | {d1}L ops | {d1}L MB | "
          "per-layer MB | 32L MB (extrap) |")
    print("|---|---|---|---|---|---|---|")
    for k in kinds:
        b0 = cats[d0]["bytes"].get(k, 0)
        b1 = cats[d1]["bytes"].get(k, 0)
        slope = (b1 - b0) / (d1 - d0) if d1 != d0 else 0.0
        b32 = b0 + slope * (32 - d0)
        proj[k] = b32
        print(f"| {k} | {cats[d0]['count'].get(k, 0)} | {b0 / 1e6:.2f} | "
              f"{cats[d1]['count'].get(k, 0)} | {b1 / 1e6:.2f} | "
              f"{slope / 1e6:.3f} | {b32 / 1e6:.1f} |")
    total32 = sum(proj.values())
    print(f"| **total** | | | | | | **{total32 / 1e6:.1f}** |")

    print(f"\nTop ops at {d1}L by bytes:\n")
    for o in sorted(per_depth[d1], key=lambda o: -o["bytes"])[:12]:
        print(f"- {o['kind']} `{o['name']}` {o['bytes'] / 1e6:.2f} MB "
              f"`{o['shape']}`")

    suffix = f"_{quant}" if quant else ""
    out = Path(f"docs/bench_logs/collectives_audit{suffix}.json")
    out.parent.mkdir(parents=True, exist_ok=True)
    out.write_text(json.dumps({
        "mesh": "data2 x fsdp4 (8 virtual CPU devices)",
        "base_quant": quant,
        "geometry": "production width (4096/14336, seq 2048, batch 8, "
                    "vision-token cache)",
        "depths": depths,
        "per_category": {str(d): cats[d] for d in depths},
        "extrapolated_32L_bytes": proj,
        "extrapolated_32L_total_bytes": total32,
        "ops_at_max_depth": per_depth[d1],
    }, indent=1))
    print(f"\nwrote {out}")


if __name__ == "__main__":
    main()
