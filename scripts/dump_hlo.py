"""Dump the optimized HLO of the bench train step to /tmp/step_hlo.txt.

The xplane trace reports generically-named ops (``%fusion.1059``); the only
way to attribute them to model math (which fusion holds the int8 gate/up
GEMM, which one is the absmax stats pass) is the compiled HLO text.  Uses
the same build as bench.py so names line up with scripts/perf_probe.py
traces.  Compile hits the persistent cache when bench ran first.

Usage: python scripts/dump_hlo.py [out.txt]
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

import bench


def main() -> None:
    out = Path(sys.argv[1] if len(sys.argv) > 1 else "/tmp/step_hlo.txt")
    config, state, frozen, step, batch = bench.build(32, 6, "w8a8g8")
    rng = jax.random.key(1, impl="rbg")
    # step is already a jitted callable (train/step.py:143); .lower works
    # directly and hits the persistent compile cache.
    compiled = step.lower(state, frozen, batch, rng).compile()
    text = compiled.as_text()
    out.write_text(text)
    print(f"wrote {len(text)/1e6:.1f} MB to {out}")


if __name__ == "__main__":
    main()
