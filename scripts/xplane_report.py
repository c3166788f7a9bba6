"""Op-class roofline report for a jax.profiler trace of the VLB train step.

Builds on ``phantom_vlb_tpu.utils.xplane`` (wire-format XPlane reader, no
TensorBoard needed) and buckets every device op on the "XLA Ops" line into
hardware-meaningful classes so BENCHMARKS.md can account for the full
measured step time:

  matmul            - convolution/dot HLOs (MXU work, incl. int8 convs)
  attention         - the Pallas flash kernels (custom-calls named self_attn/
                      flash via the surrounding scope)
  quant             - abs-max stats + clamp/convert fusions (w8a8g8 dispatch)
  rng               - dropout bit-generation
  fusion            - remaining elementwise/reduce fusions (norms, rope,
                      residuals, optimizer)
  async-copy        - copy-start/done pairs.  These are DMAs that OVERLAP
                      compute; their summed duration is an upper bound on
                      exposed time, not wall-clock cost.  Reported separately
                      and excluded from the busy total.
  scopes            - while/jit wrappers (pure containers, excluded)

Usage:
  python scripts/xplane_report.py /tmp/vlb_trace --steps 2

``--steps`` divides totals by the number of profiled steps so the table is
directly comparable to bench.py's ms/step.  Matches VERDICT round-2 ask 3
(publish a step-time roofline accounting).
"""

from __future__ import annotations

import argparse
import re
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from phantom_vlb_tpu.utils.xplane import _fields  # noqa: E402


def parse_planes(path: Path) -> list[dict]:
    """Like xplane.parse_xspace but keeps per-line event maps (the op-level
    accounting must use only the "XLA Ops" line; module/scope lines would
    double-count)."""
    data = memoryview(path.read_bytes())
    planes = []
    for f, w, v in _fields(data):
        if f != 1 or w != 2:
            continue
        plane = {"name": "", "metadata": {}, "lines": []}
        for pf, pw, pv in _fields(v):
            if pf == 2 and pw == 2:
                plane["name"] = bytes(pv).decode("utf-8", "replace")
            elif pf == 4 and pw == 2:  # event_metadata map entry
                key, name = None, ""
                for mf, mw, mv in _fields(pv):
                    if mf == 1 and mw == 0:
                        key = mv
                    elif mf == 2 and mw == 2:
                        for ef, ew, ev in _fields(mv):
                            if ef == 1 and ew == 0 and key is None:
                                key = ev
                            elif ef == 2 and ew == 2:
                                name = bytes(ev).decode("utf-8", "replace")
                if key is not None:
                    plane["metadata"][key] = name
            elif pf == 3 and pw == 2:  # XLine
                line = {"name": "", "events": {}}
                for lf, lw, lv in _fields(pv):
                    if lf == 2 and lw == 2:
                        line["name"] = bytes(lv).decode("utf-8", "replace")
                    elif lf == 4 and lw == 2:  # XEvent
                        mid, dur = None, 0
                        for ef, ew, ev in _fields(lv):
                            if ef == 1 and ew == 0:
                                mid = ev
                            elif ef == 3 and ew == 0:
                                dur = ev
                        if mid is not None:
                            t, c = line["events"].get(mid, (0, 0))
                            line["events"][mid] = (t + dur, c + 1)
                plane["lines"].append(line)
        planes.append(plane)
    return planes


def classify(name: str) -> str:
    # HLO event names are full instruction texts ("%fusion.9 = bf16[...]
    # fusion(%copy-done.5, ...)"): classify on the DEFINING name before
    # " = " only — matching anywhere would misfile every consumer of a
    # copy-done operand as a copy (the round-3 bug this comment documents).
    defn = name.split(" = ")[0]
    body = name[len(defn):]
    if "copy-start" in defn or "copy-done" in defn or "slice-start" in defn \
            or "slice-done" in defn or "all-reduce-start" in defn:
        return "async-copy"
    if "self_attn" in defn or "flash" in defn:
        return "attention"
    if re.search(r"convolution|dot", defn):
        return "matmul"
    if "abs_reduce" in defn or "clamp_convert" in defn or "quant" in defn:
        return "quant"
    if "rng" in defn or "bit-generator" in defn:
        return "rng"
    if "while" in defn or "jit_" in defn or defn.strip().isdigit():
        return "scopes"
    if "custom-call" in body and "fusion" not in defn:
        return "custom-call(other)"
    if "fusion" in defn:
        return "fusion"
    if "copy" in defn or "transpose" in defn or "bitcast" in defn:
        return "copy/format"
    return "other"


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("trace_dir", type=Path)
    ap.add_argument("--steps", type=int, default=1,
                    help="profiled train steps in the trace (divides totals)")
    ap.add_argument("--top", type=int, default=0,
                    help="also print the top-N individual ops")
    args = ap.parse_args()

    files = sorted(args.trace_dir.rglob("*.xplane.pb"))
    if not files:
        raise SystemExit(f"no .xplane.pb under {args.trace_dir}")

    buckets: dict[str, tuple[float, int]] = {}
    rows: list[tuple[float, int, str]] = []
    for f in files:
        for plane in parse_planes(f):
            if "TPU" not in plane["name"]:
                continue
            oplines = [l for l in plane["lines"] if l["name"] == "XLA Ops"]
            if not oplines:
                continue
            for mid, (ps, cnt) in oplines[0]["events"].items():
                name = plane["metadata"].get(mid, str(mid))
                ms = ps / 1e9 / args.steps
                b = classify(name)
                bt, bc = buckets.get(b, (0.0, 0))
                buckets[b] = (bt + ms, bc + cnt // args.steps)
                rows.append((ms, cnt // args.steps, name))

    busy = sum(ms for b, (ms, _) in buckets.items()
               if b not in ("scopes", "async-copy"))
    print(f"{'ms/step':>9} {'ops/step':>9}  class")
    for b, (ms, c) in sorted(buckets.items(), key=lambda kv: -kv[1][0]):
        if b == "scopes":
            continue
        tag = "  (overlapped DMA, not wall-clock)" if b == "async-copy" else ""
        print(f"{ms:9.1f} {c:9d}  {b}{tag}")
    print(f"{busy:9.1f} {'':9s}  TOTAL busy (excl. scopes + async-copy)")

    if args.top:
        rows.sort(reverse=True)
        print(f"\n{'ms/step':>9} {'x/step':>7}  op")
        for ms, c, name in rows[: args.top]:
            if classify(name) == "scopes":
                continue
            print(f"{ms:9.2f} {c:7d}  {name[:120]}")


if __name__ == "__main__":
    main()
