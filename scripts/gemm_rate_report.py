"""Per-GEMM in-step rate table: join xplane op times with HLO dot shapes.

VERDICT r4 ask 1: the standalone int8 microbenches read 165 TOP/s
(scripts/perf_probe.py probe_mm, reused operand) vs 233 TOP/s
(scripts/quant_epilogue_probe.py, device-varied operand) at the same
production shape, and the step's fusion class (~1.8 s) contains all the
int8 GEMMs.  This report answers, with no estimates: at what rate does
EACH in-step GEMM actually run?

Method:
  1. Parse the compiled step's optimized HLO text (scripts/dump_hlo.py
     output): every ``dot``/``convolution`` instruction gets an exact
     FLOP count (2 * prod(output_shape) * prod(contracting_dim_sizes)),
     attributed to the enclosing top-level instruction (the fusion that
     calls its computation, or the op itself).
  2. Parse the xplane trace ("XLA Ops" line, same reader as
     scripts/xplane_report.py): per-op total device ps + execution count.
  3. Join on instruction name -> ms/step, execs/step, TFLOP/step, TOP/s.

Usage:
  python scripts/dump_hlo.py /tmp/step_hlo.txt
  python scripts/perf_probe.py trace          # writes /tmp/vlb_trace
  python scripts/gemm_rate_report.py /tmp/step_hlo.txt /tmp/vlb_trace --steps 2
"""

from __future__ import annotations

import argparse
import math
import re
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from scripts.xplane_report import parse_planes  # noqa: E402

_SHAPE_RE = re.compile(r"([a-z]+\d+(?:e\d+m\d+)?)\[([\d,]*)\]")
_DEF_RE = re.compile(r"^\s*(?:ROOT\s+)?%?([\w.\-]+)\s*=\s*(\S+)\s")
_CALLS_RE = re.compile(r"(?:calls|to_apply)=%?([\w.\-]+)")
_COMP_RE = re.compile(r"^(?:ENTRY\s+)?%?([\w.\-]+)\s+\(.*\)\s*->")


def parse_shape(text: str):
    """'s8[12288,4096]{1,0:T(8,128)}' -> ('s8', (12288, 4096))."""
    m = _SHAPE_RE.match(text)
    if not m:
        return None
    dims = tuple(int(d) for d in m.group(2).split(",") if d)
    return m.group(1), dims


def dot_flops(line: str, shapes: dict[str, tuple]) -> tuple[float, str] | None:
    """Exact FLOPs for a dot/convolution HLO instruction line.

    FLOPs = 2 * prod(output dims) * prod(contracting dim sizes of lhs).
    For TPU 'convolution'-printed matmuls the contracted size is the lhs
    feature dim from dim_labels (e.g. bf_io->bf: contract lhs dim 1).
    Returns (flops, "dtypexdtype->dtype MxKxN") or None if not a GEMM.
    """
    m = _DEF_RE.match(line)
    if m is None:
        return None
    out = parse_shape(m.group(2))
    if out is None:
        return None
    out_dtype, out_dims = out
    # operand list: first two %names (or inline-shaped operands) in parens
    call = line[line.index("(", line.index(" = ")) :] if "(" in line else ""
    ops = []
    for om in re.finditer(r"([a-z]+\d+\[[\d,]*\][^\s,]*\s+)?%?([\w.\-]+)", call):
        inline, name = om.group(1), om.group(2)
        if inline:
            ops.append(parse_shape(inline.strip()))
        elif name in shapes:
            ops.append(shapes[name])
        if len(ops) == 2:
            break
    if len(ops) < 2 or ops[0] is None or ops[1] is None:
        return None
    (l_dtype, l_dims), (r_dtype, r_dims) = ops

    if " dot(" in line:
        cm = re.search(r"lhs_contracting_dims=\{([\d,]*)\}", line)
        cdims = [int(d) for d in cm.group(1).split(",")] if cm and cm.group(1) else []
        k = math.prod(l_dims[d] for d in cdims) if cdims else 1
    elif " convolution(" in line:
        dm = re.search(r"dim_labels=(\w+)_(\w+)->(\w+)", line)
        if dm is None:
            return None
        # contracted lhs dim = position of 'f' in the lhs labels
        k = l_dims[dm.group(1).index("f")]
    else:
        return None
    flops = 2.0 * math.prod(out_dims) * k
    shape_s = (
        f"{l_dtype}{list(l_dims)} @ {r_dtype}{list(r_dims)} -> "
        f"{out_dtype}{list(out_dims)}"
    )
    return flops, shape_s


def parse_hlo(path: Path):
    """-> (comp_gemms: comp_name -> [(flops, shape_str)],
           top_ops: instr_name -> called_comp | None (for non-fusion GEMMs))."""
    shapes: dict[str, tuple] = {}
    lines = path.read_text().splitlines()
    # first pass: every defined instruction's output shape
    for line in lines:
        m = _DEF_RE.match(line)
        if m:
            s = parse_shape(m.group(2))
            if s:
                shapes[m.group(1)] = s

    comp_gemms: dict[str, list] = {}
    instr_comp: dict[str, str | None] = {}
    cur = None
    for line in lines:
        cm = _COMP_RE.match(line)
        if cm and line.rstrip().endswith("{"):
            cur = cm.group(1)
            continue
        if " dot(" in line or " convolution(" in line:
            fl = dot_flops(line, shapes)
            if fl:
                comp_gemms.setdefault(cur, []).append(fl)
                dm = _DEF_RE.match(line)
                if dm:
                    instr_comp[dm.group(1)] = cur
        m = _DEF_RE.match(line)
        if m and ("fusion(" in line or "custom-call" in line):
            c = _CALLS_RE.search(line)
            if c:
                instr_comp[m.group(1)] = c.group(1)
    return comp_gemms, instr_comp


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("hlo", type=Path)
    ap.add_argument("trace_dir", type=Path)
    ap.add_argument("--steps", type=int, default=2)
    ap.add_argument("--min-ms", type=float, default=1.0)
    args = ap.parse_args()

    comp_gemms, instr_comp = parse_hlo(args.hlo)

    rows = []
    files = sorted(args.trace_dir.rglob("*.xplane.pb"))
    for f in files:
        for plane in parse_planes(f):
            if "TPU" not in plane["name"]:
                continue
            oplines = [l for l in plane["lines"] if l["name"] == "XLA Ops"]
            if not oplines:
                continue
            for mid, (ps, cnt) in oplines[0]["events"].items():
                name = plane["metadata"].get(mid, str(mid))
                instr = name.split(" = ")[0].strip().lstrip("%")
                comp = instr_comp.get(instr)
                gemms = comp_gemms.get(comp) if comp else None
                if gemms is None and comp is None:
                    # op itself might be a bare dot/conv defined at top level
                    gemms = None
                if not gemms:
                    continue
                ms = ps / 1e9 / args.steps
                n = cnt / args.steps
                flops = sum(g[0] for g in gemms)
                shapes_s = "; ".join(g[1] for g in gemms)
                rows.append((ms, n, flops, shapes_s, instr))

    rows.sort(reverse=True)
    tot_ms = tot_tf = 0.0
    print(f"{'ms/step':>8} {'x/step':>7} {'TF/step':>8} {'TOP/s':>6}  shapes (per exec)")
    for ms, n, flops, shapes_s, instr in rows:
        tf_step = flops * n / 1e12
        rate = tf_step / (ms / 1e3) if ms else 0.0
        tot_ms += ms
        tot_tf += tf_step
        if ms < args.min_ms:
            continue
        print(f"{ms:8.2f} {n:7.0f} {tf_step:8.2f} {rate:6.0f}  {instr}: {shapes_s[:150]}")
    print(
        f"{tot_ms:8.2f} {'':7} {tot_tf:8.2f} "
        f"{tot_tf / (tot_ms / 1e3) if tot_ms else 0:6.0f}  TOTAL (all GEMM-bearing ops)"
    )


if __name__ == "__main__":
    main()
