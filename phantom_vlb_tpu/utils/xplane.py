"""Minimal XPlane (.xplane.pb) reader — profile summaries without TensorBoard.

``jax.profiler.trace`` writes XSpace protos; the usual viewer (XProf /
TensorBoard) is unavailable in minimal images, so this module decodes the
wire format directly (varint/length-delimited parsing, no protobuf dep) far
enough to aggregate device-op durations by name:

    from phantom_vlb_tpu.utils.xplane import summarize
    for name, ms, n in summarize("/tmp/trace")[:20]:
        print(f"{ms:9.2f} ms  x{n:<5d} {name}")

Schema subset (tsl/profiler/protobuf/xplane.proto):
XSpace.planes=1; XPlane{id=1,name=2,lines=3,event_metadata=4};
XLine{events=4}; XEvent{metadata_id=1,duration_ps=3,num_occurrences=5?};
XEventMetadata{id=1,name=2}; map entries {key=1,value=2}.
"""

from __future__ import annotations

from pathlib import Path

__all__ = ["parse_xspace", "summarize"]


def _read_varint(buf: memoryview, pos: int) -> tuple[int, int]:
    result = 0
    shift = 0
    while True:
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, pos
        shift += 7


def _fields(buf: memoryview):
    """Yield (field_number, wire_type, value) over a message buffer."""
    pos = 0
    n = len(buf)
    while pos < n:
        tag, pos = _read_varint(buf, pos)
        field, wire = tag >> 3, tag & 7
        if wire == 0:
            val, pos = _read_varint(buf, pos)
        elif wire == 2:
            length, pos = _read_varint(buf, pos)
            val = buf[pos : pos + length]
            pos += length
        elif wire == 5:
            val = bytes(buf[pos : pos + 4])
            pos += 4
        elif wire == 1:
            val = bytes(buf[pos : pos + 8])
            pos += 8
        else:
            raise ValueError(f"unsupported wire type {wire}")
        yield field, wire, val


def parse_xspace(path: str | Path) -> list[dict]:
    """Returns per-plane dicts: {name, metadata: {id: name}, events:
    {metadata_id: (total_ps, count)}}."""
    data = memoryview(Path(path).read_bytes())
    planes = []
    for field, wire, val in _fields(data):
        if field == 1 and wire == 2:  # XPlane
            plane = {"name": "", "metadata": {}, "events": {}}
            for pf, pw, pv in _fields(val):
                if pf == 2 and pw == 2:
                    plane["name"] = bytes(pv).decode("utf-8", "replace")
                elif pf == 4 and pw == 2:  # event_metadata map entry
                    key, name = None, ""
                    for mf, mw, mv in _fields(pv):
                        if mf == 1 and mw == 0:
                            key = mv
                        elif mf == 2 and mw == 2:  # XEventMetadata
                            for ef, ew, ev in _fields(mv):
                                if ef == 1 and ew == 0:
                                    key = ev if key is None else key
                                elif ef == 2 and ew == 2:
                                    name = bytes(ev).decode("utf-8", "replace")
                    if key is not None:
                        plane["metadata"][key] = name
                elif pf == 3 and pw == 2:  # XLine
                    for lf, lw, lv in _fields(pv):
                        if lf == 4 and lw == 2:  # XEvent
                            mid, dur = None, 0
                            for ef, ew, ev in _fields(lv):
                                if ef == 1 and ew == 0:
                                    mid = ev
                                elif ef == 3 and ew == 0:
                                    dur = ev
                            if mid is not None:
                                tot, cnt = plane["events"].get(mid, (0, 0))
                                plane["events"][mid] = (tot + dur, cnt + 1)
            planes.append(plane)
    return planes


def summarize(trace_dir: str | Path, plane_filter: str = "TPU") -> list[tuple]:
    """Aggregate device-op time: [(name, total_ms, count)] descending."""
    files = sorted(Path(trace_dir).rglob("*.xplane.pb"))
    if not files:
        raise FileNotFoundError(f"no .xplane.pb under {trace_dir}")
    totals: dict[str, tuple[float, int]] = {}
    for f in files:
        for plane in parse_xspace(f):
            if plane_filter and plane_filter.lower() not in plane["name"].lower():
                continue
            for mid, (ps, cnt) in plane["events"].items():
                name = plane["metadata"].get(mid, f"metadata_{mid}")
                tot, c = totals.get(name, (0.0, 0))
                totals[name] = (tot + ps / 1e9, c + cnt)  # ps -> ms
    return sorted(
        [(k, v[0], v[1]) for k, v in totals.items()], key=lambda t: -t[1]
    )


if __name__ == "__main__":
    import sys

    rows = summarize(sys.argv[1] if len(sys.argv) > 1 else "/tmp/vlbtrace",
                     plane_filter=sys.argv[2] if len(sys.argv) > 2 else "TPU")
    total = sum(r[1] for r in rows)
    print(f"total device-op time: {total:.1f} ms across {len(rows)} op names")
    for name, ms, n in rows[:40]:
        print(f"{ms:9.2f} ms  x{n:<6d} {name[:110]}")
