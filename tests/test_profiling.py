"""StepTimer + xplane parser unit tests."""

import struct

from phantom_vlb_tpu.utils.profiling import StepTimer
from phantom_vlb_tpu.utils.xplane import parse_xspace, summarize


def test_step_timer():
    t = StepTimer()
    with t.stage("a"):
        pass
    with t.stage("a"):
        pass
    assert "a" in t.summary()
    assert t.count["a"] == 2


def _varint(v):
    out = b""
    while True:
        b7 = v & 0x7F
        v >>= 7
        if v:
            out += bytes([b7 | 0x80])
        else:
            return out + bytes([b7])


def _ld(field, payload):
    return _varint((field << 3) | 2) + _varint(len(payload)) + payload


def _vi(field, value):
    return _varint(field << 3) + _varint(value)


def test_xplane_roundtrip(tmp_path):
    # XEventMetadata{id=7, name="matmul"}
    md = _vi(1, 7) + _ld(2, b"matmul")
    md_entry = _vi(1, 7) + _ld(2, md)
    # XEvent{metadata_id=7, duration_ps=2_000_000}  (= 2e-3 ms)
    ev = _vi(1, 7) + _vi(3, 2_000_000)
    line = _ld(4, ev) + _ld(4, ev)
    plane = _ld(2, b"/device:TPU:0") + _ld(4, md_entry) + _ld(3, line)
    space = _ld(1, plane)
    p = tmp_path / "t.xplane.pb"
    p.write_bytes(space)

    planes = parse_xspace(p)
    assert planes[0]["name"] == "/device:TPU:0"
    assert planes[0]["metadata"][7] == "matmul"
    total_ps, count = planes[0]["events"][7]
    assert (total_ps, count) == (4_000_000, 2)

    rows = summarize(tmp_path, plane_filter="TPU")
    assert rows[0][0] == "matmul"
    assert abs(rows[0][1] - 4e-3) < 1e-9
    assert rows[0][2] == 2
