"""Extraction-throughput benchmark (north-star: >=5x the reference pipeline).

Measures stage-1 video extraction clips/sec (one clip = one TR's
(12,3,336,336) tensor) on a synthetic episode encoded with the native
libav writer, for two pipelines:

- ``host``:   C++ decode -> PIL expand2square/resize + numpy normalize —
  computationally equivalent to the reference's decord + PIL +
  CLIPImageProcessor CPU path (extractfeatures.py:320-349), so it serves as
  the measured reference-equivalent baseline on this machine.
- ``device``: C++ decode -> fused pad/resize/normalize on the TPU
  (ops/preprocess.py), batched across TR windows.

Prints one JSON line; ``vs_baseline`` = device / host throughput.
"""

import json
import sys
import tempfile
import time
from pathlib import Path

import numpy as np

from phantom_vlb_tpu.core.geometry import VLBGeometry
from phantom_vlb_tpu.data.video import extract_video_chunk, tr_end_times
from phantom_vlb_tpu.data.video_reader import NativeVideoSource, write_test_video
from phantom_vlb_tpu.ops.preprocess import DevicePreprocessor


def run(geometry: VLBGeometry, source, tr_list, preprocessor=None) -> float:
    t0 = time.perf_counter()
    n = 0
    for end_t in tr_list:
        out = extract_video_chunk(source, end_t, geometry, preprocessor)
        n += 1
    # np.asarray already forced host materialization inside the chunk call.
    dt = time.perf_counter() - t0
    return n / dt


def main():
    geometry = VLBGeometry()  # production: 12 frames/TR-window, 336 px
    seconds = float(sys.argv[1]) if len(sys.argv) > 1 else 45.0

    with tempfile.TemporaryDirectory() as td:
        path = Path(td) / "bench.mkv"
        fps = 29.97
        write_test_video(path, w=720, h=480, n=int(seconds * fps), fps=fps)

        src = NativeVideoSource(path, cache_size=max(256, geometry.num_frames * 8))
        duration = src.num_frames / src.fps
        tr_list = tr_end_times(duration, geometry.tr)

        # Warm both paths on the first window.
        extract_video_chunk(src, tr_list[0], geometry)
        dev = DevicePreprocessor(geometry.image_size)
        extract_video_chunk(src, tr_list[0], geometry, dev)

        host_cps = run(geometry, src, tr_list)
        print(f"[bench_extract] host {host_cps:.2f} clips/s", file=sys.stderr)
        device_cps = run(geometry, src, tr_list, dev)
        print(f"[bench_extract] device {device_cps:.2f} clips/s", file=sys.stderr)
        src.close()

    print(json.dumps({
        "metric": "extract_clips_per_sec_per_chip",
        "value": round(device_cps, 3),
        "unit": "clips/s",
        "vs_baseline": round(device_cps / host_cps, 3),
    }))


if __name__ == "__main__":
    main()
