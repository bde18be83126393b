"""Host-side image IO microbenchmark: PIL vs numpy-fastpng vs native segio.

The reference's inference sweep is host-encoder-bound on this 1-core box
(round 1: PNG encode was 97% of e2e sweep time), so host IO is a first-class
perf surface. This prints one JSON row per op so round-over-round numbers
are comparable:

    python tools/bench_host_io.py [--h 375 --w 1242 --iters 20]

No TPU needed — pure host.
"""

from __future__ import annotations

import argparse
import io
import json
import os
import sys
import time

import numpy as np
from PIL import Image

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _timeit(fn, iters: int) -> float:
    fn()  # warm (first native call may build the .so)
    t0 = time.perf_counter()
    for _ in range(iters):
        fn()
    return (time.perf_counter() - t0) / iters * 1e3


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--h", type=int, default=375)
    ap.add_argument("--w", type=int, default=1242)
    ap.add_argument("--oh", type=int, default=160)
    ap.add_argument("--ow", type=int, default=576)
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()

    from semanticsegmentation_tensorflow_tpu import native
    from semanticsegmentation_tensorflow_tpu.utils import fastpng

    rng = np.random.default_rng(0)
    # smooth gradient + noise ~ natural image entropy (pure noise is the
    # encoder worst case and not representative of overlays)
    x = np.linspace(0, 255, args.w, dtype=np.float32)[None, :, None]
    y = np.linspace(0, 255, args.h, dtype=np.float32)[:, None, None]
    img = ((x + y) / 2 + rng.normal(0, 12, (args.h, args.w, 3))
           ).clip(0, 255).astype(np.uint8)
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, "PNG")
    png = buf.getvalue()

    rows: list[dict] = []

    def row(op, impl, ms, **extra):
        r = {"op": op, "impl": impl, "ms": round(ms, 3),
             "shape": [args.h, args.w], **extra}
        rows.append(r)
        print(json.dumps(r))

    row("decode", "pil", _timeit(
        lambda: np.asarray(Image.open(io.BytesIO(png)).convert("RGB")),
        args.iters))
    row("encode", "pil_default", _timeit(
        lambda: Image.fromarray(img).save(io.BytesIO(), "PNG"),
        max(3, args.iters // 4)))
    row("encode", "fastpng_numpy_zlib1",
        _timeit(lambda: fastpng.encode_png_numpy(img, 1), args.iters),
        size=len(fastpng.encode_png_numpy(img, 1)))
    row("resize_bilinear", "pil", _timeit(
        lambda: Image.fromarray(img).resize((args.ow, args.oh),
                                            Image.BILINEAR), args.iters))
    row("resize_nearest", "pil", _timeit(
        lambda: Image.fromarray(img).resize((args.ow, args.oh),
                                            Image.NEAREST), args.iters))

    if native.available():
        row("decode", "native", _timeit(
            lambda: native.decode_png(png), args.iters))
        row("encode", "native_fixed",
            _timeit(lambda: native.encode_png(img, "fixed"), args.iters),
            size=len(native.encode_png(img, "fixed")))
        row("encode", "native_zlib1",
            _timeit(lambda: native.encode_png(img, "zlib", 1), args.iters),
            size=len(native.encode_png(img, "zlib", 1)))
        row("resize_bilinear", "native", _timeit(
            lambda: native.resize_bilinear(img, args.oh, args.ow),
            args.iters))
        row("resize_nearest", "native", _timeit(
            lambda: native.resize_nearest(img, args.oh, args.ow),
            args.iters))
    else:
        print(json.dumps({"native": "unavailable",
                          "why": native.why_unavailable()}))

    # overlay blend: dispatches to the native LUT walk when available
    from semanticsegmentation_tensorflow_tpu.ops.overlay import host_overlay
    pal = np.array([[0, 0, 0], [0, 255, 0]], np.uint8)
    lab = rng.integers(0, 2, (args.h, args.w)).astype(np.uint8)
    row("overlay_blend", "native_lut" if native.available() else "numpy_f32",
        _timeit(lambda: host_overlay(img, lab, pal), args.iters))


if __name__ == "__main__":
    main()
