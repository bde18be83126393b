#!/usr/bin/env python
"""Minimal inference server: HTTP image in -> overlay PNG (or label map) out.

The reference has no serving story (its inference is a script loop,
SURVEY.md §3.2-3.3); this wraps the same jitted Predictor pipeline
(normalize -> pad -> forward -> crop -> argmax -> colormap, one XLA
program, uint8 in/out) behind a stdlib HTTP server for production-style
use. Single-threaded handler by design: the TPU serializes work anyway,
and the jitted program has a fixed batch shape.

    python scripts/serve.py --preset fcn8s_kitti --checkpoint-dir ckpts \
        --port 8500

    curl -s -X POST --data-binary @image.png localhost:8500/segment > out.png
    curl -s -X POST --data-binary @image.png localhost:8500/labels > labels.png
    curl -s localhost:8500/healthz
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import io
import json
import time


def build_predictor(args):
    if args.artifact:
        # AOT path: a .segx file (scripts/export_model.py) — no model
        # code, no checkpoint template, no re-trace; same request surface
        from semanticsegmentation_tensorflow_tpu.infer import (
            ExportedPredictor,
        )
        return ExportedPredictor(args.artifact)
    from semanticsegmentation_tensorflow_tpu.config import (
        get_preset, parse_model_kw,
    )
    from semanticsegmentation_tensorflow_tpu.infer import Predictor
    from semanticsegmentation_tensorflow_tpu.models import build_model
    from semanticsegmentation_tensorflow_tpu.models.registry import (
        padded_input_hw,
    )
    from semanticsegmentation_tensorflow_tpu.train.checkpoint import (
        CheckpointManager,
    )
    from semanticsegmentation_tensorflow_tpu.train.state import (
        create_abstract_state, make_optimizer,
    )

    import jax

    cfg = get_preset(args.preset)
    dc = cfg.data
    model_kwargs = dict(cfg.model_kwargs, **parse_model_kw(args.model_kw))
    if args.int8:
        # quantization intercepts nn.Conv calls — rebuild unpacked so every
        # conv is visible (same param tree; registry.quant_safe_kwargs)
        from semanticsegmentation_tensorflow_tpu.models.registry import (
            merge_quant_safe_kwargs,
        )
        model_kwargs = merge_quant_safe_kwargs(args.model or cfg.model,
                                               model_kwargs)
    model = build_model(args.model or cfg.model, num_classes=dc.num_classes,
                        **model_kwargs)
    h, w = padded_input_hw(model, dc.image_size)
    state = create_abstract_state(model, (1, h, w, 3),
                                  make_optimizer("adam", 1e-4),
                                  ema=args.ema)
    ckpt = CheckpointManager(args.checkpoint_dir)
    state = ckpt.restore(state)
    ckpt.close()
    variables = {"params": state.eval_params(args.ema)}
    if jax.tree.leaves(state.batch_stats):
        variables["batch_stats"] = state.batch_stats
    apply_fn = None
    if args.int8:
        import glob

        from semanticsegmentation_tensorflow_tpu.infer import quant

        stride = getattr(model, "total_stride", 32)
        calib = None
        if args.calib_dir:
            paths = sorted(
                q for ext in ("png", "jpg", "jpeg")
                for q in glob.glob(os.path.join(args.calib_dir, f"*.{ext}"))
            )[:16]
            calib = quant.calib_batches_from_files(
                paths, dc.image_size, dc.mean, dc.std, stride) or None
        variables, apply_fn, scales = quant.quantize_for_inference(
            model, variables, calib, (1, h, w, 3))
        print(f"int8 serving: {len(scales)} activation scales"
              + (" (weight-only)" if not scales else ""))
    mesh = None
    if getattr(args, "mesh", False) and len(jax.devices()) > 1:
        from semanticsegmentation_tensorflow_tpu.parallel import make_mesh

        mesh = make_mesh()
        print(f"mesh serving over {mesh.size} devices")
    return Predictor(model, variables, dc.image_size, mean=dc.mean,
                     std=dc.std, alpha=args.alpha, apply_fn=apply_fn,
                     mesh=mesh)


def make_handler(predictor, stats):
    import threading
    from http.server import BaseHTTPRequestHandler

    import numpy as np
    from PIL import Image

    stats_lock = threading.Lock()  # += on a dict value is not atomic

    from semanticsegmentation_tensorflow_tpu.ops.overlay import host_overlay
    from semanticsegmentation_tensorflow_tpu.utils.fastpng import encode_png

    class Handler(BaseHTTPRequestHandler):
        protocol_version = "HTTP/1.1"
        # an idle keep-alive client must not hold a worker forever
        timeout = 60

        def log_message(self, fmt, *a):  # quiet; stats carry the signal
            pass

        def _send(self, code: int, body: bytes, ctype: str) -> None:
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/healthz":
                payload = dict(stats, status="ok")
                self._send(200, json.dumps(payload).encode(),
                           "application/json")
            else:
                self._send(404, b"not found", "text/plain")

        def do_POST(self):
            n = int(self.headers.get("Content-Length", 0))
            if self.path not in ("/segment", "/labels"):
                if n:  # drain, or the keep-alive connection desyncs
                    self.rfile.read(n)
                self._send(404, b"not found", "text/plain")
                return
            if not n:
                self._send(400, b"empty body", "text/plain")
                return
            raw = self.rfile.read(n)
            try:
                img = Image.open(io.BytesIO(raw)).convert("RGB")
            except Exception as e:  # noqa: BLE001 — client error
                self._send(400, f"bad image: {e}".encode(), "text/plain")
                return
            # the pipeline is compiled for the preset size; resize like the
            # reference's loader does (SURVEY.md §3.5)
            hs, ws = predictor.image_size
            if img.size != (ws, hs):
                img = img.resize((ws, hs), Image.BILINEAR)
            t0 = time.perf_counter()
            # fetch only the packed label map (96x less wire traffic than
            # the rendered overlay) and composite on host — the LUT blend
            # (ops/overlay.host_overlay) is bit-equal to the device blend
            img_np = np.asarray(img, np.uint8)
            labels = predictor._fetch_labels(img_np[None])[0]
            dt = time.perf_counter() - t0
            with stats_lock:
                stats["requests"] += 1
                stats["last_ms"] = round(dt * 1e3, 2)
            if self.path == "/segment":
                overlay = host_overlay(img_np, labels, predictor._palette,
                                       predictor._alpha)
                self._send(200, encode_png(overlay), "image/png")
            else:
                lab3 = np.repeat(labels.astype(np.uint8)[..., None], 3, -1)
                self._send(200, encode_png(lab3), "image/png")

    return Handler


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--preset", default="fcn8s_kitti")
    p.add_argument("--model", default=None)
    p.add_argument("--checkpoint-dir", default="checkpoints")
    p.add_argument("--artifact", default=None,
                   help="serve from an AOT .segx artifact "
                        "(scripts/export_model.py) instead of "
                        "preset+checkpoint — ignores --preset/--model/"
                        "--checkpoint-dir/--alpha")
    p.add_argument("--model-kw", default=None)
    p.add_argument("--alpha", type=float, default=0.5)
    p.add_argument("--ema", action="store_true",
                   help="serve the EMA params (checkpoint must be trained "
                        "with --ema-decay)")
    p.add_argument("--mesh", action="store_true",
                   help="shard each request batch over all devices (1-D "
                        "data mesh, params replicated) — multi-chip "
                        "serving; single-image requests still work (the "
                        "Predictor pads to the mesh size)")
    p.add_argument("--int8", action="store_true",
                   help="post-training int8 serving (per-channel weights; "
                        "activations calibrated from --calib-dir images, "
                        "else weight-only). Checkpoint mode only — for "
                        "artifacts, export with --int8 instead.")
    p.add_argument("--calib-dir", default=None,
                   help="directory of images for --int8 calibration")
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8500)
    p.add_argument("--warmup", action=argparse.BooleanOptionalAction,
                   default=True,
                   help="compile the pipeline before accepting requests")
    args = p.parse_args(argv)

    # after argparse so --help / usage errors never wait on the TPU tunnel
    from semanticsegmentation_tensorflow_tpu.utils.runtime import setup_runtime
    setup_runtime()

    import numpy as np
    from http.server import ThreadingHTTPServer

    predictor = build_predictor(args)
    if args.warmup:  # pay the one-time costs before the first request
        from semanticsegmentation_tensorflow_tpu.ops.overlay import (
            host_overlay,
        )
        from semanticsegmentation_tensorflow_tpu.utils.fastpng import (
            encode_png,
        )
        hs, ws = predictor.image_size
        # the serving path is packed-label fetch -> host blend -> encode;
        # warm all three (XLA compile, the lazy native g++ build + blend
        # LUT, and the encoder) so no request pays them
        dummy = np.zeros((hs, ws, 3), np.uint8)
        labels = predictor._fetch_labels(dummy[None])[0]
        encode_png(host_overlay(dummy, labels, predictor._palette,
                                predictor._alpha))
    stats = {"requests": 0, "last_ms": None}
    # threading: concurrent requests serialize on the device anyway (jax
    # dispatch is thread-safe), but one idle keep-alive client must never
    # starve /healthz and other clients
    server = ThreadingHTTPServer((args.host, args.port),
                                 make_handler(predictor, stats))
    print(f"serving {args.preset} on http://{args.host}:{args.port} "
          "(POST /segment | /labels, GET /healthz)", flush=True)
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        pass
    return 0


if __name__ == "__main__":
    sys.exit(main())
