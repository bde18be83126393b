"""Inference server (scripts/serve.py): request/response contract."""

import io
import json
import sys
import os
import threading

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from semanticsegmentation_tensorflow_tpu.infer import Predictor
from semanticsegmentation_tensorflow_tpu.models import UNet


def _predictor(image_size=(30, 46)):
    model = UNet(num_classes=2, base_features=8)
    h = -(-image_size[0] // 16) * 16
    w = -(-image_size[1] // 16) * 16
    vs = model.init(jax.random.key(0),
                    np.zeros((1, h, w, 3), np.float32), train=False)
    return Predictor(model, vs, image_size)


def test_serve_endpoints():
    from http.server import HTTPServer
    import http.client

    from PIL import Image

    from scripts.serve import make_handler

    pred = _predictor()
    stats = {"requests": 0, "last_ms": None}
    server = HTTPServer(("127.0.0.1", 0), make_handler(pred, stats))
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=120)

        conn.request("GET", "/healthz")
        r = conn.getresponse()
        assert r.status == 200
        assert json.loads(r.read())["status"] == "ok"

        # a differently-sized input is resized like the reference's loader
        rng = np.random.default_rng(0)
        img = Image.fromarray(rng.integers(0, 256, (64, 80, 3),
                                           np.uint8).astype(np.uint8))
        buf = io.BytesIO()
        img.save(buf, format="PNG")
        body = buf.getvalue()

        for path in ("/segment", "/labels"):
            conn.request("POST", path, body=body)
            r = conn.getresponse()
            assert r.status == 200, (path, r.status)
            out = Image.open(io.BytesIO(r.read()))
            assert out.size == (46, 30)     # (W, H) of the preset size
            assert out.mode == "RGB"
        assert stats["requests"] == 2

        conn.request("POST", "/segment", body=b"not a png")
        r = conn.getresponse()
        assert r.status == 400
        r.read()  # drain before reusing the keep-alive connection
        conn.request("POST", "/nope", body=body)
        r = conn.getresponse()
        assert r.status == 404
        r.read()
        conn.close()
    finally:
        server.shutdown()


def test_serve_from_artifact(tmp_path):
    """scripts/serve.py --artifact: the AOT .segx path serves the same
    endpoints with no model code or checkpoint."""
    from http.server import HTTPServer
    import http.client

    from PIL import Image

    from scripts.serve import make_handler
    from semanticsegmentation_tensorflow_tpu.infer import (
        ExportedPredictor, export_model,
    )

    model = UNet(num_classes=2, base_features=8)
    vs = model.init(jax.random.key(0), np.zeros((1, 32, 48, 3), np.float32),
                    train=False)
    path = str(tmp_path / "m.segx")
    export_model(model, vs, (30, 46), path, platforms=("cpu",))

    pred = ExportedPredictor(path)
    stats = {"requests": 0, "last_ms": None}
    server = HTTPServer(("127.0.0.1", 0), make_handler(pred, stats))
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()
    try:
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=120)
        rng = np.random.default_rng(0)
        img = Image.fromarray(rng.integers(0, 256, (30, 46, 3),
                                           np.uint8).astype(np.uint8))
        buf = io.BytesIO()
        img.save(buf, format="PNG")
        conn.request("POST", "/segment", body=buf.getvalue())
        r = conn.getresponse()
        assert r.status == 200
        out = Image.open(io.BytesIO(r.read()))
        assert out.size == (46, 30) and out.mode == "RGB"
        conn.close()
    finally:
        server.shutdown()
