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


def _png_bytes(h, w, seed=0):
    from PIL import Image

    rng = np.random.default_rng(seed)
    img = Image.fromarray(
        rng.integers(0, 256, (h, w, 3), np.uint8).astype(np.uint8))
    buf = io.BytesIO()
    img.save(buf, format="PNG")
    return buf.getvalue()


def _serve(pred, stats=None, threading_server=True):
    """Boot a handler exactly like scripts/serve.py main() does."""
    from http.server import HTTPServer, ThreadingHTTPServer

    from scripts.serve import make_handler

    stats = stats if stats is not None else {"requests": 0, "last_ms": None}
    cls = ThreadingHTTPServer if threading_server else HTTPServer
    server = cls(("127.0.0.1", 0), make_handler(pred, stats))
    threading.Thread(target=server.serve_forever, daemon=True).start()
    return server, server.server_address[1], stats


def test_serve_keepalive_reuse():
    """One keep-alive connection through a mixed request sequence — every
    response must be drained/framed correctly or the connection desyncs
    (the round-4 bug class behind commits 820d426/d9152d9)."""
    import http.client

    pred = _predictor()
    server, port, stats = _serve(pred)
    body = _png_bytes(64, 80)
    try:
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=120)
        seq = [("POST", "/segment", body, 200),
               ("GET", "/healthz", None, 200),
               ("POST", "/nope", body, 404),        # 404 WITH a body: must drain
               ("POST", "/labels", body, 200),
               ("POST", "/segment", b"garbage", 400),
               ("POST", "/labels", body, 200),
               ("POST", "/segment", None, 400),     # empty body
               ("POST", "/segment", body, 200)]
        golden = {}
        for method, path, b, want in seq:
            conn.request(method, path, body=b)
            r = conn.getresponse()
            data = r.read()
            assert r.status == want, (method, path, r.status)
            if want == 200 and path in ("/segment", "/labels") and b is body:
                golden.setdefault(path, data)
                # keep-alive reuse must not corrupt payloads: identical
                # request -> byte-identical response
                assert data == golden[path], path
        assert stats["requests"] == 4  # only the successful POSTs count
        conn.close()
    finally:
        server.shutdown()


def test_serve_concurrent_requests():
    """N threads x M keep-alive requests against the ThreadingHTTPServer
    used in production: all 200, all byte-identical, request count exact."""
    import http.client

    pred = _predictor()
    server, port, stats = _serve(pred)
    body = _png_bytes(30, 46, seed=3)
    n_threads, m_reqs = 4, 3
    results, errors = [[] for _ in range(n_threads)], []

    def client(i):
        try:
            conn = http.client.HTTPConnection("127.0.0.1", port, timeout=300)
            for _ in range(m_reqs):
                conn.request("POST", "/labels", body=body)
                r = conn.getresponse()
                data = r.read()
                assert r.status == 200, r.status
                results[i].append(data)
            conn.close()
        except Exception as e:  # noqa: BLE001 — surfaced below
            errors.append((i, repr(e)))

    threads = [threading.Thread(target=client, args=(i,))
               for i in range(n_threads)]
    try:
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=600)
        assert not errors, errors
        flat = [d for r in results for d in r]
        assert len(flat) == n_threads * m_reqs
        assert len(set(flat)) == 1, "responses diverged under concurrency"
        assert stats["requests"] == n_threads * m_reqs
    finally:
        server.shutdown()


def test_serve_mesh_ragged_batch():
    """--mesh serving with a single-image request on an 8-way mesh: the
    Predictor pads the ragged batch to the mesh size and the answer equals
    the single-device predictor's, byte-for-byte."""
    import http.client

    from semanticsegmentation_tensorflow_tpu.parallel import make_mesh

    model = UNet(num_classes=2, base_features=8)
    vs = model.init(jax.random.key(0), np.zeros((1, 32, 48, 3), np.float32),
                    train=False)
    single = Predictor(model, vs, (30, 46))
    meshed = Predictor(model, vs, (30, 46), mesh=make_mesh())

    body = _png_bytes(30, 46, seed=7)
    server_s, port_s, _ = _serve(single)
    server_m, port_m, _ = _serve(meshed)
    try:
        out = {}
        for name, port in (("single", port_s), ("mesh", port_m)):
            conn = http.client.HTTPConnection("127.0.0.1", port, timeout=300)
            for path in ("/labels", "/segment"):
                conn.request("POST", path, body=body)
                r = conn.getresponse()
                data = r.read()
                assert r.status == 200
                out[(name, path)] = data
            conn.close()
        for path in ("/labels", "/segment"):
            assert out[("single", path)] == out[("mesh", path)], path
    finally:
        server_s.shutdown()
        server_m.shutdown()

    # direct ragged-batch call: 3 images on an 8-way mesh
    rng = np.random.default_rng(1)
    batch = rng.integers(0, 256, (3, 30, 46, 3), np.uint8).astype(np.uint8)
    np.testing.assert_array_equal(meshed._fetch_labels(batch),
                                  single._fetch_labels(batch))


def test_serve_artifact_vs_live_parity_under_load(tmp_path):
    """The AOT .segx server and the live-checkpoint server must answer
    byte-identically, including under concurrent load."""
    import http.client

    from semanticsegmentation_tensorflow_tpu.infer import (
        ExportedPredictor, export_model,
    )

    model = UNet(num_classes=2, base_features=8)
    vs = model.init(jax.random.key(0), np.zeros((1, 32, 48, 3), np.float32),
                    train=False)
    path = str(tmp_path / "m.segx")
    export_model(model, vs, (30, 46), path, platforms=("cpu",))

    live = Predictor(model, vs, (30, 46))
    aot = ExportedPredictor(path)
    server_l, port_l, _ = _serve(live)
    server_a, port_a, _ = _serve(aot)
    body = _png_bytes(30, 46, seed=11)
    answers, errors = {"live": [], "aot": []}, []

    def client(name, port):
        try:
            conn = http.client.HTTPConnection("127.0.0.1", port, timeout=300)
            for _ in range(3):
                conn.request("POST", "/labels", body=body)
                r = conn.getresponse()
                data = r.read()
                assert r.status == 200
                answers[name].append(data)
            conn.close()
        except Exception as e:  # noqa: BLE001
            errors.append((name, repr(e)))

    threads = [threading.Thread(target=client, args=(n, p))
               for n, p in (("live", port_l), ("aot", port_a))
               for _ in range(2)]
    try:
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=600)
        assert not errors, errors
        allv = answers["live"] + answers["aot"]
        assert len(allv) == 12 and len(set(allv)) == 1, \
            "artifact and live servers diverged"
    finally:
        server_l.shutdown()
        server_a.shutdown()
