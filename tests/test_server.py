"""HTTP serving surface: drive the endpoints over a real socket."""

import base64
import io
import json
import threading
import urllib.request
from http.server import ThreadingHTTPServer

import numpy as np
import pytest

from tests.test_diffusion import tiny_config
from one2345_tpu.core.config import PipelineConfig, ReconConfig
from one2345_tpu.pipeline.api import One2345Service
from one2345_tpu.pipeline.runner import One2345Pipeline
from one2345_tpu.pipeline.server import make_handler


@pytest.fixture(scope="module")
def server_url():
    cfg = PipelineConfig(diffusion=tiny_config(), recon=ReconConfig(mesh_resolution=24))
    service = One2345Service(One2345Pipeline(cfg, use_sam=False))
    httpd = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(service, threading.Lock()))
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{httpd.server_address[1]}"
    httpd.shutdown()


def _post(url, path, payload):
    req = urllib.request.Request(
        url + path, json.dumps(payload).encode(), {"Content-Type": "application/json"}
    )
    return urllib.request.urlopen(req, timeout=600)


def test_healthz(server_url):
    with urllib.request.urlopen(server_url + "/healthz", timeout=30) as r:
        assert json.loads(r.read()) == {"ok": True}


def test_oversized_body_rejected(server_url):
    """Content-Length beyond MAX_BODY_BYTES gets 413 without being read
    (raw socket: urllib would rewrite the Content-Length header)."""
    import socket

    from one2345_tpu.pipeline import server as srv

    host, port = server_url.rsplit("/", 1)[-1].split(":")
    with socket.create_connection((host, int(port)), timeout=30) as s:
        s.sendall(
            (
                "POST /preprocess HTTP/1.1\r\nHost: t\r\n"
                f"Content-Length: {srv.MAX_BODY_BYTES + 1}\r\n"
                "Content-Type: application/json\r\n\r\n"
            ).encode()
        )
        status = s.recv(4096).decode(errors="replace").splitlines()[0]
    assert " 413 " in status


def test_warmup_compiles_at_production_shapes():
    """pipeline.warmup() runs the full graph once at the configured shapes
    (serving cold-start elimination) and reports stage timings."""
    from one2345_tpu.pipeline.runner import One2345Pipeline

    calls = {}

    class _Probe(One2345Pipeline):
        def run(self, image, **kw):
            calls["shape"] = image.shape
            calls["kw"] = kw

            class R:
                timings = {"stage1": 0.0}

            return R()

    from one2345_tpu.core.config import PipelineConfig, ReconConfig

    from tests.test_diffusion import tiny_config

    pipe = _Probe(
        PipelineConfig(diffusion=tiny_config(), recon=ReconConfig(mesh_resolution=24)),
        use_sam=False,
    )
    t = pipe.warmup()
    s = pipe.config.diffusion.image_size
    assert calls["shape"] == (s, s, 3)
    assert calls["kw"]["skip_preprocess"] is True
    assert t == {"stage1": 0.0}


def test_default_bind_is_loopback():
    import inspect

    from one2345_tpu.pipeline import server as srv

    assert inspect.signature(srv.serve).parameters["host"].default == "127.0.0.1"


def test_endpoints_roundtrip(server_url):
    from PIL import Image

    rng = np.random.default_rng(0)
    img = np.zeros((80, 80, 4), np.uint8)
    img[20:60, 25:65, :3] = rng.integers(30, 220, (40, 40, 3))
    img[20:60, 25:65, 3] = 255
    buf = io.BytesIO()
    Image.fromarray(img, "RGBA").save(buf, "PNG")
    b64 = base64.b64encode(buf.getvalue()).decode()

    with _post(server_url, "/preprocess", {"image_b64": b64}) as r:
        out = json.loads(r.read())
    pre = np.asarray(Image.open(io.BytesIO(base64.b64decode(out["image_b64"]))))
    assert pre.shape == (32, 32, 3)

    with _post(server_url, "/estimate_elevation", {"seed": 0}) as r:
        elev = json.loads(r.read())["elevation"]
    assert -90 <= elev <= 90

    with _post(server_url, "/generate_mesh", {"mesh_resolution": 24, "format": ".glb"}) as r:
        body = r.read()
        assert r.headers["Content-Type"] == "model/gltf-binary"
    assert body[:4] == b"glTF"

    # error surface: malformed request -> structured 500
    try:
        _post(server_url, "/preprocess", {"wrong": 1})
        assert False, "expected HTTPError"
    except urllib.error.HTTPError as e:
        assert e.code == 500
        assert "error" in json.loads(e.read())
