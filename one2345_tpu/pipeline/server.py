"""Self-contained HTTP serving of the pipeline (no gradio dependency).

Exposes the reference demo's endpoint contract (README.md:170-215) as a
plain JSON/binary HTTP API suitable for production serving behind any load
balancer:

    POST /preprocess          {"image_b64": <png>} -> {"image_b64": <png 256^2>}
    POST /estimate_elevation  {"seed": 0}          -> {"elevation": <deg>}
    POST /generate_mesh       {"mesh_resolution": 256, "format": ".glb"}
                              -> binary mesh body (model/gltf-binary or PLY)
    GET  /healthz             -> {"ok": true}

One model instance serves sequentially (the TPU is the bottleneck; queuing
happens in the socket backlog).  Run:

    python -m one2345_tpu.pipeline.server --port 8080
"""

from __future__ import annotations

import base64
import io
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np

# Largest accepted request body (a base64 PNG of a few-megapixel image fits
# comfortably; anything bigger is rejected with 413 instead of being read
# into memory on trust of Content-Length).
MAX_BODY_BYTES = 32 * 1024 * 1024


def _decode_image(b64: str) -> np.ndarray:
    from PIL import Image

    return np.asarray(Image.open(io.BytesIO(base64.b64decode(b64))).convert("RGBA"))


def _encode_image(arr: np.ndarray) -> str:
    from PIL import Image

    buf = io.BytesIO()
    Image.fromarray((np.clip(arr, 0, 1) * 255).astype(np.uint8)).save(buf, "PNG")
    return base64.b64encode(buf.getvalue()).decode()


def make_handler(service, lock: threading.Lock):
    class Handler(BaseHTTPRequestHandler):
        timeout = 60  # a stalled client cannot hold the worker forever

        def log_message(self, fmt, *args):  # quiet
            pass

        def _json(self, obj, code=200):
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def _bytes(self, body: bytes, ctype: str):
            self.send_response(200)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/healthz":
                self._json({"ok": True})
            else:
                self._json({"error": "not found"}, 404)

        def do_POST(self):
            try:
                n = int(self.headers.get("Content-Length", 0))
                if n > MAX_BODY_BYTES:
                    # mark the connection non-reusable and drain a bounded
                    # amount of the in-flight body so the client receives
                    # the 413 instead of a TCP RST from closing on unread
                    # data (beyond the cap we just close; abuse-sized
                    # uploads are not worth reading)
                    self.close_connection = True
                    self._json({"error": "request body too large"}, 413)
                    remaining = min(n, 2 * MAX_BODY_BYTES)
                    while remaining > 0:
                        chunk = self.rfile.read(min(remaining, 1 << 20))
                        if not chunk:
                            break
                        remaining -= len(chunk)
                    return
                req = json.loads(self.rfile.read(n) or b"{}")
                with lock:
                    if self.path == "/preprocess":
                        out = service.preprocess(_decode_image(req["image_b64"]))
                        self._json({"image_b64": _encode_image(out)})
                    elif self.path == "/estimate_elevation":
                        elev = service.estimate_elevation(seed=req.get("seed", 0))
                        self._json({"elevation": float(elev)})
                    elif self.path == "/generate_mesh":
                        import tempfile

                        fmt = req.get("format", ".ply")
                        with tempfile.TemporaryDirectory() as td:
                            mesh = service.generate_mesh(
                                out_dir=td,
                                mesh_resolution=req.get("mesh_resolution", 256),
                                seed=req.get("seed", 0),
                            )
                            if fmt == ".glb":
                                from one2345_tpu.recon.gltf import save_glb

                                path = f"{td}/mesh.glb"
                                save_glb(path, mesh["vertices"], mesh["faces"], mesh["colors"])
                                ctype = "model/gltf-binary"
                            else:
                                path = f"{td}/mesh.ply"
                                ctype = "application/octet-stream"
                            self._bytes(open(path, "rb").read(), ctype)
                    else:
                        self._json({"error": "not found"}, 404)
            except Exception as e:  # noqa: BLE001 — surface errors to clients
                self._json({"error": f"{type(e).__name__}: {e}"}, 500)

    return Handler


def serve(service=None, port: int = 8080, host: str = "127.0.0.1",
          warmup: bool = False):
    """Serve the pipeline over HTTP.

    Binds to loopback by default — each request can trigger multi-minute
    accelerator work and there is no auth or rate limiting here; put a
    fronting layer (reverse proxy / API gateway) in charge of both before
    exposing on a routable interface (pass --host 0.0.0.0 explicitly).

    ``warmup`` compiles every stage graph before accepting traffic, so the
    first request runs at steady state instead of paying cold compiles."""
    from one2345_tpu.pipeline.api import One2345Service

    service = service or One2345Service()
    if warmup:
        print("warming up (compiling all stage graphs)...", flush=True)
        timings = service.pipeline.warmup()
        print(f"warm: {timings}", flush=True)
    server = ThreadingHTTPServer((host, port), make_handler(service, threading.Lock()))
    print(f"serving on {host}:{port}")
    server.serve_forever()


def main(argv=None):
    import argparse

    p = argparse.ArgumentParser()
    p.add_argument("--port", type=int, default=8080)
    p.add_argument("--host", default="127.0.0.1",
                   help="bind address; 0.0.0.0 only behind an authenticating proxy")
    p.add_argument("--warmup", action="store_true",
                   help="compile all stage graphs before accepting traffic")
    args = p.parse_args(argv)
    serve(port=args.port, host=args.host, warmup=args.warmup)


if __name__ == "__main__":
    main()
