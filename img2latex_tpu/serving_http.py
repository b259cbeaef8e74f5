"""HTTP front-end for the dynamic-batching inference server.

Stdlib-only (``http.server``) so it runs anywhere the framework does; the
TPU work stays on the single ``InferenceServer`` worker thread and the HTTP
threads only block on per-request futures — concurrency comes from request
coalescing into the predictor's compiled batch, not from parallel device
calls.  No reference equivalent (the reference predicts synchronously from
its CLI only, ``training/predictor.py:139-203``).

Endpoints:

* ``POST /predict`` — body is an image (``Content-Type: image/png`` or any
  PIL-readable bytes), or JSON ``{"image_b64": "..."}``; optional decode
  overrides as query params (``beam_size``, ``max_length``, ``temperature``,
  ``top_k``, ``top_p``).  Returns ``{"latex": "..."}``.
* ``POST /predict_batch`` — JSON ``{"images_b64": ["...", ...]}`` plus the
  same query params.  Returns ``{"predictions": ["...", ...]}``.
* ``GET /stats`` — server counters (requests, batches, mean fill/latency).
* ``GET /healthz`` — liveness probe.

Start from the CLI: ``img2latex-tpu serve <checkpoint> --port 8000``.
"""

from __future__ import annotations

import base64
import io
import json
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Any, Dict, Optional
from urllib.parse import parse_qs, urlparse

from img2latex_tpu.serving import InferenceServer
from img2latex_tpu.utils.logging import get_logger

logger = get_logger(__name__)

_OPTION_TYPES = {
    "beam_size": int,
    "max_length": int,
    "temperature": float,
    "top_k": int,
    "top_p": float,
    "length_penalty": float,
    "selective_beam_frac": float,
}


def _decode_options(query: str) -> Dict[str, Any]:
    opts: Dict[str, Any] = {}
    for key, vals in parse_qs(query).items():
        if key in _OPTION_TYPES and vals:
            opts[key] = _OPTION_TYPES[key](vals[0])
    return opts


def _image_from_bytes(data: bytes):
    from PIL import Image

    return Image.open(io.BytesIO(data)).convert("L")


class _Handler(BaseHTTPRequestHandler):
    server_version = "img2latex-tpu"
    # Set by make_http_server:
    inference: InferenceServer = None  # type: ignore[assignment]
    request_timeout_s: float = 60.0

    def log_message(self, fmt, *args):  # route through our logger
        logger.debug("http: " + fmt, *args)

    def _options_baked(self) -> bool:
        """True when the backing predictor cannot take per-request decode
        options (an ExportedPredictor — its decode config is baked into the
        serialized artifact)."""
        from img2latex_tpu.export import ExportedPredictor

        return isinstance(self.inference.predictor, ExportedPredictor)

    # ------------------------------------------------------------------
    def _send_json(self, obj: Dict[str, Any], status: int = 200) -> None:
        body = json.dumps(obj).encode()
        self.send_response(status)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self._response_started = True
        self.wfile.write(body)

    def _read_body(self) -> bytes:
        length = int(self.headers.get("Content-Length", 0))
        return self.rfile.read(length) if length else b""

    # ------------------------------------------------------------------
    def do_GET(self) -> None:  # noqa: N802 (stdlib naming)
        path = urlparse(self.path).path
        if path == "/healthz":
            self._send_json({"status": "ok"})
        elif path == "/stats":
            s = self.inference.stats
            self._send_json(
                {
                    "requests": s.requests,
                    "batches": s.batches,
                    "mean_batch_fill": s.mean_batch_fill,
                    "mean_latency_ms": s.mean_latency_ms,
                    "latency_ms": s.latency_percentiles_ms(),
                }
            )
        else:
            self._send_json({"error": f"unknown path {path}"}, status=404)

    def do_POST(self) -> None:  # noqa: N802
        parsed = urlparse(self.path)
        self._response_started = False
        try:
            opts = _decode_options(parsed.query)  # bad numerics -> JSON 400
            if opts and self._options_baked():
                # An exported artifact bakes its decode config at export time
                # — a tuning query param is a client mistake, not a server
                # fault: answer 400 here instead of letting the unexpected
                # kwarg TypeError 500 the whole coalesced batch.
                self._send_json(
                    {
                        "error": "decode options are baked into this exported "
                        "artifact; re-export with the desired settings "
                        f"(got: {', '.join(sorted(opts))})"
                    },
                    status=400,
                )
                return
            body = self._read_body()
            if parsed.path == "/predict":
                ctype = self.headers.get("Content-Type", "")
                if ctype.startswith("application/json"):
                    payload = json.loads(body)
                    img = _image_from_bytes(base64.b64decode(payload["image_b64"]))
                else:
                    img = _image_from_bytes(body)
                fut = self.inference.submit(img, **opts)
                self._send_json({"latex": fut.result(timeout=self.request_timeout_s)})
            elif parsed.path == "/predict_batch":
                payload = json.loads(body)
                images = [
                    _image_from_bytes(base64.b64decode(b)) for b in payload["images_b64"]
                ]
                futs = [self.inference.submit(img, **opts) for img in images]
                # One SHARED deadline for the whole batch (not timeout x N —
                # a loaded server would otherwise block the handler for up
                # to N * request_timeout_s before answering).
                deadline = time.monotonic() + self.request_timeout_s
                self._send_json(
                    {
                        "predictions": [
                            f.result(timeout=max(0.0, deadline - time.monotonic()))
                            for f in futs
                        ]
                    }
                )
            else:
                self._send_json({"error": f"unknown path {parsed.path}"}, status=404)
        except Exception as exc:  # surface as JSON, keep serving
            import concurrent.futures

            logger.exception("request failed")
            if self._response_started:
                # The failure happened during/after the response write (e.g.
                # BrokenPipeError from a disconnected client) — the socket is
                # dead, a second response would be wrong; just log.
                return
            if isinstance(exc, concurrent.futures.TimeoutError):
                status = 504  # batch worker overloaded — a server fault
            elif isinstance(exc, (ValueError, KeyError, json.JSONDecodeError, OSError)):
                status = 400  # malformed body/params/image
            else:
                status = 500
            try:
                self._send_json({"error": f"{type(exc).__name__}: {exc}"}, status=status)
            except OSError:  # client gone mid-error-response
                logger.debug("error response write failed (client disconnected)")


def make_http_server(
    inference: InferenceServer,
    host: str = "127.0.0.1",
    port: int = 8000,
    request_timeout_s: float = 60.0,
) -> ThreadingHTTPServer:
    """Build (not start) a ThreadingHTTPServer bound to the inference server.
    Call ``serve_forever()`` (blocking) or drive it from a thread; port 0
    picks a free port (``server.server_address[1]``)."""
    handler = type(
        "BoundHandler",
        (_Handler,),
        {"inference": inference, "request_timeout_s": request_timeout_s},
    )
    return ThreadingHTTPServer((host, port), handler)


def serve(
    checkpoint: str,
    host: str = "127.0.0.1",
    port: int = 8000,
    batch_size: Optional[int] = None,
    max_wait_ms: float = 5.0,
    config_overrides: Optional[dict] = None,
    exported: bool = False,
) -> None:
    """Blocking entry point: checkpoint -> Predictor -> InferenceServer ->
    HTTP.  With ``exported=True``, ``checkpoint`` is an ``img2latex-tpu
    export`` artifact directory — served without loading any model code
    (decode settings are baked in, so per-request tuning query params are
    rejected by the artifact)."""
    if exported:
        if config_overrides:
            raise ValueError("--set does not apply to exported artifacts; re-export")
        from img2latex_tpu.export import ExportedPredictor

        predictor = ExportedPredictor.load(checkpoint)
        if batch_size:
            # Runtime coalesce cap (not a baked decode setting): exact chunk
            # shape for symbolic artifacts, clamped to exported sizes
            # otherwise — mirrors `predict --exported --batch-size`.
            predictor.batch_size = batch_size
    else:
        from img2latex_tpu.training.predictor import Predictor

        predictor = Predictor.from_checkpoint(
            checkpoint, batch_size=batch_size or 16, config_overrides=config_overrides
        )
    with InferenceServer(predictor, max_wait_ms=max_wait_ms) as inference:
        httpd = make_http_server(inference, host, port)
        bound_port = httpd.server_address[1]
        logger.info("Serving on http://%s:%d (batch %d)", host, bound_port, predictor.batch_size)
        try:
            httpd.serve_forever()
        except KeyboardInterrupt:
            pass
        finally:
            httpd.shutdown()


def serve_in_thread(
    inference: InferenceServer, host: str = "127.0.0.1", port: int = 0
):
    """Test/embedding helper: start the HTTP server on a daemon thread;
    returns (httpd, port)."""
    httpd = make_http_server(inference, host, port)
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    return httpd, httpd.server_address[1]
