"""Threaded HTTP front-end over (ServingEngine + MicroBatcher).

Endpoints:
  GET  /healthz     -> {"status": "ok"}
  GET  /v1/stats    -> batcher + engine statistics
  POST /v1/predict  -> run one request through the batched forward
  POST /v1/profile  -> capture an XProf trace of live traffic
                       ({"seconds": 3, "dir": optional}); 409 if one
                       is already running

Request JSON for /v1/predict:
  {"fields": {name: nested-list-or-scalar, ...},   # array inputs
   "text": "..."}                                  # optional; routed
                                                   # through the loaded
                                                   # text processor when
                                                   # the engine has one

Response JSON: every output field as nested lists, plus "label" and
"confidence" (softmax over "scores") when the model emits scores.

Concurrency model: the stdlib ThreadingHTTPServer gives one thread per
connection; every handler submits to the shared MicroBatcher, so
concurrent requests ride the same device batch. The TPU work itself is
single-file through the batcher's worker thread — the right shape for a
single-chip server (devices don't multi-tenant well; throughput comes
from batching, not from concurrent executables).
"""

from __future__ import annotations

import json
import logging
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Any, Callable, Dict, Optional

import numpy as np

from mmf_tpu.serving.batcher import MicroBatcher
from mmf_tpu.serving.engine import ServingEngine

logger = logging.getLogger(__name__)


def _to_array(v):
    arr = np.asarray(v)
    if arr.dtype == np.float64:
        arr = arr.astype(np.float32)
    elif arr.dtype == np.int64:
        arr = arr.astype(np.int32)
    return arr


def default_prepare(engine: ServingEngine,
                    request: Dict[str, Any]) -> Dict[str, Any]:
    """Request JSON -> sample dict of arrays. ``fields`` pass through as
    arrays; ``text`` runs the engine's text processor when present."""
    sample: Dict[str, Any] = {}
    for k, v in (request.get("fields") or {}).items():
        sample[k] = _to_array(v)
    text = request.get("text")
    if text is not None:
        processors = getattr(engine, "processors", None)
        if processors and "text_processor" in processors:
            from mmf_tpu.datasets.processors.processors import Processor

            if not hasattr(engine, "_text_processor"):
                engine._text_processor = Processor(
                    processors["text_processor"]
                )
            out = engine._text_processor({"text": text})
            for k, v in out.items():
                if isinstance(v, np.ndarray):
                    sample[k] = v
        else:
            raise ValueError(
                "request has 'text' but the engine exposes no "
                "text_processor; send pre-processed 'fields' instead"
            )
    if not sample:
        raise ValueError("empty request: provide 'fields' and/or 'text'")
    return sample


def default_render(output: Any) -> Dict[str, Any]:
    """Per-sample model output -> JSON-serializable response."""
    if not isinstance(output, dict):
        output = {"output": output}
    resp: Dict[str, Any] = {}
    for k, v in output.items():
        if k == "losses":
            continue
        arr = np.asarray(v)
        resp[k] = arr.tolist()
    scores = output.get("scores")
    if scores is not None:
        s = np.asarray(scores, np.float32)
        if s.ndim == 1:
            e = np.exp(s - s.max())
            probs = e / e.sum()
            top = int(probs.argmax())
            resp["label"] = top
            resp["confidence"] = float(probs[top])
    return resp


class ServingServer:
    """Owns the HTTP server, the batcher and their lifecycle."""

    def __init__(
        self,
        engine: ServingEngine,
        host: str = "127.0.0.1",
        port: int = 8080,
        max_wait_ms: float = 5.0,
        prepare: Optional[Callable] = None,
        render: Optional[Callable] = None,
    ):
        self.engine = engine
        self.prepare = prepare or default_prepare
        self.render = render or default_render
        self.batcher = MicroBatcher(
            engine.predict_many,
            max_batch_size=engine.max_batch_size,
            max_wait_ms=max_wait_ms,
            # pipelined: dispatch batch N+1 while batch N's results are
            # fetched — stacking/transfer overlap device compute
            predict_many_async=getattr(engine, "predict_many_async", None),
        )
        server = self

        class Handler(BaseHTTPRequestHandler):
            protocol_version = "HTTP/1.1"

            def log_message(self, fmt, *args):  # route through logging
                logger.debug("%s %s", self.address_string(), fmt % args)

            def _send(self, code: int, payload: Dict[str, Any]):
                body = json.dumps(payload).encode()
                self.send_response(code)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def do_GET(self):
                if self.path == "/healthz":
                    self._send(200, {"status": "ok"})
                elif self.path == "/v1/stats":
                    self._send(200, server.stats())
                else:
                    self._send(404, {"error": f"no route {self.path}"})

            def do_POST(self):
                if self.path == "/v1/profile":
                    try:
                        length = int(self.headers.get("Content-Length", 0))
                        req = json.loads(self.rfile.read(length) or b"{}")
                        result = server.profile(
                            seconds=float(req.get("seconds", 3.0)),
                            trace_dir=req.get("dir"),
                        )
                        self._send(200, result)
                    except RuntimeError as e:
                        self._send(409, {"error": str(e)})
                    except Exception as e:  # noqa: BLE001
                        logger.exception("profile failed")
                        self._send(500, {"error": f"{type(e).__name__}: {e}"})
                    return
                if self.path != "/v1/predict":
                    self._send(404, {"error": f"no route {self.path}"})
                    return
                try:
                    length = int(self.headers.get("Content-Length", 0))
                    request = json.loads(self.rfile.read(length) or b"{}")
                    sample = server.prepare(server.engine, request)
                    # schema check BEFORE enqueue: a malformed request
                    # 400s alone instead of failing its shared batch
                    validate = getattr(server.engine, "validate_sample", None)
                    if validate is not None:
                        validate(sample)
                    output = server.batcher.predict(sample, timeout=60)
                    self._send(200, server.render(output))
                except ValueError as e:
                    self._send(400, {"error": str(e)})
                except Exception as e:  # noqa: BLE001 — server boundary
                    logger.exception("predict failed")
                    self._send(500, {"error": f"{type(e).__name__}: {e}"})

        self.httpd = ThreadingHTTPServer((host, port), Handler)
        self.httpd.daemon_threads = True
        self._thread: Optional[threading.Thread] = None
        self._profile_lock = threading.Lock()

    @property
    def port(self) -> int:
        return self.httpd.server_address[1]

    def profile(self, seconds: float = 3.0,
                trace_dir: Optional[str] = None) -> Dict[str, Any]:
        """Capture a jax.profiler (XProf) trace of live traffic for
        ``seconds``; POST /v1/profile {"seconds": 3}. One capture at a
        time — concurrent requests get 409. The handler thread blocks,
        but other connections keep serving (that's the traffic being
        profiled)."""
        import tempfile
        import time as time_mod

        import jax

        if not self._profile_lock.acquire(blocking=False):
            raise RuntimeError("a profile capture is already running")
        try:
            out = trace_dir or tempfile.mkdtemp(prefix="mmf_serve_trace_")
            jax.profiler.start_trace(out)
            time_mod.sleep(max(0.0, min(seconds, 60.0)))
            jax.profiler.stop_trace()
            return {"trace_dir": out, "seconds": seconds}
        finally:
            self._profile_lock.release()

    def stats(self) -> Dict[str, Any]:
        return {
            "batcher": self.batcher.stats(),
            "engine": {
                "buckets": list(self.engine.buckets),
                "max_batch_size": self.engine.max_batch_size,
            },
        }

    def start(self):
        """Serve on a background thread (returns immediately)."""
        self._thread = threading.Thread(
            target=self.httpd.serve_forever, name="mmf-serve-http",
            daemon=True,
        )
        self._thread.start()
        return self

    def serve_forever(self):
        self.httpd.serve_forever()

    def shutdown(self):
        self.httpd.shutdown()
        self.httpd.server_close()
        if self._thread is not None:
            self._thread.join(timeout=10)
        self.batcher.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.shutdown()
