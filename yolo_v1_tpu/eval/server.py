"""HTTP serving daemon over the batched Predictor (``cli serve``).

Production-serving shape beyond the reference, whose only "serving" is a
script loop over a dataset (`/root/reference/run_voc_mAP.py:74`,
eval.py:84-95).  One process, one compiled program, micro-batched
requests:

* The device program has ONE fixed shape (``[batch, size, size, 3]``
  uint8): arbitrary request rates never trigger a recompile — a distinct
  jitted shape costs minutes over remote-compile TPU links (CLAUDE.md) and
  tens of seconds locally.
* Requests queue; a dispatcher thread drains up to ``batch`` of them per
  device call (padding the tail), so concurrent clients ride the same MXU
  pass instead of serializing 1-image programs — batched serving measures
  ~36x the reference's bs=1 loop on v5e (docs/DESIGN.md).
* Endpoints: ``POST /predict`` (JPEG/PNG bytes in, JSON detections out,
  boxes normalized xyxy), ``GET /healthz``, and ``GET /metrics``
  (Prometheus text exposition: request/batch/error counters, mean batch
  fill, device-call latency, live queue depth).

The daemon is intentionally stdlib-only (ThreadingHTTPServer): it
demonstrates the serving SHAPE — fixed-shape micro-batching in front of
one jit — that a production front-end (gRPC, load balancer) would wrap.
"""

from __future__ import annotations

import json
import queue
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np


class _Pending:
    __slots__ = ("image", "event", "result", "error")

    def __init__(self, image: np.ndarray):
        self.image = image
        self.event = threading.Event()
        self.result = None
        self.error: str | None = None


class PredictionServer:
    """Micro-batching dispatcher + HTTP front end over a ``Predictor``.

    Args:
      predictor: eval.predictor.Predictor (its jit defines the batch shape).
      image_size: square resize applied to every request image.
      batch: device batch size — the dispatcher drains up to this many
        queued requests per device call and pads the remainder.
      max_wait_ms: how long the dispatcher waits to fill a batch after the
        first request arrives; latency/throughput knob (0 = dispatch
        immediately, serving whatever is queued).
    """

    def __init__(
        self,
        predictor,
        image_size: int,
        batch: int,
        host: str = "127.0.0.1",
        port: int = 0,
        max_wait_ms: float = 2.0,
        request_timeout_s: float = 600.0,
        logger=None,
    ):
        self.predictor = predictor
        self.image_size = image_size
        self.batch = batch
        self.max_wait_s = max_wait_ms / 1e3
        self.request_timeout_s = request_timeout_s
        self.logger = logger
        self.served = 0
        # Serving metrics, written only by the single dispatcher thread
        # (reads from handler threads see a consistent-enough snapshot —
        # these are monotonic counters, not invariants).
        self.batches = 0
        self.errors = 0
        self._fill_sum = 0
        self._device_s_sum = 0.0
        self._device_s_max = 0.0
        self._queue: "queue.Queue[_Pending]" = queue.Queue()
        self._stop = threading.Event()
        self._dispatcher = threading.Thread(
            target=self._dispatch_loop, daemon=True
        )

        server = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, fmt, *args):  # route to our logger
                if server.logger:
                    server.logger.debug("http: " + fmt % args)

            def _reply(self, code: int, payload: dict):
                body = json.dumps(payload).encode()
                self.send_response(code)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def do_GET(self):
                if self.path == "/metrics":
                    body = server.metrics_text().encode()
                    self.send_response(200)
                    self.send_header(
                        "Content-Type", "text/plain; version=0.0.4"
                    )
                    self.send_header("Content-Length", str(len(body)))
                    self.end_headers()
                    self.wfile.write(body)
                    return
                if self.path != "/healthz":
                    return self._reply(404, {"error": "unknown path"})
                self._reply(
                    200,
                    {"status": "ok", "batch": server.batch,
                     "image_size": server.image_size,
                     "served": server.served},
                )

            def do_POST(self):
                if self.path != "/predict":
                    return self._reply(404, {"error": "unknown path"})
                n = int(self.headers.get("Content-Length", 0))
                if n <= 0:
                    return self._reply(400, {"error": "empty body"})
                raw = self.rfile.read(n)
                try:
                    img = server._decode(raw)
                except Exception as e:
                    return self._reply(400, {"error": f"bad image: {e}"})
                pending = _Pending(img)
                server._queue.put(pending)
                # Bounded wait: a wedged device op must surface as a 504,
                # not a silently hung connection (relay TPU links can wedge
                # — the training loop grew a watchdog for the same reason).
                if not pending.event.wait(timeout=server.request_timeout_s):
                    return self._reply(504, {"error": "prediction timed out"})
                if pending.error:
                    return self._reply(500, {"error": pending.error})
                self._reply(200, {"detections": pending.result})

        self.httpd = ThreadingHTTPServer((host, port), Handler)
        self.port = self.httpd.server_address[1]
        self._http_thread = threading.Thread(
            target=self.httpd.serve_forever, daemon=True
        )

    def _decode(self, raw: bytes) -> np.ndarray:
        import cv2

        buf = np.frombuffer(raw, np.uint8)
        img = cv2.imdecode(buf, cv2.IMREAD_COLOR)
        if img is None:
            raise ValueError("not a decodable image")
        img = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
        return cv2.resize(img, (self.image_size, self.image_size))

    def _dispatch_loop(self):
        while not self._stop.is_set():
            try:
                first = self._queue.get(timeout=0.1)
            except queue.Empty:
                continue
            todo = [first]
            # Fill the batch for up to max_wait_s after the first arrival.
            t0 = time.perf_counter()
            while len(todo) < self.batch:
                left = self.max_wait_s - (time.perf_counter() - t0)
                if left <= 0:
                    break
                try:
                    todo.append(self._queue.get(timeout=left))
                except queue.Empty:
                    break
            images = np.stack([p.image for p in todo])
            if len(todo) < self.batch:  # ONE compiled shape, always
                pad = np.zeros_like(images[:1]).repeat(
                    self.batch - len(todo), 0
                )
                images = np.concatenate([images, pad])
            t_call = time.perf_counter()
            try:
                dets = self.predictor(images)[: len(todo)]
                for p, d in zip(todo, dets):
                    p.result = d
            except Exception as e:  # surface device errors to every caller
                for p in todo:
                    p.error = f"{type(e).__name__}: {e}"
                self.errors += len(todo)
            dt = time.perf_counter() - t_call
            self.batches += 1
            self._fill_sum += len(todo)
            self._device_s_sum += dt
            self._device_s_max = max(self._device_s_max, dt)
            self.served += len(todo)
            if self.logger:
                self.logger.info(
                    "served batch of %d (total %d)", len(todo), self.served
                )
            for p in todo:
                p.event.set()

    def metrics_text(self) -> str:
        """Prometheus text exposition of the serving counters (the
        observability surface a production front-end scrapes; the
        reference has nothing comparable)."""
        b = max(self.batches, 1)
        lines = [
            "# TYPE yolo_requests_served_total counter",
            f"yolo_requests_served_total {self.served}",
            "# TYPE yolo_request_errors_total counter",
            f"yolo_request_errors_total {self.errors}",
            "# TYPE yolo_device_batches_total counter",
            f"yolo_device_batches_total {self.batches}",
            "# TYPE yolo_batch_fill_avg gauge",
            f"yolo_batch_fill_avg {self._fill_sum / b:.4f}",
            "# TYPE yolo_batch_capacity gauge",
            f"yolo_batch_capacity {self.batch}",
            "# TYPE yolo_device_call_seconds_avg gauge",
            f"yolo_device_call_seconds_avg {self._device_s_sum / b:.6f}",
            "# TYPE yolo_device_call_seconds_max gauge",
            f"yolo_device_call_seconds_max {self._device_s_max:.6f}",
            "# TYPE yolo_queue_depth gauge",
            f"yolo_queue_depth {self._queue.qsize()}",
        ]
        return "\n".join(lines) + "\n"

    def start(self):
        self._dispatcher.start()
        self._http_thread.start()

    def stop(self):
        self._stop.set()
        # Fail queued-but-undispatched requests instead of leaving their
        # handler threads parked on event.wait().
        while True:
            try:
                p = self._queue.get_nowait()
            except queue.Empty:
                break
            p.error = "server shutting down"
            p.event.set()
        self.httpd.shutdown()
        self.httpd.server_close()

    def serve_forever(self):
        """Blocking variant for the CLI."""
        self.start()
        try:
            self._http_thread.join()
        except KeyboardInterrupt:
            self.stop()
