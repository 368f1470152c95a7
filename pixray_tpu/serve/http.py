"""Streaming HTTP serving front end (stdlib-only).

The reference serves through the external ``cog`` HTTP harness; this module
provides the equivalent surface without it: POST /predictions/<product> with a
JSON body of predictor kwargs; the response streams one multipart PNG part per
intermediate image (the return_display streaming contract).

Serving architecture for a single exclusive accelerator: a ThreadingHTTPServer
handles I/O concurrently (health checks and queued clients are never blocked
by a running render), while ONE worker thread owns the device and drains a
bounded job queue — requests beyond the queue bound are rejected with 503 +
Retry-After (backpressure) instead of piling up.  Per-product predictors are
cached after their first setup() so subsequent requests skip model re-init.

    python -m pixray_tpu.serve.http --port 5000
    curl -X POST localhost:5000/predictions/text2image \
         -d '{"prompts": "a sunrise", "drawer": "pixel"}'
"""

from __future__ import annotations

import argparse
import json
import os
import queue
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from pixray_tpu.serve.predictors import PRODUCTS

BOUNDARY = "pixrayframe"
MAX_PENDING = 4  # bounded job queue: beyond this, reject with 503
JOB_TIMEOUT_S = float(os.environ.get("PIXRAY_TPU_JOB_TIMEOUT", "600"))


class _Job:
    def __init__(self, product: str, kwargs: dict):
        self.product = product
        self.kwargs = kwargs
        self.frames: queue.Queue = queue.Queue()  # file paths; (None, err) ends
        self.cancelled = threading.Event()  # deadline hit: runner must stop


class _Worker(threading.Thread):
    """Single thread that owns the device; drains the job queue in order.

    Each job runs in a helper thread bounded by ``job_timeout`` seconds.  A
    render that exceeds the deadline (a bad config stuck in model load, an
    engine wedged in compile) is cancelled: its client receives a timeout
    error part and the worker moves on to the next job, so one bad request can
    never wedge the queue into permanently 503-ing everyone.  Cancellation is
    cooperative — the runner stops iterating at the next yielded frame; a
    runner blocked INSIDE a single device call is abandoned (daemon thread)
    and the next job proceeds, competing for the device at worst.
    """

    def __init__(self, max_pending: int = MAX_PENDING,
                 job_timeout: float = JOB_TIMEOUT_S):
        super().__init__(daemon=True)
        self.jobs: queue.Queue = queue.Queue(maxsize=max_pending)
        self.job_timeout = job_timeout
        self._predictors: dict = {}

    def submit(self, job: _Job) -> bool:
        try:
            self.jobs.put_nowait(job)
            return True
        except queue.Full:
            return False

    def _run_job(self, job: _Job) -> None:
        try:
            predictor = self._predictors.get(job.product)
            if predictor is None:
                predictor = PRODUCTS[job.product]()
                predictor.setup()
                self._predictors[job.product] = predictor
            for path in predictor.predict(**job.kwargs):
                if job.cancelled.is_set():
                    return  # deadline already reported to the client

                job.frames.put((path, None))
            job.frames.put((None, None))
        except Exception as e:  # surface the error to the waiting client
            if not job.cancelled.is_set():
                job.frames.put((None, f"{type(e).__name__}: {e}"))

    def run(self):
        while True:
            job = self.jobs.get()
            runner = threading.Thread(target=self._run_job, args=(job,),
                                      daemon=True)
            runner.start()
            runner.join(self.job_timeout)
            if runner.is_alive():
                job.cancelled.set()
                job.frames.put(
                    (None, f"TimeoutError: render exceeded the "
                           f"{self.job_timeout:g}s job deadline")
                )


_worker: _Worker | None = None


def get_worker() -> _Worker:
    global _worker
    if _worker is None:
        _worker = _Worker()
        _worker.start()
    return _worker


class PredictionHandler(BaseHTTPRequestHandler):
    def do_GET(self):  # noqa: N802
        if self.path == "/health":
            self.send_response(200)
            self.end_headers()
            self.wfile.write(b"ok")
        elif self.path == "/products":
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.end_headers()
            self.wfile.write(json.dumps(sorted(PRODUCTS)).encode())
        elif self.path == "/queue":
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.end_headers()
            self.wfile.write(
                json.dumps({"pending": get_worker().jobs.qsize(),
                            "capacity": MAX_PENDING}).encode()
            )
        else:
            self.send_error(404)

    def do_POST(self):  # noqa: N802
        if not self.path.startswith("/predictions/"):
            self.send_error(404)
            return
        product = self.path.split("/predictions/", 1)[1].strip("/")
        if product not in PRODUCTS:
            self.send_error(404, f"unknown product {product}")
            return
        length = int(self.headers.get("Content-Length", 0))
        body = self.rfile.read(length) if length else b"{}"
        try:
            kwargs = json.loads(body or "{}")
        except json.JSONDecodeError as e:
            self.send_error(400, f"bad JSON body: {e}")
            return

        job = _Job(product, kwargs)
        if not get_worker().submit(job):
            self.send_response(503, "queue full")
            self.send_header("Retry-After", "30")
            self.end_headers()
            return

        self.send_response(200)
        self.send_header("Content-Type", f"multipart/x-mixed-replace; boundary={BOUNDARY}")
        self.end_headers()
        try:
            while True:
                path, err = job.frames.get()
                if path is None:
                    if err:
                        self.wfile.write(f"--{BOUNDARY}\r\n".encode())
                        self.wfile.write(b"Content-Type: text/plain\r\n\r\n")
                        self.wfile.write(err.encode())
                        self.wfile.write(b"\r\n")
                    break
                data = open(path, "rb").read()
                self.wfile.write(f"--{BOUNDARY}\r\n".encode())
                self.wfile.write(b"Content-Type: image/png\r\n")
                self.wfile.write(f"Content-Length: {len(data)}\r\n\r\n".encode())
                self.wfile.write(data)
                self.wfile.write(b"\r\n")
                self.wfile.flush()
        except BrokenPipeError:
            # client gone: keep draining so the worker never blocks on a
            # full frame queue for a dead connection
            while job.frames.get()[0] is not None:
                pass
            return
        self.wfile.write(f"--{BOUNDARY}--\r\n".encode())


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--host", default="0.0.0.0")
    parser.add_argument("--port", type=int, default=5000)
    args = parser.parse_args()
    get_worker()  # start the device-owning worker before accepting traffic
    server = ThreadingHTTPServer((args.host, args.port), PredictionHandler)
    print(f"pixray_tpu serving on {args.host}:{args.port} — products: {sorted(PRODUCTS)}")
    server.serve_forever()


if __name__ == "__main__":
    main()
