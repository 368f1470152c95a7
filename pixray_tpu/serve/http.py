"""Minimal streaming HTTP serving front end (stdlib-only).

The reference serves through the external ``cog`` HTTP harness; this module
provides the equivalent surface without it: POST /predictions/<product> with a
JSON body of predictor kwargs; the response streams one multipart PNG part per
intermediate image (the return_display streaming contract).

    python -m pixray_tpu.serve.http --port 5000
    curl -X POST localhost:5000/predictions/text2image \
         -d '{"prompts": "a sunrise", "drawer": "pixel"}'
"""

from __future__ import annotations

import argparse
import json
from http.server import BaseHTTPRequestHandler, HTTPServer

from pixray_tpu.serve.predictors import PRODUCTS

BOUNDARY = "pixrayframe"


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
        kwargs = json.loads(body or "{}")

        self.send_response(200)
        self.send_header("Content-Type", f"multipart/x-mixed-replace; boundary={BOUNDARY}")
        self.end_headers()

        predictor = PRODUCTS[product]()
        predictor.setup()
        try:
            for path in predictor.predict(**kwargs):
                data = open(path, "rb").read()
                self.wfile.write(f"--{BOUNDARY}\r\n".encode())
                self.wfile.write(b"Content-Type: image/png\r\n")
                self.wfile.write(f"Content-Length: {len(data)}\r\n\r\n".encode())
                self.wfile.write(data)
                self.wfile.write(b"\r\n")
                self.wfile.flush()
        except BrokenPipeError:
            pass
        self.wfile.write(f"--{BOUNDARY}--\r\n".encode())


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--host", default="0.0.0.0")
    parser.add_argument("--port", type=int, default=5000)
    args = parser.parse_args()
    server = HTTPServer((args.host, args.port), PredictionHandler)
    print(f"pixray_tpu serving on {args.host}:{args.port} — products: {sorted(PRODUCTS)}")
    server.serve_forever()


if __name__ == "__main__":
    main()
