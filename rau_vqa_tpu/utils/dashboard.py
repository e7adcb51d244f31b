"""Live training dashboard (stdlib HTTP).

Parity piece for the reference's `display` live-plot server
(Ours_SS/...lua:743-746, 793-822): a tiny zero-dependency web UI over the
run directory — renders the current metric curves on request and tails the
JSONL stream, no background plotting thread in the trainer.

    python -m rau_vqa_tpu.utils.dashboard <workdir> [port]
"""

from __future__ import annotations

import html
import json
import os
import sys
from http.server import BaseHTTPRequestHandler, HTTPServer


def _page(workdir: str, n_hops: int) -> str:
    from rau_vqa_tpu.utils.logging import MetricsLogger

    rows = MetricsLogger(os.path.join(workdir, "training_log")).read()
    last_train = next((r for r in reversed(rows) if r.get("kind") == "train"),
                      {})
    last_test = next((r for r in reversed(rows) if r.get("kind") == "test"),
                     {})
    graphs = sorted(os.listdir(os.path.join(workdir, "graphs"))) \
        if os.path.isdir(os.path.join(workdir, "graphs")) else []
    imgs = "".join(f'<div><h4>{html.escape(g)}</h4>'
                   f'<img src="/graphs/{html.escape(g)}"></div>'
                   for g in graphs if g.endswith(".png"))
    def table(d):
        items = "".join(f"<tr><td>{html.escape(str(k))}</td>"
                        f"<td>{html.escape(f'{v:.5g}' if isinstance(v, float) else str(v))}</td></tr>"
                        for k, v in sorted(d.items()))
        return f"<table border=1 cellpadding=3>{items}</table>"
    return f"""<html><head><title>rau_vqa_tpu dashboard</title>
<meta http-equiv="refresh" content="15"></head>
<body><h2>{html.escape(workdir)}</h2>
<h3>latest train record</h3>{table(last_train)}
<h3>latest test record</h3>{table(last_test)}
<h3>curves</h3>{imgs}
</body></html>"""


def make_handler(workdir: str, n_hops: int):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *args):
            pass

        def do_GET(self):
            if self.path.startswith("/graphs/"):
                name = os.path.basename(self.path)
                path = os.path.join(workdir, "graphs", name)
                if os.path.exists(path):
                    self.send_response(200)
                    self.send_header("Content-Type", "image/png")
                    self.end_headers()
                    with open(path, "rb") as f:
                        self.wfile.write(f.read())
                    return
                self.send_error(404)
                return
            if self.path == "/metrics.jsonl":
                path = os.path.join(workdir, "training_log", "metrics.jsonl")
                self.send_response(200)
                self.send_header("Content-Type", "application/jsonl")
                self.end_headers()
                if os.path.exists(path):
                    with open(path, "rb") as f:
                        self.wfile.write(f.read())
                return
            # render fresh curves, then the page
            try:
                from rau_vqa_tpu.utils.plots import render_curves
                render_curves(os.path.join(workdir, "training_log"),
                              os.path.join(workdir, "graphs"), n_hops)
            except Exception:
                pass
            body = _page(workdir, n_hops).encode()
            self.send_response(200)
            self.send_header("Content-Type", "text/html")
            self.end_headers()
            self.wfile.write(body)

    return Handler


def serve_dashboard(workdir: str, port: int = 8000, n_hops: int = 8) -> None:
    server = HTTPServer(("0.0.0.0", port), make_handler(workdir, n_hops))
    print(f"dashboard for {workdir} on http://localhost:{port}")
    server.serve_forever()


if __name__ == "__main__":
    wd = sys.argv[1] if len(sys.argv) > 1 else "."
    port = int(sys.argv[2]) if len(sys.argv) > 2 else 8000
    serve_dashboard(wd, port)
