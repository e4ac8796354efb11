"""Endpoint-backed spam classifier (reference diagram comp. 9's
model-serving leg — the SageMaker-endpoint variant the reference marks
optional; `functions/spam.py` names this seam and this module fills it).

Architecture mirrors how a Spark job scores against a real inference
endpoint:

* **Batched HTTP from executors.** `classify_endpoint` is a `mapInPandas`
  transform: each Arrow batch becomes ONE `POST /score` carrying every
  text in the batch — request count scales with batches, not rows (the
  difference between 10^3 and 10^9 HTTP calls at 100 TB). Batch size is
  the Arrow batch knob (`spark.sql.execution.arrow.maxRecordsPerBatch`),
  which is exactly how you match an endpoint's max-payload limit.
* **Timeout + bounded retries + local fallback.** Every call carries a
  timeout; transient failures retry with linear backoff; when the budget
  is exhausted the batch falls back to the SAME quantized NB decision
  rule evaluated in-process, so the pipeline degrades to the U1 local
  path instead of failing the stage. Labels are identical either way by
  construction (the stub serves the same quantized weights), which is
  what makes the endpoint leg oracle-checkable.
* **The stub server** (`SpamEndpointStub`) is a stdlib `http.server` on a
  daemon thread in the driver process — local-mode executors are
  processes on the same host, so 127.0.0.1 works; on a cluster the URL
  would point at a real service. It counts requests so tests can prove
  the endpoint path (not the fallback) actually served.

No third-party dependencies: urllib + http.server only.
"""

from __future__ import annotations

import json
import threading
import time
import urllib.error
import urllib.request
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame

from .spam import NBModel, _tokens, quantized_weights


def _decide_batch(
    texts: list[str], w: dict[str, int], default: int, prior: int
) -> list[bool]:
    """The quantized NB decision rule (see spam.quantized_weights) over a
    batch — shared verbatim by the stub server and the local fallback, so
    endpoint and fallback labels cannot diverge."""
    out = []
    for text in texts:
        s = prior
        for tok in _tokens(text or ""):
            s += w.get(tok, default)
        out.append(s >= 0)
    return out


class SpamEndpointStub:
    """In-process scoring endpoint: POST /score {"texts": [...]} ->
    {"labels": [...]}. Daemon-threaded; `n_requests` exposes how many
    batch calls it served (the proof the endpoint leg ran)."""

    def __init__(self, model: NBModel | None = None) -> None:
        self._weights = quantized_weights(model)
        self._lock = threading.Lock()
        self.n_requests = 0
        self._server: ThreadingHTTPServer | None = None
        self.url: str | None = None

    def start(self) -> str:
        stub = self

        class Handler(BaseHTTPRequestHandler):
            def do_POST(self) -> None:  # noqa: N802 — http.server API
                body = self.rfile.read(int(self.headers.get("Content-Length", 0)))
                texts = json.loads(body)["texts"]
                w, default, prior = stub._weights
                labels = _decide_batch(texts, w, default, prior)
                payload = json.dumps({"labels": labels}).encode()
                with stub._lock:
                    stub.n_requests += 1
                self.send_response(200)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(payload)))
                self.end_headers()
                self.wfile.write(payload)

            def log_message(self, *args) -> None:  # silence stderr
                pass

        self._server = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
        threading.Thread(target=self._server.serve_forever, daemon=True).start()
        self.url = f"http://127.0.0.1:{self._server.server_port}/score"
        return self.url

    def stop(self) -> None:
        if self._server is not None:
            self._server.shutdown()
            self._server.server_close()
            self._server = None


def classify_endpoint(
    docs: DataFrame,
    url: str,
    model: NBModel | None = None,
    timeout: float = 2.0,
    retries: int = 2,
) -> DataFrame:
    """(doc_id, is_spam) via batched HTTP against ``url``, with retry and
    local-model fallback. One POST per Arrow batch via mapInPandas."""
    w, default, prior = quantized_weights(model)

    def score_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            texts = ["" if t is None else str(t) for t in pdf["text"]]
            labels: list[bool] | None = None
            payload = json.dumps({"texts": texts}).encode()
            for attempt in range(retries + 1):
                try:
                    req = urllib.request.Request(
                        url, data=payload, headers={"Content-Type": "application/json"}
                    )
                    with urllib.request.urlopen(req, timeout=timeout) as resp:
                        labels = json.loads(resp.read())["labels"]
                    break
                except (urllib.error.URLError, OSError, ValueError, KeyError):
                    if attempt < retries:
                        time.sleep(0.1 * (attempt + 1))  # linear backoff
            if labels is None:  # budget exhausted -> local NB fallback
                labels = _decide_batch(texts, w, default, prior)
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "is_spam": labels})

    return docs.select("doc_id", "text").mapInPandas(
        score_batches, "doc_id bigint, is_spam boolean"
    )
