"""HTTP inference server over a ServingModel artifact.

Request path: tokenize question -> gather image features by img_id ->
pad to the exported static batch -> AOT-compiled predict -> answer strings.

Endpoints:
    GET  /healthz    -> {"status": "ok", ...artifact meta summary}
    POST /predict    body {"queries": [{"img_id": ..., "sent": ...}, ...]}
                     -> {"answers": [...], "latency_ms": float}

stdlib-only (http.server); requests larger than the exported batch size are
chunked server-side. This is intentionally a thin, dependency-free reference
server - production fleets would put batching/routing in front, but the
artifact + feature-store + tokenizer plumbing here is the real serving path.
"""
from __future__ import annotations

import json
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Dict, List

import numpy as np

from xggm_tpu.config import MAX_SEQ_LENGTH
from xggm_tpu.data.tokenizer import BertTokenizer, encode_batch
from xggm_tpu.serving.artifact import ServingModel


class InferenceEngine:
    """ServingModel + tokenizer + feature store: queries in, answers out."""

    def __init__(self, model: ServingModel, tokenizer: BertTokenizer, store):
        self.model = model
        self.tokenizer = tokenizer
        self.store = store

    def _assemble(self, queries: List[Dict]) -> Dict[str, np.ndarray]:
        ids, mask, seg = encode_batch(
            self.tokenizer, (q["sent"] for q in queries),
            self.model.meta.get("seq_len", MAX_SEQ_LENGTH))
        n = len(queries)
        feat_dim = self.model.meta["feat_dim"]
        n_obj = self.model.meta["num_objects"]
        feats = np.empty((n, n_obj, feat_dim), np.float32)
        boxes = np.empty((n, n_obj, 4), np.float32)
        for i, q in enumerate(queries):
            f, b, _adj = self.store.get(q["img_id"])
            feats[i], boxes[i] = f, b
        return {"input_ids": ids, "input_mask": mask, "segment_ids": seg,
                "feats": feats, "boxes": boxes}

    def answer(self, queries: List[Dict]) -> List[str]:
        bs = self.model.batch_size or len(queries)
        out: List[str] = []
        for start in range(0, len(queries), bs):
            chunk = queries[start:start + bs]
            out.extend(self.model.predict_answers(self._assemble(chunk)))
        return out


def make_server(engine: InferenceEngine, host: str = "127.0.0.1",
                port: int = 8000) -> ThreadingHTTPServer:
    class Handler(BaseHTTPRequestHandler):
        def _send(self, code: int, payload: dict):
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/healthz":
                meta = engine.model.meta
                self._send(200, {
                    "status": "ok",
                    "batch_size": meta["batch_size"],
                    "num_answers": meta["num_answers"],
                    "platforms": meta["platforms"],
                    "jax_version": meta["jax_version"],
                })
            else:
                self._send(404, {"error": f"unknown path {self.path}"})

        def do_POST(self):
            if self.path != "/predict":
                self._send(404, {"error": f"unknown path {self.path}"})
                return
            try:
                length = int(self.headers.get("Content-Length", 0))
                req = json.loads(self.rfile.read(length) or b"{}")
                queries = req["queries"]
                assert isinstance(queries, list) and queries, \
                    "queries must be a non-empty list"
                for q in queries:
                    assert "img_id" in q and "sent" in q, \
                        "each query needs img_id and sent"
                t0 = time.perf_counter()
                answers = engine.answer(queries)
                ms = (time.perf_counter() - t0) * 1e3
                self._send(200, {"answers": answers, "latency_ms": ms})
            except Exception as e:  # surface errors as JSON, keep serving
                self._send(400, {"error": f"{type(e).__name__}: {e}"})

        def log_message(self, fmt, *args):  # quiet: JSONL metrics cover it
            pass

    return ThreadingHTTPServer((host, port), Handler)
