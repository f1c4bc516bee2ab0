"""Optional HTTP façade over ``api.Engine`` — SURVEY.md §2.16 closed
end-to-end.

The reference serves its engine through FastAPI (reference
app/main.py:63-211, app/api/endpoints/search.py:46-431,
app/api/endpoints/admin.py:19-134). The Spark engine's query surface
lives in ``api.Engine`` as methods; this module puts the same routes in
front of it using ONLY the standard library (http.server), so the repo
stays dependency-free while a user of the reference can hit the same
paths:

  GET  /health                        -> Engine.health()
  GET  /api/collections               -> Engine.collections()
  GET  /api/query?q=&mode=&count=     -> Engine.query()      (V1/V2/V3)
  GET  /api/dense?query=&limit=       -> Engine.query(mode="dense")  (V1)
  GET  /api/sparse?query=&limit=      -> Engine.query(mode="sparse") (V2)
  GET  /api/hybrid?query=&limit=      -> Engine.query(mode="hybrid") (V3)
  GET  /api/methods-info              -> static method introspection
  GET  /api/test                      -> service self-check
  POST /api/load-data?table=          -> Engine.load_data()   (S3+I6)
  GET  /api/search?q=&count=&filter_field=&filter_value=&use_fusion=
  POST /api/search  (same params as a JSON body)
                                      -> Engine.search()     (V5 + Q2)
  GET  /api/search/ultra-fast?q=      -> Engine.search_ultra_fast()
  GET  /api/search/lean?q=            -> Engine.search_lean()
  GET  /api/search/really-fast?q=     -> Engine.search_really_fast() (alias)
  POST /api/search/optimize           -> Engine.optimize()  (service warmup)
  GET  /api/collections/{c}/stats     -> Engine.collection_stats()
  GET  /api/search/fusion?q=          -> Engine.search_fusion()  (V4)
  GET  /api/search/compare?q=         -> Engine.compare()        (V7)
  GET  /api/search/performance-stats  -> Engine.performance_stats()
  DELETE /api/search/cache            -> Engine.clear_cache()
  GET  /api/import?dir=&table=        -> Engine.import_full()       (S4)
  GET  /api/importdelta?dir=&table=   -> Engine.import_delta()      (S5)
  GET  /api/export?path=              -> Engine.export()            (S6)
  GET  /api/reset                     -> Engine.reset()             (M9)

Responses are ``{"results": [...], "count": n, "query": q}`` for search
routes (the reference's envelope shape) and the raw dict elsewhere.
Unknown routes 404; operator errors 400 with the message. This is a
driver-side serving veneer: each request builds/collects one DataFrame
plan, which is the reference's request/response model — throughput
serving belongs to the batch APIs (``*_batch`` queries), not HTTP.
"""

from __future__ import annotations

import json
import os
import tempfile
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

from .api import Engine

# field-mapping introspection (reference app/api/endpoints/search.py:545-590):
# static metadata about the three search modes, served by /api/methods-info
_SEARCH_FIELDS = {
    "dense": ["shortDescription_airgas_text"],
    "sparse": [
        "shortDescription_airgas_text",
        "partNumber_airgas_text",
        "manufacturerPartNumber_text",
    ],
}

_METHODS_INFO = {
    "available_methods": {
        "query": {
            "name": "Flexible Query",
            "description": "Flexible search with mode selection",
            "modes": ["dense", "sparse", "hybrid"],
            "type": "flexible",
            "endpoint": "/api/query",
        },
        "dense": {
            "name": "Dense Search",
            "description": "Semantic vector search on product descriptions only",
            "fields": _SEARCH_FIELDS["dense"],
            "type": "vector",
            "endpoint": "/api/dense",
        },
        "sparse": {
            "name": "BM25 Sparse Search",
            "description": "BM25 keyword search over the posting index",
            "fields": _SEARCH_FIELDS["sparse"],
            "type": "sparse",
            "endpoint": "/api/sparse",
        },
        "hybrid": {
            "name": "Hybrid Search",
            "description": "Dense + BM25 fusion by reciprocal rank",
            "fields": _SEARCH_FIELDS["dense"] + _SEARCH_FIELDS["sparse"],
            "type": "hybrid_rrf",
            "endpoint": "/api/hybrid",
        },
    },
    "field_mapping": {
        "dense_search_fields": _SEARCH_FIELDS["dense"],
        "sparse_search_fields": _SEARCH_FIELDS["sparse"],
        "available_fields": [
            "partNumber_airgas_text",
            "manufacturerPartNumber_text",
            "shortDescription_airgas_text",
            "onlinePrice_string",
            "img_270Wx270H_string",
        ],
    },
    "fusion_method": "rrf",
    "service_status": "available",
}


def _rows(df) -> list[dict]:
    return [r.asDict(recursive=True) for r in df.collect()]


def make_server(engine: Engine, host: str = "127.0.0.1", port: int = 0):
    """Build (without starting) a ThreadingHTTPServer bound to the
    engine. ``port=0`` picks a free port (``server.server_port``)."""

    class Handler(BaseHTTPRequestHandler):
        def _send(self, code: int, payload: dict) -> None:
            body = json.dumps(payload).encode("utf-8")
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, fmt, *args):  # quiet: no stderr per request
            pass

        def _envelope(self, q: str, df) -> dict:
            rows = _rows(df)
            return {"results": rows, "count": len(rows), "query": q}

        def do_GET(self):  # noqa: N802 — http.server contract
            parsed = urlparse(self.path)
            # keep_blank_values: filter_value= (explicit empty string)
            # must reach the engine as "", not vanish — dropping it
            # would turn a legitimate empty-string filter into a 400
            qs = {
                k: v[0]
                for k, v in parse_qs(
                    parsed.query, keep_blank_values=True
                ).items()
            }
            q = qs.get("q", "")
            # parsed lazily so a malformed count only 400s routes that
            # actually take one (a bad ?count= must not fail /health or
            # /api/export, which never read it)
            def count() -> int:
                return int(qs.get("count", "10"))

            try:
                if parsed.path == "/health":
                    self._send(200, engine.health())
                elif parsed.path == "/api/collections":
                    self._send(200, engine.collections())
                elif parsed.path == "/api/query":
                    mode = qs.get("mode", "hybrid")
                    self._send(
                        200, self._envelope(q, engine.query(q, mode, count()))
                    )
                elif parsed.path == "/api/search":
                    df = engine.search(
                        q,
                        count(),
                        filter_field=qs.get("filter_field"),
                        filter_value=qs.get("filter_value"),
                        use_fusion=qs.get("use_fusion", "").lower()
                        in ("1", "true", "yes"),
                    )
                    self._send(200, self._envelope(q, df))
                elif parsed.path == "/api/search/ultra-fast":
                    self._send(
                        200, self._envelope(q, engine.search_ultra_fast(q, count()))
                    )
                elif parsed.path == "/api/search/lean":
                    self._send(200, self._envelope(q, engine.search_lean(q, count())))
                elif parsed.path == "/api/search/really-fast":
                    # reference: backward-compat alias of ultra-fast
                    # (app/api/endpoints/search.py:257-262)
                    self._send(
                        200,
                        self._envelope(q, engine.search_really_fast(q, count())),
                    )
                elif parsed.path == "/api/search/fusion":
                    self._send(
                        200, self._envelope(q, engine.search_fusion(q, count()))
                    )
                elif parsed.path in ("/api/dense", "/api/sparse", "/api/hybrid"):
                    # reference param names: query= and limit=
                    # (app/api/endpoints/search.py:441-533); accept the
                    # shim's q=/count= spellings as fallbacks
                    mode = parsed.path.rsplit("/", 1)[1]
                    rq = qs.get("query", q)
                    limit = int(qs.get("limit", qs.get("count", "10")))
                    rows = _rows(engine.query(rq, mode, limit))
                    self._send(200, {
                        "results": rows,
                        "count": len(rows),
                        "method": mode,
                        "query": rq,
                        "fields_searched": " + ".join(
                            _SEARCH_FIELDS.get(mode)
                            or _SEARCH_FIELDS["dense"] + _SEARCH_FIELDS["sparse"]
                        ),
                    })
                elif parsed.path == "/api/methods-info":
                    self._send(200, _METHODS_INFO)
                elif parsed.path == "/api/test":
                    self._send(200, {
                        "status": "success",
                        "message": "search service is working",
                        "details": {
                            "search_methods": ["dense", "sparse", "hybrid"],
                            "fusion_method": "rrf",
                            **engine.health(),
                        },
                    })
                elif parsed.path == "/api/search/compare":
                    self._send(200, engine.compare(q, count()))
                elif parsed.path == "/api/search/performance-stats":
                    self._send(200, engine.performance_stats())
                elif parsed.path == "/api/import":
                    n = engine.import_full(qs["dir"], qs["table"])
                    self._send(200, {"status": "completed", "documents": n})
                elif parsed.path == "/api/importdelta":
                    counts = engine.import_delta(qs["dir"], qs["table"])
                    self._send(200, {"status": "completed", "changes": counts})
                elif parsed.path == "/api/export":
                    path, n = engine.export(qs["path"])
                    self._send(200, {"status": "completed", "path": path,
                                     "documents": n})
                elif parsed.path == "/api/reset":
                    engine.reset()
                    self._send(200, {"status": "reset"})
                elif (
                    parsed.path.startswith("/api/collections/")
                    and parsed.path.endswith("/stats")
                ):
                    name = parsed.path[len("/api/collections/"):-len("/stats")]
                    if not name:  # bare /api/collections/stats
                        self._send(404, {"error": f"unknown route {parsed.path}"})
                    else:
                        self._send(200, engine.collection_stats(name))
                else:
                    self._send(404, {"error": f"unknown route {parsed.path}"})
            except KeyError as e:  # missing required query param
                self._send(400, {"error": f"missing parameter {e}"})
            except ValueError as e:  # bad mode / bad params
                self._send(400, {"error": str(e)})
            except Exception as e:  # engine/Spark errors (bad column,
                # missing path, analysis failures) must still produce an
                # HTTP response, not an aborted connection
                self._send(400, {"error": f"{type(e).__name__}: {e}"[:2000]})

        def do_POST(self):  # noqa: N802
            parsed = urlparse(self.path)
            qs = {
                k: v[0]
                for k, v in parse_qs(
                    parsed.query, keep_blank_values=True
                ).items()
            }
            if parsed.path == "/api/search/optimize":
                # reference: warm every search service
                # (app/api/endpoints/search.py:376-406)
                try:
                    self._send(200, engine.optimize())
                except Exception as e:
                    self._send(400, {"error": f"{type(e).__name__}: {e}"[:2000]})
                return
            if parsed.path == "/api/search":
                # the reference serves search over GET and POST alike
                # (app/main.py:63-104); POST takes the same parameters
                # as a JSON body, query params as fallback
                try:
                    n_bytes = int(self.headers.get("Content-Length", "0"))
                    body = json.loads(self.rfile.read(n_bytes) or b"{}")
                    if not isinstance(body, dict):
                        raise ValueError("expected a JSON object body")
                    params = {**qs, **body}
                    df = engine.search(
                        str(params.get("q", params.get("query", ""))),
                        int(params.get("count", 10)),
                        filter_field=params.get("filter_field"),
                        filter_value=params.get("filter_value"),
                        use_fusion=str(params.get("use_fusion", "")).lower()
                        in ("1", "true", "yes"),
                    )
                    self._send(
                        200,
                        self._envelope(
                            str(params.get("q", params.get("query", ""))), df
                        ),
                    )
                except json.JSONDecodeError:
                    self._send(400, {"error": "Invalid JSON body"})
                except ValueError as e:
                    self._send(400, {"error": str(e)})
                except Exception as e:
                    self._send(400, {"error": f"{type(e).__name__}: {e}"[:2000]})
                return
            if parsed.path != "/api/load-data":
                self._send(404, {"error": f"unknown route {parsed.path}"})
                return
            # reference: multipart JSON upload into the collection
            # (app/main.py:106-160); the shim takes the JSON array as
            # the request body, lands it as an upload file, and runs
            # the same S3 upload -> T1/T2 transform -> batch write path
            try:
                n_bytes = int(self.headers.get("Content-Length", "0"))
                body = self.rfile.read(n_bytes)
                try:
                    docs = json.loads(body)
                except json.JSONDecodeError:
                    self._send(400, {"error": "Invalid JSON file"})
                    return
                if not isinstance(docs, list):
                    self._send(400, {"error": "expected a JSON array of documents"})
                    return
                work = tempfile.mkdtemp(prefix="load_data_")
                try:
                    upload = os.path.join(work, "upload.json")
                    with open(upload, "w", encoding="utf-8") as f:
                        json.dump(docs, f)
                    table_dir = qs.get("table", os.path.join(work, "table"))
                    n = engine.load_data(upload, table_dir)
                finally:
                    # the whole work dir is scratch: _absorb_locked
                    # localCheckpoints the merged corpus EAGERLY, so
                    # serving never re-reads the landed parquet — and a
                    # failed load must not leave a copy of the upload
                    # on disk. A user-named ?table= lives outside work
                    # and is untouched.
                    import shutil

                    shutil.rmtree(work, ignore_errors=True)
                self._send(200, {
                    "success": True,
                    "message": f"Successfully loaded {n} documents",
                    "documents_loaded": n,
                    "collection_name": qs.get("collection_name", "products"),
                })
            except Exception as e:
                self._send(400, {"error": f"{type(e).__name__}: {e}"[:2000]})

        def do_DELETE(self):  # noqa: N802
            if urlparse(self.path).path == "/api/search/cache":
                self._send(200, {"cleared": engine.clear_cache()})
            else:
                self._send(404, {"error": "unknown route"})

    return ThreadingHTTPServer((host, port), Handler)


def serve_background(engine: Engine, host: str = "127.0.0.1", port: int = 0):
    """Start the shim on a daemon thread; returns (server, base_url).
    Call ``server.shutdown()`` to stop."""
    server = make_server(engine, host, port)
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    return server, f"http://{host}:{server.server_port}"
