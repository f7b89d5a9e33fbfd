"""Cross-process serving fan-out: an HTTP daemon per doc shard plus a
coordinator client — the deployment shape the reference actually runs
(N stateless Elasticsearch data nodes behind a coordinating node, driven
over HTTP by the relevance harness, ``SearchRelevanceTest.java:55-127``)
made concrete over the same open parquet segments.

Topology at 100 TB: every shard process owns a subset of live segments
(segments hold disjoint doc-id ranges, so they ARE the doc shards) and
scores with the GLOBAL corpus statistics (``LocalSearcher``'s shard
contract); the coordinator fans a query out to all shard daemons
concurrently and merges the per-shard top-k heaps under the engine's
exact tie-break — coordinator memory and network are O(shards · k),
never the candidate set.

Stdlib only (http.server + urllib): no framework dependency, and the
daemon is a thin JSON veneer over :class:`LocalSearcher` — every scoring
decision stays in one place.

Run a shard daemon::

    python -m planet_search_spark.queries.httpd /path/to/index \
        --port 8401 --segments seg_1,seg_3

Query it (or many) from the coordinator::

    coord = HttpShardedSearcher(["http://127.0.0.1:8401", ...])
    coord.bm25_topk("error timeout", k=10)
"""
from __future__ import annotations

import json
import threading
from dataclasses import asdict
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.error import HTTPError
from urllib.request import Request, urlopen

from .params import SearchParams
from .serve import LocalSearcher, ShardedSearcher

# methods a daemon exposes; each maps to the LocalSearcher method of the
# same name (positional query/phrase string + keyword args)
_METHODS = {"bm25_topk", "dismax_topk", "phrase_match",
            "phrase_prefix_match", "search"}


class SearchDaemon:
    """One shard's HTTP process: a ThreadingHTTPServer wrapping a
    :class:`LocalSearcher` (optionally restricted to a segment subset).

    Protocol: ``POST /query`` with a JSON body
    ``{"method": "bm25_topk", "args": ["error timeout"],
    "kwargs": {"k": 10}}`` -> ``{"rows": [...]}``; ``search`` takes the
    ``SearchParams`` fields as a dict in ``args[0]``. ``GET /health``
    -> corpus stats (the ES ``_cluster/health`` analogue).
    """

    def __init__(self, out_dir: str, *, segments: list[str] | None = None,
                 host: str = "127.0.0.1", port: int = 0):
        searcher = LocalSearcher(out_dir, segments=segments)
        daemon = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):  # quiet: latency tests run hundreds
                pass

            def _reply(self, code: int, obj):
                body = json.dumps(obj).encode("utf-8")
                self.send_response(code)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def do_GET(self):
                if self.path == "/health":
                    self._reply(200, {"n_docs": searcher.n_docs,
                                      "avgdl": searcher.avgdl,
                                      "segments": len(searcher.seg_dirs)})
                else:
                    self._reply(404, {"error": "unknown path"})

            def do_POST(self):
                if self.path != "/query":
                    self._reply(404, {"error": "unknown path"})
                    return
                try:
                    n = int(self.headers.get("Content-Length", "0"))
                    req = json.loads(self.rfile.read(n))
                    method = req.get("method")
                    if method not in _METHODS:
                        self._reply(400, {"error": f"unknown method "
                                                   f"{method!r}"})
                        return
                    args = list(req.get("args", []))
                    kwargs = dict(req.get("kwargs", {}))
                    if method == "search":
                        args[0] = SearchParams(**args[0])
                    rows = getattr(searcher, method)(*args, **kwargs)
                    self._reply(200, {"rows": rows})
                except Exception as e:  # surface the cause to the client
                    self._reply(500, {"error": f"{type(e).__name__}: {e}"})

        self.searcher = searcher
        self.httpd = ThreadingHTTPServer((host, port), Handler)
        self.port = self.httpd.server_address[1]
        self.url = f"http://{host}:{self.port}"
        self._thread = None

    def start(self):
        """Serve in a background thread (in-process use / tests)."""
        self._thread = threading.Thread(target=self.httpd.serve_forever,
                                        daemon=True)
        self._thread.start()
        return self

    def serve_forever(self):
        self.httpd.serve_forever()

    def stop(self):
        self.httpd.shutdown()
        self.httpd.server_close()


class HttpShardedSearcher:
    """Coordinator over N shard daemons: concurrent HTTP fan-out, then
    the SAME exact merge as the in-process :class:`ShardedSearcher`
    (score desc, doc_id asc, k rows) — so HTTP-sharded answers are
    byte-identical to in-process sharded and unsharded answers."""

    def __init__(self, urls: list[str], *, timeout: float = 30.0,
                 retries: int = 2):
        if not urls:
            raise ValueError("need at least one shard URL")
        self.urls = list(urls)
        self.timeout = timeout
        self.retries = retries
        from concurrent.futures import ThreadPoolExecutor
        self._pool = ThreadPoolExecutor(max_workers=len(self.urls),
                                        thread_name_prefix="coord")

    def _call(self, url: str, method: str, args: list, kwargs: dict):
        """One shard RPC with bounded retries (the reference harness
        retries transient failures the same way,
        SearchRelevanceTest.java:101-117)."""
        payload = json.dumps({"method": method, "args": args,
                              "kwargs": kwargs}).encode("utf-8")
        last = None
        for attempt in range(self.retries + 1):
            try:
                req = Request(url + "/query", data=payload,
                              headers={"Content-Type": "application/json"})
                with urlopen(req, timeout=self.timeout) as resp:
                    doc = json.loads(resp.read())
                return doc["rows"]
            except HTTPError as e:
                # surface the daemon's JSON error body ({'error': 'T: msg'})
                # instead of the bare status line, and never retry 4xx —
                # client errors (unknown method, bad params) are
                # deterministic, so retrying only triples latency
                try:
                    body = json.loads(e.read()).get("error", "")
                except Exception:  # noqa: BLE001 — body unreadable
                    body = ""
                last = RuntimeError(
                    f"HTTP {e.code} from shard: {body or e.reason}")
                if 400 <= e.code < 500:
                    raise RuntimeError(
                        f"shard {url} client error (no retry): {last}"
                    ) from e
            except Exception as e:  # noqa: BLE001 — retry transport errors
                last = e
        raise RuntimeError(f"shard {url} failed after "
                           f"{self.retries + 1} attempts: {last}")

    def _fan(self, method: str, args: list, kwargs: dict) -> list:
        futs = [self._pool.submit(self._call, u, method, args, kwargs)
                for u in self.urls]
        return [f.result() for f in futs]

    def bm25_topk(self, query: str, k: int = 20, **kw):
        parts = self._fan("bm25_topk", [query], {"k": k, **kw})
        return ShardedSearcher._merge(parts, k)

    def dismax_topk(self, query: str, k: int = 20, **kw):
        parts = self._fan("dismax_topk", [query], {"k": k, **kw})
        return ShardedSearcher._merge(parts, k)

    def search(self, params: SearchParams):
        parts = self._fan("search", [asdict(params)], {})
        return ShardedSearcher._merge(parts, params.k)

    def phrase_match(self, phrase: str, **kw):
        rows = [r for p in self._fan("phrase_match", [phrase], kw)
                for r in p]
        rows.sort(key=lambda r: r["doc_id"])
        return rows

    def phrase_prefix_match(self, phrase: str, **kw):
        rows = [r for p in self._fan("phrase_prefix_match", [phrase], kw)
                for r in p]
        rows.sort(key=lambda r: r["doc_id"])
        return rows


def main(argv: list[str] | None = None):
    import argparse
    ap = argparse.ArgumentParser(
        description="Serve one doc shard of a planet_search_spark index "
                    "over HTTP")
    ap.add_argument("out_dir", help="index directory (contains live.json)")
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=0,
                    help="0 = pick a free port (printed on stdout)")
    ap.add_argument("--segments", default=None,
                    help="comma-separated segment subset (default: all)")
    ns = ap.parse_args(argv)
    segs = ns.segments.split(",") if ns.segments else None
    d = SearchDaemon(ns.out_dir, segments=segs, host=ns.host, port=ns.port)
    print(json.dumps({"url": d.url, "n_docs": d.searcher.n_docs}),
          flush=True)
    d.serve_forever()


if __name__ == "__main__":
    main()
