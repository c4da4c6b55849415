"""Real Wikipedia HTTP fetchers against a stub MediaWiki server —
request shapes and response parsing for S3 (search + extract) and S6
(batched descriptions), including the executor-side path through
enrich_descriptions."""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, HTTPServer
from urllib.parse import parse_qs, urlparse

import pytest

from hippollm_spark.sources.loaders import (
    enrich_descriptions,
    load_wikipedia,
    wikipedia_description_fetcher,
    wikipedia_page_fetcher,
)


class _MediaWikiStub(BaseHTTPRequestHandler):
    requests: list[dict] = []
    status: int = 200

    def do_GET(self):
        q = {k: v[0] for k, v in parse_qs(urlparse(self.path).query).items()}
        type(self).requests.append(q)
        if type(self).status != 200:
            self.send_response(type(self).status)
            self.end_headers()
            return
        if q.get("list") == "search":
            out = {"query": {"search": [{"title": "Paris"}]}}
        elif q.get("prop") == "extracts":
            out = {
                "query": {
                    "pages": {"123": {"title": "Paris", "extract": "Paris is big. " * 9}}
                }
            }
        elif q.get("prop") == "description":
            titles = q.get("titles", "").split("|")
            pages = {}
            for i, t in enumerate(titles):
                if t == "Ghost":
                    pages[str(-i - 1)] = {"title": t, "missing": ""}
                else:
                    pages[str(i + 1)] = {"title": t, "description": f"about {t}"}
            out = {"query": {"pages": pages}}
        else:
            out = {}
        payload = json.dumps(out).encode()
        self.send_response(200)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(payload)))
        self.end_headers()
        self.wfile.write(payload)

    def log_message(self, *a):
        pass


@pytest.fixture()
def mw_server():
    _MediaWikiStub.requests = []
    _MediaWikiStub.status = 200
    srv = HTTPServer(("127.0.0.1", 0), _MediaWikiStub)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    yield f"http://127.0.0.1:{srv.server_port}/w/api.php", _MediaWikiStub
    srv.shutdown()


def test_page_fetcher_search_then_extract(mw_server):
    api, stub = mw_server
    title, url, content = wikipedia_page_fetcher(api)("paris france")
    assert title == "Paris"
    assert url.endswith("/wiki/Paris")
    assert content.startswith("Paris is big.")
    assert stub.requests[0]["list"] == "search"
    assert stub.requests[0]["srsearch"] == "paris france"
    assert stub.requests[1]["prop"] == "extracts"
    assert stub.requests[1]["titles"] == "Paris"


def test_load_wikipedia_with_real_fetcher_caps_chars(spark, mw_server):
    api, _ = mw_server
    df = load_wikipedia(
        spark, "paris", fetcher=wikipedia_page_fetcher(api), max_chars=20
    )
    row = df.first()
    assert row["title"] == "Paris" and len(row["content"]) == 20


def test_description_fetcher_batch_shape(mw_server):
    api, stub = mw_server
    got = wikipedia_description_fetcher(api)(["Paris", "Ghost", "Seine"])
    assert got == {"Paris": "about Paris", "Seine": "about Seine"}
    assert stub.requests[-1]["titles"] == "Paris|Ghost|Seine"
    assert stub.requests[-1]["prop"] == "description"


def test_description_fetcher_non_200_returns_empty(mw_server):
    api, stub = mw_server
    stub.status = 429
    assert wikipedia_description_fetcher(api)(["Paris"]) == {}


def test_enrich_descriptions_through_executors(spark, mw_server):
    """The real fetch_batch cloudpickles into mapInPandas and calls the
    stub from executor processes (local mode shares the network ns)."""
    api, stub = mw_server
    titles = spark.createDataFrame(
        [("Paris",), ("Seine",), ("Ghost",)], "title string"
    )
    out = enrich_descriptions(
        titles, wikipedia_description_fetcher(api), batch_size=2
    )
    rows = {r["title"]: r["description"] for r in out.collect()}
    assert rows["Paris"] == "about Paris"
    assert rows["Seine"] == "about Seine"
    assert rows["Ghost"] is None
