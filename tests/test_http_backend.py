"""HttpLlmBackend against a local stub HTTP server — request shaping,
grammar/max_tokens/stop passthrough, retry policy (reference
llm_backend.py:21-159 is the spec; no network, the server is an
in-process thread)."""

from __future__ import annotations

import json
import pickle
import threading
from http.server import BaseHTTPRequestHandler, HTTPServer

import pytest

from hippollm_spark.pipelines.backends import GRAMMAR_YN, HttpLlmBackend, load_llm


class _Stub(BaseHTTPRequestHandler):
    requests: list[tuple[str, dict]] = []
    fail_next: int = 0

    def do_POST(self):
        body = json.loads(self.rfile.read(int(self.headers["Content-Length"])))
        type(self).requests.append(
            (self.path, body, dict(self.headers))
        )
        if type(self).fail_next > 0:
            type(self).fail_next -= 1
            self.send_response(503)
            self.end_headers()
            self.wfile.write(b"overloaded")
            return
        if self.path == "/v1/chat/completions":
            out = {"choices": [{"message": {"role": "assistant", "content": "chat-ok"}}]}
        elif self.path == "/api/generate":
            out = {"response": "ollama-ok"}
        elif self.path == "/completion":
            out = {"content": "llamacpp-ok"}
        else:
            self.send_response(404)
            self.end_headers()
            return
        payload = json.dumps(out).encode()
        self.send_response(200)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(payload)))
        self.end_headers()
        self.wfile.write(payload)

    def log_message(self, *a):  # silence
        pass


@pytest.fixture()
def stub_server():
    _Stub.requests = []
    _Stub.fail_next = 0
    srv = HTTPServer(("127.0.0.1", 0), _Stub)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_port}", _Stub
    srv.shutdown()


def test_openai_chat_shape_and_auth(stub_server):
    url, stub = stub_server
    be = HttpLlmBackend(url, "gpt-x", api_key="sk-test", provider="openai")
    out = be.invoke("hello", max_tokens=7, stop=["\n\n"])
    assert out == "chat-ok"
    path, body, headers = stub.requests[-1]
    assert path == "/v1/chat/completions"
    assert body["model"] == "gpt-x"
    assert body["messages"] == [{"role": "user", "content": "hello"}]
    assert body["max_tokens"] == 7 and body["stop"] == ["\n\n"]
    assert headers["Authorization"] == "Bearer sk-test"
    # grammar has no OpenAI wire field — silently not sent
    be.invoke("q", grammar=GRAMMAR_YN)
    assert "grammar" not in stub.requests[-1][1]


def test_ollama_generate_shape(stub_server):
    url, stub = stub_server
    be = load_llm("ollama", url=url, model="llama3")
    out = be.invoke("p", grammar=GRAMMAR_YN, max_tokens=3, stop=["X"])
    assert out == "ollama-ok"
    path, body, _ = stub.requests[-1]
    assert path == "/api/generate"
    assert body["model"] == "llama3" and body["stream"] is False
    assert body["options"]["num_predict"] == 3
    assert body["options"]["stop"] == ["X"]
    assert body["grammar"] == GRAMMAR_YN


def test_llamacpp_completion_grammar_passthrough(stub_server):
    url, stub = stub_server
    be = HttpLlmBackend(url, "local", provider="llamacpp")
    out = be.invoke("p", grammar=GRAMMAR_YN, max_tokens=2)
    assert out == "llamacpp-ok"
    path, body, _ = stub.requests[-1]
    assert path == "/completion"
    assert body["grammar"] == GRAMMAR_YN and body["n_predict"] == 2
    assert "model" not in body  # llama.cpp server serves one model


def test_retries_on_5xx_then_succeeds(stub_server):
    url, stub = stub_server
    stub.fail_next = 2
    be = HttpLlmBackend(
        url, "m", provider="openai", max_retries=2, retry_backoff=0.01
    )
    assert be.invoke("p") == "chat-ok"
    assert len(stub.requests) == 3  # 2 failures + 1 success


def test_retries_exhausted_raises(stub_server):
    import requests

    url, stub = stub_server
    stub.fail_next = 5
    be = HttpLlmBackend(
        url, "m", provider="openai", max_retries=1, retry_backoff=0.01
    )
    with pytest.raises(requests.HTTPError):
        be.invoke("p")
    assert len(stub.requests) == 2


def test_4xx_raises_immediately(stub_server):
    import requests

    url, stub = stub_server
    be = HttpLlmBackend(url, "m", provider="openai", max_retries=3)
    be.url = url + "/nope"  # 404 path
    with pytest.raises(requests.HTTPError):
        be.invoke("p")
    assert len(stub.requests) == 1  # no retries on client errors


def test_backend_pickles_for_executor_shipping(stub_server):
    url, stub = stub_server
    be = HttpLlmBackend(url, "m", provider="groq", api_key="k")
    be.invoke("warm")  # materialize the session
    clone = pickle.loads(pickle.dumps(be))
    assert clone._session is None
    assert clone.invoke("again") == "chat-ok"


def test_unknown_provider_rejected():
    with pytest.raises(ValueError):
        HttpLlmBackend("http://x", "m", provider="mystery")
