"""Model backends (reference L1-L4: llm_backend.py, nlp_additional.py).

The reference wraps four LLM providers (Ollama, llama-cpp w/ GBNF
grammars, Groq, OpenAI — llm_backend.py:21-173) behind one
``invoke(prompt, grammar, max_tokens, stop)`` call, plus a CrossEncoder
NLI model (nlp_additional.py:16-34). In the Spark engine backends are
*executor-local* objects constructed inside mapInPandas stages (one
client per python worker, batched calls).

Two deterministic fakes make every pipeline test reproducible
(FIXTURES.md §5): ``ScriptedLLM`` (lookup table with prefix matching;
honors the yes/no grammar) and ``ScriptedNLI``.

``HttpLlmBackend`` is a real request-shaping client for all four
provider wire formats (OpenAI/Groq chat, Ollama generate, llama.cpp
completion) with retry/backoff and grammar passthrough, unit-tested
against a local stub server (tests/test_http_backend.py) — this
container has no model runtimes, so ScriptedLLM stays the default.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Protocol

GRAMMAR_YN = 'root ::= ("Yes" | "No")'  # reference grammars.py:1


class LlmBackend(Protocol):
    def invoke(
        self,
        prompt: str,
        grammar: str | None = None,
        max_tokens: int | None = None,
        stop: list[str] | None = None,
    ) -> str: ...


@dataclass
class ScriptedLLM:
    """Deterministic LLM: longest-matching key wins.

    ``script`` maps a substring (matched against the prompt) to the
    response. With ``grammar=GRAMMAR_YN`` any response not starting with
    y/Y is normalized to "No" ("grammar-constrained decoding").
    """

    script: dict[str, str] = field(default_factory=dict)
    default: str = "None"
    calls: list[str] = field(default_factory=list)

    def invoke(self, prompt, grammar=None, max_tokens=None, stop=None) -> str:
        self.calls.append(prompt)
        best = None
        for key in sorted(self.script, key=len, reverse=True):
            if key in prompt:
                best = self.script[key]
                break
        out = self.default if best is None else best
        if grammar == GRAMMAR_YN:
            out = "Yes" if out.strip().lower().startswith("y") else "No"
        if max_tokens is not None:
            out = " ".join(out.split(" ")[: max(max_tokens, 1)])
        if stop:
            for s in stop:
                if s in out:
                    out = out.split(s, 1)[0]
        return out


@dataclass
class ScriptedNLI:
    """Deterministic NLI: (premise, hypothesis) → (entails, score).

    Mirrors the reference semantics (nlp_additional.py:16-34): label
    argmax == 1 means entailment; ranking is by entail score desc.
    Unknown pairs → no entailment. ``symmetric=True`` also matches the
    reversed pair (useful for dedup scripts)."""

    table: dict[tuple[str, str], float] = field(default_factory=dict)
    symmetric: bool = True

    def detect_entailment(self, premise: str, hypothesis: str) -> bool:
        return self.score(premise, hypothesis) is not None

    def score(self, premise: str, hypothesis: str) -> float | None:
        if (premise, hypothesis) in self.table:
            return self.table[(premise, hypothesis)]
        if self.symmetric and (hypothesis, premise) in self.table:
            return self.table[(hypothesis, premise)]
        return None

    def score_pairs(
        self, pairs: list[tuple[str, str]]
    ) -> list[float | None]:
        """Batched pair scoring — the CrossEncoder pair-list contract
        (reference nlp_additional.py:16-22 predicts a whole list per
        call); pipeline stages call this once per Arrow batch instead
        of once per row."""
        return [self.score(p, h) for p, h in pairs]

    def entailment_classify(self, item: str, others: list[str]) -> list[tuple[str, float]]:
        """Entailing candidates ranked by score desc (reference
        nlp_additional.py:24-34), ties broken by input order."""
        scored = []
        for pos, o in enumerate(others):
            s = self.score(o, item)
            if s is not None:
                scored.append((-s, pos, o))
        scored.sort()
        return [(o, -negs) for negs, _, o in scored]


class ExtractiveFakeLLM:
    """Deterministic rule-based 'LLM' that makes the full annotation
    pipeline usable with no model runtime: facts = sentences of the
    chunk, entities = capitalized words, no dedup confirmations. Useful
    for CLI runs, demos, and load tests; swap for a real backend in
    production."""

    _SENT = __import__("re").compile(r"[^.!?]+[.!?]?")
    _CAP = __import__("re").compile(r"\b[A-Z][A-Za-z0-9_-]+\b")

    def invoke(self, prompt, grammar=None, max_tokens=None, stop=None) -> str:
        if grammar == GRAMMAR_YN:
            return "No"
        if "Summary:" in prompt:
            body = prompt.split("Excerpt:\n", 1)[-1]
            first = self._SENT.search(body.strip())
            return first.group(0).strip() if first else ""
        if "Facts:" in prompt and "Passage:" in prompt:
            chunk = prompt.split("Passage:\n", 1)[-1].rsplit("Facts:", 1)[0]
            sents = [s.strip() for s in self._SENT.findall(chunk) if s.strip()]
            return "\n".join(f"- {s.rstrip('.!?')}" for s in sents) or "None"
        if "Rewritten:" in prompt:
            stmt = prompt.split("Statement: ", 1)[-1].rsplit("Rewritten:", 1)[0]
            return stmt.strip()
        if "Entities:" in prompt:
            fact = prompt.split("Fact: ", 1)[-1].rsplit("Entities:", 1)[0]
            seen: list[str] = []
            for m in self._CAP.findall(fact):
                if m not in seen:
                    seen.append(m)
            return "\n".join(f"- {e}" for e in seen) or "None"
        return "None"


# --- real HTTP providers ---------------------------------------------------

class HttpLlmBackend:
    """Executor-local HTTP LLM client covering the reference's four
    provider shapes (llm_backend.py:21-159): ``provider=``

    - ``"openai"`` / ``"groq"`` — POST {url}/v1/chat/completions with
      the chat payload (Groq is the OpenAI wire format at a different
      base URL + bearer key, reference llm_backend.py:103-159);
      grammar has no wire field here and is ignored (the reference's
      OpenAI path likewise sends none).
    - ``"ollama"`` — POST {url}/api/generate with
      {model, prompt, stream:false, options:{num_predict, stop,
      temperature}} (reference llm_backend.py:21-37); GBNF grammar
      rides the documented ``format``-adjacent ``grammar`` field
      accepted by llama-cpp-backed Ollama builds.
    - ``"llamacpp"`` — POST {url}/completion with
      {prompt, n_predict, stop, grammar} — the llama.cpp server wire
      format; grammar passthrough is first-class (the reference caches
      compiled GBNF grammars, llm_backend.py:40-100 — server-side
      compilation makes the cache unnecessary here).

    Construct one per python worker inside a mapInPandas stage (the
    reference pattern this engine uses for every model). Retries
    ``max_retries`` times on connection errors / 5xx with linear
    backoff; 4xx raises immediately (payload bugs don't heal).
    Instances pickle cleanly (the requests.Session is rebuilt lazily
    per process).
    """

    def __init__(
        self,
        url: str,
        model: str,
        api_key: str | None = None,
        *,
        provider: str = "openai",
        temperature: float = 0.0,
        timeout: float = 60.0,
        max_retries: int = 2,
        retry_backoff: float = 0.5,
    ) -> None:
        if provider not in ("openai", "groq", "ollama", "llamacpp"):
            raise ValueError(f"unknown provider: {provider}")
        self.url = url.rstrip("/")
        self.model = model
        self.api_key = api_key
        self.provider = provider
        self.temperature = temperature
        self.timeout = timeout
        self.max_retries = max_retries
        self.retry_backoff = retry_backoff
        self._session = None

    # requests.Session holds thread-locals — drop it when shipping to
    # executors, rebuild on first use in each process
    def __getstate__(self):
        state = dict(self.__dict__)
        state["_session"] = None
        return state

    def _request(self, path: str, payload: dict) -> dict:
        import time as _time

        import requests

        if self._session is None:
            self._session = requests.Session()
        headers = {"Content-Type": "application/json"}
        if self.api_key:
            headers["Authorization"] = f"Bearer {self.api_key}"
        last_err: Exception | None = None
        for attempt in range(self.max_retries + 1):
            try:
                resp = self._session.post(
                    self.url + path,
                    json=payload,
                    headers=headers,
                    timeout=self.timeout,
                )
                if resp.status_code >= 500:
                    raise requests.HTTPError(
                        f"{resp.status_code}: {resp.text[:200]}", response=resp
                    )
                resp.raise_for_status()
                return resp.json()
            except requests.HTTPError as e:
                if e.response is not None and e.response.status_code < 500:
                    raise
                last_err = e
            except requests.RequestException as e:
                last_err = e
            if attempt < self.max_retries:
                _time.sleep(self.retry_backoff * (attempt + 1))
        raise last_err  # type: ignore[misc]

    def invoke(self, prompt, grammar=None, max_tokens=None, stop=None) -> str:
        if self.provider in ("openai", "groq"):
            payload: dict = {
                "model": self.model,
                "messages": [{"role": "user", "content": prompt}],
                "temperature": self.temperature,
            }
            if max_tokens is not None:
                payload["max_tokens"] = max_tokens
            if stop:
                payload["stop"] = list(stop)
            data = self._request("/v1/chat/completions", payload)
            return data["choices"][0]["message"]["content"]
        if self.provider == "ollama":
            options: dict = {"temperature": self.temperature}
            if max_tokens is not None:
                options["num_predict"] = max_tokens
            if stop:
                options["stop"] = list(stop)
            payload = {
                "model": self.model,
                "prompt": prompt,
                "stream": False,
                "options": options,
            }
            if grammar is not None:
                payload["grammar"] = grammar
            data = self._request("/api/generate", payload)
            return data["response"]
        # llamacpp
        payload = {"prompt": prompt, "temperature": self.temperature}
        if max_tokens is not None:
            payload["n_predict"] = max_tokens
        if stop:
            payload["stop"] = list(stop)
        if grammar is not None:
            payload["grammar"] = grammar
        data = self._request("/completion", payload)
        return data["content"]


class CppLlmBackend:
    """In-process llama-cpp backend (reference llm_backend.py:40-100):
    loads a GGUF model through ``llama_cpp.Llama`` — a filesystem path
    (leading ``/`` or ``./``) maps to ``Llama(model_path=...)``, any
    other id to ``Llama.from_pretrained(...)`` — and serves
    completions or chat turns with an optional system prompt.

    Grammar discipline mirrors the reference: compiled GBNF grammars
    are cached per process keyed by the grammar STRING
    (llm_backend.py:69-76 — ``LlamaGrammar.from_string`` re-parses on
    every call otherwise, and annotate issues the same yes/no grammar
    thousands of times per batch).

    Executor shape: instances pickle cleanly — the Llama client and
    the grammar cache are process-local and rebuilt lazily on first
    ``invoke`` in each python worker (one model load per worker, the
    same pattern as ``HttpLlmBackend``'s session). ``loader`` /
    ``grammar_compiler`` are injectable constructors so the wire
    logic is testable without the native dependency (this container
    has no llama-cpp-python; the real import raises a labeled
    ImportError at first use, never at construction).
    """

    handles_grammars = True

    def __init__(
        self,
        model: str,
        *,
        chat_model: bool = False,
        system_prompt: str | None = None,
        n_ctx: int = 5000,
        loader=None,
        grammar_compiler=None,
        **params,
    ) -> None:
        self.model = model
        self.chat_model = chat_model
        self.system_prompt = system_prompt
        self.params = {"n_ctx": n_ctx, **params}
        self._loader = loader
        self._grammar_compiler = grammar_compiler
        self._client = None
        self._grammar_cache: dict[str, object] = {}

    def __getstate__(self):
        state = dict(self.__dict__)
        state["_client"] = None
        state["_grammar_cache"] = {}
        return state

    def _load(self):
        if self._client is None:
            if self._loader is not None:
                self._client = self._loader(self.model, **self.params)
            else:
                try:
                    from llama_cpp import Llama
                except ImportError as e:  # pragma: no cover - dep absent in CI
                    raise ImportError(
                        "CppLlmBackend requires llama-cpp-python "
                        "(pip install llama-cpp-python); use "
                        "HttpLlmBackend(provider='llamacpp') against a "
                        "llama.cpp server instead"
                    ) from e
                if self.model.startswith(("/", "./")):
                    self._client = Llama(model_path=self.model, **self.params)
                else:
                    self._client = Llama.from_pretrained(self.model, **self.params)
        return self._client

    def _grammar(self, grammar: str | None):
        if grammar is None:
            return None
        compiled = self._grammar_cache.get(grammar)
        if compiled is None:
            if self._grammar_compiler is not None:
                compiled = self._grammar_compiler(grammar)
            else:
                from llama_cpp import LlamaGrammar  # pragma: no cover

                compiled = LlamaGrammar.from_string(grammar)  # pragma: no cover
            self._grammar_cache[grammar] = compiled
        return compiled

    def invoke(self, prompt, grammar=None, max_tokens=None, stop=None) -> str:
        client = self._load()
        g = self._grammar(grammar)
        stop = list(stop) if stop else []
        if self.chat_model:
            messages = [{"role": "user", "content": prompt}]
            if self.system_prompt is not None:
                messages.insert(
                    0, {"role": "system", "content": self.system_prompt}
                )
            out = client.create_chat_completion(
                messages, grammar=g, max_tokens=max_tokens, stop=stop
            )
            return out["choices"][0]["message"]["content"]
        out = client.create_completion(
            prompt, grammar=g, max_tokens=max_tokens, stop=stop
        )
        return out["choices"][0]["text"]


def load_llm(backend: str = "scripted", **kw) -> LlmBackend:
    """Backend factory (reference llm_backend.py:162-173): scripted
    fake by default; ``"openai" | "groq" | "ollama" | "llamacpp"``
    construct the HTTP client with the provider preset; ``"cpp"``
    constructs the in-process llama-cpp backend."""
    if backend == "scripted":
        return ScriptedLLM(**kw)
    if backend == "cpp":
        return CppLlmBackend(**kw)
    if backend in ("openai", "groq", "ollama", "llamacpp"):
        return HttpLlmBackend(provider=backend, **kw)
    return HttpLlmBackend(**kw)
