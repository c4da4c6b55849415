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

Real-provider classes are thin HTTP stubs gated behind import-try —
this container has no network/model runtimes; the batching and
plumbing around them is the part this engine owns and tests.
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


# --- real-provider stubs (no network in the test container) ---------------

class HttpLlmBackend:
    """Skeleton for an executor-local HTTP LLM client (the reference's
    Ollama/Groq/OpenAI backends — llm_backend.py:21-159). Instantiated
    per python worker inside mapInPandas; requires a reachable endpoint."""

    def __init__(self, url: str, model: str, api_key: str | None = None) -> None:
        self.url, self.model, self.api_key = url, model, api_key

    def invoke(self, prompt, grammar=None, max_tokens=None, stop=None) -> str:
        raise NotImplementedError(
            "no model endpoint in this environment — inject ScriptedLLM, "
            "or subclass with a real HTTP call"
        )


def load_llm(backend: str = "scripted", **kw) -> LlmBackend:
    """Backend factory (reference llm_backend.py:162-173)."""
    if backend == "scripted":
        return ScriptedLLM(**kw)
    return HttpLlmBackend(**kw)
