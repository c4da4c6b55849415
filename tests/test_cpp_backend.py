"""In-process llama-cpp backend (reference llm_backend.py:40-100):
wire logic, chat/system-prompt shaping, the compiled-GBNF cache, and
the executor pickling contract — all against an injected fake client
(llama-cpp-python is not installed in this container; the real import
path is asserted to fail with a labeled error)."""

from __future__ import annotations

import pickle

import pytest

from hippollm_spark.pipelines.backends import GRAMMAR_YN, CppLlmBackend, load_llm


class FakeLlama:
    """Records calls; echoes a deterministic completion."""

    def __init__(self, model, **params):
        self.model = model
        self.params = params
        self.completion_calls = []
        self.chat_calls = []

    def create_completion(self, prompt, grammar=None, max_tokens=None, stop=None):
        self.completion_calls.append((prompt, grammar, max_tokens, tuple(stop)))
        return {"choices": [{"text": f"echo:{prompt}"}]}

    def create_chat_completion(self, messages, grammar=None, max_tokens=None, stop=None):
        self.chat_calls.append((tuple((m["role"], m["content"]) for m in messages), grammar))
        return {"choices": [{"message": {"content": f"chat:{messages[-1]['content']}"}}]}


class SpyCompiler:
    def __init__(self):
        self.calls = []

    def __call__(self, grammar: str):
        self.calls.append(grammar)
        return ("compiled", grammar)


def _backend(**kw):
    clients = []

    def loader(model, **params):
        c = FakeLlama(model, **params)
        clients.append(c)
        return c

    be = CppLlmBackend(
        "fake-model", loader=loader, grammar_compiler=SpyCompiler(), **kw
    )
    return be, clients


def test_completion_mode_and_lazy_single_load():
    be, clients = _backend()
    assert clients == []  # construction loads nothing
    assert be.invoke("hello") == "echo:hello"
    assert be.invoke("again") == "echo:again"
    assert len(clients) == 1  # one model load per process
    assert clients[0].params["n_ctx"] == 5000  # reference default


def test_chat_mode_with_system_prompt_message_order():
    be, clients = _backend(chat_model=True, system_prompt="be brief")
    assert be.invoke("question") == "chat:question"
    roles = [r for r, _ in clients[0].chat_calls[0][0]]
    assert roles == ["system", "user"]  # system prepended (llm_backend.py:84-86)


def test_grammar_compiled_once_per_string():
    be, clients = _backend()
    be.invoke("a", grammar=GRAMMAR_YN)
    be.invoke("b", grammar=GRAMMAR_YN)
    be.invoke("c", grammar='root ::= "Maybe"')
    assert be._grammar_compiler.calls == [GRAMMAR_YN, 'root ::= "Maybe"']
    # the compiled object (not the string) reaches the client
    assert clients[0].completion_calls[0][1] == ("compiled", GRAMMAR_YN)


def _module_loader(model, **params):
    return FakeLlama(model, **params)


def _module_compiler(grammar):
    return ("compiled", grammar)


def test_pickle_drops_client_and_grammar_cache():
    # loader/compiler must be picklable for executor shipping —
    # module-level callables, like real code would use
    be = CppLlmBackend(
        "fake", loader=_module_loader, grammar_compiler=_module_compiler
    )
    be.invoke("warm", grammar=GRAMMAR_YN)
    assert be._client is not None and be._grammar_cache
    be2 = pickle.loads(pickle.dumps(be))
    assert be2._client is None and be2._grammar_cache == {}
    assert be2.invoke("cold") == "echo:cold"  # rebuilds in the new process


def test_missing_dependency_raises_labeled_import_error():
    be = CppLlmBackend("/models/x.gguf")  # no loader -> real import path
    with pytest.raises(ImportError, match="llama-cpp-python"):
        be.invoke("hi")


def test_load_llm_cpp_route():
    be = load_llm("cpp", model="fake", loader=lambda m, **p: FakeLlama(m, **p))
    assert isinstance(be, CppLlmBackend)
    assert be.invoke("x") == "echo:x"
    assert be.handles_grammars is True
