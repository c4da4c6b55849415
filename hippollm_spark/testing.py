"""Deterministic fakes for model-dependent operators.

The reference tests with random langchain ``FakeEmbeddings(size=740)``
(reference tests/test_storage.py:24), which is only structurally
deterministic. For cross-engine hash-matching we need fully reproducible
vectors, so we use the FIXTURES.md §5 hash embedding:

    v[i] = (sha256(text || str(i)) mod 2001 - 1000) / 1000.0

LLM / NLI backends are scripted lookup tables (see pipelines.backends).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T


def hash_embedding(text: str, dim: int = 384) -> list[float]:
    """Deterministic pseudo-embedding of ``text`` (driver-side helper).

    dim i = sha256(text + str(i)) as a 256-bit int, mod 2001, affine to
    [-1, 1]. The shared-prefix hash state is computed once and
    ``copy()``d per dim — identical digests, ~5× fewer bytes hashed."""
    base = hashlib.sha256(text.encode("utf-8"))
    out = np.empty(dim, dtype=np.float64)
    for i in range(dim):
        h = base.copy()
        h.update(str(i).encode("utf-8"))
        out[i] = (int.from_bytes(h.digest(), "big") % 2001 - 1000) / 1000.0
    return [float(x) for x in out]


def hash_embedding_udf(dim: int = 384) -> Column:
    """Arrow-batched pandas_udf computing the hash embedding per row.

    This stands in for the SentenceTransformer pandas_udf of the real
    embedding stage (reference storage.py:117-122) — same signature and
    batching, deterministic output.
    """

    @F.pandas_udf(T.ArrayType(T.FloatType()))
    def _embed(texts: pd.Series) -> pd.Series:
        return texts.map(lambda t: hash_embedding("" if t is None else t, dim))

    return _embed


def embed_column(col: Column | str, dim: int = 384) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return hash_embedding_udf(dim)(c)


class PairCountingNLI:
    """NLI spy that tallies gated pair-batch sizes into a shared-FS
    file and entails nothing. Lives here (not in a test module) so
    executor processes can unpickle it; in local mode the temp file is
    visible to every worker. Used to assert O(batch·k) candidate
    bounds on the dedup gate."""

    def __init__(self, path: str):
        self.path = path

    def score_pairs(self, pairs):
        with open(self.path, "a") as f:
            f.write(f"{len(pairs)}\n")
        return [None for _ in pairs]

    def detect_entailment(self, premise, hypothesis):
        return False


class FakeSentenceTransformerModel:
    """Deterministic stand-in for a SentenceTransformer: vector =
    [len(text), 1.0, 0.0]. Module-level so executor processes can
    unpickle loaders that reference it."""

    def encode(self, texts, batch_size=32):
        import numpy as np

        return np.array([[float(len(t)), 1.0, 0.0] for t in texts])


class FakeCrossEncoderModel:
    """Deterministic stand-in for an NLI CrossEncoder: a pair entails
    (label argmax == 1) iff premise and hypothesis share their first
    word; the entail logit is the premise length."""

    def predict(self, pairs):
        import numpy as np

        out = []
        for p, h in pairs:
            if p.split()[:1] == h.split()[:1]:
                out.append([0.1, float(len(p)), 0.2])
            else:
                out.append([0.9, 0.1, 0.2])
        return np.array(out)


def fake_st_loader(model_name: str):
    return FakeSentenceTransformerModel()


def fake_ce_loader(model_name: str):
    return FakeCrossEncoderModel()
