"""Real model runtimes as executor-local lazy wrappers (reference
storage.py:117-122 SentenceTransformer embeddings; nlp_additional.py
CrossEncoder NLI).

This container ships no model runtimes, so the classes here hold the
LOADING AND BATCHING CONTRACT and import the libraries only at first
use: ship the (picklable) wrapper into a ``mapInPandas`` stage, and the
model loads once per python worker process (process-level cache keyed
by model name — Spark reuses workers across batches, so the load
amortizes across the whole job). Tests inject deterministic loaders
(`testing.fake_st_loader` / `fake_ce_loader`) to pin the call shapes;
in a real deployment nothing else changes.

Scale notes: embedding runs as an Arrow-batched pandas_udf — ONE
encode() per Arrow batch (vectorized model call), never per row; pair
scoring mirrors the CrossEncoder pair-list API so the NLI gate in
`annotate.dedup_facts` sends one predict() per Arrow batch. Repartition
before the inference stage (`embed_partitions` in the pipelines) so AQE
doesn't coalesce model work onto a few cores.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

# process-local model caches (one per python worker; never pickled).
# Keyed by (loader identity, model name) so an injected test loader
# can't collide with the real one inside a reused worker process.
_ST_CACHE: dict[tuple, object] = {}
_CE_CACHE: dict[tuple, object] = {}


def load_sentence_transformer(model_name: str):
    """Default loader: the real sentence-transformers runtime."""
    try:
        from sentence_transformers import SentenceTransformer
    except ImportError as e:  # pragma: no cover
        raise ImportError(
            "sentence-transformers is not installed in this environment; "
            "use hippollm_spark.testing.hash_embedding_udf as the "
            "deterministic stand-in"
        ) from e
    return SentenceTransformer(model_name)


def load_cross_encoder(model_name: str):
    """Default loader: the real sentence-transformers CrossEncoder."""
    try:
        from sentence_transformers import CrossEncoder
    except ImportError as e:  # pragma: no cover
        raise ImportError(
            "sentence-transformers is not installed in this environment; "
            "use hippollm_spark.pipelines.backends.ScriptedNLI as the "
            "deterministic stand-in"
        ) from e
    return CrossEncoder(model_name)


def _cached(cache: dict, loader, model_name: str):
    key = (getattr(loader, "__module__", ""), getattr(loader, "__qualname__", repr(loader)), model_name)
    if key not in cache:
        cache[key] = loader(model_name)
    return cache[key]


class SentenceTransformerEmbed:
    """Embedding slot for `HippoStore`/`annotate` with a real
    SentenceTransformer (reference storage.py:117-122 embeds entity
    repr strings and fact texts with all-MiniLM-L6-v2, dim 384).

    ``udf()`` returns the Arrow-batched pandas_udf the engine's embed
    slots expect — same signature as `testing.hash_embedding_udf`,
    drop-in swap.

    ``loader`` (picklable callable: model_name -> model object)
    defaults to the real runtime; tests inject a deterministic fake —
    executors unpickle the wrapper, so the loader must be a
    module-level function, never a lambda defined in a test.
    """

    def __init__(
        self,
        model_name: str = "all-MiniLM-L6-v2",
        dim: int = 384,
        batch_size: int = 64,
        loader=None,
    ) -> None:
        self.model_name = model_name
        self.dim = dim
        self.batch_size = batch_size
        self.loader = loader or load_sentence_transformer

    def encode(self, texts: list[str]) -> list[list[float]]:
        model = _cached(_ST_CACHE, self.loader, self.model_name)
        vecs = model.encode(
            ["" if t is None else t for t in texts],
            batch_size=self.batch_size,
        )
        return [list(map(float, v)) for v in np.asarray(vecs)]

    def udf(self) -> Column:
        wrapper = self  # picklable; the model stays in the process cache

        @F.pandas_udf(T.ArrayType(T.FloatType()))
        def _embed(texts: pd.Series) -> pd.Series:
            out = wrapper.encode(list(texts))
            return pd.Series(out)

        return _embed


class CrossEncoderNLI:
    """NLI gate with a real CrossEncoder (reference
    nlp_additional.py:9-34: label argmax == 1 means entailment, ranking
    by the entail logit desc). Implements the same surface as
    `ScriptedNLI` — detect_entailment / score / score_pairs /
    entailment_classify — so every pipeline stage takes either.
    ``loader`` as in `SentenceTransformerEmbed`.
    """

    def __init__(
        self,
        model_name: str = "cross-encoder/nli-deberta-v3-base",
        loader=None,
    ) -> None:
        self.model_name = model_name
        self.loader = loader or load_cross_encoder

    def _predict(self, pairs: list[tuple[str, str]]) -> np.ndarray:
        model = _cached(_CE_CACHE, self.loader, self.model_name)
        return np.asarray(model.predict(pairs))

    def detect_entailment(self, premise: str, hypothesis: str) -> bool:
        scores = self._predict([(premise, hypothesis)])
        return bool(scores[0].argmax() == 1)

    def score(self, premise: str, hypothesis: str) -> float | None:
        scores = self._predict([(premise, hypothesis)])[0]
        return float(scores[1]) if scores.argmax() == 1 else None

    def score_pairs(
        self, pairs: list[tuple[str, str]]
    ) -> list[float | None]:
        """ONE model predict per call — the batch contract
        `annotate.dedup_facts` relies on (one call per Arrow batch)."""
        if not pairs:
            return []
        scores = self._predict(list(pairs))
        return [
            float(row[1]) if row.argmax() == 1 else None for row in scores
        ]

    def entailment_classify(
        self, item: str, others: list[str]
    ) -> list[tuple[str, float]]:
        """Entailing candidates ranked by entail score desc (reference
        nlp_additional.py:24-34), ties broken by input order — the
        ScriptedNLI-compatible shape."""
        if not others:
            return []
        scores = self._predict([(o, item) for o in others])
        ranked = []
        for pos, o in enumerate(others):
            row = scores[pos]
            if row.argmax() == 1:
                ranked.append((-float(row[1]), pos, o))
        ranked.sort()
        return [(o, -neg) for neg, _, o in ranked]
