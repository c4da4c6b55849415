"""Retrieval entry point (reference V7 — retrieval.py:69-78): top-k
facts for a query, itemized context block, optional RAG answer."""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import functions as F

from hippollm_spark.functions.text import itemize
from hippollm_spark.pipelines import prompts
from hippollm_spark.store import HippoStore

FACTS_K = 10  # reference retrieval.py:13


def retrieve(
    store: HippoStore,
    query_vec: Sequence[float],
    k: int = FACTS_K,
    entities: Sequence[str] | None = None,
    mode: str = "union",
):
    """Top-k facts; optionally pre-filtered by entity union/intersection
    (the reference's hybrid graph+vector query)."""
    if entities:
        if mode == "union":
            return store.get_closest_facts_with_entities_union(query_vec, entities, k)
        return store.get_closest_facts_with_entities_intersection(query_vec, entities, k)
    return store.get_closest_facts(query_vec, k)


def itemized_context(facts_df) -> str:
    """'- fact' lines in retrieval order (reference helpers.py:62-64)."""
    row = (
        facts_df.select("text")
        .agg(F.collect_list("text").alias("texts"))
        .select(itemize("texts").alias("block"))
        .first()
    )
    return row["block"] or ""


def answer(store: HippoStore, query_vec: Sequence[float], query_text: str, llm, k: int = FACTS_K) -> str:
    """RAG answer: retrieve → itemize → one LLM call on the driver."""
    facts = retrieve(store, query_vec, k)
    ctx = itemized_context(facts)
    return llm.invoke(prompts.RETRIEVAL.format(facts=ctx, query=query_text))
