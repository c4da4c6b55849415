"""Visualization/serving layer (reference G4-G5: hippoview
app.py:65-186) — builds the nodes/links JSON the reference's 3D force
graph consumes, from the engine's graph operators. The HTTP framing
itself is out of engine scope; any driver-side server can wrap
``search_graph``.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import functions as F

from hippollm_spark.operators import graph, knn
from hippollm_spark.store import HippoStore


def entity_graph(
    store: HippoStore,
    query_vecs: Sequence[Sequence[float]],
    k: int = 5,
    max_depth: int = 2,
    max_relations: int = 15,
) -> dict:
    """G4 — entity mode: kNN seeds per sub-query (the reference splits
    the query string on ';' — app.py:78-83), multi-hop explore from each
    seed group, nodes deduped and colored by the first group that found
    them (app.py:113-141)."""
    nodes: dict[str, int] = {}
    links: list[dict] = []
    seen_links: set[tuple[str, str]] = set()
    for group, qv in enumerate(query_vecs):
        seeds = [
            r["name"] for r in knn.knn_entities(store.entities, qv, k).collect()
        ]
        for s in seeds:
            nodes.setdefault(s, group)
        expl = graph.explore(
            store.edges, seeds, max_depth=max_depth, max_relations=max_relations
        )
        for r in expl.collect():
            nodes.setdefault(r["src"], group)
            nodes.setdefault(r["dst"], group)
            key = (min(r["src"], r["dst"]), max(r["src"], r["dst"]))
            if key not in seen_links:
                seen_links.add(key)
                links.append(
                    {
                        "source": r["src"],
                        "target": r["dst"],
                        "value": r["n_facts"],
                        "facts": list(r["fact_ids"]),
                    }
                )
    return {
        "nodes": [{"id": n, "group": g} for n, g in nodes.items()],
        "links": links,
    }


def fact_graph(store: HippoStore, query_vec: Sequence[float], k: int = 10) -> dict:
    """G3-backed fact mode: kNN facts → co-occurrence projection of
    their member entities (app.py:144-167)."""
    top = knn.knn_facts(store.facts, query_vec, k)
    ids = top.select(F.col("id").alias("fact_id"))
    proj = graph.cooccurrence(store.edges, ids)
    rows = proj.collect()
    nodes = sorted({r["entity_a"] for r in rows} | {r["entity_b"] for r in rows})
    return {
        "nodes": [{"id": n, "group": 0} for n in nodes],
        "links": [
            {
                "source": r["entity_a"],
                "target": r["entity_b"],
                "value": r["weight"],
                "facts": list(r["fact_ids"]),
            }
            for r in rows
        ],
    }
