"""Visualization/serving layer (reference G4-G5: hippoview
app.py:65-186) — builds the nodes/links JSON the reference's 3D force
graph consumes, from the engine's graph operators, plus a thin
optional-Flask route (`create_app`) mirroring the reference's
``GET /search/<k>/<n>/<p>/<query_type>/<query>`` endpoint
(app.py:170-186). The payload builders stay framework-free; Flask is
imported only inside `create_app` so the engine has no hard web
dependency.
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

def search_graph(
    store: HippoStore,
    embed_text,
    query: str,
    query_type: str = "entity",
    *,
    k: int = 5,
    max_depth: int = 2,
    max_relations: int = 15,
) -> dict:
    """The reference's Search.__call__ dispatch (app.py:65-167): split
    the query on ';' into sub-queries, embed each (``embed_text``:
    str → vector, driver-side — the reference embeds with the store's
    SentenceTransformer), then entity mode = kNN seeds + explore per
    group, fact mode = kNN facts + co-occurrence projection, merged
    across sub-queries with first-group-wins node dedup."""
    if query_type not in ("entity", "fact"):
        raise ValueError(f"query_type must be entity|fact, got {query_type!r}")
    subqueries = [q.strip() for q in query.split(";") if q.strip()]
    vecs = [embed_text(q) for q in subqueries]
    if query_type == "entity":
        return entity_graph(
            store, vecs, k=k, max_depth=max_depth, max_relations=max_relations
        )
    nodes: dict[str, int] = {}
    links: list[dict] = []
    seen: set[tuple[str, str]] = set()
    for group, qv in enumerate(vecs):
        payload = fact_graph(store, qv, k=k)
        for nd in payload["nodes"]:
            nodes.setdefault(nd["id"], group)
        for ln in payload["links"]:
            key = (min(ln["source"], ln["target"]), max(ln["source"], ln["target"]))
            if key not in seen:
                seen.add(key)
                links.append(ln)
    return {
        "nodes": [{"id": n, "group": g} for n, g in nodes.items()],
        "links": links,
    }


def create_app(store: HippoStore, embed_text):
    """G5 — the reference's Flask endpoint (hippoview app.py:170-186):
    ``GET /search/<k>/<n>/<p>/<query_type>/<query>`` returning the
    nodes/links JSON. Flask is an optional dependency — imported here,
    not at module load. ``n`` maps to explore depth and ``p`` to the
    per-node relation cap, as in the reference's explore()."""
    try:
        from flask import Flask
    except ImportError as e:  # pragma: no cover
        raise ImportError(
            "create_app needs flask (pip install flask); the payload "
            "builders entity_graph/fact_graph/search_graph work without it"
        ) from e
    import json

    app = Flask("hippollm_spark")

    @app.route(
        "/search/<int:k>/<int:n>/<int:p>/<query_type>/<query>",
        methods=["GET"],
    )
    def get(k: int, n: int, p: int, query_type: str, query: str):
        payload = search_graph(
            store, embed_text, query, query_type,
            k=k, max_depth=n, max_relations=p,
        )
        return app.response_class(
            json.dumps(payload), mimetype="application/json"
        )

    return app
