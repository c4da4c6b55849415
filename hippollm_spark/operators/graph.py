"""Graph operators over the (entities, facts, edges) hypergraph
(reference G1-G3).

A fact is a hyperedge over >=1 entities; the normalized ``edges``
DataFrame (fact_id, entity) makes every graph op a join:

- 1-hop neighbours  = self-join of edges on fact_id,
- multi-hop explore = iterated frontier joins (BFS),
- co-occurrence     = pairwise self-join per fact.

Scale notes: edges is two narrow columns — at 100 TB of documents the
edge table is orders of magnitude smaller than the fact payloads, so we
join on edges and only rejoin payloads at the end. Frontier joins cache
+ localCheckpoint per hop to cut lineage growth.
"""

from __future__ import annotations

import threading
from collections.abc import Sequence
from contextlib import contextmanager

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window

from .ranks import distributed_rank

# A loop state table at or below this row count is broadcast into the
# per-round joins (checkpoint leaves have no size statistics, so the
# planner would otherwise exchange the big cached edge list every
# round); above it, the shuffle join is the right plan and the hint is
# withheld. ~2M rows of (vertex, long) is tens of MB serialized.
_BROADCAST_STATE_MAX = 2_000_000

# triangle_stats broadcast-adjacency gates (round 11: no longer a
# box-sized constant — ADVICE r10). The integer-encoded out-adjacency
# (one entry per edge, grouped into per-vertex arrays) is broadcast
# twice; its per-executor memory cost is ~_ADJ_BYTES_PER_EDGE bytes
# per edge across the serialized torrent blocks and the deserialized
# array relation. The edge gate is therefore DERIVED from the actual
# JVM heap at call time (`_intersect_edge_gate`: ≤ _ADJ_HEAP_FRACTION
# of executor memory; ≈160M edges on this box's 48g driver heap —
# admits the measured-green sf10 graph at 119.7M edges / 129.5B
# wedges), overridable per call (`intersect_edge_max=`) or per session
# (`spark.hippollm.triangles.intersectEdgeMax`). The constant below is
# only the fallback when heap detection fails. The intersect path only
# ENGAGES when the wedge set is the hazard (raw Σ C(deg,2) above
# the wedge gate — ~150M wedge rows ≈ 10 GB of string-pair
# shuffle); below that the wedge join is cheaper than the intersect
# path's per-edge array hashing (measured sf0.1: 0.7 s wedge join vs
# 3.9 s intersect; sf1: wedge join DIED on disk at 3.0B wedges,
# intersect finishes in 46 s).
_INTERSECT_EDGE_MAX = 150_000_000
_WEDGE_MATERIALIZE_MAX = 150_000_000
_ADJ_BYTES_PER_EDGE = 64
_ADJ_HEAP_FRACTION = 0.20


def _bc(df: DataFrame, n: int) -> DataFrame:
    """Broadcast hint gated on a row-count BOUND for the frame being
    broadcast (see above). Callers must pass a bound on THIS frame's
    rows — the vertex count for per-vertex state tables (which can
    hold up to 2·|E| rows when vertices come from src ∪ dst), not the
    edge count — because an explicit hint bypasses
    autoBroadcastJoinThreshold entirely."""
    return F.broadcast(df) if n <= _BROADCAST_STATE_MAX else df


_MEM_UNITS = {"k": 1 << 10, "m": 1 << 20, "g": 1 << 30, "t": 1 << 40}


def _parse_jvm_mem(s: str) -> int | None:
    """Parse a JVM memory string ('48g', '512m', '2048'→bytes)."""
    s = s.strip().lower()
    if s.endswith("b") and len(s) > 1 and s[-2] in _MEM_UNITS:
        s = s[:-1]
    try:
        if s and s[-1] in _MEM_UNITS:
            return int(float(s[:-1]) * _MEM_UNITS[s[-1]])
        return int(s)
    except ValueError:
        return None


def _jvm_heap_bytes(spark) -> int | None:
    """Heap of the JVM that will HOST the adjacency broadcast: in
    local mode the driver JVM is the executor, so Runtime.maxMemory()
    is exact; on a cluster the broadcast is consumed executor-side, so
    ``spark.executor.memory`` governs. None when neither is knowable
    (callers fall back to the conservative constant)."""
    sc = spark.sparkContext
    conf = sc.getConf()
    if conf.get("spark.master", "").startswith("local"):
        try:
            return int(sc._jvm.java.lang.Runtime.getRuntime().maxMemory())
        except Exception:  # pragma: no cover - py4j hiccup
            pass
    mem = conf.get("spark.executor.memory", None)
    return _parse_jvm_mem(mem) if mem else None


def _intersect_edge_gate(spark) -> int:
    """Max edge count admitted to the broadcast-adjacency triangle
    path: ≤ `_ADJ_HEAP_FRACTION` of the hosting JVM's heap at
    `_ADJ_BYTES_PER_EDGE` bytes/edge (two broadcast copies + the
    deserialized array relation). Session override:
    ``spark.hippollm.triangles.intersectEdgeMax``."""
    conf_v = spark.conf.get("spark.hippollm.triangles.intersectEdgeMax", None)
    if conf_v is not None:
        return int(conf_v)
    heap = _jvm_heap_bytes(spark)
    if heap is None:
        return _INTERSECT_EDGE_MAX
    return int(heap * _ADJ_HEAP_FRACTION / _ADJ_BYTES_PER_EDGE)


# _loop_tuning mutates two SESSION-global confs; the lock + PER-SESSION
# depth counters make overlapping loops safe (first entrant on a
# session saves, last exiter on that session restores — no torn
# save/restore can leave the narrowed settings applied permanently,
# and two sessions looping concurrently in one process each get their
# own save/set/restore instead of the first session's saved values
# leaking onto the second). A query running CONCURRENTLY on the same
# SparkSession still observes the loop's settings for its duration —
# that is inherent to session-scoped conf and documented in the
# contextmanager docstring.
_TUNING_LOCK = threading.Lock()
# id(spark) -> [depth, (saved_aqe, saved_partitions)]; entries are
# removed at depth 0, so a dead session never pins stale state.
_TUNING_STATE: dict[int, list] = {}


@contextmanager
def _loop_tuning(spark, n_keys: int):
    """Planner settings scoped to a fixed-shape iterative loop: the
    2·iterations jobs have KNOWN shapes (edge scan + small-key
    aggregate, usually with a broadcast state join), so AQE re-planning
    per job buys nothing and costs a driver round-trip per stage, and
    the default shuffle width schedules 32 near-empty tasks per
    exchange. Partitions are sized to the loop's key volume (floor 8,
    ceiling the session conf — a 100-TB graph keeps the caller's
    sizing). Both settings restored on exit, exception or not.

    Concurrency: the confs are session-global. Overlapping loops are
    refcounted PER SESSION (outermost entrant on a session saves+sets,
    last exiter on that session restores — inner loops inherit the
    outer sizing), so no interleaving can leave the narrowed settings
    stuck, and concurrent loops on two different sessions each tune
    and restore their own session. An unrelated query running
    concurrently on the same session DOES see AQE off and the narrowed
    partitions for the loop's duration; callers mixing iterative graph
    ops with concurrent wide queries on one session should run the
    graph op on its own session."""
    key = id(spark)
    with _TUNING_LOCK:
        state = _TUNING_STATE.get(key)
        if state is None:
            sp0 = spark.conf.get("spark.sql.shuffle.partitions")
            saved = (
                spark.conf.get("spark.sql.adaptive.enabled"),
                sp0,
            )
            spark.conf.set("spark.sql.adaptive.enabled", "false")
            spark.conf.set(
                "spark.sql.shuffle.partitions",
                str(max(8, min(int(sp0), n_keys // 250_000))),
            )
            _TUNING_STATE[key] = [1, saved]
        else:
            state[0] += 1
    try:
        yield
    finally:
        with _TUNING_LOCK:
            state = _TUNING_STATE[key]
            state[0] -= 1
            if state[0] == 0:
                saved = state[1]
                spark.conf.set("spark.sql.adaptive.enabled", saved[0])
                spark.conf.set("spark.sql.shuffle.partitions", saved[1])
                del _TUNING_STATE[key]


def _seal(df: DataFrame, pins: Sequence[DataFrame]) -> DataFrame:
    """Cut an iterative op's result free of its loop lineage (eager
    localCheckpoint — the inputs are already cache-resident from the
    loop's own actions, so this is one cheap materialization of the
    final table) and release every loop cache pin. Without the
    unpersist, CacheManager holds the pinned edge/label blocks until
    the session dies — they accumulate across queries in a long
    session (the bfs unpersist discipline, applied at function exit)."""
    out = df.localCheckpoint(eager=True)
    for p in pins:
        p.unpersist()
    return out


def neighbours(edges: DataFrame, entity: str, *, sort_facts: bool = True) -> DataFrame:
    """G1 — co-members of every fact incident to ``entity``, with the
    shared fact ids (reference storage.py:213-224).

    Output: (entity STRING, fact_ids ARRAY<BIGINT>, n_facts BIGINT).
    fact_ids sorted ascending for deterministic comparison (the
    reference's insertion order == ascending id order, since ids are
    append-ordered).
    """
    mine = edges.filter(F.col("entity") == F.lit(entity)).select("fact_id")
    out = (
        edges.join(F.broadcast(mine), on="fact_id", how="semi")
        .filter(F.col("entity") != F.lit(entity))
        .groupBy("entity")
        .agg(
            F.collect_list("fact_id").alias("fact_ids"),
            F.count("fact_id").alias("n_facts"),
        )
    )
    if sort_facts:
        out = out.withColumn("fact_ids", F.array_sort("fact_ids"))
    return out


def explore(
    edges: DataFrame,
    origins: Sequence[str],
    max_depth: int = 2,
    max_relations: int | None = 15,
    *,
    cap_all_depths: bool = False,
    checkpoint_after: int = 2,
    persist_edges: bool = False,
) -> DataFrame:
    """G2 — multi-hop neighbourhood expansion (reference
    hippoview app.py:37-63).

    Reference quirks preserved:
    - per-node cap keeps the ``max_relations`` neighbours with the MOST
      shared facts (app.py:47-50),
    - the cap is only applied at depth 1 — recursive calls omit
      ``max_relations`` (app.py:55-62). ``cap_all_depths=True`` gives
      the saner scalable behavior.
    - visited-set dedup: a node expanded at depth d is not re-expanded.

    Implementation: iterative BFS, one frontier join per hop (k hops =
    k jobs). Returns discovered links
    (src STRING, dst STRING, n_facts BIGINT, fact_ids ARRAY<BIGINT>, depth INT).
    """
    spark = edges.sparkSession
    # `persist_edges=False` (default): edges stays a lazy plan so
    # Catalyst pushes the broadcast frontier into the underlying scans
    # each hop — the right default for SELECTIVE traversals (few
    # origins, capped fan-out), where recompute-with-pushdown beats a
    # full materialization pass. But only the FRONTIER (src) arm can
    # prune: the dst arm re-joins the FULL edge view on fact_id, so an
    # edge view that is itself a join gets rebuilt once per hop.
    # `persist_edges=True` caches it once instead (pin released by
    # _seal) — measured r11 on the uncapped 2-hop g2 shape over the
    # lineitem⋈part view: 3.76 s → 3.32 s mean, interleaved A/B; use
    # it for uncapped multi-hop walks whose edge view is expensive.
    pins = []  # per-hop cache pins, released at exit via _seal
    if persist_edges:
        edges = edges.cache()
        pins.append(edges)
    visited = spark.createDataFrame([(o,) for o in origins], "entity string")
    frontier = visited
    results = None
    for depth in range(1, max_depth + 1):
        fr = frontier.select(F.col("entity").alias("src"))
        links = (
            edges.withColumnRenamed("entity", "src")
            .join(F.broadcast(fr), on="src", how="inner")
            .join(edges.withColumnRenamed("entity", "dst"), on="fact_id")
            .filter(F.col("src") != F.col("dst"))
            .groupBy("src", "dst")
            .agg(
                F.count("fact_id").alias("n_facts"),
                F.array_sort(F.collect_list("fact_id")).alias("fact_ids"),
            )
            .withColumn("depth", F.lit(depth))
        )
        if max_relations is not None and (depth == 1 or cap_all_depths):
            w = Window.partitionBy("src").orderBy(
                F.desc("n_facts"), F.asc("dst")
            )
            links = (
                links.withColumn("__rk__", F.row_number().over(w))
                .filter(F.col("__rk__") <= max_relations)
                .drop("__rk__")
            )
        # Hop outputs are reused three times (early-exit probe, result
        # union, next frontier): cache() gives the reuse without the
        # eager extra job of localCheckpoint. Past ``checkpoint_after``
        # hops, ALSO cut lineage — plans grow multiplicatively with
        # depth and deep traversals re-plan forever otherwise. The FINAL
        # hop is consumed exactly once (the result union; the loop
        # breaks before building another frontier), so materializing it
        # would be a pure extra pass — leave it lazy and let the final
        # job fuse it with the first-discovery window.
        if depth < max_depth:
            links = links.cache()
            pins.append(links)
            if depth >= checkpoint_after:
                links = links.localCheckpoint(eager=True)
        results = links if results is None else results.unionByName(links)
        if depth == max_depth:
            break  # last hop: the next frontier would never be expanded
        next_frontier = (
            links.select(F.col("dst").alias("entity"))
            .distinct()
            .join(visited, on="entity", how="left_anti")
            .cache()
        )
        visited = visited.unionByName(next_frontier).cache()
        pins.extend([next_frontier, visited])
        frontier = next_frontier
        if frontier.isEmpty():
            break
    if results is None:
        return spark.createDataFrame(
            [], "src string, dst string, n_facts long, fact_ids array<long>, depth int"
        )
    # Keep first (shallowest) discovery of each (src,dst) pair. min_by
    # instead of a row_number window: a hash aggregate with partial
    # (map-side) combine, no sort — (src,dst,depth) is unique per hop so
    # there are no ties for min_by to break arbitrarily. _seal
    # materializes that final aggregate once (the work the caller's
    # action would do anyway lands here) and releases the per-hop cache
    # pins, so traversals don't accumulate pinned hop blocks across a
    # long session.
    return _seal(
        results.groupBy("src", "dst")
        .agg(F.min_by(F.struct("n_facts", "fact_ids", "depth"), "depth").alias("__f__"))
        .select("src", "dst", "__f__.n_facts", "__f__.fact_ids", "__f__.depth"),
        pins,
    )


def connected_components(
    edges: DataFrame, max_iter: int = 20, *, checkpoint_every: int = 3
) -> DataFrame:
    """Connected components of the entity graph (entities linked when
    they share a fact) via hash-min label propagation over the
    BIPARTITE entity-fact incidence — each iteration pushes the minimum
    component label entity→fact→entity. Two narrow shuffles per round
    (the classic large-graph CC shape, no GraphFrames dependency).

    Round complexity: hash-min converges in O(diameter) rounds — the
    right trade for hypergraph entity graphs, whose diameter is small
    (entities co-occur in dense fact neighbourhoods; the bench graph
    converges in 2 rounds, and social/knowledge graphs are
    small-world). A 100×-scale worst case (a long path graph) would
    need O(n) rounds; for that topology use
    `connected_components_star` — the large-star/small-star
    alternation with O(log² n) worst-case rounds and the identical
    output contract (equality-tested). Hash-min stays the default:
    on low-diameter co-occurrence graphs star-contraction's extra
    shuffles only add constant factor. ``max_iter`` bounds the
    pathological case and the early-exit check costs one cached count
    per round.

    Output: (entity STRING, component BIGINT) where component is the
    min xxhash64 label over the member entities (stable across runs).
    """
    # Pin the incidence list: it is joined TWICE per round, and the
    # caller's edge plan is often itself a join+distinct (the entity
    # graph derives from the fact table) — uncached, every round
    # recomputes that upstream shuffle 2x (measured 2.3x on the sf0.1
    # bench graph).
    edges = edges.select("entity", "fact_id").cache()
    n_inc = edges.count()  # materializes the pin; gates the state broadcasts
    labels = (
        edges.select("entity")
        .distinct()
        .withColumn("label", F.xxhash64("entity"))
    ).cache()
    pin = labels  # the one live per-round pin; superseded pins unpersist
    # Per-round invariant (r11): every entity belongs to at least one
    # fact (labels derives from edges), and each fact's min includes
    # the entity's OWN label, so new_label <= label for every entity —
    # the old labels⨯new_labels merge join (least/coalesce) was the
    # identity and is dropped: a hash-min round is exactly its two
    # aggregations (guide §2.4, remove shuffles outright). Fixpoint
    # detection replaces the per-row change flag with an exact label
    # fingerprint: Σ label as DECIMAL(38,0) (no overflow: |labels| ·
    # 2^63 << 10^38). Labels are per-entity non-increasing, so the sum
    # is equal across a round IFF no label changed.
    label_sum = F.sum(F.col("label").cast("decimal(38,0)")).alias("s")
    prev_sum = labels.agg(label_sum).first()["s"]  # also builds the pin
    with _loop_tuning(edges.sparkSession, n_inc):
        for it in range(max_iter):
            fact_min = (
                edges.join(_bc(labels, n_inc), "entity")
                .groupBy("fact_id")
                .agg(F.min("label").alias("fact_label"))
            )
            new_cache = new_labels = (
                edges.join(_bc(fact_min, n_inc), "fact_id")
                .groupBy("entity")
                .agg(F.min("fact_label").alias("label"))
            ).cache()
            if it % checkpoint_every == checkpoint_every - 1:
                new_labels = new_labels.localCheckpoint(eager=True)
            cur_sum = new_labels.agg(label_sum).first()["s"]
            pin.unpersist()  # previous round's label table, now superseded
            pin = new_cache
            labels = new_labels
            if cur_sum == prev_sum:
                break
            prev_sum = cur_sum
    return _seal(labels.withColumnRenamed("label", "component"), [edges, pin])


def connected_components_star(
    edges: DataFrame, max_rounds: int = 40, *, checkpoint_every: int = 2
) -> DataFrame:
    """Connected components by large-star/small-star alternation
    (Kiveris et al., "Connected Components in MapReduce and Beyond",
    SoCC 2014) — the O(log² n)-worst-case-rounds alternative to
    `connected_components` for graphs whose diameter can grow with
    scale (hash-min needs O(diameter) rounds: a 10⁹-vertex path graph
    would never finish). Same input (entity, fact_id incidence) and
    the IDENTICAL output contract: (entity STRING, component BIGINT),
    component = min xxhash64 over the member entities — the two
    implementations are equality-tested against each other.

    Mechanics: first a HYPEREDGE CONTRACTION — every member of a fact
    re-points at the fact's minimum entity id (one groupBy-min + one
    join over the incidence, i.e. half a hash-min round). This
    preserves components exactly (a star over a hyperedge's members
    is as connected as its clique) while producing an ENTITY-ONLY
    graph with ≤ |incidence| edges — never the k² pair projection a
    giant hyperedge would explode into. The alternation then runs on
    hashed entity ids (``xxhash64(entity)``, the same ids hash-min
    uses as labels): each round is one large-star (every neighbour
    larger than u re-points at min(Γ(u) ∪ u)) then one small-star
    (every neighbour ≤ u and u itself re-point at the min) — each a
    groupBy-min + re-emit on narrow (long, long) pairs. Fixpoint =
    the small-star output equals its input (exact set check: equal
    count + empty anti-join); at fixpoint the edge set is a star
    forest whose roots ARE the component-minimum entity ids, so the
    root doubles as hash-min's exact output label.
    """
    # NOTE r11: the contraction checkpoint's two subtrees (fact_min's
    # aggregate and the join probe) race the caller's un-materialized
    # edge view as concurrent first-touches, and `ents` builds it a
    # third time later. Pinning + force-counting the incidence here
    # was measured and REJECTED: +1.3 s reproduced in an interleaved
    # A/B (the blocking build costs more than the overlapping
    # duplicate builds — the curate_corpus pin-forcing lesson).
    ents = (
        edges.select("entity")
        .distinct()
        .withColumn("eid", F.xxhash64("entity"))
        .cache()
    )
    inc = edges.select(
        F.xxhash64("entity").alias("u"), F.col("fact_id").alias("f")
    )
    fact_min = inc.groupBy("f").agg(F.min("u").alias("v"))
    e = (
        inc.join(fact_min, "f")
        .select("u", "v")
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n0 = e.count()  # contracted edge count; sizes the loop shuffles
    # the per-round min tables hold one row per vertex in the current
    # edge set — up to 2·n0 (u ∪ v) — so gate their broadcasts on that
    # bound, not the edge count
    n_m = 2 * n0

    def _large_star(ed: DataFrame) -> DataFrame:
        sym = ed.select("u", "v").unionAll(
            ed.select(F.col("v").alias("u"), F.col("u").alias("v"))
        )
        m = sym.groupBy("u").agg(
            F.least(F.min("v"), F.first("u")).alias("m")
        )
        return (
            sym.join(_bc(m, n_m), "u")
            .filter(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .distinct()
        )

    def _small_star(ed: DataFrame) -> DataFrame:
        d = ed.select(
            F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
        ).filter(F.col("u") != F.col("v"))
        m = d.groupBy("u").agg(F.min("v").alias("m"))
        nbrs = d.unionAll(m.select(F.col("u"), F.col("u").alias("v")))
        return (
            nbrs.join(_bc(m, n_m), "u")
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .filter(F.col("u") != F.col("v"))
            .distinct()
        )

    pin = None  # live per-round cache pin (checkpoint rounds need none)
    n_prev = n0  # carry the round's edge count: e.count() re-ran a job
    # per round on the previous round's frame whose count was already
    # known (r11; result-identical, one fewer action per round)
    with _loop_tuning(edges.sparkSession, n0):
        for r in range(max_rounds):
            nxt = _small_star(_large_star(e))
            nxt_pin = None
            if r % checkpoint_every == checkpoint_every - 1:
                nxt = nxt.localCheckpoint(eager=True)
            else:
                nxt_pin = nxt = nxt.cache()
            # exact set-fixpoint check: counts equal and no new rows
            done = False
            n_nxt = nxt.count()
            if n_nxt == n_prev:
                done = nxt.join(e, ["u", "v"], "left_anti").isEmpty()
            n_prev = n_nxt
            if pin is not None:
                pin.unpersist()  # previous round's edge set, now superseded
            pin = nxt_pin
            e = nxt
            if done:
                break
    # star edges point child -> component-min entity id; roots (and
    # isolated entities) map to themselves — the root is the label.
    # The groupBy-min guards the capped exit: if max_rounds ran out
    # before the star-forest fixpoint, an entity can still hold edges
    # to several provisional parents — min keeps the output one row
    # per entity (with the best label so far, like hash-min's capped
    # exit) instead of emitting duplicates. At fixpoint it is a no-op
    # aggregation over single rows.
    return _seal(
        ents.join(e, ents.eid == e.u, "left")
        .groupBy("entity")
        .agg(F.min(F.coalesce("v", "eid")).alias("component")),
        [ents] + ([pin] if pin is not None else []),
    )


def cooccurrence(edges: DataFrame, fact_ids: DataFrame | None = None) -> DataFrame:
    """G3 — unordered entity-pair projection with weights (reference
    hippoview app.py:144-167: itertools.combinations per fact, merged).

    Shape: collect each fact's (deduped, sorted) entity set with ONE
    shuffle, generate the C(k,2) pairs locally per fact (k = entities
    per fact is small and bounded — a hyperedge has a handful of
    members), then one aggregation shuffle on the pair key. This beats
    the naive edges⨝edges self-join (3 shuffles, and the join
    materializes the same pairs anyway). Skew note: a pathological
    fact with thousands of members would blow up k² — cap upstream if
    ingesting untrusted hyperedges.
    Output: (entity_a, entity_b, weight BIGINT, fact_ids ARRAY<BIGINT>).
    """
    e = edges
    if fact_ids is not None:
        e = e.join(F.broadcast(fact_ids.select("fact_id").distinct()), "fact_id", "semi")
    per_fact = e.groupBy("fact_id").agg(
        F.array_sort(F.collect_set("entity")).alias("ents")
    )
    n = F.size("ents")
    pairs = F.flatten(
        F.transform(
            F.col("ents"),
            lambda x, i: F.transform(
                F.slice(F.col("ents"), i + 2, n),
                lambda y: F.struct(x.alias("entity_a"), y.alias("entity_b")),
            ),
        )
    )
    return (
        per_fact.select("fact_id", F.explode(pairs).alias("p"))
        .groupBy(F.col("p.entity_a").alias("entity_a"), F.col("p.entity_b").alias("entity_b"))
        .agg(
            F.count("fact_id").alias("weight"),
            F.array_sort(F.collect_list("fact_id")).alias("fact_ids"),
        )
    )


def pagerank(
    edges: DataFrame,
    iterations: int = 8,
    *,
    damping_pct: int = 85,
    scale: int = 10**12,
    src_col: str = "src",
    dst_col: str = "dst",
    checkpoint_every: int = 3,
    seeds: Sequence[str] | None = None,
    weight_col: str | None = None,
) -> DataFrame:
    """Fixed-iteration PageRank in exact scaled-integer arithmetic.

    With ``weight_col`` (integer weights), a vertex's outbound mass is
    split proportionally: contribution = ``(rank · w) div Σw(src)`` —
    still exact integer arithmetic (requires max_weight · scale <
    2^63; at scale=1e12 that allows weights up to ~9·10^6). Duplicate
    (src, dst) rows are coalesced by summing weights.

    With ``seeds``, this is PERSONALIZED PageRank: all initial mass
    and all teleport mass goes to the seed set (split evenly), so
    ranks measure proximity to the seeds — the batch generalization
    of the reference's entity-centric exploration (G2's "relevance
    around these entities"). Seeds must be vertices of the graph;
    mass aimed at a non-vertex seed simply vanishes.

    Floating-point PageRank cannot be hash-compared across engines
    (iteration compounds ulp drift), so all mass is carried as BIGINT
    in units of 1/``scale``: the per-edge contribution is
    ``rank div outdeg`` and the update is
    ``base + (damping_pct * Σcontrib) div 100`` — every operation an
    exact integer op, so the result is bit-identical on any engine
    (the DuckDB oracle unrolls the same recurrence). Rounding mass
    lost to floor-division is the price of determinism: bounded by
    |V|·iterations / scale, irrelevant at scale=1e12.

    Shape per iteration: one join ranks⨝edges (both sides keyed on
    the vertex domain — consecutive iterations reuse the hash
    partitioning) and one aggregation shuffle on dst. Lineage is cut
    with localCheckpoint every ``checkpoint_every`` iterations, the
    standard iterative-DataFrame discipline (an unbounded plan tree
    re-optimizes and re-executes from the scan each pass).

    Overflow: Σ contributions into one vertex ≤ total mass ≈ scale,
    so damping_pct·Σ ≤ 8.5e13 ≪ 2^63 regardless of graph size.

    Input edges are directed (src, dst); pass both directions for an
    undirected graph. Vertices = src ∪ dst, so sinks that appear only
    as dst are ranked (their mass leaks, as in standard PageRank with
    no dangling redistribution). Output: (vertex, rank_scaled BIGINT).
    """
    if weight_col is None:
        e = (
            edges.select(
                F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
            )
            .distinct()
            .withColumn("w", F.lit(1).cast("long"))
            .cache()
        )
    else:
        e = (
            edges.select(
                F.col(src_col).alias("src"),
                F.col(dst_col).alias("dst"),
                F.col(weight_col).cast("long").alias("w"),
            )
            .groupBy("src", "dst")
            .agg(F.sum("w").alias("w"))
            .cache()
        )
    # explode(array(src,dst)), not union-of-two-selects: the union's
    # two scans are CONCURRENT first-touches of the uncached `e` (the
    # first action below races them — e's distinct ran twice in the
    # r11 event log); one exploded scan builds e once and halves the
    # vertex-build map tasks (guide §2.4).
    vert_ids = (
        e.select(F.explode(F.array("src", "dst")).alias("vertex"))
        .distinct()
        .cache()
    )
    verts = vert_ids
    n = verts.count()
    if n == 0:
        empty = verts.withColumn(
            "rank_scaled", F.lit(0).cast("long")
        ).localCheckpoint(eager=True)
        e.unpersist()
        vert_ids.unpersist()
        return empty
    if seeds is None:
        r0 = scale // n
        verts = verts.withColumn("_r0", F.lit(r0).cast("long"))
    else:
        seed_list = sorted(set(seeds))
        r0 = scale // len(seed_list)
        verts = verts.withColumn(
            "_r0",
            F.when(F.col("vertex").isin(seed_list), F.lit(r0))
            .otherwise(F.lit(0))
            .cast("long"),
        )
    verts = verts.withColumn(
        "_base", F.expr(f"({100 - damping_pct} * _r0) div 100")
    ).cache()
    deg = e.groupBy("src").agg(F.sum("w").alias("outdeg"))
    pre = e.join(deg, "src").cache()  # (src, dst, w, outdeg): loop-invariant
    ranks = verts.select("vertex", F.col("_r0").alias("rank_scaled"))
    # rank/contrib frames are checkpoint leaves with no size stats —
    # broadcast them (count-gated) so the cached edge list is never
    # exchanged per round; AQE/partition tuning per _loop_tuning
    with _loop_tuning(edges.sparkSession, n):
        for it in range(iterations):
            contrib = (
                pre.join(_bc(ranks, n), pre.src == ranks.vertex)
                .select("dst", F.expr("(rank_scaled * w) div outdeg").alias("c"))
                .groupBy("dst")
                .agg(F.sum("c").alias("s"))
            )
            ranks = verts.join(
                _bc(contrib, n), verts.vertex == contrib.dst, "left"
            ).select(
                "vertex",
                (
                    F.col("_base")
                    + F.expr(f"({damping_pct} * coalesce(s, 0L)) div 100")
                ).cast("long").alias("rank_scaled"),
            )
            if it % checkpoint_every == checkpoint_every - 1:
                ranks = ranks.localCheckpoint(eager=True)
    return _seal(ranks, [e, vert_ids, verts, pre])


def triangle_stats(
    edges: DataFrame,
    *,
    src_col: str = "src",
    dst_col: str = "dst",
    intersect_edge_max: int | None = None,
    broadcast_state_max: int | None = None,
    wedge_materialize_max: int | None = None,
) -> DataFrame:
    """Global triangle count, wedge count, and clustering coefficient
    of an undirected graph — one row.

    The triangle join uses DEGREE-ORDERED ORIENTATION, the standard
    skew-proof form: each undirected edge is directed from its
    lower-degree endpoint to the higher (ties broken by vertex id),
    which bounds every vertex's out-degree by O(√m) regardless of how
    skewed the raw degree distribution is — a hub with a million
    neighbours enumerates no wedges; its low-degree neighbours each
    enumerate a handful. Each triangle is counted exactly once (its
    unique minimum-degree corner enumerates it), so no /3 correction
    and no duplicate blowup. Wedges = Σ C(deg,2) in exact integers;
    clustering = 3·triangles / wedges is the only double op, rounded
    to 6dp.

    STRATEGY (round 10): on a DENSE vocab-bounded graph the oriented
    wedge set itself is the killer — the sf1 co-occurrence projection
    has only 25k vertices but 11.7M edges and 3.0 BILLION oriented
    wedges, whose string-pair shuffle (~200 GB) filled the disk. When
    the graph is small enough to hold its out-adjacency in a broadcast
    (edge count ≤ _INTERSECT_EDGE_MAX and vertex count ≤
    _BROADCAST_STATE_MAX), triangles are counted WITHOUT materializing
    any wedge: per oriented edge (u,v), |N⁺(u) ∩ N⁺(v)| via
    array_intersect over integer-encoded broadcast adjacency — each
    triangle has exactly one source vertex with two out-edges, so the
    sum counts each once. Zero wedge shuffle; compute is
    Σ_e(|N⁺(u)|+|N⁺(v)|) ≤ 2·m·O(√m) hashed-int ops, JVM-side.
    Entity co-occurrence graphs are precisely this shape (the vertex
    set is the vocabulary — it grows far slower than the corpus).
    Past the gate, the general degree-oriented wedge join runs — the
    scale-safe m^1.5 path for graphs whose adjacency exceeds one
    executor's memory.

    EAGER (round 11, ADVICE r10): this operator EXECUTES at call time
    — a small stats job picks the strategy, then the census itself
    runs and the one-row result is sealed (`_seal`: eager
    localCheckpoint + unpersist of every internal cache pin). The
    returned DataFrame is a consistent SNAPSHOT of the input as of the
    call — n_triangles and n_wedges come from the same cached edge
    canonicalization — and leaves no storage pinned behind, so
    repeated library calls don't accumulate executor memory. Gates:
    keyword args > `spark.hippollm.triangles.{intersectEdgeMax,
    broadcastStateMax,wedgeMaterializeMax}` conf > heap-derived /
    module defaults (see `_intersect_edge_gate`).
    """
    spark = edges.sparkSession
    if intersect_edge_max is None:
        intersect_edge_max = _intersect_edge_gate(spark)
    if broadcast_state_max is None:
        broadcast_state_max = int(
            spark.conf.get(
                "spark.hippollm.triangles.broadcastStateMax",
                str(_BROADCAST_STATE_MAX),
            )
        )
    if wedge_materialize_max is None:
        wedge_materialize_max = int(
            spark.conf.get(
                "spark.hippollm.triangles.wedgeMaterializeMax",
                str(_WEDGE_MATERIALIZE_MAX),
            )
        )
    a, b = F.col(src_col), F.col(dst_col)
    canon = (
        edges.select(
            F.least(a, b).alias("a"), F.greatest(a, b).alias("b")
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
        .cache()
        # ^ consumed by deg, the wedge join, and the closing semi-join:
        #   inline pipelined materialization; released by _seal at exit
    )
    deg = (
        canon.select(F.col("a").alias("v"))
        .union(canon.select(F.col("b").alias("v")))
        .groupBy("v")
        .agg(F.count("*").alias("d"))
        .cache()
        # ^ one row per vertex: consumed by the strategy-gate job below
        #   AND the orientation joins — without the pin the gate job
        #   recomputes it from canon and costs ~1 s at sf0.1
    )
    # one tiny job decides the strategy AND yields the wedge scalar
    # (deg is derived from the cached canon): n_vertices, edge count
    # (Σd/2), and raw wedges Σ C(d,2).
    gstats = deg.agg(
        F.count("*").alias("nv"),
        (F.sum("d") / 2).cast("long").alias("m"),
        F.sum(F.expr("d * (d - 1) div 2")).alias("w"),
    ).first()
    n_wedges = int(gstats["w"] or 0)
    da = deg.select(F.col("v").alias("a"), F.col("d").alias("da"))
    db = deg.select(F.col("v").alias("b"), F.col("d").alias("db"))
    lower_first = (F.col("da") < F.col("db")) | (
        (F.col("da") == F.col("db")) & (F.col("a") < F.col("b"))
    )
    oriented = (
        canon.join(da, "a")
        .join(db, "b")
        .select(
            F.when(lower_first, F.col("a")).otherwise(F.col("b")).alias("src"),
            F.when(lower_first, F.col("b")).otherwise(F.col("a")).alias("dst"),
        )
    ).cache()
    if (
        n_wedges > wedge_materialize_max
        and int(gstats["m"] or 0) <= intersect_edge_max
        and int(gstats["nv"] or 0) <= broadcast_state_max
    ):
        # broadcast-adjacency intersection: no wedge row ever exists.
        # Vertices are int-encoded first (deterministic: rank over the
        # sorted vertex set via distributed_rank — a sampled range
        # exchange + per-partition windows, no single-task global
        # sort; round 11, VERDICT r10 #4) so the broadcast arrays
        # carry fixed-width ints, not strings.
        ids = distributed_rank(deg.select("v"), ["v"], rank_col="vid").withColumn(
            "vid", F.col("vid").cast("int")  # nv gated ≤ ~2M: 4-byte ids
        )
        enc = (
            oriented.join(
                F.broadcast(
                    ids.select(F.col("v").alias("src"), F.col("vid").alias("sid"))
                ),
                "src",
            )
            .join(
                F.broadcast(
                    ids.select(F.col("v").alias("dst"), F.col("vid").alias("did"))
                ),
                "dst",
            )
            .select("sid", "did")
        )
        adj = enc.groupBy("sid").agg(F.collect_list("did").alias("nbrs"))
        per_edge = (
            enc.join(
                F.broadcast(
                    adj.select(F.col("sid").alias("_u"), F.col("nbrs").alias("nu"))
                ),
                enc.sid == F.col("_u"),
            )
            .join(
                F.broadcast(
                    adj.select(F.col("sid").alias("_v"), F.col("nbrs").alias("nv"))
                ),
                enc.did == F.col("_v"),
                "left",
            )
            .select(
                F.when(F.col("nv").isNull(), F.lit(0))
                .otherwise(F.size(F.array_intersect(F.col("nu"), F.col("nv"))))
                .alias("t")
            )
        )
        tri = per_edge.agg(
            F.coalesce(F.sum("t"), F.lit(0)).cast("long").alias("n_triangles")
        )
    else:
        x = oriented.alias("x")
        y = oriented.alias("y")
        wedge_pairs = (
            x.join(y, F.col("x.src") == F.col("y.src"))
            .filter(F.col("x.dst") < F.col("y.dst"))
            .select(
                F.col("x.dst").alias("a"), F.col("y.dst").alias("b")
            )
        )
        tri = wedge_pairs.join(canon, ["a", "b"], "left_semi").agg(
            F.count("*").alias("n_triangles")
        )
    # Seal: eagerly materialize the one-row census (this is where the
    # triangle job actually runs) and release every internal pin —
    # canon, deg, oriented — so library callers invoking triangle_stats
    # repeatedly don't accumulate executor storage (ADVICE r10).
    return _seal(
        tri.select(
            "n_triangles",
            F.lit(n_wedges).cast("long").alias("n_wedges"),
            F.round(
                F.lit(3.0)
                * F.col("n_triangles")
                / F.lit(float(max(n_wedges, 1))),
                6,
            ).alias("clustering"),
        ),
        [canon, deg, oriented],
    )


def shortest_paths(
    edges: DataFrame,
    seeds: Sequence[str],
    max_depth: int = 6,
    *,
    src_col: str = "src",
    dst_col: str = "dst",
    checkpoint_every: int = 3,
) -> DataFrame:
    """Unweighted shortest-path distance from a seed SET (multi-source
    BFS) — the batch form of the reference's depth-limited explore
    (hippoview app.py:37-63): instead of materializing one neighbour
    list per hop around one origin, label every reachable vertex with
    its hop distance in ≤ ``max_depth`` synchronous rounds.

    Classic frontier BFS: per round, join the frontier (vertices fixed
    at distance d) to the edge list, anti-join out already-settled
    vertices, settle the remainder at d+1. Each round is one hash join
    + one anti-join on narrow (vertex) keys; the frontier is cached
    and the settled set localCheckpoint'ed every ``checkpoint_every``
    rounds to cut lineage. Early exit when a frontier lands empty (the
    count is already materialized by the cache — no extra job).

    Pass both edge directions for an undirected graph. Output:
    (vertex, dist INT) for reachable vertices only; unreachable
    vertices are simply absent (join against it with a coalesce to ∞
    if needed).
    """
    # loop-invariant: joined every round — pin it so an expensive
    # upstream edge plan (join+distinct) computes once, not per hop
    e = edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst")).cache()
    n_e = e.count()  # materializes the pin; sizes the loop shuffles
    seed_list = sorted(set(seeds))
    spark = edges.sparkSession
    settled = spark.createDataFrame(
        [(s, 0) for s in seed_list], "vertex string, dist int"
    )
    frontier = settled.select("vertex").cache()
    # gate the frontier broadcast on its OWN size, known for free each
    # round (the seeds now; the already-counted nxt afterwards) — a
    # frontier can reach |V| ≈ 2·|E| rows, so the edge count is not a
    # valid bound for the frame actually being shipped
    n_f = len(seed_list)
    with _loop_tuning(spark, n_e):
        for d in range(1, max_depth + 1):
            reached = (
                e.join(_bc(frontier, n_f), e.src == frontier.vertex)
                .select(F.col("dst").alias("vertex"))
                .distinct()
            )
            nxt = reached.join(settled, "vertex", "left_anti").cache()
            n_f = nxt.count()
            if n_f == 0:
                nxt.unpersist()
                break
            settled = settled.unionByName(
                nxt.withColumn("dist", F.lit(d).cast("int"))
            )
            if d % checkpoint_every == 0:
                settled = settled.localCheckpoint(eager=True)
            frontier.unpersist()
            frontier = nxt
    return _seal(settled, [e, frontier])


def entity_jaccard(
    edges: DataFrame,
    *,
    min_shared: int = 1,
    min_jaccard: float = 0.0,
) -> DataFrame:
    """Node similarity over the hypergraph: Jaccard of the fact sets
    of every entity pair that shares at least ``min_shared`` facts —
    the graph-native cousin of the document near-dup joins (same
    blocking idea: pairs are only generated where an actual shared
    fact exists, never a quadratic cross join).

    Shape: one self-join of edges on fact_id (a < b) → pair counts;
    degrees aggregate from the same edge table and join back on each
    side. All shuffles carry (entity, entity, count) triples. Skew
    guard: a fact with f members emits f(f-1)/2 pairs — hyperedges
    are small in this domain (facts link a handful of entities), but
    a degenerate giant fact would need the same cap `winnow_dup_pairs`
    applies via max_df; expose nothing here and let callers pre-filter
    edges (documented contract).

    Output: (entity_a, entity_b, n_shared, deg_a, deg_b, jaccard) with
    jaccard = shared / (deg_a + deg_b - shared), rounded 6dp.
    """
    # edges is referenced FOUR times below (both self-join sides, and
    # the degree table behind each pair column), so an expensive
    # upstream view executes four times. Caching it was MEASURED and
    # REJECTED (r11): the four replicas run as concurrent stages on
    # idle cores, while a cache serializes a first-touch build barrier
    # ahead of them — interleaved runs showed +0.7 s with the pin
    # (2.57 → 3.31 s min-of-4), the same lesson as the curation/CC
    # pin-forcing rejections. At cluster scale, where cores are not
    # idle, callers should pass a pre-persisted edge frame instead.
    a = edges.select(F.col("fact_id"), F.col("entity").alias("entity_a"))
    b = edges.select(F.col("fact_id"), F.col("entity").alias("entity_b"))
    pairs = (
        a.join(b, "fact_id")
        .filter(F.col("entity_a") < F.col("entity_b"))
        .groupBy("entity_a", "entity_b")
        .agg(F.count("*").alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )
    deg = edges.groupBy("entity").agg(F.count("*").alias("deg"))
    da = deg.select(F.col("entity").alias("entity_a"), F.col("deg").alias("deg_a"))
    db = deg.select(F.col("entity").alias("entity_b"), F.col("deg").alias("deg_b"))
    out = (
        pairs.join(da, "entity_a")
        .join(db, "entity_b")
        .select(
            "entity_a",
            "entity_b",
            "n_shared",
            "deg_a",
            "deg_b",
            F.round(
                F.col("n_shared")
                / (F.col("deg_a") + F.col("deg_b") - F.col("n_shared")).cast(
                    "double"
                ),
                6,
            ).alias("jaccard"),
        )
    )
    if min_jaccard > 0.0:
        out = out.filter(F.col("jaccard") >= min_jaccard)
    return out


def label_propagation(
    edges: DataFrame,
    iterations: int = 3,
    *,
    src_col: str = "src",
    dst_col: str = "dst",
    checkpoint_every: int = 3,
) -> DataFrame:
    """Synchronous label-propagation community detection with a fully
    deterministic update rule: each round, a vertex adopts the label
    that is (most frequent among its in-neighbours, then smallest
    lexicographically) — the two-stage argmax makes the fixpoint
    engine-independent, so the DuckDB oracle can unroll the identical
    recurrence (plain LPA's random tie-breaking cannot be
    hash-compared). Isolated vertices keep their own label.

    Per round: one join (edges ⨝ labels, both keyed on the vertex
    domain), one (dst, label) count aggregate, a per-dst max window,
    and a min-label aggregate — all narrow key/label/count shuffles.
    Fixed iteration count, no convergence check (each check would be
    an extra job; communities stabilize in a few rounds and the
    semantic is "k synchronous rounds", which is what the oracle
    replays). Pass both edge directions for an undirected graph.

    Output: (vertex, label) — label is the elected community
    representative's name.
    """
    # loop-invariant edge list: pinned, same rationale as
    # connected_components (joined every round)
    e = edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst")).cache()
    n_e = e.count()  # materializes the pin; sizes the loop shuffles
    init = labels = (
        e.select(F.explode(F.array("src", "dst")).alias("vertex"))
        .distinct()
        .withColumn("label", F.col("vertex"))
        .cache()
    )
    # gate the per-vertex state broadcasts on the 2·|E| vertex-count
    # bound (the edge count alone would over-broadcast near the
    # threshold; an exact labels.count() would buy a tighter gate at
    # the cost of an extra job per call)
    n_v = 2 * n_e
    with _loop_tuning(edges.sparkSession, n_e):
        for it in range(iterations):
            counted = (
                e.join(_bc(labels, n_v), e.src == labels.vertex)
                .groupBy("dst", "label")
                .agg(F.count("*").alias("cnt"))
            )
            wmax = Window.partitionBy("dst")
            pick = (
                counted.withColumn("__mx__", F.max("cnt").over(wmax))
                .filter(F.col("cnt") == F.col("__mx__"))
                .groupBy("dst")
                .agg(F.min("label").alias("new_label"))
            )
            labels = labels.join(
                _bc(pick, n_v), labels.vertex == pick.dst, "left"
            ).select(
                "vertex", F.coalesce("new_label", "label").alias("label")
            )
            if it % checkpoint_every == checkpoint_every - 1:
                labels = labels.localCheckpoint(eager=True)
    return _seal(labels, [e, init])


def bellman_ford(
    edges: DataFrame,
    seeds: Sequence[str],
    rounds: int = 4,
    *,
    src_col: str = "src",
    dst_col: str = "dst",
    weight_col: str = "w",
    checkpoint_every: int = 3,
) -> DataFrame:
    """Weighted shortest-path distances from a seed set: ``rounds``
    synchronous Bellman-Ford relaxations with exact BIGINT weights —
    the weighted generalization of ``shortest_paths`` (hop counts are
    the w=1 special case). Exact-integer arithmetic keeps the
    fixpoint hash-comparable (float path sums compound ulp error
    across rounds), the same discipline as the integer PageRank and
    fixed-point k-means.

    Per round: one dist⨝edges join, one min-per-dst aggregate, one
    left join back — all narrow (vertex, dist) shuffles; consecutive
    rounds reuse the vertex-domain hash partitioning, lineage cut via
    localCheckpoint. After k rounds distances are exact for all
    shortest paths of ≤ k edges (full convergence at k = longest
    shortest path, the standard bound). Semantics: only vertices
    reachable within ``rounds`` edges appear.

    Output: (vertex, dist BIGINT).
    """
    e = edges.select(
        F.col(src_col).alias("src"),
        F.col(dst_col).alias("dst"),
        F.col(weight_col).cast("long").alias("w"),
    ).cache()
    n_e = e.count()  # materializes the pin; sizes the loop shuffles
    spark = edges.sparkSession
    dist = spark.createDataFrame(
        [(s, 0) for s in sorted(set(seeds))], "vertex string, dist long"
    )
    # dist grows toward |V| ≤ 2·|E| rows (vertices come from src ∪
    # dst); gate its broadcast on that bound, not the edge count —
    # counting dist per round would cost an extra job, and 2·n_e is a
    # valid (conservative) ceiling for the shipped frame
    n_d = 2 * n_e
    with _loop_tuning(spark, n_e):
        for r in range(rounds):
            relaxed = (
                e.join(_bc(dist, n_d), e.src == dist.vertex)
                .select(F.col("dst").alias("vertex"), (F.col("dist") + F.col("w")).alias("d"))
                .groupBy("vertex")
                .agg(F.min("d").alias("d"))
            )
            # least() skips NULLs, so a full-outer join + least IS the
            # relax (no broadcast hint: full-outer preserves both sides,
            # so it cannot be a broadcast join)
            # NOTE r11: fusing the merge into the aggregation
            # (dist ∪ relax-candidates → groupBy(vertex).min — one
            # shuffle join fewer per round, same semantics: min() skips
            # absent rows exactly as least() skips NULLs) was
            # implemented and MEASURED: graph_sssp 2.2-2.5 s → 2.8 s in
            # 2 of 3 interleaved pairs, control flat — the union drags
            # the (tiny, broadcast-sized) dist frame through every
            # round's full-width exchange, while the full-outer join
            # against the already-aggregated relax table exchanges it
            # once at trivial size. REJECTED (guide §1: measure, don't
            # assume).
            dist = dist.join(relaxed, "vertex", "full_outer").select(
                "vertex", F.least("dist", "d").alias("dist")
            )
            if r % checkpoint_every == checkpoint_every - 1:
                dist = dist.localCheckpoint(eager=True)
    return _seal(dist, [e])


def k_core(
    edges: DataFrame,
    k: int,
    *,
    src: str = "src",
    dst: str = "dst",
    rounds: int = 6,
    checkpoint_every: int = 3,
) -> DataFrame:
    """k-core decomposition membership by iterative peeling: repeatedly
    delete vertices with degree < k (and their incident edges) until
    fixpoint. Peeling is confluent — the surviving set is unique
    regardless of deletion order — so the result is deterministic and
    hash-comparable across engines.

    ``rounds`` bounds the peel loop (with early exit once a round
    removes nothing); an oracle replays the identical bounded
    recurrence, and converged-early runs are unaffected by the bound
    (extra rounds are no-ops). Expects a SYMMETRIZED edge list (both
    directions present); degree = count of out-neighbours.

    Scale shape per round: one groupBy degree count on the edge key +
    two semi-joins — all narrow-key hash shuffles; `localCheckpoint`
    every few rounds cuts the nested plan (the `dedup_canonicalize`
    discipline). Output: (vertex, degree) for the surviving k-core.
    """
    # round 0 reads the edge list 3x (degree count, semi-join filter,
    # the fixpoint count) — pin it so an expensive upstream plan
    # computes once; later rounds operate on the cached pruned set
    pin = e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")).cache()
    n0 = e.count()  # materializes the pin; gates the keep-set broadcasts
    with _loop_tuning(edges.sparkSession, n0):
        for r in range(rounds):
            deg = e.groupBy("src").agg(F.count("*").alias("degree"))
            keep = deg.filter(F.col("degree") >= k).select("src")
            pruned = e.join(_bc(keep, n0), "src", "left_semi").join(
                _bc(keep.withColumnRenamed("src", "dst"), n0), "dst", "left_semi"
            )
            pruned_pin = None
            if r % checkpoint_every == checkpoint_every - 1:
                pruned = pruned.localCheckpoint(eager=True)
            else:
                pruned_pin = pruned = pruned.cache()
            done = pruned.count() == e.count()
            if pin is not None:
                pin.unpersist()  # previous round's edge set, now superseded
            pin = pruned_pin
            e = pruned
            if done:
                break
    return _seal(
        e.groupBy("src")
        .agg(F.count("*").alias("degree"))
        .filter(F.col("degree") >= k)
        .select(F.col("src").alias("vertex"), "degree"),
        [pin] if pin is not None else [],
    )


def hits(
    edges: DataFrame,
    iterations: int = 3,
    *,
    scale: int = 10**12,
    src_col: str = "src",
    dst_col: str = "dst",
    pre_deduped: bool = False,
) -> DataFrame:
    """HITS hubs-and-authorities in exact scaled-integer arithmetic
    (the `pagerank` determinism discipline): per round, auth(v) =
    Σ hub(u) over u→v then max-normalized back to ``scale``, hub(v) =
    Σ auth(w) over v→w likewise. Every step is integer add / integer
    divide, so the fixpoint is bit-identical on any engine and an
    oracle can unroll the identical recurrence.

    Normalization is by the MAX (the classic power-iteration variant):
    ``new = (raw · scale) div max_raw`` — the multiply runs in
    DECIMAL(38,0) (raw ≤ indeg_max·scale can exceed 2^63 after the
    ·scale) and the integral divide truncates identically to DuckDB's
    HUGEINT ``//`` for the non-negative values here.

    Shape per round: two join+agg passes over the edge list (one per
    direction), each a broadcast join of the ≤|V|-row state against
    the cached edge list + one narrow-key partial-agg shuffle; the
    state/raw frames are EXPLICIT broadcasts — they are checkpoint
    leaves (ExistingRDD scans), which have no size statistics, so
    without the hint every engine-side planner falls back to a full
    edge-list exchange per half-round. Lineage is cut EVERY half-round
    (the mid-round auth feeds two consumers and each round nests 4
    joins — with the default every-3 cut cadence Catalyst re-analysis
    alone cost 200s at sf0.01; per-half-round checkpoints bring the
    same run to seconds, the `dedup_canonicalize` lesson).

    Loop-scoped planner tuning: the 2·iterations jobs have a KNOWN
    shape (broadcast join + one small fixed shuffle each), so AQE
    re-planning per job buys nothing and costs a scheduling round-trip
    per stage; the loop disables it and sizes
    ``spark.sql.shuffle.partitions`` to |E|/250k (floor 8, ceiling the
    session setting — at 100-TB edge counts this keeps the session's
    own sizing). Both confs are restored on exit, exception or not.

    ``pre_deduped=True`` skips the defensive edge dedup when the
    caller's edge list is already distinct — one full |E| shuffle
    saved (the co-occurrence/TPC-H graph builders all end in
    ``.distinct()``).
    Output: (vertex, hub_scaled BIGINT, auth_scaled BIGINT).
    """
    e = edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
    if not pre_deduped:
        e = e.distinct()
    e = e.cache()
    n_e = e.count()
    verts = (
        e.select(F.explode(F.array("src", "dst")).alias("vertex"))
        .distinct()
        .cache()
    )
    # per-vertex state frames (auth/hub/raw sums) hold up to |V| ≤
    # 2·|E| rows — gate their broadcasts on that bound (a count of the
    # frame actually shipped, unlike the raw edge count which
    # under-bounds it near the threshold; counting verts exactly would
    # cost an extra ~1 s job per call for a tighter gate nobody needs)
    n_v = 2 * n_e
    if n_e == 0:
        empty = verts.select(
            "vertex",
            F.lit(0).cast("long").alias("hub_scaled"),
            F.lit(0).cast("long").alias("auth_scaled"),
        ).localCheckpoint(eager=True)
        e.unpersist()
        verts.unpersist()
        return empty
    state = verts.select(
        "vertex",
        F.lit(scale).cast("long").alias("hub_scaled"),
        F.lit(scale).cast("long").alias("auth_scaled"),
    )

    def _norm(df: DataFrame, col: str) -> DataFrame:
        # df is a per-half-round checkpoint leaf, so the max is one
        # cheap local-block scan; folding it into the expression as a
        # driver literal (the kmeans centroid discipline) replaces the
        # former 1-row crossJoin(broadcast) — no BroadcastExchange job,
        # no BroadcastNestedLoopJoin node, 2 fewer jobs per round.
        mx = df.agg(F.max(col)).first()[0]
        if mx is None or mx <= 0:
            return df.withColumn(col, F.lit(0).cast("long"))
        return df.withColumn(
            col,
            F.expr(
                f"CAST((CAST({col} AS DECIMAL(38,0)) * {scale}) "
                f"div CAST({int(mx)} AS DECIMAL(38,0)) AS BIGINT)"
            ),
        )

    with _loop_tuning(edges.sparkSession, n_e):
        for it in range(iterations):
            # authority pass: sum hubs over in-edges. Checkpoint the
            # RAW sums BEFORE _norm: the max aggregate and the
            # normalization both read them, and without the cut each
            # would recompute the join+agg (and nest the plan another
            # level).
            auth_raw = (
                e.join(
                    _bc(
                        state.select(F.col("vertex").alias("src"), "hub_scaled"),
                        n_v,
                    ),
                    "src",
                )
                .groupBy("dst")
                .agg(F.sum("hub_scaled").alias("__a__"))
            )
            auth_pre = (
                verts.join(_bc(auth_raw, n_v), verts.vertex == auth_raw.dst, "left")
                .select(
                    "vertex",
                    F.coalesce("__a__", F.lit(0)).cast("long").alias("__a__"),
                )
                # lazy: _norm's max aggregate is the next action and
                # materializes the checkpoint in the SAME job — one
                # materialization per half-round instead of two
                .localCheckpoint(eager=False)
            )
            auth = _norm(auth_pre, "__a__")  # projection over a leaf
            # hub pass: sum NEW authorities over out-edges
            hub_raw = (
                e.join(
                    _bc(auth.select(F.col("vertex").alias("dst"), "__a__"), n_v),
                    "dst",
                )
                .groupBy("src")
                .agg(F.sum("__a__").alias("__h__"))
            )
            hub_pre = (
                verts.join(_bc(hub_raw, n_v), verts.vertex == hub_raw.src, "left")
                .select(
                    "vertex",
                    F.coalesce("__h__", F.lit(0)).cast("long").alias("__h__"),
                )
                .localCheckpoint(eager=False)
            )
            hub = _norm(hub_pre, "__h__")
            state = hub.withColumnRenamed("__h__", "hub_scaled").join(
                _bc(auth.withColumnRenamed("__a__", "auth_scaled"), n_v), "vertex"
            )
    # the final state derives only from the per-half-round checkpoint
    # leaves, so the loop pins can be released without a seal pass
    e.unpersist()
    verts.unpersist()
    return state.select("vertex", "hub_scaled", "auth_scaled")


def random_walks(
    edges: DataFrame,
    walks_per_vertex: int = 2,
    walk_length: int = 4,
    *,
    src_col: str = "src",
    dst_col: str = "dst",
    salt: str = "walk",
    checkpoint_every: int = 3,
) -> DataFrame:
    """Deterministic uniform random walks (the node2vec/DeepWalk
    corpus generator): ``walks_per_vertex`` walks of ``walk_length``
    steps from every vertex, where step t of walk w at vertex v picks
    neighbour index ``md5_15(salt|w|v|t) mod degree(v)`` (the
    `sampling.rank_hash` 15-hex-digit construction — engine-portable,
    so an oracle can unroll the walk) — fully
    reproducible (rerun-, partition- and engine-stable), re-saltable
    for fresh walk sets, no RNG state anywhere.

    Implementation: neighbours are pre-ranked once per vertex
    (dense_rank-free: one row_number window over the deduped edge
    list); each step is then ONE join of frontiers against the ranked
    adjacency on (vertex, picked_index) — never a neighbour explosion.
    Walks that reach a sink vertex stop early (shorter path emitted).

    Output: (walk_id STRING, step INT, vertex STRING) — one row per
    visited vertex, step 0 = origin; group by walk_id + collect to get
    sentence-like sequences for an embedding trainer.
    """
    e = (
        edges.select(F.col(src_col).alias("v"), F.col(dst_col).alias("n"))
        .distinct()
    )
    w_rank = Window.partitionBy("v").orderBy("n")
    adj = (
        e.withColumn("__i__", F.row_number().over(w_rank) - 1)
        .withColumn("__deg__", F.count("*").over(Window.partitionBy("v")))
        .localCheckpoint(eager=True)
    )
    # origins = ALL vertices (src ∪ dst): sinks still yield their
    # single-node walk, like DeepWalk starting from every node.
    # Derived from the checkpointed adjacency, not from ``e`` — e's
    # upstream (often a co-occurrence projection) would otherwise be
    # computed a second time just to list the vertex set.
    verts = (
        adj.select(F.explode(F.array("v", "n")).alias("v")).distinct()
    )
    frontier = verts.crossJoin(
        adj.sparkSession.range(walks_per_vertex).select(
            F.col("id").cast("int").alias("__w__")
        )
    ).select(
        F.concat_ws("#", F.col("v"), F.col("__w__")).alias("walk_id"),
        F.col("__w__"),
        F.col("v").alias("vertex"),
    )
    results = frontier.select(
        "walk_id", F.lit(0).alias("step"), "vertex"
    ).localCheckpoint(eager=True)
    # one row per vertex: lets each step compute its picked index
    # BEFORE touching the adjacency, so the step join is an equi-join
    # on (vertex, index) producing exactly one row per walk — joining
    # on vertex alone and filtering index==pick afterwards would
    # materialize deg(v) rows per walk per step, a blow-up under
    # power-law degrees
    # row_number guarantees exactly one __i__ == 0 row per vertex, so
    # this is the (v, degree) table with NO distinct: a plain filter
    # over the checkpointed adjacency instead of an exchange + two hash
    # aggregates re-executed by every step's join (guide §2.4).
    vdeg = adj.filter(F.col("__i__") == 0).select("v", "__deg__")
    cur = frontier
    pins = []  # cache-round frontier pins, released by the exit seal
    for t in range(1, walk_length + 1):
        h = F.md5(
            F.concat_ws(
                "|",
                F.lit(salt),
                F.col("__w__").cast("string"),
                F.col("vertex"),
                F.lit(str(t)),
            )
        )
        pick = F.pmod(
            F.conv(F.substring(h, 1, 15), 16, 10).cast("long"),
            F.col("__deg__"),
        )
        stepped = (
            cur.join(vdeg, cur.vertex == vdeg.v)
            .withColumn("__pick__", pick)
            .drop("v", "__deg__")
        )
        nxt = (
            stepped.join(
                adj,
                (stepped.vertex == adj.v) & (adj.__i__ == stepped.__pick__),
            )
            .select(
                "walk_id", "__w__", F.col("n").alias("vertex")
            )
        )
        if t % checkpoint_every == checkpoint_every - 1 or t == walk_length:
            nxt = nxt.localCheckpoint(eager=True)
        else:
            nxt = nxt.cache()
            pins.append(nxt)
        results = results.unionByName(
            nxt.select("walk_id", F.lit(t).alias("step"), "vertex")
        )
        cur = nxt
    return _seal(results, pins)
