"""Local stand-in for the driver's t2 correctness gate: run every
``queries()`` entry on Spark and its ``oracle_sql()`` twin on DuckDB at
the same sf, compare row count, column names, and an order-insensitive
canonical value hash.

Two comparison modes:

- default (pandas): both results are collected to the driver and
  canonicalized in Python — exactly the driver's own comparison. Fine
  at sf0.01/0.1; capped by spark.driver.maxResultSize beyond that.
- ``--engine``: the canonical per-row string, its md5 digest, and the
  order-insensitive combine (two independent 60-bit digest SUMS in
  DECIMAL(38,0)) are computed INSIDE each engine; exactly ONE row is
  collected per side. This is the scale path — it oracle-checks
  results with hundreds of millions of rows (emb_dup_pairs at sf1 is
  44 M rows, fuzzy_name_pairs 627 M) that the pandas path cannot
  collect. Formatting parity with the pandas canon is preserved where
  representable (%.6f floats, isoformat timestamps/dates, str ints);
  the two modes' hashes are not comparable to each other — each mode
  compares Spark vs DuckDB under ONE shared definition, which is what
  makes a row green.

Usage: python tools/check_oracle.py [--engine] [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def canon(df: pd.DataFrame) -> tuple[str, int, list[str]]:
    cols = sorted(df.columns)
    df = df[cols]
    cells = []
    for _, row in df.iterrows():
        vals = []
        for v in row:
            if isinstance(v, float):
                vals.append(f"{v:.6f}")
            elif hasattr(v, "isoformat"):
                vals.append(v.isoformat())
            else:
                vals.append(str(v))
        cells.append("|".join(vals))
    cells.sort()
    h = hashlib.sha256("\n".join(cells).encode()).hexdigest()[:16]
    return h, len(df), cols


class UnsupportedType(Exception):
    """Column type the engine-side canon can't format portably yet."""


# Engine-side 6dp float rendering CANNOT use each engine's %.6f: for
# |x| large enough that ulp(x) > 1e-6 (≳ 2^33), Java's Formatter
# prints the SHORTEST decimal repr zero-padded while C printf rounds
# the exact binary value — same double, different digits (caught by
# tpch_q1 at sf3: Spark '…847.350000' vs DuckDB '…847.350006').
# Instead both engines derive the digits with the IDENTICAL IEEE op
# sequence — a = |x|; hi = floor(a) (exact); frac = a − hi (exact for
# a < 2^53); f6 = floor(frac·1e6 + 0.5); carry — so the rendered
# string is bit-determined by the double value alone. Exact-integer
# rendering of hi holds for |x| < 2^53 (≈9e15): beyond that Spark's
# double→decimal goes through the shortest repr and could diverge —
# far above any contract-query magnitude.


def _spark_f6(d):
    """6dp rendering of a non-null finite double column (Spark side)."""
    from pyspark.sql import functions as F

    a = F.abs(d)
    hi = F.floor(a)  # LONG, exact for |a| < 2^53
    f6 = F.floor((a - hi.cast("double")) * 1e6 + F.lit(0.5)).cast("long")
    hi2 = hi + F.when(f6 >= 1_000_000, F.lit(1)).otherwise(F.lit(0))
    f6r = F.when(f6 >= 1_000_000, f6 - 1_000_000).otherwise(f6)
    sign = F.when(d < 0, F.lit("-")).otherwise(F.lit(""))
    return F.concat(
        sign,
        hi2.cast("string"),
        F.lit("."),
        F.lpad(f6r.cast("string"), 6, "0"),
    )


def _duck_f6(expr: str) -> str:
    """Same 6dp rendering, DuckDB side — keep in lockstep with
    _spark_f6 (same op sequence, no FMA contraction in either
    engine's expression evaluator)."""
    a = f"abs({expr})"
    f6 = f"floor(({a} - floor({a})) * 1000000.0 + 0.5)"
    hi2 = (
        f"(floor({a})::BIGINT + CASE WHEN {f6} >= 1000000 THEN 1 ELSE 0 END)"
    )
    f6r = f"({f6} - CASE WHEN {f6} >= 1000000 THEN 1000000 ELSE 0 END)::BIGINT"
    return (
        f"(CASE WHEN {expr} < 0 THEN '-' ELSE '' END || {hi2}::VARCHAR "
        f"|| '.' || lpad({f6r}::VARCHAR, 6, '0'))"
    )


# ---------------------------------------------------------------------------
# Engine-side canonicalization. Both builders must produce the SAME
# string for the same logical value — that shared definition is the
# entire correctness of the mode.
# ---------------------------------------------------------------------------

def _spark_fmt(c, dt):
    """Canonical-string expression for one Spark column."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    if isinstance(dt, (T.DoubleType, T.FloatType, T.DecimalType)):
        d = c.cast("double")
        # NULL floats print 'nan' (pandas-path parity: toPandas turns
        # SQL NULL into NaN in float columns); DECIMAL goes through
        # double the way fetchdf/toPandas float-ify it
        return (
            F.when(c.isNull() | F.isnan(d), F.lit("nan"))
            .when(d == float("inf"), F.lit("inf"))
            .when(d == float("-inf"), F.lit("-inf"))
            .otherwise(_spark_f6(d))
        )
    if isinstance(dt, (T.TimestampType, T.TimestampNTZType)):
        frac = F.date_format(c, "SSSSSS")
        iso = F.when(
            frac == "000000", F.date_format(c, "yyyy-MM-dd'T'HH:mm:ss")
        ).otherwise(F.date_format(c, "yyyy-MM-dd'T'HH:mm:ss.SSSSSS"))
        return F.coalesce(iso, F.lit("None"))
    if isinstance(dt, T.DateType):
        return F.coalesce(c.cast("string"), F.lit("None"))
    if isinstance(dt, T.BooleanType):
        return F.when(c.isNull(), "None").when(c, "True").otherwise("False")
    if isinstance(
        dt, (T.ByteType, T.ShortType, T.IntegerType, T.LongType, T.StringType)
    ):
        return F.coalesce(c.cast("string"), F.lit("None"))
    if isinstance(dt, T.ArrayType):
        et = dt.elementType
        if isinstance(et, (T.DoubleType, T.FloatType)):
            elem = lambda x: (  # noqa: E731
                F.when(x.isNull() | F.isnan(x.cast("double")), F.lit("nan"))
                .when(x.cast("double") == float("inf"), F.lit("inf"))
                .when(x.cast("double") == float("-inf"), F.lit("-inf"))
                .otherwise(_spark_f6(x.cast("double")))
            )
        elif isinstance(
            et, (T.ByteType, T.ShortType, T.IntegerType, T.LongType, T.StringType)
        ):
            elem = lambda x: F.coalesce(x.cast("string"), F.lit("None"))  # noqa: E731
        else:
            raise UnsupportedType(f"array<{et.simpleString()}>")
        body = F.array_join(F.transform(c, elem), ",")
        return F.coalesce(
            F.concat(F.lit("["), body, F.lit("]")), F.lit("None")
        )
    raise UnsupportedType(dt.simpleString())


def _spark_digest(sdf) -> tuple[int, int, int, list[str]]:
    """(row_count, sum_a, sum_b, sorted_cols) computed inside Spark."""
    from pyspark.sql import functions as F

    cols = sorted(sdf.columns)
    fields = {f.name: f.dataType for f in sdf.schema.fields}
    line = F.concat_ws("|", *[_spark_fmt(F.col(n), fields[n]) for n in cols])
    md5 = F.md5(line)
    # DuckDB's md5_number_upper/lower parse each 8-byte half of the
    # digest LITTLE-endian; reverse the byte pairs so conv() yields the
    # identical unsigned 64-bit values (parity pinned by
    # tests/test_check_oracle_engine_mode.py)
    def _le(lo: int):
        return F.conv(
            F.concat(*[F.substring(md5, i, 2) for i in range(lo + 14, lo - 1, -2)]),
            16,
            10,
        ).cast("decimal(38,0)")

    a = _le(1)
    b = _le(17)
    row = (
        sdf.select(a.alias("a"), b.alias("b"))
        .agg(
            F.count("*").alias("n"),
            F.coalesce(F.sum("a"), F.lit(0)).cast("decimal(38,0)").alias("sa"),
            F.coalesce(F.sum("b"), F.lit(0)).cast("decimal(38,0)").alias("sb"),
        )
        .first()
    )
    return int(row["n"]), int(row["sa"]), int(row["sb"]), cols


def _duck_fmt(name: str, typ: str) -> str:
    """Canonical-string SQL for one DuckDB column (same definition as
    _spark_fmt — keep the two in lockstep)."""
    q = f'"{name}"'
    t = typ.upper()
    if t.endswith("[]"):
        et = t[:-2]
        if et in ("DOUBLE", "FLOAT", "REAL"):
            elem = (
                "CASE WHEN x IS NULL OR isnan(x::DOUBLE) THEN 'nan' "
                "WHEN x::DOUBLE = 'infinity'::DOUBLE THEN 'inf' "
                "WHEN x::DOUBLE = '-infinity'::DOUBLE THEN '-inf' "
                f"ELSE {_duck_f6('x::DOUBLE')} END"
            )
        elif et in ("TINYINT", "SMALLINT", "INTEGER", "BIGINT", "HUGEINT",
                    "UTINYINT", "USMALLINT", "UINTEGER", "UBIGINT", "VARCHAR"):
            elem = "COALESCE(x::VARCHAR, 'None')"
        else:
            raise UnsupportedType(typ)
        # array_to_string([]) is NULL in DuckDB, so the empty-list ''
        # must be restored BEFORE the brackets; only a NULL column
        # prints 'None'
        return (
            f"CASE WHEN {q} IS NULL THEN 'None' ELSE "
            f"'[' || COALESCE(array_to_string(list_transform({q}, "
            f"x -> {elem}), ','), '') || ']' END"
        )
    if t in ("DOUBLE", "FLOAT", "REAL") or t.startswith("DECIMAL"):
        return (
            f"CASE WHEN {q} IS NULL OR isnan({q}::DOUBLE) THEN 'nan' "
            f"WHEN {q}::DOUBLE = 'infinity'::DOUBLE THEN 'inf' "
            f"WHEN {q}::DOUBLE = '-infinity'::DOUBLE THEN '-inf' "
            f"ELSE {_duck_f6(f'{q}::DOUBLE')} END"
        )
    if t.startswith("TIMESTAMP"):
        return (
            f"COALESCE(CASE WHEN strftime({q}, '%f') = '000000' "
            f"THEN strftime({q}, '%Y-%m-%dT%H:%M:%S') "
            f"ELSE strftime({q}, '%Y-%m-%dT%H:%M:%S.%f') END, 'None')"
        )
    if t == "DATE":
        # fetchdf converts DATE to datetime64, so the pandas path
        # rendered dates as midnight timestamps ('...T00:00:00') and
        # matched Spark TIMESTAMP outputs; mirror that here (8 contract
        # queries return Spark TIMESTAMP vs DuckDB DATE day columns)
        return f"COALESCE(strftime({q}, '%Y-%m-%dT00:00:00'), 'None')"
    if t == "BOOLEAN":
        return (
            f"CASE WHEN {q} IS NULL THEN 'None' "
            f"WHEN {q} THEN 'True' ELSE 'False' END"
        )
    if t in ("TINYINT", "SMALLINT", "INTEGER", "BIGINT", "HUGEINT",
             "UTINYINT", "USMALLINT", "UINTEGER", "UBIGINT", "VARCHAR"):
        return f"COALESCE({q}::VARCHAR, 'None')"
    raise UnsupportedType(typ)


def _duck_digest(con, sql: str) -> tuple[int, int, int, list[str]]:
    """(row_count, sum_a, sum_b, sorted_cols) computed inside DuckDB."""
    desc = con.execute(f"DESCRIBE SELECT * FROM ({sql}) __t__").fetchall()
    types = {r[0]: r[1] for r in desc}
    cols = sorted(types)
    line = " || '|' || ".join(_duck_fmt(n, types[n]) for n in cols)
    row = con.execute(
        f"SELECT count(*), "
        f"COALESCE(sum(md5_number_upper(__l__)::HUGEINT), 0), "
        f"COALESCE(sum(md5_number_lower(__l__)::HUGEINT), 0) "
        f"FROM (SELECT {line} AS __l__ FROM ({sql}) __t__) __h__"
    ).fetchone()
    return int(row[0]), int(row[1]), int(row[2]), cols


def _scan_balanced(sql: str, i: int) -> int:
    """Index just past the ')' matching the '(' at sql[i], skipping
    single-quoted strings and -- comments."""
    assert sql[i] == "("
    depth = 0
    n = len(sql)
    while i < n:
        ch = sql[i]
        if ch == "'":
            i += 1
            while i < n:
                if sql[i] == "'":
                    if i + 1 < n and sql[i + 1] == "'":
                        i += 2
                        continue
                    break
                i += 1
        elif ch == "-" and i + 1 < n and sql[i + 1] == "-":
            while i < n and sql[i] != "\n":
                i += 1
        elif ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
            if depth == 0:
                return i + 1
        i += 1
    raise ValueError("unbalanced parens")


_CTE_HEAD = re.compile(
    r"\s*,?\s*([A-Za-z_][A-Za-z0-9_]*)\s*(\([^)]*\))?\s*AS\s+"
    r"((?:NOT\s+)?MATERIALIZED\s+)?\(",
    re.I,
)


def _skip_ws_comments(sql: str, i: int) -> int:
    """Index of the first char at/after i that is neither whitespace
    nor inside a ``--`` line comment. The inter-CTE gaps in the big
    oracles carry explanatory comments (e.g. doc_containment's), and
    treating them as 'not a WITH chain' silently sent exactly the
    heavy MATERIALIZED oracles the temp-table path exists for back to
    the monolithic statement (ADVICE r9)."""
    n = len(sql)
    while i < n:
        if sql[i] in " \t\r\n":
            i += 1
        elif sql[i] == "-" and i + 1 < n and sql[i + 1] == "-":
            while i < n and sql[i] != "\n":
                i += 1
        else:
            break
    return i


def _split_ctes(sql: str):
    """Mechanically split a single top-level ``WITH name AS [...] (...)
    , ... <final query>`` chain into ([(name, body)], final_query), or
    None when the statement isn't that shape (no WITH, WITH RECURSIVE,
    parse surprise). Comments and quoted strings are respected; the
    bodies are byte-identical slices of the input, so executing them
    as ``CREATE TEMP TABLE name AS body`` in order + the final query
    is semantically the CTE chain with every CTE materialized."""
    m = re.match(r"\s*(--[^\n]*\n\s*)*WITH\s+", sql, re.I)
    if not m or re.match(r"\s*(--[^\n]*\n\s*)*WITH\s+RECURSIVE\b", sql, re.I):
        return None
    i = m.end()
    ctes = []
    while True:
        h = _CTE_HEAD.match(sql, _skip_ws_comments(sql, i))
        if not h:
            return None
        if h.group(2):  # explicit column list — only the recursive
            return None  # oracles use it; keep those single-statement
        lpar = h.end() - 1
        try:
            end = _scan_balanced(sql, lpar)
        except ValueError:
            return None
        ctes.append((h.group(1), sql[lpar + 1 : end - 1]))
        j = _skip_ws_comments(sql, end)
        if j < len(sql) and sql[j] == ",":
            i = j + 1
            continue
        return ctes, sql[j:]


def _duck_digest_script(con, sql: str):
    """Run a big materialized-CTE oracle as CREATE TEMP TABLE steps +
    the final SELECT, then _duck_digest on the (now tiny) final query.
    DuckDB 1.0 executes a monolithic many-CTE statement with all CTE
    buffers and join states coexisting and no stats on CTE scans — at
    sf10 the pagerank chain spilled >60 GB and filled the disk, while
    the SAME stages as temp tables total <10 GB and run ~15x faster
    (stats restore the correct hash-join build sides). Returns the
    digest tuple, or None if the statement isn't a plain WITH chain.
    Temp tables are dropped (reverse order) even on failure so they
    never shadow the base views for later queries."""
    parsed = _split_ctes(sql)
    if not parsed:
        return None
    ctes, final = parsed
    made = []
    try:
        for name, body in ctes:
            con.execute(f'CREATE TEMP TABLE "{name}" AS {body}')
            made.append(name)
        return _duck_digest(con, final)
    finally:
        for name in reversed(made):
            con.execute(f'DROP TABLE IF EXISTS "{name}"')


# engine-mode threshold: any statement the author marked with AS
# MATERIALIZED takes the temp-table path when parseable — materialized
# CTE scans carry no stats in DuckDB 1.0, so monolithic chains pick
# wrong hash-join build sides (sf10 pagerank spilled >60 GB; the sf3
# fuzzy twin ran at 1.8 threads for 25+ min vs ~60 s as temp tables).
# Plain-CTE-only oracles (which may rely on inlining/pushdown) keep
# the single-statement path.
_SCRIPT_CTE_MIN = 1


def _lint_oracle(name: str, sql: str) -> None:
    """Unrolled-CTE lint: DuckDB re-inlines a plain (un-MATERIALIZED)
    CTE at every reference, so an iterative oracle unrolled over many
    rounds does exponential work — measured as a 100 GiB OOM on the
    sf0.3 Lloyd chain until `AS MATERIALIZED` pinned each round
    (BASELINE.md, round 7). Flag oracles with deep CTE chains that
    never materialize."""
    n_cte = len(re.findall(r"\bAS\s*\(", sql, flags=re.I))
    if n_cte >= 12 and not re.search(r"\bAS\s+MATERIALIZED\b", sql, flags=re.I):
        print(
            f"  LINT {name}: {n_cte} CTEs, none MATERIALIZED — an "
            f"iterative/unrolled oracle without AS MATERIALIZED is "
            f"re-inlined per reference by DuckDB (exponential work at "
            f"higher sf)"
        )


def main() -> int:
    argv = [a for a in sys.argv[1:]]
    engine = "--engine" in argv
    if engine:
        argv.remove("--engine")
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    only = set(argv[1:])

    import __spark_entry__ as entry_mod
    from hippollm_spark.session import get_spark

    spark = get_spark("oracle_check")
    con = duckdb.connect()
    # big-sf engine runs share the box with a live JVM: cap DuckDB
    # below the free-RAM line and give it a spill directory so a
    # >memory oracle (sf10 pagerank's 240M-row edge table) degrades to
    # disk instead of an OOM kill. No effect on small-sf runs.
    tmp = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "spark-warehouse",
        "_duckdb_spill",
    )
    os.makedirs(tmp, exist_ok=True)
    con.execute(f"SET temp_directory='{tmp}'")
    con.execute(
        f"SET memory_limit='{os.environ.get('ORACLE_DUCKDB_MEM', '48GB')}'"
    )
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet"
            + ("/*.parquet" if os.path.isdir(f"{sf_dir}/{t}.parquet") else "")
            + "'"
        )

    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        if name in oracles:
            _lint_oracle(name, oracles[name])
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            if engine and name in oracles:
                s_n, s_a, s_b, s_cols = _spark_digest(sdf)
            elif engine:
                # rows-only query in engine mode: count() instead of
                # collecting the full result — a large no-oracle query
                # at sf1+ would otherwise hit the very
                # driver.maxResultSize / driver-OOM wall engine mode
                # exists to avoid (ADVICE r8)
                s_n = sdf.count()
            else:
                spdf = sdf.toPandas()
        except UnsupportedType as e:
            print(f"~ {name}: engine-hash unsupported type {e} — "
                  f"falling back to pandas canon")
            try:
                spdf = fn(spark, sf_dir).toPandas()
            except Exception as e2:
                print(f"✗ {name}: SPARK ERROR {type(e2).__name__}: {e2}")
                failures.append(name)
                continue
            engine_this = False
        except Exception as e:
            print(f"✗ {name}: SPARK ERROR {type(e).__name__}: {e}")
            failures.append(name)
            continue
        else:
            engine_this = engine and name in oracles
        t_spark = time.time() - t0
        if name not in oracles:
            n = s_n if engine else len(spdf)
            print(f"~ {name}: rows-only ({n} rows, {t_spark:.1f}s) — no oracle")
            continue
        try:
            if engine_this:
                osql = oracles[name]
                digest = None
                if len(re.findall(r"\bAS\s+MATERIALIZED\b", osql, re.I)) >= _SCRIPT_CTE_MIN:
                    digest = _duck_digest_script(con, osql)
                    if digest is None:
                        # visible, not silent: a MATERIALIZED oracle
                        # that _split_ctes can't parse runs monolithic
                        # — exactly the statements the temp-table path
                        # exists for (ADVICE r9)
                        print(
                            f"  NOTE {name}: MATERIALIZED oracle fell "
                            f"back to the monolithic single-statement "
                            f"path (_split_ctes returned None)"
                        )
                o_n, o_a, o_b, o_cols = digest or _duck_digest(con, osql)
            else:
                odf = con.execute(oracles[name]).fetchdf()
        except UnsupportedType as e:
            print(f"~ {name}: engine-hash unsupported oracle type {e} — "
                  f"falling back to pandas canon")
            spdf = fn(spark, sf_dir).toPandas()
            odf = con.execute(oracles[name]).fetchdf()
            engine_this = False
        except Exception as e:
            print(f"✗ {name}: DUCKDB ERROR {type(e).__name__}: {e}")
            failures.append(name)
            continue
        if engine_this:
            ok = (s_n == o_n) and (s_a == o_a) and (s_b == o_b) and (
                s_cols == o_cols
            )
            status = "✓" if ok else "✗"
            print(
                f"{status} {name}: spark {s_n} rows / oracle {o_n} rows, "
                f"engine-digest "
                f"{'match' if (s_a, s_b) == (o_a, o_b) else 'MISMATCH'}, "
                f"{t_spark:.1f}s"
            )
            if not ok:
                failures.append(name)
                if s_cols != o_cols:
                    print(f"   cols spark={s_cols} oracle={o_cols}")
            continue
        sh, sn, sc = canon(spdf)
        oh, on_, oc = canon(odf)
        ok = (sh == oh) and (sn == on_) and (sc == oc)
        status = "✓" if ok else "✗"
        print(f"{status} {name}: spark {sn} rows / oracle {on_} rows, hash "
              f"{'match' if sh == oh else f'{sh} != {oh}'}, {t_spark:.1f}s")
        if not ok:
            failures.append(name)
            if sc != oc:
                print(f"   cols spark={sc} oracle={oc}")
            if sn and on_ and sh != oh:
                print("   spark head:", spdf.sort_values(sorted(spdf.columns)[0]).head(3).to_dict("records"))
                print("   oracle head:", odf.sort_values(sorted(odf.columns)[0]).head(3).to_dict("records"))
    print(f"\n{'FAIL: ' + ', '.join(failures) if failures else 'ALL MATCH'}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
