"""Source loaders: text files, pageviews scan+agg (S5 oracle against
hand-computed sums), batched enrichment plumbing."""

from __future__ import annotations

import pytest

from hippollm_spark.sources import loaders

PAGEVIEWS = """en Paris 100 0
en London 30 0
fr Paris 999 0
en Paris 50 0
de Berlin 7 0
en Spark_(software) 12 0
notaline
en BadCount xx 0
"""


@pytest.fixture(scope="module")
def pv_file(tmp_path_factory):
    p = tmp_path_factory.mktemp("pv") / "pageviews-20240101"
    p.write_text(PAGEVIEWS)
    return str(p)


def test_parse_pageviews(spark, pv_file):
    got = {r["title"]: r["views"] for r in loaders.parse_pageviews(spark, pv_file).collect()}
    assert got == {"Paris": 150, "London": 30, "Spark_(software)": 12}


def test_load_text(spark, tmp_path):
    f = tmp_path / "doc.txt"
    f.write_text("hello\nworld")
    df = loaders.load_text(spark, str(f))
    row = df.first()
    assert row["content"] == "hello\nworld" and row["title"] == "doc.txt"


def test_load_wikipedia_with_injected_fetcher(spark):
    df = loaders.load_wikipedia(
        spark, "Paris", fetcher=lambda q: (q, f"http://wiki/{q}", "Paris is big. " * 10)
    )
    row = df.first()
    assert row["title"] == "Paris" and row["content"].startswith("Paris is big.")


def test_load_wikipedia_default_fetcher_fails_cleanly_offline(spark):
    """The default is now the REAL MediaWiki fetcher; with no network
    it must fail with a connection error, not hang (stub-server tests
    cover the online path — test_wikipedia_http.py)."""
    import requests

    fetcher = loaders.wikipedia_page_fetcher(
        "http://127.0.0.1:1/w/api.php", timeout=0.5
    )
    with pytest.raises(requests.RequestException):
        loaders.load_wikipedia(spark, "Paris", fetcher=fetcher)


def test_enrich_descriptions_batches(spark):
    def fetch(chunk):
        # runs on executors: report the observed batch size through the
        # result so the driver can assert the batching contract
        return {t: f"desc of {t} (batch {len(chunk)})" for t in chunk if t != "Missing"}

    titles = spark.createDataFrame(
        [(f"T{i}",) for i in range(7)] + [("Missing",)], "title string"
    ).coalesce(1)
    out = loaders.enrich_descriptions(titles, fetch, batch_size=3)
    rows = {r["title"]: r["description"] for r in out.collect()}
    assert rows["T0"].startswith("desc of T0")
    assert rows["Missing"] is None
    batch_sizes = {
        int(v.rsplit("batch ", 1)[1].rstrip(")")) for v in rows.values() if v
    }
    assert max(batch_sizes) <= 3 and len(rows) == 8


def test_bootstrap_entities(spark, pv_file):
    from hippollm_spark.store import HippoStore
    from hippollm_spark.testing import hash_embedding_udf

    store = HippoStore(spark, embed=hash_embedding_udf(16), dim=16)
    pv = loaders.parse_pageviews(spark, pv_file)
    loaders.bootstrap_entities(
        store, pv, lambda chunk: {t: f"wiki page {t}" for t in chunk}, min_views=50
    )
    names = sorted(r["name"] for r in store.entities.collect())
    assert names == ["Paris"]
    assert store.entities.first()["description"] == "wiki page Paris"
    assert store.entities.first()["embedding"] is not None


def test_action_log(spark):
    from hippollm_spark.lineage import ActionLog

    log = ActionLog()
    log.log("llm_invoke", prompt_kind="annotation", n=3)
    log.log("add_facts", count=2)
    df = log.to_df(spark)
    assert df.count() == 2
    acts = [r["action"] for r in df.orderBy("ts").collect()]
    assert acts == ["llm_invoke", "add_facts"]


def test_read_docs_jsonl_quarantine(spark, tmp_path):
    from hippollm_spark.sources.loaders import read_docs_jsonl

    p = tmp_path / "docs.jsonl"
    p.write_text(
        '{"doc_id": 1, "title": "a", "url": "u", "content": "x"}\n'
        "THIS IS NOT JSON\n"
        '{"doc_id": 2, "title": "b", "url": "u2", "content": "y"}\n'
    )
    good, bad = read_docs_jsonl(spark, str(p))
    assert {r["doc_id"] for r in good.collect()} == {1, 2}
    assert good.columns == ["doc_id", "title", "url", "content"]
    brows = bad.collect()
    assert len(brows) == 1 and "NOT JSON" in brows[0]["_corrupt_record"]


def test_read_docs_csv_quarantines_malformed(spark, tmp_path):
    from hippollm_spark.sources.loaders import read_docs_csv

    p = tmp_path / "docs.csv"
    p.write_text(
        "doc_id,title,url,content\n"
        "1,alpha,http://a,hello world\n"
        "not_a_number,beta,http://b,bad id row\n"
        "2,gamma,http://c,fine again\n"
    )
    good, bad = read_docs_csv(spark, str(p))
    ids = sorted(r["doc_id"] for r in good.collect())
    assert ids == [1, 2]
    bad_rows = bad.collect()
    assert len(bad_rows) == 1 and "not_a_number" in bad_rows[0][0]
