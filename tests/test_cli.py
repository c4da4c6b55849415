"""CLI entry points (reference annotate/retrieval CLIs) driven through
main(argv)."""

from __future__ import annotations

import json

import pytest

import hippollm_spark.__main__ as cli


@pytest.fixture(autouse=True)
def small_dim(monkeypatch):
    monkeypatch.setattr(cli, "EMBED_DIM", 16)


def test_cli_annotate_retrieve_export(spark, tmp_path, capsys):
    doc = tmp_path / "doc.txt"
    doc.write_text("Spark is an engine. Paris is a city.")
    db = str(tmp_path / "db")

    assert cli.main(["annotate-text", str(doc), db]) == 0
    out = capsys.readouterr().out
    assert "annotated: 2 facts" in out

    assert cli.main(["retrieve", db, "engine", "-k", "1"]) == 0
    out = capsys.readouterr().out
    assert out.startswith("- ")

    exp = str(tmp_path / "exp")
    assert cli.main(["export-json", db, exp]) == 0
    facts = json.load(open(f"{exp}/facts.json"))
    assert {f["text"] for f in facts} == {"Spark is an engine", "Paris is a city"}
    assert all(f["sources"][0]["name"] == "doc.txt" for f in facts)

    # re-import the export and check integrity
    db2 = str(tmp_path / "db2")
    assert cli.main(["import-json", exp, db2]) == 0
    assert cli.main(["integrity", db2]) == 0
    assert "'ok': 1" in capsys.readouterr().out.splitlines()[-1]


def test_cli_annotate_is_incremental(spark, tmp_path, capsys):
    d1 = tmp_path / "a.txt"
    d1.write_text("Alpha builds rockets.")
    d2 = tmp_path / "b.txt"
    d2.write_text("Beta builds engines.")
    db = str(tmp_path / "db")
    cli.main(["annotate-text", str(d1), db])
    cli.main(["annotate-text", str(d2), db])
    out = capsys.readouterr().out
    assert "annotated: 2 facts" in out  # second run appended to the saved store


def test_cli_curate(tmp_path, capsys):
    from hippollm_spark.__main__ import main

    out = str(tmp_path / "curated")
    rc = main(["curate", "/root/testdata/sf0.001/documents.parquet", out])
    assert rc == 0
    printed = capsys.readouterr().out
    assert "lang" in printed and "n_docs" in printed
