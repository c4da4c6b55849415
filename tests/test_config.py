"""Config merge precedence (reference S7) and the integrity-restore
write path (P8 analog)."""

from __future__ import annotations

from hippollm_spark.config import dump_config, load_config_file, merge_config
from hippollm_spark.pipelines.annotate import AnnotateConfig


def test_merge_precedence():
    cfg = {"chunk_size": 500, "splitter": "naive", "k_dedup": 7}
    out = merge_config(AnnotateConfig, cfg, chunk_size=250)
    assert out.chunk_size == 250      # kwarg beats cfg
    assert out.splitter == "naive"    # cfg beats default
    assert out.k_dedup == 7
    assert out.k_link == 10           # default survives


def test_annotator_section_unwrap():
    cfg = {"annotator": {"chunk_size": 123}, "unknown_key": True}
    out = merge_config(AnnotateConfig, cfg)
    assert out.chunk_size == 123


def test_none_kwargs_ignored():
    out = merge_config(AnnotateConfig, {"chunk_size": 9}, chunk_size=None)
    assert out.chunk_size == 9


def test_config_file_roundtrip(tmp_path):
    p = tmp_path / "parameters.yaml"
    p.write_text("chunk_size: 321\nsplitter: paragraph\nctx_size: 100\n")
    cfg = merge_config(AnnotateConfig, load_config_file(str(p)))
    assert cfg.chunk_size == 321 and cfg.splitter == "paragraph"
    dumped = dump_config(cfg)
    assert dumped["ctx_size"] == 100


def test_restore_integrity(spark, tmp_path):
    import json

    from hippollm_spark.store import HippoStore
    from hippollm_spark.testing import hash_embedding_udf

    d = tmp_path / "db"
    d.mkdir()
    (d / "entities.json").write_text(
        json.dumps({"X": {"name": "X", "description": "d", "facts": [0]}})
    )
    (d / "facts.json").write_text(
        json.dumps([{"text": "t", "entities": ["X"], "sources": [], "confidence": 1.0, "id": 0}])
    )
    # import WITHOUT embeddings → integrity broken → restore fixes it
    store = HippoStore.import_reference_json(spark, str(d))
    store.embed = hash_embedding_udf(16)
    assert store.check_integrity()["ok"] == 0
    store.restore_integrity()
    assert store.check_integrity()["ok"] == 1
