"""CLI mirroring the reference's entry points (annotate_wikipedia.py,
retrieval.py) on the Spark engine:

    python -m hippollm_spark annotate-text <file> <db_dir> [--splitter S] [--chunk-size N]
    python -m hippollm_spark annotate-wikipedia <query> <db_dir>   (needs network)
    python -m hippollm_spark retrieve <db_dir> <query> [-k K] [--entities A,B [--mode union|intersection]]
    python -m hippollm_spark import-json <ref_db_dir> <db_dir>
    python -m hippollm_spark export-json <db_dir> <out_dir>
    python -m hippollm_spark integrity <db_dir>
    python -m hippollm_spark curate <docs.parquet|.jsonl> <out_dir> [--near-dup minhash]

Model backends default to the deterministic fakes (no model runtimes in
this environment); real deployments plug in `pipelines.backends`
implementations. The store lives as parquet at <db_dir>.
"""

from __future__ import annotations

import argparse
import os
import sys

from hippollm_spark.config import load_config_file, merge_config
from hippollm_spark.pipelines.annotate import AnnotateConfig, annotate_documents
from hippollm_spark.pipelines.backends import ExtractiveFakeLLM, ScriptedNLI
from hippollm_spark.pipelines.retrieve import itemized_context, retrieve
from hippollm_spark.session import get_spark
from hippollm_spark.store import HippoStore
from hippollm_spark.testing import hash_embedding, hash_embedding_udf

EMBED_DIM = int(os.environ.get("HIPPO_SPARK_DIM", "384"))


def _open_store(spark, db_dir: str) -> HippoStore:
    if os.path.exists(os.path.join(db_dir, "entities.parquet")):
        store = HippoStore.load(spark, db_dir)
    else:
        store = HippoStore(spark)
    store.embed = hash_embedding_udf(EMBED_DIM)
    store.dim = EMBED_DIM
    return store


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="hippollm_spark")
    sub = p.add_subparsers(dest="cmd", required=True)

    a = sub.add_parser("annotate-text")
    a.add_argument("file")
    a.add_argument("db_dir")
    a.add_argument("--splitter", default=None)
    a.add_argument("--chunk-size", type=int, default=None)
    a.add_argument("--cfg", default=None, help="parameters.yaml-style file")

    w = sub.add_parser("annotate-wikipedia")
    w.add_argument("query")
    w.add_argument("db_dir")

    r = sub.add_parser("retrieve")
    r.add_argument("db_dir")
    r.add_argument("query")
    r.add_argument("-k", type=int, default=10)
    r.add_argument("--entities", default=None)
    r.add_argument("--mode", default="union", choices=["union", "intersection"])

    ij = sub.add_parser("import-json")
    ij.add_argument("ref_db_dir")
    ij.add_argument("db_dir")

    ej = sub.add_parser("export-json")
    ej.add_argument("db_dir")
    ej.add_argument("out_dir")

    ic = sub.add_parser("integrity")
    ic.add_argument("db_dir")

    cu = sub.add_parser("curate")
    cu.add_argument("docs_path", help="parquet (or .jsonl) documents table")
    cu.add_argument("out_dir", help="directory for the curation summary")
    cu.add_argument("--near-dup", default="jaccard",
                    choices=["jaccard", "minhash"])
    cu.add_argument("--min-quality-e8", type=int, default=55_000_000)
    cu.add_argument("--max-shingle-df", type=int, default=None)
    cu.add_argument("--ctx", type=int, default=2048)

    args = p.parse_args(argv)
    spark = get_spark("hippollm_spark_cli")

    if args.cmd == "annotate-text":
        from hippollm_spark.sources.loaders import load_text

        store = _open_store(spark, args.db_dir)
        docs = load_text(spark, args.file)
        cfg = merge_config(
            AnnotateConfig,
            load_config_file(args.cfg) if args.cfg else {},
            splitter=args.splitter,
            chunk_size=args.chunk_size,
        )
        annotate_documents(
            store, docs, ExtractiveFakeLLM(), ScriptedNLI(), store.embed, cfg
        )
        store.save(args.db_dir)
        rep = store.check_integrity()
        print(f"annotated: {rep['facts']} facts / {rep['entities']} entities")
    elif args.cmd == "annotate-wikipedia":
        from hippollm_spark.sources.loaders import load_wikipedia

        store = _open_store(spark, args.db_dir)
        docs = load_wikipedia(spark, args.query)  # raises without network/fetcher
        annotate_documents(
            store, docs, ExtractiveFakeLLM(), ScriptedNLI(), store.embed, AnnotateConfig()
        )
        store.save(args.db_dir)
    elif args.cmd == "retrieve":
        store = _open_store(spark, args.db_dir)
        qv = hash_embedding(args.query, EMBED_DIM)
        ents = args.entities.split(",") if args.entities else None
        facts = retrieve(store, qv, k=args.k, entities=ents, mode=args.mode)
        print(itemized_context(facts))
    elif args.cmd == "import-json":
        store = HippoStore.import_reference_json(
            spark, args.ref_db_dir, embed=hash_embedding_udf(EMBED_DIM), dim=EMBED_DIM
        )
        store.save(args.db_dir)
        print(f"imported {store.entities.count()} entities / {store.facts.count()} facts")
    elif args.cmd == "export-json":
        store = _open_store(spark, args.db_dir)
        store.export_reference_json(args.out_dir)
        print(f"exported to {args.out_dir}")
    elif args.cmd == "integrity":
        store = _open_store(spark, args.db_dir)
        print(store.check_integrity())
    elif args.cmd == "curate":
        from hippollm_spark.pipelines.curate import curate_corpus

        if args.docs_path.endswith(".jsonl"):
            from hippollm_spark.sources.loaders import read_docs_jsonl

            docs, bad = read_docs_jsonl(
                spark, args.docs_path,
                schema="doc_id long, text string, lang string, source string",
            )
            n_bad = bad.count()
            if n_bad:
                print(f"quarantined {n_bad} malformed lines")
        else:
            docs = spark.read.parquet(args.docs_path)
        summary = curate_corpus(
            docs,
            min_quality_e8=args.min_quality_e8,
            near_dup_method=args.near_dup,
            max_shingle_df=args.max_shingle_df,
            ctx=args.ctx,
        )
        summary.write.mode("overwrite").parquet(args.out_dir)
        for r in spark.read.parquet(args.out_dir).orderBy("lang").collect():
            print(dict(r.asDict()))
    return 0


if __name__ == "__main__":
    sys.exit(main())
