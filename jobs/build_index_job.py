"""spark-submit entry: build (or resume) the inverted index over a source
table and optionally run the query set against it.

Cluster launch (the north-rule deployment shape):

    python tools/make_pyfiles_zip.py
    spark-submit \
        --py-files dist/flagembedding_spark.zip \
        --conf spark.sql.adaptive.enabled=true \
        --conf spark.sql.shuffle.partitions=2048 \
        jobs/build_index_job.py \
        --input iceberg_catalog.db.source_code \
        --input-format iceberg \
        --output s3://bucket/bm25-index \
        --k1 1.2 --b 0.75 --chunks 4096 --resume

Local smoke:

    python jobs/build_index_job.py --synth-docs 5000 --output /tmp/idx \
        --chunks 4 --queries-inline "spark hash join"
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

# local runs launch this by path (python jobs/build_index_job.py); on a
# cluster --py-files provides the package instead and this is a no-op
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", help="source table/path (columns: repo, path, commit, lang, content)")
    ap.add_argument("--input-format", default="parquet", choices=["parquet", "iceberg", "json"])
    ap.add_argument("--synth-docs", type=int, default=0, help="use the synthetic corpus instead of --input")
    ap.add_argument("--output", required=True)
    ap.add_argument("--k1", type=float, default=1.2)
    ap.add_argument("--b", type=float, default=0.75)
    ap.add_argument("--chunks", type=int, default=64)
    ap.add_argument("--resume", action="store_true", default=True,
                    help="skip chunks already recorded done in lineage (default)")
    ap.add_argument("--no-resume", dest="resume", action="store_false")
    ap.add_argument("--build-segments", action="store_true",
                    help="also build + merge the compressed segment index")
    ap.add_argument("--store-positions", action="store_true",
                    help="varint-encode term positions into segment blocks "
                         "(enables phrase/proximity queries from the store)")
    ap.add_argument("--segment-layout", default="term", choices=["term", "doc", "both"],
                    help="term = bucketed-by-term (point lookups / serving.py); "
                         "doc = docid-partitioned (head-query batches); both")
    ap.add_argument("--queries-inline", nargs="*", default=[],
                    help="ad-hoc queries to run after the build")
    ap.add_argument("--top-k", type=int, default=10)
    args = ap.parse_args()

    from flagembedding_spark.config import BM25Config
    from flagembedding_spark.plans.lineage import build_resumable, finalize_resumable
    from flagembedding_spark.session import get_spark

    spark = get_spark("fes-build-index")
    cfg = BM25Config(k1=args.k1, b=args.b)

    if args.synth_docs:
        from flagembedding_spark.schemas import distributed_synth_corpus

        corpus = distributed_synth_corpus(spark, args.synth_docs)
    elif args.input_format == "iceberg":
        corpus = spark.read.format("iceberg").load(args.input)
    elif args.input_format == "json":
        corpus = spark.read.json(args.input)
    else:
        corpus = spark.read.parquet(args.input)

    t0 = time.perf_counter()
    if not args.resume:
        import shutil

        shutil.rmtree(args.output, ignore_errors=True)
    chunk_results = build_resumable(
        corpus, args.output, cfg, n_chunks=args.chunks,
        wave_size=max(1, args.chunks // 8),
    )
    index = finalize_resumable(spark, args.output, cfg)
    build_sec = time.perf_counter() - t0

    report = {
        "n_docs": index.stats.n_docs,
        "avgdl": index.stats.avgdl,
        "build_sec": round(build_sec, 2),
        "files_per_sec": round(index.stats.n_docs / build_sec, 1) if build_sec else None,
        "chunks_built": sum(1 for c in chunk_results if not c.skipped),
        "chunks_skipped": sum(1 for c in chunk_results if c.skipped),
    }

    if args.build_segments:
        from flagembedding_spark.operators.segments import (
            build_doc_partitioned_segments,
            build_segments,
            merge_segments,
            save_segments,
        )

        seg_index = index
        if args.store_positions:
            # positions come from a second tokenize pass keyed back to the
            # index's docids through docid_str — identical postings, plus
            # the per-posting position lists the block writer encodes
            import dataclasses

            from flagembedding_spark.operators.index_build import docid_expr
            from flagembedding_spark.operators.positions import (
                positional_postings_full,
            )

            if cfg.stop_tokens:
                raise SystemExit(
                    "--store-positions requires an unfiltered index "
                    "(stop_tokens change postings vs positions)"
                )
            keyed = corpus.withColumn("docid_str", docid_expr()).join(
                index.doc_stats.select("docid", "docid_str"), "docid_str"
            )
            pos = positional_postings_full(
                keyed, text_col="content", id_col="docid"
            )
            seg_index = dataclasses.replace(index, postings=pos)

        if args.segment_layout in ("term", "both"):
            t1 = time.perf_counter()
            seg = merge_segments(
                build_segments(
                    seg_index, store_positions=args.store_positions
                )
            )
            save_segments(seg, f"{args.output}/segments")
            report["segments_sec"] = round(time.perf_counter() - t1, 2)
        if args.segment_layout in ("doc", "both"):
            t1 = time.perf_counter()
            dseg = build_doc_partitioned_segments(
                seg_index, store_positions=args.store_positions
            )
            save_segments(dseg, f"{args.output}/segments_doc")
            report["segments_doc_sec"] = round(time.perf_counter() - t1, 2)

    if args.queries_inline:
        from flagembedding_spark.operators.query import bm25_topk

        qdf = spark.createDataFrame(
            [(f"q{i}", q) for i, q in enumerate(args.queries_inline)],
            ["query_id", "query"],
        )
        t2 = time.perf_counter()
        res = bm25_topk(index, qdf, k=args.top_k).collect()
        report["query_sec"] = round(time.perf_counter() - t2, 3)
        report["result_rows"] = len(res)

    print(json.dumps(report))
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
