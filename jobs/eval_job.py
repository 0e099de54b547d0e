"""spark-submit entry: batch retrieval + evaluation over a persisted
segment store — the engine's twin of the reference's evaluation scripts
(search → save TREC run → pytrec_eval-style metrics; abc/evaluation/
searcher.py + utils.py:95-147, C_MTEB/MLDR step2-eval shape).

    spark-submit --py-files dist/flagembedding_spark.zip jobs/eval_job.py \
        --index /path/from/build_index_job/segments \
        --queries queries.jsonl --qrels qrels.jsonl \
        --run-out run.trec --k 100 --metrics-k 1 3 5 10

Local smoke (synthetic end to end):

    python jobs/eval_job.py --smoke --run-out /tmp/run.trec
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--index", help="segment store root (save_segments output)")
    ap.add_argument("--queries", help="JSONL queries (id, text)")
    ap.add_argument("--qrels", help="JSONL qrels (qid, docid, relevance)")
    ap.add_argument("--run-out", required=True, help="TREC run output path")
    ap.add_argument("--k", type=int, default=100, help="retrieval depth")
    ap.add_argument("--metrics-k", type=int, nargs="*", default=[1, 3, 5, 10])
    ap.add_argument("--mode", default="auto",
                    choices=["auto", "pruned", "exact", "daat"])
    ap.add_argument("--two-phase", action="store_true",
                    help="plan-level shuffle prune (identical top-k)")
    ap.add_argument("--tag", default="flagembedding_spark")
    ap.add_argument("--smoke", action="store_true",
                    help="synthetic corpus/queries/qrels end-to-end")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from flagembedding_spark.operators.metrics import ir_metrics
    from flagembedding_spark.operators.wand import wand_topk
    from flagembedding_spark.session import get_spark
    from flagembedding_spark.sources.trec import write_trec_run

    spark = get_spark("fes-eval")
    t0 = time.perf_counter()

    if args.smoke:
        from flagembedding_spark.config import BM25Config
        from flagembedding_spark.operators.index_build import build_index
        from flagembedding_spark.operators.segments import (
            build_segments,
            merge_segments,
        )
        from flagembedding_spark.schemas import synth_corpus, synth_queries

        idx = build_index(synth_corpus(spark, 500), BM25Config())
        seg = merge_segments(build_segments(idx))
        queries = synth_queries(spark, 20)
        # pseudo-qrels: the exact top-3 of every query is 'relevant'
        qrels = (
            wand_topk(seg, queries, k=3, use_wand="exact")
            .select("qid", "docid", F.lit(1).alias("relevance"))
        )
    else:
        if not (args.index and args.queries and args.qrels):
            ap.error("--index/--queries/--qrels required without --smoke")
        from flagembedding_spark.operators.segments import load_segments
        from flagembedding_spark.sources.trec import (
            read_jsonl_qrels,
            read_jsonl_queries,
        )

        seg = load_segments(spark, args.index)
        queries = read_jsonl_queries(spark, args.queries)
        qrels = read_jsonl_qrels(spark, args.qrels)

    run = wand_topk(
        seg, queries, k=args.k, use_wand=args.mode, two_phase=args.two_phase
    ).cache()
    n_rows = run.count()
    retrieve_sec = time.perf_counter() - t0

    write_trec_run(run, args.run_out, tag=args.tag)

    t1 = time.perf_counter()
    m = ir_metrics(
        run.select("qid", "docid", "score"), qrels, k_values=args.metrics_k
    )
    metrics = {
        f"{r['metric']}@{r['k']}": r["value"] for r in m.collect()
    }
    report = {
        "n_queries": queries.count(),
        "run_rows": n_rows,
        "retrieve_sec": round(retrieve_sec, 2),
        "metrics_sec": round(time.perf_counter() - t1, 2),
        "metrics": metrics,
        "run_path": args.run_out,
    }
    print(json.dumps(report))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
