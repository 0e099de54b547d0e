"""Supplementary benchmarks (guide §1.4): noop-sink isolation of the corpus
pass, so each stage of the build is timed without the next stage's cost.
NOT part of the frozen driver bench (bench.py); numbers are cited in
OPTIMIZATION_r06.md.

Phases isolated:
  gen_noop       distributed synth corpus generation only (JVM expressions)
  slim_noop      generation + the slim (docid_str, content) projection
  stream_noop    + mapInArrow tokenize-and-count (Python boundary + kernel)
  corpus_pass    + parquet write (the timed phase of the scaling legs)
  finalize       dictionary/stats derivation from the persisted stream

Usage: python bench_extra.py [n_docs] [reps]
Env: SPARK_GRAFT_CPUS (default 32), FES_EXTRA_DOCS overrides argv.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from flagembedding_spark.config import BM25Config  # noqa: E402
from flagembedding_spark.entries import K1, B  # noqa: E402
from flagembedding_spark.schemas import distributed_synth_corpus  # noqa: E402
from flagembedding_spark.session import get_spark  # noqa: E402


def noop(df) -> float:
    t = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t


def sweep_entries() -> None:
    """Time every declared queries() entry at sf0.1 with the noop sink
    (guide §1.4) — the operator-coverage checklist for OPTIMIZATION_r06.md.
    First call per entry is cold (includes its build/memo); second is warm
    (query path only). Usage: python bench_extra.py sweep [sf_dir]"""
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("fes-entry-sweep", master=f"local[{cpus}]",
                      shuffle_partitions=cpus)
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    out = {}
    for name, fn in qs.items():
        spark.sparkContext.setJobDescription(f"sweep:{name}")
        try:
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            cold = time.perf_counter() - t0
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            warm = time.perf_counter() - t0
            out[name] = {"cold": round(cold, 3), "warm": round(warm, 3)}
        except Exception as exc:  # noqa: BLE001 — record and continue
            out[name] = {"error": str(exc)[:200]}
        spark.sparkContext.setJobDescription(None)
    spark.stop()
    print(json.dumps({"sf_dir": sf_dir, "entries": out}))


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "sweep":
        sweep_entries()
        return
    n_docs = int(os.environ.get("FES_EXTRA_DOCS",
                                sys.argv[1] if len(sys.argv) > 1 else "200000"))
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    parts = max(cpus * 2, 16)
    spark = get_spark("fes-bench-extra", master=f"local[{cpus}]",
                      shuffle_partitions=cpus)
    sc = spark.sparkContext

    from flagembedding_spark.operators.arrow_postings import (
        tokenize_count_stream,
    )
    from flagembedding_spark.sources.index_store import build_and_save_index

    cfg = BM25Config(k1=K1, b=B)
    out: dict[str, list[float]] = {}

    def rec(name: str, fn) -> None:
        sc.setJobDescription(name)
        out.setdefault(name, []).append(fn())
        sc.setJobDescription(None)

    # warmup (JIT + python workers)
    corpus = distributed_synth_corpus(spark, max(n_docs // 8, 1000), parts)
    noop(tokenize_count_stream(corpus, cfg))

    for _ in range(reps):
        corpus = distributed_synth_corpus(spark, n_docs, parts)
        rec("gen_noop", lambda: noop(corpus))
        from pyspark.sql import functions as F

        from flagembedding_spark.operators.index_build import docid_expr

        slim = corpus.select(
            docid_expr().alias("docid_str"), F.col("content")
        )
        rec("slim_noop", lambda: noop(slim))
        rec("stream_noop",
            lambda: noop(tokenize_count_stream(corpus, cfg)))
        root = tempfile.mkdtemp(
            prefix="fes_extra_",
            dir="/dev/shm" if os.path.isdir("/dev/shm") else None,
        )
        try:
            phase: dict = {}
            t0 = time.perf_counter()
            build_and_save_index(corpus, root, cfg, timings=phase)
            total = time.perf_counter() - t0
            out.setdefault("corpus_pass", []).append(phase["corpus_pass_sec"])
            out.setdefault("finalize", []).append(phase["finalize_sec"])
            out.setdefault("build_total", []).append(total)
            sz = 0
            for dp, _dn, fns in os.walk(root):
                for f in fns:
                    sz += os.path.getsize(os.path.join(dp, f))
            out.setdefault("store_bytes", []).append(sz)
        finally:
            shutil.rmtree(root, ignore_errors=True)
    spark.stop()
    summary = {
        k: {"min": round(min(v), 3), "all": [round(x, 3) for x in v]}
        for k, v in out.items()
    }
    print(json.dumps({"n_docs": n_docs, "cpus": cpus, "phases": summary}))


if __name__ == "__main__":
    main()
