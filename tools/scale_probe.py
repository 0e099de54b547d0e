"""One-order-higher scale probe (VERDICT r04 ask #6): build + query +
delete + serve at 10M synthetic docs (env-tunable) on local[32].

Protocol matches the bench's pre-declared estimator: query/serve legs run
as >=3 INTERLEAVED reps with the per-side MINIMUM reported (this host's
noise mode is a one-sided per-JVM slowdown — see bench.py scaling_run);
the two store builds are single-shot (too expensive to repeat at 10M) and
carry their /proc/stat steal jiffies so a corrupted window is visible.

Specifically instrumented for the term-vs-doc layout crossover question:
the term layout colocates one query's candidates into ONE task
(wand_topk's qid repartition), the doc layout spreads them over n_parts
tasks with a tiny window merge — at high k and hot (stopword) queries the
doc layout should win. Legs at k=10 and k=1000 in both layouts decide it
from data.

Usage: SPARK_DRIVER_MEMORY=48g python tools/scale_probe.py 2>/dev/null
Env: FES_PROBE_DOCS (default 10_000_000), FES_PROBE_REPS (default 3).

Emits one JSON line per phase (progressive — partial results survive a
crash) and a final {"probe": "summary", ...} line.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np  # noqa: E402

from flagembedding_spark.config import BM25Config  # noqa: E402
from flagembedding_spark.entries import B, K1  # noqa: E402
from flagembedding_spark.operators.deletes import (  # noqa: E402
    DocidBitmap,
    write_tombstones,
)
from flagembedding_spark.operators.index_build import build_index  # noqa: E402
from flagembedding_spark.operators.segments import (  # noqa: E402
    build_doc_partitioned_segments,
    build_segments,
    load_segments,
    merge_segments,
    save_segments,
)
from flagembedding_spark.operators.wand import wand_topk  # noqa: E402
from flagembedding_spark.schemas import (  # noqa: E402
    distributed_synth_corpus_skewed,
    skewed_queries,
)
from flagembedding_spark.session import get_spark  # noqa: E402


def _steal() -> int:
    try:
        with open("/proc/stat") as f:
            return int(f.readline().split()[8])
    except Exception:
        return 0


def emit(**kw) -> None:
    print(json.dumps({k: (round(v, 3) if isinstance(v, float) else v)
                      for k, v in kw.items()}), flush=True)


def main() -> None:
    n_docs = int(os.environ.get("FES_PROBE_DOCS", str(10_000_000)))
    reps = max(1, int(os.environ.get("FES_PROBE_REPS", "3")))
    hz = os.sysconf(os.sysconf_names["SC_CLK_TCK"])
    spark = get_spark("fes-scale-probe", shuffle_partitions=64)
    cfg = BM25Config(k1=K1, b=B, block_size=128, salt_threshold_df=1000,
                     max_salt=8, term_buckets=64)
    base = tempfile.mkdtemp(prefix="fes_probe_")  # system tmp (same disk)
    term_root = f"{base}/term_store"
    try:
        corpus = distributed_synth_corpus_skewed(spark, n_docs, partitions=128)

        # --- build leg (single-shot, steal recorded) ---
        s0, t0 = _steal(), time.perf_counter()
        idx = build_index(corpus, cfg, content_col="content",
                          docid_long=None, docid_str=None)
        seg = merge_segments(build_segments(idx))
        save_segments(seg, term_root)
        t_build = time.perf_counter() - t0
        emit(probe="build_term_store", docs=n_docs, sec=t_build,
             files_per_sec=round(n_docs / t_build, 1),
             steal_sec=round((_steal() - s0) / hz, 1))

        seg = load_segments(spark, term_root)
        seg.blocks = seg.blocks.cache()
        n_blocks = seg.blocks.count()
        emit(probe="term_store_blocks", blocks=n_blocks)

        s0, t0 = _steal(), time.perf_counter()
        dseg = build_doc_partitioned_segments(idx, n_parts=32)
        dseg.blocks = dseg.blocks.cache()
        n_dblocks = dseg.blocks.count()
        t_dbuild = time.perf_counter() - t0
        emit(probe="build_doc_layout", sec=t_dbuild, blocks=n_dblocks,
             steal_sec=round((_steal() - s0) / hz, 1))

        qs = skewed_queries(spark)
        qs_hot = qs.filter("query_id = 'sk_hot'")

        # --- layout × k interleaved reps (the crossover measurement) ---
        legs = {
            "term_k10": lambda: wand_topk(seg, qs, k=10).count(),
            "doc_k10": lambda: wand_topk(dseg, qs, k=10).count(),
            "term_k1000": lambda: wand_topk(seg, qs, k=1000).count(),
            "doc_k1000": lambda: wand_topk(dseg, qs, k=1000).count(),
            "term_hot_k1000": lambda: wand_topk(seg, qs_hot, k=1000).count(),
            "doc_hot_k1000": lambda: wand_topk(dseg, qs_hot, k=1000).count(),
        }
        for fn in legs.values():
            fn()  # warm
        times: dict[str, list[float]] = {k: [] for k in legs}
        for _ in range(reps):
            for name, fn in legs.items():
                t = time.perf_counter()
                fn()
                times[name].append(time.perf_counter() - t)
        for name, ts in times.items():
            emit(probe=f"query_{name}", min_sec=min(ts),
                 reps=[round(x, 2) for x in ts])

        # --- delete legs: 1k and 1M tombstones through the term store ---
        rng = np.random.default_rng(5)
        some = wand_topk(seg, qs, k=200).select("docid").limit(5000)
        pool = np.asarray([int(r["docid"]) for r in some.collect()],
                          dtype=np.int64)
        dead_1k = rng.choice(pool, size=min(1000, pool.size), replace=False)
        dead_1m = DocidBitmap.from_array(np.concatenate([
            dead_1k,
            np.arange(1 << 40, (1 << 40) + 1_000_000, dtype=np.int64),
        ]))
        del_legs = {
            "nodelete": lambda: wand_topk(seg, qs, k=10).count(),
            "delete_1k": lambda: wand_topk(
                seg, qs, k=10, exclude_docids=dead_1k).count(),
            "delete_1m_bitmap": lambda: wand_topk(
                seg, qs, k=10, exclude_docids=dead_1m).count(),
        }
        for fn in del_legs.values():
            fn()
        dtimes: dict[str, list[float]] = {k: [] for k in del_legs}
        for _ in range(reps):
            for name, fn in del_legs.items():
                t = time.perf_counter()
                fn()
                dtimes[name].append(time.perf_counter() - t)
        for name, ts in dtimes.items():
            emit(probe=f"query_{name}", min_sec=min(ts),
                 reps=[round(x, 2) for x in ts])

        # --- serving reader (Spark-free) on the persisted 10M store ---
        write_tombstones(term_root, dead_1k)
        from flagembedding_spark.serving import SegmentReader

        rd = SegmentReader(term_root)
        needle_q = "needle_1 def self"
        hot_q = "def self ( ) = { } : if for class return"
        for label, q in (("needle", needle_q), ("hot", hot_q)):
            rd.topk(q, k=10)  # warm
            lat = []
            for _ in range(max(5, reps)):
                t = time.perf_counter()
                rd.topk(q, k=10)
                lat.append(time.perf_counter() - t)
            lat.sort()
            emit(probe=f"serve_{label}", min_sec=lat[0],
                 p50=lat[len(lat) // 2], max_sec=lat[-1],
                 tombstones=int(rd.tombstones.size))

        emit(probe="summary", docs=n_docs, term_blocks=n_blocks,
             doc_blocks=n_dblocks, build_sec=t_build,
             files_per_sec=round(n_docs / t_build, 1),
             reps=reps, estimator="per-side min over interleaved reps")
    finally:
        shutil.rmtree(base, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
