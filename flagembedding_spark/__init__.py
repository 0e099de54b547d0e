"""flagembedding_spark — a from-scratch PySpark-native lexical-retrieval engine.

Rebuilds the retrieval dataflow of FlagOpen/FlagEmbedding (corpus ingestion →
tokenization → inverted-index build → top-k BM25 scoring → reranking → metric
aggregation) as idiomatic Spark DataFrame jobs, designed for a 10^12-file
Iceberg source-code corpus.

Reference semantics: /root/reference (FlagOpen/FlagEmbedding), chiefly
``research/llm_embedder/src/retrieval/modeling_bm25.py`` (the NaiveBM25Retriever
oracle) and ``FlagEmbedding/abc/evaluation/`` (the eval-harness contract).
No reference code is copied; only behavior is matched.
"""

from flagembedding_spark.config import BM25Config
from flagembedding_spark.operators.index_build import (
    InvertedIndex,
    build_index,
    impact_postings,
    verify_content_sha,
)
from flagembedding_spark.operators.query import bm25_topk
from flagembedding_spark.operators.segments import (
    SegmentIndex,
    build_segments,
    load_segments,
    merge_segments,
    save_segments,
)
from flagembedding_spark.operators.wand import wand_topk

__all__ = [
    "BM25Config",
    "InvertedIndex",
    "SegmentIndex",
    "build_index",
    "bm25_topk",
    "build_segments",
    "merge_segments",
    "save_segments",
    "load_segments",
    "wand_topk",
    "impact_postings",
    "verify_content_sha",
]
__version__ = "0.1.0"
