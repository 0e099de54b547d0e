"""Engine configuration.

BM25 parameter provenance (reference, /root/reference):
- NaiveBM25Retriever defaults k1=0.9, b=0.4
  (research/llm_embedder/src/retrieval/modeling_bm25.py:13,144)
- llm_embedder CLI defaults k1=0.82, b=0.68
  (research/llm_embedder/src/retrieval/args.py:190-197)
- North-star config pins k1=1.2, b=0.75 (BASELINE.json).

``use_avgdl``: the reference's naive oracle normalizes by *raw* doc length
(modeling_bm25.py:227 — no avgdl division, i.e. avgdl ≡ 1). Standard BM25
divides by avgdl. We implement the standard form and expose the compat switch
so goldens generated from the reference file match bit-for-bit in rank.
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass(frozen=True)
class BM25Config:
    k1: float = 1.2
    b: float = 0.75
    hits: int = 10
    use_avgdl: bool = True  # False → reference NaiveBM25 compat (avgdl ≡ 1)
    stop_tokens: frozenset[str] = field(default_factory=frozenset)

    # index-build knobs
    salt_threshold_df: int = 100_000  # terms with df above this get salted
    max_salt: int = 32
    block_size: int = 128  # postings per compressed block (block-max WAND)
    term_buckets: int = 64  # hash buckets for the term-partitioned index layout


REFERENCE_COMPAT = BM25Config(k1=1.2, b=0.75, use_avgdl=False)
NORTH_STAR = BM25Config(k1=1.2, b=0.75, use_avgdl=True)
