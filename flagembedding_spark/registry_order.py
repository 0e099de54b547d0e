"""Canonical ordering for the driver-facing entry registry.

The verification driver evaluates only the FIRST ``DRIVER_WINDOW`` keys of
``__spark_entry__.queries()`` (dict insertion order).  Round 3 grew the
registry to 62 entries and the 12 newest — the round's flagship work —
silently fell outside the window and received no driver correctness row
(VERDICT.md round 3, "What's wrong" #1).

This module makes ordering an explicit, checked contract instead of an
accident of insertion order:

- ``PRIORITY_FIRST``: entries that still need a driver row (currently the
  12 round-3 additions).  They are emitted first.
- Unknown/new entries (added later, listed nowhere here) are emitted
  immediately after — a brand-new operator always gets driver coverage.
- ``MIDDLE``: the remaining once-or-twice-green entries, stable order.
- ``STABLE_TAIL``: entries hash-green in BOTH r02 and r03 driver runs,
  rotated out past the window to make room.  Their correctness is still
  enforced every round by ``tools/check_entries.py`` (the local
  driver-fidelity gate) and the pytest suite.

``tools/check_entries.py`` asserts that every entry NOT in ``STABLE_TAIL``
lands inside the window, so displacement is caught at commit time.
"""

from __future__ import annotations

DRIVER_WINDOW = 50

# Once-green entries (driver-green in CORRECTNESS_r04 ONLY) — must stay
# inside the window for a second driver row in round 5 (VERDICT.md round-4
# ask #2).  Computed from the r02/r03/r04 correctness records.
PRIORITY_FIRST: list[str] = [
    "bm25_topk_wand_twophase",
    "proximity_match",
    "proximity_match_segments",
    "proximity_match_ordered",
    "colbert_maxsim_topk",
    "lexical_matching",
    "m3_ensemble_topk",
    "stratified_sample",
    "corpus_clean",
    "redact_pii",
    "dedup_segments_within_doc",
    "event_props_extract",
    "bm25_topk_conjunctive",
    "bm25_topk_deleted",
    "bm25_topk_filtered",
    "snippet_extract",
    "prf_expansion",
    "more_like_this",
    "bm25f_topk",
    "prefix_search_topk",
    "fuzzy_search_topk",
    "wildcard_search_topk",
    "decontaminate",
    "repetition_stats",
    "bm25_explain",
    "rrf_fusion",
    "rocchio_topk",
    "bm25_search_after",
]

# Hash-green in at least TWO driver rounds; rotated past the driver window
# (still gated locally every round by tools/check_entries.py). Round 5
# rotated in the 22 entries that became multi-green with CORRECTNESS_r04
# (green in r04 plus r02 and/or r03) to make room for round-5 additions.
STABLE_TAIL: list[str] = [
    # multi-green as of r04 (rotated at round-5 start)
    "bm25_topk",
    "bm25_topk_wand",
    "bm25_topk_naive_params",
    "doc_stats",
    "postings",
    "term_dictionary",
    "dedup_exact",
    "dedup_minhash_lsh",
    "minhash_signatures",
    "simhash",
    "embedding_neardup",
    "ann_cosine_topk",
    "ann_lsh_recall",
    "ann_ivf_recall",
    "ann_topk_persisted",
    "ir_metrics",
    "ir_metrics_by_lang",
    "content_sha_invariant",
    "positional_postings",
    "phrase_match",
    "phrase_match_segments",
    "sessionize",
    # multi-green as of r03 (rotated at round-4 start)
    "query_sanitize",
    "query_terms",
    "token_counts",
    "quality_score",
    "lang_id",
    "doc_fingerprint",
    "query_instruction",
    "normalize_text_full",
    "media_meta",
    "corpus_stats",
    "inverted_list_summary",
    "trec_run",
    "impact_query_expansion",
    "impact_search_topk",
    "bm25_topk_wand_docpart",
    "windowed_event_counts",
    "qa_containment_unicode",
    "token_counts_unicode",
    "lang_id_multi",
    "retrieval_metrics_binary",
    "code_token_counts",
    "postings_stopfiltered",
    "impact_postings",
    "hybrid_fusion",
    "rerank_pairs",
    "qa_containment",
    "qa_recall",
    "hard_negatives",
    "dedup_ngram_jaccard",
]


def canonical_order(keys: list[str]) -> list[str]:
    """Return ``keys`` reordered so driver verification covers what matters.

    Layout: PRIORITY_FIRST, then unknown (new) entries in their original
    relative order, then the remaining known middle entries, then
    STABLE_TAIL.  Idempotent; preserves the full key set exactly.
    """
    keyset = set(keys)
    pf = [k for k in PRIORITY_FIRST if k in keyset]
    tail = [k for k in STABLE_TAIL if k in keyset]
    placed = set(pf) | set(tail)
    known_middle = [k for k in keys if k not in placed and not _is_new(k)]
    new = [k for k in keys if k not in placed and _is_new(k)]
    out = pf + new + known_middle + tail
    assert sorted(out) == sorted(keys), "canonical_order must preserve keys"
    return out


# Entries known to exist at the time this ordering was fixed (round 5).
# As of round 5 every pre-existing entry is either PRIORITY_FIRST (once-
# green, held for a second driver row) or STABLE_TAIL (multi-green,
# rotated out), so the known set is exactly their union.  Anything not
# listed is "new" and is promoted to the front of the middle region.
_KNOWN: frozenset[str] = frozenset(PRIORITY_FIRST + STABLE_TAIL)


def _is_new(key: str) -> bool:
    return key not in _KNOWN


def outside_window(keys: list[str]) -> list[str]:
    """Entries that will NOT receive a driver correctness row."""
    ordered = canonical_order(keys)
    return ordered[DRIVER_WINDOW:]


def check_window(keys: list[str]) -> list[str]:
    """Return violations: non-STABLE_TAIL entries that fell outside the
    driver window.  Empty list == ordering contract holds."""
    tail = set(STABLE_TAIL)
    return [k for k in outside_window(keys) if k not in tail]
