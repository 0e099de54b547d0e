"""Full Unicode text normalization (T5) and the Unicode word tokenizer (T6).

Semantics replicated from the reference MKQA evaluation path (behavior
studied, implementation fresh):

- character normalization: evaluation/mkqa/utils/normalize_text.py:29-162 —
  remove controls, map vertical-tab/form-feed/NEL to space, unify every
  hyphen/minus variant to '-', drop soft hyphens, unify double-quote variants
  to '"', single-quote/apostrophe/accent variants to "'", expand primes to
  apostrophe runs, '…' to '...', ' . . . ' to ' ... ', unify slash variants
  to '/'. Applied corpus-side at load (mkqa/data_loader.py:110,125).
- word tokenizer: evaluation/mkqa/utils/compute_metrics.py:10-30 —
  ``[\\p{L}\\p{N}\\p{M}]+ | [^\\p{Z}\\p{C}]`` (letter/number/mark runs, else
  any single non-separator non-control char), optionally lowercased.
- answer containment: compute_metrics.py:33-48 — NFD-normalize both sides,
  tokenize uncased, exact token-subsequence match.

Two implementations with identical semantics:
- COLUMN expressions (translate/regexp chains, Java \\p classes) — the
  corpus-scale path, pure JVM, usable inside whole-stage codegen;
- plain-Python twins (for the eval-side pandas UDF in operators/qa.py and
  for golden tests that execute the reference functions directly).
"""

from __future__ import annotations

import unicodedata

from pyspark.sql import Column
from pyspark.sql import functions as F

# --- character classes (normalize_text.py:29-131) --------------------------

CONTROLS = (
    "\u0001\u0002\u0003\u0004\u0005\u0006\u0007\u0008\u000e\u000f"
    "\u0011\u0012\u0013\u0014\u0015\u0016\u0017\u0018\u0019\u001a\u001b"
)
SPACE_CONTROLS = "\u000b\u000c\u0085"  # vertical tab, form feed, NEL -> space
SOFT_HYPHEN = "\u00ad"
HYPHENS_MINUSES = "-\u2010\u2011\u2043\u2012\u2013\u2014\u2015\u2212\uff0d\u207b"
DOUBLE_QUOTES = "“”„‟"
SINGLE_QUOTES = "‘’‚‛՚Ꞌꞌ＇`´"
PRIME_MAP = {
    "′": "'",
    "‵": "'",
    "″": "''",
    "‶": "''",
    "‴": "'''",
    "‷": "'''",
    "⁗": "''''",
}
SLASHES = "⁄∕"

# translate() (Spark and DuckDB alike) pairs from/to positionally and
# DELETES the from-chars beyond to's length — so the deleted classes
# (controls + soft hyphen) must sit at the END of the from string.
_TRANSLATE_FROM = (
    SPACE_CONTROLS + HYPHENS_MINUSES + DOUBLE_QUOTES + SINGLE_QUOTES
    + SLASHES + CONTROLS + SOFT_HYPHEN
)
_TRANSLATE_TO = (
    "   "  # the three space-controls
    + "-" * len(HYPHENS_MINUSES)
    + '"' * len(DOUBLE_QUOTES)
    + "'" * len(SINGLE_QUOTES)
    + "/" * len(SLASHES)
)

_PY_TABLE: dict[int, str | None] = {ord(ch): None for ch in CONTROLS + SOFT_HYPHEN}
_PY_TABLE.update({ord(ch): " " for ch in SPACE_CONTROLS})
_PY_TABLE.update({ord(ch): "-" for ch in HYPHENS_MINUSES})
_PY_TABLE.update({ord(ch): '"' for ch in DOUBLE_QUOTES})
_PY_TABLE.update({ord(ch): "'" for ch in SINGLE_QUOTES})
_PY_TABLE.update({ord(k): v for k, v in PRIME_MAP.items()})
_PY_TABLE.update({ord(ch): "/" for ch in SLASHES})
_PY_TABLE[ord("…")] = "..."

# Unicode word tokenizer (compute_metrics.py:11-12). The same pattern text is
# valid Java regex (Spark), RE2 (DuckDB oracle) and `regex` (Python) — all
# three implement single-letter Unicode general-category classes.
ALPHA_NUM_RE = r"[\p{L}\p{N}\p{M}]+"
SIMPLE_TOKEN_RE = r"[\p{L}\p{N}\p{M}]+|[^\p{Z}\p{C}]"


# --- Python twins -----------------------------------------------------------

def normalize_chars_py(text: str) -> str:
    """normalize_text.py:133-162 semantics in one translate pass + the two
    string-level rewrites."""
    out = text.translate(_PY_TABLE)
    return out.replace(" . . . ", " ... ")


_TOKEN_CATS_RUN = ("L", "N", "M")  # letter/number/mark runs


def simple_tokens_py(text: str, uncased: bool = True) -> list[str]:
    """compute_metrics.py:24-30 semantics: maximal [LNM]+ runs, else one
    token per non-separator non-control char. Implemented with a category
    scanner (no regex dependency); cross-checked against the reference's
    `regex` pattern in tests."""
    toks: list[str] = []
    run: list[str] = []
    for ch in text:
        cat = unicodedata.category(ch)[0]
        if cat in _TOKEN_CATS_RUN:
            run.append(ch)
            continue
        if run:
            toks.append("".join(run))
            run = []
        if cat not in ("Z", "C"):
            toks.append(ch)
    if run:
        toks.append("".join(run))
    return [t.lower() for t in toks] if uncased else toks


def has_answer_py(answers: list[str], text: str) -> bool:
    """compute_metrics.py:37-48: NFD both sides, tokenize uncased, exact
    token-subsequence containment."""
    ttoks = simple_tokens_py(unicodedata.normalize("NFD", text))
    for ans in answers:
        atoks = simple_tokens_py(unicodedata.normalize("NFD", ans))
        # NOTE: an answer with no tokens matches trivially (empty slice ==
        # empty list at i=0) — reference-faithful, verified by golden test
        m = len(atoks)
        for i in range(0, len(ttoks) - m + 1):
            if ttoks[i:i + m] == atoks:
                return True
    return False


# --- column-expression twins (JVM, corpus-scale) ----------------------------

def normalize_chars(col: Column | str) -> Column:
    """T5 full character normalization as JVM expressions: one translate for
    every 1:1 map/delete, regexp/literal rewrites for the 1:many cases.
    Order mirrors the reference: primes expand before the ellipsis rewrite."""
    c = F.col(col) if isinstance(col, str) else col
    out = F.translate(c, _TRANSLATE_FROM, _TRANSLATE_TO)
    for src, dst in PRIME_MAP.items():
        out = F.replace(out, F.lit(src), F.lit(dst))
    out = F.replace(out, F.lit("…"), F.lit("..."))
    out = F.replace(out, F.lit(" . . . "), F.lit(" ... "))
    return out


def simple_word_tokens(col: Column | str, uncased: bool = True) -> Column:
    """T6 Unicode word tokenizer as a JVM expression (Java \\p classes)."""
    c = F.col(col) if isinstance(col, str) else col
    toks = F.regexp_extract_all(c, F.lit(SIMPLE_TOKEN_RE), 0)
    if uncased:
        toks = F.transform(toks, F.lower)
    return toks


def alpha_num_tokens(col: Column | str, uncased: bool = True) -> Column:
    """Only the letter/number/mark runs (the tokenizer's word branch)."""
    c = F.col(col) if isinstance(col, str) else col
    toks = F.regexp_extract_all(c, F.lit(ALPHA_NUM_RE), 0)
    if uncased:
        toks = F.transform(toks, F.lower)
    return toks
