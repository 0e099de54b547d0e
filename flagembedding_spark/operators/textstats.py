"""Text-analysis operators for training-data pipelines: language ID
(stopword-hit heuristic), quality scoring, token counting, and document
fingerprinting. All JVM column expressions (no UDFs) so they run at scan
speed and push down through Catalyst.

The reference's text-normalization precedent is the MKQA eval path
(evaluation/mkqa/utils/normalize_text.py, compute_metrics.py:10-30); the
quality/language heuristics are the standard corpus-filtering recipe
(C4/Gopher-style length+punctuation+stopword signals) re-expressed as
columnar arithmetic.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from flagembedding_spark.functions.hashing import MERSENNE_P, md5_prefix_long
from flagembedding_spark.functions.tokenize import normalize_text, whitespace_tokens

WORD_RE = r"[A-Za-z0-9_]+"

# tiny per-language stopword lists (deterministic heuristic; order matters for
# the argmax tie-break: first list wins ties)
LANG_STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "a", "in", "is", "it"),
    "es": ("el", "la", "de", "que", "y", "los", "en", "un"),
    "de": ("der", "die", "und", "das", "nicht", "ist", "zu", "ein"),
    "fr": ("le", "la", "et", "les", "des", "un", "une", "est"),
    "it": ("il", "di", "che", "non", "per", "con", "una", "sono"),
    "pt": ("o", "e", "do", "da", "em", "um", "para", "com"),
    "nl": ("de", "het", "een", "van", "niet", "met", "voor", "ook"),
}

# non-Latin scripts: contiguous codepoint ranges usable verbatim in BOTH Java
# regex (Spark) and RE2 (DuckDB oracle) character classes; checked in order
# (kana before han: Japanese text contains both, Chinese has no kana)
SCRIPT_RANGES: dict[str, str] = {
    "ja": "぀-ヿ",   # hiragana + katakana
    "zh": "一-鿿",   # CJK unified ideographs
    "ko": "가-힯",   # hangul syllables
    "ru": "Ѐ-ӿ",   # cyrillic
    "ar": "؀-ۿ",   # arabic
    "hi": "ऀ-ॿ",   # devanagari
    "el": "Ͱ-Ͽ",   # greek
}
SCRIPT_MIN_RATIO = 0.3


def token_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Whitespace token count + regex word count + distinct-token count."""
    toks = whitespace_tokens(text_col)
    words = F.regexp_extract_all(F.col(text_col), F.lit(WORD_RE), 0)
    return df.select(
        "*",
        F.size(toks).alias("n_tokens_ws"),
        F.size(words).alias("n_words"),
        F.size(F.array_distinct(toks)).alias("n_tokens_distinct"),
    )


def _stopword_hits(toks: Column, words: tuple[str, ...]) -> Column:
    arr = F.array(*[F.lit(w) for w in words])
    return F.size(F.filter(toks, lambda t: F.array_contains(arr, t)))


def quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Columnar quality signals + a [0,1] composite:
    - length band (20..2000 tokens full credit)
    - alphanumeric ratio (chars)
    - English stopword ratio (tokens)
    - distinct-token ratio (repetition guard)
    Composite = mean of the four clamped signals, rounded to 6dp."""
    toks = whitespace_tokens(F.lower(F.col(text_col)))
    n_tok = F.size(toks)
    n_chars = F.length(F.col(text_col))
    n_alnum = F.length(F.regexp_replace(F.col(text_col), r"[^A-Za-z0-9]", ""))
    stop_ratio = _stopword_hits(toks, LANG_STOPWORDS["en"]) / F.greatest(
        n_tok, F.lit(1)
    )
    sig_len = F.least(
        F.greatest((n_tok - 5) / F.lit(15.0), F.lit(0.0)), F.lit(1.0)
    )
    sig_alnum = n_alnum / F.greatest(n_chars, F.lit(1))
    sig_stop = F.least(stop_ratio * 4.0, F.lit(1.0))
    sig_distinct = F.size(F.array_distinct(toks)) / F.greatest(n_tok, F.lit(1))
    comp = F.round((sig_len + sig_alnum + sig_stop + sig_distinct) / 4.0, 6)
    return df.select(
        "*",
        n_tok.alias("n_tokens"),
        F.round(sig_alnum, 6).alias("alnum_ratio"),
        F.round(stop_ratio, 6).alias("stopword_ratio"),
        F.round(sig_distinct, 6).alias("distinct_ratio"),
        comp.alias("quality"),
    )


def lang_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Two-stage deterministic language guess:
    1. SCRIPT stage — if > SCRIPT_MIN_RATIO of characters fall in a
       non-Latin script range (checked in SCRIPT_RANGES order; kana before
       han so Japanese wins over its own kanji), that language wins;
    2. STOPWORD stage — argmax of per-language stopword hits over the Latin
       lists, first-listed wins ties; 'und' when no list scores > 0.
    All JVM expressions; the DuckDB oracle mirrors both stages from the SAME
    constant tables."""
    text = F.col(text_col)
    n_chars = F.greatest(F.length(text), F.lit(1))
    toks = whitespace_tokens(F.lower(text))
    scores = [
        (_stopword_hits(toks, ws)).alias(f"hits_{lang}")
        for lang, ws in LANG_STOPWORDS.items()
    ]
    script_counts = [
        F.length(F.regexp_replace(text, f"[^{rng}]", "")).alias(f"sc_{lang}")
        for lang, rng in SCRIPT_RANGES.items()
    ]
    tmp = df.select("*", *scores, *script_counts)
    langs = list(LANG_STOPWORDS)
    best = F.greatest(*[F.col(f"hits_{lg}") for lg in langs])
    pred = None
    for lg in SCRIPT_RANGES:
        cond = F.col(f"sc_{lg}") / n_chars > SCRIPT_MIN_RATIO
        pred = F.when(cond, F.lit(lg)) if pred is None else pred.when(cond, F.lit(lg))
    pred = pred.when(best <= 0, F.lit("und"))
    for lg in langs:
        pred = pred.when(F.col(f"hits_{lg}") == best, F.lit(lg))
    return tmp.withColumn("lang_pred", pred).drop(
        *[f"sc_{lg}" for lg in SCRIPT_RANGES]
    )


def doc_fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Two fingerprints:
    - fp_md5: md5 of normalized text (cross-engine-checkable content id)
    - fp_roll: polynomial rolling hash over normalized tokens,
      Σ base(tok_i)·B^(n-1-i) mod P — order-sensitive (anagram documents get
      different fp_roll but may share bag-of-words signatures)."""
    norm = normalize_text(text_col)
    toks = F.split(norm, " ", -1)
    B = 1_000_003
    fold = F.aggregate(
        toks,
        F.lit(0).cast("long"),
        lambda acc, t: (acc * B + md5_prefix_long(t) % MERSENNE_P) % MERSENNE_P,
    )
    return df.select(
        "*",
        F.md5(norm).alias("fp_md5"),
        fold.alias("fp_roll"),
    )
