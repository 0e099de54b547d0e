"""Property-based tests (hypothesis) for the pure-numpy codec and randomized
cross-path engine checks."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from flagembedding_spark.operators.segments import varint_decode, varint_encode


@given(st.lists(st.integers(min_value=0, max_value=2**64 - 1), max_size=500))
@settings(max_examples=200, deadline=None)
def test_varint_roundtrip_property(vals):
    arr = np.array(vals, dtype=np.uint64)
    assert np.array_equal(varint_decode(varint_encode(arr)), arr)


@given(
    st.lists(st.integers(min_value=0, max_value=2**40), min_size=1, max_size=300)
)
@settings(max_examples=100, deadline=None)
def test_delta_gap_roundtrip_property(docids):
    """sorted docids → gaps → varint → back."""
    d = np.array(sorted(docids), dtype=np.int64)
    gaps = np.empty(d.size, dtype=np.uint64)
    gaps[0] = 0
    if d.size > 1:
        gaps[1:] = (d[1:] - d[:-1]).astype(np.uint64)
    back = np.cumsum(varint_decode(varint_encode(gaps)).astype(np.int64)) + d[0]
    assert np.array_equal(back, d)


@given(st.text(alphabet=st.characters(blacklist_categories=("Cs",)), max_size=200))
@settings(max_examples=200, deadline=None)
def test_whitespace_token_contract_property(s):
    """The engine's T1 contract is Python's str.split(' ') — dl must equal
    len(tokens) and tf sums must equal dl for any unicode text."""
    toks = s.split(" ")
    from collections import Counter

    c = Counter(toks)
    assert sum(c.values()) == len(toks)


def test_randomized_bm25_vs_bruteforce(spark):
    """Random corpora/queries across seeds: DataFrame engine == brute force."""
    import math
    import random
    from collections import Counter, defaultdict

    from flagembedding_spark.config import BM25Config
    from flagembedding_spark.operators.index_build import build_index
    from flagembedding_spark.operators.query import bm25_topk

    for seed in (3, 17, 99):
        rng = random.Random(seed)
        vocab = [f"w{i}" for i in range(30)]
        docs = [
            (str(i), " ".join(rng.choices(vocab, k=rng.randint(1, 40))))
            for i in range(60)
        ]
        queries = [
            (f"q{j}", " ".join(rng.choices(vocab + ["oov"], k=rng.randint(1, 5))))
            for j in range(8)
        ]
        df = spark.createDataFrame(docs, ["doc_id", "text"])
        idx = build_index(
            df, BM25Config(k1=0.9, b=0.4), content_col="text",
            docid_long="doc_id",
        )
        qdf = spark.createDataFrame(queries, ["query_id", "query"])
        got = {}
        for r in bm25_topk(idx, qdf, k=10).collect():
            got.setdefault(r["qid"], {})[int(r["docid"])] = r["score"]

        # brute force
        tf = {int(d): Counter(t.split(" ")) for d, t in docs}
        dfreq = defaultdict(int)
        for c in tf.values():
            for t in c:
                dfreq[t] += 1
        dl = {int(d): len(t.split(" ")) for d, t in docs}
        n = len(docs)
        avgdl = sum(dl.values()) / n
        for qid, q in queries:
            scores = defaultdict(float)
            for tok in q.split(" "):
                if tok not in dfreq:
                    continue
                idf = math.log((n - dfreq[tok] + 0.5) / (dfreq[tok] + 0.5) + 1)
                for d, c in tf.items():
                    if tok in c:
                        t = c[tok]
                        scores[d] += idf * 1.9 * t / (t + 0.9 * (0.6 + 0.4 * dl[d] / avgdl))
            want = dict(
                sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
            )
            g = got.get(qid, {})
            assert set(g) == set(want), (seed, qid)
            for d in want:
                assert math.isclose(g[d], want[d], rel_tol=1e-9), (seed, qid, d)


@given(
    st.lists(
        st.lists(
            st.integers(min_value=0, max_value=100_000),
            min_size=1, max_size=8, unique=True,
        ),
        min_size=1, max_size=120,
    )
)
@settings(max_examples=100, deadline=None)
def test_positions_codec_roundtrip_property(pos_lists):
    """Per-posting sorted position lists → varint stream → back, for any
    list shape (incl. position 0, singletons, large gaps)."""
    from flagembedding_spark.operators.segments import (
        decode_positions,
        encode_positions,
    )

    counts = np.array([len(p) for p in pos_lists], dtype=np.int64)
    flat = np.concatenate(
        [np.sort(np.array(p, dtype=np.int64)) for p in pos_lists]
    )
    assert np.array_equal(
        decode_positions(encode_positions(flat, counts), counts), flat
    )


@given(
    st.lists(
        st.lists(st.sampled_from("ab c".split(" ") + ["ab", "c", "d"]),
                 min_size=1, max_size=12),
        min_size=1, max_size=10,
    ),
    st.integers(min_value=1, max_value=3),
)
@settings(max_examples=30, deadline=None)
def test_phrase_counts_match_brute_python_property(docs_tokens, m):
    """Pure-Python brute phrase counting == the positional-list intersection
    math used by every phrase kernel (start positions of adjacent runs),
    via the positions-only reference implementation."""
    phrase = ["ab", "c", "d"][:m]

    # brute: scan every doc for adjacent runs
    want = {}
    for i, toks in enumerate(docs_tokens):
        n = sum(
            1
            for s in range(len(toks) - m + 1)
            if toks[s : s + m] == phrase
        )
        if n:
            want[i] = n

    # positional-list math: pos(t0) ∩ (pos(t1)-1) ∩ ... per doc
    got = {}
    for i, toks in enumerate(docs_tokens):
        sets = []
        ok = True
        for j, t in enumerate(phrase):
            ps = {p - j for p, tok in enumerate(toks) if tok == t and p >= j}
            if not ps:
                ok = False
                break
            sets.append(ps)
        if not ok:
            continue
        starts = set.intersection(*sets)
        if starts:
            got[i] = len(starts)
    assert got == want


# ---------------------------------------------------------------------------
# round 4: Boolean/expansion properties
# ---------------------------------------------------------------------------

def test_msm_monotone_and_subset(spark, tiny_corpus):
    """min_should_match=n results are a subset of n-1's (same scores), and
    conjunctive ⊆ every msm level."""
    from flagembedding_spark.config import BM25Config
    from flagembedding_spark.operators.index_build import build_index
    from flagembedding_spark.operators.query import bm25_topk

    idx = build_index(tiny_corpus, BM25Config())
    # in-vocab code-corpus terms (synth_corpus identifier vocabulary) —
    # off-vocab queries would make every set empty and the test vacuous
    qs = spark.createDataFrame(
        [("p1", "get_er_0 set_er_1 merge_er_6"), ("p2", "public const class")],
        ["query_id", "query"],
    )
    def docset(msm):
        return {
            (r["qid"], int(r["docid"]))
            for r in bm25_topk(idx, qs, k=10_000, min_should_match=msm).collect()
        }
    d0, d1, d2, d3 = docset(0), docset(1), docset(2), docset(3)
    dall = docset("all")
    assert d0 == d1          # every match has >= 1 term
    assert d2 <= d1 and d3 <= d2
    assert dall <= d3 or dall <= d2  # 'all' is the tightest (3-term queries)
    assert d2  # non-vacuous


def test_fuzzy_includes_exact_term(spark, tiny_corpus):
    """FuzzyQuery property: when the query term itself is in the
    dictionary, the expansion always contains it."""
    from flagembedding_spark.config import BM25Config
    from flagembedding_spark.operators.index_build import build_index
    from flagembedding_spark.operators.termquery import expand_fuzzy

    idx = build_index(tiny_corpus, BM25Config())
    terms = [r["term"] for r in idx.dictionary.limit(5).collect()]
    ts = spark.createDataFrame(
        [(f"f{i}", t) for i, t in enumerate(terms)], ["query_id", "qterm"]
    )
    got = {}
    for r in expand_fuzzy(idx, ts, max_edits=1, max_expansions=1000).collect():
        got.setdefault(r["qid"], set()).add(r["term"])
    for i, t in enumerate(terms):
        assert t in got[f"f{i}"], t
