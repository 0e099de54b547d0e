"""Dedup operators vs brute-force Python on planted near-duplicates."""

import itertools

import pytest
from pyspark.sql import functions as F

from flagembedding_spark.operators.dedup import (
    embedding_neardup_pairs,
    exact_dedup,
    lsh_candidate_pairs,
    minhash_dedup,
    minhash_signatures,
    ngram_jaccard_pairs,
    simhash,
    simhash_neardup_pairs,
    token_shingles,
)


def _mk_docs(spark):
    base = "the quick brown fox jumps over the lazy dog near the river bank today"
    docs = []
    # 0/1: exact duplicates; 2: near-dup of 0 (one token changed)
    docs.append((0, base))
    docs.append((1, base))
    docs.append((2, base.replace("lazy", "sleepy")))
    # 3: unrelated
    docs.append((3, "completely different content about spark inverted index builds"))
    # 4: near-dup of 3 (token appended)
    docs.append((4, "completely different content about spark inverted index builds today"))
    # 5: short doc (fewer than 3 tokens → no shingles)
    docs.append((5, "tiny doc"))
    return spark.createDataFrame(docs, ["doc_id", "text"])


def _brute_jaccard(a: str, b: str, n=3):
    sa = {" ".join(a.split(" ")[i:i + n]) for i in range(len(a.split(" ")) - n + 1)}
    sb = {" ".join(b.split(" ")[i:i + n]) for i in range(len(b.split(" ")) - n + 1)}
    return len(sa & sb) / len(sa | sb) if sa | sb else 0.0


def test_exact_dedup(spark):
    docs = _mk_docs(spark)
    got = {r["text_sha"]: (r["dup_count"], r["keep_id"]) for r in exact_dedup(docs).collect()}
    assert len(got) == 5  # 6 docs, one exact dup pair
    assert (2, 0) in got.values()


def test_shingles_match_brute(spark):
    docs = _mk_docs(spark)
    rows = token_shingles(docs).collect()
    got = {}
    for r in rows:
        got.setdefault(r["id"], set()).add(r["shingle"])
    texts = {r["doc_id"]: r["text"] for r in docs.collect()}
    for i, t in texts.items():
        want = {" ".join(t.split(" ")[j:j + 3]) for j in range(len(t.split(" ")) - 2)}
        assert got.get(i, set()) == want, i


def test_ngram_jaccard_pairs(spark):
    docs = _mk_docs(spark)
    got = {(r["id_a"], r["id_b"]): r["jaccard"] for r in
           ngram_jaccard_pairs(docs, threshold=0.3).collect()}
    texts = {r["doc_id"]: r["text"] for r in docs.collect()}
    want = {}
    for a, b in itertools.combinations(sorted(texts), 2):
        j = _brute_jaccard(texts[a], texts[b])
        if j >= 0.3:
            want[(a, b)] = j
    assert set(got) == set(want)
    for k in want:
        assert abs(got[k] - want[k]) < 1e-6


def test_minhash_signature_matches_brute(spark):
    from flagembedding_spark.functions.hashing import (
        MERSENNE_P,
        md5_prefix_long_py,
        minhash_params,
    )

    docs = _mk_docs(spark)
    sig = minhash_signatures(docs, n_perms=8).collect()
    got = {(r["id"], r["perm"]): r["minhash"] for r in sig}
    texts = {r["doc_id"]: r["text"] for r in docs.collect()}
    params = minhash_params(8)
    for i, t in texts.items():
        toks = t.split(" ")
        sh = {" ".join(toks[j:j + 3]) for j in range(len(toks) - 2)}
        if not sh:
            assert all((i, p) not in got for p in range(8))
            continue
        bases = [md5_prefix_long_py(s) % MERSENNE_P for s in sh]
        for p, (a, b) in enumerate(params):
            want = min((a * h + b) % MERSENNE_P for h in bases)
            assert got[(i, p)] == want, (i, p)


def test_minhash_lsh_finds_planted_neardups(spark):
    docs = _mk_docs(spark)
    pairs = {(r["id_a"], r["id_b"]) for r in
             minhash_dedup(docs, threshold=0.5, n_perms=16, bands=8).collect()}
    assert (0, 1) in pairs  # exact dup always caught
    assert (0, 2) in pairs or (1, 2) in pairs  # near-dup
    assert (3, 4) in pairs
    assert all(3 not in p or 4 in p for p in pairs)  # no false pair with 0/1/2


def test_lsh_no_false_positives_after_verify(spark):
    docs = _mk_docs(spark)
    verified = minhash_dedup(docs, threshold=0.5).collect()
    texts = {r["doc_id"]: r["text"] for r in docs.collect()}
    for r in verified:
        assert _brute_jaccard(texts[r["id_a"]], texts[r["id_b"]]) >= 0.5


def test_simhash_neardup(spark):
    docs = _mk_docs(spark)
    sims = simhash(docs).cache()
    vals = {r["id"]: r["simhash"] for r in sims.collect()}
    assert vals[0] == vals[1]  # identical docs → identical simhash
    pairs = simhash_neardup_pairs(sims, max_hamming=8, prefix_bits=6).collect()
    got = {(r["id_a"], r["id_b"]): r["hamming"] for r in pairs}
    assert got.get((0, 1)) == 0
    # near-dup of 0 should be within a few bits
    assert (0, 2) in got


def test_embedding_neardup(spark):
    rows = [
        (0, [1.0, 0.0, 0.0]),
        (1, [0.999, 0.01, 0.0]),   # near-dup of 0
        (2, [0.0, 1.0, 0.0]),      # orthogonal
        (3, [0.0, 0.999, 0.02]),   # near-dup of 2
    ]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    got = {(r["id_a"], r["id_b"]) for r in
           embedding_neardup_pairs(df, threshold=0.95).collect()}
    assert got == {(0, 1), (2, 3)}


def test_lsh_candidates_superset_of_high_jaccard(spark):
    """The LSH S-curve must catch everything the verifier keeps."""
    docs = _mk_docs(spark)
    sig = minhash_signatures(docs, n_perms=16)
    cand = {(r["id_a"], r["id_b"]) for r in lsh_candidate_pairs(sig, 16, 8).collect()}
    verified = {(r["id_a"], r["id_b"]) for r in
                minhash_dedup(docs, threshold=0.5, n_perms=16, bands=8).collect()}
    assert verified <= cand


def test_ngram_jaccard_hot_shingle_cap(spark):
    """A corpus-wide boilerplate shingle must not go quadratic: with the df
    cap, candidate pairs stay bounded by the cold-shingle buckets, and every
    pair that shares at least one below-cap shingle keeps its EXACT
    (full-set) Jaccard score."""
    hot = "licensed under apache two"  # 4-token boilerplate → hot shingles
    docs = [(i, f"{hot} unique{i} body{i} content{i}") for i in range(20)]
    # one genuine near-dup pair sharing cold shingles too
    docs.append((100, f"{hot} shared body same tail here"))
    docs.append((101, f"{hot} shared body same tail here extra"))
    df = spark.createDataFrame(docs, ["doc_id", "text"])

    uncapped = {(r["id_a"], r["id_b"]): r["jaccard"]
                for r in ngram_jaccard_pairs(df, threshold=0.05).collect()}
    capped = {(r["id_a"], r["id_b"]): r["jaccard"]
              for r in ngram_jaccard_pairs(df, threshold=0.05,
                                           max_shingle_df=5).collect()}
    # the planted pair shares cold shingles → survives with identical score
    assert (100, 101) in capped
    assert abs(capped[(100, 101)] - uncapped[(100, 101)]) < 1e-9
    # pairs glued ONLY by the boilerplate shingles are gone: the capped
    # result is exactly the one genuinely-near-dup pair, not the 22-clique
    assert set(capped) == {(100, 101)}
    assert len(uncapped) > 100  # the uncapped form really did go quadratic


def test_lsh_hot_bucket_star_cap(spark):
    """An oversized band bucket (m near-identical docs) emits star candidates
    (root ↔ member): linear in m, cluster stays connected through the root;
    small buckets are unchanged."""
    same = "identical boilerplate file body repeated across many repositories"
    docs = [(i, same) for i in range(12)]            # one hot bucket, m=12
    docs.append((50, "a genuinely different document about spark segments"))
    docs.append((51, "a genuinely different document about spark segments!"))
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    sig = minhash_signatures(df, n_perms=16)

    full = {(r["id_a"], r["id_b"]) for r in
            lsh_candidate_pairs(sig, 16, 8).collect()}
    star = {(r["id_a"], r["id_b"]) for r in
            lsh_candidate_pairs(sig, 16, 8, max_bucket=5).collect()}
    # star form: the 12-clique (66 pairs) collapses to 11 root pairs
    hot_star = {p for p in star if p[0] < 50 and p[1] < 50}
    assert hot_star == {(0, i) for i in range(1, 12)}
    # small buckets unchanged
    assert {p for p in full if p[0] >= 50} == {p for p in star if p[0] >= 50}
    # connectivity: every hot doc reachable from root 0
    assert {b for _, b in hot_star} == set(range(1, 12))


def test_embedding_neardup_lsh_matches_exact(spark):
    """The LSH-bucketed scale path must return the exact pair set on the
    driver fixtures — this is what keeps the oracle entry green while
    exercising the bucketed plan."""
    import os

    from flagembedding_spark.entries_pipeline import COS_NEARDUP_T

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR_SMALL", "/root/testdata/sf0.001")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    exact = {(r["id_a"], r["id_b"], r["cosine"]) for r in
             embedding_neardup_pairs(emb, threshold=COS_NEARDUP_T,
                                     method="exact").collect()}
    lsh = {(r["id_a"], r["id_b"], r["cosine"]) for r in
           embedding_neardup_pairs(emb, threshold=COS_NEARDUP_T,
                                   method="lsh").collect()}
    assert lsh == exact
    assert len(exact) > 0


def test_default_guards_engage_on_hot_bucket(spark):
    """minhash_dedup(df) with NO expert args must auto-cap a hot band bucket
    (> ⌈√N⌉ floor-64 identical docs): pipeline finishes with candidates
    linear in the bucket, the duplicate cluster stays connected through its
    root, and surviving jaccard scores are exact."""
    from flagembedding_spark.operators.dedup import (
        _auto_cap,
        lsh_candidate_pairs,
        minhash_dedup,
        minhash_signatures,
    )

    hot = [(i, "license header boilerplate preamble common tokens here") for i in range(80)]
    rest = [(100 + i, f"unique doc {i} alpha beta gamma delta_{i} epsilon zeta") for i in range(20)]
    df = spark.createDataFrame(hot + rest, "doc_id long, text string")
    cap = _auto_cap(df.count())
    assert cap == 64 < 80  # the hot bucket exceeds the default cap

    sig = minhash_signatures(df)
    cand = lsh_candidate_pairs(sig)  # default 'auto'
    n_cand = cand.count()
    # star candidates: ~79 per band for the hot bucket, never ~80*79/2
    assert n_cand < 80 * 79 / 2 / 2, n_cand
    # the identical-docs cluster is still fully connected via root id 0
    star = {(r["id_a"], r["id_b"]) for r in cand.collect() if r["id_a"] == 0}
    assert {b for _, b in star} == set(range(1, 80))

    pairs = minhash_dedup(df, threshold=0.9)  # all defaults
    got = {(r["id_a"], r["id_b"]): r["jaccard"] for r in pairs.collect()}
    assert all(abs(j - 1.0) < 1e-9 for j in got.values())
    assert {(0, b) for b in range(1, 80)} <= set(got)


def test_default_guard_engages_on_hot_shingle(spark):
    """ngram_jaccard_pairs(df) default cap drops corpus-wide boilerplate
    shingles from candidate generation but keeps scores exact."""
    from flagembedding_spark.operators.dedup import ngram_jaccard_pairs

    # 70 docs sharing ONLY a boilerplate prefix (one hot shingle family),
    # plus a genuinely near-dup pair sharing discriminative shingles
    boiler = "spdx license identifier apache two"
    docs = [
        (i, f"{boiler} body_{i} tail_{i} end_{i} fin_{i}") for i in range(70)
    ] + [
        (200, boiler + " same same same body xx yy zz"),
        (201, boiler + " same same same body xx yy zq"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    pairs = ngram_jaccard_pairs(df, threshold=0.5)  # default 'auto' cap
    got = {(r["id_a"], r["id_b"]): r["jaccard"] for r in pairs.collect()}
    assert (200, 201) in got
    # exactness: recompute the (200, 201) jaccard brute force
    a = set(zip(*[docs[-2][1].split()[i:] for i in range(3)]))
    b = set(zip(*[docs[-1][1].split()[i:] for i in range(3)]))
    assert abs(got[(200, 201)] - len(a & b) / len(a | b)) < 1e-6
