"""Generate frozen golden top-k fixtures by EXECUTING the reference oracle.

We load ``NaiveBM25Retriever`` from the read-only reference checkout at
runtime (AST-extracting just that class so the module's heavyweight imports —
datasets, tqdm, src.utils — aren't needed), run it on the synthetic corpus,
and freeze results to tests/fixtures/golden_topk.json. No reference code is
copied into this repo; tests consume only the frozen JSON, so they run even
where /root/reference is absent.

Per SURVEY §2.5.6 the reference accumulates scores across queries when
``search`` receives >1 query (global_scores allocated once at
modeling_bm25.py:197) — goldens are generated ONE QUERY PER CALL to avoid
replicating that bug.

Run:  python tests/gen_goldens.py
"""

from __future__ import annotations

import ast
import json
import os
from collections import defaultdict
from typing import List, Optional, Union  # noqa: F401 (exec namespace)

import numpy as np

REF = "/root/reference/research/llm_embedder/src/retrieval/modeling_bm25.py"
OUT = os.path.join(os.path.dirname(__file__), "fixtures", "golden_topk.json")

K1, B, HITS = 1.2, 0.75, 10
N_DOCS, N_QUERIES = 200, 50


def load_reference_class():
    src = open(REF).read()
    tree = ast.parse(src)
    cls = next(
        n for n in tree.body
        if isinstance(n, ast.ClassDef) and n.name == "NaiveBM25Retriever"
    )
    mod = ast.Module(body=[cls], type_ignores=[])
    ns = {
        "np": np,
        "defaultdict": defaultdict,
        "List": List,
        "Optional": Optional,
        "Union": Union,
    }
    exec(compile(mod, REF, "exec"), ns)
    return ns["NaiveBM25Retriever"]


def run_oracle(retriever_cls, docs: list[str], query_rows) -> list[dict]:
    golden = []
    for qid, query in query_rows:
        # fresh retriever per query: avoids the cross-query global_scores
        # accumulation bug (SURVEY §2.5.6)
        r = retriever_cls(k1=K1, b=B)
        r.index(docs)
        scores, indices = r.search(query, hits=HITS, k1=K1, b=B)
        for rank, (s, i) in enumerate(zip(scores[0], indices[0]), start=1):
            golden.append(
                {
                    "qid": qid,
                    "rank": rank,
                    "doc_idx": int(i),
                    "score": None if np.isneginf(s) else float(s),
                }
            )
    return golden


def main() -> None:
    import re
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from flagembedding_spark.functions.tokenize import CODE_TOKEN_RE
    from flagembedding_spark.schemas import synth_corpus_rows, synth_queries_rows

    corpus_rows = synth_corpus_rows(N_DOCS, seed=42)
    query_rows = synth_queries_rows(N_QUERIES, seed=43)

    # shared tokenization contract: single-space split (T1). The synthetic
    # content contains newlines; the reference splits on " " only, so "a\nb"
    # would be one token. Our engine does the same — parity by construction.
    docs = [r[4] for r in corpus_rows]

    retriever_cls = load_reference_class()
    golden = run_oracle(retriever_cls, docs, query_rows)

    # T2 same-tokenizer pattern (bm25_baseline_same_tokenizer.py): tokenize
    # docs AND queries with OUR code tokenizer, re-join with spaces, feed both
    # to the reference — goldens then cover index+scoring under the code
    # tokenizer too (a pytest separately asserts Spark's code_tokens equals
    # this regex tokenization).
    code_re = re.compile(CODE_TOKEN_RE)
    code_docs = [" ".join(code_re.findall(t)) for t in docs]
    code_queries = [(qid, " ".join(code_re.findall(q))) for qid, q in query_rows]
    golden_code = run_oracle(retriever_cls, code_docs, code_queries)

    payload = {
        "config": {"k1": K1, "b": B, "hits": HITS, "use_avgdl": False,
                   "n_docs": N_DOCS, "n_queries": N_QUERIES,
                   "corpus_seed": 42, "query_seed": 43},
        "rows": golden,
        "rows_code_tokenizer": golden_code,
    }
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with open(OUT, "w") as f:
        json.dump(payload, f, indent=1)
    print(f"wrote {len(golden)} golden rows -> {OUT}")


if __name__ == "__main__":
    main()
