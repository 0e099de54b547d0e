"""Search-result sink/scan with a metadata envelope + consistency check (S8).

The reference serializes search results with an envelope
``{eval_name, model_name, reranker_name, split, dataset_name, search_results}``
(abc/evaluation/evaluator.py:266-299) and validates envelope consistency when
reusing cached results (evaluator.py:37-78). Here: results go to parquet, the
envelope to a JSON manifest next to them; the loader re-validates.
"""

from __future__ import annotations

import json
import os
from dataclasses import asdict, dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass
class ResultEnvelope:
    eval_name: str
    model_name: str
    reranker_name: str | None
    split: str
    dataset_name: str


class ManifestMismatch(ValueError):
    pass


def save_results(results: DataFrame, root: str, envelope: ResultEnvelope) -> None:
    results.write.mode("overwrite").parquet(f"{root}/results")
    os.makedirs(root, exist_ok=True)
    with open(f"{root}/manifest.json", "w") as f:
        json.dump(asdict(envelope), f)


def load_results(
    spark: SparkSession, root: str, expect: ResultEnvelope | None = None
) -> tuple[DataFrame, ResultEnvelope]:
    with open(f"{root}/manifest.json") as f:
        meta = json.load(f)
    env = ResultEnvelope(**meta)
    if expect is not None:
        # the reference's check (evaluator.py:37-78): every envelope field of
        # a cached result must match the requested evaluation
        for field in ("eval_name", "model_name", "reranker_name", "split", "dataset_name"):
            if getattr(env, field) != getattr(expect, field):
                raise ManifestMismatch(
                    f"cached results {field}={getattr(env, field)!r} != "
                    f"expected {getattr(expect, field)!r}"
                )
    return spark.read.parquet(f"{root}/results"), env
