"""Local stand-in for the driver's correctness gate: run every queries()
entry on Spark and its oracle_sql() twin on DuckDB over the same parquet
tables, compare row count, column names, and order-insensitive values.

Canonicalization mirrors the DRIVER's pandas path (VERDICT r02 ask #8):
both sides go through pandas, columns sorted by name, then a
``sort_values`` over ALL columns — which raises ``TypeError: unhashable
type`` on list/array cells exactly like the driver's canonicalizer did on
r02's ``positional_postings``. Entries must therefore emit only scalar
columns; array-typed Spark output columns are rejected up front.

Usage: python tools/check_entries.py [sf_dir] [only_entry ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import duckdb  # noqa: E402
import numpy as np  # noqa: E402
import pandas as pd  # noqa: E402

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]

# pandas dtype kinds the driver's schema hash distinguishes; both engines'
# outputs are mapped here so int32-vs-int64 etc. fail loudly
_KIND = {
    "int8": "i8", "int16": "i16", "int32": "i32", "int64": "i64",
    "Int8": "i8", "Int16": "i16", "Int32": "i32", "Int64": "i64",
    "uint8": "i8", "uint16": "i16", "uint32": "i32", "uint64": "i64",
    "float32": "f", "float64": "f", "bool": "b", "boolean": "b",
    "object": "o", "string": "o",
}


def _canon_frame(df: pd.DataFrame, name: str) -> pd.DataFrame:
    """Driver-shaped canonical form: name-sorted columns, floats rounded to
    6dp, full-column sort_values (raises on unhashable cells), fresh index."""
    cols = sorted(df.columns)
    df = df[cols].copy()
    for c in cols:
        if df[c].dtype.kind == "f":
            df[c] = df[c].round(6)
        elif df[c].dtype == object:
            # reject list/array/dict cells the way the driver dies on them,
            # but with a readable message naming the entry and column
            bad = df[c].map(lambda v: isinstance(v, (list, dict, np.ndarray)))
            if bad.any():
                raise TypeError(
                    f"{name}: column {c!r} holds unhashable "
                    f"{type(df[c][bad.idxmax()]).__name__} cells — the "
                    "driver's canonicalizer cannot hash these; emit a "
                    "scalar (e.g. array_join) instead"
                )
    if len(df):
        df = df.sort_values(by=cols, kind="mergesort")
    return df.reset_index(drop=True)


def _kinds(df: pd.DataFrame) -> dict[str, str]:
    return {c: _KIND.get(str(df[c].dtype), str(df[c].dtype)) for c in df.columns}


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    import __spark_entry__ as e
    from flagembedding_spark.session import get_spark

    spark = get_spark("check-entries", master="local[8]", shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    queries, oracles = e.queries(), e.oracle_sql()

    # Registry-order contract (VERDICT r03 ask #1): the driver verifies only
    # the first DRIVER_WINDOW keys; assert nothing outside STABLE_TAIL was
    # displaced past the window, and show the window so drift is visible.
    from flagembedding_spark.registry_order import DRIVER_WINDOW, check_window

    keys = list(queries)
    violations = check_window(keys)
    in_window = keys[:DRIVER_WINDOW]
    print(f"driver window (first {DRIVER_WINDOW} of {len(keys)}): {in_window}")
    print(f"outside window (stable tail): {keys[DRIVER_WINDOW:]}")
    if violations:
        print(f"FAIL registry-order: non-tail entries outside window: {violations}")
        return 1

    failures = 0
    for name, fn in queries.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            # driver fidelity: any array/map column in the Spark schema is a
            # guaranteed driver crash — fail before even collecting
            for f_ in sdf.schema.fields:
                t = f_.dataType.simpleString()
                if t.startswith(("array", "map", "struct")):
                    raise TypeError(
                        f"output column {f_.name!r} has non-scalar type {t}"
                    )
            spd = _canon_frame(sdf.toPandas(), name)
        except Exception as ex:
            print(f"FAIL {name}: spark error {ex}")
            failures += 1
            continue
        if name not in oracles:
            print(f"ok   {name}: rows={len(spd)} (no oracle — rows-only)")
            continue
        try:
            dpd = _canon_frame(con.execute(oracles[name]).df(), name)
        except Exception as ex:
            print(f"FAIL {name}: duckdb error {ex}")
            failures += 1
            continue
        if sorted(spd.columns) != sorted(dpd.columns):
            print(f"FAIL {name}: columns {list(spd.columns)} vs {list(dpd.columns)}")
            failures += 1
            continue
        sk, dk = _kinds(spd), _kinds(dpd)
        # duckdb count() returns int64 like spark's; int-width mismatches are
        # real driver schema-hash risks → fail, not warn
        width_bad = [
            c for c in spd.columns
            if sk[c] != dk[c] and not (
                # NULL-able duckdb ints come back float64 with NaN — allow
                # when the spark side is int and values match after cast
                {sk[c], dk[c]} <= {"f", "i32", "i64"} and "f" in (sk[c], dk[c])
            )
        ]
        if width_bad:
            print(
                f"FAIL {name}: dtype mismatch "
                f"{[f'{c}: spark={sk[c]} duckdb={dk[c]}' for c in width_bad]}"
            )
            failures += 1
            continue
        if len(spd) != len(dpd):
            print(f"FAIL {name}: rowcount {len(spd)} vs {len(dpd)}")
            failures += 1
            continue
        # value compare on the canonical frames (floats already 6dp-rounded;
        # int-vs-float columns compared as float)
        mismatch = None
        for c in spd.columns:
            a, b = spd[c], dpd[c]
            if "f" in (sk[c], dk[c]):
                ok = np.allclose(
                    a.astype("float64").fillna(np.nan),
                    b.astype("float64").fillna(np.nan),
                    rtol=0, atol=1e-6, equal_nan=True,
                )
            else:
                ok = a.equals(b) or (a.astype(str).values == b.astype(str).values).all()
            if not ok:
                d = a.astype(str).values != b.astype(str).values
                i = int(np.argmax(d))
                mismatch = f"col {c!r} row {i}: {a.iloc[i]!r} vs {b.iloc[i]!r}"
                break
        if mismatch:
            print(f"FAIL {name}: value mismatch — {mismatch}")
            failures += 1
        else:
            print(f"ok   {name}: rows={len(spd)} cols={sorted(spd.columns)}")
    spark.stop()
    return failures


if __name__ == "__main__":
    raise SystemExit(main())
