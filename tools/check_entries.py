"""Local stand-in for the driver's correctness gate: run every queries()
entry on Spark and its oracle_sql() twin on DuckDB over the same parquet
tables, compare row count, column names, and order-insensitive values.

Usage: python tools/check_entries.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import duckdb  # noqa: E402

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def canon(v):
    if isinstance(v, float):
        return round(v, 6)
    if hasattr(v, "__float__") and type(v).__name__ == "Decimal":
        return round(float(v), 6)
    return v


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    import __spark_entry__ as e
    from flagembedding_spark.session import get_spark

    spark = get_spark("check-entries", master="local[8]", shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    queries, oracles = e.queries(), e.oracle_sql()
    failures = 0
    for name, fn in queries.items():
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = sorted(
                tuple(canon(v) for v in row) for row in sdf.collect()
            )
        except Exception as ex:
            print(f"FAIL {name}: spark error {ex}")
            failures += 1
            continue
        if name not in oracles:
            print(f"ok   {name}: rows={len(srows)} (no oracle — rows-only)")
            continue
        try:
            res = con.execute(oracles[name])
            dcols = [d[0] for d in res.description]
            drows = sorted(tuple(canon(v) for v in r) for r in res.fetchall())
        except Exception as ex:
            print(f"FAIL {name}: duckdb error {ex}")
            failures += 1
            continue
        # driver sorts columns by name before hashing — do the same
        sidx = sorted(range(len(scols)), key=lambda i: scols[i])
        didx = sorted(range(len(dcols)), key=lambda i: dcols[i])
        if sorted(scols) != sorted(dcols):
            print(f"FAIL {name}: columns {scols} vs {dcols}")
            failures += 1
            continue
        # coarse dtype compatibility (int32 vs int64 etc. would fail a strict
        # schema hash): map both sides to {int32,int64,float,str,other}
        spark_kind = {
            "int": "int32", "bigint": "int64", "double": "float",
            "float": "float", "string": "str", "decimal": "other",
        }
        duck_kind = {
            "INTEGER": "int32", "BIGINT": "int64", "HUGEINT": "hugeint",
            "DOUBLE": "float", "FLOAT": "float", "VARCHAR": "str",
        }
        skinds = {
            f.name: spark_kind.get(f.dataType.simpleString().split("(")[0], "other")
            for f in sdf.schema.fields
        }
        dkinds = {
            d[0]: duck_kind.get(str(res.description[i][1]).split(".")[-1].upper(), None)
            for i, d in enumerate(res.description)
        }
        type_notes = [
            f"{c}: spark={skinds[c]}"
            for c in scols
            if dkinds.get(c) is not None and skinds[c] != dkinds[c]
        ]
        if type_notes:
            print(f"WARN {name}: dtype mismatch {type_notes}")
        s2 = sorted(tuple(r[i] for i in sidx) for r in srows)
        d2 = sorted(tuple(r[i] for i in didx) for r in drows)
        if len(s2) != len(d2):
            print(f"FAIL {name}: rowcount {len(s2)} vs {len(d2)}")
            failures += 1
        elif s2 != d2:
            diff = [(a, b) for a, b in zip(s2, d2) if a != b][:3]
            print(f"FAIL {name}: value mismatch, e.g. {diff}")
            failures += 1
        else:
            print(f"ok   {name}: rows={len(s2)} cols={sorted(scols)}")
    spark.stop()
    return failures


if __name__ == "__main__":
    raise SystemExit(main())
