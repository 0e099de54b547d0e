"""spark-submit entry: document delete lifecycle over a persisted segment
store — tombstone, inspect, and compact (the Lucene delete/expungeDeletes
flow, see operators/deletes.py for the semantics).

Cluster launch (the north-rule deployment shape):

    spark-submit --py-files dist/flagembedding_spark.zip \
        jobs/delete_job.py --store s3://bucket/bm25-index/segments \
        tombstone --docids 17,42,93

    spark-submit --py-files dist/flagembedding_spark.zip \
        jobs/delete_job.py --store .../segments \
        compact --output .../segments-compacted

Local smoke:

    python jobs/delete_job.py --store /tmp/store tombstone --docids 1,2
    python jobs/delete_job.py --store /tmp/store status
    python jobs/delete_job.py --store /tmp/store compact --output /tmp/out

Prints ONE JSON status line (the jobs/ contract).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--store", required=True, help="segment store root")
    sub = ap.add_subparsers(dest="cmd", required=True)
    t = sub.add_parser("tombstone", help="mark docids deleted (live)")
    t.add_argument("--docids", required=True,
                   help="comma-separated docids, or @file with one per line")
    sub.add_parser("status", help="report tombstone count + store meta")
    sub.add_parser("clear", help="drop all tombstones (undelete)")
    c = sub.add_parser("compact", help="expunge deletes into a new store")
    c.add_argument("--output", required=True)
    c.add_argument("--cpus", type=int, default=0,
                   help="local[<n>] when not under spark-submit (0 = all)")
    args = ap.parse_args()

    from flagembedding_spark.operators.deletes import (
        clear_tombstones,
        compact_store,
        load_tombstones,
        write_tombstones,
    )

    t0 = time.perf_counter()
    out: dict = {"job": "delete", "cmd": args.cmd, "store": args.store}
    if args.cmd == "tombstone":
        if args.docids.startswith("@"):
            with open(args.docids[1:]) as f:
                ids = [int(x) for x in f.read().split()]
        else:
            ids = [int(x) for x in args.docids.split(",") if x]
        merged = write_tombstones(args.store, ids)
        out.update(added=len(ids), total_tombstones=int(merged.size))
    elif args.cmd == "status":
        with open(f"{args.store}/meta.json") as f:
            meta = json.load(f)
        out.update(
            tombstones=int(load_tombstones(args.store).size),
            n_docs=meta["n_docs"],
            layout=meta.get("layout", "term"),
            has_positions=meta.get("has_positions", False),
        )
    elif args.cmd == "clear":
        n = int(load_tombstones(args.store).size)
        clear_tombstones(args.store)
        out.update(cleared=n)
    else:  # compact
        from flagembedding_spark.session import get_spark

        n = args.cpus or (os.cpu_count() or 4)
        spark = get_spark(
            "delete-compact", master=f"local[{n}]",
            shuffle_partitions=max(n, 8),
        )
        try:
            dead = int(load_tombstones(args.store).size)
            compacted = compact_store(spark, args.store, args.output)
            out.update(
                output=args.output,
                expunged=dead,
                n_docs=compacted.stats.n_docs,
                avgdl=round(compacted.stats.avgdl, 6),
            )
        finally:
            spark.stop()
    out["sec"] = round(time.perf_counter() - t0, 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
