"""spark-submit entrypoint: percolate (reverse search / ingest routing).

    # batch: route an existing doc table through the stored queries
    spark-submit --py-files mtix_spark.zip scripts/percolate_submit.py \
        --input <parquet dir> --queries queries.json --output <dir>

    # streaming: route files as they land (availableNow drain by default,
    # --continuous to keep running; exactly-once via the checkpoint)
    spark-submit --py-files mtix_spark.zip scripts/percolate_submit.py \
        --input <parquet dir> --queries queries.json --output <dir> \
        --stream --checkpoint <ckpt dir> [--continuous]

queries.json is a list of stored-query objects:
    [{"query_id": 1, "mode": "all",    "terms": ["merge", "batch"]},
     {"query_id": 2, "mode": "min",    "terms": ["a","b","c"], "min_match": 2,
      "must_not": ["slow"]},
     {"query_id": 3, "mode": "phrase", "phrase": "merge batch"}]

Output rows are (query_id, doc_id, n_matched) parquet. See
mtix_spark/percolate.py for the matching semantics and the scale shape
(broadcast query terms; the corpus never shuffles on anything
query-dependent).
"""

from __future__ import annotations

import argparse
import json
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--queries", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--id-col", default="doc_id")
    ap.add_argument("--text-col", default="text")
    ap.add_argument("--no-broadcast", action="store_true",
                    help="shuffle-join the query terms (oversized query sets)")
    ap.add_argument("--stream", action="store_true")
    ap.add_argument("--checkpoint", help="required with --stream")
    ap.add_argument("--continuous", action="store_true")
    ap.add_argument("--timeout-s", type=int, default=3600)
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from mtix_spark.percolate import (
        StoredQuery,
        percolate,
        percolate_stream,
        queries_df,
    )

    with open(args.queries) as f:
        specs = [
            StoredQuery(
                query_id=int(s["query_id"]),
                mode=s.get("mode", "all"),
                terms=s.get("terms", ()),
                must_not=s.get("must_not", ()),
                min_match=int(s.get("min_match", 1)),
                phrase=s.get("phrase"),
            )
            for s in json.load(f)
        ]

    spark = SparkSession.builder.appName("mtix-percolate").getOrCreate()
    qs = queries_df(spark, specs)
    t0 = time.time()
    if args.stream:
        if not args.checkpoint:
            raise SystemExit("--stream requires --checkpoint")
        static = spark.read.parquet(args.input)
        stream = spark.readStream.schema(static.schema).parquet(args.input)
        q = percolate_stream(
            stream, qs, args.output, args.checkpoint,
            id_col=args.id_col, text_col=args.text_col,
        )
        if args.continuous:
            q.awaitTermination()
        else:
            q.awaitTermination(args.timeout_s)
            q.stop()
    else:
        out = percolate(
            spark.read.parquet(args.input), qs,
            id_col=args.id_col, text_col=args.text_col,
            broadcast_queries=not args.no_broadcast,
        )
        out.write.mode("overwrite").parquet(args.output)
    n = spark.read.parquet(args.output).count()
    print(
        json.dumps(
            {
                "n_queries": len(specs),
                "match_rows": n,
                "wall_s": round(time.time() - t0, 2),
                "mode": "stream" if args.stream else "batch",
                "output": args.output,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
