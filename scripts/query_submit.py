"""spark-submit entrypoint: BM25 top-k queries against a built index.

    spark-submit --py-files mtix_spark.zip scripts/query_submit.py \
        --index <index dir> --queries <json file: [[id, "text"], ...]> \
        [--k 100] [--output <parquet dir>] \
        [--min-match M] [--dl-factor log1p_dl] [--dis-max-tie T]

Prints per-query latency stats (p50/p95) and writes results if --output.
--min-match / --dl-factor run the count-aware / boost-aware MaxScore
kernel; --dis-max-tie switches to DisjunctionMax scoring (mutually
exclusive with the other two — dis_max is its own kernel).
"""

from __future__ import annotations

import argparse
import json
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--index", required=True)
    ap.add_argument("--queries", required=True)
    ap.add_argument("--k", type=int, default=100)
    ap.add_argument("--output")
    ap.add_argument("--per-query-latency", action="store_true")
    ap.add_argument("--min-match", type=int, default=1)
    ap.add_argument("--dl-factor")
    ap.add_argument("--dis-max-tie", type=float)
    args = ap.parse_args()
    if args.dis_max_tie is not None and (args.min_match > 1 or args.dl_factor):
        ap.error("--dis-max-tie cannot combine with --min-match/--dl-factor")

    from pyspark.sql import SparkSession

    from mtix_spark.index.build import IndexPaths
    from mtix_spark.index.search import SegmentSearcher

    spark = SparkSession.builder.appName("mtix-query").getOrCreate()
    with open(args.queries) as f:
        qset = [(int(q), str(t)) for q, t in json.load(f)]

    searcher = SegmentSearcher(spark, IndexPaths(args.index))
    searcher.search(qset[:1], k=1).collect()  # warm
    if args.dis_max_tie is not None:
        def run(qs, k):
            return searcher.search_dis_max(qs, k=k, tie_breaker=args.dis_max_tie)
    else:
        def run(qs, k):
            return searcher.search(
                qs, k=k, min_match=args.min_match, dl_factor=args.dl_factor
            )
    t0 = time.time()
    res = run(qset, args.k)
    if args.output:
        res.write.mode("overwrite").parquet(args.output)
        n = spark.read.parquet(args.output).count()
    else:
        n = len(res.collect())
    batch_s = time.time() - t0

    stats = {"n_queries": len(qset), "result_rows": n, "batch_s": round(batch_s, 2),
             "queries_per_sec": round(len(qset) / batch_s, 1)}
    if args.per_query_latency:
        lat = []
        # every mode probes through search_topk (driver-side merge, one
        # Spark job) so p50/p95 are comparable across modes — dis_max
        # included (search_topk grew a dis_max_tie kernel switch for this)
        for q in qset[: min(len(qset), 20)]:
            t1 = time.time()
            searcher.search_topk([q], k=args.k,
                                 min_match=args.min_match,
                                 dl_factor=args.dl_factor,
                                 dis_max_tie=args.dis_max_tie)
            lat.append((time.time() - t1) * 1000)
        lat.sort()
        stats["p50_ms"] = round(lat[len(lat) // 2], 1)
        stats["p95_ms"] = round(lat[int(0.95 * len(lat)) - 1], 1)
    print(json.dumps(stats))
    spark.stop()


if __name__ == "__main__":
    main()
