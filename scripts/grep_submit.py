"""spark-submit entrypoint: trigram-index code grep.

    # one-time: build the trigram index next to the corpus
    spark-submit --py-files mtix_spark.zip scripts/grep_submit.py \
        --input <parquet dir> --index <dir> --build

    # substring grep (add --icase for case-insensitive smart-case classes)
    spark-submit --py-files mtix_spark.zip scripts/grep_submit.py \
        --input <parquet dir> --index <dir> --needles needles.json \
        --output <dir> [--icase]

    # regex grep (rlike partial-match semantics; literal-free patterns
    # fall back to a documented verify scan)
    spark-submit --py-files mtix_spark.zip scripts/grep_submit.py \
        --input <parquet dir> --index <dir> --patterns patterns.json \
        --output <dir>

needles.json / patterns.json: [[query_id, "needle-or-pattern"], ...].
Input needs (doc_id long, content string) — e.g. assign_doc_ids output
written to parquet. Output rows are (query_id, doc_id[, n_occ]) parquet.
See mtix_spark/index/trigram.py for the pruning design (rarest-gram AND,
mandatory-literal extraction, gram-variant case classes).
"""

from __future__ import annotations

import argparse
import json
import os
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--index", required=True)
    ap.add_argument("--build", action="store_true",
                    help="(re)build the trigram index, then exit")
    ap.add_argument("--needles", help="JSON [[qid, needle], ...]")
    ap.add_argument("--patterns", help="JSON [[qid, pattern], ...]")
    ap.add_argument("--icase", action="store_true",
                    help="case-insensitive substring grep")
    ap.add_argument("--no-counts", action="store_true",
                    help="substring mode: emit matches only, skip n_occ")
    ap.add_argument("--output")
    ap.add_argument("--segments", type=int, default=16)
    args = ap.parse_args()
    if not args.build and not (args.needles or args.patterns):
        ap.error("need --build, --needles or --patterns")
    if (args.needles or args.patterns) and not args.output:
        ap.error("--output required for grep runs")

    from pyspark.sql import SparkSession

    from mtix_spark.index.trigram import (
        TrigramPaths,
        build_trigram_index,
        grep_regex,
        grep_substring,
    )

    spark = SparkSession.builder.appName("mtix-grep").getOrCreate()
    docs = spark.read.parquet(args.input).select("doc_id", "content")
    paths = TrigramPaths(args.index)

    if args.build or not os.path.exists(paths.meta):
        t0 = time.time()
        paths = build_trigram_index(spark, docs, args.index, n_segments=args.segments)
        print(json.dumps({"built": args.index,
                          "build_s": round(time.time() - t0, 2)}))
        if args.build:
            spark.stop()
            return

    stats = {}
    t0 = time.time()
    if args.needles:
        with open(args.needles) as f:
            needles = [(int(q), str(s)) for q, s in json.load(f)]
        res = grep_substring(
            spark, paths, docs, needles,
            count_occurrences=not args.no_counts,
            case_insensitive=args.icase,
        )
        stats["mode"], stats["n_queries"] = "substring", len(needles)
    else:
        with open(args.patterns) as f:
            patterns = [(int(q), str(p)) for q, p in json.load(f)]
        res = grep_regex(spark, paths, docs, patterns)
        stats["mode"], stats["n_queries"] = "regex", len(patterns)
    res.write.mode("overwrite").parquet(args.output)
    stats["result_rows"] = spark.read.parquet(args.output).count()
    stats["grep_s"] = round(time.time() - t0, 2)
    print(json.dumps(stats))
    spark.stop()


if __name__ == "__main__":
    main()
