"""spark-submit entrypoint: build (or resume) the inverted index.

    spark-submit --py-files mtix_spark.zip scripts/build_index_submit.py \
        --input  <parquet dir: repo,path,commit,lang,content> \
        --output <index dir> [--segments 64] [--no-resume] [--merge]

On a cluster, master/executors come from spark-submit conf; locally the
session factory defaults to local[$SPARK_GRAFT_CPUS]. The build is
idempotent per segment (manifest-committed) — re-submitting after a failure
resumes from the completed segments (BASELINE.json:north_rule).
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--segments", type=int, default=64)
    ap.add_argument("--no-resume", action="store_true")
    ap.add_argument("--merge", action="store_true", help="also build global term-merged lists")
    ap.add_argument("--verify-sha", action="store_true", help="assert per-row sha256 vs source")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from mtix_spark.index.build import (
        assign_doc_ids,
        build_index,
        merge_postings,
        read_manifest,
        verify_sha256,
    )

    spark = SparkSession.builder.appName("mtix-index-build").getOrCreate()
    t0 = time.time()
    corpus = spark.read.parquet(args.input)
    docs = assign_doc_ids(corpus)
    paths = build_index(
        spark, docs, args.output, n_segments=args.segments, resume=not args.no_resume
    )
    if args.verify_sha:
        bad = verify_sha256(spark.read.parquet(paths.docmap).join(
            corpus, ["repo", "path", "commit"]).select(
            "repo", "path", "commit", "content_sha256"), corpus)
        if bad:
            print(f"FATAL: {bad} rows violate the sha256 invariant", file=sys.stderr)
            sys.exit(2)
    if args.merge:
        merge_postings(spark, paths)
    man = read_manifest(paths)
    n_docs = man["stats"]["n_docs"]
    wall = time.time() - t0
    print(json.dumps({
        "n_docs": n_docs,
        "n_segments": len(man["segments"]),
        "wall_s": round(wall, 2),
        "files_per_sec": round(n_docs / wall, 1),
        "index": args.output,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
