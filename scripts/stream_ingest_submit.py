"""spark-submit entrypoint: streaming index ingestion.

    spark-submit --py-files mtix_spark.zip scripts/stream_ingest_submit.py \
        --input <parquet dir being appended to> --index <index dir> \
        --checkpoint <ckpt dir> [--with-positions] [--continuous]

Default is one availableNow pass (drain whatever is new, then exit — the
cron/Airflow-shaped deployment); --continuous keeps the query running until
killed. Either way ingestion is exactly-once across restarts: the
checkpoint replays any in-flight batch and per-segment overwrites plus the
manifest-last commit make the replay idempotent (see
mtix_spark/streaming/ingest.py).
"""

from __future__ import annotations

import argparse
import json
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--index", required=True)
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--with-positions", action="store_true")
    ap.add_argument("--continuous", action="store_true")
    ap.add_argument("--timeout-s", type=int, default=3600)
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from mtix_spark.index.build import IndexPaths, read_manifest
    from mtix_spark.streaming.ingest import stream_index_ingest

    spark = SparkSession.builder.appName("mtix-stream-ingest").getOrCreate()
    t0 = time.time()
    q = stream_index_ingest(
        spark,
        args.input,
        args.index,
        args.checkpoint,
        with_positions=args.with_positions,
    )
    if args.continuous:
        q.awaitTermination()
    else:
        q.awaitTermination(args.timeout_s)
        q.stop()
    man = read_manifest(IndexPaths(args.index))
    print(
        json.dumps(
            {
                "segments": len(man["segments"]),
                "n_docs": sum(int(s.get("n_docs", 0)) for s in man["segments"].values()),
                "positions_segments": len(man.get("positions_segments", [])),
                "dictionary_version": man.get("dictionary_version"),
                "wall_s": round(time.time() - t0, 2),
                "index": args.index,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
