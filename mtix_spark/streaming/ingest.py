"""Structured Streaming surfaces of the engine.

1. `stream_index_ingest` — incremental index build: a parquet file-source
   stream of new corpus files; each micro-batch becomes one new index
   segment via the same `_build_segment_postings` kernel as the batch build
   (Lucene's model: immutable segments + manifest). Checkpointing makes
   ingestion exactly-once across restarts — the streaming twin of the batch
   build's per-segment resume (BASELINE.json:north_rule).

2. `windowed_event_counts` — watermarked tumbling-window aggregation over an
   event stream (late data dropped after `late_threshold`).

3. `sessionize` — custom stateful operator via applyInPandasWithState:
   session = events of one user with < `gap_s` between consecutive events.

The reference has no streaming at all (SURVEY.md §2 'Categories NOT
present'); these extend the engine to the streaming half of the Spark
surface. Batch-mode twins (same dataflow on a static frame) keep the logic
testable without a streaming sink race.
"""

from __future__ import annotations

import json
import os
import time
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from mtix_spark.corpus import CORPUS_SCHEMA
from mtix_spark.functions.text import content_sha256, tokenize
from mtix_spark.index.build import (
    POSTINGS_SCHEMA,
    IndexPaths,
    _build_segment_postings,
    _commit_manifest,
    read_manifest,
)


def _write_stats_from_manifest(paths: IndexPaths, man: dict) -> dict:
    """stats.json as a pure function of the manifest — recomputable after
    any crash, so stats can never drift from the committed segment set."""
    n = sum(int(s.get("n_docs", 0)) for s in man["segments"].values())
    tok = sum(int(s.get("tokens", 0)) for s in man["segments"].values())
    stats = {
        "n_docs": n,
        "avgdl": (tok / n) if n else 0.0,
        "n_segments": len(man["segments"]),
        "seg_size": None,  # geometry lives in the manifest's per-seg doc ranges
    }
    man["stats"] = stats
    tmp = paths.stats + ".tmp"
    with open(tmp, "w") as f:
        json.dump(stats, f)
    os.replace(tmp, paths.stats)
    return stats


def stream_index_ingest(
    spark: SparkSession,
    input_dir: str,
    index_dir: str,
    checkpoint_dir: str,
    with_positions: bool = False,
):
    """Incremental index ingestion: each micro-batch of new corpus files
    becomes one immutable segment (seg id = micro-batch id offset).

    `with_positions=True` additionally builds the batch's POSITIONAL
    segment inside the same micro-batch (one extra Arrow tokenize pass over
    only the batch's docs) and registers it in `positions_segments` — a
    live-streamed index then serves phrase/NEAR/span queries with no
    separate `build_positions` pass. That matters at corpus scale:
    positionizing a streamed segment after the fact would re-read the WHOLE
    docs relation (build_positions derives geometry from the full frame);
    per-batch build touches only the new rows. Same idempotent-overwrite +
    manifest-last crash discipline as the tf segment.

    docIDs are assigned per-batch above a high-water mark recorded in the
    manifest; global stats (N, avgdl) are maintained incrementally in
    `stats.json` (derived from the manifest, rewritten every batch — even on
    idempotent replays — so a crash between data write and manifest commit
    can never leave them inconsistent). Segment data is written with
    per-segment `overwrite` into `seg=K/`, so a replayed batch after a crash
    in the write window rewrites the same files instead of appending
    duplicates.

    Block-max bounds are built against the running avgdl *including this
    batch* and that avgdl is recorded per segment (`avgdl_build`); the query
    kernel rescales bounds by max(1, avgdl_query/avgdl_build), keeping
    MaxScore pruning sound as the corpus-wide avgdl drifts
    (mtix_spark/index/search.py:_maxscore_kernel).

    The result is a fully queryable index: SegmentSearcher derives each
    segment's (base, n) from the manifest doc ranges, so streaming ids
    (1_000_000+batch) coexist with batch ids. Returns the StreamingQuery.
    """
    paths = IndexPaths(index_dir)
    os.makedirs(index_dir, exist_ok=True)

    stream = (
        spark.readStream.schema(CORPUS_SCHEMA)
        .option("maxFilesPerTrigger", 4)
        .parquet(input_dir)
    )

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        man = read_manifest(paths)
        seg_id = 1_000_000 + batch_id  # streaming segments live above batch ids
        if str(seg_id) in man["segments"]:
            _write_stats_from_manifest(paths, man)  # heal a stale stats.json
            _commit_manifest(paths, man)
            return  # replayed batch after restart — idempotent skip
        rows = batch_df.count()
        if rows == 0:
            return
        hwm = max(
            (s.get("max_doc", -1) for s in man["segments"].values()), default=-1
        )
        from mtix_spark.index.build import assign_doc_ids

        docs = assign_doc_ids(batch_df, 4).withColumn(
            "doc_id", F.col("doc_id") + F.lit(hwm + 1)
        )
        docs = docs.persist()
        agg = docs.agg(
            F.count(F.lit(1)).alias("n"), F.sum("doc_len").alias("tok")
        ).collect()[0]
        n_batch, tok_batch = int(agg["n"]), int(agg["tok"] or 0)
        prev_n = sum(int(s.get("n_docs", 0)) for s in man["segments"].values())
        prev_tok = sum(int(s.get("tokens", 0)) for s in man["segments"].values())
        avgdl_build = (prev_tok + tok_batch) / max(prev_n + n_batch, 1)

        tf = (
            docs.select("doc_id", F.explode(tokenize("content")).alias("term"))
            .groupBy("term", "doc_id")
            .agg(F.count(F.lit(1)).cast("int").alias("tf"))
            .withColumn("seg", F.lit(seg_id))
        )
        dl = docs.select("doc_id", F.col("doc_len").alias("dl"))
        t0 = time.time()
        postings = (
            tf.join(dl, "doc_id")
            .groupBy("seg")
            .applyInPandas(
                lambda pdf: _build_segment_postings(pdf, avgdl_build), POSTINGS_SCHEMA
            )
        )
        # per-segment partition overwrite via the storage seam (idempotent
        # replay; layout identical to the batch build's partitionBy)
        from mtix_spark.table_io import DEFAULT_IO as tio

        tio.overwrite_partition(postings, paths.postings, "seg", seg_id)
        tio.overwrite_partition(
            docs.select(
                "doc_id", F.col("doc_len").alias("dl"),
                "repo", "path", "commit", "lang", "content_sha256",
            ),
            paths.docmap,
            "seg",
            seg_id,
        )
        if with_positions:
            from mtix_spark.index.positions import (
                POSITIONS_SCHEMA,
                _build_segment_positions,
                build_tf_positions,
            )

            tfp = build_tf_positions(docs).withColumn(
                "seg", F.lit(seg_id).cast("int")
            )
            positional = tfp.groupBy("seg").applyInPandas(
                _build_segment_positions, POSITIONS_SCHEMA
            )
            tio.overwrite_partition(
                positional, os.path.join(index_dir, "positions"), "seg", seg_id
            )
            man["positions_segments"] = sorted(
                set(man.get("positions_segments", [])) | {seg_id}
            )
        docs.unpersist()
        # INCREMENTAL dictionary merge: previous version ⊕ this segment's
        # (term, df_seg, cf_seg) delta — per-batch cost ∝ vocabulary + one
        # segment, never the full postings relation. Crash-safe via the
        # version-pointer discipline (write_dictionary_version): the new
        # version dir lands first, the manifest pointer flips in the atomic
        # commit at the end of this batch; a replay after a crash in
        # between recomputes from the UNMOVED pointer and overwrites the
        # same version dir idempotently. Orphan seg dirs can't pollute this
        # derivation — only the new segment's own partition is read.
        sess = batch_df.sparkSession
        from mtix_spark.index.build import read_dictionary, write_dictionary_version

        delta = (
            sess.read.parquet(os.path.join(paths.postings, f"seg={seg_id}"))
            .groupBy("term")
            .agg(F.sum("df_seg").alias("d_df"), F.sum("cf_seg").alias("d_cf"))
        )
        if man["segments"]:  # previous corpus exists → merge
            prev = read_dictionary(sess, paths)
            merged = (
                prev.join(delta, "term", "full_outer")
                .select(
                    "term",
                    (F.coalesce("df", F.lit(0)) + F.coalesce("d_df", F.lit(0))).alias("df"),
                    (F.coalesce("cf", F.lit(0)) + F.coalesce("d_cf", F.lit(0))).alias("cf"),
                )
            )
        else:
            merged = delta.select(
                "term", F.col("d_df").alias("df"), F.col("d_cf").alias("cf")
            )
        write_dictionary_version(merged, paths, man)
        man["segments"][str(seg_id)] = {
            "min_doc": hwm + 1,
            "max_doc": hwm + n_batch,
            "n_docs": n_batch,
            "tokens": tok_batch,
            "avgdl_build": avgdl_build,
            "build_wall_ms": round((time.time() - t0) * 1000, 1),
            "lineage": {"source": "stream", "batch_id": batch_id, "rows": rows},
        }
        _write_stats_from_manifest(paths, man)
        _commit_manifest(paths, man)  # atomic commit point, last

    return (
        stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def windowed_event_counts(events: DataFrame, late_threshold: str = "10 minutes") -> DataFrame:
    """Watermarked tumbling 1-hour counts per event_type. Works identically
    on a readStream frame (late rows dropped) and a static frame (twin)."""
    df = events
    if df.isStreaming:
        df = df.withWatermark("ts", late_threshold)
    return (
        df.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("sum_value"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n", "sum_value")
    )


SESSION_SCHEMA = "user_id long, session_start timestamp, session_end timestamp, n_events int"
_STATE_SCHEMA = "start long, last long, n int"


def _session_fn(
    key, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """applyInPandasWithState kernel: gap-based sessionization (gap 30 min).
    Emits closed sessions; open session rides in state until timeout."""
    gap_us = 30 * 60 * 1_000_000
    (user_id,) = key
    if state.hasTimedOut:
        start, last, n = state.get
        state.remove()
        yield pd.DataFrame(
            {
                "user_id": [user_id],
                "session_start": [pd.Timestamp(start, unit="us")],
                "session_end": [pd.Timestamp(last, unit="us")],
                "n_events": [n],
            }
        )
        return
    ts = []
    for pdf in pdfs:
        ts.extend(int(t.value // 1000) for t in pd.to_datetime(pdf["ts"]))
    ts.sort()
    out = {"user_id": [], "session_start": [], "session_end": [], "n_events": []}
    if state.exists:
        start, last, n = state.get
    else:
        start = last = ts[0]
        n = 0
    for t in ts:
        if t - last > gap_us:
            out["user_id"].append(user_id)
            out["session_start"].append(pd.Timestamp(start, unit="us"))
            out["session_end"].append(pd.Timestamp(last, unit="us"))
            out["n_events"].append(n)
            start, n = t, 0
        last = t
        n += 1
    state.update((start, last, n))
    state.setTimeoutDuration(60 * 60 * 1000)
    if out["user_id"]:
        yield pd.DataFrame(out)


def sessionize(events: DataFrame) -> DataFrame:
    """Custom stateful streaming operator (SURVEY.md §2.B extension):
    per-user gap sessionization via applyInPandasWithState."""
    return events.groupBy("user_id").applyInPandasWithState(
        _session_fn,
        SESSION_SCHEMA,
        _STATE_SCHEMA,
        "append",
        GroupStateTimeout.ProcessingTimeTimeout,
    )


def sessionize_batch(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Batch twin of `sessionize`, pure Catalyst (SQL-expressible, so the
    driver oracle value-checks the session logic the streaming operator
    implements statefully): session boundary where the per-user gap to the
    previous event exceeds `gap_minutes`; session id = running count of
    boundaries. Two window passes over one (user_id, ts) sort — a single
    shuffle keyed by user.

    Returns (user_id, session_id, session_start, session_end, n_events).
    """
    w = Window.partitionBy("user_id").orderBy(F.asc("ts"), F.asc("event_id"))
    gap_s = gap_minutes * 60
    prev = F.lag("ts").over(w)
    # cast NTZ→timestamp→long: only the difference matters, so the session
    # timezone shift cancels
    secs = lambda c: c.cast("timestamp").cast("long")
    boundary = F.when(
        prev.isNull() | ((secs(F.col("ts")) - secs(prev)) > gap_s), 1
    ).otherwise(0)
    wcum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    # two projections: lag must materialize before the cumulative sum
    # (nested window functions are not allowed in one expression)
    sids = (
        events.withColumn("__b", boundary)
        .withColumn("session_id", F.sum("__b").over(wcum))
        .drop("__b")
    )
    return sids.groupBy("user_id", "session_id").agg(
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
    )


def stream_dedup(
    docs: DataFrame,
    key_col: str = "content_sha256",
    event_col: str = "event_time",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Streaming exact dedup: keep the FIRST arrival of each content hash,
    drop every later duplicate (the streaming twin of
    `dedup.exact_dedup_groups`, and the front gate a continuous ingestion
    pipeline puts before `stream_index_ingest` so re-crawled bytes never
    become postings).

    `dropDuplicates` over a watermarked stream bounds the dedup state:
    keys older than the watermark are evicted, so state is proportional
    to the watermark window's key cardinality, not the corpus — the only
    state discipline that survives 10^12 cumulative docs. Within the
    window the guarantee is exact; a duplicate arriving after eviction
    re-enters (cross-window dedup belongs to the batch operators over the
    landed table)."""
    return docs.withWatermark(event_col, watermark).dropDuplicates(
        [key_col]
    )
