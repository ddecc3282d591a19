"""Sequence packing and deterministic training order — the two operators
that turn a cleaned document corpus into model-ready training shards.

`pack_sequences` is GPT-style concat-and-chunk: lay every document's
tokens end-to-end in a deterministic total order (doc_id) and cut the
stream into fixed-length sequences. Each document's placement is a pure
function of the corpus (its global token offset), so the packing is
identical at any parallelism — the property a resumable 10^12-file job
needs. The reference has no training-side operators at all (it's an
inference pipeline, /root/reference/src/mtix/pipelines.py); this is part
of the large-scale-pipeline extension surface the brief asks for.

Scale shape: the global token prefix-sum is computed the same way
`index.build.assign_doc_ids` computes dense doc ids — range-partition by
doc_id, a per-partition running sum carried across Arrow batches in ONE
mapInPandas pass (no shuffle of the rows), then a tiny per-partition
total table collected (n_partitions rows, bounded) and broadcast back as
offsets. Nothing global ever sorts or collects; the only shuffle is the
range partitioning of an (id, count) pair — 16 bytes/row.

`training_order` is the seeded deterministic shuffle: shard and order by
a content-stable md5 hash (same construction as `sampling.hash_bucket`),
so every re-run — and every cluster size — reads the identical training
stream. Epoch reshuffles are just a different salt.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from mtix_spark.functions.text import tokenize
from mtix_spark.sampling import BUCKETS, hash_bucket


def _doc_token_offsets(
    docs: DataFrame, id_col: str, text_col: str, n_parts: int
) -> DataFrame:
    """(doc_id, n_tok, start_tok) — each doc's global token offset in the
    doc_id-ordered concatenation. Two-phase prefix sum, parallelism-
    invariant (start_tok = sum of n_tok over all smaller doc_ids)."""
    spark = docs.sparkSession
    d = (
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.size(tokenize(F.col(text_col))).cast("long").alias("n_tok"),
        )
        .filter(F.col("n_tok") > 0)
        .repartitionByRange(n_parts, "doc_id")
        .sortWithinPartitions("doc_id")
    )

    def cumsum(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # batches arrive in row order within the partition; carry the
        # running total across them
        carry = 0
        for pdf in it:
            c = pdf["n_tok"].cumsum()
            pdf = pdf.assign(part_cum=c - pdf["n_tok"] + carry)
            carry += int(pdf["n_tok"].sum())
            yield pdf[["doc_id", "n_tok", "pid", "part_cum"]]

    with_pid = d.withColumn("pid", F.spark_partition_id())
    local = with_pid.mapInPandas(
        cumsum, "doc_id long, n_tok long, pid int, part_cum long"
    )
    # per-partition totals: map-side partial agg -> n_parts rows on the
    # driver (bounded metadata, not data)
    totals = (
        with_pid.groupBy("pid")
        .agg(F.sum("n_tok").alias("tot"), F.min("doc_id").alias("mn"))
        .collect()
    )
    rows, acc = [], 0
    for r in sorted(totals, key=lambda r: r["mn"]):  # range parts ascend
        rows.append((r["pid"], acc))
        acc += int(r["tot"])
    off = docs.sparkSession.createDataFrame(rows, "pid int, off long")
    return (
        local.join(F.broadcast(off), "pid")
        .select(
            "doc_id",
            "n_tok",
            (F.col("off") + F.col("part_cum")).alias("start_tok"),
        )
    )


def pack_sequences(
    docs: DataFrame,
    seq_len: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_parts: int | None = None,
) -> DataFrame:
    """(doc_id, n_tok, start_tok, first_chunk, last_chunk) — concat-and-
    chunk packing: the token stream in doc_id order, cut every `seq_len`
    tokens. A doc spans chunks floor(start/L)..floor((start+n-1)/L);
    empty docs pack nowhere and are dropped."""
    spark = docs.sparkSession
    n_parts = n_parts or spark.sparkContext.defaultParallelism
    offs = _doc_token_offsets(docs, id_col, text_col, n_parts)
    return offs.select(
        "doc_id",
        "n_tok",
        "start_tok",
        F.floor(F.col("start_tok") / seq_len).cast("long").alias("first_chunk"),
        F.floor((F.col("start_tok") + F.col("n_tok") - 1) / seq_len)
        .cast("long")
        .alias("last_chunk"),
    )


def pack_chunks(
    docs: DataFrame,
    seq_len: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_parts: int | None = None,
) -> DataFrame:
    """(chunk_id, n_docs, n_tok) — per-chunk census of the packing: how
    many docs contribute and how many tokens land in each fixed-length
    sequence (== seq_len everywhere but the final chunk). The explode is
    bounded: a doc emits one row per chunk it TOUCHES (≈ n_tok/seq_len
    rows), never one per token."""
    p = pack_sequences(docs, seq_len, id_col, text_col, n_parts)
    spans = p.select(
        "doc_id",
        "start_tok",
        "n_tok",
        F.explode(F.sequence("first_chunk", "last_chunk")).alias("chunk_id"),
    )
    in_chunk = F.least(
        F.col("start_tok") + F.col("n_tok"), (F.col("chunk_id") + 1) * seq_len
    ) - F.greatest(F.col("start_tok"), F.col("chunk_id") * seq_len)
    return (
        spans.withColumn("tok_in_chunk", in_chunk)
        .groupBy("chunk_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("tok_in_chunk").cast("long").alias("n_tok"),
        )
    )


def training_order(
    docs: DataFrame,
    n_shards: int,
    salt: str = "",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, shard, pos) — seeded deterministic global shuffle split
    into `n_shards` reader shards. shard and position derive from the
    md5 hash-bucket of (salt || doc_id): same data + same salt → the
    identical training stream on any cluster, any run; a new epoch is a
    new salt. Tie-break on doc_id makes the order total.

    The per-shard position is a window row_number keyed by shard — at
    scale each shard sorts independently (shuffle keyed by shard, ~1/n
    of the ids each), never a global sort."""
    b = hash_bucket(id_col, salt)
    w = Window.partitionBy("shard").orderBy("bucket", "doc_id")
    return (
        docs.select(
            F.col(id_col).alias("doc_id"),
            (b % n_shards).cast("long").alias("shard"),
            b.alias("bucket"),
        )
        .withColumn("pos", F.row_number().over(w).cast("long"))
        .select("doc_id", "shard", "pos")
    )
