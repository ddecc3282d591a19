"""Inverted-index build: docIDs, term stats, posting-list segments.

Scale design (the point of this engine — BASELINE.json:north_rule):

- **Deterministic dense docIDs without a global-sort bottleneck.** A naive
  `row_number() OVER (ORDER BY ...)` funnels 100 TB through one reducer.
  Instead: range-repartition by the natural key, sort within partitions,
  count per partition (cheap agg), then assign `offset[pid] + local_index`
  inside mapInPandas. The id of a row is its rank in the total order — a pure
  function of the data, invariant to partition boundaries and parallelism
  (required for rank-identical results at N vs 4N executors).

- **Doc-partitioned segments.** Docs are split into contiguous doc_id ranges
  ("segments", the Lucene model). Each segment's posting lists are built in
  one applyInPandas group: numpy sort by (term, doc_id), delta+varint encode,
  per-block (128-entry) BM25 upper bounds. Segments are doc-range-disjoint,
  so the later term-merge is an ordered concat, never a re-sort.

- **Checkpoint/resume.** Each segment is written under `seg=K/` with a
  manifest row (lineage: doc_id range, token/posting counts, wall ms)
  committed only after the data lands. A re-run skips completed segments
  (idempotent dynamic-partition overwrite) — kill/resume yields a
  byte-identical index (tested).

Reference parity: this whole module replaces mtix's remote candidate-lookup
service (/root/reference/src/mtix/predictors.py:22-35) with an explicit
posting-list pipeline; the batching discipline mirrors its 128-row endpoint
batches (/root/reference/src/mtix/endpoints.py:56-67) as Arrow record batches.
"""

from __future__ import annotations

import json
import os
import time
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark import StorageLevel, TaskContext
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mtix_spark.functions.text import content_sha256, tokenize
from mtix_spark.index.codec import delta_encode, encode_varint

K1 = 1.2
B = 0.75
BLOCK_SIZE = 128  # postings per block-max block (mirrors mtix batch=128)

DOCS_SCHEMA = (
    "doc_id long, repo string, path string, commit string, lang string, "
    "content string, content_sha256 string, doc_len int"
)

POSTINGS_SCHEMA = (
    "term string, seg int, df_seg int, doc_ids_bin binary, tfs_bin binary, "
    "max_tf int, block_max_wtf array<float>, min_doc long, max_doc long"
)


def assign_doc_ids(corpus: DataFrame, n_parts: int | None = None) -> DataFrame:
    """corpus(repo,path,commit,lang,content) -> docs with dense doc_id.

    doc_id = rank of (repo,path,commit) in total order. Two passes over the
    sorted relation (count, then assign); the sorted frame is persisted so
    the sort runs once.
    """
    spark = corpus.sparkSession
    n_parts = n_parts or spark.sparkContext.defaultParallelism
    keys = ["repo", "path", "commit"]
    s = (
        corpus.repartitionByRange(n_parts, *keys)
        .sortWithinPartitions(*keys)
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    counts = (
        s.select(F.spark_partition_id().alias("pid"))
        .groupBy("pid")
        .count()
        .collect()
    )
    by_pid = {r["pid"]: r["count"] for r in counts}
    offsets = {}
    acc = 0
    for pid in sorted(by_pid):
        offsets[pid] = acc
        acc += by_pid[pid]

    def with_ids(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        pid = TaskContext.get().partitionId()
        base = offsets.get(pid, 0)
        seen = 0
        for pdf in batches:
            n = len(pdf)
            out = pdf.copy()
            out.insert(0, "doc_id", np.arange(base + seen, base + seen + n, dtype=np.int64))
            seen += n
            yield out

    schema = "doc_id long, repo string, path string, commit string, lang string, content string"
    ids = s.mapInPandas(with_ids, schema)
    docs = ids.withColumn("content_sha256", content_sha256("content")).withColumn(
        "doc_len", F.size(tokenize("content"))
    )
    return docs


def verify_sha256(docs: DataFrame, source: DataFrame) -> int:
    """Per-row invariant vs. the source table (BASELINE.json:input_hint):
    every (repo,path,commit) must carry identical sha256(content).
    Returns the number of violating rows (0 = pass)."""
    src = source.select("repo", "path", "commit", content_sha256("content").alias("src_sha"))
    joined = docs.select("repo", "path", "commit", "content_sha256").join(
        src, ["repo", "path", "commit"], "inner"
    )
    return joined.filter(F.col("content_sha256") != F.col("src_sha")).count()


def build_tf(docs: DataFrame) -> DataFrame:
    """(term, doc_id, tf) — the logical inverted relation, pure Spark SQL.

    explode + groupBy gets map-side partial aggregation from Catalyst; the
    shuffle key is (term, doc_id) so hot terms spread across reducers
    (no single-term hotspot at this stage — skew only matters at the
    per-term merge, handled in merge_postings_by_term)."""
    return (
        docs.select("doc_id", F.explode(tokenize("content")).alias("term"))
        .groupBy("term", "doc_id")
        .agg(F.count(F.lit(1)).cast("int").alias("tf"))
    )


def build_dictionary(tf: DataFrame) -> DataFrame:
    """(term, df, cf) global dictionary."""
    return tf.groupBy("term").agg(
        F.count(F.lit(1)).alias("df"), F.sum("tf").alias("cf")
    )


def corpus_stats(docs: DataFrame) -> tuple[int, float]:
    row = docs.agg(
        F.count(F.lit(1)).alias("n"), F.avg("doc_len").alias("avgdl")
    ).collect()[0]
    return int(row["n"]), float(row["avgdl"])


def _build_segment_postings(pdf: pd.DataFrame, avgdl: float) -> pd.DataFrame:
    """One segment's tf rows -> posting-list rows. Vectorized numpy:
    sort by (term, doc_id), split at term boundaries, delta+varint encode,
    block-max of the BM25 tf-component wtf = tf*(k1+1)/(tf + k1*(1-b+b*dl/avgdl)).
    """
    seg = int(pdf["seg"].iloc[0])
    order = np.lexsort((pdf["doc_id"].to_numpy(), pdf["term"].to_numpy()))
    terms = pdf["term"].to_numpy()[order]
    doc_ids = pdf["doc_id"].to_numpy()[order].astype(np.uint64)
    tfs = pdf["tf"].to_numpy()[order].astype(np.int64)
    dls = pdf["dl"].to_numpy()[order].astype(np.float64)
    wtf = tfs * (K1 + 1.0) / (tfs + K1 * (1.0 - B + B * dls / avgdl))

    # term boundaries
    change = np.empty(terms.size, dtype=bool)
    change[0] = True
    change[1:] = terms[1:] != terms[:-1]
    starts = np.flatnonzero(change)
    ends = np.append(starts[1:], terms.size)

    rows = {
        "term": [], "seg": [], "df_seg": [], "doc_ids_bin": [], "tfs_bin": [],
        "max_tf": [], "block_max_wtf": [], "min_doc": [], "max_doc": [],
    }
    for s, e in zip(starts, ends):
        ids = doc_ids[s:e]
        t = tfs[s:e]
        w = wtf[s:e]
        n_blocks = (ids.size + BLOCK_SIZE - 1) // BLOCK_SIZE
        bm = [float(w[i * BLOCK_SIZE : (i + 1) * BLOCK_SIZE].max()) for i in range(n_blocks)]
        rows["term"].append(terms[s])
        rows["seg"].append(seg)
        rows["df_seg"].append(ids.size)
        rows["doc_ids_bin"].append(delta_encode(ids))
        rows["tfs_bin"].append(encode_varint(t.astype(np.uint64)))
        rows["max_tf"].append(int(t.max()))
        rows["block_max_wtf"].append(np.asarray(bm, dtype=np.float32))
        rows["min_doc"].append(int(ids[0]))
        rows["max_doc"].append(int(ids[-1]))
    return pd.DataFrame(rows)


class IndexPaths:
    def __init__(self, root: str):
        self.root = root
        self.postings = os.path.join(root, "postings")
        self.doclens = os.path.join(root, "doclens")
        self.dictionary = os.path.join(root, "dictionary")
        self.docmap = os.path.join(root, "docmap")
        self.stats = os.path.join(root, "stats.json")
        self.manifest = os.path.join(root, "manifest.json")


def read_manifest(paths: IndexPaths) -> dict:
    if os.path.exists(paths.manifest):
        with open(paths.manifest) as f:
            return json.load(f)
    return {"segments": {}, "stats": None}


def _commit_manifest(paths: IndexPaths, manifest: dict) -> None:
    tmp = paths.manifest + ".tmp"
    with open(tmp, "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
    os.replace(tmp, paths.manifest)  # atomic commit — last step of the build


def build_index(
    spark: SparkSession,
    docs: DataFrame,
    out_dir: str,
    n_segments: int = 16,
    resume: bool = True,
) -> IndexPaths:
    """Physical index build with per-segment checkpoint/resume.

    Layout:
      postings/seg=K/*.parquet   (term, df_seg, doc_ids_bin, tfs_bin, block_max_wtf, ...)
      doclens/seg=K/*.parquet    (doc_id, dl)
      dictionary/*.parquet       (term, df, cf)
      docmap/*.parquet           (doc_id, repo, path, commit, lang, content_sha256)
      stats.json                 {n_docs, avgdl, n_segments, seg_size}
      manifest.json              per-segment lineage + metrics (commit point)
    """
    paths = IndexPaths(out_dir)
    os.makedirs(out_dir, exist_ok=True)
    manifest = read_manifest(paths) if resume else {"segments": {}, "stats": None}

    docs = docs.persist(StorageLevel.MEMORY_AND_DISK)
    n_docs, avgdl = corpus_stats(docs)
    seg_size = max(1, -(-n_docs // n_segments))
    stats = {"n_docs": n_docs, "avgdl": avgdl, "n_segments": n_segments,
             "seg_size": seg_size, "k1": K1, "b": B, "block_size": BLOCK_SIZE}
    with open(paths.stats, "w") as f:
        json.dump(stats, f)

    done = set(int(s) for s in manifest["segments"])
    todo = [s for s in range(n_segments) if s not in done]

    if todo:
        seg_col = (F.col("doc_id") / F.lit(seg_size)).cast("int")
        tf = (
            build_tf(docs)
            .withColumn("seg", seg_col)
            .filter(F.col("seg").isin(todo))
        )
        dl = docs.select("doc_id", F.col("doc_len").alias("dl"))
        tf_dl = tf.join(dl, "doc_id")  # doc_id equi-join; dl side is narrow

        t0 = time.time()
        postings = tf_dl.groupBy("seg").applyInPandas(
            lambda pdf: _build_segment_postings(pdf, avgdl), POSTINGS_SCHEMA
        )
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        postings.write.partitionBy("seg").mode("overwrite").parquet(paths.postings)
        (
            docs.select(
                "doc_id", F.col("doc_len").alias("dl"), seg_col.alias("seg")
            )
            .filter(F.col("seg").isin(todo))
            .write.partitionBy("seg")
            .mode("overwrite")
            .parquet(paths.doclens)
        )
        wall_ms = (time.time() - t0) * 1000.0

        # per-segment lineage + metrics (token/posting counts) for the manifest
        seg_metrics = (
            spark.read.parquet(paths.postings)
            .filter(F.col("seg").isin(todo))
            .groupBy("seg")
            .agg(
                F.count(F.lit(1)).alias("posting_lists"),
                F.sum("df_seg").alias("postings"),
                F.min("min_doc").alias("min_doc"),
                F.max("max_doc").alias("max_doc"),
            )
            .collect()
        )
        for r in seg_metrics:
            manifest["segments"][str(int(r["seg"]))] = {
                "min_doc": int(r["min_doc"]),
                "max_doc": int(r["max_doc"]),
                "posting_lists": int(r["posting_lists"]),
                "postings": int(r["postings"]),
                "build_wall_ms": round(wall_ms, 1),
                "lineage": {"source": "docs", "seg_size": seg_size},
            }

    # dictionary + docmap are cheap relative to postings; (re)write whole
    build_dictionary(build_tf(docs)).write.mode("overwrite").parquet(paths.dictionary)
    docs.select("doc_id", "repo", "path", "commit", "lang", "content_sha256").write.mode(
        "overwrite"
    ).parquet(paths.docmap)

    manifest["stats"] = stats
    _commit_manifest(paths, manifest)
    docs.unpersist()
    return paths


# ---------------------------------------------------------------------------
# B5: salted term-partitioned merge (global posting lists)
# ---------------------------------------------------------------------------

MERGED_SCHEMA = (
    "term string, df long, doc_ids_bin binary, tfs_bin binary, "
    "max_tf int, block_max_wtf array<float>, min_doc long, max_doc long"
)


def _concat_postings(pdf: pd.DataFrame) -> pd.DataFrame:
    """Ordered concat of doc-range-disjoint posting fragments of one term.

    Fragments (sorted by min_doc) never interleave, so the merge is a pure
    concatenation — decode each delta stream, stitch (first delta of each
    subsequent fragment rebased onto the previous fragment's last doc), and
    re-encode. Vectorized numpy; no per-posting Python."""
    from mtix_spark.index.codec import decode_varint, delta_decode

    pdf = pdf.sort_values("min_doc")
    ids = np.concatenate([delta_decode(b) for b in pdf["doc_ids_bin"]])
    tfs = np.concatenate([decode_varint(b) for b in pdf["tfs_bin"]])
    bm = np.concatenate([np.asarray(b, dtype=np.float32) for b in pdf["block_max_wtf"]])
    return pd.DataFrame(
        {
            "term": [pdf["term"].iloc[0]],
            "df": [int(ids.size)],
            "doc_ids_bin": [delta_encode(ids)],
            "tfs_bin": [encode_varint(tfs)],
            "max_tf": [int(pdf["max_tf"].max())],
            "block_max_wtf": [bm],
            "min_doc": [int(ids[0])],
            "max_doc": [int(ids[-1])],
        }
    )


def merge_postings(
    spark: SparkSession,
    paths: IndexPaths,
    hot_df: int = 100_000,
    n_salt: int = 8,
) -> str:
    """Merge per-segment posting lists into global term-partitioned lists
    with skew splitting of hot terms (BASELINE.json:north_star).

    Cold terms (global df < hot_df) merge in one shuffle keyed by term.
    Hot terms (Zipf head — 'def', 'import', ...) would serialize one reducer
    per term, so they take two rounds: segments are first grouped into
    `n_salt` contiguous ranges (salt = seg * n_salt // n_segments keeps each
    salt bucket doc-range-disjoint AND contiguous), sub-merged in parallel
    keyed by (term, salt), then the ≤ n_salt fragments per term concat in a
    second tiny round. Both rounds are the same ordered-concat kernel —
    correctness is partition-count-invariant.

    Writes merged/*.parquet; returns its path. Note the block-max metadata
    is concatenated, not recomputed: fragment block boundaries are preserved,
    upper bounds stay valid (they are per-128-posting maxima of wtf).
    """
    postings = spark.read.parquet(paths.postings)
    with open(paths.stats) as f:
        n_segments = json.load(f)["n_segments"]

    dfs = postings.groupBy("term").agg(F.sum("df_seg").alias("df"))
    hot_terms = dfs.filter(F.col("df") >= hot_df).select("term")

    cold = postings.join(F.broadcast(hot_terms), "term", "left_anti")
    merged_cold = cold.groupBy("term").applyInPandas(
        lambda pdf: _concat_postings(pdf), MERGED_SCHEMA
    )

    hot = postings.join(F.broadcast(hot_terms), "term", "left_semi").withColumn(
        "salt", (F.col("seg") * n_salt / F.lit(n_segments)).cast("int")
    )
    sub = hot.groupBy("term", "salt").applyInPandas(
        lambda pdf: _concat_postings(pdf), MERGED_SCHEMA
    )
    merged_hot = sub.groupBy("term").applyInPandas(
        lambda pdf: _concat_postings(pdf), MERGED_SCHEMA
    )

    out = os.path.join(paths.root, "merged")
    merged_cold.unionByName(merged_hot).write.mode("overwrite").parquet(out)
    return out
