"""Inverted-index build: docIDs, term stats, posting-list segments.

Scale design (the point of this engine — BASELINE.json:north_rule):

- **Deterministic dense docIDs without a global-sort bottleneck.** A naive
  `row_number() OVER (ORDER BY ...)` funnels 100 TB through one reducer.
  Instead: range-repartition by the natural key, sort within partitions,
  then remap `monotonically_increasing_id` (partition id in its high bits)
  to dense ranks through a tiny broadcast offset table — all JVM-side, the
  content bytes move exactly once. The id of a row is its rank in the total
  order — a pure function of the data, invariant to partition boundaries
  and parallelism (required for rank-identical results at N vs 4N
  executors).

- **Tokenization off the JVM allocation path.** The tf relation is built by
  an Arrow kernel (C++ regex split → dictionary-encode → numeric
  unique-count): measured 4× faster than Catalyst `explode(split(...))`
  at 8 threads — the JVM path allocates one String per token and
  anti-scales under concurrency (GC + concurrent page-fault churn).

- **Doc-partitioned segments.** Docs are split into contiguous doc_id ranges
  ("segments", the Lucene model). Each segment's posting lists are built in
  one applyInPandas group, fully vectorized: factorize → int lexsort →
  masked-diff deltas → ONE bulk varint encode sliced by byte offsets →
  reduceat block maxima (128-entry BM25 upper bounds). Segments are
  doc-range-disjoint, so the later term-merge is an ordered concat, never a
  re-sort.

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
from pyspark import StorageLevel
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mtix_spark.functions.text import content_sha256
from mtix_spark.index.codec import delta_encode, encode_varint, encode_varint_with_sizes

K1 = 1.2
B = 0.75
BLOCK_SIZE = 128  # postings per block-max block (mirrors mtix batch=128)

DOCS_SCHEMA = (
    "doc_id long, repo string, path string, commit string, lang string, "
    "content string, content_sha256 string, doc_len int"
)

POSTINGS_SCHEMA = (
    "term string, seg int, df_seg int, cf_seg long, doc_ids_bin binary, "
    "tfs_bin binary, max_tf int, block_max_wtf array<float>, "
    "min_doc long, max_doc long"
)


def split_long_docs(corpus: DataFrame, max_tokens: int = 1 << 22) -> DataFrame:
    """Chunk pathologically long documents into ordered sub-docs of at most
    `max_tokens` tokens each, upstream of `assign_doc_ids` (B1).

    The positional index packs (doc_rank << 22 | pos), so a document with
    a token position at or past 2^22 fails the build loudly
    (positions.py). This is the remedy that guard points at: derived
    identity (repo, path + '#cNNNNN', commit) sorts chunks in document
    order, so B1 assigns them consecutive dense doc ids; every chunk then
    stays within the packed position bound. Phrase/NEAR matches are
    confined to chunks — a phrase spanning a split boundary is not
    matchable (no overlap; the standard trade, and long-doc splits are at
    token boundaries so no token is lost or altered: chunk contents
    concatenate byte-exactly to the original).

    Short documents (the overwhelming majority) pass through UNTOUCHED —
    same bytes, same (repo, path, commit) — behind a length precheck that
    avoids even tokenizing them: n tokens require ≥ 2n-1 characters, so
    len(content) ≤ 2·max_tokens proves the doc fits. Long docs take one
    regex pass (Arrow-batched mapInPandas, 1→N fan-out). Token boundaries
    use the ASCII rendition of the tokenizer's class ([A-Za-z0-9_]+ on the
    original bytes, which lowercases 1:1 for the source-code corpus); the
    build-time guard still backstops any residual over-long chunk."""
    import re as _re

    cols = ["repo", "path", "commit", "lang", "content"]
    pat = _re.compile(r"[A-Za-z0-9_]+")

    def kernel(batches):
        import pandas as pd

        for pdf in batches:
            out = {c: [] for c in cols}
            for r in pdf.itertuples(index=False):
                c = r.content or ""
                bounds = None
                if len(c) > 2 * max_tokens:
                    bounds = [0]
                    cnt = 0
                    for m in pat.finditer(c):
                        if cnt == max_tokens:
                            bounds.append(m.start())
                            cnt = 0
                        cnt += 1
                if not bounds or len(bounds) == 1:
                    for col in cols:
                        out[col].append(getattr(r, col))
                    continue
                for i, b in enumerate(bounds):
                    e = bounds[i + 1] if i + 1 < len(bounds) else len(c)
                    out["repo"].append(r.repo)
                    out["path"].append(f"{r.path}#c{i:05d}")
                    out["commit"].append(r.commit)
                    out["lang"].append(r.lang)
                    out["content"].append(c[b:e])
            yield pd.DataFrame(out)

    return corpus.select(*cols).mapInPandas(
        kernel,
        "repo string, path string, commit string, lang string, content string",
    )


def assign_doc_ids(corpus: DataFrame, n_parts: int | None = None) -> DataFrame:
    """corpus(repo,path,commit,lang,content) -> docs with dense doc_id.

    doc_id = rank of (repo,path,commit) in total order, with no global-sort
    bottleneck and no content round-trip through Python: range-partition +
    sort, then `monotonically_increasing_id` (partition id in the high bits,
    a per-partition counter below) remapped to dense ranks with a tiny
    broadcast offset table — content bytes move exactly once (the range
    shuffle). The id is a pure function of the data, invariant to
    parallelism (tested), which the rank-identical-at-two-cluster-sizes
    criterion requires (BASELINE.json:north_rule).

    doc_len counts tokens via a C-regex count over Arrow batches — no
    giant JVM string arrays (regex `split` allocation churn measurably
    anti-scales under concurrency).
    """
    spark = corpus.sparkSession
    n_parts = n_parts or spark.sparkContext.defaultParallelism
    keys = ["repo", "path", "commit"]
    s = (
        corpus.repartitionByRange(n_parts, *keys)
        .sortWithinPartitions(*keys)
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    m = s.withColumn("__m", F.monotonically_increasing_id())
    parts = (
        m.groupBy(F.shiftright("__m", 33).alias("__pid"))
        .agg(F.min("__m").alias("__mn"), F.count(F.lit(1)).alias("__cnt"))
        .collect()
    )
    rows, acc = [], 0
    for r in sorted(parts, key=lambda r: r["__pid"]):
        rows.append((r["__pid"], r["__mn"], acc))
        acc += r["__cnt"]
    off = spark.createDataFrame(rows, "__pid long, __mn long, __off long")
    docs = (
        m.withColumn("__pid", F.shiftright("__m", 33))
        .join(F.broadcast(off), "__pid")
        .withColumn("doc_id", F.col("__off") + F.col("__m") - F.col("__mn"))
        .drop("__pid", "__m", "__mn", "__off")
        .select("doc_id", *corpus.columns)
    )
    return docs.withColumn("content_sha256", content_sha256("content")).withColumn(
        "doc_len", token_count_arrow(F.col("content"))
    )


def token_count_arrow(col) -> "F.Column":
    """Token count via vectorized C-regex count (pandas str.count) — same
    token rule as functions.text.tokenize, no token-array materialization."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("int")
    def _count(s: pd.Series) -> pd.Series:
        import pyarrow as pa
        import pyarrow.compute as pc

        c = pc.count_substring_regex(
            pc.utf8_lower(pa.Array.from_pandas(s)), "[a-z0-9_]+"
        )
        return c.to_pandas().fillna(0).astype("int32")

    return _count(col)


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
    """(term, doc_id, tf) — the logical inverted relation.

    Tokenize + per-doc counting happen inside one Arrow batch kernel
    (C regex findall + pandas group-size): each batch emits pre-aggregated
    (term, doc_id, tf) partials, so the only JVM work is the final
    (term, doc_id) hash aggregation. This replaced a Catalyst
    `explode(split(...))` + groupBy: the JVM regex-split path allocates a
    String per token and measurably ANTI-scales under thread concurrency
    (GC/page-fault churn), 4× slower at 8 threads on this corpus. The
    shuffle key is (term, doc_id), so hot terms spread across reducers —
    skew only matters at the per-term merge (merge_postings)."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import pyarrow as pa
        import pyarrow.compute as pc

        for pdf in batches:
            ids = pdf["doc_id"].to_numpy()
            arr = pa.Array.from_pandas(pdf["content"])
            sp = pc.split_pattern_regex(pc.utf8_lower(arr), "[^a-z0-9_]+")
            lens = pc.list_value_length(sp).fill_null(0).to_numpy(zero_copy_only=False)
            flat = pc.list_flatten(sp)
            if len(flat) == 0:
                continue
            # dictionary-encode the token stream: counting runs on int codes,
            # token strings materialize only once per distinct (doc, term)
            de = flat.dictionary_encode()
            codes = de.indices.to_numpy(zero_copy_only=False).astype(np.int64)
            vocab = de.dictionary.to_numpy(zero_copy_only=False)
            parent = np.repeat(np.arange(len(ids), dtype=np.int64), lens)
            keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
            codes, parent = codes[keep], parent[keep]
            if codes.size == 0:
                continue
            key = parent * len(vocab) + codes
            uk, counts = np.unique(key, return_counts=True)
            yield pd.DataFrame(
                {
                    "term": vocab[uk % len(vocab)],
                    "doc_id": ids[uk // len(vocab)],
                    "tf": counts.astype("int32"),
                }
            )

    partial = docs.select("doc_id", "content").mapInPandas(
        kernel, "term string, doc_id long, tf int"
    )
    return partial.groupBy("term", "doc_id").agg(
        F.sum("tf").cast("int").alias("tf")
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
    """One segment's tf rows -> posting-list rows, fully vectorized.

    Every step is a whole-array numpy pass — no per-term Python loop:
    (1) lexsort by (term, doc_id); (2) within-term deltas via a masked diff;
    (3) ONE bulk varint encode of all deltas (and all tfs), sliced into
    per-term cells by byte offsets; (4) block maxima of the BM25 wtf
    component via maximum.reduceat over the concatenated block starts;
    (5) per-term max_tf/min_doc/max_doc via reduceat / fancy indexing.
    """
    seg = int(pdf["seg"].iloc[0])
    # factorize first: the lexsort then runs on int codes, never comparing
    # Python string objects (10×+ on wide segments)
    codes_unsorted, uniques = pd.factorize(pdf["term"], sort=True)
    order = np.lexsort((pdf["doc_id"].to_numpy(), codes_unsorted))
    codes = codes_unsorted[order]
    doc_ids = pdf["doc_id"].to_numpy()[order].astype(np.uint64)
    tfs = pdf["tf"].to_numpy()[order].astype(np.uint64)
    dls = pdf["dl"].to_numpy()[order].astype(np.float64)
    tff = tfs.astype(np.float64)
    wtf = tff * (K1 + 1.0) / (tff + K1 * (1.0 - B + B * dls / avgdl))

    # term boundaries
    change = np.empty(codes.size, dtype=bool)
    change[0] = True
    change[1:] = codes[1:] != codes[:-1]
    starts = np.flatnonzero(change)
    ends = np.append(starts[1:], codes.size)
    lengths = ends - starts

    # within-term deltas (first posting of each term stays absolute)
    deltas = doc_ids.copy()
    deltas[1:] -= doc_ids[:-1]
    deltas[starts] = doc_ids[starts]

    id_buf, id_nb = encode_varint_with_sizes(deltas)
    tf_buf, tf_nb = encode_varint_with_sizes(tfs)
    id_off = np.zeros(codes.size + 1, dtype=np.int64)
    np.cumsum(id_nb, out=id_off[1:])
    tf_off = np.zeros(codes.size + 1, dtype=np.int64)
    np.cumsum(tf_nb, out=tf_off[1:])
    id_mv, tf_mv = memoryview(id_buf), memoryview(tf_buf)
    doc_bins = [bytes(id_mv[id_off[s] : id_off[e]]) for s, e in zip(starts, ends)]
    tf_bins = [bytes(tf_mv[tf_off[s] : tf_off[e]]) for s, e in zip(starts, ends)]

    # block starts: for each term, starts[i], starts[i]+B, ... (concatenated)
    n_blocks = (lengths + BLOCK_SIZE - 1) // BLOCK_SIZE
    total_blocks = int(n_blocks.sum())
    first_block = np.zeros(starts.size + 1, dtype=np.int64)
    np.cumsum(n_blocks, out=first_block[1:])
    within = np.arange(total_blocks, dtype=np.int64) - np.repeat(
        first_block[:-1], n_blocks
    )
    block_starts = np.repeat(starts, n_blocks) + within * BLOCK_SIZE
    bm_all = np.maximum.reduceat(wtf, block_starts).astype(np.float32)
    block_max = [
        bm_all[first_block[i] : first_block[i + 1]] for i in range(len(starts))
    ]

    max_tf = np.maximum.reduceat(tfs, starts).astype(np.int64)
    cf = np.add.reduceat(tfs.astype(np.int64), starts)

    return pd.DataFrame(
        {
            "term": np.asarray(uniques, dtype=object)[codes[starts]],
            "seg": np.full(starts.size, seg, dtype=np.int32),
            "df_seg": lengths.astype(np.int32),
            "cf_seg": cf,
            "doc_ids_bin": doc_bins,
            "tfs_bin": tf_bins,
            "max_tf": max_tf.astype(np.int32),
            "block_max_wtf": block_max,
            "min_doc": doc_ids[starts].astype(np.int64),
            "max_doc": doc_ids[ends - 1].astype(np.int64),
        }
    )


class IndexPaths:
    def __init__(self, root: str):
        self.root = root
        self.postings = os.path.join(root, "postings")
        self.dictionary = os.path.join(root, "dictionary")
        self.docmap = os.path.join(root, "docmap")
        # doc lengths live inside the docmap partitions (columns doc_id, dl);
        # kept as a separate attribute for the query kernel's pruned reads
        self.doclens = self.docmap
        self.stats = os.path.join(root, "stats.json")
        self.manifest = os.path.join(root, "manifest.json")


def read_manifest(paths: IndexPaths) -> dict:
    from mtix_spark.table_io import DEFAULT_IO

    man = DEFAULT_IO.read_manifest(paths.manifest)
    return man if man is not None else {"segments": {}, "stats": None}


def dictionary_dir(paths: IndexPaths, version: int) -> str:
    return os.path.join(paths.dictionary, f"v={int(version)}")


def write_dictionary_version(
    df: DataFrame, paths: IndexPaths, man: dict
) -> int:
    """Write the (term, df, cf) relation as a NEW dictionary version dir and
    set the manifest pointer (caller commits the manifest LAST — the
    Iceberg-snapshot discipline: data first, atomic pointer flip after).
    Version = pointer+1, so a crash-replayed producer recomputes and
    overwrites the SAME version dir idempotently. Returns the version."""
    from mtix_spark.table_io import DEFAULT_IO as tio

    new_v = int(man.get("dictionary_version", -1)) + 1
    tio.overwrite(df, dictionary_dir(paths, new_v))
    man["dictionary_version"] = new_v
    return new_v


def read_dictionary(spark: SparkSession, paths: IndexPaths) -> DataFrame:
    """Resolve the live (term, df, cf) dictionary through the manifest's
    version pointer; falls back to the un-versioned layout of pre-pointer
    indexes (plain parquet at paths.dictionary)."""
    man = read_manifest(paths)
    v = man.get("dictionary_version")
    if v is not None:
        return spark.read.parquet(dictionary_dir(paths, int(v)))
    return spark.read.parquet(paths.dictionary)


def _commit_manifest(paths: IndexPaths, manifest: dict) -> None:
    from mtix_spark.table_io import DEFAULT_IO

    DEFAULT_IO.commit_manifest(paths.manifest, manifest)


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
      docmap/seg=K/*.parquet     (doc_id, dl, repo, path, commit, lang, content_sha256)
                                 — one write serves both the query kernel's
                                 doc-length lookups (columns doc_id, dl via
                                 parquet column pruning) and the id↔file map
      dictionary/*.parquet       (term, df, cf)
      stats.json                 {n_docs, avgdl, n_segments, seg_size}
      manifest.json              per-segment lineage + metrics (commit point)
    """
    paths = IndexPaths(out_dir)
    os.makedirs(out_dir, exist_ok=True)
    manifest = read_manifest(paths) if resume else {"segments": {}, "stats": None}
    phases: dict[str, float] = {}

    t_ph = time.time()
    docs = docs.persist(StorageLevel.MEMORY_AND_DISK)
    n_docs, avgdl = corpus_stats(docs)
    phases["corpus_stats_s"] = round(time.time() - t_ph, 2)
    seg_size = max(1, -(-n_docs // n_segments))
    stats = {"n_docs": n_docs, "avgdl": avgdl, "n_segments": n_segments,
             "seg_size": seg_size, "k1": K1, "b": B, "block_size": BLOCK_SIZE}
    with open(paths.stats, "w") as f:
        json.dump(stats, f)

    done = set(int(s) for s in manifest["segments"])
    todo = [s for s in range(n_segments) if s not in done]

    # single consumer (segment postings) → no persist; the global dictionary
    # is later derived from the written postings (sum of per-segment df/cf),
    # so content is tokenized exactly once and the tf relation is never
    # materialized twice
    tf_all = build_tf(docs)

    if todo:
        seg_col = (F.col("doc_id") / F.lit(seg_size)).cast("int")
        tf = tf_all.withColumn("seg", seg_col).filter(F.col("seg").isin(todo))
        dl = docs.select("doc_id", F.col("doc_len").alias("dl"))
        tf_dl = tf.join(dl, "doc_id")  # doc_id equi-join; dl side is narrow

        t0 = time.time()
        from mtix_spark.table_io import DEFAULT_IO as tio

        postings = tf_dl.groupBy("seg").applyInPandas(
            lambda pdf: _build_segment_postings(pdf, avgdl), POSTINGS_SCHEMA
        )
        tio.overwrite_partitions(postings, paths.postings, "seg")
        phases["tokenize_postings_write_s"] = round(time.time() - t0, 2)
        t_ph = time.time()
        tio.overwrite_partitions(
            docs.select(
                "doc_id",
                F.col("doc_len").alias("dl"),
                "repo", "path", "commit", "lang", "content_sha256",
                seg_col.alias("seg"),
            ).filter(F.col("seg").isin(todo)),
            paths.docmap,
            "seg",
        )
        phases["docmap_write_s"] = round(time.time() - t_ph, 2)
        wall_ms = (time.time() - t0) * 1000.0
        t_ph = time.time()

        # per-segment lineage + metrics (token/posting counts) for the manifest
        seg_metrics = (
            spark.read.parquet(paths.postings)
            .filter(F.col("seg").isin(todo))
            .groupBy("seg")
            .agg(
                F.count(F.lit(1)).alias("posting_lists"),
                F.sum("df_seg").alias("postings"),
                F.sum("cf_seg").alias("tokens"),
                F.sum(F.octet_length("doc_ids_bin") + F.octet_length("tfs_bin")).alias(
                    "compressed_bytes"
                ),
                F.min("min_doc").alias("min_doc"),
                F.max("max_doc").alias("max_doc"),
            )
            .collect()
        )
        for r in seg_metrics:
            s = int(r["seg"])
            manifest["segments"][str(s)] = {
                "min_doc": int(r["min_doc"]),
                "max_doc": int(r["max_doc"]),
                # docs this segment owns (its contiguous doc_id range) — the
                # streaming ingester's running (N, Σdl) totals include these
                "n_docs": min(seg_size, n_docs - s * seg_size),
                "avgdl_build": avgdl,
                "posting_lists": int(r["posting_lists"]),
                "postings": int(r["postings"]),
                "tokens": int(r["tokens"]),
                "compressed_bytes": int(r["compressed_bytes"]),
                "build_wall_ms": round(wall_ms, 1),
                "lineage": {"source": "docs", "seg_size": seg_size},
            }
        phases["seg_metrics_s"] = round(time.time() - t_ph, 2)

    # global dictionary derived from the written postings (per-segment df/cf
    # sum cleanly over doc-range-disjoint segments) — reads the compact
    # pruned columns instead of re-materializing the tf relation. Filtered
    # to the manifest's live segments: orphan seg dirs (crash between a
    # compaction's manifest commit and dir cleanup) must not double-count.
    from mtix_spark.table_io import DEFAULT_IO as tio2

    t_ph = time.time()
    if os.path.exists(paths.postings):
        live_segs = [int(s) for s in manifest["segments"]]
        write_dictionary_version(
            tio2.read(spark, paths.postings)
            .filter(F.col("seg").isin(live_segs))
            .groupBy("term")
            .agg(F.sum("df_seg").alias("df"), F.sum("cf_seg").alias("cf")),
            paths,
            manifest,
        )
    else:  # empty corpus: schema-only dictionary
        write_dictionary_version(build_dictionary(tf_all), paths, manifest)
    phases["dictionary_s"] = round(time.time() - t_ph, 2)

    manifest["stats"] = stats
    manifest["build_phases_s"] = phases
    _commit_manifest(paths, manifest)
    # blocking: async block removal can race a caller's next job over the
    # same frame (planned against the cache, then blocks vanish mid-stage →
    # "Block rdd_N does not exist") — seen with build_positions right after
    docs.unpersist(blocking=True)
    return paths


# ---------------------------------------------------------------------------
# B5: salted term-partitioned merge (global posting lists)
# ---------------------------------------------------------------------------

MERGED_SCHEMA = (
    "term string, df long, cf long, doc_ids_bin binary, tfs_bin binary, "
    "max_tf int, block_max_wtf array<float>, min_doc long, max_doc long"
)


def _concat_group(
    doc_bins: list, tf_bins: list, bms: list, cfs: "np.ndarray", max_tfs: "np.ndarray"
) -> tuple:
    """Ordered concat of doc-range-disjoint posting fragments of one term
    (caller passes fragments already sorted by min_doc).

    Fragments never interleave, so the merge is a pure concatenation —
    decode each delta stream, stitch, and re-encode. Vectorized numpy; no
    per-posting Python.

    Block-max metadata is REBUILT on the merged BLOCK_SIZE grid (fragment
    lengths are rarely multiples of BLOCK_SIZE, so merged block k does not
    start at the source fragments' block boundaries): each posting takes its
    source fragment-block's max as a per-posting upper bound, and the merged
    block max is the reduceat of those bounds over the merged grid. Exact
    when fragments align; otherwise a sound over-estimate (bound ≥ true
    block max), which is what MaxScore pruning requires.

    Returns (df, cf, doc_ids_bin, tfs_bin, max_tf, block_max_wtf, min_doc,
    max_doc)."""
    from mtix_spark.index.codec import decode_varint, delta_decode

    frag_ids = [delta_decode(b) for b in doc_bins]
    ids = np.concatenate(frag_ids)
    tfs = np.concatenate([decode_varint(b) for b in tf_bins])
    # per-posting upper bound from each source fragment's block maxima
    per_posting_ub = np.concatenate(
        [
            np.repeat(
                np.asarray(b, dtype=np.float32),
                np.minimum(
                    BLOCK_SIZE,
                    n - BLOCK_SIZE * np.arange(len(b), dtype=np.int64),
                ),
            )
            for b, n in zip(bms, (f.size for f in frag_ids))
        ]
    )
    merged_starts = np.arange(0, ids.size, BLOCK_SIZE, dtype=np.int64)
    bm = np.maximum.reduceat(per_posting_ub, merged_starts).astype(np.float32)
    return (
        int(ids.size),
        int(cfs.sum()),
        delta_encode(ids),
        encode_varint(tfs),
        int(max_tfs.max()),
        bm,
        int(ids[0]),
        int(ids[-1]),
    )


def _concat_postings(pdf: pd.DataFrame) -> pd.DataFrame:
    """One-term pandas wrapper over `_concat_group` (unit-tested directly;
    the distributed merge uses the streaming kernel below instead)."""
    pdf = pdf.sort_values("min_doc")
    cf_col = "cf" if "cf" in pdf.columns else "cf_seg"
    df, cf, ids_bin, tfs_bin, max_tf, bm, lo, hi = _concat_group(
        list(pdf["doc_ids_bin"]),
        list(pdf["tfs_bin"]),
        list(pdf["block_max_wtf"]),
        pdf[cf_col].to_numpy(),
        pdf["max_tf"].to_numpy(),
    )
    return pd.DataFrame(
        {
            "term": [pdf["term"].iloc[0]],
            "df": [df],
            "cf": [cf],
            "doc_ids_bin": [ids_bin],
            "tfs_bin": [tfs_bin],
            "max_tf": [max_tf],
            "block_max_wtf": [bm],
            "min_doc": [lo],
            "max_doc": [hi],
        }
    )


def _merge_stream(with_salt: bool):
    """mapInPandas kernel factory: merge posting fragments grouped by term
    (or (term, salt)) over a stream of Arrow batches.

    The input partition is hash-partitioned by the group key and sorted by
    (key..., min_doc), so each group's fragments arrive contiguously and
    pre-ordered; the kernel detects group boundaries with one vectorized
    compare per batch and carries the (possibly incomplete) last group into
    the next batch. This replaces a groupBy().applyInPandas() whose
    per-tiny-group Arrow→pandas conversion dominated wall time 4:1 over the
    actual merge work at vocab-sized group counts."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        out_cols = (
            "term df cf doc_ids_bin tfs_bin max_tf block_max_wtf min_doc max_doc"
        ).split()
        pending: pd.DataFrame | None = None

        def flush(pdf: pd.DataFrame, hold_last: bool):
            nonlocal pending
            terms = pdf["term"].to_numpy()
            brk = terms[1:] != terms[:-1]
            if with_salt:
                salts = pdf["salt"].to_numpy()
                brk = brk | (salts[1:] != salts[:-1])
            starts = np.concatenate([[0], np.nonzero(brk)[0] + 1])
            ends = np.concatenate([starts[1:], [len(terms)]])
            if hold_last:
                pending = pdf.iloc[starts[-1] :]
                starts, ends = starts[:-1], ends[:-1]
            else:
                pending = None
            if not len(starts):
                return None
            cf_col = "cf" if "cf" in pdf.columns else "cf_seg"
            doc_bins = pdf["doc_ids_bin"].to_numpy()
            tf_bins = pdf["tfs_bin"].to_numpy()
            bms = pdf["block_max_wtf"].to_numpy()
            cfs = pdf[cf_col].to_numpy()
            max_tfs = pdf["max_tf"].to_numpy()
            out = {c: [] for c in out_cols}
            for a, b in zip(starts, ends):
                vals = _concat_group(
                    list(doc_bins[a:b]), list(tf_bins[a:b]), list(bms[a:b]),
                    cfs[a:b], max_tfs[a:b],
                )
                out["term"].append(terms[a])
                for c, v in zip(out_cols[1:], vals):
                    out[c].append(v)
            return pd.DataFrame(out)

        for pdf in batches:
            if pending is not None and len(pending):
                pdf = pd.concat([pending, pdf], ignore_index=True)
            if not len(pdf):
                continue
            got = flush(pdf, hold_last=True)
            if got is not None and len(got):
                yield got
        if pending is not None and len(pending):
            got = flush(pending, hold_last=False)
            if got is not None and len(got):
                yield got

    return kernel


def index_stats(spark: SparkSession, paths: IndexPaths) -> DataFrame:
    """Index introspection: one row per live segment from the manifest
    (lineage source, doc range, doc/token/posting counts, compressed
    bytes-per-posting, build wall) — the operational view an index admin
    reads before deciding to compact or purge. Pure manifest read, no scan.
    """
    man = read_manifest(paths)
    rows = []
    for sid, m in sorted(man["segments"].items(), key=lambda kv: int(kv[0])):
        postings = m.get("postings")
        cbytes = m.get("compressed_bytes")
        rows.append(
            (
                int(sid),
                str(m.get("lineage", {}).get("source", "?")),
                int(m["min_doc"]),
                int(m["max_doc"]),
                int(m.get("n_docs", 0)),
                int(m.get("tokens", 0)),
                int(postings) if postings is not None else None,
                round(cbytes / postings, 3)
                if cbytes is not None and postings
                else None,
                float(m.get("build_wall_ms", 0.0)),
            )
        )
    return spark.createDataFrame(
        rows,
        "seg int, source string, min_doc long, max_doc long, n_docs long, "
        "tokens long, postings long, bytes_per_posting double, build_wall_ms double",
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

    All three rounds run the same streaming mapInPandas kernel
    (`_merge_stream`) over key-partitioned, key-sorted fragments — group
    boundaries detected in-batch, so per-group cost is the numpy concat
    itself, not an Arrow round-trip (the groupBy().applyInPandas() form
    paid ~4 ms of conversion per tiny term group: 4:1 overhead at
    vocab-sized group counts). Block-max metadata is rebuilt on the merged
    BLOCK_SIZE grid (see `_concat_group`). Writes merged/*.parquet;
    returns its path.
    """
    postings = spark.read.parquet(paths.postings)
    with open(paths.stats) as f:
        n_segments = json.load(f)["n_segments"]

    dfs = postings.groupBy("term").agg(F.sum("df_seg").alias("df"))
    hot_terms = dfs.filter(F.col("df") >= hot_df).select("term")

    cold = postings.join(F.broadcast(hot_terms), "term", "left_anti")
    merged_cold = (
        cold.repartition("term")
        .sortWithinPartitions("term", "min_doc")
        .mapInPandas(_merge_stream(with_salt=False), MERGED_SCHEMA)
    )

    hot = postings.join(F.broadcast(hot_terms), "term", "left_semi").withColumn(
        "salt", (F.col("seg") * n_salt / F.lit(n_segments)).cast("int")
    )
    sub = (
        hot.repartition("term", "salt")
        .sortWithinPartitions("term", "salt", "min_doc")
        .mapInPandas(_merge_stream(with_salt=True), MERGED_SCHEMA)
    )
    merged_hot = (
        sub.repartition("term")
        .sortWithinPartitions("term", "min_doc")
        .mapInPandas(_merge_stream(with_salt=False), MERGED_SCHEMA)
    )

    out = os.path.join(paths.root, "merged")
    merged_cold.unionByName(merged_hot).write.mode("overwrite").parquet(out)
    return out
