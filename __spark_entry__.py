"""Driver contract for the spark-graft builder (PySpark target).

Every operator family from SURVEY.md §2 is exposed here as a
(queries(), oracle_sql()) pair; the DuckDB oracle mirrors the Spark
expression tree closely enough (same constants, same operation order,
round-to-6 discipline) that the driver's value-hash comparison is exact.

Queries marked "no oracle" (hash-function-dependent or approximate) get the
driver's rows-only check; their correctness is asserted in tests/ against
engine-internal oracles instead.
"""

from __future__ import annotations

import re
import tempfile
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mtix_spark.dedup import (
    MINHASH_PRIME,
    ROWS_PER_BAND,
    _perm_params,
    exact_dedup_groups,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash32,
    simhash_dup_pairs,
)
from mtix_spark.functions.scalar import clamp_year, replace_brackets
from mtix_spark.functions.text import (
    doc_fingerprint,
    language_id,
    quality_score,
    tokenize,
)
from mtix_spark.pipeline import fuse_runs_avg, threshold_filter, top_n_per_query
from mtix_spark.similarity import knn_cosine_brute, knn_cosine_lsh

# ---------------------------------------------------------------------------
# shared constants (mirrored verbatim into the oracle SQL)
# ---------------------------------------------------------------------------

K1, B = 1.2, 0.75
TOPK = 10
FIXED_QUERIES = [
    (1, "hash join"),
    (2, "table scan fast"),
    (3, "row value part"),
    (4, "merge batch"),
    (5, "slow query agg key"),
]
KNN_QUERY_IDS = [0, 1, 2, 3, 4]

# DuckDB mirror of mtix_spark.functions.text.tokenize
TOK = "list_filter(string_split_regex(lower({c}), '[^a-z0-9_]+'), t -> t <> '')"


def _q_terms() -> list[tuple[int, str]]:
    """Distinct sorted query terms, same dedup as search.query_terms."""
    out = []
    for qid, text in FIXED_QUERIES:
        for t in sorted({t for t in re.split("[^a-z0-9_]+", text.lower()) if t}):
            out.append((qid, t))
    return out


def _tbl(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _docs_tf(docs: DataFrame) -> DataFrame:
    """(term, doc_id, tf) over the driver `documents` table (col `text`)."""
    return (
        docs.select("doc_id", F.explode(tokenize("text")).alias("term"))
        .groupBy("term", "doc_id")
        .agg(F.count(F.lit(1)).alias("tf"))
    )


# ---------------------------------------------------------------------------
# engine core queries
# ---------------------------------------------------------------------------


def q_tf_postings(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _docs_tf(_tbl(spark, sf_dir, "documents"))


def q_term_dict(spark: SparkSession, sf_dir: str) -> DataFrame:
    tf = _docs_tf(_tbl(spark, sf_dir, "documents"))
    return tf.groupBy("term").agg(
        F.count(F.lit(1)).alias("df"), F.sum("tf").alias("cf")
    )


def q_corpus_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _tbl(spark, sf_dir, "documents")
    return docs.select(F.size(tokenize("text")).alias("dl")).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.avg(F.col("dl").cast("double")), 6).alias("avgdl"),
    )


_IDX_CACHE: dict[tuple, tuple] = {}


def _docs_index(
    spark: SparkSession, sf_dir: str, positions: bool = False, private: bool = False
):
    """Standard 4-segment index over the documents corpus (dense ids by
    (repo, path, commit) rank; the original doc_id rides in `path`).
    Read-only entries share ONE cached build per (session, sf_dir) — the
    build is deterministic, so reuse cannot change any result, it only
    removes ~10 duplicate builds from the driver's correctness gate.
    Entries that MUTATE the index (tombstones, merged lists, compaction)
    pass private=True for a throwaway copy."""
    from mtix_spark.index.build import assign_doc_ids, build_index
    from mtix_spark.index.positions import build_positions

    key = (sf_dir, spark.sparkContext.applicationId)
    cached = None if private else _IDX_CACHE.get(key)
    if cached is not None:
        paths, has_pos, with_ids = cached
        if positions and not has_pos:
            build_positions(spark, with_ids, paths)
            _IDX_CACHE[key] = (paths, True, with_ids)
        return paths
    docs = _tbl(spark, sf_dir, "documents")
    corpus = docs.select(
        F.lit("documents").alias("repo"),
        F.col("doc_id").cast("string").alias("path"),
        F.lit("0").alias("commit"),
        F.col("lang"),
        F.col("text").alias("content"),
    )
    with_ids = assign_doc_ids(corpus, 8)
    idx_dir = tempfile.mkdtemp(prefix="mtix_idx_")
    paths = build_index(spark, with_ids, idx_dir, n_segments=4)
    if positions:
        build_positions(spark, with_ids, paths)
    if not private:
        _IDX_CACHE[key] = (paths, positions, with_ids)
    return paths



def _bm25_over_documents(spark: SparkSession, sf_dir: str, mode: str) -> DataFrame:
    """Top-k BM25 for the fixed query set over `documents`.

    mode="brute"   → pure-Catalyst brute path (bm25_brute);
    mode="index"   → build the segment index (delta+varint postings,
                     block-max) in a temp dir, answer via the MaxScore kernel;
    mode="merged"  → additionally run the salted global merge and answer
                     from the merged posting lists (merged_topk — the B5
                     consumer). All three share ONE oracle — the point of
                     the correctness gate.
    mode="deleted" → index path after tombstoning DELETED_ORIG_IDS
                     (Lucene stale-stats semantics: full-corpus stats, the
                     deleted docs masked out of every result — the oracle
                     mirrors this with a pre-rank exclusion filter).
    """
    from mtix_spark.index.search import bm25_brute

    docs = _tbl(spark, sf_dir, "documents")
    n_docs = docs.count()
    dl = docs.select("doc_id", F.size(tokenize("text")).alias("dl"))
    avgdl = dl.agg(F.avg(F.col("dl").cast("double"))).collect()[0][0]
    if mode == "brute":
        tf = _docs_tf(docs)
        qdf = spark.createDataFrame(FIXED_QUERIES, "query_id long, text string")
        out = bm25_brute(tf, dl, qdf, n_docs, avgdl, k=TOPK)
    else:
        from mtix_spark.index.build import merge_postings
        from mtix_spark.index.search import bm25_topk_segments, merged_topk

        # dense ids assigned by (repo, path, commit) order != original doc_id;
        # map back through the docmap (path carries the original id).
        # merged/deleted MUTATE the index -> private build; plain index mode
        # shares the session-cached one
        paths = _docs_index(spark, sf_dir, private=mode in ("merged", "deleted"))
        # fetch k plus a tie margin: the engine tie-breaks on dense ids, the
        # oracle on original ids — a rounded-score tie exactly at rank k
        # could otherwise select a different (equally valid) doc set. With
        # the margin, re-ranking on original ids below is set-identical to
        # the oracle unless >4k docs tie at the boundary.
        if mode == "merged":
            merge_postings(spark, paths, hot_df=50)  # force the salted hot path
            pdf = merged_topk(spark, paths, FIXED_QUERIES, k=TOPK * 5)
            res = spark.createDataFrame(
                pdf[["query_id", "doc_id", "score"]],
                "query_id long, doc_id long, score double",
            )
        elif mode == "deleted":
            from mtix_spark.index.deletes import delete_docs

            dense_victims = [
                r["doc_id"]
                for r in spark.read.parquet(paths.docmap)
                .filter(F.col("path").cast("long").isin(DELETED_ORIG_IDS))
                .select("doc_id")
                .collect()
            ]
            delete_docs(spark, paths, dense_victims)
            res = bm25_topk_segments(spark, paths, FIXED_QUERIES, k=TOPK * 5)
        else:
            res = bm25_topk_segments(spark, paths, FIXED_QUERIES, k=TOPK * 5)
        docmap = spark.read.parquet(paths.docmap).select(
            F.col("doc_id").alias("dense_id"), F.col("path").cast("long").alias("orig_id")
        )
        # scores are docID-independent; re-rank on original ids for the oracle
        res = (
            res.withColumnRenamed("doc_id", "dense_id")
            .join(docmap, "dense_id")
            .select("query_id", F.col("orig_id").alias("doc_id"), "score")
        )
        w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_id"))
        out = (
            res.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= TOPK)
            .select("query_id", "rank", "doc_id", "score")
        )
    return out.select(
        "query_id", F.col("rank").cast("long").alias("rank"), "doc_id", "score"
    )


def q_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _bm25_over_documents(spark, sf_dir, mode="brute")


def q_bm25_index_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _bm25_over_documents(spark, sf_dir, mode="index")


def q_bm25_merged_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _bm25_over_documents(spark, sf_dir, mode="merged")


BM25F_FIELDS = {"text": 1.0, "source": 3.0}
BM25F_QUERIES = [
    (1, "hash join src1"),
    (2, "table scan src4"),
    (3, "merge batch"),
    (4, "src9 value"),
]


def q_bm25f_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-field BM25F over (text, source): weighted field tf combined
    BEFORE saturation (see mtix_spark.index.search.bm25f_topk)."""
    from mtix_spark.index.search import bm25f_topk

    docs = _tbl(spark, sf_dir, "documents")
    qdf = spark.createDataFrame(BM25F_QUERIES, "query_id long, text string")
    out = bm25f_topk(docs, BM25F_FIELDS, qdf, k=TOPK)
    return out.select(
        "query_id", F.col("rank").cast("long").alias("rank"), "doc_id", "score"
    )


def _bm25f_oracle() -> str:
    toks_text = TOK.format(c="text")
    toks_src = TOK.format(c="source")
    w_text, w_src = BM25F_FIELDS["text"], BM25F_FIELDS["source"]
    vals = ", ".join(
        f"({q}, '{t}')"
        for q, text in BM25F_QUERIES
        for t in sorted({x for x in re.split("[^a-z0-9_]+", text.lower()) if x})
    )
    return f"""
WITH f1 AS (
  SELECT doc_id, term, count(*) * {w_text} AS wtf
  FROM (SELECT doc_id, unnest({toks_text}) AS term FROM documents) GROUP BY 1, 2
),
f2 AS (
  SELECT doc_id, term, count(*) * {w_src} AS wtf
  FROM (SELECT doc_id, unnest({toks_src}) AS term FROM documents) GROUP BY 1, 2
),
ctf AS (
  SELECT doc_id, term, sum(wtf) AS ctf
  FROM (SELECT * FROM f1 UNION ALL SELECT * FROM f2) GROUP BY 1, 2
),
cdl AS (
  SELECT doc_id,
         len({toks_text}) * {w_text} + len({toks_src}) * {w_src} AS cdl
  FROM documents
),
stats AS (
  SELECT (SELECT count(*) FROM documents)::BIGINT AS n,
         (SELECT avg(cdl) FROM cdl) AS avgdl
),
q(query_id, term) AS (VALUES {vals}),
dfreq AS (
  SELECT term, count(*)::BIGINT AS df FROM ctf
  WHERE term IN (SELECT term FROM q) GROUP BY 1
),
scored AS (
  SELECT q.query_id, ctf.doc_id,
         round(sum(
           ln(1.0 + (s.n - d.df + 0.5) / (d.df + 0.5))
           * (ctf.ctf * 2.2)
           / (ctf.ctf + 1.2 * (1.0 - 0.75 + 0.75 * cdl.cdl / s.avgdl))
         ), 6) AS score
  FROM q
  JOIN ctf USING (term)
  JOIN dfreq d USING (term)
  JOIN cdl ON cdl.doc_id = ctf.doc_id
  CROSS JOIN stats s
  GROUP BY 1, 2
)
SELECT query_id, rank, doc_id, score FROM (
  SELECT query_id, doc_id, score,
         row_number() OVER (PARTITION BY query_id ORDER BY score DESC, doc_id) AS rank
  FROM scored
) WHERE rank <= {TOPK}
"""


def q_bm25_facets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Faceted search: per-query lang distribution of the BM25 top-k —
    the index result re-entering relational analytics (one broadcast-able
    join of k×queries rows against the docs table)."""
    topk = _bm25_over_documents(spark, sf_dir, mode="brute")
    docs = _tbl(spark, sf_dir, "documents").select("doc_id", "lang")
    return (
        topk.join(docs, "doc_id")
        .groupBy("query_id", "lang")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("score"), 6).alias("score_mass"),
        )
    )


def _facet_oracle() -> str:
    return f"""
WITH base AS ({_bm25_oracle()})
SELECT query_id, lang, count(*)::BIGINT AS n,
       round(sum(score), 6) AS score_mass
FROM base JOIN documents USING (doc_id)
GROUP BY 1, 2
"""


DELETED_ORIG_IDS = [2, 5, 11, 17, 23, 40]


def q_bm25_deleted_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _bm25_over_documents(spark, sf_dir, mode="deleted")


def q_bm25_and_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conjunctive (AND-semantics) BM25 top-k: docs containing EVERY query
    term (B11 posting intersection). Relational path here; the physical
    rarest-first-intersection kernel is asserted row-identical to this in
    tests/test_index.py."""
    from mtix_spark.index.search import bm25_conjunctive_brute

    docs = _tbl(spark, sf_dir, "documents")
    n_docs = docs.count()
    dl = docs.select("doc_id", F.size(tokenize("text")).alias("dl"))
    avgdl = dl.agg(F.avg(F.col("dl").cast("double"))).collect()[0][0]
    tf = _docs_tf(docs)
    qdf = spark.createDataFrame(FIXED_QUERIES, "query_id long, text string")
    out = bm25_conjunctive_brute(tf, dl, qdf, n_docs, avgdl, k=TOPK)
    return out.select(
        "query_id", F.col("rank").cast("long").alias("rank"), "doc_id", "score"
    )


def _bm25_oracle(conjunctive: bool = False, exclude: list[int] | None = None) -> str:
    vals = ", ".join(f"({q}, '{t}')" for q, t in _q_terms())
    toks = TOK.format(c="text")
    having = (
        "\n  HAVING count(*) = (SELECT count(*) FROM q q2 WHERE q2.query_id = q.query_id)"
        if conjunctive
        else ""
    )
    where_rank = (
        f"  WHERE doc_id NOT IN ({', '.join(str(i) for i in exclude)})\n"
        if exclude
        else ""
    )
    return f"""
WITH toks AS (
  SELECT doc_id, unnest({toks}) AS term FROM documents
),
tf AS (SELECT doc_id, term, count(*)::BIGINT AS tf FROM toks GROUP BY 1, 2),
dl AS (SELECT doc_id, len({toks})::DOUBLE AS dl FROM documents),
stats AS (
  SELECT (SELECT count(*) FROM documents)::BIGINT AS n,
         (SELECT avg(dl) FROM dl) AS avgdl
),
q(query_id, term) AS (VALUES {vals}),
dfreq AS (
  SELECT term, count(*)::BIGINT AS df FROM tf
  WHERE term IN (SELECT term FROM q) GROUP BY 1
),
scored AS (
  SELECT q.query_id, tf.doc_id,
         round(sum(
           ln(1.0 + (s.n - d.df + 0.5) / (d.df + 0.5))
           * (tf.tf * 2.2)
           / (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * dl.dl / s.avgdl))
         ), 6) AS score
  FROM q
  JOIN tf USING (term)
  JOIN dfreq d USING (term)
  JOIN dl ON dl.doc_id = tf.doc_id
  CROSS JOIN stats s
  GROUP BY 1, 2{having}
)
SELECT query_id, rank, doc_id, score FROM (
  SELECT query_id, doc_id, score,
         row_number() OVER (PARTITION BY query_id ORDER BY score DESC, doc_id) AS rank
  FROM scored
{where_rank}) WHERE rank <= {TOPK}
"""


FIXED_PHRASES = [
    (1, "table hash"),
    (2, "part filter"),
    (3, "part filter scan"),
    (4, "zzz_oov qqq_oov"),
]


def q_phrase_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-phrase match counts (relational path): posexplode token stream,
    chain adjacency self-joins — the Catalyst twin of the positional-index
    kernel. Full match set (no top-k), so results are docID-mapping-free."""
    from mtix_spark.index.positions import phrase_match_relational

    docs = _tbl(spark, sf_dir, "documents")
    outs = []
    for qid, ph in FIXED_PHRASES:
        m = phrase_match_relational(docs, ph, id_col="doc_id", text_col="text")
        outs.append(m.select(F.lit(qid).cast("long").alias("query_id"), "doc_id", "n_occ"))
    res = outs[0]
    for o in outs[1:]:
        res = res.unionByName(o)
    return res


def q_phrase_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-phrase match via the PHYSICAL positional index (positions/seg=K
    delta+varint postings; vectorized adjacency-chain kernel), remapped from
    dense ids to original doc_ids. Shares q_phrase_match's oracle — the
    index path and the SQL oracle must agree row-for-row on (doc, count)."""
    from mtix_spark.index.positions import phrase_topk

    paths = _docs_index(spark, sf_dir, positions=True)
    res = phrase_topk(spark, paths, FIXED_PHRASES, k=1_000_000)  # full set
    docmap = spark.read.parquet(paths.docmap).select(
        F.col("doc_id").alias("dense_id"), F.col("path").cast("long").alias("orig_id")
    )
    return (
        res.withColumnRenamed("doc_id", "dense_id")
        .join(docmap, "dense_id")
        .select("query_id", F.col("orig_id").alias("doc_id"), "n_occ")
    )


def _phrase_oracle() -> str:
    toks = TOK.format(c="text")
    parts = []
    for qid, ph in FIXED_PHRASES:
        words = [w for w in re.split("[^a-z0-9_]+", ph.lower()) if w]
        joins = "\n".join(
            f"JOIN toks t{j} ON t{j}.doc_id = t0.doc_id AND t{j}.pos = t0.pos + {j} "
            f"AND t{j}.term = '{w}'"
            for j, w in enumerate(words[1:], start=1)
        )
        parts.append(
            f"SELECT {qid}::BIGINT AS query_id, t0.doc_id, count(*)::BIGINT AS n_occ\n"
            f"FROM toks t0 {joins}\nWHERE t0.term = '{words[0]}' GROUP BY 1, 2"
        )
    body = "\nUNION ALL\n".join(parts)
    return f"""
WITH toks AS (
  SELECT doc_id, unnest(l) AS term, generate_subscripts(l, 1) - 1 AS pos
  FROM (SELECT doc_id, {toks} AS l FROM documents)
)
{body}
"""


BOOL_QUERIES = [
    (1, "hash +join -slow"),
    (2, '"table hash" scan'),
    (3, "merge +value -batch"),
    (4, 'part -"part filter" filter'),
    (5, "table hash lang:en"),
    (6, "scan value -lang:en +table"),
    (7, "table^3 hash scan^0.5"),
    (8, "+join^2 value -slow"),
    (9, '"hash join"~2 value'),       # sloppy-phrase filter (ordered span)
    (10, '-"table scan"~3 +part'),    # negated sloppy phrase
]


def q_boolean_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lucene-style boolean query language: +must, -not, \"phrase\" filters
    over BM25 scoring (mtix_spark.query.boolean_search)."""
    from mtix_spark.query import _bool_ctx, boolean_search

    docs = _tbl(spark, sf_dir, "documents")
    tf, dl, n_docs, avgdl = _bool_ctx(docs, "doc_id", "text")
    ctx = (tf.persist(), dl.persist(), n_docs, avgdl)  # one corpus scan
    outs = []
    for qid, q in BOOL_QUERIES:
        outs.append(
            boolean_search(docs, q, k=TOPK, ctx=ctx).select(
                F.lit(qid).cast("long").alias("query_id"), "rank", "doc_id", "score"
            )
        )
    res = outs[0]
    for o in outs[1:]:
        res = res.unionByName(o)
    return res


def _boolean_oracle() -> str:
    from mtix_spark.query import parse_query

    toks = TOK.format(c="text")
    qvals = []
    branches = []
    for qid, q in BOOL_QUERIES:
        bq = parse_query(q)
        for t in bq.scoring_terms:
            qvals.append(f"({qid}, '{t}', {bq.boosts.get(t, 1.0)})")
        conds = [f"query_id = {qid}"]
        for t in sorted(set(bq.must)):
            conds.append(
                f"EXISTS (SELECT 1 FROM tf x WHERE x.doc_id = s.doc_id AND x.term = '{t}')"
            )
        for t in sorted(set(bq.must_not)):
            conds.append(
                f"NOT EXISTS (SELECT 1 FROM tf x WHERE x.doc_id = s.doc_id AND x.term = '{t}')"
            )

        def phrase_exists(words: list[str]) -> str:
            joins = " ".join(
                f"JOIN stream t{j} ON t{j}.doc_id = t0.doc_id "
                f"AND t{j}.pos = t0.pos + {j} AND t{j}.term = '{w}'"
                for j, w in enumerate(words[1:], start=1)
            )
            return (
                f"(SELECT 1 FROM stream t0 {joins} "
                f"WHERE t0.doc_id = s.doc_id AND t0.term = '{words[0]}')"
            )

        def span_exists(words: list[str], slop: int) -> str:
            n = len(words)
            chain = f"({_span_chain_sql(words[1:], 't1', 'stream')})"
            return (
                f"(SELECT 1 FROM stream t1 WHERE t1.term = '{words[0]}'"
                f" AND t1.doc_id = s.doc_id"
                f" AND {chain} - t1.pos - {n - 1} <= {slop})"
            )

        for ph in bq.phrases:
            conds.append(f"EXISTS {phrase_exists(ph)}")
        for ph in bq.not_phrases:
            conds.append(f"NOT EXISTS {phrase_exists(ph)}")
        for ph, slop in bq.slop_phrases:
            conds.append(f"EXISTS {span_exists(ph, slop)}")
        for ph, slop in bq.not_slop_phrases:
            conds.append(f"NOT EXISTS {span_exists(ph, slop)}")
        for col, value, neg in bq.filters:
            ex = (
                f"EXISTS (SELECT 1 FROM documents d WHERE d.doc_id = s.doc_id "
                f"AND d.{col}::VARCHAR = '{value}')"
            )
            conds.append(f"NOT {ex}" if neg else ex)
        branches.append("(" + " AND ".join(conds) + ")")
    return f"""
WITH toklists AS (SELECT doc_id, {toks} AS l FROM documents),
stream AS (
  SELECT doc_id, unnest(l) AS term, generate_subscripts(l, 1) - 1 AS pos
  FROM toklists
),
tf AS (SELECT doc_id, term, count(*)::BIGINT AS tf FROM stream GROUP BY 1, 2),
dl AS (SELECT doc_id, len(l)::DOUBLE AS dl FROM toklists),
stats AS (
  SELECT (SELECT count(*) FROM documents)::BIGINT AS n,
         (SELECT avg(dl) FROM dl) AS avgdl
),
q(query_id, term, boost) AS (VALUES {', '.join(qvals)}),
dfreq AS (
  SELECT term, count(*)::BIGINT AS df FROM tf
  WHERE term IN (SELECT term FROM q) GROUP BY 1
),
scored AS (
  SELECT q.query_id, tf.doc_id,
         round(sum(
           q.boost * ln(1.0 + (s.n - d.df + 0.5) / (d.df + 0.5))
           * (tf.tf * 2.2)
           / (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * dl.dl / s.avgdl))
         ), 6) AS score
  FROM q
  JOIN tf USING (term)
  JOIN dfreq d USING (term)
  JOIN dl ON dl.doc_id = tf.doc_id
  CROSS JOIN stats s
  GROUP BY 1, 2
)
SELECT query_id, rank, doc_id, score FROM (
  SELECT query_id, doc_id, score,
         row_number() OVER (PARTITION BY query_id ORDER BY score DESC, doc_id) AS rank
  FROM scored s
  WHERE {' OR '.join(branches)}
) WHERE rank <= {TOPK}
"""


SNIPPET_WINDOW = 2


def q_phrase_snippets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Highlighting: token snippet around each matching doc's first phrase
    occurrence (positions consumer; relational twin oracled here)."""
    from mtix_spark.index.positions import phrase_snippets

    docs = _tbl(spark, sf_dir, "documents")
    outs = []
    for qid, ph in FIXED_PHRASES[:3]:  # skip the OOV probe (empty set)
        s = phrase_snippets(docs, ph, window=SNIPPET_WINDOW, text_col="text")
        outs.append(
            s.select(
                F.lit(qid).cast("long").alias("query_id"),
                "doc_id", "n_occ", F.col("first_pos").cast("long").alias("first_pos"),
                "snippet",
            )
        )
    res = outs[0]
    for o in outs[1:]:
        res = res.unionByName(o)
    return res


def _snippet_oracle() -> str:
    toks = TOK.format(c="text")
    w = SNIPPET_WINDOW
    parts = []
    for qid, ph in FIXED_PHRASES[:3]:
        words = [t for t in re.split("[^a-z0-9_]+", ph.lower()) if t]
        m = len(words)
        joins = "\n".join(
            f"JOIN stream t{j} ON t{j}.doc_id = t0.doc_id AND t{j}.pos = t0.pos + {j} "
            f"AND t{j}.term = '{x}'"
            for j, x in enumerate(words[1:], start=1)
        )
        parts.append(f"""
SELECT {qid}::BIGINT AS query_id, h.doc_id, h.n_occ, h.first_pos,
       array_to_string(l[greatest(h.first_pos - {w} + 1, 1) : h.first_pos + {m} + {w}], ' ') AS snippet
FROM (
  SELECT t0.doc_id, count(*)::BIGINT AS n_occ, min(t0.pos)::BIGINT AS first_pos
  FROM stream t0 {joins}
  WHERE t0.term = '{words[0]}' GROUP BY 1
) h JOIN toklists USING (doc_id)""")
    body = "\nUNION ALL\n".join(parts)
    return f"""
WITH toklists AS (SELECT doc_id, {toks} AS l FROM documents),
stream AS (
  SELECT doc_id, unnest(l) AS term, generate_subscripts(l, 1) - 1 AS pos
  FROM toklists
)
{body}
"""


CONTAM_PROBE_IDS = [3, 7]
CONTAM_N = 3  # 3-grams give real cross-doc hits on the synthetic corpus


def q_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: docs sharing a token 5-gram with either
    probe document (the probes stand in for a held-out benchmark set)."""
    from mtix_spark.dedup import contaminated_docs

    docs = _tbl(spark, sf_dir, "documents")
    probes = docs.filter(F.col("doc_id").isin(CONTAM_PROBE_IDS)).select(
        F.col("doc_id").alias("probe_id"), "text"
    )
    return contaminated_docs(
        docs, probes, n=CONTAM_N, probe_text_col="text"
    )


def _contamination_oracle() -> str:
    toks = TOK.format(c="text")
    n = CONTAM_N
    ids = ", ".join(str(i) for i in CONTAM_PROBE_IDS)
    gram = " || ' ' || ".join(f"l[i+{j}]" for j in range(1, n + 1))
    return f"""
WITH sh AS (
  SELECT doc_id, unnest(list_distinct(list_transform(
    range(len(l) - {n - 1}), i -> {gram}
  ))) AS sh
  FROM (SELECT doc_id, {toks} AS l FROM documents)
  WHERE len(l) >= {n}
),
psh AS (SELECT doc_id AS probe_id, sh FROM sh WHERE doc_id IN ({ids}))
SELECT d.doc_id, p.probe_id, count(DISTINCT d.sh)::BIGINT AS n_shared
FROM sh d JOIN psh p USING (sh)
GROUP BY 1, 2
"""


def q_doc_sha256(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _tbl(spark, sf_dir, "documents")
    return docs.select("doc_id", F.sha2(F.col("text"), 256).alias("content_sha"))


# ---------------------------------------------------------------------------
# text analysis
# ---------------------------------------------------------------------------


def q_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _tbl(spark, sf_dir, "documents")
    return docs.select(
        "doc_id", F.size(tokenize("text")).cast("long").alias("n_tokens")
    )


def q_language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    # split-once form: tokenize projected once (see functions.text docstring)
    from mtix_spark.functions.text import with_language_id

    docs = _tbl(spark, sf_dir, "documents")
    return with_language_id(docs, "text").select("doc_id", "lang_pred")


def _language_id_oracle() -> str:
    from mtix_spark.functions.text import _LANG_PROFILES

    toks = TOK.format(c="text")
    cols = {
        lang: f"len(list_intersect(list_distinct({toks}), {words!r}))"
        for lang, words in _LANG_PROFILES.items()
    }
    en, de, fr, es = cols["en"], cols["de"], cols["fr"], cols["es"]
    return f"""
SELECT doc_id,
  CASE
    WHEN {en} > 0 AND {en} >= {de} AND {en} >= {fr} AND {en} >= {es} THEN 'en'
    WHEN {de} > 0 AND {de} >= {fr} AND {de} >= {es} THEN 'de'
    WHEN {fr} > 0 AND {fr} >= {es} THEN 'fr'
    WHEN {es} > 0 THEN 'es'
    ELSE 'und'
  END AS lang_pred
FROM documents
"""


def q_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mtix_spark.functions.text import with_quality_score

    docs = _tbl(spark, sf_dir, "documents")
    return with_quality_score(docs, "text").select(
        "doc_id", F.round("quality", 6).alias("quality")
    )


def _quality_expr() -> str:
    """Raw SQL mirror of functions.text.quality_score (unrounded)."""
    from mtix_spark.functions.text import _STOPWORDS

    toks = TOK.format(c="text")
    return f"""CASE WHEN len({toks}) > 0 THEN
    0.4 * least(length(text)::DOUBLE / 1000.0, 1.0)
    + 0.3 * (CASE WHEN length(text) > 0 THEN
        length(regexp_replace(lower(text), '[^a-z0-9]', '', 'g'))::DOUBLE
        / length(text)::DOUBLE ELSE 0.0 END)
    + 0.3 * (len(list_intersect(list_distinct({toks}), {_STOPWORDS!r}))::DOUBLE / 10.0)
  ELSE 0.0 END"""


def _quality_oracle() -> str:
    return f"""
SELECT doc_id, round({_quality_expr()}, 6) AS quality
FROM documents
"""


def q_doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    # xxhash64 has no portable SQL twin → rows-only check (tested in tests/)
    docs = _tbl(spark, sf_dir, "documents")
    return docs.select("doc_id", doc_fingerprint("text").alias("fingerprint"))


def q_rolling_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    # order-sensitive polynomial rolling hash — md5-derived, SQL-exact
    from mtix_spark.functions.text import rolling_fingerprint

    docs = _tbl(spark, sf_dir, "documents")
    return docs.select("doc_id", rolling_fingerprint("text").alias("fp"))


def _rolling_fp_oracle() -> str:
    from mtix_spark.functions.text import ROLL_B, ROLL_P

    toks = TOK.format(c="text")
    return f"""
SELECT doc_id,
       list_reduce(
         list_prepend(0::BIGINT, list_transform({toks},
           t -> CAST(('0x' || substr(md5(t), 1, 8))::UBIGINT AS BIGINT))),
         (a, b) -> (a * {ROLL_B} + b) % {ROLL_P}
       ) AS fp
FROM documents
"""


def q_bpe_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mtix_spark.functions.text import bpe_token_count

    docs = _tbl(spark, sf_dir, "documents")
    return docs.select("doc_id", bpe_token_count("text").cast("long").alias("n_bpe"))


def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mtix_spark.streaming.ingest import sessionize_batch

    ev = _tbl(spark, sf_dir, "events")
    return sessionize_batch(ev, gap_minutes=30)


def q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    # for each event: value of the same user's latest at-or-before purchase
    from mtix_spark.joins import asof_join

    ev = _tbl(spark, sf_dir, "events")
    # one right row per (user, ts): equal-instant ties would otherwise be
    # resolved differently by the two engines
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("pvalue"))
    )
    out = asof_join(
        ev.select("event_id", "user_id", "ts"),
        purchases,
        on=["user_id"],
        value_cols=["pvalue"],
    )
    return out.select(
        "event_id", "user_id", "asof_ts", F.round("asof_pvalue", 6).alias("asof_value")
    )


# ---------------------------------------------------------------------------
# dedup
# ---------------------------------------------------------------------------


def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    return exact_dedup_groups(_tbl(spark, sf_dir, "documents"))


def q_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup connected components: MinHash-LSH pairs → canonical
    cluster ids (keep cluster_id == doc_id; drop the rest)."""
    from mtix_spark.dedup import dedup_clusters

    docs = _tbl(spark, sf_dir, "documents")
    pairs = minhash_lsh_pairs(docs, threshold=0.4)
    return dedup_clusters(docs, pairs)


def q_dedup_clusters_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same components, computed by the O(log n)-round large-star/small-star
    algorithm — shares dedup_clusters' recursive-CTE oracle (identical
    fixpoint), so the driver hash-proves the two algorithms agree."""
    from mtix_spark.dedup import dedup_clusters_star

    docs = _tbl(spark, sf_dir, "documents")
    pairs = minhash_lsh_pairs(docs, threshold=0.4)
    return dedup_clusters_star(docs, pairs)


def _dedup_clusters_oracle() -> str:
    return f"""
WITH RECURSIVE pairs AS ({_minhash_oracle()}),
edges AS (
  SELECT id_a AS src, id_b AS dst FROM pairs
  UNION ALL
  SELECT id_b, id_a FROM pairs
),
reach(id, lbl) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT e.dst, r.lbl FROM reach r JOIN edges e ON e.src = r.id
)
SELECT id AS doc_id, min(lbl)::BIGINT AS cluster_id FROM reach GROUP BY 1
"""


SAMPLE_RATES = {"en": 0.5, "de": 0.25, "fr": 1.0}


def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-language downsampling of the corpus (hash-keyed —
    identical sample on every run at any parallelism)."""
    from mtix_spark.sampling import stratified_hash_sample

    docs = _tbl(spark, sf_dir, "documents")
    return stratified_hash_sample(
        docs, SAMPLE_RATES, stratum_col="lang", key_col="doc_id", default_rate=0.1
    ).select("doc_id", "lang")


def _stratified_sample_oracle() -> str:
    from mtix_spark.sampling import BUCKETS

    whens = " ".join(
        f"WHEN lang = '{v}' THEN {int(r * BUCKETS)}"
        for v, r in sorted(SAMPLE_RATES.items())
    )
    return f"""
SELECT doc_id, lang FROM documents
WHERE CAST(('0x' || substr(md5(doc_id::VARCHAR), 1, 12))::UBIGINT AS BIGINT) % {BUCKETS}
      < (CASE {whens} ELSE {int(0.1 * BUCKETS)} END)
"""


PACK_LEN = 64          # tokens per training sequence (small so docs span)
TRAIN_SHARDS = 4
EPOCH_SALT = "ep1"


def q_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GPT-style concat-and-chunk packing: each doc's global token offset
    (two-phase prefix sum, no global sort) and the chunk span it lands in."""
    from mtix_spark.packing import pack_sequences

    docs = _tbl(spark, sf_dir, "documents")
    return pack_sequences(docs, PACK_LEN)


def q_pack_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-chunk census of the packing (docs touching + tokens landing in
    each fixed-length sequence)."""
    from mtix_spark.packing import pack_chunks

    docs = _tbl(spark, sf_dir, "documents")
    return pack_chunks(docs, PACK_LEN)


def q_training_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seeded deterministic global shuffle split into reader shards —
    identical training stream on any cluster size / rerun."""
    from mtix_spark.packing import training_order

    docs = _tbl(spark, sf_dir, "documents")
    return training_order(docs, TRAIN_SHARDS, salt=EPOCH_SALT)


def _pack_base_sql() -> str:
    toks = TOK.format(c="text")
    return f"""
d AS (SELECT doc_id, len({toks})::BIGINT AS n_tok FROM documents),
c AS (
  SELECT doc_id, n_tok,
         (sum(n_tok) OVER (ORDER BY doc_id) - n_tok)::BIGINT AS start_tok
  FROM d WHERE n_tok > 0
)"""


def _pack_sequences_oracle() -> str:
    return f"""
WITH {_pack_base_sql()}
SELECT doc_id, n_tok, start_tok,
       (start_tok // {PACK_LEN})::BIGINT AS first_chunk,
       ((start_tok + n_tok - 1) // {PACK_LEN})::BIGINT AS last_chunk
FROM c
"""


def _pack_chunks_oracle() -> str:
    return f"""
WITH {_pack_base_sql()},
spans AS (
  SELECT doc_id, start_tok, n_tok,
         unnest(generate_series(
           (start_tok // {PACK_LEN}), ((start_tok + n_tok - 1) // {PACK_LEN})
         )) AS chunk_id
  FROM c
)
SELECT chunk_id::BIGINT AS chunk_id, count(*)::BIGINT AS n_docs,
       sum(least(start_tok + n_tok, (chunk_id + 1) * {PACK_LEN})
           - greatest(start_tok, chunk_id * {PACK_LEN}))::BIGINT AS n_tok
FROM spans GROUP BY 1
"""


def _training_order_oracle() -> str:
    from mtix_spark.sampling import BUCKETS

    return f"""
WITH h AS (
  SELECT doc_id,
         CAST(('0x' || substr(md5('{EPOCH_SALT}' || doc_id::VARCHAR), 1, 12))::UBIGINT AS BIGINT)
           % {BUCKETS} AS bucket
  FROM documents
)
SELECT doc_id, (bucket % {TRAIN_SHARDS})::BIGINT AS shard,
       row_number() OVER (
         PARTITION BY bucket % {TRAIN_SHARDS} ORDER BY bucket, doc_id
       )::BIGINT AS pos
FROM h
"""


def q_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ngram_jaccard_pairs(_tbl(spark, sf_dir, "documents"), threshold=0.15)


def _ngram_jaccard_oracle() -> str:
    toks = TOK.format(c="text")
    return f"""
WITH sh AS (
  SELECT doc_id AS id, unnest(list_distinct(list_transform(
    range(len({toks}) - 2),
    i -> {toks}[i+1] || ' ' || {toks}[i+2] || ' ' || {toks}[i+3]
  ))) AS sh
  FROM documents WHERE len({toks}) >= 3
),
sizes AS (SELECT id, count(*)::BIGINT AS n FROM sh GROUP BY 1),
inter AS (
  SELECT a.id AS id_a, b.id AS id_b, count(*)::BIGINT AS ni
  FROM sh a JOIN sh b ON a.sh = b.sh AND a.id < b.id
  GROUP BY 1, 2
)
SELECT id_a, id_b,
       round(ni / (sa.n + sb.n - ni)::DOUBLE, 6) AS jaccard
FROM inter
JOIN sizes sa ON sa.id = id_a
JOIN sizes sb ON sb.id = id_b
WHERE round(ni / (sa.n + sb.n - ni)::DOUBLE, 6) >= 0.15
"""


def q_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    return minhash_lsh_pairs(_tbl(spark, sf_dir, "documents"), threshold=0.4)


def _minhash_oracle() -> str:
    perms = ", ".join(f"({i}, {a}, {b})" for i, a, b in _perm_params())
    toks = TOK.format(c="text")
    return f"""
WITH toks AS (
  SELECT doc_id AS id, unnest(list_distinct({toks})) AS term FROM documents
),
th AS (
  SELECT id, term,
         CAST(('0x' || substr(md5(term), 1, 8))::UBIGINT AS BIGINT) AS h
  FROM toks
),
perms(perm, a, b) AS (VALUES {perms}),
mh AS (
  SELECT id, perm, min((a * h + b) % {MINHASH_PRIME}) AS minhash
  FROM th CROSS JOIN perms GROUP BY 1, 2
),
bands AS (
  SELECT id, perm // {ROWS_PER_BAND} AS band,
         string_agg(minhash::VARCHAR, ',' ORDER BY perm) AS bandsig
  FROM mh GROUP BY 1, 2
),
cand AS (
  SELECT DISTINCT a.id AS id_a, b.id AS id_b
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.bandsig = b.bandsig AND a.id < b.id
),
sizes AS (SELECT id, count(*)::BIGINT AS n FROM toks GROUP BY 1),
inter AS (
  SELECT a.id AS id_a, b.id AS id_b, count(*)::BIGINT AS ni
  FROM toks a JOIN toks b ON a.term = b.term AND a.id < b.id
  GROUP BY 1, 2
)
SELECT c.id_a, c.id_b,
       round(i.ni / (sa.n + sb.n - i.ni)::DOUBLE, 6) AS jaccard
FROM cand c
JOIN inter i ON i.id_a = c.id_a AND i.id_b = c.id_b
JOIN sizes sa ON sa.id = c.id_a
JOIN sizes sb ON sb.id = c.id_b
WHERE round(i.ni / (sa.n + sb.n - i.ni)::DOUBLE, 6) >= 0.4
"""


def q_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    return simhash32(_tbl(spark, sf_dir, "documents")).select(
        F.col("id").alias("doc_id"), "simhash"
    )


def _simhash_oracle() -> str:
    toks = TOK.format(c="text")
    return f"""
WITH toks AS (
  SELECT doc_id AS id, unnest({toks}) AS term FROM documents
),
tf AS (
  SELECT id, term, count(*)::BIGINT AS tf,
         CAST(('0x' || substr(md5(term), 1, 8))::UBIGINT AS BIGINT) AS h
  FROM toks GROUP BY 1, 2
),
signed AS (
  SELECT id, bit.range AS bit,
         sum(tf * (((h >> bit.range) & 1) * 2 - 1)) AS s
  FROM tf CROSS JOIN range(32) bit
  GROUP BY 1, 2
)
SELECT id AS doc_id,
       sum(CASE WHEN s > 0 THEN (1::BIGINT << bit) ELSE 0 END)::BIGINT AS simhash
FROM signed GROUP BY 1
"""


def q_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return simhash_dup_pairs(_tbl(spark, sf_dir, "documents"), max_hamming=3)


def _simhash_pairs_oracle() -> str:
    base = _simhash_oracle()
    return f"""
WITH sim AS ({base})
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       bit_count(xor(a.simhash, b.simhash))::INT AS hamming
FROM sim a JOIN sim b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
"""


# ---------------------------------------------------------------------------
# similarity search
# ---------------------------------------------------------------------------


def q_knn_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = knn_cosine_brute(_tbl(spark, sf_dir, "embeddings"), KNN_QUERY_IDS, k=TOPK)
    return out.select(
        "query_id", F.col("rank").cast("long").alias("rank"), "vec_id", "cosine"
    )


def _knn_oracle(query_ids: list[int] | None = None) -> str:
    ids = ", ".join(str(i) for i in (query_ids or KNN_QUERY_IDS))

    def dot(x, y):
        return f"list_sum(list_transform(range(64), i -> {x}[i+1]::DOUBLE * {y}[i+1]::DOUBLE))"

    return f"""
WITH q AS (
  SELECT vec_id AS query_id, embedding AS qv FROM embeddings
  WHERE vec_id IN ({ids})
),
scored AS (
  SELECT q.query_id, e.vec_id,
         round({dot('q.qv', 'e.embedding')}
               / (sqrt({dot('q.qv', 'q.qv')}) * sqrt({dot('e.embedding', 'e.embedding')})),
               6) AS cosine
  FROM embeddings e CROSS JOIN q
  WHERE e.vec_id <> q.query_id
)
SELECT query_id, rank, vec_id, cosine FROM (
  SELECT query_id, vec_id, cosine,
         row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, vec_id) AS rank
  FROM scored
) WHERE rank <= {TOPK}
"""


def q_knn_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sign-LSH kNN in full-radius multi-probe mode (VERDICT r4 #3): every
    bucket within Hamming distance n_planes is probed, so the candidate set
    is the whole corpus and the output must be RANK-IDENTICAL to brute
    cosine — the recall→1 limit of multi-probe LSH, value-hash-checked
    against the brute SQL oracle. The hashing/bucketing/probe machinery is
    the exact code the production config runs; the approximate config stays
    under `knn_lsh_probe` (rows-only + recall pytest)."""
    out = knn_cosine_lsh(
        _tbl(spark, sf_dir, "embeddings"), KNN_QUERY_IDS, k=TOPK,
        n_tables=2, n_planes=6, multiprobe_radius=6,
    )
    return out.select(
        "query_id", F.col("rank").cast("long").alias("rank"), "vec_id", "cosine"
    )


def q_knn_lsh_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    # the production approximate config (sign-LSH buckets, no probe
    # widening) → rows-only check; recall vs brute asserted in pytest
    out = knn_cosine_lsh(_tbl(spark, sf_dir, "embeddings"), KNN_QUERY_IDS, k=TOPK)
    return out.select(
        "query_id", F.col("rank").cast("long").alias("rank"), "vec_id", "cosine"
    )


HYBRID_QUERY_IDS = [qid for qid, _ in FIXED_QUERIES]


def q_hybrid_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid lexical+vector search: BM25 top-k over `documents` fused with
    cosine top-k over `embeddings` by reciprocal-rank fusion (RRF, SIGIR'09)
    — rank-based fusion needs no calibration between BM25 and cosine space.
    Query vector for query_id q = embedding row vec_id == q (self excluded
    on the vector leg). Relational legs; shares its oracle with the
    physical-index twin `hybrid_rrf_index`."""
    from mtix_spark.hybrid import hybrid_rrf_topk

    docs = _tbl(spark, sf_dir, "documents")
    emb = _tbl(spark, sf_dir, "embeddings")
    out = hybrid_rrf_topk(docs, emb, FIXED_QUERIES, k=TOPK, leg_k=TOPK)
    return out.select(
        "query_id", F.col("rank").cast("long").alias("rank"), "doc_id", "score"
    )


def q_hybrid_rrf_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid RRF with the lexical leg answered from the PHYSICAL inverted
    index (block-max MaxScore kernel), dense ids remapped through the
    docmap before fusing — must agree row-for-row with q_hybrid_rrf's
    relational legs and the shared DuckDB oracle."""
    from mtix_spark.hybrid import hybrid_rrf_index

    paths = _docs_index(spark, sf_dir)
    docmap = spark.read.parquet(paths.docmap).select(
        F.col("doc_id").alias("dense_id"), F.col("path").cast("long").alias("doc_id")
    )
    emb = _tbl(spark, sf_dir, "embeddings")
    out = hybrid_rrf_index(
        spark, paths, emb, FIXED_QUERIES, k=TOPK, leg_k=TOPK, id_map=docmap
    )
    return out.select(
        "query_id", F.col("rank").cast("long").alias("rank"), "doc_id", "score"
    )


def _hybrid_oracle() -> str:
    from mtix_spark.hybrid import RRF_K

    return f"""
WITH lex AS ({_bm25_oracle()}),
vec AS ({_knn_oracle(HYBRID_QUERY_IDS)}),
contrib AS (
  SELECT query_id, doc_id, 1.0 / ({RRF_K} + rank) AS c FROM lex
  UNION ALL
  SELECT query_id, vec_id AS doc_id, 1.0 / ({RRF_K} + rank) AS c FROM vec
),
fused AS (
  SELECT query_id, doc_id, round(sum(c), 6) AS score FROM contrib GROUP BY 1, 2
)
SELECT query_id, rank, doc_id, score FROM (
  SELECT query_id, doc_id, score,
         row_number() OVER (PARTITION BY query_id ORDER BY score DESC, doc_id) AS rank
  FROM fused
) WHERE rank <= {TOPK}
"""


def q_function_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FunctionScoreQuery / field_value_factor: BM25 relevance multiplied by
    a document-length prior ln(1 + n_chars), re-ranked AFTER the boost (a
    boost can promote a doc from below any fixed relevance cut, so the
    relational path ranks the full matched set)."""
    from mtix_spark.expand import function_score_topk

    docs = _tbl(spark, sf_dir, "documents")
    out = function_score_topk(
        docs,
        FIXED_QUERIES,
        factor=F.log(F.lit(1.0) + F.col("n_chars")),
        k=TOPK,
    )
    return out.select(
        "query_id", F.col("rank").cast("long").alias("rank"), "doc_id", "score"
    )


def _function_score_oracle() -> str:
    vals = ", ".join(f"({q}, '{t}')" for q, t in _q_terms())
    cte = f"exp(query_id, term) AS (VALUES {vals})"
    return _expanded_bm25_oracle(cte, boost_expr="ln(1.0 + doc.n_chars)")


def _remap_rerank(spark: SparkSession, paths, res: DataFrame, k: int = TOPK) -> DataFrame:
    """Shared index-entry epilogue: dense→original id remap through the
    docmap, then re-rank under the oracle's (score DESC, doc_id ASC)
    tie-break — callers fetch a tie margin (k×5) first, the standard
    discipline of _bm25_over_documents."""
    docmap = spark.read.parquet(paths.docmap).select(
        F.col("doc_id").alias("dense_id"), F.col("path").cast("long").alias("orig_id")
    )
    res = (
        res.withColumnRenamed("doc_id", "dense_id")
        .join(docmap, "dense_id")
        .select("query_id", F.col("orig_id").alias("doc_id"), "score")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        res.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id", F.col("rank").cast("long").alias("rank"), "doc_id", "score"
        )
    )


MIN_MATCH_M = 2


def q_min_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """minimum_should_match=2 (Lucene BooleanQuery msm): disjunctive BM25
    where only docs matching ≥ 2 distinct query terms may rank; every
    matched term still contributes to the score. Relational twin — shares
    its oracle with q_min_match_index."""
    from mtix_spark.expand import expanded_bm25

    docs = _tbl(spark, sf_dir, "documents")
    exp = spark.createDataFrame(_q_terms(), "query_id long, term string")
    out = expanded_bm25(docs, exp, k=TOPK, min_match=MIN_MATCH_M)
    return out.select(
        "query_id", F.col("rank").cast("long").alias("rank"), "doc_id", "score"
    )


def q_min_match_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """minimum_should_match=2 from the PHYSICAL index: the MaxScore kernel
    tracks a per-candidate distinct-term count and restricts admission when
    either the remaining-term count can't reach the threshold or the k-th
    qualifying candidate beats the remaining bound (search.py kernel
    contract) — must agree row-for-row with the relational twin's oracle."""
    from mtix_spark.index.search import bm25_topk_segments

    paths = _docs_index(spark, sf_dir)
    res = bm25_topk_segments(
        spark, paths, FIXED_QUERIES, k=TOPK * 5, min_match=MIN_MATCH_M
    )
    return _remap_rerank(spark, paths, res)


def _min_match_oracle() -> str:
    vals = ", ".join(f"({q}, '{t}')" for q, t in _q_terms())
    cte = f"exp(query_id, term) AS (VALUES {vals})"
    return _expanded_bm25_oracle(cte, min_match=MIN_MATCH_M)


def q_function_score_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FunctionScoreQuery at the PHYSICAL index: boost-aware MaxScore with
    the factor ln(1 + dl) computed from the stored per-segment doc lengths
    (the one per-doc field the index already serves executor-locally);
    every block-max bound is scaled by the segment's max factor and θ is
    evaluated in boosted space, so pruning stays exact under the boost."""
    from mtix_spark.index.search import bm25_topk_segments

    paths = _docs_index(spark, sf_dir)
    res = bm25_topk_segments(
        spark, paths, FIXED_QUERIES, k=TOPK * 5, dl_factor="log1p_dl"
    )
    return _remap_rerank(spark, paths, res)


def _function_score_index_oracle() -> str:
    vals = ", ".join(f"({q}, '{t}')" for q, t in _q_terms())
    cte = f"exp(query_id, term) AS (VALUES {vals})"
    dl_of_doc = "len(" + TOK.format(c="doc.text") + ")"
    return _expanded_bm25_oracle(cte, boost_expr=f"ln(1.0 + {dl_of_doc})")


DIS_MAX_TIE = 0.3


def q_dis_max(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DisjunctionMaxQuery over the query's term clauses: score = best
    clause + 0.3 × remainder (Lucene dis_max tie_breaker) — same candidate
    set and plan shape as the disjunctive sum, different aggregate."""
    from mtix_spark.expand import dis_max_topk

    docs = _tbl(spark, sf_dir, "documents")
    out = dis_max_topk(docs, FIXED_QUERIES, tie_breaker=DIS_MAX_TIE, k=TOPK)
    return out.select(
        "query_id", F.col("rank").cast("long").alias("rank"), "doc_id", "score"
    )


def _dis_max_oracle() -> str:
    vals = ", ".join(f"({q}, '{t}')" for q, t in _q_terms())
    cte = f"exp(query_id, term) AS (VALUES {vals})"
    return _expanded_bm25_oracle(
        cte, agg_sql=f"max({{C}}) + {DIS_MAX_TIE} * (sum({{C}}) - max({{C}}))"
    )


MM_FIELDS = ["text", "source"]


def _mm_terms() -> list[tuple[int, str]]:
    return [
        (q, t)
        for q, text in BM25F_QUERIES
        for t in sorted({x for x in re.split("[^a-z0-9_]+", text.lower()) if x})
    ]


def q_multi_match_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """multi_match best_fields over (text, source): each field scored as an
    independent BM25 query (per-field stats — NOT BM25F's pre-saturation
    combine), doc score = best field + 0.3 × remainder."""
    from mtix_spark.expand import multi_match_topk

    docs = _tbl(spark, sf_dir, "documents")
    out = multi_match_topk(
        docs, MM_FIELDS, BM25F_QUERIES, mode="best_fields",
        tie_breaker=DIS_MAX_TIE, k=TOPK,
    )
    return out.select(
        "query_id", F.col("rank").cast("long").alias("rank"), "doc_id", "score"
    )


def q_multi_match_most(spark: SparkSession, sf_dir: str) -> DataFrame:
    """multi_match most_fields: sum of the per-field BM25 scores."""
    from mtix_spark.expand import multi_match_topk

    docs = _tbl(spark, sf_dir, "documents")
    out = multi_match_topk(
        docs, MM_FIELDS, BM25F_QUERIES, mode="most_fields", k=TOPK
    )
    return out.select(
        "query_id", F.col("rank").cast("long").alias("rank"), "doc_id", "score"
    )


def _multi_match_oracle(mode: str) -> str:
    vals = ", ".join(f"({q}, '{t}')" for q, t in _mm_terms())
    cte = f"exp(query_id, term) AS (VALUES {vals})"
    legs = {
        f: _expanded_bm25_oracle(cte, k=None, text_col=f) for f in MM_FIELDS
    }
    if mode == "most_fields":
        comb = "round(sum(score), 6)"
    else:
        comb = f"round(max(score) + {DIS_MAX_TIE} * (sum(score) - max(score)), 6)"
    return f"""
WITH lt AS ({legs['text']}),
ls AS ({legs['source']}),
contrib AS (SELECT * FROM lt UNION ALL SELECT * FROM ls),
comb AS (
  SELECT query_id, doc_id, {comb} AS score FROM contrib GROUP BY 1, 2
)
SELECT query_id, rank, doc_id, score FROM (
  SELECT query_id, doc_id, score,
         row_number() OVER (PARTITION BY query_id ORDER BY score DESC, doc_id) AS rank
  FROM comb
) WHERE rank <= {TOPK}
"""


def q_dis_max_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dis_max from the PHYSICAL index: `_dismax_kernel` processes clauses
    UB-descending and bounds an unseen doc by (1−tie)·UB_i + tie·suffix_ub
    — the max-aware MaxScore argument. Shares the relational twin's oracle."""
    paths = _docs_index(spark, sf_dir)
    from mtix_spark.index.search import SegmentSearcher

    res = SegmentSearcher(spark, paths, persist=False).search_dis_max(
        FIXED_QUERIES, k=TOPK * 5, tie_breaker=DIS_MAX_TIE
    )
    return _remap_rerank(spark, paths, res)


RESCORE_WINDOW = 30
RESCORE_QW, RESCORE_RW = 0.7, 0.3


def q_rescore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Elasticsearch-style rescore: BM25 top-30 window per query, re-ranked
    by 0.7·bm25 + 0.3·LM-Dirichlet — the expensive scorer touches only the
    window, never the corpus (mtix_spark.expand.rescore_topk)."""
    from mtix_spark.expand import rescore_topk

    docs = _tbl(spark, sf_dir, "documents")
    out = rescore_topk(
        docs,
        FIXED_QUERIES,
        window=RESCORE_WINDOW,
        query_weight=RESCORE_QW,
        rescore_weight=RESCORE_RW,
        k=TOPK,
    )
    return out.select(
        "query_id", F.col("rank").cast("long").alias("rank"), "doc_id", "score"
    )


def _rescore_oracle() -> str:
    vals = ", ".join(f"({q}, '{t}')" for q, t in _q_terms())
    cte = f"exp(query_id, term) AS (VALUES {vals})"
    first = _expanded_bm25_oracle(cte, k=RESCORE_WINDOW)
    lm = _lm_oracle(k=None)
    return f"""
WITH first AS ({first}),
lm AS ({lm}),
joined AS (
  SELECT f.query_id, f.doc_id,
         round({RESCORE_QW} * f.score + {RESCORE_RW} * l.score, 6) AS score
  FROM first f JOIN lm l ON l.query_id = f.query_id AND l.doc_id = f.doc_id
)
SELECT query_id, rank, doc_id, score FROM (
  SELECT query_id, doc_id, score,
         row_number() OVER (PARTITION BY query_id ORDER BY score DESC, doc_id) AS rank
  FROM joined
) WHERE rank <= {TOPK}
"""


SIG_FG_TERM = "hash"
SIG_K, SIG_MIN_FG = 25, 3


def q_significant_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Elasticsearch significant_terms (JLH): terms overrepresented in the
    docs containing 'hash' vs the whole corpus — one exploded
    groupBy with the foreground flag folded in, TakeOrderedAndProject cut."""
    from mtix_spark.functions.text import significant_terms

    docs = _tbl(spark, sf_dir, "documents")
    fg = F.array_contains(tokenize(F.col("text")), SIG_FG_TERM)
    return significant_terms(docs, "text", fg, k=SIG_K, min_fg_df=SIG_MIN_FG)


def _significant_terms_oracle() -> str:
    toks = TOK.format(c="text")
    return f"""
WITH dt AS (
  SELECT DISTINCT doc_id, unnest({toks}) AS term FROM documents
),
flag AS (
  SELECT d.doc_id,
         CASE WHEN f.doc_id IS NOT NULL THEN 1 ELSE 0 END AS fg
  FROM documents d
  LEFT JOIN (SELECT DISTINCT doc_id FROM dt WHERE term = '{SIG_FG_TERM}') f
    ON f.doc_id = d.doc_id
),
counts AS (
  SELECT dt.term, sum(flag.fg)::BIGINT AS df_fg, count(*)::BIGINT AS df_bg
  FROM dt JOIN flag ON flag.doc_id = dt.doc_id GROUP BY 1
),
tot AS (
  SELECT (SELECT sum(fg) FROM flag)::DOUBLE AS n_fg,
         (SELECT count(*) FROM documents)::DOUBLE AS n_docs
)
SELECT term, df_fg, df_bg,
       round((df_fg / n_fg - df_bg / n_docs) * ((df_fg / n_fg) / (df_bg / n_docs)), 6) AS score
FROM counts CROSS JOIN tot
WHERE df_fg >= {SIG_MIN_FG} AND df_fg / n_fg > df_bg / n_docs
ORDER BY score DESC, term
LIMIT {SIG_K}
"""


def q_embed_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mtix_spark.similarity import embedding_near_dup_pairs

    return embedding_near_dup_pairs(_tbl(spark, sf_dir, "embeddings"), threshold=0.35)


def q_embed_near_dup_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH near-dup in full-radius multi-probe mode (VERDICT r4 #3): with
    every bucket probed the candidate set is all pairs, so the output must
    be value-identical to the all-pairs twin — same bucket-join machinery
    as production, now under the exact SQL oracle. The approximate config
    stays under `embed_near_dup_lsh_probe` (rows-only + recall pytest)."""
    from mtix_spark.similarity import embedding_near_dup_pairs_lsh

    return embedding_near_dup_pairs_lsh(
        _tbl(spark, sf_dir, "embeddings"), threshold=0.35,
        n_tables=1, n_planes=4, multiprobe_radius=4,
    )


def q_embed_near_dup_lsh_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    # the production approximate config (bucketed candidates, no probe
    # widening) → rows-only check; recall + no-cartesian plan asserted in
    # tests/test_extensions.py
    from mtix_spark.similarity import embedding_near_dup_pairs_lsh

    return embedding_near_dup_pairs_lsh(_tbl(spark, sf_dir, "embeddings"), threshold=0.35)


def _embed_near_dup_oracle() -> str:
    def dot(x, y):
        return f"list_sum(list_transform(range(64), i -> {x}[i+1]::DOUBLE * {y}[i+1]::DOUBLE))"

    return f"""
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       round({dot('a.embedding', 'b.embedding')}
             / (sqrt({dot('a.embedding', 'a.embedding')}) * sqrt({dot('b.embedding', 'b.embedding')})),
             6) AS cosine
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
WHERE round({dot('a.embedding', 'b.embedding')}
            / (sqrt({dot('a.embedding', 'a.embedding')}) * sqrt({dot('b.embedding', 'b.embedding')})),
            6) >= 0.35
"""


# ---------------------------------------------------------------------------
# mtix pipeline parity (runs, fusion, threshold, dims) over events/TPC-H
# ---------------------------------------------------------------------------


def q_topn_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _tbl(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    run = ev.select(
        F.col("user_id").alias("q_id"),
        F.col("event_id").alias("p_id"),
        F.col("value").alias("score"),
    )
    return top_n_per_query(run, 3).select(
        "q_id", "p_id", F.round("score", 6).alias("score")
    )


def q_run_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _tbl(spark, sf_dir, "events")
    r1 = (
        ev.filter(F.col("event_id") % 2 == 0)
        .groupBy(F.col("user_id").alias("q_id"), F.col("event_type").alias("p_id"))
        .agg(F.sum("value").alias("score"))
    )
    r2 = (
        ev.filter(F.col("event_id") % 2 == 1)
        .groupBy(F.col("user_id").alias("q_id"), F.col("event_type").alias("p_id"))
        .agg(F.sum("value").alias("score"))
    )
    return fuse_runs_avg(r1, r2).select(
        "q_id", "p_id", F.round("score", 6).alias("score")
    )


def q_threshold_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _tbl(spark, sf_dir, "events")
    vmax = ev.agg(F.max("value")).collect()[0][0]
    run = ev.select(
        F.col("user_id").alias("q_id"),
        F.col("event_id").alias("p_id"),
        (F.col("value") / F.lit(float(vmax))).alias("score"),
    )
    out = top_n_per_query(threshold_filter(run, 0.48), 5)
    return out.select("q_id", "p_id", F.round("score", 6).alias("score"))


def q_dim_join_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _tbl(spark, sf_dir, "lineitem")
    o = _tbl(spark, sf_dir, "orders")
    c = _tbl(spark, sf_dir, "customer")
    n = _tbl(spark, sf_dir, "nation")
    r = _tbl(spark, sf_dir, "region")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1.0 - F.col("l_discount"))), 4).alias(
                "revenue"
            ),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


def q_tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _tbl(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 4).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 4).alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


def q_tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _tbl(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1994-01-01"))
            & (F.col("l_shipdate") < F.lit("1995-01-01"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 4).alias(
                "revenue"
            )
        )
    )


def q_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _tbl(spark, sf_dir, "customer")
    o = _tbl(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select("c_custkey")


def q_intersect_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _tbl(spark, sf_dir, "events")
    first = (
        ev.filter(F.col("ts") < F.lit("2024-01-16"))
        .select("user_id", "event_type")
        .distinct()
    )
    second = (
        ev.filter(F.col("ts") >= F.lit("2024-01-16"))
        .select("user_id", "event_type")
        .distinct()
    )
    return first.intersect(second)


def q_events_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _tbl(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.window("ts", "1 day").alias("w"), "event_type"
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .select(
            F.to_date(F.col("w.start")).alias("day"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def q_tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _tbl(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = _tbl(spark, sf_dir, "orders").filter(F.col("o_orderdate") < F.lit("1995-03-15"))
    li = _tbl(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > F.lit("1995-03-15"))
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("revenue")
        )
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
        .select(
            "l_orderkey",
            F.to_date("o_orderdate").alias("o_orderdate"),
            "o_orderpriority",
            "revenue",
        )
    )


def q_tpch_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    # full Q5 shape: revenue per nation where customer and supplier share it
    li = _tbl(spark, sf_dir, "lineitem")
    o = _tbl(spark, sf_dir, "orders")
    c = _tbl(spark, sf_dir, "customer")
    s = _tbl(spark, sf_dir, "supplier")
    n = _tbl(spark, sf_dir, "nation")
    r = _tbl(spark, sf_dir, "region")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .filter(F.col("c_nationkey") == F.col("s_nationkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("revenue")
        )
    )


def q_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    # clicks within 1h after each purchase of the same user (interval join)
    from mtix_spark.joins import range_join

    ev = _tbl(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), "user_id", "ts"
    )
    c = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"), "user_id", F.col("ts").alias("cts")
    )
    joined = range_join(
        p, c, on=["user_id"], left_ts="ts", right_ts="cts", lower_s=0, upper_s=3600
    )
    return joined.select("purchase_id", "click_id")


def q_cube_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _tbl(spark, sf_dir, "documents")
    return docs.cube("lang", "source").agg(
        F.count(F.lit(1)).alias("n"), F.sum("n_chars").alias("chars")
    )


def q_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    # exact linear-interpolation percentiles per event_type
    ev = _tbl(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.round(F.expr("percentile(value, 0.5)"), 6).alias("p50"),
        F.round(F.expr("percentile(value, 0.95)"), 6).alias("p95"),
    )


def q_tpch_q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Q4 shape (adapted to available columns): priority counts over orders
    # having at least one returned lineitem — EXISTS → left-semi join
    o = _tbl(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01"))
        & (F.col("o_orderdate") < F.lit("1997-01-01"))
    )
    li = _tbl(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    return (
        o.join(li, o.o_orderkey == li.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


def q_tpch_q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Q7 shape: shipping volume between two nations by ship year
    # (supplier nation → customer nation, both directions)
    li = _tbl(spark, sf_dir, "lineitem")
    o = _tbl(spark, sf_dir, "orders")
    c = _tbl(spark, sf_dir, "customer")
    s = _tbl(spark, sf_dir, "supplier")
    n1 = _tbl(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("sk"), F.col("n_name").alias("supp_nation")
    )
    n2 = _tbl(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("ck"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
        | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n1), s.s_nationkey == F.col("sk"))
        .join(F.broadcast(n2), c.c_nationkey == F.col("ck"))
        .filter(pair)
        .groupBy(
            "supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year")
        )
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("revenue")
        )
    )


def q_tpch_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Q10: top customers by revenue lost to returned items
    c = _tbl(spark, sf_dir, "customer")
    o = _tbl(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01"))
        & (F.col("o_orderdate") < F.lit("1996-07-01"))
    )
    li = _tbl(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = _tbl(spark, sf_dir, "nation")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, o.o_orderkey == li.l_orderkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("revenue")
        )
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


def q_tpch_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Q14 shape: promo revenue share over one month (conditional agg)
    li = _tbl(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-03-01"))
        & (F.col("l_shipdate") < F.lit("1996-04-01"))
    )
    p = _tbl(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .agg(
            F.round(
                F.lit(100.0)
                * F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(0.0))
                / F.sum(rev),
                6,
            ).alias("promo_revenue_pct")
        )
    )


def q_tpch_q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Q19 shape: disjunction of brand/size/quantity predicate branches —
    # Catalyst pushes the common join key and ORs the residual filter
    li = _tbl(spark, sf_dir, "lineitem")
    p = _tbl(spark, sf_dir, "part")
    j = li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
    branch1 = (
        (F.col("p_brand") == "Brand#1")
        & (F.col("p_size").between(1, 15))
        & (F.col("l_quantity").between(1, 11))
    )
    branch2 = (
        (F.col("p_brand") == "Brand#2")
        & (F.col("p_size").between(1, 25))
        & (F.col("l_quantity").between(10, 20))
    )
    branch3 = (
        (F.col("p_brand") == "Brand#3")
        & (F.col("p_size").between(1, 35))
        & (F.col("l_quantity").between(20, 30))
    )
    return j.filter(branch1 | branch2 | branch3).agg(
        F.round(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
        ).alias("revenue")
    )


def q_rollup_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _tbl(spark, sf_dir, "documents")
    return docs.rollup("lang", "source").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("n_chars").alias("chars"),
    )


def q_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _tbl(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_users"),
        F.count(F.lit(1)).alias("n_events"),
    )


def q_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    # window frame beyond ranking: per-user running value ordered by event
    ev = _tbl(spark, sf_dir, "events").filter(F.col("user_id") < 50)
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.asc("ts"), F.asc("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return ev.select(
        "user_id",
        "event_id",
        F.round(F.sum("value").over(w), 6).alias("running_value"),
    )


def q_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    # customers with no urgent order — non-trivial anti-join at every sf
    c = _tbl(spark, sf_dir, "customer")
    o = _tbl(spark, sf_dir, "orders").filter(F.col("o_orderpriority") == "1-URGENT")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey")


def q_mti_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship parity chain, flattened for the oracle: BM25 retrieval
    (the replaced stage) → fuse with a doc-quality prior (J6) → threshold
    (P3) → per-query top-5 (A1) → dim join (J2: doc source) → ranked rows.
    """
    bm25 = _bm25_over_documents(spark, sf_dir, mode="brute")
    docs = _tbl(spark, sf_dir, "documents")
    prior = docs.select(
        "doc_id", (quality_score("text") * 10.0).alias("prior")
    )
    fused = (
        bm25.join(prior, "doc_id")
        .select(
            "query_id",
            "doc_id",
            F.round((F.col("score") + F.col("prior")) / 2.0, 6).alias("fscore"),
        )
        .filter(F.col("fscore") >= 1.0)
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("fscore"), F.asc("doc_id"))
    top = (
        fused.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 5)
    )
    dim = docs.select("doc_id", "source")
    return top.join(F.broadcast(dim), "doc_id").select(
        "query_id", F.col("rank").cast("long").alias("rank"), "doc_id", "source", "fscore"
    )


def q_sanitize_years(spark: SparkSession, sf_dir: str) -> DataFrame:
    # F3/F4 parity: null-fill cascade + clamp over order years
    o = _tbl(spark, sf_dir, "orders")
    raw = F.when(F.col("o_orderstatus") == "O", F.lit(None).cast("int")).otherwise(
        F.year("o_orderdate")
    )
    return o.select(
        "o_orderkey",
        clamp_year(F.coalesce(raw, F.lit(2023)), 1902).alias("pub_year"),
    )


def q_replace_brackets(spark: SparkSession, sf_dir: str) -> DataFrame:
    # P5 parity: bracket rewrite on a synthesized bracketed column
    docs = _tbl(spark, sf_dir, "documents")
    s = F.concat(F.lit("["), F.substring("text", 1, 30), F.lit("] [tail]"))
    return docs.select("doc_id", replace_brackets(s).alias("fixed"))


def q_query_template(spark: SparkSession, sf_dir: str) -> DataFrame:
    # F1 parity: '{a}|{b}|{c}' concat template
    docs = _tbl(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.concat_ws(
            "|", F.col("lang"), F.col("source"), F.substring("text", 1, 40)
        ).alias("qtext"),
    )


# ---------------------------------------------------------------------------
# round-3 additions: metrics-as-query, tf-idf features, date histogram
# ---------------------------------------------------------------------------

_SUB_VALUES = ["surgery", "therapy", "blood", ""]  # 2 critical, 1 not, 1 empty


def _metric_triples(docs: DataFrame, lo: int, hi: int) -> DataFrame:
    """Deterministic (q_id, label, sub) triples derived from `documents` —
    synthetic ground-truth/prediction frames for the metrics operators
    (doc_id % 7 selects overlapping-but-different subsets)."""
    return docs.filter((F.col("doc_id") % 7 >= lo) & (F.col("doc_id") % 7 <= hi)).select(
        (F.col("doc_id") % 50).alias("q_id"),
        F.col("lang").alias("label"),
        F.element_at(
            F.array(*[F.lit(v) for v in _SUB_VALUES]), (F.col("doc_id") % 4 + 1).cast("int")
        ).alias("sub"),
    )


def _q_prf(spark: SparkSession, sf_dir: str, critical: bool) -> DataFrame:
    from mtix_spark.pipeline import CRITICAL_SUBHEADINGS, run_metrics

    docs = _tbl(spark, sf_dir, "documents")
    y_true = _metric_triples(docs, 0, 4)
    y_pred = _metric_triples(docs, 2, 6)
    kf = ("sub", CRITICAL_SUBHEADINGS) if critical else None
    m = run_metrics(y_true, y_pred, ["q_id", "label", "sub"], key_filter=kf)
    return m.select(
        F.round("precision", 6).alias("precision"),
        F.round("recall", 6).alias("recall"),
        F.round("f1", 6).alias("f1"),
        "n_true", "n_pred", "n_inter",
    )


def q_prf_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6 as a registry operator: P/R/F1 over distinct triples, truth
    restricted to predicted q_ids (integration_tests/utils.py:8-38)."""
    return _q_prf(spark, sf_dir, critical=False)


def q_prf_metrics_critical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The CRITICAL_SUBHEADINGS-filtered metric set
    (integration_tests/test_pipelines.py:103-106): non-critical, non-empty
    subs drop from both sides before counting."""
    return _q_prf(spark, sf_dir, critical=True)


def q_tfidf_vectors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L2-normalized smooth tf-idf weights (sklearn convention:
    idf = ln((1+N)/(1+df)) + 1) for every term of each sampled doc — the
    classic sparse feature-extraction step of a text pipeline. One tf
    shuffle + one broadcast-joined df relation + one per-doc norm agg."""
    docs = _tbl(spark, sf_dir, "documents")
    n_docs = docs.count()
    tf = _docs_tf(docs)
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    sampled = tf.filter(F.col("doc_id") % 20 == 0)
    w = sampled.join(F.broadcast(dfreq), "term").withColumn(
        "wraw",
        F.col("tf")
        * (F.log((F.lit(1.0) + n_docs) / (F.lit(1.0) + F.col("df"))) + F.lit(1.0)),
    )
    nrm = w.groupBy("doc_id").agg(F.sqrt(F.sum(F.col("wraw") * F.col("wraw"))).alias("nn"))
    return w.join(nrm, "doc_id").select(
        "doc_id", "term", F.round(F.col("wraw") / F.col("nn"), 6).alias("weight")
    )


# ---------------------------------------------------------------------------
# trigram substring/regex grep (index.trigram — the codesearch candidate-
# pruning layer; new r05 capability, north-rule corpus = source code)
# ---------------------------------------------------------------------------

GREP_NEEDLES = [
    (1, "merge batch"),
    (2, "table part"),
    (3, "scan slow fast"),
    (4, "ag"),  # shorter than one gram — exercises the verify-scan fallback
    (5, "zz_absent_zz"),  # no hits; gram short-circuit
]
GREP_ICASE_NEEDLES = [
    (1, "MERGE Batch"),  # lowercase corpus — only variant classes find it
    (2, "Table PART"),
    (3, "ZZ_Absent"),
]
GREP_PATTERNS = [
    (1, "merge [a-z]+ batch"),
    (2, "slow|fast"),  # per-branch mandatory literals, union of candidates
    (3, "scan [a-z]+ [a-z]+ table"),
    (4, "the|[0-9]{9}"),  # digit branch has no literal — verify-scan fallback
]

_TRI_CACHE: dict[tuple, object] = {}


def _docs_trigrams(spark: SparkSession, sf_dir: str):
    """Trigram index over `documents` (original doc ids), one cached build
    per (session, sf_dir) — deterministic, so reuse cannot change results."""
    key = (sf_dir, spark.sparkContext.applicationId)
    p = _TRI_CACHE.get(key)
    if p is None:
        from mtix_spark.index.trigram import build_trigram_index

        docs = _tbl(spark, sf_dir, "documents").select(
            "doc_id", F.col("text").alias("content")
        )
        p = build_trigram_index(
            spark, docs, tempfile.mkdtemp(prefix="mtix_tri_"), n_segments=4
        )
        _TRI_CACHE[key] = p
    return p


def q_trigram_postings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The trigram gram dictionary itself: (gram, df) — value-checks the
    index build (per-doc-distinct gram extraction + per-seg posting df)
    against a pure-SQL trigram expansion."""
    p = _docs_trigrams(spark, sf_dir)
    return spark.read.parquet(p.dictionary).select("gram", "df")


def q_grep_substring(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Substring grep THROUGH the trigram index (AND-intersected posting
    lists -> contains-verify on candidates only); the oracle scans."""
    from mtix_spark.index.trigram import grep_substring

    p = _docs_trigrams(spark, sf_dir)
    docs = _tbl(spark, sf_dir, "documents").select(
        "doc_id", F.col("text").alias("content")
    )
    return grep_substring(spark, p, docs, GREP_NEEDLES).orderBy(
        "query_id", "doc_id"
    )


def q_grep_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex grep with mandatory-literal trigram pruning (R. Cox's
    codesearch construction); literal-free branches verify-scan."""
    from mtix_spark.index.trigram import grep_regex

    p = _docs_trigrams(spark, sf_dir)
    docs = _tbl(spark, sf_dir, "documents").select(
        "doc_id", F.col("text").alias("content")
    )
    return grep_regex(spark, p, docs, GREP_PATTERNS).orderBy(
        "query_id", "doc_id"
    )


def q_grep_icase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Case-insensitive substring grep against the CASE-SENSITIVE gram
    index: each needle gram becomes a class of its <=8 case variants and
    a doc must match >=1 variant per class (smart-case against a cased
    index); verify lowers both sides."""
    from mtix_spark.index.trigram import grep_substring

    p = _docs_trigrams(spark, sf_dir)
    docs = _tbl(spark, sf_dir, "documents").select(
        "doc_id", F.col("text").alias("content")
    )
    return grep_substring(
        spark, p, docs, GREP_ICASE_NEEDLES, case_insensitive=True
    ).orderBy("query_id", "doc_id")


# ---------------------------------------------------------------------------
# percolator — reverse search: stored queries matched against incoming docs
# (mtix_spark.percolate; new r05 capability — the ingest-time routing/
# alerting primitive, reference parity: the fixed rule set every incoming
# citation is tested against in /root/reference/src/mtix/pipelines.py)
# ---------------------------------------------------------------------------


def _perc_specs():
    from mtix_spark.percolate import StoredQuery

    return [
        StoredQuery(1, "all", ["scan", "table"]),
        StoredQuery(2, "all", ["merge", "batch", "window"]),
        StoredQuery(3, "any", ["zz_absent_zz", "varint"]),
        StoredQuery(4, "min", ["scan", "slow", "fast", "table", "row"], min_match=4),
        StoredQuery(5, "all", ["agg", "row"], must_not=["slow"]),
        StoredQuery(6, "any", ["spark"], must_not=["fast", "slow"]),
        StoredQuery(7, "min", ["key", "value", "hash", "join"], min_match=2),
        StoredQuery(8, "all", ["zz_never_matches"]),  # zero-hit short-circuit
    ]


def _perc_phrase_specs():
    from mtix_spark.percolate import StoredQuery

    return [
        StoredQuery(11, "phrase", phrase="slow fast"),
        StoredQuery(12, "phrase", phrase="scan slow fast"),
        StoredQuery(13, "phrase", phrase="fast slow"),
        StoredQuery(14, "phrase", phrase="table value part"),
        StoredQuery(15, "phrase", phrase="zz absent"),
    ]


def q_percolate_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stored-query routing over the doc stream: all/any/min_match modes
    with must_not exclusions, one broadcast of the exploded query-term
    table, one output-bounded groupBy — the corpus never shuffles on
    anything query-dependent (see mtix_spark/percolate.py)."""
    from mtix_spark.percolate import percolate, queries_df

    docs = _tbl(spark, sf_dir, "documents")
    qs = queries_df(spark, _perc_specs())
    return percolate(docs, qs).orderBy("query_id", "doc_id")


def q_percolate_phrase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Phrase-mode percolation: term-set candidates from the same broadcast
    join, adjacency verified on the normalized token stream of CANDIDATE
    docs only."""
    from mtix_spark.percolate import percolate, queries_df

    docs = _tbl(spark, sf_dir, "documents")
    qs = queries_df(spark, _perc_phrase_specs())
    return percolate(docs, qs).orderBy("query_id", "doc_id")


def q_knn_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN in full-probe mode (VERDICT r4 #3): nprobe == n_centroids
    probes every inverted list, so the candidate set is the whole corpus
    and the output must be RANK-IDENTICAL to brute cosine — the same
    k-means training, assignment and list-probe machinery the production
    config runs, value-hash-checked against the brute SQL oracle (the
    in-repo full-probe==brute pytest, surfaced to the driver gate). The
    approximate config stays under `knn_ivf_probe` (rows-only + recall
    pytest)."""
    from mtix_spark.similarity import knn_cosine_ivf

    out = knn_cosine_ivf(
        _tbl(spark, sf_dir, "embeddings"), KNN_QUERY_IDS, k=TOPK,
        n_centroids=16, nprobe=16,
    )
    return out.select(
        "query_id", F.col("rank").cast("long").alias("rank"), "vec_id", "cosine"
    )


def q_knn_ivf_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The production approximate IVF config (nprobe 6 of 16 lists) —
    candidate set is quantizer-dependent → rows-only check; recall vs
    brute asserted in pytest (tests/test_extensions.py)."""
    from mtix_spark.similarity import knn_cosine_ivf

    out = knn_cosine_ivf(
        _tbl(spark, sf_dir, "embeddings"), KNN_QUERY_IDS, k=TOPK,
        n_centroids=16, nprobe=6,
    )
    return out.select(
        "query_id", F.col("rank").cast("long").alias("rank"), "vec_id", "cosine"
    )


def q_gopher_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher repetition rules: per-doc duplicate-token and duplicate-
    3-gram fractions (training-data quality gate)."""
    from mtix_spark.functions.text import with_repetition_stats

    docs = _tbl(spark, sf_dir, "documents")
    return with_repetition_stats(docs, "text", n=3).select(
        "doc_id", "n_tokens", "dup_token_frac", "dup_ngram_frac"
    )


def q_boilerplate_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style boilerplate dictionary: 5-grams occurring in >= 3 distinct
    docs (corpus-frequency discovery; one explode + one gram-keyed agg)."""
    from mtix_spark.dedup import boilerplate_ngrams

    return boilerplate_ngrams(_tbl(spark, sf_dir, "documents"), n=5, min_docs=3)


def q_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII masking over a deterministically PII-planted text column: emails
    and NNN-NNN-NNNN phones -> typed placeholders (JVM regexp chain)."""
    from mtix_spark.functions.text import scrub_pii

    docs = _tbl(spark, sf_dir, "documents")
    planted = F.concat(
        F.substring("text", 1, 50),
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@mail.example.com or 555-123-4567 now"),
    )
    return docs.select("doc_id", scrub_pii(planted).alias("clean_text"))


def q_duplicate_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact duplicated-substring spans (suffix-array-style dedup re-grained
    to token 8-grams): 8-token grams shared by >= 2 distinct docs, merged
    into maximal per-doc islands (gaps-and-islands window). One gram-keyed
    count-distinct agg + a LEFT SEMI join back — the corpus never
    self-joins."""
    from mtix_spark.dedup import duplicate_spans

    return duplicate_spans(_tbl(spark, sf_dir, "documents"), n=8, min_docs=2)


def q_scrub_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Span-level scrubbing: duplicate_spans' flagged token ranges removed
    from each document's text (positional Column lambda filter; survivors
    re-joined) — keeps the unique parts instead of dropping whole docs."""
    from mtix_spark.dedup import duplicate_spans, scrub_spans

    docs = _tbl(spark, sf_dir, "documents")
    return scrub_spans(docs, duplicate_spans(docs, n=8, min_docs=2))


def q_split_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Long-document chunking (split_long_docs, the remedy for the 2^22
    packed-position bound) at max_tokens=32 over `documents`: per source
    doc, the number of ordered chunks produced and the total token count —
    the oracle checks the invariants n_chunks = max(1, ceil(n_tokens/32))
    and token conservation across chunks."""
    from mtix_spark.functions.text import tokenize
    from mtix_spark.index.build import split_long_docs

    docs = _tbl(spark, sf_dir, "documents")
    corpus = docs.select(
        F.lit("corpus").alias("repo"),
        F.col("doc_id").cast("string").alias("path"),
        F.lit("0").alias("commit"),
        F.lit("txt").alias("lang"),
        F.col("text").alias("content"),
    )
    chunks = split_long_docs(corpus, max_tokens=32)
    return (
        chunks.select(
            F.split(F.col("path"), "#c").getItem(0).cast("long").alias("doc_id"),
            F.size(tokenize("content")).alias("toks"),
        )
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_chunks"),
            F.sum("toks").cast("long").alias("n_tokens"),
        )
    )


def q_date_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Elasticsearch date_histogram facet: per-day × event_type doc counts
    and value sums over `events` — map-side partial agg, one shuffle."""
    ev = _tbl(spark, sf_dir, "events")
    return ev.groupBy(
        F.to_date(F.date_trunc("day", F.col("ts"))).alias("day"),
        "event_type",
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("value"), 4).alias("value_sum"),
    )


# ---------------------------------------------------------------------------
# driver contract
# ---------------------------------------------------------------------------


# ---------------------------------------------------------------------------
# multi-term expansion (wildcard / fuzzy), LM ranking, proximity
# ---------------------------------------------------------------------------

WILDCARD_PATTERNS = [
    (1, "s*"),       # scan small slow sort spark stream
    (2, "*er"),      # customer filter order
    (3, "?a??"),     # data fast hash part
    (4, "gr*up"),    # group
]
FUZZY_SOURCES = [
    (1, "scann"),    # scan (del)
    (2, "tble"),     # table (ins)
    (3, "join"),     # exact + 1-edit neighbors
    (4, "kei"),      # key (sub)
    (5, "dups"),     # dup (del) — rare term
]
REGEXP_PATTERNS = [
    (1, "s(can|ort)"),     # literal prefix "s" -> scan, sort
    (2, "gro+up"),         # literal prefix "gr" -> group
    (3, "(hash|merge)"),   # no literal prefix: full dictionary scan path
    (4, "quer[xy]"),       # literal prefix "quer" -> query
]
RANGE_QUERIES = [
    (1, "scan", "sort", True, True),    # closed slice scan..sort
    (2, "d", "f", True, False),         # half-open [d, f)
    (3, None, "big", True, True),       # open low end
    (4, "table", None, False, True),    # open high end, exclusive low
]
NEAR_PAIRS = [
    (1, "hash", "join", 2),
    (2, "table", "scan", 3),
    (3, "merge", "batch", 1),
    (4, "dup", "vector", 5),
]


def q_wildcard_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wildcard (prefix/infix) query expansion against the vocabulary, then
    disjunctive BM25 with per-expanded-term idf (Lucene scoring rewrite)."""
    from mtix_spark.expand import wildcard_search

    docs = _tbl(spark, sf_dir, "documents")
    out = wildcard_search(docs, WILDCARD_PATTERNS, k=TOPK)
    return out.select(
        "query_id", F.col("rank").cast("long").alias("rank"), "doc_id", "score"
    )


def q_fuzzy_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy query: Levenshtein<=1 vocabulary expansion (threshold-bounded
    builtin, length-band prefiltered), disjunctive BM25 over the matches."""
    from mtix_spark.expand import fuzzy_search

    docs = _tbl(spark, sf_dir, "documents")
    out = fuzzy_search(docs, FUZZY_SOURCES, max_edits=1, k=TOPK)
    return out.select(
        "query_id", F.col("rank").cast("long").alias("rank"), "doc_id", "score"
    )


def q_wildcard_constant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wildcard under the CONSTANT_SCORE rewrite (Lucene's default): the
    candidate set with score 1.0 — no scoring relations touched."""
    from mtix_spark.expand import expand_wildcard, expanded_constant_score
    from mtix_spark.functions.text import tokenize as _tok

    docs = _tbl(spark, sf_dir, "documents")
    vocab = docs.select(
        F.explode(F.array_distinct(_tok(F.col("text")))).alias("term")
    ).distinct()
    exp = expand_wildcard(vocab, WILDCARD_PATTERNS)
    return expanded_constant_score(docs, exp)


def _wildcard_constant_oracle() -> str:
    from mtix_spark.expand import wildcard_to_like

    toks = TOK.format(c="text")
    vals = ", ".join(f"({q}, '{wildcard_to_like(p)}')" for q, p in WILDCARD_PATTERNS)
    return f"""
WITH toks AS (
  SELECT DISTINCT doc_id, unnest({toks}) AS term FROM documents
),
pats(query_id, pat) AS (VALUES {vals})
SELECT DISTINCT p.query_id, t.doc_id, 1.0::DOUBLE AS score
FROM toks t JOIN pats p ON t.term LIKE p.pat
"""


def q_regexp_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regexp query (Lucene RegexpQuery): anchored-regex expansion against
    the vocabulary (literal-prefix pruned when sargable), then disjunctive
    BM25 with per-expanded-term idf (scoring rewrite)."""
    from mtix_spark.expand import regexp_search

    docs = _tbl(spark, sf_dir, "documents")
    out = regexp_search(docs, REGEXP_PATTERNS, k=TOPK)
    return out.select(
        "query_id", F.col("rank").cast("long").alias("rank"), "doc_id", "score"
    )


SUGGEST_SOURCES = [
    (1, "custmer"),   # customer (1 del)
    (2, "vektor"),    # vector (1 sub)
    (3, "joun"),      # join (1 sub)
    (4, "qury"),      # query (1 del)
    (5, "merg"),      # merge (1 del) — also near 'merge'-adjacent terms
]


def q_suggest_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spell suggestion (DirectSpellChecker): top corrections per source
    term ranked by (edit distance, df DESC, term) over the corpus vocab."""
    from mtix_spark.expand import suggest_from_corpus

    docs = _tbl(spark, sf_dir, "documents")
    return suggest_from_corpus(docs, SUGGEST_SOURCES, max_edits=2, top=3)


def q_suggest_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same suggestions driven by the PHYSICAL index dictionary (term, df)
    — the form a serving system runs: one dictionary relation, no corpus
    access. Shares the relational oracle (dictionary df is corpus df)."""
    from mtix_spark.expand import suggest_terms
    from mtix_spark.index.search import SegmentSearcher

    paths = _docs_index(spark, sf_dir)
    s = SegmentSearcher(spark, paths, persist=False)
    return suggest_terms(s.dictionary, SUGGEST_SOURCES, max_edits=2, top=3)


def _suggest_oracle() -> str:
    toks = TOK.format(c="text")
    vals = ", ".join(f"({q}, '{s}')" for q, s in SUGGEST_SOURCES)
    return f"""
WITH toks AS (
  SELECT DISTINCT doc_id, unnest({toks}) AS term FROM documents
),
vocab AS (SELECT term, count(*)::BIGINT AS df FROM toks GROUP BY 1),
src(query_id, s) AS (VALUES {vals}),
cand AS (
  SELECT query_id, term, df, levenshtein(term, s)::BIGINT AS distance
  FROM vocab JOIN src
    ON term <> s AND abs(len(term) - len(s)) <= 2 AND levenshtein(term, s) <= 2
)
SELECT query_id, term AS suggestion, df, distance, rank FROM (
  SELECT *, row_number() OVER (
    PARTITION BY query_id ORDER BY distance, df DESC, term
  )::BIGINT AS rank FROM cand
) WHERE rank <= 3
"""


def q_range_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Term-range query (Lucene TermRangeQuery): lexicographic dictionary
    slice — a pure sargable range predicate, no regex — then disjunctive
    BM25 with per-expanded-term idf."""
    from mtix_spark.expand import term_range_search

    docs = _tbl(spark, sf_dir, "documents")
    out = term_range_search(docs, RANGE_QUERIES, k=TOPK)
    return out.select(
        "query_id", F.col("rank").cast("long").alias("rank"), "doc_id", "score"
    )


def q_total_hits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matching-doc counts without ranking (IndexSearcher.count): both the
    disjunctive (any term) and conjunctive (all terms) collectors over the
    fixed query set — conjunctive query ids offset by 100."""
    from mtix_spark.query import total_hits

    docs = _tbl(spark, sf_dir, "documents")
    dis = total_hits(docs, FIXED_QUERIES, conjunctive=False)
    con = total_hits(
        docs, [(qid + 100, t) for qid, t in FIXED_QUERIES], conjunctive=True
    )
    return dis.unionByName(con).select(
        "query_id", F.col("n_hits").cast("long").alias("n_hits")
    )


def q_total_hits_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count collectors straight off the PHYSICAL posting sets (doc-id
    cells only — tf/block-max columns pruned). Counts are dense-id-
    agnostic, so this shares q_total_hits's oracle unchanged."""
    from mtix_spark.index.search import total_hits_index

    paths = _docs_index(spark, sf_dir)
    dis = total_hits_index(spark, paths, FIXED_QUERIES, conjunctive=False)
    con = total_hits_index(
        spark, paths, [(qid + 100, t) for qid, t in FIXED_QUERIES], conjunctive=True
    )
    return dis.unionByName(con).select(
        "query_id", F.col("n_hits").cast("long").alias("n_hits")
    )


SNIP_W = 8


def q_term_snippets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unified highlighter: densest query-term window per top-k hit."""
    from mtix_spark.index.positions import term_snippets

    docs = _tbl(spark, sf_dir, "documents")
    return term_snippets(docs, FIXED_QUERIES, k=TOPK, window=SNIP_W, text_col="text")


def _term_snippets_oracle() -> str:
    toks = TOK.format(c="text")
    vals = ", ".join(f"({q}, '{t}')" for q, t in _q_terms())
    w = SNIP_W
    return f"""
WITH toklists AS (SELECT doc_id, {toks} AS l FROM documents),
stream AS (
  SELECT doc_id, unnest(l) AS term, generate_subscripts(l, 1) - 1 AS pos
  FROM toklists
),
tf AS (SELECT doc_id, term, count(*)::BIGINT AS tf FROM stream GROUP BY 1, 2),
dl AS (SELECT doc_id, len(l)::DOUBLE AS dl FROM toklists),
stats AS (
  SELECT (SELECT count(*) FROM documents)::BIGINT AS n,
         (SELECT avg(dl) FROM dl) AS avgdl
),
q(query_id, term) AS (VALUES {vals}),
dfreq AS (
  SELECT term, count(*)::BIGINT AS df FROM tf
  WHERE term IN (SELECT term FROM q) GROUP BY 1
),
top AS (
  SELECT query_id, doc_id FROM (
    SELECT query_id, tf.doc_id AS doc_id,
           row_number() OVER (
             PARTITION BY query_id
             ORDER BY round(sum(
               ln(1.0 + (s.n - d.df + 0.5) / (d.df + 0.5))
               * (tf.tf * {K1 + 1.0})
               / (tf.tf + {K1} * (1.0 - {B} + {B} * dl.dl / s.avgdl))
             ), 6) DESC, tf.doc_id
           ) AS rank
    FROM q JOIN tf USING (term)
    JOIN dfreq d USING (term)
    JOIN dl ON dl.doc_id = tf.doc_id
    CROSS JOIN stats s
    GROUP BY 1, 2
  ) WHERE rank <= {TOPK}
),
qpos AS (
  SELECT q.query_id, s.doc_id, s.pos FROM stream s
  JOIN q USING (term) JOIN top t ON t.query_id = q.query_id AND t.doc_id = s.doc_id
),
counted AS (
  SELECT a.query_id, a.doc_id, a.pos AS anchor, count(*)::BIGINT AS n_in_window
  FROM qpos a JOIN qpos b
    ON b.query_id = a.query_id AND b.doc_id = a.doc_id
   AND b.pos >= a.pos AND b.pos < a.pos + {w}
  GROUP BY 1, 2, 3
),
best AS (
  SELECT query_id, doc_id, anchor, n_in_window FROM (
    SELECT *, row_number() OVER (
      PARTITION BY query_id, doc_id ORDER BY n_in_window DESC, anchor
    ) AS r FROM counted
  ) WHERE r = 1
)
SELECT b.query_id, b.doc_id, b.anchor::BIGINT AS best_pos, b.n_in_window,
       array_to_string(l[b.anchor + 1 : b.anchor + {w}], ' ') AS snippet
FROM best b JOIN toklists USING (doc_id)
"""


def q_grouped_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Result grouping / field collapse (Lucene grouping module): top
    groups by best hit, top docs per group, over the lang field."""
    from mtix_spark.query import grouped_bm25

    docs = _tbl(spark, sf_dir, "documents")
    return grouped_bm25(docs, FIXED_QUERIES, "lang", n_groups=3, k_per_group=3)


def _grouped_oracle() -> str:
    vals = ", ".join(f"({q}, '{t}')" for q, t in _q_terms())
    toks = TOK.format(c="text")
    return f"""
WITH toks AS (
  SELECT doc_id, unnest({toks}) AS term FROM documents
),
tf AS (SELECT doc_id, term, count(*)::BIGINT AS tf FROM toks GROUP BY 1, 2),
dl AS (SELECT doc_id, len({toks})::DOUBLE AS dl FROM documents),
stats AS (
  SELECT (SELECT count(*) FROM documents)::BIGINT AS n,
         (SELECT avg(dl) FROM dl) AS avgdl
),
q(query_id, term) AS (VALUES {vals}),
dfreq AS (
  SELECT term, count(*)::BIGINT AS df FROM tf
  WHERE term IN (SELECT term FROM q) GROUP BY 1
),
scored AS (
  SELECT q.query_id, tf.doc_id,
         round(sum(
           ln(1.0 + (s.n - d.df + 0.5) / (d.df + 0.5))
           * (tf.tf * {K1 + 1.0})
           / (tf.tf + {K1} * (1.0 - {B} + {B} * dl.dl / s.avgdl))
         ), 6) AS score
  FROM q JOIN tf USING (term)
  JOIN dfreq d USING (term)
  JOIN dl ON dl.doc_id = tf.doc_id
  CROSS JOIN stats s
  GROUP BY 1, 2
),
grouped AS (
  SELECT s.query_id, doc.lang::VARCHAR AS "group", s.doc_id, s.score,
         row_number() OVER (
           PARTITION BY s.query_id, doc.lang
           ORDER BY s.score DESC, s.doc_id
         )::BIGINT AS rank
  FROM scored s JOIN documents doc USING (doc_id)
),
tg AS (
  SELECT query_id, "group",
         row_number() OVER (
           PARTITION BY query_id ORDER BY score DESC, "group"
         )::BIGINT AS grank
  FROM grouped WHERE rank = 1
)
SELECT g.query_id, g."group", tg.grank, g.rank, g.doc_id, g.score
FROM grouped g JOIN tg USING (query_id, "group")
WHERE g.rank <= 3 AND tg.grank <= 3
"""


LOOKUP_IDS = [1, 2, 3, 5, 8]


def q_doc_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stored-fields point lookup (IndexReader.document()): fetch the
    requested docs' stored fields off the doc-range-pruned docmap; the
    returned dl and sha256 must equal the relational token count and
    content hash — the north-rule per-row invariant, served from the
    index instead of the source table."""
    from mtix_spark.index.search import get_docs

    paths = _docs_index(spark, sf_dir)
    docmap = spark.read.parquet(paths.docmap).select(
        F.col("doc_id").alias("dense_id"), F.col("path").cast("long").alias("orig_id")
    )
    dense = [
        int(r["dense_id"])
        for r in docmap.filter(F.col("orig_id").isin(LOOKUP_IDS)).collect()
    ]
    got = get_docs(spark, paths, dense)
    return (
        got.withColumnRenamed("doc_id", "dense_id")
        .join(docmap, "dense_id")
        .select(
            F.col("orig_id").alias("doc_id"),
            F.col("lang"),
            F.col("dl").cast("long").alias("dl"),
            F.col("content_sha256").alias("content_sha"),
        )
    )


def q_bm25_explain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-term score decomposition of each top-k hit (Lucene explain()):
    tf, df, idf, tf-saturation, and contribution, whose per-doc sum is the
    BM25 score the ranking entries report."""
    from mtix_spark.query import bm25_explain

    docs = _tbl(spark, sf_dir, "documents")
    return bm25_explain(docs, FIXED_QUERIES, k=TOPK)


def q_bm25_page2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cursor pagination (searchAfter): fetch page 1, take each query's
    rank-k (score, doc_id) as the cursor, fetch the NEXT k strictly after
    it — must equal ranks k+1..2k of a single deep ranking (the oracle),
    with no offset-style rescan of the skipped prefix."""
    from mtix_spark.query import bm25_search_after

    docs = _tbl(spark, sf_dir, "documents")
    page1 = bm25_search_after(docs, FIXED_QUERIES, after={}, k=TOPK)
    cursors = {
        int(r["query_id"]): (float(r["score"]), int(r["doc_id"]))
        for r in page1.filter(F.col("rank") == TOPK).collect()
    }
    # a query with < k total hits has no page 2; drop it (oracle agrees:
    # its deep ranking has no rank > k rows)
    q2 = [(qid, t) for qid, t in FIXED_QUERIES if qid in cursors]
    return bm25_search_after(docs, q2, after=cursors, k=TOPK).select(
        "query_id", F.col("rank").cast("long").alias("rank"), "doc_id", "score"
    )


def q_lm_dirichlet_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Query-likelihood ranking with Dirichlet smoothing (mu=2000) — the
    second scoring family over the same posting relations as BM25."""
    from mtix_spark.index.search import lm_dirichlet_brute

    docs = _tbl(spark, sf_dir, "documents")
    tf = _docs_tf(docs)
    dl = docs.select("doc_id", F.size(tokenize("text")).cast("double").alias("dl"))
    total_tokens = int(dl.agg(F.sum("dl")).collect()[0][0])
    qdf = spark.createDataFrame(FIXED_QUERIES, "query_id long, text string")
    out = lm_dirichlet_brute(tf, dl, qdf, total_tokens, mu=2000.0, k=TOPK)
    return out.select(
        "query_id", F.col("rank").cast("long").alias("rank"), "doc_id", "score"
    )


def q_near_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Proximity (NEAR/k) search: unordered within-window co-occurrence
    counts per doc, per query pair — SpanNearQuery semantics over the
    positional token stream."""
    from mtix_spark.index.positions import near_match_relational

    docs = _tbl(spark, sf_dir, "documents")
    outs = []
    for qid, ta, tb, win in NEAR_PAIRS:
        m = near_match_relational(docs, ta, tb, win, id_col="doc_id", text_col="text")
        outs.append(
            m.select(F.lit(qid).cast("long").alias("query_id"), "doc_id", "n_pairs")
        )
    res = outs[0]
    for o in outs[1:]:
        res = res.unionByName(o)
    return res


def q_boolean_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boolean query language executed over the PHYSICAL segment index
    (pruning-disabled BM25 kernels + posting-set semi/anti joins + phrase
    index + docmap metadata filters) — shares q_boolean_search's oracle."""
    from mtix_spark.query import boolean_search_index

    paths = _docs_index(spark, sf_dir, positions=True)
    docmap = spark.read.parquet(paths.docmap).select(
        F.col("doc_id").alias("dense_id"), F.col("path").cast("long").alias("orig_id")
    )
    outs = []
    for qid, q in BOOL_QUERIES:
        # tie margin: engine tie-breaks on dense ids, oracle on original ids
        res = boolean_search_index(spark, paths, q, k=TOPK * 5)
        remapped = (
            res.withColumnRenamed("doc_id", "dense_id")
            .join(docmap, "dense_id")
            .select(F.col("orig_id").alias("doc_id"), "score")
        )
        w = Window.orderBy(F.desc("score"), F.asc("doc_id"))
        outs.append(
            remapped.withColumn("rank", F.row_number().over(w).cast("long"))
            .filter(F.col("rank") <= TOPK)
            .select(
                F.lit(qid).cast("long").alias("query_id"), "rank", "doc_id", "score"
            )
        )
    res = outs[0]
    for o in outs[1:]:
        res = res.unionByName(o)
    return res


def _expanded_index_topk(
    spark: SparkSession, sf_dir: str, mode: str
) -> DataFrame:
    """Wildcard/fuzzy through the PHYSICAL index dictionary: expand against
    the dictionary relation, run the expanded terms through the MaxScore
    kernels, remap dense→original ids with the usual tie margin. Shares the
    relational oracles — expansion must find the same terms and the kernel
    the same scores."""
    from mtix_spark.expand import (
        expand_fuzzy,
        expand_regexp,
        expand_term_range,
        expand_wildcard,
        search_expanded_index,
    )
    from mtix_spark.index.search import SegmentSearcher

    paths = _docs_index(spark, sf_dir)
    s = SegmentSearcher(spark, paths, persist=False)
    if mode == "wildcard":
        exp = expand_wildcard(s.dictionary, WILDCARD_PATTERNS)
    elif mode == "regexp":
        exp = expand_regexp(s.dictionary, REGEXP_PATTERNS)
    elif mode == "range":
        exp = expand_term_range(s.dictionary, RANGE_QUERIES)
    else:
        exp = expand_fuzzy(s.dictionary, FUZZY_SOURCES, max_edits=1)
    by_q: dict[int, list[str]] = {}
    for r in exp.collect():
        by_q.setdefault(int(r["query_id"]), []).append(r["term"])
    expanded = [(qid, sorted(ts)) for qid, ts in sorted(by_q.items())]
    res = search_expanded_index(s, expanded, k=TOPK * 5)  # tie margin
    docmap = spark.read.parquet(paths.docmap).select(
        F.col("doc_id").alias("dense_id"), F.col("path").cast("long").alias("orig_id")
    )
    res = (
        res.withColumnRenamed("doc_id", "dense_id")
        .join(docmap, "dense_id")
        .select("query_id", F.col("orig_id").alias("doc_id"), "score")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        res.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= TOPK)
        .select("query_id", "rank", "doc_id", "score")
    )


def q_wildcard_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _expanded_index_topk(spark, sf_dir, "wildcard")


def q_fuzzy_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _expanded_index_topk(spark, sf_dir, "fuzzy")


def q_regexp_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _expanded_index_topk(spark, sf_dir, "regexp")


def q_range_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _expanded_index_topk(spark, sf_dir, "range")


def q_lm_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LM-Dirichlet over the PHYSICAL index (decoded postings + docmap
    lengths through the same rank decomposition) — shares the relational
    lm_dirichlet_topk oracle; usual dense-id tie margin."""
    from mtix_spark.index.search import lm_dirichlet_index

    paths = _docs_index(spark, sf_dir)
    res = lm_dirichlet_index(spark, paths, FIXED_QUERIES, k=TOPK * 5)
    docmap = spark.read.parquet(paths.docmap).select(
        F.col("doc_id").alias("dense_id"), F.col("path").cast("long").alias("orig_id")
    )
    res = (
        res.withColumnRenamed("doc_id", "dense_id")
        .join(docmap, "dense_id")
        .select("query_id", F.col("orig_id").alias("doc_id"), "score")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        res.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= TOPK)
        .select("query_id", "rank", "doc_id", "score")
    )


SYN_GROUPS = [
    ["merge", "join"],      # two common terms blended
    ["row", "line"],        # two common terms blended
    ["dup", "copy"],        # rare member + corpus-OOV member (df = max present)
    ["fast", "quick"],      # common member + corpus-OOV member
]
SYN_QUERIES = [
    (1, "hash join"),       # join pulls in merge under one pseudo-term
    (2, "table scan fast"),
    (3, "dup vector"),      # rare synonym group
    (4, "row order"),
    (5, "merge join"),      # both members of one group -> scored once
]


def q_synonym_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synonym query (Lucene SynonymQuery semantics): group members blend
    by SUMMING tf before BM25 saturation, idf from the group's MAX member
    df (the dictionary-only approximation Lucene uses). Relational path."""
    from mtix_spark.expand import synonym_search

    docs = _tbl(spark, sf_dir, "documents")
    out = synonym_search(docs, SYN_QUERIES, SYN_GROUPS, k=TOPK)
    return out.withColumn("rank", F.col("rank").cast("long"))


def q_synonym_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synonym query over the PHYSICAL index: one pushed-down postings
    fetch for the expanded member set (`term_postings` decodes doc_ids +
    tfs), blended regroup bounded by posting volume, docmap doc lengths.
    Shares q_synonym_topk's oracle."""
    from mtix_spark.expand import synonym_topk_index
    from mtix_spark.index.search import SegmentSearcher

    paths = _docs_index(spark, sf_dir)
    s = SegmentSearcher(spark, paths, persist=False)
    res = synonym_topk_index(s, SYN_QUERIES, SYN_GROUPS, k=TOPK * 5)  # tie margin
    docmap = spark.read.parquet(paths.docmap).select(
        F.col("doc_id").alias("dense_id"), F.col("path").cast("long").alias("orig_id")
    )
    remapped = (
        res.withColumnRenamed("doc_id", "dense_id")
        .join(docmap, "dense_id")
        .select("query_id", F.col("orig_id").alias("doc_id"), "score")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        remapped.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= TOPK)
        .select("query_id", "rank", "doc_id", "score")
    )


def _synonym_oracle() -> str:
    from mtix_spark.expand import synonym_expansion
    from mtix_spark.functions.text import TOKEN_SPLIT_RE
    import re as _re

    qt = [
        (qid, [t for t in _re.split(TOKEN_SPLIT_RE, text.lower()) if t])
        for qid, text in SYN_QUERIES
    ]
    rows = synonym_expansion(qt, SYN_GROUPS)
    vals = ", ".join(f"({q}, '{g}', '{m}')" for q, g, m in rows)
    toks = TOK.format(c="text")
    return f"""
WITH toks AS (
  SELECT doc_id, unnest({toks}) AS term FROM documents
),
tf AS (SELECT doc_id, term, count(*)::BIGINT AS tf FROM toks GROUP BY 1, 2),
dl AS (SELECT doc_id, len({toks})::DOUBLE AS dl FROM documents),
stats AS (
  SELECT (SELECT count(*) FROM documents)::BIGINT AS n,
         (SELECT avg(dl) FROM dl) AS avgdl
),
exp(query_id, grp, term) AS (VALUES {vals}),
gtf AS (
  SELECT e.query_id, e.grp, tf.doc_id, sum(tf.tf)::DOUBLE AS gtf
  FROM exp e JOIN tf USING (term) GROUP BY 1, 2, 3
),
gdf AS (
  SELECT m.grp, max(d.df) AS df
  FROM (SELECT DISTINCT grp, term FROM exp) m
  JOIN (SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY 1) d USING (term)
  GROUP BY 1
),
scored AS (
  SELECT g.query_id, g.doc_id,
         round(sum(
           ln(1.0 + (s.n - gd.df + 0.5) / (gd.df + 0.5))
           * (g.gtf * {K1 + 1.0})
           / (g.gtf + {K1} * (1.0 - {B} + {B} * dl.dl / s.avgdl))
         ), 6) AS score
  FROM gtf g
  JOIN gdf gd USING (grp)
  JOIN dl ON dl.doc_id = g.doc_id
  CROSS JOIN stats s
  GROUP BY 1, 2
)
SELECT query_id, rank, doc_id, score FROM (
  SELECT query_id, doc_id, score,
         row_number() OVER (PARTITION BY query_id ORDER BY score DESC, doc_id) AS rank
  FROM scored
) WHERE rank <= {TOPK}
"""


MLT_SOURCE_IDS = [0, 7, 42]
MLT_M = 6


def q_more_like_this(spark: SparkSession, sf_dir: str) -> DataFrame:
    """More-like-this: top-m tf-idf terms of each source doc as a
    disjunctive BM25 query, source doc excluded. query_id = source doc."""
    from mtix_spark.expand import more_like_this

    docs = _tbl(spark, sf_dir, "documents")
    out = more_like_this(docs, MLT_SOURCE_IDS, m=MLT_M, k=TOPK)
    return out.select(
        "query_id", F.col("rank").cast("long").alias("rank"), "doc_id", "score"
    )


def _mlt_oracle() -> str:
    ids = ", ".join(str(i) for i in MLT_SOURCE_IDS)
    cte = f"""dfa AS (SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY 1),
src AS (
  SELECT tf.doc_id AS query_id, tf.term,
         round(tf.tf * ln(1.0 + (s.n - dfa.df + 0.5) / (dfa.df + 0.5)), 6) AS tfidf
  FROM tf JOIN dfa USING (term) CROSS JOIN stats s
  WHERE tf.doc_id IN ({ids})
),
exp AS (
  SELECT query_id, term FROM (
    SELECT query_id, term,
           row_number() OVER (PARTITION BY query_id ORDER BY tfidf DESC, term) AS r
    FROM src
  ) WHERE r <= {MLT_M}
)"""
    return _expanded_bm25_oracle(cte, scored_where="WHERE tf.doc_id <> e.query_id")


def q_near_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Proximity search via the PHYSICAL positional index (packed-position
    searchsorted range counting) — shares q_near_match's oracle; the index
    path and the SQL twin must agree row-for-row on (doc, pair count)."""
    from mtix_spark.index.positions import near_topk

    paths = _docs_index(spark, sf_dir, positions=True)
    res = near_topk(spark, paths, NEAR_PAIRS, k=1_000_000)  # full set
    docmap = spark.read.parquet(paths.docmap).select(
        F.col("doc_id").alias("dense_id"), F.col("path").cast("long").alias("orig_id")
    )
    return (
        res.withColumnRenamed("doc_id", "dense_id")
        .join(docmap, "dense_id")
        .select("query_id", F.col("orig_id").alias("doc_id"), "n_pairs")
    )


def _expanded_bm25_oracle(
    expansion_cte: str,
    scored_where: str = "",
    page: int = 1,
    boost_expr: str = "",
    min_match: int = 1,
    k: int | None = TOPK,
    agg_sql: str = "",
    text_col: str = "text",
) -> str:
    """Shared oracle body: `exp(query_id, term)` CTE supplied by the caller;
    BM25 with per-term idf over the expanded disjunction — the SQL twin of
    mtix_spark.expand.expanded_bm25. `scored_where` injects an optional
    predicate into the scoring join (e.g. MLT self-exclusion); `page`
    selects deep-ranking slice ((page-1)*k, page*k], ranks renumbered 1..k
    — the searchAfter twin. `boost_expr` (a SQL expression over alias `doc`,
    the documents row) multiplies the rounded base score and re-rounds
    BEFORE ranking — the FunctionScoreQuery twin. `min_match` ≥ 2 keeps
    only docs matching that many distinct expanded terms (the scored group
    has one row per matched term, so it is a HAVING count) — the
    minimum_should_match twin. `k` overrides the per-page rank cut (the
    rescore first-pass window); k=None emits the UNRANKED scored relation
    (query_id, doc_id, score) for composition (multi_match field legs).
    `agg_sql` replaces the disjunctive sum with another aggregate over the
    per-term contribution `{C}` (the dis_max twin: max + tie-broken
    remainder). `text_col` picks the scored field (per-field tf/dl/avgdl/df
    — the multi_match per-field leg)."""
    toks = TOK.format(c=text_col)
    contrib = (
        f"ln(1.0 + (s.n - d.df + 0.5) / (d.df + 0.5))\n"
        f"           * (tf.tf * {K1 + 1.0})\n"
        f"           / (tf.tf + {K1} * (1.0 - {B} + {B} * dl.dl / s.avgdl))"
    )
    agg = agg_sql.format(C=contrib) if agg_sql else f"sum({contrib})"
    having = f"\n  HAVING count(*) >= {min_match}" if min_match > 1 else ""
    boost_cte, rank_src = "", "scored"
    if k is None:
        tail = "\nSELECT query_id, doc_id, score FROM {src}\n"
    else:
        tail = f"""
SELECT query_id, rank - {(page - 1) * k} AS rank, doc_id, score FROM (
  SELECT query_id, doc_id, score,
         row_number() OVER (PARTITION BY query_id ORDER BY score DESC, doc_id) AS rank
  FROM {{src}}
) WHERE rank > {(page - 1) * k} AND rank <= {page * k}
"""
    if boost_expr:
        boost_cte = f""",
boosted AS (
  SELECT s.query_id, s.doc_id, round(s.score * ({boost_expr}), 6) AS score
  FROM scored s JOIN documents doc ON doc.doc_id = s.doc_id
)"""
        rank_src = "boosted"
    return f"""
WITH toks AS (
  SELECT doc_id, unnest({toks}) AS term FROM documents
),
tf AS (SELECT doc_id, term, count(*)::BIGINT AS tf FROM toks GROUP BY 1, 2),
dl AS (SELECT doc_id, len({toks})::DOUBLE AS dl FROM documents),
stats AS (
  SELECT (SELECT count(*) FROM documents)::BIGINT AS n,
         (SELECT avg(dl) FROM dl) AS avgdl
),
vocab AS (SELECT DISTINCT term FROM tf),
{expansion_cte},
dfreq AS (
  SELECT term, count(*)::BIGINT AS df FROM tf
  WHERE term IN (SELECT term FROM exp) GROUP BY 1
),
scored AS (
  SELECT e.query_id, tf.doc_id,
         round({agg}, 6) AS score
  FROM (SELECT DISTINCT query_id, term FROM exp) e
  JOIN tf USING (term)
  JOIN dfreq d USING (term)
  JOIN dl ON dl.doc_id = tf.doc_id
  CROSS JOIN stats s
  {scored_where}
  GROUP BY 1, 2{having}
){boost_cte}
{tail.format(src=rank_src)}"""


def _wildcard_oracle() -> str:
    from mtix_spark.expand import wildcard_to_like

    vals = ", ".join(f"({q}, '{wildcard_to_like(p)}')" for q, p in WILDCARD_PATTERNS)
    cte = (
        f"pats(query_id, pat) AS (VALUES {vals}),\n"
        "exp AS (SELECT query_id, term FROM vocab JOIN pats ON term LIKE pat)"
    )
    return _expanded_bm25_oracle(cte)


def _fuzzy_oracle() -> str:
    vals = ", ".join(f"({q}, '{s}')" for q, s in FUZZY_SOURCES)
    cte = (
        f"src(query_id, s) AS (VALUES {vals}),\n"
        "exp AS (SELECT query_id, term FROM vocab JOIN src"
        " ON abs(len(term) - len(s)) <= 1 AND levenshtein(term, s) <= 1)"
    )
    return _expanded_bm25_oracle(cte)


def _regexp_oracle() -> str:
    vals = ", ".join(f"({q}, '{p}')" for q, p in REGEXP_PATTERNS)
    cte = (
        f"pats(query_id, pat) AS (VALUES {vals}),\n"
        "exp AS (SELECT query_id, term FROM vocab JOIN pats"
        " ON regexp_full_match(term, pat))"
    )
    return _expanded_bm25_oracle(cte)


def _range_oracle() -> str:
    conds = []
    for qid, lo, hi, lo_incl, hi_incl in RANGE_QUERIES:
        c = ["TRUE"]
        if lo is not None:
            c.append(f"term {'>=' if lo_incl else '>'} '{lo}'")
        if hi is not None:
            c.append(f"term {'<=' if hi_incl else '<'} '{hi}'")
        conds.append(f"SELECT {qid} AS query_id, term FROM vocab WHERE {' AND '.join(c)}")
    cte = "exp AS (" + " UNION ALL ".join(conds) + ")"
    return _expanded_bm25_oracle(cte)


def _page2_oracle() -> str:
    vals = ", ".join(f"({q}, '{t}')" for q, t in _q_terms())
    cte = f"exp(query_id, term) AS (VALUES {vals})"
    return _expanded_bm25_oracle(cte, page=2)


def _total_hits_oracle() -> str:
    vals = ", ".join(f"({q}, '{t}')" for q, t in _q_terms())
    toks = TOK.format(c="text")
    return f"""
WITH toks AS (
  SELECT DISTINCT doc_id, unnest({toks}) AS term FROM documents
),
q(query_id, term) AS (VALUES {vals}),
nterms AS (SELECT query_id, count(*)::BIGINT AS n_terms FROM q GROUP BY 1),
hit AS (SELECT q.query_id, t.doc_id, q.term FROM q JOIN toks t USING (term)),
dis AS (
  SELECT query_id, count(DISTINCT doc_id)::BIGINT AS n_hits FROM hit GROUP BY 1
),
con AS (
  SELECT query_id, count(*)::BIGINT AS n_hits FROM (
    SELECT h.query_id, h.doc_id FROM hit h
    GROUP BY 1, 2
    HAVING count(*) = (SELECT n_terms FROM nterms n WHERE n.query_id = h.query_id)
  ) GROUP BY 1
)
SELECT q.query_id, coalesce(dis.n_hits, 0) AS n_hits
FROM (SELECT DISTINCT query_id FROM q) q LEFT JOIN dis USING (query_id)
UNION ALL
SELECT q.query_id + 100 AS query_id, coalesce(con.n_hits, 0) AS n_hits
FROM (SELECT DISTINCT query_id FROM q) q LEFT JOIN con USING (query_id)
"""


def _explain_oracle() -> str:
    vals = ", ".join(f"({q}, '{t}')" for q, t in _q_terms())
    toks = TOK.format(c="text")
    return f"""
WITH toks AS (
  SELECT doc_id, unnest({toks}) AS term FROM documents
),
tf AS (SELECT doc_id, term, count(*)::BIGINT AS tf FROM toks GROUP BY 1, 2),
dl AS (SELECT doc_id, len({toks})::DOUBLE AS dl FROM documents),
stats AS (
  SELECT (SELECT count(*) FROM documents)::BIGINT AS n,
         (SELECT avg(dl) FROM dl) AS avgdl
),
q(query_id, term) AS (VALUES {vals}),
dfreq AS (
  SELECT term, count(DISTINCT doc_id)::BIGINT AS df FROM tf
  WHERE term IN (SELECT term FROM q) GROUP BY 1
),
parts AS (
  SELECT q.query_id, tf.doc_id, tf.term, tf.tf, d.df,
         ln(1.0 + (s.n - d.df + 0.5) / (d.df + 0.5)) AS idf,
         (tf.tf * {K1 + 1.0})
           / (tf.tf + {K1} * (1.0 - {B} + {B} * dl.dl / s.avgdl)) AS tf_norm
  FROM q JOIN tf USING (term)
  JOIN dfreq d USING (term)
  JOIN dl ON dl.doc_id = tf.doc_id
  CROSS JOIN stats s
),
top AS (
  SELECT query_id, doc_id FROM (
    SELECT query_id, doc_id,
           row_number() OVER (
             PARTITION BY query_id
             ORDER BY round(sum(idf * tf_norm), 6) DESC, doc_id
           ) AS rank
    FROM parts GROUP BY 1, 2
  ) WHERE rank <= {TOPK}
)
SELECT p.query_id, p.doc_id, p.term, p.tf, p.df,
       round(p.idf, 6) AS idf, round(p.tf_norm, 6) AS tf_norm,
       round(p.idf * p.tf_norm, 6) AS contrib
FROM parts p JOIN top USING (query_id, doc_id)
"""


def _lm_oracle(mu: float = 2000.0, k: int | None = TOPK) -> str:
    """k=None emits the UNRANKED scored relation (query_id, doc_id, score)
    — the rescore oracle joins it against the first-pass window."""
    vals = ", ".join(f"({q}, '{t}')" for q, t in _q_terms())
    toks = TOK.format(c="text")
    tail = (
        f"""
SELECT query_id, rank, doc_id, score FROM (
  SELECT query_id, doc_id, score,
         row_number() OVER (PARTITION BY query_id ORDER BY score DESC, doc_id) AS rank
  FROM scored
) WHERE rank <= {k}
"""
        if k is not None
        else "\nSELECT query_id, doc_id, score FROM scored\n"
    )
    return f"""
WITH toks AS (
  SELECT doc_id, unnest({toks}) AS term FROM documents
),
tf AS (SELECT doc_id, term, count(*)::BIGINT AS tf FROM toks GROUP BY 1, 2),
dl AS (SELECT doc_id, len({toks})::DOUBLE AS dl FROM documents),
stats AS (SELECT (SELECT sum(dl) FROM dl) AS c),
q(query_id, term) AS (VALUES {vals}),
cf AS (
  SELECT term, sum(tf)::DOUBLE AS cf FROM tf
  WHERE term IN (SELECT term FROM q) GROUP BY 1
),
nq AS (
  SELECT query_id, count(*)::DOUBLE AS n_q FROM q
  WHERE term IN (SELECT term FROM cf) GROUP BY 1
),
scored AS (
  SELECT m.query_id, m.doc_id,
         round(m.match_part + nq.n_q * ln({mu} / (dl.dl + {mu})), 6) AS score
  FROM (
    SELECT q.query_id, tf.doc_id,
           sum(ln(1.0 + tf.tf / ({mu} * cf.cf / s.c))) AS match_part
    FROM q JOIN tf USING (term) JOIN cf USING (term) CROSS JOIN stats s
    GROUP BY 1, 2
  ) m
  JOIN dl ON dl.doc_id = m.doc_id
  JOIN nq ON nq.query_id = m.query_id
){tail}"""


SPAN_QUERIES = [
    (1, ["hash", "join"], 3),
    (2, ["table", "scan", "fast"], 6),
    (3, ["key", "value", "part"], 8),
    (4, ["merge", "batch"], 0),       # slop 0 = strict adjacency
    (5, ["dup", "the", "vector"], 10),
]


def q_span_near(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered n-term proximity with slop (SpanNearQuery) — anchored
    greedy-span counts, relational chain form."""
    from mtix_spark.index.positions import span_near_relational

    docs = _tbl(spark, sf_dir, "documents")
    outs = []
    for qid, terms, slop in SPAN_QUERIES:
        m = span_near_relational(docs, terms, slop, text_col="text")
        outs.append(
            m.select(F.lit(qid).cast("long").alias("query_id"), "doc_id", "n_spans")
        )
    res = outs[0]
    for o in outs[1:]:
        res = res.unionByName(o)
    return res


def q_span_near_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Physical SpanNear over the positional index (vectorized greedy
    chain) — shares q_span_near's oracle."""
    from mtix_spark.index.positions import span_near_topk

    paths = _docs_index(spark, sf_dir, positions=True)
    res = span_near_topk(spark, paths, SPAN_QUERIES, k=1_000_000)  # full set
    docmap = spark.read.parquet(paths.docmap).select(
        F.col("doc_id").alias("dense_id"), F.col("path").cast("long").alias("orig_id")
    )
    return (
        res.withColumnRenamed("doc_id", "dense_id")
        .join(docmap, "dense_id")
        .select("query_id", F.col("orig_id").alias("doc_id"), "n_spans")
    )


def _span_chain_sql(terms: list[str], anchor: str = "t1", table: str = "toks") -> str:
    """Correlated greedy-chain scalar subquery: min position of terms[-1]
    strictly after the chain over terms[:-1] (recursive nesting)."""
    if len(terms) == 1:
        prev = f"{anchor}.pos"
    else:
        prev = f"({_span_chain_sql(terms[:-1], anchor, table)})"
    t = terms[-1]
    return (
        f"SELECT min(x.pos) FROM {table} x WHERE x.doc_id = {anchor}.doc_id"
        f" AND x.term = '{t}' AND x.pos > {prev}"
    )


def _span_near_oracle() -> str:
    toks = TOK.format(c="text")
    parts = []
    for qid, terms, slop in SPAN_QUERIES:
        n = len(terms)
        chain = f"({_span_chain_sql(terms[1:])})" if n > 1 else "t1.pos"
        parts.append(
            f"SELECT {qid}::BIGINT AS query_id, doc_id, count(*)::BIGINT AS n_spans\n"
            f"FROM (SELECT t1.doc_id, t1.pos AS p1, {chain} AS cur\n"
            f"      FROM toks t1 WHERE t1.term = '{terms[0]}')\n"
            f"WHERE cur IS NOT NULL AND cur - p1 - {n - 1} <= {slop}\n"
            f"GROUP BY 1, 2"
        )
    body = "\nUNION ALL\n".join(parts)
    return f"""
WITH toks AS (
  SELECT doc_id, unnest(l) AS term, generate_subscripts(l, 1) - 1 AS pos
  FROM (SELECT doc_id, {toks} AS l FROM documents)
)
{body}
"""


def _near_oracle() -> str:
    toks = TOK.format(c="text")
    parts = []
    for qid, ta, tb, win in NEAR_PAIRS:
        parts.append(
            f"SELECT {qid}::BIGINT AS query_id, a.doc_id, count(*)::BIGINT AS n_pairs\n"
            f"FROM toks a JOIN toks b ON b.doc_id = a.doc_id\n"
            f" AND abs(b.pos - a.pos) <= {win} AND b.pos <> a.pos\n"
            f"WHERE a.term = '{ta}' AND b.term = '{tb}' GROUP BY 1, 2"
        )
    body = "\nUNION ALL\n".join(parts)
    return f"""
WITH toks AS (
  SELECT doc_id, unnest(l) AS term, generate_subscripts(l, 1) - 1 AS pos
  FROM (SELECT doc_id, {toks} AS l FROM documents)
)
{body}
"""


# ---------------------------------------------------------------------------
# round-5 batch 2: code-identifier analyzer, multi_match cross_fields,
# match_phrase_prefix (relational + positional index), term vectors,
# gauss-decay function score
# ---------------------------------------------------------------------------

# deterministic code-shaped derivation: PascalCase-join each doc's words into
# one identifier, mirrored Spark <-> DuckDB so the analyzer entries are
# value-checkable on the driver tables (the sf corpus is prose-shaped; the
# analyzer's target per BASELINE.json:input_hint is source code)
CAMEL_CODE_SPARK = (
    "concat_ws('', transform(split(text, ' '), "
    "w -> concat(ucase(left(w, 1)), substr(w, 2))))"
)
CAMEL_CODE_SQL = (
    "list_aggregate(list_transform(string_split(text, ' '), "
    "w -> concat(upper(w[1]), w[2:])), 'string_agg', '')"
)
# mixed identifier styles on the query side — all normalize to the same
# subtokens via ident_tokenize_py, which is the point of the analyzer
IDENT_QUERIES = [
    (1, "hashJoin"),
    (2, "TableScan fast"),
    (3, "rowValue part"),
    (4, "MergeBatch"),
    (5, "SLOW_QUERY agg key"),
]


def _with_code(docs: DataFrame) -> DataFrame:
    return docs.withColumn("code", F.expr(CAMEL_CODE_SPARK))


def q_ident_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Code-identifier analyzer (functions.text.ident_tokenize): camelCase /
    PascalCase / snake_case / dotted identifiers split into lowercase
    subtokens — the identifier-splitting rule of every code-search engine.
    Output is the (doc_id, term, tf) relation the analyzer would feed the
    index builder; corpus code text is derived deterministically
    (CAMEL_CODE_SPARK/_SQL keep both engines byte-identical)."""
    from mtix_spark.functions.text import ident_tokenize

    docs = _with_code(_tbl(spark, sf_dir, "documents"))
    return (
        docs.select("doc_id", F.explode(ident_tokenize(F.col("code"))).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )


def _ident_exp() -> list[tuple[int, str]]:
    from mtix_spark.functions.text import ident_tokenize_py

    return [
        (q, t)
        for q, text in IDENT_QUERIES
        for t in sorted(set(ident_tokenize_py(text)))
    ]


def q_ident_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 search through the identifier analyzer: `hashJoin`, `HASH_JOIN`
    and `hash join` are the same query, and camelCase corpus identifiers
    match word queries — expanded_bm25 with tokenizer=ident_tokenize (the
    analyzer is a Column fn, so the whole scoring path stays the standard
    pushed-down relational plan)."""
    from mtix_spark.expand import expanded_bm25
    from mtix_spark.functions.text import ident_tokenize

    docs = _with_code(_tbl(spark, sf_dir, "documents"))
    exp = spark.createDataFrame(_ident_exp(), "query_id long, term string")
    out = expanded_bm25(
        docs, exp, k=TOPK, text_col="code", tokenizer=ident_tokenize
    )
    return out.select(
        "query_id", F.col("rank").cast("long").alias("rank"), "doc_id", "score"
    )


def _ident_oracle_ctes() -> str:
    from mtix_spark.functions.text import IDENT_TOK_SQL_DUCKDB

    itok = IDENT_TOK_SQL_DUCKDB.format(col="code")
    return f"""code AS (
  SELECT doc_id, {CAMEL_CODE_SQL} AS code FROM documents
),
toks AS (SELECT doc_id, unnest({itok}) AS term FROM code),
idl AS (SELECT doc_id, len({itok})::DOUBLE AS dl FROM code)"""


def _ident_tokens_oracle() -> str:
    return f"""
WITH {_ident_oracle_ctes()}
SELECT doc_id, term, count(*)::BIGINT AS tf FROM toks GROUP BY 1, 2
"""


def _ident_match_oracle() -> str:
    vals = ", ".join(f"({q}, '{t}')" for q, t in _ident_exp())
    return f"""
WITH {_ident_oracle_ctes()},
tf AS (SELECT doc_id, term, count(*)::BIGINT AS tf FROM toks GROUP BY 1, 2),
stats AS (
  SELECT (SELECT count(*) FROM code)::BIGINT AS n,
         (SELECT avg(dl) FROM idl) AS avgdl
),
exp(query_id, term) AS (VALUES {vals}),
dfreq AS (
  SELECT term, count(*)::BIGINT AS df FROM tf
  WHERE term IN (SELECT term FROM exp) GROUP BY 1
),
scored AS (
  SELECT e.query_id, tf.doc_id,
         round(sum(ln(1.0 + (s.n - d.df + 0.5) / (d.df + 0.5))
           * (tf.tf * {K1 + 1.0})
           / (tf.tf + {K1} * (1.0 - {B} + {B} * dl.dl / s.avgdl))), 6) AS score
  FROM (SELECT DISTINCT query_id, term FROM exp) e
  JOIN tf USING (term)
  JOIN dfreq d USING (term)
  JOIN idl dl ON dl.doc_id = tf.doc_id
  CROSS JOIN stats s
  GROUP BY 1, 2
)
SELECT query_id, rank, doc_id, score FROM (
  SELECT query_id, doc_id, score,
         row_number() OVER (PARTITION BY query_id ORDER BY score DESC, doc_id) AS rank
  FROM scored
) WHERE rank <= {TOPK}
"""


def _docs_ident_index(spark: SparkSession, sf_dir: str):
    """Segment index over the IDENT-NORMALIZED documents corpus (content =
    ident_normalize(code) — tokenize∘normalize ≡ ident_tokenize, so the
    standard build kernel produces an identifier-analyzed index). Cached
    per (session, sf_dir) like _docs_index; read-only consumers only."""
    from mtix_spark.functions.text import ident_normalize
    from mtix_spark.index.build import assign_doc_ids, build_index

    key = ("ident", sf_dir, spark.sparkContext.applicationId)
    cached = _IDX_CACHE.get(key)
    if cached is not None:
        return cached[0]
    docs = _with_code(_tbl(spark, sf_dir, "documents"))
    corpus = docs.select(
        F.lit("documents").alias("repo"),
        F.col("doc_id").cast("string").alias("path"),
        F.lit("0").alias("commit"),
        F.col("lang"),
        ident_normalize(F.col("code")).alias("content"),
    )
    with_ids = assign_doc_ids(corpus, 8)
    idx_dir = tempfile.mkdtemp(prefix="mtix_ident_idx_")
    paths = build_index(spark, with_ids, idx_dir, n_segments=4)
    _IDX_CACHE[key] = (paths, False, with_ids)
    return paths


def q_ident_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Identifier-analyzed search via the PHYSICAL index: the corpus is
    indexed through ident_normalize (so `maxScore`/`MAX_SCORE`/`max score`
    unify at BUILD time), queries normalize driver-side through the same
    analyzer twin, and the MaxScore kernel answers as usual. Shares
    ident_match's oracle — the analyzer must behave identically at the
    relational layer, the physical layer, and in SQL."""
    from mtix_spark.functions.text import ident_tokenize_py
    from mtix_spark.index.search import bm25_topk_segments

    paths = _docs_ident_index(spark, sf_dir)
    qs = [(qid, " ".join(ident_tokenize_py(t))) for qid, t in IDENT_QUERIES]
    res = bm25_topk_segments(spark, paths, qs, k=TOPK * 5)
    return _remap_rerank(spark, paths, res, k=TOPK)


def q_multi_match_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    """multi_match cross_fields: TERM-centric blending across (text, source)
    — blended df (max over fields) feeds one idf per term; each field keeps
    its own length normalization; per-term field scores combine dis_max-
    style, then sum over terms (expand._multi_match_cross)."""
    from mtix_spark.expand import multi_match_topk

    docs = _tbl(spark, sf_dir, "documents")
    out = multi_match_topk(
        docs, MM_FIELDS, BM25F_QUERIES, mode="cross_fields",
        tie_breaker=DIS_MAX_TIE, k=TOPK,
    )
    return out.select(
        "query_id", F.col("rank").cast("long").alias("rank"), "doc_id", "score"
    )


def _multi_match_cross_oracle() -> str:
    vals = ", ".join(f"({q}, '{t}')" for q, t in _mm_terms())
    tok_t, tok_s = TOK.format(c="text"), TOK.format(c="source")
    tfpart = f"(tf.tf * {K1 + 1.0}) / (tf.tf + {K1} * (1.0 - {B} + {B} * dl.dl / av.a))"

    def leg(tag: str) -> str:
        return f"""leg_{tag} AS (
  SELECT e.query_id, tf.doc_id, tf.term,
         ln(1.0 + (n.n - b.df + 0.5) / (b.df + 0.5)) * {tfpart} AS s
  FROM exp e
  JOIN tf_{tag} tf USING (term)
  JOIN dfb b USING (term)
  JOIN dl_{tag} dl ON dl.doc_id = tf.doc_id
  CROSS JOIN av_{tag} av CROSS JOIN n
)"""

    return f"""
WITH exp(query_id, term) AS (VALUES {vals}),
tt AS (SELECT doc_id, unnest({tok_t}) AS term FROM documents),
ts AS (SELECT doc_id, unnest({tok_s}) AS term FROM documents),
tf_t AS (SELECT doc_id, term, count(*)::BIGINT AS tf FROM tt GROUP BY 1, 2),
tf_s AS (SELECT doc_id, term, count(*)::BIGINT AS tf FROM ts GROUP BY 1, 2),
dl_t AS (SELECT doc_id, len({tok_t})::DOUBLE AS dl FROM documents),
dl_s AS (SELECT doc_id, len({tok_s})::DOUBLE AS dl FROM documents),
av_t AS (SELECT avg(dl) AS a FROM dl_t),
av_s AS (SELECT avg(dl) AS a FROM dl_s),
n AS (SELECT count(*)::BIGINT AS n FROM documents),
df_t AS (
  SELECT term, count(*)::BIGINT AS df FROM tf_t
  WHERE term IN (SELECT term FROM exp) GROUP BY 1
),
df_s AS (
  SELECT term, count(*)::BIGINT AS df FROM tf_s
  WHERE term IN (SELECT term FROM exp) GROUP BY 1
),
dfb AS (
  SELECT term, max(df)::BIGINT AS df
  FROM (SELECT * FROM df_t UNION ALL SELECT * FROM df_s) GROUP BY 1
),
{leg('t')},
{leg('s')},
allc AS (SELECT * FROM leg_t UNION ALL SELECT * FROM leg_s),
pt AS (
  SELECT query_id, doc_id, term,
         max(s) + {DIS_MAX_TIE} * (sum(s) - max(s)) AS c
  FROM allc GROUP BY 1, 2, 3
),
scored AS (
  SELECT query_id, doc_id, round(sum(c), 6) AS score FROM pt GROUP BY 1, 2
)
SELECT query_id, rank, doc_id, score FROM (
  SELECT query_id, doc_id, score,
         row_number() OVER (PARTITION BY query_id ORDER BY score DESC, doc_id) AS rank
  FROM scored
) WHERE rank <= {TOPK}
"""


# last token is a PREFIX; MAX_EXP deliberately small so the lexicographic
# expansion cap (Lucene max_expansions term-order semantics) actually binds
# on the sf vocabulary; query 5's tail is OOV (empty expansion -> no rows)
PREFIX_PHRASES = [
    (1, "table ha"),
    (2, "part fil"),
    (3, "part filter sc"),
    (4, "val"),
    (5, "table zzqq"),
]
PREFIX_MAX_EXP = 3


def q_phrase_prefix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """match_phrase_prefix, relational path: exact adjacency chain on all
    but the last token, which matches the first PREFIX_MAX_EXP vocabulary
    terms (term order) with that prefix
    (index.positions.phrase_prefix_relational)."""
    from mtix_spark.index.positions import phrase_prefix_relational

    docs = _tbl(spark, sf_dir, "documents")
    outs = []
    for qid, ph in PREFIX_PHRASES:
        m = phrase_prefix_relational(
            docs, ph, max_expansions=PREFIX_MAX_EXP, id_col="doc_id", text_col="text"
        )
        outs.append(
            m.select(F.lit(qid).cast("long").alias("query_id"), "doc_id", "n_occ")
        )
    res = outs[0]
    for o in outs[1:]:
        res = res.unionByName(o)
    return res


def q_phrase_prefix_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """match_phrase_prefix via the PHYSICAL positional index: the prefix
    expands against the index DICTIONARY (never the corpus), expansions ride
    one positional phrase kernel call, counts sum per (query, doc). Shares
    the relational oracle — dictionary terms ARE the corpus vocabulary."""
    from mtix_spark.index.positions import phrase_prefix_topk

    paths = _docs_index(spark, sf_dir, positions=True)
    res = phrase_prefix_topk(
        spark, paths, PREFIX_PHRASES, max_expansions=PREFIX_MAX_EXP, k=2**31 - 1
    )
    docmap = spark.read.parquet(paths.docmap).select(
        F.col("doc_id").alias("dense_id"), F.col("path").cast("long").alias("orig_id")
    )
    return (
        res.withColumnRenamed("doc_id", "dense_id")
        .join(docmap, "dense_id")
        .select("query_id", F.col("orig_id").alias("doc_id"), "n_occ")
    )


def _phrase_prefix_oracle() -> str:
    toks = TOK.format(c="text")
    ctes, parts = [], []
    for qid, ph in PREFIX_PHRASES:
        words = [w for w in re.split("[^a-z0-9_]+", ph.lower()) if w]
        prefix = words[-1]
        ctes.append(
            f"exp_q{qid} AS (SELECT term FROM vocab "
            f"WHERE starts_with(term, '{prefix}') ORDER BY term LIMIT {PREFIX_MAX_EXP})"
        )
        n = len(words)
        if n == 1:
            parts.append(
                f"SELECT {qid}::BIGINT AS query_id, doc_id, count(*)::BIGINT AS n_occ\n"
                f"FROM toks WHERE term IN (SELECT term FROM exp_q{qid}) GROUP BY 1, 2"
            )
            continue
        joins = "\n".join(
            f"JOIN toks t{j} ON t{j}.doc_id = t0.doc_id AND t{j}.pos = t0.pos + {j} "
            f"AND t{j}.term = '{w}'"
            for j, w in enumerate(words[1:-1], start=1)
        )
        joins += (
            f"\nJOIN toks t{n - 1} ON t{n - 1}.doc_id = t0.doc_id "
            f"AND t{n - 1}.pos = t0.pos + {n - 1} "
            f"AND t{n - 1}.term IN (SELECT term FROM exp_q{qid})"
        )
        parts.append(
            f"SELECT {qid}::BIGINT AS query_id, t0.doc_id, count(*)::BIGINT AS n_occ\n"
            f"FROM toks t0 {joins}\nWHERE t0.term = '{words[0]}' GROUP BY 1, 2"
        )
    cte_body = ",\n".join(ctes)
    body = "\nUNION ALL\n".join(parts)
    return f"""
WITH toks AS (
  SELECT doc_id, unnest(l) AS term, generate_subscripts(l, 1) - 1 AS pos
  FROM (SELECT doc_id, {toks} AS l FROM documents)
),
vocab AS (SELECT DISTINCT term FROM toks),
{cte_body}
{body}
"""


TV_DOC_IDS = [0, 1, 2, 3, 4]


def q_term_vectors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document term vectors (the ES _termvectors API): distinct terms
    of the requested docs with tf and corpus df — a point-lookup API (only
    the requested docs tokenize for tf; df is a bounded dictionary fetch),
    unlike tf_postings, which is the corpus-wide build relation
    (expand.term_vectors)."""
    from mtix_spark.expand import term_vectors

    docs = _tbl(spark, sf_dir, "documents")
    return term_vectors(docs, TV_DOC_IDS).select("doc_id", "term", "tf", "df")


def _term_vectors_oracle() -> str:
    toks = TOK.format(c="text")
    ids = ", ".join(str(i) for i in TV_DOC_IDS)
    return f"""
WITH toks AS (SELECT doc_id, unnest({toks}) AS term FROM documents),
tf AS (
  SELECT doc_id, term, count(*)::BIGINT AS tf FROM toks
  WHERE doc_id IN ({ids}) GROUP BY 1, 2
),
dfreq AS (
  SELECT term, count(DISTINCT doc_id)::BIGINT AS df FROM toks
  WHERE term IN (SELECT term FROM tf) GROUP BY 1
)
SELECT tf.doc_id, tf.term, tf.tf, d.df FROM tf JOIN dfreq d USING (term)
"""


# gauss decay: factor = decay^(((n_chars - origin)/scale)^2) — the ES
# decay_function contract (factor = DECAY_AT_SCALE exactly at origin±scale)
DECAY_ORIGIN, DECAY_SCALE, DECAY_AT_SCALE = 250.0, 200.0, 0.5


def q_decay_gauss(spark: SparkSession, sf_dir: str) -> DataFrame:
    """function_score with a gauss decay on a numeric field (ES decay
    functions — recency/size priors): BM25 × exp(ln(decay)·((n_chars −
    origin)/scale)²), re-ranked after the boost. The decay factor is
    bounded by 1 (its value at origin), so the index twin's boost-aware
    MaxScore bound is UB·1 — the same argument as function_score_index."""
    import math

    from mtix_spark.expand import function_score_topk

    docs = _tbl(spark, sf_dir, "documents")
    factor = F.exp(
        F.lit(math.log(DECAY_AT_SCALE))
        * F.pow((F.col("n_chars") - F.lit(DECAY_ORIGIN)) / F.lit(DECAY_SCALE), F.lit(2.0))
    )
    out = function_score_topk(docs, FIXED_QUERIES, factor=factor, k=TOPK)
    return out.select(
        "query_id", F.col("rank").cast("long").alias("rank"), "doc_id", "score"
    )


def _decay_gauss_oracle() -> str:
    import math

    vals = ", ".join(f"({q}, '{t}')" for q, t in _q_terms())
    cte = f"exp(query_id, term) AS (VALUES {vals})"
    return _expanded_bm25_oracle(
        cte,
        boost_expr=(
            f"exp({math.log(DECAY_AT_SCALE)!r} * "
            f"pow((doc.n_chars - {DECAY_ORIGIN}) / {DECAY_SCALE}, 2))"
        ),
    )


def q_mlt_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """More-like-this via the PHYSICAL index: the term-selection stage
    (expand.mlt_expansion — the "stored term vectors" side a serving
    system keeps per doc) feeds search_expanded_index, so the scoring leg
    runs the MaxScore kernel over delta+varint postings. Source doc
    excluded AFTER the dense→orig remap, before the re-rank; fetches the
    usual k×5 tie margin +1 for the excluded source. Shares
    more_like_this's oracle."""
    from mtix_spark.expand import mlt_expansion, search_expanded_index
    from mtix_spark.index.search import SegmentSearcher

    docs = _tbl(spark, sf_dir, "documents")
    exp = mlt_expansion(docs, MLT_SOURCE_IDS, m=MLT_M)
    by_q: dict[int, list[str]] = {}
    for r in exp.collect():  # bounded: |sources| × m rows
        by_q.setdefault(int(r["query_id"]), []).append(r["term"])
    paths = _docs_index(spark, sf_dir)
    s = SegmentSearcher(spark, paths, persist=False)
    res = search_expanded_index(s, sorted(by_q.items()), k=TOPK * 5 + 1)
    docmap = spark.read.parquet(paths.docmap).select(
        F.col("doc_id").alias("dense_id"), F.col("path").cast("long").alias("orig_id")
    )
    res = (
        res.withColumnRenamed("doc_id", "dense_id")
        .join(docmap, "dense_id")
        .select("query_id", F.col("orig_id").alias("doc_id"), "score")
        .filter(F.col("doc_id") != F.col("query_id"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        res.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= TOPK)
        .select("query_id", "rank", "doc_id", "score")
    )


KNN_FILTER_LABEL = 1


def q_knn_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filtered vector search (the ES kNN-with-filter contract): exact
    cosine top-k restricted to candidates with label == KNN_FILTER_LABEL —
    filter THEN top-k (a post-filtered unfiltered top-k would silently
    return < k rows and wrong ranks), the predicate pushed to the
    embedding scan."""
    out = knn_cosine_brute(
        _tbl(spark, sf_dir, "embeddings"),
        KNN_QUERY_IDS,
        k=TOPK,
        corpus_filter=F.col("label") == KNN_FILTER_LABEL,
    )
    return out.select(
        "query_id", F.col("rank").cast("long").alias("rank"), "vec_id", "cosine"
    )


def _knn_filtered_oracle() -> str:
    ids = ", ".join(str(i) for i in KNN_QUERY_IDS)

    def dot(x, y):
        return f"list_sum(list_transform(range(64), i -> {x}[i+1]::DOUBLE * {y}[i+1]::DOUBLE))"

    return f"""
WITH q AS (
  SELECT vec_id AS query_id, embedding AS qv FROM embeddings
  WHERE vec_id IN ({ids})
),
scored AS (
  SELECT q.query_id, e.vec_id,
         round({dot('q.qv', 'e.embedding')}
               / (sqrt({dot('q.qv', 'q.qv')}) * sqrt({dot('e.embedding', 'e.embedding')})),
               6) AS cosine
  FROM embeddings e CROSS JOIN q
  WHERE e.vec_id <> q.query_id AND e.label = {KNN_FILTER_LABEL}
)
SELECT query_id, rank, vec_id, cosine FROM (
  SELECT query_id, vec_id, cosine,
         row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, vec_id) AS rank
  FROM scored
) WHERE rank <= {TOPK}
"""


COMPLETE_PREFIXES = [
    (1, "s"),      # wide fan-out: popularity (df DESC) ordering must bite
    (2, "va"),
    (3, "fil"),
    (4, "part"),   # exact term is its own completion
    (5, "zzqq"),   # OOV -> no rows
]
COMPLETE_TOP = 5


def q_completion_prefix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Prefix autocomplete (ES completion suggester): top-5 corpus terms
    per prefix by (df DESC, term) — expand.complete_from_corpus."""
    from mtix_spark.expand import complete_from_corpus

    docs = _tbl(spark, sf_dir, "documents")
    return complete_from_corpus(docs, COMPLETE_PREFIXES, top=COMPLETE_TOP)


def q_completion_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same completions driven by the PHYSICAL index dictionary — a pure
    prefix range scan over the term-ordered dictionary relation, the form
    a serving system runs (cf. suggest_index). Shares the relational
    oracle: dictionary df IS corpus df."""
    from mtix_spark.expand import complete_terms
    from mtix_spark.index.search import SegmentSearcher

    paths = _docs_index(spark, sf_dir)
    s = SegmentSearcher(spark, paths, persist=False)
    return complete_terms(s.dictionary, COMPLETE_PREFIXES, top=COMPLETE_TOP)


def _completion_oracle() -> str:
    toks = TOK.format(c="text")
    vals = ", ".join(f"({q}, '{p}')" for q, p in COMPLETE_PREFIXES)
    return f"""
WITH toks AS (
  SELECT DISTINCT doc_id, unnest({toks}) AS term FROM documents
),
vocab AS (SELECT term, count(*)::BIGINT AS df FROM toks GROUP BY 1),
src(query_id, prefix) AS (VALUES {vals})
SELECT query_id, completion, df, rank FROM (
  SELECT query_id, term AS completion, df,
         row_number() OVER (
           PARTITION BY query_id ORDER BY df DESC, term
         )::BIGINT AS rank
  FROM vocab JOIN src ON starts_with(term, prefix)
) WHERE rank <= {COMPLETE_TOP}
"""


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: BM25 top-k over the sf0.001 documents corpus."""
    return q_bm25_topk(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    # Registry order is correctness-gate-significant: the driver oracles the FIRST 50
    # keys. Round-5 rotation (VERDICT r4 "Next round" #3/#6, recorded here AND in
    # COVERAGE.md so the stale-green assumption stays auditable — ADVICE r4 #1):
    # the three formerly rows-only ANN entries lead the window in their new EXACT
    # probe-everything modes (full-probe IVF / full-radius multi-probe LSH — same
    # machinery, candidate set == corpus, so brute SQL oracles value-check them),
    # followed by their production approximate configs as new `_probe` keys
    # (rows-only by design), then the longest-unchecked tail: 14 keys last
    # driver-checked r01/r02 (displaced by the r04 rotation) and the first 30 of
    # the r03-proven block. Every key displaced past the window is driver-green
    # in r04 (CORRECTNESS_r04.json 48/50 hash-exact + 2 rows-only) or r03, and
    # the whole registry is re-verified via tools/check_oracles.py each round.
    return {
        # new r05 batch 2 (never driver-checked — window head): identifier
        # analyzer, cross_fields, phrase prefix (relational + index), term
        # vectors, gauss decay; displaces 7 more r03-proven keys past the
        # 50-key cut (all full-registry-sweep green on this tree —
        # tools/oracle_sweep_r5.txt)
        "ident_tokens": q_ident_tokens,
        "ident_match": q_ident_match,
        "ident_index": q_ident_index,
        "multi_match_cross": q_multi_match_cross,
        "phrase_prefix": q_phrase_prefix,
        "phrase_prefix_index": q_phrase_prefix_index,
        "term_vectors": q_term_vectors,
        "decay_gauss": q_decay_gauss,
        "completion_prefix": q_completion_prefix,
        "completion_index": q_completion_index,
        "mlt_index": q_mlt_index,
        "knn_filtered": q_knn_filtered,
        # new r05 capability: trigram substring/regex grep (index.trigram),
        # leading the window so the driver value-checks it immediately
        "trigram_postings": q_trigram_postings,
        "grep_substring": q_grep_substring,
        "grep_regex": q_grep_regex,
        "grep_icase": q_grep_icase,
        # new r05 capability: percolator (mtix_spark.percolate) — also
        # leading the window for immediate value-check; to make room, two of
        # the three rows-only ANN `_probe` configs moved past the window
        # (they carry no value check by design; recall is pytest-asserted
        # and `knn_ivf_probe` stays as the in-window rows-only representative)
        "percolate_terms": q_percolate_terms,
        "percolate_phrase": q_percolate_phrase,
        # formerly rows-only, now value-checked in exact mode (VERDICT r4 #3)
        "knn_ivf": q_knn_ivf,
        "knn_lsh": q_knn_lsh,
        "embed_near_dup_lsh": q_embed_near_dup_lsh,
        # the production approximate configs — new r05 keys, rows-only by
        # design (quantizer/hash-dependent candidate sets; recall vs brute
        # asserted in pytest)
        "knn_ivf_probe": q_knn_ivf_probe,
        # longest-unchecked: last driver row r01/r02 (displaced by the r04
        # rotation; full-registry re-verified green r03 and r04)
        "tpch_q5": q_tpch_q5,
        "tpch_q6": q_tpch_q6,
        "tpch_q7": q_tpch_q7,
        "tpch_q10": q_tpch_q10,
        "tpch_q14": q_tpch_q14,
        "tpch_q19": q_tpch_q19,
        "bm25_and_topk": q_bm25_and_topk,
        "bm25_deleted_topk": q_bm25_deleted_topk,
        "bm25_facets": q_bm25_facets,
        "bm25f_topk": q_bm25f_topk,
        "boolean_search": q_boolean_search,
        "wildcard_topk": q_wildcard_topk,
        "fuzzy_topk": q_fuzzy_topk,
        "regexp_topk": q_regexp_topk,
        # r03-proven block, longest-unchecked first (last driver row r03)
        "wildcard_constant": q_wildcard_constant,
        "range_topk": q_range_topk,
        "suggest_topk": q_suggest_topk,
        "span_near": q_span_near,
        "total_hits": q_total_hits,
        "total_hits_index": q_total_hits_index,
        "doc_lookup": q_doc_lookup,
        "grouped_search": q_grouped_search,
        "term_snippets": q_term_snippets,
        "bm25_explain": q_bm25_explain,
        "bm25_page2": q_bm25_page2,
        "synonym_topk": q_synonym_topk,
        "synonym_index": q_synonym_index,
        "lm_dirichlet_topk": q_lm_dirichlet_topk,
        "lm_index": q_lm_index,
        "near_match": q_near_match,
        "near_index": q_near_index,
        "more_like_this": q_more_like_this,
        "boolean_index": q_boolean_index,
        "wildcard_index": q_wildcard_index,
        "fuzzy_index": q_fuzzy_index,
        "regexp_index": q_regexp_index,
        "range_index": q_range_index,
        "suggest_index": q_suggest_index,
        "span_near_index": q_span_near_index,
        "phrase_match": q_phrase_match,
        # ---- end of the driver's 50-key gate window (ends at phrase_match;
        # the driver oracles the FIRST 50 keys — an earlier marker claiming
        # the window reached rollup_counts had miscounted) ----
        "phrase_index": q_phrase_index,
        "phrase_snippets": q_phrase_snippets,
        "contamination": q_contamination,
        "rollup_counts": q_rollup_counts,
        # rows-only ANN probe configs displaced by the percolator insertion
        # (recall vs brute asserted in pytest; value checks live in the
        # in-window exact-mode twins knn_lsh / embed_near_dup_lsh)
        "knn_lsh_probe": q_knn_lsh_probe,
        "embed_near_dup_lsh_probe": q_embed_near_dup_lsh_probe,
        # rest of the r03-proven block (driver-green r03, re-verified by the
        # full-registry sweep every round since)
        "cube_counts": q_cube_counts,
        "range_join": q_range_join,
        "percentiles": q_percentiles,
        "distinct_users": q_distinct_users,
        "running_sum": q_running_sum,
        "anti_join": q_anti_join,
        "mti_pipeline": q_mti_pipeline,
        "semi_join": q_semi_join,
        "intersect_pairs": q_intersect_pairs,
        "events_tumbling": q_events_tumbling,
        "sanitize_years": q_sanitize_years,
        "replace_brackets": q_replace_brackets,
        "query_template": q_query_template,
        "prf_metrics": q_prf_metrics,
        "prf_metrics_critical": q_prf_metrics_critical,
        "tfidf_vectors": q_tfidf_vectors,
        "date_histogram": q_date_histogram,
        "dedup_clusters_star": q_dedup_clusters_star,
        "gopher_repetition": q_gopher_repetition,
        "boilerplate_ngrams": q_boilerplate_ngrams,
        "threshold_topn": q_threshold_topn,
        # rows-only by design, judge-re-verified r3 (VERDICT r3)
        "doc_fingerprint": q_doc_fingerprint,
        # driver-green r04 (CORRECTNESS_r04.json: 48/50 hash-exact), displaced
        # by the r05 rotation above
        "pii_scrub": q_pii_scrub,
        "split_docs": q_split_docs,
        "duplicate_spans": q_duplicate_spans,
        "scrub_spans": q_scrub_spans,
        "hybrid_rrf": q_hybrid_rrf,
        "hybrid_rrf_index": q_hybrid_rrf_index,
        "function_score": q_function_score,
        "function_score_index": q_function_score_index,
        "min_match": q_min_match,
        "min_match_index": q_min_match_index,
        "dis_max": q_dis_max,
        "dis_max_index": q_dis_max_index,
        "multi_match_best": q_multi_match_best,
        "multi_match_most": q_multi_match_most,
        "rescore": q_rescore,
        "significant_terms": q_significant_terms,
        "tf_postings": q_tf_postings,
        "term_dict": q_term_dict,
        "corpus_stats": q_corpus_stats,
        "bm25_topk": q_bm25_topk,
        "bm25_index_topk": q_bm25_index_topk,
        "bm25_merged_topk": q_bm25_merged_topk,
        "doc_sha256": q_doc_sha256,
        "token_count": q_token_count,
        "language_id": q_language_id,
        "quality_score": q_quality_score,
        "rolling_fingerprint": q_rolling_fingerprint,
        "bpe_token_count": q_bpe_token_count,
        "sessionize": q_sessionize,
        "asof_join": q_asof_join,
        "dedup_exact": q_dedup_exact,
        "dedup_clusters": q_dedup_clusters,
        "stratified_sample": q_stratified_sample,
        "pack_sequences": q_pack_sequences,
        "pack_chunks": q_pack_chunks,
        "training_order": q_training_order,
        "ngram_jaccard": q_ngram_jaccard,
        "minhash_lsh": q_minhash_lsh,
        "simhash": q_simhash,
        "simhash_pairs": q_simhash_pairs,
        "knn_cosine": q_knn_cosine,
        "embed_near_dup": q_embed_near_dup,
        "topn_per_key": q_topn_per_key,
        "run_fusion": q_run_fusion,
        "dim_join_revenue": q_dim_join_revenue,
        "tpch_q1": q_tpch_q1,
        "tpch_q3": q_tpch_q3,
        "tpch_q4": q_tpch_q4,
    }

def oracle_sql() -> dict[str, str]:
    toks = TOK.format(c="text")
    grep_needles = ", ".join(
        f"({q}::BIGINT, '{s}')" for q, s in GREP_NEEDLES
    )
    grep_pats = ", ".join(
        f"({q}::BIGINT, '{p}')" for q, p in GREP_PATTERNS
    )
    grep_icase = ", ".join(
        f"({q}::BIGINT, '{s.lower()}')" for q, s in GREP_ICASE_NEEDLES
    )
    # percolator oracles share the exact spec objects the Spark entries use,
    # normalized through the same analyzer (tokenize_py), so the VALUES
    # tables cannot drift from queries_df's normalization
    from mtix_spark.functions.text import tokenize_py

    pq_terms, pq_req = [], []
    for s in _perc_specs():
        pos = sorted({t for raw in s.terms for t in tokenize_py(raw)})
        neg = sorted({t for raw in s.must_not for t in tokenize_py(raw)})
        for t in pos:
            pq_terms.append(f"({s.query_id}::BIGINT, '{t}', FALSE)")
        for t in neg:
            pq_terms.append(f"({s.query_id}::BIGINT, '{t}', TRUE)")
        required = 1 if s.mode == "any" else (s.min_match if s.mode == "min" else len(pos))
        pq_req.append(f"({s.query_id}::BIGINT, {required})")
    perc_terms_v, perc_req_v = ", ".join(pq_terms), ", ".join(pq_req)
    pp = []
    for s in _perc_phrase_specs():
        ptoks = tokenize_py(s.phrase)
        pp.append(
            f"({s.query_id}::BIGINT, '{' '.join(ptoks)}', {len(set(ptoks))}::BIGINT)"
        )
    perc_phrase_v = ", ".join(pp)
    return {
        "ident_tokens": _ident_tokens_oracle(),
        "ident_match": _ident_match_oracle(),
        "ident_index": _ident_match_oracle(),
        "multi_match_cross": _multi_match_cross_oracle(),
        "phrase_prefix": _phrase_prefix_oracle(),
        "phrase_prefix_index": _phrase_prefix_oracle(),
        "term_vectors": _term_vectors_oracle(),
        "decay_gauss": _decay_gauss_oracle(),
        "completion_prefix": _completion_oracle(),
        "mlt_index": _mlt_oracle(),
        "knn_filtered": _knn_filtered_oracle(),
        "completion_index": _completion_oracle(),
        "trigram_postings": """
SELECT gram, count(DISTINCT doc_id)::BIGINT AS df FROM (
  SELECT doc_id, substr(text, i, 3) AS gram
  FROM (SELECT doc_id, text, unnest(generate_series(1, length(text)-2)) AS i
        FROM documents WHERE length(text) >= 3)
) GROUP BY gram
""",
        "grep_substring": f"""
WITH needles(query_id, needle) AS (VALUES {grep_needles})
SELECT n.query_id, d.doc_id,
       ((length(d.text) - length(replace(d.text, n.needle, '')))
        / length(n.needle))::BIGINT AS n_occ
FROM documents d, needles n
WHERE contains(d.text, n.needle)
""",
        "grep_regex": f"""
WITH pats(query_id, pat) AS (VALUES {grep_pats})
SELECT p.query_id, d.doc_id
FROM documents d, pats p
WHERE regexp_matches(d.text, p.pat)
""",
        "grep_icase": f"""
WITH needles(query_id, needle) AS (VALUES {grep_icase})
SELECT n.query_id, d.doc_id,
       ((length(lower(d.text)) - length(replace(lower(d.text), n.needle, '')))
        / length(n.needle))::BIGINT AS n_occ
FROM documents d, needles n
WHERE contains(lower(d.text), n.needle)
""",
        "percolate_terms": f"""
WITH q(query_id, term, is_neg) AS (VALUES {perc_terms_v}),
req(query_id, required) AS (VALUES {perc_req_v}),
dt AS (SELECT doc_id, unnest(list_distinct({toks})) AS term FROM documents),
m AS (
  SELECT dt.doc_id, q.query_id,
         SUM(CASE WHEN NOT q.is_neg THEN 1 ELSE 0 END)::BIGINT AS n_matched,
         SUM(CASE WHEN q.is_neg THEN 1 ELSE 0 END)::BIGINT AS n_neg
  FROM dt JOIN q USING (term) GROUP BY 1, 2
)
SELECT m.query_id, m.doc_id, m.n_matched
FROM m JOIN req USING (query_id)
WHERE m.n_neg = 0 AND m.n_matched >= req.required
ORDER BY query_id, doc_id
""",
        "percolate_phrase": f"""
WITH pq(query_id, phrase, n_matched) AS (VALUES {perc_phrase_v}),
ts AS (SELECT doc_id,
              ' ' || array_to_string({toks}, ' ') || ' ' AS s
       FROM documents)
SELECT pq.query_id, ts.doc_id, pq.n_matched
FROM pq JOIN ts ON contains(ts.s, ' ' || pq.phrase || ' ')
ORDER BY query_id, doc_id
""",
        "tf_postings": f"""
SELECT term, doc_id, count(*)::BIGINT AS tf FROM (
  SELECT doc_id, unnest({toks}) AS term FROM documents
) GROUP BY 1, 2
""",
        "term_dict": f"""
WITH tf AS (
  SELECT doc_id, term, count(*)::BIGINT AS tf FROM (
    SELECT doc_id, unnest({toks}) AS term FROM documents
  ) GROUP BY 1, 2
)
SELECT term, count(*)::BIGINT AS df, sum(tf)::BIGINT AS cf FROM tf GROUP BY 1
""",
        "corpus_stats": f"""
SELECT count(*)::BIGINT AS n_docs,
       round(avg(len({toks})::DOUBLE), 6) AS avgdl
FROM documents
""",
        "bm25_topk": _bm25_oracle(),
        "bm25_index_topk": _bm25_oracle(),
        "bm25_merged_topk": _bm25_oracle(),
        "doc_sha256": "SELECT doc_id, sha256(text) AS content_sha FROM documents",
        "token_count": f"SELECT doc_id, len({toks})::BIGINT AS n_tokens FROM documents",
        "rolling_fingerprint": _rolling_fp_oracle(),
        "bpe_token_count": """
SELECT doc_id,
       len(regexp_extract_all(text, ' ?[a-zA-Z]+| ?[0-9]+| ?[^a-zA-Z0-9 ]+'))::BIGINT AS n_bpe
FROM documents
""",
        "sessionize": """
WITH b AS (
  SELECT user_id, event_id, ts,
         CASE WHEN lag(ts) OVER w IS NULL
                OR epoch(ts) - epoch(lag(ts) OVER w) > 1800 THEN 1 ELSE 0 END AS nb
  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
s AS (
  SELECT user_id, ts,
         CAST(sum(nb) OVER (PARTITION BY user_id ORDER BY ts, event_id
                            ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
  FROM b
)
SELECT user_id, session_id, min(ts) AS session_start, max(ts) AS session_end,
       count(*)::BIGINT AS n_events
FROM s GROUP BY 1, 2
""",
        "asof_join": """
WITH p AS (
  SELECT user_id, ts, max(value) AS pvalue
  FROM events WHERE event_type = 'purchase' GROUP BY 1, 2
)
SELECT e.event_id, e.user_id, p.ts AS asof_ts, round(p.pvalue, 6) AS asof_value
FROM events e ASOF LEFT JOIN p ON e.user_id = p.user_id AND e.ts >= p.ts
""",
        "language_id": _language_id_oracle(),
        "quality_score": _quality_oracle(),
        "dedup_exact": """
SELECT sha256(text) AS content_sha, min(doc_id) AS keeper_id,
       count(*)::BIGINT AS n_copies
FROM documents GROUP BY 1
""",
        "ngram_jaccard": _ngram_jaccard_oracle(),
        "minhash_lsh": _minhash_oracle(),
        "dedup_clusters": _dedup_clusters_oracle(),
        "dedup_clusters_star": _dedup_clusters_oracle(),
        "stratified_sample": _stratified_sample_oracle(),
        "pack_sequences": _pack_sequences_oracle(),
        "pack_chunks": _pack_chunks_oracle(),
        "training_order": _training_order_oracle(),
        "simhash": _simhash_oracle(),
        "simhash_pairs": _simhash_pairs_oracle(),
        "knn_cosine": _knn_oracle(),
        "embed_near_dup": _embed_near_dup_oracle(),
        # exact-mode ANN entries (VERDICT r4 #3): full-probe IVF and
        # full-radius multi-probe LSH must reproduce brute cosine exactly,
        # so they share the brute oracles; the `_probe` production configs
        # stay oracle-less (rows-only) by design
        "knn_ivf": _knn_oracle(),
        "knn_lsh": _knn_oracle(),
        "embed_near_dup_lsh": _embed_near_dup_oracle(),
        "topn_per_key": """
SELECT q_id, p_id, round(score, 6) AS score FROM (
  SELECT user_id AS q_id, event_id AS p_id, value AS score,
         row_number() OVER (PARTITION BY user_id ORDER BY value DESC, event_id) AS rn
  FROM events WHERE event_type = 'purchase'
) WHERE rn <= 3
""",
        "run_fusion": """
WITH r1 AS (
  SELECT user_id AS q_id, event_type AS p_id, sum(value) AS s
  FROM events WHERE event_id % 2 = 0 GROUP BY 1, 2
),
r2 AS (
  SELECT user_id AS q_id, event_type AS p_id, sum(value) AS s
  FROM events WHERE event_id % 2 = 1 GROUP BY 1, 2
)
SELECT q_id, p_id, round((r1.s + r2.s) / 2.0, 6) AS score
FROM r1 JOIN r2 USING (q_id, p_id)
""",
        "threshold_topn": """
WITH run AS (
  SELECT user_id AS q_id, event_id AS p_id,
         value / (SELECT max(value) FROM events) AS score
  FROM events
)
SELECT q_id, p_id, round(score, 6) AS score FROM (
  SELECT q_id, p_id, score,
         row_number() OVER (PARTITION BY q_id ORDER BY score DESC, p_id) AS rn
  FROM run WHERE score >= 0.48
) WHERE rn <= 5
""",
        "dim_join_revenue": """
SELECT r_name,
       round(sum(l_extendedprice * (1.0 - l_discount)), 4) AS revenue,
       count(*)::BIGINT AS n_items
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY 1
""",
        "tpch_q1": """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 4) AS sum_qty,
       round(sum(l_extendedprice), 4) AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 4) AS sum_disc_price,
       round(avg(l_quantity), 6) AS avg_qty,
       round(avg(l_discount), 6) AS avg_disc,
       count(*)::BIGINT AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY 1, 2
""",
        "tpch_q6": """
SELECT round(sum(l_extendedprice * l_discount), 4) AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1994-01-01'
  AND l_shipdate < TIMESTAMP '1995-01-01'
  AND l_discount >= 0.05 AND l_discount <= 0.07
  AND l_quantity < 24
""",
        "tpch_q4": """
SELECT o_orderpriority, count(*)::BIGINT AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1997-01-01'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
GROUP BY 1
""",
        "tpch_q7": """
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       year(l_shipdate)::INT AS l_year,
       round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
   OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
GROUP BY 1, 2, 3
""",
        "tpch_q10": """
SELECT c_custkey, c_name, c_acctbal, n_name,
       round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
JOIN nation ON c_nationkey = n_nationkey
WHERE o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1996-07-01'
  AND l_returnflag = 'R'
GROUP BY 1, 2, 3, 4
ORDER BY revenue DESC, c_custkey
LIMIT 20
""",
        "tpch_q14": """
SELECT round(100.0 * sum(CASE WHEN p_type = 'PROMO'
                              THEN l_extendedprice * (1 - l_discount)
                              ELSE 0.0 END)
             / sum(l_extendedprice * (1 - l_discount)), 6) AS promo_revenue_pct
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1996-03-01'
  AND l_shipdate < TIMESTAMP '1996-04-01'
""",
        "tpch_q19": """
SELECT round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 35 AND l_quantity BETWEEN 20 AND 30)
""",
        "tpch_q3": """
SELECT l_orderkey, o_orderdate::DATE AS o_orderdate, o_orderpriority, revenue
FROM (
  SELECT l_orderkey, o_orderdate, o_orderpriority,
         round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue
  FROM customer
  JOIN orders ON c_custkey = o_custkey
  JOIN lineitem ON o_orderkey = l_orderkey
  WHERE c_mktsegment = 'BUILDING'
    AND o_orderdate < TIMESTAMP '1995-03-15'
    AND l_shipdate > TIMESTAMP '1995-03-15'
  GROUP BY 1, 2, 3
)
ORDER BY revenue DESC, l_orderkey
LIMIT 10
""",
        "tpch_q5": """
SELECT n_name,
       round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE c_nationkey = s_nationkey
GROUP BY 1
""",
        "bm25_and_topk": _bm25_oracle(conjunctive=True),
        "bm25_deleted_topk": _bm25_oracle(exclude=DELETED_ORIG_IDS),
        "bm25_facets": _facet_oracle(),
        "bm25f_topk": _bm25f_oracle(),
        "boolean_search": _boolean_oracle(),
        "wildcard_topk": _wildcard_oracle(),
        "fuzzy_topk": _fuzzy_oracle(),
        "regexp_topk": _regexp_oracle(),
        "wildcard_constant": _wildcard_constant_oracle(),
        "range_topk": _range_oracle(),
        "suggest_topk": _suggest_oracle(),
        "span_near": _span_near_oracle(),
        "total_hits": _total_hits_oracle(),
        "total_hits_index": _total_hits_oracle(),
        "grouped_search": _grouped_oracle(),
        "term_snippets": _term_snippets_oracle(),
        "doc_lookup": f"SELECT doc_id, lang, len({TOK.format(c='text')})::BIGINT AS dl, sha256(text) AS content_sha FROM documents WHERE doc_id IN ({', '.join(map(str, LOOKUP_IDS))})",
        "bm25_explain": _explain_oracle(),
        "bm25_page2": _page2_oracle(),
        "synonym_topk": _synonym_oracle(),
        "synonym_index": _synonym_oracle(),
        "lm_dirichlet_topk": _lm_oracle(),
        "lm_index": _lm_oracle(),
        "near_match": _near_oracle(),
        "near_index": _near_oracle(),
        "more_like_this": _mlt_oracle(),
        "boolean_index": _boolean_oracle(),
        "wildcard_index": _wildcard_oracle(),
        "fuzzy_index": _fuzzy_oracle(),
        "regexp_index": _regexp_oracle(),
        "range_index": _range_oracle(),
        "suggest_index": _suggest_oracle(),
        "span_near_index": _span_near_oracle(),
        "phrase_match": _phrase_oracle(),
        "phrase_index": _phrase_oracle(),
        "phrase_snippets": _snippet_oracle(),
        "contamination": _contamination_oracle(),
        "rollup_counts": """
SELECT lang, source, count(*)::BIGINT AS n, sum(n_chars)::BIGINT AS chars
FROM documents GROUP BY ROLLUP (lang, source)
""",
        "cube_counts": """
SELECT lang, source, count(*)::BIGINT AS n, sum(n_chars)::BIGINT AS chars
FROM documents GROUP BY CUBE (lang, source)
""",
        "range_join": """
SELECT p.event_id AS purchase_id, c.event_id AS click_id
FROM events p
JOIN events c
  ON p.event_type = 'purchase' AND c.event_type = 'click'
 AND p.user_id = c.user_id
 AND epoch(c.ts) >= epoch(p.ts)
 AND epoch(c.ts) <= epoch(p.ts) + 3600
""",
        "percentiles": """
SELECT event_type,
       round(quantile_cont(value, 0.5), 6) AS p50,
       round(quantile_cont(value, 0.95), 6) AS p95
FROM events GROUP BY 1
""",
        "distinct_users": """
SELECT event_type, count(DISTINCT user_id)::BIGINT AS n_users,
       count(*)::BIGINT AS n_events
FROM events GROUP BY 1
""",
        "running_sum": """
SELECT user_id, event_id,
       round(sum(value) OVER (
         PARTITION BY user_id ORDER BY ts, event_id
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
       ), 6) AS running_value
FROM events WHERE user_id < 50
""",
        "anti_join": """
SELECT c_custkey FROM customer
WHERE c_custkey NOT IN (
  SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
)
""",
        "mti_pipeline": f"""
WITH bm AS ({_bm25_oracle()}),
pr AS (SELECT doc_id, ({_quality_expr()}) * 10.0 AS prior FROM documents),
fused AS (
  SELECT bm.query_id, bm.doc_id,
         round((bm.score + pr.prior) / 2.0, 6) AS fscore
  FROM bm JOIN pr ON bm.doc_id = pr.doc_id
  WHERE round((bm.score + pr.prior) / 2.0, 6) >= 1.0
),
top AS (
  SELECT query_id, doc_id, fscore,
         row_number() OVER (PARTITION BY query_id ORDER BY fscore DESC, doc_id) AS rank
  FROM fused
)
SELECT t.query_id, t.rank, t.doc_id, d.source, t.fscore
FROM top t JOIN documents d ON t.doc_id = d.doc_id
WHERE t.rank <= 5
""",
        "semi_join": """
SELECT c_custkey FROM customer
WHERE c_custkey IN (SELECT o_custkey FROM orders)
""",
        "intersect_pairs": """
SELECT DISTINCT user_id, event_type FROM events WHERE ts < TIMESTAMP '2024-01-16'
INTERSECT
SELECT DISTINCT user_id, event_type FROM events WHERE ts >= TIMESTAMP '2024-01-16'
""",
        "events_tumbling": """
SELECT time_bucket(INTERVAL 1 day, ts)::DATE AS day, event_type,
       count(*)::BIGINT AS n_events,
       round(sum(value), 4) AS sum_value
FROM events GROUP BY 1, 2
""",
        "sanitize_years": """
SELECT o_orderkey,
       least(greatest(coalesce(
         CASE WHEN o_orderstatus = 'O' THEN NULL ELSE year(o_orderdate) END,
         2023), 1902), 2023)::INT AS pub_year
FROM orders
""",
        "replace_brackets": """
SELECT doc_id,
       CASE WHEN regexp_matches(s, '\\]\\s*\\[') THEN translate(s, '[]', '()')
            ELSE s END AS fixed
FROM (SELECT doc_id, '[' || substr(text, 1, 30) || '] [tail]' AS s FROM documents)
""",
        "query_template": """
SELECT doc_id, concat_ws('|', lang, source, substr(text, 1, 40)) AS qtext
FROM documents
""",        "prf_metrics": """
WITH tru0 AS (
  SELECT DISTINCT doc_id % 50 AS q_id, lang AS label,
         (['surgery','therapy','blood',''])[CAST(doc_id % 4 AS INT) + 1] AS sub
  FROM documents WHERE doc_id % 7 BETWEEN 0 AND 4
), pred0 AS (
  SELECT DISTINCT doc_id % 50 AS q_id, lang AS label,
         (['surgery','therapy','blood',''])[CAST(doc_id % 4 AS INT) + 1] AS sub
  FROM documents WHERE doc_id % 7 BETWEEN 2 AND 6
), pq AS (SELECT DISTINCT q_id FROM pred0),
t AS (SELECT * FROM tru0 WHERE q_id IN (SELECT q_id FROM pq)),
i AS (SELECT * FROM t INTERSECT SELECT * FROM pred0),
c AS (SELECT (SELECT count(*) FROM t) AS nt,
             (SELECT count(*) FROM pred0) AS np,
             (SELECT count(*) FROM i) AS ni)
SELECT round(ni/(np+1e-9), 6) AS precision,
       round(ni/(nt+1e-9), 6) AS recall,
       round(2*(ni/(np+1e-9))*(ni/(nt+1e-9))
             /((ni/(np+1e-9))+(ni/(nt+1e-9))+1e-9), 6) AS f1,
       nt AS n_true, np AS n_pred, ni AS n_inter
FROM c
""",
        "prf_metrics_critical": """
WITH tru0 AS (
  SELECT DISTINCT doc_id % 50 AS q_id, lang AS label,
         (['surgery','therapy','blood',''])[CAST(doc_id % 4 AS INT) + 1] AS sub
  FROM documents WHERE doc_id % 7 BETWEEN 0 AND 4
), pred0 AS (
  SELECT DISTINCT doc_id % 50 AS q_id, lang AS label,
         (['surgery','therapy','blood',''])[CAST(doc_id % 4 AS INT) + 1] AS sub
  FROM documents WHERE doc_id % 7 BETWEEN 2 AND 6
), pq AS (SELECT DISTINCT q_id FROM pred0),
tru1 AS (SELECT * FROM tru0 WHERE sub = '' OR sub IN ('surgery','therapy')),
pred1 AS (SELECT * FROM pred0 WHERE sub = '' OR sub IN ('surgery','therapy')),
t AS (SELECT * FROM tru1 WHERE q_id IN (SELECT q_id FROM pq)),
i AS (SELECT * FROM t INTERSECT SELECT * FROM pred1),
c AS (SELECT (SELECT count(*) FROM t) AS nt,
             (SELECT count(*) FROM pred1) AS np,
             (SELECT count(*) FROM i) AS ni)
SELECT round(ni/(np+1e-9), 6) AS precision,
       round(ni/(nt+1e-9), 6) AS recall,
       round(2*(ni/(np+1e-9))*(ni/(nt+1e-9))
             /((ni/(np+1e-9))+(ni/(nt+1e-9))+1e-9), 6) AS f1,
       nt AS n_true, np AS n_pred, ni AS n_inter
FROM c
""",
        "tfidf_vectors": f"""
WITH tf AS (
  SELECT doc_id, term, count(*)::BIGINT AS tf FROM (
    SELECT doc_id, unnest({toks}) AS term FROM documents
  ) GROUP BY 1, 2
), dfreq AS (SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY 1),
n AS (SELECT count(*)::BIGINT AS n_docs FROM documents),
w AS (
  SELECT tf.doc_id, tf.term,
         tf * (ln((1.0 + n_docs)/(1.0 + df)) + 1.0) AS wraw
  FROM tf, n JOIN dfreq ON tf.term = dfreq.term
  WHERE tf.doc_id % 20 = 0
), nrm AS (SELECT doc_id, sqrt(sum(wraw*wraw)) AS nn FROM w GROUP BY 1)
SELECT w.doc_id, w.term, round(wraw/nn, 6) AS weight
FROM w JOIN nrm ON w.doc_id = nrm.doc_id
""",
        "date_histogram": """
SELECT CAST(date_trunc('day', ts) AS DATE) AS day, event_type,
       count(*)::BIGINT AS n, round(sum(value), 4) AS value_sum
FROM events GROUP BY 1, 2
""",        "gopher_repetition": """
WITH t AS (SELECT doc_id, list_filter(string_split_regex(lower(text), '[^a-z0-9_]+'), t -> t <> '') AS l FROM documents),
g AS (SELECT doc_id, l, CASE WHEN len(l) >= 3 THEN list_transform(range(len(l) - 2), i -> l[i+1] || ' ' || l[i+2] || ' ' || l[i+3]) ELSE [] END AS grams FROM t)
SELECT doc_id, len(l)::BIGINT AS n_tokens,
  round(CASE WHEN len(l) > 0
        THEN 1.0 - len(list_distinct(l))::DOUBLE / len(l)::DOUBLE
        ELSE 0.0 END, 6) AS dup_token_frac,
  round(CASE WHEN len(grams) > 0
        THEN 1.0 - len(list_distinct(grams))::DOUBLE / len(grams)::DOUBLE
        ELSE 0.0 END, 6) AS dup_ngram_frac
FROM g
""",
        "boilerplate_ngrams": """
WITH t AS (SELECT doc_id, list_filter(string_split_regex(lower(text), '[^a-z0-9_]+'), t -> t <> '') AS l FROM documents),
sh AS (SELECT doc_id, unnest(list_distinct(list_transform(range(len(l) - 4), i -> l[i+1] || ' ' || l[i+2] || ' ' || l[i+3] || ' ' || l[i+4] || ' ' || l[i+5]))) AS gram FROM t WHERE len(l) >= 5)
SELECT gram, count(*)::BIGINT AS n_docs FROM sh GROUP BY 1 HAVING count(*) >= 3
""",
        "pii_scrub": """
SELECT doc_id,
  regexp_replace(
    regexp_replace(
      substr(text, 1, 50) || ' contact user' || CAST(doc_id AS VARCHAR)
        || '@mail.example.com or 555-123-4567 now',
      '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}', '<EMAIL>', 'g'),
    '\\b[0-9]{3}[- .][0-9]{3}[- .][0-9]{4}\\b', '<PHONE>', 'g') AS clean_text
FROM documents
""",
        "split_docs": """
SELECT doc_id,
  greatest(1, CAST(ceil(len({TOKS})/32.0) AS BIGINT)) AS n_chunks,
  len({TOKS})::BIGINT AS n_tokens
FROM documents
""".replace("{TOKS}", toks),
        "duplicate_spans": """
WITH t AS (SELECT doc_id, {TOKS} AS l FROM documents),
g0 AS (SELECT doc_id, unnest(range(len(l) - 7)) AS pos, l FROM t WHERE len(l) >= 8),
g AS (SELECT doc_id, pos, array_to_string(l[pos+1:pos+8], ' ') AS gram FROM g0),
d AS (SELECT gram FROM g GROUP BY gram HAVING count(DISTINCT doc_id) >= 2),
m AS (SELECT g.doc_id, g.pos FROM g SEMI JOIN d USING (gram)),
w AS (SELECT doc_id, pos,
  CASE WHEN coalesce(pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos), 9) > 8
       THEN 1 ELSE 0 END AS brk FROM m),
i AS (SELECT doc_id, pos, sum(brk) OVER (PARTITION BY doc_id ORDER BY pos) AS island FROM w)
SELECT doc_id, min(pos)::BIGINT AS span_start, (max(pos) + 8)::BIGINT AS span_end,
  count(*)::BIGINT AS n_grams
FROM i GROUP BY doc_id, island
""".replace("{TOKS}", toks),
        "scrub_spans": """
WITH t AS (SELECT doc_id, {TOKS} AS l FROM documents),
g0 AS (SELECT doc_id, unnest(range(len(l) - 7)) AS pos, l FROM t WHERE len(l) >= 8),
g AS (SELECT doc_id, pos, array_to_string(l[pos+1:pos+8], ' ') AS gram FROM g0),
d AS (SELECT gram FROM g GROUP BY gram HAVING count(DISTINCT doc_id) >= 2),
m AS (SELECT g.doc_id, g.pos FROM g SEMI JOIN d USING (gram)),
w AS (SELECT doc_id, pos,
  CASE WHEN coalesce(pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos), 9) > 8
       THEN 1 ELSE 0 END AS brk FROM m),
i AS (SELECT doc_id, pos, sum(brk) OVER (PARTITION BY doc_id ORDER BY pos) AS island FROM w),
s AS (SELECT doc_id, min(pos) AS ss, max(pos) + 8 AS se FROM i GROUP BY doc_id, island),
spl AS (SELECT doc_id, list(struct_pack(s := ss, e := se)) AS sp FROM s GROUP BY doc_id),
k AS (SELECT t.doc_id, l,
  list_filter(l, (x, j) -> NOT coalesce(
    list_bool_or(list_transform(sp, q -> (j-1) >= q.s AND (j-1) < q.e)), FALSE)) AS kept
  FROM t LEFT JOIN spl USING (doc_id))
SELECT doc_id,
  -- duckdb's array_to_string([]) is NULL; Spark's array_join([]) is ''
  coalesce(array_to_string(kept, ' '), '') AS clean_text,
  (len(l) - len(kept))::BIGINT AS n_removed
FROM k
""".replace("{TOKS}", toks),
        "hybrid_rrf": _hybrid_oracle(),
        "hybrid_rrf_index": _hybrid_oracle(),
        "function_score": _function_score_oracle(),
        "function_score_index": _function_score_index_oracle(),
        "min_match": _min_match_oracle(),
        "min_match_index": _min_match_oracle(),
        "dis_max": _dis_max_oracle(),
        "dis_max_index": _dis_max_oracle(),
        "multi_match_best": _multi_match_oracle("best_fields"),
        "multi_match_most": _multi_match_oracle("most_fields"),
        "rescore": _rescore_oracle(),
        "significant_terms": _significant_terms_oracle(),
    }
