"""Hybrid lexical+vector retrieval with reciprocal-rank fusion (RRF).

The reference fuses its two remote ranker outputs by averaging calibrated
scores (/root/reference/src/mtix/pipelines.py — pointwise/listwise score
average). Hybrid lexical+dense retrieval cannot fuse that way: BM25 scores
and cosine similarities live on incomparable scales. The standard answer is
rank-based fusion (Cormack, Clarke & Buettcher, SIGIR'09): per run r with
weight w_r, a doc at rank `rank_r` contributes w_r / (k_rrf + rank_r), and
the fused score is the sum over runs that retrieved the doc.

Scale shape: each leg is already a per-query top-L frame (L = leg_k), so the
fusion input is <= |Q| * L * n_runs rows regardless of corpus size — a
union, one keyed aggregation, and a per-query window, all bounded by the
query batch and never by the 10^12-doc corpus. The legs themselves are the
engine's existing scale paths: block-max MaxScore over the physical inverted
index for the lexical run (mtix_spark.index.search), and brute / sign-LSH /
IVF ANN for the vector run (mtix_spark.similarity).

Determinism discipline (what makes the DuckDB value-hash oracle exact):
fused scores round to 6 decimals before ranking, ties break doc_id ASC, and
with the default two runs the contribution sum is a single commutative
double addition — no order sensitivity.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

RRF_K = 60  # the SIGIR'09 constant; large enough that rank 1 vs 2 ~ 1.6%
SCORE_DECIMALS = 6


def rrf_fuse(
    runs: Sequence[DataFrame],
    k: int = 10,
    k_rrf: int = RRF_K,
    weights: Sequence[float] | None = None,
) -> DataFrame:
    """Fuse ranked runs by reciprocal-rank fusion.

    Each run is a (query_id, rank, doc_id, ...) frame — the shape every
    top-k entry point in this engine returns. Fused score for a doc is
    sum_r w_r / (k_rrf + rank_r) over the runs that retrieved it, rounded
    to 6; final ranking is score DESC, doc_id ASC, truncated at `k`.

    Plan: per-run projection to (query_id, doc_id, contrib), unionByName,
    one groupBy (query_id, doc_id) sum, one per-query window. Input size is
    bounded by the runs' own top-L truncation, so every stage is query-batch
    sized. With >2 runs the float sum is aggregation-order-dependent in the
    last ulp; the 6-decimal round makes that unobservable for RRF magnitudes
    (contributions >= 1/(k_rrf + L) apart by construction except true ties).
    """
    if not runs:
        raise ValueError("rrf_fuse needs at least one ranked run")
    if weights is None:
        weights = [1.0] * len(runs)
    if len(weights) != len(runs):
        raise ValueError(f"{len(runs)} runs but {len(weights)} weights")
    legs = [
        r.select(
            "query_id",
            "doc_id",
            (F.lit(float(w)) / (F.lit(float(k_rrf)) + F.col("rank").cast("double"))).alias(
                "contrib"
            ),
        )
        for r, w in zip(runs, weights)
    ]
    allc = legs[0]
    for leg in legs[1:]:
        allc = allc.unionByName(leg)
    fused = allc.groupBy("query_id", "doc_id").agg(
        F.round(F.sum("contrib"), SCORE_DECIMALS).alias("score")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        fused.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "doc_id", "score")
    )


def _query_expansion(
    spark: SparkSession, queries: Sequence[tuple[int, str]]
) -> DataFrame:
    """(query_id, term) relation — distinct sorted terms per query, the same
    dedup discipline as index.search.query_terms. Delegates to the shared
    expand helper so the tokenizer regex (functions.text.TOKEN_SPLIT_RE) has
    exactly one query-side definition."""
    from mtix_spark.expand import _expand_query_terms

    return _expand_query_terms(spark, queries)


def hybrid_rrf_topk(
    docs: DataFrame,
    embeddings: DataFrame,
    queries: Sequence[tuple[int, str]],
    k: int = 10,
    leg_k: int = 10,
    k_rrf: int = RRF_K,
    id_col: str = "doc_id",
    text_col: str = "text",
    vec_id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Hybrid search, relational legs: BM25 top-leg_k over `docs` fused with
    cosine top-leg_k over `embeddings` by RRF.

    The query vector for query_id q is the embedding row with
    `vec_id == q` (self excluded from the vector leg, the kNN convention);
    doc ids and vec ids share a keyspace. This is the Catalyst-only twin of
    `hybrid_rrf_index` — both share one SQL oracle.
    """
    from mtix_spark.expand import expanded_bm25
    from mtix_spark.similarity import knn_cosine_brute

    spark = docs.sparkSession
    exp = _query_expansion(spark, queries)
    lex = expanded_bm25(docs, exp, k=leg_k, id_col=id_col, text_col=text_col)
    vec = knn_cosine_brute(
        embeddings, [qid for qid, _ in queries], k=leg_k, id_col=vec_id_col, vec_col=vec_col
    ).select("query_id", "rank", F.col(vec_id_col).alias("doc_id"))
    return rrf_fuse([lex, vec], k=k, k_rrf=k_rrf)


def hybrid_rrf_index(
    spark: SparkSession,
    paths,
    embeddings: DataFrame,
    queries: Sequence[tuple[int, str]],
    k: int = 10,
    leg_k: int = 10,
    k_rrf: int = RRF_K,
    id_map: DataFrame | None = None,
    vec_id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Hybrid search with the lexical leg on the PHYSICAL inverted index
    (delta+varint postings, block-max MaxScore — index.search.bm25_topk_segments)
    and the vector leg on the embedding table; fused by RRF.

    `id_map` (dense_id, doc_id) remaps the index's dense docIDs into the
    embedding keyspace before fusing. The index kernel tie-breaks on dense
    ids, the fused ranking on mapped ids, so the lexical leg fetches a
    4x tie margin and re-ranks after the remap — the same margin discipline
    as every index-vs-oracle entry (see __spark_entry__._bm25_over_documents).

    At 10^12 docs both legs stay on their scale paths: the lexical fetch
    touches only the query terms' postings; swap `knn_cosine_brute` for the
    IVF searcher when the embedding side outgrows a linear scan.
    """
    from mtix_spark.index.search import bm25_topk_segments
    from mtix_spark.similarity import knn_cosine_brute

    # same tie-margin convention as __spark_entry__._remap_rerank (k*5),
    # floored at leg_k+30 so tiny leg_k still over-fetches a full tie class
    margin = max(5 * leg_k, leg_k + 30)
    lex = bm25_topk_segments(spark, paths, list(queries), k=margin)
    if id_map is not None:
        lex = (
            lex.withColumnRenamed("doc_id", "dense_id")
            .join(id_map, "dense_id")
            .select("query_id", "doc_id", "score")
        )
    else:
        lex = lex.select("query_id", "doc_id", "score")
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_id"))
    lex = (
        lex.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= leg_k)
        .select("query_id", "rank", "doc_id")
    )
    vec = knn_cosine_brute(
        embeddings, [qid for qid, _ in queries], k=leg_k, id_col=vec_id_col, vec_col=vec_col
    ).select("query_id", "rank", F.col(vec_id_col).alias("doc_id"))
    return rrf_fuse([lex, vec], k=k, k_rrf=k_rrf)
