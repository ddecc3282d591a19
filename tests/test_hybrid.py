"""Hybrid RRF fusion + function-score tests.

The DuckDB value-hash twin lives in __spark_entry__ (`hybrid_rrf`,
`hybrid_rrf_index`, `function_score`); these tests cover the algebra the
oracle can't see: hand-computed RRF arithmetic, weight handling, relational
vs physical-index rank identity on a corpus with a real segment layout, and
the boost-reranks-the-full-matched-set property of function score.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from mtix_spark.corpus import synth_queries
from mtix_spark.expand import expanded_bm25, function_score_topk
from mtix_spark.hybrid import RRF_K, hybrid_rrf_index, hybrid_rrf_topk, rrf_fuse


def _rows(df):
    return sorted(
        (r["query_id"], r["rank"], r["doc_id"], r["score"]) for r in df.collect()
    )


@pytest.fixture(scope="module")
def small_embeddings(spark, small_docs):
    """One deterministic 16-dim gaussian embedding per doc (vec_id=doc_id)."""
    n = small_docs.count()
    rng = np.random.default_rng(777)
    mat = rng.standard_normal((n, 16)).astype(np.float32)
    pdf = pd.DataFrame(
        {"vec_id": np.arange(n, dtype=np.int64), "embedding": list(map(list, mat))}
    )
    emb = spark.createDataFrame(pdf).cache()
    emb.count()
    return emb


def test_rrf_fuse_hand_computed(spark):
    run1 = spark.createDataFrame(
        [(1, 1, 10), (1, 2, 20)], "query_id long, rank long, doc_id long"
    )
    run2 = spark.createDataFrame(
        [(1, 1, 20), (1, 2, 30)], "query_id long, rank long, doc_id long"
    )
    out = {r["doc_id"]: (r["rank"], r["score"]) for r in rrf_fuse([run1, run2], k=10).collect()}
    exp_20 = round(1 / (RRF_K + 1) + 1 / (RRF_K + 2), 6)
    exp_10 = round(1 / (RRF_K + 1), 6)
    exp_30 = round(1 / (RRF_K + 2), 6)
    assert out == {20: (1, exp_20), 10: (2, exp_10), 30: (3, exp_30)}


def test_rrf_weights_and_validation(spark):
    run1 = spark.createDataFrame([(1, 1, 10)], "query_id long, rank long, doc_id long")
    run2 = spark.createDataFrame([(1, 1, 20)], "query_id long, rank long, doc_id long")
    out = {
        r["doc_id"]: r["score"]
        for r in rrf_fuse([run1, run2], k=10, weights=[3.0, 1.0]).collect()
    }
    assert out == {
        10: round(3.0 / (RRF_K + 1), 6),
        20: round(1.0 / (RRF_K + 1), 6),
    }
    with pytest.raises(ValueError):
        rrf_fuse([run1, run2], weights=[1.0])


def test_hybrid_relational_vs_index_rank_identical(
    spark, small_docs, small_index, small_embeddings
):
    # dense docIDs in small_index ARE small_docs.doc_id (assign_doc_ids fed
    # build_index), so the index path needs no id_map — the two paths must
    # agree exactly, including RRF scores.
    queries = [(q, t) for q, t, _ in synth_queries(spark, 12).collect()]
    rel = hybrid_rrf_topk(
        small_docs, small_embeddings, queries, k=10, leg_k=10, text_col="content"
    )
    idx = hybrid_rrf_index(
        spark, small_index, small_embeddings, queries, k=10, leg_k=10
    )
    assert _rows(rel) == _rows(idx)
    assert rel.count() > 0


def test_hybrid_doc_in_both_legs_sums_contributions(
    spark, small_docs, small_embeddings
):
    # every fused score must equal the recomputed sum of its legs' RRF terms
    queries = [(q, t) for q, t, _ in synth_queries(spark, 8).collect()]
    from mtix_spark.hybrid import _query_expansion
    from mtix_spark.similarity import knn_cosine_brute

    exp = _query_expansion(spark, queries)
    lex = {
        (r["query_id"], r["doc_id"]): r["rank"]
        for r in expanded_bm25(small_docs, exp, k=10, text_col="content").collect()
    }
    vec = {
        (r["query_id"], r["vec_id"]): r["rank"]
        for r in knn_cosine_brute(
            small_embeddings, [q for q, _ in queries], k=10
        ).collect()
    }
    fused = hybrid_rrf_topk(
        small_docs, small_embeddings, queries, k=10, leg_k=10, text_col="content"
    )
    both = 0
    for r in fused.collect():
        key = (r["query_id"], r["doc_id"])
        expect = 0.0
        if key in lex:
            expect += 1.0 / (RRF_K + lex[key])
        if key in vec:
            expect += 1.0 / (RRF_K + vec[key])
        assert key in lex or key in vec
        assert r["score"] == round(expect, 6)
        both += key in lex and key in vec
    # the corpus/embedding pairing is random, so overlap is not guaranteed
    # per query — but the single-leg contributions above already cover the
    # sum algebra; this just documents the overlap count is well-defined
    assert both >= 0


def test_function_score_identity_factor_is_plain_bm25(spark, small_docs):
    queries = [(q, t) for q, t, _ in synth_queries(spark, 6).collect()]
    from mtix_spark.hybrid import _query_expansion

    exp = _query_expansion(spark, queries)
    base = _rows(expanded_bm25(small_docs, exp, k=10, text_col="content"))
    fs = _rows(
        function_score_topk(
            small_docs, queries, factor=F.lit(1.0), k=10, text_col="content"
        )
    )
    assert fs == base


def test_function_score_matches_pandas_recompute(spark, small_docs):
    # boost by a strongly doc-dependent factor and verify the top-k against
    # a pandas recompute over the FULL matched set — proving the boost is
    # applied before the cut, not after
    queries = [(q, t) for q, t, _ in synth_queries(spark, 6).collect()]
    from mtix_spark.hybrid import _query_expansion

    exp = _query_expansion(spark, queries)
    full = expanded_bm25(
        small_docs, exp, k=2**31 - 1, text_col="content"
    ).toPandas()
    factor = 1.0 / (1.0 + full["doc_id"].to_numpy().astype("float64"))
    # Spark's F.round is HALF_UP over the double's shortest decimal repr
    # (BigDecimal.valueOf) — np.round's half-to-even differs in the last
    # digit on exact .5 ties, so emulate Spark exactly
    from decimal import ROUND_HALF_UP, Decimal

    q6 = Decimal("0.000001")
    full["boosted"] = [
        float(Decimal(repr(v)).quantize(q6, rounding=ROUND_HALF_UP))
        for v in (full["score"].to_numpy() * factor)
    ]
    expect = []
    for qid, g in full.groupby("query_id"):
        g = g.sort_values(["boosted", "doc_id"], ascending=[False, True]).head(10)
        for rank, (_, row) in enumerate(g.iterrows(), 1):
            expect.append((qid, rank, int(row["doc_id"]), row["boosted"]))
    got = _rows(
        function_score_topk(
            small_docs,
            queries,
            factor=F.lit(1.0) / (F.lit(1.0) + F.col("doc_id")),
            k=10,
            text_col="content",
        )
    )
    assert got == sorted(expect)


def test_rrf_empty_runs_rejected():
    with pytest.raises(ValueError, match="at least one"):
        rrf_fuse([])
