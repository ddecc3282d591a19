"""minimum_should_match + doc-length function-score kernel tests.

The DuckDB twins live in __spark_entry__ (`min_match`, `min_match_index`,
`function_score_index`); these cover what the sf0.01 oracle can't force:
the count-aware / boost-aware RESTRICTED phase of the MaxScore kernel on
adversarial posting layouts (a brute recompute is the ground truth), and
rank identity between the relational and physical paths on a multi-segment
corpus at small k (where pruning actually fires).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from mtix_spark.corpus import synth_queries
from mtix_spark.expand import expanded_bm25
from mtix_spark.hybrid import _query_expansion
from mtix_spark.index.build import B, BLOCK_SIZE, K1
from mtix_spark.index.codec import delta_encode, encode_varint
from mtix_spark.index.search import SCORE_DECIMALS, SegmentSearcher, _maxscore_kernel


def _rows(df):
    return sorted(
        (r["query_id"], r["rank"], r["doc_id"], r["score"]) for r in df.collect()
    )


def _brute(terms_docs, idf, dl, avgdl, min_match=1, factor=None):
    """Dict-based BM25 recompute with count filter + optional dl boost."""
    acc, cnt = {}, {}
    for t, (ids, tfs) in terms_docs.items():
        for d, tf in zip(ids, tfs):
            w = idf[t] * tf * (K1 + 1.0) / (tf + K1 * (1.0 - B + B * dl[d] / avgdl))
            acc[d] = acc.get(d, 0.0) + w
            cnt[d] = cnt.get(d, 0) + 1
    out = []
    for d, s in acc.items():
        if cnt[d] < min_match:
            continue
        s = round(s, SCORE_DECIMALS)
        if factor is not None:
            s = round(s * factor(dl[d]), SCORE_DECIMALS)
        out.append((d, s))
    return sorted(out, key=lambda x: (-x[1], x[0]))


def _postings(terms_docs, wtf_hint):
    rows = []
    for t, (ids, tfs) in terms_docs.items():
        ids = np.asarray(ids, dtype=np.uint64)
        tfs = np.asarray(tfs, dtype=np.uint64)
        nb = (len(ids) + BLOCK_SIZE - 1) // BLOCK_SIZE
        rows.append(
            {
                "term": t,
                "doc_ids_bin": delta_encode(ids),
                "tfs_bin": encode_varint(tfs),
                "block_max_wtf": np.full(nb, wtf_hint[t], np.float32),
            }
        )
    return pd.DataFrame(rows)


def test_kernel_min_match_restricted_phase_exact():
    """One rare high-UB term + three common low-UB terms, m=2, small k: the
    rare-only docs score highest but NEVER qualify, and the restriction at
    the (remaining < m) boundary must not lose counts/scores of candidates
    admitted earlier — brute recompute is ground truth."""
    rng = np.random.default_rng(11)
    dl = np.full(4000, 50.0)
    avgdl = 50.0
    common = {}
    for i, t in enumerate(["c1", "c2", "c3"]):
        ids = np.sort(rng.choice(np.arange(100, 2100), 800, replace=False))
        common[t] = (ids, rng.integers(1, 4, 800))
    terms_docs = {"rare": (np.array([10, 20]), np.array([5, 5])), **common}
    idf = {"rare": 6.0, "c1": 0.4, "c2": 0.35, "c3": 0.3}
    # sound upper bounds: wtf <= tf*(k1+1)/(tf+k1*(1-b)) with tf→max
    wtf = {t: 2.2 for t in terms_docs}
    wtf["rare"] = 2.2
    out = _maxscore_kernel(
        _postings(terms_docs, wtf), dl, 0, 4000,
        [(1, sorted(terms_docs))], idf, avgdl, 5, min_match=2,
    )
    got = list(zip(out["doc_id"], out["score"]))
    exp = _brute(terms_docs, idf, dl, avgdl, min_match=2)[:5]
    assert [(int(d), round(s, SCORE_DECIMALS)) for d, s in got] == exp
    assert 10 not in out["doc_id"].values and 20 not in out["doc_id"].values


def test_kernel_dl_factor_reorders_and_matches_brute():
    """Boosted ranking must flip a short high-BM25 doc below a long lower-
    BM25 doc, with θ evaluated in boosted space — brute ground truth."""
    dl = np.zeros(100)
    dl[1], dl[2], dl[3] = 10.0, 400.0, 120.0
    avgdl = 100.0
    terms_docs = {
        "a": (np.array([1, 2]), np.array([4, 3])),
        "b": (np.array([2, 3]), np.array([2, 1])),
    }
    idf = {"a": 2.0, "b": 1.5}
    out = _maxscore_kernel(
        _postings(terms_docs, {"a": 2.2, "b": 2.2}), dl, 0, 100,
        [(1, ["a", "b"])], idf, avgdl, 3, dl_factor="log1p_dl",
    )
    got = [(int(d), s) for d, s in zip(out["doc_id"], out["score"])]
    exp = _brute(terms_docs, idf, dl, avgdl, factor=np.log1p)[:3]
    assert got == exp
    # the boost must actually change the order vs raw BM25
    raw = [d for d, _ in _brute(terms_docs, idf, dl, avgdl)]
    assert [d for d, _ in exp] != raw[:3]


def test_kernel_min_match_plus_factor_combo():
    rng = np.random.default_rng(3)
    n = 1000
    dl = rng.integers(20, 300, n).astype(np.float64)
    avgdl = float(dl.mean())
    terms_docs = {}
    for i, t in enumerate(["t1", "t2", "t3", "t4"]):
        m = 150 + 40 * i
        ids = np.sort(rng.choice(n, m, replace=False))
        terms_docs[t] = (ids, rng.integers(1, 5, m))
    idf = {"t1": 3.0, "t2": 1.2, "t3": 0.9, "t4": 0.5}
    out = _maxscore_kernel(
        _postings(terms_docs, {t: 8.0 for t in terms_docs}), dl, 0, n,
        [(1, sorted(terms_docs))], idf, avgdl, 7, min_match=3,
        dl_factor="log1p_dl",
    )
    got = [(int(d), s) for d, s in zip(out["doc_id"], out["score"])]
    exp = _brute(terms_docs, idf, dl, avgdl, min_match=3, factor=np.log1p)[:7]
    assert got == exp


@pytest.mark.parametrize("m", [2, 3])
def test_min_match_index_vs_relational(spark, small_docs, small_index, m):
    """Physical-index msm must be rank-identical to the relational HAVING
    twin across a query batch at small k (pruning fires on 6 segments)."""
    queries = [(q, t) for q, t, _ in synth_queries(spark, 15).collect()]
    exp = _query_expansion(spark, queries)
    rel = expanded_bm25(small_docs, exp, k=5, text_col="content", min_match=m)
    idx = SegmentSearcher(spark, small_index, persist=False).search(
        queries, k=5, min_match=m
    )
    assert _rows(rel) == _rows(idx)
    assert rel.count() > 0


def test_min_match_filters_single_term_docs(spark, small_docs):
    """m=2 must drop every doc matching exactly one query term, and the
    survivors' match counts must be >= 2 (recomputed from tf)."""
    queries = [(q, t) for q, t, _ in synth_queries(spark, 6).collect()]
    exp = _query_expansion(spark, queries)
    m1 = expanded_bm25(small_docs, exp, k=2**31 - 1, text_col="content")
    m2 = expanded_bm25(
        small_docs, exp, k=2**31 - 1, text_col="content", min_match=2
    )
    from pyspark.sql import functions as F

    from mtix_spark.functions.text import tokenize

    tf = (
        small_docs.select(
            F.col("doc_id"), F.explode(tokenize(F.col("content"))).alias("term")
        )
        .distinct()
        .join(F.broadcast(exp), "term")
        .groupBy("query_id", "doc_id")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    counts = {(r["query_id"], r["doc_id"]): r["n"] for r in tf.collect()}
    kept = {(r["query_id"], r["doc_id"]) for r in m2.collect()}
    full = {(r["query_id"], r["doc_id"]) for r in m1.collect()}
    assert kept == {k for k in full if counts[k] >= 2}
    assert kept != full  # the filter must actually bite on this corpus


def test_function_score_index_vs_relational_dl_boost(spark, small_docs, small_index):
    """Index boost path vs relational recompute: round(round(bm25,6) *
    ln(1+dl), 6) ranked boosted — both sides on the same dense ids."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from mtix_spark.functions.text import tokenize

    queries = [(q, t) for q, t, _ in synth_queries(spark, 12).collect()]
    exp = _query_expansion(spark, queries)
    base = expanded_bm25(small_docs, exp, k=2**31 - 1, text_col="content")
    dl = small_docs.select(
        "doc_id", F.size(tokenize(F.col("content"))).cast("double").alias("dl")
    )
    boosted = base.join(dl, "doc_id").select(
        "query_id",
        "doc_id",
        F.round(F.col("score") * F.log(F.lit(1.0) + F.col("dl")), 6).alias("score"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_id"))
    rel = (
        boosted.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 5)
        .select("query_id", "rank", "doc_id", "score")
    )
    idx = SegmentSearcher(spark, small_index, persist=False).search(
        queries, k=5, dl_factor="log1p_dl"
    )
    assert _rows(rel) == _rows(idx)
    assert rel.count() > 0


def test_search_warm_matches_search_msm_and_boost(spark, small_docs, small_index):
    """The warm serving path must stay row-identical to the distributed
    path under the new DSL modes (same kernel, driver-side)."""
    queries = [(q, t) for q, t, _ in synth_queries(spark, 10).collect()]
    queries += [(900, "zz_oov_zz"), (901, "")]
    s = SegmentSearcher(spark, small_index, persist=False)
    for kw in ({"min_match": 2}, {"dl_factor": "log1p_dl"},
               {"min_match": 2, "dl_factor": "log1p_dl"}):
        a = _rows(s.search(queries, k=15, **kw))
        b = sorted(
            (int(r.query_id), int(r.rank), int(r.doc_id), round(r.score, 6))
            for r in s.search_warm(queries, k=15, **kw).itertuples()
        )
        assert a == b, kw
        assert a  # modes must produce rows on this corpus


def test_dsl_parameter_validation(spark, small_index):
    s = SegmentSearcher(spark, small_index, persist=False)
    with pytest.raises(ValueError, match="unknown dl_factor"):
        s.search([(1, "a")], k=5, dl_factor="nope")
    with pytest.raises(ValueError, match="unknown dl_factor"):
        s.search_warm([(1, "a")], k=5, dl_factor="nope")
    with pytest.raises(ValueError, match="min_match"):
        s.search([(1, "a")], k=5, min_match=0)


def test_search_topk_matches_search_msm_and_boost(spark, small_index):
    """The latency path (driver merge) must also stay row-identical to the
    distributed path under the DSL modes."""
    queries = [(q, t) for q, t, _ in synth_queries(spark, 8).collect()]
    s = SegmentSearcher(spark, small_index, persist=False)
    for kw in ({"min_match": 2}, {"dl_factor": "log1p_dl"}):
        a = _rows(s.search(queries, k=12, **kw))
        b = sorted(
            (int(r.query_id), int(r.rank), int(r.doc_id), round(r.score, 6))
            for r in s.search_topk(queries, k=12, **kw).itertuples()
        )
        assert a == b and a, kw


def test_search_topk_dis_max_matches_distributed_path(spark, small_index):
    """search_topk's dis_max_tie switch (added so latency probes measure
    one execution shape across all DSL modes) must stay row-identical to
    search_dis_max, and reject mode combinations like the kernels do."""
    queries = [(q, t) for q, t, _ in synth_queries(spark, 8).collect()]
    s = SegmentSearcher(spark, small_index, persist=False)
    a = _rows(s.search_dis_max(queries, k=12, tie_breaker=0.3))
    b = sorted(
        (int(r.query_id), int(r.rank), int(r.doc_id), round(r.score, 6))
        for r in s.search_topk(queries, k=12, dis_max_tie=0.3).itertuples()
    )
    assert a == b and a
    with pytest.raises(ValueError, match="cannot combine"):
        s.search_topk(queries, k=12, dis_max_tie=0.3, min_match=2)
    with pytest.raises(ValueError, match="dis_max_tie must be"):
        s.search_topk(queries, k=12, dis_max_tie=1.5)


def test_merged_searcher_msm_and_boost_matches_segment_path(
    spark, small_docs, small_index
):
    """The merged-list serving path (exhaustive accumulation) must agree
    row-for-row with the segment MaxScore path under both DSL modes —
    the pruned and unpruned engines share one answer."""
    from mtix_spark.index.build import merge_postings
    from mtix_spark.index.search import MergedSearcher

    merge_postings(spark, small_index, hot_df=50, n_salt=4)
    queries = [(q, t) for q, t, _ in synth_queries(spark, 10).collect()]
    seg = SegmentSearcher(spark, small_index, persist=False)
    ms = MergedSearcher(spark, small_index)
    for kw in ({"min_match": 2}, {"dl_factor": "log1p_dl"},
               {"min_match": 2, "dl_factor": "log1p_dl"}):
        a = _rows(seg.search(queries, k=12, **kw))
        b = sorted(
            (int(r.query_id), int(r.rank), int(r.doc_id), round(r.score, 6))
            for r in ms.search(queries, k=12, **kw).itertuples()
        )
        assert a == b and a, kw
    with pytest.raises(ValueError, match="unknown dl_factor"):
        ms.search(queries, dl_factor="nope")
