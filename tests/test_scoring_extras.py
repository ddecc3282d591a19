"""dis_max / rescore / significant_terms algebra tests.

Oracle twins live in __spark_entry__ (`dis_max`, `rescore`,
`significant_terms`); these cover the properties a value-hash can't
express: the tie_breaker limits (0 = pure best-clause, 1 = disjunctive
sum), the window-confinement of rescoring (a doc outside the first-pass
window must never surface, whatever its rescored value), and the JLH
arithmetic against a pandas recompute.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from mtix_spark.corpus import synth_queries
from mtix_spark.expand import dis_max_topk, expanded_bm25, rescore_topk
from mtix_spark.functions.text import significant_terms, tokenize
from mtix_spark.hybrid import _query_expansion


def _rows(df):
    return sorted(
        (r["query_id"], r["rank"], r["doc_id"], r["score"]) for r in df.collect()
    )


@pytest.fixture(scope="module")
def queries(spark):
    return [(q, t) for q, t, _ in synth_queries(spark, 8).collect()]


def test_dis_max_tie_breaker_one_is_disjunctive_sum(spark, small_docs, queries):
    exp = _query_expansion(spark, queries)
    base = _rows(expanded_bm25(small_docs, exp, k=10, text_col="content"))
    dm = _rows(
        dis_max_topk(small_docs, queries, tie_breaker=1.0, k=10, text_col="content")
    )
    assert dm == base


def test_dis_max_zero_is_best_clause_only(spark, small_docs, queries):
    """tie_breaker=0 must equal max over per-term contributions — recompute
    from single-term runs of expanded_bm25 (each term scored alone)."""
    per_term = {}
    for qid, text in queries:
        terms = sorted({t for t in text.lower().split() if t})
        for t in terms:
            exp = spark.createDataFrame([(qid, t)], "query_id long, term string")
            one = expanded_bm25(
                small_docs, exp, k=2**31 - 1, text_col="content"
            )
            for r in one.collect():
                key = (qid, r["doc_id"])
                per_term[key] = max(per_term.get(key, 0.0), r["score"])
    expect = []
    bykey = {}
    for (qid, d), s in per_term.items():
        bykey.setdefault(qid, []).append((d, round(s, 6)))
    for qid, lst in bykey.items():
        lst.sort(key=lambda x: (-x[1], x[0]))
        for rank, (d, s) in enumerate(lst[:10], 1):
            expect.append((qid, rank, d, s))
    got = _rows(dis_max_topk(small_docs, queries, tie_breaker=0.0, k=10, text_col="content"))
    assert got == sorted(expect)


def test_rescore_stays_inside_first_pass_window(spark, small_docs, queries):
    """Every rescored doc must come from the BM25 top-`window` of its query
    — the whole point of the pattern (the expensive scorer never sees the
    rest of the corpus)."""
    window = 15
    exp = _query_expansion(spark, queries)
    first = {
        (r["query_id"], r["doc_id"])
        for r in expanded_bm25(
            small_docs, exp, k=window, text_col="content"
        ).collect()
    }
    out = rescore_topk(
        small_docs, queries, window=window, k=10, text_col="content"
    )
    got = [(r["query_id"], r["doc_id"]) for r in out.collect()]
    assert got and all(key in first for key in got)


def test_rescore_weights_recompute(spark, small_docs, queries):
    """final = round(0.6*bm25 + 0.4*lm, 6) over the window, re-ranked —
    pandas recompute from the two single-scorer runs."""
    from mtix_spark.index.search import lm_dirichlet_brute

    window, k = 12, 5
    exp = _query_expansion(spark, queries)
    bm = expanded_bm25(small_docs, exp, k=window, text_col="content").toPandas()
    tf = (
        small_docs.select("doc_id", F.explode(tokenize(F.col("content"))).alias("term"))
        .groupBy("term", "doc_id")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dl = small_docs.select("doc_id", F.size(tokenize(F.col("content"))).alias("dl"))
    total = dl.agg(F.sum(F.col("dl").cast("double"))).collect()[0][0]
    qdf = spark.createDataFrame(queries, "query_id long, text string")
    lm = lm_dirichlet_brute(tf, dl, qdf, total, k=2**31 - 1).toPandas()
    merged = bm.merge(
        lm[["query_id", "doc_id", "score"]].rename(columns={"score": "lm"}),
        on=["query_id", "doc_id"],
    )
    merged["final"] = np.round(0.6 * merged["score"] + 0.4 * merged["lm"], 6)
    expect = []
    for qid, g in merged.groupby("query_id"):
        g = g.sort_values(["final", "doc_id"], ascending=[False, True]).head(k)
        for rank, (_, row) in enumerate(g.iterrows(), 1):
            expect.append((qid, rank, int(row["doc_id"]), row["final"]))
    got = _rows(
        rescore_topk(
            small_docs, queries, window=window, query_weight=0.6,
            rescore_weight=0.4, k=k, text_col="content",
        )
    )
    assert got == sorted(expect)


def test_significant_terms_matches_pandas_jlh(spark, small_docs):
    """JLH scores, the min_fg_df gate, and the fg>bg filter against a
    pandas recompute over the full doc-term incidence."""
    fg_term = "index_merge"
    pdf = small_docs.select(
        "doc_id", F.array_distinct(tokenize(F.col("content"))).alias("toks")
    ).toPandas()
    rows = [(r.doc_id, t) for r in pdf.itertuples() for t in r.toks]
    dt = pd.DataFrame(rows, columns=["doc_id", "term"])
    fg_docs = set(dt[dt["term"] == fg_term]["doc_id"])
    n_fg, n_docs = len(fg_docs), len(pdf)
    assert n_fg >= 5, "fixture must have a real foreground"
    g = dt.groupby("term")["doc_id"]
    stats = pd.DataFrame(
        {
            "df_bg": g.size(),
            "df_fg": g.apply(lambda s: int(s.isin(fg_docs).sum())),
        }
    ).reset_index()
    stats["fg_pct"] = stats["df_fg"] / n_fg
    stats["bg_pct"] = stats["df_bg"] / n_docs
    stats = stats[(stats["df_fg"] >= 3) & (stats["fg_pct"] > stats["bg_pct"])]
    stats["score"] = np.round(
        (stats["fg_pct"] - stats["bg_pct"]) * (stats["fg_pct"] / stats["bg_pct"]), 6
    )
    stats = stats.sort_values(["score", "term"], ascending=[False, True]).head(10)
    expect = sorted(
        (r.term, int(r.df_fg), int(r.df_bg), r.score) for r in stats.itertuples()
    )
    out = significant_terms(
        small_docs,
        "content",
        F.array_contains(tokenize(F.col("content")), fg_term),
        k=10,
        min_fg_df=3,
    )
    got = sorted(
        (r["term"], r["df_fg"], r["df_bg"], r["score"]) for r in out.collect()
    )
    assert got == expect
    # the foreground term itself is maximally overrepresented -> rank 1
    top = out.orderBy(F.desc("score"), F.asc("term")).first()
    assert top["term"] == fg_term


def test_dismax_kernel_restricted_phase_vs_brute():
    """Adversarial layout for the max-aware bound: one huge-UB clause and
    several mid clauses whose SUM beats the max clause only when tie is
    high — brute recompute is ground truth at both tie extremes and 0.3."""
    from mtix_spark.index.build import B as B_, BLOCK_SIZE, K1 as K1_
    from mtix_spark.index.codec import delta_encode, encode_varint
    from mtix_spark.index.search import SCORE_DECIMALS, _dismax_kernel

    rng = np.random.default_rng(21)
    n = 3000
    dl = np.full(n, 80.0)
    avgdl = 80.0
    terms_docs = {"big": (np.sort(rng.choice(n, 40, replace=False)), rng.integers(3, 6, 40))}
    for t in ["m1", "m2", "m3", "m4"]:
        ids = np.sort(rng.choice(n, 600, replace=False))
        terms_docs[t] = (ids, rng.integers(1, 4, 600))
    idf = {"big": 5.0, "m1": 1.1, "m2": 1.0, "m3": 0.9, "m4": 0.8}

    def brute(tie):
        acc, mx = {}, {}
        for t, (ids, tfs) in terms_docs.items():
            for d, tf in zip(ids, tfs):
                w = idf[t] * tf * (K1_ + 1.0) / (
                    tf + K1_ * (1.0 - B_ + B_ * dl[d] / avgdl)
                )
                acc[d] = acc.get(d, 0.0) + w
                mx[d] = max(mx.get(d, 0.0), w)
        out = [
            (d, round(mx[d] + tie * (acc[d] - mx[d]), SCORE_DECIMALS)) for d in acc
        ]
        return sorted(out, key=lambda x: (-x[1], x[0]))

    rows = []
    for t, (ids, tfs) in terms_docs.items():
        nb = (len(ids) + BLOCK_SIZE - 1) // BLOCK_SIZE
        rows.append(
            {
                "term": t,
                "doc_ids_bin": delta_encode(np.asarray(ids, dtype=np.uint64)),
                "tfs_bin": encode_varint(np.asarray(tfs, dtype=np.uint64)),
                "block_max_wtf": np.full(nb, 8.0, np.float32),
            }
        )
    postings = pd.DataFrame(rows)
    for tie in (0.0, 0.3, 1.0):
        out = _dismax_kernel(
            postings, dl, 0, n, [(1, sorted(terms_docs))], idf, avgdl, 8, tie
        )
        got = [(int(d), s) for d, s in zip(out["doc_id"], out["score"])]
        assert got == brute(tie)[:8], f"tie={tie}"


def test_dis_max_index_vs_relational(spark, small_docs, small_index, queries):
    from mtix_spark.index.search import SegmentSearcher

    rel = dis_max_topk(
        small_docs, queries, tie_breaker=0.3, k=8, text_col="content"
    )
    idx = SegmentSearcher(spark, small_index, persist=False).search_dis_max(
        queries, k=8, tie_breaker=0.3
    )
    assert _rows(rel) == _rows(idx)
    assert rel.count() > 0
    with pytest.raises(ValueError, match="tie_breaker"):
        SegmentSearcher(spark, small_index, persist=False).search_dis_max(
            queries, tie_breaker=1.5
        )


def test_multi_match_modes_and_recompute(spark, small_docs):
    """best_fields(tie=1) ≡ most_fields; most_fields equals the pandas sum
    of the per-field expanded-BM25 legs (rounded per leg, re-rounded)."""
    from mtix_spark.expand import multi_match_topk

    queries = [(1, "index_merge hash_tree"), (2, "save push query12")]
    fields = ["content", "lang"]
    bf1 = _rows(
        multi_match_topk(
            small_docs, fields, queries, mode="best_fields", tie_breaker=1.0, k=10
        )
    )
    mf = _rows(
        multi_match_topk(small_docs, fields, queries, mode="most_fields", k=10)
    )
    assert bf1 == mf and mf
    exp = _query_expansion(spark, queries)
    legs = [
        expanded_bm25(small_docs, exp, k=2**31 - 1, text_col=f).toPandas()
        for f in fields
    ]
    comb = (
        pd.concat(legs)[["query_id", "doc_id", "score"]]
        .groupby(["query_id", "doc_id"], as_index=False)
        .agg(s=("score", "sum"), m=("score", "max"))
    )
    comb["best"] = np.round(comb["m"] + 0.3 * (comb["s"] - comb["m"]), 6)
    comb["most"] = np.round(comb["s"], 6)
    for mode, col in (("best_fields", "best"), ("most_fields", "most")):
        expect = []
        for qid, g in comb.groupby("query_id"):
            g = g.sort_values([col, "doc_id"], ascending=[False, True]).head(10)
            for rank, (_, row) in enumerate(g.iterrows(), 1):
                expect.append((qid, rank, int(row["doc_id"]), row[col]))
        got = _rows(
            multi_match_topk(
                small_docs, fields, queries, mode=mode, tie_breaker=0.3, k=10
            )
        )
        assert got == sorted(expect), mode


def test_multi_match_validation(spark, small_docs):
    from mtix_spark.expand import multi_match_topk

    with pytest.raises(ValueError, match="mode"):
        multi_match_topk(small_docs, ["content"], [(1, "a")], mode="x")
    with pytest.raises(ValueError, match="tie_breaker"):
        multi_match_topk(small_docs, ["content"], [(1, "a")], tie_breaker=2.0)
    with pytest.raises(ValueError, match="at least one field"):
        multi_match_topk(small_docs, [], [(1, "a")])
