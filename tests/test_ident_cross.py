"""Round-5 batch-2 operators: the code-identifier analyzer, multi_match
cross_fields blending, per-doc term vectors, and gauss-decay function
scoring. Each relational path is driver-oracled against DuckDB; these tests
pin the SEMANTICS on hand-built cases (the oracle only proves Spark and SQL
agree — a shared misreading of e.g. Lucene's blending would pass it)."""

from __future__ import annotations

import math
import re

import pytest
from pyspark.sql import functions as F

from mtix_spark.functions.text import (
    IDENT_TOK_SQL_DUCKDB,
    ident_tokenize,
    ident_tokenize_py,
    tokenize_py,
)
from mtix_spark.index.build import B, K1

IDENT_CASES = [
    ("getHTTPServerV2_name.fooBar", ["get", "http", "server", "v2", "name", "foo", "bar"]),
    ("MAX_SCORE", ["max", "score"]),
    ("max_score", ["max", "score"]),
    ("maxScore", ["max", "score"]),
    ("utf8Name", ["utf8", "name"]),
    ("plain", ["plain"]),
    ("XMLHttpRequest", ["xml", "http", "request"]),
    ("a.b.c", ["a", "b", "c"]),
    ("", []),
    ("___", []),
]


def test_ident_tokenize_py_cases():
    for s, want in IDENT_CASES:
        assert ident_tokenize_py(s) == want, s


def test_ident_tokenize_spark_matches_python_twin(spark):
    df = spark.createDataFrame(
        [(i, s) for i, (s, _) in enumerate(IDENT_CASES)], "i long, s string"
    )
    got = {
        r["i"]: list(r["toks"])
        for r in df.select("i", ident_tokenize(F.col("s")).alias("toks")).collect()
    }
    for i, (s, want) in enumerate(IDENT_CASES):
        assert got[i] == want, s


def test_ident_tokenize_duckdb_mirror_matches():
    """The adjacent SQL mirror (IDENT_TOK_SQL_DUCKDB) must produce the same
    token stream — it is what the driver oracle runs."""
    duckdb = pytest.importorskip("duckdb")

    expr = IDENT_TOK_SQL_DUCKDB.format(col="s")
    con = duckdb.connect()
    for s, want in IDENT_CASES:
        got = con.execute(
            f"SELECT {expr} AS t FROM (SELECT ?::VARCHAR AS s)", [s]
        ).fetchone()[0]
        assert list(got) == want, s


def test_ident_normalize_composes_with_standard_tokenizer(spark):
    """tokenize(ident_normalize(c)) must equal ident_tokenize(c) — this
    identity is what lets the UNCHANGED index build kernel produce an
    identifier-analyzed physical index (q_ident_index)."""
    from mtix_spark.functions.text import ident_normalize, tokenize

    cases = [s for s, _ in IDENT_CASES] + [
        "a_b__c", "snake_then CamelCase mix.0f __X__", "UPPER lower_9Z",
    ]
    df = spark.createDataFrame([(i, s) for i, s in enumerate(cases)], "i long, s string")
    rows = df.select(
        "i",
        tokenize(ident_normalize(F.col("s"))).alias("composed"),
        ident_tokenize(F.col("s")).alias("direct"),
    ).collect()
    for r in rows:
        assert list(r["composed"]) == list(r["direct"]), cases[r["i"]]


def test_ident_analyzer_search_unifies_styles(spark):
    """A camelCase query must hit snake_case / SCREAMING / dotted docs —
    the analyzer plumbs through expanded_bm25 via tokenizer=."""
    from mtix_spark.expand import expanded_bm25

    docs = spark.createDataFrame(
        [
            (0, "computeMaxScore(self)"),
            (1, "MAX_SCORE = 10"),
            (2, "obj.max.score"),
            (3, "minimum value only"),
        ],
        "doc_id long, code string",
    )
    exp = spark.createDataFrame(
        [(1, t) for t in sorted(set(ident_tokenize_py("maxScore")))],
        "query_id long, term string",
    )
    out = expanded_bm25(docs, exp, k=10, text_col="code", tokenizer=ident_tokenize)
    hit_docs = {r["doc_id"] for r in out.collect()}
    assert hit_docs == {0, 1, 2}


def _cross_expected(rows, fields, queries, tie):
    """Pure-python reference for cross_fields blending (see
    expand._multi_match_cross): blended df = max_f df_f(t); idf from the
    corpus N; field-local tf saturation; per-term dis_max over fields; sum
    over terms; round(6)."""
    n = len(rows)
    tok = {
        f: {r["doc_id"]: tokenize_py(r[f]) for r in rows} for f in fields
    }
    tf = {
        f: {
            (d, t): ts.count(t)
            for d, ts in tok[f].items()
            for t in set(ts)
        }
        for f in fields
    }
    dl = {f: {d: float(len(ts)) for d, ts in tok[f].items()} for f in fields}
    avgdl = {f: sum(dl[f].values()) / n for f in fields}
    out = {}
    for qid, text in queries:
        terms = sorted({t for t in re.split("[^a-z0-9_]+", text.lower()) if t})
        scores = {}
        for t in terms:
            dfb = max(
                sum(1 for (d, tt) in tf[f] if tt == t) for f in fields
            )
            if dfb == 0:
                continue
            idf = math.log(1.0 + (n - dfb + 0.5) / (dfb + 0.5))
            for d in {r["doc_id"] for r in rows}:
                s_fields = []
                for f in fields:
                    x = tf[f].get((d, t))
                    if x is None:
                        continue
                    s_fields.append(
                        idf * (x * (K1 + 1.0))
                        / (x + K1 * (1.0 - B + B * dl[f][d] / avgdl[f]))
                    )
                if s_fields:
                    c = max(s_fields) + tie * (sum(s_fields) - max(s_fields))
                    scores[d] = scores.get(d, 0.0) + c
        for d, s in scores.items():
            out[(qid, d)] = round(s, 6)
    return out


def test_multi_match_cross_fields_blending(spark):
    """Hand-checkable blending: 'sprocket' is rare in text (df=1) but common
    in source (df=3) — cross_fields must use the BLENDED df=3 for BOTH
    fields' contributions (best_fields would score the text hit with the
    rare per-field idf and rank doc 0 far higher)."""
    from mtix_spark.expand import multi_match_topk

    rows = [
        {"doc_id": 0, "text": "sprocket widget", "source": "alpha"},
        {"doc_id": 1, "text": "widget widget", "source": "sprocket beta"},
        {"doc_id": 2, "text": "other words", "source": "sprocket gamma"},
        {"doc_id": 3, "text": "unrelated", "source": "sprocket delta"},
        {"doc_id": 4, "text": "padding text here", "source": "nothing"},
    ]
    docs = spark.createDataFrame(
        [(r["doc_id"], r["text"], r["source"]) for r in rows],
        "doc_id long, text string, source string",
    )
    queries = [(1, "sprocket widget"), (2, "alpha sprocket")]
    got = {
        (r["query_id"], r["doc_id"]): r["score"]
        for r in multi_match_topk(
            docs, ["text", "source"], queries, mode="cross_fields",
            tie_breaker=0.3, k=10,
        ).collect()
    }
    want = _cross_expected(rows, ["text", "source"], queries, tie=0.3)
    assert set(got) == set(want)
    for key, s in want.items():
        assert got[key] == pytest.approx(s, abs=2e-6), key


def test_multi_match_mode_validation(spark):
    from mtix_spark.expand import multi_match_topk

    docs = spark.createDataFrame([(0, "a", "b")], "doc_id long, text string, source string")
    with pytest.raises(ValueError, match="cross_fields"):
        multi_match_topk(docs, ["text"], [(1, "a")], mode="worst_fields")


def test_term_vectors_tf_and_corpus_df(spark):
    from mtix_spark.expand import term_vectors

    docs = spark.createDataFrame(
        [
            (0, "apple apple pear"),
            (1, "apple kiwi"),
            (2, "pear kiwi kiwi"),
            (3, "apple pear"),
        ],
        "doc_id long, text string",
    )
    got = {
        (r["doc_id"], r["term"]): (r["tf"], r["df"])
        for r in term_vectors(docs, [0, 2]).collect()
    }
    # df is CORPUS-wide (includes docs outside the request)
    assert got == {
        (0, "apple"): (2, 3),
        (0, "pear"): (1, 3),
        (2, "pear"): (1, 3),
        (2, "kiwi"): (2, 2),
    }


def test_knn_filtered_is_filter_then_topk(spark):
    """Filtered kNN must restrict candidates BEFORE ranking: the nearest
    neighbor overall is excluded by the filter, and the filtered top-k is
    the full-depth ranking of the allowed set — not a post-filter of the
    unfiltered top-k (which would drop rows instead of refilling)."""
    from mtix_spark.similarity import knn_cosine_brute

    def vec(*xs):
        return [float(x) for x in xs] + [0.0] * 61

    rows = [
        (0, vec(1, 0, 0), 0),   # query
        (1, vec(1, 0.01, 0), 0),  # nearest overall — filtered OUT
        (2, vec(1, 0.2, 0), 1),
        (3, vec(1, 0.5, 0), 1),
        (4, vec(0, 1, 0), 1),
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    got = [
        (r["rank"], r["vec_id"])
        for r in knn_cosine_brute(
            emb, [0], k=2, corpus_filter=F.col("label") == 1
        ).orderBy("rank").collect()
    ]
    assert got == [(1, 2), (2, 3)]
    # unfiltered: vec 1 leads
    un = knn_cosine_brute(emb, [0], k=1).collect()
    assert un[0]["vec_id"] == 1


def test_completion_popularity_ranking(spark):
    """Prefix autocomplete: df DESC then term ASC, top cap, the exact term
    completes itself, OOV prefix yields nothing."""
    from mtix_spark.expand import complete_from_corpus

    docs = spark.createDataFrame(
        [
            (0, "apple apricot"),
            (1, "apple apex"),
            (2, "apple apex"),
            (3, "apex"),
        ],
        "doc_id long, text string",
    )
    got = [
        (r["query_id"], r["rank"], r["completion"], r["df"])
        for r in complete_from_corpus(
            docs, [(1, "ap"), (2, "apple"), (3, "zz")], top=2
        ).orderBy("query_id", "rank").collect()
    ]
    # df: apple=3, apex=3, apricot=1 -> tie apple/apex breaks term ASC;
    # top=2 drops apricot
    assert got == [
        (1, 1, "apex", 3),
        (1, 2, "apple", 3),
        (2, 1, "apple", 3),
    ]


def test_gauss_decay_is_identity_at_origin(spark):
    """factor(origin) = 1, so at n_chars == origin the function-scored
    ranking equals plain BM25; off-origin the factor is strictly < 1 and
    halves exactly at origin ± scale (the ES decay contract)."""
    from mtix_spark.expand import expanded_bm25, function_score_topk

    origin, scale, decay = 250.0, 200.0, 0.5
    factor = F.exp(
        F.lit(math.log(decay))
        * F.pow((F.col("n_chars") - F.lit(origin)) / F.lit(scale), F.lit(2.0))
    )
    docs = spark.createDataFrame(
        [(i, f"apple pear doc{i}", 250) for i in range(4)],
        "doc_id long, text string, n_chars long",
    )
    queries = [(1, "apple pear")]
    exp = spark.createDataFrame(
        [(1, "apple"), (1, "pear")], "query_id long, term string"
    )
    plain = {
        (r["query_id"], r["doc_id"]): r["score"]
        for r in expanded_bm25(docs, exp, k=10).collect()
    }
    boosted = {
        (r["query_id"], r["doc_id"]): r["score"]
        for r in function_score_topk(docs, queries, factor=factor, k=10).collect()
    }
    assert plain == boosted
    # at origin + scale the factor is exactly `decay`
    docs2 = docs.withColumn("n_chars", F.lit(450).cast("long"))
    half = {
        (r["query_id"], r["doc_id"]): r["score"]
        for r in function_score_topk(docs2, queries, factor=factor, k=10).collect()
    }
    for key, s in plain.items():
        assert half[key] == pytest.approx(round(s * decay, 6), abs=2e-6)
