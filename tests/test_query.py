"""Boolean query language: parser + execution semantics."""

from __future__ import annotations

from pyspark.sql import functions as F

from mtix_spark.query import boolean_search, parse_query


def test_parse_query_clauses():
    bq = parse_query('hash +join -slow "table scan" -"bad phrase" C++ -x.y')
    assert bq.should == ["hash", "c"]          # c++ tokenizes to 'c'
    assert bq.must == ["join"]
    assert bq.must_not == ["slow", "x", "y"]   # prefix applies to each split
    assert bq.phrases == [["table", "scan"]]
    assert bq.not_phrases == [["bad", "phrase"]]
    assert bq.scoring_terms == ["c", "hash", "join", "scan", "table"]
    # degenerate inputs
    assert parse_query("").scoring_terms == []
    assert parse_query('""  - +').scoring_terms == []


def test_boolean_search_semantics(spark):
    docs = spark.createDataFrame(
        [
            (0, "alpha beta gamma"),
            (1, "alpha beta slow"),
            (2, "beta gamma alpha beta"),
            (3, "gamma delta"),
            (4, "alpha gamma beta-gamma"),
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"] for r in boolean_search(docs, "alpha +beta -slow").collect()}
    assert got == {0, 2, 4}  # must beta, not slow
    got = {r["doc_id"] for r in boolean_search(docs, 'alpha "beta gamma"').collect()}
    assert got == {0, 2, 4}  # phrase filter (4 matches via beta-gamma tokens)
    got = {r["doc_id"] for r in boolean_search(docs, 'alpha -"beta gamma"').collect()}
    assert got == {1}
    assert boolean_search(docs, "-alpha").count() == 0  # nothing to score
    assert boolean_search(docs, "zz_oov").count() == 0
    # ranking: doc 2 has tf(beta)=2 → ranks above single-tf docs for 'beta'
    top = boolean_search(docs, "beta", k=1).collect()[0]
    assert top["doc_id"] == 2


def test_metadata_filters(spark):
    from mtix_spark.query import parse_query

    bq = parse_query("alpha lang:en -source:web +beta")
    assert bq.filters == [("lang", "en", False), ("source", "web", True)]
    assert bq.should == ["alpha"] and bq.must == ["beta"]

    docs = spark.createDataFrame(
        [
            (0, "alpha beta", "en"),
            (1, "alpha beta", "de"),
            (2, "alpha", "en"),
        ],
        "doc_id long, text string, lang string",
    )
    from mtix_spark.query import boolean_search

    got = {r["doc_id"] for r in boolean_search(docs, "alpha lang:en").collect()}
    assert got == {0, 2}
    got_rows = {
        r["doc_id"]: r["score"]
        for r in boolean_search(docs, "alpha lang:en").collect()
    }
    # filter must not change scores: same doc scores identically unfiltered
    all_rows = {
        r["doc_id"]: r["score"] for r in boolean_search(docs, "alpha").collect()
    }
    for d, s in got_rows.items():
        assert s == all_rows[d]
    got = {r["doc_id"] for r in boolean_search(docs, "alpha -lang:en").collect()}
    assert got == {1}


def test_boolean_index_matches_relational(spark, small_docs, small_index):
    """Index-backed boolean execution row-identical to the relational path
    on the shared fixture corpus (dense ids align — no remap needed)."""
    import re

    from mtix_spark.index.positions import build_positions
    from mtix_spark.query import boolean_search, boolean_search_index

    build_positions(spark, small_docs, small_index)
    rows = small_docs.select("content").take(2)
    toks = [t for t in re.split("[^a-z0-9_]+", rows[0]["content"].lower()) if t]
    t0, t1, t2 = toks[0], toks[1], toks[2]
    rel_docs = small_docs.select("doc_id", F.col("content").alias("text"), "lang")
    queries = [
        f"{t0} +{t1} -{t2}",
        f'"{t0} {t1}" {t2}',
        f"{t0} -\"{t1} {t2}\"",
        f"{t0} {t1} lang:en",
        f"{t0} -lang:en +{t1}",
        f"{t0}^3 +{t1}^0.5 {t2}",
    ]
    for q in queries:
        rel = sorted(
            (r["rank"], r["doc_id"], round(r["score"], 6))
            for r in boolean_search(rel_docs, q, k=25).collect()
        )
        idx = sorted(
            (r["rank"], r["doc_id"], round(r["score"], 6))
            for r in boolean_search_index(spark, small_index, q, k=25).collect()
        )
        assert idx == rel, q
    assert rel  # the last query matched something


def test_boost_parsing_and_scoring(spark):
    from mtix_spark.query import boolean_search, parse_query

    bq = parse_query("alpha^2 +beta^0.5 -gamma^3 delta")
    assert bq.boosts == {"alpha": 2.0, "beta": 0.5}
    assert bq.must == ["beta"] and bq.must_not == ["gamma"]

    docs = spark.createDataFrame(
        [(0, "alpha beta"), (1, "beta beta"), (2, "alpha alpha")],
        "doc_id long, text string",
    )
    plain = {r["doc_id"]: r["score"] for r in boolean_search(docs, "alpha beta").collect()}
    boosted = {
        r["doc_id"]: r["score"]
        for r in boolean_search(docs, "alpha^2 beta").collect()
    }
    # doc 2 (alpha only) doubles; doc 1 (beta only) unchanged
    assert boosted[2] == round(2 * plain[2], 6)
    assert boosted[1] == plain[1]
