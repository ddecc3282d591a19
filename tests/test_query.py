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
