from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from mtix_spark.functions.text import TOKEN_SPLIT_RE
from mtix_spark.percolate import (
    StoredQuery,
    percolate,
    percolate_stream,
    queries_df,
)

def _specs_for(docs, spark):
    """Build the spec set from the corpus's OWN vocabulary (the synthetic
    code corpus tokenizes to composed identifiers, so hardcoded stems would
    never match): top-frequency terms for the modes, a real adjacent bigram
    for the phrase."""
    from mtix_spark.functions.text import tokenize

    top = [
        r.term
        for r in docs.select(F.explode(tokenize("text")).alias("term"))
        .groupBy("term")
        .count()
        .orderBy(F.desc("count"), "term")
        .limit(8)
        .collect()
    ]
    t = top  # t[0] most frequent
    [first] = docs.orderBy("doc_id").limit(1).select(
        tokenize("text").alias("toks")
    ).collect()
    bigram = f"{first.toks[0]} {first.toks[1]}"
    return [
        StoredQuery(1, "all", [t[0], t[1]]),
        StoredQuery(2, "any", ["zz_absent_zz", t[2]]),
        StoredQuery(3, "min", [t[0], t[1], t[2], t[3]], min_match=2),
        StoredQuery(4, "all", [t[4]], must_not=[t[5]]),
        StoredQuery(5, "phrase", phrase=bigram),
        StoredQuery(6, "any", [t[6]], must_not=[t[7]]),
    ]


def _expected(docs_rows, specs):
    """Pure-python reference matcher over (doc_id, token-list) rows."""
    out = set()
    for doc_id, toks in docs_rows:
        tokset = set(toks)
        stream = " " + " ".join(toks) + " "
        for s in specs:
            if s.mode == "phrase":
                ptoks = [t for t in re.split(TOKEN_SPLIT_RE, s.phrase.lower()) if t]
                pos = set(ptoks)
                ok = " " + " ".join(ptoks) + " " in stream
            else:
                pos = {t for raw in s.terms for t in re.split(TOKEN_SPLIT_RE, raw.lower()) if t}
                n = len(pos & tokset)
                need = 1 if s.mode == "any" else (s.min_match if s.mode == "min" else len(pos))
                ok = n >= need
            neg = {t for raw in s.must_not for t in re.split(TOKEN_SPLIT_RE, raw.lower()) if t}
            if ok and not (neg & tokset):
                out.add((s.query_id, doc_id))
    return out


@pytest.fixture(scope="module")
def corpus_docs(spark, small_docs):
    return small_docs.select("doc_id", F.col("content").alias("text")).cache()


@pytest.fixture(scope="module")
def specs(spark, corpus_docs):
    return _specs_for(corpus_docs, spark)


def test_percolate_matches_python_reference(spark, corpus_docs, specs):
    from mtix_spark.functions.text import tokenize

    rows = [
        (r.doc_id, r.toks)
        for r in corpus_docs.select("doc_id", tokenize("text").alias("toks")).collect()
    ]
    expected = _expected(rows, specs)
    got = {
        (r.query_id, r.doc_id)
        for r in percolate(corpus_docs, queries_df(spark, specs)).collect()
    }
    assert got == expected
    assert expected, "corpus must produce at least one match for the test to bite"


def test_n_matched_counts_distinct_positive_terms(spark):
    docs = spark.createDataFrame(
        [(1, "merge merge split split scan")], "doc_id long, text string"
    )
    qs = queries_df(
        spark, [StoredQuery(1, "min", ["merge", "split", "scan", "sort"], min_match=3)]
    )
    [r] = percolate(docs, qs).collect()
    assert r.n_matched == 3  # distinct terms, not occurrences


def test_broadcast_and_shuffle_plans_agree(spark, corpus_docs, specs):
    qs = queries_df(spark, specs)
    a = {(r.query_id, r.doc_id, r.n_matched)
         for r in percolate(corpus_docs, qs, broadcast_queries=True).collect()}
    b = {(r.query_id, r.doc_id, r.n_matched)
         for r in percolate(corpus_docs, qs, broadcast_queries=False).collect()}
    assert a == b


def test_phrase_requires_adjacency_and_order(spark):
    docs = spark.createDataFrame(
        [
            (1, "get set go"),          # adjacent, in order
            (2, "get the set"),         # gap
            (3, "set get"),             # wrong order
            (4, "reset getset"),        # substring of other tokens, not tokens
        ],
        "doc_id long, text string",
    )
    qs = queries_df(spark, [StoredQuery(9, "phrase", phrase="Get, SET")])
    got = {r.doc_id for r in percolate(docs, qs).collect()}
    assert got == {1}


def test_must_not_excludes_in_every_mode(spark):
    docs = spark.createDataFrame(
        [(1, "batch node"), (2, "batch clean")], "doc_id long, text string"
    )
    qs = queries_df(spark, [StoredQuery(6, "any", ["batch"], must_not=["node", "tree"])])
    got = {r.doc_id for r in percolate(docs, qs).collect()}
    assert got == {2}


@pytest.mark.parametrize(
    "bad",
    [
        StoredQuery(1, "bool", ["x"]),                      # unknown mode
        StoredQuery(1, "all", [" ,. "]),                    # empty after analysis
        StoredQuery(1, "phrase"),                           # phrase mode, no phrase
        StoredQuery(1, "all", ["x"], must_not=["x"]),       # overlap
        StoredQuery(1, "min", ["x", "y"], min_match=3),     # min_match > |terms|
    ],
)
def test_queries_df_validation(spark, bad):
    with pytest.raises(ValueError):
        queries_df(spark, [bad])


def test_plan_broadcasts_queries_never_shuffles_corpus_on_terms(spark, corpus_docs, specs):
    """The scale contract: the query-term relation ships broadcast and the
    only hash exchange is the output-bounded (doc_id, query_id) aggregation
    — the corpus never shuffle-joins on term."""
    out = percolate(corpus_docs, queries_df(spark, specs))
    plan = out._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("simple")
    )
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan
    # every hash exchange must be keyed by the match aggregation, not term
    import re

    for args in re.findall(r"Exchange hashpartitioning\(([^)]*)\)", plan):
        assert "term" not in args, f"corpus shuffled on term: {args}"


def test_stream_matches_batch(spark, corpus_docs, specs, tmp_path):
    """foreachBatch streaming percolation routes identically to batch."""
    src = str(tmp_path / "src")
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")
    corpus_docs.repartition(3).write.parquet(src)

    qs = queries_df(spark, specs)
    stream = spark.readStream.schema("doc_id long, text string").option(
        "maxFilesPerTrigger", 1
    ).parquet(src)
    q = percolate_stream(stream, qs, sink, ckpt)
    q.awaitTermination(300)

    batch = {(r.query_id, r.doc_id, r.n_matched)
             for r in percolate(corpus_docs, qs).collect()}
    streamed = {
        (r.query_id, r.doc_id, r.n_matched)
        for r in spark.read.parquet(sink).collect()
    }
    assert streamed == batch
    assert batch
