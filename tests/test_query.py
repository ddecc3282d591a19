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


# ---------------------------------------------------------------------------
# search API completions: ranges, counts, explain, pagination
# ---------------------------------------------------------------------------


def test_expand_term_range_bounds(spark):
    from mtix_spark.expand import expand_term_range

    vocab = spark.createDataFrame(
        [(t,) for t in ["apple", "batch", "cat", "dog", "emu"]], "term string"
    )
    got = {
        (r["query_id"], r["term"])
        for r in expand_term_range(
            vocab,
            [
                (1, "batch", "dog", True, True),    # closed
                (2, "batch", "dog", False, False),  # open both
                (3, None, "batch", True, True),     # open low
                (4, "dog", None, False, True),      # open high, excl
                (5, "x", "z", True, True),          # empty slice
            ],
        ).collect()
    }
    assert got == {
        (1, "batch"), (1, "cat"), (1, "dog"),
        (2, "cat"),
        (3, "apple"), (3, "batch"),
        (4, "emu"),
    }


def test_total_hits_modes(spark):
    from mtix_spark.query import total_hits

    docs = spark.createDataFrame(
        [
            (0, "hash join fast"),
            (1, "hash hash"),
            (2, "join only"),
            (3, "nothing else"),
        ],
        "doc_id long, text string",
    )
    qs = [(1, "hash join"), (2, "nothing"), (3, "zz_absent")]
    dis = {r["query_id"]: r["n_hits"] for r in total_hits(docs, qs).collect()}
    assert dis == {1: 3, 2: 1, 3: 0}  # zero-hit query still gets a row
    con = {
        r["query_id"]: r["n_hits"]
        for r in total_hits(docs, qs, conjunctive=True).collect()
    }
    assert con == {1: 1, 2: 1, 3: 0}  # only doc 0 has BOTH hash and join


def test_explain_contribs_sum_to_score(spark):
    from mtix_spark.index.search import SCORE_DECIMALS
    from mtix_spark.query import bm25_explain
    from mtix_spark.expand import expanded_bm25

    docs = spark.createDataFrame(
        [
            (0, "hash join fast join"),
            (1, "hash table"),
            (2, "join join join"),
            (3, "other words"),
        ],
        "doc_id long, text string",
    )
    qs = [(1, "hash join")]
    exp = bm25_explain(docs, qs, k=10).collect()
    # reconstruct scores from the decomposition
    by_doc = {}
    for r in exp:
        by_doc[r["doc_id"]] = by_doc.get(r["doc_id"], 0.0) + r["contrib"]
    q = spark.createDataFrame([(1, "hash"), (1, "join")], "query_id long, term string")
    ranked = {
        r["doc_id"]: r["score"] for r in expanded_bm25(docs, q, k=10).collect()
    }
    assert set(by_doc) == set(ranked)
    for d, s in ranked.items():
        assert abs(round(by_doc[d], SCORE_DECIMALS) - s) < 2e-6  # 6dp rounding slack
    # per-row invariant: contrib == idf * tf_norm at 6dp
    for r in exp:
        assert abs(r["contrib"] - round(r["idf"] * r["tf_norm"], 6)) < 2e-6


def test_search_after_pages_partition_deep_ranking(spark):
    from mtix_spark.query import bm25_search_after

    rows = [(i, "alpha beta" if i % 2 else "alpha") for i in range(12)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    qs = [(1, "alpha beta")]
    deep = bm25_search_after(docs, qs, after={}, k=12).collect()
    page1 = bm25_search_after(docs, qs, after={}, k=4).collect()
    cur = next((float(r["score"]), int(r["doc_id"])) for r in page1 if r["rank"] == 4)
    page2 = bm25_search_after(docs, qs, after={1: cur}, k=4).collect()
    got = [(r["doc_id"], r["score"]) for r in page1] + [
        (r["doc_id"], r["score"]) for r in page2
    ]
    want = [(r["doc_id"], r["score"]) for r in deep][:8]
    # identical docs tie on score — the cursor must split the tie group
    # exactly where the deep ranking does (doc_id tiebreak)
    assert got == want


def test_total_hits_index_respects_deletes(spark, small_docs, tmp_path):
    """Physical count collector equals the relational counts, and after a
    tombstone it equals a fresh build without the doc."""
    from mtix_spark.index.build import build_index
    from mtix_spark.index.deletes import delete_docs
    from mtix_spark.index.search import total_hits_index
    from mtix_spark.query import total_hits

    idx = build_index(spark, small_docs, str(tmp_path / "thidx"), n_segments=3)
    qs = [(1, "index_merge hash_tree"), (2, "zz_absent")]
    rel = {
        r["query_id"]: r["n_hits"]
        for r in total_hits(small_docs, qs, text_col="content").collect()
    }
    phys = {
        r["query_id"]: r["n_hits"]
        for r in total_hits_index(spark, idx, qs).collect()
    }
    assert phys == rel and rel[1] > 0 and rel[2] == 0

    victim = (
        small_docs.select("doc_id").orderBy("doc_id").first()["doc_id"]
    )
    delete_docs(spark, idx, [victim])
    after = {
        r["query_id"]: r["n_hits"]
        for r in total_hits_index(spark, idx, qs).collect()
    }
    fresh = {
        r["query_id"]: r["n_hits"]
        for r in total_hits(
            small_docs.filter(F.col("doc_id") != victim), qs, text_col="content"
        ).collect()
    }
    assert after == fresh


def test_grouped_bm25_collapse_semantics(spark):
    """Groups rank by their best hit; k_per_group=1 is field collapse;
    a group past n_groups disappears entirely."""
    from mtix_spark.query import grouped_bm25

    docs = spark.createDataFrame(
        [
            (0, "apple apple", "a"),   # strongest in group a
            (1, "apple", "a"),
            (2, "apple apple apple", "b"),  # strongest overall
            (3, "apple", "c"),
            (4, "other", "d"),         # no match -> group d absent
        ],
        "doc_id long, text string, lang string",
    )
    out = grouped_bm25(
        docs, [(1, "apple")], "lang", n_groups=2, k_per_group=1
    ).collect()
    got = {(r["group"], r["grank"], r["rank"], r["doc_id"]) for r in out}
    # b's best (doc 2, tf=3) beats a's best (doc 0, tf=2 but shorter dl?):
    # verify group order purely from the returned granks
    by_grank = {r["grank"]: r["group"] for r in out}
    assert set(by_grank.values()) <= {"a", "b"}  # c (weakest) cut, d absent
    assert all(r["rank"] == 1 for r in out)  # collapse: one doc per group
    assert len(out) == 2


def test_sloppy_phrase_clause(spark):
    """`"a b"~k` parses to a slop clause and filters by ordered span."""
    from mtix_spark.query import boolean_search, parse_query

    bq = parse_query('"hash join"~2 -"slow scan"~1 value')
    assert bq.slop_phrases == [(["hash", "join"], 2)]
    assert bq.not_slop_phrases == [(["slow", "scan"], 1)]
    assert "hash" in bq.scoring_terms and "slow" not in bq.scoring_terms

    docs = spark.createDataFrame(
        [
            (0, "hash x join value"),       # span gap 1 <= 2 -> kept
            (1, "hash a b c join value"),   # gap 3 -> dropped
            (2, "join hash value"),         # wrong order -> dropped
            (3, "hash join slow y scan"),   # span ok BUT slow..scan gap 1
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"] for r in boolean_search(docs, '"hash join"~2 value', k=10).collect()}
    assert got == {0, 3}
    got2 = {
        r["doc_id"]
        for r in boolean_search(docs, '"hash join"~2 -"slow scan"~1 value', k=10).collect()
    }
    assert got2 == {0}  # doc 3 excluded by the negated sloppy phrase
