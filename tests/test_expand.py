"""Wildcard / fuzzy expansion, LM-Dirichlet ranking, proximity search."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from mtix_spark.expand import (
    expand_fuzzy,
    expand_wildcard,
    fuzzy_search,
    search_expanded_index,
    wildcard_search,
    wildcard_to_like,
)
from mtix_spark.index.positions import near_match_relational


def _vocab(spark, words):
    return spark.createDataFrame([(w,) for w in words], "term string")


def test_wildcard_to_like():
    assert wildcard_to_like("pre*") == "pre%"
    assert wildcard_to_like("?at") == "_at"
    assert wildcard_to_like("a_b*") == r"a\_b%"


def test_expand_wildcard(spark):
    vocab = _vocab(spark, ["scan", "small", "slow", "table", "tab", "customer"])
    got = {
        (r["query_id"], r["term"])
        for r in expand_wildcard(
            vocab, [(1, "s*"), (2, "tab*"), (3, "?mall"), (4, "zz*")]
        ).collect()
    }
    assert got == {
        (1, "scan"), (1, "small"), (1, "slow"),
        (2, "table"), (2, "tab"),
        (3, "small"),
    }


def test_expand_fuzzy(spark):
    vocab = _vocab(spark, ["scan", "scans", "scant", "plan", "table", "tble"])
    got = {
        (r["query_id"], r["term"])
        for r in expand_fuzzy(vocab, [(1, "scan"), (2, "tble")], max_edits=1).collect()
    }
    # scan: itself + 1-insert neighbors; plan is 2 edits away
    assert got == {
        (1, "scan"), (1, "scans"), (1, "scant"),
        (2, "tble"), (2, "table"),
    }


def test_wildcard_search_equals_explicit_terms(spark):
    """A wildcard whose expansion is a known term set must score exactly as
    the same terms given explicitly (disjunctive BM25, per-term idf)."""
    from mtix_spark.expand import expanded_bm25

    docs = spark.createDataFrame(
        [
            (0, "scan the table fast"),
            (1, "slow scan of scan"),
            (2, "nothing here at all"),
            (3, "small slow"),
        ],
        "doc_id long, text string",
    )
    via_wild = wildcard_search(docs, [(1, "s*")], k=10).collect()
    explicit = spark.createDataFrame(
        [(1, t) for t in ["scan", "slow", "small"]], "query_id long, term string"
    )
    via_terms = expanded_bm25(docs, explicit, k=10).collect()
    key = lambda rows: sorted((r["rank"], r["doc_id"], round(r["score"], 6)) for r in rows)
    assert key(via_wild) == key(via_terms)
    assert len(via_wild) == 3  # doc 2 matches nothing


def test_fuzzy_search_hits_misspelling(spark):
    docs = spark.createDataFrame(
        [(0, "merge the batch"), (1, "purge the batch"), (2, "other words")],
        "doc_id long, text string",
    )
    out = fuzzy_search(docs, [(1, "merge")], max_edits=1, k=10).collect()
    assert {r["doc_id"] for r in out} == {0}  # purge is 2 edits away
    out2 = fuzzy_search(docs, [(1, "merge")], max_edits=2, k=10).collect()
    assert {r["doc_id"] for r in out2} == {0, 1}


def test_index_dictionary_expansion_matches_relational(spark, small_docs, small_index):
    """Physical path: expand a prefix against the INDEX dictionary, run the
    expanded terms through the MaxScore kernel — scores must equal the
    relational wildcard search over the same corpus (dense ids match:
    small_docs already carries the index's doc_ids)."""
    from mtix_spark.index.search import SegmentSearcher

    s = SegmentSearcher(spark, small_index, persist=False)
    exp = expand_wildcard(s.dictionary, [(7, "get*")]).collect()
    assert exp, "fixture vocabulary must contain get* terms"
    terms = sorted({r["term"] for r in exp})
    idx_res = search_expanded_index(s, [(7, terms)], k=30).collect()
    rel = wildcard_search(
        small_docs.select("doc_id", F.col("content").alias("text")),
        [(7, "get*")],
        k=30,
    ).collect()
    key = lambda rows: sorted(
        (r["query_id"], r["rank"], r["doc_id"], round(r["score"], 6)) for r in rows
    )
    assert key(idx_res) == key(rel)
    s.close()


def test_lm_dirichlet_ranks_by_likelihood(spark):
    from mtix_spark.index.search import lm_dirichlet_brute

    docs = [
        (0, ["apple"] * 4 + ["pear"] * 4),     # tf=4, dl=8
        (1, ["apple"] * 2 + ["plum"] * 2),     # tf=2, dl=4
        (2, ["plum"] * 8),                     # no match
    ]
    rows = [(d, t, toks.count(t)) for d, toks in docs for t in set(toks)]
    tf = spark.createDataFrame(rows, "doc_id long, term string, tf long")
    dl = spark.createDataFrame(
        [(d, float(len(toks))) for d, toks in docs], "doc_id long, dl double"
    )
    total = sum(len(toks) for _, toks in docs)
    q = spark.createDataFrame([(1, "apple")], "query_id long, text string")
    mu = 10.0
    out = {r["doc_id"]: r["score"] for r in lm_dirichlet_brute(tf, dl, q, total, mu=mu, k=10).collect()}
    assert set(out) == {0, 1}  # doc 2 never scores
    cf = 6 / total
    for d, tfv, dlv in [(0, 4, 8.0), (1, 2, 4.0)]:
        expect = math.log(1 + tfv / (mu * cf)) + math.log(mu / (dlv + mu))
        assert out[d] == pytest.approx(expect, abs=1e-6)


def test_more_like_this_excludes_source_and_selects_top_terms(spark):
    from mtix_spark.expand import more_like_this

    docs = spark.createDataFrame(
        [
            (0, "rare_a rare_a common common"),
            (1, "rare_a common other"),
            (2, "common common filler filler"),
            (3, "unrelated words only"),
        ],
        "doc_id long, text string",
    )
    out = more_like_this(docs, [0], m=1, k=10).collect()
    # top tf-idf term of doc 0 is rare_a (tf=2, df=2) over common (tf=2, df=3)
    got = {r["doc_id"] for r in out}
    assert 0 not in got  # source excluded
    assert got == {1}  # only doc 1 contains rare_a


def test_near_index_matches_relational(spark, small_docs, small_index):
    """Physical NEAR path (packed-position range counting over the
    positional index) row-identical to the relational twin, both orders."""
    from mtix_spark.index.positions import build_positions, near_topk

    build_positions(spark, small_docs, small_index)
    # pick two terms that co-occur: leading bigram of the first doc
    row = small_docs.select("content").first()
    import re

    toks = [t for t in re.split("[^a-z0-9_]+", row["content"].lower()) if t]
    ta, tb = toks[0], toks[1]
    for ordered in (False, True):
        idx = sorted(
            (r["query_id"], r["doc_id"], r["n_pairs"])
            for r in near_topk(
                spark, small_index, [(1, ta, tb, 3)], k=10**6, ordered=ordered
            ).collect()
        )
        rel = sorted(
            (1, r["doc_id"], r["n_pairs"])
            for r in near_match_relational(
                small_docs, ta, tb, 3, text_col="content", ordered=ordered
            ).collect()
        )
        assert idx == rel and idx


def test_near_match_windows_and_order(spark):
    docs = spark.createDataFrame(
        [
            (0, "hash x join"),        # distance 2
            (1, "join hash"),          # distance 1, b before a
            (2, "hash x y z join"),    # distance 4
            (3, "hash join hash"),     # pairs at distance 1 and 1
        ],
        "doc_id long, text string",
    )
    un = {
        (r["doc_id"], r["n_pairs"])
        for r in near_match_relational(docs, "hash", "join", 2, text_col="text").collect()
    }
    assert un == {(0, 1), (1, 1), (3, 2)}
    # ordered: only hash-before-join pairs count
    od = {
        (r["doc_id"], r["n_pairs"])
        for r in near_match_relational(
            docs, "hash", "join", 2, text_col="text", ordered=True
        ).collect()
    }
    assert od == {(0, 1), (3, 1)}


# ---------------------------------------------------------------------------
# regexp queries (RegexpQuery dictionary expansion + scoring rewrite)
# ---------------------------------------------------------------------------


def test_regexp_literal_prefix():
    from mtix_spark.expand import regexp_literal_prefix

    assert regexp_literal_prefix("sc.n") == "sc"
    assert regexp_literal_prefix("gro+up") == "gr"   # o is quantified
    assert regexp_literal_prefix("quer[xy]") == "quer"
    assert regexp_literal_prefix("abc") == "abc"
    assert regexp_literal_prefix(".*x") == ""
    assert regexp_literal_prefix("(hash|merge)") == ""
    # top-level alternation voids the prefix: "cd" doesn't start with "ab"
    assert regexp_literal_prefix("ab|cd") == ""
    assert regexp_literal_prefix("a(b|c)d") == "a"   # grouped alt is fine
    assert regexp_literal_prefix(r"ab[|]cd") == "ab"  # class '|' is literal


def test_expand_regexp(spark):
    from mtix_spark.expand import expand_regexp

    vocab = _vocab(spark, ["scan", "sort", "sorted", "group", "merge", "hash"])
    got = {
        (r["query_id"], r["term"])
        for r in expand_regexp(
            vocab,
            [(1, "s(can|ort)"), (2, "gro+up"), (3, "hash|merge"), (4, "zz.*")],
        ).collect()
    }
    # anchored full-match: "sorted" must NOT match s(can|ort);
    # q3's top-level alternation disables prefix pruning for the batch
    assert got == {
        (1, "scan"), (1, "sort"),
        (2, "group"),
        (3, "hash"), (3, "merge"),
    }


def test_regexp_search_equals_explicit_terms(spark):
    """A regexp whose expansion is a known term set must score exactly as
    the same terms given explicitly (disjunctive BM25, per-term idf)."""
    from mtix_spark.expand import expanded_bm25, regexp_search

    docs = spark.createDataFrame(
        [
            (0, "scan the table fast"),
            (1, "slow scan of sort"),
            (2, "nothing here at all"),
            (3, "sort sort"),
        ],
        "doc_id long, text string",
    )
    via_re = regexp_search(docs, [(1, "s(can|ort)")], k=10).collect()
    explicit = spark.createDataFrame(
        [(1, t) for t in ["scan", "sort"]], "query_id long, term string"
    )
    via_terms = expanded_bm25(docs, explicit, k=10).collect()
    key = lambda rows: sorted((r["rank"], r["doc_id"], round(r["score"], 6)) for r in rows)
    assert key(via_re) == key(via_terms)
    assert {r["doc_id"] for r in via_re} == {0, 1, 3}


# ---------------------------------------------------------------------------
# synonym queries (SynonymQuery blended-tf / max-df semantics)
# ---------------------------------------------------------------------------


def test_synonym_expansion_groups():
    from mtix_spark.expand import synonym_expansion

    rows = synonym_expansion(
        [(1, ["car", "road"]), (2, ["car", "auto"]), (3, ["bike"])],
        [["car", "auto"]],
    )
    # q1: car joins its group (both members), road is a singleton
    # q2: car and auto collapse to ONE group (scored once)
    # q3: untouched singleton
    assert rows == sorted(
        [
            (1, "auto", "auto"), (1, "auto", "car"), (1, "road", "road"),
            (2, "auto", "auto"), (2, "auto", "car"),
            (3, "bike", "bike"),
        ]
    )


def test_synonym_blended_scoring(spark):
    """Blending sums tf across members BEFORE saturation and takes the
    group idf from the MAX member df — a doc with car x2 and a doc with
    car+auto must score IDENTICALLY (closed-form checked)."""
    from mtix_spark.expand import synonym_search
    from mtix_spark.index.build import B, K1

    docs = spark.createDataFrame(
        [(1, "car car road"), (2, "car auto road"), (3, "road")],
        "doc_id long, text string",
    )
    out = synonym_search(docs, [(1, "car")], [["car", "auto"]], k=10)
    rows = {r["doc_id"]: r["score"] for r in out.collect()}
    n, df_blend, avgdl = 3, 2, (3 + 3 + 1) / 3  # df = max(df_car=2, df_auto=1)
    idf = math.log(1.0 + (n - df_blend + 0.5) / (df_blend + 0.5))
    gtf = 2.0  # both docs blend to tf 2
    want = round(idf * gtf * (K1 + 1) / (gtf + K1 * (1 - B + B * 3.0 / avgdl)), 6)
    assert rows == {1: want, 2: want}


def test_synonym_index_matches_relational(spark, small_docs, small_index):
    """Physical-index synonym path must be value-identical to the
    relational twin over the same corpus (ids already dense)."""
    from mtix_spark.expand import synonym_search, synonym_topk_index
    from mtix_spark.index.search import SegmentSearcher

    groups = [["hash_tree", "hash_wand"], ["save", "push"]]
    queries = [(1, "hash_tree save"), (2, "push index_merge")]
    rel = synonym_search(
        small_docs, queries, groups, k=20, id_col="doc_id", text_col="content"
    )
    s = SegmentSearcher(spark, small_index, persist=False)
    phys = synonym_topk_index(s, queries, groups, k=20)
    a = sorted(map(tuple, rel.collect()))
    b = sorted(map(tuple, phys.collect()))
    assert a == b and len(a) > 0


# ---------------------------------------------------------------------------
# spell suggestion (DirectSpellChecker ranking)
# ---------------------------------------------------------------------------


def test_suggest_ranking_semantics(spark):
    """Candidates rank by (distance ASC, df DESC, term ASC); the source
    term itself is never suggested even when it exists in the vocab."""
    from mtix_spark.expand import suggest_terms

    vocab = spark.createDataFrame(
        [("scan", 50), ("scans", 90), ("scant", 90), ("span", 10),
         ("plan", 70), ("scanner", 5)],
        "term string, df long",
    )
    got = [
        (r["suggestion"], r["distance"], r["rank"])
        for r in suggest_terms(vocab, [(1, "scan")], max_edits=2, top=4)
        .orderBy("rank")
        .collect()
    ]
    # dist1: scans/scant (df 90, term asc), span (df 10); dist2: scanner? no
    # — "scanner" is 3 edits; "plan" is 2 (s->p, c del? s-c-a-n vs p-l-a-n:
    # 2 subs). source "scan" itself excluded despite df 50.
    assert got == [
        ("scans", 1, 1), ("scant", 1, 2), ("span", 1, 3), ("plan", 2, 4)
    ]


def test_suggest_from_corpus_misspelling(spark):
    from mtix_spark.expand import suggest_from_corpus

    docs = spark.createDataFrame(
        [(0, "merge the batch"), (1, "merge merge purge"), (2, "other")],
        "doc_id long, text string",
    )
    out = suggest_from_corpus(docs, [(1, "merg")], max_edits=1, top=2).collect()
    # df is DOCUMENT frequency (merge df=2, not tf=3); purge is 2 edits
    assert [(r["suggestion"], r["df"], r["distance"]) for r in out] == [
        ("merge", 2, 1)
    ]


# ---------------------------------------------------------------------------
# LM-Dirichlet over the physical index
# ---------------------------------------------------------------------------


def test_lm_index_matches_brute_and_respects_deletes(spark, small_docs, tmp_path):
    """Physical LM path equals the relational decomposition over the same
    corpus; after a delete it must equal a FRESH build without the doc
    (LM collection stats exclude tombstoned tokens, unlike BM25's
    Lucene-stale df)."""
    from mtix_spark.index.build import build_index
    from mtix_spark.index.deletes import delete_docs
    from mtix_spark.index.search import lm_dirichlet_brute, lm_dirichlet_index

    idx = build_index(spark, small_docs, str(tmp_path / "lmidx"), n_segments=3)
    queries = [(1, "index_merge hash_tree"), (2, "save push")]

    def brute(docs):
        tf = (
            docs.select(
                "doc_id",
                F.explode(
                    F.split(F.lower(F.col("content")), "[^a-z0-9_]+")
                ).alias("term"),
            )
            .filter(F.col("term") != "")
            .groupBy("doc_id", "term")
            .agg(F.count(F.lit(1)).alias("tf"))
        )
        dl = tf.groupBy("doc_id").agg(F.sum("tf").cast("double").alias("dl"))
        total = int(dl.agg(F.sum("dl")).collect()[0][0])
        q = spark.createDataFrame(queries, "query_id long, text string")
        return sorted(
            map(tuple, lm_dirichlet_brute(tf, dl, q, total, k=20).collect())
        )

    got = sorted(map(tuple, lm_dirichlet_index(spark, idx, queries, k=20).collect()))
    assert got == brute(small_docs) and got

    victim = got[0][2]  # top doc of query 1
    delete_docs(spark, idx, [victim])
    after = sorted(map(tuple, lm_dirichlet_index(spark, idx, queries, k=20).collect()))
    assert after == brute(small_docs.filter(F.col("doc_id") != victim))
    assert all(r[2] != victim for r in after)
