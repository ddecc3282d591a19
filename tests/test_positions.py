"""Positional index + phrase search tests: the physical index path must
agree with the Catalyst relational twin (which the driver value-checks
against DuckDB) on hand-built edge cases and on the synthetic corpus."""

from __future__ import annotations

import shutil

import pandas as pd
import pytest
from pyspark.sql import functions as F

from mtix_spark.index.build import assign_doc_ids, build_index, read_manifest
from mtix_spark.index.positions import (
    build_positions,
    build_tf_positions,
    phrase_match_relational,
    phrase_topk,
)

EDGE_DOCS = [
    # (repo, path, commit, lang, content)
    ("r", "a", "0", "py", "alpha beta gamma alpha beta"),        # phrase x2
    ("r", "b", "0", "py", "alpha alpha alpha"),                  # overlap runs
    ("r", "c", "0", "py", "beta. ALPHA-beta?? gamma"),           # punct/case
    ("r", "d", "0", "py", "gamma alpha"),                        # reversed
    ("r", "e", "0", "py", ""),                                   # empty doc
    ("r", "f", "0", "py", "alpha beta gamma delta epsilon"),     # long phrase
]


@pytest.fixture(scope="module")
def edge_index(spark, tmp_path_factory):
    docs = assign_doc_ids(
        spark.createDataFrame(
            EDGE_DOCS, "repo string, path string, commit string, lang string, content string"
        ),
        4,
    )
    out = str(tmp_path_factory.mktemp("pidx") / "index")
    shutil.rmtree(out, ignore_errors=True)
    paths = build_index(spark, docs, out, n_segments=3)
    build_positions(spark, docs, paths)
    return docs, paths


def _idx(spark, paths, phrases, k=10_000):
    return (
        phrase_topk(spark, paths, phrases, k=k)
        .toPandas()
        .sort_values(["query_id", "doc_id"])
        .reset_index(drop=True)
        .astype("int64")
    )


def _rel(docs, phrases):
    outs = []
    for qid, ph in phrases:
        if not any(c.isalnum() or c == "_" for c in ph):
            continue
        p = phrase_match_relational(docs, ph).toPandas()
        p["query_id"] = qid
        outs.append(p[["query_id", "doc_id", "n_occ"]])
    if not outs:
        return pd.DataFrame({"query_id": [], "doc_id": [], "n_occ": []}).astype("int64")
    return (
        pd.concat(outs)
        .sort_values(["query_id", "doc_id"])
        .reset_index(drop=True)
        .astype("int64")
    )


def test_phrase_edge_cases(spark, edge_index):
    docs, paths = edge_index
    phrases = [
        (1, "alpha beta"),          # 2 in doc a, 1 in c (case/punct), 1 in f
        (2, "alpha alpha"),         # overlapping: 2 occurrences in doc b
        (3, "alpha beta gamma"),    # trigram
        (4, "alpha beta gamma delta epsilon"),  # 5-gram, only doc f
        (5, "gamma alpha"),         # order sensitivity
        (6, "nope_zzz beta"),       # OOV first term
        (7, "beta nope_zzz"),       # OOV last term
    ]
    idx = _idx(spark, paths, phrases)
    rel = _rel(docs, phrases)
    assert idx.equals(rel), f"\nindex:\n{idx}\nrel:\n{rel}"
    # spot-assert absolute semantics (not just twin agreement)
    by = {(r.query_id, r.doc_id): r.n_occ for r in idx.itertuples()}
    a = docs.filter(F.col("path") == "a").first()["doc_id"]
    b = docs.filter(F.col("path") == "b").first()["doc_id"]
    assert by[(1, a)] == 2
    assert by[(2, b)] == 2  # overlapping occurrences both count
    assert (3, a) in by and by[(3, a)] == 1


def test_phrase_empty_inputs(spark, edge_index):
    _, paths = edge_index
    assert phrase_topk(spark, paths, [(1, ""), (2, "  .. ")], k=5).count() == 0
    assert phrase_topk(spark, paths, [], k=5).count() == 0


def test_phrase_topk_limit_and_order(spark, edge_index):
    docs, paths = edge_index
    out = phrase_topk(spark, paths, [(1, "alpha beta")], k=1).toPandas()
    # top-1 by (n_occ DESC, doc_id ASC): doc a with 2 occurrences
    a = docs.filter(F.col("path") == "a").first()["doc_id"]
    assert len(out) == 1 and out["doc_id"].iloc[0] == a and out["n_occ"].iloc[0] == 2


def test_phrase_on_synth_corpus(spark, small_docs, small_index):
    """Index path == relational twin on the 1000-doc synthetic corpus,
    positional segments aligned with the existing tf segments."""
    build_positions(spark, small_docs, small_index)
    # derive phrases that actually occur: take two docs' leading bigrams
    rows = small_docs.select("content").take(3)
    import re

    phrases = []
    for i, r in enumerate(rows):
        toks = [t for t in re.split("[^a-z0-9_]+", r["content"].lower()) if t]
        phrases.append((i + 1, " ".join(toks[:2])))
        phrases.append((100 + i, " ".join(toks[:3])))
    idx = _idx(spark, small_index, phrases)
    rel = _rel(small_docs, phrases)
    assert len(idx) > 0
    assert idx.equals(rel)


def test_build_positions_resume_skips(spark, edge_index):
    docs, paths = edge_index
    man = read_manifest(paths)
    assert set(man["positions_segments"]) == {int(s) for s in man["segments"]}
    # second call is a no-op (all segments done) and must not error
    build_positions(spark, docs, paths)


def test_tf_positions_parallelism_invariant(spark):
    """(term, doc_id, positions) is a pure function of the data — identical
    at different input partitionings."""
    docs = assign_doc_ids(
        spark.createDataFrame(
            EDGE_DOCS, "repo string, path string, commit string, lang string, content string"
        ),
        4,
    )
    a = build_tf_positions(docs.repartition(1)).toPandas()
    b = build_tf_positions(docs.repartition(7)).toPandas()
    key = lambda d: d.assign(positions=d["positions"].map(tuple)).sort_values(
        ["term", "doc_id"]
    ).reset_index(drop=True)
    pd.testing.assert_frame_equal(key(a), key(b))


def test_phrase_snippets(spark, edge_index):
    from mtix_spark.index.positions import phrase_snippets

    docs, _ = edge_index
    out = {
        r["doc_id"]: r
        for r in phrase_snippets(docs, "alpha beta", window=1).collect()
    }
    a = docs.filter(F.col("path") == "a").first()["doc_id"]
    c = docs.filter(F.col("path") == "c").first()["doc_id"]
    # doc a: "alpha beta gamma alpha beta" → first occurrence at 0, clamped
    assert out[a]["n_occ"] == 2 and out[a]["first_pos"] == 0
    assert out[a]["snippet"] == "alpha beta gamma"
    # doc c: "beta. ALPHA-beta?? gamma" → tokens [beta, alpha, beta, gamma]
    assert out[c]["first_pos"] == 1
    assert out[c]["snippet"] == "beta alpha beta gamma"


def test_contaminated_docs(spark):
    from mtix_spark.dedup import contaminated_docs

    docs = spark.createDataFrame(
        [
            (0, "the quick brown fox jumps over the lazy dog"),
            (1, "a quick brown fox appears"),        # shares "quick brown fox"
            (2, "completely unrelated text here"),
            (3, "the quick brown fox jumps high"),   # shares 2 distinct 3-grams
        ],
        "doc_id long, text string",
    )
    probes = spark.createDataFrame(
        [(100, "quick brown fox jumps")], "probe_id long, text string"
    )
    got = {
        (r["doc_id"], r["probe_id"]): r["n_shared"]
        for r in contaminated_docs(docs, probes, n=3).collect()
    }
    assert got == {(0, 100): 2, (1, 100): 1, (3, 100): 2}


# ---------------------------------------------------------------------------
# SpanNear (ordered n-term proximity with slop)
# ---------------------------------------------------------------------------


def test_span_near_semantics(spark):
    from mtix_spark.index.positions import span_near_relational

    docs = spark.createDataFrame(
        [
            (0, "a b c"),          # chain gap 0
            (1, "a x b y c"),      # chain gap 2
            (2, "a c b"),          # out of order: b after a exists, but c
                                   # after that b? no -> dead chain
            (3, "a b a b c"),      # two anchors: p1=0 chain b@1,c@4 gap 2;
                                   #              p1=2 chain b@3,c@4 gap 0
            (4, "c b a"),          # nothing after a
        ],
        "doc_id long, text string",
    )
    got = lambda s: {
        (r["doc_id"], r["n_spans"])
        for r in span_near_relational(docs, ["a", "b", "c"], s, text_col="text").collect()
    }
    assert got(0) == {(0, 1), (3, 1)}          # only gap-0 chains
    assert got(2) == {(0, 1), (1, 1), (3, 2)}  # both doc-3 anchors now pass
    # two-term and single-term degenerate forms
    two = {
        (r["doc_id"], r["n_spans"])
        for r in span_near_relational(docs, ["a", "b"], 0, text_col="text").collect()
    }
    assert two == {(0, 1), (3, 2)}  # adjacency only: doc1 has gap 1
    one = {
        (r["doc_id"], r["n_spans"])
        for r in span_near_relational(docs, ["a"], 0, text_col="text").collect()
    }
    assert one == {(0, 1), (1, 1), (2, 1), (3, 2), (4, 1)}  # anchors = tf


def test_span_near_duplicate_terms(spark):
    from mtix_spark.index.positions import span_near_relational

    docs = spark.createDataFrame(
        [(0, "go go go"), (1, "go stop go")], "doc_id long, text string"
    )
    got = {
        (r["doc_id"], r["n_spans"])
        for r in span_near_relational(docs, ["go", "go"], 0, text_col="text").collect()
    }
    assert got == {(0, 2)}  # strictly-after chain; doc1 gap is 1 > slop 0
    got2 = {
        (r["doc_id"], r["n_spans"])
        for r in span_near_relational(docs, ["go", "go"], 1, text_col="text").collect()
    }
    assert got2 == {(0, 2), (1, 1)}


def test_span_near_index_matches_relational(spark, small_docs, small_index):
    from mtix_spark.index.positions import (
        build_positions,
        span_near_relational,
        span_near_topk,
    )
    import re

    build_positions(spark, small_docs, small_index)
    row = small_docs.select("content").first()
    toks = [t for t in re.split("[^a-z0-9_]+", row["content"].lower()) if t]
    qs = [(1, toks[:3], 4), (2, toks[:2], 1), (3, [toks[0], "zz_absent"], 5)]
    idx = sorted(
        (r["query_id"], r["doc_id"], r["n_spans"])
        for r in span_near_topk(spark, small_index, qs, k=10**6).collect()
    )
    rel = []
    for qid, terms, slop in qs:
        rel += [
            (qid, r["doc_id"], r["n_spans"])
            for r in span_near_relational(
                small_docs, terms, slop, text_col="content"
            ).collect()
        ]
    assert idx == sorted(rel) and idx


def test_positional_query_raises_on_positionless_segments(spark, small_docs, tmp_path):
    """A phrase/NEAR/span query on an index whose tf segments lack
    positions must raise (Lucene IllegalStateException parity), never
    silently drop those segments' docs."""
    import pytest

    from mtix_spark.index.build import build_index
    from mtix_spark.index.positions import near_topk, phrase_topk, span_near_topk

    idx = build_index(spark, small_docs, str(tmp_path / "nopos"), n_segments=3)
    with pytest.raises(ValueError, match="lacking positions"):
        phrase_topk(spark, idx, [(1, "a b")], k=5).collect()
    with pytest.raises(ValueError, match="lacking positions"):
        near_topk(spark, idx, [(1, "a", "b", 2)], k=5).collect()
    with pytest.raises(ValueError, match="lacking positions"):
        span_near_topk(spark, idx, [(1, ["a", "b"], 2)], k=5).collect()


def test_phrase_prefix_relational_semantics(spark):
    """match_phrase_prefix: exact chain on the head tokens, the last token
    expands to the first max_expansions vocabulary terms (LEXICOGRAPHIC
    order — the cap must bite deterministically), one count per anchor."""
    from mtix_spark.index.positions import phrase_prefix_relational

    docs = spark.createDataFrame(
        [
            (0, "alpha beta gamma"),
            (1, "alpha betty"),
            (2, "alpha beast alpha beta"),
            (3, "beta alpha"),
            (4, "alphabet beta"),
        ],
        "doc_id long, text string",
    )
    # vocab prefix 'be' -> beast, beta, betty; cap 2 keeps {beast, beta}:
    # doc1's "alpha betty" must NOT match (betty is past the cap), and
    # doc4's "alphabet beta" must not match (head token is exact)
    got = {
        (r["doc_id"], r["n_occ"])
        for r in phrase_prefix_relational(
            docs, "alpha be", max_expansions=2, text_col="text"
        ).collect()
    }
    assert got == {(0, 1), (2, 2)}
    # cap 3 admits betty
    got3 = {
        (r["doc_id"], r["n_occ"])
        for r in phrase_prefix_relational(
            docs, "alpha be", max_expansions=3, text_col="text"
        ).collect()
    }
    assert got3 == {(0, 1), (1, 1), (2, 2)}
    # single-token prefix = capped prefix query counting occurrences
    got1 = {
        (r["doc_id"], r["n_occ"])
        for r in phrase_prefix_relational(
            docs, "be", max_expansions=2, text_col="text"
        ).collect()
    }
    assert got1 == {(0, 1), (2, 2), (3, 1), (4, 1)}
    # OOV prefix -> empty
    assert (
        phrase_prefix_relational(docs, "alpha zzz", max_expansions=2, text_col="text").count()
        == 0
    )


def test_phrase_prefix_index_matches_relational(spark, small_docs, small_index):
    """Index path (dictionary expansion + positional kernel) must agree
    row-for-row with the relational twin on the synthetic corpus."""
    import re

    from mtix_spark.index.positions import (
        build_positions,
        phrase_prefix_relational,
        phrase_prefix_topk,
    )

    build_positions(spark, small_docs, small_index)
    row = small_docs.select("content").first()
    toks = [t for t in re.split("[^a-z0-9_]+", row["content"].lower()) if t]
    qs = [
        (1, f"{toks[0]} {toks[1][:2]}"),   # 2-token, prefix tail
        (2, toks[0][:3]),                   # single prefix token
        (3, f"{toks[0]} zz_absent"),        # OOV tail -> empty
    ]
    idx = sorted(
        (r["query_id"], r["doc_id"], r["n_occ"])
        for r in phrase_prefix_topk(
            spark, small_index, qs, max_expansions=5, k=2**31 - 1
        ).collect()
    )
    rel = []
    for qid, ph in qs:
        rel += [
            (qid, r["doc_id"], r["n_occ"])
            for r in phrase_prefix_relational(
                small_docs, ph, max_expansions=5, text_col="content"
            ).collect()
        ]
    assert idx == sorted(rel) and idx


def test_term_snippets_picks_densest_window(spark):
    from mtix_spark.index.positions import term_snippets

    docs = spark.createDataFrame(
        [
            # densest window of "apple pear" terms starts at pos 5
            (0, "apple x y z w apple pear apple q r"),
            (1, "nothing relevant here"),
        ],
        "doc_id long, text string",
    )
    out = term_snippets(
        docs, [(1, "apple pear")], k=5, window=4, text_col="text"
    ).collect()
    rows = {r["doc_id"]: r for r in out}
    assert set(rows) == {0}
    r = rows[0]
    assert r["best_pos"] == 5 and r["n_in_window"] == 3
    assert r["snippet"] == "apple pear apple q"


def test_split_long_docs_semantics(spark):
    """split_long_docs: short docs pass through byte-identical; long docs
    chunk at token boundaries into ordered sub-docs whose contents
    concatenate byte-exactly to the original; chunk paths sort in document
    order so B1 assigns consecutive ids."""
    from mtix_spark.index.build import split_long_docs

    rows = [
        ("r", "big.py", "c", "python", "tok " * 120),
        ("r", "small.py", "c", "python", "a b c"),
        ("r", "empty.py", "c", "python", ""),
        ("r", "punct.py", "c", "python", "!!! ??? ..." * 40),  # 0 tokens, long
    ]
    corpus = spark.createDataFrame(
        rows, "repo string, path string, commit string, lang string, content string"
    )
    got = split_long_docs(corpus, max_tokens=50).orderBy("path").collect()
    big = [r for r in got if r.path.startswith("big.py#")]
    assert [r.path for r in big] == ["big.py#c00000", "big.py#c00001", "big.py#c00002"]
    assert [len(r.content.split()) for r in big] == [50, 50, 20]
    assert "".join(r.content for r in big) == "tok " * 120
    # untouched passthroughs, including token-free long content
    rest = {r.path: r.content for r in got if "#" not in r.path}
    assert rest == {
        "small.py": "a b c",
        "empty.py": "",
        "punct.py": "!!! ??? ..." * 40,
    }


def test_split_long_docs_indexes_past_position_bound(spark, tmp_path):
    """VERDICT r3 #6 end-to-end: a >2^22-token document fails build_positions
    loudly unsplit (the existing guard), and indexes fine after
    split_long_docs — with phrase occurrences conserved across the split."""
    import shutil

    from mtix_spark.index.build import (
        assign_doc_ids,
        build_index,
        split_long_docs,
    )
    from mtix_spark.index.positions import build_positions, phrase_topk

    n_pairs = 2_200_000  # 4.4M tokens > 2^22
    rows = [
        ("r", "huge.py", "c", "python", "a b " * n_pairs),
        ("r", "n1.py", "c", "python", "alpha beta gamma"),
    ]
    corpus = spark.createDataFrame(
        rows, "repo string, path string, commit string, lang string, content string"
    )

    # unsplit: the loud guard stays
    docs_raw = assign_doc_ids(corpus, 2)
    p_raw = build_index(spark, docs_raw, str(tmp_path / "rawidx"), n_segments=2)
    with pytest.raises(Exception, match="2\\^22|4194304"):
        build_positions(spark, docs_raw, p_raw)

    # split: build succeeds, phrase matches within chunks, occurrences conserved
    docs = assign_doc_ids(split_long_docs(corpus), 2)
    assert docs.count() == 3  # huge.py -> 2 ordered chunks + n1.py
    p = build_index(spark, docs, str(tmp_path / "splitidx"), n_segments=2)
    build_positions(spark, docs, p)
    ph = phrase_topk(spark, p, [(1, "a b")], k=10).collect()
    assert sum(r["n_occ"] for r in ph) == n_pairs
    assert len(ph) == 2  # both chunks match
