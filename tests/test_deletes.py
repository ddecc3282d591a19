"""Deletes: tombstone masking (Lucene stale-stats semantics) across every
query path, then purge → value-identical to a fresh build over survivors."""

from __future__ import annotations

import shutil

import pytest
from pyspark.sql import functions as F

from mtix_spark.corpus import synth_corpus, synth_queries
from mtix_spark.index.build import assign_doc_ids, build_index, read_manifest
from mtix_spark.index.deletes import delete_docs, purge_deletes
from mtix_spark.index.positions import build_positions, phrase_topk
from mtix_spark.index.search import SegmentSearcher


@pytest.fixture()
def del_index(spark, tmp_path):
    docs = assign_doc_ids(synth_corpus(spark, 600), 8)
    out = str(tmp_path / "didx")
    shutil.rmtree(out, ignore_errors=True)
    paths = build_index(spark, docs, out, n_segments=4)
    build_positions(spark, docs, paths)
    return docs, paths


def _topk(spark, paths, queries, k=30):
    return sorted(
        (r["query_id"], r["rank"], r["doc_id"], round(r["score"], 6))
        for r in SegmentSearcher(spark, paths, persist=False)
        .search(queries, k)
        .collect()
    )


def test_delete_masks_all_paths(spark, del_index):
    from mtix_spark.index.build import merge_postings
    from mtix_spark.index.search import MergedSearcher

    docs, paths = del_index
    queries = [(q, t) for q, t, _ in synth_queries(spark, 12).collect()]
    base = _topk(spark, paths, queries)
    # delete the docs that currently appear at rank 1 (worst case for
    # after-the-fact masking — must not under-fill or mis-prune)
    victims = sorted({d for q, r, d, s in base if r == 1})
    n = delete_docs(spark, paths, victims)
    assert n == len(victims)
    # idempotent re-delete
    assert delete_docs(spark, paths, victims) == 0

    after = _topk(spark, paths, queries)
    assert not any(d in set(victims) for _, _, d, _ in after)
    # stale-stats semantics: surviving docs keep their exact scores
    base_scores = {(q, d): s for q, _, d, s in base}
    for q, _, d, s in after:
        if (q, d) in base_scores:
            assert s == base_scores[(q, d)]

    s = SegmentSearcher(spark, paths, persist=False)
    conj = s.search_and(queries[:5], k=30).collect()
    assert not any(r["doc_id"] in set(victims) for r in conj)

    merge_postings(spark, paths, hot_df=50)
    ms = MergedSearcher(spark, paths)
    mres = ms.search(queries, k=30)
    assert not mres["doc_id"].isin(victims).any()

    import re

    c = docs.filter(~F.col("doc_id").isin(victims)).select("content").first()["content"]
    toks = [t for t in re.split(r"[^a-z0-9_]+", c.lower()) if t]
    ph = phrase_topk(spark, paths, [(1, " ".join(toks[:2]))], k=10_000).collect()
    assert not any(r["doc_id"] in set(victims) for r in ph)


def test_purge_matches_fresh_build(spark, del_index, tmp_path):
    docs, paths = del_index
    queries = [(q, t) for q, t, _ in synth_queries(spark, 12).collect()]
    victims = list(range(0, 600, 7))  # 86 docs across all segments
    delete_docs(spark, paths, victims)
    purged = purge_deletes(spark, paths)
    assert purged  # every segment had tombstones
    man = read_manifest(paths)
    assert man["n_deleted"] == 0
    assert sum(m["n_docs"] for m in man["segments"].values()) == 600 - len(victims)

    # fresh build over the survivors (different dense ids → compare by path)
    survivors = docs.filter(~F.col("doc_id").isin(victims)).select(
        "repo", "path", "commit", "lang", "content"
    )
    fidx = str(tmp_path / "fresh")
    fpaths = build_index(
        spark, assign_doc_ids(survivors, 8), fidx, n_segments=4
    )

    def by_path(p, res):
        remap = {
            r["doc_id"]: r["path"]
            for r in spark.read.parquet(p.docmap).select("doc_id", "path").collect()
        }
        out = {}
        for r in res:
            out.setdefault(r["query_id"], []).append(
                (round(r["score"], 6), remap[r["doc_id"]])
            )
        return {
            q: sorted(rows, key=lambda t: (-t[0], t[1]))[:10]
            for q, rows in out.items()
        }

    a = by_path(
        paths,
        SegmentSearcher(spark, paths, persist=False).search(queries, 30).collect(),
    )
    b = by_path(
        fpaths,
        SegmentSearcher(spark, fpaths, persist=False).search(queries, 30).collect(),
    )
    assert a == b  # post-purge stats → scores identical to a from-scratch build

    # purged positional index: phrase results match the relational twin
    # over the surviving docs
    import re

    from mtix_spark.index.positions import phrase_match_relational

    c = docs.filter(~F.col("doc_id").isin(victims)).select("content").first()["content"]
    toks = [t for t in re.split(r"[^a-z0-9_]+", c.lower()) if t]
    phrase = " ".join(toks[:2])
    got = sorted(
        (r["doc_id"], r["n_occ"])
        for r in phrase_topk(spark, paths, [(1, phrase)], k=10_000).collect()
    )
    want = sorted(
        (r["doc_id"], r["n_occ"])
        for r in phrase_match_relational(
            docs.filter(~F.col("doc_id").isin(victims)), phrase
        ).collect()
    )
    assert got == want


def test_bulk_delete_dataframe_ids_never_collected(spark, del_index):
    """GDPR-scale campaign: ids arrive as a DataFrame and must never
    transit the driver. 10^5 ids (most outside any segment range) resolve
    through the broadcast range join; masking and accumulation behave
    exactly like the list form."""
    docs, paths = del_index
    queries = [(q, t) for q, t, _ in synth_queries(spark, 8).collect()]
    base = _topk(spark, paths, queries)

    # 100k candidate ids, step 3 — ids 0..599 exist, so ⌈600/3⌉ hit
    ids_df = spark.range(0, 300_000, 3).select(F.col("id").alias("doc_id"))
    expect_hits = len(range(0, 600, 3))
    n = delete_docs(spark, paths, ids_df)
    assert n == expect_hits
    # idempotent replay of the same frame
    assert delete_docs(spark, paths, ids_df) == 0
    # accumulation: a later point delete unions with the bulk tombstones
    survivor = next(d for d in range(600) if d % 3 != 0)
    assert delete_docs(spark, paths, [survivor]) == 1

    deleted = {d for d in range(0, 600, 3)} | {survivor}
    after = _topk(spark, paths, queries)
    assert after  # plenty of survivors
    assert not any(d in deleted for _, _, d, _ in after)


def test_merged_searcher_fully_deleted_term_returns_empty(spark, del_index):
    """Deleting EVERY doc that contains a term must make merged-path
    queries for it return no rows — not crash on an empty accumulator."""
    from mtix_spark.index.build import merge_postings
    from mtix_spark.index.search import MergedSearcher

    docs, paths = del_index
    merge_postings(spark, paths, hot_df=10_000)
    # pick a real term and tombstone every doc containing it
    import re

    c = docs.select("content").first()["content"]
    term = next(t for t in re.split(r"[^a-z0-9_]+", c.lower()) if t)
    from mtix_spark.index.search import SegmentSearcher

    holders = {
        r["doc_id"]
        for r in SegmentSearcher(spark, paths, persist=False)
        .search([(1, term)], k=10_000)
        .collect()
    }
    assert holders
    assert delete_docs(spark, paths, sorted(holders)) == len(holders)

    ms = MergedSearcher(spark, paths)
    got = ms.search([(1, term)], k=10)
    assert got.empty
    # mixed batch: the dead-term query contributes nothing, others still work
    alive = ms.search([(1, term), (2, "the")], k=5)
    assert set(alive["query_id"]) <= {2}
