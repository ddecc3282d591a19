"""Adversarial-skew correctness (VERDICT r4 #5; SURVEY §7 "What's hard" #3).

The salted posting merge (index/build.py:merge_postings) exists for the
Zipf head — a term in 50% of all docs would otherwise serialize one
reducer. These tests PLANT that head (plus a mega-repo holding 50% of
files, stressing assign_doc_ids' range partitioner) and assert the salt
path actually engages and stays correct end-to-end. tools/skew_bench.py
measures the same construction's wall-time ratio vs uniform (BENCH.md).
"""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from mtix_spark.corpus import synth_corpus, synth_queries
from mtix_spark.index.build import assign_doc_ids, build_index, merge_postings
from tools.skew_bench import HOT_TERM, MEGA_REPO, salt_evidence, skew_corpus

N_DOCS, N_SEGMENTS, N_SALT = 600, 6, 4


@pytest.fixture(scope="module")
def skew_index(spark, tmp_path_factory):
    docs = assign_doc_ids(skew_corpus(synth_corpus(spark, N_DOCS)), 8).cache()
    out = str(tmp_path_factory.mktemp("skewidx") / "index")
    paths = build_index(spark, docs, out, n_segments=N_SEGMENTS)
    # hot_df = N/4 < N/2 guarantees the planted term classifies hot
    merge_postings(spark, paths, hot_df=N_DOCS // 4, n_salt=N_SALT)
    return docs, paths


def test_planted_skew_shape(spark, skew_index):
    """The construction is what it claims: ~50% hot-term docs, ~50% of
    files in one repo (deterministic hash picks, so exact counts are
    stable round over round)."""
    docs, _ = skew_index
    n = docs.count()
    hot = docs.filter(F.col("content").contains(HOT_TERM)).count()
    mega = docs.filter(F.col("repo") == MEGA_REPO).count()
    assert abs(hot / n - 0.5) < 0.07
    assert abs(mega / n - 0.5) < 0.07


def test_salt_path_engages_on_planted_term(spark, skew_index):
    """The 50%-df term must take the two-round salted path: it classifies
    hot (df >= hot_df) and its (term, salt) sub-round has >1 fragment —
    i.e. the merge work for the head actually parallelizes."""
    docs, paths = skew_index
    ev = salt_evidence(spark, paths, N_SALT)
    expected_df = docs.filter(F.col("content").contains(HOT_TERM)).count()
    assert ev["hot_term_df"] == expected_df >= N_DOCS // 4
    assert ev["sub_fragments"] > 1
    assert ev["segments_hit"] > 1


def test_merged_hot_list_and_query_correct(spark, skew_index):
    """The salted two-round concat must yield the exact global posting
    list for the planted term (every hot doc, strictly increasing ids,
    tf == 3 planted occurrences), and a hot-term query must return k
    results rank-identical between the merged-list and segment paths."""
    from mtix_spark.index.codec import decode_varint, delta_decode
    from mtix_spark.index.search import bm25_topk_segments, merged_topk

    docs, paths = skew_index
    row = (
        spark.read.parquet(f"{paths.root}/merged")
        .filter(F.col("term") == HOT_TERM)
        .collect()
    )
    assert len(row) == 1  # fragments fully reassembled into ONE list
    ids = delta_decode(row[0]["doc_ids_bin"]).astype(int).tolist()
    tfs = decode_varint(row[0]["tfs_bin"]).astype(int).tolist()
    expect = sorted(
        r["doc_id"]
        for r in docs.filter(F.col("content").contains(HOT_TERM))
        .select("doc_id")
        .collect()
    )
    assert ids == expect
    assert row[0]["df"] == len(expect)
    assert set(tfs) == {3}

    queries = [(9001, HOT_TERM)] + [
        (q, t) for q, t, _ in synth_queries(spark, 5).collect()
    ]
    seg = sorted(
        (r["query_id"], r["rank"], r["doc_id"], round(r["score"], 6))
        for r in bm25_topk_segments(spark, paths, queries, k=20).collect()
    )
    mrg = sorted(
        (int(q), int(rk), int(d), round(float(sc), 6))
        for q, rk, d, sc in merged_topk(spark, paths, queries, k=20).itertuples(
            index=False
        )
    )
    assert seg == mrg and seg


def test_mega_repo_does_not_collapse_partitioning(spark, skew_index):
    """assign_doc_ids range-partitions on (repo, path, commit); a repo
    holding 50% of files must still split across partitions (the range
    partitioner samples WITHIN the repo by path) and ids stay dense and
    deterministic."""
    docs, paths = skew_index
    n = docs.count()
    ids = [r["doc_id"] for r in docs.select("doc_id").collect()]
    assert sorted(ids) == list(range(n))
    # no single segment holds the majority of docs: read the manifest
    with open(f"{paths.root}/manifest.json") as f:
        seg_docs = [m["n_docs"] for m in json.load(f)["segments"].values()]
    assert max(seg_docs) < 0.5 * n
    # determinism across a different parallelism (north-rule invariance)
    again = assign_doc_ids(skew_corpus(synth_corpus(spark, N_DOCS)), 3)
    a = {(r["repo"], r["path"], r["commit"]): r["doc_id"] for r in docs.collect()}
    b = {(r["repo"], r["path"], r["commit"]): r["doc_id"] for r in again.collect()}
    assert a == b
