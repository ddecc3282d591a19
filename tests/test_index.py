"""Integration tests: index build + BM25 engine vs. brute-force oracle
(SURVEY.md §5 engine test plan)."""

from __future__ import annotations

import json
import os
import shutil

import pytest
from pyspark.sql import functions as F

from mtix_spark.corpus import synth_corpus, synth_queries
from mtix_spark.index.build import (
    assign_doc_ids,
    build_index,
    build_tf,
    corpus_stats,
    read_manifest,
    verify_sha256,
)
from mtix_spark.index.search import bm25_brute, bm25_topk_segments


def _rows(df):
    return sorted(
        (r["query_id"], r["rank"], r["doc_id"], round(r["score"], 4)) for r in df.collect()
    )


def test_corpus_deterministic_across_parallelism(spark):
    a = synth_corpus(spark, 200, n_parts=2).orderBy("repo", "path", "commit").collect()
    b = synth_corpus(spark, 200, n_parts=7).orderBy("repo", "path", "commit").collect()
    assert a == b


def test_doc_ids_dense_and_deterministic(spark):
    docs4 = assign_doc_ids(synth_corpus(spark, 300), 4).select("doc_id", "repo", "path")
    docs7 = assign_doc_ids(synth_corpus(spark, 300), 7).select("doc_id", "repo", "path")
    a, b = docs4.orderBy("doc_id").collect(), docs7.orderBy("doc_id").collect()
    assert a == b  # id = rank in total order, invariant to partitioning
    ids = [r["doc_id"] for r in a]
    assert ids == list(range(300))


def test_sha256_invariant(spark, small_docs):
    corpus = synth_corpus(spark, 1000)
    assert verify_sha256(small_docs, corpus) == 0


def test_tf_matches_python(spark, small_docs):
    row = small_docs.filter(F.col("doc_id") == 5).select("content").collect()[0]
    import re
    from collections import Counter

    expected = Counter(t for t in re.split(r"[^a-z0-9_]+", row["content"].lower()) if t)
    got = {
        r["term"]: r["tf"]
        for r in build_tf(small_docs).filter(F.col("doc_id") == 5).collect()
    }
    assert got == dict(expected)


def test_segment_engine_matches_brute_force(spark, small_docs, small_index):
    n, avgdl = corpus_stats(small_docs)
    queries = [(q, t) for q, t, _ in synth_queries(spark, 25).collect()]
    qdf = spark.createDataFrame(queries, "query_id long, text string")
    tf = build_tf(small_docs)
    dl = small_docs.select("doc_id", F.col("doc_len").alias("dl"))
    brute = _rows(bm25_brute(tf, dl, qdf, n, avgdl, k=50))
    seg = _rows(bm25_topk_segments(spark, small_index, queries, k=50))
    assert brute == seg  # rank-identical top-k, scores to 1e-4


def test_topk_tiebreak_doc_id_asc(spark, small_docs, small_index):
    # single-term query: docs with equal tf+dl score identically; ranks must
    # break ties by doc_id ascending
    res = bm25_topk_segments(spark, small_index, [(1, "get_set")], k=100).collect()
    rows = sorted((r["rank"], r["doc_id"], r["score"]) for r in res)
    for (r1, d1, s1), (r2, d2, s2) in zip(rows, rows[1:]):
        assert s1 > s2 or (s1 == s2 and d1 < d2)


def test_oov_and_empty_queries(spark, small_index):
    out = bm25_topk_segments(spark, small_index, [(1, "zz_not_in_vocab_zz"), (2, "...")], k=10)
    assert out.count() == 0


def test_manifest_metrics(small_index):
    m = read_manifest(small_index)
    assert len(m["segments"]) == 6
    for seg in m["segments"].values():
        assert seg["postings"] > 0 and seg["posting_lists"] > 0
        assert seg["max_doc"] >= seg["min_doc"]
    assert m["stats"]["n_docs"] == 1000


def test_checkpoint_resume_identical(spark, small_docs, tmp_path):
    """Kill-after-partial-build → resume → identical index (SURVEY.md §5)."""
    full = str(tmp_path / "full")
    part = str(tmp_path / "partial")
    build_index(spark, small_docs, full, n_segments=4)

    # simulate a killed build: build fully, then delete 2 segments from the
    # manifest + data so the resume path must rebuild exactly those
    build_index(spark, small_docs, part, n_segments=4)
    man_path = os.path.join(part, "manifest.json")
    with open(man_path) as f:
        man = json.load(f)
    for seg in ["1", "3"]:
        del man["segments"][seg]
        shutil.rmtree(os.path.join(part, "postings", f"seg={seg}"))
    with open(man_path, "w") as f:
        json.dump(man, f)

    build_index(spark, small_docs, part, n_segments=4, resume=True)

    def index_content(root):
        p = spark.read.parquet(os.path.join(root, "postings")).select(
            "seg", "term", "df_seg", F.hex(F.col("doc_ids_bin")), F.hex(F.col("tfs_bin"))
        )
        return sorted(map(tuple, p.collect()))

    assert index_content(full) == index_content(part)
    with open(os.path.join(part, "manifest.json")) as f:
        assert len(json.load(f)["segments"]) == 4


def test_merge_postings_matches_tf(spark, small_docs, small_index):
    """Salted term-merge (B5): global lists == brute tf relation, with the
    hot path forced (hot_df=50 sends the Zipf head through salting)."""
    import numpy as np

    from mtix_spark.index.build import merge_postings
    from mtix_spark.index.codec import decode_varint, delta_decode

    out = merge_postings(spark, small_index, hot_df=50, n_salt=4)
    merged = spark.read.parquet(out).collect()
    tf_rows = build_tf(small_docs).collect()
    expect: dict[str, dict[int, int]] = {}
    for r in tf_rows:
        expect.setdefault(r["term"], {})[r["doc_id"]] = r["tf"]
    assert len(merged) == len(expect)
    for r in merged:
        ids = delta_decode(r["doc_ids_bin"]).astype(int)
        tfs = decode_varint(r["tfs_bin"]).astype(int)
        exp = expect[r["term"]]
        assert list(ids) == sorted(exp)  # globally sorted, strictly increasing
        assert [exp[i] for i in ids] == list(tfs)
        assert r["df"] == len(exp)


def test_merged_topk_matches_brute_and_segments(spark, small_docs, small_index):
    """The merged-list query path (B5 consumer) is rank-identical to the
    segment path and the brute oracle, with the hot/salted merge forced."""
    from mtix_spark.index.build import merge_postings
    from mtix_spark.index.search import merged_topk

    merge_postings(spark, small_index, hot_df=50, n_salt=4)
    queries = [(q, t) for q, t, _ in synth_queries(spark, 25).collect()]
    n, avgdl = corpus_stats(small_docs)
    qdf = spark.createDataFrame(queries, "query_id long, text string")
    tf = build_tf(small_docs)
    dl = small_docs.select("doc_id", F.col("doc_len").alias("dl"))
    brute = _rows(bm25_brute(tf, dl, qdf, n, avgdl, k=50))
    seg = _rows(bm25_topk_segments(spark, small_index, queries, k=50))
    pdf = merged_topk(spark, small_index, queries, k=50)
    mrg = sorted(
        (int(q), int(rk), int(d), round(float(sc), 4))
        for q, rk, d, sc in pdf.itertuples(index=False)
    )
    assert mrg == brute == seg
    assert merged_topk(spark, small_index, [(1, "zz_oov_zz"), (2, "")], k=5).empty


def test_maxscore_kernel_memory_proportional_to_candidates():
    """Kernel peak allocation must scale with candidate postings, not the
    declared segment size: a 5M-doc segment holding 2k posting docs must
    stay far below the ~40 MB a dense per-query accumulator would take."""
    import tracemalloc

    import numpy as np
    import pandas as pd

    from mtix_spark.index.build import BLOCK_SIZE
    from mtix_spark.index.codec import delta_encode, encode_varint
    from mtix_spark.index.search import _maxscore_kernel

    seg_n = 5_000_000
    rng = np.random.default_rng(9)
    rows = []
    for t in ["alpha", "beta", "gamma"]:
        ids = np.sort(rng.choice(seg_n, 2000, replace=False)).astype(np.uint64)
        tfs = rng.integers(1, 6, 2000).astype(np.uint64)
        rows.append(
            {
                "term": t,
                "doc_ids_bin": delta_encode(ids),
                "tfs_bin": encode_varint(tfs),
                "block_max_wtf": np.full((2000 + BLOCK_SIZE - 1) // BLOCK_SIZE, 2.2, np.float32),
            }
        )
    postings = pd.DataFrame(rows)
    dl = np.full(seg_n, 100.0)  # per-segment, loaded once, outside the kernel
    queries = [(1, ["alpha", "beta", "gamma"])] * 5
    idf = {"alpha": 2.0, "beta": 1.5, "gamma": 1.0}
    tracemalloc.start()
    out = _maxscore_kernel(postings, dl, 0, seg_n, queries, idf, 100.0, 10)
    _, peak = tracemalloc.get_traced_memory()
    tracemalloc.stop()
    assert len(out) == 50  # 5 queries × k=10
    assert peak < 5_000_000  # dense would be ≥ 40 MB for one query alone


def test_merged_blockmax_sound_on_unaligned_fragments():
    """Fragments whose lengths are not BLOCK_SIZE multiples (e.g. 100
    postings) must yield merged block maxima that upper-bound the true
    per-block wtf max on the merged 128-grid."""
    import numpy as np
    import pandas as pd

    from mtix_spark.index.build import (
        BLOCK_SIZE,
        B,
        K1,
        _build_segment_postings,
        _concat_postings,
    )
    from mtix_spark.index.codec import decode_varint, delta_decode

    rng = np.random.default_rng(3)
    avgdl = 50.0
    frags = []
    base = 0
    for n_post in (100, 300, 57):  # none a multiple of 128
        ids = base + np.arange(n_post)
        tfs = rng.integers(1, 9, n_post)
        dls = rng.integers(10, 200, n_post)
        pdf = pd.DataFrame(
            {"seg": 0, "term": "t", "doc_id": ids, "tf": tfs, "dl": dls}
        )
        frags.append(_build_segment_postings(pdf, avgdl))
        base += n_post
        # remember ground truth per posting
    all_frags = pd.concat(frags, ignore_index=True)
    merged = _concat_postings(all_frags).iloc[0]

    ids = delta_decode(merged["doc_ids_bin"])
    tfs = decode_varint(merged["tfs_bin"]).astype(float)
    assert list(ids) == list(range(457))
    # recompute true wtf from the original dls (reconstruct in same order)
    rng = np.random.default_rng(3)
    dls_all = []
    for n_post in (100, 300, 57):
        rng.integers(1, 9, n_post)
        dls_all.append(rng.integers(10, 200, n_post))
    dls = np.concatenate(dls_all).astype(float)
    wtf = tfs * (K1 + 1.0) / (tfs + K1 * (1.0 - B + B * dls / avgdl))
    bm = np.asarray(merged["block_max_wtf"], dtype=np.float64)
    starts = np.arange(0, ids.size, BLOCK_SIZE)
    true_bm = np.maximum.reduceat(wtf, starts)
    assert bm.size == starts.size
    assert np.all(bm + 1e-6 >= true_bm)  # sound upper bounds on the merged grid


def test_search_topk_matches_search(spark, small_docs, small_index):
    """Driver-merge latency path == DataFrame path, row for row."""
    from mtix_spark.index.search import SegmentSearcher

    s = SegmentSearcher(spark, small_index, persist=False)
    queries = [(q, t) for q, t, _ in synth_queries(spark, 10).collect()]
    a = sorted(
        (r["query_id"], r["rank"], r["doc_id"], round(r["score"], 6))
        for r in s.search(queries, k=20).collect()
    )
    pdf = s.search_topk(queries, k=20)
    b = sorted(
        (int(q), int(rk), int(d), round(float(sc), 6))
        for q, rk, d, sc in pdf.itertuples(index=False)
    )
    assert a == b
    assert s.search_topk([(1, "zz_oov_zz")], k=5).empty


def test_conjunctive_engine_matches_brute(spark, small_docs, small_index):
    """AND-mode physical kernel (rarest-first posting intersection) is
    row-identical to the relational conjunctive brute (the oracle twin),
    and every result doc contains every query term."""
    from mtix_spark.index.search import SegmentSearcher, bm25_conjunctive_brute

    n, avgdl = corpus_stats(small_docs)
    queries = [(q, t) for q, t, _ in synth_queries(spark, 15).collect()]
    queries += [(900, "zz_oov_zz save"), (901, "")]  # OOV term → empty; empty query
    qdf = spark.createDataFrame(queries, "query_id long, text string")
    tf = build_tf(small_docs)
    dl = small_docs.select("doc_id", F.col("doc_len").alias("dl"))
    brute = _rows(bm25_conjunctive_brute(tf, dl, qdf, n, avgdl, k=30))
    searcher = SegmentSearcher(spark, small_index, persist=False)
    engine = _rows(searcher.search_and(queries, k=30))
    assert engine == brute
    assert not any(q in (900, 901) for q, *_ in engine)
    # AND semantics spot check: intersect memberships for one query
    qid, text = queries[0]
    import re

    terms = {t for t in re.split(r"[^a-z0-9_]+", text.lower()) if t}
    hit_docs = [d for q, r, d, s in engine if q == qid]
    if hit_docs:
        member = (
            build_tf(small_docs)
            .filter(F.col("term").isin(sorted(terms)) & F.col("doc_id").isin(hit_docs))
            .groupBy("doc_id")
            .agg(F.countDistinct("term").alias("nt"))
            .collect()
        )
        assert all(r["nt"] == len(terms) for r in member)


def test_bm25f_field_weighting(spark):
    """BM25F: a term hit in a heavily-weighted short field outranks the
    same term buried in the long field; combine happens before saturation
    (summing per-field BM25 scores would give a different total)."""
    from mtix_spark.index.search import bm25f_topk

    docs = spark.createDataFrame(
        [
            (0, "alpha " + "filler " * 50, "other"),
            (1, "beta " + "filler " * 50, "alpha"),  # alpha in title-ish field
            (2, "gamma delta", "other"),
        ],
        "doc_id long, body string, title string",
    )
    qdf = spark.createDataFrame([(1, "alpha")], "query_id long, text string")
    out = bm25f_topk(docs, {"body": 1.0, "title": 5.0}, qdf, k=10).collect()
    ranked = [(r["rank"], r["doc_id"]) for r in sorted(out, key=lambda r: r["rank"])]
    assert ranked[0][1] == 1  # title hit (w=5) beats body hit (w=1)
    assert {d for _, d in ranked} == {0, 1}


def test_search_warm_matches_search(spark, small_docs, small_index):
    """Driver-side warm path: row-identical to the distributed path, with
    and without tombstones; warm repeat runs with zero Spark jobs."""
    from mtix_spark.index.deletes import delete_docs
    from mtix_spark.index.search import SegmentSearcher

    queries = [(q, t) for q, t, _ in synth_queries(spark, 10).collect()]
    queries += [(900, "zz_oov_zz"), (901, "")]
    s = SegmentSearcher(spark, small_index, persist=False)
    a = _rows(s.search(queries, k=25))
    b = sorted(
        (int(r.query_id), int(r.rank), int(r.doc_id), round(r.score, 4))
        for r in s.search_warm(queries, k=25).itertuples()
    )
    assert a == b
    # tombstones respected on a fresh handle (epoch bump invalidates) —
    # on a PRIVATE copy: small_index is session-scoped and later tests
    # (e.g. phrase index vs relational twin) assume an undeleted corpus
    import shutil
    import tempfile

    from mtix_spark.index.build import IndexPaths

    priv = IndexPaths(tempfile.mkdtemp(prefix="mtix_delidx_") + "/index")
    shutil.copytree(small_index.root, priv.root)
    victims = sorted({d for _, r, d, _ in a if r == 1})
    delete_docs(spark, priv, victims)
    s2 = SegmentSearcher(spark, priv, persist=False)
    w = s2.search_warm(queries, k=25)
    assert not w["doc_id"].isin(victims).any()
    assert _rows(s2.search(queries, k=25)) == sorted(
        (int(r.query_id), int(r.rank), int(r.doc_id), round(r.score, 4))
        for r in w.itertuples()
    )


def test_index_stats(spark, small_index):
    from mtix_spark.index.build import index_stats

    rows = index_stats(spark, small_index).collect()
    assert len(rows) == 6
    assert sum(r["n_docs"] for r in rows) == 1000
    assert all(r["source"] == "docs" for r in rows)
    assert all(r["bytes_per_posting"] and r["bytes_per_posting"] < 10 for r in rows)


def test_get_docs_point_lookup_and_deletes(spark, small_docs, tmp_path):
    """Stored-fields lookup returns the requested rows; tombstoned ids
    return nothing (the reader's view)."""
    from mtix_spark.index.build import build_index
    from mtix_spark.index.deletes import delete_docs
    from mtix_spark.index.search import get_docs

    idx = build_index(spark, small_docs, str(tmp_path / "gdidx"), n_segments=3)
    want = {int(r["doc_id"]) for r in small_docs.select("doc_id").take(3)}
    got = get_docs(spark, idx, sorted(want) + [10**9]).collect()
    assert {int(r["doc_id"]) for r in got} == want  # unknown id -> no row
    srcmap = {
        int(r["doc_id"]): r["content_sha256"]
        for r in small_docs.select("doc_id", "content_sha256").collect()
    }
    for r in got:
        assert r["content_sha256"] == srcmap[int(r["doc_id"])]
    victim = sorted(want)[0]
    delete_docs(spark, idx, [victim])
    left = {int(r["doc_id"]) for r in get_docs(spark, idx, sorted(want)).collect()}
    assert left == want - {victim}


def test_merged_searcher_dl_memory_proportional_to_touched_blocks(
    spark, tmp_path
):
    """Serving-state laziness: a MergedSearcher query whose postings live in
    one doc-range block must load ONLY that dl block (and no tombstones) —
    the sharded-serving behavior for a 10^12-doc corpus, verified in code.
    Warm-path results stay rank-identical to the brute oracle."""
    from mtix_spark.corpus import synth_queries
    from mtix_spark.index.build import (
        assign_doc_ids,
        build_index,
        build_tf,
        corpus_stats,
        merge_postings,
    )
    from mtix_spark.index.search import MergedSearcher, bm25_brute

    # 4 segments of 100 docs each; every doc carries a marker term unique
    # to its segment so queries can be confined to one doc range
    rows = []
    for i in range(400):
        seg_marker = f"segmark{i // 100}"
        filler = " ".join(f"w{j}" for j in range(i % 7 + 3))
        rows.append(("r", f"f{i:04d}.py", "c", "python", f"{seg_marker} {filler}"))
    corpus = spark.createDataFrame(
        rows, "repo string, path string, commit string, lang string, content string"
    )
    docs = assign_doc_ids(corpus, 4)
    out = str(tmp_path / "lazyidx")
    paths = build_index(spark, docs, out, n_segments=4)
    merge_postings(spark, paths, hot_df=50, n_salt=4)

    ms = MergedSearcher(spark, paths, dl_block=100)  # block == segment range
    got = ms.search([(1, "segmark0")], k=10)
    assert len(got) == 10
    assert set(ms._dl_blocks) == {0}, "only the touched block may load"
    assert ms._del_segs == {}, "no deletes -> no tombstone loads"

    got3 = ms.search([(2, "segmark3")], k=10)
    assert set(ms._dl_blocks) == {0, 3}
    assert got3["doc_id"].between(300, 399).all()

    # rank identity on a mixed query against the brute oracle
    queries = [(5, "segmark1 w1 w5"), (6, "w2 w6")]
    n, avgdl = corpus_stats(docs)
    qdf = spark.createDataFrame(queries, "query_id long, text string")
    tf = build_tf(docs)
    dl = docs.select("doc_id", F.col("doc_len").alias("dl"))
    brute = sorted(
        (int(r["query_id"]), int(r["rank"]), int(r["doc_id"]), round(float(r["score"]), 4))
        for r in bm25_brute(tf, dl, qdf, n, avgdl, k=25).collect()
    )
    warm = sorted(
        (int(q), int(rk), int(d), round(float(sc), 4))
        for q, rk, d, sc in ms.search(queries, k=25).itertuples(index=False)
    )
    assert warm == brute


def test_segment_kernel_boundary_ties_deterministic(spark, tmp_path):
    """A tie class spanning the per-segment top-k boundary must resolve by
    doc_id ASC (the oracle's order) — argpartition alone picks arbitrary
    tie members, which the global merge then can't repair."""
    from mtix_spark.index.build import assign_doc_ids, build_index
    from mtix_spark.index.search import bm25_topk_segments

    # 40 identical docs in one segment: every score ties exactly
    rows = [("r", f"d{i:03d}.py", "c", "py", "tied alpha beta") for i in range(40)]
    docs = assign_doc_ids(
        spark.createDataFrame(
            rows, "repo string, path string, commit string, lang string, content string"
        ),
        4,
    )
    paths = build_index(spark, docs, str(tmp_path / "tieidx"), n_segments=1)
    got = bm25_topk_segments(spark, paths, [(1, "tied")], k=10).collect()
    assert [r["doc_id"] for r in sorted(got, key=lambda r: r["rank"])] == list(range(10))
    assert len({r["score"] for r in got}) == 1


def test_serving_caches_lru_capped(spark, tmp_path):
    """VERDICT r3 #3: long-lived serving handles must bound their caches.
    Stream more distinct terms through a capped MergedSearcher /
    SegmentSearcher than the budget holds: peak cache size stays within
    budget after every call, entries actually evict, and every result
    stays rank-identical to an uncapped handle."""
    from mtix_spark.corpus import synth_corpus, synth_queries
    from mtix_spark.index.build import assign_doc_ids, build_index, merge_postings
    from mtix_spark.index.search import MergedSearcher, SegmentSearcher

    docs = assign_doc_ids(synth_corpus(spark, 400), 4)
    paths = build_index(spark, docs, str(tmp_path / "cidx"), n_segments=4)
    merge_postings(spark, paths, hot_df=50, n_salt=4)

    # distinct single-term queries drawn from the real vocabulary
    from mtix_spark.index.build import read_dictionary

    vocab = [
        r["term"]
        for r in read_dictionary(spark, paths).orderBy("term").limit(40).collect()
    ]
    qs = [(i, t) for i, t in enumerate(vocab)]

    # merged path: tiny byte budgets force continuous eviction
    free = MergedSearcher(spark, paths, dl_block=64)
    capped = MergedSearcher(
        spark, paths, dl_block=64, term_cache_bytes=2_000, dl_cache_bytes=1_536
    )
    import numpy as np

    for q in qs:
        want = free.search([q], k=10)
        got = capped.search([q], k=10)
        assert want.values.tolist() == got.values.tolist(), q
        # invariant: within budget after every call, except that a single
        # call's pinned working set may alone exceed it (never dropped
        # mid-call); then the cache holds exactly that working set
        entry = free._terms.get(q[1])
        t_ws = 0 if entry is None else entry[0].nbytes + entry[1].nbytes
        d_ws = (
            0
            if entry is None
            else len(np.unique(entry[0] // free.dl_block)) * 64 * 8
        )
        assert capped._terms.bytes <= max(2_000, t_ws)
        assert capped._dl_blocks.bytes <= max(1_536, d_ws)
    assert len(capped._terms) < len(free._terms)  # evictions happened
    assert len(capped._dl_blocks) < len(free._dl_blocks)
    # warm re-query of an evicted term refetches and still matches
    assert capped.search([qs[0]], k=10).values.tolist() == free.search(
        [qs[0]], k=10
    ).values.tolist()

    # segment path: df-cache entry cap
    s_free = SegmentSearcher(spark, paths, persist=False)
    s_cap = SegmentSearcher(spark, paths, persist=False, df_cache_entries=8)
    for q in qs[:20]:
        a = sorted(map(tuple, s_free.search([q], k=10).collect()))
        b = sorted(map(tuple, s_cap.search([q], k=10).collect()))
        assert a == b, q
        assert len(s_cap._df_cache) <= 8
    assert len(s_free._df_cache) > 8


def test_preload_dictionary_cap_interactions(spark, small_index):
    """preload refuses a dictionary larger than the df-cache cap; after a
    legal preload, evictions caused by OOV-term storms downgrade the
    'miss = OOV' shortcut so real terms still resolve correctly."""
    from mtix_spark.index.search import SegmentSearcher

    probe = SegmentSearcher(spark, small_index, persist=False)
    n_vocab = probe.dictionary.count()

    tiny = SegmentSearcher(spark, small_index, persist=False, df_cache_entries=5)
    with pytest.raises(ValueError, match="df_cache_entries"):
        tiny.preload_dictionary()

    s = SegmentSearcher(
        spark, small_index, persist=False, df_cache_entries=int(n_vocab)
    )
    assert s.preload_dictionary() == n_vocab
    assert s._df_preloaded
    # OOV storm (one batched call): each miss inserts a 0-entry, pushing
    # preloaded real terms out past the cap
    oov = [(i, f"zz_oov_term_{i}") for i in range(int(n_vocab) // 2 + 2)]
    assert s.search(oov, k=5).count() == 0
    assert not s._df_preloaded  # shortcut downgraded on first eviction
    # a real (possibly evicted) term must still resolve via lazy lookup
    real = [r["term"] for r in probe.dictionary.orderBy("term").limit(5).collect()]
    for i, t in enumerate(real):
        a = sorted(map(tuple, probe.search([(i, t)], k=10).collect()))
        b = sorted(map(tuple, s.search([(i, t)], k=10).collect()))
        assert a == b, t


def test_preload_dictionary_exact_max_terms_boundary(spark, small_index):
    """preload succeeds at n == max_terms exactly and refuses at
    n == max_terms - 1 (VERDICT r3 hardening item)."""
    from mtix_spark.index.search import SegmentSearcher

    s = SegmentSearcher(spark, small_index, persist=False)
    n = s.dictionary.count()
    assert s.preload_dictionary(max_terms=int(n)) == n  # boundary: allowed
    s2 = SegmentSearcher(spark, small_index, persist=False)
    with pytest.raises(ValueError, match="max_terms"):
        s2.preload_dictionary(max_terms=int(n) - 1)
