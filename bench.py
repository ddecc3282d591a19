"""Headline benchmark. Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Covers the north-rule metric surface:
- index_build      : inverted-index build (docIDs, postings segments,
                     dictionary, manifest) over the deterministic synthetic
                     source-code corpus (files/sec in extra.files_per_sec)
- bm25_queries     : the fixed query set through the physical segment engine
                     (per-query p95 in extra.bm25_p95_ms)
- core analytics   : the oracled operator suite over the driver's sf tables

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS (default 32), MTIX_BENCH_DOCS (override corpus size).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as E
from mtix_spark.corpus import synth_corpus, synth_queries
from mtix_spark.index.build import assign_doc_ids, build_index
from mtix_spark.index.search import SegmentSearcher
from mtix_spark.session import get_spark


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else 0.1
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    n_docs = int(os.environ.get("MTIX_BENCH_DOCS", str(max(2000, int(sf * 150_000)))))

    spark = get_spark("mtix_bench", master=f"local[{cpus}]", shuffle_partitions=cpus)
    timings: dict[str, float] = {}
    extra: dict[str, float] = {}

    # --- index build over the synthetic source-code corpus -----------------
    # corpus materialized to parquet first (untimed) so index_build measures
    # the build itself — scan → docIDs → tf → segment postings → manifest
    work = tempfile.mkdtemp(prefix="mtix_bench_")
    corpus_dir, idx_dir = f"{work}/corpus", f"{work}/index"
    synth_corpus(spark, n_docs).write.parquet(corpus_dir)
    t0 = time.time()
    docs = assign_doc_ids(spark.read.parquet(corpus_dir), cpus)
    paths = build_index(spark, docs, idx_dir, n_segments=max(8, cpus))
    timings["index_build"] = round(time.time() - t0, 3)
    extra["files_per_sec"] = round(n_docs / timings["index_build"], 1)
    extra["n_docs"] = n_docs

    # --- BM25 query latency through the segment engine ---------------------
    qset = [(q, t) for q, t, _ in synth_queries(spark, 100).collect()]
    searcher = SegmentSearcher(spark, paths)
    searcher.search(qset[:2], k=10).collect()  # warm: persist doclens/dict
    t0 = time.time()
    searcher.search(qset, k=100).collect()
    timings["bm25_100q_batch"] = round(time.time() - t0, 3)
    lat = []
    for qid, text in qset[:20]:
        t1 = time.time()
        searcher.search_topk([(qid, text)], k=100)
        lat.append((time.time() - t1) * 1000)
    lat.sort()
    extra["bm25_p95_ms"] = round(lat[int(0.95 * len(lat)) - 1], 1)
    timings["bm25_20q_single"] = round(sum(lat) / 1000, 3)
    # warm serving path: term rows cached on the handle after the first
    # touch — repeat queries run the same kernels driver-side, no Spark job
    searcher.search_warm(qset[:20], k=100)
    wlat = []
    for qid, text in qset[:20]:
        t1 = time.time()
        searcher.search_warm([(qid, text)], k=100)
        wlat.append((time.time() - t1) * 1000)
    wlat.sort()
    extra["bm25_warm_p95_ms"] = round(wlat[int(0.95 * len(wlat)) - 1], 2)
    searcher.close()

    # --- merged-list serving path (B5 consumer): salted merge + query ------
    from mtix_spark.index.build import merge_postings
    from mtix_spark.index.search import MergedSearcher

    t0 = time.time()
    merge_postings(spark, paths, hot_df=10_000)
    timings["merge_postings"] = round(time.time() - t0, 3)
    ms = MergedSearcher(spark, paths)
    t0 = time.time()
    ms.search(qset[:50], k=100)
    timings["merged_50q"] = round(time.time() - t0, 3)
    # warm serving latency: term lists + dl cached on the handle (the
    # serving-node architecture) — repeat queries run without a Spark job
    mlat = []
    for qid, text in qset[:20]:
        t1 = time.time()
        ms.search([(qid, text)], k=100)
        mlat.append((time.time() - t1) * 1000)
    mlat.sort()
    extra["merged_warm_p95_ms"] = round(mlat[int(0.95 * len(mlat)) - 1], 2)

    # --- conjunctive (AND) path over the same index ------------------------
    sa = SegmentSearcher(spark, paths, persist=False)
    t0 = time.time()
    sa.search_and(qset[:50], k=100).collect()
    timings["bm25_and_50q"] = round(time.time() - t0, 3)

    # --- positional index + phrase queries ---------------------------------
    from mtix_spark.index.positions import build_positions, phrase_topk

    t0 = time.time()
    build_positions(spark, docs, paths)
    timings["positions_build"] = round(time.time() - t0, 3)
    import re

    phrases = []
    for i, r in enumerate(spark.read.parquet(corpus_dir).select("content").take(25)):
        toks = [t for t in re.split(r"[^a-z0-9_]+", r["content"].lower()) if t]
        if len(toks) >= 2:
            phrases.append((i, " ".join(toks[:2])))
    t0 = time.time()
    phrase_topk(spark, paths, phrases, k=100).write.format("noop").mode(
        "overwrite"
    ).save()
    timings["phrase_25q"] = round(time.time() - t0, 3)

    # --- segment compaction (streaming-health op) --------------------------
    from mtix_spark.index.compact import compact_segments

    t0 = time.time()
    compact_segments(spark, paths, small_docs=10**9, max_group=8)
    timings["compact_segments"] = round(time.time() - t0, 3)
    shutil.rmtree(work, ignore_errors=True)

    # --- operator suite over the driver tables -----------------------------
    # the headline suite holds the operators a 100 TB pipeline actually runs:
    # candidate-generating dedup (minhash/simhash banding) and ANN (LSH), not
    # the O(n²) exact verifiers (ngram_jaccard / embed_near_dup) — those stay
    # in the correctness contract (__spark_entry__) where the oracle checks
    # them at sf0.01
    suite = [
        "tf_postings", "term_dict", "bm25_topk", "token_count", "language_id",
        "quality_score", "dedup_exact", "minhash_lsh", "simhash",
        "simhash_pairs", "knn_cosine", "knn_lsh", "embed_near_dup_lsh",
        "topn_per_key",
        "run_fusion", "dim_join_revenue", "tpch_q1", "tpch_q3", "tpch_q6",
        "rollup_counts", "events_tumbling", "mti_pipeline",
        "wildcard_topk", "fuzzy_topk", "regexp_topk", "synonym_topk",
        "lm_dirichlet_topk", "near_match", "boolean_search",
        "pack_sequences", "training_order", "tfidf_vectors", "date_histogram",
        "gopher_repetition", "pii_scrub", "boilerplate_ngrams", "knn_ivf",
        "dedup_clusters_star",
    ]
    qs = E.queries()
    for name in suite:
        t0 = time.time()
        qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        timings[name] = round(time.time() - t0, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "index-build + BM25 query set + operator suite wall time",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "extra": extra,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
