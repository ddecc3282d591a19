"""Headline benchmark. Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Covers the north-rule metric surface:
- index_build      : inverted-index build (docIDs, postings segments,
                     dictionary, manifest) over the deterministic synthetic
                     source-code corpus (files/sec in extra.files_per_sec)
- bm25_queries     : the fixed query set through the physical segment engine
                     (per-query p95 in extra.bm25_p95_ms)
- core analytics   : the oracled operator suite over the driver's sf tables

Measurement protocol (VERDICT r3 #4): this host's throughput drifts ±50%
within an hour under co-tenant load, so single-pass timings cannot
distinguish drift from regression. Every re-runnable entry (query batches,
positions build, phrase queries, the whole operator suite) therefore runs
MTIX_BENCH_PASSES interleaved passes (default 3, pass-major order — the
same discipline the BENCH.md scaling campaigns use) and reports the
per-entry MEDIAN in `queries`, with per-entry relative spread
((max-min)/median) in `spread`. One-shot stateful steps (index_build,
merge_postings, compact_segments — they mutate the index) stay single-pass
and are listed in `single_pass`. `value` is the sum of medians (comparable
round over round); `extra.wall_sec` is the true wall clock.

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS (default 32), MTIX_BENCH_DOCS (override corpus size),
     MTIX_BENCH_PASSES (default 3).
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as E
from mtix_spark.corpus import synth_corpus, synth_queries
from mtix_spark.index.build import assign_doc_ids, build_index
from mtix_spark.index.search import SegmentSearcher
from mtix_spark.session import get_spark

# the headline suite holds the operators a 100 TB pipeline actually runs:
# candidate-generating dedup (minhash/simhash banding) and ANN (LSH), not
# the O(n²) exact verifiers (ngram_jaccard / embed_near_dup) — those stay
# in the correctness contract (__spark_entry__) where the oracle checks
# them at sf0.01
SUITE = [
    "tf_postings", "term_dict", "bm25_topk", "token_count", "language_id",
    "quality_score", "dedup_exact", "minhash_lsh", "simhash",
    # knn_lsh/embed_near_dup_lsh/knn_ivf were renamed to *_probe in r05 when
    # the unsuffixed keys flipped to exact probe-everything oracle modes —
    # these benchmark the SAME production approximate configs as the r01-r04
    # rows of the same workload (movement table maps old name -> _probe)
    "simhash_pairs", "knn_cosine", "knn_lsh_probe", "embed_near_dup_lsh_probe",
    "topn_per_key",
    "run_fusion", "dim_join_revenue", "tpch_q1", "tpch_q3", "tpch_q6",
    "rollup_counts", "events_tumbling", "mti_pipeline",
    "wildcard_topk", "fuzzy_topk", "regexp_topk", "synonym_topk",
    "lm_dirichlet_topk", "near_match", "boolean_search",
    "pack_sequences", "training_order", "tfidf_vectors", "date_histogram",
    "gopher_repetition", "pii_scrub", "boilerplate_ngrams", "knn_ivf_probe",
    "dedup_clusters_star", "split_docs", "duplicate_spans", "scrub_spans",
    # r04 query-DSL additions — the index-backed variants exercise the
    # count-aware / boost-aware MaxScore kernel and the RRF fusion path
    "hybrid_rrf_index", "function_score_index", "min_match_index",
    "dis_max", "dis_max_index", "multi_match_best", "rescore",
    "significant_terms",
    # r05 addition — trigram substring/regex grep (index.trigram); the first
    # interleaved pass pays the one cached trigram-index build (same protocol
    # as the *_index entries and their shared _docs_index build)
    "trigram_postings", "grep_substring", "grep_regex", "grep_icase",
    # r05 addition — percolator (reverse search: stored queries vs doc stream)
    "percolate_terms", "percolate_phrase",
    # r05 batch 2 — identifier analyzer, cross_fields blending, phrase
    # prefix (relational + positional index), term vectors, gauss decay
    "ident_match", "ident_index", "multi_match_cross", "phrase_prefix",
    "phrase_prefix_index", "term_vectors", "decay_gauss", "completion_index",
    "mlt_index", "knn_filtered",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else 0.1
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    n_docs = int(os.environ.get("MTIX_BENCH_DOCS", str(max(2000, int(sf * 150_000)))))
    passes = max(1, int(os.environ.get("MTIX_BENCH_PASSES", "3")))

    wall0 = time.time()
    spark = get_spark("mtix_bench", master=f"local[{cpus}]", shuffle_partitions=cpus)
    single: dict[str, float] = {}        # one-shot stateful steps
    multi: dict[str, list[float]] = {}   # per-pass samples for everything else
    extra_samples: dict[str, list[float]] = {}
    extra: dict[str, float] = {}

    def sample(name: str, sec: float) -> None:
        multi.setdefault(name, []).append(round(sec, 3))

    def esample(name: str, v: float) -> None:
        extra_samples.setdefault(name, []).append(v)

    # --- index build over the synthetic source-code corpus -----------------
    # corpus materialized to parquet first (untimed) so index_build measures
    # the build itself — scan → docIDs → tf → segment postings → manifest
    work = tempfile.mkdtemp(prefix="mtix_bench_")
    corpus_dir, idx_dir = f"{work}/corpus", f"{work}/index"
    synth_corpus(spark, n_docs).write.parquet(corpus_dir)
    t0 = time.time()
    docs = assign_doc_ids(spark.read.parquet(corpus_dir), cpus)
    paths = build_index(spark, docs, idx_dir, n_segments=max(8, cpus))
    single["index_build"] = round(time.time() - t0, 3)
    extra["files_per_sec"] = round(n_docs / single["index_build"], 1)
    extra["n_docs"] = n_docs

    from mtix_spark.index.build import merge_postings, read_manifest, _commit_manifest
    from mtix_spark.index.search import MergedSearcher
    from mtix_spark.index.positions import build_positions, phrase_topk

    t0 = time.time()
    merge_postings(spark, paths, hot_df=10_000)
    single["merge_postings"] = round(time.time() - t0, 3)

    qset = [(q, t) for q, t, _ in synth_queries(spark, 100).collect()]
    import re

    phrases = []
    for i, r in enumerate(spark.read.parquet(corpus_dir).select("content").take(25)):
        toks = [t for t in re.split(r"[^a-z0-9_]+", r["content"].lower()) if t]
        if len(toks) >= 2:
            phrases.append((i, " ".join(toks[:2])))

    for p in range(passes):
        # --- BM25 query latency through the segment engine -----------------
        searcher = SegmentSearcher(spark, paths)
        searcher.search(qset[:2], k=10).collect()  # warm: persist doclens/dict
        t0 = time.time()
        searcher.search(qset, k=100).collect()
        sample("bm25_100q_batch", time.time() - t0)
        lat = []
        for qid, text in qset[:20]:
            t1 = time.time()
            searcher.search_topk([(qid, text)], k=100)
            lat.append((time.time() - t1) * 1000)
        lat.sort()
        esample("bm25_p95_ms", round(lat[int(0.95 * len(lat)) - 1], 1))
        sample("bm25_20q_single", sum(lat) / 1000)
        # warm serving path: term rows cached on the handle after the first
        # touch — repeat queries run the same kernels driver-side, no Spark job
        searcher.search_warm(qset[:20], k=100)
        wlat = []
        for qid, text in qset[:20]:
            t1 = time.time()
            searcher.search_warm([(qid, text)], k=100)
            wlat.append((time.time() - t1) * 1000)
        wlat.sort()
        esample("bm25_warm_p95_ms", round(wlat[int(0.95 * len(wlat)) - 1], 2))
        searcher.close()

        # --- merged-list serving path (B5 consumer) ------------------------
        ms = MergedSearcher(spark, paths)
        t0 = time.time()
        ms.search(qset[:50], k=100)
        sample("merged_50q", time.time() - t0)
        mlat = []
        for qid, text in qset[:20]:
            t1 = time.time()
            ms.search([(qid, text)], k=100)
            mlat.append((time.time() - t1) * 1000)
        mlat.sort()
        esample("merged_warm_p95_ms", round(mlat[int(0.95 * len(mlat)) - 1], 2))

        # --- conjunctive (AND) path over the same index ---------------------
        sa = SegmentSearcher(spark, paths, persist=False)
        t0 = time.time()
        sa.search_and(qset[:50], k=100).collect()
        sample("bm25_and_50q", time.time() - t0)

        # --- positional index + phrase queries ------------------------------
        if p > 0:  # reset resume state (untimed) so every pass rebuilds
            man = read_manifest(paths)
            man["positions_segments"] = []
            _commit_manifest(paths, man)
            shutil.rmtree(os.path.join(paths.root, "positions"), ignore_errors=True)
        t0 = time.time()
        build_positions(spark, docs, paths)
        sample("positions_build", time.time() - t0)
        t0 = time.time()
        phrase_topk(spark, paths, phrases, k=100).write.format("noop").mode(
            "overwrite"
        ).save()
        sample("phrase_25q", time.time() - t0)

        # --- operator suite over the driver tables --------------------------
        qs = E.queries()
        for name in SUITE:
            t0 = time.time()
            qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            sample(name, time.time() - t0)

    # --- segment compaction (streaming-health op; mutates → once, last) ----
    from mtix_spark.index.compact import compact_segments

    t0 = time.time()
    compact_segments(spark, paths, small_docs=10**9, max_group=8)
    single["compact_segments"] = round(time.time() - t0, 3)
    shutil.rmtree(work, ignore_errors=True)

    # --- spark-submit deploy surface (VERDICT r3 #7): one timed smoke row
    # per entrypoint, so the way the engine actually ships to a cluster is
    # continuously proven, not just the in-process API. Tiny inputs — these
    # rows time JVM+session startup plus a real (small) job each. Disable
    # with MTIX_BENCH_SUBMIT=0 (e.g. when iterating locally).
    if os.environ.get("MTIX_BENCH_SUBMIT", "1") != "0":
        import subprocess

        repo = os.path.dirname(os.path.abspath(__file__))
        submit = shutil.which("spark-submit")
        if submit:
            swork = tempfile.mkdtemp(prefix="mtix_submit_")
            synth_corpus(spark, 500).write.parquet(f"{swork}/corpus")
            with open(f"{swork}/queries.json", "w") as f:
                json.dump([[q, t] for q, t in qset[:10]], f)
            env = dict(os.environ, PYTHONPATH=repo)
            common = [submit, "--master", "local[8]", "--driver-memory", "8g"]

            def run_submit(name: str, argv: list[str]) -> None:
                t0 = time.time()
                r = subprocess.run(
                    common + argv, env=env, capture_output=True, text=True
                )
                if r.returncode != 0:
                    sys.stderr.write(r.stderr[-2000:])
                    raise RuntimeError(f"{name} failed rc={r.returncode}")
                single[name] = round(time.time() - t0, 3)

            run_submit(
                "submit_build",
                [f"{repo}/scripts/build_index_submit.py",
                 "--input", f"{swork}/corpus", "--output", f"{swork}/idx",
                 "--segments", "8"],
            )
            run_submit(
                "submit_query",
                [f"{repo}/scripts/query_submit.py",
                 "--index", f"{swork}/idx",
                 "--queries", f"{swork}/queries.json", "--k", "50"],
            )
            run_submit(
                "submit_stream",
                [f"{repo}/scripts/stream_ingest_submit.py",
                 "--input", f"{swork}/corpus",
                 "--index", f"{swork}/sidx",
                 "--checkpoint", f"{swork}/ckpt"],
            )
            shutil.rmtree(swork, ignore_errors=True)

    timings = dict(single)
    spread: dict[str, float] = {}
    for name, xs in multi.items():
        med = statistics.median(xs)
        timings[name] = round(med, 3)
        if len(xs) > 1 and med > 0:
            spread[name] = round((max(xs) - min(xs)) / med, 3)
    for name, xs in extra_samples.items():
        extra[name] = round(statistics.median(xs), 2)

    total = round(sum(timings.values()), 3)
    extra["wall_sec"] = round(time.time() - wall0, 1)
    print(
        json.dumps(
            {
                "metric": "index-build + BM25 query set + operator suite "
                f"(median of {passes} interleaved passes)",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "passes": passes,
                "single_pass": sorted(single),
                "spread": spread,
                "extra": extra,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
