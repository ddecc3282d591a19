"""Adversarial-skew benchmark (VERDICT r4 #5; SURVEY §7 "What's hard" #3).

Plants a corpus where ONE term appears in 50% of all documents (a Zipf
head far beyond the natural s≈1.1 tail the generator produces) and ONE
repo holds 50% of all files, then runs the full pipeline — docID
assignment → segment build → salted merge → query batch — on it and on
the uniform corpus of the same size, interleaved (the host drifts; only
same-pass comparisons are honest).

What it records:
- that the salted merge actually ENGAGES on the planted term: its
  (term, salt) sub-round fragment count > 1, recomputed from the segment
  postings with the exact salt expression merge_postings uses
  (seg * n_salt // n_segments over the segments that contain the term)
- the planted term's global df (≈ n/2) and merged-list integrity
- per-phase wall medians for uniform vs skew and their ratio — the
  acceptance bar is skew ≤ ~1.5× uniform (BENCH.md row)

The repo skew stresses assign_doc_ids' range partitioner (repo is the
leading sort key; repartitionByRange samples and splits WITHIN the mega
repo by path, so a 50% repo must not serialize one partition) and the
term skew stresses the merge (a df=n/2 term in one reducer is exactly
the hot-list bottleneck the salt rounds exist for).

Usage: python tools/skew_bench.py [n_docs] [--passes 3] [--cpus 8]
"""

from __future__ import annotations

import json
import shutil
import statistics
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from mtix_spark.corpus import synth_corpus, synth_queries  # noqa: E402
from mtix_spark.index.build import (  # noqa: E402
    assign_doc_ids,
    build_index,
    merge_postings,
)
from mtix_spark.index.search import SegmentSearcher  # noqa: E402
from mtix_spark.session import get_spark  # noqa: E402

HOT_TERM = "hotterm_skew"
MEGA_REPO = "megarepo"


def skew_corpus(base):
    """50% of docs gain the hot term (3 occurrences); 50% of files move
    into one mega repo. Both picks keyed off xxhash64(path) so the
    construction is deterministic and partition-invariant like the
    generator itself."""
    hot = F.pmod(F.xxhash64("path"), F.lit(2)) == 0
    mega = F.pmod(F.xxhash64("path", F.lit(7)), F.lit(2)) == 0
    return base.withColumn(
        "content",
        F.when(
            hot, F.concat_ws(" ", F.col("content"), F.lit(f"{HOT_TERM} {HOT_TERM} {HOT_TERM}"))
        ).otherwise(F.col("content")),
    ).withColumn(
        "repo", F.when(mega, F.lit(MEGA_REPO)).otherwise(F.col("repo"))
    )


def salt_evidence(spark, paths, n_salt: int) -> dict:
    """Recompute the hot-term sub-round geometry from the segment postings
    with merge_postings' own salt expression."""
    with open(paths.stats) as f:
        n_segments = json.load(f)["n_segments"]
    rows = (
        spark.read.parquet(paths.postings)
        .filter(F.col("term") == HOT_TERM)
        .withColumn("salt", (F.col("seg") * n_salt / F.lit(n_segments)).cast("int"))
        .agg(
            F.sum("df_seg").alias("df"),
            F.countDistinct("salt").alias("fragments"),
            F.countDistinct("seg").alias("segments"),
        )
        .collect()[0]
    )
    return {
        "hot_term_df": int(rows["df"] or 0),
        "sub_fragments": int(rows["fragments"] or 0),
        "segments_hit": int(rows["segments"] or 0),
    }


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 and not sys.argv[1].startswith("--") else 15_000
    passes = int(sys.argv[sys.argv.index("--passes") + 1]) if "--passes" in sys.argv else 3
    cpus = int(sys.argv[sys.argv.index("--cpus") + 1]) if "--cpus" in sys.argv else 8
    n_salt, hot_df = 8, max(50, n_docs // 4)

    spark = get_spark("skew_bench", master=f"local[{cpus}]", shuffle_partitions=cpus)
    work = tempfile.mkdtemp(prefix="mtix_skew_")
    base = synth_corpus(spark, n_docs)
    base.write.parquet(f"{work}/uniform")
    skew_corpus(base).write.parquet(f"{work}/skew")

    qset = [(q, t) for q, t, _ in synth_queries(spark, 50).collect()]
    hot_queries = qset + [(9001, HOT_TERM), (9002, f"{HOT_TERM} index_merge")]

    samples: dict[tuple[str, str], list[float]] = {}
    evidence = {}
    for p in range(passes):
        for variant in ("uniform", "skew"):
            idx = f"{work}/idx_{variant}_{p}"
            t0 = time.time()
            docs = assign_doc_ids(spark.read.parquet(f"{work}/{variant}"), cpus)
            paths = build_index(spark, docs, idx, n_segments=max(8, cpus))
            samples.setdefault(("build", variant), []).append(time.time() - t0)

            t0 = time.time()
            merge_postings(spark, paths, hot_df=hot_df, n_salt=n_salt)
            samples.setdefault(("merge", variant), []).append(time.time() - t0)

            s = SegmentSearcher(spark, paths)
            s.search(hot_queries[:2], k=10).collect()  # warm
            t0 = time.time()
            s.search(hot_queries, k=100).collect()
            samples.setdefault(("query", variant), []).append(time.time() - t0)
            s.close()

            if variant == "skew" and p == 0:
                evidence = salt_evidence(spark, paths, n_salt)
            shutil.rmtree(idx, ignore_errors=True)

    out = {
        "n_docs": n_docs, "passes": passes, "cpus": cpus,
        "n_salt": n_salt, "hot_df": hot_df,
        "salt_engaged": evidence.get("sub_fragments", 0) > 1,
        **evidence,
        "phases": {},
    }
    for phase in ("build", "merge", "query"):
        u = statistics.median(samples[(phase, "uniform")])
        s_ = statistics.median(samples[(phase, "skew")])
        out["phases"][phase] = {
            "uniform_s": round(u, 2),
            "skew_s": round(s_, 2),
            "ratio": round(s_ / u, 2),
        }
    shutil.rmtree(work, ignore_errors=True)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
