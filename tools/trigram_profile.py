"""Phase-level profile of the trigram grep query batch — finds the serial
fraction behind the N-vs-4N campaign's query efficiency reading.

Replays tools/trigram_scaling.py's exact 60-query batch against an existing
campaign corpus+index, but times each component separately at one
parallelism level:

  dict_job     — the per-call dictionary selection (read+isin+collect)
  subs / icase / regex — each sig(grep_*) call end-to-end
  fallback_scan — the literal-free regex verify scan alone
  verify_join  — candidates->content join + contains, minus posting decode

Usage:
  python tools/trigram_profile.py <cpus> <corpus_dir> <tri_dir>
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

import pyspark.sql.functions as F  # noqa: E402

from mtix_spark.session import get_spark  # noqa: E402
from mtix_spark.index import trigram as T  # noqa: E402


def main() -> None:
    cpus, corpus_dir, tri_dir = int(sys.argv[1]), sys.argv[2], sys.argv[3]
    spark = get_spark(f"triprof{cpus}", master=f"local[{cpus}]",
                      shuffle_partitions=32)
    paths = T.TrigramPaths(tri_dir)
    docs = spark.read.parquet(corpus_dir)
    rows = docs.orderBy("doc_id").limit(50).collect()
    subs, icase, regs = [], [], []
    for i, r in enumerate(rows[:40]):
        t = r["content"]
        j = (7 * i) % max(1, len(t) - 20)
        subs.append((i, t[j : j + 12]))
    for i, r in enumerate(rows[40:50]):
        t = r["content"]
        icase.append((100 + i, t[5:17].swapcase()))
    for i, r in enumerate(rows[:9]):
        w = r["content"].split()
        regs.append((200 + i, f"{w[0]} [A-Za-z0-9_]+ {w[2]}"))
    regs.append((299, "the|[0-9]{9}"))

    base = docs.select("doc_id", "content")

    def sig(df):
        r = df.agg(
            F.bit_xor(F.xxhash64(*df.columns)).alias("x"),
            F.count("*").alias("n"),
        ).collect()[0]
        return (int(r["x"] or 0), int(r["n"]))

    out: dict[str, float] = {"cpus": cpus}

    # warm JVM + python workers, same as the campaign
    sig(T.grep_substring(spark, paths, base, subs[:2]))

    # 1. dictionary job alone (exactly what _select_rarest_classes runs)
    classes = [
        (q, 0, i, [g])
        for q, s in subs
        for i, g in enumerate(T._grams_of(s))
    ]
    t0 = time.time()
    picked, dead, _bound = T._select_rarest_classes(spark, paths, classes)
    out["dict_job_s"] = round(time.time() - t0, 2)
    out["n_classes"] = len(classes)
    out["n_picked"] = len(picked)

    # 2. candidates only (postings decode + AND), no content verify
    t0 = time.time()
    cand, _cb = T._candidates_classes(spark, paths, classes)
    n_cand = cand.count()
    out["candidates_s"] = round(time.time() - t0, 2)
    out["n_cand"] = int(n_cand)

    # 3. full calls, one at a time
    for name, fn in (
        ("subs", lambda: sig(T.grep_substring(spark, paths, base, subs))),
        ("icase", lambda: sig(T.grep_substring(
            spark, paths, base, icase, case_insensitive=True))),
        ("regex", lambda: sig(T.grep_regex(spark, paths, base, regs))),
    ):
        t0 = time.time()
        s = fn()
        out[f"{name}_s"] = round(time.time() - t0, 2)
        out[f"{name}_hits"] = s[1]

    # 4. the literal-free fallback scan alone
    t0 = time.time()
    sig(T.grep_regex(spark, paths, base, [(299, "the|[0-9]{9}")]))
    out["fallback_scan_s"] = round(time.time() - t0, 2)

    # 5. pure corpus contains-scan floor (no index): what a verify over
    # ALL docs costs, to bound the verify-join share
    ndf = spark.createDataFrame(subs, "query_id long, needle string")
    t0 = time.time()
    sig(
        base.crossJoin(F.broadcast(ndf))
        .filter(F.contains(F.col("content"), F.col("needle")))
        .select("query_id", "doc_id")
    )
    out["full_scan_floor_s"] = round(time.time() - t0, 2)

    print("PROFILE " + json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
