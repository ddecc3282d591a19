"""One-off diagnostic: which stage of the icase grep is serial at local[4]?

Times, at one parallelism level:
  d1  postings-read partition count for the icase gram set
  d2  candidates-only count for the icase classes
  d3  full icase grep (n_occ on)
  d4  icase grep without n_occ
  d5  icase grep with the decoded-postings read repartitioned first

Usage: python tools/tri_icase_diag.py <cpus> <corpus_dir> <tri_dir>
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
    extra = {}
    if "--no-coalesce" in sys.argv:
        extra["spark.sql.adaptive.coalescePartitions.enabled"] = "false"
    if "--small-splits" in sys.argv:
        extra["spark.sql.files.maxPartitionBytes"] = str(8 * 1024 * 1024)
    spark = get_spark(f"tridiag{cpus}", master=f"local[{cpus}]",
                      shuffle_partitions=32, extra_conf=extra)
    paths = T.TrigramPaths(tri_dir)
    docs = spark.read.parquet(corpus_dir)
    rows = docs.orderBy("doc_id").limit(50).collect()
    icase = []
    for i, r in enumerate(rows[40:50]):
        t = r["content"]
        icase.append((100 + i, t[5:17].swapcase()))
    base = docs.select("doc_id", "content")

    def sig(df):
        r = df.agg(
            F.bit_xor(F.xxhash64(*df.columns)).alias("x"),
            F.count("*").alias("n"),
        ).collect()[0]
        return (int(r["x"] or 0), int(r["n"]))

    out = {"cpus": cpus}
    sig(T.grep_substring(spark, paths, base, icase[:1],
                         case_insensitive=True))  # warm

    needles = [(q, s.lower()) for q, s in icase]
    classes = [
        (q, 0, i, T._case_variants(g))
        for q, s in needles
        for i, g in enumerate(T._grams_of(s))
    ]
    picked, dead, _bound = T._select_rarest_classes(spark, paths, classes)
    grams = sorted({v for _, _, _, v in picked})
    out["n_grams_selected"] = len(grams)
    reads = spark.read.parquet(paths.postings).filter(
        F.col("gram").isin(grams))
    out["postings_read_parts"] = reads.rdd.getNumPartitions()
    out["postings_rows_matched"] = reads.count()

    t0 = time.time()
    n = T._candidates_classes(spark, paths, classes)[0].count()
    out["d2_candidates_s"] = round(time.time() - t0, 2)
    out["n_cand_icase"] = int(n)

    t0 = time.time()
    sig(T.grep_substring(spark, paths, base, icase, case_insensitive=True))
    out["d3_full_s"] = round(time.time() - t0, 2)

    t0 = time.time()
    sig(T.grep_substring(spark, paths, base, icase, case_insensitive=True,
                         count_occurrences=False))
    out["d4_no_nocc_s"] = round(time.time() - t0, 2)

    print("DIAG " + json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
