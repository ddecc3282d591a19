"""Data-size headroom for the CORE build + query path (complements
data_scaling.py, which covers the superlinear-risk auxiliary entries).

Question answered: as the corpus grows R× at fixed parallelism and fixed
SEGMENT SIZE (segment count tracks the data — the at-scale geometry), does
index-build wall grow ~linearly (files/sec holds) and does query-batch
cost grow by data touched rather than corpus size?

Protocol — the same discipline as the parallelism campaigns, because a
shared session poisons this measurement in BOTH directions (first-touch
JIT/page-cache made a pass-0 small build 8.6× slower than pass-1; a large
build warms the cache for whoever runs next): every (size, cycle) run is
a FRESH JVM that first performs an untimed 5k-doc warmup build (absorbs
JIT/first-touch uniformly), then times the real build scan→manifest and a
synth_queries batch through the segment engine (distributed noop sink).
Sizes interleave (S,L,S,L,…); per-size medians; exponent =
log(t_L/t_S)/log(R). Fixed per-JVM overhead that survives the warmup
biases the exponent DOWN (Amdahl: t = F + w·n), so a ~1.0 build exponent
under this protocol is not an artifact of the bias direction.

SEG_DOCS = 1,875 so the SMALL size already saturates local[32] (60k/1875
= 32 segment tasks): a core-starved small config would make the large
size look artificially efficient.

Usage: python tools/build_headroom.py [n_small] [--replicas 5]
           [--cycles 3] [--cpus 32] [--queries 1000]
           [--out tools/build_headroom_r5.json]
"""

from __future__ import annotations

import json
import math
import shutil
import statistics
import subprocess
import sys
import tempfile

sys.path.insert(0, "/root/repo")

SEG_DOCS = 1_875
WARMUP_DOCS = 5_000

WORKER = r"""
import json, shutil, sys, tempfile, time
sys.path.insert(0, "/root/repo")
from mtix_spark.session import get_spark
from mtix_spark.corpus import synth_queries
from mtix_spark.index.build import assign_doc_ids, build_index
from mtix_spark.index.search import SegmentSearcher

cpus = int(sys.argv[1]); corpus_dir = sys.argv[2]; warm_dir = sys.argv[3]
n = int(sys.argv[4]); seg_docs = int(sys.argv[5]); n_queries = int(sys.argv[6])
spark = get_spark(f"headroom{n}", master=f"local[{cpus}]", shuffle_partitions=cpus)
work = tempfile.mkdtemp(prefix="headroom_idx_")

# untimed warmup: absorbs JIT + codepath first-touch in THIS JVM
wdocs = assign_doc_ids(spark.read.parquet(warm_dir), cpus)
build_index(spark, wdocs, work + "/warm", n_segments=4)

t0 = time.time()
docs = assign_doc_ids(spark.read.parquet(corpus_dir), cpus)
paths = build_index(spark, docs, work + "/idx", n_segments=-(-n // seg_docs))
build_s = time.time() - t0

qset = [(q, t) for q, t, _ in synth_queries(spark, n_queries).collect()]
searcher = SegmentSearcher(spark, paths)
searcher.search(qset[:2], k=10).collect()
t0 = time.time()
searcher.search(qset, k=100).write.format("noop").mode("overwrite").save()
query_s = time.time() - t0
shutil.rmtree(work, ignore_errors=True)
print("RESULT " + json.dumps({"n": n, "build_s": round(build_s, 2),
                              "files_per_sec": round(n / build_s, 1),
                              "query_s": round(query_s, 2)}))
spark.stop()
"""


def _int(flag: str, default: int) -> int:
    return int(sys.argv[sys.argv.index(flag) + 1]) if flag in sys.argv else default


def run_one(cpus: int, corpus_dir: str, warm_dir: str, n: int, n_queries: int) -> dict:
    p = subprocess.run(
        [sys.executable, "-c", WORKER, str(cpus), corpus_dir, warm_dir,
         str(n), str(SEG_DOCS), str(n_queries)],
        capture_output=True, text=True, timeout=3600,
    )
    for line in p.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(p.stderr[-2000:])


def main() -> None:
    n_small = int(sys.argv[1]) if len(sys.argv) > 1 and sys.argv[1].isdigit() else 60_000
    r = _int("--replicas", 5)
    cycles = _int("--cycles", 3)
    cpus = _int("--cpus", 32)
    n_queries = _int("--queries", 1000)
    out_path = (
        sys.argv[sys.argv.index("--out") + 1]
        if "--out" in sys.argv
        else "tools/build_headroom_r5.json"
    )
    sizes = [n_small, n_small * r]

    from mtix_spark.corpus import synth_corpus
    from mtix_spark.session import get_spark

    spark = get_spark("headroom_gen", master="local[8]", shuffle_partitions=32)
    work = tempfile.mkdtemp(prefix="mtix_headroom_")
    dirs = {}
    for n in sizes + [WARMUP_DOCS]:
        d = f"{work}/corpus_{n}"
        synth_corpus(spark, n).write.parquet(d)
        dirs[n] = d
    spark.stop()

    samples: dict[int, list[dict]] = {n: [] for n in sizes}
    for c in range(cycles):
        for n in sizes:
            rec = run_one(cpus, dirs[n], dirs[WARMUP_DOCS], n, n_queries)
            samples[n].append(rec)
            print(f"cycle {c} n={n}: build {rec['build_s']}s "
                  f"({rec['files_per_sec']} f/s) query {rec['query_s']}s",
                  file=sys.stderr)

    def med(n, k):
        return statistics.median(x[k] for x in samples[n])

    s, L = sizes
    rep = {
        "n_small": s, "n_large": L, "cycles": cycles, "cpus": cpus,
        "n_queries": n_queries, "seg_docs": SEG_DOCS,
        "warmup_docs": WARMUP_DOCS, "fresh_jvm_per_run": True,
        "samples": {str(n): samples[n] for n in sizes},
        "files_per_sec": {str(n): round(n / med(n, "build_s"), 1) for n in sizes},
        "build_exponent": round(
            math.log(med(L, "build_s") / med(s, "build_s")) / math.log(r), 3
        ),
        "query_exponent": round(
            math.log(med(L, "query_s") / med(s, "query_s")) / math.log(r), 3
        ),
    }
    shutil.rmtree(work, ignore_errors=True)
    with open(out_path, "w") as f:
        f.write(json.dumps(rep) + "\n")
    print(json.dumps(rep))


if __name__ == "__main__":
    main()
