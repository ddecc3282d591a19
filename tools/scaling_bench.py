"""Two-cluster-size scaling evidence (BASELINE.json:north_rule).

No real cluster exists in this sandbox, so the rule's N→4N criterion is
evidenced by running the IDENTICAL job (same input parquet, same
n_segments, same query set) at local[8] and local[32] and reporting
throughput at both plus scaling efficiency = (tp_32 / tp_8) / 4.

Also asserts the rank-identical criterion across parallelism: the top-k
(query_id, rank, doc_id, score) frames from both runs must be equal.

Each configuration runs in its own subprocess (fresh JVM) so executor
thread count, shuffle partitions, and memory pools are honestly reset.

Usage: python tools/scaling_bench.py [n_docs] [--out BENCH.md]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile

WORKER = r"""
import json, sys, time
sys.path.insert(0, "/root/repo")
from mtix_spark.session import get_spark
from mtix_spark.corpus import synth_queries
from mtix_spark.index.build import assign_doc_ids, build_index
from mtix_spark.index.search import SegmentSearcher

cpus, corpus_dir, idx_dir, n_docs = int(sys.argv[1]), sys.argv[2], sys.argv[3], int(sys.argv[4])
spark = get_spark(f"scal{cpus}", master=f"local[{cpus}]", shuffle_partitions=cpus)

t0 = time.time()
docs = assign_doc_ids(spark.read.parquet(corpus_dir), cpus)
paths = build_index(spark, docs, idx_dir, n_segments=32)  # fixed: identical job
build_s = time.time() - t0

qset = [(q, t) for q, t, _ in synth_queries(spark, 100).collect()]
searcher = SegmentSearcher(spark, paths)
searcher.search(qset[:2], k=10).collect()
t0 = time.time()
rows = searcher.search(qset, k=100).collect()
query_s = time.time() - t0
lat = []
for qid, text in qset[:20]:
    t1 = time.time()
    searcher.search([(qid, text)], k=100).collect()
    lat.append((time.time() - t1) * 1000)
lat.sort()

result = sorted((r["query_id"], r["rank"], r["doc_id"], round(r["score"], 6)) for r in rows)
import hashlib
rh = hashlib.sha256(json.dumps(result).encode()).hexdigest()
print("RESULT " + json.dumps({
    "cpus": cpus, "build_s": round(build_s, 2),
    "files_per_sec": round(n_docs / build_s, 1),
    "query_batch_s": round(query_s, 2),
    "queries_per_sec": round(100 / query_s, 1),
    "p95_ms": round(lat[int(0.95 * len(lat)) - 1], 1),
    "result_sha": rh,
}))
spark.stop()
"""


def run_one(cpus: int, corpus_dir: str, n_docs: int) -> dict:
    idx_dir = tempfile.mkdtemp(prefix=f"mtix_scal_{cpus}_")
    out = subprocess.run(
        [sys.executable, "-c", WORKER, str(cpus), corpus_dir, idx_dir, str(n_docs)],
        capture_output=True,
        text=True,
        timeout=3600,
    )
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(f"worker local[{cpus}] failed:\n{out.stdout[-2000:]}\n{out.stderr[-2000:]}")


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 and sys.argv[1].isdigit() else 15000
    out_md = "BENCH.md"
    if "--out" in sys.argv:
        out_md = sys.argv[sys.argv.index("--out") + 1]

    work = tempfile.mkdtemp(prefix="mtix_scal_corpus_")
    gen = subprocess.run(
        [
            sys.executable,
            "-c",
            "import sys; sys.path.insert(0,'/root/repo');"
            "from mtix_spark.session import get_spark;"
            "from mtix_spark.corpus import synth_corpus;"
            f"s=get_spark('gen',master='local[32]');"
            f"synth_corpus(s,{n_docs}).write.parquet('{work}/corpus'); s.stop()",
        ],
        capture_output=True,
        text=True,
        timeout=3600,
    )
    if gen.returncode != 0:
        raise RuntimeError(gen.stderr[-2000:])
    corpus = f"{work}/corpus"

    r8 = run_one(8, corpus, n_docs)
    r32 = run_one(32, corpus, n_docs)

    eff_build = (r32["files_per_sec"] / r8["files_per_sec"]) / 4
    eff_query = (r32["queries_per_sec"] / r8["queries_per_sec"]) / 4
    identical = r8["result_sha"] == r32["result_sha"]

    md = f"""# BENCH — scaling evidence (N vs 4N parallelism)

Same job, same input ({n_docs} synthetic source files, 32 segments,
100-query BM25 set), run at `local[8]` and `local[32]` in separate JVMs —
the sandbox stand-in for N and 4N executors (BASELINE.json:north_rule).

| | local[8] | local[32] | scaling efficiency (x4 cores) |
|---|---|---|---|
| index build (files/sec) | {r8["files_per_sec"]} | {r32["files_per_sec"]} | **{eff_build:.2f}** |
| index build wall (s) | {r8["build_s"]} | {r32["build_s"]} | |
| query batch (queries/sec) | {r8["queries_per_sec"]} | {r32["queries_per_sec"]} | **{eff_query:.2f}** |
| single-query p95 (ms) | {r8["p95_ms"]} | {r32["p95_ms"]} | |

Rank-identical top-k across parallelism: **{identical}**
(sha256 of the sorted (query_id, rank, doc_id, score@6dp) frame:
`{r8["result_sha"][:16]}…` at both sizes).

Target: efficiency ≥ 0.8 (north_rule). p95 at local[32] reflects
single-query scheduling overhead on an otherwise idle 32-thread pool;
batch throughput is the capacity metric.
"""
    with open(out_md, "w") as f:
        f.write(md)
    print(json.dumps({"r8": r8, "r32": r32, "eff_build": round(eff_build, 3),
                      "eff_query": round(eff_query, 3), "identical": identical}))


if __name__ == "__main__":
    main()
