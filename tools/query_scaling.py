"""Query-side scaling campaign: one index, many interleaved query-batch
runs at two parallelism levels.

The build campaign (scaling_campaign.py) showed query-batch efficiency is
Amdahl-limited at 500 queries (~4 s of fixed job overhead against ~10 s of
kernel work at local[1]); this harness measures the query path's actual
scaling with a batch large enough to amortize fixed costs. The index is
built ONCE (docIDs and postings are parallelism-invariant — tested), so
both levels query byte-identical data; each cycle runs lo and hi in fresh
JVMs bracketed by pure-CPU hardware probes, same variance protocol.

Usage: python tools/query_scaling.py [n_docs] [n_queries] [--levels 1,4]
           [--cycles 6] [--out /tmp/query_runs.jsonl]
       python tools/query_scaling.py --analyze /tmp/query_runs.jsonl
"""

from __future__ import annotations

import json
import statistics
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")
from tools.scaling_bench import _hw_probe  # noqa: E402

WORKER = r"""
import hashlib, json, shutil, sys, tempfile, time
sys.path.insert(0, "/root/repo")
from mtix_spark.session import get_spark
from mtix_spark.corpus import synth_queries
from mtix_spark.index.build import IndexPaths
from mtix_spark.index.search import SegmentSearcher

cpus, idx_dir, n_queries = int(sys.argv[1]), sys.argv[2], int(sys.argv[3])
spark = get_spark(f"qscal{cpus}", master=f"local[{cpus}]", shuffle_partitions=32)
qset = [(q, t) for q, t, _ in synth_queries(spark, n_queries).collect()]
searcher = SegmentSearcher(spark, IndexPaths(idx_dir))
# serving-node warm ritual: hot term dictionary + doclens cache primed —
# after this no batch pays a dictionary job (Lucene mmaps its term dict
# the same way)
searcher.preload_dictionary()
searcher.search(qset[:2], k=10).collect()
# the timed action is a DISTRIBUTED sink (parquet write), the cluster-shaped
# completion of a query batch — collect() would serialize every result row
# through the driver single-threaded and measure the driver, not the engine
sink_root = tempfile.mkdtemp(prefix=f"qsink{cpus}_")
sink = sink_root + "/out"
t0 = time.time()
searcher.search(qset, k=100).write.mode("overwrite").parquet(sink)
wall = time.time() - t0
rows = spark.read.parquet(sink).collect()  # untimed: rank-identity hash
result = sorted((r["query_id"], r["rank"], r["doc_id"], round(r["score"], 6)) for r in rows)
rh = hashlib.sha256(json.dumps(result).encode()).hexdigest()
shutil.rmtree(sink_root, ignore_errors=True)
print("RESULT " + json.dumps({
    "cpus": cpus, "query_s": round(wall, 2),
    "qps": round(len(qset) / wall, 1), "result_sha": rh,
}))
spark.stop()
"""


def run_q(cpus: int, idx_dir: str, n_queries: int) -> dict:
    out = subprocess.run(
        [sys.executable, "-c", WORKER, str(cpus), idx_dir, str(n_queries)],
        capture_output=True, text=True, timeout=3600,
    )
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(out.stdout[-1500:] + out.stderr[-1500:])


def analyze(path: str) -> None:
    runs = [json.loads(l) for l in open(path) if l.strip()]
    ratio = runs[0]["hi"]["cpus"] / runs[0]["lo"]["cpus"]
    effs = [(r["hi"]["qps"] / r["lo"]["qps"]) / ratio for r in runs]
    hw = [(r["hw_hi"] / r["hw_lo"]) / ratio for r in runs]
    print(json.dumps({
        "cycles": len(runs),
        "eff_query_median": round(statistics.median(effs), 3),
        "hw_eff_median": round(statistics.median(hw), 3),
        "lo_qps_median": statistics.median(r["lo"]["qps"] for r in runs),
        "hi_qps_median": statistics.median(r["hi"]["qps"] for r in runs),
        "rank_identical_all": len({r[s]["result_sha"] for r in runs for s in ("lo", "hi")}) == 1,
        "per_cycle": [round(e, 2) for e in effs],
    }, indent=1))


def main() -> None:
    if "--analyze" in sys.argv:
        analyze(sys.argv[sys.argv.index("--analyze") + 1])
        return
    args = [a for a in sys.argv[1:] if a.isdigit()]
    n_docs = int(args[0]) if args else 120_000
    n_queries = int(args[1]) if len(args) > 1 else 10_000
    lo, hi = 1, 4
    if "--levels" in sys.argv:
        lo, hi = (int(x) for x in sys.argv[sys.argv.index("--levels") + 1].split(","))
    cycles = 6
    if "--cycles" in sys.argv:
        cycles = int(sys.argv[sys.argv.index("--cycles") + 1])
    out_path = "/tmp/query_runs.jsonl"
    if "--out" in sys.argv:
        out_path = sys.argv[sys.argv.index("--out") + 1]

    work = tempfile.mkdtemp(prefix="mtix_qscal_")
    setup = subprocess.run(
        [
            sys.executable, "-c",
            "import sys; sys.path.insert(0,'/root/repo');"
            "from mtix_spark.session import get_spark;"
            "from mtix_spark.corpus import synth_corpus;"
            "from mtix_spark.index.build import assign_doc_ids, build_index;"
            f"s=get_spark('qgen',master='local[8]',shuffle_partitions=32);"
            f"docs=assign_doc_ids(synth_corpus(s,{n_docs}),32);"
            f"build_index(s, docs, '{work}/index', n_segments=32); s.stop()",
        ],
        capture_output=True, text=True, timeout=3600,
    )
    if setup.returncode != 0:
        raise RuntimeError(setup.stderr[-2000:])
    idx = f"{work}/index"

    for i in range(cycles):
        try:
            hw_lo = _hw_probe(lo)
            r_lo = run_q(lo, idx, n_queries)
            hw_hi = _hw_probe(hi)
            r_hi = run_q(hi, idx, n_queries)
        except Exception as e:
            print(f"cycle {i} failed: {e}", file=sys.stderr)
            continue
        rec = {"t": round(time.time(), 1), "hw_lo": round(hw_lo, 1),
               "hw_hi": round(hw_hi, 1), "lo": r_lo, "hi": r_hi}
        with open(out_path, "a") as f:
            f.write(json.dumps(rec) + "\n")
        eff = (r_hi["qps"] / r_lo["qps"]) / (hi / lo)
        print(f"cycle {i}: query eff {eff:.2f} "
              f"(hw {(hw_hi / hw_lo) / (hi / lo):.2f}) "
              f"lo {r_lo['qps']} hi {r_hi['qps']} qps", file=sys.stderr)


if __name__ == "__main__":
    main()
