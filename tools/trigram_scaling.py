"""Trigram grep scaling campaign — the north-rule N-vs-4N evidence for the
round-5 substring/regex path (index.trigram), same protocol as
tools/scaling_campaign.py: identical job (fixed 32 input parts, 32 trigram
segments, 32 shuffle partitions) at local[LO] and local[HI], each cycle
bracketed by pure-CPU hardware probes, one JSON line per cycle.

Per run it measures
  - trigram index build throughput (docs/sec), and
  - grep query throughput (a fixed 60-query batch: 40 substring needles
    cut deterministically from the corpus, 10 case-insensitive, 10
    regexes incl. one verify-scan fallback), plus
  - a result sha over the sorted (query_id, doc_id, n_occ) rows — the
    rank-identity criterion across parallelism.

Usage:
  python tools/trigram_scaling.py [n_docs] [--levels 1,4] [--cycles 8]
      [--out /tmp/trigram_runs.jsonl]
  python tools/trigram_scaling.py --analyze /tmp/trigram_runs.jsonl
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
import hashlib, json, sys, time
sys.path.insert(0, "/root/repo")
from mtix_spark.session import get_spark
from mtix_spark.index.trigram import (
    TrigramPaths, build_trigram_index, grep_regex, grep_substring)

mode, cpus, corpus_dir, tri_dir, n_build = (
    sys.argv[1], int(sys.argv[2]), sys.argv[3], sys.argv[4], int(sys.argv[5]))
spark = get_spark(f"triscal{cpus}", master=f"local[{cpus}]", shuffle_partitions=32)

if mode == "build":
    # timed build over the first n_build docs — identical job shape (32
    # input parts, 32 segments) at every parallelism level
    import pyspark.sql.functions as Fn
    docs = (spark.read.parquet(corpus_dir)
            .filter(Fn.col("doc_id") < n_build).repartition(32))
    t0 = time.time()
    build_trigram_index(spark, docs, tri_dir, n_segments=32)
    build_s = time.time() - t0
    print("RESULT " + json.dumps({
        "cpus": cpus, "build_s": round(build_s, 2),
        "docs_per_sec": round(n_build / build_s, 1),
    }))
    spark.stop(); raise SystemExit

# mode == "query": timed grep batch against the PREBUILT full-corpus index
# (built once, untimed — query scaling is measured on its own axis, the
# same separation as tools/query_scaling.py for the BM25 engine)
paths = TrigramPaths(tri_dir)
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
regs.append((299, "the|[0-9]{9}"))  # literal-free branch: verify-scan fallback

base = docs.select("doc_id", "content")
# result signature stays DISTRIBUTED (order-insensitive bit_xor of row
# hashes + count): collecting ~1e5 hit rows would time driver
# serialization, not the engine, and mask the scaling under test
import pyspark.sql.functions as Fn

def sig(df):
    r = df.agg(
        Fn.bit_xor(Fn.xxhash64(*df.columns)).alias("x"),
        Fn.count("*").alias("n"),
    ).collect()[0]
    return (int(r["x"] or 0), int(r["n"]))

sig(grep_substring(spark, paths, base, subs[:2]))  # warm: JVM+py workers
t0 = time.time()
s1 = sig(grep_substring(spark, paths, base, subs))
s2 = sig(grep_substring(spark, paths, base, icase, case_insensitive=True))
s3 = sig(grep_regex(spark, paths, base, regs))
query_s = time.time() - t0

rh = hashlib.sha256(json.dumps([s1, s2, s3]).encode()).hexdigest()
print("RESULT " + json.dumps({
    "cpus": cpus,
    "query_batch_s": round(query_s, 2),
    "queries_per_sec": round((len(subs) + len(icase) + len(regs)) / query_s, 2),
    "n_hits": s1[1] + s2[1] + s3[1], "result_sha": rh,
}))
spark.stop()
"""


def run_one(mode: str, cpus: int, corpus_dir: str, tri_dir: str, n_build: int) -> dict:
    out = subprocess.run(
        [sys.executable, "-c", WORKER, mode, str(cpus), corpus_dir, tri_dir,
         str(n_build)],
        capture_output=True, text=True, timeout=3600,
    )
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(
        f"worker {mode} local[{cpus}] failed:\n{out.stdout[-2000:]}\n{out.stderr[-2000:]}"
    )


def analyze(path: str, hw_floor: float = 0.85) -> dict:
    cycles = [json.loads(l) for l in open(path) if l.strip()]
    if not cycles:
        return {"cycles": 0}
    ratio = cycles[0]["hi_b"]["cpus"] / cycles[0]["lo_b"]["cpus"]
    for c in cycles:
        c["hw_eff"] = (c["hw_hi"] / c["hw_lo"]) / ratio
        c["eff_build"] = (
            c["hi_b"]["docs_per_sec"] / c["lo_b"]["docs_per_sec"]
        ) / ratio
        c["eff_query"] = (
            c["hi_q"]["queries_per_sec"] / c["lo_q"]["queries_per_sec"]
        ) / ratio
    good = [c for c in cycles if c["hw_eff"] >= hw_floor]
    med = lambda xs: round(statistics.median(xs), 3) if xs else None
    return {
        "cycles": len(cycles),
        "ratio": ratio,
        "rank_identical_all": len({
            r["result_sha"] for c in cycles for r in (c["lo_q"], c["hi_q"])
        }) == 1,
        "all": {
            "hw_eff_median": med([c["hw_eff"] for c in cycles]),
            "eff_build_median": med([c["eff_build"] for c in cycles]),
            "eff_query_median": med([c["eff_query"] for c in cycles]),
            "eff_build_hw_normalized_median": med(
                [c["eff_build"] / c["hw_eff"] for c in cycles]
            ),
            "eff_query_hw_normalized_median": med(
                [c["eff_query"] / c["hw_eff"] for c in cycles]
            ),
        },
        "hw_ok": {
            "n": len(good),
            "hw_floor": hw_floor,
            "eff_build_median": med([c["eff_build"] for c in good]),
            "eff_query_median": med([c["eff_query"] for c in good]),
        },
    }


def main() -> None:
    if "--analyze" in sys.argv:
        print(json.dumps(analyze(sys.argv[sys.argv.index("--analyze") + 1]), indent=1))
        return
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 and sys.argv[1].isdigit() else 30000
    lo, hi = 1, 4
    if "--levels" in sys.argv:
        lo, hi = (int(x) for x in sys.argv[sys.argv.index("--levels") + 1].split(","))
    cycles = 8
    if "--cycles" in sys.argv:
        cycles = int(sys.argv[sys.argv.index("--cycles") + 1])
    out_path = "/tmp/trigram_runs.jsonl"
    if "--out" in sys.argv:
        out_path = sys.argv[sys.argv.index("--out") + 1]

    n_build = 8000
    if "--build-docs" in sys.argv:
        n_build = int(sys.argv[sys.argv.index("--build-docs") + 1])

    work = tempfile.mkdtemp(prefix="mtix_triscal_corpus_")
    # full query corpus + its index are prepared ONCE (untimed, local[32]);
    # the timed build axis uses the first n_build docs of the same corpus
    subprocess.run(
        [
            sys.executable, "-c",
            "import sys; sys.path.insert(0,'/root/repo');"
            "from mtix_spark.session import get_spark;"
            "from mtix_spark.corpus import synth_corpus;"
            "from mtix_spark.index.build import assign_doc_ids;"
            "from mtix_spark.index.trigram import build_trigram_index;"
            f"s=get_spark('gen',master='local[32]');"
            f"d=assign_doc_ids(synth_corpus(s,{n_docs}), 32);"
            f"d.write.parquet('{work}/corpus');"
            f"build_trigram_index(s, s.read.parquet('{work}/corpus'),"
            f" '{work}/tri', n_segments=32); s.stop()",
        ],
        check=True, capture_output=True, timeout=2400,
    )
    for i in range(cycles):
        hw_lo = _hw_probe(lo)
        lo_b = run_one(
            "build", lo, f"{work}/corpus",
            tempfile.mkdtemp(prefix=f"mtix_triscal_b{lo}_"), n_build,
        )
        lo_q = run_one("query", lo, f"{work}/corpus", f"{work}/tri", n_build)
        hi_b = run_one(
            "build", hi, f"{work}/corpus",
            tempfile.mkdtemp(prefix=f"mtix_triscal_b{hi}_"), n_build,
        )
        hi_q = run_one("query", hi, f"{work}/corpus", f"{work}/tri", n_build)
        hw_hi = _hw_probe(hi)
        line = {
            "cycle": i, "ts": round(time.time(), 1),
            "n_docs": n_docs, "n_build": n_build,
            "hw_lo": round(hw_lo, 1), "hw_hi": round(hw_hi, 1),
            "lo_b": lo_b, "lo_q": lo_q, "hi_b": hi_b, "hi_q": hi_q,
        }
        with open(out_path, "a") as f:
            f.write(json.dumps(line) + "\n")
        print(json.dumps(line), flush=True)
    print(json.dumps(analyze(out_path), indent=1))


if __name__ == "__main__":
    main()
