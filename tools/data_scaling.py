"""Data-size scaling curve for the superlinear-risk entries (VERDICT r4 #4).

The campaigns (scaling_campaign.py / query_scaling.py) prove the
PARALLELISM axis of the north rule; this tool covers the other axis the
evidence didn't yet: wall-time growth as ROWS grow at fixed parallelism,
for the entries whose algorithms could plausibly go superlinear —
iterative connected components (`dedup_clusters_star`), the gram-dictionary
span miner (`duplicate_spans`), banded MinHash (`minhash_lsh`), and the
positional index build (`positions_build`).

Construction (documents entries): the small size is the sf dir's
`documents` table as-is (N rows); the large size is R disjoint replicas
(default R=5): replica i remaps doc_id += i*N and suffixes every token
with `_ri`, so each replica preserves the original's internal
duplicate/shingle structure while replicas share no vocabulary — the
pair/cluster/island workload grows exactly linearly in R by construction
(pairs_large == R * pairs_small, asserted), and any superlinear wall
growth is the algorithm's, not the data's. `positions_build` instead runs
over synth_corpus(n) vs synth_corpus(R*n) (its natural input), with
SEG_SIZE HELD CONSTANT across sizes (n_segments = 8 vs 8*R): more data
means more segments of the same size — the engine's actual scale
geometry — not R-times-fatter segment tasks. (The first r5 run pinned
n_segments=8 at both sizes and measured exponent 1.28: a whole segment is
one applyInPandas task, so 5x-bigger segments mean 5x the per-task object
count and the Python-side alloc/GC cost grows superlinearly. That is a
property of letting seg_size grow with the corpus, which no at-scale
deployment does; --fixed-geometry reproduces it.)

Protocol: the host drifts, so sizes run interleaved
(small,large,small,large,...) and the per-(entry,size) MEDIAN is used;
exponent = log(t_L/t_S) / log(R). Linear algorithms land near 1.0 (CC may
add a log factor); anything well above ~1.2 at R=5 is a finding.

Usage: python tools/data_scaling.py [sf_dir] [--replicas 5] [--passes 3]
           [--cpus 8] [--pos-docs 15000] [--entries a,b,...]
           [--fixed-geometry]
"""

from __future__ import annotations

import json
import math
import os
import shutil
import statistics
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

import __spark_entry__ as E  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from mtix_spark.session import get_spark  # noqa: E402

DOC_ENTRIES = ["minhash_lsh", "duplicate_spans", "dedup_clusters_star"]


def _arg(flag: str, default: int) -> int:
    return int(sys.argv[sys.argv.index(flag) + 1]) if flag in sys.argv else default


def replicate(docs, replicas: int, n_rows: int):
    """R disjoint replicas: doc_id-shifted, vocabulary-salted (token suffix
    _ri keeps tokens inside the [a-z0-9_] tokenizer class, so shingle and
    gram structure is preserved per replica and disjoint across replicas)."""
    parts = [docs]
    for i in range(1, replicas):
        parts.append(
            docs.select(
                (F.col("doc_id") + i * n_rows).alias("doc_id"),
                F.regexp_replace("text", r"([a-z0-9_]+)", f"$1_r{i}").alias("text"),
                "lang",
                "source",
                "n_chars",
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 and not sys.argv[1].startswith("--") \
        else "/root/testdata/sf0.1"
    replicas = _arg("--replicas", 5)
    passes = _arg("--passes", 3)
    cpus = _arg("--cpus", 8)
    pos_docs = _arg("--pos-docs", 15_000)
    fixed_geometry = "--fixed-geometry" in sys.argv
    if "--entries" in sys.argv:
        wanted = sys.argv[sys.argv.index("--entries") + 1].split(",")
    else:
        wanted = DOC_ENTRIES + ["positions_build"]
    doc_entries = [e for e in DOC_ENTRIES if e in wanted]
    run_positions = "positions_build" in wanted

    spark = get_spark("data_scaling", master=f"local[{cpus}]", shuffle_partitions=cpus)
    work = tempfile.mkdtemp(prefix="mtix_dscale_")
    small_dir, large_dir = f"{work}/small", f"{work}/large"
    os.makedirs(small_dir)
    os.makedirs(large_dir)

    qs = E.queries()
    n = p_small = p_large = None
    if doc_entries:
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        n = docs.count()
        docs.write.parquet(f"{small_dir}/documents.parquet")
        replicate(docs, replicas, n).write.parquet(
            f"{large_dir}/documents.parquet"
        )

        # workload-linearity guard: the construction must grow the pair count
        # ~linearly in R, else the exponent measures the data, not the code.
        # Not exactly R× — banding is signature-dependent and the salted vocab
        # hashes differently per replica — so ±10% of R× is the guard, and the
        # measured ratio is recorded in the output.
        p_small = qs["minhash_lsh"](spark, small_dir).count()
        p_large = qs["minhash_lsh"](spark, large_dir).count()
        assert 0.9 * replicas <= p_large / p_small <= 1.1 * replicas, \
            (p_small, p_large)

    # positional-build inputs: one index per size (untimed), positions
    # rebuilt per pass (same reset discipline as bench.py)
    from mtix_spark.corpus import synth_corpus
    from mtix_spark.index.build import (
        IndexPaths,
        _commit_manifest,
        assign_doc_ids,
        build_index,
        read_manifest,
    )
    from mtix_spark.index.positions import build_positions

    pos = {}
    if run_positions:
        for size, nd, nseg in (
            ("small", pos_docs, 8),
            ("large", replicas * pos_docs, 8 if fixed_geometry else 8 * replicas),
        ):
            d = assign_doc_ids(synth_corpus(spark, nd), cpus)
            d = d.persist()
            paths = build_index(spark, d, f"{work}/idx_{size}", n_segments=nseg)
            pos[size] = (d, paths)

    samples: dict[tuple[str, str], list[float]] = {}

    def run(entry: str, size: str, sdir: str) -> None:
        t0 = time.time()
        qs[entry](spark, sdir).write.format("noop").mode("overwrite").save()
        samples.setdefault((entry, size), []).append(time.time() - t0)

    for p in range(passes):
        for size, sdir in (("small", small_dir), ("large", large_dir)):
            for entry in doc_entries:
                run(entry, size, sdir)
        for size in ("small", "large") if run_positions else ():
            d, paths = pos[size]
            if p > 0:
                man = read_manifest(paths)
                man["positions_segments"] = []
                _commit_manifest(paths, man)
                shutil.rmtree(os.path.join(paths.root, "positions"),
                              ignore_errors=True)
            t0 = time.time()
            build_positions(spark, d, paths)
            samples.setdefault(("positions_build", size), []).append(
                time.time() - t0
            )

    out = {"sf_dir": sf_dir, "n_small": n, "replicas": replicas,
           "passes": passes, "cpus": cpus, "pos_docs": pos_docs,
           "fixed_geometry": fixed_geometry,
           "pairs_small": p_small, "pairs_large": p_large, "entries": {}}
    for entry in doc_entries + (["positions_build"] if run_positions else []):
        ts = statistics.median(samples[(entry, "small")])
        tl = statistics.median(samples[(entry, "large")])
        out["entries"][entry] = {
            "t_small_s": round(ts, 2),
            "t_large_s": round(tl, 2),
            "ratio": round(tl / ts, 2),
            "exponent": round(math.log(tl / ts) / math.log(replicas), 3),
            "spread_small": round(
                (max(samples[(entry, "small")]) - min(samples[(entry, "small")]))
                / ts, 2),
            "spread_large": round(
                (max(samples[(entry, "large")]) - min(samples[(entry, "large")]))
                / tl, 2),
        }
    shutil.rmtree(work, ignore_errors=True)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
