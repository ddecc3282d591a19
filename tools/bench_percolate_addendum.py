"""Round-5 addendum bench: the 2 percolator SUITE entries, same protocol as
bench.py's full-suite run (sf0.1 / local[SPARK_GRAFT_CPUS], 3 interleaved
pass-major passes, per-entry median + spread, noop sink) — run separately
because `tools/bench_r5.json` was captured before `mtix_spark.percolate`
landed (same convention as tools/bench_trigram_addendum.py).

Usage: python tools/bench_percolate_addendum.py [--out tools/bench_r5_percolate.json]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")

import __spark_entry__ as E  # noqa: E402
from mtix_spark.session import get_spark  # noqa: E402

ENTRIES = ["percolate_terms", "percolate_phrase"]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    passes = max(1, int(os.environ.get("MTIX_BENCH_PASSES", "3")))
    out = "tools/bench_r5_percolate.json"
    if "--out" in sys.argv:
        out = sys.argv[sys.argv.index("--out") + 1]

    spark = get_spark("mtix_bench_perc", master=f"local[{cpus}]",
                      shuffle_partitions=cpus)
    qs = E.queries()
    samples: dict[str, list[float]] = {e: [] for e in ENTRIES}
    for p in range(passes):
        for name in ENTRIES:
            t0 = time.time()
            qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            samples[name].append(round(time.time() - t0, 3))
        print(f"pass {p}: " + json.dumps({e: samples[e][-1] for e in ENTRIES}),
              flush=True)

    def spread(xs: list[float]) -> float:
        m = statistics.median(xs)
        return round((max(xs) - min(xs)) / m, 3) if m else 0.0

    line = {
        "metric": "percolate_suite_sec",
        "sf": sf_dir,
        "cpus": cpus,
        "passes": passes,
        "queries": {e: round(statistics.median(samples[e]), 3) for e in ENTRIES},
        "spread": {e: spread(samples[e]) for e in ENTRIES},
        "samples": samples,
    }
    with open(out, "w") as f:
        f.write(json.dumps(line) + "\n")
    print(json.dumps(line))
    spark.stop()


if __name__ == "__main__":
    main()
