"""Dump formatted physical plans of the headline queries → PLANS.md.

The point is auditability of the scale claims: PushedFilters / ReadSchema
on every parquet scan, BroadcastHashJoin where a dim or query relation is
small, WholeStageCodegen spans over the scalar math, and no unexpected
exchanges. Re-run after touching any operator; review the diff.
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

import __spark_entry__ as E  # noqa: E402
from mtix_spark.session import get_spark  # noqa: E402

SHOW = [
    "bm25_topk",           # term IN-filter pushdown + broadcast q/dfreq joins
    "tpch_q1",             # pushdown on l_shipdate + partial/final hash agg
    "dim_join_revenue",    # chained BroadcastHashJoins
    "knn_cosine",          # broadcast nested-loop over tiny query side
    "minhash_lsh",         # shuffle keys: (id, perm) agg + band-join
    "topn_per_key",        # window top-N
    "events_tumbling",     # tumbling window agg
    "tpch_q3",             # multi-join + TakeOrderedAndProject (ORDER BY+LIMIT)
    "rollup_counts",       # expand + partial/final agg
    "mti_pipeline",        # full parity chain: retrieval→fusion→threshold→topN→dim join
    "phrase_match",        # posexplode + chained adjacency self-joins
    "bm25_and_topk",       # conjunctive: hit-count HAVING over scored relation
    "bm25f_topk",          # multi-field union → single (term,doc) shuffle
    "boolean_search",      # BM25 + semi/anti filter joins (+must/-not/phrase)
    "contamination",       # probe shingles broadcast join (corpus never shuffles)
    "stratified_sample",   # CASE-folded rate filter pushed into the scan
    "tpch_q19",            # disjunctive predicate branches
    "wildcard_topk",       # vocabulary expansion broadcast → disjunctive BM25
    "fuzzy_topk",          # length-banded Levenshtein expansion join
    "lm_dirichlet_topk",   # matching-postings-only LM decomposition
    "near_match",          # per-term position lists band-joined by doc
    "more_like_this",      # source tf IN-filter → top-m tfidf → expanded BM25
    "regexp_topk",         # anchored-regex dictionary expansion (prefix-pruned)
    "range_topk",          # sargable term-range dictionary slice
    "suggest_topk",        # length-banded Levenshtein + (distance, df) ranking
    "span_near",           # greedy chain: n-1 join+min-agg rounds over positions
    "total_hits",          # postings-only count collectors (no scoring relations)
    "bm25_page2",          # cursor predicate on scored relation (no offset rescan)
    "pack_sequences",      # two-phase token prefix sum + broadcast offsets
    "training_order",      # md5 shard + per-shard window sort (never global)
    "tfidf_vectors",       # tf shuffle + broadcast df + per-doc norm agg
    "date_histogram",      # map-side partial agg facet
    "prf_metrics",         # distinct + semi-join + intersect counting
    "gopher_repetition",   # split-once tokenize, pure Column dup fractions
    "boilerplate_ngrams",  # split-once shingle explode + gram-keyed agg
    "pii_scrub",           # JVM regexp_replace chain (codegen span)
    "split_docs",          # Arrow 1→N chunking + token-count agg (r4)
    "duplicate_spans",     # gram count-distinct + LEFT SEMI + islands window (r4)
    "scrub_spans",         # span lists per doc + positional lambda filter (r4)
    "hybrid_rrf",          # leg union → one (query,doc) agg → per-query window (r4)
    "function_score",      # boost join AFTER full-set scoring, rank on boosted (r4)
    "min_match",           # HAVING match-count over the disjunctive agg (r4)
    "dis_max",             # max+tie-sum aggregate over the contribution relation (r4)
    "rescore",             # window-confined second-pass join (LM only sees top-W) (r4)
    "significant_terms",   # fg-flag folded single agg + TakeOrderedAndProject (r4)
    "multi_match_best",    # per-field BM25 legs unioned → one (query,doc) agg (r4)
    "grep_substring",      # rarest-gram IN-pushed postings AND → verify join (r5)
    "grep_regex",          # mandatory-literal gram classes → candidate regexp scan (r5)
    "percolate_terms",     # broadcast query-term join → one output-bounded agg (r5)
    "percolate_phrase",    # same + candidate-only token-stream verify (ReusedExchange) (r5)
    "ident_match",         # analyzer as Column exprs inside the standard pushed plan (r5b2)
    "multi_match_cross",   # per-field legs + broadcast blended-df dictionary → two-level agg (r5b2)
    "phrase_prefix",       # adjacency chain + broadcast capped prefix expansion (r5b2)
    "term_vectors",        # doc-id IN-pushed tf + broadcast semi-join-bounded df (r5b2)
    "decay_gauss",         # gauss factor join after full-set scoring (function_score shape) (r5b2)
    "completion_prefix",   # prefix scan of the (term, df) dictionary + per-prefix window (r5b2)
]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("plans", master="local[8]", shuffle_partitions=8)
    qs = E.queries()
    out = ["# PLANS — formatted physical plans of headline queries\n"]
    out.append(f"Generated by tools/explain_plans.py over {sf_dir}.\n")
    for name in SHOW:
        df = qs[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        out.append(f"\n## {name}\n\n```\n{plan}\n```\n")
    with open("PLANS.md", "w") as f:
        f.write("".join(out))
    spark.stop()
    print("wrote PLANS.md")


if __name__ == "__main__":
    main()
