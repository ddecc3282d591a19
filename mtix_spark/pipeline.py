"""mtix dataflow-parity operators over long-form "run" relations.

The reference's core IR is the run dict {q_id: {p_id: score}}
(/root/reference/src/mtix/predictors.py:34); here a run is a DataFrame
(q_id, p_id, score) and every stage is a Catalyst-planned operator:

- top_n_per_query   = A1/A2 (sorted(...)[:N], predictors.py:54,118)
- fuse_runs_avg     = J6 (average_top_results, utils.py:12-23)
- threshold_filter  = P3 (score >= 0.48, pipelines.py:54)
- format_predictions= S8/A3/J2/J3/F6 (MtiJsonResultsFormatter,
                      pipelines.py:47-64): threshold → desc sort →
                      dim joins → nested Indexing array
- attach_subheadings= stage-7 analog (predictors.py:161-218): per
                      (citation, descriptor) qualifier rows nested under
                      each descriptor, empty-qui sentinel dropped (P4)

Determinism: every sort carries the (score DESC, p_id ASC) tie-break that
SURVEY.md §2 fixes for the reference's insertion-ordered dicts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

SCORE_THRESHOLD = 0.48  # /root/reference/src/mtix/sagemaker_factory.py:38


def top_n_per_query(run: DataFrame, n: int, q_col: str = "q_id", p_col: str = "p_id",
                    s_col: str = "score") -> DataFrame:
    """A1/A2: per-query top-N by score desc, p_id asc. Window ranking —
    Spark plans a per-key partial top-N under AQE instead of a global sort."""
    w = Window.partitionBy(q_col).orderBy(F.desc(s_col), F.asc(p_col))
    return (
        run.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= n)
        .drop("__rn")
    )


def fuse_runs_avg(run1: DataFrame, run2: DataFrame, q_col: str = "q_id",
                  p_col: str = "p_id", s_col: str = "score") -> DataFrame:
    """J6: inner-join fusion, score = (s1+s2)/2 (utils.py:12-23 asserts
    run1 keys ⊆ run2 — inner-join semantics)."""
    r1 = run1.select(q_col, p_col, F.col(s_col).alias("__s1"))
    r2 = run2.select(q_col, p_col, F.col(s_col).alias("__s2"))
    return r1.join(r2, [q_col, p_col]).select(
        q_col, p_col, ((F.col("__s1") + F.col("__s2")) / 2.0).alias(s_col)
    )


def threshold_filter(run: DataFrame, threshold: float = SCORE_THRESHOLD,
                     s_col: str = "score") -> DataFrame:
    """P3: keep predictions with score >= threshold (pipelines.py:54)."""
    return run.filter(F.col(s_col) >= threshold)


def format_predictions(
    run: DataFrame,
    names: DataFrame,
    duis: DataFrame,
    threshold: float = SCORE_THRESHOLD,
) -> DataFrame:
    """S8: nested MTI prediction docs (pipelines.py:47-64).

    run:   (q_id, p_id, score)
    names: (p_id, name)   — 30k-row dim → broadcast (J2)
    duis:  (p_id, dui)    — broadcast (J3)
    Returns (q_id, indexing) where indexing is the score-desc-sorted
    array<struct<term,type,id,im,reason>> (F6 reason string).
    """
    enriched = (
        threshold_filter(run, threshold)
        .join(F.broadcast(names), "p_id")
        .join(F.broadcast(duis), "p_id")
        .select(
            "q_id",
            "p_id",
            "score",
            F.col("name").alias("term"),
            F.lit("Descriptor").alias("type"),
            F.col("dui").alias("id"),
            F.lit("NO").alias("im"),
            F.format_string("score: %.3f", F.col("score")).alias("reason"),
        )
    )
    # sort_array on (-score, p_id) keys gives the deterministic desc order
    return enriched.groupBy("q_id").agg(
        F.transform(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        (-F.col("score")).alias("negscore"),
                        F.col("p_id").alias("pid"),
                        F.struct("term", "type", "id", "im", "reason").alias("item"),
                    )
                )
            ),
            lambda s: s["item"],
        ).alias("indexing")
    )


def attach_subheadings(
    predictions: DataFrame,
    quads: DataFrame,
    subheading_names: DataFrame,
    threshold: float = SCORE_THRESHOLD,
) -> DataFrame:
    """Stage-7 analog (predictors.py:161-218): nest per-(q,p) qualifier rows.

    predictions: (q_id, p_id)             — the formatted descriptor set
    quads:       (q_id, p_id, qui, score) — subheading scores; empty qui =
                 "no subheading" sentinel, dropped (P4, predictors.py:216)
    subheading_names: (qui, name)         — 75-row dim → broadcast (J4)
    Returns (q_id, p_id, subheadings) with subheadings sorted score desc,
    qui asc (A4) as array<struct<id,im,name,reason>>.
    """
    kept = (
        quads.filter(F.length(F.trim("qui")) > 0)
        .filter(F.col("score") >= threshold)
        .join(F.broadcast(subheading_names), "qui")
    )
    nested = kept.groupBy("q_id", "p_id").agg(
        F.transform(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        (-F.col("score")).alias("negscore"),
                        F.col("qui").alias("q"),
                        F.struct(
                            F.col("qui").alias("id"),
                            F.lit("NO").alias("im"),
                            F.col("name").alias("name"),
                            F.format_string("score: %.3f", F.col("score")).alias("reason"),
                        ).alias("item"),
                    )
                )
            ),
            lambda s: s["item"],
        ).alias("subheadings")
    )
    return predictions.join(nested, ["q_id", "p_id"], "left")


CRITICAL_SUBHEADINGS = [
    "diagnostic imaging", "adverse effects", "chemically induced",
    "complications", "diagnosis", "drug therapy", "etiology", "genetics",
    "epidemiology", "pharmacology", "prevention & control", "radiotherapy",
    "surgery", "therapeutic use", "therapy", "toxicity", "veterinary",
]  # integration_tests/data.py:89 — the reference's critical-qualifier list


def run_metrics(
    y_true: DataFrame,
    y_pred: DataFrame,
    keys: list[str],
    key_filter: tuple[str, list[str]] | None = None,
) -> DataFrame:
    """J8/J9/A6 (integration_tests/utils.py:8-38): precision/recall/F1 over
    distinct key tuples, ground truth restricted to predicted q_ids first.

    `key_filter=(col, values)` mirrors compute_metrics' `s_filter`
    (integration_tests/utils.py:20): triples whose `col` is non-empty and
    outside `values` drop from BOTH sides before counting; empty-string
    values (the reference's descriptor-only triples) always stay."""
    q = keys[0]
    # q_id restriction uses the UNFILTERED predictions (the reference takes
    # pred_pmids at citation level, before triple extraction/filtering)
    pred_qids = y_pred.select(q).distinct()
    if key_filter is not None:
        fcol, fvals = key_filter
        keep = (F.col(fcol) == "") | F.col(fcol).isin(list(fvals))
        y_true = y_true.filter(keep)
        y_pred = y_pred.filter(keep)
    t = y_true.select(*keys).distinct().join(pred_qids, q, "left_semi")
    p = y_pred.select(*keys).distinct()
    inter = t.intersect(p)
    eps = 1e-9
    n_t, n_p, n_i = t.count(), p.count(), inter.count()
    precision = n_i / (n_p + eps)
    recall = n_i / (n_t + eps)
    f1 = 2 * precision * recall / (precision + recall + eps)
    spark = y_true.sparkSession
    return spark.createDataFrame(
        [(float(precision), float(recall), float(f1), n_t, n_p, n_i)],
        "precision double, recall double, f1 double, n_true long, n_pred long, n_inter long",
    )
