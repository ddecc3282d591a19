"""End-to-end pipeline assembly — the engine's analog of the reference's
`DescriptorPredictionPipeline` / `IndexingPipeline`
(/root/reference/src/mtix/pipelines.py:8-38).

One callable chains every stage the reference runs, each stage being the
already-tested operator from this package:

    parse (S4+S6) → sanitize (F3/F4) → query text (F1, P5)
    → retrieval (the replaced CNN stage: any `(q_id, text) → run` callable,
      typically the BM25 engine)                       [pipelines.py:19]
    → pointwise rerank top-100 + fuse (A1, J2, F9, J6)  [pipelines.py:20-21]
    → listwise rerank top-50 + fuse (A2, F2, F10, J6)   [pipelines.py:22-23]
    → threshold/format (P3, A3, J2/J3, F6, S8)          [pipelines.py:24-25]
    → subheadings (stage 7: fan-out, P4, A4, J4)        [pipelines.py:29-38]

Model slots take the adapter mounts from `mtix_spark.adapters` (injected
callables — local model, remote endpoint, or deterministic stubs). The
golden-output test (tests/test_pipelines_e2e.py) mirrors the reference's
integration fixture discipline
(/root/reference/src/mtix/integration_tests/test_pipelines.py:42-46).
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mtix_spark.adapters import score_lists, score_pairs, score_subheadings
from mtix_spark.functions.scalar import query_template, replace_brackets, sanitize_citation
from mtix_spark.pipeline import (
    SCORE_THRESHOLD,
    attach_subheadings,
    format_predictions,
    fuse_runs_avg,
    top_n_per_query,
)
from mtix_spark.sources.citations import parse_citations


def citation_queries(citations: DataFrame) -> DataFrame:
    """(q_id, text): the F1 query template over sanitized citations, with
    the P5 bracket rewrite applied to title and abstract first
    (predictors.py:26-29)."""
    fixed = citations.withColumn("title", replace_brackets("title")).withColumn(
        "abstract", replace_brackets("abstract")
    )
    return fixed.select(
        F.col("pmid").alias("q_id"),
        query_template("pub_year", "journal_title", "title", "abstract").alias("text"),
    )


def indexing_pipeline(
    spark: SparkSession,
    payloads: DataFrame,
    names: DataFrame,
    duis: DataFrame,
    subheading_names: DataFrame,
    retriever: Callable[[DataFrame], DataFrame],
    pointwise_model: Callable[[dict], list] | None = None,
    listwise_model: Callable[[dict], list] | None = None,
    subheading_model: Callable[[dict], list] | None = None,
    threshold: float = SCORE_THRESHOLD,
    pointwise_top_n: int = 100,
    listwise_top_n: int = 50,
) -> DataFrame:
    """Full IndexingPipeline parity chain.

    payloads:  (uid, data = base64(zlib(MedlineCitation XML)))
    names:     (p_id, name)  descriptor-name dim (J2)
    duis:      (p_id, dui)   descriptor-DUI dim (J3)
    subheading_names: (qui, name) dim (J4)
    retriever: (q_id, text) DataFrame → run (q_id, p_id, score) — the
               replaced candidate stage (top-100 contract, predictors.py:22-35)
    *_model:   adapter callables (None skips that rerank stage, keeping the
               previous run — useful for retrieval-only configurations)

    Returns (q_id, indexing) with nested, score-desc-sorted
    array<struct<term,type,id,im,reason,subheadings>>; pair with
    sources.citations.write_mti_json for the S8 sink.
    """
    citations = sanitize_citation(parse_citations(payloads)).persist()
    queries = citation_queries(citations).persist()
    run = retriever(queries)

    if pointwise_model is not None:
        top = top_n_per_query(run, pointwise_top_n)
        pairs = (
            top.join(queries, "q_id")
            .join(F.broadcast(names), "p_id")
            .select("q_id", "p_id", F.col("text").alias("query"), F.col("name").alias("passage"))
        )
        scored = score_pairs(pairs, pointwise_model).select(
            "q_id", "p_id", F.col("score")
        )
        run = fuse_runs_avg(scored, run)

    if listwise_model is not None:
        top = top_n_per_query(run, listwise_top_n)
        # F2: per-query passage list in (score desc, p_id asc) order, with a
        # leading "|" on the query (predictors.py:122-129)
        ordered = top.join(F.broadcast(names), "p_id").groupBy("q_id").agg(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.struct(
                            (-F.col("score")).alias("negscore"),
                            F.col("p_id").alias("pid"),
                            F.struct(F.col("p_id").alias("p"), F.col("name").alias("n")).alias("it"),
                        )
                    )
                ),
                lambda s: s["it"],
            ).alias("items")
        )
        lists = ordered.join(queries, "q_id").select(
            "q_id",
            F.concat(F.lit("|"), F.col("text")).alias("query"),
            F.transform("items", lambda it: it["n"]).alias("passages"),
            F.transform("items", lambda it: it["p"]).alias("pids"),
        )
        scored = score_lists(lists, listwise_model)
        flat = scored.select(
            "q_id",
            F.explode(F.arrays_zip(F.col("pids").alias("p_id"), F.col("scores").alias("score"))).alias("z"),
        ).select("q_id", F.col("z.p_id").alias("p_id"), F.col("z.score").alias("score"))
        run = fuse_runs_avg(flat, run)

    predictions = format_predictions(run, names, duis, threshold)

    if subheading_model is not None:
        # stage-7 fan-out: one instance per (citation, kept descriptor)
        # (predictors.py:198-203: drop journal_title, pmid as string, add DUI)
        kept = predictions.select(
            "q_id", F.explode(F.col("indexing")).alias("ix")
        ).select("q_id", F.col("ix.id").alias("dui"))
        dui_to_pid = duis.select(F.col("dui"), F.col("p_id"))
        instances = (
            kept.join(F.broadcast(dui_to_pid), "dui")
            .join(
                citations.select(
                    F.col("pmid").alias("q_id"),
                    "title", "abstract", "journal_nlmid", "pub_year", "year_completed",
                ),
                "q_id",
            )
            .select("q_id", "p_id", "title", "abstract", "journal_nlmid",
                    "pub_year", "year_completed")
        )
        quads = score_subheadings(instances, subheading_model)
        nested = attach_subheadings(
            predictions.select(
                "q_id", F.explode("indexing").alias("ix")
            ).select("q_id", F.col("ix.id").alias("dui")).join(
                F.broadcast(dui_to_pid), "dui"
            ).select("q_id", "p_id"),
            quads,
            subheading_names,
            threshold,
        )
        # re-nest: subheadings joined back under each indexing element
        sub_by_key = nested.join(F.broadcast(dui_to_pid), "p_id").select(
            "q_id", F.col("dui").alias("sub_dui"), "subheadings"
        )
        exploded = predictions.select("q_id", F.posexplode("indexing").alias("pos", "ix"))
        merged = exploded.join(
            sub_by_key,
            (exploded.q_id == sub_by_key.q_id) & (F.col("ix.id") == F.col("sub_dui")),
            "left",
        ).select(
            exploded.q_id.alias("q_id"),
            "pos",
            F.struct(
                F.col("ix.term").alias("term"),
                F.col("ix.type").alias("type"),
                F.col("ix.id").alias("id"),
                F.col("ix.im").alias("im"),
                F.col("ix.reason").alias("reason"),
                F.coalesce(
                    F.col("subheadings"),
                    F.array().cast(
                        "array<struct<id:string,im:string,name:string,reason:string>>"
                    ),
                ).alias("subheadings"),
            ).alias("ix"),
        )
        predictions = merged.groupBy("q_id").agg(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct(F.col("pos"), F.col("ix").alias("item")))
                ),
                lambda s: s["item"],
            ).alias("indexing")
        )

    citations.unpersist()
    queries.unpersist()
    return predictions
