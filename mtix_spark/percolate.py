"""Percolator: reverse search — match INCOMING DOCUMENTS against STORED QUERIES.

A search engine answers "which docs match this query"; a percolator answers
"which of my registered queries match this doc". It is the routing/alerting
primitive of every large ingest pipeline (Elasticsearch's percolate query,
Lucene's MemoryIndex): saved searches, subscription alerts, topic routing,
and compliance filters all run at ingest time, against every arriving file.
The reference pipeline has the same shape in its subheading-attachment step
(/root/reference/src/mtix/pipelines.py — every incoming citation is tested
against a fixed rule set); here it is generalized to a first-class operator.

Semantics (per stored query, Lucene bool-query subset):
    mode "all"  — doc's token set must contain EVERY positive term
    mode "any"  — at least one positive term
    mode "min"  — at least `min_match` distinct positive terms
    mode "phrase" — tokens must contain the phrase's tokens ADJACENT and
                    in order (verified on the normalized token stream)
    must_not    — doc must contain NONE of these terms (any mode)
Tokenization is the engine's standard analyzer (functions.text.tokenize):
lowercase, split on non-[a-z0-9_] — identical on the index and query side.

Scale shape — the design question is 10^12 docs/day x 10^5..10^7 stored
queries, and the answer is "queries are the SMALL side":

  * The query set explodes to (query_id, term, is_neg) rows — a few rows
    per stored query — and ships broadcast. The corpus NEVER shuffles on
    anything query-dependent.
  * Each doc explodes to its DISTINCT tokens (array_distinct before
    explode, so the blow-up is bounded by per-doc vocabulary, not length)
    and inner-joins the broadcast term table: tokens matching no query
    vanish map-side. The only shuffle is ONE groupBy (doc_id, query_id)
    over rows that already matched some query term — output-bounded, not
    corpus-bounded.
  * Phrase verification re-reads text for CANDIDATE (doc, query) pairs
    only (docs that already contain all phrase terms), via a join that is
    candidate-set sized.
  * Past `broadcast_queries=False` (query set over the broadcast byte
    budget) the same plan runs with a shuffle join on `term`; Zipf-hot
    terms in the query set are exactly the salted-merge problem the index
    build already solves, and AQE skew-join handles them here.

Streaming: the operator is stateless per doc, so `percolate_stream` wraps
the identical batch transform in foreachBatch — every micro-batch of an
ingest stream is routed with batch-identical results (asserted by the
stream-vs-batch test).
"""

from __future__ import annotations

from collections.abc import Sequence
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mtix_spark.functions.text import tokenize

MODES = ("all", "any", "min", "phrase")


@dataclass(frozen=True)
class StoredQuery:
    """One registered query. `terms` for all/any/min; `phrase` for phrase
    mode (its tokens become the positive term set); `must_not` applies in
    every mode."""

    query_id: int
    mode: str = "all"
    terms: Sequence[str] = field(default_factory=tuple)
    must_not: Sequence[str] = field(default_factory=tuple)
    min_match: int = 1
    phrase: str | None = None


def queries_df(spark: SparkSession, specs: Sequence[StoredQuery]) -> DataFrame:
    """Stored-query table: (query_id, mode, terms, must_not, min_match,
    phrase). Terms are analyzer-normalized and deduped here so the matcher
    can count distinct matches by plain row count."""
    from mtix_spark.functions.text import tokenize_py

    rows = []
    for s in specs:
        if s.mode not in MODES:
            raise ValueError(f"query {s.query_id}: unknown mode {s.mode!r}")
        if s.mode == "phrase":
            if not s.phrase:
                raise ValueError(f"query {s.query_id}: phrase mode needs phrase")
            toks = tokenize_py(s.phrase)
            pos = sorted(set(toks))
            phrase_norm = " ".join(toks)
        else:
            pos = sorted({t for raw in s.terms for t in tokenize_py(raw)})
            phrase_norm = None
            if not pos:
                raise ValueError(f"query {s.query_id}: no terms after analysis")
        neg = sorted({t for raw in s.must_not for t in tokenize_py(raw)})
        if set(pos) & set(neg):
            raise ValueError(f"query {s.query_id}: term in both terms and must_not")
        if s.mode == "min" and not (1 <= s.min_match <= len(pos)):
            raise ValueError(f"query {s.query_id}: min_match out of range")
        rows.append((s.query_id, s.mode, pos, neg, s.min_match, phrase_norm))
    return spark.createDataFrame(
        rows,
        "query_id bigint, mode string, terms array<string>, "
        "must_not array<string>, min_match int, phrase string",
    )


def _required_expr():
    return (
        F.when(F.col("mode") == "any", F.lit(1))
        .when(F.col("mode") == "min", F.col("min_match"))
        .otherwise(F.size("terms"))  # all / phrase: every distinct term
        .alias("required")
    )


def percolate(
    docs: DataFrame,
    queries: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    broadcast_queries: bool = True,
) -> DataFrame:
    """Match every doc against every stored query; returns
    (query_id, doc_id, n_matched) for satisfied queries, where n_matched
    counts the distinct positive terms present in the doc.

    Plan: query side exploded to (query_id, term, is_neg) and broadcast;
    doc side exploded to per-doc DISTINCT tokens; inner join on term; one
    groupBy (doc, query) counting positive/negative hits; requirement check
    against the broadcast per-query row; phrase candidates re-verified
    against the doc text (candidate-bounded join). See module docstring for
    why each stage is corpus-shuffle-free.
    """
    maybe_b = F.broadcast if broadcast_queries else (lambda d: d)

    qterms = maybe_b(
        queries.select(
            "query_id",
            F.explode(
                F.concat(
                    F.transform("terms", lambda t: F.struct(t.alias("term"), F.lit(False).alias("is_neg"))),
                    F.transform("must_not", lambda t: F.struct(t.alias("term"), F.lit(True).alias("is_neg"))),
                )
            ).alias("e"),
        ).select("query_id", "e.term", "e.is_neg")
    )
    qreq = F.broadcast(
        queries.select("query_id", "mode", "phrase", _required_expr())
    )

    doc_terms = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.array_distinct(tokenize(text_col))).alias("term"),
    )
    counts = (
        doc_terms.join(qterms, "term")
        .groupBy("doc_id", "query_id")
        .agg(
            F.sum(F.when(~F.col("is_neg"), 1).otherwise(0)).alias("n_matched"),
            F.sum(F.when(F.col("is_neg"), 1).otherwise(0)).alias("n_neg"),
        )
    )
    hits = (
        counts.join(qreq, "query_id")
        .filter((F.col("n_neg") == 0) & (F.col("n_matched") >= F.col("required")))
    )

    # phrase candidates (all terms present) -> exact adjacency check on the
    # normalized token stream, padded so matches are token-aligned
    non_phrase = hits.filter(F.col("phrase").isNull()).select(
        "query_id", "doc_id", "n_matched"
    )
    phrase_cand = hits.filter(F.col("phrase").isNotNull()).select(
        "query_id", "doc_id", "n_matched", "phrase"
    )
    doc_stream = docs.select(
        F.col(id_col).alias("doc_id"),
        F.concat(F.lit(" "), F.array_join(tokenize(text_col), " "), F.lit(" ")).alias(
            "_tokstream"
        ),
    )
    phrase_ok = (
        phrase_cand.join(doc_stream, "doc_id")
        .filter(
            F.instr(
                F.col("_tokstream"), F.concat(F.lit(" "), F.col("phrase"), F.lit(" "))
            )
            > 0
        )
        .select("query_id", "doc_id", "n_matched")
    )
    return non_phrase.unionByName(phrase_ok)


def percolate_stream(
    stream_docs: DataFrame,
    queries: DataFrame,
    sink_path: str,
    checkpoint: str,
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """Route an ingest STREAM through the stored queries: each micro-batch
    runs the identical batch percolate (the operator is stateless per doc —
    no cross-batch state, no watermark needed) and appends matches to a
    parquet sink. Returns the started query; callers availableNow-drain it
    in tests or leave it running in production."""
    def _route(batch_df: DataFrame, batch_id: int) -> None:
        out = percolate(batch_df, queries, id_col=id_col, text_col=text_col)
        out.withColumn("batch_id", F.lit(batch_id)).write.mode("append").parquet(
            sink_path
        )

    return (
        stream_docs.writeStream.foreachBatch(_route)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
