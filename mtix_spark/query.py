"""Boolean query language over the engine — the user-facing search API
that composes the ranking and filtering primitives:

    hash +join -slow "table scan"

  - bare terms    → SHOULD: contribute BM25 score (disjunctive)
  - +term         → MUST: doc must contain the term (and it scores)
  - -term         → MUST_NOT: doc must not contain the term
  - "a b c"       → PHRASE filter: doc must contain the exact token
                    sequence; its terms also score (+"..." is the same;
                    -"..." excludes docs containing the phrase)
  - col:value     → metadata filter on a non-text column (e.g. lang:en);
                    -col:value negates. Non-scoring, applied as a plain
                    pushdown predicate on the docs relation.

Scoring: standard BM25 summed over the SHOULD + MUST + phrase terms of the
query (deduplicated). Filters are set-semantics on top — exactly Lucene's
BooleanQuery shape with phrase clauses.

Execution here is the relational form (Catalyst end to end): one scored
relation over the pushed-down scoring terms, then semi-/anti-joins against
single-term posting sets and phrase match sets. Every filter join is keyed
by doc_id over already-term-filtered relations — at the physical-index
scale these are the posting intersections `SegmentSearcher.search_and` and
`phrase_topk` run in-kernel; the relational form is the oracle twin the
driver value-checks.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from mtix_spark.functions.text import TOKEN_SPLIT_RE, tokenize
from mtix_spark.index.build import K1, B
from mtix_spark.index.search import SCORE_DECIMALS

_CLAUSE_RE = re.compile(r'([+-]?)"([^"]*)"|([+-]?)(\S+)')


@dataclass
class BoolQuery:
    should: list[str] = field(default_factory=list)
    must: list[str] = field(default_factory=list)
    must_not: list[str] = field(default_factory=list)
    phrases: list[list[str]] = field(default_factory=list)
    not_phrases: list[list[str]] = field(default_factory=list)
    filters: list[tuple[str, str, bool]] = field(default_factory=list)  # (col, value, negated)
    boosts: dict[str, float] = field(default_factory=dict)  # term -> idf multiplier

    @property
    def scoring_terms(self) -> list[str]:
        ts = set(self.should) | set(self.must)
        for ph in self.phrases:
            ts |= set(ph)
        return sorted(ts)


def _toks(s: str) -> list[str]:
    return [t for t in re.split(TOKEN_SPLIT_RE, s.lower()) if t]


def parse_query(q: str) -> BoolQuery:
    """Parse the mini-language. Unterminated quotes fall back to term
    parsing of the remainder; empty clauses are dropped."""
    bq = BoolQuery()
    for m in _CLAUSE_RE.finditer(q):
        if m.group(2) is not None:  # quoted phrase
            words = _toks(m.group(2))
            if not words:
                continue
            if m.group(1) == "-":
                bq.not_phrases.append(words)
            else:
                bq.phrases.append(words)
        else:
            raw = m.group(4)
            # query-time boost `term^2.5` (Lucene syntax): multiplies the
            # term's idf. Non-positive or unparsable boosts are ignored;
            # a boost on a -term is meaningless (non-scoring) and dropped.
            boost = None
            bm = re.fullmatch(r"(.+)\^(\d+(?:\.\d+)?)", raw)
            if bm:
                w = float(bm.group(2))
                if w > 0:
                    raw, boost = bm.group(1), w
            if ":" in raw and not raw.startswith(":") and not raw.endswith(":"):
                col, value = raw.split(":", 1)
                bq.filters.append((col, value, m.group(3) == "-"))
                continue
            words = _toks(raw)
            if not words:
                continue
            # a multi-token clause like c++ or foo.bar splits; the prefix
            # applies to every resulting term
            for w in words:
                if m.group(3) == "-":
                    bq.must_not.append(w)
                    continue
                if m.group(3) == "+":
                    bq.must.append(w)
                else:
                    bq.should.append(w)
                if boost is not None and boost != 1.0:
                    bq.boosts[w] = boost
    return bq


_NO_PRUNE_K = 1 << 31  # disables MaxScore candidate restriction in the kernel


def boolean_search_index(spark, paths, query: str, k: int = 100) -> DataFrame:
    """Execute one boolean query over the PHYSICAL segment index — the
    engine path of `boolean_search` (same semantics, same tie-break,
    shares its oracle through `__spark_entry__.py:boolean_index`).

    Plan:
      - scoring terms run through the per-segment BM25 kernels with
        pruning DISABLED (k=2^31): filters remove docs AFTER accumulation,
        so a pruned candidate could otherwise wrongly re-enter the top-k.
        The candidate relation stays bounded by the scoring terms'
        postings (docs matching >= 1 term), never corpus-sized.
      - MUST/MUST_NOT terms become semi-/anti-joins against decoded
        posting doc-id lists (`term_doc_ids` — one pushed-down scan).
      - phrase clauses semi-/anti-join the positional index's match sets
        (`phrase_topk`, tombstone-masked like every kernel).
      - metadata filters join the docmap (the doc-store lookup) and apply
        the predicate with identical null semantics to the relational
        form.
    Top-k cuts only after all filters. Scores/tie-break identical to the
    relational path (tested + oracled).
    """
    from mtix_spark.index.positions import phrase_topk
    from mtix_spark.index.search import SegmentSearcher, term_doc_ids

    bq = parse_query(query)
    terms = bq.scoring_terms
    empty = spark.createDataFrame([], "rank long, doc_id long, score double")
    if not terms:
        return empty
    searcher = SegmentSearcher(spark, paths, persist=False)
    per_seg = searcher._per_segment(
        [(0, " ".join(terms))], k=_NO_PRUNE_K, term_weights=bq.boosts or None
    )
    if per_seg is None:
        return empty
    scored = per_seg.select("doc_id", "score")

    need = sorted(set(bq.must) | set(bq.must_not))
    if need:
        td = term_doc_ids(spark, paths, need)
        for t in sorted(set(bq.must)):
            scored = scored.join(
                td.filter(F.col("term") == t).select("doc_id"), "doc_id", "left_semi"
            )
        for t in sorted(set(bq.must_not)):
            scored = scored.join(
                td.filter(F.col("term") == t).select("doc_id"), "doc_id", "left_anti"
            )
    for ph in bq.phrases:
        m = phrase_topk(spark, paths, [(0, " ".join(ph))], k=_NO_PRUNE_K)
        scored = scored.join(m.select("doc_id"), "doc_id", "left_semi")
    for ph in bq.not_phrases:
        m = phrase_topk(spark, paths, [(0, " ".join(ph))], k=_NO_PRUNE_K)
        scored = scored.join(m.select("doc_id"), "doc_id", "left_anti")
    if bq.filters:
        cols = sorted({c for c, _, _ in bq.filters})
        meta = spark.read.parquet(paths.docmap).select("doc_id", *cols)
        scored = scored.join(meta, "doc_id")
        for col, value, neg in bq.filters:
            cond = F.col(col).cast("string") == value
            scored = scored.filter(~cond if neg else cond)
        scored = scored.select("doc_id", "score")

    w = Window.orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("rank", "doc_id", "score")
    )


def boolean_search(
    docs: DataFrame,
    query: str,
    k: int = 100,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Execute one boolean query → (rank, doc_id, score) top-k under the
    engine tie-break (score DESC, doc_id ASC)."""
    from mtix_spark.index.positions import phrase_match_relational

    bq = parse_query(query)
    terms = bq.scoring_terms
    spark = docs.sparkSession
    empty = spark.createDataFrame([], "rank long, doc_id long, score double")
    if not terms:
        return empty
    # metadata filters restrict the DOCS relation itself (pushdown
    # predicates) — they shape the candidate set, not corpus stats: df, N,
    # and avgdl stay corpus-global so a filter never changes a doc's score,
    # only whether it appears (the semantics a search engine's filter
    # clause has)
    filtered = docs
    for col, value, neg in bq.filters:
        cond = F.col(col).cast("string") == value
        filtered = filtered.filter(~cond if neg else cond)

    tf = (
        docs.select(F.col(id_col).alias("doc_id"), F.explode(tokenize(F.col(text_col))).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dl = docs.select(
        F.col(id_col).alias("doc_id"), F.size(tokenize(F.col(text_col))).alias("dl")
    )
    n_docs = docs.count()
    avgdl = dl.agg(F.avg(F.col("dl").cast("double"))).collect()[0][0]

    hits = tf.filter(F.col("term").isin(terms))
    dfreq = hits.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    if bq.boosts:
        boost_map = spark.createDataFrame(
            [(t, float(w)) for t, w in sorted(bq.boosts.items())],
            "term string, __boost double",
        )
        hits = hits.join(F.broadcast(boost_map), "term", "left")
    else:
        hits = hits.withColumn("__boost", F.lit(None).cast("double"))
    idf = F.coalesce(F.col("__boost"), F.lit(1.0)) * F.log(
        F.lit(1.0) + (F.lit(n_docs) - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    scored = (
        hits.join(F.broadcast(dfreq), "term")
        .join(dl, "doc_id")
        .withColumn(
            "contrib",
            idf
            * (F.col("tf") * (K1 + 1.0))
            / (F.col("tf") + K1 * (1.0 - B + B * F.col("dl") / F.lit(avgdl))),
        )
        .groupBy("doc_id")
        .agg(F.round(F.sum("contrib"), SCORE_DECIMALS).alias("score"))
    )

    if bq.filters:
        scored = scored.join(
            filtered.select(F.col(id_col).alias("doc_id")), "doc_id", "left_semi"
        )

    def term_docs(t: str) -> DataFrame:
        return tf.filter(F.col("term") == t).select("doc_id")

    for t in sorted(set(bq.must)):
        scored = scored.join(term_docs(t), "doc_id", "left_semi")
    for t in sorted(set(bq.must_not)):
        scored = scored.join(term_docs(t), "doc_id", "left_anti")
    for ph in bq.phrases:
        scored = scored.join(
            phrase_match_relational(docs, " ".join(ph), id_col, text_col).select(
                "doc_id"
            ),
            "doc_id",
            "left_semi",
        )
    for ph in bq.not_phrases:
        scored = scored.join(
            phrase_match_relational(docs, " ".join(ph), id_col, text_col).select(
                "doc_id"
            ),
            "doc_id",
            "left_anti",
        )

    w = Window.orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("rank", "doc_id", "score")
    )
