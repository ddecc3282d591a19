"""Boolean query language over the engine — the user-facing search API
that composes the ranking and filtering primitives:

    hash +join -slow "table scan"

  - bare terms    → SHOULD: contribute BM25 score (disjunctive)
  - +term         → MUST: doc must contain the term (and it scores)
  - -term         → MUST_NOT: doc must not contain the term
  - "a b c"       → PHRASE filter: doc must contain the exact token
                    sequence; its terms also score (+"..." is the same;
                    -"..." excludes docs containing the phrase)
  - "a b"~k       → SLOPPY phrase (Lucene slop syntax): ordered span with
                    total gap <= k (anchored-greedy SpanNear semantics);
                    terms score, -"..."~k negates
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

_CLAUSE_RE = re.compile(r'([+-]?)"([^"]*)"(~(\d+))?|([+-]?)(\S+)')


@dataclass
class BoolQuery:
    should: list[str] = field(default_factory=list)
    must: list[str] = field(default_factory=list)
    must_not: list[str] = field(default_factory=list)
    phrases: list[list[str]] = field(default_factory=list)
    not_phrases: list[list[str]] = field(default_factory=list)
    # sloppy phrases `"a b"~k`: ordered span within total gap <= k
    slop_phrases: list[tuple[list[str], int]] = field(default_factory=list)
    not_slop_phrases: list[tuple[list[str], int]] = field(default_factory=list)
    filters: list[tuple[str, str, bool]] = field(default_factory=list)  # (col, value, negated)
    boosts: dict[str, float] = field(default_factory=dict)  # term -> idf multiplier

    @property
    def scoring_terms(self) -> list[str]:
        ts = set(self.should) | set(self.must)
        for ph in self.phrases:
            ts |= set(ph)
        for ph, _ in self.slop_phrases:
            ts |= set(ph)
        return sorted(ts)


def _toks(s: str) -> list[str]:
    return [t for t in re.split(TOKEN_SPLIT_RE, s.lower()) if t]


def parse_query(q: str) -> BoolQuery:
    """Parse the mini-language. Unterminated quotes fall back to term
    parsing of the remainder; empty clauses are dropped."""
    bq = BoolQuery()
    for m in _CLAUSE_RE.finditer(q):
        if m.group(2) is not None:  # quoted phrase, optional ~slop
            words = _toks(m.group(2))
            if not words:
                continue
            slop = int(m.group(4)) if m.group(4) else 0
            if slop > 0:
                # `"a b"~k` (Lucene slop syntax): ordered span filter
                if m.group(1) == "-":
                    bq.not_slop_phrases.append((words, slop))
                else:
                    bq.slop_phrases.append((words, slop))
            elif m.group(1) == "-":
                bq.not_phrases.append(words)
            else:
                bq.phrases.append(words)
        else:
            raw = m.group(6)
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
                bq.filters.append((col, value, m.group(5) == "-"))
                continue
            words = _toks(raw)
            if not words:
                continue
            # a multi-token clause like c++ or foo.bar splits; the prefix
            # applies to every resulting term
            for w in words:
                if m.group(5) == "-":
                    bq.must_not.append(w)
                    continue
                if m.group(5) == "+":
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
    if bq.slop_phrases or bq.not_slop_phrases:
        from mtix_spark.index.positions import span_near_topk

        for ph, slop in bq.slop_phrases:
            m = span_near_topk(spark, paths, [(0, ph, slop)], k=_NO_PRUNE_K)
            scored = scored.join(m.select("doc_id"), "doc_id", "left_semi")
        for ph, slop in bq.not_slop_phrases:
            m = span_near_topk(spark, paths, [(0, ph, slop)], k=_NO_PRUNE_K)
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


def _bool_ctx(
    docs: DataFrame, id_col: str, text_col: str
) -> tuple[DataFrame, DataFrame, int, float]:
    """Shared scoring relations for boolean queries: (tf, dl, n_docs,
    avgdl). Compute once per corpus and pass to `boolean_search` when
    running a batch — each query then only adds its own term-filtered
    joins instead of re-deriving (and re-scanning) the token stream."""
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
    return tf, dl, n_docs, avgdl


def boolean_search(
    docs: DataFrame,
    query: str,
    k: int = 100,
    id_col: str = "doc_id",
    text_col: str = "text",
    ctx: tuple | None = None,
) -> DataFrame:
    """Execute one boolean query → (rank, doc_id, score) top-k under the
    engine tie-break (score DESC, doc_id ASC). `ctx` (from `_bool_ctx`,
    ideally with tf/dl persisted) shares the corpus relations across a
    query batch."""
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

    tf, dl, n_docs, avgdl = ctx if ctx is not None else _bool_ctx(
        docs, id_col, text_col
    )

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
    if bq.slop_phrases or bq.not_slop_phrases:
        from mtix_spark.index.positions import span_near_relational

        for ph, slop in bq.slop_phrases:
            scored = scored.join(
                span_near_relational(docs, ph, slop, id_col, text_col).select(
                    "doc_id"
                ),
                "doc_id",
                "left_semi",
            )
        for ph, slop in bq.not_slop_phrases:
            scored = scored.join(
                span_near_relational(docs, ph, slop, id_col, text_col).select(
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


# ---------------------------------------------------------------------------
# search API completions: total hits, score explain, search_after pagination
# ---------------------------------------------------------------------------


def total_hits(
    docs: DataFrame,
    queries: list[tuple[int, str]],
    conjunctive: bool = False,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(query_id, n_hits) — matching-document counts without ranking
    (Lucene TotalHitCountCollector / IndexSearcher.count). Disjunctive
    counts docs containing ANY query term; conjunctive ALL terms.

    Plan shape: the tf relation semi-filtered by the (broadcast) query
    terms, one count-distinct (disjunctive) or an n-term membership count
    (conjunctive) keyed by (query_id, doc_id) — never touches dl/df/avgdl,
    so the scan prunes to the postings columns alone. At the physical
    layer this is a posting-length sum (dedup by doc) — no scoring kernel.
    """
    spark = docs.sparkSession
    q = spark.createDataFrame(
        [(qid, t) for qid, text in queries for t in sorted(set(_toks(text)))],
        "query_id long, term string",
    )
    n_terms = q.groupBy("query_id").agg(F.count(F.lit(1)).alias("n_terms"))
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.array_distinct(tokenize(F.col(text_col)))).alias("term"),
    )
    hit = toks.join(F.broadcast(q), "term")
    if conjunctive:
        per_doc = hit.groupBy("query_id", "doc_id").agg(
            F.count(F.lit(1)).alias("n_match")
        )
        matched = per_doc.join(F.broadcast(n_terms), "query_id").filter(
            F.col("n_match") == F.col("n_terms")
        )
        counted = matched.groupBy("query_id").agg(
            F.count(F.lit(1)).alias("n_hits")
        )
    else:
        counted = hit.groupBy("query_id").agg(
            F.countDistinct("doc_id").alias("n_hits")
        )
    # queries with zero hits still get a row (count = 0), like Lucene
    all_q = q.select("query_id").distinct()
    return (
        all_q.join(counted, "query_id", "left")
        .select("query_id", F.coalesce("n_hits", F.lit(0)).alias("n_hits"))
    )


def bm25_explain(
    docs: DataFrame,
    queries: list[tuple[int, str]],
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-term score decomposition for each top-k hit (Lucene
    Explanation): (query_id, doc_id, term, tf, df, idf, tf_norm, contrib)
    where contrib = idf * tf_norm and sum(contrib) over a doc's rows is
    its BM25 score. Components rounded to SCORE_DECIMALS.

    The decomposition reuses the scoring relation (no second corpus scan):
    score first, cut to top-k per query, then EXPLAIN ONLY those hits via
    a semi-join back onto the per-(query, doc, term) contribution rows.
    """
    tf = (
        docs.select(F.col(id_col).alias("doc_id"), F.explode(tokenize(F.col(text_col))).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dl = docs.select(
        F.col(id_col).alias("doc_id"),
        F.size(tokenize(F.col(text_col))).cast("double").alias("dl"),
    )
    n_docs = docs.count()
    avgdl = dl.agg(F.avg("dl")).collect()[0][0]
    spark = docs.sparkSession
    q = spark.createDataFrame(
        [(qid, t) for qid, text in queries for t in sorted(set(_toks(text)))],
        "query_id long, term string",
    )
    hits = tf.join(F.broadcast(q), "term")
    dfreq = hits.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    idf = F.log(F.lit(1.0) + (F.lit(n_docs) - F.col("df") + 0.5) / (F.col("df") + 0.5))
    tf_norm = (F.col("tf") * (K1 + 1.0)) / (
        F.col("tf") + K1 * (1.0 - B + B * F.col("dl") / F.lit(avgdl))
    )
    parts = (
        hits.join(F.broadcast(dfreq), "term")
        .join(dl, "doc_id")
        .withColumn("idf", idf)
        .withColumn("tf_norm", tf_norm)
        .withColumn("contrib", F.col("idf") * F.col("tf_norm"))
    )
    scored = parts.groupBy("query_id", "doc_id").agg(
        F.round(F.sum("contrib"), SCORE_DECIMALS).alias("score")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_id"))
    top = scored.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )
    return (
        parts.join(top.select("query_id", "doc_id"), ["query_id", "doc_id"], "left_semi")
        .select(
            "query_id",
            "doc_id",
            "term",
            F.col("tf").cast("long").alias("tf"),
            F.col("df").cast("long").alias("df"),
            F.round("idf", SCORE_DECIMALS).alias("idf"),
            F.round("tf_norm", SCORE_DECIMALS).alias("tf_norm"),
            F.round("contrib", SCORE_DECIMALS).alias("contrib"),
        )
    )


def bm25_search_after(
    docs: DataFrame,
    queries: list[tuple[int, str]],
    after: dict[int, tuple[float, int]],
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Cursor pagination (Lucene searchAfter): return the next `k` hits
    STRICTLY after each query's cursor (score, doc_id) in the engine sort
    order (score DESC, doc_id ASC). A query with no cursor starts at the
    top. Ranks continue nothing — they are 1..k within the page.

    The cursor is a predicate on the scored relation, not an offset: page
    N costs the same as page 1 regardless of depth (no global sort of the
    skipped prefix; the per-query top-k heap cut applies after the cursor
    filter prunes everything at-or-before the cursor).
    """
    from mtix_spark.expand import expanded_bm25

    spark = docs.sparkSession
    q = spark.createDataFrame(
        [(qid, t) for qid, text in queries for t in sorted(set(_toks(text)))],
        "query_id long, term string",
    )
    scored = expanded_bm25(
        docs, q, k=2**31 - 1, id_col=id_col, text_col=text_col
    ).drop("rank")
    if after:
        cur = spark.createDataFrame(
            [(qid, float(s), int(d)) for qid, (s, d) in sorted(after.items())],
            "query_id long, cur_score double, cur_doc long",
        )
        scored = (
            scored.join(F.broadcast(cur), "query_id", "left")
            .filter(
                F.col("cur_score").isNull()
                | (F.col("score") < F.col("cur_score"))
                | (
                    (F.col("score") == F.col("cur_score"))
                    & (F.col("doc_id") > F.col("cur_doc"))
                )
            )
            .select("query_id", "doc_id", "score")
        )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "doc_id", "score")
    )


def grouped_bm25(
    docs: DataFrame,
    queries: list[tuple[int, str]],
    group_col: str,
    n_groups: int = 3,
    k_per_group: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Result grouping (Lucene grouping module / field collapsing): per
    query, the top `n_groups` groups ranked by their BEST hit's score
    (ties: group value ASC), and within each group the top `k_per_group`
    docs under the engine tie-break. Returns (query_id, group, grank,
    rank, doc_id, score). `k_per_group=1` is field collapse.

    Plan shape: the scored relation (same expanded-disjunction BM25 as
    every ranking entry) joins the group column off the docs relation,
    then two window passes — docs within (query, group), then groups
    within query by their rank-1 score. Both windows key on bounded
    partitions (groups x queries), never a global sort."""
    from mtix_spark.expand import expanded_bm25

    spark = docs.sparkSession
    q = spark.createDataFrame(
        [(qid, t) for qid, text in queries for t in sorted(set(_toks(text)))],
        "query_id long, term string",
    )
    scored = expanded_bm25(docs, q, k=2**31 - 1, id_col=id_col, text_col=text_col)
    grouped = scored.drop("rank").join(
        docs.select(
            F.col(id_col).alias("doc_id"), F.col(group_col).cast("string").alias("group")
        ),
        "doc_id",
    )
    w_doc = Window.partitionBy("query_id", "group").orderBy(
        F.desc("score"), F.asc("doc_id")
    )
    in_group = grouped.withColumn("rank", F.row_number().over(w_doc).cast("long"))
    best = in_group.filter(F.col("rank") == 1).select(
        "query_id", "group", F.col("score").alias("best_score")
    )
    w_grp = Window.partitionBy("query_id").orderBy(
        F.desc("best_score"), F.asc("group")
    )
    top_groups = best.withColumn(
        "grank", F.row_number().over(w_grp).cast("long")
    ).filter(F.col("grank") <= n_groups)
    return (
        in_group.filter(F.col("rank") <= k_per_group)
        .join(top_groups.select("query_id", "group", "grank"), ["query_id", "group"])
        .select("query_id", "group", "grank", "rank", "doc_id", "score")
    )
