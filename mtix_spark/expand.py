"""Multi-term query expansion — wildcard/prefix and fuzzy (edit-distance)
search, Lucene's MultiTermQuery family re-expressed relationally.

A wildcard or fuzzy query is two logical steps:

1. EXPAND against the vocabulary: the pattern (``pre*``, ``?at``) or the
   fuzzy source term matches a set of concrete index terms. The vocabulary
   relation is tiny next to the corpus (Heaps' law: ~10^7-10^8 terms for a
   10^12-doc corpus, term-sharded parquet) and the pattern set is tiny, so
   expansion is a broadcast join of patterns against one vocabulary scan —
   never a corpus scan. Prefix patterns additionally push a range predicate
   (``term >= 'pre' AND term < 'pre\\U0010FFFF'``) into the dictionary scan,
   the relational twin of a term-dictionary prefix seek.
2. SCORE the union of expanded terms as a disjunctive BM25 query (each
   matched term contributes with its OWN document frequency / idf —
   Lucene's scoring-rewrite mode; its constant-score mode is the same
   candidate set with score 1).

The reference has no query language at all (retrieval is an opaque remote
CNN, /root/reference/src/mtix/predictors.py:22-35); this widens the
replacement engine the way Lucene widens a term index. Both operators are
DuckDB-oracled via `__spark_entry__.py` (LIKE / editdist3 twins).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from mtix_spark.functions.text import TOKEN_SPLIT_RE, tokenize
from mtix_spark.index.build import B, K1
from mtix_spark.index.search import SCORE_DECIMALS


def _expand_query_terms(spark, queries) -> DataFrame:
    """(query_id, term) relation — distinct sorted terms per query, split by
    the SAME regex as the index tokenizer (functions.text.TOKEN_SPLIT_RE) so
    query-side analysis can never desynchronize from what was indexed."""
    rows = [
        (qid, t)
        for qid, text in queries
        for t in sorted({w for w in re.split(TOKEN_SPLIT_RE, text.lower()) if w})
    ]
    return spark.createDataFrame(rows, "query_id long, term string")


def wildcard_to_like(pattern: str) -> str:
    """Lucene wildcard syntax -> SQL LIKE: ``*`` -> ``%``, ``?`` -> ``_``.
    LIKE specials in the pattern are escaped (tokenizer terms are
    [a-z0-9_]+ so only ``_`` occurs in practice, and it IS a literal)."""
    out = []
    for ch in pattern:
        if ch == "*":
            out.append("%")
        elif ch == "?":
            out.append("_")
        elif ch in ("%", "_", "\\"):
            out.append("\\" + ch)
        else:
            out.append(ch)
    return "".join(out)


def expand_wildcard(vocab: DataFrame, patterns: list[tuple[int, str]]) -> DataFrame:
    """(query_id, term) — vocabulary terms matching each wildcard pattern.

    vocab: any relation with a distinct `term` column (the index dictionary
    at the physical layer; a tf-derived distinct at the relational layer).
    One vocabulary scan serves ALL patterns; a pure-prefix pattern (no
    leading wildcard) also contributes a sargable prefix predicate so the
    scan can prune dictionary row groups on the term min/max stats.
    """
    spark = vocab.sparkSession
    pats = spark.createDataFrame(
        [(q, wildcard_to_like(p)) for q, p in patterns], "query_id long, pat string"
    )
    # sargable pre-filter: OR of startswith on the literal prefixes
    prefixes = {p.split("*")[0].split("?")[0] for _, p in patterns}
    prefixes = {p for p in prefixes if p}
    v = vocab.select("term").distinct()
    if prefixes and all(p.split("*")[0].split("?")[0] for _, p in patterns):
        cond = None
        for p in sorted(prefixes):
            c = F.col("term").startswith(p)
            cond = c if cond is None else (cond | c)
        v = v.filter(cond)
    return (
        v.join(F.broadcast(pats), F.like(F.col("term"), F.col("pat")))
        .select("query_id", "term")
    )


def expand_fuzzy(
    vocab: DataFrame, sources: list[tuple[int, str]], max_edits: int = 1
) -> DataFrame:
    """(query_id, term) — vocabulary terms within Levenshtein distance
    <= max_edits of each source term (the source itself matches at 0).

    The join is vocabulary x broadcast(sources) with a LENGTH-BAND
    pre-filter (abs(len(term) - len(src)) <= max_edits) evaluated before
    the Levenshtein — Spark's builtin `levenshtein` already takes a
    threshold argument, which short-circuits the DP once the bound is
    exceeded, so per-pair cost is O(len * max_edits), not O(len^2).
    Candidate volume is |vocab| x |sources| band-filtered rows; with the
    usual handful of fuzzy clauses per query this is one cheap vocabulary
    scan, no corpus access.
    """
    spark = vocab.sparkSession
    src = spark.createDataFrame(list(sources), "query_id long, src string")
    v = vocab.select("term").distinct()
    d = F.levenshtein(F.col("term"), F.col("src"), max_edits)
    return (
        v.join(
            F.broadcast(src),
            (F.abs(F.length("term") - F.length("src")) <= max_edits) & (d >= 0),
        )
        .select("query_id", "term")
    )


def _term_contribs(
    docs: DataFrame,
    expanded: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    tokenizer=tokenize,
) -> DataFrame:
    """(query_id, doc_id, term, contrib): the per-matched-term BM25
    contribution relation behind every expanded scorer — tf semi-joined
    against the (tiny, broadcast) expansion, per-term idf, corpus-global
    dl/avgdl. `expanded_bm25` sums it; `dis_max_topk` takes max + tie-sum
    over it. At the physical index this is exactly the pushed-down posting
    fetch before accumulation. `tokenizer` swaps the analyzer (a Column fn
    text -> array<string>, default functions.text.tokenize; e.g.
    ident_tokenize for code-identifier search)."""
    tf = (
        docs.select(F.col(id_col).alias("doc_id"), F.explode(tokenizer(F.col(text_col))).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dl = docs.select(
        F.col(id_col).alias("doc_id"),
        F.size(tokenizer(F.col(text_col))).cast("double").alias("dl"),
    )
    n_docs = docs.count()
    avgdl = dl.agg(F.avg("dl")).collect()[0][0]

    exp = expanded.distinct()
    hits = tf.join(F.broadcast(exp), "term")
    dfreq = (
        tf.join(F.broadcast(exp.select("term").distinct()), "term", "left_semi")
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("df"))
    )
    idf = F.log(F.lit(1.0) + (F.lit(n_docs) - F.col("df") + 0.5) / (F.col("df") + 0.5))
    return (
        hits.join(F.broadcast(dfreq), "term")
        .join(dl, "doc_id")
        .withColumn(
            "contrib",
            idf
            * (F.col("tf") * (K1 + 1.0))
            / (F.col("tf") + K1 * (1.0 - B + B * F.col("dl") / F.lit(avgdl))),
        )
        .select("query_id", "doc_id", "term", "contrib")
    )


def expanded_bm25(
    docs: DataFrame,
    expanded: DataFrame,
    k: int = 100,
    id_col: str = "doc_id",
    text_col: str = "text",
    exclude_query_doc: bool = False,
    min_match: int = 1,
    tokenizer=tokenize,
) -> DataFrame:
    """Disjunctive BM25 over an (query_id, term) expansion relation.

    Each expanded term scores with its own idf (Lucene scoring-rewrite).
    Plan shape: tf filtered by a semi-join against the (tiny, broadcast)
    expansion — at the physical index this is the same pushed-down term
    fetch every query runs; df/dl/avgdl are corpus-global. Returns
    (query_id, rank, doc_id, score), tie-break score DESC / doc_id ASC,
    scores rounded to SCORE_DECIMALS.

    `min_match` ≥ 2 is Lucene's minimum_should_match: only docs matching at
    least that many distinct expanded terms rank (all matched terms still
    contribute) — relationally a HAVING count(*) on the per-(query, doc)
    aggregation, since the tf relation holds one row per distinct
    (doc, term). The physical twin is SegmentSearcher.search(min_match=m).
    """
    scored = (
        _term_contribs(docs, expanded, id_col, text_col, tokenizer=tokenizer)
        .groupBy("query_id", "doc_id")
        .agg(
            F.round(F.sum("contrib"), SCORE_DECIMALS).alias("score"),
            F.count(F.lit(1)).alias("__n_matched"),
        )
    )
    if min_match > 1:
        scored = scored.filter(F.col("__n_matched") >= min_match)
    scored = scored.drop("__n_matched")
    if exclude_query_doc:
        # more-like-this mode: query_id IS a source doc id — never return it
        scored = scored.filter(F.col("query_id") != F.col("doc_id"))
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "doc_id", "score")
    )


def more_like_this(
    docs: DataFrame,
    source_ids: list[int],
    m: int = 10,
    k: int = 100,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """More-like-this (Lucene MoreLikeThis): for each source doc, select its
    top-`m` terms by tf x idf (BM25 idf; tfidf rounded to SCORE_DECIMALS
    before ranking so the ordering is reproducible across engines,
    tie-break term ASC), then run those terms as a disjunctive BM25 query
    excluding the source doc itself. query_id = source doc_id.

    Plan shape: the term-selection side touches only the source docs' tf
    rows (pushed doc_id IN-filter — |sources| x doclen rows); the scoring
    side is the standard expanded-disjunction plan. At the physical layer
    the source doc's term vector comes from the docmap/postings of one doc
    — a single term-sharded fetch.
    """
    expansion = mlt_expansion(docs, source_ids, m, id_col, text_col)
    return expanded_bm25(
        docs, expansion, k, id_col, text_col, exclude_query_doc=True
    )


def mlt_expansion(
    docs: DataFrame,
    source_ids: list[int],
    m: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(query_id, term): each source doc's top-`m` tf·idf terms — the
    MoreLikeThis term-selection stage, shared by the relational scorer
    above and the physical-index twin (which feeds it to
    search_expanded_index)."""
    tf = (
        docs.select(F.col(id_col).alias("doc_id"), F.explode(tokenize(F.col(text_col))).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    n_docs = docs.count()
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    idf = F.log(F.lit(1.0) + (F.lit(n_docs) - F.col("df") + 0.5) / (F.col("df") + 0.5))
    src = (
        tf.filter(F.col("doc_id").isin([int(i) for i in source_ids]))
        .join(dfreq, "term")
        .withColumn("tfidf", F.round(F.col("tf") * idf, SCORE_DECIMALS))
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), F.asc("term"))
    return (
        src.withColumn("__r", F.row_number().over(w))
        .filter(F.col("__r") <= m)
        .select(F.col("doc_id").alias("query_id"), "term")
    )


def wildcard_search(
    docs: DataFrame,
    patterns: list[tuple[int, str]],
    k: int = 100,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Wildcard query -> top-k: expand against the corpus vocabulary, then
    disjunctive BM25 over the matches."""
    vocab = docs.select(
        F.explode(F.array_distinct(tokenize(F.col(text_col)))).alias("term")
    ).distinct()
    return expanded_bm25(
        docs, expand_wildcard(vocab, patterns), k, id_col, text_col
    )


def fuzzy_search(
    docs: DataFrame,
    sources: list[tuple[int, str]],
    max_edits: int = 1,
    k: int = 100,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Fuzzy query -> top-k: Levenshtein expansion, disjunctive BM25."""
    vocab = docs.select(
        F.explode(F.array_distinct(tokenize(F.col(text_col)))).alias("term")
    ).distinct()
    return expanded_bm25(
        docs, expand_fuzzy(vocab, sources, max_edits), k, id_col, text_col
    )


def search_expanded_index(searcher, expanded: list[tuple[int, list[str]]], k: int = 100):
    """Physical-index twin: run a pre-expanded term set through a
    SegmentSearcher (the expansion came from its dictionary via
    `expand_wildcard(searcher.dictionary, ...)`). Joins the MaxScore
    kernel path exactly as a text query would — expansion only changes
    WHICH terms are fetched."""
    fake_text = [(qid, " ".join(terms)) for qid, terms in expanded]
    # terms are already tokenizer-atoms ([a-z0-9_]+), so re-tokenizing the
    # joined string is the identity expansion
    return searcher.search(fake_text, k)


# ---------------------------------------------------------------------------
# synonym queries (Lucene SynonymQuery — blended-tf, max-df scoring)
# ---------------------------------------------------------------------------


def synonym_expansion(
    query_terms: list[tuple[int, list[str]]], synonyms: list[list[str]]
) -> list[tuple[int, str, str]]:
    """(query_id, group, member) rows for a tokenized query batch under a
    synonym table. A query term inside a synonym group pulls in EVERY
    member of its group under one blended pseudo-term (the group key =
    lexicographically-first member); terms outside any group are their own
    singleton group. Duplicate groups within a query collapse (a query
    mentioning two members of one group scores the group once — Lucene's
    SynonymQuery holds a set of terms).

    Runs driver-side over the (tiny) query batch and synonym table — the
    corpus never participates in expansion.
    """
    member_to_group: dict[str, str] = {}
    group_members: dict[str, list[str]] = {}
    for grp in synonyms:
        members = sorted(set(grp))
        key = members[0]
        group_members[key] = members
        for m in members:
            member_to_group[m] = key
    rows: set[tuple[int, str, str]] = set()
    for qid, terms in query_terms:
        for t in terms:
            g = member_to_group.get(t)
            if g is None:
                rows.add((qid, t, t))
            else:
                for m in group_members[g]:
                    rows.add((qid, g, m))
    return sorted(rows)


def _blended_bm25(
    exp_rows: list[tuple[int, str, str]],
    tf: DataFrame,
    dl: DataFrame,
    n_docs: int,
    avgdl: float,
    k: int,
    deleted: DataFrame | None = None,
) -> DataFrame:
    """Shared scoring tail for synonym queries: blended tf (summed across
    group members per doc BEFORE BM25 saturation) with the group's idf
    taken from the MAX member df — Lucene's SynonymQuery semantics, which
    reads df straight off the dictionary instead of counting the union of
    postings. Everything joined against `exp` is broadcast-sized (bounded
    by the query batch × synonym fanout)."""
    spark = tf.sparkSession
    exp = spark.createDataFrame(exp_rows, "query_id long, grp string, term string")
    gtf = (
        tf.join(F.broadcast(exp), "term")
        .groupBy("query_id", "grp", "doc_id")
        .agg(F.sum("tf").alias("gtf"))
    )
    members = exp.select("grp", "term").distinct()
    gdf = (
        tf.groupBy("term")
        .agg(F.count(F.lit(1)).alias("df"))
        .join(F.broadcast(members), "term")
        .groupBy("grp")
        .agg(F.max("df").alias("df"))
    )
    idf = F.log(F.lit(1.0) + (F.lit(n_docs) - F.col("df") + 0.5) / (F.col("df") + 0.5))
    scored = (
        gtf.join(F.broadcast(gdf), "grp")
        .join(dl, "doc_id")
        .withColumn(
            "contrib",
            idf
            * (F.col("gtf") * (K1 + 1.0))
            / (F.col("gtf") + K1 * (1.0 - B + B * F.col("dl") / F.lit(avgdl))),
        )
        .groupBy("query_id", "doc_id")
        .agg(F.round(F.sum("contrib"), SCORE_DECIMALS).alias("score"))
    )
    if deleted is not None:
        scored = scored.join(deleted, "doc_id", "left_anti")
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "doc_id", "score")
    )


def synonym_search(
    docs: DataFrame,
    queries: list[tuple[int, str]],
    synonyms: list[list[str]],
    k: int = 100,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Relational synonym-query top-k over a raw document table."""
    from mtix_spark.functions.text import TOKEN_SPLIT_RE

    qt = [
        (qid, [t for t in re.split(TOKEN_SPLIT_RE, text.lower()) if t])
        for qid, text in queries
    ]
    exp_rows = synonym_expansion(qt, synonyms)
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
    return _blended_bm25(exp_rows, tf, dl, n_docs, avgdl, k)


def synonym_topk_index(
    searcher, queries: list[tuple[int, str]], synonyms: list[list[str]], k: int = 100
) -> DataFrame:
    """Physical-index synonym-query top-k, value-identical to
    `synonym_search` over the same rows (shared oracle). Plan shape: the
    expansion's member terms drive ONE pushed-down postings fetch
    (`term_postings` — decode doc_ids + tfs), the blend regroups those
    posting rows by (query, group, doc) — a shuffle bounded by the fetched
    postings, never the corpus — and doc lengths come from the docmap
    relation keyed by doc_id. Tombstoned docs are anti-joined out before
    ranking, so a deleted doc can't displace a live one."""
    from mtix_spark.index.search import term_postings

    spark = searcher.spark
    qt = searcher._tokenize_queries(queries)
    exp_rows = synonym_expansion(qt, synonyms)
    members = sorted({m for _, _, m in exp_rows})
    tf = term_postings(spark, searcher.paths, members)
    dl = spark.read.parquet(searcher.paths.docmap).select(
        "doc_id", F.col("dl").cast("double").alias("dl")
    )
    deleted = None
    if searcher.has_deletes:
        deleted = spark.read.parquet(searcher.deletes_root).select("doc_id").distinct()
    return _blended_bm25(
        exp_rows, tf, dl, searcher.n_docs, searcher.avgdl, k, deleted
    )


# ---------------------------------------------------------------------------
# regexp queries (Lucene RegexpQuery — dictionary expansion, scoring rewrite)
# ---------------------------------------------------------------------------

_REGEX_META = set(".^$*+?()[]{}|\\")


def regexp_literal_prefix(pattern: str) -> str:
    """Longest literal prefix of a regex (chars before the first
    metacharacter) — the sargable seek prefix Lucene extracts from the
    compiled automaton. A char followed by a quantifier is NOT literal,
    and a top-level alternation (``ab|cd``) voids the prefix entirely:
    the second branch need not start with it."""
    depth = 0
    i = 0
    while i < len(pattern):  # depth-0 '|' anywhere -> no safe prefix
        ch = pattern[i]
        if ch == "\\":
            i += 2
            continue
        if ch == "[":  # char class: metachars inside are literal
            i += 1
            if i < len(pattern) and pattern[i] == "^":
                i += 1
            if i < len(pattern) and pattern[i] == "]":
                i += 1
            while i < len(pattern) and pattern[i] != "]":
                i += 2 if pattern[i] == "\\" else 1
        elif ch == "(":
            depth += 1
        elif ch == ")":
            depth = max(0, depth - 1)
        elif ch == "|" and depth == 0:
            return ""
        i += 1
    out = []
    for i, ch in enumerate(pattern):
        if ch in _REGEX_META:
            break
        if i + 1 < len(pattern) and pattern[i + 1] in "*+?{":
            break
        out.append(ch)
    return "".join(out)


def expand_regexp(vocab: DataFrame, patterns: list[tuple[int, str]]) -> DataFrame:
    """(query_id, term) — vocabulary terms fully matching each regex
    (anchored both ends, Lucene RegexpQuery semantics). One vocabulary
    scan serves all patterns; when every pattern has a non-empty literal
    prefix, a startswith pre-filter prunes the dictionary scan exactly as
    the wildcard path does."""
    spark = vocab.sparkSession
    pats = spark.createDataFrame(
        [(q, f"^(?:{p})$") for q, p in patterns], "query_id long, pat string"
    )
    v = vocab.select("term").distinct()
    prefixes = {regexp_literal_prefix(p) for _, p in patterns}
    if all(prefixes) and prefixes:
        cond = None
        for p in sorted(prefixes):
            c = F.col("term").startswith(p)
            cond = c if cond is None else (cond | c)
        v = v.filter(cond)
    return (
        v.join(F.broadcast(pats), F.regexp_like(F.col("term"), F.col("pat")))
        .select("query_id", "term")
    )


def regexp_search(
    docs: DataFrame,
    patterns: list[tuple[int, str]],
    k: int = 100,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Regexp query -> top-k: anchored-regex expansion against the corpus
    vocabulary, then disjunctive BM25 (scoring rewrite, per-term idf)."""
    vocab = docs.select(
        F.explode(F.array_distinct(tokenize(F.col(text_col)))).alias("term")
    ).distinct()
    return expanded_bm25(
        docs, expand_regexp(vocab, patterns), k, id_col, text_col
    )


# ---------------------------------------------------------------------------
# term range queries (Lucene TermRangeQuery — sargable dictionary slice)
# ---------------------------------------------------------------------------


def expand_term_range(
    vocab: DataFrame,
    ranges: list[tuple[int, str | None, str | None, bool, bool]],
) -> DataFrame:
    """(query_id, term) — vocabulary terms inside each lexicographic range
    (Lucene TermRangeQuery; None bound = open). The predicate is a pure
    range on the dictionary's sort key, so at the physical layer it prunes
    to a contiguous dictionary slice (min/max-pruned parquet row groups on
    the term-sorted dictionary) — no regex, no scan of the whole vocab."""
    spark = vocab.sparkSession
    v = vocab.select("term").distinct()
    outs = []
    for qid, lo, hi, lo_incl, hi_incl in ranges:
        cond = F.lit(True)
        if lo is not None:
            cond = cond & (
                F.col("term") >= lo if lo_incl else F.col("term") > lo
            )
        if hi is not None:
            cond = cond & (
                F.col("term") <= hi if hi_incl else F.col("term") < hi
            )
        outs.append(
            v.filter(cond).select(F.lit(qid).cast("long").alias("query_id"), "term")
        )
    res = outs[0]
    for o in outs[1:]:
        res = res.unionByName(o)
    return res


def term_range_search(
    docs: DataFrame,
    ranges: list[tuple[int, str | None, str | None, bool, bool]],
    k: int = 100,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Term-range query -> top-k: dictionary-slice expansion, then
    disjunctive BM25 (scoring rewrite, per-term idf)."""
    vocab = docs.select(
        F.explode(F.array_distinct(tokenize(F.col(text_col)))).alias("term")
    ).distinct()
    return expanded_bm25(
        docs, expand_term_range(vocab, ranges), k, id_col, text_col
    )


# ---------------------------------------------------------------------------
# spell suggestion (Lucene DirectSpellChecker — did-you-mean)
# ---------------------------------------------------------------------------


def suggest_terms(
    vocab_df: DataFrame,
    sources: list[tuple[int, str]],
    max_edits: int = 2,
    top: int = 3,
) -> DataFrame:
    """(query_id, suggestion, df, distance, rank) — for each (possibly
    misspelled) source term, the `top` dictionary terms within `max_edits`,
    ranked the way Lucene's DirectSpellChecker ranks candidates: smaller
    edit distance first, then higher document frequency, then term ASC.
    The source term itself is excluded (a suggestion equal to the input
    isn't a correction).

    vocab_df must carry (term, df) — the index dictionary relation. The
    scan is the same length-banded broadcast pattern as `expand_fuzzy`:
    one dictionary pass serves all sources, no corpus access.
    """
    spark = vocab_df.sparkSession
    src = spark.createDataFrame(list(sources), "query_id long, src string")
    d = F.levenshtein(F.col("term"), F.col("src"), max_edits)
    cand = (
        vocab_df.select("term", "df")
        .join(
            F.broadcast(src),
            (F.abs(F.length("term") - F.length("src")) <= max_edits)
            & (F.col("term") != F.col("src")),
        )
        .withColumn("distance", d)
        .filter(F.col("distance") >= 0)
    )
    w = Window.partitionBy("query_id").orderBy(
        F.asc("distance"), F.desc("df"), F.asc("term")
    )
    return (
        cand.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= top)
        .select(
            "query_id",
            F.col("term").alias("suggestion"),
            F.col("df").cast("long").alias("df"),
            F.col("distance").cast("long").alias("distance"),
            "rank",
        )
    )


def suggest_from_corpus(
    docs: DataFrame,
    sources: list[tuple[int, str]],
    max_edits: int = 2,
    top: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Relational twin: derive (term, df) from the corpus, then suggest."""
    vocab_df = (
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.explode(F.array_distinct(tokenize(F.col(text_col)))).alias("term"),
        )
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("df"))
    )
    return suggest_terms(vocab_df, sources, max_edits, top)


def complete_terms(
    vocab_df: DataFrame,
    prefixes: list[tuple[int, str]],
    top: int = 5,
) -> DataFrame:
    """(query_id, completion, df, rank) — prefix autocomplete (the ES
    completion suggester re-expressed over the term dictionary): for each
    prefix, the `top` dictionary terms starting with it, ranked by
    popularity (df DESC) then term ASC. Distinct from `suggest_terms`
    (typo correction, edit-distance ranking): completion is a pure prefix
    range scan — sargable against the dictionary's term-ordered layout,
    one dictionary pass serves all prefixes, no corpus access."""
    spark = vocab_df.sparkSession
    src = spark.createDataFrame(list(prefixes), "query_id long, prefix string")
    cand = vocab_df.select("term", "df").join(
        F.broadcast(src), F.col("term").startswith(F.col("prefix"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("df"), F.asc("term"))
    return (
        cand.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= top)
        .select(
            "query_id",
            F.col("term").alias("completion"),
            F.col("df").cast("long").alias("df"),
            "rank",
        )
    )


def complete_from_corpus(
    docs: DataFrame,
    prefixes: list[tuple[int, str]],
    top: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Relational twin: derive (term, df) from the corpus, then complete."""
    vocab_df = (
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.explode(F.array_distinct(tokenize(F.col(text_col)))).alias("term"),
        )
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("df"))
    )
    return complete_terms(vocab_df, prefixes, top)


def expanded_constant_score(
    docs: DataFrame,
    expanded: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """CONSTANT_SCORE rewrite (Lucene's default for multi-term queries):
    the expansion's candidate doc set with score 1.0 per doc — no tf/idf
    work at all, so the plan touches only the token->doc relation (a
    semi-join against the broadcast expansion) and skips dl/df/avgdl
    entirely. Returns (query_id, doc_id, score)."""
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.array_distinct(tokenize(F.col(text_col)))).alias("term"),
    )
    return (
        toks.join(F.broadcast(expanded.distinct()), "term")
        .select("query_id", "doc_id")
        .distinct()
        .withColumn("score", F.lit(1.0))
    )


def function_score_topk(
    docs: DataFrame,
    queries: list[tuple[int, str]],
    factor,
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """FunctionScoreQuery (Lucene) / field_value_factor (the ES idiom):
    final score = round(BM25 * factor(doc), 6), ranked AFTER boosting.

    `factor` is a Column over `docs` (e.g. ``F.log(1.0 + F.col("n_chars"))``
    for a length prior, or a recency decay over a timestamp column). The
    relevance leg must score the full matched set — boosting can promote a
    doc from below any fixed relevance cut — so this ranks the union of the
    query terms' postings, which is already the bounded candidate set every
    disjunctive query touches. At the physical index the same query runs
    top-k-safe by multiplying each block-max bound by max(factor) (finite
    for any bounded field factor), the standard boost-aware MaxScore
    argument; the relational form here needs no such bound.

    Returns (query_id, rank, doc_id, score), tie-break score DESC /
    doc_id ASC after the boost is applied.
    """
    spark = docs.sparkSession
    exp = _expand_query_terms(spark, queries)
    base = expanded_bm25(docs, exp, k=2**31 - 1, id_col=id_col, text_col=text_col)
    fac = docs.select(
        F.col(id_col).alias("doc_id"), factor.cast("double").alias("__factor")
    )
    boosted = base.join(fac, "doc_id").select(
        "query_id",
        "doc_id",
        F.round(F.col("score") * F.col("__factor"), SCORE_DECIMALS).alias("score"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        boosted.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "doc_id", "score")
    )


def dis_max_topk(
    docs: DataFrame,
    queries: list[tuple[int, str]],
    tie_breaker: float = 0.3,
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """DisjunctionMaxQuery (Lucene dis_max) over the query's term clauses:

        score(d) = max_t c_t(d) + tie_breaker · (Σ_t c_t(d) − max_t c_t(d))

    where c_t is the per-term BM25 contribution. With tie_breaker=0 this is
    pure best-clause ranking (a doc matching one strong term beats a doc
    with many weak matches); tie_breaker=1 degenerates to the disjunctive
    sum. Relationally it is the SAME per-term contribution relation as
    `expanded_bm25`, aggregated with max+sum instead of sum — no extra
    shuffle, identical candidate set, so the physical plan shape (and the
    10^12-doc cost model) is unchanged. Rounded to 6, tie-break score DESC
    / doc_id ASC."""
    if not 0.0 <= tie_breaker <= 1.0:
        raise ValueError(f"tie_breaker must be in [0, 1], got {tie_breaker}")
    spark = docs.sparkSession
    exp = _expand_query_terms(spark, queries)
    scored = (
        _term_contribs(docs, exp, id_col, text_col)
        .groupBy("query_id", "doc_id")
        .agg(
            F.round(
                F.max("contrib")
                + F.lit(float(tie_breaker)) * (F.sum("contrib") - F.max("contrib")),
                SCORE_DECIMALS,
            ).alias("score")
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "doc_id", "score")
    )


def multi_match_topk(
    docs: DataFrame,
    fields: list[str],
    queries: list[tuple[int, str]],
    mode: str = "best_fields",
    tie_breaker: float = 0.3,
    k: int = 10,
    id_col: str = "doc_id",
) -> DataFrame:
    """Elasticsearch multi_match: the SAME query string scored against each
    field as an independent BM25 query (per-field tf, dl, avgdl, df/idf —
    unlike BM25F, which combines tf across fields BEFORE saturation), then
    per doc:

        best_fields : max_f s_f + tie_breaker · (Σ_f s_f − max_f s_f)
        most_fields : Σ_f s_f
        cross_fields: term-centric blending — see _multi_match_cross

    Plan shape: one expanded-BM25 leg per field (each the standard pushed-
    down term fetch), legs unioned and combined by ONE (query, doc)
    aggregation — the union is bounded by the fields' matched sets, and
    with a handful of fields the cost class is a single disjunctive query
    per field. Per-field scores round to 6 before combining (each leg is
    an engine-boundary quantity), final score re-rounds — the SQL twin
    mirrors both roundings. Returns (query_id, rank, doc_id, score)."""
    if mode not in ("best_fields", "most_fields", "cross_fields"):
        raise ValueError(
            f"mode must be best_fields|most_fields|cross_fields, got {mode!r}"
        )
    if not 0.0 <= tie_breaker <= 1.0:
        raise ValueError(f"tie_breaker must be in [0, 1], got {tie_breaker}")
    if not fields:
        raise ValueError("multi_match needs at least one field")
    if mode == "cross_fields":
        return _multi_match_cross(docs, fields, queries, tie_breaker, k, id_col)
    spark = docs.sparkSession
    exp = _expand_query_terms(spark, queries)
    legs = [
        expanded_bm25(docs, exp, k=2**31 - 1, id_col=id_col, text_col=f).select(
            "query_id", "doc_id", "score"
        )
        for f in fields
    ]
    allc = legs[0]
    for leg in legs[1:]:
        allc = allc.unionByName(leg)
    if mode == "most_fields":
        comb = F.round(F.sum("score"), SCORE_DECIMALS)
    else:
        comb = F.round(
            F.max("score")
            + F.lit(float(tie_breaker)) * (F.sum("score") - F.max("score")),
            SCORE_DECIMALS,
        )
    scored = allc.groupBy("query_id", "doc_id").agg(comb.alias("score"))
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "doc_id", "score")
    )


def _multi_match_cross(
    docs: DataFrame,
    fields: list[str],
    queries: list[tuple[int, str]],
    tie_breaker: float = 0.3,
    k: int = 10,
    id_col: str = "doc_id",
) -> DataFrame:
    """multi_match cross_fields (Lucene BlendedTermQuery): TERM-centric
    blending, the mode for entities split across fields (first/last name,
    path/content). Where best_fields combines whole per-field QUERY scores,
    cross_fields blends each TERM across fields:

      - blended df(t) = max_f df_f(t); idf from it with the corpus N —
        a term's rarity cannot be understated because it lives mostly in
        one field (Lucene blends term stats for exactly this reason)
      - s_{t,f}(d)    = idf_blend(t) · tf-saturation with FIELD-local
        tf/dl/avgdl (each field keeps its own length normalization)
      - contrib(t,d)  = max_f s_{t,f} + tie_breaker · (Σ_f s_{t,f} − max_f)
      - score(q,d)    = round(Σ_t contrib, 6)

    Plan shape: per field, tf semi-joined against the broadcast expansion
    (the same pushed-down fetch as every leg); per-field dfs union into the
    blended dictionary (broadcast — it is |query terms| rows); legs union
    into one (query, doc, term) aggregation then one (query, doc)
    aggregation. Nothing corpus-global shuffles beyond the per-field tf
    builds the other modes already pay."""
    spark = docs.sparkSession
    exp = _expand_query_terms(spark, queries).distinct()
    terms_only = exp.select("term").distinct()
    n_docs = docs.count()

    legs, dfs = [], []
    for f in fields:
        tf = (
            docs.select(
                F.col(id_col).alias("doc_id"),
                F.explode(tokenize(F.col(f))).alias("term"),
            )
            .groupBy("doc_id", "term")
            .agg(F.count(F.lit(1)).alias("tf"))
        )
        dl = docs.select(
            F.col(id_col).alias("doc_id"),
            F.size(tokenize(F.col(f))).cast("double").alias("dl"),
        )
        avgdl = dl.agg(F.avg("dl")).collect()[0][0]
        dfs.append(
            tf.join(F.broadcast(terms_only), "term", "left_semi")
            .groupBy("term")
            .agg(F.count(F.lit(1)).alias("df"))
        )
        legs.append(
            tf.join(F.broadcast(exp), "term")
            .join(dl, "doc_id")
            .select(
                "query_id",
                "doc_id",
                "term",
                (
                    (F.col("tf") * (K1 + 1.0))
                    / (
                        F.col("tf")
                        + K1 * (1.0 - B + B * F.col("dl") / F.lit(avgdl))
                    )
                ).alias("tfpart"),
            )
        )
    dfb = dfs[0]
    for d in dfs[1:]:
        dfb = dfb.unionByName(d)
    dfb = dfb.groupBy("term").agg(F.max("df").alias("df"))
    idf = F.log(
        F.lit(1.0) + (F.lit(n_docs) - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )

    allc = legs[0]
    for leg in legs[1:]:
        allc = allc.unionByName(leg)
    allc = allc.join(F.broadcast(dfb), "term").withColumn(
        "s", idf * F.col("tfpart")
    )
    per_term = allc.groupBy("query_id", "doc_id", "term").agg(
        (
            F.max("s")
            + F.lit(float(tie_breaker)) * (F.sum("s") - F.max("s"))
        ).alias("c")
    )
    scored = per_term.groupBy("query_id", "doc_id").agg(
        F.round(F.sum("c"), SCORE_DECIMALS).alias("score")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "doc_id", "score")
    )


def term_vectors(
    docs: DataFrame,
    doc_ids: list[int],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document term vectors (the Elasticsearch _termvectors API /
    Lucene TermVectors): for each requested doc, its distinct terms with
    term frequency and corpus document frequency.

    Plan shape: tf tokenizes only the requested docs (the doc-id IN filter
    is pushed to the scan); df is the corpus dictionary restricted by a
    broadcast semi-join to those docs' terms — the same bounded dictionary
    fetch the suggesters use. Returns (doc_id, term, tf, df)."""
    wanted = docs.filter(F.col(id_col).isin([int(d) for d in doc_ids]))
    tf = (
        wanted.select(
            F.col(id_col).alias("doc_id"),
            F.explode(tokenize(F.col(text_col))).alias("term"),
        )
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    corpus_tf = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.array_distinct(tokenize(F.col(text_col)))).alias("term"),
    )
    dfreq = (
        corpus_tf.join(
            F.broadcast(tf.select("term").distinct()), "term", "left_semi"
        )
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("df"))
    )
    return tf.join(F.broadcast(dfreq), "term").select("doc_id", "term", "tf", "df")


def rescore_topk(
    docs: DataFrame,
    queries: list[tuple[int, str]],
    window: int = 30,
    query_weight: float = 0.7,
    rescore_weight: float = 0.3,
    k: int = 10,
    mu: float = 2000.0,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-window rescoring (the Elasticsearch `rescore` API): rank the
    corpus by cheap BM25, keep each query's top-`window` docs, then re-rank
    ONLY that window by

        final = round(query_weight · bm25 + rescore_weight · lm, 6)

    with LM-Dirichlet query likelihood as the second-pass scorer. The
    expensive scorer touches `window` docs per query — never the corpus —
    which is the entire point of the pattern at 10^12 docs: first pass uses
    the block-max index path, second pass is a per-candidate recompute.
    Both passes here are relational (each has an index twin elsewhere:
    bm25_topk_segments / lm_dirichlet_index); the window cut is
    deterministic under the engine tie-break, so the composition is
    oracle-exact. Returns (query_id, rank, doc_id, score) with rank over
    the rescored window, truncated at k."""
    from mtix_spark.index.search import lm_dirichlet_brute

    spark = docs.sparkSession
    exp = _expand_query_terms(spark, queries)
    first = expanded_bm25(docs, exp, k=window, id_col=id_col, text_col=text_col)

    tf = (
        docs.select(F.col(id_col).alias("doc_id"), F.explode(tokenize(F.col(text_col))).alias("term"))
        .groupBy("term", "doc_id")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dl = docs.select(
        F.col(id_col).alias("doc_id"),
        F.size(tokenize(F.col(text_col))).alias("dl"),
    )
    total_tokens = dl.agg(F.sum(F.col("dl").cast("double"))).collect()[0][0]
    qdf = spark.createDataFrame(list(queries), "query_id long, text string")
    # the second pass scores ONLY the window (broadcast semi-join into the
    # LM hit relation) — collection stats stay corpus-global, so the scores
    # are identical to a full LM run restricted afterwards, but the
    # aggregation input is |Q|·window rows instead of every matching doc
    lm = lm_dirichlet_brute(
        tf, dl, qdf, total_tokens, mu=mu, k=2**31 - 1,
        candidates=first.select("query_id", "doc_id"),
    ).select("query_id", "doc_id", F.col("score").alias("lm_score"))

    rescored = (
        first.select("query_id", "doc_id", F.col("score").alias("bm25"))
        .join(lm, ["query_id", "doc_id"])
        .select(
            "query_id",
            "doc_id",
            F.round(
                F.lit(float(query_weight)) * F.col("bm25")
                + F.lit(float(rescore_weight)) * F.col("lm_score"),
                SCORE_DECIMALS,
            ).alias("score"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        rescored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "doc_id", "score")
    )
