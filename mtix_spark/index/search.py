"""BM25 top-k query engine.

Two paths, one contract (per query: top-k (doc_id, score), tie-break
score DESC / doc_id ASC — the deterministic total order SURVEY.md §2 fixes
for the reference's unordered run dicts, /root/reference/src/mtix/predictors.py:34):

1. `bm25_brute(...)` — pure DataFrame/SQL brute force. Catalyst-only plan:
   query-term literal IN-filter (pushed to the parquet scan), broadcast join
   of the tiny query-term relation, partial+final hash aggregation, and
   TakeOrderedAndProject for the global top-k. This is the correctness oracle
   AND a legitimate scale path (it only ever touches postings of query terms).

2. `bm25_topk_segments(...)` — the physical-index path: per-segment
   MaxScore-pruned term-at-a-time kernels (numpy, Arrow-batched) over
   delta+varint posting lists with block-max metadata; per-segment top-k,
   then a tiny global merge. Segment fan-out = executor parallelism; the
   global merge moves only n_segments×k rows.

BM25: idf = ln(1 + (N - df + 0.5)/(df + 0.5)), wtf = tf(k1+1)/(tf + k1(1-b+b·dl/avgdl)),
score = Σ_terms idf·wtf with k1=1.2, b=0.75 (BASELINE.json:north_star).
Query terms are deduplicated (multiplicity ignored) — mirrored in the oracle.
"""

from __future__ import annotations

import json
import math
from typing import Iterable

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mtix_spark.functions.text import tokenize
from mtix_spark.index.build import BLOCK_SIZE, IndexPaths, K1, B
from mtix_spark.index.codec import decode_varint, delta_decode

SCORE_DECIMALS = 6  # cross-engine float stability for rank + hash comparison

# Named per-document boost factors over the stored doc length (the one
# per-doc field the index already serves executor-locally) — referenced by
# NAME so the applyInPandas kernel closure stays small and picklable.
# Every factor must be nonnegative AND monotone nondecreasing in dl:
# nonnegativity makes UB·max(f) a sound MaxScore bound, and monotonicity
# lets the kernel derive that segment max as f(max dl) without evaluating
# f over the whole doc-length array (see _maxscore_kernel's dl_factor
# contract — register a non-monotone factor and the pruning bound breaks).
DL_FACTORS: dict = {"log1p_dl": np.log1p}


class _LRUCache:
    """Bounded LRU mapping for SERVING-HANDLE caches (VERDICT r3: a
    long-lived query node seeing an adversarial term stream must not
    accumulate every term/dl-block ever queried). Dict-compatible at the
    call sites (`in`, `[k]`, `.get`, `[k]=v`); reads touch recency.
    Eviction is explicit via `evict(pinned)` so a call's working set is
    never dropped mid-call — if the working set alone exceeds the budget,
    the cache runs over budget for that call and shrinks on the next.
    Budgets: `max_entries` (count) and/or `max_bytes` via `sizeof`;
    None = unbounded (the r2 behavior)."""

    def __init__(self, max_entries=None, max_bytes=None, sizeof=None):
        from collections import OrderedDict

        self._d: "OrderedDict" = OrderedDict()
        self.max_entries = max_entries
        self.max_bytes = max_bytes
        self._sizeof = sizeof or (lambda v: 0)
        self.bytes = 0

    def __contains__(self, k) -> bool:
        return k in self._d

    def __len__(self) -> int:
        return len(self._d)

    def __iter__(self):
        return iter(self._d)

    def __getitem__(self, k):
        v = self._d[k]
        self._d.move_to_end(k)
        return v

    def get(self, k, default=None):
        if k not in self._d:
            return default
        return self[k]

    def __setitem__(self, k, v) -> None:
        if k in self._d:
            self.bytes -= self._sizeof(self._d[k])
        self._d[k] = v
        self._d.move_to_end(k)
        self.bytes += self._sizeof(v)

    def _over(self) -> bool:
        if self.max_entries is not None and len(self._d) > self.max_entries:
            return True
        return self.max_bytes is not None and self.bytes > self.max_bytes

    def evict(self, pinned=()) -> int:
        """Drop least-recently-used unpinned entries until within budget.
        Returns the number evicted (callers that treat misses specially —
        e.g. preloaded dictionaries where a miss means OOV — must downgrade
        that assumption when this is non-zero)."""
        if not self._over():
            return 0
        pinned = set(pinned)
        n = 0
        while self._over():
            victim = next((k for k in self._d if k not in pinned), None)
            if victim is None:  # whole cache is this call's working set
                break
            self.bytes -= self._sizeof(self._d.pop(victim))
            n += 1
        return n

# executor-local doclens cache: seg -> np.float64[dl]. Loaded straight from
# the index's doclens/seg=K parquet by the query kernel — the doclens
# relation is NEVER shuffled at query time (it used to ride a cogroup,
# moving n_docs rows per query; now each task reads only its segment's
# lengths, and repeat queries hit this cache). The key carries a build id
# (manifest mtime) so rebuilding an index at the same path within one
# executor process invalidates stale entries instead of silently serving
# wrong doc lengths.
_DL_CACHE: dict = {}
_DL_CACHE_MAX = 64


def _load_dl(doclens_root: str, seg: int, base: int, n: int, build_id: float = 0.0) -> "np.ndarray":
    key = (doclens_root, seg, build_id)
    hit = _DL_CACHE.get(key)
    if hit is not None:
        return hit
    import glob
    import os

    import pyarrow.parquet as pq

    dl = np.zeros(n, dtype=np.float64)
    for f in glob.glob(os.path.join(doclens_root, f"seg={seg}", "*.parquet")):
        t = pq.read_table(f, columns=["doc_id", "dl"])
        ids = t["doc_id"].to_numpy() - base
        vals = t["dl"].to_numpy()
        # docmap can hold token-less docs outside the postings' doc range
        # (base/n derive from posting min/max_doc) — mask, don't wrap
        m = (ids >= 0) & (ids < n)
        dl[ids[m]] = vals[m]
    if len(_DL_CACHE) >= _DL_CACHE_MAX:
        _DL_CACHE.pop(next(iter(_DL_CACHE)))
    _DL_CACHE[key] = dl
    return dl


def _queries_df(spark: SparkSession, queries: DataFrame | Iterable) -> DataFrame:
    if isinstance(queries, DataFrame):
        return queries
    return spark.createDataFrame(list(queries), "query_id long, text string")


def query_terms(queries: DataFrame) -> DataFrame:
    """(query_id, term) — distinct tokenized query terms."""
    return queries.select(
        "query_id", F.explode(F.array_distinct(tokenize("text"))).alias("term")
    )


def bm25_brute(
    tf: DataFrame,
    doclens: DataFrame,
    queries: DataFrame,
    n_docs: int,
    avgdl: float,
    k: int = 100,
    dictionary: DataFrame | None = None,
) -> DataFrame:
    """Brute-force BM25 top-k, all Catalyst.

    tf:       (term, doc_id, tf)
    doclens:  (doc_id, dl)
    queries:  (query_id, text)
    returns   (query_id, rank, doc_id, score)
    """
    qt = query_terms(queries)
    # literal IN-filter so the term predicate reaches the parquet scan
    terms = [r["term"] for r in qt.select("term").distinct().collect()]
    hits = tf.filter(F.col("term").isin(terms)).join(F.broadcast(qt), "term")
    if dictionary is not None:
        dfreq = dictionary.select("term", "df").filter(F.col("term").isin(terms))
    else:
        dfreq = (
            tf.filter(F.col("term").isin(terms))
            .groupBy("term")
            .agg(F.count(F.lit(1)).alias("df"))
        )
    idf = F.log(F.lit(1.0) + (F.lit(n_docs) - F.col("df") + 0.5) / (F.col("df") + 0.5))
    scored = (
        hits.join(F.broadcast(dfreq), "term")
        .join(doclens, "doc_id")
        .withColumn(
            "contrib",
            idf
            * (F.col("tf") * (K1 + 1.0))
            / (F.col("tf") + K1 * (1.0 - B + B * F.col("dl") / F.lit(avgdl))),
        )
        .groupBy("query_id", "doc_id")
        .agg(F.round(F.sum("contrib"), SCORE_DECIMALS).alias("score"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "doc_id", "score")
    )


# ---------------------------------------------------------------------------
# Physical-index path
# ---------------------------------------------------------------------------


def _maxscore_kernel(
    postings: pd.DataFrame,
    dl_by_doc: np.ndarray,
    seg_base: int,
    seg_n: int,
    queries: list[tuple[int, list[str]]],
    idf: dict[str, float],
    avgdl: float,
    k: int,
    bm_scale: float = 1.0,
    deleted: np.ndarray | None = None,
    min_match: int = 1,
    dl_factor: str | None = None,
) -> pd.DataFrame:
    """Term-at-a-time BM25 with MaxScore pruning over one segment.

    Terms are processed in descending upper-bound order (UB = idf ×
    block-max wtf). Once the remaining terms' summed UB falls below the
    current k-th best accumulated score, docs not yet seen cannot enter the
    top-k, so remaining posting lists only update existing candidates
    (exactness argument: candidate scores only grow, so θ at the split is a
    lower bound of the final k-th candidate score). The restricted phase is
    a sorted-array intersection against the candidate set — O(|postings|
    log |candidates|), touching no non-candidate entries. Block-max
    metadata supplies the per-term upper bounds driving the split.

    `bm_scale` keeps the stored upper bounds sound when the segment was
    built against a different (e.g. streaming-incremental) avgdl than the
    query-time one: wtf(avgdl_q) ≤ wtf(avgdl_b) · max(1, avgdl_q/avgdl_b),
    since the dl term scales at most linearly in 1/avgdl. Exact scores are
    always recomputed with the query-time avgdl — the scale affects pruning
    bounds only, never values.

    `min_match` ≥ 2 is Lucene's minimum_should_match: only docs matching at
    least that many DISTINCT query terms may rank (all matched terms still
    contribute to the score). The kernel tracks a per-candidate match count
    and the restriction rule becomes: stop admitting new docs when EITHER
    (a) the remaining-term count < min_match (a doc first seen at term i can
    never reach the threshold), or (b) the k-th best CURRENTLY-QUALIFYING
    candidate already beats the remaining upper bound (counts and scores
    only grow, so both the qualifying set and θ_q are monotone — the usual
    MaxScore lower-bound argument restricted to the qualifying subset).

    `dl_factor` names a per-document boost f(dl) from `DL_FACTORS`
    (FunctionScoreQuery with a doc-length field factor): final score =
    round(round(Σ contrib, 6) · f(dl_d), 6), ranked boosted. Pruning stays
    exact by scaling every upper bound by max_d f(dl_d) over the segment
    and computing θ in boosted space — the boost-aware MaxScore argument
    (each factor is monotone nonneg, so UB·f_max bounds any unseen doc).
    """
    by_term: dict[str, tuple[np.ndarray, np.ndarray, np.ndarray]] = {}
    ubs: dict[str, float] = {}
    for r in postings.itertuples(index=False):
        ids = delta_decode(r.doc_ids_bin).astype(np.int64)
        tfs = decode_varint(r.tfs_bin).astype(np.float64)
        if deleted is not None and deleted.size:
            # mask at decode time, BEFORE accumulation/pruning: a deleted
            # doc's score must never inflate θ (it would wrongly prune
            # live docs in the restricted phase)
            from mtix_spark.index.deletes import mask_deleted

            keep = mask_deleted(ids, deleted)
            ids, tfs = ids[keep], tfs[keep]
        if ids.size == 0:
            continue
        bm = np.asarray(r.block_max_wtf, dtype=np.float64)
        by_term[r.term] = (ids, tfs, bm)
        ubs[r.term] = idf.get(r.term, 0.0) * float(bm.max()) * bm_scale if bm.size else 0.0

    fac_fn = None
    fac_max = 1.0
    if dl_factor is not None:
        fac_fn = DL_FACTORS[dl_factor]
        # registered factors are monotone nondecreasing (DL_FACTORS contract),
        # so the segment-wide bound is f(max dl) — no full-segment float64
        # materialization or f() pass per (segment, query-batch); f only ever
        # evaluates on touched candidate locals below (ADVICE r4)
        fac_max = (
            float(fac_fn(np.float64(dl_by_doc.max()))) if dl_by_doc.size else 1.0
        )

    out = {"query_id": [], "doc_id": [], "score": []}
    for qid, terms in queries:
        terms = [t for t in terms if t in by_term and idf.get(t, 0.0) > 0.0]
        if not terms or len(terms) < min_match:
            continue
        # deterministic processing order: UB desc, term asc
        terms = sorted(terms, key=lambda t: (-ubs[t], t))
        suffix_ub = np.cumsum([ubs[t] for t in terms][::-1])[::-1]
        # candidate-sparse accumulation: (sorted local ids, scores) — peak
        # memory ∝ candidate postings, never segment size (a dense
        # np.zeros(seg_n) per query is ~1 GB at 10⁸-doc segments)
        cand_local = np.empty(0, dtype=np.int64)
        cand_acc = np.empty(0, dtype=np.float64)
        cand_cnt = np.empty(0, dtype=np.int64)
        restricted = False
        for i, t in enumerate(terms):
            ids, tfs, bm = by_term[t]
            if not restricted and i > 0:
                if len(terms) - i < min_match:
                    # a doc first seen now can never reach min_match terms
                    restricted = True
                else:
                    if min_match > 1:
                        sel = np.flatnonzero(cand_cnt >= min_match)
                        q = cand_acc[sel]
                        q_ids = cand_local[sel]
                    else:
                        q, q_ids = cand_acc, cand_local
                    if fac_fn is not None:
                        # candidates only — bounded by touched postings,
                        # never segment size
                        q = q * fac_fn(dl_by_doc[q_ids].astype(np.float64))
                    if q.size >= k:
                        theta = np.partition(q, q.size - k)[q.size - k]
                        if suffix_ub[i] * fac_max < theta:
                            restricted = True
            local = ids - seg_base
            w = idf[t] * tfs * (K1 + 1.0) / (
                tfs + K1 * (1.0 - B + B * dl_by_doc[local] / avgdl)
            )
            if restricted:
                # update existing candidates only: sorted-array intersection
                pos = np.searchsorted(cand_local, local)
                pos_c = np.minimum(pos, cand_local.size - 1)
                hit = cand_local[pos_c] == local
                cand_acc[pos_c[hit]] += w[hit]  # hit indices unique (both sorted-unique)
                if min_match > 1:
                    cand_cnt[pos_c[hit]] += 1
            else:
                merged = np.unique(np.concatenate([cand_local, local]))
                idx_old = np.searchsorted(merged, cand_local)
                idx_new = np.searchsorted(merged, local)
                new_acc = np.zeros(merged.size, dtype=np.float64)
                new_acc[idx_old] = cand_acc
                new_acc[idx_new] += w
                if min_match > 1:
                    new_cnt = np.zeros(merged.size, dtype=np.int64)
                    new_cnt[idx_old] = cand_cnt
                    new_cnt[idx_new] += 1
                    cand_cnt = new_cnt
                cand_local, cand_acc = merged, new_acc
        if min_match > 1:
            qual = np.flatnonzero(cand_cnt >= min_match)
            cand_local, cand_acc = cand_local[qual], cand_acc[qual]
        if cand_local.size == 0:
            continue
        if fac_fn is not None:
            # match the relational/oracle twin's double rounding exactly:
            # the base BM25 sum is a 6-decimal quantity BEFORE the boost
            final = np.round(
                np.round(cand_acc, SCORE_DECIMALS)
                * fac_fn(dl_by_doc[cand_local].astype(np.float64)),
                SCORE_DECIMALS,
            )
        else:
            final = cand_acc
        kk = min(k, cand_local.size)
        part = np.argpartition(-final, kk - 1)[:kk]
        # argpartition picks ARBITRARY members of a tied class at the kth
        # boundary; a dropped smaller-doc_id tie would then lose to a kept
        # larger one in the global merge, diverging from the oracle's
        # (score DESC, doc_id ASC) order. Widen to every boundary tie, sort
        # deterministically, THEN cut.
        cand = np.flatnonzero(final >= final[part].min())
        order = np.lexsort((cand_local[cand], -final[cand]))  # score desc, doc asc
        top = cand[order][:kk]
        out["query_id"].extend([qid] * top.size)
        out["doc_id"].extend((cand_local[top] + seg_base).tolist())
        scores = final[top] if fac_fn is not None else np.round(cand_acc[top], SCORE_DECIMALS)
        out["score"].extend(scores.tolist())
    return pd.DataFrame(out)


def _dismax_kernel(
    postings: pd.DataFrame,
    dl_by_doc: np.ndarray,
    seg_base: int,
    seg_n: int,
    queries: list[tuple[int, list[str]]],
    idf: dict[str, float],
    avgdl: float,
    k: int,
    tie: float,
    bm_scale: float = 1.0,
    deleted: np.ndarray | None = None,
) -> pd.DataFrame:
    """DisjunctionMaxQuery over one segment with MaxScore-style pruning:

        score(d) = max_t c_t(d) + tie · (Σ_t c_t(d) − max_t c_t(d))

    (the exact expression the relational twin and the SQL oracle compute —
    algebraically (1−tie)·max + tie·sum, but kept in this operation order
    so the doubles round identically). Both components are monotone in the
    matched-term set for tie ∈ [0,1], so the usual θ lower-bound argument
    carries. Terms process in UB-descending order; a doc first seen at term
    i is bounded by (1−tie)·UB_i + tie·suffix_ub(i) (UB_i is the largest
    remaining single-clause bound, suffix_ub the remaining sum bound) —
    when that falls below the current k-th candidate score, no new doc can
    enter the top-k and remaining lists only update existing candidates.
    """
    by_term: dict[str, tuple[np.ndarray, np.ndarray]] = {}
    ubs: dict[str, float] = {}
    for r in postings.itertuples(index=False):
        ids = delta_decode(r.doc_ids_bin).astype(np.int64)
        tfs = decode_varint(r.tfs_bin).astype(np.float64)
        if deleted is not None and deleted.size:
            from mtix_spark.index.deletes import mask_deleted

            keep = mask_deleted(ids, deleted)
            ids, tfs = ids[keep], tfs[keep]
        if ids.size == 0:
            continue
        bm = np.asarray(r.block_max_wtf, dtype=np.float64)
        by_term[r.term] = (ids, tfs)
        ubs[r.term] = idf.get(r.term, 0.0) * float(bm.max()) * bm_scale if bm.size else 0.0

    out = {"query_id": [], "doc_id": [], "score": []}
    for qid, terms in queries:
        terms = [t for t in terms if t in by_term and idf.get(t, 0.0) > 0.0]
        if not terms:
            continue
        terms = sorted(terms, key=lambda t: (-ubs[t], t))
        suffix_ub = np.cumsum([ubs[t] for t in terms][::-1])[::-1]
        cand_local = np.empty(0, dtype=np.int64)
        cand_sum = np.empty(0, dtype=np.float64)
        cand_max = np.empty(0, dtype=np.float64)
        restricted = False
        for i, t in enumerate(terms):
            ids, tfs = by_term[t]
            if not restricted and i > 0 and cand_local.size >= k:
                cur = cand_max + tie * (cand_sum - cand_max)
                theta = np.partition(cur, cur.size - k)[cur.size - k]
                bound = (1.0 - tie) * ubs[t] + tie * suffix_ub[i]
                if bound < theta:
                    restricted = True
            local = ids - seg_base
            w = idf[t] * tfs * (K1 + 1.0) / (
                tfs + K1 * (1.0 - B + B * dl_by_doc[local] / avgdl)
            )
            if restricted:
                pos = np.searchsorted(cand_local, local)
                pos_c = np.minimum(pos, cand_local.size - 1)
                hit = cand_local[pos_c] == local
                cand_sum[pos_c[hit]] += w[hit]
                np.maximum.at(cand_max, pos_c[hit], w[hit])
            else:
                merged = np.unique(np.concatenate([cand_local, local]))
                idx_old = np.searchsorted(merged, cand_local)
                idx_new = np.searchsorted(merged, local)
                new_sum = np.zeros(merged.size, dtype=np.float64)
                new_sum[idx_old] = cand_sum
                new_sum[idx_new] += w
                new_max = np.zeros(merged.size, dtype=np.float64)
                new_max[idx_old] = cand_max
                np.maximum.at(new_max, idx_new, w)
                cand_local, cand_sum, cand_max = merged, new_sum, new_max
        if cand_local.size == 0:
            continue
        final = np.round(
            cand_max + tie * (cand_sum - cand_max), SCORE_DECIMALS
        )
        kk = min(k, cand_local.size)
        part = np.argpartition(-final, kk - 1)[:kk]
        cand = np.flatnonzero(final >= final[part].min())
        order = np.lexsort((cand_local[cand], -final[cand]))
        top = cand[order][:kk]
        out["query_id"].extend([qid] * top.size)
        out["doc_id"].extend((cand_local[top] + seg_base).tolist())
        out["score"].extend(final[top].tolist())
    return pd.DataFrame(out)


def bm25f_topk(
    docs: DataFrame,
    fields: dict[str, float],
    queries: DataFrame,
    k: int = 100,
    id_col: str = "doc_id",
) -> DataFrame:
    """Multi-field BM25F top-k (simple BM25F, Robertson & Zaragoza): field
    term frequencies combine linearly BEFORE saturation —
        ctf(t,d) = Σ_f w_f · tf_f(t,d),   cdl(d) = Σ_f w_f · dl_f(d)
        score    = Σ_t idf(t) · ctf·(k1+1) / (ctf + k1·(1-b+b·cdl/avgdl))
    with idf over docs containing t in ANY field. This is NOT equivalent to
    concatenating fields (weights change saturation) nor to summing
    per-field BM25 (that over-saturates) — the combine must happen inside
    the kernel, which is why it's a distinct operator.

    All Catalyst: per-field tokenize+explode partials union into one
    (term, doc, ctf) aggregation — a single shuffle keyed (term, doc);
    everything else is broadcast-sized. At a physical-index scale this maps
    to per-field posting lists combined term-at-a-time in the segment
    kernel; the relational form is the oracle twin and the v1 path.

    Returns (query_id, rank, doc_id, score); ties (score DESC, doc ASC);
    scores rounded to SCORE_DECIMALS.
    """
    qt = query_terms(queries)
    terms = [r["term"] for r in qt.select("term").distinct().collect()]

    parts = []
    dl_parts = []
    for f_col, w in fields.items():
        toks = tokenize(F.col(f_col))
        parts.append(
            docs.select(F.col(id_col).alias("doc_id"), F.explode(toks).alias("term"))
            .groupBy("doc_id", "term")
            .agg((F.count(F.lit(1)) * F.lit(float(w))).alias("wtf"))
        )
        dl_parts.append(
            docs.select(
                F.col(id_col).alias("doc_id"),
                (F.size(toks) * F.lit(float(w))).alias("wdl"),
            )
        )
    tf = parts[0]
    for p in parts[1:]:
        tf = tf.unionByName(p)
    ctf = tf.groupBy("doc_id", "term").agg(F.sum("wtf").alias("ctf"))
    dl = dl_parts[0]
    for p in dl_parts[1:]:
        dl = dl.unionByName(p)
    cdl = dl.groupBy("doc_id").agg(F.sum("wdl").alias("cdl"))

    n_docs = docs.count()
    avgdl = cdl.agg(F.avg("cdl")).collect()[0][0]

    hits = ctf.filter(F.col("term").isin(terms)).join(F.broadcast(qt), "term")
    dfreq = (
        ctf.filter(F.col("term").isin(terms))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("df"))
    )
    idf = F.log(F.lit(1.0) + (F.lit(n_docs) - F.col("df") + 0.5) / (F.col("df") + 0.5))
    scored = (
        hits.join(F.broadcast(dfreq), "term")
        .join(cdl, "doc_id")
        .withColumn(
            "contrib",
            idf
            * (F.col("ctf") * (K1 + 1.0))
            / (F.col("ctf") + K1 * (1.0 - B + B * F.col("cdl") / F.lit(avgdl))),
        )
        .groupBy("query_id", "doc_id")
        .agg(F.round(F.sum("contrib"), SCORE_DECIMALS).alias("score"))
    )
    w_ = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w_))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "doc_id", "score")
    )


def lm_dirichlet_brute(
    tf: DataFrame,
    doclens: DataFrame,
    queries: DataFrame,
    total_tokens: int,
    mu: float = 2000.0,
    k: int = 100,
    candidates: DataFrame | None = None,
) -> DataFrame:
    """Query-likelihood ranking with Dirichlet smoothing — the standard
    alternative scoring family to BM25 (Zhai & Lafferty 2001; Lucene's
    LMDirichletSimilarity). Rank-equivalent decomposition that touches only
    MATCHING postings (never the full corpus):

        score(q, d) = SUM_{t in q, tf>0} ln(1 + tf / (mu * cf_t / C))
                      + n_q * ln(mu / (dl + mu))

    where cf_t = collection frequency of t, C = total corpus tokens, and
    n_q = number of distinct query terms that occur in the corpus (terms
    with cf=0 contribute nothing to any doc, so they drop from both sums).
    Only docs matching >= 1 live query term are scored — same candidate
    discipline as BM25 (the second term alone would score every doc).

    Plan shape is identical to `bm25_brute`: pushed-down term IN-filter,
    broadcast of the tiny (term, cf) and (query_id, term) relations, one
    (query_id, doc_id) aggregation, global top-k. tf: (term, doc_id, tf);
    doclens: (doc_id, dl). Returns (query_id, rank, doc_id, score) under
    the engine tie-break, scores rounded to SCORE_DECIMALS.

    `candidates` (query_id, doc_id) restricts SCORING to those pairs via a
    broadcast semi-join on the hit relation — the rescore second pass,
    where only the first-pass window may be touched. Collection statistics
    (cf, total_tokens, n_q) stay corpus-global regardless: a candidate
    filter must change WHICH docs are scored, never what a score is worth.
    """
    qt = query_terms(queries)
    terms = [r["term"] for r in qt.select("term").distinct().collect()]
    cf = (
        tf.filter(F.col("term").isin(terms))
        .groupBy("term")
        .agg(F.sum("tf").cast("double").alias("cf"))
    )
    # n_q per query = live (cf>0) distinct terms; cf relation only holds
    # terms that matched, so an inner join drops dead terms for free
    nq = (
        qt.join(F.broadcast(cf.select("term")), "term")
        .groupBy("query_id")
        .agg(F.count(F.lit(1)).cast("double").alias("n_q"))
    )
    hits = tf.filter(F.col("term").isin(terms)).join(F.broadcast(qt), "term")
    if candidates is not None:
        hits = hits.join(
            F.broadcast(candidates.select("query_id", "doc_id").distinct()),
            ["query_id", "doc_id"],
            "left_semi",
        )
    scored = (
        hits.join(F.broadcast(cf), "term")
        .withColumn(
            "contrib",
            F.log(
                F.lit(1.0)
                + F.col("tf") / (F.lit(mu) * F.col("cf") / F.lit(float(total_tokens)))
            ),
        )
        .groupBy("query_id", "doc_id")
        .agg(F.sum("contrib").alias("match_part"))
        .join(doclens, "doc_id")
        .join(F.broadcast(nq), "query_id")
        .withColumn(
            "score",
            F.round(
                F.col("match_part")
                + F.col("n_q") * F.log(F.lit(mu) / (F.col("dl") + F.lit(mu))),
                SCORE_DECIMALS,
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "doc_id", "score")
    )


def bm25_conjunctive_brute(
    tf: DataFrame,
    doclens: DataFrame,
    queries: DataFrame,
    n_docs: int,
    avgdl: float,
    k: int = 100,
    dictionary: DataFrame | None = None,
) -> DataFrame:
    """Conjunctive (AND-semantics) BM25 top-k, all Catalyst: only docs
    containing EVERY query term score (B11 — posting-list intersection,
    expressed relationally as a hit-count HAVING filter; the physical path
    is `SegmentSearcher.search_and`'s galloping numpy intersection). Same
    scoring, rounding, and tie-break as `bm25_brute`."""
    qt = query_terms(queries)
    qn = qt.groupBy("query_id").agg(F.count(F.lit(1)).alias("__n_terms"))
    terms = [r["term"] for r in qt.select("term").distinct().collect()]
    hits = tf.filter(F.col("term").isin(terms)).join(F.broadcast(qt), "term")
    if dictionary is not None:
        dfreq = dictionary.select("term", "df").filter(F.col("term").isin(terms))
    else:
        dfreq = (
            tf.filter(F.col("term").isin(terms))
            .groupBy("term")
            .agg(F.count(F.lit(1)).alias("df"))
        )
    idf = F.log(F.lit(1.0) + (F.lit(n_docs) - F.col("df") + 0.5) / (F.col("df") + 0.5))
    scored = (
        hits.join(F.broadcast(dfreq), "term")
        .join(doclens, "doc_id")
        .withColumn(
            "contrib",
            idf
            * (F.col("tf") * (K1 + 1.0))
            / (F.col("tf") + K1 * (1.0 - B + B * F.col("dl") / F.lit(avgdl))),
        )
        .groupBy("query_id", "doc_id")
        .agg(
            F.round(F.sum("contrib"), SCORE_DECIMALS).alias("score"),
            F.count(F.lit(1)).alias("__hits"),
        )
        .join(F.broadcast(qn), "query_id")
        .filter(F.col("__hits") == F.col("__n_terms"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "doc_id", "score")
    )


def _conjunctive_kernel(
    postings: pd.DataFrame,
    dl_by_doc: np.ndarray,
    seg_base: int,
    queries: list[tuple[int, list[str]]],
    idf: dict[str, float],
    avgdl: float,
    deleted: np.ndarray | None = None,
) -> pd.DataFrame:
    """AND-mode segment kernel: intersect the query terms' doc-id lists
    (rarest-first — each np.intersect1d pass shrinks the candidate set, the
    vectorized rendition of a galloping intersection), then score ONLY the
    surviving docs. Work is bounded by the smallest posting list, not the
    union — the reason conjunctive queries are cheap in inverted indexes."""
    by_term: dict[str, tuple[np.ndarray, np.ndarray]] = {}
    for r in postings.itertuples(index=False):
        ids = delta_decode(r.doc_ids_bin).astype(np.int64)
        tfs = decode_varint(r.tfs_bin).astype(np.float64)
        if deleted is not None and deleted.size:
            from mtix_spark.index.deletes import mask_deleted

            keep = mask_deleted(ids, deleted)
            ids, tfs = ids[keep], tfs[keep]
        by_term[r.term] = (ids, tfs)
    out = {"query_id": [], "doc_id": [], "score": []}
    for qid, terms in queries:
        if any(t not in by_term for t in terms) or not terms:
            continue  # a missing term in this segment → no conjunctive hit here
        order = sorted(terms, key=lambda t: by_term[t][0].size)
        cand = by_term[order[0]][0]
        rows = {order[0]: np.arange(cand.size)}
        for t in order[1:]:
            cand, ia, ib = np.intersect1d(
                cand, by_term[t][0], assume_unique=True, return_indices=True
            )
            if cand.size == 0:
                break
            rows = {u: ix[ia] for u, ix in rows.items()}
            rows[t] = ib
        if cand.size == 0:
            continue
        local = cand - seg_base
        acc = np.zeros(cand.size, dtype=np.float64)
        for t in sorted(terms):  # fixed term order → deterministic float sum
            tfs = by_term[t][1][rows[t]]
            acc += idf[t] * tfs * (K1 + 1.0) / (
                tfs + K1 * (1.0 - B + B * dl_by_doc[local] / avgdl)
            )
        out["query_id"].extend([qid] * cand.size)
        out["doc_id"].extend(cand.tolist())
        out["score"].extend(np.round(acc, SCORE_DECIMALS).tolist())
    return pd.DataFrame(out).astype(
        {"query_id": "int64", "doc_id": "int64", "score": "float64"}
    )


def term_doc_ids(spark: SparkSession, paths: IndexPaths, terms: list[str]) -> DataFrame:
    """(term, doc_id) — decoded posting doc-id lists for a term set, the
    building block for set-algebra filters (boolean MUST/MUST_NOT) over the
    physical index. One parquet scan with the term IN-filter pushed down;
    an Arrow-batched decode kernel explodes each varint cell. Tombstoned
    docs are NOT masked here: filter joins run against the already-masked
    scored relation, where a deleted doc can neither appear nor resurrect.
    Rows are bounded by the terms' postings — never corpus-sized."""
    from mtix_spark.index.build import read_manifest

    rows = spark.read.parquet(paths.postings).filter(F.col("term").isin(sorted(set(terms))))
    man = read_manifest(paths)
    if man.get("segments"):
        rows = rows.filter(F.col("seg").isin(sorted(int(s) for s in man["segments"])))

    def kern(batches):
        for pdf in batches:
            for r in pdf.itertuples(index=False):
                ids = delta_decode(r.doc_ids_bin).astype("int64")
                yield pd.DataFrame({"term": r.term, "doc_id": ids})

    return rows.select("term", "doc_ids_bin").mapInPandas(
        kern, "term string, doc_id long"
    )


def term_postings(spark: SparkSession, paths: IndexPaths, terms: list[str]) -> DataFrame:
    """(term, doc_id, tf) — fully decoded postings for a term set; the
    building block for query operators that re-combine term frequencies
    BEFORE saturation (SynonymQuery's blended tf). Same pushed-down
    term IN scan as `term_doc_ids`; the kernel decodes both varint cells.
    Rows are bounded by the terms' postings — never corpus-sized."""
    from mtix_spark.index.build import read_manifest

    rows = spark.read.parquet(paths.postings).filter(F.col("term").isin(sorted(set(terms))))
    man = read_manifest(paths)
    if man.get("segments"):
        rows = rows.filter(F.col("seg").isin(sorted(int(s) for s in man["segments"])))

    def kern(batches):
        for pdf in batches:
            for r in pdf.itertuples(index=False):
                ids = delta_decode(r.doc_ids_bin).astype("int64")
                tfs = decode_varint(r.tfs_bin).astype("int64")
                yield pd.DataFrame({"term": r.term, "doc_id": ids, "tf": tfs})

    return rows.select("term", "doc_ids_bin", "tfs_bin").mapInPandas(
        kern, "term string, doc_id long, tf long"
    )


class SegmentSearcher:
    """Reusable query handle over a built index.

    Per query the cluster moves only: (1) the term-filtered postings rows
    (≤ n_terms × n_segments rows, filter pushed to the parquet scan),
    shuffled once by seg for the kernel; (2) n_segments × k candidate rows
    into the global merge. Document lengths never ride a shuffle — each
    kernel task reads its own segment's doclens parquet directly
    (executor-local `_DL_CACHE`; on a cluster this is a DFS/object-store
    read with locality, the Lucene-style per-segment file access pattern).
    This is the latency path behind the p95 target (BASELINE.json:metric);
    the one-shot wrapper `bm25_topk_segments` skips dictionary persistence.

    A handle is a SNAPSHOT of the index at construction (Lucene
    IndexReader semantics): segment set, stats, and tombstone epoch are
    read once — reopen a new handle to observe later deletes/compactions.
    """

    def __init__(
        self,
        spark: SparkSession,
        paths: IndexPaths,
        persist: bool = True,
        df_cache_entries: int | None = 5_000_000,
    ):
        import os

        from mtix_spark.index.build import read_manifest

        self.spark = spark
        self.paths = paths
        manifest = read_manifest(paths)
        if os.path.exists(paths.stats):
            with open(paths.stats) as f:
                stats = json.load(f)
        else:
            stats = manifest.get("stats")
            if stats is None:
                raise FileNotFoundError(
                    f"no stats.json and no manifest stats under {paths.root}"
                )
        self.n_docs = stats["n_docs"]
        self.avgdl = stats["avgdl"]
        self.seg_size = stats.get("seg_size")
        # per-segment geometry from the manifest (authoritative — covers
        # streaming segments whose ids don't follow base = seg * seg_size),
        # plus the avgdl each segment's block maxima were built against so
        # MaxScore bounds can be rescaled conservatively (see _maxscore_kernel)
        self.seg_meta: dict[int, tuple[int, int, float]] = {}
        for sid, m in manifest.get("segments", {}).items():
            base = int(m["min_doc"])
            n = int(m["max_doc"]) - base + 1
            avgdl_build = float(m.get("avgdl_build", self.avgdl))
            scale = max(1.0, self.avgdl / avgdl_build) if avgdl_build > 0 else 1.0
            self.seg_meta[int(sid)] = (base, n, scale)
        # build id invalidates executor-local doclens caches across rebuilds
        try:
            self.build_id = os.path.getmtime(paths.manifest)
        except OSError:
            self.build_id = 0.0
        # tombstones (deletes.py): masked inside the kernels when present
        self.delete_epoch = int(manifest.get("delete_epoch", 0))
        self.deletes_root = os.path.join(paths.root, "deletes")
        self.has_deletes = int(manifest.get("n_deleted", 0)) > 0
        self.postings = spark.read.parquet(paths.postings)
        # the manifest is the source of truth for the live segment set:
        # orphan seg=K dirs (crash between a compaction's manifest commit
        # and its old-dir cleanup, or an aborted build) must not be scored
        # — without this filter their postings would double-count
        if self.seg_meta:
            self.postings = self.postings.filter(
                F.col("seg").isin(sorted(self.seg_meta))
            )
        from mtix_spark.index.build import read_dictionary

        # resolved through the manifest's version pointer (streaming batches
        # merge the dictionary incrementally and flip the pointer atomically)
        self.dictionary = read_dictionary(spark, paths)
        self._persisted = persist
        if persist:
            self.dictionary = self.dictionary.persist()
        # term -> df cache (misses included as 0): repeat queries skip the
        # dictionary job entirely — at 10^12 docs this holds only the terms
        # this searcher has seen, never the vocabulary, and an LRU cap
        # (df_cache_entries; None = unbounded) bounds even an adversarial
        # distinct-term stream on a long-lived serving node
        self._df_cache = _LRUCache(max_entries=df_cache_entries)
        self._df_preloaded = False

    def _df_evict(self, pinned) -> None:
        """Post-fill cache trim. A preloaded dictionary treats misses as
        true OOV (df=0 without a lookup); once anything preloaded has been
        evicted that shortcut is unsound, so downgrade to lazy lookups."""
        if self._df_cache.evict(pinned) and self._df_preloaded:
            self._df_preloaded = False

    def preload_dictionary(self, max_terms: int = 5_000_000) -> int:
        """Pull the whole (term, df) dictionary into the driver cache — the
        serving-node warm ritual (Lucene memory-maps its term dictionary the
        same way). After this, no query batch pays a dictionary job. Refuses
        vocabularies past `max_terms` (at 10^12 docs you preload the hot
        tail instead — the lazy `_df_cache` already is that). Returns the
        number of terms loaded."""
        n = self.dictionary.count()
        if n > max_terms:
            raise ValueError(
                f"dictionary has {n} terms > max_terms={max_terms}; "
                "serve with the lazy per-term cache instead"
            )
        cap = self._df_cache.max_entries
        if cap is not None and n > cap:
            raise ValueError(
                f"dictionary has {n} terms > df_cache_entries={cap}; "
                "raise the cap (or pass None) to preload, or serve with "
                "the lazy per-term cache"
            )
        for r in self.dictionary.select("term", "df").collect():
            self._df_cache[r["term"]] = r["df"]
        self._df_preloaded = True
        return n

    def _tokenize_queries(self, queries) -> list[tuple[int, list[str]]]:
        import re

        from mtix_spark.functions.text import TOKEN_SPLIT_RE

        return [
            (qid, sorted(set(t for t in re.split(TOKEN_SPLIT_RE, text.lower()) if t)))
            for qid, text in queries
        ]

    def _per_segment(
        self,
        queries: list[tuple[int, str]],
        k: int,
        term_weights: dict[str, float] | None = None,
        min_match: int = 1,
        dl_factor: str | None = None,
        dis_max_tie: float | None = None,
    ) -> DataFrame | None:
        """Per-segment candidate top-k frame, or None if no query term has
        a positive idf (OOV/empty queries). `term_weights` multiplies a
        term's idf (Lucene query-time boost `term^w`); boosted idf feeds
        both the exact scores and the MaxScore upper bounds, so pruning
        stays sound under boosts."""
        tokenized = self._tokenize_queries(queries)
        all_terms = sorted({t for _, ts in tokenized for t in ts})
        n_docs, avgdl, seg_size = self.n_docs, self.avgdl, self.seg_size

        missing = [t for t in all_terms if t not in self._df_cache]
        if missing:
            for t in missing:
                self._df_cache[t] = 0
            if not self._df_preloaded:  # after preload, misses are true OOV
                for r in self.dictionary.filter(F.col("term").isin(missing)).collect():
                    self._df_cache[r["term"]] = r["df"]
            self._df_evict(pinned=all_terms)
        tw = term_weights or {}
        idf = {
            t: tw.get(t, 1.0) * math.log(1.0 + (n_docs - df + 0.5) / (df + 0.5))
            for t in all_terms
            if (df := self._df_cache[t]) > 0 and tw.get(t, 1.0) != 0.0
        }
        if not idf:
            return None

        postings = self.postings.filter(F.col("term").isin(sorted(idf)))
        doclens_root = self.paths.doclens
        seg_meta = self.seg_meta
        build_id = self.build_id
        del_root, del_epoch = self.deletes_root, self.delete_epoch
        has_deletes = self.has_deletes

        def kernel(key, p: pd.DataFrame) -> pd.DataFrame:
            seg = int(key[0])
            if seg in seg_meta:
                base, n, scale = seg_meta[seg]
            else:  # pre-manifest fallback: uniform batch layout
                base = seg * seg_size
                n = min(seg_size, n_docs - base)
                scale = 1.0
            if not len(p):
                return pd.DataFrame({"query_id": [], "doc_id": [], "score": []}).astype(
                    {"query_id": "int64", "doc_id": "int64", "score": "float64"}
                )
            dl = _load_dl(doclens_root, seg, base, n, build_id)
            deleted = None
            if has_deletes:
                from mtix_spark.index.deletes import load_deleted

                deleted = load_deleted(del_root, seg, del_epoch)
            if dis_max_tie is not None:
                return _dismax_kernel(
                    p, dl, base, n, tokenized, idf, avgdl, k, dis_max_tie,
                    scale, deleted,
                )
            return _maxscore_kernel(
                p, dl, base, n, tokenized, idf, avgdl, k, scale, deleted,
                min_match, dl_factor,
            )

        return postings.groupBy("seg").applyInPandas(
            kernel, "query_id long, doc_id long, score double"
        )

    def search(
        self,
        queries: list[tuple[int, str]],
        k: int = 100,
        min_match: int = 1,
        dl_factor: str | None = None,
    ) -> DataFrame:
        """Top-k for a batch of (query_id, text). Returns
        (query_id, rank, doc_id, score) under the fixed tie-break.

        `min_match` ≥ 2 = Lucene minimum_should_match (only docs matching
        that many distinct query terms rank; every matched term still
        scores). `dl_factor` names a DL_FACTORS boost: FunctionScoreQuery
        with a doc-length field factor, ranked on the boosted score — both
        run through the boost/count-aware MaxScore kernel, pruning intact."""
        if dl_factor is not None and dl_factor not in DL_FACTORS:
            raise ValueError(
                f"unknown dl_factor {dl_factor!r}; registered: {sorted(DL_FACTORS)}"
            )
        if min_match < 1:
            raise ValueError(f"min_match must be >= 1, got {min_match}")
        per_seg = self._per_segment(queries, k, min_match=min_match, dl_factor=dl_factor)
        if per_seg is None:
            return self.spark.createDataFrame(
                [], "query_id long, rank int, doc_id long, score double"
            )
        w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_id"))
        return (
            per_seg.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", "rank", "doc_id", "score")
        )

    def search_dis_max(
        self,
        queries: list[tuple[int, str]],
        k: int = 100,
        tie_breaker: float = 0.3,
    ) -> DataFrame:
        """DisjunctionMaxQuery top-k over the query's term clauses: best
        clause + tie_breaker × remainder (`_dismax_kernel`, max-aware
        pruning bounds). Rank-identical to the relational
        `expand.dis_max_topk` on the same ids — they share one oracle."""
        if not 0.0 <= tie_breaker <= 1.0:
            raise ValueError(f"tie_breaker must be in [0, 1], got {tie_breaker}")
        per_seg = self._per_segment(queries, k, dis_max_tie=float(tie_breaker))
        if per_seg is None:
            return self.spark.createDataFrame(
                [], "query_id long, rank int, doc_id long, score double"
            )
        w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_id"))
        return (
            per_seg.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", "rank", "doc_id", "score")
        )

    def search_and(self, queries: list[tuple[int, str]], k: int = 100) -> DataFrame:
        """Conjunctive (AND) top-k: only docs containing EVERY query term.
        Physical plan: same pushed-down term scan, per-segment rarest-first
        posting intersection (`_conjunctive_kernel`), global top-k merge.
        Queries with any corpus-OOV term return no rows (AND semantics).
        Row-identical to `bm25_conjunctive_brute` (tested)."""
        tokenized = self._tokenize_queries(queries)
        all_terms = sorted({t for _, ts in tokenized for t in ts})
        empty = self.spark.createDataFrame(
            [], "query_id long, rank int, doc_id long, score double"
        )
        if not all_terms:
            return empty
        missing = [t for t in all_terms if t not in self._df_cache]
        if missing:
            for t in missing:
                self._df_cache[t] = 0
            if not self._df_preloaded:  # after preload, misses are true OOV
                for r in self.dictionary.filter(F.col("term").isin(missing)).collect():
                    self._df_cache[r["term"]] = r["df"]
            self._df_evict(pinned=all_terms)
        n_docs, avgdl = self.n_docs, self.avgdl
        idf = {
            t: math.log(1.0 + (n_docs - df + 0.5) / (df + 0.5))
            for t in all_terms
            if (df := self._df_cache[t]) > 0
        }
        # AND semantics: drop whole queries containing an OOV term
        live = [(qid, ts) for qid, ts in tokenized if ts and all(t in idf for t in ts)]
        if not live:
            return empty
        live_terms = sorted({t for _, ts in live for t in ts})
        postings = self.postings.filter(F.col("term").isin(live_terms))
        doclens_root = self.paths.doclens
        seg_meta, seg_size = self.seg_meta, self.seg_size
        build_id = self.build_id
        del_root, del_epoch = self.deletes_root, self.delete_epoch
        has_deletes = self.has_deletes

        def kernel(key, p: pd.DataFrame) -> pd.DataFrame:
            seg = int(key[0])
            if seg in seg_meta:
                base, n, _ = seg_meta[seg]
            else:
                base = seg * seg_size
                n = min(seg_size, n_docs - base)
            if not len(p):
                return pd.DataFrame({"query_id": [], "doc_id": [], "score": []}).astype(
                    {"query_id": "int64", "doc_id": "int64", "score": "float64"}
                )
            dl = _load_dl(doclens_root, seg, base, n, build_id)
            deleted = None
            if has_deletes:
                from mtix_spark.index.deletes import load_deleted

                deleted = load_deleted(del_root, seg, del_epoch)
            return _conjunctive_kernel(p, dl, base, live, idf, avgdl, deleted)

        per_seg = postings.groupBy("seg").applyInPandas(
            kernel, "query_id long, doc_id long, score double"
        )
        w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_id"))
        return (
            per_seg.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", "rank", "doc_id", "score")
        )

    def search_warm(
        self,
        queries: list[tuple[int, str]],
        k: int = 100,
        min_match: int = 1,
        dl_factor: str | None = None,
    ) -> pd.DataFrame:
        """Serving-path variant: term posting rows are fetched ONCE per
        cold term (one Spark job with the IN-filter pushed to the scan) and
        cached on the handle; warm queries then run the SAME per-segment
        kernels driver-side — zero Spark jobs, single-digit-ms latency.
        This is the query-node architecture (a node holds its hot shard in
        memory); results are row-identical to `search()` (same kernels,
        same tie-break, same tombstone masks — tested).

        Cache footprint is only the terms this handle has served (never the
        vocabulary); doc lengths load per segment through the same
        `_DL_CACHE` the executors use."""
        if dl_factor is not None and dl_factor not in DL_FACTORS:
            raise ValueError(
                f"unknown dl_factor {dl_factor!r}; registered: {sorted(DL_FACTORS)}"
            )
        if min_match < 1:
            raise ValueError(f"min_match must be >= 1, got {min_match}")
        tokenized = self._tokenize_queries(queries)
        all_terms = sorted({t for _, ts in tokenized for t in ts})
        empty = pd.DataFrame(
            {"query_id": [], "rank": [], "doc_id": [], "score": []}
        ).astype({"query_id": "int64", "rank": "int64", "doc_id": "int64",
                  "score": "float64"})
        if not all_terms:
            return empty
        missing = [t for t in all_terms if t not in self._df_cache]
        if missing:
            for t in missing:
                self._df_cache[t] = 0
            if not self._df_preloaded:  # after preload, misses are true OOV
                for r in self.dictionary.filter(F.col("term").isin(missing)).collect():
                    self._df_cache[r["term"]] = r["df"]
            self._df_evict(pinned=all_terms)
        idf = {
            t: math.log(1.0 + (self.n_docs - df + 0.5) / (df + 0.5))
            for t in all_terms
            if (df := self._df_cache[t]) > 0
        }
        if not idf:
            return empty
        if not hasattr(self, "_warm_rows"):
            self._warm_rows: dict[str, list] = {}
        cold = [t for t in idf if t not in self._warm_rows]
        if cold:
            for t in cold:
                self._warm_rows[t] = []
            for r in (
                self.postings.filter(F.col("term").isin(cold))
                .select("term", "seg", "doc_ids_bin", "tfs_bin", "block_max_wtf")
                .collect()
            ):
                self._warm_rows[r["term"]].append(r)
        by_seg: dict[int, list] = {}
        for t in idf:
            for r in self._warm_rows[t]:
                by_seg.setdefault(int(r["seg"]), []).append(r)
        parts = []
        for seg, rows in sorted(by_seg.items()):
            if seg in self.seg_meta:
                base, n, scale = self.seg_meta[seg]
            else:
                base = seg * self.seg_size
                n = min(self.seg_size, self.n_docs - base)
                scale = 1.0
            dl = _load_dl(self.paths.doclens, seg, base, n, self.build_id)
            deleted = None
            if self.has_deletes:
                from mtix_spark.index.deletes import load_deleted

                deleted = load_deleted(self.deletes_root, seg, self.delete_epoch)
            p = pd.DataFrame(
                {
                    "term": [r["term"] for r in rows],
                    "doc_ids_bin": [r["doc_ids_bin"] for r in rows],
                    "tfs_bin": [r["tfs_bin"] for r in rows],
                    "block_max_wtf": [r["block_max_wtf"] for r in rows],
                }
            )
            parts.append(
                _maxscore_kernel(
                    p, dl, base, n, tokenized, idf, self.avgdl, k, scale, deleted,
                    min_match, dl_factor,
                )
            )
        if not parts:
            return empty
        pdf = pd.concat(parts, ignore_index=True)
        if not len(pdf):
            return empty
        pdf = pdf.sort_values(
            ["query_id", "score", "doc_id"], ascending=[True, False, True],
            kind="mergesort",
        )
        pdf = pdf.groupby("query_id", sort=True).head(k).reset_index(drop=True)
        pdf["rank"] = pdf.groupby("query_id").cumcount() + 1
        return pdf[["query_id", "rank", "doc_id", "score"]].astype(
            {"query_id": "int64", "rank": "int64", "doc_id": "int64",
             "score": "float64"}
        )

    def search_topk(
        self,
        queries: list[tuple[int, str]],
        k: int = 100,
        min_match: int = 1,
        dl_factor: str | None = None,
        dis_max_tie: float | None = None,
    ) -> pd.DataFrame:
        """Latency-path variant: per-segment candidates collect to the
        driver (≤ n_segments × k × n_queries tiny rows) and merge there —
        one Spark job, no window exchange stage. Same results as
        `search()` (same kernel, same tie-break, same DSL modes); returns
        a pandas frame (query_id, rank, doc_id, score).

        `dis_max_tie` switches to the DisjunctionMax kernel (same semantics
        as `search_dis_max`, driver-side merge) so per-query latency probes
        measure the SAME execution shape across all DSL modes (ADVICE r4);
        mutually exclusive with min_match/dl_factor, like the kernels."""
        if dl_factor is not None and dl_factor not in DL_FACTORS:
            raise ValueError(
                f"unknown dl_factor {dl_factor!r}; registered: {sorted(DL_FACTORS)}"
            )
        if min_match < 1:
            raise ValueError(f"min_match must be >= 1, got {min_match}")
        if dis_max_tie is not None:
            if min_match > 1 or dl_factor is not None:
                raise ValueError(
                    "dis_max_tie cannot combine with min_match/dl_factor"
                )
            if not 0.0 <= dis_max_tie <= 1.0:
                raise ValueError(
                    f"dis_max_tie must be in [0, 1], got {dis_max_tie}"
                )
        per_seg = self._per_segment(
            queries, k, min_match=min_match, dl_factor=dl_factor,
            dis_max_tie=dis_max_tie,
        )
        if per_seg is None:
            return pd.DataFrame(
                {"query_id": [], "rank": [], "doc_id": [], "score": []}
            ).astype({"query_id": "int64", "rank": "int64", "doc_id": "int64",
                      "score": "float64"})
        pdf = per_seg.toPandas()
        pdf = pdf.sort_values(
            ["query_id", "score", "doc_id"], ascending=[True, False, True],
            kind="mergesort",
        )
        pdf = pdf.groupby("query_id", sort=True).head(k).reset_index(drop=True)
        pdf["rank"] = pdf.groupby("query_id").cumcount() + 1
        return pdf[["query_id", "rank", "doc_id", "score"]]

    def close(self) -> None:
        if self._persisted:
            self.dictionary.unpersist()


def bm25_topk_segments(
    spark: SparkSession,
    paths: IndexPaths,
    queries: list[tuple[int, str]],
    k: int = 100,
    min_match: int = 1,
    dl_factor: str | None = None,
) -> DataFrame:
    """One-shot top-k over the physical segment index."""
    return SegmentSearcher(spark, paths, persist=False).search(
        queries, k, min_match=min_match, dl_factor=dl_factor
    )


class MergedSearcher:
    """Serving handle over the MERGED global posting lists (merge_postings
    output) — the low-latency path that consumes B5's term-partitioned
    lists.

    Cold terms cost one Spark job (term IN-filter pushed to the parquet
    scan — one object-store fetch per term, the classic term-sharded
    serving layout); fetched lists and the doc-length table are cached on
    the handle, so repeat/warm queries are pure driver-side numpy with NO
    Spark job at all — single-digit-ms latency, which is the honest serving
    architecture (a query node holding its hot term shard). Misses are
    negative-cached.

    Scoring is term-at-a-time with candidate-sparse accumulation: posting
    doc ids are concatenated, uniqued, and contributions summed with
    np.add.at — memory ∝ candidate postings, never corpus size. Results are
    rank-identical to the segment path and the brute oracle (tested);
    tie-break (score DESC, doc_id ASC); scores rounded to SCORE_DECIMALS.

    Doc-length state is lazy and block-sparse: dl loads in fixed-size
    doc-range blocks (`dl_block` docs each), and ONLY the blocks covered by
    the posting lists actually fetched — a handle serving queries that hit
    one term shard holds dl memory ∝ the doc ranges those postings touch,
    never corpus size. Tombstones likewise load per segment, only for
    segments whose doc range intersects fetched postings. That is the
    10¹²-doc sharded-serving story expressed in code, not prose.
    """

    DL_BLOCK_DEFAULT = 1 << 18  # docs per lazily-loaded dl block

    def __init__(
        self,
        spark: SparkSession,
        paths: IndexPaths,
        dl_block: int | None = None,
        term_cache_bytes: int | None = 512 << 20,
        dl_cache_bytes: int | None = 512 << 20,
    ):
        import os

        self.spark = spark
        self.paths = paths
        with open(paths.stats) as f:
            stats = json.load(f)
        self.n_docs, self.avgdl = stats["n_docs"], stats["avgdl"]
        self.merged_dir = os.path.join(paths.root, "merged")
        # posting + dl caches are LRU-capped by BYTE budget (None =
        # unbounded): a long-lived serving node streaming distinct terms
        # holds at most term_cache_bytes of postings and dl_cache_bytes of
        # doc-length blocks, evicting cold entries, never the current
        # call's working set
        self._terms = _LRUCache(
            max_bytes=term_cache_bytes,
            sizeof=lambda v: 0 if v is None else v[0].nbytes + v[1].nbytes,
        )
        self.dl_block = int(dl_block or self.DL_BLOCK_DEFAULT)
        self._dl_blocks = _LRUCache(
            max_bytes=dl_cache_bytes, sizeof=lambda a: a.nbytes
        )
        from mtix_spark.index.build import read_manifest

        man = read_manifest(paths)
        self._has_deletes = int(man.get("n_deleted", 0)) > 0
        self._delete_epoch = int(man.get("delete_epoch", 0))
        # (min_doc, max_doc, seg) sorted by min_doc — drives both the lazy
        # dl block loads and the per-segment tombstone loads
        self._seg_ranges = sorted(
            (int(m["min_doc"]), int(m["max_doc"]), int(s))
            for s, m in man["segments"].items()
        )
        self._del_segs: dict[int, np.ndarray] = {}
        self._del_merged: dict[tuple, np.ndarray] = {}

    def _segs_overlapping(self, lo: int, hi: int) -> list[int]:
        return [s for mn, mx, s in self._seg_ranges if mx >= lo and mn <= hi]

    def _deleted_for(self, lo: int, hi: int) -> np.ndarray:
        """Sorted tombstones restricted to segments intersecting [lo, hi] —
        loaded per segment on first touch, never the global union. The
        merged array is memoized per contributing segment-id tuple: _fetch
        calls this once per posting list, and common terms share the same
        segment cover, so the concat+unique runs once per cover, not per
        term."""
        import os

        from mtix_spark.index.deletes import load_deleted

        root = os.path.join(self.paths.root, "deletes")
        segs = tuple(self._segs_overlapping(lo, hi))
        hit = self._del_merged.get(segs)
        if hit is not None:
            return hit
        parts = []
        for s in segs:
            if s not in self._del_segs:
                self._del_segs[s] = load_deleted(root, s, self._delete_epoch)
            if self._del_segs[s].size:
                parts.append(self._del_segs[s])
        out = (
            np.unique(np.concatenate(parts))
            if parts
            else np.empty(0, dtype=np.int64)
        )
        self._del_merged[segs] = out
        return out

    def _load_dl_block(self, b: int) -> np.ndarray:
        """dl values for docs [b*dl_block, (b+1)*dl_block) — reads only the
        doclens files of segments overlapping that range."""
        import glob
        import os

        import pyarrow.parquet as pq

        lo, hi = b * self.dl_block, (b + 1) * self.dl_block - 1
        arr = np.zeros(self.dl_block, dtype=np.float64)
        for s in self._segs_overlapping(lo, hi):
            for f in glob.glob(
                os.path.join(self.paths.doclens, f"seg={s}", "*.parquet")
            ):
                t = pq.read_table(f, columns=["doc_id", "dl"])
                ids = t["doc_id"].to_numpy()
                m = (ids >= lo) & (ids <= hi)
                arr[ids[m] - lo] = t["dl"].to_numpy()[m]
        return arr

    def _dl_for(self, ids: np.ndarray) -> np.ndarray:
        """Per-doc dl lookup through the lazy block cache; loads only the
        blocks the given ids touch (memory ∝ touched doc ranges)."""
        blocks = np.unique(ids // self.dl_block)
        out = np.empty(ids.size, dtype=np.float64)
        for b in blocks:
            bi = int(b)
            if bi not in self._dl_blocks:
                self._dl_blocks[bi] = self._load_dl_block(bi)
            m = ids // self.dl_block == b
            out[m] = self._dl_blocks[bi][ids[m] - bi * self.dl_block]
        self._dl_blocks.evict(pinned=(int(b) for b in blocks))
        return out

    def _fetch(self, terms: list[str]) -> None:
        missing = [t for t in terms if t not in self._terms]
        if not missing:
            return
        for t in missing:
            self._terms[t] = None  # negative cache unless the scan finds it
        rows = (
            self.spark.read.parquet(self.merged_dir)
            .filter(F.col("term").isin(missing))
            .select("term", "df", "doc_ids_bin", "tfs_bin")
            .collect()
        )
        for r in rows:
            ids = delta_decode(r["doc_ids_bin"]).astype(np.int64)
            tfs = decode_varint(r["tfs_bin"]).astype(np.float64)
            if self._has_deletes and ids.size:
                from mtix_spark.index.deletes import mask_deleted

                # ids are delta-decoded ascending → min/max are the ends;
                # only tombstones of segments this list touches load
                keep = mask_deleted(
                    ids, self._deleted_for(int(ids[0]), int(ids[-1]))
                )
                ids, tfs = ids[keep], tfs[keep]
            # df stays the BUILD-time document frequency until a purge
            # (Lucene deletes semantics — scores use stale stats)
            self._terms[r["term"]] = (ids, tfs, int(r["df"]))
        self._terms.evict(pinned=terms)

    def search(
        self,
        queries: list[tuple[int, str]],
        k: int = 100,
        min_match: int = 1,
        dl_factor: str | None = None,
    ) -> pd.DataFrame:
        """`min_match` / `dl_factor` carry the same DSL semantics as
        SegmentSearcher.search; this path accumulates exhaustively (no
        pruning), so the filter is a count mask over the unique candidate
        ids and the boost a post-round multiply against the lazily-loaded
        dl blocks — identical results to the segment path (tested)."""
        import re

        from mtix_spark.functions.text import TOKEN_SPLIT_RE

        if dl_factor is not None and dl_factor not in DL_FACTORS:
            raise ValueError(
                f"unknown dl_factor {dl_factor!r}; registered: {sorted(DL_FACTORS)}"
            )
        if min_match < 1:
            raise ValueError(f"min_match must be >= 1, got {min_match}")
        tokenized = [
            (qid, sorted({t for t in re.split(TOKEN_SPLIT_RE, text.lower()) if t}))
            for qid, text in queries
        ]
        all_terms = sorted({t for _, ts in tokenized for t in ts})
        out_empty = pd.DataFrame(
            {"query_id": [], "rank": [], "doc_id": [], "score": []}
        ).astype({"query_id": "int64", "rank": "int64", "doc_id": "int64",
                  "score": "float64"})
        if not all_terms:
            return out_empty
        self._fetch(all_terms)
        if not any(self._terms.get(t) for t in all_terms):
            return out_empty
        n_docs, avgdl = self.n_docs, self.avgdl

        out = {"query_id": [], "rank": [], "doc_id": [], "score": []}
        for qid, terms in tokenized:
            terms = [t for t in terms if self._terms.get(t) is not None]
            if not terms:
                continue
            cat_ids, cat_contrib = [], []
            for t in terms:  # fixed ascending term order → deterministic sum
                ids, tfs, df = self._terms[t]
                idf = math.log(1.0 + (n_docs - df + 0.5) / (df + 0.5))
                w = idf * tfs * (K1 + 1.0) / (
                    tfs + K1 * (1.0 - B + B * self._dl_for(ids) / avgdl)
                )
                cat_ids.append(ids)
                cat_contrib.append(w)
            ids = np.concatenate(cat_ids)
            contrib = np.concatenate(cat_contrib)
            if ids.size == 0:
                # every posting of every query term is tombstoned — a
                # fully-deleted term stays in the cache as empty arrays;
                # the query returns no rows rather than crashing the batch
                continue
            uniq, inv = np.unique(ids, return_inverse=True)
            acc = np.zeros(uniq.size, dtype=np.float64)
            np.add.at(acc, inv, contrib)
            if min_match > 1:
                cnt = np.zeros(uniq.size, dtype=np.int64)
                np.add.at(cnt, inv, 1)  # ids unique per term → term count
                keep = cnt >= min_match
                uniq, acc = uniq[keep], acc[keep]
                if uniq.size == 0:
                    continue
            if dl_factor is not None:
                final = np.round(
                    np.round(acc, SCORE_DECIMALS)
                    * DL_FACTORS[dl_factor](self._dl_for(uniq).astype(np.float64)),
                    SCORE_DECIMALS,
                )
            else:
                final = acc
            kk = min(k, uniq.size)
            part = np.argpartition(-final, kk - 1)[:kk]
            # argpartition picks ARBITRARY members of a tied class at the
            # boundary; widen to every boundary tie, then break ties
            # deterministically (score DESC, doc_id ASC) before cutting
            cand = np.flatnonzero(final >= final[part].min())
            order = np.lexsort((uniq[cand], -final[cand]))
            top = cand[order][:kk]
            out["query_id"].extend([qid] * kk)
            out["rank"].extend(range(1, kk + 1))
            out["doc_id"].extend(uniq[top].tolist())
            scores = (
                final[top]
                if dl_factor is not None
                else np.round(acc[top], SCORE_DECIMALS)
            )
            out["score"].extend(scores.tolist())
        return pd.DataFrame(out).astype(
            {"query_id": "int64", "rank": "int64", "doc_id": "int64",
             "score": "float64"}
        )


def merged_topk(
    spark: SparkSession,
    paths: IndexPaths,
    queries: list[tuple[int, str]],
    k: int = 100,
) -> pd.DataFrame:
    """One-shot top-k over the merged posting lists (cold MergedSearcher)."""
    return MergedSearcher(spark, paths).search(queries, k)


def lm_dirichlet_index(
    spark: SparkSession,
    paths: "IndexPaths",
    queries: DataFrame | list,
    mu: float = 2000.0,
    k: int = 100,
) -> DataFrame:
    """LM-Dirichlet ranking over the PHYSICAL index — the second scoring
    family on the same postings the BM25 kernels read. Decoded term
    postings (pushed-down term IN scan) + docmap doc lengths feed the
    exact rank decomposition of `lm_dirichlet_brute`, so the two paths
    share one oracle. Tombstones anti-join out of both relations and the
    collection statistics (LM smoothing depends on cf/C, so unlike BM25's
    Lucene-style stale stats, deleted tokens must leave the denominator —
    otherwise smoothed probabilities drift from the rebuilt-index answer).

    total tokens C comes from one docmap aggregation; a serving deployment
    would cache it in stats.json at build time (noted, not needed here —
    the agg is a column-pruned scan of the (doc_id, dl) relation).
    """
    from mtix_spark.index.build import read_manifest

    qdf = _queries_df(spark, queries)
    qt = query_terms(qdf)
    terms = [r["term"] for r in qt.select("term").distinct().collect()]
    tf = term_postings(spark, paths, terms)
    dl = spark.read.parquet(paths.doclens).select(
        "doc_id", F.col("dl").cast("double").alias("dl")
    )
    man = read_manifest(paths)
    if int(man.get("n_deleted", 0)) > 0:
        import os as _os

        dead = spark.read.parquet(_os.path.join(paths.root, "deletes")).select(
            "doc_id"
        )
        tf = tf.join(dead, "doc_id", "left_anti")
        dl = dl.join(dead, "doc_id", "left_anti")
    total = int(dl.agg(F.sum("dl")).collect()[0][0])
    return lm_dirichlet_brute(tf, dl, qdf, total, mu=mu, k=k)


def total_hits_index(
    spark: SparkSession,
    paths: "IndexPaths",
    queries: list[tuple[int, str]],
    conjunctive: bool = False,
) -> DataFrame:
    """(query_id, n_hits) — matching-doc counts straight off the posting
    sets (IndexSearcher.count over the physical index): disjunctive =
    count of the union, conjunctive = count of the intersection. Touches
    only doc-id cells (tfs/block-max columns pruned from the scan);
    tombstones anti-join out so counts match a rebuilt index."""
    from mtix_spark.index.build import read_manifest

    qdf = _queries_df(spark, queries)
    qt = query_terms(qdf)
    terms = [r["term"] for r in qt.select("term").distinct().collect()]
    ids = term_doc_ids(spark, paths, terms)
    man = read_manifest(paths)
    if int(man.get("n_deleted", 0)) > 0:
        import os as _os

        dead = spark.read.parquet(_os.path.join(paths.root, "deletes")).select(
            "doc_id"
        )
        ids = ids.join(dead, "doc_id", "left_anti")
    hit = ids.join(F.broadcast(qt), "term")
    if conjunctive:
        n_terms = qt.groupBy("query_id").agg(F.count(F.lit(1)).alias("n_terms"))
        per_doc = hit.groupBy("query_id", "doc_id").agg(
            F.count(F.lit(1)).alias("n_match")
        )
        counted = (
            per_doc.join(F.broadcast(n_terms), "query_id")
            .filter(F.col("n_match") == F.col("n_terms"))
            .groupBy("query_id")
            .agg(F.count(F.lit(1)).alias("n_hits"))
        )
    else:
        counted = hit.groupBy("query_id").agg(
            F.countDistinct("doc_id").alias("n_hits")
        )
    all_q = qdf.select("query_id").distinct()
    return all_q.join(counted, "query_id", "left").select(
        "query_id", F.coalesce("n_hits", F.lit(0)).alias("n_hits")
    )


def get_docs(
    spark: SparkSession, paths: "IndexPaths", doc_ids: list[int]
) -> DataFrame:
    """Stored-fields lookup by dense doc id (IndexReader.document()):
    (doc_id, dl, repo, path, commit, lang, content_sha256) for the
    requested ids. The doc_id IN-filter pushes into the docmap parquet
    scan, and because docmap partitions are doc-range-disjoint (`seg=K`
    holds one contiguous id range) the scan prunes to the few segments
    the ids fall in — a point lookup, not a corpus pass. Tombstoned docs
    return no row (a deleted doc is gone from the reader's view)."""
    from mtix_spark.index.build import read_manifest

    ids = sorted({int(i) for i in doc_ids})
    dm = spark.read.parquet(paths.docmap).filter(F.col("doc_id").isin(ids))
    man = read_manifest(paths)
    if int(man.get("n_deleted", 0)) > 0:
        import os as _os

        dead = spark.read.parquet(_os.path.join(paths.root, "deletes")).select(
            "doc_id"
        )
        dm = dm.join(dead, "doc_id", "left_anti")
    return dm.select(
        "doc_id", "dl", "repo", "path", "commit", "lang", "content_sha256"
    )
