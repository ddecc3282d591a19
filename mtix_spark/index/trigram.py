"""Trigram substring/regex index — code-search candidate pruning.

The north-rule corpus is source-code repositories; the canonical way to
serve substring and regex queries over 10^12 files without scanning them
is a trigram index (R. Cox, "Regular Expression Matching with a Trigram
Index", 2012 — the Google Code Search design; Zoekt uses the same layout).
The reference has no content-substring surface at all (its retrieval is an
opaque remote model, /root/reference/src/mtix/predictors.py:22-35); this
widens the replacement engine the way codesearch widens grep.

Build
-----
Per segment, one posting row per distinct 3-char substring of the raw
(case-sensitive) ``content``: ``gram -> sorted delta+varint doc ids``.
Gram extraction is one flat Arrow/numpy pass per batch (sentinel-joined
codepoint array, sliding windows, structured-dtype unique) — no per-char
Python. A global gram dictionary ``(gram, df)`` is tiny (bounded by the
charset cubed, Heaps-flat) and is written alongside for query-time gram
selection. Build cost is O(total content chars), the inherent trigram
index cost; per-doc distinct + map-side partial agg bound the shuffle.

Query
-----
A needle of length >= 3 must contain every one of its trigrams, so any
SUBSET of those trigrams gives a sound candidate over-approximation.  The
query layer picks the ``GRAMS_PER_NEEDLE`` rarest grams (by dictionary
df) and AND-intersects their posting lists SEGMENT-LOCALLY: segments are
doc-range-disjoint, so each segment's numpy kernel (sorted-array
union-within-class, ascending-size intersection across classes) produces
its slice of the global candidate set with no exploded rows, no global
shuffle, and no distinct — cost ∝ sum of selected posting lengths, never
corpus size.  Verification (``contains``/``regexp_like``) then runs on
candidates only, broadcast into the corpus scan when the free driver-side
candidate bound fits (content bytes never shuffle), else via a
width-pinned shuffle join.  If any required gram is absent from the dictionary the needle
cannot match and the branch short-circuits to empty without touching the
corpus.  Regex patterns go through a conservative mandatory-literal
extraction per top-level alternation branch (literals inside groups,
classes, or under quantifiers are ignored); a branch with no mandatory
literal of length >= 3 — and any needle shorter than 3 chars — falls back
to a full verify scan, the documented honest fallback.
"""

from __future__ import annotations

import json
import os
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mtix_spark.index.codec import delta_decode, encode_varint_with_sizes
from mtix_spark.table_io import DEFAULT_IO

TRIGRAM_N = 3
GRAMS_PER_NEEDLE = 8  # rarest grams kept per needle/literal group
# Verify-join gate: when the driver-side candidate upper bound (sum of the
# rarest class's df per live query/branch — free from the dictionary lookup)
# fits this many rows, the candidate set is BROADCAST into the corpus scan:
# content bytes never shuffle and the verify runs at file-scan width.  Past
# the bound (hot-gram needles at corpus scale) the shuffle path takes over.
# 4M rows x 2 longs ≈ 64 MB hashed — comfortably under executor memory.
BROADCAST_CANDIDATE_ROWS = 4_000_000
_SENTINEL = np.uint32(0xFFFFFFFF)  # not a codepoint; joins docs in one array


# --------------------------------------------------------------------------
# build
# --------------------------------------------------------------------------


def _batch_doc_grams(ids: np.ndarray, texts) -> tuple[np.ndarray, np.ndarray]:
    """(doc_id, gram) distinct pairs for one Arrow batch, flat-vectorized.

    All docs' UTF-32 codepoints are concatenated with double sentinels so
    one sliding_window_view covers the batch; windows touching a sentinel
    are masked out; per-(doc, gram) distinct runs on a structured dtype so
    gram STRINGS materialize only once per distinct gram."""
    from numpy.lib.stride_tricks import sliding_window_view

    arrs = [
        np.frombuffer(t.encode("utf-32-le"), dtype=np.uint32)
        if isinstance(t, str) and t
        else np.empty(0, dtype=np.uint32)
        for t in texts
    ]
    n = len(arrs)
    lens = np.fromiter((a.size for a in arrs), dtype=np.int64, count=n)
    pieces = []
    sep = np.full(TRIGRAM_N - 1, _SENTINEL, dtype=np.uint32)
    for a in arrs:
        pieces.append(a)
        pieces.append(sep)
    concat = np.concatenate(pieces) if pieces else np.empty(0, dtype=np.uint32)
    if concat.size < TRIGRAM_N:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=object)
    w = sliding_window_view(concat, TRIGRAM_N)
    bad = concat == _SENTINEL
    valid = ~(bad[:-2] | bad[1:-1] | bad[2:])
    if not valid.any():
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=object)
    # window start position -> owning doc
    owner = np.repeat(np.arange(n, dtype=np.int64), lens + (TRIGRAM_N - 1))
    starts = np.flatnonzero(valid)
    parents = owner[starts]
    wc = np.ascontiguousarray(w[valid])
    rec = np.empty(wc.shape[0], dtype=[("p", "<i8"), ("g", "V12")])
    rec["p"] = parents
    rec["g"] = wc.view("V12").ravel()
    uniq = np.unique(rec)
    ug, inv = np.unique(uniq["g"], return_inverse=True)
    gram_strs = np.array(
        [bytes(x).decode("utf-32-le") for x in ug], dtype=object
    )
    return ids[uniq["p"]], gram_strs[inv]


def _encode_segment_grams(pdf: pd.DataFrame) -> pd.DataFrame:
    """One segment's (gram, doc_id) rows -> posting rows, vectorized like
    build._build_segment_postings (factorize + lexsort + masked diff + one
    bulk varint encode sliced by byte offsets)."""
    seg = int(pdf["seg"].iloc[0])
    codes_unsorted, uniques = pd.factorize(pdf["gram"], sort=True)
    order = np.lexsort((pdf["doc_id"].to_numpy(), codes_unsorted))
    codes = codes_unsorted[order]
    doc_ids = pdf["doc_id"].to_numpy()[order].astype(np.uint64)
    change = np.empty(codes.size, dtype=bool)
    change[0] = True
    change[1:] = codes[1:] != codes[:-1]
    starts = np.flatnonzero(change)
    ends = np.append(starts[1:], codes.size)
    deltas = doc_ids.copy()
    deltas[1:] -= doc_ids[:-1]
    deltas[starts] = doc_ids[starts]
    buf, nb = encode_varint_with_sizes(deltas)
    off = np.zeros(codes.size + 1, dtype=np.int64)
    np.cumsum(nb, out=off[1:])
    mv = memoryview(buf)
    bins = [bytes(mv[off[s] : off[e]]) for s, e in zip(starts, ends)]
    return pd.DataFrame(
        {
            "gram": np.asarray(uniques, dtype=object)[codes[starts]],
            "seg": np.full(starts.size, seg, dtype=np.int32),
            "df_seg": (ends - starts).astype(np.int32),
            "doc_ids_bin": bins,
            "min_doc": doc_ids[starts].astype(np.int64),
            "max_doc": doc_ids[ends - 1].astype(np.int64),
        }
    )


class TrigramPaths:
    def __init__(self, root: str):
        self.root = root
        self.postings = os.path.join(root, "tri_postings")
        self.dictionary = os.path.join(root, "tri_dictionary")
        self.meta = os.path.join(root, "trigram_meta.json")


def build_trigram_index(
    spark: SparkSession, docs: DataFrame, root: str, n_segments: int = 16
) -> TrigramPaths:
    """Build the trigram posting index under ``root``.

    docs: any relation with (doc_id long, content string) — e.g. the
    assign_doc_ids output.  Segments are doc-id ranges exactly like the
    term index (build.build_index), so per-segment deltas stay small.
    Writes seg-partitioned postings, the global gram dictionary, and
    commits a meta manifest LAST (the same data-first/atomic-pointer-flip
    discipline as the term index)."""
    paths = TrigramPaths(root)
    max_id = docs.agg(F.max("doc_id")).collect()[0][0]
    if max_id is None:
        max_id = 0
    seg_size = max(1, -(-(int(max_id) + 1) // n_segments))
    docs = docs.withColumn(
        "seg", (F.col("doc_id") / F.lit(seg_size)).cast("int")
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, grams = _batch_doc_grams(
                pdf["doc_id"].to_numpy(), pdf["content"].tolist()
            )
            if ids.size == 0:
                continue
            seg_of = dict(
                zip(pdf["doc_id"].to_numpy(), pdf["seg"].to_numpy())
            )
            yield pd.DataFrame(
                {
                    "seg": np.array(
                        [seg_of[i] for i in ids], dtype=np.int32
                    ),
                    "gram": grams,
                    "doc_id": ids,
                }
            )

    pairs = docs.select("doc_id", "seg", "content").mapInPandas(
        kernel, "seg int, gram string, doc_id long"
    )
    postings = pairs.groupBy("seg").applyInPandas(
        _encode_segment_grams,
        "gram string, seg int, df_seg int, doc_ids_bin binary, "
        "min_doc long, max_doc long",
    )
    DEFAULT_IO.overwrite_partitions(postings, paths.postings, "seg")
    written = spark.read.parquet(paths.postings)
    gd = written.groupBy("gram").agg(
        F.sum("df_seg").cast("long").alias("df")
    )
    DEFAULT_IO.overwrite(gd, paths.dictionary)
    n_grams = spark.read.parquet(paths.dictionary).count()
    DEFAULT_IO.commit_manifest(
        paths.meta,
        {"gram": TRIGRAM_N, "n_grams": int(n_grams), "seg_size": seg_size,
         "n_segments": n_segments},
    )
    return paths


# --------------------------------------------------------------------------
# regex mandatory-literal extraction (conservative)
# --------------------------------------------------------------------------

_CLASS_ESCAPES = set("dDwWsSbBAZzG0123456789")


def split_alternation(pattern: str) -> list[str]:
    """Split on top-level ``|`` (depth 0, outside classes, not escaped)."""
    branches, buf, depth, i = [], [], 0, 0
    while i < len(pattern):
        ch = pattern[i]
        if ch == "\\" and i + 1 < len(pattern):
            buf.append(pattern[i : i + 2])
            i += 2
            continue
        if ch == "[":
            j = _skip_class(pattern, i)
            buf.append(pattern[i:j])
            i = j
            continue
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth = max(0, depth - 1)
        elif ch == "|" and depth == 0:
            branches.append("".join(buf))
            buf = []
            i += 1
            continue
        buf.append(ch)
        i += 1
    branches.append("".join(buf))
    return branches


def _skip_class(pat: str, i: int) -> int:
    """Index one past the ``]`` closing the class opened at pat[i]=='['."""
    j = i + 1
    if j < len(pat) and pat[j] == "^":
        j += 1
    if j < len(pat) and pat[j] == "]":
        j += 1
    while j < len(pat):
        if pat[j] == "\\":
            j += 2
            continue
        if pat[j] == "]":
            return j + 1
        j += 1
    return j


def _skip_group(pat: str, i: int) -> int:
    """Index one past the ``)`` matching the ``(`` at pat[i]."""
    depth, j = 0, i
    while j < len(pat):
        ch = pat[j]
        if ch == "\\":
            j += 2
            continue
        if ch == "[":
            j = _skip_class(pat, j)
            continue
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
            if depth == 0:
                return j + 1
        j += 1
    return j


def mandatory_literals(branch: str) -> list[str] | None:
    """Literal runs guaranteed to appear contiguously in EVERY match of the
    branch.  Conservative: group/class contents are ignored, a char under a
    quantifier is dropped from its run (even ``+``, where keeping it would
    be sound — simplicity over pruning power).  Returns None when the
    branch contains a construct the scanner refuses to reason about."""
    runs: list[str] = []
    run: list[str] = []

    def flush():
        if run:
            runs.append("".join(run))
            run.clear()

    i = 0
    while i < len(branch):
        ch = branch[i]
        if ch == "\\":
            if i + 1 >= len(branch):
                return None
            nxt = branch[i + 1]
            if nxt in _CLASS_ESCAPES:
                flush()
            else:
                run.append(nxt)
            i += 2
            continue
        if ch == "[":
            flush()
            i = _skip_class(branch, i)
            continue
        if ch == "(":
            flush()
            i = _skip_group(branch, i)
            continue
        if ch in ")|":
            # unmatched ')' / residual '|' — refuse rather than risk it
            return None
        if ch in ".^$":
            flush()
            i += 1
            continue
        if ch in "?*+":
            if run:
                run.pop()
            flush()
            i += 1
            continue
        if ch == "{":
            if run:
                run.pop()
            flush()
            j = branch.find("}", i)
            i = (j + 1) if j >= 0 else len(branch)
            continue
        run.append(ch)
        i += 1
    flush()
    return runs


def _grams_of(text: str) -> list[str]:
    return sorted(
        {text[i : i + TRIGRAM_N] for i in range(len(text) - TRIGRAM_N + 1)}
    )


def required_gram_groups(pattern: str) -> list[list[str]] | None:
    """Per top-level-alternation branch, the trigram set every match of
    that branch must contain; None when ANY branch lacks a mandatory
    literal of length >= 3 (the whole pattern then needs a verify scan,
    because that branch alone can match anything)."""
    import re as _re

    # an inline case-insensitivity flag makes every extracted literal
    # case-UNSTABLE — (?i)foobar matches FOOBAR, which contains none of
    # foobar's grams.  Conservative: any (?...i...) group -> verify scan.
    if _re.search(r"\(\?[^:)]*i", pattern):
        return None
    groups = []
    for branch in split_alternation(pattern):
        lits = mandatory_literals(branch)
        if lits is None:
            return None
        grams = sorted(
            {g for lit in lits if len(lit) >= TRIGRAM_N for g in _grams_of(lit)}
        )
        if not grams:
            return None
        groups.append(grams)
    return groups


# --------------------------------------------------------------------------
# query
# --------------------------------------------------------------------------


def _case_variants(gram: str) -> list[str]:
    """All upper/lower combinations of the gram's cased characters — at
    most 2^TRIGRAM_N = 8 variants, the bounded expansion that lets a
    case-INSENSITIVE query run against the case-SENSITIVE gram index."""
    outs = [""]
    for ch in gram:
        lo, up = ch.lower(), ch.upper()
        alts = (lo,) if lo == up else (lo, up)
        outs = [p + a for p in outs for a in alts]
    return sorted(set(outs))


def _select_rarest_classes(
    spark: SparkSession,
    paths: TrigramPaths,
    classes: list[tuple[int, int, int, list[str]]],
    max_grams: int = GRAMS_PER_NEEDLE,
) -> tuple[list[tuple[int, int, int, str]], set[tuple[int, int]]]:
    """Keep the ``max_grams`` rarest gram CLASSES per (query, branch).

    A class is one required gram position with its acceptable index-gram
    variants (one variant when case-sensitive, up to 8 when not); a doc
    must match >= 1 variant of every kept class.  Any subset of a
    branch's classes still over-approximates its matches, so dropping
    common classes is sound and caps the decoded posting volume.  A class
    with NO variant in the dictionary can match nothing — its (query,
    branch) short-circuits to empty without touching the corpus."""
    all_grams = sorted({v for _, _, _, vs in classes for v in vs})
    df_map = {
        r["gram"]: r["df"]
        for r in spark.read.parquet(paths.dictionary)
        .filter(F.col("gram").isin(all_grams))
        .collect()
    }
    by_qb: dict[tuple[int, int], list[tuple[int, int, list[str]]]] = {}
    for qid, branch, cls, variants in classes:
        by_qb.setdefault((qid, branch), []).append((qid, cls, variants))
    picked: list[tuple[int, int, int, str]] = []
    dead: set[tuple[int, int]] = set()
    cand_bound = 0
    for (qid, branch), cls_list in by_qb.items():
        scored = []
        for _, cls, variants in cls_list:
            present = [v for v in variants if v in df_map]
            if not present:
                dead.add((qid, branch))
                break
            scored.append((sum(df_map[v] for v in present), cls, present))
        else:
            scored.sort(key=lambda t: (t[0], t[1]))
            # the branch's candidate count is bounded by its rarest class's
            # df sum (the AND can only shrink it) — a free, sound upper
            # bound on the verify-join's left side, already paid for by
            # the dictionary lookup above
            cand_bound += scored[0][0]
            for _, cls, present in scored[:max_grams]:
                picked.extend((qid, branch, cls, v) for v in present)
    return picked, dead, cand_bound


def _candidates_classes(
    spark: SparkSession,
    paths: TrigramPaths,
    classes: list[tuple[int, int, int, list[str]]],
) -> DataFrame:
    """(query_id, doc_id) docs matching >= 1 variant of EVERY selected
    gram class of at least one branch — relational AND via distinct-class
    count, union across branches by the final distinct; no driver-side
    doc lists.

    Returns ``(candidates, cand_bound)`` where ``cand_bound`` is a sound
    driver-side upper bound on the candidate row count (sum over live
    (query, branch) of the rarest class's df) — the verify-join gate
    (``_verify_join``) picks its physical shape from it for free.

    The AND runs SEGMENT-LOCALLY: segments are doc-range-disjoint (built
    exactly like the term index), so every gram's seg-local posting list
    lives in the same ``seg=K`` partition, the intersection for each
    (query, branch) can be computed inside one numpy kernel per segment,
    and the union across segments is duplicate-free by construction — no
    exploded (gram, doc) rows, no global count-distinct shuffle, no final
    distinct.  The only exchange is the groupBy(seg) of the SELECTED
    COMPRESSED posting blobs (∝ chosen-gram posting bytes, never index or
    corpus size); within a segment, classes OR their ≤8 case variants via
    sorted union and AND via ascending-size sorted intersection, so a rare
    class short-circuits the whole branch.  Per-task memory is the decoded
    selected postings of ONE segment — bounded by seg_size × the
    ≤GRAMS_PER_NEEDLE selected (rarest) classes per branch, the same
    task-memory contract as the positional index."""
    picked, dead, cand_bound = _select_rarest_classes(spark, paths, classes)
    live = [(q, b, c, v) for q, b, c, v in picked if (q, b) not in dead]
    if not live:
        return spark.createDataFrame([], "query_id long, doc_id long"), 0
    # (query, branch) -> {cls -> [variant grams]} — small, closure-shipped
    need: dict[tuple[int, int], dict[int, list[str]]] = {}
    for q, b, c, v in live:
        need.setdefault((q, b), {}).setdefault(c, []).append(v)
    grams = sorted({v for _, _, _, v in live})
    rows = (
        spark.read.parquet(paths.postings)
        .filter(F.col("gram").isin(grams))
        .select("seg", "gram", "doc_ids_bin")
    )

    def kern(key, pdf: pd.DataFrame) -> pd.DataFrame:
        by_gram = {
            g: delta_decode(b).astype(np.int64)
            for g, b in zip(pdf["gram"], pdf["doc_ids_bin"])
        }
        per_query: dict[int, list[np.ndarray]] = {}
        for (qid, _branch), cls_map in need.items():
            arrs = []
            for vs in cls_map.values():
                lists = [by_gram[v] for v in vs if v in by_gram]
                if not lists:
                    arrs = None  # a whole class absent from this segment
                    break
                arrs.append(
                    lists[0]
                    if len(lists) == 1
                    else np.unique(np.concatenate(lists))
                )
            if arrs is None:
                continue
            arrs.sort(key=len)
            inter = arrs[0]
            for a in arrs[1:]:
                if inter.size == 0:
                    break
                inter = np.intersect1d(inter, a, assume_unique=True)
            if inter.size:
                per_query.setdefault(int(qid), []).append(inter)
        if not per_query:
            return pd.DataFrame({"query_id": [], "doc_id": []}).astype(
                {"query_id": np.int64, "doc_id": np.int64}
            )
        qs_out, ds_out = [], []
        for qid, parts_ in per_query.items():
            docs_ = (
                parts_[0] if len(parts_) == 1
                else np.unique(np.concatenate(parts_))  # dedupe across branches
            )
            qs_out.append(np.full(docs_.size, qid, dtype=np.int64))
            ds_out.append(docs_)
        return pd.DataFrame(
            {"query_id": np.concatenate(qs_out), "doc_id": np.concatenate(ds_out)}
        )

    cand = rows.groupBy("seg").applyInPandas(kern, "query_id long, doc_id long")
    return cand, cand_bound


def _candidates(
    spark: SparkSession,
    paths: TrigramPaths,
    groups: list[tuple[int, int, list[str]]],
) -> tuple[DataFrame, int]:
    """Case-sensitive convenience wrapper: every gram is its own
    single-variant class."""
    classes = [
        (qid, branch, i, [g])
        for qid, branch, grams in groups
        for i, g in enumerate(grams)
    ]
    return _candidates_classes(spark, paths, classes)


def _verify_join(cand: DataFrame, cand_bound: int, base: DataFrame) -> DataFrame:
    """Attach doc content to candidates for verification, choosing the
    physical shape from the free driver-side bound: broadcast the candidate
    set into the corpus scan when it provably fits (content bytes never
    shuffle; verify runs map-side at scan width), else shuffle-join on
    doc_id (both sides exchange; the pinned candidate repartition keeps the
    verify stage wide)."""
    if cand_bound <= BROADCAST_CANDIDATE_ROWS:
        return base.join(F.broadcast(cand), "doc_id")
    # fallback: pin the candidate exchange width (REPARTITION_BY_NUM origin)
    # — a candidate row is two longs, so AQE's bytes-based coalescing would
    # pack the set into one partition, but each row fans into a per-document
    # content verify whose cost tracks document bytes, not candidate bytes
    n_parts = int(
        cand.sparkSession.conf.get("spark.sql.shuffle.partitions", "32")
    )
    return cand.repartition(n_parts, "doc_id").join(base, "doc_id")


def grep_substring(
    spark: SparkSession,
    paths: TrigramPaths,
    docs: DataFrame,
    needles: list[tuple[int, str]],
    count_occurrences: bool = True,
    case_insensitive: bool = False,
) -> DataFrame:
    """(query_id, doc_id[, n_occ]) — docs whose content contains each
    needle, answered through the trigram index.  Needles shorter than the
    gram size verify against the full corpus (honest fallback — there is
    nothing to prune with); everything else touches only candidates.

    ``case_insensitive`` keeps the SAME case-sensitive index: each needle
    gram becomes a class of its <= 8 case variants (ripgrep-style smart
    case against a cased index), and the verify predicate lowers both
    sides."""
    if case_insensitive:
        needles = [(q, s.lower()) for q, s in needles]
    prunable = [(q, s) for q, s in needles if len(s) >= TRIGRAM_N]
    fallback = [(q, s) for q, s in needles if 0 < len(s) < TRIGRAM_N]
    parts = []
    base = docs.select("doc_id", "content")
    if prunable:
        if case_insensitive:
            classes = [
                (q, 0, i, _case_variants(g))
                for q, s in prunable
                for i, g in enumerate(_grams_of(s))
            ]
        else:
            classes = [
                (q, 0, i, [g])
                for q, s in prunable
                for i, g in enumerate(_grams_of(s))
            ]
        cand, cand_bound = _candidates_classes(spark, paths, classes)
        ndf = spark.createDataFrame(prunable, "query_id long, needle string")
        parts.append(
            _verify_join(cand, cand_bound, base)
            .join(F.broadcast(ndf), "query_id")
        )
    if fallback:
        ndf = spark.createDataFrame(fallback, "query_id long, needle string")
        parts.append(base.crossJoin(F.broadcast(ndf)))
    if not parts:
        schema = "query_id long, doc_id long" + (
            ", n_occ long" if count_occurrences else ""
        )
        return spark.createDataFrame([], schema)
    un = parts[0]
    for p in parts[1:]:
        un = un.unionByName(p)
    body = F.lower(F.col("content")) if case_insensitive else F.col("content")
    out = un.filter(F.contains(body, F.col("needle")))
    if count_occurrences:
        n = (
            (F.length(body) - F.length(F.replace(body, F.col("needle"), F.lit(""))))
            / F.length("needle")
        ).cast("long")
        return out.select("query_id", "doc_id", n.alias("n_occ"))
    return out.select("query_id", "doc_id")


def grep_regex(
    spark: SparkSession,
    paths: TrigramPaths,
    docs: DataFrame,
    patterns: list[tuple[int, str]],
) -> DataFrame:
    """(query_id, doc_id) — docs whose content matches each regex
    (partial match, `rlike` semantics).  Candidate pruning via mandatory
    literals; patterns without one fall back to a verify scan."""
    prunable, fallback = [], []
    for qid, pat in patterns:
        groups = required_gram_groups(pat)
        if groups is None:
            fallback.append((qid, pat))
        else:
            prunable.append((qid, pat, groups))
    parts = []
    base = docs.select("doc_id", "content")
    if prunable:
        flat = [
            (qid, b, grams)
            for qid, _, groups in prunable
            for b, grams in enumerate(groups)
        ]
        cand, cand_bound = _candidates(spark, paths, flat)
        pdf_ = spark.createDataFrame(
            [(q, p) for q, p, _ in prunable], "query_id long, pat string"
        )
        parts.append(
            _verify_join(cand, cand_bound, base).join(F.broadcast(pdf_), "query_id")
        )
    if fallback:
        pdf_ = spark.createDataFrame(fallback, "query_id long, pat string")
        parts.append(base.crossJoin(F.broadcast(pdf_)))
    if not parts:
        return spark.createDataFrame([], "query_id long, doc_id long")
    un = parts[0]
    for p in parts[1:]:
        un = un.unionByName(p)
    return un.filter(
        F.regexp_like(F.col("content"), F.col("pat"))
    ).select("query_id", "doc_id")
