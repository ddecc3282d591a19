"""Positional index + phrase search — the fulltext-engine extension the
posting pipeline was shaped for (SURVEY.md §2.B B11's conjunctive
intersection, extended with within-doc term positions).

Layout mirrors the tf postings exactly (doc-range-disjoint `seg=K/`
partitions, delta+varint binary cells, manifest-driven geometry), adding a
positions relation per segment:

    positions/seg=K/*.parquet
        (term, seg, df_seg, doc_ids_bin, pos_counts_bin, positions_bin,
         min_doc, max_doc)

  - doc_ids_bin:    delta+varint doc ids (ascending, as tf postings)
  - pos_counts_bin: varint count of positions per doc (aligned with ids)
  - positions_bin:  varint within-doc position deltas (first absolute),
                    docs concatenated in id order

Scale notes: the (term, doc_id, positions) relation is the full token
stream — inherently ~1 int per corpus token — so it is built only when
`build_positions` is called (the BM25-only index pays nothing). The build
shuffles position arrays keyed by seg exactly once; the segment kernel is
the same whole-array numpy discipline as `_build_segment_postings` (no
per-term Python). One segment is one applyInPandas task, so per-task
memory and Python object count are bounded by seg_size, not corpus size —
grow a corpus by adding segments of constant size, never by fattening
segments (measured: 5x-fatter segments cost ~7.9x wall, exponent 1.28,
from alloc/GC pressure on 5x the per-task position-array objects;
constant seg_size restores ~linear growth — tools/data_scaling.py,
BENCH.md round-5 data-size section). Query-side, a phrase touches only its terms' rows
(parquet term IN-filter) and the adjacency chain is vectorized across ALL
candidate docs at once (positions packed into doc-offset global ints — one
np.intersect1d per phrase term, never a per-doc loop).

The reference has no phrase/positional queries (its retrieval is an opaque
CNN service, /root/reference/src/mtix/predictors.py:22-35); this extends
the replacement engine the way Lucene extends a tf index.
"""

from __future__ import annotations

import os
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mtix_spark.functions.text import TOKEN_SPLIT_RE, tokenize
from mtix_spark.index.build import IndexPaths, read_manifest
from mtix_spark.index.codec import (
    decode_varint,
    delta_decode,
    delta_encode,
    encode_varint,
    encode_varint_with_sizes,
)

POSITIONS_SCHEMA = (
    "term string, seg int, df_seg int, doc_ids_bin binary, "
    "pos_counts_bin binary, positions_bin binary, min_doc long, max_doc long"
)

# packing for the vectorized adjacency chain: global = doc_index << SHIFT | pos
_POS_SHIFT = 22  # positions < 4.2M per doc


def build_tf_positions(docs: DataFrame) -> DataFrame:
    """(term, doc_id, positions array<int>) — token positions per (doc, term).

    One Arrow batch kernel (same C++ regex split as build_tf): each input
    row is a whole document, so every (doc, term) position list completes
    within its batch — the downstream shuffle moves pre-grouped arrays,
    never per-token rows.
    """

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import pyarrow as pa
        import pyarrow.compute as pc

        for pdf in batches:
            ids = pdf["doc_id"].to_numpy()
            arr = pa.Array.from_pandas(pdf["content"])
            sp = pc.split_pattern_regex(pc.utf8_lower(arr), TOKEN_SPLIT_RE)
            lens = pc.list_value_length(sp).fill_null(0).to_numpy(zero_copy_only=False)
            flat = pc.list_flatten(sp)
            if len(flat) == 0:
                continue
            de = flat.dictionary_encode()
            codes = de.indices.to_numpy(zero_copy_only=False).astype(np.int64)
            vocab = de.dictionary.to_numpy(zero_copy_only=False)
            parent = np.repeat(np.arange(len(ids), dtype=np.int64), lens)
            keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
            codes, parent = codes[keep], parent[keep]
            n = codes.size
            if n == 0:
                continue
            # position within the doc's FILTERED token stream
            change = np.empty(n, dtype=bool)
            change[0] = True
            change[1:] = parent[1:] != parent[:-1]
            run_start = np.flatnonzero(change)
            run_id = np.cumsum(change) - 1
            pos = np.arange(n, dtype=np.int64) - run_start[run_id]
            # group to (doc, term) position lists: stable sort keeps pos asc
            order = np.lexsort((pos, codes, parent))
            p_s, c_s, pos_s = parent[order], codes[order], pos[order]
            gchange = np.empty(n, dtype=bool)
            gchange[0] = True
            gchange[1:] = (p_s[1:] != p_s[:-1]) | (c_s[1:] != c_s[:-1])
            gstarts = np.flatnonzero(gchange)
            pos32 = pos_s.astype(np.int32)
            yield pd.DataFrame(
                {
                    "term": vocab[c_s[gstarts]],
                    "doc_id": ids[p_s[gstarts]],
                    "positions": np.split(pos32, gstarts[1:]),
                }
            )

    return docs.select("doc_id", "content").mapInPandas(
        kernel, "term string, doc_id long, positions array<int>"
    )


def _build_segment_positions(pdf: pd.DataFrame) -> pd.DataFrame:
    """One segment's (term, doc_id, positions) rows -> positional posting
    rows. Whole-array numpy: factorize terms, lexsort (term, doc_id), bulk
    varint encodes sliced by byte offsets — the positional twin of
    `_build_segment_postings`."""
    seg = int(pdf["seg"].iloc[0])
    codes_u, uniques = pd.factorize(pdf["term"], sort=True)
    order = np.lexsort((pdf["doc_id"].to_numpy(), codes_u))
    codes = codes_u[order]
    doc_ids = pdf["doc_id"].to_numpy()[order].astype(np.uint64)
    plists = pdf["positions"].to_numpy()[order]

    change = np.empty(codes.size, dtype=bool)
    change[0] = True
    change[1:] = codes[1:] != codes[:-1]
    starts = np.flatnonzero(change)
    ends = np.append(starts[1:], codes.size)
    lengths = ends - starts

    # doc-id deltas within term
    deltas = doc_ids.copy()
    deltas[1:] -= doc_ids[:-1]
    deltas[starts] = doc_ids[starts]
    id_buf, id_nb = encode_varint_with_sizes(deltas)
    id_off = np.zeros(codes.size + 1, dtype=np.int64)
    np.cumsum(id_nb, out=id_off[1:])

    counts = np.fromiter((len(p) for p in plists), dtype=np.uint64, count=len(plists))
    ct_buf, ct_nb = encode_varint_with_sizes(counts)
    ct_off = np.zeros(codes.size + 1, dtype=np.int64)
    np.cumsum(ct_nb, out=ct_off[1:])

    # within-doc position deltas over the fully concatenated stream
    flat = np.concatenate(list(plists)).astype(np.uint64) if len(plists) else np.empty(0, np.uint64)
    # the query kernels pack (doc_rank << _POS_SHIFT | pos); a position at
    # or past 2^22 would silently corrupt that packing (cross-document
    # false matches in phrase/NEAR/span) — fail the BUILD loudly instead
    if flat.size and int(flat.max()) >= (1 << _POS_SHIFT):
        raise ValueError(
            f"seg {seg}: token position {int(flat.max())} >= 2^{_POS_SHIFT}; "
            "documents longer than ~4.19M tokens are not indexable with "
            "positions (split the document or raise _POS_SHIFT)"
        )
    doc_pos_starts = np.zeros(codes.size + 1, dtype=np.int64)
    np.cumsum(counts.astype(np.int64), out=doc_pos_starts[1:])
    pdeltas = flat.copy()
    if flat.size:
        pdeltas[1:] -= flat[:-1]
        nz = doc_pos_starts[:-1][counts > 0]
        pdeltas[nz] = flat[nz]
    pos_buf, pos_nb = encode_varint_with_sizes(pdeltas)
    # per-posting-cell byte ranges -> per-TERM byte ranges
    pos_byte_off = np.zeros(flat.size + 1, dtype=np.int64)
    np.cumsum(pos_nb, out=pos_byte_off[1:])
    term_pos_cut = pos_byte_off[doc_pos_starts[np.append(starts, codes.size)]]

    id_mv, ct_mv, pos_mv = memoryview(id_buf), memoryview(ct_buf), memoryview(pos_buf)
    return pd.DataFrame(
        {
            "term": np.asarray(uniques, dtype=object)[codes[starts]],
            "seg": np.full(starts.size, seg, dtype=np.int32),
            "df_seg": lengths.astype(np.int32),
            "doc_ids_bin": [
                bytes(id_mv[id_off[s] : id_off[e]]) for s, e in zip(starts, ends)
            ],
            "pos_counts_bin": [
                bytes(ct_mv[ct_off[s] : ct_off[e]]) for s, e in zip(starts, ends)
            ],
            "positions_bin": [
                bytes(pos_mv[a:b]) for a, b in zip(term_pos_cut[:-1], term_pos_cut[1:])
            ],
            "min_doc": doc_ids[starts].astype(np.int64),
            "max_doc": doc_ids[ends - 1].astype(np.int64),
        }
    )


def build_positions(
    spark: SparkSession, docs: DataFrame, paths: IndexPaths
) -> str:
    """Add the positions relation to an already-built index (geometry —
    seg_size, segment set — comes from the index manifest, so positional
    segments align 1:1 with tf segments). Resumable the same way: completed
    `seg=K` partitions are skipped on re-run via the manifest's
    `positions_segments` set. Returns the positions path."""
    import json

    from mtix_spark.index.build import _commit_manifest
    from mtix_spark.table_io import DEFAULT_IO as tio

    with open(paths.stats) as f:
        seg_size = json.load(f)["seg_size"]
    man = read_manifest(paths)
    done = set(man.get("positions_segments", []))
    todo = sorted(
        int(s) for s in man["segments"] if int(s) not in done
    )
    out = os.path.join(paths.root, "positions")
    if todo:
        seg_meta = {
            int(s): (int(m["min_doc"]), int(m["max_doc"]))
            for s, m in man["segments"].items()
        }
        # batch segments map by uniform ranges; streamed segments by manifest
        uniform = all(
            lo == s * seg_size for s, (lo, hi) in seg_meta.items() if s < 1_000_000
        )
        tfp = build_tf_positions(docs)
        if uniform and all(s < 1_000_000 for s in seg_meta):
            tfp = tfp.withColumn(
                "seg", (F.col("doc_id") / F.lit(seg_size)).cast("int")
            )
        else:  # range table join for mixed/streamed geometries
            ranges = spark.createDataFrame(
                [(s, lo, hi) for s, (lo, hi) in seg_meta.items()],
                "seg int, lo long, hi long",
            )
            tfp = tfp.join(
                F.broadcast(ranges),
                (F.col("doc_id") >= F.col("lo")) & (F.col("doc_id") <= F.col("hi")),
            ).drop("lo", "hi")
        tfp = tfp.filter(F.col("seg").isin(todo))
        positional = tfp.groupBy("seg").applyInPandas(
            _build_segment_positions, POSITIONS_SCHEMA
        )
        tio.overwrite_partitions(positional, out, "seg")
        man = read_manifest(paths)
        man["positions_segments"] = sorted(done | set(todo))
        _commit_manifest(paths, man)
    return out


def require_positions(man: dict) -> list[int]:
    """Live positional segment set for a query, or raise. A positional
    query over an index whose tf segments outnumber its positional ones
    (e.g. stream-ingested batches before the next `build_positions` run)
    would silently drop those segments' docs from phrase/NEAR/span
    results — Lucene raises IllegalStateException for fields indexed
    without positions; we do the equivalent and name the gap."""
    have = {int(s) for s in man.get("positions_segments", [])}
    tf_segs = {int(s) for s in man.get("segments", {})}
    missing = sorted(tf_segs - have)
    if missing:
        raise ValueError(
            f"positional query on an index with {len(missing)} segment(s) "
            f"lacking positions (e.g. seg {missing[:5]}): run "
            "build_positions over the new docs first"
        )
    return sorted(have)


def _reanchor(pdel: np.ndarray, offs: np.ndarray) -> np.ndarray:
    """Per-doc cumulative sum of position deltas (first delta absolute):
    one global cumsum, then subtract each doc's inherited prefix."""
    if pdel.size == 0:
        return pdel
    g = np.cumsum(pdel)
    starts = offs[:-1][np.diff(offs) > 0]  # first flat index of each doc
    prefix = np.zeros(pdel.size, dtype=np.int64)
    # inherited sum before each doc = g[start-1]; doc 0 inherits 0
    inh = np.where(starts > 0, g[starts - 1], 0)
    # delta of inherited amounts between consecutive docs
    dinh = np.diff(inh, prepend=0)
    prefix[starts] = dinh
    np.cumsum(prefix, out=prefix)
    return g - prefix


def phrase_topk(
    spark: SparkSession,
    paths: IndexPaths,
    queries: list[tuple[int, str]],
    k: int = 100,
) -> DataFrame:
    """Exact phrase search over the positional index.

    Returns (query_id, doc_id, n_occ) for docs containing the phrase's
    tokens consecutively, top-k per query by (n_occ DESC, doc_id ASC).

    Plan: one parquet scan of positions/ filtered to the phrase terms
    (pushed IN-filter), one applyInPandas by seg; the kernel chains
    adjacency fully vectorized — candidate doc positions are packed into
    (doc_index << 22 | pos) ints so the whole phrase verifies with
    len(phrase)-1 sorted-array intersections per (query, segment),
    independent of candidate count. Only per-segment match rows cross to
    the global top-k.
    """
    import re

    phrases = []
    for qid, text in queries:
        toks = [t for t in re.split(TOKEN_SPLIT_RE, text.lower()) if t]
        if toks:
            phrases.append((qid, toks))
    empty = spark.createDataFrame([], "query_id long, doc_id long, n_occ long")
    if not phrases:
        return empty
    all_terms = sorted({t for _, ts in phrases for t in ts})

    # manifest = source of truth for live positional segments (orphan dirs
    # from an interrupted compaction must not produce duplicate rows);
    # raise if any live tf segment lacks positions (never silently partial)
    man = read_manifest(paths)
    live = require_positions(man)
    pos_dir = os.path.join(paths.root, "positions")
    rows = (
        spark.read.parquet(pos_dir)
        .filter(F.col("term").isin(all_terms))
        .filter(F.col("seg").isin(live))
    )
    has_deletes = int(man.get("n_deleted", 0)) > 0
    del_root = os.path.join(paths.root, "deletes")
    del_epoch = int(man.get("delete_epoch", 0))

    def kernel(key, p: pd.DataFrame) -> pd.DataFrame:
        deleted = None
        if has_deletes:
            from mtix_spark.index.deletes import load_deleted, mask_deleted

            deleted = load_deleted(del_root, int(key[0]), del_epoch)
        out = {"query_id": [], "doc_id": [], "n_occ": []}
        by_term = {}
        for _, r in p.iterrows():
            ids = delta_decode(r["doc_ids_bin"]).astype(np.int64)
            counts = decode_varint(r["pos_counts_bin"]).astype(np.int64)
            pdel = decode_varint(r["positions_bin"]).astype(np.int64)
            offs = np.zeros(ids.size + 1, dtype=np.int64)
            np.cumsum(counts, out=offs[1:])
            pos = _reanchor(pdel, offs)
            if deleted is not None and deleted.size:
                keep = np.flatnonzero(mask_deleted(ids, deleted))
                if keep.size != ids.size:
                    pos = (
                        np.concatenate([pos[offs[i] : offs[i + 1]] for i in keep])
                        if keep.size
                        else np.empty(0, dtype=np.int64)
                    )
                    new_offs = np.zeros(keep.size + 1, dtype=np.int64)
                    np.cumsum(counts[keep], out=new_offs[1:])
                    ids, offs = ids[keep], new_offs
            by_term[r["term"]] = (ids, offs, pos)
        for qid, toks in phrases:
            if any(t not in by_term for t in toks):
                continue
            # doc-list intersection across phrase terms, tracking row indices
            cand = by_term[toks[0]][0]
            idxs = [np.arange(cand.size)]
            ok = True
            for t in toks[1:]:
                ids_t = by_term[t][0]
                cand, ia, ib = np.intersect1d(
                    cand, ids_t, assume_unique=True, return_indices=True
                )
                if cand.size == 0:
                    ok = False
                    break
                idxs = [ix[ia] for ix in idxs]
                idxs.append(ib)
            if not ok:
                continue
            # pack candidate positions: global = cand_rank << SHIFT | pos
            def packed(term, rows_idx, shift_by):
                ids_t, offs, pos = by_term[term]
                lens = (offs[rows_idx + 1] - offs[rows_idx]).astype(np.int64)
                rank = np.repeat(np.arange(rows_idx.size, dtype=np.int64), lens)
                flat = np.concatenate(
                    [pos[offs[i] : offs[i + 1]] for i in rows_idx]
                ) if rows_idx.size else np.empty(0, np.int64)
                shifted = flat - shift_by
                ok_pos = shifted >= 0  # a negative shift can't start a phrase
                return (rank[ok_pos] << _POS_SHIFT) | shifted[ok_pos]

            chain = packed(toks[0], idxs[0], 0)
            for j, t in enumerate(toks[1:], start=1):
                # positions of token j shifted back by j: a phrase occurrence
                # at p has token j at p+j, so compare in token-0 coordinates
                chain = np.intersect1d(
                    chain, packed(t, idxs[j], j), assume_unique=True
                )
                if chain.size == 0:
                    break
            if chain.size == 0:
                continue
            ranks, occ = np.unique(chain >> _POS_SHIFT, return_counts=True)
            out["query_id"].extend([qid] * ranks.size)
            out["doc_id"].extend(cand[ranks].tolist())
            out["n_occ"].extend(occ.tolist())
        return pd.DataFrame(out).astype(
            {"query_id": "int64", "doc_id": "int64", "n_occ": "int64"}
        )

    per_seg = rows.groupBy("seg").applyInPandas(
        kernel, "query_id long, doc_id long, n_occ long"
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("n_occ"), F.asc("doc_id"))
    return (
        per_seg.withColumn("__r", F.row_number().over(w))
        .filter(F.col("__r") <= k)
        .drop("__r")
    )


def near_topk(
    spark: SparkSession,
    paths: IndexPaths,
    queries: list[tuple[int, str, str, int]],
    k: int = 100,
    ordered: bool = False,
) -> DataFrame:
    """Proximity (NEAR/k) search over the positional index — the physical
    twin of `near_match_relational` (same pair-count semantics, same
    tie-break), sharing its oracle.

    queries: (query_id, term_a, term_b, window). Returns (query_id, doc_id,
    n_pairs), top-k per query by (n_pairs DESC, doc_id ASC).

    Kernel: intersect the two terms' doc lists, pack both position sets as
    (cand_rank << 22 | pos), then count in-window pairs with two
    np.searchsorted range queries per packed element of the b side — one
    vectorized pass per (query, segment), never a per-doc loop. The packed
    range [pos_b - w, pos_b + w] is clamped to the rank block at 0; the
    upper side inherits the positional index's existing positions < 2^22
    bound (same constraint as the phrase chain). Tombstones mask at decode
    time, as everywhere.
    """
    live_qs = [
        (qid, a.lower(), b.lower(), int(w)) for qid, a, b, w in queries if w >= 1
    ]
    empty = spark.createDataFrame([], "query_id long, doc_id long, n_pairs long")
    if not live_qs:
        return empty
    all_terms = sorted({t for _, a, b, _ in live_qs for t in (a, b)})

    man = read_manifest(paths)
    live = require_positions(man)
    pos_dir = os.path.join(paths.root, "positions")
    rows = (
        spark.read.parquet(pos_dir)
        .filter(F.col("term").isin(all_terms))
        .filter(F.col("seg").isin(live))
    )
    has_deletes = int(man.get("n_deleted", 0)) > 0
    del_root = os.path.join(paths.root, "deletes")
    del_epoch = int(man.get("delete_epoch", 0))

    def kernel(key, p: pd.DataFrame) -> pd.DataFrame:
        deleted = None
        if has_deletes:
            from mtix_spark.index.deletes import load_deleted, mask_deleted

            deleted = load_deleted(del_root, int(key[0]), del_epoch)
        by_term = {}
        for _, r in p.iterrows():
            ids = delta_decode(r["doc_ids_bin"]).astype(np.int64)
            counts = decode_varint(r["pos_counts_bin"]).astype(np.int64)
            pdel = decode_varint(r["positions_bin"]).astype(np.int64)
            offs = np.zeros(ids.size + 1, dtype=np.int64)
            np.cumsum(counts, out=offs[1:])
            pos = _reanchor(pdel, offs)
            if deleted is not None and deleted.size:
                keep = np.flatnonzero(mask_deleted(ids, deleted))
                if keep.size != ids.size:
                    pos = (
                        np.concatenate([pos[offs[i] : offs[i + 1]] for i in keep])
                        if keep.size
                        else np.empty(0, dtype=np.int64)
                    )
                    new_offs = np.zeros(keep.size + 1, dtype=np.int64)
                    np.cumsum(counts[keep], out=new_offs[1:])
                    ids, offs = ids[keep], new_offs
            by_term[r["term"]] = (ids, offs, pos)

        def packed(term, rows_idx):
            ids_t, offs, pos = by_term[term]
            lens = (offs[rows_idx + 1] - offs[rows_idx]).astype(np.int64)
            rank = np.repeat(np.arange(rows_idx.size, dtype=np.int64), lens)
            flat = (
                np.concatenate([pos[offs[i] : offs[i + 1]] for i in rows_idx])
                if rows_idx.size
                else np.empty(0, np.int64)
            )
            return (rank << _POS_SHIFT) | flat, rank, flat

        out = {"query_id": [], "doc_id": [], "n_pairs": []}
        for qid, ta, tb, w in live_qs:
            if ta not in by_term or tb not in by_term:
                continue
            cand, ia, ib = np.intersect1d(
                by_term[ta][0], by_term[tb][0], assume_unique=True, return_indices=True
            )
            if cand.size == 0:
                continue
            pa, _, _ = packed(ta, ia)
            pb, rank_b, pos_b = packed(tb, ib)
            blk = rank_b << _POS_SHIFT
            if ordered:
                # pa in [pos_b - w, pos_b - 1]
                valid = pos_b >= 1
                lo = blk | np.maximum(pos_b - w, 0)
                hi = blk | np.maximum(pos_b - 1, 0)
                cnt = np.where(
                    valid,
                    np.searchsorted(pa, hi, "right") - np.searchsorted(pa, lo, "left"),
                    0,
                )
            else:
                lo = blk | np.maximum(pos_b - w, 0)
                # clamp to the rank block: pos_b + w could otherwise carry
                # into the next candidate doc's packed range near 2^22
                hi = blk | np.minimum(pos_b + w, (1 << _POS_SHIFT) - 1)
                cnt = np.searchsorted(pa, hi, "right") - np.searchsorted(pa, lo, "left")
                # exclude identical positions (only arises when ta == tb)
                if ta == tb:
                    cnt -= np.searchsorted(pa, pb, "right") - np.searchsorted(
                        pa, pb, "left"
                    )
            per_doc = np.bincount(rank_b, weights=cnt, minlength=cand.size).astype(
                np.int64
            )
            nz = np.flatnonzero(per_doc)
            out["query_id"].extend([qid] * nz.size)
            out["doc_id"].extend(cand[nz].tolist())
            out["n_pairs"].extend(per_doc[nz].tolist())
        return pd.DataFrame(out).astype(
            {"query_id": "int64", "doc_id": "int64", "n_pairs": "int64"}
        )

    per_seg = rows.groupBy("seg").applyInPandas(
        kernel, "query_id long, doc_id long, n_pairs long"
    )
    w_ = Window.partitionBy("query_id").orderBy(F.desc("n_pairs"), F.asc("doc_id"))
    return (
        per_seg.withColumn("__r", F.row_number().over(w_))
        .filter(F.col("__r") <= k)
        .drop("__r")
    )


def phrase_snippets(
    docs: DataFrame,
    phrase: str,
    window: int = 2,
    id_col: str = "doc_id",
    text_col: str = "content",
) -> DataFrame:
    """Highlighting: for each doc matching the phrase, the token snippet
    around its FIRST occurrence — `window` tokens of context either side.

    Returns (doc_id, n_occ, first_pos, snippet). Pure Catalyst: the match
    positions come from the same adjacency chain as phrase_match_relational,
    the snippet is an F.slice over the tokenized stream (1-based, clamped at
    the doc start). At serving scale the first_pos comes from the positional
    index (`phrase_topk` + per-doc position decode) and only the top-k docs'
    content is fetched for rendering; this relational form is the oracle
    twin and the index-free fallback."""
    import re

    toks = [t for t in re.split(TOKEN_SPLIT_RE, phrase.lower()) if t]
    assert toks, "empty phrase"
    stream = docs.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(tokenize(F.col(text_col))).alias("pos", "term"),
    )
    base = (
        stream.filter(F.col("term") == toks[0])
        .select("doc_id", F.col("pos").alias("p0"))
    )
    for j, t in enumerate(toks[1:], start=1):
        nxt = stream.filter(F.col("term") == t).select(
            F.col("doc_id").alias("d"), F.col("pos").alias(f"p{j}")
        )
        base = base.join(
            nxt,
            (base["doc_id"] == nxt["d"]) & (nxt[f"p{j}"] == base["p0"] + F.lit(j)),
        ).drop("d", f"p{j}")
    hits = base.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_occ"), F.min("p0").alias("first_pos")
    )
    m = len(toks)
    start = F.greatest(F.col("first_pos") - window + 1, F.lit(1))  # 1-based
    length = F.col("first_pos") + m + window - start + 1
    return (
        hits.join(docs.select(F.col(id_col).alias("doc_id"), text_col), "doc_id")
        .select(
            "doc_id",
            "n_occ",
            "first_pos",
            F.concat_ws(
                " ", F.slice(tokenize(F.col(text_col)), start, length)
            ).alias("snippet"),
        )
    )


def near_match_relational(
    docs: DataFrame,
    term_a: str,
    term_b: str,
    window: int,
    id_col: str = "doc_id",
    text_col: str = "content",
    ordered: bool = False,
) -> DataFrame:
    """Proximity search (Lucene's SpanNearQuery / ``"a b"~k`` slop syntax):
    docs where `term_a` and `term_b` occur within `window` token positions.
    Returns (doc_id, n_pairs) with n_pairs = count of qualifying position
    pairs (0 < p_b - p_a <= window if ordered, else 0 < |p_a - p_b| <=
    window; identical positions are impossible for distinct terms and
    excluded for safety).

    Plan: the token stream posexplodes once; each side filters to ONE term
    before the join (the relational twin of fetching two position posting
    lists), so the join input is per-term positions, not the corpus — the
    equi-join key is doc_id with a band predicate on positions, which AQE
    handles as a plain shuffled join sized by the two posting lists. The
    physical-index path would run the same band intersection inside the
    positions-segment kernel; the relational form is the oracle twin
    (DuckDB unnest + self-join, driver value-checked).
    """
    a = term_a.lower()
    b = term_b.lower()
    stream = docs.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(tokenize(F.col(text_col))).alias("pos", "term"),
    )
    pa = stream.filter(F.col("term") == a).select("doc_id", F.col("pos").alias("pa"))
    pb = stream.filter(F.col("term") == b).select(
        F.col("doc_id").alias("d"), F.col("pos").alias("pb")
    )
    delta = F.col("pb") - F.col("pa")
    band = (
        (delta > 0) & (delta <= window)
        if ordered
        else (F.abs(delta) <= window) & (delta != 0)
    )
    return (
        pa.join(pb, (pa["doc_id"] == pb["d"]) & band)
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_pairs"))
    )


def phrase_match_relational(
    docs: DataFrame, phrase: str, id_col: str = "doc_id", text_col: str = "content"
) -> DataFrame:
    """Catalyst-only phrase match twin (the small-scale oracle path and the
    index-free fallback): posexplode the token stream once, then chain
    len(phrase)-1 self-joins on (doc, pos+j). Returns (doc_id, n_occ).
    SQL-expressible 1:1 (DuckDB unnest + generate_subscripts), so the
    driver value-hash-checks the phrase semantics the index kernel
    implements physically."""
    import re

    toks = [t for t in re.split(TOKEN_SPLIT_RE, phrase.lower()) if t]
    assert toks, "empty phrase"
    stream = docs.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(tokenize(F.col(text_col))).alias("pos", "term"),
    )
    base = (
        stream.filter(F.col("term") == toks[0])
        .select("doc_id", F.col("pos").alias("p0"))
    )
    for j, t in enumerate(toks[1:], start=1):
        nxt = stream.filter(F.col("term") == t).select(
            F.col("doc_id").alias("d"), F.col("pos").alias(f"p{j}")
        )
        base = base.join(
            nxt,
            (base["doc_id"] == nxt["d"])
            & (nxt[f"p{j}"] == base["p0"] + F.lit(j)),
        ).drop("d", f"p{j}")
    return base.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_occ"))


def phrase_prefix_relational(
    docs: DataFrame,
    phrase: str,
    max_expansions: int = 50,
    id_col: str = "doc_id",
    text_col: str = "content",
) -> DataFrame:
    """match_phrase_prefix (Elasticsearch): exact phrase on every token but
    the LAST, which matches any vocabulary term with that prefix. The
    expansion set is the first `max_expansions` prefix-matching terms in
    lexicographic order — Lucene's term-dictionary enumeration order and
    cap (max_expansions=50 default), so the relational path, the index
    path (`phrase_prefix_topk` expands from the SAME dictionary relation)
    and the SQL oracle agree exactly.

    Counting matches phrase_match_relational's: one match per anchor
    position — each anchor's final slot holds exactly one term, so the
    per-expansion counts are disjoint and sum cleanly. Returns
    (doc_id, n_occ)."""
    import re

    toks = [t for t in re.split(TOKEN_SPLIT_RE, phrase.lower()) if t]
    assert toks, "empty phrase"
    prefix = toks[-1]
    stream = docs.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(tokenize(F.col(text_col))).alias("pos", "term"),
    )
    expansions = (
        stream.select("term")
        .filter(F.col("term").startswith(prefix))
        .distinct()
        .orderBy("term")
        .limit(int(max_expansions))
    )
    last = stream.join(F.broadcast(expansions), "term").select(
        F.col("doc_id").alias("d"), F.col("pos").alias("pl")
    )
    n = len(toks)
    if n == 1:
        return last.groupBy(F.col("d").alias("doc_id")).agg(
            F.count(F.lit(1)).alias("n_occ")
        )
    base = stream.filter(F.col("term") == toks[0]).select(
        "doc_id", F.col("pos").alias("p0")
    )
    for j, t in enumerate(toks[1:-1], start=1):
        nxt = stream.filter(F.col("term") == t).select(
            F.col("doc_id").alias("d"), F.col("pos").alias(f"p{j}")
        )
        base = base.join(
            nxt,
            (base["doc_id"] == nxt["d"]) & (nxt[f"p{j}"] == base["p0"] + F.lit(j)),
        ).drop("d", f"p{j}")
    base = base.join(
        last,
        (base["doc_id"] == last["d"]) & (last["pl"] == base["p0"] + F.lit(n - 1)),
    ).drop("d", "pl")
    return base.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_occ"))


def phrase_prefix_topk(
    spark: SparkSession,
    paths: IndexPaths,
    queries: list[tuple[int, str]],
    max_expansions: int = 50,
    k: int = 100,
) -> DataFrame:
    """match_phrase_prefix over the PHYSICAL index: the last token expands
    against the index DICTIONARY (prefix range scan, term-order cap at
    max_expansions — a serving system never touches the corpus for this),
    then every expansion runs through the positional phrase kernel and the
    per-expansion counts sum per (query, doc).

    Cost class: ≤ max_expansions phrase verifications per query, each the
    usual pushed-down positions fetch; expansions ride ONE phrase_topk
    call (composite query ids), so the positions relation scans once with
    one IN-filter over all expanded tails."""
    import re

    from mtix_spark.index.build import read_dictionary

    qtoks = []
    for qid, text in queries:
        toks = [t for t in re.split(TOKEN_SPLIT_RE, text.lower()) if t]
        if toks:
            qtoks.append((qid, toks))
    empty = spark.createDataFrame([], "query_id long, doc_id long, n_occ long")
    if not qtoks:
        return empty
    if any(q < 0 for q, _ in qtoks):
        raise ValueError("phrase_prefix_topk needs nonneg query ids (composite packing)")
    if not 0 < max_expansions <= 1000:
        raise ValueError("max_expansions must be in (0, 1000] (composite packing)")
    vocab = read_dictionary(spark, paths).select("term")
    sub_queries: list[tuple[int, str]] = []
    for qid, toks in qtoks:
        exps = [
            r["term"]
            for r in vocab.filter(F.col("term").startswith(toks[-1]))
            .orderBy("term")
            .limit(int(max_expansions))
            .collect()
        ]
        for j, e in enumerate(exps):
            sub_queries.append((qid * 1000 + j, " ".join(toks[:-1] + [e])))
    if not sub_queries:
        return empty
    assert len({j for j, _ in sub_queries}) == len(sub_queries)
    sub = phrase_topk(spark, paths, sub_queries, k=2**31 - 1)
    agg = (
        sub.withColumn("query_id", F.floor(F.col("query_id") / 1000).cast("long"))
        .groupBy("query_id", "doc_id")
        .agg(F.sum("n_occ").alias("n_occ"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("n_occ"), F.asc("doc_id"))
    return (
        agg.withColumn("__r", F.row_number().over(w))
        .filter(F.col("__r") <= k)
        .drop("__r")
    )


# ---------------------------------------------------------------------------
# SpanNear: n-term ordered proximity with slop (Lucene SpanNearQuery)
# ---------------------------------------------------------------------------


def span_near_relational(
    docs: DataFrame,
    terms: list[str],
    slop: int,
    id_col: str = "doc_id",
    text_col: str = "content",
) -> DataFrame:
    """Ordered n-term proximity (SpanNearQuery(inOrder=true, slop)):
    (doc_id, n_spans) where n_spans counts ANCHORED GREEDY SPANS — start
    positions p1 of terms[0] whose greedy chain (each p_i = the SMALLEST
    position of terms[i] strictly after p_{i-1}) completes with total gap
    p_n - p_1 - (n-1) <= slop. Greedy-minimal chains are optimal for
    span existence, so an anchor matches iff ANY in-order tuple within
    the slop starts there; counting anchors (not tuples) keeps the count
    linear in tf instead of combinatorial.

    Plan: posexplode once; each chain step is a per-term positions
    relation joined on (doc, pos > prev) then groupBy(doc, p1) min(pos) —
    n-1 join+agg rounds over position lists, never the corpus. The
    physical path (`span_near_topk`) runs the same chain as vectorized
    searchsorted steps inside the positions-segment kernel."""
    toks = [t.lower() for t in terms]
    assert toks, "empty span"
    stream = docs.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(tokenize(F.col(text_col))).alias("pos", "term"),
    )
    base = stream.filter(F.col("term") == toks[0]).select(
        "doc_id", F.col("pos").alias("p1"), F.col("pos").alias("cur")
    )
    for t in toks[1:]:
        nxt = stream.filter(F.col("term") == t).select(
            F.col("doc_id").alias("d"), F.col("pos").alias("np")
        )
        base = (
            base.join(nxt, (base["doc_id"] == nxt["d"]) & (F.col("np") > F.col("cur")))
            .groupBy("doc_id", "p1")
            .agg(F.min("np").alias("cur"))
        )
    n = len(toks)
    return (
        base.filter(F.col("cur") - F.col("p1") - (n - 1) <= slop)
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_spans"))
    )


def span_near_topk(
    spark: SparkSession,
    paths: IndexPaths,
    queries: list[tuple[int, list[str], int]],
    k: int = 100,
) -> DataFrame:
    """Physical SpanNear over the positional index — same anchored-greedy
    semantics as `span_near_relational`, sharing its oracle. queries:
    (query_id, [t1..tn], slop). Returns (query_id, doc_id, n_spans),
    top-k per query by (n_spans DESC, doc_id ASC).

    Kernel: candidate docs = intersection of all terms' doc lists; all
    positions packed (cand_rank << SHIFT | pos) so one
    np.searchsorted(side='right') per chain step advances EVERY anchor at
    once (the greedy 'smallest position strictly after' lookup); anchors
    whose successor falls outside their rank block die. n-1 vectorized
    steps total per (query, segment) — no per-doc or per-anchor loops."""
    live_qs = [
        (qid, [t.lower() for t in ts], int(s))
        for qid, ts, s in queries
        if ts and s >= 0
    ]
    empty = spark.createDataFrame([], "query_id long, doc_id long, n_spans long")
    if not live_qs:
        return empty
    all_terms = sorted({t for _, ts, _ in live_qs for t in ts})

    man = read_manifest(paths)
    live = require_positions(man)
    pos_dir = os.path.join(paths.root, "positions")
    rows = (
        spark.read.parquet(pos_dir)
        .filter(F.col("term").isin(all_terms))
        .filter(F.col("seg").isin(live))
    )
    has_deletes = int(man.get("n_deleted", 0)) > 0
    del_root = os.path.join(paths.root, "deletes")
    del_epoch = int(man.get("delete_epoch", 0))

    def kernel(key, p: pd.DataFrame) -> pd.DataFrame:
        deleted = None
        if has_deletes:
            from mtix_spark.index.deletes import load_deleted, mask_deleted

            deleted = load_deleted(del_root, int(key[0]), del_epoch)
        by_term = {}
        for _, r in p.iterrows():
            ids = delta_decode(r["doc_ids_bin"]).astype(np.int64)
            counts = decode_varint(r["pos_counts_bin"]).astype(np.int64)
            pdel = decode_varint(r["positions_bin"]).astype(np.int64)
            offs = np.zeros(ids.size + 1, dtype=np.int64)
            np.cumsum(counts, out=offs[1:])
            pos = _reanchor(pdel, offs)
            if deleted is not None and deleted.size:
                keep = np.flatnonzero(mask_deleted(ids, deleted))
                if keep.size != ids.size:
                    pos = (
                        np.concatenate([pos[offs[i] : offs[i + 1]] for i in keep])
                        if keep.size
                        else np.empty(0, dtype=np.int64)
                    )
                    new_offs = np.zeros(keep.size + 1, dtype=np.int64)
                    np.cumsum(counts[keep], out=new_offs[1:])
                    ids, offs = ids[keep], new_offs
            by_term[r["term"]] = (ids, offs, pos)

        out = {"query_id": [], "doc_id": [], "n_spans": []}
        for qid, toks, slop in live_qs:
            if any(t not in by_term for t in toks):
                continue
            # candidate docs: intersect all terms' doc lists, tracking each
            # term's row indices into its own arrays
            cand = by_term[toks[0]][0]
            for t in toks[1:]:
                cand = np.intersect1d(cand, by_term[t][0], assume_unique=True)
            if cand.size == 0:
                continue

            def packed(term):
                ids_t, offs, pos = by_term[term]
                rows_idx = np.searchsorted(ids_t, cand)  # cand ⊆ ids_t
                lens = (offs[rows_idx + 1] - offs[rows_idx]).astype(np.int64)
                rank = np.repeat(np.arange(cand.size, dtype=np.int64), lens)
                flat = (
                    np.concatenate([pos[offs[i] : offs[i + 1]] for i in rows_idx])
                    if rows_idx.size
                    else np.empty(0, np.int64)
                )
                return (rank << _POS_SHIFT) | flat

            p1 = packed(toks[0])
            cur = p1.copy()
            alive = np.ones(cur.size, dtype=bool)
            for t in toks[1:]:
                pa = packed(t)
                idx = np.searchsorted(pa, cur, side="right")
                ok = idx < pa.size
                nxt = np.where(ok, pa[np.minimum(idx, pa.size - 1)], 0)
                # successor must stay in the same rank block
                same = ok & ((nxt >> _POS_SHIFT) == (cur >> _POS_SHIFT))
                alive &= same
                cur = np.where(same, nxt, cur)
            n = len(toks)
            span_ok = alive & (
                (cur & ((1 << _POS_SHIFT) - 1)) - (p1 & ((1 << _POS_SHIFT) - 1))
                <= slop + (n - 1)
            )
            rank_of = (p1 >> _POS_SHIFT)[span_ok]
            per_doc = np.bincount(rank_of, minlength=cand.size).astype(np.int64)
            nz = np.flatnonzero(per_doc)
            out["query_id"].extend([qid] * nz.size)
            out["doc_id"].extend(cand[nz].tolist())
            out["n_spans"].extend(per_doc[nz].tolist())
        return pd.DataFrame(out).astype(
            {"query_id": "int64", "doc_id": "int64", "n_spans": "int64"}
        )

    per_seg = rows.groupBy("seg").applyInPandas(
        kernel, "query_id long, doc_id long, n_spans long"
    )
    w_ = Window.partitionBy("query_id").orderBy(F.desc("n_spans"), F.asc("doc_id"))
    return (
        per_seg.withColumn("__r", F.row_number().over(w_))
        .filter(F.col("__r") <= k)
        .drop("__r")
    )


def term_snippets(
    docs: DataFrame,
    queries: list[tuple[int, str]],
    k: int = 10,
    window: int = 8,
    id_col: str = "doc_id",
    text_col: str = "content",
) -> DataFrame:
    """Unified highlighter for TERM queries (Lucene UnifiedHighlighter's
    best-passage selection, deterministic form): for each of a query's
    top-k BM25 docs, the `window`-token span holding the MOST query-term
    occurrences — anchored at a query-term position, ties to the earliest
    anchor. Returns (query_id, doc_id, best_pos, n_in_window, snippet).

    Plan: query-term positions (one posexplode, term IN-filtered) semi-
    joined to the top-k relation, then a self-band-join counts occurrences
    per anchor — input sized by the top-k docs' query-term positions, not
    the corpus. Complements `phrase_snippets` (which anchors at the first
    exact phrase hit)."""
    from mtix_spark.expand import expanded_bm25

    spark = docs.sparkSession
    import re as _re

    q = spark.createDataFrame(
        [
            (qid, t)
            for qid, text in queries
            for t in sorted({x for x in _re.split(TOKEN_SPLIT_RE, text.lower()) if x})
        ],
        "query_id long, term string",
    )
    top = expanded_bm25(docs, q, k=k, id_col=id_col, text_col=text_col).select(
        "query_id", "doc_id"
    )
    stream = docs.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(tokenize(F.col(text_col))).alias("pos", "term"),
    )
    qpos = (
        stream.join(F.broadcast(q), "term")
        .join(top, ["query_id", "doc_id"], "left_semi")
        .select("query_id", "doc_id", "pos")
    )
    a = qpos.select("query_id", "doc_id", F.col("pos").alias("anchor"))
    b = qpos.select(
        F.col("query_id").alias("q2"), F.col("doc_id").alias("d2"), F.col("pos").alias("p2")
    )
    counted = (
        a.join(
            b,
            (a["query_id"] == b["q2"])
            & (a["doc_id"] == b["d2"])
            & (F.col("p2") >= F.col("anchor"))
            & (F.col("p2") < F.col("anchor") + window),
        )
        .groupBy("query_id", "doc_id", "anchor")
        .agg(F.count(F.lit(1)).alias("n_in_window"))
    )
    w = Window.partitionBy("query_id", "doc_id").orderBy(
        F.desc("n_in_window"), F.asc("anchor")
    )
    best = (
        counted.withColumn("__r", F.row_number().over(w))
        .filter(F.col("__r") == 1)
        .drop("__r")
    )
    return (
        best.join(docs.select(F.col(id_col).alias("doc_id"), text_col), "doc_id")
        .select(
            "query_id",
            "doc_id",
            F.col("anchor").cast("long").alias("best_pos"),
            F.col("n_in_window").cast("long").alias("n_in_window"),
            F.concat_ws(
                " ", F.slice(tokenize(F.col(text_col)), F.col("anchor") + 1, window)
            ).alias("snippet"),
        )
    )
