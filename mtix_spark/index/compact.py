"""Segment compaction — the tiered merge policy that keeps a streaming
index healthy (Lucene's merge scheduler, re-expressed over the engine's
immutable doc-range-disjoint segments).

Streaming ingestion (`stream_index_ingest`) produces one small segment per
micro-batch; left alone, query fan-out and per-segment fixed costs grow
linearly with uptime. Compaction merges runs of doc-range-CONTIGUOUS small
segments into one segment:

  - postings merge is the same ordered-concat streaming kernel as the
    global term merge (`_merge_stream`) — fragments of one term never
    interleave across doc-range-disjoint segments, so no re-sort, and
    block-max metadata is rebuilt soundly on the merged grid;
  - the docmap partitions move wholesale (doc ids are untouched);
  - the manifest commit is the atomic cut-over: new segment written first,
    manifest flipped (old entries out, new entry in), old dirs deleted
    last. A crash leaves either the old manifest (new dir is an ignored
    orphan) or the new one (old dirs are ignored orphans) — the query
    engine filters to manifest segments either way, and `vacuum_segments`
    removes orphans on the next run.

Global stats (n_docs, avgdl, dictionary df/cf) are invariant under
compaction — it moves postings between segments without changing them.

The merged segment records `avgdl_build` = min over its fragments: the
query kernel's bound rescale max(1, avgdl_q/avgdl_b) is then conservative
for every fragment, keeping MaxScore pruning sound.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from mtix_spark.index.build import (
    MERGED_SCHEMA,
    IndexPaths,
    _commit_manifest,
    _merge_stream,
    read_manifest,
)

COMPACT_BASE = 2_000_000  # compacted seg ids live above batch + streaming ids


def plan_compaction(
    manifest: dict, small_docs: int = 5_000, max_group: int = 16
) -> list[list[int]]:
    """Pick runs of doc-range-adjacent segments, each smaller than
    `small_docs`, grouped up to `max_group` per merge. Only groups of ≥2
    segments are worth a rewrite. Pure function of the manifest (unit-
    testable; the policy half of compact_segments)."""
    segs = sorted(
        ((int(m["min_doc"]), int(m["max_doc"]), int(sid), int(m.get("n_docs", 0)))
         for sid, m in manifest["segments"].items()),
    )
    groups: list[list[int]] = []
    cur: list[int] = []
    cur_prev_max = None
    for lo, hi, sid, n in segs:
        adjacent = cur_prev_max is not None and lo == cur_prev_max + 1
        if n < small_docs and (not cur or adjacent) and len(cur) < max_group:
            cur.append(sid)
        else:
            if len(cur) >= 2:
                groups.append(cur)
            cur = [sid] if n < small_docs else []
        cur_prev_max = hi
    if len(cur) >= 2:
        groups.append(cur)
    return groups


def _merge_positions_stream():
    """Streaming merge kernel for POSITIONAL posting fragments (input
    sorted by (term, min_doc) within term-partitioned partitions, like
    `_merge_stream`). Doc-id delta streams re-stitch (decode + re-encode);
    pos_counts_bin and positions_bin concatenate BYTE-WISE — both restart
    their varint/delta coding at every doc, so fragment boundaries need no
    transform at all."""
    import pandas as pd
    import numpy as np

    from mtix_spark.index.codec import delta_decode, delta_encode

    def kernel(batches):
        pending = None

        def flush(pdf, hold_last):
            nonlocal pending
            terms = pdf["term"].to_numpy()
            brk = terms[1:] != terms[:-1]
            starts = np.concatenate([[0], np.nonzero(brk)[0] + 1])
            ends = np.concatenate([starts[1:], [len(terms)]])
            if hold_last:
                pending = pdf.iloc[starts[-1] :]
                starts, ends = starts[:-1], ends[:-1]
            else:
                pending = None
            if not len(starts):
                return None
            id_bins = pdf["doc_ids_bin"].to_numpy()
            ct_bins = pdf["pos_counts_bin"].to_numpy()
            pos_bins = pdf["positions_bin"].to_numpy()
            out = {
                "term": [], "df_seg": [], "doc_ids_bin": [],
                "pos_counts_bin": [], "positions_bin": [],
                "min_doc": [], "max_doc": [],
            }
            for a, b in zip(starts, ends):
                ids = np.concatenate([delta_decode(x) for x in id_bins[a:b]])
                out["term"].append(terms[a])
                out["df_seg"].append(int(ids.size))
                out["doc_ids_bin"].append(delta_encode(ids))
                out["pos_counts_bin"].append(b"".join(ct_bins[a:b]))
                out["positions_bin"].append(b"".join(pos_bins[a:b]))
                out["min_doc"].append(int(ids[0]))
                out["max_doc"].append(int(ids[-1]))
            return pd.DataFrame(out)

        for pdf in batches:
            if pending is not None and len(pending):
                pdf = pd.concat([pending, pdf], ignore_index=True)
            if not len(pdf):
                continue
            got = flush(pdf, hold_last=True)
            if got is not None and len(got):
                yield got
        if pending is not None and len(pending):
            got = flush(pending, hold_last=False)
            if got is not None and len(got):
                yield got

    return kernel


def compact_segments(
    spark: SparkSession,
    paths: IndexPaths,
    small_docs: int = 5_000,
    max_group: int = 16,
) -> list[int]:
    """Run one compaction pass; returns the new segment ids created."""
    from mtix_spark.table_io import DEFAULT_IO as tio

    man = read_manifest(paths)
    groups = plan_compaction(man, small_docs, max_group)
    new_ids = []
    next_id = COMPACT_BASE + int(man.get("compactions", 0))
    for group in groups:
        new_seg = next_id
        next_id += 1
        old = spark.read.parquet(paths.postings).filter(F.col("seg").isin(group))
        merged = (
            old.repartition("term")
            .sortWithinPartitions("term", "min_doc")
            .mapInPandas(_merge_stream(with_salt=False), MERGED_SCHEMA)
            .select(
                "term",
                F.lit(new_seg).cast("int").alias("seg"),
                F.col("df").cast("int").alias("df_seg"),
                F.col("cf").alias("cf_seg"),
                "doc_ids_bin",
                "tfs_bin",
                "max_tf",
                "block_max_wtf",
                "min_doc",
                "max_doc",
            )
        )
        tio.overwrite_partition(merged, paths.postings, "seg", new_seg)
        dm = spark.read.parquet(paths.docmap).filter(F.col("seg").isin(group))
        tio.overwrite_partition(dm.drop("seg"), paths.docmap, "seg", new_seg)

        # positional segments (if built) compact alongside — the phrase
        # kernel reads every live positions/seg=K, so the set must track
        # the tf segments 1:1
        pos_root = os.path.join(paths.root, "positions")
        pos_done = set(man.get("positions_segments", []))
        if pos_done and set(group) <= pos_done:
            pold = spark.read.parquet(pos_root).filter(F.col("seg").isin(group))
            pmerged = (
                pold.repartition("term")
                .sortWithinPartitions("term", "min_doc")
                .mapInPandas(
                    _merge_positions_stream(),
                    "term string, df_seg int, doc_ids_bin binary, "
                    "pos_counts_bin binary, positions_bin binary, "
                    "min_doc long, max_doc long",
                )
                .withColumn("seg", F.lit(new_seg).cast("int"))
            )
            tio.overwrite_partition(pmerged, pos_root, "seg", new_seg)
            man["positions_segments"] = sorted(
                (pos_done - set(group)) | {new_seg}
            )
        elif pos_done & set(group):
            # Only SOME of the group's segments have positions (e.g.
            # build_positions ran, then more tf-only stream batches landed,
            # then compaction grouped both). Merging here would produce a
            # positions segment missing the unpositioned fragments' docs
            # while require_positions still passes — the silent-partial
            # failure that gate exists to prevent. Instead drop the group
            # from positions_segments: positional queries raise until
            # build_positions re-runs and rebuilds new_seg from the docs.
            man["positions_segments"] = sorted(pos_done - set(group))

        # tombstones of compacted-away segments migrate to the new segment
        # id (ADVICE r3 medium): every query path — segment kernels,
        # positional kernels, MergedSearcher — resolves deletes by MANIFEST
        # segment id, so tombstones left behind at deletes/seg=<old> would
        # be orphaned by the manifest flip and the deleted docs would
        # silently resurface while n_deleted still reports them. Doc ids
        # are untouched by compaction, so the union of the group's
        # tombstone sets (ranges disjoint → no dedup needed) is exactly the
        # new segment's tombstone set. Written BEFORE the manifest commit:
        # a reader that observes new_seg also observes its tombstones; a
        # crash in between leaves an orphan deletes dir that vacuum removes.
        del_root = os.path.join(paths.root, "deletes")
        del_group = [
            s for s in group if os.path.isdir(os.path.join(del_root, f"seg={s}"))
        ]
        if del_group:
            moved = spark.read.parquet(
                *[os.path.join(del_root, f"seg={s}") for s in del_group]
            ).select("doc_id")
            tio.overwrite_partition(
                moved.sortWithinPartitions("doc_id"), del_root, "seg", new_seg
            )

        metas = [man["segments"][str(s)] for s in group]
        entry = {
            "min_doc": min(int(m["min_doc"]) for m in metas),
            "max_doc": max(int(m["max_doc"]) for m in metas),
            "n_docs": sum(int(m.get("n_docs", 0)) for m in metas),
            "tokens": sum(int(m.get("tokens", 0)) for m in metas),
            "lineage": {"source": "compaction", "merged_from": group},
        }
        frag_avgdls = [
            float(m["avgdl_build"]) for m in metas if m.get("avgdl_build")
        ]
        if frag_avgdls:  # min over fragments keeps every bound conservative
            entry["avgdl_build"] = min(frag_avgdls)
        man["segments"][str(new_seg)] = entry
        for s in group:
            del man["segments"][str(s)]
        man["compactions"] = int(man.get("compactions", 0)) + 1
        _commit_manifest(paths, man)  # atomic cut-over per group
        for s in group:  # cleanup after the commit; crash → vacuum handles
            shutil.rmtree(os.path.join(paths.postings, f"seg={s}"), ignore_errors=True)
            shutil.rmtree(os.path.join(paths.docmap, f"seg={s}"), ignore_errors=True)
            shutil.rmtree(os.path.join(pos_root, f"seg={s}"), ignore_errors=True)
            shutil.rmtree(os.path.join(del_root, f"seg={s}"), ignore_errors=True)
        new_ids.append(new_seg)
    return new_ids


def vacuum_segments(paths: IndexPaths) -> list[str]:
    """Remove seg=K directories not referenced by the manifest (crash
    leftovers from builds or compactions). Returns removed dir names."""
    man = read_manifest(paths)
    live = {str(s) for s in man["segments"]}
    live_pos = {str(s) for s in man.get("positions_segments", [])}
    removed = []
    for root, keep in (
        (paths.postings, live),
        (paths.docmap, live),
        (os.path.join(paths.root, "positions"), live_pos),
        # crash leftovers between a compaction's manifest commit and its
        # old-dir cleanup (tombstones were already migrated to the new id)
        (os.path.join(paths.root, "deletes"), live),
    ):
        if not os.path.isdir(root):
            continue
        for d in os.listdir(root):
            if d.startswith("seg=") and d.split("=", 1)[1] not in keep:
                shutil.rmtree(os.path.join(root, d), ignore_errors=True)
                removed.append(d)
    # stale dictionary versions (crash leftovers / superseded snapshots):
    # everything but the manifest's pointer AND the immediately preceding
    # version goes. The pointer-1 retention protects readers opened before
    # a pointer flip (ADVICE r3): SegmentSearcher resolves its dictionary
    # version at construction, so vacuuming it out from under an open
    # handle after a stream batch/purge would FileNotFound its next
    # dictionary action. One version of slack covers one flip; callers
    # that hold handles across multiple flips must reopen.
    dv = man.get("dictionary_version")
    if dv is not None and os.path.isdir(paths.dictionary):
        keep_v = {f"v={int(dv)}", f"v={int(dv) - 1}"}
        for d in os.listdir(paths.dictionary):
            if d.startswith("v=") and d not in keep_v:
                shutil.rmtree(os.path.join(paths.dictionary, d), ignore_errors=True)
                removed.append(os.path.join("dictionary", d))
    return removed
