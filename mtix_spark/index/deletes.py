"""Document deletion: tombstones + purge (Lucene's deletes model,
re-expressed over the engine's immutable segments).

`delete_docs` writes per-segment tombstone parquet under `deletes/seg=K/`
and bumps `delete_epoch` in the manifest. Queries then MASK deleted docs at
posting-decode time — inside the segment kernels, before any accumulation
or pruning (masking after top-k would let a deleted doc's score inflate the
MaxScore threshold θ and wrongly prune live docs). Scoring keeps the
build-time corpus stats (N, avgdl, df) until a purge — exactly Lucene's
semantics, where deleted docs still count in df/IDF until segments merge.

`purge_deletes` is expungeDeletes: each tombstoned segment is rebuilt from
its decoded tf (and positions) relation minus the deleted docs, corpus
stats and the dictionary are recomputed, and tombstones clear. After a
purge the index is value-identical to one built fresh over the surviving
docs (modulo dense docID assignment — tested via the path mapping).

Tombstone sets ride executor-local caches keyed by (root, seg,
delete_epoch) — same discipline as the doc-length cache: never shuffled,
invalidated by epoch bump.
"""

from __future__ import annotations

import os

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mtix_spark.index.build import (
    POSTINGS_SCHEMA,
    IndexPaths,
    _build_segment_postings,
    _commit_manifest,
    read_manifest,
)

_DEL_CACHE: dict = {}
_DEL_CACHE_MAX = 64


def deletes_root(paths: IndexPaths) -> str:
    return os.path.join(paths.root, "deletes")


def load_deleted(root: str, seg: int, epoch: int) -> np.ndarray:
    """Sorted deleted doc ids of one segment (executor-local, cached)."""
    key = (root, seg, epoch)
    hit = _DEL_CACHE.get(key)
    if hit is not None:
        return hit
    import glob

    import pyarrow.parquet as pq

    parts = []
    for f in glob.glob(os.path.join(root, f"seg={seg}", "*.parquet")):
        parts.append(pq.read_table(f, columns=["doc_id"])["doc_id"].to_numpy())
    out = (
        np.unique(np.concatenate(parts)) if parts else np.empty(0, dtype=np.int64)
    ).astype(np.int64)
    if len(_DEL_CACHE) >= _DEL_CACHE_MAX:
        _DEL_CACHE.pop(next(iter(_DEL_CACHE)))
    _DEL_CACHE[key] = out
    return out


def mask_deleted(ids: np.ndarray, deleted: np.ndarray) -> np.ndarray:
    """Boolean keep-mask for sorted-unique `deleted` (searchsorted
    membership — O(|ids| log |deleted|), no Python)."""
    if deleted.size == 0:
        return np.ones(ids.size, dtype=bool)
    pos = np.searchsorted(deleted, ids)
    pos_c = np.minimum(pos, deleted.size - 1)
    return deleted[pos_c] != ids


def delete_docs(
    spark: SparkSession, paths: IndexPaths, doc_ids: list[int] | DataFrame
) -> int:
    """Tombstone the given doc ids. Returns the number of NEW tombstones
    (ids already deleted or outside every segment's range don't count).
    Accumulates across calls (union with existing tombstones per segment);
    the manifest's `delete_epoch` bump invalidates executor caches.

    `doc_ids` may be a Python list (point-delete convenience) or a DataFrame
    with a `doc_id` column (GDPR-scale campaigns). Either way the ids never
    transit the driver: segment assignment is a broadcast range join against
    the manifest, the merge with existing tombstones is a DataFrame union +
    distinct, and the only things collected are one count row per touched
    segment (bounded by the segment count, not the id count).

    Crash semantics (replay-to-heal): the per-segment dir swaps below are
    individually atomic (rename) but NOT atomic as a set — a crash mid-loop
    leaves some segments with the merged tombstones and others with the old
    ones, and the manifest still at the old delete_epoch (the epoch bump +
    manifest commit is the last step, so n_deleted never overstates what is
    fully on disk). Tombstones only ever ADD docs, so the mixed state is a
    sound intermediate (some deletes visible early, none lost), and REPLAYING
    the same delete_docs call heals it exactly: the merge is a union, the
    staging recomputes every touched segment, and the swaps are idempotent.
    Callers that need all-or-nothing visibility should route deletes through
    the Iceberg seam (table_io), where the snapshot commit is the gate."""
    import shutil

    man = read_manifest(paths)
    if isinstance(doc_ids, DataFrame):
        ids_df = doc_ids.select(F.col("doc_id").cast("long").alias("doc_id"))
    else:
        if not doc_ids:
            return 0
        ids_df = spark.createDataFrame(
            [(int(i),) for i in set(doc_ids)], "doc_id long"
        )
    ranges = spark.createDataFrame(
        [
            (int(sid), int(m["min_doc"]), int(m["max_doc"]))
            for sid, m in man["segments"].items()
        ],
        "seg int, lo long, hi long",
    )
    tagged = (
        ids_df.join(
            F.broadcast(ranges),
            (F.col("doc_id") >= F.col("lo")) & (F.col("doc_id") <= F.col("hi")),
        )
        .select("seg", "doc_id")
        .distinct()
    )
    root = deletes_root(paths)
    have_existing = os.path.isdir(root) and any(
        d.startswith("seg=") for d in os.listdir(root)
    )
    if have_existing:
        existing = spark.read.parquet(root).select(
            F.col("seg").cast("int").alias("seg"), "doc_id"
        )
        merged = existing.unionByName(tagged).distinct()
    else:
        existing = None
        merged = tagged

    # One staged distributed write for every touched segment, then per-dir
    # swap: never overwrite a parquet dir a lazy plan still reads (the
    # Iceberg seam makes this a snapshot commit; the parquet rendition
    # stages + renames).
    touched_col = tagged.select("seg").distinct()
    if not touched_col.take(1):  # nothing in any segment's range
        return 0
    stage = os.path.join(paths.root, "deletes_stage")
    shutil.rmtree(stage, ignore_errors=True)
    (
        merged.join(F.broadcast(touched_col), "seg")  # untouched segs keep their dirs
        .repartition("seg")
        .sortWithinPartitions("doc_id")
        .write.partitionBy("seg")
        .parquet(stage)
    )
    staged = spark.read.parquet(stage)
    n_merged = {
        int(r["seg"]): int(r["n"])
        for r in staged.groupBy("seg").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    if not n_merged:
        shutil.rmtree(stage, ignore_errors=True)
        return 0
    n_existing = {}
    if existing is not None:
        n_existing = {
            int(r["seg"]): int(r["n"])
            for r in existing.groupBy("seg")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
    n_new = sum(n - n_existing.get(sid, 0) for sid, n in n_merged.items())
    os.makedirs(root, exist_ok=True)
    for sid in sorted(n_merged):
        seg_dir = os.path.join(root, f"seg={sid}")
        shutil.rmtree(seg_dir, ignore_errors=True)
        shutil.move(os.path.join(stage, f"seg={sid}"), seg_dir)
    shutil.rmtree(stage, ignore_errors=True)
    if n_new:
        man["delete_epoch"] = int(man.get("delete_epoch", 0)) + 1
        man["n_deleted"] = int(man.get("n_deleted", 0)) + n_new
        _commit_manifest(paths, man)
    return n_new


def purge_deletes(spark: SparkSession, paths: IndexPaths) -> list[int]:
    """expungeDeletes: physically rewrite every tombstoned segment without
    its deleted docs, recompute corpus stats + dictionary + block maxima
    (with the POST-purge avgdl), clear tombstones. Returns purged seg ids."""
    import json
    import shutil

    from mtix_spark.index.codec import decode_varint, delta_decode
    from mtix_spark.table_io import DEFAULT_IO as tio

    man = read_manifest(paths)
    root = deletes_root(paths)
    if not os.path.isdir(root):
        return []
    seg_dirs = [
        int(d.split("=", 1)[1]) for d in os.listdir(root) if d.startswith("seg=")
    ]
    todo = [s for s in seg_dirs if str(s) in man["segments"]]
    if not todo:
        return []

    epoch = int(man.get("delete_epoch", 0))
    # post-purge corpus stats from the docmap minus tombstones
    dm = spark.read.parquet(paths.docmap)
    del_df = spark.read.parquet(root).select(
        F.col("seg").alias("dseg"), "doc_id"
    )
    live = dm.join(del_df.select("doc_id"), "doc_id", "left_anti")
    row = live.agg(
        F.count(F.lit(1)).alias("n"), F.sum("dl").alias("tok")
    ).collect()[0]
    n_docs, tokens = int(row["n"]), int(row["tok"] or 0)
    avgdl = tokens / n_docs if n_docs else 0.0

    stage = os.path.join(paths.root, "purge_stage")
    shutil.rmtree(stage, ignore_errors=True)

    def swap(src: str, dest: str) -> None:
        """Staged-write cut-over: the rebuilt relation lands in `src`, then
        replaces `dest` on the filesystem — never reading and overwriting
        one path in a single lazy Spark plan."""
        shutil.rmtree(dest, ignore_errors=True)
        shutil.move(src, dest)

    for sid in sorted(todo):
        deleted = load_deleted(root, sid, epoch)

        def decode_kernel(batches):
            import pandas as pd

            for pdf in batches:
                terms, docs_, tfs_ = [], [], []
                for r in pdf.itertuples(index=False):
                    ids = delta_decode(r.doc_ids_bin).astype(np.int64)
                    tfs = decode_varint(r.tfs_bin).astype(np.int64)
                    keep = mask_deleted(ids, deleted)
                    if not keep.any():
                        continue
                    ids, tfs = ids[keep], tfs[keep]
                    terms.extend([r.term] * ids.size)
                    docs_.append(ids)
                    tfs_.append(tfs)
                if terms:
                    yield pd.DataFrame(
                        {
                            "term": terms,
                            "doc_id": np.concatenate(docs_),
                            "tf": np.concatenate(tfs_).astype("int32"),
                        }
                    )

        seg_post = spark.read.parquet(
            os.path.join(paths.postings, f"seg={sid}")
        )
        tf = seg_post.mapInPandas(
            decode_kernel, "term string, doc_id long, tf int"
        )
        seg_dm = spark.read.parquet(os.path.join(paths.docmap, f"seg={sid}"))
        live_dm = seg_dm.join(del_df.select("doc_id"), "doc_id", "left_anti")
        seg_live = live_dm.agg(
            F.count(F.lit(1)).alias("n"), F.sum("dl").alias("tok")
        ).collect()[0]
        dl = live_dm.select("doc_id", F.col("dl").alias("dl"))
        rebuilt = (
            tf.join(dl, "doc_id")
            .withColumn("seg", F.lit(sid).cast("int"))
            .groupBy("seg")
            .applyInPandas(
                lambda pdf: _build_segment_postings(pdf, avgdl), POSTINGS_SCHEMA
            )
        )
        tio.overwrite(rebuilt.drop("seg"), os.path.join(stage, f"postings_{sid}"))
        tio.overwrite(live_dm, os.path.join(stage, f"docmap_{sid}"))

        # positional twin, if present
        pos_root = os.path.join(paths.root, "positions")
        has_pos = sid in set(man.get("positions_segments", []))
        if has_pos:
            from mtix_spark.index.positions import (
                POSITIONS_SCHEMA,
                _build_segment_positions,
                _reanchor,
            )

            def pos_decode_kernel(batches):
                import pandas as pd

                for pdf in batches:
                    out = {"term": [], "doc_id": [], "positions": []}
                    for r in pdf.itertuples(index=False):
                        ids = delta_decode(r.doc_ids_bin).astype(np.int64)
                        counts = decode_varint(r.pos_counts_bin).astype(np.int64)
                        pdel = decode_varint(r.positions_bin).astype(np.int64)
                        offs = np.zeros(ids.size + 1, dtype=np.int64)
                        np.cumsum(counts, out=offs[1:])
                        pos = _reanchor(pdel, offs)
                        keep = mask_deleted(ids, deleted)
                        for i in np.flatnonzero(keep):
                            out["term"].append(r.term)
                            out["doc_id"].append(int(ids[i]))
                            out["positions"].append(
                                pos[offs[i] : offs[i + 1]].astype("int32")
                            )
                    if out["term"]:
                        yield pd.DataFrame(out)

            seg_pos = spark.read.parquet(os.path.join(pos_root, f"seg={sid}"))
            tfp = seg_pos.mapInPandas(
                pos_decode_kernel, "term string, doc_id long, positions array<int>"
            ).withColumn("seg", F.lit(sid).cast("int"))
            rebuilt_pos = tfp.groupBy("seg").applyInPandas(
                lambda pdf: _build_segment_positions(pdf), POSITIONS_SCHEMA
            )
            tio.overwrite(
                rebuilt_pos.drop("seg"), os.path.join(stage, f"positions_{sid}")
            )

        # staged data complete for this segment — cut over on disk
        swap(os.path.join(stage, f"postings_{sid}"),
             os.path.join(paths.postings, f"seg={sid}"))
        swap(os.path.join(stage, f"docmap_{sid}"),
             os.path.join(paths.docmap, f"seg={sid}"))
        if has_pos:
            swap(os.path.join(stage, f"positions_{sid}"),
                 os.path.join(pos_root, f"seg={sid}"))

        # segment bookkeeping: doc range bounds stay (sound supersets);
        # counts/avgdl reflect the purge
        m = man["segments"][str(sid)]
        m["n_docs"] = int(seg_live["n"])
        m["tokens"] = int(seg_live["tok"] or 0)
        m["avgdl_build"] = avgdl
    shutil.rmtree(stage, ignore_errors=True)
    # tombstones clear only after the loop: del_df's cached file listing
    # still references these dirs during later iterations' anti-joins
    for sid in todo:
        shutil.rmtree(os.path.join(root, f"seg={sid}"), ignore_errors=True)

    # dictionary + stats recomputed from the rewritten postings (purge
    # changes df/cf, so this is a full re-derivation, written as a new
    # version with the pointer flipped in the final manifest commit)
    from mtix_spark.index.build import write_dictionary_version

    write_dictionary_version(
        spark.read.parquet(paths.postings)
        .filter(F.col("seg").isin([int(s) for s in man["segments"]]))
        .groupBy("term")
        .agg(F.sum("df_seg").alias("df"), F.sum("cf_seg").alias("cf")),
        paths,
        man,
    )
    with open(paths.stats) as f:
        stats = json.load(f)
    stats["n_docs"], stats["avgdl"] = n_docs, avgdl
    with open(paths.stats + ".tmp", "w") as f:
        json.dump(stats, f)
    os.replace(paths.stats + ".tmp", paths.stats)
    man["stats"] = stats
    man["n_deleted"] = 0
    man["delete_epoch"] = epoch + 1  # invalidate executor tombstone caches
    _commit_manifest(paths, man)
    return sorted(todo)
