"""Segment compaction: query results must be invariant under compaction
(BM25 disjunctive, conjunctive, phrase), the manifest must stay the source
of truth, and crash leftovers must be vacuumable."""

from __future__ import annotations

import os
import shutil

import pytest
from pyspark.sql import functions as F

from mtix_spark.corpus import synth_corpus, synth_queries
from mtix_spark.index.build import assign_doc_ids, build_index, read_manifest
from mtix_spark.index.compact import (
    compact_segments,
    plan_compaction,
    vacuum_segments,
)
from mtix_spark.index.positions import build_positions, phrase_topk
from mtix_spark.index.search import SegmentSearcher


def test_plan_compaction_policy():
    man = {
        "segments": {
            "0": {"min_doc": 0, "max_doc": 99, "n_docs": 100},
            "1": {"min_doc": 100, "max_doc": 199, "n_docs": 100},
            "2": {"min_doc": 200, "max_doc": 99_999, "n_docs": 99_800},  # big
            "3": {"min_doc": 100_000, "max_doc": 100_049, "n_docs": 50},
            "4": {"min_doc": 100_050, "max_doc": 100_099, "n_docs": 50},
            "5": {"min_doc": 100_100, "max_doc": 100_149, "n_docs": 50},
        }
    }
    groups = plan_compaction(man, small_docs=5_000, max_group=16)
    assert groups == [[0, 1], [3, 4, 5]]  # big segment 2 breaks the run
    # max_group caps a run
    assert plan_compaction(man, small_docs=5_000, max_group=2) == [[0, 1], [3, 4]]
    # nothing to do when everything is big
    assert plan_compaction(man, small_docs=10) == []


@pytest.fixture(scope="module")
def compactable_index(spark, tmp_path_factory):
    docs = assign_doc_ids(synth_corpus(spark, 900), 8)
    out = str(tmp_path_factory.mktemp("cidx") / "index")
    shutil.rmtree(out, ignore_errors=True)
    paths = build_index(spark, docs, out, n_segments=6)  # 6 × 150-doc segments
    build_positions(spark, docs, paths)
    return docs, paths


def _probe(spark, paths, queries, phrases):
    s = SegmentSearcher(spark, paths, persist=False)
    topk = sorted(
        (r["query_id"], r["rank"], r["doc_id"], round(r["score"], 6))
        for r in s.search(queries, k=30).collect()
    )
    conj = sorted(
        (r["query_id"], r["rank"], r["doc_id"], round(r["score"], 6))
        for r in s.search_and(queries[:5], k=30).collect()
    )
    ph = sorted(
        (r["query_id"], r["doc_id"], r["n_occ"])
        for r in phrase_topk(spark, paths, phrases, k=10_000).collect()
    )
    return topk, conj, ph


def test_compaction_preserves_results(spark, compactable_index):
    docs, paths = compactable_index
    queries = [(q, t) for q, t, _ in synth_queries(spark, 15).collect()]
    import re

    c = docs.select("content").first()["content"]
    toks = [t for t in re.split(r"[^a-z0-9_]+", c.lower()) if t]
    phrases = [(1, " ".join(toks[:2])), (2, " ".join(toks[:3]))]

    before = _probe(spark, paths, queries, phrases)
    man0 = read_manifest(paths)
    assert len(man0["segments"]) == 6

    new_ids = compact_segments(spark, paths, small_docs=5_000, max_group=3)
    assert len(new_ids) == 2  # 6 small segments → two groups of 3

    man1 = read_manifest(paths)
    assert set(int(s) for s in man1["segments"]) == set(new_ids)
    assert sorted(man1["positions_segments"]) == sorted(new_ids)
    # doc coverage is preserved exactly
    assert sum(m["n_docs"] for m in man1["segments"].values()) == 900

    after = _probe(spark, paths, queries, phrases)
    assert after == before

    # old seg dirs are gone from disk
    left = {d for d in os.listdir(paths.postings) if d.startswith("seg=")}
    assert left == {f"seg={i}" for i in new_ids}


def test_orphan_segments_ignored_and_vacuumed(spark, compactable_index):
    """A crash between manifest commit and dir cleanup leaves orphan seg
    dirs: queries must ignore them (manifest filter), vacuum removes them."""
    docs, paths = compactable_index
    queries = [(q, t) for q, t, _ in synth_queries(spark, 10).collect()]
    before = sorted(
        (r["query_id"], r["rank"], r["doc_id"])
        for r in SegmentSearcher(spark, paths, persist=False)
        .search(queries, k=20)
        .collect()
    )
    # fabricate an orphan by copying a live segment dir to an unused id
    live = sorted(os.listdir(paths.postings))[0]
    orphan = os.path.join(paths.postings, "seg=777777")
    shutil.copytree(os.path.join(paths.postings, live), orphan)
    after = sorted(
        (r["query_id"], r["rank"], r["doc_id"])
        for r in SegmentSearcher(spark, paths, persist=False)
        .search(queries, k=20)
        .collect()
    )
    assert after == before  # orphan postings not scored
    removed = vacuum_segments(paths)
    assert "seg=777777" in removed
    assert not os.path.exists(orphan)


def test_partial_positions_group_drops_coverage(spark, tmp_path):
    """Compacting a group where only SOME segments have positions must NOT
    produce a merged positions segment (it would silently lack the
    unpositioned fragments' docs). Instead the group leaves
    positions_segments entirely, require_positions raises, and a
    build_positions re-run over the compacted index heals it."""
    docs = assign_doc_ids(synth_corpus(spark, 400), 4)
    out = str(tmp_path / "pidx")
    paths = build_index(spark, docs, out, n_segments=4)
    build_positions(spark, docs, paths)

    import json
    import re

    c = docs.select("content").first()["content"]
    toks = [t for t in re.split(r"[^a-z0-9_]+", c.lower()) if t]
    phrases = [(1, " ".join(toks[:2]))]
    before = sorted(
        (r["query_id"], r["doc_id"], r["n_occ"])
        for r in phrase_topk(spark, paths, phrases, k=10_000).collect()
    )

    # put segment 3 in the exact state a tf-only stream batch leaves:
    # present in `segments`, absent from `positions_segments`
    man = read_manifest(paths)
    man["positions_segments"] = sorted(set(man["positions_segments"]) - {3})
    with open(paths.manifest, "w") as f:
        json.dump(man, f)
    shutil.rmtree(os.path.join(paths.root, "positions", "seg=3"))

    new_ids = compact_segments(spark, paths, small_docs=5_000, max_group=4)
    assert len(new_ids) == 1
    man1 = read_manifest(paths)
    # the mixed group contributes nothing to positional coverage
    assert man1.get("positions_segments", []) == []

    from mtix_spark.index.positions import require_positions

    with pytest.raises(ValueError, match="lacking positions"):
        require_positions(man1)
    with pytest.raises(ValueError, match="lacking positions"):
        phrase_topk(spark, paths, phrases, k=10).collect()

    # build_positions rebuilds the compacted segment from the docs; phrase
    # results come back identical to the pre-compaction index
    build_positions(spark, docs, paths)
    man2 = read_manifest(paths)
    assert sorted(man2["positions_segments"]) == sorted(new_ids)
    after = sorted(
        (r["query_id"], r["doc_id"], r["n_occ"])
        for r in phrase_topk(spark, paths, phrases, k=10_000).collect()
    )
    assert after == before


def test_delete_then_compact_tombstones_migrate(spark, tmp_path):
    """ADVICE r3 (medium): compaction must MIGRATE the compacted-away
    segments' tombstones to the new segment id. Every query path — segment
    kernels, positional kernels, MergedSearcher — resolves deletes by
    MANIFEST segment id, so tombstones left at deletes/seg=<old> would be
    orphaned by the manifest flip and deleted docs would silently resurface
    (while n_deleted still reported them)."""
    from mtix_spark.index.build import merge_postings
    from mtix_spark.index.deletes import delete_docs, purge_deletes
    from mtix_spark.index.search import MergedSearcher

    docs = assign_doc_ids(synth_corpus(spark, 600), 8)
    paths = build_index(spark, docs, str(tmp_path / "dcidx"), n_segments=4)
    build_positions(spark, docs, paths)
    merge_postings(spark, paths, hot_df=50)
    queries = [(q, t) for q, t, _ in synth_queries(spark, 12).collect()]

    base = sorted(
        (r["query_id"], r["rank"], r["doc_id"], round(r["score"], 6))
        for r in SegmentSearcher(spark, paths, persist=False)
        .search(queries, k=30)
        .collect()
    )
    victims = sorted({d for _, r, d, _ in base if r == 1})
    assert delete_docs(spark, paths, victims) == len(victims)
    pre = sorted(
        (r["query_id"], r["rank"], r["doc_id"], round(r["score"], 6))
        for r in SegmentSearcher(spark, paths, persist=False)
        .search(queries, k=30)
        .collect()
    )

    new_ids = compact_segments(spark, paths, small_docs=5_000)
    assert len(new_ids) == 1  # 4 adjacent small segments → one group
    man = read_manifest(paths)
    assert set(int(s) for s in man["segments"]) == set(new_ids)
    assert int(man["n_deleted"]) == len(victims)  # still live deletes

    # tombstone dirs moved wholesale: only the new segment's dir remains
    del_root = os.path.join(paths.root, "deletes")
    assert {d for d in os.listdir(del_root) if d.startswith("seg=")} == {
        f"seg={new_ids[0]}"
    }

    vset = set(victims)
    # segment path: results identical to the post-delete pre-compact probe
    post = sorted(
        (r["query_id"], r["rank"], r["doc_id"], round(r["score"], 6))
        for r in SegmentSearcher(spark, paths, persist=False)
        .search(queries, k=30)
        .collect()
    )
    assert post == pre
    # merged path — the exact resurface scenario from the advice
    mres = MergedSearcher(spark, paths).search(queries, k=30)
    assert not mres["doc_id"].isin(victims).any()
    # positional path
    import re

    c = docs.filter(~F.col("doc_id").isin(victims)).select("content").first()[
        "content"
    ]
    toks = [t for t in re.split(r"[^a-z0-9_]+", c.lower()) if t]
    ph = phrase_topk(spark, paths, [(1, " ".join(toks[:2]))], k=10_000).collect()
    assert not any(r["doc_id"] in vset for r in ph)

    # purge still finds the migrated tombstones (deletes/seg=<new> is in
    # the manifest) and clears them
    assert purge_deletes(spark, paths) == new_ids
    assert int(read_manifest(paths)["n_deleted"]) == 0


def test_vacuum_keeps_previous_dictionary_for_open_readers(spark, tmp_path):
    """ADVICE r3: a SegmentSearcher resolves its dictionary version at
    construction; a STREAM-BATCH pointer flip (which only adds segments —
    old postings files stay put) followed by vacuum must not FileNotFound
    the open handle's next dictionary action. Vacuum therefore retains
    pointer-1 alongside the pointer. (A purge rewrites old segment files
    physically, so handles cannot survive it in the parquet rendition —
    that is the documented reopen case, not this one.)"""
    from mtix_spark.index.build import (
        _commit_manifest,
        dictionary_dir,
        write_dictionary_version,
    )

    docs = assign_doc_ids(synth_corpus(spark, 300), 4)
    paths = build_index(spark, docs, str(tmp_path / "vdidx"), n_segments=2)
    man0 = read_manifest(paths)
    v0 = int(man0["dictionary_version"])

    handle = SegmentSearcher(spark, paths, persist=False)  # resolves v0
    queries = [(q, t) for q, t, _ in synth_queries(spark, 5).collect()]

    # flip the pointer the way a streaming batch does: new version dir
    # written first, manifest committed after (no old files rewritten)
    from mtix_spark.index.build import read_dictionary

    write_dictionary_version(read_dictionary(spark, paths), paths, man0)
    _commit_manifest(paths, man0)
    v1 = int(read_manifest(paths)["dictionary_version"])
    assert v1 == v0 + 1

    vacuum_segments(paths)
    assert os.path.isdir(dictionary_dir(paths, v1))
    assert os.path.isdir(dictionary_dir(paths, v0))  # pointer-1 retained

    # the stale handle's dictionary actions still work (snapshot semantics)
    assert handle.dictionary.count() > 0
    assert handle.search(queries, k=5).count() >= 0
