"""Sequence packing (concat-and-chunk) and deterministic training order."""

from __future__ import annotations

from pyspark.sql import functions as F

from mtix_spark.packing import pack_chunks, pack_sequences, training_order


def _docs(spark):
    rows = [(i, " ".join(f"t{j}" for j in range(3 + (i * 7) % 11))) for i in range(40)]
    rows.append((40, ""))  # empty doc must pack nowhere
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_pack_offsets_are_parallelism_invariant(spark):
    docs = _docs(spark)
    a = sorted(map(tuple, pack_sequences(docs, 16, n_parts=1).collect()))
    b = sorted(map(tuple, pack_sequences(docs, 16, n_parts=7).collect()))
    assert a == b and len(a) == 40  # empty doc dropped
    # offsets are the doc_id-ordered prefix sum
    by_id = {r[0]: r for r in a}
    acc = 0
    for i in range(40):
        doc_id, n_tok, start, first, last = by_id[i]
        assert start == acc
        assert first == start // 16 and last == (start + n_tok - 1) // 16
        acc += n_tok


def test_pack_chunks_census(spark):
    docs = _docs(spark)
    total = docs.select(
        F.sum(F.size(F.split(F.col("text"), " ")) * (F.length("text") > 0).cast("int"))
    ).collect()[0][0]
    chunks = sorted(map(tuple, pack_chunks(docs, 16).collect()))
    # every chunk holds exactly seq_len tokens except the final partial one
    *full, last = chunks
    assert all(n_tok == 16 for _, _, n_tok in full)
    assert 0 < last[2] <= 16
    assert sum(n for _, _, n in chunks) == total
    # chunk ids are dense 0..n-1
    assert [c for c, _, _ in chunks] == list(range(len(chunks)))


def test_training_order_deterministic_and_total(spark):
    docs = _docs(spark)
    a = sorted(map(tuple, training_order(docs, 3, salt="e1").collect()))
    b = sorted(map(tuple, training_order(docs, 3, salt="e1").collect()))
    assert a == b and len(a) == 41
    # positions are dense 1..n within each shard
    by_shard = {}
    for doc_id, shard, pos in a:
        by_shard.setdefault(shard, []).append(pos)
    assert set(by_shard) == {0, 1, 2}
    for ps in by_shard.values():
        assert sorted(ps) == list(range(1, len(ps) + 1))
    # a different epoch salt produces a different permutation
    c = sorted(map(tuple, training_order(docs, 3, salt="e2").collect()))
    assert c != a
