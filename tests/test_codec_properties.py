"""Property-based codec tests (hypothesis): the varint/delta layer must be
lossless for any uint64 payload — the index's correctness floor."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from mtix_spark.index.codec import (
    decode_varint,
    delta_decode,
    delta_encode,
    encode_varint,
    encode_varint_with_sizes,
)


@given(st.lists(st.integers(min_value=0, max_value=2**64 - 1), max_size=500))
@settings(max_examples=200, deadline=None)
def test_varint_roundtrip(values):
    arr = np.array(values, dtype=np.uint64)
    assert list(decode_varint(encode_varint(arr))) == values


@given(st.lists(st.integers(min_value=0, max_value=2**63 - 1), min_size=1, max_size=300))
@settings(max_examples=200, deadline=None)
def test_delta_roundtrip_sorted_unique(values):
    ids = np.array(sorted(set(values)), dtype=np.uint64)
    out = delta_decode(delta_encode(ids))
    assert list(out) == list(ids)


@given(st.lists(st.integers(min_value=0, max_value=2**64 - 1), max_size=300))
@settings(max_examples=100, deadline=None)
def test_sizes_partition_the_stream(values):
    arr = np.array(values, dtype=np.uint64)
    buf, nb = encode_varint_with_sizes(arr)
    assert int(nb.sum()) == len(buf)
    # slicing by offsets decodes element-wise
    off = np.zeros(len(values) + 1, dtype=np.int64)
    np.cumsum(nb, out=off[1:])
    for i, v in enumerate(values):
        piece = buf[off[i] : off[i + 1]]
        assert list(decode_varint(piece)) == [v]


@given(
    st.dictionaries(
        st.tuples(
            st.sampled_from(["a", "b", "c", "d"]),          # term
            st.integers(min_value=0, max_value=500),        # doc_id
        ),
        st.lists(st.integers(min_value=0, max_value=5000), min_size=1, max_size=20),
        min_size=1,
        max_size=60,
    )
)
@settings(max_examples=100, deadline=None)
def test_positional_segment_roundtrip(cells):
    """_build_segment_positions encodes arbitrary (term, doc, positions)
    cells so that ids/counts/positions decode back exactly (positions
    sorted-unique per cell, the tokenizer invariant)."""
    import pandas as pd

    from mtix_spark.index.codec import decode_varint, delta_decode
    from mtix_spark.index.positions import _build_segment_positions, _reanchor

    rows = {
        "term": [], "doc_id": [], "positions": [], "seg": [],
    }
    want = {}
    for (term, doc), pos in cells.items():
        p = sorted(set(pos))
        rows["term"].append(term)
        rows["doc_id"].append(doc)
        rows["positions"].append(np.array(p, dtype=np.int32))
        rows["seg"].append(0)
        want[(term, doc)] = p
    out = _build_segment_positions(pd.DataFrame(rows))
    got = {}
    for r in out.itertuples(index=False):
        ids = delta_decode(r.doc_ids_bin).astype(np.int64)
        counts = decode_varint(r.pos_counts_bin).astype(np.int64)
        pdel = decode_varint(r.positions_bin).astype(np.int64)
        offs = np.zeros(ids.size + 1, dtype=np.int64)
        np.cumsum(counts, out=offs[1:])
        pos = _reanchor(pdel, offs)
        assert list(ids) == sorted(ids)  # ascending doc ids per term
        for i, d in enumerate(ids):
            got[(r.term, int(d))] = list(pos[offs[i] : offs[i + 1]])
    assert got == want


@given(
    st.lists(
        st.tuples(
            st.sampled_from(["t1", "t2", "t3"]),
            st.integers(min_value=0, max_value=3),  # fragment index → doc range
        ),
        min_size=1,
        max_size=12,
        unique=True,
    ),
    st.integers(min_value=1, max_value=5),  # batch split size
)
@settings(max_examples=60, deadline=None)
def test_merge_stream_kernel_batch_boundaries(frags, batch_size):
    """_merge_stream must produce identical results however the Arrow
    batches split the sorted fragment stream (a term's fragments routinely
    straddle batch boundaries)."""
    import pandas as pd

    from mtix_spark.index.build import BLOCK_SIZE, _merge_stream
    from mtix_spark.index.codec import (
        decode_varint,
        delta_decode,
        delta_encode,
        encode_varint,
    )

    rows = []
    for term, fi in sorted(frags, key=lambda x: (x[0], x[1])):
        base = fi * 100
        ids = np.array([base, base + 3, base + 7], dtype=np.uint64)
        tfs = np.array([1, 2, 3], dtype=np.uint64)
        rows.append(
            {
                "term": term,
                "cf_seg": 6,
                "doc_ids_bin": delta_encode(ids),
                "tfs_bin": encode_varint(tfs),
                "max_tf": 3,
                "block_max_wtf": np.array([1.0], dtype=np.float32),
                "min_doc": int(ids[0]),
                "max_doc": int(ids[-1]),
            }
        )
    pdf = pd.DataFrame(rows)

    def run(batches):
        out = list(_merge_stream(with_salt=False)(iter(batches)))
        got = {}
        for o in out:
            for r in o.itertuples(index=False):
                got[r.term] = (
                    list(delta_decode(r.doc_ids_bin)),
                    list(decode_varint(r.tfs_bin)),
                    int(r.df),
                    int(r.cf),
                )
        return got

    whole = run([pdf])
    split = run([pdf.iloc[i : i + batch_size] for i in range(0, len(pdf), batch_size)])
    assert whole == split
    # and the merged stream is the ordered concat of the term's fragments
    for term in {t for t, _ in frags}:
        ids = [i for t, fi in sorted(frags) if t == term for i in
               (fi * 100, fi * 100 + 3, fi * 100 + 7)]
        assert whole[term][0] == ids
        assert whole[term][2] == len(ids)
