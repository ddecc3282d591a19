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
