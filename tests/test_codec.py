"""Unit tests: delta+varint codec (SURVEY.md §5 'codec round-trip')."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from mtix_spark.index.codec import (
    decode_varint,
    delta_decode,
    delta_encode,
    encode_varint,
)


def test_empty():
    assert encode_varint(np.array([], dtype=np.uint64)) == b""
    assert decode_varint(b"").size == 0
    assert delta_encode(np.array([], dtype=np.uint64)) == b""


def test_known_boundaries():
    v = np.array([0, 1, 127, 128, 16383, 16384, 2**32, 2**63 - 1], dtype=np.uint64)
    enc = encode_varint(v)
    # 127 fits in 1 byte, 128 needs 2
    assert enc[:2] == b"\x00\x01"
    np.testing.assert_array_equal(decode_varint(enc), v)


def test_single_byte_values_compact():
    v = np.arange(128, dtype=np.uint64)
    assert len(encode_varint(v)) == 128


@settings(max_examples=50, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**63 - 1), max_size=500))
def test_varint_roundtrip(xs):
    v = np.array(xs, dtype=np.uint64)
    np.testing.assert_array_equal(decode_varint(encode_varint(v)), v)


@settings(max_examples=50, deadline=None)
@given(st.sets(st.integers(min_value=0, max_value=2**50), min_size=1, max_size=500))
def test_delta_roundtrip(xs):
    ids = np.array(sorted(xs), dtype=np.uint64)
    np.testing.assert_array_equal(delta_decode(delta_encode(ids)), ids)


def test_delta_compresses_dense_ids():
    ids = np.arange(10_000, 20_000, dtype=np.uint64)
    assert len(delta_encode(ids)) < 10_002  # ~1 byte/id after the first
