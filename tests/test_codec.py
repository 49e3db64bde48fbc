"""Property-based round-trip tests for the delta-gap + varint codec
(FIXTURES.md §4 codec_roundtrip)."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from dhr_spark.index.codec import (
    delta_decode,
    delta_encode,
    varint_decode,
    varint_encode,
)


@given(st.lists(st.integers(min_value=0, max_value=2**63 - 1), max_size=500))
@settings(max_examples=200, deadline=None)
def test_varint_roundtrip(vals):
    arr = np.array(vals, dtype=np.uint64)
    assert np.array_equal(varint_decode(varint_encode(arr), len(vals)), arr)


@given(
    st.lists(
        st.integers(min_value=0, max_value=2**40), min_size=1, max_size=500, unique=True
    )
)
@settings(max_examples=200, deadline=None)
def test_delta_roundtrip(docids):
    arr = np.array(sorted(docids), dtype=np.int64)
    assert np.array_equal(delta_decode(delta_encode(arr), len(arr)), arr)


def test_known_varints():
    # classic LEB128 vectors
    assert varint_encode(np.array([0], dtype=np.uint64)) == b"\x00"
    assert varint_encode(np.array([127], dtype=np.uint64)) == b"\x7f"
    assert varint_encode(np.array([128], dtype=np.uint64)) == b"\x80\x01"
    assert varint_encode(np.array([300], dtype=np.uint64)) == b"\xac\x02"
    assert varint_encode(np.array([1, 127, 128], dtype=np.uint64)) == b"\x01\x7f\x80\x01"


def test_empty():
    assert varint_encode(np.array([], dtype=np.uint64)) == b""
    assert varint_decode(b"").size == 0
    assert delta_encode(np.array([], dtype=np.int64)) == b""


def test_compression_wins_on_dense_ids():
    ids = np.arange(10_000, dtype=np.int64) * 3 + 7
    enc = delta_encode(ids)
    assert len(enc) < ids.nbytes / 6  # gaps of 3 fit in 1 byte each
