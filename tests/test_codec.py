from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from go_search_engine_spark.functions.codec import (
    decode_positions,
    delta_decode,
    delta_encode,
    encode_positions,
    varint_decode,
    varint_encode,
)


def test_varint_roundtrip_basic():
    vals = np.array([0, 1, 127, 128, 300, 2**32, 2**63], dtype=np.uint64)
    assert varint_decode(varint_encode(vals)).tolist() == vals.tolist()


def test_varint_empty():
    assert varint_encode(np.array([], dtype=np.uint64)) == b""
    assert varint_decode(b"").size == 0


@settings(max_examples=200, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**63), max_size=200))
def test_varint_roundtrip(vals):
    arr = np.array(vals, dtype=np.uint64)
    assert varint_decode(varint_encode(arr)).tolist() == vals


@settings(max_examples=200, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**40), min_size=1, max_size=200))
def test_delta_roundtrip(vals):
    arr = np.sort(np.array(vals, dtype=np.uint64))
    assert delta_decode(delta_encode(arr)).tolist() == arr.tolist()


@settings(max_examples=100, deadline=None)
@given(
    st.lists(
        st.lists(st.integers(min_value=0, max_value=10000), max_size=30).map(sorted),
        max_size=20,
    )
)
def test_positions_roundtrip(plists):
    buf = encode_positions(plists)
    got = decode_positions(buf, len(plists))
    assert [g.tolist() for g in got] == plists


def test_compression_ratio():
    # dense sorted ids compress far below 8 bytes/id
    ids = np.arange(0, 100_000, 3, dtype=np.uint64)
    buf = delta_encode(ids)
    assert len(buf) < ids.size * 2


@settings(max_examples=100, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**63), min_size=1,
                max_size=50))
def test_truncated_varint_fails_loud(vals):
    """A torn buffer (any strict prefix cut mid-value, i.e. ending on a
    continuation byte) must raise, never silently drop the last value
    or misalign downstream decode_positions."""
    import pytest as _pytest

    buf = varint_encode(np.array(vals, dtype=np.uint64))
    # cut right after every continuation byte: buf[:i] then ends mid-value
    cut_points = [i + 1 for i in range(len(buf) - 1) if buf[i] & 0x80]
    for i in cut_points[:20]:
        with _pytest.raises(ValueError, match="truncated varint"):
            varint_decode(buf[:i])
    # every terminator-aligned prefix still decodes to a value prefix
    ends = [i + 1 for i in range(len(buf)) if not buf[i] & 0x80]
    for i in ends[-3:]:
        got = varint_decode(buf[:i]).tolist()
        assert got == vals[: len(got)]
