"""Codec round-trip properties — the analogue of the reference's round-trip
persistence test (reference test.py:83-101, TestDFM save/load)."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from dart_importer_spark.functions.codec import (
    delta_decode,
    delta_encode,
    varbyte_decode,
    varbyte_encode,
)


def test_varbyte_empty():
    assert varbyte_encode(np.array([], dtype=np.uint64)) == b""
    assert varbyte_decode(b"").size == 0


def test_varbyte_known_values():
    vals = np.array([0, 1, 127, 128, 129, 16383, 16384, 2**32, 2**63 - 1], dtype=np.uint64)
    enc = varbyte_encode(vals)
    assert np.array_equal(varbyte_decode(enc), vals)
    # 0..127 take 1 byte; 128..16383 take 2
    assert len(varbyte_encode(np.array([5], dtype=np.uint64))) == 1
    assert len(varbyte_encode(np.array([200], dtype=np.uint64))) == 2


@settings(max_examples=50, deadline=None)
@given(
    st.lists(st.integers(min_value=0, max_value=2**62), min_size=0, max_size=500)
)
def test_varbyte_roundtrip(xs):
    arr = np.array(xs, dtype=np.uint64)
    assert np.array_equal(varbyte_decode(varbyte_encode(arr)), arr)


@settings(max_examples=50, deadline=None)
@given(
    st.lists(st.integers(min_value=0, max_value=2**40), min_size=1, max_size=500)
)
def test_delta_roundtrip_sorted(xs):
    arr = np.unique(np.array(xs, dtype=np.uint64))
    assert np.array_equal(delta_decode(delta_encode(arr)), arr)


def test_delta_compression_ratio():
    # dense ascending ids should compress to ~1 byte per id
    arr = np.arange(10_000, dtype=np.uint64) + 5_000_000
    enc = delta_encode(arr)
    assert len(enc) < 10_000 + 10  # 1 byte/gap + first value
