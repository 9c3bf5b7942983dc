"""Varbyte/delta codec: golden vectors + property tests (FIXTURES.md §5)."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from librecatastro_ray.functions.codec import (
    decode_doc_block,
    delta_decode,
    delta_encode,
    encode_doc_block,
    varbyte_decode,
    varbyte_encode,
)

VECTORS = [
    [],
    [0],
    [1],
    [127],
    [128],
    [16383],
    [16384],
    [2**28],
    [2**40 + 7],
    [0, 1, 2, 3],
    [5, 1000000, 2**33],
]


def test_varbyte_golden():
    assert varbyte_encode(np.array([0])) == b"\x00"
    assert varbyte_encode(np.array([1])) == b"\x01"
    assert varbyte_encode(np.array([127])) == b"\x7f"
    assert varbyte_encode(np.array([128])) == b"\x80\x01"
    assert varbyte_encode(np.array([300])) == b"\xac\x02"


def test_varbyte_roundtrip_vectors():
    for v in VECTORS:
        arr = np.array(v, dtype=np.uint64)
        assert list(varbyte_decode(varbyte_encode(arr))) == v


@settings(max_examples=200, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**62), max_size=200))
def test_varbyte_roundtrip_property(vals):
    arr = np.array(vals, dtype=np.uint64)
    out = varbyte_decode(varbyte_encode(arr))
    assert list(out) == vals


@settings(max_examples=200, deadline=None)
@given(st.sets(st.integers(min_value=0, max_value=2**48), max_size=200))
def test_doc_block_roundtrip_property(vals):
    sorted_vals = sorted(vals)
    arr = np.array(sorted_vals, dtype=np.int64)
    out = decode_doc_block(encode_doc_block(arr))
    assert list(out) == sorted_vals


def test_delta():
    v = np.array([3, 10, 11, 500], dtype=np.int64)
    g = delta_encode(v)
    assert list(g) == [3, 7, 1, 489]
    assert list(delta_decode(g)) == [3, 10, 11, 500]
