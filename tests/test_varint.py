"""Posting codec round-trip properties (FIXTURES.md §4; pattern from
`[U] lucene/test-framework/.../index/BasePostingsFormatTestCase.java`)."""

import numpy as np
from hypothesis import given, strategies as st

from lucene_solr_spark.functions.varint import (
    decode_varint,
    delta_decode,
    delta_encode,
    encode_varint,
)


def _scalar_varint(v: int) -> bytes:
    out = bytearray()
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


@given(st.lists(st.integers(min_value=0, max_value=2**62), max_size=500))
def test_varint_roundtrip(vals):
    arr = np.array(vals, dtype=np.int64)
    buf = encode_varint(arr)
    assert buf == b"".join(_scalar_varint(v) for v in vals)
    out = decode_varint(buf)
    assert out.tolist() == vals


def test_varint_empty():
    assert encode_varint(np.array([], dtype=np.int64)) == b""
    assert decode_varint(b"").size == 0


@given(
    st.lists(st.integers(min_value=0, max_value=2**31 - 1), min_size=1, max_size=300).map(
        lambda xs: sorted(set(xs))
    )
)
def test_delta_roundtrip_docids(docs):
    arr = np.array(docs, dtype=np.int64)
    deltas = delta_encode(arr)
    assert (deltas[1:] > 0).all()  # strictly increasing docs -> positive deltas
    assert delta_decode(deltas).tolist() == docs
    # full pipeline: delta + varint
    assert delta_decode(decode_varint(encode_varint(deltas))).tolist() == docs
