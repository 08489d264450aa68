"""Wire-format unit tests: varint/zigzag/packed round trips, vectorized
decoder vs scalar reference, edge cases (10-byte negatives, empty buffers)."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from osmpbf_spark.pbf import wire


def test_varint_roundtrip_scalar():
    for v in [0, 1, 127, 128, 300, 2**32, 2**63 - 1, 2**64 - 1]:
        buf = wire.encode_varint(v)
        got, pos = wire.read_varint(buf, 0)
        assert got == v % (2**64)
        assert pos == len(buf)


def test_negative_int64_is_ten_bytes():
    buf = wire.encode_varint(-1)
    assert len(buf) == 10
    got, _ = wire.read_varint(buf, 0)
    assert np.uint64(got) == np.uint64(2**64 - 1)


def test_zigzag():
    for v in [0, -1, 1, -2, 2, 2**62, -(2**62), -(2**63)]:
        assert wire.zigzag_decode(wire.zigzag_encode(v) & (2**64 - 1)) == v


@settings(max_examples=200, deadline=None)
@given(st.lists(st.integers(min_value=-(2**63), max_value=2**63 - 1),
                max_size=200))
def test_packed_sint64_vectorized_roundtrip(values):
    body = b"".join(wire.encode_varint(wire.zigzag_encode(v)) for v in values)
    got = wire.unzigzag(wire.decode_packed_u64(body))
    assert got.tolist() == values


@settings(max_examples=100, deadline=None)
@given(st.lists(st.integers(min_value=-(2**40), max_value=2**40), min_size=1,
                max_size=100))
def test_packed_delta_roundtrip(values):
    field = wire.packed_field(8, values, zigzag=True, delta=True)
    # strip tag + length
    _, pos = wire.read_varint(field, 0)
    length, pos = wire.read_varint(field, pos)
    body = field[pos:pos + length]
    got = wire.decode_packed_sint64_delta(body)
    assert got.tolist() == values


def test_empty_packed():
    assert wire.decode_packed_u64(b"").size == 0
    assert wire.packed_field(8, []) == b""


def test_truncated_varint_raises():
    with pytest.raises(ValueError):
        wire.decode_packed_u64(b"\x80\x80")


def test_segments_truncated_varint_raises():
    # a buffer ending mid-varint (continuation bit set) must fail fast,
    # not silently merge into the next buffer's first varint
    import pytest

    from osmpbf_spark.pbf.wire import (
        decode_packed_u64_segments,
        encode_varint,
    )
    good = b"".join(encode_varint(v) for v in (1, 2, 3))
    vals, lens = decode_packed_u64_segments([good, b"", good])
    assert list(lens) == [3, 0, 3]
    with pytest.raises(ValueError, match="truncated varint"):
        decode_packed_u64_segments([good[:-1] + b"\x80", good])
    with pytest.raises(ValueError, match="truncated varint"):
        decode_packed_u64_segments([b"\x80"])
