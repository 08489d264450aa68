"""Fuzz hardening: hostile bytes through the decode stack must fail with
clean ValueError/zlib.error — never IndexError/segfault/OOM. This is the
100 TB posture: a corrupt blob quarantines (read_elements_quarantine
catches Exception), and the failure classes are deterministic."""

import zlib

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from osmpbf_spark.pbf.decode import (
    decompress_blob,
    parse_header_block,
    parse_primitive_block,
    split_fileblocks,
)
from osmpbf_spark.pbf.encode import encode_blob, len_field, varint_field
from osmpbf_spark.pbf.wire import packed_field

OK_ERRORS = (ValueError, zlib.error)


@settings(max_examples=300, deadline=None)
@given(st.binary(max_size=200))
def test_garbage_blob_fails_cleanly(data):
    try:
        payload = decompress_blob(data)
        parse_primitive_block(payload)
        parse_header_block(payload)
    except OK_ERRORS:
        pass


@settings(max_examples=300, deadline=None)
@given(st.binary(max_size=200))
def test_garbage_block_fails_cleanly(data):
    # a VALID blob envelope around garbage block bytes
    try:
        parse_primitive_block(decompress_blob(encode_blob(data)))
    except OK_ERRORS:
        pass


@settings(max_examples=200, deadline=None)
@given(st.binary(max_size=300))
def test_garbage_filestream_fails_cleanly(data):
    try:
        list(split_fileblocks(data))
    except OK_ERRORS:
        pass


def test_out_of_bounds_stringtable_id():
    # dense node referencing string id 999 with a 1-entry table
    dense = (packed_field(1, [1], zigzag=True)
             + packed_field(8, [0], zigzag=True)
             + packed_field(9, [0], zigzag=True)
             + packed_field(10, [999, 999, 0]))
    block = (len_field(1, len_field(1, b""))            # stringtable [""]
             + len_field(2, len_field(2, dense)))       # group with dense
    with pytest.raises(ValueError, match="string table"):
        parse_primitive_block(block)


def test_zlib_bomb_is_capped():
    # 64 MiB of zeros compresses tiny; the 32 MiB guard must trip
    bomb = zlib.compress(b"\x00" * (64 * 1024 * 1024))
    blob = varint_field(2, 64 * 1024 * 1024) + len_field(3, bomb)
    with pytest.raises(ValueError, match="32 MiB"):
        decompress_blob(blob)
