"""Regression tests for bugs found in the round-1 adversarial code review:
negative lon_offset sign handling, odd-length keys_vals groups, near-pole
kNN candidate duplication, dense-vs-plain version default consistency, and
invalid-UTF-8 tag-pair skipping."""

import numpy as np
import pyarrow as pa

from osmpbf_spark.pbf.decode import (
    chunks_to_batch,
    decompress_blob,
    parse_block_node_points,
    parse_primitive_block,
)
from osmpbf_spark.pbf.encode import (
    Info,
    Node,
    encode_blob,
    encode_primitive_block,
    len_field,
    varint_field,
)
from osmpbf_spark.pbf.wire import packed_field


def _rows(block):
    chunks = parse_primitive_block(block)
    return pa.Table.from_batches(
        [chunks_to_batch([("d", 0, chunks)])]).to_pylist()


def test_negative_lon_offset():
    block = encode_primitive_block(
        [[Node(id=1, lat_raw=10, lon_raw=20)]], dense=True,
        lat_offset=-1_000_000_000, lon_offset=-2_000_000_000,
        with_info=False)
    r = _rows(block)[0]
    assert r["lat_nano"] == -1_000_000_000 + 100 * 10
    assert r["lon_nano"] == -2_000_000_000 + 100 * 20
    # minimal node-points path agrees
    ids, lats, lons = parse_block_node_points(block)
    assert lons[0] == -2_000_000_000 + 100 * 20


def _dense_block_with_kv(n_ids, kv, table_entries):
    st = b"".join(len_field(1, e) for e in table_entries)
    dense = (packed_field(1, list(range(1, n_ids + 1)), zigzag=True,
                          delta=True)
             + packed_field(8, [0] * n_ids, zigzag=True, delta=True)
             + packed_field(9, [0] * n_ids, zigzag=True, delta=True)
             + packed_field(10, kv))
    return len_field(1, st) + len_field(2, len_field(2, dense))


def test_odd_keys_vals_group_does_not_shift_pairs():
    # node 1 has a DANGLING key (odd-length group); node 2 has a full pair
    # — node 2 must still get (k1, v1), not mispaired values
    table = [b"", b"k1", b"v1", b"k2"]
    block = _dense_block_with_kv(2, [3, 0, 1, 2, 0], table)
    rows = sorted(_rows(block), key=lambda r: r["id"])
    assert rows[0]["tags"] == []           # dangling key dropped
    assert rows[1]["tags"] == [("k1", "v1")]


def test_surplus_keys_vals_groups_do_not_crash():
    # more delimiter groups than nodes: extras ignored, no crash
    table = [b"", b"k", b"v"]
    block = _dense_block_with_kv(1, [1, 2, 0, 1, 2, 0], table)
    rows = _rows(block)
    assert len(rows) == 1
    assert rows[0]["tags"] == [("k", "v")]


def test_invalid_utf8_tag_pair_skipped():
    # key references a non-UTF-8 string-table entry → pair silently
    # skipped (src/elements.rs:513-538), other pairs survive
    table = [b"", b"\xff\xfe", b"v1", b"k2", b"v2"]
    block = _dense_block_with_kv(1, [1, 2, 3, 4, 0], table)
    rows = _rows(block)
    assert rows[0]["tags"] == [("k2", "v2")]


def test_version_default_consistent_dense_vs_plain():
    # Info present but version absent: both encodings must yield -1
    node = Node(id=1, lat_raw=0, lon_raw=0,
                info=Info(version=None, timestamp=100))
    for dense in (True, False):
        block = encode_primitive_block([[node]], dense=dense)
        r = _rows(block)[0]
        assert r["version"] == -1, f"dense={dense}"


def test_knn_near_pole_no_duplicate_candidates(spark):
    # queries at the top row of the grid: dy offsets past the pole are
    # dropped, so no point occupies two of the k ranks
    from osmpbf_spark.functions.grid import with_grid_cells
    from osmpbf_spark.operators.knn import grid_knn
    res = 4
    lat_top = 89_000_000_000    # top y row at res 4
    pts = [(i, lat_top - i * 1000, i * 50_000_000) for i in range(30)]
    qs = [(100, lat_top, 0)]
    p = with_grid_cells(spark.createDataFrame(
        pts, "id long, lat_nano long, lon_nano long"), res=res)
    q = with_grid_cells(spark.createDataFrame(
        qs, "query_id long, lat_nano long, lon_nano long"), res=res)
    out = grid_knn(p, q, 5, res=res).collect()
    ids = [r["id"] for r in out]
    assert len(ids) == len(set(ids)) == 5       # no duplicates
    # matches brute force
    want = [i for _, i in sorted(
        ((la - lat_top) ** 2 + (lo - 0) ** 2, i) for i, la, lo in pts)][:5]
    got = [r["id"] for r in sorted(out, key=lambda r: r["rn"])]
    assert got == want
