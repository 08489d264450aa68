"""Golden decode tests — the port of the reference's integration suite
(/root/reference/tests/read.rs) onto the new engine's pure-decode layer.

Every assertion value is taken from tests/read.rs:105-204,269-292,321-420:
element counts, exact nanodegree integers, tag key/values, delta-decoded way
refs, relation member roles, history visibility, LocationsOnWays coords.
The encoding-variant matrix (zlib+dense / raw+dense / raw+plain) asserts the
invariant "logical result independent of physical encoding"
(tests/read.rs:206-222).
"""

import pyarrow as pa
import pytest

from osmpbf_spark.pbf.decode import (
    chunks_to_batch,
    decompress_blob,
    parse_header_block,
    parse_primitive_block,
    split_fileblocks,
)
from osmpbf_spark.sources.fixtures import (
    ALL_VARIANTS,
    fixture_file_bytes,
    fixture_fileblocks,
)

MAIN_VARIANTS = ("zlib_dense", "raw_dense", "raw_plain")


def decode_variant(variant):
    per_blob = []
    for i, (t, b) in enumerate(fixture_fileblocks(variant)):
        if t == "OSMData":
            per_blob.append(
                (f"{variant}#{i}", i, parse_primitive_block(decompress_blob(b))))
    batch = chunks_to_batch(per_blob)
    return pa.Table.from_batches([batch]).to_pylist()


@pytest.mark.parametrize("variant", MAIN_VARIANTS)
def test_golden_elements(variant):
    rows = decode_variant(variant)
    # 5 elements = 3 nodes + 1 way + 1 relation (tests/read.rs:269-292)
    assert len(rows) == 5
    by_type = {}
    for r in rows:
        by_type.setdefault(r["element_type"], []).append(r)
    assert len(by_type["node"]) == 3
    assert len(by_type["way"]) == 1
    assert len(by_type["relation"]) == 1

    nodes = sorted(by_type["node"], key=lambda r: r["id"])
    assert [n["id"] for n in nodes] == [105, 106, 108]
    # exact nanodegree ints (tests/read.rs:112-126)
    assert nodes[1]["lat_nano"] == 52119923500
    assert nodes[1]["lon_nano"] == 11625644600
    assert nodes[2]["lat_nano"] == 52119899100
    assert nodes[2]["lon_nano"] == 11631019200
    # float approx to 1e-6 (tests/read.rs approx_eq)
    assert abs(nodes[1]["lat_nano"] * 1e-9 - 52.11992359584) < 1e-6
    assert abs(nodes[1]["lon_nano"] * 1e-9 - 11.62564468943) < 1e-6
    for n in nodes:
        assert n["uid"] == 17
        assert n["user"] == "testuser"
        assert n["visible"] is True
        assert n["version"] == 1

    way = by_type["way"][0]
    assert way["id"] == 107
    assert dict(way["tags"]) == {"building": "yes", "name": "triangle"}
    assert way["refs"] == [105, 106, 108, 105]   # tests/read.rs:187-189
    assert way["ref_locations"] == []

    rel = by_type["relation"][0]
    assert rel["id"] == 120
    assert dict(rel["tags"]) == {"rel_key": "rel_value"}
    assert rel["members"] == [
        {"role": "test_role", "member_id": 107, "member_type": "way"}]


def test_variants_decode_identically():
    # logical result independent of physical encoding (tests/read.rs:206-222)
    def key(rows):
        return sorted(
            (r["element_type"], r["id"], r["lat_nano"], r["lon_nano"],
             tuple(sorted(r["tags"])), tuple(r["refs"]),
             tuple((m["role"], m["member_id"], m["member_type"])
                   for m in r["members"]),
             r["version"], r["milli_timestamp"], r["uid"], r["user"],
             r["visible"])
            for r in rows)
    base = key(decode_variant("zlib_dense"))
    assert key(decode_variant("raw_dense")) == base
    assert key(decode_variant("raw_plain")) == base


def test_header_features():
    for variant, req, opt in [
        ("zlib_dense", {"OsmSchema-V0.6", "DenseNodes"}, set()),
        ("raw_plain", {"OsmSchema-V0.6"}, set()),
        ("history",
         {"OsmSchema-V0.6", "DenseNodes", "HistoricalInformation"}, set()),
        ("loc_on_ways", {"OsmSchema-V0.6"}, {"LocationsOnWays"}),
    ]:
        t, b = fixture_fileblocks(variant)[0]
        assert t == "OSMHeader"
        hdr = parse_header_block(decompress_blob(b))
        assert set(hdr["required_features"]) == req
        assert set(hdr["optional_features"]) == opt


def test_history_visibility():
    # first dense node visible=false (tests/read.rs:321-340)
    rows = sorted(decode_variant("history"), key=lambda r: r["id"])
    assert len(rows) == 2
    assert rows[0]["visible"] is False
    assert rows[1]["visible"] is True


def test_locations_on_ways():
    # tests/read.rs:342-420
    rows = decode_variant("loc_on_ways")
    ways = [r for r in rows if r["element_type"] == "way"]
    rels = [r for r in rows if r["element_type"] == "relation"]
    assert len(ways) == 1 and len(rels) == 1
    locs = ways[0]["ref_locations"]
    assert len(locs) == 4
    assert locs[0] == {"lat_nano": 52122403100, "lon_nano": 11628401700}
    assert locs[1] == {"lat_nano": 52119923500, "lon_nano": 11625644600}
    assert locs[2] == {"lat_nano": 52119899100, "lon_nano": 11631019200}
    assert locs[3] == locs[0]   # closed ring node[3]==node[0]
    assert rels[0]["members"][0]["role"] == "test_role"


def test_fileblock_framing_roundtrip():
    data = fixture_file_bytes("zlib_dense")
    blocks = list(split_fileblocks(data))
    assert [b["blob_type"] for b in blocks] == ["OSMHeader", "OSMData"]
    assert blocks[0]["offset"] == 0
    assert all(b["datasize"] == len(b["blob_bytes"]) for b in blocks)


def test_wrong_type_decode_errors():
    # decoding blob to wrong type errors, not panics (tests/read.rs:250-267):
    # here, an unknown compression field raises cleanly
    from osmpbf_spark.pbf.wire import len_field, varint_field
    bogus = varint_field(2, 10) + len_field(4, b"\x00" * 10)  # lzma_data
    with pytest.raises(ValueError, match="unsupported blob compression"):
        decompress_blob(bogus)


def test_date_granularity_scaling():
    # milli_ts = timestamp * date_granularity (src/elements.rs:584-590);
    # non-default granularity must scale the stored units
    from osmpbf_spark.pbf.encode import (
        Info,
        Node,
        encode_blob,
        encode_primitive_block,
    )
    node = Node(id=1, lat_raw=0, lon_raw=0,
                info=Info(version=1, timestamp=500))
    block = encode_primitive_block([[node]], dense=True,
                                   date_granularity=2000)
    rows = pa.Table.from_batches([chunks_to_batch(
        [("d", 0, parse_primitive_block(
            decompress_blob(encode_blob(block))))])]).to_pylist()
    assert rows[0]["milli_timestamp"] == 500 * 2000


def test_decimicro_truncation_toward_zero():
    # negative coords: Rust `as i32` after /100 truncates toward zero
    # (src/elements.rs:94-96); engine contract checked at the Spark layer
    # too (test_elements_spark)
    assert int(-52119923550 / 100) == -521199235  # python trunc division check


def test_info_per_field_absence_is_null_not_zero():
    # reference exposes Info fields as per-field Option
    # (src/elements.rs:566-626): an Info carrying only version+user must
    # surface NULL timestamp/changeset/uid, not 0
    from osmpbf_spark.pbf.encode import (
        Info,
        Node,
        Way,
        encode_blob,
        encode_primitive_block,
    )
    node = Node(id=1, lat_raw=0, lon_raw=0,
                info=Info(version=3, user="alice"))
    zero = Node(id=2, lat_raw=0, lon_raw=0,
                info=Info(version=1, timestamp=0, changeset=0, uid=0))
    way = Way(id=3, refs=[1, 2], info=Info(version=2, uid=None,
                                           changeset=77))
    block = encode_primitive_block([[node, zero], [way]], dense=False)
    rows = {r["id"]: r for r in pa.Table.from_batches([chunks_to_batch(
        [("d", 0, parse_primitive_block(
            decompress_blob(encode_blob(block))))])]).to_pylist()}
    assert rows[1]["version"] == 3 and rows[1]["user"] == "alice"
    assert rows[1]["milli_timestamp"] is None
    assert rows[1]["changeset"] is None
    assert rows[1]["uid"] is None
    # explicit zeros stay zeros (distinguishable from absent)
    assert rows[2]["milli_timestamp"] == 0
    assert rows[2]["changeset"] == 0
    assert rows[2]["uid"] == 0
    assert rows[3]["changeset"] == 77 and rows[3]["uid"] is None
