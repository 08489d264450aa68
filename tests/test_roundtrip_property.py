"""Property-based encode→decode round trip: random element sets (ids,
coords incl. negatives, tags, refs, members, info) through the full
fileblock pipeline must come back exactly. Pure-Python layer (no Spark) —
fast enough for many hypothesis examples."""

import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from osmpbf_spark.pbf.decode import (
    chunks_to_batch,
    decompress_blob,
    parse_primitive_block,
)
from osmpbf_spark.pbf.encode import (
    Info,
    Node,
    Relation,
    Way,
    encode_blob,
    encode_primitive_block,
)

_tag = st.tuples(
    st.text(min_size=1, max_size=8),
    st.text(min_size=0, max_size=8))

_coord = st.integers(min_value=-1_800_000_000, max_value=1_800_000_000)
_id = st.integers(min_value=-(2**40), max_value=2**40)

_node = st.builds(
    Node, id=_id, lat_raw=_coord, lon_raw=_coord,
    tags=st.lists(_tag, max_size=3))

_way = st.builds(
    Way, id=_id,
    refs=st.lists(_id, min_size=1, max_size=6),
    tags=st.lists(_tag, max_size=3))

_rel = st.builds(
    Relation, id=_id,
    members=st.lists(st.tuples(st.text(min_size=0, max_size=6), _id,
                               st.integers(0, 2)), min_size=0, max_size=4),
    tags=st.lists(_tag, max_size=2))


def _decode(block_payload, compress):
    blob = encode_blob(block_payload, compress=compress)
    chunks = parse_primitive_block(decompress_blob(blob))
    return pa.Table.from_batches(
        [chunks_to_batch([("d", 0, chunks)])]).to_pylist()


@settings(max_examples=60, deadline=None)
@given(nodes=st.lists(_node, max_size=8), ways=st.lists(_way, max_size=5),
       rels=st.lists(_rel, max_size=4), dense=st.booleans(),
       compress=st.booleans(),
       granularity=st.sampled_from([100, 1000]),
       lat_offset=st.sampled_from([0, 50]))
def test_roundtrip(nodes, ways, rels, dense, compress, granularity,
                   lat_offset):
    payload = encode_primitive_block(
        [nodes, ways, rels], dense=dense, granularity=granularity,
        lat_offset=lat_offset, with_info=False)
    rows = _decode(payload, compress)
    got_nodes = [r for r in rows if r["element_type"] == "node"]
    got_ways = [r for r in rows if r["element_type"] == "way"]
    got_rels = [r for r in rows if r["element_type"] == "relation"]
    assert len(got_nodes) == len(nodes)
    assert len(got_ways) == len(ways)
    assert len(got_rels) == len(rels)
    for want, got in zip(nodes, got_nodes):
        assert got["id"] == want.id
        assert got["lat_nano"] == lat_offset + granularity * want.lat_raw
        assert got["lon_nano"] == granularity * want.lon_raw
        assert got["tags"] == want.tags
    for want, got in zip(ways, got_ways):
        assert got["id"] == want.id
        assert got["refs"] == want.refs
        assert got["tags"] == want.tags
    for want, got in zip(rels, got_rels):
        assert got["id"] == want.id
        assert [(m["role"], m["member_id"],
                 {"node": 0, "way": 1, "relation": 2}[m["member_type"]])
                for m in got["members"]] == want.members
        assert got["tags"] == want.tags
