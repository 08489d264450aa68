"""Golden micro-fixtures mirroring the reference test suite (FIXTURES.md §2).

Reproduces the logical content of /root/reference/tests/test.osm:1-18 in the
same physical-encoding matrix the reference tests iterate over
(/root/reference/tests/read.rs:15-47): zlib+dense / raw+dense / raw+plain,
plus the history (deleted-nodes) and LocationsOnWays variants. Golden values
asserted by tests come from /root/reference/tests/read.rs:105-204,321-420.
"""

from __future__ import annotations

import calendar

from ..pbf.encode import (
    Info,
    Node,
    Relation,
    Way,
    encode_blob,
    encode_header_block,
    encode_primitive_block,
    frame_fileblock,
)

_T0 = calendar.timegm((2003, 4, 5, 6, 7, 8, 0, 0, 0))  # 2003-04-05T06:07:08Z

# Exact nanodegree goldens (tests/read.rs:112-126): raw units at the default
# granularity of 100 nanodegrees.
NODE_RAW_COORDS = {
    105: (521224031, 116284017),
    106: (521199235, 116256446),
    108: (521198991, 116310192),
}
GOLDEN_NANO = {nid: (la * 100, lo * 100) for nid, (la, lo) in
               NODE_RAW_COORDS.items()}


def _info(seq: int, visible: bool | None = None) -> Info:
    return Info(version=1, timestamp=_T0 + seq, changeset=1, uid=17,
                user="testuser", visible=visible)


def golden_nodes() -> list[Node]:
    return [Node(id=nid, lat_raw=la, lon_raw=lo, info=_info(i))
            for i, (nid, (la, lo)) in enumerate(sorted(NODE_RAW_COORDS.items()))]


def golden_way() -> Way:
    return Way(id=107, refs=[105, 106, 108, 105],
               tags=[("building", "yes"), ("name", "triangle")],
               info=_info(3))


def golden_relation() -> Relation:
    return Relation(id=120, members=[("test_role", 107, 1)],
                    tags=[("rel_key", "rel_value")], info=_info(4))


def _header(required, optional=()):
    return encode_header_block(
        bbox_nano=(11625644600, 11631019200, 52122403100, 52119899100),
        required_features=list(required), optional_features=list(optional),
        writingprogram="osmpbf_spark-fixture")


def fixture_fileblocks(variant: str) -> list[tuple[str, bytes]]:
    """Return [(blob_type, blob_bytes)] for a named variant.

    Variants mirror /root/reference/tests/read.rs:15-47:
      zlib_dense | raw_dense | raw_plain | history | loc_on_ways
    """
    if variant in ("zlib_dense", "raw_dense", "raw_plain"):
        dense = variant != "raw_plain"
        compress = variant == "zlib_dense"
        req = ["OsmSchema-V0.6"] + (["DenseNodes"] if dense else [])
        header = _header(req)
        block = encode_primitive_block(
            [golden_nodes(), [golden_way()], [golden_relation()]], dense=dense)
        return [("OSMHeader", encode_blob(header, compress=compress)),
                ("OSMData", encode_blob(block, compress=compress))]
    if variant == "history":
        # 2 dense nodes, first visible=false (tests/read.rs:321-340)
        nodes = [
            Node(id=1, lat_raw=10_000_000, lon_raw=20_000_000,
                 info=_info(0, visible=False)),
            Node(id=2, lat_raw=10_000_100, lon_raw=20_000_100,
                 info=_info(1, visible=True)),
        ]
        header = _header(
            ["OsmSchema-V0.6", "DenseNodes", "HistoricalInformation"])
        block = encode_primitive_block([nodes], dense=True)
        return [("OSMHeader", encode_blob(header)),
                ("OSMData", encode_blob(block))]
    if variant == "loc_on_ways":
        # way carries its node locations; relation in a separate third blob
        # (tests/read.rs:342-420)
        way = golden_way()
        raw = [NODE_RAW_COORDS[r] for r in way.refs]
        way.locations = raw
        header = _header(["OsmSchema-V0.6"], optional=["LocationsOnWays"])
        return [
            ("OSMHeader", encode_blob(header)),
            ("OSMData", encode_blob(encode_primitive_block([[way]]))),
            ("OSMData", encode_blob(
                encode_primitive_block([[golden_relation()]]))),
        ]
    raise ValueError(variant)


ALL_VARIANTS = ("zlib_dense", "raw_dense", "raw_plain", "history",
                "loc_on_ways")


def fixture_file_bytes(variant: str) -> bytes:
    """Full framed *.osm.pbf byte stream for a variant."""
    return b"".join(frame_fileblock(t, b)
                    for t, b in fixture_fileblocks(variant))
