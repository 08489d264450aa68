"""OSM PBF fileblock encoder (deterministic generator backbone).

Writes the public OSM PBF format from scratch: HeaderBlock / PrimitiveBlock
protobuf messages, Blob + BlobHeader framing with the 4-byte big-endian
length prefix (/root/reference/src/proto/fileformat.proto:58-67, framing
read loop mirrored by /root/reference/src/blob.rs:262-295).

This module exists so tests and benchmarks can synthesize byte-exact inputs
(FIXTURES.md §2-§3) without any external data: the same seed yields the same
bytes at any parallelism, which is required for the two-cluster-size scaling
evidence (BASELINE.json north_rule).

It is an *encoder written from the .proto spec*, not a translation of the
reference (the reference has no writer at all — SURVEY.md §2.1 "Sinks: None").
"""

from __future__ import annotations

import struct
import zlib
from dataclasses import dataclass, field

from .wire import len_field, packed_field, varint_field


# ---------------------------------------------------------------------------
# Element value objects (plain data holders for the encoder)
# ---------------------------------------------------------------------------

@dataclass
class Info:
    version: int = 1
    timestamp: int | None = None   # units of date_granularity (seconds by default)
    changeset: int | None = None
    uid: int | None = None
    user: str | None = None
    visible: bool | None = None


@dataclass
class Node:
    id: int
    lat_raw: int                    # units of granularity (default 100 nanodeg)
    lon_raw: int
    tags: list[tuple[str, str]] = field(default_factory=list)
    info: Info | None = None


@dataclass
class Way:
    id: int
    refs: list[int]
    tags: list[tuple[str, str]] = field(default_factory=list)
    info: Info | None = None
    # LocationsOnWays (osmformat.proto Way.lat/lon = 9/10): raw granularity units
    locations: list[tuple[int, int]] | None = None


@dataclass
class Relation:
    id: int
    members: list[tuple[str, int, int]]   # (role, member_id, type 0|1|2)
    tags: list[tuple[str, str]] = field(default_factory=list)
    info: Info | None = None


class StringTableBuilder:
    """Per-block string dictionary; index 0 reserved blank
    (osmformat.proto StringTable comment)."""

    def __init__(self):
        self._index: dict[str, int] = {}
        self.entries: list[bytes] = [b""]

    def get(self, s: str) -> int:
        idx = self._index.get(s)
        if idx is None:
            idx = len(self.entries)
            self.entries.append(s.encode("utf-8"))
            self._index[s] = idx
        return idx

    def encode(self) -> bytes:
        return b"".join(len_field(1, e) for e in self.entries)


def _encode_info(info: Info, st: StringTableBuilder) -> bytes:
    out = bytearray()
    if info.version is not None:
        out += varint_field(1, info.version)
    if info.timestamp is not None:
        out += varint_field(2, info.timestamp)
    if info.changeset is not None:
        out += varint_field(3, info.changeset)
    if info.uid is not None:
        out += varint_field(4, info.uid)
    if info.user is not None:
        out += varint_field(5, st.get(info.user))
    if info.visible is not None:
        out += varint_field(6, 1 if info.visible else 0)
    return bytes(out)


def _tag_fields(tags, st: StringTableBuilder) -> bytes:
    keys = [st.get(k) for k, _ in tags]
    vals = [st.get(v) for _, v in tags]
    return packed_field(2, keys) + packed_field(3, vals)


def _encode_node(n: Node, st: StringTableBuilder) -> bytes:
    out = bytearray(varint_field(1, n.id, zigzag=True))
    out += _tag_fields(n.tags, st)
    if n.info is not None:
        out += len_field(4, _encode_info(n.info, st))
    out += varint_field(8, n.lat_raw, zigzag=True)
    out += varint_field(9, n.lon_raw, zigzag=True)
    return bytes(out)


def _encode_dense(nodes: list[Node], st: StringTableBuilder,
                  with_info: bool) -> bytes:
    out = bytearray()
    out += packed_field(1, [n.id for n in nodes], zigzag=True, delta=True)
    if with_info:
        infos = [n.info or Info() for n in nodes]
        di = bytearray()
        versions = [i.version for i in infos]
        if any(v is not None for v in versions):
            di += packed_field(
                1, [v if v is not None else -1 for v in versions])
        di += packed_field(2, [i.timestamp or 0 for i in infos],
                           zigzag=True, delta=True)
        di += packed_field(3, [i.changeset or 0 for i in infos],
                           zigzag=True, delta=True)
        di += packed_field(4, [i.uid or 0 for i in infos], zigzag=True, delta=True)
        di += packed_field(5, [st.get(i.user or "") for i in infos],
                           zigzag=True, delta=True)
        if any(i.visible is not None for i in infos):
            di += packed_field(
                6, [0 if i.visible is False else 1 for i in infos])
        out += len_field(5, bytes(di))
    out += packed_field(8, [n.lat_raw for n in nodes], zigzag=True, delta=True)
    out += packed_field(9, [n.lon_raw for n in nodes], zigzag=True, delta=True)
    # keys_vals: ((<keyid> <valid>)* '0')*  — omitted entirely if all tagless
    if any(n.tags for n in nodes):
        kv: list[int] = []
        for n in nodes:
            for k, v in n.tags:
                kv += [st.get(k), st.get(v)]
            kv.append(0)
        out += packed_field(10, kv)
    return bytes(out)


def _encode_way(w: Way, st: StringTableBuilder) -> bytes:
    out = bytearray(varint_field(1, w.id))
    out += _tag_fields(w.tags, st)
    if w.info is not None:
        out += len_field(4, _encode_info(w.info, st))
    out += packed_field(8, w.refs, zigzag=True, delta=True)
    if w.locations is not None:
        out += packed_field(9, [la for la, _ in w.locations], zigzag=True, delta=True)
        out += packed_field(10, [lo for _, lo in w.locations], zigzag=True, delta=True)
    return bytes(out)


def _encode_relation(r: Relation, st: StringTableBuilder) -> bytes:
    out = bytearray(varint_field(1, r.id))
    out += _tag_fields(r.tags, st)
    if r.info is not None:
        out += len_field(4, _encode_info(r.info, st))
    out += packed_field(8, [st.get(role) for role, _, _ in r.members])
    out += packed_field(9, [mid for _, mid, _ in r.members], zigzag=True, delta=True)
    out += packed_field(10, [t for _, _, t in r.members])
    return bytes(out)


def encode_primitive_block(groups: list[list], *, dense: bool = True,
                           granularity: int = 100, lat_offset: int = 0,
                           lon_offset: int = 0, date_granularity: int = 1000,
                           with_info: bool = True) -> bytes:
    """Encode a PrimitiveBlock. ``groups`` is a list of homogeneous element
    lists (each all-Node, all-Way, or all-Relation); nodes are encoded as
    DenseNodes when ``dense`` else as plain Node messages.
    """
    st = StringTableBuilder()
    group_payloads = []
    for group in groups:
        g = bytearray()
        if not group:
            continue
        if isinstance(group[0], Node):
            if dense:
                g += len_field(2, _encode_dense(group, st, with_info))
            else:
                for n in group:
                    g += len_field(1, _encode_node(n, st))
        elif isinstance(group[0], Way):
            for w in group:
                g += len_field(3, _encode_way(w, st))
        elif isinstance(group[0], Relation):
            for r in group:
                g += len_field(4, _encode_relation(r, st))
        else:
            raise TypeError(type(group[0]))
        group_payloads.append(bytes(g))

    out = bytearray(len_field(1, st.encode()))
    for gp in group_payloads:
        out += len_field(2, gp)
    if granularity != 100:
        out += varint_field(17, granularity)
    if date_granularity != 1000:
        out += varint_field(18, date_granularity)
    if lat_offset:
        out += varint_field(19, lat_offset)
    if lon_offset:
        out += varint_field(20, lon_offset)
    return bytes(out)


def encode_header_block(*, bbox_nano: tuple[int, int, int, int] | None = None,
                        required_features: list[str] = (),
                        optional_features: list[str] = (),
                        writingprogram: str | None = None) -> bytes:
    out = bytearray()
    if bbox_nano is not None:
        left, right, top, bottom = bbox_nano
        bb = (varint_field(1, left, zigzag=True)
              + varint_field(2, right, zigzag=True)
              + varint_field(3, top, zigzag=True)
              + varint_field(4, bottom, zigzag=True))
        out += len_field(1, bytes(bb))
    for f in required_features:
        out += len_field(4, f.encode())
    for f in optional_features:
        out += len_field(5, f.encode())
    if writingprogram:
        out += len_field(16, writingprogram.encode())
    return bytes(out)


def encode_blob(block_payload: bytes, *, compress: bool = True) -> bytes:
    """Wrap a serialized block message in a Blob (raw or zlib_data)."""
    out = bytearray(varint_field(2, len(block_payload)))  # raw_size
    if compress:
        out += len_field(3, zlib.compress(block_payload))
    else:
        out += len_field(1, block_payload)
    return bytes(out)


def frame_fileblock(blob_type: str, blob: bytes) -> bytes:
    """[u32 BE header_len][BlobHeader][Blob] — fileformat.proto framing."""
    header = len_field(1, blob_type.encode()) + varint_field(3, len(blob))
    return struct.pack(">I", len(header)) + header + blob


def write_pbf(blocks: list[tuple[str, bytes, bool]]) -> bytes:
    """blocks: list of (blob_type, block_payload, compress) → full file bytes."""
    return b"".join(
        frame_fileblock(t, encode_blob(p, compress=c)) for t, p, c in blocks)
