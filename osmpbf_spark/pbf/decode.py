"""Vectorized OSM PBF fileblock decoder → Arrow element columns.

This is the engine's one genuinely custom physical operator (SURVEY.md §2.2,
§2.3): it subsumes the reference's whole decode stack —

- Blob framing / type dispatch          (/root/reference/src/blob.rs:85-125, 262-295)
- raw/zlib decompression + size guards  (/root/reference/src/blob.rs:15,18,455-469)
- PrimitiveBlock flatten                (/root/reference/src/block.rs:114-283)
- DenseNodes delta-cumsum + keys_vals   (/root/reference/src/dense.rs:86-183)
- way refs / LocationsOnWays cumsum     (/root/reference/src/elements.rs:326-423)
- relation member zip + role lookup     (/root/reference/src/elements.rs:462-511)
- Info / DenseInfo metadata             (/root/reference/src/elements.rs:566-626,
                                         /root/reference/src/dense.rs:243-316)

but re-expressed columnar-first: packed varint columns are decoded with
numpy (wire.decode_packed_*), string tables become numpy object-array
dictionary takes, and each fileblock yields Arrow columns directly. There is
no per-element Python in the DenseNodes hot path.

Output schema = SURVEY.md §1.3 ``elements`` minus the derived ``lat``/``lon``
doubles, which are added as Catalyst expressions downstream (doubles are
derived, never authoritative — nano-degree exactness contract,
/root/reference/tests/read.rs:112-126).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pyarrow as pa

from .wire import (
    WT_LEN,
    WT_VARINT,
    decode_packed_int64,
    decode_packed_sint64_delta,
    decode_packed_u64,
    decode_packed_u64_segments,
    decode_packed_u64_spans,
    read_varint,
    scan_fields,
    scan_messages_vec,
    segmented_cumsum,
    unzigzag,
    zigzag_decode,
)

# Hard limits mirrored from the reference (src/blob.rs:15,18): corrupt input
# must not OOM an executor.
MAX_BLOB_HEADER_SIZE = 64 * 1024
MAX_BLOB_MESSAGE_SIZE = 32 * 1024 * 1024

MEMBER_TYPE_NAMES = np.array(["node", "way", "relation"], dtype=object)
_ETYPE_CODE = {"node": 0, "way": 1, "relation": 2}
_ETYPE_NAMES = MEMBER_TYPE_NAMES

ELEMENT_SCHEMA = pa.schema([
    ("element_type", pa.string()),
    ("id", pa.int64()),
    ("lat_nano", pa.int64()),
    ("lon_nano", pa.int64()),
    ("tags", pa.map_(pa.string(), pa.string())),
    ("refs", pa.list_(pa.int64())),
    ("ref_locations", pa.list_(pa.struct([
        ("lat_nano", pa.int64()), ("lon_nano", pa.int64())]))),
    ("members", pa.list_(pa.struct([
        ("role", pa.string()), ("member_id", pa.int64()),
        ("member_type", pa.string())]))),
    ("version", pa.int32()),
    ("milli_timestamp", pa.int64()),
    ("changeset", pa.int64()),
    ("uid", pa.int32()),
    ("user", pa.string()),
    ("visible", pa.bool_()),
    ("blob_no", pa.int64()),
    ("doc_id", pa.string()),
])


# ---------------------------------------------------------------------------
# File framing (ingest-time: raw *.osm.pbf byte stream → blob records)
# ---------------------------------------------------------------------------

def try_parse_frame_at(buf, pos: int):
    """If a plausible fileblock frame starts at ``pos``, return
    (blob_type, header_size, datasize), else None.

    A frame is ``[u32 BE len][BlobHeader][Blob]`` (fileformat.proto:58-67).
    Plausibility = length within the 64 KiB header limit, BlobHeader
    parses with a printable-ASCII type string and a datasize within the
    32 MiB body limit (the reference's own guards, src/blob.rs:189-295).
    Unknown blob TYPES are spec-legal and must index (the reference
    models them as BlobType::Unknown, src/blob.rs:22-29, and drops them
    at decode, not at framing) — so the type check is shape-based, not
    a whitelist. Used by the chunked scanner to RESYNC inside an
    arbitrary byte range; residual false positives are eliminated by
    the chain check plus the caller's whole-file contiguity gate."""
    n = len(buf)
    if pos + 4 > n:
        return None
    header_size = struct.unpack_from(">I", buf, pos)[0]
    if not 0 < header_size <= MAX_BLOB_HEADER_SIZE:
        return None
    if pos + 4 + header_size > n:
        return None
    blob_type = None
    datasize = None
    try:
        for field_no, wt, value in scan_fields(buf[pos + 4:
                                                   pos + 4 + header_size]):
            if field_no == 1 and wt == WT_LEN:
                blob_type = bytes(value).decode("utf-8")
            elif field_no == 3 and wt == WT_VARINT:
                datasize = value
    except Exception:
        return None
    if (blob_type is None or not 0 < len(blob_type) <= 64
            or not all(0x20 <= ord(c) <= 0x7e for c in blob_type)):
        return None
    if datasize is None or not 0 <= datasize <= MAX_BLOB_MESSAGE_SIZE:
        return None
    if pos + 4 + header_size + datasize > n:
        return None
    return blob_type, header_size, datasize


def scan_chunk_frames(buf, start: int, end: int):
    """Frame headers whose START lies in ``[start, end)`` of ``buf`` (a
    bytes-like with random access, e.g. an mmap — bounded memory via OS
    paging). Resyncs at ``start``: scans forward for the first offset
    where a frame parses AND chains to a second valid frame (or EOF).
    Yields (offset, blob_type, header_size, datasize); payload bytes are
    NOT materialized — callers slice them on demand (header-only pass).
    """
    pos = start
    synced = start == 0
    while pos < end:
        f = try_parse_frame_at(buf, pos)
        if f is None:
            # includes losing sync mid-stream (corruption/garbage): keep
            # scanning — the gap surfaces as a precise ValueError in the
            # driver's contiguity gate rather than a worker stack trace
            synced = False
            pos += 1
            continue
        if not synced:
            # chain check: the candidate's successor must also parse (or
            # be exactly EOF) — a zlib byte soup rarely fakes one valid
            # header, practically never two in a row; any residual false
            # sync is caught by the driver's contiguity validation
            nxt = pos + 4 + f[1] + f[2]
            if nxt != len(buf) and try_parse_frame_at(buf, nxt) is None:
                pos += 1
                continue
            synced = True
        yield (pos, *f)
        pos += 4 + f[1] + f[2]


def split_fileblocks(data: bytes):
    """Walk ``[u32 BE len][BlobHeader][Blob]`` records; yields dicts with
    (blob_no, blob_type, offset, datasize, blob_bytes).
    Framing per fileformat.proto:58-67; loop mirrors the semantics of the
    reference's BlobReader (src/blob.rs:189-295) without its seek machinery —
    in Spark, random access is a filter on the ``offset`` column.
    """
    view = memoryview(data)
    pos = 0
    blob_no = 0
    while pos < len(view):
        if pos + 4 > len(view):
            raise ValueError("truncated length prefix")
        header_size = struct.unpack_from(">I", view, pos)[0]
        if header_size > MAX_BLOB_HEADER_SIZE:
            raise ValueError("blob header exceeds 64 KiB limit")
        offset = pos
        pos += 4
        header = view[pos:pos + header_size]
        if len(header) != header_size:
            raise ValueError("truncated BlobHeader")
        pos += header_size
        blob_type = None
        datasize = None
        for field_no, wt, value in scan_fields(header):
            if field_no == 1 and wt == WT_LEN:
                blob_type = bytes(value).decode("utf-8")
            elif field_no == 3 and wt == WT_VARINT:
                datasize = value
        if blob_type is None or datasize is None:
            raise ValueError("BlobHeader missing required fields")
        blob = view[pos:pos + datasize]
        if len(blob) != datasize:
            raise ValueError("truncated Blob payload")
        pos += datasize
        yield {
            "blob_no": blob_no,
            "blob_type": blob_type,
            "offset": offset,
            "datasize": datasize,
            "blob_bytes": bytes(blob),
        }
        blob_no += 1


def decompress_blob(blob_bytes: bytes) -> bytes:
    """Blob message → uncompressed block payload. Only ``raw`` (field 1) and
    ``zlib_data`` (field 3) are supported, like the reference
    (src/blob.rs:455-469); other encodings raise.
    """
    raw = None
    zlib_data = None
    raw_size = None
    for field_no, wt, value in scan_fields(blob_bytes):
        if field_no == 1 and wt == WT_LEN:
            raw = bytes(value)
        elif field_no == 2 and wt == WT_VARINT:
            raw_size = value
        elif field_no == 3 and wt == WT_LEN:
            zlib_data = bytes(value)
        elif field_no in (4, 5, 6, 7):
            raise ValueError(
                f"unsupported blob compression (field {field_no}); "
                "only raw and zlib are decoded")
    if raw is not None:
        if len(raw) > MAX_BLOB_MESSAGE_SIZE:
            raise ValueError("blob message exceeds 32 MiB limit")
        return raw
    if zlib_data is not None:
        out = zlib.decompressobj().decompress(
            zlib_data, MAX_BLOB_MESSAGE_SIZE + 1)
        if len(out) > MAX_BLOB_MESSAGE_SIZE:
            raise ValueError("blob message exceeds 32 MiB limit")
        if raw_size is not None and len(out) != raw_size:
            raise ValueError("zlib raw_size mismatch")
        return out
    raise ValueError("empty blob (no raw/zlib data)")


# ---------------------------------------------------------------------------
# HeaderBlock
# ---------------------------------------------------------------------------

def parse_header_block(buf) -> dict:
    """HeaderBlock → plain dict (bbox ×1e-9 to degrees, NOT granularity —
    src/block.rs:21-28; replication fields src/block.rs:41-86)."""
    out = {
        "bbox": None,
        "required_features": [],
        "optional_features": [],
        "writingprogram": None,
        "source": None,
        "osmosis_replication_timestamp": None,
        "osmosis_replication_sequence_number": None,
        "osmosis_replication_base_url": None,
    }
    for field_no, wt, value in scan_fields(buf):
        if field_no == 1 and wt == WT_LEN:
            bb = {}
            for f2, w2, v2 in scan_fields(value):
                if w2 == WT_VARINT:
                    bb[f2] = zigzag_decode(v2)
            out["bbox"] = {
                "left": bb.get(1, 0) * 1e-9,
                "right": bb.get(2, 0) * 1e-9,
                "top": bb.get(3, 0) * 1e-9,
                "bottom": bb.get(4, 0) * 1e-9,
            }
        elif field_no == 4 and wt == WT_LEN:
            out["required_features"].append(bytes(value).decode())
        elif field_no == 5 and wt == WT_LEN:
            out["optional_features"].append(bytes(value).decode())
        elif field_no == 16 and wt == WT_LEN:
            out["writingprogram"] = bytes(value).decode()
        elif field_no == 17 and wt == WT_LEN:
            out["source"] = bytes(value).decode()
        elif field_no == 32:
            out["osmosis_replication_timestamp"] = value
        elif field_no == 33:
            out["osmosis_replication_sequence_number"] = value
        elif field_no == 34 and wt == WT_LEN:
            out["osmosis_replication_base_url"] = bytes(value).decode()
    return out


# ---------------------------------------------------------------------------
# PrimitiveBlock → columnar element chunks
# ---------------------------------------------------------------------------

class _Chunk:
    """One homogeneous run of decoded elements (columnar)."""

    __slots__ = ("element_type", "ids", "lat_nano", "lon_nano",
                 "tag_offsets", "tag_keys", "tag_vals",
                 "refs_offsets", "refs_values",
                 "loc_offsets", "loc_lat", "loc_lon",
                 "mem_offsets", "mem_roles", "mem_ids", "mem_types",
                 "version", "milli_ts", "changeset", "uid", "user", "visible",
                 "has_info", "ts_mask", "chg_mask", "uid_mask")

    def __init__(self, element_type: str, n: int):
        self.element_type = element_type
        z64 = np.zeros(n, dtype=np.int64)
        self.ids = z64
        self.lat_nano = None       # int64 array or None (non-nodes)
        self.lon_nano = None
        self.tag_offsets = np.zeros(n + 1, dtype=np.int64)
        self.tag_keys = []         # np object arrays to concat
        self.tag_vals = []
        self.refs_offsets = None   # ways only
        self.refs_values = None
        self.loc_offsets = None
        self.loc_lat = None
        self.loc_lon = None
        self.mem_offsets = None    # relations only
        self.mem_roles = None
        self.mem_ids = None
        self.mem_types = None
        self.version = None        # int64 arrays (cast at Arrow build)
        self.milli_ts = None
        self.changeset = None
        self.uid = None
        self.user = None           # object array
        self.visible = None        # bool array
        self.has_info = None       # bool mask: info present per element
        # per-FIELD presence within an Info (reference exposes these as
        # Option — 0 must be distinguishable from absent,
        # src/elements.rs:566-626); None ⇒ present wherever has_info
        self.ts_mask = None
        self.chg_mask = None
        self.uid_mask = None


def _decode_stringtable(buf) -> np.ndarray:
    """StringTable → numpy object array of str (None for invalid UTF-8 —
    lookups that hit None are skipped, mirroring TagIter's silent skip,
    src/elements.rs:513-538)."""
    entries = []
    for field_no, wt, value in scan_fields(buf):
        if field_no == 1 and wt == WT_LEN:
            try:
                entries.append(bytes(value).decode("utf-8"))
            except UnicodeDecodeError:
                entries.append(None)
    arr = np.empty(len(entries), dtype=object)
    arr[:] = entries
    return arr


def _table_take(table: np.ndarray, idx: np.ndarray) -> np.ndarray:
    """Bounds-checked dictionary take — hostile inputs with string-table
    ids out of range fail cleanly (StringtableIndexOutOfBounds semantics,
    src/error.rs:54-58) instead of crashing numpy."""
    if idx.size and (idx.min() < 0 or idx.max() >= len(table)):
        raise ValueError("string table index out of bounds")
    return table[idx]


def _split_kv_id_pairs(kv: np.ndarray, n_nodes: int):
    """DenseNodes keys_vals → (pair_counts per node, key ids, val ids) —
    the segmentation step alone, no string-table access. Shared by the
    decoded-tag path (TagIter) and the raw index-pair path
    (DenseRawTagIter, src/dense.rs:345-369: pairwise walk of each node's
    keys_vals slice, no resolution, no skipping).

    ``((<keyid> <valid>)* '0')*`` with tolerance for a missing trailing
    delimiter and for fewer groups than nodes (both tolerated by the
    reference's scan-to-delimiter, src/dense.rs:153-163).
    """
    empty = np.empty(0, dtype=np.int64)
    if kv.size == 0:
        return np.zeros(n_nodes, dtype=np.int64), empty, empty
    if kv[-1] != 0:
        kv = np.concatenate([kv, np.zeros(1, dtype=kv.dtype)])
    zero_pos = np.flatnonzero(kv == 0)
    seg_lengths = np.diff(np.concatenate(([np.int64(-1)], zero_pos))) - 1
    # keep only complete (key, val) pairs of the first n_nodes segments:
    # a dangling odd entry or surplus segments must not shift the global
    # key/val alternation for later nodes
    nz = kv[kv != 0]
    n_segs = len(seg_lengths)
    starts = np.cumsum(seg_lengths) - seg_lengths
    seg_of_entry = np.repeat(np.arange(n_segs), seg_lengths)
    pos_in_seg = np.arange(nz.size, dtype=np.int64) - np.repeat(
        starts, seg_lengths)
    even_len = 2 * (seg_lengths // 2)
    keep = ((seg_of_entry < n_nodes)
            & (pos_in_seg < np.repeat(even_len, seg_lengths)))
    kept = nz[keep].astype(np.int64)
    m = min(n_segs, n_nodes)
    pair_counts = np.zeros(n_nodes, dtype=np.int64)
    pair_counts[:m] = seg_lengths[:m] // 2
    return pair_counts, kept[0::2], kept[1::2]


def _split_keys_vals(kv: np.ndarray, n_nodes: int, table: np.ndarray):
    """DenseNodes keys_vals → (pair_counts per node, key strings, val
    strings): segmentation (shared with the raw path) + string-table
    resolution + silent-skip."""
    if kv.size == 0:
        return np.zeros(n_nodes, dtype=np.int64), None, None
    pair_counts, key_ids, val_ids = _split_kv_id_pairs(kv, n_nodes)
    keys = _table_take(table, key_ids)
    vals = _table_take(table, val_ids)
    # silent-skip semantics for unresolvable (invalid-UTF-8) entries
    # (src/elements.rs:513-538): drop pairs whose key or val is None --
    # Arrow MAP keys cannot be null
    if keys.size and (_has_none(keys) or _has_none(vals)):
        good = np.array([k is not None and v is not None
                         for k, v in zip(keys, vals)])
        seg_of_pair = np.repeat(np.arange(n_nodes), pair_counts)
        pair_counts = np.bincount(seg_of_pair[good],
                                  minlength=n_nodes).astype(np.int64)
        keys = keys[good]
        vals = vals[good]
    return pair_counts, keys, vals


def _has_none(arr: np.ndarray) -> bool:
    return bool((arr == None).any())  # noqa: E711 -- elementwise vs None


def _parse_dense(buf, table: np.ndarray, granularity: int, lat_offset: int,
                 lon_offset: int, date_granularity: int) -> _Chunk:
    """DenseNodes → columnar chunk; all delta-cumsum decoding is numpy
    (src/dense.rs:86-183 re-expressed as whole-column ops)."""
    id_buf = lat_buf = lon_buf = kv_buf = None
    di_buf = None
    for field_no, wt, value in scan_fields(buf):
        if wt != WT_LEN:
            continue  # all DenseNodes fields are packed/message (LEN)
        if field_no == 1:
            id_buf = value
        elif field_no == 5:
            di_buf = value
        elif field_no == 8:
            lat_buf = value
        elif field_no == 9:
            lon_buf = value
        elif field_no == 10:
            kv_buf = value
    ids = decode_packed_sint64_delta(id_buf) if id_buf is not None \
        else np.empty(0, dtype=np.int64)
    n = len(ids)
    chunk = _Chunk("node", n)
    chunk.ids = ids
    lat_raw = decode_packed_sint64_delta(lat_buf) if lat_buf is not None \
        else np.zeros(n, dtype=np.int64)
    lon_raw = decode_packed_sint64_delta(lon_buf) if lon_buf is not None \
        else np.zeros(n, dtype=np.int64)
    # nano = offset + granularity * raw (exact int64 — src/elements.rs:89-91)
    chunk.lat_nano = lat_offset + granularity * lat_raw
    chunk.lon_nano = lon_offset + granularity * lon_raw

    kv = decode_packed_int64(kv_buf) if kv_buf is not None \
        else np.empty(0, dtype=np.int64)
    pair_counts, keys, vals = _split_keys_vals(kv, n, table)
    chunk.tag_offsets = np.concatenate(
        ([np.int64(0)], np.cumsum(pair_counts)))
    if keys is not None:
        chunk.tag_keys.append(keys)
        chunk.tag_vals.append(vals)

    if di_buf is not None:
        fields = {}
        for field_no, wt, value in scan_fields(di_buf):
            if wt == WT_LEN:
                fields[field_no] = value
        chunk.has_info = np.ones(n, dtype=bool)

        def _full(buf_key, delta, default=0):
            """(values, present): absent column or padded tail ⇒ not
            present — 0 would otherwise be indistinguishable from a real
            zero (per-field Option, src/elements.rs:566-626)."""
            b = fields.get(buf_key)
            if b is None:
                return (np.full(n, default, dtype=np.int64),
                        np.zeros(n, dtype=bool))
            a = decode_packed_sint64_delta(b) if delta \
                else decode_packed_int64(b)
            present = np.ones(n, dtype=bool)
            if len(a) < n:
                present[len(a):] = False
                a = np.pad(a, (0, n - len(a)),
                           constant_values=default)
            return a[:n], present

        # version default is -1 (proto Info default) so dense and plain
        # encodings of the same element agree
        chunk.version, _ = _full(1, False, default=-1)
        ts_raw, chunk.ts_mask = _full(2, True)
        chunk.milli_ts = ts_raw * date_granularity
        chunk.changeset, chunk.chg_mask = _full(3, True)
        chunk.uid, chunk.uid_mask = _full(4, True)
        # user: absent/short sid column ⇒ NULL (parity with the plain-
        # Info path); an explicit sid (incl. 0 → "") stays a string —
        # DenseInfo's parallel arrays cannot express per-element absence,
        # which is a wire-format limit, not an engine choice
        user_sid, user_present = _full(5, True)
        chunk.user = _table_take(table, user_sid)
        if not user_present.all():
            chunk.user = chunk.user.copy()
            chunk.user[~user_present] = None
        vis_buf = fields.get(6)
        if vis_buf is None:
            chunk.visible = np.ones(n, dtype=bool)
        else:
            vis = decode_packed_int64(vis_buf) != 0
            if len(vis) < n:
                # per-element default true (src/dense.rs:310)
                vis = np.concatenate([vis, np.ones(n - len(vis), dtype=bool)])
            chunk.visible = vis[:n]
    return chunk


def _parse_info(buf, table: np.ndarray, date_granularity: int):
    version = -1  # proto default (osmformat.proto Info.version)
    ts = changeset = uid = None
    user = None
    visible = True  # default true (src/elements.rs:614-619)
    for field_no, wt, value in scan_fields(buf):
        if wt != WT_VARINT:
            continue  # all Info fields are varints
        if field_no == 1:
            version = value if value < (1 << 63) else value - (1 << 64)
        elif field_no == 2:
            ts = value if value < (1 << 63) else value - (1 << 64)
        elif field_no == 3:
            changeset = value if value < (1 << 63) else value - (1 << 64)
        elif field_no == 4:
            uid = value if value < (1 << 63) else value - (1 << 64)
        elif field_no == 5:
            user = table[value] if value < len(table) else None
        elif field_no == 6:
            visible = bool(value)
    milli_ts = ts * date_granularity if ts is not None else None
    return version, milli_ts, changeset, uid, user, visible


class _StructRows:
    """Accumulates plain (message-per-element) Nodes/Ways/Relations for one
    group, then finalizes to a _Chunk."""

    def __init__(self, element_type: str):
        self.element_type = element_type
        self.ids = []
        self.lat_nano = []
        self.lon_nano = []
        self.tag_counts = []
        self.tag_keys = []
        self.tag_vals = []
        self.refs = []
        self.loc_lat = []
        self.loc_lon = []
        self.mem_counts = []
        self.mem_roles = []
        self.mem_ids = []
        self.mem_types = []
        self.infos = []   # None or tuple from _parse_info

    def finish(self) -> _Chunk:
        n = len(self.ids)
        c = _Chunk(self.element_type, n)
        c.ids = np.array(self.ids, dtype=np.int64)
        if self.element_type == "node":
            c.lat_nano = np.array(self.lat_nano, dtype=np.int64)
            c.lon_nano = np.array(self.lon_nano, dtype=np.int64)
        c.tag_offsets = np.concatenate(
            ([np.int64(0)], np.cumsum(np.array(self.tag_counts, dtype=np.int64))))
        c.tag_keys = self.tag_keys
        c.tag_vals = self.tag_vals
        if self.element_type == "way":
            lens = np.array([len(r) for r in self.refs], dtype=np.int64)
            c.refs_offsets = np.concatenate(([np.int64(0)], np.cumsum(lens)))
            c.refs_values = (np.concatenate(self.refs) if self.refs
                             else np.empty(0, dtype=np.int64))
            loc_lens = np.array([len(x) for x in self.loc_lat], dtype=np.int64)
            c.loc_offsets = np.concatenate(([np.int64(0)], np.cumsum(loc_lens)))
            c.loc_lat = (np.concatenate(self.loc_lat) if self.loc_lat
                         else np.empty(0, dtype=np.int64))
            c.loc_lon = (np.concatenate(self.loc_lon) if self.loc_lon
                         else np.empty(0, dtype=np.int64))
        if self.element_type == "relation":
            mlens = np.array(self.mem_counts, dtype=np.int64)
            c.mem_offsets = np.concatenate(([np.int64(0)], np.cumsum(mlens)))
            c.mem_roles = self.mem_roles
            c.mem_ids = (np.concatenate(self.mem_ids) if self.mem_ids
                         else np.empty(0, dtype=np.int64))
            c.mem_types = (np.concatenate(self.mem_types) if self.mem_types
                           else np.empty(0, dtype=np.int64))
        if any(i is not None for i in self.infos):
            c.has_info = np.array([i is not None for i in self.infos])
            def col(idx, default):
                return np.array(
                    [(i[idx] if i is not None and i[idx] is not None
                      else default) for i in self.infos], dtype=np.int64)
            c.version = col(0, -1)
            c.milli_ts = col(1, 0)
            c.changeset = col(2, 0)
            c.uid = col(3, 0)

            def mask(idx):
                return np.array([i is not None and i[idx] is not None
                                 for i in self.infos])
            c.ts_mask = mask(1)
            c.chg_mask = mask(2)
            c.uid_mask = mask(3)
            u = np.empty(n, dtype=object)
            u[:] = [i[4] if i is not None else None for i in self.infos]
            c.user = u
            c.visible = np.array(
                [i[5] if i is not None else True for i in self.infos])
        return c


_EMPTY = b""


def _filter_none_tag_pairs(m, keys, vals):
    """Drop (key, val) pairs containing an unresolvable (None) string,
    adjusting per-element pair counts (silent-skip semantics,
    src/elements.rs:513-538)."""
    if keys.size == 0 or not (_has_none(keys) or _has_none(vals)):
        return m, keys, vals
    good = np.array([k is not None and v is not None
                     for k, v in zip(keys, vals)])
    owner = np.repeat(np.arange(len(m)), m)
    m2 = np.bincount(owner[good], minlength=len(m)).astype(np.int64)
    return m2, keys[good], vals[good]


def _seg_select(vals, lens, m):
    """Truncate a segmented array (segment lengths ``lens``) to the first
    ``m[i]`` values of each segment — vectorized zip-truncate."""
    if vals.size == 0:
        return vals
    nz = lens[lens > 0]
    starts = np.cumsum(nz) - nz
    pos = np.arange(vals.size, dtype=np.int64) - np.repeat(starts, nz)
    keep_len = np.repeat(m[lens > 0], nz)
    return vals[pos < keep_len]


def _seg_pair_select(a_vals, a_lens, b_vals, b_lens):
    """Zip-truncate two segmented arrays to per-segment min length
    (parallel-array zip semantics, src/elements.rs:513-538). Returns
    (a_sel, b_sel, m) with m = per-segment pair counts."""
    m = np.minimum(a_lens, b_lens)
    return _seg_select(a_vals, a_lens, m), _seg_select(b_vals, b_lens, m), m


def _batch_infos(chunk: _Chunk, info_bufs, table, date_granularity):
    """Per-message Info parse (rare fields; scalar scan is fine — the
    packed columns around it are the hot path)."""
    n = len(info_bufs)
    if not any(b is not None for b in info_bufs):
        return
    chunk.has_info = np.array([b is not None for b in info_bufs])
    vers = np.full(n, -1, dtype=np.int64)
    mts = np.zeros(n, dtype=np.int64)
    chg = np.zeros(n, dtype=np.int64)
    uid = np.zeros(n, dtype=np.int64)
    ts_m = np.zeros(n, dtype=bool)
    chg_m = np.zeros(n, dtype=bool)
    uid_m = np.zeros(n, dtype=bool)
    user = np.full(n, None, dtype=object)
    vis = np.ones(n, dtype=bool)
    for i, b in enumerate(info_bufs):
        if b is None:
            continue
        v = _parse_info(b, table, date_granularity)
        vers[i] = v[0]
        if v[1] is not None:
            mts[i] = v[1]
            ts_m[i] = True
        if v[2] is not None:
            chg[i] = v[2]
            chg_m[i] = True
        if v[3] is not None:
            uid[i] = v[3]
            uid_m[i] = True
        user[i] = v[4]
        vis[i] = v[5]
    chunk.version = vers
    chunk.milli_ts = mts
    chunk.changeset = chg
    chunk.uid = uid
    chunk.ts_mask = ts_m
    chunk.chg_mask = chg_m
    chunk.uid_mask = uid_m
    chunk.user = user
    chunk.visible = vis


def _parse_way_group(bufs, table, granularity, lat_offset, lon_offset,
                     date_granularity) -> _Chunk:
    """All Way messages of a group, batch-decoded: one scalar field scan
    per message to collect slices, then ONE vectorized pass per packed
    column across the whole group (refs delta-cumsum restarts per way via
    segmented_cumsum). Re-expresses WayRefIter / WayNodeLocationsIter
    (src/elements.rs:326-423) as whole-group columnar ops."""
    n = len(bufs)
    c = _Chunk("way", n)
    # lockstep-vectorized field scan (r6): the per-message Python walk
    # was the measured hot spot of the whole decode kernel (~7 yields +
    # 2 scalar varints per Way) — scan_messages_vec advances every Way
    # of the group through its fields in parallel, and the packed
    # columns decode straight from (starts, lens) spans with no
    # per-message bytes objects
    big, mvals, spans = scan_messages_vec(
        bufs, varint_fields=(1,), len_fields=(2, 3, 4, 8, 9, 10))
    c.ids = mvals[1].astype(np.int64)
    i_st, i_ln, i_pr = spans[4]
    if i_pr.any():
        info_b = [big[s:s + ln].tobytes() if p else None
                  for s, ln, p in zip(i_st.tolist(), i_ln.tolist(),
                                      i_pr.tolist())]
    else:
        info_b = [None] * n

    kv, kl = decode_packed_u64_spans(big, *spans[2][:2])
    vv, vl = decode_packed_u64_spans(big, *spans[3][:2])
    ksel, vsel, m = _seg_pair_select(kv.astype(np.int64), kl,
                                     vv.astype(np.int64), vl)
    tk = _table_take(table, ksel)
    tv = _table_take(table, vsel)
    m, tk, tv = _filter_none_tag_pairs(m, tk, tv)
    c.tag_offsets = np.concatenate(([np.int64(0)], np.cumsum(m)))
    if tk.size:
        c.tag_keys.append(tk)
        c.tag_vals.append(tv)

    rv, rl = decode_packed_u64_spans(big, *spans[8][:2])
    c.refs_values = segmented_cumsum(unzigzag(rv), rl)
    c.refs_offsets = np.concatenate(([np.int64(0)], np.cumsum(rl)))

    lav, lal = decode_packed_u64_spans(big, *spans[9][:2])
    lov, lol = decode_packed_u64_spans(big, *spans[10][:2])
    # LocationsOnWays requires BOTH arrays (src/elements.rs:208-216)
    both = np.minimum(lal, lol)
    if lav.size and lov.size:
        la_sel, lo_sel, both = _seg_pair_select(
            unzigzag(lav), lal, unzigzag(lov), lol)
        # NOTE: selection must happen before cumsum only when truncating;
        # encoders always emit equal lengths, so lal==lol in practice
        c.loc_lat = lat_offset + granularity * segmented_cumsum(
            la_sel, both)
        c.loc_lon = lon_offset + granularity * segmented_cumsum(
            lo_sel, both)
    else:
        c.loc_lat = np.empty(0, dtype=np.int64)
        c.loc_lon = np.empty(0, dtype=np.int64)
    c.loc_offsets = np.concatenate(([np.int64(0)], np.cumsum(both)))

    _batch_infos(c, info_b, table, date_granularity)
    return c


def _parse_relation_group(bufs, table, date_granularity) -> _Chunk:
    """All Relation messages of a group, batch-decoded (RelMemberIter zip
    + role dictionary take, src/elements.rs:462-511, as columnar ops)."""
    n = len(bufs)
    c = _Chunk("relation", n)
    # lockstep-vectorized field scan — same rework as _parse_way_group
    big, mvals, spans = scan_messages_vec(
        bufs, varint_fields=(1,), len_fields=(2, 3, 4, 8, 9, 10))
    c.ids = mvals[1].astype(np.int64)
    i_st, i_ln, i_pr = spans[4]
    if i_pr.any():
        info_b = [big[s:s + ln].tobytes() if p else None
                  for s, ln, p in zip(i_st.tolist(), i_ln.tolist(),
                                      i_pr.tolist())]
    else:
        info_b = [None] * n

    kv, kl = decode_packed_u64_spans(big, *spans[2][:2])
    vv, vl = decode_packed_u64_spans(big, *spans[3][:2])
    ksel, vsel, m = _seg_pair_select(kv.astype(np.int64), kl,
                                     vv.astype(np.int64), vl)
    tk = _table_take(table, ksel)
    tv = _table_take(table, vsel)
    m, tk, tv = _filter_none_tag_pairs(m, tk, tv)
    c.tag_offsets = np.concatenate(([np.int64(0)], np.cumsum(m)))
    if tk.size:
        c.tag_keys.append(tk)
        c.tag_vals.append(tv)

    rv, rl = decode_packed_u64_spans(big, *spans[8][:2])
    mv, ml = decode_packed_u64_spans(big, *spans[9][:2])
    tv, tl = decode_packed_u64_spans(big, *spans[10][:2])
    memids = segmented_cumsum(unzigzag(mv), ml)
    # 3-way zip truncate (min of lengths per relation)
    mm = np.minimum(np.minimum(rl, ml), tl)
    roles_sel = _seg_select(rv.astype(np.int64), rl, mm)
    mem_sel = _seg_select(memids, ml, mm)
    types_sel = _seg_select(tv.astype(np.int64), tl, mm)
    c.mem_offsets = np.concatenate(([np.int64(0)], np.cumsum(mm)))
    if mem_sel.size:
        c.mem_roles = [_table_take(table, roles_sel)]
        c.mem_ids = mem_sel
        c.mem_types = types_sel
    else:
        c.mem_roles = []
        c.mem_ids = np.empty(0, dtype=np.int64)
        c.mem_types = np.empty(0, dtype=np.int64)

    _batch_infos(c, info_b, table, date_granularity)
    return c


def _parse_plain_node(buf, rows: _StructRows, table, granularity,
                      lat_offset, lon_offset, date_granularity):
    nid = lat = lon = 0
    keys_buf = vals_buf = info_buf = None
    for field_no, wt, value in scan_fields(buf):
        if field_no == 1 and wt == WT_VARINT:
            nid = zigzag_decode(value)
        elif field_no == 2 and wt == WT_LEN:
            keys_buf = value
        elif field_no == 3 and wt == WT_LEN:
            vals_buf = value
        elif field_no == 4 and wt == WT_LEN:
            info_buf = value
        elif field_no == 8 and wt == WT_VARINT:
            lat = zigzag_decode(value)
        elif field_no == 9 and wt == WT_VARINT:
            lon = zigzag_decode(value)
    rows.ids.append(nid)
    rows.lat_nano.append(lat_offset + granularity * lat)
    rows.lon_nano.append(lon_offset + granularity * lon)
    _append_tags(rows, keys_buf, vals_buf, table)
    rows.infos.append(
        _parse_info(info_buf, table, date_granularity)
        if info_buf is not None else None)


def _append_tags(rows: _StructRows, keys_buf, vals_buf, table):
    if keys_buf is None or vals_buf is None:
        rows.tag_counts.append(0)
        return
    k = decode_packed_u64(keys_buf).astype(np.int64)
    v = decode_packed_u64(vals_buf).astype(np.int64)
    m = min(len(k), len(v))  # zip semantics (src/elements.rs:513-538)
    ks = _table_take(table, k[:m])
    vs = _table_take(table, v[:m])
    if m and (_has_none(ks) or _has_none(vs)):
        good = np.array([a is not None and b is not None
                         for a, b in zip(ks, vs)])
        ks, vs = ks[good], vs[good]
        m = int(good.sum())
    rows.tag_counts.append(m)
    if m:
        rows.tag_keys.append(ks)
        rows.tag_vals.append(vs)


def parse_primitive_block(buf) -> list[_Chunk]:
    """PrimitiveBlock → list of columnar element chunks, in the reference's
    fixed emission order nodes→dense→ways→relations per group
    (src/block.rs:124-142, 210-283)."""
    st_buf = None
    group_bufs = []
    granularity = 100
    date_granularity = 1000
    lat_offset = 0
    lon_offset = 0
    for field_no, wt, value in scan_fields(buf):
        if field_no == 1 and wt == WT_LEN:
            st_buf = value
        elif field_no == 2 and wt == WT_LEN:
            group_bufs.append(value)
        elif field_no == 17 and wt == WT_VARINT:
            granularity = value
        elif field_no == 18 and wt == WT_VARINT:
            date_granularity = value
        elif field_no == 19 and wt == WT_VARINT:
            lat_offset = value if value < (1 << 63) else value - (1 << 64)
        elif field_no == 20 and wt == WT_VARINT:
            lon_offset = value if value < (1 << 63) else value - (1 << 64)

    table = _decode_stringtable(st_buf) if st_buf is not None \
        else np.empty(0, dtype=object)

    chunks: list[_Chunk] = []
    for gbuf in group_bufs:
        nodes = _StructRows("node")
        way_bufs = []
        rel_bufs = []
        dense_chunks = []
        for field_no, wt, value in scan_fields(gbuf):
            if wt != WT_LEN:
                continue  # all PrimitiveGroup fields are messages
            if field_no == 1:
                _parse_plain_node(value, nodes, table, granularity,
                                  lat_offset, lon_offset, date_granularity)
            elif field_no == 2:
                dense_chunks.append(_parse_dense(
                    value, table, granularity, lat_offset, lon_offset,
                    date_granularity))
            elif field_no == 3:
                way_bufs.append(value)
            elif field_no == 4:
                rel_bufs.append(value)
            # field 5 (changesets) is dead in the format; skipped like the
            # reference (src/block.rs never reads it)
        if nodes.ids:
            chunks.append(nodes.finish())
        chunks.extend(dense_chunks)
        if way_bufs:
            chunks.append(_parse_way_group(
                way_bufs, table, granularity, lat_offset, lon_offset,
                date_granularity))
        if rel_bufs:
            chunks.append(_parse_relation_group(
                rel_bufs, table, date_granularity))
    return chunks


# ---------------------------------------------------------------------------
# Chunk list → Arrow RecordBatch
# ---------------------------------------------------------------------------

def _concat_obj(parts, total):
    if not parts:
        return np.empty(0, dtype=object)
    out = np.empty(total, dtype=object)
    i = 0
    for p in parts:
        out[i:i + len(p)] = p
        i += len(p)
    return out


def chunks_to_batch(per_blob: list[tuple[str, int, list[_Chunk]]]) -> pa.RecordBatch:
    """Assemble decoded chunks from many blobs into one Arrow RecordBatch of
    ELEMENT_SCHEMA. ``per_blob`` = [(doc_id, blob_no, chunks)]."""
    etype, ids, lat, lon = [], [], [], []
    tag_off = [np.zeros(1, dtype=np.int64)]
    tag_k, tag_v = [], []
    refs_off = [np.zeros(1, dtype=np.int64)]
    refs_val = []
    loc_off = [np.zeros(1, dtype=np.int64)]
    loc_lat, loc_lon = [], []
    mem_off = [np.zeros(1, dtype=np.int64)]
    mem_roles, mem_ids, mem_types = [], [], []
    version, milli_ts, changeset, uid = [], [], [], []
    user, visible, has_info = [], [], []
    ts_present, chg_present, uid_present = [], [], []
    blob_nos, doc_ids = [], []

    n_total = 0
    for doc_id, blob_no, chunks in per_blob:
        for c in chunks:
            n = len(c.ids)
            if n == 0:
                continue
            n_total += n
            etype.append(np.full(
                n, _ETYPE_CODE[c.element_type], dtype=np.int8))
            ids.append(c.ids)
            if c.lat_nano is not None:
                lat.append(c.lat_nano)
                lon.append(c.lon_nano)
            else:
                a = np.zeros(n, dtype=np.int64)
                lat.append(a)
                lon.append(a)
            _shift_append(tag_off, c.tag_offsets)
            tag_k.extend(c.tag_keys)
            tag_v.extend(c.tag_vals)
            _shift_append(refs_off, c.refs_offsets, n)
            if c.refs_values is not None:
                refs_val.append(c.refs_values)
            _shift_append(loc_off, c.loc_offsets, n)
            if c.loc_lat is not None:
                loc_lat.append(c.loc_lat)
                loc_lon.append(c.loc_lon)
            _shift_append(mem_off, c.mem_offsets, n)
            if c.mem_roles is not None:
                mem_roles.extend(c.mem_roles)
                mem_ids.append(c.mem_ids)
                mem_types.append(c.mem_types)
            if c.has_info is not None:
                has_info.append(c.has_info)
                version.append(c.version)
                milli_ts.append(c.milli_ts)
                changeset.append(c.changeset)
                uid.append(c.uid)
                user.append(c.user)
                visible.append(c.visible)
                ts_present.append(c.ts_mask if c.ts_mask is not None
                                  else c.has_info)
                chg_present.append(c.chg_mask if c.chg_mask is not None
                                   else c.has_info)
                uid_present.append(c.uid_mask if c.uid_mask is not None
                                   else c.has_info)
            else:
                has_info.append(np.zeros(n, dtype=bool))
                z = np.zeros(n, dtype=np.int64)
                zb = np.zeros(n, dtype=bool)
                version.append(z)
                milli_ts.append(z)
                changeset.append(z)
                uid.append(z)
                user.append(np.full(n, None, dtype=object))
                visible.append(np.ones(n, dtype=bool))
                ts_present.append(zb)
                chg_present.append(zb)
                uid_present.append(zb)
            blob_nos.append(np.full(n, blob_no, dtype=np.int64))
            doc_ids.append(np.full(n, doc_id, dtype=object))

    def cat64(parts):
        return (np.concatenate(parts) if parts
                else np.empty(0, dtype=np.int64))

    etype_codes = (np.concatenate(etype) if etype
                   else np.empty(0, dtype=np.int8))
    etype_a = _ETYPE_NAMES[etype_codes]
    ids_a = cat64(ids)
    lat_a = cat64(lat)
    lon_a = cat64(lon)
    is_node = etype_codes == 0

    tag_offsets = np.concatenate(tag_off)
    n_tags = int(tag_offsets[-1]) if len(tag_offsets) else 0
    tags_arr = pa.MapArray.from_arrays(
        pa.array(tag_offsets, type=pa.int32()),
        pa.array(_concat_obj(tag_k, n_tags), type=pa.string()),
        pa.array(_concat_obj(tag_v, n_tags), type=pa.string()))

    refs_offsets = np.concatenate(refs_off)
    refs_arr = pa.ListArray.from_arrays(
        pa.array(refs_offsets, type=pa.int32()),
        pa.array(cat64(refs_val), type=pa.int64()))

    loc_offsets = np.concatenate(loc_off)
    loc_struct = pa.StructArray.from_arrays(
        [pa.array(cat64(loc_lat), type=pa.int64()),
         pa.array(cat64(loc_lon), type=pa.int64())],
        names=["lat_nano", "lon_nano"])
    loc_arr = pa.ListArray.from_arrays(
        pa.array(loc_offsets, type=pa.int32()), loc_struct)

    mem_offsets = np.concatenate(mem_off)
    n_mem = int(mem_offsets[-1]) if len(mem_offsets) else 0
    mem_types_cat = cat64(mem_types)
    mem_struct = pa.StructArray.from_arrays(
        [pa.array(_concat_obj(mem_roles, n_mem), type=pa.string()),
         pa.array(cat64(mem_ids), type=pa.int64()),
         pa.array(MEMBER_TYPE_NAMES[mem_types_cat] if len(mem_types_cat)
                  else np.empty(0, dtype=object), type=pa.string())],
        names=["role", "member_id", "member_type"])
    mem_arr = pa.ListArray.from_arrays(
        pa.array(mem_offsets, type=pa.int32()), mem_struct)

    has_info_a = (np.concatenate(has_info) if has_info
                  else np.empty(0, dtype=bool))
    no_info = ~has_info_a

    def catb(parts):
        return (np.concatenate(parts) if parts
                else np.empty(0, dtype=bool))
    # per-field absence: Info present but field omitted ⇒ NULL, not 0
    no_ts = ~catb(ts_present)
    no_chg = ~catb(chg_present)
    no_uid = ~catb(uid_present)

    def masked(arr, astype, mask):
        return pa.array(arr.astype(astype), mask=mask)

    version_a = cat64(version)
    batch = pa.RecordBatch.from_arrays([
        pa.array(etype_a, type=pa.string()),
        pa.array(ids_a, type=pa.int64()),
        masked(lat_a, np.int64, ~is_node),
        masked(lon_a, np.int64, ~is_node),
        tags_arr,
        refs_arr,
        loc_arr,
        mem_arr,
        masked(version_a, np.int32, no_info),
        masked(cat64(milli_ts), np.int64, no_ts),
        masked(cat64(changeset), np.int64, no_chg),
        masked(cat64(uid), np.int32, no_uid),
        pa.array(_concat_obj(user, n_total), type=pa.string()),
        pa.array(np.concatenate(visible) if visible
                 else np.empty(0, dtype=bool), mask=no_info),
        pa.array(cat64(blob_nos), type=pa.int64()),
        pa.array(_concat_obj(doc_ids, n_total), type=pa.string()),
    ], schema=ELEMENT_SCHEMA)
    return batch


def _shift_append(acc: list[np.ndarray], offsets, n: int | None = None):
    """Append per-chunk offsets to a global offsets accumulator, shifted so
    the concatenated offsets stay monotonically correct."""
    base = acc[-1][-1]
    if offsets is None:
        if n is None:
            raise ValueError("offsets missing without length")
        acc.append(np.full(n, base, dtype=np.int64))
    else:
        acc.append(offsets[1:] + base)


NODE_POINTS_SCHEMA = pa.schema([
    ("id", pa.int64()),
    ("lat_nano", pa.int64()),
    ("lon_nano", pa.int64()),
    ("blob_no", pa.int64()),
    ("doc_id", pa.string()),
])


def parse_block_node_points(buf):
    """Minimal node decode: (ids, lat_nano, lon_nano) only — skips string
    tables, tags, info, ways, relations entirely. The decode-side
    equivalent of column pruning + kind pushdown ("lazy decode",
    src/blob.rs:406-428 spirit): a spatial pipeline that needs only node
    points should not pay for dictionary decoding it will drop."""
    group_bufs = []
    granularity = 100
    lat_offset = 0
    lon_offset = 0
    for field_no, wt, value in scan_fields(buf):
        if field_no == 2 and wt == WT_LEN:
            group_bufs.append(value)
        elif field_no == 17 and wt == WT_VARINT:
            granularity = value
        elif field_no == 19 and wt == WT_VARINT:
            lat_offset = value if value < (1 << 63) else value - (1 << 64)
        elif field_no == 20 and wt == WT_VARINT:
            lon_offset = value if value < (1 << 63) else value - (1 << 64)
    ids, lats, lons = [], [], []
    for gbuf in group_bufs:
        for field_no, wt, value in scan_fields(gbuf):
            if wt != WT_LEN:
                continue
            if field_no == 2:   # DenseNodes
                id_buf = lat_buf = lon_buf = None
                for f2, w2, v2 in scan_fields(value):
                    if w2 != WT_LEN:
                        continue
                    if f2 == 1:
                        id_buf = v2
                    elif f2 == 8:
                        lat_buf = v2
                    elif f2 == 9:
                        lon_buf = v2
                if id_buf is None:
                    continue
                i_arr = decode_packed_sint64_delta(id_buf)
                zeros = np.zeros(len(i_arr), dtype=np.int64)
                ids.append(i_arr)
                lats.append(lat_offset + granularity
                            * (decode_packed_sint64_delta(lat_buf)
                               if lat_buf is not None else zeros))
                lons.append(lon_offset + granularity
                            * (decode_packed_sint64_delta(lon_buf)
                               if lon_buf is not None else zeros))
            elif field_no == 1:  # plain Node
                nid = la = lo = 0
                for f2, w2, v2 in scan_fields(value):
                    if w2 != WT_VARINT:
                        continue
                    if f2 == 1:
                        nid = zigzag_decode(v2)
                    elif f2 == 8:
                        la = zigzag_decode(v2)
                    elif f2 == 9:
                        lo = zigzag_decode(v2)
                ids.append(np.array([nid], dtype=np.int64))
                lats.append(np.array([lat_offset + granularity * la],
                                     dtype=np.int64))
                lons.append(np.array([lon_offset + granularity * lo],
                                     dtype=np.int64))
    if not ids:
        e = np.empty(0, dtype=np.int64)
        return e, e, e
    return (np.concatenate(ids), np.concatenate(lats), np.concatenate(lons))


def decode_node_points_batch(rows) -> pa.RecordBatch:
    """(doc_id, blob_no, blob_type, payload) → minimal node-point batch."""
    ids, lats, lons, blob_nos, doc_ids = [], [], [], [], []
    total = 0
    for doc_id, blob_no, blob_type, payload in rows:
        if blob_type != "OSMData":
            continue
        i, la, lo = parse_block_node_points(decompress_blob(payload))
        if len(i) == 0:
            continue
        ids.append(i)
        lats.append(la)
        lons.append(lo)
        blob_nos.append(np.full(len(i), blob_no, dtype=np.int64))
        doc_ids.append(np.full(len(i), doc_id, dtype=object))
        total += len(i)
    cat = (lambda p: np.concatenate(p) if p else np.empty(0, dtype=np.int64))
    return pa.RecordBatch.from_arrays([
        pa.array(cat(ids), type=pa.int64()),
        pa.array(cat(lats), type=pa.int64()),
        pa.array(cat(lons), type=pa.int64()),
        pa.array(cat(blob_nos), type=pa.int64()),
        pa.array(_concat_obj(doc_ids, total), type=pa.string()),
    ], schema=NODE_POINTS_SCHEMA)


def decode_blob_batch(rows) -> pa.RecordBatch:
    """(doc_id, blob_no, blob_type, payload) iterable → element RecordBatch.

    The per-batch entry point used by the Spark ``mapInArrow`` reader;
    equivalent of the reference's decode in par_map_reduce worker threads
    (src/reader.rs:126-134): decompress → parse → flatten, one blob at a
    time, vectorized within each blob.
    """
    per_blob = []
    for doc_id, blob_no, blob_type, payload in rows:
        if blob_type != "OSMData":
            continue  # OSMHeader/unknown discarded (src/reader.rs:74)
        block = decompress_blob(payload)
        per_blob.append((doc_id, blob_no, parse_primitive_block(block)))
    return chunks_to_batch(per_blob)


# ---------------------------------------------------------------------------
# Raw-access projections (SURVEY.md §2.3 P8/P12/P16)
# ---------------------------------------------------------------------------
# The reference exposes three bit-level debugging views that the normal
# element scan deliberately resolves away:
#   Way::raw_refs        — still-delta-coded refs   (src/elements.rs:219-221)
#   raw_tags             — (key,val) string-table INDEX pairs, unresolved,
#                          nothing skipped           (src/elements.rs:542-564,
#                          src/dense.rs:345-369)
#   raw_stringtable      — the per-block dictionary as raw bytes, NOT
#                          assumed UTF-8              (src/block.rs:148-151)
# These are projections of the same wire bytes the main scan reads, so they
# get their own LEAN parser (the node-points pattern): no string-table
# resolution, no cumsum, no Info decode — a debugging scan should not pay
# for work it exists to bypass.

RAW_ACCESS_SCHEMA = pa.schema([
    ("element_type", pa.string()),
    ("id", pa.int64()),
    ("raw_key_ids", pa.list_(pa.int64())),
    ("raw_val_ids", pa.list_(pa.int64())),
    ("refs_delta", pa.list_(pa.int64())),
    ("blob_no", pa.int64()),
    ("doc_id", pa.string()),
])

STRINGTABLE_SCHEMA = pa.schema([
    ("doc_id", pa.string()),
    ("blob_no", pa.int64()),
    ("sidx", pa.int32()),
    ("value", pa.binary()),
])

_I64_EMPTY = np.empty(0, dtype=np.int64)


def parse_block_raw(buf):
    """PrimitiveBlock → per-chunk raw projections, in the reference's
    emission order (nodes→dense→ways→relations per group, matching
    parse_primitive_block).

    Returns [(element_type, ids, pair_counts, key_ids, val_ids,
    refs_lens, refs_delta)] where refs_lens/refs_delta are None for
    non-way chunks (Way::raw_refs has no analogue on nodes/relations) and
    refs_delta holds the sint64-decoded but NOT yet accumulated deltas —
    exactly the slice raw_refs returns (src/elements.rs:219-221).
    Raw tag pairs are zip-truncated to min(len(keys), len(vals)) like
    RawTagIter (src/elements.rs:549-557); dense pairs walk each node's
    keys_vals slice with no resolution and no skipping
    (src/dense.rs:345-369), sharing _split_kv_id_pairs with the decoded
    path so raw and decoded views segment identically by construction."""
    group_bufs = []
    for field_no, wt, value in scan_fields(buf):
        if field_no == 2 and wt == WT_LEN:
            group_bufs.append(value)

    out = []

    def _tagged_group(etype, bufs, *, id_zigzag, want_refs):
        n = len(bufs)
        ids = np.zeros(n, dtype=np.int64)
        keys_b = [_EMPTY] * n
        vals_b = [_EMPTY] * n
        refs_b = [_EMPTY] * n if want_refs else None
        for i, b in enumerate(bufs):
            for f2, w2, v2 in scan_fields(b):
                if f2 == 1 and w2 == WT_VARINT:
                    # Node.id is sint64 (zigzag); Way/Relation.id is int64
                    ids[i] = zigzag_decode(v2) if id_zigzag else (
                        v2 if v2 < (1 << 63) else v2 - (1 << 64))
                elif w2 != WT_LEN:
                    continue
                elif f2 == 2:
                    keys_b[i] = v2
                elif f2 == 3:
                    vals_b[i] = v2
                elif f2 == 8 and want_refs:
                    refs_b[i] = v2
        kv, kl = decode_packed_u64_segments(keys_b)
        vv, vl = decode_packed_u64_segments(vals_b)
        ksel, vsel, m = _seg_pair_select(kv.astype(np.int64), kl,
                                         vv.astype(np.int64), vl)
        if want_refs:
            rv, rl = decode_packed_u64_segments(refs_b)
            out.append((etype, ids, m, ksel, vsel,
                        rl.astype(np.int64), unzigzag(rv)))
        else:
            out.append((etype, ids, m, ksel, vsel, None, None))

    def _dense_group(dbuf):
        id_buf = kv_buf = None
        for f2, w2, v2 in scan_fields(dbuf):
            if w2 != WT_LEN:
                continue
            if f2 == 1:
                id_buf = v2
            elif f2 == 10:
                kv_buf = v2
        ids = decode_packed_sint64_delta(id_buf) if id_buf is not None \
            else _I64_EMPTY
        kv = decode_packed_int64(kv_buf) if kv_buf is not None \
            else _I64_EMPTY
        pc, kid, vid = _split_kv_id_pairs(kv, len(ids))
        out.append(("node", ids, pc, kid, vid, None, None))

    for gbuf in group_bufs:
        node_bufs, dense_bufs, way_bufs, rel_bufs = [], [], [], []
        for field_no, wt, value in scan_fields(gbuf):
            if wt != WT_LEN:
                continue
            if field_no == 1:
                node_bufs.append(value)
            elif field_no == 2:
                dense_bufs.append(value)
            elif field_no == 3:
                way_bufs.append(value)
            elif field_no == 4:
                rel_bufs.append(value)
        if node_bufs:
            _tagged_group("node", node_bufs, id_zigzag=True,
                          want_refs=False)
        for dbuf in dense_bufs:
            _dense_group(dbuf)
        if way_bufs:
            _tagged_group("way", way_bufs, id_zigzag=False, want_refs=True)
        if rel_bufs:
            _tagged_group("relation", rel_bufs, id_zigzag=False,
                          want_refs=False)
    return out


def parse_block_stringtable(buf) -> list[bytes]:
    """PrimitiveBlock → the per-block dictionary as raw bytes entries
    (raw_stringtable, src/block.rs:148-151: ``&[Vec<u8>]`` — entries are
    NOT assumed UTF-8, so invalid sequences survive here even though the
    decoded-tag path silently skips them)."""
    entries: list[bytes] = []
    for field_no, wt, value in scan_fields(buf):
        if field_no == 1 and wt == WT_LEN:
            for f2, w2, v2 in scan_fields(value):
                if f2 == 1 and w2 == WT_LEN:
                    entries.append(bytes(v2))
    return entries


def _list_array(lens_parts, vals_parts, null_parts=None, n_rows=0):
    """Segment lengths (+ optional per-row null mask) → Arrow list<int64>.

    Null rows are encoded via None offsets (they contribute zero values),
    so the builder stays fully vectorized."""
    lens = (np.concatenate(lens_parts) if lens_parts
            else np.zeros(n_rows, dtype=np.int64))
    vals = np.concatenate(vals_parts) if vals_parts else _I64_EMPTY
    offs = np.concatenate(([np.int64(0)], np.cumsum(lens)))
    if null_parts is None:
        off_arr = pa.array(offs.astype(np.int32), type=pa.int32())
    else:
        isnull = (np.concatenate(null_parts) if null_parts
                  else np.zeros(n_rows, dtype=bool))
        # A null at offset position i marks row i null (rows contribute
        # zero values, so offsets stay monotone); the final offset is
        # never null.  Masked construction keeps this zero-copy.
        off_arr = pa.array(offs.astype(np.int32),
                           mask=np.append(isnull, False))
    return pa.ListArray.from_arrays(off_arr, pa.array(vals,
                                                      type=pa.int64()))


def decode_raw_access_batch(rows) -> pa.RecordBatch:
    """(doc_id, blob_no, blob_type, payload) iterable → raw-access batch
    of RAW_ACCESS_SCHEMA."""
    etypes, ids, blob_nos, doc_ids = [], [], [], []
    tag_lens, key_vals, val_vals = [], [], []
    refs_null, refs_lens, refs_vals = [], [], []
    total = 0
    for doc_id, blob_no, blob_type, payload in rows:
        if blob_type != "OSMData":
            continue
        for (et, eids, pc, kid, vid, rl, rv) in parse_block_raw(
                decompress_blob(payload)):
            n = len(eids)
            if n == 0:
                continue
            total += n
            etypes.append(np.full(n, et, dtype=object))
            ids.append(eids)
            tag_lens.append(pc)
            key_vals.append(kid)
            val_vals.append(vid)
            if rl is None:
                refs_null.append(np.ones(n, dtype=bool))
                refs_lens.append(np.zeros(n, dtype=np.int64))
            else:
                refs_null.append(np.zeros(n, dtype=bool))
                refs_lens.append(rl)
                refs_vals.append(rv)
            blob_nos.append(np.full(n, blob_no, dtype=np.int64))
            doc_ids.append(np.full(n, doc_id, dtype=object))
    cat64 = (lambda p: np.concatenate(p) if p else _I64_EMPTY)
    return pa.RecordBatch.from_arrays([
        pa.array(_concat_obj(etypes, total), type=pa.string()),
        pa.array(cat64(ids), type=pa.int64()),
        _list_array(tag_lens, key_vals, n_rows=total),
        _list_array(tag_lens, val_vals, n_rows=total),
        _list_array(refs_lens, refs_vals, null_parts=refs_null,
                    n_rows=total),
        pa.array(cat64(blob_nos), type=pa.int64()),
        pa.array(_concat_obj(doc_ids, total), type=pa.string()),
    ], schema=RAW_ACCESS_SCHEMA)


def decode_stringtable_batch(rows) -> pa.RecordBatch:
    """(doc_id, blob_no, blob_type, payload) iterable → stringtable batch
    of STRINGTABLE_SCHEMA (one row per dictionary entry, sidx = its
    position — the index raw_tags pairs point into)."""
    doc_ids, blob_nos, sidxs, values = [], [], [], []
    for doc_id, blob_no, blob_type, payload in rows:
        if blob_type != "OSMData":
            continue
        entries = parse_block_stringtable(decompress_blob(payload))
        for i, e in enumerate(entries):
            doc_ids.append(doc_id)
            blob_nos.append(blob_no)
            sidxs.append(i)
            values.append(e)
    return pa.RecordBatch.from_arrays([
        pa.array(doc_ids, type=pa.string()),
        pa.array(blob_nos, type=pa.int64()),
        pa.array(sidxs, type=pa.int32()),
        pa.array(values, type=pa.binary()),
    ], schema=STRINGTABLE_SCHEMA)
