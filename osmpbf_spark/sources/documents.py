"""Interleaved-documents source: the graft-mandated input shape.

``documents(doc_id:string, spans:array<struct<kind,text,media_ref,offset>>)``
(BASELINE.json ``input_hint``) — one document per OSM PBF fileblock; the
``text`` span carries fileblock metadata as JSON, the ``media`` span carries
a reference into the ``media(media_ref, payload)`` side table (the object
store at production scale). Reading elements is:

    documents → explode media spans → join media payloads → mapInArrow decode

which is the Spark lifecycle equivalent of the reference's
``ElementReader::for_each`` trace (SURVEY.md §3.1): Catalyst prunes the
payload column unless the decode UDF is in the plan, and the ``blob_type``
predicate is pushed to the scan — the analogues of lazy decode and
header-only skip-scan (/root/reference/src/blob.rs:406-428).
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..pbf.decode import ELEMENT_SCHEMA, decode_blob_batch, split_fileblocks

DOCUMENTS_SCHEMA = T.StructType([
    T.StructField("doc_id", T.StringType()),
    T.StructField("spans", T.ArrayType(T.StructType([
        T.StructField("kind", T.StringType()),
        T.StructField("text", T.StringType()),
        T.StructField("media_ref", T.StringType()),
        T.StructField("offset", T.IntegerType()),
    ]))),
])

MEDIA_SCHEMA = T.StructType([
    T.StructField("media_ref", T.StringType()),
    T.StructField("payload", T.BinaryType()),
])

# Spark-side rendering of pbf.decode.ELEMENT_SCHEMA (SURVEY.md §1.3)
ELEMENTS_DDL = (
    "element_type string, id long, lat_nano long, lon_nano long, "
    "tags map<string,string>, refs array<long>, "
    "ref_locations array<struct<lat_nano:long,lon_nano:long>>, "
    "members array<struct<role:string,member_id:long,member_type:string>>, "
    "version int, milli_timestamp long, changeset long, uid int, "
    "user string, visible boolean, blob_no long, doc_id string"
)


def fileblocks_to_rows(name: str, fileblocks) -> tuple[list, list]:
    """[(blob_type, blob_bytes[, offset])] → (document rows, media rows).

    The text span records fileblock metadata (blob_no, blob_type, datasize,
    offset) — the information the reference's header-only skip scan exposes
    (src/blob.rs:406-428) — so metadata queries never touch payload bytes.

    Fileblocks that came from real framed bytes carry their TRUE byte
    offset as a third element (``pbf_bytes_to_rows`` threads it through
    from ``split_fileblocks`` — ADVICE r2: a real-world BlobHeader may
    hold the spec's optional indexdata or non-canonical encoding, so
    re-deriving the offset from a minimal re-encoded header diverges).
    For synthetic 2-tuple fileblocks that never existed as framed bytes,
    the offset is the one ``write_pbf``'s canonical framing would give —
    keeping from_pbf_bytes / from_pbf_path / write_pbf round-trips in
    agreement on the seek-analogue column.
    """
    from ..pbf.encode import len_field, varint_field

    doc_rows = []
    media_rows = []
    offset = 0
    for blob_no, fb in enumerate(fileblocks):
        blob_type, blob_bytes = fb[0], fb[1]
        if len(fb) > 2:          # true offset from real framed bytes
            offset = fb[2]
        doc_id = f"{name}#{blob_no}"
        media_ref = f"media://{doc_id}"
        meta = json.dumps({
            "blob_no": blob_no, "blob_type": blob_type,
            "datasize": len(blob_bytes), "offset": offset,
        }, sort_keys=True)
        spans = [
            ("text", meta, None, 0),
            ("media", None, media_ref, len(meta)),
        ]
        doc_rows.append((doc_id, spans))
        media_rows.append((media_ref, bytearray(blob_bytes)))
        # canonical framed offset for synthetic blocks: 4-byte length
        # prefix + the minimal BlobHeader these (type, datasize) would
        # frame to + the body (overwritten above when a real offset rides
        # the next fileblock)
        header_len = len(len_field(1, blob_type.encode())
                         + varint_field(3, len(blob_bytes)))
        offset += 4 + header_len + len(blob_bytes)
    return doc_rows, media_rows


def pbf_bytes_to_rows(name: str, data: bytes) -> tuple[list, list]:
    """Raw framed *.osm.pbf byte stream → (document rows, media rows);
    offsets are the TRUE byte positions from the frame walk."""
    blocks = [(b["blob_type"], b["blob_bytes"], b["offset"])
              for b in split_fileblocks(data)]
    return fileblocks_to_rows(name, blocks)


def make_documents(spark: SparkSession, doc_rows, media_rows,
                   num_partitions: int | None = None
                   ) -> tuple[DataFrame, DataFrame]:
    docs = spark.createDataFrame(doc_rows, schema=DOCUMENTS_SCHEMA)
    media = spark.createDataFrame(media_rows, schema=MEDIA_SCHEMA)
    if num_partitions:
        docs = docs.repartition(num_partitions, "doc_id")
        media = media.repartition(num_partitions, "media_ref")
    return docs, media


def blob_metadata(documents: DataFrame) -> DataFrame:
    """Header-only scan: fileblock metadata without touching payloads —
    column pruning makes this free (SURVEY.md §2.1 S4)."""
    meta_schema = T.StructType([
        T.StructField("blob_no", T.LongType()),
        T.StructField("blob_type", T.StringType()),
        T.StructField("datasize", T.LongType()),
        T.StructField("offset", T.LongType()),
    ])
    text_span = F.filter("spans", lambda s: s["kind"] == F.lit("text"))[0]
    media_span = F.filter("spans", lambda s: s["kind"] == F.lit("media"))[0]
    meta = F.from_json(text_span["text"], meta_schema)
    return documents.select(
        "doc_id",
        meta["blob_no"].alias("blob_no"),
        meta["blob_type"].alias("blob_type"),
        meta["datasize"].alias("datasize"),
        meta["offset"].alias("offset"),
        media_span["media_ref"].alias("media_ref"),
    )


def join_payloads(meta: DataFrame, media: DataFrame, *,
                  broadcast_media: bool = False,
                  media_join: str = "broadcast_meta",
                  columns=("doc_id", "blob_no", "blob_type", "payload")
                  ) -> DataFrame:
    """Attach payload bytes to blob metadata WITHOUT shuffling payloads.

    The fat ``payload`` column must never cross a shuffle at 100 TB, so the
    default plan broadcasts the narrow metadata side and streams the media
    scan straight into the decode UDF (``media_join='broadcast_meta'``).
    Alternatives: ``broadcast_media=True`` broadcasts the payload side
    (only for tiny fixtures); ``media_join='shuffle'`` is the explicit
    co-partitioned shuffle join for the regime where even the metadata
    side exceeds broadcast limits AND the tables aren't co-bucketed —
    at 10^12-doc scale the right answer is the co-bucketed Iceberg layout
    (proven shuffle-free in tests/test_bucketed_join.py), not this.
    """
    if broadcast_media:
        joined = meta.join(F.broadcast(media), "media_ref")
    elif media_join == "broadcast_meta":
        joined = media.join(F.broadcast(meta), "media_ref")
    elif media_join == "shuffle":
        joined = meta.join(media, "media_ref")
    else:
        raise ValueError(f"unknown media_join: {media_join!r}")
    return joined.select(*columns)


def _spread_for_decode(joined: DataFrame, documents: DataFrame,
                       media: DataFrame, *, broadcast_media: bool,
                       media_join: str,
                       decode_partitions: int | None) -> DataFrame:
    """Apply the caller's ``decode_partitions`` spread — UNLESS the
    join's streaming side already arrives in exactly that many (hash-
    balanced) partitions, in which case the repartition would shuffle
    every payload byte 1:1 for nothing (r6, guide §2.4 "remove shuffles
    outright": the bench feeds ``cpus*2``-partition synth tables into a
    ``decode_partitions=cpus*2`` decode — a pure pass-through Exchange
    carrying the fat payload column). Only the broadcast join shapes
    keep the streaming side's partitioning, so only they can skip."""
    if not decode_partitions:
        return joined
    if media_join == "broadcast_meta" or broadcast_media:
        base = documents if broadcast_media else media
        try:
            if base.rdd.getNumPartitions() == decode_partitions:
                return joined
        except Exception:
            pass
    return joined.repartition(decode_partitions, "blob_no")


def _batch_decoder(decode_fn):
    """mapInArrow generator over (doc_id, blob_no, blob_type, payload)
    batches: skip empties, feed row tuples to ``decode_fn``, yield
    non-empty output batches.  Shared by every blob-decode scan so
    batch-handling fixes land in one place."""
    def batches(iterator):
        for batch in iterator:
            if batch.num_rows == 0:
                continue
            out = decode_fn(zip(
                batch.column("doc_id").to_pylist(),
                batch.column("blob_no").to_pylist(),
                batch.column("blob_type").to_pylist(),
                batch.column("payload").to_pylist(),
            ))
            if out.num_rows:
                yield out
    return batches


def _decode_batches(iterator):
    yield from _batch_decoder(decode_blob_batch)(iterator)


NODE_POINTS_DDL = ("id long, lat_nano long, lon_nano long, blob_no long, "
                   "doc_id string")


def read_node_points(documents: DataFrame, media: DataFrame,
                     *, broadcast_media: bool = False,
                     decode_partitions: int | None = None,
                     media_join: str = "broadcast_meta") -> DataFrame:
    """Pushdown fast path for spatial pipelines: decode ONLY node ids and
    nanodegree coordinates (skips string tables, tags, info, ways,
    relations inside the UDF — column pruning pushed through the Arrow
    boundary, which Catalyst cannot do on its own). ~3-4× less decode
    work and Arrow transfer than the full elements scan when only point
    geometry is needed (PIP, kNN, tiling)."""
    from ..pbf.decode import decode_node_points_batch

    meta = blob_metadata(documents).filter(F.col("blob_type") == "OSMData")
    joined = join_payloads(meta, media, broadcast_media=broadcast_media,
                           media_join=media_join)
    joined = _spread_for_decode(joined, documents, media,
                                broadcast_media=broadcast_media,
                                media_join=media_join,
                                decode_partitions=decode_partitions)

    return joined.mapInArrow(_batch_decoder(decode_node_points_batch),
                             NODE_POINTS_DDL)


RAW_ACCESS_DDL = ("element_type string, id long, raw_key_ids array<long>, "
                  "raw_val_ids array<long>, refs_delta array<long>, "
                  "blob_no long, doc_id string")

STRINGTABLE_DDL = "doc_id string, blob_no long, sidx int, value binary"


def read_elements_raw(documents: DataFrame, media: DataFrame,
                      *, broadcast_media: bool = False,
                      decode_partitions: int | None = None,
                      media_join: str = "broadcast_meta") -> DataFrame:
    """Raw-access projection scan (SURVEY.md §2.3 P8/P12): per element,
    the still-delta-coded way refs (Way::raw_refs,
    src/elements.rs:219-221) and the unresolved string-table (key, val)
    index pairs (raw_tags, src/elements.rs:542-564 /
    src/dense.rs:345-369). ``refs_delta`` is NULL for non-way elements —
    the accessor only exists on ways. Lean decode: skips string tables,
    coordinates, Info, and all cumsum work (the node-points pattern)."""
    from ..pbf.decode import decode_raw_access_batch

    meta = blob_metadata(documents).filter(F.col("blob_type") == "OSMData")
    joined = join_payloads(meta, media, broadcast_media=broadcast_media,
                           media_join=media_join)
    joined = _spread_for_decode(joined, documents, media,
                                broadcast_media=broadcast_media,
                                media_join=media_join,
                                decode_partitions=decode_partitions)

    return joined.mapInArrow(_batch_decoder(decode_raw_access_batch),
                             RAW_ACCESS_DDL)


def read_stringtables(documents: DataFrame, media: DataFrame,
                      *, broadcast_media: bool = False,
                      media_join: str = "broadcast_meta") -> DataFrame:
    """Per-block dictionary scan (SURVEY.md §2.3 P16, raw_stringtable
    src/block.rs:148-151): one row per string-table entry, as raw BYTES
    (entries are not guaranteed UTF-8 — the decoded-tag path silently
    skips invalid entries, this view preserves them). Join key for
    resolving ``read_elements_raw`` index pairs is
    (doc_id, blob_no, sidx)."""
    from ..pbf.decode import decode_stringtable_batch

    meta = blob_metadata(documents).filter(F.col("blob_type") == "OSMData")
    joined = join_payloads(meta, media, broadcast_media=broadcast_media,
                           media_join=media_join)

    return joined.mapInArrow(_batch_decoder(decode_stringtable_batch),
                             STRINGTABLE_DDL)


HEADER_DDL = ("doc_id string, blob_no long, bbox_left double, "
              "bbox_right double, bbox_top double, bbox_bottom double, "
              "required_features array<string>, "
              "optional_features array<string>, writingprogram string, "
              "source string, osmosis_replication_timestamp long, "
              "osmosis_replication_sequence_number long, "
              "osmosis_replication_base_url string")


def read_header(documents: DataFrame, media: DataFrame,
                *, broadcast_media: bool = True) -> DataFrame:
    """OSMHeader blobs → one metadata row per header (HeaderBlock
    accessors, /root/reference/src/block.rs:21-86, incl. the osmosis
    replication checkpoint fields). Tiny result — the engine's ``header``
    table."""
    import pyarrow as pa

    from ..pbf.decode import decompress_blob, parse_header_block

    meta = blob_metadata(documents).filter(F.col("blob_type") == "OSMHeader")
    joined = join_payloads(meta, media, broadcast_media=broadcast_media,
                           columns=("doc_id", "blob_no", "payload"))

    def batches(it):
        for batch in it:
            rows = {k: [] for k in (
                "doc_id", "blob_no", "bbox_left", "bbox_right", "bbox_top",
                "bbox_bottom", "required_features", "optional_features",
                "writingprogram", "source", "osmosis_replication_timestamp",
                "osmosis_replication_sequence_number",
                "osmosis_replication_base_url")}
            for d, b, p in zip(batch.column("doc_id").to_pylist(),
                               batch.column("blob_no").to_pylist(),
                               batch.column("payload").to_pylist()):
                h = parse_header_block(decompress_blob(bytes(p)))
                bb = h["bbox"] or {}
                rows["doc_id"].append(d)
                rows["blob_no"].append(b)
                rows["bbox_left"].append(bb.get("left"))
                rows["bbox_right"].append(bb.get("right"))
                rows["bbox_top"].append(bb.get("top"))
                rows["bbox_bottom"].append(bb.get("bottom"))
                rows["required_features"].append(h["required_features"])
                rows["optional_features"].append(h["optional_features"])
                rows["writingprogram"].append(h["writingprogram"])
                rows["source"].append(h["source"])
                rows["osmosis_replication_timestamp"].append(
                    h["osmosis_replication_timestamp"])
                rows["osmosis_replication_sequence_number"].append(
                    h["osmosis_replication_sequence_number"])
                rows["osmosis_replication_base_url"].append(
                    h["osmosis_replication_base_url"])
            if rows["doc_id"]:
                yield pa.RecordBatch.from_pydict(rows)
    return joined.mapInArrow(batches, HEADER_DDL)


ERRORS_DDL = ("doc_id string, blob_no long, error string")


def read_elements_quarantine(documents: DataFrame, media: DataFrame,
                             *, broadcast_media: bool = False,
                             decode_partitions: int | None = None,
                             media_join: str = "broadcast_meta"
                             ) -> tuple[DataFrame, DataFrame]:
    """Like :func:`read_elements` but corrupt blobs are quarantined to an
    errors DataFrame (with lineage) instead of failing the job — the
    alternative error channel for hostile 100 TB inputs (SURVEY.md §4
    "quarantine bad blobs to an errors table with lineage"). The default
    path stays fail-fast (error-latching semantics of the reference,
    src/blob.rs:266-269).

    Returns (elements, errors). SINGLE-PASS (VERDICT r2 #3 minor): one
    scan yields a union schema (element columns + ``error``); elements
    filter ``error IS NULL``, errors project the non-null rows — so one
    action decodes each blob once, full-batch vectorized (the previous
    shape decoded per-row, twice per blob). Bad blobs are isolated by
    bisection: the whole Arrow batch decodes in one call when clean;
    a failure splits in half recursively (O(log batch) re-decodes per
    bad blob — corrupt blobs are the rare case on any input worth
    quarantining). The two returned frames are separate ACTIONS on the
    shared scan — persist the parent (or write the union once) when
    consuming both.
    """
    import pyarrow as pa

    from ..pbf.decode import ELEMENT_SCHEMA, decode_blob_batch

    meta = blob_metadata(documents).filter(F.col("blob_type") == "OSMData")
    joined = join_payloads(meta, media, broadcast_media=broadcast_media,
                           media_join=media_join)
    joined = _spread_for_decode(joined, documents, media,
                                broadcast_media=broadcast_media,
                                media_join=media_join,
                                decode_partitions=decode_partitions)

    def bisect(rows):
        """yields (record_batch|None, [(doc_id, blob_no, err), ...])"""
        try:
            yield decode_blob_batch(rows), []
            return
        except Exception as e:
            if len(rows) == 1:
                yield None, [(rows[0][0], rows[0][1],
                              f"{type(e).__name__}: {e}")]
                return
        mid = len(rows) // 2
        yield from bisect(rows[:mid])
        yield from bisect(rows[mid:])

    names = [f.name for f in ELEMENT_SCHEMA] + ["error"]

    def union_batches(it):
        for batch in it:
            rows = list(zip(batch.column("doc_id").to_pylist(),
                            batch.column("blob_no").to_pylist(),
                            batch.column("blob_type").to_pylist(),
                            batch.column("payload").to_pylist()))
            if not rows:
                continue
            for out, errs in bisect(rows):
                if out is not None and out.num_rows:
                    yield pa.RecordBatch.from_arrays(
                        [out.column(i) for i in range(out.num_columns)]
                        + [pa.nulls(out.num_rows, pa.string())],
                        names=names)
                if errs:
                    cols = {f.name: pa.nulls(len(errs), f.type)
                            for f in ELEMENT_SCHEMA}
                    cols["doc_id"] = pa.array([e[0] for e in errs],
                                              pa.string())
                    cols["blob_no"] = pa.array([e[1] for e in errs],
                                               pa.int64())
                    cols["error"] = pa.array([e[2] for e in errs],
                                             pa.string())
                    yield pa.RecordBatch.from_arrays(
                        [cols[n] for n in names], names=names)

    union = joined.mapInArrow(union_batches, ELEMENTS_DDL + ", error string")
    elements = with_coordinate_columns(
        union.filter(F.col("error").isNull()).drop("error"))
    errors = (union.filter(F.col("error").isNotNull())
              .select("doc_id", "blob_no", "error"))
    return elements, errors


def read_elements(documents: DataFrame, media: DataFrame,
                  *, broadcast_media: bool = False,
                  decode_partitions: int | None = None,
                  media_join: str = "broadcast_meta") -> DataFrame:
    """The engine's top-level scan (SURVEY.md §2.1 S6): documents+media →
    canonical ``elements`` DataFrame.

    Pipeline: prune to (doc_id, blob metadata, media_ref) → filter
    blob_type='OSMData' BEFORE touching payloads (blob-type pruning,
    src/reader.rs:74) → equi-join payloads on media_ref → vectorized
    ``mapInArrow`` decode (one Arrow batch of blobs in, one batch of
    elements out; no per-row Python) → derived double coordinates as
    Catalyst expressions (doubles derived, never authoritative).

    The default join shape is ``broadcast_meta``: the fat payload column
    never crosses a shuffle (see :func:`join_payloads`); a plan audit
    pins this in tests/test_store_plans.py.
    """
    meta = blob_metadata(documents).filter(F.col("blob_type") == "OSMData")
    joined = join_payloads(meta, media, broadcast_media=broadcast_media,
                           media_join=media_join)
    # spread fat blob rows across workers when the blob count is small
    # relative to the cluster (fixture/bench scale); at production
    # scale (millions of blobs) AQE's size-based coalescing is right
    # and decode_partitions should stay None
    joined = _spread_for_decode(joined, documents, media,
                                broadcast_media=broadcast_media,
                                media_join=media_join,
                                decode_partitions=decode_partitions)
    elements = joined.mapInArrow(_decode_batches, ELEMENTS_DDL)
    return with_coordinate_columns(elements)


def with_coordinate_columns(elements: DataFrame) -> DataFrame:
    """Attach derived coordinate projections (SURVEY.md §2.7):
    deg = 1e-9 * nano (src/elements.rs:84-86); decimicro = nano/100
    truncated toward zero (src/elements.rs:94-96 — SQL ``DIV`` truncates
    toward zero for the same result on negatives)."""
    return (elements
            .withColumn("lat", F.col("lat_nano") * F.lit(1e-9))
            .withColumn("lon", F.col("lon_nano") * F.lit(1e-9))
            .withColumn("decimicro_lat",
                        F.expr("CAST(lat_nano DIV 100 AS INT)"))
            .withColumn("decimicro_lon",
                        F.expr("CAST(lon_nano DIV 100 AS INT)")))


def span_signature(documents: DataFrame) -> DataFrame:
    """Per-row span-sequence signature for the graft invariant
    (BASELINE.json input_hint: span-sequence equality — kind, text,
    media_ref, order). Deterministic sha256 over the ordered span list."""
    ordered = F.array_sort(
        F.transform("spans", lambda s: F.struct(
            s["offset"].alias("offset"), s["kind"].alias("kind"),
            s["text"].alias("text"), s["media_ref"].alias("media_ref"))))
    return documents.select(
        "doc_id",
        F.sha2(F.to_json(ordered), 256).alias("span_sig"))
