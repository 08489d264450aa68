"""Distributed chunked PBF ingest: resync, contiguity gate, parity with
the single-node path, bounded chunk sizes smaller than one frame."""

import pytest
from pyspark.sql import functions as F

from osmpbf_spark.api import Engine
from osmpbf_spark.pbf.decode import split_fileblocks
from osmpbf_spark.pbf.encode import (
    Node,
    encode_blob,
    encode_primitive_block,
    frame_fileblock,
)
from osmpbf_spark.sources.fixtures import fixture_file_bytes
from osmpbf_spark.sources.ingest import pbf_frame_index, read_pbf_documents


def _make_file(tmp_path, *, copies=40, big_block_nodes=60000):
    """Framed PBF: header + many small blocks + one frame much larger
    than the test chunk size (forces ranges wholly inside one frame)."""
    base = fixture_file_bytes("zlib_dense")
    big = frame_fileblock("OSMData", encode_blob(encode_primitive_block(
        [[Node(id=1_000_000 + i, lat_raw=i, lon_raw=-i)
          for i in range(big_block_nodes)]], dense=True), compress=False))
    small = frame_fileblock("OSMData", encode_blob(encode_primitive_block(
        [[Node(id=5_000_000, lat_raw=7, lon_raw=9)]]), compress=True))
    data = base * copies + big + small * 5
    p = tmp_path / "synthetic.osm.pbf"
    p.write_bytes(data)
    return str(p), data


def test_frame_index_matches_split_fileblocks(spark, tmp_path):
    path, data = _make_file(tmp_path)
    want = [(b["offset"], b["blob_type"], b["datasize"])
            for b in split_fileblocks(data)]
    idx = pbf_frame_index(spark, path, chunk_bytes=64 * 1024)
    got = [(off, bt, ds) for off, bt, hs, ds in idx]
    assert got == want
    assert len(got) > 50  # many chunk boundaries were crossed


def test_chunk_smaller_than_one_frame(spark, tmp_path):
    # several ranges fall entirely INSIDE the big frame → those tasks
    # yield nothing, the frame is owned by the range holding its start
    path, data = _make_file(tmp_path, copies=2)
    big_frame = max(b["datasize"] for b in split_fileblocks(data))
    chunk = 32 * 1024
    assert big_frame > 4 * chunk
    idx = pbf_frame_index(spark, path, chunk_bytes=chunk)
    assert [(o, t, d) for o, t, h, d in idx] == \
        [(b["offset"], b["blob_type"], b["datasize"])
         for b in split_fileblocks(data)]


def test_distributed_ingest_decodes_identically(spark, tmp_path):
    path, data = _make_file(tmp_path, copies=6, big_block_nodes=5000)
    eng_d = Engine.from_pbf_path(spark, path, chunk_bytes=48 * 1024)
    eng_b = Engine.from_pbf_bytes(spark, "synthetic.osm.pbf", data)
    a = (eng_d.elements().groupBy("element_type")
         .agg(F.count("*").alias("cnt"),
              F.sum("id").alias("sid"),
              F.sum("lat_nano").alias("slat")).collect())
    b = (eng_b.elements().groupBy("element_type")
         .agg(F.count("*").alias("cnt"),
              F.sum("id").alias("sid"),
              F.sum("lat_nano").alias("slat")).collect())
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    # blob_no AND offset parity: same numbering and the same seek-
    # analogue byte offsets as the single-node walk
    cols = ["blob_no", "blob_type", "datasize", "offset"]
    meta_d = sorted(tuple(r) for r in
                    eng_d.blob_metadata().select(cols).collect())
    meta_b = sorted(tuple(r) for r in
                    eng_b.blob_metadata().select(cols).collect())
    assert meta_d == meta_b


def test_interframe_garbage_fails_contiguity(spark, tmp_path):
    path, data = _make_file(tmp_path, copies=3, big_block_nodes=1000)
    blocks = list(split_fileblocks(data))
    cut = blocks[2]["offset"]
    bad = data[:cut] + b"\x00garbage\xff" + data[cut:]
    p = tmp_path / "garbage.osm.pbf"
    p.write_bytes(bad)
    with pytest.raises(ValueError, match="contiguous"):
        pbf_frame_index(spark, str(p), chunk_bytes=64 * 1024)


def test_truncated_tail_fails(spark, tmp_path):
    path, data = _make_file(tmp_path, copies=2, big_block_nodes=1000)
    p = tmp_path / "trunc.osm.pbf"
    p.write_bytes(data[:-37])
    with pytest.raises(ValueError, match="contiguous|trailing"):
        pbf_frame_index(spark, str(p), chunk_bytes=64 * 1024)


def test_payloads_never_pass_driver_and_never_shuffle(spark, tmp_path):
    path, _ = _make_file(tmp_path, copies=3, big_block_nodes=1000)
    from osmpbf_spark.plans.audit import exchanges_carrying
    from osmpbf_spark.sources.documents import read_elements
    docs, media = read_pbf_documents(spark, path, chunk_bytes=64 * 1024)
    el = read_elements(docs, media)
    assert exchanges_carrying(el, "payload") == []
    assert el.filter("element_type = 'node'").count() > 0


def test_unknown_blob_types_index_and_skip(spark, tmp_path):
    # spec-legal unknown blob types must INDEX (contiguity holds) and be
    # dropped at decode, matching the reference's BlobType::Unknown
    # (src/blob.rs:22-29) — not fail the frame scan
    base = fixture_file_bytes("zlib_dense")
    unknown = frame_fileblock("FancyFutureType", b"\x7f" * 333)
    p = tmp_path / "mixed.osm.pbf"
    p.write_bytes(base + unknown + base)
    idx = pbf_frame_index(spark, str(p), chunk_bytes=256)
    assert [t for _, t, _, _ in idx] == \
        ["OSMHeader", "OSMData", "FancyFutureType", "OSMHeader", "OSMData"]
    eng = Engine.from_pbf_path(spark, str(p), chunk_bytes=256)
    counts = {r[0]: r[1] for r in eng.elements()
              .groupBy("element_type").count().collect()}
    assert counts == {"node": 6, "way": 2, "relation": 2}


def test_embedded_fake_frames_are_cleaned(spark, tmp_path):
    # an UNCOMPRESSED blob whose body embeds a valid chained frame pair:
    # a chunk boundary inside that body makes the scanner sync onto the
    # fake; the driver's cleanup must drop it (it lies inside the real
    # frame's extent) and keep the true tiling
    inner = frame_fileblock("OSMData", encode_blob(encode_primitive_block(
        [[Node(id=7, lat_raw=1, lon_raw=1)]]), compress=True)) * 2
    # raw Blob message of an UNKNOWN type carrying the nested frames
    # verbatim (decode skips unknown types; framing must not false-sync)
    from osmpbf_spark.pbf.wire import len_field
    carrier = frame_fileblock("BinaryAttachment", len_field(1, inner))
    base = fixture_file_bytes("zlib_dense")
    data = base + carrier + base
    p = tmp_path / "embedded.osm.pbf"
    p.write_bytes(data)
    # chunk size small enough that several boundaries land inside carrier
    idx = pbf_frame_index(spark, str(p), chunk_bytes=64)
    assert [(o, t, d) for o, t, h, d in idx] == \
        [(b["offset"], b["blob_type"], b["datasize"])
         for b in split_fileblocks(data)]
    # and the file decodes end-to-end (carrier dropped at decode)
    eng = Engine.from_pbf_path(spark, str(p), chunk_bytes=64)
    counts = {r[0]: r[1] for r in eng.elements()
              .groupBy("element_type").count().collect()}
    assert counts == {"node": 6, "way": 2, "relation": 2}


def test_frame_scan_property_random_framings():
    # pure-python property test: ANY frame sequence + ANY chunking must
    # reproduce the whole-file walk after index cleanup
    import random as _random

    from osmpbf_spark.pbf.decode import scan_chunk_frames
    from osmpbf_spark.pbf.encode import frame_fileblock
    from osmpbf_spark.sources.ingest import validate_frame_index
    rng = _random.Random(123)
    for trial in range(25):
        frames = []
        for _ in range(rng.randrange(1, 12)):
            t = rng.choice(["OSMData", "OSMHeader", "Weird.Type-9"])
            body = bytes(rng.randrange(256)
                         for _ in range(rng.randrange(0, 300)))
            frames.append(frame_fileblock(t, body))
        data = b"".join(frames)
        want = []
        pos = 0
        for f in frames:
            want.append(pos)
            pos += len(f)
        chunk = rng.randrange(7, max(8, len(data)))
        rows = []
        for s in range(0, len(data), chunk):
            rows.extend(scan_chunk_frames(data, s,
                                          min(s + chunk, len(data))))
        got = validate_frame_index(rows, len(data))
        assert [o for o, *_ in got] == want, f"trial {trial}"


def test_frame_index_df_no_collect_matches_driver_path(spark, tmp_path):
    # VERDICT r2 #4: the distributed-validation index (no per-blob
    # driver collect) must equal the collect path row-for-row, across
    # many chunk boundaries AND chunks wholly inside one frame
    from osmpbf_spark.sources.ingest import pbf_frame_index_df
    path, data = _make_file(tmp_path, copies=8)
    chunk = 32 * 1024
    want = pbf_frame_index(spark, path, chunk_bytes=chunk)
    got = [(r["offset"], r["blob_type"], r["header_size"], r["datasize"])
           for r in pbf_frame_index_df(spark, path, chunk_bytes=chunk)
           .orderBy("blob_no").collect()]
    assert got == want
    # blob_no numbering matches split_fileblocks
    nos = [r["blob_no"] for r in
           pbf_frame_index_df(spark, path, chunk_bytes=chunk)
           .orderBy("offset").collect()]
    assert nos == list(range(len(want)))


def test_frame_index_df_fails_on_garbage_and_truncation(spark, tmp_path):
    from osmpbf_spark.sources.ingest import pbf_frame_index_df
    base = fixture_file_bytes("zlib_dense")
    p = tmp_path / "garbage.osm.pbf"
    p.write_bytes(base + b"\x00GARBAGE\x00" * 3 + base)
    with pytest.raises(ValueError, match="contiguous|trailing"):
        pbf_frame_index_df(spark, str(p), chunk_bytes=64).count()
    p2 = tmp_path / "trunc.osm.pbf"
    p2.write_bytes(base[:-5])
    with pytest.raises(ValueError, match="contiguous|trailing"):
        pbf_frame_index_df(spark, str(p2), chunk_bytes=64).count()


def test_read_pbf_documents_distributed_equals_driver_path(spark, tmp_path):
    # forced tiny chunk ceiling: the driver_index=False path must build
    # byte-identical documents + media tables (span text included)
    path, data = _make_file(tmp_path, copies=3, big_block_nodes=2000)
    d1, m1 = read_pbf_documents(spark, path, chunk_bytes=32 * 1024,
                                driver_index=True)
    d2, m2 = read_pbf_documents(spark, path, chunk_bytes=32 * 1024,
                                driver_index=False)
    rows1 = sorted((r["doc_id"], str(r["spans"])) for r in d1.collect())
    rows2 = sorted((r["doc_id"], str(r["spans"])) for r in d2.collect())
    assert rows1 == rows2
    pay1 = sorted((r["media_ref"], bytes(r["payload"]))
                  for r in m1.collect())
    pay2 = sorted((r["media_ref"], bytes(r["payload"]))
                  for r in m2.collect())
    assert pay1 == pay2
    # and the decoded elements agree end-to-end
    from osmpbf_spark.sources.documents import read_elements
    c1 = read_elements(d1, m1).count()
    c2 = read_elements(d2, m2).count()
    assert c1 == c2 > 0


def test_frame_index_df_embedded_fake_cleanup(spark, tmp_path):
    # same embedded-fake fixture as the collect path: a blob body that
    # contains valid-looking frames must not corrupt the index
    from osmpbf_spark.sources.ingest import pbf_frame_index_df
    inner = fixture_file_bytes("zlib_dense")
    carrier = frame_fileblock("RawPBF", encode_blob(inner, compress=False))
    data = fixture_file_bytes("zlib_dense") + carrier \
        + fixture_file_bytes("zlib_dense")
    p = tmp_path / "nested.osm.pbf"
    p.write_bytes(data)
    want = [(b["offset"], b["blob_type"], b["datasize"])
            for b in split_fileblocks(data)]
    got = [(r["offset"], r["blob_type"], r["datasize"])
           for r in pbf_frame_index_df(spark, str(p), chunk_bytes=64)
           .orderBy("offset").collect()]
    assert got == want
