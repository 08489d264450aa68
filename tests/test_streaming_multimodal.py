"""Streaming (incremental decode, watermarked windows, checkpoint resume)
and multimodal plumbing tests."""

import os

from pyspark.sql import functions as F

from osmpbf_spark.operators.multimodal import (
    extract_media_features,
    extract_media_metadata,
)
from osmpbf_spark.sources.documents import (
    DOCUMENTS_SCHEMA,
    fileblocks_to_rows,
    make_documents,
)
from osmpbf_spark.sources.fixtures import fixture_fileblocks
from osmpbf_spark.streaming.ops import (
    start_resumable,
    stream_elements,
    windowed_event_counts,
)


def test_stream_elements_incremental(spark, tmp_path):
    doc_rows, media_rows = fileblocks_to_rows(
        "s1", fixture_fileblocks("zlib_dense"))
    docs, media = make_documents(spark, doc_rows, media_rows)
    src = str(tmp_path / "docs_src")
    out = str(tmp_path / "elements_out")
    ckpt = str(tmp_path / "ckpt")
    docs.write.mode("overwrite").parquet(src)

    stream = spark.readStream.schema(DOCUMENTS_SCHEMA).parquet(src)
    el = stream_elements(stream, media)
    q = start_resumable(el, ckpt, out_path=out, trigger_once=True)
    q.awaitTermination(120)
    first = spark.read.parquet(out)
    assert first.count() == 5

    # append a second batch of documents; resume from checkpoint decodes
    # ONLY the new files (incremental, not a re-scan)
    doc_rows2, media_rows2 = fileblocks_to_rows(
        "s2", fixture_fileblocks("history"))
    docs2, media2 = make_documents(spark, doc_rows2, media_rows2)
    docs2.write.mode("append").parquet(src)
    media_all = media.unionByName(media2)
    stream = spark.readStream.schema(DOCUMENTS_SCHEMA).parquet(src)
    q = start_resumable(stream_elements(stream, media_all), ckpt,
                        out_path=out, trigger_once=True)
    q.awaitTermination(120)
    final = spark.read.parquet(out)
    assert final.count() == 7          # +2 history nodes, nothing re-decoded
    assert final.filter("doc_id LIKE 's1%'").count() == 5


def test_windowed_event_counts_batch_parity(spark):
    rows = [("2024-01-01 00:%02d:00" % (i % 60), "click")
            for i in range(30)] + [("2024-01-01 02:15:00", "view")]
    df = spark.createDataFrame(rows, "ts_s string, event_type string") \
        .select(F.col("ts_s").cast("timestamp").alias("ts"), "event_type")
    got = {(str(r["window_start"]), r["event_type"]): r["cnt"]
           for r in windowed_event_counts(df).collect()}
    assert got[("2024-01-01 00:00:00", "click")] == 30
    assert got[("2024-01-01 02:00:00", "view")] == 1


def test_media_metadata_and_features(spark):
    _, media_rows = fileblocks_to_rows("m", fixture_fileblocks("zlib_dense"))
    media = spark.createDataFrame(
        media_rows, "media_ref string, payload binary")
    meta = extract_media_metadata(media).collect()
    assert len(meta) == 2
    assert all(m["n_bytes"] > 0 and len(m["content_digest"]) == 64
               for m in meta)
    feats = extract_media_features(media, dim=16).collect()
    assert all(len(f["feature"]) == 16 for f in feats)
    # deterministic: same payload → same feature
    again = extract_media_features(media, dim=16).collect()
    assert sorted((f["media_ref"], tuple(f["feature"])) for f in feats) == \
        sorted((f["media_ref"], tuple(f["feature"])) for f in again)


def test_stream_pbf_files_incremental(spark, tmp_path):
    # files landing in the watched dir decode incrementally; a second
    # availableNow run with the SAME checkpoint picks up only new files
    import shutil

    from osmpbf_spark.pbf.encode import (
        Node,
        encode_blob,
        encode_primitive_block,
        frame_fileblock,
    )
    from osmpbf_spark.sources.fixtures import fixture_file_bytes
    from osmpbf_spark.streaming.ops import stream_pbf_files
    src = tmp_path / "in"
    src.mkdir()
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    (src / "a.osm.pbf").write_bytes(fixture_file_bytes("zlib_dense"))

    def run_once():
        el = stream_pbf_files(spark, str(src))
        q = (el.writeStream.format("parquet").option("path", out)
             .option("checkpointLocation", ckpt)
             .outputMode("append").trigger(availableNow=True).start())
        q.awaitTermination(300)

    run_once()
    first = spark.read.parquet(out)
    assert first.count() == 5
    ids = {r["id"] for r in first.select("id").collect()}
    assert {105, 106, 107, 108, 120} <= ids
    # a diff file lands; resume processes ONLY it
    diff = frame_fileblock("OSMData", encode_blob(encode_primitive_block(
        [[Node(id=999, lat_raw=123, lon_raw=-456)]], dense=True)))
    (src / "b.osm.pbf").write_bytes(diff)
    run_once()
    second = spark.read.parquet(out)
    assert second.count() == 6
    row = second.filter("id = 999").collect()[0]
    assert row["doc_id"] == "b.osm.pbf#0"
    assert row["lat_nano"] == 12300 and row["lon_nano"] == -45600
    shutil.rmtree(str(src))
