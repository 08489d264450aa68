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


def test_real_netpbm_and_wav_codecs(spark):
    # REAL pure-numpy decode paths: exact metadata + reproducible
    # features computed the same way locally
    import numpy as np

    from osmpbf_spark.operators.multimodal import (
        decode_netpbm,
        decode_wav,
        encode_netpbm,
        encode_wav,
        resize_nearest,
    )
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (48, 64, 3), dtype=np.uint8)
    ppm = encode_netpbm(img)
    assert (decode_netpbm(ppm) == img).all()
    gray = rng.integers(0, 256, (5, 7, 1), dtype=np.uint8)
    assert (decode_netpbm(encode_netpbm(gray)) == gray).all()
    # comments in the header parse
    commented = b"P5\n# a comment\n7 5\n# more\n255\n" + gray.tobytes()
    assert (decode_netpbm(commented) == gray).all()
    r = resize_nearest(img, 32, 32)
    assert r.shape == (32, 32, 3)

    sr = 8000
    t = np.arange(sr, dtype=np.float64) / sr
    wave = (np.sin(2 * np.pi * 440 * t) * 12000).astype(np.int16)
    samples = np.stack([wave, wave // 2], axis=1)
    wav = encode_wav(samples, sr)
    dec, got_sr = decode_wav(wav)
    assert got_sr == sr and (dec == samples).all()

    media = spark.createDataFrame(
        [("img", bytearray(ppm)), ("snd", bytearray(wav)),
         ("blob", bytearray(b"\x00opaque-bytes"))],
        "media_ref string, payload binary")
    meta = {m["media_ref"]: m for m in
            extract_media_metadata(media).collect()}
    assert meta["img"]["media_type"] == "image/x-portable-pixmap"
    assert (meta["img"]["width"], meta["img"]["height"]) == (64, 48)
    assert meta["snd"]["media_type"] == "audio/wav"
    assert meta["snd"]["sample_rate"] == sr
    assert meta["snd"]["n_channels"] == 2
    assert meta["snd"]["duration_ms"] == 1000
    assert meta["blob"]["media_type"] == "application/octet-stream"
    assert meta["blob"]["width"] is None

    feats = {f["media_ref"]: f for f in
             extract_media_features(media, dim=8).collect()}
    # image feature: a real luminance histogram (sums to 1)
    assert abs(sum(feats["img"]["feature"]) - 1.0) < 1e-5
    # audio: 440 Hz tone -> band 1 of 8 over 0..4000 Hz dominates
    af = feats["snd"]["feature"]
    assert af.index(max(af)) == 0 or af[0] > 0.12
    assert feats["snd"]["n_frames"] == 8  # ceil(8000/1024)


def test_png_decode_all_filters():
    # pure stdlib+numpy PNG: round-trip via our encoder (filter 0), then
    # hand-filter rows with each of the five standard filters and check
    # the decoder unfilters all of them; palette + grayscale too
    import struct
    import zlib

    import numpy as np

    from osmpbf_spark.operators.multimodal import decode_png, encode_png
    rng = np.random.default_rng(8)
    for c in (1, 2, 3, 4):
        img = rng.integers(0, 256, (9, 11, c), dtype=np.uint8)
        assert (decode_png(encode_png(img)) == img).all(), f"channels {c}"

    img = rng.integers(0, 256, (5, 6, 3), dtype=np.uint8)
    h, w, ch = img.shape
    rows = img.reshape(h, w * ch).astype(np.int64)

    def paeth(a, b, cc):
        pp = a + b - cc
        pa, pb, pc = abs(pp - a), abs(pp - b), abs(pp - cc)
        return a if pa <= pb and pa <= pc else (b if pb <= pc else cc)

    raw = bytearray()
    for y, f in enumerate([0, 1, 2, 3, 4]):
        raw.append(f)
        up = rows[y - 1] if y > 0 else np.zeros(w * ch, dtype=np.int64)
        for x in range(w * ch):
            left = rows[y][x - ch] if x >= ch else 0
            ul = up[x - ch] if x >= ch else 0
            pred = {0: 0, 1: left, 2: up[x],
                    3: (left + up[x]) // 2,
                    4: paeth(left, up[x], ul)}[f]
            raw.append(int((rows[y][x] - pred) % 256))

    def chunk(t, body):
        return (struct.pack(">I", len(body)) + t + body
                + struct.pack(">I", zlib.crc32(t + body) & 0xFFFFFFFF))
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    png = (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
           + chunk(b"IDAT", zlib.compress(bytes(raw)))
           + chunk(b"IEND", b""))
    assert (decode_png(png) == img).all()

    # palette (color type 3)
    plte = rng.integers(0, 256, (16, 3), dtype=np.uint8)
    idx = rng.integers(0, 16, (4, 7, 1), dtype=np.uint8)
    ihdr = struct.pack(">IIBBBBB", 7, 4, 8, 3, 0, 0, 0)
    raw = b"".join(b"\x00" + idx[y].tobytes() for y in range(4))
    png = (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
           + chunk(b"PLTE", plte.tobytes())
           + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b""))
    assert (decode_png(png) == plte[idx[:, :, 0]]).all()


def test_stream_sessionize_stateful(spark, tmp_path):
    # applyInPandasWithState gap sessionization: a session finalizes
    # ONLY once the event-time watermark passes last_event+gap (ADVICE
    # r2 — any earlier emission could still be extended/bridged by an
    # in-watermark late event); open sessions stay in bounded per-key
    # state
    from osmpbf_spark.streaming.ops import stream_sessionize
    base = str(tmp_path)
    rows1 = [(1, "2024-01-01 00:00:00"), (1, "2024-01-01 00:10:00"),
             (1, "2024-01-01 01:00:00"), (2, "2024-01-01 00:05:00")]
    (spark.createDataFrame(rows1, "user_id long, ts_s string")
     .select("user_id", F.col("ts_s").cast("timestamp").alias("ts"))
     .write.mode("overwrite").parquet(base + "/in/f1"))
    collected = []

    def run():
        got = []
        st = spark.readStream.schema("user_id long, ts timestamp") \
            .parquet(base + "/in/*")
        q = (stream_sessionize(st, gap_minutes=30).writeStream
             .foreachBatch(lambda b, i: got.extend(
                 (r["user_id"], str(r["session_start"]),
                  str(r["session_end"]), r["n_events"])
                 for r in b.collect()))
             .option("checkpointLocation", base + "/ckpt")
             .outputMode("append").trigger(availableNow=True).start())
        q.awaitTermination(300)
        collected.extend(got)
        return got

    first = run()
    # watermark is still at epoch during the first batch → nothing can
    # finalize yet (watermark-gated emission; closed sessions wait)
    assert first == []
    # a far-future file advances the watermark; all closed sessions emit
    rows2 = [(1, "2024-01-01 03:00:00"), (2, "2024-01-01 03:00:00")]
    (spark.createDataFrame(rows2, "user_id long, ts_s string")
     .select("user_id", F.col("ts_s").cast("timestamp").alias("ts"))
     .write.mode("overwrite").parquet(base + "/in/f2"))
    second = run()
    assert sorted(second) == [
        (1, "2024-01-01 00:00:00", "2024-01-01 00:10:00", 2),
        (1, "2024-01-01 01:00:00", "2024-01-01 01:00:00", 1),
        (2, "2024-01-01 00:05:00", "2024-01-01 00:05:00", 1)]
    # the 03:00 sessions remain open (state, not output)
    assert len(collected) == 3


def test_unsupported_media_variants_profile_not_crash(spark):
    # float WAV / truncated netpbm must yield a metadata row (sniffed
    # type + stand-in dims), never fail the job. (24-bit WAV and every
    # PNG shape are REAL decodes since rounds 4-5 — w24 reports its
    # true fmt fields.)
    import struct

    import numpy as np

    from osmpbf_spark.operators.multimodal import encode_wav
    fmtf = struct.pack("<HHIIHH", 3, 1, 8000, 8000 * 4, 4, 32)
    wavf = (b"RIFF" + struct.pack("<I", 36) + b"WAVEfmt "
            + struct.pack("<I", len(fmtf)) + fmtf
            + b"data" + struct.pack("<I", 8) + b"\x00" * 8)  # float PCM
    trunc_ppm = b"P6\n100 100\n255\n" + b"\x01" * 10   # raster too short
    good = encode_wav(np.zeros((80, 1), dtype=np.int16), 8000)
    wav24 = encode_wav(np.zeros((80, 1), dtype=np.int16), 8000, bits=24)
    media = spark.createDataFrame(
        [("wf", bytearray(wavf)), ("tp", bytearray(trunc_ppm)),
         ("ok", bytearray(good)), ("w24", bytearray(wav24))],
        "media_ref string, payload binary")
    meta = {m["media_ref"]: m for m in
            extract_media_metadata(media).collect()}
    assert meta["wf"]["media_type"] == "audio/wav"
    assert meta["wf"]["sample_rate"] is None    # stand-in path
    assert meta["wf"]["width"] is not None
    assert meta["tp"]["media_type"] == "image/x-portable-pixmap"
    assert meta["ok"]["sample_rate"] == 8000 and \
        meta["ok"]["duration_ms"] == 10
    assert meta["w24"]["sample_rate"] == 8000 and \
        meta["w24"]["duration_ms"] == 10        # REAL since round 4
    feats = extract_media_features(media, dim=4).collect()
    assert len(feats) == 4 and all(len(f["feature"]) == 4 for f in feats)


def test_png_16bit_and_interlaced_decode():
    # round 4: 16-bit (big-endian high byte) and Adam7 interlaced PNGs
    # are REAL decodes that must agree with the plain 8-bit baseline
    import numpy as np

    from osmpbf_spark.operators.multimodal import decode_png, encode_png
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (13, 21, 3), dtype=np.uint8)
    # interlaced == non-interlaced, all filter paths already covered
    assert (decode_png(encode_png(img, interlace=True)) == img).all()
    # odd sizes stress the per-pass geometry (empty passes included)
    for hw in [(1, 1), (2, 3), (7, 5), (8, 8), (9, 16)]:
        g = rng.integers(0, 256, (*hw, 1), dtype=np.uint8)
        assert (decode_png(encode_png(g, interlace=True)) == g).all(), hw
    # 16-bit: high byte comes back exactly
    img16 = rng.integers(0, 65536, (9, 14, 3), dtype=np.uint16)
    assert (decode_png(encode_png(img16)) == (img16 >> 8)).all()
    assert (decode_png(encode_png(img16, interlace=True))
            == (img16 >> 8)).all()
    # depth 1 on an RGB color type is an ILLEGAL combination → raises
    import pytest as _pytest
    low = bytearray(encode_png(img))
    ihdr_at = low.index(b"IHDR")
    low[ihdr_at + 12] = 1                      # bit depth byte
    with _pytest.raises(ValueError):
        decode_png(bytes(low))


def test_png_low_depth_decode():
    # 1/2/4-bit packed rows (masks, small-palette icons) are REAL
    # decodes since round 4: MSB-first unpack, exact gray scaling,
    # palette resolution
    import struct
    import zlib

    import numpy as np

    from osmpbf_spark.operators.multimodal import decode_png

    def chunk(t, body):
        return (struct.pack(">I", len(body)) + t + body
                + struct.pack(">I", zlib.crc32(t + body) & 0xFFFFFFFF))

    def png(w, h, depth, ctype, rows, plte=b""):
        ihdr = struct.pack(">IIBBBBB", w, h, depth, ctype, 0, 0, 0)
        raw = b"".join(b"\x00" + r for r in rows)
        return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
                + (chunk(b"PLTE", plte) if plte else b"")
                + chunk(b"IDAT", zlib.compress(raw))
                + chunk(b"IEND", b""))

    # 1-bit gray, 10 px wide (packed 2 bytes/row, 6 pad bits)
    one = png(10, 2, 1, 0, [b"\xAD\x40", b"\x52\x80"])
    got = decode_png(one)
    assert got.shape == (2, 10, 1)
    exp0 = [int(b) * 255 for b in "1010110101"]
    assert list(got[0, :, 0]) == exp0
    # 2-bit gray: values 0..3 scale by 85
    two = png(3, 1, 2, 0, [bytes([0b00011011])])
    assert list(decode_png(two)[0, :, 0]) == [0, 85, 170]
    # 4-bit palette
    plte = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255])
    four = png(3, 1, 4, 3, [bytes([0x01, 0x20])], plte)
    assert [tuple(v) for v in decode_png(four)[0]] == \
        [(255, 0, 0), (0, 255, 0), (0, 0, 255)]


def test_wav_bit_depths_roundtrip():
    import numpy as np

    from osmpbf_spark.operators.multimodal import (
        decode_wav,
        encode_wav,
        wav_header,
    )
    rng = np.random.default_rng(4)
    s = rng.integers(-32768, 32768, (500, 2)).astype(np.int16)
    for bits in (16, 24, 32):                  # exact round-trips
        wav = encode_wav(s, 8000, bits=bits)
        got, sr = decode_wav(wav)
        assert sr == 8000 and (got == s).all(), bits
        assert wav_header(wav) == (8000, 2, 62)
    got8, _ = decode_wav(encode_wav(s, 8000, bits=8))
    assert (got8 == (s.astype(np.int64) >> 8 << 8)).all()  # top byte


def test_stream_sessionize_late_event_extends_backward(spark, tmp_path):
    # a within-watermark late event BEFORE the stored session start must
    # move session_start back (parity with the batch sessionize)
    from osmpbf_spark.streaming.ops import stream_sessionize
    base = str(tmp_path)

    def write(rows, name):
        (spark.createDataFrame(rows, "user_id long, ts_s string")
         .select("user_id", F.col("ts_s").cast("timestamp").alias("ts"))
         .write.mode("overwrite").parquet(f"{base}/in/{name}"))

    def run():
        got = []
        st = spark.readStream.schema("user_id long, ts timestamp") \
            .parquet(base + "/in/*")
        q = (stream_sessionize(st, gap_minutes=30).writeStream
             .foreachBatch(lambda b, i: got.extend(
                 (r["user_id"], str(r["session_start"]),
                  str(r["session_end"]), r["n_events"])
                 for r in b.collect()))
             .option("checkpointLocation", base + "/ckpt")
             .outputMode("append").trigger(availableNow=True).start())
        q.awaitTermination(300)
        return got

    write([(1, "2024-01-01 01:00:00")], "f1")
    assert run() == []                         # session open in state
    # watermark after f1 = 00:30; a 00:45 late event is within watermark
    # and within the gap of the 01:00 start → extends backward
    write([(1, "2024-01-01 00:45:00")], "f2")
    run()
    write([(1, "2024-01-01 05:00:00")], "f3")  # closes via timeout
    got = run()
    assert (1, "2024-01-01 00:45:00", "2024-01-01 01:00:00", 2) in got


def test_corrupt_media_payloads_profile_not_crash(spark):
    # ADVICE r2: the fallback contract must also absorb zlib.error
    # (corrupt IDAT), ZeroDivisionError (zeroed WAV fmt fields) and
    # IndexError (zero-dimension rasters) — one bad asset must never
    # fail the job
    import struct

    import numpy as np

    from osmpbf_spark.operators.multimodal import encode_png

    good_png = encode_png(np.zeros((4, 4, 3), dtype=np.uint8))
    idat_at = good_png.index(b"IDAT")
    corrupt_idat = (good_png[:idat_at + 4]
                    + b"\xde\xad\xbe\xef" * 4
                    + good_png[idat_at + 20:])          # garbage DEFLATE
    fmt0 = struct.pack("<HHIIHH", 1, 0, 0, 0, 0, 16)    # 0 ch, 0 rate
    wav0 = (b"RIFF" + struct.pack("<I", 36) + b"WAVEfmt "
            + struct.pack("<I", len(fmt0)) + fmt0
            + b"data" + struct.pack("<I", 4) + b"\x00" * 4)
    zero_ppm = b"P6\n0 0\n255\n"                        # 0×0 raster
    media = spark.createDataFrame(
        [("ci", bytearray(corrupt_idat)), ("w0", bytearray(wav0)),
         ("z", bytearray(zero_ppm))],
        "media_ref string, payload binary")
    meta = {m["media_ref"]: m for m in
            extract_media_metadata(media).collect()}
    assert meta["ci"]["media_type"] == "image/png"
    assert meta["w0"]["media_type"] == "audio/wav"
    assert meta["w0"]["sample_rate"] is None            # stand-in path
    assert meta["z"]["width"] is not None               # stand-in dims
    feats = extract_media_features(media, dim=4).collect()
    assert len(feats) == 3 and all(len(f["feature"]) == 4 for f in feats)


def test_stream_sessionize_late_event_bridges_sessions(spark, tmp_path):
    # ADVICE r2 regression: with eager gap-exceeded emission, a session
    # could emit and THEN an in-watermark late event lands within gap of
    # both the emitted end and the next session's start — the three
    # should have been ONE merged session. Watermark-gated finalization
    # must produce exactly one (01:00 → 01:31, n=3).
    from osmpbf_spark.streaming.ops import stream_sessionize
    base = str(tmp_path)

    def write(rows, name):
        (spark.createDataFrame(rows, "user_id long, ts_s string")
         .select("user_id", F.col("ts_s").cast("timestamp").alias("ts"))
         .write.mode("overwrite").parquet(f"{base}/in/{name}"))

    collected = []

    def run():
        got = []
        st = spark.readStream.schema("user_id long, ts timestamp") \
            .parquet(base + "/in/*")
        q = (stream_sessionize(st, gap_minutes=30).writeStream
             .foreachBatch(lambda b, i: got.extend(
                 (r["user_id"], str(r["session_start"]),
                  str(r["session_end"]), r["n_events"])
                 for r in b.collect()))
             .option("checkpointLocation", base + "/ckpt")
             .outputMode("append").trigger(availableNow=True).start())
        q.awaitTermination(300)
        collected.extend(got)
        return got

    write([(1, "2024-01-01 01:00:00")], "f1")
    run()
    # 31 min later: a NEW open session (gap exceeded), but 01:00 must NOT
    # finalize yet — the watermark (01:01 after this file) still admits
    # events that can bridge the two
    write([(1, "2024-01-01 01:31:00")], "f2")
    run()
    # the bridge: within watermark, within gap of both neighbours
    write([(1, "2024-01-01 01:10:00")], "f3")
    run()
    write([(1, "2024-01-01 08:00:00")], "f4")  # watermark → 07:30
    got = run()
    assert (1, "2024-01-01 01:00:00", "2024-01-01 01:31:00", 3) in got
    # exactly one finalized session so far (08:00 still open in state)
    assert collected == [(1, "2024-01-01 01:00:00",
                          "2024-01-01 01:31:00", 3)]


def test_stream_sessionize_boundary_event_at_watermark(spark, tmp_path):
    # code-review r3: an event with ts EXACTLY equal to end+gap (== the
    # watermark) is admitted by Spark's late filter and merges in the
    # batch twin (split only when lag EXCEEDS gap) — finalization must
    # be strict `<` so the session is still open to receive it.
    from osmpbf_spark.streaming.ops import stream_sessionize
    base = str(tmp_path)

    def write(rows, name):
        (spark.createDataFrame(rows, "user_id long, ts_s string")
         .select("user_id", F.col("ts_s").cast("timestamp").alias("ts"))
         .write.mode("overwrite").parquet(f"{base}/in/{name}"))

    collected = []

    def run():
        got = []
        st = spark.readStream.schema("user_id long, ts timestamp") \
            .parquet(base + "/in/*")
        q = (stream_sessionize(st, gap_minutes=30).writeStream
             .foreachBatch(lambda b, i: got.extend(
                 (r["user_id"], str(r["session_start"]),
                  str(r["session_end"]), r["n_events"])
                 for r in b.collect()))
             .option("checkpointLocation", base + "/ckpt")
             .outputMode("append").trigger(availableNow=True).start())
        q.awaitTermination(300)
        collected.extend(got)
        return got

    write([(1, "2024-01-01 01:00:00")], "f1")
    run()
    # another key drives the watermark to exactly 01:30 = 01:00+gap;
    # user 1's session must NOT finalize at wm == end+gap
    write([(2, "2024-01-01 02:00:00")], "f2")
    run()
    write([(1, "2024-01-01 01:45:00")], "f3")
    run()
    write([(1, "2024-01-01 01:30:00")], "f4")   # ts == watermark bridge
    run()
    write([(1, "2024-01-01 09:00:00"), (2, "2024-01-01 09:00:00")], "f5")
    got = run()
    u1 = [g for g in collected if g[0] == 1]
    # if Spark admitted the 01:30 boundary event: ONE bridged session;
    # if its late filter dropped it: two sessions but NEVER an early
    # (01:00,01:00) emission alongside a bridged remainder
    assert u1 == [(1, "2024-01-01 01:00:00", "2024-01-01 01:45:00", 3)] \
        or u1 == [(1, "2024-01-01 01:00:00", "2024-01-01 01:00:00", 1),
                  (1, "2024-01-01 01:45:00", "2024-01-01 01:45:00", 1)], u1


def test_stream_dedup_within_watermark_drops_near_reemits_far(spark, tmp_path):
    # the bounded-state dedup shape: a duplicate inside the watermark
    # horizon is dropped; one arriving after the key's state was
    # evicted re-emits (the documented trade for bounded memory)
    from osmpbf_spark.streaming.ops import stream_dedup
    base = str(tmp_path)

    def write(rows, name):
        (spark.createDataFrame(rows, "k long, ts_s string")
         .select("k", F.col("ts_s").cast("timestamp").alias("ts"))
         .write.mode("overwrite").parquet(f"{base}/in/{name}"))

    collected = []

    def run():
        st = spark.readStream.schema("k long, ts timestamp") \
            .parquet(base + "/in/*")
        q = (stream_dedup(st, ["k"], within_watermark="1 hour")
             .writeStream
             .foreachBatch(lambda b, i: collected.extend(
                 (r["k"], str(r["ts"])) for r in b.collect()))
             .option("checkpointLocation", base + "/ckpt")
             .outputMode("append").trigger(availableNow=True).start())
        q.awaitTermination(300)

    write([(1, "2024-01-01 01:00:00")], "f1")
    run()
    # in-horizon duplicate + a watermark-advancing other key
    write([(1, "2024-01-01 01:20:00"), (2, "2024-01-01 02:00:00")], "f2")
    run()
    # push the watermark far past key 1's state, then replay key 1
    write([(3, "2024-01-01 09:00:00")], "f3")
    run()
    write([(1, "2024-01-01 09:30:00")], "f4")
    run()
    ks = [k for k, _ in collected]
    assert ks.count(2) == 1 and ks.count(3) == 1
    ones = sorted(ts for k, ts in collected if k == 1)
    # first sighting emitted, 01:20 dup dropped, 09:30 re-emitted
    assert ones == ["2024-01-01 01:00:00", "2024-01-01 09:30:00"]


def test_stage_stream_source_repairs_dangling_symlink(spark):
    # code-review r4: a stale/dangling symlink must be repaired, not
    # silently reused — a dangling link makes readStream list zero
    # files and the query "succeed" with an empty result. ADVICE r4:
    # the staging dir itself is now a per-process mkdtemp (0700,
    # unpredictable) cached in _STREAM_STAGE_DIRS, not a fixed /tmp
    # name — seed the cache to exercise the repair path.
    import os
    import stat

    from osmpbf_spark import queries as Q
    sf = "/root/testdata/sf0.001"
    src = os.path.abspath(Q._t(sf, "events"))
    d, schema = Q._stage_stream_source(spark, sf)
    assert Q._STREAM_STAGE_DIRS[src] == d
    mode = stat.S_IMODE(os.stat(d).st_mode)
    assert mode == 0o700, f"staging dir must be private, got {oct(mode)}"
    link = os.path.join(d, "events.parquet")
    os.unlink(link)
    os.symlink("/nonexistent/elsewhere.parquet", link)   # dangling+wrong
    d2, schema = Q._stage_stream_source(spark, sf)
    assert d2 == d          # cached dir reused, link repaired in place
    assert os.readlink(link) == src and os.path.exists(link)
    n = spark.read.schema(schema).parquet(d).count()
    assert n == spark.read.parquet(src).count() and n > 0


def test_png_property_roundtrip():
    # property: any geometry × channels × depth (1/2/4/8/16) × interlace
    # round-trips exactly (≤8-bit, with exact 255/(2^d−1) gray scaling
    # for packed depths) or to the big-endian high byte (16-bit). The
    # packed-low-depth × Adam7 combination was the engine's last codec
    # stand-in, closed in round 5.
    import numpy as np
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from osmpbf_spark.operators.multimodal import decode_png, encode_png

    @settings(max_examples=40, deadline=None)
    @given(h=st.integers(1, 24), w=st.integers(1, 24),
           ch=st.sampled_from([1, 2, 3, 4]),
           depth=st.sampled_from([1, 2, 4, 8, 16]), inter=st.booleans(),
           seed=st.integers(0, 2**31 - 1))
    def case(h, w, ch, depth, inter, seed):
        rng = np.random.default_rng(seed)
        if depth == 16:
            img = rng.integers(0, 65536, (h, w, ch), dtype=np.uint16)
            want = (img >> 8).astype(np.uint8)
            png = encode_png(img, interlace=inter)
        elif depth == 8:
            img = rng.integers(0, 256, (h, w, ch), dtype=np.uint8)
            want = img
            png = encode_png(img, interlace=inter)
        else:                       # packed grayscale rows
            img = rng.integers(0, 1 << depth, (h, w, 1), dtype=np.uint8)
            want = (img * (255 // ((1 << depth) - 1))).astype(np.uint8)
            png = encode_png(img, interlace=inter, depth=depth)
        got = decode_png(png)
        assert got.shape == want.shape and (got == want).all()

    case()


def test_stream_curate_incremental_refresh(spark, tmp_path):
    """stream_curate: two micro-batches of crawled docs deduped against
    the at-rest stores; each batch's survivors refresh the stores BEFORE
    the next batch probes them (a crawl-2 copy of a crawl-1 survivor is
    dropped), and the streamed result equals the batch-mode refresh
    sequence run store-step by store-step."""
    import os
    import time as _time

    import pyarrow as pa
    import pyarrow.parquet as pq

    from osmpbf_spark.sources.store import (
        append_hash_store,
        append_lsh_store,
        dedup_against_store,
        dedup_exact_against_store,
        write_hash_store,
        write_lsh_store,
    )
    from osmpbf_spark.streaming.ops import stream_curate

    def sentence(seed: str) -> str:
        return " ".join(f"{seed}w{i}" for i in range(40))

    base = [(f"b{i}", sentence(f"base{i}")) for i in range(6)]
    crawl1 = [
        ("c100", base[0][1]),                       # exact dup vs store
        ("c101", sentence("base1")[:-1] + "X"),     # near-dup vs store
        ("c102", sentence("uniq1")),                # kept
        ("c103", sentence("pair")),                 # intra-crawl exact…
        ("c104", sentence("pair")),                 # …dup: c103 kept
        ("c105", sentence("uniq2")),                # kept
    ]
    crawl2 = [
        ("c200", sentence("uniq1")),                # dup of a c1 SURVIVOR
        ("c201", sentence("uniq2")[:-1] + "X"),     # near-dup of c105
        ("c202", sentence("uniq3")),                # kept
    ]

    def bootstrap(tag):
        hs = str(tmp_path / f"hash_{tag}")
        ls = str(tmp_path / f"lsh_{tag}")
        docs = spark.createDataFrame(base, "doc_id string, text string")
        write_hash_store(docs, hs, n_buckets=8)
        write_lsh_store(docs, ls, n_subbuckets=4)
        return hs, ls

    # --- streaming run: one file per micro-batch, mtime-ordered
    hs_s, ls_s = bootstrap("stream")
    src = tmp_path / "crawl_src"
    src.mkdir()
    now = _time.time()
    for i, rows in enumerate((crawl1, crawl2)):
        f = str(src / f"crawl{i + 1}.parquet")
        pq.write_table(pa.table({"doc_id": [r[0] for r in rows],
                                 "text": [r[1] for r in rows]}), f)
        os.utime(f, (now + i * 10, now + i * 10))
    stream = (spark.readStream.schema("doc_id string, text string")
              .option("maxFilesPerTrigger", 1).parquet(str(src)))
    out = str(tmp_path / "curated")
    q = stream_curate(stream, hs_s, ls_s, out,
                      str(tmp_path / "ckpt_curate"))
    q.awaitTermination(300)

    epochs = sorted(os.listdir(out))
    streamed = {e: {r["doc_id"] for r in
                    spark.read.parquet(os.path.join(out, e)).collect()}
                for e in epochs if e.startswith("epoch=")}
    got_by_batch = [s for _, s in sorted(streamed.items())]
    assert sorted(set().union(*got_by_batch)) == \
        ["c102", "c103", "c105", "c202"]
    assert got_by_batch == [{"c102", "c103", "c105"}, {"c202"}]

    # --- batch-mode mirror on fresh stores: identical survivors
    hs_b, ls_b = bootstrap("batch")
    for rows, want in ((crawl1, {"c102", "c103", "c105"}),
                       (crawl2, {"c202"})):
        batch = spark.createDataFrame(rows, "doc_id string, text string")
        surv = dedup_exact_against_store(spark, batch, hs_b)
        surv = dedup_against_store(spark, surv, ls_b)
        got = {r["doc_id"] for r in surv.select("doc_id").collect()}
        assert got == want
        append_hash_store(surv, hs_b)
        append_lsh_store(surv, ls_b)
