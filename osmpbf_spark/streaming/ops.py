"""Structured Streaming operators.

The reference is batch-only (SURVEY.md §2.8); its osmosis replication
fields are checkpoint metadata for an external incremental process. The
engine supplies the real streaming layer: an incremental element feed
(new documents → decode → elements), watermarked windowed aggregation for
late data, and checkpoint-resume (the Spark-native analogue of the
replication sequence number — BASELINE.json north_rule "resumable from
checkpoint with per-partition lineage").

All operators take/return streaming DataFrames and are exercised in tests
with the file source + a temp checkpoint dir; in production the source is
the documents table's change feed and the sink is the elements table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..sources.documents import ELEMENTS_DDL, _decode_batches, blob_metadata


def stream_elements(doc_stream: DataFrame, media: DataFrame) -> DataFrame:
    """Incremental decode: a stream of documents joined to (static) media
    payloads, decoded with the same vectorized mapInArrow as the batch
    path. Stream-static joins keep this fully incremental."""
    meta = blob_metadata(doc_stream).filter(F.col("blob_type") == "OSMData")
    joined = meta.join(media, "media_ref").select(
        "doc_id", "blob_no", "blob_type", "payload")
    from ..sources.documents import with_coordinate_columns
    return with_coordinate_columns(
        joined.mapInArrow(_decode_batches, ELEMENTS_DDL))


def windowed_event_counts(events: DataFrame, *, window: str = "1 hour",
                          watermark: str = "2 hours",
                          ts_col: str = "ts",
                          key_col: str = "event_type") -> DataFrame:
    """Watermarked tumbling-window counts — late rows beyond the watermark
    are dropped, state is bounded (required for unbounded runs)."""
    return (events
            .withWatermark(ts_col, watermark)
            .groupBy(F.window(ts_col, window).alias("w"), F.col(key_col))
            .agg(F.count("*").alias("cnt"))
            .select(F.col("w.start").alias("window_start"), key_col, "cnt"))


def start_resumable(df: DataFrame, checkpoint_dir: str, *,
                    out_path: str | None = None,
                    fmt: str = "parquet", trigger_once: bool = True,
                    output_mode: str = "append"):
    """Start a checkpointed sink. Re-running after a failure resumes from
    the last committed offsets in ``checkpoint_dir`` — the engine's
    resume contract (Iceberg snapshots at production; parquet+checkpoint
    locally)."""
    w = (df.writeStream
         .option("checkpointLocation", checkpoint_dir)
         .outputMode(output_mode))
    if trigger_once:
        w = w.trigger(availableNow=True)
    if out_path is not None:
        return w.format(fmt).option("path", out_path).start()
    return w.format("noop").start()


def stream_pbf_files(spark, dir_path: str, *,
                     glob: str = "*.osm.pbf") -> DataFrame:
    """Streaming decode of raw framed ``*.osm.pbf`` FILES landing in a
    directory — the minutely-diff ingestion pattern (the reference's
    osmosis replication fields point at exactly this feed,
    src/block.rs:66-86; the engine makes it a live source). Each file is
    one source row (``binaryFile``); frames are split and decoded with
    the same vectorized Arrow batch decoder as the batch path, with
    ``doc_id = <basename>#<blob_no>`` lineage.

    Files here are replication DIFFS (megabytes), not planet dumps —
    one file fits a task comfortably; point :mod:`..sources.ingest` at
    anything bigger.
    """
    import os

    from ..pbf.decode import decode_blob_batch, split_fileblocks
    from ..sources.documents import with_coordinate_columns

    raw = (spark.readStream.format("binaryFile")
           .schema("path string, modificationTime timestamp, "
                   "length long, content binary")
           .option("pathGlobFilter", glob)
           .load(dir_path)
           .select("path", "content"))

    def batches(it):
        for batch in it:
            for path, content in zip(batch.column("path").to_pylist(),
                                     batch.column("content").to_pylist()):
                name = os.path.basename(path)
                rows = [(f"{name}#{b['blob_no']}", b["blob_no"],
                         b["blob_type"], b["blob_bytes"])
                        for b in split_fileblocks(bytes(content))
                        if b["blob_type"] == "OSMData"]
                if rows:
                    out = decode_blob_batch(rows)
                    if out.num_rows:
                        yield out

    from ..sources.documents import ELEMENTS_DDL
    return with_coordinate_columns(raw.mapInArrow(batches, ELEMENTS_DDL))


SESSION_OUT_DDL = ("user_id long, session_start timestamp, "
                   "session_end timestamp, n_events long")
_SESSION_STATE_DDL = "start long, last long, n long"


def stream_sessionize(events: DataFrame, *, gap_minutes: int = 30,
                      ts_col: str = "ts",
                      key_col: str = "user_id") -> DataFrame:
    """Custom STATEFUL streaming operator (applyInPandasWithState):
    gap-based sessionization over an unbounded event stream — the
    streaming twin of the batch ``sessionize`` query. Per-key state is
    (session_start, last_event, n_events) in epoch-millis; a session
    EMITS when a later event arrives past the gap, or when the
    event-time watermark passes last_event+gap (timeout) — so state is
    bounded and late data beyond the watermark cannot reopen a session.
    """
    import pandas as pd

    from pyspark.sql.streaming.state import GroupStateTimeout

    gap_ms = gap_minutes * 60_000

    def fn(key, pdfs, state):
        (uid,) = key
        done = []

        def emit(start, last, n):
            done.append({"user_id": uid,
                         "session_start": pd.Timestamp(start, unit="ms"),
                         "session_end": pd.Timestamp(last, unit="ms"),
                         "n_events": n})
        if state.hasTimedOut:
            start, last, n = state.get
            emit(start, last, n)
            state.remove()
        else:
            ts = []
            for pdf in pdfs:
                ts.extend(int(t.value // 1_000_000)
                          for t in pd.to_datetime(pdf[ts_col]))
            ts.sort()
            start, last, n = state.get if state.exists else (None, None, 0)
            for t in ts:
                if start is None:
                    start, last, n = t, t, 1
                elif t < start:
                    # late-but-within-watermark event BEFORE the stored
                    # session: extend backward if within the gap, else
                    # it is its own earlier session (emit immediately —
                    # anything that could still extend it is already
                    # behind the watermark)
                    if start - t <= gap_ms:
                        start = t
                        n += 1
                    else:
                        emit(t, t, 1)
                elif t - last > gap_ms:
                    emit(start, last, n)
                    start, last, n = t, t, 1
                else:
                    last = max(last, t)
                    n += 1
            if start is not None:
                state.update((start, last, n))
                state.setTimeoutTimestamp(last + gap_ms)
        if done:
            yield pd.DataFrame(done)

    return (events
            .withWatermark(ts_col, f"{gap_minutes} minutes")
            .groupBy(key_col)
            .applyInPandasWithState(fn, SESSION_OUT_DDL,
                                    _SESSION_STATE_DDL, "append",
                                    GroupStateTimeout.EventTimeTimeout))
