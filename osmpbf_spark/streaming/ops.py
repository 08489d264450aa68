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
