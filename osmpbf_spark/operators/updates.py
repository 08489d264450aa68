"""Incremental element updates — the osmosis-replication analogue.

The reference only CARRIES replication checkpoint metadata
(osmosis_replication_* header fields, /root/reference/src/block.rs:41-86);
applying a diff is left to external tooling. The engine supplies the
operator: merge a batch of new element versions into the element store
with last-writer-wins semantics per (element_type, id), where a version
with visible=false tombstones the element (history semantics,
src/elements.rs:614-626).

At production scale this is an Iceberg MERGE INTO (snapshot-committed,
resumable); the DataFrame formulation below compiles to the same
shuffle-on-key + per-key top-1 plan and is what the MERGE executes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def apply_updates(current: DataFrame, updates: DataFrame, *,
                  keep_history: bool = False) -> DataFrame:
    """Merge ``updates`` (same schema as elements) into ``current``.

    Winner per (element_type, id) = highest (version, milli_timestamp);
    updates win ties (they are newer by provenance). With
    ``keep_history=False`` tombstoned winners (visible=false) are dropped
    (snapshot semantics); with True all versions are kept and only the
    ordering column is added (history table semantics).
    """
    cur = current.withColumn("_src", F.lit(0))
    upd = updates.withColumn("_src", F.lit(1))
    all_rows = cur.unionByName(upd)
    if keep_history:
        return all_rows.drop("_src")
    w = Window.partitionBy("element_type", "id").orderBy(
        F.desc_nulls_last("version"), F.desc_nulls_last("milli_timestamp"),
        F.desc("_src"))
    latest = (all_rows
              .withColumn("_rn", F.row_number().over(w))
              .filter(F.col("_rn") == 1)
              .drop("_rn", "_src"))
    # tombstones: latest version is a delete → element disappears
    return latest.filter(F.col("visible").isNull() | F.col("visible"))


def replication_state(header: DataFrame) -> DataFrame:
    """Expose the replication checkpoint carried by OSMHeader blobs
    (sequence number / timestamp / base url — src/block.rs:59-86): the
    resume cursor an incremental ingest loop persists alongside the
    store snapshot."""
    return header.select(
        "doc_id",
        "osmosis_replication_sequence_number",
        "osmosis_replication_timestamp",
        "osmosis_replication_base_url").where(
        F.col("osmosis_replication_sequence_number").isNotNull()
        | F.col("osmosis_replication_timestamp").isNotNull())
