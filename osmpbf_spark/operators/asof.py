"""As-of join: attach to each left row the single most recent right row
at or before (``direction="backward"``) / at or after (``"forward"``)
its timestamp, per key — the point-in-time lookup every event pipeline
needs (DuckDB/Pandas have a native ASOF JOIN; Spark does not).

Not a reference operator — an engine-supplied extension in the spirit
of SURVEY.md §2.6, expressed as a composition of built-ins:

    union(tagged left, tagged right)      one wide dataset
    → window last(_r, ignorenulls=True)   carry-forward per key
    → filter left rows                    each carries its match

Design for 100 TB: exactly ONE shuffle (the window's partition-by-key
sort — the same sort a merge join would need); no range-condition join,
no per-key explosion, no Python in the row path. Right rows ride as a
single struct column, so only matched payloads materialize. Keys are
independent, so key-count parallelism survives any cluster size; a
single pathological hot key is bounded by that key's own row count,
not by the join product (each row carries at most one match).

Determinism: within equal (_ts) the right side sorts before the left
(``_side``), so a right row at exactly the left timestamp IS matched;
equal-timestamp right twins order by the payload struct itself, making
the carried winner a pure function of the data at any parallelism.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(left: DataFrame, right: DataFrame, *,
              on: tuple[str, str] | str,
              left_ts: str, right_ts: str,
              direction: str = "backward",
              how: str = "inner",
              tolerance: str | None = None) -> DataFrame:
    """For each ``left`` row, the latest ``right`` row with
    ``right_ts <= left_ts`` on the same key (``direction="backward"``;
    ``"forward"`` flips both inequalities). Returns the left columns
    plus every right column except the key (right's timestamp column is
    kept — callers often need the match's age).

    ``on``: the key — one name present in both, or a (left, right)
    pair. ``how``: "inner" drops unmatched left rows, "left" keeps them
    with NULL right columns. ``tolerance``: optional SQL interval text
    (e.g. ``"INTERVAL 7 DAY"``) — matches further away than this are
    discarded as if absent.

    Right rows that tie on (key, timestamp) resolve to the greatest
    payload struct (field order = right column order); pre-aggregate
    the right side if you need a different tie rule.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, "
                         f"got {direction!r}")
    if how not in ("inner", "left"):
        raise ValueError(f"how must be inner|left, got {how!r}")
    lkey, rkey = (on, on) if isinstance(on, str) else on
    rpay = [c for c in right.columns if c != rkey]
    clash = set(rpay) & set(left.columns)
    if clash:
        raise ValueError(f"right payload columns collide with left: "
                         f"{sorted(clash)}; rename before joining")
    rstruct = F.struct(*[F.col(c) for c in rpay])
    # SQL match semantics: NULL never equals and NULL never orders — a
    # right row with NULL key/timestamp can match nothing (asc ordering
    # sorts nulls FIRST, so an unfiltered NULL-_ts right row would be
    # carried as a fake "predecessor" for every left row), and a left
    # row with NULL key/timestamp has no match (kept with NULL right
    # columns under how="left" via the untouched _r=NULL).
    lside = left.select(
        F.col(lkey).alias("_k"), F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        F.struct(*[F.col(c) for c in left.columns]).alias("_l"),
        F.lit(None).cast(
            right.select(rstruct.alias("_r")).schema["_r"].dataType
        ).alias("_r"))
    null_left = lside.filter(F.col("_k").isNull()
                             | F.col("_ts").isNull())
    lside = lside.filter(F.col("_k").isNotNull()
                         & F.col("_ts").isNotNull())
    rside = (right
             .filter(F.col(rkey).isNotNull()
                     & F.col(right_ts).isNotNull())
             .select(
                 F.col(rkey).alias("_k"), F.col(right_ts).alias("_ts"),
                 F.lit(0).alias("_side"),
                 F.lit(None).cast(
                     left.select(
                         F.struct(*[F.col(c) for c in left.columns])
                         .alias("_l")).schema["_l"].dataType).alias("_l"),
                 rstruct.alias("_r")))
    ts_order = (F.col("_ts").asc() if direction == "backward"
                else F.col("_ts").desc())
    w = (Window.partitionBy("_k")
         .orderBy(ts_order, F.col("_side").asc(), F.col("_r").asc())
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    picked = (lside.unionByName(rside)
              .withColumn("_m", F.last("_r", ignorenulls=True).over(w))
              .filter(F.col("_side") == 1)
              .unionByName(null_left.withColumn("_m", F.col("_r"))))
    if tolerance is not None:
        gap_ok = (F.expr(f"_ts - _m.{right_ts} <= {tolerance}")
                  if direction == "backward" else
                  F.expr(f"_m.{right_ts} - _ts <= {tolerance}"))
        picked = picked.withColumn(
            "_m", F.when(gap_ok, F.col("_m")))
    if how == "inner":
        picked = picked.filter(F.col("_m").isNotNull())
    return picked.select("_l.*", *[F.col(f"_m.{c}").alias(c)
                                   for c in rpay])
