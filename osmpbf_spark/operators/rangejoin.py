"""Bucketed interval (range) join: pairs of (value row, interval row)
with ``lo <= value <= hi`` — WITHOUT the BroadcastNestedLoopJoin /
cartesian plan Spark produces for a naive non-equi join.

Not a reference operator (the reference's only range logic is the
id-range pruning mirrored in ``operators/parity.range_included``) — an
engine-supplied extension like §2.6, same trick as the spatial grid
cover but in 1-D: pick a bucket width ``w``, explode each interval
into the buckets it covers (``len/w + 1`` rows), map each value to its
single bucket ``v DIV w``, equi-join on the bucket, refine exactly.
Truncating DIV is monotonic in the dividend (negatives included), so
``lo <= v <= hi`` implies the value's bucket lies inside the
interval's bucket span — no qualifying pair is lost, and because a
value owns exactly ONE bucket no pair duplicates either (no DISTINCT
pass needed).

Design for 100 TB: the equi-join shuffles on the bucket key (or
broadcasts — Catalyst picks when the exploded interval side is small);
the values side never explodes. Interval-side blowup is ``len/w`` rows
per interval, so ``w`` is auto-sized to the p95 interval length (one
tiny aggregate on the interval side) — long-tail giant intervals cost
rows proportional to their own length only, and AQE's skew split
handles a hot bucket. Row-count explosion, the real risk of any range
join, is bounded by output size: each output pair is produced exactly
once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def range_join(values: DataFrame, intervals: DataFrame, *,
               value_col: str, lo_col: str, hi_col: str,
               bucket_width: int | None = None) -> DataFrame:
    """Inner join of every ``values`` row to every ``intervals`` row
    whose ``[lo_col, hi_col]`` (inclusive both ends) contains
    ``value_col``. All columns are integral (cast timestamps to epoch
    seconds first — a fixed offset cancels out of the containment
    test). Returns values columns + interval columns.

    ``bucket_width``: bucket size in value units; default = p95
    interval length (computed with one small aggregate on the interval
    side, never on the big values side), floored at 1.
    """
    clash = set(values.columns) & set(intervals.columns)
    if clash:
        raise ValueError(f"column collision between sides: "
                         f"{sorted(clash)}; rename before joining")
    if "_b" in values.columns or "_b" in intervals.columns:
        # withColumn would silently clobber it and the final drop
        # would delete the caller's data
        raise ValueError("column name '_b' is reserved by range_join; "
                         "rename it before joining")
    if bucket_width is None:
        row = (intervals
               .select(F.expr(f"approx_percentile({hi_col} - {lo_col},"
                              " 0.95)").alias("w")).first())
        bucket_width = max(int(row["w"] or 0), 1)
    w = int(bucket_width)
    if w < 1:
        raise ValueError(f"bucket_width must be >= 1, got {w}")
    # empty intervals (lo > hi) match nothing — drop them BEFORE the
    # explode: Spark's sequence(5, 3) counts DOWN, which would fabricate
    # bucket rows the refine then has to discard
    iv = (intervals
          .filter(F.col(lo_col) <= F.col(hi_col))
          .withColumn(
              "_b", F.explode(F.expr(f"sequence({lo_col} DIV {w}, "
                                     f"{hi_col} DIV {w})"))))
    va = values.withColumn("_b", F.expr(f"{value_col} DIV {w}"))
    return (va.join(iv, "_b")
            .filter((F.col(value_col) >= F.col(lo_col))
                    & (F.col(value_col) <= F.col(hi_col)))
            .drop("_b"))
