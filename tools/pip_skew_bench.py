"""Megacity-skew evidence for the salted PIP join (north_rule: "skew
from megacity cells is handled with salted repartitioning and AQE
skew-join splitting").

The broadcast PIP join never shuffles its big side, so Catalyst keeps
the INPUT partitioning — which for a spatially-sorted element store
(exactly what ``write_elements`` / ``repartitionByRange(cell)`` produce)
puts an entire megacity cell into ONE task. Task time is candidate
fan-out × refine cost, so a hot cell covered by many district polygons
concentrates nearly all join work on that task while 31 cores idle.
``pip_join(salt_n=...)`` pays one repartition on (cell, salt) to spread
the hot cell before the broadcast join.

This bench builds that adversarial-but-realistic layout
deterministically (no RNG — coordinates are xxhash64 of the row id):

- N points, 90% inside one res-16 cell ("the megacity"), 10% world-wide;
  written to parquet via repartitionByRange(cell) so the hot cell is one
  input partition (the sorted-store layout).
- K quadrilateral "district" polygons all overlapping the city box plus
  a few rural ones, so every city point is a candidate for all K
  districts.

Measures pip_join plain vs salt_n=32 (alternating, steady-state
best-of-2 inside each trial, median across trials — host drifts), and
gates per-polygon match counts bit-identical between the two modes.

Usage: python tools/pip_skew_bench.py [--points 4000000] [--polys 16]
                                      [--trials 3]
Prints one JSON line; paste the row into BENCH_NEWOPS.md.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import statistics
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from osmpbf_spark.session import get_spark  # noqa: E402
from osmpbf_spark.functions.grid import with_grid_cells  # noqa: E402
from osmpbf_spark.operators.pip import make_polygons, pip_join  # noqa: E402

# one res-16 cell is 360/2^16 ≈ 0.0055° wide; keep the city inside one
CITY_LAT0 = 40_700_000_000        # nano-degrees
CITY_LON0 = -74_000_000_000
CITY_SPREAD = 4_000_000           # 0.004° < one res-16 cell


def build_points(spark, n: int, path: str) -> None:
    """90% of ids in the megacity box, 10% world-wide; coordinates are
    pure column expressions of the id (deterministic, JVM-side)."""
    df = spark.range(n)
    h1 = F.abs(F.xxhash64(F.col("id"), F.lit(1)))
    h2 = F.abs(F.xxhash64(F.col("id"), F.lit(2)))
    city = (F.col("id") % 10) < 9
    lat = F.when(city, F.lit(CITY_LAT0) + h1 % F.lit(CITY_SPREAD)) \
           .otherwise(h1 % F.lit(120_000_000_000) - F.lit(60_000_000_000))
    lon = F.when(city, F.lit(CITY_LON0) + h2 % F.lit(CITY_SPREAD)) \
           .otherwise(h2 % F.lit(360_000_000_000) - F.lit(180_000_000_000))
    pts = with_grid_cells(
        df.select("id", lat.cast("long").alias("lat_nano"),
                  lon.cast("long").alias("lon_nano")))
    # the sorted-store layout: range partitioning puts the hot cell
    # (90% of rows, ONE key) into a single file/input split
    pts.repartitionByRange(64, "cell").write.mode("overwrite").parquet(path)


def build_polygons(spark, k: int):
    """k district quads over the city box + 4 rural quads."""
    rows = []
    for i in range(k):
        # staggered quads, every one covering the whole city box
        pad = 1_000_000 * (i + 1)
        ring = [
            (CITY_LAT0 - pad, CITY_LON0 - pad),
            (CITY_LAT0 - pad, CITY_LON0 + CITY_SPREAD + pad),
            (CITY_LAT0 + CITY_SPREAD + pad, CITY_LON0 + CITY_SPREAD + pad),
            (CITY_LAT0 + CITY_SPREAD + pad, CITY_LON0 - pad),
            (CITY_LAT0 - pad, CITY_LON0 - pad),
        ]
        rows.append((f"district_{i}", ring))
    for i in range(4):
        base_lat = -50_000_000_000 + i * 20_000_000_000
        base_lon = 10_000_000_000 + i * 40_000_000_000
        ring = [
            (base_lat, base_lon),
            (base_lat, base_lon + 2_000_000_000),
            (base_lat + 2_000_000_000, base_lon + 2_000_000_000),
            (base_lat + 2_000_000_000, base_lon),
            (base_lat, base_lon),
        ]
        rows.append((f"rural_{i}", ring))
    return make_polygons(spark, rows)


def mat(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--points", type=int, default=4_000_000)
    ap.add_argument("--polys", type=int, default=16)
    ap.add_argument("--trials", type=int, default=3)
    ap.add_argument("--salt", type=int, default=32)
    args = ap.parse_args()

    spark = get_spark("pip-skew-bench", master="local[32]",
                      shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    tmp = tempfile.mkdtemp(prefix="pip_skew_")
    pts_path = os.path.join(tmp, "points")
    try:
        build_points(spark, args.points, pts_path)
        polys = build_polygons(spark, args.polys)
        pts = spark.read.parquet(pts_path)

        # bit-for-bit gate: per-polygon match counts identical
        plain_counts = {r["poly_id"]: r["n"] for r in
                        pip_join(pts, polys).groupBy("poly_id")
                        .agg(F.count("*").alias("n")).collect()}
        salted_counts = {r["poly_id"]: r["n"] for r in
                         pip_join(pts, polys, salt_n=args.salt)
                         .groupBy("poly_id")
                         .agg(F.count("*").alias("n")).collect()}
        assert plain_counts == salted_counts, (plain_counts, salted_counts)

        results = {"plain": [], "salted": []}
        for _ in range(args.trials):
            for mode in ("plain", "salted"):
                best = float("inf")
                for _ in range(2):            # steady-state best-of-2
                    t0 = time.time()
                    mat(pip_join(pts, polys,
                                 salt_n=args.salt if mode == "salted"
                                 else None))
                    best = min(best, time.time() - t0)
                results[mode].append(round(best, 3))

        out = {
            "metric": "pip_join megacity-skew A/B (sorted-store layout)",
            "points": args.points,
            "city_frac": 0.9,
            "district_polys": args.polys,
            "salt_n": args.salt,
            "matches": sum(plain_counts.values()),
            "plain_sec": statistics.median(results["plain"]),
            "salted_sec": statistics.median(results["salted"]),
            "trials": results,
            "speedup": round(statistics.median(results["plain"])
                             / statistics.median(results["salted"]), 2),
        }
        print(json.dumps(out))
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
