#!/usr/bin/env python
"""Douglas–Peucker simplification bench, isolated from the rest of the
geometry tier (tools/geom_bench.py times simplify only after a full
multipolygon assembly, which dominates the wall at A/B sizes).

Synthesizes R closed square rings densified to 64 vertices with ±37
nano jitter — the same shape geom_bench's simplify stage builds from
assembled rings — directly from ``spark.range``, then times
``simplify_geometry(eps=1e6)`` over them.

Correctness guards inside the run (untimed, the bench fails loudly):

- kept-vertex TOTAL must equal 5·R exactly: DP at eps 1e6 over this
  shape keeps the two polyline endpoints + the 3 interior true square
  corners and drops every jittered / collinear midpoint (the 8-point
  corner list includes 4 edge MIDPOINTS, which are collinear),
  deterministically;
- a DECIMAL checksum (SUM of kept lat_nano) is printed so runs at
  different parallelism can be compared for output identity.

Usage: python tools/simplify_bench.py [--rings 600000] [--cpus 32]
Scaling evidence: run twice under taskset with --cpus 4 / 16 (the
repo's pinned N→4N protocol, BENCH_SCALING.md).
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from osmpbf_spark.operators.simplify import simplify_geometry  # noqa: E402
from osmpbf_spark.session import get_spark  # noqa: E402

B = 1_000_000_000

# 8 corners of a square (half-side d) in ring order + closure at [8]
CORNERS = [(-1, -1), (-1, 0), (-1, 1), (0, 1), (1, 1), (1, 0),
           (1, -1), (0, -1), (-1, -1)]


def synth_dense(spark, n_rings: int):
    """R rings on a √R×√R grid over 0..60°, each the 8-corner square
    densified 8× by linear interpolation with ±37 nano jitter (64
    vertices, closed by the final interpolation landing on corner 0)."""
    side = int(n_rings ** 0.5) + 1
    cell = 60 * B // side
    d = cell // 5
    rel = spark.range(n_rings).select(
        F.col("id").alias("rid"),
        ((F.col("id") % side) * cell + cell // 2).alias("cy"),
        ((F.col("id") / side).cast("long") * cell + cell // 2).alias("cx"))
    lat_c = ", ".join(str(dy * d) for dy, _ in CORNERS)
    lon_c = ", ".join(str(dx * d) for _, dx in CORNERS)
    dense = rel.select(
        "rid",
        F.expr(f"""
          transform(sequence(0, 63), i ->
            named_struct(
              'lat_nano', cy + element_at(array({lat_c}), CAST(i / 8 AS INT) + 1)
                + (i % 8) * CAST((element_at(array({lat_c}), CAST(i / 8 AS INT) + 2)
                   - element_at(array({lat_c}), CAST(i / 8 AS INT) + 1)) / 8 AS BIGINT)
                + CASE WHEN i % 2 = 1 THEN 37 ELSE -37 END,
              'lon_nano', cx + element_at(array({lon_c}), CAST(i / 8 AS INT) + 1)
                + (i % 8) * CAST((element_at(array({lon_c}), CAST(i / 8 AS INT) + 2)
                   - element_at(array({lon_c}), CAST(i / 8 AS INT) + 1)) / 8 AS BIGINT)))
        """).alias("dense_ring"))
    return dense


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rings", type=int, default=600_000)
    ap.add_argument("--trials", type=int, default=3)
    ap.add_argument("--cpus", type=int,
                    default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    args = ap.parse_args()

    spark = get_spark("simplify-bench", master=f"local[{args.cpus}]",
                      shuffle_partitions=max(args.cpus, 32))
    dense = synth_dense(spark, args.rings)
    dense = dense.repartition(max(args.cpus * 2, 32)).persist()
    n = dense.count()
    assert n == args.rings

    simp = dense.select(
        simplify_geometry("dense_ring", 1_000_000.0).alias("ring"))
    walls = []
    for t in range(args.trials):
        t0 = time.time()
        kept = simp.agg(F.sum(F.size("ring")).alias("kept")).collect()[0]
        walls.append(time.time() - t0)
        assert kept["kept"] == 5 * args.rings, (kept["kept"], 5 * args.rings)

    # output-identity checksum, untimed: exact DECIMAL sum of kept coords
    chk = simp.select(F.explode("ring").alias("p")).agg(
        F.sum(F.col("p.lat_nano").cast("decimal(38,0)")).alias("s_lat"),
        F.sum(F.col("p.lon_nano").cast("decimal(38,0)")).alias("s_lon"),
    ).collect()[0]

    med = sorted(walls)[len(walls) // 2]
    print({
        "rings": args.rings, "vertices": n * 64, "cpus": args.cpus,
        "walls_sec": [round(w, 2) for w in walls],
        "median_sec": round(med, 2),
        "vertices_per_sec": round(n * 64 / med),
        "checksum": [str(chk["s_lat"]), str(chk["s_lon"])],
        "host_load_1m": round(os.getloadavg()[0], 1),
    })


if __name__ == "__main__":
    main()
