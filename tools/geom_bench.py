#!/usr/bin/env python
"""Geometry-tier scale bench: multipolygon assembly, hole-aware PIP,
and Douglas–Peucker simplification at synthetic scale.

Synthesizes R multipolygon relations (each an 8-way outer ring around a
grid-cell center plus a 1-way square hole; every other member way
direction-reversed so chaining has to work) and P points, then times:

  assemble  — multipolygon_rings over the synthetic elements
  pip       — pip_multipolygon of the P points against the rings
  simplify  — simplify_geometry(eps) over densified 64-vertex rings

Correctness guards inside the run: every assembled ring closed, ring
count == 2R, and the PIP match count equals the analytic expectation
(points are planted inside / inside-hole / outside in a fixed ratio).

Usage: python tools/geom_bench.py [--relations 20000] [--points 1000000]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from osmpbf_spark.functions.grid import with_grid_cells  # noqa: E402
from osmpbf_spark.operators.multipolygon import (  # noqa: E402
    multipolygon_rings,
    pip_multipolygon,
)
from osmpbf_spark.operators.simplify import simplify_geometry  # noqa: E402
from osmpbf_spark.session import get_spark  # noqa: E402

B = 1_000_000_000
MEMBERS_T = ("array<struct<role:string,member_id:long,"
             "member_type:string>>")


def _row(rel, etype, eid, lat, lon, tags, refs, members):
    """One homogeneous element slice with the canonical column names."""
    return rel.select(
        F.lit(etype).alias("element_type"),
        eid.alias("id"),
        (lat if lat is not None else F.lit(None).cast("long"))
        .alias("lat_nano"),
        (lon if lon is not None else F.lit(None).cast("long"))
        .alias("lon_nano"),
        (tags if tags is not None
         else F.lit(None).cast("map<string,string>")).alias("tags"),
        (refs if refs is not None
         else F.lit(None).cast("array<long>")).alias("refs"),
        (members if members is not None
         else F.lit(None).cast(MEMBERS_T)).alias("members"))


def synth_elements(spark, n_rel: int):
    """R relations on a √R×√R grid over lat/lon 0..60°: outer square of
    half-side d = cell/5 as 8 two-vertex ways (every other reversed),
    hole of half-side h = cell/10 as one closed way."""
    side = int(n_rel ** 0.5) + 1
    cell = 60 * B // side
    d, h = cell // 5, cell // 10
    rel = (spark.range(n_rel).select(
        F.col("id").alias("rid"),
        ((F.col("id") % side) * cell + cell // 2).alias("cy"),
        ((F.col("id") / side).cast("long") * cell + cell // 2).alias("cx")))
    outer_pts = [(-d, -d), (-d, 0), (-d, d), (0, d), (d, d), (d, 0),
                 (d, -d), (0, -d)]
    hole_pts = [(-h, -h), (-h, h), (h, h), (h, -h)]
    slices = []
    for k, (dy, dx) in enumerate(outer_pts):
        slices.append(_row(rel, "node", F.col("rid") * 16 + k,
                           F.col("cy") + dy, F.col("cx") + dx,
                           None, None, None))
    for k, (dy, dx) in enumerate(hole_pts):
        slices.append(_row(rel, "node", F.col("rid") * 16 + 12 + k,
                           F.col("cy") + dy, F.col("cx") + dx,
                           None, None, None))
    for k in range(8):
        a = F.col("rid") * 16 + k
        b = F.col("rid") * 16 + (k + 1) % 8
        refs = F.array(b, a) if k % 2 else F.array(a, b)
        slices.append(_row(rel, "way", F.col("rid") * 32 + 100 + k,
                           None, None, None,
                           refs.cast("array<long>"), None))
    hole_refs = F.array(*[F.col("rid") * 16 + 12 + k
                          for k in (0, 1, 2, 3, 0)]).cast("array<long>")
    slices.append(_row(rel, "way", F.col("rid") * 32 + 108,
                       None, None, None, hole_refs, None))
    members = F.array(*(
        [F.struct(F.lit("outer").alias("role"),
                  (F.col("rid") * 32 + 100 + k).alias("member_id"),
                  F.lit("way").alias("member_type")) for k in range(8)]
        + [F.struct(F.lit("inner").alias("role"),
                    (F.col("rid") * 32 + 108).alias("member_id"),
                    F.lit("way").alias("member_type"))])).cast(MEMBERS_T)
    slices.append(_row(rel, "relation", F.col("rid") + 1_000_000_000,
                       None, None,
                       F.create_map(F.lit("type"), F.lit("multipolygon")),
                       None, members))
    el = slices[0]
    for s in slices[1:]:
        el = el.unionByName(s)
    return el, rel, cell, d, h


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--relations", type=int, default=20_000)
    ap.add_argument("--points", type=int, default=1_000_000)
    ap.add_argument("--cpus", type=int,
                    default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    args = ap.parse_args()

    spark = get_spark("geom-bench", master=f"local[{args.cpus}]",
                      shuffle_partitions=max(args.cpus, 32))
    el, rel, cell, d, h = synth_elements(spark, args.relations)
    el = el.persist()
    n_el = el.count()

    t0 = time.time()
    rings = multipolygon_rings(el).persist()
    n_rings = rings.count()
    t_assemble = time.time() - t0
    n_closed = rings.filter("is_closed").count()
    assert n_rings == n_closed == 2 * args.relations, (n_rings, n_closed)

    # points: thirds planted inside-not-hole (above the hole on the
    # center vertical), dead center (in the hole), and at the cell
    # corner (outside every square)
    pts = (spark.range(args.points).select(
        F.col("id"),
        (F.col("id") % args.relations).alias("rid"),
        (F.col("id") % 3).alias("kind"))
        .join(rel.select("rid", "cy", "cx"), "rid")
        .select("id", "kind",
                F.when(F.col("kind") == 0, F.col("cy") + int(d * 0.75))
                .when(F.col("kind") == 1, F.col("cy"))
                .otherwise(F.col("cy") + cell // 2 - 10).alias("lat_nano"),
                F.when(F.col("kind") == 2, F.col("cx") + cell // 2 - 10)
                .otherwise(F.col("cx")).alias("lon_nano")))
    pts = pts.persist()
    pts.count()
    exp_matches = pts.filter("kind = 0").count()

    # match the cover resolution to the polygon size (the engine's
    # normal operating point: cells ≈ polygon extent; res 16 against
    # degree-wide polygons would build a 65k-cell cover per polygon)
    import math
    res = max(4, min(16, int(math.log2(360 * B / (2 * d)))))
    t0 = time.time()
    m = pip_multipolygon(with_grid_cells(pts, res=res), rings,
                         point_keys=["id"], res=res)
    n_match = m.count()
    t_pip = time.time() - t0
    assert n_match == exp_matches, (n_match, exp_matches)

    # simplification throughput: densify each outer ring (9 vertices)
    # to 64 by linear interpolation plus ±37-nano jitter, then DP at
    # eps = 1e6 nano (removes the jitter, keeps the corners)
    dense = rings.filter("role = 'outer'").select(
        "relation_id",
        F.expr("""
          transform(sequence(0, 63), i ->
            named_struct(
              'lat_nano', ring[CAST(i / 8 AS INT)].lat_nano
                + (i % 8) * CAST(
                    (ring[CAST(i / 8 AS INT) + 1].lat_nano
                     - ring[CAST(i / 8 AS INT)].lat_nano) / 8 AS BIGINT)
                + CASE WHEN i % 2 = 1 THEN 37 ELSE -37 END,
              'lon_nano', ring[CAST(i / 8 AS INT)].lon_nano
                + (i % 8) * CAST(
                    (ring[CAST(i / 8 AS INT) + 1].lon_nano
                     - ring[CAST(i / 8 AS INT)].lon_nano) / 8 AS BIGINT)))
        """).alias("dense_ring")).persist()
    n_dense = dense.count()
    t0 = time.time()
    simp = dense.select(
        F.size(simplify_geometry("dense_ring", 1_000_000.0)).alias("n"))
    stats = simp.agg(F.sum("n").alias("kept"),
                     F.count("*").alias("rings")).collect()[0]
    t_simp = time.time() - t0

    print({
        "relations": args.relations, "elements": n_el,
        "rings": n_rings,
        "assemble_sec": round(t_assemble, 2),
        "rings_per_sec": round(n_rings / t_assemble),
        "points": args.points, "pip_matches": n_match,
        "pip_sec": round(t_pip, 2),
        "pip_points_per_sec": round(args.points / t_pip),
        "dense_rings": n_dense,
        "simplify_sec": round(t_simp, 2),
        "vertices_per_sec": round(n_dense * 64 / t_simp),
        "kept_vertices_mean": round(stats["kept"] / stats["rings"], 1),
        "host_load_1m": round(os.getloadavg()[0], 1),
    })


if __name__ == "__main__":
    main()
