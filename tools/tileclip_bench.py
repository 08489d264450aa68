#!/usr/bin/env python
"""Vector-tile cut bench: cover → clip → quantize → per-tile build at
synthetic scale, with exact area-conservation verification.

Synthesizes R square rings (32 densified vertices each, half-side
~0.11° so every ring spans a 3×3-ish block of zoom-12 tiles) and R
16-vertex polyline walks on a grid over ±55° latitude, then times:

  cut_rings — build_vector_tiles(kind="ring") end-to-end
  cut_lines — build_vector_tiles(kind="line") end-to-end

Correctness guards inside the run (the bench fails loudly, it doesn't
just time): the DECIMAL-shoelace area sum of all clipped parts must
equal the analytic total ring area within float rounding (intersection
vertices round to 1 nano), every quantized pixel must sit in
[-1, extent+1], and tile counts must be positive.

Usage: python tools/tileclip_bench.py [--rings 200000] [--cpus 32]
Scaling evidence: run twice under taskset with --cpus 4 / 16 (the
repo's pinned N→4N protocol, BENCH_SCALING.md).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from osmpbf_spark.operators.multipolygon import ring_area2_sql  # noqa: E402
from osmpbf_spark.operators.tileclip import (  # noqa: E402
    build_vector_tiles,
    clip_to_tiles,
)
from osmpbf_spark.session import get_spark  # noqa: E402

B = 1_000_000_000
ZOOM = 12
EXTENT = 4096


def synth(spark, n: int):
    """n square rings (densified to 32 vertices, 8 per side) and n
    16-vertex diagonal polylines, centered on a √n×√n grid over
    lat/lon −55..55°. Half-side d = 0.11° ≈ 1.25 zoom-12 tile widths."""
    side = int(n**0.5) + 1
    cell = 110 * B // side
    d = 110_000_000  # 0.11° half-side
    base = spark.range(n).select(
        F.col("id").alias("fid"),
        ((F.col("id") % side) * cell + cell // 2 - 55 * B).alias("cy"),
        ((F.col("id") / side).cast("long") * cell + cell // 2 - 55 * B)
        .alias("cx"))
    # perimeter walk: corner k//8 to corner (k//8+1), 8 steps each
    corners = [(-d, -d), (-d, d), (d, d), (d, -d), (-d, -d)]
    cy, cx = [c[0] for c in corners], [c[1] for c in corners]
    ring = ("transform(sequence(0, 32), i -> named_struct("
            "'lat_nano', cy + CAST(element_at(array({ys}), "
            "CAST(i / 8 AS INT) + 1) + (i % 8) / 8.0d * "
            "(element_at(array({ys}), CAST(i / 8 AS INT) + 2) - "
            "element_at(array({ys}), CAST(i / 8 AS INT) + 1)) AS BIGINT), "
            "'lon_nano', cx + CAST(element_at(array({xs}), "
            "CAST(i / 8 AS INT) + 1) + (i % 8) / 8.0d * "
            "(element_at(array({xs}), CAST(i / 8 AS INT) + 2) - "
            "element_at(array({xs}), CAST(i / 8 AS INT) + 1)) AS BIGINT)))"
            ).format(ys=",".join(map(str, cy + cy[:1])),
                     xs=",".join(map(str, cx + cx[:1])))
    # sequence(0,32) walks 4 sides × 8 steps and lands back on corner 0
    # (i=32 → corner index 4 == corner 0): closed by construction
    rings = base.select(F.col("fid").alias("feature_id"),
                        F.expr(ring).alias("ring"))
    line = (f"transform(sequence(0, 15), i -> named_struct("
            f"'lat_nano', cy - {2 * d}L + i * CAST({4 * d}L / 15 AS BIGINT), "
            f"'lon_nano', cx - {2 * d}L + CAST(i * ({4 * d}L / 15) * "
            f"CASE WHEN i % 2 = 0 THEN 1.0d ELSE 0.9d END AS BIGINT)))")
    lines = base.select(F.col("fid").alias("feature_id"),
                        F.expr(line).alias("ring"))
    return rings, lines


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rings", type=int, default=200_000)
    ap.add_argument("--cpus", type=int,
                    default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    ap.add_argument("--skip-area-check", action="store_true",
                    help="skip the clip-only area-conservation pass "
                         "(repeat scaling trials; run it at least once "
                         "per configuration)")
    args = ap.parse_args()

    spark = get_spark("tileclip-bench", master=f"local[{args.cpus}]",
                      shuffle_partitions=max(args.cpus, 32))
    rings, lines = synth(spark, args.rings)
    rings = rings.persist()
    lines = lines.persist()
    n_r, n_l = rings.count(), lines.count()

    # analytic area: every ring is an axis-aligned square of side 2d
    # (the densified edge vertices are collinear with the corners up to
    # the BIGINT casts, which truncate identically on both edges)
    exact = rings.select(
        (F.expr(f"abs({ring_area2_sql('ring')})") / 2).alias("a2"))
    want_area = exact.agg(F.sum("a2")).collect()[0][0]

    t0 = time.time()
    vt = build_vector_tiles(rings, zoom=ZOOM, kind="ring",
                            id_col="feature_id", extent=EXTENT)
    stats = vt.agg(
        F.count("*").alias("tiles"),
        F.sum(F.size("features")).alias("features"),
    ).collect()[0]
    t_ring = time.time() - t0
    assert stats["tiles"] > 0
    # pixel-range + volume verification OUTSIDE the timed region: the
    # nested interpreted aggregate folds over every pixel cost more than
    # the cut itself at scale and anti-scaled the 16-core leg (measured:
    # 518 s @16c vs 402 s @4c WITH them timed; the cut itself scales)
    px = (vt.select(F.explode("features").alias("f"))
          .select(F.explode("f.pixels").alias("p"))
          .agg(F.count("*").alias("pixels"),
               F.min(F.least("p.px", "p.py")).alias("px_min"),
               F.max(F.greatest("p.px", "p.py")).alias("px_max"))
          ).collect()[0]
    assert -1 <= px["px_min"] and px["px_max"] <= EXTENT + 1, px

    # area conservation over the clipped parts (separate pass: the
    # shoelace needs the nano rings, not the quantized pixels)
    t_clip, rel = None, None
    if not args.skip_area_check:
        t0 = time.time()
        clipped = clip_to_tiles(rings, zoom=ZOOM, kind="ring")
        got_area = (clipped
                    .select((F.expr(f"abs({ring_area2_sql('ring')})") / 2)
                            .alias("a2"))
                    .agg(F.sum("a2")).collect()[0][0])
        t_clip = round(time.time() - t0, 2)
        rel = abs(float(got_area) - float(want_area)) / float(want_area)
        assert rel < 1e-6, (got_area, want_area, rel)

    t0 = time.time()
    vtl = build_vector_tiles(lines, zoom=ZOOM, kind="line",
                             id_col="feature_id", extent=EXTENT)
    l_stats = vtl.agg(F.count("*").alias("tiles"),
                      F.sum(F.size("features")).alias("features")
                      ).collect()[0]
    t_line = time.time() - t0
    assert l_stats["tiles"] > 0

    print(json.dumps({
        "rings": n_r, "lines": n_l, "zoom": ZOOM, "cpus": args.cpus,
        "cut_rings_sec": round(t_ring, 2),
        "rings_per_sec": round(n_r / t_ring),
        "ring_vertices_per_sec": round(n_r * 33 / t_ring),
        "tiles": stats["tiles"], "features": stats["features"],
        "out_pixels": px["pixels"],
        "clip_area_check_sec": t_clip,
        "area_rel_err": rel,
        "cut_lines_sec": round(t_line, 2),
        "lines_per_sec": round(n_l / t_line),
        "line_tiles": l_stats["tiles"],
        "line_features": l_stats["features"],
    }))


if __name__ == "__main__":
    main()
