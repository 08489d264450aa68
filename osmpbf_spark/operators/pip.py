"""Point-in-polygon join: cell-cover prefilter + exact integer refine.

The graft's PIP operator (BASELINE.json north_star) — no reference
counterpart (the reference has only the way→node semi-join,
/root/reference/src/indexed.rs:264-330); built per SURVEY.md §2.4 J-row
"engine supplies":

  1. cover: each polygon's bbox is expanded to the set of grid cells it
     touches (sequence-explode, distributed; tiny result → broadcast),
  2. prefilter: points equi-join cover on cell — a broadcast hash join,
     no shuffle of the big side,
  3. refine: exact even-odd ray cast evaluated as a Catalyst ``aggregate``
     higher-order expression over ring edges with DECIMAL(38) cross
     products — exact integer geometry, whole-stage codegen, zero Python.

Determinism: integer nanodegree inputs + exact decimal arithmetic ⇒ the
join output rows are bit-for-bit reproducible at any parallelism (the
"matching join output rows" gate). Boundary points follow the half-open
even-odd rule (an edge counts iff it strictly crosses the horizontal ray;
points exactly on a horizontal edge are outside).

Skew: megacity cells concentrate candidates; ``pip_join`` accepts
``salt_n`` to spread a hot cell across partitions (plus AQE skew-join
splitting from the session config).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.grid import GRID_RES_FINE, grid_xy_sql

POLYGONS_DDL = ("poly_id string, "
                "ring array<struct<lat_nano:bigint,lon_nano:bigint>>")


def make_polygons(spark, rows) -> DataFrame:
    """rows: [(poly_id, [(lat_nano, lon_nano), ...])] — ring must be closed
    (first == last vertex)."""
    data = []
    for poly_id, ring in rows:
        if ring[0] != ring[-1]:
            raise ValueError(f"ring of {poly_id} is not closed")
        data.append((poly_id, [{"lat_nano": a, "lon_nano": b}
                               for a, b in ring]))
    return spark.createDataFrame(data, POLYGONS_DDL)


def polygon_cover(polygons: DataFrame, res: int = GRID_RES_FINE) -> DataFrame:
    """(cell, poly_id) for every grid cell whose bbox-row/col range
    intersects the polygon's bbox. Runs distributed via sequence-explode;
    result is small (cells-per-polygon) and meant for broadcast."""
    n = 1 << res
    x_expr, y_expr = grid_xy_sql("b.lat_nano", "b.lon_nano", res, "spark")
    bounds = polygons.select(
        "poly_id",
        F.expr("aggregate(ring, struct(CAST(9223372036854775807 AS BIGINT) "
               "AS min_lat, CAST(-9223372036854775808 AS BIGINT) AS max_lat, "
               "CAST(9223372036854775807 AS BIGINT) AS min_lon, "
               "CAST(-9223372036854775808 AS BIGINT) AS max_lon), "
               "(acc, v) -> struct(LEAST(acc.min_lat, v.lat_nano), "
               "GREATEST(acc.max_lat, v.lat_nano), "
               "LEAST(acc.min_lon, v.lon_nano), "
               "GREATEST(acc.max_lon, v.lon_nano)))").alias("b"))
    # bbox corner cells (x can wrap only for antimeridian-crossing polygons,
    # which this cover does not support — documented limitation)
    xy = bounds.select(
        "poly_id",
        F.expr(grid_xy_sql("b.min_lat", "b.min_lon", res, "spark")[0])
        .alias("x0"),
        F.expr(grid_xy_sql("b.max_lat", "b.max_lon", res, "spark")[0])
        .alias("x1"),
        F.expr(grid_xy_sql("b.min_lat", "b.min_lon", res, "spark")[1])
        .alias("y0"),
        F.expr(grid_xy_sql("b.max_lat", "b.max_lon", res, "spark")[1])
        .alias("y1"))
    from ..functions.grid import RES_SHIFT, Y_SHIFT
    return (xy
            .select("poly_id",
                    F.explode(F.expr("sequence(x0, x1)")).alias("cx"),
                    F.col("y0"), F.col("y1"))
            .select("poly_id", "cx",
                    F.explode(F.expr("sequence(y0, y1)")).alias("cy"))
            .select("poly_id",
                    (F.lit(res).cast("long") * F.lit(RES_SHIFT)
                     + F.col("cx") * F.lit(Y_SHIFT)
                     + F.col("cy")).alias("cell")))


# Exact even-odd ray cast as a Catalyst expression. px/py are point
# lon/lat nanodegrees; ring is array<struct<lat_nano,lon_nano>>.
# Cross product in DECIMAL(38,0): |values| < 4e11, products < 1.6e23 —
# exact within 38 digits.
_RAY_CAST = """
(
  aggregate(
    sequence(1, size(ring) - 1),
    0L,
    (acc, i) -> acc + IF(
      (element_at(ring, i).lat_nano >  {py}) !=
      (element_at(ring, i + 1).lat_nano > {py})
      AND (
        CASE WHEN element_at(ring, i + 1).lat_nano >
                  element_at(ring, i).lat_nano
        THEN (CAST({px} - element_at(ring, i).lon_nano AS DECIMAL(38,0)) *
              CAST(element_at(ring, i + 1).lat_nano -
                   element_at(ring, i).lat_nano AS DECIMAL(38,0)))
           < (CAST(element_at(ring, i + 1).lon_nano -
                   element_at(ring, i).lon_nano AS DECIMAL(38,0)) *
              CAST({py} - element_at(ring, i).lat_nano AS DECIMAL(38,0)))
        ELSE (CAST({px} - element_at(ring, i).lon_nano AS DECIMAL(38,0)) *
              CAST(element_at(ring, i + 1).lat_nano -
                   element_at(ring, i).lat_nano AS DECIMAL(38,0)))
           > (CAST(element_at(ring, i + 1).lon_nano -
                   element_at(ring, i).lon_nano AS DECIMAL(38,0)) *
              CAST({py} - element_at(ring, i).lat_nano AS DECIMAL(38,0)))
        END
      ), 1L, 0L)
  ) % 2 = 1
)
"""


def point_in_ring_expr(px: str, py: str):
    """Exact even-odd test of point (lon=px, lat=py) against column
    ``ring`` — usable anywhere a boolean Catalyst expression fits."""
    return F.expr(_RAY_CAST.format(px=px, py=py))


def pip_join(points: DataFrame, polygons: DataFrame, *,
             res: int = GRID_RES_FINE, cell_col: str = "cell",
             salt_n: int | None = None) -> DataFrame:
    """points (with ``cell``, ``lat_nano``, ``lon_nano``) ⋈ polygons →
    rows of points inside each polygon (point columns + poly_id).

    Plan shape at scale: big-side scan → broadcast hash join on cell →
    broadcast hash join on poly_id (ring fetch) → codegen'd refine filter.
    The big side never shuffles. ``salt_n`` spreads hot cells before the
    join when a megacity cell dominates (north_rule skew handling).
    """
    cover = polygon_cover(polygons, res)
    pts = points
    if salt_n:
        from ..functions.grid import salted_repartition
        pts = salted_repartition(pts, cell_col, salt_n)
    cand = pts.join(F.broadcast(cover),
                    pts[cell_col] == cover["cell"]).drop(cover["cell"])
    withring = cand.join(F.broadcast(polygons), "poly_id")
    return (withring
            .filter(point_in_ring_expr("lon_nano", "lat_nano"))
            .drop("ring"))
