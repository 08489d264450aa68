"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship: decode the golden OSM fixture through the
interleaved-documents path, spatially index the sf0.001 events table, and
run the engine's PIP join; returns the per-polygon/event-type counts.

``queries()`` / ``oracle_sql()`` — one entry per implemented operator
(SURVEY.md §2 + the spatial/training-data layer); implementations live in
``osmpbf_spark.queries`` (REGISTRY), each pairing engine code with a
DuckDB oracle built from the same dual-rendered arithmetic.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship on /root/testdata/sf0.001: decode + cell-index + PIP join."""
    from osmpbf_spark.session import ensure_workers_can_import
    ensure_workers_can_import(spark)
    from osmpbf_spark import queries as Q
    from osmpbf_spark.functions.grid import GRID_RES_FINE, with_grid_cells
    from osmpbf_spark.operators.parity import count_by_type
    from osmpbf_spark.operators.pip import make_polygons, pip_join

    sf_dir = "/root/testdata/sf0.001"
    # 1) decode golden OSM fixture via the documents path (engine core)
    el = Q._golden_elements(spark)
    osm_counts = count_by_type(el).select(
        F.lit("osm").alias("source"),
        F.col("element_type").alias("key"),
        F.col("cnt"))
    # 2) spatial: index events, PIP-join against the diamond polygon
    ev = with_grid_cells(Q._events_xy(spark, sf_dir), res=GRID_RES_FINE)
    polys = make_polygons(spark, [("diamond", Q._DIAMOND)])
    inside = (pip_join(ev, polys, res=GRID_RES_FINE)
              .groupBy("poly_id", "event_type")
              .agg(F.count("*").alias("cnt"))
              .select(F.col("poly_id").alias("source"),
                      F.col("event_type").alias("key"), "cnt"))
    return osm_counts.unionByName(inside)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from osmpbf_spark.queries import all_queries
    from osmpbf_spark.session import ensure_workers_can_import

    def wrap(fn):
        def run(spark, sf_dir):
            ensure_workers_can_import(spark)
            return fn(spark, sf_dir)
        return run
    return {name: wrap(fn) for name, fn in all_queries().items()}


def oracle_sql() -> dict[str, str]:
    from osmpbf_spark.queries import all_oracles
    return all_oracles()
