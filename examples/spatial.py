#!/usr/bin/env python
"""The engine's own flagship (no reference counterpart): synthesize a
planet-extract-shaped input, decode, cell-index every node, and run a
point-in-polygon join with exact integer geometry.

    python examples/spatial.py [n_nodes]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from osmpbf_spark.functions.grid import GRID_RES_FINE, with_grid_cells
from osmpbf_spark.operators.pip import make_polygons, pip_join
from osmpbf_spark.session import get_spark
from osmpbf_spark.sources.documents import read_elements
from osmpbf_spark.sources.synth import synth_documents


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    spark = get_spark("spatial-example")
    spark.sparkContext.setLogLevel("ERROR")
    docs, media, expected = synth_documents(spark, n)
    B = 1_000_000_000
    polys = make_polygons(spark, [
        ("megacity", [(int(42.9 * B), int(8.9 * B)),
                      (int(43.1 * B), int(8.9 * B)),
                      (int(43.1 * B), int(9.1 * B)),
                      (int(42.9 * B), int(9.1 * B)),
                      (int(42.9 * B), int(8.9 * B))])])
    t0 = time.time()
    nodes = with_grid_cells(
        read_elements(docs, media).filter("element_type = 'node'"),
        res=GRID_RES_FINE)
    matches = pip_join(nodes, polys, res=GRID_RES_FINE).count()
    dt = time.time() - t0
    total = expected["node"] + expected["way"] + expected["relation"]
    print(f"decoded {total:,} elements, {matches:,} nodes inside the "
          f"megacity polygon in {dt:.1f}s ({total / dt:,.0f} elem/s)")
    spark.stop()


if __name__ == "__main__":
    main()
