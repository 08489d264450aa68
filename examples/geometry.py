#!/usr/bin/env python
"""Geometry-layer tour: way lengths, multipolygon assembly, winding,
simplification, and point-in-polygon with holes.

The reference stops at decoded relation members
(/root/reference/src/elements.rs RelMemberIter); every real OSM polygon
pipeline must assemble them into rings before any area operation. This
example builds a lake-with-island multipolygon from raw PBF bytes and
drives the whole geometry layer:

    python examples/geometry.py [file.osm.pbf]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from osmpbf_spark.api import Engine
from osmpbf_spark.session import get_spark


def demo_pbf() -> bytes:
    """A 10°×10° 'lake' (outer ring split over three ways, one
    reversed) with a 4°×4° 'island' hole."""
    from osmpbf_spark.pbf.encode import (
        Node,
        Relation,
        Way,
        encode_header_block,
        encode_primitive_block,
        write_pbf,
    )
    B = 1_000_000_000
    coords = {1: (0, 0), 2: (0, 10 * B), 3: (10 * B, 10 * B),
              4: (10 * B, 0), 5: (3 * B, 3 * B), 6: (3 * B, 7 * B),
              7: (7 * B, 7 * B), 8: (7 * B, 3 * B)}
    nodes = [Node(id=n, lat_raw=la // 100, lon_raw=lo // 100)
             for n, (la, lo) in sorted(coords.items())]
    ways = [Way(id=100, refs=[1, 2]), Way(id=101, refs=[3, 2]),
            Way(id=102, refs=[3, 4, 1]), Way(id=103, refs=[5, 6, 7, 8, 5])]
    rel = Relation(id=200, members=[("outer", 100, 1), ("outer", 101, 1),
                                    ("outer", 102, 1), ("inner", 103, 1)],
                   tags=[("type", "multipolygon"), ("natural", "water")])
    hdr = encode_header_block(bbox_nano=(0, 10 * B, 10 * B, 0),
                              required_features=["OsmSchema-V0.6",
                                                 "DenseNodes"])
    blk = encode_primitive_block([nodes, ways, [rel]], dense=True)
    return write_pbf([("OSMHeader", hdr, True), ("OSMData", blk, True)])


def main():
    spark = get_spark("geometry-example")
    spark.sparkContext.setLogLevel("ERROR")
    if len(sys.argv) > 1:
        with open(sys.argv[1], "rb") as f:
            data = f.read()
    else:
        data = demo_pbf()
    eng = Engine.from_pbf_bytes(spark, "input", data)

    print("== per-way geometry stats (haversine length, bbox) ==")
    eng.way_stats().orderBy("way_id").show(10, truncate=False)

    print("== assembled multipolygon rings (winding normalized) ==")
    rings = eng.multipolygons(normalize=True)
    from osmpbf_spark.operators.multipolygon import with_ring_orientation
    (with_ring_orientation(rings)
     .select("relation_id", "ring_id", "role", "is_closed", "n_ways",
             "orientation")
     .orderBy("relation_id", "role").show(10, truncate=False))

    print("== Douglas-Peucker at 0.1 deg (vertices before -> after) ==")
    from pyspark.sql import functions as F
    from osmpbf_spark.operators.simplify import simplify_geometry
    (rings.select("relation_id", "role",
                  F.size("ring").alias("before"),
                  F.size(simplify_geometry("ring", 0.1e9)).alias("after"))
     .orderBy("relation_id", "role").show(10, truncate=False))

    print("== nodes inside the multipolygon (holes subtracted) ==")
    eng.pip_multipolygon(rings=rings).orderBy("id").show(10)

    print("== vector-tile cut: the lake rings at zooms 4 and 6 ==")
    pyr = eng.tile_pyramid(zooms=[4, 6], kind="ring")
    (pyr.select("zoom", "tx", "ty", F.size("features").alias("n_feats"),
                F.expr("aggregate(features, 0, (a, f) -> "
                       "a + size(f.pixels))").alias("n_pixels"))
     .orderBy("zoom", "tx", "ty").show(20))


if __name__ == "__main__":
    main()
