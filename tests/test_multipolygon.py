"""Multipolygon assembly + PIP-with-holes tests.

Geometry: outer square (0..10, 0..10 micro-degrees scaled to nano) split
into three ways — one deliberately reversed — and an inner hole square
(3..7) as a single closed way. A second relation shares one boundary
way with the first.
"""

import pytest
from pyspark.sql import functions as F

from osmpbf_spark.functions.grid import with_grid_cells
from osmpbf_spark.operators.multipolygon import (
    multipolygon_rings,
    pip_multipolygon,
    rings_as_polygons,
)

B = 1_000_000_000  # nano per degree

# node id → (lat_nano, lon_nano); outer square corners 1-4, hole 5-8,
# extra midpoint 9 so one outer way has 3 vertices
NODES = {
    1: (0, 0), 2: (0, 10 * B), 3: (10 * B, 10 * B), 4: (10 * B, 0),
    5: (3 * B, 3 * B), 6: (3 * B, 7 * B), 7: (7 * B, 7 * B),
    8: (7 * B, 3 * B),
    9: (0, 5 * B),
}

# ways: outer ring = 100 (1→9→2), 101 (REVERSED: 3→2), 102 (3→4→1);
# hole ring = 103 closed; 104 = second relation's extra edge chain
WAYS = {
    100: [1, 9, 2],
    101: [3, 2],
    102: [3, 4, 1],
    103: [5, 6, 7, 8, 5],
}

RELS = {
    200: [("outer", 100), ("outer", 101), ("outer", 102),
          ("inner", 103)],
    # second relation: same outer square, no hole; blank role → outer
    201: [("", 100), ("outer", 101), ("outer", 102)],
}


def _elements(spark, *, drop_way=None, drop_node=None):
    rows = []
    for nid, (la, lo) in NODES.items():
        if nid == drop_node:
            continue
        rows.append(("node", nid, la, lo, None, [], []))
    for wid, refs in WAYS.items():
        if wid == drop_way:
            continue
        rows.append(("way", wid, None, None, None, refs, []))
    for rid, members in RELS.items():
        rows.append(("relation", rid, None, None,
                     {"type": "multipolygon"}, [],
                     [{"role": r, "member_id": w, "member_type": "way"}
                      for r, w in members]))
    ddl = ("element_type string, id long, lat_nano long, lon_nano long, "
           "tags map<string,string>, refs array<long>, "
           "members array<struct<role:string,member_id:long,"
           "member_type:string>>")
    return spark.createDataFrame(rows, ddl)


def _rings_by_key(df):
    return {(r["relation_id"], r["role"], r["ring_id"]): r
            for r in df.collect()}


def test_multipolygon_ring_assembly(spark):
    rings = _rings_by_key(multipolygon_rings(_elements(spark)))
    assert set(rings) == {(200, "outer", 100), (200, "inner", 103),
                          (201, "outer", 100)}
    outer = rings[(200, "outer", 100)]
    assert outer["is_closed"] and outer["n_ways"] == 3
    # chained from way 100, through REVERSED 101, then 102: node path
    # 1,9,2,3,4,1 → six vertices, closed
    pts = [(p["lat_nano"], p["lon_nano"]) for p in outer["ring"]]
    assert pts == [NODES[n] for n in [1, 9, 2, 3, 4, 1]]
    hole = rings[(200, "inner", 103)]
    assert hole["is_closed"] and hole["n_ways"] == 1
    assert len(hole["ring"]) == 5
    # blank role normalized to outer; shared ways chain identically
    assert rings[(201, "outer", 100)]["ring"] == outer["ring"]


def test_multipolygon_open_ring_is_loud(spark):
    # dropping way 102 breaks the outer chain: still assembles, but
    # is_closed=false and it never reaches the polygon view
    rings = multipolygon_rings(_elements(spark, drop_way=102))
    open_rows = rings.filter(~F.col("is_closed")).collect()
    assert {r["relation_id"] for r in open_rows} == {200, 201}
    assert rings_as_polygons(rings, "outer").count() == 0
    # the hole is untouched
    assert rings_as_polygons(rings, "inner").count() == 1


def test_multipolygon_unresolved_node_excludes_way(spark):
    # node 9 missing → way 100 excluded → outer rings cannot close
    rings = multipolygon_rings(_elements(spark, drop_node=9))
    outer = rings.filter(F.col("role") == "outer")
    assert outer.filter(F.col("is_closed")).count() == 0
    assert outer.count() >= 1


def test_pip_multipolygon_holes(spark):
    # points: inside outer & outside hole; inside hole; outside; on the
    # second relation both in-square points match (201 has no hole)
    pts = spark.createDataFrame(
        [(1, int(1.5 * B), int(1.5 * B)),   # in square, off hole
         (2, 5 * B, 5 * B),                 # inside the hole
         (3, 20 * B, 20 * B),               # outside everything
         (4, int(6.5 * B), int(6.9 * B))],  # inside the hole, near edge
        "id long, lat_nano long, lon_nano long")
    indexed = with_grid_cells(pts)
    rings = multipolygon_rings(_elements(spark))
    got = sorted(tuple(r) for r in
                 pip_multipolygon(indexed, rings).collect())
    # relation 200: only point 1 (hole swallows 2 and 4);
    # relation 201 (no hole): points 1, 2, 4
    assert got == [(1, 200), (1, 201), (2, 201), (4, 201)]


def test_multipolygon_partitioning_independent(spark):
    el = _elements(spark)
    base = sorted(map(tuple, multipolygon_rings(el).collect()))
    rep = sorted(map(tuple,
                     multipolygon_rings(el.repartition(7)).collect()))
    assert rep == base


def test_ring_orientation_exact_shoelace(spark):
    import random
    from osmpbf_spark.operators.multipolygon import with_ring_orientation

    rng = random.Random(99)
    rows = []
    expected = []
    for i in range(20):
        n = rng.randrange(3, 12)
        ring = [(rng.randrange(-90 * B, 90 * B),
                 rng.randrange(-180 * B, 180 * B)) for _ in range(n)]
        ring.append(ring[0])
        rows.append((i, [{"lat_nano": a, "lon_nano": b} for a, b in ring]))
        # exact python-int shoelace (x=lon, y=lat)
        a2 = sum(ring[j][1] * ring[j + 1][0] - ring[j + 1][1] * ring[j][0]
                 for j in range(n))
        expected.append((i, a2,
                         "ccw" if a2 > 0 else
                         ("cw" if a2 < 0 else "degenerate")))
    # plus hand goldens: CCW square, CW square, degenerate line
    rows += [(100, [{"lat_nano": a, "lon_nano": b} for a, b in
                    [(0, 0), (0, 10), (10, 10), (10, 0), (0, 0)]]),
             (101, [{"lat_nano": a, "lon_nano": b} for a, b in
                    [(0, 0), (10, 0), (10, 10), (0, 10), (0, 0)]]),
             (102, [{"lat_nano": a, "lon_nano": b} for a, b in
                    [(0, 0), (5, 5), (0, 0)]])]
    # 2A of the 10×10 square = 200
    expected += [(100, 200, "ccw"), (101, -200, "cw"),
                 (102, 0, "degenerate")]
    df = spark.createDataFrame(
        rows, "rid long, ring array<struct<lat_nano:bigint,lon_nano:bigint>>")
    got = {r["rid"]: (int(r["area2_nano2"]), r["orientation"])
           for r in with_ring_orientation(df).collect()}
    for rid, a2, orient in expected:
        assert got[rid] == (a2, orient), (rid, got[rid], a2, orient)


def test_normalize_winding_idempotent_and_pip_invariant(spark):
    from osmpbf_spark.operators.multipolygon import (
        normalize_winding, with_ring_orientation)

    rings = multipolygon_rings(_elements(spark))
    norm = normalize_winding(rings)
    o = {(r["relation_id"], r["role"]): r["orientation"]
         for r in with_ring_orientation(norm).collect()}
    assert o[(200, "outer")] == "ccw" and o[(200, "inner")] == "cw"
    assert o[(201, "outer")] == "ccw"
    # idempotent
    again = normalize_winding(norm)
    assert sorted(map(tuple, again.collect())) == \
        sorted(map(tuple, norm.collect()))
    # ray-cast PIP is winding-agnostic: matches unchanged
    pts = spark.createDataFrame(
        [(1, int(1.5 * B), int(1.5 * B)), (2, 5 * B, 5 * B)],
        "id long, lat_nano long, lon_nano long")
    indexed = with_grid_cells(pts)
    assert sorted(map(tuple, pip_multipolygon(indexed, norm).collect())) \
        == sorted(map(tuple, pip_multipolygon(indexed, rings).collect()))
