"""Vector-tile cutting: numpy clip cores (golden + property) and the
Spark cover→clip→quantize→build surface."""

import math
import random

import numpy as np
import pytest
from pyspark.sql import functions as F

from osmpbf_spark.operators.tileclip import (
    GEOM_T,
    _clip_line_np,
    _clip_ring_np,
    build_vector_tiles,
    clip_to_tiles,
    covering_tiles,
    quantize_to_tile,
    tile_bounds_nano,
    tile_lat_n,
    tile_lon_w,
)

B = 10**9


def _ring(pts):
    return [{"lat_nano": a, "lon_nano": b} for a, b in pts]


def _shoelace2(v):
    """|2·area| of an open (lat, lon) float array via the same shoelace
    the engine's ring_area2_sql computes."""
    x, y = v[:, 1], v[:, 0]
    return abs(np.sum(x * np.roll(y, -1) - np.roll(x, -1) * y))


# -- numpy cores -------------------------------------------------------------

def test_ring_clip_golden_half_square():
    sq = np.array([[0, 0], [10, 0], [10, 10], [0, 10]], float)
    v = _clip_ring_np(sq, 0, 5, 0, 20)
    assert _shoelace2(v) / 2 == 50.0
    assert v[:, 0].max() == 5.0 and v[:, 0].min() == 0.0


def test_ring_clip_inside_outside_degenerate():
    sq = np.array([[0, 0], [10, 0], [10, 10], [0, 10]], float)
    assert _clip_ring_np(sq, 20, 30, 0, 10) is None          # disjoint
    v = _clip_ring_np(sq, -5, 50, -5, 50)                    # enclosing
    assert _shoelace2(v) / 2 == 100.0
    # rect touches only the ring's edge: zero-area sliver or None
    v = _clip_ring_np(sq, 10, 20, 0, 10)
    assert v is None or _shoelace2(v) == 0.0


def test_ring_clip_concave_area_exact():
    # L-shape clipped by a rect crossing the notch
    L = np.array([[0, 0], [0, 30], [10, 30], [10, 10], [30, 10], [30, 0]],
                 float)
    v = _clip_ring_np(L, 5, 25, 5, 25)
    # analytic: intersection of the L with [5,25]² = L-shape with area
    # 20·5 (bottom strip lat 5..10, lon 5..25) + 5·15 (left strip lat
    # 10..25, lon 5..10)
    assert _shoelace2(v) / 2 == pytest.approx(20 * 5 + 5 * 15)


def test_line_clip_golden_and_reentry():
    parts = _clip_line_np(np.array([[-5, -5], [15, 15]], float),
                          0, 10, 0, 10)
    assert len(parts) == 1
    assert parts[0].tolist() == [[0.0, 0.0], [10.0, 10.0]]
    # exits through lon=10, re-enters later: two parts
    line = np.array([[5, -5], [5, 5], [5, 25], [8, 25], [8, 5]], float)
    parts = _clip_line_np(line, 0, 10, 0, 10)
    assert [p[0].tolist() for p in parts] == [[5.0, 0.0], [8.0, 10.0]]
    assert [p[-1].tolist() for p in parts] == [[5.0, 10.0], [8.0, 5.0]]


def _rand_convex(rng, n=8):
    """Random convex polygon: convex hull of n points (gift-wrap via
    angle sort around the centroid works for hull vertices only, so use
    the monotone-chain hull)."""
    pts = np.array([[rng.uniform(-100, 100), rng.uniform(-100, 100)]
                    for _ in range(n)])
    pts = pts[np.lexsort((pts[:, 1], pts[:, 0]))]

    def half(seq):
        h = []
        for p in seq:
            while len(h) >= 2 and np.cross(h[-1] - h[-2], p - h[-2]) <= 0:
                h.pop()
            h.append(p)
        return h

    hull = half(pts)[:-1] + half(pts[::-1])[:-1]
    return np.array(hull)


def test_property_partition_conserves_area_and_length():
    """Clipping against a 4×4 grid that PARTITIONS the plane must
    conserve total polygon area and total polyline length."""
    rng = random.Random(4242)
    xs = np.linspace(-120, 120, 5)
    for _ in range(40):
        poly = _rand_convex(rng)
        if len(poly) < 3:
            continue
        total = 0.0
        for i in range(4):
            for j in range(4):
                v = _clip_ring_np(poly, xs[i], xs[i + 1], xs[j], xs[j + 1])
                if v is not None:
                    total += _shoelace2(v)
        assert total == pytest.approx(_shoelace2(poly), rel=1e-9)
        # polyline: random 6-point walk
        line = np.array([[rng.uniform(-110, 110), rng.uniform(-110, 110)]
                         for _ in range(6)])
        want = np.sum(np.hypot(*np.diff(line, axis=0).T))
        got = 0.0
        for i in range(4):
            for j in range(4):
                for part in _clip_line_np(line, xs[i], xs[i + 1],
                                          xs[j], xs[j + 1]):
                    got += np.sum(np.hypot(*np.diff(part, axis=0).T))
        assert got == pytest.approx(want, rel=1e-9)


def test_batch_clip_equals_per_geometry_reference():
    """_clip_rings_batch must reproduce _clip_ring_np EXACTLY (same
    vertices, same order — including the kept rotation of rings a
    half-plane pass doesn't touch) for every ring in a mixed batch,
    independent of batch composition."""
    from osmpbf_spark.operators.tileclip import _clip_rings_batch
    rng = random.Random(7)
    rings, bounds = [], []
    for _ in range(60):
        poly = _rand_convex(rng, n=rng.randrange(3, 12))
        if len(poly) < 3:
            continue
        rings.append(poly)
        # tiles of varying overlap: some enclosing, some disjoint
        cx, cy = rng.uniform(-120, 120), rng.uniform(-120, 120)
        half = rng.uniform(5, 200)
        bounds.append((cx - half, cx + half, cy - half, cy + half))
    flat = np.concatenate(rings)
    seg_ids = np.repeat(np.arange(len(rings)), [len(r) for r in rings])
    out, seg_n = _clip_rings_batch(flat, seg_ids, len(rings),
                                   np.asarray(bounds))
    starts = np.concatenate(([0], np.cumsum(seg_n)[:-1]))
    for j, (poly, b) in enumerate(zip(rings, bounds)):
        ref = _clip_ring_np(poly, *b)
        got = out[starts[j]:starts[j] + seg_n[j]]
        if ref is None:
            assert seg_n[j] < 3, (j, got)
        else:
            assert got.tolist() == ref.tolist(), j
    # batch-composition independence: each ring alone gives the same
    for j in (0, len(rings) // 2, len(rings) - 1):
        solo, solo_n = _clip_rings_batch(
            rings[j], np.zeros(len(rings[j]), dtype=np.int64), 1,
            np.asarray(bounds[j : j + 1]))
        assert solo.tolist() == \
            out[starts[j]:starts[j] + seg_n[j]].tolist()


def test_batch_line_clip_equals_per_geometry_reference():
    """_clip_lines_batch must reproduce _clip_line_np part-for-part
    (same vertices, same part order) for every line in a mixed batch."""
    from osmpbf_spark.operators.tileclip import _clip_lines_batch
    rng = random.Random(11)
    lines, bounds = [], []
    for _ in range(60):
        n = rng.randrange(2, 10)
        lines.append(np.array(
            [[rng.uniform(-120, 120), rng.uniform(-120, 120)]
             for _ in range(n)]))
        cx, cy = rng.uniform(-100, 100), rng.uniform(-100, 100)
        half = rng.uniform(5, 150)
        bounds.append((cx - half, cx + half, cy - half, cy + half))
    # a guaranteed touch-at-a-point degenerate: segment ending exactly
    # on the rectangle corner of a disjoint rectangle
    lines.append(np.array([[0.0, 0.0], [10.0, 10.0]]))
    bounds.append((10.0, 20.0, 10.0, 20.0))
    flat = np.concatenate(lines)
    seg_ids = np.repeat(np.arange(len(lines)), [len(x) for x in lines])
    out, sizes, part_rows = _clip_lines_batch(flat, seg_ids, len(lines),
                                              np.asarray(bounds))
    offs = np.cumsum(sizes) - sizes
    got: dict[int, list] = {j: [] for j in range(len(lines))}
    for o, s, j in zip(offs, sizes, part_rows):
        got[int(j)].append(out[o:o + s].tolist())
    for j, (line, b) in enumerate(zip(lines, bounds)):
        ref = [p.tolist() for p in _clip_line_np(line, *b)]
        assert got[j] == ref, j


def test_clip_idempotent_on_own_tile():
    rng = random.Random(99)
    for _ in range(20):
        poly = _rand_convex(rng)
        if len(poly) < 3:
            continue
        v = _clip_ring_np(poly, -50, 50, -50, 50)
        if v is None:
            continue
        again = _clip_ring_np(v, -50, 50, -50, 50)
        assert again is not None
        assert _shoelace2(again) == pytest.approx(_shoelace2(v), rel=1e-12)


def test_tile_bounds_published_formulas():
    assert tile_lon_w(0, 0) == -180.0 * B
    assert tile_lon_w(1, 1) == 0.0
    assert tile_lat_n(1, 1) == 0.0                       # equator
    s, n, w, e = tile_bounds_nano(0, 0, 0)
    assert w == -180.0 * B and e == 180.0 * B
    assert n == pytest.approx(85.05112877980659 * B)
    assert s == -n


# -- Spark surface -----------------------------------------------------------

@pytest.fixture(scope="module")
def square_df(spark):
    ring = _ring([(a * B, b * B) for a, b in
                  [(10, 10), (10, 40), (40, 40), (40, 10), (10, 10)]])
    return spark.createDataFrame([("r1", ring)],
                                 f"feature_id string, ring {GEOM_T}")


def test_covering_tiles_matches_corner_tiles(spark, square_df):
    from osmpbf_spark.functions.tiles import py_tile_xy
    rows = covering_tiles(square_df, zoom=6).select("tx", "ty").collect()
    x0, y1 = py_tile_xy(10.0, 10.0, 6)   # south-west corner: max ty
    x1, y0 = py_tile_xy(40.0, 40.0, 6)   # north-east corner: min ty
    want = {(x, y) for x in range(x0, x1 + 1) for y in range(y0, y1 + 1)}
    assert {(r["tx"], r["ty"]) for r in rows} == want


def test_spark_ring_clip_conserves_area_and_contains(spark, square_df):
    rows = clip_to_tiles(square_df, zoom=6, kind="ring").collect()
    total = 0.0
    for r in rows:
        v = np.array([[p["lat_nano"], p["lon_nano"]]
                      for p in r["ring"][:-1]], float)
        total += _shoelace2(v)
        # closed, inside its tile (1 nano rounding slack)
        assert r["ring"][0] == r["ring"][-1]
        s, n, w, e = tile_bounds_nano(6, r["tx"], r["ty"])
        for p in r["ring"]:
            assert s - 1 <= p["lat_nano"] <= n + 1
            assert w - 1 <= p["lon_nano"] <= e + 1
    assert total / 2 == pytest.approx((30 * B) ** 2, rel=1e-9)


def test_spark_line_clip_splits_at_tile_boundary(spark):
    line = _ring([(5 * B, 5 * B), (35 * B, 65 * B)])
    df = spark.createDataFrame([("l1", line)],
                               f"feature_id string, ring {GEOM_T}")
    rows = (clip_to_tiles(df, zoom=3, kind="line")
            .orderBy("tx").collect())
    assert [(r["tx"], r["ty"]) for r in rows] == [(4, 3), (5, 3)]
    # split exactly at the tx=5 boundary, lon 45°: lat by similar
    # triangles = 5 + 30·(40/60) = 25
    assert rows[0]["ring"][-1] == rows[1]["ring"][0]
    assert rows[0]["ring"][-1]["lon_nano"] == 45 * B
    assert rows[0]["ring"][-1]["lat_nano"] == 25 * B


def test_quantize_golden_and_range(spark, square_df):
    rows = (quantize_to_tile(clip_to_tiles(square_df, zoom=6, kind="ring"),
                             zoom=6, extent=4096)
            .collect())
    from osmpbf_spark.functions.tiles import MAX_MERC_LAT
    for r in rows:
        for p, px in zip(r["ring"], r["pixels"]):
            # px golden: the published slippy x fraction within the tile
            fx = (p["lon_nano"] / 1e9 + 180.0) / 360.0 * 64
            assert px["px"] == round(fx * 4096 - r["tx"] * 4096)
            lat = min(max(p["lat_nano"] / 1e9, -MAX_MERC_LAT), MAX_MERC_LAT)
            fy = (1 - math.asinh(math.tan(math.radians(lat)))
                  / math.pi) / 2 * 64
            assert px["py"] == round(fy * 4096 - r["ty"] * 4096)
            assert -1 <= px["px"] <= 4097 and -1 <= px["py"] <= 4097


def test_quantize_collapses_consecutive_duplicates(spark):
    # two vertices 10 nano apart quantize to the same pixel
    ring = _ring([(0, 0), (0, 10), (0, 5 * B), (0, 0)])
    df = spark.createDataFrame([("r", ring)],
                               f"feature_id string, ring {GEOM_T}")
    out = quantize_to_tile(df.withColumn("tx", F.expr("32"))
                           .withColumn("ty", F.expr("32")),
                           zoom=6, extent=4096).collect()[0]
    assert len(out["pixels"]) == 3           # 4 vertices, one collapsed


def test_build_vector_tiles_deterministic_and_sorted(spark, square_df):
    both = square_df.unionByName(
        square_df.select(F.lit("r2").alias("feature_id"), "ring"))
    a = build_vector_tiles(both, zoom=6).orderBy("tx", "ty").collect()
    b = (build_vector_tiles(both.repartition(7), zoom=6)
         .orderBy("tx", "ty").collect())
    assert a == b
    assert all(len(r["features"]) == 2 for r in a)
    assert all([f["feature_id"] for f in r["features"]] == ["r1", "r2"]
               for r in a)


def test_build_vector_tiles_with_simplify(spark):
    # densify one edge with jitter below eps: simplification removes it
    pts = [(10 * B, 10 * B)]
    for i in range(1, 50):
        pts.append((10 * B + (i % 2) * 100, 10 * B + i * B // 2))
    pts += [(12 * B, 35 * B), (10 * B, 10 * B)]
    df = spark.createDataFrame([("r", _ring(pts))],
                               f"feature_id string, ring {GEOM_T}")
    plain = build_vector_tiles(df, zoom=4).collect()
    simp = build_vector_tiles(df, zoom=4, simplify_eps_nano=1e6).collect()
    n_plain = sum(len(f["pixels"]) for r in plain for f in r["features"])
    n_simp = sum(len(f["pixels"]) for r in simp for f in r["features"])
    assert n_simp < n_plain


def test_tile_pyramid_and_store_roundtrip(spark, square_df, tmp_path):
    from osmpbf_spark.operators.tileclip import (
        build_tile_pyramid,
        pixel_eps_nano,
    )
    from osmpbf_spark.sources.store import (
        read_tile_store,
        scan_is_pruned,
        tiles_in_view,
        write_tile_store,
    )
    pyr = build_tile_pyramid(square_df, zooms=[2, 4, 6])
    # every requested zoom present; coarser zoom → fewer-or-equal tiles
    by_zoom = {r["zoom"]: r["n"] for r in
               pyr.groupBy("zoom").agg(F.count("*").alias("n")).collect()}
    assert set(by_zoom) == {2, 4, 6}
    assert by_zoom[2] <= by_zoom[4] <= by_zoom[6]
    # per-zoom leg == direct single-zoom build at the same tolerance
    direct = build_vector_tiles(
        square_df, zoom=4,
        simplify_eps_nano=pixel_eps_nano(4)).orderBy("tx", "ty").collect()
    assert pyr.filter("zoom = 4").orderBy("tx", "ty").collect() == direct
    # store roundtrip + the two-level pruning contract
    path = str(tmp_path / "tiles")
    write_tile_store(pyr, path, n_files=4)
    store = read_tile_store(spark, path)
    assert store.count() == pyr.count()
    one = tiles_in_view(store, zoom=4, tx0=direct[0]["tx"],
                        tx1=direct[0]["tx"], ty0=direct[0]["ty"],
                        ty1=direct[0]["ty"])
    info = scan_is_pruned(one)
    assert info["partition_filters"], info["plan"][:2000]
    assert info["pushed_filters"], info["plan"][:2000]
    got = one.collect()
    assert len(got) == 1 and got[0]["features"] == direct[0]["features"]


def test_degenerate_geometry_wrap_defense_and_overflow_audit(spark,
                                                             square_df):
    """An antimeridian-wrapped geometry (bbox wider than half the
    world) must not explode the cover — the zoom-independent wrap
    defense excludes it by DEFAULT and covering_overflow reports it;
    legitimately large geometry (the 30-degree square, >4096 tiles at
    zoom 12) is untouched."""
    from osmpbf_spark.operators.tileclip import covering_overflow
    bad = _ring([(0, -179 * B), (B, 179 * B), (0, -179 * B)])
    good = _ring([(10 * B, 10 * B), (10 * B + B // 5, 10 * B + B // 5)])
    df = spark.createDataFrame([("bad", bad), ("good", good)],
                               square_df.schema)
    capped = clip_to_tiles(df, zoom=12, kind="line")
    assert capped.filter("feature_id = 'bad'").count() == 0
    assert capped.filter("feature_id = 'good'").count() > 0
    # a big-but-legit feature stays in by default (no tile-count cap)
    big = covering_tiles(square_df, zoom=12)
    assert big.count() > 4096
    over = covering_overflow(df.unionByName(square_df), zoom=12).collect()
    assert [r["feature_id"] for r in over] == ["bad"]
    assert over[0]["n_tiles"] > 4096
    # the optional absolute cap composes on top, with the same audit
    assert covering_tiles(square_df, zoom=12, max_tiles=4096).count() == 0
    over2 = covering_overflow(square_df, zoom=12, max_tiles=4096)
    assert over2.count() == 1
    # wrap defense is the caller's explicit choice to disable
    got = covering_tiles(spark.createDataFrame([("bad", bad)],
                                               square_df.schema),
                         zoom=6, wrap_defense=False).count()
    assert got > 0


def test_empty_and_null_geometries_skipped(spark):
    df = spark.createDataFrame([("a", []), ("b", None)],
                               f"feature_id string, ring {GEOM_T}")
    assert covering_tiles(df, zoom=4).count() == 0
    assert clip_to_tiles(df, zoom=4).count() == 0


def test_null_vertex_defense_and_overflow_audit(spark):
    """A geometry with a NULL vertex (null struct or null lat/lon
    field) is EXCLUDED from the cut, not guessed: a null field would
    otherwise poison the bbox (the non-null field still widens it —
    measured 8 spurious cover tiles from one vertex) and push NaN
    through the clip; a null struct would ride the fully-inside JVM
    route through unchanged. covering_overflow audits both."""
    from osmpbf_spark.operators.tileclip import covering_overflow
    good = _ring([(10 * B, 10 * B), (11 * B, 10 * B),
                  (11 * B, 11 * B), (10 * B, 10 * B)])
    null_struct = [good[0], None, good[2], good[0]]
    null_field = [good[0], {"lat_nano": None, "lon_nano": 5},
                  good[2], good[0]]
    df = spark.createDataFrame(
        [("good", good), ("nstruct", null_struct), ("nfield", null_field)],
        f"feature_id string, ring {GEOM_T}")
    cov = covering_tiles(df, zoom=8)
    assert sorted({r["feature_id"] for r in cov.collect()}) == ["good"]
    cut = clip_to_tiles(df, zoom=8, kind="ring")
    assert sorted({r["feature_id"] for r in cut.collect()}) == ["good"]
    over = covering_overflow(df, zoom=8).collect()
    assert sorted(r["feature_id"] for r in over) == ["nfield", "nstruct"]
    assert all(r["nullv"] for r in over)


def test_clip_kind_validated(spark, square_df):
    with pytest.raises(ValueError):
        clip_to_tiles(square_df, zoom=4, kind="polygon")


def test_engine_vector_tiles_facade(spark):
    from osmpbf_spark.api import Engine
    from osmpbf_spark.sources.fixtures import fixture_file_bytes
    eng = Engine.from_pbf_bytes(spark, "t", fixture_file_bytes("zlib_dense"))
    # way 107 is a closed triangle near (52.12, 11.62): zoom-12 cut
    tiles = eng.vector_tiles(zoom=12, kind="line").collect()
    assert len(tiles) >= 1
    feats = [f for r in tiles for f in r["features"]]
    assert {f["feature_id"] for f in feats} == {"107"}
    assert all(len(f["pixels"]) >= 2 for f in feats)
    pyr = eng.tile_pyramid(zooms=[10, 14], kind="line")
    zs = {r["zoom"] for r in pyr.select("zoom").distinct().collect()}
    assert zs == {10, 14}
    with pytest.raises(ValueError):
        eng.vector_tiles(kind="raster")


def test_plan_arrow_udf_and_single_shuffle(spark, square_df):
    """The clip runs Arrow-batched (never row-at-a-time Python) and the
    tile build's only shuffle is the groupBy(zoom, tx, ty) itself."""
    from osmpbf_spark.plans.audit import audit, physical_plan
    vt = build_vector_tiles(square_df, zoom=6)
    plan = physical_plan(vt)
    assert "ArrowEvalPython" in plan
    assert "BatchEvalPython" not in plan
    assert audit(vt)["exchanges"] <= 1     # the tile-key groupBy only
