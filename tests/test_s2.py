"""S2 cell-id self-consistency tests (no s2 library exists here, so the
implementation is validated by the algorithm's own invariants: face
mapping of cardinal points, Hilbert LUT inverse round-trip, parent prefix
containment, level extraction, neighbor distinctness, determinism)."""

import numpy as np

from osmpbf_spark.functions.s2 import (
    _LOOKUP_IJ,
    _LOOKUP_POS,
    MAX_LEVEL,
    face_uv,
    s2_cell_id,
    s2_level,
    s2_parent,
    st_from_uv,
    xyz_from_latlon,
)


def test_face_of_cardinal_points():
    lat = np.array([0.0, 0.0, 90.0, 0.0, 0.0, -90.0])
    lon = np.array([0.0, 90.0, 0.0, 180.0, -90.0, 0.0])
    face, u, v = face_uv(*xyz_from_latlon(lat, lon))
    assert face.tolist() == [0, 1, 2, 3, 4, 5]
    # center of each face → (u, v) ≈ (0, 0)
    assert np.allclose(u, 0, atol=1e-12)
    assert np.allclose(v, 0, atol=1e-12)


def test_st_quadratic_fixed_points():
    assert st_from_uv(np.array([0.0]))[0] == 0.5
    assert st_from_uv(np.array([1.0]))[0] == 1.0
    assert st_from_uv(np.array([-1.0]))[0] == 0.0


def test_lookup_tables_are_inverse():
    for ij_o in range(len(_LOOKUP_POS)):
        pos_o = int(_LOOKUP_POS[ij_o])
        # invert: lookup_ij[(pos<<2)|orig_orientation] == (ij<<2)|orient
        orig = ij_o & 3
        assert int(_LOOKUP_IJ[(pos_o & ~3) | orig]) == (ij_o & ~3) | (
            pos_o & 3)


def test_level_and_parent_containment():
    rng = np.random.RandomState(7)
    lat = rng.uniform(-85, 85, 500)
    lon = rng.uniform(-180, 180, 500)
    c12 = s2_cell_id(lat, lon, 12)
    assert (s2_level(c12) == 12).all()
    c8 = s2_cell_id(lat, lon, 8)
    assert (s2_level(c8) == 8).all()
    # parent of level-12 cell at level 8 == direct level-8 cell
    assert (s2_parent(c12, 8) == c8).all()
    # leaf cells agree too
    leaf = s2_cell_id(lat, lon, MAX_LEVEL)
    assert (s2_parent(leaf, 12) == c12).all()


def test_locality_and_distinctness():
    # nearby points share a coarse cell; far points do not
    base = s2_cell_id(np.array([52.0]), np.array([11.0]), 6)[0]
    near = s2_cell_id(np.array([52.01]), np.array([11.01]), 6)[0]
    far = s2_cell_id(np.array([-30.0]), np.array([100.0]), 6)[0]
    assert base == near
    assert base != far
    # a dense grid at level 12 produces many distinct cells
    g = np.linspace(50, 51, 50)
    la, lo = np.meshgrid(g, g)
    cells = s2_cell_id(la.ravel(), lo.ravel(), 12)
    assert len(np.unique(cells)) > 1000


def test_deterministic():
    lat = np.array([1.5, -33.9, 77.7])
    lon = np.array([100.1, 18.4, -5.0])
    a = s2_cell_id(lat, lon, 12)
    b = s2_cell_id(lat.copy(), lon.copy(), 12)
    assert (a == b).all()


def test_spark_udf(spark):
    from osmpbf_spark.functions.s2 import with_s2_cells
    df = spark.createDataFrame(
        [(52.0, 11.0), (52.0001, 11.0001), (None, None)],
        "lat double, lon double")
    rows = with_s2_cells(df, level=10).collect()
    vals = [r["s2_cell"] for r in rows]
    assert vals[0] == vals[1]           # same level-10 cell
    assert vals[2] is None
    want = s2_cell_id(np.array([52.0]), np.array([11.0]), 10)[0]
    assert vals[0] == want


def test_level0_face_anchors_public_constants():
    # External anchors from the PUBLISHED S2 bit layout: the level-0 cell
    # of any point on face f is exactly (f << 61) | (1 << 60) — for the
    # six cardinal directions the face is unambiguous.
    lat = np.array([0.0, 0.0, 90.0, 0.0, 0.0, -90.0])
    lon = np.array([0.0, 90.0, 0.0, 180.0, -90.0, 0.0])
    got = [int(v) for v in s2_cell_id(lat, lon, 0)]
    want = [(f << 61) | (1 << 60) for f in range(6)]
    want = [w - (1 << 64) if w >= (1 << 63) else w for w in want]
    assert got == want


def test_sql_oracle_matches_numpy_on_random_points():
    # the dual-rendered DuckDB implementation (recursive-CTE Hilbert walk)
    # must agree bit-for-bit with the numpy LUT path
    import duckdb

    from osmpbf_spark.functions.s2 import s2_oracle_sql
    rng = np.random.default_rng(11)
    lat = rng.uniform(-89.9, 89.9, 200)
    lon = rng.uniform(-179.9, 179.9, 200)
    pts = [(i, float(la), float(lo))
           for i, (la, lo) in enumerate(zip(lat, lon))]
    want = {i: int(v) for i, v in enumerate(s2_cell_id(lat, lon, 12))}
    got = dict(duckdb.sql(s2_oracle_sql(pts, 12)).fetchall())
    assert got == want
