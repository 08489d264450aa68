"""Web-mercator tile tests vs the published formula (py_tile_xy) and
known tile coordinates."""

from osmpbf_spark.functions.grid import RES_SHIFT, Y_SHIFT
from osmpbf_spark.functions.tiles import py_tile_xy, with_tiles


def test_known_tiles():
    # well-known: (52.5167, 13.3833) zoom 12 → x=2200, y=1343 (Berlin)
    assert py_tile_xy(52.5167, 13.3833, 12) == (2200, 1343)
    # equator/greenwich at z1 → (1, 1) SE quadrant boundary
    assert py_tile_xy(0.0, 0.0, 1) == (1, 1)
    assert py_tile_xy(0.0, -0.0001, 1) == (0, 1)
    # poles clamp into range
    assert py_tile_xy(89.9, 0.0, 4)[1] == 0
    assert py_tile_xy(-89.9, 0.0, 4)[1] == 15


def test_spark_matches_python(spark):
    pts = [(52.5167, 13.3833), (0.0, 0.0), (85.2, 179.9999),
           (-85.2, -179.9999), (52.11992359584, 11.62564468943),
           (-33.86, 151.21), (40.71, -74.0), (90.0, 180.0)]
    df = spark.createDataFrame(pts, "lat double, lon double")
    rows = with_tiles(df, zoom=12).collect()
    for (la, lo), r in zip(pts, rows):
        x, y = py_tile_xy(la, lo, 12)
        want = 12 * RES_SHIFT + x * Y_SHIFT + y
        assert r["tile"] == want, (la, lo)
