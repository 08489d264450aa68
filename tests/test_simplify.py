"""Douglas–Peucker simplification: mask-level properties + the Spark
column surface (row-local plan, NULL passthrough, ring closure)."""

import random

import numpy as np
import pytest
from pyspark.sql import functions as F

from osmpbf_spark.operators.simplify import (
    dp_mask,
    simplify_geometry,
    simplify_points,
)


def _pt(la, lo):
    return {"lat_nano": la, "lon_nano": lo}


def test_spike_kept_jitter_removed():
    # baseline y=0 with tiny jitter ±2, one spike to 1000 at x=5
    pts = [_pt((-1) ** i * 2 if i not in (0, 5, 9) else
               (1000 if i == 5 else 0), i * 100) for i in range(10)]
    out = simplify_points(pts, eps=10.0)
    lats = [p["lat_nano"] for p in out]
    assert out[0] == pts[0] and out[-1] == pts[-1]   # endpoints survive
    assert 1000 in lats                              # spike survives
    assert len(out) < len(pts)                       # jitter dropped


def test_dropped_points_within_epsilon_of_enclosing_line():
    rng = random.Random(1234)
    for _ in range(50):
        n = rng.randrange(3, 40)
        xs = np.cumsum([rng.uniform(1, 10) for _ in range(n)])
        ys = np.array([rng.uniform(-50, 50) for _ in range(n)])
        eps = rng.uniform(1, 60)
        keep = dp_mask(xs, ys, eps)
        kept_idx = np.flatnonzero(keep)
        for a, b in zip(kept_idx, kept_idx[1:]):
            if b - a < 2:
                continue
            ax, ay, bx, by = xs[a], ys[a], xs[b], ys[b]
            dx, dy = bx - ax, by - ay
            seg2 = dx * dx + dy * dy
            px, py = xs[a + 1:b], ys[a + 1:b]
            if seg2 == 0:
                d2 = (px - ax) ** 2 + (py - ay) ** 2
            else:
                cr = dx * (py - ay) - dy * (px - ax)
                d2 = cr * cr / seg2
            assert (d2 <= eps * eps + 1e-9).all()


def test_idempotent():
    rng = random.Random(77)
    for _ in range(30):
        n = rng.randrange(2, 60)
        pts = [_pt(rng.randrange(-10_000, 10_000),
                   rng.randrange(-10_000, 10_000) + 1000 * i)
               for i in range(n)]
        eps = rng.uniform(0, 5000)
        once = simplify_points(pts, eps)
        twice = simplify_points(once, eps)
        assert twice == once


def test_closed_ring_keeps_closure():
    sq = [_pt(0, 0), _pt(0, 1000), _pt(3, 2000), _pt(0, 3000),
          _pt(1000, 3000), _pt(1000, 0), _pt(0, 0)]
    out = simplify_points(sq, eps=10.0)
    assert out[0] == out[-1] == _pt(0, 0)
    # the 3-nano bump on the top edge is gone, corners survive
    assert _pt(3, 2000) not in out
    assert _pt(1000, 3000) in out and _pt(1000, 0) in out


def test_spark_surface_rowlocal_and_null(spark):
    rows = [
        (1, [_pt(0, 0), _pt(2, 500), _pt(0, 1000), _pt(1000, 2000)]),
        (2, None),
        (3, [_pt(5, 5)]),
    ]
    df = spark.createDataFrame(
        rows, "id long, line array<struct<lat_nano:bigint,lon_nano:bigint>>")
    out = df.select("id", simplify_geometry("line", 10.0).alias("s"))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan          # row-local, no shuffle
    got = {r["id"]: r["s"] for r in out.collect()}
    assert got[2] is None
    assert [tuple(p) for p in got[3]] == [(5, 5)]
    assert [tuple(p) for p in got[1]] == [(0, 0), (0, 1000), (1000, 2000)]


def test_null_vertex_raises_loudly(spark):
    """A NULL vertex inside a geometry (null struct or null field) must
    raise, not silently collapse to endpoints — the same
    quarantine-don't-guess contract as way_polylines /
    multipolygon_rings (which filter such ways before building
    arrays)."""
    import pytest
    from pyspark.errors.exceptions.captured import PythonException

    rows = [(1, [_pt(0, 0), None, _pt(0, 1000), _pt(1000, 2000)])]
    df = spark.createDataFrame(
        rows, "id long, line array<struct<lat_nano:bigint,lon_nano:bigint>>")
    with pytest.raises(PythonException, match="NULL vertex"):
        df.select(simplify_geometry("line", 10.0).alias("s")).collect()
