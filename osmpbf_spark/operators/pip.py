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

import threading

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.grid import GRID_RES_FINE, grid_xy_sql
from ..session import local_relation

POLYGONS_DDL = ("poly_id string, "
                "ring array<struct<lat_nano:bigint,lon_nano:bigint>>")

# classified covers aggregate complete 2^4×2^4 full-cell blocks into one
# parent supercell at res - _COARSE_STEP (see _classified_cover)
_COARSE_STEP = 4


def ring_bounds_sql(ring: str = "ring", id_col: str = "poly_id") -> str:
    """Sentinel-initialized min/max lat/lon fold over a ring column —
    the ONE bbox fold shared by :func:`polygon_cover` and
    ``polyjoin._ring_side`` (code-review r5: two textually-diverging
    copies of this SQL existed; a fix applied to one would miss the
    other). Fields: ``min_lat, max_lat, min_lon, max_lon``.

    NULL-vertex defense rides INSIDE the fold: LEAST/GREATEST skip
    nulls, so a null struct or null lat/lon field would silently
    corrupt the bbox (the vertex's other field still widens it) and
    everything downstream of it — instead the first LEAST's argument
    gates every vertex and ``raise_error``s executor-side, during
    whatever job first evaluates the fold, at zero extra scan or
    action. This is what lets callers with an UNBOUNDED polygon side
    (``polyjoin``'s left layer) skip the driver-side probe entirely
    (code-review r5: the probe full-scanned the left table once just
    to check for nulls, then the real job scanned it again)."""
    gate = (f"IF(v.lat_nano IS NULL OR v.lon_nano IS NULL, "
            f"raise_error(concat('NULL vertex in ring of polygon ', "
            f"CAST({id_col} AS STRING), "
            f"' (unresolved ref?) - resolve or drop it first')), "
            f"v.lat_nano)")
    return (f"aggregate({ring}, struct("
            "CAST(9223372036854775807 AS BIGINT) AS min_lat, "
            "CAST(-9223372036854775808 AS BIGINT) AS max_lat, "
            "CAST(9223372036854775807 AS BIGINT) AS min_lon, "
            "CAST(-9223372036854775808 AS BIGINT) AS max_lon), "
            f"(acc, v) -> struct(LEAST(acc.min_lat, {gate}), "
            "GREATEST(acc.max_lat, v.lat_nano), "
            "LEAST(acc.min_lon, v.lon_nano), "
            "GREATEST(acc.max_lon, v.lon_nano)))")


_POLY_CACHE: list = []          # [(session, key, DataFrame)]
_POLY_CACHE_MAX = 16
_POLY_CACHE_LOCK = threading.Lock()


def make_polygons(spark, rows) -> DataFrame:
    """rows: [(poly_id, [(lat_nano, lon_nano), ...])] — ring must be closed
    (first == last vertex).

    Memoized by CONTENT (r6): identical ``rows`` in the same session
    return the SAME DataFrame object, so downstream object-identity
    caches — :func:`cover_for`'s memoized cover in particular — hit
    across repeated joins that rebuild their polygon set each call
    (VERDICT r5: "hold ONE DataFrame per polygon set to get the
    reuse"; this makes that automatic for the literal-rows entry
    point). A LocalRelation plan is immutable, so handing the same
    object out is safe; FIFO-capped alongside the cover cache."""
    key = tuple((poly_id, tuple(map(tuple, ring))) for poly_id, ring in rows)
    with _POLY_CACHE_LOCK:
        for s, k, df in reversed(_POLY_CACHE):
            if k == key and s is spark:
                try:
                    if df.sparkSession._sc._jsc is not None:
                        return df
                except Exception:
                    pass
    data = []
    for poly_id, ring in rows:
        if ring[0] != ring[-1]:
            raise ValueError(f"ring of {poly_id} is not closed")
        data.append((poly_id, [{"lat_nano": a, "lon_nano": b}
                               for a, b in ring]))
    # LocalTableScan, not a Python-RDD scan: a list-backed relation
    # re-runs a Python job on EVERY action referencing the ring table
    # (pip_join broadcasts it per action) — measured 1.38 → 1.15 s on
    # the full decode+PIP leg (r6); schema/values identical (asserted
    # in local_relation, pinned by test)
    df = local_relation(spark, data, POLYGONS_DDL)
    with _POLY_CACHE_LOCK:
        _POLY_CACHE.append((spark, key, df))
        while len(_POLY_CACHE) > _POLY_CACHE_MAX:
            _POLY_CACHE.pop(0)
    return df


def polygon_cover(polygons: DataFrame, res: int = GRID_RES_FINE,
                  *, tight: bool | str = "auto",
                  classify: bool = False) -> DataFrame:
    """(cell, poly_id) for every grid cell whose row intersects the
    polygon — a per-cell-row SCANLINE, not the full bbox: each bbox row
    keeps only the x-span of ring edges crossing that row's lat band
    (±1-cell float-safety pad), so large concave/diagonal polygons emit
    far fewer candidate cells for the exact refine. ``tight=False``
    restores the plain bbox cover. Runs distributed via sequence-explode;
    result is small (cells-per-polygon) and meant for broadcast.

    ``tight="auto"`` (default, VERDICT r2 #1): the scanline adds three
    fixed stages (edge explode → broadcast band join → groupBy).  A ring
    with ≤ 4 edges is a (possibly degenerate) quadrilateral whose per-row
    x-span wastes at most ~half the bbox row, so the refine — exact and
    codegen'd either way — never sees enough extra candidates to repay
    those stages; concavity needs ≥ 5 edges.  Auto therefore engages the
    scanline only when some ring has > 4 edges, decided by one scalar
    aggregate on the polygons side (broadcast-small by contract — the
    same tiny-metadata job class as ``plans/audit.py``).

    Antimeridian-crossing rings (max-lon − min-lon > 180°) are handled by
    :func:`split_antimeridian` — call it first (``pip_join`` does);
    ``polygon_cover`` itself still assumes x does not wrap.

    Raises on rings containing NULL vertices (null struct or null
    lat/lon field): they would silently corrupt both the bbox cover
    and the ray cast's crossing parity — quarantined, not guessed.
    With ``tight="auto"`` the raise is an eager driver-side ValueError
    (the probe below); with an explicit ``tight`` it surfaces
    executor-side from the bbox fold's gate when the cover job runs
    (``ring_bounds_sql``) — no extra scan of the polygons side, which
    matters for the one caller that feeds an UNBOUNDED layer here
    (``polyjoin``'s left side, always ``tight=False``).

    ``classify=True`` (r6, guide §1.2 "the distributed algorithm"):
    returns (poly_id, _ck, cell, full) instead of (poly_id, cell) —
    every bbox cell is classified as BOUNDARY (some ring edge may pass
    through it; ``full=false``, must be refined), FULL (no edge touches
    it and its center is inside; ``full=true``, every point in it is
    inside — the per-point ray cast is skippable), or fully OUTSIDE
    (no edge touches it, center outside — dropped from the cover, so
    its points never even reach the refine). Classification reuses the
    scanline's per-edge band spans with the same ±1-cell float-safety
    pad, so a cell is only called uniform when it is ≥ 1 cell away
    from every edge's padded span — exact by the same argument that
    makes the tight cover lossless. The center test is the exact
    integer ray cast, run once per uniform COVER cell (broadcast-small
    side) instead of once per point. ``tight`` extent-tightening is
    subsumed (uniform-outside cells are dropped entirely) and ignored.
    ``_ck`` (the ring-content key) is kept so callers can join the
    matching antimeridian ring copy without fanning out."""
    if classify:
        return _classified_cover(polygons, res)
    if tight == "auto":
        # one scalar probe over the broadcast-small polygon side serves
        # two jobs: the tight="auto" edge-count decision AND an eager
        # null-vertex ValueError (nicer than the executor-side raise
        # when a probe is running anyway). Explicit-tight callers skip
        # the probe — and with it the extra scan (code-review r5: the
        # unconditional probe full-scanned polyjoin's unbounded left
        # side once per join, with the max(size) half pure waste).
        chk = polygons.agg(
            F.max(F.size("ring")).alias("m"),
            F.sum(F.expr("CAST(exists(ring, v -> v.lat_nano IS NULL "
                         "OR v.lon_nano IS NULL) AS INT)")).alias("nullv")
        ).first()
        if chk["nullv"]:
            raise ValueError(
                f"polygon_cover: {chk['nullv']} polygon(s) contain NULL "
                "vertices (unresolved ref?) — resolve or drop them first")
        tight = (chk["m"] or 0) > 5   # closed ring: 5 verts == 4 edges
    n = 1 << res
    # ring-content key: antimeridian-split copies share poly_id but must
    # NOT pool their edges in the scanline band join (pooled min/max
    # degenerates the span to the full bbox row); identical rings
    # colliding is harmless (min/max unaffected)
    polygons = polygons.withColumn("_ck", F.xxhash64("ring"))
    bounds = polygons.select(
        "poly_id", "_ck", "ring",
        F.expr(ring_bounds_sql("ring", "poly_id")).alias("b"))
    # x stays UNWRAPPED (wrap=False) then clamps to [0, n-1]: an
    # antimeridian-split ring copy has lons past ±180°, whose in-range
    # slice is exactly the clamped x-range (the other side comes from the
    # ∓360°-shifted copy); fully out-of-range copies are filtered out.
    xy = bounds.select(
        "poly_id", "_ck", "ring",
        F.expr(grid_xy_sql("b.min_lat", "b.min_lon", res, "spark",
                           wrap=False)[0]).alias("x0r"),
        F.expr(grid_xy_sql("b.max_lat", "b.max_lon", res, "spark",
                           wrap=False)[0]).alias("x1r"),
        F.expr(grid_xy_sql("b.min_lat", "b.min_lon", res, "spark")[1])
        .alias("y0"),
        F.expr(grid_xy_sql("b.max_lat", "b.max_lon", res, "spark")[1])
        .alias("y1"))
    from ..functions.grid import NANO_180, NANO_360, RES_SHIFT, Y_SHIFT
    xy = (xy.filter((F.col("x1r") >= 0) & (F.col("x0r") <= n - 1))
          .select("poly_id", "_ck", "ring",
                  F.greatest(F.col("x0r"), F.lit(0)).alias("x0"),
                  F.least(F.col("x1r"), F.lit(n - 1)).alias("x1"),
                  "y0", "y1"))
    rows = xy.select("poly_id", "_ck", "ring", "x0", "x1",
                     F.explode(F.expr("sequence(y0, y1)")).alias("cy"))
    if tight:
        band_h = NANO_360 / 2 / n   # lat height of one cell row (double)
        # EDGES AS ROWS, not a per-row HOF: higher-order lambdas are
        # interpreted in Spark, and inlining the edge array into each
        # exploded row would re-evaluate it O(edges × rows) times. One
        # explode per polygon, then a codegen'd band join + hash
        # aggregate does the same scanline.
        edges = (polygons
                 .select("poly_id", "_ck", F.explode(F.expr(
                     "zip_with(slice(ring, 1, size(ring) - 1), "
                     "slice(ring, 2, size(ring) - 1), (a, b) -> struct("
                     "CAST(LEAST(a.lat_nano, b.lat_nano) AS DOUBLE) AS lo, "
                     "CAST(GREATEST(a.lat_nano, b.lat_nano) AS DOUBLE) AS hi, "
                     "CAST(a.lat_nano AS DOUBLE) AS la1, "
                     "CAST(a.lon_nano AS DOUBLE) AS lo1, "
                     "CAST(b.lat_nano AS DOUBLE) AS la2, "
                     "CAST(b.lon_nano AS DOUBLE) AS lo2))")).alias("e"))
                 .select("poly_id", "_ck", "e.*"))
        blo = F.col("cy") * F.lit(band_h) - F.lit(9e10) - F.lit(1.0)
        bhi = ((F.col("cy") + 1) * F.lit(band_h) - F.lit(9e10)
               + F.lit(1.0))

        def lon_at(t):
            # lon of the edge at lat t clamped into the edge's lat range
            return (F.col("lo1") + (F.col("lo2") - F.col("lo1"))
                    * (F.greatest(F.least(t, F.col("hi")), F.col("lo"))
                       - F.col("la1")) / (F.col("la2") - F.col("la1")))
        flat = F.col("la1") == F.col("la2")
        l0, l1 = lon_at(blo), lon_at(bhi)
        hit = (rows.join(F.broadcast(edges), ["poly_id", "_ck"])
               .filter((F.col("lo") <= bhi) & (F.col("hi") >= blo))
               .select("poly_id", "_ck", "cy", "x0", "x1",
                       F.when(flat, F.least("lo1", "lo2"))
                       .otherwise(F.least(l0, l1)).alias("lmn"),
                       F.when(flat, F.greatest("lo1", "lo2"))
                       .otherwise(F.greatest(l0, l1)).alias("lmx")))
        span = hit.groupBy("poly_id", "_ck", "cy", "x0", "x1").agg(
            F.min("lmn").alias("mn"), F.max("lmx").alias("mx"))
        # double→cell x with a ±1-cell pad (every bbox row of a closed
        # ring meets ≥1 edge, so the groupBy loses no rows)
        xf = (f"CAST(floor(({{m}} + {180_000_000_000}D) * {n} "
              f"/ {360_000_000_000}D) AS BIGINT)")
        rows = span.select(
            "poly_id", "cy",
            F.expr(f"GREATEST(x0, {xf.format(m='mn')} - 1)").alias("rx0"),
            F.expr(f"LEAST(x1, {xf.format(m='mx')} + 1)").alias("rx1"))
    else:
        rows = rows.select("poly_id", "cy", F.col("x0").alias("rx0"),
                           F.col("x1").alias("rx1"))
    return (rows
            .select("poly_id", "cy",
                    F.explode(F.expr("sequence(rx0, rx1)")).alias("cx"))
            .select("poly_id",
                    (F.lit(res).cast("long") * F.lit(RES_SHIFT)
                     + F.col("cx") * F.lit(Y_SHIFT)
                     + F.col("cy")).alias("cell")))


def _classified_cover(polygons: DataFrame, res: int) -> DataFrame:
    """Classified cover: (poly_id, _ck, cell, full) — see
    :func:`polygon_cover` ``classify=True``. Boundary detection reuses
    the scanline's per-edge lat-band lon spans (double interpolation
    with the same ±1 nano and ±1 cell pads, so float error can only
    WIDEN the boundary set); uniform cells run ONE exact integer ray
    cast on their center, and keep (full) or drop (outside) the cell."""
    from ..functions.grid import (
        NANO_90,
        NANO_180,
        NANO_360,
        RES_SHIFT,
        Y_SHIFT,
        cell_xy,
    )
    n = 1 << res
    polygons = polygons.withColumn("_ck", F.xxhash64("ring"))
    bounds = polygons.select(
        "poly_id", "_ck", "ring",
        F.expr(ring_bounds_sql("ring", "poly_id")).alias("b"))
    xy = bounds.select(
        "poly_id", "_ck", "ring",
        F.expr(grid_xy_sql("b.min_lat", "b.min_lon", res, "spark",
                           wrap=False)[0]).alias("x0r"),
        F.expr(grid_xy_sql("b.max_lat", "b.max_lon", res, "spark",
                           wrap=False)[0]).alias("x1r"),
        F.expr(grid_xy_sql("b.min_lat", "b.min_lon", res, "spark")[1])
        .alias("y0"),
        F.expr(grid_xy_sql("b.max_lat", "b.max_lon", res, "spark")[1])
        .alias("y1"))
    xy = (xy.filter((F.col("x1r") >= 0) & (F.col("x0r") <= n - 1))
          .select("poly_id", "_ck", "ring",
                  F.greatest(F.col("x0r"), F.lit(0)).alias("x0"),
                  F.least(F.col("x1r"), F.lit(n - 1)).alias("x1"),
                  "y0", "y1"))
    # one row per (ring copy, cell row)
    rows = xy.select("poly_id", "_ck", "ring", "x0", "x1",
                     F.explode(F.expr("sequence(y0, y1)")).alias("cy"))
    # Everything below is ROW-LOCAL on the (small by contract) polygons
    # side — no join, no shuffle, same stage count as the bbox cover.
    # Per-edge lat-band lon spans: same construction and pads as the
    # tight scanline above, rendered as a nested HOF over the ring
    # (edge counts here are polygon complexity, not data volume).
    band_h = NANO_360 / 2 / n
    blo = f"(cy * {band_h!r}D - {float(NANO_90)!r}D - 1.0D)"
    bhi = f"((cy + 1) * {band_h!r}D - {float(NANO_90)!r}D + 1.0D)"

    def lon_at(t):
        return (f"(e.lo1 + (e.lo2 - e.lo1) * "
                f"(GREATEST(LEAST({t}, e.hi), e.lo) - e.la1) / "
                f"(e.la2 - e.la1))")
    l0, l1 = lon_at(blo), lon_at(bhi)
    lmn = (f"CASE WHEN e.la1 = e.la2 THEN LEAST(e.lo1, e.lo2) "
           f"ELSE LEAST({l0}, {l1}) END")
    lmx = (f"CASE WHEN e.la1 = e.la2 THEN GREATEST(e.lo1, e.lo2) "
           f"ELSE GREATEST({l0}, {l1}) END")
    xf = (f"CAST(floor(({{m}} + {NANO_180}D) * {n} "
          f"/ {NANO_360}D) AS BIGINT)")
    ed = ("zip_with(slice(ring, 1, size(ring) - 1), "
          "slice(ring, 2, size(ring) - 1), (a, b) -> struct("
          "CAST(LEAST(a.lat_nano, b.lat_nano) AS DOUBLE) AS lo, "
          "CAST(GREATEST(a.lat_nano, b.lat_nano) AS DOUBLE) AS hi, "
          "CAST(a.lat_nano AS DOUBLE) AS la1, "
          "CAST(a.lon_nano AS DOUBLE) AS lo1, "
          "CAST(b.lat_nano AS DOUBLE) AS la2, "
          "CAST(b.lon_nano AS DOUBLE) AS lo2))")
    # NULL span = edge misses the band, or its padded span falls outside
    # the in-range x window of an antimeridian copy — dropped by the
    # filter; the ROW survives, its cells classified by the center test
    spans = (f"sort_array(filter(transform({ed}, e -> "
             f"CASE WHEN e.lo <= {bhi} AND e.hi >= {blo} THEN struct("
             f"GREATEST(x0, {xf.format(m=f'({lmn})')} - 1) AS bx0, "
             f"LEAST(x1, {xf.format(m=f'({lmx})')} + 1) AS bx1) END), "
             f"s -> s.bx1 >= s.bx0))")
    # classification at INTERVAL granularity: merge the sorted spans
    # (boundary intervals), complement them within [x0, x1] (uniform
    # intervals), and ray cast ONE center per uniform interval — cells
    # inside one interval share parity (no edge passes through any of
    # them, and adjacent same-row cells connect without crossing an
    # edge). Cost is O(rows × edges), independent of how many cells
    # the intervals explode to.
    merged = (f"aggregate({spans}, "
              "CAST(array() AS ARRAY<STRUCT<lo:BIGINT,hi:BIGINT>>), "
              "(acc, s) -> CASE WHEN size(acc) > 0 "
              "AND s.bx0 <= element_at(acc, -1).hi + 1 "
              "THEN concat(slice(acc, 1, size(acc) - 1), "
              "array(struct(element_at(acc, -1).lo AS lo, "
              "GREATEST(element_at(acc, -1).hi, s.bx1) AS hi))) "
              "ELSE concat(acc, array(struct(s.bx0 AS lo, s.bx1 AS hi))) "
              "END)")
    gaps = ("filter(zip_with("
            "concat(array(x0), transform(w.m, t -> t.hi + 1)), "
            "concat(transform(w.m, t -> t.lo - 1), array(x1)), "
            "(s, e) -> struct(s AS lo, e AS hi)), g -> g.hi >= g.lo)")
    # exact integer cell-center coordinates (strictly inside the cell:
    # the grid divisors never divide NANO_180/NANO_360 exactly, and the
    # floor error < one cell)
    clat = f"(((2 * cy + 1) * {NANO_180}) DIV {2 * n}) - {NANO_90}"
    clon = f"(((2 * g.lo + 1) * {NANO_360}) DIV {2 * n}) - {NANO_180}"
    in_gap = _RAY_CAST.format(px=clon, py=clat, ring="ring")
    # w-wrapper = a let-binding: the merged-span array evaluates ONCE
    # per row even though the interval builder references it four times
    # (projection collapse would otherwise re-inline the whole span
    # pipeline per reference — the known interpreted-HOF trap)
    ivs = (f"element_at(transform(array(struct(({merged}) AS m)), w -> "
           f"concat("
           f"transform(w.m, s -> struct(s.lo AS lo, s.hi AS hi, "
           f"false AS full)), "
           f"transform(filter({gaps}, g -> {in_gap}), "
           f"g -> struct(g.lo AS lo, g.hi AS hi, true AS full)))), 1)")
    cell_id = (F.lit(res).cast("long") * F.lit(RES_SHIFT)
               + F.col("cx") * F.lit(Y_SHIFT) + F.col("cy"))
    fine = (rows
            .select("poly_id", "_ck", "cy",
                    F.explode(F.expr(ivs)).alias("iv"))
            .select("poly_id", "_ck", "cy", F.col("iv.full").alias("full"),
                    F.explode(F.expr("sequence(iv.lo, iv.hi)")).alias("cx"))
            .select("poly_id", "_ck", cell_id.alias("cell"), "full"))
    if res < _COARSE_STEP:
        return fine
    # COARSEN the interior (r6, guide §2.3 "shuffle fewer bytes" applied
    # to the broadcast): complete 2^4×2^4 blocks of FULL cells collapse
    # into one parent supercell at res-4 — a planet-band cover shrinks
    # ~50×, so the per-action BroadcastExchange build (measured ~1 s of
    # the decode+PIP leg at a 1.4M-cell cover) almost vanishes.
    # Mixed-res rows cannot collide: the res field is encoded in the
    # cell id. ``pip_join`` probes points by BOTH their fine cell and
    # its res-4 parent (see the `_osmpbf_coarse_res` marker).
    cres = res - _COARSE_STEP
    k = 1 << _COARSE_STEP
    r0, x, y = cell_xy("cell")
    parent = (F.lit(cres).cast("long") * F.lit(RES_SHIFT)
              + (x / k).cast("long") * F.lit(Y_SHIFT)
              + (y / k).cast("long"))
    fullc = fine.filter("full").withColumn("pcell", parent)
    counts = (fullc.groupBy("poly_id", "_ck", "pcell")
              .agg(F.count("*").alias("_n")))
    coarse = (counts.filter(F.col("_n") == k * k)
              .select("poly_id", "_ck", F.col("pcell").alias("cell"),
                      F.lit(True).alias("full")))
    # the anti-join's right side is one row per COMPLETE parent block —
    # cover-scale/256, broadcast-small by the same contract as the
    # polygons side (and without the hint the unknown post-aggregation
    # stats plan a SortMergeJoin, shuffling the cover build)
    resid_full = (fullc.join(F.broadcast(
        counts.filter(F.col("_n") == k * k)
        .select("poly_id", "_ck", "pcell")),
        ["poly_id", "_ck", "pcell"], "left_anti")
        .select("poly_id", "_ck", "cell", "full"))
    out = (fine.filter(~F.col("full"))
           .unionByName(resid_full).unionByName(coarse))
    out._osmpbf_coarse_res = cres
    return out


def split_antimeridian(polygons: DataFrame) -> DataFrame:
    """Handle rings crossing ±180° (VERDICT r2 #8). Contract: a crossing
    ring is given with UNWRAPPED lons — contiguous values running past
    ±180e9 (e.g. 175e9 … 185e9) — so it stays simple in lon space. Each
    crossing ring gains a ∓360°-shifted copy; between the two copies the
    full in-range [-180°, 180°) extent is covered, and a point can be
    inside at most one copy (their in-range lon slices are disjoint), so
    the refine union is exact with no duplicates. Non-crossing rings pass
    through as a single row. Per-polygon HOFs only — the polygons side is
    broadcast-small by contract.

    Rings TOUCHING ±180° exactly (max lon == +180e9 or min lon ==
    -180e9, no strict crossing) also gain the shifted copy (code-review
    r5): two polygons meeting at the antimeridian from opposite sides
    otherwise live in disjoint plane frames and ``polyjoin`` would miss
    their boundary contact. The copy is harmless for PIP — its interior
    lies wholly outside [-180°, 180°), so no in-range point can be
    inside both copies and no duplicates arise."""
    from ..functions.grid import NANO_180, NANO_360
    shifts = F.expr(
        f"CASE WHEN aggregate(ring, CAST(-{NANO_360} AS BIGINT), "
        f"(a, v) -> GREATEST(a, v.lon_nano)) >= {NANO_180} "
        f"THEN array(0L, CAST(-{NANO_360} AS BIGINT)) "
        f"WHEN aggregate(ring, CAST({NANO_360} AS BIGINT), "
        f"(a, v) -> LEAST(a, v.lon_nano)) <= -{NANO_180} "
        f"THEN array(0L, CAST({NANO_360} AS BIGINT)) "
        f"ELSE array(0L) END")
    return (polygons
            .withColumn("_sh", F.explode(shifts))
            .withColumn("ring", F.expr(
                "transform(ring, v -> struct(v.lat_nano AS lat_nano, "
                "v.lon_nano + _sh AS lon_nano))"))
            .drop("_sh"))


# Exact even-odd ray cast as a Catalyst expression. px/py are point
# lon/lat nanodegrees; {ring} is an array<struct<lat_nano,lon_nano>>
# column. Cross product in DECIMAL(38,0): |values| < 4e11, products
# < 1.6e23 — exact within 38 digits.
_RAY_CAST = """
(
  aggregate(
    sequence(1, size({ring}) - 1),
    0L,
    (acc, i) -> acc + IF(
      (element_at({ring}, i).lat_nano >  {py}) !=
      (element_at({ring}, i + 1).lat_nano > {py})
      AND (
        CASE WHEN element_at({ring}, i + 1).lat_nano >
                  element_at({ring}, i).lat_nano
        THEN (CAST({px} - element_at({ring}, i).lon_nano AS DECIMAL(38,0)) *
              CAST(element_at({ring}, i + 1).lat_nano -
                   element_at({ring}, i).lat_nano AS DECIMAL(38,0)))
           < (CAST(element_at({ring}, i + 1).lon_nano -
                   element_at({ring}, i).lon_nano AS DECIMAL(38,0)) *
              CAST({py} - element_at({ring}, i).lat_nano AS DECIMAL(38,0)))
        ELSE (CAST({px} - element_at({ring}, i).lon_nano AS DECIMAL(38,0)) *
              CAST(element_at({ring}, i + 1).lat_nano -
                   element_at({ring}, i).lat_nano AS DECIMAL(38,0)))
           > (CAST(element_at({ring}, i + 1).lon_nano -
                   element_at({ring}, i).lon_nano AS DECIMAL(38,0)) *
              CAST({py} - element_at({ring}, i).lat_nano AS DECIMAL(38,0)))
        END
      ), 1L, 0L)
  ) % 2 = 1
)
"""


def point_in_ring_expr(px: str, py: str, ring: str = "ring"):
    """Exact even-odd test of point (lon=px, lat=py) against the ring
    column named ``ring`` — usable anywhere a boolean Catalyst
    expression fits (``operators/polyjoin.py`` aims it at each side of
    a polygon pair)."""
    return F.expr(_RAY_CAST.format(px=px, py=py, ring=ring))


_COVER_CACHE: list[tuple[DataFrame, int, object, DataFrame]] = []
_COVER_CACHE_MAX = 16
# ADVICE r4: probe/insert/evict race under multi-threaded drivers (a
# legitimate Spark pattern for concurrent job submission); the lock
# costs ns against the ~0.45 s cover build it guards
_COVER_CACHE_LOCK = threading.Lock()


def cover_for(polygons: DataFrame, res: int = GRID_RES_FINE, *,
              tight: bool | str = "auto") -> DataFrame:
    """Memoized ``split_antimeridian`` + :func:`polygon_cover` per
    (polygons DataFrame, res, tight) — repeated :func:`pip_join` calls
    against the same polygon set skip the three cover stages AND the
    ``tight="auto"`` driver-side probe (VERDICT r3 #7).

    Matching is by OBJECT IDENTITY of the polygons DataFrame (``is``):
    a pure-Python probe that costs nothing on misses. Two rejected
    designs, both measured on the decode+PIP bench (2M nodes, fresh
    polygons per run, i.e. all-miss): persisting every miss added
    ~1.1 s/join of never-reused materialization, and ``sameSemantics``
    probing added ~75 ms/entry of JVM plan canonicalization — while
    separately-created but identical LocalRelations are never
    ``sameSemantics`` anyway, so plan-level matching bought no extra
    hits. Hold ONE DataFrame per polygon set to get the reuse (as
    ``jobs/decode_pip_job.py`` does). Persist happens on the FIRST
    HIT, when reuse is proven; the cover is broadcast-small by
    contract, so that is a few KB of executor memory per
    actually-reused set. Entries from stopped sessions are evicted;
    FIFO-capped at ``_COVER_CACHE_MAX`` sets."""
    with _COVER_CACHE_LOCK:
        for i in range(len(_COVER_CACHE) - 1, -1, -1):
            entry = _COVER_CACHE[i]
            p, r, t, c = entry[0], entry[1], entry[2], entry[3]
            try:
                if p.sparkSession._sc._jsc is None:  # stopped session
                    _COVER_CACHE.pop(i)              # (code-review r4:
                    continue                         # probe, don't wait
            except Exception:                        # for an exception)
                _COVER_CACHE.pop(i)
                continue
            if r == res and t == tight and p is polygons:
                if not entry[4]:
                    c.persist()
                    entry[4] = True
                return c
    # build OUTSIDE the lock — the ~0.45 s cover build (and tight="auto"
    # probe action) must not serialize concurrent joins on distinct
    # polygon sets; a racing duplicate build is benign (both entries
    # land, unpersisted-until-hit, FIFO-evicted later)
    cover = polygon_cover(split_antimeridian(polygons), res, tight=tight,
                          classify=True)
    with _COVER_CACHE_LOCK:
        _COVER_CACHE.append([polygons, res, tight, cover, False])
        while len(_COVER_CACHE) > _COVER_CACHE_MAX:
            old = _COVER_CACHE.pop(0)
            try:
                if old[4]:
                    old[3].unpersist()
            except Exception:
                pass
    return cover


def pip_join(points: DataFrame, polygons: DataFrame, *,
             res: int = GRID_RES_FINE, cell_col: str = "cell",
             salt_n: int | None = None, tight: bool | str = "auto",
             cover: DataFrame | None = None) -> DataFrame:
    """points (with ``cell``, ``lat_nano``, ``lon_nano``) ⋈ polygons →
    rows of points inside each polygon (point columns + poly_id).

    Plan shape at scale: big-side scan → broadcast hash join on cell →
    broadcast hash join on poly_id (ring fetch) → codegen'd refine filter.
    The big side never shuffles. ``salt_n`` spreads hot cells before the
    join when a megacity cell dominates (north_rule skew handling).
    Antimeridian-crossing rings (unwrapped lons) are split transparently.

    The cover is cached per (polygon plan, res) by default
    (:func:`cover_for`), so repeated joins against one polygon set
    compute it once. Pass ``cover=`` to share an explicitly precomputed
    :func:`polygon_cover` instead (it must have been built from
    ``split_antimeridian(polygons)`` at this ``res``).
    """
    polys = split_antimeridian(polygons)
    if cover is None:
        cover = cover_for(polygons, res, tight=tight)
    pts = points
    if salt_n:
        from ..functions.grid import salted_repartition
        pts = salted_repartition(pts, cell_col, salt_n)
    if "full" in cover.columns:
        # classified cover (r6): candidates from FULL cells are inside by
        # construction — the interpreted ray-cast fold runs only for
        # boundary-cell candidates (OR short-circuits per row), and
        # uniform-outside cells never entered the cover at all. The ring
        # join carries _ck so each candidate meets only the antimeridian
        # ring copy whose cover produced it (no fan-out).
        cres = getattr(cover, "_osmpbf_coarse_res", None)
        if cres is not None:
            # coarsened cover: points probe BOTH their fine cell and
            # its res-4 parent (the two row classes partition each
            # polygon's interior, so every (point, polygon) pair
            # matches exactly one cover row)
            from ..functions.grid import RES_SHIFT, Y_SHIFT, cell_xy
            k = 1 << _COARSE_STEP
            _, x, y = cell_xy(cell_col)
            parent = (F.lit(cres).cast("long") * F.lit(RES_SHIFT)
                      + (x / k).cast("long") * F.lit(Y_SHIFT)
                      + (y / k).cast("long"))
            keyed = pts.withColumn(
                "_jkey", F.explode(F.array(F.col(cell_col), parent)))
            cand = (keyed.join(F.broadcast(cover),
                               keyed["_jkey"] == cover["cell"])
                    .drop("_jkey").drop(cover["cell"]))
        else:
            cand = (pts.join(F.broadcast(cover),
                             pts[cell_col] == cover["cell"])
                    .drop(cover["cell"]))
        polys = polys.withColumn("_ck", F.xxhash64("ring"))
        withring = cand.join(F.broadcast(polys), ["poly_id", "_ck"])
        return (withring
                .filter(F.col("full")
                        | point_in_ring_expr("lon_nano", "lat_nano"))
                .drop("ring", "full", "_ck"))
    cand = pts.join(F.broadcast(cover),
                    pts[cell_col] == cover["cell"]).drop(cover["cell"])
    withring = cand.join(F.broadcast(polys), "poly_id")
    return (withring
            .filter(point_in_ring_expr("lon_nano", "lat_nano"))
            .drop("ring"))
