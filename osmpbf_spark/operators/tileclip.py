"""Vector-tile cutting: clip geometry to slippy-tile rectangles and
quantize to tile-local integer coordinates.

The tiling half of the north_star's "raster-tile↔vector assignment"
beyond centroid assignment (``functions.tiles``): a real tile pipeline
(the public Mapbox-Vector-Tile / tippecanoe shape) cuts every geometry
at tile boundaries so each tile ships only the vertices it draws, then
quantizes vertices to an integer extent (MVT's 4096). The reference
decodes elements and stops (`/root/reference/src/elements.rs`); this is
the downstream operator every consumer builds next.

Spark shape, designed for 10¹²-element scale:

- covering tiles from the geometry bbox — pure JVM math (the same
  published slippy formulas as ``functions.tiles``), one
  ``explode(sequence × sequence)``: a geometry spanning T tiles emits T
  rows, linear in OUTPUT size, no shuffle; a loud zoom-independent
  wrap defense (bbox wider than half the world in lon) excludes
  antimeridian-wrapped geometry before it can explode the cover, with
  an optional absolute ``max_tiles`` cap on top;
- geometries fully inside their tile pass through on the JVM (the
  dominant case at high zoom); boundary crossers clip in an
  Arrow-batched ``pandas_udf`` that processes the WHOLE batch as flat
  segmented numpy (``_clip_rings_batch`` / ``_clip_lines_batch``):
  Sutherland–Hodgman for rings, Liang–Barsky for polylines, one set of
  half-plane/parametric ops across every (geometry, tile) pair of the
  batch — no Python per-vertex OR per-pair loop in the math;
- quantization is pure Catalyst (one flat ``transform`` over the
  clipped array — trig built-ins, no UDF), so a quantize-only pipeline
  never leaves the JVM;
- the only shuffle in ``build_vector_tiles`` is the final
  ``groupBy(zoom, tx, ty)`` that collects a tile's features — keyed by
  tile, the partitioning a tile server wants at rest; megacity tiles
  are the usual skew and AQE handles the build-side split (same policy
  as the PIP join; pass ``salt_n`` there for the extreme case).

Tile rectangles are axis-aligned in (lat, lon): a slippy tile's north/
south edges are constant-latitude lines, east/west constant-longitude,
so clipping in nano-degree space against the latitude/longitude bounds
is exact — no projection round-trip. Intersection vertices are rounded
to the nearest nano-degree (≤ 0.5 nano ≈ 0.06 µm error) so clipped
output keeps the engine's standard geometry schema
(``array<struct<lat_nano:bigint,lon_nano:bigint>>``) and feeds
``simplify`` / shoelace / PIP unchanged.

Determinism: pure row-local float64 arithmetic with a fixed boundary
order — identical output at any parallelism or cluster size.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.tiles import MAX_MERC_LAT

GEOM_T = "array<struct<lat_nano:bigint,lon_nano:bigint>>"
PARTS_T = f"array<{GEOM_T}>"
B = 1_000_000_000


# -- tile bounds (published slippy formulas, float nano-degrees) ------------

def tile_lon_w(x: int, zoom: int) -> float:
    return (x / (1 << zoom) * 360.0 - 180.0) * B


def tile_lat_n(y: int, zoom: int) -> float:
    merc = math.pi * (1.0 - 2.0 * y / (1 << zoom))
    return math.degrees(math.atan(math.sinh(merc))) * B


def tile_bounds_nano(zoom: int, x: int, y: int
                     ) -> tuple[float, float, float, float]:
    """(lat_s, lat_n, lon_w, lon_e) of tile z/x/y in float nano-degrees."""
    return (tile_lat_n(y + 1, zoom), tile_lat_n(y, zoom),
            tile_lon_w(x, zoom), tile_lon_w(x + 1, zoom))


# -- numpy clip cores (directly unit-tested) --------------------------------

def _clip_ring_np(pts: np.ndarray, lat_s: float, lat_n: float,
                  lon_w: float, lon_e: float) -> np.ndarray | None:
    """Sutherland–Hodgman: clip a CLOSED ring (open form, (n,2) float64
    [lat, lon], first != last) to the axis-aligned rectangle. Returns
    the clipped open ring or None when the intersection is empty /
    degenerate (< 3 vertices). Vertex passes are numpy-vectorized per
    boundary; convex-clipper caveat: a concave ring that exits and
    re-enters across one boundary comes back joined along that boundary
    (zero-width bridges) — standard SH behaviour, harmless for
    rendering and area (bridge area is 0)."""
    v = pts
    # (coord index, bound, keep >= ?) — fixed order for determinism
    for axis, bound, keep_ge in ((0, lat_s, True), (0, lat_n, False),
                                 (1, lon_w, True), (1, lon_e, False)):
        n = len(v)
        if n < 3:
            return None
        c = v[:, axis]
        inside = (c >= bound) if keep_ge else (c <= bound)
        nxt = np.roll(np.arange(n), -1)
        ins_q = inside[nxt]
        crossing = inside != ins_q
        if not crossing.any() and inside.all():
            continue                       # fully inside this half-plane
        # intersection of crossing edges with the boundary line
        p, q = v, v[nxt]
        denom = q[:, axis] - c
        with np.errstate(divide="ignore", invalid="ignore"):
            t = np.where(denom != 0.0, (bound - c) / denom, 0.0)
        inter = p + t[:, None] * (q - p)
        inter[:, axis] = bound             # exact on-boundary coordinate
        counts = crossing.astype(np.int64) + ins_q.astype(np.int64)
        offs = np.concatenate(([0], np.cumsum(counts)[:-1]))
        out = np.empty((int(counts.sum()), 2), dtype=np.float64)
        out[offs[crossing]] = inter[crossing]
        out[(offs + crossing)[ins_q]] = q[ins_q]
        v = out
    if len(v) < 3:
        return None
    return v


def _clip_line_np(pts: np.ndarray, lat_s: float, lat_n: float,
                  lon_w: float, lon_e: float) -> list[np.ndarray]:
    """Liang–Barsky: clip an open polyline ((n,2) float64 [lat, lon]) to
    the rectangle → list of connected parts (each (m,2), m >= 2). All
    segments clip in one vectorized pass; parts split where a segment
    is rejected or the clip cut a connection."""
    if len(pts) < 2:
        return []
    p, q = pts[:-1], pts[1:]
    d = q - p
    t0 = np.zeros(len(p))
    t1 = np.ones(len(p))
    ok = np.ones(len(p), dtype=bool)
    for axis, bound, low in ((0, lat_s, True), (0, lat_n, False),
                             (1, lon_w, True), (1, lon_e, False)):
        pi = -d[:, axis] if low else d[:, axis]
        qi = (p[:, axis] - bound) if low else (bound - p[:, axis])
        par = pi == 0.0
        ok &= ~(par & (qi < 0.0))          # parallel and outside
        with np.errstate(divide="ignore", invalid="ignore"):
            r = np.where(par, 0.0, qi / pi)
        t0 = np.where(~par & (pi < 0.0), np.maximum(t0, r), t0)
        t1 = np.where(~par & (pi > 0.0), np.minimum(t1, r), t1)
    ok &= t0 <= t1
    if not ok.any():
        return []
    a = p + t0[:, None] * d                # clipped segment starts
    b = p + t1[:, None] * d                # clipped segment ends
    idx = np.flatnonzero(ok)
    # a new part starts where the previous segment was dropped or the
    # clip moved an endpoint off the shared vertex
    brk = np.ones(len(idx), dtype=bool)
    if len(idx) > 1:
        prev = idx[:-1]
        cur = idx[1:]
        brk[1:] = (cur != prev + 1) | (t1[prev] < 1.0) | (t0[cur] > 0.0)
    parts = []
    for grp in np.split(idx, np.flatnonzero(brk)[1:]):
        part = np.concatenate([a[grp[:1]], b[grp]])
        if len(part) >= 2 and not np.array_equal(part[0], part[-1]) \
                or len(part) > 2:
            parts.append(part)
    return parts


def _clip_rings_batch(v: np.ndarray, seg_ids: np.ndarray, n_seg: int,
                      bounds: np.ndarray
                      ) -> tuple[np.ndarray, np.ndarray]:
    """Sutherland–Hodgman over a whole BATCH of rings at once: ``v`` is
    the (total_vertices, 2) concatenation of all open rings, ``seg_ids``
    maps each vertex to its ring, ``bounds`` is (n_seg, 4) rows of
    (lat_s, lat_n, lon_w, lon_e) — each ring clips against ITS OWN tile
    rectangle. Returns (clipped flat array, per-ring vertex counts).

    Identical output to :func:`_clip_ring_np` per ring
    (property-tested); the point is batching — every half-plane pass is
    one set of flat numpy ops over all rings together, so per-geometry
    Python/numpy call overhead (the measured hot spot at 33-vertex
    rings × 14 tiles each) is paid once per ARROW BATCH instead of once
    per (ring, tile) pair. Memory traffic per pass is kept to the
    minimum the rebuild needs: intersection math runs only on the
    CROSSING edge subset (same operands, same formula — values are
    bit-identical; typically a few percent of the batch), the next-
    vertex inside flag is a shifted copy with a per-ring end fix
    instead of a full gather, and the degenerate-ring compaction only
    runs when a ring actually shrank below 3 vertices (measured 2.0×
    on the pass loop vs the compute-everything form)."""
    for k, (axis, keep_ge) in enumerate(((0, True), (0, False),
                                         (1, True), (1, False))):
        if len(v) == 0:
            break
        b = bounds[seg_ids, k]
        c = v[:, axis]
        inside = (c >= b) if keep_ge else (c <= b)
        if inside.all():
            continue      # all-inside ⟹ no crossing: nothing to rebuild
        counts_per_seg = np.bincount(seg_ids, minlength=n_seg)
        starts = np.concatenate(([0], np.cumsum(counts_per_seg)[:-1]))
        nonempty = counts_per_seg > 0
        ends = (starts + counts_per_seg - 1)[nonempty]
        # next-vertex inside flag: shift by one, ring ends wrap to their
        # ring start (a copy, not a full fancy-index gather)
        ins_q = np.empty_like(inside)
        ins_q[:-1] = inside[1:]
        ins_q[ends] = inside[starts[nonempty]]
        crossing = inside != ins_q
        # rings untouched by this half-plane (no crossing, all inside)
        # must keep their ORIGINAL vertex order — emitting q for them
        # would rotate the ring by one depending on batch composition
        # and break determinism across parallelism. Any crossing implies
        # a vertex outside in the same ring, so ~inside alone marks
        # every touched ring.
        dirty_seg = np.bincount(seg_ids[~inside], minlength=n_seg) > 0
        dirty = dirty_seg[seg_ids]
        is_end = np.zeros(len(v), dtype=bool)
        is_end[ends] = True
        # intersect ONLY the crossing edges with the boundary line
        ce = np.flatnonzero(crossing)
        nxt_ce = np.where(is_end[ce], starts[seg_ids[ce]], ce + 1)
        q_ce = v[nxt_ce]
        c_ce = c[ce]
        b_ce = b[ce]
        denom = q_ce[:, axis] - c_ce
        with np.errstate(divide="ignore", invalid="ignore"):
            t = np.where(denom != 0.0, (b_ce - c_ce) / denom, 0.0)
        inter = v[ce] + t[:, None] * (q_ce - v[ce])
        inter[:, axis] = b_ce              # exact on-boundary coordinate
        out_n = np.where(dirty,
                         crossing.astype(np.int64) + ins_q.astype(np.int64),
                         1)
        offs = np.cumsum(out_n) - out_n
        out = np.empty((int(offs[-1] + out_n[-1]), 2), dtype=np.float64)
        out[offs[~dirty]] = v[~dirty]
        out[offs[ce]] = inter              # crossing ⟹ dirty
        iq = np.flatnonzero(ins_q & dirty)
        nxt_iq = np.where(is_end[iq], starts[seg_ids[iq]], iq + 1)
        out[(offs + out_n - 1)[iq]] = v[nxt_iq]
        new_seg = np.repeat(seg_ids, out_n)
        # rings shrunk below 3 vertices are degenerate: drop them now so
        # later passes can't resurrect slivers from them (compaction
        # only when one actually shrank)
        seg_n = np.bincount(new_seg, minlength=n_seg)
        if ((seg_n > 0) & (seg_n < 3)).any():
            keep = seg_n[new_seg] >= 3
            v, seg_ids = out[keep], new_seg[keep]
        else:
            v, seg_ids = out, new_seg
    return v, np.bincount(seg_ids, minlength=n_seg)


def _clip_lines_batch(v: np.ndarray, seg_ids: np.ndarray, n_seg: int,
                      bounds: np.ndarray
                      ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Liang–Barsky over a whole batch of polylines at once: ``v`` is
    the (total_vertices, 2) concatenation of all polylines, ``seg_ids``
    maps vertices to lines, ``bounds`` is (n_seg, 4) per-line clip
    rectangles. Returns ``(out, part_sizes, part_rows)``: the flat
    vertex array of every connected clipped part in order, each part's
    vertex count, and each part's source line id — identical parts, in
    identical order, to :func:`_clip_line_np` per line
    (property-tested).

    Same motivation as :func:`_clip_rings_batch`: every t0/t1 clip and
    the part-break/ranking logic run as flat numpy over ALL edges of
    the Arrow batch; nothing iterates per (line, tile) pair."""
    empty = (np.empty((0, 2)), np.empty(0, dtype=np.int64),
             np.empty(0, dtype=np.int64))
    if len(v) < 2:
        return empty
    intra = seg_ids[:-1] == seg_ids[1:]          # edges within one line
    p, q = v[:-1][intra], v[1:][intra]
    e_seg = seg_ids[:-1][intra]
    if len(p) == 0:
        return empty
    d = q - p
    t0 = np.zeros(len(p))
    t1 = np.ones(len(p))
    ok = np.ones(len(p), dtype=bool)
    for k, (axis, low) in enumerate(((0, True), (0, False),
                                     (1, True), (1, False))):
        bnd = bounds[e_seg, k]
        pi = -d[:, axis] if low else d[:, axis]
        qi = (p[:, axis] - bnd) if low else (bnd - p[:, axis])
        par = pi == 0.0
        ok &= ~(par & (qi < 0.0))
        with np.errstate(divide="ignore", invalid="ignore"):
            r = np.where(par, 0.0, qi / pi)
        t0 = np.where(~par & (pi < 0.0), np.maximum(t0, r), t0)
        t1 = np.where(~par & (pi > 0.0), np.minimum(t1, r), t1)
    ok &= t0 <= t1
    if not ok.any():
        return empty
    a = (p + t0[:, None] * d)[ok]
    b = (p + t1[:, None] * d)[ok]
    # part breaks over the accepted-edge subsequence: new part at a new
    # line, a non-adjacent surviving edge, or a cut connection
    eidx = np.flatnonzero(ok)
    brk = np.ones(len(eidx), dtype=bool)
    if len(eidx) > 1:
        prev, cur = eidx[:-1], eidx[1:]
        brk[1:] = ((e_seg[cur] != e_seg[prev]) | (cur != prev + 1)
                   | (t1[prev] < 1.0) | (t0[cur] > 0.0))
    part_id = np.cumsum(brk) - 1
    n_parts = int(part_id[-1]) + 1
    first_acc = np.flatnonzero(brk)              # rank of each part head
    rank = np.arange(len(eidx)) - first_acc[part_id]
    edges_per_part = np.bincount(part_id, minlength=n_parts)
    sizes = edges_per_part + 1
    offs = np.cumsum(sizes) - sizes
    out = np.empty((int(sizes.sum()), 2), dtype=np.float64)
    out[offs] = a[brk]
    out[offs[part_id] + 1 + rank] = b
    part_rows = e_seg[eidx[brk]]
    # reference degenerate rule: drop 2-vertex parts whose endpoints
    # coincide (a line touching the rectangle at a single point)
    degen = (sizes == 2) & (out[offs] == out[offs + 1]).all(axis=1)
    if degen.any():
        keep_v = ~np.repeat(degen, sizes)
        out = out[keep_v]
        sizes = sizes[~degen]
        part_rows = part_rows[~degen]
    return out, sizes, part_rows


# -- Spark operators --------------------------------------------------------

def _cover_exprs(zoom: int, geom_col: str):
    """SQL builders shared by :func:`covering_tiles` and
    :func:`covering_overflow`: the bbox aggregate over the geometry
    array and the clamped corner→tile index renderers."""
    merc = ("(1.0d - asinh(tan(radians("
            "least(greatest({lat}, {mn}), {mx})))) / pi()) / 2.0d * {n}")
    n = 1 << zoom

    def tx_of(lon_expr: str) -> str:
        return (f"least(greatest(CAST(floor(({lon_expr} / 1e9d + 180.0d)"
                f" / 360.0d * {n}) AS INT), 0), {n - 1})")

    def ty_of(lat_expr: str) -> str:
        m = merc.format(lat=f"{lat_expr} / 1e9d",
                        mn=-MAX_MERC_LAT, mx=MAX_MERC_LAT, n=n)
        return f"least(greatest(CAST(floor({m}) AS INT), 0), {n - 1})"

    # nullv rides the SAME fold as the bbox (zero marginal array pass):
    # true when any vertex is a null struct or has a null field. least/
    # greatest SKIP nulls, so without it a null-lat vertex would still
    # widen the lon range (measured: one null-lat lon=5 vertex dragged
    # 8 spurious cover tiles in) and NaN would reach the clip math.
    agg = (f"aggregate({geom_col}, "
           f"struct(CAST(9223372036854775807 AS BIGINT) "
           f"AS mnla, CAST(-9223372036854775808 AS BIGINT) AS mxla, "
           f"CAST(9223372036854775807 AS BIGINT) AS mnlo, "
           f"CAST(-9223372036854775808 AS BIGINT) AS mxlo, "
           f"false AS nullv), "
           f"(acc, v) -> struct(least(acc.mnla, v.lat_nano), "
           f"greatest(acc.mxla, v.lat_nano), least(acc.mnlo, v.lon_nano), "
           f"greatest(acc.mxlo, v.lon_nano), "
           f"acc.nullv OR v.lat_nano IS NULL OR v.lon_nano IS NULL))")
    return agg, tx_of, ty_of


def _wrap_suspect(tx_of, zoom: int) -> Column:
    """True when a geometry's bbox spans more than HALF the world in
    longitude — the signature of an antimeridian-crossing geometry
    whose raw lon range wraps (a real feature that wide does not exist;
    a wrapped one covers everything BUT itself). Zoom-independent by
    construction (a fraction of the axis, not a tile count)."""
    if zoom < 2:
        return F.lit(False)          # the world is ≤ 2 tiles wide
    return F.expr(f"{tx_of('_bb.mxlo')} - {tx_of('_bb.mnlo')}") \
        > (1 << (zoom - 1))


def covering_overflow(df: DataFrame, *, zoom: int, geom_col: str = "ring",
                      max_tiles: int | None = None) -> DataFrame:
    """The loud companion of the :func:`covering_tiles` defenses: the
    geometries the wrap defense, the null-vertex defense, and the
    optional ``max_tiles`` cap EXCLUDED from the cut, with their bbox
    and cover-tile count (``n_tiles``); the ``nullv`` output column
    says which exclusions were null-vertex geometry. A non-empty result
    means antimeridian-crossing or corrupt geometry reached the tiler —
    split it at ±180 / resolve or drop null vertices upstream (the
    established OSM practice), don't raise the cap blindly."""
    agg, tx_of, ty_of = _cover_exprs(zoom, geom_col)
    excluded = _wrap_suspect(tx_of, zoom) | F.col("_bb.nullv")
    if max_tiles is not None:
        excluded = excluded | (_n_cover_tiles(tx_of, ty_of) > max_tiles)
    return (df.filter(F.expr(f"size({geom_col}) > 0"))
            .withColumn("_bb", F.expr(agg))
            .withColumn("n_tiles", _n_cover_tiles(tx_of, ty_of))
            .filter(excluded)
            .drop(geom_col)
            .select("*", F.col("_bb.*")).drop("_bb"))


def covering_tiles(df: DataFrame, *, zoom: int, geom_col: str = "ring",
                   keep_bbox: bool = False, wrap_defense: bool = True,
                   max_tiles: int | None = None) -> DataFrame:
    """Explode each geometry to its bbox-covering tiles: adds
    (zoom, tx, ty). Pure JVM: bbox via flat min/max aggregates over the
    array, corner→tile via the slippy formulas, then
    ``explode(sequence)`` twice — output linear in tiles touched.
    ``keep_bbox`` retains the ``_bb`` struct (mnla, mxla, mnlo, mxlo,
    nullv) for downstream fully-inside routing.

    Degenerate-geometry defenses (the same loud-cap idiom as the LSH
    bucket cap — ONE antimeridian-crossing way whose raw lon range
    wraps would explode to the entire 2^z tile row, millions of
    (geometry, tile) rows from a single input at zoom 12):

    - ``wrap_defense`` (default ON) excludes geometries whose bbox
      spans more than HALF the world in longitude — zoom-independent
      (a fraction of the axis, never a tile count), so it cannot bite
      legitimately large features at high zoom the way a constant
      tile-count cap would;
    - null-vertex defense (always on, detected inside the same bbox
      fold — zero extra array pass): a geometry containing a null
      struct or null lat/lon field is excluded — a null FIELD would
      otherwise poison the bbox (least/greatest skip nulls, so the
      non-null field still widens it) and feed NaN to the clip, while
      a null STRUCT would ride the fully-inside JVM route through
      unchanged. Quarantined, not guessed — same contract as
      ``way_polylines`` upstream and the ``simplify_geometry`` raise;
    - ``max_tiles`` (default off) additionally bounds the absolute
      cover size per geometry for memory-budgeted runs.

    Audit exclusions with :func:`covering_overflow`; the upstream fix
    is splitting antimeridian geometries at ±180 (established OSM
    practice) and resolving or dropping null vertices."""
    agg, tx_of, ty_of = _cover_exprs(zoom, geom_col)
    out = (df.filter(F.expr(f"size({geom_col}) > 0"))
           .withColumn("_bb", F.expr(agg))
           .filter(~F.col("_bb.nullv")))
    if wrap_defense:
        out = out.filter(~_wrap_suspect(tx_of, zoom))
    if max_tiles is not None:
        out = out.filter(_n_cover_tiles(tx_of, ty_of) <= max_tiles)
    out = (out
           .withColumn("zoom", F.lit(zoom))
           .withColumn("tx", F.explode(F.expr(
               f"sequence({tx_of('_bb.mnlo')}, {tx_of('_bb.mxlo')})")))
           # ty grows SOUTH: max lat → min ty
           .withColumn("ty", F.explode(F.expr(
               f"sequence({ty_of('_bb.mxla')}, {ty_of('_bb.mnla')})")))
           )
    return out if keep_bbox else out.drop("_bb")


def _n_cover_tiles(tx_of, ty_of) -> Column:
    """Cover-tile count of a geometry's ``_bb`` bbox (JVM, pre-explode)."""
    return F.expr(
        f"CAST(({tx_of('_bb.mxlo')} - {tx_of('_bb.mnlo')} + 1) AS BIGINT)"
        f" * ({ty_of('_bb.mnla')} - {ty_of('_bb.mxla')} + 1)")


_CLIP_OUT_T = "struct<lats:array<array<double>>,lons:array<array<double>>>"


def _pack_batch(lats: pd.Series, lons: pd.Series, min_verts: int):
    """Vectorized pack shared by both clip kinds: the whole Arrow
    batch's vertex arrays as two flat float64 arrays plus per-geometry
    sizes and surviving row indices (rows that are NULL or shorter than
    ``min_verts`` drop here). One ``np.concatenate`` instead of a
    per-row ``column_stack`` — the pack side of the measured per-pair
    overhead."""
    vals_la = lats.to_numpy(dtype=object, copy=False)
    vals_lo = lons.to_numpy(dtype=object, copy=False)
    sizes = np.fromiter((0 if x is None else len(x) for x in vals_la),
                        np.int64, len(vals_la))
    rows = np.flatnonzero(sizes >= min_verts)
    if rows.size == 0:
        return None
    la_flat = np.concatenate([np.asarray(vals_la[r], dtype=np.float64)
                              for r in rows])
    lo_flat = np.concatenate([np.asarray(vals_lo[r], dtype=np.float64)
                              for r in rows])
    return la_flat, lo_flat, sizes[rows], rows


def _row_bounds(zoom: int, tx: pd.Series, ty: pd.Series,
                rows: np.ndarray) -> np.ndarray:
    """(len(rows), 4) tile rectangles. Deliberately the scalar
    :func:`tile_bounds_nano` per row: numpy's sinh/atan differ from
    ``math``'s by 1 ulp on some inputs (measured), and the property
    tests hold batch output bit-identical to the per-geometry oracle
    that uses the scalar formulas."""
    txv, tyv = tx.to_numpy(), ty.to_numpy()
    return np.asarray([tile_bounds_nano(zoom, int(txv[r]), int(tyv[r]))
                       for r in rows], dtype=np.float64)


def _clip_udf(zoom: int, kind: str):
    """pandas_udf (lats, lons, tx, ty) → clipped parts as parallel
    nested double arrays (rings yield 0/1 parts, lines 0+). Arrow hands
    each ``array<double>`` cell over as a numpy array; pack, clip and
    unpack all run as flat numpy over the WHOLE batch
    (:func:`_pack_batch`, :func:`_clip_rings_batch` /
    :func:`_clip_lines_batch`, one gather + ``np.split``), so the only
    per-row Python left is the tile-bounds formula (bit-exactness —
    see :func:`_row_bounds`) and the output cell assignment. Output
    cells are numpy views; Arrow serializes them as lists. Tile bounds
    derive from (tx, ty) row-locally — the udf is stateless."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf(_CLIP_OUT_T)
    def _udf(lats: pd.Series, lons: pd.Series, tx: pd.Series,
             ty: pd.Series) -> pd.DataFrame:
        n_rows = len(lats)
        o_lat: list = [[] for _ in range(n_rows)]
        o_lon: list = [[] for _ in range(n_rows)]
        packed = _pack_batch(lats, lons, 3 if kind == "ring" else 2)
        if packed is None:
            return pd.DataFrame({"lats": pd.Series(o_lat),
                                 "lons": pd.Series(o_lon)})
        la_flat, lo_flat, sizes, rows = packed
        if kind == "ring":
            # open form for SH: trim the closing duplicate vertex, then
            # re-drop rings that fell below 3 vertices — all as masks
            starts = np.cumsum(sizes) - sizes
            ends = starts + sizes - 1
            closed = (la_flat[starts] == la_flat[ends]) \
                & (lo_flat[starts] == lo_flat[ends])
            open_sizes = sizes - closed
            keep_row = open_sizes >= 3
            vkeep = np.repeat(keep_row, sizes)
            vkeep[ends[closed]] = False
            flat = np.column_stack([la_flat[vkeep], lo_flat[vkeep]])
            seg_rows = rows[keep_row]
            n_seg = len(seg_rows)
            if n_seg:
                seg_ids = np.repeat(np.arange(n_seg), open_sizes[keep_row])
                out, seg_n = _clip_rings_batch(
                    flat, seg_ids, n_seg,
                    _row_bounds(zoom, tx, ty, seg_rows))
                starts_o = np.cumsum(seg_n) - seg_n
                kept = np.flatnonzero(seg_n >= 3)
                if kept.size:
                    # re-close every surviving ring in one flat gather:
                    # vertex j of ring k reads out[start_k + j mod n_k]
                    ks = seg_n[kept]
                    new_sizes = ks + 1
                    offs_new = np.cumsum(new_sizes) - new_sizes
                    within = np.arange(int(new_sizes.sum())) \
                        - np.repeat(offs_new, new_sizes)
                    gidx = np.repeat(starts_o[kept], new_sizes) \
                        + within % np.repeat(ks, new_sizes)
                    closed_flat = out[gidx]
                    cuts = np.cumsum(new_sizes)[:-1]
                    la_parts = np.split(closed_flat[:, 0], cuts)
                    lo_parts = np.split(closed_flat[:, 1], cuts)
                    for j, k in enumerate(kept):
                        i = seg_rows[k]
                        o_lat[i] = [la_parts[j]]
                        o_lon[i] = [lo_parts[j]]
        else:
            flat = np.column_stack([la_flat, lo_flat])
            seg_ids = np.repeat(np.arange(len(rows)), sizes)
            out, psizes, part_rows = _clip_lines_batch(
                flat, seg_ids, len(rows), _row_bounds(zoom, tx, ty, rows))
            if len(psizes):
                cuts = np.cumsum(psizes)[:-1]
                la_parts = np.split(out[:, 0], cuts)
                lo_parts = np.split(out[:, 1], cuts)
                for j, seg in enumerate(part_rows):
                    i = rows[seg]
                    o_lat[i].append(la_parts[j])
                    o_lon[i].append(lo_parts[j])
        return pd.DataFrame({"lats": pd.Series(o_lat),
                             "lons": pd.Series(o_lon)})
    return _udf


def _tile_bounds_cols(zoom: int) -> tuple[str, str, str, str]:
    """JVM SQL expressions for tile (lat_s, lat_n, lon_w, lon_e) in
    float nano-degrees from the (tx, ty) columns — the same published
    formulas as :func:`tile_bounds_nano`."""
    n = 1 << zoom

    def lat(ty: str) -> str:
        return f"degrees(atan(sinh(pi() * (1.0d - 2.0d * {ty} / {n})))) * 1e9d"

    return (lat("(ty + 1)"), lat("ty"),
            f"(tx / {n}.0d * 360.0d - 180.0d) * 1e9d",
            f"((tx + 1) / {n}.0d * 360.0d - 180.0d) * 1e9d")


def clip_to_tiles(df: DataFrame, *, zoom: int, geom_col: str = "ring",
                  kind: str = "ring",
                  max_tiles: int | None = None) -> DataFrame:
    """Cover + clip: one row per non-empty (geometry, tile, part) with
    ``geom_col`` replaced by the clipped part — rings stay closed
    rings, lines become connected sub-polylines. ``kind`` is "ring"
    (Sutherland–Hodgman) or "line" (Liang–Barsky).

    Two row routes, unioned (both narrow — no shuffle): geometries
    whose bbox sits FULLY INSIDE the tile pass through on the JVM with
    zero Python work — at high zooms that is MOST features (typical OSM
    ways span one tile) — and only boundary-crossing (geometry, tile)
    pairs reach the Arrow-batched clip udf. Clipped vertices rebuild
    JVM-side (zip_with + rint) into the standard geometry schema;
    passthrough rows keep their original exact integers (a float
    round-trip would be identity anyway: nano magnitudes < 2⁵³)."""
    if kind not in ("ring", "line"):
        raise ValueError(f"unknown kind {kind!r}")
    covered = covering_tiles(df, zoom=zoom, geom_col=geom_col,
                             keep_bbox=True, max_tiles=max_tiles)
    lat_s, lat_n, lon_w, lon_e = _tile_bounds_cols(zoom)
    inside = F.expr(f"_bb.mnla >= {lat_s} AND _bb.mxla <= {lat_n} AND "
                    f"_bb.mnlo >= {lon_w} AND _bb.mxlo <= {lon_e}")
    passthrough = (covered.filter(inside)
                   .withColumn("part", F.lit(0))
                   .drop("_bb"))
    crossing = covered.filter(~inside).drop("_bb")
    clipped = (crossing
               .withColumn("_parts", _clip_udf(zoom, kind)(
                   F.expr(f"transform({geom_col}, "
                          f"v -> CAST(v.lat_nano AS DOUBLE))"),
                   F.expr(f"transform({geom_col}, "
                          f"v -> CAST(v.lon_nano AS DOUBLE))"),
                   "tx", "ty"))
               .drop(geom_col)
               .select("*", F.posexplode(F.expr(
                   "zip_with(_parts.lats, _parts.lons, (pa, po) -> "
                   "zip_with(pa, po, (a, o) -> struct("
                   "CAST(rint(a) AS BIGINT) AS lat_nano, "
                   "CAST(rint(o) AS BIGINT) AS lon_nano)))"))
                   .alias("part", geom_col))
               .drop("_parts"))
    return passthrough.unionByName(clipped)


def quantize_sql(geom_col: str, *, zoom: int, tx_col: str = "tx",
                 ty_col: str = "ty", extent: int = 4096) -> str:
    """SQL rendering of MVT-style quantization: tile-local integer
    pixels, px east / py SOUTH (the MVT convention), computed through
    the web-mercator tile projection. One flat ``transform`` — pure
    Catalyst trig, no UDF."""
    n = 1 << zoom
    px = (f"CAST(round((v.lon_nano / 1e9d + 180.0d) / 360.0d * {n} "
          f"* {extent} - {tx_col} * {extent}) AS INT)")
    merc = (f"(1.0d - asinh(tan(radians(least(greatest("
            f"v.lat_nano / 1e9d, {-MAX_MERC_LAT}), {MAX_MERC_LAT})))) "
            f"/ pi()) / 2.0d * {n}")
    py = f"CAST(round({merc} * {extent} - {ty_col} * {extent}) AS INT)"
    return f"transform({geom_col}, v -> struct({px} AS px, {py} AS py))"


def dedup_consecutive_sql(col: str) -> str:
    """Drop consecutive duplicate pixels from a MATERIALIZED quantized
    column (the standard post-quantization dedup). ``col`` must be a
    plain column name — index lookups into it are O(1) references; an
    inlined expression would recompute the whole transform per
    element."""
    return (f"filter({col}, (p, i) -> i = 0 OR NOT "
            f"(p.px = {col}[i - 1].px AND p.py = {col}[i - 1].py))")


def quantize_to_tile(df: DataFrame, *, zoom: int, geom_col: str = "ring",
                     extent: int = 4096, out_col: str = "pixels"
                     ) -> DataFrame:
    """Adds ``out_col``: the geometry quantized to tile-local
    (px, py) integers at ``extent``, consecutive duplicates collapsed
    (two steps so the dedup references the materialized array instead
    of recomputing the trig per element)."""
    return (df
            .withColumn("_q", F.expr(
                quantize_sql(geom_col, zoom=zoom, extent=extent)))
            .withColumn(out_col, F.expr(dedup_consecutive_sql("_q")))
            .drop("_q"))


def way_polylines(elements: DataFrame, *, broadcast_nodes: bool = False,
                  geom_col: str = "ring") -> DataFrame:
    """(way_id, <geom_col>): each way's resolved node chain in the
    engine's standard geometry schema, ready for
    :func:`clip_to_tiles` / ``simplify`` / shoelace. Ways containing
    any unresolved ref are EXCLUDED (same loud contract as
    ``multipolygon_rings`` — missing geometry is quarantined, not
    guessed); audit with ``way_geometry_stats().filter(n_missing >
    0)``. One groupBy over the resolution join, sorted row-locally by
    seq."""
    from .parity import resolve_way_geometries

    resolved = resolve_way_geometries(elements,
                                      broadcast_nodes=broadcast_nodes)
    return (resolved
            .groupBy("way_id")
            .agg(F.sort_array(F.collect_list(F.struct(
                "seq", "lat_nano", "lon_nano"))).alias("vs"))
            .filter(F.expr("size(filter(vs, v -> v.lat_nano IS NULL)) = 0"))
            .select("way_id",
                    F.expr("transform(vs, v -> struct(v.lat_nano AS "
                           "lat_nano, v.lon_nano AS lon_nano))")
                    .alias(geom_col)))


def build_vector_tiles(df: DataFrame, *, zoom: int,
                       geom_col: str = "ring", kind: str = "ring",
                       id_col: str = "feature_id", extent: int = 4096,
                       simplify_eps_nano: float | None = None,
                       max_tiles: int | None = None) -> DataFrame:
    """The full tile cut: [simplify →] cover → clip → quantize →
    collect per tile. Returns one row per (zoom, tx, ty) with
    ``features`` = array of (feature_id, part, pixels), sorted for
    determinism. The groupBy on the tile key is the ONLY shuffle — the
    layout a tile store serves directly; write it partitioned by
    (zoom, tx) for pruned tile reads. The antimeridian wrap defense
    is always on; ``max_tiles`` adds the optional absolute cover cap
    (see :func:`covering_tiles`)."""
    from .simplify import simplify_geometry

    if simplify_eps_nano:
        df = df.withColumn(geom_col,
                           simplify_geometry(geom_col, simplify_eps_nano))
    clipped = clip_to_tiles(df, zoom=zoom, geom_col=geom_col, kind=kind,
                            max_tiles=max_tiles)
    quant = quantize_to_tile(clipped, zoom=zoom, geom_col=geom_col,
                             extent=extent)
    return (quant
            .filter(F.expr("size(pixels) >= 2"))
            .groupBy("zoom", "tx", "ty")
            .agg(F.sort_array(F.collect_list(F.struct(
                F.col(id_col).cast("string").alias("feature_id"),
                F.col("part"),
                F.col("pixels")))).alias("features")))


def pixel_eps_nano(zoom: int, extent: int = 4096) -> float:
    """One quantized pixel in nano-degrees of longitude at ``zoom`` —
    the standard per-zoom simplification tolerance (geometry detail
    below one output pixel is invisible by construction)."""
    return 360.0e9 / (1 << zoom) / extent


def build_tile_pyramid(df: DataFrame, *, zooms: list[int],
                       geom_col: str = "ring", kind: str = "ring",
                       id_col: str = "feature_id", extent: int = 4096,
                       simplify: bool = True,
                       max_tiles: int | None = None) -> DataFrame:
    """Cut the same geometry at every zoom in ``zooms`` (the tile
    pyramid a renderer serves) — a union of per-zoom
    :func:`build_vector_tiles`, each simplified to its own one-pixel
    tolerance (:func:`pixel_eps_nano`) when ``simplify`` is set, so
    coarse zooms carry few vertices. Zooms run as independent union
    legs over the SAME input scan; write the result with
    ``sources.store.write_tile_store`` for pruned (zoom, tx, ty)
    serving."""
    out = None
    for z in sorted(zooms):
        eps = pixel_eps_nano(z, extent) if simplify else None
        vt = build_vector_tiles(df, zoom=z, geom_col=geom_col, kind=kind,
                                id_col=id_col, extent=extent,
                                simplify_eps_nano=eps,
                                max_tiles=max_tiles)
        out = vt if out is None else out.unionByName(vt)
    if out is None:
        raise ValueError("zooms must be non-empty")
    return out
