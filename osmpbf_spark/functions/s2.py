"""S2 cell ids (level-12 default), implemented from the public S2 geometry
algorithm (quadratic ST projection + Hilbert curve lookup tables), fully
vectorized in numpy and exposed as an Arrow-batched pandas UDF.

This is the engine's second spatial index (BASELINE.json north_star
"S2 level-12 cells") — hierarchical, prefix-joinable cell ids on the unit
sphere. No s2 library exists in this environment, so the cell id math is
implemented here from the published algorithm; self-consistency is tested
(parent/child prefix containment, face mapping of cardinal points,
LUT inverse round-trip) in tests/test_s2.py.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

MAX_LEVEL = 30
POS_BITS = 2 * MAX_LEVEL + 1
LOOKUP_BITS = 4
SWAP_MASK = 1
INVERT_MASK = 2

_POS_TO_IJ = np.array([[0, 1, 3, 2], [0, 2, 3, 1],
                       [3, 2, 0, 1], [3, 1, 0, 2]], dtype=np.int64)
_POS_TO_ORIENTATION = np.array(
    [SWAP_MASK, 0, 0, INVERT_MASK + SWAP_MASK], dtype=np.int64)

_LOOKUP_POS = np.zeros(1 << (2 * LOOKUP_BITS + 2), dtype=np.uint64)
_LOOKUP_IJ = np.zeros(1 << (2 * LOOKUP_BITS + 2), dtype=np.uint64)


def _init_lookup(level, i, j, orig_orientation, pos, orientation):
    if level == LOOKUP_BITS:
        ij = (i << LOOKUP_BITS) + j
        _LOOKUP_POS[(ij << 2) + orig_orientation] = (pos << 2) + orientation
        _LOOKUP_IJ[(pos << 2) + orig_orientation] = (ij << 2) + orientation
        return
    level += 1
    i <<= 1
    j <<= 1
    pos <<= 2
    r = _POS_TO_IJ[orientation]
    for index in range(4):
        _init_lookup(level, i + (int(r[index]) >> 1),
                     j + (int(r[index]) & 1), orig_orientation,
                     pos + index,
                     orientation ^ int(_POS_TO_ORIENTATION[index]))


for _o in range(4):
    _init_lookup(0, 0, 0, _o, 0, _o)


def xyz_from_latlon(lat_deg: np.ndarray, lon_deg: np.ndarray):
    phi = np.radians(lat_deg)
    theta = np.radians(lon_deg)
    cosphi = np.cos(phi)
    return cosphi * np.cos(theta), cosphi * np.sin(theta), np.sin(phi)


def face_uv(x, y, z):
    """Largest-|component| face + (u, v) projection (public S2 mapping)."""
    ax, ay, az = np.abs(x), np.abs(y), np.abs(z)
    axis = np.where(az > np.maximum(ax, ay), 2,
                    np.where(ay > ax, 1, 0))
    comp = np.choose(axis, [x, y, z])
    face = np.where(comp >= 0, axis, axis + 3)
    u = np.empty_like(x)
    v = np.empty_like(x)
    for f, (ue, ve, de) in enumerate([
            (lambda: y, lambda: z, lambda: x),      # face 0: +x
            (lambda: -x, lambda: z, lambda: y),     # face 1: +y
            (lambda: -x, lambda: -y, lambda: z),    # face 2: +z
            (lambda: z, lambda: y, lambda: x),      # face 3: -x
            (lambda: z, lambda: -x, lambda: y),     # face 4: -y
            (lambda: -y, lambda: -x, lambda: z)]):  # face 5: -z
        m = face == f
        if m.any():
            d = de()[m]
            u[m] = ue()[m] / d
            v[m] = ve()[m] / d
    return face.astype(np.int64), u, v


def st_from_uv(u):
    """Quadratic projection (S2_QUADRATIC_PROJECTION UVtoST). Computed
    via |u| so no negative argument ever reaches sqrt (identical doubles:
    1 - 0.5*sqrt(1-3u) == 1 - 0.5*sqrt(1+3|u|) for u < 0)."""
    half = 0.5 * np.sqrt(1 + 3 * np.abs(u))
    return np.where(u >= 0, half, 1 - half)


def si_ti(s):
    limit = (1 << MAX_LEVEL) - 1
    return np.clip((s * (1 << MAX_LEVEL)).astype(np.int64), 0, limit)


def cell_id_from_face_ij(face: np.ndarray, i: np.ndarray,
                         j: np.ndarray) -> np.ndarray:
    """FromFaceIJ: 8 rounds of 4-bit Hilbert LUT lookups, vectorized."""
    n = face.astype(np.uint64) << np.uint64(POS_BITS - 1)
    bits = (face & SWAP_MASK).astype(np.uint64)
    iu = i.astype(np.uint64)
    ju = j.astype(np.uint64)
    mask = np.uint64((1 << LOOKUP_BITS) - 1)
    for k in range(7, -1, -1):
        shift = np.uint64(k * LOOKUP_BITS)
        bits += ((iu >> shift) & mask) << np.uint64(LOOKUP_BITS + 2)
        bits += ((ju >> shift) & mask) << np.uint64(2)
        bits = _LOOKUP_POS[bits]
        n |= (bits >> np.uint64(2)) << np.uint64(k * 2 * LOOKUP_BITS)
        bits &= np.uint64(SWAP_MASK | INVERT_MASK)
    return (n << np.uint64(1)) | np.uint64(1)


def s2_cell_id(lat_deg, lon_deg, level: int = 12) -> np.ndarray:
    """Vectorized (lat°, lon°) → S2 cell id at ``level`` (int64 view of
    the uint64 id — Spark LongType-safe, ordering preserved within a
    face)."""
    lat = np.asarray(lat_deg, dtype=np.float64)
    lon = np.asarray(lon_deg, dtype=np.float64)
    x, y, z = xyz_from_latlon(lat, lon)
    face, u, v = face_uv(x, y, z)
    i = si_ti(st_from_uv(u))
    j = si_ti(st_from_uv(v))
    leaf = cell_id_from_face_ij(face, i, j)
    if level < MAX_LEVEL:
        lsb = np.uint64(1) << np.uint64(2 * (MAX_LEVEL - level))
        leaf = (leaf & ~(lsb - np.uint64(1))) | lsb
    return leaf.view(np.int64)


def s2_parent(cell_ids: np.ndarray, level: int) -> np.ndarray:
    """Parent cell at a coarser level (prefix containment)."""
    u = cell_ids.view(np.uint64) if cell_ids.dtype == np.int64 \
        else cell_ids
    lsb = np.uint64(1) << np.uint64(2 * (MAX_LEVEL - level))
    return ((u & ~(lsb - np.uint64(1))) | lsb).view(np.int64)


def s2_level(cell_ids: np.ndarray) -> np.ndarray:
    """Level of each cell id (position of the lowest set bit)."""
    u = cell_ids.view(np.uint64)
    lsb = u & (~u + np.uint64(1))
    return (MAX_LEVEL
            - (np.log2(lsb.astype(np.float64)) / 2).astype(np.int64))


def s2_oracle_sql(points: list[tuple], level: int = 12) -> str:
    """Render the FULL S2 cell-id computation for constant (pid, lat, lon)
    points as DuckDB SQL — an independent second implementation of the
    published algorithm (face/uv projection, quadratic ST, per-level
    Hilbert walk from the published base tables POS_TO_IJ /
    POS_TO_ORIENTATION via a recursive CTE) so the numpy path is
    hash-checked cross-engine, not just self-consistent.

    The per-level walk is equivalent to the 4-bit-LUT FromFaceIJ above:
    the LUT is the 4-level composition of the same base tables, and the
    two leading zero levels of the 32-bit LUT loop are no-ops from a
    face orientation (which is always 0 or 1: IJ_TO_POS[o][0]=0 and
    orientation 0↔1 flips twice, returning to face&1).
    """
    return s2_oracle_sql_from(
        "(VALUES " + ", ".join(
            f"(CAST({p} AS BIGINT), CAST({la!r} AS DOUBLE), "
            f"CAST({lo!r} AS DOUBLE))"
            for p, la, lo in points) + ")", level)


def s2_oracle_sql_from(pts_rel: str, level: int = 12) -> str:
    """Like :func:`s2_oracle_sql` but over any relation producing
    (pid, plat, plon) rows — e.g. a subquery over the events table."""
    n30 = 1 << MAX_LEVEL
    lsb = 1 << (2 * (MAX_LEVEL - level))
    # IJ_TO_POS rows (inverse of _POS_TO_IJ rows) keyed by orient*4+ij2
    ij_to_pos = {0: [0, 1, 3, 2], 1: [0, 3, 1, 2],
                 2: [2, 3, 1, 0], 3: [2, 1, 3, 0]}
    whens = " ".join(f"WHEN {o * 4 + ij} THEN {pos}"
                     for o, row in ij_to_pos.items()
                     for ij, pos in enumerate(row))
    return f"""
WITH RECURSIVE
pts(pid, plat, plon) AS (SELECT * FROM {pts_rel}),
xyz AS (
  SELECT pid,
         cos(radians(plat)) * cos(radians(plon)) AS x,
         cos(radians(plat)) * sin(radians(plon)) AS y,
         sin(radians(plat)) AS z
  FROM pts),
fuv AS (
  SELECT pid,
         CASE ax WHEN 2 THEN (CASE WHEN z >= 0 THEN 2 ELSE 5 END)
                 WHEN 1 THEN (CASE WHEN y >= 0 THEN 1 ELSE 4 END)
                 ELSE (CASE WHEN x >= 0 THEN 0 ELSE 3 END) END AS face,
         x, y, z
  FROM (SELECT pid, x, y, z,
               CASE WHEN abs(z) > GREATEST(abs(x), abs(y)) THEN 2
                    WHEN abs(y) > abs(x) THEN 1 ELSE 0 END AS ax
        FROM xyz)),
uv AS (
  SELECT pid, face,
         CASE face WHEN 0 THEN y / x  WHEN 1 THEN -x / y
                   WHEN 2 THEN -x / z WHEN 3 THEN z / x
                   WHEN 4 THEN z / y  ELSE -y / z END AS u,
         CASE face WHEN 0 THEN z / x  WHEN 1 THEN z / y
                   WHEN 2 THEN -y / z WHEN 3 THEN y / x
                   WHEN 4 THEN -x / y ELSE -x / z END AS v
  FROM fuv),
st AS (
  SELECT pid, face,
         CASE WHEN u >= 0 THEN 0.5 * sqrt(1 + 3 * u)
              ELSE 1 - 0.5 * sqrt(1 - 3 * u) END AS s,
         CASE WHEN v >= 0 THEN 0.5 * sqrt(1 + 3 * v)
              ELSE 1 - 0.5 * sqrt(1 - 3 * v) END AS t
  FROM uv),
ij AS (
  SELECT pid, face,
         LEAST(GREATEST(CAST(trunc(s * {n30}) AS BIGINT), 0),
               {n30 - 1}) AS i,
         LEAST(GREATEST(CAST(trunc(t * {n30}) AS BIGINT), 0),
               {n30 - 1}) AS j
  FROM st),
walk(pid, k, orient, pos) AS (
  SELECT pid, {MAX_LEVEL} AS k, face % 2 AS orient,
         CAST(0 AS BIGINT) AS pos
  FROM ij
  UNION ALL
  SELECT w.pid, w.k - 1,
         xor(w.orient, CASE pk WHEN 0 THEN 1 WHEN 3 THEN 3 ELSE 0 END),
         w.pos * 4 + pk
  FROM (SELECT w.pid, w.k, w.orient, w.pos,
               CASE w.orient * 4
                    + ((ij.i >> (w.k - 1)) & 1) * 2
                    + ((ij.j >> (w.k - 1)) & 1)
                    {whens} END AS pk
        FROM walk w JOIN ij ON ij.pid = w.pid
        WHERE w.k > 0) w),
leaf AS (
  SELECT w.pid,
         CAST(ij.face AS HUGEINT) * {1 << 61}
         + CAST(w.pos AS HUGEINT) * 2 + 1 AS leaf_u
  FROM walk w JOIN ij ON ij.pid = w.pid WHERE w.k = 0),
cid AS (
  SELECT pid, (leaf_u // {2 * lsb}) * {2 * lsb} + {lsb} AS id_u
  FROM leaf)
SELECT pid, CAST(CASE WHEN id_u >= {1 << 63} THEN id_u - {1 << 64}
                      ELSE id_u END AS BIGINT) AS s2_cell
FROM cid
"""


def s2_cell_udf(level: int = 12):
    """pandas_udf (lat double, lon double) -> s2 cell id LONG, Arrow
    batched — the engine's cell-index stage for the sphere-accurate
    path (grid.py is the planar fast path)."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def _udf(lat: pd.Series, lon: pd.Series) -> pd.Series:
        return pd.Series(s2_cell_id(lat.to_numpy(), lon.to_numpy(), level))
    return _udf


def with_s2_cells(df, *, level: int = 12, lat_col: str = "lat",
                  lon_col: str = "lon", out_col: str = "s2_cell"):
    """Attach S2 cell ids to rows with double lat/lon columns."""
    from pyspark.sql import functions as F
    udf = s2_cell_udf(level)
    return df.withColumn(
        out_col,
        F.when(F.col(lat_col).isNotNull(),
               udf(F.col(lat_col), F.col(lon_col))))
