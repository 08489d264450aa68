"""OSM multipolygon assembly: relation members → closed outer/inner
rings → point-in-polygon with holes.

The reference decodes relations (`/root/reference/src/elements.rs`
RelMemberIter gives (role, member_id, member_type)) but leaves geometry
assembly to the consumer — every real OSM pipeline (tile renderers,
osm2pgsql, osmium's area assembler) must chain a `type=multipolygon`
relation's member WAYS into closed rings before any polygon operation,
because large areas (lakes, forests, admin boundaries) are split across
many ways in arbitrary order and direction, and holes (islands) arrive
as `inner` rings. This module is that assembler, Spark-first:

- membership, way polylines, and coordinates resolve with equi-joins
  (`resolve_way_geometries` — the decoded table's one resolution shape);
- ring CHAINING is inherently sequential per relation but bounded by a
  relation's member count (thousands at worst), so it runs as
  ``applyInPandas`` grouped by (relation_id, role) — the engine's
  sanctioned shape for per-group imperative logic (cf. streaming
  sessionization); state never exceeds one relation's ways;
- assembled rings feed the existing broadcast PIP machinery
  (``pip.pip_join``) unchanged: polygons-with-holes = match the outer
  rings, anti-join the inner rings, both sides keyed by
  (relation, point) — the drop-list shape, point payloads never widen.

Determinism: chaining picks the smallest unused way id at every step
and flips direction only when forced, so ring composition, ring ids
(min member way id), and vertex order are identical at any parallelism.

Limitations (documented, not silent): ways with unresolved refs are
EXCLUDED from chaining, so rings missing data come back ``is_closed =
false`` (loud) rather than guessed; old-style multipolygons (tags on
the outer WAY, deprecated since 2017) and role-less members are
normalized to ``outer`` per the osmium convention; self-intersecting
("invalid") rings are not repaired.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.grid import GRID_RES_FINE
from .parity import resolve_way_geometries

RINGS_DDL = ("relation_id bigint, ring_id bigint, role string, "
             "is_closed boolean, n_ways int, "
             "ring array<struct<lat_nano:bigint,lon_nano:bigint>>")


def _chain_rings(pdf: pd.DataFrame) -> pd.DataFrame:
    """Chain one (relation, role) group's way polylines into rings.

    Deterministic greedy walk: start each ring at the smallest unused
    way id, extend at the open end with the smallest-id way sharing the
    endpoint NODE (reversing it when it connects tail-to-tail), until
    the ring closes on its first node or no continuation exists
    (``is_closed = false``). Node-id equality — not coordinate equality
    — is the OSM contract for connectedness."""
    relation_id = int(pdf["relation_id"].iloc[0])
    role = pdf["role"].iloc[0]
    unused: dict[int, tuple[list, list]] = {}
    endpoint: dict[int, list] = {}
    for wid_, nodes_, lats_, lons_ in zip(pdf["way_id"], pdf["nodes"],
                                          pdf["lats"], pdf["lons"]):
        nodes = [int(n) for n in nodes_]
        if len(nodes) < 2:
            continue                      # degenerate single-vertex way
        pts = [(int(a), int(b)) for a, b in zip(lats_, lons_)]
        wid = int(wid_)
        unused[wid] = (nodes, pts)
        # endpoint index: O(node degree) continuation lookup instead of
        # scanning every unused way per step (O(W²) per relation — a
        # 10k-way coastline relation would take minutes); entries are
        # invalidated lazily via the `in unused` check
        endpoint.setdefault(nodes[0], []).append(wid)
        endpoint.setdefault(nodes[-1], []).append(wid)
    out = []
    # ring starts walk a pre-sorted id order with a monotone pointer
    # (used ids never return, so min(unused) never moves backwards)
    order = sorted(unused)
    oi = 0
    while True:
        while oi < len(order) and order[oi] not in unused:
            oi += 1
        if oi == len(order):
            break
        wid = order[oi]
        nodes, pts = unused.pop(wid)
        ring_nodes, ring_pts, used = list(nodes), list(pts), [wid]
        while ring_nodes[0] != ring_nodes[-1]:
            end = ring_nodes[-1]
            cand = [w for w in endpoint.get(end, ()) if w in unused]
            if not cand:
                break
            nxt = min(cand)
            ns, ps = unused.pop(nxt)
            if ns[0] != end:
                ns, ps = ns[::-1], ps[::-1]
            ring_nodes += ns[1:]
            ring_pts += ps[1:]
            used.append(nxt)
        out.append({
            "relation_id": relation_id,
            "ring_id": min(used),
            "role": role,
            "is_closed": ring_nodes[0] == ring_nodes[-1],
            "n_ways": len(used),
            "ring": [{"lat_nano": a, "lon_nano": b}
                     for a, b in ring_pts],
        })
    return pd.DataFrame(
        out, columns=["relation_id", "ring_id", "role", "is_closed",
                      "n_ways", "ring"])


def multipolygon_rings(elements: DataFrame, *,
                       broadcast_nodes: bool = False) -> DataFrame:
    """Assemble every ``type=multipolygon`` relation's member ways into
    rings: (relation_id, ring_id, role, is_closed, n_ways, ring).

    ring_id = the smallest member way id of the ring (stable across
    runs and cluster sizes); ``role`` is normalized to outer/inner
    (blank roles → outer, the osmium default). Ways containing any
    unresolved ref are excluded, so affected rings surface as
    ``is_closed = false``.

    Shape: relations explode to (relation_id, role, way_id); way
    polylines build once per WAY (one groupBy over the resolved
    coordinates, sorted row-locally by seq) and join membership on
    way_id — a way referenced by many relations ships its polyline per
    reference, which is bounded by boundary-sharing fan-out (small in
    OSM practice). Chaining state is one relation's ways."""
    members = (elements
               .filter((F.col("element_type") == "relation")
                       & (F.col("tags")["type"] == "multipolygon"))
               .select(F.col("id").alias("relation_id"),
                       F.explode("members").alias("m"))
               .filter(F.col("m.member_type") == "way")
               .select("relation_id",
                       F.when(F.col("m.role") == "inner", F.lit("inner"))
                       .otherwise(F.lit("outer")).alias("role"),
                       F.col("m.member_id").alias("way_id")))
    resolved = resolve_way_geometries(elements,
                                      broadcast_nodes=broadcast_nodes)
    lines = (resolved
             .groupBy("way_id")
             .agg(F.sort_array(F.collect_list(F.struct(
                 "seq", "ref", "lat_nano", "lon_nano"))).alias("vs"))
             # exclude ways with unresolved refs (loud open rings
             # beat silently guessed geometry)
             .filter(F.expr(
                 "size(filter(vs, v -> v.lat_nano IS NULL)) = 0"))
             .select("way_id",
                     F.expr("transform(vs, v -> v.ref)").alias("nodes"),
                     F.expr("transform(vs, v -> v.lat_nano)").alias("lats"),
                     F.expr("transform(vs, v -> v.lon_nano)").alias("lons")))
    return (members.join(lines, "way_id")
            .groupBy("relation_id", "role")
            .applyInPandas(_chain_rings, RINGS_DDL))


def rings_as_polygons(rings: DataFrame, role: str) -> DataFrame:
    """CLOSED rings of one role as a ``pip.pip_join``-compatible
    polygons frame: poly_id = '<relation_id>/<ring_id>'."""
    return (rings
            .filter(F.col("is_closed") & (F.col("role") == role))
            .select(F.concat_ws("/", "relation_id", "ring_id")
                    .alias("poly_id"),
                    "ring"))


def pip_multipolygon(points: DataFrame, rings: DataFrame, *,
                     point_keys: list[str] | None = None,
                     res: int = GRID_RES_FINE, cell_col: str = "cell",
                     salt_n: int | None = None) -> DataFrame:
    """Point-in-multipolygon with holes: (point_keys..., relation_id)
    for every point inside ≥1 closed OUTER ring of a relation and
    inside none of its closed INNER rings.

    Both legs are the engine's broadcast PIP join (cell-cover equi-join
    + exact ray-cast refine; the point side never shuffles); the hole
    subtraction is a left-anti join on (relation_id, point_keys) — the
    inner-match side is small (hole occupancy), so it broadcasts, and
    point payloads never widen (callers re-join on ``point_keys``).
    Open rings are excluded by construction — run
    ``rings.filter(~is_closed)`` as the loud quarantine audit."""
    from .pip import pip_join

    point_keys = point_keys or ["id"]

    def matches(role: str) -> DataFrame:
        m = pip_join(points, rings_as_polygons(rings, role),
                     res=res, cell_col=cell_col, salt_n=salt_n)
        return (m.select(
            *point_keys,
            F.split("poly_id", "/").getItem(0).cast("bigint")
            .alias("relation_id"))
            .dropDuplicates(point_keys + ["relation_id"]))

    return matches("outer").join(matches("inner"),
                                 point_keys + ["relation_id"],
                                 "left_anti")


def ring_area2_sql(ring_col: str) -> str:
    """Twice the SIGNED shoelace area of a ring column, in nano² —
    EXACT integer arithmetic via a DECIMAL(38,0) accumulator (term
    magnitude ≤ ~6.5e22, sums far below 38 digits; zero float error, so
    orientation sign is always trustworthy). x = lon, y = lat: positive
    = counter-clockwise. One flat zip_with + aggregate (the sanctioned
    non-nested HOF shape). The ring must be closed (first == last), as
    :func:`multipolygon_rings` emits."""
    a = f"slice({ring_col}, 1, size({ring_col}) - 1)"
    b = f"slice({ring_col}, 2, size({ring_col}) - 1)"
    return (f"aggregate(zip_with({a}, {b}, (a, b) -> "
            f"CAST(a.lon_nano AS DECIMAL(38,0)) * b.lat_nano - "
            f"CAST(b.lon_nano AS DECIMAL(38,0)) * a.lat_nano), "
            f"CAST(0 AS DECIMAL(38,0)), (acc, v) -> acc + v)")


def with_ring_orientation(rings: DataFrame,
                          ring_col: str = "ring") -> DataFrame:
    """Adds ``area2_nano2`` (signed, exact) and ``orientation``
    ('ccw' / 'cw' / 'degenerate') to a rings frame."""
    area2 = F.expr(ring_area2_sql(ring_col))
    return (rings.withColumn("area2_nano2", area2)
            .withColumn("orientation",
                        F.when(F.col("area2_nano2") > 0, "ccw")
                        .when(F.col("area2_nano2") < 0, "cw")
                        .otherwise("degenerate")))


def normalize_winding(rings: DataFrame, *, ring_col: str = "ring",
                      role_col: str = "role") -> DataFrame:
    """Enforce the renderer convention — OUTER rings counter-clockwise,
    INNER rings clockwise — by reversing rings wound the wrong way
    (row-local ``reverse``; a reversed closed ring is the same closed
    ring walked backwards). OSM data does not guarantee winding and the
    chaining walk doesn't either; nonzero-fill renderers and libraries
    like GEOS expect it. Degenerate (zero-area) rings pass through
    unchanged — filter them with :func:`with_ring_orientation`.
    Idempotent; ray-cast PIP is winding-agnostic, so join results are
    unaffected (tested)."""
    with_o = with_ring_orientation(rings, ring_col)
    wrong = (((F.col(role_col) == "outer") & (F.col("orientation") == "cw"))
             | ((F.col(role_col) == "inner")
                & (F.col("orientation") == "ccw")))
    return (with_o
            .withColumn(ring_col,
                        F.when(wrong, F.reverse(F.col(ring_col)))
                        .otherwise(F.col(ring_col)))
            .drop("area2_nano2", "orientation"))
