"""Deterministic scaled OSM synthesis (FIXTURES.md §3).

Seeded numpy generator → PrimitiveBlocks of ~``block_elements`` elements →
zlib blobs → interleaved documents+media rows. Same seed ⇒ byte-identical
tables at any parallelism — required so two cluster sizes see identical
input (BASELINE.json north_rule scaling evidence).

Shape mirrors a planet extract: dense-node grid over a lon/lat box with
"megacity" hotspots (the skew driver for salting/AQE tests), tags on ~10%
of nodes, closed-ring ways over consecutive nodes (~E/20, half tagged
building=yes), relations referencing ways (~E/200).

The generator knows what it encoded, so it doubles as the bit-exact oracle
for decode and spatial stages (expected counts returned alongside).
"""

from __future__ import annotations

import numpy as np

from ..pbf.encode import (
    Info,
    Node,
    Relation,
    Way,
    encode_blob,
    encode_header_block,
    encode_primitive_block,
)

# 10°×10° region in 100-nanodegree raw units, centered on a mid-latitude
# "country": lat ∈ [40, 50), lon ∈ [5, 15)
LAT0, LON0 = 40 * 10_000_000, 5 * 10_000_000
SPAN = 10 * 10_000_000

# megacity hotspots (fraction of nodes concentrated in tiny boxes — the
# skew driver); (lat_frac, lon_frac, radius_frac)
HOTSPOTS = [(0.30, 0.40, 0.004), (0.62, 0.55, 0.003), (0.45, 0.80, 0.002)]
HOTSPOT_FRAC = 0.35


def synth_fileblocks(n_nodes: int, *, seed: int = 42,
                     block_elements: int = 8000,
                     with_info: bool = False):
    """Yield (blob_type, blob_bytes) fileblocks plus an expected-counts
    dict. Returns (fileblocks, expected)."""
    rng = np.random.RandomState(seed)
    n_hot = int(n_nodes * HOTSPOT_FRAC)
    n_cold = n_nodes - n_hot

    lat = np.empty(n_nodes, dtype=np.int64)
    lon = np.empty(n_nodes, dtype=np.int64)
    lat[:n_cold] = LAT0 + rng.randint(0, SPAN, n_cold)
    lon[:n_cold] = LON0 + rng.randint(0, SPAN, n_cold)
    pos = n_cold
    per_hot = n_hot // len(HOTSPOTS)
    for i, (fy, fx, fr) in enumerate(HOTSPOTS):
        cnt = per_hot if i < len(HOTSPOTS) - 1 else n_hot - pos + n_cold
        r = max(int(SPAN * fr), 1)
        lat[pos:pos + cnt] = LAT0 + int(SPAN * fy) + rng.randint(-r, r, cnt)
        lon[pos:pos + cnt] = LON0 + int(SPAN * fx) + rng.randint(-r, r, cnt)
        pos += cnt

    tagged = rng.rand(n_nodes) < 0.10
    amenity = rng.randint(0, 4, n_nodes)
    AMENITIES = ["cafe", "school", "fuel", "bench"]

    n_ways = n_nodes // 20
    n_rels = n_nodes // 200

    fileblocks = [("OSMHeader", encode_blob(encode_header_block(
        bbox_nano=((LON0) * 100, (LON0 + SPAN) * 100,
                   (LAT0 + SPAN) * 100, LAT0 * 100),
        required_features=["OsmSchema-V0.6", "DenseNodes"],
        writingprogram="osmpbf_spark-synth")))]

    def flush(group):
        fileblocks.append(
            ("OSMData", encode_blob(encode_primitive_block(
                [group], dense=isinstance(group[0], Node),
                with_info=with_info))))

    group: list = []
    for i in range(n_nodes):
        tags = ([("amenity", AMENITIES[amenity[i]])]
                if tagged[i] else [])
        group.append(Node(id=i + 1, lat_raw=int(lat[i]), lon_raw=int(lon[i]),
                          tags=tags,
                          info=Info(version=1, timestamp=1_700_000_000 + i)
                          if with_info else None))
        if len(group) >= block_elements:
            flush(group)
            group = []
    if group:
        flush(group)

    group = []
    for w in range(n_ways):
        first = (w * 17) % (n_nodes - 4) + 1
        refs = [first, first + 1, first + 2, first + 3, first]
        tags = [("building", "yes")] if w % 2 == 0 else [("highway", "path")]
        group.append(Way(id=1_000_000_000 + w, refs=refs, tags=tags))
        if len(group) >= block_elements:
            flush(group)
            group = []
    if group:
        flush(group)

    group = []
    for r in range(n_rels):
        members = [("outer", 1_000_000_000 + (r * 7) % max(n_ways, 1), 1)]
        group.append(Relation(id=2_000_000_000 + r, members=members,
                              tags=[("type", "multipolygon")]))
        if len(group) >= block_elements:
            flush(group)
            group = []
    if group:
        flush(group)

    expected = {
        "node": n_nodes,
        "way": n_ways,
        "relation": n_rels,
        "building_ways": (n_ways + 1) // 2,
        "tagged_nodes": int(tagged.sum()),
    }
    return fileblocks, expected


def synth_documents(spark, n_nodes: int, *, seed: int = 42,
                    num_partitions: int | None = None,
                    block_elements: int = 8000):
    """Synthesized documents+media DataFrames plus the expected-counts
    oracle. Deterministic for (n_nodes, seed, block_elements)."""
    from .documents import fileblocks_to_rows, make_documents
    fbs, expected = synth_fileblocks(
        n_nodes, seed=seed, block_elements=block_elements)
    doc_rows, media_rows = fileblocks_to_rows(f"synth-{n_nodes}-{seed}", fbs)
    docs, media = make_documents(spark, doc_rows, media_rows,
                                 num_partitions=num_partitions)
    return docs, media, expected


def synth_query_points(spark, n: int, *, res: int,
                       lat0_nano: int = 40_000_000_000,
                       lon0_nano: int = 5_000_000_000,
                       span_nano: int = 10_000_000_000):
    """Deterministic pseudo-random query points over the synth region
    (xxhash64 arithmetic — no driver-side row list), grid-indexed at
    ``res``. Shared by bench.py and tools/scaling_bench.py so both
    measure the identical kNN-join workload."""
    from pyspark.sql import functions as F

    from ..functions.grid import with_grid_cells
    return with_grid_cells(
        spark.range(n).select(
            F.col("id").alias("query_id"),
            (F.lit(lat0_nano) + F.pmod(F.xxhash64("id"), F.lit(span_nano)))
            .alias("lat_nano"),
            (F.lit(lon0_nano) + F.pmod(F.xxhash64("id", F.lit(1)),
                                       F.lit(span_nano)))
            .alias("lon_nano")),
        res=res)
