"""Coverage for the remaining operators: LSH ANN recall vs exact, salted
PIP equivalence under megacity skew, way-geometry resolution, tag
frequency, BPE-ish token count, ring offsets."""

import random

from pyspark.sql import functions as F

from osmpbf_spark.functions.grid import (
    GRID_RES_FINE,
    ring_offsets,
    with_grid_cells,
)
from osmpbf_spark.functions.text import bpe_ish_token_count
from osmpbf_spark.operators.knn import cosine_topk, lsh_cosine_topk
from osmpbf_spark.operators.parity import (
    resolve_way_geometries,
    tag_frequency,
)
from osmpbf_spark.operators.pip import make_polygons, pip_join
from osmpbf_spark.sources.documents import read_elements
from osmpbf_spark.sources.synth import synth_documents

RNG = random.Random(11)


def test_lsh_cosine_recall(spark):
    dims = 16
    vecs = [(i, [RNG.gauss(0, 1) for _ in range(dims)]) for i in range(300)]
    edf = spark.createDataFrame(vecs, "vec_id long, embedding array<double>")
    qdf = spark.createDataFrame(
        [(i, vecs[i][1]) for i in range(5)],
        "query_id long, embedding array<double>")
    planes = [[RNG.gauss(0, 1) for _ in range(dims)] for _ in range(4)]
    exact = cosine_topk(edf, qdf, 5)
    approx = lsh_cosine_topk(edf, qdf, 5, planes)
    exact_map = {}
    for r in exact.collect():
        exact_map.setdefault(r["query_id"], set()).add(r["vec_id"])
    hits = total = 0
    for r in approx.collect():
        total += 1
        if r["vec_id"] in exact_map[r["query_id"]]:
            hits += 1
    # self-match always lands in the query's own bucket
    approx_map = {}
    for r in approx.collect():
        approx_map.setdefault(r["query_id"], set()).add(r["vec_id"])
    for qid in range(5):
        assert qid in approx_map[qid]
    assert hits / max(total, 1) > 0.4   # bucketing keeps useful recall


def test_salted_pip_equivalence(spark):
    # megacity skew: salted and unsalted PIP joins return identical rows
    docs, media, _ = synth_documents(spark, 30000, block_elements=4000)
    el = read_elements(docs, media, broadcast_media=True)
    nodes = with_grid_cells(el.filter("element_type = 'node'"),
                            res=GRID_RES_FINE).cache()
    B = 1_000_000_000
    # box over the densest hotspot (synth.HOTSPOTS[0] at lat 43, lon 9)
    polys = make_polygons(spark, [
        ("hot", [(int(42.8 * B), int(8.8 * B)), (int(43.2 * B), int(8.8 * B)),
                 (int(43.2 * B), int(9.2 * B)), (int(42.8 * B), int(9.2 * B)),
                 (int(42.8 * B), int(8.8 * B))])])
    plain = {(r["id"], r["poly_id"]) for r in
             pip_join(nodes, polys).select("id", "poly_id").collect()}
    salted = {(r["id"], r["poly_id"]) for r in
              pip_join(nodes, polys, salt_n=7)
              .select("id", "poly_id").collect()}
    assert plain == salted
    assert len(plain) > 3000   # the hotspot concentrates ~1/3 of nodes
    nodes.unpersist()


def test_resolve_way_geometries_and_tag_frequency(spark):
    docs, media, expected = synth_documents(spark, 5000, block_elements=1000)
    el = read_elements(docs, media, broadcast_media=True).cache()
    geo = resolve_way_geometries(el, broadcast_nodes=True)
    # every way ref resolves to a node coordinate (synth refs are valid)
    assert geo.filter(F.col("lat_nano").isNull()).count() == 0
    assert geo.count() == expected["way"] * 5   # 5 refs per ring
    # closed ring: first and last resolved coords equal per way
    firsts = geo.filter("seq = 0").select("way_id", "lat_nano", "lon_nano")
    lasts = geo.filter("seq = 4").select("way_id", "lat_nano", "lon_nano")
    assert firsts.exceptAll(lasts).count() == 0
    freq = {(r["key"], r["value"]): r["cnt"]
            for r in tag_frequency(el).collect()}
    assert freq[("building", "yes")] == expected["building_ways"]
    el.unpersist()


def test_bpe_ish_token_count(spark):
    df = spark.createDataFrame(
        [("hello, world! 42x",), ("",)], "text string")
    got = [r["n"] for r in
           df.select(bpe_ish_token_count("text").alias("n")).collect()]
    # hello | , | <sp> | world | ! | <sp> | 42 | x  (regex boundary split)
    assert got[0] >= 6
    assert got[1] == 0


def test_ring_offsets(spark):
    r2 = ring_offsets(spark, 2).collect()
    assert len(r2) == 16                      # ring k has 8k cells
    assert all(max(abs(r["dx"]), abs(r["dy"])) == 2 for r in r2)


def test_lsh_multiprobe_recall_monotone_and_pinned(spark):
    # multi-probe flips query signature bits: recall@k must be monotone
    # in probe depth and hit a pinned floor at 2-bit probing with these
    # fixed planes (VERDICT r1 #6)
    dims = 16
    rng = random.Random(99)
    vecs = [(i, [rng.gauss(0, 1) for _ in range(dims)]) for i in range(400)]
    edf = spark.createDataFrame(vecs, "vec_id long, embedding array<double>")
    qdf = spark.createDataFrame(
        [(i, vecs[i][1]) for i in range(12)],
        "query_id long, embedding array<double>")
    planes = [[rng.gauss(0, 1) for _ in range(dims)] for _ in range(6)]
    exact_map = {}
    for r in cosine_topk(edf, qdf, 5).collect():
        exact_map.setdefault(r["query_id"], set()).add(r["vec_id"])

    def recall(mp):
        got = {}
        for r in lsh_cosine_topk(edf, qdf, 5, planes,
                                 multiprobe=mp).collect():
            got.setdefault(r["query_id"], set()).add(r["vec_id"])
        hit = sum(len(got.get(q, set()) & exact_map[q])
                  for q in exact_map)
        return hit / sum(len(v) for v in exact_map.values())

    r0, r1, r2 = recall(0), recall(1), recall(2)
    assert r0 <= r1 <= r2, (r0, r1, r2)
    # measured with these fixed planes: 0.33 / 0.50 / 0.77 — pin the
    # floor and that the probe lever more than doubles bucket-only recall
    assert r2 >= 0.70, (r0, r1, r2)
    assert r2 >= 2 * r0, (r0, r1, r2)
    # each (query, vector) pair appears at most once even with 2-bit probes
    dup = (lsh_cosine_topk(edf, qdf, 1000, planes, multiprobe=2)
           .groupBy("query_id", "vec_id").count().filter("count > 1")
           .count())
    assert dup == 0


def test_ivf_topk_recall_and_determinism(spark):
    from osmpbf_spark.operators.knn import ivf_topk
    dims = 16
    rng = random.Random(5)
    vecs = [(i, [rng.gauss(0, 1) for _ in range(dims)]) for i in range(400)]
    edf = spark.createDataFrame(vecs, "vec_id long, embedding array<double>")
    qdf = spark.createDataFrame(
        [(i, vecs[i][1]) for i in range(10)],
        "query_id long, embedding array<double>")
    cent = spark.createDataFrame(
        [(c, vecs[c * 33][1]) for c in range(12)],
        "cid long, cvec array<double>")
    exact_map = {}
    for r in cosine_topk(edf, qdf, 5).collect():
        exact_map.setdefault(r["query_id"], set()).add(r["vec_id"])

    def recall(nprobe):
        got = {}
        for r in ivf_topk(edf, qdf, 5, cent, nprobe=nprobe).collect():
            got.setdefault(r["query_id"], set()).add(r["vec_id"])
        # the self-vector shares its own bucket → always found
        assert all(q in got.get(q, set()) for q in exact_map)
        hit = sum(len(got.get(q, set()) & exact_map[q]) for q in exact_map)
        return hit / sum(len(v) for v in exact_map.values())

    r1, r3 = recall(1), recall(3)
    assert r1 <= r3, (r1, r3)
    assert r3 >= 0.6, (r1, r3)   # measured with this fixed layout
    # determinism: two runs, identical row sets
    a = {tuple(r) for r in
         ivf_topk(edf, qdf, 5, cent, nprobe=2).collect()}
    b = {tuple(r) for r in
         ivf_topk(edf, qdf, 5, cent, nprobe=2).collect()}
    assert a == b


def test_cosine_score_pandas_bit_identical_to_hof(spark):
    # VERDICT r2 #7: the Arrow-batched cosine must equal the HOF fold
    # BIT-FOR-BIT (same left->right accumulation), so it can ever be
    # swapped in without touching an oracle hash
    from osmpbf_spark.operators.knn import cosine_score
    df = (spark.range(5000)
          .withColumn("a", F.expr(
              "transform(sequence(1, 64), j -> "
              "CAST(pmod(id * j, 97) AS DOUBLE) / 97.0 - 0.5)"))
          .withColumn("b", F.expr(
              "transform(sequence(1, 64), j -> "
              "CAST(pmod(id * j + 13, 101) AS DOUBLE) / 101.0 - 0.5)")))
    diverging = df.select(
        cosine_score("a", "b").alias("h"),
        cosine_score("a", "b", use_pandas=True).alias("p")) \
        .filter("h != p").count()
    assert diverging == 0


def test_asof_join_golden_and_directions(spark):
    from osmpbf_spark.operators.asof import asof_join
    left = spark.createDataFrame(
        [(1, "k", 100), (2, "k", 205), (3, "k", 50), (4, "x", 300)],
        "eid long, k string, ts long")
    right = spark.createDataFrame(
        [("k", 100, "a"), ("k", 200, "b"), ("y", 10, "z")],
        "k string, rts long, tag string")
    back = {r["eid"]: r["tag"] for r in asof_join(
        left, right, on="k", left_ts="ts", right_ts="rts").collect()}
    # exact-equal ts matches (eid 1), latest-at-or-before wins (eid 2),
    # nothing before (eid 3) and wrong key (eid 4) drop under inner
    assert back == {1: "a", 2: "b"}
    lhow = {r["eid"]: r["tag"] for r in asof_join(
        left, right, on="k", left_ts="ts", right_ts="rts",
        how="left").collect()}
    assert lhow == {1: "a", 2: "b", 3: None, 4: None}
    fwd = {r["eid"]: r["tag"] for r in asof_join(
        left, right, on="k", left_ts="ts", right_ts="rts",
        direction="forward").collect()}
    assert fwd == {1: "a", 2: None, 3: "a"} or fwd == {1: "a", 3: "a"}


def test_asof_join_tolerance_and_tie_determinism(spark):
    from osmpbf_spark.operators.asof import asof_join
    left = spark.createDataFrame(
        [(1, "k", "2024-01-10 00:00:00")],
        "eid long, k string, ts_s string").select(
        "eid", "k", F.col("ts_s").cast("timestamp").alias("ts"))
    right = spark.createDataFrame(
        [("k", "2024-01-01 00:00:00", "old"),
         ("k", "2024-01-01 00:00:00", "older")],   # exact tie on ts
        "k string, rts_s string, tag string").select(
        "k", F.col("rts_s").cast("timestamp").alias("rts"), "tag")
    got = asof_join(left, right, on="k", left_ts="ts",
                    right_ts="rts").collect()
    # tie resolves to the greatest payload struct — deterministic
    assert [r["tag"] for r in got] == ["older"]
    none = asof_join(left, right, on="k", left_ts="ts", right_ts="rts",
                     tolerance="INTERVAL 7 DAY").collect()
    assert none == []                      # 9 days away > tolerance
    ok = asof_join(left, right, on="k", left_ts="ts", right_ts="rts",
                   tolerance="INTERVAL 10 DAY").collect()
    assert [r["tag"] for r in ok] == ["older"]


def test_asof_join_random_vs_bruteforce(spark):
    import random
    from osmpbf_spark.operators.asof import asof_join
    rng = random.Random(11)
    lrows = [(i, f"k{rng.randrange(6)}", rng.randrange(1000))
             for i in range(120)]
    rrows = [(f"k{rng.randrange(6)}", rng.randrange(1000), i)
             for i in range(80)]
    left = spark.createDataFrame(lrows, "eid long, k string, ts long")
    right = spark.createDataFrame(rrows, "k string, rts long, rid long")
    got = {r["eid"]: (r["rts"], r["rid"]) for r in asof_join(
        left, right, on="k", left_ts="ts", right_ts="rts").collect()}
    want = {}
    for eid, k, ts in lrows:
        cands = [(rts, rid) for rk, rts, rid in rrows
                 if rk == k and rts <= ts]
        if cands:
            # operator tie rule: greatest payload struct = max (rts, rid)
            want[eid] = max(cands)
    assert got == want


def test_range_join_golden_and_negatives(spark):
    from osmpbf_spark.operators.rangejoin import range_join
    vals = spark.createDataFrame(
        [(1, -7), (2, 0), (3, 5), (4, 100)], "vid long, v long")
    ivs = spark.createDataFrame(
        [("a", -10, -5), ("b", -1, 6), ("c", 5, 5), ("d", 7, 3)],
        "iid string, lo long, hi long")          # d is empty (lo > hi)
    got = {(r["vid"], r["iid"]) for r in range_join(
        vals, ivs, value_col="v", lo_col="lo", hi_col="hi",
        bucket_width=4).collect()}
    assert got == {(1, "a"), (2, "b"), (3, "b"), (3, "c")}


def test_range_join_random_vs_bruteforce_all_widths(spark):
    import random
    from osmpbf_spark.operators.rangejoin import range_join
    rng = random.Random(3)
    vals = [(i, rng.randrange(-500, 500)) for i in range(150)]
    ivs = [(i, lo := rng.randrange(-500, 500), lo + rng.randrange(0, 60))
           for i in range(60)]
    want = {(vid, iid) for vid, v in vals for iid, lo, hi in ivs
            if lo <= v <= hi}
    vdf = spark.createDataFrame(vals, "vid long, v long")
    idf = spark.createDataFrame(ivs, "iid long, lo long, hi long")
    for w in (1, 7, 64, None):                   # None = auto p95
        got = {(r["vid"], r["iid"]) for r in range_join(
            vdf, idf, value_col="v", lo_col="lo", hi_col="hi",
            bucket_width=w).collect()}
        assert got == want, f"width={w}"


def test_asof_join_null_timestamps_and_keys(spark):
    # code-review r3: a NULL-timestamp right row must never be carried
    # as a match (asc ordering sorts nulls first); NULL-key/ts left
    # rows have no match — dropped under inner, kept with NULL right
    # columns under how="left"
    from osmpbf_spark.operators.asof import asof_join
    left = spark.createDataFrame(
        [(1, "k", 100), (2, "k", 5), (3, None, 50), (4, "k", None)],
        "eid long, k string, ts long")
    right = spark.createDataFrame(
        [("k", None, "bad"), ("k", 50, "good"), (None, 10, "nullk")],
        "k string, rts long, tag string")
    inner = {r["eid"]: r["tag"] for r in asof_join(
        left, right, on="k", left_ts="ts", right_ts="rts").collect()}
    assert inner == {1: "good"}            # eid 2: nothing at/before 5
    lhow = {r["eid"]: r["tag"] for r in asof_join(
        left, right, on="k", left_ts="ts", right_ts="rts",
        how="left").collect()}
    assert lhow == {1: "good", 2: None, 3: None, 4: None}


def test_cosine_zero_norm_is_null_on_both_paths(spark):
    from osmpbf_spark.operators.knn import cosine_score
    df = spark.createDataFrame(
        [(1, [0.0, 0.0], [1.0, 1.0]), (2, [1.0, 0.0], [1.0, 0.0])],
        "id long, a array<double>, b array<double>")
    rows = {r["id"]: (r["h"], r["p"]) for r in df.select(
        "id", cosine_score("a", "b").alias("h"),
        cosine_score("a", "b", use_pandas=True).alias("p")).collect()}
    assert rows[1] == (None, None)         # undefined, NOT NaN-vs-NULL
    assert rows[2][0] == rows[2][1] == 1.0


def test_cosine_nan_element_is_null_on_both_paths(spark):
    # ADVICE r3: a NaN ELEMENT used to produce NaN-as-a-value on the JVM
    # path but NULL on the pandas path (Arrow coerces NaN→NULL); the JVM
    # form now maps its NaN result to NULL so the parity promise holds
    from osmpbf_spark.operators.knn import cosine_score
    df = spark.createDataFrame(
        [(1, [float("nan"), 1.0], [1.0, 1.0]), (2, [2.0, 0.0], [1.0, 0.0])],
        "id long, a array<double>, b array<double>")
    rows = {r["id"]: (r["h"], r["p"]) for r in df.select(
        "id", cosine_score("a", "b").alias("h"),
        cosine_score("a", "b", use_pandas=True).alias("p")).collect()}
    assert rows[1] == (None, None)
    assert rows[2][0] == rows[2][1] == 1.0


def test_top_orders(spark):
    """q_top_orders left the driver registry in round 4 (50-entry driver
    cap; surface covered there by topk_per_user) — keep it green here
    against its DuckDB oracle on the sf0.001 driver tables."""
    import duckdb

    from osmpbf_spark.queries import TOP_ORDERS_ORACLE, q_top_orders

    sf_dir = "/root/testdata/sf0.001"
    got = [(r["o_orderkey"], r["o_totalprice"])
           for r in q_top_orders(spark, sf_dir).collect()]
    con = duckdb.connect()
    con.sql(f"CREATE VIEW orders AS SELECT * "
            f"FROM '{sf_dir}/orders.parquet'")
    want = con.sql(TOP_ORDERS_ORACLE).fetchall()
    assert got == [tuple(r) for r in want]
    assert len(got) == 10


def test_train_centroids_converges_and_deterministic(spark):
    # two well-separated blobs, k=2: trained centroids land on the blob
    # means; result is identical across partitionings (determinism by
    # construction: hash init, decimal distance, decimal-routed means)
    from osmpbf_spark.operators.knn import train_centroids
    rng = random.Random(5)
    pts = ([(i, [rng.gauss(0, 0.1), rng.gauss(0, 0.1)]) for i in range(40)]
           + [(100 + i, [rng.gauss(10, 0.1), rng.gauss(10, 0.1)])
              for i in range(40)])
    df1 = spark.createDataFrame(pts, "vec_id long, embedding array<double>")
    df8 = df1.repartition(8)
    c1 = sorted((r["cid"], tuple(r["cvec"]))
                for r in train_centroids(df1, 2, iters=5).collect())
    c8 = sorted((r["cid"], tuple(r["cvec"]))
                for r in train_centroids(df8, 2, iters=5).collect())
    assert c1 == c8                      # partitioning-independent, exact
    means = sorted(v for _, v in c1)
    assert abs(means[0][0]) < 0.2 and abs(means[0][1]) < 0.2
    assert abs(means[1][0] - 10) < 0.2 and abs(means[1][1] - 10) < 0.2


def test_train_centroids_empty_cluster_keeps_previous(spark):
    # 3 identical points, k=2: one centroid hoards everything, the other
    # must keep its initial vector rather than NaN out
    from osmpbf_spark.operators.knn import train_centroids
    df = spark.createDataFrame(
        [(1, [5.0, 5.0]), (2, [5.0, 5.0]), (3, [5.0, 5.0])],
        "vec_id long, embedding array<double>")
    got = {r["cid"]: list(r["cvec"])
           for r in train_centroids(df, 2, iters=3).collect()}
    assert len(got) == 2
    vals = sorted(got.values())
    assert vals.count([5.0, 5.0]) >= 1
    assert all(v == v for c in got.values() for v in c)   # no NaN
    # k > n fails loud
    import pytest as _pytest
    with _pytest.raises(ValueError, match="exceeds"):
        train_centroids(df, 5, iters=1)
