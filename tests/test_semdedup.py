"""SemDeDup (operators/semdedup.py): cluster-scoped pair semantics,
both keeper policies, the degenerate-cluster cap + loud overflow, and
payload-preserving drop."""

import pytest
from pyspark.sql import functions as F

from osmpbf_spark.operators.semdedup import (
    semdedup,
    semdedup_cluster_overflow,
    semdedup_drop_ids,
    semdedup_pairs,
)


def _emb(spark, rows):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in rows],
        "vec_id long, embedding array<double>")


def _cent(spark, rows):
    return spark.createDataFrame(
        [(c, [float(x) for x in v]) for c, v in rows],
        "cid long, cvec array<double>")


@pytest.fixture
def clustered(spark):
    # two well-separated clusters on the x / y axes; within cluster 0,
    # vectors 1 and 2 are identical directions (cos = 1), vector 3 is
    # orthogonal-ish; cluster 1 holds near-identical 10/11 and lone 12
    emb = _emb(spark, [
        (1, [1.0, 0.0, 0.0]),
        (2, [2.0, 0.0, 0.0]),          # same direction as 1
        (3, [1.0, 0.9, 0.0]),          # same cluster, cos ~0.74 to 1
        (10, [0.0, 0.0, 1.0]),
        (11, [0.0, 0.01, 1.0]),        # near-identical to 10
        (12, [0.0, 1.0, 1.0]),         # same cluster, cos ~0.71 to 10
    ])
    cent = _cent(spark, [(0, [1.0, 0.1, 0.0]), (1, [0.0, 0.1, 1.0])])
    return emb, cent


def test_pairs_are_cluster_scoped(spark, clustered):
    emb, cent = clustered
    # threshold high enough that only the (near-)identical pairs hit
    pairs = {(r["id_a"], r["id_b"])
             for r in semdedup_pairs(emb, cent, threshold=0.95).collect()}
    assert pairs == {(1, 2), (10, 11)}
    # a cross-cluster pair can NEVER appear even at threshold -1:
    # candidates are bounded by the cluster, by construction
    allp = {(r["id_a"], r["id_b"])
            for r in semdedup_pairs(emb, cent, threshold=-1.0).collect()}
    assert allp == {(1, 2), (1, 3), (2, 3), (10, 11), (10, 12), (11, 12)}


def test_drop_min_id_and_far_from_centroid(spark, clustered):
    emb, cent = clustered
    # min_id: keeps 1 and 10, drops 2 and 11
    drop = {r["vec_id"] for r in
            semdedup_drop_ids(emb, cent, threshold=0.95).collect()}
    assert drop == {2, 11}
    # far_from_centroid keeps the group member LEAST aligned with its
    # centroid: in cluster 0 both 1 and 2 have identical cosine to the
    # centroid (same direction) → tie breaks on id, keeps 1, drops 2;
    # in cluster 1 the centroid is [0,0.1,1], vector 10=[0,0,1] is
    # slightly LESS aligned than 11=[0,0.01,1] → keeps 10, drops 11
    drop2 = {r["vec_id"] for r in
             semdedup_drop_ids(emb, cent, threshold=0.95,
                               keep="far_from_centroid").collect()}
    assert drop2 == {2, 11}
    with pytest.raises(ValueError):
        semdedup_drop_ids(emb, cent, keep="best")


def test_far_from_centroid_picks_least_aligned(spark):
    # one cluster, three mutually-similar vectors with DISTINCT
    # centroid alignment: the most atypical (least aligned) survives
    emb = _emb(spark, [
        (1, [1.0, 0.0]),               # perfectly aligned with centroid
        (2, [1.0, 0.05]),
        (3, [1.0, 0.12]),              # least aligned → the keeper
    ])
    cent = _cent(spark, [(0, [1.0, 0.0])])
    drop = {r["vec_id"] for r in
            semdedup_drop_ids(emb, cent, threshold=0.99,
                              keep="far_from_centroid").collect()}
    assert drop == {1, 2}
    assert {r["vec_id"] for r in
            semdedup_drop_ids(emb, cent, threshold=0.99).collect()} \
        == {2, 3}                      # min_id keeps 1 instead


def test_transitive_groups_one_keeper(spark):
    # chain 1~2, 2~3 where 1~3 is BELOW threshold: connected components
    # still merge them into one group with one keeper
    emb = _emb(spark, [
        (1, [1.0, 0.0]),
        (2, [1.0, 0.08]),              # cos(1,2) ~0.997
        (3, [1.0, 0.16]),              # cos(2,3) ~0.997, cos(1,3) ~0.987
    ])
    cent = _cent(spark, [(0, [1.0, 0.0])])
    pairs = {(r["id_a"], r["id_b"]) for r in
             semdedup_pairs(emb, cent, threshold=0.99).collect()}
    assert pairs == {(1, 2), (2, 3)}
    assert {r["vec_id"] for r in
            semdedup_drop_ids(emb, cent, threshold=0.99).collect()} \
        == {2, 3}


def test_cluster_cap_and_overflow(spark):
    # 6 identical vectors in one cluster, 2 in another; cap 5 excludes
    # the big cluster from pairing but the small one still pairs
    emb = _emb(spark, [(i, [1.0, 0.0]) for i in range(6)]
               + [(10, [0.0, 1.0]), (11, [0.0, 1.0])])
    cent = _cent(spark, [(0, [1.0, 0.0]), (1, [0.0, 1.0])])
    pairs = {(r["id_a"], r["id_b"]) for r in
             semdedup_pairs(emb, cent, threshold=0.95,
                            max_cluster=5).collect()}
    assert pairs == {(10, 11)}
    over = semdedup_cluster_overflow(emb, cent, max_cluster=5).collect()
    assert [(r["cid"], r["bucket_n"]) for r in over] == [(0, 6)]
    # uncapped: the big cluster pairs quadratically
    assert semdedup_pairs(emb, cent, threshold=0.95,
                          max_cluster=None).count() == 15 + 1


def test_semdedup_keeps_payload_columns(spark, clustered):
    emb, cent = clustered
    docs = spark.createDataFrame(
        [(i, f"text {i}", "en") for i in [1, 2, 3, 10, 11, 12]],
        "doc_id long, text string, lang string")
    kept = semdedup(docs, emb, cent, threshold=0.95)
    assert kept.columns == docs.columns
    assert {r["doc_id"] for r in kept.collect()} == {1, 3, 10, 12}


def test_driver_row_parity_sf0001(spark):
    """The union-tagged embedding_neardup row vs its DuckDB oracle at
    sf0.001 (the driver runs sf0.01; this is the fast regression)."""
    import duckdb

    from osmpbf_spark.queries import REGISTRY
    fn, sql = REGISTRY["embedding_neardup"]
    sdf = fn(spark, "/root/testdata/sf0.001")
    got = sorted((r["method"], r["id_a"], r["id_b"], r["cos_sim"])
                 for r in sdf.collect())
    con = duckdb.connect()
    con.sql("CREATE VIEW embeddings AS SELECT * FROM "
            "'/root/testdata/sf0.001/embeddings.parquet'")
    want = sorted(tuple(t) for t in con.sql(sql).fetchall())
    assert got == want
    assert any(m == "semdedup" for m, *_ in got)
    assert any(m == "lsh" for m, *_ in got)


def test_auto_k_rule():
    """auto_k = clamp(sqrt(n/2)): the measured cost optimum
    (BENCH_NEWOPS r5 — too-small k is a quadratic pair-join cliff),
    never exceeding n (train_centroids needs k seeds) nor the
    broadcast-ceiling k_max."""
    from osmpbf_spark.operators.semdedup import auto_k

    assert auto_k(250_000) == 354            # sqrt(125,000) = 353.55
    assert auto_k(2 * 512 * 512) == 512      # exact optimum
    assert auto_k(100) == 16                 # k_min clamp
    assert auto_k(10) == 10                  # never above n
    assert auto_k(0) == 1
    assert auto_k(10**13) == 65_536          # k_max broadcast ceiling
    vals = [auto_k(n) for n in range(1, 5000, 7)]
    assert all(a <= b for a, b in zip(vals, vals[1:]))  # monotone
