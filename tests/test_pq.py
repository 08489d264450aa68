"""Product quantization: numpy mirror, determinism, error/recall bounds."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from osmpbf_spark.operators.pq import (
    pq_adc_topk,
    pq_encode,
    pq_reconstruct,
    train_pq_codebooks,
)


def _clustered(n=200, d=32, n_clusters=8, seed=7):
    """Deterministic clustered corpus (cluster structure gives PQ
    something to quantize onto)."""
    rng = np.random.default_rng(seed)
    centers = rng.normal(size=(n_clusters, d)) * 3.0
    x = centers[rng.integers(0, n_clusters, n)] + rng.normal(size=(n, d))
    return np.round(x, 6)          # float-literal friendly


@pytest.fixture(scope="module")
def corpus(spark):
    x = _clustered()
    df = spark.createDataFrame(
        [(i, [float(v) for v in row]) for i, row in enumerate(x)],
        "vec_id bigint, embedding array<double>")
    return df, x


@pytest.fixture(scope="module")
def trained(corpus):
    df, x = corpus
    cb = train_pq_codebooks(df, 4, 4, iters=2)
    codes = pq_encode(df, cb)
    return cb, codes


def _codebook_array(cb_rows, m, ksub, dsub):
    out = np.zeros((m, ksub, dsub))
    for r in cb_rows:
        out[r["sub"], r["cid"]] = r["cvec"]
    return out


def test_encode_matches_numpy_argmin(corpus, trained):
    df, x = corpus
    cb, codes = trained
    m, ksub, dsub = 4, 4, x.shape[1] // 4
    book = _codebook_array(cb.collect(), m, ksub, dsub)
    got = {r["vec_id"]: list(r["codes"]) for r in codes.collect()}
    assert len(got) == len(x)
    for i, row in enumerate(x):
        for s in range(m):
            sub = row[s * dsub:(s + 1) * dsub]
            d2 = ((book[s] - sub) ** 2).sum(axis=1)
            assert got[i][s] == int(np.argmin(d2)), (i, s, d2)


def test_encode_partitioning_independent(corpus, trained):
    df, _ = corpus
    cb, codes = trained
    again = pq_encode(df.repartition(7), cb)
    a = sorted((r["vec_id"], tuple(r["codes"])) for r in codes.collect())
    b = sorted((r["vec_id"], tuple(r["codes"])) for r in again.collect())
    assert a == b


def test_adc_equals_reconstruction_distance(corpus, trained):
    """adist must equal ||q − reconstruct(codes)||² — ADC computes
    exactly the distance to the decoded vector, by construction."""
    df, x = corpus
    cb, codes = trained
    queries = (df.filter(F.col("vec_id") < 3)
               .select(F.col("vec_id").alias("query_id"), "embedding"))
    top = pq_adc_topk(codes, cb, queries, 5).collect()
    rec = {r["vec_id"]: np.array(r["approx"])
           for r in pq_reconstruct(codes, cb).collect()}
    for r in top:
        q = x[r["query_id"]]
        expect = float(((q - rec[r["vec_id"]]) ** 2).sum())
        assert abs(float(r["adist"]) - expect) < 1e-9


def test_adc_topk_partitioning_independent(corpus, trained):
    df, _ = corpus
    cb, codes = trained
    queries = (df.filter(F.col("vec_id") < 4)
               .select(F.col("vec_id").alias("query_id"), "embedding"))
    a = pq_adc_topk(codes, cb, queries, 7)
    b = pq_adc_topk(codes.repartition(5), cb,
                    queries.repartition(3), 7)
    ra = sorted((r["query_id"], r["vec_id"], r["rn"]) for r in a.collect())
    rb = sorted((r["query_id"], r["vec_id"], r["rn"]) for r in b.collect())
    assert ra == rb


def test_quantization_error_shrinks_with_ksub(corpus):
    df, x = corpus
    errs = {}
    for ksub in (2, 8):
        cb = train_pq_codebooks(df, 4, ksub, iters=2)
        codes = pq_encode(df, cb)
        rec = {r["vec_id"]: np.array(r["approx"])
               for r in pq_reconstruct(codes, cb).collect()}
        errs[ksub] = float(np.mean(
            [((x[i] - rec[i]) ** 2).sum() for i in range(len(x))]))
    assert errs[8] < errs[2]


def test_recall_vs_exact_l2(corpus):
    """On normalized vectors ADC-L2 ranking approximates cosine ranking.
    Pure ADC top-5 must clear 0.5 mean recall at 32 bits/vector, and the
    standard serving pattern — ADC shortlist (4·k) + exact re-rank —
    must clear 0.9: quantization error only has to keep the true
    neighbors inside the shortlist, not rank them."""
    df, x = corpus
    xn = x / np.linalg.norm(x, axis=1, keepdims=True)
    spark = df.sparkSession
    dfn = spark.createDataFrame(
        [(i, [float(v) for v in row]) for i, row in enumerate(xn)],
        "vec_id bigint, embedding array<double>")
    cb = train_pq_codebooks(dfn, 8, 16, iters=3)
    codes = pq_encode(dfn, cb)
    queries = (dfn.filter(F.col("vec_id") < 10)
               .select(F.col("vec_id").alias("query_id"), "embedding"))
    got = pq_adc_topk(codes, cb, queries, 20).collect()
    shortlist = {}
    for r in got:
        shortlist.setdefault(r["query_id"], []).append(
            (r["rn"], r["vec_id"]))
    pure, reranked = [], []
    for qid in range(10):
        d2 = ((xn - xn[qid]) ** 2).sum(axis=1)
        exact = set(np.argsort(d2, kind="stable")[:5].tolist())
        cand = [v for _, v in sorted(shortlist[qid])]
        pure.append(len(exact & set(cand[:5])) / 5)
        rr = sorted(cand, key=lambda v: (d2[v], v))[:5]
        reranked.append(len(exact & set(rr)) / 5)
    assert float(np.mean(pure)) >= 0.5, pure
    assert float(np.mean(reranked)) >= 0.9, reranked


def test_bad_subspace_count_raises(corpus):
    df, _ = corpus
    with pytest.raises(ValueError, match="must divide"):
        train_pq_codebooks(df, 5, 4)


def test_ivfpq_store_matches_numpy_mirror(corpus, tmp_path):
    """build_ivfpq_store + read_ivfpq_topk vs an independent numpy
    mirror of the whole serving pipeline (coarse probe → ADC rank), and
    the two at-rest guarantees: the store holds codes only (no raw
    vectors) and the probe scan partition-prunes on cid."""
    from osmpbf_spark.sources.store import (
        build_ivfpq_store,
        read_ivfpq_topk,
        scan_is_pruned,
    )
    df, x = corpus
    spark = df.sparkSession
    path = str(tmp_path / "ivfpq")
    cent, books = build_ivfpq_store(df, 4, 4, 4, path, iters=2)
    stored = spark.read.parquet(path)
    assert sorted(stored.columns) == ["cid", "codes", "vec_id"]

    queries = (df.filter(F.col("vec_id") < 3)
               .select(F.col("vec_id").alias("query_id"), "embedding"))
    got = read_ivfpq_topk(spark, path, queries, 5, cent, books, nprobe=2)
    info = scan_is_pruned(got)
    assert info["partition_filters"], info["plan"][:2000]
    # codes-side joins must both be broadcasts (PLANS.md "IVF-PQ probe")
    assert "BroadcastHashJoin" in info["plan"]
    assert "SortMergeJoin" not in info["plan"]

    c = np.zeros((4, x.shape[1]))
    for r in cent.collect():
        c[r["cid"]] = r["cvec"]
    dsub = x.shape[1] // 4
    book = _codebook_array(books.collect(), 4, 4, dsub)
    coarse = np.argmin(((x[:, None, :] - c[None]) ** 2).sum(-1), axis=1)
    codes = np.stack([
        np.argmin(((book[s][None] -
                    x[:, s * dsub:(s + 1) * dsub, None].transpose(0, 2, 1))
                   ** 2).sum(-1), axis=1)
        for s in range(4)], axis=1)
    expect = set()
    for qid in range(3):
        probes = np.argsort(((c - x[qid]) ** 2).sum(-1),
                            kind="stable")[:2]
        cand = [v for v in range(len(x)) if coarse[v] in probes]
        adist = {v: sum(((x[qid, s * dsub:(s + 1) * dsub]
                          - book[s][codes[v, s]]) ** 2).sum()
                        for s in range(4)) for v in cand}
        for rn, v in enumerate(sorted(cand,
                                      key=lambda v: (adist[v], v))[:5]):
            expect.add((qid, v, rn + 1))
    assert {(r["query_id"], r["vec_id"], r["rn"])
            for r in got.collect()} == expect


def test_adc_rerank_operator_matches_numpy(corpus, trained):
    """pq_adc_rerank_topk == numpy: ADC shortlist (default 10·k), then
    exact-L2 re-rank with vec_id tie-break."""
    from osmpbf_spark.operators.pq import pq_adc_rerank_topk
    df, x = corpus
    cb, codes = trained
    m, ksub, dsub = 4, 4, x.shape[1] // 4
    book = _codebook_array(cb.collect(), m, ksub, dsub)
    queries = (df.filter(F.col("vec_id") < 5)
               .select(F.col("vec_id").alias("query_id"), "embedding"))
    k = 3
    got = {}
    for r in pq_adc_rerank_topk(codes, cb, queries, df, k).collect():
        got.setdefault(r["query_id"], []).append(
            (r["rn"], r["vec_id"], r["d2"]))
    # numpy mirror: ADC over codes → top-30 shortlist → exact d2 top-3
    codes_np = np.array([r["codes"] for r in
                         codes.orderBy("vec_id").collect()])
    recon = np.stack([np.concatenate([book[s, codes_np[i, s]]
                                      for s in range(m)])
                      for i in range(len(x))])
    for qid in range(5):
        adist = ((recon - x[qid]) ** 2).sum(axis=1)
        short = sorted(range(len(x)),
                       key=lambda v: (adist[v], v))[:10 * k]
        d2 = ((x - x[qid]) ** 2).sum(axis=1)
        want = sorted(short, key=lambda v: (d2[v], v))[:k]
        rows = sorted(got[qid])
        assert [v for _, v, _ in rows] == want, qid
        for rn, v, d in rows:
            assert abs(d - d2[v]) < 1e-9


def test_append_ivfpq_store_incremental_refresh(corpus, tmp_path):
    """Appending new vectors under the store's frozen centroids AND
    codebooks must serve exactly like a store written from the union;
    skip_existing re-appends are idempotent (codes-only rows)."""
    from osmpbf_spark.sources.store import (
        append_ivfpq_store,
        read_ivfpq_topk,
        write_ivfpq_store,
    )
    from osmpbf_spark.operators.knn import train_centroids
    df, x = corpus
    spark = df.sparkSession
    old = df.filter(F.col("vec_id") < 150)
    new = df.filter(F.col("vec_id") >= 150)
    cent = train_centroids(old, 4, iters=2)
    books = train_pq_codebooks(old, 4, 4, iters=2)
    queries = (df.filter(F.col("vec_id") < 3)
               .select(F.col("vec_id").alias("query_id"), "embedding"))

    path = str(tmp_path / "ivfpq_inc")
    write_ivfpq_store(old, cent, books, path)
    append_ivfpq_store(new, cent, books, path)
    got = read_ivfpq_topk(spark, path, queries, 5, cent, books, nprobe=2)

    full = str(tmp_path / "ivfpq_full")
    write_ivfpq_store(df, cent, books, full)
    want = read_ivfpq_topk(spark, full, queries, 5, cent, books, nprobe=2)
    assert sorted(map(tuple, got.collect())) == \
        sorted(map(tuple, want.collect()))

    n_before = spark.read.parquet(path).count()
    assert n_before == df.count()
    append_ivfpq_store(new, cent, books, path, skip_existing=True)
    assert spark.read.parquet(path).count() == n_before
    assert sorted(stored_cols := spark.read.parquet(path).columns) == \
        ["cid", "codes", "vec_id"], stored_cols
