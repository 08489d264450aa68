"""Product quantization (PQ) for embedding columns: train → encode → ADC.

PQ (Jégou, Douze, Schmid — "Product Quantization for Nearest Neighbor
Search", TPAMI 2011, public knowledge; PAPERS.md) is the standard at-rest
compression for 100 TB embedding corpora: a d-dim float vector becomes
``m`` small integer codes (one per d/m-dim subspace), so the serving scan
reads ~m bytes per vector instead of 4·d, and approximate distances are
computed from per-query lookup tables (ADC — asymmetric distance
computation) without ever touching the raw floats.

No reference counterpart — the reference engine has no vector surface at
all; this extends the engine's ANN tier (`operators/knn.py` brute-force /
LSH / IVF) with the compressed-codes serving path that real pipelines put
UNDER the IVF layout (IVF-PQ: coarse centroid partitions prune the scan,
PQ codes shrink what the probed partitions hold — `sources/store.py:
write_ivfpq_store`).

Determinism contract (repo-wide rule): every training and serving step is
a pure function of the input, independent of partitioning and cluster
size —

- codebooks come from :func:`osmpbf_spark.operators.knn.train_centroids`
  per subspace (Knuth-hash init, DECIMAL(28,18) assignment distances,
  DECIMAL-routed means);
- encoding argmins accumulate in DECIMAL(28,18) with cid tie-break;
- ADC partial distances are DECIMAL(28,18) and their sum is an exact
  fixed-scale decimal SUM (order-independent), so ranks tie-break on ids
  with no float ambiguity.

The whole train→encode→ADC pipeline is therefore mirrorable step-for-step
by a DuckDB CTE oracle (the ``pq`` leg of the driver's ``ann_topk`` row).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .knn import _dec_dist2_arrays, train_centroids


def _subspace_bounds(d: int, m: int) -> list[tuple[int, int]]:
    """1-based (start, length) slice per subspace; requires m | d."""
    if m < 1 or d % m != 0:
        raise ValueError(f"m={m} must divide the embedding dim d={d}")
    dsub = d // m
    return [(1 + s * dsub, dsub) for s in range(m)]


def _vec_dim(vectors: DataFrame, vec_col: str) -> int:
    dims = [r[0] for r in
            vectors.select(F.size(vec_col)).distinct().limit(2).collect()]
    if len(dims) != 1:
        raise ValueError(f"ragged embedding dims {sorted(dims)}")
    return dims[0]


def train_pq_codebooks(vectors: DataFrame, m: int, ksub: int, *,
                       iters: int = 3, vec_col: str = "embedding",
                       id_col: str = "vec_id") -> DataFrame:
    """Train ``m`` per-subspace codebooks of ``ksub`` centroids each →
    (sub, cid, cvec), cvec of dim d/m.

    Each subspace runs the deterministic distributed Lloyd trainer
    (:func:`~osmpbf_spark.operators.knn.train_centroids`) on the sliced
    view of the vectors — m small independent k-means, exactly the PQ
    recipe. Codebooks are driver-scale metadata (m·ksub·d/m doubles =
    d·ksub total — the same size class as one flat codebook of ksub
    full vectors), broadcast everywhere they are used.

    100 TB note: like the coarse IVF trainer, train on a deterministic
    hash-sample of the corpus (``pmod(xxhash64(id), s) = 0`` upstream);
    encoding and serving stay full-scale and distributed.
    """
    d = _vec_dim(vectors, vec_col)
    spark = vectors.sparkSession
    out = None
    for sub, (start, length) in enumerate(_subspace_bounds(d, m)):
        sliced = vectors.select(
            F.col(id_col),
            F.slice(vec_col, start, length).alias("_sub_vec"))
        cents = (train_centroids(sliced, ksub, iters=iters,
                                 vec_col="_sub_vec", id_col=id_col)
                 .select(F.lit(sub).alias("sub"), "cid", "cvec"))
        out = cents if out is None else out.unionByName(cents)
    return out


def _exploded_subvectors(vectors: DataFrame, d: int, m: int,
                         vec_col: str, id_col: str,
                         out_id: str) -> DataFrame:
    """(out_id, sub, subvec) — one row per (vector, subspace), built
    row-locally (array-of-slices + posexplode; no shuffle)."""
    slices = F.array(*[
        F.expr(f"transform(slice({vec_col}, {start}, {length}), "
               f"x -> CAST(x AS DOUBLE))")
        for start, length in _subspace_bounds(d, m)])
    return (vectors
            .select(F.col(id_col).alias(out_id),
                    F.posexplode(slices).alias("sub", "subvec")))


def _codebook_m(codebooks: DataFrame) -> int:
    """Subspace count of a codebook table — ONE tiny max aggregate.
    Serving paths that already know m (train parameters, store
    metadata) should pass it instead: review r5 found every serving
    call paying a blocking distinct-count job per codebook read."""
    return codebooks.agg(F.max("sub")).collect()[0][0] + 1


def pq_encode(vectors: DataFrame, codebooks: DataFrame, *,
              vec_col: str = "embedding", id_col: str = "vec_id",
              m: int | None = None) -> DataFrame:
    """Encode every vector to its PQ codes → (id_col, codes: array<int>),
    codes[s] = argmin over the subspace-s codebook (DECIMAL distance,
    cid tie-break).

    Plan shape (scale design): subvectors explode row-locally (n·m
    rows), join the BROADCAST codebook on ``sub`` (n·m·ksub candidate
    rows, never shuffled — the per-(id, sub) argmin is a
    ``min(struct(d2, cid))`` aggregation whose partial runs map-side),
    then one shuffle of n·m tiny (id, sub, code) rows to reassemble the
    code arrays. The vectors themselves cross the wire zero times.
    """
    d = _vec_dim(vectors, vec_col)
    if m is None:
        m = _codebook_m(codebooks)
    subs = _exploded_subvectors(vectors, d, m, vec_col, id_col, "_pq_id")
    cb = F.broadcast(codebooks.select("sub", "cid", "cvec"))
    assigned = (subs.join(cb, "sub")
                .withColumn("d2", _dec_dist2_arrays("subvec", "cvec"))
                .groupBy("_pq_id", "sub")
                .agg(F.min(F.struct("d2", "cid")).alias("best"))
                .select("_pq_id", "sub", F.col("best.cid").alias("code")))
    return (assigned
            .groupBy("_pq_id")
            .agg(F.array_sort(F.collect_list(F.struct("sub", "code")))
                 .alias("sc"))
            .select(F.col("_pq_id").alias(id_col),
                    F.expr("transform(sc, x -> x.code)").alias("codes")))


def pq_distance_table(queries: DataFrame, codebooks: DataFrame, *,
                      vec_col: str = "embedding",
                      query_id_col: str = "query_id",
                      m: int | None = None) -> DataFrame:
    """Per-query ADC lookup table → (query_id, sub, cid, pdist) with
    pdist = Σ(q_sub − cvec)² in DECIMAL(28,18). q·m·ksub rows — driver-
    scale metadata for any realistic query batch; callers broadcast it.
    """
    d = _vec_dim(queries, vec_col)
    if m is None:
        m = _codebook_m(codebooks)
    qsubs = _exploded_subvectors(queries, d, m, vec_col, query_id_col,
                                 query_id_col)
    cb = F.broadcast(codebooks.select("sub", "cid", "cvec"))
    return (qsubs.join(cb, "sub")
            .select(query_id_col, "sub", "cid",
                    _dec_dist2_arrays("subvec", "cvec").alias("pdist")))


def pq_adc_topk(codes: DataFrame, codebooks: DataFrame,
                queries: DataFrame, k: int, *,
                vec_col: str = "embedding", id_col: str = "vec_id",
                query_id_col: str = "query_id",
                m: int | None = None) -> DataFrame:
    """Approximate k-NN by asymmetric distance computation over PQ codes
    → (query_id, vec_id, adist, rn), rn = 1..k per query ranked by
    ascending approximate squared L2 distance (exact-decimal, vec_id
    tie-break — fully deterministic).

    ``codes`` is :func:`pq_encode` output (or an at-rest codes store
    scan); raw vectors are NEVER read on the corpus side — that is the
    point of PQ at 100 TB. Plan shape: codes posexplode row-locally
    (n·m rows), join the BROADCAST distance table on (sub, code) — no
    shuffle of the corpus — then ONE shuffle of n·q (query_id, vec_id,
    partial-sum) rows into the final exact-decimal SUM + window rank.
    At 1000 executors the only all-to-all traffic is the per-pair
    aggregate, the same volume class as the exact brute-force scorer,
    while the scan itself reads m bytes per vector instead of 4·d.
    """
    dtab = F.broadcast(
        pq_distance_table(queries, codebooks, vec_col=vec_col,
                          query_id_col=query_id_col, m=m))
    pairs = (codes
             .select(F.col(id_col),
                     F.posexplode("codes").alias("sub", "cid"))
             .join(dtab, ["sub", "cid"])
             .groupBy(query_id_col, id_col)
             .agg(F.sum("pdist").alias("adist")))
    win = Window.partitionBy(query_id_col).orderBy("adist", F.col(id_col))
    return (pairs.withColumn("rn", F.row_number().over(win))
            .filter(F.col("rn") <= k)
            .select(query_id_col, id_col, "adist", "rn"))


def pq_reconstruct(codes: DataFrame, codebooks: DataFrame, *,
                   id_col: str = "vec_id") -> DataFrame:
    """Decode codes back to approximate vectors → (id_col, approx:
    array<double>) — the reconstruction ADC distances are implicitly
    measured against; used by tests to bound quantization error. Same
    broadcast-join shape as encoding; one shuffle of n·m subvector rows.
    """
    cb = F.broadcast(codebooks.select("sub", "cid", "cvec"))
    return (codes
            .select(F.col(id_col),
                    F.posexplode("codes").alias("sub", "cid"))
            .join(cb, ["sub", "cid"])
            .groupBy(id_col)
            .agg(F.array_sort(F.collect_list(F.struct("sub", "cvec")))
                 .alias("sc"))
            .select(id_col,
                    F.expr("flatten(transform(sc, x -> x.cvec))")
                    .alias("approx")))


def pq_adc_rerank_topk(codes: DataFrame, codebooks: DataFrame,
                       queries: DataFrame, vectors: DataFrame, k: int, *,
                       shortlist: int | None = None,
                       vec_col: str = "embedding", id_col: str = "vec_id",
                       query_id_col: str = "query_id",
                       m: int | None = None) -> DataFrame:
    """ADC shortlist + EXACT re-rank — the standard production PQ recipe
    (Jégou et al. TPAMI 2011 §V.C): :func:`pq_adc_topk` ranks a
    ``shortlist`` (default 10·k) by approximate distance, then the raw
    vectors of ONLY those candidates are fetched and re-scored with
    exact L2 → (query_id, vec_id, d2, rn), rn = 1..k.

    Why it exists: ADC quantization error swamps the tiny distance gaps
    between a query's true near neighbours when they share a cluster —
    measured recall@10 collapses to ~0.2 on tightly-clustered corpora
    (tools/ann_recall_bench.py) while the 10·k shortlist still CONTAINS
    the true neighbours; exact re-ranking recovers them for the cost of
    fetching shortlist·q raw vectors. 100 TB shape: the corpus-side scan
    stays codes-only (m bytes/vector); the re-rank fetch is a point-
    lookup equi-join on ``id_col`` pulling q·shortlist rows — at rest
    this is the primary table's key layout, and the fetched set
    (shortlist × d floats per query) is orders below the scan."""
    if shortlist is None:
        shortlist = 10 * k
    from .knn import exact_l2_rerank
    cand = pq_adc_topk(codes, codebooks, queries, shortlist,
                       vec_col=vec_col, id_col=id_col,
                       query_id_col=query_id_col, m=m)
    return exact_l2_rerank(cand, vectors, queries, k, vec_col=vec_col,
                           id_col=id_col, query_id_col=query_id_col)
