"""SemDeDup: semantic deduplication via k-means clusters + within-
cluster cosine similarity (Abbas et al. 2023, "SemDeDup: Data-efficient
learning at web-scale through semantic deduplication" — public arXiv
recipe, re-expressed as DataFrame ops).

Where MinHash/SimHash catch near-identical TEXT and
``embedding_neardup_pairs`` catches near-identical vectors that share
an LSH bucket, SemDeDup targets semantic duplicates: documents whose
embeddings are close even when their surface text differs (re-writes,
translations of boilerplate, templated paraphrases). The public recipe:

1. k-means cluster the embedding column (the paper: 50k clusters over
   ~600M LAION embeddings);
2. within each cluster only, compute pairwise cosine similarity —
   never across clusters, which is what makes the all-pairs problem
   tractable;
3. pairs above a threshold are semantic duplicates; drop all but one
   per duplicate GROUP (the paper keeps the example with the LOWEST
   cosine to its cluster centroid — the most atypical representative;
   ``keep="min_id"`` is the deterministic alternative).

Distributed shape (the 100 TB audit):

- clustering reuses :func:`operators.knn.train_centroids`
  (deterministic, DECIMAL-accumulated — sample-train, full-assign) and
  :func:`operators.knn.ivf_assign` (centroids are a broadcast
  dimension, so assignment is map-side: the embedding table never
  shuffles to get its cid);
- the within-cluster self-join shuffles BOTH sides once on cid and is
  quadratic in cluster size BY DESIGN (that is SemDeDup's candidate
  bound); the defense against degenerate clusters is the shared
  ``_bucket_cap`` (VERDICT r4 #1) — production k must keep clusters
  ~|corpus|/k small, and overflowing clusters are excluded loudly via
  :func:`semdedup_cluster_overflow` rather than silently exploding the
  shuffle;
- SIZING k (measured, curation_scale_bench): total dim-ops ≈ assignment
  n·k·d + pairs n·(n/k)·d/2, minimized at k* ≈ √(n/2) — and the
  interpreted-HOF cosine path sustains ~75M dim-ops/s/host, so a
  too-small k is a cost CLIFF, not a degradation: k=32 at n=250k is
  ~10⁹ pairs (≈14 min) where k=512 is ~6×10⁷ (≈1 min). The paper's 50k
  clusters for 600M embeddings follows the same rule (√(6e8/2) ≈ 17k,
  rounded up because their clusters are size-skewed);
- duplicate groups come from the shared
  :func:`operators.dedup.connected_components` (min-label with the
  O(log n) star-contraction fallback), shuffling only (id, label)
  pairs;
- the final drop is a broadcast anti-join of the small drop list onto
  the full corpus — payloads never shuffle (the ``dedup_documents``
  keeper shape).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .dedup import _bucket_cap, bucket_overflow, connected_components
from .knn import _dot, _norm, ivf_assign


def auto_k(n: int, *, k_min: int = 16, k_max: int = 65_536) -> int:
    """Cost-optimal cluster count for SemDeDup over ``n`` vectors.

    Total per-dimension work is assignment (n·k·d) plus within-cluster
    pairs (n·(n/k)·d/2 for balanced clusters), minimized at
    k* = sqrt(n/2). The curve is a CLIFF below k*, not a gentle slope —
    measured at n=250k (curation_scale_bench / BENCH_NEWOPS r5): k=32
    is ~10⁹ cosine pairs (≈14 min on this host) where k=512 is ~6×10⁷
    (≈1 min) — so callers that don't know their corpus size should use
    this instead of guessing. Clamped to [k_min, k_max]: tiny inputs
    still get enough clusters for the keeper semantics to be
    interesting, and k_max bounds the broadcast centroid table
    (k·d doubles) and the k·d driver collect in ``train_centroids``
    (65,536×1,024-dim ≈ 0.5 GiB — the practical broadcast ceiling;
    above that, shard the corpus and run per-shard).

    Skewed real-world clusters make the optimum drift upward (the
    SemDeDup paper's 50k clusters for 600M embeddings ≈ 2.9× this
    rule's 17k) — the per-cluster ``max_cluster`` cap plus
    :func:`semdedup_cluster_overflow` stay the loud backstop either
    way.
    """
    if n <= 0:
        return 1
    # k can never exceed n (train_centroids needs k distinct seeds)
    return max(1, min(n, k_max, max(k_min, round((n / 2) ** 0.5))))


def _clustered(embeddings: DataFrame, centroids: DataFrame, *,
               vec_col: str, id_col: str) -> DataFrame:
    """(id_col, vec_col, cid): each vector tagged with its nearest
    centroid — a broadcast map-side assignment; ``keep_vec`` carries
    the vector through the argmin aggregate, so there is no join back
    onto the embedding table (one shuffle total, n rows)."""
    return ivf_assign(embeddings, centroids, 1, vec_col=vec_col,
                      id_col=id_col, keep_vec=True
                      ).select(id_col, vec_col, "cid")


def _pairs_from_clustered(cl: DataFrame, *, threshold: float,
                          vec_col: str, id_col: str,
                          max_cluster: int | None) -> DataFrame:
    # norms hoisted to one per ROW before the self-join (bit-identical
    # — same float sequence — but the per-PAIR HOF cost drops from
    # three interpreted aggregate folds to one; pairs outnumber rows by
    # the cluster size, so this is ~3x off the stage's dominant term;
    # the DuckDB oracle CTE has always had this shape)
    capped = _bucket_cap(cl, ["cid"], max_cluster).withColumn(
        "nrm", _norm(vec_col))
    a = capped.select(F.col(id_col).alias("id_a"),
                      F.col(vec_col).alias("v_a"),
                      F.col("nrm").alias("nrm_a"), "cid")
    b = capped.select(F.col(id_col).alias("id_b"),
                      F.col(vec_col).alias("v_b"),
                      F.col("nrm").alias("nrm_b"), "cid")
    return (a.join(b, "cid")
            .filter(F.col("id_a") < F.col("id_b"))
            .withColumn("cos_sim",
                        _dot("v_a", "v_b")
                        / (F.col("nrm_a") * F.col("nrm_b")))
            .filter(F.col("cos_sim") >= threshold)
            .select("id_a", "id_b",
                    F.round("cos_sim", 6).alias("cos_sim")))


def semdedup_pairs(embeddings: DataFrame, centroids: DataFrame, *,
                   threshold: float = 0.95,
                   vec_col: str = "embedding",
                   id_col: str = "vec_id",
                   max_cluster: int | None = 100_000) -> DataFrame:
    """Semantic-duplicate pairs (id_a, id_b, cos_sim): within-cluster
    pairwise cosine ≥ ``threshold``, cosine rounded to 6 places for
    cross-engine float stability (the ``embedding_neardup_pairs``
    convention). ``centroids`` is (cid, cvec) — offline k-means output
    (:func:`operators.knn.train_centroids`) or any deterministic
    constant set."""
    cl = _clustered(embeddings, centroids, vec_col=vec_col,
                    id_col=id_col)
    return _pairs_from_clustered(cl, threshold=threshold,
                                 vec_col=vec_col, id_col=id_col,
                                 max_cluster=max_cluster)


def semdedup_cluster_overflow(embeddings: DataFrame,
                              centroids: DataFrame, *,
                              vec_col: str = "embedding",
                              id_col: str = "vec_id",
                              max_cluster: int = 100_000) -> DataFrame:
    """The loud companion of the ``max_cluster`` cap: clusters whose
    member count exceeds it (and were therefore excluded from pairing),
    as (cid, bucket_n). Non-empty on a production corpus means k is too
    small for the corpus (or the embedding space collapsed) — retrain
    with a larger k rather than silently skipping."""
    cl = _clustered(embeddings, centroids, vec_col=vec_col,
                    id_col=id_col)
    return bucket_overflow(cl, ["cid"], max_cluster)


def semdedup_drop_ids(embeddings: DataFrame, centroids: DataFrame, *,
                      threshold: float = 0.95,
                      vec_col: str = "embedding",
                      id_col: str = "vec_id",
                      keep: str = "min_id",
                      max_cluster: int | None = 100_000) -> DataFrame:
    """Ids to DROP: every member of a semantic-duplicate group except
    its keeper. ``keep="min_id"`` keeps the smallest id (deterministic,
    oracle-friendly); ``keep="far_from_centroid"`` keeps the member
    with the LOWEST cosine to its cluster centroid (the paper's choice
    — retains the most atypical example of each duplicate group), ties
    broken on id."""
    if keep not in ("min_id", "far_from_centroid"):
        raise ValueError(f"unknown keep policy: {keep!r}")
    # the clustered frame (assignment = the stage's most expensive
    # scan) is computed ONCE and persisted: the pair join reads it
    # twice and the far-from-centroid branch a third time — the
    # unpersisted form re-ran ivf_assign for each (review r5)
    cl = _clustered(embeddings, centroids, vec_col=vec_col,
                    id_col=id_col).persist()
    try:
        pairs = _pairs_from_clustered(cl, threshold=threshold,
                                      vec_col=vec_col, id_col=id_col,
                                      max_cluster=max_cluster)
        labels = connected_components(pairs, "id_a", "id_b")
        if keep == "min_id":
            # label IS the component minimum — drop everything above it
            return (labels.filter(F.col("node") != F.col("label"))
                    .select(F.col("node").alias(id_col)))
        cent = F.broadcast(centroids.select("cid", "cvec"))
        scored = (labels
                  .join(cl, labels["node"] == cl[id_col])
                  .join(cent, "cid")
                  .withColumn("cent_cos",
                              _dot(vec_col, "cvec")
                              / (_norm(vec_col) * _norm("cvec"))))
        w = Window.partitionBy("label").orderBy(
            F.col("cent_cos"), F.col("node"))
        return (scored.withColumn("rnk", F.row_number().over(w))
                .filter(F.col("rnk") > 1)
                .select(F.col("node").alias(id_col)))
    finally:
        # connected_components materialized its rounds eagerly, and the
        # returned plans re-read cl only through the persisted blocks'
        # lifetime — the caller's next ACTION may recompute, but the
        # in-function multi-read is what the persist pays for
        cl.unpersist()


def semdedup(docs: DataFrame, embeddings: DataFrame,
             centroids: DataFrame, *, threshold: float = 0.95,
             vec_col: str = "embedding", id_col: str = "vec_id",
             doc_id_col: str = "doc_id",
             keep: str = "min_id",
             max_cluster: int | None = 100_000) -> DataFrame:
    """Documents surviving semantic dedup: ``docs`` minus rows whose
    ``doc_id_col`` matches a dropped ``id_col`` — the small drop list
    rides a broadcast anti-join, so document payloads never shuffle."""
    drop = (semdedup_drop_ids(embeddings, centroids,
                              threshold=threshold, vec_col=vec_col,
                              id_col=id_col, keep=keep,
                              max_cluster=max_cluster)
            .withColumnRenamed(id_col, doc_id_col))
    return docs.join(F.broadcast(drop), doc_id_col, "left_anti")
