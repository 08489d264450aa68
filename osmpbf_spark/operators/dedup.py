"""Deduplication operators for training-data pipelines.

Exact, MinHash+LSH, SimHash, n-gram Jaccard, and embedding-cosine
near-dup — each as a DataFrame composition of JVM-side built-ins.

Design for 100 TB:
- exact dedup: hash-groupBy — one shuffle on a 16-byte key, AQE-coalesced.
- MinHash: shingle→hash→permute→min is a narrow pipeline + one groupBy;
  the LSH band join touches only bucket collisions (no n² pair space).
  All hashes are pure arithmetic mod 1e9+7 — the same formulas render to
  DuckDB for the correctness oracle (no engine-specific hash functions).
- SimHash: 32-bit signatures via explode(bit)-aggregate; near-dup pairs
  from banding on signature bytes + popcount (bit_count) refine.
- embedding near-dup: hyperplane-LSH buckets + cosine refine (see knn).

Determinism: every signature derives from frozen integer constants —
same input ⇒ same pairs at any parallelism / cluster size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import (
    HASH_MOD,
    poly_hash_sql,
    shingles_sql,
    tokens_sql,
)

P = HASH_MOD


def perm_sql(j: str) -> tuple[str, str]:
    """Deterministic MinHash permutation constants for permutation ``j``
    (identical text in Spark and DuckDB SQL)."""
    return (f"(({j} + 1) * 104729 + 7) % {P}",
            f"(({j} + 1) * 7919 + 3) % {P}")


def exact_dups(docs: DataFrame, text_col: str = "text",
               id_col: str = "doc_id") -> DataFrame:
    """Exact duplicate groups: md5(text) → groups with >1 member.
    Returns (content_hash, cnt, min_doc_id as the keeper)."""
    return (docs
            .select(F.md5(F.col(text_col)).alias("content_hash"),
                    F.col(id_col))
            .groupBy("content_hash")
            .agg(F.count("*").alias("cnt"),
                 F.min(id_col).alias("keeper"))
            .filter(F.col("cnt") > 1))


def minhash_signatures(docs: DataFrame, *, k: int = 32, shingle_n: int = 3,
                       text_col: str = "text",
                       id_col: str = "doc_id") -> DataFrame:
    """MinHash signature matrix: (doc_id, j, sig) for j in [0, k).

    shingles → poly-hash → cross join k permutations (tiny broadcast
    range) → groupBy min. Deliberately the explode+groupBy formulation,
    NOT nested higher-order functions: HOF lambdas evaluate interpreted
    (outside whole-stage codegen) and projection collapse re-inlines the
    shingle hashing k times — measured ~7× slower than this shape. The
    shuffle here is small by construction: map-side partial MIN reduces
    it to docs×k rows (a few hundred bytes per document, far less than
    the input text itself). Documents with no shingles get no signature
    rows and never pair."""
    # per-document shingle dedup is row-local (array_distinct BEFORE the
    # explode) — the .distinct() it replaces shuffled the full exploded
    # doc×shingle set, the widest dataset in the pipeline
    sh = (docs.select(
        F.col(id_col),
        F.explode_outer(F.expr(
            f"array_distinct({shingles_sql(text_col, shingle_n)})"))
        .alias("shingle"))
        .filter(F.col("shingle").isNotNull())
        .withColumn("h", F.expr(poly_hash_sql("shingle"))))
    perms = F.broadcast(
        docs.sparkSession.range(k).select(F.col("id").alias("j")))
    a, b = perm_sql("j")
    return (sh.join(perms)
            .withColumn("mh", F.expr(f"(({a}) * h + ({b})) % {P}"))
            .groupBy(id_col, "j")
            .agg(F.min("mh").alias("sig")))


def minhash_doc_sigs(docs: DataFrame, *, k: int = 32, shingle_n: int = 3,
                     text_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """Per-document signature ARRAY (doc_id, sigs) — collected view of
    :func:`minhash_signatures`, ordered by permutation index."""
    sigs = minhash_signatures(docs, k=k, shingle_n=shingle_n,
                              text_col=text_col, id_col=id_col)
    return (sigs.groupBy(id_col)
            .agg(F.expr("transform(array_sort(collect_list("
                        "struct(j, sig))), x -> x.sig)").alias("sigs")))


def minhash_lsh_pairs(docs: DataFrame, *, k: int = 32, bands: int = 8,
                      shingle_n: int = 3, threshold: float = 0.5,
                      text_col: str = "text",
                      id_col: str = "doc_id") -> DataFrame:
    """Near-duplicate pairs by MinHash-LSH banding.

    k signatures in ``bands`` bands of r=k/bands rows; band value =
    order-independent polynomial sum of the band's signatures (exact
    integer arithmetic). Candidate pairs share ≥1 band bucket; the
    estimated Jaccard (fraction of equal signature rows) must reach
    ``threshold``. Returns (doc_a, doc_b, est_jaccard).
    """
    if k % bands:
        raise ValueError("k must be divisible by bands")
    r = k // bands
    sigs = minhash_doc_sigs(docs, k=k, shingle_n=shingle_n,
                            text_col=text_col, id_col=id_col)
    # band value: order-independent sum(sig·31^(j mod r)) with mod-reduced
    # integer powers — computed row-locally from the signature array
    pows = "array(" + ",".join(str(pow(31, i, P)) for i in range(r)) + ")"
    band_expr = (f"transform(sequence(0, {bands - 1}), b -> "
                 f"aggregate(zip_with(slice(sigs, b * {r} + 1, {r}), {pows},"
                 f" (s, p) -> (s * p) % {P}), 0L, (acc, v) -> acc + v))")
    bands_df = (sigs
                .select(F.col(id_col), "sigs",
                        F.posexplode(F.expr(band_expr))
                        .alias("band", "band_val")))
    # NOTE (verified r4): the static plan shows two full sig pipelines,
    # but AQE inserts a ReusedExchange at runtime — the self-join's
    # twin subtrees shuffle on identical (band, band_val) exchanges, so
    # the shingle→permute→min pipeline executes ONCE. No persist needed
    # (the r3-measured ~15% persist win predated checking the EXECUTED
    # plan; an eager localCheckpoint 2×'d the small-scale path and was
    # rejected). Plan-audited: exactly one ReusedExchange after AQE.
    left = bands_df.select(F.col(id_col).alias("doc_a"),
                           F.col("sigs").alias("sigs_a"), "band", "band_val")
    right = bands_df.select(F.col(id_col).alias("doc_b"),
                            F.col("sigs").alias("sigs_b"), "band", "band_val")
    # bucket self-join on (band, band_val) — the only shuffle in the
    # pipeline; signature arrays ride along so the Jaccard estimate is a
    # row-local zip_with on the joined pair (no second join)
    return (left.join(right, ["band", "band_val"])
            .filter(F.col("doc_a") < F.col("doc_b"))
            .select("doc_a", "doc_b",
                    (F.expr("size(filter(zip_with(sigs_a, sigs_b, "
                            "(x, y) -> x = y), v -> v))")
                     / F.lit(k)).alias("est_jaccard"))
            .distinct()
            .filter(F.col("est_jaccard") >= threshold))


def simhash(docs: DataFrame, *, bits: int = 32, text_col: str = "text",
            id_col: str = "doc_id") -> DataFrame:
    """32-bit SimHash over whitespace tokens: bit b of the signature is
    the majority vote of bit b across token hashes. Returns
    (doc_id, simhash)."""
    # explode+groupBy deliberately (same finding as MinHash: HOF lambdas
    # evaluate interpreted and projection collapse re-inlines the token
    # hashing per bit — measured slower than this codegen'd shape; the
    # shuffle is docs×32 rows after map-side partial aggregation)
    toks = (docs.select(
        F.col(id_col),
        F.explode(F.expr(tokens_sql(text_col))).alias("tok"))
        .withColumn("h", F.expr(poly_hash_sql("tok"))))
    bit_range = F.broadcast(
        docs.sparkSession.range(bits).select(F.col("id").alias("b")))
    votes = (toks.join(bit_range)
             .withColumn("bit", F.expr("(h DIV CAST(power(2, b) AS BIGINT))"
                                       " % 2"))
             .groupBy(id_col, "b")
             .agg(F.sum("bit").alias("ones"), F.count("*").alias("n")))
    return (votes
            .withColumn("term",
                        F.when(F.col("ones") * 2 > F.col("n"),
                               F.expr("CAST(power(2, b) AS BIGINT)"))
                        .otherwise(F.lit(0).cast("long")))
            .groupBy(id_col)
            .agg(F.sum("term").alias("simhash")))


def simhash_pairs(docs: DataFrame, *, max_hamming: int = 3,
                  text_col: str = "text",
                  id_col: str = "doc_id") -> DataFrame:
    """Near-dup pairs with Hamming(simhash) ≤ max_hamming. Candidates via
    byte-banding (pigeonhole: ≤3 differing bits over 4 bytes ⇒ ≥1 equal
    byte), refine via bit_count(xor)."""
    sh = simhash(docs, text_col=text_col, id_col=id_col)
    bands = sh.select(
        id_col, "simhash",
        F.explode(F.array(*[
            F.struct(F.lit(i).alias("band"),
                     F.expr(f"(simhash DIV {1 << (8 * i)}) % 256")
                     .alias("byte"))
            for i in range(4)])).alias("bb")) \
        .select(id_col, "simhash", "bb.band", "bb.byte")
    left = bands.select(F.col(id_col).alias("doc_a"),
                        F.col("simhash").alias("sh_a"), "band", "byte")
    right = bands.select(F.col(id_col).alias("doc_b"),
                         F.col("simhash").alias("sh_b"), "band", "byte")
    return (left.join(right, ["band", "byte"])
            .filter(F.col("doc_a") < F.col("doc_b"))
            .select("doc_a", "doc_b",
                    F.expr("bit_count(CAST(sh_a AS BIGINT) ^ "
                           "CAST(sh_b AS BIGINT))").alias("hamming"))
            .distinct()
            .filter(F.col("hamming") <= max_hamming))


def ngram_jaccard_pairs(docs: DataFrame, candidates: DataFrame, *,
                        n: int = 3, text_col: str = "text",
                        id_col: str = "doc_id") -> DataFrame:
    """True character-n-gram Jaccard for given candidate pairs
    (doc_a, doc_b) — the exact refine step after any LSH prefilter.
    Returns (doc_a, doc_b, jaccard rounded to 6)."""
    from ..functions.text import char_ngrams_sql
    grams = docs.select(F.col(id_col),
                        F.expr(char_ngrams_sql(text_col, n)).alias("grams"))
    ga = grams.select(F.col(id_col).alias("doc_a"),
                      F.col("grams").alias("g_a"))
    gb = grams.select(F.col(id_col).alias("doc_b"),
                      F.col("grams").alias("g_b"))
    return (candidates.join(ga, "doc_a").join(gb, "doc_b")
            .select("doc_a", "doc_b",
                    F.round(
                        F.expr("size(array_intersect(g_a, g_b))")
                        / F.expr("size(array_union(g_a, g_b))"),
                        6).alias("jaccard")))


def _star_contraction(sym: DataFrame, _ckpt, max_rounds: int) -> DataFrame:
    """Large-star/small-star contraction (Kiveris et al., "Connected
    Components in MapReduce and Beyond", SoCC'14 — public paper) →
    (node, label) with label = component minimum.

    Per round: LARGE-STAR connects every neighbour v > u to
    m = min(N(u) ∪ {u}); SMALL-STAR re-points every smaller neighbour
    (and u itself) at m. The edge set contracts toward star graphs
    rooted at each component's minimum in O(log² n) rounds worst case
    (O(log n) observed) — this is the scale path for high-diameter
    graphs where min-label propagation's O(diameter) rounds would not
    terminate. Each round shuffles only (node, node) pairs.
    """
    # canonical orientation a > b; self-loops carry no information
    e = _ckpt(sym.filter(F.col("a") != F.col("b"))
              .select(F.greatest("a", "b").alias("a"),
                      F.least("a", "b").alias("b"))
              .distinct())
    n_edges = e.count()
    for _ in range(max_rounds):
        prev, n_prev = e, n_edges
        # large-star over the SYMMETRIC neighbourhood
        s = e.unionByName(e.select(F.col("b").alias("a"),
                                   F.col("a").alias("b")))
        mins = (s.groupBy("a").agg(F.min("b").alias("mn"))
                .select("a", F.least("mn", "a").alias("m")))
        e = (s.join(mins, "a")
             .filter(F.col("b") > F.col("a"))
             .select(F.col("b").alias("a"), F.col("m").alias("b"))
             .distinct())
        # small-star over the larger→smaller directed edges (a > b here
        # by construction: m = min(N(u) ∪ {u}) < v for every emitted v)
        mins = e.groupBy("a").agg(F.min("b").alias("mn"))
        e = _ckpt(e.join(mins, "a")
                  .filter(F.col("b") != F.col("mn"))
                  .select(F.col("b").alias("a"), F.col("mn").alias("b"))
                  .unionByName(mins.select("a", F.col("mn").alias("b")))
                  .distinct())
        n_edges = e.count()
        # fixed point = the FULL round changed nothing (comparing to the
        # large-star intermediate stops one round early on chains: a
        # path's first round yields {(2,1),(3,1),(4,2),(5,3)}, which
        # small-star maps to itself although 4 and 5 are not yet rooted
        # at 1). Sets are distinct: same size + empty one-sided diff.
        if n_edges == n_prev and \
                e.join(prev, ["a", "b"], "left_anti").isEmpty():
            break
    else:
        raise RuntimeError(
            f"star contraction did not converge in {max_rounds} rounds")
    # structural guard (loud, one aggregation): a genuine star forest has
    # exactly one outgoing edge per non-root — a spurious fixed point of
    # the COMPOSED round (small∘large) that isn't a fixed point of each
    # op separately would show up here as a multi-parent node
    multi = (e.groupBy("a").count().filter(F.col("count") > 1))
    if not multi.isEmpty():
        raise RuntimeError(
            "star contraction stopped at a non-star fixed point "
            "(multi-parent nodes present); raise max_rounds")
    # converged ⇒ star forest rooted at component minima: every non-root
    # appears as `a` pointing at its root `b`; roots label themselves.
    # Singletons (nodes whose only edges were self-loops) re-enter via
    # the left join and keep their own id as the label.
    stars = (e.select(F.col("a").alias("node"), F.col("b").alias("label"))
             .unionByName(e.select(F.col("b").alias("node"),
                                   F.col("b").alias("label")))
             .groupBy("node").agg(F.min("label").alias("label")))
    nodes = sym.select(F.col("a").alias("node")).distinct()
    return _ckpt(nodes.join(stars, "node", "left")
                 .select("node", F.coalesce("label", "node").alias("label")))


def connected_components(edges: DataFrame, src: str = "doc_a",
                         dst: str = "doc_b", *,
                         max_iters: int = 30,
                         fallback_after: int = 8) -> DataFrame:
    """Connected components over an undirected edge list → (node, label)
    with label = MIN node id of the component.

    Min-label propagation: each round every node takes the minimum of
    its own label and its neighbours' labels (one equi-join + one
    groupBy-min per round, both on the node key), until a round changes
    nothing. Converges in O(component diameter) rounds — near-dup
    clusters are dense (LSH pairs link most members directly), so
    diameters are tiny in practice. If it has not converged after
    ``fallback_after`` rounds (a high-diameter graph: chains, sparse
    link networks), the loop switches to large-star/small-star
    contraction (:func:`_star_contraction`, O(log n) rounds) instead of
    burning O(diameter) rounds or raising. The labelling is identical —
    both compute label = component minimum — so the fallback never
    changes results, only the round count. Every round's result is
    eagerly checkpointed (lineage would otherwise double per round) and
    the previous generation is released. 100 TB note: rounds shuffle
    ONLY (node, label) pairs — never document payloads — and the edge
    list is partitioned once and reused.
    """
    spark = edges.sparkSession

    def _ckpt(df: DataFrame) -> DataFrame:
        if spark.sparkContext.getCheckpointDir() is not None:
            return df.checkpoint(eager=True)
        return df.localCheckpoint(eager=True)

    n_shuffle = int(spark.conf.get("spark.sql.shuffle.partitions"))
    sym = (edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
           .unionByName(edges.select(F.col(dst).alias("a"),
                                     F.col(src).alias("b")))
           .distinct()
           .repartition(n_shuffle, "a").persist())
    labels = _ckpt(sym.select(F.col("a").alias("node"))
                   .distinct()
                   .withColumn("label", F.col("node")))
    for _ in range(min(max_iters, fallback_after)):
        prop = (sym.join(labels, sym["a"] == labels["node"])
                .select(F.col("b").alias("node"), "label"))
        new = _ckpt(labels.unionByName(prop)
                    .groupBy("node").agg(F.min("label").alias("label")))
        changed = (new.alias("n")
                   .join(labels.alias("o"), "node")
                   .filter(F.col("n.label") != F.col("o.label")).count())
        labels = new
        if changed == 0:
            sym.unpersist()
            return labels
    result = _star_contraction(sym, _ckpt, max_rounds=max_iters)
    sym.unpersist()
    return result


def near_dup_clusters(docs: DataFrame, *, k: int = 32, bands: int = 8,
                      shingle_n: int = 3, threshold: float = 0.5,
                      text_col: str = "text",
                      id_col: str = "doc_id") -> DataFrame:
    """Near-duplicate CLUSTERS: MinHash-LSH pairs → connected components
    → canonical keeper per cluster. Returns one row per document that
    participates in at least one near-dup pair:
    (doc_id, cluster_id = min doc_id of the cluster, is_keeper).

    This is the step a real training-data pipeline runs after pair
    generation — "drop everything in a cluster except one" needs the
    transitive closure, not the raw pairs (A~B, B~C must discard two of
    three even when A~C was never emitted)."""
    pairs = minhash_lsh_pairs(docs, k=k, bands=bands, shingle_n=shingle_n,
                              threshold=threshold, text_col=text_col,
                              id_col=id_col)
    cc = connected_components(pairs, "doc_a", "doc_b")
    return cc.select(
        F.col("node").alias(id_col),
        F.col("label").alias("cluster_id"),
        (F.col("node") == F.col("label")).alias("is_keeper"))


def dedup_documents(docs: DataFrame, *, method: str = "exact",
                    text_col: str = "text", id_col: str = "doc_id",
                    **kwargs) -> DataFrame:
    """The end-user dedup step: return ``docs`` with duplicates REMOVED.

    ``method="exact"`` drops every row whose text hash already has a
    smaller doc_id (one shuffle on the 16-byte hash). ``method="minhash"``
    drops every non-keeper of each near-dup cluster (transitive closure
    via :func:`near_dup_clusters` — A~B, B~C removes two of three even
    when A and C never paired). Extra kwargs flow to the pair generator.
    Both keep exactly one representative (min doc_id) per group and pass
    unique documents through untouched; the big side anti-joins against
    a small drop-list, so document payloads never shuffle."""
    if method == "exact":
        groups = exact_dups(docs, text_col=text_col, id_col=id_col)
        drop = (docs.select(F.md5(F.col(text_col)).alias("content_hash"),
                            F.col(id_col))
                .join(groups, "content_hash")
                .filter(F.col(id_col) != F.col("keeper"))
                .select(id_col))
    elif method == "minhash":
        drop = (near_dup_clusters(docs, text_col=text_col, id_col=id_col,
                                  **kwargs)
                .filter(~F.col("is_keeper")).select(id_col))
    else:
        raise ValueError(f"unknown dedup method {method!r}")
    return docs.join(drop, id_col, "left_anti")


def embedding_neardup_pairs(embeddings: DataFrame, planes, *,
                            threshold: float = 0.95,
                            vec_col: str = "embedding",
                            id_col: str = "vec_id") -> DataFrame:
    """Embedding near-duplicates: hyperplane-LSH bucket join then exact
    cosine refine ≥ threshold. Returns (id_a, id_b, cos_sim)."""
    from .knn import _dot, _norm, hyperplane_signature
    sig = hyperplane_signature(embeddings, planes, vec_col=vec_col)
    a = sig.select(F.col(id_col).alias("id_a"),
                   F.col(vec_col).alias("v_a"), "sig")
    b = sig.select(F.col(id_col).alias("id_b"),
                   F.col(vec_col).alias("v_b"), "sig")
    return (a.join(b, "sig")
            .filter(F.col("id_a") < F.col("id_b"))
            .withColumn("cos_sim",
                        _dot("v_a", "v_b") / (_norm("v_a") * _norm("v_b")))
            .filter(F.col("cos_sim") >= threshold)
            .select("id_a", "id_b", F.round("cos_sim", 6).alias("cos_sim"))
            .distinct())
