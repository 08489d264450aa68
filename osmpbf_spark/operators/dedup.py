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
    range) → groupBy min. Documents with no shingles (< n tokens) get no
    signature rows and never pair."""
    sh = (docs.select(
        F.col(id_col),
        F.explode_outer(F.expr(shingles_sql(text_col, shingle_n)))
        .alias("shingle"))
        .filter(F.col("shingle").isNotNull())
        .distinct()
        .withColumn("h", F.expr(poly_hash_sql("shingle"))))
    perms = F.broadcast(
        docs.sparkSession.range(k).select(F.col("id").alias("j")))
    a, b = perm_sql("j")
    return (sh.join(perms)
            .withColumn("mh", F.expr(f"(({a}) * h + ({b})) % {P}"))
            .groupBy(id_col, "j")
            .agg(F.min("mh").alias("sig")))


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
    sigs = minhash_signatures(docs, k=k, shingle_n=shingle_n,
                              text_col=text_col, id_col=id_col)
    # order-independent integer band value: sum(sig * 31^(j mod r)) with
    # precomputed integer powers (exact in any engine, no float pow)
    # powers reduced mod P keep every product < P² < 2^63 for any r
    pow_case = ("CASE j % {r} " + " ".join(
        f"WHEN {i} THEN {pow(31, i, P)}" for i in range(r)) + " END"
        ).format(r=r)
    band_vals = (sigs
                 .withColumn("band", F.expr(f"j DIV {r}"))
                 .withColumn("term", F.expr(f"(sig * ({pow_case})) % {P}"))
                 .groupBy(id_col, "band")
                 .agg(F.sum("term").alias("band_val")))
    left = band_vals.select(F.col(id_col).alias("doc_a"), "band", "band_val")
    right = band_vals.select(F.col(id_col).alias("doc_b"), "band", "band_val")
    cand = (left.join(right, ["band", "band_val"])
            .filter(F.col("doc_a") < F.col("doc_b"))
            .select("doc_a", "doc_b").distinct())
    sa = sigs.select(F.col(id_col).alias("doc_a"), "j",
                     F.col("sig").alias("sig_a"))
    sb = sigs.select(F.col(id_col).alias("doc_b"), "j",
                     F.col("sig").alias("sig_b"))
    est = (cand.join(sa, "doc_a").join(sb, ["doc_b", "j"])
           .groupBy("doc_a", "doc_b")
           .agg((F.sum(F.when(F.col("sig_a") == F.col("sig_b"), 1)
                       .otherwise(0)) / F.lit(k)).alias("est_jaccard")))
    return est.filter(F.col("est_jaccard") >= threshold)


def simhash(docs: DataFrame, *, bits: int = 32, text_col: str = "text",
            id_col: str = "doc_id") -> DataFrame:
    """32-bit SimHash over whitespace tokens: bit b of the signature is
    the majority vote of bit b across token hashes. Returns
    (doc_id, simhash)."""
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
