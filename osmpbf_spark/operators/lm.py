"""N-gram language-model perplexity scoring — the CCNet-style quality
signal (Wenzek et al. 2020, "CCNet: Extracting high quality monolingual
datasets from web crawl data"): train a cheap LM on a trusted reference
corpus (CCNet uses Wikipedia; the paper uses KenLM 5-grams, this
implementation a Laplace-smoothed word BIGRAM model — the same signal
family, fully expressible in relational ops), score every candidate
document by perplexity, and gate or bucket on the score. High
perplexity ≈ text unlike the reference (gibberish, boilerplate, SEO
spam); very low ≈ templated repetition.

Model. P(w2 | w1) = (c2(w1 w2) + α) / (c1(w1) + α·V) with α = 1
(Laplace), V = reference vocabulary size, c1 counting w1's occurrences
as a bigram prefix. A document's perplexity is exp(−mean log P) over
its bigrams. Unseen prefix ⇒ P = 1/V.

Cross-engine determinism (the repo's DECIMAL invariant): each bigram's
log-probability is quantized to 6 decimals (FLOOR(x·10⁶ + 0.5)/10⁶ —
half-up, matching the text-function convention), cast to
DECIMAL(38,18) and summed exactly (partition-order-independent), and
the final perplexity is quantized to 4 decimals. Counts, α and V are
integers, so both engines feed ``ln``/``exp`` bit-identical arguments.

Distributed shape (100 TB audit):

- training is two groupBy counts over the exploded bigram stream
  (map-side partial aggregation; the reference corpus is the SMALL,
  trusted side — CCNet's Wikipedia, not the crawl);
- scoring explodes the candidate's bigrams row-locally and joins the
  LM count tables. A pruned LM (:func:`prune_lm`, the classic
  min-count cut that also shrinks KenLM models) broadcasts both
  tables, making scoring fully map-side — the crawl never shuffles;
  an unpruned web-scale LM falls back to a hash-join on the bigram
  hash, which AQE handles like any other key join;
- the per-doc aggregate shuffles only (doc_id, qlogp) pairs.
"""

from __future__ import annotations

from typing import NamedTuple

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import poly_hash_sql, shingles_sql


class BigramLM(NamedTuple):
    """Trained bigram LM: per-bigram counts (h1, h2, c2), per-prefix
    counts (h1, c1), and a single-row vocab table (v) kept as
    DataFrames so scoring composes into one Catalyst plan."""

    bigrams: DataFrame
    prefixes: DataFrame
    vocab: DataFrame


def _bigram_hashes(docs: DataFrame, *, text_col: str,
                   id_col: str | None) -> DataFrame:
    """Exploded (h1, h2) bigram stream — h2 hashes the bigram string,
    h1 its prefix word (top-level expressions per exploded row, the
    ``_shingle_hashes`` idiom — never nested inside another HOF)."""
    cols = ([F.col(id_col)] if id_col else []) + [
        F.explode(F.expr(shingles_sql(text_col, 2))).alias("bg")]
    ex = docs.select(*cols)
    return (ex.withColumn("h2", F.expr(poly_hash_sql("bg")))
            .withColumn("h1", F.expr(
                poly_hash_sql("element_at(split(bg, ' '), 1)")))
            .drop("bg"))


def train_bigram_lm(reference: DataFrame, *,
                    text_col: str = "text") -> BigramLM:
    """Train on the trusted reference corpus: bigram counts, prefix
    counts, vocabulary size. Two aggregations, both with map-side
    partial combine; the vocab is a 1-row table so it can ride the
    scoring plan as a broadcast instead of a driver collect."""
    bh = _bigram_hashes(reference, text_col=text_col, id_col=None)
    bigrams = bh.groupBy("h1", "h2").agg(F.count("*").alias("c2"))
    prefixes = bh.groupBy("h1").agg(F.count("*").alias("c1"))
    vocab = (reference.select(F.explode(F.expr(
        shingles_sql(text_col, 1))).alias("w"))
        .select(F.expr(poly_hash_sql("w")).alias("hw"))
        .agg(F.countDistinct("hw").alias("v")))
    return BigramLM(bigrams, prefixes, vocab)


def prune_lm(lm: BigramLM, min_count: int = 2) -> BigramLM:
    """Drop bigrams seen fewer than ``min_count`` times — the standard
    LM size cut. Prefix counts and V are kept exact (pruned bigrams
    fall into the smoothed mass, exactly like unseen ones), so pruning
    only coarsens tail probabilities while making the LM small enough
    to broadcast."""
    return BigramLM(lm.bigrams.filter(F.col("c2") >= min_count),
                    lm.prefixes, lm.vocab)


def perplexity(docs: DataFrame, lm: BigramLM, *, alpha: int = 1,
               text_col: str = "text", id_col: str = "doc_id",
               broadcast_lm: bool = True) -> DataFrame:
    """(id_col, n_bigrams, ppl): Laplace-smoothed bigram perplexity of
    every document under ``lm``. Documents under 2 tokens have no
    bigram and score NULL (no evidence ≠ bad). ``broadcast_lm``
    broadcasts all three LM tables (correct after :func:`prune_lm`;
    flip off for an unpruned web-scale LM to use hash joins)."""
    bg, pf, vb = lm.bigrams, lm.prefixes, lm.vocab
    if broadcast_lm:
        bg, pf, vb = F.broadcast(bg), F.broadcast(pf), F.broadcast(vb)
    scored = (_bigram_hashes(docs, text_col=text_col, id_col=id_col)
              .join(bg, ["h1", "h2"], "left")
              .join(pf, "h1", "left")
              .join(vb)
              .withColumn("p", (F.coalesce("c2", F.lit(0)) + alpha)
                          / (F.coalesce("c1", F.lit(0)) + alpha * F.col("v")))
              .withColumn("qlogp", F.expr(
                  "CAST(FLOOR(ln(p) * 1e6 + 0.5) / 1e6 "
                  "AS DECIMAL(38,18))")))
    per_doc = (scored.groupBy(id_col)
               .agg(F.count("*").alias("n_bigrams"),
                    F.sum("qlogp").alias("slog"))
               .withColumn("ppl", F.expr(
                   "FLOOR(exp(-CAST(slog AS DOUBLE) / n_bigrams) * 1e4 "
                   "+ 0.5) / 1e4"))
               .select(id_col, "n_bigrams", "ppl"))
    # every input doc appears; bigram-less docs carry NULLs
    return (docs.select(id_col)
            .join(per_doc, id_col, "left")
            .select(id_col,
                    F.coalesce("n_bigrams", F.lit(0)).alias("n_bigrams"),
                    "ppl"))


def perplexity_oracle_sql(train_where: str, *, alpha: int = 1,
                          table: str = "documents",
                          id_col: str = "doc_id",
                          text_col: str = "text") -> str:
    """The DuckDB mirror, rendered from the SAME shingle/hash renderers
    (single source of truth): train on ``{table} WHERE {train_where}``,
    score every row of ``{table}``."""
    bg = shingles_sql(text_col, 2, "duckdb")
    h2 = poly_hash_sql("bg", "duckdb")
    h1 = poly_hash_sql("string_split(bg, ' ')[1]", "duckdb")
    uni = shingles_sql(text_col, 1, "duckdb")
    hw = poly_hash_sql("w", "duckdb")
    return f"""
WITH trainbg AS (
  SELECT {h2} AS h2, {h1} AS h1
  FROM (SELECT u.bg FROM {table}, UNNEST({bg}) AS u(bg)
        WHERE {train_where})),
c2t AS (SELECT h1, h2, COUNT(*) AS c2 FROM trainbg GROUP BY 1, 2),
c1t AS (SELECT h1, COUNT(*) AS c1 FROM trainbg GROUP BY 1),
vt AS (
  SELECT COUNT(DISTINCT {hw}) AS v
  FROM (SELECT u.w FROM {table}, UNNEST({uni}) AS u(w)
        WHERE {train_where})),
docbg AS (
  SELECT {id_col}, {h2} AS h2, {h1} AS h1
  FROM (SELECT {id_col}, u.bg
        FROM {table}, UNNEST({bg}) AS u(bg))),
scored AS (
  SELECT d.{id_col},
         CAST(FLOOR(ln((COALESCE(c2t.c2, 0) + {alpha})
                       / (COALESCE(c1t.c1, 0) + {alpha} * vt.v))
                    * 1e6 + 0.5) / 1e6 AS DECIMAL(38,18)) AS qlogp
  FROM docbg d
  LEFT JOIN c2t ON c2t.h1 = d.h1 AND c2t.h2 = d.h2
  LEFT JOIN c1t ON c1t.h1 = d.h1
  CROSS JOIN vt),
per_doc AS (
  SELECT {id_col}, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
         FLOOR(exp(-CAST(SUM(qlogp) AS DOUBLE) / COUNT(*)) * 1e4
               + 0.5) / 1e4 AS ppl
  FROM scored GROUP BY 1)
SELECT t.{id_col},
       COALESCE(p.n_bigrams, CAST(0 AS BIGINT)) AS n_bigrams,
       p.ppl
FROM {table} t LEFT JOIN per_doc p USING ({id_col})
"""
