"""Benchmark decontamination: drop training documents that share word
n-grams with an evaluation set.

The standard public recipe (GPT-3 appendix C, Llama 2, Dolma): a
training document is contaminated when any (or ``min_hits``) of its
word ``n``-grams also occurs in the eval corpus — n-gram collision is
the cheap, conservative proxy for "the model saw the test set". This is
the one dedup-family operator whose REFERENCE side (the eval set) is
tiny by construction, which fixes the distributed shape completely:

- eval side: shingle → hash → distinct, then BROADCAST (benchmarks are
  thousands-to-millions of n-grams; the corpus is the 100 TB side);
- corpus side: the same row-local shingle/hash projection
  (``array_distinct`` before the explode — no shuffle), LEFT SEMI
  against the broadcast eval hashes, so only actual HITS survive into
  the one (doc_id) count shuffle — bounded by contamination volume,
  not corpus size;
- the contaminated-id list (small) rides a broadcast anti-join back
  onto the full documents — payloads never shuffle, the same shape as
  ``dedup.dedup_documents`` keepers and the store probes.

Shingling and hashing reuse the dual-rendered ``shingles_sql`` /
``wide_hash_sql`` renderers, so the DuckDB oracle runs the IDENTICAL
expressions (single source of truth, CLAUDE.md invariant). The hash is
the ~62-bit wide form, not MinHash's mod-1e9 — at web scale the small
modulus measurably drops clean documents (see ``wide_hash_sql``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import (
    HASH_MOD2,
    _poly2_sql,
    poly_hash_sql,
    shingles_sql,
)


def _shingles(docs: DataFrame, *, n: int, text_col: str,
              id_col: str | None) -> DataFrame:
    """Row-local distinct word-``n``-gram projection (array_distinct
    BEFORE the explode — no shuffle), shingle string retained for the
    staged hashing below."""
    cols = ([F.col(id_col)] if id_col else []) + [
        F.explode_outer(F.expr(
            f"array_distinct({shingles_sql(text_col, n)})"))
        .alias("shingle")]
    return docs.select(*cols).filter(F.col("shingle").isNotNull())


def _eval_hash_pairs(eval_docs: DataFrame, *, n: int,
                     text_col: str) -> DataFrame:
    """Distinct (h1, h2) hash pairs of the eval set's ``n``-grams —
    together the ~62-bit wide hash (see ``wide_hash_sql``): mod-1e9
    alone measurably false-drops clean documents at corpus scale
    (1,567 phantom hits on a 1M-doc synthetic, within 0.1% of the
    birthday bound — tools/decon_scale_bench.py). The eval side is
    tiny, so it pays both folds up front."""
    return (_shingles(eval_docs, n=n, text_col=text_col, id_col=None)
            .select(F.expr(poly_hash_sql("shingle")).alias("h1"),
                    F.expr(_poly2_sql("shingle", "spark")).alias("h2"))
            .distinct())


def eval_ngram_hashes(eval_docs: DataFrame, *, n: int = 13,
                      text_col: str = "text") -> DataFrame:
    """Distinct wide (~62-bit) hashes of the eval set's word
    ``n``-grams — the broadcast side of every decontamination probe,
    and the values an at-rest eval-hash store would persist. Eval
    documents shorter than ``n`` tokens contribute nothing (they have
    no ``n``-gram to collide on; pick a smaller ``n`` for short-answer
    benchmarks)."""
    return (_eval_hash_pairs(eval_docs, n=n, text_col=text_col)
            .select((F.col("h1") * HASH_MOD2 + F.col("h2")).alias("h"))
            .distinct())


def contamination_hits(docs: DataFrame, eval_docs: DataFrame, *,
                       n: int = 13, text_col: str = "text",
                       id_col: str = "doc_id") -> DataFrame:
    """(id_col, eval_hits): per-document count of DISTINCT ``n``-grams
    shared with the eval set — only documents with at least one hit
    appear. The count shuffle carries hit rows alone (the semi-join
    runs map-side against the broadcast eval hashes)."""
    ev = _eval_hash_pairs(eval_docs, n=n, text_col=text_col)
    # staged refine: the corpus pays ONE hash fold per shingle; the
    # second fold runs only on first-stage survivors (true hits plus
    # the ~|corpus n-grams|·|eval|/1e9 birthday collisions — measured
    # 5.5k rows of 28M at 1M docs), restoring single-fold throughput
    # while matching on the full wide hash. Both joins are map-side
    # against the broadcast eval pairs.
    cand = (_shingles(docs, n=n, text_col=text_col, id_col=id_col)
            .withColumn("h1", F.expr(poly_hash_sql("shingle")))
            .join(F.broadcast(ev.select("h1").distinct()),
                  "h1", "left_semi"))
    return (cand
            .withColumn("h2", F.expr(_poly2_sql("shingle", "spark")))
            .join(F.broadcast(ev), ["h1", "h2"], "left_semi")
            .groupBy(id_col)
            .agg(F.count("*").alias("eval_hits")))


def decontaminate(docs: DataFrame, eval_docs: DataFrame, *,
                  n: int = 13, min_hits: int = 1,
                  text_col: str = "text",
                  id_col: str = "doc_id") -> DataFrame:
    """Documents surviving decontamination: every column of ``docs``,
    minus those with ``>= min_hits`` distinct eval n-gram collisions.
    ``min_hits > 1`` is the standard guard against incidental single
    n-gram collisions on boilerplate when ``n`` is small."""
    bad = (contamination_hits(docs, eval_docs, n=n, text_col=text_col,
                              id_col=id_col)
           .filter(F.col("eval_hits") >= min_hits)
           .select(id_col))
    return docs.join(F.broadcast(bad), id_col, "left_anti")


def contamination_profile(docs: DataFrame, eval_docs: DataFrame, *,
                          n: int = 13, min_hits: int = 1,
                          text_col: str = "text",
                          id_col: str = "doc_id") -> DataFrame:
    """Audit view over the FULL corpus: (id_col, eval_hits, kept) for
    every document — survivors carry eval_hits = 0. This is the
    human-review artifact a production decontamination pass logs before
    the drop is applied."""
    hits = contamination_hits(docs, eval_docs, n=n, text_col=text_col,
                              id_col=id_col)
    return (docs.select(id_col)
            .join(hits, id_col, "left")
            .select(
                F.col(id_col),
                F.coalesce("eval_hits", F.lit(0)).alias("eval_hits"),
                (F.coalesce("eval_hits", F.lit(0)) < min_hits)
                .alias("kept")))
