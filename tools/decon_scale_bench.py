#!/usr/bin/env python
"""Decontamination scale evidence: 1M-doc synthetic corpus vs a
2k-doc eval set (the realistic shape — benchmarks are tiny, crawls are
not). Reports eval n-gram count (the broadcast side's true size),
contaminated docs found, end-to-end wall, and docs/sec.

The corpus embeds eval text in three realistic ways: ~0.5% verbatim
eval documents (test-set leakage), ~0.5% documents quoting one eval
sentence (partial leakage), the rest clean. Deterministic (hash-driven
words, no RNG).

Run:  python tools/decon_scale_bench.py [--docs 1000000] [--cpus 32]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from osmpbf_spark.operators.decontaminate import (  # noqa: E402
    contamination_hits,
    decontaminate,
    eval_ngram_hashes,
)
from osmpbf_spark.session import get_spark  # noqa: E402


def synth_corpus(spark, n_docs: int, words_per_doc: int = 40,
                 vocab: int = 100_000):
    """(doc_id, text): hash-driven word soup. doc_id % 200 == 0 →
    verbatim pseudo-eval doc (IDENTICAL text generator as the eval
    set); doc_id % 200 == 1 → clean prefix + one 13-word eval quote."""
    words = [F.concat(F.lit("w"), F.pmod(
        F.xxhash64(F.col("doc_id") * 1000 + F.lit(i)), F.lit(vocab)))
        for i in range(words_per_doc)]
    ev_words = [F.concat(F.lit("e"), F.pmod(
        F.xxhash64((F.col("doc_id") / 200).cast("long") * 1000 + F.lit(i)),
        F.lit(vocab))) for i in range(words_per_doc)]
    quote = [F.concat(F.lit("e"), F.pmod(
        F.xxhash64(((F.col("doc_id") - 1) / 200).cast("long") * 1000
                   + F.lit(i)), F.lit(vocab))) for i in range(13)]
    return (spark.range(n_docs).select(F.col("id").alias("doc_id"))
            .select("doc_id", F.when(
                F.col("doc_id") % 200 == 0, F.concat_ws(" ", *ev_words))
                .when(F.col("doc_id") % 200 == 1,
                      F.concat_ws(" ", *(words[:27] + quote)))
                .otherwise(F.concat_ws(" ", *words)).alias("text")))


def synth_eval(spark, n_eval: int, words_per_doc: int = 40,
               vocab: int = 100_000):
    """The eval benchmark: same generator as the corpus's verbatim
    leak rows (eval doc e ↔ corpus doc_id 200·e)."""
    ev_words = [F.concat(F.lit("e"), F.pmod(
        F.xxhash64(F.col("eid") * 1000 + F.lit(i)), F.lit(vocab)))
        for i in range(words_per_doc)]
    return (spark.range(n_eval).select(F.col("id").alias("eid"))
            .select(F.col("eid").alias("doc_id"),
                    F.concat_ws(" ", *ev_words).alias("text")))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=1_000_000)
    ap.add_argument("--eval-docs", type=int, default=2_000)
    ap.add_argument("--cpus", type=int, default=32)
    args = ap.parse_args()

    spark = get_spark("decon-scale", master=f"local[{args.cpus}]",
                      shuffle_partitions=args.cpus)
    spark.sparkContext.setLogLevel("ERROR")
    load = round(os.getloadavg()[0], 2)

    corpus = synth_corpus(spark, args.docs).persist()
    ev = synth_eval(spark, args.eval_docs).persist()
    n_corpus, n_eval = corpus.count(), ev.count()

    n_eval_ngrams = eval_ngram_hashes(ev, n=13).count()

    # cold end-to-end FIRST (Spark's cache manager matches by plan, so
    # running hits first would hand decontaminate a warm build side)
    t0 = time.time()
    kept = decontaminate(corpus, ev, n=13).count()
    t_full = time.time() - t0

    t0 = time.time()
    n_contam = contamination_hits(corpus, ev, n=13).count()
    t_hits = time.time() - t0

    # ground truth by construction: every %200∈{0,1} doc is
    # contaminated (verbatim, or carries a 13-word quote = one 13-gram)
    expected = sum(
        1 for i in range(args.docs)
        if (i % 200 == 0 and i // 200 < args.eval_docs)
        or (i % 200 == 1 and (i - 1) // 200 < args.eval_docs))
    print({
        "corpus_docs": n_corpus, "eval_docs": n_eval,
        "eval_ngram_hashes_broadcast": n_eval_ngrams,
        "contaminated_found": n_contam, "expected_contaminated": expected,
        "decontaminate_sec_cold": round(t_full, 2),
        "hits_sec_warm_shuffle": round(t_hits, 2),
        "docs_per_sec": round(n_corpus / t_full, 1),
        "kept_docs": kept,
        "host_load_1m": load,
    })
    assert n_contam == expected, (n_contam, expected)
    spark.stop()


if __name__ == "__main__":
    main()
