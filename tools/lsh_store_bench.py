"""Throughput evidence for the at-rest LSH signature store (VERDICT r4
#2): dedup a NEW crawl against a stored corpus via the partition-pruned
band probe vs recomputing MinHash-LSH over the full union from scratch.
Deterministic synthetic corpus; steady-state best-of-2 per trial,
medians of --trials runs. Prints the rows for BENCH_NEWOPS.md."""

from __future__ import annotations

import argparse
import os
import shutil
import statistics
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def timed(job, trials):
    job()                                 # warm-up
    secs = []
    for _ in range(trials):
        best = float("inf")
        for _ in range(2):
            t0 = time.time()
            n = job()
            best = min(best, time.time() - t0)
        secs.append(best)
    return statistics.median(secs), n


def synth_docs(spark, n, id_offset, content_offset, dup_every,
               n_words=40):
    """n docs of ~``n_words`` words; content repeats every ``dup_every`` content
    keys (one word differs within a group) so real near-dup pairs
    exist; a 1% template flood (identical text) exercises the
    signature-group compression path. ``id_offset`` keeps doc ids
    globally unique while ``content_offset`` lets a new crawl's first
    rows duplicate the content of the old corpus's last rows."""
    from pyspark.sql import functions as F
    base = spark.range(n).select(
        (F.col("id") + id_offset).alias("did"),
        (F.col("id") + content_offset).alias("ckey"))
    word = F.conv(F.hex(F.xxhash64(
        (F.col("ckey") / dup_every).cast("long") * 17 + F.lit(3))), 16, 36)
    body = F.concat_ws(
        " ", *[F.conv(F.hex(F.xxhash64(
            (F.col("ckey") / dup_every).cast("long") * 31 + F.lit(i))),
            16, 36) for i in range(n_words)])
    tail = F.when(F.col("ckey") % dup_every == 0,
                  F.concat(word, F.lit("x"))).otherwise(word)
    return base.select(
        F.col("did").cast("string").alias("doc_id"),
        F.when(F.col("ckey") % 100 == 0,
               F.lit("shared template boiler plate body words repeated "
                     "across the flood group every time"))
         .otherwise(F.concat_ws(" ", body, tail)).alias("text"))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--old", type=int, default=500_000)
    ap.add_argument("--new", type=int, default=10_000)
    ap.add_argument("--words", type=int, default=40)
    ap.add_argument("--trials", type=int, default=3)
    args = ap.parse_args()

    from osmpbf_spark.operators.dedup import minhash_lsh_pairs
    from osmpbf_spark.session import get_spark
    from osmpbf_spark.sources.store import lsh_store_pairs, write_lsh_store

    spark = get_spark("lsh-store-bench", master="local[32]",
                      shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")

    old = synth_docs(spark, args.old, 0, 0, dup_every=50,
                     n_words=args.words)
    new = synth_docs(spark, args.new, args.old, args.old - 500,
                     dup_every=50, n_words=args.words)
    tmp = tempfile.mkdtemp(prefix="lsh_store_bench_")
    path = os.path.join(tmp, "store")
    try:
        t0 = time.time()
        write_lsh_store(old, path, k=32, bands=8)
        build_s = time.time() - t0

        full_s, full_n = timed(
            lambda: minhash_lsh_pairs(old.unionByName(new), k=32, bands=8,
                                      threshold=0.5).count(), args.trials)
        probe_s, probe_n = timed(
            lambda: lsh_store_pairs(spark, new, path,
                                    threshold=0.5).count(), args.trials)
        old_only = minhash_lsh_pairs(old, k=32, bands=8,
                                     threshold=0.5).count()
        print("| LSH store probe (corpus-refresh dedup): %d-doc stored "
              "corpus (~%d words/doc) + %d-doc new crawl, k=32 "
              "bands=8 | full union "
              "recompute: %.2f s (%s pairs) · store probe: %.2f s "
              "(%s new-involving pairs; stored corpus's own %s pairs at "
              "rest) → **%.1f× faster**; one-time store build %.1f s |"
              % (args.old, args.words, args.new, full_s, format(full_n, ","), probe_s,
                 format(probe_n, ","), format(old_only, ","),
                 full_s / probe_s, build_s))
        assert full_n == probe_n + old_only, (full_n, probe_n, old_only)
        print("pair-count identity full == probe + stored: OK")
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
