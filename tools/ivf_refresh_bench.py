"""Throughput evidence for the incremental ANN-index refresh: append a
NEW crawl's vectors to an at-rest IVF store under its frozen centroids
(`append_ivf_store`) vs rebuilding the store over the full union — the
cost a refresh pipeline pays per crawl with and without the append path.
Deterministic synthetic vectors; median of --trials timed runs, each on
a pristine copy of the one-time build (append mutates the store).
Prints the row for BENCH_NEWOPS.md."""

from __future__ import annotations

import argparse
import os
import shutil
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def synth_vectors(spark, n, d, id_offset=0):
    """n deterministic d-dim vectors with mild cluster structure (xxhash
    mixes, no RNG) — the same recipe class as ann_recall_bench."""
    from pyspark.sql import functions as F
    base = spark.range(n).select((F.col("id") + id_offset).alias("vec_id"))
    comps = [
        ((F.xxhash64(F.col("vec_id") * 13 + F.lit(i)) % 1000) / 250.0
         + (F.xxhash64((F.col("vec_id") % 16) * 7 + F.lit(i)) % 8)
         .cast("double")).alias(f"c{i}")
        for i in range(d)]
    return base.select("vec_id", F.array(*comps).alias("embedding"))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--stored", type=int, default=500_000)
    ap.add_argument("--new", type=int, default=10_000)
    ap.add_argument("--dim", type=int, default=64)
    ap.add_argument("--k", type=int, default=64)
    ap.add_argument("--trials", type=int, default=3)
    ap.add_argument("--cpus", type=int, default=32)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from osmpbf_spark.functions.sampling import hash_sample
    from osmpbf_spark.operators.knn import train_centroids
    from osmpbf_spark.session import get_spark
    from osmpbf_spark.sources.store import (
        append_ivf_store,
        ivf_store_stats,
        read_ivf_topk,
        write_ivf_store,
    )

    spark = get_spark("ivf-refresh-bench", master=f"local[{args.cpus}]",
                      shuffle_partitions=args.cpus)
    spark.sparkContext.setLogLevel("ERROR")

    stored = synth_vectors(spark, args.stored, args.dim).persist()
    new = synth_vectors(spark, args.new, args.dim,
                        id_offset=args.stored).persist()
    union = stored.unionByName(new)
    stored.count(), new.count()

    t0 = time.time()
    cent = train_centroids(
        hash_sample(stored, "vec_id", max(1, args.stored // 20_000)),
        args.k, iters=4).persist()
    cent.count()
    t_train = time.time() - t0

    root = "/tmp/ivf_refresh_bench"
    shutil.rmtree(root, ignore_errors=True)
    pristine = os.path.join(root, "pristine")
    t0 = time.time()
    write_ivf_store(stored, cent, pristine)
    t_build = time.time() - t0

    # refresh path: per trial, restore a pristine copy (outside the
    # timer), then time the real first append of the new crawl
    t_appends = []
    work = os.path.join(root, "work")
    for _ in range(args.trials):
        shutil.rmtree(work, ignore_errors=True)
        shutil.copytree(pristine, work)
        t0 = time.time()
        append_ivf_store(new, cent, work, skip_existing=True)
        t_appends.append(time.time() - t0)
    t_append = statistics.median(t_appends)

    # what append avoids: rebuilding the whole store under the same
    # frozen centroids
    t_rebuilds = []
    for i in range(args.trials):
        full = os.path.join(root, f"full{i}")
        t0 = time.time()
        write_ivf_store(union, cent, full)
        t_rebuilds.append(time.time() - t0)
    t_rebuild = statistics.median(t_rebuilds)

    # sanity: the appended store serves exactly like the rebuilt one
    q = (new.limit(8)
         .select(F.col("vec_id").alias("query_id"), "embedding"))
    a = sorted(map(tuple, read_ivf_topk(
        spark, work, q, 10, cent, nprobe=2).collect()))
    b = sorted(map(tuple, read_ivf_topk(
        spark, os.path.join(root, "full0"), q, 10, cent,
        nprobe=2).collect()))
    assert a == b, "append-served topk != rebuild-served topk"
    stats = ivf_store_stats(spark, work)
    assert stats["rows"] == args.stored + args.new, stats

    print(f"stored={args.stored:,} new={args.new:,} d={args.dim} "
          f"k={args.k} local[{args.cpus}] trials={args.trials}")
    print(f"one-time: train {t_train:.1f} s, build {t_build:.1f} s")
    print(f"append new crawl: {t_append:.2f} s (all trials "
          f"{[round(t, 2) for t in t_appends]})")
    print(f"rebuild union:    {t_rebuild:.2f} s (all trials "
          f"{[round(t, 2) for t in t_rebuilds]})")
    print(f"speedup: {t_rebuild / t_append:.1f}x; served topk identical; "
          f"imbalance {stats['imbalance']}")
    spark.stop()


if __name__ == "__main__":
    main()
