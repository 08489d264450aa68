"""Throughput evidence for the round-3 operators (as-of join, bucketed
range join): the bucketed range join vs the naive non-equi join Spark
would otherwise plan (BroadcastNestedLoopJoin), head-to-head at a size
the naive plan can still finish, then the bucketed form alone at 50×
that volume; the as-of join at millions of rows. Writes
BENCH_NEWOPS.md. Deterministic inputs, steady-state best-of-2 after a
warm-up, medians of --trials runs."""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--trials", type=int, default=3)
    ap.add_argument("--out", default=os.path.join(REPO, "BENCH_NEWOPS.md"))
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from osmpbf_spark.operators.asof import asof_join
    from osmpbf_spark.operators.rangejoin import range_join
    from osmpbf_spark.session import get_spark
    spark = get_spark("newops-bench", master="local[32]",
                      shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")

    R = 1_000_000_000

    def values(n):
        return (spark.range(n)
                .select(F.col("id").alias("vid"),
                        ((F.col("id") * 2654435761) % R).alias("v")))

    def intervals(m, length):
        return (spark.range(m)
                .select(F.col("id").alias("iid"),
                        ((F.col("id") * 40503 * 65537) % R).alias("lo"))
                .withColumn("hi", F.col("lo") + length))

    rows = []

    # head-to-head where the naive plan can still finish
    n0, m0, ln = 1_000_000, 50_000, 200_000
    va, iv = values(n0).persist(), intervals(m0, ln).persist()
    va.count(), iv.count()
    naive_s, naive_n = timed(
        lambda: va.join(iv, (F.col("v") >= F.col("lo"))
                        & (F.col("v") <= F.col("hi"))).count(),
        args.trials)
    buck_s, buck_n = timed(
        lambda: range_join(va, iv, value_col="v", lo_col="lo",
                           hi_col="hi", bucket_width=ln).count(),
        args.trials)
    assert naive_n == buck_n, (naive_n, buck_n)
    rows.append(("range join head-to-head "
                 f"({n0:,} values × {m0:,} intervals, {naive_n:,} pairs)",
                 f"naive non-equi (BroadcastNestedLoopJoin): {naive_s:.2f} s"
                 f" · bucketed equi-join: {buck_s:.2f} s → "
                 f"**{naive_s / buck_s:.1f}× faster**"))
    va.unpersist(), iv.unpersist()

    # bucketed form at 50x (naive would do ~1e12 predicate evaluations)
    n1, m1 = 10_000_000, 100_000
    va, iv = values(n1).persist(), intervals(m1, ln).persist()
    va.count(), iv.count()
    s1, c1 = timed(
        lambda: range_join(va, iv, value_col="v", lo_col="lo",
                           hi_col="hi", bucket_width=ln).count(),
        args.trials)
    rows.append((f"bucketed range join at 50× volume "
                 f"({n1:,} × {m1:,}, {c1:,} pairs)",
                 f"{s1:.2f} s = {int(n1 / s1):,} values/sec (naive plan "
                 f"skipped: ~10¹² predicate evaluations)"))
    va.unpersist(), iv.unpersist()

    # as-of join at volume: 5M left rows, 500k right rows, 10k keys
    nl, nr, keys = 5_000_000, 500_000, 10_000
    lt = (spark.range(nl)
          .select(F.col("id").alias("eid"),
                  (F.col("id") % keys).alias("k"),
                  ((F.col("id") * 2654435761) % R).alias("ts"))
          .persist())
    rt = (spark.range(nr)
          .select(F.col("id").alias("rid"),
                  (F.col("id") % keys).alias("k"),
                  ((F.col("id") * 40503 * 65537) % R).alias("rts"))
          .persist())
    lt.count(), rt.count()
    s2, c2 = timed(
        lambda: asof_join(lt, rt, on="k", left_ts="ts",
                          right_ts="rts").count(),
        args.trials)
    rows.append((f"as-of join ({nl:,} events × {nr:,} dim rows, "
                 f"{keys:,} keys, {c2:,} matched)",
                 f"{s2:.2f} s = {int(nl / s2):,} lookups/sec "
                 f"(one shuffle: the window sort)"))
    lt.unpersist(), rt.unpersist()

    with open(args.out, "w") as f:
        f.write("# BENCH_NEWOPS — as-of join & bucketed range join\n\n"
                "local[32], deterministic synthetic inputs, steady-state "
                f"best-of-2 per trial, median of {args.trials} trials. "
                "The head-to-head pins WHY the bucketed formulation "
                "exists: Spark plans a naive non-equi containment join "
                "as BroadcastNestedLoopJoin (every value row scans every "
                "interval), which stops being runnable long before "
                "cluster scale.\n\n| workload | result |\n|---|---|\n")
        for title, result in rows:
            f.write(f"| {title} | {result} |\n")
    print(json.dumps({"rows": rows}))
    spark.stop()


if __name__ == "__main__":
    main()
