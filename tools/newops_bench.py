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

    # IVF at-rest store: probed-partition scan vs full-scan IVF
    from osmpbf_spark.operators.knn import ivf_topk
    from osmpbf_spark.sources.store import read_ivf_topk, write_ivf_store
    nv, dim, nc = 500_000, 16, 64
    emb = (spark.range(nv)
           .select(F.col("id").alias("vec_id"),
                   F.expr("transform(sequence(1, %d), j -> "
                          "CAST((id * j * 2654435761 %% 1000) AS DOUBLE)"
                          " / 1000)" % dim).alias("embedding"))
           .persist())
    emb.count()
    cent = (emb.filter(F.col("vec_id") < nc)
            .select(F.col("vec_id").alias("cid"),
                    F.col("embedding").alias("cvec")).persist())
    cent.count()
    qs = (emb.filter((F.col("vec_id") >= 100) & (F.col("vec_id") < 116))
          .select(F.col("vec_id").alias("query_id"), "embedding")
          .persist())
    qs.count()
    store = "/tmp/newops_ivf_store"
    write_ivf_store(emb, cent, store)
    mem_s, _ = timed(lambda: ivf_topk(emb, qs, 10, cent,
                                      nprobe=2).count(), args.trials)
    st_s, _ = timed(lambda: read_ivf_topk(spark, store, qs, 10, cent,
                                          nprobe=2).count(), args.trials)
    nprobed = (spark.read.parquet(store).select("cid").distinct().count())
    from osmpbf_spark.operators.knn import ivf_assign
    hit = (ivf_assign(qs, cent, 2, id_col="query_id")
           .select("cid").distinct().count())
    rows.append((f"IVF ANN at rest ({nv:,}×{dim}-dim, {nc} centroids, "
                 f"16 queries, nprobe=2 → {hit}/{nprobed} partitions "
                 f"probed)",
                 f"in-memory full assign+scan: {mem_s:.2f} s · "
                 f"partition-pruned store scan: {st_s:.2f} s → "
                 f"**{mem_s / st_s:.1f}× faster** (store build is the "
                 f"offline one-time cost)"))
    emb.unpersist(), cent.unpersist(), qs.unpersist()

    with open(args.out, "w") as f:
        f.write("# BENCH_NEWOPS — round-3 operators (as-of, range join, IVF store)\n\n"
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
