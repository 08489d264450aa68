"""A/B evidence for the map-side-combined IVF assignment (r5).

``ivf_assign`` (nprobe=1 — the shape of every big-side caller:
SemDeDup clustering, IVF store build/append, ivf_topk's corpus leg)
used to rank the broadcast-join candidates with a window
``row_number() over (partition by id order by cdist2, cid)``: a full
sort-shuffle of n·k rows. The argmin is the same as a lexicographic
``min(struct(cdist2, cid))`` — and an aggregate partial-combines
MAP-SIDE, so the exchange carries n rows instead of n·k (the broadcast
join emits all k candidates of a vector inside one partition, so the
partial agg fully reduces before the shuffle).

This bench builds both shapes INLINE on a deterministic corpus,
asserts identical assignments, and times both.

Usage: python tools/ivf_assign_bench.py [--rows 250000] [--dim 64]
                                        [--k 512] [--trials 3]
Prints one JSON line; paste the row into BENCH_NEWOPS.md.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from pyspark.sql import Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from osmpbf_spark.operators.knn import _dist2_arrays  # noqa: E402
from osmpbf_spark.session import get_spark  # noqa: E402


def make_vectors(spark, rows: int, dim: int, id_col: str):
    terms = ", ".join(
        f"CAST(pmod(hash(id * {d + 1}), 1000) AS DOUBLE) / 500.0 - 1.0"
        for d in range(dim))
    return (spark.range(rows)
            .select(F.col("id").alias(id_col),
                    F.expr(f"array({terms})").alias("embedding")))


def assign(vectors, c, windowed: bool):
    scored = (vectors.select(F.col("vec_id"),
                             F.col("embedding").alias("_v"))
              .join(c)
              .withColumn("cdist2", _dist2_arrays("_v", "cvec")))
    if windowed:
        win = Window.partitionBy("vec_id").orderBy("cdist2", "cid")
        return (scored.withColumn("rn", F.row_number().over(win))
                .filter(F.col("rn") == 1)
                .select("vec_id", "cid"))
    return (scored.groupBy("vec_id")
            .agg(F.min(F.struct("cdist2", "cid")).alias("_m"))
            .select("vec_id", F.col("_m.cid").alias("cid")))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=250_000)
    ap.add_argument("--dim", type=int, default=64)
    ap.add_argument("--k", type=int, default=512)
    ap.add_argument("--trials", type=int, default=3)
    args = ap.parse_args()

    spark = get_spark("ivf-assign-bench", master="local[32]",
                      shuffle_partitions=32)
    emb = make_vectors(spark, args.rows, args.dim, "vec_id").persist()
    emb.count()
    # centroids: every 17th+3 vector re-labelled (deterministic spread)
    c = F.broadcast(
        make_vectors(spark, args.k * 17, args.dim, "cid")
        .filter(F.col("cid") % 17 == 3)
        .select((F.col("cid") / 17).cast("int").alias("cid"),
                F.col("embedding").alias("cvec")))

    a = {r["vec_id"]: r["cid"] for r in assign(emb, c, True).collect()}
    b = {r["vec_id"]: r["cid"] for r in assign(emb, c, False).collect()}
    assert a == b, "struct-min assignment differs from the window form"

    def run(windowed: bool) -> float:
        walls = []
        for _ in range(args.trials):
            t0 = time.time()
            # sum over cid forces the argmin (and its dist2 inputs) to
            # actually evaluate — a bare count() would let Catalyst
            # prune the unused aggregate out of the new form
            assign(emb, c, windowed).agg(F.sum("cid")).collect()
            walls.append(time.time() - t0)
        walls.sort()
        return round(walls[len(walls) // 2], 2)

    run(False)  # warm-up
    t_old = run(True)
    t_new = run(False)
    print(json.dumps({
        "metric": "IVF assignment: window row_number vs map-side struct-min",
        "rows": args.rows, "k": args.k, "dim": args.dim,
        "candidate_rows": args.rows * args.k,
        "old_sec": t_old, "new_sec": t_new,
        "speedup": round(t_old / t_new, 2),
        "identical_assignments": True,
        "trials": args.trials,
    }))


if __name__ == "__main__":
    main()
