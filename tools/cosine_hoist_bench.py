"""A/B evidence for the hoisted-norm cosine refactor (r5).

Every pair-producing cosine site (semdedup pairs, embedding-neardup
refine, cosine/lsh/ivf top-k serving) used to evaluate THREE
interpreted higher-order aggregate folds per joined pair — dot(a,b),
norm(a), norm(b) — even though the norms only depend on one row each.
The refactor hoists the norm to one column per input row before the
join, so each pair pays ONE fold (the dot) plus a multiply. Values are
bit-identical: the hoisted norm runs the exact same float sequence
(sum of squares then sqrt), just in an earlier projection.

This bench builds both expression shapes INLINE (not via the library,
so it keeps measuring the same thing after future refactors) on a
deterministic corpus, asserts the collected results are exactly equal,
and times both.

Usage: python tools/cosine_hoist_bench.py [--rows 100000] [--dim 64]
                                          [--queries 64] [--trials 3]
Prints one JSON line; paste the row into BENCH_NEWOPS.md.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from pyspark.sql import functions as F  # noqa: E402

from osmpbf_spark.operators.knn import _dot, _norm  # noqa: E402
from osmpbf_spark.session import get_spark  # noqa: E402


def make_corpus(spark, rows: int, dim: int):
    """Deterministic pseudo-random unit-ish vectors from pure column
    expressions of the row id (no RNG, no driver-side data)."""
    terms = ", ".join(
        f"CAST(pmod(hash(id * {d + 1}), 1000) AS DOUBLE) / 500.0 - 1.0"
        for d in range(dim))
    return (spark.range(rows)
            .select(F.col("id").alias("vec_id"),
                    F.expr(f"array({terms})").alias("embedding")))


def scored(emb, q, hoisted: bool):
    if hoisted:
        qq = F.broadcast(q.withColumn("q_nrm", _norm("q_vec")))
        return (emb.withColumn("e_nrm", _norm("e_vec"))
                .join(qq)
                .withColumn("cos_sim",
                            _dot("q_vec", "e_vec")
                            / (F.col("q_nrm") * F.col("e_nrm"))))
    return (emb.join(F.broadcast(q))
            .withColumn("cos_sim",
                        _dot("q_vec", "e_vec")
                        / (_norm("q_vec") * _norm("e_vec"))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=100_000)
    ap.add_argument("--dim", type=int, default=64)
    ap.add_argument("--queries", type=int, default=64)
    ap.add_argument("--trials", type=int, default=3)
    args = ap.parse_args()

    spark = get_spark("cosine-hoist-bench", master="local[32]",
                      shuffle_partitions=32)
    emb = (make_corpus(spark, args.rows, args.dim)
           .select(F.col("vec_id"), F.col("embedding").alias("e_vec"))
           .persist())
    emb.count()
    q = (make_corpus(spark, args.queries, args.dim)
         .select(F.col("vec_id").alias("query_id"),
                 F.col("embedding").alias("q_vec")))

    # bit-identity first: same (vec_id, query_id) -> same double, exactly
    cols = ["vec_id", "query_id", "cos_sim"]
    a = {(r["vec_id"], r["query_id"]): r["cos_sim"]
         for r in scored(emb, q, False).select(cols).collect()}
    b = {(r["vec_id"], r["query_id"]): r["cos_sim"]
         for r in scored(emb, q, True).select(cols).collect()}
    assert a == b, "hoisted form is not bit-identical"

    def run(hoisted: bool) -> float:
        walls = []
        for _ in range(args.trials):
            t0 = time.time()
            scored(emb, q, hoisted).agg(
                F.sum(F.col("cos_sim") * 0 + 1)).collect()
            walls.append(time.time() - t0)
        walls.sort()
        return round(walls[len(walls) // 2], 2)

    run(True)  # warm-up
    t_old = run(False)
    t_new = run(True)
    print(json.dumps({
        "metric": "per-pair cosine: 3 HOF folds vs hoisted per-row norms",
        "pairs": args.rows * args.queries, "dim": args.dim,
        "old_sec": t_old, "new_sec": t_new,
        "speedup": round(t_old / t_new, 2),
        "bit_identical": True,
        "trials": args.trials,
    }))


if __name__ == "__main__":
    main()
