"""Star-contraction scale evidence (VERDICT r4 #5): connected
components with the FORCED large-star/small-star fallback on a ~10M-edge
synthetic graph mixing the two adversarial shapes — long chains (the
high-diameter case min-label propagation cannot finish) and dense
cliques (the near-dup template case). Labels are verified against the
ANALYTIC component minima for every node (stronger than a sampled
union-find oracle: the construction fixes each component's minimum).
Prints the BENCH_NEWOPS.md row: wall, rounds, per-round surviving-edge
counts (= the round's shuffle volume)."""

from __future__ import annotations

import argparse
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--chains", type=int, default=50)
    ap.add_argument("--chain-len", type=int, default=100_000)
    ap.add_argument("--cliques", type=int, default=1_000)
    ap.add_argument("--clique-size", type=int, default=100)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from osmpbf_spark.operators.dedup import connected_components
    from osmpbf_spark.session import get_spark
    spark = get_spark("cc-scale-bench", master="local[32]",
                      shuffle_partitions=64)
    spark.sparkContext.setLogLevel("ERROR")

    CH_BASE = 1_000_000       # chain c occupies [c*CH_BASE, c*CH_BASE+len)
    CL_BASE = 10**12          # clique k occupies [CL_BASE + k*1000, +size)
    chain_edges = (
        spark.range(args.chains * (args.chain_len - 1))
        .select(((F.col("id") / (args.chain_len - 1)).cast("long")
                 * CH_BASE
                 + F.col("id") % (args.chain_len - 1)).alias("doc_a"))
        .withColumn("doc_b", F.col("doc_a") + 1))
    n = args.clique_size
    pairs = [(i, j) for i in range(n) for j in range(i + 1, n)]
    pair_df = spark.createDataFrame(pairs, "i long, j long")
    clique_edges = (
        spark.range(args.cliques)
        .select((F.lit(CL_BASE) + F.col("id") * 1000).alias("base"))
        .crossJoin(F.broadcast(pair_df))
        .select((F.col("base") + F.col("i")).alias("doc_a"),
                (F.col("base") + F.col("j")).alias("doc_b")))
    edges = chain_edges.unionByName(clique_edges)
    n_edges = edges.count()

    stats: dict = {}
    t0 = time.time()
    # fallback_after=0 skips min-label propagation entirely — the point
    # is the star-contraction path (propagation would need chain-length
    # rounds on the 100k chains)
    cc = connected_components(edges, fallback_after=0, stats=stats)
    # analytic oracle: every node's component minimum is fixed by
    # construction — chain c -> c*CH_BASE, clique k -> its base
    expect = F.when(F.col("node") >= CL_BASE,
                    (F.floor(F.col("node") / 1000) * 1000).cast("long")) \
              .otherwise((F.floor(F.col("node") / CH_BASE)
                          * CH_BASE).cast("long"))
    wrong = cc.filter(F.col("label") != expect).count()
    total = cc.count()
    wall = time.time() - t0
    n_nodes = (args.chains * args.chain_len
               + args.cliques * args.clique_size)
    assert wrong == 0, f"{wrong} mislabeled nodes"
    assert total == n_nodes, (total, n_nodes)
    ec = stats["edge_counts"]
    print("| star-contraction CC at scale: %s edges / %s nodes "
          "(%d chains × %s-node paths + %s cliques × %d), forced "
          "fallback, local[32] | **%.1f s, %d rounds** (≈ log₂ of the "
          "10⁵ chain diameter — the O(log n) bound); surviving edges "
          "%s → %s after round 1, flat thereafter | every node's label "
          "verified against the analytic component minimum "
          "(0 mismatches); per-round shuffle volume caps at one parent "
          "pointer per non-root node (%s here) while pointers double "
          "toward the root — cliques collapse to stars in round 1, "
          "chains take the log rounds |"
          % (format(n_edges, ","), format(n_nodes, ","), args.chains,
             format(args.chain_len, ","), format(args.cliques, ","),
             args.clique_size, wall, stats["rounds"],
             format(ec[0], ","), format(ec[1], ","),
             format(ec[-1], ",")))
    spark.stop()


if __name__ == "__main__":
    main()
