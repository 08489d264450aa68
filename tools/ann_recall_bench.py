"""ANN recall-vs-throughput evidence: recall@k AND wall time of every
approximate-search leg against its exact baseline on one clustered
synthetic corpus — the trade-off curve a 100 TB embedding-search
deployment is tuned on (probe breadth / multiprobe depth / code budget
are the levers; this prints where each setting sits).

Legs (all deterministic, same corpus):
- exact cosine brute force  (the baseline + its own wall time)
- hyperplane LSH, multiprobe 0/1/2       vs exact cosine
- IVF, nprobe 1/2/4 (trained coarse quantizer)   vs exact cosine
- PQ ADC full scan (m=16, ksub=64, 96 bits/vec)  vs exact L2
- IVF-PQ at-rest store probe, nprobe 2   vs exact L2

Usage: python tools/ann_recall_bench.py [--n 100000] [--queries 32]
       [--k 10] [--trials 3]
Prints one row per leg for BENCH_NEWOPS.md.
"""

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

D = 64
N_CLUSTERS = 64
# deterministic hyperplanes (same recipe as queries._PLANES, 12 planes →
# 4096 buckets at bench scale)
PLANES = [[(((i * 13 + jj * 7) % 11) - 5) / 5.0 for jj in range(D)]
          for i in range(12)]


def synth_vectors(spark, n, *, stride=1, noise=0.8, jitter=0.0):
    """n vectors with structure at two scales: a cluster center
    (id % C) plus a CONTINUOUS per-point spread comparable to the
    inter-center distance — tight blobs would be degenerate (the first
    draft's 0.15 spread put every intra-cluster gap below PQ's
    quantization error and recall read ~0, teaching nothing). Queries
    are jittered copies of every ``stride``-th stored point
    (jitter ≪ spread), so each query has genuine near neighbours."""
    from pyspark.sql import functions as F
    jit = (f" + {jitter} * sin(CAST(vid * 29 + j * 5 AS DOUBLE) + 2.5)"
           if jitter else "")
    return (spark.range(n)
            .select((F.col("id") * stride).alias("vid"))
            .select(F.col("vid").alias("vec_id"),
                    F.expr(
                        f"transform(sequence(0, {D - 1}), j -> CAST("
                        f"sin(CAST((vid % {N_CLUSTERS}) * 1000 + j "
                        f"AS DOUBLE)) + "
                        f"{noise} * sin(CAST(vid * 17 + j * 3 AS DOUBLE))"
                        f"{jit} AS FLOAT))").alias("embedding")))


def exact_l2_topk(embeddings, queries, k):
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from osmpbf_spark.operators.knn import _dist2_arrays
    q = F.broadcast(queries.select(
        F.col("query_id"), F.col("embedding").alias("q_vec")))
    scored = (embeddings.select("vec_id",
                                F.col("embedding").alias("e_vec"))
              .join(q)
              .withColumn("d2", _dist2_arrays("q_vec", "e_vec")))
    win = Window.partitionBy("query_id").orderBy("d2", F.col("vec_id"))
    return (scored.withColumn("rn", F.row_number().over(win))
            .filter(F.col("rn") <= k)
            .select("query_id", "vec_id", "rn"))


def recall_vs(truth: dict, approx_rows, k) -> float:
    got: dict = {}
    for r in approx_rows:
        got.setdefault(r["query_id"], set()).add(r["vec_id"])
    total = sum(len(truth[q] & got.get(q, set())) for q in truth)
    return total / (len(truth) * k)


def timed(job, trials):
    job()                                        # warm-up
    secs = []
    for _ in range(trials):
        t0 = time.time()
        out = job()
        secs.append(time.time() - t0)
    return statistics.median(secs), out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=100_000)
    ap.add_argument("--queries", type=int, default=32)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--trials", type=int, default=3)
    args = ap.parse_args()

    from osmpbf_spark.operators.knn import (
        cosine_topk,
        ivf_topk,
        lsh_cosine_topk,
        train_centroids,
    )
    from osmpbf_spark.operators.pq import pq_adc_topk, train_pq_codebooks
    from osmpbf_spark.functions.sampling import hash_sample
    from osmpbf_spark.session import get_spark
    from osmpbf_spark.sources.store import build_ivfpq_store, read_ivfpq_topk

    spark = get_spark("ann-recall-bench", master="local[32]",
                      shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    k, trials = args.k, args.trials

    emb = synth_vectors(spark, args.n).persist()
    queries = (synth_vectors(spark, args.queries,
                             stride=args.n // args.queries, jitter=0.12)
               .withColumnRenamed("vec_id", "query_id").persist())
    emb.count(), queries.count()
    print(f"corpus: {args.n}×{D} in {N_CLUSTERS} clusters, "
          f"{args.queries} queries, k={k}, trials={trials}")

    rows = []

    def leg(name, job, truth):
        sec, out = timed(job, trials)
        r = recall_vs(truth, out, k)
        rows.append((name, r, sec))
        print(f"{name:34s} recall@{k}={r:.3f}  {sec:.2f}s")

    # exact cosine baseline
    sec_exact, exact_rows = timed(
        lambda: cosine_topk(emb, queries, k).collect(), trials)
    truth_cos = {}
    for r in exact_rows:
        truth_cos.setdefault(r["query_id"], set()).add(r["vec_id"])
    rows.append(("exact cosine (baseline)", 1.0, sec_exact))
    print(f"{'exact cosine (baseline)':34s} recall@{k}=1.000  "
          f"{sec_exact:.2f}s")

    for mp in (0, 1, 2):
        leg(f"LSH 12 planes, multiprobe={mp}",
            lambda mp=mp: lsh_cosine_topk(emb, queries, k, PLANES,
                                          multiprobe=mp).collect(),
            truth_cos)

    # IVF: train on a 10% hash sample, serve the full corpus
    t0 = time.time()
    cent = train_centroids(hash_sample(emb, "vec_id", 10), N_CLUSTERS,
                           iters=3).persist()
    cent.count()
    train_sec = time.time() - t0
    print(f"{'IVF train (k=%d, 10%% sample)' % N_CLUSTERS:34s} "
          f"{'':17s}{train_sec:.2f}s  (one-time)")
    for nprobe in (1, 2, 4):
        leg(f"IVF k={N_CLUSTERS}, nprobe={nprobe}",
            lambda np=nprobe: ivf_topk(emb, queries, k, cent,
                                       nprobe=np).collect(),
            truth_cos)

    # PQ legs rank by L2 — compare against the exact L2 baseline
    sec_l2, l2_rows = timed(
        lambda: exact_l2_topk(emb, queries, k).collect(), trials)
    truth_l2 = {}
    for r in l2_rows:
        truth_l2.setdefault(r["query_id"], set()).add(r["vec_id"])
    rows.append(("exact L2 (PQ baseline)", 1.0, sec_l2))
    print(f"{'exact L2 (PQ baseline)':34s} recall@{k}=1.000  "
          f"{sec_l2:.2f}s")

    t0 = time.time()
    books = train_pq_codebooks(hash_sample(emb, "vec_id", 10), 16, 64,
                               iters=3).persist()
    books.count()
    print(f"{'PQ train (m=16, ksub=64, 10% sampl)':34s} "
          f"{'':17s}{time.time() - t0:.2f}s  (one-time)")
    from osmpbf_spark.operators.pq import pq_encode
    codes = pq_encode(emb, books).persist()
    codes.count()
    leg("PQ ADC full scan (m=16, ksub=64)",
        lambda: pq_adc_topk(codes, books, queries, k).collect(),
        truth_l2)
    from osmpbf_spark.operators.pq import pq_adc_rerank_topk
    leg("PQ ADC + exact re-rank (10k short)",
        lambda: pq_adc_rerank_topk(codes, books, queries, emb,
                                   k).collect(),
        truth_l2)

    tmp = tempfile.mkdtemp(prefix="annrecall_")
    try:
        path = os.path.join(tmp, "ivfpq")
        t0 = time.time()
        cent2, books2 = build_ivfpq_store(emb, N_CLUSTERS, 16, 64, path,
                                          iters=3)
        cent2 = cent2.persist()
        books2 = books2.persist()
        cent2.count(), books2.count()
        print(f"{'IVF-PQ store build':34s} {'':17s}"
              f"{time.time() - t0:.2f}s  (one-time)")
        leg("IVF-PQ store probe, nprobe=2",
            lambda: read_ivfpq_topk(spark, path, queries, k, cent2,
                                    books2, nprobe=2).collect(),
            truth_l2)

        def store_rerank():
            from osmpbf_spark.operators.knn import exact_l2_rerank
            cand = read_ivfpq_topk(spark, path, queries, 10 * k, cent2,
                                   books2, nprobe=2)
            return exact_l2_rerank(cand, emb, queries, k).collect()

        leg("IVF-PQ store + re-rank (10k short)", store_rerank, truth_l2)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)

    print("\n| leg | recall@%d | median sec |" % k)
    print("|---|---|---|")
    for name, r, sec in rows:
        print(f"| {name} | {r:.3f} | {sec:.2f} |")
    spark.stop()


if __name__ == "__main__":
    main()
