"""Element-store scale evidence (VERDICT r1 #7): write the 33.8M-element
synth input to the sorted/partitioned store, then measure what the
zone-map layout actually buys — id-range scans vs full scans, with file
and byte counts.

Usage: python tools/store_bench.py [--nodes 32000000] [--cpus 32]
Prints one JSON line; paste the numbers into BASELINE.md.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def dir_stats(path):
    files = glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True)
    return len(files), sum(os.path.getsize(f) for f in files)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nodes", type=int, default=32_000_000)
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("--store", default="/tmp/spark_graft_store")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from osmpbf_spark.session import get_spark
    from osmpbf_spark.sources.documents import read_elements
    from osmpbf_spark.sources.store import (
        nodes_in_id_range,
        read_store,
        scan_is_pruned,
        write_elements,
    )

    skip_write = os.path.exists(args.store) and \
        os.environ.get("STORE_BENCH_REUSE")
    base = f"/tmp/spark_graft_scaling_{args.nodes}"
    if not os.path.exists(base + "/documents.parquet"):
        raise SystemExit(f"input {base} missing — run tools/scaling_bench.py "
                         f"--nodes {args.nodes} once to materialize it")
    with open(base + "/expected.json") as f:
        exp = json.load(f)
    n_elements = exp["node"] + exp["way"] + exp["relation"]

    spark = get_spark("store-bench", master=f"local[{args.cpus}]",
                      shuffle_partitions=max(args.cpus, 8))
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(base + "/documents.parquet")
    media = spark.read.parquet(base + "/media.parquet")

    if skip_write:
        t_write = float("nan")
    else:
        t0 = time.time()
        el = read_elements(docs, media, decode_partitions=args.cpus * 2)
        write_elements(el, args.store, sort_partitions=args.cpus * 2)
        t_write = time.time() - t0

    n_files, n_bytes = dir_stats(args.store)
    node_files, node_bytes = dir_stats(
        os.path.join(args.store, "element_type=node"))

    store = read_store(spark, args.store)
    # force real column reads (count(*) would be served by parquet
    # footers alone and hide the pruning effect)
    t0 = time.time()
    full = store.filter("element_type = 'node'") \
        .agg(F.count("*"), F.sum("lat_nano")).collect()[0][0]
    t_full = time.time() - t0

    lo, hi = 1_000_000, 1_100_000
    q = nodes_in_id_range(store, lo, hi)
    info = scan_is_pruned(q)
    t0 = time.time()
    pruned = q.agg(F.count("*"), F.sum("lat_nano")).collect()[0][0]
    t_pruned = time.time() - t0

    import math
    out = {
        "input_elements": n_elements,
        "write_sec": None if math.isnan(t_write) else round(t_write, 1),
        "write_elements_per_sec": None if math.isnan(t_write)
        else round(n_elements / t_write, 1),
        "store_files": n_files,
        "store_mb": round(n_bytes / 1e6, 1),
        "node_partition_files": node_files,
        "node_partition_mb": round(node_bytes / 1e6, 1),
        "full_node_count": full,
        "full_scan_sec": round(t_full, 2),
        "id_range_rows": pruned,
        "id_range_scan_sec": round(t_pruned, 2),
        "speedup": round(t_full / t_pruned, 1),
        "partition_filters": info["partition_filters"],
        "pushed_filters": info["pushed_filters"],
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
