#!/usr/bin/env python
"""spark-submit entry: decode interleaved documents → element store →
grid index → PIP join, with per-stage metrics and checkpoint resume.

Cluster usage (north_rule delivery shape):

    python tools/make_pyfiles.py            # → dist/osmpbf_spark.zip
    spark-submit --py-files dist/osmpbf_spark.zip \\
        jobs/decode_pip_job.py \\
        --documents s3://…/documents --media s3://…/media \\
        --polygons polygons.json --out s3://…/out --resume

Local smoke:

    python jobs/decode_pip_job.py --synth-nodes 100000 --out /tmp/osm_out

Resumability: each stage writes to its own output path and a _SUCCESS-
gated stage is skipped on --resume (the parquet stand-in for Iceberg
snapshot checkpoints; swap write_elements for writeTo(...).createOrReplace()
on an Iceberg catalog and the stage gating for snapshot existence).
Per-partition lineage rides in the elements rows themselves
(doc_id, blob_no).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _stage_done(path: str) -> bool:
    return os.path.exists(os.path.join(path, "_SUCCESS"))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--documents")
    ap.add_argument("--media")
    ap.add_argument("--synth-nodes", type=int, default=0)
    ap.add_argument("--polygons", help="json: [[poly_id, [[lat_nano, lon_nano], ...]], ...]")
    ap.add_argument("--out", required=True)
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--res", type=int, default=16)
    args = ap.parse_args()

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from osmpbf_spark.functions.grid import with_grid_cells
    from osmpbf_spark.operators.pip import make_polygons, pip_join
    from osmpbf_spark.session import ensure_workers_can_import
    from osmpbf_spark.sources.documents import read_elements
    from osmpbf_spark.sources.store import read_store, write_elements

    spark = SparkSession.builder.appName("osmpbf-decode-pip").getOrCreate()
    ensure_workers_can_import(spark)
    spark.sparkContext.setLogLevel("WARN")
    metrics = {}

    el_path = os.path.join(args.out, "elements")
    if args.resume and _stage_done(el_path):
        metrics["decode"] = "skipped (checkpoint)"
    else:
        t0 = time.time()
        if args.synth_nodes:
            from osmpbf_spark.sources.synth import synth_documents
            docs, media, _ = synth_documents(spark, args.synth_nodes)
        else:
            docs = spark.read.parquet(args.documents)
            media = spark.read.parquet(args.media)
        elements = read_elements(docs, media)
        write_elements(elements, el_path, sort_partitions=64)
        metrics["decode_sec"] = round(time.time() - t0, 2)

    store = read_store(spark, el_path)
    metrics["elements"] = store.count()
    # per-partition lineage + skew metrics (north_rule: per-partition
    # lineage and decode/join metrics emitted per stage)
    part_stats = (store.groupBy(F.spark_partition_id().alias("pid"))
                  .agg(F.count("*").alias("rows"))
                  .agg(F.count("*").alias("partitions"),
                       F.min("rows").alias("min_rows"),
                       F.max("rows").alias("max_rows"))).collect()[0]
    metrics["partitions"] = part_stats["partitions"]
    metrics["partition_rows_min"] = part_stats["min_rows"]
    metrics["partition_rows_max"] = part_stats["max_rows"]
    metrics["blobs_by_type"] = {
        r["element_type"]: r["blobs"] for r in
        store.groupBy("element_type")
        .agg(F.countDistinct("blob_no").alias("blobs")).collect()}

    if args.polygons or args.synth_nodes:
        t0 = time.time()
        if args.polygons:
            with open(args.polygons) as f:
                rows = [(p, [tuple(v) for v in ring])
                        for p, ring in json.load(f)]
        else:
            B = 1_000_000_000
            rows = [("band", [(44 * B, 5 * B), (46 * B, 5 * B),
                              (46 * B, 15 * B), (44 * B, 15 * B),
                              (44 * B, 5 * B)])]
        polys = make_polygons(spark, rows)
        nodes = with_grid_cells(store.filter("element_type = 'node'"),
                                res=args.res)
        joined = pip_join(nodes, polys, res=args.res)
        pip_path = os.path.join(args.out, "pip")
        (joined.select("poly_id", "id", "lat_nano", "lon_nano",
                       "doc_id", "blob_no")
         .write.mode("overwrite").parquet(pip_path))
        metrics["pip_sec"] = round(time.time() - t0, 2)
        metrics["pip_matches"] = spark.read.parquet(pip_path).count()

    print(json.dumps(metrics))
    spark.stop()


if __name__ == "__main__":
    main()
