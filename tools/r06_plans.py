#!/usr/bin/env python
"""Dump .explain('formatted') for every bench.py headline query (and the
synthetic decode/PIP/knn workloads) into plans/r06/<name>_<tag>.txt.

Usage: python tools/r06_plans.py <tag> [name ...]
(tag is e.g. 'before' or 'after'; with no names, dumps all.)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from osmpbf_spark.session import get_spark  # noqa: E402


def main():
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    only = set(sys.argv[2:])
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("r06-plans", master=f"local[{cpus}]",
                      shuffle_partitions=max(cpus, 8))
    spark.sparkContext.setLogLevel("ERROR")
    out_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "plans", "r06")
    os.makedirs(out_dir, exist_ok=True)

    from pyspark.sql import functions as F

    from osmpbf_spark.queries import REGISTRY, q_region_rollup

    names = ["pricing_summary", "ways_and_deps_tpch", "topk_per_user",
             "region_rollup", "event_time_windows", "grid_cell_counts",
             "pip_diamond", "knn_events", "dedup_exact", "doc_profile",
             "minhash_lsh_pairs", "simhash_signatures", "knn_cosine"]
    retired = {"region_rollup": (q_region_rollup, None)}
    for name in names:
        if only and name not in only:
            continue
        fn, _ = REGISTRY.get(name) or retired[name]
        df = fn(spark, sf_dir)
        p = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted")
        with open(os.path.join(out_dir, f"{name}_{tag}.txt"), "w") as f:
            f.write(p)
        print(f"wrote {name}_{tag}.txt")

    # synthetic workloads (bench.py north-star shapes, small size for
    # plan capture only — the plan shape is size-independent)
    synth = {"osm_decode", "osm_decode_pip", "knn_join_100k"}
    if not only or (only & synth):
        from osmpbf_spark.functions.grid import (
            GRID_RES_FINE,
            with_grid_cells,
        )
        from osmpbf_spark.operators.knn import grid_knn
        from osmpbf_spark.operators.pip import pip_join
        from osmpbf_spark.sources.documents import read_elements
        from osmpbf_spark.sources.synth import (
            synth_documents,
            synth_query_points,
        )
        sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
        import bench as _b  # noqa: F401  (for _synth_polygons)
        from bench import _synth_polygons
        docs, media, _ = synth_documents(spark, 50_000, num_partitions=8,
                                         block_elements=4000)
        docs, media = docs.cache(), media.cache()
        docs.count(), media.count()

        def dump(name, df):
            if only and name not in only:
                return
            p = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted")
            with open(os.path.join(out_dir, f"{name}_{tag}.txt"),
                      "w") as f:
                f.write(p)
            print(f"wrote {name}_{tag}.txt")

        el = read_elements(docs, media, decode_partitions=8)
        dump("osm_decode", el)
        nodes = with_grid_cells(el.filter("element_type = 'node'"),
                                res=GRID_RES_FINE)
        dump("osm_decode_pip",
             pip_join(nodes, _synth_polygons(spark), res=GRID_RES_FINE))
        res_knn = 14
        knn_nodes = with_grid_cells(
            el.filter("element_type = 'node'")
            .select("id", "lat_nano", "lon_nano"), res=res_knn).persist()
        knn_nodes.count()
        qdf = synth_query_points(spark, 5_000, res=res_knn)
        dump("knn_join_100k",
             grid_knn(knn_nodes, qdf, 5, res=res_knn,
                      broadcast_candidates=False))
        knn_nodes.unpersist()
    spark.stop()


if __name__ == "__main__":
    main()
