"""Regenerate PLANS.md: formatted physical plans of the flagship
operators, with the scale-relevant properties called out. Run after any
operator change: python tools/dump_plans.py"""

from __future__ import annotations

import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def fmt(df, max_lines=60):
    s = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted")
    # drop the verbose per-node detail section after the tree
    tree = s.split("\n\n")[0]
    lines = tree.splitlines()[:max_lines]
    return "\n".join(lines)


def main():
    from pyspark.sql import functions as F

    from osmpbf_spark.functions.grid import GRID_RES_FINE, with_grid_cells
    from osmpbf_spark.operators.dedup import minhash_lsh_pairs
    from osmpbf_spark.operators.parity import tag_eq, ways_and_deps
    from osmpbf_spark.operators.pip import make_polygons, pip_join
    from osmpbf_spark.session import get_spark
    from osmpbf_spark.sources.documents import read_elements
    from osmpbf_spark.sources.synth import synth_documents

    spark = get_spark("dump-plans", master="local[4]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    docs, media, _ = synth_documents(spark, 5000, block_elements=1000)
    el = read_elements(docs, media)

    sections = []
    sections.append((
        "Decode scan (documents+media → elements)",
        "blob_type filter evaluated on pruned metadata BEFORE payloads; "
        "one MapInArrow (the only Python in the engine); derived coords "
        "as projections.",
        fmt(el)))

    ways_f, nodes = ways_and_deps(el, tag_eq("building", "yes"))
    sections.append((
        "ways_and_deps semi-join (reference J1)",
        "filtered refs explode → distinct → BroadcastExchange → "
        "LeftSemi BroadcastHashJoin — the big node side never shuffles.",
        fmt(nodes)))

    B = 1_000_000_000
    polys = make_polygons(spark, [
        ("band", [(44 * B, 5 * B), (46 * B, 5 * B), (46 * B, 15 * B),
                  (44 * B, 15 * B), (44 * B, 5 * B)])])
    pip = pip_join(with_grid_cells(el.filter("element_type = 'node'"),
                                   res=GRID_RES_FINE), polys,
                   res=GRID_RES_FINE)
    sections.append((
        "PIP join (cover prefilter + exact refine)",
        "two BroadcastHashJoins (cell cover, polygon rings); refine is a "
        "codegen'd Filter with DECIMAL(38) integer cross products; the "
        "point side never shuffles.",
        fmt(pip)))

    docs_t = spark.createDataFrame(
        [(i, "w%d the quick brown fox jumps over dog %d" % (i, i))
         for i in range(50)], "doc_id long, text string")
    mh = minhash_lsh_pairs(docs_t, k=16, bands=8)
    sections.append((
        "MinHash-LSH pairs",
        "narrow shingle/hash pipeline; map-side partial MIN before the "
        "one signature shuffle; bucket self-join carries signature "
        "arrays so the estimate needs no second join.",
        fmt(mh, max_lines=70)))

    from osmpbf_spark.operators.asof import asof_join
    from osmpbf_spark.operators.rangejoin import range_join
    lt = spark.createDataFrame(
        [(i, "k%d" % (i % 7), i * 13 % 997) for i in range(200)],
        "eid long, k string, ts long")
    rt = spark.createDataFrame(
        [("k%d" % (i % 7), i * 29 % 997, i) for i in range(60)],
        "k string, rts long, rid long")
    sections.append((
        "as-of join (point-in-time lookup)",
        "union-tag both sides; ONE Exchange (the window's partition-by-"
        "key sort) then last(_r, ignorenulls) carry-forward — no range "
        "join, no nested loop.",
        fmt(asof_join(lt, rt, on="k", left_ts="ts", right_ts="rts"))))
    vals = lt.select("eid", F.col("ts").alias("v"))
    ivs = rt.select("rid", F.col("rts").alias("lo"),
                    (F.col("rts") + 50).alias("hi"))
    sections.append((
        "bucketed interval range join",
        "interval side explodes to covered buckets; the containment "
        "join is an EQUI-join on the bucket key (BroadcastHashJoin "
        "here; sort-merge at scale) + exact refine — never "
        "BroadcastNestedLoopJoin.",
        fmt(range_join(vals, ivs, value_col="v", lo_col="lo",
                       hi_col="hi", bucket_width=50))))

    out = ["# PLANS — physical plans of the flagship operators",
           "",
           "Regenerate with `python tools/dump_plans.py`. These are the "
           "plans we iterated toward (SURVEY.md §4); tests in "
           "tests/test_store_plans.py pin the load-bearing properties "
           "(broadcasts, pushdown, zero row-at-a-time Python).", ""]
    for title, note, plan in sections:
        plan = re.sub(r"#\d+L?", "", plan)  # strip attr ids for stable diffs
        out += [f"## {title}", "", note, "", "```", plan, "```", ""]
    with open(os.path.join(REPO, "PLANS.md"), "w") as f:
        f.write("\n".join(out))
    print("wrote PLANS.md")
    spark.stop()


if __name__ == "__main__":
    main()
