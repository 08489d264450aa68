"""Element store: the engine's at-rest layout (SURVEY.md §7 step 3).

Writes the elements DataFrame partitioned by ``element_type`` and sorted
by ``id`` within files — which makes Parquet row-group min/max stats
reproduce the reference's lazily-built id zone maps
(/root/reference/src/indexed.rs:175-222) and its element-availability
pruning (src/indexed.rs:18-23,57-76) for free: an id-range or type filter
prunes partitions/row-groups at plan time, no data read. This matches the
format's own `Sort.Type_then_ID` contract (reference README.md:105-109).

At production scale the same layout is an Iceberg table
(``writeTo(...).partitionedBy("element_type").createOrReplace()``) with
snapshot-per-stage checkpoints (north_rule resumability); parquet is the
local stand-in — the pruning mechanics are identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_elements(elements: DataFrame, path: str, *,
                   sort_partitions: int | None = None) -> None:
    """Write partitioned by element_type, sorted by id within files.

    ``sort_partitions`` uses RANGE partitioning on (element_type, id) —
    NOT hash on element_type, which has only 3 distinct values and would
    collapse the write to one serial task per type (measured: a 33.8M-
    element store wrote ONE 1.3 GB node file). Range partitioning gives
    N writers AND makes every file a disjoint id range, so id-range
    scans prune whole FILES via parquet footer stats, not just
    row-groups — the true zone-map layout (src/indexed.rs:175-222)."""
    df = elements
    if sort_partitions:
        df = df.repartitionByRange(sort_partitions, "element_type", "id")
    (df.sortWithinPartitions("element_type", "id")
       .write.mode("overwrite")
       .partitionBy("element_type")
       .parquet(path))


def read_store(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def nodes_in_id_range(store: DataFrame, lo: int, hi: int) -> DataFrame:
    """id BETWEEN lo AND hi over the node partition — served by partition
    pruning (element_type) + row-group stats (id); the Spark rendering of
    IndexedReader's two-level pruning (src/indexed.rs:26-28,89-106)."""
    return store.filter(
        (F.col("element_type") == "node")
        & F.col("id").between(lo, hi))


def scan_is_pruned(df: DataFrame) -> dict:
    """Inspect the physical plan for pushdown evidence (PushedFilters /
    PartitionFilters) — used by tests and the plans audit."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    return {
        "pushed_filters": "PushedFilters: [" in plan
        and "PushedFilters: []" not in plan,
        "partition_filters": "PartitionFilters: [" in plan
        and "PartitionFilters: []" not in plan,
        "plan": plan,
    }


def write_ivf_store(embeddings: DataFrame, centroids: DataFrame,
                    path: str, *, vec_col: str = "embedding",
                    id_col: str = "vec_id") -> None:
    """At-rest IVF layout: the embedding table written partitioned by
    each vector's nearest centroid — the "built offline" layout
    ``operators/knn.ivf_topk`` names, made real. A query probing
    ``nprobe`` centroids then reads ONLY those cid partitions
    (plan-time partition pruning, same mechanics as the element
    store's type/id pruning above). Centroids must be the same frozen
    constants later passed to :func:`read_ivf_topk`."""
    from ..operators.knn import ivf_assign
    assign = ivf_assign(embeddings, centroids, 1,
                        vec_col=vec_col, id_col=id_col)
    (embeddings.join(assign.select(id_col, "cid"), id_col)
     .write.mode("overwrite").partitionBy("cid").parquet(path))


def build_ivf_store(embeddings: DataFrame, k: int, path: str, *,
                    iters: int = 4, vec_col: str = "embedding",
                    id_col: str = "vec_id") -> DataFrame:
    """The full offline IVF build a real pipeline runs (VERDICT r3 #4
    end-to-end): TRAIN ``k`` centroids with the deterministic
    distributed Lloyd trainer (``operators/knn.train_centroids``), then
    write the centroid-partitioned at-rest layout. Returns the trained
    centroids DataFrame — persist them next to the store (they are the
    frozen constants every :func:`read_ivf_topk` probe needs). 100 TB
    note: train on a hash-sample upstream
    (``embeddings.filter(pmod(hash(id), m) == 0)``); the WRITE stays
    full-scale and is the only pass over the whole table."""
    from ..operators.knn import train_centroids
    cent = train_centroids(embeddings, k, iters=iters,
                           vec_col=vec_col, id_col=id_col)
    write_ivf_store(embeddings, cent, path,
                    vec_col=vec_col, id_col=id_col)
    return cent


def read_ivf_topk(spark: SparkSession, path: str, queries: DataFrame,
                  k: int, centroids: DataFrame, *, nprobe: int = 2,
                  vec_col: str = "embedding", id_col: str = "vec_id",
                  query_id_col: str = "query_id") -> DataFrame:
    """IVF ANN over the at-rest store: identical results to
    ``ivf_topk`` on the same centroids, but the scan touches only the
    probed cid partitions. The probed-cid set (≤ queries×nprobe
    distinct values, bounded by the centroid count) is collected to
    the driver to become a partition-pruning predicate — the same
    tiny-metadata job class as the store's id-range pruning."""
    from ..operators.knn import _dot, _norm, ivf_assign
    from pyspark.sql import Window
    q_assign = ivf_assign(queries, centroids, nprobe,
                          vec_col=vec_col, id_col=query_id_col)
    probed = [r["cid"] for r in
              q_assign.select("cid").distinct().collect()]
    emb = (spark.read.parquet(path)
           .filter(F.col("cid").isin(probed)))
    q = F.broadcast(
        queries.select(F.col(query_id_col),
                       F.col(vec_col).alias("q_vec"))
        .join(q_assign.select(query_id_col, "cid"), query_id_col))
    cand = (emb.select(F.col(id_col), F.col(vec_col).alias("e_vec"),
                       "cid")
            .join(q, "cid")
            .withColumn("cos_sim",
                        _dot("q_vec", "e_vec")
                        / (_norm("q_vec") * _norm("e_vec"))))
    win = Window.partitionBy(query_id_col).orderBy(
        F.desc("cos_sim"), F.col(id_col))
    return (cand.withColumn("rn", F.row_number().over(win))
            .filter(F.col("rn") <= k)
            .select(query_id_col, id_col, "cos_sim", "rn"))
