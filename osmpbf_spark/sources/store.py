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
from ..session import local_relation


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


def append_ivf_store(embeddings: DataFrame, centroids: DataFrame,
                     path: str, *, vec_col: str = "embedding",
                     id_col: str = "vec_id",
                     skip_existing: bool = False,
                     broadcast_new: bool = True) -> None:
    """Incremental ANN-index refresh: assign a NEW crawl's vectors to the
    store's FROZEN centroids and append them into their cid partitions —
    the existing corpus is never re-read or re-assigned (the embedding
    analogue of ``append_hash_store`` / ``append_lsh_store``). The
    centroids must be the store's own frozen constants; assigning against
    retrained ones would put old and new vectors in different coordinate
    spaces (rebuild instead — and watch :func:`ivf_store_stats` imbalance
    to decide when drift warrants that rebuild).

    ``skip_existing=True`` makes re-appending a crash-recovered batch
    idempotent: new ids are anti-joined against ONLY the cid partitions
    they assign to (plan-time partition pruning — never a full store
    scan; the id projection of those partitions is small enough for
    AQE's broadcast anti-join at sane batch sizes)."""
    from ..operators.knn import ivf_assign
    assign = ivf_assign(embeddings, centroids, 1,
                        vec_col=vec_col, id_col=id_col)
    rows = embeddings.join(assign.select(id_col, "cid"), id_col)
    _append_partitioned(rows, path, id_col, skip_existing, broadcast_new)


def _append_partitioned(rows: DataFrame, path: str, id_col: str,
                        skip_existing: bool,
                        broadcast_new: bool = True) -> None:
    """Append cid-assigned rows; with ``skip_existing``, persist the
    assignment so the probed-cid collect and the write share one
    computation, and drop already-stored ids via the hash-store probe
    shape: the pruned existing scan is SEMI-joined against the
    BROADCAST new-id set (existing rows never shuffle; a plain
    left-anti against the probed partitions would sort-merge their
    full contents once they outgrow the broadcast threshold), and the
    resulting hit set — bounded by the new crawl, not the store —
    rides a broadcast anti-join back onto the new rows."""
    if not skip_existing:
        rows.write.mode("append").partitionBy("cid").parquet(path)
        return
    rows = rows.persist()
    try:
        (_fresh_appendable(rows, path, id_col, broadcast_new)
         .write.mode("append").partitionBy("cid").parquet(path))
    finally:
        rows.unpersist()


def _fresh_appendable(rows: DataFrame, path: str, id_col: str,
                      broadcast_new: bool = True) -> DataFrame:
    """The skip_existing plan, exposed for PLANS.md: cid-pruned store
    scan → broadcast semi against the new ids → broadcast anti back
    onto the new rows. ``broadcast_new=False`` is the escape hatch for
    a crawl too large to broadcast (billions of ids): the probe becomes
    a shuffle semi/anti on the id — the pruned store partitions DO
    shuffle then, which is still the right trade once the crawl side
    outgrows executor memory."""
    spark = rows.sparkSession
    probed = [r["cid"] for r in
              rows.select("cid").distinct().collect()]
    new_ids = rows.select(id_col)
    if broadcast_new:
        new_ids = F.broadcast(new_ids)
    hits = (spark.read.parquet(path)
            .filter(F.col("cid").isin(probed))
            .select(id_col)
            .join(new_ids, id_col, "left_semi"))
    if broadcast_new:
        hits = F.broadcast(hits)
    return rows.join(hits, id_col, "left_anti")


def compact_ivf_store(spark: SparkSession, path: str, *,
                      rows_per_file: int = 1_000_000,
                      id_col: str = "vec_id") -> dict:
    """Store maintenance after many appends (the classic small-files
    problem: each `append_ivf_store` adds task-count files per touched
    cid partition, and probe cost grows with per-partition file opens).
    Rewrites the store so each cid partition holds
    ``ceil(cid_rows / rows_per_file)`` files — a deterministic
    ``xxhash64(id) % n_files`` salt splits oversized partitions, so
    repartitioning on (cid, salt) gives one write task per target file.
    Tmp directory + rename swap: a crash mid-compaction leaves the
    original store intact. Works for both the IVF (vectors) and IVF-PQ
    (codes) layouts. Returns {files_before, files_after, rows}."""
    import math
    import os
    import shutil

    def _count_files(p):
        return sum(1 for dirp, _, names in os.walk(p)
                   for n in names
                   if n.endswith(".parquet") and not n.startswith("_"))

    before = _count_files(path)
    store = spark.read.parquet(path)
    counts = {r["cid"]: r["count"] for r in
              store.groupBy("cid").count().collect()}
    rows = sum(counts.values())
    if rows == 0:       # nothing to rewrite (repartition(0) would throw)
        return {"files_before": before, "files_after": before, "rows": 0}
    nf = [(int(c), max(1, math.ceil(n / rows_per_file)))
          for c, n in counts.items()]
    n_out = sum(f for _, f in nf)
    nf_df = local_relation(spark, nf, "cid int, _nf int")
    salted = (store.join(F.broadcast(nf_df), "cid")
              .withColumn("_f", F.pmod(F.xxhash64(id_col), F.col("_nf"))))
    tmp = path.rstrip("/") + ".compact.tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    (salted.repartition(n_out, "cid", "_f").drop("_nf", "_f")
     .write.mode("overwrite").partitionBy("cid").parquet(tmp))
    old = path.rstrip("/") + ".compact.old"
    shutil.rmtree(old, ignore_errors=True)
    os.rename(path, old)
    os.rename(tmp, path)
    shutil.rmtree(old)
    return {"files_before": before, "files_after": _count_files(path),
            "rows": rows}


def append_ivfpq_store(embeddings: DataFrame, centroids: DataFrame,
                       codebooks: DataFrame, path: str, *,
                       vec_col: str = "embedding",
                       id_col: str = "vec_id",
                       skip_existing: bool = False,
                       broadcast_new: bool = True) -> None:
    """:func:`append_ivf_store` for the codes-only IVF-PQ layout: encode
    the new crawl with the store's frozen codebooks, assign with its
    frozen coarse centroids, append codes into the cid partitions."""
    from ..operators.knn import ivf_assign
    from ..operators.pq import pq_encode
    assign = ivf_assign(embeddings, centroids, 1,
                        vec_col=vec_col, id_col=id_col)
    codes = pq_encode(embeddings, codebooks,
                      vec_col=vec_col, id_col=id_col)
    rows = codes.join(assign.select(id_col, "cid"), id_col)
    _append_partitioned(rows, path, id_col, skip_existing, broadcast_new)


def ivf_store_stats(spark: SparkSession, path: str) -> dict:
    """Operational health of an IVF(-PQ) store after appends: rows per
    cid partition, total, and the imbalance ratio max/mean. The
    aggregate groups on the PARTITION column only, so the scan reads
    directory values + row counts, not vector data. A ratio drifting
    well past its build-time value means the frozen centroids no longer
    fit the corpus — hot partitions slow every probe that hashes into
    them — and it's time to retrain + rebuild."""
    rows = (spark.read.parquet(path).groupBy("cid").count()
            .orderBy("cid").collect())
    counts = {r["cid"]: r["count"] for r in rows}
    total = sum(counts.values())
    mean = total / len(counts) if counts else 0.0
    return {"partitions": len(counts), "rows": total,
            "per_cid": counts,
            "imbalance": round(max(counts.values()) / mean, 3)
            if counts else None}


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
        .withColumn("q_nrm", _norm("q_vec"))
        .join(q_assign.select(query_id_col, "cid"), query_id_col))
    # per-row norms hoisted above the probe join (bit-identical; one
    # HOF fold per candidate instead of three — see knn.cosine_topk)
    cand = (emb.select(F.col(id_col), F.col(vec_col).alias("e_vec"),
                       "cid")
            .withColumn("e_nrm", _norm("e_vec"))
            .join(q, "cid")
            .withColumn("cos_sim",
                        _dot("q_vec", "e_vec")
                        / (F.col("q_nrm") * F.col("e_nrm"))))
    win = Window.partitionBy(query_id_col).orderBy(
        F.desc("cos_sim"), F.col(id_col))
    return (cand.withColumn("rn", F.row_number().over(win))
            .filter(F.col("rn") <= k)
            .select(query_id_col, id_col, "cos_sim", "rn"))


def write_ivfpq_store(embeddings: DataFrame, centroids: DataFrame,
                      codebooks: DataFrame, path: str, *,
                      vec_col: str = "embedding",
                      id_col: str = "vec_id") -> None:
    """At-rest IVF-PQ layout (the production embedding-search shape —
    Jégou et al. TPAMI 2011 §V): rows are (vec_id, codes) partitioned
    by the vector's nearest COARSE centroid. The raw floats are not in
    the store at all — a probe reads ~m bytes per vector (codes) from
    only the probed cid partitions, vs 4·d bytes per vector from every
    partition for a flat scan. At 100 TB of raw embeddings that is the
    difference between a ~3 TB codes store and the full table.
    Centroids + codebooks are the frozen constants every
    :func:`read_ivfpq_topk` needs — persist them next to the store."""
    from ..operators.knn import ivf_assign
    from ..operators.pq import pq_encode
    assign = ivf_assign(embeddings, centroids, 1,
                        vec_col=vec_col, id_col=id_col)
    codes = pq_encode(embeddings, codebooks,
                      vec_col=vec_col, id_col=id_col)
    (codes.join(assign.select(id_col, "cid"), id_col)
     .write.mode("overwrite").partitionBy("cid").parquet(path))


def build_ivfpq_store(embeddings: DataFrame, k: int, m: int, ksub: int,
                      path: str, *, iters: int = 4,
                      vec_col: str = "embedding",
                      id_col: str = "vec_id"
                      ) -> tuple[DataFrame, DataFrame]:
    """Full offline IVF-PQ build: train the coarse quantizer and the m
    per-subspace codebooks (both with the deterministic Lloyd trainer),
    then write the cid-partitioned codes store. Returns (centroids,
    codebooks). 100 TB note: both trainers run on a hash-sample
    upstream; encode+write is the single full pass over the corpus."""
    from ..operators.knn import train_centroids
    from ..operators.pq import train_pq_codebooks
    cent = train_centroids(embeddings, k, iters=iters,
                           vec_col=vec_col, id_col=id_col)
    books = train_pq_codebooks(embeddings, m, ksub, iters=iters,
                               vec_col=vec_col, id_col=id_col)
    write_ivfpq_store(embeddings, cent, books, path,
                      vec_col=vec_col, id_col=id_col)
    return cent, books


def read_ivfpq_topk(spark: SparkSession, path: str, queries: DataFrame,
                    k: int, centroids: DataFrame, codebooks: DataFrame,
                    *, nprobe: int = 2, vec_col: str = "embedding",
                    id_col: str = "vec_id",
                    query_id_col: str = "query_id") -> DataFrame:
    """ANN over the at-rest IVF-PQ store → (query_id, vec_id, adist,
    rn): each query probes its ``nprobe`` nearest coarse centroids'
    partitions (plan-time partition pruning, same mechanics as
    :func:`read_ivf_topk`) and ranks candidates by ADC over the stored
    codes — the scan never touches raw vectors because the store holds
    none. Deterministic: coarse assignment and ADC distances are
    DECIMAL-routed with id tie-breaks. Plan shape: the codes scan joins
    two BROADCAST dimensions (query→bucket map, per-query distance
    table); the only shuffle is the (query_id, vec_id) partial-sum
    aggregate."""
    from ..operators.knn import ivf_assign
    from ..operators.pq import pq_distance_table
    from pyspark.sql import Window
    q_assign = ivf_assign(queries, centroids, nprobe,
                          vec_col=vec_col, id_col=query_id_col)
    probed = [r["cid"] for r in
              q_assign.select("cid").distinct().collect()]
    dtab = F.broadcast(
        pq_distance_table(queries, codebooks, vec_col=vec_col,
                          query_id_col=query_id_col)
        .withColumnRenamed("cid", "code"))
    qbuckets = F.broadcast(q_assign.select(query_id_col,
                                           F.col("cid").alias("_qcid")))
    codes = (spark.read.parquet(path)
             .filter(F.col("cid").isin(probed)))
    pairs = (codes.join(qbuckets, codes["cid"] == qbuckets["_qcid"])
             .select(query_id_col, id_col,
                     F.posexplode("codes").alias("sub", "code"))
             .join(dtab, [query_id_col, "sub", "code"])
             .groupBy(query_id_col, id_col)
             .agg(F.sum("pdist").alias("adist")))
    win = Window.partitionBy(query_id_col).orderBy("adist", F.col(id_col))
    return (pairs.withColumn("rn", F.row_number().over(win))
            .filter(F.col("rn") <= k)
            .select(query_id_col, id_col, "adist", "rn"))


# ---------------------------------------------------------------------------
# At-rest LSH signature store (VERDICT r4 #2): incremental corpus-refresh
# dedup. Real training pipelines dedup each NEW crawl against the existing
# corpus without recomputing the corpus's signatures; this is the MinHash
# analogue of the IVF layout above — signatures at rest, partitioned so a
# probe touches only the band buckets the new documents actually hash into.
# ---------------------------------------------------------------------------

LSH_STORE_DEFAULTS = {"k": 32, "bands": 8, "shingle_n": 3,
                      "n_subbuckets": 32}

_PROBE_CACHE: list = []        # persisted signature tables of recent probes
_PROBE_LOCK = __import__("threading").Lock()


def _persist_bounded(*dfs: DataFrame, cap: int = 8) -> None:
    """Persist ``dfs`` and evict the oldest persisted entries beyond
    ``cap`` — probe-local caching without unbounded storage growth
    across repeated :func:`lsh_store_pairs` calls (same shape as the
    pip cover cache)."""
    with _PROBE_LOCK:
        for df in dfs:
            df.persist()
            _PROBE_CACHE.append(df)
        while len(_PROBE_CACHE) > cap:
            try:
                _PROBE_CACHE.pop(0).unpersist()
            except Exception:
                # entry from a since-stopped SparkSession: its blocks
                # died with the session — dropping the reference is the
                # whole eviction (the pip cover cache's guard, which
                # this re-implementation originally dropped; review r5)
                pass


def _lsh_meta_path(path: str) -> str:
    import os
    return os.path.join(path, "_lsh_meta.json")


def write_lsh_store(docs: DataFrame, path: str, *, k: int = 32,
                    bands: int = 8, shingle_n: int = 3,
                    n_subbuckets: int = 32, text_col: str = "text",
                    id_col: str = "doc_id") -> None:
    """Write the at-rest MinHash-LSH signature store for ``docs``.

    Layout (mirrors the IVF store's partition-pruning mechanics):

    - ``<path>/bands/band=<b>/bvb=<m>/…`` — ONE row per signature-group
      REPRESENTATIVE per band: (grp_id, sigs, band_val), partitioned by
      band and by ``bvb = pmod(band_val, n_subbuckets)`` so a probe
      reads only the (band, sub-bucket) partitions its new documents
      hash into (plan-time PartitionFilters, never a full scan);
    - ``<path>/membership/…`` — (doc_id, grp_id) for every signed
      document, the expansion table (identical-signature groups are
      cliques; see operators/dedup._sig_groups);
    - ``<path>/_lsh_meta.json`` — the frozen signature parameters. A
      probe MUST use identical (k, bands, shingle_n) or its band values
      live in a different space; :func:`lsh_store_pairs` enforces this.

    100 TB notes: rows at rest are linear in DISTINCT signatures
    (template groups store one banding row) + one membership row per
    document; the signature pipeline runs once — the signature table
    is persisted across the two write actions via ``sig_cache`` (AQE
    exchange reuse only dedups within ONE action; review r5 caught the
    unpersisted form signing the corpus twice). Appending the next
    crawl is `mode("append")` on both tables
    (:func:`append_lsh_store`)."""
    import json
    import os

    from ..operators.dedup import _band_values, _sig_groups
    cache: list = []
    mem, reps = _sig_groups(docs, k=k, shingle_n=shingle_n,
                            text_col=text_col, id_col=id_col,
                            sig_cache=cache)
    try:
        bands_df = (_band_values(reps, k=k, bands=bands)
                    .withColumn("bvb",
                                F.pmod("band_val", F.lit(n_subbuckets))))
        # repartition on the partition columns first: without it every
        # task holding rows for a (band, bvb) bucket opens its own file
        # there — bands × n_subbuckets × tasks tiny files (measured
        # 8,192 at the defaults on local[32]; the probe then pays
        # per-file open cost). After: ~one file per bucket dir; at
        # 100 TB raise the partition count to target the usual
        # 100 MB–1 GB parquet files per bucket.
        (bands_df.select("grp_id", "sigs", "band", "band_val", "bvb")
         .repartition(bands * n_subbuckets, "band", "bvb")
         .write.mode("overwrite").partitionBy("band", "bvb")
         .parquet(os.path.join(path, "bands")))
        (mem.select(F.col(id_col).alias("doc_id"), "grp_id")
         .write.mode("overwrite").parquet(os.path.join(path, "membership")))
    finally:
        for df in cache:
            df.unpersist()
    with open(_lsh_meta_path(path), "w") as f:
        json.dump({"k": k, "bands": bands, "shingle_n": shingle_n,
                   "n_subbuckets": n_subbuckets, "id_col": id_col}, f)


def append_lsh_store(docs: DataFrame, path: str, *,
                     text_col: str = "text",
                     id_col: str = "doc_id") -> None:
    """Append a new crawl's signatures to an existing store (run AFTER
    dedup decided what to keep). Uses the store's frozen parameters.
    Note: groups are per-batch — a new document identical to an old one
    gets its own grp_id; they still pair through the band join (same
    band values, est 1.0), so dedup results are unaffected."""
    import json
    import os

    from ..operators.dedup import _band_values, _sig_groups
    with open(_lsh_meta_path(path)) as f:
        meta = json.load(f)
    cache: list = []
    mem, reps = _sig_groups(docs, k=meta["k"], shingle_n=meta["shingle_n"],
                            text_col=text_col, id_col=id_col,
                            sig_cache=cache)
    try:
        bands_df = (_band_values(reps, k=meta["k"], bands=meta["bands"])
                    .withColumn("bvb", F.pmod("band_val",
                                              F.lit(meta["n_subbuckets"]))))
        (bands_df.select("grp_id", "sigs", "band", "band_val", "bvb")
         .repartition(meta["bands"] * meta["n_subbuckets"], "band", "bvb")
         .write.mode("append").partitionBy("band", "bvb")
         .parquet(os.path.join(path, "bands")))
        (mem.select(F.col(id_col).alias("doc_id"), "grp_id")
         .write.mode("append").parquet(os.path.join(path, "membership")))
    finally:
        for df in cache:
            df.unpersist()


def _probe_combined(spark: SparkSession, new_docs: DataFrame,
                    path: str, *, text_col: str, id_col: str):
    """Shared probe prefix for :func:`lsh_store_pairs` and
    :func:`lsh_store_bucket_overflow`: sign the NEW crawl once
    (persisted, bounded registry), prune the store's band partitions to
    the crawl's (band, bvb) keys, and union both sides' banding rows →
    (both, new_mem, new_reps, k). ``both`` carries a ``side`` tag."""
    import functools
    import json
    import os

    from ..operators.dedup import _band_values, _sig_groups
    with open(_lsh_meta_path(path)) as f:
        meta = json.load(f)
    k, bands, shingle_n = meta["k"], meta["bands"], meta["shingle_n"]
    nsb = meta["n_subbuckets"]

    cache: list = []
    new_mem, new_reps = _sig_groups(new_docs, k=k, shingle_n=shingle_n,
                                    text_col=text_col, id_col=id_col,
                                    sig_cache=cache)
    # the new crawl is the SMALL side by design; its signature tables
    # (id + k longs per doc — ~2 orders smaller than the text) are
    # reused by the probe-key collect, the cross join, and the new×new
    # leg. Persisting caches the one signing pass; without it the
    # shingle→permute→min pipeline re-executes per consumer (measured
    # 2× end-to-end on the store bench). The bounded registry evicts
    # older probes' tables so repeated probes don't leak storage
    # (unpersist only drops the cache — an evicted plan recomputes).
    _persist_bounded(*cache, new_mem, new_reps)
    new_bands = (_band_values(new_reps, k=k, bands=bands)
                 .withColumn("bvb", F.pmod("band_val", F.lit(nsb))))
    probe_keys = [(r["band"], r["bvb"]) for r in
                  new_bands.select("band", "bvb").distinct().collect()]
    # OR-chain of (band = b AND bvb = m) conjunctions: unlike a
    # struct-isin (which Catalyst does NOT turn into partition
    # pruning), this lands in the scan's PartitionFilters. Bounded by
    # bands × n_subbuckets terms (256 at the defaults).
    probe_pred = functools.reduce(
        lambda acc, bm: acc | ((F.col("band") == bm[0])
                               & (F.col("bvb") == bm[1])),
        probe_keys, F.lit(False))
    store_bands = (spark.read.parquet(os.path.join(path, "bands"))
                   .filter(probe_pred))
    # partition pruning is coarse ((band, bvb) sub-buckets); only the
    # exact (band, band_val) buckets a NEW rep lands in can produce
    # pairs — a broadcast semi-join drops the rest of the probed
    # partitions BEFORE the cap window and bucket join ever see them
    # (new keys ≤ new_reps × bands rows, the small side by design)
    new_keys = F.broadcast(new_bands.select("band", "band_val").distinct())
    both = (store_bands.select("grp_id", "sigs", "band", "band_val")
            .join(new_keys, ["band", "band_val"], "left_semi")
            .withColumn("side", F.lit("old"))
            .unionByName(new_bands
                         .select("grp_id", "sigs", "band", "band_val")
                         .withColumn("side", F.lit("new"))))
    return both, new_mem, new_reps, k


def lsh_store_pairs(spark: SparkSession, new_docs: DataFrame, path: str,
                    *, threshold: float = 0.5,
                    max_bucket: int | None = 10_000,
                    text_col: str = "text",
                    id_col: str = "doc_id") -> DataFrame:
    """Near-dup pairs INVOLVING the new crawl, against the at-rest
    store: (doc_a, doc_b, est_jaccard) where at least one side is a new
    document — new×old via a partition-pruned probe of the store's band
    partitions, new×new from the same probe-side signatures. The union
    of this result with the stored corpus's own pairs equals
    ``minhash_lsh_pairs(old ∪ new)`` recomputed from scratch —
    INCLUDING under an engaged ``max_bucket`` (tested both ways) — at
    the cost of signing only the NEW documents.

    Probe mechanics: the new documents' distinct (band, bvb) keys — at
    most bands × n_subbuckets values, driver-side metadata — become a
    partition-pruning IN-filter on the bands table (PartitionFilters in
    the plan, pinned by tests/PLANS.md), then the equi-join on
    (band, band_val) and the row-local zip_with estimate proceed
    exactly as the in-memory band join.

    ``max_bucket`` caps buckets by their count of DISTINCT signatures
    over the COMBINED (store + new) population — exactly the
    representative count the full-union recompute caps on. Counting
    rows instead would diverge: per-batch grouping leaves a signature
    shared between an old and a new group as two rows here where the
    union recompute holds one representative (review r5 reproduced a
    missed pair). Overflowing buckets are EXCLUDED from pairing — run
    :func:`lsh_store_bucket_overflow` alongside and alert on non-empty
    (the same loud-audit contract as ``minhash_bucket_overflow``)."""
    import os

    both, new_mem, new_reps, k = _probe_combined(
        spark, new_docs, path, text_col=text_col, id_col=id_col)
    if max_bucket is not None:
        # DISTINCT-signature count per bucket WITHOUT extra shuffles:
        # sort each bucket partition by sigs, mark group starts with
        # lag, sum the marks over the bucket — both windows and the
        # band join below share ONE hashpartitioning(band, band_val)
        # exchange (the first draft's distinct+groupBy+semi-join cost
        # three full passes over the probed store and halved the
        # probe's win, measured 7.9 s → 14.9 s)
        from pyspark.sql import Window
        wsort = (Window.partitionBy("band", "band_val")
                 .orderBy("sigs", "side", "grp_id"))
        wb = Window.partitionBy("band", "band_val")
        prev = F.lag("sigs").over(wsort)
        both = (both
                .withColumn("_first", F.when(
                    prev.isNull() | (prev != F.col("sigs")), 1)
                    .otherwise(0))
                .withColumn("_bucket_n", F.sum("_first").over(wb))
                .filter(F.col("_bucket_n") <= max_bucket)
                .drop("_first", "_bucket_n"))
    olds = (both.filter(F.col("side") == "old")
            .select(F.col("grp_id").alias("gb"),
                    F.col("sigs").alias("sigs_b"), "band", "band_val"))
    news = (both.filter(F.col("side") == "new")
            .select(F.col("grp_id").alias("ga"),
                    F.col("sigs").alias("sigs_a"), "band", "band_val"))
    est = (F.expr("size(filter(zip_with(sigs_a, sigs_b, "
                  "(x, y) -> x = y), v -> v))")
           / F.lit(k)).alias("est_jaccard")
    # new×old: the probe; new×new: self-join of the (capped) new side —
    # the cap population is the same combined bucket either way
    cross_rp = (news.join(olds, ["band", "band_val"])
                .select("ga", "gb", est)
                .distinct()
                .filter(F.col("est_jaccard") >= threshold))
    nn = news.select(F.col("ga").alias("gb"),
                     F.col("sigs_a").alias("sigs_b"), "band", "band_val")
    newnew_rp = (news.join(nn, ["band", "band_val"])
                 .filter(F.col("ga") < F.col("gb"))
                 .select("ga", "gb", est)
                 .distinct()
                 .filter(F.col("est_jaccard") >= threshold))
    # diagonal: multi-member NEW groups are intra-crawl cliques with
    # est exactly 1.0; old groups' internal pairs are at rest. Added
    # AFTER the orientation swap — swapping (g, g) would duplicate it
    diag = new_reps.filter(F.col("grp_n") > 1).select(
        F.col("grp_id").alias("ga"), F.col("grp_id").alias("gb"),
        F.lit(1.0).alias("est_jaccard"))
    rp = cross_rp.unionByName(newnew_rp)
    old_mem = (spark.read.parquet(os.path.join(path, "membership"))
               .select(F.col("doc_id").alias(id_col), "grp_id"))
    all_mem = (new_mem.select(F.col(id_col), "grp_id")
               .unionByName(old_mem))
    # symmetric expansion over the combined membership (a group id is
    # an old OR new doc id — id spaces are disjoint); doc_a < doc_b
    # keeps one orientation per unordered pair, as in _expand_rep_pairs
    rp_sym = (rp.unionByName(rp.select(F.col("gb").alias("ga"),
                                       F.col("ga").alias("gb"),
                                       "est_jaccard"))
              .unionByName(diag))
    return (rp_sym
            .join(all_mem.select(F.col(id_col).alias("doc_a"),
                                 F.col("grp_id").alias("ga")), "ga")
            .join(all_mem.select(F.col(id_col).alias("doc_b"),
                                 F.col("grp_id").alias("gb")), "gb")
            .filter(F.col("doc_a") < F.col("doc_b"))
            .select("doc_a", "doc_b", "est_jaccard"))


def lsh_store_bucket_overflow(spark: SparkSession,
                              new_docs: DataFrame, path: str, *,
                              max_bucket: int = 10_000,
                              text_col: str = "text",
                              id_col: str = "doc_id") -> DataFrame:
    """Overflow audit for :func:`lsh_store_pairs` /
    :func:`dedup_against_store` (review r5: the probe capped silently
    with no at-rest counterpart of ``minhash_bucket_overflow``): the
    probed band buckets whose COMBINED (store + new) distinct-signature
    count exceeds ``max_bucket`` — i.e. the buckets the cap excluded
    from pairing — as (band, band_val, bucket_n). Run alongside any
    capped probe and alert on a non-empty result; near-dups of the new
    crawl inside these buckets were NOT detected."""
    both, _, _, _ = _probe_combined(spark, new_docs, path,
                                    text_col=text_col, id_col=id_col)
    return (both.select("band", "band_val", "sigs").distinct()
            .groupBy("band", "band_val")
            .agg(F.count("*").alias("bucket_n"))
            .filter(F.col("bucket_n") > max_bucket))


def compact_lsh_store(spark: SparkSession, path: str) -> dict:
    """Maintenance compaction for the LSH store (the Iceberg-compaction
    analogue): merge identical-signature groups ACROSS append batches.

    :func:`append_lsh_store` groups per batch, so a signature present
    in N crawls holds N banding rows and N group ids — results stay
    correct (identical signatures pair at est 1.0 through the band
    join) but the "rows linear in DISTINCT signatures" invariant decays
    and probed buckets carry duplicate representatives. Compaction
    re-groups: the merged group id is the MIN of the member group ids
    (each is its batch's min doc id, so the min over them is the global
    min member), membership remaps through the group-id map, and both
    tables rewrite in place with the same partitioned layout. Probe
    results are IDENTICAL before and after (tested); bucket
    populations shrink to true distinct-signature counts.

    Returns {"reps_before", "reps_after"} row counts (per-band rows /
    bands). 100 TB note: one shuffle on sigs over the REPRESENTATIVE
    table (orders of magnitude smaller than the corpus) + one
    broadcast-size remap join per table; run it on the cadence appends
    accumulate, like any table-maintenance job."""
    import json
    import os

    with open(_lsh_meta_path(path)) as f:
        meta = json.load(f)
    bands_path = os.path.join(path, "bands")
    mem_path = os.path.join(path, "membership")
    bands_df = spark.read.parquet(bands_path)
    reps = bands_df.select("grp_id", "sigs").distinct()
    n_before = reps.count()
    remap = (reps.groupBy("sigs")
             .agg(F.min("grp_id").alias("new_grp"),
                  F.collect_set("grp_id").alias("olds"))
             .select(F.explode("olds").alias("grp_id"), "new_grp"))
    new_bands = (bands_df.join(remap, "grp_id")
                 .filter(F.col("grp_id") == F.col("new_grp"))
                 .select("grp_id", "sigs", "band", "band_val", "bvb"))
    new_mem = (spark.read.parquet(mem_path)
               .join(remap, "grp_id")
               .select("doc_id", F.col("new_grp").alias("grp_id")))
    # rewrite through temp dirs: Spark cannot overwrite a table it is
    # reading in the same action
    tmp_b, tmp_m = bands_path + ".compact", mem_path + ".compact"
    (new_bands.repartition(meta["bands"] * meta["n_subbuckets"],
                           "band", "bvb")
     .write.mode("overwrite").partitionBy("band", "bvb").parquet(tmp_b))
    new_mem.write.mode("overwrite").parquet(tmp_m)
    n_after = (spark.read.parquet(tmp_b)
               .select("grp_id", "sigs").distinct().count())
    # swap via rename-to-.old (the compact_ivf_store pattern, review
    # r5): both live dirs move aside FIRST (metadata-only renames),
    # then both tmps move in, then the .olds are deleted — a crash
    # mid-swap leaves the .old copies on disk for manual recovery
    # instead of a silently inconsistent bands/membership pair
    # (production = one Iceberg snapshot commit across both tables)
    import shutil
    old_b, old_m = bands_path + ".compact.old", mem_path + ".compact.old"
    shutil.rmtree(old_b, ignore_errors=True)
    shutil.rmtree(old_m, ignore_errors=True)
    os.rename(bands_path, old_b)
    os.rename(mem_path, old_m)
    os.rename(tmp_b, bands_path)
    os.rename(tmp_m, mem_path)
    shutil.rmtree(old_b)
    shutil.rmtree(old_m)
    return {"reps_before": n_before, "reps_after": n_after}


def dedup_against_store(spark: SparkSession, new_docs: DataFrame,
                        path: str, *, threshold: float = 0.5,
                        max_bucket: int | None = 10_000,
                        text_col: str = "text",
                        id_col: str = "doc_id") -> DataFrame:
    """The corpus-refresh dedup step: new documents SURVIVING dedup
    against the stored corpus and each other. Stored documents always
    win (a new near-dup of an existing document is dropped); among
    new-only near-dup clusters the MIN doc id is kept. Payloads never
    shuffle — the new table anti-joins a small drop list, the same
    shape as dedup_documents. Follow with :func:`append_lsh_store` on
    the survivors to complete the refresh cycle."""
    pairs = lsh_store_pairs(spark, new_docs, path, threshold=threshold,
                            max_bucket=max_bucket, text_col=text_col,
                            id_col=id_col)
    new_ids = new_docs.select(F.col(id_col))
    # any new doc paired with an OLD doc is dropped outright
    a_new = pairs.join(new_ids.withColumnRenamed(id_col, "doc_a"), "doc_a",
                       "left_semi")
    b_new = pairs.join(new_ids.withColumnRenamed(id_col, "doc_b"), "doc_b",
                       "left_semi")
    vs_old = (a_new.join(new_ids.withColumnRenamed(id_col, "doc_b"),
                         "doc_b", "left_anti")
              .select(F.col("doc_a").alias(id_col))
              .unionByName(
                  b_new.join(new_ids.withColumnRenamed(id_col, "doc_a"),
                             "doc_a", "left_anti")
                  .select(F.col("doc_b").alias(id_col))))
    # new-only clusters: transitive closure over new×new pairs,
    # non-keepers dropped (identical semantics to dedup_documents)
    from ..operators.dedup import connected_components
    nn = (pairs
          .join(new_ids.withColumnRenamed(id_col, "doc_a"), "doc_a",
                "left_semi")
          .join(new_ids.withColumnRenamed(id_col, "doc_b"), "doc_b",
                "left_semi"))
    cc = connected_components(nn, "doc_a", "doc_b")
    non_keepers = (cc.filter(F.col("node") != F.col("label"))
                   .select(F.col("node").alias(id_col)))
    drop = vs_old.unionByName(non_keepers).distinct()
    return new_docs.join(drop, id_col, "left_anti")


# ---------------------------------------------------------------------------
# At-rest content-hash store: incremental EXACT dedup. The byte-identical
# counterpart of the LSH signature store above — real corpus refreshes run
# exact dedup of each new crawl against the existing corpus FIRST (it is
# ~free and removes the bulk), then near-dup dedup on what remains. The
# store holds one (content_hash, keeper) row per distinct document text,
# hash-bucketed so a probe prunes partitions; at 10^12 documents the table
# is ~24 bytes/distinct-doc — a per-mille of corpus bytes — and the corpus
# itself is never re-hashed or shuffled.
# ---------------------------------------------------------------------------


def _hash_meta_path(path: str) -> str:
    import os
    return os.path.join(path, "_hash_meta.json")


def _content_hashes(docs: DataFrame, *, text_col: str, id_col: str,
                    n_buckets: int) -> DataFrame:
    """(id_col, content_hash, hb): md5 of the text (the exact_dups key)
    plus the store's hash bucket — pmod(xxhash64) so bucket skew is
    uniform regardless of text distribution."""
    return docs.select(
        F.col(id_col),
        F.md5(F.col(text_col)).alias("content_hash")).withColumn(
        "hb", F.pmod(F.xxhash64("content_hash"), F.lit(n_buckets)))


def write_hash_store(docs: DataFrame, path: str, *, n_buckets: int = 256,
                     text_col: str = "text",
                     id_col: str = "doc_id") -> None:
    """Write the at-rest exact-dedup store for ``docs``: ONE row per
    DISTINCT text — (content_hash, keeper = MIN doc id), partitioned by
    ``hb = pmod(xxhash64(content_hash), n_buckets)``.

    Layout mirrors the LSH store: partition pruning serves probes that
    touch few buckets (spot lookups, small crawl shards); full-crawl
    probes scan every bucket but each holds only 24-byte hash rows, not
    documents. One shuffle (the hash groupBy), AQE-coalesced; the
    repartition before write keeps ~one file per bucket dir (same tiny-
    files lesson as write_lsh_store — at 100 TB raise the partition
    count to target 100 MB–1 GB files per bucket)."""
    import json

    import os
    h = _content_hashes(docs, text_col=text_col, id_col=id_col,
                        n_buckets=n_buckets)
    (h.groupBy("content_hash", "hb")
     .agg(F.min(id_col).alias("keeper"))
     .repartition(n_buckets, "hb")
     .write.mode("overwrite").partitionBy("hb")
     .parquet(os.path.join(path, "hashes")))
    with open(_hash_meta_path(path), "w") as f:
        json.dump({"n_buckets": n_buckets, "id_col": id_col}, f)


def append_hash_store(docs: DataFrame, path: str, *,
                      text_col: str = "text",
                      id_col: str = "doc_id") -> None:
    """Append a new batch's distinct hashes (run AFTER
    :func:`dedup_exact_against_store` decided what to keep, on the
    SURVIVORS — so cross-batch duplicate hashes cannot arise in normal
    operation; a hash appended twice anyway stays correct at probe time
    because the probe's semi-join only asks existence, and
    :func:`compact_hash_store` restores the one-row invariant)."""
    import json
    import os
    with open(_hash_meta_path(path)) as f:
        meta = json.load(f)
    h = _content_hashes(docs, text_col=text_col, id_col=id_col,
                        n_buckets=meta["n_buckets"])
    (h.groupBy("content_hash", "hb")
     .agg(F.min(id_col).alias("keeper"))
     .repartition(meta["n_buckets"], "hb")
     .write.mode("append").partitionBy("hb")
     .parquet(os.path.join(path, "hashes")))


def _hash_store_hits_from(spark: SparkSession, newh: DataFrame,
                          path: str, *, id_col: str) -> DataFrame:
    """Probe core over a precomputed ``_content_hashes`` table (callers
    that also need ``newh`` for other legs hash the crawl ONCE — review
    r5: the first draft re-derived it per consumer, md5-hashing the
    full crawl ~5×)."""
    import os
    probe_hb = [r["hb"] for r in newh.select("hb").distinct().collect()]
    store = (spark.read.parquet(os.path.join(path, "hashes"))
             .filter(F.col("hb").isin(probe_hb)))
    new_hashes = F.broadcast(newh.select("content_hash").distinct())
    matched = F.broadcast(
        store.join(new_hashes, "content_hash", "left_semi")
        .groupBy("content_hash").agg(F.min("keeper").alias("keeper")))
    return (newh.join(matched, "content_hash")
            .select(id_col, "content_hash", "keeper"))


def hash_store_hits(spark: SparkSession, new_docs: DataFrame, path: str,
                    *, text_col: str = "text",
                    id_col: str = "doc_id") -> DataFrame:
    """New documents whose text already exists in the stored corpus →
    (doc_id, content_hash, keeper = the stored winner). A document that
    IS its own stored keeper (its survivors were already appended)
    reports a hit with keeper == doc_id — consumers that mean "drop
    duplicates of OTHER documents" must exempt that case, as
    :func:`dedup_exact_against_store` does.

    Probe shape (the 100 TB story): the new crawl's distinct ``hb``
    values prune the store's partitions (a plain IN predicate on the
    single partition column lands in PartitionFilters — unlike the LSH
    store's composite (band, bvb) key, no OR-chain needed); the pruned
    scan then left-semi-joins a BROADCAST of the new crawl's distinct
    hashes, so the store is filtered to the (tiny) matched set without
    ever shuffling, and the matches broadcast back onto the new side.
    Document payloads appear in no join."""
    import json
    with open(_hash_meta_path(path)) as f:
        meta = json.load(f)
    newh = _content_hashes(new_docs, text_col=text_col, id_col=id_col,
                           n_buckets=meta["n_buckets"])
    return _hash_store_hits_from(spark, newh, path, id_col=id_col)


def dedup_exact_against_store(spark: SparkSession, new_docs: DataFrame,
                              path: str, *, text_col: str = "text",
                              id_col: str = "doc_id") -> DataFrame:
    """The corpus-refresh EXACT dedup step: new documents surviving
    byte-identical dedup against the stored corpus and each other.
    A stored document beats any OTHER new document with the same text
    (the at-rest corpus stays stable — unlike
    ``dedup_documents(old ∪ new, "exact")``, which re-elects the global
    MIN id and would evict an already-kept document whenever a new
    crawl's id sorts lower); among new-only duplicate groups the MIN
    doc id is kept. A document that is its own stored keeper is NOT a
    duplicate of itself: re-running a crawl whose survivors were
    already appended returns the same survivors (idempotent — this is
    what makes the curation job's crash-between-write-and-append
    recovery safe). The cost is hashing only the new crawl, once.
    Follow with :func:`append_hash_store` on the survivors to complete
    the refresh cycle."""
    import json

    from pyspark.sql import Window
    with open(_hash_meta_path(path)) as f:
        meta = json.load(f)
    newh = _content_hashes(new_docs, text_col=text_col, id_col=id_col,
                           n_buckets=meta["n_buckets"])
    _persist_bounded(newh)
    hits = _hash_store_hits_from(spark, newh, path, id_col=id_col)
    # keeper == own id ⇒ this document IS the stored copy, not a dup
    vs_old = (hits.filter(F.col("keeper") != F.col(id_col))
              .select(id_col))
    # new-only duplicate groups: min id per hash keeps itself
    intra = (newh.withColumn(
        "_keep", F.min(id_col).over(Window.partitionBy("content_hash")))
        .filter(F.col(id_col) != F.col("_keep"))
        .select(id_col))
    drop = vs_old.unionByName(intra).distinct()
    return new_docs.join(drop, id_col, "left_anti")


def compact_hash_store(spark: SparkSession, path: str) -> dict:
    """Maintenance compaction: restore the one-row-per-hash invariant
    after out-of-band appends (merged keeper = MIN, the global winner),
    rewriting in the same bucketed layout. Probe results are identical
    before and after up to the keeper choice, which compaction makes
    the global minimum. Returns {"rows_before", "rows_after"}."""
    import json
    import os
    import shutil
    with open(_hash_meta_path(path)) as f:
        meta = json.load(f)
    hp = os.path.join(path, "hashes")
    cur = spark.read.parquet(hp)
    n_before = cur.count()
    merged = (cur.groupBy("content_hash", "hb")
              .agg(F.min("keeper").alias("keeper"))
              .select("content_hash", "keeper", "hb"))
    tmp = hp + ".compact"
    (merged.repartition(meta["n_buckets"], "hb")
     .write.mode("overwrite").partitionBy("hb").parquet(tmp))
    n_after = spark.read.parquet(tmp).count()
    # rename-to-.old swap, not rmtree-then-rename: a crash between the
    # two would otherwise destroy the store (review r5)
    old = hp + ".compact.old"
    shutil.rmtree(old, ignore_errors=True)
    os.rename(hp, old)
    os.rename(tmp, hp)
    shutil.rmtree(old)
    return {"rows_before": n_before, "rows_after": n_after}


# -- tile store (vector-tile pyramid at rest) --------------------------------

def write_tile_store(tiles: DataFrame, path: str, *,
                     n_files: int | None = None) -> None:
    """Write a tile pyramid (``operators.tileclip.build_tile_pyramid``
    output: zoom, tx, ty, features) partitioned by zoom with files
    range-sorted on (tx, ty): a viewport request prunes to one zoom
    DIRECTORY (PartitionFilters) and then to the files whose parquet
    footer (tx, ty) min/max overlap the view (PushedFilters) — the same
    two-level zone-map recipe as :func:`write_elements`. The range
    repartition is NOT optional: the pyramid arrives hash-partitioned
    by its final groupBy, and hash-scattered tx values would span every
    file's footer range and defeat the pruning. At production scale
    this layout is an Iceberg table PARTITIONED BY (zoom) with a
    (tx, ty) sort order.

    ``n_files`` bounds the TOTAL range-partition count across the
    whole store (zoom levels split it proportionally to their row
    share; default = the session shuffle parallelism)."""
    if n_files is None:
        n_files = int(tiles.sparkSession.conf.get(
            "spark.sql.shuffle.partitions"))
    (tiles.repartitionByRange(n_files, "zoom", "tx", "ty")
        .sortWithinPartitions("zoom", "tx", "ty")
        .write.mode("overwrite")
        .partitionBy("zoom")
        .parquet(path))


def read_tile_store(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def tiles_in_view(store: DataFrame, *, zoom: int,
                  tx0: int, tx1: int, ty0: int, ty1: int) -> DataFrame:
    """The tile-server request shape: every stored tile of one zoom
    intersecting the [tx0, tx1]×[ty0, ty1] viewport — served by zoom
    partition pruning + (tx, ty) footer stats (audit with
    :func:`scan_is_pruned`; pinned in tests/test_store_plans.py)."""
    return store.filter(
        (F.col("zoom") == zoom)
        & F.col("tx").between(tx0, tx1)
        & F.col("ty").between(ty0, ty1))
