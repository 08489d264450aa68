"""End-to-end curation-job evidence at corpus scale.

The per-stage operators each have scale benches (decon_scale_bench,
lsh_store_bench, ivf_refresh_bench, cc_scale_bench); this one runs the
WHOLE `jobs/curate_training_data_job.py` — exact dedup → MinHash/LSH
near-dup + connected components → SemDeDup → language/quality/Gopher
gates → token accounting → IVF index build → sequence packing — over a
deterministic synthetic corpus with planted duplicate structure, and
reports wall clock + the job's own per-stage metrics line.

Corpus (all planted rates exact, derivable analytically):

- ``--docs`` documents of 60 words (10-word English stopword ratio so
  langid says "en" and the quality gates pass), built from pure column
  expressions of the row id — no RNG, no driver-side text;
- ids with ``id % 20 == 19`` reuse the previous id's text byte-for-byte
  (5% exact duplicates);
- ids with ``id % 25 == 24`` AND not already exact (the exact rule wins
  on the mod-100 overlap → 3% net) reuse the previous id's text with a
  DIFFERENT final word (near-dups: 55/61 shared 3-shingles ≈ Jaccard
  0.90);
- ``--vectors`` embeddings (64-dim, 32 centers + per-vector jitter wide
  enough that ordinary same-cluster cosine stays below the SemDeDup
  threshold, numpy PCG64 seed 7); ids with ``id % 10 == 9`` are a
  near-copy of the previous id's vector (10% planted semantic dups, in
  a residue class disjoint from the text-dup ids), vec_ids = the first
  document ids.

Usage: python tools/curation_scale_bench.py [--docs 1000000]
                                            [--vectors 250000]
Prints one JSON line; paste the row into BENCH_NEWOPS.md.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

STOPS = ["the", "and", "of", "to", "is", "in", "that", "it"]
VOCAB = ["mountain", "harbor", "window", "granite", "meadow", "copper",
         "lantern", "valley", "timber", "orchard", "stream", "border",
         "market", "anchor", "garden", "bridge", "signal", "hollow",
         "summit", "canyon", "prairie", "thicket", "quarry", "estuary",
         "plateau", "furnace", "harvest", "mineral", "outpost", "pasture",
         "ravine", "saddle", "terrace", "tundra", "upland", "vessel",
         "warren", "zephyr", "basin", "cliff"]


def build_documents(spark, n: int, path: str) -> None:
    from pyspark.sql import functions as F

    stops = ",".join(f"'{w}'" for w in STOPS)
    vocab = ",".join(f"'{w}'" for w in VOCAB)
    seed = ("CASE WHEN id % 20 = 19 THEN id - 1 "
            "WHEN id % 25 = 24 THEN id - 1 ELSE id END")
    # final word comes from the raw id for the near-dup class only —
    # the exact rule wins on the mod-100 overlap, same precedence as seed
    last_seed = (f"CASE WHEN id % 20 != 19 AND id % 25 = 24 "
                 f"THEN id ELSE {seed} END")
    word = (f"CASE WHEN j % 7 = 0 THEN "
            f"elt(1 + pmod(xxhash64({seed}, j), {len(STOPS)}), {stops}) "
            f"WHEN j = 59 THEN "
            f"elt(1 + pmod(xxhash64({last_seed}, j), {len(VOCAB)}), {vocab}) "
            f"ELSE elt(1 + pmod(xxhash64({seed}, j), {len(VOCAB)}), {vocab}) "
            f"END")
    text = f"concat_ws(' ', transform(sequence(0, 59), j -> {word}))"
    (spark.range(n)
     .select(F.col("id").alias("doc_id"),
             F.expr(text).alias("text"),
             F.lit("en").alias("lang"),
             F.lit("synthetic").alias("source"))
     .withColumn("n_chars", F.length("text").cast("long"))
     .repartition(64)
     .write.mode("overwrite").parquet(path))


def build_embeddings(n: int, path: str) -> None:
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.default_rng(7)
    centers = rng.normal(0.0, 10.0, size=(32, 64))
    cid = np.arange(n) % 32
    # jitter σ=4: E[cos] between same-cluster vectors ≈ |c|²/(|c|²+64σ²)
    # ≈ 0.86 — below the 0.95 gate, so only PLANTED copies dedup
    vecs = centers[cid] + rng.normal(0.0, 4.0, size=(n, 64))
    # residue 6: disjoint from the text-dup classes (ids ending 9 or 4),
    # so every planted semantic pair survives text dedup
    copies = np.arange(n) % 10 == 6
    vecs[copies] = vecs[np.arange(n)[copies] - 1] \
        + rng.normal(0.0, 0.01, size=(copies.sum(), 64))
    vecs = vecs.astype(np.float32)
    pq.write_table(pa.table({
        "vec_id": pa.array(np.arange(n), type=pa.int64()),
        "embedding": pa.FixedSizeListArray.from_arrays(
            pa.array(vecs.reshape(-1)), 64).cast(pa.list_(pa.float32())),
        "label": pa.array(cid.astype("int32")),
    }), path)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=1_000_000)
    ap.add_argument("--vectors", type=int, default=250_000)
    ap.add_argument("--keep-inputs", default="",
                    help="reuse/keep generated inputs under this dir")
    args = ap.parse_args()

    base = args.keep_inputs or tempfile.mkdtemp(prefix="curation_scale_")
    os.makedirs(base, exist_ok=True)
    docs_path = os.path.join(base, f"docs_{args.docs}")
    emb_path = os.path.join(base, f"emb_{args.vectors}.parquet")
    out = os.path.join(base, "out")
    shutil.rmtree(out, ignore_errors=True)

    gen_sec = 0.0
    if not os.path.exists(os.path.join(docs_path, "_SUCCESS")):
        from osmpbf_spark.session import get_spark
        spark = get_spark("curation-scale-gen", master="local[32]",
                          shuffle_partitions=32)
        spark.sparkContext.setLogLevel("ERROR")
        t0 = time.time()
        build_documents(spark, args.docs, docs_path)
        gen_sec = round(time.time() - t0, 1)
        spark.stop()
    if not os.path.exists(emb_path):
        build_embeddings(args.vectors, emb_path)

    # the job's documented delivery shape: spark-submit --py-files.
    # Run that for real — the job reads its session config from
    # spark-submit (a bare `python` launch gets the 1g default driver
    # heap, which OOMs the 1M-doc LSH pipeline in single-JVM local mode;
    # on a real cluster these are ordinary executor-memory settings).
    subprocess.run([sys.executable,
                    os.path.join(REPO, "tools", "make_pyfiles.py")],
                   check=True, capture_output=True)
    cmd = ["spark-submit", "--master", "local[32]",
           "--driver-memory", os.environ.get(
               "SPARK_GRAFT_DRIVER_MEM", "48g"),
           "--conf", "spark.sql.shuffle.partitions=32",
           "--conf", "spark.sql.adaptive.enabled=true",
           "--conf", "spark.ui.enabled=false",
           "--py-files", os.path.join(REPO, "dist", "osmpbf_spark.zip"),
           os.path.join(REPO, "jobs", "curate_training_data_job.py"),
           "--documents", docs_path, "--embeddings", emb_path,
           "--out", out,
           "--keep-langs", "en",
           # SemDeDup's pair join is quadratic WITHIN a cluster — the
           # recipe (and the paper) wants many small clusters. k=32 at
           # 250k vectors means ~7,800-vector clusters ≈ 10⁹ cosine
           # pairs; k=512 keeps clusters ~500 and the join linear-ish.
           "--semdedup-threshold", "0.95", "--semdedup-k", "512",
           "--semdedup-train-mod", "16",
           "--ivf-k", "32", "--ivf-sample-mod", "16",
           "--pack-budget", "4096"]
    t0 = time.time()
    proc = subprocess.run(cmd, capture_output=True, text=True)
    wall = round(time.time() - t0, 1)
    if proc.returncode != 0:
        sys.stderr.write(proc.stdout[-4000:] + proc.stderr[-4000:])
        raise SystemExit(proc.returncode)
    metrics = json.loads(
        [ln for ln in proc.stdout.splitlines()
         if ln.startswith("{")][-1])
    print(json.dumps({
        "metric": "curate_training_data_job end-to-end",
        "docs": args.docs,
        "vectors": args.vectors,
        "gen_sec": gen_sec,
        "wall_sec": wall,
        "docs_per_sec": round(args.docs / wall, 1),
        "job_metrics": metrics,
    }))
    if not args.keep_inputs:
        shutil.rmtree(base, ignore_errors=True)


if __name__ == "__main__":
    main()
