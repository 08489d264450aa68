#!/usr/bin/env python
"""spark-submit entry: end-to-end TRAINING-DATA CURATION over the
interleaved documents table — the pipeline the engine's LLM-data tier
exists for, wired into one resumable job:

  1. exact dedup            (md5 groupBy, keep min doc_id)
  2. near-dup dedup         (MinHash→LSH→connected components→keeper)
  2b. decontamination       (drop docs sharing word n-grams with an
                             eval set, if --decontaminate-eval given)
  2c. semantic dedup        (SemDeDup: k-means clusters over the
                             embedding column, within-cluster cosine,
                             one keeper per group — if
                             --semdedup-threshold given)
  3. quality + language gate (stopword-marker langid, heuristic score,
                             Gopher signals, optional CCNet-style LM
                             perplexity vs --ppl-reference)
  4. token accounting       (whitespace + BPE-ish counts, per-doc)
  5. media features         (real codecs via mapInArrow, if media given)
  6. ANN index build        (k-means trainer → centroid-partitioned
                             IVF store over the embeddings table)

Cluster usage (north_rule delivery shape):

    python tools/make_pyfiles.py            # → dist/osmpbf_spark.zip
    spark-submit --py-files dist/osmpbf_spark.zip \\
        jobs/curate_training_data_job.py \\
        --documents s3://…/documents --embeddings s3://…/embeddings \\
        --media s3://…/media --out s3://…/curated --resume

Local smoke:

    python jobs/curate_training_data_job.py \\
        --documents /root/testdata/sf0.001/documents.parquet \\
        --embeddings /root/testdata/sf0.001/embeddings.parquet \\
        --out /tmp/curated

Every stage writes to its own _SUCCESS-gated path and is skipped on
--resume (parquet stand-in for Iceberg snapshot gating, same contract
as jobs/decode_pip_job.py); per-stage row counts and drop rates are
emitted as one JSON line. 100 TB notes embedded per stage: payloads
anti-join small drop lists (never shuffle), signatures are frozen
integer constants, the IVF build trains on a deterministic hash-sample
and writes the full table once.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _stage_done(path: str, params: dict | None = None) -> bool:
    """A stage is reusable on --resume iff its _SUCCESS marker exists
    AND its parameter sidecar matches the current invocation (ADVICE
    r4: _SUCCESS alone let a re-run with different gate thresholds
    silently return stale outputs from the old thresholds)."""
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        return False
    if params is None:
        return True
    try:
        with open(_params_sidecar(path)) as f:
            return json.load(f) == params
    except (OSError, ValueError):
        return False


def _params_sidecar(path: str) -> str:
    return path.rstrip("/") + ".params.json"


def _write_params(path: str, params: dict | None) -> None:
    if params is not None:
        with open(_params_sidecar(path), "w") as f:
            json.dump(params, f, sort_keys=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--documents", required=True)
    ap.add_argument("--embeddings")
    ap.add_argument("--media")
    ap.add_argument("--out", required=True)
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--min-quality", type=float, default=0.2)
    ap.add_argument("--min-word-len", type=float, default=3.0,
                    help="Gopher gate: drop docs with mean word length "
                         "outside [min, max]")
    ap.add_argument("--max-word-len", type=float, default=10.0)
    ap.add_argument("--max-symbol-ratio", type=float, default=0.1,
                    help="Gopher gate: max #/ellipsis symbols per word")
    ap.add_argument("--max-bullet-frac", type=float, default=0.9,
                    help="Gopher gate: max fraction of bullet-start lines")
    ap.add_argument("--max-ellipsis-frac", type=float, default=0.3,
                    help="Gopher gate: max fraction of ellipsis-end lines")
    ap.add_argument("--max-repetition", type=float, default=0.5,
                    help="drop docs whose repeated-bigram fraction "
                    "exceeds this (Gopher-style boilerplate gate)")
    ap.add_argument("--ppl-reference", default="",
                    help="parquet of trusted reference documents "
                    "(CCNet recipe: Wikipedia-like); a bigram LM is "
                    "trained on it and every doc scored — docs with "
                    "perplexity above --max-ppl are dropped")
    ap.add_argument("--max-ppl", type=float, default=None,
                    help="perplexity gate threshold (requires "
                    "--ppl-reference); docs without bigrams score "
                    "NULL and pass")
    ap.add_argument("--lm-min-count", type=int, default=2,
                    help="prune LM bigrams rarer than this so the "
                    "model broadcasts (scoring stays map-side)")
    ap.add_argument("--scrub-pii", action="store_true",
                    help="redact emails/IPs/phone shapes to typed "
                    "placeholders in the curated text (row-local "
                    "regex, Dolma-style); per-doc match counts land "
                    "in an n_pii column and the total in metrics")
    ap.add_argument("--keep-langs", default="",
                    help="comma-separated language codes; empty = all")
    ap.add_argument("--refresh-stores", default="",
                    help="directory holding the at-rest dedup stores "
                    "(hash/ + lsh/). First run bootstraps them from "
                    "this corpus; later runs treat --documents as a "
                    "NEW crawl — dedup it against the stores and "
                    "append the survivors, never re-hashing or "
                    "re-signing the existing corpus")
    ap.add_argument("--decontaminate-eval", default="",
                    help="parquet of eval-benchmark documents (doc_id, "
                    "text — or the interleaved spans schema); training "
                    "docs sharing word n-grams with it are dropped "
                    "after dedup (GPT-3 appendix-C recipe)")
    ap.add_argument("--decon-ngram", type=int, default=13,
                    help="n-gram size for --decontaminate-eval")
    ap.add_argument("--decon-min-hits", type=int, default=1,
                    help="distinct shared n-grams required to drop a "
                    "doc (>1 guards against incidental collisions)")
    ap.add_argument("--semdedup-threshold", type=float, default=None,
                    help="enable SemDeDup (semantic dedup over the "
                    "--embeddings column, Abbas et al. 2023): drop all "
                    "but one of each within-cluster group of docs with "
                    "pairwise cosine >= this (paper uses ~0.95+)")
    ap.add_argument("--semdedup-k", type=int, default=None,
                    help="SemDeDup cluster count; default auto-sizes "
                    "k ~ sqrt(n/2) from the survivor embedding count "
                    "(the measured cost optimum — too-small k is a "
                    "quadratic pair-join cliff, see operators/semdedup)")
    ap.add_argument("--semdedup-keep", default="min_id",
                    choices=["min_id", "far_from_centroid"],
                    help="keeper per duplicate group: deterministic "
                    "min id, or the paper's least-centroid-aligned")
    ap.add_argument("--semdedup-max-cluster", type=int, default=100_000,
                    help="degenerate-cluster cap: clusters larger than "
                    "this are excluded from pairing and reported as "
                    "semdedup_overflow_clusters")
    ap.add_argument("--semdedup-train-mod", type=int, default=1,
                    help="train centroids on a deterministic 1/m hash "
                    "sample of the embeddings (1 = train on all)")
    ap.add_argument("--lsh-max-bucket", type=int, default=10_000,
                    help="degenerate-LSH-bucket cap (representatives "
                    "per band bucket); overflowing buckets are skipped "
                    "and reported as lsh_overflow_buckets")
    ap.add_argument("--mix-langs", default="",
                    help="language mixture targets as lang:frac pairs "
                    "(e.g. 'en:0.7,de:0.3'); with --mix-budget, "
                    "deterministically sample the curated corpus so "
                    "each language contributes ≈ frac·budget tokens")
    ap.add_argument("--mix-budget", type=int, default=0,
                    help="total token budget for --mix-langs")
    ap.add_argument("--ivf-k", type=int, default=8)
    ap.add_argument("--pack-budget", type=int, default=0,
                    help="if set, pack curated docs into fixed token "
                    "windows of this size (pack-and-split) as the "
                    "final stage")
    ap.add_argument("--pack-strata", type=int, default=64)
    ap.add_argument("--ivf-sample-mod", type=int, default=1,
                    help="train centroids on hash_sample(id, m) — "
                    "m=1 trains on everything (small-scale default)")
    args = ap.parse_args()
    # fail fast on misconfiguration (review r5): half of a flag pair
    # would otherwise silently disable its gate mid-pipeline
    if bool(args.ppl_reference) != (args.max_ppl is not None):
        ap.error("--ppl-reference and --max-ppl must be given together")
    if args.mix_langs:
        for part in args.mix_langs.split(","):
            bits = part.split(":")
            try:
                if len(bits) != 2:
                    raise ValueError(part)
                float(bits[1])
            except ValueError:
                ap.error(f"--mix-langs entry {part!r} is not "
                         "lang:fraction")

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from osmpbf_spark.functions.sampling import hash_sample
    from osmpbf_spark.functions.text import (
        bpe_ish_token_count,
        bullet_line_frac,
        ellipsis_line_frac,
        langid,
        mean_word_length,
        pii_count,
        quality_score,
        repetition_ratio,
        scrub_pii,
        symbol_word_ratio,
        token_count,
    )
    from osmpbf_spark.operators.dedup import (
        dedup_documents,
        minhash_bucket_overflow,
    )
    from osmpbf_spark.session import ensure_workers_can_import

    spark = SparkSession.builder.appName("osmpbf-curate").getOrCreate()
    ensure_workers_can_import(spark)
    spark.sparkContext.setLogLevel("WARN")
    metrics: dict = {}

    # Stage-param CHAIN: every stage's sidecar embeds a digest of all
    # upstream stages' params, so changing ANY upstream knob on
    # --resume re-runs every stage downstream of it — not just the one
    # whose own flag changed (the mix→pack invalidation, generalized).
    import hashlib
    chain: list = [{"documents": args.documents}]

    def _chained(own: dict) -> dict:
        key = json.dumps(chain, sort_keys=True)
        return dict(own,
                    _upstream=hashlib.md5(key.encode()).hexdigest())

    def _flat_text(df):
        # the interleaved-documents schema carries text inside spans; a
        # flat text table (doc_id, text) passes through unchanged
        if "spans" in df.columns:
            df = (df.select("doc_id", F.expr(
                "concat_ws(' ', transform(filter(spans, "
                "s -> s.kind = 'text'), s -> s.text))").alias("text")))
        return df

    docs = _flat_text(spark.read.parquet(args.documents))
    metrics["input_docs"] = docs.count()

    # 1+2) dedup: exact first (cheap hash shuffle), then transitive
    # near-dup over the survivors — both anti-join a small drop list so
    # document payloads never shuffle
    dedup_path = os.path.join(args.out, "deduped")
    dedup_params = _chained({"lsh_max_bucket": args.lsh_max_bucket,
                             "refresh_stores": args.refresh_stores})
    overflow_sidecar = dedup_path.rstrip("/") + ".overflow.json"
    if not (args.resume and _stage_done(dedup_path, dedup_params)):
        t0 = time.time()
        if args.refresh_stores:
            # corpus-refresh mode: dedup THIS input against the at-rest
            # stores (hash = exact, lsh = near-dup), then append the
            # survivors — the existing corpus is never re-hashed or
            # re-signed. The param sidecar is written AFTER the appends:
            # a crash between the stage write and the appends leaves no
            # sidecar, so the stage re-runs whole. The re-run is safe
            # because the probes are idempotent for already-appended
            # survivors: a document that is its own stored hash keeper
            # is not a duplicate of itself, and LSH pair expansion
            # excludes self-pairs — so the same survivors come back,
            # re-appends are existence-idempotent (hash) or redundant
            # rows reclaimed by compact_lsh_store (lsh).
            from osmpbf_spark.sources.store import (
                append_hash_store,
                append_lsh_store,
                dedup_against_store,
                dedup_exact_against_store,
                lsh_store_bucket_overflow,
                write_hash_store,
                write_lsh_store,
            )
            hs = os.path.join(args.refresh_stores, "hash")
            ls = os.path.join(args.refresh_stores, "lsh")
            # BOTH metas must exist to run incrementally: a crash
            # between the two bootstrap writes leaves only hash/, and
            # treating that as incremental would probe a nonexistent
            # LSH store; re-bootstrapping overwrites the half-written
            # store cleanly (review r5)
            bootstrap = not (
                os.path.exists(os.path.join(hs, "_hash_meta.json"))
                and os.path.exists(os.path.join(ls, "_lsh_meta.json")))
            if bootstrap:
                exact = dedup_documents(docs, method="exact").persist()
                try:
                    near = dedup_documents(
                        exact, method="minhash",
                        max_bucket=args.lsh_max_bucket)
                    near.write.mode("overwrite").parquet(dedup_path)
                    metrics["lsh_overflow_buckets"] = \
                        minhash_bucket_overflow(
                            exact,
                            max_bucket=args.lsh_max_bucket).count()
                finally:
                    exact.unpersist()
                survivors = spark.read.parquet(dedup_path)
                write_hash_store(survivors, hs)
                write_lsh_store(survivors, ls)
                metrics["refresh_mode"] = "bootstrap"
            else:
                exact = dedup_exact_against_store(
                    spark, docs, hs).persist()
                try:
                    near = dedup_against_store(
                        spark, exact, ls,
                        max_bucket=args.lsh_max_bucket)
                    near.write.mode("overwrite").parquet(dedup_path)
                    metrics["lsh_overflow_buckets"] = \
                        lsh_store_bucket_overflow(
                            spark, exact, ls,
                            max_bucket=args.lsh_max_bucket).count()
                finally:
                    exact.unpersist()
                survivors = spark.read.parquet(dedup_path)
                append_hash_store(survivors, hs)
                append_lsh_store(survivors, ls)
                metrics["refresh_mode"] = "incremental"
        else:
            # exact survivors feed BOTH the near-dup pass and the
            # overflow audit — persist so the md5 groupBy + anti-join
            # run once (review r5: the unpersisted form paid exact
            # dedup three times and the signature pipeline twice)
            exact = dedup_documents(docs, method="exact").persist()
            try:
                near = dedup_documents(exact, method="minhash",
                                       max_bucket=args.lsh_max_bucket)
                near.write.mode("overwrite").parquet(dedup_path)
                # loud degenerate-bucket audit (VERDICT r4 #1): buckets
                # the cap excluded from pairing — non-zero means
                # near-identical templates blew past signature-group
                # compression and some near-dups may have survived
                metrics["lsh_overflow_buckets"] = \
                    minhash_bucket_overflow(
                        exact, max_bucket=args.lsh_max_bucket).count()
            finally:
                exact.unpersist()
        # persist the audit next to the stage so --resume re-emits it
        # (review r5: a resumed run silently omitted the one metric
        # that flags silently-skipped near-dups) — and write it BEFORE
        # the params sidecar, which is the stage's commit marker: a
        # crash in between re-runs the stage instead of resuming one
        # whose audit is lost (the mix-stage ordering rule)
        with open(overflow_sidecar, "w") as f:
            json.dump({"lsh_overflow_buckets":
                       metrics["lsh_overflow_buckets"]}, f)
        _write_params(dedup_path, dedup_params)
        metrics["dedup_sec"] = round(time.time() - t0, 2)
    else:
        try:
            with open(overflow_sidecar) as f:
                metrics["lsh_overflow_buckets"] = \
                    json.load(f)["lsh_overflow_buckets"]
        except (OSError, ValueError, KeyError):
            pass                 # pre-sidecar stage dir: metric unknown
    deduped = spark.read.parquet(dedup_path)
    metrics["after_dedup"] = deduped.count()
    chain.append({"dedup": dedup_params})

    # 2b) benchmark decontamination (GPT-3 appendix-C n-gram collision,
    # operators/decontaminate): the eval set's n-gram hashes are tiny →
    # broadcast; the corpus side is a row-local shingle projection
    # semi-joined map-side, and payloads anti-join the small
    # contaminated-id list — the dedup drop-list shape again.
    decon_own = None
    if args.decontaminate_eval:
        from osmpbf_spark.operators.decontaminate import decontaminate
        decon_path = os.path.join(args.out, "decontaminated")
        decon_own = {"eval": args.decontaminate_eval,
                     "n": args.decon_ngram,
                     "min_hits": args.decon_min_hits}
        decon_params = _chained(decon_own)
        if not (args.resume and _stage_done(decon_path, decon_params)):
            t0 = time.time()
            ev = _flat_text(spark.read.parquet(args.decontaminate_eval))
            (decontaminate(deduped, ev, n=args.decon_ngram,
                           min_hits=args.decon_min_hits)
             .write.mode("overwrite").parquet(decon_path))
            _write_params(decon_path, decon_params)
            metrics["decon_sec"] = round(time.time() - t0, 2)
        deduped = spark.read.parquet(decon_path)
        metrics["after_decontaminate"] = deduped.count()
    chain.append({"decontaminate": decon_own})

    # 2c) semantic dedup (SemDeDup, operators/semdedup): k-means
    # clusters over the embedding column, within-cluster cosine pairs,
    # one keeper per duplicate group. Centroids train on a
    # deterministic hash-sample (driver-side k·d collect only);
    # assignment is a broadcast map-side join; the drop list anti-joins
    # payloads like every other dedup stage.
    semdedup_own = None
    if args.embeddings and args.semdedup_threshold is not None:
        from osmpbf_spark.functions.sampling import hash_sample
        from osmpbf_spark.operators.knn import train_centroids
        from osmpbf_spark.operators.semdedup import (
            semdedup_cluster_overflow,
            semdedup_drop_ids,
        )
        sem_path = os.path.join(args.out, "semdeduped")
        semdedup_own = {"threshold": args.semdedup_threshold,
                        "k": args.semdedup_k,
                        "keep": args.semdedup_keep,
                        "max_cluster": args.semdedup_max_cluster,
                        "embeddings": args.embeddings}
        sem_params = _chained(semdedup_own)
        sem_sidecar = sem_path.rstrip("/") + ".overflow.json"
        if not (args.resume and _stage_done(sem_path, sem_params)):
            t0 = time.time()
            emb = spark.read.parquet(args.embeddings)
            # survivors only: embeddings of already-dropped docs must
            # not reintroduce their clusters' pair work. NOT a forced
            # broadcast — the survivor set is the BIG side of the
            # pipeline (unlike the drop lists every other stage
            # broadcasts); a key semi-join lets AQE pick (review r5)
            emb = emb.join(deduped.select(
                F.col("doc_id").alias("vec_id")), "vec_id", "left_semi")
            # auto-size k from the SURVIVOR count (one narrow count
            # job) — guessing low is a quadratic pair-join cliff, see
            # operators/semdedup.auto_k
            sem_k = args.semdedup_k
            sample = hash_sample(emb, "vec_id",
                                 args.semdedup_train_mod)
            if sem_k is None:
                from osmpbf_spark.operators.semdedup import auto_k
                sem_k = auto_k(emb.count())
                if args.semdedup_train_mod > 1:
                    # k seeds must exist in the TRAINING sample
                    sem_k = max(1, min(sem_k, sample.count()))
            cent = train_centroids(sample, sem_k)
            drop = (semdedup_drop_ids(
                        emb, cent, threshold=args.semdedup_threshold,
                        keep=args.semdedup_keep,
                        max_cluster=args.semdedup_max_cluster)
                    .withColumnRenamed("vec_id", "doc_id"))
            (deduped.join(F.broadcast(drop), "doc_id", "left_anti")
             .write.mode("overwrite").parquet(sem_path))
            over = semdedup_cluster_overflow(
                emb, cent,
                max_cluster=args.semdedup_max_cluster).count()
            with open(sem_sidecar, "w") as f:
                json.dump({"overflow_clusters": over, "k": sem_k}, f)
            _write_params(sem_path, sem_params)
            metrics["semdedup_sec"] = round(time.time() - t0, 2)
        try:
            with open(sem_sidecar) as f:
                _sem_side = json.load(f)
            metrics["semdedup_overflow_clusters"] = \
                _sem_side["overflow_clusters"]
            if "k" in _sem_side:
                metrics["semdedup_k"] = _sem_side["k"]
        except (OSError, ValueError, KeyError):
            pass
        deduped = spark.read.parquet(sem_path)
        metrics["after_semdedup"] = deduped.count()
    chain.append({"semdedup": semdedup_own})

    # 3+4) language/quality gate + token accounting — row-local Catalyst
    # built-ins (dual-rendered SQL), no Python in the hot path
    curated_path = os.path.join(args.out, "curated")
    gate_params = _chained({"min_quality": args.min_quality,
                   "max_repetition": args.max_repetition,
                   "keep_langs": args.keep_langs,
                   "min_word_len": args.min_word_len,
                   "max_word_len": args.max_word_len,
                   "max_symbol_ratio": args.max_symbol_ratio,
                   "max_bullet_frac": args.max_bullet_frac,
                   "max_ellipsis_frac": args.max_ellipsis_frac,
                   "ppl_reference": args.ppl_reference,
                   "max_ppl": args.max_ppl,
                   "lm_min_count": args.lm_min_count,
                   "scrub_pii": args.scrub_pii})
    if not (args.resume and _stage_done(curated_path, gate_params)):
        t0 = time.time()
        if args.scrub_pii:
            # count on the ORIGINAL text, then redact — every later
            # signal (tokens, quality, LM) sees what training will see
            deduped = (deduped
                       .withColumn("n_pii", pii_count("text"))
                       .withColumn("text", scrub_pii("text")))
        prof = (deduped
                .withColumn("lang", langid("text"))
                .withColumn("quality", quality_score("text"))
                .withColumn("rep_bigram", repetition_ratio("text"))
                .withColumn("n_tokens", token_count("text"))
                .withColumn("n_bpe_tokens", bpe_ish_token_count("text"))
                .withColumn("mean_word_len", mean_word_length("text"))
                .withColumn("symbol_ratio", symbol_word_ratio("text"))
                .withColumn("bullet_frac", bullet_line_frac("text"))
                .withColumn("ellipsis_frac", ellipsis_line_frac("text")))
        if args.ppl_reference and args.max_ppl is not None:
            # CCNet-style LM gate (operators/lm): bigram LM trained on
            # the trusted reference, pruned so it broadcasts — scoring
            # is map-side, the corpus never shuffles for its ppl
            from osmpbf_spark.operators.lm import (
                perplexity,
                prune_lm,
                train_bigram_lm,
            )
            ref = _flat_text(spark.read.parquet(args.ppl_reference))
            lm = prune_lm(train_bigram_lm(ref), args.lm_min_count)
            prof = prof.join(
                perplexity(prof.select("doc_id", "text"), lm)
                .select("doc_id", "ppl"), "doc_id", "left")
        else:
            prof = prof.withColumn(
                "ppl", F.lit(None).cast("double"))
        gated = prof.filter(
            (F.col("quality") >= args.min_quality)
            & (F.col("rep_bigram") <= args.max_repetition)
            & F.col("mean_word_len").between(args.min_word_len,
                                             args.max_word_len)
            & (F.col("symbol_ratio") <= args.max_symbol_ratio)
            & (F.col("bullet_frac") <= args.max_bullet_frac)
            & (F.col("ellipsis_frac") <= args.max_ellipsis_frac))
        if args.max_ppl is not None:
            # NULL ppl (no bigrams / no reference) passes — absence of
            # evidence is not a drop signal
            gated = gated.filter(F.col("ppl").isNull()
                                 | (F.col("ppl") <= args.max_ppl))
        if args.keep_langs:
            keep = [s.strip() for s in args.keep_langs.split(",") if s]
            gated = gated.filter(F.col("lang").isin(keep))
        gated.write.mode("overwrite").parquet(curated_path)
        _write_params(curated_path, gate_params)
        metrics["curate_sec"] = round(time.time() - t0, 2)
    curated = spark.read.parquet(curated_path)
    metrics["after_quality_gate"] = curated.count()
    chain.append({"gate": gate_params})
    metrics["total_tokens"] = curated.agg(
        F.sum("n_tokens")).collect()[0][0]
    if "n_pii" in curated.columns:
        metrics["pii_redactions"] = curated.agg(
            F.sum("n_pii")).collect()[0][0]

    # 4b) optional language mixing: deterministic weighted sampling so
    # each language lands ≈ frac·budget tokens (rates from ONE tiny
    # per-lang aggregate; the row filter is a hash threshold — payloads
    # never shuffle, and a smaller budget's sample nests in a larger's)
    mixed = curated
    if args.mix_langs and args.mix_budget:
        from osmpbf_spark.functions.sampling import mix_corpus
        targets = {k.strip(): float(v) for k, v in
                   (p.split(":") for p in args.mix_langs.split(","))}
        mix_path = os.path.join(args.out, "mixed")
        mix_params = _chained({"mix_langs": args.mix_langs,
                               "mix_budget": args.mix_budget})
        mix_sidecar = mix_path.rstrip("/") + ".report.json"
        if not (args.resume and _stage_done(mix_path, mix_params)):
            t0 = time.time()
            sampled, rep = mix_corpus(curated, "lang", "n_tokens",
                                      targets, args.mix_budget)
            sampled.write.mode("overwrite").parquet(mix_path)
            # report BEFORE params: the params sidecar is the stage's
            # commit marker, so a crash in between re-runs the stage
            # instead of leaving a resumable stage with no report
            # (review r5)
            with open(mix_sidecar, "w") as f:
                json.dump(rep, f)
            _write_params(mix_path, mix_params)
            metrics["mix_sec"] = round(time.time() - t0, 2)
        try:
            with open(mix_sidecar) as f:
                metrics["mix_report"] = json.load(f)
        except (OSError, ValueError):
            pass                  # pre-sidecar stage dir: report unknown
        mixed = spark.read.parquet(mix_path)
        metrics["after_mix"] = mixed.count()
        metrics["mix_tokens"] = mixed.agg(
            F.sum("n_tokens")).collect()[0][0]

    # 5) media features (real pure-numpy codecs through mapInArrow)
    if args.media:
        from osmpbf_spark.operators.multimodal import (
            extract_media_features,
            extract_media_metadata,
        )
        media_path = os.path.join(args.out, "media_features")
        if not (args.resume and _stage_done(media_path)):
            t0 = time.time()
            media = spark.read.parquet(args.media)
            meta = extract_media_metadata(media)
            feats = extract_media_features(media, dim=16)
            (meta.join(feats.select("media_ref", "feature", "n_frames"),
                       "media_ref")
             .write.mode("overwrite").parquet(media_path))
            metrics["media_sec"] = round(time.time() - t0, 2)
        metrics["media_rows"] = spark.read.parquet(media_path).count()

    # 6) ANN index: deterministic k-means over a hash-sample, then ONE
    # full pass writing the centroid-partitioned IVF store. In
    # corpus-refresh mode the index is DURABLE (lives next to the dedup
    # stores): the first run trains + builds it, later runs append the
    # new crawl's vectors under the frozen centroids — the existing
    # corpus is never re-read or re-assigned (append_ivf_store).
    if args.embeddings:
        from osmpbf_spark.operators.knn import train_centroids
        from osmpbf_spark.sources.store import (
            append_ivf_store,
            ivf_store_stats,
            write_ivf_store,
        )
        if args.refresh_stores:
            ivf_path = os.path.join(args.refresh_stores, "ivf")
            cent_path = os.path.join(args.refresh_stores, "centroids")
        else:
            ivf_path = os.path.join(args.out, "ivf")
            cent_path = os.path.join(args.out, "centroids")
        # embeddings path included: --resume with a different input must
        # rebuild, not reuse the stale index (review r5). Deliberately
        # NOT _chained: the index is built from the raw embeddings
        # table alone, so document-stage knobs never invalidate it.
        ivf_params = {"ivf_k": args.ivf_k,
                      "ivf_sample_mod": args.ivf_sample_mod,
                      "embeddings": args.embeddings}
        emb = spark.read.parquet(args.embeddings)
        # the durable-index append is idempotent (skip_existing), so no
        # per-run stage sidecar: a crash-recovered re-run re-appends
        # safely; the centroids parquet is the bootstrap commit marker
        if args.refresh_stores and os.path.isdir(cent_path):
            t0 = time.time()
            cent = spark.read.parquet(cent_path)
            append_ivf_store(emb, cent, ivf_path, skip_existing=True)
            metrics["ivf_mode"] = "append"
            metrics["ivf_sec"] = round(time.time() - t0, 2)
        elif not (args.resume and _stage_done(ivf_path, ivf_params)):
            t0 = time.time()
            sample = (hash_sample(emb, "vec_id", args.ivf_sample_mod)
                      if args.ivf_sample_mod > 1 else emb)
            cent = train_centroids(sample, args.ivf_k, iters=4)
            write_ivf_store(emb, cent, ivf_path)
            # centroids written AFTER the store: they are the refresh
            # mode's bootstrap marker, so a crash in between re-builds
            cent.write.mode("overwrite").parquet(cent_path)
            _write_params(ivf_path, ivf_params)
            metrics["ivf_mode"] = "build"
            metrics["ivf_sec"] = round(time.time() - t0, 2)
        if os.path.isdir(ivf_path):
            stats = ivf_store_stats(spark, ivf_path)
            metrics["ivf_partitions"] = stats["partitions"]
            metrics["ivf_rows"] = stats["rows"]
            metrics["ivf_imbalance"] = stats["imbalance"]
        else:
            metrics["ivf_partitions"] = None

    # 7) sequence packing: curated documents laid end-to-end and split
    # into fixed token windows — what actually feeds a training run.
    # Uses the gate stage's precomputed n_tokens (no re-tokenization).
    chain.append({"mix": [args.mix_langs, args.mix_budget]})

    if args.pack_budget:
        from osmpbf_spark.operators.packing import pack_sequences
        packed_path = os.path.join(args.out, "packed")
        # mix params included: a different mixture changes the packing
        # INPUT, so a resume under new mix settings must re-pack
        pack_params = _chained({"pack_budget": args.pack_budget,
                                "pack_strata": args.pack_strata,
                                "mix_langs": args.mix_langs,
                                "mix_budget": args.mix_budget})
        if not (args.resume and _stage_done(packed_path, pack_params)):
            t0 = time.time()
            (pack_sequences(mixed, args.pack_budget,
                            n_strata=args.pack_strata,
                            token_count_col="n_tokens")
             .write.mode("overwrite").parquet(packed_path))
            _write_params(packed_path, pack_params)
            metrics["pack_sec"] = round(time.time() - t0, 2)
        packed = spark.read.parquet(packed_path)
        metrics["packed_bins"] = (packed.select("stratum", "bin_no")
                                  .distinct().count())
        metrics["packed_slices"] = packed.count()

    print(json.dumps(metrics))
    spark.stop()


if __name__ == "__main__":
    main()
