"""spark-submit job smoke tests (the north_rule delivery shape)."""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_curate_training_data_job_end_to_end(tmp_path):
    # full pipeline: dedup → quality/lang gate → token accounting → IVF
    # build; then a --resume re-run must skip every stage (no *_sec
    # keys) and report identical counts
    out = str(tmp_path / "curated")
    cmd = [sys.executable, "jobs/curate_training_data_job.py",
           "--documents", "/root/testdata/sf0.001/documents.parquet",
           "--embeddings", "/root/testdata/sf0.001/embeddings.parquet",
           "--out", out]
    r1 = subprocess.run(cmd, cwd=REPO, capture_output=True, text=True,
                        timeout=600)
    assert r1.returncode == 0, r1.stderr[-2000:]
    m1 = json.loads(r1.stdout.strip().splitlines()[-1])
    # 476 = the dedup_keep_minhash oracle's keeper count at sf0.001
    assert m1["input_docs"] == 500 and m1["after_dedup"] == 476
    assert m1["total_tokens"] > 0 and m1["ivf_partitions"] == 8
    assert "dedup_sec" in m1 and "ivf_sec" in m1
    r2 = subprocess.run(cmd + ["--resume"], cwd=REPO,
                        capture_output=True, text=True, timeout=600)
    assert r2.returncode == 0, r2.stderr[-2000:]
    m2 = json.loads(r2.stdout.strip().splitlines()[-1])
    assert "dedup_sec" not in m2 and "ivf_sec" not in m2   # all skipped
    assert m2["after_dedup"] == 476
    assert m2["after_quality_gate"] == m1["after_quality_gate"]


def test_curate_job_accepts_interleaved_spans_schema(spark, tmp_path):
    # the north_rule input_hint shape: (doc_id, spans array<struct<
    # kind,text,media_ref,offset>>) — the job flattens text spans per
    # doc before curating
    from pyspark.sql import Row
    rows = [
        Row(doc_id="d1", spans=[
            Row(kind="text", text="the quick brown fox jumps over the "
                "lazy dog and keeps on running", media_ref=None, offset=0),
            Row(kind="image", text=None, media_ref="m://x", offset=1),
            Row(kind="text", text="a second sentence with more of the "
                "usual english words in it", media_ref=None, offset=2)]),
        Row(doc_id="d2", spans=[
            Row(kind="text", text="the quick brown fox jumps over the "
                "lazy dog and keeps on running", media_ref=None, offset=0),
            Row(kind="image", text=None, media_ref="m://y", offset=1),
            Row(kind="text", text="a second sentence with more of the "
                "usual english words in it", media_ref=None, offset=2)]),
        Row(doc_id="d3", spans=[
            Row(kind="text", text="something else entirely written here "
                "that is unlike the other documents in this set and long "
                "enough to pass the quality gate with normal words",
                media_ref=None, offset=0)]),
    ]
    src = str(tmp_path / "docs")
    spark.createDataFrame(
        rows, "doc_id string, spans array<struct<kind string, "
        "text string, media_ref string, offset int>>") \
        .write.parquet(src)
    out = str(tmp_path / "out")
    r = subprocess.run(
        [sys.executable, "jobs/curate_training_data_job.py",
         "--documents", src, "--out", out],
        cwd=REPO, capture_output=True, text=True, timeout=600)
    assert r.returncode == 0, r.stderr[-2000:]
    m = json.loads(r.stdout.strip().splitlines()[-1])
    # d1/d2 flatten to IDENTICAL text (media spans ignored) → exact
    # dedup keeps one; d3 survives
    assert m["input_docs"] == 3 and m["after_dedup"] == 2


def test_stage_params_sidecar(tmp_path):
    """ADVICE r4: --resume must NOT reuse a stage written under
    different gate parameters — _stage_done matches the sidecar."""
    sys.path.insert(0, os.path.join(REPO, "jobs"))
    from curate_training_data_job import (
        _stage_done,
        _write_params,
    )
    stage = tmp_path / "curated"
    stage.mkdir()
    (stage / "_SUCCESS").touch()
    params = {"min_quality": 0.2, "keep_langs": ""}
    # no sidecar yet: parameterless check passes, parameterized fails
    assert _stage_done(str(stage))
    assert not _stage_done(str(stage), params)
    _write_params(str(stage), params)
    assert _stage_done(str(stage), params)
    # changed threshold → stale, must re-run
    assert not _stage_done(str(stage), {**params, "min_quality": 0.5})
    # corrupt sidecar → treated as stale, not an exception
    (stage / "..").joinpath("curated.params.json").write_text("{oops")
    assert not _stage_done(str(stage), params)


def test_curate_job_refresh_stores_cycle(spark, tmp_path):
    """--refresh-stores: first run bootstraps the at-rest hash + LSH
    stores from the corpus; the second run treats its input as a NEW
    crawl — exact/near dups of the STORED corpus are dropped without
    re-signing it, survivors are appended."""
    base = ("the quick brown fox jumps over the lazy dog in the %s "
            "while the sun is shining bright over the green hills")
    crawl1 = [("c1%02d" % i, t) for i, t in enumerate([
        base % "park", base % "park",              # exact dup pair
        base % "yard",                             # near-dup of park
        "completely different text about deep sea fish and light",
    ])]
    crawl2 = [("c2%02d" % i, t) for i, t in enumerate([
        base % "park",                             # exact dup of stored
        base % "yard",                             # near-dup of stored
        "fresh second crawl text about mountain goats and cold wind",
        "fresh second crawl text about mountain goats and cold wind",
    ])]
    stores = str(tmp_path / "stores")
    d1, d2 = str(tmp_path / "d1"), str(tmp_path / "d2")
    spark.createDataFrame(crawl1, "doc_id string, text string") \
        .write.parquet(d1)
    spark.createDataFrame(crawl2, "doc_id string, text string") \
        .write.parquet(d2)
    # per-crawl embedding batches: the durable ANN index under
    # refresh-stores must build on crawl 1, then APPEND later crawls
    # under the frozen centroids
    def emb_table(path, ids):
        spark.createDataFrame(
            [(i, [float(i % 3), float(i % 5), 1.0, float(i) / 10])
             for i in ids],
            "vec_id bigint, embedding array<double>").write.parquet(path)
    e1, e2 = str(tmp_path / "e1"), str(tmp_path / "e2")
    emb_table(e1, range(4))
    emb_table(e2, range(4, 10))

    def run(docs, out, emb=None):
        cmd = [sys.executable, "jobs/curate_training_data_job.py",
               "--documents", docs, "--out", out,
               "--refresh-stores", stores, "--ivf-k", "2"]
        if emb:
            cmd += ["--embeddings", emb]
        r = subprocess.run(cmd, cwd=REPO, capture_output=True,
                           text=True, timeout=600)
        assert r.returncode == 0, r.stderr[-2000:]
        return json.loads(r.stdout.strip().splitlines()[-1])

    m1 = run(d1, str(tmp_path / "out1"), emb=e1)
    assert m1["refresh_mode"] == "bootstrap"
    assert m1["ivf_mode"] == "build" and m1["ivf_rows"] == 4
    # exact dup c101 dropped, near-dup c102 clustered with c100 →
    # keepers c100 + c103
    assert m1["after_dedup"] == 2
    m2 = run(d2, str(tmp_path / "out2"), emb=e2)
    assert m2["refresh_mode"] == "incremental"
    assert m2["ivf_mode"] == "append" and m2["ivf_rows"] == 10
    # c200 exact-dups stored c100; c201 near-dups it; c203 exact-dups
    # c202 within the crawl → only c202 survives
    assert m2["after_dedup"] == 1
    kept = spark.read.parquet(str(tmp_path / "out2" / "deduped"))
    assert [r["doc_id"] for r in kept.collect()] == ["c202"]
    # survivors were appended: a third crawl repeating c202 drops it;
    # re-submitting crawl 2's embeddings must append NOTHING
    # (skip_existing idempotence — the crash-recovery guarantee)
    d3, out3 = str(tmp_path / "d3"), str(tmp_path / "out3")
    spark.createDataFrame(
        [("c300", "fresh second crawl text about mountain goats and "
          "cold wind")], "doc_id string, text string").write.parquet(d3)
    m3 = run(d3, out3, emb=e2)
    assert m3["after_dedup"] == 0
    assert m3["ivf_mode"] == "append" and m3["ivf_rows"] == 10


def test_curate_job_mix_stage_and_resume_invalidation(tmp_path):
    """--mix-langs/--mix-budget: the mixture stage samples per-language
    token shares and reports shortfalls; changing the budget on --resume
    must re-run BOTH the mix stage and the packing stage that consumes
    its output (stale-input invalidation via the param sidecars)."""
    out = str(tmp_path / "curated")
    cmd = [sys.executable, "jobs/curate_training_data_job.py",
           "--documents", "/root/testdata/sf0.001/documents.parquet",
           "--out", out, "--mix-langs", "en:0.6", "--pack-budget", "512"]
    r1 = subprocess.run(cmd + ["--mix-budget", "20000"], cwd=REPO,
                        capture_output=True, text=True, timeout=600)
    assert r1.returncode == 0, r1.stderr[-2000:]
    m1 = json.loads(r1.stdout.strip().splitlines()[-1])
    assert m1["mix_report"]["en"]["shortfall"] == 0
    assert 0 < m1["after_mix"] < m1["after_quality_gate"]
    # want 12000 of 22719 available en tokens; document-level sampling
    # lands within ~15%
    assert abs(m1["mix_tokens"] - 12000) / 12000 < 0.15
    r2 = subprocess.run(cmd + ["--mix-budget", "10000", "--resume"],
                        cwd=REPO, capture_output=True, text=True,
                        timeout=600)
    assert r2.returncode == 0, r2.stderr[-2000:]
    m2 = json.loads(r2.stdout.strip().splitlines()[-1])
    assert "dedup_sec" not in m2                   # untouched stage skipped
    assert "mix_sec" in m2 and "pack_sec" in m2    # both re-ran
    # monotone sampling: the smaller budget's docs nest in the larger's
    assert m2["after_mix"] < m1["after_mix"]


def test_curate_job_decontamination_stage(tmp_path):
    """--decontaminate-eval: docs sharing word n-grams with the eval
    parquet are dropped after dedup; changing the n-gram size on
    --resume re-runs the decon stage AND the downstream gate (upstream
    param chain), while the untouched dedup stage stays skipped."""
    out = str(tmp_path / "curated")
    ev = str(tmp_path / "eval")
    # eval set = a slice of the corpus itself → guaranteed collisions
    import duckdb
    duckdb.sql(
        "COPY (SELECT * FROM '/root/testdata/sf0.001/documents.parquet' "
        f"WHERE doc_id % 37 = 0) TO '{ev}' (FORMAT PARQUET)")
    cmd = [sys.executable, "jobs/curate_training_data_job.py",
           "--documents", "/root/testdata/sf0.001/documents.parquet",
           "--out", out, "--decontaminate-eval", ev]
    r1 = subprocess.run(cmd + ["--decon-ngram", "8"], cwd=REPO,
                        capture_output=True, text=True, timeout=600)
    assert r1.returncode == 0, r1.stderr[-2000:]
    m1 = json.loads(r1.stdout.strip().splitlines()[-1])
    assert "decon_sec" in m1
    assert 0 < m1["after_decontaminate"] < m1["after_dedup"]
    assert m1["after_quality_gate"] <= m1["after_decontaminate"]

    # resume with identical params: everything skipped
    r2 = subprocess.run(cmd + ["--decon-ngram", "8", "--resume"],
                        cwd=REPO, capture_output=True, text=True,
                        timeout=600)
    m2 = json.loads(r2.stdout.strip().splitlines()[-1])
    assert r2.returncode == 0, r2.stderr[-2000:]
    assert "decon_sec" not in m2 and "curate_sec" not in m2
    assert m2["after_decontaminate"] == m1["after_decontaminate"]

    # resume with a LOOSER n-gram (smaller n → more collisions): decon
    # re-runs, and the gate re-runs too because its input changed —
    # even though no gate flag changed (chained invalidation)
    r3 = subprocess.run(cmd + ["--decon-ngram", "5", "--resume"],
                        cwd=REPO, capture_output=True, text=True,
                        timeout=600)
    m3 = json.loads(r3.stdout.strip().splitlines()[-1])
    assert r3.returncode == 0, r3.stderr[-2000:]
    assert "dedup_sec" not in m3                    # untouched upstream
    assert "decon_sec" in m3 and "curate_sec" in m3
    assert m3["after_decontaminate"] <= m1["after_decontaminate"]


def test_curate_job_semdedup_stage(tmp_path):
    """--semdedup-threshold: SemDeDup drops within-cluster cosine
    duplicates after dedup; identical-param resume skips the stage; a
    tighter threshold on --resume re-runs semdedup and the downstream
    gate while the untouched dedup stage stays skipped."""
    out = str(tmp_path / "curated")
    cmd = [sys.executable, "jobs/curate_training_data_job.py",
           "--documents", "/root/testdata/sf0.001/documents.parquet",
           "--embeddings", "/root/testdata/sf0.001/embeddings.parquet",
           "--out", out, "--semdedup-k", "4"]
    r1 = subprocess.run(cmd + ["--semdedup-threshold", "0.3"],
                        cwd=REPO, capture_output=True, text=True,
                        timeout=900)
    assert r1.returncode == 0, r1.stderr[-2000:]
    m1 = json.loads(r1.stdout.strip().splitlines()[-1])
    assert "semdedup_sec" in m1
    assert m1["semdedup_overflow_clusters"] == 0
    assert 0 < m1["after_semdedup"] < m1["after_dedup"]

    r2 = subprocess.run(cmd + ["--semdedup-threshold", "0.3",
                               "--resume"],
                        cwd=REPO, capture_output=True, text=True,
                        timeout=900)
    assert r2.returncode == 0, r2.stderr[-2000:]
    m2 = json.loads(r2.stdout.strip().splitlines()[-1])
    assert "semdedup_sec" not in m2 and "curate_sec" not in m2
    assert m2["after_semdedup"] == m1["after_semdedup"]

    # LOOSER threshold drops more; dedup stays skipped, gate re-runs
    r3 = subprocess.run(cmd + ["--semdedup-threshold", "0.25",
                               "--resume"],
                        cwd=REPO, capture_output=True, text=True,
                        timeout=900)
    assert r3.returncode == 0, r3.stderr[-2000:]
    m3 = json.loads(r3.stdout.strip().splitlines()[-1])
    assert "dedup_sec" not in m3
    assert "semdedup_sec" in m3 and "curate_sec" in m3
    assert m3["after_semdedup"] <= m1["after_semdedup"]

    # no --semdedup-k: k auto-sizes to auto_k(survivors) — clamps to
    # k_min=16 at this scale — and the chosen k lands in the metrics
    out_auto = str(tmp_path / "curated_auto")
    r4 = subprocess.run(
        [sys.executable, "jobs/curate_training_data_job.py",
         "--documents", "/root/testdata/sf0.001/documents.parquet",
         "--embeddings", "/root/testdata/sf0.001/embeddings.parquet",
         "--out", out_auto, "--semdedup-threshold", "0.3"],
        cwd=REPO, capture_output=True, text=True, timeout=900)
    assert r4.returncode == 0, r4.stderr[-2000:]
    m4 = json.loads(r4.stdout.strip().splitlines()[-1])
    assert m4["semdedup_k"] == 16
    assert 0 < m4["after_semdedup"] <= m4["after_dedup"]


def test_curate_job_perplexity_gate(tmp_path):
    """--ppl-reference/--max-ppl: a CCNet-style LM gate inside the
    quality stage — a tight threshold drops docs, the ppl column lands
    in the curated output, and loosening the threshold on --resume
    re-runs the gate only."""
    out = str(tmp_path / "curated")
    ref = str(tmp_path / "ref")
    import duckdb
    duckdb.sql(
        "COPY (SELECT * FROM '/root/testdata/sf0.001/documents.parquet' "
        f"WHERE lang = 'en') TO '{ref}' (FORMAT PARQUET)")
    cmd = [sys.executable, "jobs/curate_training_data_job.py",
           "--documents", "/root/testdata/sf0.001/documents.parquet",
           "--out", out, "--ppl-reference", ref]
    r1 = subprocess.run(cmd + ["--max-ppl", "1e9"], cwd=REPO,
                        capture_output=True, text=True, timeout=900)
    assert r1.returncode == 0, r1.stderr[-2000:]
    m1 = json.loads(r1.stdout.strip().splitlines()[-1])

    # the curated table carries the ppl column, scored for real
    import glob
    con = duckdb.connect()
    files = glob.glob(os.path.join(out, "curated", "*.parquet"))
    n_scored = con.sql(
        "SELECT COUNT(*) FROM read_parquet(?) WHERE ppl IS NOT NULL",
        params=[files]).fetchone()[0]
    assert n_scored > 0

    # tighten on --resume: only the gate re-runs, and it drops docs
    # (ppl is always > 1 wherever a bigram exists, and sf0.001 has no
    # bigram-less docs, so max-ppl=1 drops every scored doc)
    r2 = subprocess.run(cmd + ["--max-ppl", "1", "--resume"],
                        cwd=REPO, capture_output=True, text=True,
                        timeout=900)
    assert r2.returncode == 0, r2.stderr[-2000:]
    m2 = json.loads(r2.stdout.strip().splitlines()[-1])
    assert "dedup_sec" not in m2 and "curate_sec" in m2
    assert m2["after_quality_gate"] < m1["after_quality_gate"]


def test_curate_job_pii_scrub(tmp_path):
    """--scrub-pii: redactions counted and applied before every
    downstream signal; the curated text carries placeholders."""
    out = str(tmp_path / "curated")
    src = str(tmp_path / "docs")
    import duckdb
    duckdb.sql(
        "COPY (SELECT * REPLACE (CASE WHEN doc_id % 10 = 0 THEN "
        "text || ' mail me at user' || doc_id || '@example.com' "
        "ELSE text END AS text) FROM "
        "'/root/testdata/sf0.001/documents.parquet') "
        f"TO '{src}' (FORMAT PARQUET)")
    r = subprocess.run(
        [sys.executable, "jobs/curate_training_data_job.py",
         "--documents", src, "--out", out, "--scrub-pii"],
        cwd=REPO, capture_output=True, text=True, timeout=900)
    assert r.returncode == 0, r.stderr[-2000:]
    m = json.loads(r.stdout.strip().splitlines()[-1])
    assert m["pii_redactions"] > 0
    import glob
    files = glob.glob(os.path.join(out, "curated", "*.parquet"))
    con = duckdb.connect()
    leaked, scrubbed = con.sql(
        "SELECT COUNT(*) FILTER (text LIKE '%@example.com%'), "
        "COUNT(*) FILTER (text LIKE '%<EMAIL>%') "
        "FROM read_parquet(?)", params=[files]).fetchone()
    assert leaked == 0 and scrubbed > 0
    assert m["pii_redactions"] == scrubbed
