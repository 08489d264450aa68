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
