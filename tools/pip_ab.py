"""A/B evidence for the r2 PIP bench regression (VERDICT r2 #1).

Measures the two suspect queries — ``pip_diamond`` (registry, sf0.1) and
the synthetic decode+PIP north-star job — under ``tight=True`` (the r2
default: always-scanline cover) vs ``tight="auto"`` (the r3 default:
bbox path for ≤4-edge rings). Methodology per BENCH_SCALING.md: fresh
subprocess per trial, taskset-pinned, steady-state best-of-2 inside a
trial, MEDIAN across ``--trials`` trials (the host CPU drifts 1.4×
run-to-run; single unpinned runs are not evidence).

Usage: python tools/pip_ab.py [--trials 5] [--nodes 2000000]
Writes BENCH_PIP_AB.md.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import statistics
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

AB_RUNNER = r"""
import json, sys, time
sys.path.insert(0, {repo!r})
mode, sf_dir, base = sys.argv[1], sys.argv[2], sys.argv[3]
import osmpbf_spark.queries as Q
from osmpbf_spark.session import get_spark
from osmpbf_spark.sources.documents import read_elements
from osmpbf_spark.functions.grid import GRID_RES_FINE, with_grid_cells
from osmpbf_spark.operators.pip import make_polygons, pip_join

tight = True if mode == "tight" else "auto"
if mode == "tight":
    # r2 behavior: queries call pip_join with the always-scanline cover
    _orig = pip_join
    def _pj(points, polygons, **kw):
        kw.setdefault("tight", True)
        return _orig(points, polygons, **kw)
    Q.pip_join = _pj

spark = get_spark(f"pip-ab-{{mode}}", master="local[32]",
                  shuffle_partitions=32)
spark.sparkContext.setLogLevel("ERROR")
spark.read.parquet(sf_dir + "/events.parquet").limit(1).count()

def mat(df):
    df.write.format("noop").mode("overwrite").save()

fn, _ = Q.REGISTRY["pip_diamond"]
t_pd = float("inf")
for _ in range(3):                       # warm + best-of-2 steady state
    t0 = time.time(); mat(fn(spark, sf_dir))
    t_pd = min(t_pd, time.time() - t0)

docs = spark.read.parquet(base + "/documents.parquet")
media = spark.read.parquet(base + "/media.parquet")
_B = 1_000_000_000
def box(pid, la0, lo0, la1, lo1):
    return (pid, [(la0, lo0), (la1, lo0), (la1, lo1), (la0, lo1),
                  (la0, lo0)])
polys = make_polygons(spark, [
    box("megacity", int(42.9*_B), int(8.9*_B), int(43.1*_B), int(9.1*_B)),
    box("band", int(44*_B), int(5*_B), int(46*_B), int(15*_B)),
    box("corner", int(40*_B), int(5*_B), int(41*_B), int(6*_B)),
])

def job():
    el = read_elements(docs, media, decode_partitions=64)
    nodes = with_grid_cells(el.filter("element_type = 'node'"),
                            res=GRID_RES_FINE)
    return pip_join(nodes, polys, res=GRID_RES_FINE, tight=tight).count()

job()
t_dp = float("inf"); matches = 0
for _ in range(2):
    t0 = time.time(); matches = job()
    t_dp = min(t_dp, time.time() - t0)
print(json.dumps({{"mode": mode, "pip_diamond": round(t_pd, 3),
                   "decode_pip": round(t_dp, 3), "matches": matches}}))
spark.stop()
"""


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--trials", type=int, default=5)
    ap.add_argument("--nodes", type=int, default=2_000_000)
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    args = ap.parse_args()

    base = f"/tmp/pip_ab_{args.nodes}"
    if not os.path.exists(base + "/expected.json"):
        from osmpbf_spark.session import get_spark
        from osmpbf_spark.sources.synth import synth_documents
        spark = get_spark("pip-ab-prep", master="local[32]")
        spark.sparkContext.setLogLevel("ERROR")
        docs, media, exp = synth_documents(
            spark, args.nodes, num_partitions=64, block_elements=4000)
        docs.write.mode("overwrite").parquet(base + "/documents.parquet")
        media.write.mode("overwrite").parquet(base + "/media.parquet")
        with open(base + "/expected.json", "w") as f:
            json.dump(exp, f)
        spark.stop()
    with open(base + "/expected.json") as f:
        exp = json.load(f)
    n_elements = exp["node"] + exp["way"] + exp["relation"]

    runner = AB_RUNNER.format(repo=REPO)
    results = {}
    for mode in ("tight", "auto"):
        cmd = [sys.executable, "-c", runner, mode, args.sf, base]
        if shutil.which("taskset"):
            cmd = ["taskset", "-c", "0-31"] + cmd
        trials = []
        for t in range(args.trials):
            out = subprocess.run(cmd, capture_output=True, text=True,
                                 timeout=1800)
            lines = [ln for ln in out.stdout.splitlines()
                     if ln.startswith("{")]
            if not lines:
                print(out.stdout[-2000:], out.stderr[-2000:])
                raise SystemExit(f"runner failed in mode {mode}")
            r = json.loads(lines[-1])
            print(f"{mode} trial {t}: {r}")
            trials.append(r)
        results[mode] = {
            "pip_diamond_median": round(statistics.median(
                x["pip_diamond"] for x in trials), 3),
            "decode_pip_median": round(statistics.median(
                x["decode_pip"] for x in trials), 3),
            "matches": trials[0]["matches"],
            "trials": trials,
        }

    a, t = results["auto"], results["tight"]
    assert a["matches"] == t["matches"], "cover change altered results!"
    summary = {
        "n_elements": n_elements,
        "tight(r2 default)": {k: t[k] for k in
                              ("pip_diamond_median", "decode_pip_median")},
        "auto(r3 default)": {k: a[k] for k in
                             ("pip_diamond_median", "decode_pip_median")},
        "decode_pip_elements_per_sec": {
            "tight": round(n_elements / t["decode_pip_median"], 0),
            "auto": round(n_elements / a["decode_pip_median"], 0)},
    }
    print(json.dumps(summary))
    with open(os.path.join(REPO, "BENCH_PIP_AB.md"), "w") as f:
        f.write(f"""# BENCH_PIP_AB — settling the r2 PIP regression

VERDICT r2 #1 flagged pip_diamond 2.15→3.01 s and decode+PIP 731k→542k
elements/sec, prime suspect the always-scanline ``tight=True`` cover
default added in r2. Methodology: fresh subprocess + taskset 0-31 per
trial, steady-state best-of-2 inside each trial, **median of
{args.trials} trials** per mode ({n_elements:,} synthetic elements for
decode+PIP; registry ``pip_diamond`` at sf0.1).

| mode | pip_diamond s (median) | decode+PIP s (median) | decode+PIP elem/s |
|---|---|---|---|
| tight=True (r2 default) | {t['pip_diamond_median']} | {t['decode_pip_median']} | {n_elements / t['decode_pip_median']:,.0f} |
| tight="auto" (r3 default) | {a['pip_diamond_median']} | {a['decode_pip_median']} | {n_elements / a['decode_pip_median']:,.0f} |

PIP match counts are identical in both modes ({a['matches']:,}) — the
cover is a prefilter only; the exact refine fixes results.

Raw trials:

```json
{json.dumps({m: results[m]['trials'] for m in results}, indent=1)}
```
""")
    print("wrote BENCH_PIP_AB.md")


if __name__ == "__main__":
    main()
