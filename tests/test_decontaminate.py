"""Benchmark decontamination (operators/decontaminate.py): n-gram
collision semantics, the min_hits knob, scale-shape plan audit, and
DuckDB oracle parity for the driver row."""

import duckdb
import pytest
from pyspark.sql import functions as F

from osmpbf_spark.operators.decontaminate import (
    contamination_hits,
    contamination_profile,
    decontaminate,
    eval_ngram_hashes,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_contamination_semantics(spark):
    # doc 1 contains the eval sentence verbatim → all its 3-grams hit;
    # doc 2 shares exactly one 3-gram; doc 3 shares none; doc 4 is
    # shorter than n (no 3-grams, can never be contaminated)
    docs = _docs(spark, [
        (1, "prefix the quick brown fox jumps suffix"),
        (2, "quick brown fox somewhere else entirely now"),
        (3, "completely different words in this document here"),
        (4, "too short"),
    ])
    ev = _docs(spark, [(100, "the quick brown fox jumps")])
    hits = {r["doc_id"]: r["eval_hits"]
            for r in contamination_hits(docs, ev, n=3).collect()}
    assert hits == {1: 3, 2: 1}

    # min_hits=1 drops both hitters; min_hits=2 keeps the single-overlap
    # doc — the incidental-collision guard
    assert sorted(r["doc_id"]
                  for r in decontaminate(docs, ev, n=3).collect()) == [3, 4]
    assert sorted(r["doc_id"] for r in
                  decontaminate(docs, ev, n=3, min_hits=2)
                  .collect()) == [2, 3, 4]

    prof = {r["doc_id"]: (r["eval_hits"], r["kept"]) for r in
            contamination_profile(docs, ev, n=3, min_hits=2).collect()}
    assert prof == {1: (3, False), 2: (1, True), 3: (0, True),
                    4: (0, True)}

    # decontaminate keeps every original column
    assert decontaminate(docs, ev, n=3).columns == docs.columns


def test_eval_shorter_than_n_and_duplicate_ngrams(spark):
    # an eval doc shorter than n contributes no n-grams; a repeated
    # n-gram inside one training doc counts ONCE (distinct shingles)
    docs = _docs(spark, [
        (1, "a b c d a b c d"),       # "a b c" appears twice → 1 hit
    ])
    ev_short = _docs(spark, [(100, "a b")])
    assert eval_ngram_hashes(ev_short, n=3).count() == 0
    assert contamination_hits(docs, ev_short, n=3).count() == 0

    ev = _docs(spark, [(100, "x a b c y")])
    hits = contamination_hits(docs, ev, n=3).collect()
    assert [(r["doc_id"], r["eval_hits"]) for r in hits] == [(1, 1)]


def test_decontaminate_plan_shape(spark):
    # scale audit: the eval side and the drop list ride BROADCAST
    # joins; the corpus payload never sort-merges
    docs = _docs(spark, [(i, f"w{i} " * 20) for i in range(50)])
    ev = _docs(spark, [(1000, "w1 " * 20)])
    out = decontaminate(docs, ev, n=5)
    out.collect()
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in plan
    assert "BroadcastHashJoin" in plan


def test_driver_row_matches_duckdb_oracle(spark):
    # the registered decontaminate_docs query vs its DuckDB oracle on
    # the sf0.001 driver table — the same compare the driver runs
    from osmpbf_spark.queries import REGISTRY
    fn, oracle = REGISTRY["decontaminate_docs"]
    sf_dir = "/root/testdata/sf0.001"
    got = sorted((r["doc_id"], r["eval_hits"], r["kept"])
                 for r in fn(spark, sf_dir).collect())
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * "
            f"FROM '{sf_dir}/documents.parquet'")
    want = sorted(tuple(r) for r in con.sql(oracle).fetchall())
    assert got == want
    # the pseudo eval docs contaminate at least themselves (any eval
    # doc with >= n+min_hits-1 tokens), so the row is non-trivial
    assert any(not kept for _, _, kept in got)
    assert any(kept for _, _, kept in got)


def test_distinct_users_retired_oracle(spark):
    """q_distinct_users left the registry in round 5 (50-entry cap;
    slot given to decontaminate_docs) — keep it green here against its
    DuckDB oracle, the same pattern as test_top_orders."""
    from osmpbf_spark.queries import DISTINCT_USERS_ORACLE, q_distinct_users
    sf_dir = "/root/testdata/sf0.001"
    got = sorted((r["event_type"], r["users"])
                 for r in q_distinct_users(spark, sf_dir).collect())
    con = duckdb.connect()
    con.sql(f"CREATE VIEW events AS SELECT * "
            f"FROM '{sf_dir}/events.parquet'")
    want = sorted(tuple(r) for r in con.sql(DISTINCT_USERS_ORACLE).fetchall())
    assert got == want


def test_wide_hash_defeats_mod1e9_collisions(spark):
    """'Aa' and 'BB' collide under the 31-base mod-1e9+7 poly hash
    (65·31+97 == 66·31+66 == 2112 — the classic Java-hash collision
    family), which at web scale produced measured phantom drops
    (tools/decon_scale_bench.py found 1,567 on a 1M-doc corpus, within
    0.1% of the birthday-bound prediction). The wide 62-bit hash keeps
    the collider distinct, so the clean doc survives."""
    from osmpbf_spark.functions.text import poly_hash_sql, wide_hash_sql
    aa, bb = "'Aa'", "'BB'"
    row = (spark.range(1)
           .selectExpr(poly_hash_sql(aa) + " AS p1",
                       poly_hash_sql(bb) + " AS p2",
                       wide_hash_sql(aa) + " AS w1",
                       wide_hash_sql(bb) + " AS w2")
           .collect()[0])
    assert row["p1"] == row["p2"]          # the narrow hash collides
    assert row["w1"] != row["w2"]          # the wide hash does not

    docs = _docs(spark, [(1, "Aa")])       # clean doc, 1-gram 'Aa'
    ev = _docs(spark, [(100, "BB")])       # eval contains only 'BB'
    assert contamination_hits(docs, ev, n=1).count() == 0
    assert decontaminate(docs, ev, n=1).count() == 1

    # DuckDB renders the identical wide hash
    import duckdb
    d = duckdb.sql(
        "SELECT " + wide_hash_sql(aa, "duckdb") + ", "
        + wide_hash_sql(bb, "duckdb")).fetchone()
    assert d == (row["w1"], row["w2"])
