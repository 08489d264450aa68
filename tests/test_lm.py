"""Bigram-LM perplexity (operators/lm.py): hand-computed Laplace
probabilities, unseen-bigram smoothing, pruning semantics, short-doc
NULLs, broadcast-vs-shuffle value equality, and driver-row parity."""

import math

import pytest
from pyspark.sql import functions as F

from osmpbf_spark.operators.lm import (
    perplexity,
    prune_lm,
    train_bigram_lm,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _q6(x):
    return math.floor(x * 1e6 + 0.5) / 1e6


def _ppl(logps):
    return math.floor(
        math.exp(-sum(_q6(lp) for lp in logps) / len(logps)) * 1e4
        + 0.5) / 1e4


def test_hand_computed_perplexity(spark):
    # reference: "a b a b a" → bigrams: (a b) ×2, (b a) ×2
    # prefix counts: a→2... wait: bigrams are (a,b),(b,a),(a,b),(b,a):
    # c1(a)=2, c1(b)=2; vocab V=2
    ref = _docs(spark, [(100, "a b a b a")])
    lm = train_bigram_lm(ref)
    assert {(r["h1"], r["c2"]) for r in lm.bigrams.collect()} and \
        lm.bigrams.count() == 2
    assert lm.vocab.collect()[0]["v"] == 2

    # doc "a b a": bigrams (a b), (b a); P(a b) = (2+1)/(2+1*2) = 3/4,
    # P(b a) = 3/4
    got = {r["doc_id"]: (r["n_bigrams"], r["ppl"]) for r in
           perplexity(_docs(spark, [(1, "a b a")]), lm).collect()}
    want = _ppl([math.log(3 / 4), math.log(3 / 4)])
    assert got == {1: (2, want)}


def test_unseen_bigram_and_unseen_prefix(spark):
    ref = _docs(spark, [(100, "a b a b a")])
    lm = train_bigram_lm(ref)
    # "a a": seen prefix, unseen bigram → (0+1)/(2+2) = 1/4
    # "z z": unseen prefix → (0+1)/(0+2) = 1/2
    got = {r["doc_id"]: r["ppl"] for r in
           perplexity(_docs(spark, [(1, "a a"), (2, "z z")]),
                      lm).collect()}
    assert got[1] == _ppl([math.log(1 / 4)])
    assert got[2] == _ppl([math.log(1 / 2)])


def test_short_docs_score_null_but_appear(spark):
    lm = train_bigram_lm(_docs(spark, [(100, "a b c")]))
    rows = {r["doc_id"]: (r["n_bigrams"], r["ppl"]) for r in
            perplexity(_docs(spark, [(1, "single"), (2, ""),
                                     (3, "a b")]), lm).collect()}
    assert rows[1] == (0, None)
    assert rows[2] == (0, None)
    assert rows[3][0] == 1 and rows[3][1] is not None


def test_prune_moves_rare_bigrams_into_smoothed_mass(spark):
    # (a b) ×3, (b c) ×1 → prune(min_count=2) drops (b c) only
    ref = _docs(spark, [(100, "a b"), (101, "a b"), (102, "a b"),
                        (103, "b c")])
    lm = train_bigram_lm(ref)
    pruned = prune_lm(lm, min_count=2)
    assert lm.bigrams.count() == 2 and pruned.bigrams.count() == 1
    # prefix counts and V unchanged — pruned bigram scores exactly like
    # an unseen one: P(b c) = (0+1)/(c1(b)+V) = 1/(1+3)
    assert pruned.prefixes.count() == lm.prefixes.count()
    got = {r["doc_id"]: r["ppl"] for r in
           perplexity(_docs(spark, [(1, "b c")]), pruned).collect()}
    assert got[1] == _ppl([math.log(1 / 4)])


def test_broadcast_and_shuffle_paths_agree(spark):
    ref = _docs(spark, [(100, "the quick brown fox jumps over the "
                              "lazy dog the quick fox")])
    docs = _docs(spark, [(i, t) for i, t in enumerate(
        ["the quick brown fox", "lazy dog sleeps", "fox over dog",
         "completely unseen words here"])])
    lm = train_bigram_lm(ref)
    a = sorted(map(tuple, perplexity(docs, lm).collect()))
    b = sorted(map(tuple,
                   perplexity(docs, lm, broadcast_lm=False).collect()))
    assert a == b


def test_higher_ppl_for_out_of_domain_text(spark):
    # the signal the gate uses: reference-like text scores lower
    # perplexity than alien text under the same LM
    ref = _docs(spark, [(100, "the cat sat on the mat and the cat "
                              "slept on the mat")])
    lm = train_bigram_lm(ref)
    got = {r["doc_id"]: r["ppl"] for r in perplexity(_docs(spark, [
        (1, "the cat sat on the mat"),
        (2, "zebra quantum flux oscillates wildly")]), lm).collect()}
    assert got[1] < got[2]


def test_driver_row_parity_sf0001(spark):
    import duckdb

    from osmpbf_spark.queries import REGISTRY
    fn, sql = REGISTRY["lm_perplexity"]
    got = sorted(map(tuple, fn(spark, "/root/testdata/sf0.001")
                     .collect()))
    con = duckdb.connect()
    con.sql("CREATE VIEW documents AS SELECT * FROM "
            "'/root/testdata/sf0.001/documents.parquet'")
    want = sorted(map(tuple, con.sql(sql).fetchall()))
    assert got == want
