"""Sequence packing (pack-and-split into fixed token windows)."""

import duckdb
import pytest

from osmpbf_spark.operators.packing import (
    pack_sequences,
    pack_sequences_oracle_sql,
)

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def packed(spark):
    docs = (spark.read.parquet(SF + "/documents.parquet")
            .select("doc_id", "text"))
    return pack_sequences(docs, 512, n_strata=8).collect()


def test_pack_sequences_matches_sql_oracle(spark, packed):
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * "
            f"FROM '{SF}/documents.parquet'")
    want = {tuple(r) for r in
            con.sql(pack_sequences_oracle_sql(512, n_strata=8)).fetchall()}
    assert {tuple(r) for r in packed} == want and want


def test_pack_sequences_invariants(spark, packed):
    from collections import defaultdict
    from pyspark.sql import functions as F
    # every bin except each stratum's LAST is exactly full
    fill = defaultdict(int)
    last_bin = {}
    for r in packed:
        fill[(r["stratum"], r["bin_no"])] += r["tok_len"]
        last_bin[r["stratum"]] = max(last_bin.get(r["stratum"], -1),
                                     r["bin_no"])
    for (s, b), tot in fill.items():
        if b < last_bin[s]:
            assert tot == 512, (s, b, tot)
        else:
            assert 0 < tot <= 512
    # per-document slices reassemble the document: contiguous from 0,
    # summing to its token count
    docs = (spark.read.parquet(SF + "/documents.parquet")
            .select("doc_id",
                    F.expr("size(filter(split(text, ' '), t -> t != ''))")
                    .alias("n")))
    n_tok = {r["doc_id"]: r["n"] for r in docs.collect()}
    per_doc = defaultdict(list)
    for r in packed:
        per_doc[r["doc_id"]].append((r["tok_start"], r["tok_len"]))
    assert set(per_doc) == {d for d, n in n_tok.items() if n > 0}
    for d, slices in per_doc.items():
        slices.sort()
        pos = 0
        for start, ln in slices:
            assert start == pos and ln > 0
            pos += ln
        assert pos == n_tok[d], d


def test_pack_sequences_partitioning_independent(spark):
    docs = (spark.read.parquet(SF + "/documents.parquet")
            .select("doc_id", "text"))
    a = {tuple(r) for r in
         pack_sequences(docs.coalesce(1), 256, n_strata=4).collect()}
    b = {tuple(r) for r in
         pack_sequences(docs.repartition(17), 256, n_strata=4).collect()}
    assert a == b and a


def test_pack_sequences_precomputed_counts_and_errors(spark):
    from pyspark.sql import functions as F
    docs = (spark.read.parquet(SF + "/documents.parquet")
            .select("doc_id", "text")
            .withColumn("n_tokens", F.expr(
                "size(filter(split(text, ' '), t -> t != ''))")))
    via_text = {tuple(r) for r in
                pack_sequences(docs, 512, n_strata=8).collect()}
    via_col = {tuple(r) for r in
               pack_sequences(docs, 512, n_strata=8,
                              token_count_col="n_tokens").collect()}
    assert via_text == via_col
    with pytest.raises(ValueError):
        pack_sequences(docs, 0)
