"""Bucketing evidence: documents ⋈ media co-bucketed by media_ref joins
with NO exchange on either side — the production-scale mechanism that
removes the payload shuffle the broadcast-meta path avoids only for
small metadata (README "payloads never move more than once")."""

import pytest
from pyspark.sql import functions as F

from osmpbf_spark.plans.audit import audit
from osmpbf_spark.sources.documents import (
    blob_metadata,
    fileblocks_to_rows,
    make_documents,
)
from osmpbf_spark.sources.synth import synth_fileblocks


@pytest.fixture(scope="module")
def bucketed_tables(spark, tmp_path_factory):
    # warehouse dir is a static conf — use the session default (cwd
    # spark-warehouse) and drop the tables afterwards
    fbs, _ = synth_fileblocks(20000, block_elements=1000)
    doc_rows, media_rows = fileblocks_to_rows("bkt", fbs)
    docs, media = make_documents(spark, doc_rows, media_rows)
    for name, df in [("docs_b", docs), ("media_b", media)]:
        key = "doc_id" if name == "docs_b" else "media_ref"
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        (df.write.bucketBy(8, key if name == "media_b" else "doc_id")
         .sortBy(key if name == "media_b" else "doc_id")
         .mode("overwrite").saveAsTable(name))
    # media bucketed by media_ref; documents carry media_ref inside spans,
    # so bucket the extracted metadata as its own table (the Iceberg
    # layout: metadata and payload co-bucketed by media_ref)
    meta = blob_metadata(spark.table("docs_b"))
    spark.sql("DROP TABLE IF EXISTS meta_b")
    (meta.write.bucketBy(8, "media_ref").sortBy("media_ref")
     .mode("overwrite").saveAsTable("meta_b"))
    yield spark
    for name in ("docs_b", "media_b", "meta_b"):
        spark.sql(f"DROP TABLE IF EXISTS {name}")


def test_cobucketed_join_has_no_shuffle(bucketed_tables):
    spark = bucketed_tables
    # force the non-broadcast regime (at 10^12 docs neither side
    # broadcasts) so the bucketed layout must carry the join
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        meta = spark.table("meta_b").filter(F.col("blob_type") == "OSMData")
        media = spark.table("media_b")
        joined = meta.join(media, "media_ref").select(
            "doc_id", "blob_no", "payload")
        a = audit(joined, execute=True)
        # co-bucketed sort-merge join: ZERO shuffle exchanges — neither
        # the payload side nor the metadata side moves
        assert a["shuffle_exchanges"] == 0, a["plan"][:2500]
        assert a["sortmerge_joins"] == 1, a["plan"][:2500]
        # every OSMData blob (all media rows except the header's) joins
        assert joined.count() == spark.table("media_b").count() - 1
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
