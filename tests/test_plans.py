"""Physical-plan quality gates: the declarative parts of the engine must let
Catalyst do its job — filters reach the parquet scan (PushedFilters), column
pruning shrinks ReadSchema, small joins broadcast, the encode pass adds no
shuffle. These mirror the reference's read-side pushdown stack (SURVEY §2.5:
RowGroupFilter / ColumnIndexFilter) which Spark supplies for free ON our
manifest/page tables — but only if our plans keep it reachable."""

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def pages_path(spark, tmp_path_factory):
    from pq_engine.datagen import webpages_df
    from pq_engine.spark.engine import encode_table

    out = str(tmp_path_factory.mktemp("plans") / "pages")
    df = webpages_df(spark, 4000, partitions=4, seed=3)
    encode_table(df).write.parquet(out)
    return out


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_manifest_filter_pushdown(spark, pages_path):
    pages = spark.read.parquet(pages_path)
    q = pages.filter(F.col("column") == "lang").select("codec", "encoded_bytes")
    plan = _plan(q)
    assert "PushedFilters" in plan and "column" in plan.split("PushedFilters")[1][:200]


def test_manifest_column_pruning(spark, pages_path):
    pages = spark.read.parquet(pages_path)
    q = pages.select("column", "encoded_bytes")
    plan = _plan(q)
    read_schema = plan.split("ReadSchema")[1][:300]
    assert "data" not in read_schema, "blob column must be pruned from stats scans"


def test_encode_adds_no_shuffle(spark):
    from pq_engine.datagen import webpages_df
    from pq_engine.spark.engine import encode_table

    df = webpages_df(spark, 2000, partitions=2, seed=4)
    plan = _plan(encode_table(df))
    assert "Exchange" not in plan, "encode must be a single map-side pass"


def test_lineage_antijoin_broadcasts(spark, pages_path):
    from pq_engine.spark.engine import lineage_from_pages

    pages = spark.read.parquet(pages_path)
    done = lineage_from_pages(pages).select("split_id")
    big = pages.withColumnRenamed("split_id", "__split")
    joined = big.join(
        F.broadcast(done.withColumnRenamed("split_id", "__split")),
        on="__split",
        how="left_anti",
    )
    plan = _plan(joined)
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan