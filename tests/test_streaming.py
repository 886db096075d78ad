"""Streaming ingestion test: files land → stream encodes them exactly once →
decode equals the union of inputs; restart consumes only new files."""

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from pq_engine.datagen import webpages_df
from pq_engine.spark.engine import decode_table
from pq_engine.spark.streaming import encode_stream, streaming_encode_stats


def test_streaming_encode_exactly_once(spark):
    root = tempfile.mkdtemp(prefix="pq_stream_")
    in_dir = f"{root}/in"
    out_dir = f"{root}/out"
    try:
        df1 = webpages_df(spark, 2000, partitions=2, seed=1)
        df1.write.mode("append").parquet(in_dir)
        schema = spark.read.parquet(in_dir).schema

        q = encode_stream(spark, in_dir, schema, out_dir)
        q.processAllAvailable()

        # second file batch arrives while the stream runs
        webpages_df(spark, 1000, partitions=2, seed=2).write.mode("append").parquet(in_dir)
        q.processAllAvailable()
        q.stop()

        pages = spark.read.parquet(f"{out_dir}/pages")
        back = decode_table(pages)
        assert back.count() == 3000
        # exactly-once: url+text content matches the union of the two inputs
        expect = spark.read.parquet(in_dir)
        a = back.selectExpr("sum(hash(url, text)) h").collect()[0].h
        b = expect.selectExpr("sum(hash(url, text)) h").collect()[0].h
        assert a == b

        # restart: no new files -> no new pages
        n_before = pages.count()
        q2 = encode_stream(spark, in_dir, schema, out_dir)
        q2.processAllAvailable()
        q2.stop()
        assert spark.read.parquet(f"{out_dir}/pages").count() == n_before

        stats = streaming_encode_stats(spark, f"{out_dir}/pages")
        assert stats.filter(F.col("column") == "text").count() >= 1
    finally:
        shutil.rmtree(root, ignore_errors=True)
