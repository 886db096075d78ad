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


def test_streaming_dedup_exact_across_batches(spark):
    """applyInPandasWithState keeps only the FIRST arrival of each distinct
    text — including duplicates arriving in LATER micro-batches."""
    from pq_engine.spark.streaming import streaming_dedup_exact

    root = tempfile.mkdtemp(prefix="pq_sdedup_")
    in_dir, chk = f"{root}/in", f"{root}/chk"
    try:
        spark.createDataFrame(
            [(1, "alpha"), (2, "beta"), (3, "alpha")], "doc_id long, text string"
        ).write.mode("append").parquet(in_dir)
        schema = spark.read.parquet(in_dir).schema
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(in_dir)
        )
        deduped = streaming_dedup_exact(stream, "text")
        q = (
            deduped.writeStream.format("memory")
            .queryName("sdedup")
            .outputMode("update")
            .option("checkpointLocation", chk)
            .start()
        )
        q.processAllAvailable()
        # batch 2: one repeat of 'beta' (cross-batch dup) + one new text
        spark.createDataFrame(
            [(4, "beta"), (5, "gamma")], "doc_id long, text string"
        ).write.mode("append").parquet(in_dir)
        q.processAllAvailable()
        q.stop()
        rows = {r["text"]: r["doc_id"] for r in spark.sql("select * from sdedup").collect()}
        assert set(rows) == {"alpha", "beta", "gamma"}
        assert rows["gamma"] == 5
        # 'beta' admitted exactly once, from its first batch
        assert spark.sql("select count(*) n from sdedup where text='beta'").collect()[0].n == 1
    finally:
        shutil.rmtree(root, ignore_errors=True)


def test_stream_to_table_exactly_once_across_crash(spark):
    """foreachBatch → snapshot commit: a crash between the data write and
    the manifest put leaves the table at the previous snapshot; the
    restarted stream replays the batch and commits it EXACTLY once."""
    from pq_engine.spark.streaming import stream_to_table
    from pq_engine.spark.table import (
        TableIO,
        current_snapshot_id,
        table_read,
        table_snapshots,
    )

    class CrashOnFirstManifest(TableIO):
        def __init__(self):
            self.armed = True

        def put_atomic(self, path, payload):
            if self.armed and path.endswith(".json"):
                self.armed = False
                raise RuntimeError("injected crash before manifest commit")
            super().put_atomic(path, payload)

    root = tempfile.mkdtemp(prefix="pq_stbl_")
    in_dir, chk, td = f"{root}/in", f"{root}/chk", f"{root}/table"
    try:
        src = spark.createDataFrame(
            [(i, f"doc {i}") for i in range(40)], "doc_id long, text string"
        )
        src.write.mode("append").parquet(in_dir)
        schema = spark.read.parquet(in_dir).schema

        def start(io):
            stream = spark.readStream.schema(schema).parquet(in_dir)
            return stream_to_table(
                spark, stream, td, chk, io=io, available_now=True
            )

        q = start(CrashOnFirstManifest())
        with pytest.raises(Exception, match="injected crash"):
            q.processAllAvailable()
            q.awaitTermination()
        # crash mid-commit: nothing committed, data orphans invisible
        assert current_snapshot_id(td) is None

        q2 = start(None)
        assert q2.awaitTermination(120)
        assert current_snapshot_id(td) == 1
        got = {r.doc_id: r.text for r in table_read(spark, td).collect()}
        assert got == {i: f"doc {i}" for i in range(40)}  # exactly once

        # new files → next batch commits snapshot 2 with a HIGHER batch id;
        # a restart with no new data replays nothing
        spark.createDataFrame(
            [(100 + i, f"late {i}") for i in range(10)],
            "doc_id long, text string",
        ).write.mode("append").parquet(in_dir)
        q3 = start(None)
        assert q3.awaitTermination(120)
        snaps = table_snapshots(td)
        assert [m["snapshot_id"] for m in snaps] == [1, 2]
        assert snaps[-1]["streaming_batch_id"] > snaps[0]["streaming_batch_id"]
        assert table_read(spark, td).count() == 50
        q4 = start(None)
        assert q4.awaitTermination(120)
        assert current_snapshot_id(td) == 2  # idempotent restart
    finally:
        shutil.rmtree(root, ignore_errors=True)


def test_windowed_crawl_stats_watermark(spark):
    """Watermarked event-time windows: counts land in their crawl-time
    window; the plan carries the watermark (bounded state)."""
    from pq_engine.spark.streaming import windowed_crawl_stats

    root = tempfile.mkdtemp(prefix="pq_swin_")
    in_dir, chk = f"{root}/in", f"{root}/chk"
    try:
        df = webpages_df(spark, 500, partitions=1, seed=3)
        df.write.mode("append").parquet(in_dir)
        schema = spark.read.parquet(in_dir).schema
        stream = spark.readStream.schema(schema).parquet(in_dir)
        agg = windowed_crawl_stats(stream, window="1 hour", watermark="2 hours")
        q = (
            agg.writeStream.format("memory")
            .queryName("swin")
            .outputMode("append")
            .option("checkpointLocation", chk)
            .start()
        )
        q.processAllAvailable()
        q.stop()
        # append mode emits only watermark-closed windows; verify against the
        # same aggregation run in batch over the same data
        got = spark.sql("select sum(docs) d from swin").collect()[0].d or 0
        total = df.count()
        assert 0 <= got <= total
        batch = windowed_crawl_stats(df, window="1 hour", watermark="2 hours")
        assert batch.selectExpr("sum(docs) d").collect()[0].d == total
    finally:
        shutil.rmtree(root, ignore_errors=True)
