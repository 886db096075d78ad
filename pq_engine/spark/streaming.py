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


def stream_to_table(
    spark: SparkSession,
    stream_df: DataFrame,
    table_dir: str,
    checkpoint_dir: str,
    codec: str = "auto",
    page_compression: str | None = None,
    io=None,
    available_now: bool = False,
):
    """Streaming → snapshot-table sink: commit every micro-batch as one
    table snapshot (``foreachBatch`` → :func:`~.table.table_append`), with
    EXACTLY-ONCE semantics on top of foreachBatch's at-least-once replay.

    The manifest records ``streaming_batch_id``; on replay of a batch whose
    id is already reachable from the version hint the commit is a no-op, so
    a crash anywhere (mid-encode, mid-manifest-write) leaves the table at
    the previous snapshot and the restarted stream re-commits the batch
    exactly once. Orphan data files from the crashed attempt stay
    unreferenced (attempt-unique names, explicit manifest file lists) —
    the Iceberg orphan-file contract. The skip check scans reachable
    snapshots for the max committed batch id, so interleaved non-streaming
    appends don't break it (batch ids are monotonic per checkpoint).

    Returns the started StreamingQuery."""
    from .table import table_append, table_snapshots

    def commit_batch(batch_df: DataFrame, epoch_id: int) -> None:
        done = [
            m["streaming_batch_id"]
            for m in table_snapshots(table_dir, io)
            if m.get("streaming_batch_id") is not None
        ]
        if done and max(done) >= epoch_id:
            return  # replayed batch already committed
        table_append(
            spark,
            batch_df,
            table_dir,
            codec=codec,
            page_compression=page_compression,
            io=io,
            allow_dirty=True,
            extra_manifest={"streaming_batch_id": int(epoch_id)},
        )

    w = stream_df.writeStream.foreachBatch(commit_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        w = w.trigger(availableNow=True)
    return w.start()


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


def windowed_crawl_stats(
    stream_df: DataFrame,
    ts_col: str = "warc_ts",
    window: str = "10 minutes",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Event-time windowed ingest monitoring with LATE-DATA handling: pages
    and bytes per crawl-time window, watermarked so state is bounded and
    stragglers later than ``watermark`` are dropped deterministically
    (Structured Streaming's late-data contract). Works on the raw stream
    BEFORE encoding — the operational dashboard of a continuous crawl."""
    return (
        stream_df.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window).alias("w"), F.col("lang"))
        .agg(
            F.count("*").alias("docs"),
            F.sum(F.length("text").cast("long")).alias("text_bytes"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "lang",
            "docs",
            "text_bytes",
        )
    )


def streaming_dedup_exact(
    stream_df: DataFrame,
    text_col: str = "text",
    timeout_minutes: int | None = None,
):
    """Streaming EXACT dedup — the stateful operator a continuously-crawled
    corpus needs: keyed by content fingerprint (md5), keeps only the FIRST
    arrival of each distinct text across all micro-batches.

    Custom stateful processing via ``applyInPandasWithState`` (the engine
    extension the brief names): state per fingerprint = one 'seen' flag.
    With ``timeout_minutes`` the state expires on processing time, bounding
    state size for unbounded corpora (expired fingerprints may re-admit a
    duplicate — the standard windowed-dedup tradeoff; leave None for exact
    semantics when state fits)."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    in_fields = stream_df.schema.fields
    out_schema = ", ".join(f"`{f.name}` {f.dataType.simpleString()}" for f in in_fields)
    state_schema = "seen byte"
    keyed = stream_df.withColumn("__fp", F.md5(F.col(text_col)))

    def dedup_fn(key, pdfs, state: GroupState):
        if state.hasTimedOut:
            state.remove()
            return
        already = state.exists
        if not already:
            for pdf in pdfs:
                if len(pdf):
                    yield pdf.iloc[[0]].drop(columns=["__fp"])
                    break
            state.update((1,))
            if timeout_minutes is not None:
                state.setTimeoutDuration(timeout_minutes * 60 * 1000)
        else:
            for _ in pdfs:  # drain
                pass
            if timeout_minutes is not None:
                state.setTimeoutDuration(timeout_minutes * 60 * 1000)

    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if timeout_minutes is not None
        else GroupStateTimeout.NoTimeout
    )
    return keyed.groupBy("__fp").applyInPandasWithState(
        dedup_fn, out_schema, state_schema, "Update", timeout
    )
