"""Cluster entry point: the resumable encode job, shipped via
    spark-submit --py-files dist/pq_engine.zip tools/encode_job.py \
        --input <parquet dir> --output <dir> [--partitions N] \
        [--salt-key url --salt-buckets 8] [--resume]

On a real cluster nothing changes except the master URL — the engine is the
same mapInArrow pass; partitioning, skew salting, lineage checkpointing and
resume are identical (north rule: "run via spark-submit --py-files on a
multi-executor cluster").
"""

from __future__ import annotations

import argparse
import json


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--partitions", type=int, default=None)
    ap.add_argument("--salt-key", default=None)
    ap.add_argument("--salt-buckets", type=int, default=1)
    ap.add_argument("--page-compression", default=None)
    ap.add_argument(
        "--worker-reads", action="store_true",
        help="worker-side parquet reads (splits = row groups, no JVM->Python "
             "transport) — the fast path when the input needs no reshuffle; "
             "use the default JVM-fed path when salting/repartitioning",
    )
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from pq_engine.spark.engine import run_encode_files_job, run_encode_job

    spark = SparkSession.builder.appName("pq_encode").getOrCreate()
    if args.worker_reads:
        summary = run_encode_files_job(
            spark, args.input, args.output,
            page_compression=args.page_compression,
        )
    else:
        df = spark.read.parquet(args.input)
        summary = run_encode_job(
            spark,
            df,
            args.output,
            num_partitions=args.partitions,
            key=args.salt_key,
            salt_buckets=args.salt_buckets,
            page_compression=args.page_compression,
        )
    print(json.dumps(summary))
    spark.stop()


if __name__ == "__main__":
    main()
