"""SparkSession factory with the engine's required configs.

Local mode is a stand-in for a multi-executor cluster: parallelism scales with
``local[N]`` threads, shuffle partitions pinned to core count, AQE on. The
``executorEnv`` malloc settings matter on page-fault-expensive hosts (see
memtune.py) — Python UDF workers inherit them at exec time.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

from ..memtune import ENV as _MALLOC_ENV

ARROW_BATCH_ROWS = 20_480  # one Arrow batch ≈ one parquet page row-target


def get_spark(
    master: str | None = None,
    app: str = "pq_engine",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    arrow_batch_rows: int = ARROW_BATCH_ROWS,
    task_cpus: int = 1,
) -> SparkSession:
    """``task_cpus > 1`` caps concurrent Python workers at cores/task_cpus —
    on DRAM-starved hosts memory-bound encode peaks well below the core count
    (this sandbox: ~8 workers), and fewer workers also means fewer heap
    arenas paying first-touch page faults. On a real cluster the equivalent
    knob is executor cores vs spark.task.cpus."""
    if cores is None:
        cores = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    if master is None:
        master = f"local[{cores}]"
    if shuffle_partitions is None:
        shuffle_partitions = cores
    b = (
        SparkSession.builder.master(master)
        .appName(app)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.default.parallelism", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", str(arrow_batch_rows))
        .config("spark.driver.memory", os.environ.get("PQ_DRIVER_MEM", "24g"))
        .config("spark.python.worker.reuse", "true")
        # JVM<->Python worker channel over unix domain sockets (Spark 4):
        # the TCP loopback path sets no TCP_NODELAY, so the runner protocol's
        # write-write-read patterns hit Linux's ~40 ms delayed-ACK timer on
        # EVERY task (measured: 49 -> 14.5 ms fixed latency per Python task,
        # executor CPU time ~4 ms either way). Executor and its workers
        # always share a host, so this applies identically on a cluster;
        # PQ_PY_UDS=false restores the TCP path.
        .config(
            "spark.python.unix.domain.socket.enabled",
            os.environ.get("PQ_PY_UDS", "true"),
        )
        .config("spark.ui.enabled", "false")
        .config("spark.driver.extraJavaOptions", "-Djava.net.preferIPv4Stack=true")
        .config("spark.task.cpus", str(task_cpus))
    )
    for k, v in _MALLOC_ENV.items():
        b = b.config(f"spark.executorEnv.{k}", v)
        os.environ.setdefault(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
