"""Iceberg-flavored snapshot table layer over the page sink.

The north star frames encode output as "Iceberg-style row-group-sized
batches"; this module adds the table semantics on top of the page sink,
following Iceberg's PUBLIC table-spec concepts (HadoopCatalog layout):

    table_dir/
      data/snap=1/column=<c>/...parquet         immutable page files
      metadata/snap-00001.json                  snapshot manifest
      metadata/version-hint.text                current snapshot id

A snapshot manifest records: id, parent id, operation, the column→ptype
schema, the FULL data-file list (parent's files + the append's new files —
Iceberg's manifest-reuse idea, so a reader never lists directories), and a
lineage rollup (rows/raw/encoded bytes per column). ``append`` = encode new
rows into a fresh ``data/snap=N`` directory + write manifest N; commits are
atomic via the storage shim's ``put_atomic``, so a crashed append leaves
the table at its previous snapshot (data files without a committed manifest
are invisible — same failure contract as Iceberg). Time travel = read the
file list of any older snapshot.

Object-store safety (r6): the commit protocol mirrors Spark/Iceberg task
commits — each SINK TASK writes its own immutable, uniquely-named data
files and returns (file, column, rows, bytes, pages) manifest rows as the
job's result; the driver assembles the manifest from those rows. No
directory walk, no rename of data files, and a failed/speculative task
attempt only leaves orphan files that no manifest references (invisible by
construction). All metadata I/O goes through :class:`TableIO`; the local
implementation uses write-temp-then-``os.replace``, and the documented
object-store mapping is a single conditional PUT (S3 If-None-Match /
GCS precondition) for the same atomicity.

At 100 TB the file list lives in the manifest as relative paths; reads pass
the explicit list to the parquet scan with ``basePath`` so partition
pruning by ``column=`` still applies and no directory listing happens on
the object store (the expensive operation Iceberg manifests exist to
avoid).

Reference: the job manifest/lineage machinery this builds on is
engine.run_encode_job; parquet-java's nearest analog is the hadoop
write-committer path (ParquetOutputCommitter), which likewise publishes
files only at commit.
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql import DataFrame, SparkSession, functions as F

from .engine import decode_table, encode_table, spark_type_to_ptype


class TableIO:
    """Storage shim — the ONLY code path that touches table METADATA, and
    the existence probe for data prefixes. Data files themselves are
    written by sink tasks as plain create-new-file (a PUT on an object
    store) and read back through Spark's own FileSystem layer, which is
    already object-store-capable; what breaks on S3/GCS without this shim
    is directory walking and rename-based commits, so those two are
    isolated here.

    Object-store implementation notes (the contract each method must keep):
      * ``put_atomic`` — all-or-nothing publish of small metadata blobs.
        Local: temp file + ``os.replace``. S3/GCS: one PUT (objects never
        appear partially); for the version hint under concurrent writers,
        a conditional PUT (If-Match on the previous generation) gives the
        same lost-update protection a catalog/lock service provides.
      * ``get_text``/``exists`` — plain GET / HEAD.
      * ``prefix_nonempty`` — LIST with max-keys=1 (only used to refuse
        appending into a dirty uncommitted snapshot directory).
    """

    def get_text(self, path: str) -> str:
        with open(path) as f:
            return f.read()

    def put_atomic(self, path: str, payload: str) -> None:
        os.makedirs(os.path.dirname(path), exist_ok=True)
        tmp = f"{path}.{uuid.uuid4().hex}.tmp"
        with open(tmp, "w") as f:
            f.write(payload)
        os.replace(tmp, path)  # atomic on POSIX: the commit point

    def exists(self, path: str) -> bool:
        return os.path.exists(path)

    def prefix_nonempty(self, path: str) -> bool:
        if not os.path.isdir(path):
            return False
        for _root, _dirs, names in os.walk(path):
            if names:
                return True
        return False


_DEFAULT_IO = TableIO()


def _meta_dir(table_dir: str) -> str:
    return os.path.join(table_dir, "metadata")


def _snap_path(table_dir: str, snap_id: int) -> str:
    return os.path.join(_meta_dir(table_dir), f"snap-{snap_id:05d}.json")


def current_snapshot_id(table_dir: str, io: TableIO | None = None) -> int | None:
    io = io or _DEFAULT_IO
    hint = os.path.join(_meta_dir(table_dir), "version-hint.text")
    if not io.exists(hint):
        return None
    return int(io.get_text(hint).strip())


def read_snapshot_manifest(
    table_dir: str, snap_id: int | None = None, io: TableIO | None = None
) -> dict:
    io = io or _DEFAULT_IO
    if snap_id is None:
        snap_id = current_snapshot_id(table_dir, io)
        if snap_id is None:
            raise FileNotFoundError(f"no committed snapshot in {table_dir}")
    return json.loads(io.get_text(_snap_path(table_dir, snap_id)))


def table_snapshots(table_dir: str, io: TableIO | None = None) -> list[dict]:
    """All committed snapshots, oldest first (walks parent ids from the
    version hint — uncommitted manifests are unreachable by construction)."""
    out = []
    sid = current_snapshot_id(table_dir, io)
    while sid is not None:
        m = read_snapshot_manifest(table_dir, sid, io)
        out.append(m)
        sid = m.get("parent_id")
    return list(reversed(out))


# arrow schema of the per-task manifest rows the sink job returns
_MANIFEST_ROW_SCHEMA = (
    "column string, file string, rows long, raw_bytes long, "
    "encoded_bytes long, pages long"
)

# flush a column's accumulated pages once their encoded payload passes this
# (keeps task memory bounded without producing a tiny file per arrow batch)
_SINK_FLUSH_BYTES = 128 << 20


def _sink_pages(pages: DataFrame, table_dir: str, rel_data: str, n_sink: int):
    """Write the page table as immutable per-column parquet files from the
    sink tasks themselves and return the per-file manifest rows — the
    Iceberg task-commit shape: the job RESULT carries the file list, so the
    driver never lists the data directory. File names are unique per task
    attempt; a failed/speculative attempt leaves only unreferenced orphans.
    """

    def write_task(batches):
        import pyarrow as pa
        import pyarrow.compute as pc
        import pyarrow.parquet as pq

        acc: dict[str, list] = {}
        size: dict[str, int] = {}

        def flush(colname: str):
            tbl = pa.concat_tables(acc.pop(colname))
            size.pop(colname)
            rel = os.path.join(
                rel_data, f"column={colname}", f"part-{uuid.uuid4().hex}.parquet"
            )
            full = os.path.join(table_dir, rel)
            os.makedirs(os.path.dirname(full), exist_ok=True)
            # page blobs are already compressed by the encode job
            pq.write_table(tbl.drop_columns(["column"]), full, compression="none")
            body = tbl.filter(pc.greater_equal(tbl["page"], 0))
            return pa.RecordBatch.from_pylist(
                [
                    {
                        "column": colname,
                        "file": rel,
                        "rows": pc.sum(body["n_rows"]).as_py() or 0,
                        "raw_bytes": pc.sum(body["raw_bytes"]).as_py() or 0,
                        "encoded_bytes": pc.sum(body["encoded_bytes"]).as_py() or 0,
                        "pages": body.num_rows,
                    }
                ]
            )

        for b in batches:
            t = pa.Table.from_batches([b])
            if t.num_rows == 0:
                continue
            for colname in pc.unique(t["column"]).to_pylist():
                sub = t.filter(pc.equal(t["column"], colname))
                acc.setdefault(colname, []).append(sub)
                size[colname] = size.get(colname, 0) + (
                    pc.sum(sub["encoded_bytes"]).as_py() or 0
                )
                if size[colname] >= _SINK_FLUSH_BYTES:
                    yield flush(colname)
        for colname in list(acc):
            yield flush(colname)

    return (
        pages.repartition(n_sink, "column", "split_id")
        .mapInArrow(write_task, _MANIFEST_ROW_SCHEMA)
        .collect()
    )


def table_append(
    spark: SparkSession,
    df: DataFrame,
    table_dir: str,
    codec: str = "auto",
    page_compression: str | None = None,
    sink_partitions: int | None = None,
    io: TableIO | None = None,
    extra_manifest: dict | None = None,
    allow_dirty: bool = False,
) -> dict:
    """Encode ``df`` and commit it as a new snapshot. First append creates
    the table and pins its schema; later appends must match it exactly
    (Iceberg checks schema compatibility at commit). Returns the committed
    manifest. ``extra_manifest`` entries are recorded verbatim in the
    manifest (the streaming sink stores its batch id there for exactly-once
    replay). ``allow_dirty`` permits writing into a snapshot directory that
    holds orphan files from a crashed earlier attempt (file names are
    attempt-unique and manifests list exact files, so orphans stay
    invisible — Iceberg's orphan-file situation; a maintenance janitor may
    reclaim them). The streaming sink sets it for automatic retry; the
    interactive path keeps the refusal as a guard against surprises."""
    io = io or _DEFAULT_IO
    schema_rows = [
        (f.name, spark_type_to_ptype(f.dataType)) for f in df.schema.fields
    ]
    parent = current_snapshot_id(table_dir, io)
    if parent is not None:
        prev = read_snapshot_manifest(table_dir, parent, io)
        if prev["schema"] != dict(schema_rows):
            raise ValueError(
                f"append schema {dict(schema_rows)} != table schema "
                f"{prev['schema']}"
            )
        snap_id = parent + 1
        inherited = prev["files"]
    else:
        snap_id = 1
        inherited = []

    # key=value dir name: Spark partition discovery then accepts a multi-
    # snapshot file list under one basePath (and `snap` prunes like any
    # partition column)
    rel_data = f"data/snap={snap_id}"
    data_dir = os.path.join(table_dir, rel_data)
    # refuse a dirty uncommitted snapshot directory (a crashed append's
    # orphans) rather than silently absorbing or shadowing its files
    if not allow_dirty and io.prefix_nonempty(data_dir):
        raise FileExistsError(
            f"{data_dir} already holds files but snapshot {snap_id} was "
            "never committed; clean up the orphaned directory first"
        )
    pages = encode_table(df, codec=codec, page_compression=page_compression)
    n_sink = sink_partitions or spark.sparkContext.defaultParallelism
    file_rows = _sink_pages(pages, table_dir, rel_data, n_sink)

    new_files = sorted(r["file"] for r in file_rows)
    lineage: dict[str, dict] = {}
    for r in file_rows:
        d = lineage.setdefault(
            r["column"], {"rows": 0, "raw_bytes": 0, "encoded_bytes": 0, "pages": 0}
        )
        d["rows"] += int(r["rows"])
        d["raw_bytes"] += int(r["raw_bytes"])
        d["encoded_bytes"] += int(r["encoded_bytes"])
        d["pages"] += int(r["pages"])
    manifest = {
        "snapshot_id": snap_id,
        "parent_id": parent,
        "operation": "append",
        "schema": dict(schema_rows),
        "files": inherited + new_files,
        "added_files": len(new_files),
        "lineage": lineage,
        **(extra_manifest or {}),
    }
    io.put_atomic(_snap_path(table_dir, snap_id), json.dumps(manifest, indent=1))
    # the version hint is the commit: readers only see snapshots it reaches
    io.put_atomic(
        os.path.join(_meta_dir(table_dir), "version-hint.text"), str(snap_id)
    )
    return manifest


def table_read_pages(
    spark: SparkSession,
    table_dir: str,
    snapshot_id: int | None = None,
    io: TableIO | None = None,
) -> DataFrame:
    """Page-table DataFrame of exactly the files in the given snapshot
    (default: current). Explicit file list + basePath: no directory
    listing, and `column=` partition pruning still applies."""
    m = read_snapshot_manifest(table_dir, snapshot_id, io)
    if not m["files"]:
        raise ValueError(f"snapshot {m['snapshot_id']} has no data files")
    paths = [os.path.join(table_dir, p) for p in m["files"]]
    pages = spark.read.option("basePath", os.path.join(table_dir, "data")).parquet(
        *paths
    )
    # decode groups by (split_id, batch_id); different snapshots reuse the
    # same encode split ids, so namespace them by snapshot — otherwise a
    # multi-snapshot read can merge two unrelated chunks into one decode
    # group and mispair columns (found by the r5 oracle gate)
    return pages.withColumn(
        "split_id",
        (F.col("snap").cast("long") * F.lit(1 << 20) + F.col("split_id"))
        .cast("int"),
    ).drop("snap")


def table_read(
    spark: SparkSession,
    table_dir: str,
    snapshot_id: int | None = None,
    columns: list[str] | None = None,
    io: TableIO | None = None,
) -> DataFrame:
    """Decoded rows at a snapshot (time travel when ``snapshot_id`` names an
    older one). ptypes come from the snapshot manifest — no metadata job."""
    m = read_snapshot_manifest(table_dir, snapshot_id, io)
    ptypes = m["schema"]
    cols = columns or list(ptypes)
    pages = table_read_pages(spark, table_dir, snapshot_id, io)
    return decode_table(pages, cols, ptypes={c: ptypes[c] for c in cols})
