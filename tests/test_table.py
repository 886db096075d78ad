"""Iceberg-flavored snapshot table layer: append commits, time travel,
schema pinning, crash atomicity (uncommitted files invisible)."""

import json
import os

import pytest
from pyspark.sql import functions as F

from pq_engine.spark.table import (
    current_snapshot_id,
    read_snapshot_manifest,
    table_append,
    table_read,
    table_read_pages,
    table_snapshots,
)


@pytest.fixture()
def docs(spark):
    return spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        "doc_id", "lang", "n_chars"
    )


def test_append_and_read_roundtrip(spark, docs, tmp_path):
    td = str(tmp_path / "t")
    m = table_append(spark, docs, td)
    assert m["snapshot_id"] == 1 and m["parent_id"] is None
    got = {r.doc_id: (r.lang, r.n_chars) for r in table_read(spark, td).collect()}
    want = {r.doc_id: (r.lang, r.n_chars) for r in docs.collect()}
    assert got == want
    # lineage rollup counts every row for every column
    assert m["lineage"]["lang"]["rows"] == len(want)


def test_time_travel_snapshot_isolation(spark, docs, tmp_path):
    td = str(tmp_path / "t")
    table_append(spark, docs.filter("doc_id < 20"), td)
    before = {r.doc_id for r in table_read(spark, td).collect()}
    m2 = table_append(spark, docs.filter("doc_id >= 20"), td)
    assert m2["snapshot_id"] == 2 and m2["parent_id"] == 1
    # old snapshot still reads EXACTLY its original rows
    snap1 = {r.doc_id for r in table_read(spark, td, snapshot_id=1).collect()}
    assert snap1 == before
    # VALUES must pair correctly across snapshots too: snapshots reuse
    # encode split ids, and without per-snapshot namespacing the decode
    # can merge two unrelated chunks and mispair columns (r5 bug)
    now = {r.doc_id: (r.lang, r.n_chars) for r in table_read(spark, td).collect()}
    want = {r.doc_id: (r.lang, r.n_chars) for r in docs.collect()}
    assert now == want
    ids = [s["snapshot_id"] for s in table_snapshots(td)]
    assert ids == [1, 2]


def test_append_schema_pinned(spark, docs, tmp_path):
    td = str(tmp_path / "t")
    table_append(spark, docs, td)
    with pytest.raises(ValueError, match="schema"):
        table_append(spark, docs.withColumn("extra", F.lit(1)), td)


def test_uncommitted_files_invisible(spark, docs, tmp_path):
    """Crash contract: data files without a committed manifest don't exist
    for readers — the version hint is the commit point."""
    td = str(tmp_path / "t")
    table_append(spark, docs.filter("doc_id < 10"), td)
    # simulate a crashed append: snapshot 2's data landed, no manifest/hint
    from pq_engine.spark.engine import encode_table

    crash_dir = os.path.join(td, "data", "snap=2")
    encode_table(docs.filter("doc_id >= 10")).write.partitionBy("column").parquet(
        crash_dir
    )
    assert current_snapshot_id(td) == 1
    assert {r.doc_id for r in table_read(spark, td).collect()} == set(range(10))
    # and the NEXT append commits cleanly as snapshot 2's successor would:
    # it must refuse to reuse the dirty directory rather than absorb it
    with pytest.raises(Exception):
        table_append(spark, docs.filter("doc_id >= 10"), td)


def test_manifest_files_are_relative_and_complete(spark, docs, tmp_path):
    td = str(tmp_path / "t")
    table_append(spark, docs.filter("doc_id < 10"), td)
    table_append(spark, docs.filter("doc_id >= 10 AND doc_id < 30"), td)
    m = read_snapshot_manifest(td)
    assert all(not p.startswith("/") for p in m["files"])
    assert m["added_files"] < len(m["files"])  # inherits parent files
    n_pages_listed = table_read_pages(spark, td).count()
    assert n_pages_listed > 0
    # snapshot 1's page list is a strict subset
    assert table_read_pages(spark, td, 1).count() < n_pages_listed


def test_manifest_json_shape(spark, docs, tmp_path):
    td = str(tmp_path / "t")
    table_append(spark, docs, td)
    with open(os.path.join(td, "metadata", "snap-00001.json")) as f:
        m = json.load(f)
    assert m["operation"] == "append"
    assert m["schema"] == {"doc_id": "int64", "lang": "string", "n_chars": "int64"}
