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


class _CountingIO:
    """TableIO wrapper recording every metadata operation — proves the
    append/read paths touch metadata ONLY through the shim."""

    def __init__(self):
        from pq_engine.spark.table import TableIO

        self._inner = TableIO()
        self.calls = []

    def get_text(self, path):
        self.calls.append(("get", path))
        return self._inner.get_text(path)

    def put_atomic(self, path, payload):
        self.calls.append(("put", path))
        self._inner.put_atomic(path, payload)

    def exists(self, path):
        self.calls.append(("exists", path))
        return self._inner.exists(path)

    def prefix_nonempty(self, path):
        self.calls.append(("list", path))
        return self._inner.prefix_nonempty(path)


class _CrashingIO(_CountingIO):
    """Fails the first manifest put — simulates dying between the data
    write and the commit."""

    def __init__(self):
        super().__init__()
        self.armed = True

    def put_atomic(self, path, payload):
        if self.armed and path.endswith(".json"):
            self.armed = False
            raise RuntimeError("injected crash before manifest commit")
        super().put_atomic(path, payload)


def test_metadata_only_through_shim_and_no_walk(spark, docs, tmp_path):
    """Object-store readiness: every metadata read/write goes through the
    TableIO shim, the manifest file list comes from the sink job (not a
    directory walk), and the data dir holds ONLY manifest-listed files."""
    td = str(tmp_path / "t")
    io = _CountingIO()
    m = table_append(spark, docs, td, io=io)
    puts = [p for op, p in io.calls if op == "put"]
    assert any(p.endswith("snap-00001.json") for p in puts)
    assert any(p.endswith("version-hint.text") for p in puts)
    # read path: manifest + hint via the shim
    io.calls.clear()
    assert table_read(spark, td, io=io).count() == docs.count()
    assert any(op == "get" for op, _ in io.calls)
    # every file under data/ is in the manifest (no committer temp/_SUCCESS
    # droppings — tasks write final immutable files directly)
    on_disk = set()
    for root, _dirs, names in os.walk(os.path.join(td, "data")):
        for n in names:
            on_disk.add(os.path.relpath(os.path.join(root, n), td))
    assert on_disk == set(m["files"])


def test_append_crash_before_manifest_is_invisible(spark, docs, tmp_path):
    """Dying after the data write but before the manifest put leaves the
    table at the previous snapshot; a default retry refuses the dirty dir,
    an allow_dirty retry commits and reads back exactly once."""
    td = str(tmp_path / "t")
    table_append(spark, docs.filter("doc_id < 10"), td)
    io = _CrashingIO()
    with pytest.raises(RuntimeError, match="injected crash"):
        table_append(spark, docs.filter("doc_id >= 10"), td, io=io)
    assert current_snapshot_id(td) == 1
    assert {r.doc_id for r in table_read(spark, td).collect()} == set(range(10))
    with pytest.raises(FileExistsError):
        table_append(spark, docs.filter("doc_id >= 10"), td)
    m = table_append(spark, docs.filter("doc_id >= 10"), td, allow_dirty=True)
    assert m["snapshot_id"] == 2
    got = {r.doc_id: (r.lang, r.n_chars) for r in table_read(spark, td).collect()}
    want = {r.doc_id: (r.lang, r.n_chars) for r in docs.collect()}
    assert got == want  # orphans from the crashed attempt stay invisible


def test_manifest_json_shape(spark, docs, tmp_path):
    td = str(tmp_path / "t")
    table_append(spark, docs, td)
    with open(os.path.join(td, "metadata", "snap-00001.json")) as f:
        m = json.load(f)
    assert m["operation"] == "append"
    assert m["schema"] == {"doc_id": "int64", "lang": "string", "n_chars": "int64"}
