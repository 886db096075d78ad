"""Tests for the extended CLI (parquet-cli command-breadth analog:
column-index, column-size, bloom-filter, scan, prune, mask,
trans-compression, from-csv)."""

import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from pq_engine.cli import main as cli_main
from pq_engine.spark.engine import decode_table, encode_table, table_ptypes


@pytest.fixture(scope="module")
def pages_dir(spark):
    out = tempfile.mkdtemp(prefix="pq_cli2_")
    df = spark.createDataFrame(
        [(i, f"key{i % 10}", float(i)) for i in range(2000)],
        "id long, k string, v double",
    ).coalesce(1)
    encode_table(df, page_rows=250, with_bloom=True).write.parquet(f"{out}/pages")
    yield f"{out}/pages"
    shutil.rmtree(out, ignore_errors=True)


def run(capsys, *argv):
    cli_main(list(argv))
    return capsys.readouterr().out


def test_scan(pages_dir, capsys):
    out = run(capsys, "scan", pages_dir)
    assert "records=2000" in out and "columns=3" in out


def test_column_size(pages_dir, capsys):
    out = run(capsys, "column-size", pages_dir)
    assert "id" in out and "share" in out


def test_column_index(pages_dir, capsys):
    out = run(capsys, "column-index", pages_dir, "--column", "id")
    assert "boundary_order=ASCENDING" in out
    assert "first_row=" in out


def test_bloom_filter_probe(pages_dir, capsys):
    out = run(capsys, "bloom-filter", pages_dir, "--column", "k", "--value", "key3")
    assert "maybe_contains(key3)=True" in out
    out = run(capsys, "bloom-filter", pages_dir, "--column", "k", "--value", "nope")
    assert "maybe_contains(nope)=False" in out


def test_prune_cli(pages_dir, capsys, spark):
    out_dir = tempfile.mkdtemp(prefix="pq_prune_")
    try:
        run(capsys, "prune", pages_dir, "--out", out_dir, "--columns", "id,k")
        pruned = spark.read.parquet(out_dir)
        assert set(r["column"] for r in pruned.select("column").distinct().collect()) == {"id", "k"}
        back = decode_table(pruned, ["id", "k"], ptypes={"id": "int64", "k": "string"})
        assert back.count() == 2000
    finally:
        shutil.rmtree(out_dir, ignore_errors=True)


def test_mask_cli_hash(pages_dir, capsys, spark):
    out_dir = tempfile.mkdtemp(prefix="pq_mask_")
    try:
        run(capsys, "mask", pages_dir, "--out", out_dir, "--column", "k", "--mode", "hash")
        masked = spark.read.parquet(out_dir)
        back = decode_table(
            masked, ["id", "k"], ptypes={"id": "int64", "k": "string"}
        )
        row = back.filter(F.col("id") == 0).collect()[0]
        import hashlib

        assert row["k"] == hashlib.md5(b"key0").hexdigest()
    finally:
        shutil.rmtree(out_dir, ignore_errors=True)


def test_trans_compression_cli(pages_dir, capsys, spark):
    out_dir = tempfile.mkdtemp(prefix="pq_tc_")
    try:
        run(capsys, "trans-compression", pages_dir, "--out", out_dir, "--to", "zstd")
        re_pages = spark.read.parquet(out_dir)
        comps = {r["compression"] for r in re_pages.filter("page >= 0").select("compression").distinct().collect()}
        assert comps == {"zstd"}
        back = decode_table(
            re_pages, ["id", "k", "v"],
            ptypes={"id": "int64", "k": "string", "v": "float64"},
        )
        assert back.count() == 2000
    finally:
        shutil.rmtree(out_dir, ignore_errors=True)


def test_from_csv_cli(capsys, spark):
    out_dir = tempfile.mkdtemp(prefix="pq_csv_")
    csv_path = os.path.join(out_dir, "in.csv")
    try:
        with open(csv_path, "w") as f:
            f.write("name,n\n")
            for i in range(500):
                f.write(f"row{i % 7},{i}\n")
        run(capsys, "from-csv", csv_path, "--out", f"{out_dir}/pages")
        pages = spark.read.parquet(f"{out_dir}/pages")
        back = decode_table(pages, ["name", "n"], ptypes={"name": "string", "n": "int64"})
        assert back.count() == 500
        assert back.filter(F.col("name") == "row3").count() == len([i for i in range(500) if i % 7 == 3])
    finally:
        shutil.rmtree(out_dir, ignore_errors=True)
