"""Round-3 fixes: ciphertext-only CRC + withheld stats under encryption,
footer-key (PARE analog) manifest encryption + rotation, stable resume keys
for the worker-read job, heterogeneous-schema refusal, distributed split
planning, and the interop writer's list-codec guard."""

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from pq_engine.spark import crypto
from pq_engine.spark.engine import (
    decode_table,
    encode_parquet_files,
    encode_table,
    plan_parquet_splits,
    read_job_ptypes,
    run_encode_files_job,
    table_ptypes,
)

needs_aes = pytest.mark.skipif(not crypto.available(), reason="no AES backend")


def _docs(spark, n=400):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("value-"), (F.col("id") % 37).cast("string")).alias("text"),
    )


# ------------------------------------------------------------------ crypto


@needs_aes
def test_encrypted_pages_hide_plaintext_crc_and_stats(spark):
    import zlib

    df = _docs(spark)
    plain_pages = encode_table(df).filter(F.col("page") >= 0).collect()
    key = bytes(range(16))
    enc_pages = (
        crypto.encrypt_pages(encode_table(df), {"text": key})
        .filter((F.col("column") == "text") & (F.col("page") >= 0))
        .collect()
    )
    plain_crcs = {
        (r["split_id"], r["batch_id"], r["page"]): r["crc32"]
        for r in plain_pages
        if r["column"] == "text"
    }
    for r in enc_pages:
        # crc must cover the ciphertext, not leak a plaintext checksum
        assert r["crc32"] == zlib.crc32(bytes(r["data"])) & 0xFFFFFFFF
        assert r["crc32"] != plain_crcs[(r["split_id"], r["batch_id"], r["page"])]
        assert r["min"] is None and r["max"] is None and r["ndv"] == -1
    # decrypt restores a decodable table (plaintext crc recomputed post-auth)
    dec = crypto.decrypt_pages(
        crypto.encrypt_pages(encode_table(df), {"text": key}), {"text": key}
    )
    back = decode_table(dec, ["doc_id", "text"], ptypes=table_ptypes(df))
    assert back.orderBy("doc_id").collect() == df.orderBy("doc_id").collect()


@needs_aes
def test_footer_manifest_roundtrip_and_auth():
    rows = [("url", "string"), ("warc_ts", "timestamp_us"), ("html", "binary")]
    key = bytes(range(16, 32))
    blob = crypto.encrypt_footer_manifest(rows, key)
    assert blob.startswith(crypto.FOOTER_MAGIC)  # PARE analog magic
    assert crypto.decrypt_footer_manifest(blob, key) == rows
    with pytest.raises(Exception):
        crypto.decrypt_footer_manifest(blob, bytes(16))  # wrong key
    tampered = blob[:-1] + bytes([blob[-1] ^ 1])
    with pytest.raises(Exception):
        crypto.decrypt_footer_manifest(tampered, key)
    with pytest.raises(ValueError):
        crypto.decrypt_footer_manifest(b"PAR1" + blob[6:], key)  # wrong magic


@needs_aes
def test_key_rotation_without_decode(spark):
    df = _docs(spark)
    old, new = bytes(range(16)), bytes(range(16, 32))
    enc = crypto.encrypt_pages(encode_table(df), {"text": old})
    rotated = crypto.rotate_column_keys(enc, {"text": old}, {"text": new})
    # old key no longer decrypts
    with pytest.raises(Exception):
        decode_table(
            crypto.decrypt_pages(rotated, {"text": old}),
            ["doc_id", "text"],
            ptypes=table_ptypes(df),
        ).collect()
    back = decode_table(
        crypto.decrypt_pages(rotated, {"text": new}),
        ["doc_id", "text"],
        ptypes=table_ptypes(df),
    )
    assert back.orderBy("doc_id").collect() == df.orderBy("doc_id").collect()


@needs_aes
def test_job_with_encrypted_footer(spark, tmp_path):
    from pq_engine.spark.engine import run_encode_job

    df = _docs(spark, 300)
    out = str(tmp_path / "job")
    fkey = bytes(range(32))
    run_encode_job(spark, df, out, footer_key=fkey)
    assert os.path.exists(os.path.join(out, "schema.enc"))
    assert not os.path.exists(os.path.join(out, "schema"))
    with pytest.raises(PermissionError):
        read_job_ptypes(spark, out)  # no key → refused, like PARE readers
    ptypes = read_job_ptypes(spark, out, footer_key=fkey)
    assert ptypes == {"doc_id": "int64", "text": "string"}
    pages = spark.read.parquet(os.path.join(out, "pages"))
    back = decode_table(pages, ["doc_id", "text"], ptypes=ptypes)
    assert back.count() == 300


# --------------------------------------------------------- split planning


def _write_inputs(tmp_path, n_files=3, rows=100, extra_col=False):
    paths = []
    for i in range(n_files):
        cols = {
            "id": pa.array(range(i * rows, (i + 1) * rows), pa.int64()),
            "v": pa.array([f"s{j % 11}" for j in range(rows)]),
        }
        if extra_col and i == n_files - 1:
            cols["z"] = pa.array(np.zeros(rows, np.float64))
        p = str(tmp_path / f"part-{i}.parquet")
        pq.write_table(pa.table(cols), p, row_group_size=40)
        paths.append(p)
    return paths


def test_plan_parquet_splits_local_and_distributed(spark, tmp_path):
    files = _write_inputs(tmp_path, n_files=5)
    local = plan_parquet_splits(spark, files, distribute_threshold=64)
    distributed = plan_parquet_splits(spark, files, distribute_threshold=2)
    assert local == distributed
    assert all(n == 3 for _, n in local)  # 100 rows / 40-row groups


def test_plan_refuses_heterogeneous_schema(spark, tmp_path):
    files = _write_inputs(tmp_path, n_files=3, extra_col=True)
    with pytest.raises(ValueError, match="heterogeneous"):
        plan_parquet_splits(spark, files, distribute_threshold=64)
    with pytest.raises(ValueError, match="heterogeneous"):
        plan_parquet_splits(spark, files, distribute_threshold=1)


def test_files_job_resume_refuses_changed_input(spark, tmp_path):
    indir = tmp_path / "in"
    indir.mkdir()
    _write_inputs(indir, n_files=2)
    out = str(tmp_path / "out")
    r1 = run_encode_files_job(spark, str(indir), out)
    assert r1["pages"] > 0
    # unchanged input → resume is a no-op (idempotent), not a duplicate
    r2 = run_encode_files_job(spark, str(indir), out)
    assert r2["pages"] == r1["pages"]
    # a new file shifts the ordinal split ids → resume must refuse
    extra = pa.table({"id": pa.array([1], pa.int64()), "v": pa.array(["x"])})
    pq.write_table(extra, str(indir / "a-new-first.parquet"), row_group_size=40)
    with pytest.raises(ValueError, match="cannot resume"):
        run_encode_files_job(spark, str(indir), out)


def test_encode_parquet_files_distributed_plan_matches(spark, tmp_path):
    files = _write_inputs(tmp_path, n_files=4)
    pages_a = encode_parquet_files(spark, str(tmp_path)).orderBy(
        "split_id", "batch_id", "column", "page"
    )
    plan = plan_parquet_splits(spark, files, distribute_threshold=1)
    pages_b = encode_parquet_files(spark, str(tmp_path), split_plan=plan).orderBy(
        "split_id", "batch_id", "column", "page"
    )
    a = [(r["split_id"], r["column"], r["page"], bytes(r["data"])) for r in pages_a.collect()]
    b = [(r["split_id"], r["column"], r["page"], bytes(r["data"])) for r in pages_b.collect()]
    assert a == b


# ------------------------------------------------------------- interop guard


def test_interop_writer_rejects_list_codec(tmp_path):
    from pq_engine.interop.parquet_writer import write_parquet
    from pq_engine.nested import ListColumn

    lc = ListColumn(
        np.array([0, 2, 4], np.int64), None,
        np.arange(4, dtype=np.int64), None,
    )
    with pytest.raises(ValueError, match="codec"):
        write_parquet(
            str(tmp_path / "x.parquet"),
            [{"name": "l", "ptype": "list<int64>", "codec": "delta", "values": lc}],
            2,
        )
