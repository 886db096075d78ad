"""Modular AES-GCM page encryption (parquet-hadoop crypto analog)."""

import pytest
from pyspark.sql import functions as F

from pq_engine.spark import crypto
from pq_engine.spark.crypto import decrypt_pages, encrypt_pages
from pq_engine.spark.engine import decode_table, encode_table, table_ptypes

pytestmark = pytest.mark.skipif(
    not crypto.available(), reason="AES-GCM backend not available"
)

KEY = bytes(range(16))
KEY2 = bytes(range(16, 32))


@pytest.fixture(scope="module")
def secret_df(spark):
    return spark.createDataFrame(
        [(i, f"secret-{i}", float(i) / 3) for i in range(2000)],
        "id long, s string, v double",
    ).coalesce(1)


def test_encrypt_decrypt_roundtrip(spark, secret_df):
    pages = encode_table(secret_df, with_bloom=True)
    enc = encrypt_pages(pages, {"s": KEY, "v": KEY2})
    back = decode_table(
        decrypt_pages(enc, {"s": KEY, "v": KEY2}),
        ["id", "s", "v"],
        ptypes=table_ptypes(secret_df),
    )
    assert back.exceptAll(secret_df).count() == 0
    assert back.count() == 2000


def test_unkeyed_columns_pass_through(spark, secret_df):
    pages = encode_table(secret_df)
    enc = encrypt_pages(pages, {"s": KEY}).cache()
    # id pages untouched and still directly decodable
    comps = {
        r["compression"]
        for r in enc.filter(F.col("column") == "id").select("compression").distinct().collect()
    }
    assert comps == {"none"}
    # but decoding the encrypted column without decrypting must fail
    with pytest.raises(Exception):
        decode_table(enc, ["s"], ptypes={"s": "string"}).collect()
    enc.unpersist()


def test_wrong_key_and_tamper_fail(spark, secret_df):
    pages = encode_table(secret_df, columns=["id", "s"])
    enc = encrypt_pages(pages, {"s": KEY}).cache()
    with pytest.raises(Exception):  # InvalidTag surfaces from the executor
        decode_table(
            decrypt_pages(enc, {"s": KEY2}), ["id", "s"],
            ptypes={"id": "int64", "s": "string"},
        ).collect()
    # page-swap tamper: move a ciphertext to another page ordinal → AAD
    # mismatch → authentication failure
    swapped = enc.withColumn(
        "page",
        F.when(F.col("page") == 0, F.lit(1))
        .when(F.col("page") == 1, F.lit(0))
        .otherwise(F.col("page")),
    )
    if enc.filter("column = 's' AND page = 1").count():
        with pytest.raises(Exception):
            decode_table(
                decrypt_pages(swapped, {"s": KEY}), ["id", "s"],
                ptypes={"id": "int64", "s": "string"},
            ).collect()
    enc.unpersist()


def test_masked_reencrypt(spark, secret_df):
    """ParquetRewriter masked re-encrypt: hash-mask the column, then encrypt."""
    import hashlib

    from pq_engine.spark.rewrite import mask_hash

    pages = encode_table(secret_df.select("id", "s"))
    enc = encrypt_pages(mask_hash(pages, "s"), {"s": KEY})
    back = decode_table(
        decrypt_pages(enc, {"s": KEY}), ["id", "s"],
        ptypes={"id": "int64", "s": "string"},
    )
    row = back.filter(F.col("id") == 7).collect()[0]
    assert row["s"] == hashlib.md5(b"secret-7").hexdigest()


def test_decrypt_restores_page_stats(spark, secret_df):
    """Stats ride inside the authenticated ciphertext: hidden at rest,
    bit-identical after decrypt — so a decrypted table prunes exactly like
    an unencrypted one."""
    pages = encode_table(secret_df).cache()
    plain = {
        (r["column"], r["page"]): (r["min"], r["max"], r["ndv"])
        for r in pages.collect()
    }
    enc = encrypt_pages(pages, {"s": KEY, "v": KEY2}).cache()
    for r in enc.filter(F.col("column").isin("s", "v")).collect():
        assert r["min"] is None and r["max"] is None and r["ndv"] == -1
    dec = decrypt_pages(enc, {"s": KEY, "v": KEY2})
    restored = {
        (r["column"], r["page"]): (r["min"], r["max"], r["ndv"])
        for r in dec.collect()
    }
    assert restored == plain
    # and stats pruning works on the decrypted frame
    from pq_engine.spark.engine import prune_pages_by_stats

    kept = prune_pages_by_stats(dec, "v", lo=1e9, numeric=True)
    assert kept.filter(F.col("page") >= 0).count() == 0
