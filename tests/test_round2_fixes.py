"""Regression tests for the round-1 VERDICT/ADVICE findings:

* bloom keys for 32-bit ptypes (int32/float32) — previously viewed pairs of
  values as one u64 key (crash on odd length, false negatives on even);
* string stats truncation at codepoint boundaries — previously byte-truncated
  mid-codepoint + errors='replace', which could make the stored bound unsound
  and silently prune matching chunks;
* binary stats omitted (lossy decode cannot give sound bounds);
* stats pruning ignores index rows (bloom page=-1 rows used to keep every
  chunk alive, silently disabling the pushdown);
* integer-exact stats compare (double rounds above 2^53);
* simhash banding honors the requested hamming radius (chunks=h+1);
* LSH bucket caps bound the candidate self-join.
"""

import numpy as np
import pytest
from pyspark.sql import Row, functions as F, types as T

from pq_engine.spark.engine import (
    bloom_key_for_value,
    _bloom_keys,
    decode_table,
    encode_table,
    prune_pages_by_bloom,
    prune_pages_by_stats,
)


# ------------------------------------------------------------- bloom 32-bit


def test_bloom_keys_int32_odd_length():
    vals = np.array([1, 2, 3], dtype=np.int32)  # odd length used to raise
    keys = _bloom_keys(vals, "int32")
    assert len(keys) == 3
    for v in vals:
        assert bloom_key_for_value(int(v), "int32") in keys


def test_bloom_keys_float32_matches_probe():
    vals = np.array([1.5, -2.25, 3.75, 0.0], dtype=np.float32)
    keys = _bloom_keys(vals, "float32")
    assert len(keys) == 4
    for v in vals:
        assert bloom_key_for_value(float(v), "float32") in keys
    # a value NOT in the column maps elsewhere
    assert bloom_key_for_value(9.125, "float32") not in keys


def test_bloom_pushdown_int32_end_to_end(spark):
    df = spark.createDataFrame(
        [(i, i % 7) for i in range(1, 1002)], "id long, k int"
    ).coalesce(1)
    pages = encode_table(df, page_rows=100, with_bloom=True)
    pruned = prune_pages_by_bloom(pages, "k", 3)
    out = decode_table(pruned, ["id", "k"]).filter(F.col("k") == 3)
    assert out.count() == df.filter(F.col("k") == 3).count()


# ------------------------------------------------------- stats truncation


def test_string_stats_truncate_codepoint_sound():
    from pq_engine.pages import encode_column
    from pq_engine.kernels.ragged import RaggedBytes

    # > 64-char strings with multibyte chars straddling the old byte cutoff
    vals = ["ä" * 80, "ä" * 63 + "zzz", "a" * 100]
    col = RaggedBytes.from_pylist([v.encode() for v in vals])
    pages = encode_column(col, "string", codec="plain")
    meta = pages[0][0]
    assert meta["min"] <= min(vals)
    assert meta["max"] >= max(vals)
    assert "�" not in meta["min"] + meta["max"]


def test_truncate_max_increments_codepoint():
    from pq_engine.pages import _truncate_max_str, _truncate_min_str, STAT_TRUNC

    s = "x" * 70
    t = _truncate_max_str(s)
    assert len(t) <= STAT_TRUNC and t > s
    assert _truncate_min_str(s) <= s


def test_binary_stats_omitted():
    from pq_engine.pages import encode_column
    from pq_engine.kernels.ragged import RaggedBytes

    col = RaggedBytes.from_pylist([bytes([0xFF, 0xFE, i]) for i in range(50)])
    meta = encode_column(col, "binary", codec="plain")[0][0]
    assert meta["min"] is None and meta["max"] is None
    assert meta["ndv"] == 50


def test_stats_prune_keeps_boundary_rows(spark):
    # rows exactly equal to the hi bound must survive pruning even when the
    # page max was truncated (previously U+FFFD corruption could drop them)
    long_hi = "m" * 80
    rows = [("a" * 80,), (long_hi,), ("z" * 80,)]
    df = spark.createDataFrame(rows, "s string").coalesce(1)
    pages = encode_table(df, page_rows=1)
    pruned = prune_pages_by_stats(pages, "s", lo=long_hi, hi=long_hi)
    out = decode_table(pruned, ["s"]).filter(F.col("s") == long_hi)
    assert out.count() == 1


# --------------------------------------------- stats pruning vs index rows


def test_stats_pruning_works_with_bloom_rows(spark):
    df = spark.createDataFrame(
        [(i, f"k{i // 100:03d}") for i in range(1000)], "id long, s string"
    ).repartitionByRange(10, "s")
    pages = encode_table(df, page_rows=100, with_bloom=True).cache()
    pruned = prune_pages_by_stats(pages, "s", lo="k000", hi="k000")
    # bloom rows (page = -1) must not resurrect chunks: only chunks whose
    # data-page stats overlap survive
    n_chunks = pruned.select("split_id", "batch_id").distinct().count()
    total = pages.select("split_id", "batch_id").distinct().count()
    assert n_chunks < total
    out = decode_table(pruned, ["id", "s"]).filter(F.col("s") == "k000")
    assert out.count() == 100
    pages.unpersist()


def test_stats_prune_integer_exact_above_2p53(spark):
    big = (1 << 53) + 1  # rounds to 2^53 as double
    df = spark.createDataFrame([(1, big)], "id long, v long").coalesce(1)
    pages = encode_table(df, columns=["id", "v"])
    pruned = prune_pages_by_stats(pages, "v", lo=big, hi=big, numeric=True)
    out = decode_table(pruned, ["id", "v"])
    assert out.count() == 1  # double cast would prune the only row


# ----------------------------------------------------------- simhash radius


def test_simhash_banding_matches_radius(spark):
    from pq_engine.pipeline.dedup import pairs_from_simhash

    # hamming-8 pair with the differing bits spread over ALL FOUR of the old
    # 16-bit chunks (2 per chunk) — the r1 4-chunk banding missed this pair;
    # the h+1-chunk scheme must find it by pigeonhole
    def i64(v):
        return v - (1 << 64) if v >= (1 << 63) else v

    a = 0x0123456789ABCDEF
    flip = 0
    for bit in (1, 9, 17, 25, 33, 41, 49, 57):  # 2 bits in each 16-bit chunk
        flip |= 1 << bit
    sh = spark.createDataFrame([(1, i64(a)), (2, i64(a ^ flip))], "id long, simhash long")
    pairs = pairs_from_simhash(sh, max_hamming=8).collect()
    assert len(pairs) == 1 and pairs[0]["hamming"] == 8
    # hamming <= h is ALWAYS caught, wherever the bits land — several spreads
    for bits in [(0, 8, 16, 24, 32, 40, 48, 56), (7, 15, 23, 31, 39, 47, 55, 63)]:
        flip = 0
        for bit in bits:
            flip |= 1 << bit
        sh2 = spark.createDataFrame(
            [(1, i64(a)), (2, i64(a ^ flip))], "id long, simhash long"
        )
        assert pairs_from_simhash(sh2, max_hamming=8).count() == 1


def test_simhash_chunk_widths_cover_64_bits():
    for h in (1, 3, 8, 15):
        n_chunks = h + 1
        base, extra = divmod(64, n_chunks)
        widths = [base + (1 if c < extra else 0) for c in range(n_chunks)]
        assert sum(widths) == 64 and min(widths) >= 1


# -------------------------------------------------------------- bucket cap


def test_bucket_cap_drops_hot_buckets(spark):
    from pq_engine.pipeline.dedup import minhash_lsh_pairs

    # 40 identical docs = one hot bucket per band; capped at 10 → no pairs
    rows = [Row(doc_id=i, text="identical boilerplate text " * 10) for i in range(40)]
    df = spark.createDataFrame(rows)
    capped = minhash_lsh_pairs(df, bucket_cap=10)
    assert capped.count() == 0
    uncapped = minhash_lsh_pairs(df, bucket_cap=None)
    assert uncapped.count() == 40 * 39 // 2


# ------------------------------------------------- partitioned page sink


def test_job_sink_partitioned_and_manifest(spark):
    import os
    import shutil
    import tempfile

    from pq_engine.datagen import webpages_df
    from pq_engine.spark.engine import read_job_ptypes, run_encode_job

    out = tempfile.mkdtemp(prefix="pq_sink_")
    try:
        df = webpages_df(spark, 2000, partitions=2, seed=11)
        r = run_encode_job(spark, df, out)
        # hive-partitioned by column → pruning scans only the probed column
        subdirs = [d for d in os.listdir(r["pages_path"]) if d.startswith("column=")]
        assert sorted(subdirs) == [
            "column=html", "column=lang", "column=text", "column=url", "column=warc_ts",
        ]
        ptypes = read_job_ptypes(spark, out)
        assert ptypes == {
            "url": "string", "warc_ts": "timestamp_us", "html": "binary",
            "text": "string", "lang": "string",
        }
        pages = spark.read.parquet(r["pages_path"])
        # partition filter reaches the scan (no full-table read for one column)
        plan = (
            pages.filter(F.col("column") == "lang")
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "PartitionFilters: [isnotnull(column" in plan
        back = decode_table(pages, ptypes=ptypes)
        assert back.count() == 2000
    finally:
        shutil.rmtree(out, ignore_errors=True)


# ---------------------------------------------------- chunk-level dictionary


def test_chunk_dict_small_pages_no_overhead():
    """VERDICT r1 #2: per-page dictionaries paid ~4x on small pages (lang
    ratio 0.51 at 500-row pages vs 0.14 at 20k). With one dict page per
    chunk the ratio must be page-size-independent and well under 0.2."""
    from pq_engine.kernels.ragged import RaggedBytes
    from pq_engine.pages import DICT_PAGE, decode_column, encode_column

    rng = np.random.default_rng(7)
    langs = ["en", "de", "fr", "zh", "ja", "ru"]
    vals = RaggedBytes.from_pylist(
        [langs[i].encode() for i in rng.integers(0, 6, size=20_000)]
    )
    out = encode_column(vals, "string", codec="dict", page_rows=500)
    dict_pages = [m for m, _ in out if m["page"] == DICT_PAGE]
    assert len(dict_pages) == 1 and dict_pages[0]["codec"] == "dictpage"
    enc = sum(m["encoded_bytes"] for m, _ in out)
    raw = sum(m["raw_bytes"] for m, _ in out)
    assert enc / raw < 0.2
    back, _ = decode_column(out)
    assert back == vals


def test_chunk_dict_numeric_roundtrip_with_nulls():
    from pq_engine.pages import decode_column, encode_column

    rng = np.random.default_rng(3)
    validity = rng.random(5000) >= 0.2
    vals = rng.integers(0, 50, size=int(validity.sum())).astype(np.int64)
    out = encode_column(vals, "int64", validity=validity, codec="dict", page_rows=300)
    back, back_validity = decode_column(out)
    assert np.array_equal(back, vals)
    assert np.array_equal(back_validity, validity)


def test_chunk_dict_oversized_falls_back():
    """Dict page > 1 MiB → whole chunk falls back (reference dict-size rail)."""
    from pq_engine.kernels.ragged import RaggedBytes
    from pq_engine.pages import decode_column, encode_column

    vals = RaggedBytes.from_pylist(
        [f"unique-value-{i:07d}-{'x' * 120}".encode() for i in range(10_000)]
    )
    out = encode_column(vals, "string", codec="dict", page_rows=2000)
    assert all(m["codec"] != "dictpage" for m, _ in out)
    back, _ = decode_column(out)
    assert back == vals


# -------------------------------------------------- date32 / timestamp_ntz


def test_date_and_ntz_type_fidelity(spark):
    """decode_table must restore DateType/TimestampNTZType exactly —
    r1 mapped DateType to int32 and decoded it back as IntegerType."""
    import datetime

    from pyspark.sql import types as T

    rows = [
        (1, datetime.date(2024, 1, 15), datetime.datetime(2024, 1, 15, 10, 30, 0, 123456)),
        (2, datetime.date(1969, 12, 31), datetime.datetime(1969, 12, 31, 23, 59, 59)),
        (3, None, None),
    ]
    schema = T.StructType([
        T.StructField("id", T.LongType()),
        T.StructField("d", T.DateType()),
        T.StructField("t", T.TimestampNTZType()),
    ])
    df = spark.createDataFrame(rows, schema).coalesce(1)
    from pq_engine.spark.engine import table_ptypes

    back = decode_table(encode_table(df), ["id", "d", "t"], ptypes=table_ptypes(df))
    assert back.schema["d"].dataType == T.DateType()
    assert back.schema["t"].dataType == T.TimestampNTZType()
    got = {r["id"]: (r["d"], r["t"]) for r in back.collect()}
    for rid, d, t in rows:
        assert got[rid] == (d, t)


# -------------------------------------------------------- page compression


@pytest.mark.parametrize("comp", ["zstd", "snappy", "lz4", "lz4_raw", "brotli", "zlib", None])
def test_page_compression_roundtrip(comp):
    from pq_engine.kernels.ragged import RaggedBytes
    from pq_engine.pages import decode_column, encode_column

    rng = np.random.default_rng(5)
    texts = [f"document body {i} " * int(rng.integers(1, 30)) for i in range(4000)]
    col = RaggedBytes.from_pylist([t.encode() for t in texts])
    out = encode_column(col, "string", codec="auto", page_compression=comp, page_rows=1000)
    back, _ = decode_column(out)
    assert back == col
    if comp is not None:
        raw = sum(m["raw_bytes"] for m, _ in out)
        enc = sum(m["encoded_bytes"] for m, _ in out)
        assert enc < 0.7 * raw


def test_transcode_zlib_to_zstd(spark):
    from pq_engine.spark.engine import table_ptypes
    from pq_engine.spark.rewrite import transcode_compression

    df = spark.createDataFrame(
        [(i, f"value {i % 40} padding padding padding") for i in range(3000)],
        "id long, s string",
    ).coalesce(1)
    pages = encode_table(df, page_compression="zlib")
    re_pages = transcode_compression(pages, "zstd")
    back = decode_table(re_pages, ["id", "s"], ptypes=table_ptypes(df))
    assert back.count() == 3000
    assert back.exceptAll(df).count() == 0


def test_adaptive_bloom_sized_by_ndv(spark):
    # 10k rows but only 5 distinct values → minimum-size filter, not 16 KiB
    df = spark.createDataFrame(
        [(i, f"k{i % 5}") for i in range(10_000)], "id long, s string"
    ).coalesce(1)
    pages = encode_table(df, with_bloom=True)
    bloom = pages.filter((F.col("column") == "s") & (F.col("page") == -1)).collect()
    assert len(bloom) == 1
    assert bloom[0]["encoded_bytes"] <= 64  # ndv=5 → 32-byte minimum block
    # and it still answers membership correctly
    pruned = prune_pages_by_bloom(pages, "s", "k3")
    assert pruned.count() > 0
    assert prune_pages_by_bloom(pages, "s", "absent").count() == 0


# --------------------------------------------------- page-level row ranges


def test_page_level_pruning_drops_pages_not_chunks(spark):
    from pq_engine.spark.engine import table_ptypes

    # one chunk, 10 pages of 100 rows, sorted key → page stats disjoint
    df = spark.createDataFrame(
        [(i, f"k{i // 100:03d}") for i in range(1000)], "id long, s string"
    ).coalesce(1)
    pages = encode_table(df, page_rows=100).cache()
    pruned = prune_pages_by_stats(pages, "s", lo="k003", hi="k004", level="page").cache()
    # strictly fewer DATA pages survive than exist (the chunk itself survives)
    total_pages = pages.filter(F.col("page") >= 0).count()
    kept_pages = pruned.filter(F.col("page") >= 0).count()
    assert kept_pages < total_pages
    # the probe column keeps only its 2 overlapping pages (+ id pages overlap)
    probe_kept = pruned.filter((F.col("column") == "s") & (F.col("page") >= 0)).count()
    assert probe_kept == 2
    # rowranges marker rows present
    assert pruned.filter(F.col("codec") == "rowranges").count() == 2
    # decode slices rows exactly to the surviving ranges
    out = decode_table(pruned, ["id", "s"], ptypes=table_ptypes(df))
    got = sorted(r["id"] for r in out.collect())
    assert got == list(range(300, 500))
    pages.unpersist()
    pruned.unpersist()


def test_page_level_pruning_misaligned_columns(spark):
    """Columns page at different row boundaries (byte-capped text vs fixed
    ids) — decode must still row-align via first_row."""
    from pq_engine.spark.engine import table_ptypes

    rows = [(i, "x" * 2000 if i % 3 == 0 else "y") for i in range(600)]
    df = spark.createDataFrame(rows, "id long, s string").coalesce(1)
    # small byte cap → text pages cut at varying row counts
    pages = encode_table(df, page_rows=200, page_bytes=50_000)
    pruned = prune_pages_by_stats(pages, "id", lo=100, hi=250, numeric=True, level="page")
    out = decode_table(pruned, ["id", "s"], ptypes=table_ptypes(df))
    back = {r["id"]: r["s"] for r in out.collect()}
    for i in range(100, 251):
        assert back[i] == ("x" * 2000 if i % 3 == 0 else "y")
    # conservative: everything kept matches no more than the page spans
    assert set(back) >= set(range(100, 251))


def test_page_level_pruning_fully_surviving_chunk_no_markers(spark):
    df = spark.createDataFrame([(i, "same") for i in range(500)], "id long, s string").coalesce(1)
    pages = encode_table(df, page_rows=100)
    pruned = prune_pages_by_stats(pages, "s", lo="same", hi="same", level="page")
    assert pruned.filter(F.col("codec") == "rowranges").count() == 0
    assert pruned.filter(F.col("page") >= 0).count() == pages.filter(F.col("page") >= 0).count()


def test_per_column_codec_overrides(spark):
    """Per-column writer configuration (ParquetProperties.Builder analog)."""
    from pq_engine.spark.engine import table_ptypes

    df = spark.createDataFrame(
        [(i, f"text value {i}", f"k{i % 4}") for i in range(2000)],
        "id long, t string, k string",
    ).coalesce(1)
    pages = encode_table(df, codec={"t": "fsst", "k": "dict"}).cache()
    codecs = {
        r["column"]: r["codec"]
        for r in pages.filter(F.col("page") == 0).select("column", "codec").collect()
    }
    assert codecs["t"] == "fsst" and codecs["k"] == "dict"
    back = decode_table(pages, ["id", "t", "k"], ptypes=table_ptypes(df))
    assert back.exceptAll(df).count() == 0
    pages.unpersist()


def test_decimal_roundtrip(spark):
    from decimal import Decimal

    from pyspark.sql import types as T

    from pq_engine.spark.engine import table_ptypes

    schema = T.StructType([
        T.StructField("id", T.LongType()),
        T.StructField("d", T.DecimalType(12, 2)),
    ])
    rows = [
        (1, Decimal("12345.67")),
        (2, Decimal("-0.01")),
        (3, None),
        (4, Decimal("9999999999.99")),
        (5, Decimal("0.00")),
    ]
    df = spark.createDataFrame(rows, schema).coalesce(1)
    back = decode_table(encode_table(df), ["id", "d"], ptypes=table_ptypes(df))
    assert back.schema["d"].dataType == T.DecimalType(12, 2)
    got = {r["id"]: r["d"] for r in back.collect()}
    for rid, d in rows:
        assert got[rid] == d


# ------------------------------------------------- worker-side parquet read


def test_encode_parquet_files_matches_encode_table(spark):
    from pq_engine.spark.engine import encode_parquet_files, table_ptypes

    src = "/root/testdata/sf0.001/documents.parquet"
    pages = encode_parquet_files(spark, src)
    df = spark.read.parquet(src)
    back = decode_table(
        pages, ["doc_id", "text", "lang", "source", "n_chars"],
        ptypes=table_ptypes(df),
    )
    assert back.count() == df.count()
    assert back.exceptAll(df).count() == 0
    # splits = files, batch-granular chunks
    assert pages.select("split_id").distinct().count() >= 1


def test_run_encode_files_job_resume(spark, tmp_path):
    import pyarrow.parquet as pq_
    import pyarrow as pa_

    from pq_engine.spark.engine import read_job_ptypes, run_encode_files_job

    src = str(tmp_path / "src")
    import os

    os.makedirs(src)
    # two files = two splits
    for i in range(2):
        t = pa_.table({"id": list(range(i * 100, i * 100 + 100)),
                       "s": [f"v{j % 9}" for j in range(100)]})
        pq_.write_table(t, f"{src}/part-{i}.parquet")
    out = str(tmp_path / "job")
    r1 = run_encode_files_job(spark, src, out)
    assert r1["pages"] > 0
    # resume: nothing left to do, no duplicate pages
    r2 = run_encode_files_job(spark, src, out)
    pages = spark.read.parquet(r2["pages_path"])
    dup = (
        pages.groupBy("split_id", "batch_id", "column", "page")
        .count().filter("count > 1").count()
    )
    assert dup == 0
    back = decode_table(pages, ["id", "s"], ptypes=read_job_ptypes(spark, out))
    assert back.count() == 200


# ------------------------------------------------- self-review regressions


def test_transcode_list_pages(spark):
    """Review finding: transcode treated LIST blobs (flag 2, raw levels before
    the compressed body) like flat blobs and corrupted/crashed them."""
    from pyspark.sql import types as T

    from pq_engine.spark.engine import table_ptypes
    from pq_engine.spark.rewrite import transcode_compression

    schema = T.StructType([
        T.StructField("id", T.LongType()),
        T.StructField("v", T.ArrayType(T.LongType())),
    ])
    rows = [(i, list(range(i % 5))) for i in range(2000)]
    df = spark.createDataFrame(rows, schema).coalesce(1)
    pages = encode_table(df, page_compression="zlib")
    re_pages = transcode_compression(pages, "zstd")
    back = decode_table(re_pages, ["id", "v"], ptypes=table_ptypes(df))
    got = {r["id"]: r["v"] for r in back.collect()}
    assert all(got[i] == list(range(i % 5)) for i in range(2000))


def test_dict_pushdown_decimal_column(spark):
    """Review finding: dictionary pruning raised KeyError on decimal ptypes."""
    from decimal import Decimal

    from pyspark.sql import types as T

    from pq_engine.spark.engine import prune_pages_by_dictionary, table_ptypes

    schema = T.StructType([
        T.StructField("id", T.LongType()),
        T.StructField("dv", T.DecimalType(10, 2)),
    ])
    rows = [(i, Decimal(f"{i % 5}.25")) for i in range(2000)]
    df = spark.createDataFrame(rows, schema).repartitionByRange(4, "id")
    pages = encode_table(df)
    # probe with the UNSCALED int of 3.25 → 325
    pruned = prune_pages_by_dictionary(pages, "dv", 325)
    back = decode_table(pruned, ["id", "dv"], ptypes=table_ptypes(df))
    assert back.filter(F.col("dv") == 3.25).count() == 400


def test_fsst_mixed_short_and_blob_batch_fast():
    """Review finding: >=1024 short strings + a few 64KiB blobs re-entered the
    tiny-frontier wave pathology (~90s); the in-loop dense tail must keep it
    seconds."""
    import time

    from pq_engine.kernels import fsst
    from pq_engine.kernels.ragged import RaggedBytes

    short = [f"short string number {i}".encode() for i in range(2000)]
    blobs = [bytes([i % 256]) * 65536 for i in range(50)]
    col = RaggedBytes.from_pylist(short + blobs)
    t0 = time.time()
    blob = fsst.encode_fsst_auto(col)
    assert time.time() - t0 < 30  # was ~90s on smaller input before the fix
    assert fsst.decode_fsst(blob) == col
