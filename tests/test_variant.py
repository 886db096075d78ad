"""VARIANT shredding (parquet-variant / VariantShredding analog): inferred
typed path leaves + lossless residual, typed pruning without document parse."""

from pyspark.sql import functions as F

from pq_engine.spark.engine import (
    decode_table,
    prune_pages_by_stats,
    table_ptypes,
)
from pq_engine.spark.variant import (
    encode_variant,
    infer_variant_spec,
    variant_assemble,
    variant_get,
    variant_shred,
)


def _jdocs(spark, n=400):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.to_json(
            F.struct(
                F.col("id").alias("n"),
                (F.col("id") * 0.5).alias("score"),
                F.concat(F.lit("u"), (F.col("id") % 7).cast("string")).alias("user"),
                (F.col("id") % 3 == 0).alias("ok"),
            )
        ).alias("j"),
    )


def test_infer_spec_types(spark):
    spec = infer_variant_spec(_jdocs(spark), "j")
    assert spec == {"n": "int64", "ok": "bool", "score": "float64", "user": "string"}


def test_infer_spec_skips_inconsistent_and_nested(spark):
    df = spark.createDataFrame(
        [
            (1, '{"a": 1, "b": {"x": 2}, "c": "s", "d": [1,2]}'),
            (2, '{"a": "oops", "b": {"x": 3}, "c": "t", "d": []}'),
            (3, "not json at all"),
            (4, None),
        ],
        "id long, j string",
    )
    spec = infer_variant_spec(df, "j", min_share=0.5)
    # 'a' is int-or-string (inconsistent), 'd' is an array → residual;
    # the nested object 'b' now yields a dotted typed path
    assert spec == {"b.x": "int64", "c": "string"}


def test_shred_assemble_lossless_with_nulls(spark):
    df = spark.createDataFrame(
        [
            (1, '{"n": 5, "user": "u1"}'),
            (2, '{"user": "u2"}'),       # missing typed path → NULL leaf
            (3, None),                    # NULL document
            (4, "broken {"),              # malformed → leaves NULL, residual kept
        ],
        "id long, j string",
    )
    flat, info = variant_shred(df, "j", {"n": "int64", "user": "string"})
    back = variant_assemble(flat, info)
    assert back.orderBy("id").collect() == df.orderBy("id").collect()
    got = {r["id"]: r["n"] for r in variant_get(flat, "j", "n").collect()}
    assert got == {1: 5, 2: None, 3: None, 4: None}


def test_encode_decode_typed_and_residual(spark):
    df = _jdocs(spark)
    pages, info = encode_variant(df, "j")
    flat, _ = variant_shred(df, "j", info["spec"])
    back = decode_table(pages, flat.columns, ptypes=table_ptypes(flat))
    assert variant_assemble(back, info).orderBy("doc_id").collect() == (
        df.orderBy("doc_id").collect()
    )
    typed = variant_get(back, "j", "score", alias="score").orderBy("doc_id")
    assert [r["score"] for r in typed.take(4)] == [0.0, 0.5, 1.0, 1.5]


def test_typed_path_pruning_skips_pages(spark):
    df = _jdocs(spark, 2000).coalesce(1)
    pages, info = encode_variant(df, "j", page_rows=200)
    pruned = prune_pages_by_stats(pages, "j#n", lo=100, hi=299, numeric=True, level="page")
    flat, _ = variant_shred(df, "j", info["spec"])
    n_all = pages.filter((F.col("column") == "j#n") & (F.col("page") >= 0)).count()
    n_kept = pruned.filter((F.col("column") == "j#n") & (F.col("page") >= 0)).count()
    assert n_kept < n_all  # pages actually dropped, documents never parsed
    back = decode_table(pruned, flat.columns, ptypes=table_ptypes(flat))
    out = back.select("doc_id", F.col("`j#n`").alias("n")).filter(
        (F.col("n") >= 100) & (F.col("n") <= 299)
    )
    assert out.count() == 200


def test_infer_nested_object_paths(spark):
    from pq_engine.spark.variant import infer_variant_spec, variant_shred

    df = spark.createDataFrame(
        [(i, f'{{"a":{{"b":{i},"s":"x{i}","deep":{{"q":{{"z":1}}}}}},"top":1.5,"arr":[1],"bad.key":2}}')
         for i in range(50)],
        "id long, j string",
    )
    spec = infer_variant_spec(df, "j")
    # depth capped at 3; arrays and dotted keys stay residual
    assert spec == {"a.b": "int64", "a.s": "string", "top": "float64"}
    flat, info = variant_shred(df, "j", spec)
    row = flat.filter(F.col("id") == 7).collect()[0]
    assert row["j#a#b"] == 7 and row["j#a#s"] == "x7" and row["j#top"] == 1.5
