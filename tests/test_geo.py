"""GEOMETRY (WKB) columns: bbox GeospatialStatistics rows, bbox pruning,
vectorized point build/parse, CLI geospatial-stats."""

import numpy as np
from pyspark.sql import functions as F

from pq_engine.kernels.ragged import RaggedBytes
from pq_engine.pipeline.geo import (
    points_to_wkb,
    wkb_bbox,
    wkb_point_column,
    wkb_point_xy,
    wkb_to_points,
)
from pq_engine.spark.engine import (
    decode_table,
    encode_table,
    prune_pages_by_bbox,
    table_ptypes,
)


def test_wkb_point_kernels():
    x = np.array([1.5, -3.25, 0.0])
    y = np.array([2.5, 4.0, -1.0])
    col = points_to_wkb(x, y)
    assert (col.lengths == 21).all()
    bx, by = wkb_to_points(col)
    assert np.array_equal(bx, x) and np.array_equal(by, y)
    assert wkb_bbox(col) == {"xmin": -3.25, "xmax": 1.5, "ymin": -1.0, "ymax": 4.0}
    # non-point bytes → no bbox, no parse
    mixed = RaggedBytes.from_pylist([bytes(col[0]), b"not wkb"])
    assert wkb_to_points(mixed) is None and wkb_bbox(mixed) is None


def test_geometry_encode_emits_bbox_and_prunes(spark):
    df = spark.range(2000).select(
        "id",
        (F.col("id") % 50).cast("double").alias("x"),
        (F.col("id") / 50).cast("double").alias("y"),
    )
    geo = wkb_point_column(df, "x", "y").select("id", "geom").repartition(8, "id")
    pages = encode_table(geo, ptype_overrides={"geom": "geometry"})
    bbox_rows = pages.filter(F.col("page") == -5)
    assert bbox_rows.count() == 8  # one per chunk
    # query rectangle hitting a thin slice
    pruned = prune_pages_by_bbox(pages, "geom", 10, 0, 12, 40)
    ptypes = table_ptypes(geo)
    ptypes["geom"] = "geometry"
    back = decode_table(pruned, ["id", "geom"], ptypes=ptypes)
    parsed = wkb_point_xy(back, "geom")
    exact = parsed.filter(
        (F.col("x") >= 10) & (F.col("x") <= 12) & (F.col("y") >= 0) & (F.col("y") <= 40)
    )
    assert exact.count() == 3 * 40  # x in {10,11,12}, all 40 y rows
    # far-away rectangle: every chunk disproved
    none = prune_pages_by_bbox(pages, "geom", 1000, 1000, 2000, 2000)
    assert none.count() == 0


def test_geometry_roundtrip_bit_identical(spark):
    df = spark.range(500).select(
        "id",
        (F.col("id") * 0.1).alias("x"),
        (F.col("id") * -0.2).alias("y"),
    )
    geo = wkb_point_column(df, "x", "y").select("id", "geom")
    pages = encode_table(geo, ptype_overrides={"geom": "geometry"}, page_compression="zstd")
    ptypes = {"id": "int64", "geom": "geometry"}
    back = decode_table(pages, ["id", "geom"], ptypes=ptypes)
    assert back.orderBy("id").collect() == geo.orderBy("id").collect()


def test_cli_geospatial_stats(tmp_path, capsys):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from pq_engine.cli import _rebuild_rows, cmd_geospatial_stats
    from pq_engine.pages import encode_column

    col = points_to_wkb(np.array([1.0, 5.0]), np.array([2.0, 3.0]))
    rows = _rebuild_rows(None, 0, 0, "geom", encode_column(col, "geometry"), None)
    tbl = pa.Table.from_pylist(rows)

    class A:
        column = None

    cmd_geospatial_stats(tbl, A())
    out = capsys.readouterr().out
    assert "bbox=[1.0, 2.0, 5.0, 3.0]" in out
