"""Geospatial column support — the parquet-java GeospatialStatistics analog.

Reference: the GEOMETRY/GEOGRAPHY logical types annotate BINARY columns of
WKB values (LogicalTypeAnnotation.java:1189+), and GeospatialStatistics
(parquet-column geospatial/) tracks a per-chunk BOUNDING BOX so readers can
prune row groups by spatial predicate without parsing geometries.

Here GEOMETRY is the ``geometry`` ptype: a WKB binary carrier whose encode
path additionally emits a chunk-level bbox row (pages.py, page = -5,
codec ``geostats``) when every value parses as a WKB Point; pruning
(:func:`pq_engine.spark.engine.prune_pages_by_bbox`) intersects query
rectangles against those rows in pure Catalyst. WKB parse/build are
vectorized NumPy over the ragged buffer — no per-row Python.

Only POINT geometries get bbox stats for now (the dominant type in
lat/lon-tagged web corpora); other WKB types still round-trip as opaque
geometry values, they just emit no bbox (never-prunes, like omitted
min/max)."""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

from ..kernels.ragged import RaggedBytes

_WKB_POINT_LE = bytes([1]) + (1).to_bytes(4, "little")  # byteorder=LE, type=Point
WKB_POINT_LEN = 21


def points_to_wkb(x: np.ndarray, y: np.ndarray) -> RaggedBytes:
    """(x, y) float64 arrays → little-endian WKB Point values, vectorized."""
    n = len(x)
    rows = np.zeros((n, WKB_POINT_LEN), dtype=np.uint8)
    rows[:, 0] = 1
    rows[:, 1] = 1  # type = 1 (Point), LE
    rows[:, 5:13] = np.ascontiguousarray(x, dtype="<f8").view(np.uint8).reshape(n, 8)
    rows[:, 13:21] = np.ascontiguousarray(y, dtype="<f8").view(np.uint8).reshape(n, 8)
    return RaggedBytes(
        np.arange(n + 1, dtype=np.int64) * WKB_POINT_LEN, rows.reshape(-1)
    )


def wkb_to_points(col: RaggedBytes) -> tuple[np.ndarray, np.ndarray] | None:
    """Inverse of points_to_wkb; None when any value is not an LE WKB Point
    (mixed-type columns keep opaque bytes and emit no bbox)."""
    n = len(col)
    if n == 0 or not (col.lengths == WKB_POINT_LEN).all():
        return None
    rows = col.data.reshape(n, WKB_POINT_LEN)
    hdr = np.frombuffer(_WKB_POINT_LE, np.uint8)
    if not (rows[:, :5] == hdr).all():
        return None
    x = np.ascontiguousarray(rows[:, 5:13]).view("<f8").ravel()
    y = np.ascontiguousarray(rows[:, 13:21]).view("<f8").ravel()
    return x, y


def wkb_bbox(col: RaggedBytes) -> dict | None:
    """GeospatialStatistics bbox of a WKB Point batch (None → no stats)."""
    pts = wkb_to_points(col)
    if pts is None:
        return None
    x, y = pts
    fx, fy = x[np.isfinite(x)], y[np.isfinite(y)]
    if not len(fx) or not len(fy):
        return None
    return {
        "xmin": float(fx.min()),
        "xmax": float(fx.max()),
        "ymin": float(fy.min()),
        "ymax": float(fy.max()),
    }


# ------------------------------------------------------------ Spark surface


@F.pandas_udf(T.BinaryType())
def _xy_to_wkb_udf(x: pd.Series, y: pd.Series) -> pd.Series:
    col = points_to_wkb(
        x.to_numpy(dtype=np.float64), y.to_numpy(dtype=np.float64)
    )
    return pd.Series(col.to_pylist())


def wkb_point_column(df: DataFrame, x_col: str, y_col: str,
                     out: str = "geom") -> DataFrame:
    """Adds a WKB Point binary column built from two coordinate columns
    (vectorized Arrow-batch UDF)."""
    return df.withColumn(out, _xy_to_wkb_udf(F.col(x_col), F.col(y_col)))


_XY_SCHEMA = T.StructType(
    [T.StructField("x", T.DoubleType()), T.StructField("y", T.DoubleType())]
)


@F.pandas_udf(_XY_SCHEMA)
def _wkb_to_xy_udf(wkb: pd.Series) -> pd.DataFrame:
    vals = [v if v is not None else b"" for v in wkb]
    col = RaggedBytes.from_pylist([bytes(v) for v in vals])
    pts = wkb_to_points(col)
    if pts is None:
        # mixed batch: gather the rows that ARE points, parse those in bulk,
        # NaN the rest (still no per-row Python arithmetic)
        n = len(col)
        x = np.full(n, np.nan)
        y = np.full(n, np.nan)
        is_pt = np.flatnonzero(col.lengths == WKB_POINT_LEN)
        if len(is_pt):
            sub = col.take(is_pt)
            rows = sub.data.reshape(-1, WKB_POINT_LEN)
            hdr = np.frombuffer(_WKB_POINT_LE, np.uint8)
            ok = (rows[:, :5] == hdr).all(axis=1)
            idx = is_pt[ok]
            x[idx] = np.ascontiguousarray(rows[ok, 5:13]).view("<f8").ravel()
            y[idx] = np.ascontiguousarray(rows[ok, 13:21]).view("<f8").ravel()
        return pd.DataFrame({"x": x, "y": y})
    return pd.DataFrame({"x": pts[0], "y": pts[1]})


def wkb_point_xy(df: DataFrame, wkb_col: str = "geom") -> DataFrame:
    """Adds ``x``/``y`` doubles parsed from a WKB Point column."""
    parsed = df.withColumn("__xy", _wkb_to_xy_udf(F.col(wkb_col)))
    return parsed.withColumn("x", F.col("__xy.x")).withColumn(
        "y", F.col("__xy.y")
    ).drop("__xy")
