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

Bbox stats cover WKB Point, LineString, Polygon and MultiPoint (LE),
parsed with a rounds-over-structure NumPy walk — one vectorized pass per
structural level (ring index), never per row. MultiLineString /
MultiPolygon / GeometryCollection / big-endian values still round-trip as
opaque geometry bytes; a column containing any of those emits no bbox
(never-prunes, like omitted min/max)."""

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


def _u32_at(data: np.ndarray, pos: np.ndarray) -> np.ndarray:
    """Little-endian u32 reads at arbitrary byte positions, vectorized."""
    p = pos.astype(np.int64)
    return (
        data[p].astype(np.uint32)
        | (data[p + 1].astype(np.uint32) << np.uint32(8))
        | (data[p + 2].astype(np.uint32) << np.uint32(16))
        | (data[p + 3].astype(np.uint32) << np.uint32(24))
    )


def _coord_runs_bbox(data: np.ndarray, run_pos: np.ndarray, run_n: np.ndarray,
                     dtype: str = "<f8"):
    """Bbox over coordinate runs: each run is ``n`` (x, y) float64 pairs
    starting at byte ``pos``. Segment-arange gather — no per-pair Python.
    ``dtype`` selects the byte order (``<f8`` LE, ``>f8`` BE)."""
    total = int(run_n.sum())
    if total == 0:
        return None
    pair = (
        np.repeat(run_pos - 16 * (np.cumsum(run_n) - run_n), run_n)
        + 16 * np.arange(total, dtype=np.int64)
    )
    xb = data[pair[:, None] + np.arange(8, dtype=np.int64)]
    yb = data[pair[:, None] + np.arange(8, 16, dtype=np.int64)]
    x = np.ascontiguousarray(xb).view(dtype).astype(np.float64).ravel()
    y = np.ascontiguousarray(yb).view(dtype).astype(np.float64).ravel()
    fx, fy = x[np.isfinite(x)], y[np.isfinite(y)]
    if not len(fx) or not len(fy):
        return None
    return {
        "xmin": float(fx.min()),
        "xmax": float(fx.max()),
        "ymin": float(fy.min()),
        "ymax": float(fy.max()),
    }


def _merge_bbox(a: dict | None, b: dict | None) -> dict | None:
    if a is None:
        return b
    if b is None:
        return a
    return {
        "xmin": min(a["xmin"], b["xmin"]),
        "xmax": max(a["xmax"], b["xmax"]),
        "ymin": min(a["ymin"], b["ymin"]),
        "ymax": max(a["ymax"], b["ymax"]),
    }


_MAX_WKB_DEPTH = 32  # nesting rail: deeper collections disable the bbox


def _walk_wkb_runs(data: np.ndarray, s: int, e: int, runs_le: list,
                   runs_be: list) -> bool:
    """Structural walk of one full WKB value at [s, e): collects coordinate
    runs (pos, n_pairs) split by byte order, handling MultiLineString (5) /
    MultiPolygon (6) / GeometryCollection (7) and big-endian values — the
    shapes the vectorized rounds walk doesn't cover (reference computes
    envelopes for ALL shapes: parquet-column geospatial/EnvelopeCovering).
    Python touches only geometry HEADERS (O(#geometries)); the coordinate
    bytes — the dominant payload — go through one vectorized gather in
    _coord_runs_bbox. Returns False on any malformed structure (caller emits
    no bbox: stats may only prove absence)."""

    def u32(p: int, big: bool) -> int:
        return int.from_bytes(data[p : p + 4], "big" if big else "little")

    def parse(p: int, depth: int) -> int | None:
        if depth > _MAX_WKB_DEPTH or p + 5 > e:
            return None
        bo = int(data[p])
        if bo not in (0, 1):
            return None
        big = bo == 0
        t = u32(p + 1, big)
        if t == 1:  # Point
            if p + 21 > e:
                return None
            (runs_be if big else runs_le).append((p + 5, 1))
            return p + 21
        if t == 2:  # LineString
            if p + 9 > e:
                return None
            m = u32(p + 5, big)
            q = p + 9 + 16 * m
            if q > e:
                return None
            (runs_be if big else runs_le).append((p + 9, m))
            return q
        if t == 3:  # Polygon: rings of (count, pairs)
            if p + 9 > e:
                return None
            q = p + 9
            for _ in range(u32(p + 5, big)):
                if q + 4 > e:
                    return None
                m = u32(q, big)
                if q + 4 + 16 * m > e:
                    return None
                (runs_be if big else runs_le).append((q + 4, m))
                q += 4 + 16 * m
            return q
        if t in (4, 5, 6, 7):  # Multi* / GeometryCollection: full-WKB children
            if p + 9 > e:
                return None
            q = p + 9
            for _ in range(u32(p + 5, big)):
                q = parse(q, depth + 1)
                if q is None:
                    return None
            return q
        return None  # unknown type (incl. Z/M variants): never prune

    return parse(s, 0) == e


def wkb_bbox(col: RaggedBytes) -> dict | None:
    """GeospatialStatistics bbox of a WKB batch (None → no stats).

    LE Point (1) / LineString (2) / Polygon (3) / MultiPoint (4) batches take
    the fully-vectorized rounds walk (one round per structural level across
    all values). Batches containing MultiLineString (5) / MultiPolygon (6) /
    GeometryCollection (7) or big-endian values take the header-walk path
    (_walk_wkb_runs: Python over headers only, coordinates still one
    vectorized gather). Any malformed or unknown-typed value disables the
    bbox for the whole chunk — stats may only prove absence, and a partial
    bbox would wrongly prune the opaque values."""
    n = len(col)
    if n == 0:
        return None
    data = col.data
    starts = col.offsets[:-1].astype(np.int64)
    ends = col.offsets[1:].astype(np.int64)
    if (ends - starts < 5).any():
        return None  # truncated
    t = _u32_at(data, starts + 1)
    if (data[starts] != 1).any() or not np.isin(t, (1, 2, 3, 4)).all():
        # big-endian or Multi*/GeometryCollection present: header-walk path
        runs_le: list[tuple[int, int]] = []
        runs_be: list[tuple[int, int]] = []
        for i in range(n):
            if not _walk_wkb_runs(data, int(starts[i]), int(ends[i]),
                                  runs_le, runs_be):
                return None
        box = None
        for runs, dt in ((runs_le, "<f8"), (runs_be, ">f8")):
            if runs:
                pos = np.array([p for p, _ in runs], dtype=np.int64)
                cnt = np.array([c for _, c in runs], dtype=np.int64)
                box = _merge_bbox(box, _coord_runs_bbox(data, pos, cnt, dt))
        return box
    run_pos: list[np.ndarray] = []
    run_n: list[np.ndarray] = []

    pt = t == 1
    if pt.any():
        if ((ends - starts)[pt] != WKB_POINT_LEN).any():
            return None
        run_pos.append(starts[pt] + 5)
        run_n.append(np.ones(int(pt.sum()), dtype=np.int64))

    ls = t == 2
    if ls.any():
        s = starts[ls]
        if ((ends - starts)[ls] < 9).any():
            return None
        m = _u32_at(data, s + 5).astype(np.int64)
        if ((ends[ls] - s) != 9 + 16 * m).any():
            return None
        run_pos.append(s + 9)
        run_n.append(m)

    mp = t == 4
    if mp.any():
        s = starts[mp]
        if ((ends - starts)[mp] < 9).any():
            return None
        m = _u32_at(data, s + 5).astype(np.int64)
        if ((ends[mp] - s) != 9 + 21 * m).any():
            return None
        total = int(m.sum())
        if total:
            # child headers at s + 9 + 21*i, coords 5 bytes further
            child = (
                np.repeat(s + 9 - 21 * (np.cumsum(m) - m), m)
                + 21 * np.arange(total, dtype=np.int64)
            )
            hdr = np.frombuffer(_WKB_POINT_LE, np.uint8)
            if (data[child[:, None] + np.arange(5, dtype=np.int64)] != hdr).any():
                return None
            run_pos.append(child + 5)
            run_n.append(np.ones(total, dtype=np.int64))

    pg = t == 3
    if pg.any():
        s = starts[pg]
        e = ends[pg]
        if ((e - s) < 9).any():
            return None
        rings_left = _u32_at(data, s + 5).astype(np.int64)
        pos = s + 9
        # one vectorized round per ring index (polygons rarely exceed 2)
        while True:
            act = rings_left > 0
            if not act.any():
                break
            p = pos[act]
            if ((e[act] - p) < 4).any():
                return None
            m = _u32_at(data, p).astype(np.int64)
            if ((e[act] - p) < 4 + 16 * m).any():
                return None
            run_pos.append(p + 4)
            run_n.append(m)
            pos = pos.copy()
            pos[act] = p + 4 + 16 * m
            rings_left = rings_left - act
        if (pos != e).any():
            return None  # trailing bytes

    return _coord_runs_bbox(
        data,
        np.concatenate(run_pos) if run_pos else np.zeros(0, np.int64),
        np.concatenate(run_n) if run_n else np.zeros(0, np.int64),
    )


_MPG_POLY_LEN = 9 + 4 + 5 * 16  # polygon: hdr + ring count + 5-point ring
_MPG_LEN = 9 + 2 * _MPG_POLY_LEN


def squares_to_wkb_multipolygon(x: np.ndarray, y: np.ndarray, side: float = 1.0,
                                offset: float = 0.5) -> RaggedBytes:
    """(x, y) → LE WKB MultiPolygon of two unit squares (anchored at (x, y)
    and (x+offset, y+offset)), fully vectorized via template fill. Exercises
    the Multi*-shape bbox path end-to-end (each value's envelope is
    [x, x+side+offset] × [y, y+side+offset])."""
    n = len(x)
    rows = np.zeros((n, _MPG_LEN), dtype=np.uint8)
    rows[:, 0] = 1
    rows[:, 1:5] = np.frombuffer((6).to_bytes(4, "little"), np.uint8)
    rows[:, 5:9] = np.frombuffer((2).to_bytes(4, "little"), np.uint8)
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    for k in range(2):
        base = 9 + k * _MPG_POLY_LEN
        rows[:, base] = 1
        rows[:, base + 1 : base + 5] = np.frombuffer((3).to_bytes(4, "little"), np.uint8)
        rows[:, base + 5 : base + 9] = np.frombuffer((1).to_bytes(4, "little"), np.uint8)
        rows[:, base + 9 : base + 13] = np.frombuffer((5).to_bytes(4, "little"), np.uint8)
        ax, ay = x + k * offset, y + k * offset
        ring = np.empty((n, 10), dtype="<f8")
        ring[:, 0::2] = np.stack([ax, ax + side, ax + side, ax, ax], axis=1)
        ring[:, 1::2] = np.stack([ay, ay, ay + side, ay + side, ay], axis=1)
        rows[:, base + 13 : base + _MPG_POLY_LEN] = ring.view(np.uint8).reshape(n, 80)
    return RaggedBytes(
        np.arange(n + 1, dtype=np.int64) * _MPG_LEN, rows.reshape(-1)
    )


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


@F.pandas_udf(T.BinaryType())
def _xy_to_multipolygon_udf(x: pd.Series, y: pd.Series) -> pd.Series:
    col = squares_to_wkb_multipolygon(
        x.to_numpy(dtype=np.float64), y.to_numpy(dtype=np.float64)
    )
    return pd.Series(col.to_pylist())


def wkb_multipolygon_column(df: DataFrame, x_col: str, y_col: str,
                            out: str = "geom") -> DataFrame:
    """Adds a WKB MultiPolygon binary column (two squares anchored at
    (x, y)) — the multi-shape counterpart of wkb_point_column."""
    return df.withColumn(out, _xy_to_multipolygon_udf(F.col(x_col), F.col(y_col)))


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
