"""Corpus curation operators — deterministic sampling / splitting for
training-data pipelines.

Everything here is keyed on an md5 hash bucket of the document id (+ a
salt), NOT on ``rand()``: the assignment is reproducible across runs,
engines and partitionings — rerunning a 10^12-doc split after adding files
reassigns nothing — and every operator is exactly reproducible in ANSI SQL
(the driver's DuckDB oracle computes the identical md5), which is the
correctness gate these operators run under.

Bucket = first 4 hex chars of ``md5(id || salt)`` compared as strings
(hex chars sort lexicographically), giving 65 536 deterministic buckets —
fraction granularity 1/65536 ≈ 0.0015%.

* :func:`hash_split` — train/val/test assignment by cumulative fraction
  ranges. One projection, no shuffle, no state.
* :func:`quota_sample` — at most ``cap`` docs per key (domain/lang/source
  cap — the standard anti-boilerplate rail), deterministic rank within the
  key by hash bucket. One window (= one shuffle on the key); use with the
  dedup family's bucket caps when keys are web-scale-hot.
* :func:`stratified_sample` — per-stratum keep fractions (e.g. downsample
  dominant languages). One projection, no shuffle.

Reference scope note: parquet-java has no sampling stage (encoding layer);
this family belongs to the training-data-pipeline surface the mission
brief adds on top.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def _bucket(id_col: str, salt: str) -> Column:
    """First 4 hex chars of md5(id || salt) — a deterministic, engine-
    portable 16-bit bucket as a lexicographically-comparable string."""
    return F.substring(
        F.md5(F.concat(F.col(id_col).cast("string"), F.lit(salt))), 1, 4
    )


def _threshold(fraction: float) -> str:
    """Hex threshold such that P(bucket < threshold) == fraction (to 1/65536)."""
    t = max(0, min(65536, int(round(fraction * 65536))))
    return f"{t:04x}" if t < 65536 else "g"  # 'g' > every hex char


def hash_split(
    df: DataFrame,
    id_col: str = "doc_id",
    splits: list[tuple[str, float]] = (("train", 0.9), ("val", 0.05), ("test", 0.05)),
    salt: str = "",
    out: str = "split",
) -> DataFrame:
    """Assign every row to a named split by cumulative hash-bucket ranges.

    Fractions must sum to ≤ 1; rows past the last cumulative threshold get
    the LAST split name (so fractions summing to 1 cover everything and
    rounding residue lands in the final split)."""
    total = sum(f for _, f in splits)
    if total > 1 + 1e-9:
        raise ValueError(f"split fractions sum to {total} > 1")
    b = _bucket(id_col, salt)
    cum = 0.0
    expr = None
    for name, frac in splits[:-1]:
        cum += frac
        cond = b < F.lit(_threshold(cum))
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    last = splits[-1][0]
    expr = F.lit(last) if expr is None else expr.otherwise(F.lit(last))
    return df.withColumn(out, expr)


def quota_sample(
    df: DataFrame,
    key_cols: list[str],
    id_col: str = "doc_id",
    cap: int = 100,
    salt: str = "",
) -> DataFrame:
    """Keep at most ``cap`` rows per key, chosen deterministically (lowest
    hash buckets win; id tiebreak). The per-key 'take k' every web-corpus
    domain cap needs — one window, shuffle key = ``key_cols``."""
    from pyspark.sql import Window as W

    rn = F.row_number().over(
        W.partitionBy(*key_cols).orderBy(
            _bucket(id_col, salt), F.col(id_col)
        )
    )
    return df.withColumn("__rn", rn).filter(F.col("__rn") <= cap).drop("__rn")


def stratified_sample(
    df: DataFrame,
    stratum_col: str,
    fractions: dict[str, float],
    default_fraction: float = 1.0,
    id_col: str = "doc_id",
    salt: str = "",
) -> DataFrame:
    """Keep a deterministic per-stratum fraction (downsample dominant
    strata, keep the tail whole). Pure projection — no shuffle."""
    b = _bucket(id_col, salt)
    expr = None
    for name, frac in sorted(fractions.items()):
        cond = F.col(stratum_col) == name
        keep = b < F.lit(_threshold(frac))
        expr = F.when(cond, keep) if expr is None else expr.when(cond, keep)
    keep_default = b < F.lit(_threshold(default_fraction))
    expr = keep_default if expr is None else expr.otherwise(keep_default)
    return df.filter(expr)
