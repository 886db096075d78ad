"""Semi-structured (VARIANT) column shredding — the parquet-variant analog.

Reference: /root/reference/parquet-variant/ implements the Variant binary
encoding (metadata key dictionary + typed value bytes), and the
VariantShredding spec stores a variant group as ``typed_value`` columns for
commonly-typed paths plus an untyped ``value`` residual, so typed reads
never parse the document. This module re-expresses that structure
Spark-first over a JSON string carrier:

* :func:`infer_variant_spec` — bounded driver-side sample → {path: ptype}
  for top-level keys whose observed JSON type is consistent (the "commonly
  typed" detection the shredding spec leaves to the writer);
* :func:`variant_shred` — one Catalyst projection: each typed path becomes
  a real column ``col#path`` via ``get_json_object`` + cast (whole-stage
  codegen, no Python), and ``col#__value`` keeps the lossless residual
  document (FSST/dict/zstd-encoded like any string column);
* :func:`variant_assemble` — the residual IS the document (lossless by
  construction);
* typed paths participate in stats/dictionary/bloom pruning like any other
  column — a predicate on ``price`` reads the ``#price`` leaf's pages
  only, never the documents.

The Variant BINARY encoding itself (key-dictionary + packed value bytes) is
deliberately not reproduced: on Spark the typed columns + residual string
column dominate it for both scan speed (typed leaves) and size (the
residual goes through the string codecs), which is the engine-appropriate
expression of the same contract.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, functions as F

VALUE_SUFFIX = "#__value"

_CARRIER = {
    "int64": "bigint",
    "float64": "double",
    "string": "string",
    "bool": "boolean",
}


def infer_variant_spec(
    df: DataFrame,
    col: str,
    sample_rows: int = 1024,
    min_share: float = 0.95,
    max_depth: int = 3,
) -> dict[str, str]:
    """Infer {dotted path: ptype} from a bounded sample (one `limit` read,
    like the IVF trainer). A path qualifies when present in ≥ ``min_share``
    of sampled documents with a consistent scalar JSON type; integral
    numbers map to int64, other numbers to float64. Nested OBJECTS recurse
    to ``max_depth`` (dotted paths, the shredding spec's nested
    typed_value groups); arrays and keys containing '.' stay in the
    residual."""
    rows = df.select(col).limit(sample_rows).collect()
    counts: dict[str, dict[str, int]] = {}
    n_docs = 0

    def walk(obj: dict, prefix: str, depth: int) -> None:
        for k, v in obj.items():
            if "." in k:
                continue  # would be ambiguous in a JSONPath
            path = f"{prefix}{k}"
            t: str | None
            if isinstance(v, bool):
                t = "bool"
            elif isinstance(v, int):
                t = "int64"
            elif isinstance(v, float):
                t = "float64"
            elif isinstance(v, str):
                t = "string"
            else:
                if isinstance(v, dict) and depth < max_depth:
                    walk(v, path + ".", depth + 1)
                continue  # null / array / too-deep object → residual
            counts.setdefault(path, {}).setdefault(t, 0)
            counts[path][t] += 1

    for r in rows:
        s = r[0]
        if s is None:
            continue
        try:
            obj = json.loads(s)
        except (json.JSONDecodeError, TypeError):
            continue
        if not isinstance(obj, dict):
            continue
        n_docs += 1
        walk(obj, "", 1)
    spec: dict[str, str] = {}
    for k, by_type in counts.items():
        total = sum(by_type.values())
        if total < min_share * max(n_docs, 1):
            continue
        # int64 and float64 merge to float64 when mixed; any other mix → skip
        kinds = set(by_type)
        if kinds == {"int64", "float64"}:
            spec[k] = "float64"
        elif len(kinds) == 1:
            spec[k] = next(iter(kinds))
    return dict(sorted(spec.items()))


def _leaf(col: str, path: str) -> str:
    # '#' separators only — a '.' in a column name fights Spark's attribute
    # resolution even when backtick-quoted in places (nested-field parsing)
    return f"{col}#" + path.replace(".", "#")


def variant_shred(
    df: DataFrame, col: str, spec: dict[str, str]
) -> tuple[DataFrame, dict]:
    """Project the variant column into typed path leaves + the residual
    value column. Pure Catalyst (get_json_object + cast); every other column
    passes through untouched. Returns (flat_df, shred_info) where shred_info
    round-trips through JSON for manifests."""
    exprs = [F.col(c) for c in df.columns if c != col]
    for path, ptype in spec.items():
        if ptype not in _CARRIER:
            raise TypeError(f"variant path {path!r}: unsupported ptype {ptype!r}")
        raw = F.get_json_object(F.col(col), f"$.{path}")
        exprs.append(raw.cast(_CARRIER[ptype]).alias(_leaf(col, path)))
    exprs.append(F.col(col).alias(col + VALUE_SUFFIX))
    return df.select(*exprs), {"column": col, "spec": spec}


def variant_assemble(flat: DataFrame, shred_info: dict) -> DataFrame:
    """Inverse of variant_shred: the residual column IS the document
    (lossless), typed leaves drop away."""
    col = shred_info["column"]
    keep = [c for c in flat.columns if not c.startswith(col + "#")]
    return flat.select(*keep, F.col(f"`{col}{VALUE_SUFFIX}`").alias(col))


def variant_get(flat_or_decoded: DataFrame, col: str, path: str, alias: str | None = None):
    """Typed-path accessor over a shredded (or decoded) frame: reads the
    ``col#path`` leaf — never parses the document."""
    return flat_or_decoded.select(
        *[c for c in flat_or_decoded.columns if not c.startswith(col + "#")],
        F.col(f"`{_leaf(col, path)}`").alias(alias or path),
    )


def encode_variant(df: DataFrame, col: str, spec: dict[str, str] | None = None,
                   **encode_kwargs) -> tuple[DataFrame, dict]:
    """variant_shred → encode_table. With ``spec=None`` the writer infers it
    (the shredding spec's writer-chooses-paths contract)."""
    from .engine import encode_table

    if spec is None:
        spec = infer_variant_spec(df, col)
    flat, info = variant_shred(df, col, spec)
    return encode_table(flat, **encode_kwargs), info
