"""STRUCT / MAP shredding — the record-shredding half of Dremel for one
level of grouping, expressed Spark-first.

Reference semantics: MessageColumnIO.MessageColumnIORecordConsumer
(/root/reference/parquet-column/.../io/MessageColumnIO.java:177-421) shreds
group types into leaf columns with dotted paths; parquet's MAP is the
three-level group ``map → key_value(repeated) → key, value``
(LogicalTypeAnnotation MapLogicalTypeAnnotation). Here:

* ``STRUCT<f1..fn>``  → leaf columns ``col#f1`` .. ``col#fn`` plus a
  ``col#__defined`` bool leaf when the struct itself is nullable (the
  struct-level definition level: NULL struct vs struct of NULLs);
* ``MAP<K,V>``        → two synchronized LIST leaves ``col#key_value#key``
  (list<K>) and ``col#key_value#value`` (list<V>) — NULL map ≡ NULL lists,
  empty map ≡ empty lists (the repeated-group def levels ride on the LIST
  encoder's Dremel levels, nested.py).

Leaf names use ``#`` as the path separator instead of parquet's dotted path
(``ColumnDescriptor``) because Spark's mapInArrow resolves dotted names as
nested-field references.

``shred`` flattens a DataFrame to encodable leaves + a spec; ``assemble``
inverts it on the decoded frame. Both are pure Catalyst expressions — the
shuffle-free shredding the reference does row-by-row happens here as
whole-stage-codegen column ops.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F, types as T

from .engine import spark_type_to_ptype

DEFINED = "__defined"


def _q(name: str):
    return F.col(f"`{name}`")


def shred(df: DataFrame) -> tuple[DataFrame, dict]:
    """Flatten one level of STRUCT/MAP columns into primitive/list leaves.
    Returns (flat_df, spec); spec maps each original column to how to
    reassemble it. Deeper nesting (struct-in-struct) is rejected."""
    exprs = []
    spec: dict[str, dict] = {}
    for field in df.schema.fields:
        name, dt = field.name, field.dataType
        if isinstance(dt, T.StructType):
            leaves = []
            for sub in dt.fields:
                leaf = f"{name}#{sub.name}"
                # leaf ptype must be encodable — raises on deeper nesting
                spark_type_to_ptype(sub.dataType)
                if isinstance(sub.dataType, (T.StructType, T.MapType)):
                    raise TypeError(f"nested group inside struct {name!r} unsupported")
                exprs.append(F.col(name).getField(sub.name).alias(leaf))
                leaves.append((leaf, sub.name))
            entry = {"kind": "struct", "leaves": leaves, "nullable": field.nullable}
            if field.nullable:
                dleaf = f"{name}#{DEFINED}"
                exprs.append(F.col(name).isNotNull().alias(dleaf))
                entry["defined_leaf"] = dleaf
            spec[name] = entry
        elif isinstance(dt, T.MapType):
            if isinstance(dt.keyType, (T.StructType, T.MapType, T.ArrayType)) or isinstance(
                dt.valueType, (T.StructType, T.MapType, T.ArrayType)
            ):
                raise TypeError(f"non-primitive map key/value in {name!r} unsupported")
            kleaf = f"{name}#key_value#key"
            vleaf = f"{name}#key_value#value"
            exprs.append(F.map_keys(F.col(name)).alias(kleaf))
            exprs.append(F.map_values(F.col(name)).alias(vleaf))
            spec[name] = {"kind": "map", "key_leaf": kleaf, "value_leaf": vleaf}
        else:
            exprs.append(F.col(name))
            spec[name] = {"kind": "plain"}
    return df.select(*exprs), spec


def leaf_columns(spec: dict) -> list[str]:
    out = []
    for name, entry in spec.items():
        if entry["kind"] == "plain":
            out.append(name)
        elif entry["kind"] == "struct":
            out += [leaf for leaf, _ in entry["leaves"]]
            if "defined_leaf" in entry:
                out.append(entry["defined_leaf"])
        else:
            out += [entry["key_leaf"], entry["value_leaf"]]
    return out


def assemble(flat: DataFrame, spec: dict) -> DataFrame:
    """Inverse of shred: regroup decoded leaves into the original columns."""
    exprs = []
    for name, entry in spec.items():
        if entry["kind"] == "plain":
            exprs.append(_q(name))
        elif entry["kind"] == "struct":
            st = F.struct(*[_q(leaf).alias(sub) for leaf, sub in entry["leaves"]])
            if "defined_leaf" in entry:
                st = F.when(_q(entry["defined_leaf"]), st)  # else NULL struct
            exprs.append(st.alias(name))
        else:
            exprs.append(
                F.map_from_arrays(_q(entry["key_leaf"]), _q(entry["value_leaf"])).alias(name)
            )
    return flat.select(*exprs)


def encode_shredded(df: DataFrame, **encode_kwargs) -> tuple[DataFrame, dict]:
    """shred → encode_table. Returns (pages_df, spec)."""
    from .engine import encode_table

    flat, spec = shred(df)
    return encode_table(flat, **encode_kwargs), spec


def decode_shredded(pages_df: DataFrame, spec: dict, flat_df_ptypes: dict) -> DataFrame:
    """decode_table → assemble. ``flat_df_ptypes`` = table_ptypes(shred(df)[0])."""
    from .engine import decode_table

    flat = decode_table(pages_df, leaf_columns(spec), ptypes=flat_df_ptypes)
    return assemble(flat, spec)
