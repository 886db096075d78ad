"""STRUCT / MAP / LIST<STRUCT> shredding — the record-shredding half of
Dremel, expressed Spark-first.

Reference semantics: MessageColumnIO.MessageColumnIORecordConsumer
(/root/reference/parquet-column/.../io/MessageColumnIO.java:177-421) shreds
group types into leaf columns with dotted paths; parquet's MAP is the
three-level group ``map → key_value(repeated) → key, value``
(LogicalTypeAnnotation MapLogicalTypeAnnotation). Here:

* ``STRUCT<f1..fn>``  → leaf columns ``col#f1`` .. ``col#fn`` plus a
  ``col#__defined`` bool leaf when the struct itself is nullable (the
  struct-level definition level: NULL struct vs struct of NULLs). Structs
  nest RECURSIVELY (``col#inner#leaf``), one definition leaf per nullable
  group level — exactly the per-level def-level tree of the reference.
* ``MAP<K,V>``        → two synchronized LIST leaves ``col#key_value#key``
  (list<K>) and ``col#key_value#value`` (list<V>) — NULL map ≡ NULL lists,
  empty map ≡ empty lists (the repeated-group def levels ride on the LIST
  encoder's Dremel levels, nested.py).
* ``LIST<STRUCT<..>>`` → one synchronized LIST leaf per struct field plus a
  ``col#list#__defined`` list<bool> leaf carrying element-level definition
  (NULL element vs element of NULLs).

Leaf names use ``#`` as the path separator instead of parquet's dotted path
(``ColumnDescriptor``) because Spark's mapInArrow resolves dotted names as
nested-field references.

``shred`` flattens a DataFrame to encodable leaves + a spec; ``assemble``
inverts it on the decoded frame. Both are pure Catalyst expressions — the
shuffle-free shredding the reference does row-by-row happens here as
whole-stage-codegen column ops.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F, types as T

from .engine import spark_type_to_ptype

DEFINED = "__defined"


def _q(name: str) -> Column:
    return F.col(f"`{name}`")


def _shred_struct(src: Column, path: str, dt: T.StructType, nullable: bool,
                  exprs: list, entry_out: dict) -> None:
    fields = []
    for sub in dt.fields:
        leaf = f"{path}#{sub.name}"
        child = src.getField(sub.name)
        if isinstance(sub.dataType, T.StructType):
            sub_entry: dict = {}
            _shred_struct(child, leaf, sub.dataType, sub.nullable, exprs, sub_entry)
            fields.append((sub.name, sub_entry))
        elif isinstance(sub.dataType, (T.MapType,)):
            raise TypeError(f"map inside struct {path!r} unsupported")
        else:
            spark_type_to_ptype(sub.dataType)  # must be encodable
            exprs.append(child.alias(leaf))
            fields.append((sub.name, {"kind": "plain", "leaf": leaf}))
    entry_out.update({"kind": "struct", "fields": fields, "nullable": nullable})
    if nullable:
        dleaf = f"{path}#{DEFINED}"
        exprs.append(src.isNotNull().alias(dleaf))
        entry_out["defined_leaf"] = dleaf


def shred(df: DataFrame) -> tuple[DataFrame, dict]:
    """Flatten STRUCT (recursively) / MAP / LIST<STRUCT> columns into
    primitive or list<primitive> leaves. Returns (flat_df, spec)."""
    exprs: list = []
    spec: dict[str, dict] = {}
    for field in df.schema.fields:
        name, dt = field.name, field.dataType
        if isinstance(dt, T.StructType):
            entry: dict = {}
            _shred_struct(F.col(name), name, dt, field.nullable, exprs, entry)
            spec[name] = entry
        elif isinstance(dt, T.MapType):
            if not isinstance(dt.keyType, (T.StringType, T.IntegerType, T.LongType,
                                           T.FloatType, T.DoubleType, T.DateType,
                                           T.TimestampType, T.BooleanType)) or isinstance(
                dt.valueType, (T.StructType, T.MapType, T.ArrayType)
            ):
                raise TypeError(f"non-primitive map key/value in {name!r} unsupported")
            kleaf = f"{name}#key_value#key"
            vleaf = f"{name}#key_value#value"
            exprs.append(F.map_keys(F.col(name)).alias(kleaf))
            exprs.append(F.map_values(F.col(name)).alias(vleaf))
            spec[name] = {"kind": "map", "key_leaf": kleaf, "value_leaf": vleaf}
        elif isinstance(dt, T.ArrayType) and isinstance(dt.elementType, T.StructType):
            st = dt.elementType
            leaves = []
            for sub in st.fields:
                if isinstance(sub.dataType, (T.StructType, T.MapType, T.ArrayType)):
                    raise TypeError(
                        f"nested group inside list<struct> {name!r} unsupported"
                    )
                spark_type_to_ptype(sub.dataType)
                leaf = f"{name}#list#{sub.name}"

                def _getter(sub_name):
                    # transform lambdas must be unary (a 2-arg lambda would
                    # receive the element INDEX as its second argument)
                    return lambda x: x.getField(sub_name)

                exprs.append(F.transform(F.col(name), _getter(sub.name)).alias(leaf))
                leaves.append((leaf, sub.name))
            dleaf = f"{name}#list#{DEFINED}"
            exprs.append(
                F.transform(F.col(name), lambda x: x.isNotNull()).alias(dleaf)
            )
            spec[name] = {"kind": "list_struct", "leaves": leaves, "defined_leaf": dleaf}
        else:
            exprs.append(F.col(name))
            spec[name] = {"kind": "plain", "leaf": name}
    return df.select(*exprs), spec


def leaf_columns(spec: dict) -> list[str]:
    out: list[str] = []

    def walk(entry: dict) -> None:
        kind = entry["kind"]
        if kind == "plain":
            out.append(entry["leaf"])
        elif kind == "struct":
            for _, sub in entry["fields"]:
                walk(sub)
            if "defined_leaf" in entry:
                out.append(entry["defined_leaf"])
        elif kind == "map":
            out.extend([entry["key_leaf"], entry["value_leaf"]])
        else:  # list_struct
            out.extend(leaf for leaf, _ in entry["leaves"])
            out.append(entry["defined_leaf"])

    for entry in spec.values():
        walk(entry)
    return out


def _assemble_entry(entry: dict) -> Column:
    kind = entry["kind"]
    if kind == "plain":
        return _q(entry["leaf"])
    if kind == "struct":
        st = F.struct(*[_assemble_entry(sub).alias(n) for n, sub in entry["fields"]])
        if "defined_leaf" in entry:
            st = F.when(_q(entry["defined_leaf"]), st)  # else NULL struct
        return st
    if kind == "map":
        return F.map_from_arrays(_q(entry["key_leaf"]), _q(entry["value_leaf"]))
    # list_struct: zip the field lists + the element-defined list back into
    # array<struct>, restoring NULL elements
    leaves = entry["leaves"]
    dleaf = entry["defined_leaf"]
    zipped = F.arrays_zip(*[_q(leaf) for leaf, _ in leaves], _q(dleaf))
    def rebuild(s):
        return F.when(
            s.getField(dleaf),
            F.struct(*[s.getField(leaf).alias(sub) for leaf, sub in leaves]),
        )
    return F.transform(zipped, rebuild)


def assemble(flat: DataFrame, spec: dict) -> DataFrame:
    """Inverse of shred: regroup decoded leaves into the original columns."""
    return flat.select(
        *[_assemble_entry(entry).alias(name) for name, entry in spec.items()]
    )


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
