"""Dotted-path helpers for nested document columns.

The reference addresses nested fields with dotted paths
(``"test3.test1.test2"``) and escapes literal dots in keys as ``_dot_``
(reference: AddFields.java:66-74; Project.java:62-69).  Spark structs are
fixed-schema, so every nested read/write is compiled here against the
DataFrame schema: reads become chained ``getField`` accesses, writes become
recursive struct rebuilds (``withField`` semantics re-implemented
schema-directed so that missing intermediates are deep-created and
non-struct intermediates are overwritten, matching TestAddFields.java:74-107).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

DOT_ESCAPE = "_dot_"


def split_path(path: str) -> list[str]:
    """Split a dotted path into parts, honoring the ``_dot_`` escape.

    A part written ``a_dot_b`` addresses the literal key ``"a.b"``
    (reference AddFields.java:66-74).
    """
    return [p.replace(DOT_ESCAPE, ".") for p in path.split(".")]


def join_path(parts: list[str]) -> str:
    return ".".join(p.replace(".", DOT_ESCAPE) for p in parts)


def nested_col(parts: list[str], base: Column | None = None) -> Column:
    """Resolve a path to a Column via chained getField (dot-literal safe)."""
    if base is None:
        col = F.col("`" + parts[0].replace("`", "``") + "`")
        rest = parts[1:]
    else:
        col = base
        rest = parts
    for p in rest:
        col = col.getField(p)
    return col


def _field(schema: T.StructType | None, name: str) -> T.StructField | None:
    if schema is None:
        return None
    for f in schema.fields:
        if f.name == name:
            return f
    return None


def has_path(schema: T.StructType, parts: list[str]) -> bool:
    """Paths traverse structs AND arrays of structs: Mongo's ``m.v`` on
    an array-of-documents field yields the array of element values, and
    Spark's getField does the same on array<struct> columns."""
    cur: T.DataType = schema
    for p in parts:
        while isinstance(cur, T.ArrayType):
            cur = cur.elementType
        if not isinstance(cur, T.StructType):
            return False
        f = _field(cur, p)
        if f is None:
            return False
        cur = f.dataType
    return True


def path_type(schema: T.StructType, parts: list[str]) -> T.DataType | None:
    """Type of the resolved path; steps through array<struct> wrap the
    result back into an array (getField on array<struct<..f: t..>>
    yields array<t>)."""
    cur: T.DataType = schema
    for p in parts:
        depth = 0
        while isinstance(cur, T.ArrayType):
            cur = cur.elementType
            depth += 1
        if not isinstance(cur, T.StructType):
            return None
        f = _field(cur, p)
        if f is None:
            return None
        cur = f.dataType
        for _ in range(depth):
            cur = T.ArrayType(cur)
    return cur


def _set_in_struct(
    schema: T.DataType | None,
    base: Column | None,
    parts: list[str],
    value: Column,
) -> Column:
    """Build a struct column equal to ``base`` with ``parts`` set to ``value``.

    Deep-creates intermediate structs when the path is missing and overwrites
    non-struct intermediates with fresh structs (TestAddFields.java:74-107).
    """
    head, rest = parts[0], parts[1:]
    is_struct = isinstance(schema, T.StructType)
    inner_field = _field(schema, head) if is_struct else None

    if not rest:
        new_inner = value
    else:
        if inner_field is not None and isinstance(inner_field.dataType, T.StructType):
            inner_base = base.getField(head) if base is not None else None
            new_inner = _set_in_struct(inner_field.dataType, inner_base, rest, value)
        else:
            # missing or non-struct intermediate: deep-create fresh structs
            new_inner = _set_in_struct(None, None, rest, value)

    if not is_struct or base is None:
        return F.struct(new_inner.alias(head))
    if inner_field is None:
        return base.withField("`" + head.replace("`", "``") + "`", new_inner)
    return base.withField("`" + head.replace("`", "``") + "`", new_inner)


def set_path(df: DataFrame, path: str, value: Column) -> DataFrame:
    """Return ``df`` with the dotted ``path`` set to ``value``.

    Top-level paths become ``withColumn``; nested paths rebuild the
    containing struct column.
    """
    parts = split_path(path)
    if len(parts) == 1:
        return df.withColumn(parts[0], value)
    head = parts[0]
    fld = _field(df.schema, head)
    if fld is not None and isinstance(fld.dataType, T.StructType):
        new_col = _set_in_struct(fld.dataType, nested_col([head]), parts[1:], value)
    else:
        new_col = _set_in_struct(None, None, parts[1:], value)
    return df.withColumn(head, new_col)


def drop_path(df: DataFrame, path: str) -> DataFrame:
    """Return ``df`` with the dotted ``path`` removed (no-op if absent)."""
    parts = split_path(path)
    if len(parts) == 1:
        return df.drop(parts[0])
    head = parts[0]
    fld = _field(df.schema, head)
    if fld is None or not isinstance(fld.dataType, T.StructType):
        return df
    if not has_path(df.schema, parts):
        return df
    parent_t = path_type(df.schema, parts[:-1])
    if isinstance(parent_t, T.StructType) and len(parent_t.fields) == 1:
        # dropping the parent's only field leaves the empty object `{}`,
        # exactly like Mongo (TestUnset.java:32-39 "$unset 2")
        return set_path(df, join_path(parts[:-1]), F.struct())
    quoted = ".".join("`" + p.replace("`", "``") + "`" for p in parts[1:])
    new_col = nested_col([head]).dropFields(quoted)
    return df.withColumn(head, new_col)
