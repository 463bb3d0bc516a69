"""Per-message $group emission: applyInPandasWithState parity mode.

The reference emits the full updated group document for every
state-CHANGING input message (Group.java:176-186,423-430); Spark's
update-mode aggregation emits per micro-batch — the granularity
difference documented in SURVEY.md §2.4.  This module closes the gap for
the decomposable accumulators: the accumulator INPUT expressions compile
to native Columns in the streaming plan (JVM-side, whole-stage codegen),
and a keyed ``applyInPandasWithState`` fold then updates per-key state
row by row, emitting one group document per state-changing input message
— exactly the reference protocol, including the not-re-emitted losing
update (a new max candidate that loses changes nothing and emits
nothing).

This is inherently row-at-a-time work — the price of per-message
granularity; the default per-batch update mode stays the scale path.
State is per-key and accumulator-sized (a JSON document of running
values), stored in Spark's state store and restored across micro-batches
and restarts via the checkpoint.

Ordering: within a micro-batch, rows of one key arrive in shuffle order;
the reference's total input order only exists on a single-partition
source.  Emission order across keys is likewise unordered (reference
processes one message at a time globally).

Group keys: atomic (numeric / string / boolean), object (struct of
atomic fields — grouped on the canonical JSON rendering, _id rebuilt per
emission), or array — which, matching the reference's ``hasId`` filter
(Group.java:261-263,429), never emits.  Accumulator inputs must be
atomic so the JSON state round-trips exactly — except ``$mergeObjects``,
whose input is a struct of atomic fields (objects are already JSON).
Supported accumulators: $sum, $count, $avg, $min, $max, $first, $last,
$push, $addToSet, $mergeObjects, $stdDevPop — the reference's full
registry (Group.java:107-117) plus $first.
"""

from __future__ import annotations

import json
import math
from typing import Any, Callable, Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..context import Context
from ..expressions import ExprContext, compile_expr

_SUPPORTED = {"$sum", "$count", "$avg", "$min", "$max", "$first", "$last",
              "$push", "$addToSet", "$mergeObjects", "$stdDevPop"}

_ATOMIC = (T.NumericType, T.StringType, T.BooleanType, T.NullType)


def _py(v: Any) -> Any:
    """numpy/pandas scalar -> plain python (JSON-serializable)."""
    if v is None:
        return None
    try:
        if pd.isna(v):
            return None
    except (TypeError, ValueError):
        pass
    return v.item() if hasattr(v, "item") else v


def _py_deep(v: Any) -> Any:
    """deep numpy/pandas -> plain python (struct inputs for $mergeObjects
    arrive from Arrow as dicts whose values are numpy scalars)."""
    if isinstance(v, dict):
        return {k: _py_deep(x) for k, x in v.items()}
    if isinstance(v, (list, tuple)):
        return [_py_deep(x) for x in v]
    return _py(v)


def compile_group_per_message(
    expression: dict, ctx: Context
) -> Callable[[DataFrame], DataFrame]:
    """``$group`` spec -> streaming-DataFrame transform emitting one group
    doc per state-changing input message."""
    try:
        # ship this module inside the fold closure: executors whose
        # working dir / sys.path can't import the package still run the
        # stateful fold (same stance as the jq tier-2 interpreter,
        # operators/script.py)
        import sys

        from pyspark import cloudpickle

        cloudpickle.register_pickle_by_value(sys.modules[__name__])
    except Exception:  # pragma: no cover - older pickler
        pass
    gid = expression.get("_id")
    specs: list[tuple[str, str, Any]] = []
    for name, spec in expression.items():
        if name == "_id":
            continue
        if not isinstance(spec, dict) or len(spec) != 1:
            raise ValueError(f"accumulator {name}: single-operator document")
        op, arg = next(iter(spec.items()))
        if op not in _SUPPORTED:
            raise ValueError(
                f"per-message emission supports {sorted(_SUPPORTED)}; "
                f"{name} uses {op} (run the default per-batch mode)"
            )
        specs.append((name, op, arg))

    def fn(df: DataFrame) -> DataFrame:
        sctx = ExprContext(schema=df.schema)
        cols = [compile_expr(gid, sctx).alias("__gk")]
        for i, (_, op, arg) in enumerate(specs):
            if op == "$count":
                cols.append(F.lit(1).alias(f"__in{i}"))
            else:
                cols.append(compile_expr(arg, sctx).alias(f"__in{i}"))
        prepared = df.select(*cols)
        ptypes = {f.name: f.dataType for f in prepared.schema.fields}
        gk_t = ptypes["__gk"]
        json_key = False
        if isinstance(gk_t, T.ArrayType):
            # reference parity: group docs whose _id is an array are
            # FILTERED from emission (Group.hasId, Group.java:261-263,
            # 429) — with a fixed schema the key is statically an array,
            # so the stage emits nothing
            prepared = prepared.filter(F.lit(False))
        elif isinstance(gk_t, T.StructType):
            # object group keys: group on the canonical JSON rendering
            # (objects are already JSON; null and missing group together,
            # as in Mongo) and rebuild the _id struct per emission
            if not all(isinstance(f.dataType, _ATOMIC) for f in gk_t.fields):
                raise ValueError(
                    "per-message emission needs atomic fields in an "
                    f"object group key (got {gk_t.simpleString()})"
                )
            json_key = True
            prepared = prepared.withColumn(
                "__gk", F.to_json(F.col("__gk")))
        elif not isinstance(gk_t, _ATOMIC):
            raise ValueError(
                "per-message emission needs an atomic, object, or array "
                f"group key (got {gk_t.simpleString()})"
            )
        out_fields = [T.StructField("_id", gk_t)]
        for i, (name, op, _) in enumerate(specs):
            it = ptypes[f"__in{i}"]
            if op == "$mergeObjects":
                # objects are already JSON: a struct of atomic fields
                # round-trips through the JSON state exactly
                if not (isinstance(it, T.StructType)
                        and all(isinstance(f.dataType, _ATOMIC)
                                for f in it.fields)):
                    raise ValueError(
                        f"accumulator {name}: $mergeObjects per-message "
                        f"emission needs a struct of atomic fields "
                        f"(got {it.simpleString()})"
                    )
            elif not isinstance(it, _ATOMIC):
                raise ValueError(
                    f"accumulator {name}: per-message emission needs an "
                    f"atomic input (got {it.simpleString()})"
                )
            if op in ("$sum", "$count"):
                ot = (T.LongType() if isinstance(it, T.IntegralType)
                      else T.DoubleType())
            elif op in ("$avg", "$stdDevPop"):
                ot = T.DoubleType()
            elif op in ("$push", "$addToSet"):
                ot = T.ArrayType(it)
            else:
                ot = it
            out_fields.append(T.StructField(name, ot))
        out_schema = T.StructType(out_fields)
        state_schema = T.StructType([T.StructField("s", T.StringType())])
        names = [name for name, _, _ in specs]
        ops = [op for _, op, _ in specs]
        gk_fields = ([f.name for f in gk_t.fields]
                     if isinstance(gk_t, T.StructType) else None)

        def value(s: dict, op: str) -> Any:
            if op == "$avg":
                return s["s"] / s["c"] if s["c"] else None
            if op == "$stdDevPop":
                # sigma = sqrt(n*s2 - s1^2)/n, the reference's running
                # formula (Group.java:437-449)
                n = s["n"]
                if not n:
                    return None
                return math.sqrt(max(n * s["s2"] - s["s1"] ** 2, 0.0)) / n
            if op == "$mergeObjects":
                return dict(s["v"])  # copy, same reason as the lists below
            if op in ("$push", "$addToSet"):
                return list(s["v"])  # copy: the emission diff compares
                # against the PREVIOUS snapshot, not the mutated list
            return s.get("v")

        def is_num(v: Any) -> bool:
            # Mongo's numeric accumulators ignore non-numeric values
            # (booleans included) — reference Group.numbers()
            return isinstance(v, (int, float)) and not isinstance(v, bool)

        def update(s: dict, op: str, v: Any) -> None:
            if op == "$count":
                if v is not None:
                    s["v"] = (s.get("v") or 0) + v
            elif op == "$sum":
                if is_num(v):
                    s["v"] = (s.get("v") or 0) + v
            elif op == "$avg":
                if is_num(v):
                    s["s"] += v
                    s["c"] += 1
            elif op == "$min":
                if v is not None and (s.get("v") is None or v < s["v"]):
                    s["v"] = v
            elif op == "$max":
                if v is not None and (s.get("v") is None or v > s["v"]):
                    s["v"] = v
            elif op == "$first":
                if not s.get("set"):
                    s["v"] = v
                    s["set"] = True
            elif op == "$last":
                s["v"] = v
                s["set"] = True
            elif op == "$push":
                s["v"].append(v)
            elif op == "$addToSet":
                if v not in s["v"]:
                    s["v"].append(v)
            elif op == "$mergeObjects":
                # non-object values merge as the empty object — i.e. they
                # change nothing (Group.java:291-299)
                if isinstance(v, dict):
                    s["v"].update({k: x for k, x in v.items()})
            elif op == "$stdDevPop":
                if is_num(v):
                    s["n"] += 1
                    s["s1"] += v
                    s["s2"] += v * v

        def init_state() -> dict:
            st: dict = {}
            for i, op in enumerate(ops):
                if op in ("$sum", "$count"):
                    st[str(i)] = {"v": 0}
                elif op == "$avg":
                    st[str(i)] = {"s": 0.0, "c": 0}
                elif op == "$stdDevPop":
                    st[str(i)] = {"n": 0, "s1": 0.0, "s2": 0.0}
                elif op in ("$push", "$addToSet"):
                    st[str(i)] = {"v": []}
                elif op == "$mergeObjects":
                    st[str(i)] = {"v": {}}
                else:
                    st[str(i)] = {}
            return st

        n_specs = len(specs)
        struct_idx = frozenset(
            i for i, op in enumerate(ops) if op == "$mergeObjects")

        def fold(key: tuple, pdfs: Iterable[pd.DataFrame], state
                 ) -> Iterable[pd.DataFrame]:
            existed = state.exists
            st = json.loads(state.get[0]) if existed else init_state()
            # hot-loop bindings (r7 profile): per-accumulator state
            # slots resolve ONCE per fold call, not per row (the JSON
            # layout on disk is unchanged — checkpoints stay readable)
            slots = [st[str(i)] for i in range(n_specs)]
            rng = range(n_specs)
            prev = [value(slots[i], ops[i]) for i in rng]
            # a brand-new key has no prior emission to diff against: the
            # reference upserts and emits the newly created group doc even
            # when every accumulator still sits at its initial value
            # (Group.java:176-186 diffs against the ABSENT Mongo doc)
            first_pending = not existed
            if json_key:
                # rebuild the _id object; to_json omitted null fields,
                # so fill them back for a stable output struct
                loaded = json.loads(key[0])
                key_out = {f: loaded.get(f) for f in gk_fields}
            else:
                key_out = _py(key[0])
            out: list[list] = []
            for pdf in pdfs:
                # bulk Arrow->Python conversion (r7 profile): tolist()
                # converts a whole column to native values at C speed —
                # the per-row .iloc/.item() path dominated the fold.
                # Atomic nulls arrive as NaN/NaT (v != v) or None;
                # struct inputs ($mergeObjects) still deep-convert.
                cols = []
                for i in rng:
                    vals = pdf[f"__in{i}"].tolist()
                    if i in struct_idx:
                        vals = [_py_deep(v) for v in vals]
                    else:
                        vals = [None if v is None or v != v else v
                                for v in vals]
                    cols.append(vals)
                rows = zip(*cols) if cols else [()] * len(pdf)
                for row in rows:
                    for i in rng:
                        update(slots[i], ops[i], row[i])
                    cur = [value(slots[i], ops[i]) for i in rng]
                    if cur != prev or first_pending:
                        # the reference's emission diff
                        out.append([key_out] + cur)
                        prev = cur
                        first_pending = False
            state.update((json.dumps(st),))
            if out:
                yield pd.DataFrame(out, columns=["_id"] + names)

        return prepared.groupBy("__gk").applyInPandasWithState(
            fold, out_schema, state_schema, "append", "NoTimeout"
        )

    return fn
