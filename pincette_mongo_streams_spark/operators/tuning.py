"""$hint: physical-plan tuning passthrough.

The reference engine has no analogue (it runs per-message on a reactive
stream); on a 1000-executor cluster the ability to place an exchange, cap
output file counts, or pin a broadcast is part of the product.  Rows and
schema pass through COMPLETELY unchanged — $hint only annotates the plan:

- ``{"repartition": N}`` — round-robin to N partitions
- ``{"repartition": {"numPartitions": N?, "by": ["k", ...]}}`` — hash
  partition on the named fields (co-locates a following stateful op or
  sort-merge join; numPartitions optional = session shuffle partitions)
- ``{"coalesce": N}`` — shrink to N partitions without a shuffle (output
  file sizing before $out/$merge); batch only
- ``{"rebalance": true}`` — AQE rebalance hint (splits skewed partitions,
  merges tiny ones — the right default before writing parquet)
- ``{"broadcast": true}`` — mark this side broadcast-able for a
  subsequent join regardless of the optimizer's size estimate
- ``{"cache": true}`` — persist (MEMORY_AND_DISK) for pipelines that fan
  out over the same intermediate; batch only

Multiple keys compose left-to-right in the order above.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..context import Context
from ..paths import nested_col, split_path
from ..pipeline import StageFn, register_stage
from .extended import _batch_only


@register_stage("$hint")
def hint_stage(expression: Any, ctx: Context) -> StageFn:
    if not isinstance(expression, dict) or not expression:
        raise ValueError("$hint takes a non-empty option document")
    known = {"repartition", "coalesce", "rebalance", "broadcast", "cache"}
    unknown = set(expression) - known
    if unknown:
        raise ValueError(f"unknown $hint options: {sorted(unknown)}")
    rp = expression.get("repartition")
    if isinstance(rp, dict):
        rp_unknown = set(rp) - {"numPartitions", "by"}
        if rp_unknown:
            raise ValueError(
                f"unknown $hint repartition options: {sorted(rp_unknown)}"
            )
        if not rp.get("by"):
            raise ValueError(
                "$hint repartition object form needs 'by' fields"
            )

    def fn(df: DataFrame, c: Context) -> DataFrame:
        out = df
        if rp is not None:
            if isinstance(rp, dict):
                n = rp.get("numPartitions")
                cols = [nested_col(split_path(k)) for k in rp["by"]]
                out = (
                    out.repartition(int(n), *cols) if n
                    else out.repartition(*cols)
                )
            else:
                out = out.repartition(int(rp))
        co = expression.get("coalesce")
        if co is not None:
            _batch_only("$hint coalesce", c)
            out = out.coalesce(int(co))
        if expression.get("rebalance"):
            out = out.hint("rebalance")
        if expression.get("broadcast"):
            out = F.broadcast(out)
        if expression.get("cache"):
            _batch_only("$hint cache", c)
            out = out.cache()
        return out

    return fn


@register_stage("$explain")
def explain_stage(expression: Any, ctx: Context) -> StageFn:
    """Replace the stream with ONE row holding the upstream plan:
    ``{mode?: "simple" | "extended" | "codegen" | "cost" | "formatted"}``
    (default formatted).  The plan-tuning companion to $hint: pipelines
    under development append ``{"$explain": {}}`` to see exactly what
    Catalyst will run — exchanges, pushed filters, join strategies —
    without executing the full job.  Batch-only, driver-sized output."""
    mode = "formatted"
    if isinstance(expression, dict):
        unknown = set(expression) - {"mode"}
        if unknown:
            raise ValueError(f"unknown $explain options: {sorted(unknown)}")
        mode = expression.get("mode", "formatted")
    elif isinstance(expression, str) and expression:
        mode = expression
    if mode not in ("simple", "extended", "codegen", "cost", "formatted"):
        raise ValueError(f"unknown $explain mode {mode!r}")

    def fn(df: DataFrame, c: Context) -> DataFrame:
        _batch_only("$explain", c)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), mode
        )
        if c.spark is None:
            raise ValueError("$explain needs Context.spark")
        return c.spark.createDataFrame([(mode, plan)], "mode string, plan string")

    return fn


@register_stage("$sql")
def sql_stage(expression: Any, ctx: Context) -> StageFn:
    """Spark-SQL escape hatch: run a SQL statement over the pipeline's
    current frame — ``"SELECT ... FROM {this}"`` or ``{query, views?}``
    where ``views`` is a list of Context collection names additionally
    bound as ``{name}`` template parameters.  Literal braces in the SQL
    (regex quantifiers, JSON literals) must be doubled — ``RLIKE
    'a{{2,3}}'`` — str.format template semantics; unbound fields are a
    compile-time error naming the fix.

    This is a superset stage with no reference analog (the reference's
    escape hatches are $jq/$jslt per-document scripts); it exists so a
    migrating user can express a one-off relational step in plain SQL
    without leaving the pipeline.  The statement is parameterized via
    ``spark.sql(query, **frames)`` — DataFrame template binding, not
    string-interpolated temp views, so no global temp-view namespace is
    touched and two concurrent pipelines can't collide.  Catalyst sees
    one seamless plan: filters/projections in the SQL still push into
    the upstream scan, so there is no optimization boundary and no
    scale cost beyond what the SQL itself does."""
    if isinstance(expression, str):
        query, views = expression, []
    elif isinstance(expression, dict) and "query" in expression:
        unknown = set(expression) - {"query", "views"}
        if unknown:
            raise ValueError(f"unknown $sql options: {sorted(unknown)}")
        query = expression["query"]
        views = list(expression.get("views", []))
    else:
        raise ValueError('$sql takes "SELECT ... FROM {this}" or '
                         '{query, views?}')
    if "{this}" not in query:
        raise ValueError("$sql query must reference {this} (the "
                         "pipeline's current frame)")
    # 'this' is always the pipeline frame; names that collide with
    # SparkSession.sql's own parameters would be swallowed by the call
    reserved = {"this", "self", "sqlQuery", "args", "kwargs"}
    for name in views:
        if name in reserved or not name.isidentifier():
            raise ValueError(
                f"$sql view name {name!r} is reserved or not a valid "
                "identifier")
    # validate every template field up front: str.format semantics make
    # a stray '{2}' (regex quantifier, JSON literal) fail at run time
    # with an unhelpful formatter error otherwise
    import string

    allowed = {"this", *views}
    for _lit, field, _spec, _conv in string.Formatter().parse(query):
        if field is not None and field not in allowed:
            raise ValueError(
                f"$sql template field {{{field}}} is not bound — name it "
                "in views, or escape literal braces as {{ and }} "
                "(e.g. RLIKE 'a{{2,3}}')")

    def fn(df: DataFrame, c: Context) -> DataFrame:
        frames = {"this": df}
        for name in views:
            if name not in c.collections:
                raise ValueError(f"$sql view {name!r} is not a known "
                                 "collection")
            frames[name] = c.collections[name]
        return df.sparkSession.sql(query, **frames)

    return fn
