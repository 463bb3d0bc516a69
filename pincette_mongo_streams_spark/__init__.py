"""pincette_mongo_streams_spark — a PySpark-native engine with the query
and data-processing capabilities of wdonne/pincette-mongo-streams.

The reference compiles a MongoDB aggregation pipeline (JSON array of stage
objects) into a reactive-streams processor over Kafka messages
(reference Pipeline.java:273-299).  This engine compiles the same pipeline
language into DataFrame programs: every stage becomes declarative Catalyst
Columns wherever semantics allow, so predicate pushdown, column pruning,
whole-stage codegen, and shuffle planning come from Spark; the same
compiled stages run in batch (correctness harness) and Structured
Streaming (parity with the reference's infinite-stream model).

Public API::

    from pincette_mongo_streams_spark import Context, Pipeline, compile_pipeline

    ctx = Context(spark=spark, collections={"dim": dim_df})
    run = compile_pipeline([{ "$match": {...} }, { "$group": {...} }], ctx)
    out = run(input_df)

Documented deviations from the reference (see also README.md):
- unknown stages raise (reference silently ignores — Pipeline.java:264-266);
- ``$stdDevPop`` emits real population stddev (the reference emits the
  running count — Group.java:451-453, a quirk);
- fixed-schema semantics: "missing field" ≈ null, per-row ``$$REMOVE``
  degrades to null outside statically-decidable spots;
- ``$group`` streaming emission is per micro-batch (update mode), not
  per message.
"""

from .context import Context
from .expressions import ExprContext, compile_expr
from .match import compile_match
from .pipeline import Pipeline, compile_pipeline, stage_names

__all__ = [
    "Context",
    "ExprContext",
    "Pipeline",
    "compile_expr",
    "compile_match",
    "compile_pipeline",
    "stage_names",
]

__version__ = "0.1.0"
