"""Pipeline compiler — the Spark analog of ``Pipeline.create``
(reference: src/main/java/net/pincette/mongo/streams/Pipeline.java:273-299).

A pipeline is a JSON array of one-key stage objects.  Each stage name maps
to a *compiler* ``(expression, Context) -> (DataFrame -> DataFrame)``; the
whole pipeline folds left-to-right into one DataFrame program, which is
then analyzed/optimized/planned by Catalyst (the reference's linear
``box(processor, stage)`` fold has no optimizer — SURVEY.md §3/§4).

Deliberate deviation (documented): unknown stage names raise instead of
being silently ignored (reference Pipeline.java:264-266 skips them).
"""

from __future__ import annotations

from typing import Any, Callable

from pyspark.sql import DataFrame

from .context import Context
from .features import active_features

StageFn = Callable[[DataFrame, Context], DataFrame]
StageCompiler = Callable[[Any, Context], StageFn]

_STAGES: dict[str, StageCompiler] = {}


def register_stage(name: str) -> Callable[[StageCompiler], StageCompiler]:
    def deco(fn: StageCompiler) -> StageCompiler:
        _STAGES[name] = fn
        return fn

    return deco


def stage_names() -> list[str]:
    return sorted(_STAGES)


def compile_stage(name: str, expression: Any, ctx: Context) -> StageFn:
    compiler = _STAGES.get(name) or ctx.stage_extensions.get(name)
    if name in _STAGES:  # built-ins win over extensions (Pipeline.java:275-276)
        compiler = _STAGES[name]
    if compiler is None:
        raise ValueError(f"unknown pipeline stage {name!r}")
    return compiler(expression, ctx)


def compile_pipeline(pipeline: list[dict], ctx: Context) -> Callable[[DataFrame], DataFrame]:
    """Compile a pipeline (list of one-key stage objects) to a DataFrame
    transformation.  ``_trace``/``_collection`` extension keys on a stage
    object are accepted and stripped (Pipeline.java:210,324-326)."""
    from .plans.optimize import optimize_pipeline

    stages: list[tuple[str, Any]] = []
    for stage_obj in optimize_pipeline(pipeline):
        names = [k for k in stage_obj if k.startswith("$")]
        if len(names) != 1:
            raise ValueError(f"stage object must have exactly one $-key: {stage_obj}")
        stages.append((names[0], stage_obj[names[0]]))

    # stages precompile at construction, mirroring Pipeline.create's
    # expression precompilation (Pipeline.java:273-299); invalid stage
    # specs fail here, not at first run.  The context's Features analog
    # (expression/match extensions — Context.java:25-26) is in scope for
    # both the precompile and every application of the pipeline.
    with active_features(ctx):
        compiled = [(name, compile_stage(name, expression, ctx))
                    for name, expression in stages]

    def run(df: DataFrame) -> DataFrame:
        with active_features(ctx):
            out = df
            for _name, fn in compiled:
                out = fn(out, ctx)
            # Atlas never exposes score metadata unless the user asked for
            # it via {"$meta": ...} — which copies the value into a user
            # column.  The hidden score columns bound by $vectorSearch /
            # $search (operators/atlas.py) are dropped at pipeline end so
            # unprojected pipelines don't grow a synthetic column.
            meta_cols = [c for c in out.columns if c.startswith("__meta_")]
            if meta_cols:
                out = out.drop(*meta_cols)
            return out

    return run


class Pipeline:
    """Convenience façade mirroring the reference's entry point."""

    @staticmethod
    def create(ctx: Context, pipeline: list[dict]) -> Callable[[DataFrame], DataFrame]:
        return compile_pipeline(pipeline, ctx)


# importing the operator modules registers the built-in stages
from .operators import (  # noqa: E402,F401
    group as _group,
    lookup as _lookup,
    merge as _merge,
    stateless as _stateless,
    dedup as _dedup,
    effects as _effects,
    script as _script,
    extended as _extended,
    graphcc as _graphcc,
    timeseries as _timeseries,
    tuning as _tuning,
    atlas as _atlas,
)
from .functions import datapipe as _datapipe  # noqa: E402,F401
