"""Per-pipeline Features — the analog of ``net.pincette.mongo.Features``
carried by the reference's Context (Context.java:25-26) and consumed by
every stage through ``Expression.function(expr, context.features)`` /
``Match.predicate(query, context.features)`` (AddFields.java:82,
Group.java:169, Match.java:26) and by the script stages
(Jslt.java:27-33 ``customJsltFunctions``/``jsltResolver``,
Jq.java:27-31 ``jqModuleLoader``).

Spark-side the expression/match compilers are pure module-level functions
with ~70 call sites that never see the pipeline :class:`Context`, so the
active pipeline's features are installed in a *scoped stack* for the
duration of pipeline compilation/application (both driver-side and
synchronous).  ``compile_pipeline`` pushes the context; the compilers
consult the stack only on an unknown-operator miss, so **built-ins always
win** — the same precedence the reference applies to stage extensions
(Pipeline.java:275-276).
"""

from __future__ import annotations

import threading
from contextlib import contextmanager
from typing import Any, Callable, Iterator, Optional

# per-THREAD stack of Context objects carrying feature dicts: concurrent
# pipeline compiles (e.g. two streaming queries' foreachBatch threads)
# must not see each other's registries or pop each other's frames
_TLS = threading.local()


def _scope() -> list[Any]:
    stack = getattr(_TLS, "stack", None)
    if stack is None:
        stack = _TLS.stack = []
    return stack


@contextmanager
def active_features(ctx: Any) -> Iterator[None]:
    """Install ``ctx``'s feature registries for the dynamic extent of a
    pipeline compile/run.  Nested pipelines ($lookup sub-pipelines,
    $facet) push again; inner contexts win for their own extent."""
    stack = _scope()
    stack.append(ctx)
    try:
        yield
    finally:
        stack.pop()


def _lookup(attr: str, name: str) -> Optional[Callable]:
    for ctx in reversed(_scope()):
        ext = getattr(ctx, attr, None)
        if ext and name in ext:
            return ext[name]
    return None


def expression_extension(op: str) -> Optional[Callable]:
    """Custom aggregation-expression operator ``$name`` →
    ``(raw_args, ExprContext) -> Column`` — the expressionExtensions
    analog.  Consulted only after the built-in operator table misses."""
    return _lookup("expression_extensions", op)


def match_extension(op: str) -> Optional[Callable]:
    """Custom query operator ``$name`` →
    ``(field_col, raw_arg, ExprContext) -> Column`` (boolean) — the
    matchExtensions analog."""
    return _lookup("match_extensions", op)


def match_extension_names() -> set[str]:
    out: set[str] = set()
    for ctx in _scope():
        ext = getattr(ctx, "match_extensions", None)
        if ext:
            out.update(ext)
    return out
