"""Pipeline-level rewrite passes run before stage compilation.

The reference has no optimizer (stages execute in written order —
Pipeline.java:295-298); Catalyst gives us expression-level optimization
for free, but *cross-stage* rewrites on the pipeline JSON are ours to do.
This module holds those peephole passes.

Current passes:

- **size-only $lookup** — when the array a ``$lookup`` produces is consumed
  ONLY as ``{"$size": "$as"}`` by an immediately-following include-mode
  ``$project`` (which therefore drops the array itself), the lookup can
  count matches per key instead of materializing ``collect_list(struct(*))``
  arrays.  At 100 TB this is the difference between shuffling/broadcasting
  the entire foreign table packed into arrays and shuffling one long per
  key — the analog of Catalyst pruning a project through an aggregate,
  done at the pipeline level where Catalyst can't see across our stage
  boundary.
"""

from __future__ import annotations

from typing import Any

SIZE_ONLY_FLAG = "__countOnly__"


def _references(node: Any, ref: str) -> list[Any]:
    """All string nodes equal to ``ref`` or starting with ``ref + '.'``,
    paired with their parent container."""
    out: list[tuple[Any, Any]] = []

    def walk(n: Any, parent: Any) -> None:
        if isinstance(n, str) and (n == ref or n.startswith(ref + ".")):
            out.append((n, parent))
        elif isinstance(n, list):
            for v in n:
                walk(v, n)
        elif isinstance(n, dict):
            for v in n.values():
                walk(v, n)

    walk(node, None)
    return out


def _is_exclude_mode(spec: dict) -> bool:
    vals = [v for k, v in spec.items() if k != "_id"]
    return bool(vals) and all(v in (0, False) for v in vals)


def _whole_doc_ref(node: Any) -> bool:
    """True when any string node can reach the whole document — ``$$ROOT``
    / ``$$CURRENT`` (directly or via a path) carry the as-field without
    naming it, so the size-only rewrite must not fire."""
    if isinstance(node, str):
        return node.startswith("$$ROOT") or node.startswith("$$CURRENT")
    if isinstance(node, list):
        return any(_whole_doc_ref(v) for v in node)
    if isinstance(node, dict):
        return any(_whole_doc_ref(v) for v in node.values())
    return False


def _size_only_project(spec: dict, as_field: str) -> bool:
    """True when an include/compute-mode $project references ``$as_field``
    only as the operand of ``$size`` and does not pass the array through."""
    if not isinstance(spec, dict) or _is_exclude_mode(spec):
        return False
    if _whole_doc_ref(spec):
        return False
    ref = "$" + as_field
    refs = _references(spec, ref)
    for value, parent in refs:
        if value != ref:  # "$as.sub" — element access, needs the array
            return False
        if not (isinstance(parent, dict) and parent == {"$size": ref}):
            return False
    for key, value in spec.items():
        if key == as_field or key.startswith(as_field + "."):
            if value in (1, True):  # passthrough include of the array
                return False
    return True


def _rewrite_size_nodes(node: Any, ref: str) -> Any:
    if isinstance(node, dict):
        if node == {"$size": ref}:
            return ref
        return {k: _rewrite_size_nodes(v, ref) for k, v in node.items()}
    if isinstance(node, list):
        return [_rewrite_size_nodes(v, ref) for v in node]
    return node


def _size_only_lookup_pass(stages: list[dict]) -> list[dict]:
    out: list[dict] = list(stages)
    for i, stage in enumerate(out[:-1]):
        if set(k for k in stage if k.startswith("$")) != {"$lookup"}:
            continue
        spec = stage["$lookup"]
        if not isinstance(spec, dict) or spec.get("unwind"):
            continue
        as_field = spec.get("as")
        nxt = out[i + 1]
        if not as_field or set(k for k in nxt if k.startswith("$")) != {"$project"}:
            continue
        proj = nxt["$project"]
        if not _size_only_project(proj, as_field):
            continue
        out[i] = {**stage, "$lookup": {**spec, SIZE_ONLY_FLAG: True}}
        out[i + 1] = {**nxt, "$project": _rewrite_size_nodes(proj, "$" + as_field)}
    return out


def optimize_pipeline(stages: list[dict]) -> list[dict]:
    """Apply all pipeline-level rewrite passes (pure JSON→JSON)."""
    return _size_only_lookup_pass(stages)
