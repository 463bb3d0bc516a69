"""Plan inspection helpers — Catalyst does the optimizing (SURVEY.md §4);
these utilities make it observable so operators can be tuned to the plan
you'd want (pushdown reached the scan, joins broadcast, codegen spans)."""

from .inspect import explain_str, pushed_filters, has_broadcast  # noqa: F401
