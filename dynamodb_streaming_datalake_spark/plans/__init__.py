"""Plan introspection (no custom Catalyst rules — per SURVEY §4 the
reference has no optimizer to port; Catalyst subsumes it. What lives
here is the *verification* layer: helpers that read a DataFrame's
physical plan so tests and tooling can assert the plan-shape invariants
the operators promise — broadcast dim joins, parquet pushdown/pruning,
partial aggregation, TakeOrderedAndProject top-k, codegen spans)."""

from dynamodb_streaming_datalake_spark.plans.explain import (
    codegen_subtree_count,
    explain_str,
    has_node,
    pushed_filters,
    read_schema_line,
)

__all__ = [
    "explain_str",
    "has_node",
    "pushed_filters",
    "read_schema_line",
    "codegen_subtree_count",
]
