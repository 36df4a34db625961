"""Physical-plan readers over ``DataFrame.explain`` output.

These parse the explain text (the only stable public surface for plan
inspection from PySpark) instead of walking JVM internals, so they work
on any Spark 3.x/4.x without private-API coupling.
"""

from __future__ import annotations

import io
import re
from contextlib import redirect_stdout

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    """The text ``df.explain(mode)`` prints."""
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


def has_node(df: DataFrame, node: str) -> bool:
    """True if the physical plan contains ``node`` (e.g.
    'BroadcastHashJoin', 'SortMergeJoin', 'TakeOrderedAndProject')."""
    return node in explain_str(df)


def pushed_filters(df: DataFrame) -> list[str]:
    """Filters pushed into the file scan, e.g. ['LessThan(o_orderkey,100)'].

    Empty list means nothing was pushed — rows would be filtered
    post-scan, which at 100 TB is the difference between reading a
    partition and reading the table.
    """
    out: list[str] = []
    for line in explain_str(df).splitlines():
        m = re.search(r"PushedFilters: \[(.*)\]", line)
        if m and m.group(1).strip():
            # entries are ", "-separated; args inside parens have no space
            out.extend(p.strip() for p in m.group(1).split(", "))
    return out


def read_schema_line(df: DataFrame) -> str:
    """The scan's ReadSchema (column-pruning evidence): only the columns
    listed here are decoded from parquet."""
    for line in explain_str(df).splitlines():
        if "ReadSchema" in line:
            return line
    return ""


def codegen_subtree_count(df: DataFrame) -> int:
    """Number of WholeStageCodegen subtrees in the plan (wider = more of
    the pipeline runs as generated JVM code, no virtual calls)."""
    m = re.search(r"Found (\d+) WholeStageCodegen subtrees", explain_str(df, "codegen"))
    return int(m.group(1)) if m else 0
