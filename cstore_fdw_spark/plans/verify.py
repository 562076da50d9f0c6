"""Optimization observability — the Spark analog of the reference's
``filtered_row_count`` regression harness.

The reference proves block skipping by scraping EXPLAIN ANALYZE's
"Rows Removed by Filter" (reference ``input/block_filtering.source:12-27``:
``a < 200`` on 10,000 ordered rows must remove only 801 rows, not 9,999 —
i.e. ~92% of blocks never reached the filter). Spark hides skipping inside
the Parquet reader, so we assert on:

- the formatted plan's ``PushedFilters`` (predicates reached the scan) and
  ``ReadSchema`` (column pruning reached the scan),
- scan output row counts (``numOutputRows`` of the scan node) — rows the
  reader actually surfaced after row-group/page pruning.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), mode)


def pushed_filters(df: DataFrame) -> list[str]:
    """Predicates that reached the Parquet scan (zone-map parity check)."""
    text = explain_str(df)
    return [m.group(1) for m in
            re.finditer(r"PushedFilters: \[([^\]]*)\]", text) if m.group(1)]


def scan_schema_columns(df: DataFrame) -> list[str]:
    """Columns the Parquet scan actually reads (column-pruning check —
    parity with reference ColumnList, cstore_fdw.c:1841-1941)."""
    text = explain_str(df)
    cols: list[str] = []
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", text):
        for field in m.group(1).split(","):
            name = field.split(":")[0].strip()
            if name:
                cols.append(name)
    return cols


def scan_metrics(df: DataFrame) -> dict[str, int]:
    """Execute the plan and return scan/filter node output-row metrics.

    ``scan_rows``: rows surfaced by the scan (post row-group/page pruning
    + pushed-filter evaluation); ``result_rows``: final count.
    """
    df.collect()
    node = df._jdf.queryExecution().executedPlan()
    scan_rows = _first_scan_output_rows(node)
    return {"scan_rows": scan_rows, "result_rows": df.count()}


def _first_scan_output_rows(node) -> int:
    """DFS the executed plan for the first leaf scan's numOutputRows."""
    name = node.nodeName()
    if "Scan" in name and node.children().isEmpty():
        metrics = node.metrics()
        it = metrics.iterator()
        while it.hasNext():
            kv = it.next()
            if kv._1() == "numOutputRows":
                return kv._2().value()
    n = node.children().size()
    for i in range(n):
        rows = _first_scan_output_rows(node.children().apply(i))
        if rows >= 0:
            return rows
    return -1


def assert_pushdown(df: DataFrame, expect_filter_fragment: str | None = None,
                    expect_columns: set[str] | None = None) -> None:
    """Assert the declarative plan kept pushdown/pruning intact."""
    if expect_filter_fragment is not None:
        pf = " ".join(pushed_filters(df))
        assert expect_filter_fragment in pf, (
            f"filter '{expect_filter_fragment}' not pushed; got [{pf}]")
    if expect_columns is not None:
        actual = set(scan_schema_columns(df))
        assert actual == expect_columns, (
            f"scan reads {sorted(actual)}, expected {sorted(expect_columns)}")


def filtered_row_count(df: DataFrame) -> int:
    """Rows the scan surfaced that the query then discarded — direct
    mirror of the reference's filtered_row_count() UDF
    (input/block_filtering.source:12-27). Small numbers mean skipping
    works."""
    m = scan_metrics(df)
    return m["scan_rows"] - m["result_rows"]
