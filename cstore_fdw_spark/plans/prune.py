"""Analyzed-plan column resolution — which columns of which table a SQL
query actually touches.

The reference prunes EVERY query automatically: its planner walks the
RestrictInfo/targetlist attributes into a ColumnList and the reader
never touches unwanted columns' buffers (``cstore_fdw.c:1841-1941``).
Spark gives parquet/orc the same for free through Catalyst's
ColumnPruning + scan ReadSchema, but the python DataSource API (the
``format("cstore")`` v1.7 reader) has no pruning pushdown — the reader
must be TOLD its projection via the ``column_positions`` option
(:meth:`CStoreCatalog.read` does this for ``columns=[...]`` callers).

This module closes the SQL half: given an ANALYZED plan, compute for
each named table boundary (``SubqueryAlias``) the set of its output
columns referenced anywhere above it. ``CStoreCatalog.sql`` uses that
to re-bind cstore-format tables to pruned readers before execution, so
``spark.sql``-style access gets the reference's A2 without the caller
naming columns.

Implementation notes (plain py4j tree walk, no private Python APIs
beyond ``df._jdf``):

- needed(boundary B) = { a ∈ B.output : a.exprId referenced by any
  ANCESTOR node's expressions } ∪ (B.output ∩ final plan output).
  Attribute exprIds are globally unique per relation instance, so a
  self-join's two instances accumulate into one per-name union — the
  right granularity, since pruning re-binds the NAME.
- expression-embedded subquery plans (IN/EXISTS/scalar subqueries) are
  walked too; a subquery's own output is consumed by the enclosing
  expression, so it seeds that subtree's reference set.
- a node's ``references()`` spans all its children; propagating it to
  every child over-approximates per-child (a join key of the left side
  lands in the right child's set) — harmless, exprIds don't collide
  across instances, so the intersection at each boundary stays exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def _seq(jseq) -> list:
    return [jseq.apply(i) for i in range(jseq.size())]


def _ids(jattrset) -> set[int]:
    out = set()
    it = jattrset.iterator()
    while it.hasNext():
        out.add(it.next().exprId().id())
    return out


def referenced_table_columns(df: DataFrame,
                             names: set[str]) -> dict[str, set[str]]:
    """Columns of each named table that ``df``'s analyzed plan actually
    references, keyed by (case-insensitive, unqualified) table name.

    A name appearing as several ``SubqueryAlias`` boundaries (self-join,
    repeated CTE use) unions its instances. Names never found in the
    plan are absent from the result.
    """
    jplan = df._jdf.queryExecution().analyzed()
    lowered = {n.lower() for n in names}
    needed: dict[str, set[str]] = {}
    top = {a.exprId().id() for a in _seq(jplan.output())}

    def walk(node, above: set[int]) -> None:
        if node.getClass().getSimpleName() == "SubqueryAlias":
            alias = node.alias().lower()
            if alias in lowered:
                hit = {a.name() for a in _seq(node.output())
                       if a.exprId().id() in above}
                needed.setdefault(alias, set()).update(hit)
        refs = above | _ids(node.references())
        for child in _seq(node.children()):
            walk(child, refs)
        for sub in _seq(node.subqueries()):
            walk(sub, refs | {a.exprId().id()
                              for a in _seq(sub.output())})

    walk(jplan, top)
    return needed


def boundary_schema(df: DataFrame, name: str) -> list[str] | None:
    """Output column names at the first ``SubqueryAlias`` boundary named
    ``name`` (case-insensitive) in ``df``'s analyzed plan, or None if
    the name never appears. Used to verify a name still resolves to the
    catalog-shaped relation before shadow-rebinding it."""
    jplan = df._jdf.queryExecution().analyzed()
    want = name.lower()
    found: list[list[str]] = []

    def walk(node) -> None:
        if found:
            return
        if (node.getClass().getSimpleName() == "SubqueryAlias"
                and node.alias().lower() == want):
            found.append([a.name() for a in _seq(node.output())])
            return
        for child in _seq(node.children()):
            walk(child)
        for sub in _seq(node.subqueries()):
            walk(sub)

    walk(jplan)
    return found[0] if found else None
