"""catalog.sql(): the reference's AUTOMATIC column pruning for SQL
access to cstore-format tables (A2, cstore_fdw.c:1841-1941 — every
query's ColumnList prunes the scan, not only read(columns=...) callers).

The byte-span proof that a pruned reader schema never touches cold
columns' skip lists/exists/value buffers lives in
test_cstore_format.py::test_cstore_arrow_projection_never_reads_unwanted_columns;
these tests close the chain by asserting the SQL path actually BINDS
that pruned reader (the DSv2 leaf's output carries only the referenced
columns) and that results and session state stay intact."""
import pyspark.sql.functions as F
import pytest

from cstore_fdw_spark.catalog import CStoreCatalog
from cstore_fdw_spark.plans.prune import _seq


def _dsv2_leaf_columns(df):
    """Output column names of every DataSourceV2Relation leaf in the
    analyzed plan (the schema the python cstore reader decodes)."""
    leaves = []

    def walk(node):
        if node.getClass().getSimpleName() == "DataSourceV2Relation":
            leaves.append([a.name() for a in _seq(node.output())])
        for ch in _seq(node.children()):
            walk(ch)
        for sub in _seq(node.subqueries()):
            walk(sub)

    walk(df._jdf.queryExecution().analyzed())
    return leaves


@pytest.fixture()
def wide_cat(spark, tmp_path):
    cat = CStoreCatalog(spark, warehouse=str(tmp_path / "wh"))
    cat.create_table(
        "wide6", "a BIGINT, b BIGINT, c STRING, d DOUBLE, e STRING, "
        "f BIGINT", storage_format="cstore", stripe_row_count=10000,
        block_row_count=1000)
    df = spark.range(0, 300).select(
        F.col("id").alias("a"), (F.col("id") % 9).alias("b"),
        F.concat(F.lit("pad-"), F.col("id")).alias("c"),
        (F.col("id") / 3.0).alias("d"),
        F.lit("cold-wide-text").alias("e"),
        (F.col("id") % 7).alias("f"))
    cat.insert("wide6", df)
    return cat, df


def test_sql_autoprune_registered_table(spark, wide_cat):
    """A 2-column aggregate over a registered ≥6-column cstore table
    decodes ONLY the referenced columns (+ the epoch carrier)."""
    cat, df = wide_cat
    cat.register_table("wide6")
    try:
        q = ("select b, sum(f) as s from wide6 where a > 10 "
             "group by b")
        out = cat.sql(q)
        leaves = _dsv2_leaf_columns(out)
        assert leaves, "expected a cstore DSv2 scan in the plan"
        for cols in leaves:
            assert set(cols) == {"a", "b", "f", "__cstore_epoch"}, cols
        want = (df.filter("a > 10").groupBy("b")
                .agg(F.sum("f").alias("s")).collect())
        assert sorted(map(tuple, out.collect())) == \
            sorted(map(tuple, want))
        # the shadow view is gone: plain spark.sql sees the catalog
        # table again, full-width
        assert "wide6" not in {
            t.name for t in spark.catalog.listTables() if t.isTemporary}
        full = _dsv2_leaf_columns(spark.sql("select b from wide6"))
        assert {"c", "d", "e"} < set(full[0])
    finally:
        spark.sql("drop table if exists wide6")


def test_sql_autoprune_count_star_reads_cheapest_column(spark, wide_cat):
    """COUNT(*) references no columns — the scan still needs row
    multiplicity, so exactly one (narrowest) column is read."""
    cat, df = wide_cat
    cat.register_table("wide6")
    try:
        out = cat.sql("select count(*) as n from wide6")
        (cols,) = _dsv2_leaf_columns(out)
        data_cols = [c for c in cols if c != "__cstore_epoch"]
        assert len(data_cols) == 1
        assert out.collect()[0].n == 300
    finally:
        spark.sql("drop table if exists wide6")


def test_sql_autoprune_sql_view_restores_full_binding(spark, wide_cat):
    """sql_view bindings prune during cat.sql and come back full-width
    afterwards (later plain spark.sql still sees every column)."""
    cat, df = wide_cat
    cat.sql_view("wide6")
    out = cat.sql("select max(d) as m from wide6")
    (cols,) = _dsv2_leaf_columns(out)
    assert set(cols) == {"d", "__cstore_epoch"}
    assert out.collect()[0].m == df.agg(F.max("d")).collect()[0][0]
    # binding restored: full width for direct spark.sql
    full = spark.sql("select * from wide6")
    (cols_full,) = _dsv2_leaf_columns(full)
    assert {"a", "b", "c", "d", "e", "f"} <= set(cols_full)
    spark.catalog.dropTempView("wide6")


def test_sql_autoprune_leaves_user_views_alone(spark, wide_cat):
    """A user's own temp view named like a cstore table is NEVER
    shadow-rebound — cat.sql degrades to plain spark.sql semantics."""
    cat, df = wide_cat
    spark.createDataFrame([(1, 2)], "a long, b long") \
        .createOrReplaceTempView("wide6")
    out = cat.sql("select a, b from wide6")
    assert out.collect() == [(1, 2)]
    assert spark.sql("select a, b from wide6").collect() == [(1, 2)]
    spark.catalog.dropTempView("wide6")


def test_sql_autoprune_full_width_query_unchanged(spark, wide_cat):
    """SELECT * keeps the plain binding (nothing to prune)."""
    cat, df = wide_cat
    cat.sql_view("wide6")
    out = cat.sql("select * from wide6 where a < 5")
    (cols,) = _dsv2_leaf_columns(out)
    assert {"a", "b", "c", "d", "e", "f"} <= set(cols)
    assert out.count() == 5
    spark.catalog.dropTempView("wide6")


def test_sql_autoprune_self_join_unions_instances(spark, wide_cat):
    """Two instances of the same table prune to the UNION of their
    referenced columns (exprIds are per-instance; pruning re-binds the
    NAME once)."""
    cat, df = wide_cat
    cat.sql_view("wide6")
    out = cat.sql(
        "select x.b as xb, y.f as yf from wide6 x join wide6 y "
        "on x.a = y.a where y.d > 1.0")
    for cols in _dsv2_leaf_columns(out):
        assert set(cols) == {"a", "b", "d", "f", "__cstore_epoch"}
    want = (df.alias("x").join(df.alias("y"), "a")
            .filter(F.col("y.d") > 1.0)
            .select(F.col("x.b").alias("xb"), F.col("y.f").alias("yf"))
            .collect())
    assert sorted(map(tuple, out.collect())) == sorted(map(tuple, want))
    spark.catalog.dropTempView("wide6")


def test_sql_autoprune_renamed_view_pruned(spark, wide_cat):
    """sql_view(name, view_name=...) records the alias→table mapping,
    so queries against the differently-named view ALSO prune."""
    cat, df = wide_cat
    cat.sql_view("wide6", view_name="w6alias")
    out = cat.sql("select max(d) as m from w6alias")
    (cols,) = _dsv2_leaf_columns(out)
    assert set(cols) == {"d", "__cstore_epoch"}
    assert out.collect()[0].m == df.agg(F.max("d")).collect()[0][0]
    # binding restored full-width under the alias
    (cols_full,) = _dsv2_leaf_columns(spark.sql("select * from w6alias"))
    assert {"a", "b", "c", "d", "e", "f"} <= set(cols_full)
    spark.catalog.dropTempView("w6alias")


def test_sql_autoprune_restores_bindings_on_error(spark, wide_cat,
                                                  monkeypatch):
    """If the pruned re-run raises AFTER shadows were created, the
    finally block restores every binding — no narrowed schema leaks
    into the session."""
    cat, df = wide_cat
    cat.sql_view("wide6")
    real_sql = spark.sql
    calls = {"n": 0}

    def flaky(q, *a, **k):
        calls["n"] += 1
        if calls["n"] == 2:  # the pruned re-run
            raise RuntimeError("injected: pruned re-run failed")
        return real_sql(q, *a, **k)

    monkeypatch.setattr(spark, "sql", flaky)
    with pytest.raises(RuntimeError, match="injected"):
        cat.sql("select max(d) as m from wide6")
    monkeypatch.undo()
    # the full-width sql_view binding is back
    (cols_full,) = _dsv2_leaf_columns(spark.sql("select * from wide6"))
    assert {"a", "b", "c", "d", "e", "f"} <= set(cols_full)
    spark.catalog.dropTempView("wide6")
