"""UDF surface: row Python UDF, Arrow-vectorized pandas UDFs (scalar +
grouped-agg), grouped-map applyInPandas, and a Python UDTF.

The reference's users get arbitrary PL/pgSQL / SQL functions over cstore
tables (reference ``input/block_filtering.source:12-27``,
``sql/truncate.sql:72-78``); this is the Spark equivalent ladder, slowest
to fastest: row UDF (demo only — the engine's guidance is built-ins
first), pandas UDF (Arrow batches), JVM built-ins.

Every UDF here computes integer/string results only, so outputs are
deterministic and oracle-checkable.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf, udf

from cstore_fdw_spark.operators import register, table


@register(
    "udf_python_row",
    category="udf",
    oracle="""
    SELECT p_partkey,
           CASE WHEN p_size < 10 THEN 'small'
                WHEN p_size < 30 THEN 'medium'
                ELSE 'large' END AS size_class
    FROM part
    """)
def udf_python_row(spark, sf_dir):
    """Row-at-a-time Python UDF (the slow path, kept off hot paths — here
    to declare the capability; the oracle is the CASE it replaces)."""
    @udf("string")
    def size_class(size: int) -> str:
        if size < 10:
            return "small"
        if size < 30:
            return "medium"
        return "large"
    p = table(spark, sf_dir, "part")
    return p.select("p_partkey", size_class("p_size").alias("size_class"))


@register(
    "udf_pandas_scalar",
    category="udf",
    oracle="""
    SELECT o_orderkey,
           CAST(ROUND(CAST(o_totalprice AS DECIMAL(12,2)) * 100) AS BIGINT)
             AS price_cents,
           CAST(o_orderkey % 97 AS BIGINT) AS shard
    FROM orders
    """)
def udf_pandas_scalar(spark, sf_dir):
    """Arrow-vectorized scalar pandas UDF (integer cents — exact)."""
    @pandas_udf("long")
    def to_cents(price: pd.Series) -> pd.Series:
        # same rounding as the decimal cast: half away from zero at 2 dp
        return (price * 100).round().astype("int64")

    @pandas_udf("long")
    def shard_of(key: pd.Series) -> pd.Series:
        return key % 97

    o = table(spark, sf_dir, "orders")
    return o.select("o_orderkey",
                    to_cents("o_totalprice").alias("price_cents"),
                    shard_of("o_orderkey").alias("shard"))


@register(
    "udf_pandas_grouped_agg",
    category="udf",
    oracle="""
    SELECT c_mktsegment,
           CAST(MEDIAN(c_custkey) AS DOUBLE) AS median_key,
           CAST(MAX(c_custkey) - MIN(c_custkey) AS BIGINT) AS key_span
    FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment
    """)
def udf_pandas_grouped_agg(spark, sf_dir):
    """GROUPED_AGG pandas UDF (UDAF surface): median over int keys —
    exact half-sums, deterministic."""
    @pandas_udf("double")
    def median_of(keys: pd.Series) -> float:
        return float(keys.median())

    @pandas_udf("long")
    def span_of(keys: pd.Series) -> int:
        return int(keys.max() - keys.min())

    c = table(spark, sf_dir, "customer")
    return (c.groupBy("c_mktsegment")
            .agg(median_of("c_custkey").alias("median_key"),
                 span_of("c_custkey").alias("key_span"))
            .orderBy("c_mktsegment"))


@register(
    "udf_grouped_map_rank",
    category="udf",
    oracle="""
    SELECT n_regionkey, n_nationkey,
           CAST(ROW_NUMBER() OVER (PARTITION BY n_regionkey
                                   ORDER BY n_name) AS BIGINT) AS name_rank
    FROM nation
    """)
def udf_grouped_map_rank(spark, sf_dir):
    """Grouped-map applyInPandas (custom per-group logic in pandas):
    alphabetical rank within region — the window-function oracle proves
    the custom operator's semantics."""
    def rank_group(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("n_name").reset_index(drop=True)
        pdf["name_rank"] = pdf.index + 1
        return pdf[["n_regionkey", "n_nationkey", "name_rank"]]

    n = table(spark, sf_dir, "nation")
    return (n.groupBy("n_regionkey")
            .applyInPandas(rank_group,
                           "n_regionkey int, n_nationkey int, name_rank long"))


@register(
    "udtf_split_words",
    category="udf",
    oracle="""
    SELECT doc_id, UNNEST(STRING_SPLIT(text, ' ')) AS word
    FROM documents WHERE doc_id < 20
    """)
def udtf_split_words(spark, sf_dir):
    """Python UDTF (table function): tokenize documents into rows — the
    Python-side equivalent of explode(split(..)), declared to cover PG's
    set-returning-function surface."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="doc_id bigint, word string")
    class SplitWords:
        def eval(self, doc_id: int, text: str):
            for word in text.split(" "):
                yield doc_id, word

    d = (table(spark, sf_dir, "documents").filter(F.col("doc_id") < 20)
         .select("doc_id", "text"))
    spark.udtf.register("split_words_udtf", SplitWords)
    d.createOrReplaceTempView("docs_for_udtf")
    return spark.sql("""
        SELECT t.doc_id, t.word
        FROM docs_for_udtf, LATERAL split_words_udtf(doc_id, text) t
    """)
