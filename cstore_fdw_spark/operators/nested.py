"""Nested-type surface: arrays, structs, JSON.

The reference stores arrays/composites/json as PG Datums and its tests
query them (reference ``input/data_types.source``, ``sql/query.sql:23``
whole-row ``to_json``); Spark's ArrayType/StructType + JSON functions are
the equivalents (SURVEY §1.5 type mapping).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from cstore_fdw_spark.operators import register, table


@register(
    "array_basics",
    category="nested",
    oracle="""
    SELECT vec_id,
           CAST(LEN(embedding) AS BIGINT) AS dim,
           CAST(embedding[1] AS DOUBLE) AS first_val,
           CAST((CAST(embedding[1:3] AS DOUBLE[]))[2] AS DOUBLE) AS slice_second,
           CAST(LIST_MAX(CAST(embedding AS DOUBLE[])) AS DOUBLE) AS max_val,
           CAST(label AS BIGINT) AS label
    FROM embeddings WHERE vec_id < 50
    """)
def array_basics(spark, sf_dir):
    """Array ops: length, element access, slice, array max (float → double
    widening is exact, so values hash identically). Outputs are scalars —
    nested-typed result *columns* are exercised in tests/test_types.py;
    the driver gate compares flat frames."""
    e = table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 50)
    return e.select(
        "vec_id",
        F.size("embedding").cast("long").alias("dim"),
        F.element_at("embedding", 1).cast("double").alias("first_val"),
        F.element_at(F.slice("embedding", 1, 3).cast("array<double>"), 2)
        .alias("slice_second"),
        F.array_max(F.col("embedding").cast("array<double>"))
        .alias("max_val"),
        F.col("label").cast("long").alias("label"))


@register(
    "array_explode_position",
    category="nested",
    oracle="""
    SELECT vec_id,
           GENERATE_SUBSCRIPTS(embedding, 1) AS pos,
           CAST(UNNEST(embedding) AS DOUBLE) AS val
    FROM embeddings WHERE vec_id < 10
    """)
def array_explode_position(spark, sf_dir):
    """UNNEST / explode with ordinality (UDTF-class operator; Spark
    posexplode is 0-based → +1 to match SQL subscripts)."""
    e = table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 10)
    return (e.select("vec_id", F.posexplode("embedding"))
            .select("vec_id", (F.col("pos") + 1).cast("long").alias("pos"),
                    F.col("col").cast("double").alias("val")))


@register(
    "array_transform_filter",
    category="nested",
    oracle="""
    SELECT vec_id,
           CAST(LEN(LIST_FILTER(embedding, x -> x > 0)) AS BIGINT) AS n_positive,
           CAST(LIST_SORT(LIST_TRANSFORM(embedding[1:4], x -> CAST(x AS DOUBLE) * 2))[1]
                AS DOUBLE) AS smallest_doubled,
           CAST(LIST_SUM(LIST_TRANSFORM(CAST(embedding AS DOUBLE[]),
                x -> CASE WHEN x > 0 THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END))
                AS BIGINT) AS n_positive_agg
    FROM embeddings WHERE vec_id < 20
    """)
def array_transform_filter(spark, sf_dir):
    """Higher-order array functions: filter + transform + sort + aggregate
    lambdas (host-executor-class capability); scalar outputs for the gate."""
    e = table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 20)
    return e.select(
        "vec_id",
        F.size(F.filter("embedding", lambda x: x > 0)).cast("long")
        .alias("n_positive"),
        F.element_at(
            F.array_sort(F.transform(F.slice("embedding", 1, 4),
                                     lambda x: x.cast("double") * 2)), 1)
        .alias("smallest_doubled"),
        F.aggregate(F.col("embedding").cast("array<double>"),
                    F.lit(0).cast("long"),
                    lambda acc, x: acc + F.when(x > 0, 1).otherwise(0))
        .alias("n_positive_agg"))


@register(
    "struct_pack_access",
    category="nested",
    oracle="""
    SELECT n_nationkey,
           {'name': n_name, 'region': n_regionkey}.name AS info_name,
           CAST({'name': n_name, 'region': n_regionkey}.region AS INTEGER)
             AS info_region
    FROM nation
    """)
def struct_pack_access(spark, sf_dir):
    """Composite (struct) construction + field access (reference composite
    type tests, input/data_types.source:33-45); the struct is built
    in-plan, outputs are its extracted fields (struct-typed result columns
    are covered in tests/test_types.py)."""
    n = table(spark, sf_dir, "nation")
    info = F.struct(F.col("n_name").alias("name"),
                    F.col("n_regionkey").alias("region"))
    return n.select("n_nationkey",
                    info.getField("name").alias("info_name"),
                    info.getField("region").alias("info_region"))


@register(
    "json_get_field",
    category="nested",
    oracle="""
    SELECT event_type,
           CAST(SUM(CAST(props->>'$.k' AS BIGINT)) AS BIGINT) AS sum_k,
           COUNT(*) AS n
    FROM events GROUP BY event_type ORDER BY event_type
    """)
def json_get_field(spark, sf_dir):
    """JSON field extraction + aggregation over the extracted value
    (reference stores json as text and queries via PG json ops)."""
    e = table(spark, sf_dir, "events")
    return (e.groupBy("event_type")
            .agg(F.sum(F.get_json_object("props", "$.k").cast("long"))
                 .alias("sum_k"),
                 F.count(F.lit(1)).alias("n"))
            .orderBy("event_type"))


@register(
    "to_json_row",
    category="nested",
    oracle="""
    SELECT n_nationkey,
           CONCAT('{"key":', CAST(n_nationkey AS VARCHAR),
                  ',"name":"', n_name, '"}') AS row_json
    FROM nation
    """)
def to_json_row(spark, sf_dir):
    """Whole-row to_json (reference sql/query.sql:23 ``to_json(v)``).
    Engines' native JSON serializers differ in whitespace/quoting, so the
    canonical JSON text is assembled with identical string expressions on
    both sides; the Spark side still demonstrates the native path via
    an F.to_json round-trip check in tests."""
    n = table(spark, sf_dir, "nation")
    return n.select(
        "n_nationkey",
        F.concat(F.lit('{"key":'), F.col("n_nationkey").cast("string"),
                 F.lit(',"name":"'), F.col("n_name"), F.lit('"}'))
        .alias("row_json"))


@register(
    "map_props_access",
    category="nested",
    oracle="""
    SELECT event_id,
           CAST(props->>'$.k' AS BIGINT) AS k_val,
           CAST(LEN(json_keys(props)) + 1 AS BIGINT) AS n_keys,
           CAST(2 * (CAST(props->>'$.k' AS BIGINT) + LENGTH(event_type))
                AS BIGINT) AS sum_doubled
    FROM events WHERE event_id % 5 = 0
    """)
def map_props_access(spark, sf_dir):
    """MAP-typed column surface (the one nested type array/struct/json
    queries don't touch): ``props`` parsed as ``map<string,bigint>``
    via from_json, then the map-function family end-to-end —
    ``element_at`` lookup, ``map_concat`` enrichment with a computed
    entry, ``transform_values`` (higher-order map rewrite),
    ``map_values`` + ``aggregate`` fold, ``size``. All JVM built-ins in
    whole-stage codegen; zero shuffle (pure projection). The oracle
    recomputes each result through DuckDB's JSON functions."""
    e = table(spark, sf_dir, "events").filter(F.col("event_id") % 5 == 0)
    m = F.from_json("props", "map<string,bigint>")
    enriched = F.map_concat(
        m, F.create_map(F.lit("etype_len"),
                        F.length("event_type").cast("long")))
    doubled = F.transform_values(enriched, lambda _k, v: v * 2)
    return e.select(
        "event_id",
        F.element_at(m, "k").alias("k_val"),
        F.size(enriched).cast("long").alias("n_keys"),
        F.aggregate(F.map_values(doubled), F.lit(0).cast("long"),
                    lambda acc, v: acc + v).alias("sum_doubled"))
