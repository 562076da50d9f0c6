"""Skew mitigation helpers — the manual levers for when AQE's automatic
skew-join splitting isn't enough (e.g. one key holds 30% of a 100 TB
table).

Two classic techniques:
- **salted aggregation**: shard each hot key across N sub-keys, aggregate
  twice (partial on (key, salt), final on key). Turns one 30 GB reducer
  into N evenly-loaded ones at the cost of a second (tiny) shuffle.
- **salted broadcast-replicated join**: explode the small side N×, salt the
  big side's key — co-locates each hot-key shard with its own copy of the
  matching small-side rows.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, functions as F

DEFAULT_SALTS = 16


def _salt(n_salts: int) -> Column:
    """Deterministic-distribution salt: spread rows uniformly without RNG
    (monotonically_increasing_id is partition-stable)."""
    return F.pmod(F.monotonically_increasing_id(), F.lit(n_salts))


def salted_count(df: DataFrame, keys: Sequence[str],
                 n_salts: int = DEFAULT_SALTS) -> DataFrame:
    """Two-phase salted count per key group: partial on (keys, salt) →
    final on keys. Result is identical to ``df.groupBy(keys).count()``
    but no single reducer ever sees a whole hot key."""
    partial = (df.withColumn("__salt", _salt(n_salts))
               .groupBy(*keys, "__salt")
               .agg(F.count(F.lit(1)).alias("__partial")))
    return (partial.groupBy(*keys)
            .agg(F.sum("__partial").alias("count")))


def salted_sum_count(df: DataFrame, keys: Sequence[str], value: Column,
                     n_salts: int = DEFAULT_SALTS) -> DataFrame:
    """Two-phase salted count+sum per key group: partial on (keys, salt),
    final on keys. Identical rows to
    ``df.groupBy(keys).agg(count(*), sum(value))`` (columns ``n``,
    ``total_value``), but the widest reducer holds 1/n_salts of the
    hottest key — the manual lever for aggregations whose group key is
    too skewed for even AQE's split thresholds (AQE splits skewed JOIN
    partitions, not aggregate hash buckets)."""
    partial = (df.withColumn("__salt", _salt(n_salts))
               .groupBy(*keys, "__salt")
               .agg(F.count(F.lit(1)).alias("__c"),
                    F.sum(value).alias("__s")))
    return (partial.groupBy(*keys)
            .agg(F.sum("__c").alias("n"),
                 F.sum("__s").alias("total_value")))


def salted_join_small(big: DataFrame, small: DataFrame, key: str,
                      n_salts: int = DEFAULT_SALTS) -> DataFrame:
    """Inner equi-join where ``big`` has skewed keys: replicate ``small``
    once per salt and join on (key, salt), so each hot key's rows spread
    over ``n_salts`` reducers. Equivalent rows to ``big.join(small, key)``."""
    salts = F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1))).alias("__salt")
    small_rep = small.select("*", salts)
    big_salted = big.withColumn("__salt", _salt(n_salts))
    return (big_salted.join(small_rep, [key, "__salt"])
            .drop("__salt"))
