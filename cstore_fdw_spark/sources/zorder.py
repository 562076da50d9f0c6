"""Z-order (Morton-curve) clustering: multi-column data skipping.

The reference's block skipping is one-dimensional: its zone maps
(``block_filtering`` suite — per-block min/max) only prune scans whose
filter matches the order the data happened to arrive in. Sorting a table
by column A makes A-filters skip almost everything and B-filters skip
NOTHING — at 100 TB a secondary-dimension query re-reads the world.

Z-ordering interleaves the bits of several columns into one sort key, so
files/row-groups become axis-aligned rectangles in value space: every
participating column's min/max range per row group is narrow, and
Parquet's ordinary row-group/page statistics (the engine's zone-map
equivalent, see ``tests/test_pushdown.py``) prune on ANY of the z
columns without any new reader machinery. This is the same layout lever
Delta Lake's OPTIMIZE ZORDER BY applies; here it's a pure write-time
DataFrame transform:

1. normalize each column to a ``bits``-wide integer rank via min/max
   scaling (one tiny aggregate; documented caveat: heavily skewed
   columns want quantile scaling — at that point pass a precomputed
   rank column instead);
2. interleave bits in a single codegen projection (no UDF);
3. range-partition + sort within partitions by the z-value, so each
   output file covers a compact z-range.

Works for any fixed number of integer-castable columns (2-4 are the
useful arities; beyond that the per-column resolution inside a row group
decays — the standard z-order guidance).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from cstore_fdw_spark.catalog import CStoreError

#: default per-column resolution: 2^16 cells per dimension is plenty —
#: resolution only needs to exceed (rows / rows-per-rowgroup)^(1/k)
DEFAULT_BITS = 16


def z_value(cols: list[Column], bits: int = DEFAULT_BITS) -> Column:
    """Interleave the low ``bits`` bits of the given integer columns into
    one Morton code (column i contributes bit j to z-bit ``j*k + i``).
    Pure bitwise arithmetic — whole-stage codegen, no UDF."""
    k = len(cols)
    if not 1 <= k * bits <= 63:
        raise CStoreError(f"{k} columns x {bits} bits exceeds int64")
    z = F.lit(0).cast("long")
    for i, c in enumerate(cols):
        c = c.cast("long")
        for j in range(bits):
            z = z.bitwiseOR(
                F.shiftleft(F.shiftright(c, j).bitwiseAND(F.lit(1)),
                            j * k + i))
    return z


#: equi-depth resolution for quantile scaling: 2^8 cells per dimension —
#: resolution only needs to exceed (rows / rows-per-rowgroup)^(1/k), and
#: 256 boundaries stay a comfortably-sized literal array in codegen
QUANTILE_BITS = 8


def zorder_by(df: DataFrame, cols: list[str], n_files: int,
              bits: int = DEFAULT_BITS,
              scale: str = "minmax") -> DataFrame:
    """Cluster ``df`` on the Morton code of ``cols``: normalize each
    column to [0, 2^bits), interleave, range-partition into ``n_files``
    compact z-ranges and sort within each. Write the result with any
    sink; row-group stats then prune on every z column.

    ``scale`` picks the per-column normalization:

    - ``"minmax"`` (default): global min/max linear scaling — one tiny
      aggregate (2 longs per column), folded in as literals so the
      normalization stays a scan-local projection. Right for roughly
      uniform domains.
    - ``"quantile"``: equi-depth scaling — per-column approximate
      quantile boundaries (2^8 cells) folded in as a literal array,
      rank = #boundaries ≤ value, left-shifted to the ``bits`` grid.
      A heavily skewed column (Zipfian ids, timestamps with hot days)
      lands ~uniform cell occupancy, where min/max scaling would park
      most rows in a handful of cells and per-file spans would stay
      wide on that dimension. Costs one quantile-sketch job at write
      time; boundaries are approximate (layout quality only — data is
      never changed by layout)."""
    if not cols:
        raise CStoreError("zorder_by needs at least one column")
    missing = [c for c in cols if c not in df.columns]
    if missing:
        raise CStoreError(f"z-order column(s) {missing} not in {df.columns}")
    if scale not in ("minmax", "quantile"):
        raise CStoreError(f"unknown z-order scale {scale!r}: "
                          "expected 'minmax' or 'quantile'")
    if scale == "quantile":
        return _zorder_quantile(df, cols, n_files, bits)
    aggs = []
    for c in cols:
        aggs += [F.min(F.col(c).cast("long")).alias(f"mn_{c}"),
                 F.max(F.col(c).cast("long")).alias(f"mx_{c}")]
    stats = df.agg(*aggs).collect()[0]
    scaled = []
    top = (1 << bits) - 1
    for c in cols:
        mn, mx = stats[f"mn_{c}"], stats[f"mx_{c}"]
        if mn is None:
            raise CStoreError(f"z-order column {c} is all NULL")
        span = max(int(mx) - int(mn), 1)  # Python int: exact, no overflow
        if span > (1 << 63) - 1:
            raise CStoreError(
                f"z-order column {c} spans more than half the int64 "
                f"domain ({span}); (v - min) itself overflows long "
                "arithmetic — pre-bucket the column (shift/scale it "
                "into a narrower range) before z-ordering")
        v = F.col(c).cast("long") - F.lit(mn)
        if span * top < (1 << 53):
            # rank = (v - mn) * top / span: the product stays < 2^53 so
            # Spark's double division is EXACT, and cast("long") floors
            # the non-negative result
            scaled.append((v * F.lit(top) / F.lit(span)).cast("long"))
        else:
            # wide domain: a long*long product would overflow int64 and
            # double division would lose precision — rescale by a
            # power-of-two shift instead (pure integer, exact). Ranks
            # land in [0, 2^bits) filling at least the top half of the
            # range, which is all the clustering resolution needs.
            scaled.append(F.shiftright(v, max(0, span.bit_length() - bits)))
    z = z_value(scaled, bits)
    # Grid-aligned file cuts: partition on the TOP ceil(log2 n_files)
    # z-bits rather than sample-based ranges over raw z. A sampled range
    # boundary can fall mid-quadrant, leaving one file straddling a high
    # bit — its span on one dimension degenerates to the full domain.
    # Quantizing to the bit grid makes every file an EXACT axis-aligned
    # rectangle (one z-grid cell). The range partitioner may still merge
    # a pair of Z-CONSECUTIVE cells when its sample under-resolves a
    # boundary — rare, and bounded at one extra cell per file; note a
    # z-consecutive pair can straddle a quadrant boundary, so such a
    # merged file's span on one dimension can exceed two cell edges.
    k = len(cols)
    nb = min(k * bits, max(1, (n_files - 1).bit_length()))
    zb = F.shiftright(z, k * bits - nb)
    return (df.withColumn("__z", z).withColumn("__zb", zb)
            .repartitionByRange(1 << nb, "__zb")
            .sortWithinPartitions("__z")
            .drop("__z", "__zb"))


def _zorder_quantile(df: DataFrame, cols: list[str], n_files: int,
                     bits: int) -> DataFrame:
    """Equi-depth variant of :func:`zorder_by` (``scale="quantile"``):
    rank each column against its own approximate quantile boundaries so
    cell occupancy is ~uniform regardless of the value distribution."""
    qbits = min(bits, QUANTILE_BITS)
    probs = [i / (1 << qbits) for i in range(1, 1 << qbits)]
    # one sketch pass computes every column's boundaries together
    bnds = df.stat.approxQuantile(
        [c for c in cols], probs, 1.0 / (1 << (qbits + 2)))
    scaled = []
    for c, bs in zip(cols, bnds):
        if not bs:
            raise CStoreError(f"z-order column {c} is all NULL")
        arr = F.array(*[F.lit(float(b)) for b in bs])
        rank = F.size(F.filter(
            arr, lambda b: b <= F.col(c).cast("double")))
        scaled.append(F.shiftleft(rank.cast("long"), bits - qbits))
    z = z_value(scaled, bits)
    k = len(cols)
    nb = min(k * bits, max(1, (n_files - 1).bit_length()))
    zb = F.shiftright(z, k * bits - nb)
    return (df.withColumn("__z", z).withColumn("__zb", zb)
            .repartitionByRange(1 << nb, "__zb")
            .sortWithinPartitions("__z")
            .drop("__z", "__zb"))
