"""Occupancy-targeted LSH bit counts (VERDICT r12 task 3).

bits = smallest b in [LSH_BITS, LSH_MAX_BITS] with
N <= LSH_TARGET_OCCUPANCY·2^b, chosen by pure integer comparisons so
the DuckDB oracles recompute the identical value from COUNT(*) — no
float log2 whose ulp behavior could diverge across engines."""
import duckdb
import pytest

from cstore_fdw_spark.operators.similarity import (
    LSH_BITS, LSH_MAX_BITS, LSH_TARGET_OCCUPANCY, _plane_matrix,
    lsh_bits_for, lsh_bits_sql)


def test_bits_floor_cap_and_growth():
    assert lsh_bits_for(0) == LSH_BITS
    assert lsh_bits_for(500) == LSH_BITS          # sf0.001
    assert lsh_bits_for(2_000) == LSH_BITS        # sf0.01 gate: unchanged
    assert lsh_bits_for(LSH_TARGET_OCCUPANCY << LSH_BITS) == LSH_BITS
    assert lsh_bits_for((LSH_TARGET_OCCUPANCY << LSH_BITS) + 1) \
        == LSH_BITS + 1
    assert lsh_bits_for(20_000) == 9              # g1.0 fixture
    assert lsh_bits_for(10 ** 12) == LSH_MAX_BITS
    # monotone non-decreasing
    prev = 0
    for n in range(0, 3_000_000, 97_311):
        b = lsh_bits_for(n)
        assert b >= prev
        prev = b


@pytest.mark.parametrize("n", [0, 1, 500, 2_000, 4_096, 4_097,
                               20_000, 1_000_000, 10 ** 9, 10 ** 12])
def test_bits_sql_matches_python(n):
    sql = f"WITH {lsh_bits_sql(corpus_sql=f'SELECT {n}')} " \
          f"SELECT bits FROM nb"
    assert duckdb.sql(sql).fetchone()[0] == lsh_bits_for(n)


def test_wider_plane_matrix_extends_narrower():
    """Plane (t, j) depends only on its own key: the adaptive bit count
    never moves existing planes, so gate-scale buckets are bit-for-bit
    the historical 6-bit layout."""
    import numpy as np
    narrow, wide = _plane_matrix(LSH_BITS), _plane_matrix(LSH_BITS + 4)
    b = LSH_BITS + 4
    for t in range(6):
        assert np.array_equal(narrow[t * LSH_BITS:(t + 1) * LSH_BITS],
                              wide[t * b:t * b + LSH_BITS])
