"""Behavioral tests for the round-13 sketch / sampling / robust-stats
operators (the oracle gate proves engine parity; these prove the
STATISTICS do what the docstrings claim)."""

import pytest
from pyspark.sql import functions as F

from cstore_fdw_spark.operators import load_all


@pytest.fixture(scope="module")
def registry():
    return load_all()


@pytest.fixture(scope="module")
def sf001_dir():
    """The sf0.01 tree, located as a SIBLING of the conftest SF_DIR so a
    relocated fixture tree still resolves; skip (not hard-fail) when that
    scale isn't present — these two tests need ~11k distinct/group (the
    raw-estimator regime), which sf0.001 can't provide."""
    import os

    from tests.conftest import SF_DIR
    cand = os.path.join(os.path.dirname(SF_DIR.rstrip("/")), "sf0.01")
    if not os.path.exists(os.path.join(cand, "lineitem.parquet")):
        pytest.skip(f"sf0.01 fixture tree not present at {cand}")
    return cand


def test_hll_estimate_within_error_bound(spark, registry, sf001_dir):
    """Raw-HLL standard error at m=1024 is ~3.3%; assert every group's
    estimate is within 2 sigma of the exact distinct count at sf0.01
    (~11k distinct per group — the raw-estimator regime, so corrected
    == raw there)."""
    sf01 = sf001_dir
    est = {r["l_returnflag"]: r for r in
           registry["sketch_hyperloglog_distinct"]
           .builder(spark, sf01).collect()}
    li = spark.read.parquet(f"{sf01}/lineitem.parquet")
    truth = {r["l_returnflag"]: r["d"] for r in
             li.groupBy("l_returnflag")
             .agg(F.countDistinct("l_orderkey").alias("d")).collect()}
    assert set(est) == set(truth)
    for flag, t in truth.items():
        e = est[flag]["distinct_estimate"]
        assert abs(e - t) / t < 0.066, (flag, e, t)
        assert e == est[flag]["raw_estimate"]  # raw regime: no correction


def test_hll_small_range_linear_counting_corrects(spark, sf_dir,
                                                  registry):
    """Below the 2.5m threshold the raw estimator overestimates badly
    (+20-30%); the paper's linear-counting branch must engage and land
    within ~2 sigma of its own regime (~8% here)."""
    est = {r["l_returnflag"]: r for r in
           registry["sketch_hyperloglog_distinct"]
           .builder(spark, sf_dir).collect()}
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    truth = {r["l_returnflag"]: r["d"] for r in
             li.groupBy("l_returnflag")
             .agg(F.countDistinct("l_orderkey").alias("d")).collect()}
    if min(truth.values()) >= 2560:
        pytest.skip("test sf not in the small-range regime")
    for flag, t in truth.items():
        r = est[flag]
        assert r["raw_estimate"] > t  # raw bias direction
        assert r["zero_registers"] > 0
        assert r["distinct_estimate"] != r["raw_estimate"]  # LC engaged
        assert abs(r["distinct_estimate"] - t) / t < 0.08, (flag, r, t)


def test_hll_sketch_size_is_bounded(spark, sf_dir, registry):
    """The whole point: the sketch frame carries at most
    |groups| * 1024 rows regardless of corpus size."""
    out = registry["sketch_hyperloglog_distinct"].builder(spark, sf_dir)
    rows = out.collect()
    assert len(rows) <= 3  # one per return flag
    for r in rows:
        assert 0 <= r["zero_registers"] <= 1024
        # denom bounds: all-zero registers -> 1024 * 2^24; all-max -> 1024*2
        assert 2 * 1024 <= r["denom"] <= 1024 * (1 << 24)


def test_temperature_mix_quota_shape(spark, sf_dir, registry):
    """T=1/2 mixing must sharpen toward the high-resource language:
    en's sampled share must exceed its corpus share, every quota must
    be respected exactly, and the total must not exceed the budget."""
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    total = d.count()
    corpus = {r["lang"]: r["c"] for r in
              d.groupBy("lang").agg(F.count(F.lit(1)).alias("c")).collect()}
    out = registry["sample_temperature_mix"].builder(spark, sf_dir)
    sampled = {r["lang"]: r["c"] for r in
               out.groupBy("lang").agg(F.count(F.lit(1)).alias("c"))
               .collect()}
    k = total // 5
    wsum = sum(c * c for c in corpus.values())
    for lang, c in corpus.items():
        quota = k * c * c // wsum
        assert sampled.get(lang, 0) == quota, lang
    assert sum(sampled.values()) <= k
    en_share = sampled["en"] / sum(sampled.values())
    assert en_share > corpus["en"] / total  # sharpened


def test_mix_is_deterministic(spark, sf_dir, registry):
    a = sorted(registry["sample_temperature_mix"].builder(spark, sf_dir)
               .collect())
    b = sorted(registry["sample_temperature_mix"].builder(spark, sf_dir)
               .collect())
    assert a == b


def test_hamming_topk_tracks_cosine(spark, sf_dir, registry):
    """Charikar's guarantee, empirically: a query's Hamming top-3 must
    have markedly higher true cosine than the corpus average pair."""
    top = registry["vector_hamming_topk"].builder(spark, sf_dir).collect()
    assert {r["query_id"] for r in top} == {0, 1, 2, 3, 4}
    for r in top:
        assert 0 <= r["hamming"] <= 64
        assert r["neighbor_id"] != r["query_id"]
    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    vecs = {r["vec_id"]: r["embedding"] for r in e.collect()}

    def cos(a, b):
        num = sum(x * y for x, y in zip(a, b))
        den = (sum(x * x for x in a) ** 0.5) * (sum(y * y for y in b) ** 0.5)
        return num / den

    top1 = [r for r in top if r["rank"] == 1]
    mean_top1 = sum(cos(vecs[r["query_id"]], vecs[r["neighbor_id"]])
                    for r in top1) / len(top1)
    # corpus baseline: mean cosine of an arbitrary fixed pair sample
    ids = sorted(vecs)[:40]
    base = [cos(vecs[a], vecs[b]) for a in ids[:5] for b in ids[20:40]]
    assert mean_top1 > (sum(base) / len(base)) + 0.15


def test_mad_anomalies_actually_deviate(spark, sf_dir, registry):
    """Every flagged hour must sit strictly outside 3 MADs, and the
    doubled-unit deviation must reconcile with the hour's count."""
    rows = registry["timeseries_anomaly_mad"].builder(spark, sf_dir) \
        .collect()
    assert rows, "no anomalies flagged at this sf"
    by_type = {}
    for r in rows:
        assert 2 * r["dev2"] > 3 * r["mad4"]
        by_type.setdefault(r["event_type"], set()).add(r["mad4"])
    # mad4 is one number per event_type series
    assert all(len(v) == 1 for v in by_type.values())


def test_chi_square_independent_data_small_statistic(spark, sf_dir,
                                                     registry):
    """segment and region are generated independently, so the summed
    statistic must be unremarkable for 16 dof (far below the 0.001
    critical value ~39); and marginal identities must hold."""
    rows = registry["stats_chi_square_independence"] \
        .builder(spark, sf_dir).collect()
    assert len(rows) == 25
    chi2 = sum(r["chi2_contrib"] for r in rows)
    assert chi2 < 39, chi2
    n = sum(r["obs"] for r in rows)
    ppm_total = sum(r["expected_ppm"] for r in rows)
    # expectations are floor-truncated ppm counts: sum within 25 ulps
    assert n * 1_000_000 - 25 <= ppm_total <= n * 1_000_000


def test_levenshtein_pairs_verified(spark, sf_dir, registry):
    """Every emitted pair must truly be within the threshold (re-check
    in Python), ordered, and de-duplicated."""
    rows = registry["text_dedup_levenshtein"].builder(spark, sf_dir) \
        .collect()
    docs = {r["doc_id"]: r["text"] for r in
            spark.read.parquet(f"{sf_dir}/documents.parquet").collect()}

    def lev(a, b):
        if len(a) < len(b):
            a, b = b, a
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                               prev[j - 1] + (ca != cb)))
            prev = cur
        return prev[-1]

    seen = set()
    for r in rows:
        assert r["doc_a"] < r["doc_b"]
        assert (r["doc_a"], r["doc_b"]) not in seen
        seen.add((r["doc_a"], r["doc_b"]))
        assert r["edit_distance"] <= 12
        assert lev(docs[r["doc_a"]], docs[r["doc_b"]]) == r["edit_distance"]


def test_benford_screen_direction_and_completeness(spark, sf_dir,
                                                   registry):
    """TPC-H prices span barely two decades, so the screen must report
    digit 1 UNDER Benford and digit 9 over; all nine digits present,
    observed counts total the corpus, ppm shares sum to ~10^6."""
    rows = {r["digit"]: r for r in
            registry["stats_benford_first_digit"]
            .builder(spark, sf_dir).collect()}
    assert sorted(rows) == list(range(1, 10))
    n = spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()
    assert sum(r["obs"] for r in rows.values()) == n
    ppm = sum(r["obs_ppm"] for r in rows.values())
    assert 1_000_000 - 9 <= ppm <= 1_000_000
    assert rows[1]["deviation_ppm"] < 0
    assert rows[9]["deviation_ppm"] > 0
    # published Benford constants pinned
    assert rows[1]["benford_ppm"] == 301030
    assert sum(r["benford_ppm"] for r in rows.values()) == 1_000_000


def test_matryoshka_rerank_consistent_with_exact(spark, sf_dir,
                                                 registry):
    """Matryoshka retrieval can MISS exact neighbors (prefix recall is
    data-dependent) but can never BEAT them: its best cosine per query
    is bounded by the exact top-1, any overlap with the exact top-k
    must agree on the cosine value, and within each query the ranks
    order by true cosine."""
    mrl = registry["vector_matryoshka_topk"].builder(spark, sf_dir) \
        .collect()
    exact = registry["ann_cosine_topk"].builder(spark, sf_dir).collect()
    ex = {(r["query_id"], r["neighbor_id"]): r["cos"] for r in exact}
    best_exact = {}
    for r in exact:
        if r["rank"] == 1:
            best_exact[r["query_id"]] = r["cos"]
    by_q = {}
    for r in mrl:
        by_q.setdefault(r["query_id"], []).append(r)
    assert set(by_q) == {0, 1, 2, 3, 4}
    for qid, rows in by_q.items():
        rows.sort(key=lambda r: r["rank"])
        assert [r["rank"] for r in rows] == list(range(1, len(rows) + 1))
        assert rows[0]["cos"] <= best_exact[qid] + 1e-12
        for a, b in zip(rows, rows[1:]):
            assert a["cos"] >= b["cos"]
        for r in rows:
            if (qid, r["neighbor_id"]) in ex:
                assert abs(r["cos"] - ex[(qid, r["neighbor_id"])]) < 1e-12


def test_hll_set_algebra_tracks_truth(spark, registry, sf001_dir):
    """Union estimate must track exact |A ∪ R| within the per-sketch
    error, and the inclusion-exclusion intersection within ~3x of it
    (both relative to the union magnitude, the standard HLL-intersection
    error model). Pinned to sf0.01 (raw-estimator regime)."""
    sf01 = sf001_dir
    row = registry["sketch_hll_union_intersect"] \
        .builder(spark, sf01).collect()[0]
    li = spark.read.parquet(f"{sf01}/lineitem.parquet")
    a = {r["l_orderkey"] for r in
         li.filter(F.col("l_returnflag") == "A")
         .select("l_orderkey").distinct().collect()}
    rr = {r["l_orderkey"] for r in
          li.filter(F.col("l_returnflag") == "R")
          .select("l_orderkey").distinct().collect()}
    union, inter = len(a | rr), len(a & rr)
    assert abs(row["est_union"] - union) / union < 0.066
    assert abs(row["est_intersect"] - inter) < 0.15 * union
    # merge consistency: union estimate can never exceed est_a + est_r
    assert row["est_union"] <= row["est_a"] + row["est_r"]


def test_countmin_one_sided_guarantee(spark, sf_dir, registry):
    """CM estimates can only over-count (hash collisions add), never
    under-count, and the expected overshoot is ~2N/w per colliding row
    pair — assert est >= exact everywhere and the error stays within a
    loose multiple of the N/w bound at test scale."""
    from cstore_fdw_spark.operators.analytics import CM_W
    rows = registry["sketch_countmin_user_counts"] \
        .builder(spark, sf_dir).collect()
    assert rows, "probe set empty at this sf"
    n_events = spark.read.parquet(f"{sf_dir}/events.parquet").count()
    bound = max(8, 10 * n_events // CM_W)
    for r in rows:
        assert r["est_cnt"] >= r["exact_cnt"], r
        assert r["est_cnt"] - r["exact_cnt"] <= bound, (r, bound)


def test_bloom_no_false_negatives(spark, sf_dir, registry):
    """The Bloom guarantee: membership is NEVER denied to a present key
    (every has_orders customer reads bloom_member=true); false
    positives are allowed but must stay near the m/n/k model rate."""
    rows = registry["sketch_bloom_order_membership"] \
        .builder(spark, sf_dir).collect()
    assert rows
    fp = fn = members = 0
    for r in rows:
        if r["has_orders"]:
            members += 1
            if not r["bloom_member"]:
                fn += 1
        elif r["bloom_member"]:
            fp += 1
    assert fn == 0, f"{fn} false negatives"
    assert members > 0
    # FP rate sanity: with m=1024, k=4 the model rate is
    # (1-exp(-k*n/m))^k; allow 3x headroom for small-sample variance
    import math
    from cstore_fdw_spark.operators.analytics import BLOOM_K, BLOOM_M
    non_members = len(rows) - members
    if non_members >= 50:
        model = (1 - math.exp(-BLOOM_K * members / BLOOM_M)) ** BLOOM_K
        assert fp <= max(5, 3 * model * non_members), (fp, model)


def test_hll_rolling_distinct_tracks_exact_and_dominates_daily(
        spark, sf_dir, registry):
    """The merged 3-day sketch's registers dominate each constituent
    day's, so its estimate must be >= the single-day estimate for that
    day; and every window estimate must track the exact 3-day distinct
    within the small-range regime's error."""
    from pyspark.sql import functions as F
    rows = {r["day"]: r for r in
            registry["sketch_hll_rolling_distinct"]
            .builder(spark, sf_dir).collect()}
    assert rows
    ev = (spark.read.parquet(f"{sf_dir}/events.parquet")
          .select(F.to_date(F.expr("timestamp_micros(ts div 1000)")
                            if "bigint" in dict(spark.read.parquet(
                                f"{sf_dir}/events.parquet").dtypes
                            ).get("ts", "") else F.col("ts")).alias("day"),
                  "user_id"))
    exact3 = {}
    days = sorted(rows)
    for d in days:
        exact3[d] = (ev.filter((F.col("day") <= d)
                               & (F.col("day") >= F.date_sub(F.lit(d), 2)))
                     .select("user_id").distinct().count())
    for d in days:
        est = rows[d]["distinct_estimate"]
        t = exact3[d]
        assert abs(est - t) <= max(4, 0.12 * t), (d, est, t)


def test_rolling_sketch_vs_exact_twin(spark, sf_dir, registry):
    """The sketch twin must track its exact anchor on every window."""
    est = {r["day"]: r["distinct_estimate"] for r in
           registry["sketch_hll_rolling_distinct"]
           .builder(spark, sf_dir).collect()}
    exact = {r["day"]: r["n_distinct"] for r in
             registry["timeseries_rolling_distinct_exact"]
             .builder(spark, sf_dir).collect()}
    assert set(est) == set(exact) and est
    for d, t in exact.items():
        assert abs(est[d] - t) <= max(4, 0.12 * t), (d, est[d], t)


def test_quantile_sketch_certificate_holds(spark, sf_dir, registry):
    """The quantile histogram's deterministic guarantee: every emitted
    [q_lo, q_hi) interval contains the exact rank-ceil(n*q/100) order
    statistic, the interval width is exactly (hi-lo)/nbuckets, and the
    vs_exact query's bounds_hold column reads true on every row."""
    from cstore_fdw_spark.operators.analytics import QH_HI, QH_LO, QH_NB

    rows = registry["sketch_quantile_histogram"] \
        .builder(spark, sf_dir).collect()
    assert rows
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    vals = {}
    for r in li.select("l_returnflag", "l_extendedprice").collect():
        vals.setdefault(r[0], []).append(r[1])
    width = (QH_HI - QH_LO) / QH_NB
    for r in rows:
        xs = sorted(vals[r["l_returnflag"]])
        assert r["n"] == len(xs)
        exact = xs[r["rnk"] - 1]
        assert r["q_lo"] <= exact < r["q_hi"], (r, exact)
        assert abs((r["q_hi"] - r["q_lo"]) - width) < 1e-9

    ve = registry["sketch_quantile_vs_exact"] \
        .builder(spark, sf_dir).collect()
    assert len(ve) == len(rows)
    for r in ve:
        assert r["bounds_hold"] is True, r
        assert r["exact_bucket"] == r["bucket"], r
        assert r["q_lo"] <= r["exact_val"] < r["q_hi"], r


def test_quantile_sketch_state_bounded(spark, sf_dir):
    """The histogram state never exceeds |groups| x nbuckets rows for
    in-range data, and every bucket index is in [0, nbuckets)."""
    from cstore_fdw_spark.operators.analytics import (
        QH_NB, quantile_buckets)

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    counts = quantile_buckets(
        li.select(F.col("l_returnflag").alias("grp"), "l_extendedprice"),
        ["grp"], "l_extendedprice").collect()
    groups = {r["grp"] for r in counts}
    assert len(counts) <= len(groups) * QH_NB
    assert all(0 <= r["bucket"] < QH_NB for r in counts)
    assert sum(r["cnt"] for r in counts) == li.count()


def test_quantile_buckets_filter_nulls(spark):
    """NULLs in the bucketed column never reach the state (no
    bucket=NULL row) and n counts non-null rows only — otherwise the
    two engines' opposite NULL sort order (Spark NULLS FIRST, DuckDB
    NULLS LAST) silently shifts the rank certificate on nullable user
    data (ADVICE r15)."""
    from cstore_fdw_spark.operators.analytics import (
        quantile_buckets, quantile_estimate_from_buckets)

    rows = ([("a", float(v)) for v in range(1, 101)]
            + [("a", None)] * 7 + [("b", None)] * 3
            + [("b", 42.0)])
    df = spark.createDataFrame(rows, "grp string, x double")
    counts = quantile_buckets(df, ["grp"], "x", lo=0.0, hi=128.0,
                              nbuckets=128)
    state = counts.collect()
    assert all(r["bucket"] is not None for r in state)
    est = quantile_estimate_from_buckets(
        counts, lo=0.0, hi=128.0, nbuckets=128, qs=(50,)).collect()
    by_grp = {r["grp"]: r for r in est}
    # n excludes the NULL rows; the certificate covers the exact
    # rank-over-non-null order statistic (p50 of 1..100 = 50)
    assert by_grp["a"]["n"] == 100
    assert by_grp["a"]["q_lo"] <= 50.0 < by_grp["a"]["q_hi"]
    assert by_grp["b"]["n"] == 1
    assert by_grp["b"]["q_lo"] <= 42.0 < by_grp["b"]["q_hi"]
