"""Deterministic HyperLogLog sketches (``operators/sketch.py``):
mergeability (the scale property), partition invariance, accuracy
within the estimator's error bound, and plan shape.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from kafka_jdbc_sink_connector_spark.operators.sketch import (
    hll_count_distinct,
    hll_error_bound,
    hll_estimate,
    hll_estimate_by,
    hll_merge,
    hll_registers,
    hll_registers_by,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def events(spark):
    df = spark.read.parquet(os.path.join(SF, "events.parquet")).cache()
    yield df
    # unpersist: Spark's cache manager plan-matches, so leaving this
    # cached would hijack OTHER suites' raw parquet reads of the same
    # file (plan tests then see InMemoryTableScan, not PushedFilters)
    df.unpersist()


def _regs(df, col="user_id", p=8):
    return {tuple(r) for r in hll_registers(df, col, p).collect()}


def test_union_sketch_is_registerwise_max(spark, events):
    a = events.filter(F.col("user_id") % 2 == 0)
    b = events.filter(F.col("user_id") % 2 == 1)
    merged = {
        tuple(r)
        for r in hll_merge(
            hll_registers(a, "user_id"), hll_registers(b, "user_id")
        ).collect()
    }
    assert merged == _regs(events)
    # overlapping inputs merge identically (max is idempotent)
    overlap = {
        tuple(r)
        for r in hll_merge(
            hll_registers(events, "user_id"),
            hll_registers(a, "user_id"),
        ).collect()
    }
    assert overlap == _regs(events)


def test_sketch_partition_and_order_invariant(spark, events):
    base = _regs(events)
    assert _regs(events.repartition(23)) == base
    assert _regs(events.orderBy(F.col("event_id").desc())) == base


def test_estimate_within_error_bound(spark, events):
    for p in (8, 12):
        exact = events.select("user_id").distinct().count()
        est = hll_count_distinct(events, "user_id", p).collect()[0][
            "estimate"
        ]
        assert abs(est - exact) / exact <= hll_error_bound(p), (p, est)


def test_larger_p_is_not_worse_on_average(spark, events):
    # not a theorem per-instance, but on this fixture p=12 (4096
    # registers for ~150 ids) runs in linear-counting mode and should
    # be very tight
    exact = events.select("user_id").distinct().count()
    est12 = hll_count_distinct(events, "user_id", 12).collect()[0][0]
    assert abs(est12 - exact) / exact < 0.05


def test_nulls_do_not_count(spark):
    df = spark.createDataFrame(
        [(1,), (2,), (None,), (2,)], "x bigint"
    )
    regs = hll_registers(df, "x")
    est = hll_estimate(regs).collect()[0]["estimate"]
    assert 1.5 < est < 2.5  # 2 distinct non-null values


def test_grouped_sketches_match_per_group_sketch(spark, events):
    by = {
        (r["event_type"], r["register"], r["max_rho"])
        for r in hll_registers_by(
            events, ["event_type"], "user_id"
        ).collect()
    }
    types = [r[0] for r in events.select("event_type").distinct().collect()]
    manual = set()
    for t in types:
        for r in hll_registers(
            events.filter(F.col("event_type") == t), "user_id"
        ).collect():
            manual.add((t, r["register"], r["max_rho"]))
    assert by == manual
    ests = {
        r["event_type"]: r["estimate"]
        for r in hll_estimate_by(
            hll_registers_by(events, ["event_type"], "user_id"),
            ["event_type"],
        ).collect()
    }
    for t in types:
        exact = (
            events.filter(F.col("event_type") == t)
            .select("user_id").distinct().count()
        )
        assert abs(ests[t] - exact) / exact <= hll_error_bound(8), t


def test_invalid_p_rejected(spark, events):
    with pytest.raises(ValueError):
        hll_registers(events, "user_id", p=7)
    with pytest.raises(ValueError):
        hll_registers_by(events, ["event_type"], "user_id", p=20)


def test_sketch_plan_is_one_codegen_pass(spark, events):
    plan = (
        hll_registers(events, "user_id")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # one partial + one final aggregate around a single Exchange
    assert plan.count("Exchange hashpartitioning") == 1
    assert "partial_max" in plan


# -- count-min sketch --------------------------------------------------


def test_cms_never_underestimates_and_merges(spark, events):
    from kafka_jdbc_sink_connector_spark.operators.sketch import (
        cms_estimate,
        cms_merge,
        cms_sketch,
    )

    sk = cms_sketch(events, "user_id")
    probes = events.select("user_id").distinct()
    est = {
        r["user_id"]: r["est_cnt"]
        for r in cms_estimate(sk, probes, "user_id").collect()
    }
    exact = {
        r["user_id"]: r["n"]
        for r in events.groupBy("user_id")
        .agg(F.count("*").alias("n")).collect()
    }
    assert set(est) == set(exact)
    for u, n in exact.items():
        assert est[u] >= n, u  # the one-sided guarantee
    # merge = counter-wise sum, exactly
    a = events.filter(F.col("event_id") % 2 == 0)
    b = events.filter(F.col("event_id") % 2 == 1)
    merged = {
        tuple(r)
        for r in cms_merge(
            cms_sketch(a, "user_id"), cms_sketch(b, "user_id")
        ).collect()
    }
    assert merged == {tuple(r) for r in sk.collect()}


def test_cms_weighted_and_absent_probe(spark):
    from kafka_jdbc_sink_connector_spark.operators.sketch import (
        cms_estimate,
        cms_sketch,
    )

    df = spark.createDataFrame(
        [("a", 10), ("a", 5), ("b", 7), (None, 99)],
        "k string, w int",
    )
    sk = cms_sketch(df, "k", weight=F.col("w"))
    probes = spark.createDataFrame(
        [("a",), ("b",), ("zzz",)], "k string"
    )
    est = {
        r["k"]: r["est_cnt"]
        for r in cms_estimate(sk, probes, "k").collect()
    }
    assert est["a"] == 15 and est["b"] == 7
    assert est["zzz"] == 0  # absent value -> implicit zero counters


def test_cms_collision_overestimate_is_bounded(spark):
    from kafka_jdbc_sink_connector_spark.operators.sketch import (
        cms_estimate,
        cms_sketch,
    )

    # tiny width forces collisions: w = 16 counters for 500 keys
    df = spark.range(5000).select(
        (F.col("id") % 500).cast("string").alias("k")
    )
    sk = cms_sketch(df, "k", d=4, w_hex=1)
    probes = df.select("k").distinct().limit(50)
    rows = cms_estimate(sk, probes, "k", d=4, w_hex=1).collect()
    n_total = 5000
    for r in rows:
        assert r["est_cnt"] >= 10  # true count
        # e*N/w bound holds with overwhelming probability at d=4
        assert r["est_cnt"] - 10 <= 2.72 * n_total / 16 + 1


# -- quantile histogram sketch -----------------------------------------


def test_qsketch_quantiles_within_bound(spark, events):
    from kafka_jdbc_sink_connector_spark.operators.sketch import (
        qsketch_error_bound,
        qsketch_histogram,
        qsketch_quantiles,
    )

    cents = events.select(
        F.round(F.col("value") * 100).cast("long").alias("c")
    )
    h = qsketch_histogram(cents, "c")
    qs = [0.1, 0.5, 0.9, 0.99]
    est = {
        r["q"]: r["estimate"]
        for r in qsketch_quantiles(h, qs).collect()
    }
    exact = cents.agg(
        *[F.expr(f"percentile(c, {q})").alias(str(q)) for q in qs]
    ).collect()[0]
    for q in qs:
        x = exact[str(q)]
        assert abs(est[q] - x) / max(x, 1) <= qsketch_error_bound(), (
            q, est[q], x,
        )


def test_qsketch_merge_and_partition_invariance(spark, events):
    from kafka_jdbc_sink_connector_spark.operators.sketch import (
        qsketch_histogram,
        qsketch_merge,
    )

    cents = events.select(
        F.round(F.col("value") * 100).cast("long").alias("c")
    )
    full = {tuple(r) for r in qsketch_histogram(cents, "c").collect()}
    a = cents.filter(F.col("c") % 2 == 0)
    b = cents.filter(F.col("c") % 2 == 1)
    merged = {
        tuple(r)
        for r in qsketch_merge(
            qsketch_histogram(a, "c"), qsketch_histogram(b, "c")
        ).collect()
    }
    assert merged == full
    rep = {
        tuple(r)
        for r in qsketch_histogram(cents.repartition(13), "c").collect()
    }
    assert rep == full


def test_qsketch_zero_negative_null(spark):
    from kafka_jdbc_sink_connector_spark.operators.sketch import (
        qsketch_histogram,
        qsketch_quantiles,
    )

    df = spark.createDataFrame(
        [(0,), (0,), (-5,), (None,), (8,)], "c bigint"
    )
    h = {r["bucket"]: r["cnt"] for r in qsketch_histogram(df, "c").collect()}
    assert h[-1] == 2 and h[-2] == 1  # zeros + negatives counted
    assert sum(h.values()) == 4      # null skipped
    # 8 = 2^3 exactly: bucket = 3*16 + 0
    assert h[48] == 1
    est = {
        r["q"]: r["estimate"]
        for r in qsketch_quantiles(qsketch_histogram(df, "c"), [0.5])
        .collect()
    }
    assert est[0.5] == 0.0  # median of ranked (0,0,8) is the zero bucket


def test_qsketch_exact_bucket_boundaries(spark):
    from kafka_jdbc_sink_connector_spark.operators.sketch import (
        qsketch_histogram,
    )

    # powers of two and their neighbors land deterministically: the
    # integer-div sub-bucket cannot straddle like float log would
    df = spark.createDataFrame(
        [(1,), (2,), (3,), (4,), (15,), (16,), (17,), (1023,), (1024,)],
        "c bigint",
    )
    got = {r["bucket"]: r["cnt"] for r in qsketch_histogram(df, "c").collect()}
    # 1 -> octave 0 sub 0 = 0; 2 -> 16; 3 -> 16+8=24 ((3-2)*16//2);
    # 4 -> 32; 15 -> 3*16 + 11*16//8 wait: octave(15)=3, (15-8)*16//8=14
    assert got[0] == 1 and got[16] == 1 and got[24] == 1
    assert got[32] == 1 and got[3 * 16 + 14] == 1
    assert got[4 * 16] == 1 and got[4 * 16 + 1] == 1
    assert got[9 * 16 + 15] == 1 and got[10 * 16] == 1


def test_hll_empty_input_estimates_zero(spark):
    from kafka_jdbc_sink_connector_spark.operators.sketch import (
        hll_count_distinct,
    )

    empty = spark.createDataFrame([], "x bigint")
    est = hll_count_distinct(empty, "x").collect()[0]["estimate"]
    assert est == 0.0
    all_null = spark.createDataFrame([(None,), (None,)], "x bigint")
    assert hll_count_distinct(all_null, "x").collect()[0][
        "estimate"
    ] == 0.0
