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
    return (
        spark.read.parquet(os.path.join(SF, "events.parquet")).cache()
    )


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
