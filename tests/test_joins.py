"""As-of and range joins (``operators/joins.py``): semantics vs a
brute-force reference on real data, boundary/tie behavior, and the
plan shapes that make them scale (no join operator at all for as-of;
no nested-loop for range).
"""

from __future__ import annotations

import datetime as dt
import os

import pytest
from pyspark.sql import functions as F

from kafka_jdbc_sink_connector_spark.operators.joins import (
    asof_join,
    range_join_bins,
)

SF = "/root/testdata/sf0.001"


def T(s):
    return dt.datetime(2024, 1, 1) + dt.timedelta(seconds=s)


@pytest.fixture(scope="module")
def events(spark):
    df = spark.read.parquet(os.path.join(SF, "events.parquet")).cache()
    yield df
    # unpersist: Spark's cache manager plan-matches, so leaving this
    # cached would hijack OTHER suites' raw parquet reads of the same
    # file (plan tests then see InMemoryTableScan, not PushedFilters)
    df.unpersist()


def test_asof_matches_bruteforce_on_fixture(spark, events):
    left = events.select("user_id", "ts", "event_id")
    right = events.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts").alias("rts"),
        F.col("event_id").alias("rid"),
    )
    got = {
        r["event_id"]: r["rid_asof"]
        for r in asof_join(
            left, right, ["user_id"], "ts", "rts", tiebreak="rid"
        ).collect()
    }
    # brute force: argmax (rts, rid) among rts <= ts per user
    rrows = {}
    for r in right.collect():
        rrows.setdefault(r["user_id"], []).append((r["rts"], r["rid"]))
    for l in left.collect():
        cands = [
            (ts, rid) for ts, rid in rrows.get(l["user_id"], [])
            if ts <= l["ts"]
        ]
        want = max(cands)[1] if cands else None
        assert got[l["event_id"]] == want, l["event_id"]


def test_asof_ties_and_tolerance(spark):
    left = spark.createDataFrame(
        [("k", T(10), "a"), ("k", T(20), "b"), ("k", T(3), "c")],
        "k string, ts timestamp, ev string",
    )
    right = spark.createDataFrame(
        [("k", T(10), 1), ("k", T(10), 2), ("k", T(15), 3)],
        "k string, rts timestamp, rid int",
    )
    rows = {
        r["ev"]: r["rid_asof"]
        for r in asof_join(
            left, right, ["k"], "ts", "rts", tiebreak="rid"
        ).collect()
    }
    # equal-timestamp right rows match (at-or-before) and the greatest
    # tiebreak wins; earlier left rows match nothing
    assert rows == {"a": 2, "b": 3, "c": None}
    tol = {
        r["ev"]: r["rid_asof"]
        for r in asof_join(
            left, right, ["k"], "ts", "rts", tiebreak="rid",
            tolerance=4.0,
        ).collect()
    }
    # b's match at 15 is 5s old -> nulled; a's at 10 is 0s -> kept
    assert tol == {"a": 2, "b": None, "c": None}


def test_asof_plan_has_no_join_or_python(spark, events):
    left = events.select("user_id", "ts", "event_id")
    right = events.filter(F.col("event_type") == "error").select(
        "user_id", F.col("ts").alias("rts"),
        F.col("event_id").alias("rid"),
    )
    plan = (
        asof_join(left, right, ["user_id"], "ts", "rts", tiebreak="rid")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Join" not in plan           # union + window, ONE shuffle
    assert "Python" not in plan
    assert plan.count("Exchange hashpartitioning") == 1


def test_range_join_boundaries_and_spanning(spark):
    pts = spark.createDataFrame(
        [("k", T(5)), ("k", T(10)), ("k", T(14)), ("k", T(15)),
         ("k", T(100))],
        "k string, ts timestamp",
    )
    iv = spark.createDataFrame(
        [("k", T(5), T(15), "w")], "k string, s timestamp, e timestamp, "
        "win string",
    )
    got = sorted(
        (r["ts"] - T(0)).total_seconds()
        for r in range_join_bins(
            pts, iv, ["k"], "ts", "s", "e", bin_width=3.0
        ).collect()
    )
    # start inclusive, end exclusive; the interval spans 4+ bins
    assert got == [5.0, 10.0, 14.0]


def test_range_join_left_and_counts_match_between(spark, events):
    pts = events.select("user_id", "ts", "event_id")
    iv = events.filter(F.col("event_type") == "error").select(
        "user_id", F.col("ts").alias("s"),
        (F.col("ts") + F.expr("INTERVAL 300 SECONDS")).alias("e"),
        F.col("event_id").alias("err_id"),
    )
    binned = range_join_bins(
        pts, iv, ["user_id"], "ts", "s", "e", bin_width=300.0
    )
    want = (
        pts.alias("p").join(
            iv.alias("i"),
            (F.col("p.user_id") == F.col("i.user_id"))
            & (F.col("p.ts") >= F.col("i.s"))
            & (F.col("p.ts") < F.col("i.e")),
        ).count()
    )
    assert binned.count() == want
    left = range_join_bins(
        pts, iv, ["user_id"], "ts", "s", "e", bin_width=300.0,
        how="left",
    )
    n_pts = pts.count()
    assert left.filter(F.col("err_id").isNull()).count() == (
        n_pts - binned.select("event_id").distinct().count()
    )


def test_range_join_plan_is_hash_join(spark, events):
    pts = events.select("user_id", "ts", "event_id")
    iv = events.filter(F.col("event_type") == "error").select(
        "user_id", F.col("ts").alias("s"),
        (F.col("ts") + F.expr("INTERVAL 300 SECONDS")).alias("e"),
        F.col("event_id").alias("err_id"),
    )
    plan = (
        range_join_bins(pts, iv, ["user_id"], "ts", "s", "e")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastNestedLoop" not in plan
    assert "CartesianProduct" not in plan
    assert "Python" not in plan


def test_range_join_rejects_column_collisions(spark):
    pts = spark.createDataFrame([("k", T(1), 1)],
                                "k string, ts timestamp, x int")
    iv = spark.createDataFrame(
        [("k", T(0), T(2), 9)], "k string, s timestamp, e timestamp, x int"
    )
    with pytest.raises(ValueError, match="collide"):
        range_join_bins(pts, iv, ["k"], "ts", "s", "e")


def test_asof_null_payload_in_matched_row_not_backfilled(spark):
    """Review regression: the matched (latest) right row's NULL
    payload must stay NULL — per-column carry would tear the row by
    backfilling from an OLDER right row."""
    left = spark.createDataFrame([("k", T(30), "l1")],
                                 "k string, ts timestamp, ev string")
    right = spark.createDataFrame(
        [("k", T(10), 7), ("k", T(20), None)],
        "k string, rts timestamp, price int",
    )
    row = asof_join(left, right, ["k"], "ts", "rts").collect()[0]
    assert row["price_asof"] is None          # matched row's own NULL
    assert row["rts_asof"] == T(20).timestamp()  # matched ts correct


def test_asof_string_tiebreak_and_null_right_ts(spark):
    left = spark.createDataFrame([("k", T(10), "l")],
                                 "k string, ts timestamp, ev string")
    right = spark.createDataFrame(
        [("k", T(5), "a"), ("k", T(5), "z"), ("k", None, "ghost")],
        "k string, rts timestamp, tag string",
    )
    row = asof_join(
        left, right, ["k"], "ts", "rts", tiebreak="tag"
    ).collect()[0]
    # string tiebreak orders by its own type (greatest wins); a NULL
    # right timestamp never participates
    assert row["tag_asof"] == "z"
    with pytest.raises(ValueError, match="tiebreak"):
        asof_join(left, right, ["k"], "ts", "rts", tiebreak="nope")


def test_asof_forward_direction(spark):
    left = spark.createDataFrame(
        [("k", T(10), "a"), ("k", T(16), "b"), ("k", T(99), "c")],
        "k string, ts timestamp, ev string",
    )
    right = spark.createDataFrame(
        [("k", T(5), 1), ("k", T(12), 2), ("k", T(12), 3), ("k", T(20), 4)],
        "k string, rts timestamp, rid int",
    )
    rows = {
        r["ev"]: r["rid_asof"]
        for r in asof_join(
            left, right, ["k"], "ts", "rts", tiebreak="rid",
            direction="forward",
        ).collect()
    }
    # a@10 -> earliest at-or-after = 12 (tie -> greatest rid = 3);
    # b@16 -> 20; c@99 -> nothing upcoming
    assert rows == {"a": 3, "b": 4, "c": None}
    tol = {
        r["ev"]: r["rid_asof"]
        for r in asof_join(
            left, right, ["k"], "ts", "rts", tiebreak="rid",
            direction="forward", tolerance=3.0,
        ).collect()
    }
    # a's match is 2s ahead (kept); b's is 4s ahead (nulled)
    assert tol == {"a": 3, "b": None, "c": None}
    with pytest.raises(ValueError, match="backward|forward"):
        asof_join(left, right, ["k"], "ts", "rts", direction="nearest")


def test_asof_forward_matches_bruteforce(spark, events):
    left = events.select("user_id", "ts", "event_id")
    right = events.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts").alias("rts"),
        F.col("event_id").alias("rid"),
    )
    got = {
        r["event_id"]: r["rid_asof"]
        for r in asof_join(
            left, right, ["user_id"], "ts", "rts", tiebreak="rid",
            direction="forward",
        ).collect()
    }
    rrows = {}
    for r in right.collect():
        rrows.setdefault(r["user_id"], []).append((r["rts"], r["rid"]))
    for l in left.collect():
        cands = [
            (ts, rid) for ts, rid in rrows.get(l["user_id"], [])
            if ts >= l["ts"]
        ]
        # earliest ts; greatest rid among equal earliest ts
        want = None
        if cands:
            mt = min(ts for ts, _ in cands)
            want = max(rid for ts, rid in cands if ts == mt)
        assert got[l["event_id"]] == want, l["event_id"]


def test_asof_null_left_ts_matches_nothing_both_directions(spark):
    """Review regression: a left row with a NULL timestamp must match
    nothing — desc default NULLS LAST would hand it the whole right
    side in forward mode."""
    left = spark.createDataFrame(
        [("k", None, "nul"), ("k", T(10), "ok")],
        "k string, ts timestamp, ev string",
    )
    right = spark.createDataFrame(
        [("k", T(5), 1), ("k", T(20), 2)],
        "k string, rts timestamp, rid int",
    )
    for direction, want_ok in (("backward", 1), ("forward", 2)):
        rows = {
            r["ev"]: r["rid_asof"]
            for r in asof_join(
                left, right, ["k"], "ts", "rts", direction=direction
            ).collect()
        }
        assert rows["nul"] is None, direction
        assert rows["ok"] == want_ok, direction


def test_asof_tiebreak_outside_carried_columns(spark):
    """Review regression: a tiebreak on an UNCARRIED right column must
    still work (it rides in the match struct without being output)."""
    left = spark.createDataFrame([("k", T(10), "l")],
                                 "k string, ts timestamp, ev string")
    right = spark.createDataFrame(
        [("k", T(5), 1, "x"), ("k", T(5), 2, "y")],
        "k string, rts timestamp, seq int, payload string",
    )
    res = asof_join(
        left, right, ["k"], "ts", "rts",
        right_cols=["payload"], tiebreak="seq",
    )
    row = res.collect()[0]
    assert row["payload_asof"] == "y"       # seq=2 wins the tie
    assert "seq_asof" not in res.columns    # tiebreak not carried
    with pytest.raises(ValueError, match="not a right column"):
        asof_join(left, right, ["k"], "ts", "rts", tiebreak="nope")
