"""Incrementally-maintained aggregate views (``streaming/aggview``)
and the change-feed pre-image scheme they ride on
(``table_changes(include_preimages=True)``, Delta-CDF's
update_preimage/update_postimage rows).
"""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from kafka_jdbc_sink_connector_spark.apply import CdcApplier
from kafka_jdbc_sink_connector_spark.config import SinkConfig
from kafka_jdbc_sink_connector_spark.lake.changes import (
    CHANGE_TYPE,
    table_changes,
)
from kafka_jdbc_sink_connector_spark.streaming.aggview import AggViewRunner

from tests.test_apply_batch import _events_df, audit_col, ev


def _mk_bronze(spark, path, **kw):
    kw.setdefault("n_buckets", 4)
    kw.setdefault("delete_mode", "delete")
    return CdcApplier(spark, SinkConfig(**kw), str(path),
                      audit_ts=audit_col())


def _mk_view(spark, path, pk=("role",)):
    cfg = SinkConfig(n_buckets=2, delete_mode="delete", pk_fields=pk,
                     delete_retain_fields=())
    return CdcApplier(spark, cfg, str(path), audit_ts=audit_col())


# -- change-feed pre-images -------------------------------------------


@pytest.mark.parametrize("mode", ["cow", "mor"])
def test_feed_preimages_both_paths(spark, tmp_path, mode):
    """update rows split into pre+post images on BOTH feed paths —
    the generic two-snapshot diff (COW) and the adjacent-delta fast
    path (MOR steady state)."""
    ap = _mk_bronze(spark, tmp_path / "t", merge_mode=mode)
    ap.apply_batch(
        _events_df(spark, [ev(0, "u", "a", 0, text="v1"),
                           ev(1, "u", "b", 0)]),
        batch_id=0,
    )
    ap.apply_batch(
        _events_df(spark, [ev(10, "u", "a", 0, text="v2"),
                           ev(11, "d", "b", 0),
                           ev(12, "u", "c", 0)]),
        batch_id=1,
    )
    t = ap.table()
    ch = table_changes(t, t.version - 1, include_preimages=True)
    got = {
        (r["conv_id"], r[CHANGE_TYPE]): r["text"] for r in ch.collect()
    }
    assert got[("a", "update_preimage")] == "v1"
    assert got[("a", "update_postimage")] == "v2"
    assert ("c", "insert") in got and ("b", "delete") in got
    assert len(got) == 4
    # default stays the single-row scheme
    legacy = {
        (r["conv_id"], r[CHANGE_TYPE])
        for r in table_changes(t, t.version - 1).collect()
    }
    assert legacy == {("a", "update"), ("b", "delete"), ("c", "insert")}


# -- aggregate view ----------------------------------------------------


def _want(bronze, group="role"):
    return sorted(
        tuple(r)
        for r in bronze.read_target()
        .groupBy(group)
        .agg(
            F.count("*").alias("n"),
            F.max("turn_idx").alias("mx"),
            F.sum(F.length("text")).alias("chars"),
        )
        .collect()
    )


def _got(view):
    return sorted(
        tuple(r)
        for r in view.read_target()
        .select("role", "n", "mx", "chars")
        .collect()
    )


def _runner(spark, bronze, view):
    return AggViewRunner(
        spark, bronze.table_path, view, ["role"],
        {
            "n": F.count("*"),
            "mx": F.max("turn_idx"),
            "chars": F.sum(F.length("text")),
        },
    )


@pytest.mark.parametrize("mode", ["cow", "mor"])
def test_aggview_mirrors_group_by_across_batches(spark, tmp_path, mode):
    """The maintained view equals the declarative GROUP BY after every
    sync — including group MOVES (a pk row's group column changing),
    the edge that requires feed pre-images."""
    bronze = _mk_bronze(spark, tmp_path / "bronze", merge_mode=mode)
    view = _mk_view(spark, tmp_path / "view")
    run = _runner(spark, bronze, view)

    b0 = [ev(i, "u", f"c{i}", i, role=("user" if i % 2 else "assistant"))
          for i in range(8)]
    bronze.apply_batch(_events_df(spark, b0), batch_id=0)
    assert run.sync().mode == "bootstrap"
    assert _got(view) == _want(bronze)

    # moves: c0 and c2 flip groups; c1 deleted; new role appears
    b1 = [
        ev(10, "u", "c0", 0, role="user"),       # assistant -> user
        ev(11, "u", "c2", 2, role="tool"),       # new group 'tool'
        ev(12, "d", "c1", 1),
        ev(13, "u", "c9", 9, role="assistant"),  # insert
    ]
    bronze.apply_batch(_events_df(spark, b1), batch_id=1)
    r = run.sync()
    assert r.mode == "incremental"
    assert _got(view) == _want(bronze)

    # a group losing its last member leaves the view
    b2 = [ev(20, "u", "c2", 2, role="user")]     # 'tool' empties
    bronze.apply_batch(_events_df(spark, b2), batch_id=2)
    run.sync()
    assert _got(view) == _want(bronze)
    assert "tool" not in {r[0] for r in _got(view)}
    assert run.sync().mode == "noop"


def test_aggview_min_max_under_delete(spark, tmp_path):
    """Non-invertible aggregate: deleting the row holding the group
    max must recompute the max from the survivors (pure delta-IVM
    cannot do this)."""
    bronze = _mk_bronze(spark, tmp_path / "bronze")
    view = _mk_view(spark, tmp_path / "view")
    run = _runner(spark, bronze, view)
    b0 = [ev(i, "u", f"c{i}", i, role="user") for i in range(5)]
    bronze.apply_batch(_events_df(spark, b0), batch_id=0)
    run.sync()
    assert _got(view)[0][2] == 4  # mx
    bronze.apply_batch(
        _events_df(spark, [ev(10, "d", "c4", 4)]), batch_id=1
    )
    run.sync()
    assert _got(view)[0][2] == 3
    assert _got(view) == _want(bronze)


def test_aggview_row_filter_ivm(spark, tmp_path):
    """The filter must be over a MUTABLE column for rows to cross it
    (the upstream pk is (conv_id, turn_idx) — a "turn change" would be
    a new row, not a move): rows enter/leave the view as their text
    flips visibility, and a group whose rows all leave is deleted."""
    bronze = _mk_bronze(spark, tmp_path / "bronze")
    view = _mk_view(spark, tmp_path / "view")
    vis = ~F.col("text").startswith("hidden")
    run = AggViewRunner(
        spark, bronze.table_path, view, ["role"],
        {"n": F.count("*"), "mx": F.max("turn_idx"),
         "chars": F.sum(F.length("text"))},
        row_filter=vis,
    )

    def want():
        return sorted(
            tuple(r)
            for r in bronze.read_target().filter(vis)
            .groupBy("role").agg(F.count("*"), F.max("turn_idx"),
                                 F.sum(F.length("text"))).collect()
        )

    b0 = [ev(0, "u", "a", 0, role="user", text="keep-a"),
          ev(1, "u", "b", 1, role="user", text="hidden-b"),
          ev(2, "u", "c", 2, role="user", text="keep-c")]
    bronze.apply_batch(_events_df(spark, b0), batch_id=0)
    run.sync()
    got = _got(view)
    assert got == want() and got[0][1] == 2  # b outside the view
    # updates move rows across the filter boundary both ways
    b1 = [ev(10, "u", "a", 0, role="user", text="hidden-a"),  # leaves
          ev(11, "u", "b", 1, role="user", text="keep-b")]    # enters
    bronze.apply_batch(_events_df(spark, b1), batch_id=1)
    run.sync()
    assert _got(view) == want()
    # every remaining row leaves → the group leaves the view
    b2 = [ev(20, "u", "b", 1, role="user", text="hidden-b2"),
          ev(21, "u", "c", 2, role="user", text="hidden-c")]
    bronze.apply_batch(_events_df(spark, b2), batch_id=2)
    run.sync()
    assert _got(view) == []


def test_aggview_replay_exactly_once(spark, tmp_path):
    bronze = _mk_bronze(spark, tmp_path / "bronze")
    view = _mk_view(spark, tmp_path / "view")
    run = _runner(spark, bronze, view)
    bronze.apply_batch(
        _events_df(spark, [ev(i, "u", f"c{i}", i, role="user")
                           for i in range(4)]),
        batch_id=0,
    )
    run.sync()
    state = _got(view)
    # a fresh runner (crash-restart) replaying the same window skips
    run2 = _runner(spark, bronze, view)
    assert run2.sync().mode == "noop"
    assert _got(view) == state


def test_aggview_full_refresh_reconciles(spark, tmp_path):
    bronze = _mk_bronze(spark, tmp_path / "bronze")
    view = _mk_view(spark, tmp_path / "view")
    run = _runner(spark, bronze, view)
    bronze.apply_batch(
        _events_df(spark, [ev(i, "u", f"c{i}", i,
                              role=("a" if i < 2 else "b"))
                           for i in range(4)]),
        batch_id=0,
    )
    run.sync()
    # upstream changes; pretend the feed window is gone → refresh
    bronze.apply_batch(
        _events_df(spark, [ev(10, "d", "c0", 0), ev(11, "d", "c1", 1)]),
        batch_id=1,
    )
    r = run.sync(full_refresh=True)
    assert r.mode == "refresh"
    assert _got(view) == _want(bronze)
    assert "a" not in {x[0] for x in _got(view)}


def test_aggview_null_groups_excluded(spark, tmp_path):
    bronze = _mk_bronze(spark, tmp_path / "bronze")
    view = _mk_view(spark, tmp_path / "view")
    run = _runner(spark, bronze, view)
    rows = [ev(0, "u", "a", 0, role="user"), ev(1, "u", "b", 1, role=None)]
    bronze.apply_batch(_events_df(spark, rows), batch_id=0)
    r = run.sync()
    assert r.batch.n_quarantined == 0
    assert {x[0] for x in _got(view)} == {"user"}


def test_aggview_validation(spark):
    class _A:  # minimal applier stand-in: only cfg is consulted
        cfg = SinkConfig(pk_fields=("x",), delete_retain_fields=())

    with pytest.raises(ValueError, match="must equal"):
        AggViewRunner(spark, "p", _A(), ["y"], {"n": F.count("*")})
    with pytest.raises(ValueError, match="collide"):
        AggViewRunner(spark, "p", _A(), ["x"], {"x": F.count("*")})
    with pytest.raises(ValueError, match="non-empty"):
        AggViewRunner(spark, "p", _A(), [], {"n": F.count("*")})


def test_aggview_as_streaming_follower(spark, tmp_path):
    """AggViewRunner exposes the same idempotent ``sync()`` contract
    as CascadeRunner, so it plugs into the runners' ``followers``
    hook unchanged — the view advances in lock-step with ingest."""
    from kafka_jdbc_sink_connector_spark.streaming.runner import (
        CdcStreamRunner,
    )

    bronze = _mk_bronze(spark, tmp_path / "bronze")
    view = _mk_view(spark, tmp_path / "view")
    agg = _runner(spark, bronze, view)
    runner = CdcStreamRunner(
        bronze, str(tmp_path / "ckpt"), followers=[agg]
    )
    runner.process_batch(
        _events_df(spark, [ev(i, "u", f"c{i}", i,
                              role=("user" if i % 2 else "assistant"))
                           for i in range(6)]),
        batch_id=0,
    )
    assert _got(view) == _want(bronze)
    runner.process_batch(
        _events_df(spark, [ev(10, "u", "c0", 0, role="user"),
                           ev(11, "d", "c1", 1)]),
        batch_id=1,
    )
    assert _got(view) == _want(bronze)


def test_aggview_incremental_plan_broadcasts_groups(spark, tmp_path):
    """The 100-TB property: the incremental sync's upstream re-read is
    restricted by a BROADCAST left-semi join of the (batch-sized)
    affected-group set — the table side is never shuffled for the
    group restriction, and no Python eval node appears."""
    bronze = _mk_bronze(spark, tmp_path / "bronze")
    view = _mk_view(spark, tmp_path / "view")
    run = _runner(spark, bronze, view)
    bronze.apply_batch(
        _events_df(spark, [ev(i, "u", f"c{i}", i, role="user")
                           for i in range(4)]),
        batch_id=0,
    )
    run.sync()
    bronze.apply_batch(
        _events_df(spark, [ev(10, "u", "c0", 0, role="assistant")]),
        batch_id=1,
    )
    from kafka_jdbc_sink_connector_spark.lake.changes import (
        table_changes as tc,
    )
    from kafka_jdbc_sink_connector_spark.lake.table import LakeTable

    up = LakeTable.load(spark, bronze.table_path)
    feed = tc(up, run.watermark(), up.version, include_preimages=True)
    affected = feed.select("role").na.drop().distinct()
    relevant = run._live(up.read(version=up.version)).join(
        F.broadcast(affected), ["role"], "left_semi"
    )
    plan = relevant._jdf.queryExecution().executedPlan().toString()
    # the group restriction itself must be a broadcast LEFT SEMI (the
    # feed's internal full-outer diff upstream of `affected` is a
    # shuffle join by nature — but bucket-pruned and batch-sized)
    assert re.search(r"BroadcastHashJoin .*LeftSemi", plan), plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_aggview_derived_group_rollup(spark, tmp_path):
    """Time-bucketed rollup via the transform hook: a DERIVED group
    column (hour bucket from ts). An update moving a row's ts across
    the bucket boundary must debit the old bucket through the
    pre-image — the transform runs on feed rows too."""
    import datetime as dt

    bronze = _mk_bronze(spark, tmp_path / "bronze")
    view = CdcApplier(
        spark,
        SinkConfig(n_buckets=2, delete_mode="delete",
                   pk_fields=("bucket_hour",), delete_retain_fields=()),
        str(tmp_path / "view"), audit_ts=audit_col(),
    )
    run = AggViewRunner(
        spark, bronze.table_path, view, ["bucket_hour"],
        {"n": F.count("*")},
        transform=lambda df: df.withColumn(
            "bucket_hour", F.date_trunc("hour", F.col("ts"))
        ),
    )

    def want():
        return sorted(
            tuple(r)
            for r in bronze.read_target()
            .groupBy(F.date_trunc("hour", F.col("ts")).alias("h"))
            .agg(F.count("*")).collect()
        )

    def got():
        return sorted(
            tuple(r)
            for r in view.read_target()
            .select("bucket_hour", "n").collect()
        )

    h0 = dt.datetime(2024, 1, 1, 10, 5)
    h1 = dt.datetime(2024, 1, 1, 11, 20)
    b0 = [ev(0, "u", "a", 0, ts=h0), ev(1, "u", "b", 1, ts=h0),
          ev(2, "u", "c", 2, ts=h1)]
    bronze.apply_batch(_events_df(spark, b0), batch_id=0)
    run.sync()
    assert got() == want() and len(got()) == 2
    # move a row across the hour boundary: hour-10 bucket shrinks,
    # hour-11 grows — needs the OLD bucket from the pre-image
    bronze.apply_batch(
        _events_df(spark, [ev(10, "u", "a", 0, ts=h1)]), batch_id=1
    )
    run.sync()
    assert got() == want()
    counts = dict(got())
    assert counts[dt.datetime(2024, 1, 1, 10)] == 1
    assert counts[dt.datetime(2024, 1, 1, 11)] == 2
    # empty the hour-10 bucket entirely -> it leaves the view
    bronze.apply_batch(
        _events_df(spark, [ev(20, "u", "b", 1, ts=h1)]), batch_id=2
    )
    run.sync()
    assert got() == want() and len(got()) == 1

    # a transform that drops the group column is rejected loudly
    bad = AggViewRunner(
        spark, bronze.table_path,
        CdcApplier(
            spark,
            SinkConfig(n_buckets=2, delete_mode="delete",
                       pk_fields=("bucket_hour",),
                       delete_retain_fields=()),
            str(tmp_path / "bad"), audit_ts=audit_col(),
        ),
        ["bucket_hour"], {"n": F.count("*")},
        transform=lambda df: df.select("conv_id"),
    )
    with pytest.raises(ValueError, match="dropped group column"):
        bad.sync()
