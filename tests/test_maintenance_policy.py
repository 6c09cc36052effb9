"""Stats-driven maintenance policy (``lake.maintenance.plan``):
choosing WHEN to compact/cluster/vacuum/rebucket from the manifest
alone — synthetic-manifest unit tests plus real-table execution and
the streaming cadence hook.
"""

from __future__ import annotations

from types import SimpleNamespace

import pytest
from pyspark.sql import functions as F

from kafka_jdbc_sink_connector_spark.apply import CdcApplier
from kafka_jdbc_sink_connector_spark.config import SinkConfig
from kafka_jdbc_sink_connector_spark.lake.maintenance import (
    _interval_overlap_fraction,
    cluster_by,
    plan,
)
from kafka_jdbc_sink_connector_spark.streaming.runner import CdcStreamRunner

from tests.test_apply_batch import _events_df, audit_col, ev


# -- overlap metric ----------------------------------------------------


def test_overlap_fraction_disjoint_is_zero():
    assert _interval_overlap_fraction([(0, 9), (10, 19), (20, 29)]) == 0.0


def test_overlap_fraction_all_overlapping_is_one():
    assert _interval_overlap_fraction([(0, 100), (1, 99), (2, 98)]) == 1.0


def test_overlap_fraction_partial():
    # two of four files overlap each other; the other two are clean
    f = _interval_overlap_fraction([(0, 9), (5, 14), (20, 29), (30, 39)])
    assert f == pytest.approx(0.5)


def test_overlap_fraction_degenerate():
    assert _interval_overlap_fraction([]) == 0.0
    assert _interval_overlap_fraction([(0, 5)]) == 0.0


# -- synthetic-manifest policy decisions ------------------------------


def _fake_table(n_versions=3, **snap_kw):
    defaults = dict(
        buckets={}, delta_buckets={}, sdel_buckets={}, file_stats={},
        props={}, n_buckets=4,
    )
    defaults.update(snap_kw)
    snap = SimpleNamespace(**defaults)
    return SimpleNamespace(
        snapshot=snap, history=lambda: list(range(n_versions))
    )


def test_plan_flags_deep_delta_buckets():
    t = _fake_table(
        delta_buckets={"0": ["a", "b", "c", "d"], "1": ["a"]},
        sdel_buckets={"2": ["x", "y", "z", "w"]},
    )
    acts = plan(t, max_delta_depth=4)
    assert [a.kind for a in acts] == ["compact"]
    assert acts[0].params["buckets"] == [0, 2]
    assert "delta depth" in acts[0].reason


def test_plan_flags_small_file_buckets():
    t = _fake_table(buckets={"0": [f"f{i}" for i in range(9)],
                             "1": ["f0"]})
    acts = plan(t, max_files_per_bucket=8)
    assert [a.kind for a in acts] == ["compact"]
    assert acts[0].params["buckets"] == [0]


def test_plan_flags_clustering_drift_only_with_contract():
    stats = {
        f"f{i}": {"rows": 10, "cols": {"ts": {"lo": 0, "hi": 100}}}
        for i in range(4)
    }
    t = _fake_table(
        buckets={"0": ["f0", "f1", "f2", "f3"]}, file_stats=stats
    )
    # no contract (no cluster.cols prop, none passed): drift invisible
    assert plan(t) == []
    t.snapshot.props = {"cluster.cols": ["ts"], "cluster.method": "zorder"}
    acts = plan(t)
    assert [a.kind for a in acts] == ["cluster_by"]
    assert acts[0].params == {
        "cols": ["ts"], "buckets": [0], "method": "zorder",
    }


def test_plan_drift_needs_complete_stats_and_enough_files():
    # one file missing bounds on the axis → never guess, no action
    stats = {
        "f0": {"rows": 10, "cols": {"ts": {"lo": 0, "hi": 100}}},
        "f1": {"rows": 10, "cols": {"ts": {"lo": 0, "hi": 100}}},
        "f2": {"rows": 10, "cols": {}},
        "f3": {"rows": 10, "cols": {"ts": {"lo": 0, "hi": 100}}},
    }
    t = _fake_table(
        buckets={"0": ["f0", "f1", "f2", "f3"]}, file_stats=stats,
        props={"cluster.cols": ["ts"]},
    )
    assert plan(t) == []
    # disjoint (clustered) ranges → no action either
    t2 = _fake_table(
        buckets={"0": ["f0", "f1", "f2", "f3"]},
        file_stats={
            f"f{i}": {
                "rows": 10,
                "cols": {"ts": {"lo": i * 10, "hi": i * 10 + 9}},
            }
            for i in range(4)
        },
        props={"cluster.cols": ["ts"]},
    )
    assert plan(t2) == []


def test_plan_flags_manifest_growth():
    t = _fake_table(n_versions=40)
    acts = plan(t, max_retained_versions=30, vacuum_keep_versions=3)
    assert [a.kind for a in acts] == ["vacuum"]
    assert acts[0].params["keep_versions"] == 3


def test_plan_rebucket_is_opt_in_and_stats_gated():
    stats = {f"f{i}": {"rows": 50_000} for i in range(4)}
    t = _fake_table(
        buckets={str(i): [f"f{i}"] for i in range(4)},
        file_stats=stats, n_buckets=4,
    )
    assert plan(t) == []  # not asked → no advice
    acts = plan(t, target_rows_per_bucket=10_000)
    assert [a.kind for a in acts] == ["rebucket"]
    # 200k rows / target 10k → 32 buckets (next power of two ≥ 20 from 4)
    assert acts[0].params["new_n_buckets"] == 32
    # incomplete row stats → never guess
    t.snapshot.file_stats = {"f0": {"rows": 50_000}}
    assert plan(t, target_rows_per_bucket=10_000) == []


def test_plan_compacting_bucket_not_double_clustered():
    stats = {
        f"f{i}": {"rows": 10, "cols": {"ts": {"lo": 0, "hi": 100}}}
        for i in range(9)
    }
    t = _fake_table(
        buckets={"0": [f"f{i}" for i in range(9)]},
        file_stats=stats, props={"cluster.cols": ["ts"]},
    )
    acts = plan(t, max_files_per_bucket=8)
    # the compact wins; the drift re-measures after fresh files land
    assert [a.kind for a in acts] == ["compact"]


# -- real tables -------------------------------------------------------


def test_plan_executes_compaction_on_mor_table(spark, tmp_path):
    cfg = SinkConfig(n_buckets=2, merge_mode="mor")
    ap = CdcApplier(spark, cfg, str(tmp_path / "t"), audit_ts=audit_col())
    for b in range(3):
        ap.apply_batch(
            _events_df(spark, [ev(10 * b + i, "u", f"c{i}", 0)
                               for i in range(4)]),
            batch_id=b,
        )
    t = ap.table()
    assert t.snapshot.delta_buckets  # steady MOR batches left deltas
    before = sorted(
        (r["conv_id"], r["turn_idx"]) for r in ap.read_target().collect()
    )
    acts = plan(t, max_delta_depth=1, execute=True)
    assert any(a.kind == "compact" and a.params["result"] for a in acts)
    t2 = ap.table()
    assert not t2.snapshot.delta_buckets
    after = sorted(
        (r["conv_id"], r["turn_idx"]) for r in ap.read_target().collect()
    )
    assert after == before


def test_cluster_by_records_contract_then_plan_sees_drift(
    spark, tmp_path
):
    cfg = SinkConfig(n_buckets=1)
    ap = CdcApplier(spark, cfg, str(tmp_path / "t"), audit_ts=audit_col())
    ap.apply_batch(
        _events_df(spark, [ev(i, "u", f"c{i}", i) for i in range(30)]),
        batch_id=0,
    )
    t = ap.table()
    cluster_by(t, ["turn_idx"], files_per_bucket=2)
    assert t.snapshot.props["cluster.cols"] == ["turn_idx"]
    assert len(t.snapshot.buckets["0"]) >= 2  # disjoint range slices
    # freshly clustered: no drift
    assert not [a for a in plan(t, min_cluster_files=2)
                if a.kind == "cluster_by"]
    # out-of-order appends smear the axis: each appended file spans
    # the FULL turn_idx range, overlapping every clustered slice
    # (append path, like a backfill — the COW merge path would rewrite
    # the bucket and reset the layout)
    for b in (1, 2):
        extra = t.read().withColumn(
            "conv_id", F.concat(F.lit(f"x{b}-"), F.col("conv_id"))
        )
        t.commit_append(t.with_bucket(extra))
    acts = [a for a in plan(t, min_cluster_files=2,
                            max_files_per_bucket=50)
            if a.kind == "cluster_by"]
    assert acts and acts[0].params["cols"] == ["turn_idx"]


def test_streaming_maintenance_cadence_triggers_compaction(
    spark, tmp_path
):
    cfg = SinkConfig(n_buckets=2, merge_mode="mor")
    ap = CdcApplier(spark, cfg, str(tmp_path / "t"), audit_ts=audit_col())
    runner = CdcStreamRunner(
        ap, str(tmp_path / "ckpt"),
        maintenance_every_batches=2,
        maintenance_kwargs={"max_delta_depth": 1},
    )
    for b in range(3):
        runner.process_batch(
            _events_df(spark, [ev(10 * b + i, "u", f"c{i}", 0)
                               for i in range(4)]),
            batch_id=b,
        )
    # cadence fired at batch 2 and the policy chose to compact
    assert runner.maintenance_log
    bid, acts = runner.maintenance_log[0]
    assert bid == 2 and any(a.kind == "compact" for a in acts)
    assert not ap.table().snapshot.delta_buckets


def test_maintenance_vacuum_keeps_follower_watermarks(spark, tmp_path):
    """Review regression: a cadence-triggered vacuum must not drop
    the upstream versions a follower's change-feed watermark points
    at — that would wedge the stream until a manual full refresh."""
    from kafka_jdbc_sink_connector_spark.streaming.cascade import (
        CascadeRunner,
    )

    cfg = SinkConfig(n_buckets=2, delete_mode="delete")
    bronze = CdcApplier(spark, cfg, str(tmp_path / "t"),
                        audit_ts=audit_col())
    silver = CdcApplier(
        spark, SinkConfig(n_buckets=2, delete_mode="delete"),
        str(tmp_path / "s"), audit_ts=audit_col(),
    )
    cascade = CascadeRunner(spark, bronze.table_path, silver)
    runner = CdcStreamRunner(
        bronze, str(tmp_path / "ckpt"),
        followers=[cascade],
        maintenance_every_batches=1,
        # absurdly aggressive policy: vacuum every tick keeping 1
        maintenance_kwargs={"max_retained_versions": 1,
                            "vacuum_keep_versions": 1},
    )
    for b in range(4):
        runner.process_batch(
            _events_df(spark, [ev(10 * b + i, "u", f"c{i}", 0,
                                  text=f"r{b}")
                               for i in range(3)]),
            batch_id=b,
        )
    # the stream never wedged (each follower sync found its window)
    # and silver converged to bronze
    got = sorted(
        (r["conv_id"], r["text"])
        for r in silver.read_target().collect()
    )
    want = sorted(
        (r["conv_id"], r["text"])
        for r in bronze.read_target().collect()
    )
    assert got == want
    # vacuum DID run (the log shows executed actions) but was floored
    ran_vacuum = any(
        a.kind == "vacuum"
        for _, acts in runner.maintenance_log
        for a in acts
    )
    assert ran_vacuum


def test_vacuum_keep_from_version_retains_watermark_window(
    spark, tmp_path
):
    """Review regression: keep_from_version is evaluated at EXECUTION
    time, so extra maintenance commits in the same tick cannot push
    the watermark manifest out of a count-based retention window."""
    from kafka_jdbc_sink_connector_spark.lake.maintenance import vacuum

    cfg = SinkConfig(n_buckets=2)
    ap = CdcApplier(spark, cfg, str(tmp_path / "t"), audit_ts=audit_col())
    for b in range(5):
        ap.apply_batch(
            _events_df(spark, [ev(10 * b + i, "u", f"c{i}", 0)
                               for i in range(3)]),
            batch_id=b,
        )
    t = ap.table()
    hist = t.history()
    wmin = hist[1]  # a consumer's watermark two commits back
    res = vacuum(t, keep_versions=1, keep_from_version=wmin)
    kept = set(res["kept_versions"])
    assert {v for v in hist if v >= wmin} <= kept
    assert hist[0] not in kept
    # the watermark version is still readable
    assert t._read_version(wmin) is not None
