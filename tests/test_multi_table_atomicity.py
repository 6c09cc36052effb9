"""Cross-table batch atomicity for :class:`MultiTableRunner`.

The reference commits ONE JDBC transaction per ``put()`` spanning all
routed tables (``JdbcAuditDbWriter.java:63-94``, commit at ``:84``).
Lake tables commit per-table, so the engine reproduces the
consistency point with a commit-group marker published only after
every routed table committed — these tests crash the runner BETWEEN
two tables' commits and assert (a) consistent readers never see the
torn middle and (b) the restart replay converges exactly-once.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kafka_jdbc_sink_connector_spark.apply import CdcApplier
from kafka_jdbc_sink_connector_spark.config import ConfigError, SinkConfig
from kafka_jdbc_sink_connector_spark.streaming.runner import MultiTableRunner

from tests.test_apply_batch import _events_df, audit_col, ev


class _CrashingApplier(CdcApplier):
    """Raises a NON_RETRIABLE error instead of committing, simulating
    a crash after the previous table's commit."""

    def apply_batch(self, *a, **kw):  # noqa: D102
        raise ConfigError("injected crash before this table's commit")


def _df(spark, rows):
    return _events_df(spark, rows, with_optional=("topic",))


def _batch(spark, tag, n=4, off0=0):
    rows = []
    for i in range(n):
        t = "t_a" if i % 2 == 0 else "t_b"
        rows.append(ev(off0 + i, "u", f"{tag}-{t}-{i}", 0, topic=t))
    return _df(spark, rows)


def _mk_runner(spark, tmp_path, crash_topic=None):
    cfg = SinkConfig(n_buckets=2)

    def factory(topic):
        cls = _CrashingApplier if topic == crash_topic else CdcApplier
        return cls(
            spark, cfg, str(tmp_path / f"tbl_{topic}"),
            audit_ts=audit_col(),
        )

    return MultiTableRunner(factory, str(tmp_path / "ckpt"))


def test_crash_between_table_commits_then_converge(spark, tmp_path):
    # batch 0 commits fully on both tables → marker 0
    r = _mk_runner(spark, tmp_path)
    r.process_batch(_batch(spark, "b0"), batch_id=0)
    assert r.latest_group_id() == 0
    view0 = r.read_consistent(spark)
    assert set(view0) == {"t_a", "t_b"}
    assert view0["t_a"].count() == 2 and view0["t_b"].count() == 2

    # batch 1 crashes between t_a's commit and t_b's (topics apply in
    # sorted order, so t_a is already committed when t_b raises)
    crash = _mk_runner(spark, tmp_path, crash_topic="t_b")
    with pytest.raises(ConfigError):
        crash.process_batch(_batch(spark, "b1", off0=10), batch_id=1)

    # the live heads are torn: t_a has batch 1, t_b does not...
    live_a = CdcApplier(
        spark, SinkConfig(n_buckets=2), str(tmp_path / "tbl_t_a"),
        audit_ts=audit_col(),
    )
    assert live_a.read_target().filter(
        F.col("conv_id").startswith("b1-")
    ).count() == 2
    # ...but no marker was published, so consistent readers still see
    # exactly the batch-0 cut on BOTH tables — never the torn middle
    reader = _mk_runner(spark, tmp_path)
    assert reader.latest_group_id() == 0
    view = reader.read_consistent(spark)
    assert view["t_a"].filter(
        F.col("conv_id").startswith("b1-")
    ).count() == 0
    assert view["t_b"].filter(
        F.col("conv_id").startswith("b1-")
    ).count() == 0

    # restart: replaying the same batch converges — t_a skips via its
    # watermark (no duplicates), t_b applies, marker 1 publishes
    retry = _mk_runner(spark, tmp_path)
    retry.process_batch(_batch(spark, "b1", off0=10), batch_id=1)
    assert retry.latest_group_id() == 1
    view = retry.read_consistent(spark)
    for topic in ("t_a", "t_b"):
        got = view[topic].filter(
            F.col("conv_id").startswith("b1-")
        ).count()
        assert got == 2, f"{topic}: batch 1 missing or duplicated"
    # exactly-once on the already-committed side
    assert view["t_a"].count() == 4


def test_group_marker_carries_forward_unrouted_tables(spark, tmp_path):
    r = _mk_runner(spark, tmp_path)
    r.process_batch(_batch(spark, "b0"), batch_id=0)
    # batch 1 routes ONLY t_a; the marker must still pin t_b (its old
    # version contains all of t_b's batches ≤ 1)
    only_a = _df(spark, [ev(20 + i, "u", f"b1-t_a-{i}", 0, topic="t_a")
                         for i in range(2)])
    r.process_batch(only_a, batch_id=1)
    rec = r.read_group(1)
    assert set(rec["tables"]) == {"t_a", "t_b"}
    view = r.read_consistent(spark, batch_id=1)
    assert view["t_b"].count() == 2
    assert view["t_a"].count() == 4


def test_replayed_batch_republishes_marker_idempotently(spark, tmp_path):
    r = _mk_runner(spark, tmp_path)
    df = _batch(spark, "b0")
    r.process_batch(df, batch_id=0)
    v_before = r.read_group(0)["tables"]
    # a checkpoint replay of an already-marked batch: every table
    # skips, the marker rewrite is a no-op in content
    r2 = _mk_runner(spark, tmp_path)
    r2.process_batch(df, batch_id=0)
    assert r2.read_group(0)["tables"] == v_before
    assert r2.read_consistent(spark)["t_a"].count() == 2


def test_expire_groups_retention(spark, tmp_path):
    r = _mk_runner(spark, tmp_path)
    for b in range(4):
        r.process_batch(_batch(spark, f"b{b}", off0=10 * b), batch_id=b)
    assert r.latest_group_id() == 3
    removed = r.expire_groups(keep_groups=2)
    assert removed == 2
    # newest markers survive; consistent reads still work
    assert r.latest_group_id() == 3
    assert r.read_group(2)["batch_id"] == 2
    view = r.read_consistent(spark)
    assert view["t_a"].count() == 8
    import pytest as _pytest

    with _pytest.raises(FileNotFoundError):
        r.read_group(0)
    with _pytest.raises(ValueError):
        r.expire_groups(0)
    # carry-forward still intact after expiry on the next batch
    r.process_batch(_batch(spark, "b4", off0=40), batch_id=4)
    assert set(r.read_group(4)["tables"]) == {"t_a", "t_b"}
