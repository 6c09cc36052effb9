"""Bronze → silver cascade: the change feed as an incremental source
feeding a downstream CdcApplier, exactly-once per upstream version,
with incremental-view-maintenance filter semantics.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kafka_jdbc_sink_connector_spark.apply import CdcApplier
from kafka_jdbc_sink_connector_spark.config import SinkConfig
from kafka_jdbc_sink_connector_spark.lake.maintenance import vacuum
from kafka_jdbc_sink_connector_spark.lake.table import LakeTable
from kafka_jdbc_sink_connector_spark.streaming.cascade import CascadeRunner

from tests.test_apply_batch import _events_df, audit_col, ev


def _mk_bronze(spark, path):
    """Hard-delete bronze so its read() is exactly the live rows."""
    cfg = SinkConfig(n_buckets=4, delete_mode="delete")
    return CdcApplier(spark, cfg, path, audit_ts=audit_col())


def _mk_silver(spark, path, **cfg_kw):
    cfg = SinkConfig(n_buckets=4, delete_mode="delete", **cfg_kw)
    return CdcApplier(spark, cfg, path, audit_ts=audit_col())


def _rows(applier, cols=("conv_id", "turn_idx", "role", "text")):
    return {tuple(r) for r in applier.read_target().select(*cols).collect()}


B0 = [ev(i, "u", f"c{i % 4}", i % 3) for i in range(12)]
B1 = (
    [ev(100 + i, "u", f"c{i % 4}", i % 3, text="rev2") for i in range(8)]
    + [ev(120, "d", "c1", 1), ev(121, "d", "c2", 0)]
)
B2 = [ev(200 + i, "u", f"c{(i + 1) % 5}", (i + 2) % 3, text="rev3")
      for i in range(9)]


@pytest.mark.parametrize("silver_mode", ["cow", "mor"])
def test_cascade_mirror_bootstrap_and_incremental(
    spark, tmp_path, silver_mode
):
    bronze = _mk_bronze(spark, str(tmp_path / "bronze"))
    silver = _mk_silver(spark, str(tmp_path / "silver"),
                        merge_mode=silver_mode)
    run = CascadeRunner(spark, bronze.table_path, silver)

    bronze.apply_batch(_events_df(spark, B0), batch_id=0)
    r = run.sync()
    assert r.mode == "bootstrap" and not r.batch.skipped
    assert _rows(silver) == _rows(bronze)

    bronze.apply_batch(_events_df(spark, B1), batch_id=1)
    bronze.apply_batch(_events_df(spark, B2), batch_id=2)
    r = run.sync()
    assert r.mode == "incremental"
    assert _rows(silver) == _rows(bronze)

    # idempotent: nothing new upstream → noop; replaying the same
    # window is watermark-skipped
    assert run.sync().mode == "noop"
    assert run.watermark() == LakeTable.load(spark, bronze.table_path).version


def test_cascade_filter_rows_enter_and_leave_view(spark, tmp_path):
    """IVM semantics: an update moving a row out of the predicate must
    DELETE it downstream; one moving in must insert it."""
    bronze = _mk_bronze(spark, str(tmp_path / "bronze"))
    silver = _mk_silver(spark, str(tmp_path / "silver"))
    run = CascadeRunner(
        spark, bronze.table_path, silver,
        row_filter=F.col("role") == "user",
    )
    b0 = [
        ev(0, "u", "a", 0, role="user"),
        ev(1, "u", "b", 0, role="assistant"),   # outside view
        ev(2, "u", "c", 0, role="user"),
        ev(3, "u", "n", 0, role=None),          # NULL predicate → outside
    ]
    bronze.apply_batch(_events_df(spark, b0), batch_id=0)
    run.sync()
    assert {r[0] for r in _rows(silver)} == {"a", "c"}

    b1 = [
        ev(10, "u", "a", 0, role="assistant"),  # leaves the view
        ev(11, "u", "b", 0, role="user"),       # enters the view
        ev(12, "d", "c", 0),                    # upstream hard delete
        ev(13, "u", "d", 0, role="user"),       # brand new in view
        ev(14, "u", "n", 0, role=None),         # stays outside (NULL)
    ]
    bronze.apply_batch(_events_df(spark, b1), batch_id=1)
    r = run.sync()
    assert r.mode == "incremental"
    assert {r[0] for r in _rows(silver)} == {"b", "d"}
    # and equals the declarative view over bronze
    want = {tuple(r) for r in bronze.read_target()
            .filter(F.col("role") == "user")
            .select("conv_id", "turn_idx", "role", "text").collect()}
    assert _rows(silver) == want


def test_cascade_transform_projection(spark, tmp_path):
    bronze = _mk_bronze(spark, str(tmp_path / "bronze"))
    silver = _mk_silver(spark, str(tmp_path / "silver"))

    def transform(df):
        return df.withColumn("text_len", F.length("text")).drop("tool")

    run = CascadeRunner(spark, bronze.table_path, silver,
                        transform=transform)
    bronze.apply_batch(_events_df(spark, B0), batch_id=0)
    run.sync()
    bronze.apply_batch(_events_df(spark, B1), batch_id=1)
    run.sync()
    got = {tuple(r) for r in silver.read_target()
           .select("conv_id", "turn_idx", "text_len").collect()}
    want = {tuple(r) for r in bronze.read_target()
            .select("conv_id", "turn_idx", F.length("text")).collect()}
    assert got == want

    bad = CascadeRunner(
        spark, bronze.table_path,
        _mk_silver(spark, str(tmp_path / "s2")),
        transform=lambda df: df.select("conv_id", "text"),
    )
    with pytest.raises(ValueError, match="dropped required column"):
        bad.sync()


def test_cascade_chain_three_hops(spark, tmp_path):
    """Silver is itself a managed lake table, so gold can tail it."""
    bronze = _mk_bronze(spark, str(tmp_path / "bronze"))
    silver = _mk_silver(spark, str(tmp_path / "silver"))
    gold = _mk_silver(spark, str(tmp_path / "gold"))
    s_run = CascadeRunner(spark, bronze.table_path, silver)
    g_run = CascadeRunner(spark, silver.table_path, gold)

    bronze.apply_batch(_events_df(spark, B0), batch_id=0)
    s_run.sync()
    g_run.sync()
    bronze.apply_batch(_events_df(spark, B1), batch_id=1)
    s_run.sync()
    g_run.sync()
    assert _rows(gold) == _rows(silver) == _rows(bronze)


def test_cascade_soft_delete_upstream_propagates(spark, tmp_path):
    """A soft-delete bronze marks rows instead of removing them; with
    ``upstream_deleted_when`` the cascade turns those markers into
    downstream deletes instead of resurrecting the rows as payload."""
    bronze = CdcApplier(
        spark, SinkConfig(n_buckets=4), str(tmp_path / "bronze"),
        audit_ts=audit_col(),
    )  # default soft delete: op_type U/D marker column
    silver = _mk_silver(spark, str(tmp_path / "silver"))  # hard delete
    run = CascadeRunner(
        spark, bronze.table_path, silver,
        upstream_deleted_when=F.col("op_type") == "D",
    )
    bronze.apply_batch(_events_df(spark, B0), batch_id=0)
    run.sync()
    bronze.apply_batch(_events_df(spark, B1), batch_id=1)  # 2 deletes
    r = run.sync()
    assert r.mode == "incremental"
    live = {tuple(x) for x in bronze.read_target()
            .filter(F.col("op_type") != "D")  # C (insert) and U (update)
            .select("conv_id", "turn_idx", "text").collect()}
    got = {tuple(x) for x in silver.read_target()
           .select("conv_id", "turn_idx", "text").collect()}
    assert got == live
    assert len(live) < len(  # the deletes actually exercised the path
        bronze.read_target().select("conv_id", "turn_idx").collect()
    )


@pytest.mark.parametrize("crash_point", ["before_commit", "after_commit"])
def test_cascade_crash_and_retry_converges(
    spark, tmp_path, monkeypatch, crash_point
):
    """Crash inside a sync, either side of the downstream merge
    commit: a retried sync converges to the no-crash state exactly
    once (before: the window re-applies; after: the watermark already
    advanced and the retry no-ops)."""
    import kafka_jdbc_sink_connector_spark.apply as apply_mod

    class Boom(RuntimeError):
        pass

    bronze = _mk_bronze(spark, str(tmp_path / "bronze"))
    silver = _mk_silver(spark, str(tmp_path / "silver"))
    run = CascadeRunner(spark, bronze.table_path, silver)
    bronze.apply_batch(_events_df(spark, B0), batch_id=0)
    run.sync()
    bronze.apply_batch(_events_df(spark, B1), batch_id=1)

    real = apply_mod.merge_ops.merge_into

    def wrap(*a, **k):
        if crash_point == "before_commit":
            raise Boom()
        out = real(*a, **k)
        raise Boom()

    monkeypatch.setattr(apply_mod.merge_ops, "merge_into", wrap)
    with pytest.raises(Boom):
        run.sync()
    monkeypatch.setattr(apply_mod.merge_ops, "merge_into", real)

    r = run.sync()
    if crash_point == "before_commit":
        assert r.mode == "incremental" and not r.batch.skipped
    else:
        assert r.mode == "noop"  # commit landed before the crash
    assert _rows(silver) == _rows(bronze)
    assert run.sync().mode == "noop"


def test_cascade_full_refresh_after_vacuumed_window(spark, tmp_path):
    bronze = _mk_bronze(spark, str(tmp_path / "bronze"))
    silver = _mk_silver(spark, str(tmp_path / "silver"))
    run = CascadeRunner(spark, bronze.table_path, silver)

    bronze.apply_batch(_events_df(spark, B0), batch_id=0)
    run.sync()
    bronze.apply_batch(_events_df(spark, B1), batch_id=1)
    bronze.apply_batch(_events_df(spark, B2), batch_id=2)
    # retention lapsed: the watermarked version's manifest is gone
    vacuum(LakeTable.load(spark, bronze.table_path), keep_versions=1)
    with pytest.raises(Exception):
        run.sync()  # incremental window unavailable
    r = run.sync(full_refresh=True)
    assert r.mode == "refresh"
    assert _rows(silver) == _rows(bronze)


def test_cascade_schema_evolution_propagates(spark, tmp_path):
    """Upstream evolves (new nullable column mid-stream): the change
    feed carries it and the downstream applier auto-evolves, so the
    silver table grows the column without intervention."""
    bronze = _mk_bronze(spark, str(tmp_path / "bronze"))
    silver = _mk_silver(spark, str(tmp_path / "silver"))
    run = CascadeRunner(spark, bronze.table_path, silver)
    bronze.apply_batch(_events_df(spark, B0), batch_id=0)
    run.sync()
    assert "tool" not in silver.read_target().columns
    b1 = [ev(100 + i, "u", f"c{i % 4}", i % 3, tool=f"t{i}")
          for i in range(6)]
    r = bronze.apply_batch(
        _events_df(spark, b1, with_optional=("tool",)), batch_id=1
    )
    assert "tool" in r.evolved_columns
    run.sync()
    got = {tuple(x) for x in silver.read_target()
           .select("conv_id", "turn_idx", "tool").collect()}
    want = {tuple(x) for x in bronze.read_target()
            .select("conv_id", "turn_idx", "tool").collect()}
    assert got == want


def test_runner_followers_cascade_in_loop(spark, tmp_path):
    """CdcStreamRunner(followers=[cascade]): silver advances in
    lock-step with every ingested micro-batch, and a replayed batch
    (apply skips) still syncs a follower that missed its window."""
    from kafka_jdbc_sink_connector_spark.streaming.runner import (
        CdcStreamRunner,
    )

    bronze = _mk_bronze(spark, str(tmp_path / "bronze"))
    silver = _mk_silver(spark, str(tmp_path / "silver"))
    cascade = CascadeRunner(spark, bronze.table_path, silver)
    runner = CdcStreamRunner(
        bronze, str(tmp_path / "ckpt"), followers=[cascade]
    )
    runner.process_batch(_events_df(spark, B0), batch_id=0)
    assert _rows(silver) == _rows(bronze)
    runner.process_batch(_events_df(spark, B1), batch_id=1)
    assert _rows(silver) == _rows(bronze)

    # follower crashed before syncing batch 2: the stream replays the
    # batch; apply skips via its watermark, the follower catches up
    bronze.apply_batch(_events_df(spark, B2), batch_id=2,
                       source_id="stream")
    assert cascade.watermark() < bronze.table().version
    res = runner.process_batch(_events_df(spark, B2), batch_id=2)
    assert res.skipped
    assert cascade.watermark() == bronze.table().version
    assert _rows(silver) == _rows(bronze)


def test_cascade_follows_upstream_restore(spark, tmp_path):
    """A bronze RESTORE is one more commit; the next sync's feed window
    spans it, emits the inverse diff, and silver follows the rollback
    — no special-casing anywhere."""
    bronze = _mk_bronze(spark, str(tmp_path / "bronze"))
    silver = _mk_silver(spark, str(tmp_path / "silver"))
    run = CascadeRunner(spark, bronze.table_path, silver)
    r0 = bronze.apply_batch(_events_df(spark, B0), batch_id=0)
    run.sync()
    state_v0 = _rows(bronze)
    bronze.apply_batch(_events_df(spark, B1), batch_id=1)
    run.sync()
    assert _rows(silver) == _rows(bronze) != state_v0

    bronze.table().restore(r0.snapshot_version)
    r = run.sync()
    assert r.mode == "incremental"
    assert _rows(silver) == _rows(bronze) == state_v0


def test_cascade_mor_lock_step_rides_fast_path(spark, tmp_path):
    """Lock-step followers on a merge-on-read bronze sync exactly one
    delta commit per window — precisely the shape the change feed's
    adjacent-delta fast path accepts, so steady-state cascade cost is
    the batch's delta files + key-filtered old buckets, never a
    snapshot resolve."""
    from kafka_jdbc_sink_connector_spark.lake import changes
    from kafka_jdbc_sink_connector_spark.streaming.runner import (
        CdcStreamRunner,
    )

    bronze = CdcApplier(
        spark,
        SinkConfig(n_buckets=4, merge_mode="mor", delete_mode="delete"),
        str(tmp_path / "bronze"), audit_ts=audit_col(),
    )
    silver = _mk_silver(spark, str(tmp_path / "silver"))
    cascade = CascadeRunner(spark, bronze.table_path, silver)
    runner = CdcStreamRunner(
        bronze, str(tmp_path / "ckpt"), followers=[cascade]
    )
    runner.process_batch(_events_df(spark, B0), batch_id=0)  # bootstrap
    runner.process_batch(_events_df(spark, B1), batch_id=1)
    runner.process_batch(_events_df(spark, B2), batch_id=2)
    t = bronze.table()
    assert t.snapshot.delta_buckets  # steady batches committed as deltas
    # every steady-state sync window was a single delta commit → the
    # fast path's eligibility test accepts it
    head = t.version
    for v in range(2, head + 1):
        old, new = t._read_version(v - 1), t._read_version(v)
        assert changes._new_commit_files(old, new) is not None, v
    assert _rows(silver) == _rows(bronze)


def test_cascade_sync_races_concurrent_upstream_writer(spark, tmp_path):
    """Upstream commits landing WHILE syncs run are never skipped:
    ``sync()`` pins ``head`` at entry and watermarks ``batch_id=head``,
    so a commit racing past that read lands in the NEXT sync's
    ``(watermark, head]`` window. A writer thread applies batches
    continuously while the main thread syncs in a loop; the sync
    windows must chain gaplessly and the silver must converge to the
    final bronze state."""
    import threading

    bronze = _mk_bronze(spark, str(tmp_path / "bronze"))
    silver = _mk_silver(spark, str(tmp_path / "silver"))
    run = CascadeRunner(spark, bronze.table_path, silver)

    n_batches, errs = 8, []
    # seed the table before the race so every sync sees an upstream
    # (a cascade is configured after its bronze exists)
    bronze.apply_batch(
        _events_df(spark, [ev(i, "u", f"c{i % 6}", 0) for i in range(4)]),
        batch_id=100,
    )

    def writer():
        try:
            for b in range(n_batches):
                rows = (
                    [ev(100 * b + i, "u", f"c{(b + i) % 6}", i % 3,
                        text=f"rev{b}") for i in range(5)]
                    + ([ev(100 * b + 50, "d", f"c{b % 6}", 0)]
                       if b % 2 else [])
                )
                bronze.apply_batch(_events_df(spark, rows), batch_id=b)
        except Exception as e:  # noqa: BLE001 — surface in main thread
            errs.append(e)

    t = threading.Thread(target=writer)
    t.start()
    results = []
    while t.is_alive():
        results.append(run.sync())
    t.join()
    assert not errs, errs
    results.append(run.sync())  # cover the final window
    assert run.sync().mode == "noop"

    # windows chain without gaps: each non-noop sync starts exactly
    # where the previous one ended (a skipped racing commit would
    # surface as from_version > previous upstream_version)
    applied = [r for r in results if r.mode != "noop"]
    assert applied, "writer finished before any sync ran"
    for prev, nxt in zip(applied, applied[1:]):
        assert nxt.from_version == prev.upstream_version, (prev, nxt)
    # watermark reached the true head and the state converged
    head = LakeTable.load(spark, bronze.table_path).version
    assert run.watermark() == head
    assert applied[-1].upstream_version == head or results[-1].mode == "noop"
    assert _rows(silver) == _rows(bronze)
