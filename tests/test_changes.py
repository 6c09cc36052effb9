"""Change data feed (lake/changes.py): keywise diff of two snapshot
versions — insert/update/delete classification, soft deletes surface
as updates, compare_cols excludes apply-time noise."""

from __future__ import annotations

import pytest

from kafka_jdbc_sink_connector_spark.apply import CdcApplier
from kafka_jdbc_sink_connector_spark.config import SinkConfig
from kafka_jdbc_sink_connector_spark.lake.changes import table_changes

from tests.test_apply_batch import _events_df, audit_col, ev


@pytest.mark.parametrize("merge_mode", ["cow", "mor"])
def test_change_feed_insert_update_delete(spark, tmp_table, merge_mode):
    cfg = SinkConfig(n_buckets=4, merge_mode=merge_mode,
                     delete_mode="delete")
    applier = CdcApplier(spark, cfg, tmp_table, audit_ts=audit_col())
    r1 = applier.apply_batch(
        _events_df(spark, [ev(1, "c", "conv-a", 0),
                           ev(2, "c", "conv-b", 0, text="stays"),
                           ev(3, "c", "conv-c", 0)]),
        batch_id=0,
    )
    applier.apply_batch(
        _events_df(spark, [ev(4, "u", "conv-a", 0, text="v2"),
                           ev(5, "d", "conv-c", 0),
                           ev(6, "c", "conv-d", 0)]),
        batch_id=1,
    )
    feed = {
        (r["conv_id"], r["turn_idx"]): r
        for r in table_changes(
            applier.table(), from_version=r1.snapshot_version
        ).collect()
    }
    assert feed[("conv-a", 0)]["_change_type"] == "update"
    assert feed[("conv-a", 0)]["text"] == "v2"        # post-image
    assert feed[("conv-c", 0)]["_change_type"] == "delete"
    assert feed[("conv-c", 0)]["text"] is not None    # pre-image kept
    assert feed[("conv-d", 0)]["_change_type"] == "insert"
    assert ("conv-b", 0) not in feed                  # unchanged: absent


def test_change_feed_prunes_untouched_buckets(spark, tmp_table):
    """Manifest-level pruning: only buckets whose file lists differ
    between the versions are read — a one-conversation update scans
    one bucket, not the table."""
    cfg = SinkConfig(n_buckets=8)
    applier = CdcApplier(spark, cfg, tmp_table, audit_ts=audit_col())
    rows0 = [ev(i, "c", f"conv-{i}", 0) for i in range(1, 17)]
    r1 = applier.apply_batch(_events_df(spark, rows0), batch_id=0)
    applier.apply_batch(
        _events_df(spark, [ev(100, "u", "conv-3", 0, text="v2")]),
        batch_id=1,
    )
    feed = table_changes(applier.table(), from_version=r1.snapshot_version)
    rows = feed.collect()
    assert len(rows) == 1 and rows[0]["text"] == "v2"
    # exactly one bucket's files per side back the plan (COW rewrote
    # only conv-3's bucket); unpruned it would read all 8 per side
    files = feed.inputFiles()
    assert 0 < len(files) <= 4, files
    whole_table = applier.read_target().inputFiles()
    assert len(files) < len(whole_table), (files, whole_table)


def test_change_feed_across_schema_evolution(spark, tmp_table):
    """The old version predates an evolved column: its rows compare as
    NULL for that column (same null-backfill as table reads)."""
    cfg = SinkConfig(n_buckets=4)
    applier = CdcApplier(spark, cfg, tmp_table, audit_ts=audit_col())
    r1 = applier.apply_batch(
        _events_df(spark, [ev(1, "c", "conv-a", 0),
                           ev(2, "c", "conv-b", 0)]),
        batch_id=0,
    )
    r2 = applier.apply_batch(
        _events_df(spark, [ev(3, "u", "conv-a", 0, tool="search")],
                   with_optional=("tool",)),
        batch_id=1,
    )
    assert r2.evolved_columns == ["tool"]
    feed = {r["conv_id"]: r for r in table_changes(
        applier.table(), from_version=r1.snapshot_version
    ).collect()}
    assert feed["conv-a"]["_change_type"] == "update"
    assert feed["conv-a"]["tool"] == "search"
    assert "conv-b" not in feed  # tool NULL==NULL → unchanged


def test_change_feed_soft_delete_is_update(spark, tmp_table):
    cfg = SinkConfig(n_buckets=4)  # soft delete default
    applier = CdcApplier(spark, cfg, tmp_table, audit_ts=audit_col())
    r1 = applier.apply_batch(
        _events_df(spark, [ev(1, "c", "conv-a", 0)]), batch_id=0
    )
    applier.apply_batch(_events_df(spark, [ev(2, "d", "conv-a", 0)]),
                        batch_id=1)
    feed = table_changes(
        applier.table(), from_version=r1.snapshot_version
    ).collect()
    assert len(feed) == 1
    assert feed[0]["_change_type"] == "update"   # row still exists
    assert feed[0]["op_type"] == "D"


def test_change_feed_compare_cols_excludes_noise(spark, tmp_table):
    """A replayed identical value with a fresh audit ts is NOT an
    update when audit_ts is excluded from the comparison."""
    from pyspark.sql import functions as F

    cfg = SinkConfig(n_buckets=4)
    applier = CdcApplier(
        spark, cfg, tmp_table,
        audit_ts=F.lit("2024-06-01T00:00:00Z").cast("timestamp"),
    )
    r1 = applier.apply_batch(
        _events_df(spark, [ev(1, "c", "conv-a", 0)]), batch_id=0
    )
    # batch 2 re-delivers the same content under a new offset, with a
    # DIFFERENT audit timestamp
    applier.audit_ts = F.lit("2024-06-02T00:00:00Z").cast("timestamp")
    applier.apply_batch(
        _events_df(spark, [ev(1, "c", "conv-a", 0)]), batch_id=1
    )
    t = applier.table()
    noisy = table_changes(t, from_version=r1.snapshot_version).collect()
    assert len(noisy) == 1  # audit ts moved → shows as update
    quiet = table_changes(
        t, from_version=r1.snapshot_version,
        compare_cols=["text", "role", "ts", "op_type"],
    ).collect()
    assert quiet == []

    with pytest.raises(ValueError, match="from_version"):
        table_changes(t, from_version=t.version + 1, to_version=0)


# --- adjacent-delta fast path ----------------------------------------


def _feed_key(r):
    return (r["conv_id"], r["turn_idx"], r["_change_type"])


def _rows_sorted(df):
    return sorted(
        (tuple(r) for r in df.collect()),
        key=lambda t: tuple((v is None, str(v)) for v in t),
    )


@pytest.mark.parametrize("delete_mode", ["update", "delete"])
def test_adjacent_delta_fast_path_equals_diff(spark, tmp_table,
                                              delete_mode):
    """For every adjacent MOR version pair, the delta-replay fast path
    and the two-snapshot diff must produce identical change rows —
    inserts, updates, hard deletes (pre-image), soft deletes
    (marker-flip update), and re-upserts of deleted keys included."""
    from kafka_jdbc_sink_connector_spark.lake import changes

    cfg = SinkConfig(n_buckets=4, merge_mode="mor",
                     delete_mode=delete_mode)
    applier = CdcApplier(spark, cfg, tmp_table, audit_ts=audit_col())
    batches = [
        [ev(1, "c", "conv-a", 0), ev(2, "c", "conv-b", 0),
         ev(3, "c", "conv-c", 0), ev(4, "c", "conv-d", 1)],
        [ev(5, "u", "conv-a", 0, text="v2"), ev(6, "d", "conv-c", 0),
         ev(7, "c", "conv-e", 0)],
        [ev(8, "c", "conv-c", 0, text="back"),   # re-insert deleted key
         ev(9, "d", "conv-c", 0),                # ...and delete again
         ev(10, "d", "conv-b", 0), ev(11, "u", "conv-d", 1, text="v3")],
    ]
    for i, rows in enumerate(batches):
        applier.apply_batch(_events_df(spark, rows), batch_id=i)
    t = applier.table()
    keys = list(t.snapshot.key_fields)
    cols = [f.name for f in t.snapshot.schema.fields]
    cmp_cols = [c for c in cols if c not in keys]
    fast_pairs = 0
    for v_from, v_to in zip(t.history(), t.history()[1:]):
        old_snap = t._read_version(v_from)
        new_snap = t._read_version(v_to)
        nd = changes._new_commit_files(old_snap, new_snap)
        if nd is None:
            continue
        fast_pairs += 1
        fast = changes._adjacent_delta_changes(
            t, old_snap, new_snap, *nd,
            keys=keys, cols=cols, cmp_cols=cmp_cols,
        )
        ref = changes._diff_changes(
            t, old_snap, new_snap, keys, cols, cmp_cols
        )
        assert _rows_sorted(fast) == _rows_sorted(ref), (v_from, v_to)
        # dispatch: table_changes itself must pick the fast path's plan
        assert _rows_sorted(
            table_changes(t, from_version=v_from, to_version=v_to)
        ) == _rows_sorted(ref)
    assert fast_pairs >= 2  # the steady-state delta commits


def test_adjacent_delta_fast_path_plan_reads_only_deltas_and_old_bucket(
    spark, tmp_table
):
    """Adjacent delta feed scans ONLY the commit's delta files plus the
    OLD state of their buckets — never other buckets, never the new
    snapshot's accumulated delta history outside them."""
    cfg = SinkConfig(n_buckets=8, merge_mode="mor")
    applier = CdcApplier(spark, cfg, tmp_table, audit_ts=audit_col())
    rows0 = [ev(i, "c", f"conv-{i}", 0) for i in range(1, 17)]
    applier.apply_batch(_events_df(spark, rows0), batch_id=0)
    applier.apply_batch(
        _events_df(spark, [ev(100, "u", "conv-3", 0, text="v2")]),
        batch_id=1,
    )
    t = applier.table()
    v_from, v_to = t.version - 1, t.version
    from kafka_jdbc_sink_connector_spark.lake import changes

    nd, _ = changes._new_commit_files(
        t._read_version(v_from), t._read_version(v_to)
    )
    assert nd is not None and len(nd) == 1   # one bucket touched
    (bucket,) = nd.keys()
    feed = table_changes(t, from_version=v_from, to_version=v_to)
    rows = feed.collect()
    assert len(rows) == 1 and rows[0]["text"] == "v2"
    files = feed.inputFiles()
    # every scanned file is either a delta of THIS commit or an
    # old-version file of the touched bucket
    new_delta_files = {f for fs in nd.values() for f in fs}
    for f in files:
        rel = f.split(tmp_table.rstrip("/") + "/", 1)[1]
        assert (
            rel in new_delta_files
            or f"__bucket_p={bucket}" in rel
        ), rel
    whole_table = applier.read_target().inputFiles()
    assert len(files) < len(whole_table)


def test_fast_path_declined_for_compaction_and_cow(spark, tmp_table):
    from kafka_jdbc_sink_connector_spark.lake import changes
    from kafka_jdbc_sink_connector_spark.lake.maintenance import compact

    cfg = SinkConfig(n_buckets=4, merge_mode="mor")
    applier = CdcApplier(spark, cfg, tmp_table, audit_ts=audit_col())
    applier.apply_batch(
        _events_df(spark, [ev(1, "c", "conv-a", 0)]), batch_id=0
    )
    applier.apply_batch(
        _events_df(spark, [ev(2, "u", "conv-a", 0, text="v2")]),
        batch_id=1,
    )
    t = applier.table()
    v_before = t.version
    compact(t)
    t.refresh()
    # compaction fold: adjacent but NOT a pure delta append
    assert changes._new_commit_files(
        t._read_version(v_before), t._read_version(t.version)
    ) is None
    # the feed across the compaction stays correct (generic diff):
    # compaction changes no row state
    assert table_changes(
        t, from_version=v_before, to_version=t.version
    ).collect() == []


@pytest.mark.parametrize("delete_mode", ["update", "delete"])
def test_adjacent_fast_path_covers_subset_delete_commits(
    spark, tmp_table, delete_mode
):
    """Steady-state feeds under delete.as.update.key ⊂ pk traffic:
    sdel commits now take the fast path (previously always the generic
    diff), and every adjacent pair's fast answer equals the
    two-snapshot diff — multi-row subset deletes, re-upserts, and
    mixed upsert+sdel batches included."""
    from kafka_jdbc_sink_connector_spark.lake import changes

    cfg = SinkConfig(
        pk_fields=("conv_id", "turn_idx"),
        delete_as_update_key=("conv_id",),
        n_buckets=4, merge_mode="mor", delete_mode=delete_mode,
    )
    applier = CdcApplier(spark, cfg, tmp_table, audit_ts=audit_col())

    def sdel(off, conv):
        return {"kafka_partition": 0, "kafka_offset": off, "op": "d",
                "conv_id": conv, "turn_idx": None,
                "ts": ev(off, "d", conv, 0)["ts"]}

    batches = [
        [ev(1, "c", "conv-a", 0), ev(2, "c", "conv-a", 1),
         ev(3, "c", "conv-b", 0), ev(4, "c", "conv-c", 0)],
        # pure subset-delete commit: kills both conv-a rows
        [sdel(5, "conv-a")],
        # mixed commit: upsert + subset delete in one batch
        [ev(6, "u", "conv-b", 0, text="v2"), sdel(7, "conv-c"),
         ev(8, "c", "conv-d", 0)],
        # re-upsert a subset-deleted conversation
        [ev(9, "c", "conv-a", 0, text="back")],
    ]
    for i, rows in enumerate(batches):
        applier.apply_batch(_events_df(spark, rows), batch_id=i)
    t = applier.table()
    keys = list(t.snapshot.key_fields)
    cols = [f.name for f in t.snapshot.schema.fields]
    cmp_cols = [c for c in cols if c not in keys]
    sdel_pairs = 0
    for v_from, v_to in zip(t.history(), t.history()[1:]):
        old_snap = t._read_version(v_from)
        new_snap = t._read_version(v_to)
        nd = changes._new_commit_files(old_snap, new_snap)
        if nd is None:
            continue
        if nd[1]:
            sdel_pairs += 1
        fast = changes._adjacent_delta_changes(
            t, old_snap, new_snap, *nd,
            keys=keys, cols=cols, cmp_cols=cmp_cols,
        )
        ref = changes._diff_changes(
            t, old_snap, new_snap, keys, cols, cmp_cols
        )
        assert _rows_sorted(fast) == _rows_sorted(ref), (v_from, v_to)
        assert _rows_sorted(
            table_changes(t, from_version=v_from, to_version=v_to)
        ) == _rows_sorted(ref)
    assert sdel_pairs >= 2  # the pure and the mixed sdel commits


def test_sdel_fast_path_plan_reads_only_commit_files_and_old_buckets(
    spark, tmp_table
):
    """An sdel commit's feed scans ONLY the commit's own sdel/delta
    files plus old-version files of the touched buckets — not the new
    snapshot's resolve, not untouched buckets."""
    from kafka_jdbc_sink_connector_spark.lake import changes

    cfg = SinkConfig(
        pk_fields=("conv_id", "turn_idx"),
        delete_as_update_key=("conv_id",),
        n_buckets=8, merge_mode="mor",
    )
    applier = CdcApplier(spark, cfg, tmp_table, audit_ts=audit_col())
    rows0 = [ev(i, "c", f"conv-{i}", t) for i in range(1, 13)
             for t in (0, 1)]
    applier.apply_batch(_events_df(spark, rows0), batch_id=0)
    applier.apply_batch(
        _events_df(spark, [{
            "kafka_partition": 0, "kafka_offset": 100, "op": "d",
            "conv_id": "conv-3", "turn_idx": None,
            "ts": ev(100, "d", "conv-3", 0)["ts"],
        }]),
        batch_id=1,
    )
    t = applier.table()
    v_from, v_to = t.version - 1, t.version
    nd = changes._new_commit_files(
        t._read_version(v_from), t._read_version(v_to)
    )
    assert nd is not None and nd[1]          # sdel files present
    new_files = {f for part in nd for fs in part.values() for f in fs}
    buckets = {b for part in nd for b in part}
    feed = table_changes(t, from_version=v_from, to_version=v_to)
    rows = feed.collect()
    # soft delete flips both conv-3 turns to updates
    assert sorted(r["turn_idx"] for r in rows) == [0, 1]
    assert {r["_change_type"] for r in rows} == {"update"}
    for f in feed.inputFiles():
        rel = f.split(tmp_table.rstrip("/") + "/", 1)[1]
        assert (
            rel in new_files
            or any(f"__bucket_p={b}" in rel for b in buckets)
        ), rel
    assert len(feed.inputFiles()) < len(
        applier.read_target().inputFiles()
    )


def test_sdel_fast_path_declined_for_update_insert_hard_delete(
    spark, tmp_table
):
    """insert_mode=update + hard delete: a subset delete kills its
    subset key for good regardless of position
    (mor.apply_subset_overlays matches on existence, not position), so
    this commit's sdel files alone cannot resolve rows upserted later
    — _new_commit_files must decline sdel commits under that meta and
    fall back to the generic diff. Exercised on a REAL sdel commit's
    snapshots with the mode flags swapped in (an upd_only pipeline
    cannot seed its own rows, so the combination only arises on
    externally-seeded tables)."""
    import dataclasses

    from kafka_jdbc_sink_connector_spark.lake import changes

    cfg = SinkConfig(
        pk_fields=("conv_id", "turn_idx"),
        delete_as_update_key=("conv_id",),
        n_buckets=4, merge_mode="mor",
    )
    applier = CdcApplier(spark, cfg, tmp_table, audit_ts=audit_col())
    applier.apply_batch(_events_df(spark, [
        ev(1, "c", "conv-a", 0), ev(2, "c", "conv-b", 0),
    ]), batch_id=0)
    applier.apply_batch(_events_df(spark, [{
        "kafka_partition": 0, "kafka_offset": 3, "op": "d",
        "conv_id": "conv-a", "turn_idx": None,
        "ts": ev(3, "d", "conv-a", 0)["ts"],
    }]), batch_id=1)
    t = applier.table()
    old_snap = t._read_version(t.version - 1)
    new_snap = t._read_version(t.version)
    nd = changes._new_commit_files(old_snap, new_snap)
    assert nd is not None and nd[1]          # sdel commit, fast-pathed
    hard_upd = dataclasses.replace(
        new_snap,
        mor_meta={**new_snap.mor_meta, "upd_only": True, "hard": True,
                  "soft": False},
    )
    assert changes._new_commit_files(old_snap, hard_upd) is None
    # a DELTA-only commit under the same meta still fast-paths (the
    # decline is specific to sdel files)
    applier.apply_batch(_events_df(spark, [
        ev(4, "u", "conv-b", 0, text="v2"),
    ]), batch_id=2)
    t.refresh()
    o2 = t._read_version(t.version - 1)
    n2 = dataclasses.replace(
        t._read_version(t.version),
        mor_meta={**new_snap.mor_meta, "upd_only": True, "hard": True,
                  "soft": False},
    )
    nd2 = changes._new_commit_files(o2, n2)
    assert nd2 is not None and nd2[0] and not nd2[1]
