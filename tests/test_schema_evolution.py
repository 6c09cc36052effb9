"""Schema evolution (reference O6 + ``BufferedRecordsTest.java:53-89``):
new nullable columns appear mid-stream, old rows are null-backfilled,
two evolution steps, A→B→A interleavings, incompatible changes rejected.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kafka_jdbc_sink_connector_spark.apply import CdcApplier
from kafka_jdbc_sink_connector_spark.config import SinkConfig
from kafka_jdbc_sink_connector_spark.datagen import (
    GenSpec,
    generate_cdc_events,
    slice_schema_version,
)
from kafka_jdbc_sink_connector_spark.operators.evolution import (
    SchemaEvolutionError,
)

from tests.test_apply_batch import _events_df, audit_col, ev


def test_two_step_evolution_with_backfill(spark, tmp_table):
    cfg = SinkConfig(n_buckets=4)
    applier = CdcApplier(spark, cfg, tmp_table, audit_ts=audit_col())
    spec = GenSpec(n_events=3000, n_conversations=60,
                   turns_per_conversation=8)
    events = generate_cdc_events(spark, spec).cache()
    try:
        v1, v2, v3 = (slice_schema_version(events, v) for v in (1, 2, 3))
        r1 = applier.apply_batch(v1, batch_id=0)
        assert r1.evolved_columns == []
        cols_after_v1 = [f.name for f in applier.table().schema.fields]
        assert "tool" not in cols_after_v1

        r2 = applier.apply_batch(v2, batch_id=1)
        assert r2.evolved_columns == ["tool"]
        r3 = applier.apply_batch(v3, batch_id=2)
        assert r3.evolved_columns == ["meta_source"]

        # engine-managed columns stay at the tail
        names = [f.name for f in applier.table().schema.fields]
        assert names[-2:] == ["op_type", "audit_ts"]
        assert "tool" in names and "meta_source" in names

        tgt = applier.read_target()
        # rows written before step 1 and never updated: tool is NULL
        assert tgt.filter(F.col("tool").isNull()).count() > 0
        # v3 rows carry meta_source
        assert tgt.filter(F.col("meta_source").isNotNull()).count() > 0
    finally:
        events.unpersist()


def test_a_b_a_interleaving(spark, tmp_table):
    """Old-schema events arriving *after* evolution (the A,A,A,B,A
    corpus of correctBatching): the A-shaped batch still applies; its
    missing columns read as NULL for the rows it writes."""
    cfg = SinkConfig(n_buckets=2)
    applier = CdcApplier(spark, cfg, tmp_table, audit_ts=audit_col())
    a1 = [ev(1, "c", "conv-a", 0)]
    b = [ev(2, "c", "conv-b", 0, tool="tool-1")]
    a2 = [ev(3, "u", "conv-a", 0, text="after-evolution")]
    applier.apply_batch(_events_df(spark, a1), batch_id=0)
    applier.apply_batch(_events_df(spark, b, with_optional=("tool",)),
                        batch_id=1)
    applier.apply_batch(_events_df(spark, a2), batch_id=2)
    got = {r["conv_id"]: r for r in applier.read_target().collect()}
    assert got["conv-b"]["tool"] == "tool-1"
    assert got["conv-a"]["text"] == "after-evolution"
    # the A-shaped update overwrote the full row; tool (absent from its
    # schema) is NULL — matching MERGE UPDATE SET over all non-key cols
    assert got["conv-a"]["tool"] is None


def test_type_change_rescued_per_record(spark, tmp_table):
    """O18 second half (JdbcAuditSinkTask.java:123-140): a mistyped
    column no longer poisons the batch. Representable values apply via
    try_cast (int 123 → text '123'); values that cannot be represented
    in the target type quarantine individually while the rest of the
    batch applies."""
    cfg = SinkConfig(n_buckets=2)
    applier = CdcApplier(spark, cfg, tmp_table, audit_ts=audit_col())
    applier.apply_batch(_events_df(spark, [ev(1, "c", "conv-a", 0)]),
                        batch_id=0)
    # int text → string target: always representable, applies
    castable = spark.createDataFrame(
        [(0, 2, "u", "conv-a", 0, 123, None)],
        "kafka_partition int, kafka_offset long, op string, "
        "conv_id string, turn_idx int, text int, ts timestamp",
    )
    r = applier.apply_batch(castable, batch_id=1)
    assert r.n_quarantined == 0
    got = {x["conv_id"]: x for x in applier.read_target().collect()}
    assert got["conv-a"]["text"] == "123"


def test_unrepresentable_value_quarantines_rest_applies(spark, tmp_table):
    """One incompatible-typed record dead-letters; the other 3 apply
    (mirrors the reference's unroll-and-retry DLQ behavior)."""
    cfg = SinkConfig(n_buckets=2)
    applier = CdcApplier(spark, cfg, tmp_table, audit_ts=audit_col())
    # bootstrap with an int-typed turn-count-ish extra column
    base = spark.createDataFrame(
        [(0, 1, "c", "conv-a", 0, "hello", None, 5)],
        "kafka_partition int, kafka_offset long, op string, "
        "conv_id string, turn_idx int, text string, ts timestamp, "
        "n_tool_calls int",
    )
    applier.apply_batch(base, batch_id=0)
    # batch where n_tool_calls arrives as string; one value is not an int
    mixed = spark.createDataFrame(
        [
            (0, 2, "u", "conv-a", 0, "t0", None, "7"),
            (0, 3, "c", "conv-b", 0, "t1", None, "not-a-number"),
            (0, 4, "c", "conv-c", 0, "t2", None, "11"),
            (0, 5, "c", "conv-d", 0, "t3", None, None),
        ],
        "kafka_partition int, kafka_offset long, op string, "
        "conv_id string, turn_idx int, text string, ts timestamp, "
        "n_tool_calls string",
    )
    r = applier.apply_batch(mixed, batch_id=1)
    assert r.n_quarantined == 1
    assert r.n_events == 3
    got = {x["conv_id"]: x for x in applier.read_target().collect()}
    assert set(got) == {"conv-a", "conv-c", "conv-d"}  # conv-b DLQ'd
    assert got["conv-a"]["n_tool_calls"] == 7
    assert got["conv-c"]["n_tool_calls"] == 11
    assert got["conv-d"]["n_tool_calls"] is None
    q = applier.read_quarantine().collect()
    assert len(q) == 1
    assert "cast failed: n_tool_calls" in q[0]["error"]
    assert q[0]["kafka_offset"] == 3


def test_mistyped_key_column_still_rejected(spark, tmp_table):
    """A wrong-typed *key* column has no per-record rescue: matching
    against the target key would be undefined, so the batch fails."""
    cfg = SinkConfig(n_buckets=2)
    applier = CdcApplier(spark, cfg, tmp_table, audit_ts=audit_col())
    applier.apply_batch(_events_df(spark, [ev(1, "c", "conv-a", 0)]),
                        batch_id=0)
    bad_key = spark.createDataFrame(
        [(0, 2, "u", "conv-a", "zero", "x", None)],
        "kafka_partition int, kafka_offset long, op string, "
        "conv_id string, turn_idx string, text string, ts timestamp",
    )
    with pytest.raises(SchemaEvolutionError, match="turn_idx"):
        applier.apply_batch(bad_key, batch_id=1)


def test_auto_evolve_disabled_rejects_new_columns(spark, tmp_table):
    cfg = SinkConfig(n_buckets=2, auto_evolve=False)
    applier = CdcApplier(spark, cfg, tmp_table, audit_ts=audit_col())
    applier.apply_batch(_events_df(spark, [ev(1, "c", "conv-a", 0)]),
                        batch_id=0)
    with pytest.raises(SchemaEvolutionError, match="auto_evolve"):
        applier.apply_batch(
            _events_df(spark, [ev(2, "c", "conv-b", 0, tool="x")],
                       with_optional=("tool",)),
            batch_id=1,
        )


@pytest.mark.parametrize("merge_mode", ["cow", "mor"])
def test_type_widening_evolves_target_instead_of_quarantine(
    spark, tmp_table, merge_mode
):
    """auto_evolve_widen: an upstream int→bigint ALTER (values beyond
    int range) widens the TARGET column via a metadata-only commit and
    applies every row — no quarantine, old files read back widened —
    while replays of pre-widening batches still pin the narrow
    historical schema."""
    from kafka_jdbc_sink_connector_spark.config import SinkConfig

    cfg = SinkConfig(n_buckets=2, merge_mode=merge_mode,
                     auto_evolve_widen=True)
    applier = CdcApplier(spark, cfg, tmp_table, audit_ts=audit_col())
    base = spark.createDataFrame(
        [(0, 1, "c", "conv-a", 0, "hello", None, 5),
         (0, 2, "c", "conv-b", 0, "world", None, 6)],
        "kafka_partition int, kafka_offset long, op string, "
        "conv_id string, turn_idx int, text string, ts timestamp, "
        "n_tool_calls int",
    )
    applier.apply_batch(base, batch_id=0)
    assert dict(applier.table().schema["n_tool_calls"].jsonValue(),
                )["type"] == "integer"
    big = 2**40  # unrepresentable as int — would quarantine without
    wide = spark.createDataFrame(
        [(0, 3, "u", "conv-a", 0, "t0", None, big),
         (0, 4, "c", "conv-c", 0, "t1", None, 7)],
        "kafka_partition int, kafka_offset long, op string, "
        "conv_id string, turn_idx int, text string, ts timestamp, "
        "n_tool_calls long",
    )
    r = applier.apply_batch(wide, batch_id=1)
    assert r.n_quarantined == 0 and r.n_events == 2
    assert r.widened_columns == ["n_tool_calls: int->bigint"]
    t = applier.table()
    assert t.schema["n_tool_calls"].dataType.simpleString() == "bigint"
    got = {x["conv_id"]: x["n_tool_calls"]
           for x in applier.read_target().collect()}
    # conv-b's value comes from a PRE-widening parquet file read back
    # through the widened schema
    assert got == {"conv-a": big, "conv-b": 6, "conv-c": 7}
    # replaying the pre-widening batch is skipped and its side tables
    # recompute under the narrow historical schema (no crash, no dupes)
    r0 = applier.apply_batch(base, batch_id=0)
    assert r0.skipped
    r1 = applier.apply_batch(wide, batch_id=1)
    assert r1.skipped
    assert applier.read_target().count() == 3
    # narrowing is NOT widening: a long column arriving as int just
    # up-casts per row (no schema change, no quarantine)
    shrink = spark.createDataFrame(
        [(0, 5, "u", "conv-c", 0, "t2", None, 8)],
        "kafka_partition int, kafka_offset long, op string, "
        "conv_id string, turn_idx int, text string, ts timestamp, "
        "n_tool_calls int",
    )
    r2 = applier.apply_batch(shrink, batch_id=2)
    assert r2.widened_columns == [] and r2.n_quarantined == 0
    assert t.refresh().schema["n_tool_calls"].dataType.simpleString() \
        == "bigint"


def test_widening_disabled_by_default_keeps_quarantine_contract(
    spark, tmp_table
):
    """Without the flag, out-of-range values keep the prior contract:
    try_cast down + quarantine the unrepresentable row."""
    cfg = SinkConfig(n_buckets=2)
    applier = CdcApplier(spark, cfg, tmp_table, audit_ts=audit_col())
    base = spark.createDataFrame(
        [(0, 1, "c", "conv-a", 0, "x", None, 5)],
        "kafka_partition int, kafka_offset long, op string, "
        "conv_id string, turn_idx int, text string, ts timestamp, "
        "n int",
    )
    applier.apply_batch(base, batch_id=0)
    wide = spark.createDataFrame(
        [(0, 2, "u", "conv-a", 0, "y", None, 2**40)],
        "kafka_partition int, kafka_offset long, op string, "
        "conv_id string, turn_idx int, text string, ts timestamp, "
        "n long",
    )
    r = applier.apply_batch(wide, batch_id=1)
    assert r.n_quarantined == 1 and r.widened_columns == []
    assert applier.table().schema["n"].dataType.simpleString() == "int"


def test_widening_never_touches_key_columns(spark, tmp_table):
    """A widened pk would silently re-bucket the table (hash is
    type-sensitive) — key type changes keep raising even with the
    flag on."""
    from kafka_jdbc_sink_connector_spark.operators.evolution import (
        SchemaEvolutionError,
    )

    cfg = SinkConfig(n_buckets=2, auto_evolve_widen=True)
    applier = CdcApplier(spark, cfg, tmp_table, audit_ts=audit_col())
    applier.apply_batch(_events_df(spark, [ev(1, "c", "conv-a", 0)]),
                        batch_id=0)
    bad_key = spark.createDataFrame(
        [(0, 2, "u", "conv-a", 0, "user", "y", None)],
        "kafka_partition int, kafka_offset long, op string, "
        "conv_id string, turn_idx long, role string, text string, "
        "ts timestamp",
    )
    with pytest.raises(SchemaEvolutionError, match="key column"):
        applier.apply_batch(bad_key, batch_id=1)
    assert applier.table().schema["turn_idx"].dataType.simpleString() \
        == "int"


def test_widening_replay_backfill_pins_widened_schema(spark, tmp_table):
    """Crash-window replay of a WIDENING batch: the widen commit runs
    BEFORE the batch's stats/quarantine pass, so the backfill must
    re-coerce under the widened schema — pinning below it would
    quarantine the out-of-int-range row the original commit applied
    (a row simultaneously live in the target and dead-lettered)."""
    import os
    import shutil

    from kafka_jdbc_sink_connector_spark.config import SinkConfig

    cfg = SinkConfig(n_buckets=2, auto_evolve_widen=True)
    applier = CdcApplier(spark, cfg, tmp_table, audit_ts=audit_col())
    base = spark.createDataFrame(
        [(0, 1, "c", "conv-a", 0, "x", None, 5)],
        "kafka_partition int, kafka_offset long, op string, "
        "conv_id string, turn_idx int, text string, ts timestamp, "
        "n int",
    )
    applier.apply_batch(base, batch_id=0)
    wide = spark.createDataFrame(
        [(0, 2, "u", "conv-a", 0, "y", None, 2**40)],
        "kafka_partition int, kafka_offset long, op string, "
        "conv_id string, turn_idx int, text string, ts timestamp, "
        "n long",
    )
    r1 = applier.apply_batch(wide, batch_id=1)
    assert r1.n_quarantined == 0
    # simulate the crash window: merge committed, lineage lost
    shutil.rmtree(os.path.join(applier.lineage_path, "batch_id=1"))
    res = applier.apply_batch(wide, batch_id=1)
    assert res.skipped
    # the backfill coerced under the WIDENED schema: no quarantine
    # rows appeared, lineage re-derived with the original version
    qdir = os.path.join(applier.quarantine_path, "batch_id=1")
    assert not os.path.isdir(qdir) or not any(
        f.endswith(".parquet") for f in os.listdir(qdir)
    )
    lin = {r["batch_id"]: r["snapshot_version"]
           for r in applier.read_lineage().collect()}
    assert lin[1] == r1.snapshot_version
    got = {x["conv_id"]: x["n"] for x in applier.read_target().collect()}
    assert got == {"conv-a": 2**40}
