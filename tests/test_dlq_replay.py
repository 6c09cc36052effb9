"""Dead-letter replay: re-drive quarantined rows through the full
apply path after the cause is fixed (the reference's DLQ is terminal;
this closes the loop engine-side).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kafka_jdbc_sink_connector_spark.apply import CdcApplier
from kafka_jdbc_sink_connector_spark.config import SinkConfig

from tests.test_apply_batch import _events_df, audit_col, ev


@pytest.fixture()
def seeded(spark, tmp_path):
    applier = CdcApplier(
        spark, SinkConfig(n_buckets=4), str(tmp_path / "t"),
        audit_ts=audit_col(),
    )
    rows = [ev(i, "u", f"c{i}", 0) for i in range(4)]
    rows.append(ev(10, "x", "bad-op", 0))        # unknown op: fixable
    rows.append(ev(11, "u", None, 0))            # null key: permanent
    r = applier.apply_batch(_events_df(spark, rows), batch_id=0)
    assert r.n_quarantined == 2 and r.n_events == 4
    return applier


def test_replay_applies_fixed_rows_and_requarantines_rest(spark, seeded):
    applier = seeded
    lineage_before = sorted(
        tuple(r) for r in applier.read_lineage().collect()
    )

    def fix(df):
        return df.withColumn(
            "op", F.when(F.col("op") == "x", "u").otherwise(F.col("op"))
        )

    res = applier.replay_quarantine(0, fix=fix)
    assert res.n_events == 1 and res.n_quarantined == 1
    # the fixed row landed in the target with its payload intact
    got = {r["conv_id"] for r in applier.read_target().collect()}
    assert "bad-op" in got and len(got) == 5
    # quarantine now holds ONLY the still-failing row, fresh reason
    q = applier.read_quarantine().collect()
    assert len(q) == 1 and "key" in q[0]["error"]
    # the original batch's lineage audit rows are untouched
    assert sorted(
        tuple(r) for r in applier.read_lineage().collect()
    ) == lineage_before
    # replay is exactly-once per (replay_source, batch)
    assert applier.replay_quarantine(0, fix=fix).skipped
    # a new source re-drives (nothing left to fix here: still fails)
    res2 = applier.replay_quarantine(0, replay_source="dlq2")
    assert res2.n_quarantined == 1 and res2.n_events == 0


def test_replay_clears_partition_when_everything_applies(spark, seeded):
    applier = seeded

    def fix(df):
        return df.withColumn(
            "op", F.when(F.col("op") == "x", "u").otherwise(F.col("op"))
        ).withColumn(
            "conv_id", F.coalesce(F.col("conv_id"), F.lit("rescued"))
        )

    res = applier.replay_quarantine(0, fix=fix)
    assert res.n_events == 2 and res.n_quarantined == 0
    assert applier.read_quarantine().count() == 0  # partition cleared
    got = {r["conv_id"] for r in applier.read_target().collect()}
    assert {"bad-op", "rescued"} <= got


def test_replay_unknown_batch_raises(spark, seeded):
    with pytest.raises(FileNotFoundError, match="no quarantine"):
        seeded.replay_quarantine(99)
