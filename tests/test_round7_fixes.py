"""Round-7 regression tests for the ADVICE.md findings:

1. ``replay_quarantine`` watermark must be namespaced per batch —
   replaying a LOWER batch id after a HIGHER one under the same
   replay source used to take the skip path, whose side-table
   backfill deleted the dead-lettered partition without applying it.
2. ``CascadeRunner`` must stamp ops from the DOWNSTREAM config's
   vocabulary — hardcoded ``'u'``/``'d'`` literals quarantined every
   cascaded row under a custom vocabulary (or applied deletes as
   upserts if ``'d'`` was a configured update value).
3. ``LakeTable._commit_ts_of``'s chunked regex scan matched a
   truncated digit prefix when the ``commit_ts`` line straddled a
   64 KiB chunk boundary (MULTILINE ``$`` also matches end-of-buffer).
4. CLI ``_parse_where`` coerced numeric-looking values on STRING
   columns, turning ``id = '0123'`` into ``id = 123`` (Spark then
   casts the column, matching different rows).
"""

from __future__ import annotations

import json
import os
from types import SimpleNamespace

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from kafka_jdbc_sink_connector_spark.apply import CdcApplier
from kafka_jdbc_sink_connector_spark.cli import _parse_where
from kafka_jdbc_sink_connector_spark.config import SinkConfig
from kafka_jdbc_sink_connector_spark.lake.table import _LOG_DIR, LakeTable
from kafka_jdbc_sink_connector_spark.streaming.cascade import CascadeRunner

from tests.test_apply_batch import _events_df, audit_col, ev


# -- 1. out-of-order DLQ replay --------------------------------------


def test_replay_lower_batch_after_higher_batch(spark, tmp_path):
    applier = CdcApplier(
        spark, SinkConfig(n_buckets=4), str(tmp_path / "t"),
        audit_ts=audit_col(),
    )
    # batch 0 and batch 1 each quarantine one fixable row
    b0 = [ev(0, "u", "a", 0), ev(1, "x", "fix0", 0)]
    b1 = [ev(10, "u", "b", 0), ev(11, "x", "fix1", 0)]
    r0 = applier.apply_batch(_events_df(spark, b0), batch_id=0)
    r1 = applier.apply_batch(_events_df(spark, b1), batch_id=1)
    assert r0.n_quarantined == 1 and r1.n_quarantined == 1

    def fix(df):
        return df.withColumn(
            "op", F.when(F.col("op") == "x", "u").otherwise(F.col("op"))
        )

    # replay the HIGHER batch first, then the LOWER one — both must
    # actually apply (the old single high-water mark skipped batch 0's
    # merge and its backfill deleted the quarantine partition)
    res_hi = applier.replay_quarantine(1, fix=fix)
    assert res_hi.n_events == 1 and not res_hi.skipped
    res_lo = applier.replay_quarantine(0, fix=fix)
    assert res_lo.n_events == 1 and not res_lo.skipped

    got = {r["conv_id"] for r in applier.read_target().collect()}
    assert {"a", "b", "fix0", "fix1"} <= got
    # both quarantine partitions cleared — nothing silently dropped
    assert applier.read_quarantine().count() == 0

    # exactly-once still holds per batch: nothing left to re-drive
    # (the partitions are cleared, so a repeat raises not-found)
    with pytest.raises(FileNotFoundError):
        applier.replay_quarantine(0, fix=fix)


# -- 2. cascade under a custom op vocabulary --------------------------


def test_cascade_custom_op_vocabulary(spark, tmp_path):
    bronze = CdcApplier(
        spark, SinkConfig(n_buckets=4, delete_mode="delete"),
        str(tmp_path / "bronze"), audit_ts=audit_col(),
    )
    # downstream speaks a completely different vocabulary; 'u' and
    # 'd' are NOT valid ops here
    silver_cfg = SinkConfig(
        n_buckets=4, delete_mode="delete",
        op_insert_value="INS", op_update_values=("UPD",),
        op_delete_value="DEL",
    )
    silver = CdcApplier(
        spark, silver_cfg, str(tmp_path / "silver"), audit_ts=audit_col()
    )
    run = CascadeRunner(spark, bronze.table_path, silver)

    bronze.apply_batch(
        _events_df(spark, [ev(i, "u", f"c{i}", 0) for i in range(4)]),
        batch_id=0,
    )
    r = run.sync()
    assert r.mode == "bootstrap"
    assert r.batch.n_quarantined == 0, "bootstrap rows quarantined"
    assert silver.read_target().count() == 4

    # an upstream delete must propagate as a DOWNSTREAM delete, not be
    # quarantined (or worse, applied as an upsert)
    bronze.apply_batch(
        _events_df(spark, [ev(10, "d", "c1", 0)]), batch_id=1
    )
    r = run.sync()
    assert r.mode == "incremental" and r.batch.n_quarantined == 0
    got = {r["conv_id"] for r in silver.read_target().collect()}
    assert got == {"c0", "c2", "c3"}


def test_cascade_delete_colliding_with_update_vocab(spark, tmp_path):
    """The nastier failure mode: downstream treats 'd' as an UPDATE
    value — the old hardcoded F.lit('d') applied upstream deletes as
    upserts, resurrecting rows."""
    bronze = CdcApplier(
        spark, SinkConfig(n_buckets=4, delete_mode="delete"),
        str(tmp_path / "bronze"), audit_ts=audit_col(),
    )
    silver_cfg = SinkConfig(
        n_buckets=4, delete_mode="delete",
        op_insert_value="c", op_update_values=("d",),  # 'd' = update!
        op_delete_value="DEL",
    )
    silver = CdcApplier(
        spark, silver_cfg, str(tmp_path / "silver"), audit_ts=audit_col()
    )
    run = CascadeRunner(spark, bronze.table_path, silver)
    bronze.apply_batch(
        _events_df(spark, [ev(i, "u", f"c{i}", 0) for i in range(3)]),
        batch_id=0,
    )
    run.sync()
    bronze.apply_batch(
        _events_df(spark, [ev(10, "d", "c0", 0)]), batch_id=1
    )
    run.sync()
    got = {r["conv_id"] for r in silver.read_target().collect()}
    assert got == {"c1", "c2"}, "upstream delete applied as upsert"


# -- 3. _commit_ts_of chunk-boundary straddle -------------------------


def _write_manifest(tmp_path, version, text):
    log = tmp_path / _LOG_DIR
    log.mkdir(exist_ok=True)
    p = log / f"v{version:020d}.json"
    p.write_bytes(text.encode())
    return SimpleNamespace(path=str(tmp_path))


def test_commit_ts_straddling_chunk_boundary(tmp_path):
    want = 1234567890.125
    line = f' "commit_ts": {want!r},\n'
    head = '{\n "aaa": "'
    # position the line so the 64 KiB chunk boundary lands mid-number
    # (a few digits into the value)
    boundary = 1 << 16
    digits_at = len(' "commit_ts": ') + 5
    pad = boundary - digits_at - len(head) - len('",\n')
    body = head + "x" * pad + '",\n' + line + ' "zzz": 1\n}\n'
    digit_pos = body.index(f"{want!r}")
    assert digit_pos < boundary < digit_pos + len(f"{want!r}"), (
        "test setup: number must straddle the chunk boundary"
    )
    ns = _write_manifest(tmp_path, 7, body)
    got = LakeTable._commit_ts_of(ns, 7)
    assert got == want, f"truncated-prefix match: {got}"


def test_commit_ts_fallback_full_parse(tmp_path):
    # a compact (foreign-layout) manifest has no per-line key — the
    # scan finds nothing and must fall back to a full JSON parse
    ns = _write_manifest(
        tmp_path, 3, json.dumps({"commit_ts": 5.5, "x": 1})
    )
    assert LakeTable._commit_ts_of(ns, 3) == 5.5


def test_commit_ts_normal_layout_still_fast_path(tmp_path):
    ns = _write_manifest(
        tmp_path, 1,
        json.dumps({"commit_ts": 99.25, "zz": [1, 2]},
                   indent=1, sort_keys=True) + "\n",
    )
    assert LakeTable._commit_ts_of(ns, 1) == 99.25


# -- 4. CLI where-clause coercion -------------------------------------


_SCHEMA = T.StructType([
    T.StructField("id", T.StringType()),
    T.StructField("n", T.LongType()),
    T.StructField("d", T.DecimalType(10, 2)),
])


def test_parse_where_string_column_not_coerced():
    assert _parse_where(["id:=:0123"], schema=_SCHEMA) == [
        ("id", "=", "0123")
    ]


def test_parse_where_numeric_columns_coerced():
    assert _parse_where(["n:>=:42"], schema=_SCHEMA) == [("n", ">=", 42)]
    assert _parse_where(["d:<:1.5"], schema=_SCHEMA) == [("d", "<", 1.5)]


def test_parse_where_explicit_type_markers():
    assert _parse_where(["n:=:str:42"], schema=_SCHEMA) == [
        ("n", "=", "42")
    ]
    assert _parse_where(["id:=:int:7"], schema=_SCHEMA) == [("id", "=", 7)]
    # 4th segment that is NOT a marker stays part of the value
    assert _parse_where(["id:=:a:b"], schema=_SCHEMA) == [("id", "=", "a:b")]


def test_parse_where_null_ops_and_no_schema():
    assert _parse_where(["id:is_null"], schema=_SCHEMA) == [
        ("id", "is_null")
    ]
    # without a schema the old numeric-guess behavior is kept
    assert _parse_where(["n:=:42"]) == [("n", "=", 42)]
