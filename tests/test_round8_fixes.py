"""Round-8 regression tests: the ADVICE.md correctness guards added
during the optimization round (no behavior change for valid configs).

* maintained-view runners (aggregate view, text index) must reject a
  soft-delete downstream applier — soft deletes would only flip the
  marker column and the views' readers don't filter markers, so
  retracted groups/postings would keep surfacing as live results;
* ``asof_join`` must reject output-name collisions and reserved
  ``__``-internal left columns up front (matching ``range_join_bins``'
  fail-fast posture) instead of producing ambiguous columns.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kafka_jdbc_sink_connector_spark.config import SinkConfig
from kafka_jdbc_sink_connector_spark.operators.joins import asof_join
from kafka_jdbc_sink_connector_spark.streaming.aggview import AggViewRunner
from kafka_jdbc_sink_connector_spark.streaming.textindex import (
    TextIndexRunner,
)


class _Stub:
    """Minimal applier stand-in: the constructors only consult cfg."""

    def __init__(self, cfg):
        self.cfg = cfg


def test_aggview_rejects_soft_delete_applier(spark):
    cfg = SinkConfig(pk_fields=("g",), delete_retain_fields=())  # update
    with pytest.raises(ValueError, match="delete_mode='delete'"):
        AggViewRunner(spark, "p", _Stub(cfg), ["g"], {"n": F.count("*")})
    ok = SinkConfig(pk_fields=("g",), delete_mode="delete",
                    delete_retain_fields=())
    AggViewRunner(spark, "p", _Stub(ok), ["g"], {"n": F.count("*")})


def test_textindex_rejects_soft_delete_applier(spark):
    cfg = SinkConfig(pk_fields=("term", "doc_id"),
                     delete_retain_fields=())  # default soft delete
    with pytest.raises(ValueError, match="delete_mode='delete'"):
        TextIndexRunner(spark, "p", _Stub(cfg))
    ok = SinkConfig(pk_fields=("term", "doc_id"), delete_mode="delete",
                    delete_retain_fields=())
    TextIndexRunner(spark, "p", _Stub(ok))


def _asof_frames(spark):
    left = spark.createDataFrame(
        [(1, 10.0, 1.0)], "k long, lts double, price double"
    )
    right = spark.createDataFrame(
        [(1, 9.0, 2.0)], "k long, rts double, quote double"
    )
    return left, right


def test_asof_join_rejects_output_name_collision(spark):
    left, right = _asof_frames(spark)
    clash = left.withColumn("quote_asof", F.lit(0))
    with pytest.raises(ValueError, match="collide with existing left"):
        asof_join(clash, right, ["k"], "lts", "rts")


def test_asof_join_rejects_reserved_left_columns(spark):
    left, right = _asof_frames(spark)
    bad = left.withColumn("__side", F.lit(0))
    with pytest.raises(ValueError, match="reserved internal"):
        asof_join(bad, right, ["k"], "lts", "rts")


def test_asof_join_still_works_without_collisions(spark):
    left, right = _asof_frames(spark)
    out = asof_join(left, right, ["k"], "lts", "rts").collect()
    assert len(out) == 1 and out[0]["quote_asof"] == 2.0
