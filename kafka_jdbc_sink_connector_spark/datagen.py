"""Deterministic synthetic CDC event generator (FIXTURES.md F2).

Every value is a pure column expression of the event id and the seed
(``spark.range`` + ``xxhash64``) — no ``rand()``, no wall clock — so the
same parameters produce bit-identical datasets at any parallelism, which
is what the replay/idempotence tests and the two-cluster-size scaling
bench require.

Shape (mirrors the reference's test corpus intent, SURVEY.md §5):

* Zipf-ish skewed ``conv_id`` popularity (hot conversations),
* ~1% delete events (``BASELINE.json``), the rest inserts/updates,
* a small duplicate fraction: re-delivered events with identical
  content but a new offset (at-least-once replay),
* ``schema_version`` 1→2→3 over the offset axis (the 2 evolution
  steps: +``tool``, +``meta_source``).
"""

from __future__ import annotations

import math
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafka_jdbc_sink_connector_spark.functions.keys import det_unit
from kafka_jdbc_sink_connector_spark.schemas import CDC_EVENT_SCHEMAS

BASE_EPOCH = 1704067200  # 2024-01-01T00:00:00Z, fixed


@dataclass(frozen=True)
class GenSpec:
    n_events: int = 10_000
    n_conversations: int = 300
    turns_per_conversation: int = 20
    n_partitions: int = 8
    seed: int = 42
    delete_fraction: float = 0.01
    update_fraction: float = 0.20
    duplicate_fraction: float = 0.02
    #: fraction of the offset axis on schema v1 / v2 (rest is v3)
    v1_until: float = 0.60
    v2_until: float = 0.85


def generate_cdc_events(
    spark: SparkSession, spec: GenSpec = GenSpec(), partitions: int | None = None
) -> DataFrame:
    """Full multi-version event stream as one DataFrame (v3 superset
    schema; columns not yet present at an event's ``schema_version``
    are null — use :func:`slice_schema_version` to materialize the
    historical shape of a given version).
    """
    s = spec
    ids = spark.range(0, s.n_events, 1, partitions or spark.sparkContext.defaultParallelism)

    # at-least-once duplicates: some events replay an earlier event's
    # content under a fresh offset
    dup_window = max(1, s.n_events // 100)
    u_dup = det_unit("id", seed=s.seed, salt=1)
    src = F.when(
        (u_dup < F.lit(s.duplicate_fraction)) & (F.col("id") >= dup_window),
        F.col("id") - (det_unit("id", seed=s.seed, salt=2) * dup_window).cast("long") - 1,
    ).otherwise(F.col("id"))
    df = ids.withColumn("src", src)

    # Zipf-ish (density ~ 1/x) conversation popularity
    u_conv = det_unit("src", seed=s.seed, salt=3)
    conv_idx = F.least(
        F.lit(s.n_conversations - 1),
        (F.exp(u_conv * F.lit(math.log(float(s.n_conversations)))) - 1).cast("long"),
    )
    u_turn = det_unit("src", seed=s.seed, salt=4)
    turn_idx = (u_turn * s.turns_per_conversation).cast("int")

    u_op = det_unit("src", seed=s.seed, salt=5)
    op = (
        F.when(u_op < s.delete_fraction, F.lit("d"))
        .when(u_op < s.delete_fraction + s.update_fraction, F.lit("u"))
        .otherwise(F.lit("c"))
    )

    schema_version = (
        F.when(F.col("src") < int(s.v1_until * s.n_events), F.lit(1))
        .when(F.col("src") < int(s.v2_until * s.n_events), F.lit(2))
        .otherwise(F.lit(3))
    )

    conv_id = F.format_string("conv-%08d", conv_idx)
    role = F.element_at(
        F.array(F.lit("user"), F.lit("assistant"), F.lit("tool")),
        (turn_idx % 3) + 1,
    )
    ts = F.timestamp_seconds(F.lit(BASE_EPOCH) + F.col("src"))

    df = (
        df.withColumn("conv_id", conv_id)
        .withColumn("turn_idx", turn_idx)
        .withColumn("op", op)
        .withColumn("schema_version", schema_version)
        .withColumn(
            "kafka_partition",
            F.pmod(F.xxhash64("conv_id"), F.lit(s.n_partitions)).cast("int"),
        )
        .withColumn("kafka_offset", F.col("id"))
        .withColumn("role", F.when(op != "d", role))
        .withColumn(
            "text",
            F.when(
                op != "d",
                F.format_string("msg %s/%d rev %d", conv_id, turn_idx, F.col("src")),
            ),
        )
        .withColumn("ts", ts)
        .withColumn(
            "tool",
            F.when(
                (schema_version >= 2) & (op != "d") & (role == "tool"),
                F.format_string("tool-%d", turn_idx % 5),
            ),
        )
        .withColumn(
            "meta_source",
            F.when(
                (schema_version >= 3) & (op != "d"),
                F.format_string("agent-%d", conv_idx % 4),
            ),
        )
    )
    cols = [f.name for f in CDC_EVENT_SCHEMAS[3].fields]
    return df.select(*cols)


def slice_schema_version(events: DataFrame, version: int) -> DataFrame:
    """Events of exactly ``version``, with only the columns that existed
    at that version — i.e. the stream as a consumer would have seen it
    before later evolution steps (mirrors the A,A,A,B,A batching corpus
    of ``BufferedRecordsTest.java:53-89``).
    """
    cols = [f.name for f in CDC_EVENT_SCHEMAS[version].fields]
    return events.filter(F.col("schema_version") == version).select(*cols)
