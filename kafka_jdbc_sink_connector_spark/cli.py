"""spark-submit entry point.

On a cluster::

    spark-submit --py-files kafka_jdbc_sink_connector_spark.zip \
        -m kafka_jdbc_sink_connector_spark.cli stream \
        --source kafka --bootstrap broker:9092 --topic transcripts \
        --table s3://lake/transcripts --checkpoint s3://lake/_ckpt

In the sandbox the same pipeline runs with ``--source files`` over a
parquet drop directory. ``getOrCreate`` picks up the cluster's
SparkSession (master/executors from spark-submit); local runs build
one via the engine defaults.
"""

from __future__ import annotations

import argparse
import json
import sys

from pyspark.sql import SparkSession


def _session(args) -> SparkSession:
    active = SparkSession.getActiveSession()
    if active is not None:
        return active
    from kafka_jdbc_sink_connector_spark.session import build_session

    return build_session(cores=args.cores)


def _config(args):
    from kafka_jdbc_sink_connector_spark.config import SinkConfig

    if getattr(args, "connect_config", None):
        # a Kafka-Connect connector JSON / property map using the
        # reference's own property names (paste your existing
        # connector "config" block); CLI flags don't apply then
        with open(args.connect_config) as fh:
            props = json.load(fh)
        return SinkConfig.from_connect_properties(
            props.get("config", props)
        )
    return SinkConfig(
        pk_fields=tuple(args.pk.split(",")),
        insert_mode=args.insert_mode,
        delete_mode=args.delete_mode,
        delete_retain_fields=tuple(
            f for f in args.retain_fields.split(",") if f
        ),
        delete_as_update_key=(
            tuple(args.delete_key.split(",")) if args.delete_key else None
        ),
        soft_delete_conditions=args.delete_identifier,
        merge_mode=args.merge_mode,
        n_buckets=args.buckets,
        max_retries=args.max_retries,
        retry_backoff_ms=args.retry_backoff_ms,
    )


def cmd_apply(args) -> None:
    from kafka_jdbc_sink_connector_spark.apply import CdcApplier

    spark = _session(args)
    applier = CdcApplier(spark, _config(args), args.table)
    events = spark.read.parquet(args.input)
    res = applier.apply_batch(events, batch_id=args.batch_id)
    print(json.dumps({
        "batch_id": res.batch_id, "skipped": res.skipped,
        "n_events": res.n_events, "n_quarantined": res.n_quarantined,
        "snapshot_version": res.snapshot_version,
        "evolved_columns": res.evolved_columns,
        "seconds": round(res.seconds, 3),
    }))


def cmd_replay_dlq(args) -> None:
    from kafka_jdbc_sink_connector_spark.apply import CdcApplier

    spark = _session(args)
    applier = CdcApplier(spark, _config(args), args.table)
    res = applier.replay_quarantine(
        args.batch_id, replay_source=args.replay_source
    )
    print(json.dumps({
        "batch_id": res.batch_id, "skipped": res.skipped,
        "n_applied": res.n_events,
        "n_still_quarantined": res.n_quarantined,
        "snapshot_version": res.snapshot_version,
    }))


def cmd_stream(args) -> None:
    from kafka_jdbc_sink_connector_spark.apply import CdcApplier
    from kafka_jdbc_sink_connector_spark.schemas import CDC_EVENT_SCHEMAS
    from kafka_jdbc_sink_connector_spark.sources import cdc as cdc_src
    from kafka_jdbc_sink_connector_spark.streaming.runner import (
        CdcStreamRunner,
    )

    spark = _session(args)
    cfg = _config(args)
    applier = CdcApplier(spark, cfg, args.table)
    if args.source == "kafka":
        from kafka_jdbc_sink_connector_spark.sources.kafka import (
            kafka_stream,
            parse_kafka_records,
        )

        raw = kafka_stream(
            spark, args.bootstrap, args.topic,
            max_offsets_per_trigger=args.max_offsets_per_trigger,
        )
        if args.value_format == "avro":
            # registry-driven Avro decode must run per micro-batch
            # (the schema-id harvest is a batch aggregation), so it
            # rides the runner's record_parser hook inside the managed
            # retry/exactly-once loop; the registry client comes from
            # the connector's schema.registry.url (cfg). Fail the
            # misconfiguration HERE: without a registry url the parser
            # would raise the same deterministic error on every
            # micro-batch after burning the runner's retry budget
            if not getattr(cfg, "schema_registry_url", None):
                raise SystemExit(
                    "stream --value-format avro requires "
                    "schema.registry.url (or value.converter.schema."
                    "registry.url) in the connector config — the "
                    "per-batch decode resolves writer schemas from "
                    "the registry"
                )
            stream = raw
            record_parser = lambda df: parse_kafka_records(  # noqa: E731
                df, None, cfg, value_format="avro",
            )
        else:
            schema_version = CDC_EVENT_SCHEMAS[args.schema_version]
            from pyspark.sql import types as T

            value_schema = T.StructType(
                [f for f in schema_version.fields
                 if f.name not in ("kafka_partition", "kafka_offset")]
            )
            stream = parse_kafka_records(raw, value_schema, cfg)
            record_parser = None
    else:
        stream = cdc_src.file_stream(
            spark, args.input, CDC_EVENT_SCHEMAS[args.schema_version],
            max_files_per_trigger=args.max_files_per_trigger,
        )
        record_parser = None
    runner = CdcStreamRunner(applier, args.checkpoint,
                             record_parser=record_parser)
    if args.once:
        runner.run_available(stream)
        # north-rule metrics: per-run throughput summary (per-batch
        # and per-partition detail live in the lineage table)
        print(json.dumps(runner.metrics()))
    else:
        q = runner.start(
            stream, available_now=False,
            processing_time=args.processing_time,
        )
        q.awaitTermination()


def cmd_compact(args) -> None:
    from kafka_jdbc_sink_connector_spark.lake.maintenance import compact
    from kafka_jdbc_sink_connector_spark.lake.table import LakeTable

    spark = _session(args)
    t = LakeTable.load(spark, args.table)
    done = compact(t, min_files=args.min_files)
    print(json.dumps({"compacted_buckets": done, "version": t.version}))


def cmd_cluster(args) -> None:
    from kafka_jdbc_sink_connector_spark.lake.maintenance import cluster_by
    from kafka_jdbc_sink_connector_spark.lake.table import LakeTable

    spark = _session(args)
    t = LakeTable.load(spark, args.table)
    done = cluster_by(
        t, args.by.split(","), files_per_bucket=args.files_per_bucket,
        method=args.method,
    )
    print(json.dumps({"clustered_buckets": done, "version": t.version}))


_NUMERIC_TYPES = ("byte", "short", "int", "long", "float", "double",
                  "decimal")


def _parse_where(items: list[str] | None, schema=None):
    """``col:op:value`` triples (``col:is_null`` / ``col:not_null``
    need no value). A value is cast to int/float ONLY when the target
    column's schema type is numeric — unconditional coercion turned a
    predicate on a STRING column (e.g. zero-padded id ``'0123'``)
    into ``col = 123``, which Spark then matched by casting the
    COLUMN to int, selecting different rows than string equality.
    An explicit 4-part form ``col:op:str:value`` / ``col:op:int:value``
    / ``col:op:float:value`` forces the type (and is the only way to
    keep a literal containing ``:`` intact)."""
    numeric_cols = set()
    for f in schema.fields if schema is not None else []:
        if f.dataType.typeName().startswith(_NUMERIC_TYPES):
            numeric_cols.add(f.name)
    out = []
    for s in items or []:
        parts = s.split(":", 3)
        if len(parts) == 2:
            out.append((parts[0], parts[1]))
            continue
        if len(parts) == 4 and parts[2] in ("str", "int", "float"):
            col, op, marker, val = parts
            caster = {"str": str, "int": int, "float": float}[marker]
            out.append((col, op, caster(val)))
            continue
        col, op, val = parts[0], parts[1], ":".join(parts[2:])
        if col in numeric_cols or schema is None:
            for cast in (int, float):
                try:
                    val = cast(val)
                    break
                except ValueError:
                    pass
        out.append((col, op, val))
    return out or None


def cmd_count(args) -> None:
    from kafka_jdbc_sink_connector_spark.lake.table import LakeTable

    spark = _session(args)
    t = LakeTable.load(spark, args.table)
    where = _parse_where(args.where, schema=t.schema)
    print(json.dumps({
        "rows": t.count(where=where),
        "version": t.version,
        "where": [list(p) for p in (where or [])],
    }))


def cmd_vacuum(args) -> None:
    from kafka_jdbc_sink_connector_spark.lake.maintenance import vacuum
    from kafka_jdbc_sink_connector_spark.lake.table import LakeTable

    spark = _session(args)
    t = LakeTable.load(spark, args.table)
    print(json.dumps(vacuum(t, keep_versions=args.keep_versions)))


def cmd_restore(args) -> None:
    from kafka_jdbc_sink_connector_spark.lake.table import LakeTable

    spark = _session(args)
    t = LakeTable.load(spark, args.table)
    snap = t.restore(args.version)
    print(json.dumps({
        "version": snap.version,
        "restored_from": args.version,
        "applied_batches": snap.applied_batches,
    }))


def cmd_rebucket(args) -> None:
    from kafka_jdbc_sink_connector_spark.lake.maintenance import rebucket
    from kafka_jdbc_sink_connector_spark.lake.table import LakeTable

    spark = _session(args)
    t = LakeTable.load(spark, args.table)
    old = t.snapshot.n_buckets
    rebucket(t, args.n_buckets)
    print(json.dumps({
        "version": t.version, "n_buckets": [old, args.n_buckets],
    }))


def cmd_set_props(args) -> None:
    from kafka_jdbc_sink_connector_spark.lake.table import LakeTable

    spark = _session(args)
    t = LakeTable.load(spark, args.table)
    updates: dict = {}
    for kv in args.set or []:
        k, _, v = kv.partition("=")
        if not _:
            raise SystemExit(f"--set expects key=value, got {kv!r}")
        # JSON values when they parse (lists/ints for bloom.* etc.),
        # bare strings otherwise
        try:
            updates[k] = json.loads(v)
        except json.JSONDecodeError:
            updates[k] = v
    for k in args.unset or []:
        updates[k] = None
    snap = t.set_props(updates)
    print(json.dumps({"version": snap.version, "props": snap.props}))


def cmd_show(args) -> None:
    from kafka_jdbc_sink_connector_spark.lake.table import LakeTable

    spark = _session(args)
    t = LakeTable.load(spark, args.table)
    snap = t.snapshot
    print(json.dumps({
        "version": snap.version,
        "committed_at": snap.commit_ts,
        "history": t.history(),
        "n_buckets": snap.n_buckets,
        "n_files": len(snap.files()),
        "rows": t.read().count(),
        "schema": [f"{f.name}:{f.dataType.simpleString()}"
                   for f in snap.schema.fields],
        "applied_batches": snap.applied_batches,
    }, indent=2))


def cmd_history(args) -> None:
    from kafka_jdbc_sink_connector_spark.lake.table import LakeTable

    spark = _session(args)
    t = LakeTable.load(spark, args.table)
    print(json.dumps(t.describe_history(limit=args.limit), indent=2))


def cmd_changes(args) -> None:
    from kafka_jdbc_sink_connector_spark.lake.changes import table_changes
    from kafka_jdbc_sink_connector_spark.lake.table import LakeTable

    spark = _session(args)
    t = LakeTable.load(spark, args.table)
    feed = table_changes(
        t, from_version=args.from_version, to_version=args.to_version,
        include_preimages=getattr(args, "preimages", False),
    )
    if args.out:
        feed.write.mode("overwrite").parquet(args.out)
        n = spark.read.parquet(args.out).count()
    else:
        # one pass over the expensive snapshot diff, not two
        feed = feed.persist()
        try:
            n = feed.count()
            for r in feed.limit(args.limit).collect():
                print(json.dumps(
                    {k: str(v) for k, v in r.asDict().items()}
                ))
        finally:
            feed.unpersist()
    print(json.dumps({
        "n_changes": n,
        "from_version": args.from_version,
        "to_version": args.to_version
        if args.to_version is not None else t.version,
    }))


def cmd_maintain(args) -> None:
    from kafka_jdbc_sink_connector_spark.lake.maintenance import plan
    from kafka_jdbc_sink_connector_spark.lake.table import LakeTable

    spark = _session(args)
    t = LakeTable.load(spark, args.table)
    kw = {}
    if args.max_delta_depth is not None:
        kw["max_delta_depth"] = args.max_delta_depth
    if args.max_files_per_bucket is not None:
        kw["max_files_per_bucket"] = args.max_files_per_bucket
    if args.max_retained_versions is not None:
        kw["max_retained_versions"] = args.max_retained_versions
    if args.target_rows_per_bucket is not None:
        kw["target_rows_per_bucket"] = args.target_rows_per_bucket
    acts = plan(t, execute=args.execute, **kw)
    print(json.dumps({
        "actions": [
            {"kind": a.kind, "reason": a.reason,
             "params": {k: v for k, v in a.params.items()
                        if k != "result"},
             **({"result": str(a.params.get("result"))}
                if args.execute else {})}
            for a in acts
        ],
        "executed": bool(args.execute),
        "version": t.version,
    }))


def cmd_approx_distinct(args) -> None:
    from kafka_jdbc_sink_connector_spark.lake.table import LakeTable
    from kafka_jdbc_sink_connector_spark.operators.sketch import (
        hll_count_distinct,
    )

    spark = _session(args)
    t = LakeTable.load(spark, args.table)
    est = hll_count_distinct(t.read(), args.column, p=args.p).collect()[0]
    print(json.dumps({
        "column": args.column,
        "estimate": round(est["estimate"], 2),
        "p": args.p,
    }))


def cmd_search(args) -> None:
    from kafka_jdbc_sink_connector_spark.lake.table import LakeTable
    from kafka_jdbc_sink_connector_spark.streaming.textindex import (
        search_postings,
    )

    spark = _session(args)
    t = LakeTable.load(spark, args.postings)
    terms = [s for s in args.terms.split(",") if s]
    out = search_postings(spark, t, terms, mode=args.mode)
    # bounded collect: a stopword-like probe over a large posting
    # table would otherwise pull every matching id to the driver even
    # though only --limit ids are printed; the count stays distributed
    id_col = out.columns[0]
    n_docs = out.count()
    ids = [r[0] for r in out.orderBy(id_col).limit(args.limit).collect()]
    print(json.dumps({"terms": terms, "mode": args.mode,
                      "n_docs": n_docs, "doc_ids": ids}))


def main(argv: list[str] | None = None) -> None:
    ap = argparse.ArgumentParser(prog="kafka_jdbc_sink_connector_spark")
    ap.add_argument("--cores", default="*")
    sub = ap.add_subparsers(dest="cmd", required=True)

    def add_cfg(p):
        p.add_argument("--table", required=True)
        p.add_argument("--connect-config", default=None,
                       help="Kafka-Connect connector JSON (the "
                            "reference's property names); overrides "
                            "the individual flags below")
        p.add_argument("--pk", default="conv_id,turn_idx")
        p.add_argument("--insert-mode", default="upsert")
        p.add_argument("--delete-mode", default="update")
        p.add_argument("--retain-fields", default="ts")
        p.add_argument("--delete-key", default=None)
        p.add_argument("--delete-identifier", default="op_type=D")
        p.add_argument("--merge-mode", choices=["cow", "mor"],
                       default="cow")
        p.add_argument("--buckets", type=int, default=64)
        p.add_argument("--max-retries", type=int, default=3)
        p.add_argument("--retry-backoff-ms", type=int, default=1000)
        p.add_argument("--schema-version", type=int, default=3)

    p = sub.add_parser("apply", help="apply one parquet batch")
    add_cfg(p)
    p.add_argument("--input", required=True)
    p.add_argument("--batch-id", type=int, default=0)
    p.set_defaults(fn=cmd_apply)

    p = sub.add_parser(
        "replay-dlq",
        help="re-drive one batch's quarantined rows through the apply",
    )
    add_cfg(p)
    p.add_argument("--batch-id", type=int, required=True)
    p.add_argument("--replay-source", default="dlq",
                   help="watermark namespace; change it to re-drive "
                        "the same batch again after another fix")
    p.set_defaults(fn=cmd_replay_dlq)

    p = sub.add_parser("stream", help="run the streaming pipeline")
    add_cfg(p)
    p.add_argument("--source", choices=["files", "kafka"], default="files")
    p.add_argument("--input", help="drop directory (files source)")
    p.add_argument("--bootstrap", help="kafka bootstrap servers")
    p.add_argument("--topic", help="kafka topic")
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--once", action="store_true",
                   help="availableNow: drain and exit")
    p.add_argument("--processing-time", default="10 seconds")
    p.add_argument("--max-files-per-trigger", type=int, default=None)
    p.add_argument("--max-offsets-per-trigger", type=int, default=None)
    p.add_argument("--value-format", choices=["json", "avro"],
                   default="json",
                   help="kafka source only: avro decodes Confluent "
                        "frames per micro-batch via the record_parser "
                        "hook (registry from schema.registry.url)")
    p.set_defaults(fn=cmd_stream)

    p = sub.add_parser("compact")
    p.add_argument("--table", required=True)
    p.add_argument("--min-files", type=int, default=2)
    p.set_defaults(fn=cmd_compact)

    p = sub.add_parser(
        "cluster", help="sort-rewrite buckets so file min/max stats "
                        "skip on the given columns"
    )
    p.add_argument("--table", required=True)
    p.add_argument("--by", required=True,
                   help="comma-separated clustering columns")
    p.add_argument("--files-per-bucket", type=int, default=4)
    p.add_argument("--method", choices=["linear", "zorder"],
                   default="linear",
                   help="zorder interleaves column bits so every "
                        "clustered column's range predicates skip")
    p.set_defaults(fn=cmd_cluster)

    p = sub.add_parser(
        "count", help="row count answered from manifest stats where "
                      "possible; only boundary files are scanned"
    )
    p.add_argument("--table", required=True)
    p.add_argument("--where", action="append",
                   help="col:op:value predicate (repeatable, ANDed); "
                        "col:is_null / col:not_null take no value")
    p.set_defaults(fn=cmd_count)

    p = sub.add_parser("vacuum")
    p.add_argument("--table", required=True)
    p.add_argument("--keep-versions", type=int, default=2)
    p.set_defaults(fn=cmd_vacuum)

    p = sub.add_parser("show")
    p.add_argument("--table", required=True)
    p.set_defaults(fn=cmd_show)

    p = sub.add_parser(
        "history", help="commit audit trail (DESCRIBE HISTORY analog)"
    )
    p.add_argument("--table", required=True)
    p.add_argument("--limit", type=int, default=None)
    p.set_defaults(fn=cmd_history)

    p = sub.add_parser(
        "restore",
        help="roll back to a version (state + batch watermarks rewind)",
    )
    p.add_argument("--table", required=True)
    p.add_argument("--version", type=int, required=True)
    p.set_defaults(fn=cmd_restore)

    p = sub.add_parser(
        "rebucket", help="change the bucket count (full resolved rewrite)"
    )
    p.add_argument("--table", required=True)
    p.add_argument("--n-buckets", type=int, required=True)
    p.set_defaults(fn=cmd_rebucket)

    p = sub.add_parser(
        "props", help="update table properties (metadata-only commit)"
    )
    p.add_argument("--table", required=True)
    p.add_argument("--set", action="append", metavar="KEY=VALUE",
                   help="JSON values when they parse, strings otherwise")
    p.add_argument("--unset", action="append", metavar="KEY")
    p.set_defaults(fn=cmd_set_props)

    p = sub.add_parser(
        "changes", help="change data feed between two table versions"
    )
    p.add_argument("--table", required=True)
    p.add_argument("--from-version", type=int, required=True)
    p.add_argument("--to-version", type=int, default=None)
    p.add_argument("--preimages", action="store_true",
                   help="Delta-CDF two-row updates "
                        "(update_preimage/update_postimage)")
    p.add_argument("--out", default=None,
                   help="write the feed to this parquet path instead "
                        "of printing")
    p.add_argument("--limit", type=int, default=20)
    p.set_defaults(fn=cmd_changes)

    p = sub.add_parser(
        "maintain",
        help="stats-driven maintenance policy: read the manifest, "
             "print (or run) the recommended actions",
    )
    p.add_argument("--table", required=True)
    p.add_argument("--execute", action="store_true")
    p.add_argument("--max-delta-depth", type=int, default=None)
    p.add_argument("--max-files-per-bucket", type=int, default=None)
    p.add_argument("--max-retained-versions", type=int, default=None)
    p.add_argument("--target-rows-per-bucket", type=int, default=None)
    p.set_defaults(fn=cmd_maintain)

    p = sub.add_parser(
        "approx-distinct",
        help="HLL distinct-count estimate for one column",
    )
    p.add_argument("--table", required=True)
    p.add_argument("--column", required=True)
    p.add_argument("--p", type=int, default=8)
    p.set_defaults(fn=cmd_approx_distinct)

    p = sub.add_parser(
        "search",
        help="term lookup over a (term, id) posting table "
             "(textindex.TextIndexRunner output)",
    )
    p.add_argument("--postings", required=True)
    p.add_argument("--terms", required=True, help="comma-separated")
    p.add_argument("--mode", choices=["any", "all"], default="any")
    p.add_argument("--limit", type=int, default=50)
    p.set_defaults(fn=cmd_search)

    args = ap.parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()
