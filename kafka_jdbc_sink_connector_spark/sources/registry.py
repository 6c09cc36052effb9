"""Pluggable Schema Registry client: resolve writer schemas by the id
embedded in each record's Confluent frame.

The reference's converters resolve schemas from the registry service
named by ``schema.registry.url`` (converter config driven through the
Connect worker; ``BufferedRecordsTest.java:94-99`` exercises two
registered schema versions through one connector). The engine's decode
layer (:func:`..avro.avro_decode_multi`) routes per record over an
id → writer-schema map; this module produces that map on demand:

* :class:`HttpSchemaRegistry` — the Confluent REST API's
  ``GET /schemas/ids/{id}`` (public wire contract: a JSON object with
  a ``"schema"`` member holding the Avro schema JSON as a string),
  with an in-process cache (ids are immutable in a registry — a cached
  entry can never go stale) and bounded retries with backoff for
  transient failures. 404 is a REGISTRY MISS and fails immediately —
  retrying cannot make an unregistered id appear, and the decode path
  treats unknown ids as data corruption, loudly.
* :class:`DictSchemaRegistry` — an in-memory fake with the same
  contract, for tests and for callers that already hold the map.

Driver-side by design: the set of distinct schema ids in a batch is
bounded by the registry's version count (single digits in practice),
so :func:`schemas_for_batch` collects that tiny set once per batch and
every executor then decodes JVM-side (or Arrow-side) with the resolved
map — no per-record registry traffic, no HTTP from executors.
"""

from __future__ import annotations

import json
import time
import urllib.error
import urllib.request

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


class SchemaRegistryError(RuntimeError):
    """Registry miss or permanently failing registry."""


class SchemaRegistryClient:
    """Interface: resolve a writer schema (Avro schema JSON string) by
    registry schema id. Implementations must treat ids as immutable
    (safe to cache forever) and raise :class:`SchemaRegistryError` for
    unknown ids."""

    def fetch_schema(self, schema_id: int) -> str:
        raise NotImplementedError

    def fetch_latest(self, subject: str) -> tuple[int, str]:
        """(schema id, schema JSON) of the subject's latest version —
        Confluent's ``GET /subjects/{subject}/versions/latest``. Used
        for COLD-START pinning: a tombstone-only first batch carries no
        id to harvest, but its topic names the subject (Confluent
        TopicNameStrategy: ``{topic}-value``). Optional — clients that
        cannot resolve subjects raise a miss."""
        raise SchemaRegistryError(
            f"{type(self).__name__} cannot resolve subjects "
            f"(requested {subject!r})"
        )

    def known_schemas(self, scope: str | None = None) -> dict[int, str]:
        """Every id → schema this client can resolve WITHOUT a remote
        round-trip (its cache / backing map). Used as the decode shape
        for batches that carry no id to harvest — e.g. a tombstone-only
        micro-batch mid-stream, where the columns must keep the shape
        of the schemas seen so far (registry ids are immutable, so a
        cached entry is always still correct).

        ``scope`` narrows the answer to ids previously recorded under
        that scope via :meth:`note_scope` (e.g. ``"value:<topic>"``) —
        a shared client accumulates schemas from every topic/pipeline
        (and, under pk_mode=record_key, key schemas too); an UNSCOPED
        fallback could pin a batch's value shape to a superset
        containing foreign or key-side columns. Clients that do not
        track scopes may ignore the argument (documented per class)."""
        return {}

    def note_scope(self, scope: str, ids) -> None:
        """Record that ``ids`` were harvested under ``scope`` so scoped
        :meth:`known_schemas` lookups stay per-topic/per-column. No-op
        by default."""


class DictSchemaRegistry(SchemaRegistryClient):
    """Dict-backed fake/adapter with the same miss semantics."""

    def __init__(self, schemas: dict[int, str]):
        self._schemas = dict(schemas)

    def fetch_schema(self, schema_id: int) -> str:
        try:
            return self._schemas[int(schema_id)]
        except KeyError:
            raise SchemaRegistryError(
                f"unknown schema id {schema_id} (registry miss); known: "
                f"{sorted(self._schemas)}"
            ) from None

    def known_schemas(self, scope: str | None = None) -> dict[int, str]:
        """Scope is ignored: the backing map is supplied explicitly by
        the caller for one pipeline, so it cannot accumulate foreign
        schemas the way a shared HTTP client's cache can."""
        return dict(self._schemas)


class HttpSchemaRegistry(SchemaRegistryClient):
    """Confluent-REST-compatible registry over HTTP.

    ``GET {base_url}/schemas/ids/{id}`` → ``{"schema": "<avro json>"}``.
    Transient failures (connection errors, 5xx) retry ``max_retries``
    times with linear backoff; 404 raises a miss immediately.
    """

    def __init__(
        self,
        base_url: str,
        timeout: float = 5.0,
        max_retries: int = 3,
        backoff_sec: float = 0.5,
    ):
        self.base_url = base_url.rstrip("/")
        self.timeout = timeout
        self.max_retries = max_retries
        self.backoff_sec = backoff_sec
        self._cache: dict[int, str] = {}
        self._scope_ids: dict[str, set[int]] = {}

    def _get_json(self, url: str, miss_msg: str) -> dict:
        """GET with bounded linear-backoff retries; 404 is a MISS and
        fails immediately (retrying cannot make an unregistered
        id/subject appear)."""
        last_err: Exception | None = None
        for attempt in range(self.max_retries + 1):
            try:
                with urllib.request.urlopen(url, timeout=self.timeout) as r:
                    return json.loads(r.read().decode("utf-8"))
            except urllib.error.HTTPError as e:
                if e.code == 404:
                    raise SchemaRegistryError(
                        f"{miss_msg} (registry miss, HTTP 404 from {url})"
                    ) from e
                last_err = e  # 5xx etc.: transient, retry
            except (urllib.error.URLError, OSError, TimeoutError) as e:
                last_err = e
            if attempt < self.max_retries:
                time.sleep(self.backoff_sec * (attempt + 1))
        raise SchemaRegistryError(
            f"schema registry at {self.base_url} unreachable after "
            f"{self.max_retries + 1} attempts ({miss_msg}): {last_err}"
        ) from last_err

    def fetch_schema(self, schema_id: int) -> str:
        schema_id = int(schema_id)
        cached = self._cache.get(schema_id)
        if cached is not None:
            return cached
        body = self._get_json(
            f"{self.base_url}/schemas/ids/{schema_id}",
            f"unknown schema id {schema_id}",
        )
        schema = body.get("schema")
        if not isinstance(schema, str):
            raise SchemaRegistryError(
                f"registry response for id {schema_id} has no "
                f"'schema' string member: {body!r}"
            )
        self._cache[schema_id] = schema
        return schema

    def fetch_latest(self, subject: str) -> tuple[int, str]:
        body = self._get_json(
            f"{self.base_url}/subjects/{subject}/versions/latest",
            f"unknown subject {subject!r}",
        )
        schema, sid = body.get("schema"), body.get("id")
        if not isinstance(schema, str) or not isinstance(sid, int):
            raise SchemaRegistryError(
                f"registry response for subject {subject!r} lacks "
                f"'schema'/'id' members: {body!r}"
            )
        self._cache[sid] = schema
        return sid, schema

    def note_scope(self, scope: str, ids) -> None:
        self._scope_ids.setdefault(scope, set()).update(
            int(i) for i in ids
        )

    def known_schemas(self, scope: str | None = None) -> dict[int, str]:
        if scope is None:
            return dict(self._cache)
        return {
            i: self._cache[i]
            for i in self._scope_ids.get(scope, ())
            if i in self._cache
        }


#: one client (= one schema cache) per registry URL across the
#: process — cfg-driven resolution must not rebuild the client (and
#: lose the cache) per micro-batch
_CLIENTS: dict[str, "HttpSchemaRegistry"] = {}


def client_for(base_url: str) -> HttpSchemaRegistry:
    c = _CLIENTS.get(base_url)
    if c is None:
        c = _CLIENTS[base_url] = HttpSchemaRegistry(base_url)
    return c


def batch_schema_ids(records: DataFrame, col: Column) -> list[int]:
    """The distinct Confluent schema ids present in a binary column —
    one tiny aggregation (the id set is bounded by registry versions,
    not batch size). Frames too short or with a bad magic byte are NOT
    harvested: they keep flowing to the decoder, which fails them with
    the frame error (identical on both decode paths), rather than
    failing here with a misleading registry error."""
    from kafka_jdbc_sink_connector_spark.sources.avro import (
        schema_id_column,
    )

    well_framed = (
        col.isNotNull()
        & (F.length(col) >= 5)
        & (F.substring(col, 1, 1) == F.lit(b"\x00"))
    )
    row = records.select(
        F.collect_set(F.when(well_framed, schema_id_column(col)))
        .alias("ids")
    ).collect()[0]
    return sorted(int(i) for i in (row["ids"] or []))


def batch_schema_ids_by_topic(
    records: DataFrame, col: Column
) -> dict[str | None, list[int]]:
    """Distinct Confluent schema ids per TOPIC in one tiny aggregation
    (both dimensions bounded: topics by the subscription, ids by
    registry versions). Topics with only tombstones/malformed frames
    appear with an empty id list — exactly the signal the cold-start /
    cached-shape fallbacks need (the topic names the subject even when
    no frame names a schema)."""
    from kafka_jdbc_sink_connector_spark.sources.avro import (
        schema_id_column,
    )

    well_framed = (
        col.isNotNull()
        & (F.length(col) >= 5)
        & (F.substring(col, 1, 1) == F.lit(b"\x00"))
    )
    rows = (
        records.groupBy("topic")
        .agg(
            F.collect_set(F.when(well_framed, schema_id_column(col)))
            .alias("ids")
        )
        .collect()
    )
    return {
        r["topic"]: sorted(int(i) for i in (r["ids"] or []))
        for r in rows
    }


def harvest_for_batch(
    records: DataFrame,
    col: Column,
    registry: SchemaRegistryClient,
    scope_prefix: str | None = None,
) -> tuple[dict[int, str], dict[str | None, list[int]]]:
    """(id → writer schema JSON, topic → harvested ids) for every id
    the batch carries, resolved through ``registry`` (cached client ⇒
    one HTTP round-trip per never-seen id across the stream's
    lifetime). Unknown ids raise loudly here — before any decode work
    is scheduled.

    With ``scope_prefix`` (e.g. ``"value"``), ids are harvested per
    topic and recorded under ``"{scope_prefix}:{topic}"`` scopes on the
    client, so later scoped :meth:`~SchemaRegistryClient.known_schemas`
    fallbacks see only this column's/topic's schemas. A frame WITHOUT
    a ``topic`` column (a caller-trimmed record frame) degrades to one
    anonymous ``None``-topic harvest: ids resolve exactly as before,
    but no scope is recorded and topic-derived fallbacks (scoped
    cache, subject pinning) are unavailable to it."""
    if "topic" in records.columns:
        by_topic = batch_schema_ids_by_topic(records, col)
    else:
        by_topic = {None: batch_schema_ids(records, col)}
    out: dict[int, str] = {}
    for topic, ids in by_topic.items():
        for sid in ids:
            if sid not in out:
                out[sid] = registry.fetch_schema(sid)
        if ids and scope_prefix is not None and topic is not None:
            registry.note_scope(f"{scope_prefix}:{topic}", ids)
    return out, by_topic


def schemas_for_batch(
    records: DataFrame,
    col: Column,
    registry: SchemaRegistryClient,
    scope_prefix: str | None = None,
) -> dict[int, str]:
    """The schema map of :func:`harvest_for_batch` (kept for callers
    that don't need the per-topic id breakdown)."""
    return harvest_for_batch(records, col, registry, scope_prefix)[0]
