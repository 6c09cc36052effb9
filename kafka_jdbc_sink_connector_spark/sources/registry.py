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

    def known_schemas(self) -> dict[int, str]:
        """Every id → schema this client can resolve WITHOUT a remote
        round-trip (its cache / backing map). Used as the decode shape
        for batches that carry no id to harvest — e.g. a tombstone-only
        micro-batch mid-stream, where the columns must keep the shape
        of the schemas seen so far (registry ids are immutable, so a
        cached entry is always still correct)."""
        return {}


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

    def known_schemas(self) -> dict[int, str]:
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

    def fetch_schema(self, schema_id: int) -> str:
        schema_id = int(schema_id)
        cached = self._cache.get(schema_id)
        if cached is not None:
            return cached
        url = f"{self.base_url}/schemas/ids/{schema_id}"
        last_err: Exception | None = None
        for attempt in range(self.max_retries + 1):
            try:
                with urllib.request.urlopen(url, timeout=self.timeout) as r:
                    body = json.loads(r.read().decode("utf-8"))
                schema = body.get("schema")
                if not isinstance(schema, str):
                    raise SchemaRegistryError(
                        f"registry response for id {schema_id} has no "
                        f"'schema' string member: {body!r}"
                    )
                self._cache[schema_id] = schema
                return schema
            except urllib.error.HTTPError as e:
                if e.code == 404:
                    raise SchemaRegistryError(
                        f"unknown schema id {schema_id} (registry miss, "
                        f"HTTP 404 from {url})"
                    ) from e
                last_err = e  # 5xx etc.: transient, retry
            except (urllib.error.URLError, OSError, TimeoutError) as e:
                last_err = e
            if attempt < self.max_retries:
                time.sleep(self.backoff_sec * (attempt + 1))
        raise SchemaRegistryError(
            f"schema registry at {self.base_url} unreachable after "
            f"{self.max_retries + 1} attempts fetching id {schema_id}: "
            f"{last_err}"
        ) from last_err

    def known_schemas(self) -> dict[int, str]:
        return dict(self._cache)


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


def schemas_for_batch(
    records: DataFrame, col: Column, registry: SchemaRegistryClient
) -> dict[int, str]:
    """id → writer schema JSON for every id the batch carries, resolved
    through ``registry`` (cached client ⇒ one HTTP round-trip per
    never-seen id across the stream's lifetime). Unknown ids raise
    loudly here — before any decode work is scheduled."""
    return {
        sid: registry.fetch_schema(sid)
        for sid in batch_schema_ids(records, col)
    }
