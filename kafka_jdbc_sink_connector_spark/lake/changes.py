"""Change data feed: what changed between two table versions.

The Delta-CDF / Iceberg-changelog idea rebuilt on the engine's
snapshot log: downstream consumers (index builders, caches, training
shard refreshers) ask "give me every row that changed since version V"
instead of rescanning the table. The reference has no equivalent — its
JDBC target is the end of the line — but any lakehouse user of this
engine expects it.

Implementation: both versions stay readable (snapshots are immutable
until vacuum), so the feed is a key-wise full-outer diff of the two
resolved states:

* key only in the new version   → ``insert`` (post-image)
* key in both, any column differs → ``update`` (post-image)
* key only in the old version   → ``delete`` (pre-image — the only
  image a hard-deleted row has; soft deletes surface as ``update``
  because the row still exists with its marker flipped)

This is O(old + new) — correct for any mode, any distance, and
bucket-aligned (both sides share the bucket layout, so the join
shuffles nothing when Spark picks the bucket-local plan; at 100 TB
restrict it per bucket or partition range the same way reads are
pruned). For adjacent MOR versions a cheaper path exists — the delta
files ARE the change log — but its rows are pre-collapsed per batch;
the diff gives the same answer for any version distance, so it is the
one implementation here and the delta-replay fast path is a documented
optimization seam.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kafka_jdbc_sink_connector_spark.lake.table import LakeTable

CHANGE_TYPE = "_change_type"
FROM_VERSION = "_from_version"
TO_VERSION = "_to_version"


def table_changes(
    table: LakeTable,
    from_version: int,
    to_version: int | None = None,
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """Rows whose state differs between ``from_version`` and
    ``to_version`` (default: current), as post-images (pre-image for
    hard deletes) + ``_change_type`` in {insert, update, delete} +
    the version bounds. Unchanged rows are not emitted.

    ``compare_cols`` limits which non-key columns count as "changed"
    (default: all). Typical use: exclude the audit timestamp, which
    moves on every re-application — e.g. an at-least-once redelivery
    re-writes identical values with a fresh audit ts, which most
    consumers don't want to see as an update.
    """
    to_version = table.version if to_version is None else to_version
    if from_version > to_version:
        raise ValueError(
            f"from_version {from_version} > to_version {to_version}"
        )
    old_snap = table._read_version(from_version)
    new_snap = table._read_version(to_version)
    keys = list(new_snap.key_fields)
    cols = [f.name for f in new_snap.schema.fields]
    non_keys = [c for c in cols if c not in keys]
    cmp_cols = non_keys if compare_cols is None else [
        c for c in non_keys if c in set(compare_cols)
    ]
    # manifest-level bucket pruning: a bucket whose base/delta/sdel
    # file lists are IDENTICAL in both snapshots cannot contain a
    # changed row — the diff reads only buckets that differ, so feed
    # cost scales with changed data, not table size (driver-side list
    # compare, no data touched)
    changed = [
        b
        for b in range(new_snap.n_buckets)
        if (
            old_snap.buckets.get(str(b), [])
            != new_snap.buckets.get(str(b), [])
            or old_snap.delta_buckets.get(str(b), [])
            != new_snap.delta_buckets.get(str(b), [])
            or old_snap.sdel_buckets.get(str(b), [])
            != new_snap.sdel_buckets.get(str(b), [])
        )
    ]
    # schema may have evolved between the versions: columns the old
    # snapshot predates read as NULL (same null-backfill the table
    # itself applies to old files)
    old_cols = {f.name for f in old_snap.schema.fields}
    old = table.read(version=from_version, buckets=changed).select(
        *[
            (
                F.col(c)
                if c in old_cols
                else F.lit(None).cast(new_snap.schema[c].dataType)
            ).alias(f"o_{c}")
            for c in cols
        ]
    )
    new = table.read(version=to_version, buckets=changed)
    cond = [new[k].eqNullSafe(old[f"o_{k}"]) for k in keys]
    j = new.join(old, cond, "full_outer")

    # key presence flags via any key column's side (keys are non-null
    # within their side by construction; eqNullSafe keeps this exact)
    new_exists = j[keys[0]].isNotNull()
    old_exists = j[f"o_{keys[0]}"].isNotNull()
    differs = F.lit(False)
    for c in cmp_cols:
        differs = differs | ~j[c].eqNullSafe(j[f"o_{c}"])

    change = (
        F.when(new_exists & ~old_exists, F.lit("insert"))
        .when(~new_exists & old_exists, F.lit("delete"))
        .when(differs, F.lit("update"))
    )
    out = [
        (
            F.coalesce(j[c], j[f"o_{c}"]).alias(c)
            if c in keys
            # post-image; pre-image only when the row is gone
            else F.when(new_exists, j[c]).otherwise(j[f"o_{c}"]).alias(c)
        )
        for c in cols
    ]
    return j.select(
        *out,
        change.alias(CHANGE_TYPE),
        F.lit(from_version).alias(FROM_VERSION),
        F.lit(to_version).alias(TO_VERSION),
    ).filter(F.col(CHANGE_TYPE).isNotNull())
