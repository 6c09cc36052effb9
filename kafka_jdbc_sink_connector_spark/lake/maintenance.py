"""Table maintenance: compaction and vacuum.

The reference has no equivalent (the JDBC database compacts itself);
for a lake table these are the operations that keep a
continuously-merged 100 TB table healthy:

* **compact** — every COW merge commit writes fresh files per touched
  bucket and append commits add more; small-file count grows with
  batch cadence. Compaction rewrites chosen buckets into one file set
  and commits a snapshot that references only those (bin-packing
  rewrite, same idea as Iceberg's rewrite_data_files).
* **cluster_by** — sort-rewrite so each bucket's files hold disjoint
  clustering-column ranges, restoring file-level data skipping
  (``lake/stats.py``) after out-of-order ingest — the Delta
  OPTIMIZE/sort-order-rewrite analog.
* **vacuum** — snapshots are immutable and old ones stay readable
  (time travel); vacuum deletes data files not referenced by the
  last ``keep_versions`` snapshots plus the older manifests, bounding
  storage. Equivalent of Delta VACUUM / Iceberg expire_snapshots.

Both are driver-coordinated (manifest edits) with the data work fully
distributed; both commit through the same atomic publish as writes, so
readers never observe a partial state.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from kafka_jdbc_sink_connector_spark.functions.keys import BUCKET_COL
from kafka_jdbc_sink_connector_spark.lake.table import LakeTable, _DATA_DIR, _LOG_DIR


def compact(
    table: LakeTable,
    buckets: list[int] | None = None,
    min_files: int = 2,
) -> list[int]:
    """Rewrite buckets that have >= ``min_files`` data files into a
    single file set each. Returns the buckets compacted."""
    snap = table.snapshot
    all_ids = set(snap.buckets) | set(snap.delta_buckets) | set(
        snap.sdel_buckets
    )
    candidates = [
        int(b)
        for b in all_ids
        if (
            # any merge-on-read delta (pk or subset-delete overlay) is
            # worth folding into base; otherwise bin-pack buckets with
            # enough small files
            len(snap.delta_buckets.get(b, []))
            or len(snap.sdel_buckets.get(b, []))
            or len(snap.buckets.get(b, [])) >= min_files
        )
        and (buckets is None or int(b) in set(buckets))
    ]
    if not candidates:
        return []
    data = table.read(buckets=candidates, include_bucket=True)
    table.commit_rewrite(
        data,
        candidates,
        stats={"compacted_buckets": candidates},
    )
    return candidates


def rebucket(table: LakeTable, new_n_buckets: int) -> LakeTable:
    """Change the table's bucket count with one full resolved rewrite
    (Iceberg partition-spec evolution realized as rewrite_data_files:
    the initial bucket choice rarely survives 100× growth — too few
    buckets caps merge parallelism and makes every bucket rewrite
    huge, too many drowns a small table in file overhead).

    One shuffle of the full resolved table on the NEW bucket
    assignment — the only operation in this module that is
    deliberately table-sized, which is why it's a commit like any
    other: atomic, time-travelable, and rejected by the
    optimistic-concurrency rebase on conflict (a concurrent writer's
    commit under the old layout can't silently survive a bucket-count
    change, ``table.py:_rebase`` declines both directions). Batch
    watermarks and table properties carry over, so exactly-once
    ingest continues seamlessly under the new layout; MOR deltas are
    folded by the resolved read, like ``compact``.
    """
    from kafka_jdbc_sink_connector_spark.functions.keys import bucket_expr

    snap = table.snapshot
    if new_n_buckets < 1:
        raise ValueError("new_n_buckets must be >= 1")
    if new_n_buckets == snap.n_buckets:
        raise ValueError(f"table already has {new_n_buckets} buckets")
    data = table.read().withColumn(
        BUCKET_COL, bucket_expr(snap.bucket_key, new_n_buckets)
    )
    table.commit_rewrite(
        data,
        list(range(snap.n_buckets)),
        stats={"rebucketed": [snap.n_buckets, new_n_buckets]},
        new_n_buckets=new_n_buckets,
    )
    return table


def _zorder_column(data, cols, bits: int = 16):
    """Interleaved-bits Morton key over ``cols`` — entirely codegen'd
    (cast/floor/shiftright/shiftleft/sum), no Python per row.

    Each column is min-max scaled to ``bits``-bit integers (one
    aggregate job over the rows being rewritten — never the table),
    then bit ``i`` of column ``j`` lands at position ``i*ncols + j``.
    NULLs scale to 0 (sort first, like NULLS FIRST). Only
    numeric/timestamp/date columns interleave meaningfully; strings
    raise (use the lexicographic method for string prefixes).
    """
    from pyspark.sql import types as T

    schema = {f.name: f.dataType for f in data.schema.fields}
    bits = min(bits, 60 // len(cols))  # keep z inside a signed 64-bit

    def as_double(c):
        dt = schema[c]
        if isinstance(dt, T.DateType):
            return F.unix_date(F.col(c)).cast("double")
        if isinstance(dt, (T.TimestampType, T.NumericType)):
            return F.col(c).cast("double")
        raise ValueError(
            f"zorder needs numeric/timestamp/date columns, {c} is {dt}"
        )

    row = data.agg(
        *[f for c in cols for f in (F.min(as_double(c)), F.max(as_double(c)))]
    ).collect()[0]
    top = (1 << bits) - 1
    z = F.lit(0).cast("long")
    for j, c in enumerate(cols):
        mn, mx = row[2 * j], row[2 * j + 1]
        if mn is None or mx is None or mx == mn:
            continue  # constant/all-null column adds no order
        scaled = F.least(
            F.lit(top),
            F.greatest(
                F.lit(0),
                F.floor((as_double(c) - mn) / (mx - mn) * top),
            ),
        )
        scaled = F.coalesce(scaled, F.lit(0)).cast("long")
        for i in range(bits):
            bit = F.shiftright(scaled, i).bitwiseAND(F.lit(1))
            z = z + F.shiftleft(bit, i * len(cols) + j)
    return z


def cluster_by(
    table: LakeTable,
    cols: list[str],
    files_per_bucket: int = 4,
    buckets: list[int] | None = None,
    method: str = "linear",
) -> list[int]:
    """Sort-rewrite buckets so their files carry DISJOINT ranges of
    the clustering columns — the Delta ``OPTIMIZE ... ZORDER BY`` /
    Iceberg sort-order rewrite idea, specialized to lexicographic
    order: after clustering, a ``read(where=...)`` range predicate on
    ``cols[0]`` touches ~1/``files_per_bucket`` of each bucket's
    files via the footer min/max stats (:mod:`.stats`), instead of
    all of them when ingest order ignores the column.

    Mechanics: resolved rows are range-partitioned on ``(bucket,
    *cols)`` into ``len(buckets) * files_per_bucket`` partitions and
    written with the caller's layout preserved
    (``commit_rewrite(preserve_layout=True)``) — each partition is a
    contiguous slice of one bucket's value range (range boundaries
    are sampled, so file counts are approximate), and rows are
    additionally sorted within files so parquet row-group stats
    tighten too. Like :func:`compact`, the rewrite folds any
    merge-on-read deltas in (it rewrites the RESOLVED state), so a
    clustered bucket is also a compacted one.

    At 100 TB this is the scheduled background job that restores
    time-axis skippability after out-of-order backfills, and the
    range partitioning is one shuffle of the chosen buckets — cost
    proportional to what's rewritten, never the table.

    ``method="zorder"`` interleaves the columns' bits into a Morton
    key (:func:`_zorder_column`) and range-partitions on that instead:
    lexicographic order makes only ``cols[0]`` skippable, the z-curve
    makes range predicates on EACH clustered column skip (each file
    covers a compact multi-dimensional tile, so every column's per-file
    min/max range is ~``files^(-1/ncols)`` of its domain) — Delta's
    ``OPTIMIZE ZORDER BY``. The key costs one extra aggregate job
    (per-column min/max over the rewritten rows) and stays fully
    codegen'd; it is dropped at write, only the layout changes.
    """
    if not cols:
        raise ValueError("cluster_by needs at least one column")
    if method not in ("linear", "zorder"):
        raise ValueError(f"method must be linear|zorder, got {method!r}")
    snap = table.snapshot
    all_ids = set(snap.buckets) | set(snap.delta_buckets) | set(
        snap.sdel_buckets
    )
    target = sorted(
        int(b)
        for b in all_ids
        if buckets is None or int(b) in set(buckets)
    )
    if not target:
        return []
    data = table.read(buckets=target, include_bucket=True)
    n_parts = max(1, len(target) * files_per_bucket)
    if method == "zorder":
        data = data.withColumn("__z", _zorder_column(data, cols))
        order_exprs = [F.col("__z")]
    else:
        order_exprs = [F.col(c) for c in cols]
    arranged = data.repartitionByRange(
        n_parts, F.col(BUCKET_COL), *order_exprs
    ).sortWithinPartitions(BUCKET_COL, *order_exprs)
    # commit_rewrite projects to the table schema, so a __z helper
    # column affects only the layout, never the stored data
    table.commit_rewrite(
        arranged,
        target,
        stats={"clustered_by": list(cols), "cluster_method": method},
        preserve_layout=True,
    )
    return target


def vacuum(table: LakeTable, keep_versions: int = 1) -> dict:
    """Delete data files unreferenced by the newest ``keep_versions``
    snapshots, and drop older snapshot manifests. Time travel remains
    available for the kept versions only."""
    if keep_versions < 1:
        raise ValueError("keep_versions must be >= 1")
    versions = table.history()
    keep = set(versions[-keep_versions:])
    live: set[str] = set()
    for v in keep:
        snap = table._read_version(v)
        live.update(snap.all_files())

    removed_files = 0
    data_root = os.path.join(table.path, _DATA_DIR)
    for dirpath, _dirnames, filenames in os.walk(data_root, topdown=False):
        for fn in filenames:
            full = os.path.join(dirpath, fn)
            rel = os.path.relpath(full, table.path)
            if rel not in live and fn.endswith(".parquet"):
                os.unlink(full)
                removed_files += 1
        # prune empty commit dirs
        if not os.listdir(dirpath) and dirpath != data_root:
            os.rmdir(dirpath)

    removed_snapshots = 0
    for v in versions:
        if v not in keep:
            os.unlink(
                os.path.join(table.path, _LOG_DIR, f"v{v:020d}.json")
            )
            removed_snapshots += 1
    return {
        "removed_files": removed_files,
        "removed_snapshots": removed_snapshots,
        "kept_versions": sorted(keep),
    }
