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


def cluster_by(
    table: LakeTable,
    cols: list[str],
    files_per_bucket: int = 4,
    buckets: list[int] | None = None,
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
    """
    if not cols:
        raise ValueError("cluster_by needs at least one column")
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
    arranged = data.repartitionByRange(
        n_parts, F.col(BUCKET_COL), *[F.col(c) for c in cols]
    ).sortWithinPartitions(BUCKET_COL, *cols)
    table.commit_rewrite(
        arranged,
        target,
        stats={"clustered_by": list(cols)},
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
