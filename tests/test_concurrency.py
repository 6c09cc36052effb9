"""Optimistic-concurrency commit rebase: a writer that loses the
publish race re-targets its already-written files at the winner's
head when no semantic conflict exists (Delta/Iceberg commit-retry
protocol), and declines — cleaning up — when one does.

Reference anchor: the connector serializes writes per task and leans
on the database's transactions (JdbcDbWriter); a lake has no server
to serialize for it, so the manifest-log commit race is the engine's
replacement and needs the retry protocol.
"""

from __future__ import annotations

import os
import threading

import pytest
from pyspark.sql import types as T

from kafka_jdbc_sink_connector_spark.lake.table import (
    CommitConflict,
    LakeTable,
)

SCHEMA = T.StructType([
    T.StructField("k", T.StringType(), False),
    T.StructField("v", T.LongType(), True),
])


def _df(spark, rows):
    return spark.createDataFrame(rows, "k string, v long")


def _mk(spark, path, n_buckets=4):
    t = LakeTable.create(
        spark, path, SCHEMA, n_buckets=n_buckets, key_fields=["k"]
    )
    t.overwrite(_df(spark, [(f"k{i}", i) for i in range(20)]))
    return t


def test_concurrent_appends_both_commit(spark, tmp_path):
    p = str(tmp_path / "t")
    t1 = _mk(spark, p)
    t2 = LakeTable.load(spark, p)  # same head, independent handle
    t1.commit_append(t1.with_bucket(_df(spark, [("x1", 101)])))
    # t2 is stale: loses the race at v2, rebases, publishes v3
    snap = t2.commit_append(t2.with_bucket(_df(spark, [("x2", 102)])))
    assert snap.version == 3 and snap.parent == 2
    rows = {r["k"]: r["v"] for r in LakeTable.load(spark, p).read().collect()}
    assert rows["x1"] == 101 and rows["x2"] == 102 and len(rows) == 22
    # both commits' footer stats survived the rebase
    live = set(snap.files())
    assert set(snap.file_stats) >= live


def test_append_rebase_respects_exactly_once(spark, tmp_path):
    p = str(tmp_path / "t")
    t1 = _mk(spark, p)
    t2 = LakeTable.load(spark, p)
    t1.commit_append(
        t1.with_bucket(_df(spark, [("a1", 1)])), source_id="s", batch_id=7
    )
    with pytest.raises(CommitConflict, match="exactly-once"):
        t2.commit_append(
            t2.with_bucket(_df(spark, [("a2", 2)])),
            source_id="s", batch_id=7,
        )
    # the loser's data files were cleaned up: every parquet on disk is
    # referenced by the head snapshot
    head = LakeTable.load(spark, p)
    referenced = {os.path.join(p, f) for f in head.snapshot.all_files()}
    on_disk = {
        os.path.join(dp, fn)
        for dp, _dn, fns in os.walk(os.path.join(p, "data"))
        for fn in fns if fn.endswith(".parquet")
    }
    assert on_disk == referenced
    # a LATER batch id from the same source still rebases fine
    snap = t2.refresh().commit_append(
        t2.with_bucket(_df(spark, [("a3", 3)])), source_id="s", batch_id=8
    )
    assert snap.applied_batches["s"] == 8


def test_concurrent_rewrites_disjoint_buckets(spark, tmp_path):
    p = str(tmp_path / "t")
    t1 = _mk(spark, p)
    t2 = LakeTable.load(spark, p)
    b0 = t1.read(buckets=[0], include_bucket=True)
    b1 = t2.read(buckets=[1], include_bucket=True)
    from pyspark.sql import functions as F

    t1.commit_rewrite(b0.withColumn("v", F.col("v") + 1000), [0])
    # t2 rewrites a DIFFERENT bucket from a stale snapshot → rebases
    snap = t2.commit_rewrite(b1.withColumn("v", F.col("v") + 2000), [1])
    assert snap.version == 3
    rows = {r["k"]: r["v"] for r in LakeTable.load(spark, p).read().collect()}
    orig = {f"k{i}": i for i in range(20)}
    hit0 = {r["k"] for r in b0.collect()}
    hit1 = {r["k"] for r in b1.collect()}
    assert hit0 and hit1  # both buckets non-empty, test is meaningful
    for k, v in orig.items():
        want = v + 1000 if k in hit0 else v + 2000 if k in hit1 else v
        assert rows[k] == want, (k, rows[k], want)


def test_concurrent_rewrites_same_bucket_decline(spark, tmp_path):
    p = str(tmp_path / "t")
    t1 = _mk(spark, p)
    t2 = LakeTable.load(spark, p)
    b0 = t1.read(buckets=[0], include_bucket=True)
    from pyspark.sql import functions as F

    t1.commit_rewrite(b0.withColumn("v", F.col("v") + 1000), [0])
    with pytest.raises(CommitConflict, match="touched rewritten bucket"):
        t2.commit_rewrite(
            t2.read(buckets=[0], include_bucket=True)
            .withColumn("v", F.col("v") + 2000),
            [0],
        )
    # winner's update intact
    rows = {r["k"]: r["v"] for r in LakeTable.load(spark, p).read().collect()}
    hit0 = {r["k"] for r in b0.collect()}
    assert all(rows[k] == orig + 1000 for k, orig in
               ((f"k{i}", i) for i in range(20)) if k in hit0)


def test_retries_disabled_restores_strict_behavior(spark, tmp_path):
    p = str(tmp_path / "t")
    t1 = _mk(spark, p)
    t2 = LakeTable.load(spark, p)
    t2.max_commit_retries = 0
    t1.commit_append(t1.with_bucket(_df(spark, [("x1", 1)])))
    with pytest.raises(CommitConflict):
        t2.commit_append(t2.with_bucket(_df(spark, [("x2", 2)])))


def test_threaded_append_storm(spark, tmp_path):
    """N writers race unsynchronized from the same stale head; every
    one lands (append rebase is unconditional) and no rows are lost."""
    p = str(tmp_path / "t")
    _mk(spark, p)
    n = 4
    errs: list[Exception] = []

    def writer(i: int):
        try:
            t = LakeTable.load(spark, p)
            t.commit_append(
                t.with_bucket(_df(spark, [(f"w{i}", 1000 + i)])),
                source_id=f"src{i}", batch_id=0,
            )
        except Exception as e:  # pragma: no cover - failure diagnostics
            errs.append(e)

    threads = [threading.Thread(target=writer, args=(i,)) for i in range(n)]
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    assert not errs, errs
    t = LakeTable.load(spark, p)
    assert t.version == 1 + n
    rows = {r["k"]: r["v"] for r in t.read().collect()}
    assert all(rows[f"w{i}"] == 1000 + i for i in range(n))
    assert all(
        t.snapshot.applied_batches[f"src{i}"] == 0 for i in range(n)
    )


def test_rebucket_races_decline_both_directions(spark, tmp_path):
    """A bucket-count change can't silently merge with concurrent
    commits: the stale side always declines, whichever wins."""
    from kafka_jdbc_sink_connector_spark.lake.maintenance import rebucket

    p = str(tmp_path / "t")
    t1 = _mk(spark, p)
    t2 = LakeTable.load(spark, p)
    rebucket(t1, 8)
    with pytest.raises(CommitConflict, match="layout"):
        t2.commit_append(t2.with_bucket(_df(spark, [("z", 1)])))

    p2 = str(tmp_path / "t2")
    t1 = _mk(spark, p2)
    t2 = LakeTable.load(spark, p2)
    t1.commit_append(t1.with_bucket(_df(spark, [("y", 2)])))
    with pytest.raises(CommitConflict, match="layout"):
        rebucket(t2, 8)
    # winner's append intact, layout unchanged
    t = LakeTable.load(spark, p2)
    assert t.snapshot.n_buckets == 4
    assert {r["k"] for r in t.read().collect()} >= {"y"}


@pytest.mark.parametrize("seed", [11, 23, 47])
def test_randomized_stale_commit_schedules(spark, tmp_path, seed):
    """Deterministic fuzz over stale-handle commit schedules: a mix of
    appends and single-bucket rewrites issued from handles of varying
    staleness. Invariants: (a) every operation either lands or raises
    CommitConflict — never silently vanishes; (b) the final state
    reflects exactly the landed operations; (c) every parquet on disk
    is referenced by some retained snapshot (losers cleaned up);
    (d) the manifest chain is unbroken."""
    import random

    rng = random.Random(seed)
    p = str(tmp_path / "t")
    _mk(spark, p)  # k0..k19 = 0..19
    expected = {f"k{i}": i for i in range(20)}
    landed, declined = 0, 0

    for step in range(10):
        op = rng.choice(["append", "rewrite", "append_stale",
                         "rewrite_stale"])
        stale = op.endswith("_stale")
        t = LakeTable.load(spark, p)
        if stale:
            # simulate a writer that lost a race: another commit lands
            # between this handle's load and its publish
            other = LakeTable.load(spark, p)
            other.commit_append(
                other.with_bucket(_df(spark, [(f"bg{step}", 7000 + step)]))
            )
            expected[f"bg{step}"] = 7000 + step
        try:
            if op.startswith("append"):
                t.commit_append(
                    t.with_bucket(_df(spark, [(f"n{step}", 1000 + step)]))
                )
                expected[f"n{step}"] = 1000 + step
            else:
                b = rng.randrange(4)
                from pyspark.sql import functions as F
                pre = {r["k"] for r in t.read(buckets=[b]).collect()}
                t.commit_rewrite(
                    t.read(buckets=[b], include_bucket=True)
                    .withColumn("v", F.col("v") + 100000),
                    [b],
                )
                for k in pre:
                    expected[k] += 100000
            landed += 1
        except CommitConflict:
            declined += 1  # allowed only for stale rewrites
            assert op == "rewrite_stale", op
    assert landed >= 6  # schedules aren't degenerate

    t = LakeTable.load(spark, p)
    got = {r["k"]: r["v"] for r in t.read().collect()}
    assert got == expected
    # no orphan files, unbroken parent chain
    live = set()
    versions = t.history()
    for v in versions:
        live.update(t._read_version(v).all_files())
    on_disk = {
        os.path.relpath(os.path.join(dp, fn), p)
        for dp, _dn, fns in os.walk(os.path.join(p, "data"))
        for fn in fns if fn.endswith(".parquet")
    }
    assert on_disk <= live
    for v in versions[1:]:
        assert t._read_version(v).parent in versions


def test_compaction_racing_delta_commit_declines(spark, tmp_path):
    """A compaction (bucket rewrite folding deltas) that loses the
    race to a NEW delta commit on the same buckets must decline —
    rebasing would silently drop the concurrent batch's changes."""
    from pyspark.sql import functions as F

    from kafka_jdbc_sink_connector_spark.lake.maintenance import compact
    from kafka_jdbc_sink_connector_spark.lake.mor import (
        DELTA_DEL,
        DELTA_DEL_OFF,
        DELTA_UPS,
        DELTA_UPS_OFF,
    )

    p = str(tmp_path / "t")
    t1 = LakeTable.create(spark, p, SCHEMA, n_buckets=2, key_fields=["k"])
    t1.overwrite(_df(spark, [(f"k{i}", i) for i in range(10)]))
    meta = {"soft": False, "hard": False, "upd_only": False,
            "guard": [], "overlay_cols": []}

    def delta_rows(t, rows, off):
        return t.with_bucket(_df(spark, rows)).select(
            "k",
            F.struct(F.col("v").alias("v")).alias(DELTA_UPS),
            F.lit(off).cast("long").alias(DELTA_UPS_OFF),
            F.lit(None).cast("struct<v:long>").alias(DELTA_DEL),
            F.lit(None).cast("long").alias(DELTA_DEL_OFF),
            F.col("__bucket"),
        )

    t1.commit_delta(delta_rows(t1, [("k1", 100)], 1), mor_meta=meta)
    # compactor loads, then a writer lands another delta first
    compactor = LakeTable.load(spark, p)
    writer = LakeTable.load(spark, p)
    writer.commit_delta(delta_rows(writer, [("k2", 200)], 2),
                        mor_meta=meta)
    with pytest.raises(CommitConflict):
        compact(compactor, min_files=1)
    # nothing lost: both deltas resolve; a fresh compaction succeeds
    t = LakeTable.load(spark, p)
    rows = {r["k"]: r["v"] for r in t.read().collect()}
    assert rows["k1"] == 100 and rows["k2"] == 200
    compact(t, min_files=1)
    assert not t.snapshot.delta_buckets
    rows = {r["k"]: r["v"] for r in t.read().collect()}
    assert rows["k1"] == 100 and rows["k2"] == 200
