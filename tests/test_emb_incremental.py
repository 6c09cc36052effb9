"""Incremental semantic dedup against the persisted sign-LSH bucket
index (``operators/incremental.EmbeddingDedupIndex``) — the
embedding-space sibling of the MinHash index: per-batch broadcast
probe, exact-cosine verify, atomic watermarked appends, batch-order
invariance vs the corpus-wide ``cosine_dup_pairs`` oracle.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from kafka_jdbc_sink_connector_spark.operators import incremental
from kafka_jdbc_sink_connector_spark.operators.similarity import (
    cosine_dup_pairs,
)

SF = "/root/testdata/sf0.001"
THRESH = 0.3  # synthetic corpus max pairwise cosine ~0.51


@pytest.fixture(scope="module")
def emb(spark):
    df = spark.read.parquet(os.path.join(SF, "embeddings.parquet")).cache()
    yield df
    # unpersist: Spark's cache manager plan-matches, so leaving this
    # cached would hijack OTHER suites' raw parquet reads of the same
    # file (plan tests then see InMemoryTableScan, not PushedFilters)
    df.unpersist()


def _corpus_pairs(emb):
    return {
        (r["id_a"], r["id_b"], r["cos_sim"])
        for r in cosine_dup_pairs(
            emb, threshold=THRESH, n_planes=8, dim=64, round_digits=4
        ).collect()
    }


def _mk(spark, path, **kw):
    kw.setdefault("n_buckets", 4)
    kw.setdefault("n_planes", 8)
    kw.setdefault("dim", 64)
    kw.setdefault("threshold", THRESH)
    return incremental.EmbeddingDedupIndex.create(spark, str(path), **kw)


@pytest.mark.parametrize("n_batches", [2, 3])
def test_union_over_batches_equals_corpus_wide(
    spark, tmp_path, emb, n_batches
):
    idx = _mk(spark, tmp_path / "idx")
    got = set()
    for b in range(n_batches):
        p = idx.add_and_find_dups(
            emb.filter(F.col("vec_id") % n_batches == b), batch_id=b
        )
        rows = {(r["id_a"], r["id_b"], r["cos_sim"]) for r in p.collect()}
        assert not rows & got, "a pair emitted by two batches"
        got |= rows
    assert got == _corpus_pairs(emb)


def test_batch_order_invariance(spark, tmp_path, emb):
    """Processing the batches in the REVERSE order yields the same
    corpus-wide set — each pair is emitted by whichever batch
    completes it."""
    idx = _mk(spark, tmp_path / "idx")
    got = set()
    for b in (1, 0):
        p = idx.add_and_find_dups(
            emb.filter(F.col("vec_id") % 2 == b), batch_id=b
        )
        got |= {(r["id_a"], r["id_b"], r["cos_sim"]) for r in p.collect()}
    assert got == _corpus_pairs(emb)


def test_replayed_batch_skips_reappend(spark, tmp_path, emb):
    idx = _mk(spark, tmp_path / "idx")
    b0 = emb.filter(F.col("vec_id") % 2 == 0)
    p_first = idx.add_and_find_dups(b0, batch_id=0).collect()
    n_indexed = idx.read_index().count()
    # crash-replay of the same (source, batch): identical pairs, no
    # double-indexing
    p_again = idx.add_and_find_dups(b0, batch_id=0).collect()
    assert sorted(map(tuple, p_again)) == sorted(map(tuple, p_first))
    assert idx.read_index().count() == n_indexed
    # the re-probe after a replay must not have polluted later results
    p1 = idx.add_and_find_dups(
        emb.filter(F.col("vec_id") % 2 == 1), batch_id=1
    )
    got = {(r["id_a"], r["id_b"], r["cos_sim"]) for r in p1.collect()}
    got |= {(r["id_a"], r["id_b"], r["cos_sim"]) for r in p_first}
    assert got == _corpus_pairs(emb)


def test_load_roundtrip_pins_geometry(spark, tmp_path, emb):
    _mk(spark, tmp_path / "idx", threshold=0.25, n_planes=8)
    idx = incremental.EmbeddingDedupIndex.load(
        spark, str(tmp_path / "idx")
    )
    assert idx.threshold == 0.25 and idx.n_planes == 8
    assert idx.dim == 64 and idx.round_digits == 4
