"""Streaming semantic dedup (streaming/dedup.EmbDedupStreamRunner):
the embedding sibling of the MinHash streaming suite — corpus
equivalence, later-arrival loser rule, and exactly-once across the
(index, pairs) table pair for every crash window.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from kafka_jdbc_sink_connector_spark.operators.incremental import (
    EmbeddingDedupIndex,
)
from kafka_jdbc_sink_connector_spark.operators.similarity import (
    cosine_dup_pairs,
)
from kafka_jdbc_sink_connector_spark.streaming.dedup import (
    EmbDedupStreamRunner,
)

SF = "/root/testdata/sf0.001"
THRESH = 0.3


@pytest.fixture(scope="module")
def emb(spark):
    df = spark.read.parquet(os.path.join(SF, "embeddings.parquet")).cache()
    yield df
    # unpersist: Spark's cache manager plan-matches, so leaving this
    # cached would hijack OTHER suites' raw parquet reads of the same
    # file (plan tests then see InMemoryTableScan, not PushedFilters)
    df.unpersist()


def _runner(spark, tmp_path, **kw):
    idx = EmbeddingDedupIndex.create(
        spark, str(tmp_path / "idx"), n_buckets=4, n_planes=8, dim=64,
        threshold=THRESH, round_digits=4,
    )
    pairs = EmbDedupStreamRunner.create_pairs_table(
        spark, str(tmp_path / "pairs"), n_buckets=4
    )
    return EmbDedupStreamRunner(idx, pairs, str(tmp_path / "ckpt"), **kw)


def _pair_set(table):
    return {
        (r["id_a"], r["id_b"], r["cos_sim"])
        for r in table.refresh().read().collect()
    }


def test_emb_stream_equals_corpus_wide(spark, emb, tmp_path):
    corpus = {
        tuple(r)
        for r in cosine_dup_pairs(
            emb, threshold=THRESH, n_planes=8, dim=64, round_digits=4
        ).collect()
    }
    runner = _runner(spark, tmp_path)
    for b in range(3):
        runner.process_batch(emb.filter(F.col("vec_id") % 3 == b), b)
    assert _pair_set(runner.pairs_table) == corpus
    assert sum(r[1] for r in runner.results) == emb.count()
    # drop_doc is the later arrival: max batch, larger id on a tie
    for r in runner.pairs_table.refresh().read().collect():
        a, b_, drop, bid = r["id_a"], r["id_b"], r["drop_doc"], r["batch_id"]
        assert drop in (a, b_)
        assert bid == max(a % 3, b_ % 3)
        if a % 3 != b_ % 3:
            assert drop % 3 == bid  # the batch-side doc loses
        else:
            assert drop == max(a, b_)


def test_emb_replay_after_full_success_appends_nothing(
    spark, emb, tmp_path
):
    runner = _runner(spark, tmp_path)
    b0 = emb.filter(F.col("vec_id") % 2 == 0)
    runner.process_batch(b0, 0)
    before = _pair_set(runner.pairs_table)
    vi = runner.index.table.refresh().version
    vp = runner.pairs_table.refresh().version
    runner.process_batch(b0, 0)
    assert _pair_set(runner.pairs_table) == before
    assert runner.index.table.refresh().version == vi
    assert runner.pairs_table.refresh().version == vp
    assert runner.results[-1][3] is True


def test_emb_replay_between_index_and_pairs_commits(spark, emb, tmp_path):
    runner = _runner(spark, tmp_path)
    b0 = emb.filter(F.col("vec_id") % 2 == 0)
    runner.process_batch(b0, 0)
    b1 = emb.filter(F.col("vec_id") % 2 == 1)
    # crash window: index commit lands, pairs commit never does
    runner.index.add_and_find_dups(
        b1, source_id=runner.source_id, batch_id=1
    ).collect()
    vi = runner.index.table.refresh().version
    n_idx = runner.index.read_index().count()
    runner.process_batch(b1, 1)  # replay
    assert runner.index.table.refresh().version == vi
    assert runner.index.read_index().count() == n_idx
    clean = _runner(spark, tmp_path / "clean")
    clean.process_batch(b0, 0)
    clean.process_batch(b1, 1)
    assert _pair_set(runner.pairs_table) == _pair_set(clean.pairs_table)
