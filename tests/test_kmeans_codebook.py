"""Trained IVF codebook (``similarity.kmeans_codebook``): seeded
deterministic Lloyd k-means whose centroids replace the seeded-grid
codebook behind the same ``ivf_assign``/``ivf_ann`` API.

On the honest metric — recall at MATCHED scanned-candidate budget —
the trained codebook must dominate the grid. Raw recall at equal
``n_probe`` is the wrong yardstick: the random grid leaves most cells
empty and piles ~2/3 of the corpus into one cell, so probing 2 of its
8 "cells" scans ~80% of the corpus (recall looks great, speedup is
gone). Balanced trained cells are what make n_probe/n_cells a real
cost model at 100 TB.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from kafka_jdbc_sink_connector_spark.operators.similarity import (
    _cell_structs,
    ivf_ann,
    ivf_assign,
    ivf_codebook,
    kmeans_codebook,
    knn_bruteforce,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    df = spark.read.parquet(os.path.join(SF, "embeddings.parquet")).cache()
    yield df
    # unpersist: Spark's cache manager plan-matches, so leaving this
    # cached would hijack OTHER suites' raw parquet reads of the same
    # file (plan tests then see InMemoryTableScan, not PushedFilters)
    df.unpersist()


def test_codebook_deterministic_and_shaped(spark, emb):
    cb1 = kmeans_codebook(emb, n_cells=8, dim=64, iters=2)
    cb2 = kmeans_codebook(emb, n_cells=8, dim=64, iters=2)
    assert cb1 == cb2
    assert len(cb1) == 8 and all(len(c) == 64 for c in cb1)
    # rounded literals only — these go into the plan as constants
    assert all(x == round(x, 6) for c in cb1 for x in c)
    # a different seed trains a different book
    assert kmeans_codebook(emb, n_cells=8, dim=64, iters=2, seed=11) != cb1


def test_codebook_needs_enough_vectors(spark):
    few = spark.createDataFrame(
        [(1, [1.0] * 4), (2, [2.0] * 4)], "vec_id long, embedding array<float>"
    )
    with pytest.raises(ValueError, match="need >= 4"):
        kmeans_codebook(few, n_cells=4, dim=4)


def test_codebook_survives_empty_cells(spark):
    # three identical vectors + one distinct: duplicate init centroids
    # empty one cell on the first round; it must keep its previous
    # centroid instead of crashing or going NaN
    rows = [(i, [1.0, 0.0]) for i in range(3)] + [(9, [0.0, 1.0])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    cb = kmeans_codebook(df, n_cells=2, dim=2, iters=3, sample=4)
    assert len(cb) == 2
    assert all(x == x and abs(x) < 1e6 for c in cb for x in c)  # finite


def _scan_stats(emb, queries, n, nq, cb, n_probe, gt):
    sizes = {
        r["cell"]: r["c"]
        for r in ivf_assign(emb, 8, codebook=cb)
        .groupBy("cell").agg(F.count("*").alias("c")).collect()
    }
    probed = queries.select(
        F.slice(
            F.array_sort(
                F.array(*_cell_structs(F.col("embedding"), cb, 6))
            ),
            1, n_probe,
        ).alias("cells")
    )
    scanned = sum(
        sizes.get(s["i"], 0)
        for r in probed.collect()
        for s in r["cells"]
    ) / (nq * n)
    got = {
        (r["query_id"], r["neighbor_id"])
        for r in ivf_ann(
            emb, queries, k=5, n_cells=8, n_probe=n_probe, codebook=cb
        ).collect()
    }
    return len(got & gt) / len(gt), scanned


def test_trained_cells_are_balanced(spark, emb):
    n = emb.count()
    cb = kmeans_codebook(emb, n_cells=8, dim=64, iters=4)
    tr = [
        r["c"]
        for r in ivf_assign(emb, 8, codebook=cb)
        .groupBy("cell").agg(F.count("*").alias("c")).collect()
    ]
    gr = [
        r["c"]
        for r in ivf_assign(emb, 8)
        .groupBy("cell").agg(F.count("*").alias("c")).collect()
    ]
    # every trained cell is populated; the grid leaves cells empty and
    # piles most of the corpus into one (measured: 8/8 vs 4/8 cells,
    # max fraction ~0.14 vs ~0.67)
    assert len(tr) == 8
    assert max(tr) / n < 0.25
    assert max(gr) / n > 0.5  # the degenerate layout being replaced


def test_trained_beats_grid_at_matched_scan_budget(spark, emb):
    """Recall ≥ the grid codebook's while scanning FEWER candidates,
    at two points on the frontier (measured on this fixture: trained
    0.74@50% vs grid 0.64@56%, and 0.91@76% vs 0.90@81%)."""
    n = emb.count()
    queries = emb.filter(F.col("vec_id") % 37 == 0)
    nq = queries.count()
    gt = {
        (r["query_id"], r["neighbor_id"])
        for r in knn_bruteforce(emb, queries, k=5).collect()
    }
    cb_tr = kmeans_codebook(emb, n_cells=8, dim=64, iters=4)
    cb_gr = ivf_codebook(8, 64)
    for np_grid, np_trained in ((1, 4), (2, 6)):
        r_g, s_g = _scan_stats(emb, queries, n, nq, cb_gr, np_grid, gt)
        r_t, s_t = _scan_stats(emb, queries, n, nq, cb_tr, np_trained, gt)
        assert r_t >= r_g, (np_grid, np_trained, r_t, r_g)
        assert s_t <= s_g, (np_grid, np_trained, s_t, s_g)
