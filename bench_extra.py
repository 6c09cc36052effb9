"""Supplementary operator-isolation benchmarks (guide §1.4).

``bench.py`` is the FROZEN driver contract; this file holds the extra
measurements OPTIMIZATION_r08.md cites: each fragment is evaluated
through the noop sink (computes every column of every row, discards
the result) so the timing isolates the computation from any output
sink, and each fragment is run ``--repeat`` times so first-run
codegen/JIT cost is visible separately from steady state.

Usage::

    python bench_extra.py                 # all fragments, sf0.1
    python bench_extra.py --only minhash_band_table --repeat 3

Prints one JSON line per fragment:
``{"fragment": ..., "times_sec": [...], "sf": ...}``.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def build(cores: str):
    from kafka_jdbc_sink_connector_spark.session import build_session

    n = int(cores) if cores.isdigit() else 32
    return build_session(
        app_name="bench_extra",
        cores=cores,
        shuffle_partitions=n * 2,
        extra_conf={
            "spark.driver.memory": os.environ.get("SPARK_DRIVER_MEM", "16g"),
            "spark.sql.files.maxPartitionBytes": str(16 * 1024 * 1024),
        },
    )


def noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def fragments(spark, sf_dir):
    """{name: zero-arg callable returning a DataFrame} — the operator
    fragments whose isolation OPTIMIZATION_r08.md cites."""
    from pyspark.sql import functions as F

    from kafka_jdbc_sink_connector_spark.operators import (
        docdedup,
        similarity,
        text,
    )

    docs = lambda: spark.read.parquet(  # noqa: E731
        os.path.join(sf_dir, "documents.parquet")
    )
    emb = lambda: spark.read.parquet(  # noqa: E731
        os.path.join(sf_dir, "embeddings.parquet")
    )
    return {
        # the shingle+signature pipeline (the minhash family's shared
        # hot loop: shingling, 8x md5, per-doc mins, band explode)
        "minhash_band_table": lambda: docdedup.minhash_band_table(docs()),
        # full candidate-pair query (adds the band self-join + count)
        "minhash_lsh_pairs": lambda: docdedup.minhash_lsh_candidates(docs()),
        # tokenize + per-token digest + 32 bit-vote sums
        "simhash_table": lambda: text.simhash32_table(docs()),
        # sign-LSH bucketing (8 plane-dot folds per vector)
        "lsh_buckets": lambda: similarity.lsh_buckets(emb(), 8, 42, dim=64),
        # bucketed candidates + exact-cosine verify
        "cosine_dup_pairs": lambda: similarity.cosine_dup_pairs(
            emb(), threshold=0.3, n_planes=8, dim=64, round_digits=4
        ),
        # shingle inverted index (contamination / jaccard feedstock)
        "shingle_index": lambda: docdedup.shingle_index(docs()),
        # quality features scan (single-pass codegen reference point)
        "quality_columns": lambda: docs().select(
            "doc_id", *text.quality_columns(F.col("text")).values()
        ),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=SF_DIR)
    ap.add_argument("--cpus", default=CPUS)
    ap.add_argument("--repeat", type=int, default=3)
    ap.add_argument("--only", default=None)
    args = ap.parse_args()
    spark = build(args.cpus)
    try:
        frags = fragments(spark, args.sf_dir)
        for name, fn in frags.items():
            if args.only and name != args.only:
                continue
            times = []
            for _ in range(args.repeat):
                t0 = time.monotonic()
                noop(fn())
                times.append(round(time.monotonic() - t0, 3))
            print(json.dumps({
                "fragment": name,
                "times_sec": times,
                "sf_dir": args.sf_dir,
                "cpus": args.cpus,
            }), flush=True)
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
