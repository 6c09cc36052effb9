"""Similarity search over embedding columns (``array<float>``).

* :func:`knn_bruteforce` — exact cosine top-k for a (small) query set:
  broadcast the queries, one scan over the corpus, per-query top-k via
  window. The baseline every ANN variant is measured against.
* :func:`lsh_buckets` / :func:`lsh_ann_candidates` — random-hyperplane
  (sign) LSH: ``n_planes`` deterministic hyperplanes (seeded, generated
  driver-side so the plane constants are plain literals in the plan —
  and reproducible in the SQL oracle); bucket = sign-bit int. ANN =
  exact rerank within the query's bucket only.

All arithmetic is JVM-side (``zip_with``/``aggregate`` fold in element
order, cast to double) — deterministic and engine-portable.

Scale: brute force is O(corpus × queries) but embarrassingly parallel
and shuffle-free until the final top-k (window over query_id — small).
LSH cuts the scan to one bucket per query; at 100 TB the bucketed
corpus would be written bucket-partitioned so a query reads one
partition (same layout idea as the lake table's key buckets).
"""

from __future__ import annotations

import hashlib
import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _det_unit_floats(seed: int, n: int) -> list[float]:
    """Deterministic pseudo-uniform floats in [-1, 1) from md5 — no
    RNG state, reproducible anywhere (incl. the SQL oracle)."""
    out = []
    for i in range(n):
        h = hashlib.md5(f"{seed}:{i}".encode()).hexdigest()
        out.append(int(h[:8], 16) / float(2**31) - 1.0)
    return out


def hyperplanes(n_planes: int, dim: int, seed: int = 42) -> list[list[float]]:
    return [
        _det_unit_floats(seed * 1000 + p, dim) for p in range(n_planes)
    ]


def dot(a, b):
    # NOTE measured non-win (r8): unrolling this fold into a flat
    # 64-term codegen expression chain (bit-identical order) made
    # every consumer 5-10x SLOWER — the generated mega-methods blow
    # past codegen/JIT limits and the per-query compile cost dwarfs
    # the interpreted lambda overhead at any tested scale. Keep the
    # HOF fold.
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a):
    return F.sqrt(
        F.aggregate(
            a, F.lit(0.0),
            lambda acc, v: acc + v.cast("double") * v.cast("double"),
        )
    )


def cosine(a, b):
    return dot(a, b) / (norm(a) * norm(b))


def knn_bruteforce(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 6,
) -> DataFrame:
    """(query_id, neighbor_id, cos_sim, rank) — exact top-k by cosine,
    self-matches excluded; ties broken by neighbor id for determinism.
    Each side's norm is hoisted out of the O(corpus × queries) pair
    loop (same double ops in the same order as computing them per
    pair, so the rounded values are bit-identical).
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"),
        norm(F.col(vec_col)).alias("__qn"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"),
        norm(F.col(vec_col)).alias("__cn"),
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                dot(F.col("qv"), F.col("cv"))
                / (F.col("__qn") * F.col("__cn")),
                round_digits,
            ).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos_sim", "rank")
    )


def plane_dot(vec_col, plane: list[float]):
    """Dot of an array column with a literal plane, as an ordered fold
    (element i × constant i) — expressible identically in SQL. (An
    unrolled per-element expression chain measured far slower — see
    the note on :func:`dot`.)"""
    return F.aggregate(
        F.zip_with(
            vec_col,
            F.array(*[F.lit(float(w)) for w in plane]),
            lambda x, w: x.cast("double") * w,
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def lsh_buckets(
    vectors: DataFrame,
    n_planes: int = 8,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    dot_round: int = 6,
) -> DataFrame:
    """(vec_id, bucket) — sign-LSH bucket id in [0, 2^n_planes).

    The plane dot is rounded to ``dot_round`` digits before the sign
    test so bucket membership at the zero boundary is stable across
    engines/summation orders (a |dot| below the rounding granularity
    lands on +0.0 on both sides); the SQL oracle applies the same
    round()."""
    planes = hyperplanes(n_planes, dim, seed)
    bucket = F.lit(0).cast("long")
    for p, plane in enumerate(planes):
        bucket = bucket + F.when(
            F.round(plane_dot(F.col(vec_col), plane), dot_round) >= 0,
            F.lit(1 << p).cast("long"),
        ).otherwise(F.lit(0).cast("long"))
    return vectors.select(F.col(id_col), bucket.alias("bucket"))


def cosine_dup_pairs(
    vectors: DataFrame,
    threshold: float = 0.9,
    n_planes: int = 8,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    round_digits: int = 4,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: candidates share a
    sign-LSH bucket (2^n_planes buckets ⇒ ~1/2^n_planes of all pairs
    scored), then exact cosine verifies. Returns (id_a, id_b, cos_sim)
    with id_a < id_b and cos_sim >= threshold.

    Note the standard LSH recall trade: a true near-dup pair split
    across buckets is missed; more bands (running with several seeds
    and unioning) raises recall.
    """
    b = lsh_buckets(vectors, n_planes, seed, id_col, vec_col, dim)
    # norm computed ONCE per vector before the bucket self-join — the
    # per-pair expression then multiplies the two prematerialized
    # norms, which is the identical sequence of double ops as
    # computing them inside the pair row (cosine() would), so the
    # rounded values are bit-equal while the O(pairs) work drops to
    # one dot per pair
    v = vectors.join(b, id_col).withColumn(
        "__nrm", norm(F.col(vec_col))
    )
    a = v.select(
        F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"),
        F.col("__nrm").alias("na"), "bucket",
    )
    c = v.select(
        F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"),
        F.col("__nrm").alias("nb"), "bucket",
    )
    return (
        a.join(c, "bucket")
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            F.round(
                dot(F.col("va"), F.col("vb"))
                / (F.col("na") * F.col("nb")),
                round_digits,
            ).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= threshold)
    )


def ivf_codebook(n_cells: int, dim: int, seed: int = 7) -> list[list[float]]:
    """Deterministic coarse-quantizer codebook (md5-seeded vectors).

    Production IVF learns the codebook with k-means over a corpus
    sample; here it is a fixed pseudo-random codebook so the cell
    assignment is a pure literal expression — reproducible in the SQL
    oracle and stable across engines (the IVF *plumbing* — assignment,
    inverted cells, multi-probe rerank — is what scales; swapping in
    k-means centroids is a drop-in)."""
    return [_det_unit_floats(seed * 1000 + c, dim) for c in range(n_cells)]


def kmeans_codebook(
    vectors: DataFrame,
    n_cells: int = 8,
    dim: int = 64,
    iters: int = 4,
    seed: int = 7,
    sample: int = 4096,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 6,
) -> list[list[float]]:
    """Data-dependent IVF codebook: deterministic seeded Lloyd k-means
    over a corpus sample — the drop-in :func:`ivf_codebook` replacement
    real recall needs at scale (a random codebook's cells ignore where
    the data actually lives; trained centroids track its density).

    Deterministic by construction, no RNG state and no wall clock:

    * the sample is the ``sample`` ids smallest by
      ``md5(seed:id)`` — a seeded pseudo-random draw any engine
      reproduces;
    * init centroids are the first ``n_cells`` sample vectors in that
      hash order (k-means++-style spread matters little at these cell
      counts; determinism matters more);
    * exactly ``iters`` Lloyd rounds — assignment is the same
      codegen'd argmin the read path uses (:func:`_cell_structs`),
      the recompute is one ``posexplode`` + per-(cell, dim) average
      (sample-sized, never the corpus), centroids rounded to
      ``round_digits`` so sub-rounding float-summation noise cannot
      leak into the literal codebook;
    * an emptied cell keeps its previous centroid (no resampling —
      that would re-order the randomness).

    The returned plain ``list[list[float]]`` plugs into
    :func:`ivf_assign` / :func:`ivf_ann` via their ``codebook``
    parameter; assignment stays a pure literal expression, so the
    100-TB plumbing (write-partition by cell, multi-probe rerank) is
    unchanged. Driver-side cost: ``iters`` jobs over ``sample``
    vectors plus an (n_cells × dim) collect per round — independent
    of corpus size.
    """
    v = vectors.select(
        F.col(id_col).alias("_id"), F.col(vec_col).alias("_v")
    )
    v = (
        v.orderBy(
            F.md5(F.concat(F.lit(f"{seed}:"),
                           F.col("_id").cast("string"))),
            F.col("_id"),
        )
        .limit(sample)
        .localCheckpoint()
    )
    cb = [
        [round(float(x), round_digits) for x in r["_v"]]
        for r in v.limit(n_cells).collect()
    ]
    if len(cb) < n_cells:
        raise ValueError(
            f"corpus has only {len(cb)} vectors, need >= {n_cells}"
        )
    for _ in range(iters):
        cell = F.least(*_cell_structs(F.col("_v"), cb, round_digits))["i"]
        means = (
            # two selects: a generator (posexplode) alongside the
            # struct-argmin in ONE select makes Spark drop the struct
            # field names (FIELD_NOT_FOUND on `i`)
            v.select(cell.alias("cell"), "_v")
            .select("cell", F.posexplode("_v").alias("pos", "val"))
            .groupBy("cell", "pos")
            .agg(F.avg(F.col("val").cast("double")).alias("m"))
            .collect()
        )
        new = [list(c) for c in cb]
        for r in means:
            new[r["cell"]][r["pos"]] = round(r["m"], round_digits)
        cb = new
    return cb


def _cell_dist(vec_col, centroid: list[float]):
    """Squared L2 distance to a literal centroid (ordered fold,
    engine-portable like plane_dot)."""
    return F.aggregate(
        F.zip_with(
            vec_col,
            F.array(*[F.lit(float(c)) for c in centroid]),
            lambda x, c: (x.cast("double") - c) * (x.cast("double") - c),
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _cell_structs(vec_col, codebook: list[list[float]], round_digits: int):
    """Per-cell (rounded distance, cell id) structs — lexicographic
    order = nearest-cell order; rounding keeps the argmin stable
    across engines at float boundaries."""
    return [
        F.struct(
            F.round(_cell_dist(vec_col, c), round_digits).alias("d"),
            F.lit(i).alias("i"),
        )
        for i, c in enumerate(codebook)
    ]


def ivf_assign(
    vectors: DataFrame,
    n_cells: int = 8,
    seed: int = 7,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    round_digits: int = 6,
    codebook: list[list[float]] | None = None,
) -> DataFrame:
    """(vec_id, cell) — nearest-codebook-cell assignment (IVF lists).
    At 100 TB the corpus would be *written* partitioned by cell, so a
    probe reads n_probe partitions (same layout idea as the lake
    buckets). ``codebook`` swaps in trained centroids
    (:func:`kmeans_codebook`); default is the seeded grid."""
    cb = codebook or ivf_codebook(n_cells, dim, seed)
    cell = F.least(*_cell_structs(F.col(vec_col), cb, round_digits))["i"]
    return vectors.select(F.col(id_col), cell.alias("cell"))


def ivf_ann(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_cells: int = 8,
    n_probe: int = 2,
    seed: int = 7,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    round_digits: int = 6,
    codebook: list[list[float]] | None = None,
) -> DataFrame:
    """IVF approximate top-k: queries probe their ``n_probe`` nearest
    cells and exact-cosine rerank only those inverted lists
    (cost ≈ n_probe/n_cells of the brute-force scan; recall grows
    with n_probe — the standard IVF trade). ``codebook`` swaps in
    trained centroids (:func:`kmeans_codebook`)."""
    cb = codebook or ivf_codebook(n_cells, dim, seed)
    c = corpus.join(ivf_assign(corpus, n_cells, seed, id_col, vec_col,
                               dim, round_digits, codebook=cb),
                    id_col).select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cv"),
        norm(F.col(vec_col)).alias("__cn"),
        "cell",
    )
    q_cells = F.slice(
        F.array_sort(
            F.array(*_cell_structs(F.col(vec_col), cb, round_digits))
        ),
        1,
        n_probe,
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qv"),
        norm(F.col(vec_col)).alias("__qn"),
        F.explode(q_cells).alias("qc"),
    ).select("query_id", "qv", "__qn", F.col("qc")["i"].alias("cell"))
    scored = (
        c.join(F.broadcast(q), "cell")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                dot(F.col("qv"), F.col("cv"))
                / (F.col("__qn") * F.col("__cn")),
                6,
            ).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos_sim", "rank")
    )


def lsh_ann_candidates(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_planes: int = 8,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
) -> DataFrame:
    """Approximate top-k: exact cosine rerank restricted to the
    query's LSH bucket (recall < 1, cost ≈ 1/2^n_planes of the scan).
    """
    cb = lsh_buckets(corpus, n_planes, seed, id_col, vec_col, dim)
    qb = lsh_buckets(queries, n_planes, seed, id_col, vec_col, dim)
    c = corpus.join(cb, id_col).select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cv"),
        norm(F.col(vec_col)).alias("__cn"),
        "bucket",
    )
    q = queries.join(qb, id_col).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"),
        norm(F.col(vec_col)).alias("__qn"), "bucket",
    )
    scored = (
        c.join(F.broadcast(q), "bucket")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                dot(F.col("qv"), F.col("cv"))
                / (F.col("__qn") * F.col("__cn")),
                6,
            ).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos_sim", "rank")
    )
