"""Key/bucket/hash column expressions (all JVM-side, codegen'd).

These are the scale levers: the target table is bucketed by
``xxhash64(first pk field) % n_buckets`` so a conversation always lives
in exactly one bucket, MERGE rewrites only affected buckets, and the
dedup shuffle partitions evenly even under Zipf-skewed hot keys.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: name of the engine-managed bucket column persisted in the lake table
BUCKET_COL = "__bucket"


def bucket_expr(col: str | Column, n_buckets: int) -> Column:
    """Deterministic hash bucket in [0, n_buckets).

    Bucketing on the *first* pk field only (conv_id) keeps all turns of
    a conversation co-located, which makes per-conversation reads and
    compactions single-bucket operations.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.pmod(F.xxhash64(c), F.lit(n_buckets)).cast("int")


def key_struct(pk_fields: tuple[str, ...] | list[str]) -> Column:
    """Composite key as an orderable/comparable struct column."""
    return F.struct(*[F.col(f) for f in pk_fields])


def det_unit(*cols: Column | str, seed: int = 42, salt: int = 0) -> Column:
    """Deterministic pseudo-uniform double in [0, 1).

    A pure function of the input columns + seed (no rand()), so
    generated datasets are identical across runs, partitionings and
    cluster sizes — required for replay/idempotence tests.
    """
    h = F.xxhash64(*cols, F.lit(seed), F.lit(salt))
    # map signed 64-bit hash onto [0, 1)
    return (h.cast("double") / F.lit(float(2**64))) + F.lit(0.5)
