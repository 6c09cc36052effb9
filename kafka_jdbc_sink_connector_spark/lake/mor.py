"""Merge-on-read resolution (the Hudi MOR / Iceberg v2 delete-file
idea, rebuilt on the engine's manifest log).

Copy-on-write rewrites every affected bucket per micro-batch; with
Zipf-keyed CDC most buckets are touched every batch, so steady-state
COW rewrites nearly the whole table per batch — fatal write
amplification at 100 TB. In MOR mode a batch commit writes only
**delta files**: the collapsed change set (≤1 row per key), bucketed
like the base data. Readers merge base + deltas per key; `compact()`
folds deltas back into base files, bounding read amplification.

Delta row layout (per key, per commit):

* the pk fields (top level, join/group keys),
* ``__seq`` — the committing snapshot version (total order of batches),
* ``__ups`` — the fully materialized target row (non-key columns,
  marker/audit included) the upsert would have written, or NULL,
* ``__ups_off`` — the upsert's batch offset (intra-batch order),
* ``__del`` — the soft-delete overlay values (marker, audit, retain
  fields; other columns NULL), or NULL,
* ``__del_off`` — the delete's batch offset,
* ``__bucket`` — same hash bucket as the base layout.

Resolution (per key, mirrors ``operators/merge.py``'s action table
across batch boundaries; position = (seq, offset), base row = (-1,
-inf)):

1. ``U`` = the latest delta upsert by position; valid only if the
   insert mode allows it (UPDATE mode needs a base row to match).
2. ``P`` = ``U`` if valid else the base row; no ``P`` → no output row
   (deletes match nothing).
3. ``D*`` = the **earliest** delete positioned after ``P`` — earliest,
   not latest, because the reference's "not already deleted" guard
   blocks every later delete from re-overwriting the retain fields
   (``BufferedRecords.java:287-303``).
4. soft mode: overlay ``D*``'s marker/audit/retain onto ``P`` iff the
   guard passes on ``P``'s values; hard mode: drop the row.

All resolution is declarative (aggregate + one join + array
expressions) — no Python, no windows; the delta aggregate reuses the
pk hash partitioning and deltas stay small between compactions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from kafka_jdbc_sink_connector_spark.functions.keys import BUCKET_COL

_LONG_MIN = -(2**63)

DELTA_SEQ = "__seq"
DELTA_UPS = "__ups"
DELTA_UPS_OFF = "__ups_off"
DELTA_DEL = "__del"
DELTA_DEL_OFF = "__del_off"
#: earliest delete offset in the batch for the key, regardless of its
#: position relative to the upsert — only consulted in hard-delete
#: resolution, where a delete *preceding* the batch's latest upsert
#: still removed the pre-existing row (and, under insert_mode=update,
#: kills the upsert too: UPDATE matches nothing after the DELETE)
DELTA_FIRST_DEL_OFF = "__first_del_off"


def row_struct_fields(schema: T.StructType, key_fields: list[str]) -> list[T.StructField]:
    """Non-key target columns — the payload of the __ups/__del structs."""
    return [f for f in schema.fields if f.name not in set(key_fields)]


def delta_schema(schema: T.StructType, key_fields: list[str]) -> T.StructType:
    """Read schema for delta files at the current table schema (older
    files null-backfill missing nested fields, same as base files)."""
    row_t = T.StructType(
        [T.StructField(f.name, f.dataType, True)
         for f in row_struct_fields(schema, key_fields)]
    )
    fields = [schema[k] for k in key_fields]
    fields += [
        T.StructField(DELTA_SEQ, T.LongType(), False),
        T.StructField(DELTA_UPS, row_t, True),
        T.StructField(DELTA_UPS_OFF, T.LongType(), True),
        T.StructField(DELTA_DEL, row_t, True),
        T.StructField(DELTA_DEL_OFF, T.LongType(), True),
        T.StructField(DELTA_FIRST_DEL_OFF, T.LongType(), True),
        T.StructField(BUCKET_COL, T.IntegerType(), True),
    ]
    return T.StructType(fields)


def _dels_agg(hard: bool):
    """Aggregate expression collecting each key's delete positions,
    sorted by (seq, off). Each delta row contributes its winning delete
    (the earliest after its batch's latest upsert). In hard mode a
    delete *preceding* the latest upsert also matters (it removed the
    pre-existing row before the upsert re-inserted — or, under
    insert_mode=update, failed to re-insert), so the batch's
    ``__first_del_off`` is emitted as a second entry; its overlay
    struct is NULL, which is fine — hard mode never reads it."""
    winner = F.when(
        F.col(DELTA_DEL_OFF).isNotNull(),
        F.struct(
            F.col(DELTA_SEQ).alias("seq"),
            F.col(DELTA_DEL_OFF).alias("off"),
            F.col(DELTA_DEL).alias("row"),
        ),
    )
    if not hard:
        return F.array_sort(F.collect_list(winner))
    first = F.when(
        F.col(DELTA_FIRST_DEL_OFF).isNotNull()
        & ~F.col(DELTA_FIRST_DEL_OFF).eqNullSafe(F.col(DELTA_DEL_OFF)),
        F.struct(
            F.col(DELTA_SEQ).alias("seq"),
            F.col(DELTA_FIRST_DEL_OFF).alias("off"),
            F.col(DELTA_DEL).alias("row"),
        ),
    )
    entries = F.filter(
        F.array(winner, first), lambda x: x.isNotNull()
    )
    return F.array_sort(F.flatten(F.collect_list(entries)))


#: subset-delete delta layout (``delete_as_update_key`` ⊂ pk): one row
#: per subset key per commit, carrying the batch's offset-sorted delete
#: list. Kept separate from the pk-keyed deltas because one subset
#: delete hits EVERY row sharing the subset key — resolution is a join
#: on the subset key over the already pk-resolved rows, and the winning
#: delete differs per row (earliest positioned after that row's last
#: upsert). The config guarantees the subset key contains the bucket
#: key, so sdel files bucket exactly like the rows they affect.
SDEL_LIST = "__sdlist"


def sdel_schema(schema: T.StructType, snap_key_fields, sdel_key) -> T.StructType:
    row_t = T.StructType(
        [T.StructField(f.name, f.dataType, True)
         for f in row_struct_fields(schema, list(snap_key_fields))]
    )
    entry = T.StructType(
        [T.StructField("off", T.LongType(), True),
         T.StructField("row", row_t, True)]
    )
    fields = [schema[k] for k in sdel_key]
    fields += [
        T.StructField(DELTA_SEQ, T.LongType(), False),
        T.StructField(SDEL_LIST, T.ArrayType(entry), True),
        T.StructField(BUCKET_COL, T.IntegerType(), True),
    ]
    return T.StructType(fields)


#: resolved-row position column (seq, off) — appended by
#: resolve(carry_pos=True) for the subset-delete overlay pass
P_POS = "__p_pos"


def apply_subset_overlays(
    resolved: DataFrame, sdels: DataFrame, snap
) -> DataFrame:
    """Overlay subset-key deletes on pk-resolved rows (``resolved``
    must carry ``__p_pos`` from :func:`resolve`). Per row, the winning
    delete is the earliest sdel entry positioned after the row's last
    upsert — later ones are blocked by the not-already-deleted guard,
    which is also checked against the row's CURRENT marker (a row
    already deleted in base stays untouched). Hard mode drops matched
    rows; under insert_mode=update any matching delete drops the row
    (updates never re-create it)."""
    meta = snap.mor_meta
    soft = bool(meta.get("soft"))
    hard = bool(meta.get("hard"))
    upd_only = bool(meta.get("upd_only"))
    guard = [tuple(g) for g in meta.get("guard", [])]
    guard_null = bool(meta.get("guard_null_is_not_null"))
    overlay_cols = set(meta.get("overlay_cols", []))
    skey = list(meta.get("sdel_key") or [])
    if not skey:
        return resolved.drop(P_POS)

    entries = F.transform(
        F.col(SDEL_LIST),
        lambda e: F.struct(
            F.col(DELTA_SEQ).alias("seq"),
            e["off"].alias("off"),
            e["row"].alias("row"),
        ),
    )
    agg = (
        sdels.select(*skey, entries.alias("__e"))
        .groupBy(*skey)
        .agg(F.array_sort(F.flatten(F.collect_list("__e"))).alias("__sd"))
        .select(
            *[F.col(k).alias(f"sd_{k}") for k in skey], F.col("__sd")
        )
    )
    cond = [resolved[k] == agg[f"sd_{k}"] for k in skey]
    j = resolved.join(agg, cond, "left")

    applicable = F.filter(
        F.col("__sd"),
        lambda e: F.struct(e["seq"].alias("seq"), e["off"].alias("off"))
        > F.col(P_POS),
    )
    d0 = F.get(applicable, 0)

    out_cols = [f.name for f in snap.schema.fields] + [BUCKET_COL]
    if hard:
        matched = (
            F.coalesce(F.size("__sd") > 0, F.lit(False))
            if upd_only
            else d0.isNotNull()
        )
        return j.filter(~matched).select(*out_cols)
    if not soft:
        return j.select(*out_cols)  # delete mode none: sdels never written
    guard_parts = [F.lit(False)]
    for col, value in guard:
        if value is None:
            guard_parts.append(
                F.col(col).isNotNull() if guard_null else F.lit(False)
            )
        else:
            guard_parts.append(F.col(col) != F.lit(value))
    guard_ok = guard_parts[0]
    for g in guard_parts[1:]:
        guard_ok = guard_ok | g
    overlay = d0.isNotNull() & guard_ok
    sel = []
    for c in out_cols:
        if c in overlay_cols:
            sel.append(
                F.when(overlay, d0["row"][c]).otherwise(F.col(c)).alias(c)
            )
        else:
            sel.append(F.col(c))
    return j.select(*sel)


def resolve(
    base: DataFrame, deltas: DataFrame, snap, carry_pos: bool = False
) -> DataFrame:
    """Merge base rows with delta rows → the current table state
    (with ``__bucket``). ``base`` must include ``__bucket``.
    ``carry_pos`` appends ``__p_pos`` — each output row's (seq, offset)
    position (base rows: (-1, LONG_MIN)) — for the subset-delete
    overlay pass."""
    meta = snap.mor_meta
    soft = bool(meta.get("soft"))
    hard = bool(meta.get("hard"))
    upd_only = bool(meta.get("upd_only"))
    guard = [tuple(g) for g in meta.get("guard", [])]
    guard_null = bool(meta.get("guard_null_is_not_null"))
    overlay_cols = set(meta.get("overlay_cols", []))
    keys = list(snap.key_fields)

    pos = lambda s, o: F.struct(s.alias("seq"), o.alias("off"))  # noqa: E731

    agg = deltas.groupBy(*keys).agg(
        # lexicographic max over (seq, off, row): picks the latest
        # upsert; (seq, off) is unique per key so the row never ties
        # gate on the offsets, not the structs: a hard-mode delete
        # carries a NULL overlay struct but a real position
        F.max(
            F.when(
                F.col(DELTA_UPS_OFF).isNotNull(),
                F.struct(
                    F.col(DELTA_SEQ).alias("seq"),
                    F.col(DELTA_UPS_OFF).alias("off"),
                    F.col(DELTA_UPS).alias("row"),
                ),
            )
        ).alias("__u"),
        _dels_agg(hard).alias("__dels"),
        F.max(BUCKET_COL).alias("__dbucket"),
    )

    b = base.select(
        *[F.col(c).alias(f"b_{c}") for c in base.columns],
        F.lit(True).alias("__b_exists"),
    )
    cond = [b[f"b_{k}"] == agg[k] for k in keys]
    j = b.join(agg, cond, "full_outer")

    u = F.col("__u")
    b_exists = F.col("__b_exists").isNotNull()
    u_valid = u.isNotNull()
    if upd_only:
        u_valid = u_valid & b_exists
        if hard:
            # a hard delete kills the key for good in UPDATE mode (no
            # re-insert possible) — later updates match nothing
            u_valid = u_valid & ~F.coalesce(
                F.exists(
                    "__dels",
                    lambda d: pos(d["seq"], d["off"])
                    < pos(u["seq"], u["off"]),
                ),
                F.lit(False),
            )
    p_exists = u_valid | b_exists
    p_pos = F.when(u_valid, pos(u["seq"], u["off"])).otherwise(
        pos(F.lit(-1).cast("long"), F.lit(_LONG_MIN))
    )
    after = F.filter(
        "__dels", lambda d: pos(d["seq"], d["off"]) > p_pos
    )
    d_first = F.get(after, 0)  # NULL when no delete follows P

    def p_col(c: str):
        if c in keys:
            return F.coalesce(F.col(c), F.col(f"b_{c}"))
        return F.when(u_valid, u["row"][c]).otherwise(F.col(f"b_{c}"))

    if soft:
        guard_parts = [F.lit(False)]
        for col, value in guard:
            if value is None:
                guard_parts.append(
                    p_col(col).isNotNull() if guard_null else F.lit(False)
                )
            else:
                guard_parts.append(p_col(col) != F.lit(value))
        guard_ok = guard_parts[0]
        for g in guard_parts[1:]:
            guard_ok = guard_ok | g
        overlay = d_first.isNotNull() & guard_ok
        drop = ~p_exists
    else:
        overlay = F.lit(False)
        drop = ~p_exists | (F.lit(hard) & d_first.isNotNull())

    out = []
    for f in snap.schema.fields:
        c = f.name
        if c in keys:
            expr = p_col(c)
        elif soft and c in overlay_cols:
            expr = F.when(overlay, d_first["row"][c]).otherwise(p_col(c))
        else:
            expr = p_col(c)
        out.append(expr.cast(f.dataType).alias(c))
    out.append(
        F.coalesce(F.col(f"b_{BUCKET_COL}"), F.col("__dbucket")).alias(
            BUCKET_COL
        )
    )
    if carry_pos:
        out.append(p_pos.alias(P_POS))
    return j.filter(~drop).select(*out)
