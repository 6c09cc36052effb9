"""File-level min/max data skipping for the lake (Delta/Iceberg-style).

The reference delegates range pruning to its target database's
indexes; a lake engine gets the same effect from per-file column
statistics: at commit time, harvest each written parquet file's
per-column ``min``/``max``/``null_count`` from the file FOOTER
(metadata-only — no data pages are read, exactly how Iceberg builds
its manifests) and store them in the snapshot; at read time, drop
every file whose stats prove no row can satisfy the query predicate.

Why it matters at 100 TB: CDC commits are time-ordered, so commit
files are naturally clustered on event-time/offset columns — a
"rows since T" scan touches only the recent commits' files instead
of every file in every bucket. This composes with (not replaces)
the existing bucket pruning on key equality: buckets prune the key
axis, file stats prune the time axis.

Correctness stance — every rule here is *conservative*: a file is
skipped only when its stats PROVE emptiness under the predicate;
missing stats (old snapshots, exotic types, truncated bounds) mean
"keep the file". The contract is exact:
``table.read(where=P) == table.read().filter(P)`` — the residual
predicate is always re-applied to surviving rows, so skipping can
only remove I/O, never change results. That contract is what the
driver's DuckDB oracle checks.

Spark-semantics corner cases handled conservatively:

* **NaN**: Spark orders NaN GREATER than every float, but parquet
  writers exclude NaN from min/max — so for float/double columns
  only ``=``/``in``/``<``/``<=`` may prune (an upper bound can never
  rule out hidden NaN rows matching ``>``).
* **Truncated string bounds**: parquet writers truncate long binary
  stats with prefix (min) / prefix-increment (max), both of which
  remain VALID bounds; writers that cannot produce a valid bound
  omit the stat, which pyarrow reports as ``has_min_max=False`` and
  we treat as absent.
* **Nulls**: comparisons never match NULL rows, so an all-null file
  (``null_count == rows``) is skippable for any comparison, and
  ``is_null``/``not_null`` predicates prune on the null counts
  themselves.

Reference anchor: the reference sink has no analog (range pruning
lives in Oracle's B-trees, ``JdbcAuditDbWriter.java`` just issues
MERGE); the design here is the public Delta ``stats`` / Iceberg
manifest ``lower_bounds``/``upper_bounds`` idea re-expressed for
this manifest-log lake.
"""

from __future__ import annotations

import datetime as _dt
import math
import os

from pyspark.sql import Column
from pyspark.sql import functions as F

#: cap on the number of stats-indexed columns per table, like Delta's
#: ``dataSkippingNumIndexedCols`` — keeps manifest growth bounded on
#: wide tables (first N schema columns win; the bucket column is
#: always excluded: bucket pruning already covers it)
MAX_STATS_COLS = 32

# type tags stored next to each bound so pruning never compares
# across incompatible representations
_TAG_NUM = "n"      # int/long/float/double (stored as JSON number)
_TAG_STR = "s"      # UTF-8 string (stored as str)
_TAG_BOOL = "b"     # boolean
_TAG_TS = "ts"      # timestamp -> epoch MICROS int (UTC)
_TAG_DATE = "d"     # date -> ISO string (lexicographic == chronological)

_FLOAT_PHYSICAL = {"FLOAT", "DOUBLE"}

_OPS = {"=", "==", "<", "<=", ">", ">=", "in", "is_null", "not_null"}


_EPOCH = _dt.datetime(1970, 1, 1, tzinfo=_dt.timezone.utc)


def _to_micros(v: _dt.datetime) -> int:
    # exact integer arithmetic — float .timestamp() loses sub-second
    # precision at current epochs
    if v.tzinfo is None:
        v = v.replace(tzinfo=_dt.timezone.utc)
    return (v - _EPOCH) // _dt.timedelta(microseconds=1)


def _encode_bound(v, physical_type: str):
    """Parquet-footer value -> (tag, JSON-safe value), or None when the
    type has no safe total order we can reproduce here."""
    if isinstance(v, bool):
        return _TAG_BOOL, v
    if isinstance(v, int):
        return _TAG_NUM, v
    if isinstance(v, float):
        if math.isnan(v):
            return None
        return _TAG_NUM, v
    if isinstance(v, str):
        return _TAG_STR, v
    if isinstance(v, _dt.datetime):
        return _TAG_TS, _to_micros(v)
    if isinstance(v, _dt.date):
        return _TAG_DATE, v.isoformat()
    return None  # bytes/decimal/etc: no stats


def _encode_literal(v, tag: str):
    """Query literal -> the stored representation for ``tag``, or None
    when the literal's type cannot be compared against that tag."""
    if tag == _TAG_TS:
        if isinstance(v, _dt.datetime):
            return _to_micros(v)
        return None
    if tag == _TAG_DATE:
        if isinstance(v, _dt.datetime):
            return None
        if isinstance(v, _dt.date):
            return v.isoformat()
        return None
    if tag == _TAG_BOOL:
        return v if isinstance(v, bool) else None
    if tag == _TAG_NUM:
        if isinstance(v, bool) or not isinstance(v, (int, float)):
            return None
        if isinstance(v, float) and math.isnan(v):
            return None
        return v
    if tag == _TAG_STR:
        return v if isinstance(v, str) else None
    return None


def harvest_file_stats(
    root: str,
    rel_files: list[str],
    columns: list[str] | None = None,
) -> dict[str, dict]:
    """Read footer statistics for each file (metadata-only; the driver
    does this per COMMIT over the commit's own files, mirroring the
    Delta/Iceberg writer collecting stats at write time — never a
    table-sized pass).

    Returns ``{rel_path: {"rows": n, "cols": {name: {"lo", "hi",
    "nulls", "t", "f"}}}}`` where ``lo``/``hi`` may be absent when the
    footer had no usable bound, ``nulls`` may be absent when unknown,
    and ``f`` marks float physical types (NaN caveat above). Columns
    beyond :data:`MAX_STATS_COLS` or with unsupported types are simply
    not indexed (conservative: never skipped on).
    """
    import pyarrow.parquet as pq

    def _one(rel: str) -> tuple[str, dict]:
        md = pq.ParquetFile(os.path.join(root, rel)).metadata
        cols: dict[str, dict] = {}
        # aggregate row-group stats -> file stats; any group missing a
        # column's stats poisons that column's bounds for the file
        for gi in range(md.num_row_groups):
            rg = md.row_group(gi)
            for ci in range(rg.num_columns):
                c = rg.column(ci)
                name = c.path_in_schema
                if "." in name or name.startswith("__bucket"):
                    # nested: not indexed; bucket column: bucket
                    # pruning already covers it
                    continue
                ent = cols.setdefault(name, {"_ok": True, "_nok": True})
                try:
                    st = c.statistics
                except Exception:
                    # pyarrow raises ArrowNotImplementedError for types
                    # it can't extract stats for (e.g. FLBA decimals) —
                    # conservative: the column is simply not indexed
                    st = None
                if st is None:
                    ent["_ok"] = ent["_nok"] = False
                    continue
                if c.physical_type in _FLOAT_PHYSICAL:
                    ent["f"] = True
                if st.has_null_count and ent["_nok"]:
                    ent["nulls"] = ent.get("nulls", 0) + st.null_count
                else:
                    ent["_nok"] = False
                    ent.pop("nulls", None)
                if not (st.has_min_max and ent["_ok"]):
                    ent["_ok"] = False
                    ent.pop("lo", None)
                    ent.pop("hi", None)
                    continue
                try:
                    # .min/.max cast the raw footer bytes; pyarrow
                    # raises for types it can't cast (FLBA decimals)
                    lo = _encode_bound(st.min, c.physical_type)
                    hi = _encode_bound(st.max, c.physical_type)
                except Exception:
                    lo = hi = None
                if lo is None or hi is None or lo[0] != hi[0]:
                    ent["_ok"] = False
                    ent.pop("lo", None)
                    ent.pop("hi", None)
                    continue
                ent["t"] = lo[0]
                ent["lo"] = (
                    lo[1] if "lo" not in ent else min(ent["lo"], lo[1])
                )
                ent["hi"] = (
                    hi[1] if "hi" not in ent else max(ent["hi"], hi[1])
                )
        packed: dict[str, dict] = {}
        for name, ent in list(cols.items())[:MAX_STATS_COLS]:
            ent.pop("_ok", None)
            ent.pop("_nok", None)
            if ent:
                packed[name] = ent
        return rel, {"rows": md.num_rows, "cols": packed}

    # footer reads are independent per file and mostly I/O +
    # GIL-releasing pyarrow parsing — a small thread pool cuts the
    # per-commit harvest latency on many-bucket commits (64 files per
    # COW micro-batch) without changing any harvested value
    if len(rel_files) > 4:
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=16) as pool:
            return dict(pool.map(_one, rel_files))
    return dict(_one(rel) for rel in rel_files)


def _validate_predicates(where: list[tuple]) -> list[tuple]:
    norm = []
    for p in where:
        if len(p) == 2 and p[1] in ("is_null", "not_null"):
            norm.append((p[0], p[1], None))
            continue
        if len(p) != 3 or p[1] not in _OPS:
            raise ValueError(
                f"predicate must be (col, op, value) with op in {_OPS}, "
                f"got {p!r}"
            )
        norm.append((p[0], "=" if p[1] == "==" else p[1], p[2]))
    return norm


def file_may_match(entry: dict | None, where: list[tuple]) -> bool:
    """Conservative containment test: False only when the file's stats
    PROVE no row satisfies the conjunction ``where``."""
    if not entry:
        return True
    rows = entry.get("rows")
    cols = entry.get("cols", {})
    for col, op, val in _validate_predicates(where):
        ent = cols.get(col)
        if ent is None:
            continue
        nulls = ent.get("nulls")
        if op == "is_null":
            if nulls == 0:
                return False
            continue
        if op == "not_null":
            if nulls is not None and rows is not None and nulls == rows:
                return False
            continue
        # comparison ops never match NULL rows
        if nulls is not None and rows is not None and nulls == rows:
            return False
        bloom = ent.get("bloom")
        if bloom is not None and op in ("=", "in"):
            vals = val if op == "in" else [val]
            if (
                isinstance(vals, (list, tuple, set))
                and vals
                and not any(bloom_may_contain(bloom, v) for v in vals)
            ):
                return False
        lo, hi = ent.get("lo"), ent.get("hi")
        if lo is None or hi is None:
            continue
        tag = ent.get("t")
        is_float = bool(ent.get("f"))
        if is_float and op in (">", ">="):
            # Spark: NaN > x for every x, and NaN is invisible to
            # parquet min/max — an upper bound cannot prune these
            continue
        vals = val if op == "in" else [val]
        if op == "in" and not isinstance(vals, (list, tuple, set)):
            raise ValueError("'in' predicate needs a list/tuple/set")
        encoded = [_encode_literal(v, tag) for v in vals]
        if any(e is None for e in encoded):
            continue  # type mismatch: don't skip
        if op in ("=", "in"):
            if not any(lo <= e <= hi for e in encoded):
                return False
        elif op == "<":
            if not lo < encoded[0]:
                return False
        elif op == "<=":
            if not lo <= encoded[0]:
                return False
        elif op == ">":
            if not hi > encoded[0]:
                return False
        elif op == ">=":
            if not hi >= encoded[0]:
                return False
    return True


def file_fully_matches(entry: dict | None, where: list[tuple]) -> bool:
    """Dual of :func:`file_may_match`: True only when the file's stats
    PROVE every row satisfies the conjunction ``where`` — the file's
    manifest row count can then stand in for scanning it (metadata-only
    aggregation, the Delta ``SELECT COUNT(*)`` trick generalized to
    range predicates). Conservative the other way around: any unknown
    (missing bounds, unknown null count, type mismatch) returns False
    and the file is scanned instead.

    Float columns: hidden NaN rows are invisible to parquet min/max but
    compare GREATER than everything in Spark — so ``>``/``>=`` proofs
    survive them while ``=``/``in``/``<``/``<=`` can never be proven.
    """
    if not entry:
        return False
    rows = entry.get("rows")
    cols = entry.get("cols", {})
    if rows is None:
        return False
    if rows == 0:
        return True  # vacuous: contributes zero rows either way
    for col, op, val in _validate_predicates(where):
        ent = cols.get(col)
        if ent is None:
            return False
        nulls = ent.get("nulls")
        if op == "is_null":
            if nulls is None or nulls != rows:
                return False
            continue
        if op == "not_null":
            if nulls != 0:  # unknown (None) or >0: can't prove
                return False
            continue
        # comparisons never match NULL rows: all-rows proof needs 0
        if nulls != 0:
            return False
        lo, hi = ent.get("lo"), ent.get("hi")
        if lo is None or hi is None:
            return False
        tag = ent.get("t")
        if bool(ent.get("f")) and op in ("=", "in", "<", "<="):
            # hidden NaN rows would FAIL these ops yet be invisible
            # to the bounds; ">"/">=" are safe (Spark: NaN > x always)
            return False
        vals = val if op == "in" else [val]
        if op == "in" and not isinstance(vals, (list, tuple, set)):
            raise ValueError("'in' predicate needs a list/tuple/set")
        encoded = [_encode_literal(v, tag) for v in vals]
        if any(e is None for e in encoded):
            return False
        if op in ("=", "in"):
            if not (lo == hi and any(lo == e for e in encoded)):
                return False
        elif op == "<":
            if not hi < encoded[0]:
                return False
        elif op == "<=":
            if not hi <= encoded[0]:
                return False
        elif op == ">":
            if not lo > encoded[0]:
                return False
        elif op == ">=":
            if not lo >= encoded[0]:
                return False
    return True


def decode_bound(v, tag: str):
    """Stored bound -> the Python value Spark would return for the
    column (timestamps come back as tz-naive UTC datetimes, matching
    the session's pinned-UTC collect behavior)."""
    if tag == _TAG_TS:
        return (_EPOCH + _dt.timedelta(microseconds=v)).replace(tzinfo=None)
    if tag == _TAG_DATE:
        return _dt.date.fromisoformat(v)
    return v


def bounds_from_stats(
    file_stats: dict[str, dict],
    rel_files: list[str],
    col: str,
) -> tuple:
    """Column min/max over ``rel_files`` from manifest stats alone:
    returns ``(lo, hi, undecided)`` where ``lo``/``hi`` aggregate every
    file whose bounds are usable and ``undecided`` lists files that
    must be scanned (no stats, missing bounds, or FLOAT physical type —
    a hidden NaN is invisible to parquet min/max yet IS the Spark
    ``max``, so float columns never resolve from stats). All-null
    files (``nulls == rows``) contribute nothing, like Spark's
    null-ignoring aggregates; ``lo``/``hi`` are None when no decided
    file had values."""
    lo = hi = None
    tag = None
    undecided: list[str] = []
    for f in rel_files:
        entry = file_stats.get(f)
        ent = (entry or {}).get("cols", {}).get(col)
        rows = (entry or {}).get("rows")
        if ent is None:
            undecided.append(f)
            continue
        if rows is not None and ent.get("nulls") == rows:
            continue  # all-null: contributes nothing to min/max
        if rows == 0:
            continue
        flo, fhi = ent.get("lo"), ent.get("hi")
        if flo is None or fhi is None or ent.get("f"):
            undecided.append(f)
            continue
        if tag is None:
            tag = ent.get("t")
        elif tag != ent.get("t"):
            undecided.append(f)  # mixed representations: scan it
            continue
        lo = flo if lo is None else min(lo, flo)
        hi = fhi if hi is None else max(hi, fhi)
    if tag is not None:
        lo = decode_bound(lo, tag) if lo is not None else None
        hi = decode_bound(hi, tag) if hi is not None else None
    return lo, hi, undecided


def prune_files(
    file_stats: dict[str, dict],
    rel_files: list[str],
    where: list[tuple],
) -> list[str]:
    """Files from ``rel_files`` that may contain matching rows. Files
    with no stats entry (pre-upgrade commits) are always kept."""
    where = _validate_predicates(where)
    return [
        f for f in rel_files if file_may_match(file_stats.get(f), where)
    ]


def predicate_column(where: list[tuple]) -> Column:
    """The exact residual filter for ``where`` — applied to every
    surviving row so skipping is pure I/O reduction (the
    ``read(where=P) == read().filter(P)`` contract)."""
    out = None
    for col, op, val in _validate_predicates(where):
        c = F.col(col)
        if op in ("=",):
            p = c == F.lit(val)
        elif op == "<":
            p = c < F.lit(val)
        elif op == "<=":
            p = c <= F.lit(val)
        elif op == ">":
            p = c > F.lit(val)
        elif op == ">=":
            p = c >= F.lit(val)
        elif op == "in":
            p = c.isin(list(val))
        elif op == "is_null":
            p = c.isNull()
        else:
            p = c.isNotNull()
        out = p if out is None else out & p
    if out is None:
        raise ValueError("where must contain at least one predicate")
    return out


# -- per-file bloom filters (equality skipping on high-cardinality
#    columns) ----------------------------------------------------------
#
# Min/max bounds prune range predicates well only when files are
# clustered on the predicate column; a point lookup on an UNclustered
# high-cardinality column (the CDC key, a document id) matches every
# file's [lo, hi] and prunes nothing. A small per-file bloom filter
# fixes exactly that case: `=` / `in` predicates skip every file whose
# bloom proves the value absent — the public Delta
# `bloomFilterIndex` / Iceberg `bloom-filter-enabled` idea re-expressed
# for this manifest-log lake.
#
# Opt-in via table property `bloom.cols` (see LakeTable.set_props):
# unlike min/max harvesting, building a bloom reads the indexed
# COLUMN's data for the commit's own files (one column, batch-sized —
# never a table scan). Blooms are conservative by construction: a
# possibly-saturated or type-mismatched bloom is simply not consulted,
# and files without one (pre-enable commits, delta files) are never
# bloom-skipped.
#
# Hashing must be deterministic across processes/sessions (the bloom
# is built at write time and probed at read time): pandas'
# hash_pandas_object with pinned hash keys (SipHash-based, stable by
# contract), double-hashed into k probe positions.

_BLOOM_H1_KEY = "0123456789012345"
_BLOOM_H2_KEY = "5432109876543210"
_BLOOM_DEFAULT_BITS_PER_KEY = 10  # ~1% fpp at k=7
_BLOOM_DEFAULT_MAX_BYTES = 16384


def bloom_spec(props: dict | None) -> dict | None:
    """Parse the table-properties bloom config, None when disabled."""
    props = props or {}
    cols = props.get("bloom.cols") or []
    if not cols:
        return None
    return {
        "cols": list(cols),
        "bits_per_key": int(
            props.get("bloom.bits_per_key", _BLOOM_DEFAULT_BITS_PER_KEY)
        ),
        "max_bytes": int(
            props.get("bloom.max_bytes", _BLOOM_DEFAULT_MAX_BYTES)
        ),
    }


def _bloom_series(values, tag: str):
    """Canonical pandas Series for hashing, or None when the type has
    no canonical form (floats: equality is unreliable; bytes, nested,
    timestamps: not supported — conservative, no bloom)."""
    import pandas as pd

    if tag == _TAG_NUM:
        return pd.Series(values, dtype="int64")
    if tag == _TAG_STR:
        return pd.Series(values, dtype=object)
    return None


def _bloom_positions(series, m: int, k: int):
    import numpy as np
    import pandas as pd

    h1 = pd.util.hash_pandas_object(
        series, index=False, hash_key=_BLOOM_H1_KEY
    ).to_numpy(dtype="uint64")
    h2 = pd.util.hash_pandas_object(
        series, index=False, hash_key=_BLOOM_H2_KEY
    ).to_numpy(dtype="uint64") | np.uint64(1)
    for i in range(k):
        yield ((h1 + np.uint64(i) * h2) % np.uint64(m)).astype(np.int64)


def build_bloom(series, bits_per_key: int, max_bytes: int) -> dict | None:
    """Bloom for one file's column values (nulls excluded — NULL never
    matches `=`). Returns None when the column type is unsupported or
    the bloom would saturate past ~50% fill (no pruning power, wasted
    manifest bytes)."""
    import base64

    import numpy as np

    s = series.dropna()
    n = len(s)
    if n == 0:
        return None
    kind = s.dtype.kind
    if kind in "iu":
        tag = _TAG_NUM
        s = s.astype("int64")
    elif kind == "O" and isinstance(s.iloc[0], str):
        tag = _TAG_STR
    else:
        return None
    m = min(max_bytes * 8, max(64, bits_per_key * n))
    m = ((m + 7) // 8) * 8
    if bits_per_key * n > 2 * m:
        return None  # saturation guard
    k = max(1, min(8, round(0.693 * m / n)))
    bits = np.zeros(m, dtype=bool)
    for idx in _bloom_positions(s, m, k):
        bits[idx] = True
    return {
        "m": int(m),
        "k": int(k),
        "t": tag,
        "b": base64.b64encode(np.packbits(bits).tobytes()).decode("ascii"),
    }


def bloom_may_contain(bloom: dict, value) -> bool:
    """Conservative membership probe: False only when the bloom PROVES
    ``value`` absent; unsupported/ mismatched literal types → True."""
    import base64

    import numpy as np

    tag = bloom.get("t")
    if tag == _TAG_NUM:
        if isinstance(value, bool) or not isinstance(value, int):
            return True
    elif tag == _TAG_STR:
        if not isinstance(value, str):
            return True
    else:
        return True
    s = _bloom_series([value], tag)
    if s is None:
        return True
    m, k = bloom["m"], bloom["k"]
    bits = np.unpackbits(
        np.frombuffer(base64.b64decode(bloom["b"]), dtype=np.uint8)
    )[:m]
    for idx in _bloom_positions(s, m, k):
        if not bits[int(idx[0])]:
            return False
    return True


def harvest_blooms(
    root: str, rel_files: list[str], spec: dict
) -> dict[str, dict[str, dict]]:
    """{rel_path: {col: bloom}} for the spec'd columns present in each
    file — reads ONLY the indexed columns of the given (commit-sized)
    file list."""
    import pyarrow.parquet as pq

    def _one(rel: str) -> tuple[str, dict]:
        full = os.path.join(root, rel)
        pf = pq.ParquetFile(full)
        names = set(pf.schema_arrow.names)
        want = [c for c in spec["cols"] if c in names]
        if not want:
            return rel, {}
        tbl = pq.read_table(full, columns=want)
        per_col: dict[str, dict] = {}
        for c in want:
            # drop nulls ARROW-side: pandas would otherwise promote a
            # nullable int column to float64 (kind 'f') and
            # build_bloom would decline it
            b = build_bloom(
                tbl.column(c).drop_null().combine_chunks().to_pandas(),
                spec["bits_per_key"], spec["max_bytes"],
            )
            if b is not None:
                per_col[c] = b
        return rel, per_col

    # independent per-file column reads + hashing — same thread-pool
    # treatment as harvest_file_stats (values unchanged)
    if len(rel_files) > 4:
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=16) as pool:
            results = pool.map(_one, rel_files)
    else:
        results = (_one(rel) for rel in rel_files)
    return {rel: per_col for rel, per_col in results if per_col}
