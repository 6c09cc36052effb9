"""Vectorized payload normalization (Arrow pandas UDF).

The one CDC-path stage where Python is justified (SURVEY.md §2b):
transcript text canonicalization — Unicode NFC, whitespace collapse,
control-char strip — semantics ``pyspark.sql.functions`` cannot fully
express. Arrow-batched (`pandas_udf`), never per-row Python.

Opt-in: pass ``normalize_columns`` to the transform; the default CDC
pipeline leaves payloads byte-exact (the per-turn text equality
invariant is over raw text).
"""

from __future__ import annotations

import re
import unicodedata

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_WS = re.compile(r"[ \t\f\v]+")
_CTRL = re.compile(r"[\x00-\x08\x0b\x0c\x0e-\x1f\x7f]")


@F.pandas_udf(T.StringType())
def canonicalize_text(s: pd.Series) -> pd.Series:
    def canon(v):
        if v is None:
            return None
        v = unicodedata.normalize("NFC", v)
        v = _CTRL.sub("", v)
        v = _WS.sub(" ", v)
        return v.strip()

    return s.map(canon)


def normalize_columns(df: DataFrame, columns: list[str]) -> DataFrame:
    """Canonicalize the named string columns (Arrow-batched)."""
    for c in columns:
        df = df.withColumn(c, canonicalize_text(F.col(c)))
    return df
