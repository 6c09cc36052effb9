from __future__ import annotations

from kafka_jdbc_sink_connector_spark.functions.textnorm import (
    normalize_columns,
)


def test_canonicalize_text(spark):
    df = spark.createDataFrame(
        [
            ("a", "  hello\t\tworld  "),
            ("b", "café"),       # e + combining acute -> é (NFC)
            ("c", "bad\x00chars\x1fhere"),
            ("d", None),
        ],
        "k string, text string",
    )
    got = {
        r["k"]: r["text"]
        for r in normalize_columns(df, ["text"]).collect()
    }
    assert got["a"] == "hello world"
    assert got["b"] == "café"
    assert got["c"] == "badcharshere"
    assert got["d"] is None
