"""Multimodal column plumbing: opaque ``binary`` payloads + typed
metadata, processed with Arrow-batched ``mapInPandas``.

The image/audio/video libraries are not in this container, so the
*decode* step is a deterministic fake (pure function of the bytes) or a
clearly-marked ``NotImplementedError`` — but everything Spark-side is
real and tested: the binary column handling, the ``mapInPandas``
batch iterator signature, the output schema contract, and partition
behavior. Swapping ``_fake_decode`` for Pillow/torchaudio is a
one-function change.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

DECODE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("checksum", T.StringType()),
    ]
)

HAVE_REAL_DECODER = False  # Pillow/ffmpeg absent in this image


def _fake_decode(blob: bytes) -> tuple[int, int, int]:
    """Deterministic stand-in for an image/video header parse:
    metadata as a pure function of the payload length. Mirrorable in
    the SQL oracle (width = len % 640 ...)."""
    n = len(blob)
    return n % 640, (n * 7) % 480, n % 30


def real_decode(blob: bytes):  # pragma: no cover - gated stub
    raise NotImplementedError(
        "real media decoding requires Pillow/ffmpeg, not present in "
        "this environment; wire it here"
    )


def attach_binary_payload(
    docs: DataFrame, text_col: str = "text"
) -> DataFrame:
    """Simulates a multimodal table: the text re-encoded as an opaque
    binary column (in production this is the stored image/audio blob).
    """
    return docs.withColumn("payload", F.encode(F.col(text_col), "UTF-8"))


def decode_metadata(
    media: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    use_real_decoder: bool = False,
) -> DataFrame:
    """binary payload → typed metadata via Arrow-batched mapInPandas.

    Batches arrive as pandas DataFrames (Arrow transfer, no per-row
    Python); output schema is the fixed DECODE_SCHEMA contract.
    """
    import hashlib

    def decode_batches(
        batches: Iterator[pd.DataFrame],
    ) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            blobs = pdf[payload_col]
            if use_real_decoder:
                decoded = blobs.map(real_decode)
            else:
                decoded = blobs.map(_fake_decode)
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "n_bytes": blobs.map(len).astype("int32"),
                    "width": decoded.map(lambda t: t[0]).astype("int32"),
                    "height": decoded.map(lambda t: t[1]).astype("int32"),
                    "n_frames": decoded.map(lambda t: t[2]).astype("int32"),
                    "checksum": blobs.map(
                        lambda b: hashlib.md5(b).hexdigest()
                    ),
                }
            )

    return media.select(id_col, payload_col).mapInPandas(
        decode_batches, DECODE_SCHEMA
    )
