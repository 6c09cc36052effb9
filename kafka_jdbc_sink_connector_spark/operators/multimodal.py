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


RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("resized_w", T.IntegerType()),
        T.StructField("resized_h", T.IntegerType()),
        T.StructField("resized_checksum", T.StringType()),
    ]
)


def resize_images(
    media: DataFrame,
    target_w: int = 224,
    target_h: int = 224,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    use_real_decoder: bool = False,
) -> DataFrame:
    """binary payload → resized-image record via Arrow ``mapInPandas``.

    The pixel work is a stub (no Pillow in this image): the "resized"
    artifact is a deterministic checksum of payload + target dims, so
    the plumbing — batch shape, schema contract, per-doc fanout — is
    real and oracle-checkable; a production deployment replaces the
    two marked lines with ``Image.open(io.BytesIO(b)).resize(...)``.
    """
    import hashlib

    def resize_batches(
        batches: Iterator[pd.DataFrame],
    ) -> Iterator[pd.DataFrame]:
        suffix = f":{target_w}x{target_h}".encode()
        for pdf in batches:
            blobs = pdf[payload_col]
            decode = real_decode if use_real_decoder else _fake_decode
            dims = blobs.map(decode)  # <- Image.open(...).size
            resized = blobs.map(                       # <- .resize(...)
                lambda b: hashlib.md5(bytes(b) + suffix).hexdigest()
            )
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "width": dims.map(lambda t: t[0]).astype("int32"),
                    "height": dims.map(lambda t: t[1]).astype("int32"),
                    "resized_w": target_w,
                    "resized_h": target_h,
                    "resized_checksum": resized,
                }
            )

    return media.select(id_col, payload_col).mapInPandas(
        resize_batches, RESIZE_SCHEMA
    )


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame_checksum", T.StringType()),
    ]
)


def sample_frames(
    media: DataFrame,
    every_n: int = 5,
    id_col: str = "doc_id",
    payload_col: str = "payload",
) -> DataFrame:
    """video-shaped payload → one row per sampled frame (indexes 0,
    every_n, 2·every_n, … below the fake-decoded frame count) via
    Arrow ``mapInPandas`` — the 1→N fanout shape a real frame sampler
    has (ffmpeg would decode the frame here; the stub emits a
    deterministic per-frame checksum instead). Zero-frame payloads
    produce zero rows, like a still image in a video pipeline."""
    import hashlib

    def frame_batches(
        batches: Iterator[pd.DataFrame],
    ) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, sums = [], [], []
            for doc_id, blob in zip(pdf[id_col], pdf[payload_col]):
                b = bytes(blob)
                n_frames = _fake_decode(b)[2]  # <- ffprobe frame count
                for i in range(0, n_frames, every_n):
                    ids.append(doc_id)
                    idxs.append(i)
                    sums.append(                 # <- decoded frame i
                        hashlib.md5(b + f":{i}".encode()).hexdigest()
                    )
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int32"),
                    "frame_checksum": pd.Series(sums, dtype="object"),
                }
            )

    return media.select(id_col, payload_col).mapInPandas(
        frame_batches, FRAME_SCHEMA
    )
