"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video content is carried as a ``binary`` column plus a typed
metadata struct, processed by Arrow-batched ``mapInPandas`` kernels. The
decode libraries (PIL / cv2 / torchaudio) are NOT in this container, so the
decode/resize/frame-sample kernels are STUBBED behind an import-try with a
clearly-marked ``NotImplementedError`` — but the Spark-side plumbing
(schema, batch iteration, partitioning, output shapes) is real and tested
via the byte-histogram kernel, which needs no media lib.

At 100 TB: payloads dominate row size — the operators project only
(id, payload) so Parquet column pruning keeps metadata-only queries from
touching bytes; kernels stream per Arrow batch (no per-row Python), and
`repartition(n)` on id spreads decode CPU, the real bottleneck, evenly.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),  # image | audio | video | text
        T.StructField("payload", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("format", T.StringType()),
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("sample_rate", T.IntegerType()),
                    T.StructField("n_frames", T.IntegerType()),
                ]
            ),
        ),
    ]
)


def media_from_documents(docs: DataFrame) -> DataFrame:
    """Deterministic media table for tests: payload = utf-8 text bytes."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit("text").alias("kind"),
        F.encode(F.col("text"), "utf-8").alias("payload"),
        F.struct(
            F.lit("txt").alias("format"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("int").alias("sample_rate"),
            F.lit(None).cast("int").alias("n_frames"),
        ).alias("meta"),
    )


def byte_histogram(media: DataFrame) -> DataFrame:
    """(media_id, byte, n) histogram of payload bytes via mapInPandas.

    The reference kernel proving the binary plumbing: numpy bincount per
    Arrow batch, exploded to one row per present byte value.
    """
    import numpy as np

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            out_id, out_byte, out_n = [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                arr = np.frombuffer(payload, dtype=np.uint8)
                counts = np.bincount(arr, minlength=256)
                present = np.nonzero(counts)[0]
                out_id.extend([mid] * len(present))
                out_byte.extend(present.tolist())
                out_n.extend(counts[present].tolist())
            yield pd.DataFrame({"media_id": out_id, "byte": out_byte, "n": out_n})

    return media.select("media_id", "payload").mapInPandas(
        kernel, schema="media_id long, byte int, n long"
    )


def _require(module: str, op: str):
    try:
        return __import__(module)
    except ImportError as exc:  # pragma: no cover - container has no media libs
        raise NotImplementedError(
            f"{op} requires '{module}', which is not available in this "
            f"environment. The Spark plumbing (schema/batching) is complete; "
            f"plug the kernel in when the library is present."
        ) from exc


def decode_images(media: DataFrame) -> DataFrame:
    """image payload → (media_id, width, height, mode). STUB: needs PIL."""
    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        PIL = _require("PIL.Image", "decode_images")
        import io

        for pdf in batches:
            rows = {"media_id": [], "width": [], "height": [], "mode": []}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                img = PIL.Image.open(io.BytesIO(payload))
                rows["media_id"].append(mid)
                rows["width"].append(img.width)
                rows["height"].append(img.height)
                rows["mode"].append(img.mode)
            yield pd.DataFrame(rows)

    return media.filter(F.col("kind") == "image").select("media_id", "payload").mapInPandas(
        kernel, schema="media_id long, width int, height int, mode string"
    )


def resize_images(media: DataFrame, width: int, height: int) -> DataFrame:
    """image payload → resized payload. STUB: needs PIL."""
    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        _require("PIL.Image", "resize_images")
        yield from ()  # pragma: no cover

    return media.filter(F.col("kind") == "image").select("media_id", "payload").mapInPandas(
        kernel, schema="media_id long, payload binary"
    )


def sample_frames(media: DataFrame, every_n: int = 30) -> DataFrame:
    """video payload → sampled frame payloads. STUB: needs cv2."""
    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        _require("cv2", "sample_frames")
        yield from ()  # pragma: no cover

    return media.filter(F.col("kind") == "video").select("media_id", "payload").mapInPandas(
        kernel, schema="media_id long, frame_idx int, payload binary"
    )
