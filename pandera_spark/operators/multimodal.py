"""Multimodal column plumbing: images/audio/video as opaque binary columns
with typed metadata.

The Spark-side architecture is real and tested — schema conventions, Arrow
batch shape, partition sizing, ``mapInPandas`` UDF signatures.  The actual
codec step is STUBBED (this container ships no image/audio libraries): decode
functions raise ``NotImplementedError`` unless ``deterministic_fake=True``,
which produces seeded fake features so the pipeline shape can be exercised
end-to-end.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Optional

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: canonical multimodal column convention: payload + typed metadata struct
MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType(), True),
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("duration_ms", T.LongType(), True),
                    T.StructField("codec", T.StringType(), True),
                ]
            ),
            True,
        ),
    ]
)

IMAGE_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
    ]
)

FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("frame", T.BinaryType(), True),
    ]
)


def _fake_feature(payload: Optional[bytes], dim: int) -> list[float]:
    """Deterministic fake feature from payload bytes (stands in for a real
    CNN/CLIP embedding; same input -> same output)."""
    if payload is None:
        return [0.0] * dim
    h = 2166136261
    out = []
    for i in range(dim):
        for b in payload[i::dim][:8] or b"\x00":
            h = (h ^ b) * 16777619 % (1 << 32)
        out.append((h % 10007) / 10007.0)
    return out


def decode_image(payload: bytes):  # pragma: no cover - real codec absent
    """Real image decode — requires an image library not present in this
    container.  Plug in PIL/cv2 here in a real deployment."""
    raise NotImplementedError(
        "image codec not available in this environment; "
        "use image_features(..., deterministic_fake=True) for pipeline tests"
    )


def image_features(
    media: DataFrame,
    *,
    dim: int = 16,
    batch_rows: int = 1024,
    deterministic_fake: bool = False,
) -> DataFrame:
    """Decode + feature-extract images via Arrow-batched ``mapInPandas``.

    Scale notes: binary payloads never pass through Python row-at-a-time —
    Arrow moves whole columns per batch; ``batch_rows`` bounds executor
    memory (payloads ~1 MB -> ~1 GB per batch at 1024 rows; size down for
    bigger media).  Output drops the payload so downstream stages shuffle
    features, not bytes.
    """

    # NB: defined inline so cloudpickle ships it by value — executor python
    # workers need no pandera_spark install for this UDF
    def fake_feature(payload, dim=dim):
        if payload is None:
            return [0.0] * dim
        h = 2166136261
        out = []
        for i in range(dim):
            for b in payload[i::dim][:8] or b"\x00":
                h = (h ^ b) * 16777619 % (1 << 32)
            out.append((h % 10007) / 10007.0)
        return out

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats, widths, heights = [], [], []
            for payload in pdf["payload"]:
                if deterministic_fake:
                    feats.append(fake_feature(payload, dim))
                    widths.append(
                        len(payload) % 1024 if payload is not None else None
                    )
                    heights.append(
                        len(payload) % 768 if payload is not None else None
                    )
                else:
                    decode_image(payload)  # raises NotImplementedError
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "feature": feats,
                    "width": pd.array(widths, dtype="Int32"),
                    "height": pd.array(heights, dtype="Int32"),
                }
            )

    from .._shipping import ensure_package_on_executors

    ensure_package_on_executors(media.sparkSession)
    return media.select("media_id", "payload").mapInPandas(
        run, schema=IMAGE_FEATURE_SCHEMA
    )


def sample_frames(
    media: DataFrame,
    *,
    every_nth: int = 10,
    max_frames: int = 8,
    deterministic_fake: bool = False,
) -> DataFrame:
    """Frame-sample video payloads -> one row per sampled frame.

    Fake mode slices the payload bytes deterministically; a real deployment
    replaces the slicer with an ffmpeg/pyav demuxer inside the same
    ``mapInPandas`` shape (schema and batch contract unchanged).
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                if payload is None:
                    continue
                if not deterministic_fake:
                    decode_image(payload)
                n = min(max_frames, max(1, len(payload) // every_nth))
                for i in range(n):
                    ids.append(mid)
                    idxs.append(i)
                    frames.append(bytes(payload[i::n][:64]))
            yield pd.DataFrame(
                {"media_id": ids, "frame_idx": idxs, "frame": frames}
            )

    from .._shipping import ensure_package_on_executors

    ensure_package_on_executors(media.sparkSession)
    return media.select("media_id", "payload").mapInPandas(
        run, schema=FRAME_SCHEMA
    )


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
    ]
)


def resize_images(
    media: DataFrame,
    *,
    width: int = 224,
    height: int = 224,
    deterministic_fake: bool = False,
) -> DataFrame:
    """Resize image payloads via the same Arrow-batched ``mapInPandas``
    contract as :func:`image_features`.

    Fake mode emits a deterministic byte downsample sized ``width*height``
    so batch shape / memory behavior is exercised; a real deployment swaps
    in PIL/cv2 inside ``run`` (schema unchanged).
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        target = width * height
        for pdf in batches:
            payloads = []
            for payload in pdf["payload"]:
                if payload is None:
                    payloads.append(None)
                    continue
                if not deterministic_fake:
                    decode_image(payload)  # raises NotImplementedError
                step = max(1, len(payload) // target)
                payloads.append(bytes(payload[::step][:target]))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "payload": payloads,
                    "width": pd.array(
                        [width if p is not None else None for p in payloads],
                        dtype="Int32",
                    ),
                    "height": pd.array(
                        [height if p is not None else None for p in payloads],
                        dtype="Int32",
                    ),
                }
            )

    from .._shipping import ensure_package_on_executors

    ensure_package_on_executors(media.sparkSession)
    return media.select("media_id", "payload").mapInPandas(
        run, schema=RESIZED_SCHEMA
    )


def media_stats(media: DataFrame) -> DataFrame:
    """Payload statistics without decoding (pure built-ins — the cheap
    validation pass you run before spending decode cycles)."""
    return media.select(
        F.count(F.lit(1)).alias("n_media"),
        F.count(F.when(F.col("payload").isNull(), 1)).alias("null_payloads"),
        F.coalesce(F.sum(F.length("payload")), F.lit(0)).alias("total_bytes"),
        F.coalesce(F.max(F.length("payload")), F.lit(0)).alias("max_bytes"),
    )
