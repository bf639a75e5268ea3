"""Multimodal column plumbing: images/audio/video as opaque binary columns
with typed metadata.

The Spark-side architecture — schema conventions, Arrow batch shape,
partition sizing, ``mapInPandas`` UDF signatures — pairs with a REAL codec
(:mod:`.codecs`): PNG/BMP/PPM decode from the stdlib, Pillow preferred when
installed.  ``deterministic_fake=True`` keeps the seeded fake path for
oracle replay and payloads that aren't actual images (the synthetic
documents table); real video demux (pyav/ffmpeg) plugs into the same
``mapInPandas`` shape — still images yield a single frame meanwhile.
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


def decode_image(payload: bytes):
    """Real image decode: PNG / BMP / binary PPM-PGM via the stdlib
    (Pillow used instead when importable) — see :mod:`.codecs`."""
    from .codecs import decode_image as _decode

    return _decode(payload)


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

    def real_feature(arr, dim=dim):
        # coarse grid of per-channel cell means: a deterministic, content-
        # sensitive embedding stand-in computed from REAL decoded pixels
        import numpy as np

        a = arr.astype(np.float32) / 255.0
        if a.ndim == 2:
            a = a[:, :, None]
        h, w, c = a.shape
        g = max(1, int((dim / c) ** 0.5))
        ys = np.linspace(0, h, g + 1, dtype=int)
        xs = np.linspace(0, w, g + 1, dtype=int)
        feats: list[float] = []
        for yi in range(g):
            for xi in range(g):
                cell = a[ys[yi]:ys[yi + 1], xs[xi]:xs[xi + 1]]
                if cell.size:
                    feats.extend(float(v) for v in cell.mean(axis=(0, 1)))
                else:
                    feats.extend([0.0] * c)
        feats = feats[:dim]
        return feats + [0.0] * (dim - len(feats))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if not deterministic_fake:
            from pandera_spark.operators.codecs import (
                ImageDecodeError,
                decode_image as _decode,
            )
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
                    try:
                        arr = _decode(payload)
                    except ImageDecodeError:
                        # corrupt/unsupported payloads surface as nulls, the
                        # same row-preserving contract as coerce errors
                        feats.append(None)
                        widths.append(None)
                        heights.append(None)
                        continue
                    feats.append(real_feature(arr))
                    heights.append(int(arr.shape[0]))
                    widths.append(int(arr.shape[1]))
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
        if not deterministic_fake:
            from pandera_spark.operators.codecs import (
                ImageDecodeError,
                decode_image as _decode,
                encode_ppm,
            )
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                if payload is None:
                    continue
                if deterministic_fake:
                    n = min(max_frames, max(1, len(payload) // every_nth))
                    for i in range(n):
                        ids.append(mid)
                        idxs.append(i)
                        frames.append(bytes(payload[i::n][:64]))
                    continue
                # real path: a still image is a single frame; a video
                # demuxer (pyav/ffmpeg) slots in here with every_nth /
                # max_frames governing the frame stride, schema unchanged
                try:
                    arr = _decode(payload)
                except ImageDecodeError:
                    continue
                ids.append(mid)
                idxs.append(0)
                frames.append(encode_ppm(arr))
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
        if not deterministic_fake:
            import numpy as np

            from pandera_spark.operators.codecs import (
                ImageDecodeError,
                decode_image as _decode,
                encode_ppm,
            )
        target = width * height
        for pdf in batches:
            payloads = []
            for payload in pdf["payload"]:
                if payload is None:
                    payloads.append(None)
                    continue
                if deterministic_fake:
                    step = max(1, len(payload) // target)
                    payloads.append(bytes(payload[::step][:target]))
                    continue
                # real path: nearest-neighbor resample, re-encoded as PPM
                # so output payloads are themselves decode_image-able
                try:
                    arr = _decode(payload)
                except ImageDecodeError:
                    payloads.append(None)
                    continue
                h, w = arr.shape[:2]
                yi = np.minimum((np.arange(height) * h) // height, h - 1)
                xi = np.minimum((np.arange(width) * w) // width, w - 1)
                payloads.append(encode_ppm(arr[yi][:, xi]))
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


def perceptual_hash(
    media: DataFrame,
    *,
    id_col: str = "media_id",
    payload_col: str = "payload",
    hash_col: str = "phash",
) -> DataFrame:
    """64-bit perceptual dHash per image: decode (real codecs), average
    to grayscale, nearest-neighbor downsample to 9×8, one bit per
    adjacent-pixel brightness comparison — robust to re-encoding,
    resizing, and small edits, the standard key for IMAGE near-dup
    dedup.

    Arrow-batched ``mapInPandas``; corrupt/undecodable payloads surface
    as null hashes (row-preserving, same contract as
    :func:`image_features`).  Output drops the payload — downstream
    joins shuffle 8-byte hashes, never image bytes."""

    def run(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        import numpy as np

        from pandera_spark.operators.codecs import (
            ImageDecodeError,
            decode_image as _decode,
        )

        def dhash(arr) -> int:
            a = arr.astype(np.float32)
            if a.ndim == 3:
                a = a.mean(axis=2)
            h, w = a.shape
            ys = (np.arange(8) * h) // 8
            xs = (np.arange(9) * w) // 9
            small = a[np.ix_(ys, xs)]
            bits = (small[:, 1:] > small[:, :-1]).flatten()
            out = 0
            for i, b in enumerate(bits):
                if b:
                    out |= 1 << i
            # keep within signed-long range for the Spark column
            return out - (1 << 64) if out >= (1 << 63) else out

        for pdf in batches:
            hashes = []
            for payload in pdf[payload_col]:
                if payload is None:
                    hashes.append(None)
                    continue
                try:
                    hashes.append(dhash(_decode(bytes(payload))))
                except ImageDecodeError:
                    hashes.append(None)
            yield pd.DataFrame(
                {id_col: pdf[id_col], hash_col: pd.array(hashes, dtype="Int64")}
            )

    from .._shipping import ensure_package_on_executors

    ensure_package_on_executors(media.sparkSession)
    return media.select(id_col, payload_col).mapInPandas(
        run,
        schema=T.StructType([
            T.StructField(id_col, media.schema[id_col].dataType, True),
            T.StructField(hash_col, T.LongType(), True),
        ]),
    )


def phash_near_dups(
    hashed: DataFrame,
    *,
    id_col: str = "media_id",
    hash_col: str = "phash",
    max_hamming: int = 8,
) -> DataFrame:
    """Near-duplicate image pairs by Hamming distance over perceptual
    hashes: pigeonhole blocking (``max_hamming + 1`` bit-blocks — any
    pair within distance shares at least one whole block) makes the
    candidate join an equi-join on (block_idx, block_value), then the
    exact distance verifies via ``bit_count(xor)``.  Same scale shape
    as the SimHash text path: hashes shuffle, images never."""
    if not 0 <= max_hamming <= 31:
        raise ValueError(f"max_hamming must be in [0, 31]: {max_hamming}")
    nb = max_hamming + 1
    # variable-width DISJOINT blocks with boundaries (i*64)//nb — a fixed
    # ceil(64/nb) width puts the last block's shift at >= 64 for many nb
    # (incl. the default nb=9: block 8 at shift 64, which JVM long-shift
    # semantics wrap to shift 0, aliasing block 0 and silently dropping
    # pairs at exactly distance == max_hamming).  The floor-boundary split
    # always covers all 64 bits exactly once, so the pigeonhole invariant
    # (<= max_hamming differing bits across max_hamming+1 blocks => some
    # block identical) genuinely holds.
    bounds = [(i * 64) // nb for i in range(nb + 1)]

    def _block(col: "F.Column", i: int) -> "F.Column":
        lo, hi = bounds[i], bounds[i + 1]
        return F.shiftrightunsigned(col, lo).bitwiseAND(
            F.lit((1 << (hi - lo)) - 1)
        )

    base = hashed.filter(F.col(hash_col).isNotNull()).select(
        F.col(id_col).alias("__id"), F.col(hash_col).alias("__h")
    )
    blocks = base.select(
        "__id",
        "__h",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(i).alias("bi"),
                    _block(F.col("__h"), i).alias("bv"),
                )
                for i in range(nb)
            ])
        ).alias("b"),
    ).select("__id", "__h", F.col("b.bi").alias("bi"),
             F.col("b.bv").alias("bv"))
    a, b = blocks.alias("a"), blocks.alias("b")
    # first-matching-block dedup (same trick as the LSH band filter) —
    # MUST use the same variable-width boundaries as the blocking above
    fm = F.lit(-1)
    for i in range(nb - 1, -1, -1):
        ba = _block(F.col("a.__h"), i)
        bb = _block(F.col("b.__h"), i)
        fm = F.when(ba == bb, F.lit(i)).otherwise(fm)
    dist = F.bit_count(F.col("a.__h").bitwiseXOR(F.col("b.__h")))
    return (
        a.join(
            b,
            (F.col("a.bi") == F.col("b.bi"))
            & (F.col("a.bv") == F.col("b.bv"))
            & (F.col("a.__id") < F.col("b.__id")),
        )
        .filter(F.col("a.bi") == fm)
        .filter(dist <= max_hamming)
        .select(
            F.col("a.__id").alias("id_a"),
            F.col("b.__id").alias("id_b"),
            dist.cast("int").alias("hamming"),
        )
    )


def audio_fingerprint(
    media: DataFrame,
    *,
    id_col: str = "media_id",
    payload_col: str = "payload",
    hash_col: str = "afp",
) -> DataFrame:
    """64-bit audio fingerprint per WAV payload: decode (stdlib RIFF
    reader), mono-mix, split into 65 equal frames, one bit per
    adjacent-frame RMS-energy comparison — the loudness-envelope
    difference hash, robust to gain changes and re-encoding, pairing
    via :func:`phash_near_dups` (the Hamming join is hash-agnostic).

    Arrow-batched ``mapInPandas``; corrupt/undecodable payloads yield
    null fingerprints (row-preserving)."""

    def run(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        import numpy as np

        from pandera_spark.operators.codecs import decode_wav

        def fp(payload: bytes) -> int:
            samples, _rate = decode_wav(payload)
            a = samples.astype(np.float64)
            if a.ndim == 2:
                a = a.mean(axis=1)
            if a.size < 65:
                a = np.pad(a, (0, 65 - a.size))
            edges = (np.arange(66) * a.size) // 65
            rms = np.array([
                np.sqrt(np.mean(a[edges[i]:edges[i + 1]] ** 2))
                if edges[i + 1] > edges[i] else 0.0
                for i in range(65)
            ])
            bits = rms[1:] > rms[:-1]
            out = 0
            for i, b in enumerate(bits):
                if b:
                    out |= 1 << i
            return out - (1 << 64) if out >= (1 << 63) else out

        for pdf in batches:
            hashes = []
            for payload in pdf[payload_col]:
                if payload is None:
                    hashes.append(None)
                    continue
                try:
                    hashes.append(fp(bytes(payload)))
                except Exception:  # malformed RIFF/PCM -> null, row kept
                    hashes.append(None)
            yield pd.DataFrame(
                {id_col: pdf[id_col], hash_col: pd.array(hashes, dtype="Int64")}
            )

    from .._shipping import ensure_package_on_executors

    ensure_package_on_executors(media.sparkSession)
    return media.select(id_col, payload_col).mapInPandas(
        run,
        schema=T.StructType([
            T.StructField(id_col, media.schema[id_col].dataType, True),
            T.StructField(hash_col, T.LongType(), True),
        ]),
    )
