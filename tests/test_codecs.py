"""Real multimodal codec tests: pure-stdlib PNG/BMP/PNM/WAV decode and the
Spark mapInPandas operators running the REAL (non-fake) path end-to-end."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from pandera_spark.operators.codecs import (
    ImageDecodeError,
    decode_image,
    decode_wav,
    encode_png,
    encode_ppm,
)


def _rand_img(h, w, c, seed=0):
    rng = np.random.default_rng(seed)
    shape = (h, w) if c == 1 else (h, w, c)
    return rng.integers(0, 256, size=shape, dtype=np.uint8)


# ---------------------------------------------------------------------------
# PNG


@pytest.mark.parametrize("channels", [1, 2, 3, 4])
def test_png_roundtrip(channels):
    img = _rand_img(13, 7, channels, seed=channels)
    out = decode_image(encode_png(img))
    assert out.shape == img.shape and out.dtype == np.uint8
    assert np.array_equal(out, img)


def _png_with_filters(img: np.ndarray, ftypes: list[int]) -> bytes:
    """Hand-build a PNG whose rows use the given filter types, applying the
    forward filter transform the decoder must invert."""
    h, w, c = img.shape
    bpp = c
    raw = bytearray()
    prev = np.zeros(w * c, dtype=np.uint8)
    for y in range(h):
        row = img[y].reshape(-1).astype(np.int16)
        ft = ftypes[y % len(ftypes)]
        filt = row.copy()
        for x in range(len(row)):
            a = int(row[x - bpp]) if x >= bpp else 0
            b = int(prev[x])
            cc = int(prev[x - bpp]) if x >= bpp else 0
            if ft == 1:
                filt[x] = (row[x] - a) % 256
            elif ft == 2:
                filt[x] = (row[x] - b) % 256
            elif ft == 3:
                filt[x] = (row[x] - ((a + b) >> 1)) % 256
            elif ft == 4:
                p = a + b - cc
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - cc)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else cc)
                filt[x] = (row[x] - pred) % 256
        raw.append(ft)
        raw += filt.astype(np.uint8).tobytes()
        prev = row.astype(np.uint8)

    def chunk(ctype, data):
        return (struct.pack(">I", len(data)) + ctype + data
                + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, {3: 2, 4: 6}[c], 0, 0, 0)
    return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(bytes(raw))) + chunk(b"IEND", b""))


def test_png_all_filter_types():
    img = _rand_img(10, 6, 3, seed=9).reshape(10, 6, 3)
    payload = _png_with_filters(img, ftypes=[0, 1, 2, 3, 4])
    assert np.array_equal(decode_image(payload), img)


def test_png_palette():
    # 4-entry palette, 2x2 indexed image
    palette = np.array(
        [[255, 0, 0], [0, 255, 0], [0, 0, 255], [9, 9, 9]], dtype=np.uint8
    )
    idx = np.array([[0, 1], [2, 3]], dtype=np.uint8)

    def chunk(ctype, data):
        return (struct.pack(">I", len(data)) + ctype + data
                + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF))

    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 3, 0, 0, 0)
    raw = b"".join(b"\x00" + idx[y].tobytes() for y in range(2))
    payload = (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
               + chunk(b"PLTE", palette.tobytes())
               + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b""))
    assert np.array_equal(decode_image(payload), palette[idx])


# ---------------------------------------------------------------------------
# BMP


def _encode_bmp24(img: np.ndarray) -> bytes:
    h, w = img.shape[:2]
    row_bytes = (w * 3 + 3) & ~3
    body = bytearray()
    for y in range(h - 1, -1, -1):  # bottom-up
        row = img[y][:, [2, 1, 0]].tobytes()  # BGR on disk
        body += row + b"\x00" * (row_bytes - len(row))
    header = (b"BM" + struct.pack("<IHHI", 54 + len(body), 0, 0, 54)
              + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0,
                            len(body), 2835, 2835, 0, 0))
    return bytes(header) + bytes(body)


def test_bmp_roundtrip():
    img = _rand_img(5, 3, 3, seed=4)
    assert np.array_equal(decode_image(_encode_bmp24(img)), img)


# ---------------------------------------------------------------------------
# PPM / PGM


def test_ppm_roundtrip():
    img = _rand_img(6, 9, 3, seed=2)
    assert np.array_equal(decode_image(encode_ppm(img)), img)


def test_pgm_decode():
    img = _rand_img(4, 5, 1, seed=3)
    payload = b"P5 5 4 255\n" + img.tobytes()
    assert np.array_equal(decode_image(payload), img)


def test_ppm_encode_flattens_alpha_and_gray():
    rgba = _rand_img(3, 3, 4, seed=5)
    assert decode_image(encode_ppm(rgba)).shape == (3, 3, 3)
    gray = _rand_img(3, 3, 1, seed=6)
    assert decode_image(encode_ppm(gray)).shape == (3, 3, 3)


# ---------------------------------------------------------------------------
# failure modes


@pytest.mark.parametrize(
    "payload",
    [
        None,
        b"",
        b"\x89PNG\r\n\x1a\n",                       # magic only
        b"\xff\xd8\xff\xe0 not decodable jpeg",     # unsupported format
        b"BM" + bytes(20),                          # truncated BMP
        b"P6 banana\n",                             # bad PNM header
    ],
)
def test_decode_rejects_garbage(payload):
    with pytest.raises(ImageDecodeError):
        decode_image(payload)


def test_truncated_png_idat():
    img = _rand_img(8, 8, 3, seed=7)
    good = encode_png(img)
    with pytest.raises(ImageDecodeError):
        decode_image(good[:-20])


def _png_chunk(ctype: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data)) + ctype + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


@pytest.mark.parametrize(
    "payload",
    [
        # truncated IHDR: struct.error inside the parser without the net
        b"\x89PNG\r\n\x1a\n" + _png_chunk(b"IHDR", b"\x00\x00\x00\x08"),
        # valid header, corrupt IDAT: zlib.error without the net
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", struct.pack(">IIBBBBB", 4, 4, 8, 2, 0, 0, 0))
        + _png_chunk(b"IDAT", b"this is not zlib data")
        + _png_chunk(b"IEND", b""),
        # BMP header declaring 100x100 with no pixel data: ValueError from
        # np.frombuffer without the net
        b"BM" + bytes(8) + struct.pack("<I", 54) + struct.pack("<I", 40)
        + struct.pack("<ii", 100, 100) + struct.pack("<HH", 1, 24)
        + struct.pack("<I", 0) + bytes(20),
    ],
)
def test_malformed_payloads_raise_decode_error_only(payload):
    """Real-corpus truncated downloads must surface as ImageDecodeError —
    anything else escapes the multimodal operators' except clause and
    kills the whole mapInPandas job."""
    with pytest.raises(ImageDecodeError):
        decode_image(payload)


def test_png_decompression_bomb_rejected_before_inflate():
    """A few-KB payload declaring enormous dims must be rejected from the
    header alone — never expanded executor-side."""
    ihdr = struct.pack(">IIBBBBB", 1 << 20, 1 << 20, 8, 6, 0, 0, 0)
    bomb = (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(1 << 16)))
        + _png_chunk(b"IEND", b"")
    )
    with pytest.raises(ImageDecodeError, match="cap"):
        decode_image(bomb)


def test_png_idat_longer_than_declared_rejected():
    """IDAT inflating to more bytes than the header declares is malformed
    (and a bomb vector): inflate stops at the declared size and errors."""
    img = _rand_img(4, 4, 3, seed=3)
    raw = b"".join(b"\x00" + img[y].tobytes() for y in range(4)) + bytes(64)
    ihdr = struct.pack(">IIBBBBB", 4, 4, 8, 2, 0, 0, 0)
    payload = (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(raw))
        + _png_chunk(b"IEND", b"")
    )
    with pytest.raises(ImageDecodeError, match="mismatch"):
        decode_image(payload)


def test_wav_truncated_payloads():
    import io
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(2)
        wf.setsampwidth(2)
        wf.setframerate(8000)
        wf.writeframes(bytes(16))  # 4 full stereo int16 frames
    good = buf.getvalue()
    # data chunk still declares 16 bytes; reader gets what's there.
    # one int16 sample missing -> odd sample count, not divisible by 2ch
    with pytest.raises(ImageDecodeError, match="divisible"):
        decode_wav(good[:-2])
    # truncated mid-sample -> odd byte count for int16
    with pytest.raises(ImageDecodeError):
        decode_wav(good[:-1])


# ---------------------------------------------------------------------------
# WAV


def test_wav_roundtrip(tmp_path):
    import io
    import wave

    rng = np.random.default_rng(1)
    samples = rng.integers(-30000, 30000, size=(441, 2), dtype=np.int16)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(2)
        wf.setsampwidth(2)
        wf.setframerate(44100)
        wf.writeframes(samples.tobytes())
    arr, rate = decode_wav(buf.getvalue())
    assert rate == 44100 and arr.shape == (441, 2)
    assert np.array_equal(arr, samples)
    with pytest.raises(ImageDecodeError):
        decode_wav(b"RIFFgarbage")


# ---------------------------------------------------------------------------
# Spark end-to-end: the REAL decode path through mapInPandas


@pytest.fixture(scope="module")
def real_media(spark):
    imgs = {
        1: _rand_img(16, 12, 3, seed=11),
        2: _rand_img(9, 9, 1, seed=12),
    }
    rows = [
        (1, bytearray(encode_png(imgs[1]))),
        (2, bytearray(encode_ppm(imgs[2]))),
        (3, bytearray(b"\x00corrupt payload\x00" * 4)),
        (4, None),
    ]
    df = spark.createDataFrame(rows, "media_id bigint, payload binary")
    return df, imgs


def test_image_features_real(spark, real_media):
    from pandera_spark.operators.multimodal import image_features

    media, imgs = real_media
    out = {r.media_id: r
           for r in image_features(media, dim=12).collect()}
    assert len(out[1].feature) == 12
    assert (out[1].width, out[1].height) == (12, 16)
    assert all(0.0 <= v <= 1.0 for v in out[1].feature)
    # grid-mean features are computed from real pixels: whole-image mean of
    # the feature ~= mean pixel intensity
    approx = float(np.mean(imgs[1])) / 255.0
    assert abs(np.mean(out[1].feature) - approx) < 0.15
    assert out[2].feature is not None
    assert out[3].feature is None and out[3].width is None
    assert out[4].feature is None


def test_resize_images_real(spark, real_media):
    from pandera_spark.operators.multimodal import resize_images

    media, imgs = real_media
    out = {r.media_id: r
           for r in resize_images(media, width=4, height=6).collect()}
    resized = decode_image(bytes(out[1].payload))
    assert resized.shape == (6, 4, 3)
    assert (out[1].width, out[1].height) == (4, 6)
    # nearest-neighbor: every output pixel exists somewhere in the source
    src_px = {tuple(p) for p in imgs[1].reshape(-1, 3).tolist()}
    assert all(tuple(p) in src_px for p in resized.reshape(-1, 3).tolist())
    assert out[3].payload is None  # corrupt in -> null out


def test_sample_frames_real(spark, real_media):
    from pandera_spark.operators.multimodal import sample_frames

    media, imgs = real_media
    frames = sample_frames(media).collect()
    by_id = {r.media_id: r for r in frames}
    # still image -> exactly one frame, itself decodable, same pixels
    assert [r.frame_idx for r in frames] == [0] * len(frames)
    assert np.array_equal(decode_image(bytes(by_id[1].frame)), imgs[1])
    assert 3 not in by_id and 4 not in by_id
