"""Real image/audio codecs for the multimodal operators — no third-party
image library required.

``decode_image`` genuinely decodes the three formats implementable from the
stdlib: PNG (zlib inflate + per-row unfilter), uncompressed BMP, and binary
PPM/PGM.  When Pillow is importable it is preferred (any format it knows);
the pure decoder is the fallback so the pipeline works in minimal
containers.  ``decode_wav`` parses RIFF/WAVE PCM from the stdlib ``wave``
module.

Everything here runs INSIDE Arrow-batched ``mapInPandas`` workers
(multimodal.py) — per-payload Python cost is the codec itself, which is
unavoidable; the Spark-side contract (batch shape, schema, payload pruning
before shuffle) is unchanged from the plumbing-only r1 design.
"""

from __future__ import annotations

import io
import struct
import zlib

import numpy as np

__all__ = [
    "decode_image",
    "encode_ppm",
    "encode_png",
    "decode_wav",
    "ImageDecodeError",
]


class ImageDecodeError(ValueError):
    """Payload is not a decodable image."""


def _pil_decode(payload: bytes):
    try:  # pragma: no cover - Pillow absent in this container
        from PIL import Image
    except ImportError:
        return None
    try:  # pragma: no cover
        img = Image.open(io.BytesIO(payload))
        # normalize to the documented uint8 contract: palette and
        # high-bit-depth modes (P, I, I;16, F, ...) convert to RGB/L
        if img.mode not in ("L", "LA", "RGB", "RGBA"):
            img = img.convert("RGB")
        arr = np.asarray(img)
        if arr.dtype != np.uint8:
            arr = np.asarray(img.convert("RGB"))
        return arr
    except Exception:  # noqa: BLE001 - genuinely fall through
        # a Pillow failure is not terminal: the pure decoder gets its
        # shot, and ImageDecodeError is raised there if it also fails
        return None


# ---------------------------------------------------------------------------
# PNG — https://www.w3.org/TR/png/ ; 8-bit non-interlaced, color types
# 0 (gray) / 2 (RGB) / 3 (palette) / 4 (gray+alpha) / 6 (RGBA)
# ---------------------------------------------------------------------------

_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}
#: cap on DECLARED decoded size (256 MiB ≈ a 9000x9000 RGBA frame):
#: payloads are untrusted; anything larger is rejected before inflate
_PNG_MAX_DECODED_BYTES = 1 << 28


def _png_unfilter(raw: bytes, h: int, stride: int, bpp: int) -> np.ndarray:
    out = np.empty((h, stride), dtype=np.uint8)
    pos = 0
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        ftype = raw[pos]
        row = np.frombuffer(raw, np.uint8, stride, pos + 1).copy()
        pos += 1 + stride
        if ftype == 0:
            pass
        elif ftype == 1:  # Sub
            for x in range(bpp, stride):
                row[x] = (int(row[x]) + int(row[x - bpp])) & 0xFF
        elif ftype == 2:  # Up
            row += prev
        elif ftype == 3:  # Average
            for x in range(stride):
                left = int(row[x - bpp]) if x >= bpp else 0
                row[x] = (row[x] + ((left + int(prev[x])) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for x in range(stride):
                a = int(row[x - bpp]) if x >= bpp else 0
                b = int(prev[x])
                c = int(prev[x - bpp]) if x >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                row[x] = (row[x] + pred) & 0xFF
        else:
            raise ImageDecodeError(f"bad PNG filter type {ftype}")
        out[y] = row
        prev = row
    return out


def _decode_png(payload: bytes) -> np.ndarray:
    pos = len(_PNG_MAGIC)
    width = height = None
    color_type = bit_depth = None
    idat = bytearray()
    palette = None
    while pos + 8 <= len(payload):
        (length,) = struct.unpack(">I", payload[pos:pos + 4])
        ctype = payload[pos + 4:pos + 8]
        data = payload[pos + 8:pos + 8 + length]
        pos += 12 + length  # length + type + data + crc
        if ctype == b"IHDR":
            width, height, bit_depth, color_type, _comp, _filt, interlace = (
                struct.unpack(">IIBBBBB", data)
            )
            if interlace != 0:
                raise ImageDecodeError("interlaced PNG not supported")
            if bit_depth != 8:
                raise ImageDecodeError(f"PNG bit depth {bit_depth} != 8")
            if color_type not in _PNG_CHANNELS:
                raise ImageDecodeError(f"PNG color type {color_type}")
        elif ctype == b"PLTE":
            palette = np.frombuffer(data, np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat += data
        elif ctype == b"IEND":
            break
    if width is None or not idat:
        raise ImageDecodeError("PNG missing IHDR/IDAT")
    channels = _PNG_CHANNELS[color_type]
    stride = width * channels
    # decompression-bomb guard: the header can declare dims up to 2^31,
    # so cap the *declared* decoded size BEFORE inflating and never
    # inflate past it (a few-KB bomb otherwise expands to GiB inside
    # every executor worker processing untrusted payloads)
    expected = (stride + 1) * height
    if expected == 0:
        raise ImageDecodeError("PNG declares zero-sized image")
    if expected > _PNG_MAX_DECODED_BYTES:
        raise ImageDecodeError(
            f"PNG declares {width}x{height}x{channels} "
            f"({expected} bytes decoded) > cap {_PNG_MAX_DECODED_BYTES}"
        )
    d = zlib.decompressobj()
    raw = d.decompress(bytes(idat), expected)
    # not d.eof catches BOTH a truncated stream (missing tail/checksum)
    # and one that would inflate past `expected` (max_length stopped it
    # before the end-of-stream marker); unused_data is trailing garbage
    if len(raw) != expected or not d.eof or d.unused_data:
        raise ImageDecodeError("PNG pixel data size mismatch")
    px = _png_unfilter(raw, height, stride, channels)
    arr = px.reshape(height, width, channels)
    if color_type == 3:
        if palette is None:
            raise ImageDecodeError("palette PNG without PLTE")
        arr = palette[arr[:, :, 0]]
    return arr.squeeze(axis=2) if arr.shape[2] == 1 else arr


# ---------------------------------------------------------------------------
# BMP — uncompressed 24/32-bit (BITMAPINFOHEADER), bottom-up or top-down
# ---------------------------------------------------------------------------


def _decode_bmp(payload: bytes) -> np.ndarray:
    if len(payload) < 54:
        raise ImageDecodeError("BMP too short")
    (data_offset,) = struct.unpack("<I", payload[10:14])
    width, height = struct.unpack("<ii", payload[18:26])
    (bpp,) = struct.unpack("<H", payload[28:30])
    (compression,) = struct.unpack("<I", payload[30:34])
    if compression != 0 or bpp not in (24, 32):
        raise ImageDecodeError(f"BMP bpp={bpp} compression={compression}")
    top_down = height < 0
    height = abs(height)
    nch = bpp // 8
    row_bytes = (width * nch + 3) & ~3  # rows pad to 4-byte boundaries
    rows = []
    for y in range(height):
        off = data_offset + y * row_bytes
        row = np.frombuffer(payload, np.uint8, width * nch, off)
        rows.append(row.reshape(width, nch))
    arr = np.stack(rows if top_down else rows[::-1])
    return arr[:, :, [2, 1, 0]] if nch == 3 else arr[:, :, [2, 1, 0, 3]]


# ---------------------------------------------------------------------------
# PPM / PGM (binary P6 / P5)
# ---------------------------------------------------------------------------


def _decode_pnm(payload: bytes) -> np.ndarray:
    toks: list[bytes] = []
    pos = 2
    while len(toks) < 3 and pos < len(payload):
        # header tokens separated by whitespace; '#' starts a comment line
        while pos < len(payload) and payload[pos:pos + 1].isspace():
            pos += 1
        if payload[pos:pos + 1] == b"#":
            while pos < len(payload) and payload[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos:pos + 1].isspace():
            pos += 1
        toks.append(payload[start:pos])
    pos += 1  # single whitespace after maxval
    try:
        width, height, maxval = (int(t) for t in toks)
    except ValueError as exc:
        raise ImageDecodeError("bad PNM header") from exc
    if maxval != 255:
        raise ImageDecodeError(f"PNM maxval {maxval} != 255")
    nch = 3 if payload[:2] == b"P6" else 1
    need = width * height * nch
    if len(payload) - pos < need:
        raise ImageDecodeError("PNM pixel data truncated")
    arr = np.frombuffer(payload, np.uint8, need, pos)
    arr = arr.reshape(height, width, nch)
    return arr.squeeze(axis=2) if nch == 1 else arr


def decode_image(payload: bytes) -> np.ndarray:
    """Decode an image payload to a ``uint8`` array, ``(H, W)`` for
    grayscale or ``(H, W, C)`` for RGB/RGBA.

    Prefers Pillow when installed; otherwise decodes PNG / BMP / binary
    PPM/PGM with the stdlib.  Raises :class:`ImageDecodeError` for null,
    truncated, or unrecognized payloads.
    """
    if payload is None or len(payload) < 8:
        raise ImageDecodeError("empty or truncated payload")
    via_pil = _pil_decode(payload)
    if via_pil is not None:  # pragma: no cover - Pillow absent here
        return via_pil
    # malformed payloads with a valid magic surface low-level errors
    # (struct.error on a truncated IHDR, zlib.error on corrupt IDAT,
    # ValueError from np.frombuffer on missing pixel data, ...) — fold
    # them all into ImageDecodeError so the multimodal operators' "corrupt
    # payload -> null row" contract holds (truncated downloads are common
    # in real corpora; one must never kill a whole mapInPandas job)
    try:
        if payload[:8] == _PNG_MAGIC:
            return _decode_png(payload)
        if payload[:2] == b"BM":
            return _decode_bmp(payload)
        if payload[:2] in (b"P5", b"P6"):
            return _decode_pnm(payload)
    except ImageDecodeError:
        raise
    except (struct.error, zlib.error, ValueError, IndexError) as exc:
        raise ImageDecodeError(f"malformed image payload: {exc}") from exc
    raise ImageDecodeError(
        f"unrecognized image format (magic {payload[:4]!r}); "
        "supported without Pillow: PNG, BMP, PPM/PGM"
    )


def encode_ppm(arr: np.ndarray) -> bytes:
    """Encode an image array as binary PPM (P6) — the interchange format
    the resize operator emits so its output payloads are themselves
    decodable by :func:`decode_image`."""
    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim == 2:
        a = np.repeat(a[:, :, None], 3, axis=2)
    if a.shape[2] == 4:
        a = a[:, :, :3]
    h, w = a.shape[:2]
    return b"P6 %d %d 255\n" % (w, h) + a.tobytes()


def encode_png(arr: np.ndarray) -> bytes:
    """Minimal PNG encoder (filter-0 rows + zlib): lets tests and synthetic
    pipelines produce payloads that exercise the *real* PNG decode path."""
    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim == 2:
        a = a[:, :, None]
    h, w, nch = a.shape
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[nch]

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data)) + ctype + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    raw = b"".join(b"\x00" + a[y].tobytes() for y in range(h))
    return (
        _PNG_MAGIC
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """Decode a RIFF/WAVE PCM payload -> (samples[frames, channels] as
    int16/int32/uint8, sample_rate) via the stdlib ``wave`` module."""
    import wave

    try:
        with wave.open(io.BytesIO(payload), "rb") as wf:
            nch = wf.getnchannels()
            rate = wf.getframerate()
            width = wf.getsampwidth()
            frames = wf.readframes(wf.getnframes())
    except (wave.Error, EOFError) as exc:
        raise ImageDecodeError(f"bad WAV payload: {exc}") from exc
    dtype = {1: np.uint8, 2: np.int16, 4: np.int32}.get(width)
    if dtype is None:
        raise ImageDecodeError(f"unsupported WAV sample width {width}")
    try:
        arr = np.frombuffer(frames, dtype=dtype)
    except ValueError as exc:  # truncated mid-sample
        raise ImageDecodeError(f"WAV data truncated mid-sample: {exc}") from exc
    if nch <= 0 or arr.size % nch:
        raise ImageDecodeError(
            f"WAV frame data ({arr.size} samples) not divisible into "
            f"{nch} channels"
        )
    return arr.reshape(-1, nch), rate
