"""Dependency-free media codecs for the multimodal operators.

Real decoding without optional libraries:

- **BMP** (24-bit uncompressed, the format every tool can write): pure
  numpy against the public BITMAPINFOHEADER layout — decode to an
  (h, w, 3) RGB array, encode back, nearest-neighbour resize.
- **PNG** (8-bit truecolor/RGBA/greyscale, non-interlaced): stdlib
  zlib against the RFC 2083 chunk layout, with full scanline
  unfiltering (filters 0-4) on decode.
- **WAV** (PCM16): stdlib ``wave`` + numpy.

When Pillow is importable it is preferred for image decode (JPEG and
anything else PIL reads); otherwise BMP and PNG payloads decode
natively and other formats raise ``UnsupportedMediaError`` so callers
can fall back to the deterministic stand-in (``fake=True``) or skip.

All functions are plain bytes→numpy transforms — executors call them
inside Arrow-batched ``mapInPandas`` stages; nothing here touches Spark.
"""

from __future__ import annotations

import io
import struct
import wave

import numpy as np


class UnsupportedMediaError(ValueError):
    """Payload is not in a format this environment can decode."""


def has_pil() -> bool:
    try:
        import PIL.Image  # noqa: F401

        return True
    except ImportError:
        return False


# --- BMP ---------------------------------------------------------------------

_BMP_HEADER = struct.Struct("<2sIHHI")  # magic, file size, res, res, offset
_DIB_HEADER = struct.Struct("<IiiHHIIiiII")  # BITMAPINFOHEADER


def encode_bmp(pixels: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB → 24-bit uncompressed BMP bytes."""
    arr = np.asarray(pixels, dtype=np.uint8)
    if arr.ndim != 3 or arr.shape[2] != 3:
        raise ValueError("expected (h, w, 3) RGB array")
    h, w, _ = arr.shape
    row_len = (w * 3 + 3) & ~3  # rows padded to 4 bytes
    img_size = row_len * h
    offset = _BMP_HEADER.size + _DIB_HEADER.size
    out = bytearray()
    out += _BMP_HEADER.pack(b"BM", offset + img_size, 0, 0, offset)
    out += _DIB_HEADER.pack(40, w, h, 1, 24, 0, img_size, 2835, 2835, 0, 0)
    bgr = arr[:, :, ::-1]  # BMP stores BGR
    pad = b"\x00" * (row_len - w * 3)
    for row in bgr[::-1]:  # bottom-up
        out += row.tobytes() + pad
    return bytes(out)


def decode_bmp(payload: bytes) -> np.ndarray:
    """24/32-bit uncompressed BMP bytes → (h, w, 3) uint8 RGB array."""
    if payload[:2] != b"BM":
        raise UnsupportedMediaError("not a BMP payload")
    _, _, _, _, offset = _BMP_HEADER.unpack_from(payload, 0)
    (
        dib_size,
        w,
        h,
        _planes,
        bpp,
        compression,
        *_,
    ) = _DIB_HEADER.unpack_from(payload, _BMP_HEADER.size)
    if compression != 0 or bpp not in (24, 32):
        raise UnsupportedMediaError(
            f"unsupported BMP variant (bpp={bpp}, compression={compression})"
        )
    flip = h > 0  # positive height = bottom-up rows
    h = abs(h)
    nbytes = bpp // 8
    row_len = (w * nbytes + 3) & ~3
    data = np.frombuffer(payload, dtype=np.uint8, count=row_len * h, offset=offset)
    rows = data.reshape(h, row_len)[:, : w * nbytes].reshape(h, w, nbytes)
    rgb = rows[:, :, 2::-1]  # BGR(A) → RGB
    return (rgb[::-1] if flip else rgb).copy()


# --- PNG (dependency-free: stdlib zlib + the public RFC 2083 layout) ---------

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_chunk(tag: bytes, body: bytes) -> bytes:
    import zlib

    return (
        struct.pack(">I", len(body))
        + tag
        + body
        + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
    )


def encode_png(pixels: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB → 8-bit truecolor PNG (filter 0 scanlines,
    one zlib IDAT). Pure stdlib — gives the repo REAL PNG test vectors
    and payloads in environments without Pillow."""
    import zlib

    arr = np.asarray(pixels, dtype=np.uint8)
    if arr.ndim != 3 or arr.shape[2] != 3:
        raise ValueError("expected (h, w, 3) RGB array")
    h, w, _ = arr.shape
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)  # 8-bit RGB
    raw = b"".join(b"\x00" + row.tobytes() for row in arr)
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(raw, 6))
        + _png_chunk(b"IEND", b"")
    )


def decode_png(payload: bytes) -> np.ndarray:
    """8-bit non-interlaced truecolor/RGBA/greyscale PNG → (h, w, 3)
    uint8 RGB, with full scanline unfiltering (filters 0-4 per the
    spec). Palette/interlaced/16-bit variants raise
    ``UnsupportedMediaError`` — callers fall back exactly as for exotic
    BMPs."""
    import zlib

    if payload[: len(_PNG_SIG)] != _PNG_SIG:
        raise UnsupportedMediaError("not a PNG payload")
    pos, idat, meta = len(_PNG_SIG), [], None
    # struct/zlib failures on truncated or corrupt payloads must keep
    # the documented contract (UnsupportedMediaError) — callers catch
    # that specific type to fall back, and a leaked struct.error inside
    # a per-row decode fails the whole Spark task on one bad image
    try:
        while pos + 8 <= len(payload):
            (length,) = struct.unpack_from(">I", payload, pos)
            tag = payload[pos + 4 : pos + 8]
            body = payload[pos + 8 : pos + 8 + length]
            pos += 12 + length
            if tag == b"IHDR":
                meta = struct.unpack(">IIBBBBB", body)
            elif tag == b"IDAT":
                idat.append(body)
            elif tag == b"IEND":
                break
    except struct.error as exc:
        raise UnsupportedMediaError(f"corrupt PNG chunk layout: {exc}") from exc
    if meta is None or not idat:
        raise UnsupportedMediaError("truncated PNG")
    w, h, depth, color, _comp, _filt, interlace = meta
    channels = {0: 1, 2: 3, 4: 2, 6: 4}.get(color)
    if depth != 8 or channels is None or interlace != 0:
        raise UnsupportedMediaError(
            f"unsupported PNG variant (depth={depth}, color={color}, "
            f"interlace={interlace})"
        )
    try:
        raw = zlib.decompress(b"".join(idat))
    except zlib.error as exc:
        raise UnsupportedMediaError(f"corrupt PNG IDAT stream: {exc}") from exc
    stride = w * channels
    if len(raw) != h * (stride + 1):
        raise UnsupportedMediaError("PNG scanline size mismatch")
    out = np.empty((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        ftype = raw[y * (stride + 1)]
        line = np.frombuffer(
            raw, dtype=np.uint8, count=stride, offset=y * (stride + 1) + 1
        ).copy()
        if ftype == 0:
            pass
        elif ftype == 2:  # Up
            line += prev
        elif ftype in (1, 3, 4):  # Sub / Average / Paeth need a scan
            a = np.zeros(channels, dtype=np.int32)
            for x in range(0, stride, channels):
                b = prev[x : x + channels].astype(np.int32)
                cur = line[x : x + channels].astype(np.int32)
                if ftype == 1:
                    cur = (cur + a) & 0xFF
                elif ftype == 3:
                    cur = (cur + ((a + b) >> 1)) & 0xFF
                else:
                    c = (
                        prev[x - channels : x].astype(np.int32)
                        if x
                        else np.zeros(channels, dtype=np.int32)
                    )
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = np.where(
                        (pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c)
                    )
                    cur = (cur + pred) & 0xFF
                line[x : x + channels] = cur.astype(np.uint8)
                a = cur
        else:
            raise UnsupportedMediaError(f"unknown PNG filter {ftype}")
        out[y] = line
        prev = out[y]
    px = out.reshape(h, w, channels)
    if channels == 3:
        return px.copy()
    if channels == 4:
        return px[:, :, :3].copy()
    grey = px[:, :, 0]
    return np.repeat(grey[:, :, None], 3, axis=2).copy()


def decode_image(payload: bytes) -> np.ndarray:
    """bytes → (h, w, 3) uint8 RGB. Pillow when available (JPEG and
    everything else PIL reads); the dependency-free BMP and PNG codecs
    otherwise."""
    if has_pil():
        import PIL.Image

        with PIL.Image.open(io.BytesIO(payload)) as im:
            return np.asarray(im.convert("RGB"))
    if payload[: len(_PNG_SIG)] == _PNG_SIG:
        return decode_png(payload)
    return decode_bmp(payload)


def resize_nearest(pixels: np.ndarray, width: int, height: int) -> np.ndarray:
    """Nearest-neighbour resample to (height, width, 3)."""
    h, w = pixels.shape[:2]
    ys = (np.arange(height) * h // height).clip(0, h - 1)
    xs = (np.arange(width) * w // width).clip(0, w - 1)
    return pixels[ys][:, xs]


def resize_image(
    payload: bytes, width: int, height: int, nearest: bool = False
) -> bytes:
    """Decode → resize → re-encode. Pillow path keeps PIL's default
    resampler; the BMP path is nearest-neighbour numpy.
    ``nearest=True`` forces the nearest-neighbour resampler regardless
    of Pillow availability — the ENVIRONMENT-INDEPENDENT contract the
    oracle-checked m8 query depends on (PIL's default is bicubic, which
    would change the pixels wherever Pillow happens to be installed)."""
    if nearest:
        # decode_image (PIL or BMP) → OUR resampler: identical pixels
        # in every environment (PIL's own NEAREST samples a different
        # grid than the i*h//height contract the oracle replays)
        return encode_bmp(
            resize_nearest(decode_image(payload), width, height)
        )
    if has_pil():
        import PIL.Image

        with PIL.Image.open(io.BytesIO(payload)) as im:
            buf = io.BytesIO()
            im.convert("RGB").resize((width, height)).save(buf, format="BMP")
            return buf.getvalue()
    return encode_bmp(resize_nearest(decode_image(payload), width, height))


# --- WAV ---------------------------------------------------------------------


def encode_wav(samples: np.ndarray, sample_rate: int = 16_000) -> bytes:
    """1-D int16 PCM array → mono WAV bytes (stdlib ``wave``)."""
    arr = np.asarray(samples, dtype=np.int16)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(sample_rate)
        wf.writeframes(arr.tobytes())
    return buf.getvalue()


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """WAV bytes → (1-D int16 PCM array of the first channel, rate)."""
    if payload[:4] != b"RIFF":
        raise UnsupportedMediaError("not a WAV payload")
    with wave.open(io.BytesIO(payload), "rb") as wf:
        if wf.getsampwidth() != 2:
            raise UnsupportedMediaError(
                f"unsupported sample width {wf.getsampwidth()}"
            )
        frames = wf.readframes(wf.getnframes())
        arr = np.frombuffer(frames, dtype=np.int16)
        if wf.getnchannels() > 1:
            arr = arr[:: wf.getnchannels()]
        return arr.copy(), wf.getframerate()


def split_wav(payload: bytes, n: int) -> list[bytes]:
    """Sample ``n`` equal-duration chunks, each re-encoded as a
    standalone WAV (real frame sampling for the audio path)."""
    samples, rate = decode_wav(payload)
    if len(samples) == 0 or n <= 0:
        return []
    n = min(n, len(samples))
    bounds = np.linspace(0, len(samples), n + 1, dtype=int)
    return [
        encode_wav(samples[a:b], rate)
        for a, b in zip(bounds[:-1], bounds[1:])
        if b > a
    ]


def image_features(pixels: np.ndarray, dim: int = 16) -> list[float]:
    """Deterministic real feature vector: per-channel means + a coarse
    luminance histogram, padded/truncated to ``dim`` (unit scale)."""
    arr = pixels.astype(np.float64) / 255.0
    means = arr.reshape(-1, 3).mean(axis=0)
    lum = arr @ np.array([0.299, 0.587, 0.114])
    hist, _ = np.histogram(lum, bins=max(dim - 3, 1), range=(0.0, 1.0))
    total = max(int(hist.sum()), 1)
    feats = list(means) + [float(c) / total for c in hist]
    return [float(x) for x in (feats + [0.0] * dim)[:dim]]
