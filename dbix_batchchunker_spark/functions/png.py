"""Stdlib-only PNG codec for the multimodal decode seam.

The multimodal operators (operators/multimodal.py) keep the pixel stage
pluggable because this container has no media libraries; until round 8 the
only ready codec (``pil_codec``) needed Pillow, so no test had ever pushed
a REAL image through the seam (round-7 verdict "Next round #4"). This
module closes that: a complete PNG decode path — zlib inflate + per-
scanline filter reconstruction per the PNG specification (RFC 2083 /
W3C PNG, public knowledge) — plus a matching encoder for fixtures, built
from ``zlib``/``struct`` alone.

Scope (deliberate): 8-bit depth, color types 0 (gray), 2 (RGB), 4
(gray+alpha), 6 (RGBA), no interlace — the shapes a training-data corpus
overwhelmingly contains. Palette (type 3), 16-bit, and Adam7 raise
``NotImplementedError`` with a pointer to ``pil_codec``; a silently wrong
decode would poison every downstream hash.

Provided seam adapters (all module-level → picklable into executor
closures):

- :func:`png_resize_codec` — ``ResizeCodec`` contract (raw pixel bytes,
  like PIL's ``.tobytes()``), nearest-neighbor resample.
- :func:`png_feature_codec` — ``decode_binary_column`` contract
  ``payload -> (width, height, n_frames, feature)``.
- :func:`png_gray_ahash` — mm04's 64-bit aHash over DECODED grayscale
  pixels instead of raw bytes.
"""

from __future__ import annotations

import struct
import zlib

_SIG = b"\x89PNG\r\n\x1a\n"
#: color type -> samples per pixel (8-bit depth → bytes per pixel)
_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def _paeth(a: int, b: int, c: int) -> int:
    """Paeth predictor (PNG spec §6.6): nearest of left/up/up-left to
    a+b-c, ties broken left, up, up-left."""
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def _chunk(typ: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + typ
        + data
        + struct.pack(">I", zlib.crc32(typ + data))
    )


def encode_png(
    pixels: bytes,
    width: int,
    height: int,
    channels: int = 3,
    filter_type: int = 0,
    compress_level: int = -1,
) -> bytes:
    """Raw 8-bit row-major pixels -> PNG bytes.

    ``filter_type`` applies ONE filter (0..4) to every scanline — fixtures
    use 1..4 to exercise each of the decoder's reconstruction paths (the
    known-answer vectors in tests/test_multimodal_png.py guard against a
    matched encoder/decoder sign error cancelling out).

    ``compress_level`` passes through to zlib (-1 = library default).
    Level 0 emits STORED deflate blocks, making the payload size a closed
    form of the geometry — 11 + raw bytes of zlib for raw <= 65535, raw =
    height·(1 + width·channels) — which is what lets mm06's oracle state
    payload_bytes exactly; every decoder inflates stored blocks
    identically, so nothing else changes."""
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[channels]
    stride = width * channels
    if len(pixels) != stride * height:
        raise ValueError(
            f"pixels: got {len(pixels)} bytes, need {stride * height} "
            f"({width}x{height}x{channels})"
        )
    if not 0 <= filter_type <= 4:
        raise ValueError(f"filter_type must be 0..4, got {filter_type}")
    raw = bytearray()
    prev = bytes(stride)
    for y in range(height):
        row = pixels[y * stride : (y + 1) * stride]
        raw.append(filter_type)
        for i in range(stride):
            x = row[i]
            a = row[i - channels] if i >= channels else 0
            b = prev[i]
            c = prev[i - channels] if i >= channels else 0
            if filter_type == 0:
                raw.append(x)
            elif filter_type == 1:  # Sub
                raw.append((x - a) & 0xFF)
            elif filter_type == 2:  # Up
                raw.append((x - b) & 0xFF)
            elif filter_type == 3:  # Average
                raw.append((x - ((a + b) >> 1)) & 0xFF)
            else:  # Paeth
                raw.append((x - _paeth(a, b, c)) & 0xFF)
        prev = row
    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    return (
        _SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(raw), compress_level))
        + _chunk(b"IEND", b"")
    )


def decode_png(payload: bytes) -> tuple[int, int, int, bytes]:
    """PNG bytes -> (width, height, channels, raw 8-bit row-major pixels).

    Full format path: signature, chunk walk (IDAT segments concatenated —
    encoders may split them arbitrarily), zlib inflate, per-scanline
    filter reconstruction (None/Sub/Up/Average/Paeth)."""
    if payload[:8] != _SIG:
        raise ValueError("not a PNG: bad signature")
    pos = 8
    width = height = -1
    channels = 0
    idat = bytearray()
    while pos + 8 <= len(payload):
        (length,) = struct.unpack_from(">I", payload, pos)
        typ = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + length]
        pos += 12 + length  # length + type + data + crc
        if typ == b"IHDR":
            width, height, depth, color_type, _comp, _filt, interlace = (
                struct.unpack(">IIBBBBB", data)
            )
            if depth != 8:
                raise NotImplementedError(
                    f"bit depth {depth}: only 8-bit supported (use pil_codec)"
                )
            if color_type not in _CHANNELS:
                raise NotImplementedError(
                    f"color type {color_type} (palette?): unsupported "
                    "(use pil_codec)"
                )
            if interlace:
                raise NotImplementedError(
                    "Adam7 interlace unsupported (use pil_codec)"
                )
            channels = _CHANNELS[color_type]
        elif typ == b"IDAT":
            idat += data
        elif typ == b"IEND":
            break
    if width < 0:
        raise ValueError("not a PNG: no IHDR chunk")
    raw = zlib.decompress(bytes(idat))
    stride = width * channels
    if len(raw) != (stride + 1) * height:
        raise ValueError(
            f"corrupt PNG: {len(raw)} filtered bytes for "
            f"{height} rows of stride {stride}"
        )
    out = bytearray(stride * height)
    prev = bytes(stride)
    for y in range(height):
        ft = raw[(stride + 1) * y]
        line = raw[(stride + 1) * y + 1 : (stride + 1) * (y + 1)]
        row = bytearray(stride)
        if ft == 0:
            row[:] = line
        elif ft == 1:  # Sub
            for i in range(stride):
                a = row[i - channels] if i >= channels else 0
                row[i] = (line[i] + a) & 0xFF
        elif ft == 2:  # Up
            for i in range(stride):
                row[i] = (line[i] + prev[i]) & 0xFF
        elif ft == 3:  # Average
            for i in range(stride):
                a = row[i - channels] if i >= channels else 0
                row[i] = (line[i] + ((a + prev[i]) >> 1)) & 0xFF
        elif ft == 4:  # Paeth
            for i in range(stride):
                a = row[i - channels] if i >= channels else 0
                c = prev[i - channels] if i >= channels else 0
                row[i] = (line[i] + _paeth(a, prev[i], c)) & 0xFF
        else:
            raise ValueError(f"corrupt PNG: filter type {ft} on row {y}")
        out[y * stride : (y + 1) * stride] = row
        prev = bytes(row)
    return width, height, channels, bytes(out)


def _nearest_resample(
    pixels: bytes, sw: int, sh: int, channels: int, dw: int, dh: int
) -> bytes:
    """Nearest-neighbor resample via one numpy fancy-index (no Python
    per-pixel loop)."""
    import numpy as np

    arr = np.frombuffer(pixels, dtype=np.uint8).reshape(sh, sw, channels)
    ys = (np.arange(dh) * sh) // dh
    xs = (np.arange(dw) * sw) // dw
    return arr[ys][:, xs].tobytes()


def png_resize_codec(payload: bytes, width: int, height: int) -> bytes:
    """ResizeCodec-contract adapter: decode PNG, nearest-neighbor resample
    to (width, height), return RAW pixel bytes — the same contract as
    ``pil_codec`` (PIL's ``.resize().tobytes()``), so the two are drop-in
    interchangeable behind ``resize_binary_column``."""
    sw, sh, channels, pixels = decode_png(payload)
    return _nearest_resample(pixels, sw, sh, channels, width, height)


def png_feature_codec(payload: bytes) -> tuple[int, int, int, list[float]]:
    """``decode_binary_column`` codec contract:
    ``payload -> (width, height, n_frames, feature)`` with a real decode.
    Feature = per-channel pixel means in [0, 1], zero-padded to 4 floats
    (stable schema across gray/RGB/RGBA corpora); a still image is one
    frame."""
    import numpy as np

    width, height, channels, pixels = decode_png(payload)
    arr = np.frombuffer(pixels, dtype=np.uint8).reshape(-1, channels)
    means = (arr.mean(axis=0) / 255.0).tolist()
    return width, height, 1, [float(m) for m in (means + [0.0] * 4)[:4]]


def png_gray_ahash(payload: bytes) -> int:
    """mm04 hasher-contract adapter: 64-bit aHash over DECODED pixels —
    grayscale (channel mean, alpha dropped), 8x8 nearest-neighbor
    downsample, threshold at the grid mean. Signed two's complement to
    match Spark's LongType, same as the byte-stream stand-in."""
    import numpy as np

    width, height, channels, pixels = decode_png(payload)
    arr = np.frombuffer(pixels, dtype=np.uint8).reshape(height, width, channels)
    if channels in (2, 4):  # drop alpha before the luma mean
        arr = arr[:, :, :-1]
    gray = arr.astype(np.float64).mean(axis=2)
    ys = (np.arange(8) * height) // 8
    xs = (np.arange(8) * width) // 8
    grid = gray[ys][:, xs]
    bits = (grid >= grid.mean()).astype(np.uint64).ravel()
    h = int((bits << np.arange(64, dtype=np.uint64)).sum(dtype=np.uint64))
    return h - (1 << 64) if h >= 1 << 63 else h
