"""Stdlib-only WAV (RIFF/PCM) codec — the audio sibling of functions/png.py.

Same rationale: the multimodal seam keeps the payload stage pluggable, and
this container has no audio libraries, so the proof that the seam handles
REAL media lives on formats the standard library can parse. WAV is a RIFF
container (public specification: RIFF chunks 'fmt ' + 'data', PCM samples
little-endian) — ``struct`` covers it completely.

Scope: uncompressed integer PCM (format tag 1), 8/16/32-bit, any channel
count and sample rate; extensible/float/compressed formats raise
``NotImplementedError`` rather than mis-decode. Chunk walk tolerates extra
chunks (LIST/fact/cue) and odd-length padding per the RIFF rule.

Seam adapter: :func:`wav_stats_codec` for ``mapInPandas`` — one dict of
plain scalars per payload (duration, rate, channels, RMS, peak), the
feature row an audio corpus pipeline derives per clip.
"""

from __future__ import annotations

import struct

_PCM_WIDTHS = {8: "B", 16: "h", 32: "i"}  # bits -> struct code (8-bit is unsigned)


def encode_wav(
    samples: "list[int]",
    sample_rate: int = 8000,
    n_channels: int = 1,
    bits: int = 16,
) -> bytes:
    """Interleaved integer samples -> WAV bytes (PCM). Fixture-grade
    encoder: exact inverse of :func:`decode_wav` for supported widths."""
    if bits not in _PCM_WIDTHS:
        raise ValueError(f"bits must be one of {sorted(_PCM_WIDTHS)}")
    if len(samples) % n_channels:
        raise ValueError("len(samples) must be a multiple of n_channels")
    code = _PCM_WIDTHS[bits]
    try:  # ndarray fast path — tobytes() is the same little-endian layout
        import numpy as np

        if isinstance(samples, np.ndarray):
            data = samples.astype(_NP_DTYPES[bits]).tobytes()
        else:
            data = struct.pack(f"<{len(samples)}{code}", *samples)
    except ImportError:
        data = struct.pack(f"<{len(samples)}{code}", *samples)
    block_align = n_channels * bits // 8
    fmt = struct.pack(
        "<HHIIHH", 1, n_channels, sample_rate,
        sample_rate * block_align, block_align, bits,
    )
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
        + (b"\0" if len(data) % 2 else b"")  # RIFF pads odd chunks
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


#: numpy dtypes for the PCM widths (little-endian, matching struct codes)
_NP_DTYPES = {8: "<u1", 16: "<i2", 32: "<i4"}


def decode_wav(payload: bytes) -> tuple[int, int, int, "list[int]"]:
    """WAV bytes -> (sample_rate, n_channels, bits, interleaved samples).

    Full RIFF walk: unknown chunks are skipped (odd lengths padded), the
    'fmt ' chunk gates the format, 'data' carries the PCM frames."""
    rate, channels, bits, data = _decode_wav_raw(payload)
    code = _PCM_WIDTHS[bits]
    width = bits // 8
    n = len(data) // width
    return (
        rate,
        channels,
        bits,
        list(struct.unpack(f"<{n}{code}", data[: n * width])),
    )


def _decode_wav_raw(payload: bytes) -> tuple[int, int, int, bytes]:
    """The RIFF walk shared by :func:`decode_wav` (list-of-ints API) and
    :func:`wav_stats_codec` (numpy frombuffer — a 5000-clip Arrow batch
    cannot afford a Python int per sample)."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a WAV: bad RIFF/WAVE header")
    pos = 12
    rate = channels = bits = None
    data = None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        (length,) = struct.unpack_from("<I", payload, pos + 4)
        body = payload[pos + 8 : pos + 8 + length]
        pos += 8 + length + (length % 2)  # RIFF: chunks pad to even
        if cid == b"fmt ":
            tag, channels, rate, _brate, _align, bits = struct.unpack_from(
                "<HHIIHH", body, 0
            )
            if tag != 1:
                raise NotImplementedError(
                    f"WAV format tag {tag}: only integer PCM (1) supported"
                )
            if bits not in _PCM_WIDTHS:
                raise NotImplementedError(
                    f"{bits}-bit PCM unsupported (8/16/32 only)"
                )
        elif cid == b"data":
            data = body
    if rate is None:
        raise ValueError("not a WAV: no fmt chunk")
    if data is None:
        raise ValueError("not a WAV: no data chunk")
    width = bits // 8
    n = len(data) // width
    return rate, channels, bits, data[: n * width]


def wav_stats_codec(payload: bytes) -> dict:
    """mapInPandas seam adapter: one row of clip features per payload —
    the decode-once-emit-everything shape the multimodal pipeline uses.
    RMS/peak are computed on samples normalized to [-1, 1] so the numbers
    are width-independent."""
    import numpy as np

    rate, channels, bits, data = _decode_wav_raw(payload)
    arr = np.frombuffer(data, dtype=_NP_DTYPES[bits]).astype(np.float64)
    n_samples = len(arr)
    if bits == 8:  # unsigned midpoint 128
        arr = (arr - 128.0) / 128.0
    else:
        arr = arr / float(1 << (bits - 1))
    n_frames = n_samples // max(channels, 1)
    return {
        "sample_rate": int(rate),
        "n_channels": int(channels),
        "bits": int(bits),
        "n_frames": int(n_frames),
        "duration_ms": float(1000.0 * n_frames / rate) if rate else 0.0,
        "rms": float(np.sqrt((arr**2).mean())) if len(arr) else 0.0,
        "peak": float(np.abs(arr).max()) if len(arr) else 0.0,
    }
