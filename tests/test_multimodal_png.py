"""Real image decode through the multimodal codec seam (round-7 verdict
"Next round #4"): the stdlib PNG codec must reconstruct every PNG filter
type correctly — proven by KNOWN-ANSWER vectors computed by hand from the
PNG spec, not just encoder/decoder round-trips (a matched sign error in
both directions would cancel in a round-trip) — and real PNG bytes must
flow end-to-end through resize_binary_column, decode_binary_column, and
mm04's perceptual-hash pass."""

from __future__ import annotations

import struct
import zlib

import pytest

from dbix_batchchunker_spark.functions.png import (
    _chunk,
    _SIG,
    decode_png,
    encode_png,
    png_feature_codec,
    png_gray_ahash,
    png_resize_codec,
)


def _handmade_png(scanlines: bytes, width: int, height: int, color_type: int = 0):
    """Assemble a PNG from ALREADY-FILTERED scanline bytes — the test picks
    the filter byte per row, so each decoder path is driven independently
    of the encoder."""
    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    return (
        _SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(scanlines))
        + _chunk(b"IEND", b"")
    )


def test_known_answer_sub_and_up_filters():
    """Gray 4x2. Row0 Sub-filtered: orig [10,20,30,40] -> raw [10,10,10,10].
    Row1 Up-filtered: orig [15,25,35,45] -> raw [5,5,5,5]. (Hand-applied
    per PNG spec §6.3/§6.4.)"""
    png = _handmade_png(
        bytes([1, 10, 10, 10, 10]) + bytes([2, 5, 5, 5, 5]), 4, 2
    )
    w, h, ch, px = decode_png(png)
    assert (w, h, ch) == (4, 2, 1)
    assert list(px) == [10, 20, 30, 40, 15, 25, 35, 45]


def test_known_answer_average_filter():
    """Gray 3x2. Row0 unfiltered [100,110,120]; row1 Average-filtered:
    orig [80,90,100] -> pred floor((a+b)/2) -> raw [30,251,251]."""
    png = _handmade_png(
        bytes([0, 100, 110, 120]) + bytes([3, 30, 251, 251]), 3, 2
    )
    _, _, _, px = decode_png(png)
    assert list(px) == [100, 110, 120, 80, 90, 100]


def test_known_answer_paeth_filter():
    """Gray 3x2. Row0 unfiltered [100,110,120]; row1 Paeth-filtered:
    orig [105,115,90] -> predictors [100,110,120] (up wins each time)
    -> raw [5,5,226]."""
    png = _handmade_png(
        bytes([0, 100, 110, 120]) + bytes([4, 5, 5, 226]), 3, 2
    )
    _, _, _, px = decode_png(png)
    assert list(px) == [100, 110, 120, 105, 115, 90]


@pytest.mark.parametrize("channels", [1, 2, 3, 4])
@pytest.mark.parametrize("filter_type", [0, 1, 2, 3, 4])
def test_round_trip_every_channel_count_and_filter(channels, filter_type):
    """encode->decode identity for gray/gray+alpha/RGB/RGBA under every
    filter type, on a deliberately non-uniform 5x4 image (multi-byte
    pixels exercise the bpp-offset `a`/`c` lookups)."""
    w, h = 5, 4
    pixels = bytes(
        (x * 37 + y * 101 + c * 13) & 0xFF
        for y in range(h)
        for x in range(w)
        for c in range(channels)
    )
    png = encode_png(pixels, w, h, channels, filter_type=filter_type)
    got = decode_png(png)
    assert got == (w, h, channels, pixels)


def test_unsupported_forms_raise_not_silently_decode():
    ihdr16 = struct.pack(">IIBBBBB", 2, 2, 16, 0, 0, 0, 0)
    png16 = _SIG + _chunk(b"IHDR", ihdr16)
    with pytest.raises(NotImplementedError, match="bit depth"):
        decode_png(png16)
    ihdr_pal = struct.pack(">IIBBBBB", 2, 2, 8, 3, 0, 0, 0)
    with pytest.raises(NotImplementedError, match="color type"):
        decode_png(_SIG + _chunk(b"IHDR", ihdr_pal))
    ihdr_adam = struct.pack(">IIBBBBB", 2, 2, 8, 0, 0, 0, 1)
    with pytest.raises(NotImplementedError, match="interlace"):
        decode_png(_SIG + _chunk(b"IHDR", ihdr_adam))
    with pytest.raises(ValueError, match="signature"):
        decode_png(b"JFIF....")


def test_split_idat_segments_concatenate():
    """Encoders may split the compressed stream across many IDAT chunks —
    the walk must concatenate them before inflating."""
    pixels = bytes(range(16))
    full = encode_png(pixels, 4, 4, 1)
    # rebuild with the IDAT payload split into 3-byte chunks
    comp = zlib.compress(
        b"".join(b"\0" + pixels[r * 4 : (r + 1) * 4] for r in range(4))
    )
    ihdr = struct.pack(">IIBBBBB", 4, 4, 8, 0, 0, 0, 0)
    split = (
        _SIG
        + _chunk(b"IHDR", ihdr)
        + b"".join(
            _chunk(b"IDAT", comp[i : i + 3]) for i in range(0, len(comp), 3)
        )
        + _chunk(b"IEND", b"")
    )
    assert decode_png(split) == decode_png(full) == (4, 4, 1, pixels)


def _checker_png(w=16, h=16, block=4, lo=10, hi=240, noise=None):
    """RGB checkerboard fixture; `noise` perturbs one pixel's red byte —
    a visually-identical near-duplicate."""
    px = bytearray()
    for y in range(h):
        for x in range(w):
            v = hi if ((x // block) + (y // block)) % 2 else lo
            px += bytes([v, v, v])
    if noise is not None:
        px[noise] = (px[noise] + 3) & 0xFF
    return encode_png(bytes(px), w, h, 3, filter_type=2)


def test_resize_codec_nearest_neighbor_semantics():
    """Downsampling a 16x16 checkerboard (4px blocks) to 4x4 must sample
    one pixel per block: alternating lo/hi exactly."""
    out = png_resize_codec(_checker_png(), 4, 4)
    assert len(out) == 4 * 4 * 3
    vals = [out[i] for i in range(0, len(out), 3)]
    expect = [240 if (x + y) % 2 else 10 for y in range(4) for x in range(4)]
    assert vals == expect


def test_feature_codec_contract():
    w, h, n_frames, feat = png_feature_codec(_checker_png())
    assert (w, h, n_frames) == (16, 16, 1)
    assert len(feat) == 4 and feat[3] == 0.0
    assert abs(feat[0] - (10 + 240) / 2 / 255.0) < 0.01  # half lo, half hi


# --------------------------------------------------------------------------- #
# end-to-end: real PNG bytes through the Spark seams                          #
# --------------------------------------------------------------------------- #
@pytest.fixture(scope="module")
def spark():
    from dbix_batchchunker_spark.session import get_spark

    return get_spark(master="local[4]", shuffle_partitions=8)


def test_resize_binary_column_decodes_real_pngs(spark):
    from dbix_batchchunker_spark.operators.multimodal import resize_binary_column

    rows = [(i, _checker_png(noise=i if i else None)) for i in range(6)]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    out = {
        r.doc_id: r
        for r in resize_binary_column(
            df, 4, 4, codec=png_resize_codec
        ).collect()
    }
    assert len(out) == 6
    for r in out.values():
        assert (r.width, r.height, len(r.resized)) == (4, 4, 4 * 4 * 3)


def test_decode_binary_column_with_png_codec(spark):
    from dbix_batchchunker_spark.operators.multimodal import decode_binary_column

    df = spark.createDataFrame(
        [(1, _checker_png()), (2, _checker_png(w=8, h=4))],
        "doc_id long, payload binary",
    )
    got = {
        r.doc_id: r
        for r in decode_binary_column(df, codec=png_feature_codec).collect()
    }
    assert (got[1].width, got[1].height, got[1].n_frames) == (16, 16, 1)
    assert (got[2].width, got[2].height) == (8, 4)
    assert len(got[1].feature) == 4


def test_mm04_hash_pass_over_decoded_pixels(spark):
    """Perceptual near-dup over REAL decoded pixels: a one-byte-perturbed
    re-encode of the same image must pair with the original (hamming 0 —
    aHash is invariant to sub-threshold noise); an inverted checkerboard
    must not."""
    from dbix_batchchunker_spark.operators.multimodal import (
        perceptual_hash_column,
        phash_near_dup_pairs,
    )

    rows = [
        (1, _checker_png()),
        (2, _checker_png(noise=5)),           # near-dup of 1
        (3, _checker_png(lo=240, hi=10)),     # inverted: far in hash space
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    hashed = perceptual_hash_column(df, hasher=png_gray_ahash)
    pairs = {
        (r.doc_a, r.doc_b)
        for r in phash_near_dup_pairs(hashed, max_hamming=2).collect()
    }
    assert (1, 2) in pairs or (2, 1) in pairs
    assert not any({1, 3} == {a, b} or {2, 3} == {a, b} for a, b in pairs)


# --------------------------------------------------------------------------- #
# WAV: the audio decode path (functions/wav.py)                               #
# --------------------------------------------------------------------------- #
def test_wav_known_answer_header_and_samples():
    """Hand-assembled RIFF bytes (not via encode_wav) decode to the exact
    header fields and samples — the parser is pinned against the format,
    not against its own encoder."""
    import struct as _struct

    from dbix_batchchunker_spark.functions.wav import decode_wav

    samples = [0, 1000, -1000, 32767]
    data = _struct.pack("<4h", *samples)
    fmt = _struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
    body = (
        b"WAVE"
        + b"fmt " + _struct.pack("<I", 16) + fmt
        # an extra chunk the walker must skip (odd length -> padded)
        + b"LIST" + _struct.pack("<I", 3) + b"abc\0"
        + b"data" + _struct.pack("<I", len(data)) + data
    )
    wav = b"RIFF" + _struct.pack("<I", len(body)) + body
    assert decode_wav(wav) == (8000, 1, 16, samples)


def test_wav_round_trip_and_unsupported():
    import pytest as _pytest

    from dbix_batchchunker_spark.functions.wav import decode_wav, encode_wav

    for bits, samples in [
        (16, [0, 5, -5, 32767, -32768]),
        (8, [0, 1, 128, 255, 7]),
        (32, [0, 2**31 - 1, -(2**31), 42, -42]),
    ]:
        # stereo needs an even frame count
        got = decode_wav(encode_wav(samples[:4], 44100, 2, bits))
        assert got == (44100, 2, bits, samples[:4])
    with _pytest.raises(ValueError, match="RIFF"):
        decode_wav(b"OggS....")
    # float PCM (tag 3) must refuse, not mis-decode
    import struct as _struct

    fmt = _struct.pack("<HHIIHH", 3, 1, 8000, 32000, 4, 32)
    body = b"WAVE" + b"fmt " + _struct.pack("<I", 16) + fmt + b"data" + _struct.pack("<I", 0)
    with _pytest.raises(NotImplementedError, match="format tag"):
        decode_wav(b"RIFF" + _struct.pack("<I", len(body)) + body)


def test_wav_stats_codec_values():
    """A full-scale square wave has RMS == peak == 1.0 (width-normalized);
    duration follows n_frames/rate."""
    from dbix_batchchunker_spark.functions.wav import encode_wav, wav_stats_codec

    sq = [32767 if i % 2 else -32768 for i in range(800)]
    s = wav_stats_codec(encode_wav(sq, sample_rate=8000))
    assert s["n_frames"] == 800 and s["sample_rate"] == 8000
    assert abs(s["duration_ms"] - 100.0) < 1e-9
    assert 0.999 < s["rms"] <= 1.0 and s["peak"] == 1.0


def test_mm05_wav_clip_stats_end_to_end(spark):
    """mm05: executors synthesize real RIFF bytes and DECODE them back —
    per-clip stats must match the synthesis parameters (deterministic
    doc_id -> frequency/length mapping), proving the container decode on
    the Spark side."""
    from dbix_batchchunker_spark.operators.multimodal import mm05_wav_clip_stats

    rows = {
        r.doc_id: r
        for r in mm05_wav_clip_stats(spark, "/root/testdata/sf0.001").collect()
    }
    assert rows, "no clips decoded"
    for doc_id, r in list(rows.items())[:20]:
        expect_frames = 8000 * (40 + (doc_id * 7) % 161) // 1000
        assert r.n_frames == expect_frames, doc_id
        assert r.sample_rate == 8000 and r.n_channels == 1 and r.bits == 16
        assert abs(r.duration_ms - 1000.0 * expect_frames / 8000) < 1e-6
        # integer wave: rms = amp*sqrt(108/8)/32768, amp in [2000, 5000]
        # -> [0.224, 0.561]; peak = 6*amp/32768 <= 0.916
        assert 0.2 < r.rms < 0.6 and r.peak <= 1.0
        assert r.payload_bytes == 44 + 2 * expect_frames


def test_mm06_jvm_header_parse_matches_encoder(spark):
    """The JVM-expression IHDR parse (substring/hex/conv — no Python in
    the parse path) must report exactly what encode_png wrote, for every
    channel count and filter type, plus reject a non-PNG payload's magic."""
    from dbix_batchchunker_spark.operators.multimodal import (
        png_header_metadata,
    )

    expected = {}
    rows = []
    i = 0
    for channels, color_type in ((1, 0), (2, 4), (3, 2), (4, 6)):
        for filter_type in range(5):
            w, h = 3 + i % 4, 2 + i % 3
            px = bytes((i * 13 + j) & 0xFF for j in range(w * h * channels))
            rows.append((i, encode_png(px, w, h, channels, filter_type)))
            expected[i] = (w, h, channels, color_type)
            i += 1
    rows.append((999, b"notapngpayload--"))  # magic must come back False

    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {r["doc_id"]: r for r in png_header_metadata(df).collect()}
    assert len(got) == len(rows)
    for doc_id, (w, h, channels, color_type) in expected.items():
        r = got[doc_id]
        assert r["magic_ok"] is True
        assert (r["width"], r["height"]) == (w, h)
        assert r["bit_depth"] == 8
        assert r["color_type"] == color_type
        assert r["n_channels"] == channels
        assert r["payload_bytes"] == len(rows[doc_id][1])
    assert got[999]["magic_ok"] is False
