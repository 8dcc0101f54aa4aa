"""Pure-stdlib media codecs (functions/mediacodec.py) + the real
(non-stub) decode paths in operators/multimodal.py.

Ground truth is built spec-faithfully IN THE TEST, independently of
the module under test: PNG filter bytes are computed with a dumb
per-byte loop straight from the PNG spec's filter definitions, GIF
LZW streams are emitted with a clear-code-per-symbol encoder (the
classic "LZW without compression" construction), BMP/WAV bytes are
hand-packed structs — so a shared bug between encoder and decoder
cannot self-certify.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest
from pyspark.sql import functions as F

from remote_storage_adapter_spark.functions import mediacodec as MC
from remote_storage_adapter_spark.operators import multimodal as MM

RNG = np.random.default_rng(20260814)


# ---------------------------------------------------------------- helpers
# independent, spec-faithful constructions (NOT using mediacodec)

def _chunk(ctype: bytes, data: bytes) -> bytes:
    return (struct.pack(">I", len(data)) + ctype + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF))


def _png_filter_lines(pixels: np.ndarray, ftypes) -> bytes:
    """Apply PNG filters 0-4 per the spec, dumb per-byte loop."""
    h, w, ch = pixels.shape
    stride = w * ch
    flat = pixels.reshape(h, stride).astype(int)
    out = bytearray()
    prev = [0] * stride
    for y, ft in enumerate(ftypes):
        cur = list(flat[y])
        enc = [ft]
        for x in range(stride):
            left = cur[x - ch] if x >= ch else 0
            up = prev[x]
            ul = prev[x - ch] if x >= ch else 0
            if ft == 0:
                v = cur[x]
            elif ft == 1:
                v = cur[x] - left
            elif ft == 2:
                v = cur[x] - up
            elif ft == 3:
                v = cur[x] - (left + up) // 2
            else:  # Paeth
                p = left + up - ul
                pa, pb, pc = abs(p - left), abs(p - up), abs(p - ul)
                pred = (left if pa <= pb and pa <= pc
                        else (up if pb <= pc else ul))
                v = cur[x] - pred
            enc.append(v & 0xFF)
        out += bytes(enc)
        prev = cur
    return bytes(out)


def build_png(pixels: np.ndarray, ftypes, color: int,
              plte: bytes = b"") -> bytes:
    h, w, ch = pixels.shape
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    body = _chunk(b"IHDR", ihdr)
    if plte:
        body += _chunk(b"PLTE", plte)
    body += _chunk(b"IDAT", zlib.compress(_png_filter_lines(pixels, ftypes)))
    return b"\x89PNG\r\n\x1a\n" + body + _chunk(b"IEND", b"")


def build_bmp(img: np.ndarray, *, top_down: bool = False) -> bytes:
    """24-bit BI_RGB BMP with spec row padding."""
    h, w, _ = img.shape
    stride = (w * 3 + 3) & ~3
    order = range(h) if top_down else range(h - 1, -1, -1)
    rows = b""
    for y in order:
        row = b"".join(bytes([img[y, x, 2], img[y, x, 1], img[y, x, 0]])
                       for x in range(w))
        rows += row + bytes(stride - len(row))
    return (b"BM" + struct.pack("<IHHI", 54 + len(rows), 0, 0, 54)
            + struct.pack("<IiiHHIIiiII", 40, w, -h if top_down else h,
                          1, 24, 0, len(rows), 0, 0, 0, 0) + rows)


def _lzw_encode_trivial(min_code: int, indices) -> bytes:
    """Clear code before every symbol → code width never grows; a
    valid (if bloated) GIF LZW stream any conforming decoder accepts."""
    clear, eoi, width = 1 << min_code, (1 << min_code) + 1, min_code + 1
    codes = [clear]
    for v in indices:
        codes += [int(v), clear]
    codes[-1] = eoi
    acc = bits = 0
    out = bytearray()
    for c in codes:
        acc |= c << bits
        bits += width
        while bits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            bits -= 8
    if bits:
        out.append(acc & 0xFF)
    return bytes(out)


def _pad_pal(pal: np.ndarray, size_bits: int) -> np.ndarray:
    """GIF color tables have 2^(size_bits+1) entries — pad with zeros."""
    want = 2 << size_bits
    if len(pal) < want:
        pal = np.vstack([pal, np.zeros((want - len(pal), 3), np.uint8)])
    return pal


def build_gif(idx: np.ndarray, pal: np.ndarray, *,
              interlace: bool = False) -> bytes:
    h, w = idx.shape
    ncol = len(pal)
    size_bits = max((ncol - 1).bit_length(), 1) - 1
    min_code = max((ncol - 1).bit_length(), 2)
    pal = _pad_pal(pal, size_bits)
    rows = idx
    if interlace:
        order = np.concatenate([np.arange(0, h, 8), np.arange(4, h, 8),
                                np.arange(2, h, 4), np.arange(1, h, 2)])
        rows = idx[order]
    lzw = _lzw_encode_trivial(min_code, rows.reshape(-1))
    sub = b""
    for i in range(0, len(lzw), 255):
        blk = lzw[i:i + 255]
        sub += bytes([len(blk)]) + blk
    iflags = 0x40 if interlace else 0
    return (b"GIF89a" + struct.pack("<HHBBB", w, h, 0x80 | size_bits, 0, 0)
            + pal.astype(np.uint8).tobytes()
            + b"\x2C" + struct.pack("<HHHHB", 0, 0, w, h, iflags)
            + bytes([min_code]) + sub + b"\x00" + b"\x3B")


def build_wav(samples: np.ndarray, sr: int) -> bytes:
    """16-bit PCM little-endian from an int16 (n, ch) array."""
    n, ch = samples.shape
    data = samples.astype("<i2").tobytes()
    return (b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
            + b"fmt " + struct.pack("<IHHIIHH", 16, 1, ch, sr,
                                    sr * ch * 2, ch * 2, 16)
            + b"data" + struct.pack("<I", len(data)) + data)


# ---------------------------------------------------------------- PNG

def test_png_round_trip_all_channel_counts():
    for ch in (1, 2, 3, 4):
        a = RNG.integers(0, 256, (6, 9, ch), dtype=np.uint8)
        assert np.array_equal(MC.png_decode(MC.png_encode(a)), a)


def test_png_every_filter_type_spec_faithful():
    px = RNG.integers(0, 256, (5, 7, 3), dtype=np.uint8)
    for fts in ([0, 1, 2, 3, 4], [4] * 5, [3] * 5, [1, 3, 4, 2, 0]):
        assert np.array_equal(MC.png_decode(build_png(px, fts, 2)), px)


def test_png_gray_and_alpha_color_types():
    g = RNG.integers(0, 256, (4, 5, 1), dtype=np.uint8)
    assert np.array_equal(MC.png_decode(build_png(g, [0, 1, 2, 4], 0)), g)
    ga = RNG.integers(0, 256, (4, 5, 2), dtype=np.uint8)
    assert np.array_equal(MC.png_decode(build_png(ga, [4, 3, 2, 1], 4)), ga)
    rgba = RNG.integers(0, 256, (4, 5, 4), dtype=np.uint8)
    assert np.array_equal(MC.png_decode(build_png(rgba, [2, 4, 1, 3], 6)),
                          rgba)


def test_png_palette_expansion():
    pal = RNG.integers(0, 256, (5, 3), dtype=np.uint8)
    idx = RNG.integers(0, 5, (3, 6, 1), dtype=np.uint8)
    p = build_png(idx, [0, 1, 2], 3, plte=pal.tobytes())
    assert np.array_equal(MC.png_decode(p), pal[idx[:, :, 0]])


def test_png_rejects_unsupported_profiles():
    a = RNG.integers(0, 256, (2, 2, 3), dtype=np.uint8)
    good = build_png(a, [0, 0], 2)
    with pytest.raises(ValueError, match="signature"):
        MC.png_decode(b"nope" + good)
    # 16-bit depth
    bad = bytearray(good)
    bad[24] = 16
    with pytest.raises(ValueError, match="bit depth"):
        MC.png_decode(bytes(bad))
    # Adam7 interlace flag
    bad = bytearray(good)
    bad[28] = 1
    with pytest.raises(ValueError, match="interlace"):
        MC.png_decode(bytes(bad))
    # truncated pixel data
    ihdr = struct.pack(">IIBBBBB", 10, 10, 8, 2, 0, 0, 0)
    trunc = (b"\x89PNG\r\n\x1a\n" + _chunk(b"IHDR", ihdr)
             + _chunk(b"IDAT", zlib.compress(b"\x00" * 5))
             + _chunk(b"IEND", b""))
    with pytest.raises(ValueError, match="truncated"):
        MC.png_decode(trunc)


# ---------------------------------------------------------------- BMP

def test_bmp_bottom_up_and_top_down():
    img = RNG.integers(0, 256, (3, 3, 3), dtype=np.uint8)  # stride pad 3
    assert np.array_equal(MC.bmp_decode(build_bmp(img)), img)
    assert np.array_equal(MC.bmp_decode(build_bmp(img, top_down=True)), img)


def test_bmp_rejects_compressed():
    img = RNG.integers(0, 256, (2, 2, 3), dtype=np.uint8)
    b = bytearray(build_bmp(img))
    b[30] = 1  # BI_RLE8
    with pytest.raises(ValueError, match="compression"):
        MC.bmp_decode(bytes(b))


# ---------------------------------------------------------------- GIF

def test_gif_lzw_first_frame():
    pal = RNG.integers(0, 256, (4, 3), dtype=np.uint8)
    idx = RNG.integers(0, 4, (4, 6), dtype=np.uint8)
    assert np.array_equal(MC.gif_decode(build_gif(idx, pal)), pal[idx])


def test_gif_interlaced_rows_reordered():
    pal = RNG.integers(0, 256, (4, 3), dtype=np.uint8)
    idx = RNG.integers(0, 4, (9, 5), dtype=np.uint8)  # >8 rows: all passes
    assert np.array_equal(MC.gif_decode(build_gif(idx, pal,
                                                  interlace=True)),
                          pal[idx])


def test_gif_real_lzw_dictionary_growth():
    """A repetitive image exercises real dictionary codes (not just
    the clear-heavy trivial stream): re-encode with an actual LZW
    compressor written here, decode must invert."""
    pal = np.arange(12, dtype=np.uint8).reshape(4, 3) * 20
    idx = np.tile(np.array([0, 0, 1, 1, 2, 2, 3, 3], dtype=np.uint8),
                  (6, 2))[:, :16]

    def lzw_real(min_code, seq):
        clear, eoi = 1 << min_code, (1 << min_code) + 1
        table = {(i,): i for i in range(clear)}
        next_code, width = eoi + 1, min_code + 1
        codes, cur = [clear], ()
        for s in map(int, seq):
            if cur + (s,) in table:
                cur += (s,)
                continue
            codes.append(table[cur])
            table[cur + (s,)] = next_code
            next_code += 1
            if next_code - 1 == (1 << width) and width < 12:
                width += 1
            cur = (s,)
        if cur:
            codes.append(table[cur])
        codes.append(eoi)
        # pack with the width schedule a decoder follows: the decoder
        # is one table entry behind the encoder, so width grows after
        # the k-th data code creates encoder entry clear+1+k
        out, acc, bits = bytearray(), 0, 0
        width, count = min_code + 1, clear + 1
        for c in codes:
            acc |= c << bits
            bits += width
            while bits >= 8:
                out.append(acc & 0xFF)
                acc >>= 8
                bits -= 8
            if c == clear:
                width, count = min_code + 1, clear + 1
            elif c != eoi:
                count += 1
                if count == (1 << width) and width < 12:
                    width += 1
        if bits:
            out.append(acc & 0xFF)
        return bytes(out)

    lzw = lzw_real(2, idx.reshape(-1))
    sub = b""
    for i in range(0, len(lzw), 255):
        sub += bytes([len(lzw[i:i + 255])]) + lzw[i:i + 255]
    gif = (b"GIF89a" + struct.pack("<HHBBB", 16, 6, 0x81, 0, 0)
           + pal.tobytes() + b"\x2C" + struct.pack("<HHHHB", 0, 0, 16, 6, 0)
           + bytes([2]) + sub + b"\x00\x3B")
    assert np.array_equal(MC.gif_decode(gif), pal[idx])


def _gce(delay_cs: int, *, transp: int | None = None,
         disposal: int = 0) -> bytes:
    flags = (disposal << 2) | (1 if transp is not None else 0)
    return (b"\x21\xF9\x04" + bytes([flags])
            + struct.pack("<H", delay_cs)
            + bytes([transp if transp is not None else 0]) + b"\x00")


def _image_block(idx: np.ndarray, min_code: int, *,
                 left: int = 0, top: int = 0) -> bytes:
    h, w = idx.shape
    lzw = _lzw_encode_trivial(min_code, idx.reshape(-1))
    sub = b""
    for i in range(0, len(lzw), 255):
        sub += bytes([len(lzw[i:i + 255])]) + lzw[i:i + 255]
    return (b"\x2C" + struct.pack("<HHHHB", left, top, w, h, 0)
            + bytes([min_code]) + sub + b"\x00")


def build_animated_gif(screen_wh, pal: np.ndarray, frames) -> bytes:
    """frames: list of (idx_2d, left, top, delay_cs, transp, disposal)."""
    w, h = screen_wh
    ncol = len(pal)
    size_bits = max((ncol - 1).bit_length(), 1) - 1
    min_code = max((ncol - 1).bit_length(), 2)
    out = (b"GIF89a" + struct.pack("<HHBBB", w, h, 0x80 | size_bits, 0, 0)
           + _pad_pal(pal, size_bits).astype(np.uint8).tobytes())
    for idx, left, top, delay_cs, transp, disposal in frames:
        out += _gce(delay_cs, transp=transp, disposal=disposal)
        out += _image_block(idx, min_code, left=left, top=top)
    return out + b"\x3B"


def test_gif_animation_composition():
    """Two frames: full-screen base, then a transparent-keyed
    sub-rectangle painted over it — composition computed independently
    with plain numpy."""
    pal = np.array([[10, 10, 10], [200, 0, 0], [0, 200, 0], [0, 0, 200]],
                   np.uint8)
    base = np.full((4, 5), 1, np.uint8)
    patch = np.array([[2, 0], [0, 3]], np.uint8)  # 0 = transparent key
    gif = build_animated_gif(
        (5, 4), pal,
        [(base, 0, 0, 10, None, 0), (patch, 1, 2, 5, 0, 0)])
    frames = MC.gif_frames(gif)
    assert [d for d, _ in frames] == [100, 50]
    exp0 = pal[base]
    assert np.array_equal(frames[0][1], exp0)
    exp1 = exp0.copy()
    exp1[2, 1] = pal[2]          # opaque patch pixels painted
    exp1[3, 2] = pal[3]
    # transparent-keyed pixels keep the underlying canvas
    assert np.array_equal(frames[1][1], exp1)


def test_gif_disposal_restore_background_and_previous():
    pal = np.array([[9, 9, 9], [255, 0, 0], [0, 255, 0]], np.uint8)
    base = np.full((3, 3), 1, np.uint8)
    spot = np.array([[2]], np.uint8)
    gif = build_animated_gif(
        (3, 3), pal,
        [(base, 0, 0, 10, None, 0),
         (spot, 1, 1, 10, None, 2),   # restore-background after
         (spot, 0, 0, 10, None, 3),   # restore-previous after
         (np.full((1, 1), 1, np.uint8), 2, 2, 10, None, 0)])
    frames = MC.gif_frames(gif)
    f1 = pal[base]
    assert np.array_equal(frames[0][1], f1)
    f2 = f1.copy(); f2[1, 1] = pal[2]
    assert np.array_equal(frames[1][1], f2)
    # disposal 2 restored (1,1) to the BACKGROUND color (palette 0)
    f3 = f1.copy(); f3[1, 1] = pal[0]; f3[0, 0] = pal[2]
    assert np.array_equal(frames[2][1], f3)
    # disposal 3 restored the canvas before frame 3
    f4 = f1.copy(); f4[1, 1] = pal[0]; f4[2, 2] = pal[1]
    assert np.array_equal(frames[3][1], f4)


def test_frame_sample_real_gif(spark):
    pal = np.array([[0, 0, 0], [50, 100, 150], [250, 200, 150]], np.uint8)
    a = np.full((2, 2), 1, np.uint8)
    b = np.full((2, 2), 2, np.uint8)
    gif = build_animated_gif((2, 2), pal,
                             [(a, 0, 0, 10, None, 0),    # 100 ms
                              (b, 0, 0, 5, None, 0)])    # 50 ms
    media = _media_df(spark, [gif])
    rows = sorted(MM.frame_sample(media, every_ms=50, decode_stub=False)
                  .collect(), key=lambda r: r["frame_idx"])
    assert [r["frame_ts_ms"] for r in rows] == [0, 50, 100]
    decoded = [MC.png_decode(bytes(r["frame"])) for r in rows]
    assert np.array_equal(decoded[0], pal[a])
    assert np.array_equal(decoded[1], pal[a])   # still inside [0,100)
    assert np.array_equal(decoded[2], pal[b])
    # still image (single frame, zero delay) → exactly one sample
    still = build_gif(np.full((2, 3), 1, np.uint8), pal)
    one = MM.frame_sample(_media_df(spark, [still]), every_ms=1000,
                          decode_stub=False).collect()
    assert len(one) == 1 and one[0]["frame_ts_ms"] == 0
    with pytest.raises(Exception):  # non-GIF video: honest stub
        MM.frame_sample(_media_df(spark, [b"\x00\x00\x00\x18ftypmp42"]),
                        decode_stub=False).collect()


# ---------------------------------------------------------------- WAV

def test_wav_pcm16_stereo():
    sam = (np.sin(np.arange(400).reshape(-1, 2) / 9) * 20000).astype("<i2")
    s, sr = MC.wav_decode(build_wav(sam, 16000))
    assert sr == 16000 and s.shape == sam.shape
    assert np.allclose(s, sam.astype(np.float32) / 32768.0)


def test_wav_pcm8_mono():
    data = bytes(range(200))
    wav = (b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
           + b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, 8000, 8000, 1, 8)
           + b"data" + struct.pack("<I", len(data)) + data)
    s, sr = MC.wav_decode(wav)
    assert sr == 8000 and s.shape == (200, 1)
    assert np.allclose(s[:, 0],
                       (np.arange(200, dtype=np.float32) - 128) / 128)


def test_wav_rejects_non_pcm():
    wav = (b"RIFF" + struct.pack("<I", 36) + b"WAVE"
           + b"fmt " + struct.pack("<IHHIIHH", 16, 3, 1, 8000, 32000, 4, 32)
           + b"data" + struct.pack("<I", 0))
    with pytest.raises(ValueError, match="unsupported WAV"):
        MC.wav_decode(wav)


def test_png_roundtrip_property():
    """Property fuzz: encode→decode is the identity for ANY uint8
    array in the supported profile (all sizes, all channel counts)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=40, deadline=None)
    @given(st.integers(1, 12), st.integers(1, 12),
           st.sampled_from([1, 2, 3, 4]), st.integers(0, 2 ** 32 - 1))
    def roundtrip(h, w, ch, seed):
        a = np.random.default_rng(seed).integers(
            0, 256, (h, w, ch), dtype=np.uint8)
        assert np.array_equal(MC.png_decode(MC.png_encode(a)), a)

    roundtrip()


def test_png_all_filters_property():
    """Property fuzz: spec-faithful filtering with ARBITRARY per-row
    filter choices always reconstructs — the cross-row filter
    interactions (Up/Average/Paeth read the previous RECONSTRUCTED
    row) are the part a fixed test matrix can miss."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=30, deadline=None)
    @given(st.integers(1, 8), st.integers(1, 6),
           st.sampled_from([1, 3]), st.integers(0, 2 ** 32 - 1),
           st.data())
    def reconstructs(h, w, ch, seed, data):
        fts = data.draw(st.lists(st.integers(0, 4),
                                 min_size=h, max_size=h))
        px = np.random.default_rng(seed).integers(
            0, 256, (h, w, ch), dtype=np.uint8)
        color = {1: 0, 3: 2}[ch]
        assert np.array_equal(
            MC.png_decode(build_png(px, fts, color)), px)

    reconstructs()


def test_wav_roundtrip_property():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=30, deadline=None)
    @given(st.integers(1, 200), st.sampled_from([1, 2]),
           st.integers(0, 2 ** 32 - 1))
    def roundtrip(n, ch, seed):
        sam = np.random.default_rng(seed).integers(
            -32768, 32768, (n, ch)).astype("<i2")
        s, sr = MC.wav_decode(build_wav(sam, 8000))
        assert sr == 8000 and s.shape == (n, ch)
        assert np.array_equal(
            (s * 32768.0).astype("<i2"), sam)

    roundtrip()


def test_hostile_bytes_never_hang_or_crash_decode_one():
    """Fuzz the quarantine contract directly: arbitrary byte strings
    through the worker-side _decode_one must return a row (ok or
    err), never raise."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from remote_storage_adapter_spark.operators.multimodal import (
        _decode_one,
    )

    sigs = [b"", b"\x89PNG\r\n\x1a\n", b"GIF89a", b"BM", b"RIFF",
            b"\xff\xd8"]

    @settings(max_examples=120, deadline=None)
    @given(st.sampled_from(sigs), st.binary(max_size=120))
    def never_raises(sig, tail):
        row = _decode_one(sig + tail)
        assert len(row) == 10

    never_raises()


# ------------------------------------------------------- dispatch

def test_decode_pixels_dispatch_and_contracts():
    a = RNG.integers(0, 256, (3, 3, 3), dtype=np.uint8)
    assert np.array_equal(MC.decode_pixels(MC.png_encode(a)), a)
    assert np.array_equal(MC.decode_pixels(build_bmp(a)), a)
    # truncated JPEG APP0 is malformed bytes (ValueError), while the
    # honest refusals (progressive etc.) stay NotImplementedError —
    # see test_jpeg_honest_refusals
    with pytest.raises(ValueError, match="JPEG"):
        MC.decode_pixels(b"\xff\xd8\xff\xe0junk")
    with pytest.raises(ValueError, match="unrecognized"):
        MC.decode_pixels(b"plain text")


# ------------------------------------------- Spark-side real paths

def _media_df(spark, payloads):
    return spark.createDataFrame(
        [(i, bytearray(p)) for i, p in enumerate(payloads)],
        "media_id long, payload binary",
    )


def test_decode_media_quarantines_truncated_and_hostile(spark):
    """Review regressions: exceptions from arbitrary parse depths
    (IndexError from a truncated GIF header, struct.error from a short
    IHDR/fmt chunk) must quarantine, and a decompression-bomb IDAT
    must fail cheaply (output capped at the geometry IHDR promised),
    not OOM the worker."""
    short_ihdr = (b"\x89PNG\r\n\x1a\n" + _chunk(b"IHDR", b"\x00\x01")
                  + _chunk(b"IEND", b""))
    short_fmt = (b"RIFF" + struct.pack("<I", 20) + b"WAVE"
                 + b"fmt " + struct.pack("<I", 4) + b"\x01\x00\x02\x00"
                 + b"data" + struct.pack("<I", 0))
    rows = {r["media_id"]: r for r in MM.decode_media(_media_df(
        spark, [b"GIF89a", short_ihdr, short_fmt],
    )).collect()}
    for mid in rows:
        assert rows[mid]["kind"] is None and rows[mid]["err"], mid


def test_decode_media_bomb_is_bounded(spark):
    """The 100 MB-inflating IDAT on a 2x2 IHDR decodes the first
    need-bytes only — valid zero pixels, no allocation beyond 15
    bytes. (Split from the quarantine test: this payload succeeds.)"""
    bomb = (b"\x89PNG\r\n\x1a\n"
            + _chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 0))
            + _chunk(b"IDAT", zlib.compress(bytes(100 * 1024 * 1024)))
            + _chunk(b"IEND", b""))
    px = MC.png_decode(bomb)
    assert px.shape == (2, 2, 3) and int(px.max()) == 0


def test_frame_sample_rejects_nonpositive_tick(spark):
    with pytest.raises(ValueError, match="every_ms"):
        MM.frame_sample(_media_df(spark, [b"GIF89a"]), every_ms=0,
                        decode_stub=False)


def test_decode_media_quarantines_per_row(spark):
    img = RNG.integers(0, 256, (4, 6, 3), dtype=np.uint8)
    sam = (RNG.integers(-3000, 3000, (50, 2))).astype("<i2")
    rows = {r["media_id"]: r for r in MM.decode_media(_media_df(
        spark,
        [MC.png_encode(img), build_wav(sam, 8000),
         b"\xff\xd8\xff\xe0jpeg", b"garbage"],
    )).collect()}
    assert rows[0]["kind"] == "image" and rows[0]["err"] is None
    assert (rows[0]["height"], rows[0]["width"], rows[0]["channels"]) \
        == (4, 6, 3)
    assert rows[0]["px_mean"] == round(float(img.mean()), 6)
    assert rows[0]["px_std"] == round(float(img.std()), 6)
    assert rows[1]["kind"] == "audio" and rows[1]["sample_rate"] == 8000
    assert rows[1]["n_samples"] == 50 and rows[1]["channels"] == 2
    exp_rms = float(np.sqrt(np.mean(
        (sam.astype(np.float64) / 32768.0).reshape(-1) ** 2)))
    assert rows[1]["rms"] == round(exp_rms, 6)
    # decode failures quarantine with a reason, job survives
    # (truncated JPEG APP0 → malformed-bytes ValueError)
    assert rows[2]["kind"] is None and "ValueError" in rows[2]["err"]
    assert rows[3]["kind"] is None and "ValueError" in rows[3]["err"]


def test_extract_features_real_histogram(spark):
    img = RNG.integers(0, 256, (8, 8, 3), dtype=np.uint8)
    sam = (RNG.integers(-20000, 20000, (300, 1))).astype("<i2")
    feats = {r["media_id"]: r["feature"] for r in MM.extract_features(
        _media_df(spark, [MC.png_encode(img), build_wav(sam, 8000)]),
        dim=8, decode_stub=False,
    ).collect()}
    lum = img.astype(np.float32).mean(axis=2).reshape(-1)
    hist, _ = np.histogram(lum, bins=8, range=(0.0, 256.0))
    exp = [round(float(c) / max(int(hist.sum()), 1), 6) for c in hist]
    assert [round(v, 6) for v in feats[0]] == pytest.approx(exp, abs=5e-7)
    ahist, _ = np.histogram(sam.astype(np.float32).reshape(-1) / 32768.0,
                            bins=8, range=(-1.0, 1.0))
    aexp = [round(float(c) / max(int(ahist.sum()), 1), 6) for c in ahist]
    assert [round(v, 6) for v in feats[1]] == pytest.approx(aexp, abs=5e-7)
    assert abs(sum(feats[0]) - 1.0) < 1e-5  # L1-normalized


def test_resize_real_nearest_neighbor(spark):
    img = RNG.integers(0, 256, (4, 6, 3), dtype=np.uint8)
    media = _media_df(spark, [MC.png_encode(img)]).select(
        "media_id", "payload",
        F.struct(F.lit("image").alias("media_type"),
                 F.lit("png").alias("format"),
                 F.lit(6).alias("width"), F.lit(4).alias("height"),
                 F.lit(None).cast("long").alias("duration_ms")).alias("meta"),
    )
    out = MM.resize(media, width=12, height=2, decode_stub=False).collect()
    assert out[0]["meta"]["width"] == 12 and out[0]["meta"]["format"] == "png"
    got = MC.png_decode(bytes(out[0]["payload"]))
    ys = (np.arange(2) * 4 // 2).clip(0, 3)
    xs = (np.arange(12) * 6 // 12).clip(0, 5)
    assert np.array_equal(got, img[ys][:, xs])


def test_sniff_and_decode_agree_on_dims(spark):
    """The header sniffer and the full pixel decode must report the
    same geometry for well-formed files."""
    imgs = [RNG.integers(0, 256, (h, w, 3), dtype=np.uint8)
            for h, w in [(3, 5), (7, 2), (1, 9)]]
    payloads = [MC.png_encode(imgs[0]), build_bmp(imgs[1]),
                build_gif(RNG.integers(0, 4, (4, 6), dtype=np.uint8),
                          RNG.integers(0, 256, (4, 3), dtype=np.uint8))]
    media = _media_df(spark, payloads)
    sniffed = {r["media_id"]: r for r in
               MM.sniff_media_meta(media).collect()}
    decoded = {r["media_id"]: r for r in MM.decode_media(media).collect()}
    for mid in sniffed:
        assert decoded[mid]["err"] is None
        assert sniffed[mid]["width"] == decoded[mid]["width"]
        assert sniffed[mid]["height"] == decoded[mid]["height"]


# ------------------------------------------------------------ JPEG
#
# Ground truth discipline (same as the PNG/GIF goldens): the encoder
# below is built independently in-test from the T.81 spec — forward
# DCT as the explicit quadruple cosine sum (the decoder uses a
# separable einsum IDCT), Annex-C canonical code assignment written
# from the tables' bits/values form, Annex-K standard Huffman tables
# typed in from the public spec — so a shared encoder/decoder bug
# cannot self-certify.

_JDC_L = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
          list(range(12)))
_JAC_L = ([0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D], [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
    0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA])
_JDC_C = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
          list(range(12)))
_JAC_C = ([0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77], [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
    0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
    0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
    0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
    0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
    0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
    0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
    0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
    0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
    0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
    0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA])

_JZZ = [0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63]


def _jfdct(block: np.ndarray) -> np.ndarray:
    """Forward 8×8 DCT-II, explicit quadruple cosine sum (A.3.3)."""
    out = np.zeros((8, 8))
    for u in range(8):
        for v in range(8):
            cu = 1 / np.sqrt(2) if u == 0 else 1.0
            cv = 1 / np.sqrt(2) if v == 0 else 1.0
            s = 0.0
            for x in range(8):
                for y in range(8):
                    s += (block[x, y]
                          * np.cos((2 * x + 1) * u * np.pi / 16)
                          * np.cos((2 * y + 1) * v * np.pi / 16))
            out[u, v] = 0.25 * cu * cv * s
    return out


def _jcodes(counts, syms):
    codes, code, k = {}, 0, 0
    for ln in range(1, 17):
        for _ in range(counts[ln - 1]):
            codes[syms[k]] = (ln, code)
            code += 1
            k += 1
        code <<= 1
    return codes


class _JBitWriter:
    def __init__(self):
        self.out, self.cur, self.n = bytearray(), 0, 0

    def put(self, code, ln):
        for b in range(ln - 1, -1, -1):
            self.cur = (self.cur << 1) | ((code >> b) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.cur)
                if self.cur == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.cur, self.n = 0, 0

    def align(self):  # pad to byte boundary with 1-bits (F.1.2.3)
        if self.n:
            self.put((1 << (8 - self.n)) - 1, 8 - self.n)


def _jput_coef(bw, v, s):
    bw.put(v if v >= 0 else v + (1 << s) - 1, s)


def _jcat(v):
    s, a = 0, abs(v)
    while a:
        s += 1
        a >>= 1
    return s


def _jenc_block(bw, zz, pred, dcc, acc):
    diff = int(zz[0]) - pred
    s = _jcat(diff)
    bw.put(*reversed(dcc[s]))
    if s:
        _jput_coef(bw, diff, s)
    k = 1
    while k < 64:
        if zz[k] == 0:
            j = k
            while j < 64 and zz[j] == 0:
                j += 1
            if j == 64:
                bw.put(*reversed(acc[0x00]))  # EOB
                break
            run = j - k
            while run > 15:
                bw.put(*reversed(acc[0xF0]))  # ZRL
                run -= 16
            k = j
            v = int(zz[k])
            s = _jcat(v)
            bw.put(*reversed(acc[(run << 4) | s]))
            _jput_coef(bw, v, s)
        else:
            v = int(zz[k])
            s = _jcat(v)
            bw.put(*reversed(acc[s]))
            _jput_coef(bw, v, s)
        k += 1
    return int(zz[0])


def _jquant_block(plane, y0, x0, qzz):
    """Pixel block at (y0, x0) → quantized zigzag coefficients."""
    co = _jfdct(plane[y0:y0 + 8, x0:x0 + 8].astype(float) - 128.0)
    return [int(round(co.flat[_JZZ[k]] / qzz[k])) for k in range(64)]


def build_jpeg(planes, sampling, qzz_tables, *, restart=0):
    """Independent baseline JPEG encoder. ``planes``: per-component
    uint8 arrays at their own resolution (component 0 = frame dims);
    ``sampling``: [(sh, sv), ...]; ``qzz_tables``: per-component
    64-entry quant tables in ZIGZAG order (table id = component
    index). Component 0 uses the Annex-K luminance Huffman tables,
    the rest the chrominance tables. ``restart`` emits DRI + RSTn
    every that many MCUs."""
    nc = len(planes)
    fh, fw = planes[0].shape
    hmax = max(s[0] for s in sampling)
    vmax = max(s[1] for s in sampling)
    mcux, mcuy = -(-fw // (8 * hmax)), -(-fh // (8 * vmax))
    padded = []
    for p, (sh, sv) in zip(planes, sampling):
        th, tw = mcuy * sv * 8, mcux * sh * 8
        pp = np.pad(p, ((0, th - p.shape[0]), (0, tw - p.shape[1])),
                    mode="edge")
        padded.append(pp)
    dc_tabs = [_jcodes(*(_JDC_L if c == 0 else _JDC_C)) for c in range(nc)]
    ac_tabs = [_jcodes(*(_JAC_L if c == 0 else _JAC_C)) for c in range(nc)]
    bw = _JBitWriter()
    preds = [0] * nc
    rst = 0
    ent = bytearray()
    for mcu in range(mcux * mcuy):
        if restart and mcu and mcu % restart == 0:
            bw.align()
            ent += bw.out + bytes([0xFF, 0xD0 + (rst % 8)])
            rst += 1
            bw = _JBitWriter()
            preds = [0] * nc
        my, mx = divmod(mcu, mcux)
        for c in range(nc):
            sh, sv = sampling[c]
            for by in range(sv):
                for bx in range(sh):
                    zz = _jquant_block(padded[c], (my * sv + by) * 8,
                                       (mx * sh + bx) * 8, qzz_tables[c])
                    preds[c] = _jenc_block(bw, zz, preds[c],
                                           dc_tabs[c], ac_tabs[c])
    bw.align()
    ent += bw.out
    out = bytearray(b"\xff\xd8")
    for c in range(nc):
        out += bytes([0xFF, 0xDB, 0x00, 0x43, c]) \
            + bytes(int(q) for q in qzz_tables[c])
    out += bytes([0xFF, 0xC0]) + (8 + 3 * nc).to_bytes(2, "big") \
        + bytes([8]) + fh.to_bytes(2, "big") + fw.to_bytes(2, "big") \
        + bytes([nc])
    for c in range(nc):
        out += bytes([c + 1, (sampling[c][0] << 4) | sampling[c][1], c])
    for c, (cls, cnt, sym) in enumerate(
            [(0, *_JDC_L), (1, *_JAC_L)] if nc == 1
            else [(0, *_JDC_L), (1, *_JAC_L), (0, *_JDC_C), (1, *_JAC_C)]):
        tid = 0 if c < 2 else 1
        out += bytes([0xFF, 0xC4]) \
            + (2 + 1 + 16 + len(sym)).to_bytes(2, "big") \
            + bytes([(cls << 4) | tid]) + bytes(cnt) + bytes(sym)
    if restart:
        out += bytes([0xFF, 0xDD, 0x00, 0x04]) + restart.to_bytes(2, "big")
    out += bytes([0xFF, 0xDA]) + (6 + 2 * nc).to_bytes(2, "big") + bytes([nc])
    for c in range(nc):
        tid = 0 if c == 0 else 1
        out += bytes([c + 1, (tid << 4) | tid])
    out += bytes([0x00, 0x3F, 0x00]) + ent + bytes([0xFF, 0xD9])
    return bytes(out)


def _jexpected_gray(plane, qzz, fh, fw):
    """Independent reconstruction: quantize → dequantize → direct
    cosine-sum IDCT → level shift/round/clip, cropped to frame."""
    th = -(-fh // 8) * 8
    tw = -(-fw // 8) * 8
    pp = np.pad(plane, ((0, th - plane.shape[0]),
                        (0, tw - plane.shape[1])), mode="edge")
    out = np.zeros((th, tw))
    for y0 in range(0, th, 8):
        for x0 in range(0, tw, 8):
            zz = _jquant_block(pp, y0, x0, qzz)
            co = np.zeros(64)
            for k in range(64):
                co[_JZZ[k]] = zz[k] * qzz[k]
            co = co.reshape(8, 8)
            blk = np.zeros((8, 8))
            for x in range(8):
                for y in range(8):
                    s = 0.0
                    for u in range(8):
                        for v in range(8):
                            cu = 1 / np.sqrt(2) if u == 0 else 1.0
                            cv = 1 / np.sqrt(2) if v == 0 else 1.0
                            s += (cu * cv * co[u, v]
                                  * np.cos((2 * x + 1) * u * np.pi / 16)
                                  * np.cos((2 * y + 1) * v * np.pi / 16))
                    blk[x, y] = 0.25 * s
            out[y0:y0 + 8, x0:x0 + 8] = blk
    return np.clip(np.round(out + 128.0), 0, 255).astype(np.uint8)[:fh, :fw]


def test_jpeg_dc_only_closed_form():
    """Single-block grayscale JPEG with one-code Huffman tables and a
    one-byte entropy segment — the exact closed form the planted
    oracle leg uses (category-6 DC value v, Q=8 → every pixel is
    v+128, std 0)."""
    for v in (32, 45, 63):
        p = (b"\xff\xd8"
             + bytes([0xFF, 0xDB, 0x00, 0x43, 0x00]) + bytes([8] * 64)
             + bytes([0xFF, 0xC0, 0x00, 0x0B, 0x08, 0x00, 0x08,
                      0x00, 0x08, 0x01, 0x01, 0x11, 0x00])
             + bytes([0xFF, 0xC4, 0x00, 0x14, 0x00])
             + bytes([1] + [0] * 15) + bytes([0x06])
             + bytes([0xFF, 0xC4, 0x00, 0x14, 0x10])
             + bytes([1] + [0] * 15) + bytes([0x00])
             + bytes([0xFF, 0xDA, 0x00, 0x08, 0x01, 0x01, 0x00,
                      0x00, 0x3F, 0x00])
             + bytes([v << 1]) + b"\xff\xd9")
        px = MC.jpeg_decode(p)
        assert px.shape == (8, 8, 1)
        assert int(px.min()) == int(px.max()) == v + 128


def test_jpeg_gray_vs_independent_reconstruction():
    """Random grayscale images, q=1 and a non-trivial quant table,
    non-multiple-of-8 dims: the decoder must match the independent
    quantize→dequantize→direct-IDCT reconstruction to ≤1 (double
    rounding at exact .5 boundaries between the two float orders)."""
    for (h, w), q in [((16, 24), np.ones(64, int)),
                      ((10, 13), np.ones(64, int)),
                      ((8, 8), (np.arange(64) % 7 + 1))]:
        img = RNG.integers(0, 256, (h, w), dtype=np.uint8)
        dec = MC.jpeg_decode(build_jpeg([img], [(1, 1)], [q]))
        assert dec.shape == (h, w, 1)
        exp = _jexpected_gray(img, q, h, w)
        err = np.abs(dec[:, :, 0].astype(int) - exp.astype(int)).max()
        assert err <= 1, err


def test_jpeg_color_444_and_420_composition():
    """3-component decode vs an independent composition: craft Y/Cb/Cr
    planes directly, compute expected RGB with explicit np.repeat
    upsampling + the BT.601 full-range matrix. q=1 keeps per-plane
    loss at rounding scale (≤1); the color matrix amplifies it by up
    to 1+1.772 before the final round, so the tolerance is ±4."""
    for sampling, (ch, cw) in [([(1, 1)] * 3, (16, 16)),
                               ([(2, 2), (1, 1), (1, 1)], (8, 8))]:
        y = RNG.integers(40, 216, (16, 16), dtype=np.uint8)
        cb = RNG.integers(40, 216, (ch, cw), dtype=np.uint8)
        cr = RNG.integers(40, 216, (ch, cw), dtype=np.uint8)
        q = np.ones(64, int)
        dec = MC.jpeg_decode(build_jpeg([y, cb, cr], sampling, [q] * 3))
        assert dec.shape == (16, 16, 3)
        cbf = np.repeat(np.repeat(cb, 16 // ch, 0), 16 // cw, 1)
        crf = np.repeat(np.repeat(cr, 16 // ch, 0), 16 // cw, 1)
        yf = y.astype(float)
        exp = np.stack([
            yf + 1.402 * (crf - 128.0),
            yf - 0.344136 * (cbf - 128.0) - 0.714136 * (crf - 128.0),
            yf + 1.772 * (cbf - 128.0)], axis=2)
        exp = np.clip(np.round(exp), 0, 255)
        err = np.abs(dec.astype(float) - exp).max()
        assert err <= 4, err


def test_jpeg_restart_markers():
    """DRI + RSTn segmentation must reproduce the no-restart pixels
    exactly (predictor resets + bit realignment at every marker)."""
    img = RNG.integers(0, 256, (24, 32), dtype=np.uint8)
    q = np.ones(64, int)
    base = MC.jpeg_decode(build_jpeg([img], [(1, 1)], [q]))
    rst = MC.jpeg_decode(build_jpeg([img], [(1, 1)], [q], restart=3))
    assert np.array_equal(base, rst)


def test_jpeg_honest_refusals_and_hostile_bytes():
    img = RNG.integers(0, 256, (8, 8), dtype=np.uint8)
    good = build_jpeg([img], [(1, 1)], [np.ones(64, int)])
    # arithmetic coding: same file with SOF0 swapped to SOF9 — an
    # honest refusal (progressive SOF2 is now DECODED; a baseline
    # stream mislabeled SOF2 is malformed, not unimplemented)
    arith = good.replace(bytes([0xFF, 0xC0]), bytes([0xFF, 0xC9]), 1)
    with pytest.raises(NotImplementedError, match="arithmetic"):
        MC.jpeg_decode(arith)
    mislabel = good.replace(bytes([0xFF, 0xC0]), bytes([0xFF, 0xC2]), 1)
    with pytest.raises(ValueError, match="Se=0"):
        MC.jpeg_decode(mislabel)
    # truncated entropy data
    with pytest.raises(ValueError, match="truncated|missing"):
        MC.jpeg_decode(good[:len(good) - 6] + b"\xff\xd9")
    # zero dimension
    sof_at = good.index(bytes([0xFF, 0xC0]))
    bad = bytearray(good)
    bad[sof_at + 5:sof_at + 7] = b"\x00\x00"
    with pytest.raises(ValueError, match="zero frame"):
        MC.jpeg_decode(bytes(bad))
    # lying pixel geometry past the decoder cap
    big = bytearray(good)
    big[sof_at + 5:sof_at + 9] = b"\xff\xff\xff\xff"
    with pytest.raises(ValueError, match="pixel cap"):
        MC.jpeg_decode(bytes(big))
    # invalid Huffman code: an all-1s entropy byte stream with tables
    # that never assign the all-1s code
    with pytest.raises(ValueError):
        MC.jpeg_decode(good[:good.index(b"\x00\x3f\x00") + 3]
                       + b"\xff\x00\xff\x00" + b"\xff\xd9")


def test_jpeg_decode_media_and_sniff_agree(spark):
    """decode_media now really decodes baseline JPEG; the header
    sniffer's SOF geometry must match the decoded geometry."""
    img = RNG.integers(0, 256, (24, 17), dtype=np.uint8)
    payload = build_jpeg([img], [(1, 1)], [np.ones(64, int)])
    media = _media_df(spark, [payload])
    dec = MM.decode_media(media).collect()[0]
    assert dec["err"] is None and dec["kind"] == "image"
    assert (dec["height"], dec["width"], dec["channels"]) == (24, 17, 1)
    sn = MM.sniff_media_meta(media).collect()[0]
    assert (sn["height"], sn["width"]) == (24, 17)


# --------------------------------------------------- progressive JPEG
#
# Independent in-test PROGRESSIVE encoder (T.81 Annex G scan
# structure: spectral selection, successive approximation, EOBn runs,
# AC-refinement correction-bit buffering in the proven libjpeg
# ordering). Ground truth: a progressive encoding of the SAME
# quantized coefficients must decode to EXACTLY the baseline
# decoder's pixels — the expected output comes from the already-
# golden baseline path, so encoder/decoder errors cannot cancel
# against it.


#: progressive AC scans need EOBn symbols (0x10..0xE0) that the
#: Annex-K baseline tables don't define — real progressive encoders
#: ship custom DHTs. This one covers every rs symbol: 255 codes of
#: length 8 + one of length 9 (keeps the all-ones 8-bit code free).
_JAC_FULL = ([0, 0, 0, 0, 0, 0, 0, 255, 1, 0, 0, 0, 0, 0, 0, 0],
             list(range(255)) + [255])


def _jprog_coef_grids(planes, sampling, qzz_tables, fh, fw):
    hmax = max(s[0] for s in sampling)
    vmax = max(s[1] for s in sampling)
    mcux, mcuy = -(-fw // (8 * hmax)), -(-fh // (8 * vmax))
    grids = []
    for p_, (sh, sv), q in zip(planes, sampling, qzz_tables):
        th, tw = mcuy * sv * 8, mcux * sh * 8
        pp = np.pad(p_, ((0, th - p_.shape[0]), (0, tw - p_.shape[1])),
                    mode="edge")
        grid = {}
        for by in range(th // 8):
            for bx in range(tw // 8):
                grid[(by, bx)] = _jquant_block(pp, by * 8, bx * 8, q)
        grids.append(grid)
    return grids, mcux, mcuy


def _jprog_ac_raster(comp_idx, sampling, fh, fw):
    hmax = max(s[0] for s in sampling)
    vmax = max(s[1] for s in sampling)
    sh, sv = sampling[comp_idx]
    cw = -(-fw * sh // hmax)
    ch = -(-fh * sv // vmax)
    return -(-cw // 8), -(-ch // 8)


def _jrst(w, cnt):
    """Close the current entropy segment: byte-align, then emit the
    RSTn marker (markers go in raw, bypassing byte stuffing)."""
    w.align()
    w.out += bytes([0xFF, 0xD0 + (cnt & 7)])


def _emit_dc_first(grids, sampling, mcux, mcuy, al, dc_codes, fh, fw,
                   restart=0):
    w = _JBitWriter()
    nc = len(grids)
    preds = [0] * nc
    nrst = 0
    if nc > 1:
        for mcu in range(mcux * mcuy):
            if restart and mcu and mcu % restart == 0:
                _jrst(w, nrst)
                nrst += 1
                preds = [0] * nc
            my, mx = divmod(mcu, mcux)
            for ci in range(nc):
                sh, sv = sampling[ci]
                for by in range(sv):
                    for bx in range(sh):
                        dcv = grids[ci][(my * sv + by, mx * sh + bx)][0] >> al
                        diff = dcv - preds[ci]
                        preds[ci] = dcv
                        s = _jcat(diff)
                        w.put(*reversed(dc_codes[ci][s]))
                        if s:
                            _jput_coef(w, diff, s)
    else:
        bw_, bh_ = _jprog_ac_raster(0, sampling, fh, fw)
        for mcu in range(bw_ * bh_):
            if restart and mcu and mcu % restart == 0:
                _jrst(w, nrst)
                nrst += 1
                preds = [0] * nc
            by, bx = divmod(mcu, bw_)
            dcv = grids[0][(by, bx)][0] >> al
            diff = dcv - preds[0]
            preds[0] = dcv
            s = _jcat(diff)
            w.put(*reversed(dc_codes[0][s]))
            if s:
                _jput_coef(w, diff, s)
    w.align()
    return bytes(w.out)


def _emit_dc_refine(grids, sampling, mcux, mcuy, al, fh, fw, restart=0):
    w = _JBitWriter()
    nc = len(grids)
    nrst = 0
    if nc > 1:
        for mcu in range(mcux * mcuy):
            if restart and mcu and mcu % restart == 0:
                _jrst(w, nrst)
                nrst += 1
            my, mx = divmod(mcu, mcux)
            for ci in range(nc):
                sh, sv = sampling[ci]
                for by in range(sv):
                    for bx in range(sh):
                        w.put((grids[ci][(my * sv + by, mx * sh + bx)][0]
                               >> al) & 1, 1)
    else:
        bw_, bh_ = _jprog_ac_raster(0, sampling, fh, fw)
        for mcu in range(bw_ * bh_):
            if restart and mcu and mcu % restart == 0:
                _jrst(w, nrst)
                nrst += 1
            by, bx = divmod(mcu, bw_)
            w.put((grids[0][(by, bx)][0] >> al) & 1, 1)
    w.align()
    return bytes(w.out)


def _emit_ac_first(grid, bw_, bh_, ss, se, al, ac_codes, restart=0):
    w = _JBitWriter()
    eob = 0
    nrst = 0

    def flush_eob():
        nonlocal eob
        if eob:
            r = eob.bit_length() - 1
            w.put(*reversed(ac_codes[r << 4]))
            if r:
                w.put(eob - (1 << r), r)
            eob = 0

    for mcu in range(bw_ * bh_):
        if restart and mcu and mcu % restart == 0:
            flush_eob()           # EOB runs must not cross a restart
            _jrst(w, nrst)
            nrst += 1
        by, bx = divmod(mcu, bw_)
        zz = grid[(by, bx)]
        vals = [(abs(zz[k]) >> al) * (1 if zz[k] > 0 else -1)
                for k in range(ss, se + 1)]
        nz = [i for i, v in enumerate(vals) if v]
        if not nz:
            eob += 1
            continue
        flush_eob()
        run = 0
        for idx in range(nz[-1] + 1):
            v = vals[idx]
            if v == 0:
                run += 1
                continue
            while run > 15:
                w.put(*reversed(ac_codes[0xF0]))
                run -= 16
            s = _jcat(v)
            w.put(*reversed(ac_codes[(run << 4) | s]))
            _jput_coef(w, v, s)
            run = 0
        if nz[-1] < len(vals) - 1:
            eob += 1
    flush_eob()
    w.align()
    return bytes(w.out)


def _emit_ac_refine(grid, bw_, bh_, ss, se, al, ac_codes, restart=0):
    """libjpeg encode_mcu_AC_refine structure: correction bits for
    already-nonzero coefficients buffer and flush after each emitted
    symbol; trailing runs fold into EOBn with their bits pending."""
    w = _JBitWriter()
    eob = 0
    pending = []
    nrst = 0

    def flush_eob():
        nonlocal eob, pending
        if eob:
            r = eob.bit_length() - 1
            w.put(*reversed(ac_codes[r << 4]))
            if r:
                w.put(eob - (1 << r), r)
            eob = 0
        for b in pending:
            w.put(b, 1)
        pending = []

    for mcu in range(bw_ * bh_):
        if restart and mcu and mcu % restart == 0:
            flush_eob()   # EOB run + its correction bits stay in-seg
            _jrst(w, nrst)
            nrst += 1
        by, bx = divmod(mcu, bw_)
        zz = grid[(by, bx)]
        absv = [abs(zz[k]) >> al for k in range(ss, se + 1)]
        eobpos = max((i for i, t in enumerate(absv) if t == 1),
                     default=-1)
        r, br = 0, []
        for idx in range(len(absv)):
            t = absv[idx]
            if t == 0:
                r += 1
                continue
            while r > 15 and idx <= eobpos:
                flush_eob()
                w.put(*reversed(ac_codes[0xF0]))
                r -= 16
                for b in br:
                    w.put(b, 1)
                br = []
            if t > 1:
                br.append(t & 1)
                continue
            flush_eob()
            w.put(*reversed(ac_codes[(r << 4) | 1]))
            w.put(1 if zz[idx + ss] > 0 else 0, 1)
            for b in br:
                w.put(b, 1)
            br = []
            r = 0
        if r > 0 or br:
            eob += 1
            pending.extend(br)
    flush_eob()
    w.align()
    return bytes(w.out)


def build_progressive_jpeg(planes, sampling, qzz_tables, script,
                           restart=0):
    """T.81 progressive file: DQT + SOF2 + DHTs + one SOS per script
    entry. Script entries: ('dc_first', al) / ('dc_refine', al) /
    ('ac_first', comp, ss, se, al) / ('ac_refine', comp, ss, se, al).
    Component 0 uses the Annex-K luminance Huffman tables, others
    chrominance (table ids 0/1). ``restart`` emits a DRI segment and
    splits EVERY scan's entropy data with RSTn markers each
    ``restart`` MCUs (DC predictors, EOB runs and pending correction
    bits never cross a boundary)."""
    nc = len(planes)
    fh, fw = planes[0].shape
    grids, mcux, mcuy = _jprog_coef_grids(planes, sampling, qzz_tables,
                                          fh, fw)
    dc_codes = [_jcodes(*(_JDC_L if c == 0 else _JDC_C))
                for c in range(nc)]
    ac_codes = [_jcodes(*_JAC_FULL) for _ in range(nc)]
    out = bytearray(b"\xff\xd8")
    for c in range(nc):
        out += bytes([0xFF, 0xDB, 0x00, 0x43, c]) \
            + bytes(int(q) for q in qzz_tables[c])
    out += bytes([0xFF, 0xC2]) + (8 + 3 * nc).to_bytes(2, "big") \
        + bytes([8]) + fh.to_bytes(2, "big") + fw.to_bytes(2, "big") \
        + bytes([nc])
    for c in range(nc):
        out += bytes([c + 1, (sampling[c][0] << 4) | sampling[c][1], c])
    dhts = ([(0, 0, _JDC_L), (1, 0, _JAC_FULL)] if nc == 1 else
            [(0, 0, _JDC_L), (1, 0, _JAC_FULL),
             (0, 1, _JDC_C), (1, 1, _JAC_FULL)])
    for cls, tid, (cnt, sym) in dhts:
        out += bytes([0xFF, 0xC4]) \
            + (2 + 1 + 16 + len(sym)).to_bytes(2, "big") \
            + bytes([(cls << 4) | tid]) + bytes(cnt) + bytes(sym)
    if restart:
        out += bytes([0xFF, 0xDD, 0x00, 0x04]) + restart.to_bytes(2, "big")
    for entry in script:
        kind = entry[0]
        if kind == "dc_first":
            al = entry[1]
            ent = _emit_dc_first(grids, sampling, mcux, mcuy, al,
                                 dc_codes, fh, fw, restart=restart)
            hdr = bytes([nc]) + b"".join(
                bytes([c + 1, ((0 if c == 0 else 1) << 4)])
                for c in range(nc)) + bytes([0, 0, al])
        elif kind == "dc_refine":
            al = entry[1]
            ent = _emit_dc_refine(grids, sampling, mcux, mcuy, al,
                                  fh, fw, restart=restart)
            hdr = bytes([nc]) + b"".join(
                bytes([c + 1, 0]) for c in range(nc)) \
                + bytes([0, 0, ((al + 1) << 4) | al])
        else:
            _k, ci, ss, se, al = entry
            bw_, bh_ = _jprog_ac_raster(ci, sampling, fh, fw)
            tid = 0 if ci == 0 else 1
            if kind == "ac_first":
                ent = _emit_ac_first(grids[ci], bw_, bh_, ss, se, al,
                                     ac_codes[ci], restart=restart)
                ah = 0
            else:
                ent = _emit_ac_refine(grids[ci], bw_, bh_, ss, se, al,
                                      ac_codes[ci], restart=restart)
                ah = al + 1
            hdr = bytes([1, ci + 1, tid]) + bytes([ss, se, (ah << 4) | al])
        out += bytes([0xFF, 0xDA]) + (2 + len(hdr)).to_bytes(2, "big") \
            + hdr + ent
    out += bytes([0xFF, 0xD9])
    return bytes(out)


def test_jpeg_progressive_spectral_selection_only():
    """Pure spectral selection (no successive approximation): DC scan
    then two AC band scans must reproduce the baseline decode of the
    same coefficients exactly."""
    img = RNG.integers(0, 256, (16, 24), dtype=np.uint8)
    q = np.ones(64, int)
    base = MC.jpeg_decode(build_jpeg([img], [(1, 1)], [q]))
    prog = MC.jpeg_decode(build_progressive_jpeg(
        [img], [(1, 1)], [q],
        [("dc_first", 0),
         ("ac_first", 0, 1, 5, 0),
         ("ac_first", 0, 6, 63, 0)]))
    assert np.array_equal(base, prog)


def test_jpeg_progressive_successive_approximation_gray():
    """Full successive approximation: DC split over two scans, AC
    bands entered at Al=2 and refined down to 0 (two refinement
    passes exercise the correction-bit path repeatedly)."""
    img = RNG.integers(0, 256, (24, 16), dtype=np.uint8)
    q = (np.arange(64) % 5 + 1)
    base = MC.jpeg_decode(build_jpeg([img], [(1, 1)], [q]))
    prog = MC.jpeg_decode(build_progressive_jpeg(
        [img], [(1, 1)], [q],
        [("dc_first", 1), ("dc_refine", 0),
         ("ac_first", 0, 1, 5, 2),
         ("ac_refine", 0, 1, 5, 1),
         ("ac_refine", 0, 1, 5, 0),
         ("ac_first", 0, 6, 63, 1),
         ("ac_refine", 0, 6, 63, 0)]))
    assert np.array_equal(base, prog)


def test_jpeg_progressive_color_420():
    """3-component 4:2:0 progressive: interleaved DC scans +
    per-component AC band scans with refinement — the full shape real
    encoders emit — must match the baseline decode."""
    y = RNG.integers(0, 256, (16, 16), dtype=np.uint8)
    cb = RNG.integers(0, 256, (8, 8), dtype=np.uint8)
    cr = RNG.integers(0, 256, (8, 8), dtype=np.uint8)
    sampling = [(2, 2), (1, 1), (1, 1)]
    qs = [np.ones(64, int)] * 3
    base = MC.jpeg_decode(build_jpeg([y, cb, cr], sampling, qs))
    script = [("dc_first", 1), ("dc_refine", 0)]
    for ci in range(3):
        script += [("ac_first", ci, 1, 63, 1), ("ac_refine", ci, 1, 63, 0)]
    prog = MC.jpeg_decode(build_progressive_jpeg(
        [y, cb, cr], sampling, qs, script))
    assert np.array_equal(base, prog)


def test_jpeg_progressive_stress_eobruns():
    """Randomized multi-block stress: smooth images quantized hard so
    many band scans are all-zero → multi-block EOBn runs with
    extension bits (r>0), plus ZRL-in-refinement interactions. Every
    image must match its baseline decode exactly."""
    for trial in range(6):
        h, w = 8 * (2 + trial % 3), 8 * (3 + trial % 2)
        base_img = RNG.integers(0, 256, (h // 8, w // 8), dtype=np.uint8)
        img = np.repeat(np.repeat(base_img, 8, 0), 8, 1)  # flat blocks
        noise = RNG.integers(-6, 7, (h, w))
        img = np.clip(img.astype(int) + noise, 0, 255).astype(np.uint8)
        q = np.full(64, 12, int)  # hard quantization → sparse bands
        base = MC.jpeg_decode(build_jpeg([img], [(1, 1)], [q]))
        prog = MC.jpeg_decode(build_progressive_jpeg(
            [img], [(1, 1)], [q],
            [("dc_first", 2), ("dc_refine", 1), ("dc_refine", 0),
             ("ac_first", 0, 1, 2, 1),
             ("ac_refine", 0, 1, 2, 0),
             ("ac_first", 0, 3, 63, 1),
             ("ac_refine", 0, 3, 63, 0)]))
        assert np.array_equal(base, prog), trial


def test_jpeg_progressive_restart_intervals():
    """DRI + RSTn inside progressive scans: the decoder must advance
    to the next entropy segment and reset DC predictors AND the EOB
    run at every boundary (the restart behavior unique to
    progressive). Flat blocks force multi-block EOBn runs that are
    flushed at each boundary, so segments genuinely carry EOBn codes;
    DC predictor resets are differential (a decoder that kept preds
    across a boundary would diverge from the baseline pixels)."""
    base_img = RNG.integers(0, 256, (3, 4), dtype=np.uint8)
    img = np.repeat(np.repeat(base_img, 8, 0), 8, 1)  # 24×32, flat
    noise = RNG.integers(-5, 6, img.shape)
    img = np.clip(img.astype(int) + noise, 0, 255).astype(np.uint8)
    q = np.full(64, 10, int)
    base = MC.jpeg_decode(build_jpeg([img], [(1, 1)], [q]))
    script = [("dc_first", 1), ("dc_refine", 0),
              ("ac_first", 0, 1, 5, 1), ("ac_refine", 0, 1, 5, 0),
              ("ac_first", 0, 6, 63, 0)]
    for ri in (1, 2, 3, 5):
        p = build_progressive_jpeg([img], [(1, 1)], [q], script,
                                   restart=ri)
        assert p.count(b"\xff\xd0") + p.count(b"\xff\xd1") > 0, ri
        assert np.array_equal(base, MC.jpeg_decode(p)), ri


def test_jpeg_progressive_restart_color_interleaved():
    """Restarts inside an interleaved progressive DC scan reset ALL
    components' predictors; per-component AC scans restart on their
    own (component-raster) MCU grid."""
    y = RNG.integers(0, 256, (16, 32), dtype=np.uint8)
    cb = RNG.integers(0, 256, (8, 16), dtype=np.uint8)
    cr = RNG.integers(0, 256, (8, 16), dtype=np.uint8)
    sampling = [(2, 2), (1, 1), (1, 1)]
    qs = [np.ones(64, int)] * 3
    base = MC.jpeg_decode(build_jpeg([y, cb, cr], sampling, qs))
    script = [("dc_first", 1), ("dc_refine", 0)]
    for ci in range(3):
        script += [("ac_first", ci, 1, 63, 1),
                   ("ac_refine", ci, 1, 63, 0)]
    prog = MC.jpeg_decode(build_progressive_jpeg(
        [y, cb, cr], sampling, qs, script, restart=1))
    assert np.array_equal(base, prog)


def test_jpeg_progressive_missing_restart_is_valueerror():
    """A DRI interval whose RSTn markers never arrive must raise the
    quarantine-friendly ValueError, not hang or IndexError."""
    img = RNG.integers(0, 256, (16, 24), dtype=np.uint8)
    p = build_progressive_jpeg(
        [img], [(1, 1)], [np.ones(64, int)],
        [("dc_first", 0), ("ac_first", 0, 1, 63, 0)])
    # declare restart=2 without emitting any RST markers
    i = p.index(b"\xff\xda")
    patched = p[:i] + bytes([0xFF, 0xDD, 0x00, 0x04, 0x00, 0x02]) + p[i:]
    with pytest.raises(ValueError):
        MC.jpeg_decode(patched)


def test_jpeg_progressive_dc_overflow_is_valueerror():
    """A hostile DC-first scan at Al=13 accumulating max-category
    (+2047) diffs overflows the int32 coefficient grid on block 129
    (2047·129·2^13 > 2^31) — the decoder must keep the ValueError
    quarantine contract, not surface numpy's OverflowError (or wrap
    silently on older numpy). Baseline never shifts, so only the
    progressive path can hit this."""
    n_blocks = 129
    w = _JBitWriter()
    codes = _jcodes(*_JDC_L)
    for _ in range(n_blocks):
        w.put(*reversed(codes[11]))
        _jput_coef(w, 2047, 11)
    w.align()
    fh, fw = 8, 8 * n_blocks
    out = bytearray(b"\xff\xd8")
    out += bytes([0xFF, 0xDB, 0x00, 0x43, 0]) + bytes([1] * 64)
    out += bytes([0xFF, 0xC2, 0x00, 0x0B, 8]) \
        + fh.to_bytes(2, "big") + fw.to_bytes(2, "big") \
        + bytes([1, 1, 0x11, 0])
    cnt, sym = _JDC_L
    out += bytes([0xFF, 0xC4]) \
        + (2 + 1 + 16 + len(sym)).to_bytes(2, "big") \
        + bytes([0x00]) + bytes(cnt) + bytes(sym)
    out += bytes([0xFF, 0xDA, 0x00, 0x08, 1, 1, 0x00, 0, 0, 13]) \
        + bytes(w.out)
    out += bytes([0xFF, 0xD9])
    with pytest.raises(ValueError, match="overflow"):
        MC.jpeg_decode(bytes(out))


def test_jpeg_progressive_decode_media_and_refusals(spark):
    img = RNG.integers(0, 256, (8, 8), dtype=np.uint8)
    prog = build_progressive_jpeg(
        [img], [(1, 1)], [np.ones(64, int)],
        [("dc_first", 0), ("ac_first", 0, 1, 63, 0)])
    dec = MM.decode_media(_media_df(spark, [prog])).collect()[0]
    assert dec["err"] is None and dec["kind"] == "image"
    assert (dec["height"], dec["width"]) == (8, 8)
    # arithmetic coding stays an honest refusal
    arith = prog.replace(bytes([0xFF, 0xC2]), bytes([0xFF, 0xCA]), 1)
    with pytest.raises(NotImplementedError, match="arithmetic"):
        MC.jpeg_decode(arith)


# ------------------------------------------------------- MP4 sniff

def _be(v, n):
    return int(v).to_bytes(n, "big")


_MP4_IDENT = (_be(0x00010000, 4) + bytes(12) + _be(0x00010000, 4)
              + bytes(12) + _be(0x40000000, 4))


def _box(btype: bytes, payload: bytes, *, largesize=False) -> bytes:
    if largesize:
        return _be(1, 4) + btype + _be(16 + len(payload), 8) + payload
    return _be(8 + len(payload), 4) + btype + payload


def build_mp4(dur_units, timescale, tracks, *, mvhd_v1=False,
              largesize=False):
    """Hand-packed ISO-BMFF per 14496-12: ftyp + moov[mvhd +
    trak[tkhd]...]. ``tracks`` = [(w, h, tkhd_v1), ...]; w=h=0 packs
    an audio-style track. Independent of the sniffer (explicit field
    offsets from the spec tables)."""
    if mvhd_v1:
        mvhd = _box(b"mvhd", bytes([1, 0, 0, 0]) + bytes(16)
                    + _be(timescale, 4) + _be(dur_units, 8)
                    + _be(0x00010000, 4) + _be(0x0100, 2) + bytes(10)
                    + _MP4_IDENT + bytes(24) + _be(2, 4))
    else:
        mvhd = _box(b"mvhd", bytes(4) + bytes(8) + _be(timescale, 4)
                    + _be(dur_units, 4)
                    + _be(0x00010000, 4) + _be(0x0100, 2) + bytes(10)
                    + _MP4_IDENT + bytes(24) + _be(2, 4))
    traks = b""
    for w, h, v1 in tracks:
        if v1:
            tkhd = _box(b"tkhd", bytes([1, 0, 0, 7]) + bytes(16)
                        + _be(1, 4) + bytes(4) + bytes(8) + bytes(8)
                        + bytes(8) + _MP4_IDENT
                        + _be(w << 16, 4) + _be(h << 16, 4))
        else:
            tkhd = _box(b"tkhd", bytes([0, 0, 0, 7]) + bytes(8)
                        + _be(1, 4) + bytes(4) + bytes(4) + bytes(8)
                        + bytes(8) + _MP4_IDENT
                        + _be(w << 16, 4) + _be(h << 16, 4))
        traks += _box(b"trak", tkhd)
    moov = _box(b"moov", mvhd + traks, largesize=largesize)
    return _box(b"ftyp", b"isom" + _be(0, 4)) + moov


def test_mp4_sniff_v0_and_v1():
    from remote_storage_adapter_spark.operators.multimodal import _sniff
    # v0 mvhd/tkhd, audio track (0x0) before the video track
    p = build_mp4(2500, 1000, [(0, 0, False), (320, 180, False)])
    assert _sniff(p) == ("mp4", 320, 180, None, None, 2500)
    # v1 mvhd (64-bit duration) + v1 tkhd, non-1000 timescale
    p = build_mp4(90000 * 7, 90000, [(640, 360, True)], mvhd_v1=True)
    assert _sniff(p) == ("mp4", 640, 360, None, None, 7000)
    # 64-bit largesize moov header
    p = build_mp4(123, 1000, [(8, 4, False)], largesize=True)
    assert _sniff(p) == ("mp4", 8, 4, None, None, 123)


def test_mp4_sniff_hostile_sizes_bounded():
    from remote_storage_adapter_spark.operators.multimodal import _sniff
    good = build_mp4(500, 1000, [(16, 16, False)])
    # truncated mid-moov: partial results, no crash
    fmt, *_rest = _sniff(good[:40])
    assert fmt == "mp4"
    # lying box size (points past EOF): walk stops, returns mp4/None
    bad = bytearray(good)
    bad[16:20] = _be(1 << 30, 4)  # moov size lies
    assert _sniff(bytes(bad))[0] == "mp4"
    # size < header: stops instead of looping forever
    bad2 = bytearray(good)
    bad2[16:20] = _be(3, 4)
    assert _sniff(bytes(bad2))[0] == "mp4"


def test_mp4_decode_media_quarantines_but_sniff_parses(spark):
    """The honest split: sniff_media_meta recovers container metadata,
    decode_media quarantines (codec streams are not decoded)."""
    p = build_mp4(1500, 1000, [(320, 240, False)])
    media = _media_df(spark, [p])
    sn = MM.sniff_media_meta(media).collect()[0]
    assert (sn["format"], sn["width"], sn["height"], sn["duration_ms"]) \
        == ("mp4", 320, 240, 1500)
    dec = MM.decode_media(media).collect()[0]
    assert dec["kind"] is None and dec["err"] is not None


def test_lying_chunk_lengths_raise_valueerror_not_struct_error():
    """r7 ADVICE: a chunk whose declared length lies (truncated IHDR,
    WAV fmt shorter than 16 bytes, GIF cut inside the logical screen
    descriptor) must surface as the documented ValueError — callers
    handling the contract would otherwise see struct.error /
    IndexError leak through."""
    # PNG declaring a 13-byte IHDR with only 5 bytes present
    bad_png = MC._PNG_SIG + struct.pack(">I", 13) + b"IHDR" + b"\x00" * 5
    with pytest.raises(ValueError, match="IHDR"):
        MC.png_decode(bad_png)
    # WAV fmt chunk declaring 8 bytes (< the 16 the spec requires)
    bad_wav = (b"RIFF" + struct.pack("<I", 20) + b"WAVE"
               + b"fmt " + struct.pack("<I", 8) + b"\x00" * 8)
    with pytest.raises(ValueError, match="fmt"):
        MC.wav_decode(bad_wav)
    # GIF truncated inside the 13-byte header+LSD
    with pytest.raises(ValueError, match="truncated"):
        MC.gif_decode(b"GIF89a" + b"\x10\x00")


# ------------------------------------------- perceptual image hashes

def test_image_dhash_gradient_goldens():
    """Hand-computable dHash: a 9×8 image whose rows strictly DECREASE
    left-to-right sets every comparison bit → fp is all-ones, i.e.
    two's-complement -1 (locks the bit-63 sign handling); strictly
    increasing rows set none → fp == 0."""
    dec = np.tile(np.arange(9, 0, -1, dtype=np.uint8) * 20,
                  (8, 1))  # 8×9: NN-resize to 9×8 is the identity
    inc = dec[:, ::-1].copy()
    assert MM._dhash_one(build_png(dec[..., None], [0] * 8, 0)) == -1
    assert MM._dhash_one(build_png(inc[..., None], [0] * 8, 0)) == 0


def test_image_dhash_brightness_shift_invariant():
    """dHash compares adjacent pixels, so a uniform brightness shift
    (no clipping) never changes it."""
    img = (RNG.integers(0, 200, (16, 20), dtype=np.uint8))
    shifted = (img + 55).astype(np.uint8)
    a = MM._dhash_one(build_png(img[..., None], [0] * 16, 0))
    b = MM._dhash_one(build_png(shifted[..., None], [0] * 16, 0))
    assert a == b


def test_image_phash_contrast_scale_invariant():
    """pHash thresholds DCT coefficients against their own median, so
    exact contrast scaling (×2 on a 0-127 image — lossless in uint8)
    scales coefficients and median together and preserves every bit."""
    img = RNG.integers(0, 128, (24, 24), dtype=np.uint8)
    doubled = (img * 2).astype(np.uint8)
    a = MM._phash_one(build_png(img[..., None], [0] * 24, 0))
    b = MM._phash_one(build_png(doubled[..., None], [0] * 24, 0))
    assert a == b


def test_image_hash_quarantine_and_dispatch(spark):
    """Non-image/corrupt payloads quarantine per-row (fp NULL + typed
    err), valid ones hash; unknown algo is rejected eagerly."""
    img = RNG.integers(0, 256, (8, 8), dtype=np.uint8)
    good = build_png(img[..., None], [0] * 8, 0)
    wav = build_wav(np.zeros((64, 1), dtype=np.int16), 8000)
    rows = {r["media_id"]: r
            for r in MM.image_hash(
                _media_df(spark, [good, wav, b"\x00garbage"])).collect()}
    assert rows[0]["err"] is None and rows[0]["fp"] is not None
    assert rows[1]["fp"] is None and rows[1]["err"]
    assert rows[2]["fp"] is None and rows[2]["err"]
    with pytest.raises(ValueError, match="algo"):
        MM.image_hash(_media_df(spark, [good]), algo="ahash")


def test_image_near_dup_pairs_finds_planted_pair(spark):
    """End-to-end image near-dup: a near-copy (one pixel nudged in a
    flat region) pairs with its original within the Hamming radius;
    an unrelated image and a corrupt payload do not."""
    base = np.tile(
        RNG.integers(0, 256, (4, 4), dtype=np.uint8), (4, 4))  # 16×16
    near = base.copy()
    near[0, 0] = min(254, near[0, 0]) + 1
    other = RNG.integers(0, 256, (16, 16), dtype=np.uint8)
    payloads = [build_png(a[..., None], [0] * 16, 0)
                for a in (base, near, other)] + [b"\xffnot-an-image"]
    pairs = MM.image_near_dup_pairs(
        _media_df(spark, payloads), max_hamming=3).collect()
    assert [(p["id_a"], p["id_b"]) for p in pairs] == [(0, 1)]
    assert pairs[0]["hamming"] <= 3


def test_hamming_pairs_matches_brute_force(spark):
    """The fingerprint-agnostic hamming_pairs core (shared by text
    SimHash and image hashes) agrees with an exhaustive scan on random
    64-bit fingerprints, including negative (bit-63) values."""
    from remote_storage_adapter_spark.operators.dedup import hamming_pairs

    rng = np.random.default_rng(7)
    fps = rng.integers(-(2 ** 63), 2 ** 63, 40, dtype=np.int64)

    def sxor(a, m):          # signed-int64 XOR with a Python mask
        v = (int(a) ^ m) & (2 ** 64 - 1)
        return v - (1 << 64) if v >= 2 ** 63 else v

    # plant a few close pairs so the radius genuinely fires
    fps[1] = sxor(fps[0], 0b101)      # distance 2
    fps[3] = sxor(fps[2], 1 << 63)    # distance 1 across the sign bit
    fps[5] = fps[4]                   # distance 0
    df = spark.createDataFrame(
        [(i, int(v)) for i, v in enumerate(fps)], "id long, fp long")
    got = sorted((r["id_a"], r["id_b"], r["hamming"])
                 for r in hamming_pairs(df, max_hamming=3).collect())
    exp = sorted(
        (a, b, int(bin((int(fps[a]) ^ int(fps[b])) & (2**64 - 1))
                   .count("1")))
        for a in range(len(fps)) for b in range(a + 1, len(fps))
        if bin((int(fps[a]) ^ int(fps[b])) & (2**64 - 1)).count("1") <= 3)
    assert got == exp


# ---------------------------------------------- audio spectral stats

def test_audio_features_pure_tone():
    """A 1 kHz sine at 8 kHz: centroid and rolloff land on the tone
    bin, zcr ≈ 2·f/sr, rms ≈ A/√2."""
    sr, f0, amp, n = 8000, 1000, 0.5, 8000
    t = np.arange(n) / sr
    pcm = np.round(np.sin(2 * np.pi * f0 * t) * amp * 32767) \
        .astype(np.int16).reshape(-1, 1)
    out = MM._audio_features_one(build_wav(pcm, sr))
    got_sr, got_n, dur, rms, zcr, centroid, rolloff = out
    assert (got_sr, got_n, dur) == (sr, n, 1000)
    assert abs(rms - amp / np.sqrt(2)) < 1e-3
    assert abs(zcr - 2 * f0 / sr) < 1e-3
    assert abs(centroid - f0) < 2.0
    assert abs(rolloff - f0) < 2.0


def test_audio_features_nyquist_square_closed_form():
    """The planted-oracle signal: alternating ±a/128 is a pure
    Nyquist line — rms exact-dyadic, zcr exactly 1, centroid and
    rolloff exactly sr/2."""
    a = 53
    data = bytes([128 + a, 128 - a] * 8)
    wav = (b"RIFF" + (36 + 16).to_bytes(4, "little") + b"WAVE"
           + b"fmt " + (16).to_bytes(4, "little")
           + struct.pack("<HHIIHH", 1, 1, 8000, 8000, 1, 8)
           + b"data" + (16).to_bytes(4, "little") + data)
    out = MM._audio_features_one(wav)
    assert out == (8000, 16, 2, a / 128, 1.0, 4000.0, 4000.0)


def test_audio_features_dc_and_silence():
    """DC: zero crossings, all power at f=0 → centroid 0. Silence:
    zero total power → centroid/rolloff None, rms 0."""
    dc = np.full((64, 1), 1000, dtype=np.int16)
    sr_, n_, _d, rms, zcr, centroid, rolloff = \
        MM._audio_features_one(build_wav(dc, 8000))
    assert zcr == 0.0 and centroid == 0.0 and rolloff == 0.0
    silent = np.zeros((64, 1), dtype=np.int16)
    _sr, _n, _d, rms, zcr, centroid, rolloff = \
        MM._audio_features_one(build_wav(silent, 8000))
    assert rms == 0.0 and zcr == 0.0
    assert centroid is None and rolloff is None


def test_audio_features_quarantine(spark):
    """Images and corrupt bytes land in err; WAVs produce rows."""
    wav = build_wav(np.zeros((8, 1), dtype=np.int16), 8000)
    png = build_png(np.zeros((2, 2, 1), dtype=np.uint8), [0, 0], 0)
    rows = {r["media_id"]: r
            for r in MM.audio_features(
                _media_df(spark, [wav, png, b"RIFFxxxx"])).collect()}
    assert rows[0]["err"] is None and rows[0]["sr"] == 8000
    assert rows[1]["err"] and rows[1]["sr"] is None
    assert rows[2]["err"]


def test_image_index_matches_pairs_and_appends(spark):
    """The image near-dup index rides the SimHash catalog-table
    family via precomputed fingerprints (fp_col): self-probing the
    index reproduces image_near_dup_pairs exactly, the exactly-once
    append protocol applies to image batches unchanged (ledger skips
    the replay), and append == full build."""
    from remote_storage_adapter_spark.operators import dedup as D

    rng = np.random.default_rng(11)
    imgs = [rng.integers(0, 256, (16, 16), dtype=np.uint8)
            for _ in range(30)]
    imgs.append(imgs[0].copy())              # exact dup of 0
    near = imgs[1].copy()
    near[0, 0] = min(254, near[0, 0]) + 1    # near dup of 1
    imgs.append(near)
    payloads = [build_png(a[..., None], [0] * 16, 0) for a in imgs]
    media = _media_df(spark, payloads)
    table = "img_idx_test"
    try:
        MM.image_index_write(media, table, max_hamming=3, buckets=8,
                             table_buckets=4)
        direct = sorted(
            (r["id_a"], r["id_b"], r["hamming"])
            for r in MM.image_near_dup_pairs(media, max_hamming=3)
            .collect())
        assert (0, 30, 0) in direct          # the planted exact dup
        via_idx = sorted(
            (r["id_in"], r["id_ref"], r["hamming"])
            for r in MM.image_near_dup_indexed(
                spark, table, media, max_hamming=3, buckets=8)
            .filter(F.col("id_in") < F.col("id_ref")).collect())
        assert via_idx == direct
        D.unpersist_pinned()

        # incremental build: first half prebuilt, second half through
        # the exactly-once append (image fingerprints, same protocol)
        t_inc = "img_idx_test_inc"
        ids_a = media.filter(F.col("media_id") < 16)
        ids_b = media.filter(F.col("media_id") >= 16)
        MM.image_index_write(ids_a, t_inc, max_hamming=3, buckets=8,
                             table_buckets=4)
        fps_b = MM._image_fp_frame(ids_b, "dhash", "media_id",
                                   "payload")
        assert D.simhash_append_exactly_once(
            fps_b, t_inc, 7, max_hamming=3, buckets=8,
            table_buckets=4, id_col="media_id", fp_col="fp")
        assert D.simhash_append_exactly_once(
            fps_b, t_inc, 7, max_hamming=3, buckets=8,
            table_buckets=4, id_col="media_id", fp_col="fp") is False
        inc = sorted(
            (r["id_in"], r["id_ref"], r["hamming"])
            for r in MM.image_near_dup_indexed(
                spark, t_inc, media, max_hamming=3, buckets=8)
            .filter(F.col("id_in") < F.col("id_ref")).collect())
        assert inc == direct
        D.unpersist_pinned()
    finally:
        D.reset_managed_tables(spark, table, f"{table}_applied",
                               "img_idx_test_inc",
                               "img_idx_test_inc_applied")


# ------------------------------------------------------ EXIF metadata
# Independent TIFF construction: entries are packed with struct
# straight from the TIFF 6.0 layout, offsets computed incrementally —
# not via the module's walker.


def _tiff_entry(tag, typ, cnt, val4, order):
    e = "<" if order == "little" else ">"
    assert len(val4) == 4
    return struct.pack(e + "HHI", tag, typ, cnt) + val4


def _num(v, n, order):
    return int(v).to_bytes(n, order)


def _rats(vals, order):
    return b"".join(_num(n, 4, order) + _num(d, 4, order)
                    for n, d in vals)


def build_exif_jpeg(order="little", orient=6, make=b"Canon",
                    dims=(1024, 768), lat=((40, 1), (26, 1), (469, 100)),
                    lat_ref=b"N", lon=((79, 1), (58, 1), (5598, 100)),
                    lon_ref=b"W", dt=b"2023:01:02 03:04:05",
                    tail=b"\xff\xd9"):
    """SOI + APP1(Exif TIFF) + tail. IFD0: Make, Orientation,
    DateTime, ExifIFD ptr, GPS ptr; ExifIFD: PixelX/YDimension
    (LONG); GPSIFD: refs + 3-rational coords."""
    mk = make + b"\x00"
    dts = dt + b"\x00"
    ifd0_off = 8
    ifd0_len = 2 + 5 * 12 + 4
    exif_off = ifd0_off + ifd0_len
    exif_len = 2 + 2 * 12 + 4
    gps_off = exif_off + exif_len
    gps_len = 2 + 4 * 12 + 4
    mk_off = gps_off + gps_len
    dt_off = mk_off + len(mk)
    lat_off = dt_off + len(dts)
    lon_off = lat_off + 24
    short_inline = lambda v: _num(v, 2, order) + b"\x00\x00"  # noqa: E731
    long_inline = lambda v: _num(v, 4, order)  # noqa: E731
    ref_inline = lambda r: r + b"\x00\x00\x00"  # noqa: E731
    n2 = lambda n: _num(n, 2, order)  # noqa: E731
    ifd0 = n2(5) + b"".join([
        _tiff_entry(0x010F, 2, len(mk), long_inline(mk_off), order),
        _tiff_entry(0x0112, 3, 1, short_inline(orient), order),
        _tiff_entry(0x0132, 2, len(dts), long_inline(dt_off), order),
        _tiff_entry(0x8769, 4, 1, long_inline(exif_off), order),
        _tiff_entry(0x8825, 4, 1, long_inline(gps_off), order),
    ]) + b"\x00\x00\x00\x00"
    exif = n2(2) + b"".join([
        _tiff_entry(0xA002, 4, 1, long_inline(dims[0]), order),
        _tiff_entry(0xA003, 4, 1, long_inline(dims[1]), order),
    ]) + b"\x00\x00\x00\x00"
    gps = n2(4) + b"".join([
        _tiff_entry(1, 2, 2, ref_inline(lat_ref), order),
        _tiff_entry(2, 5, 3, long_inline(lat_off), order),
        _tiff_entry(3, 2, 2, ref_inline(lon_ref), order),
        _tiff_entry(4, 5, 3, long_inline(lon_off), order),
    ]) + b"\x00\x00\x00\x00"
    endian = b"II*\x00" if order == "little" else b"MM\x00*"
    tiff = (endian + _num(ifd0_off, 4, order) + ifd0 + exif + gps
            + mk + dts + _rats(lat, order) + _rats(lon, order))
    app1 = b"Exif\x00\x00" + tiff
    return (b"\xff\xd8\xff\xe1" + (len(app1) + 2).to_bytes(2, "big")
            + app1 + tail)


def _expect_deg(triple, sign):
    (dn, dd), (mn, md), (sn, sd) = triple
    return sign * ((dn / dd) + (mn / md) / 60.0 + (sn / sd) / 3600.0)


@pytest.mark.parametrize("order", ["little", "big"])
def test_exif_parse_golden(order):
    p = build_exif_jpeg(order=order)
    make, model, orient, dt, w, h, lat, lon = MM._exif_parse(p)
    assert (make, model, orient) == ("Canon", None, 6)
    assert dt == "2023:01:02 03:04:05"
    assert (w, h) == (1024, 768)
    assert lat == _expect_deg(
        ((40, 1), (26, 1), (469, 100)), 1.0)
    assert lon == _expect_deg(
        ((79, 1), (58, 1), (5598, 100)), -1.0)


def test_exif_parse_png_exif_chunk():
    """PNG carries the same TIFF blob in an eXIf chunk — the walk
    must find it there too, and strip_metadata must remove it."""
    tiff = build_exif_jpeg()[12:-2]          # TIFF = APP1 minus hdr
    assert tiff[:2] == b"II"
    px = RNG.integers(0, 256, (2, 3, 3), dtype=np.uint8)
    png = MC.png_encode(px)
    ihdr_end = png.index(b"IDAT") - 4
    fat = png[:ihdr_end] + _chunk(b"eXIf", tiff) + png[ihdr_end:]
    make, _m, orient, _dt, w, h, lat, lon = MM._exif_parse(fat)
    assert (make, orient, w, h) == ("Canon", 6, 1024, 768)
    assert lat > 0 > lon
    stripped = MM._strip_one(fat)
    assert stripped == png
    assert MM._exif_parse(stripped)[2] is None


def test_exif_parse_south_and_datetimeoriginal_precedence():
    p = build_exif_jpeg(lat_ref=b"S", lon_ref=b"E")
    *_, lat, lon = MM._exif_parse(p)
    assert lat < 0 < lon


def test_exif_parse_triage_on_hostile_bytes():
    """Lying counts/offsets/magic must yield all-None, never raise,
    never hang (bounded walk)."""
    base = build_exif_jpeg()
    hostiles = [
        b"", b"\xff\xd8", b"not a jpeg",
        base[:20],                        # truncated mid-APP1
        base[:4] + b"\x00\x01" + base[6:],  # lying seglen (too small)
        base.replace(b"II*\x00", b"II+\x00", 1),   # bad magic
        base.replace(b"II*\x00", b"XX*\x00", 1),   # bad byte order
        # lying IFD0 entry count (0xFFFF) — bounded by max_entries
        base[:14] + b"\xff\xff" + base[16:],
        # GPS rational with zero denominator
        base.replace(_num(100, 4, "little"),
                     _num(0, 4, "little")),
        # every byte zeroed after the Exif signature
        base[:16] + bytes(len(base) - 16),
    ]
    for p in hostiles:
        out = MM._exif_parse(p)
        assert len(out) == 8
    # ExifIFD pointer aimed back at IFD0 (offset 74 -> 8): the walk
    # must not recurse or hang — IFD0 re-read as ExifIFD simply has
    # no dimension tags, and pointers found there are never followed
    cyc = build_exif_jpeg().replace(
        _num(74, 4, "little"), _num(8, 4, "little"), 1)
    out = MM._exif_parse(cyc)
    assert out[2] == 6 and out[4] is None and out[5] is None


def test_exif_and_strip_skip_fill_bytes():
    """T.81 B.1.1.2 allows 0xFF fill bytes before any marker; some
    encoders emit them. The shared segment walk must skip them, not
    misparse the fill byte as a marker (pre-fix: real EXIF was lost
    to triage and valid files were quarantined by the scrub)."""
    base = build_exif_jpeg()
    filled = base[:2] + b"\xff\xff" + base[2:]
    assert MM._exif_parse(filled)[2] == 6
    img = RNG.integers(0, 256, (8, 8), dtype=np.uint8)
    orig = build_jpeg([img], [(1, 1)], [np.ones(64, int)])
    fat = orig[:2] + b"\xff" + base[2:-2] + orig[2:]
    assert MM._strip_one(fat) == orig


def test_exif_metadata_operator_and_triage(spark):
    jp = build_exif_jpeg()
    rows = {r["media_id"]: r
            for r in MM.exif_metadata(
                _media_df(spark, [jp, b"\x89PNG\r\n\x1a\nxxxx",
                                  b"junk"])).collect()}
    assert rows[0]["orientation"] == 6
    assert rows[0]["gps_lat"] == pytest.approx(40.4346361, abs=1e-6)
    assert rows[0]["make"] == "Canon"
    assert rows[1]["make"] is None and rows[2]["gps_lat"] is None


def test_strip_jpeg_roundtrip_pixels_identical():
    """Inserting APP1+COM into a real baseline JPEG and stripping
    must return the ORIGINAL bytes exactly (pure byte splice), and
    the stripped file must still decode to identical pixels."""
    img = RNG.integers(0, 256, (16, 16), dtype=np.uint8)
    q = np.ones(64, int)
    orig = build_jpeg([img], [(1, 1)], [q])
    app1 = build_exif_jpeg()[2:-2]           # APP1 segment only
    com = b"\xff\xfe\x00\x0chello jpeg"
    fat = orig[:2] + app1 + com + orig[2:]
    assert MM._exif_parse(fat)[2] == 6       # EXIF visible pre-strip
    stripped = MM._strip_one(fat)
    assert stripped == orig
    assert MM._exif_parse(stripped)[2] is None
    assert np.array_equal(MC.jpeg_decode(stripped),
                          MC.jpeg_decode(orig))
    # idempotent
    assert MM._strip_one(stripped) == stripped


def test_strip_png_meta_chunks():
    px = RNG.integers(0, 256, (4, 5, 3), dtype=np.uint8)
    orig = MC.png_encode(px)
    ihdr_end = orig.index(b"IDAT") - 4
    fat = (orig[:ihdr_end]
           + _chunk(b"tEXt", b"Comment\x00made by a camera")
           + _chunk(b"tIME", bytes(7))
           + orig[ihdr_end:]
           + b"trailing-garbage")            # dropped with the meta
    stripped = MM._strip_one(fat)
    assert stripped == orig
    assert np.array_equal(MC.png_decode(stripped), px)
    assert MM._strip_one(b"binary passthrough") == b"binary passthrough"


def test_strip_metadata_operator_quarantine(spark):
    img = RNG.integers(0, 256, (8, 8), dtype=np.uint8)
    jp = build_jpeg([img], [(1, 1)], [np.ones(64, int)])
    fat = jp[:2] + build_exif_jpeg()[2:-2] + jp[2:]
    lying = b"\xff\xd8\xff\xe1\xff\xff"      # APP1 length beyond EOF
    rows = {r["media_id"]: r
            for r in MM.strip_metadata(
                _media_df(spark, [fat, b"passthru", lying])).collect()}
    assert bytes(rows[0]["payload"]) == jp
    assert rows[0]["removed"] == len(fat) - len(jp)
    assert bytes(rows[1]["payload"]) == b"passthru"
    assert rows[1]["removed"] == 0
    assert rows[2]["payload"] is None
    assert "ValueError" in rows[2]["err"]


# ------------------------------------------------------------- WebP
# independent byte construction straight from the RIFF/VP8X/VP8/VP8L
# layouts (RFC 9649)


def _riff_chunk(cc: bytes, data: bytes) -> bytes:
    return cc + len(data).to_bytes(4, "little") + data \
        + (b"\x00" if len(data) & 1 else b"")


def _webp(chunks: bytes) -> bytes:
    return (b"RIFF" + (len(chunks) + 4).to_bytes(4, "little")
            + b"WEBP" + chunks)


def _vp8x(w, h, flags=0):
    return _riff_chunk(b"VP8X", bytes([flags, 0, 0, 0])
                       + (w - 1).to_bytes(3, "little")
                       + (h - 1).to_bytes(3, "little"))


def test_webp_sniff_vp8x_vp8_vp8l():
    x = _webp(_vp8x(640, 480))
    assert MM._sniff(x)[:3] == ("webp", 640, 480)
    # VP8 lossy still: 3-byte frame tag, 9D012A start code, 14-bit
    # dims (the two high bits of each u16 are scaling)
    lossy = _riff_chunk(b"VP8 ", bytes([0, 0, 0, 0x9D, 0x01, 0x2A])
                        + (321 | 0x4000).to_bytes(2, "little")
                        + (203 | 0x8000).to_bytes(2, "little")
                        + b"frame-bytes")
    assert MM._sniff(_webp(lossy))[:3] == ("webp", 321, 203)
    # VP8L lossless: 0x2F signature then 14+14 bits, minus-one coded
    bits = (77 - 1) | ((31 - 1) << 14)
    lossless = _riff_chunk(b"VP8L", bytes([0x2F])
                           + bits.to_bytes(4, "little"))
    assert MM._sniff(_webp(lossless))[:3] == ("webp", 77, 31)
    # lying chunk size: triage, not abort
    lying = _webp(b"VP8X" + (9999).to_bytes(4, "little") + b"xx")
    assert MM._sniff(lying)[:3] == ("webp", None, None)


def test_webp_exif_parse_and_strip():
    tiff = build_exif_jpeg()[12:-2]
    fat = _webp(_vp8x(99, 44, flags=0x0C)
                + _riff_chunk(b"EXIF", tiff)
                + _riff_chunk(b"XMP ", b"<x:xmpmeta/>")
                + _riff_chunk(b"VP8 ", b"\x00" * 20))
    make, _m, orient, _dt, w, h, lat, lon = MM._exif_parse(fat)
    assert (make, orient, w, h) == ("Canon", 6, 1024, 768)
    assert lat > 0 > lon
    # JPEG-style prefixed EXIF chunk also accepted
    pre = _webp(_vp8x(9, 9, flags=0x08)
                + _riff_chunk(b"EXIF", b"Exif\x00\x00" + tiff))
    assert MM._exif_parse(pre)[2] == 6

    stripped = MM._strip_one(fat)
    expect = _webp(_vp8x(99, 44, flags=0x00)
                   + _riff_chunk(b"VP8 ", b"\x00" * 20))
    assert stripped == expect                  # flags cleared, size
    assert MM._exif_parse(stripped)[2] is None  # rewritten, EXIF gone
    assert MM._sniff(stripped)[:3] == ("webp", 99, 44)
    assert MM._strip_one(stripped) == stripped  # idempotent
    # odd-size kept chunk keeps its pad byte
    odd = _webp(_riff_chunk(b"VP8L", bytes([0x2F, 0, 0, 0, 0]))
                + _riff_chunk(b"EXIF", tiff))
    # VP8L data is 5 bytes (odd) -> padded; strip keeps it intact
    assert MM._strip_one(odd) == _webp(
        _riff_chunk(b"VP8L", bytes([0x2F, 0, 0, 0, 0])))
    import pytest as _pytest
    with _pytest.raises(ValueError, match="lying chunk size"):
        MM._strip_one(_webp(b"EXIF" + (999).to_bytes(4, "little")
                            + b"x"))
    # 1-7 stray bytes after the last chunk are not metadata: refuse
    # rather than count them as 'removed'
    with _pytest.raises(ValueError, match="trailing garbage"):
        MM._strip_one(_webp(_vp8x(9, 9)) + b"junk")
    # final odd chunk WITHOUT its pad byte: strip mirrors the source
    # (removed stays 0, never negative)
    unpadded = _webp(_riff_chunk(b"VP8L", bytes([0x2F, 0, 0, 0, 0]))
                     )[:-1]
    fixed_size = (unpadded[:4]
                  + (len(unpadded) - 8).to_bytes(4, "little")
                  + unpadded[8:])
    assert MM._strip_one(fixed_size) == fixed_size
