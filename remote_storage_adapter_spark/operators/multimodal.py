"""Multimodal (image/audio/video) column plumbing (task brief E4).

Media payloads are opaque ``binary`` columns with a typed metadata
struct; decode / feature-extraction / resize / frame-sample run as
Arrow-batched ``mapInPandas`` stages so the JVM⇄Python boundary moves
whole columns, not rows.

Pixel/sample decode is REAL for the formats whose specs need nothing
beyond the stdlib: PNG, BMP, GIF, JPEG (baseline sequential AND
progressive Huffman, pixels) and WAV PCM (samples) via
:mod:`..functions.mediacodec` — pure ``zlib``/``struct``/numpy, no
media libraries. ``decode_stub=False``
in :func:`extract_features` / :func:`resize` runs genuine
decode→feature / decode→resample→re-encode; :func:`decode_media` is
the scan-speed quarantine operator (per-row ``err`` instead of a job
abort — at 100 TB a corrupt payload must not kill the stage). What
stays honestly refused with ``NotImplementedError``: video
codec-stream decode (MP4 box-walk METADATA is real) and the
arithmetic/lossless/hierarchical/12-bit JPEG modes — those need a
codec library the container doesn't ship.
``decode_stub=True`` keeps the deterministic digest-derived features
for oracle-checkable plumbing tests.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions import mediacodec as MC
from .skew import ensure_min_tasks


def _media_sel(media: DataFrame, id_col: str, payload_col: str,
               min_tasks: int | None) -> DataFrame:
    """Shared (id, payload) projection for the mapInPandas stages,
    with the optional parallelism floor for too-few-files landing
    layouts (``operators.skew.ensure_min_tasks``; ``None`` keeps the
    stages partition-preserving)."""
    return ensure_min_tasks(
        media.select(F.col(id_col).alias(id_col), F.col(payload_col)),
        min_tasks, payload_col=payload_col)

#: typed metadata carried next to every media payload.
MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("media_type", T.StringType(), False),  # image|audio|video
        T.StructField("format", T.StringType(), True),       # png|wav|mp4|...
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
    ]
)

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), False),
        T.StructField("meta", MEDIA_META_SCHEMA, False),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("byte_len", T.LongType(), False),
        T.StructField("sha256", T.StringType(), False),
        T.StructField("feature", T.ArrayType(T.FloatType()), False),
    ]
)


def media_from_documents(docs: DataFrame) -> DataFrame:
    """Synthesize a media table from ``documents`` (the container has
    no real media): payload = UTF-8 bytes of the text, meta = image/raw.

    This keeps every downstream stage (binary column, partitioning,
    mapInPandas batches) real while the data is synthetic.
    """
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        F.struct(
            F.lit("image").alias("media_type"),
            F.lit("raw").alias("format"),
            F.col("n_chars").cast("int").alias("width"),
            F.lit(1).alias("height"),
            F.lit(None).cast("long").alias("duration_ms"),
        ).alias("meta"),
    )


#: output of :func:`sniff_media_meta` — real parsed container metadata.
SNIFF_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("format", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("sample_rate", T.IntegerType(), True),
        T.StructField("channels", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
    ]
)


_PNG_SIG = MC._PNG_SIG  # one signature constant, never re-typed


def _jpeg_segments(p: bytes):
    """Yield (marker, seg_start, seg_end) for every JPEG marker
    segment after SOI — ``p[seg_start:seg_end]`` is the whole
    segment including its 2 marker bytes (standalone markers span
    exactly 2). The ONE segment walk shared by :func:`_sniff`,
    :func:`_exif_parse` and :func:`_strip_one` (three hand-rolled
    copies drifted in round 8 — the fill-byte fix below had to land
    once, not three times). Spec-legal 0xFF fill bytes before a
    marker (T.81 B.1.1.2) are skipped. Stops after yielding SOS/EOI
    (entropy data follows SOS; the caller copies/ignores it).
    Raises ValueError on structurally lying bytes — strict callers
    propagate (quarantine), triage callers catch and keep what was
    walked so far."""
    i = 2
    while i + 2 <= len(p) and p[i] == 0xFF:
        m = p[i + 1]
        if m == 0xFF:           # fill byte before the real marker
            i += 1
            continue
        if m == 0xDA or m == 0xD9:
            yield m, i, i + 2
            return
        if m == 0x01 or 0xD0 <= m <= 0xD7:
            yield m, i, i + 2
            i += 2
            continue
        if i + 4 > len(p):
            raise ValueError("JPEG: truncated segment header")
        seglen = int.from_bytes(p[i + 2:i + 4], "big")
        if seglen < 2 or i + 2 + seglen > len(p):
            raise ValueError("JPEG: lying segment length")
        yield m, i, i + 2 + seglen
        i += 2 + seglen
    raise ValueError("JPEG: truncated before SOS/EOI")


def _webp_chunks(p: bytes):
    """Yield (fourcc, chunk_start, chunk_end) for the RIFF chunks of
    a WebP container — ``p[chunk_start:chunk_end]`` is fourcc + LE
    size + data (the odd-size pad byte is NOT included; callers that
    splice must re-pad). Raises ValueError on lying sizes — strict
    callers propagate, triage callers catch."""
    i = 12
    while i + 8 <= len(p):
        clen = int.from_bytes(p[i + 4:i + 8], "little")
        end = i + 8 + clen
        if clen > len(p) or end > len(p):
            raise ValueError("WebP: lying chunk size")
        if (clen & 1) and end < len(p) and p[end] != 0:
            # RIFF pads are 0x00 by definition — a nonzero byte here
            # means the walk is desynced or the file is corrupt
            raise ValueError("WebP: nonzero pad byte")
        yield p[i:i + 4], i, end
        i = end + (clen & 1)


def _sniff_webp(p: bytes):
    """WebP dimensions from the container headers (public spec:
    RFC 9649 / the VP8/VP8L bitstream docs): VP8X extended header
    carries the 24-bit canvas size; otherwise the still-image chunk
    header — VP8 lossy (14-bit fields after the 9D012A start code)
    or VP8L lossless (14+14 bits after the 0x2F signature). The
    coded FRAME data stays honestly undecoded (VP8 entropy decode
    needs a codec library) — this is metadata triage."""
    w = h = None
    try:
        for cc, s, e in _webp_chunks(p):
            d = p[s + 8:e]
            if cc == b"VP8X" and len(d) >= 10:
                w = int.from_bytes(d[4:7], "little") + 1
                h = int.from_bytes(d[7:10], "little") + 1
                break
            if cc == b"VP8 " and len(d) >= 10 \
                    and d[3:6] == b"\x9d\x01\x2a":
                w = int.from_bytes(d[6:8], "little") & 0x3FFF
                h = int.from_bytes(d[8:10], "little") & 0x3FFF
                break
            if cc == b"VP8L" and len(d) >= 5 and d[0] == 0x2F:
                bits = int.from_bytes(d[1:5], "little")
                w = (bits & 0x3FFF) + 1
                h = ((bits >> 14) & 0x3FFF) + 1
                break
    except ValueError:
        pass
    return ("webp", w, h, None, None, None)


def _mp4_boxes(p: bytes, start: int, end: int):
    """Yield (type, payload_start, payload_end) for the ISO-BMFF boxes
    in p[start:end]. Handles 64-bit largesize (size==1) and
    to-end-of-file (size==0); a lying size stops the walk instead of
    scanning garbage — quarantine-friendly partial results."""
    i = start
    while i + 8 <= end:
        size = int.from_bytes(p[i:i + 4], "big")
        btype = p[i + 4:i + 8]
        hdr = 8
        if size == 1:
            if i + 16 > end:
                return
            size = int.from_bytes(p[i + 8:i + 16], "big")
            hdr = 16
        elif size == 0:
            size = end - i
        if size < hdr or i + size > end:
            return
        yield btype, i + hdr, i + size
        i += size


def _sniff_mp4(p: bytes):
    """MP4/ISO-BMFF metadata via a real box walk (ISO 14496-12):
    ``moov/mvhd`` timescale+duration → duration_ms, first
    ``moov/trak/tkhd`` with nonzero 16.16 fixed-point geometry →
    width/height (the video track; audio tracks carry 0×0). Pixel/
    frame DECODE of the contained H.264/AAC streams genuinely needs
    a codec library and stays a refusal elsewhere — this is the
    honest metadata half of video support."""
    w = h = dur = None
    for btype, s, e in _mp4_boxes(p, 0, len(p)):
        if btype != b"moov":
            continue
        for bt2, s2, e2 in _mp4_boxes(p, s, e):
            if bt2 == b"mvhd" and e2 - s2 >= 4:
                ver = p[s2]
                if ver == 1 and e2 - s2 >= 32:
                    ts = int.from_bytes(p[s2 + 20:s2 + 24], "big")
                    d = int.from_bytes(p[s2 + 24:s2 + 32], "big")
                elif ver == 0 and e2 - s2 >= 20:
                    ts = int.from_bytes(p[s2 + 12:s2 + 16], "big")
                    d = int.from_bytes(p[s2 + 16:s2 + 20], "big")
                else:
                    continue
                if ts:
                    dur = d * 1000 // ts
            elif bt2 == b"trak" and w is None:
                for bt3, s3, e3 in _mp4_boxes(p, s2, e2):
                    if bt3 != b"tkhd" or e3 - s3 < 4:
                        continue
                    off = 88 if p[s3] == 1 else 76
                    if e3 - s3 >= off + 8:
                        tw = int.from_bytes(
                            p[s3 + off:s3 + off + 4], "big") >> 16
                        th = int.from_bytes(
                            p[s3 + off + 4:s3 + off + 8], "big") >> 16
                        if tw and th:
                            w, h = tw, th
    return ("mp4", w, h, None, None, dur)


def _sniff(p: bytes):
    """REAL media-container metadata decode from raw bytes — pure
    byte parsing of the public file-format specs, no media libraries:

    - PNG: 8-byte signature, IHDR width/height (big-endian u32).
    - GIF87a/89a: logical screen size (little-endian u16).
    - BMP: BITMAPINFOHEADER width/height (little-endian i32).
    - JPEG: segment walk to the first SOF0-SOF3 frame header.
    - WAV (RIFF): fmt chunk channels/sample-rate; duration from the
      data chunk size over the byte rate.
    - MP4/ISO-BMFF: box walk to moov/mvhd (duration) and the video
      trak/tkhd (16.16 fixed-point geometry) — see :func:`_sniff_mp4`.
    - WebP (RIFF): VP8X canvas size, or the VP8/VP8L still-image
      header fields — see :func:`_sniff_webp`.

    Returns (format, width, height, sample_rate, channels,
    duration_ms) with None for unknown/unparsable — the scan-speed
    triage step before the full pixel/sample decode
    (:func:`decode_media`).
    """
    if p[:8] == _PNG_SIG and len(p) >= 24 \
            and p[12:16] == b"IHDR":
        return ("png", int.from_bytes(p[16:20], "big"),
                int.from_bytes(p[20:24], "big"), None, None, None)
    if p[:6] in (b"GIF87a", b"GIF89a") and len(p) >= 10:
        return ("gif", int.from_bytes(p[6:8], "little"),
                int.from_bytes(p[8:10], "little"), None, None, None)
    if p[:2] == b"BM" and len(p) >= 26:
        return ("bmp",
                int.from_bytes(p[18:22], "little", signed=True),
                abs(int.from_bytes(p[22:26], "little", signed=True)),
                None, None, None)
    if p[:2] == b"\xff\xd8":
        try:
            for m, s, e in _jpeg_segments(p):
                if m in (0xC0, 0xC1, 0xC2, 0xC3) and e - s >= 9:
                    return ("jpeg",
                            int.from_bytes(p[s + 7:s + 9], "big"),
                            int.from_bytes(p[s + 5:s + 7], "big"),
                            None, None, None)
                if m == 0xDA:
                    break
        except ValueError:  # triage: unparsable dims, not a job abort
            pass
        return ("jpeg", None, None, None, None, None)
    if len(p) >= 12 and p[4:8] == b"ftyp":
        return _sniff_mp4(p)
    if p[:4] == b"RIFF" and p[8:12] == b"WEBP":
        return _sniff_webp(p)
    if p[:4] == b"RIFF" and p[8:12] == b"WAVE":
        i, sr, ch, byte_rate, data_len = 12, None, None, None, None
        while i + 8 <= len(p):
            cid = p[i:i + 4]
            clen = int.from_bytes(p[i + 4:i + 8], "little")
            if cid == b"fmt " and i + 20 <= len(p):
                ch = int.from_bytes(p[i + 10:i + 12], "little")
                sr = int.from_bytes(p[i + 12:i + 16], "little")
                byte_rate = int.from_bytes(p[i + 16:i + 20], "little")
            elif cid == b"data":
                data_len = clen
            i += 8 + clen + (clen % 2)  # chunks are word-aligned
        dur = (data_len * 1000 // byte_rate
               if data_len is not None and byte_rate else None)
        return ("wav", None, None, sr, ch, dur)
    return (None, None, None, None, None, None)


def sniff_media_meta(media: DataFrame, *, id_col: str = "media_id",
                     payload_col: str = "payload",
                     min_tasks: int | None = None) -> DataFrame:
    """Parse real container metadata out of every binary payload via
    Arrow-batched ``mapInPandas`` — this decode path is NOT stubbed
    (header parsing needs no media libraries), so corrupt or
    mislabeled media can be quarantined at scan speed before any
    expensive pixel decode. Partition-preserving, no shuffle."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ["format", "width", "height", "sample_rate", "channels",
                "duration_ms"]
        for pdf in batches:
            parsed = pd.DataFrame(
                [_sniff(bytes(p)) for p in pdf[payload_col]],
                columns=cols,
            )
            parsed.insert(0, "media_id", pdf[id_col].to_numpy())
            yield parsed

    return _media_sel(media, id_col, payload_col, min_tasks).mapInPandas(
        run, schema=SNIFF_SCHEMA)


def _is_wav(p: bytes) -> bool:
    return p[:4] == b"RIFF" and p[8:12] == b"WAVE"


# ------------------------------------------------------- EXIF metadata
#
# Real TIFF/EXIF IFD walk (public specs: TIFF 6.0 + EXIF 2.3) — the
# metadata triage a 100 TB image-curation pass needs BEFORE any pixel
# decode: camera provenance, orientation, capture time, and the GPS
# coordinates that are the canonical multimodal PII risk. Reference
# parity: the reference engine has no media surface at all
# (main.go handles metric samples); this extends the task brief's
# multimodal component the same way the codecs do.

#: output of :func:`exif_metadata` — triage semantics like
#: :data:`SNIFF_SCHEMA`: unparsable/absent EXIF yields all-NULL
#: fields, never a job abort.
EXIF_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("make", T.StringType(), True),
        T.StructField("model", T.StringType(), True),
        T.StructField("orientation", T.IntegerType(), True),
        T.StructField("datetime", T.StringType(), True),
        T.StructField("exif_width", T.IntegerType(), True),
        T.StructField("exif_height", T.IntegerType(), True),
        T.StructField("gps_lat", T.DoubleType(), True),
        T.StructField("gps_lon", T.DoubleType(), True),
    ]
)

#: TIFF 6.0 field-type byte widths (type 6/8/11/12 never carry the
#: tags we read; unknown types are skipped, not errors).
_TIFF_TYPE_SIZE = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 7: 1, 9: 4, 10: 8}


def _tiff_entries(t: bytes, ifd_off: int, le: bool,
                  max_entries: int = 512):
    """Yield (tag, type, value_bytes) for one bounds-checked IFD.
    Hostile counts/offsets skip the entry or stop the walk — triage
    callers never raise. ``max_entries`` bounds a lying entry count;
    real EXIF IFDs hold a few dozen entries."""
    order = "little" if le else "big"
    if ifd_off < 0 or ifd_off + 2 > len(t):
        return
    n = min(int.from_bytes(t[ifd_off:ifd_off + 2], order), max_entries)
    for k in range(n):
        e = ifd_off + 2 + 12 * k
        if e + 12 > len(t):
            return
        tag = int.from_bytes(t[e:e + 2], order)
        typ = int.from_bytes(t[e + 2:e + 4], order)
        cnt = int.from_bytes(t[e + 4:e + 8], order)
        size = _TIFF_TYPE_SIZE.get(typ, 0) * cnt
        if size == 0 or size > 1 << 16:  # bounds a lying count
            continue
        if size <= 4:  # inline, left-justified in the value field
            val = t[e + 8:e + 8 + size]
        else:
            off = int.from_bytes(t[e + 8:e + 12], order)
            if off + size > len(t):
                continue
            val = t[off:off + size]
        yield tag, typ, val


def _tiff_uint(val: bytes, typ: int, le: bool):
    """First SHORT/LONG of a value slice (orientation, pixel dims)."""
    order = "little" if le else "big"
    w = 2 if typ == 3 else 4
    return int.from_bytes(val[:w], order) if len(val) >= w else None


def _tiff_ascii(val: bytes):
    s = val.split(b"\x00", 1)[0].decode("latin-1", "replace").strip()
    return s or None


def _gps_degrees(val: bytes, ref, neg_ref: str, le: bool):
    """GPSLatitude/GPSLongitude: 3 RATIONALs (deg, min, sec) + the
    hemisphere ref → signed decimal degrees. The float expression is
    kept in this exact order (d + m/60 + s/3600, each term a plain
    IEEE division) so a SQL oracle replays it bit-identically."""
    if len(val) < 24 or ref is None:
        return None
    order = "little" if le else "big"
    parts = []
    for i in range(3):
        num = int.from_bytes(val[8 * i:8 * i + 4], order)
        den = int.from_bytes(val[8 * i + 4:8 * i + 8], order)
        if den == 0:
            return None
        parts.append(num / den)
    deg = parts[0] + parts[1] / 60.0 + parts[2] / 3600.0
    return -deg if ref.startswith(neg_ref) else deg


def _exif_parse(p: bytes):
    """EXIF fields via the real TIFF IFD walk: IFD0
    (Make/Model/Orientation/DateTime + the ExifIFD/GPSIFD pointers),
    ExifIFD (DateTimeOriginal, PixelX/YDimension), GPSIFD (lat/lon
    rationals + hemisphere refs). The TIFF blob comes from a JPEG
    APP1(Exif) segment or a PNG ``eXIf`` chunk — the two containers
    that carry EXIF. Returns an 8-tuple of Nones when there is no
    parsable EXIF — triage, not quarantine."""
    none = (None,) * 8
    tiff = None
    if p[:2] == b"\xff\xd8":
        try:
            for m, s, e in _jpeg_segments(p):
                if m == 0xDA or m == 0xD9:
                    break
                # XMP also rides APP1 — match on the Exif signature,
                # not the marker alone
                if m == 0xE1 and p[s + 4:s + 10] == b"Exif\x00\x00":
                    tiff = p[s + 10:e]
                    break
        except ValueError:  # triage: no EXIF found, not a job abort
            pass
    elif p[:8] == _PNG_SIG:
        i = 8
        while i + 8 <= len(p):
            clen = int.from_bytes(p[i:i + 4], "big")
            if clen > len(p) or i + 12 + clen > len(p):
                break
            if p[i + 4:i + 8] == b"eXIf":  # chunk data IS the TIFF
                tiff = p[i + 8:i + 8 + clen]
                break
            i += 12 + clen
    elif p[:4] == b"RIFF" and p[8:12] == b"WEBP":
        try:
            for cc, s, e in _webp_chunks(p):
                if cc == b"EXIF":
                    tiff = p[s + 8:e]
                    # the spec says raw TIFF, but some writers keep
                    # the JPEG-style prefix — accept both
                    if tiff[:6] == b"Exif\x00\x00":
                        tiff = tiff[6:]
                    break
        except ValueError:  # triage
            pass
    else:
        return none
    if tiff is None or len(tiff) < 8:
        return none
    if tiff[:2] == b"II":
        le = True
    elif tiff[:2] == b"MM":
        le = False
    else:
        return none
    order = "little" if le else "big"
    if int.from_bytes(tiff[2:4], order) != 42:
        return none
    make = model = dt = dt0 = None
    orient = w = h = exif_ptr = gps_ptr = None
    lat_ref = lon_ref = lat_val = lon_val = None
    ifd0 = int.from_bytes(tiff[4:8], order)
    for tag, typ, val in _tiff_entries(tiff, ifd0, le):
        if tag == 0x010F:
            make = _tiff_ascii(val)
        elif tag == 0x0110:
            model = _tiff_ascii(val)
        elif tag == 0x0112 and typ == 3:
            orient = _tiff_uint(val, typ, le)
        elif tag == 0x0132:
            dt = _tiff_ascii(val)
        elif tag == 0x8769 and typ == 4:
            exif_ptr = _tiff_uint(val, typ, le)
        elif tag == 0x8825 and typ == 4:
            gps_ptr = _tiff_uint(val, typ, le)
    if exif_ptr is not None:
        for tag, typ, val in _tiff_entries(tiff, exif_ptr, le):
            if tag == 0x9003:
                dt0 = _tiff_ascii(val)
            elif tag == 0xA002 and typ in (3, 4):
                w = _tiff_uint(val, typ, le)
            elif tag == 0xA003 and typ in (3, 4):
                h = _tiff_uint(val, typ, le)
    if gps_ptr is not None:
        for tag, typ, val in _tiff_entries(tiff, gps_ptr, le):
            if tag == 1:
                lat_ref = _tiff_ascii(val)
            elif tag == 2 and typ == 5:
                lat_val = val
            elif tag == 3:
                lon_ref = _tiff_ascii(val)
            elif tag == 4 and typ == 5:
                lon_val = val
    lat = (_gps_degrees(lat_val, lat_ref, "S", le)
           if lat_val is not None else None)
    lon = (_gps_degrees(lon_val, lon_ref, "W", le)
           if lon_val is not None else None)
    return (make, model, orient, dt0 or dt, w, h, lat, lon)


def exif_metadata(media: DataFrame, *, id_col: str = "media_id",
                  payload_col: str = "payload",
                  min_tasks: int | None = None) -> DataFrame:
    """Parse EXIF camera/orientation/capture-time/GPS metadata out of
    every JPEG (APP1), PNG (``eXIf`` chunk) or WebP (``EXIF`` RIFF
    chunk) payload via the REAL TIFF IFD walk — the provenance
    and PII-triage scan of an image-curation pipeline (GPS
    coordinates are the canonical stripped-before-training field).
    Arrow-batched ``mapInPandas``, partition-preserving, no shuffle;
    non-JPEG / EXIF-free / hostile payloads yield all-NULL fields
    (triage, like :func:`sniff_media_meta`)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ["make", "model", "orientation", "datetime",
                "exif_width", "exif_height", "gps_lat", "gps_lon"]
        for pdf in batches:
            parsed = pd.DataFrame(
                [_exif_parse(bytes(p)) if p is not None else (None,) * 8
                 for p in pdf[payload_col]],
                columns=cols)
            parsed.insert(0, "media_id", pdf[id_col].to_numpy())
            yield parsed

    return _media_sel(media, id_col, payload_col, min_tasks).mapInPandas(
        run, schema=EXIF_SCHEMA)


#: JPEG metadata segments removed by :func:`strip_metadata`: APP1
#: (Exif + XMP), APP13 (IPTC/Photoshop), COM. Pixel-affecting
#: segments (DQT/DHT/SOF/SOS/...) are never touched.
_JPEG_META_MARKERS = frozenset({0xE1, 0xED, 0xFE})
#: PNG ancillary metadata chunks removed: textual metadata, raw EXIF,
#: last-modified time. Critical chunks and rendering-relevant
#: ancillaries (PLTE/tRNS/gAMA/...) are kept.
_PNG_META_CHUNKS = frozenset({b"tEXt", b"zTXt", b"iTXt", b"eXIf",
                              b"tIME"})


def _strip_one(p: bytes) -> bytes:
    """Metadata-stripped copy of one payload: JPEG drops the
    _JPEG_META_MARKERS segments (entropy data from SOS on is copied
    verbatim — pixels byte-identical), PNG drops the
    _PNG_META_CHUNKS chunks, WebP drops the EXIF/'XMP ' RIFF chunks
    (clearing the VP8X advertised-metadata flag bits and rewriting
    the RIFF size; coded frame bytes untouched), anything else
    passes through unchanged. Raises ValueError on structurally
    lying bytes — quarantine contract."""
    if p[:2] == b"\xff\xd8":
        out = bytearray(b"\xff\xd8")
        for m, s, e in _jpeg_segments(p):
            if m == 0xDA:           # scan start: verbatim to the end
                out += p[s:]
                return bytes(out)
            if m == 0xD9:
                out += p[s:e]
                return bytes(out)
            if m not in _JPEG_META_MARKERS:
                out += p[s:e]
        raise ValueError("JPEG: truncated before SOS/EOI")
    if p[:4] == b"RIFF" and p[8:12] == b"WEBP":
        body = bytearray()
        pos = 12
        for cc, s, e in _webp_chunks(p):  # ValueError propagates
            odd = (e - s - 8) & 1
            # a lenient writer may omit the FINAL chunk's pad byte;
            # mirror the source so 'removed' only counts metadata
            # (the walker already refused any nonzero pad byte)
            padded = odd and e < len(p)
            pos = e + (1 if padded else 0)
            if cc in (b"EXIF", b"XMP "):
                continue
            chunk = bytearray(p[s:e])
            if cc == b"VP8X" and len(chunk) >= 9:
                # clear the advertised EXIF(0x08)/XMP(0x04) flag bits
                # so the container stays self-consistent
                chunk[8] &= 0xF3
            body += chunk
            if padded:
                body += b"\x00"
        if pos != len(p):
            # 1-7 stray bytes after the last chunk are not metadata —
            # dropping them silently would inflate 'removed'
            raise ValueError("WebP: trailing garbage")
        return (b"RIFF" + (len(body) + 4).to_bytes(4, "little")
                + b"WEBP" + bytes(body))
    if p[:8] == _PNG_SIG:
        out = bytearray(_PNG_SIG)
        i = 8
        while i + 8 <= len(p):
            clen = int.from_bytes(p[i:i + 4], "big")
            ctype = p[i + 4:i + 8]
            end = i + 12 + clen
            if clen > len(p) or end > len(p):
                raise ValueError("PNG: lying chunk length")
            if ctype not in _PNG_META_CHUNKS:
                out += p[i:end]
            i = end
            if ctype == b"IEND":
                return bytes(out)
        raise ValueError("PNG: missing IEND")
    return bytes(p)


STRIP_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("removed", T.LongType(), True),
        T.StructField("err", T.StringType(), True),
    ]
)


def strip_metadata(media: DataFrame, *, id_col: str = "media_id",
                   payload_col: str = "payload",
                   min_tasks: int | None = None) -> DataFrame:
    """PII/metadata scrub for image corpora: re-emit every payload
    with its metadata segments spliced out — EXIF (GPS, camera
    serial), XMP, IPTC, comments for JPEG; textual/eXIf/tIME chunks
    for PNG — WITHOUT re-encoding (pixel bytes are copied verbatim,
    so the scrub is lossless and cheap: a byte splice, not a decode).
    Returns (media_id, payload, removed, err); structurally lying
    bytes land in per-row ``err`` quarantine with a NULL payload
    (same contract as :func:`decode_media` — a hostile file must not
    abort a 100 TB scrub). Partition-preserving, no shuffle."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for p in pdf[payload_col]:
                try:
                    if p is None:
                        raise ValueError("NULL payload")
                    b = bytes(p)
                    s = _strip_one(b)
                    rows.append((s, len(b) - len(s), None))
                except Exception as e:  # noqa: BLE001 — quarantine is
                    # the contract (same argument as _decode_one)
                    rows.append((None, None, f"{type(e).__name__}: {e}"))
            out = pd.DataFrame(rows, columns=["payload", "removed",
                                              "err"])
            out.insert(0, "media_id", pdf[id_col].to_numpy())
            yield out

    return _media_sel(media, id_col, payload_col, min_tasks).mapInPandas(
        run, schema=STRIP_SCHEMA)


def _real_feature(payload: bytes, dim: int) -> list:
    """REAL decoded-content feature: an L1-normalized ``dim``-bucket
    histogram — of pixel luminance (mean over channels, [0, 256)) for
    PNG/BMP/GIF, of sample amplitude ([-1, 1]) for WAV PCM. Rounded to
    6 decimals so the float32 feature column round-trips exactly
    (same margin argument as :func:`_fake_feature`).

    Raises on undecodable payloads — callers quarantine with
    :func:`decode_media` / :func:`sniff_media_meta` first.
    """
    if _is_wav(payload):
        samples, _sr = MC.wav_decode(payload)
        hist, _ = np.histogram(samples.reshape(-1), bins=dim,
                               range=(-1.0, 1.0))
    else:
        px = MC.decode_pixels(payload)
        lum = px.astype(np.float32).mean(axis=2).reshape(-1)
        hist, _ = np.histogram(lum, bins=dim, range=(0.0, 256.0))
    total = max(int(hist.sum()), 1)
    return [round(float(c) / total, 6) for c in hist]


def _fake_feature(payload: bytes, dim: int) -> list:
    """Deterministic pseudo-feature from the payload digest.

    Component i = big-endian uint16 of sha256-digest bytes [2i, 2i+2)
    (cycled), scaled to [0, 1] and rounded to 6 decimals — so any
    engine with sha256 recomputes a component exactly: a 6-decimal
    multiple survives the float32 feature column round-trip (float32
    error ≈6e-8 ≪ the 5e-7 re-round margin), keeping the stub
    oracle-checkable while the column type stays the realistic
    array<float>.
    """
    digest = hashlib.sha256(payload).digest()
    raw = (digest * ((dim * 2) // len(digest) + 1))[: dim * 2]
    return [
        round(int.from_bytes(raw[2 * i : 2 * i + 2], "big") / 65535.0, 6)
        for i in range(dim)
    ]


def extract_features(media: DataFrame, *, dim: int = 16,
                     decode_stub: bool = True) -> DataFrame:
    """payload → fixed-dim feature vector via Arrow-batched mapInPandas.

    Partition-preserving before the explicit id-repartition; each
    Python worker sees whole Arrow batches. ``decode_stub=False`` runs
    the REAL decoder (:func:`_real_feature`: PNG/BMP/GIF/JPEG
    pixel luminance or WAV amplitude histogram) and raises on payloads
    no stdlib codec covers (video/unknown) — quarantine those with
    :func:`decode_media` first. ``decode_stub=True`` keeps the
    deterministic digest feature for format-free plumbing tests.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        mk = _fake_feature if decode_stub else _real_feature
        for pdf in batches:
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "byte_len": payloads.map(len).astype("int64"),
                    "sha256": payloads.map(
                        lambda p: hashlib.sha256(p).hexdigest()
                    ),
                    "feature": payloads.map(
                        lambda p: mk(bytes(p), dim)
                    ),
                }
            )

    parallelism = media.sparkSession.sparkContext.defaultParallelism
    return (
        media.select("media_id", "payload")
        .repartition(parallelism, "media_id")
        .mapInPandas(run, schema=FEATURE_SCHEMA)
    )


def _resize_real(p: bytes, width: int, height: int) -> bytes:
    """REAL resize: stdlib decode (PNG/BMP/GIF/JPEG) → nearest-neighbor
    resample (floor(i·src/dst) index mapping, the standard NN kernel)
    → PNG re-encode. Deterministic bytes for fixed input."""
    px = MC.decode_pixels(p)
    src_h, src_w = px.shape[:2]
    return MC.png_encode(px[_nn_index(src_h, height)]
                         [:, _nn_index(src_w, width)])


def resize(media: DataFrame, *, width: int, height: int,
           decode_stub: bool = True) -> DataFrame:
    """Image resize stage via Arrow-batched mapInPandas.

    ``decode_stub=False`` is REAL: :func:`_resize_real` decodes
    PNG/BMP/GIF/JPEG pixels, nearest-neighbor-resamples, and
    re-encodes as PNG (``meta.format`` becomes ``'png'``); it raises
    on payloads the stdlib codecs don't cover — quarantine with
    :func:`decode_media` first. Stub: deterministic payload reshaping (truncate/cycle to the
    target pixel budget) so schema, meta update, and batch shape stay
    testable on format-free payloads. Partition-preserving — no
    shuffle.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        target = width * height
        for pdf in batches:

            def _resize_stub(p: bytes) -> bytes:
                if not p:
                    return bytes(target)
                reps = target // len(p) + 1
                return (p * reps)[:target]

            out = pdf.copy()
            if decode_stub:
                out["payload"] = pdf["payload"].map(_resize_stub)
            else:
                out["payload"] = pdf["payload"].map(
                    lambda p: _resize_real(bytes(p), width, height))
            meta = pd.DataFrame(list(pdf["meta"]))
            meta["width"] = width
            meta["height"] = height
            if not decode_stub:
                meta["format"] = "png"
            out["meta"] = meta.to_dict("records")
            yield out

    return media.mapInPandas(run, schema=MEDIA_SCHEMA)


#: output of :func:`decode_media` — real decoded-content statistics.
DECODE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), True),     # image|audio
        T.StructField("height", T.IntegerType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("channels", T.IntegerType(), True),
        T.StructField("px_mean", T.DoubleType(), True),
        T.StructField("px_std", T.DoubleType(), True),
        T.StructField("sample_rate", T.IntegerType(), True),
        T.StructField("n_samples", T.LongType(), True),
        T.StructField("rms", T.DoubleType(), True),
        T.StructField("err", T.StringType(), True),
    ]
)


def _decode_one(p: bytes):
    """One payload → DECODE_SCHEMA tuple (sans media_id). Errors land
    in ``err`` — a corrupt payload must quarantine, not abort the
    stage, at pipeline scale."""
    try:
        if _is_wav(p):
            samples, sr = MC.wav_decode(p)
            flat = samples.reshape(-1).astype(np.float64)
            rms = float(np.sqrt(np.mean(flat * flat))) if flat.size else 0.0
            return ("audio", None, None, int(samples.shape[1]), None, None,
                    int(sr), int(samples.shape[0]), round(rms, 6), None)
        px = MC.decode_pixels(p)
        h, w, ch = px.shape
        flat = px.astype(np.float64).reshape(-1)
        return ("image", int(h), int(w), int(ch),
                round(float(flat.mean()), 6) if flat.size else None,
                round(float(flat.std()), 6) if flat.size else None,
                None, None, None, None)
    except Exception as e:  # noqa: BLE001 — quarantine is the contract:
        # hostile/truncated bytes raise IndexError/struct.error/
        # MemoryError/… from arbitrary parse depths, and ANY of them
        # must land in `err`, not abort a 100 TB stage.
        return (None, None, None, None, None, None, None, None, None,
                f"{type(e).__name__}: {e}")


def decode_media(media: DataFrame, *, id_col: str = "media_id",
                 payload_col: str = "payload",
                 min_tasks: int | None = None) -> DataFrame:
    """REAL pixel/sample decode of every payload via Arrow-batched
    ``mapInPandas`` — stdlib codecs only (PNG/BMP/GIF/JPEG
    pixels, WAV PCM samples; see :mod:`..functions.mediacodec`).
    Per-row ``err`` quarantines undecodable payloads (video,
    arithmetic/lossless JPEG, corrupt bytes) instead of failing the
    job. Partition-preserving, no shuffle; decoded arrays never leave
    the worker — only bounded per-payload statistics cross back to
    the JVM."""

    cols = ["kind", "height", "width", "channels", "px_mean", "px_std",
            "sample_rate", "n_samples", "rms", "err"]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            parsed = pd.DataFrame(
                [_decode_one(bytes(p)) for p in pdf[payload_col]],
                columns=cols,
            )
            parsed.insert(0, "media_id", pdf[id_col].to_numpy())
            yield parsed

    return _media_sel(media, id_col, payload_col, min_tasks).mapInPandas(
        run, schema=DECODE_SCHEMA)


# --------------------------------------------------- audio analysis

#: output of :func:`audio_features` — spectral/temporal descriptors.
AUDIO_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("sr", T.IntegerType(), True),
        T.StructField("n_samples", T.LongType(), True),
        T.StructField("duration_ms", T.LongType(), True),
        T.StructField("rms", T.DoubleType(), True),
        T.StructField("zcr", T.DoubleType(), True),
        T.StructField("centroid_hz", T.DoubleType(), True),
        T.StructField("rolloff_hz", T.DoubleType(), True),
        T.StructField("err", T.StringType(), True),
    ]
)


def _audio_features_one(p: bytes):
    """One WAV payload → (sr, n, duration_ms, rms, zcr, centroid,
    rolloff). Mono mix (channel mean), whole-clip rfft power spectrum:

    - ``rms``: root-mean-square amplitude.
    - ``zcr``: fraction of adjacent sample pairs whose sign flips,
      with sign(0) counted positive (a strict product<0 rule misses
      tones whose crossings land exactly on zero samples, e.g. 1 kHz
      at 8 kHz) — 1.0 for a Nyquist square wave, ≈2·f/sr for a tone
      at f; None when n < 2.
    - ``centroid_hz``: power-weighted mean frequency Σf·P/ΣP.
    - ``rolloff_hz``: smallest bin frequency whose cumulative power
      reaches 85% of the total.
    - centroid/rolloff are None for silence (zero total power).

    All doubles round to 9 dp (exact-dyadic planted values have ≤7
    decimals, so 9 dp never hits a cross-engine rounding tie)."""
    samples, sr = MC.wav_decode(p)
    x = samples.astype(np.float64).mean(axis=1)
    n = int(x.size)
    dur_ms = n * 1000 // sr if sr else None
    rms = round(float(np.sqrt(np.mean(x * x))), 9) if n else None
    neg = x < 0
    zcr = (round(float(np.mean(neg[1:] != neg[:-1])), 9)
           if n >= 2 else None)
    centroid = rolloff = None
    if n:
        power = np.abs(np.fft.rfft(x)) ** 2
        total = float(power.sum())
        if total > 0.0:
            freqs = np.fft.rfftfreq(n, d=1.0 / sr)
            centroid = round(float((freqs * power).sum() / total), 9)
            cum = np.cumsum(power)
            rolloff = round(
                float(freqs[int(np.searchsorted(
                    cum, 0.85 * total))]), 9)
    return (int(sr), n, dur_ms, rms, zcr, centroid, rolloff)


def audio_features(media: DataFrame, *, id_col: str = "media_id",
                   payload_col: str = "payload",
                   min_tasks: int | None = None) -> DataFrame:
    """Spectral/temporal audio descriptors per WAV payload
    (:data:`AUDIO_FEATURE_SCHEMA`) — the audio twin of the image
    decode stats: REAL PCM decode (:func:`..functions.mediacodec
    .wav_decode`) then numpy rfft, all worker-side. Non-WAV or
    corrupt payloads quarantine per-row in ``err``.

    Scale shape: Arrow-batched ``mapInPandas``, partition-preserving,
    no shuffle; samples and spectra never leave the worker — seven
    bounded descriptors per clip cross back to the JVM."""
    cols = ["sr", "n_samples", "duration_ms", "rms", "zcr",
            "centroid_hz", "rolloff_hz", "err"]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for p in pdf[payload_col]:
                try:
                    rows.append(_audio_features_one(bytes(p)) + (None,))
                except Exception as e:  # noqa: BLE001 — quarantine is
                    # the contract (same argument as _decode_one)
                    rows.append((None,) * 7
                                + (f"{type(e).__name__}: {e}",))
            out = pd.DataFrame(rows, columns=cols)
            out.insert(0, "media_id", pdf[id_col].to_numpy())
            yield out

    return _media_sel(media, id_col, payload_col, min_tasks).mapInPandas(
        run, schema=AUDIO_FEATURE_SCHEMA)


# ------------------------------------------------- perceptual hashes

#: output of :func:`image_hash` — one 64-bit fingerprint per image.
IMAGE_HASH_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("fp", T.LongType(), True),
        T.StructField("err", T.StringType(), True),
    ]
)


def _nn_index(src: int, dst: int) -> np.ndarray:
    """Nearest-neighbor source indices (the floor convention shared
    with :func:`_resize_real` and the planted-PNG oracles:
    ``src_i = floor(i * src / dst)``)."""
    return (np.arange(dst) * src) // dst


def _gray_f64(px: np.ndarray) -> np.ndarray:
    """(h, w, c) uint8 → float64 luminance — channel mean, the same
    convention as :func:`_real_feature`'s histogram."""
    return px.astype(np.float64).mean(axis=2)


def _pack64(bits: np.ndarray) -> int:
    """64 bools (element p → bit p) → two's-complement int64, so the
    packed value lands in Spark's LongType and a SQL oracle can
    rebuild it as a plain integer sum of powers of two."""
    v = 0
    for p, b in enumerate(bits.reshape(-1)[:64]):
        if b:
            v |= 1 << p
    return v - (1 << 64) if v >= (1 << 63) else v


def _dhash_one(p: bytes) -> int:
    """Difference hash: gray → NN-resize to 9×8 → bit (y·8+x) set iff
    px[y,x] > px[y,x+1]. Invariant to uniform brightness shifts and
    any monotone per-pixel tone map; robust to re-encoding/resizing."""
    g = _gray_f64(MC.decode_pixels(p))
    h, w = g.shape
    rs = g[_nn_index(h, 8)][:, _nn_index(w, 9)]
    return _pack64(rs[:, :8] > rs[:, 1:])


_PHASH_DCT = None


def _phash_dct_mat() -> np.ndarray:
    """Orthonormal 32×32 DCT-II matrix (built lazily once per worker)."""
    global _PHASH_DCT
    if _PHASH_DCT is None:
        x = np.arange(32)
        u = x.reshape(-1, 1)
        m = np.sqrt(2.0 / 32.0) * np.cos((2 * x + 1) * u * np.pi / 64.0)
        m[0] *= 1.0 / np.sqrt(2.0)
        _PHASH_DCT = m
    return _PHASH_DCT


def _phash_one(p: bytes) -> int:
    """Perceptual (DCT) hash, the public imagehash convention: gray →
    NN-resize to 32×32 → 2-D DCT-II → top-left 8×8 coefficients → bit
    p set iff coefficient p > median of the 64. Invariant to contrast
    scaling (all coefficients and their median scale together); the
    low-frequency crop makes it robust to blur/noise/small edits."""
    g = _gray_f64(MC.decode_pixels(p))
    h, w = g.shape
    rs = g[_nn_index(h, 32)][:, _nn_index(w, 32)]
    c = _phash_dct_mat()
    low = (c @ rs @ c.T)[:8, :8].reshape(-1)
    return _pack64(low > np.median(low))


def image_hash(media: DataFrame, *, algo: str = "dhash",
               id_col: str = "media_id",
               payload_col: str = "payload",
               min_tasks: int | None = None) -> DataFrame:
    """64-bit perceptual fingerprint per image payload
    (:data:`IMAGE_HASH_SCHEMA`): ``dhash`` (gradient sign grid) or
    ``phash`` (DCT low-frequency median hash). Real pixel decode via
    :func:`..functions.mediacodec.decode_pixels`; non-image or corrupt
    payloads quarantine per-row in ``err`` exactly like
    :func:`decode_media`.

    Scale shape: Arrow-batched ``mapInPandas``, partition-preserving,
    no shuffle; decoded pixels never leave the worker — 8 bytes of
    fingerprint per image cross back to the JVM, so the downstream
    near-dup join shuffles fingerprints, not images."""
    if algo not in ("dhash", "phash"):
        raise ValueError(f"unknown image hash algo {algo!r} "
                         "(want 'dhash' or 'phash')")
    one = _dhash_one if algo == "dhash" else _phash_one

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for p in pdf[payload_col]:
                try:
                    rows.append((one(bytes(p)), None))
                except Exception as e:  # noqa: BLE001 — quarantine is
                    # the contract (same argument as _decode_one)
                    rows.append((None, f"{type(e).__name__}: {e}"))
            out = pd.DataFrame(rows, columns=["fp", "err"])
            out.insert(0, "media_id", pdf[id_col].to_numpy())
            yield out

    return _media_sel(media, id_col, payload_col, min_tasks).mapInPandas(
        run, schema=IMAGE_HASH_SCHEMA)


def image_near_dup_pairs(media: DataFrame, *, max_hamming: int = 3,
                         algo: str = "dhash",
                         id_col: str = "media_id",
                         payload_col: str = "payload") -> DataFrame:
    """Image near-duplicate pairs: perceptual hash + banded Hamming
    join — the multimodal twin of text SimHash dedup. Quarantined
    (undecodable) payloads are excluded from pairing; recover them
    with ``image_hash(...).filter("err is not null")``.

    Reuses :func:`..operators.dedup.hamming_pairs`, so the join is the
    index-compatible pigeonhole banding: one exchange on (chunk, key)
    over 8-byte fingerprints, lowest-agreeing-chunk emit, distance
    verified with ``bit_count`` — a 100 TB image corpus shuffles
    64 bits per image, never pixels."""
    from .dedup import hamming_pairs

    return hamming_pairs(
        _image_fp_frame(media, algo, id_col, payload_col),
        max_hamming=max_hamming, id_col="media_id", fp_col="fp")


def _image_fp_frame(media: DataFrame, algo: str, id_col: str,
                    payload_col: str) -> DataFrame:
    """Hash + drop quarantined rows → the (media_id, fp) frame the
    Hamming-index family consumes."""
    return image_hash(media, algo=algo, id_col=id_col,
                      payload_col=payload_col).filter(
        F.col("err").isNull()).drop("err")


def image_index_write(media: DataFrame, table: str, *,
                      algo: str = "dhash", max_hamming: int = 3,
                      buckets: int = 64, table_buckets: int = 8,
                      id_col: str = "media_id",
                      payload_col: str = "payload") -> None:
    """Materialize an IMAGE near-dup index: perceptual-hash the
    corpus once and band it into the SimHash catalog-table layout
    (``dedup.simhash_write_index`` with precomputed fingerprints) —
    partitioned by ``ck``, bucketed by (chunk, key), so every later
    batch joins against a PRE-DISTRIBUTED reference with zero
    reference-side Exchange. Incremental maintenance rides the same
    family: ``dedup.simhash_append[_exactly_once](fps,
    fp_col="fp", id_col="media_id")`` over :func:`image_hash`
    output, including the crash-replay ledger protocol."""
    from .dedup import simhash_write_index

    simhash_write_index(
        _image_fp_frame(media, algo, id_col, payload_col), table,
        max_hamming=max_hamming, buckets=buckets,
        table_buckets=table_buckets, id_col="media_id", fp_col="fp")


def image_near_dup_indexed(spark, table: str, media: DataFrame, *,
                           algo: str = "dhash", max_hamming: int = 3,
                           buckets: int = 64,
                           id_col: str = "media_id",
                           payload_col: str = "payload") -> DataFrame:
    """Near-dup join of an incoming image batch against a
    :func:`image_index_write` table — the recurring at-scale
    operation: the reference corpus was decoded and hashed ONCE;
    each batch decodes only itself, shuffles 8-byte fingerprints,
    and partition-prunes the reference scan to its own banded ``ck``
    set. Returns (id_in, id_ref, hamming). The ``algo`` must match
    the build (dHash and pHash fingerprints are not comparable)."""
    from .dedup import simhash_join_indexed

    return simhash_join_indexed(
        spark, table,
        _image_fp_frame(media, algo, id_col, payload_col),
        max_hamming=max_hamming, buckets=buckets,
        id_col="media_id", fp_col="fp")


#: output of the REAL :func:`frame_sample` path — sampled frame bytes.
FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("frame_idx", T.LongType(), False),
        T.StructField("frame_ts_ms", T.LongType(), False),
        T.StructField("frame", T.BinaryType(), False),
    ]
)


def _sample_gif(p: bytes, every_ms: int):
    """Animated-GIF time sampling: frame k displays over
    [cum_start_k, cum_start_k + delay_k); ticks at 0, every_ms, …
    pick the frame on screen at that instant. A still image
    (total duration 0) yields one sample at t=0 of the final
    composited canvas."""
    frames = MC.gif_frames(p)
    total = sum(d for d, _ in frames)
    out = []
    if total == 0:
        out.append((0, 0, MC.png_encode(frames[-1][1])))
        return out
    encoded = {}
    t, k, start = 0, 0, 0
    while t < total:
        while k < len(frames) - 1 and t >= start + frames[k][0]:
            start += frames[k][0]
            k += 1
        if k not in encoded:
            encoded[k] = MC.png_encode(frames[k][1])
        out.append((len(out), t, encoded[k]))
        t += every_ms
    return out


def frame_sample(media: DataFrame, *, every_ms: int = 1000,
                 decode_stub: bool = True) -> DataFrame:
    """Video → sampled frames.

    ``decode_stub=False`` is REAL for animated GIF — the one video-ish
    container decodable with the stdlib: :func:`..functions.mediacodec.
    gif_frames` composites every frame per the GIF89a animation model
    (sub-rectangles, transparency, disposal 2/3), Graphic Control
    Extension delays place frames on the timeline, and one PNG-encoded
    frame row is emitted per ``every_ms`` tick via Arrow-batched
    ``mapInPandas`` (schema :data:`FRAME_SCHEMA`). Non-GIF payloads
    raise (MP4/H.264 genuinely needs a codec library) — quarantine
    with :func:`sniff_media_meta` first.

    Stub: one synthetic frame row per ``every_ms`` of
    ``meta.duration_ms``, demonstrating the 1→N expansion shape
    without payload decode (no ``frame`` column).
    """
    if every_ms <= 0:
        raise ValueError(f"every_ms must be positive, got {every_ms}")
    if decode_stub:
        frames = F.explode(
            F.sequence(
                F.lit(0),
                F.greatest(
                    F.coalesce(F.col("meta.duration_ms"), F.lit(0))
                    / every_ms - 1,
                    F.lit(0),
                ).cast("long"),
            )
        )
        return media.select(
            F.col("media_id"), frames.alias("frame_idx")
        ).withColumn("frame_ts_ms", F.col("frame_idx") * every_ms)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                p = bytes(payload)
                if p[:6] not in (b"GIF87a", b"GIF89a"):
                    raise NotImplementedError(
                        "real frame sampling is implemented for GIF; "
                        "other video containers need a codec library")
                for idx, ts, png in _sample_gif(p, every_ms):
                    rows.append((int(mid), idx, ts, png))
            yield pd.DataFrame(
                rows, columns=["media_id", "frame_idx", "frame_ts_ms",
                               "frame"])

    return media.select("media_id", "payload") \
        .mapInPandas(run, schema=FRAME_SCHEMA)
