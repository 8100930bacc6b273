"""Multimodal column plumbing: opaque binary media + typed metadata.

Real Spark-side plumbing (schema, Arrow batch shape, mapInPandas
signatures, partitioning) with REAL decode for every modality
(kernels/media.py + kernels/jpeg.py + kernels/ccitt_g4.py — no codec
library needed): image PIXELS (JPEG incl. progressive/12-bit/
lossless, PNG, GIF animation, TIFF, G4 fax), audio SAMPLES (WAV PCM/
float/G.711/ADPCM, FLAC native + Ogg, AIFF/AIFC, AU, PCM-in-MP4 —
per-payload stats and per-segment rows), and video FRAMES (MJPEG in
AVI/MP4/MKV). Windowed analytics compose on top JVM-side (scene
cuts, silence spans). Codecs outside the decoded subset quarantine
via the error column — never a raise, never a dropped row. Decode
cost is a MEASURED decision: pixel_stats_policy / av_stats_policy
sample per sniffed format, time the real kernels, and gate
decode-vs-header by throughput/budget.

media table schema:
    media(doc_id STRING, media_ref STRING, modality STRING,
          payload BINARY, meta MAP<STRING,STRING>)
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    MapType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("doc_id", StringType()),
        StructField("media_ref", StringType()),
        StructField("modality", StringType()),
        StructField("payload", BinaryType()),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", StringType()),
        StructField("media_ref", StringType()),
        StructField("modality", StringType()),
        StructField("format", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_bytes", IntegerType()),
        StructField("sha8", StringType()),
        StructField("ink_ratio", DoubleType()),
        StructField("duration_ms", IntegerType()),
        StructField("sample_rate", IntegerType()),
        StructField("mean_luma", DoubleType()),
        StructField("n_frames", IntegerType()),
        StructField("bits", IntegerType()),
    ]
)


# every format _decode_image has a real pixel path for — the explicit
# "decode everything" set (pixel_formats=None means "let the
# SPARKPDF_PIXEL_STATS env knob decide", which is NOT the same thing)
PIXEL_DECODABLE_FORMATS = frozenset(
    {"jpeg", "png", "gif", "tiff", "bmp", "pnm", "tga", "ico"})


def _decode_image(payload: bytes, pixel_formats: "set | None" = None) -> dict:
    """REAL header decode: true width/height parsed from the JPEG SOF /
    PNG IHDR / GIF LSD / TIFF IFD structures (kernels/media.py) — no
    codec library needed. Group-4 TIFF payloads additionally get a full
    MMR pixel decode (kernels/ccitt_g4) and report ink_ratio.
    Unrecognised payloads report no dimensions.

    `pixel_formats`: None = the SPARKPDF_PIXEL_STATS env knob decides
    globally (default on); a set = decode pixel statistics only for
    those formats (the per-corpus decision pixel_stats_policy makes)."""
    import os

    from ..kernels.media import (
        gif_mean_luma,
        image_dims,
        ink_ratio,
        png_mean_luma,
    )

    meta = image_dims(payload) or {}
    if pixel_formats is not None:
        if meta.get("format") not in pixel_formats:
            return meta
    elif os.environ.get("SPARKPDF_PIXEL_STATS", "1") == "0":
        # scale knob: header-only mode for image-heavy corpora where
        # the (Python) pixel decoders would dominate executor CPU —
        # dims/format/digest stay, mean_luma/ink_ratio are skipped
        return meta
    if meta.get("format") == "tiff":
        r = ink_ratio(payload)
        if r is not None:
            meta["ink_ratio"] = round(r, 6)
        else:
            # non-fax TIFF: baseline strip decode (none/LZW/PackBits,
            # kernels/media.tiff_pixels — round 4)
            from ..kernels.media import tiff_mean_luma

            luma = tiff_mean_luma(payload)
            if luma is not None:
                meta["mean_luma"] = luma
    elif meta.get("format") == "png":
        # REAL pixel decode (zlib + PNG row filters, kernels/media.py;
        # round 4 widens to palette / 1-16 bit / Adam7)
        luma = png_mean_luma(payload)
        if luma is not None:
            meta["mean_luma"] = luma
    elif meta.get("format") == "gif":
        # REAL first-frame decode (GIF-flavor LZW + palette expansion
        # + 4-pass de-interlace, kernels/media.py — round 4); round 5
        # adds animation metadata (frame count + summed GCE delays)
        from ..kernels.media import gif_frames_info

        frames = gif_frames_info(payload)
        if frames is not None:
            meta["n_frames"] = frames["n_frames"]
            if frames["duration_ms"]:
                meta["duration_ms"] = frames["duration_ms"]
        luma = gif_mean_luma(payload)
        if luma is not None:
            meta["mean_luma"] = luma
    elif meta.get("format") == "jpeg":
        # REAL pixel decode for baseline, progressive (Annex G),
        # 12-bit (SOF1/SOF2 + 16-bit DQT) AND lossless (SOF3, Annex H)
        # JPEG incl. 4:2:0/4:2:2 and restart markers (from-scratch
        # T.81 codec, kernels/jpeg.py); arithmetic-coded payloads keep
        # header-only metadata
        from ..kernels.jpeg import jpeg_mean_luma

        luma = jpeg_mean_luma(payload)
        if luma is not None:
            meta["mean_luma"] = luma
    elif meta.get("format") == "bmp":
        # REAL DIB raster decode (round 7): 24-bit BGR / 8-bit
        # palettized BI_RGB, bottom-up and top-down row orders —
        # shares the AVI '00db' video lane's raster math
        from ..kernels.media import bmp_mean_luma

        luma = bmp_mean_luma(payload)
        if luma is not None:
            meta["mean_luma"] = luma
    elif meta.get("format") == "pnm":
        # REAL netpbm raster decode (round 7): P5 gray / P6 RGB,
        # 8-bit and 16-bit-BE samples, native-depth mean (the
        # jpeg12 discipline)
        from ..kernels.media import pnm_mean_luma

        luma = pnm_mean_luma(payload)
        if luma is not None:
            meta["mean_luma"] = luma
    elif meta.get("format") == "tga":
        # REAL TGA raster decode (round 7): gray/truecolor/palettized
        # + all three RLE forms, top-down and bottom-up
        from ..kernels.media import tga_mean_luma

        luma = tga_mean_luma(payload)
        if luma is not None:
            meta["mean_luma"] = luma
    elif meta.get("format") == "ico":
        # REAL ICO first-image decode (round 7): PNG-compressed
        # entries through the full PNG path, classic entries through
        # the shared DIB raster math (doubled-height AND mask parsed
        # past, excluded from luma)
        from ..kernels.media import ico_mean_luma

        luma = ico_mean_luma(payload)
        if luma is not None:
            meta["mean_luma"] = luma
    return meta


def _decode_audio(payload: bytes) -> dict:
    """REAL container decode for WAV/RIFF (fmt/data chunks), MP3
    (Layer-III frame-header walk), FLAC (STREAMINFO block) and Ogg
    (Vorbis/Opus ident + last-page granule — kernels/media.py): sample
    rate, channels, bits, duration. Codecs beyond these (aac/ape/...)
    need decoders not present in this container — they raise and
    quarantine to empty features."""
    from ..kernels.media import flac_info, mp3_info, ogg_info, wav_info

    meta = (
        wav_info(payload) or flac_info(payload) or ogg_info(payload)
        or mp3_info(payload)
    )
    if meta is None:
        raise NotImplementedError(
            "audio decode beyond WAV/MP3/FLAC/Ogg requires codecs not in "
            "this container"
        )
    return meta


def _decode_video(payload: bytes) -> dict:
    """REAL container decode for MP4/ISO-BMFF (mvhd/tkhd boxes), AVI
    (RIFF hdrl/avih, kernels/media.avi_info) and
    Matroska/WebM (EBML Segment/Info/Tracks, kernels/media.mkv_info):
    duration + frame dims. Other containers (flv/ogv...) raise and
    quarantine."""
    from ..kernels.media import avi_info, mkv_info, mp4_info

    meta = avi_info(payload) or mp4_info(payload) or mkv_info(payload)
    if meta is None:
        raise NotImplementedError(
            "video decode beyond MP4/MKV/AVI requires codecs not in this "
            "container"
        )
    return meta


DECODERS = {
    "image": _decode_image,
    "audio": _decode_audio,
    "video": _decode_video,
}


def synthesize_media(documents: DataFrame) -> DataFrame:
    """documents -> one deterministic fake-image row per doc (payload =
    md5(text) bytes via JVM-side functions; no Python here)."""
    return documents.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        F.concat(F.lit("img-"), F.col("doc_id").cast("string")).alias("media_ref"),
        F.lit("image").alias("modality"),
        # payload = ASCII bytes of the md5 hex digest: DuckDB's sha256
        # only hashes VARCHAR, so the oracle chain is sha256(md5(text))
        F.md5(F.col("text").cast("binary")).cast("binary").alias("payload"),
    )


def synthesize_image_media(documents: DataFrame) -> DataFrame:
    """documents -> one REAL image per doc (PNG for even doc_id, JPEG
    for odd) with formula dimensions width = 16 + doc_id % 32,
    height = 8 + doc_id % 16 — so the oracle can state the expected
    dims in pure SQL while the engine must actually parse the binary
    headers to reproduce them."""
    ids = documents.select(F.col("doc_id").cast("long").alias("doc_id"))
    n_parts = documents.sparkSession.sparkContext.defaultParallelism
    schema = "doc_id string, media_ref string, modality string, payload binary"

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..testing.imagegen import make_jpeg, make_png

        for pdf in batches:
            out = {"doc_id": [], "media_ref": [], "modality": [], "payload": []}
            for (doc_id,) in pdf.itertuples(index=False):
                d = int(doc_id)
                w, h = 16 + d % 32, 8 + d % 16
                payload = make_png(w, h) if d % 2 == 0 else make_jpeg(w, h)
                out["doc_id"].append(str(d))
                out["media_ref"].append(f"img-{d}")
                out["modality"].append("image")
                out["payload"].append(payload)
            yield pd.DataFrame(out)

    return ids.repartition(n_parts, "doc_id").mapInPandas(gen, schema=schema)


def synthesize_bmp_media(documents: DataFrame) -> DataFrame:
    """documents -> one REAL BMP per doc, rotating by d%4 across the
    DIB variants (0 -> 24-bit bottom-up; 1 -> 24-bit TOP-DOWN,
    negative biHeight; 2 -> 8-bit palettized over the TWISTED palette
    pal[i] = (7*i+13)%256 — the indirection proves the decoder reads
    the palette, not the indices; 3 -> BI_RLE8 COMPRESSED 8-bit over
    the gray-identity palette — encoded runs AND absolute-mode spans,
    round 7). Planted per-row gray g(d,y) = 40 + ((d + y*11) % 50)*4
    at dims (24 + (d%3)*8) x (8 + (d%2)*8) — the tiff corpus
    formulas, so the oracle is the same closed form with a palette
    CASE on the d%4==2 lane."""
    ids = documents.select(F.col("doc_id").cast("long").alias("doc_id"))
    n_parts = documents.sparkSession.sparkContext.defaultParallelism
    schema = "doc_id string, media_ref string, modality string, payload binary"

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from ..testing.imagegen import make_bmp

        twisted = b"".join(
            bytes(((7 * i + 13) % 256,) * 3 + (0,)) for i in range(256))

        for pdf in batches:
            out = {"doc_id": [], "media_ref": [], "modality": [], "payload": []}
            for (doc_id,) in pdf.itertuples(index=False):
                d = int(doc_id)
                w, h = 24 + (d % 3) * 8, 8 + (d % 2) * 8
                img = np.zeros((h, w), np.uint8)
                for y in range(h):
                    img[y, :] = 40 + ((d + y * 11) % 50) * 4
                lane = d % 4
                if lane == 2:
                    payload = make_bmp(img, bits=8, palette=twisted)
                elif lane == 3:
                    payload = make_bmp(img, bits=8, rle=True)
                else:
                    payload = make_bmp(img, topdown=(lane == 1))
                out["doc_id"].append(str(d))
                out["media_ref"].append(f"bmp-{d}")
                out["modality"].append("image")
                out["payload"].append(payload)
            yield pd.DataFrame(out)

    return ids.repartition(n_parts, "doc_id").mapInPandas(gen, schema=schema)


def synthesize_pnm_media(documents: DataFrame) -> DataFrame:
    """documents -> one REAL binary netpbm per doc, rotating by d%3
    (0 -> P5 8-bit graymap; 1 -> P6 RGB pixmap with gray-valued
    pixels — the integer 299/587/114 luma weights sum to 1000 so the
    mean equals the planted gray exactly; 2 -> P5 16-BIT graymap at
    maxval 65535 storing g*257, the standard 8->16 bit scaling, so
    the native-depth mean is exactly 257x the 8-bit formula). Same
    g(d,y)/dims formulas as the bmp corpus."""
    ids = documents.select(F.col("doc_id").cast("long").alias("doc_id"))
    n_parts = documents.sparkSession.sparkContext.defaultParallelism
    schema = "doc_id string, media_ref string, modality string, payload binary"

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from ..testing.imagegen import make_pnm

        for pdf in batches:
            out = {"doc_id": [], "media_ref": [], "modality": [], "payload": []}
            for (doc_id,) in pdf.itertuples(index=False):
                d = int(doc_id)
                w, h = 24 + (d % 3) * 8, 8 + (d % 2) * 8
                img = np.zeros((h, w), np.uint8)
                for y in range(h):
                    img[y, :] = 40 + ((d + y * 11) % 50) * 4
                lane = d % 3
                if lane == 1:
                    payload = make_pnm(np.repeat(img[..., None], 3, axis=2))
                elif lane == 2:
                    payload = make_pnm(
                        img.astype(np.uint16) * 257, maxval=65535)
                else:
                    payload = make_pnm(img)
                out["doc_id"].append(str(d))
                out["media_ref"].append(f"pnm-{d}")
                out["modality"].append("image")
                out["payload"].append(payload)
            yield pd.DataFrame(out)

    return ids.repartition(n_parts, "doc_id").mapInPandas(gen, schema=schema)


def synthesize_webp_media(documents: DataFrame) -> DataFrame:
    """documents -> one WebP per doc, layout rotating by d%3
    (VP8 lossy header / VP8L lossless bitfields / VP8X extended
    canvas) at formula dims width = 16 + d%32, height = 8 + d%16 —
    each layout encodes dims differently, so one dims oracle
    certifies all three header parsers."""
    ids = documents.select(F.col("doc_id").cast("long").alias("doc_id"))
    n_parts = documents.sparkSession.sparkContext.defaultParallelism
    schema = "doc_id string, media_ref string, modality string, payload binary"

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..testing.imagegen import make_webp

        for pdf in batches:
            out = {"doc_id": [], "media_ref": [], "modality": [], "payload": []}
            for (doc_id,) in pdf.itertuples(index=False):
                d = int(doc_id)
                kind = ("vp8", "vp8l", "vp8x")[d % 3]
                out["doc_id"].append(str(d))
                out["media_ref"].append(f"webp-{d}")
                out["modality"].append("image")
                out["payload"].append(
                    make_webp(16 + d % 32, 8 + d % 16, kind))
            yield pd.DataFrame(out)

    return ids.repartition(n_parts, "doc_id").mapInPandas(gen, schema=schema)


def synthesize_jp2_media(documents: DataFrame) -> DataFrame:
    """documents -> one JPEG 2000 per doc, layout rotating by d%3
    (raw j2k codestream / jp2 container / jp2 container with an
    XLBox-length jp2c) at formula dims width = 20 + d%40,
    height = 10 + d%20, n_components = 1 + (d%2)*2 (gray or RGB),
    bit_depth = (8,10,12,16)[d%4] — each layout stores the dims in a
    different structure (SIZ grid vs ihdr), so one dims oracle
    certifies the codestream parser, the box walk, and the
    extended-length path."""
    ids = documents.select(F.col("doc_id").cast("long").alias("doc_id"))
    n_parts = documents.sparkSession.sparkContext.defaultParallelism
    schema = "doc_id string, media_ref string, modality string, payload binary"

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..testing.imagegen import make_jp2

        for pdf in batches:
            out = {"doc_id": [], "media_ref": [], "modality": [], "payload": []}
            for (doc_id,) in pdf.itertuples(index=False):
                d = int(doc_id)
                kind = ("j2k", "jp2", "jp2xl")[d % 3]
                out["doc_id"].append(str(d))
                out["media_ref"].append(f"jp2-{d}")
                out["modality"].append("image")
                out["payload"].append(
                    make_jp2(20 + d % 40, 10 + d % 20,
                             n_components=1 + (d % 2) * 2,
                             bit_depth=(8, 10, 12, 16)[d % 4],
                             kind=kind))
            yield pd.DataFrame(out)

    return ids.repartition(n_parts, "doc_id").mapInPandas(gen, schema=schema)


def synthesize_tga_ico_media(documents: DataFrame) -> DataFrame:
    """documents -> one REAL TGA or ICO per doc, rotating by d%5
    (0 -> TGA grayscale type 3; 1 -> TGA truecolor type 2 with REAL
    RLE packets, gray-valued BGR; 2 -> TGA palettized type 1 over the
    TWISTED palette (7i+13)%256, RLE on odd docs; 3 -> ICO classic
    DIB entry (doubled-height XOR+AND planes); 4 -> ICO with a
    PNG-compressed entry — the full PNG pixel path inside the ICO
    container). Same g(d,y)/dims formulas as the bmp corpus, so the
    oracle is one closed form with the palette CASE on lane 2."""
    ids = documents.select(F.col("doc_id").cast("long").alias("doc_id"))
    n_parts = documents.sparkSession.sparkContext.defaultParallelism
    schema = "doc_id string, media_ref string, modality string, payload binary"

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from ..testing.imagegen import make_ico, make_tga

        twisted = b"".join(
            bytes(((7 * i + 13) % 256,) * 3) for i in range(256))

        for pdf in batches:
            out = {"doc_id": [], "media_ref": [], "modality": [], "payload": []}
            for (doc_id,) in pdf.itertuples(index=False):
                d = int(doc_id)
                w, h = 24 + (d % 3) * 8, 8 + (d % 2) * 8
                img = np.zeros((h, w), np.uint8)
                for y in range(h):
                    img[y, :] = 40 + ((d + y * 11) % 50) * 4
                lane = d % 5
                if lane == 0:
                    payload = make_tga(img, topdown=(d % 2 == 1))
                elif lane == 1:
                    payload = make_tga(
                        np.repeat(img[..., None], 3, axis=2), rle=True)
                elif lane == 2:
                    payload = make_tga(img, img_type=1, palette=twisted,
                                       rle=(d % 2 == 1))
                elif lane == 3:
                    payload = make_ico(img)
                else:
                    payload = make_ico(img, png=True)
                out["doc_id"].append(str(d))
                out["media_ref"].append(f"tga-{d}")
                out["modality"].append("image")
                out["payload"].append(payload)
            yield pd.DataFrame(out)

    return ids.repartition(n_parts, "doc_id").mapInPandas(gen, schema=schema)


def synthesize_g4_media(documents: DataFrame) -> DataFrame:
    """documents -> one Group-4 TIFF per doc: width = 16 + doc_id % 32,
    height = 8 + doc_id % 16, the top half(height//2 rows) solid black —
    so the expected ink_ratio is (height//2)/height, SQL-restatable,
    while the engine must really run the T.6 MMR decode to measure it."""
    ids = documents.select(F.col("doc_id").cast("long").alias("doc_id"))
    n_parts = documents.sparkSession.sparkContext.defaultParallelism
    schema = "doc_id string, media_ref string, modality string, payload binary"

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..kernels.ccitt_g4 import g4_encode
        from ..kernels.filters import ccitt_fax_wrap

        for pdf in batches:
            out = {"doc_id": [], "media_ref": [], "modality": [], "payload": []}
            for (doc_id,) in pdf.itertuples(index=False):
                d = int(doc_id)
                w, h = 16 + d % 32, 8 + d % 16
                bitmap = [[1] * w if r < h // 2 else [0] * w for r in range(h)]
                payload = ccitt_fax_wrap(
                    g4_encode(bitmap, w), {"/K": -1, "/Columns": w, "/Rows": h}
                )
                out["doc_id"].append(str(d))
                out["media_ref"].append(f"scan-{d}")
                out["modality"].append("image")
                out["payload"].append(payload)
            yield pd.DataFrame(out)

    return ids.repartition(n_parts, "doc_id").mapInPandas(gen, schema=schema)


def synthesize_av_media(documents: DataFrame) -> DataFrame:
    """documents -> one REAL audio/video container per doc (doc_id % 7;
    round 5 widens the round-3 4-way corpus with FLAC/Ogg/AVI) with
    formula metadata the oracle can restate in SQL while the engine
    must parse the real binary headers (RIFF chunks / BMFF boxes /
    Layer-III frame walk / EBML / STREAMINFO bitfields / Ogg granule):
      0 WAV:  sample_rate = 8000 + (d%8)*1000, duration_ms = 100 + d%400
      1 MP4:  width = 320 + (d%8)*16, height = 240 + (d%4)*16,
              duration_ms = 500 + d%1000
      2 MP3:  sample_rate = 32000, frames = 5 + d%20 ->
              duration_ms = (5 + d%20) * 36
      3 MKV:  width = 100 + d%300, height = 80 + d%200,
              duration_ms = 700 + d%900
      4 FLAC: sample_rate = 16000 + (d%4)*8000, duration_ms = 200 + d%600
      5 OGG:  vorbis (even d): rate = 24000, duration_ms = 300 + d%500;
              opus (odd d): rate = 16000 + (d%3)*16000, same duration
              (granule math stays exact: 24000 and 48000 divide 1000ms)
      6 AVI:  width = 160 + (d%10)*32, height = 120 + (d%6)*32,
              duration_ms = 400 + d%800 (25 fps -> exact usec math)"""
    ids = documents.select(F.col("doc_id").cast("long").alias("doc_id"))
    n_parts = documents.sparkSession.sparkContext.defaultParallelism
    schema = "doc_id string, media_ref string, modality string, payload binary"

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..testing.imagegen import (
            make_avi,
            make_flac,
            make_mkv,
            make_mp3,
            make_mp4,
            make_ogg,
            make_wav,
        )

        for pdf in batches:
            out = {"doc_id": [], "media_ref": [], "modality": [], "payload": []}
            for (doc_id,) in pdf.itertuples(index=False):
                d = int(doc_id)
                v = d % 7
                if v == 0:
                    modality = "audio"
                    payload = make_wav(8000 + (d % 8) * 1000, 100 + d % 400)
                elif v == 1:
                    modality = "video"
                    payload = make_mp4(
                        320 + (d % 8) * 16, 240 + (d % 4) * 16, 500 + d % 1000
                    )
                elif v == 2:
                    modality = "audio"
                    payload = make_mp3(5 + d % 20, id3=(d % 8 == 6))
                elif v == 3:
                    modality = "video"
                    payload = make_mkv(
                        100 + d % 300, 80 + d % 200, 700 + d % 900
                    )
                elif v == 4:
                    modality = "audio"
                    payload = make_flac(
                        16000 + (d % 4) * 8000, 200 + d % 600
                    )
                elif v == 5:
                    modality = "audio"
                    payload = make_ogg(
                        24000 if d % 2 == 0 else 16000 + (d % 3) * 16000,
                        300 + d % 500,
                        codec="vorbis" if d % 2 == 0 else "opus",
                    )
                else:
                    modality = "video"
                    payload = make_avi(
                        160 + (d % 10) * 32, 120 + (d % 6) * 32,
                        400 + d % 800,
                    )
                out["doc_id"].append(str(d))
                out["media_ref"].append(f"av-{d}")
                out["modality"].append(modality)
                out["payload"].append(payload)
            yield pd.DataFrame(out)

    return ids.repartition(n_parts, "doc_id").mapInPandas(gen, schema=schema)


def synthesize_gif_media(documents: DataFrame) -> DataFrame:
    """documents -> one REAL LZW-coded GIF frame per doc. The planted
    gray palette and index pattern make the decoded mean luminance a
    pure doc_id formula (GIF decode is lossless palette lookup):
      npal = 8, palette[k] = gray 30 + ((d + k*7) % 26) * 8
      width = 24 + (d%3)*8  (a multiple of npal), height = 8 + d%8
      index(x, y) = (x + y) % 8  -> every palette entry appears equally
      often in each row, so mean_luma = avg_k palette[k], exactly.
    Odd docs are INTERLACED (4-pass row order) — same pixels, so the
    oracle doesn't move while the de-interlacer is exercised."""
    ids = documents.select(F.col("doc_id").cast("long").alias("doc_id"))
    n_parts = documents.sparkSession.sparkContext.defaultParallelism
    schema = "doc_id string, media_ref string, modality string, payload binary"

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..testing.imagegen import make_gif_frame

        for pdf in batches:
            out = {"doc_id": [], "media_ref": [], "modality": [], "payload": []}
            for (doc_id,) in pdf.itertuples(index=False):
                d = int(doc_id)
                w, h = 24 + (d % 3) * 8, 8 + d % 8
                pal = [(v, v, v) for v in
                       (30 + ((d + k * 7) % 26) * 8 for k in range(8))]
                rows = [[(x + y) % 8 for x in range(w)] for y in range(h)]
                out["doc_id"].append(str(d))
                out["media_ref"].append(f"gif-{d}")
                out["modality"].append("image")
                out["payload"].append(
                    make_gif_frame(rows, pal, interlace=bool(d % 2))
                )
            yield pd.DataFrame(out)

    return ids.repartition(n_parts, "doc_id").mapInPandas(gen, schema=schema)


def synthesize_animated_gif_media(documents: DataFrame) -> DataFrame:
    """documents -> one ANIMATED GIF per doc (round 5): n_frames =
    1 + d%4 identical pattern frames, per-frame GCE delay =
    (10 + d%20) cs -> duration_ms = n_frames * (10 + d%20) * 10; the
    first frame reuses the gif corpus's gray-palette trick so
    mean_luma = avg_k(30 + ((d + k*7) % 26) * 8) exactly. The engine
    must walk the real block stream (gif_frames_info) AND LZW-decode
    frame 1 to match."""
    ids = documents.select(F.col("doc_id").cast("long").alias("doc_id"))
    n_parts = documents.sparkSession.sparkContext.defaultParallelism
    schema = "doc_id string, media_ref string, modality string, payload binary"

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..testing.imagegen import make_animated_gif

        for pdf in batches:
            out = {"doc_id": [], "media_ref": [], "modality": [], "payload": []}
            for (doc_id,) in pdf.itertuples(index=False):
                d = int(doc_id)
                w, h = 24 + (d % 3) * 8, 8 + d % 8
                pal = [(v, v, v) for v in
                       (30 + ((d + k * 7) % 26) * 8 for k in range(8))]
                rows = [[(x + y) % 8 for x in range(w)] for y in range(h)]
                n = 1 + d % 4
                delay = 10 + d % 20
                out["doc_id"].append(str(d))
                out["media_ref"].append(f"anim-{d}")
                out["modality"].append("image")
                out["payload"].append(
                    make_animated_gif([rows] * n, pal, [delay] * n,
                                      loop=d % 3)
                )
            yield pd.DataFrame(out)

    return ids.repartition(n_parts, "doc_id").mapInPandas(gen, schema=schema)


def synthesize_tiff_media(documents: DataFrame) -> DataFrame:
    """documents -> one TIFF per doc cycling EIGHT organizations
    over identical luma (rounds 5-7 — the oracle formula never moves
    while the engine exercises every decode path):
      d%8==0 strip, uncompressed      d%8==1 strip, LZW + predictor 2
      d%8==2 TILED 16x16, LZW         d%8==3 JPEG strips (lossless SOF3)
      d%8==4 RGB PLANAR (tag 284=2), LZW + predictor 2, multi-strip —
             gray-valued planes (R=G=B=row value), so the 299/587/114
             luma equals the gray formula exactly (round 6)
      d%8==5 RGB PLANAR x TILED 16x16, LZW + predictor 2 (round 7 —
             the §14 x §15 combination, previously a quarantine)
      d%8==6 RGB PLANAR x JPEG strips (round 7 — §14 x compression 7,
             per-plane grayscale SOF3 with shared JPEGTables)
      d%8==7 OLD-style JPEG (compression 6, round 7): one SOF3
             interchange stream under JPEGInterchangeFormat 513/514 —
             lossless, so the shared formula still holds
    width = 24 + (d%3)*8, height = 8 + (d%2)*8, row y is the constant
    40 + ((d + y*11) % 50) * 4 -> mean_luma = avg_y(row value), exact
    (heights 8/16 keep the mean's decimals terminating)."""
    ids = documents.select(F.col("doc_id").cast("long").alias("doc_id"))
    n_parts = documents.sparkSession.sparkContext.defaultParallelism
    schema = "doc_id string, media_ref string, modality string, payload binary"

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from ..testing.imagegen import (
            make_tiff,
            make_tiff_jpeg,
            make_tiff_ojpeg,
            make_tiff_tiled,
        )

        for pdf in batches:
            out = {"doc_id": [], "media_ref": [], "modality": [], "payload": []}
            for (doc_id,) in pdf.itertuples(index=False):
                d = int(doc_id)
                w, h = 24 + (d % 3) * 8, 8 + (d % 2) * 8
                img = np.zeros((h, w), dtype=np.uint8)
                for y in range(h):
                    img[y, :] = 40 + ((d + y * 11) % 50) * 4
                v = d % 8
                if v == 0:
                    payload = make_tiff(img)
                elif v == 1:
                    payload = make_tiff(img, compression=5,
                                        rows_per_strip=4, predictor=2)
                elif v == 2:
                    payload = make_tiff_tiled(img, 16, 16, compression=5)
                elif v == 3:
                    payload = make_tiff_jpeg(img, rows_per_strip=8)
                elif v == 4:
                    rgb = np.repeat(img[..., None], 3, axis=2)
                    payload = make_tiff(rgb, compression=5,
                                        rows_per_strip=4, predictor=2,
                                        planar=2)
                elif v == 5:
                    rgb = np.repeat(img[..., None], 3, axis=2)
                    payload = make_tiff_tiled(rgb, 16, 16,
                                              compression=5,
                                              predictor=2, planar=2)
                elif v == 6:
                    rgb = np.repeat(img[..., None], 3, axis=2)
                    payload = make_tiff_jpeg(rgb, rows_per_strip=8,
                                             planar=2,
                                             shared_tables=True)
                else:
                    payload = make_tiff_ojpeg(img)
                out["doc_id"].append(str(d))
                out["media_ref"].append(f"tif-{d}")
                out["modality"].append("image")
                out["payload"].append(payload)
            yield pd.DataFrame(out)

    return ids.repartition(n_parts, "doc_id").mapInPandas(gen, schema=schema)


def synthesize_lossless_jpeg_media(documents: DataFrame) -> DataFrame:
    """documents -> one LOSSLESS JPEG (SOF3) per doc: 12-bit gray,
    predictor = 1 + d%7 (decode is exact for every selector), row y
    constant 400 + ((d + y*13) % 200) * 16, width = 24 + (d%3)*8,
    height = 8 + (d%2)*8 -> mean_luma = avg_y(row value) exactly."""
    ids = documents.select(F.col("doc_id").cast("long").alias("doc_id"))
    n_parts = documents.sparkSession.sparkContext.defaultParallelism
    schema = "doc_id string, media_ref string, modality string, payload binary"

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from ..kernels.jpeg import encode_jpeg_lossless

        for pdf in batches:
            out = {"doc_id": [], "media_ref": [], "modality": [], "payload": []}
            for (doc_id,) in pdf.itertuples(index=False):
                d = int(doc_id)
                w, h = 24 + (d % 3) * 8, 8 + (d % 2) * 8
                img = np.zeros((h, w), dtype=np.uint16)
                for y in range(h):
                    img[y, :] = 400 + ((d + y * 13) % 200) * 16
                out["doc_id"].append(str(d))
                out["media_ref"].append(f"ljpg-{d}")
                out["modality"].append("image")
                out["payload"].append(
                    encode_jpeg_lossless(img, predictor=1 + d % 7,
                                         precision=12)
                )
            yield pd.DataFrame(out)

    return ids.repartition(n_parts, "doc_id").mapInPandas(gen, schema=schema)


MEDIA_PAYLOAD_SCHEMA = StructType(
    MEDIA_SCHEMA.fields + [StructField("error", StringType())]
)


def extract_media_payloads(pdf_raw: DataFrame) -> DataFrame:
    """pdf_raw -> media(doc_id, media_ref, modality, payload, error):
    pulls every embedded image XObject out of each document (the bridge
    that feeds PDFs into the same feature/dedup pipelines as standalone
    media). Invariant 2 (extract_doc never drops a doc) holds here too:
    an unparseable document yields ONE row with null payload and the
    error string — silent drops are unaccountable losses at corpus
    scale. media_ref is 'p{page}/{name}' so multi-page name reuse stays
    unique."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..kernels.document import PdfDocument

        cols = ("doc_id", "media_ref", "modality", "payload", "error")
        for pdf in batches:
            out = {k: [] for k in cols}
            for doc_id, blob in zip(pdf["doc_id"], pdf["pdf_bytes"]):
                try:
                    doc = PdfDocument(bytes(blob))
                    for m in doc.media_objects():
                        out["doc_id"].append(str(doc_id))
                        out["media_ref"].append(f"p{m['page_no']}/{m['name']}")
                        out["modality"].append("image")
                        out["payload"].append(m["data"])
                        out["error"].append(None)
                except Exception as exc:  # quarantine, never drop
                    out["doc_id"].append(str(doc_id))
                    out["media_ref"].append(None)
                    out["modality"].append(None)
                    out["payload"].append(None)
                    out["error"].append(f"{type(exc).__name__}: {exc}"[:500])
            yield pd.DataFrame(out)

    return pdf_raw.select("doc_id", "pdf_bytes").mapInPandas(
        gen, schema=MEDIA_PAYLOAD_SCHEMA
    )


def _tile_jpeg(d: int) -> bytes:
    """The deterministic planted-tile JPEG for doc d: flat 8x8 tiles at
    78 + 2*((t*7 + d) % 51) (even offsets from 128 survive Annex-K DC
    quantization exactly). Encoding varies by doc so the corpus
    exercises every decoder path while the ORACLE FORMULA never moves:
      d%4==0 -> grayscale 4:4:4 baseline
      d%4==1 -> gray-valued RGB, 4:2:0, restart_interval=2
      d%4==2 -> gray-valued RGB, 4:2:2, restart_interval=1
      d%4==3 -> gray-valued RGB, 4:2:0, PROGRESSIVE (SOF2, Annex G)
    Gray-valued RGB keeps decode lossless under subsampling: Y == v
    (the luma weights sum to 1) and Cb == Cr == 128 exactly, so chroma
    box-averaging and upsampling are the identity; progressive carries
    the same quantized coefficients as sequential, so it is equally
    lossless on these tiles."""
    import numpy as np

    from ..kernels.jpeg import encode_jpeg, encode_jpeg_progressive

    w, h = 16 + (d % 4) * 8, 8 + (d % 2) * 8
    img = np.zeros((h, w), dtype=np.uint8)
    tiles_x = w // 8
    for ty in range(h // 8):
        for tx in range(tiles_x):
            t = ty * tiles_x + tx
            img[ty * 8:(ty + 1) * 8, tx * 8:(tx + 1) * 8] = (
                78 + 2 * ((t * 7 + d) % 51)
            )
    variant = d % 4
    if variant == 0:
        return encode_jpeg(img)
    rgb = np.repeat(img[..., None], 3, axis=2)
    if variant == 1:
        return encode_jpeg(rgb, subsampling="420", restart_interval=2)
    if variant == 2:
        return encode_jpeg(rgb, subsampling="422", restart_interval=1)
    return encode_jpeg_progressive(rgb, subsampling="420")


def _tile_jpeg12(d: int) -> bytes:
    """12-bit planted-tile JPEG for doc d (r4 verdict item 8 —
    medical/scanned corpora): flat 8x8 tiles at
    1248 + 32*((t*7 + d) % 51) = 16x the 8-bit corpus values, so the
    offsets from the 2048 level shift are multiples of 32 and survive
    the x16-scaled Annex-K DC quantization exactly (step 256, DC =
    8*delta -> delta/32 integral). Even docs are EXTENDED SEQUENTIAL
    (SOF1, 16-bit DQT); odd docs are 12-bit PROGRESSIVE (SOF2). The
    oracle mean is exactly 16x the 8-bit formula."""
    import numpy as np

    from ..kernels.jpeg import encode_jpeg, encode_jpeg_progressive

    w, h = 16 + (d % 4) * 8, 8 + (d % 2) * 8
    img = np.zeros((h, w), dtype=np.uint16)
    tiles_x = w // 8
    for ty in range(h // 8):
        for tx in range(tiles_x):
            t = ty * tiles_x + tx
            img[ty * 8:(ty + 1) * 8, tx * 8:(tx + 1) * 8] = (
                1248 + 32 * ((t * 7 + d) % 51)
            )
    if d % 2 == 0:
        return encode_jpeg(img, precision=12)
    return encode_jpeg_progressive(img, precision=12)


def synthesize_jpeg12_media(documents: DataFrame) -> DataFrame:
    """documents -> one REAL 12-bit JPEG per doc (_tile_jpeg12):
    width = 16 + (doc_id % 4) * 8, height = 8 + (doc_id % 2) * 8,
    tile t value = 1248 + 32 * ((t*7 + doc_id) % 51) — the engine must
    run the full 12-bit decode (16-bit DQT, SOF1/SOF2, 2048 level
    shift) to reproduce the SQL-restatable mean."""
    ids = documents.select(F.col("doc_id").cast("long").alias("doc_id"))
    n_parts = documents.sparkSession.sparkContext.defaultParallelism
    schema = "doc_id string, media_ref string, modality string, payload binary"

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"doc_id": [], "media_ref": [], "modality": [], "payload": []}
            for (doc_id,) in pdf.itertuples(index=False):
                d = int(doc_id)
                out["doc_id"].append(str(d))
                out["media_ref"].append(f"jpg12-{d}")
                out["modality"].append("image")
                out["payload"].append(_tile_jpeg12(d))
            yield pd.DataFrame(out)

    return ids.repartition(n_parts, "doc_id").mapInPandas(gen, schema=schema)


def synthesize_jpeg_media(documents: DataFrame) -> DataFrame:
    """documents -> one REAL baseline JPEG per doc (kernels/jpeg.py
    encoder) with planted flat tiles (_tile_jpeg):
      width = 16 + (doc_id % 4) * 8, height = 8 + (doc_id % 2) * 8,
      tile t value = 78 + 2 * ((t*7 + doc_id) % 51)
    so the oracle restates the decoded mean luminance in pure SQL while
    the engine must run the full Huffman + IDCT decode — including the
    4:2:0/4:2:2 chroma upsample and DRI/RSTn restart handling on two of
    every three docs — to match."""
    ids = documents.select(F.col("doc_id").cast("long").alias("doc_id"))
    n_parts = documents.sparkSession.sparkContext.defaultParallelism
    schema = "doc_id string, media_ref string, modality string, payload binary"

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"doc_id": [], "media_ref": [], "modality": [], "payload": []}
            for (doc_id,) in pdf.itertuples(index=False):
                d = int(doc_id)
                out["doc_id"].append(str(d))
                out["media_ref"].append(f"jpg-{d}")
                out["modality"].append("image")
                out["payload"].append(_tile_jpeg(d))
            yield pd.DataFrame(out)

    return ids.repartition(n_parts, "doc_id").mapInPandas(gen, schema=schema)


def write_pdfs_with_jpeg_media(documents: DataFrame) -> DataFrame:
    """documents -> pdf_raw where each doc embeds ONE REAL baseline
    JPEG ('img00') built with kernels/jpeg.encode_jpeg using the same
    deterministic tile formulas as synthesize_jpeg_media — the input
    side of the end-to-end chain
    encode JPEG -> embed in PDF -> reopen PDF -> pull XObject ->
    Huffman+IDCT decode -> stats, all in-engine and SQL-verifiable."""
    docs = documents.select(F.col("doc_id").cast("long").alias("doc_id"))
    n_parts = documents.sparkSession.sparkContext.defaultParallelism
    schema = "doc_id string, pdf_bytes binary"

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..kernels.write import spans_to_pdf

        for pdf in batches:
            out = {"doc_id": [], "pdf_bytes": []}
            for (doc_id,) in pdf.itertuples(index=False):
                d = int(doc_id)
                page = [
                    {"kind": "text", "text": f"doc {d}\n", "media_ref": None},
                    {"kind": "media_ref", "text": None, "media_ref": "img00"},
                ]
                out["doc_id"].append(str(d))
                out["pdf_bytes"].append(
                    spans_to_pdf(
                        [page], media_payloads={"img00": _tile_jpeg(d)}
                    )
                )
            yield pd.DataFrame(out)

    return docs.repartition(n_parts, "doc_id").mapInPandas(gen, schema=schema)


def write_pdfs_with_jp2_media(documents: DataFrame) -> DataFrame:
    """documents -> pdf_raw where each doc embeds ONE JPEG 2000
    payload ('img00', /Filter /JPXDecode — the reference's passthrough
    filter) at the synthesize_jp2_media formulas: the end-to-end
    chain  build jp2 -> embed as JPX XObject -> reopen the PDF ->
    pull the payload -> header parse -> dims/bits, all in-engine and
    SQL-verifiable. Layout rotates d%3 so the codestream, container
    and XLBox paths all survive the PDF round-trip byte-exactly."""
    docs = documents.select(F.col("doc_id").cast("long").alias("doc_id"))
    n_parts = documents.sparkSession.sparkContext.defaultParallelism
    schema = "doc_id string, pdf_bytes binary"

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..kernels.write import spans_to_pdf
        from ..testing.imagegen import make_jp2

        for pdf in batches:
            out = {"doc_id": [], "pdf_bytes": []}
            for (doc_id,) in pdf.itertuples(index=False):
                d = int(doc_id)
                page = [
                    {"kind": "text", "text": f"doc {d}\n", "media_ref": None},
                    {"kind": "media_ref", "text": None, "media_ref": "img00"},
                ]
                payload = make_jp2(
                    20 + d % 40, 10 + d % 20,
                    n_components=1 + (d % 2) * 2,
                    bit_depth=(8, 10, 12, 16)[d % 4],
                    kind=("j2k", "jp2", "jp2xl")[d % 3],
                )
                out["doc_id"].append(str(d))
                out["pdf_bytes"].append(
                    spans_to_pdf([page], media_payloads={"img00": payload})
                )
            yield pd.DataFrame(out)

    return docs.repartition(n_parts, "doc_id").mapInPandas(gen, schema=schema)


def _make_feature_batches(pixel_formats: "set | None" = None):
    def _feature_batches(
        batches: Iterator[pd.DataFrame],
    ) -> Iterator[pd.DataFrame]:
        decoders = dict(DECODERS)
        decoders["image"] = lambda p: _decode_image(p, pixel_formats)
        for pdf in batches:
            out = {k.name: [] for k in FEATURE_SCHEMA.fields}
            for row in pdf.itertuples(index=False):
                payload = bytes(row.payload) if row.payload is not None else b""
                decoder = decoders.get(row.modality)
                try:
                    meta = decoder(payload) if decoder else {}
                except Exception:
                    # quarantine discipline: a corrupt payload (e.g. a G4
                    # TIFF with a truncated/garbled bitstream) yields empty
                    # features, never a dead task
                    meta = {}
                out["doc_id"].append(row.doc_id)
                out["media_ref"].append(row.media_ref)
                out["modality"].append(row.modality)
                out["format"].append(meta.get("format"))
                out["width"].append(meta.get("width"))
                out["height"].append(meta.get("height"))
                out["n_bytes"].append(len(payload))
                out["sha8"].append(hashlib.sha256(payload).hexdigest()[:8])
                out["ink_ratio"].append(meta.get("ink_ratio"))
                out["duration_ms"].append(meta.get("duration_ms"))
                out["sample_rate"].append(meta.get("sample_rate"))
                out["mean_luma"].append(meta.get("mean_luma"))
                out["n_frames"].append(meta.get("n_frames"))
                out["bits"].append(meta.get("bits"))
            yield pd.DataFrame(out)

    return _feature_batches


_feature_batches = _make_feature_batches()


def extract_media_features(
    media: DataFrame, pixel_formats: "set | None" = None
) -> DataFrame:
    """Arrow-batched feature extraction (decode -> dims/digest).

    `pixel_formats`: None = global SPARKPDF_PIXEL_STATS knob; a set
    (usually pixel_stats_policy(...)["decode_formats"]) = decode pixel
    statistics only for those image formats, header-only otherwise."""
    return media.mapInPandas(
        _make_feature_batches(pixel_formats), schema=FEATURE_SCHEMA
    )


AUDIO_PCM_SCHEMA = StructType(
    [
        StructField("doc_id", StringType()),
        StructField("media_ref", StringType()),
        # Long, not Integer: an 8-bit WAV near the 4 GB RIFF limit holds
        # >2^31 samples; an int32 Arrow conversion would raise OUTSIDE
        # the per-row try/except and break the quarantine contract
        StructField("n_samples", LongType()),
        StructField("rms", DoubleType()),
        StructField("peak", DoubleType()),
        StructField("mean", DoubleType()),
        StructField("error", StringType()),
    ]
)


def extract_audio_pcm_features(media: DataFrame) -> DataFrame:
    """REAL sample-level audio features (round 6 — upgrades the audio
    lane beyond container headers): per payload, decode every sample
    of a WAV body (linear PCM 8/16/24/32-bit, IEEE float32, G.711
    A-law/mu-law — kernels/media.wav_pcm_stats) or a FLAC stream
    (round 7 — CONSTANT/VERBATIM/FIXED/LPC subframes, rice residuals,
    stereo decorrelation, CRC-verified — kernels/media.flac_pcm_stats,
    dispatched on magic) and emit n_samples + normalized
    rms/peak/mean. Unsupported-codec payloads quarantine via the
    error column — never a raise, never a dropped row (the
    extract_doc contract). Arrow-batched mapInPandas."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..kernels.media import (
            aiff_pcm_stats,
            au_pcm_stats,
            flac_pcm_stats,
            mp4_pcm_stats,
            ogg_flac_pcm_stats,
            wav_pcm_stats,
        )

        for pdf in batches:
            out = {k.name: [] for k in AUDIO_PCM_SCHEMA.fields}
            for doc_id, media_ref, payload in zip(
                pdf["doc_id"], pdf["media_ref"], pdf["payload"]
            ):
                out["doc_id"].append(str(doc_id))
                out["media_ref"].append(str(media_ref))
                stats, err = None, None
                try:
                    raw = bytes(payload)
                    # magic dispatch (round 7): RIFF -> WAV lane
                    # (incl. ADPCM), fLaC -> FLAC frame decode,
                    # FORM/AIFF -> big-endian AIFF, .snd -> Sun AU;
                    # all share the normalized
                    # {n_samples, rms, peak, mean} contract
                    if raw[:4] == b"fLaC":
                        stats = flac_pcm_stats(raw)
                    elif raw[:4] == b"OggS":
                        stats = ogg_flac_pcm_stats(raw)
                    elif raw[:4] == b"FORM":
                        stats = aiff_pcm_stats(raw)
                    elif raw[:4] == b".snd":
                        stats = au_pcm_stats(raw)
                    elif raw[4:8] == b"ftyp":
                        stats = mp4_pcm_stats(raw)
                    else:
                        stats = wav_pcm_stats(raw)
                    if stats is None:
                        err = (
                            "unsupported audio payload (not PCM/float/"
                            "G.711/ADPCM WAV, AIFF, AU, or decodable "
                            "native/Ogg FLAC)"
                        )
                except Exception as e:  # poison payloads quarantine
                    err = f"{type(e).__name__}: {e}"
                out["n_samples"].append(
                    int(stats["n_samples"]) if stats else None
                )
                out["rms"].append(stats["rms"] if stats else None)
                out["peak"].append(stats["peak"] if stats else None)
                out["mean"].append(stats["mean"] if stats else None)
                out["error"].append(err)
            yield pd.DataFrame(out)

    return media.select("doc_id", "media_ref", "payload").mapInPandas(
        gen, schema=AUDIO_PCM_SCHEMA
    )


def synthesize_wav_pcm_media(documents: DataFrame) -> DataFrame:
    """documents -> one REAL WAV per doc (doc_id % 6) whose waveform
    has a CLOSED-FORM rms/peak/mean the oracle restates in SQL while
    the engine must parse the RIFF chunks and decode every sample:
      0: 16-bit PCM square wave, A = 4096*(1 + d%7)
         -> rms = peak = A/32768 (exact eighths), n = 2*(100 + d%250)
      1: 8-bit PCM square wave, A = 2*(1 + d%63)
         -> rms = peak = A/128, n = 2*(50 + d%200)
      2: G.711 mu-law, bytes 0x80/0x00 -> +-32124
         -> rms = peak = 32124/32768, n = 2*(60 + d%100)
      3: G.711 A-law, bytes 0xAA/0x2A -> +-32256
         -> rms = peak = 32256/32768, n = 2*(60 + d%100)
      4: 24-bit PCM square, A = 2^20*(1 + d%7)
         -> rms = peak = A/2^23 (exact eighths), n = 2*(40 + d%80)
      5: IEEE float32 square, amp = 0.125*(1 + d%7) (exact binary)
         -> rms = peak = amp, n = 2*(30 + d%60)
    All squares alternate +A/-A over an even frame count, so mean is
    exactly 0; amplitudes are picked so every 6-dp round is exact on
    both engines (terminating binary fractions)."""
    ids = documents.select(F.col("doc_id").cast("long").alias("doc_id"))
    n_parts = documents.sparkSession.sparkContext.defaultParallelism
    schema = "doc_id string, media_ref string, modality string, payload binary"

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import struct

        from ..testing.imagegen import make_wav

        for pdf in batches:
            out = {"doc_id": [], "media_ref": [], "modality": [], "payload": []}
            for (doc_id,) in pdf.itertuples(index=False):
                d = int(doc_id)
                v = d % 6
                rate = 8000 + (d % 8) * 1000
                if v == 0:
                    amp = 4096 * (1 + d % 7)
                    n = 2 * (100 + d % 250)
                    data = struct.pack(
                        f"<{n}h", *([amp, -amp] * (n // 2))
                    )
                    wav = make_wav(rate, 0, bits=16, data=data)
                elif v == 1:
                    amp = 2 * (1 + d % 63)
                    n = 2 * (50 + d % 200)
                    data = bytes([128 + amp, 128 - amp] * (n // 2))
                    wav = make_wav(rate, 0, bits=8, data=data)
                elif v == 2:
                    n = 2 * (60 + d % 100)
                    data = bytes([0x80, 0x00] * (n // 2))
                    wav = make_wav(rate, 0, bits=8, data=data, fmt_code=7)
                elif v == 3:
                    n = 2 * (60 + d % 100)
                    data = bytes([0xAA, 0x2A] * (n // 2))
                    wav = make_wav(rate, 0, bits=8, data=data, fmt_code=6)
                elif v == 4:
                    amp = (1 << 20) * (1 + d % 7)
                    n = 2 * (40 + d % 80)
                    pos = amp.to_bytes(3, "little", signed=True)
                    neg = (-amp).to_bytes(3, "little", signed=True)
                    data = (pos + neg) * (n // 2)
                    wav = make_wav(rate, 0, bits=24, data=data)
                else:
                    amp = 0.125 * (1 + d % 7)
                    n = 2 * (30 + d % 60)
                    data = struct.pack(
                        f"<{n}f", *([amp, -amp] * (n // 2))
                    )
                    wav = make_wav(rate, 0, bits=32, data=data,
                                   fmt_code=3)
                out["doc_id"].append(str(d))
                out["media_ref"].append(f"wav-{d}")
                out["modality"].append("audio")
                out["payload"].append(wav)
            yield pd.DataFrame(out)

    return ids.repartition(n_parts, "doc_id").mapInPandas(gen, schema=schema)


def synthesize_flac_pcm_media(documents: DataFrame) -> DataFrame:
    """documents -> one REAL FLAC per doc (doc_id % 6) covering the
    codec surface — the engine must parse STREAMINFO, frame headers,
    subframes, rice residuals and stereo decorrelation (CRCs and all)
    to recover waveforms whose stats the oracle restates in SQL:
      0: CONSTANT subframe, 16-bit, A = 1024*(1 + d%7)
         -> rms = peak = mean = A/32768, n = 100 + d%250
      1: VERBATIM square +-A, A = 4096*(1 + d%7)
         -> rms = peak = A/32768, mean 0, n = 2*(50 + d%200)
      2: FIXED-2 square (partition order 1), same A
         -> same closed form, n = 2*(60 + d%100)
      3: LPC (order 1, shift 2) square, 24-bit, A = 2^20*(1 + d%7)
         -> rms = peak = A/2^23 = 0.125*(1 + d%7), n = 2*(40 + d%80)
      4: MID-SIDE stereo, L = +A / R = -A constant, A = 4096*(1+d%7)
         -> rms = peak = A/32768, mean 0, n = 2*(60 + d%100)
      5: 8-bit square with ESCAPED rice partitions, A = 2*(1 + d%31)
         -> rms = peak = A/128, mean 0, n = 2*(50 + d%200)
    Amplitudes are terminating binary fractions (exact 6-dp rounds on
    both engines); FLAC is lossless, so decode is exact by
    construction."""
    ids = documents.select(F.col("doc_id").cast("long").alias("doc_id"))
    n_parts = documents.sparkSession.sparkContext.defaultParallelism
    schema = "doc_id string, media_ref string, modality string, payload binary"

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..testing.imagegen import encode_flac

        for pdf in batches:
            out = {"doc_id": [], "media_ref": [], "modality": [], "payload": []}
            for (doc_id,) in pdf.itertuples(index=False):
                d = int(doc_id)
                v = d % 6
                rate = 8000 + (d % 8) * 1000
                if v == 0:
                    amp = 1024 * (1 + d % 7)
                    n = 100 + d % 250
                    blob = encode_flac([amp] * n, rate,
                                       subframe="constant")
                elif v == 1:
                    amp = 4096 * (1 + d % 7)
                    n = 2 * (50 + d % 200)
                    blob = encode_flac([amp, -amp] * (n // 2), rate,
                                       subframe="verbatim")
                elif v == 2:
                    amp = 4096 * (1 + d % 7)
                    n = 2 * (60 + d % 100)
                    blob = encode_flac([amp, -amp] * (n // 2), rate,
                                       subframe="fixed2",
                                       partition_order=1)
                elif v == 3:
                    amp = (1 << 20) * (1 + d % 7)
                    n = 2 * (40 + d % 80)
                    blob = encode_flac([amp, -amp] * (n // 2), rate,
                                       bits=24, subframe="lpc1")
                elif v == 4:
                    amp = 4096 * (1 + d % 7)
                    n = 2 * (60 + d % 100)
                    blob = encode_flac([amp, -amp] * (n // 2), rate,
                                       channels=2,
                                       stereo_mode="mid-side",
                                       subframe="constant")
                else:
                    amp = 2 * (1 + d % 31)
                    n = 2 * (50 + d % 200)
                    blob = encode_flac([amp, -amp] * (n // 2), rate,
                                       bits=8, subframe="fixed1",
                                       rice_escape=True)
                out["doc_id"].append(str(d))
                out["media_ref"].append(f"flac-{d}")
                out["modality"].append("audio")
                out["payload"].append(blob)
            yield pd.DataFrame(out)

    return ids.repartition(n_parts, "doc_id").mapInPandas(gen, schema=schema)


def extract_attachment_media(pdf_raw: DataFrame) -> DataFrame:
    """pdf_raw -> media(doc_id, media_ref, modality, payload, error):
    pulls every EMBEDDED FILE (the catalog /Names /EmbeddedFiles tree,
    read side of the reference's addAttachment) out of each document
    and sniffs its modality from payload magic — RIFF/WAVE, fLaC,
    FORM/AIFF and .snd are audio; RIFF/AVI and ISO-BMFF ftyp are
    video; JPEG/PNG/GIF/TIFF magics are image; anything else is
    'other'. This is the bridge that feeds PDF-attached media into
    the same sample-decode pipelines as standalone payloads.
    Quarantine contract: an unparseable document yields ONE row with
    the error set, never a dropped doc."""

    def sniff(raw: bytes) -> str:
        if raw[:4] == b"RIFF":
            if raw[8:12] == b"WAVE":
                return "audio"
            if raw[8:12] == b"AVI ":
                return "video"
        if (raw[:4] in (b"fLaC", b".snd", b"OggS")
                or (raw[:4] == b"FORM"
                    and raw[8:12] in (b"AIFF", b"AIFC"))):
            return "audio"
        if raw[4:8] == b"ftyp":
            # ISO-BMFF carries either modality: route by the hdlr
            # handler fourcc ('soun' tracks only -> audio)
            return ("audio" if b"soun" in raw and b"vide" not in raw
                    else "video")
        if raw[:4] == b"\x1a\x45\xdf\xa3":
            return "video"
        if (raw[:3] == b"\xff\xd8\xff" or raw[:4] == b"\x89PNG"
                or raw[:4] == b"GIF8"
                or raw[:4] in (b"II*\x00", b"MM\x00*")):
            return "image"
        return "other"

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..kernels.document import PdfDocument

        cols = ("doc_id", "media_ref", "modality", "payload", "error")
        for pdf in batches:
            out = {k: [] for k in cols}
            for doc_id, blob in zip(pdf["doc_id"], pdf["pdf_bytes"]):
                try:
                    doc = PdfDocument(bytes(blob))
                    for a in doc.attachments():
                        data = a["data"]
                        out["doc_id"].append(str(doc_id))
                        out["media_ref"].append(a["filename"])
                        out["modality"].append(
                            sniff(data) if data else None)
                        out["payload"].append(data)
                        out["error"].append(
                            None if data is not None
                            else "undecodable attachment stream")
                except Exception as exc:  # quarantine, never drop
                    out["doc_id"].append(str(doc_id))
                    out["media_ref"].append(None)
                    out["modality"].append(None)
                    out["payload"].append(None)
                    out["error"].append(
                        f"{type(exc).__name__}: {exc}"[:500])
            yield pd.DataFrame(out)

    return pdf_raw.select("doc_id", "pdf_bytes").mapInPandas(
        gen, schema=MEDIA_PAYLOAD_SCHEMA
    )


def synthesize_attachment_pdf_media(documents: DataFrame) -> DataFrame:
    """documents -> pdf_raw(doc_id, pdf_bytes) where each PDF carries
    the doc's synthesize_wav_pcm_media waveform as an EMBEDDED FILE
    (catalog /Names /EmbeddedFiles, the write side the reference
    calls addAttachment). The end-to-end contract: PDF byte
    serialization -> xref/COS parse -> name-tree walk -> Flate stream
    decode -> RIFF chunk walk -> per-sample PCM/G.711 decode, all
    under the SAME closed-form oracle as wav_pcm_stats."""
    wavs = synthesize_wav_pcm_media(documents)
    n_parts = documents.sparkSession.sparkContext.defaultParallelism

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..kernels.write import spans_to_pdf

        for pdf in batches:
            out = {"doc_id": [], "pdf_bytes": []}
            for doc_id, media_ref, payload in zip(
                pdf["doc_id"], pdf["media_ref"], pdf["payload"]
            ):
                d = str(doc_id)
                page = [{"kind": "text", "text": f"audio host {d}",
                         "media_ref": None}]
                out["doc_id"].append(d)
                out["pdf_bytes"].append(spans_to_pdf(
                    [page], title=f"att-{d}",
                    attachments=[(f"{media_ref}.wav", bytes(payload))],
                ))
            yield pd.DataFrame(out)

    return wavs.repartition(n_parts, "doc_id").mapInPandas(
        gen, schema="doc_id string, pdf_bytes binary"
    )


VIDEO_FRAME_SCHEMA = StructType(
    [
        StructField("doc_id", StringType()),
        StructField("media_ref", StringType()),
        StructField("frame_idx", IntegerType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("mean_luma", DoubleType()),
        StructField("error", StringType()),
    ]
)


def extract_video_frame_features(media: DataFrame) -> DataFrame:
    """REAL per-frame video decode (round 7 — upgrades the video lane
    beyond container headers): MJPEG payloads in BOTH classic
    containers — RIFF/AVI (LIST movi chunk walk) and ISO-BMFF MP4
    (full stsd/stsc/stco/stsz sample-table demux) — decode through
    the from-scratch JPEG kernel, emitting one row per frame
    (frame_idx, dims, mean luma). Undecodable payloads emit a
    single quarantine row with the error column set — never a raise,
    never a dropped doc (the extract_doc contract). Arrow-batched
    mapInPandas; per-frame rows explode kernel-side so Spark never
    ships pixel arrays."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..kernels.media import (
            avi_mjpeg_frames,
            mkv_mjpeg_frames,
            mp4_mjpeg_frames,
        )

        for pdf in batches:
            out = {k.name: [] for k in VIDEO_FRAME_SCHEMA.fields}
            for doc_id, media_ref, payload in zip(
                pdf["doc_id"], pdf["media_ref"], pdf["payload"]
            ):
                frames, err = None, None
                try:
                    raw = bytes(payload)
                    if raw[4:8] == b"ftyp":
                        frames = mp4_mjpeg_frames(raw)
                    elif raw[:4] == b"\x1a\x45\xdf\xa3":
                        frames = mkv_mjpeg_frames(raw)
                    else:
                        frames = avi_mjpeg_frames(raw)
                    if frames is None:
                        err = ("unsupported video payload (not an AVI/"
                               "MP4/MKV with decodable MJPEG frames)")
                except Exception as e:  # poison payloads quarantine
                    err = f"{type(e).__name__}: {e}"
                for row in (frames if frames else [None]):
                    out["doc_id"].append(str(doc_id))
                    out["media_ref"].append(str(media_ref))
                    out["frame_idx"].append(
                        row["frame_idx"] if row else None)
                    out["width"].append(row["width"] if row else None)
                    out["height"].append(row["height"] if row else None)
                    out["mean_luma"].append(
                        row["mean_luma"] if row else None)
                    out["error"].append(err)
            yield pd.DataFrame(out)

    return media.select("doc_id", "media_ref", "payload").mapInPandas(
        gen, schema=VIDEO_FRAME_SCHEMA
    )


AUDIO_SEGMENT_SCHEMA = StructType(
    [
        StructField("doc_id", StringType()),
        StructField("media_ref", StringType()),
        StructField("seg_idx", IntegerType()),
        StructField("n_samples", LongType()),
        StructField("rms", DoubleType()),
        StructField("peak", DoubleType()),
        StructField("mean", DoubleType()),
        StructField("error", StringType()),
    ]
)


def extract_audio_segments(media: DataFrame,
                           segment_samples: int = 64) -> DataFrame:
    """Per-segment audio features (round 7): each WAV payload's
    decoded sample stream sliced into fixed windows, one row per
    segment with the exact-int stats contract — the audio analog of
    per-frame video rows, feeding windowed analytics (silence spans,
    loudness segmentation). Undecodable payloads emit a single
    quarantine row; Arrow-batched mapInPandas, rows explode
    kernel-side."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..kernels.media import wav_pcm_segment_stats

        for pdf in batches:
            out = {k.name: [] for k in AUDIO_SEGMENT_SCHEMA.fields}
            for doc_id, media_ref, payload in zip(
                pdf["doc_id"], pdf["media_ref"], pdf["payload"]
            ):
                segs, err = None, None
                try:
                    segs = wav_pcm_segment_stats(bytes(payload),
                                                 segment_samples)
                    if segs is None:
                        err = ("unsupported audio payload (not a "
                               "decodable WAV)")
                except Exception as e:  # poison payloads quarantine
                    err = f"{type(e).__name__}: {e}"
                for st in (segs if segs else [None]):
                    out["doc_id"].append(str(doc_id))
                    out["media_ref"].append(str(media_ref))
                    out["seg_idx"].append(
                        st["seg_idx"] if st else None)
                    out["n_samples"].append(
                        int(st["n_samples"]) if st else None)
                    out["rms"].append(st["rms"] if st else None)
                    out["peak"].append(st["peak"] if st else None)
                    out["mean"].append(st["mean"] if st else None)
                    out["error"].append(err)
            yield pd.DataFrame(out)

    return media.select("doc_id", "media_ref", "payload").mapInPandas(
        gen, schema=AUDIO_SEGMENT_SCHEMA
    )


def detect_silence_spans(segments: DataFrame,
                         rms_threshold: float = 0.01) -> DataFrame:
    """Silence-span detection (round 7): gaps-and-islands over the
    per-segment rows — silent segments (rms <= threshold) group into
    maximal consecutive runs via the classic seg_idx - row_number
    trick, all JVM-side (one window + one partial-agg groupBy, both
    partitioned by document, so no global sort and skew bounded by
    the longest single recording)."""
    from pyspark.sql import Window

    w = Window.partitionBy("doc_id", "media_ref").orderBy("seg_idx")
    silent = (
        segments.filter(F.col("error").isNull()
                        & (F.col("rms") <= F.lit(rms_threshold)))
        .withColumn("grp", F.col("seg_idx")
                    - F.row_number().over(w))
    )
    return (
        silent.groupBy("doc_id", "media_ref", "grp")
        .agg(F.min("seg_idx").alias("span_start"),
             F.max("seg_idx").alias("span_end"),
             F.count("*").alias("n_segs"))
        .drop("grp")
    )


def detect_scene_cuts(frames: DataFrame,
                      threshold: float = 60.0) -> DataFrame:
    """Scene-cut detection over decoded video frames (round 7): a
    JVM-side lag window per (doc_id, media_ref) ordered by frame_idx
    flags frames whose mean-luma jump from the previous frame meets
    `threshold`. Composes with extract_video_frame_features — the
    Python boundary ends at pixel decode; the analytics stay in
    whole-stage codegen. Scale: the window partitions by document
    (bounded frames per doc), so no global sort and no skew beyond
    the longest single video."""
    from pyspark.sql import Window

    w = Window.partitionBy("doc_id", "media_ref").orderBy("frame_idx")
    prev = F.lag("mean_luma").over(w)
    return (
        frames.filter(F.col("error").isNull())
        .withColumn("prev_luma", prev)
        .withColumn("delta", F.col("mean_luma") - F.col("prev_luma"))
        .filter(F.col("prev_luma").isNotNull()
                & (F.abs(F.col("delta")) >= F.lit(threshold)))
        .select("doc_id", "media_ref", "frame_idx", "mean_luma",
                "prev_luma", "delta")
    )


def synthesize_mjpeg_media(documents: DataFrame) -> DataFrame:
    """documents -> one REAL movie per doc, container/codec rotating
    by d%5 (0 -> RIFF/AVI MJPEG with movi chunks + idx1; 1 -> ISO-BMFF
    MP4 MJPEG with a full stsd/stsc/stco/stsz sample table, 2 samples
    per chunk so a short last chunk exercises real sample-to-chunk
    resolution; 2 -> Matroska with a V_MJPEG TrackEntry and one
    SimpleBlock per frame; 3 -> AVI UNCOMPRESSED 24-bit BI_RGB DIB,
    top-down when d is odd; 4 -> AVI UNCOMPRESSED 8-bit palettized
    DIB over the gray-identity palette — round 7 widens the video
    lane beyond MJPEG): nf = 1 + d%5 uniform gray frames at value
    g_i = 16 + 2*((d + 37*i) % 112) — EVEN gray values survive the
    Annex-K DC quantizer exactly (DC = 8*(g-128) with quantizer 16
    needs (g-128) even), and DIB decode is lossless for any value,
    so each decoded frame's mean luma is its planted gray value
    bit-for-bit. Dims (16 + 8*(d%4)) x (8 + 8*(d%3)) exercise
    non-square tiles and real DIB row padding (24-bit rows of
    widths 24/40 are 72/120 bytes — not multiples of 4). The
    frame formulas are container/codec-independent, so ONE
    generate_series oracle covers every demux+decode path."""
    ids = documents.select(F.col("doc_id").cast("long").alias("doc_id"))
    n_parts = documents.sparkSession.sparkContext.defaultParallelism
    schema = "doc_id string, media_ref string, modality string, payload binary"

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from ..kernels.jpeg import encode_jpeg
        from ..testing.imagegen import (
            make_avi,
            make_mkv_mjpeg,
            make_mp4_mjpeg,
        )

        for pdf in batches:
            out = {"doc_id": [], "media_ref": [], "modality": [], "payload": []}
            for (doc_id,) in pdf.itertuples(index=False):
                d = int(doc_id)
                nf = 1 + d % 5
                w = 16 + 8 * (d % 4)
                h = 8 + 8 * (d % 3)
                grays = [16 + 2 * ((d + 37 * i) % 112)
                         for i in range(nf)]
                lane = d % 5
                if lane in (3, 4):  # uncompressed DIB lanes (round 7)
                    tiles = [np.full((h, w), g, dtype=np.uint8)
                             for g in grays]
                    blob = make_avi(
                        w, h, 0, fps=25, dib_frames=tiles,
                        dib_bits=24 if lane == 3 else 8,
                        topdown=(lane == 3 and d % 2 == 1))
                else:
                    frames = [
                        encode_jpeg(np.full((h, w), g, dtype=np.uint8))
                        for g in grays
                    ]
                    if lane == 1:
                        blob = make_mp4_mjpeg(w, h, frames,
                                              samples_per_chunk=2)
                    elif lane == 2:
                        blob = make_mkv_mjpeg(w, h, frames)
                    else:
                        blob = make_avi(w, h, 0, fps=25, frames=frames)
                out["doc_id"].append(str(d))
                out["media_ref"].append(f"mjpeg-{d}")
                out["modality"].append("video")
                out["payload"].append(blob)
            yield pd.DataFrame(out)

    return ids.repartition(n_parts, "doc_id").mapInPandas(gen, schema=schema)


def synthesize_bigendian_audio_media(documents: DataFrame) -> DataFrame:
    """documents -> one REAL AIFF/AIFF-C or Sun AU payload per doc
    (doc_id % 8) with closed-form waveforms (k = 1 + d%7; squares
    alternate so mean is exactly 0 and every 6-dp round is exact on
    both engines):
      0: AIFF 16-bit BE square, A = 4096k -> rms = peak = k/8,
         n = 2*(50 + d%200)
      1: AIFF 8-bit SIGNED square (AIFF is signed at every depth),
         A = 2*(1 + d%63) -> A/128, n = 2*(40 + d%120)
      2: AIFF 24-bit STEREO (L=+A, R=-A constant), A = 2^20*k
         -> 0.125k, n = 2*(30 + d%90) total samples
      3: AU 16-bit BE square, A = 4096k -> k/8, n = 2*(60 + d%100)
      4: AU G.711 mu-law 0x80/0x00 -> +-32124, n = 2*(60 + d%100)
      5: AU G.711 A-law 0xAA/0x2A -> +-32256, n = 2*(60 + d%100)
      6: AIFF-C 'sowt' (LITTLE-endian 16-bit inside the BE
         container), A = 4096k -> k/8, n = 2*(50 + d%150)
      7: AIFF-C 'ulaw' 0x80/0x00 -> +-32124, n = 2*(40 + d%120)
    The engine must walk IFF chunks (COMM's 80-bit extended rate,
    the AIFC compression fourcc, SSND offset) or the .snd header and
    decode the samples to match the oracle's restated formulas."""
    ids = documents.select(F.col("doc_id").cast("long").alias("doc_id"))
    n_parts = documents.sparkSession.sparkContext.defaultParallelism
    schema = "doc_id string, media_ref string, modality string, payload binary"

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import struct

        from ..testing.imagegen import make_aiff, make_au

        for pdf in batches:
            out = {"doc_id": [], "media_ref": [], "modality": [], "payload": []}
            for (doc_id,) in pdf.itertuples(index=False):
                d = int(doc_id)
                v = d % 8
                k = 1 + d % 7
                rate = 8000 + (d % 8) * 1000
                if v == 0:
                    amp = 4096 * k
                    n = 2 * (50 + d % 200)
                    blob = make_aiff(rate, 1, 16, struct.pack(
                        f">{n}h", *([amp, -amp] * (n // 2))))
                elif v == 1:
                    amp = 2 * (1 + d % 63)
                    n = 2 * (40 + d % 120)
                    blob = make_aiff(rate, 1, 8, struct.pack(
                        f">{n}b", *([amp, -amp] * (n // 2))))
                elif v == 2:
                    amp = (1 << 20) * k
                    n = 2 * (30 + d % 90)
                    pos = amp.to_bytes(3, "big", signed=True)
                    neg = (-amp).to_bytes(3, "big", signed=True)
                    blob = make_aiff(rate, 2, 24, (pos + neg) * (n // 2))
                elif v == 3:
                    amp = 4096 * k
                    n = 2 * (60 + d % 100)
                    blob = make_au(rate, 1, 3, struct.pack(
                        f">{n}h", *([amp, -amp] * (n // 2))))
                elif v == 4:
                    n = 2 * (60 + d % 100)
                    blob = make_au(rate, 1, 1, bytes([0x80, 0x00] * (n // 2)))
                elif v == 5:
                    n = 2 * (60 + d % 100)
                    blob = make_au(rate, 1, 27, bytes([0xAA, 0x2A] * (n // 2)))
                elif v == 6:
                    amp = 4096 * k
                    n = 2 * (50 + d % 150)
                    blob = make_aiff(rate, 1, 16, struct.pack(
                        f"<{n}h", *([amp, -amp] * (n // 2))),
                        compression=b"sowt")
                else:
                    n = 2 * (40 + d % 120)
                    blob = make_aiff(rate, 1, 8,
                                     bytes([0x80, 0x00] * (n // 2)),
                                     compression=b"ulaw")
                out["doc_id"].append(str(d))
                out["media_ref"].append(f"be-audio-{d}")
                out["modality"].append("audio")
                out["payload"].append(blob)
            yield pd.DataFrame(out)

    return ids.repartition(n_parts, "doc_id").mapInPandas(gen, schema=schema)


def synthesize_segmented_wav_media(documents: DataFrame) -> DataFrame:
    """documents -> one 16-bit WAV per doc whose waveform alternates
    LOUD and SILENT blocks exactly aligned to 64-sample segments:
    r = 1 + d%3 repeats of [L = 2 + d%3 loud segments (square +-A,
    A = 4096k, k = 1 + d%7)] + [Q = 1 + d%2 zero segments]. Every
    segment is full, loud segments have rms = peak = k/8 / mean 0 and
    silent ones are exactly 0 — closed forms for BOTH the
    per-segment query and the silence-span islands."""
    ids = documents.select(F.col("doc_id").cast("long").alias("doc_id"))
    n_parts = documents.sparkSession.sparkContext.defaultParallelism
    schema = "doc_id string, media_ref string, modality string, payload binary"

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import struct

        from ..testing.imagegen import make_wav

        for pdf in batches:
            out = {"doc_id": [], "media_ref": [], "modality": [], "payload": []}
            for (doc_id,) in pdf.itertuples(index=False):
                d = int(doc_id)
                k = 1 + d % 7
                amp = 4096 * k
                r = 1 + d % 3
                loud_segs = 2 + d % 3
                quiet_segs = 1 + d % 2
                vals = ((([amp, -amp] * 32) * loud_segs
                         + [0] * (64 * quiet_segs)) * r)
                data = struct.pack(f"<{len(vals)}h", *vals)
                out["doc_id"].append(str(d))
                out["media_ref"].append(f"seg-wav-{d}")
                out["modality"].append("audio")
                out["payload"].append(
                    make_wav(8000 + (d % 8) * 1000, 0, bits=16,
                             data=data))
            yield pd.DataFrame(out)

    return ids.repartition(n_parts, "doc_id").mapInPandas(gen, schema=schema)


def synthesize_mp4_pcm_media(documents: DataFrame) -> DataFrame:
    """documents -> one REAL PCM-in-MP4 movie per doc (doc_id % 4),
    QuickTime uncompressed sample entries over closed-form squares
    (k = 1 + d%7; mean exactly 0 except the raw variant's midpoint):
      0: 'sowt' LE 16-bit, A = 4096k, n = 2*(50 + d%200)
      1: 'twos' BE 16-bit, A = 4096k, n = 2*(60 + d%100)
      2: 'in24' BE 24-bit STEREO L=+A/R=-A, A = 2^20*k,
         n = 2*(40 + d%80) total samples
      3: 'raw ' unsigned 8-bit, A = 2*(1 + d%63), n = 2*(50 + d%120)
    The table samples hold 64 PCM frames each (2 per chunk), so the
    engine exercises real stsc/stco/stsz resolution per §8.7."""
    ids = documents.select(F.col("doc_id").cast("long").alias("doc_id"))
    n_parts = documents.sparkSession.sparkContext.defaultParallelism
    schema = "doc_id string, media_ref string, modality string, payload binary"

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import struct

        from ..testing.imagegen import make_mp4_pcm

        for pdf in batches:
            out = {"doc_id": [], "media_ref": [], "modality": [], "payload": []}
            for (doc_id,) in pdf.itertuples(index=False):
                d = int(doc_id)
                v = d % 4
                k = 1 + d % 7
                rate = 8000 + (d % 8) * 1000
                if v == 0:
                    n = 2 * (50 + d % 200)
                    amp = 4096 * k
                    blob = make_mp4_pcm(rate, 1, b"sowt", struct.pack(
                        f"<{n}h", *([amp, -amp] * (n // 2))))
                elif v == 1:
                    n = 2 * (60 + d % 100)
                    amp = 4096 * k
                    blob = make_mp4_pcm(rate, 1, b"twos", struct.pack(
                        f">{n}h", *([amp, -amp] * (n // 2))))
                elif v == 2:
                    n = 2 * (40 + d % 80)
                    amp = (1 << 20) * k
                    pos = amp.to_bytes(3, "big", signed=True)
                    neg = (-amp).to_bytes(3, "big", signed=True)
                    blob = make_mp4_pcm(rate, 2, b"in24",
                                        (pos + neg) * (n // 2))
                else:
                    n = 2 * (50 + d % 120)
                    amp = 2 * (1 + d % 63)
                    blob = make_mp4_pcm(rate, 1, b"raw ", bytes(
                        [128 + amp, 128 - amp] * (n // 2)))
                out["doc_id"].append(str(d))
                out["media_ref"].append(f"mp4-pcm-{d}")
                out["modality"].append("audio")
                out["payload"].append(blob)
            yield pd.DataFrame(out)

    return ids.repartition(n_parts, "doc_id").mapInPandas(gen, schema=schema)


def synthesize_ogg_flac_media(documents: DataFrame) -> DataFrame:
    """documents -> one REAL Ogg-FLAC stream per doc (doc_id % 4),
    exercising every demux shape under closed-form waveforms
    (k = 1 + d%7; squares alternate so mean is exactly 0):
      0: one frame, one audio packet, one page (A = 4096k,
         n = 2*(50 + d%200))
      1: MULTI-FRAME (block_size 32 -> many packets packed greedily
         into pages), A = 4096k, n = 2*(60 + d%100)
      2: packet SPANNING pages (16-bit VERBATIM frame, 4-segment page
         budget -> continuation flags + lacing reassembly),
         A = 4096k, n = 2*(300 + d%300)
      3: mid-side stereo constant L=+A/R=-A, A = 4096k,
         n = 2*(60 + d%100) total samples
    All page CRCs are real and VERIFIED by the demuxer; rms = peak =
    k/8 exactly for every variant, mean 0."""
    ids = documents.select(F.col("doc_id").cast("long").alias("doc_id"))
    n_parts = documents.sparkSession.sparkContext.defaultParallelism
    schema = "doc_id string, media_ref string, modality string, payload binary"

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..testing.imagegen import make_ogg_flac

        for pdf in batches:
            out = {"doc_id": [], "media_ref": [], "modality": [], "payload": []}
            for (doc_id,) in pdf.itertuples(index=False):
                d = int(doc_id)
                v = d % 4
                amp = 4096 * (1 + d % 7)
                rate = 8000 + (d % 8) * 1000
                if v == 0:
                    n = 2 * (50 + d % 200)
                    blob = make_ogg_flac([amp, -amp] * (n // 2), rate)
                elif v == 1:
                    n = 2 * (60 + d % 100)
                    blob = make_ogg_flac([amp, -amp] * (n // 2), rate,
                                         block_size=32)
                elif v == 2:
                    n = 2 * (300 + d % 300)
                    blob = make_ogg_flac([amp, -amp] * (n // 2), rate,
                                         subframe="verbatim",
                                         max_segs_per_page=4)
                else:
                    n = 2 * (60 + d % 100)
                    blob = make_ogg_flac([amp, -amp] * (n // 2), rate,
                                         channels=2,
                                         stereo_mode="mid-side",
                                         subframe="constant")
                out["doc_id"].append(str(d))
                out["media_ref"].append(f"ogg-flac-{d}")
                out["modality"].append("audio")
                out["payload"].append(blob)
            yield pd.DataFrame(out)

    return ids.repartition(n_parts, "doc_id").mapInPandas(gen, schema=schema)


def synthesize_adpcm_media(documents: DataFrame) -> DataFrame:
    """documents -> one REAL ADPCM WAV per doc (doc_id % 4) whose
    nibble streams are constructed so the spec state machines decode
    to closed-form waveforms (k = 1 + d%7, B = 1 + d%4 blocks):
      0: IMA mono, pred A = 4096k-2 at step index 0 (step 7), bytes
         0xB3 = nibbles 3/11 -> exactly +-4 with the index pinned at 0
         -> samples per block: A, then (A+4, A) x 4g, g = 2 + d%6
      1: IMA stereo, L=+A / R=-A (A = 4096k), all-zero nibbles (step 7
         -> diff 0) -> constant; mean 0, rms = peak = A/32768 exact
      2: MS mono, coeff set 0 (256,0), delta 16 (the floor: 230*16>>8
         = 14 -> clamps back to 16), bytes 0x1F = +1/-1 -> A+16, A
         alternation after the two header samples; A = 4096k-8,
         m = 2 + d%7 data bytes
      3: MS mono, coeff set 1 (512,-256): s1 = s2 = A = 4096k keeps
         the prediction at A under zero nibbles -> constant;
         mean = rms = peak = k/8 exact, m = 1 + d%6
    The engine must parse the extended fmt chunk, walk the blocks and
    run the public adaptation tables to match; peaks are terminating
    binary fractions, means/rms mirror the kernel's exact-int
    accumulation in the oracle's CASE formulas."""
    ids = documents.select(F.col("doc_id").cast("long").alias("doc_id"))
    n_parts = documents.sparkSession.sparkContext.defaultParallelism
    schema = "doc_id string, media_ref string, modality string, payload binary"

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..testing.imagegen import (
            ima_adpcm_block,
            make_wav_adpcm,
            ms_adpcm_block,
        )

        for pdf in batches:
            out = {"doc_id": [], "media_ref": [], "modality": [], "payload": []}
            for (doc_id,) in pdf.itertuples(index=False):
                d = int(doc_id)
                v = d % 4
                k = 1 + d % 7
                blocks = 1 + d % 4
                rate = 8000 + (d % 8) * 1000
                if v == 0:
                    g = 2 + d % 6
                    ba = 4 + 4 * g
                    blk = ima_adpcm_block(
                        [4096 * k - 2], [0], bytes([0xB3]) * (4 * g))
                    wav = make_wav_adpcm(rate, 1, 17, ba, 1 + 8 * g,
                                         blk * blocks)
                elif v == 1:
                    g = 1 + d % 5
                    ba = 8 + 8 * g
                    blk = ima_adpcm_block(
                        [4096 * k, -4096 * k], [0, 0], bytes(8 * g))
                    wav = make_wav_adpcm(rate, 2, 17, ba, 1 + 8 * g,
                                         blk * blocks)
                elif v == 2:
                    m = 2 + d % 7
                    ba = 7 + m
                    blk = ms_adpcm_block(
                        [0], [16], [4096 * k - 8], [4096 * k - 8],
                        bytes([0x1F]) * m)
                    wav = make_wav_adpcm(rate, 1, 2, ba, 2 + 2 * m,
                                         blk * blocks)
                else:
                    m = 1 + d % 6
                    ba = 7 + m
                    blk = ms_adpcm_block(
                        [1], [16], [4096 * k], [4096 * k], bytes(m))
                    wav = make_wav_adpcm(rate, 1, 2, ba, 2 + 2 * m,
                                         blk * blocks)
                out["doc_id"].append(str(d))
                out["media_ref"].append(f"adpcm-{d}")
                out["modality"].append("audio")
                out["payload"].append(wav)
            yield pd.DataFrame(out)

    return ids.repartition(n_parts, "doc_id").mapInPandas(gen, schema=schema)


def sniff_image_format(payload_col) -> "F.Column":
    """JVM-side image-format sniff from payload magic bytes — lets the
    policy aggregate per-format byte totals without any Python decode:
    jpeg FF D8 FF, png 89 50 4E 47, gif 'GIF8', tiff II*\\0 / MM\\0*."""
    head4 = F.hex(F.substring(payload_col, 1, 4))
    return (
        F.when(F.substring(head4, 1, 6) == "FFD8FF", "jpeg")
        .when(head4 == "89504E47", "png")
        .when(F.substring(payload_col, 1, 4).cast("string") == "GIF8", "gif")
        .when(head4.isin("49492A00", "4D4D002A"), "tiff")
        .when(F.substring(head4, 1, 4) == "424D", "bmp")
        .when(F.substring(payload_col, 1, 2).cast("string")
              .isin("P5", "P6"), "pnm")
        .when(head4 == "00000100", "ico")
        .when((F.substring(payload_col, 1, 4).cast("string") == "RIFF")
              & (F.substring(payload_col, 9, 4).cast("string")
                 == "WEBP"), "webp")
        # JPEG 2000: the JP2 signature box (length 12 + 'jP  ') or a
        # raw codestream (SOC+SIZ markers)
        .when((head4 == "0000000C")
              & (F.substring(payload_col, 5, 4).cast("string")
                 == "jP  "), "jp2")
        .when(head4 == "FF4FFF51", "jp2")
        # TGA has no magic: it needs the Python-side header-validated
        # sniff (kernels/media._tga_header) and lands in 'other' here,
        # i.e. the policy treats TGA corpora as header-only unless a
        # format-specific pass opts in
        .otherwise("other")
    )


def pixel_stats_policy(
    media: DataFrame,
    sample_per_format: int = 4,
    budget_core_seconds: "float | None" = None,
    min_mb_per_sec: float = 0.2,
) -> dict:
    """Data-driven decode-vs-header decision (the 100 TB CPU policy):
    instead of a blanket SPARKPDF_PIXEL_STATS knob, SAMPLE a few image
    payloads per format, MEASURE the pixel-decode throughput on them,
    project the corpus-wide core-seconds from the per-format byte
    totals (one small JVM aggregate over magic-byte sniffed formats),
    and decide per format.

    Decision rule per format: decode pixel stats iff
      * measured throughput >= `min_mb_per_sec` (a pathologically slow
        decoder never ships), AND
      * `budget_core_seconds` is None or the projected corpus-wide
        core-seconds for that format fit the budget.

    Returns {"formats": {fmt: {"n": .., "mb": .., "mb_per_sec": ..,
    "est_core_sec": .., "decision": "decode"|"header_only"}},
    "decode_formats": set, "sampled": n} — feed decode_formats to
    extract_media_features(pixel_formats=...) and record the dict in
    the run manifest via record_pixel_policy().

    Driver-side cost: one aggregate (count + byte sum per format) and
    `sample_per_format` payload fetches per format via limit() — the
    same scalar-planning-collect class as plans/salting.py."""
    imgs = media.filter(F.col("modality") == "image").select(
        sniff_image_format(F.col("payload")).alias("fmt"), "payload"
    )

    def probe(p, fmt):
        # sniffable formats with NO pixel codec (webp, jp2) must get
        # the explicit quarantined_no_codec row — _decode_image would
        # return header-only meta instantly and the no-op "decode"
        # would measure a bogus header-parse throughput, putting a
        # never-decodable format into decode_formats (r8 review; the
        # same mislabeling av_stats_policy fixed for mp3/vorbis/opus)
        if fmt not in PIXEL_DECODABLE_FORMATS:
            raise NotImplementedError(IMAGE_NO_CODEC_RATIONALE.get(
                fmt, f"no pixel codec for sniffed format {fmt!r}"))
        return _decode_image(p, pixel_formats={fmt})

    return _sample_decode_policy(
        imgs, probe,
        sample_per_format, budget_core_seconds, min_mb_per_sec)


def _sample_decode_policy(tagged: DataFrame, probe,
                          sample_per_format: int,
                          budget_core_seconds: "float | None",
                          min_mb_per_sec: float) -> dict:
    """Shared core of the sampled decode-cost policies: `tagged` is
    (fmt, payload); `probe(payload, fmt)` runs one decode (exceptions
    swallowed — a failing probe just measures slow). Aggregates
    per-format byte totals JVM-side, times sample_per_format decodes
    per format (one warm pass first so LUT/cache builds don't
    contaminate the estimate), projects corpus-wide core-seconds, and
    decides decode vs header_only per format."""
    import time

    totals = {
        r.fmt: (int(r.n), float(r.b or 0) / 1e6)
        for r in tagged.groupBy("fmt")
        .agg(F.count("*").alias("n"), F.sum(F.length("payload")).alias("b"))
        .collect()
    }
    report: dict = {"formats": {}, "decode_formats": set(), "sampled": 0}
    for fmt, (n, mb) in sorted(totals.items()):
        if fmt == "other":
            # unrecognised payloads have no decoder to budget
            report["formats"][fmt] = {
                "n": n, "mb": round(mb, 3), "mb_per_sec": None,
                "est_core_sec": None, "decision": "header_only",
            }
            continue
        samples = [
            bytes(r.payload)
            for r in tagged.filter(F.col("fmt") == fmt)
            .limit(sample_per_format).collect()
        ]
        report["sampled"] += len(samples)
        if samples:
            try:
                probe(samples[0], fmt)
            except NotImplementedError as exc:
                # no sample codec for this format: emit the explicit
                # quarantine row with its rationale — a swallowed
                # probe would measure a bogus (instant) throughput
                # and mislabel the format decode-able
                report["formats"][fmt] = {
                    "n": n, "mb": round(mb, 3), "mb_per_sec": None,
                    "est_core_sec": None,
                    "decision": "quarantined_no_codec",
                    "rationale": str(exc),
                }
                continue
            except Exception:
                pass
        t0 = time.perf_counter()
        for p in samples:
            try:
                probe(p, fmt)
            except Exception:
                pass
        wall = max(time.perf_counter() - t0, 1e-9)
        sample_mb = sum(len(p) for p in samples) / 1e6
        mbps = sample_mb / wall
        est = mb / max(mbps, 1e-9)
        decode = mbps >= min_mb_per_sec and (
            budget_core_seconds is None or est <= budget_core_seconds
        )
        report["formats"][fmt] = {
            "n": n,
            "mb": round(mb, 3),
            "mb_per_sec": round(mbps, 3),
            "est_core_sec": round(est, 3),
            "decision": "decode" if decode else "header_only",
        }
        if decode:
            report["decode_formats"].add(fmt)
    return report


def sniff_av_format(payload_col) -> "F.Column":
    """JVM-side audio/video container sniff from payload magic —
    lets the decode-cost policy aggregate per-format byte totals
    without any Python decode: wav/avi (RIFF forms), flac, aiff
    (FORM/AIFF), au (.snd), mp4 (ftyp at offset 4)."""
    head4 = F.substring(payload_col, 1, 4).cast("string")
    form = F.substring(payload_col, 9, 4).cast("string")
    brand = F.substring(payload_col, 5, 4).cast("string")
    # Ogg codec id: first page header is 27 bytes + a 1-byte segment
    # table on the single-segment ident page, so the codec magic sits
    # at offset 28 (1-based 29)
    ogg_codec = F.substring(payload_col, 29, 8).cast("string")
    return (
        F.when((head4 == "RIFF") & (form == "WAVE"), "wav")
        .when((head4 == "RIFF") & (form == "AVI "), "avi")
        .when(head4 == "fLaC", "flac")
        .when((head4 == "OggS")
              & (F.substring(ogg_codec, 1, 5) == "\x7fFLAC"), "ogg-flac")
        .when((head4 == "OggS")
              & (F.substring(ogg_codec, 1, 7) == "\x01vorbis"),
              "ogg-vorbis")
        .when((head4 == "OggS") & (ogg_codec == "OpusHead"), "ogg-opus")
        .when(head4 == "OggS", "ogg")
        .when((head4 == "FORM") & (form == "AIFF"), "aiff")
        .when(head4 == ".snd", "au")
        .when(brand == "ftyp", "mp4")
        .when(F.hex(F.substring(payload_col, 1, 4)) == "1A45DFA3", "mkv")
        # MP3: ID3v2 container tag, or a bare MPEG frame sync
        # (11 set bits: FFEx/FFFx)
        .when(F.substring(payload_col, 1, 3).cast("string") == "ID3", "mp3")
        .when(F.substring(F.hex(F.substring(payload_col, 1, 2)), 1, 3)
              .isin("FFE", "FFF"), "mp3")
        .otherwise("other")
    )


# sniffable formats whose SAMPLE decode needs codecs this engine does
# not ship — each maps to its documented rationale. The policy emits
# an explicit 'quarantined_no_codec' row for them (round 8, r7
# verdict item 7): header metadata still flows (mp3_info / ogg_info
# in _decode_audio), but a silent probe-pass would mislabel them
# decode-able or header_only-by-cost, both wrong.
IMAGE_NO_CODEC_RATIONALE = {
    "webp": "VP8 boolean-arithmetic entropy decode / VP8L distance "
            "table have no in-container conformance vectors; "
            "dims/format/digest flow from webp_dims",
    "jp2": "EBCOT/MQ entropy decode has no in-container conformance "
           "vectors; dims/components/bit-depth flow from jp2_dims",
}

AV_NO_CODEC_RATIONALE = {
    "mp3": "MDCT+Huffman synthesis filterbank (ISO 11172-3) has no "
           "in-container conformance vectors; frame-walk metadata "
           "only (kernels/media.mp3_info)",
    "ogg-vorbis": "Vorbis floor/residue/MDCT decode is spec-huge with "
                  "no in-container conformance vectors; ident-header "
                  "metadata + granule duration only "
                  "(kernels/media.ogg_info)",
    "ogg-opus": "Opus is a CELT/SILK hybrid (RFC 6716) with no "
                "in-container conformance vectors; ident-header "
                "metadata + granule duration only",
    "ogg": "Ogg page stream with an unrecognized codec ident — "
           "nothing to decode samples with",
}


def _probe_av(payload: bytes, fmt: str):
    """One sample decode for the A/V policy probe — the SAME kernels
    the feature lanes run, so the measured MB/s is the real cost.
    Formats with no sample codec raise NotImplementedError carrying
    the rationale; the policy turns that into an explicit
    quarantined_no_codec row instead of a bogus throughput."""
    from ..kernels.media import (
        aiff_pcm_stats,
        au_pcm_stats,
        avi_mjpeg_frames,
        flac_pcm_stats,
        mkv_mjpeg_frames,
        ogg_flac_pcm_stats,
        wav_pcm_stats,
    )

    if fmt in AV_NO_CODEC_RATIONALE:
        raise NotImplementedError(AV_NO_CODEC_RATIONALE[fmt])
    if fmt == "mp4":
        # ISO-BMFF carries either modality: probe video then audio
        from ..kernels.media import mp4_mjpeg_frames, mp4_pcm_stats

        return mp4_mjpeg_frames(payload) or mp4_pcm_stats(payload)
    return {
        "wav": wav_pcm_stats, "flac": flac_pcm_stats,
        "aiff": aiff_pcm_stats, "au": au_pcm_stats,
        "ogg-flac": ogg_flac_pcm_stats,
        "avi": avi_mjpeg_frames,
        "mkv": mkv_mjpeg_frames,
    }[fmt](payload)


def av_stats_policy(
    media: DataFrame,
    sample_per_format: int = 4,
    budget_core_seconds: "float | None" = None,
    min_mb_per_sec: float = 0.2,
) -> dict:
    """The pixel_stats_policy discipline applied to the A/V
    sample-decode lanes (round 7): the sequential-state-machine
    codecs (FLAC rice streams, ADPCM nibble loops inside 'wav') cost
    ~10x the vectorized PCM paths per byte, so at corpus scale the
    decision must be measured per format, not assumed. Same decision
    rule and report shape as pixel_stats_policy; feed decode_formats
    to a sniff_av_format filter in front of
    extract_audio_pcm_features / extract_video_frame_features."""
    av = media.filter(F.col("modality").isin("audio", "video")).select(
        sniff_av_format(F.col("payload")).alias("fmt"), "payload"
    )
    return _sample_decode_policy(av, _probe_av, sample_per_format,
                                 budget_core_seconds, min_mb_per_sec)


def record_pixel_policy(checkpoint, policy: dict,
                        status: str = "pixel_policy") -> None:
    """Append a decode-policy decision to a CheckpointedExtraction's
    _progress manifest (status='pixel_policy' for the image lane,
    'av_policy' for the audio/video lane — both ignored by
    completed_parts, which only consumes status='ok' rows) so a
    resumed run can replay the same decode path."""
    rec = {
        "status": status,
        "decode_formats": sorted(policy["decode_formats"]),
        "formats": policy["formats"],
        "sampled": policy["sampled"],
    }
    checkpoint._log(rec)
