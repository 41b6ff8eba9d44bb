"""Multimodal columns — image/audio/video as opaque binary + typed metadata.

Design (per the engine contract): media payloads travel as BINARY
columns with a typed metadata struct; decode/resize/frame-sample are
Arrow-batched mapInPandas stages.

The decode kernel is REAL for the stdlib-decodable containers:

- full pixel/sample decode: PNG (zlib inflate + numpy unfilter), BMP,
  GIF (LZW), WAV (PCM + vectorized RMS/ZCR/spectral-centroid features)
  in ``media_codecs.py``; baseline JPEG (Huffman + batched IDCT) in
  ``jpeg.py``
- metadata-only (flagged by codec, no pixel/sample claims): MP3
  (frame-walk duration), WebM/Matroska (EBML duration + dims), TIFF
  (first-IFD dims)

Formats that still need an external entropy decoder (progressive JPEG,
H.264/VP9 frames, ...) fall back to the clearly-marked deterministic
STUB below, flagged ``codec='stub'`` in the output so downstream
consumers can tell real measurements from placeholders.

At 100 TB: media rows are wide (MBs); the operators repartition by
byte-size budget before the Python stage so each Arrow batch stays
within executor memory (`target_batch_bytes`).
"""

from __future__ import annotations

import hashlib
import struct as _struct

import numpy as np

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META = T.StructType([
    T.StructField("media_type", T.StringType()),    # image|audio|video
    T.StructField("format", T.StringType()),        # png|jpeg|wav|mp4|...
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("duration_ms", T.IntegerType()),
    T.StructField("n_bytes", T.LongType()),
])


def _byte_at(b, pos: int):
    """1-indexed byte of a binary column as a long (native, no Python)."""
    return F.conv(F.hex(F.substring(b, pos, 1)), 16, 10).cast("long")


def _le32(b, pos: int):
    return (_byte_at(b, pos) + _byte_at(b, pos + 1) * 256
            + _byte_at(b, pos + 2) * 65536 + _byte_at(b, pos + 3) * 16777216)


def _be32(b, pos: int):
    return (_byte_at(b, pos + 3) + _byte_at(b, pos + 2) * 256
            + _byte_at(b, pos + 1) * 65536 + _byte_at(b, pos) * 16777216)


def _tag(b, pos: int, ascii_tag: str):
    """True when the 4 bytes at 1-indexed pos spell ascii_tag."""
    return F.hex(F.substring(b, pos, 4)) == ascii_tag.encode().hex().upper()


def attach_media_meta(df: DataFrame, binary_col: str = "media") -> DataFrame:
    """Sniff magic bytes AND parse fixed-layout container headers
    natively → metadata struct (zero Python, stays in whole-stage
    codegen, survives any scale):

    - PNG: IHDR width/height (big-endian u32 at offsets 16/20)
    - BMP: BITMAPINFOHEADER width/height (little-endian at 18/22)
    - WAV: duration from the canonical 44-byte PCM header
      (data_size/byte_rate) when the fmt/data chunks sit at their
      standard offsets
    - AVI: width/height/duration from the mandatory avih chunk
      (dwMicroSecPerFrame·dwTotalFrames) when hdrl leads the RIFF body

    Non-canonical layouts leave the field NULL — the decode kernel
    (mapInPandas) remains the authoritative parse; this native pass is
    the cheap planner-friendly metadata used for routing, partitioning,
    and frame planning without touching Python."""
    b = F.col(binary_col)
    head = F.hex(F.substring(b, 1, 4))
    riff_kind = F.hex(F.substring(b, 9, 4))  # RIFF sub-container tag
    fmt = (
        F.when(head.startswith("89504E47"), "png")
        .when(head.startswith("FFD8"), "jpeg")
        .when(head.startswith("474946"), "gif")
        .when(head.startswith("424D"), "bmp")
        .when(head.startswith("52494646") & (riff_kind == "57415645"), "wav")   # WAVE
        .when(head.startswith("52494646") & (riff_kind == "57454250"), "webp")  # WEBP
        .when(head.startswith("52494646") & (riff_kind == "41564920"), "avi")   # 'AVI '
        .when(head.startswith("1A45DFA3"), "webm")
        .when(F.hex(F.substring(b, 5, 4)) == "66747970", "mp4")  # ....ftyp
        .when(head.startswith("FFFB") | head.startswith("FFFA")
              | head.startswith("FFF3") | head.startswith("FFF2")
              | head.startswith("494433"), "mp3")  # MPEG L3 sync / ID3
        .when(head.startswith("49492A00") | head.startswith("4D4D002A"), "tiff")
        .otherwise("unknown")
    )
    media_type = (
        F.when(fmt.isin("png", "jpeg", "gif", "bmp", "webp", "tiff"), "image")
        .when(fmt.isin("wav", "mp3"), "audio")
        .when(fmt.isin("webm", "avi", "mp4"), "video")
        .otherwise("unknown")
    )
    # canonical-layout guards
    avi_hdr = _tag(b, 13, "LIST") & _tag(b, 21, "hdrl") & _tag(b, 25, "avih")
    wav_pcm = _tag(b, 13, "fmt ") & _tag(b, 37, "data")
    byte_rate = _le32(b, 29)
    le16 = lambda pos: _byte_at(b, pos) + _byte_at(b, pos + 1) * 256  # noqa: E731
    le24 = lambda pos: le16(pos) + _byte_at(b, pos + 2) * 65536  # noqa: E731
    # WebP sub-format headers: VP8X canvas (24-bit minus-one), VP8L
    # (14-bit bit-packed minus-one), lossy VP8 (14-bit after the
    # 9D 01 2A start code)
    vp8x = _tag(b, 13, "VP8X")
    vp8l = _tag(b, 13, "VP8L") & (_byte_at(b, 21) == 0x2F)
    vp8 = _tag(b, 13, "VP8 ") & (F.hex(F.substring(b, 24, 3)) == "9D012A")
    width = (
        F.when(fmt == "png", _be32(b, 17))
        .when(fmt == "gif", le16(7))
        .when(fmt == "bmp", _le32(b, 19))
        .when((fmt == "webp") & vp8x, le24(25) + 1)
        .when((fmt == "webp") & vp8l,
              _byte_at(b, 22) + (_byte_at(b, 23) % 64) * 256 + 1)
        .when((fmt == "webp") & vp8, le16(27) % 16384)
        .when((fmt == "avi") & avi_hdr, _le32(b, 65))
    )
    height = (
        F.when(fmt == "png", _be32(b, 21))
        .when(fmt == "gif", le16(9))
        .when(fmt == "bmp", _le32(b, 23))
        .when((fmt == "webp") & vp8x, le24(28) + 1)
        .when((fmt == "webp") & vp8l,
              F.floor(_byte_at(b, 23) / 64) + _byte_at(b, 24) * 4
              + (_byte_at(b, 25) % 16) * 1024 + 1)
        .when((fmt == "webp") & vp8, le16(29) % 16384)
        .when((fmt == "avi") & avi_hdr, _le32(b, 69))
    )
    # MPEG1-Layer3 CBR with the sync word at byte 0 (no ID3 tag): the
    # Annex bitrate table as a CASE over the header's bitrate nibble;
    # duration ≈ bytes·8/bitrate. VBR / ID3-prefixed files stay NULL
    # here and get the exact frame-walk duration from the decode kernel.
    mp3_sync = F.hex(F.substring(b, 1, 2)).isin("FFFB", "FFFA")
    br_nibble = F.floor(_byte_at(b, 3) / 16)
    mp3_kbps = F.lit(None).cast("long")
    for idx, kbps in enumerate([0, 32, 40, 48, 56, 64, 80, 96, 112,
                                128, 160, 192, 224, 256, 320, 0]):
        if kbps:
            mp3_kbps = F.when(br_nibble == idx, F.lit(kbps)).otherwise(mp3_kbps)
    duration_ms = (
        F.when((fmt == "wav") & wav_pcm & (byte_rate > 0),
               _le32(b, 41) * 1000 / byte_rate)
        .when((fmt == "avi") & avi_hdr,
              _le32(b, 33) * _le32(b, 49) / 1000)
        .when((fmt == "mp3") & mp3_sync & mp3_kbps.isNotNull(),
              F.length(b) * 8 / mp3_kbps)
    )
    from ..plans.stagecut import stage_boundary

    # boundary: downstream consumers pick several media_meta FIELDS plus
    # a frame-plan Generate — without the barrier CollapseProject
    # re-inlines this whole byte-parse struct into every consumer
    # (measured 3× on the frame-sampling plan)
    return stage_boundary(df.withColumn(
        "media_meta",
        F.struct(
            media_type.alias("media_type"), fmt.alias("format"),
            width.cast("int").alias("width"),
            height.cast("int").alias("height"),
            duration_ms.cast("int").alias("duration_ms"),
            F.length(b).cast("long").alias("n_bytes"),
        ),
    ))


def _fake_decode(data: bytes) -> tuple[int, int, list[float]]:
    """STUB decode — deterministic fake 'pixels' derived from a digest.

    Used only for formats media_codecs.py cannot decode (JPEG etc. need
    an external entropy decoder); the signature (bytes → (w, h,
    features)) is the real contract and the real kernels run first.
    """
    digest = hashlib.sha256(data or b"").digest()
    w = 1 + digest[0] % 64
    h = 1 + digest[1] % 64
    feats = [x / 255.0 for x in digest[:16]]
    return w, h, feats


_NATIVE_JPEG = None  # pluggable native decoder (see set_native_jpeg_decoder)


def set_native_jpeg_decoder(dec) -> None:
    """Install a NATIVE JPEG decoder behind the same ``decode_features``
    contract — the documented scale path for image-heavy corpora (the
    pure-Python T.81 kernel is the no-dependency correctness baseline
    at ~8 Mcoef/s after the r11 inlining, jpeg.py:20-45; a
    libjpeg-turbo-backed callable is still 10-100× that). In-sandbox
    the seam is proven with ``jpeg.decode_jpeg_fixedpoint`` — a real
    alternative decoder (fixed-point IDCT/YCbCr) exercised end-to-end.

    ``dec(data: bytes) -> (width, height, channels, ndarray)`` — the
    pure kernel's signature. Pass ``"auto"`` to probe for Pillow and
    install it if importable (no-op otherwise); ``None`` to reset to
    the pure-Python kernel.

    OPT-IN by design: different IDCT implementations legitimately
    differ by ±1 in pixel values, so the value-hash-gated oracle rows
    always run the pure kernel; a production cluster with Pillow/
    libjpeg installed flips this switch once at startup.

    Executor semantics: the setting is captured into the
    ``decode_features`` closure at PLAN BUILD time. ``"auto"`` is
    resolved per executor process (the PIL import happens where the
    decode runs); a callable must be picklable (top-level function or
    ``functools.partial``)."""
    global _NATIVE_JPEG
    _NATIVE_JPEG = dec


def _probe_pil():
    """→ a PIL-backed ``(data) -> (w, h, ch, ndarray)`` decoder, or
    None when Pillow is not importable in THIS process."""
    try:
        import io as _io

        import numpy as _np
        from PIL import Image  # type: ignore
    except ImportError:
        return None

    def _pil_decode(data: bytes):
        img = Image.open(_io.BytesIO(data))
        if img.mode not in ("L", "RGB"):
            img = img.convert("RGB")
        arr = _np.asarray(img)
        ch = 1 if arr.ndim == 2 else arr.shape[2]
        return img.width, img.height, ch, arr

    return _pil_decode


def _resolve_native(cfg):
    if cfg == "auto":
        return _probe_pil()
    return cfg


def _decode_one(data: bytes, native_jpeg=None) -> dict:
    """Real-first decode: PNG/BMP/WAV via media_codecs, stub fallback.
    Returns a plain dict row; NEVER throws on hostile bytes."""
    from . import media_codecs as mc

    try:
        if data.startswith(mc.PNG_SIG) or data[:2] == b"BM" \
                or data[:2] == b"\xff\xd8" or data[:3] == b"GIF":
            if data[:1] == b"\x89":
                codec, dec = "png", mc.decode_png
            elif data[:2] == b"BM":
                codec, dec = "bmp", mc.decode_bmp
            elif data[:3] == b"GIF":
                codec, dec = "gif", mc.decode_gif
            elif native_jpeg is not None:
                codec, dec = "jpeg", native_jpeg
            else:
                from .jpeg import decode_jpeg as dec  # baseline + progressive

                codec = "jpeg"
            w, h, ch, px = dec(data)
            means = [float(px.reshape(-1, ch)[:, c].mean()) for c in range(ch)] \
                if px.size else [0.0] * ch
            return dict(width=w, height=h, channels=ch, duration_ms=None,
                        mean_val=float(px.mean()) if px.size else 0.0,
                        features=[m / 255.0 for m in means],
                        codec=codec)
        if data[:4] in (b"II*\x00", b"MM\x00*"):
            w, h = mc.parse_tiff(data)
            # metadata-only (strip/compression decode out of scope)
            return dict(width=w, height=h, channels=None, duration_ms=None,
                        mean_val=None, features=[], codec="tiff")
        if len(data) >= 12 and data[4:8] == b"ftyp":
            dur, w, h, n_tracks, vcodec, _brand = mc.parse_mp4(data)
            # metadata-only (H.264/HEVC/AV1 frame decode out of scope):
            # duration/dims/codec are real ISO-BMFF moov values
            return dict(width=w, height=h, channels=None,
                        duration_ms=dur, mean_val=None, features=[],
                        codec=f"mp4/{vcodec}" if vcodec else "mp4")
        if data[:4] == b"\x1a\x45\xdf\xa3":
            dur, w, h = mc.parse_webm(data)
            # metadata-only (VP8/VP9/AV1 frame decode out of scope):
            # duration/dims are real EBML Info/Tracks values
            return dict(width=w, height=h, channels=None,
                        duration_ms=dur, mean_val=None,
                        features=[], codec="webm")
        if data[:3] == b"ID3" or data[:2] in (b"\xff\xfb", b"\xff\xfa",
                                              b"\xff\xf3", b"\xff\xf2"):
            ch, rate, bitrate, n_frames, dur = mc.parse_mp3(data)
            # metadata-only: MP3 sample decode (Huffman+IMDCT) is out of
            # scope; duration/channels/rate are real frame-walk values
            return dict(width=None, height=None, channels=ch,
                        duration_ms=dur, mean_val=None,
                        features=[], codec="mp3")
        if data[:4] == b"RIFF" and data[8:12] == b"WAVE":
            ch, rate, n, dur, samples = mc.decode_wav(data)
            mean = float(samples.mean()) if samples.size else 0.0
            # normalize by the sample type's full scale so the feature
            # stays in the shared [-1, 1]/[0, 1] contract for both widths
            scale = 255.0 if samples.dtype.itemsize == 1 else 32768.0
            # real audio features (all vectorized numpy): RMS energy,
            # zero-crossing rate, spectral centroid as a fraction of
            # Nyquist (rFFT magnitude-weighted mean bin)
            x = samples.astype(np.float64)
            if samples.dtype.itemsize == 1:
                x -= 128.0  # u8 PCM is offset-binary
            rms = float(np.sqrt(np.mean(x * x))) / scale if x.size else 0.0
            zcr = float(np.mean(np.signbit(x[1:]) != np.signbit(x[:-1]))) \
                if x.size > 1 else 0.0
            if x.size > 1 and np.any(x):
                mag = np.abs(np.fft.rfft(x - x.mean()))
                centroid = float((mag * np.arange(mag.size)).sum()
                                 / max(mag.sum(), 1e-12) / max(mag.size - 1, 1))
            else:
                centroid = 0.0
            return dict(width=None, height=None, channels=ch,
                        duration_ms=dur, mean_val=mean,
                        features=[mean / scale, rms, zcr, centroid],
                        codec="wav")
    except Exception:  # noqa: BLE001 — corrupt media must not fail the task
        pass
    w, h, feats = _fake_decode(data)
    return dict(width=w, height=h, channels=None, duration_ms=None,
                mean_val=None, features=feats, codec="stub")


def decode_features(
    df: DataFrame,
    id_col: str = "id",
    binary_col: str = "media",
    target_batch_bytes: int | None = None,
    passthrough: tuple[str, ...] = (),
    use_native: bool | None = None,
) -> DataFrame:
    """Media decode + feature extraction via mapInPandas (Arrow batches).

    PNG/BMP/WAV decode for real (media_codecs.py); other formats fall
    back to the digest stub, flagged by the ``codec`` column.

    `passthrough` columns ride along through the Arrow batch so callers
    get metadata + decoded features in ONE pass over the (wide, MBs/row)
    media table — a post-hoc self-join would scan the binary column twice
    and shuffle it once, which is the wrong plan at 100 TB.

    Batch sizing: Arrow batches are bounded in ROWS by
    ``spark.sql.execution.arrow.maxRecordsPerBatch`` — for MB-scale media
    set that conf low, and/or pass ``target_batch_bytes`` to spend ONE
    extra pass measuring total binary bytes and repartitioning so each
    partition (hence each worker's batch stream) carries ≲ that budget.
    Default None: no extra pass, inherit upstream partitioning.

    ``use_native``: True forces the installed native JPEG decoder
    (see :func:`set_native_jpeg_decoder`), False forces the pure
    kernel; None (default) follows the global setting. The effective
    config is captured into the closure HERE, so it ships to executors
    with the plan.
    """
    import math

    import pandas as pd

    if use_native is False:
        native_cfg = None
    elif use_native is True:
        native_cfg = _NATIVE_JPEG or "auto"
    else:
        native_cfg = _NATIVE_JPEG

    out_cols = ("id", "width", "height", "channels", "duration_ms",
                "mean_val", "features", "codec")
    out_schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("width", T.IntegerType()),
            T.StructField("height", T.IntegerType()),
            T.StructField("channels", T.IntegerType()),
            T.StructField("duration_ms", T.IntegerType()),
            T.StructField("mean_val", T.DoubleType()),
            T.StructField("features", T.ArrayType(T.FloatType())),
            T.StructField("codec", T.StringType()),
        ]
        + [df.schema[c] for c in passthrough]
    )

    def run(batches):
        native = _resolve_native(native_cfg)   # per executor process
        for pdf in batches:
            out: dict[str, list] = {c: [] for c in out_cols}
            for i, data in zip(pdf[id_col], pdf[binary_col]):
                row = _decode_one(bytes(data) if data is not None else b"",
                                  native_jpeg=native)
                out["id"].append(i)
                for c in out_cols[1:]:
                    out[c].append(row[c])
            for c in passthrough:
                out[c] = pdf[c]
            yield pd.DataFrame(out)

    narrow = df.select(id_col, binary_col, *passthrough)
    if target_batch_bytes is not None:
        total = narrow.select(
            F.sum(F.length(binary_col)).alias("b")
        ).collect()[0].b or 0
        narrow = narrow.repartition(
            max(1, math.ceil(total / target_batch_bytes))
        )
    return narrow.mapInPandas(run, out_schema)


def frame_sample_plan(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: one row per planned frame timestamp.
    The decode itself is the stubbed kernel; the explode/planning is real."""
    duration = F.coalesce(F.col("media_meta.duration_ms"), F.lit(0))
    ts = F.sequence(F.lit(0), F.greatest(duration - 1, F.lit(0)), F.lit(every_ms))
    return df.withColumn("frame_ts_ms", F.explode(ts))


# ---------------------------------------------------------------------------
# audio feature extraction (real DSP over decoded PCM)

AUDIO_FEATURES_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("rate", T.LongType()),
    T.StructField("n_samples", T.LongType()),
    T.StructField("channels", T.LongType()),
    T.StructField("rms", T.DoubleType()),
    T.StructField("zcr", T.LongType()),
    T.StructField("dominant_bin", T.LongType()),
    T.StructField("dominant_freq_mhz", T.LongType()),
    T.StructField("spectral_centroid_mhz", T.LongType()),
    T.StructField("audio_error", T.StringType()),
])


def audio_feature_row(data: bytes) -> dict:
    """Pure kernel: WAV bytes → spectral/temporal features.

    Real DSP (numpy rFFT, no stubs): RMS energy, zero-crossing count,
    dominant frequency (argmax magnitude bin, DC excluded; exact for
    on-bin tones, which is what makes the driver oracle possible), and
    spectral centroid. Frequencies reported in integer millihertz —
    ``bin * rate * 1000 // n`` is exact integer arithmetic, so a SQL
    oracle predicts it without touching floats.
    """
    import numpy as np

    from enrich_spark.datapipe.media_codecs import decode_wav

    try:
        ch, rate, n, _dur, samples = decode_wav(bytes(data))
    except Exception as e:  # noqa: BLE001 — feature op must not kill a task
        return {"audio_error": f"{type(e).__name__}: {e}"}
    if ch > 1:
        samples = samples.reshape(-1, ch).mean(axis=1)
    x = samples.astype(np.float64)
    n_s = len(x)
    if n_s:
        x = x - x.mean()  # removes DC (incl. the uint8 +128 bias)
    if n_s == 0:
        return {"rate": rate, "n_samples": 0, "channels": ch,
                "audio_error": "empty"}
    mag = np.abs(np.fft.rfft(x))
    dom = int(mag[1:].argmax()) + 1 if len(mag) > 1 else 0
    centroid = (
        float((mag[1:] * np.arange(1, len(mag))).sum() / mag[1:].sum())
        if len(mag) > 1 and mag[1:].sum() > 0 else 0.0)
    return {
        "rate": rate,
        "n_samples": n_s,
        "channels": ch,
        "rms": float(np.sqrt((x * x).mean())),
        "zcr": int(((x[:-1] * x[1:]) < 0).sum()),
        "dominant_bin": dom,
        "dominant_freq_mhz": dom * rate * 1000 // n_s,
        "spectral_centroid_mhz": int(centroid * rate * 1000 / n_s),
        "audio_error": None,
    }


def audio_features(
    df: DataFrame, binary_col: str = "media", id_col: str = "doc_id"
) -> DataFrame:
    """Arrow-batched audio feature extraction over a binary column —
    same mapInPandas shape as decode_features: bounded batches, no
    shuffle, failures become rows (audio_error), never task deaths."""
    cols = [f.name for f in AUDIO_FEATURES_SCHEMA.fields]

    def kernel(batches):
        import pandas as pd

        for pdf in batches:
            rows = []
            for did, blob in zip(pdf[id_col], pdf[binary_col]):
                rec = audio_feature_row(blob)
                rec["doc_id"] = int(did)
                rows.append(rec)
            yield pd.DataFrame(rows, columns=cols)

    return df.mapInPandas(kernel, AUDIO_FEATURES_SCHEMA)


# ---------------------------------------------------------------------------
# image resize (real nearest-neighbor kernel over the decoded pixels)

RESIZE_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("src_width", T.LongType()),
    T.StructField("src_height", T.LongType()),
    T.StructField("width", T.LongType()),
    T.StructField("height", T.LongType()),
    T.StructField("channels", T.LongType()),
    T.StructField("mean_val", T.DoubleType()),
    T.StructField("pixel_digest", T.StringType()),
    T.StructField("codec", T.StringType()),
])


def resize_one(data: bytes, tw: int, th: int, native_jpeg=None) -> dict:
    """Pure kernel: image bytes → nearest-neighbor resample to (tw, th).

    Index mapping is INTEGER floor arithmetic (`src_i = out_i * src //
    dst`, the classic point-sampling rule), so the resample — and hence
    the pixel digest — is bit-deterministic across partitionings and
    replays. Decodes through the same codec set as ``_decode_one``
    (PNG/BMP/GIF real, JPEG via the pure kernel or the installed native
    seam); non-raster formats return codec-only rows."""
    import numpy as np

    from . import media_codecs as mc

    try:
        if data[:1] == b"\x89" and data.startswith(mc.PNG_SIG):
            codec, dec = "png", mc.decode_png
        elif data[:2] == b"BM":
            codec, dec = "bmp", mc.decode_bmp
        elif data[:3] == b"GIF":
            codec, dec = "gif", mc.decode_gif
        elif data[:2] == b"\xff\xd8":
            if native_jpeg is not None:
                codec, dec = "jpeg", native_jpeg
            else:
                from .jpeg import decode_jpeg as dec

                codec = "jpeg"
        else:
            return dict(codec="skip")
        w, h, ch, px = dec(bytes(data))
        a = np.asarray(px).reshape(h, w, ch)
        xi = (np.arange(tw) * w) // tw
        yi = (np.arange(th) * h) // th
        out = a[yi][:, xi]
        return dict(
            src_width=w, src_height=h, width=tw, height=th, channels=ch,
            mean_val=float(out.mean()) if out.size else 0.0,
            pixel_digest=hashlib.md5(out.tobytes()).hexdigest(),
            codec=codec)
    except Exception as e:  # noqa: BLE001 — corrupt media must not kill a task
        return dict(codec=f"error:{type(e).__name__}")


def resize_images(
    df: DataFrame,
    width: int,
    height: int,
    binary_col: str = "media",
    id_col: str = "doc_id",
    use_native: bool | None = None,
) -> DataFrame:
    """Arrow-batched image resize over a binary column — the
    decode→resample step of an image-pipeline preprocess, same
    mapInPandas shape as decode_features (bounded batches, no shuffle,
    failures become rows). Output per image: source dims, target dims,
    channels, resampled mean, md5 of the resampled pixel bytes (the
    reproducibility commitment a downstream cache can key on)."""
    if use_native is False:
        native_cfg = None
    elif use_native is True:
        native_cfg = _NATIVE_JPEG or "auto"
    else:
        native_cfg = _NATIVE_JPEG

    cols = [f.name for f in RESIZE_SCHEMA.fields]

    def kernel(batches):
        import pandas as pd

        native = _resolve_native(native_cfg)
        for pdf in batches:
            rows = []
            for did, blob in zip(pdf[id_col], pdf[binary_col]):
                rec = resize_one(
                    bytes(blob) if blob is not None else b"",
                    width, height, native_jpeg=native)
                rec["doc_id"] = int(did)
                rows.append(rec)
            yield pd.DataFrame(rows, columns=cols)

    return df.select(id_col, binary_col).mapInPandas(kernel, RESIZE_SCHEMA)


# ---------------------------------------------------------------------------
# perceptual image hashing (dHash) — the multimodal near-dup primitive

DHASH_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("dhash", T.LongType()),
    T.StructField("src_width", T.LongType()),
    T.StructField("src_height", T.LongType()),
    T.StructField("codec", T.StringType()),
])


def dhash_one(data: bytes, native_jpeg=None) -> dict:
    """Pure kernel: image bytes → 64-bit difference hash (dHash, the
    public perceptual-hash family: Krawetz's "kind of like that"
    gradient hash). Pipeline: decode (same codec set as resize_one) →
    integer grayscale (channel sum // channels — floor, deterministic)
    → nearest-neighbor resample to 9×8 (the same ``out·src // dst``
    floor mapping as resize_one) → bit(r,c) = gray[r][c+1] > gray[r][c]
    → 64 bits packed little-endian by cell index i = r·8+c into a
    SIGNED int64 (bit 63 contributes −2⁶³ — two's complement, so the
    value round-trips any BIGINT engine column).

    All-integer end to end: no float enters the hash, so the value is
    bit-identical across partitionings, replays, and engines."""
    from . import media_codecs as mc

    try:
        if data[:1] == b"\x89" and data.startswith(mc.PNG_SIG):
            codec, dec = "png", mc.decode_png
        elif data[:2] == b"BM":
            codec, dec = "bmp", mc.decode_bmp
        elif data[:3] == b"GIF":
            codec, dec = "gif", mc.decode_gif
        elif data[:2] == b"\xff\xd8":
            if native_jpeg is not None:
                codec, dec = "jpeg", native_jpeg
            else:
                from .jpeg import decode_jpeg as dec

                codec = "jpeg"
        else:
            return dict(codec="skip")
        w, h, ch, px = dec(bytes(data))
        a = np.asarray(px).reshape(h, w, ch).astype(np.int64)
        gray = a.sum(axis=2) // ch
        tw, th = 9, 8
        xi = (np.arange(tw) * w) // tw
        yi = (np.arange(th) * h) // th
        g = gray[yi][:, xi]
        bits = g[:, 1:] > g[:, :-1]          # 8×8 gradient signs
        val = 0
        for i, b in enumerate(bits.flatten()):   # i = r*8 + c
            if b:
                val |= 1 << i
        if val >= 1 << 63:
            val -= 1 << 64
        return dict(dhash=val, src_width=w, src_height=h, codec=codec)
    except Exception as e:  # noqa: BLE001 — corrupt media must not kill a task
        return dict(codec=f"error:{type(e).__name__}")


def image_dhash(
    df: DataFrame,
    binary_col: str = "media",
    id_col: str = "doc_id",
    use_native: bool | None = None,
) -> DataFrame:
    """Arrow-batched perceptual hash over a binary image column — the
    signature side of multimodal near-dup: pair generation is
    :func:`enrich_spark.datapipe.dedup.hamming_pairs` over the output
    (banded equi-join + bit_count verify), exactly the simhash plan
    with dHash as the fingerprint. Same mapInPandas shape as
    resize_images (bounded batches, no shuffle, failures become
    ``codec='error:…'`` rows with a NULL hash)."""
    if use_native is False:
        native_cfg = None
    elif use_native is True:
        native_cfg = _NATIVE_JPEG or "auto"
    else:
        native_cfg = _NATIVE_JPEG

    cols = [f.name for f in DHASH_SCHEMA.fields]

    def kernel(batches):
        import pandas as pd

        native = _resolve_native(native_cfg)
        for pdf in batches:
            rows = []
            for did, blob in zip(pdf[id_col], pdf[binary_col]):
                rec = dhash_one(
                    bytes(blob) if blob is not None else b"",
                    native_jpeg=native)
                rec["doc_id"] = int(did)
                rows.append(rec)
            yield pd.DataFrame(rows, columns=cols)

    return df.select(id_col, binary_col).mapInPandas(kernel, DHASH_SCHEMA)


# ---------------------------------------------------------------------------
# audio fingerprinting (Haitsma–Kalker band-energy hash) — the audio
# near-dup primitive; pair generation reuses dedup.hamming_pairs

AFP_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("afp", T.LongType()),
    T.StructField("rate", T.LongType()),
    T.StructField("n_samples", T.LongType()),
    T.StructField("afp_error", T.StringType()),
])


def audio_fingerprint_row(data: bytes, n_frames: int = 9,
                          n_bands: int = 9) -> dict:
    """Pure kernel: WAV bytes → 64-bit audio fingerprint (the public
    Haitsma & Kalker 2002 scheme, "A Highly Robust Audio Fingerprinting
    System"): split into ``n_frames`` equal windows, per frame compute
    band energies over ``n_bands`` equal rFFT bin ranges (DC excluded),
    then bit(t,b) = sign of the TIME-DIFFERENCE of the BAND-DIFFERENCE:

        (E[t][b] − E[t][b+1]) − (E[t−1][b] − E[t−1][b+1]) > 0

    (n_frames−1)·(n_bands−1) = 8×8 = 64 bits at the defaults, packed
    by cell index i = (t−1)·8 + b into a signed int64 (bit 63 = −2⁶³,
    two's complement — the dHash packing convention). Real DSP: numpy
    rFFT magnitude², rectangular windows (deterministic — no float
    window coefficients), mono mixdown by channel mean.
    """
    import numpy as np

    from enrich_spark.datapipe.media_codecs import decode_wav

    try:
        ch, rate, n, _dur, samples = decode_wav(bytes(data))
    except Exception as e:  # noqa: BLE001 — corrupt media must not kill a task
        return {"afp_error": f"{type(e).__name__}: {e}"}
    if ch > 1:
        samples = samples.reshape(-1, ch).mean(axis=1)
    x = samples.astype(np.float64)
    L = len(x) // n_frames
    K = L // 2
    if K < n_bands:
        return {"rate": rate, "n_samples": len(x),
                "afp_error": "too short"}
    E = np.empty((n_frames, n_bands), dtype=np.float64)
    for t in range(n_frames):
        mag2 = np.abs(np.fft.rfft(x[t * L:(t + 1) * L])) ** 2
        for b in range(n_bands):
            lo = 1 + b * K // n_bands
            hi = 1 + (b + 1) * K // n_bands
            E[t, b] = mag2[lo:hi].sum()
    d = E[:, :-1] - E[:, 1:]              # band differences per frame
    bits = (d[1:] - d[:-1]) > 0           # time difference of those
    val = 0
    for i, bit in enumerate(bits.flatten()):   # i = (t-1)*(nb-1) + b
        if bit:
            val |= 1 << i
    nbits = (n_frames - 1) * (n_bands - 1)
    if nbits >= 64 and val >= 1 << 63:
        val -= 1 << 64
    return {"afp": val, "rate": rate, "n_samples": len(x),
            "afp_error": None}


def audio_fingerprint(
    df: DataFrame,
    binary_col: str = "media",
    id_col: str = "doc_id",
    n_frames: int = 9,
    n_bands: int = 9,
) -> DataFrame:
    """Arrow-batched audio fingerprint over a binary column — same
    mapInPandas shape as audio_features (bounded batches, no shuffle,
    failures become ``afp_error`` rows). Near-dup pairs come from
    :func:`enrich_spark.datapipe.dedup.hamming_pairs` over ``afp`` —
    the same banded plan simhash and image dHash use."""
    cols = [f.name for f in AFP_SCHEMA.fields]

    def kernel(batches):
        import pandas as pd

        for pdf in batches:
            rows = []
            for did, blob in zip(pdf[id_col], pdf[binary_col]):
                rec = audio_fingerprint_row(
                    bytes(blob) if blob is not None else b"",
                    n_frames=n_frames, n_bands=n_bands)
                rec["doc_id"] = int(did)
                rows.append(rec)
            yield pd.DataFrame(rows, columns=cols)

    return df.select(id_col, binary_col).mapInPandas(kernel, AFP_SCHEMA)
