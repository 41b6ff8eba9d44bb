"""Pure-stdlib media codecs for the multimodal decode kernel.

The container ships no PIL/libvips, so the decode kernel implements the
simple container formats directly — zlib + struct + numpy are enough for
real PNG (8-bit gray/RGB/RGBA, non-interlaced), BMP (24-bit BI_RGB) and
WAV (PCM 8/16-bit via the stdlib ``wave`` module). Compressed codecs
(JPEG/H.264/...) stay behind the documented stub fallback in
``multimodal.decode_features`` — implementing a JPEG entropy decoder is
out of scope, and the contract (bytes → dims/stats/features) is what the
Spark plumbing needs.

Encoders exist so fixtures and oracle queries can generate REAL media
bytes whose decoded statistics are predictable arithmetic.
"""

from __future__ import annotations

import io
import struct
import wave
import zlib

import numpy as np

PNG_SIG = b"\x89PNG\r\n\x1a\n"
_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def decode_png(data: bytes) -> tuple[int, int, int, np.ndarray]:
    """PNG → (width, height, channels, uint8 pixels[h, w*ch]).

    Supports bit depth 8, color types 0/2/4/6, non-interlaced, filters
    0-4. Raises ValueError on anything else (caller falls back)."""
    if not data.startswith(PNG_SIG):
        raise ValueError("not a PNG")
    pos = 8
    w = h = color = None
    idat: list[bytes] = []
    while pos + 8 <= len(data):
        ln, typ = struct.unpack(">I4s", data[pos:pos + 8])
        chunk = data[pos + 8:pos + 8 + ln]
        if len(chunk) < ln:
            raise ValueError("truncated chunk")
        if typ == b"IHDR":
            w, h, depth, color, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", chunk
            )
            if depth != 8:
                raise ValueError(f"unsupported bit depth {depth}")
            if interlace:
                raise ValueError("interlaced PNG unsupported")
            if color not in _PNG_CHANNELS:
                raise ValueError(f"unsupported color type {color}")
        elif typ == b"IDAT":
            idat.append(chunk)
        elif typ == b"IEND":
            break
        pos += 12 + ln
    if w is None or not idat:
        raise ValueError("missing IHDR/IDAT")
    raw = zlib.decompress(b"".join(idat))
    ch = _PNG_CHANNELS[color]
    stride = w * ch
    if len(raw) != (stride + 1) * h:
        raise ValueError("IDAT length mismatch")
    arr = np.frombuffer(raw, dtype=np.uint8).reshape(h, stride + 1)
    filters, lines = arr[:, 0], arr[:, 1:]
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        f = int(filters[y])
        rec = lines[y].astype(np.int32)
        if f == 0:
            pass
        elif f == 1:  # Sub
            for x in range(ch, stride):
                rec[x] = (rec[x] + rec[x - ch]) & 0xFF
        elif f == 2:  # Up
            rec = (rec + prev) & 0xFF
        elif f == 3:  # Average
            for x in range(stride):
                left = rec[x - ch] if x >= ch else 0
                rec[x] = (rec[x] + ((left + int(prev[x])) >> 1)) & 0xFF
        elif f == 4:  # Paeth
            for x in range(stride):
                a = rec[x - ch] if x >= ch else 0
                b = int(prev[x])
                c = int(prev[x - ch]) if x >= ch else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pr = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                rec[x] = (rec[x] + pr) & 0xFF
        else:
            raise ValueError(f"bad filter {f}")
        out[y] = rec.astype(np.uint8)
        prev = out[y]
    return w, h, ch, out


def encode_png(w: int, h: int, pixels: np.ndarray, color: int = 2) -> bytes:
    """(h, w*ch) uint8 → PNG bytes (filter 0 rows, one zlib stream)."""
    ch = _PNG_CHANNELS[color]
    px = np.asarray(pixels, dtype=np.uint8).reshape(h, w * ch)
    raw = b"".join(b"\x00" + px[y].tobytes() for y in range(h))

    def chunk(typ: bytes, payload: bytes) -> bytes:
        return (struct.pack(">I", len(payload)) + typ + payload
                + struct.pack(">I", zlib.crc32(typ + payload) & 0xFFFFFFFF))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    return (PNG_SIG + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b""))


def decode_bmp(data: bytes) -> tuple[int, int, int, np.ndarray]:
    """BMP (24-bit uncompressed BI_RGB) → (w, h, 3, uint8[h, w*3])."""
    if data[:2] != b"BM" or len(data) < 54:
        raise ValueError("not a BMP")
    off = struct.unpack("<I", data[10:14])[0]
    w, h = struct.unpack("<ii", data[18:26])
    bpp = struct.unpack("<H", data[28:30])[0]
    comp = struct.unpack("<I", data[30:34])[0]
    if bpp != 24 or comp != 0:
        raise ValueError(f"unsupported BMP bpp={bpp} comp={comp}")
    flip, h = h > 0, abs(h)
    rowsz = ((w * 3 + 3) // 4) * 4
    if len(data) < off + rowsz * h:
        raise ValueError("truncated BMP")
    px = np.frombuffer(data, np.uint8, count=rowsz * h, offset=off)
    px = px.reshape(h, rowsz)[:, :w * 3]
    if flip:
        px = px[::-1]
    return w, h, 3, px


def encode_bmp(w: int, h: int, pixels: np.ndarray) -> bytes:
    """(h, w*3) uint8 BGR rows → bottom-up 24-bit BMP bytes."""
    px = np.asarray(pixels, dtype=np.uint8).reshape(h, w * 3)
    rowsz = ((w * 3 + 3) // 4) * 4
    pad = b"\x00" * (rowsz - w * 3)
    body = b"".join(px[y].tobytes() + pad for y in range(h - 1, -1, -1))
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body),
                       2835, 2835, 0, 0)
    header = struct.pack("<2sIHHI", b"BM", 14 + 40 + len(body), 0, 0, 14 + 40)
    return header + info + body


def decode_wav(data: bytes) -> tuple[int, int, int, int, np.ndarray]:
    """WAV (PCM) → (channels, rate, n_frames, duration_ms, samples)."""
    with wave.open(io.BytesIO(data)) as wf:
        ch, sw = wf.getnchannels(), wf.getsampwidth()
        rate, n = wf.getframerate(), wf.getnframes()
        frames = wf.readframes(n)
    if sw == 1:
        samples = np.frombuffer(frames, np.uint8)
    elif sw == 2:
        samples = np.frombuffer(frames, "<i2")
    else:
        raise ValueError(f"unsupported sample width {sw}")
    return ch, rate, n, int(n * 1000 // rate), samples


def encode_wav(rate: int, samples: np.ndarray, channels: int = 1) -> bytes:
    """uint8 (8-bit) or int16 samples → PCM WAV bytes."""
    arr = np.asarray(samples)
    sw = 1 if arr.dtype == np.uint8 else 2
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(channels)
        wf.setsampwidth(sw)
        wf.setframerate(rate)
        wf.writeframes(arr.astype(np.uint8 if sw == 1 else "<i2").tobytes())
    return buf.getvalue()
