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
    fmax = int(filters.max(initial=0))
    if fmax > 4:
        raise ValueError(f"bad filter {fmax}")
    if fmax > 2:  # some row uses Average/Paeth (≡ isin(filters, (3,4)))
        # Average/Paeth recurrences cross both axes — vectorize over
        # anti-diagonal wavefronts instead of per pixel (see below)
        return w, h, ch, _unfilter_wavefront(lines, filters, w, h, ch)
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int64)
    for y in range(h):
        f = int(filters[y])
        rec = lines[y].astype(np.int64)
        if f == 1:  # Sub: per-channel-lane prefix sum, fully vectorized
            # ((a mod 256)+(b mod 256)) mod 256 == (a+b) mod 256, so one
            # cumsum + one final mask reproduces the sequential recurrence
            lanes = rec.reshape(-1, ch)
            np.cumsum(lanes, axis=0, out=lanes)
            rec &= 0xFF
        elif f == 2:  # Up: fully vectorized
            rec = (rec + prev) & 0xFF
        out[y] = rec.astype(np.uint8)
        prev = rec
    return w, h, ch, out


def _unfilter_wavefront(lines, filters, w: int, h: int, ch: int) -> np.ndarray:
    """Whole-image unfilter for scanlines mixing any of filters 0-4.

    Every PNG predictor reads only the left / up / up-left neighbors, so
    pixel (y, x) depends exclusively on pixels with smaller y+x — the
    classic wavefront decomposition of a 2-D recurrence. Iterating the
    h+w-1 anti-diagonals with one vectorized step each turns the O(h·w)
    interpreted-Python pixel loop into O(h+w) numpy calls: a 1000×1000
    Paeth-filtered RGB decodes in ~0.2 s (~40× over the per-pixel loop);
    filters 0/1/2 never reach this path and decode in ~10 ms via the
    row-vectorized fast path."""
    raw = lines.reshape(h, w, ch).astype(np.int32)
    f_row = filters.astype(np.int32)
    # R[y+1, x+1] holds reconstructed pixel (y, x); row/col 0 stay zero so
    # out-of-image neighbors read as 0 per the PNG spec
    R = np.zeros((h + 1, w + 1, ch), dtype=np.int32)
    ys_all = np.arange(h)

    def paeth_pred(a, b, c):
        # p-a = b-c, p-b = a-c, p-c = a+b-2c: skip materializing p
        pa, pb = np.abs(b - c), np.abs(a - c)
        pc = np.abs(a + b - 2 * c)
        return np.where((pa <= pb) & (pa <= pc), a,
                        np.where(pb <= pc, b, c))

    for d in range(h + w - 1):
        y0, y1 = max(0, d - w + 1), min(h - 1, d)
        ys = ys_all[y0:y1 + 1]
        xs = d - ys
        a = R[ys + 1, xs]      # left
        b = R[ys, xs + 1]      # up
        fs = f_row[y0:y1 + 1]
        fmin, fmax = int(fs.min()), int(fs.max())
        if fmin == fmax:       # uniform filter on this wavefront: direct op
            if fmin == 0:
                pred = 0
            elif fmin == 1:
                pred = a
            elif fmin == 2:
                pred = b
            elif fmin == 3:
                pred = (a + b) >> 1
            else:
                pred = paeth_pred(a, b, R[ys, xs])
        else:
            c = R[ys, xs]      # up-left
            fd = fs[:, None]
            pred = np.select(
                [fd == 0, fd == 1, fd == 2, fd == 3],
                [np.zeros_like(a), a, b, (a + b) >> 1],
                default=paeth_pred(a, b, c),
            )
        R[ys + 1, xs + 1] = (raw[ys, xs] + pred) & 0xFF
    return R[1:, 1:].astype(np.uint8).reshape(h, w * ch)


def encode_png(w: int, h: int, pixels: np.ndarray, color: int = 2,
               filter_type: int = 0) -> bytes:
    """(h, w*ch) uint8 → PNG bytes (one zlib stream). ``filter_type``
    applies that row filter to every scanline (0/1/2/3/4) — used by
    tests to produce real adaptive-encoder-style filtered input."""
    ch = _PNG_CHANNELS[color]
    px = np.asarray(pixels, dtype=np.uint8).reshape(h, w * ch)
    if filter_type == 0:
        raw = b"".join(b"\x00" + px[y].tobytes() for y in range(h))
    else:
        f = filter_type
        rows = []
        prev = np.zeros(w * ch, dtype=np.int64)
        for y in range(h):
            cur = px[y].astype(np.int64)
            left = np.zeros_like(cur)
            left[ch:] = cur[:-ch]
            if f == 1:
                res = cur - left
            elif f == 2:
                res = cur - prev
            elif f == 3:
                res = cur - ((left + prev) >> 1)
            elif f == 4:
                upleft = np.zeros_like(prev)
                upleft[ch:] = prev[:-ch]
                p = left + prev - upleft
                pa, pb, pc = (np.abs(p - left), np.abs(p - prev),
                              np.abs(p - upleft))
                pr = np.where((pa <= pb) & (pa <= pc), left,
                              np.where(pb <= pc, prev, upleft))
                res = cur - pr
            else:
                raise ValueError(f"bad filter {f}")
            rows.append(bytes([f]) + (res & 0xFF).astype(np.uint8).tobytes())
            prev = cur
        raw = b"".join(rows)

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


def encode_avi(width: int, height: int, fps: int, n_frames: int) -> bytes:
    """Minimal-but-valid AVI container: RIFF('AVI ' LIST('hdrl' avih)
    LIST('movi')). Carries real timing metadata (dwMicroSecPerFrame,
    dwTotalFrames, dwWidth/dwHeight) in the mandatory avih chunk at the
    canonical offsets attach_media_meta parses natively; the movi body
    is empty (no codec payload — frame decode is out of scope, the
    container metadata is the contract under test)."""
    import struct as _s

    usec = 1_000_000 // fps
    avih = _s.pack(
        "<14I", usec, 0, 0, 0, n_frames, 0, 1, 0, width, height, 0, 0, 0, 0
    )
    hdrl = b"hdrl" + b"avih" + _s.pack("<I", len(avih)) + avih
    movi = b"movi"
    body = (
        b"AVI "
        + b"LIST" + _s.pack("<I", len(hdrl)) + hdrl
        + b"LIST" + _s.pack("<I", len(movi)) + movi
    )
    return b"RIFF" + _s.pack("<I", len(body)) + body


# ---------------------------------------------------------------------------
# GIF (87a/89a): LZW decode, first frame, global/local palette, interlace


def decode_gif(data: bytes) -> tuple[int, int, int, np.ndarray]:
    """GIF → (width, height, 3, uint8 RGB of the FIRST frame).

    Pure stdlib LZW: the per-code loop is Python (same throughput class
    as the JPEG Huffman loop); palette mapping and interlace reorder are
    vectorized numpy. Animated GIFs yield frame 1; malformed input
    raises ValueError.
    """
    if data[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF")
    sw = int.from_bytes(data[6:8], "little")
    sh = int.from_bytes(data[8:10], "little")
    flags = data[10]
    pos = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        gct = np.frombuffer(data[pos:pos + 3 * n], np.uint8).reshape(-1, 3)
        pos += 3 * n
    while pos < len(data):
        block = data[pos]
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension: label + length-prefixed sub-blocks
            pos += 2
            while data[pos] != 0:
                pos += 1 + data[pos]
            pos += 1
            continue
        if block != 0x2C:
            raise ValueError(f"unknown GIF block 0x{block:02x}")
        # image descriptor
        ix = int.from_bytes(data[pos + 1:pos + 3], "little")
        iy = int.from_bytes(data[pos + 3:pos + 5], "little")
        iw = int.from_bytes(data[pos + 5:pos + 7], "little")
        ih = int.from_bytes(data[pos + 7:pos + 9], "little")
        iflags = data[pos + 9]
        pos += 10
        pal = gct
        if iflags & 0x80:
            n = 2 << (iflags & 0x07)
            pal = np.frombuffer(data[pos:pos + 3 * n], np.uint8).reshape(-1, 3)
            pos += 3 * n
        if pal is None:
            raise ValueError("GIF image without a color table")
        min_code = data[pos]
        pos += 1
        chunks = []
        while data[pos] != 0:
            ln = data[pos]
            chunks.append(data[pos + 1:pos + 1 + ln])
            pos += 1 + ln
        pos += 1
        indices = _lzw_decode(b"".join(chunks), min_code, iw * ih)
        idx = np.asarray(indices[: iw * ih], np.int64)
        if idx.size < iw * ih:
            raise ValueError("truncated GIF image data")
        if idx.max(initial=0) >= len(pal):
            raise ValueError("GIF index out of palette range")
        frame = pal[idx].reshape(ih, iw, 3)
        if iflags & 0x40:  # interlaced: 4-pass row order
            order = np.concatenate([np.arange(0, ih, 8), np.arange(4, ih, 8),
                                    np.arange(2, ih, 4), np.arange(1, ih, 2)])
            out = np.empty_like(frame)
            out[order] = frame
            frame = out
        # first frame only; composite onto the logical screen if offset
        if (ix, iy, iw, ih) != (0, 0, sw, sh):
            screen = np.zeros((sh, sw, 3), np.uint8)
            screen[iy:iy + ih, ix:ix + iw] = frame[: sh - iy, : sw - ix]
            frame = screen
        return sw, sh, 3, frame
    raise ValueError("GIF contains no image")


def _lzw_decode(data: bytes, min_code: int, limit: int) -> list[int]:
    clear = 1 << min_code
    end = clear + 1
    table: list[tuple[int, ...]] = [(i,) for i in range(clear)] + [(), ()]
    width = min_code + 1
    out: list[int] = []
    prev: tuple[int, ...] | None = None
    acc = bits = 0
    for byte in data:
        acc |= byte << bits
        bits += 8
        while bits >= width:
            code = acc & ((1 << width) - 1)
            acc >>= width
            bits -= width
            if code == clear:
                table = table[: clear + 2]
                width = min_code + 1
                prev = None
                continue
            if code == end:
                return out
            if prev is None:
                entry = table[code]
            elif code < len(table):
                entry = table[code]
                table.append(prev + (entry[0],))
            elif code == len(table):
                entry = prev + (prev[0],)
                table.append(entry)
            else:
                raise ValueError("corrupt LZW stream")
            out.extend(entry)
            prev = entry
            if len(table) >= (1 << width) and width < 12:
                width += 1
            if len(out) >= limit:
                return out
    return out


def encode_gif(w: int, h: int, palette: np.ndarray, indices: np.ndarray) -> bytes:
    """Fixture GIF encoder using the 'uncompressed' LZW trick: emit a
    CLEAR code often enough that the code width never grows, so every
    pixel index is written verbatim at min_code+1 bits. palette:
    (n, 3) uint8 (n a power of two ≥ 2); indices: (h, w) ints."""
    import struct as _s

    n = len(palette)
    depth = max(2, (n - 1).bit_length())
    pal = np.zeros((1 << depth, 3), np.uint8)
    pal[:n] = palette
    out = bytearray(b"GIF89a")
    out += _s.pack("<HH", w, h)
    out += bytes([0x80 | (depth - 1), 0, 0])
    out += pal.tobytes()
    out += b"\x2c" + _s.pack("<HHHH", 0, 0, w, h) + b"\x00"
    min_code = depth
    clear, width = 1 << depth, depth + 1
    out.append(min_code)
    acc = bits = 0
    payload = bytearray()

    def put(code):
        nonlocal acc, bits
        acc |= code << bits
        bits += width
        while bits >= 8:
            payload.append(acc & 0xFF)
            acc >>= 8
            bits -= 8

    put(clear)
    flat = np.asarray(indices).reshape(-1)
    run = 0
    for v in flat:
        put(int(v))
        run += 1
        # decoder adds one table entry per emitted code; reset before
        # the table reaches 2^width and the expected width would grow
        if run >= clear - 2:
            put(clear)
            run = 0
    put(clear + 1)  # END
    if bits:
        payload.append(acc & 0xFF)
    for i in range(0, len(payload), 255):
        chunk = payload[i:i + 255]
        out.append(len(chunk))
        out += chunk
    out += b"\x00\x3b"
    return bytes(out)


# ---------------------------------------------------------------------------
# MP3 (MPEG-1/2 audio layer III): frame-header metadata, no sample decode

_MP3_BITRATES_V1L3 = [0, 32, 40, 48, 56, 64, 80, 96, 112,
                      128, 160, 192, 224, 256, 320, 0]     # kbps
_MP3_BITRATES_V2L3 = [0, 8, 16, 24, 32, 40, 48, 56, 64,
                      80, 96, 112, 128, 144, 160, 0]
_MP3_RATES = {3: [44100, 48000, 32000], 2: [22050, 24000, 16000],
              0: [11025, 12000, 8000]}                      # by version bits


def parse_mp3(data: bytes) -> tuple[int, int, int, int, int]:
    """MP3 metadata → (channels, sample_rate, bitrate_bps, n_frames,
    duration_ms). Walks the frame chain (exact duration for CBR and VBR
    alike: frames × samples-per-frame / rate); skips a leading ID3v2 tag
    (syncsafe size). Raises ValueError when no valid frame chain exists.
    Sample DECODE (Huffman + IMDCT) is out of scope — this is the
    metadata contract a 100 TB audio pipeline needs for routing and
    duration accounting."""
    pos = 0
    if data[:3] == b"ID3" and len(data) >= 10:
        size = ((data[6] & 0x7F) << 21) | ((data[7] & 0x7F) << 14) \
             | ((data[8] & 0x7F) << 7) | (data[9] & 0x7F)
        pos = 10 + size
    n_frames = 0
    total_samples = 0
    rate = bitrate = channels = 0
    while pos + 4 <= len(data):
        b0, b1, b2, b3 = data[pos:pos + 4]
        if b0 != 0xFF or (b1 & 0xE0) != 0xE0:
            break
        version = (b1 >> 3) & 0x03          # 3=MPEG1, 2=MPEG2, 0=MPEG2.5
        layer = (b1 >> 1) & 0x03            # 1 = Layer III
        if version == 1 or layer != 1:
            break
        br_idx = b2 >> 4
        sr_idx = (b2 >> 2) & 0x03
        if sr_idx == 3 or br_idx in (0, 15):
            break
        table = _MP3_BITRATES_V1L3 if version == 3 else _MP3_BITRATES_V2L3
        kbps = table[br_idx]
        rate = _MP3_RATES[version][sr_idx]
        padding = (b2 >> 1) & 0x01
        channels = 1 if (b3 >> 6) == 3 else 2
        samples = 1152 if version == 3 else 576
        frame_len = samples // 8 * kbps * 1000 // rate + padding
        if frame_len <= 4:
            break
        bitrate = kbps * 1000
        n_frames += 1
        total_samples += samples
        pos += frame_len
    if n_frames == 0:
        raise ValueError("no MPEG audio frames found")
    return channels, rate, bitrate, n_frames, total_samples * 1000 // rate


def encode_mp3(n_frames: int, bitrate_kbps: int = 128, rate: int = 44100,
               stereo: bool = True) -> bytes:
    """Fixture generator: a valid CBR MPEG-1 Layer III frame chain with
    zeroed payloads (headers are real; audio data is not decoded by
    parse_mp3 so silence bytes suffice)."""
    br_idx = _MP3_BITRATES_V1L3.index(bitrate_kbps)
    sr_idx = _MP3_RATES[3].index(rate)
    b2 = (br_idx << 4) | (sr_idx << 2)
    b3 = 0x00 if stereo else 0xC0
    frame_len = 144 * bitrate_kbps * 1000 // rate
    frame = bytes([0xFF, 0xFB, b2, b3]) + bytes(frame_len - 4)
    return frame * n_frames


# ---------------------------------------------------------------------------
# WebM / Matroska: EBML walk for Segment>Info duration metadata


def _ebml_read_vint(data: bytes, pos: int, strip_marker: bool) -> tuple[int, int]:
    """EBML variable-length integer at pos → (value, next_pos).
    Element IDs keep the length-marker bit (strip_marker=False);
    sizes strip it (strip_marker=True)."""
    first = data[pos]
    if first == 0:
        raise ValueError("invalid EBML vint")
    length = 8 - first.bit_length() + 1
    val = first & (0x7F >> (length - 1)) if strip_marker else first
    for i in range(1, length):
        val = (val << 8) | data[pos + i]
    return val, pos + length


def parse_webm(data: bytes) -> tuple[int | None, int | None, int | None]:
    """WebM/Matroska header metadata → (duration_ms, width, height).

    Walks the EBML tree: EBML header → Segment → Info
    (TimestampScale × Duration) and the first Tracks>TrackEntry>Video
    (PixelWidth/PixelHeight). Elements with unknown sizes or absent
    fields yield None — honest partial metadata, never a guess.
    """
    if data[:4] != b"\x1a\x45\xdf\xa3":
        raise ValueError("not an EBML stream")
    # skip the EBML header element
    _, p = _ebml_read_vint(data, 0, False)
    size, p = _ebml_read_vint(data, p, True)
    p += size
    # expect Segment (0x18538067)
    seg_id, p = _ebml_read_vint(data, p, False)
    if seg_id != 0x18538067:
        raise ValueError("no Segment element")
    _, p = _ebml_read_vint(data, p, True)  # segment size (may be unknown)

    scale = 1_000_000  # default TimestampScale: 1 ms
    duration = width = height = None

    def walk(lo: int, hi: int, depth: int):
        nonlocal scale, duration, width, height
        q = lo
        while q < hi and q < len(data):
            try:
                eid, q2 = _ebml_read_vint(data, q, False)
                esz, q3 = _ebml_read_vint(data, q2, True)
            except (ValueError, IndexError):
                return
            body = data[q3:q3 + esz]
            if eid in (0x1549A966, 0x1654AE6B, 0xAE, 0xE0):
                # Info / Tracks / TrackEntry / Video: recurse
                walk(q3, q3 + esz, depth + 1)
            elif eid == 0x2AD7B1:  # TimestampScale (uint, ns)
                scale = int.from_bytes(body, "big")
            elif eid == 0x4489:    # Duration (float, in timestamp units)
                import struct as _s

                duration = _s.unpack(">f" if esz == 4 else ">d", body)[0]
            elif eid == 0xB0:      # PixelWidth
                width = int.from_bytes(body, "big")
            elif eid == 0xBA:      # PixelHeight
                height = int.from_bytes(body, "big")
            q = q3 + esz

    walk(p, len(data), 0)
    dur_ms = int(duration * scale / 1_000_000) if duration is not None else None
    return dur_ms, width, height


def encode_webm_header(duration_ms: int, width: int, height: int) -> bytes:
    """Fixture: a minimal EBML/Matroska header carrying real Info
    (TimestampScale + Duration) and Video (PixelWidth/Height) metadata;
    no clusters (frame decode is out of scope)."""
    import struct as _s

    def elem(eid: int, body: bytes) -> bytes:
        eb = eid.to_bytes((eid.bit_length() + 7) // 8, "big")
        if len(body) >= 0x7F:
            sz = bytes([0x40 | (len(body) >> 8), len(body) & 0xFF])
        else:
            sz = bytes([0x80 | len(body)])
        return eb + sz + body

    ebml = elem(0x1A45DFA3, elem(0x4282, b"webm"))  # DocType
    info = elem(0x1549A966,
                elem(0x2AD7B1, (1_000_000).to_bytes(3, "big"))
                + elem(0x4489, _s.pack(">d", float(duration_ms))))
    video = elem(0xE0, elem(0xB0, width.to_bytes(2, "big"))
                 + elem(0xBA, height.to_bytes(2, "big")))
    tracks = elem(0x1654AE6B, elem(0xAE, video))
    return ebml + elem(0x18538067, info + tracks)


# ---------------------------------------------------------------------------
# TIFF: first-IFD dimension metadata (no raster decode)


def parse_tiff(data: bytes) -> tuple[int | None, int | None]:
    """TIFF header + first IFD → (width, height). Both byte orders;
    SHORT/LONG tag values; raises ValueError on non-TIFF bytes."""
    import struct as _s

    if data[:4] == b"II*\x00":
        endian = "<"
    elif data[:4] == b"MM\x00*":
        endian = ">"
    else:
        raise ValueError("not a TIFF")
    (ifd_off,) = _s.unpack(endian + "I", data[4:8])
    (n_entries,) = _s.unpack(endian + "H", data[ifd_off:ifd_off + 2])
    width = height = None
    for i in range(n_entries):
        e = data[ifd_off + 2 + 12 * i: ifd_off + 14 + 12 * i]
        tag, typ, _cnt = _s.unpack(endian + "HHI", e[:8])
        if typ == 3:    # SHORT: value left-justified in the 4-byte slot
            (val,) = _s.unpack(endian + "H", e[8:10])
        elif typ == 4:  # LONG
            (val,) = _s.unpack(endian + "I", e[8:12])
        else:
            continue
        if tag == 256:
            width = val
        elif tag == 257:
            height = val
    return width, height


def encode_tiff_header(width: int, height: int, big_endian: bool = False) -> bytes:
    """Fixture: minimal TIFF with one IFD carrying ImageWidth/Length."""
    import struct as _s

    endian = ">" if big_endian else "<"
    magic = b"MM\x00*" if big_endian else b"II*\x00"
    out = magic + _s.pack(endian + "I", 8)
    entries = [
        _s.pack(endian + "HHIHH", 256, 3, 1, width, 0),
        _s.pack(endian + "HHIHH", 257, 3, 1, height, 0),
    ]
    return out + _s.pack(endian + "H", len(entries)) + b"".join(entries) \
        + _s.pack(endian + "I", 0)


# ---------------------------------------------------------------------------
# MP4 / ISO-BMFF (public ISO/IEC 14496-12 box structure): moov metadata
# walk — duration, presentation dims, track inventory, sample-entry
# fourccs. Frame decode (H.264/HEVC/AV1) is out of scope; this is the
# container layer a 100 TB video-curation pass routes and filters on.


def _iter_boxes(data: bytes, lo: int, hi: int):
    """Yield (fourcc, body_start, box_end) for each box in [lo, hi).
    Handles 64-bit largesize (size==1) and to-end boxes (size==0);
    stops at the first malformed/truncated box — partial metadata over
    an exception, matching the other container parsers here."""
    p = lo
    while p + 8 <= hi:
        size = int.from_bytes(data[p:p + 4], "big")
        fourcc = data[p + 4:p + 8]
        body = p + 8
        if size == 1:
            if p + 16 > hi:
                return
            size = int.from_bytes(data[p + 8:p + 16], "big")
            body = p + 16
        elif size == 0:
            size = hi - p
        if size < 8 or p + size > hi:
            return
        yield fourcc, body, p + size
        p += size


def _find_box(data: bytes, lo: int, hi: int, path: list[bytes]):
    """First box at `path` (e.g. [b'moov', b'mvhd']) → (body, end) or None."""
    for fourcc, body, end in _iter_boxes(data, lo, hi):
        if fourcc == path[0]:
            if len(path) == 1:
                return body, end
            return _find_box(data, body, end, path[1:])
    return None


def parse_mp4(data: bytes) -> tuple[int | None, int | None, int | None,
                                    int, str | None, str | None]:
    """ISO-BMFF metadata → (duration_ms, width, height, n_tracks,
    video_codec, major_brand).

    duration: moov>mvhd timescale+duration (version 0 and 1 layouts);
    width/height: the video trak's tkhd 16.16 fixed-point presentation
    size; video_codec: that trak's first stsd sample-entry fourcc
    (avc1/hev1/vp09/av01...). Absent boxes yield None — honest partial
    metadata, never a guess."""
    if len(data) < 12 or data[4:8] != b"ftyp":
        raise ValueError("not an ISO-BMFF stream: missing ftyp")
    major_brand = data[8:12].decode("ascii", "replace")
    n = len(data)

    moov = _find_box(data, 0, n, [b"moov"])
    if moov is None:
        return None, None, None, 0, None, major_brand
    mlo, mhi = moov

    duration_ms = width = height = None
    video_codec = None
    n_tracks = 0

    mvhd = _find_box(data, mlo, mhi, [b"mvhd"])
    if mvhd is not None:
        # bound reads against the mvhd box's OWN end, not the enclosing
        # moov end — a truncated mvhd must yield None, never bytes of
        # the next sibling box misread as timescale/duration
        b, e = mvhd
        version = data[b] if b < e else 0xFF
        if version == 1 and b + 32 <= e:
            timescale = int.from_bytes(data[b + 20:b + 24], "big")
            duration = int.from_bytes(data[b + 24:b + 32], "big")
        elif version == 0 and b + 24 <= e:
            timescale = int.from_bytes(data[b + 12:b + 16], "big")
            duration = int.from_bytes(data[b + 16:b + 20], "big")
        else:
            timescale = 0
            duration = 0
        if timescale > 0:
            duration_ms = duration * 1000 // timescale

    for fourcc, tlo, thi in _iter_boxes(data, mlo, mhi):
        if fourcc != b"trak":
            continue
        n_tracks += 1
        hdlr = _find_box(data, tlo, thi, [b"mdia", b"hdlr"])
        handler = data[hdlr[0] + 8:hdlr[0] + 12] if hdlr else b""
        if handler != b"vide":
            continue
        tkhd = _find_box(data, tlo, thi, [b"tkhd"])
        if tkhd is not None:
            b, e = tkhd
            off = b + (88 if data[b] == 1 else 76)  # v1: 64-bit times
            if off + 8 <= e:
                w = int.from_bytes(data[off:off + 4], "big") >> 16
                h = int.from_bytes(data[off + 4:off + 8], "big") >> 16
                if w and h:
                    width, height = w, h
        stsd = _find_box(data, tlo, thi,
                         [b"mdia", b"minf", b"stbl", b"stsd"])
        if stsd is not None and video_codec is None:
            b, e = stsd
            entry_count = int.from_bytes(data[b + 4:b + 8], "big")
            if entry_count > 0 and b + 16 <= e:
                video_codec = data[b + 12:b + 16].decode("ascii", "replace")
    return duration_ms, width, height, n_tracks, video_codec, major_brand


def encode_mp4_header(duration_ms: int, width: int, height: int,
                      video_codec: str = "avc1", timescale: int = 1000,
                      audio: bool = False, mvhd_version: int = 0) -> bytes:
    """Fixture: a structurally valid ftyp+moov (no mdat — frame decode
    is out of scope) carrying real mvhd duration, tkhd dims, hdlr
    handler types, and stsd sample-entry fourccs."""
    import struct as _s

    def box(t: bytes, *parts: bytes) -> bytes:
        body = b"".join(parts)
        return _s.pack(">I", len(body) + 8) + t + body

    duration = duration_ms * timescale // 1000
    matrix = _s.pack(">9i", 0x00010000, 0, 0, 0, 0x00010000, 0,
                     0, 0, 0x40000000)
    if mvhd_version == 1:
        mvhd = box(b"mvhd", bytes([1, 0, 0, 0]), _s.pack(">QQIQ", 0, 0,
                   timescale, duration), _s.pack(">ihhQ", 0x00010000,
                   0x0100, 0, 0), matrix, b"\x00" * 24,
                   _s.pack(">I", audio + 2))
    else:
        mvhd = box(b"mvhd", bytes(4), _s.pack(">IIII", 0, 0, timescale,
                   duration), _s.pack(">ihhQ", 0x00010000, 0x0100, 0, 0),
                   matrix, b"\x00" * 24, _s.pack(">I", audio + 2))

    def trak(track_id: int, handler: bytes, entry_fourcc: str,
             w: int = 0, h: int = 0) -> bytes:
        tkhd = box(b"tkhd", bytes([0, 0, 0, 7]),
                   _s.pack(">IIIII", 0, 0, track_id, 0, duration),
                   bytes(8), _s.pack(">hhhh", 0, 0, 0x0100, 0), matrix,
                   _s.pack(">II", w << 16, h << 16))
        hdlr = box(b"hdlr", bytes(8), handler, bytes(12), b"\x00")
        # VisualSampleEntry body: 6 reserved + data_ref_index(2) + 16
        # pre_defined/reserved + width/height(2+2) + resolutions etc.
        entry_body = (bytes(6) + _s.pack(">H", 1) + bytes(16)
                      + _s.pack(">HH", w, h) + _s.pack(">II", 0x00480000,
                      0x00480000) + bytes(4) + _s.pack(">H", 1)
                      + bytes(32) + _s.pack(">Hh", 0x18, -1))
        stsd = box(b"stsd", bytes(4), _s.pack(">I", 1),
                   box(entry_fourcc.encode("ascii"), entry_body))
        mdhd = box(b"mdhd", bytes(4), _s.pack(">IIII", 0, 0, timescale,
                   duration), _s.pack(">HH", 0x55C4, 0))
        stbl = box(b"stbl", stsd)
        minf = box(b"minf", stbl)
        mdia = box(b"mdia", mdhd, hdlr, minf)
        return box(b"trak", tkhd, mdia)

    traks = trak(1, b"vide", video_codec, width, height)
    if audio:
        traks += trak(2, b"soun", "mp4a")
    ftyp = box(b"ftyp", b"isom", _s.pack(">I", 0x200),
               b"isomiso2" + video_codec.encode("ascii")[:4].ljust(4, b" "))
    return ftyp + box(b"moov", mvhd, traks)
