"""Baseline-sequential JPEG codec, pure stdlib+numpy (VERDICT r2 #3).

Implements the public ITU-T T.81 spec from scratch: marker walk, DQT /
SOF0 / DHT / SOS / DRI parsing, canonical-Huffman entropy decode with
0xFF byte-unstuffing and RSTn restart intervals, dequantize → de-zigzag
→ vectorized 8×8 IDCT (orthonormal DCT-II basis, ``einsum`` over all
blocks at once), chroma upsampling for any (h,v) sampling factors, and
JFIF YCbCr→RGB. Covers baseline (SOF0) — the overwhelming majority of
training-corpus JPEGs; progressive (SOF2) and 12-bit raise ValueError
(the multimodal layer profiles those via the digest stand-in instead of
failing the job).

All Huffman/quantization tables are read FROM THE FILE (DHT/DQT), so
decode never depends on the encoder-side constants below being exact.
``encode_jpeg`` is the test/synth helper: 4:4:4 or 4:2:0 baseline with
the spec's Annex-K example Huffman tables and all-ones quantization by
default (near-lossless, so round-trips are checkable to ±tolerance).

No reference counterpart (b-r-u/osmpbf has no media layer); this backs
the multimodal operators' image tier next to the PNG/netpbm codecs.
"""

from __future__ import annotations

import struct

import numpy as np

ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63],
    dtype=np.int64)
_UNZIG = np.argsort(ZIGZAG)

# orthonormal 8-point DCT-II basis: forward F = C @ f @ C.T,
# inverse f = C.T @ F @ C (equals T.81's 1/4·c(u)c(v)·cos·cos form)
_C = np.array([[0.5 * (np.sqrt(0.5) if u == 0 else 1.0)
                * np.cos((2 * x + 1) * u * np.pi / 16)
                for x in range(8)] for u in range(8)])

# T.81 Annex K example Huffman tables (public spec constants) — used by
# the ENCODER only; the decoder always reads tables from DHT segments.
_DC_LUM = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
           list(range(12)))
_DC_CHR = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
           list(range(12)))
_AC_LUM = ([0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 125], [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xa1, 0x08, 0x23, 0x42, 0xb1, 0xc1, 0x15, 0x52, 0xd1, 0xf0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0a, 0x16, 0x17, 0x18, 0x19, 0x1a,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2a, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3a, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4a, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5a, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6a, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7a, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8a, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9a, 0xa2, 0xa3, 0xa4, 0xa5,
    0xa6, 0xa7, 0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4, 0xb5, 0xb6, 0xb7,
    0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5, 0xc6, 0xc7, 0xc8, 0xc9,
    0xca, 0xd2, 0xd3, 0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda, 0xe1,
    0xe2, 0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea, 0xf1, 0xf2,
    0xf3, 0xf4, 0xf5, 0xf6, 0xf7, 0xf8, 0xf9, 0xfa])
_AC_CHR = ([0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 119], [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
    0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
    0x42, 0x91, 0xa1, 0xb1, 0xc1, 0x09, 0x23, 0x33, 0x52, 0xf0, 0x15,
    0x62, 0x72, 0xd1, 0x0a, 0x16, 0x24, 0x34, 0xe1, 0x25, 0xf1, 0x17,
    0x18, 0x19, 0x1a, 0x26, 0x27, 0x28, 0x29, 0x2a, 0x35, 0x36, 0x37,
    0x38, 0x39, 0x3a, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4a,
    0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5a, 0x63, 0x64, 0x65,
    0x66, 0x67, 0x68, 0x69, 0x6a, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7a, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8a,
    0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9a, 0xa2, 0xa3,
    0xa4, 0xa5, 0xa6, 0xa7, 0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4, 0xb5,
    0xb6, 0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5, 0xc6, 0xc7,
    0xc8, 0xc9, 0xca, 0xd2, 0xd3, 0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9,
    0xda, 0xe2, 0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea, 0xf2,
    0xf3, 0xf4, 0xf5, 0xf6, 0xf7, 0xf8, 0xf9, 0xfa])


def _canonical_codes(counts, symbols):
    """(counts[16], symbols) → {symbol: (code, length)} per T.81 C.2.
    Validates the table (corrupt DHT counts otherwise escape as
    StopIteration / nonsense codes instead of the ValueError the media
    fallback contract catches)."""
    if len(counts) != 16:
        raise ValueError("JPEG DHT truncated: need 16 length counts")
    if sum(counts) != len(symbols):
        raise ValueError("JPEG DHT counts do not match symbol count")
    out = {}
    it = iter(symbols)
    code = 0
    for ln in range(1, 17):
        for _ in range(counts[ln - 1]):
            if code >= (1 << ln):
                raise ValueError("JPEG DHT canonical code overflow")
            out[next(it)] = (code, ln)
            code += 1
        code <<= 1
    return out


def _decode_lut(counts, symbols):
    """{(length, code): symbol} for bit-at-a-time canonical decode."""
    return {(ln, code): sym
            for sym, (code, ln) in _canonical_codes(counts, symbols).items()}


# ---------------------------------------------------------------------------
# Header walk
# ---------------------------------------------------------------------------

def _segments(p: bytes):
    """Yields (marker, body, next_pos); stops at SOS (entropy data
    follows) or EOI."""
    if p[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload")
    pos = 2
    while pos + 4 <= len(p):
        if p[pos] != 0xFF:
            raise ValueError("JPEG marker sync lost")
        marker = p[pos + 1]
        if marker == 0xD9:          # EOI
            return
        if 0xD0 <= marker <= 0xD7:  # stray RST outside scan
            pos += 2
            continue
        (ln,) = struct.unpack_from(">H", p, pos + 2)
        body = p[pos + 4:pos + 2 + ln]
        if len(body) != ln - 2:
            raise ValueError("truncated JPEG segment")
        yield marker, body, pos + 2 + ln
        if marker == 0xDA:          # SOS — entropy-coded data follows
            return
        pos += 2 + ln
    raise ValueError("JPEG ended without SOS/EOI")


def jpeg_header(p: bytes) -> tuple[int, int]:
    """(width, height) from the SOF0/1 frame header alone — no entropy
    decode (the metadata pass must not pay a full decode per asset)."""
    for marker, body, _ in _segments(p):
        if marker in (0xC0, 0xC1):
            _, h, w = struct.unpack_from(">BHH", body, 0)
            if w <= 0 or h <= 0:
                raise ValueError(f"bad JPEG dimensions {w}x{h}")
            return w, h
        if marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                      0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(f"unsupported JPEG SOF type 0x{marker:02x}")
    raise ValueError("JPEG missing SOF frame header")


# ---------------------------------------------------------------------------
# Decode
# ---------------------------------------------------------------------------

class _BitReader:
    __slots__ = ("d", "i", "acc", "n")

    def __init__(self, d: bytes):
        self.d = d
        self.i = 0
        self.acc = 0
        self.n = 0

    def bit(self) -> int:
        if self.n == 0:
            if self.i >= len(self.d):
                raise ValueError("JPEG entropy data exhausted")
            self.acc = self.d[self.i]
            self.i += 1
            self.n = 8
        self.n -= 1
        return (self.acc >> self.n) & 1

    def bits(self, k: int) -> int:
        v = 0
        for _ in range(k):
            v = (v << 1) | self.bit()
        return v


def _extend(v: int, t: int) -> int:
    """T.81 F.2.2.1 EXTEND: t-bit magnitude → signed value."""
    return v if t == 0 or v >= (1 << (t - 1)) else v - (1 << t) + 1


def _huff_decode(r: _BitReader, lut) -> int:
    code = 0
    for ln in range(1, 17):
        code = (code << 1) | r.bit()
        sym = lut.get((ln, code))
        if sym is not None:
            return sym
    raise ValueError("invalid JPEG Huffman code")


def decode_jpeg(p: bytes) -> np.ndarray:
    """Baseline-sequential JPEG → (h, w, c) uint8 (c = 1 grayscale or
    3 RGB). Tables come from the file's own DQT/DHT segments; restart
    intervals honoured; per-block math vectorized (one einsum IDCT over
    every block of a component)."""
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}
    sof = None
    restart = 0
    scan = None
    pos_after_sos = None
    for marker, body, nxt in _segments(p):
        if marker == 0xDB:                      # DQT
            o = 0
            while o < len(body):
                pq, tq = body[o] >> 4, body[o] & 15
                if pq != 0:
                    raise ValueError("16-bit JPEG quant tables unsupported")
                qt[tq] = np.frombuffer(body, np.uint8, 64, o + 1) \
                    .astype(np.int64)
                o += 65
        elif marker in (0xC0, 0xC1):            # SOF0/1 (baseline huff)
            prec, h, w, nc = struct.unpack_from(">BHHB", body, 0)
            if prec != 8:
                raise ValueError("only 8-bit JPEG supported")
            if nc not in (1, 3):
                # 4-component (Adobe CMYK/YCCK) is baseline-LEGAL, so it
                # must raise — silently running YCbCr math over the
                # first 3 channels would corrupt features instead of
                # engaging the profile fallback
                raise ValueError(f"unsupported JPEG component count {nc}"
                                 f" (grayscale/YCbCr only)")
            comps = []
            for i in range(nc):
                cid, hv, tq = struct.unpack_from(">BBB", body, 6 + 3 * i)
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 15,
                              "tq": tq})
            sof = (w, h, comps)
        elif marker == 0xC4:                    # DHT
            o = 0
            while o < len(body):
                tc, th = body[o] >> 4, body[o] & 15
                counts = list(body[o + 1:o + 17])
                ns = sum(counts)
                syms = list(body[o + 17:o + 17 + ns])
                huff[(tc, th)] = _decode_lut(counts, syms)
                o += 17 + ns
        elif marker == 0xDD:                    # DRI
            (restart,) = struct.unpack_from(">H", body, 0)
        elif marker == 0xDA:                    # SOS
            ns = body[0]
            if len(body) < 1 + 2 * ns:
                raise ValueError("JPEG SOS header truncated")
            scan = [(body[1 + 2 * i], body[2 + 2 * i] >> 4,
                     body[2 + 2 * i] & 15) for i in range(ns)]
            pos_after_sos = nxt
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(f"unsupported JPEG SOF type 0x{marker:02x}")
    if sof is None or scan is None:
        raise ValueError("JPEG missing SOF/SOS")
    w, h, comps = sof
    if w <= 0 or h <= 0:
        raise ValueError(f"bad JPEG dimensions {w}x{h}")
    by_id = {c["id"]: c for c in comps}
    order = []                                  # scan-ordered components
    for cid, td, ta in scan:
        c = by_id.get(cid)
        if c is None:
            raise ValueError(f"JPEG scan references unknown component "
                             f"{cid}")
        c["dc"] = huff.get((0, td))
        c["ac"] = huff.get((1, ta))
        if c["dc"] is None or c["ac"] is None:
            raise ValueError("JPEG scan references missing Huffman table")
        order.append(c)
    for c in comps:
        if c["tq"] not in qt:
            raise ValueError(f"JPEG component references missing quant "
                             f"table {c['tq']}")
        if c["h"] not in (1, 2, 4) or c["v"] not in (1, 2, 4):
            raise ValueError("bad JPEG sampling factors")

    # split entropy data at RST markers, unstuff 0xFF00
    tail = p[pos_after_sos:]
    segments = []
    cur = bytearray()
    i = 0
    while i < len(tail):
        b = tail[i]
        if b == 0xFF and i + 1 < len(tail):
            m = tail[i + 1]
            if m == 0x00:
                cur.append(0xFF)
                i += 2
                continue
            if 0xD0 <= m <= 0xD7:               # RSTn
                segments.append(bytes(cur))
                cur = bytearray()
                i += 2
                continue
            break                               # EOI or next marker
        cur.append(b)
        i += 1
    segments.append(bytes(cur))

    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    for c in comps:
        c["bw"] = mcux * c["h"]                 # blocks across
        c["bh"] = mcuy * c["v"]
        c["coef"] = np.zeros((c["bh"] * c["bw"], 64), dtype=np.int64)

    n_mcu = mcux * mcuy
    mcu_i = 0
    for seg in segments:
        r = _BitReader(seg)
        pred = {c["id"]: 0 for c in comps}
        end = min(n_mcu, mcu_i + restart) if restart else n_mcu
        while mcu_i < end:
            my, mx = divmod(mcu_i, mcux)
            for c in order:
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        blk = np.zeros(64, dtype=np.int64)
                        t = _huff_decode(r, c["dc"])
                        if t > 15:
                            # T.81 F.1.2.1: DC category ≤ 15 — a corrupt
                            # table otherwise yields a >15-bit diff that
                            # overflows the int64 coefficient store
                            raise ValueError("JPEG DC category "
                                             f"{t} out of range")
                        diff = _extend(r.bits(t), t)
                        pred[c["id"]] += diff
                        blk[0] = pred[c["id"]]
                        k = 1
                        while k < 64:
                            rs = _huff_decode(r, c["ac"])
                            rr, ss = rs >> 4, rs & 15
                            if ss == 0:
                                if rr == 15:    # ZRL
                                    k += 16
                                    continue
                                break           # EOB
                            k += rr
                            if k > 63:
                                raise ValueError("JPEG AC run overflow")
                            blk[k] = _extend(r.bits(ss), ss)
                            k += 1
                        row = my * c["v"] + by
                        col = mx * c["h"] + bx
                        c["coef"][row * c["bw"] + col] = blk
            mcu_i += 1
        if mcu_i >= n_mcu:
            break
    if mcu_i < n_mcu:
        # ADVICE r3: a truncated stream (or DRI with fewer RST segments
        # than MCUs) can exhaust `segments` exactly at an interval
        # boundary without raising inside _BitReader — the undecoded
        # blocks would silently render flat gray 128, violating the
        # decode-or-raise contract the media-profile fallback relies on
        raise ValueError(
            f"JPEG entropy data ended after {mcu_i}/{n_mcu} MCUs")

    planes = []
    for c in comps:
        # coef and the DQT table are both zigzag-ordered; multiply there,
        # then de-zigzag to raster for the IDCT
        deq = (c["coef"] * qt[c["tq"]][None, :]) \
            [:, _UNZIG].reshape(-1, 8, 8).astype(np.float64)
        sp = np.einsum("ux,nuv,vy->nxy", _C, deq, _C) + 128.0
        sp = np.clip(np.round(sp), 0, 255).astype(np.uint8)
        plane = (sp.reshape(c["bh"], c["bw"], 8, 8)
                 .transpose(0, 2, 1, 3).reshape(c["bh"] * 8, c["bw"] * 8))
        plane = plane.repeat(vmax // c["v"], 0).repeat(hmax // c["h"], 1)
        planes.append(plane[:h, :w])
    if len(planes) == 1:
        return planes[0][:, :, None]
    y, cb, cr = (pl.astype(np.float64) for pl in planes[:3])
    rgb = np.stack([y + 1.402 * (cr - 128),
                    y - 0.344136 * (cb - 128) - 0.714136 * (cr - 128),
                    y + 1.772 * (cb - 128)], axis=2)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


# ---------------------------------------------------------------------------
# Encode (test/synth helper)
# ---------------------------------------------------------------------------

class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code: int, ln: int):
        for i in range(ln - 1, -1, -1):
            self.acc = (self.acc << 1) | ((code >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)       # byte stuffing
                self.acc = 0
                self.n = 0

    def flush(self):
        if self.n:
            self.write((1 << (8 - self.n)) - 1, 8 - self.n)  # 1-pad


def _category(v: int) -> int:
    return int(v).bit_length() if v >= 0 else int(-v).bit_length()


def _encode_block(wtr, blk, pred, dc_codes, ac_codes):
    diff = int(blk[0]) - pred
    t = _category(diff)
    wtr.write(*dc_codes[t])
    if t:
        wtr.write(diff if diff >= 0 else diff + (1 << t) - 1, t)
    run = 0
    for k in range(1, 64):
        v = int(blk[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            wtr.write(*ac_codes[0xF0])          # ZRL
            run -= 16
        s = _category(v)
        wtr.write(*ac_codes[(run << 4) | s])
        wtr.write(v if v >= 0 else v + (1 << s) - 1, s)
        run = 0
    if run:
        wtr.write(*ac_codes[0x00])              # EOB
    return int(blk[0])


def _blocks(plane: np.ndarray, q: np.ndarray) -> np.ndarray:
    """(H, W) float plane (already level-shifted) → (n, 64) zigzagged
    quantized DCT coefficients, block raster order."""
    H, W = plane.shape
    bh, bw = H // 8, W // 8
    blocks = (plane.reshape(bh, 8, bw, 8).transpose(0, 2, 1, 3)
              .reshape(-1, 8, 8))
    F = np.einsum("ux,nxy,vy->nuv", _C, blocks, _C)
    return np.round(F.reshape(-1, 64) / q[_UNZIG][None, :]) \
        .astype(np.int64)[:, ZIGZAG]


def encode_jpeg(img: np.ndarray, *, quant: int = 1,
                subsample: bool = False,
                restart_interval: int = 0) -> bytes:
    """(h, w, c) uint8, c ∈ {1, 3} → baseline JPEG bytes. ``quant=1``
    (all-ones tables) is near-lossless — round-trip error comes only
    from DCT/IDCT rounding. ``subsample=True`` writes 4:2:0 (chroma
    averaged 2×2) to exercise the decoder's upsampling path;
    ``restart_interval=N`` emits DRI + RSTn every N MCUs (the decoder's
    restart/DC-reset path)."""
    h, w, c = img.shape
    if c not in (1, 3):
        raise ValueError("JPEG encoder supports 1 or 3 channels")
    q = np.full(64, quant, dtype=np.int64)
    if c == 3:
        f = img.astype(np.float64)
        y = 0.299 * f[:, :, 0] + 0.587 * f[:, :, 1] + 0.114 * f[:, :, 2]
        cb = 128.0 - 0.168736 * f[:, :, 0] - 0.331264 * f[:, :, 1] \
            + 0.5 * f[:, :, 2]
        cr = 128.0 + 0.5 * f[:, :, 0] - 0.418688 * f[:, :, 1] \
            - 0.081312 * f[:, :, 2]
        planes = [y, cb, cr]
    else:
        planes = [img[:, :, 0].astype(np.float64)]

    sub = 2 if (subsample and c == 3) else 1
    hv = [(sub, sub)] + [(1, 1)] * (len(planes) - 1)
    mcu_w, mcu_h = 8 * sub, 8 * sub
    pw, ph = -(-w // mcu_w) * mcu_w, -(-h // mcu_h) * mcu_h

    def pad(pl, tw, th):
        return np.pad(pl, ((0, th - pl.shape[0]), (0, tw - pl.shape[1])),
                      mode="edge")

    coefs = []
    bw = []                                     # blocks across, per comp
    for i, pl in enumerate(planes):
        if i > 0 and sub == 2:                  # chroma 2×2 mean
            pl = pad(pl, pw, ph)
            pl = pl.reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
        else:
            pl = pad(pl, pw, ph)
        coefs.append(_blocks(pl - 128.0, q))
        bw.append(pl.shape[1] // 8)

    out = bytearray(b"\xff\xd8")                # SOI

    def seg(marker, body):
        out.extend(bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2)
                   + body)
    seg(0xDB, bytes([0]) + bytes(q.astype(np.uint8)))  # q is zigzagged
    sof = struct.pack(">BHHB", 8, h, w, len(planes))
    for i in range(len(planes)):
        sof += bytes([i + 1, (hv[i][0] << 4) | hv[i][1], 0])
    seg(0xC0, sof)
    tables = [(0, 0, _DC_LUM), (1, 0, _AC_LUM)]
    if len(planes) == 3:
        tables += [(0, 1, _DC_CHR), (1, 1, _AC_CHR)]
    for tc, th, (counts, syms) in tables:
        seg(0xC4, bytes([(tc << 4) | th]) + bytes(counts) + bytes(syms))
    if restart_interval:
        seg(0xDD, struct.pack(">H", restart_interval))
    sos = bytes([len(planes)])
    for i in range(len(planes)):
        td = ta = 0 if i == 0 else 1
        sos += bytes([i + 1, (td << 4) | ta])
    sos += bytes([0, 63, 0])
    seg(0xDA, sos)

    dc_l = _canonical_codes(*_DC_LUM)
    ac_l = _canonical_codes(*_AC_LUM)
    dc_c = _canonical_codes(*_DC_CHR)
    ac_c = _canonical_codes(*_AC_CHR)
    wtr = _BitWriter()
    pred = [0] * len(planes)
    # interleaved MCU order: hv[i] blocks per component per MCU
    n_mcux, n_mcuy = pw // mcu_w, ph // mcu_h
    rst = 0
    for mcu in range(n_mcux * n_mcuy):
        if restart_interval and mcu and mcu % restart_interval == 0:
            wtr.flush()
            out.extend(wtr.out)
            out.extend(bytes([0xFF, 0xD0 + rst % 8]))
            rst += 1
            wtr = _BitWriter()
            pred = [0] * len(planes)
        my, mx = divmod(mcu, n_mcux)
        for i in range(len(planes)):
            dc, ac = (dc_l, ac_l) if i == 0 else (dc_c, ac_c)
            for by in range(hv[i][1]):
                for bx in range(hv[i][0]):
                    row = my * hv[i][1] + by
                    col = mx * hv[i][0] + bx
                    blk = coefs[i][row * bw[i] + col]
                    pred[i] = _encode_block(wtr, blk, pred[i], dc, ac)
    wtr.flush()
    out.extend(wtr.out)
    out.extend(b"\xff\xd9")                     # EOI
    return bytes(out)
