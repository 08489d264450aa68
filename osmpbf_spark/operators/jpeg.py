"""JPEG codec (baseline SOF0 + progressive SOF2), pure stdlib+numpy
(VERDICT r2 #3; SOF2 added in round 4 per VERDICT r3 #5).

Implements the public ITU-T T.81 spec from scratch: marker walk, DQT /
SOF0 / SOF2 / DHT / SOS / DRI parsing, canonical-Huffman entropy decode
with 0xFF byte-unstuffing and RSTn restart intervals, dequantize →
de-zigzag → vectorized 8×8 IDCT (orthonormal DCT-II basis, ``einsum``
over all blocks at once), chroma upsampling for any (h,v) sampling
factors, and JFIF YCbCr→RGB. Progressive decode (Annex G) accumulates
coefficients across DC/AC spectral-selection and successive-
approximation scans, EOB runs and per-scan restart intervals included.
12-bit / hierarchical / arithmetic variants raise ValueError (the
multimodal layer profiles those via the digest stand-in instead of
failing the job).

All Huffman/quantization tables are read FROM THE FILE (DHT/DQT), so
decode never depends on the encoder-side constants below being exact.
``encode_jpeg`` is the test/synth helper: 4:4:4 or 4:2:0 baseline with
the spec's Annex-K example Huffman tables and all-ones quantization by
default (near-lossless, so round-trips are checkable to ±tolerance);
``progressive=True`` emits a full SOF2 scan script.

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
    """16-bit peek LUT ``(sym[65536], len[65536])`` for one-step
    canonical decode (the classic libjpeg technique): the next 16
    stream bits index both tables; prefix-freedom makes every index
    resolve to exactly one symbol on a valid table, −1 where no code
    matches. Replaces the r4 bit-at-a-time dict walk — measured 4×+ on
    the entropy-decode tier (BENCH_NEWOPS.md r5)."""
    sym = np.full(1 << 16, -1, dtype=np.int16)
    lnt = np.ones(1 << 16, dtype=np.int32)
    for s, (code, ln) in _canonical_codes(counts, symbols).items():
        lo = code << (16 - ln)
        sym[lo:lo + (1 << (16 - ln))] = s
        lnt[lo:lo + (1 << (16 - ln))] = ln
    return sym.tolist(), lnt.tolist()


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
        while pos + 2 <= len(p) and p[pos + 1] == 0xFF:
            pos += 1                # T.81 B.1.1.2: optional fill bytes
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
    """(width, height) from the SOF0/1/2 frame header alone — no entropy
    decode (the metadata pass must not pay a full decode per asset)."""
    for marker, body, _ in _segments(p):
        if marker in (0xC0, 0xC1, 0xC2):
            _, h, w = struct.unpack_from(">BHH", body, 0)
            if w <= 0 or h <= 0:
                raise ValueError(f"bad JPEG dimensions {w}x{h}")
            return w, h
        if marker in (0xC3, 0xC5, 0xC6, 0xC7,
                      0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(f"unsupported JPEG SOF type 0x{marker:02x}")
    raise ValueError("JPEG missing SOF frame header")


# ---------------------------------------------------------------------------
# Decode
# ---------------------------------------------------------------------------

class _BitReader:
    """Word-at-rest bit reader: the unstuffed segment is pre-expanded
    once (numpy) into overlapping 32-bit big-endian words, so any
    16-bit peek at any bit position is two shifts and a mask on a
    Python int — no per-bit state machine. 512 zero bytes of tail pad
    let the baseline hot loop overrun a corrupt block's reads safely
    (bounded by one block) before its end-of-block bound check raises;
    ``total`` is the REAL bit length and every consume checks it."""
    __slots__ = ("w", "p", "total")

    def __init__(self, d: bytes):
        b = np.frombuffer(d, np.uint8).astype(np.uint32)
        bp = np.concatenate([b, np.zeros(512, np.uint32)])
        # memoryview, NOT .tolist(): a Python int list costs ~36 bytes
        # per input byte (review r5 — GBs transient across concurrent
        # mapInArrow decodes of large scans); the view keeps the 4-byte
        # words at rest and indexing it measured FASTER than list
        # indexing (0.16 s vs 0.45 s per 2M lookups)
        self.w = memoryview(((bp[:-3] << 24) | (bp[1:-2] << 16)
                             | (bp[2:-1] << 8) | bp[3:]))
        self.p = 0
        self.total = len(d) * 8

    def bit(self) -> int:
        p = self.p
        if p >= self.total:
            raise ValueError("JPEG entropy data exhausted")
        self.p = p + 1
        return (self.w[p >> 3] >> (31 - (p & 7))) & 1

    def bits(self, k: int) -> int:        # k ≤ 16 everywhere in T.81
        if k == 0:
            return 0
        p = self.p
        if p + k > self.total:
            raise ValueError("JPEG entropy data exhausted")
        self.p = p + k
        return ((self.w[p >> 3] >> (16 - (p & 7))) & 0xFFFF) >> (16 - k)


def _extend(v: int, t: int) -> int:
    """T.81 F.2.2.1 EXTEND: t-bit magnitude → signed value."""
    return v if t == 0 or v >= (1 << (t - 1)) else v - (1 << t) + 1


def _huff_decode(r: _BitReader, lut) -> int:
    p = r.p
    if p >= r.total:
        raise ValueError("JPEG entropy data exhausted")
    v = (r.w[p >> 3] >> (16 - (p & 7))) & 0xFFFF
    sym = lut[0][v]
    if sym < 0:
        raise ValueError("invalid JPEG Huffman code")
    p += lut[1][v]
    if p > r.total:
        raise ValueError("JPEG entropy data exhausted")
    r.p = p
    return sym


def _split_entropy(p: bytes, pos: int):
    """Entropy-coded bytes from ``pos``: unstuff 0xFF00, split at RSTn →
    (segments, end) where ``end`` is the offset of the terminating
    marker (EOI or the next segment header)."""
    segments = []
    cur = bytearray()
    i = pos
    while i < len(p):
        b = p[i]
        if b == 0xFF and i + 1 < len(p):
            m = p[i + 1]
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
    return segments, i


def _reconstruct(comps, qt, w, h, hmax, vmax) -> np.ndarray:
    """Shared tail for both frame types: dequantize (zigzag domain) →
    de-zigzag → vectorized IDCT → upsample → JFIF YCbCr→RGB."""
    planes = []
    for c in comps:
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
        elif marker == 0xC2:                    # SOF2 (progressive huff)
            return _decode_progressive(p)
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7,
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

    segments, _ = _split_entropy(p, pos_after_sos)

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
        # hot loop: peek-LUT decode inlined over the reader's word list
        # (locals, no method calls) — every 16-bit peek is two shifts +
        # a mask; a corrupt block may overrun into the reader's zero
        # pad (bounded to one block) before the per-block `p > total`
        # check raises, preserving decode-or-raise exactly
        r = _BitReader(seg)
        wl, total = r.w, r.total
        p = 0
        pred = {c["id"]: 0 for c in comps}
        end = min(n_mcu, mcu_i + restart) if restart else n_mcu
        while mcu_i < end:
            my, mx = divmod(mcu_i, mcux)
            for c in order:
                dcs, dcl = c["dc"]
                acs, acl = c["ac"]
                coef, bw, cid = c["coef"], c["bw"], c["id"]
                base = (my * c["v"]) * bw + mx * c["h"]
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        if p >= total:
                            raise ValueError("JPEG entropy data exhausted")
                        v16 = (wl[p >> 3] >> (16 - (p & 7))) & 0xFFFF
                        t = dcs[v16]
                        if t < 0:
                            raise ValueError("invalid JPEG Huffman code")
                        p += dcl[v16]
                        if t > 15:
                            # T.81 F.1.2.1: DC category ≤ 15 — a corrupt
                            # table otherwise yields a >15-bit diff that
                            # overflows the int64 coefficient store
                            raise ValueError("JPEG DC category "
                                             f"{t} out of range")
                        if t:
                            v16 = (wl[p >> 3] >> (16 - (p & 7))) & 0xFFFF
                            mag = v16 >> (16 - t)
                            p += t
                            pred[cid] += (mag if mag >= 1 << (t - 1)
                                          else mag - (1 << t) + 1)
                        blk = [0] * 64
                        blk[0] = pred[cid]
                        k = 1
                        while k < 64:
                            v16 = (wl[p >> 3] >> (16 - (p & 7))) & 0xFFFF
                            rs = acs[v16]
                            if rs < 0:
                                raise ValueError(
                                    "invalid JPEG Huffman code")
                            p += acl[v16]
                            ss = rs & 15
                            if ss == 0:
                                if rs == 0xF0:  # ZRL
                                    k += 16
                                    continue
                                break           # EOB
                            k += rs >> 4
                            if k > 63:
                                raise ValueError("JPEG AC run overflow")
                            v16 = (wl[p >> 3] >> (16 - (p & 7))) & 0xFFFF
                            mag = v16 >> (16 - ss)
                            p += ss
                            blk[k] = (mag if mag >= 1 << (ss - 1)
                                      else mag - (1 << ss) + 1)
                            k += 1
                        if p > total:
                            raise ValueError("JPEG entropy data exhausted")
                        coef[base + by * bw + bx] = blk
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

    # coef and the DQT table are both zigzag-ordered; _reconstruct
    # multiplies there, then de-zigzags to raster for the IDCT
    return _reconstruct(comps, qt, w, h, hmax, vmax)


# ---------------------------------------------------------------------------
# Progressive (SOF2) decode — T.81 Annex G
# ---------------------------------------------------------------------------

def _ac_first_block(r, blk, tab, ss, se, al, eobrun):
    """One block of an AC FIRST scan (Ah=0): baseline-style run/size
    codes shifted by the point transform, plus EOBn codes (r<15, s=0)
    whose run = 2^r + ext covers this and following all-zero blocks.
    Returns the remaining EOB run."""
    if eobrun > 0:
        return eobrun - 1
    k = ss
    while k <= se:
        rs = _huff_decode(r, tab)
        run, s = rs >> 4, rs & 15
        if s == 0:
            if run == 15:                       # ZRL
                k += 16
                continue
            eobrun = (1 << run) - 1             # this block is the first
            if run:
                eobrun += r.bits(run)
            break
        k += run
        if k > se:
            raise ValueError("JPEG AC run overflow")
        blk[k] = _extend(r.bits(s), s) << al
        k += 1
    return eobrun


def _ac_refine_block(r, blk, tab, ss, se, al, eobrun):
    """One block of an AC REFINEMENT scan (Ah>0): newly-significant
    coefficients arrive as (run, 1) + sign, with one correction bit for
    every already-nonzero coefficient passed over (T.81 G.1.2.3; the
    run counts only zero-HISTORY positions). An EOBn covers the rest of
    this block (correction bits still read) plus following blocks."""
    bit = 1 << al
    k = ss
    if eobrun == 0:
        while k <= se:
            rs = _huff_decode(r, tab)
            run, s = rs >> 4, rs & 15
            newval = 0
            if s == 0:
                if run < 15:                    # EOBn
                    eobrun = (1 << run) - 1
                    if run:
                        eobrun += r.bits(run)
                    run = 64                    # refine rest, place nothing
                # run == 15: ZRL — skip 16 zero-history positions
            elif s == 1:
                newval = bit if r.bit() else -bit
            else:
                raise ValueError("JPEG AC refinement size != 1")
            placed = not newval
            while k <= se:
                v = int(blk[k])
                if v != 0:
                    if r.bit() and not (v & bit):
                        blk[k] = v + (bit if v > 0 else -bit)
                elif run == 0:
                    if newval:
                        blk[k] = newval
                    placed = True
                    k += 1
                    break
                else:
                    run -= 1
                k += 1
            if not placed:
                # a (run,1) code whose run overruns the band end is
                # corrupt — raise like the first-scan guard rather than
                # continuing with a misaligned bit reader (code-review
                # r4: plausible-but-wrong pixels break decode-or-raise)
                raise ValueError("JPEG AC run overflow")
        return eobrun
    # block fully covered by a pending EOB run: correction bits only
    for k in range(ss, se + 1):
        v = int(blk[k])
        if v != 0:
            if r.bit() and not (v & bit):
                blk[k] = v + (bit if v > 0 else -bit)
    return eobrun - 1


def _decode_progressive(p: bytes) -> np.ndarray:
    """Progressive JPEG (SOF2) → (h, w, c) uint8. Walks EVERY marker
    segment (tables may be redefined between scans), accumulating DCT
    coefficients across DC/AC first and refinement passes per T.81
    Annex G, then reuses the shared dequantize/IDCT/upsample tail.
    Spectral selection, successive approximation, EOB runs, restart
    intervals, and non-interleaved AC scan geometry all honoured;
    truncated or over-short entropy data raises (decode-or-raise
    contract, same as baseline)."""
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}
    restart = 0
    comps = None
    w = h = hmax = vmax = mcux = mcuy = 0
    dc_first_done: set[int] = set()
    pos = 2
    if p[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload")
    saw_eoi = False
    while pos + 2 <= len(p):
        if p[pos] != 0xFF:
            raise ValueError("JPEG marker sync lost")
        while pos + 2 <= len(p) and p[pos + 1] == 0xFF:
            pos += 1                            # T.81 B.1.1.2 fill bytes
        if pos + 2 > len(p):
            break
        marker = p[pos + 1]
        if marker == 0xD9:                      # EOI
            saw_eoi = True
            break
        if 0xD0 <= marker <= 0xD7:              # stray RST
            pos += 2
            continue
        if pos + 4 > len(p):
            raise ValueError("truncated JPEG segment")
        (ln,) = struct.unpack_from(">H", p, pos + 2)
        body = p[pos + 4:pos + 2 + ln]
        if len(body) != ln - 2:
            raise ValueError("truncated JPEG segment")
        nxt = pos + 2 + ln
        if marker == 0xDB:                      # DQT
            o = 0
            while o < len(body):
                pq, tq = body[o] >> 4, body[o] & 15
                if pq != 0:
                    raise ValueError("16-bit JPEG quant tables unsupported")
                qt[tq] = np.frombuffer(body, np.uint8, 64, o + 1) \
                    .astype(np.int64)
                o += 65
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
        elif marker == 0xC2:                    # SOF2
            if comps is not None:
                raise ValueError("multiple JPEG frame headers")
            prec, h, w, nc = struct.unpack_from(">BHHB", body, 0)
            if prec != 8:
                raise ValueError("only 8-bit JPEG supported")
            if nc not in (1, 3):
                raise ValueError(f"unsupported JPEG component count {nc}"
                                 f" (grayscale/YCbCr only)")
            if w <= 0 or h <= 0:
                raise ValueError(f"bad JPEG dimensions {w}x{h}")
            comps = []
            for i in range(nc):
                cid, hv, tq = struct.unpack_from(">BBB", body, 6 + 3 * i)
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 15,
                              "tq": tq})
            for c in comps:
                if c["h"] not in (1, 2, 4) or c["v"] not in (1, 2, 4):
                    raise ValueError("bad JPEG sampling factors")
            hmax = max(c["h"] for c in comps)
            vmax = max(c["v"] for c in comps)
            mcux = -(-w // (8 * hmax))
            mcuy = -(-h // (8 * vmax))
            for c in comps:
                c["bw"] = mcux * c["h"]
                c["bh"] = mcuy * c["v"]
                c["coef"] = np.zeros((c["bh"] * c["bw"], 64),
                                     dtype=np.int64)
                # non-interleaved scans cover only the ACTUAL blocks of
                # the (possibly subsampled) component, no MCU padding
                cw = -(-w * c["h"] // hmax)
                ch = -(-h * c["v"] // vmax)
                c["nbw"] = -(-cw // 8)
                c["nbh"] = -(-ch // 8)
        elif marker in (0xC0, 0xC1, 0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError("mixed frame types in progressive JPEG")
        elif marker == 0xDA:                    # SOS — one scan
            if comps is None:
                raise ValueError("JPEG scan before frame header")
            segments, end = _split_entropy(p, nxt)
            _decode_prog_scan(body, segments, comps, huff, restart,
                              mcux, mcuy, dc_first_done)
            pos = end
            continue
        pos = nxt
    if comps is None:
        raise ValueError("JPEG missing SOF/SOS")
    if not saw_eoi:
        raise ValueError("JPEG ended without EOI")
    for c in comps:
        if c["tq"] not in qt:
            raise ValueError(f"JPEG component references missing quant "
                             f"table {c['tq']}")
        if c["id"] not in dc_first_done:
            raise ValueError("progressive scan script incomplete: "
                             f"component {c['id']} has no DC first scan")
    return _reconstruct(comps, qt, w, h, hmax, vmax)


def _decode_prog_scan(body, segments, comps, huff, restart,
                      mcux, mcuy, dc_first_done):
    """Decode one progressive scan's entropy segments into the
    components' coefficient arrays."""
    ns = body[0]
    if len(body) < 1 + 2 * ns + 3:
        raise ValueError("JPEG SOS header truncated")
    by_id = {c["id"]: c for c in comps}
    scomps = []
    for i in range(ns):
        cid = body[1 + 2 * i]
        c = by_id.get(cid)
        if c is None:
            raise ValueError(f"JPEG scan references unknown component "
                             f"{cid}")
        scomps.append((c, body[2 + 2 * i] >> 4, body[2 + 2 * i] & 15))
    ss, se = body[1 + 2 * ns], body[2 + 2 * ns]
    ah, al = body[3 + 2 * ns] >> 4, body[3 + 2 * ns] & 15
    if se > 63 or ss > se or al > 13:
        raise ValueError(f"bad JPEG spectral selection {ss}..{se}/{al}")

    if ss == 0:                                 # DC scan
        if se != 0:
            raise ValueError("progressive DC scan must have Se=0")
        tabs = {}
        if ah == 0:
            for c, td, _ in scomps:
                tab = huff.get((0, td))
                if tab is None:
                    raise ValueError("JPEG scan references missing "
                                     "Huffman table")
                tabs[c["id"]] = tab
        if ns > 1:
            n_units = mcux * mcuy
        else:
            n_units = scomps[0][0]["nbw"] * scomps[0][0]["nbh"]
        unit = 0
        for seg in segments:
            r = _BitReader(seg)
            preds = {c["id"]: 0 for c, _, _ in scomps}
            end = min(n_units, unit + restart) if restart else n_units

            def dc_one(c, bi):
                if ah == 0:
                    t = _huff_decode(r, tabs[c["id"]])
                    if t > 15:
                        raise ValueError(f"JPEG DC category {t} "
                                         f"out of range")
                    preds[c["id"]] += _extend(r.bits(t), t)
                    c["coef"][bi, 0] = preds[c["id"]] << al
                elif r.bit():
                    c["coef"][bi, 0] |= 1 << al

            while unit < end:
                if ns > 1:
                    my, mx = divmod(unit, mcux)
                    for c, _, _ in scomps:
                        for by in range(c["v"]):
                            for bx in range(c["h"]):
                                dc_one(c, (my * c["v"] + by) * c["bw"]
                                       + mx * c["h"] + bx)
                else:
                    c = scomps[0][0]
                    row, col = divmod(unit, c["nbw"])
                    dc_one(c, row * c["bw"] + col)
                unit += 1
            if unit >= n_units:
                break
        if unit < n_units:
            raise ValueError(f"JPEG entropy data ended after "
                             f"{unit}/{n_units} units")
        if ah == 0:
            for c, _, _ in scomps:
                dc_first_done.add(c["id"])
        return

    # AC scan: single component, non-interleaved block geometry
    if ns != 1:
        raise ValueError("progressive AC scan must be single-component")
    c, _, ta = scomps[0]
    tab = huff.get((1, ta))
    if tab is None:
        raise ValueError("JPEG scan references missing Huffman table")
    n_units = c["nbw"] * c["nbh"]
    unit = 0
    for seg in segments:
        r = _BitReader(seg)
        eobrun = 0                              # EOB runs never cross RST
        end = min(n_units, unit + restart) if restart else n_units
        while unit < end:
            row, col = divmod(unit, c["nbw"])
            blk = c["coef"][row * c["bw"] + col]
            if ah == 0:
                eobrun = _ac_first_block(r, blk, tab, ss, se, al, eobrun)
            else:
                eobrun = _ac_refine_block(r, blk, tab, ss, se, al, eobrun)
            unit += 1
        if unit >= n_units:
            break
    if unit < n_units:
        raise ValueError(f"JPEG entropy data ended after "
                         f"{unit}/{n_units} units")


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


# flat identity Huffman tables for the progressive encoder: every symbol
# is its own 8-bit code (canonical: N symbols 0..N-1 all at length 8).
# Wasteful but trivially correct; the decoder always reads tables from
# DHT so nothing depends on these being optimal. The AC table stops at
# 0xFE — a DHT count is one BYTE so 256 same-length symbols cannot be
# declared, and 0xFF (run 15 with size 15) is never a legal emission.
_FLAT_DC = ([0] * 7 + [17] + [0] * 8, list(range(17)))
_FLAT_AC = ([0] * 7 + [255] + [0] * 8, list(range(255)))


def _pt_ac(v: int, al: int) -> int:
    """AC point transform: divide by 2^Al truncating toward zero
    (T.81 G.1.2.2 — DC uses an arithmetic shift instead)."""
    return v >> al if v >= 0 else -((-v) >> al)


def encode_jpeg(img: np.ndarray, *, quant: int = 1,
                subsample: bool = False,
                restart_interval: int = 0,
                progressive: bool = False) -> bytes:
    """(h, w, c) uint8, c ∈ {1, 3} → baseline JPEG bytes. ``quant=1``
    (all-ones tables) is near-lossless — round-trip error comes only
    from DCT/IDCT rounding. ``subsample=True`` writes 4:2:0 (chroma
    averaged 2×2) to exercise the decoder's upsampling path;
    ``restart_interval=N`` emits DRI + RSTn every N MCUs (the decoder's
    restart/DC-reset path). ``progressive=True`` writes SOF2 with the
    classic spectral-selection + successive-approximation script (DC
    Al=1→0, luma AC bands 1-5/6-63 Al=2→1→0, chroma AC Al=1→0), EOB-run
    accumulation included — the coefficients reassemble exactly, so a
    progressive round-trip decodes bit-identically to the baseline
    encoding of the same image."""
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
    if progressive:
        seg(0xC2, sof)
        for tc, th, (counts, syms) in [(0, 0, _FLAT_DC), (1, 0, _FLAT_AC)]:
            seg(0xC4, bytes([(tc << 4) | th]) + bytes(counts) + bytes(syms))
        if restart_interval:
            seg(0xDD, struct.pack(">H", restart_interval))
        nb = []
        for i in range(len(planes)):
            cw = -(-w * hv[i][0] // sub)
            ch = -(-h * hv[i][1] // sub)
            nb.append((-(-cw // 8), -(-ch // 8)))
        _encode_progressive_scans(out, seg, coefs, bw, hv,
                                  pw // mcu_w, ph // mcu_h, nb,
                                  restart_interval)
        out.extend(b"\xff\xd9")                 # EOI
        return bytes(out)
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


def _encode_progressive_scans(out, seg, coefs, bw, hv, n_mcux, n_mcuy,
                              nb, restart):
    """Emit the progressive scan script (T.81 Annex G): interleaved DC
    first/refine scans, per-component non-interleaved AC first/refine
    scans with EOB-run accumulation (multi-block EOBn + buffered
    correction bits, mirroring ``_ac_refine_block`` bit-for-bit)."""
    ncomp = len(coefs)
    dc_codes = _canonical_codes(*_FLAT_DC)
    ac_codes = _canonical_codes(*_FLAT_AC)

    def sos_header(comp_ids, ss, se, ah, al):
        b = bytes([len(comp_ids)])
        for i in comp_ids:
            b += bytes([i + 1, 0])              # td = ta = 0 (flat tables)
        b += bytes([ss, se, (ah << 4) | al])
        seg(0xDA, b)

    class _SW:
        def __init__(self):
            self.wtr = _BitWriter()
            self.rst = 0

        def restart_now(self):
            self.wtr.flush()
            out.extend(self.wtr.out)
            out.extend(bytes([0xFF, 0xD0 + self.rst % 8]))
            self.rst += 1
            self.wtr = _BitWriter()

        def finish(self):
            self.wtr.flush()
            out.extend(self.wtr.out)

    def dc_scan(ah, al):
        sos_header(list(range(ncomp)), 0, 0, ah, al)
        sw = _SW()
        pred = [0] * ncomp
        for mcu in range(n_mcux * n_mcuy):
            if restart and mcu and mcu % restart == 0:
                sw.restart_now()
                pred = [0] * ncomp
            my, mx = divmod(mcu, n_mcux)
            for i in range(ncomp):
                for by in range(hv[i][1]):
                    for bx in range(hv[i][0]):
                        row = my * hv[i][1] + by
                        col = mx * hv[i][0] + bx
                        dc = int(coefs[i][row * bw[i] + col][0])
                        if ah == 0:
                            v = dc >> al        # arithmetic shift (DC)
                            diff = v - pred[i]
                            pred[i] = v
                            t = _category(diff)
                            sw.wtr.write(*dc_codes[t])
                            if t:
                                sw.wtr.write(
                                    diff if diff >= 0
                                    else diff + (1 << t) - 1, t)
                        else:
                            sw.wtr.write((dc >> al) & 1, 1)
        sw.finish()

    def ac_blocks(i):
        for row in range(nb[i][1]):
            for col in range(nb[i][0]):
                yield coefs[i][row * bw[i] + col]

    def ac_first_scan(i, ss, se, al):
        sos_header([i], ss, se, 0, al)
        sw = _SW()
        eob_cnt = 0

        def flush_eob():
            nonlocal eob_cnt
            if eob_cnt:
                rtop = eob_cnt.bit_length() - 1
                sw.wtr.write(*ac_codes[rtop << 4])
                if rtop:
                    sw.wtr.write(eob_cnt - (1 << rtop), rtop)
                eob_cnt = 0

        for u, blk in enumerate(ac_blocks(i)):
            if restart and u and u % restart == 0:
                flush_eob()
                sw.restart_now()
            vals = [_pt_ac(int(blk[k]), al) for k in range(ss, se + 1)]
            nz = [j for j, v in enumerate(vals) if v]
            if not nz:
                eob_cnt += 1
                if eob_cnt == 0x7FFF:           # EOBn caps at 2^14+ext
                    flush_eob()
                continue
            flush_eob()
            run = 0
            for j in range(nz[-1] + 1):
                v = vals[j]
                if v == 0:
                    run += 1
                    continue
                while run > 15:
                    sw.wtr.write(*ac_codes[0xF0])
                    run -= 16
                s = _category(v)
                sw.wtr.write(*ac_codes[(run << 4) | s])
                sw.wtr.write(v if v >= 0 else v + (1 << s) - 1, s)
                run = 0
            if nz[-1] < se - ss:                # trailing zeros → EOB run
                eob_cnt = 1                     # (covers this block too)
        flush_eob()
        sw.finish()

    def ac_refine_scan(i, ss, se, ah, al):
        sos_header([i], ss, se, ah, al)
        sw = _SW()
        eob_cnt = 0
        eob_bits: list[int] = []

        def flush_eob():
            nonlocal eob_cnt, eob_bits
            if eob_cnt:
                rtop = eob_cnt.bit_length() - 1
                sw.wtr.write(*ac_codes[rtop << 4])
                if rtop:
                    sw.wtr.write(eob_cnt - (1 << rtop), rtop)
                for b in eob_bits:
                    sw.wtr.write(b, 1)
                eob_cnt = 0
                eob_bits = []

        for u, blk in enumerate(ac_blocks(i)):
            if restart and u and u % restart == 0:
                flush_eob()
                sw.restart_now()
            n = se - ss + 1
            hist = [_pt_ac(int(blk[ss + j]), al + 1) != 0
                    for j in range(n)]
            cur = [_pt_ac(int(blk[ss + j]), al) for j in range(n)]
            corr = [(abs(int(blk[ss + j])) >> al) & 1 for j in range(n)]
            newsig = [j for j in range(n) if not hist[j] and cur[j] != 0]
            if not newsig:                      # EOB-covered: corr only
                eob_cnt += 1
                eob_bits.extend(corr[j] for j in range(n) if hist[j])
                if eob_cnt == 0x7FFF:
                    flush_eob()
                continue
            flush_eob()
            cursor = 0
            for posn in newsig:
                while True:
                    run = 0
                    pend: list[int] = []
                    j = cursor
                    while j < posn and run < 16:
                        if hist[j]:
                            pend.append(corr[j])
                        else:
                            run += 1
                        j += 1
                    if run == 16:               # ZRL + interleaved corr
                        sw.wtr.write(*ac_codes[0xF0])
                        for b in pend:
                            sw.wtr.write(b, 1)
                        cursor = j
                        continue
                    break
                sw.wtr.write(*ac_codes[(run << 4) | 1])
                sw.wtr.write(1 if cur[posn] > 0 else 0, 1)
                for b in pend:
                    sw.wtr.write(b, 1)
                cursor = posn + 1
            if cursor < n:                      # remainder → EOB run
                eob_cnt = 1
                eob_bits = [corr[j] for j in range(cursor, n) if hist[j]]
        flush_eob()
        sw.finish()

    # classic script: DC Al=1, luma AC bands at Al=2, chroma at Al=1,
    # then refinements down to Al=0, DC refine last. Refinement bands
    # exactly match their first-scan bands (T.81 scan-script rule).
    dc_scan(0, 1)
    ac_first_scan(0, 1, 5, 2)
    ac_first_scan(0, 6, 63, 2)
    for i in range(1, ncomp):
        ac_first_scan(i, 1, 63, 1)
    ac_refine_scan(0, 1, 5, 2, 1)
    ac_refine_scan(0, 6, 63, 2, 1)
    ac_refine_scan(0, 1, 5, 1, 0)
    ac_refine_scan(0, 6, 63, 1, 0)
    for i in range(1, ncomp):
        ac_refine_scan(i, 1, 63, 1, 0)
    dc_scan(1, 0)
