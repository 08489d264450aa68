"""GIF codec + MJPEG-in-AVI video tier (round 5).

GIF (multimodal.py) and AVI (video.py) are REAL pure-numpy decodes:
variable-width LZW, palette/interlace/animation compositing for GIF;
RIFF container walk + selective per-frame JPEG decode for AVI. The
encoders in the same modules are the round-trip oracles — every test
below compares decoder output against pixels known by construction,
never against the decoder itself.
"""

import numpy as np
import pytest

from osmpbf_spark.operators.jpeg import decode_jpeg, encode_jpeg
from osmpbf_spark.operators.multimodal import (
    _gif_lzw_decode,
    _gif_lzw_encode,
    decode_gif,
    decode_gif_frames,
    encode_gif,
    extract_media_metadata,
    gif_header,
    sniff_media_type,
)
from osmpbf_spark.operators.video import (
    avi_frame_index,
    avi_header,
    decode_avi_frames,
    encode_avi,
    sample_frame_indices,
    sample_video_frames,
)


def _pal_img(rng, h, w, n_colors=12):
    pal = rng.integers(0, 255, (n_colors, 3), dtype=np.uint8)
    return pal[rng.integers(0, n_colors, (h, w))]


# ---------------------------------------------------------------------------
# GIF
# ---------------------------------------------------------------------------

def test_gif_single_frame_roundtrip():
    rng = np.random.default_rng(11)
    img = _pal_img(rng, 9, 13)
    g = encode_gif(img)
    assert sniff_media_type(g) == "image/gif"
    assert np.array_equal(decode_gif(g), img)
    assert gif_header(g) == (13, 9, 1, None)


@pytest.mark.parametrize("h,w,colors", [(1, 1, 2), (8, 8, 2), (5, 31, 7),
                                        (16, 3, 200), (33, 17, 250)])
def test_gif_roundtrip_shapes_and_palettes(h, w, colors):
    rng = np.random.default_rng(h * 100 + w + colors)
    img = _pal_img(rng, h, w, colors)
    for interlace in (False, True):
        g = encode_gif(img, interlace=interlace)
        assert np.array_equal(decode_gif(g), img), \
            f"{h}x{w}/{colors} interlace={interlace}"


def test_gif_lzw_code_width_growth():
    """A long low-repetition index stream pushes the LZW table past
    each width boundary (9→10→11→12 bits) and into the deferred-clear
    regime at 4096 entries; the round trip must stay exact."""
    rng = np.random.default_rng(3)
    idx = rng.integers(0, 256, 40_000, dtype=np.uint8)
    data = _gif_lzw_encode(idx, 8)
    out = _gif_lzw_decode(data, 8, len(idx))
    assert np.array_equal(out, idx)


def test_gif_lzw_kwkwk_case():
    """code == next_code (the KwKwK special case) arises from aaa...;
    cover it explicitly."""
    idx = np.zeros(64, dtype=np.uint8)
    data = _gif_lzw_encode(idx, 2)
    assert np.array_equal(_gif_lzw_decode(data, 2, 64), idx)


def test_gif_animation_compositing_and_header():
    rng = np.random.default_rng(29)
    f0 = _pal_img(rng, 10, 16)
    # later frames reuse colors already in the global palette
    f1 = f0[:4, :6].copy()[::-1]
    f2 = f0[2:7, 4:11].copy()
    g = encode_gif([f0, f1, f2], delays_cs=[10, 20, 30],
                   offsets=[(0, 0), (3, 2), (8, 4)])
    assert gif_header(g) == (16, 10, 3, 600)
    frames = decode_gif_frames(g)
    assert np.array_equal(frames[0], f0)
    exp1 = f0.copy()
    exp1[2:6, 3:9] = f1
    assert np.array_equal(frames[1], exp1)
    exp2 = exp1.copy()
    exp2[4:9, 8:15] = f2
    assert np.array_equal(frames[2], exp2)
    # single-frame view = first composited frame
    assert np.array_equal(decode_gif(g), f0)


def test_gif_disposal_restore_background():
    """Disposal method 2 restores the background under the frame
    rectangle before the next frame composites."""
    rng = np.random.default_rng(31)
    f0 = _pal_img(rng, 6, 8)
    f1 = f0[:2, :3].copy()[::-1, ::-1]
    g = encode_gif([f0, f1], delays_cs=[5, 5], offsets=[(0, 0), (5, 4)],
                   disposal=2)
    frames = decode_gif_frames(g)
    assert np.array_equal(frames[0], f0)
    # frame 0 disposed to background (palette slot 0 everywhere), then
    # frame 1 composites its rectangle at (left=5, top=4)
    w, h, gct, bg, _ = __import__(
        "osmpbf_spark.operators.multimodal",
        fromlist=["_gif_blocks"])._gif_blocks(g)
    exp = np.broadcast_to(gct[bg], (6, 8, 3)).copy()
    exp[4:6, 5:8] = f1
    assert np.array_equal(frames[1], exp)


def test_gif_disposal_restore_previous():
    """Disposal method 3 reverts the canvas under the frame rectangle
    to its PRE-DRAW state — distinguishable from method 2 only when
    that state is not the background, so frame 0 (disposal 0) paints
    the full canvas first."""
    rng = np.random.default_rng(41)
    f0 = _pal_img(rng, 6, 8)
    f1 = f0[:2, :3].copy()[::-1, ::-1]
    f2 = f0[:2, :2].copy()[:, ::-1]
    g = encode_gif([f0, f1, f2], delays_cs=[5, 5, 5],
                   offsets=[(0, 0), (5, 4), (0, 0)],
                   disposal=[0, 3, 0])
    frames = decode_gif_frames(g)
    assert np.array_equal(frames[0], f0)
    exp1 = f0.copy()
    exp1[4:6, 5:8] = f1
    assert np.array_equal(frames[1], exp1)
    # frame 1's rectangle reverted to f0 (NOT background) before
    # frame 2 composited at the top-left
    exp2 = f0.copy()
    exp2[0:2, 0:2] = f2
    assert np.array_equal(frames[2], exp2)


def test_gif_transparent_index_passthrough():
    """Pixels equal to the transparent index leave the underlying
    canvas untouched. The encoder reserves an index real pixels never
    use; rewrite some of frame 2's LZW indices to it by re-encoding."""
    import osmpbf_spark.operators.multimodal as mm
    rng = np.random.default_rng(37)
    f0 = _pal_img(rng, 5, 7, 6)
    f1 = f0[::-1].copy()
    g = encode_gif([f0, f1], delays_cs=[5, 5], transparent=99)
    w, h, gct, bg, frames = mm._gif_blocks(g)
    t_idx = frames[1]["transparent"]
    assert t_idx is not None and t_idx < len(gct)
    # splice a frame-2 LZW stream whose first row is fully transparent
    idx1 = np.searchsorted(
        ((np.unique(np.concatenate([f0.reshape(-1, 3),
                                    f1.reshape(-1, 3)]), axis=0)
          [:, 0].astype(np.int64) << 16)
         | (np.unique(np.concatenate([f0.reshape(-1, 3),
                                      f1.reshape(-1, 3)]), axis=0)
            [:, 1].astype(np.int64) << 8)
         | np.unique(np.concatenate([f0.reshape(-1, 3),
                                     f1.reshape(-1, 3)]), axis=0)
         [:, 2].astype(np.int64)),
        ((f1[:, :, 0].astype(np.int64) << 16)
         | (f1[:, :, 1].astype(np.int64) << 8)
         | f1[:, :, 2].astype(np.int64))).astype(np.uint8)
    idx1[0, :] = t_idx
    depth = max(2, int(np.ceil(np.log2(len(gct)))))
    new_lzw = mm._gif_lzw_encode(idx1.ravel(), depth)
    # rebuild the container with frame 2's data swapped
    out = mm.decode_gif_frames(_rebuild_gif_with_frame2(
        g, new_lzw, depth))
    exp = f1.copy()
    exp[0, :] = f0[0, :]        # transparent row shows frame 1 beneath
    assert np.array_equal(out[1], exp)


def _rebuild_gif_with_frame2(g: bytes, new_lzw: bytes,
                             min_code: int) -> bytes:
    """Byte-surgery helper: replace the SECOND image's LZW chain."""
    import struct as _s
    p = bytearray(g)
    pos = 13
    packed = p[10]
    if packed & 0x80:
        pos += (2 << (packed & 0x07)) * 3
    seen = 0
    while True:
        b0 = p[pos]
        if b0 == 0x21:
            pos += 2
            while p[pos]:
                pos += 1 + p[pos]
            pos += 1
        elif b0 == 0x2C:
            left, top, fw, fh = _s.unpack_from("<HHHH", p, pos + 1)
            fpk = p[pos + 9]
            pos += 10
            if fpk & 0x80:
                pos += (2 << (fpk & 0x07)) * 3
            start = pos          # min_code byte
            pos += 1
            while p[pos]:
                pos += 1 + p[pos]
            pos += 1
            seen += 1
            if seen == 2:
                blocks = bytearray([min_code])
                for i in range(0, len(new_lzw), 255):
                    c = new_lzw[i:i + 255]
                    blocks += bytes([len(c)]) + c
                blocks += b"\x00"
                return bytes(p[:start]) + bytes(blocks) + bytes(p[pos:])
        else:
            raise AssertionError("frame 2 not found")


def test_gif_header_only_no_lzw_decode(monkeypatch):
    """gif_header must never inflate LZW data (the 100 TB metadata
    pass)."""
    import osmpbf_spark.operators.multimodal as mm
    rng = np.random.default_rng(41)
    g = encode_gif(_pal_img(rng, 20, 30))

    def boom(*a, **k):
        raise AssertionError("gif_header touched LZW decode")
    monkeypatch.setattr(mm, "_gif_lzw_decode", boom)
    assert mm.gif_header(g) == (30, 20, 1, None)


def _lct_gif(idx: np.ndarray, lct: np.ndarray | None,
             gct: np.ndarray | None) -> bytes:
    """Hand-build a one-frame GIF with an optional LOCAL color table
    (the in-repo encoder only ever emits a global one, so the LCT
    branch needs explicit container surgery)."""
    import struct as _s

    import osmpbf_spark.operators.multimodal as mm
    h, w = idx.shape
    out = bytearray(b"GIF89a") + _s.pack("<HH", w, h)
    if gct is not None:
        depth_g = max(2, int(np.ceil(np.log2(len(gct)))))
        pal_g = np.zeros((1 << depth_g, 3), dtype=np.uint8)
        pal_g[:len(gct)] = gct
        out += bytes([0x80 | (depth_g - 1), 0, 0]) + pal_g.tobytes()
    else:
        out += bytes([0, 0, 0])
    out += bytes([0x2C]) + _s.pack("<HHHH", 0, 0, w, h)
    if lct is not None:
        depth = max(2, int(np.ceil(np.log2(len(lct)))))
        pal = np.zeros((1 << depth, 3), dtype=np.uint8)
        pal[:len(lct)] = lct
        out += bytes([0x80 | (depth - 1)]) + pal.tobytes()
    else:
        depth = max(2, int(np.ceil(np.log2(len(gct)))))
        out += bytes([0x00])
    lzw = mm._gif_lzw_encode(idx.ravel(), depth)
    out += bytes([depth])
    for i in range(0, len(lzw), 255):
        c = lzw[i:i + 255]
        out += bytes([len(c)]) + c
    out += b"\x00\x3B"
    return bytes(out)


def test_gif_local_color_table():
    """A frame's LOCAL color table must win over the global one (and
    suffice when no global table exists at all)."""
    rng = np.random.default_rng(47)
    lct = rng.integers(0, 255, (6, 3), dtype=np.uint8)
    gct = 255 - lct                      # deliberately different colors
    idx = rng.integers(0, 6, (7, 9)).astype(np.uint8)
    # LCT only — no global table in the container
    assert np.array_equal(decode_gif(_lct_gif(idx, lct, None)), lct[idx])
    # LCT beats a present-but-different GCT
    assert np.array_equal(decode_gif(_lct_gif(idx, lct, gct)), lct[idx])
    # no table anywhere → loud error, not garbage pixels
    with pytest.raises(ValueError, match="no color table"):
        decode_gif(_lct_gif_no_tables(idx))
    # header-only walk never needs any color table
    g = _lct_gif_no_tables(idx)
    import osmpbf_spark.operators.multimodal as mm
    assert mm.gif_header(g) == (9, 7, 1, None)


def _lct_gif_no_tables(idx: np.ndarray) -> bytes:
    """One-frame GIF with NEITHER a global nor a local color table."""
    import struct as _s

    import osmpbf_spark.operators.multimodal as mm
    h, w = idx.shape
    out = bytearray(b"GIF89a") + _s.pack("<HH", w, h)
    out += bytes([0, 0, 0])
    out += bytes([0x2C]) + _s.pack("<HHHH", 0, 0, w, h) + bytes([0x00])
    lzw = mm._gif_lzw_encode(idx.ravel(), 3)
    out += bytes([3])
    for i in range(0, len(lzw), 255):
        c = lzw[i:i + 255]
        out += bytes([len(c)]) + c
    out += b"\x00\x3B"
    return bytes(out)


@pytest.mark.parametrize("mut", ["trunc_header", "trunc_data", "bad_block"])
def test_gif_malformed_raises_valueerror(mut):
    rng = np.random.default_rng(43)
    g = bytearray(encode_gif(_pal_img(rng, 6, 6)))
    if mut == "trunc_header":
        g = g[:10]
    elif mut == "trunc_data":
        g = g[:len(g) // 2]
    else:
        gct_size = (2 << (g[10] & 0x07)) * 3
        g[13 + gct_size] = 0x77       # unknown block id after the GCT
    with pytest.raises(ValueError):
        decode_gif(bytes(g))


# ---------------------------------------------------------------------------
# AVI / MJPEG
# ---------------------------------------------------------------------------

def _clip(rng, n=6, h=16, w=24):
    pal = rng.integers(0, 255, (10, 3), dtype=np.uint8)
    return [pal[rng.integers(0, 10, (h, w))] for _ in range(n)]


def test_avi_header_and_index():
    rng = np.random.default_rng(5)
    frames = _clip(rng)
    a = encode_avi(frames, fps=5)
    assert sniff_media_type(a) == "video/x-msvideo"
    assert avi_header(a) == (24, 16, 6, 200_000)
    assert len(avi_frame_index(a)) == 6


def test_avi_selective_decode_matches_jpeg_roundtrip():
    """Selected frames decode bit-identically to the JPEG codec run on
    each frame's own payload (quant=1 near-lossless)."""
    rng = np.random.default_rng(7)
    frames = _clip(rng)
    a = encode_avi(frames, fps=10)
    got = decode_avi_frames(a, [0, 3, 5])
    for i, d in zip([0, 3, 5], got):
        assert np.array_equal(d, decode_jpeg(encode_jpeg(frames[i],
                                                         quant=1)))
    # all-frames form agrees with itself, one entry per frame
    assert len(decode_avi_frames(a)) == 6


def test_avi_header_only_no_frame_decode(monkeypatch):
    import osmpbf_spark.operators.video as vid
    rng = np.random.default_rng(9)
    a = encode_avi(_clip(rng, n=3))

    def boom(*a_, **k):
        raise AssertionError("avi_header decoded a frame")
    monkeypatch.setattr(vid, "decode_jpeg", boom)
    assert vid.avi_header(a)[:3] == (24, 16, 3)
    assert len(vid.avi_frame_index(a)) == 3


def test_avi_malformed_raises_valueerror():
    rng = np.random.default_rng(13)
    a = encode_avi(_clip(rng, n=2))
    with pytest.raises(ValueError):
        avi_header(b"RIFF\x00\x00\x00\x00WAVE")
    with pytest.raises(ValueError):
        avi_header(a[:11])
    with pytest.raises(ValueError):
        decode_avi_frames(a, [99])


def test_gif_avi_fuzz_error_containment():
    """Random mutations of valid payloads (and raw noise) must raise
    only _PROFILE_FALLBACK_ERRORS — the profile-don't-fail contract
    that keeps one bad asset from killing a 100 TB job."""
    from osmpbf_spark.operators.multimodal import _PROFILE_FALLBACK_ERRORS
    rng = np.random.default_rng(101)
    g = bytearray(encode_gif(_pal_img(rng, 8, 12)))
    a = bytearray(encode_avi(_clip(rng, n=3, h=8, w=8)))
    cases = [bytes(rng.integers(0, 256, 64, dtype=np.uint8))
             for _ in range(20)]
    for src in (g, a):
        for _ in range(60):
            m = bytearray(src)
            for _ in range(rng.integers(1, 6)):
                m[rng.integers(0, len(m))] = rng.integers(0, 256)
            cases.append(bytes(m[:rng.integers(8, len(m) + 1)]))
    for p in cases:
        for dec in (decode_gif, gif_header, avi_header,
                    lambda b: decode_avi_frames(b, [0])):
            try:
                dec(p)
            except _PROFILE_FALLBACK_ERRORS:
                pass        # contained — the mapInArrow path profiles it


def test_sample_frame_indices_properties():
    assert sample_frame_indices(3, 8) == [0, 1, 2]
    assert sample_frame_indices(100, 1) == [0]
    s = sample_frame_indices(1000, 4)
    assert s[0] == 0 and s[-1] == 999 and len(s) == 4
    assert s == sorted(set(s))
    with pytest.raises(ValueError):
        sample_frame_indices(10, 0)


# ---------------------------------------------------------------------------
# Spark paths
# ---------------------------------------------------------------------------

def test_sample_video_frames_spark(spark):
    """One row per sampled frame; frames re-encode as PNG and decode
    back to the exact JPEG-round-trip pixels; non-AVI rows vanish."""
    from osmpbf_spark.operators.multimodal import decode_png
    rng = np.random.default_rng(17)
    frames = _clip(rng, n=10)
    a = encode_avi(frames, fps=4)
    df = spark.createDataFrame(
        [("m://v1", bytearray(a)), ("m://junk", bytearray(b"not a clip"))],
        "media_ref string, payload binary")
    rows = sample_video_frames(df, max_frames=4).collect()
    assert [r.frame_idx for r in rows] == [0, 3, 6, 9]
    assert all(r.media_ref == "m://v1" and r.n_frames == 10
               and (r.width, r.height) == (24, 16) for r in rows)
    for r in rows:
        exp = decode_jpeg(encode_jpeg(frames[r.frame_idx], quant=1))
        assert np.array_equal(decode_png(bytes(r.frame_png)), exp)


def test_extract_media_metadata_gif_avi_spark(spark):
    rng = np.random.default_rng(19)
    g = encode_gif([_pal_img(rng, 7, 9), _pal_img(rng, 7, 9)],
                   delays_cs=[50, 25])
    a = encode_avi(_clip(rng, n=4, h=8, w=10), fps=20)
    df = spark.createDataFrame(
        [("m://g", bytearray(g)), ("m://v", bytearray(a))],
        "media_ref string, payload binary")
    out = {r.media_ref: r for r in extract_media_metadata(df).collect()}
    assert out["m://g"].media_type == "image/gif"
    assert (out["m://g"].width, out["m://g"].height) == (9, 7)
    assert out["m://g"].duration_ms == 750
    assert out["m://v"].media_type == "video/x-msvideo"
    assert (out["m://v"].width, out["m://v"].height) == (10, 8)
    assert out["m://v"].duration_ms == 4 * 50_000 // 1000
