"""Video columns: MJPEG-in-AVI decode + distributed frame sampling.

The video tier treats each clip as one opaque ``binary`` cell (the
interleaved-documents media-span shape) and makes three promises:

* **Header-only metadata** — ``avi_header`` reads the RIFF walk alone
  (width/height/frame count/frame rate); the 100 TB metadata pass never
  entropy-decodes a frame.
* **Selective decode** — ``avi_frame_index`` lists every frame chunk's
  (offset, size) by container walk, so frame sampling decodes ONLY the
  sampled frames (a 1000-frame clip sampled at 4 pays 4 JPEG decodes).
* **Real decode** — frames are baseline/progressive JPEG handled by the
  in-repo pure-numpy codec (:mod:`.jpeg`); no external libraries.

``sample_video_frames`` is the brief's frame-sample operator: one input
row per clip → one output row per sampled frame, frames re-encoded as
PNG (lossless, deterministic) so downstream image operators — resize,
features, dedup — consume them like any other image column. It is a
``mapInArrow`` over pre-partitioned media rows: narrow, no shuffle, the
same scale shape as the other multimodal operators.

Container layout is public knowledge (Microsoft AVI RIFF spec; OpenDML
extensions not needed for MJPG). Format choice: MJPEG is the one video
codec an LLM-curation sandbox can decode for real from scratch — every
frame is an independent JPEG, which also makes selective decode exact
rather than a keyframe approximation. Inter-coded formats (H.26x, VP9)
need a native codec; their seam is identical (same operator signature,
same batch shape) and is documented at the feature fallback below.
"""

from __future__ import annotations

import struct

import numpy as np
import pyarrow as pa

from pyspark.sql import DataFrame

from .jpeg import decode_jpeg, encode_jpeg, jpeg_header

FRAME_SAMPLE_DDL = ("media_ref string, frame_idx int, n_frames int, "
                    "width int, height int, frame_png binary")


def _riff_chunks(p: bytes, pos: int, end: int):
    """Yield (fourcc, body_offset, body_size, list_type) over one RIFF
    level. LIST chunks report their list type; callers recurse."""
    while pos + 8 <= end:
        cid = p[pos:pos + 4]
        (clen,) = struct.unpack_from("<I", p, pos + 4)
        body = pos + 8
        if body + clen > len(p):
            raise ValueError("AVI chunk exceeds the payload")
        if cid == b"LIST":
            if clen < 4:
                raise ValueError("AVI LIST chunk too short")
            yield cid, body + 4, clen - 4, p[body:body + 4]
        else:
            yield cid, body, clen, None
        pos = body + clen + (clen & 1)          # word-aligned


def _avi_top(p: bytes) -> tuple[int, int]:
    if p[:4] != b"RIFF" or p[8:12] != b"AVI ":
        raise ValueError("not an AVI payload")
    (rlen,) = struct.unpack_from("<I", p, 4)
    return 12, min(8 + rlen, len(p))


def avi_header(p: bytes) -> tuple[int, int, int, int]:
    """(width, height, n_frames, us_per_frame) from the ``avih`` main
    header alone — no movi walk, no frame decode (the metadata pass
    must not pay a full decode per asset at 100 TB)."""
    pos, end = _avi_top(p)
    for cid, off, size, ltype in _riff_chunks(p, pos, end):
        if cid == b"LIST" and ltype == b"hdrl":
            for cid2, off2, size2, _ in _riff_chunks(p, off, off + size):
                if cid2 == b"avih":
                    if size2 < 40:
                        raise ValueError("AVI avih chunk too short")
                    v = struct.unpack_from("<10I", p, off2)
                    us_per_frame, _, _, _, n_frames = v[:5]
                    w, h = v[8], v[9]
                    if w <= 0 or h <= 0:
                        raise ValueError(f"bad AVI dimensions {w}x{h}")
                    if us_per_frame <= 0:
                        raise ValueError("AVI zero frame interval")
                    return w, h, n_frames, us_per_frame
    raise ValueError("AVI missing avih header")


def avi_frame_index(p: bytes) -> list[tuple[int, int]]:
    """(offset, size) of every video frame chunk (``??dc``/``??db``),
    by container walk only — the selective-decode index. Recurses into
    ``rec `` grouping LISTs; ignores audio/other streams."""
    pos, end = _avi_top(p)
    frames: list[tuple[int, int]] = []

    def walk(pos: int, end: int, in_movi: bool) -> None:
        for cid, off, size, ltype in _riff_chunks(p, pos, end):
            if cid == b"LIST":
                if ltype == b"movi" or (in_movi and ltype == b"rec "):
                    walk(off, off + size, True)
            elif in_movi and cid[2:4] in (b"dc", b"db"):
                frames.append((off, size))

    walk(pos, end, False)
    return frames


def decode_avi_frames(p: bytes, indices=None) -> list[np.ndarray]:
    """Decode the selected frames (all when ``indices`` is None) →
    list of (h, w, 3) uint8. Only the selected chunks' bytes reach the
    JPEG codec — sampling cost is per sampled frame, not per clip."""
    index = avi_frame_index(p)
    if not index:
        raise ValueError("AVI has no video frame chunks")
    if indices is None:
        indices = range(len(index))
    out = []
    for i in indices:
        if not 0 <= i < len(index):
            raise ValueError(f"frame index {i} out of range "
                             f"({len(index)} frames)")
        off, size = index[i]
        out.append(decode_jpeg(p[off:off + size]))
    return out


def encode_avi(frames, *, fps: int = 10, quant: int = 1) -> bytes:
    """List of (h, w, 3) uint8 frames → MJPG-in-AVI bytes (test/synth
    helper; ``quant=1`` keeps the JPEG near-lossless so round-trips
    compare bit-identically against decode_jpeg(encode_jpeg(frame)))."""
    if not frames:
        raise ValueError("AVI encoder needs at least one frame")
    h, w = frames[0].shape[:2]
    payloads = []
    for f in frames:
        if f.shape[:2] != (h, w):
            raise ValueError("all AVI frames must share one geometry")
        payloads.append(encode_jpeg(f, quant=quant))
    max_size = max(len(b) for b in payloads)
    us_per_frame = 1_000_000 // fps

    def chunk(cid: bytes, body: bytes) -> bytes:
        return cid + struct.pack("<I", len(body)) + body + \
            (b"\x00" if len(body) & 1 else b"")

    def lst(ltype: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", ltype + body)

    avih = struct.pack("<10I", us_per_frame, max_size * fps, 0,
                       0x10,                      # AVIF_HASINDEX
                       len(frames), 0, 1, max_size, w, h) + b"\x00" * 16
    strh = (b"vids" + b"MJPG" + struct.pack("<IHHIIIIIIII",
            0, 0, 0, 0, 1, fps, 0, len(frames), max_size, 0, 0)
            + struct.pack("<4H", 0, 0, w, h))
    strf = struct.pack("<IiiHH4sIiiII", 40, w, h, 1, 24, b"MJPG",
                       w * h * 3, 0, 0, 0, 0)
    hdrl = lst(b"hdrl", chunk(b"avih", avih)
               + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)))
    movi_body = b"".join(chunk(b"00dc", b) for b in payloads)
    movi = lst(b"movi", movi_body)
    # idx1: one entry per frame, offsets relative to the movi list type
    idx_entries = []
    off = 4
    for b in payloads:
        idx_entries.append(struct.pack("<4sIII", b"00dc", 0x10,
                                       off, len(b)))
        off += 8 + len(b) + (len(b) & 1)
    idx1 = chunk(b"idx1", b"".join(idx_entries))
    body = b"AVI " + hdrl + movi + idx1
    return b"RIFF" + struct.pack("<I", len(body)) + body


def sample_frame_indices(n_frames: int, max_frames: int) -> list[int]:
    """Deterministic evenly-spaced sample of ``max_frames`` indices
    including the first and last frame — pure integer math, identical
    at any parallelism."""
    if max_frames <= 0:
        raise ValueError("max_frames must be positive")
    if n_frames <= max_frames:
        return list(range(n_frames))
    if max_frames == 1:
        return [0]
    return sorted({(i * (n_frames - 1)) // (max_frames - 1)
                   for i in range(max_frames)})


def sample_video_frames(media: DataFrame, *,
                        max_frames: int = 4) -> DataFrame:
    """Frame sampling: (media_ref, payload) → one row per sampled frame
    (media_ref, frame_idx, n_frames, width, height, frame_png).

    Sampled frames re-encode as PNG — lossless and deterministic — so
    the output column feeds every image-tier operator (resize,
    features, dedup) unchanged. Non-AVI payloads are skipped (zero
    output rows), matching the profile-don't-fail contract of the other
    media operators; a corrupt frame inside a valid container is also
    skipped rather than failing the clip. mapInArrow, narrow, no
    shuffle; only the sampled chunks' bytes reach the JPEG codec
    (see :func:`avi_frame_index`)."""
    from .multimodal import _PROFILE_FALLBACK_ERRORS, encode_png

    def batches(it):
        for batch in it:
            refs = batch.column("media_ref").to_pylist()
            payloads = batch.column("payload").to_pylist()
            rows = {"media_ref": [], "frame_idx": [], "n_frames": [],
                    "width": [], "height": [], "frame_png": []}
            for r, pl in zip(refs, payloads):
                p = bytes(pl)
                try:
                    index = avi_frame_index(p)
                except _PROFILE_FALLBACK_ERRORS:
                    continue
                if not index:
                    continue
                for i in sample_frame_indices(len(index), max_frames):
                    off, size = index[i]
                    try:
                        img = decode_jpeg(p[off:off + size])
                    except _PROFILE_FALLBACK_ERRORS:
                        continue
                    rows["media_ref"].append(r)
                    rows["frame_idx"].append(i)
                    rows["n_frames"].append(len(index))
                    rows["width"].append(img.shape[1])
                    rows["height"].append(img.shape[0])
                    rows["frame_png"].append(encode_png(img))
            yield pa.RecordBatch.from_pydict({
                "media_ref": pa.array(rows["media_ref"], pa.string()),
                "frame_idx": pa.array(rows["frame_idx"], pa.int32()),
                "n_frames": pa.array(rows["n_frames"], pa.int32()),
                "width": pa.array(rows["width"], pa.int32()),
                "height": pa.array(rows["height"], pa.int32()),
                "frame_png": pa.array(rows["frame_png"], pa.binary()),
            })
    return media.mapInArrow(batches, FRAME_SAMPLE_DDL)


__all__ = ["avi_header", "avi_frame_index", "decode_avi_frames",
           "encode_avi", "sample_frame_indices", "sample_video_frames",
           "FRAME_SAMPLE_DDL", "decode_jpeg", "encode_jpeg",
           "jpeg_header"]
