"""Baseline TIFF 6.0 image codec in stdlib + numpy.

Completes the sniff→decode contract: ``sniff_media_type`` has always
recognized the TIFF magic (II*\\0 / MM\\0*), but the decoder registry
had no entry for it. This implements the baseline profile a curation
pipeline actually meets in the wild for scanned/archival corpora:
both byte orders, single-IFD, 8-bit grayscale (PhotometricInterpretation
1) and RGB (2), strip layout (RowsPerStrip/StripOffsets/StripByteCounts),
Compression 1 (none) and 32773 (PackBits, the run-length scheme from
the TIFF 6.0 spec §9). Everything derives from the public TIFF 6.0
specification; no imaging library. The matching encoder exists for
fixtures and the attach path (multi-strip by default so tests exercise
strip reassembly, not just a single blob).

Tag semantics mirror the reference's metadata-first posture
(operators/exif.py parses the same IFD wire format for EXIF), but this
module decodes PIXELS — stats contract identical to
decode_ppm/decode_bmp/decode_png/decode_jpeg in operators/multimodal.py:
width/height/channel means (floor-scaled) plus ``pixels`` for tests.

Unsupported baseline extensions raise ``NotImplementedError`` loudly:
LZW/JPEG-in-TIFF compression, tiled layout, planar configuration 2,
bit depths other than 8.

Scale note: per-payload kernel behind Arrow-batched ``mapInPandas``
(operators/multimodal.py) — one Python crossing per batch; PackBits
decode is a byte loop, but strips bound each loop's working set.
"""

from __future__ import annotations

import struct
from typing import Any

import numpy as np

#: Baseline tag ids (TIFF 6.0 §8)
_W, _H, _BPS, _COMP, _PHOTO = 256, 257, 258, 259, 262
_STRIP_OFF, _SPP, _RPS, _STRIP_CNT = 273, 277, 278, 279


def packbits_encode(data: bytes) -> bytes:
    """TIFF PackBits (spec §9): literal runs as (n-1, bytes), repeats
    of length>=2 as (1-n mod 256, byte). Greedy run detection — the
    canonical encoder shape."""
    out = bytearray()
    i = 0
    n = len(data)
    while i < n:
        run = 1
        while i + run < n and run < 128 and data[i + run] == data[i]:
            run += 1
        if run >= 2:
            out.append(257 - run)  # 1 - run, two's complement
            out.append(data[i])
            i += run
            continue
        lit_start = i
        i += 1
        while (
            i < n
            and i - lit_start < 128
            and not (i + 1 < n and data[i] == data[i + 1])
        ):
            i += 1
        out.append(i - lit_start - 1)
        out += data[lit_start:i]
    return bytes(out)


def packbits_decode(data: bytes, expected: int) -> bytes:
    """Inverse of :func:`packbits_encode`, stopping once ``expected``
    bytes are produced (strips may carry pad)."""
    out = bytearray()
    i = 0
    while i < len(data) and len(out) < expected:
        n = data[i]
        i += 1
        if n < 128:  # literal run of n+1
            out += data[i : i + n + 1]
            i += n + 1
        elif n > 128:  # repeat next byte 257-n times
            if i >= len(data):
                raise ValueError("PackBits repeat truncated")
            out += bytes([data[i]]) * (257 - n)
            i += 1
        # n == 128: no-op
    if len(out) < expected:
        raise ValueError("PackBits data truncated")
    return bytes(out[:expected])


def encode_tiff(
    pixels: "Any",
    compression: str = "none",
    endian: str = "<",
    rows_per_strip: int = 4,
) -> bytes:
    """TIFF 6.0 baseline writer: (h, w) uint8 gray or (h, w, 3) uint8
    RGB → single-IFD TIFF with multi-strip layout. ``compression`` is
    ``"none"`` or ``"packbits"``; ``endian`` ``"<"`` (II) or ``">"``
    (MM)."""
    arr = np.asarray(pixels, dtype=np.uint8)
    gray = arr.ndim == 2
    h, w = arr.shape[:2]
    spp = 1 if gray else 3
    comp_id = {"none": 1, "packbits": 32773}[compression]
    raw_rows = arr.reshape(h, w * spp)
    strips = []
    for y0 in range(0, h, rows_per_strip):
        strip = raw_rows[y0 : y0 + rows_per_strip].tobytes()
        strips.append(
            packbits_encode(strip) if comp_id == 32773 else strip
        )
    n_strips = len(strips)

    def entry(tag: int, ttype: int, count: int, value: bytes) -> bytes:
        return (
            struct.pack(f"{endian}HHI", tag, ttype, count)
            + value.ljust(4, b"\x00")[:4]
        )

    # layout: header(8) | IFD | offset arrays | bps array | strip data
    # width/height use type LONG — SHORT would cap dimensions at 65535
    # (a document-derived raster can be taller than that)
    tags = [
        (_W, 4, 1, struct.pack(f"{endian}I", w)),
        (_H, 4, 1, struct.pack(f"{endian}I", h)),
        (_BPS, 3, spp, None),  # resolved below (inline for gray)
        (_COMP, 3, 1, struct.pack(f"{endian}H", comp_id)),
        (_PHOTO, 3, 1, struct.pack(f"{endian}H", 1 if gray else 2)),
        (_STRIP_OFF, 4, n_strips, None),
        (_SPP, 3, 1, struct.pack(f"{endian}H", spp)),
        (_RPS, 3, 1, struct.pack(f"{endian}H", rows_per_strip)),
        (_STRIP_CNT, 4, n_strips, None),
    ]
    ifd_size = 2 + 12 * len(tags) + 4
    heap_off = 8 + ifd_size
    heap = bytearray()

    def heap_put(b: bytes) -> int:
        off = heap_off + len(heap)
        heap.extend(b)
        if len(heap) % 2:
            heap.append(0)  # TIFF values are word-aligned
        return off

    bps_bytes = struct.pack(f"{endian}{spp}H", *([8] * spp))
    bps_val = (
        bps_bytes if spp == 1 else struct.pack(f"{endian}I", heap_put(bps_bytes))
    )
    # strip data goes at the end of the heap; record offsets as we go
    strip_offsets: list[int] = []
    cnt_bytes = struct.pack(f"{endian}{n_strips}I", *(len(s) for s in strips))
    cnt_val = (
        cnt_bytes
        if n_strips == 1
        else struct.pack(f"{endian}I", heap_put(cnt_bytes))
    )
    # offsets array location must be reserved before strips land
    if n_strips > 1:
        off_array_pos = heap_put(b"\x00" * 4 * n_strips)
    for s in strips:
        strip_offsets.append(heap_put(s))
    if n_strips == 1:
        off_val = struct.pack(f"{endian}I", strip_offsets[0])
    else:
        off_bytes = struct.pack(f"{endian}{n_strips}I", *strip_offsets)
        heap[off_array_pos - heap_off : off_array_pos - heap_off + len(off_bytes)] = (
            off_bytes
        )
        off_val = struct.pack(f"{endian}I", off_array_pos)

    ifd = struct.pack(f"{endian}H", len(tags))
    for tag, ttype, count, value in tags:
        if tag == _BPS:
            value = bps_val
        elif tag == _STRIP_OFF:
            value = off_val
        elif tag == _STRIP_CNT:
            value = cnt_val
        ifd += entry(tag, ttype, count, value)
    ifd += b"\x00\x00\x00\x00"  # no next IFD
    magic = b"II*\x00" if endian == "<" else b"MM\x00*"
    header = magic + struct.pack(f"{endian}I", 8)
    return header + ifd + bytes(heap)


def decode_tiff(payload: bytes) -> dict[str, Any]:
    """Decode a baseline TIFF payload to width/height/channel means —
    the shared image-stats contract — plus ``pixels`` (H×W×3 uint8)
    for tests. Handles both byte orders, multi-strip layout, and
    PackBits; unsupported baseline extensions raise loudly."""
    if payload[:4] == b"II*\x00":
        endian = "<"
    elif payload[:4] == b"MM\x00*":
        endian = ">"
    else:
        raise ValueError("not a TIFF payload")
    (ifd_off,) = struct.unpack_from(f"{endian}I", payload, 4)
    # the IFD wire format is shared with EXIF — reuse that walker
    # (operators/exif.py) instead of keeping a second parser in sync
    from .exif import _parse_ifd

    tags: dict[int, list] = {
        t: list(v) if isinstance(v, tuple) else [v]
        for t, v in _parse_ifd(payload, endian, ifd_off).items()
        if v is not None
    }
    w = tags.get(_W, [0])[0]
    h = tags.get(_H, [0])[0]
    if not w or not h:
        raise ValueError("TIFF missing dimensions")
    spp = tags.get(_SPP, [1])[0]
    bps = tags.get(_BPS, [8] * spp)
    if any(b != 8 for b in bps):
        raise NotImplementedError(f"TIFF bit depth {bps} (only 8-bit)")
    comp = tags.get(_COMP, [1])[0]
    if comp not in (1, 32773):
        raise NotImplementedError(
            f"TIFF compression {comp} (only none/PackBits)"
        )
    if 322 in tags or 323 in tags:
        raise NotImplementedError("tiled TIFF layout")
    if tags.get(284, [1])[0] != 1:
        raise NotImplementedError("planar configuration 2")
    if spp not in (1, 3):
        raise NotImplementedError(f"TIFF samples per pixel {spp}")
    photo = tags.get(_PHOTO, [1 if spp == 1 else 2])[0]
    if photo not in (0, 1, 2):
        # palette (3), YCbCr (6), CMYK (5)… would silently mis-decode
        # as gray/RGB — fail loudly per the module contract
        raise NotImplementedError(f"TIFF photometric interpretation {photo}")
    rps = tags.get(_RPS, [h])[0] or h
    offsets = tags.get(_STRIP_OFF, [])
    counts = tags.get(_STRIP_CNT, [])
    if not offsets or len(offsets) != len(counts):
        raise ValueError("TIFF missing strip layout")
    row_bytes = w * spp
    data = bytearray()
    for si, (off, cnt) in enumerate(zip(offsets, counts)):
        rows = min(rps, h - si * rps)
        expected = rows * row_bytes
        strip = payload[off : off + cnt]
        if len(strip) < cnt:
            raise ValueError("TIFF strip truncated")
        if comp == 32773:
            data += packbits_decode(strip, expected)
        else:
            if len(strip) < expected:
                raise ValueError("TIFF strip short")
            data += strip[:expected]
    arr = np.frombuffer(bytes(data), np.uint8, h * row_bytes).reshape(
        h, w, spp
    )
    if photo == 0:  # WhiteIsZero
        arr = 255 - arr
    rgb = np.repeat(arr, 3, axis=2) if spp == 1 else arr
    n_px = w * h
    sums = rgb.sum(axis=(0, 1), dtype=np.int64)
    # round(…, 4) matches the sibling image decoders (ppm/bmp/png/
    # jpeg stats contract); oracle entries floor-scale from ``pixels``
    return {
        "width": int(w),
        "height": int(h),
        "mean_r": round(int(sums[0]) / n_px, 4),
        "mean_g": round(int(sums[1]) / n_px, 4),
        "mean_b": round(int(sums[2]) / n_px, 4),
        "pixels": rgb,
    }
