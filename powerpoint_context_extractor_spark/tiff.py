"""Minimal real TIFF codec (pure stdlib) — the scanned-document /
archival format next to png.py / jpeg.py / gif.py. Unlike the other
codecs the container is a pointer machine: a header picks the byte
order (II little / MM big), then Image File Directories of 12-byte
tagged entries point at out-of-line values and strip data anywhere in
the file — the part naive parsers get wrong, and worth covering in
both endiannesses.

Subset (honest ValueError outside it): single IFD, uncompressed
(Compression=1) 8-bit grayscale or RGB, any strip layout
(RowsPerStrip + StripOffsets/StripByteCounts arrays, SHORT or LONG),
PlanarConfiguration chunky. LZW/JPEG-in-TIFF, tiles, and multi-page
files raise.
"""

from __future__ import annotations

import struct

_TAG_WIDTH = 256
_TAG_HEIGHT = 257
_TAG_BPS = 258
_TAG_COMPRESSION = 259
_TAG_PHOTOMETRIC = 262
_TAG_STRIP_OFFSETS = 273
_TAG_SPP = 277
_TAG_ROWS_PER_STRIP = 278
_TAG_STRIP_BYTES = 279
_TAG_PLANAR = 284

_TYPE_SIZES = {1: 1, 3: 2, 4: 4}          # BYTE, SHORT, LONG


def render_tiff(width: int, height: int, pixels: bytes,
                channels: int = 1, big_endian: bool = False,
                rows_per_strip: int = 4) -> bytes:
    """Encode 8-bit gray (channels=1) or RGB (3) pixels as an
    uncompressed strip-organized TIFF in either byte order."""
    if channels not in (1, 3):
        raise ValueError("tiff: channels must be 1 or 3")
    if len(pixels) != width * height * channels:
        raise ValueError("tiff: pixels length != w*h*channels")
    if width <= 0 or height <= 0 or rows_per_strip <= 0:
        raise ValueError("tiff: bad dimensions")
    e = ">" if big_endian else "<"
    row_bytes = width * channels
    strips = []
    for y0 in range(0, height, rows_per_strip):
        rows = min(rows_per_strip, height - y0)
        strips.append(pixels[y0 * row_bytes:(y0 + rows) * row_bytes])
    # layout: header(8) | strip data | [bps array if RGB] |
    #         [offset/count arrays if >2 strips] | IFD
    pos = 8
    strip_offsets = []
    for s in strips:
        strip_offsets.append(pos)
        pos += len(s)
    extra = bytearray()
    extra_base = pos

    def _put_array(values: list, fmt: str) -> int:
        nonlocal extra
        off = extra_base + len(extra)
        for v in values:
            extra += struct.pack(e + fmt, v)
        return off

    entries = []

    def entry(tag: int, typ: int, values: list) -> None:
        n = len(values)
        size = _TYPE_SIZES[typ] * n
        fmt = {1: "B", 3: "H", 4: "I"}[typ]
        if size <= 4:
            packed = b"".join(struct.pack(e + fmt, v) for v in values)
            packed += b"\x00" * (4 - len(packed))
            entries.append((tag, typ, n, packed))
        else:
            off = _put_array(values, fmt)
            entries.append((tag, typ, n,
                            struct.pack(e + "I", off)))

    entry(_TAG_WIDTH, 4, [width])
    entry(_TAG_HEIGHT, 4, [height])
    entry(_TAG_BPS, 3, [8] * channels)
    entry(_TAG_COMPRESSION, 3, [1])
    entry(_TAG_PHOTOMETRIC, 3, [1 if channels == 1 else 2])
    entry(_TAG_STRIP_OFFSETS, 4, strip_offsets)
    entry(_TAG_SPP, 3, [channels])
    entry(_TAG_ROWS_PER_STRIP, 4, [rows_per_strip])
    entry(_TAG_STRIP_BYTES, 4, [len(s) for s in strips])
    entry(_TAG_PLANAR, 3, [1])
    ifd_off = extra_base + len(extra)
    out = bytearray()
    out += (b"MM" if big_endian else b"II")
    out += struct.pack(e + "H", 42)
    out += struct.pack(e + "I", ifd_off)
    for s in strips:
        out += s
    out += extra
    out += struct.pack(e + "H", len(entries))
    for tag, typ, n, val4 in sorted(entries):
        out += struct.pack(e + "HHI", tag, typ, n) + val4
    out += struct.pack(e + "I", 0)             # no next IFD
    return bytes(out)


def decode_tiff(data: bytes) -> tuple:
    """-> (width, height, channels, pixel bytes)."""
    if len(data) < 8 or data[:2] not in (b"II", b"MM"):
        raise ValueError("tiff: bad byte-order mark")
    e = "<" if data[:2] == b"II" else ">"
    (magic,) = struct.unpack(e + "H", data[2:4])
    if magic != 42:
        raise ValueError("tiff: bad magic number")
    (ifd_off,) = struct.unpack(e + "I", data[4:8])
    if ifd_off + 2 > len(data):
        raise ValueError("tiff: truncated IFD offset")
    (n_entries,) = struct.unpack(e + "H", data[ifd_off:ifd_off + 2])
    tags = {}
    for i in range(n_entries):
        o = ifd_off + 2 + 12 * i
        if o + 12 > len(data):
            raise ValueError("tiff: truncated IFD entry")
        tag, typ, n = struct.unpack(e + "HHI", data[o:o + 8])
        if typ not in _TYPE_SIZES:
            continue                           # unknown type: skip tag
        size = _TYPE_SIZES[typ] * n
        fmt = {1: "B", 3: "H", 4: "I"}[typ]
        if size <= 4:
            raw = data[o + 8:o + 8 + size]
        else:
            (voff,) = struct.unpack(e + "I", data[o + 8:o + 12])
            raw = data[voff:voff + size]
            if len(raw) != size:
                raise ValueError("tiff: out-of-line value truncated")
        tags[tag] = [struct.unpack(e + fmt,
                                   raw[k * _TYPE_SIZES[typ]:
                                       (k + 1) * _TYPE_SIZES[typ]])[0]
                     for k in range(n)]
    nxt_off = ifd_off + 2 + 12 * n_entries
    if nxt_off + 4 <= len(data):
        (nxt,) = struct.unpack(e + "I", data[nxt_off:nxt_off + 4])
        if nxt:
            raise ValueError("tiff: multi-page files unsupported")
    for req in (_TAG_WIDTH, _TAG_HEIGHT, _TAG_STRIP_OFFSETS,
                _TAG_STRIP_BYTES):
        if req not in tags:
            raise ValueError(f"tiff: missing required tag {req}")
    width = tags[_TAG_WIDTH][0]
    height = tags[_TAG_HEIGHT][0]
    channels = tags.get(_TAG_SPP, [1])[0]
    comp = tags.get(_TAG_COMPRESSION, [1])[0]
    bps = tags.get(_TAG_BPS, [8])
    planar = tags.get(_TAG_PLANAR, [1])[0]
    if comp != 1:
        raise ValueError(f"tiff: compression {comp} unsupported "
                         "(subset is uncompressed)")
    if channels not in (1, 3) or any(b != 8 for b in bps) or planar != 1:
        raise ValueError("tiff: subset is 8-bit chunky gray/RGB")
    px = bytearray()
    for off, cnt in zip(tags[_TAG_STRIP_OFFSETS],
                        tags[_TAG_STRIP_BYTES]):
        strip = data[off:off + cnt]
        if len(strip) != cnt:
            raise ValueError("tiff: truncated strip")
        px += strip
    if len(px) < width * height * channels:
        raise ValueError("tiff: strips shorter than image")
    return width, height, channels, bytes(px[:width * height * channels])
