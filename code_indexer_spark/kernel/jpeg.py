"""Pure-stdlib image HEADER parsers: JPEG SOF walk (VERDICT r4 item 6)
plus the trivially-cheap GIF / WebP geometry reads.

A 100 TB crawl's second-most-common image format is JPEG; full DCT
decode needs codecs absent from this container, but P5-style validation
(reference analog: indexing/image_extractor.py:69-122, which gets
dimensions from PIL's lazy header read — PIL too reads only the header
for ``.size``) needs only the frame geometry. ``parse_jpeg_header``
walks the marker stream to the first SOFn segment and returns
width/height/components/bit depth/progressive — no entropy decode, so
it is O(header bytes) regardless of image size, which is exactly what a
validation stage scanning 10^10 assets wants.

GIF geometry lives at fixed offsets in the logical-screen descriptor;
WebP's lives in the first RIFF chunk (VP8X canvas / VP8 lossy frame
tag / VP8L signature stream). All three raise ValueError on corrupt or
truncated bytes — the mapInPandas stage catches that into a
``decode_error`` row (one bad asset must never fail the task).

``make_jpeg_fixture`` writes a structurally-valid marker shell
(SOI + JFIF APP0 + SOFn + EOI, no entropy-coded scan — all a header
parse can see) so tests pin real marker-grammar bytes without
third-party imagery.
"""

from __future__ import annotations

import struct

# SOF0-SOF15 are 0xC0-0xCF minus DHT (C4), JPG (C8), DAC (CC)
_SOF_MARKERS = frozenset(range(0xC0, 0xD0)) - {0xC4, 0xC8, 0xCC}
_PROGRESSIVE_SOFS = frozenset({0xC2, 0xC6, 0xCA, 0xCE})
# markers with no length field: TEM + RST0-7 (SOI/EOI handled apart)
_STANDALONE = frozenset({0x01, *range(0xD0, 0xD8)})


def parse_jpeg_header(content: bytes) -> dict:
    """Walk JPEG markers to the first SOF; return frame geometry.

    Returns {width, height, components, bit_depth, progressive}.
    Raises ValueError on bad magic, lost marker sync, truncation, a
    zero dimension (height 0 = DNL-deferred, unsupported), or a stream
    that reaches SOS/EOI without any frame header.
    """
    c = content or b""
    if not c.startswith(b"\xff\xd8\xff"):
        raise ValueError("not a JPEG (bad SOI magic)")
    pos, n = 2, len(c)
    while pos < n:
        if c[pos] != 0xFF:
            raise ValueError(f"marker sync lost at byte {pos}")
        pos += 1
        while pos < n and c[pos] == 0xFF:  # fill bytes
            pos += 1
        if pos >= n:
            raise ValueError("truncated at marker byte")
        marker = c[pos]
        pos += 1
        if marker in _STANDALONE:
            continue
        if marker == 0xD9:  # EOI
            break
        if pos + 2 > n:
            raise ValueError("truncated segment length")
        seg_len = struct.unpack(">H", c[pos:pos + 2])[0]
        if seg_len < 2 or pos + seg_len > n:
            raise ValueError("truncated segment body")
        if marker in _SOF_MARKERS:
            body = c[pos + 2:pos + seg_len]
            if len(body) < 6:
                raise ValueError("SOF segment too short")
            bit_depth = body[0]
            height, width = struct.unpack(">HH", body[1:5])
            components = body[5]
            if len(body) < 6 + 3 * components:
                raise ValueError("SOF component table truncated")
            if width == 0 or height == 0:
                raise ValueError("zero dimension (DNL-deferred height "
                                 "unsupported)")
            return {
                "width": width,
                "height": height,
                "components": components,
                "bit_depth": bit_depth,
                "progressive": marker in _PROGRESSIVE_SOFS,
            }
        if marker == 0xDA:  # SOS with no prior SOF: no frame header
            raise ValueError("SOS before SOF (no frame header)")
        pos += seg_len
    raise ValueError("no SOF marker found")


def parse_gif_header(content: bytes) -> dict:
    """GIF logical-screen descriptor: geometry at fixed offsets 6-9
    (little-endian u16 pair right after the GIF87a/GIF89a magic)."""
    c = content or b""
    if not (c.startswith(b"GIF87a") or c.startswith(b"GIF89a")):
        raise ValueError("not a GIF (bad magic)")
    if len(c) < 13:  # magic(6) + screen descriptor(7)
        raise ValueError("truncated logical screen descriptor")
    width, height = struct.unpack("<HH", c[6:10])
    if width == 0 or height == 0:
        raise ValueError("zero dimension")
    return {"width": width, "height": height, "components": 3,
            "bit_depth": 8, "progressive": False}


def parse_webp_header(content: bytes) -> dict:
    """WebP geometry from the first RIFF chunk: VP8X extended canvas
    (24-bit LE size-minus-one pair), VP8 lossy frame tag (14-bit
    dims after the 9D 01 2A start code), or VP8L signature stream
    (14-bit size-minus-one pairs packed after the 0x2F byte)."""
    c = content or b""
    if len(c) < 12 or c[:4] != b"RIFF" or c[8:12] != b"WEBP":
        raise ValueError("not a WebP (bad RIFF magic)")
    if len(c) < 20:
        raise ValueError("truncated chunk header")
    fourcc = c[12:16]
    if fourcc == b"VP8X":
        if len(c) < 30:
            raise ValueError("truncated VP8X chunk")
        width = 1 + int.from_bytes(c[24:27], "little")
        height = 1 + int.from_bytes(c[27:30], "little")
        alpha = bool(c[20] & 0x10)
        return {"width": width, "height": height,
                "components": 4 if alpha else 3,
                "bit_depth": 8, "progressive": False}
    if fourcc == b"VP8 ":
        # key-frame tag: 3 bytes frame header, 3 bytes start code
        if len(c) < 30 or c[23:26] != b"\x9d\x01\x2a":
            raise ValueError("bad VP8 key-frame start code")
        width = struct.unpack("<H", c[26:28])[0] & 0x3FFF
        height = struct.unpack("<H", c[28:30])[0] & 0x3FFF
        if width == 0 or height == 0:
            raise ValueError("zero dimension")
        return {"width": width, "height": height, "components": 3,
                "bit_depth": 8, "progressive": False}
    if fourcc == b"VP8L":
        if len(c) < 25 or c[20] != 0x2F:
            raise ValueError("bad VP8L signature")
        bits = int.from_bytes(c[21:25], "little")
        width = (bits & 0x3FFF) + 1
        height = ((bits >> 14) & 0x3FFF) + 1
        alpha = bool((bits >> 28) & 1)
        return {"width": width, "height": height,
                "components": 4 if alpha else 3,
                "bit_depth": 8, "progressive": False}
    raise ValueError(f"unknown WebP chunk {fourcc!r}")


def make_jpeg_fixture(width: int, height: int, components: int = 3,
                      progressive: bool = False,
                      leading_segments: bytes = b"") -> bytes:
    """Structurally-valid JPEG marker shell for tests: SOI + JFIF APP0
    (+ caller-supplied extra segments, e.g. a fat APP1/Exif blob to
    prove the walk skips it) + SOFn + EOI. No entropy-coded scan — a
    header parse never reads past SOF."""
    app0 = b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    sof_body = bytes([8]) + struct.pack(">HH", height, width) \
        + bytes([components])
    for i in range(components):
        sof_body += bytes([i + 1, 0x11, 0])  # id, 1x1 sampling, DQT 0
    sof_marker = 0xC2 if progressive else 0xC0

    def seg(marker: int, body: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) \
            + body

    return (b"\xff\xd8" + seg(0xE0, app0) + leading_segments
            + seg(sof_marker, sof_body) + b"\xff\xd9")
