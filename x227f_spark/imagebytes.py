"""Image byte-level primitives: format sniffing, header dimension reads,
data-URI parsing, content hashing — plus deterministic synthesis of minimal
valid images for the test corpus.

The container has no imaging libraries, and the reference only ever needs
*header* information (format + dimensions) plus a hash, so everything here is
pure magic-byte parsing — which is also the fast path at scale (no decode).

Reference cites:
- format sniffing (X3):  /root/reference/src/scrape/image.rs:387,408
  (``image::guess_format`` — magic bytes)
- 88x31 validation (F10): /root/reference/src/scrape/image.rs:530-536
  (tri-state: None when undecodable)
- sha256-trunc32 (U8):    /root/reference/src/scrape/image.rs:184-191
- data-URI parse (S7):    /root/reference/src/scrape/image.rs:420-454
- re-encode (X2):         /root/reference/src/scrape/image.rs:193-267 —
  jpeg/webp/avif/bmp are byte-passthrough; the synthetic corpus uses only
  passthrough formats so hashes are pinned on source bytes (SURVEY §2 X2).
"""

from __future__ import annotations

import base64
import struct
import zlib
from urllib.parse import unquote_to_bytes

# ---------------------------------------------------------------------------
# X3 — format sniffing from magic bytes
# ---------------------------------------------------------------------------

def guess_format(data: bytes) -> str | None:
    if len(data) < 12:
        return None
    if data[:8] == b"\x89PNG\r\n\x1a\n":
        return "png"
    if data[:6] in (b"GIF87a", b"GIF89a"):
        return "gif"
    if data[:2] == b"\xff\xd8":
        return "jpeg"
    if data[:4] == b"RIFF" and data[8:12] == b"WEBP":
        return "webp"
    if data[:2] == b"BM":
        return "bmp"
    if data[4:12] in (b"ftypavif", b"ftypavis"):
        return "avif"
    return None


_FORMAT_EXT = {"png": "png", "gif": "gif", "jpeg": "jpg", "webp": "webp",
               "bmp": "bmp", "avif": "avif"}


def format_extension(fmt: str) -> str:
    """image.rs:160 — ``format.extensions_str()[0]`` equivalents."""
    return _FORMAT_EXT.get(fmt, fmt)


_MIME_FORMAT = {
    "image/png": "png",
    "image/jpeg": "jpeg",
    "image/jpg": "jpeg",
    "image/gif": "gif",
    "image/webp": "webp",
    "image/avif": "avif",
    "image/bmp": "bmp",
    "image/x-ms-bmp": "bmp",
}


def mimetype_to_format(mimetype: str) -> str | None:
    """U9 — image.rs:508-526."""
    mt = mimetype.split(";")[0].strip()
    return _MIME_FORMAT.get(mt)


# ---------------------------------------------------------------------------
# F10 — header dimension extraction (tri-state)
# ---------------------------------------------------------------------------

def image_dimensions(data: bytes, fmt: str | None = None) -> tuple[int, int] | None:
    fmt = fmt or guess_format(data)
    try:
        if fmt == "png":
            if data[12:16] != b"IHDR" or len(data) < 24:
                return None
            w, h = struct.unpack(">II", data[16:24])
            return (w, h)
        if fmt == "gif":
            if len(data) < 10:
                return None
            w, h = struct.unpack("<HH", data[6:10])
            return (w, h)
        if fmt == "bmp":
            if len(data) < 26:
                return None
            w, h = struct.unpack("<ii", data[18:26])
            return (w, abs(h))
        if fmt == "jpeg":
            return _jpeg_dimensions(data)
        if fmt == "webp":
            return _webp_dimensions(data)
    except (struct.error, IndexError):
        return None
    return None


def _jpeg_dimensions(data: bytes) -> tuple[int, int] | None:
    i = 2
    n = len(data)
    while i + 9 < n:
        if data[i] != 0xFF:
            return None
        marker = data[i + 1]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            i += 2
            continue
        seg_len = struct.unpack(">H", data[i + 2 : i + 4])[0]
        if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
            h, w = struct.unpack(">HH", data[i + 5 : i + 9])
            return (w, h)
        i += 2 + seg_len
    return None


def _webp_dimensions(data: bytes) -> tuple[int, int] | None:
    chunk = data[12:16]
    if chunk == b"VP8X" and len(data) >= 30:
        w = int.from_bytes(data[24:27], "little") + 1
        h = int.from_bytes(data[27:30], "little") + 1
        return (w, h)
    if chunk == b"VP8 " and len(data) >= 30:
        w, h = struct.unpack("<HH", data[26:30])
        return (w & 0x3FFF, h & 0x3FFF)
    if chunk == b"VP8L" and len(data) >= 25:
        b = struct.unpack("<I", data[21:25])[0]
        return ((b & 0x3FFF) + 1, ((b >> 14) & 0x3FFF) + 1)
    return None


def validate_image_size(data: bytes, fmt: str | None = None) -> bool | None:
    """F10 — image.rs:530-536: True/False/None (undecodable)."""
    dims = image_dimensions(data, fmt)
    if dims is None:
        return None
    return dims == (88, 31)


# ---------------------------------------------------------------------------
# U8 — content hash
# ---------------------------------------------------------------------------

def hash_image(data: bytes) -> str:
    """image.rs:184-191 — hex(sha256)[:32]."""
    import hashlib

    return hashlib.sha256(data).hexdigest()[:32]


# ---------------------------------------------------------------------------
# S7 — data-URI parsing
# ---------------------------------------------------------------------------

def parse_data_uri(opaque: str) -> tuple[bytes, str | None] | None:
    """image.rs:420-454 — returns (bytes, format) or None on invalid URI.

    ``opaque`` is everything after ``data:``.
    """
    if "," not in opaque:
        return None
    mediatype_and_encoding, data = opaque.split(",", 1)
    if ";" in mediatype_and_encoding:
        mediatype, encoding = mediatype_and_encoding.rsplit(";", 1)
    else:
        mediatype, encoding = mediatype_and_encoding, ""
    if not mediatype:
        mediatype = "text/plain;charset=US-ASCII"
    raw = unquote_to_bytes(data)
    if encoding == "base64":
        try:
            raw = base64.b64decode(raw, validate=True)
        except Exception:
            return None
    return (raw, mimetype_to_format(mediatype))


# ---------------------------------------------------------------------------
# Deterministic synthesis of minimal valid images (corpus generator)
# ---------------------------------------------------------------------------

def make_png(width: int, height: int, seed: int = 0, level: int = 9,
             gradient: bool = False) -> bytes:
    """Minimal truecolor PNG with a seed-dependent pixel payload.

    ``level``/``gradient`` exist for the X2 re-encode tests: level<9 or a
    y-gradient payload produce a deliberately suboptimal encoding that
    reencode_png can actually shrink (the default output is already
    level-9/constant-rows, i.e. near-optimal)."""
    def chunk(typ: bytes, payload: bytes) -> bytes:
        return (
            struct.pack(">I", len(payload))
            + typ
            + payload
            + struct.pack(">I", zlib.crc32(typ + payload) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    if gradient:
        raw = b"".join(
            bytes([0]) + bytes(
                ((seed * 31 + x * 7 + y * 5 + c) % 256)
                for x in range(width) for c in range(3))
            for y in range(height))
    else:
        row = bytes([0]) + bytes(
            ((seed * 31 + x * 7 + c) % 256)
            for x in range(width) for c in range(3)
        )
        raw = row * height
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw, level))
        + chunk(b"IEND", b"")
    )


def make_gif(width: int, height: int, seed: int = 0) -> bytes:
    """Minimal GIF87a header + trailer; enough for header sniffing and
    deterministic hashing (we never decode pixel data)."""
    header = b"GIF87a" + struct.pack("<HH", width, height) + bytes([0x80, 0, 0])
    palette = bytes(((seed + i) % 256) for i in range(6))
    return header + palette + b"\x3b"


def make_bmp(width: int, height: int, seed: int = 0) -> bytes:
    """Minimal BMP (BITMAPINFOHEADER, 24bpp)."""
    row_size = (width * 3 + 3) & ~3
    pixel_bytes = bytes(
        ((seed * 17 + i) % 256) for i in range(row_size * height)
    )
    header = (
        b"BM"
        + struct.pack("<IHHI", 54 + len(pixel_bytes), 0, 0, 54)
        + struct.pack("<IiiHHIIiiII", 40, width, height, 1, 24, 0,
                      len(pixel_bytes), 2835, 2835, 0, 0)
    )
    return header + pixel_bytes


def make_jpeg(width: int, height: int, seed: int = 0) -> bytes:
    """Header-valid JPEG (SOI + SOF0 + seeded comment + EOI). Dimension
    sniffers see (width,height); we never pixel-decode."""
    comment = bytes(((seed * 13 + i) % 256) for i in range(16))
    com_seg = b"\xff\xfe" + struct.pack(">H", len(comment) + 2) + comment
    sof = b"\xff\xc0" + struct.pack(">HBHHB", 8, 8, height, width, 1) + b"\x01\x11\x00"
    return b"\xff\xd8" + com_seg + sof + b"\xff\xd9"


MAKERS = {"png": make_png, "gif": make_gif, "bmp": make_bmp, "jpeg": make_jpeg}


def make_image(fmt: str, width: int, height: int, seed: int = 0) -> bytes:
    return MAKERS[fmt](width, height, seed)


# ---------------------------------------------------------------------------
# X2 — lossless PNG recompression (image.rs:193-230 approximated)
# ---------------------------------------------------------------------------
#
# The reference optimizes stored PNGs with oxipng (image.rs:195-206). No
# imaging/compression libs exist in this container, so the engine's real
# non-identity re-encode is a pure-Python equivalent of oxipng's cheapest
# wins: de-filter the IDAT scanlines, re-filter every row with Up (filter 2
# — the best single choice for the flat/banded art 88x31 buttons are), and
# deflate at level 9; keep the rewrite only when it is strictly smaller.
# Lossless by construction: only filters/compression change, pixels never do
# (png_pixels(original) == png_pixels(reencoded), tested).

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_BPP = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}  # color type → samples per pixel (8-bit)


def png_chunks(data: bytes) -> list[tuple[bytes, bytes]]:
    """(type, payload) chunks of a PNG byte string (no CRC verification —
    the crawl already hashed the bytes; bad lengths raise ValueError)."""
    if data[:8] != _PNG_SIG:
        raise ValueError("not a png")
    out = []
    pos = 8
    while pos + 8 <= len(data):
        (ln,) = struct.unpack(">I", data[pos:pos + 4])
        typ = data[pos + 4:pos + 8]
        payload = data[pos + 8:pos + 8 + ln]
        if len(payload) != ln:
            raise ValueError("truncated chunk")
        out.append((typ, payload))
        pos += 12 + ln
    return out


def png_idat(data: bytes) -> bytes:
    """Concatenated IDAT payloads (one zlib stream per the spec)."""
    return b"".join(p for t, p in png_chunks(data) if t == b"IDAT")


def _unfilter_rows(raw: bytes, width: int, height: int, bpp: int) -> list[bytes]:
    stride = 1 + width * bpp
    if len(raw) != stride * height:
        raise ValueError("raw size mismatch")
    rows: list[bytes] = []
    prev = bytes(stride - 1)
    for r in range(height):
        ft = raw[r * stride]
        line = bytearray(raw[r * stride + 1:(r + 1) * stride])
        if ft == 1:  # Sub
            for i in range(bpp, len(line)):
                line[i] = (line[i] + line[i - bpp]) & 255
        elif ft == 2:  # Up
            for i in range(len(line)):
                line[i] = (line[i] + prev[i]) & 255
        elif ft == 3:  # Average
            for i in range(len(line)):
                a = line[i - bpp] if i >= bpp else 0
                line[i] = (line[i] + ((a + prev[i]) >> 1)) & 255
        elif ft == 4:  # Paeth
            for i in range(len(line)):
                a = line[i - bpp] if i >= bpp else 0
                b = prev[i]
                c = prev[i - bpp] if i >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pr = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                line[i] = (line[i] + pr) & 255
        elif ft != 0:
            raise ValueError(f"unknown filter {ft}")
        prev = bytes(line)
        rows.append(prev)
    return rows


def png_pixels(data: bytes) -> bytes:
    """De-filtered scanline bytes — the lossless-invariant of reencode_png."""
    chunks = png_chunks(data)
    ihdr = next(p for t, p in chunks if t == b"IHDR")
    width, height, depth, color = struct.unpack(">IIBB", ihdr[:10])
    if depth != 8 or color not in _BPP or ihdr[12] != 0:
        raise ValueError("unsupported png layout")
    raw = zlib.decompress(png_idat(data))
    return b"".join(_unfilter_rows(raw, width, height, _BPP[color]))


def _filter_up(rows: list[bytes]) -> bytes:
    out = bytearray()
    prev = bytes(len(rows[0])) if rows else b""
    for line in rows:
        out.append(2)
        out += bytes((line[i] - prev[i]) & 255 for i in range(len(line)))
        prev = line
    return bytes(out)


def reencode_png(data: bytes, _fmt: str | None = None) -> bytes:
    """Lossless PNG shrink; returns the original bytes when no candidate is
    strictly smaller (or the layout is one we don't re-filter — interlaced,
    sub-byte depths, malformed). Signature matches the fiximages
    ``re_encode(data, fmt)`` hook."""
    try:
        chunks = png_chunks(data)
        ihdr = next(p for t, p in chunks if t == b"IHDR")
        width, height, depth, color = struct.unpack(">IIBB", ihdr[:10])
        raw = zlib.decompress(png_idat(data))
        candidates = [zlib.compress(raw, 9)]
        if depth == 8 and color in _BPP and ihdr[12] == 0:
            rows = _unfilter_rows(raw, width, height, _BPP[color])
            candidates.append(zlib.compress(_filter_up(rows), 9))
    except (ValueError, zlib.error, StopIteration):
        return data
    best = min(candidates, key=len)

    def chunk(typ: bytes, payload: bytes) -> bytes:
        return (struct.pack(">I", len(payload)) + typ + payload
                + struct.pack(">I", zlib.crc32(typ + payload) & 0xFFFFFFFF))

    out = bytearray(_PNG_SIG)
    idat_written = False
    for typ, payload in chunks:
        if typ == b"IDAT":
            if not idat_written:
                out += chunk(b"IDAT", best)
                idat_written = True
            continue
        out += chunk(typ, payload)
    new = bytes(out)
    return new if len(new) < len(data) else data


# ---------------------------------------------------------------------------
# X2 — GIF re-encode (image.rs:232-247: decode frames, re-emit with forced
# infinite repeat). Pure-Python GIF87a/89a *block* rewriter: frames' LZW
# data is copied verbatim (pixels provably identical), comments / plain-text
# / application extensions are dropped, and one NETSCAPE2.0 infinite-loop
# extension is emitted — the byte-level contract of the reference's
# GifEncoder with Repeat::Infinite.
# ---------------------------------------------------------------------------

_NETSCAPE_INF = b"\x21\xff\x0bNETSCAPE2.0\x03\x01\x00\x00\x00"


def _gif_subblocks(data: bytes, i: int) -> int:
    """Skip a sub-block chain starting at ``i``; returns the index after
    the terminating 0-byte."""
    while True:
        if i >= len(data):
            raise ValueError("truncated sub-blocks")
        n = data[i]
        i += 1 + n
        if n == 0:
            return i


def reencode_gif(data: bytes, _fmt: str | None = None) -> bytes:
    """Frame-preserving GIF rewrite. Returns the original bytes on any
    parse problem (mirrors the reference's leave-untouched-on-error,
    main.rs:448)."""
    try:
        if data[:6] not in (b"GIF87a", b"GIF89a"):
            return data
        packed = data[10]
        i = 13
        if packed & 0x80:  # global color table
            i += 3 * (2 << (packed & 0x07))
        head = b"GIF89a" + data[6:i]  # the loop ext needs an 89a header
        body = bytearray()
        pending_gce = b""
        while i < len(data):
            b0 = data[i]
            if b0 == 0x3B:  # trailer
                break
            if b0 == 0x21:  # extension
                label = data[i + 1]
                j = _gif_subblocks(data, i + 2)
                if label == 0xF9:  # graphic control: keep, attach to frame
                    pending_gce = data[i:j]
                # 0xFF application / 0xFE comment / 0x01 plain text: drop
                i = j
                continue
            if b0 == 0x2C:  # image descriptor
                j = i + 10
                ipacked = data[i + 9]
                if ipacked & 0x80:  # local color table
                    j += 3 * (2 << (ipacked & 0x07))
                j += 1  # LZW minimum code size
                j = _gif_subblocks(data, j)
                body += pending_gce + data[i:j]
                pending_gce = b""
                i = j
                continue
            raise ValueError(f"unknown block 0x{b0:02x}")
        new = bytes(head) + _NETSCAPE_INF + bytes(body) + b"\x3b"
    except (ValueError, IndexError, struct.error):
        return data
    return new


def reencode_image(data: bytes, fmt: str | None = None) -> bytes:
    """Format-dispatched X2 re-encode hook (image.rs:193-267): PNG →
    lossless recompress, GIF → frame-preserving infinite-loop rewrite,
    JPEG/WebP/BMP → passthrough (not losslessly optimizable)."""
    fmt = fmt or guess_format(data)
    if fmt == "png":
        return reencode_png(data)
    if fmt == "gif":
        return reencode_gif(data)
    return data
