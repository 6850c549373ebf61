"""Pure-Python media codecs: PNG (decode + encode), WAV PCM (decode +
encode), and a minimal ISO-BMFF frame demuxer.

This replaces the round-3 honest pseudo-decode stub: every ``media_*``
operator in :mod:`multimodal` now runs on REAL decoded pixels / PCM samples.
Formats are implemented from their public specifications only:

- PNG: W3C PNG spec / RFC 2083 — chunk layout (length/type/data/CRC32),
  IHDR, concatenated-IDAT zlib stream, and all five scanline filters
  (None/Sub/Up/Average/Paeth).  Bit depth 8, color types 0 (gray),
  2 (RGB), 6 (RGBA), no interlace — the subset the synth fixtures emit and
  a real thumbnail pipeline needs.
- WAV: RIFF/WAVE with a PCM ``fmt `` chunk; unknown chunks are skipped
  (word-aligned) like a real parser must.  8-bit unsigned / 16-bit
  signed-LE, mono or interleaved stereo.
- ISO BMFF: the 4-byte-size + 4-byte-type box walk; video fixtures are an
  ``ftyp`` box followed by an ``mdat`` box whose payload is length-prefixed
  PNG frames (the Motion-JPEG-style still-image-per-frame layout — no
  inter-frame codec exists in pure Python, and the container walk plus the
  per-frame PNG decode are the real work a frame sampler does).

Differential-testing convention (the repo-wide pattern from
``multimodal.naive_phash`` vs ``_vector_phash``): every decoder has an
independent ``naive_*`` twin written as row-at-a-time plain-int Python
straight from the spec, used only to materialize goldens; the engine path
is numpy-vectorized where the filter math allows.  The two are developed
against the spec independently and pinned equal in tests.

Scale note: these decoders run inside Arrow-batched ``mapInPandas`` only —
payload bytes never shuffle.  On a production cluster image you would swap
``decode_png`` for Pillow-SIMD/libpng via the same one-function seam; the
operator plumbing above this module does not change.

Reference parity: the reference crawler (``/root/reference/web_crawler``)
has no media path at all — this layer is the beyond-reference
training-data-pipeline surface (see SURVEY.md §2 R3+).
"""

from __future__ import annotations

import functools
import struct
import zlib

import numpy as np

CODEC_VERSION = 4  # embedded in golden cache keys; bump on codec changes
# v4: GIF87a/89a decoder (functions/gif.py) joins the image dispatch
# v3: baseline JPEG codec (functions/jpeg.py) + format-dispatching image
#     decode; errors normalized to ValueError at every decode entry point
# v2: PNG tEXt metadata chunks (encode + extract), 16-bit WAV fixtures,
#     integer-exact naive resample twin

PNG_SIG = b"\x89PNG\r\n\x1a\n"

_CHANNELS = {0: 1, 2: 3, 6: 4}  # color type -> samples per pixel


def _normalized(fn):
    """Uniform malformed-payload contract: every decode/parse entry point
    raises ``ValueError`` and ONLY ValueError on bad input.  Without this,
    ``zlib.error`` (corrupt-but-CRC-recomputed IDAT), ``struct.error``
    (short IHDR / short WAV fmt chunk) and ``IndexError`` (short buffers)
    escaped the operators' ``except ValueError`` null/skip handlers and
    killed the Spark task — contradicting the 100 TB poison-payload
    contract (ADVICE r4)."""

    @functools.wraps(fn)
    def wrap(*args, **kwargs):
        try:
            return fn(*args, **kwargs)
        except (zlib.error, struct.error, IndexError) as e:
            raise ValueError(f"malformed payload: {e}") from e

    return wrap


# ---------------------------------------------------------------------------
# PNG encode (fixture producer + thumbnail sink)
# ---------------------------------------------------------------------------


def _chunk(ctype: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def encode_png(
    pixels: bytes,
    width: int,
    height: int,
    channels: int = 3,
    filters: "list[int] | None" = None,
    texts: "dict[str, str] | None" = None,
) -> bytes:
    """Encode raw row-major 8-bit pixels as a PNG.  ``filters`` optionally
    picks the filter type per scanline (default: all 0) — the fixture
    generator cycles them so decoders are exercised on every filter type,
    and re-encoding identical pixels with different filters yields
    byte-different files with identical decoded content (the pixel-dedup
    property ``media_phash`` exists to catch)."""
    color_type = {1: 0, 3: 2, 4: 6}[channels]
    stride = width * channels
    if len(pixels) != stride * height:
        raise ValueError("pixel buffer does not match dimensions")
    raw = memoryview(pixels)
    out = []
    prior = bytes(stride)
    for y in range(height):
        row = bytes(raw[y * stride : (y + 1) * stride])
        f = filters[y % len(filters)] % 5 if filters else 0
        if f == 0:
            filt = row
        elif f == 1:
            filt = bytes(
                (row[x] - (row[x - channels] if x >= channels else 0)) & 0xFF
                for x in range(stride)
            )
        elif f == 2:
            filt = bytes((row[x] - prior[x]) & 0xFF for x in range(stride))
        elif f == 3:
            filt = bytes(
                (
                    row[x]
                    - ((row[x - channels] if x >= channels else 0) + prior[x]) // 2
                )
                & 0xFF
                for x in range(stride)
            )
        else:
            filt = bytes(
                (
                    row[x]
                    - _paeth(
                        row[x - channels] if x >= channels else 0,
                        prior[x],
                        prior[x - channels] if x >= channels else 0,
                    )
                )
                & 0xFF
                for x in range(stride)
            )
        out.append(bytes([f]) + filt)
        prior = row
    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    # tEXt chunks (PNG spec 11.3.4.3): keyword (1-79 bytes latin-1) NUL text
    text_chunks = b"".join(
        _chunk(
            b"tEXt",
            k.encode("latin-1")[:79] + b"\x00" + v.encode("latin-1", "replace"),
        )
        for k, v in (texts or {}).items()
    )
    return (
        PNG_SIG
        + _chunk(b"IHDR", ihdr)
        + text_chunks
        + _chunk(b"IDAT", zlib.compress(b"".join(out), 6))
        + _chunk(b"IEND", b"")
    )


# ---------------------------------------------------------------------------
# PNG decode — engine path (numpy where the filter recurrence allows)
# ---------------------------------------------------------------------------


def _png_chunks(payload: bytes, verify_crc: bool = True):
    if payload[:8] != PNG_SIG:
        raise ValueError("not a PNG")
    pos = 8
    n = len(payload)
    while pos + 8 <= n:
        (length,) = struct.unpack_from(">I", payload, pos)
        ctype = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + length]
        if len(data) != length or pos + 12 + length > n:
            raise ValueError("truncated chunk")
        if verify_crc:
            (crc,) = struct.unpack_from(">I", payload, pos + 8 + length)
            if crc != (zlib.crc32(ctype + data) & 0xFFFFFFFF):
                raise ValueError(f"bad CRC in {ctype!r}")
        yield ctype, data
        pos += 12 + length
        if ctype == b"IEND":
            return
    raise ValueError("missing IEND")


@_normalized
def decode_png(payload: bytes):
    """Decode a PNG to ``(width, height, channels, np.uint8 array of shape
    (height, width, channels))``.  Filters 0/1/2 are vectorized (None copy;
    Sub is a per-lane running sum mod 256; Up adds the prior
    reconstructed row); Average/Paeth follow the sequential recurrence the
    spec defines.  CRCs are verified; raises ``ValueError`` on malformed
    input — callers in :mod:`multimodal` convert that to a null/skip row
    (poison payloads must not kill a 100 TB job)."""
    w = h = None
    channels = 0
    idat = []
    for ctype, data in _png_chunks(payload):
        if ctype == b"IHDR":
            w, h, depth, color, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", data
            )
            if depth != 8 or color not in _CHANNELS:
                raise ValueError(f"unsupported depth/color {depth}/{color}")
            if comp != 0 or filt != 0 or interlace != 0:
                raise ValueError("unsupported compression/filter/interlace")
            channels = _CHANNELS[color]
        elif ctype == b"IDAT":
            idat.append(data)
    if w is None or not idat:
        raise ValueError("missing IHDR/IDAT")
    stream = zlib.decompress(b"".join(idat))
    stride = w * channels
    if len(stream) != (stride + 1) * h:
        raise ValueError("bad IDAT length")
    flat = np.frombuffer(stream, dtype=np.uint8).reshape(h, stride + 1)
    ftypes = flat[:, 0]
    rows = flat[:, 1:].astype(np.int64)
    out = np.zeros((h, stride), dtype=np.int64)
    prior = np.zeros(stride, dtype=np.int64)
    for y in range(h):
        f = int(ftypes[y])
        row = rows[y]
        if f == 0:
            rec = row.copy()
        elif f == 1:
            # recon[x] = filt[x] + recon[x-bpp]: per-lane prefix sum mod 256
            rec = np.cumsum(row.reshape(w, channels), axis=0).reshape(stride) % 256
        elif f == 2:
            rec = (row + prior) % 256
        elif f == 3:
            rec = np.empty(stride, dtype=np.int64)
            for x in range(stride):
                left = rec[x - channels] if x >= channels else 0
                rec[x] = (row[x] + (left + prior[x]) // 2) % 256
        elif f == 4:
            rec = np.empty(stride, dtype=np.int64)
            for x in range(stride):
                left = rec[x - channels] if x >= channels else 0
                up_left = prior[x - channels] if x >= channels else 0
                rec[x] = (row[x] + _paeth(int(left), int(prior[x]), int(up_left))) % 256
        else:
            raise ValueError(f"bad filter type {f}")
        out[y] = rec
        prior = rec
    return w, h, channels, out.astype(np.uint8).reshape(h, w, channels)


@_normalized
def naive_decode_png(payload: bytes):
    """Independent golden decoder: row-at-a-time plain-int unfiltering
    transcribed directly from the spec's recurrences (no numpy).  Returns
    ``(width, height, channels, list-of-rows of ints)``."""
    w = h = None
    channels = 0
    idat = b""
    for ctype, data in _png_chunks(payload):
        if ctype == b"IHDR":
            w, h, depth, color, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", data
            )
            if depth != 8 or color not in _CHANNELS:
                raise ValueError(f"unsupported depth/color {depth}/{color}")
            if comp != 0 or filt != 0 or interlace != 0:
                raise ValueError("unsupported compression/filter/interlace")
            channels = _CHANNELS[color]
        elif ctype == b"IDAT":
            idat += data
    if w is None or not idat:
        raise ValueError("missing IHDR/IDAT")
    stream = zlib.decompress(idat)
    stride = w * channels
    if len(stream) != (stride + 1) * h:
        raise ValueError("bad IDAT length")
    rows: "list[list[int]]" = []
    prior = [0] * stride
    pos = 0
    for _y in range(h):
        f = stream[pos]
        line = stream[pos + 1 : pos + 1 + stride]
        pos += 1 + stride
        rec = [0] * stride
        for x in range(stride):
            left = rec[x - channels] if x >= channels else 0
            up = prior[x]
            up_left = prior[x - channels] if x >= channels else 0
            if f == 0:
                v = line[x]
            elif f == 1:
                v = line[x] + left
            elif f == 2:
                v = line[x] + up
            elif f == 3:
                v = line[x] + (left + up) // 2
            elif f == 4:
                v = line[x] + _paeth(left, up, up_left)
            else:
                raise ValueError(f"bad filter type {f}")
            rec[x] = v & 0xFF
        rows.append(rec)
        prior = rec
    return w, h, channels, rows


# ---------------------------------------------------------------------------
# grayscale + pixel dHash (the image kernels multimodal hashes with)
# ---------------------------------------------------------------------------

# integer ITU-R 601-style luma weights; //1000 keeps everything exact ints
_LUMA = (299, 587, 114)


def gray_image(img: np.ndarray) -> np.ndarray:
    """(h, w, channels) uint8 -> (h, w) int64 luma.  Gray passes through;
    RGBA ignores alpha (compositing needs a background color — out of
    scope for hashing)."""
    a = img.astype(np.int64)
    if a.shape[2] == 1:
        return a[:, :, 0]
    return (
        a[:, :, 0] * _LUMA[0] + a[:, :, 1] * _LUMA[1] + a[:, :, 2] * _LUMA[2]
    ) // 1000


def naive_gray(w: int, h: int, channels: int, rows) -> "list[list[int]]":
    if channels == 1:
        return [list(r) for r in rows]
    out = []
    for r in rows:
        line = []
        for x in range(w):
            px = r[x * channels : x * channels + 3]
            if channels == 1:
                line.append(px[0])
            else:
                line.append(
                    (px[0] * _LUMA[0] + px[1] * _LUMA[1] + px[2] * _LUMA[2]) // 1000
                )
        out.append(line)
    return out


def block_mean_grid(gray: np.ndarray, grid_h: int, grid_w: int) -> np.ndarray:
    """Integer block-average downsample of an (h, w) int image to
    (grid_h, grid_w): cell (r, c) is ``sum // count`` over the half-open
    pixel block [r*h//gh, (r+1)*h//gh) x [c*w//gw, (c+1)*w//gw); empty
    blocks (image smaller than the grid) are 0."""
    h, w = gray.shape
    out = np.zeros((grid_h, grid_w), dtype=np.int64)
    for r in range(grid_h):
        r0, r1 = r * h // grid_h, (r + 1) * h // grid_h
        for c in range(grid_w):
            c0, c1 = c * w // grid_w, (c + 1) * w // grid_w
            if r1 > r0 and c1 > c0:
                block = gray[r0:r1, c0:c1]
                out[r, c] = int(block.sum()) // ((r1 - r0) * (c1 - c0))
    return out


def _bits_to_i64(bits) -> int:
    val = 0
    for b in bits:
        val = (val << 1) | int(b)
    return val - (1 << 64) if val >= (1 << 63) else val


def pixel_phash(img: np.ndarray, rows: int = 8, cols: int = 9) -> int:
    """dHash over DECODED pixels: luma -> rows x cols block means ->
    horizontal gradient sign bits (cols-1 per row -> 64 bits signed).
    Re-encodes of identical pixels (different PNG filters, chunking)
    collide here while their md5 differs — the property image near-dup
    dedup needs."""
    grid = block_mean_grid(gray_image(img), rows, cols)
    bits = (grid[:, 1:] > grid[:, :-1]).astype(np.uint64).ravel()
    return _bits_to_i64(bits)


def naive_pixel_phash(w, h, channels, px_rows, rows: int = 8, cols: int = 9) -> int:
    g = naive_gray(w, h, channels, px_rows)
    grid = [[0] * cols for _ in range(rows)]
    for r in range(rows):
        r0, r1 = r * h // rows, (r + 1) * h // rows
        for c in range(cols):
            c0, c1 = c * w // cols, (c + 1) * w // cols
            if r1 > r0 and c1 > c0:
                s = sum(g[y][x] for y in range(r0, r1) for x in range(c0, c1))
                grid[r][c] = s // ((r1 - r0) * (c1 - c0))
    bits = []
    for r in range(rows):
        for c in range(cols - 1):
            bits.append(1 if grid[r][c + 1] > grid[r][c] else 0)
    return _bits_to_i64(bits)


def resample_image(img: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Integer block-average resize per channel -> (out_h, out_w, channels)
    uint8 (box filter; the deterministic thumbnail kernel)."""
    h, w, ch = img.shape
    out = np.zeros((out_h, out_w, ch), dtype=np.int64)
    a = img.astype(np.int64)
    for r in range(out_h):
        r0, r1 = r * h // out_h, max(r * h // out_h + 1, (r + 1) * h // out_h)
        for c in range(out_w):
            c0, c1 = c * w // out_w, max(c * w // out_w + 1, (c + 1) * w // out_w)
            block = a[min(r0, h - 1) : min(r1, h), min(c0, w - 1) : min(c1, w)]
            out[r, c] = block.reshape(-1, ch).sum(axis=0) // max(
                block.shape[0] * block.shape[1], 1
            )
    return out.astype(np.uint8)


# ---------------------------------------------------------------------------
# WAV PCM
# ---------------------------------------------------------------------------


def encode_wav(
    samples, sample_rate: int = 8000, bits: int = 8, channels: int = 1
) -> bytes:
    """PCM RIFF/WAVE writer.  ``samples`` are interleaved ints — unsigned
    0..255 for 8-bit, signed -32768..32767 for 16-bit."""
    if bits == 8:
        data = bytes(int(s) & 0xFF for s in samples)
    elif bits == 16:
        data = b"".join(struct.pack("<h", int(s)) for s in samples)
    else:
        raise ValueError("bits must be 8 or 16")
    block_align = channels * bits // 8
    fmt = struct.pack(
        "<HHIIHH", 1, channels, sample_rate, sample_rate * block_align,
        block_align, bits,
    )
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
        + (b"\x00" if len(data) % 2 else b"")
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


@_normalized
def decode_wav(payload: bytes):
    """Engine WAV reader -> ``(sample_rate, channels, bits, np.int64
    interleaved samples)``.  Walks RIFF chunks, skipping unknown ones at
    word alignment; requires a PCM ``fmt `` before ``data``."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE")
    pos = 12
    n = len(payload)
    rate = channels = bits = None
    data = None
    while pos + 8 <= n:
        ctype = payload[pos : pos + 4]
        (length,) = struct.unpack_from("<I", payload, pos + 4)
        body = payload[pos + 8 : pos + 8 + length]
        if len(body) != length:
            raise ValueError("truncated WAV chunk")
        if ctype == b"fmt ":
            fmt_tag, channels, rate, _br, _ba, bits = struct.unpack_from(
                "<HHIIHH", body
            )
            if fmt_tag != 1 or bits not in (8, 16):
                raise ValueError("unsupported WAV format")
        elif ctype == b"data":
            data = body
            break
        pos += 8 + length + (length % 2)  # chunks are word-aligned
    if rate is None or data is None:
        raise ValueError("missing fmt/data chunk")
    if bits == 8:
        samples = np.frombuffer(data, dtype=np.uint8).astype(np.int64)
    else:
        samples = np.frombuffer(
            data[: len(data) // 2 * 2], dtype="<i2"
        ).astype(np.int64)
    return rate, channels, bits, samples


@_normalized
def naive_decode_wav(payload: bytes):
    """Golden WAV reader (plain-int struct walk, independent of numpy)."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE")
    pos, n = 12, len(payload)
    rate = channels = bits = None
    data = None
    while pos + 8 <= n:
        ctype = payload[pos : pos + 4]
        (length,) = struct.unpack_from("<I", payload, pos + 4)
        body = payload[pos + 8 : pos + 8 + length]
        if len(body) != length:
            raise ValueError("truncated WAV chunk")
        if ctype == b"fmt ":
            fmt_tag, channels, rate, _br, _ba, bits = struct.unpack_from(
                "<HHIIHH", body
            )
            if fmt_tag != 1 or bits not in (8, 16):
                raise ValueError("unsupported WAV format")
        elif ctype == b"data":
            data = body
            break
        pos += 8 + length + (length % 2)
    if rate is None or data is None:
        raise ValueError("missing fmt/data chunk")
    if bits == 8:
        samples = [b for b in data]
    else:
        samples = [
            struct.unpack_from("<h", data, i)[0]
            for i in range(0, len(data) // 2 * 2, 2)
        ]
    return rate, channels, bits, samples


def wav_magnitudes(samples: np.ndarray, bits: int) -> np.ndarray:
    """Samples -> 0..128 integer magnitudes on a common scale: 8-bit is
    |s - 128| (unsigned midpoint), 16-bit is |s| // 256.  Feeds the frame
    energy VAD with bit-depth-independent integer math."""
    if bits == 8:
        return np.abs(samples - 128)
    return np.abs(samples) // 256


def naive_wav_magnitudes(samples, bits: int) -> "list[int]":
    if bits == 8:
        return [abs(s - 128) for s in samples]
    return [abs(s) // 256 for s in samples]


# ---------------------------------------------------------------------------
# minimal ISO-BMFF: ftyp + mdat of length-prefixed PNG frames
# ---------------------------------------------------------------------------


def encode_bmff(frames: "list[bytes]", brand: bytes = b"isom") -> bytes:
    """ftyp box (24 bytes — matching the sniffer magic) + one mdat box of
    4-byte-BE length-prefixed frame payloads."""
    ftyp = struct.pack(">I", 24) + b"ftyp" + brand + struct.pack(">I", 0) + brand + b"mjpg"
    body = b"".join(struct.pack(">I", len(f)) + f for f in frames)
    mdat = struct.pack(">I", 8 + len(body)) + b"mdat" + body
    return ftyp + mdat


@_normalized
def demux_bmff(payload: bytes) -> "list[bytes]":
    """Engine box walk -> frame payload list.  Raises ``ValueError`` on a
    malformed box tree (callers null/skip the row)."""
    pos, n = 0, len(payload)
    frames: "list[bytes]" = []
    saw_ftyp = False
    while pos + 8 <= n:
        (size,) = struct.unpack_from(">I", payload, pos)
        btype = payload[pos + 4 : pos + 8]
        if size < 8 or pos + size > n:
            raise ValueError("bad box size")
        if btype == b"ftyp":
            saw_ftyp = True
        elif btype == b"mdat":
            body = payload[pos + 8 : pos + size]
            fp = 0
            while fp + 4 <= len(body):
                (flen,) = struct.unpack_from(">I", body, fp)
                if fp + 4 + flen > len(body):
                    raise ValueError("truncated frame")
                frames.append(body[fp + 4 : fp + 4 + flen])
                fp += 4 + flen
            if fp != len(body):
                raise ValueError("trailing mdat bytes")
        pos += size
    if not saw_ftyp:
        raise ValueError("missing ftyp")
    return frames


@_normalized
def naive_demux_bmff(payload: bytes) -> "list[bytes]":
    """Golden twin of :func:`demux_bmff` (plain-int byte indexing)."""
    frames = []
    pos = 0
    saw_ftyp = False
    while pos + 8 <= len(payload):
        size = int.from_bytes(payload[pos : pos + 4], "big")
        btype = payload[pos + 4 : pos + 8]
        if size < 8 or pos + size > len(payload):
            raise ValueError("bad box size")
        if btype == b"ftyp":
            saw_ftyp = True
        elif btype == b"mdat":
            body = payload[pos + 8 : pos + size]
            fp = 0
            while fp + 4 <= len(body):
                flen = int.from_bytes(body[fp : fp + 4], "big")
                if fp + 4 + flen > len(body):
                    raise ValueError("truncated frame")
                frames.append(body[fp + 4 : fp + 4 + flen])
                fp += 4 + flen
            if fp != len(body):
                raise ValueError("trailing mdat bytes")
        pos += size
    if not saw_ftyp:
        raise ValueError("missing ftyp")
    return frames


# ---------------------------------------------------------------------------
# PNG textual metadata (tEXt) — caption/credit mining for training data
# ---------------------------------------------------------------------------


@_normalized
def png_text_chunks(payload: bytes) -> "list[tuple[str, str]]":
    """(keyword, text) pairs from tEXt chunks in order (engine path; CRCs
    verified by the shared chunk walk).  Raises ``ValueError`` on
    malformed containers like the decoders."""
    out = []
    for ctype, data in _png_chunks(payload):
        if ctype == b"tEXt":
            nul = data.find(b"\x00")
            if nul < 0:
                continue  # keyword-only chunk without separator: skip
            out.append(
                (
                    data[:nul].decode("latin-1"),
                    data[nul + 1 :].decode("latin-1"),
                )
            )
    return out


@_normalized
def naive_png_text_chunks(payload: bytes) -> "list[tuple[str, str]]":
    """Golden twin: independent byte-index chunk scan (no shared walk)."""
    if payload[:8] != PNG_SIG:
        raise ValueError("not a PNG")
    out = []
    pos = 8
    while pos + 12 <= len(payload):
        length = int.from_bytes(payload[pos : pos + 4], "big")
        ctype = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + length]
        if len(data) != length:
            raise ValueError("truncated chunk")
        crc = int.from_bytes(payload[pos + 8 + length : pos + 12 + length], "big")
        if crc != (zlib.crc32(ctype + data) & 0xFFFFFFFF):
            raise ValueError(f"bad CRC in {ctype!r}")
        if ctype == b"tEXt" and b"\x00" in data:
            k, _, v = data.partition(b"\x00")
            out.append((k.decode("latin-1"), v.decode("latin-1")))
        pos += 12 + length
        if ctype == b"IEND":
            return out
    raise ValueError("missing IEND")


def naive_resample_image(
    w: int, h: int, channels: int, rows, out_w: int, out_h: int
) -> "list[int]":
    """Golden twin of :func:`resample_image`: plain-int block-average box
    resample returning the flat out_h*out_w*channels pixel list."""
    out = []
    for r in range(out_h):
        r0 = r * h // out_h
        r1 = max(r0 + 1, (r + 1) * h // out_h)
        for c in range(out_w):
            c0 = c * w // out_w
            c1 = max(c0 + 1, (c + 1) * w // out_w)
            ys = range(min(r0, h - 1), min(r1, h))
            xs = range(min(c0, w - 1), min(c1, w))
            cnt = max(len(ys) * len(xs), 1)
            for ch in range(channels):
                s = sum(rows[y][x * channels + ch] for y in ys for x in xs)
                out.append(s // cnt)
    return out


# ---------------------------------------------------------------------------
# JPEG (functions/jpeg.py) — re-exported through the same normalized seam
# ---------------------------------------------------------------------------

from web_crawler_spark.functions import jpeg as _jpeg  # noqa: E402

JPEG_SIG = _jpeg.JPEG_SIG
encode_jpeg = _jpeg.encode_jpeg
decode_jpeg = _normalized(_jpeg.decode_jpeg)
naive_decode_jpeg = _normalized(_jpeg.naive_decode_jpeg)


@_normalized
def decode_image_any(payload: bytes):
    """Format-dispatching engine image decode: PNG or baseline JPEG by
    magic, ``(w, h, channels, ndarray (h, w, ch) uint8)``.  The single
    seam a cluster image swaps for libpng/libjpeg-turbo."""
    b = bytes(payload)
    if b[:2] == b"\xff\xd8":
        return decode_jpeg(b)
    if b[:4] == b"GIF8":
        return decode_gif(b)
    return decode_png(b)


@_normalized
def naive_decode_image(payload: bytes):
    """Golden twin of :func:`decode_image_any`: dispatch to the naive
    decoders, ``(w, h, channels, list-of-rows of ints)``."""
    b = bytes(payload)
    if b[:2] == b"\xff\xd8":
        return naive_decode_jpeg(b)
    if b[:4] == b"GIF8":
        return naive_decode_gif(b)
    return naive_decode_png(b)


# ---------------------------------------------------------------------------
# GIF (functions/gif.py) — same normalized seam
# ---------------------------------------------------------------------------

from web_crawler_spark.functions import gif as _gif  # noqa: E402

GIF_SIGS = _gif.GIF_SIGS
encode_gif = _gif.encode_gif
decode_gif = _normalized(_gif.decode_gif)
naive_decode_gif = _normalized(_gif.naive_decode_gif)
gif_frame_count = _normalized(_gif.gif_frame_count)


@_normalized
def png_header_dims(payload: bytes) -> "tuple[int, int]":
    """(width, height) from the IHDR alone (which the spec requires to be
    the first chunk) — the PNG leg of the header-inventory seam."""
    b = bytes(payload)
    if b[:8] != PNG_SIG:
        raise ValueError("not a PNG")
    if b[12:16] != b"IHDR":
        raise ValueError("IHDR not first")
    if len(b) < 24:
        raise ValueError("truncated IHDR")
    return struct.unpack_from(">II", b, 16)


@_normalized
def image_header_dims(payload: bytes) -> "tuple[str, int, int]":
    """(container, width, height) from the container header alone —
    PNG/JPEG/GIF by magic, no entropy decode.  The single seam a
    metadata-inventory pass swaps for native header probes; raises
    ValueError on unknown or malformed headers like every decode entry."""
    b = bytes(payload)
    if b[:3] == JPEG_SIG:
        w, h = _jpeg.header_dims(b)
        return "jpeg", w, h
    if b[:4] == b"GIF8":
        w, h = _gif.header_dims(b)
        return "gif", w, h
    if b[:8] == PNG_SIG:
        w, h = png_header_dims(b)
        return "png", w, h
    raise ValueError("unknown container")
