"""Differential + round-trip tests for the pure-Python media codecs
(functions/codecs.py): PNG (all five scanline filters, CRC verification),
WAV PCM (8/16-bit), and the minimal ISO-BMFF frame demuxer.  No Spark —
these are the kernels the multimodal operators batch over."""

import random
import struct
import zlib

import pytest

from web_crawler_spark.functions import codecs as C


def test_png_round_trip_all_filters_and_shapes():
    rng = random.Random(42)
    for _ in range(40):
        w, h = rng.randint(1, 40), rng.randint(1, 30)
        ch = rng.choice([1, 3, 4])
        px = bytes(rng.getrandbits(8) for _ in range(w * h * ch))
        filters = [rng.randint(0, 4) for _ in range(h)]
        png = C.encode_png(px, w, h, ch, filters=filters)
        w2, h2, ch2, img = C.decode_png(png)
        assert (w2, h2, ch2) == (w, h, ch)
        assert img.tobytes() == px
        # independent naive decoder agrees byte-for-byte
        nw, nh, nch, rows = C.naive_decode_png(png)
        assert (nw, nh, nch) == (w, h, ch)
        assert bytes(b for r in rows for b in r) == px
        # and the two phash paths agree on the decoded pixels
        assert C.pixel_phash(img) == C.naive_pixel_phash(w, h, ch, rows)


def test_png_each_filter_type_individually():
    # one scanline per filter type, deterministic gradient pixels — pins
    # every unfilter recurrence separately
    w, h = 13, 5
    px = bytes((x * 17 + y * 29) % 256 for y in range(h) for x in range(w * 3))
    for f in range(5):
        png = C.encode_png(px, w, h, 3, filters=[f])
        assert C.decode_png(png)[3].tobytes() == px


def test_png_reencode_same_pixels_different_bytes_same_hash():
    rng = random.Random(9)
    px = bytes(rng.getrandbits(8) for _ in range(24 * 16 * 3))
    p1 = C.encode_png(px, 24, 16, 3, filters=[0])
    p2 = C.encode_png(px, 24, 16, 3, filters=[4, 3, 2, 1])
    assert p1 != p2
    assert C.pixel_phash(C.decode_png(p1)[3]) == C.pixel_phash(C.decode_png(p2)[3])


def test_png_malformed_inputs_raise():
    rng = random.Random(3)
    px = bytes(rng.getrandbits(8) for _ in range(8 * 4 * 3))
    good = C.encode_png(px, 8, 4, 3)
    with pytest.raises(ValueError):
        C.decode_png(b"not a png at all")
    with pytest.raises(ValueError):
        C.decode_png(good[:-6])  # truncated (loses IEND)
    # corrupt a byte inside IDAT -> CRC failure
    bad = bytearray(good)
    bad[len(good) // 2] ^= 0xFF
    with pytest.raises(ValueError):
        C.decode_png(bytes(bad))
    with pytest.raises(ValueError):
        C.naive_decode_png(bytes(bad))
    # unsupported bit depth rejected, not mis-decoded
    ihdr = struct.pack(">IIBBBBB", 4, 4, 16, 2, 0, 0, 0)
    deep = (
        C.PNG_SIG
        + C._chunk(b"IHDR", ihdr)
        + C._chunk(b"IDAT", zlib.compress(b"\x00" * (4 * (4 * 3 * 2 + 1))))
        + C._chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError):
        C.decode_png(deep)


def test_codec_errors_normalized_to_valueerror():
    """The poison-payload contract (ADVICE r4): zlib/struct/index errors
    from malformed-but-plausible payloads must surface as ValueError so the
    operators' null/skip handlers catch them — never kill a Spark task."""
    # CRC-VALID but zlib-corrupt IDAT: recompute the CRC over garbage data
    ihdr = struct.pack(">IIBBBBB", 4, 4, 8, 2, 0, 0, 0)
    crc_valid_bad_idat = (
        C.PNG_SIG
        + C._chunk(b"IHDR", ihdr)
        + C._chunk(b"IDAT", b"\x00garbage-not-zlib\xff")
        + C._chunk(b"IEND", b"")
    )
    for fn in (C.decode_png, C.naive_decode_png):
        with pytest.raises(ValueError):
            fn(crc_valid_bad_idat)
    # short IHDR (struct.error inside): CRC recomputed so it parses to IHDR
    short_ihdr = (
        C.PNG_SIG + C._chunk(b"IHDR", b"\x00\x01") + C._chunk(b"IEND", b"")
    )
    for fn in (C.decode_png, C.naive_decode_png):
        with pytest.raises(ValueError):
            fn(short_ihdr)
    # WAV whose fmt chunk claims 16 bytes but the file ends early
    hdr = b"RIFF" + struct.pack("<I", 24) + b"WAVE" + b"fmt " + struct.pack("<I", 16) + b"\x01\x00"
    for fn in (C.decode_wav, C.naive_decode_wav):
        with pytest.raises(ValueError):
            fn(hdr)
    # all of these must be ValueError EXACTLY (no zlib.error/struct.error
    # leaking through) — pytest.raises(ValueError) above already pins that,
    # since zlib.error/struct.error do not subclass ValueError


def test_wav_round_trip_and_magnitudes():
    rng = random.Random(5)
    for bits in (8, 16):
        for _ in range(10):
            n = rng.randint(0, 700)
            if bits == 8:
                s = [rng.randint(0, 255) for _ in range(n)]
            else:
                s = [rng.randint(-32768, 32767) for _ in range(n)]
            wav = C.encode_wav(s, 8000, bits)
            rate, ch, b2, arr = C.decode_wav(wav)
            assert (rate, ch, b2) == (8000, 1, bits)
            assert arr.tolist() == s
            r2, c2, b3, lst = C.naive_decode_wav(wav)
            assert lst == s
            assert (
                C.wav_magnitudes(arr, bits).tolist()
                == C.naive_wav_magnitudes(lst, bits)
            )


def test_wav_skips_unknown_chunks():
    # real parsers must skip LIST/INFO etc. at word alignment
    s = [10, 250, 128]
    wav = bytearray(C.encode_wav(s, 8000, 8))
    extra = b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\x00"  # odd len + pad
    out = wav[:12] + extra + wav[12:]
    out[4:8] = struct.pack("<I", len(out) - 8)
    rate, ch, bits, arr = C.decode_wav(bytes(out))
    assert arr.tolist() == s
    assert C.naive_decode_wav(bytes(out))[3] == s


def test_wav_malformed_raises():
    with pytest.raises(ValueError):
        C.decode_wav(b"RIFF\x00\x00\x00\x00WAVE")  # no fmt/data
    with pytest.raises(ValueError):
        C.decode_wav(b"OggS" + b"\x00" * 40)


def test_bmff_round_trip_and_malformed():
    rng = random.Random(11)
    frames = [
        bytes(rng.getrandbits(8) for _ in range(rng.randint(0, 120)))
        for _ in range(6)
    ]
    bm = C.encode_bmff(frames)
    # magic matches the JVM-side sniffer constant
    assert bm[:8].hex().upper() == "0000001866747970"
    assert C.demux_bmff(bm) == frames == C.naive_demux_bmff(bm)
    with pytest.raises(ValueError):
        C.demux_bmff(bm[:-3])  # truncated box
    with pytest.raises(ValueError):
        C.demux_bmff(b"\x00\x00\x00\x18ftypjunk")  # box size past end
    with pytest.raises(ValueError):
        # mdat whose frame length overruns the box
        body = struct.pack(">I", 99) + b"xx"
        mdat = struct.pack(">I", 8 + len(body)) + b"mdat" + body
        C.demux_bmff(C.encode_bmff([])[:24] + mdat)


def test_block_mean_grid_and_resample_exactness():
    import numpy as np

    # 4x4 gray image with known block means at 2x2
    g = np.arange(16, dtype=np.int64).reshape(4, 4)
    grid = C.block_mean_grid(g, 2, 2)
    assert grid.tolist() == [[2, 4], [10, 12]]  # mean of each quadrant
    # resample of a constant image is constant at any size
    img = np.full((6, 9, 3), 77, dtype=np.uint8)
    out = C.resample_image(img, 4, 3)
    assert (out == 77).all() and out.shape == (3, 4, 3)


def test_png_text_chunks_round_trip_and_malformed():
    rng = random.Random(21)
    px = bytes(rng.getrandbits(8) for _ in range(10 * 6 * 3))
    p = C.encode_png(px, 10, 6, 3, texts={"caption": "a cat & dog", "author": "x"})
    want = [("caption", "a cat & dog"), ("author", "x")]
    assert C.png_text_chunks(p) == want == C.naive_png_text_chunks(p)
    # text chunks do not disturb decode
    assert C.decode_png(p)[3].tobytes() == px
    # no-text image -> empty list; corrupt CRC raises in both paths
    assert C.png_text_chunks(C.encode_png(px, 10, 6, 3)) == []
    bad = bytearray(p)
    bad[40] ^= 0xFF
    with pytest.raises(ValueError):
        C.png_text_chunks(bytes(bad))
    with pytest.raises(ValueError):
        C.naive_png_text_chunks(bytes(bad))


def test_naive_resample_matches_engine_on_random_images():
    import numpy as np

    rng = random.Random(33)
    for _ in range(10):
        w, h = rng.randint(2, 30), rng.randint(2, 24)
        px = bytes(rng.getrandbits(8) for _ in range(w * h * 3))
        p = C.encode_png(px, w, h, 3)
        img = C.decode_png(p)[3]
        ow, oh = rng.randint(1, 20), rng.randint(1, 20)
        v = C.resample_image(img, ow, oh)
        w2, h2, ch2, rows = C.naive_decode_png(p)
        assert list(v.reshape(-1)) == C.naive_resample_image(
            w2, h2, ch2, rows, ow, oh
        )


# ---------------------------------------------------------------------------
# JPEG (functions/jpeg.py via the codecs seam)
# ---------------------------------------------------------------------------


def _smooth_px(rng, w, h, ch=3):
    out = bytearray()
    for y in range(h):
        for x in range(w):
            base = (x * 5 + y * 3) % 200
            for c in range(ch):
                out.append(min(255, base + c * 10 + rng.getrandbits(3)))
    return bytes(out)


def test_jpeg_round_trip_and_twin_exactness():
    """Baseline JPEG: encode -> decode across shapes / subsampling / gray;
    the numpy engine decoder and the independent plain-int naive twin are
    BIT-IDENTICAL (the integer IDCT + fixed-point color contract), and
    reconstruction error is small (MAE < 8 at q>=75)."""
    import numpy as np

    rng = random.Random(13)
    for (w, h, ch, sub, q) in [
        (16, 12, 3, "444", 90),
        (17, 13, 3, "444", 85),   # non-multiple-of-8 dims
        (24, 18, 3, "420", 90),
        (21, 15, 3, "420", 75),   # 420 with odd dims (edge replication)
        (8, 8, 1, "444", 95),     # grayscale single block
        (33, 9, 1, "444", 60),
    ]:
        px = _smooth_px(rng, w, h, ch)
        payload = C.encode_jpeg(px, w, h, ch, quality=q, subsampling=sub)
        assert payload[:3] == C.JPEG_SIG and payload[-2:] == b"\xff\xd9"
        w2, h2, ch2, img = C.decode_jpeg(payload)
        assert (w2, h2, ch2) == (w, h, ch)
        nw, nh, nch, rows = C.naive_decode_jpeg(payload)
        assert (nw, nh, nch) == (w, h, ch)
        naive = np.array(rows, dtype=np.int64).reshape(h, w, ch)
        assert np.array_equal(img.astype(np.int64), naive)
        orig = np.frombuffer(px, dtype=np.uint8).reshape(h, w, ch).astype(np.int64)
        assert np.abs(orig - img.astype(np.int64)).mean() < 8


def test_jpeg_cross_format_phash_property():
    """The v30 fixture property: the same pixels stored as PNG and as
    JPEG (q92) must phash within the Hamming<=3 near-dup banding."""
    from web_crawler_spark import synth
    from web_crawler_spark.functions import multimodal as M

    rng = random.Random(5)
    for i in (0, 9, 24):
        w, h = 20 + i, 14 + i
        body = bytes(rng.getrandbits(8) for _ in range(256))
        px = synth._media_image_pixels(w, h, body, i)
        png = C.encode_png(px, w, h, 3)
        jpg = C.encode_jpeg(px, w, h, 3, quality=92, subsampling="444")
        hp = M.naive_media_phash("image", png)
        hj = M.naive_media_phash("image", jpg)
        assert bin((hp ^ hj) & ((1 << 64) - 1)).count("1") <= 3


def test_jpeg_malformed_and_unsupported_raise_valueerror():
    """Poison contract: truncations, corruptions, and unsupported modes
    (progressive SOF2, 12-bit) surface as ValueError ONLY."""
    rng = random.Random(17)
    px = _smooth_px(rng, 24, 16, 3)
    good = C.encode_jpeg(px, 24, 16, 3)
    for cut in range(2, len(good), 41):
        with pytest.raises(ValueError):
            C.decode_jpeg(good[:cut])
        with pytest.raises(ValueError):
            C.naive_decode_jpeg(good[:cut])
    for trial in range(200):
        b = bytearray(good)
        b[rng.randrange(len(b))] ^= rng.randrange(1, 256)
        for fn in (C.decode_jpeg, C.naive_decode_jpeg):
            try:
                fn(bytes(b))
            except ValueError:
                pass  # only ValueError may escape
    # progressive: flip the SOF0 marker byte to SOF2
    prog = bytearray(good)
    i = prog.find(b"\xff\xc0")
    prog[i + 1] = 0xC2
    with pytest.raises(ValueError):
        C.decode_jpeg(bytes(prog))
    with pytest.raises(ValueError):
        C.naive_decode_jpeg(bytes(prog))
    with pytest.raises(ValueError):
        C.decode_jpeg(b"\xff\xd8\xff\xe0only-a-header")


def test_image_any_dispatch_and_golden_twin():
    """decode_image_any / naive_decode_image dispatch PNG vs JPEG by magic
    and reject neither-format payloads with ValueError."""
    import numpy as np

    rng = random.Random(23)
    px = _smooth_px(rng, 12, 10, 3)
    for payload in (C.encode_png(px, 12, 10, 3), C.encode_jpeg(px, 12, 10, 3)):
        w, h, ch, img = C.decode_image_any(payload)
        nw, nh, nch, rows = C.naive_decode_image(payload)
        assert (w, h, ch) == (nw, nh, nch) == (12, 10, 3)
        assert np.array_equal(
            img.astype(np.int64), np.array(rows, dtype=np.int64).reshape(h, w, ch)
        )
    with pytest.raises(ValueError):
        C.decode_image_any(b"GIF89a not supported here")
    with pytest.raises(ValueError):
        C.naive_decode_image(b"GIF89a not supported here")


def test_gif_round_trip_twin_and_poison():
    """GIF87a/89a (functions/gif.py): palette round-trip exactness,
    interlace, transparency compositing, engine==naive bit equality, and
    the ValueError-only poison contract."""
    import numpy as np

    rng = random.Random(31)
    for (w, h, ncol, inter, trans) in [
        (16, 12, 64, False, None),
        (17, 13, 256, True, None),   # interlace with non-multiple rows
        (24, 18, 16, False, 3),      # transparency -> background color
        (8, 8, 2, True, 1),
        (5, 29, 256, True, 0),
    ]:
        pal = bytes(rng.getrandbits(8) for _ in range(3 * ncol))
        idx = [rng.randrange(ncol) for _ in range(w * h)]
        payload = C.encode_gif(idx, w, h, pal, interlaced=inter, transparent=trans)
        w2, h2, ch, img = C.decode_gif(payload)
        assert (w2, h2, ch) == (w, h, 3)
        nw, nh, nch, rows = C.naive_decode_gif(payload)
        assert np.array_equal(
            img.astype(np.int64), np.array(rows, dtype=np.int64).reshape(h, w, 3)
        )
        # lossless: non-transparent pixels ARE the palette colors
        for k in range(0, w * h, max(1, w * h // 9)):
            y, x = divmod(k, w)
            i = idx[k]
            if trans is None or i != trans:
                assert tuple(img[y, x]) == (pal[3 * i], pal[3 * i + 1], pal[3 * i + 2])
        from web_crawler_spark.functions import gif as G

        assert G.gif_frame_count(payload) == 1
        assert G.header_dims(payload) == (w, h)
        # dispatch seam picks the GIF path
        assert np.array_equal(C.decode_image_any(payload)[3], img)
    pal = bytes(range(48))
    good = C.encode_gif([i % 16 for i in range(100)], 10, 10, pal)
    for cut in range(1, len(good), 9):
        for fn in (C.decode_gif, C.naive_decode_gif):
            try:
                fn(good[:cut])
            except ValueError:
                pass  # only ValueError may escape
    for _ in range(300):
        b = bytearray(good)
        b[rng.randrange(len(b))] ^= rng.randrange(1, 256)
        for fn in (C.decode_gif, C.naive_decode_gif):
            try:
                fn(bytes(b))
            except ValueError:
                pass


def test_review_fixes_header_probes_bombs_and_gif_semantics():
    """r5 code-review fixes: (a) image_header_dims normalizes decoder
    errors (the truncated-SOF IndexError repro); (b) declared-dimension
    bombs reject before allocation in both twins; (c) GIF frames past the
    logical screen reject identically in both twins; (d) the background
    color index byte is honored."""
    import numpy as np

    from web_crawler_spark.functions import gif as G, jpeg as J

    # (a) truncated SOF that used to raise IndexError through header_dims
    poison = b"\xff\xd8\xff\xc0" + struct.pack(">H", 7) + b"\x08" + struct.pack(">HH", 1, 1)
    with pytest.raises(ValueError):
        C.image_header_dims(poison)
    # valid headers parse without touching entropy data
    assert C.image_header_dims(C.encode_png(b"\x00" * 12, 2, 2, 3)) == ("png", 2, 2)
    jp = C.encode_jpeg(b"\x00" * 12, 2, 2, 3)
    assert C.image_header_dims(jp) == ("jpeg", 2, 2)
    gp = C.encode_gif([0, 1, 1, 0], 2, 2, bytes(6))
    assert C.image_header_dims(gp) == ("gif", 2, 2)
    with pytest.raises(ValueError):
        C.image_header_dims(b"RIFF????WEBP")
    # (b) declared 65535x65535 rejects in O(header) in all four decoders
    bomb_jpeg = bytearray(jp)
    i = bomb_jpeg.find(b"\xff\xc0")
    bomb_jpeg[i + 5 : i + 9] = struct.pack(">HH", 65535, 65535)
    for fn in (C.decode_jpeg, C.naive_decode_jpeg):
        with pytest.raises(ValueError):
            fn(bytes(bomb_jpeg))
    bomb_gif = bytearray(gp)
    bomb_gif[6:10] = struct.pack("<HH", 65535, 65535)
    for fn in (C.decode_gif, C.naive_decode_gif):
        with pytest.raises(ValueError):
            fn(bytes(bomb_gif))
    # (c) frame exceeding the logical screen: same ValueError both twins
    over = bytearray(gp)
    # image descriptor starts right after header(13)+GCT(6): set left=1
    desc = bytes(over).find(b"\x2c")
    over[desc + 1 : desc + 3] = struct.pack("<H", 1)
    for fn in (C.decode_gif, C.naive_decode_gif):
        with pytest.raises(ValueError):
            fn(bytes(over))
    # (d) background color index honored (transparent composites onto it)
    pal = bytes([10, 20, 30, 200, 210, 220, 1, 2, 3, 9, 9, 9])
    g = bytearray(C.encode_gif([3, 2, 2, 3], 2, 2, pal, transparent=2))
    g[11] = 1  # background color index -> palette entry 1
    w, h, ch, img = C.decode_gif(bytes(g))
    nw, nh, nch, rows = C.naive_decode_gif(bytes(g))
    assert np.array_equal(img.astype(np.int64), np.array(rows, dtype=np.int64).reshape(2, 2, 3))
    assert tuple(img[0, 1]) == (200, 210, 220)  # transparent -> bg color 1
    # BMFF videos embedding JPEG stills: engine and golden phash agree
    from web_crawler_spark.functions import multimodal as M

    frames = [jp, jp]
    bm = C.encode_bmff(frames)
    eng = M._media_phash_one("video", bm)
    gold = M.naive_media_phash("video", bm)
    assert eng is not None and eng == gold
