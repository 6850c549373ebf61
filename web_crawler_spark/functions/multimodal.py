"""Multimodal columns: image/audio/video as opaque ``binary`` payloads with
typed metadata.

The Spark-side plumbing is real — schemas, Arrow batch shapes, partitioning,
``mapInPandas`` feature extraction — while the actual codec decode is stubbed
(PIL/librosa/ffmpeg are not in this container): ``decode_image`` raises
``NotImplementedError`` unless PIL is importable, and the feature extractor
falls back to a deterministic payload-derived pseudo-feature so the pipeline
is testable end-to-end.

Container-format sniffing (PNG/RIFF/mp4 magic bytes) is JVM-side over the
binary column — no Python for the cheap classification path.
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

try:  # decode stack is optional; absent in this container
    from PIL import Image  # type: ignore

    _HAS_PIL = True
except ImportError:
    _HAS_PIL = False

MAGIC_HEX = {
    "image": "89504E470D0A1A0A",  # PNG
    "audio": "52494646",  # RIFF/WAV
    "video": "0000001866747970",  # ISO BMFF ftyp
}


def kind_from_magic(payload) -> "F.Column":
    """JVM-side container sniff on the first payload bytes."""
    head16 = F.hex(F.expr("substring(payload, 1, 8)"))
    return (
        F.when(head16.startswith(MAGIC_HEX["image"]), F.lit("image"))
        .when(head16.startswith(MAGIC_HEX["audio"]), F.lit("audio"))
        .when(head16.startswith(MAGIC_HEX["video"]), F.lit("video"))
        .otherwise(F.lit("unknown"))
    )


def decode_image(payload: bytes):
    """Real decode — requires PIL; STUB in this environment."""
    if not _HAS_PIL:
        raise NotImplementedError(
            "image decode requires PIL; install pillow on the cluster image"
        )
    import io

    return Image.open(io.BytesIO(payload))


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
    """Deterministic payload-derived pseudo-embedding standing in for the
    decoder output: byte-histogram moments over FEATURE_DIM buckets.  Shape
    and dtype match what a real extractor would emit, so downstream ANN /
    clustering plumbing is exercised for real."""
    arr = np.frombuffer(payload, dtype=np.uint8)
    buckets = np.array_split(arr, FEATURE_DIM) if len(arr) >= FEATURE_DIM else [arr] * FEATURE_DIM
    return np.array([float(b.mean()) if len(b) else 0.0 for b in buckets])


def extract_features(media: DataFrame, use_decoder: bool = False) -> DataFrame:
    """Arrow-batched feature extraction over the binary column.  With
    ``use_decoder=True`` (cluster image with codecs) each payload is decoded
    for real; here the deterministic fallback keeps the batch shape honest."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for payload in pdf["payload"]:
                if payload is None:
                    feats.append(None)
                    continue
                if use_decoder:
                    img = decode_image(bytes(payload))  # NotImplementedError here
                    feats.append(np.asarray(img, dtype=np.float64).mean(axis=(0, 1)).tolist())
                else:
                    feats.append(_fake_feature(bytes(payload)).tolist())
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


# ---------------------------------------------------------------------------
# resize + frame sampling — the remaining multimodal kernels.  As with
# feature extraction, the codec work is stubbed (no PIL/ffmpeg in this
# container) behind deterministic fakes; the Spark-side shape — schemas,
# Arrow batching, per-row fan-out — is real and tested.
# ---------------------------------------------------------------------------

THUMB_BYTES = 64


def _fake_thumb(payload: bytes, out_w: int, out_h: int) -> bytes:
    """Deterministic stand-in for a resized image: header + a strided byte
    sample of the payload (same length contract a tiny thumbnail would
    have), so downstream storage/dedup plumbing sees realistic bytes."""
    body = bytes(payload[:: max(1, len(payload) // THUMB_BYTES)][:THUMB_BYTES])
    return b"THMB" + out_w.to_bytes(2, "big") + out_h.to_bytes(2, "big") + body


def resize_images(
    media: DataFrame, out_w: int = 64, out_h: int = 64, use_decoder: bool = False
) -> DataFrame:
    """Arrow-batched image resize over the binary column; images only (other
    kinds pass through with null thumb).  With ``use_decoder=True`` each
    payload is decoded for real (raises in this container)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ws, hs, thumbs = [], [], []
            for kind, payload in zip(pdf["kind"], pdf["payload"]):
                if kind != "image" or payload is None:
                    ws.append(None)
                    hs.append(None)
                    thumbs.append(None)
                    continue
                if use_decoder:
                    img = decode_image(bytes(payload))  # NotImplementedError here
                    thumbs.append(img.resize((out_w, out_h)).tobytes())
                else:
                    thumbs.append(_fake_thumb(bytes(payload), out_w, out_h))
                ws.append(out_w)
                hs.append(out_h)
            yield pd.DataFrame(
                {"media_id": pdf["media_id"], "out_w": ws, "out_h": hs, "thumb": thumbs}
            )

    return media.select("media_id", "kind", "payload").mapInPandas(
        run, schema="media_id long, out_w long, out_h long, thumb binary"
    )


FRAME_FPS_DEFAULT = 1.0


def sample_frames(
    media: DataFrame, max_frames: int = 4, use_decoder: bool = False
) -> DataFrame:
    """Per-video frame sampling: emit up to ``max_frames`` frames evenly
    spaced over ``duration_s`` (1-row -> N-rows fan-out inside mapInPandas —
    the Spark shape real frame extraction uses; decode stubbed).  Frame
    timestamps are a pure function of (duration_s, max_frames), so the
    timestamp projection is SQL-oracle-checkable; the fake frame bytes are
    deterministic payload derivatives."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, ts_ms, frames = [], [], [], []
            for mid, kind, payload, dur in zip(
                pdf["media_id"], pdf["kind"], pdf["payload"], pdf["duration_s"]
            ):
                if kind != "video" or payload is None or dur is None or dur <= 0:
                    continue
                n = min(max_frames, max(1, int(dur)))
                for i in range(n):
                    t = (i + 0.5) * float(dur) / n
                    ids.append(mid)
                    idxs.append(i)
                    ts_ms.append(int(t * 1000))
                    if use_decoder:
                        raise NotImplementedError(
                            "frame decode requires ffmpeg on the cluster image"
                        )
                    frames.append(_fake_thumb(bytes(payload), 16, 16 + i))
            yield pd.DataFrame(
                {"media_id": ids, "frame_idx": idxs, "ts_ms": ts_ms, "frame": frames}
            )

    return media.select("media_id", "kind", "payload", "duration_s").mapInPandas(
        run, schema="media_id long, frame_idx long, ts_ms long, frame binary"
    )


# --- perceptual hash (dHash) over the pseudo-decode ----------------------------
#
# Image near-dup dedup hashes PIXELS, not bytes: resized thumbnails /
# re-encodes share a dHash (gradient sign grid) while md5 differs.  The
# decode stage is the container stub above, so the "pixels" here are the
# deterministic byte-chunk means (the same honest stand-in _fake_feature
# uses, at 8x9 resolution); swapping in a real `decode_image` + resize
# keeps every downstream line identical.  Small payload perturbations move
# few chunk means, so Hamming distance stays small — the property banded
# near-dup joins need (see dedupsim.simhash_pairs for the banding family
# this hash plugs into).

PHASH_ROWS = 8
PHASH_COLS = 9  # cols-1 comparisons per row -> 64 bits
_PHASH_CELLS = PHASH_ROWS * PHASH_COLS


def naive_phash(payload: bytes) -> int:
    """Row-at-a-time plain-int dHash — the differential golden."""
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
    """Vectorized numpy dHash (the path under test; independent of
    :func:`naive_phash`)."""
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


def media_phash(media: DataFrame) -> DataFrame:
    """(media_id, kind, phash, n_copies) — Arrow-batched dHash plus the
    per-hash copy count (one partial-agg'd exchange on the 8-byte hash;
    payloads never shuffle)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "phash": [
                        _vector_phash(bytes(p)) if p is not None else None
                        for p in pdf["payload"]
                    ],
                }
            )

    hashed = media.select("media_id", "kind", "payload").mapInPandas(
        run, schema=PHASH_SCHEMA
    )
    counts = hashed.groupBy("phash").agg(F.count("*").cast("long").alias("n_copies"))
    return hashed.join(counts, on="phash").select(
        "media_id", "kind", "phash", "n_copies"
    )


# --- audio: energy-based activity segmentation (VAD shape) -------------------
#
# Real audio decode (ffmpeg/soundfile) is absent from this container, so the
# decode step is the module's honest-stub convention: samples ARE the payload
# bytes, centered at the uint8 midpoint.  Everything downstream — framing,
# integer energy, run detection, the Arrow batch shape, the exploded
# 1-row-per-segment output — is the real plumbing a voice-activity /
# music-detection stage needs, and swapping in a true PCM decoder changes
# only the `samples` line.  Integer math end to end (sum // count), so the
# differential golden is bit-exact.

AUDIO_FRAME = 64        # samples per frame
AUDIO_VAD_THRESHOLD = 64  # mean |sample-128| >= this => active frame


def naive_audio_segments(payload: bytes) -> "list[tuple[int, int, int, int]]":
    """Row-at-a-time plain-int golden: (seg_idx, start_frame, n_frames,
    energy_sum) per maximal run of active frames."""
    n_frames = len(payload) // AUDIO_FRAME
    segs = []
    cur = None  # [start, n, esum]
    for f in range(n_frames):
        chunk = payload[f * AUDIO_FRAME : (f + 1) * AUDIO_FRAME]
        energy = sum(abs(b - 128) for b in chunk) // AUDIO_FRAME
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


AUDIO_SEG_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("seg_idx", LongType(), False),
        StructField("start_frame", LongType(), False),
        StructField("n_frames", LongType(), False),
        StructField("energy_sum", LongType(), False),
    ]
)


def _vector_audio_segments(payload: bytes) -> "list[tuple[int, int, int, int]]":
    """Vectorized numpy segmenter (the path under test; independent of the
    golden)."""
    arr = np.frombuffer(payload, dtype=np.uint8).astype(np.int64)
    n_frames = len(arr) // AUDIO_FRAME
    if n_frames == 0:
        return []
    frames = arr[: n_frames * AUDIO_FRAME].reshape(n_frames, AUDIO_FRAME)
    energy = np.abs(frames - 128).sum(axis=1) // AUDIO_FRAME
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


def media_audio_segments(media: DataFrame) -> DataFrame:
    """(media_id, seg_idx, start_frame, n_frames, energy_sum) — active-audio
    segments per payload.  Scale shape: the kind filter is a scan predicate
    (pushes to parquet row-group stats), the segmenter is ONE Arrow-batched
    map pass whose output is segment rows (bounded by frames/2 per payload,
    orders below the byte volume) — payload bytes never shuffle, and
    there's no exchange at all in this op."""

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


# --- video: scene-cut detection over sampled frames ---------------------------
#
# Completes the media triad (image dHash, audio activity, video scenes).
# Real scene detection diffs consecutive DECODED frames; the container has
# no codec, so the stub "frame" is the payload with everything before the
# frame's time offset blanked — a deterministic stand-in whose adjacent
# frames differ proportionally to the time step, which is exactly the
# property a cut detector needs (small diffs within a scene, a real decoder
# swaps in at one line).  Each frame is dHashed and a cut fires when the
# consecutive Hamming distance exceeds the threshold.  All per-video work
# happens inside ONE Arrow batch pass — frames of a video are generated
# together, so even the consecutive diff needs no window and no exchange.

SCENE_MAX_FRAMES = 8
SCENE_CUT_HAMMING = 8


def _scene_frame_bytes(payload: bytes, i: int, n: int) -> bytes:
    off = i * len(payload) // max(n, 1)
    return b"\x00" * off + payload[off:]


def naive_scene_rows(payload: bytes, dur: "float | None"):
    """Row-at-a-time golden: (frame_idx, ts_ms, phash, hamming_prev,
    is_cut) per sampled frame; hamming_prev is NULL (None) on frame 0."""
    if payload is None or dur is None or dur <= 0:
        return []
    n = min(SCENE_MAX_FRAMES, max(1, int(dur)))
    rows, prev = [], None
    for i in range(n):
        h = naive_phash(_scene_frame_bytes(payload, i, n))
        if prev is None:
            ham = None
        else:
            ham = bin((h ^ prev) & ((1 << 64) - 1)).count("1")
        rows.append(
            (
                i,
                int((i + 0.5) * float(dur) / n * 1000),
                h,
                ham,
                bool(ham is not None and ham > SCENE_CUT_HAMMING),
            )
        )
        prev = h
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
    scene-cut candidates.  Scale shape: kind filter is a pushed scan
    predicate; ONE Arrow-batched map computes frames, hashes, and the
    consecutive Hamming diff together (no window, no exchange, payloads
    never shuffle); output is frame-grain, orders below the byte volume."""

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
                n = min(SCENE_MAX_FRAMES, max(1, int(dur)))
                prev = None
                for i in range(n):
                    h = _vector_phash(_scene_frame_bytes(bytes(p), i, n))
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
