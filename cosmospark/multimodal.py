"""Multimodal payload columns: audio + video as opaque binary with typed
metadata, processed by Arrow-batched mapInPandas operators.

The container has no audio/video libraries (per the build brief), so the
*codecs* are deterministic fakes — integer-arithmetic PCM/frame content
reproducible on any executor AND re-derivable in SQL for oracle checks —
while everything Spark-side is real and load-bearing: schemas, UDF
signatures, Arrow batch shapes, the 1→N frame-sample explosion, and the
narrow zero-shuffle plan shape shared with the image pipeline
(cosmospark/imagejob.py). A real decoder (ffmpeg/soundfile) drops into
``_decode_*`` without touching any plan.

Fake formats:
  audio ``pcm16``: b"CSA1" + uint32 sample_rate + uint32 n_samples +
                   uint16 channels + int16 samples (interleaved), sample
                   content from a per-(audio, index) LCG;
  video ``rawv`` : b"CSV1" + uint16 w/h + uint32 n_frames + per-frame
                   uint8 RGB planes, pixel content from a per-(video,
                   frame, pixel) LCG (same generator family as
                   imagejob._pixels_for).

Unknown codecs raise NotImplementedError — the clearly-marked stub seam.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

_A = np.uint64(6364136223846793005)
_C = np.uint64(1442695040888963407)
_M33 = np.uint64(33)

AUDIO_SCHEMA = T.StructType(
    [
        T.StructField("audio_id", T.LongType(), False),
        T.StructField("bytes", T.BinaryType()),
        T.StructField("codec", T.StringType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("n_samples", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
        T.StructField("caption", T.StringType()),
    ]
)

VIDEO_SCHEMA = T.StructType(
    [
        T.StructField("video_id", T.LongType(), False),
        T.StructField("bytes", T.BinaryType()),
        T.StructField("codec", T.StringType()),
        T.StructField("w", T.IntegerType()),
        T.StructField("h", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("fps", T.DoubleType()),
        T.StructField("caption", T.StringType()),
    ]
)


# ---------------------------------------------------------------------------
# deterministic fake content (integer arithmetic — SQL-rederivable)


_M64 = (1 << 64) - 1


def _audio_samples(aid: int, n: int) -> np.ndarray:
    """int16 samples for audio ``aid``: ((seed + i*2654435761)*A) >> 33
    masked to 16 bits, centered. Pure uint64 wrapping arithmetic (the
    scalar seed is folded in Python ints to avoid numpy overflow
    warnings; array ops wrap silently by dtype)."""
    idx = np.arange(n, dtype=np.uint64)
    seed = np.uint64((int(aid) * int(_A) + int(_C)) & _M64)
    with np.errstate(over="ignore"):
        v = (seed + idx * np.uint64(2654435761)) * _A
    return (((v >> _M33) & np.uint64(0xFFFF)).astype(np.int64) - 32768).astype(np.int16)


def _video_frame(vid: int, frame: int, w: int, h: int) -> np.ndarray:
    """uint8 RGB frame (h, w, 3); per-frame seed folds the frame index."""
    k = w * h * 3
    idx = np.arange(k, dtype=np.uint64)
    seed = np.uint64(
        ((int(vid) * int(_A) + int(frame) * 2654435761 + int(_C)) * int(_A)) & _M64
    )
    with np.errstate(over="ignore"):
        v = (seed + idx * np.uint64(2654435761)) * _A
    return ((v >> _M33) & np.uint64(0xFF)).astype(np.uint8).reshape(h, w, 3)


def first_px_expr(vid_col: str, frame_col: str) -> str:
    """The first pixel value of a fake frame as portable SQL (HUGEINT
    wrapping arithmetic in DuckDB; bigint overflow wraps natively in
    Spark). Used by oracle checks to re-derive decoded content without a
    decoder."""
    A = "6364136223846793005::HUGEINT"
    C = "1442695040888963407::HUGEINT"
    m = "18446744073709551616::HUGEINT"  # 2^64
    seed = (
        f"((CAST({vid_col} AS HUGEINT) * {A} + CAST({frame_col} AS HUGEINT)"
        f" * 2654435761::HUGEINT + {C}) % {m})"
    )
    # two A multiplications: the python _video_frame folds one A into the
    # per-frame seed and a second in the per-pixel step (idx = 0)
    v = f"((({seed} * {A}) % {m}) * {A}) % {m}"
    return f"CAST(((({v}) // 8589934592::HUGEINT) % 256::HUGEINT) AS INT)"  # >>33 & 0xFF


# ---------------------------------------------------------------------------
# fake codecs


def encode_audio(aid: int, sample_rate: int, n_samples: int, channels: int = 1) -> bytes:
    s = _audio_samples(aid, n_samples * channels)
    head = (
        b"CSA1"
        + np.uint32(sample_rate).tobytes()
        + np.uint32(n_samples).tobytes()
        + np.uint16(channels).tobytes()
    )
    return head + s.tobytes()


def decode_audio(blob: bytes, codec: str) -> tuple[int, int, int, np.ndarray]:
    if codec != "pcm16" or blob[:4] != b"CSA1":
        raise NotImplementedError(
            f"audio codec {codec!r} needs a real decoder (stub seam)"
        )
    sr = int(np.frombuffer(blob, np.uint32, 1, 4)[0])
    n = int(np.frombuffer(blob, np.uint32, 1, 8)[0])
    ch = int(np.frombuffer(blob, np.uint16, 1, 12)[0])
    samples = np.frombuffer(blob, np.int16, n * ch, 14)
    return sr, n, ch, samples


def encode_video(vid: int, w: int, h: int, n_frames: int) -> bytes:
    head = (
        b"CSV1"
        + np.uint16(w).tobytes()
        + np.uint16(h).tobytes()
        + np.uint32(n_frames).tobytes()
    )
    frames = [_video_frame(vid, f, w, h).tobytes() for f in range(n_frames)]
    return head + b"".join(frames)


def decode_video_frames(blob: bytes, codec: str, which: np.ndarray) -> list[np.ndarray]:
    if codec != "rawv" or blob[:4] != b"CSV1":
        raise NotImplementedError(
            f"video codec {codec!r} needs a real decoder (stub seam)"
        )
    w = int(np.frombuffer(blob, np.uint16, 1, 4)[0])
    h = int(np.frombuffer(blob, np.uint16, 1, 6)[0])
    k = w * h * 3
    out = []
    for f in which:
        off = 12 + int(f) * k
        out.append(np.frombuffer(blob, np.uint8, k, off).reshape(h, w, 3))
    return out


# ---------------------------------------------------------------------------
# fixtures


def gen_audio(n: int, sample_rate: int = 8000) -> list[dict]:
    rows = []
    for i in range(n):
        ns = 1000 + (i * 977) % 7000  # 0.125 .. 1.0 s
        ch = 1 + (i % 2)
        rows.append(
            {
                "audio_id": i,
                "bytes": encode_audio(i, sample_rate, ns, ch),
                "codec": "pcm16",
                "sample_rate": sample_rate,
                "n_samples": ns,
                "channels": ch,
                "caption": f"clip {i} spk{i % 5}",
            }
        )
    return rows


def gen_video(n: int, w: int = 8, h: int = 8) -> list[dict]:
    rows = []
    for i in range(n):
        nf = 8 + (i * 13) % 25  # 8 .. 32 frames
        rows.append(
            {
                "video_id": i,
                "bytes": encode_video(i, w, h, nf),
                "codec": "rawv",
                "w": w,
                "h": h,
                "n_frames": nf,
                "fps": 8.0,
                "caption": f"vid {i} scene{i % 4}",
            }
        )
    return rows


# ---------------------------------------------------------------------------
# operators (real Spark plumbing)

AUDIO_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("audio_id", T.LongType()),
        T.StructField("duration_sec", T.DoubleType()),
        T.StructField("bytes_ok", T.BooleanType()),
        T.StructField("rms", T.DoubleType()),
        T.StructField("zero_crossings", T.LongType()),
        T.StructField("clip_count", T.LongType()),
        T.StructField("clip_ratio", T.DoubleType()),
    ]
)


def audio_features(audio: DataFrame) -> DataFrame:
    """Decode + feature-extract per clip, one narrow Arrow pass: duration
    (metadata), payload-size consistency, RMS, zero-crossing count, and
    clipping ratio (|sample| ≥ 32000). Vectorized numpy per batch."""

    def _run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for r in pdf.itertuples(index=False):
                sr, n, ch, s = decode_audio(r.bytes, r.codec)
                s64 = s.astype(np.int64)
                total = n * ch
                # exact integer sum-of-squares → one float sqrt at the
                # end: bit-identical across engines (a float mean would
                # diverge from a SQL fold by summation order)
                ssq = int(np.sum(s64 * s64))
                out.append(
                    {
                        "audio_id": r.audio_id,
                        "duration_sec": round(n / sr, 6),
                        "bytes_ok": len(r.bytes) == 14 + 2 * n * ch
                        and sr == r.sample_rate
                        and n == r.n_samples
                        and ch == r.channels,
                        "rms": round(float(np.sqrt(ssq / total)), 3),
                        "zero_crossings": int(
                            np.count_nonzero(np.signbit(s64[1:]) != np.signbit(s64[:-1]))
                        ),
                        # exact integer alongside the ratio: rounded
                        # rationals can straddle a round-half boundary
                        # across engines, integers cannot
                        "clip_count": int(np.count_nonzero(np.abs(s64) >= 32000)),
                        "clip_ratio": round(
                            int(np.count_nonzero(np.abs(s64) >= 32000)) / total, 4
                        ),
                    }
                )
            yield pd.DataFrame(out, columns=[f.name for f in AUDIO_FEATURES_SCHEMA.fields])

    return audio.mapInPandas(_run, AUDIO_FEATURES_SCHEMA)


FRAME_SAMPLE_SCHEMA = T.StructType(
    [
        T.StructField("video_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("first_px", T.IntegerType()),
        T.StructField("mean_px", T.DoubleType()),
        T.StructField("frame_bytes", T.BinaryType()),
    ]
)


def video_frame_sample(video: DataFrame, every: int = 4, emit_bytes: bool = False) -> DataFrame:
    """Sample every ``every``-th frame of each video: the 1→N explosion
    operator (one input row yields ceil(n_frames/every) output rows) with
    per-frame decode inside the same Arrow pass. ``emit_bytes`` controls
    whether raw frame payloads travel downstream (off by default — at
    10^12 scale you only forward frames selected for further work)."""

    def _run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for r in pdf.itertuples(index=False):
                which = np.arange(0, r.n_frames, every, dtype=np.int64)
                frames = decode_video_frames(r.bytes, r.codec, which)
                for f, fr in zip(which, frames):
                    out.append(
                        {
                            "video_id": r.video_id,
                            "frame_idx": int(f),
                            "first_px": int(fr.reshape(-1)[0]),
                            "mean_px": round(float(fr.mean()), 4),
                            "frame_bytes": fr.tobytes() if emit_bytes else b"",
                        }
                    )
            yield pd.DataFrame(out, columns=[f.name for f in FRAME_SAMPLE_SCHEMA.fields])

    return video.mapInPandas(_run, FRAME_SAMPLE_SCHEMA)


def resize_images(images: DataFrame, out_px: int, px: int = 16) -> DataFrame:
    """Nearest-neighbor resize of raw-coded image payloads — a REAL
    transform (no library needed): decode → index-map resample →
    re-encode, one narrow pass. Non-raw formats route through the lossy
    decoder first."""
    from cosmospark import codecs

    out_fields = [f for f in images.schema.fields if f.name not in ("bytes", "w", "h")]
    out_schema = T.StructType(
        out_fields
        + [
            T.StructField("bytes", T.BinaryType()),
            T.StructField("w", T.IntegerType()),
            T.StructField("h", T.IntegerType()),
        ]
    )
    header = b"CSR1" + np.uint16(out_px).tobytes() + np.uint16(out_px).tobytes()
    src_idx = (np.arange(out_px) * px // out_px).astype(np.int64)

    def _run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            blobs = []
            for r in pdf.itertuples(index=False):
                if r.fmt == "raw":
                    pix = codecs.decode_raw_batch([r.bytes], px, px)[0]
                else:
                    pix = codecs.decode_lossy_batch([r.bytes], px, px)[0]
                small = pix[src_idx][:, src_idx]
                blobs.append(header + small.tobytes())
            out = pdf.drop(columns=["bytes", "w", "h"])
            out["bytes"] = blobs
            out["w"] = out_px
            out["h"] = out_px
            yield out

    return images.mapInPandas(_run, out_schema)
