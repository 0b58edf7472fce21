"""Multimodal column operators: image / audio / video as opaque binary.

Training-data pipelines treat media as ``binary`` columns with typed
metadata and run decode / feature-extract / resize / frame-sample as
Arrow-batched ``mapInPandas`` stages. In this container only the image
path has a real codec (the stdlib PNG codec in images.py); audio/video
decode is STUBBED behind a deterministic fake (per the task brief: the
Spark-side plumbing — schema, partitioning, UDF signature, batch
shape — is real and tested; the codec call sites are clearly marked).

Column-pruning discipline: every operator here takes a slim projection
and is the only stage that touches the binary column.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from .images import decode_image, png_encode

try:  # pragma: no cover - not in this container
    import soundfile  # noqa: F401

    _HAVE_AUDIO = True
except Exception:
    _HAVE_AUDIO = False


# ----------------------------------------------------------------- images
IMAGE_FEATURES_SCHEMA = (
    "image_id string, w int, h int, mean_r double, mean_g double, "
    "mean_b double, brightness double, edge_energy double"
)


def image_features_iter(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """mapInPandas body: decode + cheap visual features per image.
    Input cols: (image_id, bytes, fmt)."""
    for pdf in batches:
        rows = []
        for r in pdf.itertuples(index=False):
            px = decode_image(bytes(r.bytes), r.fmt).astype(np.float64)
            mean = px.mean(axis=(0, 1))
            gray = px.mean(axis=2)
            gy, gx = np.gradient(gray)
            rows.append((
                r.image_id, px.shape[1], px.shape[0],
                float(mean[0]), float(mean[1]), float(mean[2]),
                float(gray.mean() / 255.0),
                float(np.sqrt(gx**2 + gy**2).mean()),
            ))
        yield pd.DataFrame(rows, columns=[
            "image_id", "w", "h", "mean_r", "mean_g", "mean_b",
            "brightness", "edge_energy",
        ])


def image_features(media: DataFrame) -> DataFrame:
    """Decode + feature-extract over the media table; only this stage
    reads ``bytes`` (check ReadSchema in the scan)."""
    return media.select("image_id", "bytes", "fmt").mapInPandas(
        image_features_iter, IMAGE_FEATURES_SCHEMA
    )


def _block_mean_resize(px: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    h, w, c = px.shape
    ys = np.linspace(0, h, out_h + 1).astype(int)
    xs = np.linspace(0, w, out_w + 1).astype(int)
    out = np.empty((out_h, out_w, c), dtype=np.float64)
    for i in range(out_h):
        for j in range(out_w):
            out[i, j] = px[ys[i]:max(ys[i + 1], ys[i] + 1),
                           xs[j]:max(xs[j + 1], xs[j] + 1)].mean(axis=(0, 1))
    return out.clip(0, 255).astype(np.uint8)


def resize_images(media: DataFrame, out_w: int = 16, out_h: int = 16) -> DataFrame:
    """Thumbnail stage: decode -> block-mean resize -> re-encode PNG.
    The write side of a typical training-data image pipeline."""

    def it(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                px = decode_image(bytes(r.bytes), r.fmt)
                thumb = _block_mean_resize(px, out_w, out_h)
                rows.append((r.image_id, png_encode(thumb), out_w, out_h))
            yield pd.DataFrame(
                rows, columns=["image_id", "thumb", "w", "h"]
            )

    return media.select("image_id", "bytes", "fmt").mapInPandas(
        it, "image_id string, thumb binary, w int, h int"
    )


# ------------------------------------------------------------ audio (STUB)
AUDIO_FEATURES_SCHEMA = (
    "clip_id string, n_samples long, sample_rate int, rms double, "
    "zero_crossings long"
)


def decode_audio(data: bytes) -> tuple[np.ndarray, int]:
    """STUB: no audio codec in this container. With soundfile installed
    this is a one-line real decode; the deterministic fake derives a
    waveform from the byte content so downstream feature math is real
    and testable."""
    if _HAVE_AUDIO:  # pragma: no cover
        import io

        import soundfile as sf

        wav, rate = sf.read(io.BytesIO(data))
        return np.asarray(wav, dtype=np.float64), int(rate)
    # deterministic fake: bytes -> [-1, 1) samples
    arr = np.frombuffer(data, dtype=np.uint8).astype(np.float64)
    return (arr - 128.0) / 128.0, 16000


def audio_features_iter(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """mapInPandas body over (clip_id, bytes)."""
    for pdf in batches:
        rows = []
        for r in pdf.itertuples(index=False):
            wav, rate = decode_audio(bytes(r.bytes))
            zc = int(((wav[:-1] * wav[1:]) < 0).sum()) if len(wav) > 1 else 0
            rms = float(np.sqrt((wav**2).mean())) if len(wav) else 0.0
            rows.append((r.clip_id, len(wav), rate, rms, zc))
        yield pd.DataFrame(rows, columns=[
            "clip_id", "n_samples", "sample_rate", "rms", "zero_crossings",
        ])


def audio_features(clips: DataFrame) -> DataFrame:
    return clips.select("clip_id", "bytes").mapInPandas(
        audio_features_iter, AUDIO_FEATURES_SCHEMA
    )


# ------------------------------------------------------------ video (STUB)
def sample_video_frames(
    videos: DataFrame, every_n: int = 10, frame_bytes: int = 256
) -> DataFrame:
    """Frame-sampling plumbing: one input row -> many frame rows
    (mapInPandas with a fan-out batch shape). The decoder is STUBBED —
    no video codec in this container — as a deterministic chunker that
    treats each ``frame_bytes`` slice as a "frame"; a real ffmpeg/pyav
    decode drops in at the marked call."""

    def it(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"video_id": [], "frame_no": [], "frame": []}
            for r in pdf.itertuples(index=False):
                data = bytes(r.bytes)
                # STUB decode: real impl = pyav keyframe iterator
                n_frames = max(1, len(data) // frame_bytes)
                for f in range(0, n_frames, every_n):
                    out["video_id"].append(r.video_id)
                    out["frame_no"].append(f)
                    out["frame"].append(
                        data[f * frame_bytes:(f + 1) * frame_bytes]
                    )
            yield pd.DataFrame(out)

    return videos.select("video_id", "bytes").mapInPandas(
        it, "video_id string, frame_no int, frame binary"
    )
