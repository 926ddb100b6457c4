"""Multimodal query pipelines over the deterministic synthetic media
corpus (image/audio/video payloads as opaque binary columns).

Image (binary PPM), audio (PCM WAV) and video (YUV4MPEG2) payloads are
all REAL encoded media and the ``decode=True`` path decodes every one of
them with no third-party codec (``stages/multimodal.py``).  These
queries exercise the Ray-side plumbing end to end: the actor-pool feature
extractor over wide binary rows, a random-hyperplane SimHash over the
byte-histogram feature (the media analog of the text near-dup
fingerprint), decoded-domain aggregates, and real frame sampling.  All
are rows-only driver checks (no SQL for binary feature extraction)
pinned by pytest value oracles."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data
from ray.data.aggregate import Count, Max, Sum

from ..stages.multimodal import (
    FEATURE_DIM,
    extract_media_features,
    sample_video_frames,
    synthetic_media_table,
)
from .relational import quantize

MEDIA_N = 96
MEDIA_SEED = 42
_SIMHASH_SEED = 7


def _hyperplanes() -> np.ndarray:
    rng = np.random.default_rng(_SIMHASH_SEED)
    return rng.standard_normal((64, FEATURE_DIM))


def feature_simhash(features: np.ndarray, planes: np.ndarray) -> np.ndarray:
    """64-bit sign-of-projection SimHash of feature vectors (n, dim)."""
    bits = (features @ planes.T) > 0  # (n, 64)
    weights = (np.uint64(1) << np.arange(64, dtype=np.uint64))[None, :]
    return (bits.astype(np.uint64) * weights).sum(axis=1, dtype=np.uint64)


def _media_ds() -> ray.data.Dataset:
    # the driver's testdata has no media table; the deterministic synthetic
    # corpus (seeded) IS the fixture — same rows every run
    return ray.data.from_arrow(synthetic_media_table(n=MEDIA_N, seed=MEDIA_SEED))


def media_features(sf_dir: str) -> ray.data.Dataset:
    """Byte-level features per media item + SimHash of the 64-bin byte
    histogram.  ``sf_dir`` is unused (self-contained fixture) but kept for
    the uniform queries() signature."""
    feats = extract_media_features(_media_ds(), decode=False, batch_size=32)
    planes = _hyperplanes()

    def finish(t: pa.Table) -> pa.Table:
        f = np.asarray(t["feature"].to_pylist(), dtype=np.float64)
        sh = feature_simhash(f, planes) if len(f) else np.empty(0, np.uint64)
        out = pa.table(
            {
                "item_id": t["item_id"],
                "media_type": t["media_type"],
                "n_bytes": t["n_bytes"],
                "sha8_hex": pa.array(
                    [d.hex() for d in t["sha8"].to_pylist()], pa.string()
                ),
                "byte_entropy": t["byte_entropy"],
                "feature_simhash": pa.array(sh.astype(np.int64), pa.int64()),
            }
        )
        return quantize(out, ["byte_entropy"], scale=1_000_000, suffix="_e6")

    return feats.map_batches(finish, batch_format="pyarrow").sort("item_id")


def media_frame_stats(sf_dir: str) -> ray.data.Dataset:
    """REAL frame sampling: per video item, sampled decoded-frame count
    and total decoded YUV bytes (one Y4M frame per sampled second)."""
    videos = _media_ds().map_batches(
        lambda t: t.filter(pc.equal(t["media_type"], "video")),
        batch_format="pyarrow",
    )
    frames = sample_video_frames(videos, every_ms=1000)

    def sizes(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "item_id": t["item_id"],
                "frame_bytes_len": pc.cast(
                    pc.binary_length(t["frame_bytes"]), pa.int64()
                ),
            }
        )

    return (
        frames.map_batches(sizes, batch_format="pyarrow")
        .groupby("item_id")
        .aggregate(
            Count(alias_name="n_frames"),
            Sum("frame_bytes_len", alias_name="total_bytes"),
        )
        .sort("item_id")
    )


def media_decoded_stats(sf_dir: str) -> ray.data.Dataset:
    """REAL decode through the actor pool (decode=True) for ALL THREE
    modalities: per media type, decoded-domain aggregates — images:
    decoded pixel count and mean entropy over pixels; audio: total decoded
    samples and the uniform sample rate (Hz); video: total decoded YUV
    samples and the frame rate (fps rides the rate column).  Rows-only
    driver check; value-pinned by pytest."""
    feats = extract_media_features(_media_ds(), decode=True, batch_size=32)

    def partials(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "media_type": t["media_type"],
                "n_samples": t["n_samples"],
                "entropy": t["byte_entropy"],
                "sample_rate": pc.cast(t["sample_rate"], pa.int64()),
            }
        )

    agg = (
        feats.map_batches(partials, batch_format="pyarrow")
        .groupby("media_type")
        .aggregate(
            Count(alias_name="n_items"),
            Sum("n_samples", alias_name="total_samples"),
            Sum("entropy", alias_name="entropy_sum"),
            Max("sample_rate", alias_name="max_sample_rate"),
        )
    )

    def finish(t: pa.Table) -> pa.Table:
        es = t["entropy_sum"].to_numpy(zero_copy_only=False)
        n = t["n_items"].to_numpy(zero_copy_only=False).astype(np.float64)
        out = pa.table(
            {
                "media_type": t["media_type"],
                "n_items": t["n_items"],
                "total_samples": t["total_samples"],
                "mean_entropy": pa.array(es / np.maximum(n, 1), pa.float64()),
                "max_sample_rate": t["max_sample_rate"],
            }
        )
        return quantize(out, ["mean_entropy"], scale=1_000_000, suffix="_e6")

    return agg.map_batches(finish, batch_format="pyarrow").sort("media_type")
