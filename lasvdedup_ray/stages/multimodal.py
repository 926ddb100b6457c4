"""Multimodal (image/audio/video) column plumbing.

Media payloads are opaque ``binary`` columns with typed metadata
(``MEDIA_SCHEMA``).  The Ray-side plumbing — schema, actor-pool signature,
batch sizing for large binary rows, output layout — is real and tested;
the pixel/sample *decode* itself is STUBBED (image/audio libraries are not
in this container): ``decode=True`` raises ``NotImplementedError`` unless
PIL/soundfile import succeeds, and the deterministic byte-level feature
path stands in for model features.

Batch-size note (memory-aware, SURVEY §4): media rows are wide — callers
should pass ``batch_size`` small enough that
``batch_size * max_payload * concurrency`` fits a worker heap.
"""

from __future__ import annotations

import hashlib
from typing import Optional

import numpy as np
import pyarrow as pa
import ray.data

MEDIA_SCHEMA = pa.schema(
    [
        ("item_id", pa.int64()),
        ("media_type", pa.string()),  # "image" | "audio" | "video"
        ("payload", pa.large_binary()),
        ("width", pa.int32()),        # -1 when unknown / not applicable
        ("height", pa.int32()),
        ("duration_ms", pa.int32()),
    ]
)

FEATURE_DIM = 64


class MediaFeatureExtractor:
    """Actor-pool stage: deterministic features per media payload.

    ``__init__`` (once per actor) probes optional decoders; ``__call__``
    (per batch) emits byte-level features: size, sha256 prefix, a 64-bin
    byte histogram (L1-normalized) usable as a near-dup embedding, and
    Shannon entropy.  With ``decode=True`` and no decoder available the
    stage raises ``NotImplementedError`` — the clearly-marked stub.
    """

    def __init__(self, decode: bool = False):
        self.decode = decode
        self.pil = None
        if decode:
            try:  # gated optional dependency — absent in this container
                import PIL.Image  # type: ignore

                self.pil = PIL.Image
            except ImportError:
                raise NotImplementedError(
                    "media decode requested but no image library is available; "
                    "byte-level features (decode=False) are the supported path"
                )

    def __call__(self, t: pa.Table) -> pa.Table:
        payloads = t["payload"].to_pylist()
        n = len(payloads)
        sizes = np.empty(n, dtype=np.int64)
        entropy = np.empty(n, dtype=np.float64)
        hists = np.empty((n, FEATURE_DIM), dtype=np.float64)
        digests = []
        for i, p in enumerate(payloads):
            b = np.frombuffer(p, dtype=np.uint8) if p else np.zeros(1, np.uint8)
            sizes[i] = len(p or b"")
            h = np.bincount(b >> 2, minlength=FEATURE_DIM).astype(np.float64)
            tot = h.sum() or 1.0
            h /= tot
            hists[i] = h
            nz = h[h > 0]
            entropy[i] = float(-(nz * np.log2(nz)).sum())
            digests.append(hashlib.sha256(p or b"").digest()[:8])
        return pa.table(
            {
                "item_id": t["item_id"],
                "media_type": t["media_type"],
                "n_bytes": pa.array(sizes, pa.int64()),
                "sha8": pa.array(digests, pa.binary()),
                "byte_entropy": pa.array(np.round(entropy, 6), pa.float64()),
                "feature": pa.array(list(hists), pa.list_(pa.float64())),
            }
        )


def extract_media_features(
    ds: ray.data.Dataset,
    decode: bool = False,
    batch_size: int = 64,
    concurrency=(1, 4),
) -> ray.data.Dataset:
    """Actor-pool map_batches over media rows (small batches: wide rows)."""
    return ds.map_batches(
        MediaFeatureExtractor,
        fn_constructor_kwargs={"decode": decode},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )


def frame_sample_stub(ds: ray.data.Dataset, every_ms: int = 1000) -> ray.data.Dataset:
    """Video frame-sampling plumbing: emits one row per sampled timestamp
    with a deterministic byte-slice standing in for the decoded frame
    (real decoder absent — stub clearly marked)."""

    def sample(t: pa.Table) -> pa.Table:
        ids, ts_out, frames = [], [], []
        for iid, payload, dur in zip(
            t["item_id"].to_pylist(),
            t["payload"].to_pylist(),
            t["duration_ms"].to_pylist(),
        ):
            dur = max(int(dur or 0), 0)
            n_frames = max(1, dur // every_ms)
            size = len(payload or b"")
            for f in range(n_frames):
                ids.append(iid)
                ts_out.append(f * every_ms)
                if size:
                    lo = (f * size) // n_frames
                    hi = ((f + 1) * size) // n_frames
                    frames.append(payload[lo:hi])  # STUB: slice, not a decode
                else:
                    frames.append(b"")
        return pa.table(
            {
                "item_id": pa.array(ids, pa.int64()),
                "frame_ts_ms": pa.array(ts_out, pa.int32()),
                "frame_bytes": pa.array(frames, pa.large_binary()),
            }
        )

    return ds.map_batches(sample, batch_format="pyarrow", batch_size=32)


def synthetic_media_table(n: int = 32, seed: int = 42) -> pa.Table:
    """Deterministic fake media corpus for plumbing tests."""
    rng = np.random.default_rng(seed)
    types = ["image", "audio", "video"]
    rows = {k: [] for k in MEDIA_SCHEMA.names}
    for i in range(n):
        mt = types[i % 3]
        size = int(rng.integers(200, 4000))
        payload = rng.integers(0, 256, size, dtype=np.uint8).tobytes()
        rows["item_id"].append(i)
        rows["media_type"].append(mt)
        rows["payload"].append(payload)
        rows["width"].append(64 if mt == "image" else -1)
        rows["height"].append(48 if mt == "image" else -1)
        rows["duration_ms"].append(int(rng.integers(500, 5000)) if mt != "image" else -1)
    return pa.table(rows, schema=MEDIA_SCHEMA)
