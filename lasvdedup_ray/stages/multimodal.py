"""Multimodal (image/audio/video) column plumbing.

Media payloads are opaque ``binary`` columns with typed metadata
(``MEDIA_SCHEMA``).  The Ray-side plumbing — schema, actor-pool signature,
batch sizing for large binary rows, output layout — is real and tested.
The decode path (``decode=True``) is REAL for all three modalities, using
only formats that need no third-party codec: binary PPM (P6) images,
PCM WAV audio (stdlib ``wave``), and YUV4MPEG2 (.y4m) uncompressed video
(plain-text header + raw planar frames) — all of which the synthetic
corpus emits as genuine encoded payloads.  Compressed video (h264 etc.)
raises ``NotImplementedError`` (no pure-Python codec exists), and PIL is
probed as an optional fallback for other image formats.

Batch-size note (memory-aware, SURVEY §4): media rows are wide — callers
should pass ``batch_size`` small enough that
``batch_size * max_payload * concurrency`` fits a worker heap.
"""

from __future__ import annotations

import hashlib
import io
import wave
from typing import Optional, Tuple

import numpy as np
import pyarrow as pa
import ray.data


def parse_ppm(b: bytes) -> Tuple[int, int, np.ndarray]:
    """(width, height, flat uint8 RGB pixels) from a binary PPM (P6).

    Pure-Python header parse (magic, whitespace/comments, dims, maxval)
    + zero-copy np.frombuffer over the raster."""
    if not b.startswith(b"P6"):
        raise ValueError("not a binary PPM (P6) payload")
    pos, fields = 2, []
    while len(fields) < 3:
        while pos < len(b) and b[pos : pos + 1].isspace():
            pos += 1
        if b[pos : pos + 1] == b"#":  # comment to end of line
            pos = b.index(b"\n", pos) + 1
            continue
        start = pos
        while pos < len(b) and not b[pos : pos + 1].isspace():
            pos += 1
        fields.append(int(b[start:pos]))
    pos += 1  # single whitespace after maxval, then raster
    w, h, maxval = fields
    if maxval > 255:
        raise ValueError(f"16-bit PPM not supported (maxval={maxval})")
    n = w * h * 3
    raster = np.frombuffer(b, dtype=np.uint8, count=n, offset=pos)
    return w, h, raster


def parse_wav(b: bytes) -> Tuple[int, int, np.ndarray]:
    """(sample_rate, n_channels, int16 samples) from a PCM WAV payload —
    stdlib ``wave``, no external codec."""
    with wave.open(io.BytesIO(b), "rb") as wf:
        rate = wf.getframerate()
        nch = wf.getnchannels()
        sw = wf.getsampwidth()
        frames = wf.readframes(wf.getnframes())
    if sw == 2:
        samples = np.frombuffer(frames, dtype=np.int16)
    elif sw == 1:  # 8-bit WAV is unsigned; recenter to signed
        samples = np.frombuffer(frames, dtype=np.uint8).astype(np.int16) - 128
    else:
        raise ValueError(f"unsupported WAV sample width: {sw}")
    return rate, nch, samples


# YUV4MPEG2 colorspace -> bytes per pixel (as a fraction num/den); C420
# variants carry chroma at quarter resolution, C422 at half, C444 full
_Y4M_BPP = {
    "420": (3, 2), "420jpeg": (3, 2), "420mpeg2": (3, 2), "420paldv": (3, 2),
    "422": (2, 1), "444": (3, 1), "mono": (1, 1),
}


def parse_y4m(b: bytes) -> Tuple[int, int, int, int, np.ndarray]:
    """(width, height, fps_num, fps_den, frames) from a YUV4MPEG2 payload.

    Pure-Python text-header parse + one ``np.frombuffer`` reshape over the
    raw planar frames (uint8, shape ``(n_frames, frame_size)``).  Frame
    size is fixed by W/H/C, and every frame is prefixed by a ``FRAME``
    line; frame-level parameters are rejected (fixed stride is what lets
    the raster decode stay a single zero-copy reshape)."""
    if not b.startswith(b"YUV4MPEG2"):
        raise ValueError("not a YUV4MPEG2 payload")
    nl = b.index(b"\n")
    w = h = num = den = 0
    cspace = "420jpeg"  # spec default when C is absent
    for tok in b[9:nl].split():
        tag, val = tok[:1], tok[1:]
        if tag == b"W":
            w = int(val)
        elif tag == b"H":
            h = int(val)
        elif tag == b"F":
            num, den = (int(x) for x in val.split(b":"))
        elif tag == b"C":
            cspace = val.decode()
    if w <= 0 or h <= 0 or num <= 0 or den <= 0:
        raise ValueError("Y4M header missing W/H/F")
    if cspace not in _Y4M_BPP:
        raise ValueError(f"unsupported Y4M colorspace: C{cspace}")
    bn, bd = _Y4M_BPP[cspace]
    frame_size = w * h * bn // bd
    marker = b"FRAME\n"
    stride = len(marker) + frame_size  # every record: "FRAME\n" + raster
    body = b[nl + 1 :]
    n_frames = len(body) // stride
    if n_frames * stride != len(body):
        raise ValueError("Y4M payload truncated or has FRAME parameters")
    raw = np.frombuffer(body, dtype=np.uint8).reshape(n_frames, stride)
    # one vectorized compare over all markers (a per-frame Python loop was
    # the only O(n_frames) Python work in an otherwise zero-copy parser)
    want = np.frombuffer(marker, dtype=np.uint8)
    if not (raw[:, : len(marker)] == want).all():
        raise ValueError("Y4M FRAME markers malformed")
    return w, h, num, den, raw[:, len(marker) :]


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

    ``__init__`` (once per actor) wires the decoders; ``__call__`` (per
    batch) emits size, sha256 prefix, a 64-bin L1-normalized histogram
    usable as a near-dup embedding, and Shannon entropy.

    ``decode=False``: features over the raw payload BYTES.
    ``decode=True``: REAL decode for PPM images (pure-Python header
    parse), PCM WAV audio (stdlib ``wave``) and YUV4MPEG2 video
    (pure-Python header parse + planar-frame reshape); features are
    computed over the DECODED domain (pixels / samples / YUV planes) and
    decode metadata columns are added (decoded_width/height, sample_rate
    — Hz for audio, fps for video — and n_samples; -1 where not
    applicable).  PIL is probed as an optional fallback for other image
    formats; compressed video raises ``NotImplementedError`` (no
    pure-Python codec exists).
    """

    def __init__(self, decode: bool = False):
        self.decode = decode
        self.pil = None
        if decode:
            try:  # optional extra image formats — absent in this container
                import PIL.Image  # type: ignore

                self.pil = PIL.Image
            except ImportError:
                self.pil = None  # PPM/WAV built-ins still available

    def _decode_image(self, p: bytes) -> np.ndarray:
        """(flat uint8 pixels, width, height) for PPM (or PIL formats)."""
        if p.startswith(b"P6"):
            w, h, raster = parse_ppm(p)
            self._last_dims = (w, h)
            return raster
        if self.pil is not None:
            img = self.pil.open(io.BytesIO(p))
            arr = np.asarray(img, dtype=np.uint8).ravel()
            self._last_dims = (img.width, img.height)
            return arr
        raise NotImplementedError(
            "image decode: only binary PPM (P6) is supported without PIL"
        )

    def _decode_video(self, p: bytes) -> Tuple[int, np.ndarray]:
        """(fps, flat uint8 YUV samples over all frames) for Y4M video."""
        if not p.startswith(b"YUV4MPEG2"):
            raise NotImplementedError(
                "video decode: only uncompressed YUV4MPEG2 (.y4m) is "
                "supported (no pure-Python codec exists for compressed video)"
            )
        w, h, num, den, frames = parse_y4m(p)
        self._last_dims = (w, h)
        # round-half, not floor: NTSC F30000:1001 reports 30, not 29
        return int(round(num / den)), frames.reshape(-1)

    def __call__(self, t: pa.Table) -> pa.Table:
        payloads = t["payload"].to_pylist()
        mtypes = t["media_type"].to_pylist()
        n = len(payloads)
        sizes = np.empty(n, dtype=np.int64)
        entropy = np.empty(n, dtype=np.float64)
        hists = np.empty((n, FEATURE_DIM), dtype=np.float64)
        digests = []
        dec_w = np.full(n, -1, dtype=np.int32)
        dec_h = np.full(n, -1, dtype=np.int32)
        rates = np.full(n, -1, dtype=np.int32)
        n_samples = np.full(n, -1, dtype=np.int64)
        for i, (p, mt) in enumerate(zip(payloads, mtypes)):
            sizes[i] = len(p or b"")
            digests.append(hashlib.sha256(p or b"").digest()[:8])
            if self.decode:
                if mt == "image":
                    self._last_dims = (-1, -1)
                    pix = self._decode_image(p)
                    dec_w[i], dec_h[i] = self._last_dims
                    n_samples[i] = pix.size
                    b = pix if pix.size else np.zeros(1, np.uint8)
                elif mt == "audio":
                    rate, nch, samples = parse_wav(p)
                    rates[i] = rate
                    n_samples[i] = samples.size // max(nch, 1)
                    # int16 samples -> 64 bins over the full signed range
                    b = ((samples.astype(np.int32) + 32768) >> 8).astype(np.uint8)
                    if b.size == 0:
                        b = np.zeros(1, np.uint8)
                elif mt == "video":
                    self._last_dims = (-1, -1)
                    fps, yuv = self._decode_video(p)
                    dec_w[i], dec_h[i] = self._last_dims
                    rates[i] = fps  # frames/sec rides the rate column
                    n_samples[i] = yuv.size  # decoded YUV samples
                    b = yuv if yuv.size else np.zeros(1, np.uint8)
                else:
                    raise NotImplementedError(
                        f"decode for media_type={mt!r} is not implemented; "
                        "use decode=False"
                    )
            else:
                b = np.frombuffer(p, dtype=np.uint8) if p else np.zeros(1, np.uint8)
            h = np.bincount(b >> 2, minlength=FEATURE_DIM).astype(np.float64)
            tot = h.sum() or 1.0
            h /= tot
            hists[i] = h
            nz = h[h > 0]
            entropy[i] = float(-(nz * np.log2(nz)).sum())
        cols = {
            "item_id": t["item_id"],
            "media_type": t["media_type"],
            "n_bytes": pa.array(sizes, pa.int64()),
            "sha8": pa.array(digests, pa.binary()),
            "byte_entropy": pa.array(np.round(entropy, 6), pa.float64()),
            "feature": pa.array(list(hists), pa.list_(pa.float64())),
        }
        if self.decode:
            cols["decoded_width"] = pa.array(dec_w, pa.int32())
            cols["decoded_height"] = pa.array(dec_h, pa.int32())
            cols["sample_rate"] = pa.array(rates, pa.int32())
            cols["n_samples"] = pa.array(n_samples, pa.int64())
        return pa.table(cols)


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


def sample_video_frames(
    ds: ray.data.Dataset, every_ms: int = 1000
) -> ray.data.Dataset:
    """REAL video frame sampling over Y4M payloads: one row per sampled
    timestamp (0, every_ms, ... capped at the stream's duration, at least
    one sample) carrying the ACTUAL decoded planar-YUV frame nearest that
    timestamp.  Wide binary rows -> small batch_size (memory-aware)."""

    def sample(t: pa.Table) -> pa.Table:
        ids, ts_out, frames = [], [], []
        for iid, payload in zip(
            t["item_id"].to_pylist(), t["payload"].to_pylist()
        ):
            w, h, num, den, fr = parse_y4m(payload)
            dur_ms = fr.shape[0] * 1000 * den // max(num, 1)
            n_out = max(1, dur_ms // every_ms)
            for s in range(n_out):
                ts = s * every_ms
                fi = min(ts * num // (1000 * den), fr.shape[0] - 1)
                ids.append(iid)
                ts_out.append(ts)
                frames.append(fr[fi].tobytes())
        return pa.table(
            {
                "item_id": pa.array(ids, pa.int64()),
                "frame_ts_ms": pa.array(ts_out, pa.int32()),
                "frame_bytes": pa.array(frames, pa.large_binary()),
            }
        )

    return ds.map_batches(sample, batch_format="pyarrow", batch_size=32)


SYNTH_WAV_RATE = 8000
SYNTH_Y4M_FPS = 4


def encode_y4m(w: int, h: int, frames: np.ndarray, fps: int = SYNTH_Y4M_FPS) -> bytes:
    """YUV4MPEG2 payload (C420jpeg) from uint8 frames of shape
    ``(n_frames, w*h*3//2)`` — plain-text stream header + a ``FRAME`` line
    before each raw planar frame."""
    hdr = b"YUV4MPEG2 W%d H%d F%d:1 Ip A1:1 C420jpeg\n" % (w, h, fps)
    return hdr + b"".join(
        b"FRAME\n" + frames[i].astype(np.uint8).tobytes()
        for i in range(frames.shape[0])
    )


def encode_ppm(w: int, h: int, raster: np.ndarray) -> bytes:
    """Binary PPM (P6) payload from flat uint8 RGB pixels."""
    return b"P6\n%d %d\n255\n" % (w, h) + raster.astype(np.uint8).tobytes()


def encode_wav(samples: np.ndarray, rate: int = SYNTH_WAV_RATE) -> bytes:
    """Mono PCM-16 WAV payload from int16 samples (stdlib ``wave``)."""
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(rate)
        wf.writeframes(samples.astype("<i2").tobytes())
    return buf.getvalue()


def synthetic_media_table(n: int = 32, seed: int = 42) -> pa.Table:
    """Deterministic synthetic media corpus: image payloads are REAL binary
    PPMs, audio payloads are REAL PCM-16 WAVs, and video payloads are REAL
    YUV4MPEG2 streams — all three decodable by the ``decode=True`` path
    with no third-party codec."""
    rng = np.random.default_rng(seed)
    types = ["image", "audio", "video"]
    rows = {k: [] for k in MEDIA_SCHEMA.names}
    for i in range(n):
        mt = types[i % 3]
        if mt == "image":
            w, h = int(rng.integers(8, 32)), int(rng.integers(8, 24))
            raster = rng.integers(0, 256, w * h * 3, dtype=np.uint8)
            payload = encode_ppm(w, h, raster)
            width, height, dur = w, h, -1
        elif mt == "audio":
            dur = int(rng.integers(100, 500))
            n_frames = dur * SYNTH_WAV_RATE // 1000
            samples = rng.integers(-32768, 32768, n_frames).astype(np.int16)
            payload = encode_wav(samples)
            width, height = -1, -1
        else:
            # even dims (C420 chroma is quarter-res), 2..12 frames at 4 fps
            w = 2 * int(rng.integers(4, 12))
            h = 2 * int(rng.integers(4, 10))
            nf = int(rng.integers(2, 13))
            frames = rng.integers(
                0, 256, (nf, w * h * 3 // 2), dtype=np.uint8
            )
            payload = encode_y4m(w, h, frames)
            width, height = w, h
            dur = nf * 1000 // SYNTH_Y4M_FPS
        rows["item_id"].append(i)
        rows["media_type"].append(mt)
        rows["payload"].append(payload)
        rows["width"].append(width)
        rows["height"].append(height)
        rows["duration_ms"].append(dur)
    return pa.table(rows, schema=MEDIA_SCHEMA)
