"""Multimodal column plumbing: images/audio/video as opaque binary columns
with typed metadata.

The decode kernels are STUBS (no image/audio libraries in this container):
``decode_image``/``decode_audio`` raise NotImplementedError unless
``fake=True``, in which case a deterministic fake (seeded by content hash)
stands in. Everything Ray-side — schema, actor signature, batch sizing for
large binary payloads, output layout — is real and tested.

Schema convention:
  payload:binary, media_type:string ("image/png" | "audio/wav" | ...),
  meta:string (JSON: width/height/sample_rate/...)
"""

from __future__ import annotations

import hashlib
import json

import numpy as np
import pyarrow as pa


def _content_seed(payload: bytes) -> int:
    return int.from_bytes(hashlib.sha256(payload).digest()[:8], "little")


def decode_image(payload: bytes, fake: bool = False) -> np.ndarray:
    """-> HxWx3 uint8. STUB: real decode needs PIL/cv2 (absent here)."""
    if not fake:
        raise NotImplementedError(
            "image decode requires PIL/cv2 which are not in this container; "
            "pass fake=True for the deterministic stand-in"
        )
    rng = np.random.default_rng(_content_seed(payload))
    h, w = 32, 32
    return rng.integers(0, 256, (h, w, 3), dtype=np.uint8)


def decode_audio(payload: bytes, fake: bool = False) -> np.ndarray:
    """-> float32 mono samples. STUB (no soundfile/librosa here)."""
    if not fake:
        raise NotImplementedError(
            "audio decode requires soundfile/librosa which are not in this "
            "container; pass fake=True for the deterministic stand-in"
        )
    rng = np.random.default_rng(_content_seed(payload))
    return rng.normal(0, 0.1, 16000).astype(np.float32)


class ImageFeatureStage:
    """Actor stage: binary image column -> per-image feature vector.

    Real plumbing: decode (stubbed), resize-by-slicing, channel stats.
    Use SMALL batch_size (payloads are large) — see ``multimodal_pipeline``.
    """

    def __init__(self, fake_decode: bool = True, thumb: int = 8):
        self.fake = fake_decode
        self.thumb = thumb

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column("payload").to_pylist()
        metas = batch.column("meta").to_pylist()
        rows = {"doc_id": [], "mean_r": [], "mean_g": [], "mean_b": [],
                "std_gray": [], "width": [], "height": [], "thumb": []}
        ids = batch.column("doc_id").to_pylist()
        t = self.thumb
        for doc, payload, meta in zip(ids, payloads, metas):
            img = decode_image(payload, fake=self.fake)
            m = json.loads(meta) if meta else {}
            gray = img.mean(axis=2)
            ys = np.linspace(0, img.shape[0] - 1, t).astype(int)
            xs = np.linspace(0, img.shape[1] - 1, t).astype(int)
            thumb = img[np.ix_(ys, xs)].astype(np.uint8)
            rows["doc_id"].append(str(doc))
            rows["mean_r"].append(float(img[..., 0].mean()))
            rows["mean_g"].append(float(img[..., 1].mean()))
            rows["mean_b"].append(float(img[..., 2].mean()))
            rows["std_gray"].append(float(gray.std()))
            rows["width"].append(int(m.get("width", img.shape[1])))
            rows["height"].append(int(m.get("height", img.shape[0])))
            rows["thumb"].append(thumb.tobytes())
        return pa.table(
            {
                "doc_id": pa.array(rows["doc_id"], type=pa.string()),
                "mean_r": pa.array(rows["mean_r"], type=pa.float64()),
                "mean_g": pa.array(rows["mean_g"], type=pa.float64()),
                "mean_b": pa.array(rows["mean_b"], type=pa.float64()),
                "std_gray": pa.array(rows["std_gray"], type=pa.float64()),
                "width": pa.array(rows["width"], type=pa.int32()),
                "height": pa.array(rows["height"], type=pa.int32()),
                "thumb": pa.array(rows["thumb"], type=pa.binary()),
            }
        )


class AudioFeatureStage:
    """Actor stage: binary audio -> frame-level energy features (stub
    decode, real framing math)."""

    def __init__(self, fake_decode: bool = True, frame: int = 512):
        self.fake = fake_decode
        self.frame = frame

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        payloads = batch.column("payload").to_pylist()
        out = {"doc_id": [], "n_samples": [], "rms": [], "peak": [],
               "n_frames": [], "frame_energy_mean": []}
        for doc, payload in zip(ids, payloads):
            samples = decode_audio(payload, fake=self.fake)
            nf = samples.size // self.frame
            frames = samples[: nf * self.frame].reshape(nf, self.frame)
            energy = (frames**2).mean(axis=1)
            out["doc_id"].append(str(doc))
            out["n_samples"].append(samples.size)
            out["rms"].append(float(np.sqrt((samples**2).mean())))
            out["peak"].append(float(np.abs(samples).max()))
            out["n_frames"].append(nf)
            out["frame_energy_mean"].append(float(energy.mean()))
        return pa.table(
            {
                "doc_id": pa.array(out["doc_id"], type=pa.string()),
                "n_samples": pa.array(out["n_samples"], type=pa.int64()),
                "rms": pa.array(out["rms"], type=pa.float64()),
                "peak": pa.array(out["peak"], type=pa.float64()),
                "n_frames": pa.array(out["n_frames"], type=pa.int64()),
                "frame_energy_mean": pa.array(
                    out["frame_energy_mean"], type=pa.float64()
                ),
            }
        )


def make_fake_media_table(n: int, seed: int = 42, kind: str = "image") -> pa.Table:
    """Deterministic binary-payload table for testing the plumbing."""
    rng = np.random.default_rng(seed)
    payloads = [rng.integers(0, 256, 2048, dtype=np.uint8).tobytes() for _ in range(n)]
    media = "image/png" if kind == "image" else "audio/wav"
    metas = [json.dumps({"width": 32, "height": 32}) for _ in range(n)]
    return pa.table(
        {
            "doc_id": pa.array([f"m{i}" for i in range(n)]),
            "payload": pa.array(payloads, type=pa.binary()),
            "media_type": pa.array([media] * n),
            "meta": pa.array(metas),
        }
    )


def multimodal_pipeline(ds, kind: str = "image", concurrency: int = 4,
                        batch_size: int = 32):
    """Large binary payloads -> SMALL batch size so batch x concurrency
    fits worker heaps (task prompt: memory-aware batch sizing)."""
    cls = ImageFeatureStage if kind == "image" else AudioFeatureStage
    return ds.map_batches(
        cls, batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency, num_cpus=1,
    )
