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


def decode_image(payload: bytes, fake: bool = False,
                 h: int = 16, w: int = 16) -> np.ndarray:
    """-> HxWx3 uint8. STUB: real decode needs PIL/cv2 (absent here).

    The fake is a deterministic BYTES TILING: pixel i = payload[i mod
    len], row-major, channel = i mod 3 — a pure function of the payload
    bytes, so the driver oracle can recompute every channel stat in SQL
    (an rng-seeded fake would be unverifiable)."""
    if not fake:
        raise NotImplementedError(
            "image decode requires PIL/cv2 which are not in this container; "
            "pass fake=True for the deterministic stand-in"
        )
    b = np.frombuffer(payload, dtype=np.uint8)
    if b.size == 0:
        raise ValueError("empty payload")
    n = h * w * 3
    reps = -(-n // b.size)
    return np.tile(b, reps)[:n].reshape(h, w, 3)


def decode_audio(payload: bytes, fake: bool = False) -> np.ndarray:
    """-> float32 mono samples. STUB (no soundfile/librosa here).

    The fake maps each payload byte to a sample (b - 128) / 128 in
    [-1, 1) — a pure function of the bytes whose values are dyadic
    rationals (k / 2^7), so every downstream energy sum is EXACT in
    float and the driver oracle recomputes it bitwise in SQL (the old
    rng-seeded fake was unverifiable)."""
    if not fake:
        raise NotImplementedError(
            "audio decode requires soundfile/librosa which are not in this "
            "container; pass fake=True for the deterministic stand-in"
        )
    b = np.frombuffer(payload, dtype=np.uint8)
    if b.size == 0:
        raise ValueError("empty payload")
    return ((b.astype(np.float32) - 128.0) / 128.0).astype(np.float32)


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
            if not payload:
                continue
            img = decode_image(payload, fake=self.fake)
            m = json.loads(meta) if meta else {}
            ys = np.linspace(0, img.shape[0] - 1, t).astype(int)
            xs = np.linspace(0, img.shape[1] - 1, t).astype(int)
            thumb = img[np.ix_(ys, xs)].astype(np.uint8)
            npx = img.shape[0] * img.shape[1]
            # channel means / gray std from EXACT integer sums (single
            # float divisions) — bitwise-reproducible in the SQL oracle
            ch = img.reshape(-1, 3).astype(np.int64)
            sr, sg, sb = (int(x) for x in ch.sum(axis=0))
            gsum = ch.sum(axis=1)  # per-pixel r+g+b (int)
            s = int(gsum.sum())
            ss = int(np.dot(gsum, gsum))
            std_gray = (
                np.sqrt(max((float(ss) - float(s) * s / npx) / npx, 0.0))
                / 3.0
            )
            rows["doc_id"].append(str(doc))
            rows["mean_r"].append(float(sr) / npx)
            rows["mean_g"].append(float(sg) / npx)
            rows["mean_b"].append(float(sb) / npx)
            rows["std_gray"].append(std_gray)
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
            if not payload:
                continue
            # float64 math over the dyadic fake samples: every sum below
            # is exact (k^2/2^14 terms), so order never matters and the
            # SQL oracle reproduces each value bitwise
            samples = decode_audio(payload, fake=self.fake).astype(
                np.float64
            )
            nf = samples.size // self.frame
            frames = samples[: nf * self.frame].reshape(nf, self.frame)
            e2 = frames * frames
            energy = e2.sum(axis=1) / self.frame
            out["doc_id"].append(str(doc))
            out["n_samples"].append(samples.size)
            out["rms"].append(
                float(np.sqrt((samples * samples).sum() / samples.size))
            )
            out["peak"].append(float(np.abs(samples).max()))
            out["n_frames"].append(nf)
            out["frame_energy_mean"].append(
                float(energy.sum() / nf) if nf else float("nan")
            )
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


def decode_video(payload: bytes, fake: bool = False,
                 h: int = 8, w: int = 8) -> np.ndarray:
    """-> (n_frames, h*w*3) uint8 frame matrix. STUB (no ffmpeg/cv2 here).

    The fake slices the payload into consecutive complete h*w*3-byte
    frames (remainder dropped) — a pure function of the bytes, so frame
    sums and inter-frame diffs are exactly replayable in SQL."""
    if not fake:
        raise NotImplementedError(
            "video decode requires ffmpeg/cv2 which are not in this "
            "container; pass fake=True for the deterministic stand-in"
        )
    fs = h * w * 3
    b = np.frombuffer(payload, dtype=np.uint8)
    nf = b.size // fs
    if nf == 0:
        raise ValueError(f"payload shorter than one {fs}-byte frame")
    return b[: nf * fs].reshape(nf, fs)


class VideoFrameStage:
    """Actor stage: binary video column -> frame-sampled features.

    Real plumbing: decode (stubbed), evenly-spaced frame sampling with
    INTEGER index math (j*(nf-1))//(k-1) so the oracle replays it, mean
    brightness and mean inter-frame motion from exact integer sums.
    Docs shorter than one frame are skipped (no complete frame)."""

    def __init__(self, fake_decode: bool = True, h: int = 8, w: int = 8,
                 sample: int = 4):
        self.fake = fake_decode
        self.h, self.w = h, w
        self.frame_size = h * w * 3
        self.sample = sample

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        payloads = batch.column("payload").to_pylist()
        out = {"doc_id": [], "n_frames": [], "sampled_frames": [],
               "brightness_mean": [], "motion_mean": []}
        fs = self.frame_size
        for doc, payload in zip(ids, payloads):
            if not payload or len(payload) < fs:
                continue
            frames = decode_video(payload, fake=self.fake,
                                  h=self.h, w=self.w)
            nf = frames.shape[0]
            k = min(self.sample, nf)
            if k == 1:
                idxs = np.zeros(1, dtype=np.int64)
            else:
                idxs = (np.arange(k, dtype=np.int64) * (nf - 1)) // (k - 1)
            sel = frames[idxs].astype(np.int64)
            bsum = int(sel.sum())
            brightness = float(bsum) / (k * fs)
            if k >= 2:
                msum = int(np.abs(sel[1:] - sel[:-1]).sum())
                motion = float(msum) / ((k - 1) * fs)
            else:
                motion = float("nan")
            out["doc_id"].append(str(doc))
            out["n_frames"].append(nf)
            out["sampled_frames"].append(k)
            out["brightness_mean"].append(brightness)
            out["motion_mean"].append(motion)
        return pa.table(
            {
                "doc_id": pa.array(out["doc_id"], type=pa.string()),
                "n_frames": pa.array(out["n_frames"], type=pa.int64()),
                "sampled_frames": pa.array(out["sampled_frames"],
                                           type=pa.int64()),
                "brightness_mean": pa.array(out["brightness_mean"],
                                            type=pa.float64()),
                "motion_mean": pa.array(out["motion_mean"],
                                        type=pa.float64()),
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


def media_from_documents(ds, h: int = 16, w: int = 16):
    """documents(doc_id, text) -> media table with payload = UTF-8 text
    bytes and typed metadata — lets the multimodal pipeline run over the
    shared corpus so the driver oracle can recompute the fake-decode
    features in SQL (codepoints == bytes for the ASCII corpus)."""

    def conv(t: pa.Table) -> pa.Table:
        texts = t.column("text").to_pylist()
        payloads = [(s or "").encode() for s in texts]
        metas = [json.dumps({"width": w, "height": h}) for _ in texts]
        return pa.table(
            {
                "doc_id": t.column("doc_id").cast(pa.string()),
                "payload": pa.array(payloads, type=pa.binary()),
                "media_type": pa.array(["image/fake"] * len(texts)),
                "meta": pa.array(metas),
            }
        )

    return ds.map_batches(conv, batch_format="pyarrow")


def audio_from_documents(ds):
    """documents(doc_id, text) -> audio media table (payload = UTF-8
    bytes, media_type audio/fake) — drives AudioFeatureStage over the
    shared corpus so the driver oracle can recompute the fake-decode
    energies in SQL (codepoints == bytes for the ASCII corpus)."""

    def conv(t: pa.Table) -> pa.Table:
        texts = t.column("text").to_pylist()
        payloads = [(s or "").encode() for s in texts]
        metas = [json.dumps({"sample_rate": 16000}) for _ in texts]
        return pa.table(
            {
                "doc_id": t.column("doc_id").cast(pa.string()),
                "payload": pa.array(payloads, type=pa.binary()),
                "media_type": pa.array(["audio/fake"] * len(texts)),
                "meta": pa.array(metas),
            }
        )

    return ds.map_batches(conv, batch_format="pyarrow")


def video_from_documents(ds):
    """documents(doc_id, text) -> video media table (payload = UTF-8
    bytes, media_type video/fake) — drives VideoFrameStage over the
    shared corpus so the driver oracle can recompute the fake-decode
    frame features in SQL (codepoints == bytes for the ASCII corpus)."""

    def conv(t: pa.Table) -> pa.Table:
        texts = t.column("text").to_pylist()
        payloads = [(s or "").encode() for s in texts]
        metas = [json.dumps({"fps": 8}) for _ in texts]
        return pa.table(
            {
                "doc_id": t.column("doc_id").cast(pa.string()),
                "payload": pa.array(payloads, type=pa.binary()),
                "media_type": pa.array(["video/fake"] * len(texts)),
                "meta": pa.array(metas),
            }
        )

    return ds.map_batches(conv, batch_format="pyarrow")


def video_features_sql(h: int = 8, w: int = 8, sample: int = 4) -> str:
    """DuckDB oracle for VideoFrameStage over video_from_documents:
    replays the consecutive-frame fake decode, the integer frame-index
    sampling, and the exact brightness / motion sums."""
    fs = h * w * 3
    return f"""
    WITH tok AS (
        SELECT CAST(doc_id AS VARCHAR) AS doc_id,
               generate_subscripts(string_split(text, ''), 1) - 1 AS pos,
               unicode(unnest(string_split(text, ''))) AS v
        FROM documents WHERE length(text) >= {fs}
    ),
    vid AS (
        SELECT doc_id, CAST(count(*) AS BIGINT) // {fs} AS nf
        FROM tok GROUP BY doc_id
    ),
    samp AS (
        SELECT v.doc_id, v.nf, least({sample}, v.nf) AS k, js.j,
               CASE WHEN least({sample}, v.nf) = 1 THEN 0
                    ELSE (js.j * (v.nf - 1))
                         // (least({sample}, v.nf) - 1) END AS fidx
        FROM vid v
        CROSS JOIN (SELECT unnest(generate_series(0, {sample - 1})) AS j)
            js
        WHERE js.j < least({sample}, v.nf)
    ),
    fsum AS (
        SELECT s.doc_id, s.j, CAST(sum(t.v) AS BIGINT) AS bsum
        FROM samp s JOIN tok t ON t.doc_id = s.doc_id
             AND t.pos >= s.fidx * {fs} AND t.pos < (s.fidx + 1) * {fs}
        GROUP BY s.doc_id, s.j
    ),
    bright AS (
        SELECT doc_id, CAST(sum(bsum) AS BIGINT) AS btot
        FROM fsum GROUP BY doc_id
    ),
    pairs AS (
        SELECT a.doc_id, a.fidx AS f0, b.fidx AS f1
        FROM samp a JOIN samp b
             ON b.doc_id = a.doc_id AND b.j = a.j + 1
    ),
    mot AS (
        SELECT p.doc_id, CAST(sum(abs(t1.v - t0.v)) AS BIGINT) AS msum
        FROM pairs p
        JOIN tok t0 ON t0.doc_id = p.doc_id
             AND t0.pos >= p.f0 * {fs} AND t0.pos < (p.f0 + 1) * {fs}
        JOIN tok t1 ON t1.doc_id = p.doc_id
             AND t1.pos = t0.pos + (p.f1 - p.f0) * {fs}
        GROUP BY p.doc_id
    )
    SELECT v.doc_id,
           v.nf AS n_frames,
           CAST(least({sample}, v.nf) AS BIGINT) AS sampled_frames,
           CAST(b.btot AS DOUBLE)
               / (least({sample}, v.nf) * {fs}) AS brightness_mean,
           CASE WHEN least({sample}, v.nf) >= 2
                THEN CAST(m.msum AS DOUBLE)
                     / ((least({sample}, v.nf) - 1) * {fs})
                ELSE 'nan'::DOUBLE END AS motion_mean
    FROM vid v
    JOIN bright b ON b.doc_id = v.doc_id
    LEFT JOIN mot m ON m.doc_id = v.doc_id
    """


def audio_features_sql(frame: int = 512) -> str:
    """DuckDB oracle for AudioFeatureStage over audio_from_documents:
    replays the (b-128)/128 fake decode; every energy sum is exact."""
    return f"""
    WITH tok AS (
        SELECT CAST(doc_id AS VARCHAR) AS doc_id,
               generate_subscripts(string_split(text, ''), 1) - 1 AS pos,
               (CAST(unicode(unnest(string_split(text, ''))) AS DOUBLE)
                - 128.0e0) / 128.0e0 AS s
        FROM documents WHERE length(text) > 0
    ),
    base AS (
        SELECT doc_id, CAST(count(*) AS BIGINT) AS n_samples,
               sqrt(sum(s * s) / count(*)) AS rms,
               max(abs(s)) AS peak
        FROM tok GROUP BY doc_id
    ),
    fr AS (
        SELECT t.doc_id, t.pos // {frame} AS f,
               sum(t.s * t.s) / {frame}.0e0 AS energy
        FROM tok t JOIN base b ON b.doc_id = t.doc_id
        WHERE t.pos < (b.n_samples // {frame}) * {frame}
        GROUP BY t.doc_id, f
    ),
    fe AS (
        SELECT doc_id, sum(energy) / count(*) AS fem,
               CAST(count(*) AS BIGINT) AS nf
        FROM fr GROUP BY doc_id
    )
    SELECT b.doc_id, b.n_samples, b.rms, b.peak,
           COALESCE(fe.nf, 0) AS n_frames,
           COALESCE(fe.fem, 'nan'::DOUBLE) AS frame_energy_mean
    FROM base b LEFT JOIN fe ON fe.doc_id = b.doc_id
    """


def image_features_sql(h: int = 16, w: int = 16) -> str:
    """DuckDB oracle for ImageFeatureStage over media_from_documents:
    replays the bytes-tiling decode and integer channel sums."""
    npix = h * w
    nbytes = npix * 3
    return f"""
    WITH tok AS (
        SELECT CAST(doc_id AS VARCHAR) AS doc_id,
               generate_subscripts(string_split(text, ''), 1) - 1 AS pos,
               unicode(unnest(string_split(text, ''))) AS token
        FROM documents
    ),
    nlen AS (
        SELECT doc_id, CAST(count(*) AS BIGINT) AS n
        FROM tok GROUP BY doc_id
    ),
    px AS (
        SELECT d.doc_id, idx.i, t.token AS v
        FROM nlen d
        CROSS JOIN (SELECT unnest(generate_series(0, {nbytes - 1})) AS i) idx
        JOIN tok t ON t.doc_id = d.doc_id AND t.pos = idx.i % d.n
    ),
    chan AS (
        SELECT doc_id,
            CAST(sum(CASE WHEN i % 3 = 0 THEN v ELSE 0 END) AS BIGINT) AS sr,
            CAST(sum(CASE WHEN i % 3 = 1 THEN v ELSE 0 END) AS BIGINT) AS sg,
            CAST(sum(CASE WHEN i % 3 = 2 THEN v ELSE 0 END) AS BIGINT) AS sb
        FROM px GROUP BY doc_id
    ),
    gray AS (
        SELECT doc_id, i // 3 AS p, CAST(sum(v) AS BIGINT) AS gsum
        FROM px GROUP BY doc_id, p
    ),
    gstat AS (
        SELECT doc_id, CAST(sum(gsum) AS BIGINT) AS s,
               CAST(sum(gsum * gsum) AS BIGINT) AS ss
        FROM gray GROUP BY doc_id
    )
    SELECT c.doc_id,
           CAST(c.sr AS DOUBLE) / {npix} AS mean_r,
           CAST(c.sg AS DOUBLE) / {npix} AS mean_g,
           CAST(c.sb AS DOUBLE) / {npix} AS mean_b,
           sqrt(greatest((CAST(g.ss AS DOUBLE)
                          - CAST(g.s AS DOUBLE) * g.s / {npix}) / {npix},
                         0.0e0)) / 3.0e0 AS std_gray,
           CAST({w} AS INTEGER) AS width,
           CAST({h} AS INTEGER) AS height
    FROM chan c JOIN gstat g USING (doc_id)
    """


def multimodal_pipeline(ds, kind: str = "image", concurrency: int = 4,
                        batch_size: int = 32):
    """Large binary payloads -> SMALL batch size so batch x concurrency
    fits worker heaps (task prompt: memory-aware batch sizing)."""
    cls = {"image": ImageFeatureStage, "audio": AudioFeatureStage,
           "video": VideoFrameStage}[kind]
    return ds.map_batches(
        cls, batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency, num_cpus=1,
    )
