"""Multimodal-column plumbing: opaque binary payloads + typed metadata.

Treats image/audio/video as ``binary`` columns with typed metadata
structs, processed by Arrow-batched ``mapInPandas`` kernels. The actual
media decode is STUBBED (no image/audio libraries ship in this container):
``decode_stub='fake'`` produces deterministic hash-derived features so the
Spark-side plumbing — schema, batch iteration, partitioning, UDF
signatures — is real and tested end-to-end; ``decode_stub='raise'``
raises NotImplementedError exactly where a real decoder (PIL/ffmpeg/...)
would plug in; ``decode_stub='auto'`` probes for the real library inside
the worker (PIL for images, PyAV for video) and uses it when present,
falling back to the deterministic fake otherwise — the sandbox stays
green, a real deployment with the libs installed decodes for real. The
probe result is per-worker; on a homogeneous cluster (the only sane
deployment) every task takes the same branch.

One audio path needs no codec at all: :func:`audio_features` decodes
raw PCM16-mono payloads with numpy (bytes -> int16 -> frames) and
computes real frame-level DSP features (RMS, zero crossings, power-
weighted spectral centroid) — fully real in this container, no stub.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def probe_pil():
    """PIL.Image if pillow is importable, else None (worker-side probe)."""
    try:
        from PIL import Image
        return Image
    except ImportError:
        return None


def probe_av():
    """The PyAV module if importable, else None (worker-side probe)."""
    try:
        import av
        return av
    except ImportError:
        return None


def pil_image_features(raw: bytes, n_features: int) -> np.ndarray:
    """Real image features via PIL: [width, height, mean, std] of the
    grayscale pixels, zero-padded/truncated to ``n_features`` floats.
    Unit-covered when pillow is installed (skipped in this image)."""
    import io

    from PIL import Image

    img = Image.open(io.BytesIO(raw)).convert("L")
    px = np.asarray(img, dtype=np.float32)
    feats = np.array(
        [img.width, img.height, float(px.mean()), float(px.std())],
        dtype=np.float32,
    )
    out = np.zeros(n_features, dtype=np.float32)
    out[: min(n_features, 4)] = feats[: min(n_features, 4)]
    return out


def pil_resize_payload(raw: bytes, width: int, height: int) -> bytes:
    """Real resize via PIL: decode -> bilinear resample -> raw grayscale
    bytes (width*height, matching the fake twin's output size)."""
    import io

    from PIL import Image

    img = Image.open(io.BytesIO(raw)).convert("L").resize((width, height))
    return img.tobytes()


def av_sample_frames(
    raw: bytes, every_ms: int, max_frames: int
) -> list[tuple[int, int, bytes]]:
    """Real video frame sampling via PyAV: demux, decode, keep the first
    frame at/after each every_ms boundary (capped at max_frames); each
    kept frame is re-encoded as PNG bytes. Returns (idx, ts_ms, blob)."""
    import io

    import av

    out: list[tuple[int, int, bytes]] = []
    with av.open(io.BytesIO(raw)) as container:
        stream = container.streams.video[0]
        next_ts = 0
        for frame in container.decode(stream):
            if len(out) >= max_frames:
                break
            ts_ms = int(float(frame.pts * stream.time_base) * 1000)
            if ts_ms >= next_ts:
                buf = io.BytesIO()
                frame.to_image().save(buf, format="PNG")
                # real frame timestamp, not the boundary: a kept frame at
                # 5s with every_ms=1000 reports ts_ms=5000
                out.append((len(out), ts_ms, buf.getvalue()))
                next_ts = (ts_ms // every_ms + 1) * every_ms
    return out

#: magic-byte prefixes -> media format sniff
MAGIC = {
    b"\xff\xd8\xff": "jpeg",
    b"\x89PNG": "png",
    b"RIFF": "riff",  # wav/avi
    b"OggS": "ogg",
    b"\x1a\x45\xdf\xa3": "mkv",
}


def attach_payload(df: DataFrame, text_col: str = "text",
                   out: str = "payload") -> DataFrame:
    """Materialize an opaque binary payload column (here: utf-8 bytes of a
    text column — the stand-in for real media bytes) plus sniffed metadata."""
    payload = F.encode(F.col(text_col), "utf-8")
    return df.withColumn(out, payload).withColumn(
        f"{out}_meta",
        F.struct(
            F.octet_length(F.col(out)).alias("n_bytes"),
            F.lit("utf8-text").alias("format"),
        ),
    )


def sniff_format(head: bytes) -> str:
    for magic, fmt in MAGIC.items():
        if head.startswith(magic):
            return fmt
    return "unknown"


FEATURE_SCHEMA = (
    "doc_id long, n_bytes long, format string, features array<float>"
)


def extract_features(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    n_features: int = 4,
    decode_stub: str = "fake",
) -> DataFrame:
    """Batch feature extraction over binary payloads via ``mapInPandas``.

    Real pipeline shape: iterate Arrow record batches, decode each payload,
    emit fixed-width float features. The decode step is the stub point:

    - 'fake': features = md5(payload) bytes scaled to [0, 1) — deterministic,
      schema-correct, lets every downstream consumer (ANN, dedup) be tested.
    - 'raise': NotImplementedError('media decode requires ...') — marks the
      integration point for a real decoder.
    - 'auto': :func:`pil_image_features` per payload when pillow imports
      on the worker AND the payload decodes as an image; fake otherwise.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        real = probe_pil() is not None if decode_stub == "auto" else False
        for pdf in batches:
            if decode_stub == "raise":
                raise NotImplementedError(
                    "media decode requires an image/audio library not present "
                    "in this environment; plug PIL/torchaudio/ffmpeg in here"
                )
            feats, nbytes, fmts = [], [], []
            for payload in pdf[payload_col]:
                raw = bytes(payload)
                f = None
                if real:
                    try:
                        f = pil_image_features(raw, n_features)
                    except Exception:
                        f = None  # not an image: deterministic fake below
                if f is None:
                    digest = hashlib.md5(raw).digest()
                    f = (
                        np.frombuffer(digest[: n_features * 2],
                                      dtype=np.uint16)
                        .astype(np.float32)
                        / np.float32(65536.0)
                    )
                feats.append(f)
                nbytes.append(len(raw))
                fmts.append(sniff_format(raw[:8]))
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].to_numpy(),
                    "n_bytes": np.asarray(nbytes, dtype=np.int64),
                    "format": fmts,
                    "features": feats,
                }
            )

    return df.select(id_col, payload_col).mapInPandas(run, schema=FEATURE_SCHEMA)


RESIZED_SCHEMA = "doc_id long, width int, height int, payload binary"


def resize_images(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    width: int = 32,
    height: int = 32,
    decode_stub: str = "fake",
) -> DataFrame:
    """Batch image resize over binary payloads via ``mapInPandas``.

    Real pipeline shape: decode -> resample to (width, height) -> re-encode;
    1 output row per input row, payload replaced. The decode/resample step
    is the stub point (same contract as extract_features):

    - 'fake': output payload = md5 keystream of the input bytes, cycled to
      exactly width*height bytes — deterministic, size-correct, exercises
      the binary-out schema and Arrow batch shapes end-to-end.
    - 'raise': NotImplementedError at the decoder integration point.
    - 'auto': :func:`pil_resize_payload` when pillow imports on the
      worker AND the payload decodes as an image; fake otherwise.
    """
    n_out = width * height

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        real = probe_pil() is not None if decode_stub == "auto" else False
        for pdf in batches:
            if decode_stub == "raise":
                raise NotImplementedError(
                    "image decode/resample requires PIL/opencv; plug in here"
                )
            out = []
            for payload in pdf[payload_col]:
                raw = bytes(payload)
                blob = None
                if real:
                    try:
                        blob = pil_resize_payload(raw, width, height)
                    except Exception:
                        blob = None
                if blob is None:
                    stream = b""
                    seed = raw
                    while len(stream) < n_out:
                        seed = hashlib.md5(seed).digest()
                        stream += seed
                    blob = stream[:n_out]
                out.append(blob)
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].to_numpy(),
                    "width": np.full(len(pdf), width, dtype=np.int32),
                    "height": np.full(len(pdf), height, dtype=np.int32),
                    "payload": out,
                }
            )

    return df.select(id_col, payload_col).mapInPandas(
        run, schema=RESIZED_SCHEMA
    )


FRAME_SCHEMA = "doc_id long, frame_idx int, ts_ms long, frame binary"


def sample_frames(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    every_ms: int = 1000,
    max_frames: int = 8,
    decode_stub: str = "fake",
) -> DataFrame:
    """Video frame sampling via ``mapInPandas`` — the 1 -> N row-expansion
    shape (one output row per sampled frame, unlike the 1:1 kernels above).

    - 'fake': the payload's first 4 md5 bytes fix a deterministic
      'duration'; frames at 0, every_ms, 2*every_ms, ... (capped at
      max_frames) each carry a hash-derived 16-byte frame blob. Proves the
      exploded schema, per-frame timestamps, and batch-size amplification
      without a codec.
    - 'raise': NotImplementedError at the ffmpeg/pyav integration point.
    - 'auto': :func:`av_sample_frames` when PyAV imports on the worker
      AND the payload demuxes as video; fake otherwise.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        real = probe_av() is not None if decode_stub == "auto" else False
        for pdf in batches:
            if decode_stub == "raise":
                raise NotImplementedError(
                    "video demux/decode requires ffmpeg/pyav; plug in here"
                )
            ids, idxs, tss, frames = [], [], [], []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                raw = bytes(payload)
                sampled = None
                if real:
                    try:
                        sampled = av_sample_frames(raw, every_ms, max_frames)
                    except Exception:
                        sampled = None
                if sampled is None:
                    digest = hashlib.md5(raw).digest()
                    duration_ms = int.from_bytes(digest[:4], "big") % 10_000
                    n = min(duration_ms // every_ms + 1, max_frames)
                    sampled = [
                        (i, i * every_ms,
                         hashlib.md5(digest + i.to_bytes(4, "big")).digest())
                        for i in range(n)
                    ]
                for i, ts_ms, blob in sampled:
                    ids.append(doc_id)
                    idxs.append(i)
                    tss.append(ts_ms)
                    frames.append(blob)
            yield pd.DataFrame(
                {
                    "doc_id": np.asarray(ids, dtype=np.int64),
                    "frame_idx": np.asarray(idxs, dtype=np.int32),
                    "ts_ms": np.asarray(tss, dtype=np.int64),
                    "frame": frames,
                }
            )

    return df.select(id_col, payload_col).mapInPandas(run, schema=FRAME_SCHEMA)


AUDIO_FRAME_SCHEMA = ("doc_id long, frame int, n_samples int, "
                      "rms double, zcr int, centroid_hz double")


def audio_features(
    df: DataFrame,
    audio_col: str = "payload",
    id_col: str = "doc_id",
    rate_col: str = "sample_rate",
    frame_len: int = 1024,
) -> DataFrame:
    """Frame-level audio features from raw PCM16-mono payloads — the
    one audio path that needs NO codec library (PCM is just bytes;
    numpy decodes it), so unlike the image/video operators this decode
    is REAL in this container, not a stub: per ``frame_len``-sample
    frame, RMS level, zero-crossing count and spectral centroid (Hz,
    magnitude-weighted mean of the rfft bins — the brightness feature
    audio dedup/quality filters key on).

    1 -> N rows per document (one per complete frame; the trailing
    partial frame is DROPPED so output shape is a pure function of
    length, never of padding). Arrow-batched ``mapInPandas``, the same
    batch-iteration shape as :func:`extract_features`; compressed
    formats (mp3/flac) plug in exactly like PIL does for images —
    decode to PCM in front of this kernel.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in ("doc_id", "frame", "n_samples",
                                   "rms", "zcr", "centroid_hz")}
            for did, payload, sr in zip(
                pdf[id_col], pdf[audio_col], pdf[rate_col]
            ):
                x = (np.frombuffer(bytes(payload), dtype="<i2")
                     .astype(np.float64) / 32768.0)
                n = (len(x) // frame_len) * frame_len
                if n == 0:
                    continue
                fr = x[:n].reshape(-1, frame_len)
                rms = np.sqrt((fr * fr).mean(axis=1))
                # signbit diff, not product<0: a quantized PCM
                # sample can land EXACTLY on 0 at a crossing and a
                # zero product would silently drop that crossing
                zcr = (np.signbit(fr[:, 1:])
                       != np.signbit(fr[:, :-1])).sum(axis=1)
                # POWER-weighted centroid (|X|^2): magnitude
                # weighting lets the rectangular window's ~1/df leakage
                # tail drag a pure 440 Hz tone to ~700 Hz; power decays
                # ~1/df^2, landing within a few Hz, and a DC frame
                # stays EXACTLY at bin 0 (a Hann window would smear it)
                pw = np.abs(np.fft.rfft(fr, axis=1)) ** 2
                freqs = np.fft.rfftfreq(frame_len, d=1.0 / float(sr))
                denom = pw.sum(axis=1)
                cent = np.where(
                    denom > 0.0,
                    (pw * freqs).sum(axis=1) / np.where(denom > 0.0,
                                                        denom, 1.0),
                    0.0,
                )
                k = fr.shape[0]
                out["doc_id"].extend([did] * k)
                out["frame"].extend(range(k))
                out["n_samples"].extend([frame_len] * k)
                out["rms"].extend(rms.tolist())
                out["zcr"].extend(zcr.tolist())
                out["centroid_hz"].extend(cent.tolist())
            yield pd.DataFrame(out)

    return df.select(id_col, audio_col, rate_col).mapInPandas(
        run, schema=AUDIO_FRAME_SCHEMA
    )
