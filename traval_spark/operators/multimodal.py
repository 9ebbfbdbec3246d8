"""Multimodal-column plumbing: opaque binary payloads + typed metadata.

Treats image/audio/video as ``binary`` columns with typed metadata
structs, processed by Arrow-batched ``mapInPandas`` kernels. The actual
media decode is STUBBED (no image/audio libraries ship in this container):
``decode_stub='fake'`` produces deterministic hash-derived features so the
Spark-side plumbing — schema, batch iteration, partitioning, UDF
signatures — is real and tested end-to-end; ``decode_stub='raise'``
raises NotImplementedError exactly where a real decoder (PIL/ffmpeg/...)
would plug in.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

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
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if decode_stub == "raise":
                raise NotImplementedError(
                    "media decode requires an image/audio library not present "
                    "in this environment; plug PIL/torchaudio/ffmpeg in here"
                )
            feats, nbytes, fmts = [], [], []
            for payload in pdf[payload_col]:
                raw = bytes(payload)
                digest = hashlib.md5(raw).digest()
                feats.append(
                    np.frombuffer(digest[: n_features * 2], dtype=np.uint16)
                    .astype(np.float32)
                    / np.float32(65536.0)
                )
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
    """
    n_out = width * height

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if decode_stub == "raise":
                raise NotImplementedError(
                    "image decode/resample requires PIL/opencv; plug in here"
                )
            out = []
            for payload in pdf[payload_col]:
                raw = bytes(payload)
                stream = b""
                seed = raw
                while len(stream) < n_out:
                    seed = hashlib.md5(seed).digest()
                    stream += seed
                out.append(stream[:n_out])
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
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if decode_stub == "raise":
                raise NotImplementedError(
                    "video demux/decode requires ffmpeg/pyav; plug in here"
                )
            ids, idxs, tss, frames = [], [], [], []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                raw = bytes(payload)
                digest = hashlib.md5(raw).digest()
                duration_ms = int.from_bytes(digest[:4], "big") % 10_000
                n = min(duration_ms // every_ms + 1, max_frames)
                for i in range(n):
                    ids.append(doc_id)
                    idxs.append(i)
                    tss.append(i * every_ms)
                    frames.append(
                        hashlib.md5(digest + i.to_bytes(4, "big")).digest()
                    )
            yield pd.DataFrame(
                {
                    "doc_id": np.asarray(ids, dtype=np.int64),
                    "frame_idx": np.asarray(idxs, dtype=np.int32),
                    "ts_ms": np.asarray(tss, dtype=np.int64),
                    "frame": frames,
                }
            )

    return df.select(id_col, payload_col).mapInPandas(run, schema=FRAME_SCHEMA)
