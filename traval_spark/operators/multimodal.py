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
