"""Gorilla-style compression: delta-of-delta timestamps + XOR floats.

Implements the Facebook Gorilla encoding (Pelkonen et al., VLDB 2015,
"Gorilla: A Fast, Scalable, In-Memory Time Series Database", §4.1) from
the published paper — the reference repo has no compression; this is the
north-rule retention-tier storage codec (BASELINE.json).

Timestamp stream (int64 microseconds):
- header: t0 (64 bits), first delta d0 (64 bits)
- then per point, dod = (t_i - t_{i-1}) - (t_{i-1} - t_{i-2}):
  '0'                          dod == 0
  '10'   + 7  bits             dod in [-63, 64]
  '110'  + 9  bits             dod in [-255, 256]
  '1110' + 12 bits             dod in [-2047, 2048]
  '1111' + 64 bits             otherwise (wider than the paper's 32-bit
                               tail because we store microseconds)

Value stream (float64 bit patterns):
- header: v0 (64 bits); then per point, xor = bits(v_i) ^ bits(v_{i-1}):
  '0'                          xor == 0
  '10' + meaningful bits       leading/trailing zeros fit previous window
  '11' + 6-bit lz + 6-bit len + meaningful bits   new window
  (6-bit lz/len instead of the paper's 5/6 so a full 64-bit XOR is
  representable without corner-casing.)

Spark integration: pack/unpack run as Arrow-batched kernels per
(source, day) block inside ``applyInPandas`` — embarrassingly parallel
across blocks, sequential only within a block exactly as the format
requires. Pure numpy+python, no external bit libraries.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from traval_spark.functions.ts import ensure_ntz


class _BitWriter:
    """Append-only bit buffer (MSB-first within the running stream)."""

    __slots__ = ("acc", "nbits", "out")

    def __init__(self) -> None:
        self.acc = 0
        self.nbits = 0
        self.out = bytearray()

    def write(self, value: int, nbits: int) -> None:
        self.acc = (self.acc << nbits) | (value & ((1 << nbits) - 1))
        self.nbits += nbits
        while self.nbits >= 8:
            self.nbits -= 8
            self.out.append((self.acc >> self.nbits) & 0xFF)
        self.acc &= (1 << self.nbits) - 1

    def getvalue(self) -> bytes:
        if self.nbits:
            return bytes(self.out) + bytes([(self.acc << (8 - self.nbits)) & 0xFF])
        return bytes(self.out)


class _BitReader:
    __slots__ = ("data", "pos")

    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0

    def read(self, nbits: int) -> int:
        v = 0
        for _ in range(nbits):
            byte = self.data[self.pos >> 3]
            v = (v << 1) | ((byte >> (7 - (self.pos & 7))) & 1)
            self.pos += 1
        return v


_DOD_BUCKETS = (
    (64, 0b10, 2, 7),        # [-63, 64]   -> '10'  + 7 bits
    (256, 0b110, 3, 9),      # [-255, 256] -> '110' + 9 bits
    (2048, 0b1110, 4, 12),   # [-2047,2048]-> '1110'+ 12 bits
)


def pack_timestamps(ts_us: np.ndarray) -> bytes:
    """Delta-of-delta bit-pack a sorted int64-microsecond array."""
    ts = np.asarray(ts_us, dtype=np.int64)
    w = _BitWriter()
    n = len(ts)
    w.write(n, 32)
    if n == 0:
        return w.getvalue()
    w.write(int(ts[0]) & ((1 << 64) - 1), 64)
    if n == 1:
        return w.getvalue()
    deltas = np.diff(ts)
    w.write(int(deltas[0]) & ((1 << 64) - 1), 64)
    dods = np.diff(deltas)
    for dod in dods.tolist():
        if dod == 0:
            w.write(0, 1)
            continue
        for hi, prefix, plen, vbits in _DOD_BUCKETS:
            if -hi + 1 <= dod <= hi:
                w.write(prefix, plen)
                w.write(dod + hi - 1, vbits)  # bias to unsigned
                break
        else:
            w.write(0b1111, 4)
            w.write(dod & ((1 << 64) - 1), 64)
    return w.getvalue()


def unpack_timestamps(blob: bytes) -> np.ndarray:
    r = _BitReader(blob)
    n = r.read(32)
    out = np.empty(n, dtype=np.int64)
    if n == 0:
        return out
    t0 = r.read(64)
    out[0] = np.int64(np.uint64(t0))
    if n == 1:
        return out
    d = np.int64(np.uint64(r.read(64)))
    out[1] = out[0] + d
    for i in range(2, n):
        if r.read(1) == 0:
            dod = 0
        else:
            matched = False
            for hi, _prefix, plen, vbits in _DOD_BUCKETS:
                if r.read(1) == 0:  # consumed one more prefix bit -> bucket
                    dod = r.read(vbits) - hi + 1
                    matched = True
                    break
            if not matched:
                raw = r.read(64)
                dod = int(np.int64(np.uint64(raw)))
        d = d + dod
        out[i] = out[i - 1] + d
    return out


def pack_values(vals: np.ndarray) -> bytes:
    """Gorilla XOR bit-pack a float64 array (NaN-safe: NaN has a fixed
    bit pattern via np.float64 view and round-trips exactly)."""
    bits = np.asarray(vals, dtype=np.float64).view(np.uint64)
    w = _BitWriter()
    n = len(bits)
    w.write(n, 32)
    if n == 0:
        return w.getvalue()
    w.write(int(bits[0]), 64)
    prev = int(bits[0])
    prev_lz, prev_tz = 65, 65  # sentinel: no previous window
    for cur in bits[1:].tolist():
        xor = prev ^ cur
        prev = cur
        if xor == 0:
            w.write(0, 1)
            continue
        lz = 64 - xor.bit_length()
        tz = (xor & -xor).bit_length() - 1
        if lz >= prev_lz and tz >= prev_tz:
            w.write(0b10, 2)
            w.write(xor >> prev_tz, 64 - prev_lz - prev_tz)
        else:
            mlen = 64 - lz - tz
            w.write(0b11, 2)
            w.write(lz, 6)
            w.write(mlen - 1, 6)  # mlen in [1, 64] -> 6 bits, biased by 1
            w.write(xor >> tz, mlen)
            prev_lz, prev_tz = lz, tz
    return w.getvalue()


def unpack_values(blob: bytes) -> np.ndarray:
    r = _BitReader(blob)
    n = r.read(32)
    out = np.empty(n, dtype=np.uint64)
    if n == 0:
        return out.view(np.float64)
    prev = r.read(64)
    out[0] = prev
    lz, tz = 65, 65
    for i in range(1, n):
        if r.read(1) == 0:
            out[i] = prev
            continue
        if r.read(1) == 0:  # reuse previous window
            mlen = 64 - lz - tz
            xor = r.read(mlen) << tz
        else:
            lz = r.read(6)
            mlen = r.read(6) + 1
            tz = 64 - lz - mlen
            xor = r.read(mlen) << tz
        prev = prev ^ xor
        out[i] = prev
    return out.view(np.float64)


# ---------------------------------------------------------------------------
# Spark integration: per-(source, day) block packing
# ---------------------------------------------------------------------------

PACKED_SCHEMA = (
    "source string, day timestamp_ntz, measure string, n_points int, "
    "ts_blob binary, val_blob binary, raw_bytes long, packed_bytes long"
)


def pack_tier(tier_df: DataFrame, measures: list[str] | None = None) -> DataFrame:
    """Pack a rollup tier into Gorilla blocks, one row per (source, day,
    measure). Lineage columns record the compression ratio inputs."""
    measures = measures or ["sum_tok"]
    df = ensure_ntz(tier_df, "bucket").withColumn(
        "day", F.date_trunc("day", F.col("bucket")).cast("timestamp_ntz")
    )
    cols = ["source", "day", "bucket"] + measures

    def pack_block(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("bucket")
        ts_us = pdf["bucket"].astype("datetime64[us]").astype(np.int64).to_numpy()
        rows = []
        for m in measures:
            vals = pdf[m].to_numpy(dtype=np.float64)
            ts_blob = pack_timestamps(ts_us)
            val_blob = pack_values(vals)
            rows.append(
                {
                    "source": pdf["source"].iloc[0],
                    "day": pdf["day"].iloc[0],
                    "measure": m,
                    "n_points": len(pdf),
                    "ts_blob": ts_blob,
                    "val_blob": val_blob,
                    "raw_bytes": 16 * len(pdf),  # int64 ts + float64 value
                    "packed_bytes": len(ts_blob) + len(val_blob),
                }
            )
        return pd.DataFrame(rows)

    return (
        df.select(*cols)
        .groupBy("source", "day")
        .applyInPandas(pack_block, schema=PACKED_SCHEMA)
    )


UNPACKED_SCHEMA = "source string, measure string, bucket timestamp_ntz, value double"


def unpack_tier(packed: DataFrame) -> DataFrame:
    """Round-trip decode of :func:`pack_tier` blocks back to long rows."""

    def unpack_block(pdf: pd.DataFrame) -> pd.DataFrame:
        frames = []
        for _, row in pdf.iterrows():
            ts = unpack_timestamps(bytes(row["ts_blob"]))
            vals = unpack_values(bytes(row["val_blob"]))
            frames.append(
                pd.DataFrame(
                    {
                        "source": row["source"],
                        "measure": row["measure"],
                        "bucket": ts.astype("datetime64[us]"),
                        "value": vals,
                    }
                )
            )
        return (
            pd.concat(frames)
            if frames
            else pd.DataFrame(columns=["source", "measure", "bucket", "value"])
        )

    return packed.groupBy("source", "day").applyInPandas(
        unpack_block, schema=UNPACKED_SCHEMA
    )
