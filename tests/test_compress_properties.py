"""Property-based tests for the Gorilla codec (compress.py) — pure
numpy-level, no Spark session needed, so hypothesis can hammer the bit
grammar with hundreds of adversarial cases per run.

Invariants:
- pack/unpack is the identity for BIT PATTERNS: float payloads round-trip
  via their uint64 view, so NaN payloads, -0.0, infinities, and subnormals
  must all survive (VLDB'15 Gorilla XORs raw bits — lossless by design).
- timestamps: any non-decreasing int64 microsecond sequence round-trips
  (delta-of-delta handles bursts, gaps, and constant cadence alike).
- the vectorized batch decoders equal the scalar reference decoders on
  every input (the scalar path is the grammar spec; VERDICT r1 finding).
"""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st
from hypothesis.extra.numpy import arrays

from traval_spark.compress import (
    _unpack_timestamps_scalar,
    _unpack_values_scalar,
    pack_timestamps,
    pack_values,
    unpack_timestamps,
    unpack_values,
)

# full-range doubles INCLUDING nan/inf/-0.0/subnormals: the codec works
# on raw bits, so every bit pattern is legal input
any_doubles = arrays(
    np.float64,
    st.integers(min_value=1, max_value=200),
    elements=st.floats(
        allow_nan=True, allow_infinity=True, allow_subnormal=True,
        width=64,
    ),
)


def bits(a: np.ndarray) -> np.ndarray:
    return a.view(np.uint64)


@settings(max_examples=200, deadline=None)
@given(any_doubles)
def test_values_roundtrip_bit_exact(vals):
    out = unpack_values(pack_values(vals))
    assert out.dtype == np.float64
    assert np.array_equal(bits(out), bits(vals))


@settings(max_examples=200, deadline=None)
@given(any_doubles)
def test_vectorized_value_decoder_equals_scalar(vals):
    blob = pack_values(vals)
    assert np.array_equal(
        bits(unpack_values(blob)), bits(_unpack_values_scalar(blob))
    )


# non-decreasing microsecond timestamps with adversarial delta shapes:
# zero deltas (equal stamps), constant cadence (the d-o-d == 0 hot path),
# and huge jumps (full-width fallback windows)
ts_deltas = st.lists(
    st.one_of(
        st.just(0),
        st.just(60_000_000),  # 1-minute cadence, the rollup-tier case
        st.integers(min_value=1, max_value=10**12),
    ),
    min_size=0,
    max_size=150,
)


@settings(max_examples=200, deadline=None)
@given(st.integers(min_value=0, max_value=2**52), ts_deltas)
def test_timestamps_roundtrip(start, deltas):
    ts = np.cumsum(np.array([start] + deltas, dtype=np.int64))
    blob = pack_timestamps(ts)
    assert np.array_equal(unpack_timestamps(blob), ts)
    assert np.array_equal(_unpack_timestamps_scalar(blob), ts)
