"""Stateful streaming rule evaluation via ``applyInPandasWithState``.

Batch rules that need neighbor points (spike detection: flag at i needs
points i-1 and i+1 — reference rulelib.py:231-262) cannot run as plain
stateless stream maps: a micro-batch boundary would sever the lookback /
lookahead. This module carries the per-source boundary across
micro-batches as explicit group state:

- state per source = the last two raw points (second-last already
  emitted downstream; last still *pending* because its successor hasn't
  arrived);
- each micro-batch prepends the carried points, evaluates the identical
  gap-aware spike predicate as the batch rule (same float arithmetic),
  emits every point that now has its successor, and carries the new
  tail.

Parity with the batch plan: an emitted point's flag is bit-identical to
``rule_spike_detection`` (asserted in tests/test_streaming.py with
maxFilesPerTrigger=1 forcing cross-batch boundaries). The only
difference is the stream's pending final point per source, which emits
on the next point's arrival — exactly the latency a lookahead rule must
pay.

**In-order contract (API-level)**: input is assumed in-order per source
(file-source ingestion of time-partitioned drops). A row at or before
the carried tail is LATE data whose window context is gone; it cannot
be evaluated correctly anymore. Default policy drops it — but
observably: pass ``late_code=`` (e.g. :data:`LATE_ARRIVAL_CODE`) to
emit late rows with that marker code instead, so a downstream count of
``code = late_code`` rows measures the loss (no silent discard). Either
way the batch rebuild remains the source of truth for late data, as
with the streaming rollup tier.

Scale shape: state is O(1) per source (two points), the RocksDB/HDFS
state store holds |sources| entries, and each micro-batch shuffles only
by source — the same key the rollup already groups by.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from traval_spark.codes import CorrectionCode
from traval_spark.streaming.rollup_stream import SEQUENCE_SCHEMA

#: emitted rows: the input point + its correction code (0 = kept)
OUTPUT_SCHEMA = "source string, ts timestamp, value double, code int"
#: carried boundary: last two points as (ts micros, value) pairs;
#: tsa/va may be -1/NaN when only one point has been seen
STATE_SCHEMA = "tsa long, va double, tsb long, vb double"

_CODE = int(CorrectionCode.UNKNOWN_COMPARISON_VALUE)

#: marker code for late-arriving rows emitted under ``late_code=`` —
#: deliberately outside the reference CorrectionCode range (codes.py):
#: it labels a row the stream could NOT evaluate, not a correction.
LATE_ARRIVAL_CODE = -99


def _late_frame(key, ts_us: np.ndarray, vals: np.ndarray, late_code: int):
    return pd.DataFrame(
        {
            "source": key[0],
            "ts": ts_us.astype("datetime64[us]"),
            "value": vals,
            "code": np.full(len(ts_us), late_code, dtype="int32"),
        }
    )


def _spike_flags(
    ts_us: np.ndarray, vals: np.ndarray,
    threshold: float, spike_tol: float, max_gap_us: int,
) -> np.ndarray:
    """The batch spike predicate (rules.rule_spike_detection derivation)
    on position-aligned numpy arrays; NaN propagates exactly like NULL."""
    n = len(vals)
    d = np.full(n, np.nan)
    if n > 1:
        d[1:] = vals[1:] - vals[:-1]
        d[1:][(ts_us[1:] - ts_us[:-1]) > max_gap_us] = np.nan
    du = np.where(d < 0.0, np.nan, d)  # keeps d >= 0 and NaN
    dd = np.where(d > 0.0, np.nan, d)
    du_next = np.full(n, np.nan)
    dd_next = np.full(n, np.nan)
    du_next[:-1] = du[1:]
    dd_next[:-1] = dd[1:]
    with np.errstate(invalid="ignore"):
        up = (np.abs(du + dd_next) <= spike_tol) & (d > threshold)
        down = (np.abs(dd + du_next) <= spike_tol) & (d < -threshold)
    return np.nan_to_num(up.astype(float) + down.astype(float)) > 0


def make_spike_state_func(
    threshold: float, spike_tol: float, max_gap_us: int,
    late_code: int | None = None,
):
    """Build the applyInPandasWithState kernel (closure over the params).

    ``late_code``: emit rows at/before the carried tail with this marker
    code instead of dropping them silently (see module docstring)."""

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        batch = pd.concat(list(pdfs))
        if batch.empty:
            return
        batch = batch.sort_values("ts")
        b_ts = batch["ts"].to_numpy("datetime64[us]").astype("int64")
        b_vals = batch["value"].to_numpy(dtype=float)

        carried_ts: list[int] = []
        carried_vals: list[float] = []
        if state.exists:
            tsa, va, tsb, vb = state.get
            if tsa >= 0:
                carried_ts.append(tsa)
                carried_vals.append(va)
            carried_ts.append(tsb)
            carried_vals.append(vb)
            # late rows (at or before the pending point) were already
            # emitted or superseded: surface with late_code, or drop
            fresh = b_ts > carried_ts[-1]
            if late_code is not None and (~fresh).any():
                yield _late_frame(key, b_ts[~fresh], b_vals[~fresh],
                                  late_code)
            b_ts, b_vals = b_ts[fresh], b_vals[fresh]
        if len(b_ts) == 0:
            return

        ts_us = np.concatenate([np.array(carried_ts, dtype="int64"), b_ts])
        vals = np.concatenate([np.array(carried_vals, dtype=float), b_vals])
        flags = _spike_flags(ts_us, vals, threshold, spike_tol, max_gap_us)

        # emit: the pending carried point (now has a successor) + every
        # new point except the last (which becomes the new pending tail)
        start = len(carried_ts) - 1 if carried_ts else 0
        end = len(ts_us) - 1  # exclusive: tail stays pending
        if end > start:
            sel = slice(start, end)
            yield pd.DataFrame(
                {
                    "source": key[0],
                    "ts": ts_us[sel].astype("datetime64[us]"),
                    "value": vals[sel],
                    "code": np.where(flags[sel], _CODE, 0).astype("int32"),
                }
            )

        n = len(ts_us)
        state.update((
            int(ts_us[n - 2]) if n >= 2 else -1,
            float(vals[n - 2]) if n >= 2 else float("nan"),
            int(ts_us[n - 1]),
            float(vals[n - 1]),
        ))

    return fn


#: hampel carried state: every point within `window` of the newest ts,
#: with its deviation |v - rolling_median| PRECOMPUTED — a trailing-window
#: rule can emit each point immediately (windows only look back), but a
#: future point's MAD window needs the deviations of points up to
#: `window` old, and THOSE deviations were computed against medians over
#: points up to 2*window old. Storing (ts, val, dev) triples keeps the
#: state at O(points-per-window) instead of 2x that.
HAMPEL_STATE_SCHEMA = (
    "ts array<long>, vals array<double>, devs array<double>"
)


def make_hampel_state_func(
    window_us: int, k: float, min_obs: int,
    late_code: int | None = None,
):
    """applyInPandasWithState kernel for the streaming Hampel filter.

    ``late_code``: emit rows at/before the carried newest ts with this
    marker code instead of dropping them silently (module docstring).

    Exactness argument (mirrors the batch chunked kernel's halo proof,
    operators/kernels.py): a new point t' only needs values in
    (t'-window, t'] for its median and deviations in the same interval
    for its MAD; every such point has ts > max_seen - window (input
    in-order per source), which is exactly what the state retains, and
    each retained point's deviation was computed when ITS full trailing
    window was still in the buffer. Flags are therefore identical to
    batch ``rule_hampel`` (asserted in tests with maxFilesPerTrigger=1
    forcing windows to span micro-batches).
    """
    w_td = pd.Timedelta(window_us, unit="us")
    consistency = 1.4826 * float(k)

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        batch = pd.concat(list(pdfs))
        if batch.empty:
            return
        batch = batch.sort_values("ts")
        b_ts = batch["ts"].to_numpy("datetime64[us]").astype("int64")
        b_vals = batch["value"].to_numpy(dtype=float)

        if state.exists:
            c_ts, c_vals, c_devs = (
                np.asarray(a, dtype=t) for a, t in zip(
                    state.get, ("int64", float, float))
            )
            fresh = b_ts > c_ts[-1]  # late rows: already emitted/superseded
            if late_code is not None and (~fresh).any():
                yield _late_frame(key, b_ts[~fresh], b_vals[~fresh],
                                  late_code)
            b_ts, b_vals = b_ts[fresh], b_vals[fresh]
        else:
            c_ts = np.empty(0, dtype="int64")
            c_vals = np.empty(0, dtype=float)
            c_devs = np.empty(0, dtype=float)
        if len(b_ts) == 0:
            return

        ts_us = np.concatenate([c_ts, b_ts])
        vals = np.concatenate([c_vals, b_vals])
        idx = pd.DatetimeIndex(ts_us.astype("datetime64[us]"))
        s = pd.Series(vals, index=idx)
        n_old = len(c_ts)

        # pandas time rolling is (t-w, t] (closed='right'), the batch
        # rule's range frame; values at carried positions are WRONG here
        # (their windows were truncated by retention) and are discarded —
        # only the new tail is read, whose windows are fully in-buffer
        med = s.rolling(w_td, min_periods=1).median()
        dev_new = (s - med).abs().to_numpy()[n_old:]
        devs = np.concatenate([c_devs, dev_new])
        dev_s = pd.Series(devs, index=idx)
        mad = dev_s.rolling(w_td, min_periods=1).median().to_numpy()[n_old:]
        cnt = s.rolling(w_td, min_periods=1).count().to_numpy()[n_old:]

        with np.errstate(invalid="ignore"):
            flags = (cnt >= min_obs) & (dev_new > consistency * mad)
        yield pd.DataFrame(
            {
                "source": key[0],
                "ts": b_ts.astype("datetime64[us]"),
                "value": b_vals,
                "code": np.where(flags, _CODE, 0).astype("int32"),
            }
        )

        keep = ts_us > ts_us[-1] - window_us
        state.update((
            [int(x) for x in ts_us[keep]],
            [float(x) for x in vals[keep]],
            [float(x) for x in devs[keep]],
        ))

    return fn


def stream_hampel_clean(
    spark: SparkSession,
    input_path: str,
    window: str = "1D",
    k: float = 3.0,
    min_obs: int = 3,
    max_files_per_trigger: int = 1,
    late_code: int | None = None,
) -> DataFrame:
    """Streaming Hampel filter over tokenized-sequence file drops.

    Trailing-window twin of :func:`stream_spike_clean`: every input point
    is emitted in the micro-batch it arrives in (trailing windows need no
    lookahead), flagged identically to batch ``rule_hampel``. State per
    source is the last ``window`` of (ts, value, deviation) triples.
    Input must be in-order per source; ``late_code`` makes violations
    observable instead of silently dropped (module docstring).
    """
    stream = (
        spark.readStream.schema(SEQUENCE_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_path)
        .select(
            "source",
            F.col("ts").cast("timestamp").alias("ts"),
            F.col("n_tok").cast("double").alias("value"),
        )
    )
    window_us = int(pd.Timedelta(window).value // 1_000)
    return stream.groupBy("source").applyInPandasWithState(
        make_hampel_state_func(window_us, k, min_obs, late_code=late_code),
        OUTPUT_SCHEMA,
        HAMPEL_STATE_SCHEMA,
        "append",
        GroupStateTimeout.NoTimeout,
    )


def stream_spike_clean(
    spark: SparkSession,
    input_path: str,
    threshold: float = 0.15,
    spike_tol: float = 0.15,
    max_gap: str = "7D",
    max_files_per_trigger: int = 1,
    late_code: int | None = None,
) -> DataFrame:
    """Streaming spike-flagger over tokenized-sequence file drops.

    Returns the unbounded DataFrame of (source, ts, value, code); write it
    with ``.writeStream`` (append mode) — each input point appears exactly
    once, flagged identically to the batch rule. Input must be in-order
    per source; ``late_code`` makes violations observable instead of
    silently dropped (module docstring).
    """
    stream = (
        spark.readStream.schema(SEQUENCE_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_path)
        .select(
            "source",
            # state/watermark machinery wants TIMESTAMP, not NTZ
            F.col("ts").cast("timestamp").alias("ts"),
            F.col("n_tok").cast("double").alias("value"),
        )
    )
    max_gap_us = int(pd.Timedelta(max_gap).value // 1_000)
    return stream.groupBy("source").applyInPandasWithState(
        make_spike_state_func(threshold, spike_tol, max_gap_us,
                              late_code=late_code),
        OUTPUT_SCHEMA,
        STATE_SCHEMA,
        "append",
        GroupStateTimeout.NoTimeout,
    )


# ---------------------------------------------------------------------------
# streaming flat-signal rule
# ---------------------------------------------------------------------------

FLAT_STATE_SCHEMA = "ts array<long>, vals array<double>"


def make_flat_state_func(
    window_us: int, min_obs: int, std_threshold: float,
    hbelow: float | None = None, habove: float | None = None,
    late_code: int | None = None,
):
    """applyInPandasWithState kernel for the streaming flat-signal rule.

    Same trailing-window state shape as the Hampel kernel; the window-
    MEMBERSHIP exactness argument carries over (a new point's rolling
    std/count need only the (t-window, t] values, all retained). One
    honest caveat the Hampel kernel doesn't have: pandas rolling std is
    an online sum-of-squares accumulation while the batch rule's
    ``stddev_samp`` recomputes each range frame exactly, so a window
    whose true std sits within float accumulation error (~1e-9
    relative at moderate magnitudes, worse after large-magnitude
    swings) of ``std_threshold`` can flag differently from batch —
    realistic-value parity is pinned in tests; boundary-adversarial
    series should use the batch rule as truth.
    Supports the std gate plus the LITERAL hard gates (hbelow/habove);
    the ``qbelow``/``qabove`` quantile gates are batch-only — they are
    unbounded per-series aggregates over the full history, which a
    single-pass stream cannot know (rules.py:rule_flat_signal via_join
    is the scale path for those).
    """
    w_td = pd.Timedelta(window_us, unit="us")

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        batch = pd.concat(list(pdfs))
        if batch.empty:
            return
        batch = batch.sort_values("ts")
        b_ts = batch["ts"].to_numpy("datetime64[us]").astype("int64")
        b_vals = batch["value"].to_numpy(dtype=float)

        if state.exists:
            c_ts, c_vals = (
                np.asarray(a, dtype=t)
                for a, t in zip(state.get, ("int64", float))
            )
            fresh = b_ts > c_ts[-1]
            if late_code is not None and (~fresh).any():
                yield _late_frame(key, b_ts[~fresh], b_vals[~fresh],
                                  late_code)
            b_ts, b_vals = b_ts[fresh], b_vals[fresh]
        else:
            c_ts = np.empty(0, dtype="int64")
            c_vals = np.empty(0, dtype=float)
        if len(b_ts) == 0:
            return

        ts_us = np.concatenate([c_ts, b_ts])
        vals = np.concatenate([c_vals, b_vals])
        idx = pd.DatetimeIndex(ts_us.astype("datetime64[us]"))
        s = pd.Series(vals, index=idx)
        n_old = len(c_ts)

        roll = s.rolling(w_td, min_periods=1)
        std = roll.std().to_numpy()[n_old:]   # ddof=1 == stddev_samp
        cnt = roll.count().to_numpy()[n_old:]
        with np.errstate(invalid="ignore"):
            flags = (cnt >= min_obs) & (std < std_threshold)
        if hbelow is not None and habove is not None:
            flags &= (b_vals > habove) | (b_vals < hbelow)
        elif hbelow is not None:
            flags &= b_vals < hbelow
        elif habove is not None:
            flags &= b_vals > habove
        flags &= ~np.isnan(b_vals)

        yield pd.DataFrame(
            {
                "source": key[0],
                "ts": b_ts.astype("datetime64[us]"),
                "value": b_vals,
                "code": np.where(flags, _CODE, 0).astype("int32"),
            }
        )

        keep = ts_us > ts_us[-1] - window_us
        state.update((
            [int(x) for x in ts_us[keep]],
            [float(x) for x in vals[keep]],
        ))

    return fn


def stream_flat_clean(
    spark: SparkSession,
    input_path: str,
    window: str = "1D",
    min_obs: int = 3,
    std_threshold: float = 7.5e-3,
    hbelow: float | None = None,
    habove: float | None = None,
    max_files_per_trigger: int = 1,
    late_code: int | None = None,
) -> DataFrame:
    """Streaming flat-signal rule over tokenized-sequence file drops —
    the third stateful rule (after spike and Hampel): every point emits
    in its arriving micro-batch, flagged identically to batch
    ``rule_flat_signal`` (std + hard gates; quantile gates batch-only,
    see :func:`make_flat_state_func`). State per source is the last
    ``window`` of (ts, value) pairs."""
    stream = (
        spark.readStream.schema(SEQUENCE_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_path)
        .select(
            "source",
            F.col("ts").cast("timestamp").alias("ts"),
            F.col("n_tok").cast("double").alias("value"),
        )
    )
    window_us = int(pd.Timedelta(window).value // 1_000)
    return stream.groupBy("source").applyInPandasWithState(
        make_flat_state_func(window_us, min_obs, std_threshold,
                             hbelow=hbelow, habove=habove,
                             late_code=late_code),
        OUTPUT_SCHEMA,
        FLAT_STATE_SCHEMA,
        "append",
        GroupStateTimeout.NoTimeout,
    )


#: counter-step rows: the input point + its PromQL-style step
COUNTER_OUTPUT_SCHEMA = (
    "source string, ts timestamp, ident string, value double, "
    "step double, reset int"
)
#: carried boundary: the last sample per source
COUNTER_STATE_SCHEMA = "tsl long, vl double, il string"


def make_counter_state_func(late_code: int | None = None):
    """applyInPandasWithState kernel for streaming counter steps
    (operators/monitor.py:counter_windows semantics, module docstring
    in-order contract).

    Unlike the spike/hampel kernels there is NO lookahead: a sample's
    step needs only its predecessor, so every input row emits in its
    own micro-batch and state is one (ts, value) pair per source —
    strictly O(1). The Prometheus reset rule is applied identically to
    the batch operator: negative step credits the new value; the first
    sample of a series contributes step 0. Downstream windowed
    increase/rate/resets are plain batch aggregations over the emitted
    step rows (asserted equal to batch ``counter_windows`` in tests).

    Late rows (at/before the carried sample) emit with step 0 and the
    ``late_code`` marker in the ``reset`` column (outside its 0/1
    domain) when requested, else drop — same observability contract as
    the other stateful kernels.
    """

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        batch = pd.concat(list(pdfs))
        if batch.empty:
            return
        # NULL idents normalize to "" so the tie-break total-orders
        # (and sorts consistently) even when the ident column is absent
        batch = batch.assign(
            ident=batch["ident"].map(lambda i: "" if i is None else str(i))
        ).sort_values(["ts", "ident"])
        b_ts = batch["ts"].to_numpy("datetime64[us]").astype("int64")
        b_ids = batch["ident"].to_numpy(dtype=object)
        b_vals = batch["value"].to_numpy(dtype=float)

        prev_us, prev_v = -1, float("nan")
        if state.exists:
            prev_us, prev_v, prev_id = state.get
            # tie-break on ident (string order — the kernel's sort key)
            # so equal-timestamp samples split across micro-batches are
            # NOT misclassified as late; matches the batch (ts, ident)
            # ordering when idents compare consistently as strings
            fresh = (b_ts > prev_us) | (
                (b_ts == prev_us)
                & np.array([i > prev_id for i in b_ids], dtype=bool)
            )
            if late_code is not None and (~fresh).any():
                yield pd.DataFrame({
                    "source": key[0],
                    "ts": b_ts[~fresh].astype("datetime64[us]"),
                    "ident": b_ids[~fresh],
                    "value": b_vals[~fresh],
                    "step": np.zeros((~fresh).sum()),
                    "reset": np.full((~fresh).sum(), late_code,
                                     dtype="int32"),
                })
            b_ts, b_ids, b_vals = b_ts[fresh], b_ids[fresh], b_vals[fresh]
        if len(b_ts) == 0:
            return

        prev_vals = np.concatenate([[prev_v], b_vals[:-1]])
        delta = b_vals - prev_vals
        first = np.isnan(prev_vals)
        reset = (~first) & (delta < 0)
        step = np.where(first, 0.0, np.where(reset, b_vals, delta))
        yield pd.DataFrame({
            "source": key[0],
            "ts": b_ts.astype("datetime64[us]"),
            "ident": b_ids,
            "value": b_vals,
            "step": step,
            "reset": reset.astype("int32"),
        })
        state.update((int(b_ts[-1]), float(b_vals[-1]),
                      str(b_ids[-1])))

    return fn


def stream_counter_steps(
    spark: SparkSession,
    input_path: str,
    value_col: str = "n_tok",
    ident_col: str = "doc_id",
    max_files_per_trigger: int = 64,
    late_code: int | None = None,
) -> DataFrame:
    """Streaming PromQL-style counter steps over the sequence drop dir.

    Emits one step row per input sample (source, ts, ident, value,
    step, reset); windowed increase/rate/resets aggregate downstream
    from the emitted rows (a second stateful operator is deliberately
    avoided — steps are per-point facts, windows are plain batch math
    over the step sink)."""
    stream = (
        spark.readStream.schema(SEQUENCE_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_path)
        .select(
            "source", F.col("ts").cast("timestamp").alias("ts"),
            F.col(ident_col).cast("string").alias("ident"),
            F.col(value_col).cast("double").alias("value"),
        )
    )
    return stream.groupBy("source").applyInPandasWithState(
        make_counter_state_func(late_code=late_code),
        outputStructType=COUNTER_OUTPUT_SCHEMA,
        stateStructType=COUNTER_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


#: compacted rows: only change points pass through
CHANGES_OUTPUT_SCHEMA = (
    "source string, ts timestamp, ident string, value double"
)


def make_changes_state_func(late_code: int | None = None):
    """applyInPandasWithState kernel for streaming run-length
    compaction (operators/monitor.py:changes_only semantics): emit a
    row only when the value differs from the carried last value —
    slowly-changing streams compact AT INGEST, before anything lands
    on disk.  Same O(1) (ts, value, ident) state and in-order/late
    contract as the counter kernel; late rows (if surfaced) carry
    NaN value and the marker ident prefix 'late:'."""

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        batch = pd.concat(list(pdfs))
        if batch.empty:
            return
        batch = batch.assign(
            ident=batch["ident"].map(lambda i: "" if i is None else str(i))
        ).sort_values(["ts", "ident"])
        b_ts = batch["ts"].to_numpy("datetime64[us]").astype("int64")
        b_ids = batch["ident"].to_numpy(dtype=object)
        b_vals = batch["value"].to_numpy(dtype=float)

        prev_v = float("nan")
        if state.exists:
            prev_us, prev_v, prev_id = state.get
            fresh = (b_ts > prev_us) | (
                (b_ts == prev_us)
                & np.array([i > prev_id for i in b_ids], dtype=bool)
            )
            if late_code is not None and (~fresh).any():
                yield pd.DataFrame({
                    "source": key[0],
                    "ts": b_ts[~fresh].astype("datetime64[us]"),
                    "ident": ["late:" + str(i) for i in b_ids[~fresh]],
                    "value": np.full((~fresh).sum(), np.nan),
                })
            b_ts, b_ids, b_vals = b_ts[fresh], b_ids[fresh], b_vals[fresh]
        if len(b_ts) == 0:
            return

        prev_vals = np.concatenate([[prev_v], b_vals[:-1]])
        keep = np.isnan(prev_vals) | (b_vals != prev_vals)
        if keep.any():
            yield pd.DataFrame({
                "source": key[0],
                "ts": b_ts[keep].astype("datetime64[us]"),
                "ident": b_ids[keep],
                "value": b_vals[keep],
            })
        state.update((int(b_ts[-1]), float(b_vals[-1]),
                      str(b_ids[-1])))

    return fn


def stream_changes_only(
    spark: SparkSession,
    input_path: str,
    value_col: str = "n_tok",
    ident_col: str = "doc_id",
    max_files_per_trigger: int = 64,
    late_code: int | None = None,
) -> DataFrame:
    """Streaming run-length compaction over the sequence drop dir:
    only change points flow downstream (the batch ``changes_only``
    semantics, applied at ingest).  Reconstruction stays exact via
    as-of join / forward fill, as in batch."""
    stream = (
        spark.readStream.schema(SEQUENCE_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_path)
        .select(
            "source", F.col("ts").cast("timestamp").alias("ts"),
            F.col(ident_col).cast("string").alias("ident"),
            F.col(value_col).cast("double").alias("value"),
        )
    )
    return stream.groupBy("source").applyInPandasWithState(
        make_changes_state_func(late_code=late_code),
        outputStructType=CHANGES_OUTPUT_SCHEMA,
        stateStructType=COUNTER_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


#: alert transition events: alert=1 fired (crossed hi from released),
#: alert=0 released (crossed lo from latched)
ALERT_OUTPUT_SCHEMA = (
    "source string, ts timestamp, ident string, value double, alert int"
)
#: latch state: last sample (in-order contract) + current latch bit
ALERT_STATE_SCHEMA = "tsl long, il string, st int"


def make_alert_state_func(hi: float, lo: float,
                          late_code: int | None = None):
    """applyInPandasWithState kernel for streaming hysteresis alerts
    (operators/monitor.py:hysteresis_daily semantics WITHOUT the day
    reset — the latch carries across micro-batches and days): emits one
    row per TRANSITION (fire above ``hi`` from released, release below
    ``lo`` from latched), nothing while the state holds.  State is the
    last sample's (ts, ident) for the in-order contract plus one latch
    bit — O(1).  Late rows: marker ident prefix 'late:' with alert =
    late_code when surfaced, else dropped."""
    h, l = float(hi), float(lo)

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        batch = pd.concat(list(pdfs))
        if batch.empty:
            return
        batch = batch.assign(
            ident=batch["ident"].map(lambda i: "" if i is None else str(i))
        ).sort_values(["ts", "ident"])
        b_ts = batch["ts"].to_numpy("datetime64[us]").astype("int64")
        b_ids = batch["ident"].to_numpy(dtype=object)
        b_vals = batch["value"].to_numpy(dtype=float)

        st = 0
        if state.exists:
            prev_us, prev_id, st = state.get
            fresh = (b_ts > prev_us) | (
                (b_ts == prev_us)
                & np.array([i > prev_id for i in b_ids], dtype=bool)
            )
            if late_code is not None and (~fresh).any():
                yield pd.DataFrame({
                    "source": key[0],
                    "ts": b_ts[~fresh].astype("datetime64[us]"),
                    "ident": ["late:" + str(i) for i in b_ids[~fresh]],
                    "value": b_vals[~fresh],
                    "alert": np.full((~fresh).sum(), late_code,
                                     dtype="int32"),
                })
            b_ts, b_ids, b_vals = b_ts[fresh], b_ids[fresh], b_vals[fresh]
        if len(b_ts) == 0:
            return

        # sequential latch scan (numpy-light loop over the micro-batch:
        # transitions are rare, batches bounded)
        out_idx, out_alert = [], []
        for i, v in enumerate(b_vals):
            if st == 0 and v > h:
                st = 1
                out_idx.append(i); out_alert.append(1)
            elif st == 1 and v < l:
                st = 0
                out_idx.append(i); out_alert.append(0)
        if out_idx:
            sel = np.array(out_idx)
            yield pd.DataFrame({
                "source": key[0],
                "ts": b_ts[sel].astype("datetime64[us]"),
                "ident": b_ids[sel],
                "value": b_vals[sel],
                "alert": np.array(out_alert, dtype="int32"),
            })
        state.update((int(b_ts[-1]), str(b_ids[-1]), int(st)))

    return fn


def stream_alerts(
    spark: SparkSession,
    input_path: str,
    hi: float,
    lo: float,
    value_col: str = "n_tok",
    ident_col: str = "doc_id",
    max_files_per_trigger: int = 64,
    late_code: int | None = None,
) -> DataFrame:
    """Streaming hysteresis alert events over the sequence drop dir:
    one row per latch transition, latch carried across micro-batches
    (no day reset — the always-on alerting channel next to the batch
    per-day report)."""
    stream = (
        spark.readStream.schema(SEQUENCE_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_path)
        .select(
            "source", F.col("ts").cast("timestamp").alias("ts"),
            F.col(ident_col).cast("string").alias("ident"),
            F.col(value_col).cast("double").alias("value"),
        )
    )
    return stream.groupBy("source").applyInPandasWithState(
        make_alert_state_func(hi, lo, late_code=late_code),
        outputStructType=ALERT_OUTPUT_SCHEMA,
        stateStructType=ALERT_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


#: streaming swinging-door: emitted rows are the STORED anchors
SWING_OUTPUT_SCHEMA = "source string, t_ms long, v_i long"
#: (ta, va, tp, vp, un, ud, dn, dd) — the exact-integer door state
SWING_STATE_SCHEMA = (
    "ta long, va long, tp long, vp long, "
    "un long, ud long, dn long, dd long"
)


def make_swing_state_func(eps_scaled: int, value_scale: int = 1):
    """applyInPandasWithState kernel for STREAMING swinging-door
    compression — identical exact-integer door state machine as the
    batch ``compress.swing_compress`` fold (rational slopes compared by
    cross-multiplication; Python ints are arbitrary-precision, so the
    comparisons are exact by construction, same verdicts as the JVM
    fold inside its documented magnitude budget).

    Emission contract: an anchor row is emitted THE MOMENT its doors
    close (plus the series' first point, always kept, on arrival);
    the trailing candidate point stays pending in state because the
    stream cannot know it is final — so after draining the same input,
    the streamed rows are exactly the batch operator's kept list MINUS
    its last point per series (parity-tested).  A production flush
    would emit the pending point on state timeout; deliberately not
    wired here to keep replay idempotent.

    Late/duplicate rule: rows at or before the carried candidate's
    timestamp (same ms) are dropped — the stream's analog of the batch
    last-by-ident same-ms dedup, disclosed (a late row can't reopen
    doors that already advanced past its instant).  State is O(1): the
    8-tuple of door integers.
    """
    E = int(eps_scaled)

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        batch = pd.concat(list(pdfs))
        if batch.empty:
            return
        batch = batch.sort_values(["ts", "ident"])
        t_arr = (batch["ts"].to_numpy("datetime64[us]").astype("int64")
                 // 1000)
        # half-AWAY-from-zero, matching the batch paths' Spark
        # F.round/DuckDB round (np.rint is half-even: 0.5*scale would
        # round 0 here but 1 there and flip a door verdict)
        x = batch["value"].to_numpy(dtype=float) * value_scale
        v_arr = np.where(x >= 0, np.floor(x + 0.5),
                         np.ceil(x - 0.5)).astype("int64")
        from traval_spark.compress import _swing_loop

        st = (tuple(int(x) for x in state.get) if state.exists else None)
        kept, new_state = _swing_loop(
            t_arr.tolist(), v_arr.tolist(), E, state=st)
        state.update(new_state)
        if kept:
            yield pd.DataFrame({
                "source": key[0],
                "t_ms": np.array([k[0] for k in kept], dtype="int64"),
                "v_i": np.array([k[1] for k in kept], dtype="int64"),
            })

    return fn


def stream_swing_compress(
    spark: SparkSession,
    input_path: str,
    eps_scaled: int,
    value_col: str = "n_tok",
    ident_col: str = "doc_id",
    value_scale: int = 1,
    max_files_per_trigger: int = 64,
) -> DataFrame:
    """Streaming error-bounded (swinging-door) compression over the
    sequence drop dir: stored anchors stream out as their doors close,
    bit-identical to the batch ``swing_compress`` kept list minus the
    per-series trailing point (see :func:`make_swing_state_func`)."""
    stream = (
        spark.readStream.schema(SEQUENCE_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_path)
        .select(
            "source", F.col("ts").cast("timestamp").alias("ts"),
            F.col(ident_col).cast("string").alias("ident"),
            F.col(value_col).cast("double").alias("value"),
        )
    )
    return stream.groupBy("source").applyInPandasWithState(
        make_swing_state_func(eps_scaled, value_scale=value_scale),
        outputStructType=SWING_OUTPUT_SCHEMA,
        stateStructType=SWING_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


EPISODE_OUTPUT_SCHEMA = (
    "source string, episode long, t_start timestamp, t_end timestamp, "
    "n_pts long, duration_s double, peak double, excess double"
)
# carried pair-order key + started-episode counter + the open episode's
# accumulators (fixed-point integers — Python ints keep them exact)
EPISODE_STATE_SCHEMA = (
    "last_us long, last_id string, n_started long, open int, "
    "ep_start long, ep_end long, ep_n long, ep_peak long, ep_exc long"
)


def make_episode_state_func(threshold: float, value_scale: int = 1000):
    """applyInPandasWithState kernel for streaming threshold-excursion
    episodes (operators/monitor.py:threshold_episodes semantics).

    Emits one row per CLOSED episode: an out-of-excursion (or NaN)
    sample arriving while an episode is open closes and emits it.  The
    per-series trailing OPEN episode stays in state — the stream
    cannot know it is final (the swing compressor's trailing-candidate
    rule; a timeout flush is the production hook, deliberately unwired
    to keep replay idempotent).  Membership is the batch operator's
    exact rule: fixed-point value (half-AWAY-from-zero, matching Spark
    F.round / DuckDB round — np.rint's half-even would flip boundary
    points) strictly greater than the identically-scaled threshold.
    Episode ids are the running started-count, so streamed ids equal
    the batch operator's 1..K numbering under the same row order.

    Late/duplicate rule: rows at or before the carried (ts, ident) are
    dropped (disclosed — a late row can't extend an episode whose span
    already advanced past it).  State is O(1): the 9-field tuple.
    """
    thr_fp = int(round(float(threshold) * value_scale))
    vs = float(value_scale)

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        batch = pd.concat(list(pdfs))
        if batch.empty:
            return
        batch = batch.assign(
            ident=batch["ident"].map(lambda i: "" if i is None else str(i))
        ).sort_values(["ts", "ident"])
        b_ts = batch["ts"].to_numpy("datetime64[us]").astype("int64")
        b_ids = batch["ident"].to_numpy(dtype=object)
        x = batch["value"].to_numpy(dtype=float) * vs
        b_y = np.where(x >= 0, np.floor(x + 0.5), np.ceil(x - 0.5))
        b_nan = ~np.isfinite(x)

        if state.exists:
            (last_us, last_id, n_started, open_, ep_start, ep_end,
             ep_n, ep_peak, ep_exc) = state.get
        else:
            last_us, last_id, n_started, open_ = -1, "", 0, 0
            ep_start = ep_end = ep_n = ep_peak = ep_exc = 0
        fresh = (b_ts > last_us) | (
            (b_ts == last_us)
            & np.array([i > last_id for i in b_ids], dtype=bool)
        )
        b_ts, b_ids = b_ts[fresh], b_ids[fresh]
        b_y, b_nan = b_y[fresh], b_nan[fresh]
        if len(b_ts) == 0:
            return

        closed = []
        for us, nan, yf in zip(b_ts.tolist(), b_nan.tolist(),
                               b_y.tolist()):
            y = None if nan else int(yf)
            if y is not None and y > thr_fp:
                if not open_:
                    n_started += 1
                    open_ = 1
                    ep_start, ep_n, ep_peak, ep_exc = us, 0, y, 0
                ep_end = us
                ep_n += 1
                ep_peak = max(ep_peak, y)
                ep_exc += y - thr_fp
            elif open_:
                closed.append((n_started, ep_start, ep_end, ep_n,
                               ep_peak, ep_exc))
                open_ = 0
        state.update((int(b_ts[-1]), str(b_ids[-1]), int(n_started),
                      int(open_), int(ep_start), int(ep_end),
                      int(ep_n), int(ep_peak), int(ep_exc)))
        if closed:
            yield pd.DataFrame({
                "source": key[0],
                "episode": np.array([c[0] for c in closed], "int64"),
                "t_start": np.array([c[1] for c in closed],
                                    "int64").astype("datetime64[us]"),
                "t_end": np.array([c[2] for c in closed],
                                  "int64").astype("datetime64[us]"),
                "n_pts": np.array([c[3] for c in closed], "int64"),
                "duration_s": np.array(
                    [(c[2] - c[1]) / 1e6 for c in closed], "float64"),
                "peak": np.array([c[4] / vs for c in closed], "float64"),
                "excess": np.array([c[5] / vs for c in closed],
                                   "float64"),
            })

    return fn


def stream_threshold_episodes(
    spark: SparkSession,
    input_path: str,
    threshold: float,
    value_col: str = "n_tok",
    ident_col: str = "doc_id",
    value_scale: int = 1000,
    max_files_per_trigger: int = 64,
) -> DataFrame:
    """Streaming threshold-excursion episodes over the sequence drop
    dir: closed breach episodes land as they close (the alerting
    shape — a postmortem row exists the moment the series recovers),
    bit-identical to batch ``threshold_episodes`` minus each series'
    trailing still-open episode (parity-tested across micro-batch
    boundaries)."""
    stream = (
        spark.readStream.schema(SEQUENCE_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_path)
        .select(
            "source", F.col("ts").cast("timestamp").alias("ts"),
            F.col(ident_col).cast("string").alias("ident"),
            F.col(value_col).cast("double").alias("value"),
        )
    )
    return stream.groupBy("source").applyInPandasWithState(
        make_episode_state_func(threshold, value_scale=value_scale),
        outputStructType=EPISODE_OUTPUT_SCHEMA,
        stateStructType=EPISODE_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
