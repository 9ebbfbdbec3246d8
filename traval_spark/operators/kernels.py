"""Per-series Arrow-batched pandas kernels.

Only two rule families genuinely resist window/join formulations
(SURVEY.md §7.1 step 5):

- greedy offset-jump pairing (/root/reference/traval/rulelib.py:334-371) —
  order-dependent state within a series;
- pandas time-interpolation onto manual-obs times with nearest-distance
  masking (/root/reference/traval/rulelib.py:661-777) — kept as a pandas
  kernel for bit-exact ``interpolate(method='time')``/``reindex`` edge
  behavior.

Both run via ``applyInPandas``/``cogroup().applyInPandas`` grouped by
``series_id``: Arrow batch transfer, one pandas call per series group,
fully parallel across series, never parallel within one (order matters).
The kernels return only (series_id, ts, result cols) and are joined back
to the wide step table on the co-partitioned (series_id, ts) key.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pyspark.sql.types import DoubleType, IntegerType, StructField, StructType

from traval_spark.codes import CorrectionCode
from traval_spark.functions.ts import SID, TS, ensure_ntz


def _find_offset_periods(
    jumps: pd.Series, search_method: str, updown_diff: float
) -> list:
    """Greedily pair up/down jumps; returns flat [start, end, start, end...].

    Semantics of /root/reference/traval/rulelib.py:330-371: iterate jumps in
    time order; for each unmatched jump dh, candidates are all other
    unmatched jumps; 'match' picks the candidate minimizing |cand + dh|
    (accepted iff <= updown_diff), 'time' picks the first candidate in time
    order with |cand + dh| <= updown_diff.

    Vectorized per step (boolean candidate mask + argmin/argmax over the
    float adds, both first-hit-in-time-order like the reference's
    ``idxmin``/``.index[0]``): O(j²) cheap numpy ops instead of the
    reference's O(j² log j) index-difference rebuilds — same pairs
    bit-for-bit (float64 adds identical; exactness pinned by
    tests/test_rules.py and the recursive-CTE oracle).
    """
    if search_method not in ("match", "time"):
        raise ValueError(f"Unknown search_method: {search_method}")
    idx = jumps.index  # time-sorted, unique (reference model)
    dh = jumps.to_numpy(dtype=float)
    n = len(dh)
    unmatched = np.ones(n, dtype=bool)
    periods: list = []
    for i in range(n):
        if not unmatched[i]:
            continue
        cand = unmatched.copy()
        cand[i] = False
        if not cand.any():
            continue
        absdiff = np.abs(dh + dh[i])
        if search_method == "match":
            masked = np.where(cand, absdiff, np.inf)
            best = int(np.argmin(masked))  # first min in time order
            if masked[best] <= updown_diff:
                periods += [idx[i], idx[best]]
                unmatched[i] = unmatched[best] = False
        else:  # "time": first candidate within tolerance
            ok = cand & (absdiff <= updown_diff)
            if ok.any():
                first = int(np.argmax(ok))
                periods += [idx[i], idx[first]]
                unmatched[i] = unmatched[first] = False
    return periods


def _offset_kernel(
    pdf: pd.DataFrame,
    value_col: str,
    threshold: float,
    updown_diff: float,
    max_gap: str,
    search_method: str,
) -> pd.DataFrame:
    """Offset detection for ONE series (rulelib.py:265-399 semantics)."""
    pdf = pdf.sort_values(TS)
    ts = pd.DatetimeIndex(pdf[TS])
    vals = pdf[value_col].to_numpy(dtype=float)

    # gap-aware first difference (ts_utils.py:264-287)
    diff = np.diff(vals, prepend=np.nan)
    if len(ts) > 1:
        gaps = (ts[1:] - ts[:-1]) > pd.Timedelta(max_gap)
        diff[1:][np.asarray(gaps)] = np.nan

    d = pd.Series(diff, index=ts)
    up = d[(d >= threshold)].dropna()
    down = d[(d <= -threshold)].dropna()
    jumps = pd.concat([up, down]).sort_index()

    code = np.zeros(len(ts), dtype=np.int32)
    if len(jumps) > 1:
        periods = _find_offset_periods(jumps, search_method, updown_diff)
    elif len(jumps) == 1:
        # single jump: flag from the jump to the end of the series
        # (rulelib.py:372-381)
        periods = [jumps.index[0], ts[-1]]
    else:
        periods = []

    for j in range(0, len(periods), 2):
        start = periods[j]
        end = periods[j + 1] - pd.Timedelta(seconds=30)
        # pandas .loc[start:end] slice: inclusive both ends, empty if
        # end < start (rulelib.py:392-395)
        sel = (ts >= start) & (ts <= end)
        code[sel] = int(CorrectionCode.UNKNOWN_COMPARISON_VALUE)

    return pd.DataFrame(
        {
            SID: pdf[SID].to_numpy(),
            TS: pdf[TS].to_numpy(),
            "code": code,
            "sval": np.full(len(ts), np.nan),  # reference keeps NaN svals
            "cval": np.full(len(ts), np.nan),  # (rulelib.py:384-391)
        }
    )


def apply_offset_detection(
    df: DataFrame,
    in_col: str,
    out: str,
    *,
    threshold: float,
    updown_diff: float,
    max_gap: str,
    search_method: str,
) -> DataFrame:
    """Run the offset kernel per series.

    The full row payload rides through the kernel (dynamic output schema =
    input schema + corrections columns) so no join-back is needed — the
    groupBy(series_id) shuffle is the only data movement.
    """
    df = ensure_ntz(df)
    schema = StructType(
        list(df.schema.fields)
        + [
            StructField(f"{out}_code", IntegerType()),
            StructField(f"{out}_sval", DoubleType()),
            StructField(f"{out}_cval", DoubleType()),
        ]
    )

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        corr = _offset_kernel(
            pdf.assign(__v=pdf[in_col].astype(float)),
            "__v", threshold, updown_diff, max_gap, search_method,
        )
        pdf = pdf.sort_values(TS)
        pdf[f"{out}_code"] = corr["code"].to_numpy()
        pdf[f"{out}_sval"] = corr["sval"].to_numpy()
        pdf[f"{out}_cval"] = corr["cval"].to_numpy()
        return pdf

    return df.groupBy(SID).applyInPandas(run, schema=schema)


# ---------------------------------------------------------------------------
# manual-observation kernels (rules 15/16)
# ---------------------------------------------------------------------------


def _manual_obs_diff(
    s: pd.Series,
    manual: pd.Series,
    method: str,
    max_dt: str,
    reset_dates=None,
) -> pd.Series:
    """Interpolated (manual - series) diff on the full series index.

    Shared machinery of rulelib.py:661-704 and 707-777: time-interpolate
    the series onto manual-obs times, keep diffs within max_dt of a series
    observation, optionally zero at reset dates, then re-interpolate the
    sparse diffs to the full index (linear or reindex-fill) with NaN->0.
    """
    max_dt_s = pd.Timedelta(max_dt) / pd.Timedelta("1s")
    nearest = s.index.get_indexer(manual.index, method="nearest")
    within = (
        np.abs((s.index[nearest] - manual.index).total_seconds()) <= max_dt_s
    )

    union_idx = s.index.join(manual.index, how="outer")
    s_at_manual = s.reindex(union_idx).interpolate(method="time").loc[manual.index]
    diff = manual - s_at_manual
    diff = diff.loc[within]

    if reset_dates is not None:
        for d in reset_dates:
            diff.loc[pd.Timestamp(d)] = 0.0

    if method == "linear":
        full = (
            diff.reindex(s.index.join(diff.index, how="outer"))
            .interpolate(method="linear")
            .fillna(0.0)
        )
    else:
        full = diff.reindex(s.index, method=method).fillna(0.0)
    return full.loc[s.index]


def apply_manual_obs_kernel(
    df: DataFrame,
    in_col: str,
    out: str,
    *,
    manual_obs: DataFrame,
    mode: str,
    threshold: float = 0.05,
    method: str = "linear",
    max_dt: str = "1D",
    reset_dates=None,
) -> DataFrame:
    """Cogrouped kernel for rule_compare_to_manual_obs / rule_shift_to_manual_obs.

    mode='compare': corrections on the diff series, codes +/-2 beyond
    +/-threshold (rulelib.py:695-704).
    mode='shift': emits the reference's return value (the adjusted series,
    rulelib.py:775-777) as the additive correction column.
    """
    df = ensure_ntz(df)
    aux = ensure_ntz(manual_obs).select(
        SID, TS, F.col("value").cast("double").alias("__m")
    )

    extra = (
        [
            StructField(f"{out}_code", IntegerType()),
            StructField(f"{out}_sval", DoubleType()),
            StructField(f"{out}_cval", DoubleType()),
        ]
        if mode == "compare"
        else [StructField(f"{out}_corr", DoubleType())]
    )
    schema = StructType(list(df.schema.fields) + extra)

    def run(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        left = left.sort_values(TS)
        s = pd.Series(
            left[in_col].to_numpy(dtype=float), index=pd.DatetimeIndex(left[TS])
        )
        right = right.sort_values(TS)
        manual = pd.Series(
            right["__m"].to_numpy(dtype=float), index=pd.DatetimeIndex(right[TS])
        )
        n = len(s)
        if manual.empty or s.empty:
            if mode == "compare":
                left[f"{out}_code"] = np.zeros(n, dtype=np.int32)
                left[f"{out}_sval"] = np.full(n, np.nan)
                left[f"{out}_cval"] = np.full(n, np.nan)
            else:
                left[f"{out}_corr"] = s.to_numpy()
            return left

        d = _manual_obs_diff(s, manual, method, max_dt, reset_dates)
        if mode == "compare":
            above = (d > threshold).to_numpy()
            below = (d < -threshold).to_numpy()
            code = np.zeros(n, dtype=np.int32)
            code[above] = int(CorrectionCode.ABOVE_THRESHOLD)
            code[below] = int(CorrectionCode.BELOW_THRESHOLD)
            left[f"{out}_code"] = code
            left[f"{out}_sval"] = np.where(above | below, d.to_numpy(), np.nan)
            left[f"{out}_cval"] = np.where(
                above, threshold, np.where(below, -threshold, np.nan)
            )
        else:
            # shift mode: reference returns adjusted = series + diff
            left[f"{out}_corr"] = (s + d).to_numpy()
        return left

    return (
        df.groupBy(SID)
        .cogroup(aux.groupBy(SID))
        .applyInPandas(run, schema=schema)
    )


# ---------------------------------------------------------------------------
# chunked rolling time-window statistics (hampel / flat_signal hot path)
# ---------------------------------------------------------------------------

#: supported rolling statistics (all skip NULL/NaN values, like Spark
#: window aggregates): median/count/std are single-stage, mad is two-stage
#: (median of |v - rolling_median| over the same trailing window)
ROLLING_STATS = ("median", "mad", "std", "count")


def rolling_time_stats(
    df: DataFrame,
    in_col: str,
    window: str,
    stats: dict[str, str],
    chunk: str | None = None,
) -> DataFrame:
    """Trailing time-window rolling stats as a chunked pandas kernel.

    Exact replacement for ``F.percentile/stddev_samp/count`` over a
    ``rangeBetween(-(window_us - 1), 0)`` frame — Spark evaluates
    non-incremental aggregates over bounded frames by *recomputing the
    frame per row* (O(n*w) per series, the round-1 hampel bottleneck),
    while pandas' skiplist rolling kernels are O(n log w) and the
    (series, time-chunk) grouping parallelizes within hot series.

    ``stats`` maps new column names to one of ``ROLLING_STATS``. The pandas
    window is ``(t - window, t]`` (closed='right'), identical to the
    microsecond-quantized Spark range frame; NaN values are skipped by
    pandas rolling aggregations exactly as Spark aggregates skip NULLs
    (asserted by test_rolling_kernel_equals_window).

    ``chunk``: evaluate per (series, time-chunk) with a trailing halo of
    duplicated history rows — EXACT for trailing windows because a row's
    window never reaches further back than the halo: ``window`` for
    single-stage stats, ``2 * window`` when ``mad`` is requested (the
    deviations feeding an output row's MAD window need their OWN full
    median window). Requires chunk >= halo. With chunk=None the kernel
    runs once per series (still O(n log w), no extra parallelism).

    Precondition: at most one row per (series_id, ts) — pandas variable
    windows end at the current *position* while Spark RANGE frames include
    all equal-ts peers. Holds for the engine's long-frame model (one
    reference pd.Series point per timestamp).
    """
    for stat in stats.values():
        if stat not in ROLLING_STATS:
            raise ValueError(f"unknown rolling stat: {stat}")
    from traval_spark.functions.ts import CHUNK, HALO, gap_micros, with_chunks

    df = ensure_ntz(df)
    two_stage = "mad" in stats.values()
    win_td = pd.Timedelta(window)

    group_cols = [SID]
    chunked = chunk is not None
    if chunked:
        halo_us = gap_micros(window) * (2 if two_stage else 1)
        halo = f"{halo_us}us"
        if gap_micros(chunk) < halo_us:
            raise ValueError(
                f"chunk ({chunk}) must be >= halo ({halo}) for window {window}"
            )
        df = with_chunks(df, chunk, halo, trailing_only=True)
        group_cols = [SID, CHUNK]

    out_fields = [StructField(name, DoubleType()) for name in stats]
    schema = StructType(list(df.schema.fields) + out_fields)

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(TS, kind="mergesort")
        s = pd.Series(
            pdf[in_col].to_numpy(dtype=float), index=pd.DatetimeIndex(pdf[TS])
        )
        r = s.rolling(win_td, closed="right")
        med = None
        if two_stage or "median" in stats.values():
            med = r.quantile(0.5, interpolation="linear")
        for name, stat in stats.items():
            if stat == "median":
                vals = med
            elif stat == "count":
                vals = r.count()
            elif stat == "std":
                vals = r.std(ddof=1)
            else:  # mad
                dev = (s - med).abs()
                vals = dev.rolling(win_td, closed="right").quantile(
                    0.5, interpolation="linear"
                )
            pdf[name] = vals.to_numpy()
        return pdf

    out = df.groupBy(*group_cols).applyInPandas(run, schema=schema)
    if chunked:
        out = out.filter(~F.col(HALO)).drop(CHUNK, HALO)
    return out
