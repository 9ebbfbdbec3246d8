"""Detection / adjustment / combination rules as Spark plans.

Each rule re-expresses one reference rule
(/root/reference/traval/rulelib.py) as declarative DataFrame operations:
window lag/lead for diffs, unbounded windows for per-series scalars,
range-frame windows for time-based rolling stats, broadcast as-of joins
for sparse aux series. Only the order-dependent greedy kernel
(rule_offset_detection) and exact pandas-interpolation rules run as
Arrow-batched ``applyInPandas`` kernels (see operators/kernels.py).

Contract (mirrors /root/reference/traval/ruleset.py:94-100, 305-367):

- ``code`` rules add ``{out}_code``/``{out}_sval``/``{out}_cval`` columns;
  the executor computes ``step_i = when(code==0, step_in)`` (NULL = flagged).
- ``series`` rules add ``{out}_corr``; the executor computes
  ``step_i = step_in + corr`` with NULL propagation.
- ``direct`` (multi-input combine) rules add ``{out}_res`` which *is*
  the next step.

Rules operate on the canonical long frame (series_id, ts, <value cols>).
Numeric parameters accept floats or Columns (per-series parameters join
in via a broadcast params table, see plans/params.py). Sparse aux series
are DataFrames with columns (series_id, ts, value).
"""

from __future__ import annotations

from typing import Callable

import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from traval_spark.codes import CorrectionCode
from traval_spark.functions.masks import mask_above_below, mask_corrections
from traval_spark.functions.ts import (
    HALO,
    SID,
    TS,
    US,
    align_interpolate_specs,
    align_resample_ffill_bfill,
    chunked_series_window,
    diff_with_gap_awareness,
    ensure_ntz,
    gap_micros,
    positional_interpolate_specs,
    series_window,
    shift_series_forward_backward,
    unix_us,
    with_chunks,
)

CODE = "code"
SERIES = "series"
DIRECT = "direct"

#: registry: rule name -> (callable, kind); populated by @_register
RULES: dict[str, tuple[Callable, str]] = {}


def _register(kind: str):
    def deco(fn):
        RULES[fn.__name__] = (fn, kind)
        return fn

    return deco


def _lit(v) -> Column:
    return v if isinstance(v, Column) else F.lit(float(v))


# ---------------------------------------------------------------------------
# ufunc dispatch — rulelib.py:25-33. ufuncs are passed by *name* here
# ("greater", "less", "greater_equal", "less_equal", "equal", "not_equal"),
# matching the reference's JSON serialization of numpy ufuncs
# (/root/reference/traval/ruleset.py:49-59).
# ---------------------------------------------------------------------------

_UFUNCS: dict[str, Callable[[Column, Column], Column]] = {
    "greater": lambda a, b: a > b,
    "greater_equal": lambda a, b: a >= b,
    "less": lambda a, b: a < b,
    "less_equal": lambda a, b: a <= b,
    "equal": lambda a, b: a == b,
    "not_equal": lambda a, b: a != b,
}


def _ufunc_name(ufunc) -> str:
    """Accept a name, a (name,) tuple, or a numpy ufunc (by __name__)."""
    if isinstance(ufunc, (tuple, list)):
        ufunc = ufunc[0]
    return ufunc if isinstance(ufunc, str) else ufunc.__name__


def _ufunc_code(name: str) -> int:
    """Dispatch ufunc name -> correction code (rulelib.py:25-33)."""
    if "greater" in name:
        return int(CorrectionCode.ABOVE_THRESHOLD)
    if "less" in name:
        return int(CorrectionCode.BELOW_THRESHOLD)
    if name == "equal":
        return int(CorrectionCode.EQUAL_VALUE)
    return int(CorrectionCode.NOT_EQUAL_VALUE)


# ---------------------------------------------------------------------------
# threshold rules
# ---------------------------------------------------------------------------


@_register(CODE)
def rule_ufunc_threshold(
    df: DataFrame, in_col: str, out: str, *, ufunc, threshold, offset=0.0
) -> DataFrame:
    """Flag where ``ufunc(value, threshold + offset)`` (rulelib.py:112-150).

    ``threshold`` may be a float, a Column (per-series parameter), or a
    sparse aux DataFrame(series_id, ts, value) which is first resampled to
    the series index with ffill+bfill placement semantics
    (ts_utils.py:234-261) — an as-of alignment, not a Python loop.
    """
    name = _ufunc_name(ufunc)
    cmp_fn = _UFUNCS[name]
    helper = None
    if isinstance(threshold, DataFrame):
        helper = f"{out}_thr"
        df = align_resample_ffill_bfill(df, threshold, "value", helper)
        thr = F.col(helper) + _lit(offset)
    else:
        thr = _lit(threshold) + _lit(offset)
    mask = cmp_fn(F.col(in_col), thr)
    df = mask_corrections(df, in_col, out, mask, _ufunc_code(name), cval=thr)
    # drop the join helper so it never rides through the wide step table
    return df.drop(helper) if helper else df


@_register(CODE)
def rule_hardmax(df, in_col, out, *, threshold, offset=0.0):
    """Flag values greater than threshold (rulelib.py:102-104)."""
    return rule_ufunc_threshold(
        df, in_col, out, ufunc="greater", threshold=threshold, offset=offset
    )


@_register(CODE)
def rule_hardmin(df, in_col, out, *, threshold, offset=0.0):
    """Flag values lower than threshold (rulelib.py:107-109)."""
    return rule_ufunc_threshold(
        df, in_col, out, ufunc="less", threshold=threshold, offset=offset
    )


@_register(CODE)
def rule_max_gradient(df, in_col, out, *, max_step=0.5, max_timestep="1D"):
    """Flag where gradient between consecutive obs exceeds max_step.

    rulelib.py:67-99: grad = diff(v) / diff(t_seconds) * conversion where
    conversion = max_timestep in seconds. Negative max_step flags negative
    gradients. Pure lag-window expressions.
    """
    conversion = pd.Timedelta(max_timestep) / pd.Timedelta("1s")
    w = series_window()
    dv = F.col(in_col) - F.lag(F.col(in_col)).over(w)
    dt_s = (
        unix_us(TS) - unix_us(F.lag(F.col(TS)).over(w))
    ).cast("double") / F.lit(float(US))
    grad = dv / dt_s * F.lit(float(conversion))
    ms = _lit(max_step)
    if isinstance(max_step, Column):
        # per-series max_step: the sign (and thus the rule branch,
        # rulelib.py:90-98) must be decided row-wise in-expression
        mask = F.when(ms > 0.0, grad > ms).otherwise(grad < -ms)
        code = F.when(
            ms > 0.0, F.lit(int(CorrectionCode.ABOVE_THRESHOLD))
        ).otherwise(F.lit(int(CorrectionCode.BELOW_THRESHOLD)))
        return mask_corrections(df, in_col, out, mask, code, cval=ms)
    if max_step > 0.0:
        mask = grad > ms
        return mask_corrections(
            df, in_col, out, mask, int(CorrectionCode.ABOVE_THRESHOLD),
            cval=ms,
        )
    mask = grad < -ms
    return mask_corrections(
        df, in_col, out, mask, int(CorrectionCode.BELOW_THRESHOLD),
        cval=ms,
    )


@_register(CODE)
def rule_diff_ufunc_threshold(
    df, in_col, out, *, ufunc, threshold, max_gap="7D", chunk=None
):
    """Gap-aware diff compared against a threshold (rulelib.py:153-190).

    ``chunk``: exact skew-safe chunked evaluation (see rule_spike_detection).
    """
    name = _ufunc_name(ufunc)
    if chunk is not None:
        df = with_chunks(df, chunk, max_gap)
        diff = diff_with_gap_awareness(df, in_col, max_gap,
                                       w=chunked_series_window())
    else:
        diff = diff_with_gap_awareness(df, in_col, max_gap)
    mask = _UFUNCS[name](diff, _lit(threshold))
    df = mask_corrections(
        df, in_col, out, mask, _ufunc_code(name), cval=_lit(threshold)
    )
    if chunk is not None:
        from traval_spark.functions.ts import CHUNK

        df = df.filter(~F.col(HALO)).drop(CHUNK, HALO)
    return df


@_register(CODE)
def rule_other_ufunc_threshold(
    df, in_col, out, *, other: DataFrame, ufunc, threshold
):
    """Flag timestamps where *another* series violates a threshold.

    rulelib.py:193-228: the mask is evaluated on the other series, the
    corrections carry the OTHER series' values (``_ufunc_corrections``
    receives ``other_values``), restricted to timestamps present in both.
    Broadcast left join on (series_id, ts).
    """
    name = _ufunc_name(ufunc)
    df = ensure_ntz(df)
    oth = ensure_ntz(other).select(
        F.col(SID), F.col(TS), F.col("value").alias(f"{out}_other")
    )
    df = df.join(F.broadcast(oth), on=[SID, TS], how="left")
    ov = F.col(f"{out}_other")
    mask = ov.isNotNull() & _UFUNCS[name](ov, _lit(threshold))
    df = mask_corrections(
        df, f"{out}_other", out, mask, _ufunc_code(name), cval=_lit(threshold)
    )
    return df.drop(f"{out}_other")


# ---------------------------------------------------------------------------
# diff / spike / offset rules
# ---------------------------------------------------------------------------


@_register(CODE)
def rule_spike_detection(
    df, in_col, out, *, threshold=0.15, spike_tol=0.15, max_gap="7D",
    chunk=None,
):
    """Flag 1-timestep spikes (rulelib.py:231-262 + ts_utils.py:290-340).

    Derivation: with gap-aware diff d_i, up-diff du = d where d >= 0 else
    NULL, down-diff dd = d where d <= 0 else NULL:

    - up-spike at i  iff |du_i + dd_{i+1}| <= spike_tol and d_i >  threshold
    - down-spike at i iff |dd_i + du_{i+1}| <= spike_tol and d_i < -threshold

    The reference's positional trim (ts_utils.py:328-331, iloc[1:-1] with
    values[2:]) is implicit here: d_0 is NULL (no lag) and lead() is NULL on
    the last row, and NULL propagates through the sums.

    ``chunk`` (e.g. "1d", must be >= max_gap): evaluate per
    (series, time-chunk) with a max_gap halo — exact (gap-aware diffs
    cannot see past max_gap) and immune to hot-series skew (SURVEY.md §4.2).
    """
    if chunk is not None:
        df = with_chunks(df, chunk, max_gap)
        w = chunked_series_window()
    else:
        w = series_window()
    d = diff_with_gap_awareness(df, in_col, max_gap, w=w)
    df = df.withColumn(f"{out}_d", d)
    dcol = F.col(f"{out}_d")
    du = F.when(dcol < 0.0, F.lit(None)).otherwise(dcol)  # keeps d >= 0 and NULL
    dd = F.when(dcol > 0.0, F.lit(None)).otherwise(dcol)  # keeps d <= 0 and NULL
    df = df.withColumn(f"{out}_du", du).withColumn(f"{out}_dd", dd)
    du_next = F.lead(F.col(f"{out}_du")).over(w)
    dd_next = F.lead(F.col(f"{out}_dd")).over(w)
    spike_up = F.abs(F.col(f"{out}_du") + dd_next)
    spike_down = F.abs(F.col(f"{out}_dd") + du_next)
    up = (spike_up <= _lit(spike_tol)) & (dcol > _lit(threshold))
    down = (spike_down <= _lit(spike_tol)) & (dcol < -_lit(threshold))
    mask = F.coalesce(up, F.lit(False)) | F.coalesce(down, F.lit(False))
    df = mask_corrections(
        df, in_col, out, mask, int(CorrectionCode.UNKNOWN_COMPARISON_VALUE)
    )
    df = df.drop(f"{out}_d", f"{out}_du", f"{out}_dd")
    if chunk is not None:
        from traval_spark.functions.ts import CHUNK

        df = df.filter(~F.col(HALO)).drop(CHUNK, HALO)
    return df


@_register(CODE)
def rule_offset_detection(
    df,
    in_col,
    out,
    *,
    threshold=0.15,
    updown_diff=0.1,
    max_gap="7D",
    search_method="time",
):
    """Detect offset periods via greedy jump pairing (rulelib.py:265-399).

    The pairing loop is inherently sequential per series, so it runs as an
    Arrow-batched per-series pandas kernel inside ``applyInPandas``
    (SURVEY.md §2.2 rule 8); never parallelized within a series, fully
    parallel across series.
    """
    from traval_spark.operators.kernels import apply_offset_detection

    return apply_offset_detection(
        df,
        in_col,
        out,
        threshold=threshold,
        updown_diff=updown_diff,
        max_gap=max_gap,
        search_method=search_method,
    )


# ---------------------------------------------------------------------------
# sigma / bandwidth rules
# ---------------------------------------------------------------------------

def _w_unbounded() -> Window:
    """Whole-series window: per-series scalar broadcast (mean/std/quantile)."""
    return Window.partitionBy(SID).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )


@_register(CODE)
def rule_outside_n_sigma(df, in_col, out, *, n=2.0, via_join=False):
    """Flag outside mean +/- n*std over the whole series (rulelib.py:402-430).

    Default: per-series scalars via unbounded windows (stddev_samp, ddof=1,
    matches pandas ``Series.std()``) — one pass, but the window forces a
    full sort-by-series that a hot series serializes.

    via_join=True: the 100TB path — groupBy(series).agg(avg, stddev) then a
    broadcast join back. Aggregation does map-side partial combine, so the
    hot series never concentrates on one task; the per-series stats table
    is tiny and broadcasts. Same values (test_nsigma_via_join_equal);
    trade-off is a second scan of the input lineage.
    """
    if via_join:
        stats = df.groupBy(SID).agg(
            F.avg(F.col(in_col)).alias(f"{out}_mean"),
            F.stddev_samp(F.col(in_col)).alias(f"{out}_std"),
        )
        df = df.join(F.broadcast(stats), on=SID, how="left")
        mean = F.col(f"{out}_mean")
        std = F.col(f"{out}_std")
    else:
        mean = F.avg(F.col(in_col)).over(_w_unbounded())
        std = F.stddev_samp(F.col(in_col)).over(_w_unbounded())
    thr_above = mean + _lit(n) * std
    thr_below = mean - _lit(n) * std
    df = mask_above_below(
        df, in_col, out,
        F.col(in_col) > thr_above, thr_above,
        F.col(in_col) < thr_below, thr_below,
    )
    if via_join:
        df = df.drop(f"{out}_mean", f"{out}_std")
    return df


@_register(CODE)
def rule_diff_outside_of_n_sigma(df, in_col, out, *, n=2.0, max_gap="7D"):
    """Flag where |gap-aware diff| > n*std(diff) (rulelib.py:433-459).

    Note the reference emits the corrections on the *diff* series
    (``mask_corrections_above_threshold(diff, ...)``), so sval carries diff
    values, and the code is always ABOVE_THRESHOLD (abs comparison).
    """
    diff = diff_with_gap_awareness(df, in_col, max_gap)
    df = df.withColumn(f"{out}_diff", diff)
    nsigma = _lit(n) * F.stddev_samp(F.col(f"{out}_diff")).over(_w_unbounded())
    mask = F.abs(F.col(f"{out}_diff")) > nsigma
    df = mask_corrections(
        df, f"{out}_diff", out, mask, int(CorrectionCode.ABOVE_THRESHOLD),
        cval=nsigma,
    )
    return df.drop(f"{out}_diff")


@_register(CODE)
def rule_outside_bandwidth(
    df, in_col, out, *,
    lowerbound: DataFrame | None = None,
    upperbound: DataFrame | None = None,
    bounds: DataFrame | None = None,
):
    """Flag outside [lower, upper] bound series (rulelib.py:462-491).

    Bounds sparser than the series are linearly interpolated to the series
    index with np.interp hull semantics (ts_utils.py:368-388) — expressed
    as prev/next-bound windows + linear weight, no Python.

    Two call shapes, both ONE union + one window pass over the series:

    - ``lowerbound=`` / ``upperbound=``: separate (series_id, ts, value)
      frames, the reference's signature — each becomes its own union leg.
    - ``bounds=``: a single joint frame (series_id, ts, lower, upper) —
      the bounds plan executes exactly once (the round-2 shape ran two
      separate alignment passes, re-executing a shared bounds subtree
      twice). A NULL in one column means that bound has no observation at
      that timestamp (interpolated across per column).
    """
    if bounds is not None:
        specs = [(bounds, [("lower", f"{out}_lb"), ("upper", f"{out}_ub")])]
    else:
        if lowerbound is None or upperbound is None:
            raise ValueError(
                "pass either bounds= or both lowerbound= and upperbound="
            )
        specs = [
            (lowerbound, [("value", f"{out}_lb")]),
            (upperbound, [("value", f"{out}_ub")]),
        ]
    df = align_interpolate_specs(df, specs)
    df = mask_above_below(
        df, in_col, out,
        F.col(in_col) > F.col(f"{out}_ub"), F.col(f"{out}_ub"),
        F.col(in_col) < F.col(f"{out}_lb"), F.col(f"{out}_lb"),
    )
    return df.drop(f"{out}_lb", f"{out}_ub")


@_register(CODE)
def rule_flat_signal(
    df,
    in_col,
    out,
    *,
    window,
    min_obs,
    std_threshold=7.5e-3,
    qbelow=None,
    qabove=None,
    hbelow=None,
    habove=None,
    chunk=None,
    via_join=False,
):
    """Flag flat/dead signal stretches (rulelib.py:867-941).

    pandas ``rolling("{window}D", min_periods=min_obs).std()`` over the
    non-NaN subset maps to a per-series range-frame window over unix
    microseconds with the pandas left-open interval (t-window, t]:
    rangeBetween(-(window*86400e6 - 1), 0). stddev_samp/count/percentile
    ignore NULLs, so computing over all rows equals the dropna() subset.
    Quantile gates use exact ``percentile`` (pandas-default linear
    interpolation), never approx_percentile (SURVEY.md §4.2).

    ``chunk`` (e.g. "4D", must be >= window): compute the rolling std/count
    via the chunked pandas rolling kernel instead of a Spark range frame —
    Spark recomputes bounded-frame aggregates per row (O(n*w) per series),
    the kernel is O(n log w) and parallel within hot series. Exact
    (test_flat_signal_chunked_equals_window); the unbounded quantile gates
    stay as window expressions either way unless ``via_join``.

    ``via_join=True``: the 100 TB path for the qbelow/qabove gates —
    ``percentile`` over an UNBOUNDED window buffers every series value
    in the per-row frame evaluator (a single giant series is a per-task
    memory hazard), so instead compute the per-series quantiles with a
    groupBy-agg (TypedImperativeAggregate with map-side partial merge)
    and broadcast-join the tiny per-series table back — the same
    trade :func:`rule_outside_n_sigma` exposes. Values identical
    (exact percentile either way; test_flat_signal_via_join_equal).
    """
    v = F.col(in_col)
    # quantile-gate source frame captured BEFORE the chunked kernel:
    # aggregating over the post-kernel df would execute the expensive
    # applyInPandas rolling kernel a second time inside the qstats
    # subtree (the quantiles only need the untouched SID/in_col columns)
    qsrc = df
    if chunk is not None:
        from traval_spark.operators.kernels import rolling_time_stats

        df = rolling_time_stats(
            df, in_col, f"{int(window)}D",
            {f"{out}_rstd": "std", f"{out}_rcnt": "count"}, chunk=chunk,
        )
        roll_std = F.col(f"{out}_rstd")
        roll_cnt = F.col(f"{out}_rcnt")
    else:
        win_us = int(window) * 86400 * US - 1
        w_range = (
            Window.partitionBy(SID)
            .orderBy(unix_us(TS))
            .rangeBetween(-win_us, 0)
        )
        roll_std = F.stddev_samp(v).over(w_range)
        roll_cnt = F.count(v).over(w_range)
    stdmask = (roll_cnt >= F.lit(int(min_obs))) & (roll_std < _lit(std_threshold))

    qaggs = {}
    if qbelow is not None:
        qaggs[f"{out}_qb"] = F.percentile(v, F.lit(float(qbelow)))
    if qabove is not None:
        qaggs[f"{out}_qa"] = F.percentile(v, F.lit(float(qabove)))
    if via_join and qaggs:
        qstats = qsrc.groupBy(SID).agg(
            *[agg.alias(name) for name, agg in qaggs.items()]
        )
        df = df.join(F.broadcast(qstats), on=SID, how="left")
        qref = {name: F.col(name) for name in qaggs}
    else:
        qref = {name: agg.over(_w_unbounded()) for name, agg in qaggs.items()}

    if qabove is None and qbelow is not None:
        qmask = v < qref[f"{out}_qb"]
    elif qabove is not None and qbelow is None:
        qmask = v > qref[f"{out}_qa"]
    elif qabove is not None and qbelow is not None:
        qmask = (v > qref[f"{out}_qa"]) | (v < qref[f"{out}_qb"])
    else:
        qmask = F.lit(True)

    if habove is None and hbelow is not None:
        hmask = v < _lit(hbelow)
    elif habove is not None and hbelow is None:
        hmask = v > _lit(habove)
    elif habove is not None and hbelow is not None:
        hmask = (v > _lit(habove)) | (v < _lit(hbelow))
    else:
        hmask = F.lit(True)

    mask = v.isNotNull() & F.coalesce(stdmask & qmask & hmask, F.lit(False))
    df = mask_corrections(
        df, in_col, out, mask, int(CorrectionCode.UNKNOWN_COMPARISON_VALUE)
    )
    if chunk is not None:
        df = df.drop(f"{out}_rstd", f"{out}_rcnt")
    if via_join and qaggs:
        df = df.drop(*qaggs.keys())
    return df


@_register(CODE)
def rule_hampel(
    df, in_col, out, *, window="1D", k=3.0, min_obs=3, chunk=None,
):
    """Hampel filter: flag |v - rolling_median| > k * 1.4826 * rolling_MAD.

    Not in the reference library (the north_star names it alongside
    flat-line filtering); standard two-stage streaming formulation:
    med_i = median over the trailing time window, dev_i = |v_i - med_i|,
    MAD_i = median of dev over the same window (deviations are taken
    against each point's own window median — the usual vectorized
    approximation of the textbook filter). 1.4826 is the Gaussian
    consistency constant. Exact percentiles (never approx), left-open
    pandas-style time window, needs >= min_obs points.

    ``chunk`` (e.g. "4D", must be >= 2*window): the scale path. Spark
    evaluates ``percentile`` over a bounded frame by recomputing per row —
    O(n*w) per series, TWICE here (median then MAD) — and a hot series
    runs its whole window on one task. The chunked pandas rolling kernel
    (operators/kernels.py:rolling_time_stats) is O(n log w) and fans each
    series across its time chunks; a 2*window trailing halo makes it exact
    (the deviations feeding an output row's MAD window need their own full
    median window — see the kernel docstring).
    """
    v = F.col(in_col)
    if chunk is not None:
        from traval_spark.operators.kernels import rolling_time_stats

        df = rolling_time_stats(
            df, in_col, window,
            {f"{out}_med": "median", f"{out}_mad": "mad", f"{out}_cnt": "count"},
            chunk=chunk,
        )
        df = df.withColumn(f"{out}_dev", F.abs(v - F.col(f"{out}_med")))
        mad = F.col(f"{out}_mad")
        cnt = F.col(f"{out}_cnt")
    else:
        win_us = gap_micros(window) - 1
        w_range = (
            Window.partitionBy(SID)
            .orderBy(unix_us(TS))
            .rangeBetween(-win_us, 0)
        )
        med = F.percentile(v, F.lit(0.5)).over(w_range)
        df = df.withColumn(f"{out}_med", med)
        df = df.withColumn(f"{out}_dev", F.abs(v - F.col(f"{out}_med")))
        mad = F.percentile(F.col(f"{out}_dev"), F.lit(0.5)).over(w_range)
        cnt = F.count(v).over(w_range)
    mask = (
        (cnt >= F.lit(int(min_obs)))
        & (F.col(f"{out}_dev") > _lit(k) * F.lit(1.4826) * mad)
    )
    df = mask_corrections(
        df, in_col, out, mask, int(CorrectionCode.UNKNOWN_COMPARISON_VALUE),
        cval=F.col(f"{out}_med"),
    )
    helpers = [f"{out}_med", f"{out}_dev"]
    if chunk is not None:
        helpers += [f"{out}_mad", f"{out}_cnt"]
    return df.drop(*helpers)


def pastas_prediction_interval_bounds(
    df: DataFrame, in_col: str, ml, *, ci=0.95, tmin=None, tmax=None,
    savedir=None, verbose=False,
) -> DataFrame:
    """Driver-side shim: invoke pastas model(s) per series and assemble the
    joint bounds frame (series_id, ts, lower, upper) that
    :func:`rule_pastas_outside_pi` consumes (reference rulelib.py:543-601).

    ``ml`` may be one model (applied to every series), a dict
    ``{series_id: model}``, or a callable ``series_id -> model``. Any
    object exposing ``solver.prediction_interval(alpha=, tmin=, tmax=)``
    returning a 2-column pandas frame works — the shim duck-types, so it
    needs no pastas import itself. Per the reference, a missing model, a
    model without a solver, or an empty interval yields NO bounds for that
    series (its points are never flagged); ``tmin``/``tmax`` default to
    the series' first/last valid timestamp (rulelib.py:556-561);
    ``savedir`` pickles each interval as ``pi_{model.name}.pkl``
    (rulelib.py:596-598).

    Scale note: one driver loop over SERIES (not rows) — the same
    driver-sized cardinality as the models dict the caller already holds;
    each prediction_interval call is the model's own (single-machine)
    compute. The resulting bounds frame is distributed from there on.
    """
    spans = sorted(
        df.filter(F.col(in_col).isNotNull())
        .groupBy(SID)
        .agg(F.min(TS).alias("__tmin"), F.max(TS).alias("__tmax"))
        .collect(),
        key=lambda r: r[SID],
    )  # sorted: the driver loop (and any savedir writes) is deterministic

    def _resolve(sid):
        if callable(ml) and not hasattr(ml, "solver"):
            return ml(sid)
        if isinstance(ml, dict):
            return ml.get(sid)
        return ml

    # per-series pickle names: the reference writes pi_{ml.name}.pkl for
    # its single series (rulelib.py:596-598); in the fleet loop a SHARED
    # model (or duplicate model names) would collide on that name and
    # silently keep only one series' interval — suffix the series id for
    # any name that serves more than one series
    name_counts: dict[str, int] = {}
    if savedir is not None:
        for row in spans:
            m = _resolve(row[SID])
            if m is not None and getattr(m, "solver", None) is not None:
                nm = str(getattr(m, "name", row[SID]))
                name_counts[nm] = name_counts.get(nm, 0) + 1

    frames = []
    for row in spans:
        sid = row[SID]
        model = _resolve(sid)
        if model is None or getattr(model, "solver", None) is None:
            if verbose:
                print(f"Warning: no Pastas model/solver for {sid!r}!")
            continue
        t0 = pd.Timestamp(tmin) if tmin is not None else row["__tmin"]
        t1 = pd.Timestamp(tmax) if tmax is not None else row["__tmax"]
        pi = model.solver.prediction_interval(alpha=(1 - ci), tmin=t0, tmax=t1)
        if pi.empty:
            if verbose:
                print(f"Warning: empty prediction interval for {sid!r}!")
            continue
        if savedir is not None:
            from pathlib import Path

            sd = Path(savedir)
            sd.mkdir(exist_ok=True)
            nm = str(getattr(model, "name", sid))
            fname = (f"pi_{nm}.pkl" if name_counts.get(nm, 0) <= 1
                     else f"pi_{nm}_{sid}.pkl")
            pi.to_pickle(sd / fname)
        frames.append(
            pd.DataFrame(
                {
                    SID: sid,
                    TS: pd.DatetimeIndex(pi.index).tz_localize(None)
                    if getattr(pi.index, "tz", None) is not None
                    else pd.DatetimeIndex(pi.index),
                    "lower": pi.iloc[:, 0].to_numpy(dtype=float),
                    "upper": pi.iloc[:, 1].to_numpy(dtype=float),
                }
            )
        )
    spark = df.sparkSession
    if not frames:
        schema = df.select(SID, TS).schema.add("lower", "double").add(
            "upper", "double"
        )
        return spark.createDataFrame([], schema)
    return spark.createDataFrame(pd.concat(frames, ignore_index=True))


@_register(CODE)
def rule_pastas_outside_pi(
    df, in_col, out, *, bounds: DataFrame | None = None, ml=None, ci=0.95,
    min_ci=None, smoothfreq=None, tmin=None, tmax=None, savedir=None,
    verbose=False,
):
    """Flag outside a model prediction interval (rulelib.py:494-601).

    Two entry points:

    - ``ml=`` — the reference's signature: pastas model(s) whose
      ``solver.prediction_interval(alpha=1-ci, tmin, tmax)`` is invoked
      per series on the driver (see
      :func:`pastas_prediction_interval_bounds`; dict / callable /
      single-model forms accepted, missing solver -> empty corrections
      exactly as rulelib.py:543-551). ``ci``/``savedir``/``verbose``
      apply only on this path; tmin/tmax default to each series' valid
      span (rulelib.py:556-561) and are consumed by the interval call.
    - ``bounds=`` — the cluster-native path: the PRECOMPUTED prediction
      interval as a DataFrame (series_id, ts, lower, upper); tmin/tmax
      clip it (equivalent to a shorter simulation). Precompute bounds and
      persist them when running fleets — the model loop is driver-side.

    Either way the rest of the rule is the same distributed plan:

    - ``smoothfreq``: time-shift smoothing of each bound
      (smooth_upper_bound / smooth_lower_bound semantics,
      ts_utils.py:464-475) — evaluated JOINTLY: both bounds share one
      time grid, so one 3-way shift union + pivot + interpolation frame
      covers them. Separate smooth_*_bound calls would re-execute the
      caller's bounds plan ~6x (and the widening joins ~4x more) — the
      plan-size bottleneck of round-2 benches; per-column results are
      bit-identical (same rows, same expressions).
    - ``min_ci``: per-series widening by min_ci/2 on each side when the
      MEAN interval width is below min_ci (rulelib.py:585-590) — an
      unbounded per-series window on the joint frame instead of an
      upper x lower join + broadcast-back.
    - ``tmin``/``tmax``: clip the prediction interval's time range before
      smoothing/widening — the adapter-side equivalent of the reference
      passing tmin/tmax into ``ml.solver.prediction_interval``
      (rulelib.py:556-561); series points outside the clipped hull get no
      bounds and are never flagged, exactly as with a shorter simulation.
    - delegation to :func:`rule_outside_bandwidth` (rulelib.py:592) via
      its joint ``bounds=`` path — the whole adapter executes the caller's
      bounds plan ONCE.

    ``ml=None`` with no bounds mirrors the reference's no-model branch
    (rulelib.py:543-546): empty corrections, warning only when verbose.
    The reference's r^2 index-name decoration (rulelib.py:589) is pandas
    presentation metadata with no long-frame equivalent and is dropped.
    """
    if bounds is None:
        bounds = pastas_prediction_interval_bounds(
            df, in_col, ml, ci=ci, tmin=tmin, tmax=tmax,
            savedir=savedir, verbose=verbose,
        )
        # tmin/tmax were consumed by the per-series interval calls
        tmin = tmax = None
    joint = ensure_ntz(bounds).select(SID, TS, "lower", "upper")
    if tmin is not None:
        joint = joint.filter(F.col(TS) >= F.lit(pd.Timestamp(tmin)))
    if tmax is not None:
        joint = joint.filter(F.col(TS) <= F.lit(pd.Timestamp(tmax)))
    if smoothfreq is not None:
        t = shift_series_forward_backward(joint, ["lower", "upper"],
                                          smoothfreq)
        # all four shifted columns interpolate in ONE asc + one desc
        # window pass (separate calls would stack 8 alternating sorts).
        # Member masks: the joint frame is the UNION of both bounds' shift
        # grids, and pandas interpolate() is positional — each bound must
        # rank over ITS OWN grid rows (any of its three shifted variants
        # present) or the other bound's rows would act as extra anchors
        # and shift every interpolated value in a gap.
        def _member(c):
            return (
                F.col(f"{c}_bwd").isNotNull()
                | F.col(f"{c}_orig").isNotNull()
                | F.col(f"{c}_fwd").isNotNull()
            )

        t = positional_interpolate_specs(
            t,
            [
                ("lower_bwd", "__lower_bi"), ("lower_fwd", "__lower_fi"),
                ("upper_bwd", "__upper_bi"), ("upper_fwd", "__upper_fi"),
            ],
            members={
                "__lower_bi": _member("lower"), "__lower_fi": _member("lower"),
                "__upper_bi": _member("upper"), "__upper_fi": _member("upper"),
            },
        )
        # Each smoothed bound keeps exactly its OWN orig index
        # (smooth_*_bound does .loc[orig.dropna().index] per bound,
        # ts_utils.py:464-475): a row survives if either orig is present,
        # and a bound whose own orig is NULL there stays NULL — with
        # asymmetric nulls the per-bound semantics match the reference's
        # separate smoothing calls.
        lo, uo = F.col("lower_orig"), F.col("upper_orig")
        joint = t.filter(lo.isNotNull() | uo.isNotNull()).select(
            SID,
            TS,
            # greatest/least skip NULLs exactly like pandas max/min(axis=1)
            F.when(
                lo.isNotNull(),
                F.least(F.col("__lower_bi"), lo, F.col("__lower_fi")),
            ).alias("lower"),
            F.when(
                uo.isNotNull(),
                F.greatest(F.col("__upper_bi"), uo, F.col("__upper_fi")),
            ).alias("upper"),
        )
    if min_ci is not None:
        w = _w_unbounded()
        mean_w = F.avg(F.col("upper") - F.col("lower")).over(w)
        half = F.lit(float(min_ci) / 2.0)
        narrow = mean_w < F.lit(float(min_ci))
        joint = joint.select(
            SID, TS,
            F.when(narrow, F.col("lower") - half)
            .otherwise(F.col("lower")).alias("lower"),
            F.when(narrow, F.col("upper") + half)
            .otherwise(F.col("upper")).alias("upper"),
        )
    return rule_outside_bandwidth(df, in_col, out, bounds=joint)


# ---------------------------------------------------------------------------
# comment / manual-obs rules
# ---------------------------------------------------------------------------


@_register(CODE)
def rule_keep_comments(
    df, in_col, out, *, keep_comments: list[str], comment_series: DataFrame | str
):
    """Flag (code 99) where the comment contains any keep_comment.

    rulelib.py:624-658: iterates keep_comments in order, later matches
    overwrite earlier ones; comparison value = the matched comment.
    ``comment_series`` may be a column name in df or an aux
    DataFrame(series_id, ts, comment).
    """
    if isinstance(comment_series, DataFrame):
        df = ensure_ntz(df)
        aux = ensure_ntz(comment_series).select(
            SID, TS, F.col(comment_series.columns[-1]).alias(f"{out}_comment")
        )
        df = df.join(F.broadcast(aux), on=[SID, TS], how="left")
        com = F.col(f"{out}_comment")
    else:
        com = F.col(comment_series)

    code = F.lit(0)
    cval = F.lit("")
    sval = F.lit(None).cast("double")
    for comment in keep_comments:  # later comments overwrite earlier matches
        m = com.isNotNull() & com.contains(comment)
        code = F.when(m, F.lit(int(CorrectionCode.UNKNOWN_COMPARISON_VALUE))).otherwise(code)
        cval = F.when(m, F.lit(comment)).otherwise(cval)
        sval = F.when(m, F.col(in_col)).otherwise(sval)
    df = (
        df.withColumn(f"{out}_code", code)
        .withColumn(f"{out}_sval", sval)
        .withColumn(f"{out}_cval", cval)
    )
    if isinstance(comment_series, DataFrame):
        df = df.drop(f"{out}_comment")
    return df


@_register(CODE)
def rule_compare_to_manual_obs(
    df, in_col, out, *, manual_obs: DataFrame, threshold=0.05,
    method="linear", max_dt="1D",
):
    """Flag where interpolated (manual - series) diff exceeds threshold.

    rulelib.py:661-704. Exact pandas time-interpolation + nearest-distance
    masking + linear re-interpolation semantics run as a per-series pandas
    kernel (SURVEY.md §2.2 rule 15); the corrections are emitted on the
    *diff* series (sval carries diff values).
    """
    from traval_spark.operators.kernels import apply_manual_obs_kernel

    return apply_manual_obs_kernel(
        df, in_col, out, manual_obs=manual_obs, mode="compare",
        threshold=threshold, method=method, max_dt=max_dt,
    )


@_register(SERIES)
def rule_shift_to_manual_obs(
    df, in_col, out, *, hseries: DataFrame, method="linear", max_dt="1D",
    reset_dates=None,
):
    """Adjustment rule: shift series onto manual observations.

    rulelib.py:707-777. Returns the *adjusted series* (series + interpolated
    diff) as the correction column, matching the reference which returns the
    adjusted series directly (the RuleSet additive contract then applies it
    as ``d[i] = d[in] + corr`` — replicated, not 'fixed').
    """
    from traval_spark.operators.kernels import apply_manual_obs_kernel

    return apply_manual_obs_kernel(
        df, in_col, out, manual_obs=hseries, mode="shift",
        method=method, max_dt=max_dt, reset_dates=reset_dates,
    )


@_register(CODE)
def rule_funcdict(df, in_col, out, *, funcdict: dict[str, Callable]):
    """Flag where any user predicate is True (rulelib.py:36-64).

    Arbitrary Python predicates over values -> vectorized Arrow pandas_udf
    (the reference applies them element-wise via ``series.apply``; our
    predicates receive the whole pandas Series batch and may be vectorized).
    """
    from pyspark.sql.functions import pandas_udf

    funcs = list(funcdict.values())

    @pandas_udf("boolean")
    def _any_flag(v: pd.Series) -> pd.Series:
        mask = None
        for fn in funcs:
            res = fn(v)
            if not isinstance(res, pd.Series):
                res = v.apply(fn)  # element-wise predicate fallback
            mask = res if mask is None else (mask | res)
        return mask.fillna(False)

    mask = _any_flag(F.col(in_col))
    return mask_corrections(
        df, in_col, out, mask, int(CorrectionCode.UNKNOWN_COMPARISON_VALUE)
    )


# ---------------------------------------------------------------------------
# combination rules (multi-input; apply_to tuple -> result IS the next step)
# ---------------------------------------------------------------------------


@_register(DIRECT)
def rule_combine_nan_or(df, in_cols: list[str], out: str) -> DataFrame:
    """NULL where ANY input is NULL, else first input (rulelib.py:780-798)."""
    any_null = None
    for c in in_cols:
        n = F.col(c).isNull()
        any_null = n if any_null is None else (any_null | n)
    res = F.when(any_null, F.lit(None)).otherwise(F.col(in_cols[0]))
    return df.withColumn(f"{out}_res", res)


@_register(DIRECT)
def rule_combine_nan_and(df, in_cols: list[str], out: str) -> DataFrame:
    """NULL where ALL inputs are NULL, else first input (rulelib.py:821-841).

    Reference quirk replicated: ``result = args[0].copy()`` means the first
    input's OWN NULLs ride through the 'otherwise' branch, so the output
    NULL set is exactly the first input's NULL set (all-NULL is a subset).
    """
    all_null = None
    for c in in_cols:
        n = F.col(c).isNull()
        all_null = n if all_null is None else (all_null & n)
    res = F.when(all_null, F.lit(None)).otherwise(F.col(in_cols[0]))
    return df.withColumn(f"{out}_res", res)


@_register(DIRECT)
def rule_combine_corrections_or(df, in_cols: list[str], out: str) -> DataFrame:
    """Code 99 where ANY input code != 0 (rulelib.py:801-818).

    in_cols are correction-code columns of earlier steps.
    """
    any_c = None
    for c in in_cols:
        n = F.coalesce(F.col(c), F.lit(0)) != 0
        any_c = n if any_c is None else (any_c | n)
    res = F.when(any_c, F.lit(int(CorrectionCode.UNKNOWN_COMPARISON_VALUE))).otherwise(
        F.lit(0)
    )
    return df.withColumn(f"{out}_res", res)


@_register(DIRECT)
def rule_combine_corrections_and(df, in_cols: list[str], out: str) -> DataFrame:
    """Code 99 where ALL input codes != 0 (rulelib.py:844-864)."""
    all_c = None
    for c in in_cols:
        n = F.coalesce(F.col(c), F.lit(0)) != 0
        all_c = n if all_c is None else (all_c & n)
    res = F.when(all_c, F.lit(int(CorrectionCode.UNKNOWN_COMPARISON_VALUE))).otherwise(
        F.lit(0)
    )
    return df.withColumn(f"{out}_res", res)
