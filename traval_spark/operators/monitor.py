"""Monitoring semantics over ingested series: counter rate, gap/uptime,
CUSUM changepoints.

Three read families every metrics/ingest pipeline runs next to rollups,
each expressed as lag-window + partial-aggregatable groupBy plans:

**Counter rate** (:func:`counter_windows`, PromQL ``increase``/``rate``/
``resets`` semantics): per series ordered by (ts, id), the per-step
increase is ``v - lag(v)`` unless negative — a negative step means the
counter RESET and restarted from ~0, so the step credits the full new
value ``v`` (the standard Prometheus reset rule).  The first point of a
series contributes nothing (no prior sample).  Steps then aggregate
into tumbling windows: a step spanning a window edge is attributed to
the window of its LATER sample (where the information arrives) —
documented because every TSDB picks one edge rule.  The lag window
partitions by series (the bounded-per-series model every traval rule
kernel already uses); the window aggregation is a plain mergeable
groupBy.

**Gap / uptime** (:func:`gap_stats`): per series, inter-arrival deltas
via the same lag; a delta above ``max_gap`` is an outage gap.  Reported
per series: ``n_gaps``, ``max_delta_us``, observed span, and
``uptime_frac`` = (span - sum of above-threshold excess) / span — i.e.
each gap counts as DOWN for the part exceeding the threshold.  All
integer microseconds until the final ratio.

**CUSUM changepoint** (:func:`cusum_changepoint`): the classic max-|CUSUM|
level-shift statistic, made engine-exact by clearing denominators.  For
a series x_1..x_N (ordered by ts, id) with prefix sums C_i and total S:

    D_i = N * C_i - i * S      ( = N^2 * classic CUSUM_i )

is INTEGER when x is integer (values are fixed-point scaled by
``value_scale``), so the argmax_i |D_i| — the candidate changepoint —
is identical on every engine, with no float-association noise.  The
normalized score ``max|D| / N^2`` (in original value units) is returned
alongside.  Magnitude budget: |D| <= N^2 * |x|_max; int64 covers
N=2e5-row series at |v|<=1e4 with value_scale=1e3 (~4e17) — beyond
that, upcast the prefix sums to decimal.  The prefix-sum window
partitions by series: bounded-series model, same as the rule kernels;
an unbounded series should be chunked by day first (the rollup path's
chunking) before scanning for shifts.

Reference note: traval (ArtesiaWater/traval) detects level shifts via
rule_offset_detection on single pandas series (reference rulelib.py);
these operators are the corpus-scale monitoring reads of the
from-scratch engine (BASELINE.json north_rule), not ports.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from traval_spark.functions.ts import gap_micros, unix_us

__all__ = [
    "counter_windows", "gap_stats", "cusum_changepoint",
    "seasonal_profile", "seasonal_anomaly",
    "ewma_daily", "holt_daily", "xcorr_lags",
    "changes_only", "trend_slope", "hysteresis_daily", "spearman_pairs",
    "time_weighted_avg", "psi_drift", "psi_from_hists",
    "holt_winters_daily", "slo_burn", "theil_sen", "seasonal_strength",
    "forecast_backtest",
    "ks_drift", "ks_from_hists", "mann_whitney", "mw_from_hists",
    "mann_kendall", "acf_lags", "ljung_box", "dominant_period",
    "fano_dispersion", "benford_digits",
    "emd_drift", "emd_from_hists", "jsd_drift", "jsd_from_hists",
    "chi2_drift", "chi2_from_hists", "welch_ttest", "kendall_pairs",
    "threshold_episodes", "decayed_topk",
    "bucket_count_signal", "counts_from_tier", "stl_decompose",
    "stl_anomaly", "kw_from_hists", "kruskal_drift", "runs_test",
    "lead_lag",
]


def _lagged(df: DataFrame, by, ts: str, ident: str, val: str | None):
    cols = [*by, unix_us(F.col(ts)).alias("__us"), F.col(ident).alias("__id")]
    if val is not None:
        cols.append(F.col(val).alias("__v"))
    src = df.select(*cols)
    w = Window.partitionBy(*by).orderBy("__us", "__id")
    out = src.withColumn("__us_prev", F.lag("__us").over(w))
    if val is not None:
        out = out.withColumn("__v_prev", F.lag("__v").over(w))
    return out


def bucket_count_signal(
    df: DataFrame | None = None,
    bucket: str = "1h",
    by: str = "source",
    ts: str = "ts",
    counts: DataFrame | None = None,
) -> DataFrame:
    """The zero-filled bucket-count signal ``(g, h, c)`` every trend/
    noise monitor consumes (a missing bucket is a real 0 of activity;
    zero-fill over the GLOBAL span makes aligned-pair counts a pure
    function of span and lag).

    Two inputs, identical output:

    - ``df``: raw events — ONE partial-aggregatable groupBy to bucket
      counts, the only raw-scale work any signal monitor does;
    - ``counts``: a pre-aggregated ``(g, h, c)`` frame — the
      TIER-SERVED path (see :func:`counts_from_tier`): at 100 TB the
      count signal already sits in the stored rollup tier's
      ``n_points``, so the monitors never re-scan raw.  Integer count
      sums re-aggregate exactly, so tier-served == raw-served
      bit-for-bit (parity-tested).

    The spine and everything downstream run on the tiny signal frame
    (|series| x span/bucket).
    """
    if counts is None:
        gus = gap_micros(bucket)
        src = df.select(
            F.col(by).alias("g"),
            F.floor(unix_us(F.col(ts)) / F.lit(gus)).alias("h"),
        )
        # the count frame feeds the span scalar, the series spine AND
        # the zero-fill join below — without a persist the raw-scale
        # groupBy (the ONLY raw work a monitor does) runs once per
        # reference, because lambda-free canonicalization can't be
        # relied on across these branches
        counts = src.groupBy("g", "h").agg(
            F.count("*").alias("c")).persist()
    span = counts.agg(F.min("h").alias("h0"), F.max("h").alias("h1"))
    spine = (
        counts.select("g").distinct()
        .crossJoin(F.broadcast(span))
        .select("g", F.explode(F.sequence("h0", "h1")).alias("h"))
    )
    # every monitor references the returned signal several times (lag
    # windows, tie censuses, pair joins); persist it so the signal is
    # materialized once per evaluation — it is the tiny (|series| x
    # span) frame, the design already relies on it being cheap
    return spine.join(counts, ["g", "h"], "left").select(
        "g", "h", F.coalesce("c", F.lit(0)).alias("c")
    ).persist()


def counts_from_tier(
    tier_df: DataFrame,
    bucket: str = "1h",
    by: str = "source",
) -> DataFrame:
    """Re-aggregate a STORED rollup tier's per-bucket ``n_points`` to
    the requested (coarser or equal) bucket grain as the monitors'
    ``(g, h, c)`` count signal — the tier-served feed for
    :func:`bucket_count_signal`'s ``counts=``.  Count sums are
    integers, so the signal equals the raw-derived one EXACTLY at any
    grain the cascade can produce; the read touches only the tiny tier
    frame (day-partition-pruned at the scan when the caller filters).
    """
    gus = gap_micros(bucket)
    return (
        tier_df.select(
            F.col(by).alias("g"),
            F.floor(unix_us(F.col("bucket")) / F.lit(gus)).alias("h"),
            F.col("n_points").alias("__n"),
        )
        .groupBy("g", "h")
        .agg(F.sum("__n").cast("long").alias("c"))
    )


def counter_windows(
    df: DataFrame,
    window: str = "1h",
    by: tuple[str, ...] = ("source",),
    ts: str = "ts",
    val: str = "value",
    ident: str = "event_id",
) -> DataFrame:
    """Tumbling-window ``increase`` / ``rate`` / ``resets`` per series.

    Output: ``*by, window_start, n_samples, increase, rate_per_sec,
    resets`` (increase/rate rounded to 6 decimals for float-sum
    stability, matching the engine's other double-sum reads).
    """
    gus = gap_micros(window)
    lagged = _lagged(df, by, ts, ident, val)
    delta = F.col("__v") - F.col("__v_prev")
    step = (
        F.when(F.col("__v_prev").isNull(), F.lit(0.0))
        .when(delta < 0, F.col("__v"))
        .otherwise(delta)
    )
    reset = F.when(
        F.col("__v_prev").isNotNull() & (delta < 0), F.lit(1)
    ).otherwise(F.lit(0))
    bus = (F.floor(F.col("__us") / F.lit(gus)) * F.lit(gus))
    out = (
        lagged.select(*by, bus.alias("__bus"), step.alias("__step"),
                      reset.alias("__reset"))
        .groupBy(*by, "__bus")
        .agg(
            F.count("*").alias("n_samples"),
            F.round(F.sum("__step"), 6).alias("increase"),
            F.round(F.sum("__step") / F.lit(gus / 1_000_000.0), 6)
            .alias("rate_per_sec"),
            F.sum("__reset").alias("resets"),
        )
    )
    return out.withColumn(
        "window_start", F.timestamp_micros(F.col("__bus"))
    ).drop("__bus")


def gap_stats(
    df: DataFrame,
    max_gap: str = "1h",
    by: tuple[str, ...] = ("source",),
    ts: str = "ts",
    ident: str = "event_id",
) -> DataFrame:
    """Per-series gap census and uptime fraction (module docstring).

    Output: ``*by, n_points, n_gaps, max_delta_us, span_us,
    uptime_frac`` (uptime rounded to 9 decimals; exact integer
    micros elsewhere).  Series with <2 points report uptime 1.0.
    """
    thr = gap_micros(max_gap)
    lagged = _lagged(df, by, ts, ident, val=None)
    delta = F.col("__us") - F.col("__us_prev")
    excess = F.when(delta > thr, delta - thr).otherwise(F.lit(0))
    agg = lagged.groupBy(*by).agg(
        F.count("*").alias("n_points"),
        F.sum(F.when(delta > thr, 1).otherwise(0)).alias("n_gaps"),
        F.coalesce(F.max(delta), F.lit(0)).alias("max_delta_us"),
        (F.max("__us") - F.min("__us")).alias("span_us"),
        F.sum(excess).alias("__down_us"),
    )
    return agg.select(
        *by, "n_points", "n_gaps", "max_delta_us", "span_us",
        F.round(
            F.when(F.col("span_us") > 0,
                   1.0 - F.col("__down_us") / F.col("span_us"))
            .otherwise(F.lit(1.0)),
            9,
        ).alias("uptime_frac"),
    )


def cusum_changepoint(
    df: DataFrame,
    by: tuple[str, ...] = ("source",),
    ts: str = "ts",
    val: str = "value",
    ident: str = "event_id",
    value_scale: int = 1000,
) -> DataFrame:
    """Exact-integer max-|CUSUM| level-shift candidate per series.

    Output: ``*by, n_points, t_change, d_max_scaled, score`` where
    ``t_change`` is the timestamp of argmax_i |D_i| (earliest instant,
    then smallest id, on ties), ``d_max_scaled`` = max|D_i| as int64
    (D in value_scale units), and ``score`` = max|D| / N^2 in original
    value units (rounded to 9 decimals).
    """
    src = df.select(
        *by,
        unix_us(F.col(ts)).alias("__us"),
        F.col(ident).alias("__id"),
        F.round(F.col(val) * F.lit(int(value_scale))).cast("long")
        .alias("__y"),
    )
    w = Window.partitionBy(*by).orderBy("__us", "__id")
    pref = src.select(
        *by, "__us",
        F.sum("__y").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ).alias("__c"),
        F.row_number().over(w).alias("__i"),
        F.col("__id"),
    )
    # total S = prefix sum at i = N (NOT max __c — wrong for negative
    # tails): take the prefix value carried by the largest row number
    tot = pref.groupBy(*by).agg(
        F.count("*").alias("__n"),
        F.max(F.struct("__i", "__c"))["__c"].alias("__s"),
    )
    j = pref.join(tot, list(by))
    d = F.col("__n") * F.col("__c") - F.col("__i") * F.col("__s")
    scored = j.select(
        *by, "__us", "__id", "__n", F.abs(d).alias("__absd")
    )
    pick = Window.partitionBy(*by).orderBy(
        F.col("__absd").desc(), F.col("__us"), F.col("__id")
    )
    sel = scored.withColumn("__rn", F.row_number().over(pick)).filter(
        F.col("__rn") == 1
    )
    n2 = F.col("__n").cast("double") * F.col("__n").cast("double")
    return sel.select(
        *by,
        F.col("__n").alias("n_points"),
        F.timestamp_micros(F.col("__us")).alias("t_change"),
        F.col("__absd").alias("d_max_scaled"),
        F.round(F.col("__absd") / n2 / F.lit(float(value_scale)), 9)
        .alias("score"),
    )


def seasonal_profile(
    df: DataFrame,
    by: tuple[str, ...] = ("source",),
    ts: str = "ts",
    val: str = "value",
    value_scale: int = 1000,
) -> DataFrame:
    """Per (series, hour-of-day) seasonal baseline: n / mean / std.

    Moments are computed on fixed-point integers with the variance
    numerator cleared of denominators —

        var_num = n * sum(y^2) - sum(y)^2        (exact, decimal(38,0))

    — so mean = S/n and std = sqrt(var_num)/n derive from EXACT
    integers and every engine lands on the identical double (the same
    trick the LTTB argmax uses).  Output: ``*by, hod, n_points,
    mean_value, std_value`` (rounded to 6, descaled).

    Scale: one partial-aggregatable groupBy; the profile is tiny
    (|series| x 24 rows) — :func:`seasonal_anomaly` broadcasts it.
    """
    src = df.select(
        *by,
        F.hour(F.col(ts)).alias("hod"),
        F.round(F.col(val) * F.lit(int(value_scale))).cast("long")
        .alias("__y"),
    )
    prof = src.groupBy(*by, "hod").agg(
        F.count("*").alias("n_points"),
        F.sum(F.col("__y").cast("decimal(38,0)")).alias("__s"),
        F.sum((F.col("__y").cast("decimal(38,0)") * F.col("__y")))
        .alias("__q"),
    )
    vn = (F.col("n_points").cast("decimal(38,0)") * F.col("__q")
          - F.col("__s") * F.col("__s"))
    return prof.select(
        *by, "hod", "n_points",
        F.col("__s").alias("__s"),
        vn.alias("__vn"),
        F.round(
            F.col("__s").cast("double") / F.col("n_points")
            / F.lit(float(value_scale)), 6
        ).alias("mean_value"),
        F.round(
            F.sqrt(vn.cast("double")) / F.col("n_points")
            / F.lit(float(value_scale)), 6
        ).alias("std_value"),
    )


def seasonal_anomaly(
    df: DataFrame,
    threshold: float = 3.0,
    by: tuple[str, ...] = ("source",),
    ts: str = "ts",
    val: str = "value",
    value_scale: int = 1000,
) -> DataFrame:
    """Points deviating > ``threshold`` sigmas from their (series,
    hour-of-day) seasonal baseline.

    z = (y*n - S) / sqrt(var_num) — algebraically (x - mean)/std with
    all inputs exact integers, so the flag set is engine-identical
    (no float-mean association noise at the threshold boundary).
    Constant-baseline cells (var_num = 0) never flag.

    Plan: raw rows take ONE broadcast hash join against the tiny
    profile — no shuffle of the point stream at all.
    """
    prof = seasonal_profile(df, by=by, ts=ts, val=val,
                            value_scale=value_scale)
    src = df.select(
        *by, F.col(ts).alias("ts"), F.col(val).alias("value"),
        F.hour(F.col(ts)).alias("hod"),
        F.round(F.col(val) * F.lit(int(value_scale))).cast("long")
        .alias("__y"),
    )
    j = src.join(F.broadcast(prof), [*by, "hod"])
    z = (
        (F.col("__y").cast("decimal(38,0)")
         * F.col("n_points").cast("decimal(38,0)")
         - F.col("__s")).cast("double")
        / F.sqrt(F.col("__vn").cast("double"))
    )
    return (
        j.filter(F.col("__vn") > 0)
        .withColumn("z", F.round(z, 6))
        .filter(F.abs(F.col("z")) > F.lit(float(threshold)))
        .select(*by, "ts", "value", "z")
    )


def _day_arrays(df, by, ts, val, ident):
    src = df.select(
        *by,
        F.col(ts).cast("date").alias("day"),
        F.struct(
            unix_us(F.col(ts)).alias("u"),
            F.col(ident).alias("i"),
            F.col(val).cast("double").alias("v"),
        ).alias("__s"),
    )
    return src.groupBy(*by, "day").agg(
        F.count("*").alias("n_points"),
        F.array_sort(F.collect_list("__s")).alias("__arr"),
    )


def ewma_daily(
    df: DataFrame,
    alpha: float = 0.3,
    by: tuple[str, ...] = ("source",),
    ts: str = "ts",
    val: str = "value",
    ident: str = "event_id",
) -> DataFrame:
    """Per-(series, day) exponential smoothing as a pure-JVM array fold.

    EWMA is inherently sequential (y_i = a*x_i + (1-a)*y_{i-1}); the
    scalable shape is the same one the funnel and BPE-apply operators
    use — collect each BOUNDED day-partition into an ordered array and
    fold it with ``F.aggregate`` (whole-stage codegen, no Python, no
    per-series single-task window).  Initialization: y_0 = x_0.

    Engine exactness: the fold applies ``a*x + (1-a)*y`` with both
    coefficients as LITERALS in the same order, so any engine folding
    the same ordered list (the oracle's ``list_reduce``) lands on the
    bit-identical double — no rounding slack needed.  Output: ``*by,
    day, n_points, ewma``.
    """
    a = F.lit(float(alpha))
    b = F.lit(1.0 - float(alpha))
    arrs = _day_arrays(df, by, ts, val, ident)
    rest = F.expr("slice(__arr, 2, greatest(size(__arr) - 1, 0))")
    out = arrs.withColumn(
        "ewma",
        F.aggregate(
            rest,
            F.element_at("__arr", 1)["v"],
            lambda acc, s: a * s["v"] + b * acc,
        ),
    )
    return out.select(*by, "day", "n_points", "ewma")


def holt_daily(
    df: DataFrame,
    alpha: float = 0.3,
    beta: float = 0.1,
    by: tuple[str, ...] = ("source",),
    ts: str = "ts",
    val: str = "value",
    ident: str = "event_id",
) -> DataFrame:
    """Holt linear (level + trend) smoothing per (series, day), same
    pure-JVM fold shape as :func:`ewma_daily` with a struct
    accumulator:

        l' = a*x + (1-a)*(l + t)
        t' = g*(l' - l) + (1-g)*t        (l_0 = x_0, t_0 = 0)

    Output: ``*by, day, n_points, level, trend, forecast_next``
    (forecast_next = level + trend, the one-step-ahead forecast) —
    bit-identical to the oracle's list_reduce for the same literal
    coefficients.
    """
    a, an = F.lit(float(alpha)), F.lit(1.0 - float(alpha))
    g, gn = F.lit(float(beta)), F.lit(1.0 - float(beta))
    arrs = _day_arrays(df, by, ts, val, ident)
    rest = F.expr("slice(__arr, 2, greatest(size(__arr) - 1, 0))")

    def step(acc, s):
        lvl = a * s["v"] + an * (acc["l"] + acc["t"])
        return F.struct(
            lvl.alias("l"),
            (g * (lvl - acc["l"]) + gn * acc["t"]).alias("t"),
        )

    out = arrs.withColumn(
        "__acc",
        F.aggregate(
            rest,
            F.struct(
                F.element_at("__arr", 1)["v"].alias("l"),
                F.lit(0.0).alias("t"),
            ),
            step,
        ),
    )
    return out.select(
        *by, "day", "n_points",
        F.col("__acc")["l"].alias("level"),
        F.col("__acc")["t"].alias("trend"),
        (F.col("__acc")["l"] + F.col("__acc")["t"]).alias("forecast_next"),
    )


def holt_winters_daily(
    df: DataFrame,
    alpha: float = 0.3,
    beta: float = 0.1,
    gamma: float = 0.2,
    period: int = 24,
    by: tuple[str, ...] = ("source",),
    ts: str = "ts",
    val: str = "value",
    ident: str = "event_id",
) -> DataFrame:
    """Holt-Winters ADDITIVE seasonal smoothing per (series, day) —
    completes the EWMA -> Holt -> Holt-Winters family on the same
    pure-JVM ``F.aggregate`` fold (no Python, no per-series window
    task). Recurrence for the element at 1-based position i, seasonal
    slot p = (i - 1) mod ``period``:

        l' = a*(x - s_p) + (1-a)*(l + t)
        t' = b*(l' - l)  + (1-b)*t
        s_p'= g*(x - l')  + (1-g)*s_p

    Initialization convention (documented, deterministic): l_0 = x_0,
    t_0 = 0, all seasonal indices 0 — seasonals warm up over the first
    cycles, and with ``gamma=0`` the operator degrades EXACTLY to
    :func:`holt_daily` (identity-tested). The accumulator is a flat
    double array ``[l, t, consumed, s_0..s_{m-1}]`` — the consumed
    counter makes the seasonal slot derivable inside the fold without
    zipping element indices, and a LIST accumulator sidesteps DuckDB's
    in-place struct-field mutation (the holt_daily oracle caveat), so
    the oracle's ``list_reduce`` lands on bit-identical doubles for the
    same repr'd literal coefficients.

    Output: ``*by, day, n_points, level, trend, season_next,
    forecast_next`` where season_next is the seasonal index of the
    NEXT element's slot and forecast_next = level + trend +
    season_next (the one-step-ahead seasonal forecast).
    """
    m = int(period)
    if m < 1:
        raise ValueError(f"period must be >= 1, got {period}")
    A, AN = F.lit(float(alpha)), F.lit(1.0 - float(alpha))
    B, BN = F.lit(float(beta)), F.lit(1.0 - float(beta))
    G, GN = F.lit(float(gamma)), F.lit(1.0 - float(gamma))
    arrs = _day_arrays(df, by, ts, val, ident)
    rest = F.expr("slice(__arr, 2, greatest(size(__arr) - 1, 0))")
    init = F.concat(
        F.array(F.element_at("__arr", 1)["v"], F.lit(0.0), F.lit(1.0)),
        F.array_repeat(F.lit(0.0), m),
    )

    def step(acc, s):
        x = s["v"]
        c = F.get(acc, F.lit(2))
        p0 = c.cast("int") % F.lit(m)
        sp = F.get(acc, F.lit(3) + p0)
        lvl = A * (x - sp) + AN * (
            F.get(acc, F.lit(0)) + F.get(acc, F.lit(1))
        )
        trd = B * (lvl - F.get(acc, F.lit(0))) + BN * F.get(acc, F.lit(1))
        sn = G * (x - lvl) + GN * sp
        return F.concat(
            F.array(lvl, trd, c + F.lit(1.0)),
            F.slice(acc, F.lit(4), p0),
            F.array(sn),
            F.slice(acc, F.lit(5) + p0, F.lit(m - 1) - p0),
        )

    out = arrs.withColumn("__acc", F.aggregate(rest, init, step))
    nxt = F.lit(3) + (F.col("n_points").cast("int") % F.lit(m))
    lvl, trd = F.get("__acc", F.lit(0)), F.get("__acc", F.lit(1))
    season_next = F.get("__acc", nxt)
    return out.select(
        *by, "day", "n_points",
        lvl.alias("level"),
        trd.alias("trend"),
        season_next.alias("season_next"),
        (lvl + trd + season_next).alias("forecast_next"),
    )


def xcorr_lags(
    df: DataFrame | None = None,
    max_lag: int = 3,
    bucket: str = "1h",
    by: str = "source",
    ts: str = "ts",
    counts: DataFrame | None = None,
) -> DataFrame:
    """Lagged Pearson cross-correlation between per-series bucket-count
    signals (which series leads which — error bursts preceding purchase
    drops, ingest spikes preceding dedup load).

    Signals are COUNT-per-bucket, ZERO-FILLED over the global bucket
    span (a missing bucket is a real 0 of activity, and zero-fill makes
    the aligned-pair count a pure function of span and lag).  For every
    ordered series pair (a, b) and lag L in [-max_lag, max_lag], x_t is
    a's count at bucket t and y_t is b's count at bucket t+L; the
    correlation is assembled from EXACT integer moments

        num  = n*S_xy - S_x*S_y
        den1 = n*S_xx - S_x^2,  den2 = n*S_yy - S_y^2
        r    = num / sqrt(den1 * den2)

    so r is engine-identical (the seasonal-profile trick, applied to a
    join).  Zero-variance windows (den <= 0) are dropped.

    Plan shape: the ONLY raw-scale work is one partial-aggregatable
    groupBy to bucket counts; the signal frame is tiny (|series| x
    span/bucket) — the spine fill, the broadcast lag cross, the pair
    join and the moment aggregation all run on it.  Output: ``a, b,
    lag, n, r``.
    """
    sig = bucket_count_signal(df, bucket=bucket, by=by, ts=ts,
                              counts=counts)
    lags = F.broadcast(
        sig.sparkSession.range(-max_lag, max_lag + 1)
        .select(F.col("id").cast("int").alias("lag"))
    )
    a = sig.select(F.col("g").alias("a"), F.col("h").alias("ha"),
                   F.col("c").alias("x"))
    b = sig.select(F.col("g").alias("b"), F.col("h").alias("hb"),
                   F.col("c").alias("y"))
    pairs = (
        a.crossJoin(lags)
        .join(b, F.col("hb") == F.col("ha") + F.col("lag"))
    )
    # moments in decimal(38,0): x*x on raw BIGINT counts would overflow
    # int64 at ~1e9-row buckets (ANSI aborts); decimal mirrors the
    # oracle's HUGEINT exactly (the same budget seasonal_profile uses)
    xd = F.col("x").cast("decimal(38,0)")
    yd = F.col("y").cast("decimal(38,0)")
    m = pairs.groupBy("a", "b", "lag").agg(
        F.count("*").alias("n"),
        F.sum(xd).alias("sx"), F.sum(yd).alias("sy"),
        F.sum(xd * F.col("x")).alias("sxx"),
        F.sum(yd * F.col("y")).alias("syy"),
        F.sum(xd * F.col("y")).alias("sxy"),
    )
    nd = F.col("n").cast("decimal(38,0)")
    num = nd * F.col("sxy") - F.col("sx") * F.col("sy")
    d1 = nd * F.col("sxx") - F.col("sx") * F.col("sx")
    d2 = nd * F.col("syy") - F.col("sy") * F.col("sy")
    return (
        m.filter((d1 > 0) & (d2 > 0))
        .select(
            "a", "b", "lag", "n",
            (num.cast("double")
             / F.sqrt(d1.cast("double") * d2.cast("double"))).alias("r"),
        )
    )


def changes_only(
    df: DataFrame,
    by: tuple[str, ...] = ("source",),
    ts: str = "ts",
    val: str = "value",
    ident: str = "event_id",
) -> DataFrame:
    """Run-length compaction for slowly-changing series: keep only the
    rows where the value CHANGES (plus each series' first row).  The
    storage dual of gap-fill — the original series reconstructs exactly
    via an as-of join / forward fill (pytest proves the round trip), so
    a config/state stream that repeats its value 99% of the time stores
    1% of the rows.  One lag window per series (bounded-series model).

    Output: the input columns of the kept rows, unchanged.
    """
    lagged = _lagged(df, by, ts, ident, val)
    keep = F.col("__v_prev").isNull() | (
        F.col("__v") != F.col("__v_prev")
    )
    return (
        lagged.filter(keep)
        .select(
            *by, F.timestamp_micros(F.col("__us")).alias(ts),
            F.col("__id").alias(ident), F.col("__v").alias(val),
        )
    )


def trend_slope(
    df: DataFrame,
    bucket: str = "1d",
    by: tuple[str, ...] = ("source",),
    ts: str = "ts",
    val: str = "value",
    value_scale: int = 1000,
) -> DataFrame:
    """Per-(series, bucket) least-squares trend slope from exact
    fixed-point moments — the drift/trend read next to the level
    (CUSUM) and seasonal (profile) monitors.

    With x = microseconds since the bucket start and y = scaled value:

        slope = (n*S_xy - S_x*S_y) / (n*S_xx - S_x^2)

    numerator and denominator are exact decimal(38,0) integers, so the
    double division — converted to value-units-per-HOUR — is
    engine-identical (the xcorr/seasonal moment trick on (t, v)
    pairs).  Single-point / zero-time-variance buckets are dropped
    (no slope exists).  Output: ``*by, bucket_start, n_points,
    slope_per_hour``.
    """
    gus = gap_micros(bucket)
    bus = (F.floor(unix_us(F.col(ts)) / F.lit(gus)) * F.lit(gus))
    src = df.select(
        *by,
        bus.alias("__bus"),
        (unix_us(F.col(ts)) - bus).cast("decimal(38,0)").alias("__x"),
        F.round(F.col(val) * F.lit(int(value_scale))).cast("long")
        .alias("__yl"),
    ).withColumn("__y", F.col("__yl").cast("decimal(38,0)"))
    m = src.groupBy(*by, "__bus").agg(
        F.count("*").alias("n_points"),
        F.sum("__x").alias("sx"), F.sum("__y").alias("sy"),
        F.sum(F.col("__x") * F.col("__x")).alias("sxx"),
        F.sum(F.col("__x") * F.col("__y")).alias("sxy"),
    )
    nd = F.col("n_points").cast("decimal(38,0)")
    num = nd * F.col("sxy") - F.col("sx") * F.col("sy")
    den = nd * F.col("sxx") - F.col("sx") * F.col("sx")
    per_hour = F.lit(3_600_000_000.0) / F.lit(float(value_scale))
    return (
        m.filter(den > 0)
        .select(
            *by,
            F.timestamp_micros(F.col("__bus")).alias("bucket_start"),
            "n_points",
            (num.cast("double") / den.cast("double") * per_hour)
            .alias("slope_per_hour"),
        )
    )


def hysteresis_daily(
    df: DataFrame,
    hi: float,
    lo: float,
    by: tuple[str, ...] = ("source",),
    ts: str = "ts",
    val: str = "value",
    ident: str = "event_id",
) -> DataFrame:
    """Two-threshold (hysteresis) alerting per (series, day): the alert
    LATCHES on when the value exceeds ``hi`` and releases only below
    ``lo`` — the debounced alarm every monitoring system uses instead
    of a flapping single threshold.  Inherently sequential (state
    depends on history), so it runs as the same pure-JVM ordered array
    fold as :func:`ewma_daily`: one groupBy per bounded day partition,
    no per-series window, no Python.

    The fold state is (alert_count, in_alert); transitions compare
    doubles against literal thresholds — engine-exact, the oracle folds
    the identical list (list accumulator — same DuckDB struct-mutation
    caveat as holt_daily).  Day boundaries reset the latch (each day
    judged from a released state; chain days via the tier read if a
    carried latch is wanted).  Output: ``*by, day, n_points,
    n_alerts, in_alert``.
    """
    h, l = F.lit(float(hi)), F.lit(float(lo))
    arrs = _day_arrays(df, by, ts, val, ident)
    rest = F.expr("slice(__arr, 2, greatest(size(__arr) - 1, 0))")
    first_on = (F.element_at("__arr", 1)["v"] > h).cast("int")

    def step(acc, s):
        was = acc["st"]
        on = F.when((was == 0) & (s["v"] > h), 1).otherwise(
            F.when((was == 1) & (s["v"] < l), 0).otherwise(was)
        )
        fired = ((was == 0) & (s["v"] > h)).cast("int")
        return F.struct(
            (acc["n"] + fired).alias("n"), on.alias("st")
        )

    out = arrs.withColumn(
        "__acc",
        F.aggregate(
            rest,
            F.struct(first_on.alias("n"), first_on.alias("st")),
            step,
        ),
    )
    return out.select(
        *by, "day", "n_points",
        F.col("__acc")["n"].alias("n_alerts"),
        F.col("__acc")["st"].alias("in_alert"),
    )


def spearman_pairs(
    df: DataFrame | None = None,
    bucket: str = "1h",
    by: str = "source",
    ts: str = "ts",
    counts: DataFrame | None = None,
) -> DataFrame:
    """Spearman rank correlation between every pair of per-series
    bucket-count signals — the robust (monotonic, outlier-insensitive)
    companion to :func:`xcorr_lags`' Pearson.

    Tie-corrected EXACTLY without fractions: the average rank of a tie
    group is (2*min_rank + ties - 1)/2, so DOUBLED average ranks

        r2 = 2*rank() + count(ties) - 1

    are integers, and Pearson is affine-invariant, so computing it on
    r2 gives the true tie-corrected Spearman rho from exact
    decimal(38,0) moments — engine-identical doubles, the same
    clearing trick as everywhere else in this module.  Signals are
    zero-filled over the global bucket span (as in xcorr); raw rows are
    scanned once.  Output: ``a, b, n, rho``.
    """
    sig = bucket_count_signal(df, bucket=bucket, by=by, ts=ts,
                              counts=counts)
    wr = Window.partitionBy("g").orderBy("c")
    wt = Window.partitionBy("g", "c")
    ranked = sig.select(
        "g", "h",
        (F.lit(2) * F.rank().over(wr) + F.count("*").over(wt) - 1)
        .cast("decimal(38,0)").alias("r2"),
    )
    a = ranked.select(F.col("g").alias("a"), "h", F.col("r2").alias("x"))
    b = ranked.select(F.col("g").alias("b"), "h", F.col("r2").alias("y"))
    m = a.join(b, "h").groupBy("a", "b").agg(
        F.count("*").alias("n"),
        F.sum("x").alias("sx"), F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    )
    nd = F.col("n").cast("decimal(38,0)")
    num = nd * F.col("sxy") - F.col("sx") * F.col("sy")
    d1 = nd * F.col("sxx") - F.col("sx") * F.col("sx")
    d2 = nd * F.col("syy") - F.col("sy") * F.col("sy")
    return (
        m.filter((d1 > 0) & (d2 > 0))
        .select(
            "a", "b", "n",
            (num.cast("double")
             / F.sqrt(d1.cast("double") * d2.cast("double")))
            .alias("rho"),
        )
    )


def time_weighted_avg(
    df: DataFrame,
    bucket: str = "1h",
    by: tuple[str, ...] = ("source",),
    ts: str = "ts",
    val: str = "value",
    ident: str = "event_id",
    value_scale: int = 1000,
) -> DataFrame:
    """Time-weighted average per (series, bucket) — the aggregate
    irregular sampling actually needs: a plain AVG over-weights burst
    periods; the TWA weights each observation by how long it HELD
    (last-observation-carried-forward, the TimescaleDB
    ``time_weight('LOCF')`` convention).

    Semantics (per bucket, standalone): observation i holds from t_i to
    t_{i+1} (or to the bucket end for the last one); the integral
    starts at the FIRST observation — no carry-in from the previous
    bucket, so buckets stay independently mergeable facts (a carried
    version needs the gap-fill path).

        twa = sum(v_i * dt_i) / (bucket_end - t_first)

    Numerator in exact decimal (scaled value x integer microseconds),
    denominator exact integer — the division is the only double op, so
    results are engine-identical.  Equal-timestamp duplicates hold for
    0us and vanish from the integral (deterministic).  Output: ``*by,
    bucket_start, n_points, twa`` (descaled).
    """
    gus = gap_micros(bucket)
    bus = (F.floor(unix_us(F.col(ts)) / F.lit(gus)) * F.lit(gus))
    src = df.select(
        *by,
        bus.alias("__bus"),
        unix_us(F.col(ts)).alias("__us"),
        F.col(ident).alias("__id"),
        F.round(F.col(val) * F.lit(int(value_scale))).cast("long")
        .alias("__y"),
    )
    w = Window.partitionBy(*by, "__bus").orderBy("__us", "__id")
    nxt = F.lead("__us").over(w)
    dt = (
        F.coalesce(nxt, F.col("__bus") + F.lit(gus)) - F.col("__us")
    ).cast("decimal(38,0)")
    seg = src.select(
        *by, "__bus", "__us",
        (F.col("__y").cast("decimal(38,0)") * dt).alias("__num"),
    )
    agg = seg.groupBy(*by, "__bus").agg(
        F.count("*").alias("n_points"),
        F.sum("__num").alias("__num"),
        F.min("__us").alias("__t0"),
    )
    den = (F.col("__bus") + F.lit(gus) - F.col("__t0")).cast("double")
    return agg.select(
        *by,
        F.timestamp_micros(F.col("__bus")).alias("bucket_start"),
        "n_points",
        (F.col("__num").cast("double") / den
         / F.lit(float(value_scale))).alias("twa"),
    )


def psi_drift(
    df_a: DataFrame,
    df_b: DataFrame,
    by: tuple[str, ...] = ("source",),
    val: str = "value",
    scale: int = 1,
    ndigits: int = 6,
) -> DataFrame:
    """Population Stability Index between two snapshots of the same
    measure — THE standard distribution-drift monitor (is this week's
    token-length / value distribution still the one we trained on?).

        PSI = sum_bins (p_i - q_i) * ln(p_i / q_i)

    Bins are the discretized-value histogram (``round(v*scale)``, the
    hist.py convention) over the UNION of bins observed in either
    snapshot, with Laplace smoothing (+0.5 per bin) so one-sided bins
    contribute finitely instead of forcing an epsilon hack:

        p_i = (c_a + 0.5) / (n_a + 0.5 * B)

    Everything derives from exact integer counts; the only float ops
    (division, ln, the term sum) run identically per term in any
    engine, and the cross-engine sum-association noise is ~1e-15 —
    far under the rounding.  Rule of thumb: PSI < 0.1 stable, 0.1-0.25
    drifting, > 0.25 shifted.  One groupBy per snapshot + a full-outer
    join on the tiny bin table.  Output: ``*by, n_bins, psi``.
    """
    def hist(d, cname):
        return d.groupBy(
            *by, F.round(F.col(val) * scale).cast("long").alias("bin")
        ).agg(F.count("*").alias(cname))

    return psi_from_hists(hist(df_a, "ca"), hist(df_b, "cb"),
                          by=by, ndigits=ndigits)


def psi_from_hists(
    ha: DataFrame,
    hb: DataFrame,
    by: tuple[str, ...] = ("source",),
    ndigits: int = 6,
) -> DataFrame:
    """PSI from two histogram count frames (``*by, bin, ca`` / ``*by,
    bin, cb``) — the tier-served drift path: feed it per-period bin
    counts summed straight off a stored hist tier (hist.py) and the
    drift read never re-scans raw (pytest proves tiered == direct)."""
    j = (
        ha.join(hb, [*by, "bin"], "full_outer")
        .select(
            *by, "bin",
            F.coalesce("ca", F.lit(0)).alias("ca"),
            F.coalesce("cb", F.lit(0)).alias("cb"),
        )
    )
    tot = j.groupBy(*by).agg(
        F.sum("ca").alias("na"), F.sum("cb").alias("nb"),
        F.count("*").alias("n_bins"),
    )
    t = j.join(tot, list(by))
    p = (F.col("ca") + F.lit(0.5)) / (F.col("na") + 0.5 * F.col("n_bins"))
    q = (F.col("cb") + F.lit(0.5)) / (F.col("nb") + 0.5 * F.col("n_bins"))
    term = (p - q) * F.log(p / q)
    return (
        t.groupBy(*by)
        .agg(
            F.max("n_bins").alias("n_bins"),
            F.round(F.sum(term), ndigits).alias("psi"),
        )
    )


def slo_burn(
    df: DataFrame,
    is_error,
    budget: float = 0.01,
    window: str = "1h",
    long_windows: int = 6,
    threshold: float = 2.0,
    by: tuple[str, ...] = (),
    ts: str = "ts",
) -> DataFrame:
    """Multi-window SLO error-budget burn-rate alerting (the SRE
    multiwindow rule): per short bucket, ``burn_short`` = error ratio /
    ``budget``; ``burn_long`` = the TRAILING ``long_windows``-bucket
    error ratio / budget; an alert fires only when BOTH exceed
    ``threshold`` — the long window keeps one-bucket blips silent, the
    short window ends the alert as soon as the burn actually stops.

    Output: ``*by, window_start, n_total, n_err, burn_short,
    burn_long, alert`` (int 0/1).

    Scale shape: raw events are scanned ONCE into short buckets (one
    partial-aggregatable groupBy); the trailing window is a
    ``rangeBetween`` over bucket epoch micros on the BUCKET frame —
    whose size is bounded by the calendar (time range / window width)
    per series, never by event volume — so sparse buckets need no
    zero-fill spine (absent buckets contribute nothing, exactly the
    trailing-ratio semantics). Burn ratios are exact-integer divisions
    rounded to 9 dp BEFORE the threshold compare, so a last-ulp
    disagreement cannot flip an alert row cross-engine (the
    temperature_mix guard).
    """
    gus = gap_micros(window)
    bus = F.floor(unix_us(F.col(ts)) / F.lit(gus)) * F.lit(gus)
    b = (
        df.select(
            *by,
            bus.alias("__bus"),
            F.when(is_error, F.lit(1)).otherwise(F.lit(0)).alias("__e"),
        )
        .groupBy(*by, "__bus")
        .agg(
            F.count(F.lit(1)).alias("n_total"),
            F.sum("__e").alias("n_err"),
        )
    )
    span = int(long_windows - 1) * gus
    base = Window.partitionBy(*by) if by else Window.partitionBy()
    w = base.orderBy(F.col("__bus")).rangeBetween(-span, 0)
    burn_s = F.round(
        F.col("n_err") / F.col("n_total") / F.lit(float(budget)), 9
    )
    burn_l = F.round(
        F.sum("n_err").over(w)
        / F.sum("n_total").over(w)
        / F.lit(float(budget)),
        9,
    )
    return (
        b.withColumn("burn_short", burn_s)
        .withColumn("burn_long", burn_l)
        .withColumn(
            "alert",
            (
                (F.col("burn_short") > F.lit(float(threshold)))
                & (F.col("burn_long") > F.lit(float(threshold)))
            ).cast("int"),
        )
        .withColumn("window_start", F.timestamp_micros(F.col("__bus")))
        .drop("__bus")
    )


def theil_sen(
    df: DataFrame | None = None,
    bucket: str = "1h",
    by: str = "source",
    ts: str = "ts",
    counts: DataFrame | None = None,
) -> DataFrame:
    """Theil–Sen robust trend slope per series over the zero-filled
    bucket-COUNT signal: the median of all pairwise slopes

        slope_ij = (c_j - c_i) / (h_j - h_i),   i < j

    — the robust companion to the least-squares :func:`trend_slope`
    (one wild outlier bucket moves OLS arbitrarily; Theil–Sen tolerates
    ~29% corruption).  The signal is count-per-bucket zero-filled over
    the global span (xcorr_lags' spine: a missing bucket is a real 0).

    Exactness: each pairwise slope is a double of two EXACT integers
    (count delta / bucket delta) — same IEEE result in both engines —
    and the median of an even pair count averages the two middle
    doubles, which is DuckDB ``median()``'s numeric semantics exactly.
    The middle VALUES are well-defined regardless of how row_number
    breaks ties between equal slopes (any total order extending the
    slope order puts the same value at each rank).

    Plan shape: the only raw-scale work is ONE partial-aggregatable
    groupBy to bucket counts; the self-join producing the O(m^2)
    pairs and the per-series median window run on the tiny signal
    frame (m = span/bucket buckets per series — a monitoring read over
    hours/days, thousands of points, not a corpus-scale op).

    Output: ``g, n_buckets, n_pairs, sen_slope`` (counts per bucket
    per bucket-step).
    """
    sig = bucket_count_signal(df, bucket=bucket, by=by, ts=ts,
                              counts=counts)
    a = sig.select("g", F.col("h").alias("hi"), F.col("c").alias("ci"))
    b = sig.select("g", F.col("h").alias("hj"), F.col("c").alias("cj"))
    slopes = (
        a.join(b, "g")
        .filter(F.col("hj") > F.col("hi"))
        .select(
            "g",
            (
                (F.col("cj") - F.col("ci")).cast("double")
                / (F.col("hj") - F.col("hi")).cast("double")
            ).alias("s"),
        )
    )
    w = Window.partitionBy("g").orderBy("s")
    ranked = slopes.withColumn("__rn", F.row_number().over(w)).withColumn(
        "__n", F.count(F.lit(1)).over(Window.partitionBy("g"))
    )
    mid = ranked.filter(
        (F.col("__rn") == F.floor((F.col("__n") + 1) / 2))
        | (F.col("__rn") == F.floor((F.col("__n") + 2) / 2))
    )
    nb = sig.groupBy("g").agg(F.count(F.lit(1)).alias("n_buckets"))
    med = mid.groupBy("g").agg(
        F.max("__n").alias("n_pairs"), F.avg("s").alias("sen_slope")
    )
    return nb.join(med, "g")


def seasonal_strength(
    df: DataFrame | None = None,
    bucket: str = "1h",
    by: str = "source",
    ts: str = "ts",
    period: int = 24,
    counts: DataFrame | None = None,
) -> DataFrame:
    """How seasonal is each series, as one number in [0, 1]: the
    fraction of bucket-count variance explained by the
    period-of-``period`` profile (hour-of-day for hourly buckets) —
    the gate that decides whether :func:`seasonal_anomaly`'s profile
    is a meaningful baseline for a series at all, or the series is
    trend/noise the profile would mis-flag.

        strength = 1 − SS_res / SS_tot
                 = (Σ_h s_h²/n_h − S²/N) / (Σ c² − S²/N)

    over the zero-filled bucket-count signal (xcorr/Theil-Sen's
    spine), where ``s_h, n_h`` are the per-phase sum and count and
    ``S, N, Σc²`` the series totals — the one-way-ANOVA identity, so
    no residual is ever materialized.  Sums of counts and of squared
    counts stay exact decimal(38,0); the only order-dependent float
    reduction is the ≤``period``-term Σ s_h²/n_h (rounded to 6 with
    the result).  Constant series (SS_tot = 0) have no defined
    strength and are dropped.

    Plan shape: one partial-aggregatable raw groupBy to bucket
    counts; both ANOVA aggregations run on the tiny signal frame.
    Output: ``g, n_buckets, strength``.
    """
    sig = bucket_count_signal(df, bucket=bucket, by=by, ts=ts,
                              counts=counts).select(
        "g", F.pmod(F.col("h"), F.lit(int(period))).alias("hod"), "c"
    )
    cd = F.col("c").cast("decimal(38,0)")
    per_h = sig.groupBy("g", "hod").agg(
        F.count(F.lit(1)).alias("n_h"), F.sum(cd).alias("s_h")
    )
    a = per_h.groupBy("g").agg(
        F.sum(
            F.col("s_h").cast("double") * F.col("s_h").cast("double")
            / F.col("n_h")
        ).alias("__a")
    )
    tot = sig.groupBy("g").agg(
        F.count(F.lit(1)).alias("n_buckets"),
        F.sum(cd).alias("__s"),
        F.sum(cd * F.col("c")).alias("__q"),
    )
    sn = (
        F.col("__s").cast("double") * F.col("__s").cast("double")
        / F.col("n_buckets")
    )
    ss_tot = F.col("__q").cast("double") - sn
    return (
        tot.join(a, "g")
        .filter(ss_tot > 0)
        .select(
            "g", "n_buckets",
            F.round((F.col("__a") - sn) / ss_tot, 6).alias("strength"),
        )
    )


def forecast_backtest(
    df: DataFrame | None = None,
    bucket: str = "1d",
    by: str = "source",
    ts: str = "ts",
    alpha: float = 0.3,
    beta: float = 0.1,
    counts: DataFrame | None = None,
) -> DataFrame:
    """One-step-ahead Holt backtest per series over the zero-filled
    bucket-count signal — the accuracy read that decides whether the
    EWMA/Holt family's forecasts are worth alerting on, reported as
    MASE (MAE of the model over MAE of the naive
    yesterday's-value forecast; < 1 = the smoother beats naive):

    at each step i >= 2 the fold FIRST scores the standing forecast
    ``l + t`` against the arriving actual (and the naive ``prev``),
    THEN consumes the actual into the Holt recurrence — a true
    walk-forward, no leakage.  One pure-JVM array fold per series
    (level, trend, error sums, prev in a flat struct accumulator),
    deterministic element order, so both engines produce bit-identical
    sums.

    Plan shape: one partial-aggregatable raw groupBy to bucket counts;
    the per-series day array is monitoring-horizon-bounded (the
    ewma/holt family's bounded-series model).  Output: ``g, n_days,
    mae_model, mae_naive, mase`` (mase NULL when the naive error is 0
    — a constant series has nothing to beat).
    """
    sig = bucket_count_signal(df, bucket=bucket, by=by, ts=ts,
                              counts=counts)
    arrs = sig.groupBy("g").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("h", "c"))),
            lambda s: s["c"].cast("double"),
        ).alias("__v")
    )
    a, an = F.lit(float(alpha)), F.lit(1.0 - float(alpha))
    b, bn = F.lit(float(beta)), F.lit(1.0 - float(beta))

    def step(acc, x):
        fc = acc["l"] + acc["t"]
        lvl = a * x + an * fc
        return F.struct(
            lvl.alias("l"),
            (b * (lvl - acc["l"]) + bn * acc["t"]).alias("t"),
            (acc["se"] + F.abs(x - fc)).alias("se"),
            (acc["sn"] + F.abs(x - acc["prev"])).alias("sn"),
            x.alias("prev"),
        )

    first = F.element_at("__v", 1)
    rest = F.expr("slice(__v, 2, greatest(size(__v) - 1, 0))")
    folded = arrs.select(
        "g",
        F.size("__v").alias("n_days"),
        F.aggregate(
            rest,
            F.struct(
                first.alias("l"), F.lit(0.0).alias("t"),
                F.lit(0.0).alias("se"), F.lit(0.0).alias("sn"),
                first.alias("prev"),
            ),
            step,
        ).alias("__acc"),
    ).filter(F.col("n_days") >= 2)
    steps = (F.col("n_days") - 1).cast("double")
    se, sn = F.col("__acc")["se"], F.col("__acc")["sn"]
    return folded.select(
        "g", "n_days",
        (se / steps).alias("mae_model"),
        (sn / steps).alias("mae_naive"),
        F.when(sn > 0, F.round(se / sn, 9)).alias("mase"),
    )


def ks_from_hists(
    ha: DataFrame,
    hb: DataFrame,
    by: tuple[str, ...] = ("source",),
) -> DataFrame:
    """Two-sample Kolmogorov–Smirnov D from two histogram count frames
    (``*by, bin, ca`` / ``*by, bin, cb``) — PSI's rank-based companion
    (:func:`psi_from_hists`): PSI weighs every bin's log-odds shift, KS
    reports the single worst CDF gap, so it catches a concentrated
    shift PSI's smoothing dilutes and is distribution-free (the 1.36 *
    sqrt((na+nb)/(na*nb)) alpha=0.05 fence applies regardless of
    shape).  Like the PSI pair, this is the tier-served drift path:
    feed per-period bin counts summed straight off a stored hist tier
    (hist.py) and the read never re-scans raw.

    Exactness: with per-bin cumulative counts CA_i, CB_i and totals
    na, nb,

        D = max_i |CA_i/na - CB_i/nb| = max_i |CA_i*nb - CB_i*na| / (na*nb)

    — the numerator is an EXACT integer per bin (decimal(38,0); counts
    up to 1e12 x 1e12 fit), so the argmax bin and the max numerator are
    engine-identical; the one division to ``ks_d`` runs on the same two
    decimal-cast doubles in both engines.  Tie rule: equal numerators
    resolve to the LARGEST bin (struct-max), deterministic.

    Plan shape: one full-outer join on the tiny bin table, one cumsum
    window per series over bins (bin-table-sized, never raw-sized),
    one groupBy.  Output: ``*by, n_a, n_b, ks_d, at_bin, drifted``
    (drifted = D above the alpha=0.05 distribution-free fence).
    """
    j = (
        ha.join(hb, [*by, "bin"], "full_outer")
        .select(
            *by, "bin",
            F.coalesce("ca", F.lit(0)).alias("ca"),
            F.coalesce("cb", F.lit(0)).alias("cb"),
        )
    )
    w = (
        Window.partitionBy(*by).orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = j.select(
        *by, "bin",
        F.sum(F.col("ca").cast("decimal(38,0)")).over(w).alias("cca"),
        F.sum(F.col("cb").cast("decimal(38,0)")).over(w).alias("ccb"),
    )
    tot = j.groupBy(*by).agg(
        F.sum("ca").alias("n_a"), F.sum("cb").alias("n_b")
    )
    t = cum.join(tot, list(by))
    num = F.abs(
        F.col("cca") * F.col("n_b").cast("decimal(38,0)")
        - F.col("ccb") * F.col("n_a").cast("decimal(38,0)")
    )
    best = t.groupBy(*by).agg(
        F.max("n_a").alias("n_a"), F.max("n_b").alias("n_b"),
        F.max(F.struct(num.alias("num"), F.col("bin"))).alias("__m"),
    )
    ks_d = (
        F.col("__m")["num"].cast("double")
        / (
            F.col("n_a").cast("decimal(38,0)")
            * F.col("n_b").cast("decimal(38,0)")
        ).cast("double")
    )
    # the alpha=0.05 large-sample fence c(alpha)*sqrt((na+nb)/(na*nb)),
    # c(0.05)=1.358 — distribution-free, so the drifted verdict needs no
    # assumption about the measure's shape; both operands are doubles of
    # exact integers, rounded 9dp before the compare (the slo_burn guard
    # against a last-ulp flip flipping the verdict cross-engine)
    fence = F.lit(1.358) * F.sqrt(
        (F.col("n_a") + F.col("n_b")).cast("double")
        / (
            F.col("n_a").cast("decimal(38,0)")
            * F.col("n_b").cast("decimal(38,0)")
        ).cast("double")
    )
    return best.select(
        *by, "n_a", "n_b",
        ks_d.alias("ks_d"),
        F.col("__m")["bin"].alias("at_bin"),
        (F.round(ks_d, 9) > F.round(fence, 9)).cast("int").alias("drifted"),
    )


def ks_drift(
    df_a: DataFrame,
    df_b: DataFrame,
    by: tuple[str, ...] = ("source",),
    val: str = "value",
    scale: int = 1,
) -> DataFrame:
    """Two-sample KS drift between two snapshots of the same measure,
    binned by the hist.py discretization (``round(v*scale)``) so the
    same read serves from raw or from a stored histogram tier
    (:func:`ks_from_hists`, parity-tested).  One groupBy per snapshot;
    everything downstream runs on the tiny bin table."""
    def hist(d, cname):
        return d.groupBy(
            *by, F.round(F.col(val) * scale).cast("long").alias("bin")
        ).agg(F.count("*").alias(cname))

    return ks_from_hists(hist(df_a, "ca"), hist(df_b, "cb"), by=by)


def fano_dispersion(
    df: DataFrame | None = None,
    bucket: str = "1h",
    by: str = "source",
    ts: str = "ts",
    ndigits: int = 9,
    counts: DataFrame | None = None,
) -> DataFrame:
    """Index of dispersion (Fano factor) per series over the
    zero-filled bucket-count signal — the burstiness gate the queueing
    literature uses: variance / mean of the per-bucket counts.  A
    Poisson arrival stream sits at 1; > 1 is bursty/clumped (sessions,
    batch ingest), < 1 is regular/paced (schedulers, rate limiters) —
    the one-number answer to "is this source's traffic machine-paced
    or bursty?" that decides whether a rollup tier needs salting.

    Exactness via cleared denominators (the acf_lags convention): with
    S = sum c, Q = sum c^2 and n buckets,

        fano = (n*Q - S^2) / (n*S)

    — numerator and denominator EXACT decimal integers off one
    partial-aggregatable groupBy, a single division, rounded
    ``ndigits``.  Empty series (S = 0) report NULL.  ``over_dispersed``
    = fano > 1 with both sides rounded (the usual last-ulp guard).
    Tier-servable via ``counts=`` like every signal monitor.  Output:
    ``g, n_buckets, mean_c, fano, over_dispersed``.
    """
    sig = bucket_count_signal(df, bucket=bucket, by=by, ts=ts,
                              counts=counts)
    g = sig.groupBy("g").agg(
        F.count(F.lit(1)).alias("n_buckets"),
        F.sum(F.col("c").cast("decimal(38,0)")).alias("__s"),
        F.sum(
            F.col("c").cast("decimal(38,0)")
            * F.col("c").cast("decimal(38,0)")
        ).alias("__q"),
    )
    n = F.col("n_buckets").cast("decimal(38,0)")
    num = n * F.col("__q") - F.col("__s") * F.col("__s")
    den = n * F.col("__s")
    fano = F.round(num.cast("double") / den.cast("double"), ndigits)
    return g.select(
        "g", "n_buckets",
        F.round(
            F.col("__s").cast("double")
            / F.col("n_buckets").cast("double"), ndigits
        ).alias("mean_c"),
        F.when(F.col("__s") > 0, fano).alias("fano"),
        F.when(F.col("__s") > 0,
               (fano > 1.0).cast("int")).alias("over_dispersed"),
    )


def mw_from_hists(
    ha: DataFrame,
    hb: DataFrame,
    by: tuple[str, ...] = ("source",),
    ndigits: int = 9,
) -> DataFrame:
    """Mann–Whitney U (Wilcoxon rank-sum) location-shift test from two
    histogram count frames (``*by, bin, ca`` / ``*by, bin, cb``) — the
    third member of the tier-served drift family: PSI weighs every
    bin's log-odds shift, KS reports the worst CDF gap (shape), MW asks
    the LOCATION question "did the measure systematically move up or
    down?" with a signed, tie-corrected z.  A distribution can drift
    heavily (KS fires) with zero median shift (MW silent) and vice
    versa, so monitors want both verdicts.

    Rank sums straight off the bin table — no per-row ranking ever
    happens: with tie-group size t_v = ca_v + cb_v at bin v and
    cum_lt(v) = count of observations in smaller bins, every member of
    bin v has average rank cum_lt + (t_v + 1)/2, so

        2*R_a = sum_v ca_v * (2*cum_lt(v) + t_v + 1)   (EXACT integer)
        2*U_a = 2*R_a - n_a*(n_a + 1)                  (EXACT integer)

    (doubling clears the half-integer average ranks).  The normal
    approximation with tie correction (T = sum_v t_v^3 - t_v):

        Var(U) = n_a*n_b * (n^3 - n - T) / (12*n*(n-1)),  n = n_a+n_b
        z = (2U - n_a*n_b -/+ 1) / (2*sqrt(Var))   (continuity-corrected)

    Exactness: 2R, 2U, the variance numerator ``n^3 - n - T`` and the
    denominator ``12n(n-1)`` are all exact decimal(38,0) integers
    (magnitude budget: n^3 fits 38 digits to n ~ 10^12 observations per
    group); each is cast to double ONCE and combined in a fixed
    parenthesization, so z is engine-identical and only rounded to
    ``ndigits`` as a guard.  Degenerate regimes return NULL z: a group
    present in only one sample (n_a*n_b = 0) and the all-tied group
    (T = n^3 - n, variance 0) — no shift is decidable.  ``shifted`` is
    the alpha=0.05 two-sided verdict |z| > 1.96 (NULL propagates).

    Plan shape: ks_from_hists' exactly — full-outer join of the two
    tiny bin tables, one cumsum window over bins per group, one
    groupBy.  Serve per-period ``ca``/``cb`` by summing a stored hist
    tier's counts (parity-tested) and the read never re-scans raw.
    Output: ``*by, n_a, n_b, u_a, z, shifted``.
    """
    j = (
        ha.join(hb, [*by, "bin"], "full_outer")
        .select(
            *by, "bin",
            F.coalesce("ca", F.lit(0)).cast("decimal(38,0)").alias("ca"),
            F.coalesce("cb", F.lit(0)).cast("decimal(38,0)").alias("cb"),
        )
    )
    w_lt = (
        Window.partitionBy(*by).orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    t = F.col("ca") + F.col("cb")
    per_bin = j.select(
        *by, "ca", "cb", t.alias("t"),
        F.coalesce(F.sum(t).over(w_lt), F.lit(0).cast("decimal(38,0)"))
        .alias("cum_lt"),
    )
    g = per_bin.groupBy(*by).agg(
        F.sum("ca").alias("n_a"),
        F.sum("cb").alias("n_b"),
        F.sum(
            F.col("ca") * (2 * F.col("cum_lt") + F.col("t") + 1)
        ).alias("__r2"),
        F.sum(
            F.col("t") * F.col("t") * F.col("t") - F.col("t")
        ).alias("__tt"),
    )
    n = F.col("n_a") + F.col("n_b")
    u2 = F.col("__r2") - F.col("n_a") * (F.col("n_a") + 1)  # 2*U_a, exact
    d2 = u2 - F.col("n_a") * F.col("n_b")                   # 2*(U - mu)
    var_num = n * n * n - n - F.col("__tt")                 # exact
    var_s = (
        (F.col("n_a") * F.col("n_b")).cast("double")
        * var_num.cast("double")
        / (12 * n * (n - 1)).cast("double")
    )
    z = F.when(d2 > 0, (d2 - 1).cast("double") / (2 * F.sqrt(var_s))) \
         .when(d2 < 0, (d2 + 1).cast("double") / (2 * F.sqrt(var_s))) \
         .otherwise(F.lit(0.0))
    z_out = F.when(
        (F.col("n_a") * F.col("n_b") > 0) & (var_num > 0),
        F.round(z, ndigits),
    )
    return g.select(
        *by,
        F.col("n_a").cast("long").alias("n_a"),
        F.col("n_b").cast("long").alias("n_b"),
        (u2.cast("double") / F.lit(2.0)).alias("u_a"),
        z_out.alias("z"),
        (F.round(F.abs(z_out), ndigits) > 1.96).cast("int").alias("shifted"),
    )


def mann_whitney(
    df_a: DataFrame,
    df_b: DataFrame,
    by: tuple[str, ...] = ("source",),
    val: str = "value",
    scale: int = 1,
) -> DataFrame:
    """Two-sample Mann–Whitney location-shift drift between two
    snapshots of the same measure, binned by the hist.py discretization
    (``round(v*scale)``) so the same read serves from raw or from a
    stored histogram tier (:func:`mw_from_hists`, parity-tested) —
    ks_drift's signed companion: KS says THAT the distribution moved,
    MW says WHICH WAY and whether the shift survives the alpha=0.05
    rank test.  One groupBy per snapshot; everything downstream runs on
    the tiny bin table."""
    def hist(d, cname):
        return d.groupBy(
            *by, F.round(F.col(val) * scale).cast("long").alias("bin")
        ).agg(F.count("*").alias(cname))

    return mw_from_hists(hist(df_a, "ca"), hist(df_b, "cb"), by=by)


def mann_kendall(
    df: DataFrame | None = None,
    bucket: str = "1h",
    by: str = "source",
    ts: str = "ts",
    ndigits: int = 9,
    counts: DataFrame | None = None,
) -> DataFrame:
    """Mann–Kendall monotonic-trend test per series over the
    zero-filled bucket-count signal — the SIGNIFICANCE gate for
    :func:`theil_sen`: Theil–Sen reports a robust slope for every
    series; MK's normalized Z says whether the monotone tendency is
    real or noise (|z| > 1.96 ~ alpha=0.05).

        S = sum_{i<j} sign(c_j - c_i)                (exact integer)
        Var(S) = [n(n-1)(2n+5) - sum_t t(t-1)(2t+5)] / 18
                                        (t = tie-group sizes, exact)
        z = (S -/+ 1) / sqrt(Var(S))    (continuity-corrected; 0 at S=0)

    Exactness: S is an integer sum of signs; the variance NUMERATOR is
    an exact integer assembled from n and the tie-group sizes (one
    groupBy on the tiny signal frame), so z is doubles-of-exact-
    integers through one /18, one sqrt, one division — identical IEEE
    results in both engines, rounded to ``ndigits`` only as a guard.
    Constant series (Var = 0) report z NULL — no trend is decidable.

    Plan shape: theil_sen's exactly — ONE raw-scale partial-
    aggregatable groupBy to bucket counts; the O(m^2) sign pairs and
    the tie census run on the tiny signal frame.  Output: ``g,
    n_buckets, s_stat, var_s, z``.
    """
    sig = bucket_count_signal(df, bucket=bucket, by=by, ts=ts,
                              counts=counts)
    a = sig.select("g", F.col("h").alias("hi"), F.col("c").alias("ci"))
    b = sig.select("g", F.col("h").alias("hj"), F.col("c").alias("cj"))
    s = (
        a.join(b, "g")
        .filter(F.col("hj") > F.col("hi"))
        .groupBy("g")
        .agg(F.sum(F.signum(F.col("cj") - F.col("ci")).cast("long"))
             .alias("s_stat"))
    )
    nb = sig.groupBy("g").agg(F.count(F.lit(1)).alias("n_buckets"))
    tie = (
        sig.groupBy("g", "c").agg(F.count(F.lit(1)).alias("t"))
        .groupBy("g")
        .agg(F.sum(
            F.col("t") * (F.col("t") - 1) * (2 * F.col("t") + 5)
        ).alias("__tt"))
    )
    n = F.col("n_buckets")
    var_num = n * (n - 1) * (2 * n + 5) - F.col("__tt")
    var_s = var_num.cast("double") / F.lit(18.0)
    z = F.when(
        F.col("s_stat") > 0,
        (F.col("s_stat") - 1).cast("double") / F.sqrt(var_s),
    ).when(
        F.col("s_stat") < 0,
        (F.col("s_stat") + 1).cast("double") / F.sqrt(var_s),
    ).otherwise(F.lit(0.0))
    return (
        nb.join(s, "g").join(tie, "g")
        .select(
            "g", "n_buckets", "s_stat", var_s.alias("var_s"),
            F.when(var_num > 0, F.round(z, ndigits)).alias("z"),
        )
    )


def acf_lags(
    df: DataFrame | None = None,
    max_lag: int = 6,
    bucket: str = "1h",
    by: str = "source",
    ts: str = "ts",
    counts: DataFrame | None = None,
) -> DataFrame:
    """Classic autocorrelation function per series over the zero-filled
    bucket-count signal: for lag k,

        r_k = sum_{t>k} (c_t - mean)(c_{t-k} - mean) / sum_t (c_t - mean)^2

    — the FULL-SERIES-mean, SS_tot-denominator definition statistics
    texts (and :func:`ljung_box`) require, distinct from
    :func:`xcorr_lags`' windowed-pair normalization (xcorr re-centers
    per aligned window; ACF centers once, so r_k values plug into
    portmanteau tests).

    Exactness via cleared denominators: with S = sum c and n buckets,
    work on d_t = n*c_t - S (EXACT integers, decimal(38,0));

        r_k = sum d_t d_{t-k} / sum d_t^2

    both sums exact, one division of decimal-cast doubles — engine-
    identical, no float mean ever materialized.  Constant series
    (den = 0) are dropped.

    Plan shape: ONE raw-scale partial-aggregatable groupBy to bucket
    counts; the lag joins run on the tiny signal frame x ``max_lag``.
    Output: ``g, lag, n_buckets, r``.
    """
    sig = bucket_count_signal(df, bucket=bucket, by=by, ts=ts,
                              counts=counts)
    tot = sig.groupBy("g").agg(
        F.count(F.lit(1)).alias("n_buckets"),
        F.sum(F.col("c").cast("decimal(38,0)")).alias("__s"),
    )
    dd = sig.join(tot, "g").select(
        "g", "h", "n_buckets",
        (
            F.col("n_buckets").cast("decimal(38,0)")
            * F.col("c").cast("decimal(38,0)")
            - F.col("__s")
        ).alias("d"),
    )
    den = dd.groupBy("g").agg(
        F.max("n_buckets").alias("n_buckets"),
        F.sum(F.col("d") * F.col("d")).alias("__den"),
    )
    lags = F.broadcast(
        sig.sparkSession.range(1, max_lag + 1)
        .select(F.col("id").cast("int").alias("lag"))
    )
    al = dd.select("g", F.col("h").alias("ht"), F.col("d").alias("dt"))
    bl = dd.select("g", F.col("h").alias("hp"), F.col("d").alias("dp"))
    num = (
        al.crossJoin(lags)
        .join(bl, (F.col("hp") == F.col("ht") - F.col("lag"))
              & (al["g"] == bl["g"]))
        .select(al["g"].alias("g"), "lag",
                (F.col("dt") * F.col("dp")).alias("__p"))
        .groupBy("g", "lag")
        .agg(F.sum("__p").alias("__num"))
    )
    return (
        num.join(den, "g")
        .filter(F.col("__den") > 0)
        .select(
            "g", "lag", "n_buckets",
            (F.col("__num").cast("double")
             / F.col("__den").cast("double")).alias("r"),
        )
    )


def dominant_period(
    df: DataFrame | None = None,
    max_lag: int = 30,
    min_lag: int = 2,
    bucket: str = "1h",
    by: str = "source",
    ts: str = "ts",
    counts: DataFrame | None = None,
) -> DataFrame:
    """Seasonality-period DETECTION per series — the missing front end
    of the seasonal family: :func:`seasonal_profile` /
    :func:`seasonal_strength` score a KNOWN period P; this finds the
    candidate P as the lag of the maximum autocorrelation in
    ``[min_lag, max_lag]`` (lag 1 excluded by default — trend/smooth
    series peak there trivially, which is persistence, not
    seasonality), plus the classic white-noise 95% band verdict
    ``r > 1.96/sqrt(n)`` saying whether the peak is real structure.

    Exactness: :func:`acf_lags`' r values are single divisions of
    exact decimal integers — engine-identical doubles — so the argmax
    is deterministic; exact r ties break to the SMALLEST lag (the
    fundamental beats its harmonics), and the fence compare rounds
    both sides 9dp (the slo_burn last-ulp guard).

    Plan shape: acf_lags' one raw-scale groupBy; the max/pick run on
    the (groups x max_lag) frame.  Serve from a stored rollup tier via
    ``counts=`` exactly like theil_sen/acf (tier parity holds because
    the bucket-count signal is lossless off the tier).  Output: ``g,
    n_buckets, period, r, significant``.
    """
    acf = acf_lags(df, max_lag=max_lag, bucket=bucket, by=by, ts=ts,
                   counts=counts)
    cand = acf.filter(F.col("lag") >= int(min_lag))
    best = cand.groupBy("g").agg(
        F.max("r").alias("r"), F.max("n_buckets").alias("n_buckets")
    )
    pick = (
        cand.select("g", "lag", "r")
        .join(best.select("g", "r"), ["g", "r"])
        .groupBy("g").agg(F.min("lag").alias("period"))
    )
    fence = F.lit(1.96) / F.sqrt(F.col("n_buckets").cast("double"))
    return best.join(pick, "g").select(
        "g", "n_buckets", "period", "r",
        (F.round(F.col("r"), 9) > F.round(fence, 9)).cast("int")
        .alias("significant"),
    )


def ljung_box(
    df: DataFrame | None = None,
    max_lag: int = 6,
    bucket: str = "1h",
    by: str = "source",
    ts: str = "ts",
    ndigits: int = 6,
    counts: DataFrame | None = None,
) -> DataFrame:
    """Ljung–Box portmanteau statistic per series — "is this signal
    white noise?", the gate that tells the EWMA/Holt/seasonal monitors
    whether there is any structure to model at all:

        Q = n(n+2) * sum_{k=1..K} r_k^2 / (n-k)

    with the :func:`acf_lags` autocorrelations (chi^2_K under the
    null; Q > the chi^2 fence means real structure).  Each r_k is
    engine-identical (exact-integer construction); the K-term float
    sum is the only order-dependent reduction and Q is rounded to
    ``ndigits`` with ~1e-15 association noise far under it (the
    seasonal_strength budget).  Output: ``g, n_buckets, k_lags, q``.
    """
    r = acf_lags(df, max_lag=max_lag, bucket=bucket, by=by, ts=ts,
                 counts=counts)
    n = F.col("n_buckets").cast("double")
    term = F.col("r") * F.col("r") / (n - F.col("lag").cast("double"))
    return (
        r.groupBy("g")
        .agg(
            F.max("n_buckets").alias("n_buckets"),
            F.count(F.lit(1)).cast("int").alias("k_lags"),
            F.round(
                F.max(n * (n + 2.0)) * F.sum(term), ndigits
            ).alias("q"),
        )
    )


#: chi-square critical value at 8 degrees of freedom, alpha = 0.05 — the
#: Benford first-digit test has 9 categories, hence 8 df.
_CHI2_8DF_05 = 15.50731
#: Benford expected first-digit probabilities log10(1 + 1/d), d = 1..9,
#: as repr-stable literals shared verbatim with the DuckDB oracle (the
#: forecast_backtest coefficient convention — neither engine computes a
#: log at query time, so there is no libm to disagree about).
BENFORD_P = [
    0.3010299956639812, 0.17609125905568124, 0.12493873660829992,
    0.09691001300805642, 0.07918124604762482, 0.06694678963061322,
    0.05799194697768673, 0.05115252244738129, 0.04575749056067514,
]


def benford_digits(
    df: DataFrame,
    value_col: str = "value",
    by: str = "source",
    scale: int = 1000,
    ndigits: int = 6,
) -> DataFrame:
    """Benford first-significant-digit audit per group — the classic
    data-forensics read over a measure column: naturally-grown
    magnitudes (populations, latencies spanning decades, financial
    amounts) follow ``P(d) = log10(1 + 1/d)``; fabricated, clipped,
    defaulted, or unit-mangled feeds don't.  A per-source chi-square
    against the Benford law is the cheap "did this ingest change how
    its numbers are made?" tripwire next to the distribution monitors
    (PSI/KS watch drift between two windows; this tests SHAPE against
    an absolute law, no baseline window needed).

    Digit extraction is engine-exact: values are fixed-pointed first
    (``round(|v|·scale)`` as int64 — the repo's standard scaling, both
    engines round the identical double half-away-from-zero), zeros and
    NULLs drop (no leading digit), and the first digit is character 1
    of the INTEGER's decimal string — integer-to-string is
    bit-identical everywhere, so no ``log10``/``pow`` float tricks can
    flip a digit cross-engine.

    Statistic: with per-digit counts o_d and n = Σo_d,

        chi2 = Σ_d (o_d − n·p_d)²/(n·p_d) = (Σ_d o_d²/p_d)/n − n

    — the algebraic form means digits with ZERO observations need no
    zero-fill row (they contribute nothing to Σ o²/p).  o_d and n are
    exact integers; Σ o²/p is the only float reduction (≤ 9 terms,
    rounded ``ndigits``).  ``benford_ok`` = chi2 ≤ 15.50731 (8 df,
    alpha = 0.05), both sides rounded before comparing (the usual
    last-ulp guard).  ``d1_share`` = leading-1 fraction (Benford
    expects 0.30103) as the human-readable companion number.

    Plan shape for 100 TB: ONE partial-aggregatable groupBy(by, digit)
    count over raw (map-side combine bounds the stream at ≤ 9 rows per
    group per task), then a ≤ 9-rows-per-group assembly.  Output:
    ``g, n, chi2, d1_share, benford_ok``.
    """
    fixed = F.round(F.abs(F.col(value_col)) * F.lit(float(scale)), 0).cast(
        "long"
    )
    digit = F.substring(F.col("__i").cast("string"), 1, 1).cast("int")
    counts = (
        df.select(F.col(by).alias("g"), fixed.alias("__i"))
        .filter(F.col("__i") > 0)
        .select("g", digit.alias("d"))
        .groupBy("g", "d")
        .agg(F.count(F.lit(1)).alias("o"))
    )
    p = F.element_at(F.array(*[F.lit(x) for x in BENFORD_P]), F.col("d"))
    o = F.col("o").cast("double")
    g = counts.groupBy("g").agg(
        F.sum("o").alias("n"),
        F.sum(o * o / p).alias("__soop"),
        F.sum(F.when(F.col("d") == 1, F.col("o")).otherwise(F.lit(0)))
        .alias("__o1"),
    )
    n = F.col("n").cast("double")
    chi2 = F.round(F.col("__soop") / n - n, ndigits)
    return g.select(
        "g", "n", chi2.alias("chi2"),
        F.round(F.col("__o1").cast("double") / n, ndigits).alias("d1_share"),
        (chi2 <= F.lit(_CHI2_8DF_05)).cast("int").alias("benford_ok"),
    )


def _pair_hists(df_a, df_b, by, val, scale):
    """The psi/ks/mw snapshot discretization (``round(v*scale)``, the
    hist.py bin convention) — two count frames ready for any
    ``*_from_hists`` read, so every drift statistic in this family can
    also be served from a stored histogram tier."""
    def hist(d, cname):
        return d.groupBy(
            *by, F.round(F.col(val) * scale).cast("long").alias("bin")
        ).agg(F.count("*").alias(cname))

    return hist(df_a, "ca"), hist(df_b, "cb")


def emd_from_hists(
    ha: DataFrame,
    hb: DataFrame,
    by: tuple[str, ...] = ("source",),
) -> DataFrame:
    """1-D earth mover's distance (Wasserstein-1) between two histogram
    count frames (``*by, bin, ca`` / ``*by, bin, cb``) — the
    MAGNITUDE companion to :func:`ks_from_hists`: KS reports the single
    worst CDF gap (did it drift?), EMD integrates |CDF_a - CDF_b| over
    the value axis (by how MUCH, in bin units — divide by the hist
    scale for value units), so a small shift of the whole mass and a
    large shift of a sliver score differently where KS can tie them.

    Exactness: on a discrete support the CDF is a step function —
    constant between observed bins — so

        W1 = sum_i |CA_i*nb - CB_i*na| * (bin_{i+1} - bin_i) / (na*nb)

    where the per-step numerator |CA*nb - CB*na| * gap is an EXACT
    decimal integer (the ks_from_hists CDF-gap numerator times an
    integer gap), the sum of exact decimals is exact, and the ONE
    final division runs on the same two doubles in any engine — no
    rounding guard needed, unlike the ln-based family.  The last bin
    contributes nothing (both CDFs have reached 1, the numerator is
    identically 0), so ``lead`` needing no default is not a hole.

    Like the PSI/KS pair this is the tier-served drift path: feed
    per-period bin counts summed straight off a stored hist tier and
    the read never re-scans raw.  Plan shape: one full-outer join on
    the tiny bin table, one cumsum + lead window per series over bins,
    one groupBy.  Output: ``*by, n_a, n_b, emd`` (bin units).
    """
    j = (
        ha.join(hb, [*by, "bin"], "full_outer")
        .select(
            *by, "bin",
            F.coalesce("ca", F.lit(0)).alias("ca"),
            F.coalesce("cb", F.lit(0)).alias("cb"),
        )
    )
    wo = Window.partitionBy(*by).orderBy("bin")
    w = wo.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cum = j.select(
        *by, "bin",
        F.sum(F.col("ca").cast("decimal(38,0)")).over(w).alias("cca"),
        F.sum(F.col("cb").cast("decimal(38,0)")).over(w).alias("ccb"),
        (F.lead("bin").over(wo) - F.col("bin")).alias("__gap"),
    )
    tot = j.groupBy(*by).agg(
        F.sum("ca").alias("n_a"), F.sum("cb").alias("n_b")
    )
    t = cum.join(tot, list(by))
    num = F.abs(
        F.col("cca") * F.col("n_b").cast("decimal(38,0)")
        - F.col("ccb") * F.col("n_a").cast("decimal(38,0)")
    ) * F.coalesce(F.col("__gap"), F.lit(0)).cast("decimal(38,0)")
    agg = t.groupBy(*by).agg(
        F.max("n_a").alias("n_a"), F.max("n_b").alias("n_b"),
        F.sum(num).alias("__num"),
    )
    return agg.select(
        *by, "n_a", "n_b",
        (
            F.col("__num").cast("double")
            / (
                F.col("n_a").cast("decimal(38,0)")
                * F.col("n_b").cast("decimal(38,0)")
            ).cast("double")
        ).alias("emd"),
    )


def emd_drift(
    df_a: DataFrame,
    df_b: DataFrame,
    by: tuple[str, ...] = ("source",),
    val: str = "value",
    scale: int = 1,
) -> DataFrame:
    """Wasserstein-1 drift between two snapshots of the same measure,
    binned by the hist.py discretization so the same read serves from
    raw or from a stored histogram tier (:func:`emd_from_hists`,
    parity-tested).  One groupBy per snapshot; everything downstream
    runs on the tiny bin table."""
    ha, hb = _pair_hists(df_a, df_b, by, val, scale)
    return emd_from_hists(ha, hb, by=by)


def jsd_from_hists(
    ha: DataFrame,
    hb: DataFrame,
    by: tuple[str, ...] = ("source",),
    ndigits: int = 6,
) -> DataFrame:
    """Jensen-Shannon divergence between two histogram count frames —
    the BOUNDED, symmetric member of the drift family: PSI is unbounded
    and needs Laplace smoothing to survive one-sided bins; JSD is
    finite by construction (a bin observed on one side only contributes
    p/2 * ln 2 through the mixture), symmetric, and capped at ln 2, so
    thresholds transfer across measures with different supports.

        JSD = ( KL(p || m) + KL(q || m) ) / 2,    m = (p + q)/2

    with p_i = ca_i/na, q_i = cb_i/nb — doubles of exact integers, so
    every per-bin term is engine-identical; the term SUM is the one
    order-dependent float reduction, rounded to ``ndigits`` (the
    source_entropy convention; association noise ~1e-15 sits far under
    it).  Zero-count bins contribute exactly 0 for their side (the
    0*ln(0) limit), taken via a WHEN guard, never an epsilon.

    Tier-served like the rest of the family (feed per-period bin counts
    off a stored hist tier).  Output: ``*by, n_bins, n_a, n_b, jsd,
    jsd_norm`` (jsd_norm = jsd/ln 2 in [0, 1]).
    """
    j = (
        ha.join(hb, [*by, "bin"], "full_outer")
        .select(
            *by,
            F.coalesce("ca", F.lit(0)).alias("ca"),
            F.coalesce("cb", F.lit(0)).alias("cb"),
        )
    )
    tot = j.groupBy(*by).agg(
        F.sum("ca").alias("na"), F.sum("cb").alias("nb"),
        F.count("*").alias("n_bins"),
    )
    t = j.join(tot, list(by))
    p = F.col("ca").cast("double") / F.col("na").cast("double")
    q = F.col("cb").cast("double") / F.col("nb").cast("double")
    m = (p + q) / F.lit(2.0)
    term = (
        F.when(F.col("ca") > 0, p * F.log(p / m)).otherwise(F.lit(0.0))
        + F.when(F.col("cb") > 0, q * F.log(q / m)).otherwise(F.lit(0.0))
    ) / F.lit(2.0)
    out = t.groupBy(*by).agg(
        F.max("n_bins").alias("n_bins"),
        F.max("na").alias("n_a"), F.max("nb").alias("n_b"),
        F.sum(term).alias("__jsd"),
    )
    return out.select(
        *by, "n_bins", "n_a", "n_b",
        F.round(F.col("__jsd"), ndigits).alias("jsd"),
        F.round(F.col("__jsd") / F.lit(float(_LN2)), ndigits)
        .alias("jsd_norm"),
    )


_LN2 = 0.6931471805599453


def jsd_drift(
    df_a: DataFrame,
    df_b: DataFrame,
    by: tuple[str, ...] = ("source",),
    val: str = "value",
    scale: int = 1,
    ndigits: int = 6,
) -> DataFrame:
    """JSD drift between two snapshots of the same measure, binned by
    the hist.py discretization so the same read serves from raw or from
    a stored histogram tier (:func:`jsd_from_hists`, parity-tested)."""
    ha, hb = _pair_hists(df_a, df_b, by, val, scale)
    return jsd_from_hists(ha, hb, by=by, ndigits=ndigits)


def chi2_from_hists(
    ha: DataFrame,
    hb: DataFrame,
    by: tuple[str, ...] = ("source",),
    alpha_z: float = 1.6449,
    ndigits: int = 6,
) -> DataFrame:
    """Pearson chi-square homogeneity test between two histogram count
    frames — the SIGNIFICANCE member of the drift family: PSI/JSD/EMD
    report effect sizes with rule-of-thumb thresholds; chi-square turns
    the same 2 x B contingency table into a test statistic with a
    calibrated false-alarm rate, so tiny drifts on huge samples and
    huge drifts on tiny samples are judged on the same footing.

    For the 2 x B table with row totals na, nb (N = na + nb) and bin
    column totals t_i = ca_i + cb_i, the classic statistic collapses to

        chi2 = sum_i (ca_i*nb - cb_i*na)^2 / t_i   /   (na * nb)

    (derivation: both rows' (o-e)^2/e terms share the numerator
    (ca*nb - cb*na)^2/N^2 and their 1/e factors sum to N^2/(t*na*nb)).
    The per-bin difference ca*nb - cb*na is an exact decimal integer;
    SQUARING it can exceed decimal(38) at the 1e12-count design scale,
    so each term is computed as a double OF exact integers (d*d/t —
    engine-identical per term) and the term sum is the one
    order-dependent float reduction, rounded to ``ndigits`` with the
    result (association noise ~1e-15 relative).

    Verdict: ``drifted`` compares chi2 against the Wilson-Hilferty
    alpha≈0.05 critical value  dof*(1 - 2/(9 dof) + z*sqrt(2/(9 dof)))^3
    with z = ``alpha_z`` (1.6449 = one-sided 0.05 normal quantile) —
    the standard closed-form chi-square quantile approximation (exact
    enough for dof >= 3, slightly conservative below), both sides
    rounded to 9 dp before the compare (the slo_burn guard).  Also
    reported: ``cramers_v`` = sqrt(chi2/N) (the 2-row Cramer's V),
    the sample-size-free effect size.

    Tier-served like the rest of the family.  Output: ``*by, n_a, n_b,
    dof, chi2, cramers_v, drifted``.  Bins empty on BOTH sides can't
    occur (the join only yields observed bins); dof = n_bins - 1.
    """
    j = (
        ha.join(hb, [*by, "bin"], "full_outer")
        .select(
            *by,
            F.coalesce("ca", F.lit(0)).alias("ca"),
            F.coalesce("cb", F.lit(0)).alias("cb"),
        )
    )
    tot = j.groupBy(*by).agg(
        F.sum("ca").alias("na"), F.sum("cb").alias("nb"),
        F.count("*").alias("n_bins"),
    )
    t = j.join(tot, list(by))
    d = (
        F.col("ca").cast("decimal(38,0)") * F.col("nb").cast("decimal(38,0)")
        - F.col("cb").cast("decimal(38,0)") * F.col("na").cast("decimal(38,0)")
    ).cast("double")
    term = d * d / (F.col("ca") + F.col("cb")).cast("double")
    g = t.groupBy(*by).agg(
        F.max("na").alias("n_a"), F.max("nb").alias("n_b"),
        (F.max("n_bins") - 1).alias("dof"),
        F.sum(term).alias("__s"),
    )
    chi2 = F.round(
        F.col("__s")
        / (
            F.col("n_a").cast("decimal(38,0)")
            * F.col("n_b").cast("decimal(38,0)")
        ).cast("double"),
        ndigits,
    )
    dofd = F.col("dof").cast("double")
    wh = dofd * F.pow(
        F.lit(1.0) - F.lit(2.0) / (F.lit(9.0) * dofd)
        + F.lit(float(alpha_z)) * F.sqrt(F.lit(2.0) / (F.lit(9.0) * dofd)),
        F.lit(3.0),
    )
    n_tot = (F.col("n_a") + F.col("n_b")).cast("double")
    return (
        g.filter(F.col("dof") >= 1)
        .withColumn("chi2", chi2)
        .select(
            *by, "n_a", "n_b", "dof", "chi2",
            F.round(F.sqrt(F.col("chi2") / n_tot), ndigits)
            .alias("cramers_v"),
            (F.round(F.col("chi2"), 9) > F.round(wh, 9)).cast("int")
            .alias("drifted"),
        )
    )


def chi2_drift(
    df_a: DataFrame,
    df_b: DataFrame,
    by: tuple[str, ...] = ("source",),
    val: str = "value",
    scale: int = 1,
    ndigits: int = 6,
) -> DataFrame:
    """Chi-square homogeneity drift between two snapshots of the same
    measure, binned by the hist.py discretization so the same read
    serves from raw or from a stored histogram tier
    (:func:`chi2_from_hists`, parity-tested)."""
    ha, hb = _pair_hists(df_a, df_b, by, val, scale)
    return chi2_from_hists(ha, hb, by=by, ndigits=ndigits)


def welch_ttest(
    df_a: DataFrame,
    df_b: DataFrame,
    by: tuple[str, ...] = ("source",),
    val: str = "value",
    value_scale: int = 1000,
    ndigits: int = 6,
) -> DataFrame:
    """Welch's unequal-variance t-test on the MEAN of a measure between
    two snapshots — the parametric companion to :func:`mann_whitney`:
    MW asks "did the distribution's location shift" rank-wise (robust,
    but a verdict only); Welch reports the mean shift IN VALUE UNITS
    with a significance verdict, which is what a capacity model or a
    cost forecast actually consumes.  Welch rather than pooled Student:
    snapshot variances genuinely differ under drift, which is the very
    thing being tested.

    Exactness: values are fixed-point scaled (``round(v*value_scale)``
    -> int64, the cusum convention), so each side's n, sum, and sum of
    squares are EXACT decimal(38,0) aggregates with no float-
    association noise; the variance numerator  n*S2 - S^2  stays an
    exact decimal; then ONE fixed-parenthesization double combine

        t  = (ma - mb) / sqrt(va/na + vb/nb)
        df = (va/na + vb/nb)^2 /
             ( (va/na)^2/(na-1) + (vb/nb)^2/(nb-1) )

    (v = sample variance, computed va = (n*S2 - S^2)/(n*(n-1)) as
    doubles of exact decimals) runs identically in any engine; t and
    df are rounded to ``ndigits`` and the ``shifted`` verdict compares
    |t| > 1.96 (the large-sample two-sided alpha=0.05 normal fence —
    at monitoring sample sizes the t quantile is indistinguishable)
    with both sides rounded 9 dp first.

    Plan shape: ONE partial-aggregatable groupBy per snapshot; the
    combine runs on the |groups|-sized frame.  Output: ``*by, n_a,
    n_b, mean_a, mean_b, t, df, shifted`` (means descaled; groups
    with n < 2 on either side or zero variance on both report NULL t).
    """
    def moments(d, suf):
        y = F.round(F.col(val) * F.lit(int(value_scale))).cast("long")
        yd = y.cast("decimal(38,0)")
        return d.groupBy(*by).agg(
            F.count(F.lit(1)).alias(f"n_{suf}"),
            F.sum(yd).alias(f"s_{suf}"),
            F.sum(yd * y).alias(f"q_{suf}"),
        )

    m = moments(df_a, "a").join(moments(df_b, "b"), list(by))
    na, nb = F.col("n_a").cast("double"), F.col("n_b").cast("double")
    vs = float(value_scale)
    mean_a = F.col("s_a").cast("double") / na / F.lit(vs)
    mean_b = F.col("s_b").cast("double") / nb / F.lit(vs)
    va_num = (
        F.col("n_a").cast("decimal(38,0)") * F.col("q_a")
        - F.col("s_a") * F.col("s_a")
    ).cast("double")
    vb_num = (
        F.col("n_b").cast("decimal(38,0)") * F.col("q_b")
        - F.col("s_b") * F.col("s_b")
    ).cast("double")
    # va/na with va = va_num/(na*(na-1)) — keep the parenthesization
    # IDENTICAL in the oracle: (va_num / (na * (na - 1.0))) / na
    sa = va_num / (na * (na - F.lit(1.0))) / na / F.lit(vs * vs)
    sb = vb_num / (nb * (nb - F.lit(1.0))) / nb / F.lit(vs * vs)
    se2 = sa + sb
    t_stat = (mean_a - mean_b) / F.sqrt(se2)
    dfw = (se2 * se2) / (
        sa * sa / (na - F.lit(1.0)) + sb * sb / (nb - F.lit(1.0))
    )
    ok = (F.col("n_a") >= 2) & (F.col("n_b") >= 2) & (va_num + vb_num > 0)
    return m.select(
        *by, "n_a", "n_b",
        F.round(mean_a, ndigits).alias("mean_a"),
        F.round(mean_b, ndigits).alias("mean_b"),
        F.when(ok, F.round(t_stat, ndigits)).alias("t"),
        F.when(ok, F.round(dfw, ndigits)).alias("df"),
        F.when(ok, (F.round(F.abs(t_stat), 9) > F.lit(1.96)).cast("int"))
        .alias("shifted"),
    )


def kendall_pairs(
    df: DataFrame | None = None,
    bucket: str = "1h",
    by: str = "source",
    ts: str = "ts",
    counts: DataFrame | None = None,
) -> DataFrame:
    """Kendall's tau-b between every pair of per-series bucket-count
    signals — :func:`spearman_pairs`' concordance companion: Spearman
    correlates the RANKS (one wild bucket still moves its rank far),
    tau counts concordant vs discordant bucket pairs, so it is the
    most outlier-insensitive of the three co-movement reads and its
    value has a direct probabilistic reading (P(concordant) -
    P(discordant)).

    Exactness: everything up to the last step is exact integers —

        S   = sum_{i<j} sign(x_j - x_i) * sign(y_j - y_i)
        tau = S / sqrt( (n0 - n1) * (n0 - n2) )

    with n0 = n(n-1)/2 and the tie corrections n1 = sum t_x(t_x-1)/2,
    n2 = sum t_y(t_y-1)/2 (tau-b: ties in either signal shrink the
    denominator instead of silently diluting S).  The one float op is
    the final division by the sqrt of a product of exact decimals —
    engine-identical, no rounding guard needed (the spearman_pairs
    convention).

    Plan shape: one partial-aggregatable raw groupBy to bucket counts;
    the O(m^2) bucket-pair join and the tie tables run on the tiny
    zero-filled signal frame (m = span/bucket — a monitoring read, not
    a corpus-scale op).  Pairs are emitted once (a < b).  Output:
    ``a, b, n, s_stat, tau`` (NULL tau when either signal is constant
    — concordance is undefined against a flat line).
    """
    sig = bucket_count_signal(df, bucket=bucket, by=by, ts=ts,
                              counts=counts)
    a = sig.select(F.col("g").alias("a"), "h", F.col("c").alias("x"))
    b = sig.select(F.col("g").alias("b"), "h", F.col("c").alias("y"))
    ab = a.join(b, "h").filter(F.col("a") < F.col("b"))
    p1 = ab.select("a", "b", "h", "x", "y")
    p2 = ab.select(
        "a", "b", F.col("h").alias("h2"),
        F.col("x").alias("x2"), F.col("y").alias("y2"),
    )
    pairs = p1.join(p2, ["a", "b"]).filter(F.col("h2") > F.col("h"))
    s = pairs.groupBy("a", "b").agg(
        F.sum(
            F.signum((F.col("x2") - F.col("x")).cast("double")).cast("long")
            * F.signum((F.col("y2") - F.col("y")).cast("double"))
            .cast("long")
        ).alias("s_stat"),
    )
    n = ab.groupBy("a", "b").agg(F.count(F.lit(1)).alias("n"))
    tx = (
        ab.groupBy("a", "b", "x")
        .agg(F.count(F.lit(1)).alias("t"))
        .groupBy("a", "b")
        .agg((F.sum(F.col("t") * (F.col("t") - 1)) / 2).cast("long")
             .alias("n1"))
    )
    ty = (
        ab.groupBy("a", "b", "y")
        .agg(F.count(F.lit(1)).alias("t"))
        .groupBy("a", "b")
        .agg((F.sum(F.col("t") * (F.col("t") - 1)) / 2).cast("long")
             .alias("n2"))
    )
    g = n.join(s, ["a", "b"]).join(tx, ["a", "b"]).join(ty, ["a", "b"])
    n0 = (F.col("n").cast("decimal(38,0)") * (F.col("n") - 1) / 2).cast(
        "decimal(38,0)"
    )
    d1 = (n0 - F.col("n1")).cast("decimal(38,0)")
    d2 = (n0 - F.col("n2")).cast("decimal(38,0)")
    return g.select(
        "a", "b", "n", "s_stat",
        F.when(
            (d1 > 0) & (d2 > 0),
            F.col("s_stat").cast("double")
            / F.sqrt((d1 * d2).cast("double")),
        ).alias("tau"),
    )


def threshold_episodes(
    df: DataFrame,
    threshold: float,
    by: tuple[str, ...] = ("source",),
    ts: str = "ts",
    val: str = "value",
    ident: str = "event_id",
    value_scale: int = 1000,
) -> DataFrame:
    """Above-threshold EXCURSION episodes per series — the alarm-audit
    read none of the pointwise monitors give: :func:`hysteresis_daily`
    counts latch events and rule_hardmax flags points, but an SLO
    review asks "how many breach EPISODES, how long, how deep" —
    contiguous runs of above-threshold points collapsed to one row
    each with duration, peak, and integrated excess.

    Membership is judged on FIXED-POINT values (``round(v *
    value_scale)`` int64 vs the identically-scaled threshold literal —
    the cusum convention), so the in/out verdict per point is
    engine-exact; the boundary rule is strict ``>`` on the scaled
    integers.  Episode ids come from the classic gaps-and-islands
    form: a run starts at an in-excursion row whose lagged predecessor
    is out (or absent), and the running count of starts over ALL rows
    numbers episodes 1..K contiguously per series.  Row order within a
    series is (ts, ident) — deterministic under duplicate timestamps.

    Exactness: peak and the excess sum Σ(y − thr) are exact int64 /
    decimal(38,0) aggregates descaled by ONE division; duration is an
    exact integer micros difference over 1e6.  No rounding guard
    needed anywhere.

    Plan shape: ONE hash partition by series feeds both ordered
    windows (lag + running start-count share the sort), then the
    groupBy(series, episode) is partial-aggregatable.  Output: ``*by,
    episode, t_start, t_end, n_pts, duration_s, peak, excess``.
    NULL values never join an excursion (the gate is tri-state-safe).
    """
    thr_fp = int(round(float(threshold) * value_scale))
    y = F.round(F.col(val) * F.lit(int(value_scale))).cast("long")
    base = df.select(
        *by, F.col(ts).alias("__ts"), F.col(ident).alias("__id"),
        y.alias("__y"),
    ).withColumn(
        "__in",
        F.coalesce(F.col("__y") > F.lit(thr_fp), F.lit(False)),
    )
    wo = Window.partitionBy(*by).orderBy("__ts", "__id")
    wrun = wo.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    started = F.col("__in") & ~F.coalesce(
        F.lag("__in").over(wo), F.lit(False)
    )
    eids = base.select(
        *by, "__ts", "__y", "__in",
        F.sum(started.cast("long")).over(wrun).alias("episode"),
    )
    vs = float(value_scale)
    return (
        eids.filter(F.col("__in"))
        .groupBy(*by, "episode")
        .agg(
            F.min("__ts").alias("t_start"),
            F.max("__ts").alias("t_end"),
            F.count(F.lit(1)).alias("n_pts"),
            F.max("__y").alias("__peak"),
            F.sum((F.col("__y") - F.lit(thr_fp)).cast("decimal(38,0)"))
            .alias("__exc"),
        )
        .select(
            *by, "episode", "t_start", "t_end", "n_pts",
            ((unix_us(F.col("t_end")) - unix_us(F.col("t_start")))
             .cast("double") / F.lit(1e6)).alias("duration_s"),
            (F.col("__peak").cast("double") / F.lit(vs)).alias("peak"),
            (F.col("__exc").cast("double") / F.lit(vs)).alias("excess"),
        )
    )


def decayed_topk(
    df: DataFrame,
    k: int = 10,
    asof: str = "2024-02-01",
    half_life_days: int = 7,
    by: str = "source",
    key: str = "user_id",
    ts: str = "ts",
) -> DataFrame:
    """Exponentially time-decayed heavy hitters per group — "who
    matters NOW": a plain top-k ranks a user who burst six weeks ago
    above one active today; decayed counting halves every
    ``half_life_days`` so recent activity dominates, which is the
    freshness-weighted ranking feeds (mixture recency budgets, abuse
    review queues) actually want.

    The decay is EXACT, not float: age is measured in whole half-life
    units u = floor(days(asof − ts) / half_life_days) (a step decay —
    documented semantics, not an approximation of the continuous one),
    clamped to [0, 63], and the score is assembled as

        S = Σ_events 2^(63 − u)        (exact decimal(38,0))

    so ranking compares exact integers — ties break by key ascending,
    engine-identical — and the reported ``decayed`` weight is the ONE
    division S / 2^63.  A same-unit event pair always outweighs any
    single event one unit fresher (2^n > 2^(n−1)·1), exactly as the
    continuous form would.

    Plan shape: ONE partial-aggregatable groupBy(by, key, u) corpus
    pass (state bounded at |keys|·64 per task), the exact sum and the
    top-k rank window run on the |keys|-per-group frame.  Events after
    ``asof`` clamp to u = 0 (full weight).  Output: ``by, key,
    n_events, decayed, rank``.
    """
    age = F.datediff(F.lit(asof).cast("date"), F.col(ts).cast("date"))
    u = F.least(
        F.greatest(
            (age / F.lit(int(half_life_days))).cast("long"), F.lit(0)
        ),
        F.lit(63),
    )
    per_unit = (
        df.select(F.col(by).alias("g"), F.col(key).alias("k"),
                  u.alias("u"))
        .groupBy("g", "k", "u")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    scored = per_unit.groupBy("g", "k").agg(
        F.sum("c").alias("n_events"),
        F.sum(
            F.col("c").cast("decimal(38,0)")
            * F.pow(F.lit(2.0), (F.lit(63) - F.col("u")).cast("double"))
            .cast("decimal(38,0)")
        ).alias("__s"),
    )
    w = Window.partitionBy("g").orderBy(F.col("__s").desc(),
                                        F.col("k").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.col("g").alias(by), F.col("k").alias(key), "n_events",
            (F.col("__s").cast("double") / F.lit(float(2 ** 63)))
            .alias("decayed"),
            "rank",
        )
    )


def stl_decompose(
    df: DataFrame | None = None,
    period: int = 24,
    bucket: str = "1h",
    by: str = "source",
    ts: str = "ts",
    counts: DataFrame | None = None,
) -> DataFrame:
    """Classical additive seasonal decomposition of the bucket-count
    signal (the moving-average trend + period-mean seasonal of
    Makridakis et al.; the deterministic skeleton STL's loess variant
    smooths): per bucket, ``c = trend + seasonal + resid``.  The
    monitors read its parts separately — seasonal_anomaly flags
    against the cyclic profile, trend_slope fits the drift — this read
    reports the full decomposition in one frame, the "why is this
    series doing that" dashboard panel.

    Deterministic arithmetic (nothing but exact-integer numerators,
    one division each, 9dp-fenced):

    - ``trend`` = the standard centered moving average; for EVEN
      ``period`` the 2xP form (endpoints half-weighted) computed as
      the exact integer ``T2 = S1 + S2`` — the sums of the two P-row
      windows offset by one — divided ONCE by 2P; for odd ``period``,
      ``T2 = 2*S`` over the single centered window.  Buckets without a
      full window on both sides report NULL trend (the standard
      edge-trim).
    - ``seasonal`` = per-phase mean of the detrended signal, centered.
      The detrended value is kept as the exact integer
      ``det2p = 2P*c - T2``; the phase mean and the centering term are
      both single divisions of exact integer sums (centering uses the
      GLOBAL detrended-interior mean — phases with unequal interior
      counts make the mean-of-phase-means variant order-sensitive;
      this convention keeps every number an exact-integer ratio and
      still zeroes the weighted seasonal sum).  Phases with no
      interior buckets report NULL seasonal.
    - ``resid = c - trend - seasonal`` on the 9dp-rounded parts.

    Plan shape at 100 TB: ONE raw groupBy to the signal (or none — via
    ``counts=`` off a stored rollup tier, the monitor-family rule);
    the trend window, phase aggregation and the broadcast join of the
    tiny (|series| x period) seasonal frame all run on the
    (|series| x span) signal frame.

    Output: ``g, h, c, phase, trend, seasonal, resid``.

    Reference: traval detects level shifts and spikes on raw series
    (rulelib.py rule_spike_detection / rule_outside_n_sigma) but has
    no trend/seasonal separation; this supplies the decomposition its
    plots leave to the analyst's eye.
    """
    if period < 2:
        raise ValueError("period must be >= 2")
    sig = bucket_count_signal(df, bucket=bucket, by=by, ts=ts,
                              counts=counts)
    p = int(period)
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    ow = Window.partitionBy("g").orderBy("h")
    if p % 2 == 0:
        w1 = ow.rowsBetween(-(p // 2), p // 2 - 1)
        w2 = ow.rowsBetween(-(p // 2) + 1, p // 2)
        full = (F.count("c").over(w1) == p) & (F.count("c").over(w2) == p)
        t2 = F.when(full, dec(F.sum("c").over(w1))
                    + dec(F.sum("c").over(w2)))
    else:
        w1 = ow.rowsBetween(-(p // 2), p // 2)
        full = F.count("c").over(w1) == p
        t2 = F.when(full, F.lit(2).cast("decimal(38,0)")
                    * dec(F.sum("c").over(w1)))
    base = sig.select(
        "g", "h", "c", F.pmod("h", F.lit(p)).alias("phase"),
        t2.alias("t2"),
    ).withColumn("det2p", F.lit(2 * p).cast("decimal(38,0)") * dec(F.col("c"))
                 - F.col("t2"))
    ph = base.groupBy("g", "phase").agg(
        F.sum("det2p").alias("sd"), F.count("det2p").alias("nd"),
    )
    tot = base.groupBy("g").agg(
        F.sum("det2p").alias("sa"), F.count("det2p").alias("na"),
    )
    two_p = float(2 * p)
    seas = (
        ph.join(F.broadcast(tot), "g")
        .select(
            "g", "phase",
            F.when(
                (F.col("nd") > 0) & (F.col("na") > 0),
                F.round(
                    F.col("sd").cast("double")
                    / (F.lit(two_p) * F.col("nd").cast("double"))
                    - F.col("sa").cast("double")
                    / (F.lit(two_p) * F.col("na").cast("double")),
                    9,
                ),
            ).alias("seasonal"),
        )
    )
    trend = F.round(F.col("t2").cast("double") / F.lit(two_p), 9)
    return (
        base.join(F.broadcast(seas), ["g", "phase"], "left")
        .select(
            "g", "h", "c", "phase",
            trend.alias("trend"),
            "seasonal",
            F.round(
                F.col("c").cast("double") - trend - F.col("seasonal"), 9
            ).alias("resid"),
        )
    )


def stl_anomaly(
    df: DataFrame | None = None,
    period: int = 24,
    bucket: str = "1h",
    by: str = "source",
    ts: str = "ts",
    counts: DataFrame | None = None,
    threshold: float = 3.5,
) -> DataFrame:
    """Seasonally-adjusted robust anomaly flags: the Seasonal-Hybrid-
    ESD-shaped read (Twitter's S-H-ESD, Hochenbaum et al. 2017,
    simplified to its one-shot core) — decompose the bucket-count
    signal with :func:`stl_decompose`, then score each interior
    bucket's residual with the Iglewicz-Hoaglin MODIFIED z-score
    ``mz = 0.6745 (resid - median) / MAD`` and report buckets with
    ``|mz| > threshold`` (3.5 is the published cutoff).  Plain
    n-sigma rules (rule_outside_n_sigma) fire on every rush hour;
    subtracting trend+seasonal first flags only what the series'
    own rhythm cannot explain — and median/MAD keep the fence itself
    immune to the anomalies it hunts (an outlier inflates a stddev
    fence quadratically, a MAD fence not at all).

    Determinism: residuals are stl_decompose's 9dp-rounded doubles
    (exact-integer numerators, proven engine-identical); median and
    MAD are SELECTIONS over that identical multiset (continuous
    0.5-quantile, the two-middle average on even counts — the same
    convention in Spark ``percentile`` and DuckDB ``quantile_cont``),
    never an order-sensitive float sum; ``mz`` is one multiply-divide
    on those, 9dp-rounded, and the flag compares the rounded value.
    ``MAD == 0`` (a majority-identical residual multiset) makes the
    score undefined — those series report NOTHING by rule rather than
    dividing by a degenerate scale (documented S-H-ESD edge; the
    stddev fallback would reintroduce the order-sensitive sum).

    Plan shape at 100 TB: raw is touched once by the decomposition's
    groupBy (or never, via ``counts=`` off a stored rollup tier); the
    median/MAD aggregations and the final probe all run on the
    (|series| x span) residual frame, with the two |series|-row
    fence frames broadcast back — monitor-family economics.

    Output: ``g, h, c, phase, trend, seasonal, resid, mz`` — interior
    buckets only, flagged rows only.

    Reference: traval flags raw-value outliers (rulelib.py
    rule_outside_n_sigma, rule_spike_detection) with no seasonal
    adjustment; this is the calendar-aware anomaly read its users
    build manually on top of detrended series.
    """
    parts = stl_decompose(df, period=period, bucket=bucket, by=by,
                          ts=ts, counts=counts)
    interior = parts.filter(F.col("resid").isNotNull())
    med = interior.groupBy("g").agg(
        F.expr("percentile(resid, 0.5)").alias("med"))
    dev = interior.join(F.broadcast(med), "g").select(
        "g", F.abs(F.col("resid") - F.col("med")).alias("adev"),
        "med",
    )
    fence = dev.groupBy("g").agg(
        F.expr("percentile(adev, 0.5)").alias("mad"),
        F.max("med").alias("med"),
    )
    mz = F.round(
        F.lit(0.6745) * (F.col("resid") - F.col("med")) / F.col("mad"),
        9,
    )
    return (
        interior.join(F.broadcast(fence), "g")
        .withColumn("mz", F.when(F.col("mad") > 0, mz))
        .filter(F.abs(F.col("mz")) > F.lit(float(threshold)))
        .select("g", "h", "c", "phase", "trend", "seasonal", "resid",
                "mz")
    )


_CHI2_CRIT_05 = (
    3.841, 5.991, 7.815, 9.488, 11.070, 12.592, 14.067, 15.507,
    16.919, 18.307, 19.675, 21.026, 22.362, 23.685, 24.996, 26.296,
    27.587, 28.869, 30.144, 31.410,
)  # upper 5% chi-square quantiles, df 1..20 (standard public table)


def kw_from_hists(
    h: DataFrame,
    by: tuple[str, ...] = ("source",),
    grp: str = "grp",
    ndigits: int = 6,
) -> DataFrame:
    """Kruskal-Wallis H omnibus rank test from a histogram count frame
    (``*by, grp, bin, cnt``) — the k-group extension of
    :func:`mw_from_hists`: MW answers "did the measure move between
    these TWO snapshots?"; KW asks "do ANY of these k groups (weeks,
    shards, sources) differ in distribution?" in ONE test, the fleet
    regression gate that avoids k(k-1)/2 pairwise MW runs and their
    multiple-comparison inflation.

    Rank arithmetic straight off the bin table, no per-row ranking:
    with tie-group size t_v = sum-over-groups cnt at bin v and
    cum_lt(v) the count in smaller bins, every member of bin v has
    average rank (2*cum_lt + t_v + 1)/2, so in HALF-UNITS (doubling
    clears the half-integer ranks):

        r2_g   = sum_v cnt_gv * (2*cum_lt + t_v + 1)      (= 2*R_g, exact)
        B      = sum_v t_v * (2*cum_lt + t_v + 1)^2       (exact)
        SST2   = B - N*(N+1)^2                            (exact; = 4*SST)
        A_g    = (r2_g - n_g*(N+1))^2                     (exact; = 4*n_g^2*(Rbar_g - rbar)^2 / ...)
        SSB2   = sum_g A_g / n_g                          (= 4*SSB)

    and the TIE-CORRECTED statistic is identically

        H = (N - 1) * SSB2 / SST2

    (the ANOVA-on-ranks identity H = (N-1)*SSB/SST absorbs the usual
    1 - sum(t^3-t)/(N^3-N) correction, because SST of ranks already
    shrinks under ties; the factor 4 cancels in the ratio).  Checked
    by hand: {1,2} vs {3,4} -> H = 2.4 (untied textbook value);
    {1,1} vs {2,2} -> H = 3.0 = 2.4 / 0.8 (tie-corrected).

    Exactness: r2_g, A_g, B, SST2 and N are exact decimal(38,0)
    integers (magnitude budget: A_g <= 4*N^4 caps N at ~2*10^9
    observations per ``by`` partition — beyond that pre-bucket or
    shard); each A_g/n_g is ONE division of exact-integer-cast
    doubles, and the k-term SSB2 sum is the only order-dependent float
    reduction (k = group count, tiny), fenced by rounding H to
    ``ndigits`` (the ljung_box convention).  ``significant`` compares
    the rounded H against the standard chi-square 0.05 critical value
    at df = k-1 (literal table, df <= 20; NULL beyond).  Degenerate
    regimes return NULL H: all values tied (SST2 = 0) and k < 2.

    Plan shape: one window cumsum + two partial-aggregatable groupBys
    and one equi-join, all on the tiny bin-by-group table; serve
    per-group ``cnt`` by summing a stored hist tier's counts
    (parity-tested) and the read never re-scans raw.  Output:
    ``*by, k, n, h_stat, df_kw, significant``.

    Reference: traval compares two series (SeriesComparison,
    comparison.py); it has no k-sample omnibus — this is the fleet-
    wide "did anything drift" gate its users run pairwise by hand.
    """
    j = h.select(
        *by, grp, "bin",
        F.col("cnt").cast("decimal(38,0)").alias("cnt"),
    )
    binf = j.groupBy(*by, "bin").agg(F.sum("cnt").alias("t"))
    w_lt = (
        Window.partitionBy(*by).orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    binf = binf.select(
        *by, "bin", "t",
        F.coalesce(
            F.sum("t").over(w_lt), F.lit(0).cast("decimal(38,0)")
        ).alias("cum_lt"),
    )
    r2v = 2 * F.col("cum_lt") + F.col("t") + 1
    tot = binf.groupBy(*by).agg(
        F.sum("t").alias("n_tot"),
        F.sum(F.col("t") * r2v * r2v).alias("__b"),
    )
    pg = (
        j.join(binf.select(*by, "bin", "cum_lt", "t"), [*by, "bin"])
        .groupBy(*by, grp)
        .agg(
            F.sum("cnt").alias("n_g"),
            F.sum(F.col("cnt") * r2v).alias("r2"),
        )
    )
    ag = (
        F.col("r2") - F.col("n_g") * (F.col("n_tot") + 1)
    )
    term = (ag * ag).cast("double") / F.col("n_g").cast("double")
    g = (
        pg.join(tot, [*by])
        .groupBy(*by)
        .agg(
            F.count(F.lit(1)).alias("k"),
            F.max("n_tot").alias("n_tot"),
            F.max("__b").alias("__b"),
            F.sum(term).alias("__ssb2"),
        )
    )
    sst2 = (
        F.col("__b")
        - F.col("n_tot") * (F.col("n_tot") + 1) * (F.col("n_tot") + 1)
    )
    h_stat = F.when(
        (sst2 > 0) & (F.col("k") >= 2),
        F.round(
            (F.col("n_tot") - 1).cast("double") * F.col("__ssb2")
            / sst2.cast("double"),
            ndigits,
        ),
    )
    crit = F.element_at(
        F.lit(list(_CHI2_CRIT_05)), F.col("k").cast("int") - 1
    )
    return g.select(
        *by,
        F.col("k").cast("int").alias("k"),
        F.col("n_tot").cast("long").alias("n"),
        h_stat.alias("h_stat"),
        (F.col("k") - 1).cast("int").alias("df_kw"),
        F.when(
            h_stat.isNotNull() & (F.col("k") - 1 <= 20),
            (h_stat > crit).cast("int"),
        ).alias("significant"),
    )


def kruskal_drift(
    df: DataFrame,
    by: tuple[str, ...] = ("source",),
    grp: str = "grp",
    val: str = "value",
    scale: int = 1,
    ndigits: int = 6,
) -> DataFrame:
    """Kruskal-Wallis omnibus drift over raw rows: bins ``val`` with
    the hist.py discretization (``round(v*scale)``) so the identical
    read serves from raw or from a stored histogram tier
    (:func:`kw_from_hists`, parity-tested), then runs the exact
    half-unit rank construction per ``by`` partition across the
    ``grp`` groups.  One partial-aggregatable groupBy is the only
    raw-scale stage; everything downstream runs on the tiny
    bin-by-group table."""
    hist = df.groupBy(
        *by, grp,
        F.round(F.col(val) * scale).cast("long").alias("bin"),
    ).agg(F.count("*").alias("cnt"))
    return kw_from_hists(hist, by=by, grp=grp, ndigits=ndigits)


def runs_test(
    df: DataFrame | None = None,
    bucket: str = "1h",
    by: str = "source",
    ts: str = "ts",
    ndigits: int = 9,
    counts: DataFrame | None = None,
) -> DataFrame:
    """Wald-Wolfowitz runs test for randomness of each series' bucket-
    count signal around its median — the NONPARAMETRIC companion to
    :func:`ljung_box`: Ljung-Box measures LINEAR autocorrelation; the
    runs test fires on any sign-level clustering (level shifts, slow
    regime drift, on/off duty cycles) including patterns whose linear
    ACF is near zero, and is immune to the heavy tails that inflate
    ACF denominators.

    Construction over the zero-filled signal: the per-series median is
    the continuous 0.5-quantile (a SELECTION over the integer count
    multiset — same convention in Spark ``percentile`` and DuckDB
    ``quantile_cont``, the :func:`stl_anomaly` determinism argument);
    comparing 2*c against 2*median keeps the comparison on exact
    integers (2*median is always an integer for integer counts: the
    middle value doubled, or the sum of the two middles).  Buckets
    equal to the median DROP (the standard convention), leaving n1
    above / n2 below and the run count

        R = 1 + #{t : sign_t != sign_{t-1}}      (exact integer)

    Normal approximation: mu = 2*n1*n2/n + 1, and z clears mu's
    denominator so every input is an exact integer cast once:

        z = (R*n - 2*n1*n2 - n) / (n * sqrt(Var)),
        Var = 2*n1*n2*(2*n1*n2 - n) / (n^2 * (n - 1))

    — numerator and Var's numerator/denominator are exact decimal
    integers combined in one fixed parenthesization, so z is engine-
    identical, rounded to ``ndigits`` as the fence.  ``random_ok`` is
    the alpha=0.05 two-sided verdict |z| <= 1.96.  Degenerate regimes
    (n1 = 0, n2 = 0, or Var <= 0) return NULL z — randomness is not
    decidable when one side is empty.

    Plan shape: monitor-family economics — ONE raw-scale partial-
    aggregatable groupBy to the signal (or none via ``counts=`` off a
    stored rollup tier), the median selection, the lag window and the
    final agg all on the tiny (|series| x span) frame.  Output:
    ``g, n_used, n1, n2, runs, z, random_ok``.

    Reference: traval's rule_flat_signal flags literal flatness;
    this is the statistical "is this series even random?" gate its
    docs leave to visual inspection.
    """
    sig = bucket_count_signal(df, bucket=bucket, by=by, ts=ts,
                              counts=counts)
    med = sig.groupBy("g").agg(
        F.expr("percentile(c, 0.5)").alias("med"))
    signed = (
        sig.join(F.broadcast(med), "g")
        .withColumn(
            "sgn",
            F.when(2 * F.col("c").cast("double") > 2 * F.col("med"),
                   F.lit(1))
             .when(2 * F.col("c").cast("double") < 2 * F.col("med"),
                   F.lit(-1)),
        )
        .filter(F.col("sgn").isNotNull())
    )
    w = Window.partitionBy("g").orderBy("h")
    runs = (
        signed.withColumn("prev", F.lag("sgn").over(w))
        .groupBy("g")
        .agg(
            F.count(F.lit(1)).cast("decimal(38,0)").alias("n_used"),
            F.sum((F.col("sgn") == 1).cast("int"))
             .cast("decimal(38,0)").alias("n1"),
            F.sum((F.col("sgn") == -1).cast("int"))
             .cast("decimal(38,0)").alias("n2"),
            (
                F.lit(1)
                + F.sum(
                    (F.col("prev").isNotNull()
                     & (F.col("sgn") != F.col("prev"))).cast("int")
                )
            ).cast("decimal(38,0)").alias("runs"),
        )
    )
    n = F.col("n_used")
    two = 2 * F.col("n1") * F.col("n2")
    var_num = two * (two - n)
    var_den = n * n * (n - 1)
    var = var_num.cast("double") / var_den.cast("double")
    z = F.round(
        (F.col("runs") * n - two - n).cast("double")
        / (n.cast("double") * F.sqrt(var)),
        ndigits,
    )
    z_out = F.when(
        (F.col("n1") > 0) & (F.col("n2") > 0) & (var_num > 0), z
    )
    return runs.select(
        "g",
        n.cast("long").alias("n_used"),
        F.col("n1").cast("long").alias("n1"),
        F.col("n2").cast("long").alias("n2"),
        F.col("runs").cast("long").alias("runs"),
        z_out.alias("z"),
        F.when(z_out.isNotNull(),
               (F.abs(z_out) <= 1.96).cast("int")).alias("random_ok"),
    )


def lead_lag(
    df: DataFrame | None = None,
    max_lag: int = 3,
    bucket: str = "1h",
    by: str = "source",
    ts: str = "ts",
    ndigits: int = 9,
    counts: DataFrame | None = None,
) -> DataFrame:
    """Dominant lead-lag extraction per ordered series pair — the
    DECISION layer over :func:`xcorr_lags`' full correlogram: which
    series leads which, by how many buckets, and is the alignment
    real?  For every pair (a, b), the winning lag maximizes the
    9dp-rounded |r| (strength regardless of sign — an inhibitory
    coupling is still a coupling); exact ties break to the SMALLEST
    |lag| then the smallest lag (contemporaneous beats displaced, lead
    beats echo — the :func:`dominant_period` fundamental-over-harmonics
    convention).  ``significant`` gates |r| against the 1.96/sqrt(n)
    white-noise band at the winning lag's own n (aligned-pair count
    shrinks with |lag|), with the usual 9dp fence guard.

    Determinism: xcorr's r is already a double of exact integer
    moments; the argmax runs on the ROUNDED |r| so a last-ulp
    difference can never flip the winner, and the (|lag|, lag) tie
    ladder is total.  Self-pairs (a = b) are excluded — lag-0 self
    correlation is identically 1 and says nothing.

    Plan shape: xcorr_lags' exactly (ONE raw groupBy or none via
    ``counts=``; the lag cross and pair join on the tiny signal
    frame), then one row_number window over the (|series|^2 x
    (2*max_lag+1))-row correlogram.  Pair count is quadratic in
    |series| by construction — the same disclosed trade as
    :func:`xcorr_lags` and :func:`sax_pairs`.

    Output: ``a, b, lag, n, r, significant`` — one row per ordered
    pair; ``lag > 0`` means a's signal at t aligns with b's at t+lag,
    i.e. a LEADS b by ``lag`` buckets.

    Reference: traval users eyeball lead-lag from stacked plots
    (plots.py); this is that read as a fleet-wide query.
    """
    xc = xcorr_lags(df, max_lag=max_lag, bucket=bucket, by=by, ts=ts,
                    counts=counts).filter(F.col("a") != F.col("b"))
    r9 = F.round(F.col("r"), ndigits)
    rn = F.row_number().over(
        Window.partitionBy("a", "b").orderBy(
            F.abs(r9).desc(), F.abs(F.col("lag")).asc(),
            F.col("lag").asc(),
        )
    )
    band = F.round(F.lit(1.96) / F.sqrt(F.col("n").cast("double")),
                   ndigits)
    return (
        xc.withColumn("rn", rn)
        .filter(F.col("rn") == 1)
        .select(
            "a", "b", "lag", "n", r9.alias("r"),
            (F.abs(r9) > band).cast("int").alias("significant"),
        )
    )


def turning_points(
    df: DataFrame | None = None,
    bucket: str = "1h",
    by: str = "source",
    ts: str = "ts",
    ndigits: int = 9,
    counts: DataFrame | None = None,
) -> DataFrame:
    """Turning-point test for randomness of each series' bucket-count
    signal — the LOCAL-shape companion to :func:`runs_test`: runs
    count sign persistence around the GLOBAL median (level shifts,
    regime drift), while the turning-point count measures how often
    the signal changes direction bucket-to-bucket, catching
    over-smooth trends (too few turns) and oscillatory / thrashing
    behavior (too many turns) that a median-split can miss entirely —
    a slow ramp crosses the median once and the runs test screams,
    but a ramp PLUS superimposed alternation looks median-balanced
    and only the turn count sees the thrash.

    Construction over the zero-filled signal: an interior bucket i is
    a turning point iff (c_{i-1} < c_i > c_{i+1}) or (c_{i-1} > c_i <
    c_{i+1}) — STRICT inequalities on exact integer counts, so a tie
    with either neighbor yields no turn (the classical test assumes a
    continuous law where ties are null events; on integer counts the
    strict rule undercounts T for heavily tied signals, making the
    "non-random: too smooth" verdict conservative — documented, and
    the all-tied constant signal correctly lands maximally smooth).
    Under H0 (exchangeable i.i.d. signal) for span n:

        E[T] = 2*(n - 2) / 3,    Var[T] = (16*n - 29) / 90

    and clearing E[T]'s denominator keeps the z numerator an exact
    decimal integer combined in one fixed parenthesization:

        z = (3*T - 2*n + 4) / (3 * sqrt((16*n - 29) / 90))

    rounded to ``ndigits`` as the cross-engine fence; ``random_ok``
    is the alpha=0.05 two-sided verdict |z| <= 1.96.  Series with
    n < 4 (no interior pair to turn on, or Var undefined) return NULL.

    Plan shape: monitor-family economics — ONE raw-scale partial-
    aggregatable groupBy to the signal (or none via ``counts=`` off a
    stored rollup tier), then one lag/lead window pass and the final
    agg on the tiny (|series| x span) frame.  Output: ``g, n, t, z,
    random_ok``.

    Reference: traval's rule_flat_signal flags literal flatness; the
    turning-point count is the graded version of that read — "how
    UN-jittery is this series?" — as a fleet-wide query.
    """
    sig = bucket_count_signal(df, bucket=bucket, by=by, ts=ts,
                              counts=counts)
    w = Window.partitionBy("g").orderBy("h")
    turned = (
        sig.withColumn("p", F.lag("c").over(w))
        .withColumn("x", F.lead("c").over(w))
        .withColumn(
            "tp",
            (
                F.col("p").isNotNull() & F.col("x").isNotNull()
                & (
                    ((F.col("p") < F.col("c")) & (F.col("c") > F.col("x")))
                    | ((F.col("p") > F.col("c")) & (F.col("c") < F.col("x")))
                )
            ).cast("int"),
        )
    )
    agg = turned.groupBy("g").agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("n"),
        F.sum("tp").cast("decimal(38,0)").alias("t"),
    )
    n = F.col("n")
    num = (3 * F.col("t") - 2 * n + 4).cast("double")
    var = (16 * n - 29).cast("double") / F.lit(90.0)
    z = F.round(num / (F.lit(3.0) * F.sqrt(var)), ndigits)
    z_out = F.when(n >= 4, z)
    return agg.select(
        "g",
        n.cast("long").alias("n"),
        F.col("t").cast("long").alias("t"),
        z_out.alias("z"),
        F.when(z_out.isNotNull(),
               (F.abs(z_out) <= 1.96).cast("int")).alias("random_ok"),
    )


def variance_ratio(
    df: DataFrame | None = None,
    q: int = 4,
    bucket: str = "1h",
    by: str = "source",
    ts: str = "ts",
    ndigits: int = 9,
    counts: DataFrame | None = None,
) -> DataFrame:
    """Lo-MacKinlay variance-ratio test per series — the SCALED
    random-walk read next to :func:`ljung_box` (which tests each ACF
    lag separately) and :func:`runs_test` (sign clustering): VR(q)
    compares the variance of q-bucket changes against q times the
    variance of 1-bucket changes.  For an uncorrelated-increment
    signal VR = 1 exactly in expectation; VR > 1 means positive
    drift persistence (trending — q-step moves compound), VR < 1
    means mean reversion (oscillation — q-step moves cancel), and the
    statistic aggregates the first q-1 autocorrelations with Bartlett
    weights in ONE number, catching weak-but-consistent persistence
    that no single Ljung-Box lag flags.

    Construction over the zero-filled signal: 1-diffs d1_t = c_t -
    c_{t-1} (n1 = n - 1 values) and OVERLAPPING q-diffs dq_t = c_t -
    c_{t-q} (nq = n - q values), both exact integers off one ordered
    window pass.  Each variance keeps an exact decimal numerator via
    the cleared-mean identity  Vk = nk * sum(dk^2) - (sum dk)^2  so

        VR = (Vq / V1) * (n1^2 / (q * nq^2))

    is two exact-integer ratios multiplied once — evaluated in that
    fixed parenthesization (two casts, two divisions, one multiply)
    so both engines produce the identical double, rounded to
    ``ndigits``.  The homoskedastic asymptotic z uses the standard
    phi(q) = 2*(2q-1)*(q-1)/(3q):

        z = (VR - 1) * sqrt(nq * 3q / (2*(2q-1)*(q-1)))

    with the unrounded VR inside (same expression both engines) and
    the final ``ndigits`` fence; ``significant`` is |z| > 1.96 —
    reject the uncorrelated-increment hypothesis at alpha=0.05.
    NULL when q < 2, nq < 2, or V1 = 0 (a constant signal has no
    increment variance to ratio).

    Magnitude budget: |d| <= max count c_max, so Vk <= n^2 * c_max^2
    (~1e18 at n=1e4, c_max=1e5) — far inside decimal(38,0); the
    cross-ratio n1^2/(q*nq^2) stays ~1/q, so the double multiply
    loses nothing representable at 9dp.

    Plan shape: monitor-family economics — ONE raw-scale partial-
    aggregatable groupBy to the signal (or none via ``counts=``), one
    lag window pass, final agg on the tiny (|series| x span) frame.
    Output: ``g, n, nq, vr, z, significant``.

    Reference: traval's docs suggest eyeballing drift from smoothed
    plots (plots.py); VR(q) is that judgment as a calibrated test.
    """
    if q < 2:
        raise ValueError("variance_ratio requires q >= 2")
    sig = bucket_count_signal(df, bucket=bucket, by=by, ts=ts,
                              counts=counts)
    w = Window.partitionBy("g").orderBy("h")
    d = (
        sig.withColumn("d1", F.col("c") - F.lag("c", 1).over(w))
        .withColumn("dq", F.col("c") - F.lag("c", q).over(w))
    )
    dec = "decimal(38,0)"
    agg = d.groupBy("g").agg(
        F.count(F.lit(1)).cast(dec).alias("n"),
        F.count("d1").cast(dec).alias("n1"),
        F.sum(F.col("d1").cast(dec)).alias("s1"),
        F.sum(F.col("d1").cast(dec) * F.col("d1")).alias("q1"),
        F.count("dq").cast(dec).alias("nq"),
        F.sum(F.col("dq").cast(dec)).alias("sq"),
        F.sum(F.col("dq").cast(dec) * F.col("dq")).alias("qq"),
    )
    v1 = F.col("n1") * F.col("q1") - F.col("s1") * F.col("s1")
    vq = F.col("nq") * F.col("qq") - F.col("sq") * F.col("sq")
    ratio = (
        (vq.cast("double") / v1.cast("double"))
        * ((F.col("n1") * F.col("n1")).cast("double")
           / (q * F.col("nq") * F.col("nq")).cast("double"))
    )
    phi_fac = float(3 * q) / float(2 * (2 * q - 1) * (q - 1))
    z_raw = (ratio - F.lit(1.0)) * F.sqrt(
        F.col("nq").cast("double") * F.lit(phi_fac))
    ok = (F.col("nq") >= 2) & (v1 > 0)
    vr_out = F.when(ok, F.round(ratio, ndigits))
    z_out = F.when(ok, F.round(z_raw, ndigits))
    return agg.select(
        "g",
        F.col("n").cast("long").alias("n"),
        F.col("nq").cast("long").alias("nq"),
        vr_out.alias("vr"),
        z_out.alias("z"),
        F.when(z_out.isNotNull(),
               (F.abs(z_out) > 1.96).cast("int")).alias("significant"),
    )


def pettitt_change(
    df: DataFrame | None = None,
    bucket: str = "1h",
    by: str = "source",
    ts: str = "ts",
    ndigits: int = 9,
    counts: DataFrame | None = None,
) -> DataFrame:
    """Pettitt change-point test per series (Pettitt 1979) — WHERE did
    the level shift, and is it real?  The drift monitors (ks_drift,
    mann_whitney, kruskal_drift) compare CALLER-CHOSEN periods; the
    Pettitt statistic scans every possible split point t of the
    bucket-count signal and returns the strongest one — the
    nonparametric single-change-point locator, rank-based and hence
    immune to the heavy tails that wreck CUSUM-of-means.

    Construction over the zero-filled signal: U_t = sum_{i<=t}
    sum_{j>t} sgn(c_i - c_j) via the exact midrank identity

        U_t = sum_{i<=t} (2*r_i - n - 1),
        2*r_i = 2*cum_lt(c_i) + ties(c_i) + 1     (exact integer)

    (the :func:`kruskal_drift` half-unit-rank trick: twice the
    midrank is always an integer; the antisymmetric i,j <= t block
    cancels, so the double sum collapses to one rank cumsum — O(n)
    per series, not O(n^2)).  K = max_{1<=t<n} |U_t|, the change
    point reports the LAST bucket of the pre-change segment (the
    smallest h attaining K on exact ties — deterministic), and the
    standard approximation

        p = min(1, 2 * exp(-6*K^2 / (n^3 + n^2)))

    is one exp of an exact-integer ratio in a fixed parenthesization,
    rounded to ``ndigits``; ``significant`` is p < 0.05.  An all-tied
    (constant) signal has every U_t = 0: K = 0, p clamps to 1, never
    significant.  A single-bucket span has no interior split point
    and emits nothing.

    Plan shape: monitor-family economics — ONE raw-scale partial-
    aggregatable groupBy to the signal (or none via ``counts=``);
    ranks via a (g, c) value-census join (tiny frames), one cumsum
    window, one argmax window.  Output: ``g, n, k_stat, t_change,
    p, significant``.

    Reference: traval's rule_offset_detection finds level shifts with
    a threshold the user must tune (rulelib.py); Pettitt is the
    calibrated, threshold-free fleet query for the same question.
    """
    sig = bucket_count_signal(df, bucket=bucket, by=by, ts=ts,
                              counts=counts)
    vals = sig.groupBy("g", "c").agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("cnt"))
    wv = (
        Window.partitionBy("g").orderBy("c")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    vals = vals.withColumn(
        "cum_lt", F.coalesce(F.sum("cnt").over(wv), F.lit(0)))
    tot = sig.groupBy("g").agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("n"))
    wh = (
        Window.partitionBy("g").orderBy("h")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    terms = (
        sig.join(vals, ["g", "c"])
        .join(F.broadcast(tot), "g")
        .withColumn("term", 2 * F.col("cum_lt") + F.col("cnt")
                    - F.col("n"))
        .withColumn("u", F.sum("term").over(wh))
        .withColumn("hmax",
                    F.max("h").over(Window.partitionBy("g")))
        .filter(F.col("h") < F.col("hmax"))
    )
    rn = F.row_number().over(
        Window.partitionBy("g").orderBy(
            F.abs(F.col("u")).desc(), F.col("h").asc())
    )
    best = terms.withColumn("rn", rn).filter(F.col("rn") == 1)
    k = F.abs(F.col("u"))
    den = (F.col("n") * F.col("n") * F.col("n")
           + F.col("n") * F.col("n"))
    p = F.round(
        F.least(
            F.lit(1.0),
            2 * F.exp(-(6 * k * k).cast("double") / den.cast("double")),
        ),
        ndigits,
    )
    p_out = F.when(F.col("n") >= 2, p)
    return best.select(
        "g",
        F.col("n").cast("long").alias("n"),
        k.cast("long").alias("k_stat"),
        F.col("h").cast("long").alias("t_change"),
        p_out.alias("p"),
        F.when(p_out.isNotNull(),
               (p_out < 0.05).cast("int")).alias("significant"),
    )


def seasonal_mk(
    df: DataFrame | None = None,
    period: int = 24,
    bucket: str = "1h",
    by: str = "source",
    ts: str = "ts",
    ndigits: int = 9,
    counts: DataFrame | None = None,
) -> DataFrame:
    """Seasonal Mann-Kendall trend test per series (Hirsch & Slack
    1984 — THE standard monotonic-trend test of the reference's own
    domain, hydrology): plain :func:`mann_kendall` on a diurnal
    signal conflates the daily cycle with trend (every morning-vs-
    afternoon pair votes); the seasonal variant compares ONLY
    like-with-like phases (season m = h mod ``period``), so a clean
    24h cycle contributes S = 0 and a genuine day-over-day drift
    still accumulates full strength.

        S  = sum_m sum_{i<j in season m} sign(c_j - c_i)   (exact)
        Var = sum_m [n_m(n_m-1)(2n_m+5) - sum_t t(t-1)(2t+5)] / 18
        z  = (S -/+ 1) / sqrt(Var)      (continuity-corrected; 0 at S=0)

    — the Hirsch-Slack statistic without the cross-season covariance
    term (the usual field form; independence across seasons is the
    documented assumption).  S is an integer sum of signs; each
    season's variance NUMERATOR is an exact integer from n_m and the
    per-season tie census, summed exactly BEFORE the single /18, so z
    is doubles-of-exact-integers through one division and one sqrt,
    ``ndigits``-fenced.  All-seasons-constant series (Var = 0) report
    NULL z; ``significant`` is the alpha=0.05 two-sided |z| > 1.96.

    Plan shape: mann_kendall's exactly — ONE raw-scale partial-
    aggregatable groupBy to the signal (or none via ``counts=``); the
    pair join keys on (g, season) so the quadratic shrinks period-fold
    to O(m^2/period) rows, tie census and variance assembly on tiny
    frames.  Output: ``g, n_buckets, n_seasons, s_stat, var_s, z,
    significant``.

    Reference: traval's docs recommend eyeballing multi-year
    groundwater trends across seasonal cycles (plots.py); this is
    that judgment as the field's calibrated test, fleet-wide.
    """
    sig = bucket_count_signal(df, bucket=bucket, by=by, ts=ts,
                              counts=counts).withColumn(
        "m", F.col("h") % period)
    a = sig.select("g", "m", F.col("h").alias("hi"),
                   F.col("c").alias("ci"))
    b = sig.select("g", "m", F.col("h").alias("hj"),
                   F.col("c").alias("cj"))
    s = (
        a.join(b, ["g", "m"])
        .filter(F.col("hj") > F.col("hi"))
        .groupBy("g")
        .agg(F.sum(F.signum(F.col("cj") - F.col("ci")).cast("long"))
             .alias("s_stat"))
    )
    per = (
        sig.groupBy("g", "m", "c").agg(F.count(F.lit(1)).alias("t"))
        .groupBy("g", "m")
        .agg(
            F.sum("t").alias("n_m"),
            F.sum(F.col("t") * (F.col("t") - 1)
                  * (2 * F.col("t") + 5)).alias("tt_m"),
        )
    )
    nm = F.col("n_m")
    var_g = per.groupBy("g").agg(
        F.sum(nm * (nm - 1) * (2 * nm + 5) - F.col("tt_m"))
         .alias("var_num"),
        F.sum("n_m").alias("n_buckets"),
        F.count(F.lit(1)).alias("n_seasons"),
    )
    var_s = F.col("var_num").cast("double") / F.lit(18.0)
    z_raw = F.when(
        F.col("s_stat") > 0,
        F.round((F.col("s_stat") - 1).cast("double") / F.sqrt(var_s),
                ndigits),
    ).when(
        F.col("s_stat") < 0,
        F.round((F.col("s_stat") + 1).cast("double") / F.sqrt(var_s),
                ndigits),
    ).otherwise(F.lit(0.0))
    z = F.when(F.col("var_num") > 0, z_raw)
    return var_g.join(s, "g").select(
        "g",
        F.col("n_buckets").cast("long").alias("n_buckets"),
        F.col("n_seasons").cast("long").alias("n_seasons"),
        "s_stat",
        var_s.alias("var_s"),
        z.alias("z"),
        F.when(z.isNotNull(),
               (F.abs(z) > 1.96).cast("int")).alias("significant"),
    )


def seasonal_sen(
    df: DataFrame | None = None,
    period: int = 24,
    bucket: str = "1h",
    by: str = "source",
    ts: str = "ts",
    counts: DataFrame | None = None,
) -> DataFrame:
    """Seasonal Sen slope per series (the Hirsch-Slack ESTIMATOR next
    to :func:`seasonal_mk`'s verdict): the median of all WITHIN-season
    pairwise slopes — :func:`theil_sen` with cross-phase pairs
    removed, so a clean diurnal cycle (which feeds plain Theil-Sen a
    symmetric cloud of huge +/- phase slopes and can destabilize the
    median between them) contributes only zeros, and the reported
    slope is the day-over-day drift in counts per bucket-step.

    Same determinism argument as theil_sen: each slope is one
    division of two exact integers (identical IEEE doubles both
    engines), the even-count median averages the two middle DOUBLES
    (DuckDB ``median()`` numeric semantics; middle values well-
    defined under any tie order), pooled across seasons per the
    standard seasonal-Kendall slope definition.

    Plan shape: seasonal_mk's exactly — ONE raw-scale partial-
    aggregatable groupBy (or none via ``counts=``); the pair join
    keys on (g, season), shrinking the quadratic period-fold.
    Output: ``g, n_buckets, n_pairs, sen_slope``.
    """
    sig = bucket_count_signal(df, bucket=bucket, by=by, ts=ts,
                              counts=counts).withColumn(
        "m", F.col("h") % period)
    a = sig.select("g", "m", F.col("h").alias("hi"),
                   F.col("c").alias("ci"))
    b = sig.select("g", "m", F.col("h").alias("hj"),
                   F.col("c").alias("cj"))
    slopes = (
        a.join(b, ["g", "m"])
        .filter(F.col("hj") > F.col("hi"))
        .select(
            "g",
            (
                (F.col("cj") - F.col("ci")).cast("double")
                / (F.col("hj") - F.col("hi")).cast("double")
            ).alias("s"),
        )
    )
    w = Window.partitionBy("g").orderBy("s")
    ranked = slopes.withColumn("__rn", F.row_number().over(w)).withColumn(
        "__n", F.count(F.lit(1)).over(Window.partitionBy("g"))
    )
    mid = ranked.filter(
        (F.col("__rn") == F.floor((F.col("__n") + 1) / 2))
        | (F.col("__rn") == F.floor((F.col("__n") + 2) / 2))
    )
    nb = sig.groupBy("g").agg(F.count(F.lit(1)).alias("n_buckets"))
    med = mid.groupBy("g").agg(
        F.max("__n").alias("n_pairs"), F.avg("s").alias("sen_slope")
    )
    return nb.join(med, "g")


def hurst_rs(
    df: DataFrame | None = None,
    min_w: int = 8,
    bucket: str = "1h",
    by: str = "source",
    ts: str = "ts",
    ndigits: int = 6,
    counts: DataFrame | None = None,
) -> DataFrame:
    """Hurst exponent per series via classical rescaled-range (R/S)
    analysis — the LONG-MEMORY read next to :func:`variance_ratio`
    (VR aggregates short-lag autocorrelation at ONE scale q; the
    Hurst slope says how dependence persists ACROSS scales): H ~ 0.5
    is a memoryless signal, H > 0.5 long-range persistence (load
    that trends for hours trends for days — capacity planning reads
    this number), H < 0.5 anti-persistent switching.

    Construction over the zero-filled signal: for each dyadic window
    size w (min_w, 2*min_w, ... while 4*w <= n — exact integer
    doubling, no float log2 edge), the signal splits into floor(n/w)
    full chunks (tail dropped, the classical convention); each chunk
    reduces to ONE exact-integer ratio pair:

        w*Z_t = w*cum_t - t*s           (exact decimal integers)
        R/S   = (max_t wZ_t - min_t wZ_t) / sqrt(w*q - s^2)

    — the w and 1/w factors of the textbook R = max(Z)-min(Z),
    S = sqrt(q/w - (s/w)^2) cancel, so the numerator is an exact
    integer range and the denominator ONE sqrt of the exact variance
    numerator (the chi2/kruskal cleared-denominator rule).  Chunks
    with zero variance drop (R/S undefined).  Per scale, R/S averages
    over chunks (9dp-fenced terms, 6dp-fenced mean — the one
    order-dependent reduction); H is the :func:`zipf_fit` closed-form
    OLS slope of ln(mean R/S) on ln(w), ``ndigits``-fenced, with r2
    riding along; series with fewer than 2 surviving scales report
    NULL.

    Plan shape: monitor-family economics — ONE raw-scale partial-
    aggregatable groupBy (or none via ``counts=``); the scale join
    replicates the tiny signal frame ~log2(n/4/min_w) times, chunk
    stats are two windows + one agg on that frame, the OLS runs on
    |series| x |scales| rows.  Output: ``g, n_buckets, n_scales,
    hurst, r2``.

    Reference: Hurst 1951 (Nile reservoir design — hydrology again);
    traval eyeballs persistence from multi-year plots, this is the
    calibrated exponent as a fleet query.
    """
    sig = bucket_count_signal(df, bucket=bucket, by=by, ts=ts,
                              counts=counts)
    wg = Window.partitionBy("g")
    sig = sig.withColumn("pos", F.col("h") - F.min("h").over(wg)) \
             .withColumn("n", F.count(F.lit(1)).over(wg))
    scales = (
        sig.groupBy("g").agg(F.count(F.lit(1)).alias("n"))
        .select(
            "g",
            F.explode(F.sequence(F.lit(0), F.lit(40))).alias("j"),
            "n",
        )
        .withColumn("w", F.lit(min_w)
                    * F.expr("shiftleft(1L, cast(j as int))"))
        .filter(4 * F.col("w") <= F.col("n"))
        .select("g", "w")
    )
    ch = (
        sig.join(F.broadcast(scales), "g")
        .withColumn("chunk", F.floor(F.col("pos") / F.col("w")))
        .filter((F.col("chunk") + 1) * F.col("w") <= F.col("n"))
    )
    wc = Window.partitionBy("g", "w", "chunk")
    wrun = wc.orderBy("h").rowsBetween(Window.unboundedPreceding, 0)
    dec = "decimal(38,0)"
    ch = (
        ch.withColumn("t", F.col("pos") % F.col("w") + 1)
        .withColumn("cum", F.sum("c").over(wrun))
        .withColumn("s", F.sum("c").over(wc))
        .withColumn("q", F.sum(F.col("c").cast(dec) * F.col("c")).over(wc))
        .withColumn(
            "zint",
            F.col("w").cast(dec) * F.col("cum")
            - F.col("t").cast(dec) * F.col("s"),
        )
    )
    per_chunk = ch.groupBy("g", "w", "chunk").agg(
        (F.max("zint") - F.min("zint")).alias("rng"),
        (F.max("w").cast(dec) * F.max("q")
         - F.max("s").cast(dec) * F.max("s")).alias("den2"),
    )
    rs = per_chunk.filter(F.col("den2") > 0).select(
        "g", "w",
        F.round(
            F.col("rng").cast("double")
            / F.sqrt(F.col("den2").cast("double")),
            9,
        ).alias("rs"),
    )
    per_scale = rs.groupBy("g", "w").agg(
        F.round(F.avg("rs"), 6).alias("mrs"))
    pts = per_scale.filter(F.col("mrs") > 0).select(
        "g",
        F.log(F.col("w").cast("double")).alias("x"),
        F.log("mrs").alias("y"),
    )
    nb = sig.groupBy("g").agg(F.count(F.lit(1)).alias("n_buckets"))
    ols = pts.groupBy("g").agg(
        F.count(F.lit(1)).alias("n_scales"),
        F.sum("x").alias("sx"), F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    k = F.col("n_scales").cast("double")
    den = k * F.col("sxx") - F.col("sx") * F.col("sx")
    num = k * F.col("sxy") - F.col("sx") * F.col("sy")
    deny = k * F.col("syy") - F.col("sy") * F.col("sy")
    return nb.join(ols, "g").select(
        "g",
        F.col("n_buckets").cast("long").alias("n_buckets"),
        F.col("n_scales").cast("long").alias("n_scales"),
        F.when(den > 0, F.round(num / den, ndigits)).alias("hurst"),
        F.when((den > 0) & (deny > 0),
               F.round(num * num / (den * deny), ndigits)).alias("r2"),
    )


def kpss_level(
    df: DataFrame | None = None,
    bucket: str = "1h",
    by: str = "source",
    ts: str = "ts",
    ndigits: int = 9,
    counts: DataFrame | None = None,
) -> DataFrame:
    """KPSS level-stationarity test per series (Kwiatkowski-Phillips-
    Schmidt-Shin 1992, the l=0 short-run variant) — the INVERTED null
    next to every other monitor here: Ljung-Box / runs / Pettitt all
    assume stability and hunt for structure; KPSS's NULL HYPOTHESIS
    is "this series is level-stationary" and a LARGE statistic
    rejects it — the gate a forecasting stage (ewma/holt/backtest)
    should check before trusting mean-reverting models, and the
    standard pre-test before differencing.

        e_t = c_t - mean,   S_t = sum_{i<=t} e_i
        KPSS = (1/n^2) * sum S_t^2 / (sum e_t^2 / n)

    With the cleared-denominator trick (hurst_rs' chunk identity at
    full span):  n*S_t = n*cum_t - t*s  is an exact decimal integer,
    and every n^k cancels into ONE exact-integer ratio:

        KPSS = sum_t (n*S_t)^2 / (n^2 * (n*q - s^2))

    — a single division of exact decimals, ``ndigits``-fenced, so
    the statistic is engine-identical without any float-sum fence.
    ``stationary`` gates against the 0.463 alpha=0.05 critical value
    (the published level-case asymptotic table).  The l=0 bandwidth
    means NO Newey-West autocorrelation correction: exact under
    iid-ish errors, over-rejecting for strongly autocorrelated
    residuals (documented — pair with :func:`ljung_box` to know which
    regime you are in).  Constant series (zero residual variance)
    report NULL; note S_n = 0 identically (the last term drops out
    of nothing — it is simply zero).

    Magnitude budget: |n*S_t| <= n^2 * c_max (~1e13 at n=1e4,
    c_max=1e5), squared ~1e26, summed over n ~1e30 — inside
    decimal(38,0); the denominator ~1e19.

    Plan shape: monitor-family economics — ONE raw-scale partial-
    aggregatable groupBy (or none via ``counts=``), one running-sum
    window, one final agg on the tiny signal frame.  Output: ``g, n,
    kpss, stationary``.

    Reference: traval models assume stationary residuals around the
    pastas prediction interval (rulelib.py rule_pastas_outside_pi);
    this is the test of that assumption as a fleet query.
    """
    sig = bucket_count_signal(df, bucket=bucket, by=by, ts=ts,
                              counts=counts)
    wg = Window.partitionBy("g")
    wrun = wg.orderBy("h").rowsBetween(Window.unboundedPreceding, 0)
    dec = "decimal(38,0)"
    rows = (
        sig.withColumn("cum", F.sum("c").over(wrun))
        .withColumn("s", F.sum("c").over(wg))
        .withColumn("n", F.count(F.lit(1)).over(wg))
        .withColumn(
            "t",
            F.row_number().over(wg.orderBy("h")),
        )
        .withColumn(
            "ns",
            F.col("n").cast(dec) * F.col("cum")
            - F.col("t").cast(dec) * F.col("s"),
        )
    )
    agg = rows.groupBy("g").agg(
        F.max("n").cast(dec).alias("n"),
        F.max("s").cast(dec).alias("s"),
        F.sum(F.col("c").cast(dec) * F.col("c")).alias("q"),
        F.sum(F.col("ns") * F.col("ns")).alias("ss2"),
    )
    den = F.col("n") * F.col("n") * (F.col("n") * F.col("q")
                                     - F.col("s") * F.col("s"))
    kpss = F.when(
        den > 0,
        F.round(F.col("ss2").cast("double") / den.cast("double"),
                ndigits),
    )
    return agg.select(
        "g",
        F.col("n").cast("long").alias("n"),
        kpss.alias("kpss"),
        F.when(kpss.isNotNull(),
               (kpss <= 0.463).cast("int")).alias("stationary"),
    )


def fleet_report(
    df: DataFrame | None = None,
    bucket: str = "1h",
    by: str = "source",
    ts: str = "ts",
    period: int = 24,
    period_max_lag: int = 30,
    counts: DataFrame | None = None,
) -> DataFrame:
    """The fleet owner's one-page health report: every single-row-
    per-series monitor of the counts= family joined into ONE wide
    frame — dispersion (:func:`fano_dispersion`), robust trend
    (:func:`theil_sen` + :func:`mann_kendall`), seasonality
    (:func:`seasonal_strength`, :func:`dominant_period`), randomness
    (:func:`runs_test`), persistence (:func:`variance_ratio`,
    :func:`hurst_rs`), stationarity (:func:`kpss_level`) and change
    detection (:func:`pettitt_change`).  This is the payoff of the
    shared ``counts=`` contract: the zero-filled signal is built ONCE
    (one raw-scale partial-aggregatable groupBy — or ZERO raw work
    when served off a stored rollup tier) and persisted; all ten
    monitors then run on the cached (|series| x span) frame and join
    back on ``g`` — at 100 TB this whole report costs one scan of the
    tier, never ten scans of raw.

    Monitors that emit nothing for degenerate series (hurst on
    all-constant, runs on all-tied) contribute NULL columns via left
    joins from the always-total fano base — absence is reported, not
    dropped.  Column names are prefixed where ambiguous (``mk_z``,
    ``runs_z``, ``vr_z``, ``pettitt_p``, ``change_sig``,
    ``period_sig``).

    Reference: traval's Detector prints per-series rule summaries one
    series at a time (plots.py overviews); this is the fleet-wide
    statistical panel a 100k-series deployment actually reads.
    """
    sig = bucket_count_signal(df, bucket=bucket, by=by, ts=ts,
                              counts=counts).persist()
    base = fano_dispersion(counts=sig).select(
        "g", "n_buckets", "mean_c", "fano")
    parts = [
        theil_sen(counts=sig).select("g", "sen_slope"),
        mann_kendall(counts=sig).select(
            "g", F.col("z").alias("mk_z")),
        seasonal_strength(counts=sig, period=period).select(
            "g", "strength"),
        dominant_period(counts=sig, max_lag=period_max_lag).select(
            "g", "period", F.col("significant").alias("period_sig")),
        runs_test(counts=sig).select(
            "g", F.col("z").alias("runs_z"), "random_ok"),
        variance_ratio(counts=sig).select(
            "g", "vr", F.col("z").alias("vr_z")),
        kpss_level(counts=sig).select("g", "kpss", "stationary"),
        pettitt_change(counts=sig).select(
            "g", F.col("p").alias("pettitt_p"),
            F.col("significant").alias("change_sig")),
        hurst_rs(counts=sig).select("g", "hurst"),
    ]
    out = base
    for p in parts:
        out = out.join(p, "g", "left")
    return out


def sen_slope_ci(
    df: DataFrame | None = None,
    z_crit: float = 1.96,
    bucket: str = "1h",
    by: str = "source",
    ts: str = "ts",
    counts: DataFrame | None = None,
) -> DataFrame:
    """Rank-based confidence interval on the Theil-Sen slope (the
    Gilbert 1987 / Hollander-Wolfe construction the environmental-
    trend literature reports next to every Sen estimate): the
    :func:`mann_kendall` variance puts an error bar on the slope
    WITHOUT any normality assumption on the data — the CI endpoints
    are ORDER STATISTICS of the same pairwise-slope multiset the
    median came from:

        C  = z_crit * sqrt(Var(S))        (tie-corrected Var, exact
                                           integer numerator / 18)
        lo = slope_(floor((N - C)/2) + 1),  hi = slope_(ceil((N + C)/2))

    with N the pair count and ranks ascending, clamped to [1, N].
    ``significant`` reports lo > 0 or hi < 0 — a slope whose CI
    excludes zero, the standard "trend is real" read that agrees
    with Mann-Kendall's |z| > z_crit verdict asymptotically.

    Determinism: Var(S)'s numerator is an exact integer (the MK tie
    census), C and the rank indices are one fixed expression chain
    (sqrt -> 9dp round -> floor/ceil) identical in both engines, and
    the VALUE at a rank is well-defined under any tie order (the
    theil_sen median argument).  Series with Var(S) = 0 (all tied)
    report NULL bounds.

    Plan shape: theil_sen's exactly — ONE raw-scale groupBy (or none
    via ``counts=``), the O(m^2) slope pairs + rank window on the
    tiny signal frame, the per-series (lo_rank, hi_rank) scalars
    broadcast back.  Output: ``g, n_pairs, sen_slope, lo, hi,
    significant``.

    Reference: traval reports trends from pastas model fits with
    model-based CIs (rulelib.py); this is the distribution-free CI
    for series where no model exists.
    """
    # the signal feeds the slope self-join, the bucket count, the tie
    # census (and previously a theil_sen call that re-derived the whole
    # O(m^2) pair frame): persist it — the r5 plan re-ran the raw
    # groupBy per consumer (lambda-carrying subtrees defeat exchange
    # reuse)
    sig = bucket_count_signal(df, bucket=bucket, by=by, ts=ts,
                              counts=counts).persist()
    a = sig.select("g", F.col("h").alias("hi_"), F.col("c").alias("ci"))
    b = sig.select("g", F.col("h").alias("hj"), F.col("c").alias("cj"))
    slopes = (
        a.join(b, "g")
        .filter(F.col("hj") > F.col("hi_"))
        .select(
            "g",
            (
                (F.col("cj") - F.col("ci")).cast("double")
                / (F.col("hj") - F.col("hi_")).cast("double")
            ).alias("s"),
        )
    )
    w = Window.partitionBy("g").orderBy("s")
    ranked = slopes.withColumn("rn", F.row_number().over(w))
    # MK variance from the tie census (exact integer numerator)
    nb = sig.groupBy("g").agg(F.count(F.lit(1)).alias("n_buckets"))
    tie = (
        sig.groupBy("g", "c").agg(F.count(F.lit(1)).alias("t"))
        .groupBy("g")
        .agg(F.sum(F.col("t") * (F.col("t") - 1)
                   * (2 * F.col("t") + 5)).alias("tt"))
    )
    nn = F.col("n_buckets")
    var_num = nn * (nn - 1) * (2 * nn + 5) - F.col("tt")
    npairs = (nn * (nn - 1) / 2).cast("long")
    c_half = F.round(
        F.lit(float(z_crit)) * F.sqrt(var_num.cast("double")
                                      / F.lit(18.0)),
        9,
    )
    idx = (
        nb.join(tie, "g")
        .select(
            "g",
            npairs.alias("n_pairs"),
            var_num.alias("__vn"),
            F.greatest(
                F.lit(1),
                (F.floor((npairs.cast("double") - c_half) / 2)
                 + 1).cast("long"),
            ).alias("__lor"),
            F.least(
                npairs,
                F.ceil((npairs.cast("double") + c_half) / 2)
                .cast("long"),
            ).alias("__hir"),
        )
    )
    # ONE pass over the ranked slope multiset extracts all four order
    # statistics (previously: two rank-filter passes here plus a
    # theil_sen call that rebuilt the identical pair frame and rank
    # window a third and fourth time).  The median replicates
    # theil_sen's selection verbatim — avg of the values at ascending
    # ranks floor((N+1)/2) and floor((N+2)/2) of the SAME multiset
    # (n_pairs == the slope count: every zero-filled bucket pair has a
    # distinct h), so sen_slope is value-identical.
    idx = idx.withColumn(
        "__m1", F.floor((F.col("n_pairs") + 1) / 2)
    ).withColumn("__m2", F.floor((F.col("n_pairs") + 2) / 2))
    j = ranked.join(F.broadcast(idx), "g")
    stats = j.groupBy("g").agg(
        F.max(F.when(F.col("rn") == F.col("__lor"), F.col("s")))
        .alias("lo"),
        F.max(F.when(F.col("rn") == F.col("__hir"), F.col("s")))
        .alias("hi"),
        F.avg(
            F.when((F.col("rn") == F.col("__m1"))
                   | (F.col("rn") == F.col("__m2")), F.col("s"))
        ).alias("sen_slope"),
    )
    out = idx.join(stats, "g")
    valid = F.col("__vn") > 0
    lo_o = F.when(valid, F.col("lo"))
    hi_o = F.when(valid, F.col("hi"))
    return out.select(
        "g", "n_pairs", "sen_slope",
        lo_o.alias("lo"), hi_o.alias("hi"),
        F.when(
            valid,
            ((F.col("lo") > 0) | (F.col("hi") < 0)).cast("int"),
        ).alias("significant"),
    )


def cvm_from_hists(
    ha: DataFrame,
    hb: DataFrame,
    by: tuple[str, ...] = ("source",),
    ndigits: int = 6,
) -> DataFrame:
    """Two-sample Cramer-von Mises T from two histogram count frames
    (``*by, bin, ca`` / ``*by, bin, cb``) — the INTEGRATED companion
    to :func:`ks_from_hists`: KS reports the single worst CDF gap
    (sharp against one concentrated shift), CvM integrates the
    SQUARED gap over the whole distribution, so many small
    everywhere-deviations that never produce one big KS gap still
    accumulate — the classic power win against scale/spread changes.
    Same tier-served contract as the KS/PSI/MW family: feed per-period
    bin counts summed off a stored hist tier and raw is never
    re-scanned.

    Exactness: over the pooled distinct bins with h_j = ca_j + cb_j
    and inclusive cumulative counts CA_j, CB_j,

        T = sum_j h_j * (CA_j/n_a - CB_j/n_b)^2 * n_a*n_b / N^2
          = sum_j h_j * d_j^2 / (n_a * n_b * N^2),
        d_j = CA_j*n_b - CB_j*n_a          (exact decimal integer)

    — d_j is exact per bin; its square follows the chi2 overflow rule
    (multiplied AS DOUBLE: 1e24 squared exceeds decimal(38,0) but not
    the double range), the bin-sum is the one order-dependent
    reduction, and the single division lands on the ``ndigits``
    fence.  ``drifted`` gates round(T) against 0.461 — the
    alpha=0.05 critical value of the LIMITING one-sample omega^2
    distribution the two-sample statistic converges to (asymptotic;
    documented, the standard table use).

    Plan shape: ks_from_hists' exactly — one full-outer join on the
    tiny bin table, one cumsum window, one groupBy.  Output: ``*by,
    n_a, n_b, cvm, drifted``.
    """
    j = (
        ha.join(hb, [*by, "bin"], "full_outer")
        .select(
            *by, "bin",
            F.coalesce("ca", F.lit(0)).alias("ca"),
            F.coalesce("cb", F.lit(0)).alias("cb"),
        )
    )
    w = (
        Window.partitionBy(*by).orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = j.select(
        *by, "bin",
        (F.col("ca") + F.col("cb")).cast("decimal(38,0)").alias("h"),
        F.sum(F.col("ca").cast("decimal(38,0)")).over(w).alias("cca"),
        F.sum(F.col("cb").cast("decimal(38,0)")).over(w).alias("ccb"),
    )
    tot = j.groupBy(*by).agg(
        F.sum("ca").alias("n_a"), F.sum("cb").alias("n_b")
    )
    t = cum.join(tot, list(by))
    d = (F.col("cca") * F.col("n_b").cast("decimal(38,0)")
         - F.col("ccb") * F.col("n_a").cast("decimal(38,0)"))
    term = (F.col("h").cast("double")
            * d.cast("double") * d.cast("double"))
    agg = t.groupBy(*by).agg(
        F.max("n_a").alias("n_a"), F.max("n_b").alias("n_b"),
        F.sum(term).alias("__s"),
    )
    na = F.col("n_a").cast("decimal(38,0)")
    nb_ = F.col("n_b").cast("decimal(38,0)")
    nn = ((F.col("n_a") + F.col("n_b"))).cast("decimal(38,0)")
    den = (na * nb_).cast("double") * (nn * nn).cast("double")
    cvm = F.when(
        (F.col("n_a") > 0) & (F.col("n_b") > 0),
        F.round(F.col("__s") / den, ndigits),
    )
    return agg.select(
        *by, "n_a", "n_b",
        cvm.alias("cvm"),
        F.when(cvm.isNotNull(),
               (cvm > 0.461).cast("int")).alias("drifted"),
    )


def cvm_drift(
    df_a: DataFrame,
    df_b: DataFrame,
    by: tuple[str, ...] = ("source",),
    val: str = "value",
    scale: int = 1,
    ndigits: int = 6,
) -> DataFrame:
    """Two-sample Cramer-von Mises drift between two snapshots of the
    same measure, binned by the hist.py discretization
    (``round(v*scale)``) so the identical read serves from raw or
    from a stored histogram tier (:func:`cvm_from_hists`,
    parity-tested).  One groupBy per snapshot; everything downstream
    runs on the tiny bin table."""
    def hist(d, cname):
        return d.groupBy(
            *by, F.round(F.col(val) * scale).cast("long").alias("bin")
        ).agg(F.count("*").alias(cname))

    return cvm_from_hists(hist(df_a, "ca"), hist(df_b, "cb"), by=by,
                          ndigits=ndigits)


def cliffs_delta(
    df_a: DataFrame,
    df_b: DataFrame,
    by: tuple[str, ...] = ("source",),
    val: str = "value",
    scale: int = 1,
    ndigits: int = 9,
) -> DataFrame:
    """Cliff's delta effect size between two snapshots — the
    MAGNITUDE companion to :func:`mann_whitney`'s significance: at
    fleet scale n is so large that MW's z flags shifts of no
    practical size (everything is "significant" at n = 10^9); delta
    = P(a > b) - P(a < b) in [-1, 1] is sample-size-free and answers
    "how BIG is the shift?".  Computed off the same hist-tier bin
    table with the same midrank identity (no per-row ranking):

        delta = (2*U_a - n_a*n_b) / (n_a*n_b)

    where 2*U_a = sum_v ca_v*(2*cum_lt + t_v + 1) - n_a*(n_a+1) is
    the exact-integer doubled U — with midrank ties this is EXACTLY
    (#(a>b) - #(a<b))/(n_a*n_b), the textbook tie-consistent Cliff's
    delta.  One division of exact decimals, ``ndigits``-fenced;
    ``magnitude`` buckets the ROUNDED |delta| at the standard Romano
    thresholds (0.147 / 0.33 / 0.474 — negligible, small, medium,
    large), deterministic because the compare runs on the fenced
    value.  Groups present in only one sample report NULL.

    Plan shape: mann_whitney's exactly — two tiny bin tables,
    full-outer join, one cumsum window, one groupBy; serves from a
    stored hist tier unchanged.  Output: ``*by, n_a, n_b, delta,
    magnitude``.
    """
    def hist(d, cname):
        return d.groupBy(
            *by, F.round(F.col(val) * scale).cast("long").alias("bin")
        ).agg(F.count("*").alias(cname))

    return cliffs_from_hists(hist(df_a, "ca"), hist(df_b, "cb"),
                             by=by, ndigits=ndigits)


def cliffs_from_hists(
    ha: DataFrame,
    hb: DataFrame,
    by: tuple[str, ...] = ("source",),
    ndigits: int = 9,
) -> DataFrame:
    """:func:`cliffs_delta` fed pre-aggregated bin count frames
    (``*by, bin, ca`` / ``*by, bin, cb``) — the hist-tier-served form,
    identical arithmetic (see cliffs_delta for the construction)."""
    j = (
        ha.join(hb, [*by, "bin"], "full_outer")
        .select(
            *by, "bin",
            F.coalesce("ca", F.lit(0)).cast("decimal(38,0)").alias("ca"),
            F.coalesce("cb", F.lit(0)).cast("decimal(38,0)").alias("cb"),
        )
    )
    t = (F.col("ca") + F.col("cb"))
    w_lt = (
        Window.partitionBy(*by).orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    per_bin = j.select(
        *by, "ca", "cb", t.alias("t"),
        F.coalesce(F.sum(t).over(w_lt), F.lit(0).cast("decimal(38,0)"))
        .alias("cum_lt"),
    )
    g = per_bin.groupBy(*by).agg(
        F.sum("ca").alias("n_a"),
        F.sum("cb").alias("n_b"),
        F.sum(
            F.col("ca") * (2 * F.col("cum_lt") + F.col("t") + 1)
        ).alias("__r2"),
    )
    d2 = (F.col("__r2") - F.col("n_a") * (F.col("n_a") + 1)
          - F.col("n_a") * F.col("n_b"))
    delta = F.when(
        F.col("n_a") * F.col("n_b") > 0,
        F.round(
            d2.cast("double")
            / (F.col("n_a") * F.col("n_b")).cast("double"),
            ndigits,
        ),
    )
    mag = F.when(
        delta.isNotNull(),
        F.when(F.abs(delta) < 0.147, F.lit("negligible"))
         .when(F.abs(delta) < 0.33, F.lit("small"))
         .when(F.abs(delta) < 0.474, F.lit("medium"))
         .otherwise(F.lit("large")),
    )
    return g.select(
        *by,
        F.col("n_a").cast("long").alias("n_a"),
        F.col("n_b").cast("long").alias("n_b"),
        delta.alias("delta"),
        mag.alias("magnitude"),
    )


def drift_report(
    df_a: DataFrame,
    df_b: DataFrame,
    by: tuple[str, ...] = ("source",),
    val: str = "value",
    scale: int = 1,
) -> DataFrame:
    """The drift owner's one-page panel — every two-sample monitor of
    the hist-tier family on ONE pair of bin tables: KS (worst CDF
    gap), Cramer-von Mises (integrated squared gap), Mann-Whitney
    (signed location z), Cliff's delta (sample-size-free magnitude),
    PSI (log-odds weighting), Jensen-Shannon (bounded divergence),
    EMD (Wasserstein-1 in value units) and chi-square with Cramer's V
    — eight verdicts that disagree EXACTLY when the disagreement is
    informative (a pure spread change: CvM fires, MW silent; a tiny
    shift at n=10^9: z fires, delta negligible).

    This is :func:`fleet_report`'s two-snapshot sibling and the same
    counts-contract payoff: the two histograms are built ONCE
    (``round(v*scale)`` — the hist.py discretization, so both can
    come straight off a stored hist tier) and persisted; all eight
    monitors run on the tiny bin tables and join back on ``by``.  At
    100 TB the panel costs two tier reads, never eight scans of raw.

    Output: ``*by, n_a, n_b, ks_d, ks_drifted, cvm, cvm_drifted,
    mw_z, mw_shifted, delta, magnitude, psi, jsd_norm, emd,
    cramers_v, chi2_drifted``.
    """
    def hist(d, cname):
        return d.groupBy(
            *by, F.round(F.col(val) * scale).cast("long").alias("bin")
        ).agg(F.count("*").alias(cname))

    ha = hist(df_a, "ca").persist()
    hb = hist(df_b, "cb").persist()
    base = ks_from_hists(ha, hb, by=by).select(
        *by, "n_a", "n_b", "ks_d",
        F.col("drifted").alias("ks_drifted"))
    parts = [
        cvm_from_hists(ha, hb, by=by).select(
            *by, "cvm", F.col("drifted").alias("cvm_drifted")),
        mw_from_hists(ha, hb, by=by).select(
            *by, F.col("z").alias("mw_z"),
            F.col("shifted").alias("mw_shifted")),
        cliffs_from_hists(ha, hb, by=by).select(
            *by, "delta", "magnitude"),
        psi_from_hists(ha, hb, by=by).select(*by, "psi"),
        jsd_from_hists(ha, hb, by=by).select(*by, "jsd_norm"),
        emd_from_hists(ha, hb, by=by).select(*by, "emd"),
        chi2_from_hists(ha, hb, by=by).select(
            *by, "cramers_v", F.col("drifted").alias("chi2_drifted")),
    ]
    out = base
    for p in parts:
        out = out.join(p, list(by), "left")
    return out
