"""Per-rule exact-count tests.

Each test re-expresses one reference test
(/root/reference/tests/test_006_rulelib.py) as a DataFrame assertion with
the reference's exact expected counts — the correctness spec for every
rule kernel (SURVEY.md §5). Where the rule runs on multiple series at
once, a second series is added to prove per-series isolation.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from tests.conftest import make_series_df
from traval_spark.operators import rules as R


def code_counts(df, out="r"):
    rows = df.groupBy(f"{out}_code").count().collect()
    return {r[0]: r[1] for r in rows}


def test_rule_ufunc_threshold_float(daily10):
    c = R.rule_ufunc_threshold(
        daily10, "value", "r", ufunc="greater_equal", threshold=5
    )
    assert code_counts(c).get(2, 0) == 5  # test_006:13


def test_rule_ufunc_threshold_series(spark, daily10):
    idx = pd.date_range("2020-01-01", freq="D", periods=10)
    thr_idx = idx[:3].tolist() + idx[-4:-1].tolist()
    thr = spark.createDataFrame(
        pd.DataFrame({"series_id": "s1", "ts": thr_idx, "value": 5.0})
    )
    c = R.rule_ufunc_threshold(
        daily10, "value", "r", ufunc="greater_equal", threshold=thr
    )
    assert code_counts(c).get(2, 0) == 5  # test_006:23


def test_rule_diff_ufunc_threshold(spark):
    v = np.arange(10, dtype=float)
    v[4] += 1
    df = make_series_df(spark, v)
    c = R.rule_diff_ufunc_threshold(
        df, "value", "r", ufunc="greater_equal", threshold=1.1
    )
    assert code_counts(c).get(2, 0) == 1  # test_006:31


def test_rule_other_ufunc_threshold(spark, daily10):
    other = make_series_df(spark, np.arange(10))
    c = R.rule_other_ufunc_threshold(
        daily10, "value", "r", other=other, ufunc="less", threshold=5
    )
    assert code_counts(c).get(-2, 0) == 5  # test_006:40


def test_rule_max_gradient(spark):
    v = np.arange(10, dtype=float)
    v[4] += 1
    c = R.rule_max_gradient(
        make_series_df(spark, v), "value", "r", max_step=1.0, max_timestep="1D"
    )
    assert code_counts(c).get(2, 0) == 1  # test_006:49


def test_rule_spike_detection(spark):
    v = np.arange(10, dtype=float)
    v[4] += 3
    c = R.rule_spike_detection(
        make_series_df(spark, v), "value", "r", threshold=2, spike_tol=2
    )
    assert code_counts(c).get(99, 0) == 1  # test_006:59


def test_rule_offset_detection(spark):
    v = np.arange(10, dtype=float)
    v[3:7] += 10
    c = R.rule_offset_detection(
        make_series_df(spark, v), "value", "r", threshold=5, updown_diff=2.0
    )
    assert code_counts(c).get(99, 0) == 4  # test_006:68


def test_rule_outside_n_sigma(daily10):
    c = R.rule_outside_n_sigma(daily10, "value", "r", n=1.0)
    counts = code_counts(c)
    assert counts.get(-2, 0) == 2 and counts.get(2, 0) == 2  # test_006:75-76


def test_rule_diff_outside_of_n_sigma(spark):
    v = np.arange(10, dtype=float)
    v[5:] += np.arange(5)
    c = R.rule_diff_outside_of_n_sigma(make_series_df(spark, v), "value", "r", n=2.0)
    assert code_counts(c).get(2, 0) == 4  # test_006:85


def test_rule_outside_bandwidth(spark, daily10):
    idx = pd.date_range("2020-01-01", freq="D", periods=10)
    lb = spark.createDataFrame(
        pd.DataFrame({"series_id": "s1", "ts": idx[[0, -1]], "value": [1.0, 2.0]})
    )
    ub = spark.createDataFrame(
        pd.DataFrame({"series_id": "s1", "ts": idx[[0, -1]], "value": [7.0, 8.0]})
    )
    c = R.rule_outside_bandwidth(daily10, "value", "r", lowerbound=lb, upperbound=ub)
    counts = code_counts(c)
    assert counts.get(-2, 0) == 2 and counts.get(2, 0) == 2  # test_006:96-97


def test_rule_compare_to_manual_obs(spark, daily10):
    idx = pd.date_range("2020-01-01", freq="D", periods=10)
    h = spark.createDataFrame(
        pd.DataFrame({"series_id": "s1", "ts": idx[[1, -1]], "value": [2.0, 7.0]})
    )
    c = R.rule_compare_to_manual_obs(
        daily10, "value", "r", manual_obs=h, threshold=1.0, max_dt="2D",
        method="linear",
    )
    assert code_counts(c).get(-2, 0) == 3  # test_006:108


def test_rule_shift_to_manual_obs(spark, daily10):
    idx = pd.date_range("2020-01-01", freq="D", periods=10)
    h = spark.createDataFrame(
        pd.DataFrame({"series_id": "s1", "ts": idx[[1, -1]], "value": [2.0, 10.0]})
    )
    c = R.rule_shift_to_manual_obs(daily10, "value", "r", hseries=h, max_dt="2D")
    adj = [r["r_corr"] for r in c.orderBy("ts").collect()]
    # test_006:116-118: first value unshifted, rest shifted by +1
    assert adj[0] == 0.0
    assert adj[1:] == [float(v) + 1 for v in range(1, 10)]


def test_rule_funcdict(daily10):
    fdict = {"lt_3": lambda s: s < 3.0, "gt_7": lambda s: s > 7.0}
    c = R.rule_funcdict(daily10, "value", "r", funcdict=fdict)
    assert code_counts(c).get(99, 0) == 5  # test_006:172


def test_rule_keep_comments(spark):
    comments = ["keep"] * 4 + [""] * 3 + ["discard"] * 3
    df = make_series_df(spark, np.arange(10), comments=comments)
    c = R.rule_keep_comments(
        df, "value", "r", keep_comments=["keep"], comment_series="comment"
    )
    counts = code_counts(c)
    assert counts.get(99, 0) == 4  # test_006:186
    n_cval = c.filter(F.col("r_cval") == "keep").count()
    assert n_cval == 4  # test_006:187


def test_rule_flat_signal_matches_pandas(spark):
    vals = np.concatenate([np.arange(5, dtype=float), np.full(5, 4.0)])
    df = make_series_df(spark, vals)
    c = R.rule_flat_signal(
        df, "value", "r", window=3, min_obs=2, std_threshold=0.1
    )
    got = code_counts(c).get(99, 0)
    # pandas oracle (rulelib.py:916-918 semantics)
    s = pd.Series(vals, index=pd.date_range("2020-01-01", freq="D", periods=10))
    expected = int((s.dropna().rolling("3D", min_periods=2).std() < 0.1).sum())
    assert got == expected == 4


def test_rules_are_per_series_isolated(spark):
    """Two series in one frame: window rules must not leak across ids."""
    v = np.arange(10, dtype=float)
    v[4] += 3
    a = make_series_df(spark, v, sid="a")
    # series b is flat, no spikes
    b = make_series_df(spark, np.zeros(10), sid="b")
    df = a.unionByName(b)
    c = R.rule_spike_detection(df, "value", "r", threshold=2, spike_tol=2)
    per_sid = {
        r["series_id"]: r["n"]
        for r in c.filter(F.col("r_code") == 99)
        .groupBy("series_id").agg(F.count("*").alias("n")).collect()
    }
    assert per_sid == {"a": 1}


def test_combine_rules(spark):
    v1 = np.arange(10, dtype=float)
    v1[0] = np.nan
    v2 = np.arange(10, dtype=float)
    v2[-1] = np.nan
    df = make_series_df(spark, v1).withColumnRenamed("value", "s1")
    df2 = make_series_df(spark, v2).select("series_id", "ts",
                                           F.col("value").alias("s2"))
    j = df.join(df2, on=["series_id", "ts"])
    # OR: NULL where any input NULL (test_006:129-130)
    c = R.rule_combine_nan_or(j, ["s1", "s2"], "r")
    assert c.filter(F.col("r_res").isNull()).count() == 2
    # AND: NULL where all inputs NULL (test_006:151-152)
    v3 = np.arange(10, dtype=float)
    v3[0:2] = np.nan
    v4 = np.arange(10, dtype=float)
    v4[1:3] = np.nan
    j2 = (
        make_series_df(spark, v3).withColumnRenamed("value", "s1")
        .join(make_series_df(spark, v4).select(
            "series_id", "ts", F.col("value").alias("s2")),
            on=["series_id", "ts"])
    )
    # result copies s1 (incl. its own NaNs) and NaNs where ALL inputs NaN:
    # s1 NaN at {0,1}, all-NaN at {1} -> 2 NULLs total (test_006:151-152)
    c2 = R.rule_combine_nan_and(j2, ["s1", "s2"], "r")
    assert c2.filter(F.col("r_res").isNull()).count() == 2


def test_combine_corrections(spark):
    base = make_series_df(spark, np.arange(10))
    codes1 = F.when(F.col("ts") == F.lit("2020-01-01").cast("timestamp"),
                    99).otherwise(0)
    codes2 = F.when(F.col("ts") == F.lit("2020-01-10").cast("timestamp"),
                    -2).otherwise(0)
    j = base.withColumn("c1", codes1).withColumn("c2", codes2)
    c_or = R.rule_combine_corrections_or(j, ["c1", "c2"], "r")
    assert c_or.filter(F.col("r_res") == 99).count() == 2  # test_006:140
    # overlap on one ts -> AND
    codes3 = F.when(F.col("ts").isin("2020-01-01", "2020-01-02"), 99).otherwise(0)
    codes4 = F.when(F.col("ts").isin("2020-01-02", "2020-01-03"), -2).otherwise(0)
    j2 = base.withColumn("c1", codes3).withColumn("c2", codes4)
    c_and = R.rule_combine_corrections_and(j2, ["c1", "c2"], "r")
    assert c_and.filter(F.col("r_res") == 99).count() == 1  # test_006:163


def test_chunked_equals_unchunked(spark):
    """Chunked (series, time-chunk)+halo evaluation is EXACT for gap-aware
    rules: rows farther than max_gap can never influence a diff, so a
    max_gap halo preserves semantics while multiplying parallelism."""
    import pandas as pd

    rng = np.random.default_rng(11)
    n = 4000
    ts = pd.to_datetime("2024-01-01") + pd.to_timedelta(
        np.cumsum(rng.integers(10, 4000, n)), unit="s"
    )
    vals = np.cumsum(rng.normal(0, 1.0, n))
    vals[rng.integers(0, n, 40)] += 25  # planted spikes
    df = spark.createDataFrame(
        pd.DataFrame({"series_id": "s", "ts": ts, "value": vals})
    )
    kw = dict(threshold=10.0, spike_tol=10.0, max_gap="30m")
    plain = R.rule_spike_detection(df, "value", "r", **kw)
    chunked = R.rule_spike_detection(df, "value", "r", chunk="2h", **kw)
    fa = plain.filter(F.col("r_code") != 0).select("ts")
    fb = chunked.filter(F.col("r_code") != 0).select("ts")
    assert fa.count() == fb.count() > 0
    assert fa.exceptAll(fb).count() == 0 and fb.exceptAll(fa).count() == 0

    d_plain = R.rule_diff_ufunc_threshold(
        df, "value", "r", ufunc="greater_equal", threshold=5.0, max_gap="30m"
    )
    d_chunk = R.rule_diff_ufunc_threshold(
        df, "value", "r", ufunc="greater_equal", threshold=5.0, max_gap="30m",
        chunk="2h",
    )
    ca = d_plain.filter(F.col("r_code") != 0).select("ts")
    cb = d_chunk.filter(F.col("r_code") != 0).select("ts")
    assert ca.count() == cb.count() > 0
    assert ca.exceptAll(cb).count() == 0 and cb.exceptAll(ca).count() == 0


def test_nsigma_via_join_equal(spark):
    """via_join (agg + broadcast join) == unbounded-window n-sigma."""
    rng = np.random.default_rng(3)
    df = make_series_df(spark, rng.normal(0, 1, 500), freq="h")
    a = R.rule_outside_n_sigma(df, "value", "r", n=1.5)
    b = R.rule_outside_n_sigma(df, "value", "r", n=1.5, via_join=True)
    fa = a.filter(F.col("r_code") != 0).select("ts", "r_code")
    fb = b.filter(F.col("r_code") != 0).select("ts", "r_code")
    assert fa.count() == fb.count() > 0
    assert fa.exceptAll(fb).count() == 0 and fb.exceptAll(fa).count() == 0


def test_rule_hampel(spark):
    """Hampel filter flags planted outliers; clean sine stays untouched."""
    rng_vals = np.sin(np.arange(50) / 5.0) * 2
    rng_vals[20] += 15
    rng_vals[35] -= 12
    idx = pd.date_range("2020-01-01", freq="h", periods=50)
    df = spark.createDataFrame(
        pd.DataFrame({"series_id": "s", "ts": idx, "value": rng_vals})
    )
    c = R.rule_hampel(df, "value", "r", window="12h", k=3.0, min_obs=4)
    flagged = sorted(
        (r["ts"] - idx[0].to_pydatetime()).total_seconds() / 3600
        for r in c.filter(F.col("r_code") != 0).collect()
    )
    assert flagged == [20.0, 35.0]


def test_rule_max_gradient_column_negative_step(spark):
    """Per-series (Column) max_step with a NEGATIVE value must take the
    negative-gradient branch row-wise (rulelib.py:90-98) — regression for
    the always-positive-branch bug with Column parameters."""
    v = np.arange(10, dtype=float)
    v[4] -= 2  # one gradient of -3/day, then +3/day back
    df = make_series_df(spark, v).withColumn("ms", F.lit(-1.0))
    c = R.rule_max_gradient(df, "value", "r", max_step=F.col("ms"),
                            max_timestep="1D")
    counts = code_counts(c)
    assert counts.get(-2, 0) == 1  # only the falling gradient
    assert counts.get(2, 0) == 0

    # positive Column max_step must equal the scalar path
    df2 = make_series_df(spark, v).withColumn("ms", F.lit(1.0))
    c2 = R.rule_max_gradient(df2, "value", "r", max_step=F.col("ms"),
                             max_timestep="1D")
    c2s = R.rule_max_gradient(make_series_df(spark, v), "value", "r",
                              max_step=1.0, max_timestep="1D")
    assert code_counts(c2) == code_counts(c2s)


def _irregular_series(spark, seed=7, n=1500):
    """Two series, irregular minute-level steps, NaNs and a big gap."""
    rng = np.random.default_rng(seed)
    frames = []
    for sid in ("a", "b"):
        steps = rng.integers(60, 1800, size=n).cumsum()
        steps[n // 2:] += 3 * 86400  # a multi-day gap mid-series
        ts = pd.Timestamp("2021-03-01") + pd.to_timedelta(steps, unit="s")
        v = rng.normal(50.0, 10.0, size=n)
        v[rng.random(n) < 0.03] = np.nan  # flagged points ride through
        v[rng.random(n) < 0.01] += 120.0  # outliers for hampel to find
        frames.append(pd.DataFrame({"series_id": sid, "ts": ts, "value": v}))
    return spark.createDataFrame(pd.concat(frames))


def _corr_rows(df, out="r"):
    rows = df.select("series_id", "ts", f"{out}_code", f"{out}_sval",
                     f"{out}_cval").collect()
    return sorted(
        (r[0], r[1], r[2],
         None if r[3] is None else round(r[3], 9),
         None if r[4] is None else round(float(r[4]), 9))
        for r in rows
    )


def test_hampel_chunked_equals_window(spark):
    """The O(n log w) chunked pandas kernel must reproduce the exact
    percentile-range-frame formulation bit-for-bit on irregular data with
    NaNs and gaps (2*window halo exactness argument)."""
    df = _irregular_series(spark)
    base = R.rule_hampel(df, "value", "r", window="1D", k=2.0, min_obs=3)
    fast = R.rule_hampel(df, "value", "r", window="1D", k=2.0, min_obs=3,
                         chunk="2D")
    assert _corr_rows(base) == _corr_rows(fast)
    assert base.columns == fast.columns


def test_flat_signal_chunked_equals_window(spark):
    df = _irregular_series(spark, seed=11)
    kw = dict(window=1, min_obs=5, std_threshold=8.0, qbelow=0.9,
              hbelow=-1e9)
    base = R.rule_flat_signal(df, "value", "r", **kw)
    fast = R.rule_flat_signal(df, "value", "r", chunk="3D", **kw)
    assert _corr_rows(base) == _corr_rows(fast)
    assert base.columns == fast.columns


def test_flat_signal_via_join_equal(spark):
    """via_join (groupBy-agg quantiles + broadcast join) must equal the
    unbounded-window percentile gates bit-for-bit, and the physical plan
    must carry a broadcast join instead of a window percentile."""
    df = _irregular_series(spark, seed=13)
    kw = dict(window=1, min_obs=5, std_threshold=8.0, qbelow=0.8,
              qabove=0.95)
    base = R.rule_flat_signal(df, "value", "r", **kw)
    joined = R.rule_flat_signal(df, "value", "r", via_join=True, **kw)
    assert _corr_rows(base) == _corr_rows(joined)
    assert base.columns == joined.columns

    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    # the quantile gates must be aggregates, not per-row window frames:
    # no physical Window node may evaluate a percentile
    window_lines = [ln for ln in plan.splitlines() if "Window" in ln]
    assert window_lines  # the rolling-std range frame is still a window
    assert not any("percentile" in ln for ln in window_lines)


class _FakeSolver:
    """Duck-typed stand-in for pastas' solver: a fixed-width band around a
    linear trend, honoring alpha/tmin/tmax like prediction_interval."""

    def __init__(self, center=50.0, half=5.0, freq="6h"):
        self.center, self.half, self.freq = center, half, freq

    def prediction_interval(self, alpha, tmin, tmax):
        idx = pd.date_range(tmin, tmax, freq=self.freq)
        lo = pd.Series(self.center - self.half, index=idx)
        hi = pd.Series(self.center + self.half, index=idx)
        return pd.DataFrame({0.025: lo, 0.975: hi})


class _FakeModel:
    def __init__(self, name="m", solver=True, **kw):
        self.name = name
        self.solver = _FakeSolver(**kw) if solver else None


def test_pastas_ml_shim_equals_bounds_path(spark):
    """rule_pastas_outside_pi(ml=...) — the reference's signature
    (rulelib.py:494-601) — must equal passing the same prediction
    interval precomputed as bounds=; dict/callable/single-model forms
    and the no-model/no-solver empty-corrections branches all covered."""
    from traval_spark.operators.rules import (
        pastas_prediction_interval_bounds,
    )

    df = _irregular_series(spark, seed=17)

    models = {"a": _FakeModel("ma", half=4.0), "b": _FakeModel("mb", half=6.0)}
    via_ml = R.rule_pastas_outside_pi(df, "value", "r", ml=models)
    bounds = pastas_prediction_interval_bounds(df, "value", models)
    via_bounds = R.rule_pastas_outside_pi(df, "value", "r", bounds=bounds)
    assert _corr_rows(via_ml) == _corr_rows(via_bounds)
    assert via_ml.filter(F.col("r_code") != 0).count() > 0

    # callable form == dict form
    via_call = R.rule_pastas_outside_pi(df, "value", "r",
                                        ml=lambda sid: models[sid])
    assert _corr_rows(via_call) == _corr_rows(via_ml)

    # single model applied to every series
    one = R.rule_pastas_outside_pi(df, "value", "r", ml=_FakeModel("m1"))
    assert one.filter(F.col("r_code") != 0).count() > 0

    # reference rulelib.py:543-551: no model / no solver -> NO flags
    for ml in (None, _FakeModel("m2", solver=False), {}):
        empty = R.rule_pastas_outside_pi(df, "value", "r", ml=ml)
        assert empty.filter(F.col("r_code") != 0).count() == 0
        assert f"r_code" in empty.columns


def test_pastas_ml_shim_min_ci_smoothfreq_savedir(tmp_path, spark):
    """ml= path composes with min_ci/smoothfreq exactly like bounds=,
    and savedir pickles each per-model interval (rulelib.py:596-598)."""
    from traval_spark.operators.rules import (
        pastas_prediction_interval_bounds,
    )

    df = _irregular_series(spark, seed=19)
    models = {"a": _FakeModel("ma", half=0.5), "b": _FakeModel("mb", half=0.5)}
    kw = dict(min_ci=30.0, smoothfreq="12h")
    via_ml = R.rule_pastas_outside_pi(
        df, "value", "r", ml=models, savedir=str(tmp_path / "pi"), **kw)
    bounds = pastas_prediction_interval_bounds(df, "value", models)
    via_bounds = R.rule_pastas_outside_pi(df, "value", "r", bounds=bounds,
                                          **kw)
    assert _corr_rows(via_ml) == _corr_rows(via_bounds)
    saved = sorted(p.name for p in (tmp_path / "pi").glob("*.pkl"))
    assert saved == ["pi_ma.pkl", "pi_mb.pkl"]
    pi = pd.read_pickle(tmp_path / "pi" / "pi_ma.pkl")
    assert list(pi.columns) == [0.025, 0.975]

    # a SHARED model serving several series must not collide on one
    # pickle name: per-series intervals get the series-id suffix
    R.rule_pastas_outside_pi(df, "value", "r", ml=_FakeModel("shared"),
                             savedir=str(tmp_path / "pi2"))
    saved2 = sorted(p.name for p in (tmp_path / "pi2").glob("*.pkl"))
    assert saved2 == ["pi_shared_a.pkl", "pi_shared_b.pkl"]
