"""TravalParameters round-trips (test_008 analog), ruleset pickle,
bandwidth/synthetic-raw utilities, Detector audit methods, comment pivots."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from tests.conftest import make_series_df
from traval_spark.comparison import (
    compare_by_comment,
    compare_series,
    compare_series_relative,
    compare_to_base_by_comment,
)
from traval_spark.functions.ts import (
    bandwidth_moving_avg_n_sigma,
    create_synthetic_raw_time_series,
)
from traval_spark.plans.detector import Detector
from traval_spark.plans.params import TravalParameters
from traval_spark.plans.ruleset import SparkRuleSet


def _params():
    return TravalParameters(
        pd.DataFrame(
            [
                ("default", "gt", "threshold", 5.0),
                ("loc1", "gt", "threshold", 8.0),
            ],
            columns=["location", "rulename", "parameter", "value"],
        )
    )


def test_params_get_set_delete():
    tp = _params()
    assert tp.get("gt", "threshold") == 5.0
    assert tp.get("gt", "threshold", location="loc1") == 8.0
    assert tp.get("gt", "threshold", location="unknown") == 5.0  # fallback
    tp.set("gt", "threshold", 9.0, location="loc1")
    assert tp.get("gt", "threshold", location="loc1") == 9.0
    tp.delete("gt", "threshold", location="loc1")
    assert tp.get("gt", "threshold", location="loc1") == 5.0
    with pytest.raises(KeyError):
        tp.delete("gt", "threshold", location="loc1")
    with pytest.raises(KeyError):
        tp.get("nope", "threshold")


def test_params_reference_named_api():
    """test_008_travalparameters analog on the reference method NAMES:
    get_parameters / get_parameters_as_dict / update_* / delete_* with the
    reference's two distinct failure modes (params.py:262-393)."""
    tp = _params()
    # defaults query, narrowing, squeeze-to-scalar
    all_defaults = tp.get_parameters(squeeze=False)
    assert list(all_defaults.index.get_level_values(0)) == ["default"]
    assert tp.get_parameters(rulename="gt", parameter="threshold") == 5.0
    assert tp.get_parameters(location="loc1", rulename="gt",
                             parameter="threshold") == 8.0
    with pytest.raises(KeyError, match="non-existent-loc"):
        tp.get_parameters(location="non-existent-loc")
    with pytest.raises(KeyError):
        tp.get_parameters(rulename="gt", parameter="nope")
    assert tp.get_parameters_as_dict("gt") == {"threshold": 5.0}
    assert tp.get_parameters_as_dict("gt", location="loc1") == \
        {"threshold": 8.0}

    assert tp.n_locations == 1 and tp.locations == ["loc1"]
    assert tp.rulenames == ["gt"]

    tp.update_parameter_value("loc1", "gt", "threshold", 9.0)
    assert tp.get("gt", "threshold", location="loc1") == 9.0
    tp.update_default_value("gt", "threshold", 4.0)
    assert tp.get("gt", "threshold") == 4.0
    tp.delete_parameter_value("loc1", "gt", "threshold")
    assert tp.get("gt", "threshold", location="loc1") == 4.0  # fallback

    # defaults-only table: location queries raise ValueError, not KeyError
    only_default = TravalParameters(
        pd.DataFrame([("default", "gt", "threshold", 5.0)],
                     columns=["location", "rulename", "parameter", "value"])
    )
    with pytest.raises(ValueError, match="No location specific"):
        only_default.get_parameters(location="anywhere")
    with pytest.raises(ValueError, match="No location specific"):
        only_default.update_parameter_value("loc", "gt", "threshold", 1.0)
    with pytest.raises(ValueError, match="No location specific"):
        only_default.delete_parameter_value("loc", "gt", "threshold")
    only_default.delete_default_value("gt", "threshold")
    with pytest.raises(KeyError):
        only_default.get("gt", "threshold")


def test_ruleset_introspection_reference_names():
    """SparkRuleSet.get_func/get_applyto/get_kwargs/get_parameters with
    reference semantics (ruleset.py:256-303, 369-390), including callable
    kwargs resolved by name and ParamRef resolved through a params table."""
    from traval_spark.operators.rules import RULES
    from traval_spark.plans.ruleset import ParamRef

    rset = SparkRuleSet("tester1")
    rset.add_rule("gt10", "rule_ufunc_threshold", apply_to=0,
                  kwargs={"ufunc": ("greater",), "threshold": 10.0})
    rset.add_rule("lt0", "rule_ufunc_threshold", apply_to=0,
                  kwargs={"ufunc": ("less",),
                          "threshold": lambda name: 0.0 if name else -1.0})
    rset.add_rule("spike", "rule_spike_detection", apply_to=2,
                  kwargs={"threshold": ParamRef("spike", "threshold"),
                          "spike_tol": 1.0})

    assert rset.get_func(istep=1) is RULES["rule_ufunc_threshold"][0]
    assert rset.get_func(stepname="spike") is RULES["rule_spike_detection"][0]
    assert rset.get_applyto(istep=1) == 0 and rset.get_applyto(istep=3) == 2
    with pytest.raises(ValueError, match="istep.*stepname|Provide"):
        rset.get_applyto()

    # callable kwargs resolve with the name argument (ruleset.py:277-303)
    kw = rset.get_kwargs(stepname="lt0", kwarg_name="series_a")
    assert kw["threshold"] == 0.0
    assert rset.get_kwargs(stepname="lt0", kwarg_name=None)["threshold"] \
        == -1.0

    # ParamRef: passes through without a table, resolves with one
    assert isinstance(rset.get_kwargs(stepname="spike")["threshold"],
                      ParamRef)
    tp = TravalParameters(
        pd.DataFrame(
            [("default", "spike", "threshold", 0.15),
             ("loc1", "spike", "threshold", 0.30)],
            columns=["location", "rulename", "parameter", "value"],
        )
    )
    assert rset.get_kwargs(stepname="spike", params=tp)["threshold"] == 0.15
    assert rset.get_kwargs(stepname="spike", kwarg_name="loc1",
                           params=tp)["threshold"] == 0.30

    # reference ruleset.py:264 guard: with name=None, callable kwargs
    # appear VERBATIM in get_parameters (only get_kwargs/_parse_kwargs
    # always call — ruleset.py:277-303)
    noname = rset.get_parameters()
    lt0_thr = noname[(noname.rulename == "lt0")
                     & (noname.parameter == "threshold")]["value"].iloc[0]
    assert callable(lt0_thr)

    # get_parameters frame: reference columns, one row per kwarg
    pdf = rset.get_parameters(name="loc1", params=tp)
    assert list(pdf.columns) == ["rulename", "step", "func", "parameter",
                                 "value"]
    byrule = pdf.set_index(["rulename", "parameter"])["value"]
    assert byrule[("gt10", "threshold")] == 10.0
    assert byrule[("lt0", "threshold")] == 0.0
    assert byrule[("spike", "threshold")] == 0.30
    assert byrule[("spike", "spike_tol")] == 1.0
    assert set(pdf.step) == {0, 2}

    # round-trip: harvested params feed back into a TravalParameters
    harvested = TravalParameters.from_ruleset(rset, locations=["loc1"])
    assert harvested.get("gt10", "threshold", location="loc1") == 10.0


def test_params_serde_roundtrips(tmp_path):
    tp = _params()
    tp.to_csv(str(tmp_path / "p.csv"))
    assert TravalParameters.from_csv(str(tmp_path / "p.csv")) == tp
    tp.to_json(str(tmp_path / "p.json"))
    assert TravalParameters.from_json(str(tmp_path / "p.json")) == tp
    tp.to_pickle(str(tmp_path / "p.pkl"))
    assert TravalParameters.from_pickle(str(tmp_path / "p.pkl")) == tp


def test_params_from_ruleset():
    rs = SparkRuleSet("r")
    rs.add_rule("gt", "rule_ufunc_threshold", apply_to=0,
                kwargs={"ufunc": ("greater",), "threshold": 7.0})
    tp = TravalParameters.from_ruleset(rs, locations=["a"])
    assert tp.get("gt", "threshold") == 7.0
    assert tp.get("gt", "threshold", location="a") == 7.0


def test_ruleset_pickle_roundtrip(tmp_path, spark):
    rs = SparkRuleSet("p")
    rs.add_rule("gt10", "rule_ufunc_threshold", apply_to=0,
                kwargs={"ufunc": ("greater_equal",), "threshold": 10.0})
    p = str(tmp_path / "rs.pkl")
    rs.to_pickle(p)
    rs2 = SparkRuleSet.from_pickle(p)
    assert list(rs2.rules) == ["gt10"]
    assert rs2.rules["gt10"]["kwargs"]["threshold"] == 10.0


def test_bandwidth_moving_avg_n_sigma(spark):
    df = make_series_df(spark, np.arange(10, dtype=float))
    out = bandwidth_moving_avg_n_sigma(df, "value", window=3, n=1.0)
    rows = out.orderBy("ts").collect()
    # pandas oracle (ts_utils.py:343-365)
    s = pd.Series(np.arange(10, dtype=float))
    expected_avg = s.rolling(3).mean()
    nstd = s.std()
    for i, r in enumerate(rows):
        if np.isnan(expected_avg[i]):
            assert r["lower_1.0_sigma"] is None
        else:
            assert r["lower_1.0_sigma"] == pytest.approx(expected_avg[i] - nstd)
            assert r["upper_1.0_sigma"] == pytest.approx(expected_avg[i] + nstd)


def test_create_synthetic_raw(spark):
    raw = make_series_df(spark, [10.0, 11.0, 12.0, 13.0])
    truth_vals = [0.0, 1.0, 2.0, 3.0]
    comments = ["", "bad", "", "bad"]
    truth = make_series_df(spark, truth_vals, comments=comments)
    out = create_synthetic_raw_time_series(
        raw, truth.select("series_id", "ts", "value"),
        comments=truth.select("series_id", "ts", "comment"),
    )
    vals = [r["value"] for r in out.orderBy("ts").collect()]
    # commented rows take raw, uncommented keep truth (ts_utils.py:444-451)
    assert vals == [0.0, 11.0, 2.0, 13.0]


def test_comment_pivots(spark):
    s1 = make_series_df(spark, [1.0, np.nan, 3.0, np.nan])
    truth = make_series_df(spark, [1.0, np.nan, np.nan, 4.0],
                           comments=["", "drop", "drop", "keep"])
    cmp = compare_series(s1, truth)
    piv = compare_by_comment(cmp).collect()
    assert len(piv) > 0
    base = make_series_df(spark, [1.0, 2.0, 3.0, 4.0])  # all present
    rel = compare_series_relative(s1, truth, base)
    piv2 = {r["rel_category"]: r for r in compare_to_base_by_comment(rel).collect()}
    assert piv2["flagged_in_both"]["drop"] == 1  # ts2: both NaN, base ok


def test_detector_get_series_and_audit(spark):
    vals = np.arange(-5, 23, 3, dtype=float)
    series = make_series_df(spark, vals)
    truth_vals = vals.copy()
    truth_vals[vals >= 10] = np.nan
    truth = make_series_df(
        spark, truth_vals,
        comments=["" if v < 10 else "too high" for v in vals],
    )
    rs = SparkRuleSet("t")
    rs.add_rule("gt13", "rule_ufunc_threshold", apply_to=0,
                kwargs={"ufunc": ("greater_equal",), "threshold": 13.0})
    det = Detector(series, truth=truth)
    det.apply_ruleset(rs)

    tp_rows = det.get_series(1, category="tp")
    assert tp_rows.count() == 4  # >=13: 13,16,19,22

    audit = det.get_corrections_comparison()
    rows = {r["ts"]: r for r in audit.collect()}
    # union of flagged-by-rule (>=13) and truth-flagged (>=10): 5 rows
    assert len(rows) == 5
    labels = {r["comparison_label"] for r in rows.values()}
    # rule+truth both flag -> both NULL -> status -9999 -> "NaN in both"
    # (the comparison_series quirk; "Flagged in both" = status 0 means
    # both PRESENT but different — reference label map detector.py:509-515)
    assert "NaN in both" in labels
    # value 10: truth flags it, rule (>=13) keeps it
    assert "Only flagged in 'truth' series" in labels


def _ref_ts_utils():
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "ref_ts_utils", "/root/reference/traval/ts_utils.py"
    )
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    return m


def test_smooth_bounds_match_reference(spark):
    """smooth_upper_bound / smooth_lower_bound vs the reference functions
    (ts_utils.py:456-475) on an irregular hourly-ish series where shifted
    timestamps only partially align (exercises the positional
    interpolation + trailing clamp + leading NaN paths)."""
    import importlib

    ref = _ref_ts_utils()
    rng = np.random.default_rng(3)
    idx = pd.date_range("2021-01-01", periods=120, freq="7h")
    keep = rng.random(120) > 0.15  # missing points -> misaligned shifts
    s = pd.Series(rng.normal(10.0, 4.0, 120), index=idx)[keep]

    from traval_spark.functions.ts import smooth_lower_bound, smooth_upper_bound

    b = spark.createDataFrame(
        pd.DataFrame({"series_id": "s1", "ts": s.index, "value": s.to_numpy()})
    )
    for fn_spark, fn_ref in (
        (smooth_upper_bound, ref.smooth_upper_bound),
        (smooth_lower_bound, ref.smooth_lower_bound),
    ):
        got = (
            fn_spark(b, "value", "1D")
            .toPandas()
            .sort_values("ts")
            .set_index("ts")["value"]
        )
        want = fn_ref(s, smoothfreq="1D")
        assert len(got) == len(want)
        assert np.allclose(got.to_numpy(), want.to_numpy(), atol=1e-12)


def test_rule_pastas_outside_pi(spark):
    """Adapter end-to-end: precomputed bounds + smoothing + min_ci widening
    -> rule_outside_bandwidth delegation."""
    from traval_spark.operators import rules as R

    idx = pd.date_range("2021-01-01", periods=50, freq="D")
    vals = np.zeros(50)
    vals[10] = 5.0   # above upper
    vals[20] = -5.0  # below lower
    series = spark.createDataFrame(
        pd.DataFrame({"series_id": "s1", "ts": idx, "value": vals})
    )
    bounds = spark.createDataFrame(
        pd.DataFrame({"series_id": "s1", "ts": idx,
                      "lower": -1.0, "upper": 1.0})
    )
    c = R.rule_pastas_outside_pi(series, "value", "r", bounds=bounds)
    codes = {r[0]: r[1] for r in c.groupBy("r_code").count().collect()}
    assert codes.get(2, 0) == 1 and codes.get(-2, 0) == 1

    # min_ci wider than the spikes swallows them
    c2 = R.rule_pastas_outside_pi(series, "value", "r", bounds=bounds,
                                  min_ci=20.0, smoothfreq="1D")
    assert c2.filter(F.col("r_code") != 0).count() == 0

    # tmin/tmax clip the PI before delegation (rulelib.py:556-561): with
    # the interval restricted to days 15..25 only the t=20 dip lies inside
    # the bounds hull; the t=10 spike is outside the clipped PI -> unflagged
    c3 = R.rule_pastas_outside_pi(series, "value", "r", bounds=bounds,
                                  tmin=idx[15], tmax=idx[25])
    codes3 = {r[0]: r[1] for r in c3.groupBy("r_code").count().collect()}
    assert codes3.get(-2, 0) == 1 and codes3.get(2, 0) == 0


def test_pastas_smoothing_asymmetric_nulls_match_separate_path(spark):
    """The joint smoothing pass must reproduce the reference's SEPARATE
    smooth_lower_bound/smooth_upper_bound calls when the two bounds live on
    different time grids: each smoothed bound keeps exactly its own orig
    index (ts_utils.py:464-475 `.loc[orig.dropna().index]`). The separate
    path below is itself pinned to the reference by
    test_smooth_bounds_match_reference."""
    from traval_spark.functions.ts import (
        smooth_lower_bound,
        smooth_upper_bound,
    )
    from traval_spark.operators import rules as R

    rng = np.random.default_rng(11)
    idx = pd.date_range("2021-01-01", periods=80, freq="D")
    keep_lo = rng.random(80) > 0.3
    keep_up = rng.random(80) > 0.3
    lower = pd.Series(rng.normal(-2.0, 0.5, 80), index=idx)[keep_lo]
    upper = pd.Series(rng.normal(2.0, 0.5, 80), index=idx)[keep_up]
    series = spark.createDataFrame(
        pd.DataFrame({"series_id": "s1", "ts": idx,
                      "value": rng.normal(0.0, 3.0, 80)})
    )
    # joint frame with asymmetric NULLs (outer-join of the two grids)
    joint_pdf = pd.DataFrame({"lower": lower, "upper": upper})
    joint_pdf.index.name = "ts"
    joint = spark.createDataFrame(
        joint_pdf.reset_index().assign(series_id="s1")
    )
    got = R.rule_pastas_outside_pi(
        series, "value", "r", bounds=joint, smoothfreq="1D"
    ).toPandas().sort_values("ts").reset_index(drop=True)

    lo_f = spark.createDataFrame(pd.DataFrame(
        {"series_id": "s1", "ts": lower.index, "value": lower.to_numpy()}))
    up_f = spark.createDataFrame(pd.DataFrame(
        {"series_id": "s1", "ts": upper.index, "value": upper.to_numpy()}))
    want = R.rule_outside_bandwidth(
        series, "value", "r",
        lowerbound=smooth_lower_bound(lo_f, "value", "1D"),
        upperbound=smooth_upper_bound(up_f, "value", "1D"),
    ).toPandas().sort_values("ts").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want)


def test_outside_bandwidth_joint_equals_separate(spark):
    """bounds= (joint frame) and lowerbound=/upperbound= (reference
    signature) are the same operator."""
    from tests.conftest import make_series_df
    from traval_spark.operators import rules as R

    series = make_series_df(spark, np.arange(10.0))
    idx = pd.date_range("2020-01-01", freq="D", periods=10)
    lb = spark.createDataFrame(pd.DataFrame(
        {"series_id": "s1", "ts": idx[[0, -1]], "value": [1.0, 2.0]}))
    ub = spark.createDataFrame(pd.DataFrame(
        {"series_id": "s1", "ts": idx[[0, -1]], "value": [7.0, 8.0]}))
    joint = spark.createDataFrame(pd.DataFrame(
        {"series_id": "s1", "ts": idx[[0, -1]],
         "lower": [1.0, 2.0], "upper": [7.0, 8.0]}))
    a = R.rule_outside_bandwidth(
        series, "value", "r", lowerbound=lb, upperbound=ub
    ).toPandas().sort_values("ts").reset_index(drop=True)
    b = R.rule_outside_bandwidth(
        series, "value", "r", bounds=joint
    ).toPandas().sort_values("ts").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_align_interpolate_specs_matches_np_interp_randomized(spark):
    """30 random irregular (main, aux) series pairs in ONE frame: the
    joint multi-column alignment must equal np.interp with
    left=right=NaN per column (exact hits, interior linear, outside-hull
    NULL), including asymmetric grids between the two aux columns."""
    from traval_spark.functions.ts import align_interpolate_specs

    rng = np.random.default_rng(99)
    mains, auxes, expect = [], [], {}
    for k in range(30):
        sid = f"c{k:02d}"
        m_ts = np.sort(rng.choice(np.arange(0, 500), size=40, replace=False))
        lo_ts = np.sort(rng.choice(np.arange(-20, 520), size=rng.integers(2, 12), replace=False))
        up_ts = np.sort(rng.choice(np.arange(-20, 520), size=rng.integers(2, 12), replace=False))
        lo_v = rng.normal(size=len(lo_ts))
        up_v = rng.normal(size=len(up_ts))
        base = pd.Timestamp("2021-01-01")
        mk = lambda t: base + pd.to_timedelta(t, unit="h")
        mains.append(pd.DataFrame(
            {"series_id": sid, "ts": mk(m_ts), "value": 0.0}))
        auxes.append(pd.DataFrame(
            {"series_id": sid, "ts": mk(np.union1d(lo_ts, up_ts))}
        ).merge(pd.DataFrame({"ts": mk(lo_ts), "lower": lo_v}), on="ts",
                how="left")
         .merge(pd.DataFrame({"ts": mk(up_ts), "upper": up_v}), on="ts",
                how="left"))
        expect[sid] = (
            np.interp(m_ts.astype(float), lo_ts.astype(float), lo_v,
                      left=np.nan, right=np.nan),
            np.interp(m_ts.astype(float), up_ts.astype(float), up_v,
                      left=np.nan, right=np.nan),
        )
        # np.interp clamps outside the hull; NaN-out strictly-outside rows
        for arr, ats in (
            (expect[sid][0], lo_ts), (expect[sid][1], up_ts),
        ):
            arr[(m_ts < ats.min()) | (m_ts > ats.max())] = np.nan

    main = spark.createDataFrame(pd.concat(mains))
    aux = spark.createDataFrame(pd.concat(auxes))
    out = align_interpolate_specs(
        main, [(aux, [("lower", "lo_i"), ("upper", "up_i")])]
    ).toPandas().sort_values(["series_id", "ts"])
    for sid, (want_lo, want_up) in expect.items():
        got = out[out.series_id == sid]
        np.testing.assert_allclose(got["lo_i"].to_numpy(), want_lo,
                                   atol=1e-12, equal_nan=True)
        np.testing.assert_allclose(got["up_i"].to_numpy(), want_up,
                                   atol=1e-12, equal_nan=True)


def test_pastas_joint_smoothing_gap_with_interior_other_bound(spark):
    """Adversarial asymmetric-grid case (r3 review repro): lower has a
    3-day gap and upper has an observation INSIDE that gap. Rank-based
    interpolation over the joint grid without per-bound member masks
    treats upper's row as an extra anchor inside lower's gap and shifts
    every interpolated lower value there (flagging 4 points the reference
    leaves unflagged)."""
    from traval_spark.functions.ts import (
        smooth_lower_bound,
        smooth_upper_bound,
    )
    from traval_spark.operators import rules as R

    idx = pd.date_range("2021-01-01", periods=10, freq="D")
    lo_days = [0, 4, 5, 6, 7, 8, 9]
    lo_vals = [0.0, -10.0, -10.0, -10.0, -10.0, -10.0, -10.0]
    up_days = [2]
    up_vals = [50.0]
    series = spark.createDataFrame(pd.DataFrame(
        {"series_id": "s1", "ts": idx, "value": -3.0}))
    joint_pdf = pd.DataFrame(
        {"lower": pd.Series(lo_vals, index=idx[lo_days]),
         "upper": pd.Series(up_vals, index=idx[up_days])})
    joint_pdf.index.name = "ts"
    joint = spark.createDataFrame(
        joint_pdf.reset_index().assign(series_id="s1"))

    got = R.rule_pastas_outside_pi(
        series, "value", "r", bounds=joint, smoothfreq="1D"
    ).toPandas().sort_values("ts").reset_index(drop=True)

    lo_f = spark.createDataFrame(pd.DataFrame(
        {"series_id": "s1", "ts": idx[lo_days], "value": lo_vals}))
    up_f = spark.createDataFrame(pd.DataFrame(
        {"series_id": "s1", "ts": idx[up_days], "value": up_vals}))
    want = R.rule_outside_bandwidth(
        series, "value", "r",
        lowerbound=smooth_lower_bound(lo_f, "value", "1D"),
        upperbound=smooth_upper_bound(up_f, "value", "1D"),
    ).toPandas().sort_values("ts").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want)
    # and the reference outcome on this construction: nothing flagged
    assert (got["r_code"] == 0).all()


def test_ivfpq_full_probe_equals_plain_adc(spark):
    """nprobe = n_list degrades IVF-PQ to plain ADC over the whole
    table (routing prunes nothing), and a restrictive nprobe returns
    ids drawn only from the probed lists."""
    import numpy as np
    import pandas as pd

    from traval_spark.operators.similarity import (
        ivf_assign_col,
        ivf_seed_centroids,
        ivfpq_topk,
        pq_adc_topk,
        pq_seed_codebooks,
        with_pq_codes,
    )

    rng = np.random.RandomState(2)
    pdf = pd.DataFrame({
        "vec_id": range(120),
        "embedding": [rng.randn(16).astype("float32").tolist()
                      for _ in range(120)],
    })
    emb = spark.createDataFrame(pdf)
    books = pq_seed_codebooks(emb, m=4, ksub=8)
    q = pdf["embedding"][0]

    full = ivfpq_topk(emb, q, books, k=5, n_list=4, nprobe=4)
    plain = pq_adc_topk(with_pq_codes(emb, books), q, books, k=5)
    assert [r.asDict() for r in full.collect()] == [
        r.asDict() for r in plain.collect()]

    cents = ivf_seed_centroids(emb, 4)
    pruned = ivfpq_topk(emb, q, books, k=5, n_list=4, nprobe=1,
                        centroids=cents)
    got_ids = {r["vec_id"] for r in pruned.collect()}
    cid_of = {
        r["vec_id"]: r["cid"]
        for r in emb.withColumn("cid", ivf_assign_col("embedding", cents))
        .collect()
    }
    probed = {cid_of[i] for i in got_ids}
    assert len(probed) == 1                       # one probed list only
    in_list = {i for i, c in cid_of.items() if c in probed}
    assert got_ids <= in_list and len(in_list) < 120   # real pruning
