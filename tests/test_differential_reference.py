"""Randomized differential tests: run the REFERENCE rulelib live as the
oracle on adversarial random series and demand code/sval/cval equality
from every Spark rule.

The per-rule exact-count tests (test_rules.py) pin the reference's own
micro-fixtures; the DuckDB oracles (tools/check_entry.py) pin hand-written
SQL twins. This module closes the remaining gap: the reference
IMPLEMENTATION itself, executed on series with irregular cadence, NaN
holes, spikes, jumps, and flat runs that no curated fixture covers.

The reference package root imports matplotlib (absent here), so rulelib +
ts_utils are loaded as a synthetic package — numpy/pandas only.
"""

from __future__ import annotations

import importlib.util
import sys
import types

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from traval_spark.operators import rules as R

REF = "/root/reference/traval"


@pytest.fixture(scope="module")
def ref_rulelib():
    pkg = types.ModuleType("_refpkg")
    pkg.__path__ = [REF]
    sys.modules["_refpkg"] = pkg
    for name in ("ts_utils", "rulelib"):
        spec = importlib.util.spec_from_file_location(
            f"_refpkg.{name}", f"{REF}/{name}.py"
        )
        mod = importlib.util.module_from_spec(spec)
        sys.modules[f"_refpkg.{name}"] = mod
        spec.loader.exec_module(mod)
    return sys.modules["_refpkg.rulelib"]


def gen_series(rng: np.random.Generator, n: int = 300) -> pd.Series:
    """Adversarial series: irregular 1min-3h cadence, random-walk values,
    planted spikes, level jumps, flat runs, and NaN holes."""
    steps = rng.integers(1, 180, size=n)
    idx = pd.Timestamp("2022-01-01") + pd.to_timedelta(
        np.cumsum(steps), unit="min"
    )
    v = np.cumsum(rng.normal(0, 0.2, n))
    for _ in range(3):  # spikes: one point out and back
        i = int(rng.integers(5, n - 5))
        v[i] += float(rng.normal(0, 5))
    j = int(rng.integers(5, n - 20))
    v[j:] += float(rng.choice([-4.0, 4.0]))  # level jump
    k = int(rng.integers(5, n - 30))
    v[k:k + 12] = v[k]  # flat run
    holes = rng.random(n) < 0.06
    v[holes] = np.nan
    return pd.Series(v, index=idx)


def to_spark(spark, s: pd.Series, sid: str = "d1"):
    return spark.createDataFrame(
        pd.DataFrame({"series_id": sid, "ts": s.index, "value": s.to_numpy()})
    )


def assert_matches_reference(spark_out, ref_corr: pd.DataFrame, out="r"):
    got = (
        spark_out.select("ts", f"{out}_code", f"{out}_sval", f"{out}_cval")
        .toPandas()
        .sort_values("ts")
        .set_index("ts")
    )
    want = ref_corr.sort_index()
    assert len(got) == len(want)
    assert got[f"{out}_code"].to_numpy().tolist() == [
        int(c) for c in want["correction_code"].to_numpy()
    ]
    np.testing.assert_allclose(
        got[f"{out}_sval"].to_numpy(),
        want["series_values"].to_numpy(dtype=float),
        atol=1e-9, equal_nan=True,
    )
    np.testing.assert_allclose(
        got[f"{out}_cval"].to_numpy(),
        want["comparison_values"].to_numpy(dtype=float),
        atol=1e-9, equal_nan=True,
    )


# default 3 seeds in CI; crank via TRAVAL_DIFF_SEEDS for one-off deep fuzz
import os

SEEDS = list(range(int(os.environ.get("TRAVAL_DIFF_SEEDS", "3"))))


@pytest.mark.parametrize("seed", SEEDS)
def test_differential_simple_rules(spark, ref_rulelib, seed):
    """Threshold / gradient / n-sigma / diff rules vs live reference."""
    rng = np.random.default_rng(seed)
    s = gen_series(rng)
    df = to_spark(spark, s)
    thr = float(np.nanquantile(s.to_numpy(), 0.8))

    cases = [
        (
            R.rule_ufunc_threshold(df, "value", "r", ufunc="greater",
                                   threshold=thr, offset=0.1),
            ref_rulelib.rule_ufunc_threshold(s, (np.greater,), thr, 0.1),
        ),
        (
            R.rule_max_gradient(df, "value", "r", max_step=0.3,
                                max_timestep="2h"),
            ref_rulelib.rule_max_gradient(s, max_step=0.3, max_timestep="2h"),
        ),
        (
            R.rule_outside_n_sigma(df, "value", "r", n=1.5),
            ref_rulelib.rule_outside_n_sigma(s, n=1.5),
        ),
        (
            R.rule_diff_ufunc_threshold(df, "value", "r", ufunc="greater",
                                        threshold=0.5, max_gap="2h"),
            ref_rulelib.rule_diff_ufunc_threshold(s, (np.greater,), 0.5,
                                                  max_gap="2h"),
        ),
        (
            R.rule_diff_outside_of_n_sigma(df, "value", "r", n=2.0,
                                           max_gap="3h"),
            ref_rulelib.rule_diff_outside_of_n_sigma(s, n=2.0, max_gap="3h"),
        ),
        (
            R.rule_spike_detection(df, "value", "r", threshold=1.0,
                                   spike_tol=0.5, max_gap="3h"),
            ref_rulelib.rule_spike_detection(s, threshold=1.0, spike_tol=0.5,
                                             max_gap="3h"),
        ),
    ]
    for spark_out, ref_corr in cases:
        assert_matches_reference(spark_out, ref_corr)


@pytest.mark.parametrize("seed", SEEDS)
def test_differential_aux_series_rules(spark, ref_rulelib, seed):
    """Rules taking a second series (bounds, manual obs, series threshold,
    other-series) vs live reference."""
    rng = np.random.default_rng(100 + seed)
    s = gen_series(rng)
    df = to_spark(spark, s)

    # sparse aux series on their own irregular grid
    aux_idx = s.index[rng.random(len(s)) < 0.15]
    lo = pd.Series(
        np.nanmean(s.to_numpy()) - 1.0 + rng.normal(0, 0.3, len(aux_idx)),
        index=aux_idx,
    )
    hi = lo + 2.0
    lo_f = to_spark(spark, lo)
    hi_f = to_spark(spark, hi)

    out = R.rule_outside_bandwidth(df, "value", "r",
                                   lowerbound=lo_f, upperbound=hi_f)
    ref = ref_rulelib.rule_outside_bandwidth(s, lo, hi)
    assert_matches_reference(out, ref)

    man_idx = s.index[rng.random(len(s)) < 0.08]
    man = pd.Series(
        s.reindex(man_idx).to_numpy() + rng.normal(0, 0.2, len(man_idx)),
        index=man_idx,
    ).dropna()
    man_f = to_spark(spark, man)
    out = R.rule_compare_to_manual_obs(
        df, "value", "r", manual_obs=man_f, threshold=0.15, max_dt="4h",
        method="linear",
    )
    ref = ref_rulelib.rule_compare_to_manual_obs(
        s, man, threshold=0.15, max_dt="4h", method="linear"
    )
    assert_matches_reference(out, ref)

    thr_idx = s.index[rng.random(len(s)) < 0.1]
    thr_s = pd.Series(
        float(np.nanquantile(s.to_numpy(), 0.7))
        + rng.normal(0, 0.2, len(thr_idx)),
        index=thr_idx,
    )
    out = R.rule_ufunc_threshold(df, "value", "r", ufunc="greater",
                                 threshold=to_spark(spark, thr_s))
    ref = ref_rulelib.rule_ufunc_threshold(s, (np.greater,), thr_s)
    assert_matches_reference(out, ref)

    other = s + rng.normal(0, 0.5, len(s))
    out = R.rule_other_ufunc_threshold(
        df, "value", "r", other=to_spark(spark, other), ufunc="greater",
        threshold=float(np.nanquantile(other.to_numpy(), 0.85)),
    )
    ref = ref_rulelib.rule_other_ufunc_threshold(
        s, other, (np.greater,),
        float(np.nanquantile(other.to_numpy(), 0.85)),
    )
    assert_matches_reference(out, ref)


@pytest.mark.parametrize("seed", SEEDS)
def test_differential_windowed_rules(spark, ref_rulelib, seed):
    """flat_signal (rolling std + quantile/hard gates) and
    offset_detection (greedy pairing kernel) vs live reference."""
    rng = np.random.default_rng(200 + seed)
    s = gen_series(rng)
    df = to_spark(spark, s)

    out = R.rule_flat_signal(df, "value", "r", window=2, min_obs=4,
                             std_threshold=0.05,
                             qbelow=0.3, qabove=0.8)
    ref = ref_rulelib.rule_flat_signal(s, 2, 4, std_threshold=0.05,
                                       qbelow=0.3, qabove=0.8)
    assert_matches_reference(out, ref)

    out = R.rule_offset_detection(df, "value", "r", threshold=2.0,
                                  updown_diff=1.0, max_gap="7D",
                                  search_method="time")
    ref = ref_rulelib.rule_offset_detection(s, threshold=2.0,
                                            updown_diff=1.0, max_gap="7D",
                                            search_method="time")
    assert_matches_reference(out, ref)


@pytest.fixture(scope="module")
def ref_ruleset_mod(ref_rulelib):
    """Reference ruleset.py under the synthetic package, with a stub
    pastas module (only PastasEncoder/pastas_hook are referenced, and
    only for serde we don't exercise here)."""
    if "pastas" not in sys.modules:
        pas = types.ModuleType("pastas")
        io_m = types.ModuleType("pastas.io")
        paspas = types.ModuleType("pastas.io.pas")

        class PastasEncoder:  # serde-only reference
            pass

        paspas.PastasEncoder = PastasEncoder
        paspas.pastas_hook = lambda *a, **k: None
        pas.io = io_m
        io_m.pas = paspas
        sys.modules.update(
            {"pastas": pas, "pastas.io": io_m, "pastas.io.pas": paspas}
        )
    spec = importlib.util.spec_from_file_location(
        "_refpkg.ruleset", f"{REF}/ruleset.py"
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules["_refpkg.ruleset"] = mod
    spec.loader.exec_module(mod)
    return mod


@pytest.mark.parametrize("seed", [0, 1])
def test_differential_full_ruleset(spark, ref_rulelib, ref_ruleset_mod, seed):
    """End-to-end RuleSet differential: the same 5-step DAG (threshold ->
    spike + n-sigma in parallel -> NaN-OR combine -> shift-to-manual-obs
    adjustment) executed by the REFERENCE RuleSet and by apply_ruleset;
    every intermediate step series must match exactly."""
    from traval_spark.plans.ruleset import SparkRuleSet, apply_ruleset

    rng = np.random.default_rng(300 + seed)
    s = gen_series(rng)
    s.name = "d1"
    thr = float(np.nanquantile(s.to_numpy(), 0.85))
    man_idx = s.index[rng.random(len(s)) < 0.05]
    man = pd.Series(
        s.reindex(man_idx).to_numpy() + rng.normal(0, 0.3, len(man_idx)),
        index=man_idx,
    ).dropna()

    ref_rs = ref_ruleset_mod.RuleSet("diff")
    ref_rs.add_rule("hm", ref_rulelib.rule_ufunc_threshold, apply_to=0,
                    kwargs={"ufunc": (np.greater,), "threshold": thr})
    ref_rs.add_rule("spk", ref_rulelib.rule_spike_detection, apply_to=1,
                    kwargs={"threshold": 1.0, "spike_tol": 0.5,
                            "max_gap": "3h"})
    ref_rs.add_rule("sig", ref_rulelib.rule_outside_n_sigma, apply_to=1,
                    kwargs={"n": 1.5})
    ref_rs.add_rule("or", ref_rulelib.rule_combine_nan_or, apply_to=(2, 3))
    ref_rs.add_rule("shift", ref_rulelib.rule_shift_to_manual_obs,
                    apply_to=4, kwargs={"hseries": man, "max_dt": "2D"})
    d, _c = ref_rs(s)

    rs = SparkRuleSet("diff")
    rs.add_rule("hm", "rule_ufunc_threshold", apply_to=0,
                kwargs={"ufunc": ("greater",), "threshold": thr})
    rs.add_rule("spk", "rule_spike_detection", apply_to=1,
                kwargs={"threshold": 1.0, "spike_tol": 0.5,
                        "max_gap": "3h"})
    rs.add_rule("sig", "rule_outside_n_sigma", apply_to=1,
                kwargs={"n": 1.5})
    rs.add_rule("or", "rule_combine_nan_or", apply_to=(2, 3))
    rs.add_rule("shift", "rule_shift_to_manual_obs", apply_to=4,
                kwargs={"hseries": to_spark(spark, man), "max_dt": "2D"})
    wide = apply_ruleset(to_spark(spark, s), rs)
    got = wide.toPandas().sort_values("ts").set_index("ts")

    for k in range(6):
        np.testing.assert_allclose(
            got[f"step_{k}"].to_numpy(),
            d[k].to_numpy(dtype=float),
            atol=1e-9, equal_nan=True,
            err_msg=f"step_{k} (seed {seed})",
        )


@pytest.fixture(scope="module")
def ref_comparison_mod(ref_rulelib):
    """Reference ts_comparison.py under the synthetic package; its .plots
    import (matplotlib/scipy, absent here) is satisfied with a stub —
    only the ComparisonPlots NAME is imported at module load."""
    plots_stub = types.ModuleType("_refpkg.plots")
    plots_stub.ComparisonPlots = type(
        "ComparisonPlots", (),
        {"__init__": lambda self, *a, **k: None},
    )
    sys.modules["_refpkg.plots"] = plots_stub
    for name in ("binary_classifier", "ts_comparison"):
        spec = importlib.util.spec_from_file_location(
            f"_refpkg.{name}", f"{REF}/{name}.py"
        )
        mod = importlib.util.module_from_spec(spec)
        sys.modules[f"_refpkg.{name}"] = mod
        spec.loader.exec_module(mod)
    return sys.modules["_refpkg.ts_comparison"]


@pytest.mark.parametrize("seed", SEEDS)
def test_differential_series_comparison(spark, ref_comparison_mod, seed):
    """compare_series / compare_series_relative / binary classifier vs the
    live reference SeriesComparison(Relative) on random series with
    missing rows, NaN holes, and value perturbations."""
    from traval_spark.comparison import (
        binary_classification,
        compare_series,
        compare_series_relative,
        summarize_comparison,
        summarize_relative,
        with_classifier_stats,
    )

    rng = np.random.default_rng(400 + seed)
    base = gen_series(rng, n=250)
    base.name = "base"
    # s1/s2: random row drops, extra NaN flags, value perturbations
    def derive(b, drop_p, nan_p, pert_p):
        s = b[rng.random(len(b)) >= drop_p].copy()
        flag = rng.random(len(s)) < nan_p
        s[flag] = np.nan
        pert = rng.random(len(s)) < pert_p
        s[pert] = s[pert] + 1.0
        return s

    s1 = derive(base, 0.1, 0.15, 0.1)
    s2 = derive(base, 0.1, 0.15, 0.1)
    s1.name, s2.name = "s1", "s2"

    ref_cmp = ref_comparison_mod.SeriesComparison(s1.copy(), s2.copy())
    got = summarize_comparison(
        compare_series(to_spark(spark, s1), to_spark(spark, s2))
    ).collect()[0]
    for cat, want in ref_cmp.summary.items():
        assert got[cat] == int(want), (cat, seed)

    ref_rel = ref_comparison_mod.SeriesComparisonRelative(
        s1.copy(), s2.copy(), base.copy()
    )
    rel = compare_series_relative(
        to_spark(spark, s1), to_spark(spark, s2), to_spark(spark, base)
    )
    got_rel = summarize_relative(rel).collect()[0]
    for cat, want in ref_rel.summary_base_comparison.items():
        assert got_rel[cat] == int(want), (cat, seed)

    bc = with_classifier_stats(binary_classification(rel)).collect()[0]
    assert (bc["tp"], bc["fp"], bc["tn"], bc["fn"]) == (
        ref_rel.bc.tp, ref_rel.bc.fp, ref_rel.bc.tn, ref_rel.bc.fn
    )
    for ours, theirs in (
        ("sensitivity", "sensitivity"), ("specificity", "specificity"),
        ("mcc", "matthews_correlation_coefficient"),
    ):
        want = getattr(ref_rel.bc, theirs)
        if isinstance(want, property):
            continue
        got_v = bc[ours]
        if got_v is None:
            assert np.isnan(float(want))
        else:
            assert abs(got_v - float(want)) < 1e-12, ours


@pytest.fixture(scope="module")
def ref_detector_mod(ref_comparison_mod, request):
    """Reference detector.py under the synthetic package; matplotlib
    (absent here) is stubbed — the module only touches plt inside plot
    methods we never call. The stub is REMOVED at module teardown so the
    import-gate tests elsewhere still see a matplotlib-less session."""
    stubbed = []
    if "matplotlib" not in sys.modules:
        mpl = types.ModuleType("matplotlib")
        plt = types.ModuleType("matplotlib.pyplot")
        mpl.pyplot = plt
        sys.modules.update({"matplotlib": mpl, "matplotlib.pyplot": plt})
        stubbed = ["matplotlib", "matplotlib.pyplot"]
    request.addfinalizer(
        lambda: [sys.modules.pop(m, None) for m in stubbed]
    )
    spec = importlib.util.spec_from_file_location(
        "_refpkg.detector", f"{REF}/detector.py"
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules["_refpkg.detector"] = mod
    spec.loader.exec_module(mod)
    return mod


@pytest.mark.parametrize("seed", [0, 1])
def test_differential_detector_confusion_and_uniqueness(
    spark, ref_rulelib, ref_ruleset_mod, ref_detector_mod, seed
):
    """Flagship-path differential: the same Detector + 3-rule ruleset on
    both engines; per-step confusion matrices (overlapping counts) and
    uniqueness (unique contribution per rule) must match the live
    reference exactly."""
    from traval_spark.plans.detector import Detector
    from traval_spark.plans.ruleset import SparkRuleSet

    rng = np.random.default_rng(500 + seed)
    s = gen_series(rng, n=250)
    s.name = "d1"
    thr = float(np.nanquantile(s.to_numpy(), 0.85))
    truth = s.copy()
    tmask = rng.random(len(s)) < 0.15
    truth[tmask] = np.nan
    truth.name = "truth"

    ref_rs = ref_ruleset_mod.RuleSet("diff")
    ref_rs.add_rule("hm", ref_rulelib.rule_ufunc_threshold, apply_to=0,
                    kwargs={"ufunc": (np.greater,), "threshold": thr})
    ref_rs.add_rule("sig", ref_rulelib.rule_outside_n_sigma, apply_to=0,
                    kwargs={"n": 1.5})
    ref_rs.add_rule("or", ref_rulelib.rule_combine_nan_or, apply_to=(1, 2))
    ref_det = ref_detector_mod.Detector(s.copy(), truth=truth.copy())
    ref_det.apply_ruleset(ref_rs)
    ref_cm = ref_det.confusion_matrix()
    ref_un = ref_det.uniqueness()

    rs = SparkRuleSet("diff")
    rs.add_rule("hm", "rule_ufunc_threshold", apply_to=0,
                kwargs={"ufunc": ("greater",), "threshold": thr})
    rs.add_rule("sig", "rule_outside_n_sigma", apply_to=0,
                kwargs={"n": 1.5})
    rs.add_rule("or", "rule_combine_nan_or", apply_to=(1, 2))
    det = Detector(to_spark(spark, s), truth=to_spark(spark, truth))
    det.apply_ruleset(rs)

    got_cm = {r["step"]: r for r in det.confusion_matrix().collect()}
    for k in ref_cm.index:
        if k == 0:
            continue
        want = ref_cm.loc[k]
        got = got_cm[k]
        assert (got["tp"], got["fp"], got["fn"], got["tn"]) == (
            want["TP"], want["FP"], want["FN"], want["TN"]
        ), (k, seed)

    got_un = {r["step"]: r for r in det.uniqueness().collect()}
    for k in ref_un.index:
        want = ref_un.loc[k]
        got = got_un[k]
        assert (got["tp"], got["fp"], got["fn"], got["tn"]) == (
            want["TP"], want["FP"], want["FN"], want["TN"]
        ), (k, seed)


@pytest.mark.parametrize("seed", SEEDS)
def test_differential_combine_and_misc_rules(spark, ref_rulelib, seed):
    """Combine rules (nan/corrections x or/and), hardmax/hardmin,
    shift_to_manual_obs, funcdict, keep_comments vs live reference."""
    rng = np.random.default_rng(600 + seed)
    s = gen_series(rng)
    df = to_spark(spark, s)
    thr = float(np.nanquantile(s.to_numpy(), 0.8))

    # hardmax / hardmin
    assert_matches_reference(
        R.rule_hardmax(df, "value", "r", threshold=thr, offset=0.05),
        ref_rulelib.rule_hardmax(s, thr, 0.05),
    )
    assert_matches_reference(
        R.rule_hardmin(df, "value", "r", threshold=-thr),
        ref_rulelib.rule_hardmin(s, -thr),
    )

    # combine rules over two upstream detection steps
    ref_a = ref_rulelib.rule_ufunc_threshold(s, (np.greater,), thr)
    ref_b = ref_rulelib.rule_outside_n_sigma(s, n=1.2)
    step_a = s.where(ref_a["correction_code"] == 0, np.nan)
    step_b = s.where(ref_b["correction_code"] == 0, np.nan)

    two = R.rule_ufunc_threshold(df, "value", "a", ufunc="greater",
                                 threshold=thr)
    two = R.rule_outside_n_sigma(two, "value", "b", n=1.2)
    two = two.withColumn(
        "sa", F.when(F.col("a_code") == 0, F.col("value"))
    ).withColumn("sb", F.when(F.col("b_code") == 0, F.col("value")))

    for rule, ref_fn, cols in (
        (R.rule_combine_nan_or, ref_rulelib.rule_combine_nan_or,
         ["sa", "sb"]),
        (R.rule_combine_nan_and, ref_rulelib.rule_combine_nan_and,
         ["sa", "sb"]),
    ):
        got = (
            rule(two, cols, "r").select("ts", "r_res")
            .toPandas().sort_values("ts").set_index("ts")["r_res"]
        )
        want = ref_fn(step_a, step_b)
        np.testing.assert_allclose(got.to_numpy(), want.to_numpy(),
                                   atol=1e-12, equal_nan=True)

    # rule_combine_corrections_{or,and} cannot be diffed against the
    # live reference: they are dead-on-arrival there — with corrections
    # DataFrames, get_empty_corrections_df(args[0]) builds data arrays of
    # df.size (rows*3) against a rows-long index (ValueError); with
    # Series, series["correction_code"] raises KeyError
    # (rulelib.py:801-818, 844-864; probed below). Our implementation
    # (99 where any/all codes non-zero, oracle-checked) is the evidently
    # intended semantics.
    for ref_fn in (ref_rulelib.rule_combine_corrections_or,
                   ref_rulelib.rule_combine_corrections_and):
        with pytest.raises(ValueError):
            ref_fn(ref_a, ref_b)
    got_or = (
        R.rule_combine_corrections_or(two, ["a_code", "b_code"], "r")
        .select("ts", "r_res").toPandas().sort_values("ts")
        .set_index("ts")["r_res"]
    )
    want_or = np.where(
        (ref_a["correction_code"].to_numpy() != 0)
        | (ref_b["correction_code"].to_numpy() != 0), 99, 0)
    assert got_or.to_numpy().tolist() == want_or.tolist()

    # shift_to_manual_obs: additive-correction series equality
    man_idx = s.index[rng.random(len(s)) < 0.06]
    man = pd.Series(
        s.reindex(man_idx).to_numpy() + rng.normal(0, 0.4, len(man_idx)),
        index=man_idx,
    ).dropna()
    got = (
        R.rule_shift_to_manual_obs(df, "value", "r",
                                   hseries=to_spark(spark, man),
                                   max_dt="2D")
        .select("ts", "r_corr").toPandas().sort_values("ts")
        .set_index("ts")["r_corr"]
    )
    want = ref_rulelib.rule_shift_to_manual_obs(s, man, max_dt="2D")
    np.testing.assert_allclose(got.to_numpy(),
                               want.to_numpy(dtype=float),
                               atol=1e-9, equal_nan=True)

    # funcdict: two predicates OR'd (vectorized here, .apply there)
    fd = {"neg": lambda v: v < -1.0, "big": lambda v: v > thr}
    assert_matches_reference(
        R.rule_funcdict(df, "value", "r", funcdict=fd),
        ref_rulelib.rule_funcdict(s, fd),
    )

    # keep_comments: string comparison values
    comments = pd.Series(
        rng.choice(["", "dry sensor", "ice", "dry sensor ice"], len(s)),
        index=s.index,
    )
    dfc = spark.createDataFrame(pd.DataFrame({
        "series_id": "d1", "ts": s.index, "value": s.to_numpy(),
        "comment": comments.to_numpy(),
    }))
    out = R.rule_keep_comments(dfc, "value", "r",
                               keep_comments=["dry sensor", "ice"],
                               comment_series="comment")
    got = (out.select("ts", "r_code", "r_cval").toPandas()
           .sort_values("ts").set_index("ts"))
    want = ref_rulelib.rule_keep_comments(s, ["dry sensor", "ice"],
                                          comments)
    assert got["r_code"].to_numpy().tolist() == [
        int(c) for c in want["correction_code"].to_numpy()
    ]
    assert got["r_cval"].fillna("").to_numpy().tolist() == (
        want["comparison_values"].to_numpy().tolist()
    )


@pytest.fixture(scope="module")
def ref_ts_utils(ref_rulelib):
    return sys.modules["_refpkg.ts_utils"]


@pytest.mark.parametrize("seed", SEEDS)
def test_differential_alignment_utilities(spark, ref_ts_utils, seed):
    """The §2.3 alignment primitives vs live reference ts_utils:
    resample_short_series_to_long_series (as-of placement + ffill/bfill)
    and interpolate_series_to_new_index (np.interp hull semantics) on
    random irregular main/aux grids."""
    from traval_spark.functions.ts import (
        align_interpolate,
        align_resample_ffill_bfill,
    )

    rng = np.random.default_rng(700 + seed)
    main = gen_series(rng, n=200).dropna()
    aux_idx = main.index[rng.random(len(main)) < 0.12]
    # shift some aux points OFF the main grid (odd minutes)
    aux = pd.Series(
        rng.normal(0, 1, len(aux_idx)),
        index=aux_idx + pd.to_timedelta(
            rng.integers(-7, 8, len(aux_idx)), unit="min"),
    )
    # shifts can collapse two aux points onto one timestamp (seed 14 at
    # 30-seed depth); duplicate-index behavior is np.interp's
    # POSITION-dependent quirk, outside the set-semantics operator
    # contract (ts.py:align_interpolate) — dedupe so both engines see
    # the same well-defined series
    aux = aux[~aux.index.duplicated(keep="last")]
    df = to_spark(spark, main)
    aux_f = to_spark(spark, aux)

    got = (
        align_resample_ffill_bfill(df, aux_f, "value", "resampled")
        .select("ts", "resampled").toPandas()
        .sort_values("ts").set_index("ts")["resampled"]
    )
    want = ref_ts_utils.resample_short_series_to_long_series(
        aux.copy(), main.copy())
    np.testing.assert_allclose(got.to_numpy(), want.to_numpy(),
                               atol=1e-12, equal_nan=True)

    got_i = (
        align_interpolate(df, aux_f, "value", "interp")
        .select("ts", "interp").toPandas()
        .sort_values("ts").set_index("ts")["interp"]
    )
    want_i = ref_ts_utils.interpolate_series_to_new_index(
        aux.copy(), main.index)
    np.testing.assert_allclose(got_i.to_numpy(),
                               want_i.to_numpy(dtype=float),
                               atol=1e-9, equal_nan=True)
