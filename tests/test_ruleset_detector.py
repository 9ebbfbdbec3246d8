"""RuleSet compiler + Detector orchestration tests.

Re-expresses /root/reference/tests/test_002_ruleset.py and
test_003_detector.py over the wide step table.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from tests.conftest import make_series_df
from traval_spark.plans.detector import Detector
from traval_spark.plans.params import TravalParameters
from traval_spark.plans.ruleset import ParamRef, SparkRuleSet, apply_ruleset


@pytest.fixture()
def rset():
    """Reference fixture (test_002:71-75): values range(-5, 23, 3), rule
    ufunc_threshold >= 10."""
    rs = SparkRuleSet(name="test")
    rs.add_rule(
        "gt10",
        "rule_ufunc_threshold",
        apply_to=0,
        kwargs={"ufunc": ("greater_equal",), "threshold": 10.0},
    )
    return rs


@pytest.fixture()
def series10(spark):
    return make_series_df(spark, np.arange(-5, 23, 3, dtype=float))


def test_add_update_del_rule(rset):
    assert len(rset) == 1
    rset.update_rule(
        "gt10", "rule_ufunc_threshold", apply_to=0,
        kwargs={"ufunc": ("greater_equal",), "threshold": 5.0},
    )
    assert rset.get_rule(stepname="gt10")["kwargs"]["threshold"] == 5.0
    with pytest.raises(KeyError):
        rset.update_rule("nope", "rule_hardmax")
    rset.del_rule("gt10")
    assert len(rset) == 0


def test_apply_ruleset(series10, rset):
    wide = apply_ruleset(series10, rset)
    # values >= 10: 12,15,18,21 -> 4 flagged + 1 more? range(-5,23,3) =
    # [-5,-2,1,4,7,10,13,16,19,22] -> >=10: 10,13,16,19,22 = 5 flagged
    flagged = wide.filter(F.col("step_1").isNull()).count()
    assert flagged == 5
    kept = wide.filter(F.col("step_1").isNotNull()).count()
    assert kept == 5


def test_apply_ruleset_branching(series10):
    """apply_to may reference any earlier step, incl. tuple combines."""
    rs = SparkRuleSet("branch")
    rs.add_rule("gt10", "rule_ufunc_threshold", apply_to=0,
                kwargs={"ufunc": ("greater_equal",), "threshold": 10.0})
    rs.add_rule("lt0", "rule_ufunc_threshold", apply_to=0,
                kwargs={"ufunc": ("less",), "threshold": 0.0})
    rs.add_rule("both", "rule_combine_nan_or", apply_to=(1, 2))
    wide = apply_ruleset(series10, rs)
    # union of flags: >=10 (5 rows) + <0 (2 rows) = 7 NULLs in step_3
    assert wide.filter(F.col("step_3").isNull()).count() == 7


def test_ruleset_json_roundtrip(rset, tmp_path, series10):
    p = str(tmp_path / "rs.json")
    rset.to_json(p)
    rs2 = SparkRuleSet.from_json(p)
    assert list(rs2.rules) == list(rset.rules)
    wide = apply_ruleset(series10, rs2)
    assert wide.filter(F.col("step_1").isNull()).count() == 5


def test_ruleset_json_series_kwarg(spark, tmp_path):
    """Series kwargs round-trip via the reference's series:<json> encoding
    (ruleset.py:20-21, 60-67)."""
    idx = pd.date_range("2020-01-01", freq="D", periods=10)
    thr = pd.Series(index=idx[:3], data=5.0)
    rs = SparkRuleSet("s")
    rs.add_rule("thr", "rule_ufunc_threshold", apply_to=0,
                kwargs={"ufunc": ("greater_equal",), "threshold": thr})
    payload = rs.to_json()
    rs2 = SparkRuleSet.from_json(payload)
    restored = rs2.rules["thr"]["kwargs"]["threshold"]
    assert isinstance(restored, pd.Series)
    assert (restored.values == 5.0).all()
    df = make_series_df(spark, np.arange(10))
    wide = apply_ruleset(df, rs2)
    assert wide.filter(F.col("step_1").isNull()).count() == 5


def test_param_refs(spark):
    """Per-series parameters via broadcast params table replace the
    reference's callable kwargs (ruleset.py:276-303)."""
    a = make_series_df(spark, np.arange(10), sid="a")
    b = make_series_df(spark, np.arange(10), sid="b")
    df = a.unionByName(b)
    tp = TravalParameters(
        pd.DataFrame(
            [("default", "gt", "threshold", 5.0), ("b", "gt", "threshold", 8.0)],
            columns=["location", "rulename", "parameter", "value"],
        )
    )
    params = tp.to_spark(spark, df.select("series_id").distinct())
    rs = SparkRuleSet("p")
    rs.add_rule("gt", "rule_ufunc_threshold", apply_to=0,
                kwargs={"ufunc": ("greater_equal",),
                        "threshold": ParamRef("gt", "threshold")})
    wide = apply_ruleset(df, rs, params=params)
    per = {
        r["series_id"]: r["n"]
        for r in wide.filter(F.col("step_1").isNull())
        .groupBy("series_id").agg(F.count("*").alias("n")).collect()
    }
    assert per == {"a": 5, "b": 2}  # a: >=5 -> 5 rows; b: >=8 -> 2 rows


def test_detector_flow(spark, series10):
    """test_003 analog: apply + confusion matrix + comment series."""
    vals = np.arange(-5, 23, 3, dtype=float)
    truth_vals = vals.copy()
    truth_vals[vals >= 10] = np.nan  # truth flags the same 5 points
    truth = make_series_df(spark, truth_vals)

    rs = SparkRuleSet("t")
    rs.add_rule("gt10", "rule_ufunc_threshold", apply_to=0,
                kwargs={"ufunc": ("greater_equal",), "threshold": 10.0})
    det = Detector(series10, truth=truth)
    det.apply_ruleset(rs)

    cm = det.confusion_matrix().collect()[0]
    assert (cm["tp"], cm["fp"], cm["fn"], cm["tn"]) == (5, 0, 0, 5)

    # comment series: rule name where flagged (test_003:103-104)
    com = det.get_comment_series()
    assert com.filter(F.col("comment") == "gt10").count() == 5

    corr = det.get_corrections_dataframe()
    assert corr.filter(F.col("gt10") == 2).count() == 5

    stats = det.classifier_stats().collect()[0]
    assert stats["acc"] == pytest.approx(1.0)
    assert stats["mcc"] == pytest.approx(1.0)


def test_detector_uniqueness(spark, series10):
    """Unique NaN contribution per rule (detector.py:242-303)."""
    vals = np.arange(-5, 23, 3, dtype=float)
    truth_vals = vals.copy()
    truth_vals[vals >= 10] = np.nan
    truth = make_series_df(spark, truth_vals)

    rs = SparkRuleSet("u")
    rs.add_rule("gt10", "rule_ufunc_threshold", apply_to=0,
                kwargs={"ufunc": ("greater_equal",), "threshold": 10.0})
    rs.add_rule("gt19", "rule_ufunc_threshold", apply_to=0,
                kwargs={"ufunc": ("greater_equal",), "threshold": 19.0})
    rs.add_rule("final", "rule_combine_nan_or", apply_to=(1, 2))
    det = Detector(series10, truth=truth)
    det.apply_ruleset(rs)
    uq = {r["rule"]: r for r in det.uniqueness().collect()}
    # gt19 flags {19, 22} which gt10 also flags -> zero unique TPs
    assert uq["gt19"]["tp"] == 0
    # gt10 uniquely flags {10, 13, 16} (19, 22 shared with gt19)
    assert uq["gt10"]["tp"] == 3


def test_detector_single_rule_empty_confusion(spark, series10):
    """A single-rule ruleset makes uniqueness()'s step list empty and
    confusion_matrix(steps=[0]) filters everything out: both must return
    an EMPTY frame with the confusion schema, like the reference's empty
    DataFrame, not raise."""
    vals = np.arange(-5, 23, 3, dtype=float)
    truth = make_series_df(spark, vals)
    rs = SparkRuleSet("one")
    rs.add_rule("gt10", "rule_ufunc_threshold", apply_to=0,
                kwargs={"ufunc": ("greater_equal",), "threshold": 10.0})
    det = Detector(series10, truth=truth)
    det.apply_ruleset(rs)
    uq = det.uniqueness()
    assert uq.count() == 0
    assert uq.columns == ["step", "rule", "tp", "fp", "fn", "tn"]
    cm = det.confusion_matrix(steps=[0])
    assert cm.count() == 0
    assert cm.columns == ["step", "rule", "tp", "fp", "fn", "tn"]
