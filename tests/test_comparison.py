"""Comparison-layer tests: the 16-row truth table + classifier goldens.

Re-expresses /root/reference/tests/test_004_comparison.py and
test_007_binaryclassifier.py as DataFrame assertions (FIXTURES.md F4/F5).
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from traval_spark.comparison import (
    binary_classification,
    compare_series,
    compare_series_relative,
    comparison_series,
    summarize_comparison,
    summarize_relative,
    with_classifier_stats,
)

MISSING = object()


def _frame(spark, cells, sid="s1"):
    """Build a long frame from 16 cells of value/NaN/MISSING."""
    idx = pd.date_range("2020-01-01", freq="D", periods=len(cells))
    rows = [
        (sid, t.to_pydatetime(), None if (c is not MISSING and isinstance(c, float) and math.isnan(c)) else c)
        for t, c in zip(idx, cells)
        if c is not MISSING
    ]
    return spark.createDataFrame(rows, "series_id string, ts timestamp, value double")


NAN = float("nan")

# tests/test_004_comparison.py:21-60 — (orig, s1, s2) cell states
TRUTH_TABLE = [
    (1.0, 1.0, 1.0),        # kept_in_both
    (1.0, 1.0, NAN),        # flagged_in_s2
    (1.0, 1.0, MISSING),    # flagged_in_s2
    (1.0, NAN, MISSING),    # flagged_in_both
    (1.0, NAN, NAN),        # flagged_in_both
    (1.0, MISSING, MISSING),  # flagged_in_both
    (NAN, 1.0, 1.0),        # introduced_in_both
    (NAN, 1.0, NAN),        # introduced_in_s1
    (NAN, 1.0, MISSING),    # introduced_in_s1
    (NAN, MISSING, MISSING),  # in_all_nan
    (NAN, NAN, NAN),        # in_all_nan
    (MISSING, 1.0, 1.0),    # introduced_in_both
    (MISSING, 1.0, NAN),    # introduced_in_s1
    (MISSING, 1.0, MISSING),  # introduced_in_s1
    (MISSING, NAN, NAN),    # not counted
    (MISSING, MISSING, MISSING),  # not counted
]

# tests/test_004_comparison.py:62-72
EXPECTED_RELATIVE = {
    "kept_in_both": 1,
    "flagged_in_s1": 0,
    "flagged_in_s2": 2,
    "flagged_in_both": 3,
    "in_all_nan": 2,
    "introduced_in_s1": 4,
    "introduced_in_s2": 0,
    "introduced_in_both": 2,
}


def test_relative_truth_table(spark):
    orig = _frame(spark, [r[0] for r in TRUTH_TABLE])
    s1 = _frame(spark, [r[1] for r in TRUTH_TABLE])
    s2 = _frame(spark, [r[2] for r in TRUTH_TABLE])
    rel = compare_series_relative(s1, s2, orig)
    summary = summarize_relative(rel).collect()[0].asDict()
    for k, v in EXPECTED_RELATIVE.items():
        assert summary[k] == v, (k, summary)


def test_series_comparison_smoke(spark):
    """Reference test_004:8-18: overlapping ranges with NaN windows."""
    idx1 = pd.date_range("2020-01-01", "2020-11-30", freq="D")
    idx2 = pd.date_range("2020-02-01", "2020-12-31", freq="D")
    v1 = pd.Series(1.0, index=idx1)
    v1.loc["2020-03-15":"2020-04-15"] = np.nan
    v2 = pd.Series(2.0, index=idx2)
    v2.loc["2020-04-01":"2020-04-30"] = np.nan

    s1 = spark.createDataFrame(
        pd.DataFrame({"series_id": "x", "ts": idx1, "value": v1.values})
    )
    s2 = spark.createDataFrame(
        pd.DataFrame({"series_id": "x", "ts": idx2, "value": v2.values})
    )
    cmp = compare_series(s1, s2)
    total = cmp.count()
    assert total == len(idx1.union(idx2))
    summ = summarize_comparison(cmp).collect()[0].asDict()
    # category counts must partition the union index
    assert sum(summ.values()) == total
    # everything both-present-non-nan differs (1.0 vs 2.0)
    assert summ["in_both_identical"] == 0
    # pandas oracle for each category
    both = idx1.intersection(idx2)
    both_ok = [t for t in both if not math.isnan(v1[t]) and not math.isnan(v2[t])]
    assert summ["in_both_different"] == len(both_ok)


def test_relative_stats_identities(spark):
    """test_004:80-100: fpr+specificity == 1, fnr+sensitivity == 1."""
    idx = pd.date_range("2020-01-01", periods=110, freq="D")
    b = pd.Series(1.0, index=idx)
    b.iloc[:10] = np.nan
    s1 = pd.Series(1.0, index=idx)
    s1.iloc[30:70] = np.nan
    s2 = pd.Series(1.0, index=idx)
    s2.iloc[10:60] = np.nan

    mk = lambda v: spark.createDataFrame(
        pd.DataFrame({"series_id": "x", "ts": idx, "value": v.values})
    )
    rel = compare_series_relative(mk(s1), mk(s2), mk(b))
    stats = with_classifier_stats(binary_classification(rel)).collect()[0]
    assert stats["fpr"] + stats["specificity"] == pytest.approx(1.0)
    assert stats["fnr"] + stats["sensitivity"] == pytest.approx(1.0)


def test_classifier_stats_golden(spark):
    """test_007:14-34: all 18 stats for BinaryClassifier(9, 1, 9, 1)."""
    bc = spark.createDataFrame([(9, 1, 9, 1)], "tp int, fp int, tn int, fn int")
    row = with_classifier_stats(bc).collect()[0].asDict()
    golden = {
        "tp": 9, "fp": 1, "fn": 1, "tn": 9,
        "sensitivity": 0.9, "tpr": 0.9, "fnr": 0.1,
        "specificity": 0.9, "tnr": 0.9, "fpr": 0.1,
        "ppv": 0.9, "npv": 0.9, "fdr": 0.1, "for": 0.1,
        "acc": 0.9, "prev": 0.5, "informedness": 0.8, "mcc": 0.8,
    }
    for k, v in golden.items():
        assert row[k] == pytest.approx(v), k


def test_classifier_add_is_global_agg(spark):
    """binary_classifier.py:104-124 __add__ == groupBy().sum() roll-up."""
    rel = spark.createDataFrame(
        [("a", "flagged_in_both"), ("a", "kept_in_both"),
         ("b", "flagged_in_both"), ("b", "flagged_in_s1")],
        "series_id string, rel_category string",
    )
    glob = binary_classification(rel).collect()[0]
    assert (glob["tp"], glob["fp"], glob["tn"], glob["fn"]) == (2, 1, 1, 0)


def test_comparison_series_quirk(spark):
    """ts_comparison.py:271-294: identical -> -1.0, different -> 0.0
    (implementation, not docstring)."""
    idx = pd.date_range("2020-01-01", periods=3, freq="D")
    s1 = spark.createDataFrame(
        pd.DataFrame({"series_id": "x", "ts": idx, "value": [1.0, 1.0, np.nan]})
    )
    s2 = spark.createDataFrame(
        pd.DataFrame({"series_id": "x", "ts": idx, "value": [1.0, 2.0, np.nan]})
    )
    cmp = compare_series(s1, s2)
    st = {r["ts"].day: r["status"]
          for r in comparison_series(cmp).collect()}
    assert st[1] == -1.0 and st[2] == 0.0 and st[3] == -9999.0


def test_threshold_sweep_matches_per_threshold_classifier(spark):
    """One-pass K-threshold sweep == K separate relative-comparison
    classifier runs (binary_classifier.py:49-69 semantics)."""
    import numpy as np

    from tests.conftest import make_series_df
    from traval_spark.comparison import (
        binary_classification,
        compare_series_relative,
        threshold_sweep,
    )
    from pyspark.sql import functions as F

    vals = np.arange(20.0)
    base = make_series_df(spark, vals)
    truth_vals = vals.copy()
    truth_vals[vals > 12.0] = np.nan  # 'real' errors
    truth = make_series_df(spark, truth_vals)

    thresholds = [5.0, 10.0, 15.0]
    sweep = {
        r["threshold"]: (r["tp"], r["fp"], r["tn"], r["fn"])
        for r in threshold_sweep(base, truth, thresholds).collect()
    }
    for thr in thresholds:
        detected = base.withColumn(
            "value",
            F.when(F.col("value") > thr, F.lit(None)).otherwise(
                F.col("value")),
        )
        bc = binary_classification(
            compare_series_relative(detected, truth, base)
        ).collect()[0]
        assert sweep[thr] == (bc["tp"], bc["fp"], bc["tn"], bc["fn"]), thr


def test_threshold_sweep_rejects_unknown_ufunc(spark):
    import numpy as np

    from tests.conftest import make_series_df
    from traval_spark.comparison import threshold_sweep

    s = make_series_df(spark, np.arange(5.0))
    with pytest.raises(ValueError, match="ufunc"):
        threshold_sweep(s, s, [1.0], ufunc="modulo")
