"""CSV series source/sink (sources/csvio.py) + overview plot data prep
(plans/viz.py) — the two coverage closers from SURVEY §2.8 (ex01 CSV
load) and §2.5 (plot_overview)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from tests.conftest import make_series_df
from traval_spark.plans.detector import Detector
from traval_spark.plans.ruleset import SparkRuleSet
from traval_spark.plans.viz import overview_frame
from traval_spark.sources.csvio import (
    read_series_csv,
    to_wide_pandas,
    write_series_csv,
)

CSV = """index,DEUR033_G,OTHER_X
2012-09-24 15:00:00,29.1959,1.0
2012-09-24 16:00:00,29.6104,
2012-09-24 17:00:00,,3.5
"""


def test_read_series_csv(spark, tmp_path):
    p = tmp_path / "raw_series.csv"
    p.write_text(CSV)
    df = read_series_csv(spark, str(p))
    assert df.columns == ["series_id", "ts", "value"]
    assert dict(df.dtypes)["ts"] == "timestamp_ntz"
    pdf = df.toPandas().sort_values(["series_id", "ts"]).reset_index(drop=True)
    # 2 series x 3 timestamps; empty cells are NULL values at present rows
    assert len(pdf) == 6
    a = pdf[pdf.series_id == "DEUR033_G"]
    assert a["value"].tolist()[:2] == [29.1959, 29.6104]
    assert np.isnan(a["value"].tolist()[2])
    b = pdf[pdf.series_id == "OTHER_X"]
    assert np.isnan(b["value"].tolist()[1])
    assert b["value"].tolist()[2] == 3.5


def test_csv_roundtrip_wide(spark, tmp_path):
    p = tmp_path / "raw_series.csv"
    p.write_text(CSV)
    df = read_series_csv(spark, str(p))
    wide = to_wide_pandas(df)
    assert list(wide.columns) == ["DEUR033_G", "OTHER_X"]
    assert wide.index.name == "index"
    assert wide.loc[pd.Timestamp("2012-09-24 15:00:00"), "OTHER_X"] == 1.0

    out = tmp_path / "out_csv"
    write_series_csv(df, str(out))
    back = spark.read.option("header", True).csv(f"{out}")
    # partitioned by series_id; values survive the sink->scan round trip
    got = back.select(
        "series_id", F.to_timestamp("ts").alias("ts"),
        F.col("value").cast("double").alias("value"),
    ).toPandas().sort_values(["series_id", "ts"]).reset_index(drop=True)
    want = df.toPandas().sort_values(
        ["series_id", "ts"]).reset_index(drop=True)[got.columns]
    # CSV sinks drop all-NULL value cells to empty -> NaN: compare as float
    pd.testing.assert_frame_equal(
        got.astype({"value": float}), want.astype({"value": float})
    )


def _mini_detector(spark):
    vals = np.arange(-5, 23, 3, dtype=float)  # 10 points, 5 of them >= 10
    series = make_series_df(spark, vals)
    rs = SparkRuleSet("t")
    rs.add_rule("gt10", "rule_ufunc_threshold", apply_to=0,
                kwargs={"ufunc": ("greater_equal",), "threshold": 10.0})
    det = Detector(series)
    det.apply_ruleset(rs)
    return det, vals


def test_overview_frame_flags(spark):
    det, vals = _mini_detector(spark)
    pdf = overview_frame(det, "s1")
    assert list(pdf.columns) == ["ts", "step_0", "step_1", "flag_1"]
    assert len(pdf) == 10  # under max_points: nothing thinned
    # flag_1 marks exactly the points rule gt10 NULLed
    assert pdf["flag_1"].sum() == 5
    assert (pdf.loc[pdf.flag_1, "step_0"] >= 10).all()
    assert pdf.loc[pdf.flag_1, "step_1"].isna().all()


def test_overview_frame_thinning_keeps_flags(spark):
    det, vals = _mini_detector(spark)
    pdf = overview_frame(det, "s1", max_points=3)
    # thinned below the full 10 rows, but every flagged row survives
    assert pdf["flag_1"].sum() == 5
    assert len(pdf) < 10


def test_plot_overview_importerror_without_matplotlib(spark):
    det, _ = _mini_detector(spark)
    try:
        import matplotlib  # noqa: F401
        pytest.skip("matplotlib present; gate not exercisable")
    except ImportError:
        pass
    from traval_spark.plans.viz import plot_overview

    with pytest.raises(ImportError, match="matplotlib"):
        plot_overview(det, "s1")
