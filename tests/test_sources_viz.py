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

# ---------------------------------------------------------------------------
# comparison plotting surface (plans/comparison_plots.py, reference plots.py)
# ---------------------------------------------------------------------------


def _cmp_series(spark):
    """10-point pair with known categories: 2 different, 1 only-in-s1,
    1 only-in-s2, rest identical (one of them both-NaN)."""
    idx = pd.date_range("2020-01-01", freq="D", periods=10)
    v1 = np.arange(10.0)
    v2 = np.arange(10.0)
    v2[3] += 5.0
    v2[4] -= 5.0                       # 2x in_both_different
    v1[7] = np.nan                     # s1 flagged -> in_s2
    v2[8] = np.nan                     # s2 flagged -> in_s1
    v1[9] = np.nan
    v2[9] = np.nan                     # in_both_nan
    s1 = make_series_df(spark, v1, ts=idx)
    s2 = make_series_df(spark, v2, ts=idx)
    return s1, s2


def test_series_comparison_frame_categories_exact(spark):
    from traval_spark.comparison import compare_series
    from traval_spark.plans.comparison_plots import series_comparison_frame

    s1, s2 = _cmp_series(spark)
    cmp = compare_series(s1, s2)
    pdf = series_comparison_frame(cmp, "s1")
    assert list(pdf.columns) == ["ts", "v1", "v2", "category"]
    counts = pdf["category"].value_counts().to_dict()
    assert counts["in_both_different"] == 2
    assert counts["in_s1"] == 1 and counts["in_s2"] == 1
    assert counts["in_both_identical"] == 5
    assert counts["in_both_nan"] == 1


def test_series_comparison_frame_thinning_keeps_marks(spark):
    from traval_spark.comparison import compare_series
    from traval_spark.plans.comparison_plots import series_comparison_frame

    s1, s2 = _cmp_series(spark)
    pdf = series_comparison_frame(compare_series(s1, s2), "s1", max_points=3)
    # bulk rows thinned, every mark category row kept
    assert len(pdf) < 10
    counts = pdf["category"].value_counts().to_dict()
    assert counts["in_both_different"] == 2
    assert counts["in_s1"] == 1 and counts["in_s2"] == 1


def test_relative_comparison_frame_flags_exact(spark):
    from traval_spark.comparison import compare_series_relative
    from traval_spark.plans.comparison_plots import relative_comparison_frame

    idx = pd.date_range("2020-01-01", freq="D", periods=8)
    base = np.arange(8.0)
    v1 = base.copy()
    truth = base.copy()
    v1[2] = np.nan                     # flagged only in s1 -> FP
    truth[3] = np.nan                  # flagged only in truth -> FN
    v1[4] = np.nan
    truth[4] = np.nan                  # flagged in both -> TP
    rel = compare_series_relative(
        make_series_df(spark, v1, ts=idx),
        make_series_df(spark, truth, ts=idx),
        make_series_df(spark, base, ts=idx),
    )
    pdf = relative_comparison_frame(rel, "s1", max_points=4)
    counts = pdf["rel_category"].value_counts().to_dict()
    assert counts["flagged_in_s1"] == 1
    assert counts["flagged_in_s2"] == 1
    assert counts["flagged_in_both"] == 1
    # base values ride along for the validation markers
    assert pdf.loc[pdf.rel_category == "flagged_in_both", "vb"].item() == 4.0


def test_comparison_plots_color_dict_parity(spark):
    from traval_spark.plans.comparison_plots import (
        DEFAULT_COLOR_DICT,
        ComparisonPlots,
    )

    s1, s2 = _cmp_series(spark)
    from traval_spark.comparison import compare_series

    cp = ComparisonPlots(compare_series(s1, s2), "s1")
    assert cp.color_dict == DEFAULT_COLOR_DICT
    cp.update_color_dict("different", color="pink", alpha=0.9)
    assert cp.color_dict["different"] == {"color": "pink", "alpha": 0.9}
    assert DEFAULT_COLOR_DICT["different"] == {"color": "Red", "alpha": 0.3}
    cp.reset_color_dict()
    assert cp.color_dict == DEFAULT_COLOR_DICT


def test_norm_ppf_matches_known_quantiles():
    from traval_spark.plans.comparison_plots import norm_ppf

    # textbook standard-normal quantiles (scipy-free probit)
    assert norm_ppf(0.5) == pytest.approx(0.0, abs=1e-9)
    assert norm_ppf(0.975) == pytest.approx(1.959963985, abs=1e-6)
    assert norm_ppf(0.025) == pytest.approx(-1.959963985, abs=1e-6)
    assert norm_ppf(0.001) == pytest.approx(-3.090232306, abs=1e-6)
    assert norm_ppf(0.999) == pytest.approx(3.090232306, abs=1e-6)
    arr = norm_ppf(np.array([0.0, 0.5, 1.0]))
    assert np.isneginf(arr[0]) and arr[1] == 0.0 and np.isposinf(arr[2])


def test_comparison_plot_render_smoke(spark):
    """Full renders when matplotlib exists; otherwise the gate raises a
    clear ImportError (what this sandbox exercises)."""
    from traval_spark.comparison import compare_series, compare_series_relative
    from traval_spark.plans import comparison_plots as cpz

    s1, s2 = _cmp_series(spark)
    cmp = compare_series(s1, s2)
    rel = compare_series_relative(s1, s2, s2)
    try:
        import matplotlib  # noqa: F401
        matplotlib.use("Agg")
        ax1 = cpz.plot_series_comparison(cmp, "s1")
        ax2 = cpz.plot_relative_comparison(rel, "s1", mark_introduced=True)
        ax3 = cpz.plot_validation_result(rel, "s1")
        ax4 = cpz.roc_plot([0.8], [0.1], ["rs"])
        ax5 = cpz.det_plot([0.1], [0.2], ["rs"])
        assert all(a is not None for a in (ax1, ax2, ax3, ax4, ax5))
    except ImportError:
        for fn, args in (
            (cpz.plot_series_comparison, (cmp, "s1")),
            (cpz.plot_relative_comparison, (rel, "s1")),
            (cpz.plot_validation_result, (rel, "s1")),
            (cpz.roc_plot, ([0.8], [0.1], ["rs"])),
            (cpz.det_plot, ([0.1], [0.2], ["rs"])),
        ):
            with pytest.raises(ImportError, match="matplotlib"):
                fn(*args)


def test_write_wide_csv_byte_identical_roundtrip(spark, tmp_path):
    """read fixture CSV -> long frame -> distributed wide writer -> the
    part file reproduces the fixture byte-for-byte (header order, ts
    format, float rendering, empty NaN cells)."""
    import glob

    from traval_spark.sources.csvio import write_wide_csv

    p = tmp_path / "raw_series.csv"
    p.write_text(CSV)
    df = read_series_csv(spark, str(p))

    out = tmp_path / "wide_out"
    write_wide_csv(df, str(out))
    parts = glob.glob(f"{out}/part-*.csv")
    assert len(parts) == 1  # single_file coalesce
    got = open(parts[0]).read()
    assert got == CSV

    # explicit series_ids skips the pivot discovery job, same bytes
    out2 = tmp_path / "wide_out2"
    write_wide_csv(df, str(out2), series_ids=["DEUR033_G", "OTHER_X"])
    got2 = open(glob.glob(f"{out2}/part-*.csv")[0]).read()
    assert got2 == CSV


def test_write_wide_csv_nonalpha_header_order(spark, tmp_path):
    """A long frame carries no column order, so auto-discovery emits
    alphabetical columns; passing the original header as series_ids
    restores the byte-identical round trip for non-alphabetical files."""
    import glob

    from traval_spark.sources.csvio import write_wide_csv

    csv = (
        "index,ZED_9,ALPHA_1\n"
        "2012-09-24 15:00:00,1.5,2.5\n"
        "2012-09-24 16:00:00,,3.5\n"
    )
    p = tmp_path / "nonalpha.csv"
    p.write_text(csv)
    df = read_series_csv(spark, str(p))

    out_auto = tmp_path / "auto"
    write_wide_csv(df, str(out_auto))
    got_auto = open(glob.glob(f"{out_auto}/part-*.csv")[0]).read()
    assert got_auto.splitlines()[0] == "index,ALPHA_1,ZED_9"  # alphabetical

    out_fixed = tmp_path / "fixed"
    write_wide_csv(df, str(out_fixed), series_ids=["ZED_9", "ALPHA_1"])
    got = open(glob.glob(f"{out_fixed}/part-*.csv")[0]).read()
    assert got == csv


def test_fsutil_sidecar_roundtrip(spark, tmp_path):
    """fsutil is the ONE code path for every sidecar file (manifests,
    markers, retention state): text roundtrips bytes-exact, parents are
    created implicitly, glob lists markers in one call, delete removes
    recursively."""
    from traval_spark.sources import fsutil

    root = str(tmp_path / "side")
    body = '{"rows": 3, "note": "unicode éü"}'
    fsutil.write_text(spark, f"{root}/t/_manifests/day=2024-01-01.json", body)
    assert fsutil.exists(spark, f"{root}/t/_manifests/day=2024-01-01.json")
    assert fsutil.read_text(
        spark, f"{root}/t/_manifests/day=2024-01-01.json") == body

    fsutil.touch(spark, f"{root}/t/batch_id=0/_COMMITTED")
    fsutil.touch(spark, f"{root}/t/batch_id=1/_COMMITTED")
    got = sorted(fsutil.glob(spark, f"{root}/t/batch_id=*/_COMMITTED"))
    assert len(got) == 2 and all(p.endswith("/_COMMITTED") for p in got)
    assert fsutil.glob(spark, f"{root}/absent/*/x") == []

    assert fsutil.list_names(spark, f"{root}/t/_manifests") == [
        "day=2024-01-01.json"]
    assert fsutil.list_names(spark, f"{root}/nope") == []

    fsutil.delete(spark, f"{root}/t", recursive=True)
    assert not fsutil.exists(spark, f"{root}/t")
