"""Comparison plotting surface (reference plots.py:1-519).

The reference's ``ComparisonPlots`` mix-in draws directly from pandas
series held by a ``SeriesComparison`` object. On a fleet-sized long frame
that is a driver OOM, so — same split as plans/viz.py — every plot is two
stages:

- a **frame** function (distributed): one Spark job that filters the
  comparison result to one series, keeps every categorized/flagged row
  (the signal the plot exists to show), stride-thins only the bulk
  rows, and collects a bounded pandas frame;
- a **render** function (driver): matplotlib over that small frame,
  import-gated because the plotting stack is optional (this image has
  no matplotlib; the frame stage is fully tested without it).

``roc_plot`` / ``det_plot`` (reference plots.py:377-519) consume
classifier statistics — already tiny after
:func:`traval_spark.comparison.with_classifier_stats` — so they are
driver-side renders with the reference's signatures; ``det_plot``'s
probit axes use a pure-numpy inverse normal CDF (Acklam's rational
approximation) because scipy is likewise optional.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from traval_spark.functions.ts import SID, TS

#: reference plots.py:11-18 — default category styling
DEFAULT_COLOR_DICT = {
    "only_in_s1": {"color": "orange"},
    "only_in_s2": {"color": "blue"},
    "identical": {"color": "LimeGreen", "alpha": 0.5},
    "different": {"color": "Red", "alpha": 0.3},
    "flagged_in_both": {"color": "DarkOrchid"},
    "introduced": {"color": "Coral"},
}


def _require_matplotlib(what: str):
    try:
        import matplotlib.pyplot as plt
    except ImportError as e:  # pragma: no cover - matplotlib not in image
        raise ImportError(
            f"{what} needs matplotlib (pip install matplotlib); the "
            "*_frame() twin returns the plot data without rendering"
        ) from e
    return plt


def _thin(one: DataFrame, keep: Column, max_points: int) -> pd.DataFrame:
    """Collect one series' rows: ALL rows matching ``keep`` plus a
    deterministic stride sample of the rest, bounded by ~max_points
    (plans/viz.py:overview_frame pattern — thinning runs BEFORE
    toPandas, so driver cost is O(max_points + kept)."""
    w = Window.orderBy(TS)  # single series by construction
    cnt = one.count()
    stride = max(1, -(-cnt // max_points))  # ceil
    thinned = (
        one.withColumn("__rn", F.row_number().over(w))
        .filter(keep | (F.col("__rn") % stride == 0))
        .drop("__rn")
    )
    return thinned.toPandas().sort_values(TS).reset_index(drop=True)


def series_comparison_frame(
    cmp: DataFrame, series_id: str, max_points: int = 5000
) -> pd.DataFrame:
    """Driver frame behind :func:`plot_series_comparison`.

    Input: the output of :func:`traval_spark.comparison.compare_series`.
    Keeps every row in a non-bulk category (unique/different — the
    marks); thins only ``in_both_identical``/``in_both_nan`` rows.
    Columns: ts, v1, v2, category.
    """
    one = cmp.filter(F.col(SID) == series_id).select(
        TS, "v1", "v2", "category"
    )
    keep = F.col("category").isin("in_s1", "in_s2", "in_both_different")
    return _thin(one, keep, max_points)


def relative_comparison_frame(
    rel: DataFrame, series_id: str, max_points: int = 5000
) -> pd.DataFrame:
    """Driver frame behind :func:`plot_relative_comparison` /
    :func:`plot_validation_result`.

    Input: the output of
    :func:`traval_spark.comparison.compare_series_relative`. Keeps every
    flagged/introduced/unique row; thins only kept_in_both bulk.
    Columns: ts, v1, v2, vb, category, rel_category.
    """
    one = rel.filter(F.col(SID) == series_id).select(
        TS, "v1", "v2", "vb", "category", "rel_category"
    )
    keep = ~F.coalesce(
        F.col("rel_category").isin("kept_in_both", "in_all_nan"),
        F.lit(False),
    ) | F.col("category").isin("in_s1", "in_s2", "in_both_different")
    return _thin(one, keep, max_points)


class ComparisonPlots:
    """Reference API parity shim (plots.py:8-58): holds a comparison
    DataFrame + series id, carries the mutable ``color_dict``, and
    delegates the three plot methods to the module-level functions."""

    def __init__(self, cmp: DataFrame, series_id: str,
                 max_points: int = 5000):
        self.cmp = cmp
        self.series_id = series_id
        self.max_points = max_points
        self.reset_color_dict()

    def update_color_dict(self, key, color=None, alpha=None):
        """plots.py:31-47 — tweak one category's style."""
        d = self.color_dict[key]
        if color is not None:
            d.update({"color": color})
        if alpha is not None:
            d.update({"alpha": alpha})

    def reset_color_dict(self):
        """plots.py:49-58 — restore the defaults."""
        self.color_dict = {k: dict(v) for k, v in DEFAULT_COLOR_DICT.items()}

    def plot_series_comparison(self, **kw):
        kw.setdefault("color_dict", self.color_dict)
        kw.setdefault("max_points", self.max_points)
        return plot_series_comparison(self.cmp, self.series_id, **kw)

    def plot_relative_comparison(self, **kw):
        kw.setdefault("color_dict", self.color_dict)
        kw.setdefault("max_points", self.max_points)
        return plot_relative_comparison(self.cmp, self.series_id, **kw)

    def plot_validation_result(self, **kw):
        kw.setdefault("max_points", self.max_points)
        return plot_validation_result(self.cmp, self.series_id, **kw)


def _plot_series_comparison_pdf(
    pdf: pd.DataFrame, mark_unique, mark_different, mark_identical,
    ax, color_dict, s1_name="series 1", s2_name="series 2",
):
    plt = _require_matplotlib("plot_series_comparison")
    if ax is None:
        fig, ax = plt.subplots(1, 1, figsize=(12, 5))
    else:
        fig = ax.figure
    cd = color_dict or DEFAULT_COLOR_DICT
    handles = []
    diff = pdf["category"] == "in_both_different"
    for col, name, c, ls in (("v1", s1_name, "gray", "solid"),
                             ("v2", s2_name, "k", "dashed")):
        (p1,) = ax.plot(pdf[TS], pdf[col], c=c, ls=ls, label=name)
        handles.append(p1)
        if mark_different:
            (p2,) = ax.plot(pdf[TS], pdf[col].where(diff), lw=3, ls="solid",
                            label="different", **cd["different"])
    if mark_different:
        handles.append(p2)
    if mark_identical:
        ident = pdf["category"] == "in_both_identical"
        (p5,) = ax.plot(pdf[TS], pdf["v1"].where(ident), ls="solid", lw=3,
                        label="identical", **cd["identical"])
        handles.append(p5)
    if mark_unique:
        for cat, col, key, lbl in (
            ("in_s1", "v1", "only_in_s1", f"only in series 1: {s1_name}"),
            ("in_s2", "v2", "only_in_s2", f"only in series 2: {s2_name}"),
        ):
            sub = pdf[pdf["category"] == cat]
            if len(sub):
                (p,) = ax.plot(sub[TS], sub[col], marker="x", ms=5,
                               ls="none", label=lbl, **cd[key])
                handles.append(p)
    ax.legend(handles, [h.get_label() for h in handles], loc=(0, 1),
              frameon=False, ncol=max(len(handles), 5))
    ax.grid(True)
    fig.tight_layout()
    return ax


def plot_series_comparison(
    cmp: DataFrame,
    series_id: str,
    mark_unique: bool = True,
    mark_different: bool = True,
    mark_identical: bool = True,
    ax=None,
    max_points: int = 5000,
    color_dict: dict | None = None,
):
    """Two-series comparison plot (reference plots.py:60-166): both
    series as lines, differences fat-red, identical stretches fat-green,
    unique observations as X markers."""
    pdf = series_comparison_frame(cmp, series_id, max_points=max_points)
    return _plot_series_comparison_pdf(
        pdf, mark_unique, mark_different, mark_identical, ax, color_dict
    )


def plot_relative_comparison(
    rel: DataFrame,
    series_id: str,
    mark_unique: bool = True,
    mark_different: bool = True,
    mark_identical: bool = True,
    mark_introduced: bool = False,
    ax=None,
    max_points: int = 5000,
    color_dict: dict | None = None,
):
    """Relative comparison plot (reference plots.py:168-273): the
    pairwise comparison plus the base series as a thin black line,
    flagged-in-both X markers, optionally introduced-point markers."""
    pdf = relative_comparison_frame(rel, series_id, max_points=max_points)
    cd = color_dict or DEFAULT_COLOR_DICT
    ax = _plot_series_comparison_pdf(
        pdf, mark_unique, mark_different, mark_identical, ax, cd
    )
    handles, labels = ax.get_legend_handles_labels()
    # dedup legend entries (plots.py:204-209)
    for lbl in list(labels):
        if labels.count(lbl) > 1:
            i = labels.index(lbl)
            labels.pop(i)
            handles.pop(i)
    (p0,) = ax.plot(pdf[TS], pdf["vb"], lw=0.5, c="k", label="base series",
                    ls="solid", zorder=2)
    handles.insert(0, p0)
    labels.insert(0, p0.get_label())
    both = pdf[pdf["rel_category"] == "flagged_in_both"]
    if len(both):
        (p6,) = ax.plot(both[TS], both["vb"], lw=0.5, ls="none", marker="x",
                        ms=5, label="flagged in both",
                        **cd["flagged_in_both"])
        handles.append(p6)
        labels.append(p6.get_label())
    if mark_introduced:
        intro1 = pdf[pdf["rel_category"] == "introduced_in_s1"]
        intro2 = pdf[pdf["rel_category"].isin(
            ["introduced_in_s2", "introduced_in_both"])]
        if len(intro1) or len(intro2):
            ax.plot(intro1[TS], intro1["v1"], ls="none", marker="x", ms=5,
                    label="introduced in s1/s2", **cd["introduced"])
            (p7,) = ax.plot(intro2[TS], intro2["v2"], ls="none", marker="x",
                            ms=5, label="introduced in s1/s2",
                            **cd["introduced"])
            handles.append(p7)
            labels.append(p7.get_label())
    ax.legend(handles, labels, loc=(0, 1), ncol=max(len(handles), 5))
    return ax


#: validation marker colors (reference plots.py:296-301): category -> color
VALIDATION_COLORS = {
    "flagged_in_both": ("Green", "Correctly flagged (TP)"),
    "flagged_in_s1": ("DarkOrange", "Incorrectly flagged (FP)"),
    "flagged_in_s2": ("Red", "Wrongly kept (FN)"),
}


def plot_validation_result(
    rel: DataFrame, series_id: str, ax=None, max_points: int = 5000
):
    """Validation result plot (reference plots.py:275-374): the base
    series with open circles colored green/orange/red at TP/FP/FN
    points (evaluated on the base values)."""
    plt = _require_matplotlib("plot_validation_result")
    pdf = relative_comparison_frame(rel, series_id, max_points=max_points)
    ms_valid, mew = 6, 1.25
    if ax is None:
        fig, ax = plt.subplots(1, 1, figsize=(12, 5))
    else:
        fig = ax.figure
    handles = []
    (p0,) = ax.plot(pdf[TS], pdf["vb"], lw=0.5, c="k", marker=".", ms=3,
                    label="base series", ls="solid")
    handles.append(p0)
    colors = pdf["rel_category"].map(
        {k: v[0] for k, v in VALIDATION_COLORS.items()}
    )
    mask = colors.notna()
    sc = ax.scatter(pdf.loc[mask, TS], pdf.loc[mask, "vb"],
                    c=colors[mask].to_numpy(), s=ms_valid**2,
                    linewidths=mew, marker="o",
                    edgecolor=colors[mask].to_numpy(), zorder=10)
    sc.set_facecolor("none")
    for color, label in VALIDATION_COLORS.values():
        (dummy,) = ax.plot([], [], c=color, marker="o", mfc="none", mew=mew,
                           ls="none", ms=ms_valid, label=label)
        handles.append(dummy)
    ax.legend(handles, [h.get_label() for h in handles], loc=(0, 1),
              markerscale=1.25, ncol=len(handles), frameon=False)
    ax.grid(True)
    fig.tight_layout()
    return ax


def roc_plot(
    tpr,
    fpr,
    labels,
    colors=None,
    ax=None,
    plot_diagonal: bool = True,
    colorbar_label: str | None = None,
    **kwargs,
):
    """Receiver-operator-characteristic plot (reference plots.py:377-453):
    FPR on x, TPR on y, one scatter per entry, optional random-guess
    diagonal and colorbar. tpr/fpr/labels follow the reference's
    value-or-array-or-list convention; feed them from
    :func:`traval_spark.comparison.with_classifier_stats` columns."""
    plt = _require_matplotlib("roc_plot")
    if not isinstance(tpr, list):
        tpr = [tpr]
    if not isinstance(fpr, list):
        fpr = [fpr]
    if not isinstance(labels, list):
        labels = [labels]
    if ax is None:
        fig, ax = plt.subplots(1, 1, figsize=(10, 8))
    else:
        fig = ax.figure
    ax.set_aspect("equal")
    if plot_diagonal:
        ax.plot([0, 1], [0, 1], ls="dashed", lw=1.0, c="k",
                label="random guess")
    sc = None
    for itpr, ifpr, ilbl in zip(tpr, fpr, labels):
        sc = ax.scatter(ifpr, itpr, s=6**2, c=colors, marker="o",
                        label=ilbl, **kwargs)
    ax.set_xlim(0, 1)
    ax.set_ylim(0, 1)
    ax.grid(True)
    ax.legend(loc=(0, 1), frameon=False)
    ax.set_ylabel("True Positive Rate (sensitivity)")
    ax.set_xlabel("False Positive Rate (1-specificity)")
    ax.set_title("receiver operator characteristic plot")
    if colors is not None and sc is not None:
        from mpl_toolkits.axes_grid1 import make_axes_locatable

        divider = make_axes_locatable(ax)
        cax = divider.append_axes("right", "5%", pad="3%")
        cbar = fig.colorbar(sc, cax=cax)
        if colorbar_label is not None:
            cbar.set_label(colorbar_label)
    fig.tight_layout()
    return ax


def norm_ppf(q):
    """Inverse standard-normal CDF (probit), pure numpy.

    Acklam's rational approximation (published algorithm, |rel err| <
    1.15e-9 over (0, 1)) — stands in for scipy.stats.norm.ppf on the
    det_plot probit axes so scipy stays an optional dependency.
    """
    q = np.asarray(q, dtype=np.float64)
    a = (-3.969683028665376e+01, 2.209460984245205e+02,
         -2.759285104469687e+02, 1.383577518672690e+02,
         -3.066479806614716e+01, 2.506628277459239e+00)
    b = (-5.447609879822406e+01, 1.615858368580409e+02,
         -1.556989798598866e+02, 6.680131188771972e+01,
         -1.328068155288572e+01)
    c = (-7.784894002430293e-03, -3.223964580411365e-01,
         -2.400758277161838e+00, -2.549732539343734e+00,
         4.374664141464968e+00, 2.938163982698783e+00)
    d = (7.784695709041462e-03, 3.224671290700398e-01,
         2.445134137142996e+00, 3.754408661907416e+00)
    plow, phigh = 0.02425, 1 - 0.02425
    out = np.full(q.shape, np.nan)
    lo = (q > 0) & (q < plow)
    hi = (q > phigh) & (q < 1)
    mid = (q >= plow) & (q <= phigh)
    if lo.any():
        u = np.sqrt(-2 * np.log(q[lo]))
        out[lo] = (((((c[0] * u + c[1]) * u + c[2]) * u + c[3]) * u + c[4])
                   * u + c[5]) / ((((d[0] * u + d[1]) * u + d[2]) * u
                                   + d[3]) * u + 1)
    if hi.any():
        u = np.sqrt(-2 * np.log(1 - q[hi]))
        out[hi] = -(((((c[0] * u + c[1]) * u + c[2]) * u + c[3]) * u + c[4])
                    * u + c[5]) / ((((d[0] * u + d[1]) * u + d[2]) * u
                                    + d[3]) * u + 1)
    if mid.any():
        u = q[mid] - 0.5
        r = u * u
        out[mid] = (((((a[0] * r + a[1]) * r + a[2]) * r + a[3]) * r + a[4])
                    * r + a[5]) * u / (((((b[0] * r + b[1]) * r + b[2]) * r
                                         + b[3]) * r + b[4]) * r + 1)
    out[q == 0] = -np.inf
    out[q == 1] = np.inf
    return out if out.shape else float(out)


def det_plot(fpr, fnr, labels, ax=None, **kwargs):
    """Detection-error-tradeoff plot (reference plots.py:456-519):
    probit-scaled FPR vs FNR, percent tick labels."""
    plt = _require_matplotlib("det_plot")
    if not isinstance(fpr, list):
        fpr = [fpr]
    if not isinstance(fnr, list):
        fnr = [fnr]
    if not isinstance(labels, list):
        labels = [labels]
    if ax is None:
        _, ax = plt.subplots(1, 1, figsize=(10, 8))
    ax.set_aspect("equal")
    for ifpr, ifnr, ilbl in zip(fpr, fnr, labels):
        ax.plot(norm_ppf(ifpr), norm_ppf(ifnr), marker="o", ls="none",
                label=ilbl, **kwargs)
    ax.set(xlabel="False Positive Rate", ylabel="False Negative Rate")
    ticks = [0.001, 0.01, 0.05, 0.20, 0.5, 0.80, 0.95, 0.99, 0.999]
    tick_locations = norm_ppf(ticks)
    tick_labels = [
        "{:.0%}".format(s) if (100 * s).is_integer() else "{:.1%}".format(s)
        for s in ticks
    ]
    ax.set_xticks(tick_locations)
    ax.set_xticklabels(tick_labels)
    ax.set_xlim(-3, 3)
    ax.set_yticks(tick_locations)
    ax.set_yticklabels(tick_labels)
    ax.set_ylim(-3, 3)
    ax.grid(True)
    ax.set_title("detection error tradeoff plot")
    return ax
