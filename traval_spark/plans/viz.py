"""Detector overview plotting (reference detector.py:539-587).

The reference's ``plot_overview`` draws one axis per ruleset step: the
step's series as a line plus red X markers at the points that step
flagged (evaluated at the BASE series' values, detector.py:574-581).

On a fleet-sized long frame the naive approach — collect the series and
plot — ships millions of rows to the driver, so this module splits the
operator in two:

- :func:`overview_frame` (distributed): one job that selects ONE
  series from the wide step table, derives per-step flag booleans, and
  thins the non-flagged rows to ``max_points`` with a deterministic
  stride BEFORE ``toPandas`` (flagged rows are never dropped — they are
  the signal the plot exists to show).
- :func:`plot_overview` (driver): matplotlib rendering of that small
  frame, import-gated because the plotting stack is optional (the
  sandbox image has no matplotlib; the data-prep stage is fully tested
  without it).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from traval_spark.functions.ts import SID, TS


def overview_frame(
    detector, series_id: str, max_points: int = 5000
) -> pd.DataFrame:
    """Small driver-side frame backing one series' overview plot.

    Columns: ``ts``, ``step_0..step_n`` (the per-step series) and
    ``flag_1..flag_n`` (True where step k newly NULLed a point that
    survived step k-1 — the reference's ``self.corrections[k]`` index,
    detector.py:572).

    Rows are thinned to ~``max_points``: every flagged row is kept,
    the rest keep every ceil(n/max_points)-th row by per-series
    row_number — deterministic, and executed BEFORE collect so the
    driver cost is O(max_points + flags), not O(series length).
    """
    res = detector._require_results()
    n = len(detector.ruleset.rules)
    steps = [f"step_{k}" for k in range(n + 1)]
    one = res.filter(F.col(SID) == series_id).select(TS, *steps)

    flags = []
    for k in range(1, n + 1):
        one = one.withColumn(
            f"flag_{k}",
            F.col(f"step_{k - 1}").isNotNull() & F.col(f"step_{k}").isNull(),
        )
        flags.append(f"flag_{k}")
    any_flag = F.lit(False)
    for c in flags:
        any_flag = any_flag | F.col(c)

    w = Window.orderBy(TS)  # single series: one partition by construction
    cnt = one.count()
    stride = max(1, -(-cnt // max_points))  # ceil
    thinned = (
        one.withColumn("__rn", F.row_number().over(w))
        .filter(any_flag | (F.col("__rn") % stride == 0))
        .drop("__rn")
    )
    pdf = thinned.toPandas().sort_values(TS).reset_index(drop=True)
    return pdf


def plot_overview(
    detector,
    series_id: str,
    mark_suspects: bool = True,
    max_points: int = 5000,
    figsize=(12, 5),
    **kwargs,
):
    """Plot the series with flagged values per applied rule
    (detector.py:539-587): one shared-x/shared-y axis per step, the
    step's series as a line, and — when ``mark_suspects`` — red X at
    each step's flagged timestamps evaluated on the base series.

    Requires matplotlib (optional dependency); raises ImportError with
    an actionable message when absent. Returns the axes array.
    """
    try:
        import matplotlib.pyplot as plt
    except ImportError as e:  # pragma: no cover - matplotlib not in image
        raise ImportError(
            "plot_overview needs matplotlib (pip install matplotlib); "
            "use overview_frame() for the plot data without rendering"
        ) from e

    pdf = overview_frame(detector, series_id, max_points=max_points)
    n = len(detector.ruleset.rules)
    fig, axes = plt.subplots(
        n + 1, 1, sharex=True, sharey=True, figsize=figsize, **kwargs
    )
    for k, ax in enumerate(axes):
        ax.plot(pdf[TS], pdf[f"step_{k}"],
                label=detector.ruleset.get_step_name(k))
        if mark_suspects and k != 0:
            flagged = pdf[pdf[f"flag_{k}"]]
            ax.plot(flagged[TS], flagged["step_0"], marker="x", c="C3",
                    ls="none", label="flagged")
        ax.legend(loc="upper left", ncol=2)
        ax.grid(True)
    fig.tight_layout()
    return axes
