"""Distributed time-series alignment primitives.

These re-express the reference's explicit Python loops
(/root/reference/traval/ts_utils.py:234-287, 368-388) as pure window/join
formulations: the loops become ``last(..., ignorenulls)`` /
``first(..., ignorenulls)`` over per-series ordered windows, so they scale
to arbitrarily many series with exactly one shuffle on ``series_id`` and
never collect to the driver.

Long-frame convention used across the engine (SURVEY.md §1.1):

- ``series_id`` string — one reference ``pd.Series`` per id
- ``ts`` timestamp — tz-naive (session TZ pinned to UTC)
- one or more double value columns

A *flagged* value is a present row with NULL value; a true gap is an
absent row (SURVEY.md §1.4 — load-bearing for comparison semantics).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

SID = "series_id"
TS = "ts"

#: microseconds per second — window range frames operate on unix micros
US = 1_000_000


def gap_micros(max_gap: str) -> int:
    """Parse a pandas-style frequency string ("7D", "1s") to microseconds."""
    return int(pd.Timedelta(max_gap).total_seconds() * US)


def unix_us(col: Column | str) -> Column:
    """Epoch microseconds of a timestamp column, NTZ-safe.

    Parquet sources deliver TIMESTAMP_NTZ (the reference's tz-naive model);
    ``unix_micros`` only accepts TIMESTAMP, so cast first — value-preserving
    because the session timezone is pinned to UTC (session.py).
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.unix_micros(c.cast("timestamp"))


def with_unix_micros(df: DataFrame, col: str = TS, out: str = "__us") -> DataFrame:
    """Add an integer unix-microseconds column for range-frame windows."""
    return df.withColumn(out, unix_us(col))


def ensure_ntz(df: DataFrame, col: str = TS) -> DataFrame:
    """Canonicalize the ts column to TIMESTAMP_NTZ.

    The engine's timestamps are tz-naive like the reference's
    (ruleset.py:66-67 strips tz on load); parquet scans already deliver NTZ,
    while pandas-built frames arrive as TIMESTAMP — normalizing at every
    join/union boundary keeps plans analyzable and joins key-compatible.
    Lossless: the session timezone is pinned to UTC.
    """
    return df.withColumn(col, F.col(col).cast("timestamp_ntz"))


def series_window() -> Window:
    """Per-series ordered window: the engine's canonical window spec.

    All window rules share this spec so Catalyst plans them in a single
    Window physical node over one exchange+sort on ``series_id``.
    """
    return Window.partitionBy(SID).orderBy(TS)


def diff_with_gap_awareness(
    df: DataFrame, in_col: str, max_gap: str = "7D"
) -> Column:
    """First difference with NULL where the gap to the previous obs > max_gap.

    Re-expresses /root/reference/traval/ts_utils.py:264-287 (``series.diff()``
    followed by a Python loop NaN-ing post-gap diffs) as lag expressions.
    """
    w = series_window()
    lag_v = F.lag(F.col(in_col)).over(w)
    lag_ts = F.lag(F.col(TS)).over(w)
    diff = F.col(in_col) - lag_v
    gap_us = gap_micros(max_gap)
    too_far = (unix_us(TS) - unix_us(lag_ts)) > F.lit(gap_us)
    return F.when(too_far, F.lit(None).cast("double")).otherwise(diff)


def _tag_union(df: DataFrame, aux: DataFrame, aux_col: str) -> DataFrame:
    """Union main rows (tagged 1) with aux series rows (tagged 0).

    The aux frame must have columns (series_id, ts, <value>); it carries the
    sparse threshold/bound/manual-obs series. Only (sid, ts) of the main
    frame is needed — extra columns are joined back by the callers.
    """
    main = (
        ensure_ntz(df).select(SID, TS)
        .withColumn("__is_main", F.lit(1))
        .withColumn("__aux", F.lit(None).cast("double"))
    )
    side = ensure_ntz(aux).select(
        F.col(SID),
        F.col(TS),
        F.lit(0).alias("__is_main"),
        F.col(aux_col).cast("double").alias("__aux"),
    )
    return main.unionByName(side)


def align_resample_ffill_bfill(
    df: DataFrame, aux: DataFrame, aux_col: str, out: str
) -> DataFrame:
    """Resample a sparse aux series onto the main series index.

    Semantics of /root/reference/traval/ts_utils.py:234-261
    (``resample_short_series_to_long_series``): each short value lands on the
    first main timestamp >= its own; later shorts overwrite earlier ones at
    the same landing spot; then ffill, then bfill. That reduces exactly to:

    - forward value at a main row = last aux value with aux_ts <= ts
    - rows before any aux get the first main row's forward value (bfill
      computed over *main rows only* — an aux row's own value is not a
      valid bfill source because a later aux may overwrite its landing).

    Returns the main df with a new double column ``out``. Distributed: one
    union + two ordered windows per series; no driver loop.
    """
    df = ensure_ntz(df)
    u = _tag_union(df, aux, aux_col)
    # aux rows sort before main rows at equal ts => equal-ts aux is visible
    w_fwd = (
        Window.partitionBy(SID)
        .orderBy(TS, "__is_main")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    u = u.withColumn("__fwd", F.last("__aux", ignorenulls=True).over(w_fwd))
    main = u.filter(F.col("__is_main") == 1)
    w_bwd = (
        Window.partitionBy(SID)
        .orderBy(TS)
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    main = main.withColumn(out, F.first("__fwd", ignorenulls=True).over(w_bwd))
    return df.join(main.select(SID, TS, out), on=[SID, TS], how="left")


def align_interpolate(
    df: DataFrame, aux: DataFrame, aux_col: str, out: str
) -> DataFrame:
    """Linearly interpolate a sparse aux series to the main index.

    Semantics of /root/reference/traval/ts_utils.py:368-388
    (``np.interp`` on int64-ns index with left=right=NaN): NULL strictly
    outside the aux hull, exact aux value at coinciding timestamps, linear
    in time between the surrounding aux points.
    """
    df = ensure_ntz(df)
    u = _tag_union(df, aux, aux_col)
    u = u.withColumn("__usec", unix_us(TS).cast("double"))
    aux_us = F.when(F.col("__is_main") == 0, F.col("__usec"))

    # previous aux at <= ts (aux first at ties)
    w_prev = (
        Window.partitionBy(SID)
        .orderBy(TS, "__is_main")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # next aux at >= ts (main first at ties, so equal-ts aux is "next")
    w_next = (
        Window.partitionBy(SID)
        .orderBy(TS, F.col("__is_main").desc())
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    u = (
        u.withColumn("__pv", F.last("__aux", ignorenulls=True).over(w_prev))
        .withColumn("__pt", F.last(aux_us, ignorenulls=True).over(w_prev))
        .withColumn("__nv", F.first("__aux", ignorenulls=True).over(w_next))
        .withColumn("__nt", F.first(aux_us, ignorenulls=True).over(w_next))
    )
    t = F.col("__usec")
    interp = F.when(t == F.col("__pt"), F.col("__pv")).otherwise(
        F.col("__pv")
        + (F.col("__nv") - F.col("__pv"))
        * (t - F.col("__pt"))
        / (F.col("__nt") - F.col("__pt"))
    )
    # outside the hull either prev or next is missing -> NULL (np.interp
    # left=right=NaN); NULL arithmetic already propagates, the when() guards
    # the division-by-zero at exact hits only.
    u = u.withColumn(out, interp)
    main = u.filter(F.col("__is_main") == 1).select(SID, TS, out)
    return df.join(main, on=[SID, TS], how="left")
