"""Ordered-event funnel and cohort-retention analytics over the events
stream — the product-analytics reads a tier engine serves next to its
rollups (sessionize already lives in rollup.py:session_rollup).

Both operators are one-or-two-shuffle aggregations with no windows over
raw history:

- **funnel**: per-user strict-order step matching as a pure-JVM fold
  over the user's time-sorted step events — state is a single int (the
  deepest step reached so far), advanced when the next event matches
  step depth+1.  One groupBy(user) shuffle; the collect_list per user is
  bounded by that user's STEP events only (non-step types are filtered
  before the shuffle).  Pathological single users with millions of step
  events would need pre-capping; typical funnels are short.
- **cohort retention**: classic triangle — cohort = first active day,
  cell = distinct users from that cohort active ``offset`` days later.
  distinct (user, day) collapses map-side first, so the join and the
  final count shuffle rows bounded by user-days, not raw events.

Reference note: the traval reference (ArtesiaWater/traval) has no event
analytics; this extends the tier engine's read surface (SURVEY.md §2
events-table operators) like the sessionizer before it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def funnel_depth(
    events: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Per-user funnel depth: (user, depth) where depth is the number of
    ``steps`` completed IN ORDER (strict-order funnel: a step-2 event
    only counts after a step-1 event has occurred, each match consumes
    the position).  Ties at the same timestamp resolve in step order —
    deterministic, and the kindest reading of simultaneous events.
    Users with no step events get no row."""
    idx = F.lit(None).cast("int")
    for i, s in enumerate(reversed(steps)):
        idx = F.when(
            F.col(type_col) == F.lit(s), F.lit(len(steps) - i)
        ).otherwise(idx)
    stepped = (
        events.filter(
            F.col(type_col).isin(list(steps))
            & F.col(user_col).isNotNull()
        )
        .select(
            F.col(user_col).alias("user"),
            F.struct(F.col(ts_col).alias("ts"), idx.alias("idx"))
            .alias("__e"),
        )
    )
    evs = F.array_sort(F.collect_list("__e"))
    depth = F.aggregate(
        F.transform(evs, lambda s: s["idx"]),
        F.lit(0),
        lambda acc, x: F.when(x == acc + 1, acc + 1).otherwise(acc),
    )
    return stepped.groupBy("user").agg(depth.alias("depth"))


def funnel_counts(
    events: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Funnel summary: (step, n_users) with n_users = users whose
    strict-order depth reached at least that 1-based step."""
    d = funnel_depth(events, steps, user_col, type_col, ts_col)
    return (
        d.filter(F.col("depth") >= 1)
        .select(F.explode(
            F.sequence(F.lit(1), F.col("depth"))).alias("step"))
        .groupBy("step")
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


def cohort_retention(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Cohort-retention triangle: (cohort_day, offset_days, n_users) —
    users whose FIRST active day is cohort_day and who were active again
    ``offset_days`` later (offset 0 = cohort size).  All counts are over
    distinct (user, day) activity, collapsed map-side before any join."""
    days = (
        events.filter(F.col(user_col).isNotNull())
        .select(
            F.col(user_col).alias("user"),
            F.date_trunc("day", F.col(ts_col)).cast("date").alias("day"),
        )
        .distinct()
    )
    first = days.groupBy("user").agg(F.min("day").alias("cohort_day"))
    return (
        days.join(first, ["user"])
        .groupBy(
            "cohort_day",
            F.datediff(F.col("day"), F.col("cohort_day"))
            .alias("offset_days"),
        )
        .agg(F.count(F.lit(1)).alias("n_users"))
    )
