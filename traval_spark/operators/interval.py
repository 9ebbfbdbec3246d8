"""Scalable temporal interval joins via bucket expansion.

Spark has no native range-join strategy: a plain ``p.ts BETWEEN i.start
AND i.end`` join plans as BroadcastNestedLoopJoin (quadratic work, and
an OOM broadcast once the interval side outgrows the driver).  The
standard scale-out rewrite (the same trick behind Databricks' range-join
hints and interval libraries on Hive) turns the inequality into an
EQUI-join on coarse time buckets:

- every point lands in exactly ONE bucket of width ``granularity_s``;
- every interval is exploded into the buckets it covers
  (``sequence(floor(start/g), floor((end-1)/g))``);
- the bucket equi-join (plus the original predicate as a post-filter)
  produces each qualifying (point, interval) pair EXACTLY once — no
  dedup shuffle — because the point's single bucket is covered once by
  each interval.

For interval×interval overlap the same expansion would emit a pair once
per SHARED bucket; the classic first-common-bucket guard
(``bucket == greatest(floor(l.start/g), floor(r.start/g))``) keeps
exactly one copy, again dedup-free: two overlapping intervals always
share the later of their two start buckets.

Scale properties: work is |points| + Σ ceil(len/g) interval replicas +
join output — linear, shuffle-partitioned by (keys, bucket), so time
spreads across the cluster instead of one nested-loop task.  Choose
``granularity_s`` near the MEDIAN interval length: too small explodes
long intervals, too large makes each bucket a mini cross-join (the
post-filter then discards most candidates).  Hot buckets (a burst
second) are plain join skew — AQE's skew-join split handles them; keys
with pathological bursts can additionally be salted upstream.

Reference note: the traval reference (ArtesiaWater/traval) is
single-series pandas and has no join machinery at all; this module is
part of the from-scratch tier engine surface (BASELINE.json
north_rule), built for event-to-incident-window labeling at corpus
scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from traval_spark.functions.ts import unix_us


def _bucket(col, gus: int):
    return F.floor(unix_us(col) / F.lit(int(gus)))


def _explode_buckets(df: DataFrame, start: str, end: str,
                     gus: int) -> DataFrame:
    """One row per bucket the half-open interval [start, end) covers;
    empty intervals (end <= start) are dropped."""
    b0 = _bucket(F.col(start), gus)
    b1 = F.floor((unix_us(F.col(end)) - 1) / F.lit(int(gus)))
    return (
        df.filter(F.col(end) > F.col(start))
        .withColumn("__b", F.explode(F.sequence(b0, b1)))
    )


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str = "ts",
    start_col: str = "start",
    end_col: str = "end",
    on: tuple[str, ...] = ("source",),
    granularity_s: int = 3600,
) -> DataFrame:
    """Join points to the half-open intervals ``[start, end)`` that
    contain them, as a bucket equi-join (never a nested-loop plan).

    Returns the inner join: every points column plus every intervals
    column (shared ``on`` keys appear once).  Each qualifying (point,
    interval) pair appears exactly once; points inside k overlapping
    intervals appear k times — the relational contract of the
    inequality join this replaces.
    """
    gus = int(granularity_s) * 1_000_000
    iv = _explode_buckets(intervals, start_col, end_col, gus)
    pt = points.withColumn("__b", _bucket(F.col(point_ts), gus))
    return (
        pt.join(iv, [*on, "__b"])
        .filter(
            (F.col(point_ts) >= F.col(start_col))
            & (F.col(point_ts) < F.col(end_col))
        )
        .drop("__b")
    )


def overlap_join(
    left: DataFrame,
    right: DataFrame,
    start_col: str = "start",
    end_col: str = "end",
    on: tuple[str, ...] = ("source",),
    granularity_s: int = 3600,
    suffix: str = "_r",
) -> DataFrame:
    """Pairs of half-open intervals from ``left`` × ``right`` that
    overlap (``l.start < r.end AND r.start < l.end``), as a bucket
    equi-join with the first-common-bucket guard — each overlapping
    pair is emitted EXACTLY once, with no distinct/dedup shuffle.

    Right-side columns that collide with a left column (including
    ``start``/``end``) come back suffixed with ``suffix``.
    """
    gus = int(granularity_s) * 1_000_000
    keys = list(on)
    r = right
    for c in right.columns:
        if c in left.columns and c not in keys:
            r = r.withColumnRenamed(c, c + suffix)
    rs, re_ = start_col + suffix, end_col + suffix
    lv = _explode_buckets(left, start_col, end_col, gus)
    rv = _explode_buckets(r, rs, re_, gus)
    first_common = F.greatest(
        _bucket(F.col(start_col), gus), _bucket(F.col(rs), gus)
    )
    return (
        lv.join(rv, keys + ["__b"])
        .filter(
            (F.col(start_col) < F.col(re_))
            & (F.col(rs) < F.col(end_col))
            & (F.col("__b") == first_common)
        )
        .drop("__b")
    )


def merge_intervals(
    intervals: DataFrame,
    start_col: str = "start",
    end_col: str = "end",
    on: tuple[str, ...] = ("source",),
) -> DataFrame:
    """Consolidate overlapping/touching half-open intervals per key
    into their union — the classic sweep every ops pipeline needs
    (downtime windows from per-check outages, session spans from
    per-request leases, maintenance-window coalescing) and the
    missing third member of this module next to the two interval
    JOINS: join answers "what hits this interval", merge answers
    "what IS the covered region".

    Sweep as ONE ordered window pass, no self-join: with intervals
    sorted by (start, end), an interval opens a NEW merged group iff
    its start exceeds the running maximum end of every earlier
    interval (touching intervals [a,b) + [b,c) merge — the half-open
    union is contiguous); the group id is the running sum of those
    open flags, then one groupBy(key, group) takes min(start) /
    max(end).  All comparisons run on exact epoch-microsecond longs
    (unix_us — TIMESTAMP_NTZ-safe), so group boundaries are
    engine-identical with no float anywhere.

    NULL-bounded or inverted rows (end <= start) are dropped — they
    cover nothing and would poison the running max.

    Plan shape for 100 TB: one shuffle by ``on`` for the window sort,
    one partial-aggregatable groupBy — per-key interval counts are
    ops-scale (checks, sessions), not corpus-scale; a pathologically
    hot key serializes only ITS OWN intervals (disclosed, the
    standard window trade).

    Output: ``*on, start, end, n_merged`` (merged spans; the final
    groupBy provides no output ordering guarantee — order with
    ``.orderBy(*on, "start")`` if presentation needs it).

    Reference: traval's rule_keep_comments consolidates flagged
    PERIODS by eye (docs suggest plotting); this is that
    consolidation as an exact operator.
    """
    w = Window.partitionBy(*on).orderBy("__s", "__e")
    prior = (
        Window.partitionBy(*on).orderBy("__s", "__e")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    iv = (
        intervals.filter(
            F.col(start_col).isNotNull() & F.col(end_col).isNotNull()
        )
        .select(
            *on,
            unix_us(F.col(start_col)).alias("__s"),
            unix_us(F.col(end_col)).alias("__e"),
            F.col(start_col).alias("__st"),
            F.col(end_col).alias("__et"),
        )
        .filter(F.col("__e") > F.col("__s"))
    )
    grp = (
        iv.withColumn("__mx", F.max("__e").over(prior))
        .withColumn(
            "__new",
            (F.col("__mx").isNull()
             | (F.col("__s") > F.col("__mx"))).cast("int"),
        )
        .withColumn(
            "__g",
            F.sum("__new").over(
                w.rowsBetween(Window.unboundedPreceding, 0)),
        )
    )
    return (
        grp.groupBy(*on, "__g")
        .agg(
            F.min("__st").alias("start"),
            F.max("__et").alias("end"),
            F.count(F.lit(1)).cast("long").alias("n_merged"),
        )
        .drop("__g")
    )
