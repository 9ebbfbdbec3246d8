"""Interval-join operator tests: bucket-expansion equi-join equals the
naive inequality join (which Spark can only plan as a nested loop),
exactly-once emission across multi-bucket intervals, and the plan audit
that the rewrite actually removed the nested-loop strategy."""

from __future__ import annotations

from pyspark.sql import functions as F

from traval_spark.operators.interval import interval_join, overlap_join


def _events(spark):
    return spark.read.parquet("/root/testdata/sf0.001/events.parquet")


def _intervals(ev, mod, minutes):
    # deterministic windows long enough to span several 15m buckets
    return ev.filter(F.col("event_id") % mod == 0).select(
        F.col("event_id").alias("iid"),
        F.col("event_type").alias("source"),
        F.col("ts").alias("start"),
        (F.col("ts") + F.make_dt_interval(
            F.lit(0), F.lit(0), F.lit(int(minutes)), F.lit(0.0)
        )).alias("end"),
    )


def test_interval_join_matches_naive(spark):
    """Bucket rewrite == the raw inequality join, row for row — with a
    15m granularity so the 2h windows span 8+ buckets (the exactly-once
    property is load-bearing, not vacuous)."""
    ev = _events(spark)
    iv = _intervals(ev, 37, 120)
    pts = ev.select(F.col("event_type").alias("source"), "ts", "event_id")

    got = interval_join(pts, iv, granularity_s=900).select(
        "iid", "event_id")
    naive = pts.alias("p").join(
        iv.alias("i"),
        (F.col("p.source") == F.col("i.source"))
        & (F.col("p.ts") >= F.col("i.start"))
        & (F.col("p.ts") < F.col("i.end")),
    ).select("iid", "event_id")
    assert got.exceptAll(naive).count() == 0
    assert naive.exceptAll(got).count() == 0
    assert got.count() == got.distinct().count()  # exactly-once


def test_interval_join_plan_has_no_nested_loop(spark):
    ev = _events(spark)
    iv = _intervals(ev, 37, 120)
    pts = ev.select(F.col("event_type").alias("source"), "ts", "event_id")
    plan = interval_join(pts, iv)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_overlap_join_matches_naive_and_emits_once(spark):
    ev = _events(spark)
    a = _intervals(ev, 23, 120).withColumnRenamed("iid", "aid")
    b = _intervals(ev, 29, 90).withColumnRenamed("iid", "bid")

    got = overlap_join(a, b, granularity_s=900).select("aid", "bid")
    naive = a.alias("l").join(
        b.alias("r"),
        (F.col("l.source") == F.col("r.source"))
        & (F.col("l.start") < F.col("r.end"))
        & (F.col("r.start") < F.col("l.end")),
    ).select("aid", "bid")
    assert got.exceptAll(naive).count() == 0
    assert naive.exceptAll(got).count() == 0
    assert got.count() == got.distinct().count()

    plan = overlap_join(a, b)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan


def test_interval_join_empty_and_boundary(spark):
    """Half-open semantics: a point exactly at start matches, exactly at
    end does not; empty (end <= start) intervals match nothing."""
    pts = spark.createDataFrame(
        [("s", "2024-01-01 10:00:00"), ("s", "2024-01-01 12:00:00")],
        "source string, ts string",
    ).withColumn("ts", F.col("ts").cast("timestamp_ntz"))
    iv = spark.createDataFrame(
        [("s", "i1", "2024-01-01 10:00:00", "2024-01-01 12:00:00"),
         ("s", "i0", "2024-01-01 11:00:00", "2024-01-01 11:00:00")],
        "source string, iid string, start string, end string",
    ).withColumn("start", F.col("start").cast("timestamp_ntz")) \
     .withColumn("end", F.col("end").cast("timestamp_ntz"))
    got = interval_join(pts, iv, granularity_s=3600).collect()
    assert [(r["iid"], str(r["ts"])) for r in got] == [
        ("i1", "2024-01-01 10:00:00")]


def test_merge_intervals_sweep_semantics(spark):
    """Overlap merges, touching (half-open) merges, a gap splits,
    containment absorbs, inverted/NULL rows drop, and keys never
    mix."""
    import pandas as pd

    from traval_spark.operators.interval import merge_intervals

    T = pd.Timestamp
    rows = [
        # key a: [0,10) + [5,12) overlap; [12,15) touches -> one span
        ("a", T("2024-01-01 00:00:00"), T("2024-01-01 00:00:10")),
        ("a", T("2024-01-01 00:00:05"), T("2024-01-01 00:00:12")),
        ("a", T("2024-01-01 00:00:12"), T("2024-01-01 00:00:15")),
        # gap -> second span; [20,40) contains [25,30)
        ("a", T("2024-01-01 00:00:20"), T("2024-01-01 00:00:40")),
        ("a", T("2024-01-01 00:00:25"), T("2024-01-01 00:00:30")),
        # inverted and NULL rows: dropped
        ("a", T("2024-01-01 00:00:50"), T("2024-01-01 00:00:50")),
        ("a", None, T("2024-01-01 00:00:55")),
        # key b: its own single span
        ("b", T("2024-01-01 00:00:00"), T("2024-01-01 00:00:03")),
    ]
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["source", "start", "end"]))
    out = sorted(
        ((r["source"], str(r["start"]), str(r["end"]), r["n_merged"])
         for r in merge_intervals(df).collect())
    )
    assert out == [
        ("a", "2024-01-01 00:00:00", "2024-01-01 00:00:15", 3),
        ("a", "2024-01-01 00:00:20", "2024-01-01 00:00:40", 2),
        ("b", "2024-01-01 00:00:00", "2024-01-01 00:00:03", 1),
    ]
