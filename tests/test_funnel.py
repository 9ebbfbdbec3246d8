"""Funnel + cohort-retention tests on hand-built event streams."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from traval_spark.operators.funnel import (
    cohort_retention,
    funnel_counts,
    funnel_depth,
)

STEPS = ["a", "b", "c"]


@pytest.fixture(scope="module")
def ev(spark):
    rows = [
        # u1 completes in order (with noise between)
        (1, "a", "2024-01-01 10:00:00"), (1, "x", "2024-01-01 10:30:00"),
        (1, "b", "2024-01-01 11:00:00"), (1, "c", "2024-01-01 12:00:00"),
        # u2 does b before a: only 'a' counts (strict order)
        (2, "b", "2024-01-01 09:00:00"), (2, "a", "2024-01-01 10:00:00"),
        # u3 reaches b, c never comes; c BEFORE b must not count
        (3, "c", "2024-01-01 08:00:00"), (3, "a", "2024-01-01 09:00:00"),
        (3, "b", "2024-01-01 10:00:00"),
        # u4 only noise
        (4, "x", "2024-01-01 10:00:00"),
        # u5: simultaneous a and b at the same ts -> step order wins
        (5, "b", "2024-01-01 10:00:00"), (5, "a", "2024-01-01 10:00:00"),
    ]
    return spark.createDataFrame(
        rows, "user_id bigint, event_type string, ts string"
    ).withColumn("ts", F.col("ts").cast("timestamp_ntz"))


def test_funnel_depth_strict_order(spark, ev):
    got = {r["user"]: r["depth"] for r in funnel_depth(ev, STEPS).collect()}
    assert got == {1: 3, 2: 1, 3: 2, 5: 2}


def test_funnel_counts(spark, ev):
    got = {r["step"]: r["n_users"] for r in funnel_counts(ev, STEPS).collect()}
    assert got == {1: 4, 2: 3, 3: 1}


def test_cohort_retention_triangle(spark):
    rows = [
        (1, "2024-01-01 10:00:00"), (1, "2024-01-02 10:00:00"),
        (1, "2024-01-02 11:00:00"),  # same day twice -> one user-day
        (2, "2024-01-01 10:00:00"), (2, "2024-01-03 10:00:00"),
        (3, "2024-01-02 10:00:00"),
    ]
    ev = spark.createDataFrame(rows, "user_id bigint, ts string") \
        .withColumn("ts", F.col("ts").cast("timestamp_ntz"))
    got = {(str(r["cohort_day"]), r["offset_days"]): r["n_users"]
           for r in cohort_retention(ev).collect()}
    assert got == {
        ("2024-01-01", 0): 2, ("2024-01-01", 1): 1, ("2024-01-01", 2): 1,
        ("2024-01-02", 0): 1,
    }
