"""Z-order clustering + bucketed tables (sources/layout.py)."""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from traval_spark.sources.layout import (
    file_ranges,
    write_bucketed,
    write_zordered,
    zorder_key,
)


def _interleave_py(x: int, y: int, bits: int) -> int:
    z = 0
    for b in range(bits):
        z |= ((x >> b) & 1) << (2 * b)
        z |= ((y >> b) & 1) << (2 * b + 1)
    return z


def test_zorder_key_matches_reference_bit_interleave(spark):
    rng = np.random.RandomState(3)
    pdf = pd.DataFrame({
        "x": rng.randint(0, 1 << 16, 200),
        "y": rng.randint(0, 1 << 16, 200),
    })
    got = (
        spark.createDataFrame(pdf)
        .select("x", "y", zorder_key(["x", "y"]).alias("z"))
        .collect()
    )
    for r in got:
        assert r["z"] == _interleave_py(r["x"], r["y"], 16)


def test_zorder_key_clamps_out_of_range(spark):
    pdf = pd.DataFrame({"x": [-5, 1 << 20], "y": [0, 0]})
    got = spark.createDataFrame(pdf).select(
        zorder_key(["x", "y"], bits=8).alias("z")
    ).collect()
    assert got[0]["z"] == _interleave_py(0, 0, 8)
    assert got[1]["z"] == _interleave_py(255, 0, 8)


def test_zordered_layout_prunes_both_axes(spark, tmp_path):
    """Uniform 64x64 grid, 16 files: an x-sorted layout leaves every
    file spanning the FULL y range (no pruning on y); the z-ordered
    layout gives every file a small rectangle — extents shrink on BOTH
    axes, which is the entire point of the curve."""
    rng = np.random.RandomState(9)
    pdf = pd.DataFrame({
        "x": rng.randint(0, 64, 4096),
        "y": rng.randint(0, 64, 4096),
        "payload": rng.randn(4096),
    })
    df = spark.createDataFrame(pdf)

    xs = str(tmp_path / "xsorted")
    (df.repartitionByRange(16, "x").sortWithinPartitions("x")
       .write.mode("overwrite").parquet(xs))
    zs = str(tmp_path / "zordered")
    write_zordered(df, zs, ["x", "y"], bits=6, n_files=16)

    def mean_extent(path, col):
        rows = file_ranges(spark, path, ["x", "y"]).collect()
        return float(np.mean([r[f"{col}_extent"] for r in rows]))

    assert mean_extent(xs, "y") > 55        # x-sort: y stats useless
    assert mean_extent(zs, "y") < 40        # z-order: y prunes too
    assert mean_extent(zs, "x") < 40        # ... and x still prunes


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    """Both sides written bucketBy(8, k) + sortBy(k): the join plans
    with ZERO shuffle (the co-located-join contract)."""
    a = spark.range(0, 1000).select(
        (F.col("id") % 100).alias("k"), F.col("id").alias("va"))
    b = spark.range(0, 500).select(
        (F.col("id") % 100).alias("k"), F.col("id").alias("vb"))
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        write_bucketed(a, "bt_a", ["k"], 8, str(tmp_path / "a"))
        write_bucketed(b, "bt_b", ["k"], 8, str(tmp_path / "b"))
        # the scenario bucketing exists for is two LARGE sides (neither
        # broadcastable); at test scale force that planner state
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        j = spark.table("bt_a").join(spark.table("bt_b"), "k")
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan
        assert j.count() == 1000 * 5        # 10 va-rows x 5 vb-rows per k
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("drop table if exists bt_a")
        spark.sql("drop table if exists bt_b")


def test_skew_report_flags_the_viral_key(spark):
    """One key holding half the rows: max_share 0.5, suggested salt 16
    (levels it against 32-way parallelism); a uniform key reports
    entropy_norm 1.0 and salt 1."""
    import pandas as pd

    from traval_spark.sources.layout import skew_report

    skewed = spark.createDataFrame(pd.DataFrame({
        "k": ["hot"] * 500 + [f"k{i}" for i in range(500)],
    }))
    r = skew_report(skewed, "k").collect()[0]
    assert r["n_rows"] == 1000 and r["n_keys"] == 501
    assert r["max_share"] == 0.5
    assert r["suggested_salt"] == 16
    assert r["topk_share"] == (500 + 4) / 1000

    uniform = spark.createDataFrame(pd.DataFrame({
        "k": [f"k{i % 8}" for i in range(800)],
    }))
    u = skew_report(uniform, "k").collect()[0]
    assert u["entropy_norm"] == 1.0
    # 8 uniform keys vs 32-way parallelism: each key still wants a
    # 4-way salt to occupy the cluster (the formula is about task
    # granularity, not only pathological skew)
    assert u["suggested_salt"] == 4

    wide = spark.createDataFrame(pd.DataFrame({
        "k": [f"k{i % 64}" for i in range(1280)],
    }))
    assert skew_report(wide, "k").collect()[0]["suggested_salt"] == 1


def test_join_blowup_hand_values(spark):
    """left keys {a:2, b:1}, right {a:3, c:4}: one matched key,
    est_rows 2*3=6, amplification 6/max(3,7)."""
    from traval_spark.sources.layout import join_blowup

    left = spark.createDataFrame(
        [("a",), ("a",), ("b",)], "user_id string")
    right = spark.createDataFrame(
        [("a",)] * 3 + [("c",)] * 4, "user_id string")
    r = join_blowup(left, right, "user_id").collect()[0].asDict()
    assert (r["n_left"], r["n_right"], r["n_keys_matched"]) == (3, 7, 1)
    assert r["est_rows"] == 6.0
    assert r["max_key_product"] == 6.0 and r["max_key"] == "a"
    assert r["amplification"] == round(6 / 7, 6)
