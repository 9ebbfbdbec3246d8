"""Exact histogram tiers: merge identity + quantile_disc semantics."""

import numpy as np
import pyspark.sql.functions as F
import pytest

from traval_spark.hist import hist_cascade, hist_quantiles, hist_tier


@pytest.fixture(scope="module")
def raw(spark):
    return spark.range(0, 8_000).select(
        F.format_string("src_%d", (F.col("id") % 2)).alias("source"),
        (F.to_timestamp_ntz(F.lit("2024-01-01"))
         + F.make_dt_interval(F.lit(0), F.lit(0), F.lit(0),
                              (F.col("id") % 7_000).cast("double"))
         ).alias("ts"),
        F.when(F.col("id") % 37 != 0,
               F.pmod(F.xxhash64("id"), F.lit(1_000)).cast("double"))
        .alias("n_tok"),
    )


def test_hist_cascade_identity(spark, raw):
    merged = hist_cascade(hist_tier(raw, "1m"), "1h")
    direct = hist_tier(raw, "1h")
    assert merged.exceptAll(direct).count() == 0
    assert direct.exceptAll(merged).count() == 0


def test_quantiles_match_rank_rule(spark, raw):
    got = hist_quantiles(hist_cascade(hist_tier(raw, "1m"), "1h"),
                         qs=[0.5, 0.95]).toPandas()
    rows = raw.filter(F.col("n_tok").isNotNull()).select(
        "source",
        F.date_trunc("hour", "ts").cast("timestamp_ntz").alias("bucket"),
        "n_tok").toPandas()
    for (src, bkt), grp in rows.groupby(["source", "bucket"]):
        vals = np.sort(grp["n_tok"].to_numpy())
        n = len(vals)
        exp = {q: vals[max(1, int(np.ceil(q * n))) - 1]
               for q in (0.5, 0.95)}
        r = got[(got["source"] == src) & (got["bucket"] == bkt)].iloc[0]
        assert r["p50"] == exp[0.5] and r["p95"] == exp[0.95], (src, bkt)


def test_null_values_dropped(spark, raw):
    h = hist_tier(raw, "1d")
    total = h.agg(F.sum("cnt")).first()[0]
    assert total == raw.filter(F.col("n_tok").isNotNull()).count()


def test_token_heavy_hitters_tier_merge_invariant(spark):
    """Top-k token ids from the 1m->1h histogram cascade equal top-k
    computed directly at 1h from raw — the tier is exact for heavy
    hitters because the token domain is vocab-bounded (no sketch)."""
    from traval_spark.hist import hist_cascade, hist_tier, hist_topk
    from traval_spark.sources.synth import synth_sequences

    seqs = synth_sequences(spark, 1500, seed=17, span_days=1)
    tok = seqs.select("source", "ts", F.explode("tokens").alias("tok"))
    cascaded = hist_cascade(hist_tier(tok, "1m", value_col="tok"), "1h")
    direct = hist_tier(tok, "1h", value_col="tok")
    got = hist_topk(cascaded, k=5)
    want = hist_topk(direct, k=5)
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0
    # k bounds the per-bucket result
    assert got.groupBy("source", "bucket").count().filter(
        F.col("count") > 5).count() == 0


def test_dds_quantiles_relative_error_and_merge_invariance(spark):
    """DDSketch tier: p50/p95 estimates are within the alpha relative-
    error bound of the exact quantiles, and the 1m->1h cascade equals
    the direct 1h tier (merging never moves bins)."""
    from traval_spark.hist import dds_cascade, dds_quantiles, dds_tier

    # lognormal-ish positive values + some negatives and zeros
    raw = spark.range(0, 20_000).select(
        F.format_string("s_%d", F.col("id") % 2).alias("source"),
        (F.to_timestamp_ntz(F.lit("2024-01-01")) + F.make_dt_interval(
            F.lit(0), F.lit(0), (F.col("id") % 90).cast("double"), F.lit(0.0)
        )).alias("ts"),
        F.when(F.col("id") % 50 == 0, F.lit(0.0))
        .when(F.col("id") % 7 == 0,
              -F.exp(F.pmod(F.xxhash64("id"), F.lit(1000)) / 200.0))
        .otherwise(F.exp(F.pmod(F.xxhash64("id"), F.lit(1000)) / 150.0))
        .alias("value"),
    )
    alpha = 0.05
    t1m = dds_tier(raw, "1m", value_col="value", alpha=alpha)
    t1h = dds_cascade(t1m, "1h")
    direct = dds_tier(raw, "1h", value_col="value", alpha=alpha)
    assert t1h.exceptAll(direct).count() == 0
    assert direct.exceptAll(t1h).count() == 0

    est = {(r["source"], r["bucket"]): (r["p50"], r["p95"])
           for r in dds_quantiles(t1h, [0.5, 0.95], alpha=alpha).collect()}
    exact = {
        (r["source"], r["bucket"]): (r["q50"], r["q95"])
        for r in raw.groupBy(
            "source", F.date_trunc("hour", "ts").alias("bucket")
        ).agg(
            F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY value)")
            .alias("q50"),
            F.expr("percentile_disc(0.95) WITHIN GROUP (ORDER BY value)")
            .alias("q95"),
        ).collect()
    }
    assert est.keys() == exact.keys()
    for key, (e50, e95) in est.items():
        x50, x95 = exact[key]
        assert abs(e50 - x50) <= alpha * abs(x50) + 1e-9, (key, e50, x50)
        assert abs(e95 - x95) <= alpha * abs(x95) + 1e-9, (key, e95, x95)


def test_dds_quantiles_small_magnitudes_keep_relative_error(spark):
    """Regression: fixed-dp rounding of the estimate would return 0.0
    for micro-scale values (100% error); significant-digit rounding must
    keep the alpha guarantee at every magnitude."""
    from traval_spark.hist import dds_quantiles, dds_tier

    raw = spark.range(0, 4_000).select(
        F.lit("s").alias("source"),
        F.to_timestamp_ntz(F.lit("2024-01-01")).alias("ts"),
        ((F.pmod(F.xxhash64("id"), F.lit(900)) + 100) / 1e9).alias("value"),
    )
    alpha = 0.05
    est = dds_quantiles(dds_tier(raw, "1h", value_col="value", alpha=alpha),
                        [0.5], alpha=alpha).collect()[0]["p50"]
    exact = raw.agg(
        F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY value)")
    ).collect()[0][0]
    assert exact > 0
    assert abs(est - exact) <= alpha * exact, (est, exact)


def test_sliding_hist_quantiles_hand_case(spark):
    """Two 10m panes, 1h/10m sliding: the window containing both panes
    sees the merged histogram; single-pane windows see their own."""
    import pandas as pd

    from traval_spark.hist import sliding_hist_quantiles

    t0 = pd.Timestamp("2024-01-01")
    rows = [("a", t0 + pd.Timedelta(minutes=m), v) for m, v in
            [(0, 1.0), (1, 2.0), (2, 3.0),        # pane 0
             (10, 10.0), (11, 11.0)]]             # pane 1
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["source", "ts", "n_tok"])
    )
    out = {
        r["window_start"]: r
        for r in sliding_hist_quantiles(
            df, window="1h", slide="10m", qs=[0.5], scale=1
        ).collect()
    }
    # window starting at t0 covers both panes: values 1,2,3,10,11
    assert out[t0]["p50"] == 3.0
    # window starting at t0+10m covers only pane 1
    assert out[t0 + pd.Timedelta(minutes=10)]["p50"] == 10.0
    # the earliest window [t0-50m, t0+10m) ends before pane 1: only
    # pane 0 contributes -> p50 of {1,2,3} = 2
    assert out[t0 - pd.Timedelta(minutes=50)]["p50"] == 2.0
    # windows exist iff they contain an observation: 6 + 6 distinct
    # starts minus the 2-pane overlap
    assert len(out) == 7


def test_percentile_ranks_no_single_partition_window(spark):
    """Equal to cume_dist (tie semantics included) with the only
    ordered pass running over the distinct-value frame, and raw rows
    taking a broadcast join."""
    import pandas as pd

    from pyspark.sql import Window as W

    from traval_spark.hist import percentile_ranks

    pdf = pd.DataFrame({"id": range(400), "v": [i % 17 for i in range(400)]})
    df = spark.createDataFrame(pdf)
    got = percentile_ranks(df, "v").select("id", "v", "prank")
    want = df.withColumn("prank", F.cume_dist().over(W.orderBy("v")))
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_trimmed_mean_hand_case_and_cascade(spark, raw):
    import datetime as dt

    from traval_spark.hist import hist_trimmed_mean

    # hand case: values 1..10 in one bucket, alpha=0.2 -> drop 2 each
    # side -> mean(3..8) = 5.5
    t0 = dt.datetime(2024, 1, 1)
    df = spark.createDataFrame(
        [("s", t0, float(v)) for v in range(1, 11)],
        "source string, ts timestamp, n_tok double",
    )
    got = hist_trimmed_mean(hist_tier(df, "1h"), alpha=0.2).collect()
    assert len(got) == 1
    assert got[0]["n"] == 10 and got[0]["trimmed_mean"] == 5.5
    # repeated values straddling the cut exercise the partial-bin path:
    # [1,1,1,1,9,9,9,9], alpha=0.25 -> drop 2 each side -> mean = 5.0
    df2 = spark.createDataFrame(
        [("s", t0, float(v)) for v in [1, 1, 1, 1, 9, 9, 9, 9]],
        "source string, ts timestamp, n_tok double",
    )
    got2 = hist_trimmed_mean(hist_tier(df2, "1h"), alpha=0.25).collect()
    assert got2[0]["trimmed_mean"] == 5.0
    # the read composes through the cascade: 1m->1h tier == direct 1h
    a = hist_trimmed_mean(hist_cascade(hist_tier(raw, "1m"), "1h"))
    b = hist_trimmed_mean(hist_tier(raw, "1h"))
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_dds_rank_gamma_sandwich_and_cascade(spark, raw):
    from traval_spark.hist import dds_cascade, dds_rank, dds_tier

    alpha = 0.05
    g = (1 + alpha) / (1 - alpha)
    v = 137.0
    t1h = dds_cascade(
        dds_tier(raw.withColumnRenamed("n_tok", "value"), "1m",
                 value_col="value", alpha=alpha), "1h")
    got = {(r["source"], r["bucket"]): r["frac_le"]
           for r in dds_rank(t1h, v, alpha=alpha).collect()}
    # every value outside v's own bin is counted exactly, so the read
    # is sandwiched by the exact ranks one gamma away on either side
    exact = raw.filter(F.col("n_tok").isNotNull()).groupBy(
        "source", F.date_trunc("hour", "ts").alias("bucket")
    ).agg(
        (F.sum(F.when(F.col("n_tok") <= v / g, 1).otherwise(0))
         / F.count(F.lit(1))).alias("lo"),
        (F.sum(F.when(F.col("n_tok") <= v * g, 1).otherwise(0))
         / F.count(F.lit(1))).alias("hi"),
    ).collect()
    assert exact
    for r in exact:
        fl = got[(r["source"], r["bucket"])]
        assert r["lo"] - 1e-9 <= fl <= r["hi"] + 1e-9
    # the read composes through the cascade
    direct = dds_rank(
        dds_tier(raw.withColumnRenamed("n_tok", "value"), "1h",
                 value_col="value", alpha=alpha), v, alpha=alpha)
    j = dds_rank(t1h, v, alpha=alpha).alias("a").join(
        direct.alias("b"), ["source", "bucket"])
    assert j.filter(F.col("a.frac_le") != F.col("b.frac_le")).count() == 0


def test_hist_mad_hand_values(spark):
    """Values [1,2,3,4,100] in one bucket: median = rank-3 value = 3,
    deviations [2,1,0,1,97] -> sorted [0,1,1,2,97], MAD = rank-3 = 1 —
    the 100 outlier moves neither statistic."""
    from traval_spark.hist import hist_mad, hist_tier

    rows = [("a", "2024-01-01 00:00:%02d" % i, float(v))
            for i, v in enumerate([1, 2, 3, 4, 100])]
    df = spark.createDataFrame(rows, "source string, ts string, n_tok double") \
        .withColumn("ts", F.to_timestamp_ntz("ts"))
    out = hist_mad(hist_tier(df, "1h"), scale=1).collect()
    assert len(out) == 1
    r = out[0].asDict()
    assert (r["n"], r["median"], r["mad"]) == (5, 3.0, 1.0)


def test_hist_mad_composes_through_cascade(spark, raw):
    """med/MAD read off the 1m->1h cascaded tier == read off the
    direct 1h leaf (the deviation fold is a function of tier state
    only, so the read composes through any coarsening)."""
    from traval_spark.hist import hist_cascade, hist_mad

    merged = hist_mad(hist_cascade(hist_tier(raw, "1m"), "1h"))
    direct = hist_mad(hist_tier(raw, "1h"))
    assert merged.exceptAll(direct).count() == 0
    assert direct.exceptAll(merged).count() == 0


def test_robust_outliers_flags_and_degenerate_mad(spark):
    """Bucket A [10..14, 100]: med 12, MAD 1 -> only the 100 flagged
    (dev 88 > 3). Bucket B is >50% one value -> MAD 0: every
    off-median point flagged (the disclosed degenerate regime)."""
    from traval_spark.hist import hist_tier, robust_outliers

    rows = [("a", "2024-01-01 00:00:%02d" % i, float(v), i)
            for i, v in enumerate([10, 11, 12, 13, 14, 100])]
    rows += [("a", "2024-01-01 01:00:%02d" % i, float(v), 100 + i)
             for i, v in enumerate([5, 5, 5, 5, 9])]
    df = spark.createDataFrame(
        rows, "source string, ts string, value double, event_id long"
    ).withColumn("ts", F.to_timestamp_ntz("ts"))
    tier = hist_tier(df.withColumnRenamed("value", "n_tok"), "1h",
                     value_col="n_tok")
    got = {r["event_id"]: r for r in
           robust_outliers(df, tier, tier="1h", k=3.0).collect()}
    assert set(got) == {5, 104}
    assert got[5]["median"] == 12.0 and got[5]["mad"] == 1.0
    assert got[5]["robust_dev"] == 88.0
    assert got[104]["mad"] == 0.0  # degenerate regime: 9 != med 5


def test_hist_quantile_drift_hand_and_cascade_served(spark):
    """Period A values 1..10 (p50=5), period B 11..20 (p50=15): drift
    +10 at every quantile; serving from the COARSENED tier (1m->1h
    cascade) is identical — counts add, the rank pick can't move."""
    import pandas as pd

    from traval_spark.hist import (
        hist_cascade,
        hist_quantile_drift,
        hist_tier,
    )

    rows = []
    for i in range(1, 11):
        rows.append(("s", pd.Timestamp("2024-01-01 00:00:30")
                     + pd.Timedelta(minutes=i), float(i)))
    for i in range(11, 21):
        rows.append(("s", pd.Timestamp("2024-01-02 00:00:30")
                     + pd.Timedelta(minutes=i), float(i)))
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["source", "ts", "n_tok"]))
    t1m = hist_tier(df, "1m", scale=1)
    args = (F.col("bucket") < "2024-01-02",
            F.col("bucket") >= "2024-01-02")
    r = hist_quantile_drift(t1m, *args, qs=(0.5, 0.95)).collect()[0]
    assert (r["p50_a"], r["p50_b"], r["d_p50"]) == (5.0, 15.0, 10.0)
    assert (r["p95_a"], r["p95_b"], r["d_p95"]) == (10.0, 20.0, 10.0)
    t1h = hist_cascade(t1m, "1h")
    r2 = hist_quantile_drift(t1h, *args, qs=(0.5, 0.95)).collect()[0]
    assert r.asDict() == r2.asDict()


def test_topk_churn_hand_case(spark):
    """Day 1 top-3 {1,2,3}; day 2 counts rank {1,4,5} (bin 6 misses the
    cut) -> added {4,5}, dropped {2,3}, jaccard 1/5; first bucket
    reports NULLs."""
    from pyspark.sql import functions as F

    from traval_spark.hist import topk_churn

    h = spark.createDataFrame(
        [("s", "2024-01-01 00:00:00", 1, 10),
         ("s", "2024-01-01 00:00:00", 2, 9),
         ("s", "2024-01-01 00:00:00", 3, 8),
         ("s", "2024-01-02 00:00:00", 1, 10),
         ("s", "2024-01-02 00:00:00", 4, 9),
         ("s", "2024-01-02 00:00:00", 5, 8),
         ("s", "2024-01-02 00:00:00", 6, 1)],
        "source string, bucket string, bin long, cnt long",
    ).withColumn("bucket", F.to_timestamp_ntz("bucket"))
    rows = topk_churn(h, k=3).orderBy("bucket").collect()
    first, second = rows
    assert first["k_eff"] == 3
    assert first["n_added"] is None and first["jaccard"] is None
    assert second["prev_bucket"] == first["bucket"]
    assert second["n_added"] == 2 and second["n_dropped"] == 2
    assert second["jaccard"] == 0.2


def test_topk_churn_tie_break_matches_hist_topk(spark):
    """Count ties resolve bin-ascending (the hist_topk rule), so the
    sets — and hence the churn — are deterministic: bins 7 and 8 tie at
    cnt 5; k=2 keeps {1,7} both days -> jaccard 1."""
    from pyspark.sql import functions as F

    from traval_spark.hist import topk_churn

    h = spark.createDataFrame(
        [("s", "2024-01-01 00:00:00", 1, 9),
         ("s", "2024-01-01 00:00:00", 7, 5),
         ("s", "2024-01-01 00:00:00", 8, 5),
         ("s", "2024-01-02 00:00:00", 1, 9),
         ("s", "2024-01-02 00:00:00", 7, 5),
         ("s", "2024-01-02 00:00:00", 8, 5)],
        "source string, bucket string, bin long, cnt long",
    ).withColumn("bucket", F.to_timestamp_ntz("bucket"))
    rows = topk_churn(h, k=2).orderBy("bucket").collect()
    assert rows[1]["n_added"] == 0 and rows[1]["n_dropped"] == 0
    assert rows[1]["jaccard"] == 1.0
