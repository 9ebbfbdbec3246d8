"""Mergeable distinct sketches: exact-under-k KMV, DataSketches HLL."""

import numpy as np
import pyspark.sql.functions as F
import pytest

from traval_spark.sketch import (
    distinct_cascade,
    distinct_counts,
    distinct_tier,
    hll_agg,
    hll_estimate,
    kmv_agg,
    kmv_estimate,
)


@pytest.fixture(scope="module")
def raw(spark):
    # 20k rows over 2 sources x ~3h; key cardinality per minute-bucket is
    # small (exact regime), per-day large enough to exercise the merge.
    return spark.range(0, 20_000).select(
        F.format_string("src_%d", (F.col("id") % 2)).alias("source"),
        (F.to_timestamp_ntz(F.lit("2024-01-01"))
         + F.make_dt_interval(F.lit(0), F.lit(0), F.lit(0),
                              (F.col("id") % 10_000).cast("double"))
         ).alias("ts"),
        F.pmod(F.xxhash64("id"), F.lit(500)).alias("user_id"),
    )


def test_kmv_exact_under_k(spark, raw):
    got = distinct_counts(distinct_tier(raw, "1m", "user_id", k=256))
    exact = raw.groupBy(
        "source",
        F.date_trunc("minute", "ts").cast("timestamp_ntz").alias("bucket"),
    ).agg(F.countDistinct("user_id").alias("n_exact"))
    joined = got.join(exact, ["source", "bucket"])
    assert joined.filter(F.col("n_distinct") != F.col("n_exact")).count() == 0


def test_kmv_cascade_equals_direct(spark, raw):
    """1m -> 1h merged sketches == sketching raw straight at 1h."""
    via_merge = distinct_cascade(distinct_tier(raw, "1m", "user_id"), "1h")
    direct = distinct_tier(raw, "1h", "user_id")
    j = via_merge.join(
        direct.select("source", "bucket", F.col("kmv").alias("kmv2")),
        ["source", "bucket"],
    )
    assert j.filter(F.col("kmv") != F.col("kmv2")).count() == 0


def test_kmv_estimator_beyond_k(spark):
    """Past k the (k-1)/U(k) estimator holds to a few percent."""
    n = 50_000
    df = spark.range(n).select(F.lit("s").alias("g"),
                               F.col("id").alias("v"))
    est = df.groupBy("g").agg(
        kmv_estimate(kmv_agg("v", 1024), 1024).alias("e")).first()["e"]
    assert abs(est - n) / n < 0.10


def test_kmv_null_excluded(spark):
    df = spark.range(10).select(
        F.lit("g").alias("g"),
        F.when(F.col("id") < 3, F.col("id")).alias("v"),
    )
    est = df.groupBy("g").agg(
        kmv_estimate(kmv_agg("v", 16), 16).alias("e")).first()["e"]
    assert est == 3  # NULLs don't count, matching COUNT(DISTINCT v)


def test_hll_sparse_exact_and_cascade(spark, raw):
    # ~500 distinct per (source, hour): lgk=14 keeps the sketch in the
    # exact sparse regime (lgk=12 promotes to estimating HLL mode ~400).
    got = distinct_counts(
        distinct_cascade(
            distinct_tier(raw, "1m", "user_id", method="hll", lgk=14),
            "1h", method="hll"),
        method="hll")
    exact = raw.groupBy(
        "source",
        F.date_trunc("hour", "ts").cast("timestamp_ntz").alias("bucket"),
    ).agg(F.countDistinct("user_id").alias("n_exact"))
    j = got.join(exact, ["source", "bucket"])
    assert j.filter(F.col("n_distinct") != F.col("n_exact")).count() == 0


def test_hll_large_group_bounded_error(spark):
    n = 200_000
    df = spark.range(n).select(F.lit("g").alias("g"), F.col("id").alias("v"))
    est = df.groupBy("g").agg(
        hll_estimate(hll_agg("v", 12)).alias("e")).first()["e"]
    assert abs(est - n) / n < 0.05


def test_distinct_token_ids_over_payload(spark):
    """The tokens payload composes with the sketch tiers: explode the
    array once, sketch distinct token ids per (source, bucket), cascade
    — exact vs COUNT(DISTINCT) while under k."""
    from traval_spark.sources.synth import synth_sequences

    from traval_spark.sketch import (
        distinct_cascade, distinct_counts, distinct_tier,
    )

    seqs = synth_sequences(spark, 800, seed=3, span_days=1)
    tok = seqs.select("source", "ts", F.explode("tokens").alias("tok"))
    got = distinct_counts(
        distinct_cascade(distinct_tier(tok, "1m", "tok", k=65536),
                         "1h", k=65536),
        k=65536)
    exact = tok.groupBy(
        "source",
        F.date_trunc("hour", "ts").cast("timestamp_ntz").alias("bucket"),
    ).agg(F.countDistinct("tok").alias("n_exact"))
    j = got.join(exact, ["source", "bucket"])
    assert j.filter(F.col("n_distinct") != F.col("n_exact")).count() == 0


def test_cms_merge_invariance_and_bounds(spark):
    """Count-min tiers: the 1h tier merged from 1m cells equals the grid
    built directly at 1h (lossless groupBy-sum composition), and every
    point estimate upper-bounds the true count — the one-sided CMS
    guarantee (collisions can only inflate a cell, never drain it)."""
    from traval_spark.sketch import cms_cascade, cms_point, cms_tier

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    src = ev.select(F.col("event_type").alias("source"), "ts", "user_id")

    t1m = cms_tier(src, "1m", "user_id", depth=4, width=256)
    merged = cms_cascade(t1m, "1h")
    direct = cms_tier(src, "1h", "user_id", depth=4, width=256)
    assert merged.exceptAll(direct).count() == 0
    assert direct.exceptAll(merged).count() == 0

    keys = ["1", "7", "13"]
    est = {(r["source"], r["bucket"], r["key"]): r["est"]
           for r in cms_point(merged, keys, depth=4, width=256).collect()}
    truth = {(r["source"], r["bucket"], str(r["user_id"])): r["n"]
             for r in src.groupBy(
                 "source",
                 F.date_trunc("hour", "ts").cast("timestamp_ntz")
                 .alias("bucket"),
                 "user_id")
             .agg(F.count(F.lit(1)).alias("n")).collect()
             if str(r["user_id"]) in keys}
    # every true count is covered and never underestimated
    for k, n in truth.items():
        assert k in est and est[k] >= n, (k, n, est.get(k))


def test_bloom_merge_invariance_and_membership(spark):
    """Bloom tiers: the 1h filter merged from 1m set bits equals the
    filter built directly at 1h (lossless set-OR composition), every key
    that truly occurred probes present=1 (no false negatives), and a
    key definitely absent from the data probes absent under these
    parameters."""
    from traval_spark.sketch import bloom_cascade, bloom_probe, bloom_tier

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    src = ev.select(F.col("event_type").alias("source"), "ts", "user_id")

    t1m = bloom_tier(src, "1m", "user_id", nhash=4, nbits=4096)
    merged = bloom_cascade(t1m, "1h")
    direct = bloom_tier(src, "1h", "user_id", nhash=4, nbits=4096)
    assert merged.exceptAll(direct).count() == 0
    assert direct.exceptAll(merged).count() == 0

    keys = ["1", "7", "13"]
    got = {(r["source"], r["bucket"], r["key"]): r["present"]
           for r in bloom_probe(merged, keys, nhash=4, nbits=4096)
           .collect()}
    truth = {(r["source"], r["bucket"], str(r["user_id"]))
             for r in src.filter(F.col("user_id").cast("string")
                                 .isin(keys))
             .select("source",
                     F.date_trunc("hour", "ts").cast("timestamp_ntz")
                     .alias("bucket"), "user_id").distinct().collect()}
    for k in truth:  # one-sided: every true member must probe present
        assert got.get(k) == 1, k
    # an impossible key: user_ids are non-negative ints, so this string
    # never occurs; any present=1 would be a false positive — at
    # n<<nbits the FP rate is ~(n*4/4096)^4, effectively zero here
    absent = bloom_probe(merged, ["no-such-user"], nhash=4, nbits=4096)
    assert absent.filter(F.col("present") == 1).count() == 0


def test_kmv_intersect_exact_and_estimated(spark):
    """Exact while both cardinalities < k (the oracle regime); within
    ~15% at 4x overflow (k=256 → σ≈1/√k≈6%, generous bound for one
    draw)."""
    from traval_spark.sketch import kmv_agg, kmv_intersect_estimate

    # A = 0..149, B = 100..249 -> |A ∩ B| = 50, both < k=256
    df = spark.range(0, 250).select(
        F.when(F.col("id") < 150, F.col("id")).alias("a_key"),
        F.when(F.col("id") >= 100, F.col("id")).alias("b_key"),
    )
    sk = df.agg(kmv_agg("a_key", 256).alias("a"),
                kmv_agg("b_key", 256).alias("b"))
    got = sk.select(
        kmv_intersect_estimate("a", "b", 256).alias("n")).first()["n"]
    assert got == 50

    # overflow regime: |A| = |B| = 1000, overlap 500, k = 256
    df2 = spark.range(0, 1500).select(
        F.when(F.col("id") < 1000, F.col("id")).alias("a_key"),
        F.when(F.col("id") >= 500, F.col("id")).alias("b_key"),
    )
    sk2 = df2.agg(kmv_agg("a_key", 256).alias("a"),
                  kmv_agg("b_key", 256).alias("b"))
    est = sk2.select(
        kmv_intersect_estimate("a", "b", 256).alias("n")).first()["n"]
    assert 350 <= est <= 650, est


def test_sliding_distinct_exact_regime_matches_builtin(spark):
    """Pane-union KMV sliding distinct == the built-in row-replicating
    F.window + countDistinct formulation while windows stay under k
    (the exact regime)."""
    import pandas as pd

    from traval_spark.sketch import sliding_distinct

    rng = np.random.RandomState(5)
    rows = [
        ("s%d" % (i % 2),
         pd.Timestamp("2024-01-01")
         + pd.Timedelta(seconds=int(rng.randint(0, 6 * 3600))),
         int(rng.randint(0, 40)))
        for i in range(2000)
    ]
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["source", "ts", "user_id"])
    )
    got = sliding_distinct(df, window="1h", slide="10m", k=256)
    want = (
        df.groupBy("source", F.window("ts", "1 hour", "10 minutes"))
        .agg(F.countDistinct("user_id").alias("n_distinct"))
        .select("source", F.col("window.start").alias("window_start"),
                "n_distinct")
    )
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0


def test_kmv_difference_exact_regime_and_identity(spark):
    """|A \\ B| from sketches == exact difference under k, and
    |A∩B| + |A\\B| == |A| (the estimator identity on shared terms)."""
    import pandas as pd

    from traval_spark.sketch import (
        kmv_agg,
        kmv_difference_estimate,
        kmv_estimate,
        kmv_intersect_estimate,
    )

    rows = ([("a", i) for i in range(60)]          # A = 0..59
            + [("b", i) for i in range(40, 90)])   # B = 40..89
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["g", "u"]))
    sk = df.groupBy("g").agg(kmv_agg("u", 256).alias("kmv"))
    a = sk.filter(F.col("g") == "a").select(F.col("kmv").alias("ka"))
    b = sk.filter(F.col("g") == "b").select(F.col("kmv").alias("kb"))
    r = a.crossJoin(b).select(
        kmv_difference_estimate("ka", "kb", 256).alias("diff"),
        kmv_intersect_estimate("ka", "kb", 256).alias("inter"),
        kmv_estimate("ka", 256).alias("na"),
    ).collect()[0]
    assert r["diff"] == 40          # 0..39
    assert r["inter"] == 20         # 40..59
    assert r["diff"] + r["inter"] == r["na"]


def test_kmv_overlap_exact_and_estimator_regimes(spark):
    """Exact regime (cardinalities < k): overlap reads equal true set
    arithmetic. Estimator regime (20k-id cohorts, k=256, true jaccard
    1/3): union/intersection within 15% relative error, jaccard within
    0.1 absolute — from the stored sketches alone."""
    import pandas as pd

    from traval_spark.sketch import distinct_tier, kmv_overlap

    def tier_for(ids_a, ids_b, k):
        rows = [("s", pd.Timestamp("2024-01-01 00:00"), i) for i in ids_a]
        rows += [("s", pd.Timestamp("2024-01-02 00:00"), i) for i in ids_b]
        df = spark.createDataFrame(
            pd.DataFrame(rows, columns=["source", "ts", "user_id"]))
        t = distinct_tier(df, "1h", "user_id", k=k, method="kmv")
        return kmv_overlap(
            t, F.col("bucket") < "2024-01-02",
            F.col("bucket") >= "2024-01-02", k=k,
        ).collect()[0]

    r = tier_for(range(100), range(60, 160), k=4096)
    assert (r["n_a_est"], r["n_b_est"]) == (100, 100)
    assert r["union_est"] == 160 and r["inter_est"] == 40
    assert abs(r["jaccard"] - 40 / 160) < 1e-6

    e = tier_for(range(20_000), range(10_000, 30_000), k=256)
    assert abs(e["n_a_est"] - 20_000) / 20_000 < 0.15
    assert abs(e["union_est"] - 30_000) / 30_000 < 0.15
    assert abs(e["inter_est"] - 10_000) / 10_000 < 0.25
    assert abs(e["jaccard"] - 1 / 3) < 0.1
