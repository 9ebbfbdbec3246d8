"""M4 + fixed-anchor LTTB downsampling (operators/downsample.py)."""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from traval_spark.operators.downsample import (
    lttb_downsample,
    m4_downsample,
    m4_merge,
)


def _frame(spark, rows):
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["source", "ts", "value"])
    )


def _t(sec):
    return pd.Timestamp("2024-01-01") + pd.Timedelta(seconds=sec)


def test_m4_tie_rules_hand_computed(spark):
    """All four tie rules from the module docstring on one bucket."""
    rows = [
        ("a", _t(0), 5.0), ("a", _t(0), 3.0),      # first instant: min v
        ("a", _t(10), 1.0), ("a", _t(20), 1.0),    # min: earliest instant
        ("a", _t(30), 9.0), ("a", _t(40), 9.0),    # max: latest instant
        ("a", _t(50), 2.0), ("a", _t(50), 7.0),    # last instant: max v
    ]
    out = m4_downsample(_frame(spark, rows), bucket="1h").collect()
    assert len(out) == 1
    r = out[0].asDict()
    assert r["n_points"] == 8
    assert (r["t_first"], r["v_first"]) == (_t(0), 3.0)
    assert (r["t_last"], r["v_last"]) == (_t(50), 7.0)
    assert (r["t_min"], r["v_min"]) == (_t(10), 1.0)
    assert (r["t_max"], r["v_max"]) == (_t(40), 9.0)


def test_m4_merge_cascade_identity(spark):
    """m4_merge(m4(1m), 1h) is bit-identical to m4(1h) on raw — the
    property that lets the 1m M4 tier serve every coarser zoom."""
    rng = np.random.RandomState(7)
    n = 1500
    rows = [
        (
            "s%d" % (i % 3),
            pd.Timestamp("2024-03-01")
            + pd.Timedelta(seconds=int(rng.randint(0, 3 * 86400))),
            float(np.round(rng.uniform(-50, 50), 2)),
        )
        for i in range(n)
    ]
    df = _frame(spark, rows)
    direct = m4_downsample(df, bucket="1h")
    cascaded = m4_merge(m4_downsample(df, bucket="1m"), bucket="1h")
    assert direct.exceptAll(cascaded).count() == 0
    assert cascaded.exceptAll(direct).count() == 0


def test_m4_single_shuffle_plan(spark):
    rows = [("a", _t(i), float(i)) for i in range(50)]
    plan = (
        m4_downsample(_frame(spark, rows), bucket="1m")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Exchange") == 1  # one partial-aggregatable groupBy
    assert "Window" not in plan


def test_lttb_picks_max_triangle_point(spark):
    """3 buckets: endpoints kept, middle bucket picks the spike (the
    point with the largest triangle area against neighbor means)."""
    rows = [
        ("a", _t(0), 0.0),                       # bucket 0 (first)
        ("a", _t(3600 + 600), 0.0),
        ("a", _t(3600 + 1800), 10.0),            # the spike
        ("a", _t(3600 + 3000), 0.0),
        ("a", _t(7200 + 600), 0.0),              # bucket 2 (last)
    ]
    out = {
        r["bucket_start"]: r
        for r in lttb_downsample(
            _frame(spark, rows), bucket="1h"
        ).collect()
    }
    assert len(out) == 3
    assert out[_t(0)]["v_sel"] == 0.0 and out[_t(0)]["t_sel"] == _t(0)
    mid = out[_t(3600)]
    assert (mid["t_sel"], mid["v_sel"]) == (_t(3600 + 1800), 10.0)
    last = out[_t(7200)]
    assert last["t_sel"] == _t(7200 + 600)


def test_lttb_endpoint_rule_first_last(spark):
    """First bucket keeps its FIRST point, last bucket its LAST."""
    rows = [
        ("a", _t(100), 4.0), ("a", _t(200), 9.0),       # first bucket
        ("a", _t(3600 + 10), 1.0), ("a", _t(3600 + 20), 2.0),  # last
    ]
    out = {
        r["bucket_start"]: r
        for r in lttb_downsample(_frame(spark, rows), bucket="1h").collect()
    }
    assert out[_t(0)]["t_sel"] == _t(100)
    assert out[_t(3600)]["t_sel"] == _t(3600 + 20)


def test_lttb_partitioning_invariant(spark):
    """Exact-integer argmax: the selection must not depend on input
    partitioning (a float-mean anchor would make it flip)."""
    rng = np.random.RandomState(11)
    rows = [
        (
            "s%d" % (i % 2),
            pd.Timestamp("2024-03-01")
            + pd.Timedelta(seconds=int(rng.randint(0, 2 * 86400))),
            float(np.round(rng.uniform(0, 100), 2)),
        )
        for i in range(800)
    ]
    df = _frame(spark, rows)
    a = lttb_downsample(df, bucket="6h").collect()
    b = lttb_downsample(df.repartition(7, "value"), bucket="6h").collect()
    key = lambda r: (r["source"], r["bucket_start"])
    assert sorted((key(r), r["t_sel"], r["v_sel"]) for r in a) == sorted(
        (key(r), r["t_sel"], r["v_sel"]) for r in b
    )


def test_lttb_no_per_series_single_task(spark):
    """Raw rows shuffle on (series, bucket), never a whole-series
    window: the only Window nodes run over the bucket-level frame."""
    rows = [("a", _t(i * 60), float(i % 10)) for i in range(600)]
    plan = (
        lttb_downsample(_frame(spark, rows), bucket="1h")
        ._jdf.queryExecution().executedPlan().toString()
    )
    # exactly three Window nodes: anchor lag + lead (separate frames)
    # over the TINY bucket-level frame (one row per bucket) and the
    # per-(source, bucket) argmax — no window ever partitions RAW rows
    # by source alone, so no whole-series single-task sort exists
    assert plan.count("Window") == 3
    # the argmax (the only window over raw rows) is keyed by bucket too
    import re

    specs = re.findall(r"windowspecdefinition\(source#\d+[^)]*", plan)
    assert any("__bus" in s for s in specs)


def test_lttb_from_m4_degrades_to_raw_lttb(spark):
    """When every fine bucket holds exactly one point the M4 tier IS
    the raw series (all four roles collapse to the point), so the
    tier-served LTTB equals raw LTTB exactly; selected points are
    always real raw samples."""
    from traval_spark.operators.downsample import lttb_from_m4

    rng = np.random.default_rng(7)
    rows = [("a", _t(i * 60), float(v))
            for i, v in enumerate(rng.normal(10, 3, 360))]
    df = _frame(spark, rows)
    tier = m4_downsample(df, bucket="1m")
    via_tier = sorted(
        (r["source"], r["bucket_start"], r["n_points"], r["t_sel"],
         r["v_sel"])
        for r in lttb_from_m4(tier, bucket="1h").collect()
    )
    direct = sorted(
        (r["source"], r["bucket_start"], r["n_points"], r["t_sel"],
         r["v_sel"])
        for r in lttb_downsample(df, bucket="1h").collect()
    )
    assert via_tier == direct
    raw = {(ts, v) for _, ts, v in rows}
    assert all((t, v) in raw for _, _, _, t, v in via_tier)


def test_lttb_from_m4_candidate_reduction(spark):
    """Dense buckets: the tier path sees <= 4 candidates per fine
    bucket (n_points in the output counts candidates, disclosed), and
    every selected point is still a real raw sample."""
    from traval_spark.operators.downsample import lttb_from_m4

    rng = np.random.default_rng(11)
    rows = [("a", _t(i * 2), float(v))
            for i, v in enumerate(rng.normal(0, 1, 1800))]  # 1h of 2s pts
    df = _frame(spark, rows)
    tier = m4_downsample(df, bucket="1m")
    got = lttb_from_m4(tier, bucket="10m").collect()
    # 10m buckets over 1h = 6 rows; each sees <= 4 * 10 candidates
    assert len(got) == 6
    assert all(r["n_points"] <= 40 for r in got)
    raw = {(ts, v) for _, ts, v in rows}
    assert all((r["t_sel"], r["v_sel"]) in raw for r in got)


def test_sax_words_hand_symbols_and_null_rule(spark):
    """Series s: 12h of 0 then 12h of 10, mirrored on day 2 -> mu=5,
    sigma=5 exactly, slice z's are -1/+1 -> words 'aadd' then 'ddaa';
    a constant series reports NULL words (z-norm undefined by rule)."""
    import pytest

    from traval_spark.operators.downsample import sax_words

    rows = []
    for day in range(2):
        for h in range(24):
            hot = (h >= 12) if day == 0 else (h < 12)
            n = 10 if hot else 0
            for i in range(n):
                rows.append(("s", pd.Timestamp("2024-01-01")
                             + pd.Timedelta(days=day, hours=h, minutes=i)))
            rows.append(("k", pd.Timestamp("2024-01-01")
                         + pd.Timedelta(days=day, hours=h)))
    df = spark.createDataFrame(pd.DataFrame(rows,
                                            columns=["source", "ts"]))
    # drop the count-0 placeholder trick: 's' hours with n=0 came from
    # the zero-fill spine ('k' rows define the global span)
    out = {(r["g"], str(r["day"])): r for r in sax_words(df).collect()}
    assert out[("s", "2024-01-01")]["word"] == "aadd"
    assert out[("s", "2024-01-02")]["word"] == "ddaa"
    assert out[("s", "2024-01-01")]["n_hours"] == 24
    assert out[("k", "2024-01-01")]["word"] is None
    assert out[("k", "2024-01-02")]["word"] is None
    with pytest.raises(ValueError):
        sax_words(df, segments=5)
    with pytest.raises(ValueError):
        sax_words(df, alphabet=7)


def test_sax_pairs_identical_series_share_one(spark):
    """A clone of s emits identical words every day -> share 1.0 with
    two matching days; the constant series never pairs (NULL words
    dropped before the join)."""
    from traval_spark.operators.downsample import sax_pairs

    rows = []
    for src in ("s", "t"):
        for day in range(2):
            for h in range(24):
                hot = (h >= 12) if day == 0 else (h < 12)
                for i in range(10 if hot else 1):
                    rows.append((src, pd.Timestamp("2024-01-01")
                                 + pd.Timedelta(days=day, hours=h,
                                                minutes=i)))
    for day in range(2):
        for h in range(24):
            rows.append(("k", pd.Timestamp("2024-01-01")
                         + pd.Timedelta(days=day, hours=h)))
    df = spark.createDataFrame(pd.DataFrame(rows,
                                            columns=["source", "ts"]))
    got = sax_pairs(df).collect()
    assert len(got) == 1
    r = got[0]
    assert (r["a"], r["b"]) == ("s", "t")
    assert r["matches"] == 2 and r["days_a"] == 2 and r["days_b"] == 2
    assert r["share"] == 1.0


def _counts(spark, rows):
    return spark.createDataFrame(pd.DataFrame(rows,
                                              columns=["g", "h", "c"]))


def test_subsequence_words_hand_symbols_and_flat_null(spark):
    """72h signal: day0 = 12h of 0 then 12h of 10 (window mu=5,
    sigma=5 exactly -> slice z's -1,-1,+1,+1 -> 'aadd'), day1 flat 5
    (window at h0=24 has zero variance -> NULL word by rule), day2 =
    day0 again."""
    import pytest

    from traval_spark.operators.downsample import subsequence_words

    def c_at(h):
        d, hh = divmod(h, 24)
        return 5 if d == 1 else (0 if hh < 12 else 10)

    cnts = _counts(spark, [("s", h, c_at(h)) for h in range(72)])
    out = {r["h0"]: r for r in
           subsequence_words(counts=cnts, m=24, segments=4).collect()}
    assert len(out) == 49                     # h0 = 0..48 fit fully
    for h0 in (0, 48):
        r = out[h0]
        assert r["word"] == "aadd"
        assert r["n_events"] == 120
        assert r["varnum"] == 24 * 1200 - 120 * 120
    assert out[24]["word"] is None and out[24]["varnum"] == 0
    with pytest.raises(ValueError):
        subsequence_words(counts=cnts, m=24, segments=5)
    with pytest.raises(ValueError):
        subsequence_words(counts=cnts, m=24, alphabet=9)


def test_motif_pairs_exact_repeat_r_one(spark):
    """The day0/day2 windows are identical vectors -> their pair must
    surface with r == 1.0, dist == 0.0 exactly; overlap (h_b - h_a <
    m) and flat windows never pair; every returned r honors
    min_corr."""
    from traval_spark.operators.downsample import motif_pairs

    def c_at(h):
        d, hh = divmod(h, 24)
        return 5 if d == 1 else (0 if hh < 12 else 10)

    cnts = _counts(spark, [("s", h, c_at(h)) for h in range(72)])
    got = motif_pairs(counts=cnts, m=24, segments=4, min_corr=0.9,
                      top_k=10).collect()
    assert all(r["r"] >= 0.9 for r in got)
    assert all(r["h_b"] - r["h_a"] >= 24 for r in got)
    exact = [r for r in got if (r["h_a"], r["h_b"]) == (0, 48)]
    assert len(exact) == 1
    assert exact[0]["r"] == 1.0 and exact[0]["dist"] == 0.0
    assert exact[0]["word"] == "aadd"


def test_motif_pairs_top_k_bound_per_series(spark):
    """top_k caps output size per series regardless of bucket heat: a
    pure 12h square wave repeats its window every 24h, giving many
    same-word non-overlapping pairs — only top_k survive."""
    from traval_spark.operators.downsample import motif_pairs

    cnts = _counts(
        spark,
        [("s", h, 0 if h % 24 < 12 else 10) for h in range(24 * 10)],
    )
    got = motif_pairs(counts=cnts, m=24, segments=4, min_corr=0.5,
                      top_k=3).collect()
    assert len(got) == 3
    assert all(r["r"] == 1.0 for r in got)   # aligned repeats tie at 1
    # deterministic tie-break: earliest (h_a, h_b) pairs win
    assert [(r["h_a"], r["h_b"]) for r in got] == [(0, 24), (0, 48),
                                                   (0, 72)]


def test_rare_windows_hand_census(spark):
    """8h signal [0,10,0,10,5,5,0,10], m=4, 2 segments: window words
    are cc,bc,cc,da,cc -> unique words are 'bc'@1 and 'da'@3; flat
    windows would be excluded (none here)."""
    from traval_spark.operators.downsample import rare_windows

    cnts = _counts(spark, list(zip(
        ["u"] * 8, range(8), [0, 10, 0, 10, 5, 5, 0, 10])))
    got = sorted(
        rare_windows(counts=cnts, m=4, segments=2, max_count=1)
        .collect(), key=lambda r: r["h0"])
    assert [(r["h0"], r["word"], r["word_count"], r["n_events"])
            for r in got] == [(1, "bc", 1, 25), (3, "da", 1, 20)]


def test_discord_topk_hand_nn_and_ordering(spark):
    """16h signal: a [0,10] square wave with a [7,1,1,1] tail anomaly.
    m=4/2 segments gives 13 windows — h0 0..8 all word 'cc', then
    bc@9, cb@10, da@11, cb@12 — so the unique-word candidates are
    h0=9 ([10,0,10,7]) and h0=11 ([10,7,1,1]).  Hand NN (best exact
    Pearson r vs any non-overlapping window, all of which are the
    square-wave phases [0,10,0,10]/[10,0,10,0]):
      h0=9:  r = (4*200 - 27*20)/sqrt(267*400) vs the odd phase,
             attained first at h0_w=1
      h0=11: r = (4*110 - 19*20)/sqrt(243*400), also first at h0_w=1
    Discord order is nn_r ASC: the anomaly tail (farther from
    everything) outranks the boundary window."""
    import math

    import pytest as pt

    from traval_spark.operators.downsample import discord_topk

    cnts = _counts(spark, list(zip(["s"] * 16, range(16),
                                   [0, 10] * 6 + [7, 1, 1, 1])))
    got = discord_topk(counts=cnts, m=4, segments=2, rare_max=1,
                       top_k=5).collect()
    rows = {r["h0"]: r for r in got}
    assert set(rows) == {9, 11}
    r9 = round(260 / math.sqrt(267 * 400), 9)
    r11 = round(60 / math.sqrt(243 * 400), 9)
    assert rows[9]["word"] == "bc" and rows[11]["word"] == "da"
    assert rows[9]["nn_h0"] == 1 and rows[11]["nn_h0"] == 1
    assert rows[9]["nn_r"] == pt.approx(r9, abs=1e-12)
    assert rows[11]["nn_r"] == pt.approx(r11, abs=1e-12)
    for r in got:
        assert r["nn_dist"] == round(
            math.sqrt(8.0 * (1.0 - r["nn_r"])), 6)
    assert rows[11]["nn_r"] < rows[9]["nn_r"]


def test_discord_topk_no_neighbor_drops(spark):
    """A candidate with no non-overlapping comparison window reports
    nothing: the 8h rare-windows signal's unique words at h0=1 and
    h0=3 have no window at distance >= m on either side."""
    from traval_spark.operators.downsample import discord_topk

    cnts = _counts(spark, list(zip(
        ["u"] * 8, range(8), [0, 10, 0, 10, 5, 5, 0, 10])))
    assert discord_topk(counts=cnts, m=4, segments=2,
                        rare_max=1).count() == 0


def test_dtw_pairs_jitter_zero_under_band(spark):
    """A 1h-jittered spike repeat: windows [0,10,0,0,0,0] @0 and
    [0,0,10,0,0,0] @6 share the word 'cb' (same PAA slice sums), lock-
    step distance d2 = 200, but band-1 DTW warps the spike onto its
    neighbor for an exact dtw of 0 (gain 200).  With band=0 the path
    is forced diagonal, so dtw == d2 exactly."""
    from traval_spark.operators.downsample import dtw_pairs

    sig = [0, 10, 0, 0, 0, 0, 0, 0, 10, 0, 0, 0]
    cnts = _counts(spark, [("s", h, c) for h, c in enumerate(sig)])
    got = {(r["h_a"], r["h_b"]): r
           for r in dtw_pairs(counts=cnts, m=6, segments=2, band=1,
                              top_k=50).collect()}
    r = got[(0, 6)]
    assert r["word_a"] == "cb" and r["word_b"] == "cb"
    assert (r["dtw"], r["d2"], r["gain"]) == (0, 200, 200)
    tight = {(r["h_a"], r["h_b"]): r
             for r in dtw_pairs(counts=cnts, m=6, segments=2, band=0,
                                top_k=50).collect()}
    r0 = tight[(0, 6)]
    assert r0["dtw"] == r0["d2"] == 200 and r0["gain"] == 0


def test_dtw_pairs_masked_candidate_one_symbol_apart(spark):
    """Windows [0,0,10,10,0,0] ('ada') and [0,0,10,10,0,4] ('adb')
    differ in exactly ONE symbol, so only the drop-position-3
    projection mask pairs them — and the exact DTW equals the hand DP
    (the trailing 0-vs-4 cost of 16 is unavoidable at any warp)."""
    from traval_spark.operators.downsample import dtw_pairs

    sig = [0, 0, 10, 10, 0, 0, 0, 0, 10, 10, 0, 4]
    cnts = _counts(spark, [("s", h, c) for h, c in enumerate(sig)])
    got = {(r["h_a"], r["h_b"]): r
           for r in dtw_pairs(counts=cnts, m=6, segments=3, band=1,
                              top_k=50).collect()}
    r = got[(0, 6)]
    assert r["word_a"] == "ada" and r["word_b"] == "adb"
    assert (r["dtw"], r["d2"], r["gain"]) == (16, 16, 0)


def test_dtw_pairs_two_symbols_apart_never_pair(spark):
    """[4,0,10,10,0,4] symbolizes to 'bdb' — two positions away from
    'ada' — so no projection mask joins the pair: (0, 6) is absent,
    and every emitted pair's words differ in at most one position (the
    candidate-generation contract)."""
    from traval_spark.operators.downsample import dtw_pairs

    sig = [0, 0, 10, 10, 0, 0, 4, 0, 10, 10, 0, 4]
    cnts = _counts(spark, [("s", h, c) for h, c in enumerate(sig)])
    got = dtw_pairs(counts=cnts, m=6, segments=3, band=1,
                    top_k=50).collect()
    assert (0, 6) not in {(r["h_a"], r["h_b"]) for r in got}
    for r in got:
        diffs = sum(a != b for a, b in zip(r["word_a"], r["word_b"]))
        assert diffs <= 1


def test_dtw_pairs_param_guards(spark):
    import pytest as pt

    from traval_spark.operators.downsample import dtw_pairs

    cnts = _counts(spark, [("s", h, h % 3) for h in range(12)])
    with pt.raises(ValueError):
        dtw_pairs(counts=cnts, m=6, segments=2, band=-1)
    with pt.raises(ValueError):
        dtw_pairs(counts=cnts, m=1, segments=1)


def test_symbol_transitions_deterministic_cycle(spark):
    """Counts alternating low/high: symbols alternate between two
    letters, every transition row has p = 1.0, and symbol_entropy
    reports h_rate 0 / predictability 1 — the deterministic-cycle
    fixed point."""
    from traval_spark.operators.downsample import (
        symbol_entropy, symbol_transitions)

    rows = [("x", pd.Timestamp("2024-01-01")
             + pd.Timedelta(hours=i, minutes=j))
            for i in range(24) for j in range(1 if i % 2 == 0 else 10)]
    df = spark.createDataFrame(pd.DataFrame(rows,
                                            columns=["source", "ts"]))
    tr = sorted((r["sym_from"], r["sym_to"], r["cnt"], r["p"])
                for r in symbol_transitions(df, alphabet=3).collect())
    assert len(tr) == 2
    assert all(p == 1.0 for *_, p in tr)
    assert {t[0] for t in tr} == {t[1] for t in tr}  # a 2-cycle
    assert sum(t[2] for t in tr) == 23               # 24 buckets -> 23

    ent = symbol_entropy(df, alphabet=3).collect()[0]
    assert ent["n_trans"] == 23 and ent["k_used"] == 2
    assert ent["h_rate"] == 0.0 and ent["predictability"] == 1.0


def test_symbol_stream_constant_series_emits_nothing(spark):
    """Zero-variance series: z-normalization undefined, the stream is
    empty by rule (sax_words' NULL-word convention)."""
    from traval_spark.operators.downsample import symbol_stream

    rows = [("x", pd.Timestamp("2024-01-01") + pd.Timedelta(hours=i))
            for i in range(6)]
    df = spark.createDataFrame(pd.DataFrame(rows,
                                            columns=["source", "ts"]))
    assert symbol_stream(df, alphabet=4).count() == 0


def test_symbol_entropy_tier_served_equals_raw(spark):
    """counts= off a pre-aggregated (g, h, c) frame reproduces the
    raw-served entropy exactly — integer counts re-aggregate
    losslessly, so the Markov reads never re-scan raw."""
    from traval_spark.operators.downsample import symbol_entropy
    from traval_spark.operators.monitor import bucket_count_signal

    rows = [("x", pd.Timestamp("2024-01-01")
             + pd.Timedelta(hours=i, minutes=j))
            for i in range(30) for j in range((i * 7) % 5 + (i % 3))]
    df = spark.createDataFrame(pd.DataFrame(rows,
                                            columns=["source", "ts"]))
    raw = symbol_entropy(df, alphabet=4).collect()
    cnts = bucket_count_signal(df)
    tiered = symbol_entropy(counts=cnts, alphabet=4).collect()
    assert sorted(map(tuple, raw)) == sorted(map(tuple, tiered))


def test_symbol_mi_identical_series_nmi_one(spark):
    """Two identical alternating series: the joint table is the
    diagonal, MI equals both marginal entropies (= ln 2 for the 50/50
    two-regime split) and NMI is 1 — the deterministic-relation fixed
    point MI shares with no Pearson-style measure."""
    import math
    from traval_spark.operators.downsample import symbol_mi

    rows = []
    for i in range(24):
        for j in range(1 if i % 2 == 0 else 10):
            for s in ("x", "y"):
                rows.append((s, pd.Timestamp("2024-01-01")
                             + pd.Timedelta(hours=i, minutes=j)))
    df = spark.createDataFrame(pd.DataFrame(rows,
                                            columns=["source", "ts"]))
    r = symbol_mi(df, alphabet=3).collect()[0]
    assert (r["a"], r["b"]) == ("x", "y") and r["n"] == 24
    assert abs(r["mi"] - math.log(2)) < 2e-2   # 12/12 split, 6dp sums
    assert abs(r["mi"] - r["h_a"]) <= 2e-6
    assert abs(r["mi"] - r["h_b"]) <= 2e-6
    assert abs(r["nmi"] - 1.0) <= 2e-6


def test_symbol_mi_opposite_regimes_full_information(spark):
    """y is x's regime INVERSE (high when x is low): word-equality
    measures score 0, Pearson r is negative — but the relation is
    deterministic, so NMI is still 1 (the anti-coupling read)."""
    from traval_spark.operators.downsample import symbol_mi

    rows = []
    for i in range(24):
        kx = 1 if i % 2 == 0 else 10
        ky = 10 if i % 2 == 0 else 1
        for j in range(kx):
            rows.append(("x", pd.Timestamp("2024-01-01")
                         + pd.Timedelta(hours=i, minutes=j)))
        for j in range(ky):
            rows.append(("y", pd.Timestamp("2024-01-01")
                         + pd.Timedelta(hours=i, minutes=j)))
    df = spark.createDataFrame(pd.DataFrame(rows,
                                            columns=["source", "ts"]))
    r = symbol_mi(df, alphabet=3).collect()[0]
    assert abs(r["nmi"] - 1.0) <= 2e-6
