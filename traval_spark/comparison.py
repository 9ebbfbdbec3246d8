"""Series comparison + binary classification as DataFrame algebra.

The reference compares series via DatetimeIndex set algebra
(/root/reference/traval/ts_comparison.py:55-517); at scale index objects on
a driver are a non-starter. Here every comparison is ONE full-outer join on
(series_id, ts) with presence flags and a single CASE expression — the
16-combination truth table of tests/test_004_comparison.py:21-77 is the
spec (FIXTURES.md F4).

Presence model (SURVEY.md §1.4): a row present with NULL value = flagged
(NaN); an absent row = missing. ``x_present`` markers distinguish the two
after the outer join.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from traval_spark.functions.ts import SID, TS

#: SeriesComparison categories (ts_comparison.py:223-229)
CATEGORIES = [
    "in_both_identical",
    "in_both_different",
    "in_s1",
    "in_s2",
    "in_both_nan",
]

#: SeriesComparisonRelative categories (ts_comparison.py:465-474)
REL_CATEGORIES = [
    "kept_in_both",
    "flagged_in_s1",
    "flagged_in_s2",
    "flagged_in_both",
    "in_all_nan",
    "introduced_in_s1",
    "introduced_in_s2",
    "introduced_in_both",
]


def _tagged(df: DataFrame, suffix: str, with_comment: bool) -> DataFrame:
    cols = [
        F.col(SID),
        F.col(TS).cast("timestamp_ntz").alias(TS),
        F.col("value").cast("double").alias(f"v{suffix}"),
        F.lit(True).alias(f"p{suffix}"),
    ]
    if with_comment:
        cols.append(F.col("comment").alias(f"c{suffix}"))
    return df.select(*cols)


def compare_series(
    s1: DataFrame, s2: DataFrame, diff_threshold: float = 0.0
) -> DataFrame:
    """SeriesComparison (ts_comparison.py:79-212) as one outer join + CASE.

    Returns (series_id, ts, v1, v2[, comment], category) over the union of
    both indices. Category semantics, including the NaN-here/missing-there
    merges into in_both_nan (ts_comparison.py:191-198):

    - both values non-NULL        -> identical iff |v1-v2| <= diff_threshold
    - v1 ok, s2 NULL-or-missing   -> in_s1
    - v2 ok, s1 NULL-or-missing   -> in_s2
    - neither ok (>=1 row exists) -> in_both_nan
    """
    with_comment = "comment" in s2.columns
    j = _tagged(s1, "1", False).join(
        _tagged(s2, "2", with_comment), on=[SID, TS], how="full_outer"
    )
    ok1 = F.col("p1").isNotNull() & F.col("v1").isNotNull()
    ok2 = F.col("p2").isNotNull() & F.col("v2").isNotNull()
    cat = (
        F.when(ok1 & ok2,
               F.when(F.abs(F.col("v1") - F.col("v2")) <= F.lit(diff_threshold),
                      F.lit("in_both_identical"))
               .otherwise(F.lit("in_both_different")))
        .when(ok1, F.lit("in_s1"))
        .when(ok2, F.lit("in_s2"))
        .otherwise(F.lit("in_both_nan"))
    )
    out = j.withColumn("category", cat)
    keep = [SID, TS, "v1", "v2", "category"]
    if with_comment:
        keep.append(F.col("c2").alias("comment"))
    return out.select(*keep)


def summarize_comparison(cmp: DataFrame, per_series: bool = False) -> DataFrame:
    """Counts per category (ts_comparison.py:214-234) via conditional sums."""
    aggs = [
        F.sum(F.when(F.col("category") == c, 1).otherwise(0)).alias(c)
        for c in CATEGORIES
    ]
    return cmp.groupBy(SID).agg(*aggs) if per_series else cmp.agg(*aggs)


def compare_by_comment(cmp: DataFrame) -> DataFrame:
    """category x comment count matrix (ts_comparison.py:236-269)."""
    return (
        cmp.filter(F.col("comment").isNotNull())
        .groupBy("category")
        .pivot("comment")
        .count()
    )


def comparison_series(cmp: DataFrame) -> DataFrame:
    """Per-timestamp status code (ts_comparison.py:271-294).

    Deliberately replicates the *implementation*, not the docstring
    (SURVEY.md §7.2 quirks): identical -> -1.0, different -> 0.0,
    only-in-s1 -> 1.0, only-in-s2 -> 2.0, both-NaN -> -9999.0.
    """
    status = (
        F.when(F.col("category") == "in_both_identical", F.lit(-1.0))
        .when(F.col("category") == "in_both_different", F.lit(0.0))
        .when(F.col("category") == "in_s1", F.lit(1.0))
        .when(F.col("category") == "in_s2", F.lit(2.0))
        .when(F.col("category") == "in_both_nan", F.lit(-9999.0))
    )
    return cmp.select(SID, TS, status.alias("status"))


def compare_series_relative(
    s1: DataFrame,
    truth: DataFrame,
    base: DataFrame,
    diff_threshold: float = 0.0,
) -> DataFrame:
    """SeriesComparisonRelative (ts_comparison.py:381-454): 3-way outer join.

    Returns (series_id, ts, v1, v2, vb[, comment], category, rel_category).
    ``category`` is the pairwise s1-vs-truth comparison; ``rel_category``
    implements the 8 relative categories against the base series exactly as
    the 16-row truth table demands (FIXTURES.md F4):

    base ok:      s1&s2 -> kept_in_both | only s2 -> flagged_in_s1
                  | only s1 -> flagged_in_s2 | neither -> flagged_in_both
    base not ok:  s1&s2 -> introduced_in_both | only s1 -> introduced_in_s1
                  | only s2 -> introduced_in_s2
                  | neither & base row present (NULL) -> in_all_nan
                  | neither & base missing -> NULL (not counted)
    """
    with_comment = "comment" in truth.columns
    j = (
        _tagged(s1, "1", False)
        .join(_tagged(truth, "2", with_comment), on=[SID, TS], how="full_outer")
        .join(_tagged(base, "b", False), on=[SID, TS], how="full_outer")
    )
    ok1 = F.col("p1").isNotNull() & F.col("v1").isNotNull()
    ok2 = F.col("p2").isNotNull() & F.col("v2").isNotNull()
    okb = F.col("pb").isNotNull() & F.col("vb").isNotNull()
    base_nan = F.col("pb").isNotNull() & F.col("vb").isNull()

    cat = (
        F.when(ok1 & ok2,
               F.when(F.abs(F.col("v1") - F.col("v2")) <= F.lit(diff_threshold),
                      F.lit("in_both_identical"))
               .otherwise(F.lit("in_both_different")))
        .when(ok1, F.lit("in_s1"))
        .when(ok2, F.lit("in_s2"))
        .when(F.col("p1").isNotNull() | F.col("p2").isNotNull(),
              F.lit("in_both_nan"))
    )
    rel = (
        F.when(okb,
               F.when(ok1 & ok2, F.lit("kept_in_both"))
               .when(~ok1 & ok2, F.lit("flagged_in_s1"))
               .when(ok1 & ~ok2, F.lit("flagged_in_s2"))
               .otherwise(F.lit("flagged_in_both")))
        .when(ok1 & ok2, F.lit("introduced_in_both"))
        .when(ok1, F.lit("introduced_in_s1"))
        .when(ok2, F.lit("introduced_in_s2"))
        .when(base_nan, F.lit("in_all_nan"))
    )
    out = j.withColumn("category", cat).withColumn("rel_category", rel)
    keep = [SID, TS, "v1", "v2", "vb", "category", "rel_category"]
    if with_comment:
        keep.append(F.col("c2").alias("comment"))
    return out.select(*keep)


def summarize_relative(rel: DataFrame, per_series: bool = False) -> DataFrame:
    """Counts of the 8 relative categories (ts_comparison.py:456-479)."""
    aggs = [
        F.sum(F.when(F.col("rel_category") == c, 1).otherwise(0)).alias(c)
        for c in REL_CATEGORIES
    ]
    return rel.groupBy(SID).agg(*aggs) if per_series else rel.agg(*aggs)


def compare_to_base_by_comment(rel: DataFrame) -> DataFrame:
    """8 relative categories x comment pivot (ts_comparison.py:481-517)."""
    return (
        rel.filter(F.col("comment").isNotNull())
        .groupBy("rel_category")
        .pivot("comment")
        .count()
    )


# ---------------------------------------------------------------------------
# binary classification (/root/reference/traval/binary_classifier.py)
# ---------------------------------------------------------------------------


def binary_classification(rel: DataFrame, per_series: bool = False) -> DataFrame:
    """TP/FP/TN/FN counts from a relative comparison.

    Mapping from binary_classifier.py:49-69: TP = flagged_in_both (hit),
    FP = flagged_in_s1 (false alarm), TN = kept_in_both, FN = flagged_in_s2
    (miss). The reference's ``__add__`` fleet roll-up
    (binary_classifier.py:104-124) is the per_series=False global agg —
    Spark's partial+final aggregation does the counter summing.
    """
    def cnt(cat: str) -> Column:
        return F.sum(F.when(F.col("rel_category") == cat, 1).otherwise(0))

    aggs = [
        cnt("flagged_in_both").alias("tp"),
        cnt("flagged_in_s1").alias("fp"),
        cnt("kept_in_both").alias("tn"),
        cnt("flagged_in_s2").alias("fn"),
    ]
    return rel.groupBy(SID).agg(*aggs) if per_series else rel.agg(*aggs)


def threshold_sweep(
    series: DataFrame,
    truth: DataFrame,
    thresholds: list[float],
    ufunc: str = "greater",
    per_series: bool = False,
) -> DataFrame:
    """Classifier counts for K candidate thresholds in ONE scan — the
    distributed way to produce the tpr/fpr arrays the reference feeds to
    ``roc_plot``/``det_plot`` (plots.py:377-519; its notebooks compute one
    BinaryClassifier per parameter setting, i.e. K full passes).

    Per row, a K-wide flag vector (``ufunc(value, thr)`` per threshold)
    is posexploded and aggregated with map-side partial aggregation, so
    the input is read once no matter how many thresholds are swept; the
    output is K rows (threshold, tp, fp, tn, fn — reference
    binary_classifier.py:49-69 semantics: truth-flagged = NULL value at a
    present truth row). Chain :func:`with_classifier_stats` for
    tpr/fpr/fnr and the other 18 statistics.
    """
    ops = {
        "greater": lambda v, t: v > t,
        "less": lambda v, t: v < t,
        "greater_equal": lambda v, t: v >= t,
        "less_equal": lambda v, t: v <= t,
    }
    if ufunc not in ops:
        raise ValueError(f"ufunc must be one of {sorted(ops)}")
    j = _tagged(series, "1", False).join(
        _tagged(truth, "2", False), on=[SID, TS], how="inner"
    ).filter(F.col("v1").isNotNull())
    arr = F.array(*[F.lit(float(t)) for t in thresholds])
    j = j.select(
        SID,
        F.posexplode(arr).alias("__i", "threshold"),
        F.col("v1"),
        F.col("v2").isNull().alias("__truth_flag"),
    )
    det = ops[ufunc](F.col("v1"), F.col("threshold"))
    tf = F.col("__truth_flag")

    def cnt(cond: Column) -> Column:
        return F.sum(F.when(cond, 1).otherwise(0))

    keys = [SID, "threshold"] if per_series else ["threshold"]
    return (
        j.groupBy(*keys)
        .agg(
            cnt(det & tf).alias("tp"),
            cnt(det & ~tf).alias("fp"),
            cnt(~det & ~tf).alias("tn"),
            cnt(~det & tf).alias("fn"),
        )
        .orderBy(*keys)
    )


#: all 18 statistics of binary_classifier.py:8-27 as column expressions
def with_classifier_stats(bc: DataFrame) -> DataFrame:
    """Add the reference's 18 statistics to a tp/fp/tn/fn frame.

    Ratio statistics are NULL when their denominator is 0 (the reference
    returns NaN, binary_classifier.py:241-244 etc.); Spark division by zero
    yields NULL natively.
    """
    tp, fp, tn, fn = [F.col(c).cast("double") for c in ("tp", "fp", "tn", "fn")]

    def safe(num: Column, den: Column) -> Column:
        return F.when(den > 0, num / den)

    sens = safe(tp, tp + fn)
    spec = safe(tn, tn + fp)
    mcc_den = F.sqrt((tp + fp) * (tp + fn) * (tn + fp) * (tn + fn))
    return (
        bc.withColumn("sensitivity", sens)
        .withColumn("tpr", sens)
        .withColumn("fnr", safe(fn, fn + tp))
        .withColumn("specificity", spec)
        .withColumn("tnr", spec)
        .withColumn("fpr", safe(fp, fp + tn))
        .withColumn("ppv", safe(tp, tp + fp))
        .withColumn("npv", safe(tn, tn + fn))
        .withColumn("fdr", safe(fp, fp + tp))
        .withColumn("for", safe(fn, fn + tn))
        .withColumn("acc", safe(tp + tn, tp + fp + fn + tn))
        .withColumn("prev", safe(tp + fn, tp + fp + fn + tn))
        .withColumn("informedness", spec + sens - F.lit(1.0))
        .withColumn("mcc", F.when(mcc_den > 0, (tp * tn - fp * fn) / mcc_den))
    )
