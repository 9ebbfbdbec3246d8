"""Detector: per-fleet orchestration of ruleset application + evaluation.

Re-expresses /root/reference/traval/detector.py:17-587 over the long frame:
where the reference holds OrderedDicts of pandas series for ONE series, this
Detector holds lazy DataFrames covering the whole fleet — the reference's
user-side "for each location" loop (ex02 notebook) disappears into
``groupBy(series_id)``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from traval_spark.comparison import (
    binary_classification,
    compare_series_relative,
    compare_to_base_by_comment,
    summarize_relative,
    with_classifier_stats,
)
from traval_spark.functions.masks import (
    corrections_as_float,
    corrections_as_nan,
)
from traval_spark.functions.ts import SID, TS
from traval_spark.plans.ruleset import SparkRuleSet, apply_ruleset


class Detector:
    """Apply a RuleSet to a fleet of series and compare against truth.

    Parameters
    ----------
    series : DataFrame
        long frame (series_id, ts, value[, comment]).
    truth : DataFrame, optional
        same shape; the validation benchmark (detector.py:50-72).
    """

    def __init__(self, series: DataFrame, truth: DataFrame | None = None):
        self.series = series
        self.truth = truth
        self.ruleset: SparkRuleSet | None = None
        self.results: DataFrame | None = None

    def set_truth(self, truth: DataFrame) -> None:
        self.truth = truth

    def reset(self) -> None:
        self.ruleset = None
        self.results = None

    # ------------------------------------------------------------------

    def apply_ruleset(
        self, ruleset: SparkRuleSet, params: DataFrame | None = None
    ) -> DataFrame:
        """Run the ruleset; returns (and stores) the lazy wide step table.

        Unlike the reference (detector.py:115-165) comparisons are not
        precomputed eagerly for every step — they are lazy aggregations
        fetched via :meth:`comparison` on demand.
        """
        self.ruleset = ruleset
        self.results = apply_ruleset(self.series, ruleset, params=params)
        return self.results

    def _require_results(self) -> DataFrame:
        if self.results is None:
            raise RuntimeError("Call apply_ruleset first")
        return self.results

    def _resolve_step(self, step: int) -> int:
        n = len(self.ruleset.rules)
        return n + 1 + step if step < 0 else step

    def step_series(self, step: int) -> DataFrame:
        """Long frame of one step's series (detector.py:430-442 for -1)."""
        step = self._resolve_step(step)
        return self._require_results().select(
            SID, TS, F.col(f"step_{step}").alias("value")
        )

    def get_final_result(self) -> DataFrame:
        return self.step_series(len(self.ruleset.rules))

    # ------------------------------------------------------------------

    def comparison(self, step: int = -1) -> DataFrame:
        """Comparison of a step: relative (vs truth + base) when a truth is
        set, plain SeriesComparison vs the base otherwise
        (detector.py:158-165)."""
        if self.truth is None:
            from traval_spark.comparison import compare_series

            return compare_series(self.step_series(step), self.step_series(0))
        return compare_series_relative(
            self.step_series(step), self.truth, self.step_series(0)
        )

    _CONFUSION_SCHEMA = (
        "step int, rule string, tp bigint, fp bigint, fn bigint, tn bigint"
    )

    def _steps_confusion(self, specs: list[tuple[int, str, Column]]) -> DataFrame:
        """Single-pass per-step TP/FP/FN/TN vs truth.

        One full-outer join of the wide step table with the truth series,
        then ONE aggregation carrying 4 conditional counters per step,
        reshaped to rows with ``stack`` — n steps cost one job, not n
        (the reference recomputes a SeriesComparisonRelative per step,
        detector.py:181-303; the category algebra here is identical to
        comparison.compare_series_relative, with p1 == pb == "row exists
        in the step table" since every step lives in the same frame).
        """
        res = self._require_results()
        if not specs:
            return self.series.sparkSession.createDataFrame(
                [], self._CONFUSION_SCHEMA
            )
        truth = self.truth.select(
            F.col(SID),
            F.col(TS).cast("timestamp_ntz").alias(TS),
            F.col("value").cast("double").alias("__v2"),
            F.lit(True).alias("__p2"),
        )
        j = res.withColumn("__pr", F.lit(True)).join(
            truth, on=[SID, TS], how="full_outer"
        )
        pr = F.col("__pr").isNotNull()
        okb = pr & F.col("step_0").isNotNull()
        base_nan = pr & F.col("step_0").isNull()
        ok2 = F.col("__p2").isNotNull() & F.col("__v2").isNotNull()

        aggs = []
        for k, _name, s1 in specs:
            ok1 = pr & s1.isNotNull()
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
            for cat, col in (
                ("flagged_in_both", f"tp_{k}"),
                ("flagged_in_s1", f"fp_{k}"),
                ("flagged_in_s2", f"fn_{k}"),
                ("kept_in_both", f"tn_{k}"),
            ):
                aggs.append(
                    F.sum(F.when(rel == cat, 1).otherwise(0)).alias(col)
                )
        one = j.agg(*aggs)
        parts = []
        for k, name, _s1 in specs:
            lit_name = "'" + name.replace("'", "''") + "'"
            parts += [str(k), lit_name,
                      f"tp_{k}", f"fp_{k}", f"fn_{k}", f"tn_{k}"]
        return one.select(
            F.expr(
                f"stack({len(specs)}, {', '.join(parts)})"
                " as (step, rule, tp, fp, fn, tn)"
            )
        )

    def confusion_matrix(self, steps: list[int] | None = None) -> DataFrame:
        """Per-step TP/FP/FN/TN vs truth (detector.py:181-240).

        One row per step with the rule name; counts overlap across rules
        exactly as in the reference ("overlapping counts" note).
        """
        n = len(self.ruleset.rules)
        steps = steps if steps is not None else list(range(1, n + 1))
        specs = []
        for k in steps:
            k = self._resolve_step(k)
            if k == 0:
                continue
            specs.append((k, self.ruleset.get_step_name(k), F.col(f"step_{k}")))
        return self._steps_confusion(specs)

    def uniqueness(self) -> DataFrame:
        """Unique contribution per rule (detector.py:242-303).

        For each step k (excluding the last), NULLs unique to step k vs ALL
        other steps (incl. step 0, excl. the last step) stay NULL; non-unique
        NULLs are patched to the reference's -9999.0 sentinel before the
        relative comparison.
        """
        n = len(self.ruleset.rules)
        steps = list(range(1, n))  # reference drops the last step
        others_all = [0] + steps
        specs = []
        for k in steps:
            others = [j for j in others_all if j != k]
            s = F.col(f"step_{k}")
            unique_null = s.isNull()
            for j in others:
                unique_null = unique_null & F.col(f"step_{j}").isNotNull()
            patched = F.when(
                s.isNull() & ~unique_null, F.lit(-9999.0)
            ).otherwise(s)
            specs.append((k, self.ruleset.get_step_name(k), patched))
        return self._steps_confusion(specs)

    def stats_per_comment(self, step: int = -1) -> DataFrame:
        """Relative-comparison counts split by truth comment (detector.py:305-335)."""
        rel = self.comparison(step)
        return compare_to_base_by_comment(rel)

    def get_indices(self, category: str, step: int = -1) -> DataFrame:
        """Rows in a tp/fp/fn/tn category (detector.py:337-379)."""
        catmap = {
            "tp": "flagged_in_both", "true_positives": "flagged_in_both",
            "fp": "flagged_in_s1", "false_positives": "flagged_in_s1",
            "fn": "flagged_in_s2", "false_negatives": "flagged_in_s2",
            "tn": "kept_in_both", "true_negatives": "kept_in_both",
        }
        key = category.lower()
        if key not in catmap:
            raise ValueError(
                f"Category '{category}' not recognized, must be tp/fp/fn/tn"
            )
        rel = self.comparison(step)
        return rel.filter(F.col("rel_category") == catmap[key]).select(SID, TS)

    def get_comment_series(self) -> DataFrame:
        """Comma-joined rule names per flagged timestamp (detector.py:381-416)."""
        res = self._require_results()
        names = list(self.ruleset.rules.keys())
        parts = [
            F.when(F.coalesce(F.col(f"r{i}_code"), F.lit(0)) != 0, F.lit(nm))
            for i, nm in enumerate(names, start=1)
            if f"r{i}_code" in res.columns
        ]
        comment = F.concat_ws(",", F.array(*parts)) if parts else F.lit("")
        return res.select(SID, TS, comment.alias("comment"))

    def get_corrections_dataframe(self, as_addable_df: bool = False) -> DataFrame:
        """Per-rule correction codes, or addable float corrections.

        detector.py:444-493: code-rule steps emit their correction code
        (coalesced to 0); series-rule steps are re-encoded (99 for NULL
        results, 4 for nonzero shifts); as_addable_df applies
        corrections_as_nan + corrections_as_float (reference quirk included).
        """
        res = self._require_results()
        cols = [F.col(SID), F.col(TS)]
        for i, nm in enumerate(self.ruleset.rules.keys(), start=1):
            if f"r{i}_code" in res.columns:
                code = F.coalesce(F.col(f"r{i}_code"), F.lit(0))
                if as_addable_df:
                    cols.append(
                        (
                            corrections_as_nan(code)
                            + corrections_as_float(
                                code,
                                F.col(f"r{i}_sval"),
                                F.col(f"r{i}_cval").cast("double"),
                            )
                        ).alias(nm)
                    )
                else:
                    cols.append(code.alias(nm))
            elif f"r{i}_corr" in res.columns:
                corr = F.col(f"r{i}_corr")
                if as_addable_df:
                    cols.append(corr.alias(nm))
                else:
                    # series corrections re-encoded (detector.py:475-487):
                    # NULL -> 99, nonzero shift -> 4, else 0
                    cols.append(
                        F.when(corr.isNull(), F.lit(99))
                        .when(corr != 0.0, F.lit(4))
                        .otherwise(F.lit(0))
                        .alias(nm)
                    )
            else:
                cols.append(F.lit(0).alias(nm))  # combine-rule sentinel
        return res.select(*cols)

    def classifier_stats(self, step: int = -1) -> DataFrame:
        """All 18 binary-classification stats for a step (one row)."""
        return with_classifier_stats(binary_classification(self.comparison(step)))

    def get_series(self, step: int, category: str | None = None) -> DataFrame:
        """Base + step (+ truth) values, optionally one tp/fp/fn/tn category
        (detector.py:337-357)."""
        res = self._require_results()
        step = self._resolve_step(step)
        cols = [SID, TS, F.col("step_0").alias("base_series"),
                F.col(f"step_{step}").alias("result")]
        out = res.select(*cols)
        if self.truth is not None:
            out = out.join(
                self.truth.select(SID, TS, F.col("value").alias("truth")),
                on=[SID, TS], how="left",
            )
        if category is not None:
            idx = self.get_indices(category, step)
            out = out.join(idx, on=[SID, TS], how="left_semi")
        return out

    def get_corrections_comparison(self) -> DataFrame:
        """Flagged-rows audit table: raw/result values, per-rule comment,
        truth (value + comment) and the comparison label
        (detector.py:495-537, label map at 509-515 — replicating the
        comparison_series code semantics, not its docstring).
        """
        if self.truth is None:
            raise ValueError("Supply a time series for 'truth'!")
        from traval_spark.comparison import compare_series, comparison_series

        res = self._require_results()
        n = len(self.ruleset.rules)
        comments = self.get_comment_series().withColumnRenamed(
            "comment", "traval_comment"
        )
        flagged_traval = comments.filter(F.col("traval_comment") != "")
        truth_cols = [SID, TS, F.col("value").alias("truth_series")]
        if "comment" in self.truth.columns:
            truth_cols.append(F.col("comment").alias("truth_comment"))
        truth = self.truth.select(*truth_cols)
        flagged_truth = truth.filter(F.col("truth_series").isNull())

        idx = flagged_traval.select(SID, TS).unionByName(
            flagged_truth.select(SID, TS)).distinct()

        status = comparison_series(
            compare_series(self.step_series(n), self.truth)
        )
        label = (
            F.when(F.col("status") == -1.0, "Value modified")
            .when(F.col("status") == 0.0, "Flagged in both")
            .when(F.col("status") == 1.0, "Only flagged in 'truth' series")
            .when(F.col("status") == 2.0, "Only flagged in 'traval' series")
            .when(F.col("status") == -9999.0, "NaN in both")
        )
        out = (
            idx.join(res.select(SID, TS, F.col("step_0").alias("raw"),
                                F.col(f"step_{n}").alias("traval_series")),
                     on=[SID, TS], how="left")
            .join(comments, on=[SID, TS], how="left")
            .join(truth, on=[SID, TS], how="left")
            .join(status.withColumn("comparison_label", label)
                  .drop("status"), on=[SID, TS], how="left")
        )
        return out


