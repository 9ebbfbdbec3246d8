"""Plan anti-pattern audit across EVERY queries() entry.

Builds each query's physical plan at the given sf_dir (no execution —
`.queryExecution().executedPlan()` after AQE-less planning) and greps it
for the shapes that kill 100 TB jobs:

- ``CartesianProduct`` / ``BroadcastNestedLoopJoin`` — all-pairs joins.
  Allowed only where the operator's CONTRACT is a documented quadratic
  baseline or a broadcast-small scalar/params frame (allowlist below,
  each entry justified).
- ``BatchEvalPython`` — row-at-a-time Python UDF: never acceptable.
- ``ArrowEvalPython`` / ``FlatMapGroupsInPandas`` / ``MapInPandas`` —
  Arrow-batched Python: fine by design (the documented kernel paths),
  counted for visibility, not flagged.
- ``SortMergeJoin`` — legitimate for big-big joins; FLAGGED only when
  the query is also in the dims-should-broadcast list.

Writes one line per query (counts per marker) and a FLAGGED section;
exit code 1 iff a non-allowlisted flag fires.  Usage:
``python tools/plan_audit.py [sf_dir] [--out PLAN_AUDIT.md]``
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# BroadcastNestedLoopJoin allowlist: a BNLJ is how Spark plans a
# keyless join whose one side is BROADCAST — fine when that side is a
# scalar/literal/dimension-sized frame (the audit verified each entry's
# broadcast side below; CartesianProduct — the non-broadcast all-pairs
# shape — is NEVER allowlisted).  Grouped by why the cross is small:
BROADCAST_CROSS_ALLOWED = {
    # 1-row/query-vector broadcast crossed into the corpus scan
    "ann_topk", "ann_lsh_topk", "ann_ivf_topk", "ann_scores",
    "pq_adc_topk", "ann_ivfpq_topk",
    # query BATCH broadcast into the corpus — the documented small-side
    # brute knn_join contract (ivf variant is the scale path);
    # ann_recall composes both paths
    "knn_join", "ann_recall",
    # documented quadratic oracle baseline (the banded/bucketed
    # variants are the scale path)
    "cos_dup_pairs",
    # lag/anchor LITERAL frames (spark.range(max_lag), bucket anchors)
    # crossed into the tiny per-series signal/bucket frame — the plan
    # text repeats the subtree per consumer branch, hence counts > 1
    "acf_lags", "acf_tiered", "ljung_box", "dominant_period",
    "stl_decompose", "stl_anomaly", "runs_test",
    "turning_points", "variance_ratio", "pettitt_change",
    "seasonal_mk", "seasonal_sen", "hurst_rs", "kpss_level",
    "fleet_report", "sen_slope_ci",
    "symbol_transitions", "symbol_entropy", "symbol_mi",
    "lead_lag",
    "xcorr_lags", "lttb_6h", "lttb_from_m4",
    # global-scalar broadcast (corpus totals / vocab stats / eval
    # bloom bitmap / mixture weights) crossed into the main frame
    "bm25", "lm_score", "source_entropy", "vocab_coverage",
    "temperature_mix", "pmi_bigrams", "seasonal_strength",
    "dsir_weights", "dsir_resample", "unimax_budget", "heaps_fit",
    "forecast_backtest", "decontaminate_bloom", "remap_tokens",
    # tiny-frame pair enumerations: O(sources^2) / O(m^2) on frames
    # the size of the source list or bucket signal, never the corpus
    "source_overlap", "join_blowup", "theil_sen", "theil_sen_tiered",
    "spearman_pairs", "mann_kendall", "fano_dispersion", "label_sim",
    # kendall: spearman's spine (distinct-groups x global-span literal)
    # plus the O(m^2) bucket-pair join, all on the tiny signal frame
    "kendall_pairs",
    # SAX reads ride the same signal spine; sax_pairs repeats the
    # words subtree per self-join side, everything |series|xdays-sized
    "sax_words", "sax_pairs",
    # subsequence-SAX family rides the same 1-row span broadcast cross
    # (once per self-join/back-join side); windows, pairs and rarity
    # all run on the |series|xspan words frame, never the corpus
    "motif_words", "motif_pairs", "rare_windows", "discord_topk",
    "dtw_pairs",
    # 1-row group-count S broadcast into the vocab-bounded counts table
    "tfidf_top",
    # 1-row exact cents-total broadcast crossed into the customer scan
    # (the Q22 global-scalar-subquery shape)
    "tpch_quiet_customers",
    # 1-row MAX-revenue broadcast crossed into the per-supplier totals
    # (the Q15 aggregate-equals-max shape)
    "tpch_top_supplier",
    # broadcast params/manual-obs dimension crossed per series
    "pastas_pi_bounds", "manual_obs_compare", "manual_obs_shift",
    # range/point containment against broadcast-small literal frames
    "interval_events", "interval_overlaps", "phrase_search",
    "cms_point_1h", "hist_quantiles_1h", "trimmed_mean_1h",
    "hist_mad_1h", "dds_quantiles_1h", "dds_rank_1h", "sliding_quantiles",
    "percentile_rank", "percentile_rank_grouped", "robust_outliers",
}

# queries whose join sides are all dimension-sized: a SortMergeJoin here
# means a broadcast was missed
DIMS_MUST_BROADCAST = {
    "tpch_pricing", "tpch_top_orders", "tpch_regional_revenue",
    "tpch_late_orders", "tpch_priority_lines", "tpch_returned_revenue",
    "tpch_promo_share", "tpch_small_qty_revenue", "tpch_big_orders",
    "tpch_disjunct_revenue", "tpch_quiet_customers",
    "tpch_nation_volume", "tpch_market_share", "tpch_top_supplier",
}

MARKERS = [
    "CartesianProduct", "BroadcastNestedLoopJoin", "BatchEvalPython",
    "SortMergeJoin", "BroadcastHashJoin", "ArrowEvalPython",
    "FlatMapGroupsInPandas", "MapInPandas", "Exchange",
    "WholeStageCodegen",
]


def main() -> int:
    sf_dir = "/root/testdata/sf0.01"
    out_path = None
    args = [a for a in sys.argv[1:]]
    while args:
        a = args.pop(0)
        if a == "--out":
            out_path = args.pop(0)
        else:
            sf_dir = a

    import __spark_entry__ as entrymod
    from traval_spark.session import get_spark

    spark = get_spark("plan-audit", master="local[8]",
                      shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")

    rows = []
    flagged = []
    for name, fn in sorted(entrymod.queries().items()):
        try:
            plan = (fn(spark, sf_dir)._jdf.queryExecution()
                    .executedPlan().toString())
        except Exception as e:  # planning failure is itself a finding
            flagged.append((name, f"PLAN ERROR: {str(e)[:160]}"))
            continue
        counts = {m: plan.count(m) for m in MARKERS}
        rows.append((name, counts))
        if counts["BatchEvalPython"]:
            flagged.append((name, "row-at-a-time Python UDF"))
        if counts["CartesianProduct"]:
            flagged.append(
                (name, f"CartesianProduct x{counts['CartesianProduct']} "
                       "(non-broadcast all-pairs; never allowlisted)"))
        if (counts["BroadcastNestedLoopJoin"]
                and name not in BROADCAST_CROSS_ALLOWED):
            flagged.append(
                (name, "unaudited BroadcastNestedLoopJoin x"
                       f"{counts['BroadcastNestedLoopJoin']}"))
        if counts["SortMergeJoin"] and name in DIMS_MUST_BROADCAST:
            flagged.append((name, "SortMergeJoin on dimension-sized side"))

    lines = ["# PLAN AUDIT — physical-plan anti-pattern sweep", ""]
    lines.append(f"sf_dir: {sf_dir}; queries planned: {len(rows)}; "
                 f"flagged: {len(flagged)}")
    lines.append("")
    if flagged:
        lines.append("## FLAGGED")
        for name, why in flagged:
            lines.append(f"- **{name}**: {why}")
        lines.append("")
    lines.append("## Per-query plan marker counts")
    lines.append("")
    hdr = ["query"] + [m for m in MARKERS]
    lines.append("| " + " | ".join(hdr) + " |")
    lines.append("|" + "---|" * len(hdr))
    for name, counts in rows:
        lines.append("| " + " | ".join(
            [name] + [str(counts[m]) for m in MARKERS]) + " |")
    report = "\n".join(lines) + "\n"
    if out_path:
        with open(out_path, "w") as f:
            f.write(report)
    print(f"{len(rows)} planned, {len(flagged)} flagged")
    for name, why in flagged:
        print(f"FLAG  {name}: {why}")
    return 1 if flagged else 0


if __name__ == "__main__":
    raise SystemExit(main())
