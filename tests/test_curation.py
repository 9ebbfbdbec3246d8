"""Curation job: stage lineage, determinism, packed output shape."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from traval_spark.curation import curate_corpus, write_curated


def test_curate_corpus_end_to_end(spark, tmp_path):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    # plant exact dups (same text) and near dups (two extra words)
    exact = docs.filter(F.col("doc_id") % 20 == 0).withColumn(
        "doc_id", F.col("doc_id") + 1_000_000)
    near = docs.filter(F.col("doc_id") % 30 == 0).withColumn(
        "doc_id", F.col("doc_id") + 2_000_000).withColumn(
        "text", F.concat(F.col("text"), F.lit(" qq zz")))
    corpus = docs.unionByName(exact).unionByName(near)

    metrics: dict = {}
    packed = curate_corpus(
        corpus,
        quality={"min_words": 3, "max_dup_word_fraction": None,
                 "max_top_bigram_fraction": None,
                 "mean_word_length_range": None},
        near_dup=True,
        benchmark=docs.orderBy("doc_id").limit(2),
        weights={f"src{i}": 1.0 for i in range(0, 10)},  # drop src10..19
        target_tokens=256,
        metrics=metrics,
    )
    # monotone lineage: every stage can only drop documents
    stages = ["input", "after_nonnull_text", "after_quality",
              "after_exact_dedup", "after_near_dedup",
              "after_decontamination", "after_mixture"]
    counts = [metrics[s] for s in stages]
    assert counts == sorted(counts, reverse=True)
    # exact dups all collapse
    assert metrics["after_exact_dedup"] <= metrics["after_quality"] - 20
    # near dups drop non-roots
    assert metrics["after_near_dedup"] < metrics["after_exact_dedup"]
    # decontamination removes at least the 2 benchmark docs themselves
    assert metrics["after_decontamination"] <= metrics["after_near_dedup"] - 2
    # mixture drops the unweighted sources entirely
    assert metrics["after_mixture"] < metrics["after_decontamination"]

    rows = packed.count()
    assert rows == metrics["after_mixture"]
    assert set(packed.columns) == {"doc_id", "source", "split", "n_tok",
                                   "pack_id", "pack_pos"}
    assert {r["split"] for r in packed.select("split").distinct().collect()
            } <= {"train", "val", "test"}
    # packs bounded within each (split, source)
    mx = packed.agg(F.max("n_tok")).first()[0]
    tot = packed.groupBy("split", "source", "pack_id").agg(
        F.sum("n_tok").alias("t"))
    assert tot.filter(F.col("t") > 256 + mx - 1).count() == 0

    # deterministic re-run
    again = curate_corpus(
        corpus,
        quality={"min_words": 3, "max_dup_word_fraction": None,
                 "max_top_bigram_fraction": None,
                 "mean_word_length_range": None},
        near_dup=True,
        benchmark=docs.orderBy("doc_id").limit(2),
        weights={f"src{i}": 1.0 for i in range(0, 10)},
        target_tokens=256,
    )
    assert packed.exceptAll(again).count() == 0
    assert again.exceptAll(packed).count() == 0

    out = str(tmp_path / "curated")
    write_curated(packed, out, metrics)
    m = json.load(open(f"{out}/_curation_metrics.json"))
    assert m["input"] == metrics["input"]
    rd = spark.read.parquet(out)
    assert rd.count() == rows and "split" in rd.columns


def test_curate_corpus_null_text_lineage(spark):
    """NULL-text docs are excluded as their OWN manifest stage (they
    would otherwise collapse into one fabricated exact-dup group and
    then vanish at packing with no metric) — the packed count equals the
    last stage count even with NULLs present."""
    rows = [(1, "alpha beta gamma delta", "s0"),
            (2, "epsilon zeta eta theta", "s0"),
            (3, None, "s0"), (4, None, "s1"),
            (5, "iota kappa lambda mu", "s1")]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, source string")
    metrics: dict = {}
    packed = curate_corpus(docs, near_dup=False, target_tokens=64,
                           metrics=metrics)
    assert metrics["after_nonnull_text"] == metrics["input"] - 2
    assert packed.count() == metrics["after_exact_dedup"] == 3
