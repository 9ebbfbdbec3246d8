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


def _tok_corpus(spark):
    """Token-shaped corpus (input_hint shape) with planted exact + near
    duplicate sequences."""
    import random

    def toks(i):
        rnd = random.Random(i)
        return [rnd.randrange(1, 5000) for _ in range(24 + i % 5)]

    base = [(f"d{i:03d}", toks(i), f"src{i % 3}") for i in range(60)]
    # exact dups of every 10th doc, near dups (one token appended) of
    # every 15th
    extra = [(f"x{i:03d}", toks, src)
             for i, (d, toks, src) in enumerate(base) if i % 10 == 0]
    near = [(f"y{i:03d}", toks + [7], src)
            for i, (d, toks, src) in enumerate(base) if i % 15 == 0]
    rows = [(d, t, len(t), s) for d, t, s in base + extra + near]
    rows.append(("znull", None, None, "src0"))
    return spark.createDataFrame(
        rows, "doc_id string, tokens array<int>, n_tok int, source string")


def test_curate_corpus_token_native(spark):
    """TOKEN mode: exact token-sequence dedup, token-LSH near-dup,
    token-shingle decontamination, quality gates on length/repetition,
    real-n_tok packing — the pre-tokenized input_hint shape end-to-end."""
    corpus = _tok_corpus(spark)
    bench = corpus.filter(F.col("doc_id").isin("d001", "d002")).select(
        "doc_id", "tokens", "n_tok", "source")
    metrics: dict = {}
    packed = curate_corpus(
        corpus,
        tokens_col="tokens",
        quality={"min_tok": 4, "max_tok": 1000, "max_repetition": 0.9},
        near_dup=True,
        shingle_k=3,
        benchmark=bench,
        decontaminate_k=5,
        target_tokens=64,
        metrics=metrics,
    )
    stages = ["input", "after_nonnull_tokens", "after_quality",
              "after_exact_dedup", "after_near_dedup",
              "after_decontamination"]
    counts = [metrics[s] for s in stages]
    assert counts == sorted(counts, reverse=True)
    assert metrics["after_nonnull_tokens"] == metrics["input"] - 1
    # the 6 exact dups collapse
    assert metrics["after_exact_dedup"] == metrics["after_quality"] - 6
    # near dups (appended-token variants) drop via token LSH + CC
    assert metrics["after_near_dedup"] < metrics["after_exact_dedup"]
    # decontamination at least removes the benchmark members themselves
    assert metrics["after_decontamination"] <= metrics["after_near_dedup"] - 2

    rows = packed.collect()
    assert {r["doc_id"] for r in rows} & {"d001", "d002"} == set()
    # n_tok is the REAL token count, not a whitespace estimate
    lens = {r["doc_id"]: r["n_tok"] for r in rows}
    for r in corpus.collect():
        if r["doc_id"] in lens:
            assert lens[r["doc_id"]] == len(r["tokens"])

    # deterministic re-run (lazy mode)
    again = curate_corpus(
        corpus, tokens_col="tokens",
        quality={"min_tok": 4, "max_tok": 1000, "max_repetition": 0.9},
        near_dup=True, shingle_k=3, benchmark=bench, decontaminate_k=5,
        target_tokens=64,
    )
    assert packed.exceptAll(again).count() == 0
    assert again.exceptAll(packed).count() == 0


def test_decontaminate_short_benchmark_containment(spark):
    """A benchmark item SHORTER than decontaminate_k can't form a k-gram;
    pure shingle semantics would only flag exact-equal corpus docs. The
    containment fallback flags any corpus doc embedding the short item
    verbatim — on token boundaries (token 12 must not match inside 412)."""
    corpus = spark.createDataFrame(
        [("c1", [5, 12, 34, 99, 3], "s"),     # embeds [12, 34]
         ("c2", [412, 34, 7, 8, 9], "s"),     # 412 != ...,12 boundary trap
         ("c3", [1, 2, 3, 4, 6], "s")],
        "doc_id string, tokens array<int>, source string")
    bench = spark.createDataFrame(
        [("b1", [12, 34], "s")], "doc_id string, tokens array<int>, source string")

    packed = curate_corpus(
        corpus, tokens_col="tokens", near_dup=False,
        benchmark=bench, decontaminate_k=8, target_tokens=64)
    kept = {r["doc_id"] for r in packed.collect()}
    assert kept == {"c2", "c3"}

    # with the fallback disabled the leak survives (the documented
    # limitation of pure k-gram semantics)
    loose = curate_corpus(
        corpus, tokens_col="tokens", near_dup=False,
        benchmark=bench, decontaminate_k=8, target_tokens=64,
        short_bench_containment=False)
    assert {r["doc_id"] for r in loose.collect()} == {"c1", "c2", "c3"}


def test_curate_text_short_benchmark_containment(spark):
    """Text mode: a 3-word benchmark item inside a longer corpus doc is
    flagged by containment, not by the (impossible) 8-gram overlap."""
    corpus = spark.createDataFrame(
        [("c1", "alpha beta the secret answer gamma delta", "s"),
         ("c2", "totally unrelated text with many words here", "s")],
        "doc_id string, text string, source string")
    bench = spark.createDataFrame(
        [("b1", "the secret answer", "s")],
        "doc_id string, text string, source string")
    packed = curate_corpus(corpus, near_dup=False, benchmark=bench,
                           decontaminate_k=8, target_tokens=64)
    assert {r["doc_id"] for r in packed.collect()} == {"c2"}


def test_curate_exact_dedup_skew_safe_plan(spark):
    """Skew audit for the exact-dedup stage: a viral document (every copy
    hashing to ONE content key) must collapse in a partial aggregate
    before the shuffle — the plan has a partial_min over the content
    hash and NO window sorted by it (the old row_number formulation put
    the whole hot group on one task). Packing's windows (keyed by
    __shard / pack_id / the tiny __tot frame) are the only ones
    allowed."""
    # odd ids start at 1001 so no odd doc's [i, i+1, i+2] collides with
    # the viral constant payload [7, 8, 9]
    rows = [(i, [7, 8, 9], "s0") for i in range(0, 200, 2)] + [
        (1000 + i, [1000 + i, 1001 + i, 1002 + i], "s0")
        for i in range(1, 200, 2)
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, tokens array<int>, source string")
    packed = curate_corpus(docs, tokens_col="tokens", near_dup=False,
                           target_tokens=64)
    plan = packed._jdf.queryExecution().executedPlan().toString()
    assert "partial_min" in plan, plan
    for ln in plan.splitlines():
        if "windowspecdefinition" in ln:
            assert ("__shard" in ln) or ("pack_id" in ln) or ("__tot" in ln), ln
    # semantics: one survivor for the 100 identical-sequence copies (the
    # smallest id), every distinct sequence kept
    got = packed.select("doc_id").collect()
    ids = {r["doc_id"] for r in got}
    assert 0 in ids and not any(i in ids for i in range(2, 200, 2))
    assert ids.issuperset({1000 + i for i in range(1, 200, 2)})


def test_materialize_curated_end_to_end(spark, tmp_path):
    """Token-mode curation + pack materialization: every curated doc's
    tokens appear exactly once across the payloads of its (split,
    source), separators sit only between documents, and totals match
    the doc-level packed frame."""
    from traval_spark.curation import materialize_curated

    rows = [(i, list(range(i * 5, i * 5 + 4 + i % 3)), "s%d" % (i % 2))
            for i in range(60)]
    docs = spark.createDataFrame(
        rows, "doc_id long, tokens array<int>, source string")
    packed = curate_corpus(docs, tokens_col="tokens", near_dup=False,
                           target_tokens=24)
    out = str(tmp_path / "packs")
    materialize_curated(packed, docs, "tokens", out, sep_token=-7)
    m = spark.read.parquet(out)
    got = m.collect()
    assert set(m.columns) >= {"source", "pack_id", "tokens", "n_tok",
                              "n_docs", "doc_ids", "split"}
    doc_rows = packed.collect()
    n_docs_in = len(doc_rows)
    assert sum(r["n_docs"] for r in got) == n_docs_in
    assert sum(r["n_tok"] - (r["n_docs"] - 1) for r in got) == \
        sum(r["n_tok"] for r in doc_rows)
    seen = [d for r in got for d in r["doc_ids"]]
    assert sorted(seen) == sorted(r["doc_id"] for r in doc_rows)
    for r in got:
        assert r["tokens"].count(-7) == r["n_docs"] - 1
        assert r["tokens"][-1] != -7 and r["tokens"][0] != -7


def test_curate_tokens_trim_spans_stage(spark):
    """trim_spans_k stage: corpus-wide duplicated k-token boilerplate is
    trimmed out of every carrier, docs trimmed to nothing are dropped
    with their own stage metric, and n_tok reflects the trimmed length
    downstream."""
    boiler = list(range(9000, 9010))          # 10-token shared run
    rows = [
        (1, boiler + list(range(100, 120)), "s0"),
        (2, list(range(200, 220)) + boiler, "s0"),
        (3, boiler, "s0"),                    # nothing but boilerplate
        (4, list(range(300, 330)), "s0"),     # untouched
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, tokens array<int>, source string")
    metrics: dict = {}
    packed = curate_corpus(docs, tokens_col="tokens", near_dup=False,
                           trim_spans_k=5, target_tokens=64,
                           metrics=metrics)
    assert metrics["after_span_trim"] == metrics["after_exact_dedup"] - 1
    got = {r["doc_id"]: r["n_tok"] for r in packed.collect()}
    assert 3 not in got
    assert got[1] == 20 and got[2] == 20 and got[4] == 30

    # text mode refuses the stage
    tdocs = spark.createDataFrame(
        [(1, "a b c", "s0")], "doc_id long, text string, source string")
    import pytest as _pytest
    with _pytest.raises(ValueError, match="token-mode"):
        curate_corpus(tdocs, trim_spans_k=5)


def test_temperature_mix_rebalances_toward_uniform(spark):
    """alpha=0.5 keeps the smallest group whole and downsamples large
    groups toward n^alpha proportions; alpha=1 is the natural mix
    (keeps everything)."""
    import pandas as pd

    from traval_spark.operators.sampling import temperature_mix

    rows = ([("big", i) for i in range(1600)]
            + [("small", 10_000 + i) for i in range(100)])
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["source", "doc_id"])
    )
    kept = temperature_mix(df, alpha=0.5, seed=3).groupBy("source").count()
    k = {r["source"]: r["count"] for r in kept.collect()}
    # f_small = 1 -> all 100 kept; f_big = (16)^-0.5 = 0.25 -> ~400
    assert k["small"] == 100
    assert 320 <= k["big"] <= 480
    # alpha = 1: natural mix, nothing dropped
    assert temperature_mix(df, alpha=1.0, seed=3).count() == 1700


def test_bloom_decontamination_equals_exact_and_prefilters(spark):
    """The Bloom-prefiltered path is value-equal to the exact operator
    (FPs removed by the verify, no false negatives by construction),
    and the mask actually prunes: candidate shingle rows < total."""
    from traval_spark.operators.dedup import (
        contaminated_docs,
        contaminated_docs_bloom,
        token_shingles,
    )
    from traval_spark.sources.synth import synth_sequences

    seqs = synth_sequences(spark, 1500, seed=41, span_days=1)
    bench = seqs.filter(F.xxhash64("doc_id") % 29 == 0)
    corpus = seqs.filter(F.xxhash64("doc_id") % 29 != 0)

    got = contaminated_docs_bloom(corpus, bench, k=3, nbits=1 << 15)
    want = contaminated_docs(corpus, bench, k=3)
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0
