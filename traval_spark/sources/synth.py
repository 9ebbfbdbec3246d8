"""Deterministic synthetic tokenized-sequence generator (FIXTURES.md F6).

Generates the graft input table (BASELINE.json input_hint):

    doc_id: string, tokens: array<int32>, n_tok: int32, source: string

plus a derived event-time ``ts`` (timestamp_ntz) that drives rollup
buckets. Everything is a pure function of (row id, seed) computed with
JVM-side ``xxhash64`` — no Python, no randomness, no driver loops — so the
same (n, seed) yields byte-identical tables at any parallelism, any
cluster size, and any scale from 10^3 test rows to the 10^12-sequence
target (it is ``spark.range`` + column expressions all the way down).

The ``source`` key is geometrically skewed: source_00 holds ~50% of rows,
source_01 ~25%, ... (SURVEY.md §7.2 "one source holds 50% of rows") to
exercise explicit salting in the rollup engine.

Plan-shape note: built as staged selects so ``doc_id`` and each hash are
materialized ONCE per row. A single flat projection re-inlines
``format_string``+``xxhash64`` into every consumer (the 8-branch source
CASE alone would recompute the hash 8x); CollapseProject keeps the stages
apart because the producer expressions are non-cheap and multiply used.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

VOCAB = 50_257  # GPT-2-ish vocab size for token values


def synth_sequences(
    spark: SparkSession,
    n: int,
    seed: int = 42,
    n_sources: int = 8,
    max_tok: int = 256,
    span_days: int = 3,
    start: str = "2024-01-01",
    partitions: int | None = None,
) -> DataFrame:
    """Build the deterministic tokenized-sequences table.

    Parameters
    ----------
    n : int
        row count (documents).
    max_tok : int
        sequence lengths are uniform in [1, max_tok].
    span_days : int
        event times spread uniformly over [start, start + span_days).
    """
    rng = spark.range(0, n, 1, numPartitions=partitions)

    # stage 1: doc_id materialized once
    s1 = rng.select(F.format_string("doc-%012d", F.col("id")).alias("doc_id"))

    # stage 2: one hash per derived attribute, each computed once
    def h(tag: str):
        return F.xxhash64(F.col("doc_id"), F.lit(tag), F.lit(seed))

    scale = 1 << n_sources
    s2 = s1.select(
        "doc_id",
        F.pmod(h("src"), F.lit(scale)).alias("__u"),
        (F.pmod(h("len"), F.lit(max_tok)) + 1).cast("int").alias("n_tok"),
        F.pmod(h("ts"), F.lit(span_days * 86400)).cast("double").alias("__off"),
    )

    # stage 3: geometric source skew — source_k gets the dyadic slice
    # [2^(S-1-k), 2^(S-k)); the last source absorbs the remainder
    source = None
    for k in range(n_sources - 1):
        lo = 1 << (n_sources - 1 - k)
        cond = F.col("__u") >= F.lit(lo)
        branch = F.lit(f"source_{k:02d}")
        source = F.when(cond, branch) if source is None else source.when(
            cond, branch
        )
    source = source.otherwise(F.lit(f"source_{n_sources - 1:02d}"))

    ts = F.to_timestamp_ntz(F.lit(start)) + F.make_dt_interval(
        F.lit(0), F.lit(0), F.lit(0), F.col("__off")
    )
    base = s2.select(
        "doc_id",
        "n_tok",
        source.alias("source"),
        ts.alias("ts"),
        F.pmod(h("tok"), F.lit(1 << 31)).alias("__tokseed"),
    )

    # token arrays: vectorized numpy kernel (one flat modular-arithmetic
    # pass over all elements of a batch). An equivalent JVM
    # transform(sequence(...), xxhash64) measured ~1M elem/s (interpreted
    # higher-order lambda); this emits >50M elem/s and is equally
    # deterministic — content is a pure function of (doc hash, position).
    def gen_tokens(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            n = pdf["n_tok"].to_numpy(dtype=np.int64)
            seeds = pdf["__tokseed"].to_numpy(dtype=np.int64)
            total = int(n.sum())
            starts = np.concatenate(([0], np.cumsum(n)[:-1]))
            pos = np.arange(total, dtype=np.int64) - np.repeat(starts, n)
            flat = (
                (np.repeat(seeds, n) * 2654435761 + pos * 40503 + seed)
                % VOCAB
            ).astype(np.int32)
            bounds = np.cumsum(n)[:-1]
            pdf = pdf.drop(columns=["__tokseed"])
            pdf["tokens"] = pd.Series(
                np.split(flat, bounds), index=pdf.index
            )
            yield pdf[["doc_id", "tokens", "n_tok", "source", "ts"]]

    out_schema = (
        "doc_id string, tokens array<int>, n_tok int, source string, "
        "ts timestamp_ntz"
    )
    return base.mapInPandas(gen_tokens, schema=out_schema)
