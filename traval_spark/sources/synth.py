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
    doc_id = F.format_string("doc-%012d", F.col("id"))

    def h(tag: str):
        return F.xxhash64(doc_id, F.lit(tag), F.lit(seed))

    # geometric source skew: bucket u in [0, 2^n_sources); source_k gets
    # the dyadic slice [2^(n_sources-1-k), 2^(n_sources-k)) -> k=0 gets 1/2,
    # k=1 gets 1/4, ...; the last slice absorbs the remainder.
    scale = 1 << n_sources
    u = F.pmod(h("src"), F.lit(scale))
    source = None
    for k in range(n_sources - 1):
        lo = 1 << (n_sources - 1 - k)  # slice [2^(S-1-k), 2^(S-k))
        cond = u >= F.lit(lo)
        branch = F.lit(f"source_{k:02d}")
        source = F.when(cond, branch) if source is None else source.when(
            cond, branch
        )
    source = source.otherwise(F.lit(f"source_{n_sources - 1:02d}"))

    n_tok = (F.pmod(h("len"), F.lit(max_tok)) + 1).cast("int")
    ts = (
        F.to_timestamp_ntz(F.lit(start))
        + F.make_dt_interval(
            F.lit(0), F.lit(0), F.lit(0),
            F.pmod(h("ts"), F.lit(span_days * 86400)).cast("double"),
        )
    )
    tokens = F.transform(
        F.sequence(F.lit(1), n_tok),
        lambda i: F.pmod(F.xxhash64(doc_id, i, F.lit(seed)), F.lit(VOCAB)).cast(
            "int"
        ),
    )

    return rng.select(
        doc_id.alias("doc_id"),
        tokens.alias("tokens"),
        n_tok.alias("n_tok"),
        source.alias("source"),
        ts.alias("ts"),
    )
