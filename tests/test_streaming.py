"""Streaming incremental 1m rollup == batch 1m rollup (finalized windows)."""

from __future__ import annotations

from pyspark.sql import functions as F

from traval_spark.rollup import rollup_raw
from traval_spark.sources.synth import synth_sequences
from traval_spark.streaming.rollup_stream import run_incremental_rollup


def test_streaming_rollup_matches_batch(spark, tmp_path):
    inp = str(tmp_path / "in")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    seqs = synth_sequences(spark, 4000, seed=42, span_days=1)
    # two file batches, as if arriving over time
    seqs.filter(F.dayofyear("ts") >= 0).limit(0)  # no-op keep lazy simple
    a = seqs.filter(F.xxhash64("doc_id") % 2 == 0)
    b = seqs.exceptAll(a)
    a.write.mode("append").parquet(inp)
    b.write.mode("append").parquet(inp)

    run_incremental_rollup(spark, inp, out, ckpt, watermark="1 minute",
                           available_now=True)
    streamed = spark.read.parquet(out)

    batch = rollup_raw(seqs, "1m")
    # append mode only emits windows finalized by the watermark: every
    # streamed bucket must exactly match its batch twin, and the stream
    # must have finalized all but the trailing (watermark-held) buckets
    joined = streamed.alias("s").join(
        batch.alias("b"), on=["source", "bucket"], how="left"
    )
    mismatches = joined.filter(
        (F.col("s.n_points") != F.col("b.n_points"))
        | (F.col("s.sum_tok") != F.col("b.sum_tok"))
        | (F.col("s.min_tok") != F.col("b.min_tok"))
        | (F.col("s.max_tok") != F.col("b.max_tok"))
    ).count()
    assert mismatches == 0
    assert streamed.count() >= batch.count() * 0.9  # only tail held back


def test_streaming_resume_is_incremental(spark, tmp_path):
    """New files after a restart are processed from the checkpoint, not
    from scratch (exactly-once per input file)."""
    inp = str(tmp_path / "in")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    seqs = synth_sequences(spark, 3000, seed=1, span_days=1)
    first = seqs.filter(F.xxhash64("doc_id") % 3 != 0)
    rest = seqs.exceptAll(first)

    first.write.mode("append").parquet(inp)
    run_incremental_rollup(spark, inp, out, ckpt, watermark="1 minute")
    n1 = spark.read.parquet(out).count()

    rest.write.mode("append").parquet(inp)
    run_incremental_rollup(spark, inp, out, ckpt, watermark="1 minute")
    n2 = spark.read.parquet(out).count()
    assert n2 >= n1  # second drain appended newly finalized windows only
