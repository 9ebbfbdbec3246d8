"""Streaming incremental embedding-moment tier: a foreachBatch ingest
that grows the covariance moment store one micro-batch at a time.

The daily/continuous embedding-ingest shape: each micro-batch of new
vectors is collapsed ONCE to its d(d+1)/2 exact moment cells
(operators/similarity.py:embedding_moments) and appended to the store;
because integer moment sums re-associate losslessly, the merged store
serves the covariance / correlation / PCA of EVERYTHING ingested so far
(cov_from_moments / pca_components) BIT-identically to a batch
recompute — old vectors are never re-read, the serving cost is the
|batches|·d² cell frame. Parity-tested: a maxFilesPerTrigger=1 drain
equals the one-shot batch embedding_cov exactly.

Store layout (dedup_stream.py conventions):

    {root}/moments/qid=<query_id>/batch_id=N/   (i, j, n, p, si, sj)

Writes are batch_id-keyed with ``_COMMITTED`` markers: checkpoint
replays skip committed batches, crashed partial writes are overwritten
wholesale, and uncommitted directories are invisible to the serve.

Ingest-exactly-once contract: a store accumulates ADDITIVE statistics,
so each vector must be ingested exactly once per store root. Within a
run the checkpoint guarantees that; pointing a NEW checkpoint/run at
input already ingested into the same root would double-count (unlike
the dedup fingerprint store, where replayed pairs collapse in a
distinct). One store root per logical stream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from traval_spark.streaming.rollup_stream import (
    _hadoop_exists,
    _hadoop_touch,
    _stream_query_id,
)

_MOMENT_SCHEMA = (
    "i int, j int, n long, p decimal(38,0), "
    "si decimal(38,0), sj decimal(38,0)"
)


def committed_moments(spark: SparkSession, store_root: str) -> DataFrame:
    """Every committed moment cell in the store (empty typed frame
    before the first commit). Uncommitted batch directories are
    invisible — same rule as dedup_stream._corpus_fp."""
    from traval_spark.sources import fsutil

    committed = fsutil.glob(
        spark, f"{store_root}/moments/qid=*/batch_id=*/_COMMITTED"
    )
    if committed:
        dirs = [p[: -len("/_COMMITTED")] for p in committed]
        return (
            spark.read.option("basePath", f"{store_root}/moments")
            .parquet(*dirs)
            .select("i", "j", "n", "p", "si", "sj")
        )
    return spark.createDataFrame([], _MOMENT_SCHEMA)


def moments_upsert_batch(
    batch_df: DataFrame,
    batch_id: int,
    store_root: str,
    run_id: str | None = None,
    emb: str = "embedding",
    value_scale: int = 1_000_000,
) -> None:
    """One idempotent micro-batch step: collapse the batch to its exact
    moment cells and append them (skip wholesale if ``_COMMITTED``)."""
    from traval_spark.operators.similarity import embedding_moments

    if batch_df.isEmpty():
        return
    s = batch_df.sparkSession
    mdir = (f"{store_root}/moments/qid={run_id or 'default'}"
            f"/batch_id={batch_id}")
    if _hadoop_exists(s, f"{mdir}/_COMMITTED"):
        return
    cells = embedding_moments(batch_df, emb=emb, value_scale=value_scale)
    cells.write.mode("overwrite").parquet(mdir)
    _hadoop_touch(s, f"{mdir}/_COMMITTED")


def run_streaming_moments(
    spark: SparkSession,
    input_path: str,
    store_root: str,
    checkpoint_path: str,
    schema: str = "vec_id long, embedding array<float>, label int",
    emb: str = "embedding",
    value_scale: int = 1_000_000,
    max_files_per_trigger: int | None = None,
    available_now: bool = True,
):
    """Drain an embedding directory through the incremental moment sink
    (availableNow catch-up + exactly-once checkpoint semantics, same
    shape as run_streaming_dedup). ``input_path`` must be a directory."""
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option(
            "maxFilesPerTrigger", int(max_files_per_trigger)
        )
    vecs = reader.parquet(input_path)

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        moments_upsert_batch(
            batch_df, batch_id, store_root,
            run_id=_stream_query_id(checkpoint_path),
            emb=emb, value_scale=value_scale,
        )

    writer = (
        vecs.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_path)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    q = writer.start()
    if available_now:
        q.awaitTermination()
    return q
