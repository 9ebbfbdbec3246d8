"""Incremental rollup via Structured Streaming (optional engine mode).

The reference is strictly batch (SURVEY.md §1.3: zero streaming
constructs), and the north-rule tiers are batch cascades with
checkpoint/resume. This module adds the natural streaming twin: new
tokenized-sequence files land in a directory, the 1m tier updates
incrementally with watermarked tumbling windows, and the batch cascade
(1h/1d) re-aggregates from the streamed 1m tier — identical tier
semantics, verified against the batch rollup in tests.

Late data: events older than the watermark relative to the max seen ts
are dropped by Spark's state eviction — the batch job remains the
source of truth for full-history rebuilds (standard lambda-style split).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: input schema = the graft table (BASELINE.json input_hint) + event time
SEQUENCE_SCHEMA = (
    "doc_id string, tokens array<int>, n_tok int, source string, "
    "ts timestamp_ntz"
)


def _stream_leaf_1m(
    spark: SparkSession,
    input_path: str,
    watermark: str,
    max_files_per_trigger: int,
    extra_keys: list,
    aggs: list,
    pre_filter=None,
    pre_transform=None,
) -> DataFrame:
    """Shared scaffolding for every streaming 1m leaf tier (rollup,
    histogram, DDSketch, KMV distinct): file-source readStream ->
    watermark -> tumbling-window groupBy(source, 1m window, *extra_keys)
    -> aggs. One copy so the shared contract (SEQUENCE_SCHEMA, the ts
    cast — watermark requires TIMESTAMP, window start cast back to NTZ
    to match the batch tier schema — and the watermark plumbing) cannot
    drift between tier kinds."""
    stream = (
        spark.readStream.schema(SEQUENCE_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_path)
    )
    stream = stream.withColumn("ts", F.col("ts").cast("timestamp"))
    if pre_filter is not None:
        stream = stream.filter(pre_filter)
    if pre_transform is not None:
        # row-shape rewrite (e.g. the CMS depth-way explode) BEFORE the
        # windowed agg; must preserve source + ts
        stream = pre_transform(stream)
    agg = (
        stream.withWatermark("ts", watermark)
        .groupBy("source", F.window("ts", "1 minute").alias("w"),
                 *extra_keys)
        .agg(*aggs)
    )
    rest = [c for c in agg.columns if c not in ("source", "w")]
    return agg.select(
        "source", F.col("w.start").cast("timestamp_ntz").alias("bucket"),
        *rest,
    )


def stream_rollup_1m(
    spark: SparkSession,
    input_path: str,
    watermark: str = "2 minutes",
    max_files_per_trigger: int = 64,
) -> DataFrame:
    """Streaming 1m tier: file-source readStream -> watermark -> tumbling
    window agg. Same measures as the batch tier (count/sum/min/max n_tok).
    """
    return _stream_leaf_1m(
        spark, input_path, watermark, max_files_per_trigger,
        extra_keys=[],
        aggs=[
            F.count("n_tok").alias("n_points"),
            F.sum("n_tok").alias("sum_tok"),
            F.min("n_tok").alias("min_tok"),
            F.max("n_tok").alias("max_tok"),
        ],
    )


def stream_hist_1m(
    spark: SparkSession,
    input_path: str,
    value_col: str = "n_tok",
    scale: int = 1,
    watermark: str = "2 minutes",
    max_files_per_trigger: int = 64,
) -> DataFrame:
    """Streaming leaf histogram tier (hist.py long form): (source, bucket,
    bin, cnt) per finalized 1m window — counts-only state, so the
    streaming agg carries the same bounded per-(bucket, bin) long as the
    batch tier row it becomes."""
    b = F.round(F.col(value_col) * scale).cast("long")
    return _stream_leaf_1m(
        spark, input_path, watermark, max_files_per_trigger,
        extra_keys=[b.alias("bin")],
        aggs=[F.count(F.lit(1)).alias("cnt")],
        pre_filter=F.col(value_col).isNotNull(),
    )


def stream_dds_1m(
    spark: SparkSession,
    input_path: str,
    value_col: str = "n_tok",
    alpha: float = 0.05,
    watermark: str = "2 minutes",
    max_files_per_trigger: int = 64,
) -> DataFrame:
    """Streaming leaf DDSketch tier (hist.py log-binned long form):
    (source, bucket, sign, bin, cnt) per finalized 1m window — the
    unbounded-domain quantile companion to :func:`stream_hist_1m`, same
    counts-only bounded state, identical rows to the batch dds_tier so
    dds_cascade/dds_quantiles serve the streamed store unchanged (the
    bin definition is shared — hist.py:dds_sign_bin — so the streamed
    leaf and the batch tier bucket identically by construction)."""
    from traval_spark.hist import dds_sign_bin

    v = F.col(value_col)
    sign, bin_ = dds_sign_bin(v, alpha)
    return _stream_leaf_1m(
        spark, input_path, watermark, max_files_per_trigger,
        extra_keys=[sign.alias("sign"), bin_.alias("bin")],
        aggs=[F.count(F.lit(1)).alias("cnt")],
        pre_filter=v.isNotNull(),
    )


def stream_distinct_1m(
    spark: SparkSession,
    input_path: str,
    key_col: str = "n_tok",
    k: int = 256,
    watermark: str = "2 minutes",
    max_files_per_trigger: int = 64,
) -> DataFrame:
    """Streaming leaf KMV distinct-sketch tier (sketch.py): (source,
    bucket, kmv) per finalized 1m window.  collect_set keeps the
    per-window distinct hash set in state — bounded by the minute
    bucket's cardinality, exactly the batch leaf-agg contract."""
    from traval_spark.sketch import kmv_agg

    return _stream_leaf_1m(
        spark, input_path, watermark, max_files_per_trigger,
        extra_keys=[],
        aggs=[kmv_agg(key_col, k).alias("kmv")],
    )


def stream_cms_1m(
    spark: SparkSession,
    input_path: str,
    key_col: str = "n_tok",
    depth: int = 4,
    width: int = 256,
    watermark: str = "2 minutes",
    max_files_per_trigger: int = 64,
) -> DataFrame:
    """Streaming leaf count-min tier (sketch.py long-form grid):
    (source, bucket, d, w, cnt) per finalized 1m window — the frequency
    companion to :func:`stream_hist_1m`. The depth-way cell explode runs
    BEFORE the windowed agg (same portable md5 hash ladder as the batch
    cms_tier), so state stays counts-only and the streamed rows are
    identical to batch cms_tier rows: cms_cascade / cms_point /
    read_routed_cms serve the streamed store unchanged."""
    from traval_spark.operators.sampling import hash_uniform

    key = F.col(key_col).cast("string")
    cells = F.array(*[
        F.struct(
            F.lit(d).alias("d"),
            F.floor(hash_uniform(key, seed=d) * F.lit(int(width)))
            .cast("int").alias("w"),
        )
        for d in range(int(depth))
    ])
    # the width key is aggregated as __w: the shared helper's tumbling
    # window is aliased `w`, and a bare `w` grouping column would make
    # the helper's `w.start` projection ambiguous
    out = _stream_leaf_1m(
        spark, input_path, watermark, max_files_per_trigger,
        extra_keys=[F.col("__c.d").alias("d"), F.col("__c.w").alias("__w")],
        aggs=[F.count(F.lit(1)).alias("cnt")],
        pre_filter=key.isNotNull(),
        pre_transform=lambda df: df.select(
            "source", "ts", F.explode(cells).alias("__c")
        ),
    )
    return out.withColumnRenamed("__w", "w").select(
        "source", "bucket", "d", "w", "cnt"
    )


def run_incremental_rollup(
    spark: SparkSession,
    input_path: str,
    output_path: str,
    checkpoint_path: str,
    watermark: str = "2 minutes",
    available_now: bool = True,
):
    """Run the streaming 1m rollup to parquet with exactly-once checkpoints.

    available_now=True drains everything currently in the directory and
    stops (incremental batch catch-up); False runs continuously.
    Append output mode: a window only emits once its watermark passes —
    finalized buckets, never rewritten, exactly the batch tier rows.
    """
    agg = stream_rollup_1m(spark, input_path, watermark)
    writer = (
        agg.writeStream.format("parquet")
        .option("path", output_path)
        .option("checkpointLocation", checkpoint_path)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    q = writer.start()
    if available_now:
        q.awaitTermination()
    return q


def _hadoop_exists(spark: SparkSession, path: str) -> bool:
    """Existence check through the Hadoop FS API (works for any store the
    session can write to, not just the local filesystem)."""
    from traval_spark.sources import fsutil

    return fsutil.exists(spark, path)


def _hadoop_touch(spark: SparkSession, path: str) -> None:
    """Create an empty marker file (underscore-prefixed files are ignored
    by Spark's file listing)."""
    from traval_spark.sources import fsutil

    fsutil.touch(spark, path)


def _stream_query_id(checkpoint_path: str) -> str | None:
    """The streaming query id from ``{checkpoint}/metadata`` — written by
    Spark at query start, STABLE across restarts of the same checkpoint,
    and regenerated for a fresh checkpoint. The correct idempotency scope
    for batch_id-keyed sinks: batch numbering restarts at 0 with a fresh
    checkpoint, so un-scoped batch dirs from an earlier run would falsely
    satisfy the already-written check and silently drop the new data."""
    import json

    try:
        with open(f"{checkpoint_path}/metadata") as f:
            return json.load(f)["id"]
    except (OSError, KeyError, ValueError):
        return None


def cascade_upsert_batch(
    batch_df: DataFrame, batch_id: int, store_root: str,
    run_id: str | None = None,
) -> None:
    """One idempotent micro-batch step of the continuous-aggregate cascade.

    1. write this batch's 1m rows under
       ``{store_root}/1m/qid=<run_id>/batch_id=N`` (day-partitioned
       inside; ``run_id`` = the streaming query id, see
       :func:`_stream_query_id`). The write is **idempotent within a
       checkpoint lineage**: a replayed batch (same query id + batch_id,
       same deterministic content) finds the batch directory's
       ``_COMMITTED`` marker (written by THIS sink after the data
       commits — dynamic-partition-overwrite writes produce no
       ``_SUCCESS``) and skips; a partial directory from a crashed
       attempt (no marker) is overwritten wholesale. The 1m tier
       therefore never holds duplicate rows from replays, and the
       marker doubles as the compaction tombstone
       (:func:`compact_stream_store`). A FRESH
       checkpoint pointed at an existing store gets a new query id, so
       its batches land instead of being silently skipped (reprocessing
       the same input under a new checkpoint appends a second copy —
       detectable via the qid column; rebuild from the batch cascade to
       reconcile, the documented lambda split).
    2. recompute the 1h tier for ONLY the days touched by this batch by
       re-aggregating the (partition-pruned) 1m tier, and replace just
       those day partitions via dynamic partition overwrite;
    3. same for 1d from 1h.

    A replay that crashed between steps 1 and 3 re-runs 2/3 as full
    recomputes of their day partitions over the duplicate-free 1m tier,
    so every tier converges to the exact batch-cascade result.
    """
    from traval_spark.rollup import rollup_cascade

    if batch_df.isEmpty():
        return
    day = F.date_trunc("day", F.col("bucket")).cast("date").alias("day")
    s = batch_df.sparkSession
    batch_df = batch_df.withColumn("day", day)
    bdir = f"{store_root}/1m/qid={run_id or 'default'}/batch_id={batch_id}"
    if not _hadoop_exists(s, f"{bdir}/_COMMITTED"):
        # enforce dynamic overwrite on the writer: under a session with
        # the static default this would otherwise truncate sibling
        # partitions
        (
            batch_df.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("day").parquet(bdir)
        )
        _hadoop_touch(s, f"{bdir}/_COMMITTED")
    days = [r["day"] for r in batch_df.select("day").distinct().collect()]
    t1m = (
        s.read.parquet(f"{store_root}/1m")
        .filter(F.col("day").isin(days))
    )
    t1h = rollup_cascade(
        t1m.drop("day", "batch_id", "qid"), "1h"
    ).withColumn("day", day)
    # dynamic overwrite enforced per-writer (not just the session
    # default): only the touched day directories are replaced
    (
        t1h.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("day").parquet(f"{store_root}/1h")
    )
    t1h_all = (
        s.read.parquet(f"{store_root}/1h")
        .filter(F.col("day").isin(days))
    )
    t1d = rollup_cascade(t1h_all.drop("day"), "1d").withColumn("day", day)
    (
        t1d.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("day").parquet(f"{store_root}/1d")
    )


#: qid used for compacted data — never a real streaming query id
COMPACT_QID = "__compact"


def compact_stream_store(
    spark: SparkSession, store_root: str, before_day
) -> int:
    """Compact the 1m tier's batch-dir small files for finalized days.

    The idempotent sink writes one directory per (query id, micro-batch)
    — correct, but at 100 TB the 1m tier accrues thousands of small
    files per day. For days strictly before ``before_day`` (choose a cut
    safely behind the watermark: those days can no longer receive new
    windows or replays), this:

    1. rewrites all their rows — batch dirs AND previously compacted
       data — into ``qid=__compact`` day partitions via dynamic
       partition overwrite (one consolidated file set per day);
    2. deletes the now-redundant day subdirectories from the source
       batch dirs, KEEPING each batch dir and its ``_COMMITTED`` marker
       as a tombstone, so a late replay of an old batch still finds its
       marker and skips instead of resurrecting the rows.

    Crash-safe by invariant, not ordering: 1m rows are unique per
    (source, bucket) — append-mode windows + the idempotent batch sink —
    so the consolidation always runs ``dropDuplicates(source, bucket)``.
    A crash between the overwrite commit and the source deletes leaves
    visible duplicates, and a RERUN collapses them (the dedupe makes the
    whole operation convergent); re-running after full success is a
    no-op rewrite. Returns the number of day partitions compacted.
    Row-for-row lossless (asserted in tests).
    """
    from pyspark.sql.utils import AnalysisException

    try:
        t1m = spark.read.parquet(f"{store_root}/1m")
    except AnalysisException:
        return 0
    cut = pd.Timestamp(before_day).date()
    # only days that still have un-compacted source rows; fully compacted
    # days would just be rewritten identically
    days = [
        r["day"]
        for r in t1m.filter(
            (F.col("day") < F.lit(cut))
            & (F.col("qid") != COMPACT_QID)
        ).select("day").distinct().collect()
    ]
    if not days:
        return 0
    old = t1m.filter(F.col("day").isin(days))
    consolidated = (
        old.drop("qid", "batch_id").dropDuplicates(["source", "bucket"])
        # eager materialization BEFORE the write: the target dir is under
        # the path being read, and overwriting files still referenced by
        # the lazy plan is the classic self-overwrite corruption. (At
        # warehouse scale: stage to a temp table instead.)
        .localCheckpoint(eager=True)
    )
    (
        # batch_id=0 level keeps the partition-directory depth uniform
        # with the live batch dirs (qid/batch_id/day) for discovery.
        # Dynamic overwrite ENFORCED on the writer: under a static-mode
        # session this overwrite would truncate previously compacted
        # days whose source dirs are already deleted — silent data loss
        consolidated.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("day")
        .parquet(f"{store_root}/1m/qid={COMPACT_QID}/batch_id=0")
    )
    # drop the compacted day dirs from every source batch dir (markers
    # and batch dirs themselves stay as replay tombstones)
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    root = jvm.org.apache.hadoop.fs.Path(f"{store_root}/1m")
    fs = root.getFileSystem(conf)
    for qdir in fs.listStatus(root):
        qname = qdir.getPath().getName()
        if not qdir.isDirectory() or qname == f"qid={COMPACT_QID}":
            continue
        for bdir in fs.listStatus(qdir.getPath()):
            if not bdir.isDirectory():
                continue
            for ddir in fs.listStatus(bdir.getPath()):
                name = ddir.getPath().getName()
                if not name.startswith("day="):
                    continue
                if pd.Timestamp(name[4:]).date() < cut:
                    fs.delete(ddir.getPath(), True)
    return len(days)


def run_streaming_cascade(
    spark: SparkSession,
    input_path: str,
    store_root: str,
    checkpoint_path: str,
    watermark: str = "2 minutes",
    available_now: bool = True,
    max_files_per_trigger: int = 64,
):
    """Continuous aggregates: keep the FULL 1m->1h->1d cascade current as
    sequence files arrive, TimescaleDB-continuous-aggregate style.

    Per micro-batch of watermark-finalized 1m windows (append-mode
    semantics: each window arrives exactly once), runs
    :func:`cascade_upsert_batch` — idempotent under checkpoint replay
    (batch_id-keyed 1m writes + full day-partition recomputes of the
    coarse tiers), so an interrupted-and-replayed batch cannot
    double-count in any tier. The batch-mode ``rollup_cascade`` remains
    the source of truth for full-history rebuilds (lambda split as in
    :func:`run_incremental_rollup`).

    At 100 TB the per-batch work is bounded by (touched days x sources):
    the coarse-tier recomputes scan the pruned 1m/1h day partitions
    (thousands of rows), never the raw sequence table.
    """
    agg = stream_rollup_1m(spark, input_path, watermark,
                           max_files_per_trigger=max_files_per_trigger)

    writer = (
        agg.writeStream.foreachBatch(
            lambda df, bid: cascade_upsert_batch(
                df, bid, store_root,
                run_id=_stream_query_id(checkpoint_path),
            )
        )
        .option("checkpointLocation", checkpoint_path)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    q = writer.start()
    if available_now:
        q.awaitTermination()
    return q


def stream_sessionize(
    spark: SparkSession,
    input_path: str,
    gap: str = "30m",
    watermark: str = "2 minutes",
    max_files_per_trigger: int = 64,
) -> DataFrame:
    """Streaming gap-based sessionization of sequence file drops per
    source: the SAME native session_window aggregation as the batch
    :func:`traval_spark.rollup.session_rollup` runs under a watermark —
    sessions emit (append mode) once the watermark passes their close,
    after which they can no longer merge. Emitted sessions are therefore
    exactly the batch result restricted to watermark-finalized sessions
    (asserted in tests)."""
    from traval_spark.functions.ts import gap_micros

    g_us = gap_micros(gap)  # same parser as batch session_rollup
    stream = (
        spark.readStream.schema(SEQUENCE_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_path)
        .select(
            "source",
            F.col("ts").cast("timestamp").alias("ts"),
            F.col("n_tok").cast("double").alias("value"),
        )
    )
    out = (
        stream.withWatermark("ts", watermark)
        .groupBy(
            F.col("source"),
            F.session_window(F.col("ts"), f"{g_us} microseconds").alias("w"),
        )
        .agg(
            F.count("*").alias("n_events"),
            F.sum("value").alias("sum_value"),
        )
    )
    return out.select(
        "source",
        F.col("w.start").cast("timestamp_ntz").alias("session_start"),
        F.timestamp_micros(
            F.unix_micros(F.col("w.end")) - F.lit(g_us)
        ).cast("timestamp_ntz").alias("session_end_ts"),
        "n_events",
        "sum_value",
    )


def stream_bloom_1m(
    spark: SparkSession,
    input_path: str,
    key_col: str = "n_tok",
    nhash: int = 4,
    nbits: int = 4096,
    watermark: str = "2 minutes",
    max_files_per_trigger: int = 64,
) -> DataFrame:
    """Streaming leaf Bloom membership tier (sketch.py long-form set
    bits): distinct (source, bucket, bit) per finalized 1m window — the
    membership companion to :func:`stream_cms_1m`. The nhash-way bit
    explode runs BEFORE the windowed agg (same portable md5 hash ladder
    as the batch bloom_tier), state is one row per distinct set bit, and
    the streamed rows are identical to batch bloom_tier rows:
    bloom_cascade / bloom_probe / read_routed_bloom serve the streamed
    store unchanged."""
    from traval_spark.sketch import bloom_bits

    key = F.col(key_col).cast("string")
    out = _stream_leaf_1m(
        spark, input_path, watermark, max_files_per_trigger,
        extra_keys=[F.col("bit")],
        aggs=[F.count(F.lit(1)).alias("__n")],
        pre_filter=key.isNotNull(),
        pre_transform=lambda df: df.select(
            "source", "ts",
            F.explode(bloom_bits(key, nhash, nbits)).alias("bit"),
        ),
    )
    return out.select("source", "bucket", "bit")


def stream_m4_1m(
    spark: SparkSession,
    input_path: str,
    value_col: str = "n_tok",
    watermark: str = "2 minutes",
    max_files_per_trigger: int = 64,
) -> DataFrame:
    """Streaming leaf M4 visual-downsample tier
    (operators/downsample.py): first/last/min/max points with the
    pinned tie rules per finalized 1m window.  The aggregate list is
    the SAME ``m4_aggs()`` the batch operator uses (tie rules cannot
    drift), state per (source, window) is four (us, value) extremes —
    bounded — and the streamed rows are identical to batch
    ``m4_downsample`` rows, so ``m4_merge`` / ``read_routed_m4`` serve
    the streamed store unchanged."""
    from traval_spark.operators.downsample import m4_aggs, m4_project

    out = _stream_leaf_1m(
        spark, input_path, watermark, max_files_per_trigger,
        extra_keys=[],
        aggs=m4_aggs(),
        pre_filter=F.col(value_col).isNotNull(),
        pre_transform=lambda df: df.select(
            "source", "ts",
            F.unix_micros(F.col("ts")).alias("__us"),
            F.col(value_col).alias("__v"),
        ),
    )
    return m4_project(out, ["source", "bucket"])


def stream_burst_dedup(
    spark: SparkSession,
    input_path: str,
    gap: str = "5m",
    watermark: str = "2 minutes",
    max_files_per_trigger: int = 64,
) -> DataFrame:
    """Streaming at-least-once ingest cleanup: the SAME session_window
    burst collapse as the batch :func:`traval_spark.rollup.burst_dedup`
    (per source, every transitive <=gap burst reduces to its first
    (ts, doc_id) row + dropped count), run under a watermark so a burst
    emits once it can no longer grow. Emitted rows are exactly the
    batch result restricted to watermark-finalized bursts — same
    contract (and parity test shape) as :func:`stream_sessionize`."""
    from traval_spark.functions.ts import gap_micros

    g_us = gap_micros(gap)
    stream = (
        spark.readStream.schema(SEQUENCE_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_path)
        .select(
            "source",
            F.col("ts").cast("timestamp").alias("ts"),
            "doc_id",
        )
    )
    first = F.min(
        F.struct(F.col("ts").alias("t"), F.col("doc_id").alias("i"))
    ).alias("__f")
    out = (
        stream.withWatermark("ts", watermark)
        .groupBy(
            "source",
            F.session_window(F.col("ts"), f"{g_us} microseconds"),
        )
        .agg(first, (F.count(F.lit(1)) - F.lit(1)).alias("n_dropped"))
    )
    return out.select(
        "source",
        F.col("__f.t").cast("timestamp_ntz").alias("first_ts"),
        F.col("__f.i").alias("first_ident"),
        "n_dropped",
    )


def stream_fl_1m(
    spark: SparkSession,
    input_path: str,
    value_col: str = "n_tok",
    watermark: str = "2 minutes",
    max_files_per_trigger: int = 64,
) -> DataFrame:
    """Streaming leaf first/last tier (rollup.py:fl_rollup): the
    TimescaleDB ``first(value, time)`` / ``last(value, time)`` pair
    per finalized 1m window, as the SAME lexicographically-ordered
    (epoch-us, ident, value) struct min/max the batch operator stores
    — state per (source, window) is two structs, bounded, and the
    streamed rows are identical to batch ``fl_rollup`` rows so
    ``fl_cascade`` / ``read_routed_fl`` / ``locf_from_tier`` /
    ``fl_increase`` serve the streamed store unchanged."""
    obs = F.struct(
        F.unix_micros(F.col("ts")).alias("u"),
        F.col("doc_id").alias("i"),
        F.col(value_col).cast("double").alias("v"),
    )
    return _stream_leaf_1m(
        spark, input_path, watermark, max_files_per_trigger,
        extra_keys=[],
        aggs=[F.min("__obs").alias("first"),
              F.max("__obs").alias("last")],
        pre_filter=F.col(value_col).isNotNull(),
        pre_transform=lambda df: df.select(
            "source", "ts", obs.alias("__obs")
        ),
    )
