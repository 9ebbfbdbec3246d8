"""Corpus-curation job: quality filter -> dedup -> decontaminate ->
mixture down-sampling -> split assignment -> sequence packing, as one
spark-submit entry with a per-stage metrics manifest.

The production wrapper over the individually-oracle-verified stages
(operators/text.filter_documents, operators/dedup, operators/sampling,
packing) — what a real curation run needs beyond the operators
themselves is the LINEAGE: how many documents each stage dropped, with
what parameters, written next to the output (`_curation_metrics.json`)
so a later audit can explain every missing document. Each stage count
is one action over a cached frame — the disclosed cost of metrics;
leave ``metrics=None`` for a single-action lazy run.

Every stage is deterministic (hash sampling, ordered dedup
representatives, hash splits), so re-running the job on the same input
reproduces the output byte-for-byte — the same resume story as the
rollup pipeline's fingerprint checkpoints, achieved here by purity
instead of state.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def curate_corpus(
    docs: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    source_col: str = "source",
    quality: dict | None = None,
    near_dup: bool = True,
    max_hamming: int = 3,
    benchmark: DataFrame | None = None,
    decontaminate_k: int = 8,
    weights: dict[str, float] | None = None,
    splits: list[tuple[str, float]] | None = None,
    target_tokens: int = 2048,
    seed: int = 0,
    metrics: dict | None = None,
) -> DataFrame:
    """Run the curation chain, returning the packed corpus frame
    (id, source, n_tok, split, pack_id, pack_pos). Stages (each
    skippable):

    1. quality: ``filter_documents(**quality)`` kept-verdict semi-join
       (dict of gate thresholds; None skips);
    2. exact dedup: keep the smallest id per identical text;
    3. near-dup (``near_dup=True``): banded SimHash pairs -> star
       connected components -> keep cluster representatives;
    4. decontamination (``benchmark=`` docs frame): drop documents
       sharing >= 1 k-word shingle with the benchmark;
    5. mixture (``weights=``): per-source keep-fractions (seed+1);
    6. split (``splits=``, default 98/1/1 train/val/test, seed+2);
    7. packing: contiguous ``target_tokens`` packs per (split, source).

    ``metrics``: pass a dict to collect per-stage surviving-document
    counts into it (one count action per stage).
    """
    from traval_spark.operators.dedup import (
        connected_components,
        shingles,
        simhash64_dup_pairs,
    )
    from traval_spark.operators.sampling import mixture_sample, split_assign
    from traval_spark.operators.text import filter_documents, token_count_ws
    from traval_spark.packing import assign_packs

    prev: list[DataFrame] = []

    def note(stage: str, df: DataFrame) -> DataFrame:
        # keep exactly ONE stage cached: persist the new frame, count it,
        # release the previous stage (each later stage only reads its
        # immediate predecessor) — without this a metrics run holds ~7
        # full-corpus copies for the life of the session
        if metrics is not None:
            df = df.persist()
            metrics[stage] = df.count()
            if prev:
                prev.pop().unpersist()
            prev.append(df)
        return df

    cur = note("input", docs)

    # NULL-text docs are unexplainable downstream (md5(NULL) would
    # collapse them all into one fabricated 'exact dup' group and
    # packing would silently drop the survivor via n_tok IS NULL) —
    # excluded HERE, as their own manifest stage
    cur = note("after_nonnull_text", cur.filter(F.col(text_col).isNotNull()))

    if quality is not None:
        kept_ids = (
            filter_documents(cur, text_col=text_col, id_col=id_col,
                             **quality)
            .filter(F.col("kept"))
            .select(id_col)
        )
        cur = note("after_quality", cur.join(kept_ids, id_col, "left_semi"))

    w = Window.partitionBy(F.md5(F.col(text_col))).orderBy(id_col)
    cur = note(
        "after_exact_dedup",
        cur.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1).drop("__rn"),
    )

    if near_dup:
        pairs = simhash64_dup_pairs(cur, max_hamming=max_hamming,
                                    text_col=text_col, id_col=id_col)
        stars, _ = connected_components(pairs)
        # non-root members of any dup cluster are dropped (the root —
        # the smallest reachable id — survives)
        cur = note(
            "after_near_dedup",
            cur.join(stars.select(F.col("u").alias(id_col)),
                     id_col, "left_anti"),
        )

    if benchmark is not None:
        bsh = F.broadcast(
            benchmark.select(
                F.explode(shingles(F.col(text_col), decontaminate_k))
                .alias("__sh")
            ).distinct()
        )
        tainted = (
            cur.select(F.col(id_col),
                       F.explode(shingles(F.col(text_col),
                                          decontaminate_k)).alias("__sh"))
            .join(bsh, "__sh").select(id_col).distinct()
        )
        cur = note("after_decontamination",
                   cur.join(tainted, id_col, "left_anti"))

    if weights is not None:
        cur = note(
            "after_mixture",
            mixture_sample(cur, weights, source_col=source_col,
                           id_col=id_col, seed=seed + 1),
        )

    cur = split_assign(
        cur, splits or [("train", 0.98), ("val", 0.01), ("test", 0.01)],
        id_col=id_col, seed=seed + 2,
    )
    cur = cur.withColumn("n_tok", token_count_ws(F.col(text_col)))
    packed = assign_packs(
        cur.select(id_col, source_col, "split", "n_tok"),
        target_tokens, by=["split", source_col], id_col=id_col,
    )
    return packed


def write_curated(
    packed: DataFrame, out_path: str, metrics: dict | None = None
) -> None:
    """Write the packed corpus partitioned by split (a training loader
    reads one split directory) and the metrics manifest next to it.
    The manifest goes through the Hadoop FS API, not builtin open() —
    the submit wrapper invites hdfs://, s3://, ... output paths where a
    local open() would fail on the driver AFTER the expensive parquet
    write. Underscore prefix: Spark's file listing ignores it, so the
    manifest lives inside the dataset directory without being read as a
    parquet part-file."""
    packed.write.mode("overwrite").partitionBy("split").parquet(out_path)
    if metrics is not None:
        _hadoop_write_text(
            packed.sparkSession,
            f"{out_path.rstrip('/')}/_curation_metrics.json",
            json.dumps(metrics, indent=2, default=str),
        )


def _hadoop_write_text(spark, path: str, text: str) -> None:
    """Write a small text file through the Hadoop FS API (works for any
    store the session can write to, not just the local filesystem)."""
    jvm = spark._jvm
    p = jvm.org.apache.hadoop.fs.Path(path)
    fs = p.getFileSystem(spark._jsc.hadoopConfiguration())
    out = fs.create(p, True)
    try:
        out.write(bytearray(text.encode("utf-8")))
    finally:
        out.close()


def main() -> None:
    import argparse

    from traval_spark.session import get_spark

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--input", required=True, help="documents parquet")
    ap.add_argument("--output", required=True)
    ap.add_argument("--quality", default=None,
                    help="JSON dict of filter_documents gate kwargs, "
                         'e.g. {"min_words": 20, "allowed_langs": ["en"]}; '
                         "omit to skip the quality stage")
    ap.add_argument("--benchmark", default=None,
                    help="eval-suite parquet for decontamination")
    ap.add_argument("--decontaminate-k", type=int, default=8)
    ap.add_argument("--target-tokens", type=int, default=2048)
    ap.add_argument("--no-near-dup", action="store_true")
    ap.add_argument("--max-hamming", type=int, default=3)
    ap.add_argument("--weights", default=None,
                    help='JSON dict source->fraction, e.g. {"src0": 0.5}')
    ap.add_argument("--splits", default=None,
                    help='JSON list of [name, fraction] pairs summing to 1')
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--master", default=None)
    args = ap.parse_args()

    quality = json.loads(args.quality) if args.quality else None
    if quality and "allowed_langs" in quality:
        quality["allowed_langs"] = tuple(quality["allowed_langs"])

    spark = get_spark("traval-curation", master=args.master)
    docs = spark.read.parquet(args.input)
    bench = spark.read.parquet(args.benchmark) if args.benchmark else None
    metrics: dict = {}
    packed = curate_corpus(
        docs,
        quality=quality,
        near_dup=not args.no_near_dup,
        max_hamming=args.max_hamming,
        benchmark=bench,
        decontaminate_k=args.decontaminate_k,
        weights=json.loads(args.weights) if args.weights else None,
        splits=[(n, f) for n, f in json.loads(args.splits)]
        if args.splits else None,
        target_tokens=args.target_tokens,
        seed=args.seed,
        metrics=metrics,
    )
    write_curated(packed, args.output, metrics)
    print(json.dumps(metrics, default=str))


if __name__ == "__main__":
    main()
