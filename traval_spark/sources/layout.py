"""Physical data layout for scan efficiency: Z-order clustering and
bucketed tables.

At 100 TB the fastest scan is the one that never happens: parquet
readers skip whole files/row-groups via column min/max statistics, but
statistics only help if the writer CLUSTERED the data so each file
covers a narrow range of the filter columns.  Two standard layouts:

**Z-order (Morton) clustering** — for multi-dimensional predicates
(``source``-hash x time, or any two bucketized axes) a single-column
sort gives perfect pruning on one axis and none on the other;
interleaving the bits of both axes gives every file a small rectangle
in (x, y) space, so min/max stats prune on EITHER predicate.
:func:`zorder_key` builds the interleaved key as a pure static
expression tree (shift/and/or arithmetic — whole-stage codegen, no
UDF); :func:`write_zordered` range-partitions and sorts by it (one
exchange, the same cost as any global sort-write);
:func:`file_ranges` measures the resulting per-file min/max extents so
the clustering benefit is a NUMBER, not a claim (the pytest asserts the
z-ordered layout's mean per-file y-extent is a fraction of the
x-sorted layout's).

**Bucketed tables** — the brief's "co-located joins": writing both
sides of a recurring join with ``bucketBy(n, key)`` + ``sortBy`` makes
Spark record the hash-partitioning in the table metadata, so later
joins on the key need NO shuffle on either side (the pytest asserts
zero Exchange under the join).  :func:`write_bucketed` pins the
convention (bucket count, sorted buckets, explicit path); at cluster
scale choose buckets ~= a small multiple of total executor cores and
keep it IDENTICAL on both tables — mismatched counts silently
reintroduce the shuffle.

Reference note: the traval reference is single-process pandas with no
storage layout surface; this module is part of the from-scratch tier
engine (BASELINE.json north_rule: "partitioning / shuffle / skew
handled explicitly").
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["zorder_key", "write_zordered", "file_ranges",
           "write_bucketed", "skew_report"]


def zorder_key(cols: list[Column | str], bits: int = 16) -> Column:
    """Morton-interleave the low ``bits`` of N non-negative int columns.

    Callers bucketize first (rank, hash-mod, or floor-division — the
    key only needs ORDER, not meaning).  Values are clamped to the
    ``bits``-bit range so outliers cannot scramble the curve.  The
    result is one static shift/and/or expression per (bit, column) —
    fully whole-stage-codegen, engine-portable arithmetic (the oracle
    reproduces it term by term).
    """
    n = len(cols)
    if n == 0:
        raise ValueError("zorder_key needs at least one column")
    if bits * n > 63:
        # bit 63 is the long's sign bit: a set high bit would flip the
        # key negative and scramble the curve order silently
        raise ValueError(
            f"bits*len(cols) = {bits * n} exceeds 63 — the interleaved "
            "key must fit a signed long; lower bits or use fewer columns"
        )
    cap = F.lit((1 << bits) - 1)
    clamped = [
        F.least(F.greatest((F.col(c) if isinstance(c, str) else c)
                           .cast("long"), F.lit(0)), cap)
        for c in cols
    ]
    z = F.lit(0).cast("long")
    for b in range(bits):
        for i, c in enumerate(clamped):
            z = z + F.shiftleft(
                F.shiftright(c, b).bitwiseAND(F.lit(1)), b * n + i
            )
    return z


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list[str],
    bits: int = 16,
    n_files: int | None = None,
) -> None:
    """Write ``df`` clustered on the Z-order curve of ``cols``.

    One range exchange on the key (balanced output files regardless of
    key skew — range, not hash) + in-partition sort, so every file owns
    a compact curve segment = a small rectangle in value space.  The
    key itself is not persisted; it exists only to place rows.
    """
    keyed = df.withColumn("__z", zorder_key(cols, bits))
    parted = (
        keyed.repartitionByRange(n_files, "__z") if n_files
        else keyed.repartitionByRange("__z")
    )
    parted.sortWithinPartitions("__z").drop("__z").write.mode(
        "overwrite"
    ).parquet(path)


def file_ranges(spark, path: str, cols: list[str]) -> DataFrame:
    """Per-file min/max extents of ``cols`` — the quantity min/max
    pruning actually uses.  Reading the data to audit the layout is
    test-scale tooling; production audits read parquet footers."""
    df = spark.read.parquet(path).withColumn(
        "__file", F.input_file_name()
    )
    aggs = []
    for c in cols:
        aggs += [F.min(c).alias(f"{c}_min"), F.max(c).alias(f"{c}_max"),
                 (F.max(c) - F.min(c)).alias(f"{c}_extent")]
    return df.groupBy("__file").agg(*aggs)


def write_bucketed(
    df: DataFrame,
    table: str,
    keys: list[str],
    buckets: int,
    path: str,
    sort_keys: list[str] | None = None,
) -> None:
    """Save ``df`` as a bucketed+sorted table for shuffle-free joins.

    Both sides of a recurring join must use the SAME bucket count and
    keys; a later ``spark.table(a).join(spark.table(b), keys)`` then
    plans with zero Exchange (asserted in tests/test_layout.py).
    ``sort_keys`` default to ``keys`` (sorted buckets also drop the
    in-task sort for sort-merge)."""
    w = (
        df.write.mode("overwrite")
        .bucketBy(buckets, keys[0], *keys[1:])
        .sortBy(*(sort_keys or keys))
        .option("path", path)
    )
    w.saveAsTable(table)


def skew_report(df: DataFrame, key: str, top_k: int = 5) -> DataFrame:
    """Partitioning-skew profiler for a prospective shuffle key — the
    number that decides whether a join/agg on ``key`` needs salting
    BEFORE the job straggles, not after.

    One groupBy-count + driver-sized aggregates over the key table:

    - ``max_share``: the heaviest key's row fraction (a 0.5 here means
      one task does half the shuffle — the salting trigger),
    - ``topk_share``: combined share of the ``top_k`` heaviest keys,
    - ``entropy_norm``: Shannon entropy of the key distribution over
      log(n_keys) (1.0 = uniform, ->0 = degenerate),
    - ``suggested_salt``: ceil(max_share * 32) clamped to >=1 — the
      salt fan-out that levels the heaviest key against ~32-way
      parallelism (scale to your executor count).

    All shares derive from exact integer counts; entropy is the only
    order-dependent float sum (rounded to 6, noise ~1e-15).  Output:
    one row — ``n_rows, n_keys, max_share, topk_share, entropy_norm,
    suggested_salt``.
    """
    counts = df.groupBy(key).agg(F.count("*").alias("c"))
    w = Window.orderBy(F.col("c").desc(), F.col(key))
    # both windows run over the bounded distinct-key table, not raw rows
    ranked = (
        counts.withColumn("__rn", F.row_number().over(w))
        .withColumn("__tot", F.sum("c").over(Window.partitionBy()))
    )
    p = F.col("c") / F.col("__tot")
    agg = ranked.agg(
        F.sum("c").alias("n_rows"),
        F.count("*").alias("n_keys"),
        F.max("c").alias("__cmax"),
        F.sum(F.when(F.col("__rn") <= top_k, F.col("c")).otherwise(0))
        .alias("__ctop"),
        F.round(-F.sum(p * F.log(p)), 6).alias("__h"),
    )
    return agg.select(
        "n_rows", "n_keys",
        (F.col("__cmax").cast("double") / F.col("n_rows"))
        .alias("max_share"),
        (F.col("__ctop").cast("double") / F.col("n_rows"))
        .alias("topk_share"),
        F.when(F.col("n_keys") > 1,
               F.round(F.col("__h") / F.log(F.col("n_keys")
                                            .cast("double")), 6))
        .otherwise(F.lit(0.0)).alias("entropy_norm"),
        F.greatest(
            F.ceil(F.col("__cmax").cast("double") / F.col("n_rows") * 32)
            .cast("int"),
            F.lit(1),
        ).alias("suggested_salt"),
    )


def join_blowup(
    left: DataFrame,
    right: DataFrame,
    key: str,
) -> DataFrame:
    """Pre-flight join-cardinality predictor — :func:`skew_report`'s
    sibling for the TWO-sided question: how many rows will
    ``left JOIN right ON key`` actually emit, and is one hot key about
    to amplify the output past memory?  The exact inner-join output
    size is ``Σ_k c_left(k) · c_right(k)`` — computable from the two
    key-count tables WITHOUT running the join.

    Per-key products accumulate in decimal(38,0) (two 10^12-row inputs
    sharing one key overflow int64 at the product already), presented
    as doubles — this is a planning estimate read, 2^53 precision is
    beyond what the decision needs.  ``max_key_product`` and its key
    name the single worst offender (the salting / filter target);
    ``amplification`` = est_rows / max(n_left, n_right) > ~4 is the
    "this join explodes" trigger.

    Plan shape: one groupBy-count per side (the only raw-scale work),
    an equi-join of the two bounded key tables, driver-sized output.
    Output: one row — ``n_left, n_right, n_keys_matched, est_rows,
    max_key_product, max_key, amplification``.
    """
    ca = left.groupBy(F.col(key).cast("string").alias("k")).agg(
        F.count("*").alias("ca")
    )
    cb = right.groupBy(F.col(key).cast("string").alias("k")).agg(
        F.count("*").alias("cb")
    )
    na = ca.agg(F.sum("ca").alias("n_left"))
    nb = cb.agg(F.sum("cb").alias("n_right"))
    prod = (
        F.col("ca").cast("decimal(38,0)")
        * F.col("cb").cast("decimal(38,0)")
    )
    j = ca.join(cb, "k").select("k", prod.alias("p"))
    agg = j.agg(
        F.count(F.lit(1)).alias("n_keys_matched"),
        F.sum("p").alias("__est"),
        F.max(F.struct(F.col("p"), F.col("k"))).alias("__mx"),
    )
    return (
        agg.crossJoin(F.broadcast(na))
        .crossJoin(F.broadcast(nb))
        .select(
            "n_left", "n_right", "n_keys_matched",
            F.col("__est").cast("double").alias("est_rows"),
            F.col("__mx.p").cast("double").alias("max_key_product"),
            F.col("__mx.k").alias("max_key"),
            F.round(
                F.col("__est").cast("double")
                / F.greatest("n_left", "n_right").cast("double"),
                6,
            ).alias("amplification"),
        )
    )
