"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard.

Training-data-pipeline dedup over the ``documents`` table, designed for
the 100 TB path:

- **exact**: one hash-groupBy on md5(text) — map-side combine, no pairwise
  work, trivially scales.
- **MinHash + LSH**: shingle -> per-band signature -> bucket-join. Pairs
  are only generated *within* LSH buckets (the classic
  shingle->minhash->band->bucket-join pipeline), so cost is
  O(sum bucket^2), not O(n^2).
- **SimHash**: 16-bit majority-vote fingerprint from portable fold-hashes;
  near-dup candidates share the fingerprint (or a band of it).
- **n-gram Jaccard**: exact verification metric, computed only for
  candidate pairs that share >= 1 shingle (inverted-index join, skew-safe:
  ultra-common shingles can be capped via document-frequency filter).

Portability: every hash here is md5-hex or the fold-hash — bit-identical
in DuckDB, so every operator has a full value-level oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from traval_spark.operators.text import fold_hash, ws_tokens


def exact_dup_groups(docs: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """Exact-duplicate groups: (text_hash, n_docs, min_doc_id), n_docs > 1."""
    return (
        docs.groupBy(F.md5(F.col(text_col)).alias("text_hash"))
        .agg(
            F.count("*").alias("n_docs"),
            F.min(F.col(id_col)).alias("min_doc_id"),
        )
        .filter(F.col("n_docs") > 1)
    )


def shingles(text: Column, k: int = 3) -> Column:
    """k-word shingles as ' '-joined strings (distinct set via array_distinct)."""
    toks = ws_tokens(text)
    n = F.size(toks)
    idx = F.sequence(F.lit(1), F.greatest(n - F.lit(k - 1), F.lit(1)))
    sh = F.transform(
        idx, lambda i: F.concat_ws(" ", F.slice(toks, i, k))
    )
    return F.array_distinct(sh)


def minhash_signature(text: Column, n_hashes: int = 4, k: int = 3) -> list[Column]:
    """MinHash signature: per hash-family member b, min over shingles of
    md5(b || '|' || shingle). md5-hex string order is a fixed pseudo-random
    permutation of the shingle space — the textbook construction with a
    portable hash.

    Prefer :func:`with_minhash` — it materializes the shingle array once;
    these raw columns each re-derive the shingles (fine for one column,
    4x redundant work for a full signature).
    """
    sh = shingles(text, k)
    return [
        F.array_min(
            F.transform(sh, lambda s: F.md5(F.concat(F.lit(f"{b}|"), s)))
        ).alias(f"sig_{b}")
        for b in range(n_hashes)
    ]


def with_minhash(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id",
                 n_hashes: int = 4, k: int = 3) -> DataFrame:
    """(id, sig_0..sig_{n-1}): shingles computed ONCE into a real column so
    the n per-band mins share it (higher-order funcs are interpreted, not
    codegen'd — recomputing the shingle array per band costs n_hashes x;
    CollapseProject keeps the two projections separate because the shingle
    expression is non-cheap and multiply referenced)."""
    sh = docs.select(
        F.col(id_col), shingles(F.col(text_col), k).alias("__sh")
    )

    def band_min(b: int):
        # strictly 1-ary lambda: a default arg would make PySpark treat it
        # as the (element, index) form and bind the index to b
        prefix = F.lit(f"{b}|")
        return F.array_min(
            F.transform(F.col("__sh"), lambda s: F.md5(F.concat(prefix, s)))
        ).alias(f"sig_{b}")

    return sh.select(F.col(id_col), *[band_min(b) for b in range(n_hashes)])


def lsh_buckets(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id",
                n_hashes: int = 4, k: int = 3) -> DataFrame:
    """LSH candidate buckets: docs grouped by the full minhash signature
    (one band of n_hashes rows); buckets with > 1 doc are dup candidates."""
    with_sig = with_minhash(docs, text_col, id_col, n_hashes, k)
    bucket = F.md5(F.concat_ws("|", *[F.col(f"sig_{b}") for b in range(n_hashes)]))
    return (
        with_sig.groupBy(bucket.alias("bucket"))
        .agg(F.count("*").alias("n_docs"), F.min(id_col).alias("min_doc_id"))
        .filter(F.col("n_docs") > 1)
    )


def ngram_jaccard_pairs(
    docs: DataFrame,
    threshold: float = 0.5,
    k: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_shingle_df: int | None = None,
) -> DataFrame:
    """Near-dup pairs by exact k-gram Jaccard, via inverted-index join.

    explode(shingles) -> self-join on shingle (only co-occurring pairs are
    ever materialized) -> per-pair intersection count -> Jaccard with
    |A|+|B|-inter. ``max_shingle_df`` drops shingles appearing in more than
    that many docs (stopword-shingle skew guard for web-scale corpora).
    """
    base = docs.select(
        F.col(id_col).alias("doc_id"),
        shingles(F.col(text_col), k).alias("sh"),
    ).withColumn("n_sh", F.size("sh"))
    inv = base.select("doc_id", "n_sh", F.explode("sh").alias("shingle"))
    if max_shingle_df is not None:
        df_counts = inv.groupBy("shingle").agg(F.count("*").alias("df"))
        inv = inv.join(
            df_counts.filter(F.col("df") <= max_shingle_df), on="shingle"
        )
    a = inv.select(
        F.col("shingle"),
        F.col("doc_id").alias("a"),
        F.col("n_sh").alias("na"),
    )
    b = inv.select(
        F.col("shingle"),
        F.col("doc_id").alias("b"),
        F.col("n_sh").alias("nb"),
    )
    pairs = (
        a.join(b, on="shingle")
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b", "na", "nb")
        .agg(F.count("*").alias("inter"))
    )
    jac = F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter"))
    return (
        pairs.withColumn("jaccard", F.round(jac, 6))
        .filter(F.col("jaccard") >= threshold)
        .select("a", "b", "inter", "jaccard")
    )


def with_simhash16(df: DataFrame, text_col: str = "text",
                   out: str = "simhash") -> DataFrame:
    """16-bit SimHash column: per token fold-hash h; bit j of the
    fingerprint is 1 iff sum over tokens of sign((h >> j) & 1) is positive
    (majority vote). Token hashes are materialized once into a real column
    so the 16 per-bit aggregates share them instead of re-hashing."""
    hashes = F.transform(ws_tokens(F.col(text_col)), lambda t: fold_hash(t))
    df = df.withColumn("__th", hashes)

    def bit_vote(j: int):
        # NB: the merge lambda must be exactly 2-ary — PySpark inspects the
        # arity and would pass an index Column to any extra parameter
        mask = F.lit(1 << j)
        return lambda acc, h: acc + F.when(
            h.bitwiseAND(mask) != 0, F.lit(1)
        ).otherwise(F.lit(-1))

    fp = F.lit(0).cast("bigint")
    for j in range(16):
        vote = F.aggregate(F.col("__th"), F.lit(0).cast("bigint"), bit_vote(j))
        fp = fp + F.when(vote > 0, F.lit(1 << j)).otherwise(F.lit(0))
    return df.withColumn(out, fp.cast("bigint")).drop("__th")
