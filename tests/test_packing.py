"""Sequence packing: conservation, bounded overflow, determinism."""

from __future__ import annotations

from pyspark.sql import functions as F

from traval_spark.packing import assign_packs, pack_stats
from traval_spark.sources.synth import synth_sequences


def test_pack_assign_conserves_and_bounds(spark):
    seqs = synth_sequences(spark, 3000, seed=31)
    target = 1024
    packed = assign_packs(seqs, target_tokens=target)

    # no document dropped or duplicated
    assert packed.count() == seqs.filter(F.col("n_tok").isNotNull()).count()
    assert packed.select("doc_id").distinct().count() == packed.count()

    stats = pack_stats(packed, target)
    max_tok = seqs.agg(F.max("n_tok")).first()[0]
    # every pack holds <= target + max_len - 1 tokens (one straddler max)
    assert stats.filter(
        F.col("tok_total") > target + max_tok - 1).count() == 0
    # every pack except each source's LAST is filled past target - max_len
    w_last = stats.groupBy("source").agg(F.max("pack_id").alias("last"))
    non_last = stats.join(w_last, "source").filter(
        F.col("pack_id") < F.col("last"))
    assert non_last.filter(
        F.col("tok_total") < target - max_tok + 1).count() == 0
    # pack ids are dense from 0 per source
    per_src = stats.groupBy("source").agg(
        F.min("pack_id").alias("lo"), F.max("pack_id").alias("hi"),
        F.count(F.lit(1)).alias("n"))
    assert per_src.filter(
        (F.col("lo") != 0) | (F.col("n") != F.col("hi") + 1)).count() == 0

    # deterministic: a re-run assigns identical packs
    again = assign_packs(seqs, target_tokens=target)
    assert packed.select("doc_id", "pack_id", "pack_pos").exceptAll(
        again.select("doc_id", "pack_id", "pack_pos")).count() == 0


def test_pack_pos_is_contiguous_layout_order(spark):
    seqs = synth_sequences(spark, 500, seed=8)
    packed = assign_packs(seqs, target_tokens=2048)
    # pack_pos runs 0..n_docs-1 inside each pack
    chk = packed.groupBy("source", "pack_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.min("pack_pos").alias("lo"), F.max("pack_pos").alias("hi"))
    assert chk.filter(
        (F.col("lo") != 0) | (F.col("hi") != F.col("n") - 1)).count() == 0


def test_assign_packs_single_exchange(spark):
    """pack_pos rides the same (source, order) window as pack_id: the
    plan must contain exactly ONE shuffle exchange (a second row_number
    over (source, pack_id) would re-shuffle the corpus by a derived
    key)."""
    seqs = synth_sequences(spark, 200, seed=2)
    plan = assign_packs(seqs, 1024)._jdf.queryExecution().executedPlan().toString()
    import re

    n_ex = len(re.findall(r"Exchange hashpartitioning", plan))
    assert n_ex == 1, plan


def test_assign_packs_tied_order_key_stays_bounded(spark):
    """Regression: a non-unique order_col (e.g. sort-by-length) must NOT
    collapse tied rows into one shared cumsum — the default RANGE window
    frame did exactly that, piling every tied doc into a single
    overflowing pack. With the ROWS frame + id tie-break, bounds and
    determinism hold for ANY order key."""
    rows = [(f"d{i:02d}", "s", 100) for i in range(10)]
    seqs = spark.createDataFrame(
        rows, "doc_id string, source string, n_tok int")
    packed = assign_packs(seqs, target_tokens=256, order_col="n_tok")
    stats = pack_stats(packed, 256)
    # 10 x 100 tokens at target 256 -> packs of <= 300 tokens, 4 packs
    assert stats.filter(F.col("tok_total") > 256 + 100 - 1).count() == 0
    assert stats.count() == 4
    # deterministic under the tie-break
    again = assign_packs(seqs, target_tokens=256, order_col="n_tok")
    assert packed.select("doc_id", "pack_id", "pack_pos").exceptAll(
        again.select("doc_id", "pack_id", "pack_pos")).count() == 0
