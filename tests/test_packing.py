"""Sequence packing: conservation, bounded overflow, determinism,
shard-decomposition exactness, skew-safe plans, incremental extension."""

from __future__ import annotations

import re

from pyspark.sql import Window
from pyspark.sql import functions as F

from traval_spark.packing import (
    assign_packs,
    extend_packs,
    pack_stats,
    shard_key,
)
from traval_spark.sources.synth import synth_sequences


def _check_pack_properties(spark, seqs, packed, target, by="source"):
    # no document dropped or duplicated
    assert packed.count() == seqs.filter(F.col("n_tok").isNotNull()).count()
    assert packed.select("doc_id").distinct().count() == packed.count()

    stats = pack_stats(packed, target, by=by)
    max_tok = seqs.agg(F.max("n_tok")).first()[0]
    # every pack holds <= target + max_len - 1 tokens (one straddler max)
    assert stats.filter(
        F.col("tok_total") > target + max_tok - 1).count() == 0
    # every pack except each group's LAST is filled past target - max_len
    w_last = stats.groupBy(by).agg(F.max("pack_id").alias("last"))
    non_last = stats.join(w_last, by).filter(
        F.col("pack_id") < F.col("last"))
    assert non_last.filter(
        F.col("tok_total") < target - max_tok + 1).count() == 0
    # pack ids are dense from 0 per group
    per_src = stats.groupBy(by).agg(
        F.min("pack_id").alias("lo"), F.max("pack_id").alias("hi"),
        F.count(F.lit(1)).alias("n"))
    assert per_src.filter(
        (F.col("lo") != 0) | (F.col("n") != F.col("hi") + 1)).count() == 0


def test_pack_assign_conserves_and_bounds(spark):
    seqs = synth_sequences(spark, 3000, seed=31)
    target = 1024
    packed = assign_packs(seqs, target_tokens=target)
    _check_pack_properties(spark, seqs, packed, target)

    # deterministic: a re-run assigns identical packs
    again = assign_packs(seqs, target_tokens=target)
    assert packed.select("doc_id", "pack_id", "pack_pos").exceptAll(
        again.select("doc_id", "pack_id", "pack_pos")).count() == 0


def test_pack_assign_legacy_single_window_properties(spark):
    seqs = synth_sequences(spark, 3000, seed=31)
    packed = assign_packs(seqs, target_tokens=1024, shards=None)
    _check_pack_properties(spark, seqs, packed, 1024)
    again = assign_packs(seqs, target_tokens=1024, shards=None)
    assert packed.select("doc_id", "pack_id", "pack_pos").exceptAll(
        again.select("doc_id", "pack_id", "pack_pos")).count() == 0


def test_sharded_matches_single_window_same_layout(spark):
    """The two-level prefix sum is a pure execution strategy: one window
    over the SAME (shard, id) layout order must produce byte-identical
    (pack_id, pack_pos) — packing is associative over an ordered shard
    decomposition."""
    seqs = synth_sequences(spark, 2000, seed=5)
    target = 777
    sharded = assign_packs(seqs, target, shards=8).select(
        "doc_id", "pack_id", "pack_pos")

    manual = seqs.filter(F.col("n_tok").isNotNull()).withColumn(
        "__s", shard_key("doc_id", 8))
    w = Window.partitionBy("source").orderBy("__s", "doc_id")
    w_run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    manual = manual.withColumn(
        "pack_id",
        F.floor((F.sum("n_tok").over(w_run) - F.col("n_tok")).cast("long")
                / F.lit(target)),
    )
    w_pack = Window.partitionBy("source", "pack_id").orderBy("__s", "doc_id")
    manual = manual.withColumn(
        "pack_pos", (F.row_number().over(w_pack) - 1).cast("int")
    ).select("doc_id", "pack_id", "pack_pos")

    assert sharded.exceptAll(manual).count() == 0
    assert manual.exceptAll(sharded).count() == 0


def test_pack_pos_is_contiguous_layout_order(spark):
    seqs = synth_sequences(spark, 500, seed=8)
    for shards in (64, None):
        packed = assign_packs(seqs, target_tokens=2048, shards=shards)
        # pack_pos runs 0..n_docs-1 inside each pack
        chk = packed.groupBy("source", "pack_id").agg(
            F.count(F.lit(1)).alias("n"),
            F.min("pack_pos").alias("lo"), F.max("pack_pos").alias("hi"))
        assert chk.filter(
            (F.col("lo") != 0) | (F.col("hi") != F.col("n") - 1)).count() == 0


def test_assign_packs_legacy_single_exchange(spark):
    """Legacy path (shards=None): pack_pos rides the same (source, order)
    window as pack_id — the plan must contain exactly ONE shuffle
    exchange (a second row_number over (source, pack_id) would re-shuffle
    the corpus by a derived key)."""
    seqs = synth_sequences(spark, 200, seed=2)
    plan = assign_packs(seqs, 1024, shards=None)._jdf.queryExecution(
    ).executedPlan().toString()
    n_ex = len(re.findall(r"Exchange hashpartitioning", plan))
    assert n_ex == 1, plan


def test_assign_packs_skew_safe_plan(spark):
    """Skew audit: with one source holding 50% of the corpus, the default
    plan must contain NO single-task-per-group sort — every window over
    the CORPUS is partitioned by (by, __shard) or (by, pack_id); a window
    partitioned by the by columns alone may only run on the tiny
    per-shard-totals frame (its aggregate reads __tot)."""
    skewed = synth_sequences(spark, 4000, seed=13).withColumn(
        "source",
        F.when(F.crc32(F.col("doc_id")) % 2 == 0, F.lit("dominant"))
        .otherwise(F.col("source")),
    )
    packed = assign_packs(skewed, 1024)
    plan = packed._jdf.queryExecution().executedPlan().toString()

    win_lines = [ln for ln in plan.splitlines() if "windowspecdefinition" in ln]
    assert win_lines, plan
    for ln in win_lines:
        assert ("__shard" in ln) or ("pack_id" in ln) or ("__tot" in ln), ln
    # the corpus repartition is keyed (source, __shard); pack_pos keyed
    # (source, pack_id); only the groups-x-shards offsets window may
    # exchange on source alone
    _check_pack_properties(spark, skewed, packed, 1024)


def test_assign_packs_tied_order_key_stays_bounded(spark):
    """Regression: a non-unique order_col (e.g. sort-by-length) must NOT
    collapse tied rows into one shared cumsum — the default RANGE window
    frame did exactly that, piling every tied doc into a single
    overflowing pack. With the ROWS frame + id tie-break, bounds and
    determinism hold for ANY order key, on both execution paths."""
    rows = [(f"d{i:02d}", "s", 100) for i in range(10)]
    seqs = spark.createDataFrame(
        rows, "doc_id string, source string, n_tok int")
    for shards in (4, None):
        packed = assign_packs(seqs, target_tokens=256, order_col="n_tok",
                              shards=shards)
        stats = pack_stats(packed, 256)
        # 10 x 100 tokens at target 256 -> packs of <= 300 tokens, 4 packs
        assert stats.filter(F.col("tok_total") > 256 + 100 - 1).count() == 0
        assert stats.count() == 4
        # deterministic under the tie-break
        again = assign_packs(seqs, target_tokens=256, order_col="n_tok",
                             shards=shards)
        assert packed.select("doc_id", "pack_id", "pack_pos").exceptAll(
            again.select("doc_id", "pack_id", "pack_pos")).count() == 0


def test_extend_packs_freezes_committed_packs(spark):
    """Append-only increment: existing pack ids never move; new docs land
    in fresh packs starting at each group's next free id; the union is
    dense from 0 per group."""
    all_docs = synth_sequences(spark, 2000, seed=17)
    old = all_docs.filter(F.crc32(F.col("doc_id")) % 3 != 0)
    new = all_docs.filter(F.crc32(F.col("doc_id")) % 3 == 0)
    target = 1024

    committed = assign_packs(old, target)
    extended = extend_packs(committed, new, target)

    # only the new docs come back, all of them (non-null n_tok)
    assert extended.count() == new.filter(F.col("n_tok").isNotNull()).count()
    assert extended.join(old, "doc_id", "left_semi").count() == 0

    # every new pack id >= max committed id + 1 in groups that existed
    base = committed.groupBy("source").agg(
        (F.max("pack_id") + 1).alias("base"))
    bad = extended.join(base, "source").filter(
        F.col("pack_id") < F.col("base"))
    assert bad.count() == 0

    # union is a valid dense packing per group with the same bounds
    union = committed.select("doc_id", "source", "n_tok", "pack_id",
                             "pack_pos").unionByName(
        extended.select("doc_id", "source", "n_tok", "pack_id", "pack_pos"))
    per_src = union.groupBy("source", "pack_id").count().groupBy(
        "source").agg(F.min("pack_id").alias("lo"),
                      F.max("pack_id").alias("hi"),
                      F.count(F.lit(1)).alias("n"))
    assert per_src.filter(
        (F.col("lo") != 0) | (F.col("n") != F.col("hi") + 1)).count() == 0

    # replay-idempotent: the same call reproduces itself byte-for-byte
    again = extend_packs(committed, new, target)
    assert extended.select("doc_id", "pack_id", "pack_pos").exceptAll(
        again.select("doc_id", "pack_id", "pack_pos")).count() == 0


def test_extend_packs_new_group_starts_at_zero(spark):
    old = spark.createDataFrame(
        [("a1", "s_old", 100, 0, 0)],
        "doc_id string, source string, n_tok int, pack_id long, pack_pos int")
    new = spark.createDataFrame(
        [("b1", "s_new", 100), ("b2", "s_old", 100)],
        "doc_id string, source string, n_tok int")
    out = {r["doc_id"]: r["pack_id"]
           for r in extend_packs(old, new, 256).collect()}
    assert out["b1"] == 0      # unseen group: fresh numbering
    assert out["b2"] == 1      # existing group: continues after max


def test_materialize_packs_payloads_and_separators(spark):
    """Loader artifact invariants: tokens concatenate in pack_pos order,
    n_tok == len(tokens), sep_token appears exactly between documents
    (never trailing), token totals are conserved, and doc_ids track
    lineage."""
    from traval_spark.packing import assign_packs, materialize_packs

    rows = [(i, list(range(i * 10, i * 10 + 3 + i % 4)),
             "s%d" % (i % 2)) for i in range(40)]
    seqs = spark.createDataFrame(
        rows, "doc_id long, tokens array<int>, source string"
    ).withColumn("n_tok", F.size("tokens").cast("int"))
    packed = assign_packs(seqs, target_tokens=16)

    m = materialize_packs(packed, sep_token=-1).collect()
    id_to_toks = {r["doc_id"]: r["tokens"] for r in seqs.collect()}
    pos = {(r["source"], r["pack_id"]): r for r in packed.collect()
           if r["pack_pos"] == 0}
    for r in m:
        assert r["n_tok"] == len(r["tokens"])
        assert r["tokens"].count(-1) == r["n_docs"] - 1
        assert r["tokens"][-1] != -1
        # reconstruct: concatenation of its docs' tokens joined by -1
        want = []
        for j, did in enumerate(r["doc_ids"]):
            if j:
                want.append(-1)
            want += id_to_toks[did]
        assert r["tokens"] == want
        # first doc in the payload is the pack_pos == 0 doc
        assert r["doc_ids"][0] == pos[(r["source"], r["pack_id"])]["doc_id"]

    tot_in = sum(len(t) for t in id_to_toks.values())
    assert sum(r["n_tok"] - (r["n_docs"] - 1) for r in m) == tot_in
    nosep = materialize_packs(packed).collect()
    assert sum(r["n_tok"] for r in nosep) == tot_in
    assert all(-1 not in r["tokens"] for r in nosep)
