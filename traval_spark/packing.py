"""Sequence packing: assign pre-tokenized documents to fixed-token-budget
training packs.

The batching step of an LM data pipeline: group documents into "packs"
whose token totals approach a target context length, so training examples
waste as little padding as possible. The classic greedy first-fit packer
is inherently sequential; the scalable formulation here is CONTIGUOUS
packing — within each group (source), documents are laid out in a
deterministic order and cut into packs at running-token-total boundaries:

    pack_id = floor((cumsum(n_tok) - n_tok) / target)

i.e. a document belongs to the pack its FIRST token lands in. One window
pass (partitionBy source, orderBy the layout key), no Python, exact SQL
mirror — and the deterministic layout means re-running the job on the
same table yields byte-identical pack assignments (resume/recompute
safe).

Properties (tested):
- every pack except a group's last holds >= target - max(n_tok) + 1 and
  <= target + max(n_tok) - 1 tokens: a pack can overflow its budget by
  at most one straddling document, the standard contiguous-packing
  trade (an exact bin-pack is NP-hard and order-sequential; overflow
  is bounded and disclosed rather than hidden);
- token totals are preserved exactly (no document dropped or split —
  splitting belongs to the tokenizer/loader layer, which knows about
  document-boundary tokens).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def assign_packs(
    seqs: DataFrame,
    target_tokens: int,
    by: str | list[str] = "source",
    id_col: str = "doc_id",
    n_tok_col: str = "n_tok",
    order_col: str | None = None,
) -> DataFrame:
    """Add (pack_id, pack_pos) to a tokenized-sequence frame.

    ``pack_id`` is the contiguous-packing bucket within each ``by``
    group (documents ordered by ``order_col``, default the id column —
    pass a length-sorted key to tighten packing at the cost of
    shuffling related docs apart; ``id_col`` is always appended as a
    tie-breaker so any order_col yields a TOTAL order, and the running
    sum uses an explicit ROWS frame — the default RANGE frame would
    collapse order-key ties into one shared cumsum and pile every tied
    document into a single overflowing pack).
    ``pack_pos`` is the document's 0-based position inside its pack.

    ONE exchange + one sort: every window here shares the same
    (partitionBy ``by``, orderBy ``order``) spec — pack_pos is derived
    from the running pack-start row number instead of a second
    row_number over (by, pack_id), which would re-shuffle the corpus by
    a derived key (plan-audited in tests). Everything else is codegen.
    NULL ``n_tok`` rows are excluded — they have no defined footprint.
    """
    by = [by] if isinstance(by, str) else list(by)
    order = [order_col, id_col] if order_col else [id_col]
    w = Window.partitionBy(*by).orderBy(*order)
    w_run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cum = F.sum(n_tok_col).over(w_run)
    before = (cum - F.col(n_tok_col)).cast("long")
    out = (
        seqs.filter(F.col(n_tok_col).isNotNull())
        .withColumn("pack_id", F.floor(before / F.lit(int(target_tokens))))
        .withColumn("__rn", F.row_number().over(w))
    )
    # first row of each pack carries its own row number; a running
    # last(ignorenulls) spreads it over the pack — same window spec, so
    # no additional exchange
    start = F.when(
        F.lag("pack_id").over(w).isNull()
        | (F.lag("pack_id").over(w) != F.col("pack_id")),
        F.col("__rn"),
    )
    pack_start = F.last(start, ignorenulls=True).over(w_run)
    return out.withColumn(
        "pack_pos", (F.col("__rn") - pack_start).cast("int")
    ).drop("__rn")


def pack_stats(
    packed: DataFrame,
    target_tokens: int,
    by: str | list[str] = "source",
    n_tok_col: str = "n_tok",
) -> DataFrame:
    """Per-pack totals + utilization: (by, pack_id, n_docs, tok_total,
    utilization) — utilization = tok_total / target rounded to 6dp (can
    exceed 1.0 by the straddling document; the loader decides whether to
    truncate the straddler or carry it over)."""
    by = [by] if isinstance(by, str) else list(by)
    return (
        packed.groupBy(*by, "pack_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(n_tok_col).alias("tok_total"),
        )
        .withColumn(
            "utilization",
            F.round(F.col("tok_total") / F.lit(int(target_tokens)), 6),
        )
    )
