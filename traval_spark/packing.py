"""Sequence packing: assign pre-tokenized documents to fixed-token-budget
training packs.

The batching step of an LM data pipeline: group documents into "packs"
whose token totals approach a target context length, so training examples
waste as little padding as possible. The classic greedy first-fit packer
is inherently sequential; the scalable formulation here is CONTIGUOUS
packing — within each group (source), documents are laid out in a
deterministic order and cut into packs at running-token-total boundaries:

    pack_id = floor((cumsum(n_tok) - n_tok) / target)

i.e. a document belongs to the pack its FIRST token lands in. The layout
order is OURS to choose (any deterministic total order yields a valid
contiguous packing); choosing it well is what makes the operator survive
skew.

SKEW-SAFE EXECUTION (default, ``shards=64``) — a two-level prefix sum.
A single ``partitionBy(source)`` window sorts each source's entire
corpus on ONE task: at web scale a Zipfian-dominant source (the same
skew the rollup path salts, SURVEY §7.2) serializes the job's final
stage. Instead the layout order is (shard, order, id), where
``shard = floor(hash_uniform(id, shard_seed) * shards)`` is a portable
md5-derived key (bit-identical in DuckDB — every oracle mirrors it):

1. local pass — ONE balanced exchange by (group, shard); cumsum of
   n_tok inside each shard (a 1/shards slice of any group, however
   dominant);
2. tiny per-(group, shard) token totals aggregated ON that same
   exchange (no second corpus scan, no upstream recompute — the agg
   branch reuses the repartition exchange), prefix-summed into shard
   offsets by a window over the groups-x-shards frame;
3. offsets broadcast-joined back: global_before = shard_offset +
   local_before, pack_id = floor(global_before / target);
4. pack_pos via one more balanced exchange keyed (group, pack_id) —
   pack keys are skew-FREE by construction (every pack holds ~target
   tokens), so row_number inside a pack is a few-row task.

Two balanced corpus exchanges instead of one serialized sort. The
decomposition is exact, not approximate: packing is associative over an
ordered shard decomposition, so the sharded plan and a single window
over the same (shard, order, id) order produce byte-identical pack ids
(property-tested). ``shards=None`` keeps the legacy single-window plan
(one exchange total) for callers that need a PURE (order, id) layout —
e.g. a curriculum ordering — and accept the per-group serialization.

Properties (tested, both paths):
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

from traval_spark.operators.sampling import hash_uniform


def shard_key(id_col: str, shards: int, shard_seed: int = 0):
    """Deterministic, engine-portable shard for the two-level prefix sum:
    floor(hash_uniform(id, seed) * shards) in [0, shards). DuckDB mirror:
    CAST(floor((cast(('0x' || substr(md5(seed || '|' || CAST(id AS
    VARCHAR)), 1, 8)) as bigint) / 4294967296.0) * shards) AS INT)."""
    return F.floor(
        hash_uniform(F.col(id_col), shard_seed) * F.lit(int(shards))
    ).cast("int")


def assign_packs(
    seqs: DataFrame,
    target_tokens: int,
    by: str | list[str] = "source",
    id_col: str = "doc_id",
    n_tok_col: str = "n_tok",
    order_col: str | None = None,
    shards: int | None = 64,
    shard_seed: int = 0,
) -> DataFrame:
    """Add (pack_id, pack_pos) to a tokenized-sequence frame.

    ``pack_id`` is the contiguous-packing bucket within each ``by``
    group; ``pack_pos`` the document's 0-based position inside its pack.
    Documents are laid out by (shard, ``order_col``, ``id_col``) —
    ``id_col`` is always appended as a tie-breaker so any order_col
    yields a TOTAL order, and every running sum uses an explicit ROWS
    frame (the default RANGE frame would collapse order-key ties into
    one shared cumsum and pile every tied document into a single
    overflowing pack). Pass a length-sorted ``order_col`` to tighten
    packing within each shard at the cost of shuffling related docs
    apart.

    ``shards`` (default 64) enables the skew-safe two-level prefix sum
    (see module docstring): two BALANCED corpus exchanges, no
    one-task-per-group sort, identical packing properties. ``shards=None``
    (or <= 1) selects the legacy single-exchange plan whose layout is
    purely (order, id) — one window sort per group, which serializes a
    dominant group; only for small/curriculum inputs.

    NULL ``n_tok`` rows are excluded — they have no defined footprint.
    """
    by = [by] if isinstance(by, str) else list(by)
    order_tail = [order_col, id_col] if order_col else [id_col]
    base = seqs.filter(F.col(n_tok_col).isNotNull())
    if not shards or int(shards) <= 1:
        return _assign_packs_single_window(
            base, target_tokens, by, id_col, n_tok_col, order_tail
        )

    # --- two-level prefix sum ---------------------------------------
    base = base.withColumn(
        "__shard", shard_key(id_col, int(shards), shard_seed)
    )

    w_loc = Window.partitionBy(*by, "__shard").orderBy(*order_tail)
    w_run = w_loc.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    local_before = (
        F.sum(n_tok_col).over(w_run) - F.col(n_tok_col)
    ).cast("long")
    main = base.withColumn("__before_loc", local_before)

    # tiny frame: groups x shards rows; offset(s) = sum of totals of the
    # group's earlier shards (window over the TINY frame, not the corpus).
    # This branch re-reads the input once more, column-pruned to
    # (by, id, n_tok) with a map-side partial agg — only groups x shards
    # partial rows ever shuffle. The disclosed cost of breaking the
    # per-group barrier: a second narrow pass over the input (a 3-column
    # parquet scan at the sink; curate_corpus hands the packer a persisted
    # or trivially-recomputable narrow frame so the pass is cheap there).
    totals = base.groupBy(*by, "__shard").agg(
        F.sum(F.col(n_tok_col).cast("long")).alias("__tot")
    )
    w_off = (
        Window.partitionBy(*by)
        .orderBy("__shard")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = totals.select(
        *by,
        "__shard",
        F.coalesce(F.sum("__tot").over(w_off), F.lit(0)).alias("__off"),
    )

    # no forced broadcast hint: offsets is groups x shards rows — tiny
    # for the usual handful of (split, source) groups, but a forced
    # broadcast would OOM the driver at web-scale group cardinality
    # (millions of sources x 64 shards). AQE's runtime size-based join
    # selection broadcasts it when it IS tiny; otherwise the (by,
    # __shard) shuffle join is balanced by construction.
    out = main.join(offsets, [*by, "__shard"]).withColumn(
        "pack_id",
        F.floor(
            (F.col("__off") + F.col("__before_loc"))
            / F.lit(int(target_tokens))
        ),
    )
    # pack keys carry no skew (each pack ~ target tokens of docs): a
    # (by, pack_id) exchange is balanced at ANY group-size distribution
    w_pack = Window.partitionBy(*by, "pack_id").orderBy(
        "__shard", *order_tail
    )
    return out.withColumn(
        "pack_pos", (F.row_number().over(w_pack) - 1).cast("int")
    ).drop("__shard", "__before_loc", "__off")


def _assign_packs_single_window(
    base: DataFrame,
    target_tokens: int,
    by: list[str],
    id_col: str,
    n_tok_col: str,
    order_tail: list[str],
) -> DataFrame:
    """Legacy plan: ONE exchange + one sort — every window shares the
    same (partitionBy ``by``, orderBy order) spec; pack_pos is derived
    from the running pack-start row number instead of a second
    row_number over (by, pack_id). The whole of each group lands on one
    task: correct, minimal-shuffle, and skew-UNSAFE (see assign_packs)."""
    w = Window.partitionBy(*by).orderBy(*order_tail)
    w_run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cum = F.sum(n_tok_col).over(w_run)
    before = (cum - F.col(n_tok_col)).cast("long")
    out = (
        base.withColumn(
            "pack_id", F.floor(before / F.lit(int(target_tokens)))
        )
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


def extend_packs(
    existing: DataFrame,
    new_docs: DataFrame,
    target_tokens: int,
    by: str | list[str] = "source",
    id_col: str = "doc_id",
    n_tok_col: str = "n_tok",
    order_col: str | None = None,
    shards: int | None = 64,
    shard_seed: int = 0,
) -> DataFrame:
    """Incremental packing for an append-only corpus: pack ``new_docs``
    WITHOUT reassigning any committed pack.

    Re-running :func:`assign_packs` over existing+new would shift every
    cumsum after the first inserted document and renumber most packs —
    a training run that already consumed epoch data cannot tolerate pack
    ids migrating under it. Here every existing pack is FROZEN (including
    each group's trailing partial pack — the disclosed cost is at most
    one under-filled pack per group per increment, bounded padding
    rather than unbounded reshuffling) and new documents are packed
    independently, then shifted to start at each group's next free
    pack id. Groups unseen in ``existing`` start at 0.

    Deterministic and idempotent: replaying the same (existing, new)
    yields byte-identical assignments, and extending twice with the same
    batch double-packs it — dedup belongs upstream (the incremental
    dedup operators), not here. Returns ONLY the newly packed rows (the
    caller appends them to the committed pack table); the per-group max
    aggregation is the only touch on ``existing``, partial-aggregatable
    down to one row per group."""
    by = [by] if isinstance(by, str) else list(by)
    bases = existing.groupBy(*by).agg(
        (F.max("pack_id") + F.lit(1)).alias("__base")
    )
    packed_new = assign_packs(
        new_docs,
        target_tokens,
        by=by,
        id_col=id_col,
        n_tok_col=n_tok_col,
        order_col=order_col,
        shards=shards,
        shard_seed=shard_seed,
    )
    return (
        packed_new.join(F.broadcast(bases), by, "left")
        .withColumn(
            "pack_id", F.col("pack_id") + F.coalesce("__base", F.lit(0))
        )
        .drop("__base")
    )


def materialize_packs(
    packed: DataFrame,
    by: str | list[str] = "source",
    tokens_col: str = "tokens",
    id_col: str = "doc_id",
    sep_token: int | None = None,
) -> DataFrame:
    """Concatenate each pack's documents into ONE loader-ready token
    row: (by..., pack_id, tokens, n_tok, n_docs, doc_ids) — the
    training artifact assign_packs lays out. Documents join in
    pack_pos order; ``sep_token`` (e.g. an EOD id) is inserted BETWEEN
    documents when given (never trailing), so n_tok = sum of doc
    lengths + (n_docs - 1) separators.

    One exchange on the skew-free (by, pack_id) key (every pack holds
    ~target tokens by construction), then a pure-JVM sort + flatten of
    the collected (pack_pos, tokens) structs — collect_list per pack is
    bounded by the pack budget, not by document count in the group, so
    no hot source can blow an executor. doc_ids preserves the lineage
    the curation manifest tracks (which documents landed in which
    pack)."""
    by = [by] if isinstance(by, str) else list(by)
    ordered = F.array_sort(
        F.collect_list(
            F.struct(F.col("pack_pos"), F.col(tokens_col).alias("tk"),
                     F.col(id_col).alias("did"))
        )
    )
    agg = packed.groupBy(*by, "pack_id").agg(ordered.alias("__e"))
    docs = F.transform(F.col("__e"), lambda s: s["tk"])
    if sep_token is None:
        toks = F.flatten(docs)
    else:
        sep = F.array(F.lit(int(sep_token)).cast("int"))
        # separator BETWEEN docs: flatten doc_i || sep for all but the
        # last doc, then append the last doc bare
        n = F.size("__e")
        toks = F.concat(
            F.flatten(
                F.transform(
                    F.slice(docs, 1, n - 1),
                    lambda t: F.concat(t, sep),
                )
            ),
            F.element_at(docs, -1),
        )
    return (
        agg.withColumn(tokens_col, toks)
        .withColumn("n_tok", F.size(tokens_col).cast("int"))
        .withColumn("n_docs", F.size("__e").cast("int"))
        .withColumn(
            "doc_ids", F.transform(F.col("__e"), lambda s: s["did"])
        )
        .drop("__e")
    )
