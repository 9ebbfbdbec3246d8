"""Data-contract validation gates (dbt-test style) as one-scan reads.

The pre-ingest questions every pipeline asks before a table is allowed
into the warehouse: are required columns populated, are enums in their
accepted sets, are numerics in range, is the declared key actually
unique, do foreign keys resolve? Each family is expressed so the whole
contract costs the minimum number of scans:

- :func:`column_checks` — ANY number of row-level predicates over one
  table in ONE scan (a single agg of conditional sums, unpivoted to
  long form); a violation is a row where the predicate is FALSE (NULL
  passes, SQL WHERE-complement semantics — write ``col.isNotNull()``
  explicitly for required columns).
- :func:`unique_check` — duplicate-key row count as
  ``count(*) - count(distinct key)``: partial-aggregatable, no
  groupBy-then-filter second pass.
- :func:`fk_check` — child ROWS whose key has no parent, one
  left-anti join against the parent's distinct key projection.
- :func:`contract_report` — union of any of the above into one
  (check, n_violations) frame, each input already aggregated to one
  row so the union is driver-scale.

From-scratch design for the graft (no reference counterpart; the
reference's validation is per-series rule masks — this is the
relational twin for the warehouse tables around them).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def column_checks(df: DataFrame, checks: dict[str, Column]) -> DataFrame:
    """All row-level contract predicates over one table in ONE scan.

    ``checks`` maps check name -> boolean Column; a row violates a
    check iff the predicate is FALSE (NULL passes — use
    ``col.isNotNull()`` for required-ness). Returns long-form
    (check, n_violations), one row per check, via a single aggregate
    of conditional sums followed by a stack unpivot of the 1-row
    result — N checks never cost N scans.
    """
    aggs = [
        F.sum(
            F.when(~F.coalesce(pred, F.lit(True)), 1).otherwise(0)
        ).alias(name)
        for name, pred in checks.items()
    ]
    wide = df.agg(*aggs)
    names = list(checks)
    stack = ", ".join(f"'{n}', `{n}`" for n in names)
    return wide.selectExpr(
        f"stack({len(names)}, {stack}) as (check, n_violations)"
    )


def unique_check(df: DataFrame, cols: tuple[str, ...], name: str) -> DataFrame:
    """Declared-key uniqueness: n_violations = rows beyond the first of
    each duplicated key = ``count(*) - count(distinct key)`` — exact,
    partial-aggregatable, one scan, no groupBy-by-key materialization."""
    key = F.struct(*[F.col(c) for c in cols])
    return df.agg(
        (F.count(F.lit(1)) - F.count_distinct(key)).alias("n_violations")
    ).select(F.lit(name).alias("check"), "n_violations")


def fk_check(
    child: DataFrame,
    col: str,
    parent: DataFrame,
    parent_col: str,
    name: str,
) -> DataFrame:
    """Referential integrity: child ROWS whose ``col`` resolves to no
    parent ``parent_col`` (NULL child keys violate too — an unresolvable
    reference either way). One left-anti equi-join against the parent's
    distinct key projection; Catalyst broadcasts the parent side when
    it is small, falls back to shuffle join when it is not."""
    p = parent.select(F.col(parent_col).alias("__pk")).distinct()
    missing = child.select(F.col(col).alias("__ck")).join(
        p, F.col("__ck") == F.col("__pk"), "left_anti"
    )
    return missing.agg(F.count(F.lit(1)).alias("n_violations")).select(
        F.lit(name).alias("check"), "n_violations"
    )


def contract_report(parts: list[DataFrame]) -> DataFrame:
    """Union the one-row check frames into the contract's final
    (check, n_violations) report — every part is already aggregated,
    so this is a driver-scale union of tiny frames."""
    return reduce(lambda a, b: a.unionByName(b), parts)


def corpus_diff(
    old: DataFrame,
    new: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Snapshot-to-snapshot change capture for a document corpus — the
    ingest-audit read that answers "what did yesterday's crawl refresh
    actually change?" before tiers are rebuilt or packs re-frozen:

    - ``added``   — id only in the new snapshot,
    - ``removed`` — id only in the old snapshot,
    - ``modified``— id in both, content hash differs.

    Unchanged docs are NOT emitted (the delta is the answer; at 100 TB
    the unchanged set is the corpus).  Content equality is md5 over
    NULL-coalesced text, so a NULL→'' edit counts as unchanged (both
    hash '') while NULL→'x' counts as modified — the convention the
    exact-dedup operator uses.

    Plan shape: each side collapses to ``(id, hash)`` in the scan
    projection (two columns read, text never shuffled), then ONE
    full-outer equi-join on the id — partial nothing, but the shuffled
    payload is 2×16 bytes per doc, not documents.  Output:
    ``doc_id, status`` with status in {added, removed, modified}.
    """
    o = old.select(
        F.col(id_col).alias("doc_id"),
        F.md5(F.coalesce(F.col(text_col), F.lit(""))).alias("__ho"),
    )
    n = new.select(
        F.col(id_col).alias("doc_id"),
        F.md5(F.coalesce(F.col(text_col), F.lit(""))).alias("__hn"),
    )
    j = o.join(n, "doc_id", "full_outer")
    status = (
        F.when(F.col("__ho").isNull(), F.lit("added"))
        .when(F.col("__hn").isNull(), F.lit("removed"))
        .when(F.col("__ho") != F.col("__hn"), F.lit("modified"))
    )
    return (
        j.select("doc_id", status.alias("status"))
        .filter(F.col("status").isNotNull())
    )
