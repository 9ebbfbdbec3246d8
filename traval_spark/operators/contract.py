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
