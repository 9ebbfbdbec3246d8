"""Correction-mask builders: the scalar-expression layer.

Re-expresses the reference mask kernels
(/root/reference/traval/ts_utils.py:19-231) as Spark Column initializers:
``get_empty_corrections_df`` becomes ``lit(0)`` / ``lit(None)`` columns,
``_mask_corrections`` becomes ``when(mask, ...)`` projections. All fully
codegen'd JVM-side — no Python in the hot path.

A corrections result is three columns added to the long frame:

- ``{out}_code``  int     correction code (0 = no correction)
- ``{out}_sval``  double  series value where flagged
- ``{out}_cval``  double/string  comparison value where flagged
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from traval_spark.codes import CODE_NAMES, CorrectionCode


def mask_corrections(
    df: DataFrame,
    in_col: str,
    out: str,
    mask: Column,
    code: int | Column,
    cval: Column | None = None,
) -> DataFrame:
    """Add corrections columns: set ``code`` where mask, copy series/cmp values.

    Mirrors ``_mask_corrections`` (/root/reference/traval/ts_utils.py:38-47).
    NULL-valued masks count as False (pandas NaN comparisons are False).
    ``code`` may be a Column for rules whose code depends on a per-series
    parameter (rule_max_gradient with a per-series signed max_step).
    """
    m = F.coalesce(mask, F.lit(False))
    code_col = code if isinstance(code, Column) else F.lit(code)
    df = df.withColumn(f"{out}_code", F.when(m, code_col).otherwise(F.lit(0)))
    df = df.withColumn(f"{out}_sval", F.when(m, F.col(in_col)).otherwise(F.lit(None)))
    if cval is None:
        cv = F.lit(None).cast("double")
    else:
        cv = F.when(m, cval).otherwise(F.lit(None))
    return df.withColumn(f"{out}_cval", cv)


def mask_above_below(
    df: DataFrame,
    in_col: str,
    out: str,
    mask_above: Column,
    thr_above: Column,
    mask_below: Column,
    thr_below: Column,
) -> DataFrame:
    """Two-sided threshold corrections (codes 2 above / -2 below).

    The reference builds two frames and *adds* them
    (/root/reference/traval/ts_utils.py:50-78, ``c_above.add(c_below)``);
    the masks are disjoint by construction (strict > upper vs < lower), so
    a two-branch CASE is exactly equivalent.
    """
    ma = F.coalesce(mask_above, F.lit(False))
    mb = F.coalesce(mask_below, F.lit(False))
    code = (
        F.when(ma & mb, F.lit(0))  # overlapping masks cancel: 2 + (-2)
        .when(ma, F.lit(int(CorrectionCode.ABOVE_THRESHOLD)))
        .when(mb, F.lit(int(CorrectionCode.BELOW_THRESHOLD)))
        .otherwise(F.lit(0))
    )
    df = df.withColumn(f"{out}_code", code)
    df = df.withColumn(
        f"{out}_sval", F.when(ma | mb, F.col(in_col)).otherwise(F.lit(None))
    )
    cv = F.when(ma, thr_above).when(mb, thr_below).otherwise(F.lit(None))
    return df.withColumn(f"{out}_cval", cv)


def correction_status_name(code: Column) -> Column:
    """Map a correction-code column to its status name string.

    Mirrors ``get_correction_status_name``
    (/root/reference/traval/ts_utils.py:478-491) as a CASE expression.
    """
    c0 = F.coalesce(code, F.lit(0))
    out = None
    for c, name in CODE_NAMES.items():
        out = F.when(c0 == c, F.lit(name)) if out is None else out.when(
            c0 == c, F.lit(name)
        )
    return out.otherwise(F.lit(None).cast("string"))


def corrections_as_float(code: Column, sval: Column, cval: Column) -> Column:
    """code==4 -> (comparison - series) float shift, else 0.0.

    Mirrors ``corrections_as_float`` (/root/reference/traval/ts_utils.py:208-231).
    """
    return F.when(code == 4, cval.cast("double") - sval).otherwise(F.lit(0.0))


def corrections_as_nan(code: Column) -> Column:
    """Replicate the reference's ``corrections_as_nan`` *verbatim*, bug included.

    The reference condition ``(c != 0) | (c != 4)``
    (/root/reference/traval/ts_utils.py:204) is a tautology, so every point
    becomes NaN. Replicated for bit-compatibility (SURVEY.md §7.2), as it is
    only reachable via ``Detector.get_corrections_dataframe(as_addable_df=True)``.
    """
    tautology = (code != 0) | (code != 4)
    return F.when(tautology, F.lit(None).cast("double")).otherwise(F.lit(0.0))


def get_correction_status_name(code):
    """Reference-name alias (ts_utils.py:478-491).

    Accepts a correction-code Column (CASE expression), a pandas
    Series/DataFrame (the reference's signature: NaN->0 then mapped,
    unknown codes raise ValueError exactly like ``CorrectionCode(c)``),
    or a plain int code."""
    if isinstance(code, Column):
        return correction_status_name(code)
    if isinstance(code, (pd.Series, pd.DataFrame)):
        return code.fillna(0).map(lambda c: CorrectionCode(c).name)
    return CorrectionCode(code).name
