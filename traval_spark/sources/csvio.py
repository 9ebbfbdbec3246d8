"""CSV series source/sink (reference examples ex01 cell 2 format).

The reference loads observation series from wide CSVs shaped
``index,<name1>[,<name2>...]`` with a timestamp index column and one
float column per series (examples/data/raw_series.csv). This module
maps that format onto the engine's long frame
``(series_id, ts, value)`` and back:

- :func:`read_series_csv` — distributed ``spark.read.csv`` scan with an
  explicit timestamp-first schema (no inferSchema: schema inference
  reads the file twice and guesses; at 100 TB the scan must be
  single-pass with a declared schema), then an ``unpivot`` (Spark's
  native melt — one Generate node, no per-column union) to long form.
- :func:`write_series_csv` — partitioned long-form CSV sink; the wide
  single-file form the reference writes is a driver-side convenience
  for small exports only (``to_wide_pandas``).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from traval_spark.functions.ts import SID, TS, ensure_ntz


def read_series_csv(
    spark: SparkSession,
    path: str,
    ts_col: str = "index",
    ts_format: str | None = None,
) -> DataFrame:
    """Read a reference-format wide series CSV into the long frame.

    All non-index columns become one series each (column name =
    series_id); empty cells become NULL values (the reference's NaN —
    SURVEY §1.4 missing-vs-NaN distinction is preserved because a row
    absent from the CSV is absent from the frame, while an empty cell
    is a NULL value at an existing timestamp).
    """
    header = spark.read.csv(path, header=True).schema.fieldNames()
    if ts_col not in header:
        raise ValueError(f"CSV at {path} has no {ts_col!r} column")
    value_cols = [c for c in header if c != ts_col]
    ddl = ", ".join(
        [f"`{ts_col}` STRING"] + [f"`{c}` DOUBLE" for c in value_cols]
    )
    df = spark.read.csv(path, header=True, schema=ddl)
    ts = (
        F.to_timestamp(F.col(ts_col), ts_format)
        if ts_format
        else F.to_timestamp(F.col(ts_col))
    )
    df = df.withColumn(ts_col, ts.cast("timestamp_ntz"))
    long = df.unpivot(
        ids=[ts_col],
        values=value_cols,
        variableColumnName=SID,
        valueColumnName="value",
    )
    return long.select(
        F.col(SID), F.col(ts_col).alias(TS), F.col("value")
    )


def write_series_csv(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Long-form CSV sink, partitioned by series_id for parallel writes
    and partition-pruned reads of single series."""
    (
        ensure_ntz(df)
        .repartition(SID)
        .write.mode(mode)
        .partitionBy(SID)
        .option("header", True)
        .csv(path)
    )


def write_wide_csv(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    ts_format: str = "yyyy-MM-dd HH:mm:ss",
    single_file: bool = True,
    series_ids: list[str] | None = None,
) -> None:
    """Distributed wide-CSV sink in the reference's exact file shape
    (``index,<name1>[,<name2>...]``).

    The pivot is a ``groupBy(ts).pivot(series_id)`` aggregation — executors
    do the reshaping, the driver never materializes the long frame (the
    earlier ``to_wide_pandas`` export collected it wholesale). Pass
    ``series_ids`` to fix the COLUMN ORDER (and skip pivot's
    values-discovery job): a long frame carries no column order, so
    auto-discovery emits series columns ALPHABETICALLY — for a
    byte-identical round trip of a reference CSV whose header is not
    alphabetical, pass its original header order here.
    ``single_file=True`` coalesces to one part file (the reference's
    one-file export convention — only sensible for exports that fit a
    file); False keeps one file per shuffle partition for bulk exports.
    Cells with no row at that (ts, series) and cells with NULL values
    both render empty, exactly like the reference's NaN cells.
    """
    piv = ensure_ntz(df).select(
        F.col(TS).alias("index"), F.col(SID), F.col("value")
    ).groupBy("index")
    piv = piv.pivot(SID, series_ids) if series_ids else piv.pivot(SID)
    wide = piv.agg(F.first("value"))
    if single_file:
        wide = wide.coalesce(1)
    (
        wide.sortWithinPartitions("index")
        .write.mode(mode)
        .option("header", True)
        .option("timestampNTZFormat", ts_format)
        .csv(path)
    )


def to_wide_pandas(df: DataFrame) -> pd.DataFrame:
    """Driver-side wide pivot matching the reference CSV shape — for
    SMALL exports only (the reference's whole data model is one pandas
    frame; here the collect is explicit and opt-in)."""
    pdf = ensure_ntz(df).select(SID, TS, "value").toPandas()
    wide = pdf.pivot(index=TS, columns=SID, values="value").sort_index()
    wide.index.name = "index"
    wide.columns.name = None
    return wide
