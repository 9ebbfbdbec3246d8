"""TravalParameters: per-location rule parameters as a small dimension.

The reference stores parameters in a pandas MultiIndex frame
(location, rulename, parameter) -> value with per-location overrides over a
"default" row (/root/reference/traval/params.py:47-109). Here the same
data is a tiny dimension table that broadcast-joins onto the fleet — the
Spark-native replacement for callable kwargs resolved per series name
(/root/reference/traval/ruleset.py:276-303).
"""

from __future__ import annotations

import json

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DEFAULT = "default"
COLS = ["location", "rulename", "parameter", "value"]


class TravalParameters:
    """(location, rulename, parameter) -> value with default fallback."""

    def __init__(self, pdf: pd.DataFrame):
        missing = [c for c in COLS if c not in pdf.columns]
        if missing:
            raise ValueError(f"params frame missing columns: {missing}")
        self.pdf = pdf[COLS].copy()

    # -- construction ----------------------------------------------------

    @classmethod
    def from_ruleset(cls, ruleset, locations=None) -> "TravalParameters":
        """Harvest scalar kwargs from a ruleset as default parameters
        (reference params.py:111-143 analog)."""
        rows = []
        for nm, rule in ruleset.rules.items():
            for k, v in (rule["kwargs"] or {}).items():
                if isinstance(v, (int, float)):
                    rows.append((DEFAULT, nm, k, float(v)))
                    for loc in locations or []:
                        rows.append((loc, nm, k, float(v)))
        return cls(pd.DataFrame(rows, columns=COLS))

    # -- access (params.py:145-220 get/update/delete analogs) -------------

    def get(self, rulename: str, parameter: str, location: str | None = None):
        sel = self.pdf[
            (self.pdf.rulename == rulename) & (self.pdf.parameter == parameter)
        ]
        if location is not None:
            loc = sel[sel.location == location]
            if not loc.empty:
                return loc.value.iloc[0]
        dft = sel[sel.location == DEFAULT]
        if dft.empty:
            raise KeyError((location, rulename, parameter))
        return dft.value.iloc[0]

    def set(self, rulename: str, parameter: str, value: float,
            location: str = DEFAULT) -> None:
        mask = (
            (self.pdf.location == location)
            & (self.pdf.rulename == rulename)
            & (self.pdf.parameter == parameter)
        )
        if mask.any():
            self.pdf.loc[mask, "value"] = value
        else:
            self.pdf.loc[len(self.pdf)] = [location, rulename, parameter, value]

    def delete(self, rulename: str, parameter: str, location: str) -> None:
        mask = (
            (self.pdf.location == location)
            & (self.pdf.rulename == rulename)
            & (self.pdf.parameter == parameter)
        )
        if not mask.any():
            raise KeyError((location, rulename, parameter))
        self.pdf = self.pdf[~mask].reset_index(drop=True)

    # -- spark side --------------------------------------------------------

    def to_spark(self, spark: SparkSession, series_ids: DataFrame) -> DataFrame:
        """Resolve to a (series_id, rulename, parameter, value) table.

        Per-location overrides win over defaults; every series_id gets a
        fully-resolved row set, ready for the broadcast ParamRef join in
        plans/ruleset.py.
        """
        params = spark.createDataFrame(self.pdf)
        defaults = params.filter(F.col("location") == DEFAULT).select(
            "rulename", "parameter", F.col("value").alias("default_value")
        )
        overrides = params.filter(F.col("location") != DEFAULT).select(
            F.col("location").alias("series_id"),
            "rulename", "parameter",
            F.col("value").alias("override_value"),
        )
        base = series_ids.crossJoin(F.broadcast(defaults))
        out = base.join(
            F.broadcast(overrides),
            on=["series_id", "rulename", "parameter"],
            how="left",
        )
        return out.select(
            "series_id", "rulename", "parameter",
            F.coalesce("override_value", "default_value").alias("value"),
        )

    # -- serde (params.py:145-220, 432-478 round-trips) --------------------

    def to_csv(self, path: str) -> None:
        self.pdf.to_csv(path, index=False)

    @classmethod
    def from_csv(cls, path: str) -> "TravalParameters":
        return cls(pd.read_csv(path))

    def to_json(self, path: str | None = None):
        payload = json.dumps(self.pdf.to_dict(orient="records"), indent=2)
        if path is None:
            return payload
        with open(path, "w") as f:
            f.write(payload)

    @classmethod
    def from_json(cls, path_or_str: str) -> "TravalParameters":
        if path_or_str.lstrip().startswith("["):
            data = json.loads(path_or_str)
        else:
            with open(path_or_str) as f:
                data = json.load(f)
        return cls(pd.DataFrame(data, columns=COLS))

    def to_pickle(self, path: str) -> None:
        self.pdf.to_pickle(path)

    @classmethod
    def from_pickle(cls, path: str) -> "TravalParameters":
        return cls(pd.read_pickle(path))

    def __eq__(self, other) -> bool:
        return isinstance(other, TravalParameters) and self.pdf.sort_values(
            COLS[:3]
        ).reset_index(drop=True).equals(
            other.pdf.sort_values(COLS[:3]).reset_index(drop=True)
        )
