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

    # -- reference-named API (params.py:68-89, 262-393) --------------------

    @property
    def n_locations(self) -> int:
        """Number of non-default locations (reference params.py:68-71)."""
        return int(self.pdf.loc[self.pdf.location != DEFAULT,
                                "location"].nunique())

    @property
    def locations(self) -> list:
        """Unique non-default locations (reference params.py:73-79)."""
        return sorted(self.pdf.loc[self.pdf.location != DEFAULT,
                                   "location"].unique())

    @property
    def rulenames(self) -> list:
        """Unique rule names (reference params.py:81-88)."""
        return sorted(self.pdf.rulename.unique())

    def get_parameters(self, rulename=None, location=None, parameter=None,
                       squeeze=True):
        """Query parameters (reference params.py:262-313 semantics).

        location=None queries the defaults; a named location queries that
        location's rows (ValueError when the table has no
        location-specific rows at all, KeyError when it has some but not
        this location — the reference's two distinct failure modes).
        Returns a value-Series indexed (location, rulename, parameter),
        squeezed to the bare value when the query hits exactly one row.
        """
        if location is None:
            sel = self.pdf[self.pdf.location == DEFAULT]
        else:
            nondefault = self.pdf[self.pdf.location != DEFAULT]
            if nondefault.empty:
                raise ValueError("No location specific parameters!")
            sel = nondefault[nondefault.location == location]
            if sel.empty:
                raise KeyError(
                    f"Location '{location}' not in parameters DataFrame!"
                )
        if rulename is not None:
            sel = sel[sel.rulename == rulename]
        if parameter is not None:
            sel = sel[sel.parameter == parameter]
        if sel.empty and (rulename is not None or parameter is not None):
            raise KeyError((location, rulename, parameter))
        out = sel.set_index(["location", "rulename", "parameter"])["value"]
        return out.squeeze() if squeeze else out

    def get_parameters_as_dict(self, rulename, location=None) -> dict:
        """{parameter: value} for one rule (reference params.py:315-332)."""
        p = self.get_parameters(rulename=rulename, location=location,
                                squeeze=False)
        return p.droplevel([0, 1], axis=0).to_dict()

    def update_parameter_value(self, location, rulename, parameter, value):
        """Update a location-specific value (reference params.py:334-350;
        ValueError when the table holds no location-specific rows)."""
        if self.pdf[self.pdf.location != DEFAULT].empty:
            raise ValueError("No location specific parameters!")
        self.set(rulename, parameter, value, location=location)

    def update_default_value(self, rulename, parameter, value):
        """Update a default value (reference params.py:352-364)."""
        self.set(rulename, parameter, value, location=DEFAULT)

    def delete_parameter_value(self, location, rulename, parameter):
        """Delete a location-specific value (reference params.py:366-380)."""
        if self.pdf[self.pdf.location != DEFAULT].empty:
            raise ValueError("No location specific parameters!")
        self.delete(rulename, parameter, location)

    def delete_default_value(self, rulename, parameter):
        """Delete a default value (reference params.py:382-392)."""
        self.delete(rulename, parameter, DEFAULT)

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
