"""NNJA-AI sensor dataset loader (reference data/nnja_ai.py:23-194).

Loads observation datasets from the NNJA-AI catalog with the same variable
classification and coordinate standardization. The catalog object is
injectable (dependency-inversion) so the loader is testable without the
optional `nnja-ai` package — the reference tests MagicMock the catalog too
(reference tests/test_nnjai.py:22-86).
"""

from __future__ import annotations

import numpy as np


def _classify_variable(nnja_var) -> str:
    """Category of a variable via attributes or repr fallback."""
    if hasattr(nnja_var, "category"):
        return nnja_var.category
    if hasattr(nnja_var, "role"):
        return nnja_var.role
    tag = repr(nnja_var).lower()
    if "primary_descriptor" in tag or "primary descriptor" in tag:
        return "primary_descriptor"
    if "primary_data" in tag or "primary data" in tag:
        return "primary_data"
    return "other"


_RENAME = {"OBS_TIMESTAMP": "time", "LAT": "latitude", "LON": "longitude"}


def load_nnja_dataset(
    dataset_name: str,
    time=None,
    variables: list[str] | None = None,
    load_all: bool = False,
    catalog=None,
):
    """Load an NNJA dataset as a pandas DataFrame indexed/columned by time.

    Returns a DataFrame with standardized column names ('time', 'latitude',
    'longitude', ...). Pass `catalog` to inject a catalog object; otherwise
    the optional nnja_ai package provides one.
    """
    if catalog is None:
        try:
            from nnja_ai import DataCatalog
        except ImportError as e:
            raise ImportError(
                "NNJA-AI library not installed. Install with: `pip install nnja-ai`, "
                "or inject a catalog object."
            ) from e
        catalog = DataCatalog()

    try:
        ds_meta = catalog[dataset_name]
        ds_meta.load_manifest()
    except KeyError as e:
        raise ValueError(f"Dataset '{dataset_name}' not found in catalog") from e

    vars_dict = ds_meta.variables
    if load_all:
        vars_to_load = list(vars_dict.keys())
    elif variables:
        invalid = [v for v in variables if v not in vars_dict]
        if invalid:
            raise ValueError(f"Invalid variables requested: {invalid}")
        vars_to_load = list(variables)
    else:
        vars_to_load = [
            name
            for name, v in vars_dict.items()
            if _classify_variable(v)
            in ("primary_descriptor", "primary_data", "primary descriptor", "primary data")
        ]

    for coord_var in _RENAME:
        if coord_var in vars_dict and coord_var not in vars_to_load:
            vars_to_load.append(coord_var)

    try:
        df = ds_meta.sel(time=time, variables=vars_to_load).load_dataset(
            backend="pandas", engine="pyarrow"
        )
    except Exception as e:
        raise RuntimeError(f"Error loading dataset '{dataset_name}': {e}") from e

    df = df.rename(columns={k: v for k, v in _RENAME.items() if k in df.columns})
    if "time" not in df.columns and "OBS_DATE" in df.columns:
        df = df.rename(columns={"OBS_DATE": "time"})
    if "time" in df.columns and not np.issubdtype(df["time"].dtype, np.datetime64):
        df["time"] = df["time"].astype("datetime64[ns]")
    return df


class SensorDataset:
    """Map-style dataset over NNJA observations: item -> {var: value}."""

    def __init__(
        self, dataset_name, time=None, variables=None, load_all=False, catalog=None
    ):
        self.dataset_name = dataset_name
        self.time = time
        self.df = load_nnja_dataset(
            dataset_name, time=time, variables=variables, load_all=load_all,
            catalog=catalog,
        )
        self.variables = [c for c in self.df.columns]

    def __len__(self):
        return len(self.df)

    def __getitem__(self, idx):
        row = self.df.iloc[idx]
        return {var: row[var] for var in self.variables}


class NNJADataset(SensorDataset):
    """Alias retained for reference API parity (NNJATorchDataset analogue)."""
