"""Normalization constants (equivalent of reference graph_weather/data/const.py).

The numeric tables (GFS forecast means/stds/min/max/diffs, ERA5 per-level
stats, land-sea and solar stats — pure data, ~700 variables each) are
stored in the compact `constants.npz` artifact next to this module and
exposed lazily under the reference's names:

    LANDSEA_MEAN, LANDSEA_STD, SOLAR_MEAN/STD/MAX/MIN,
    FORECAST_MEANS/STD/MAX/MIN, FORECAST_DIFF_MEANS/STD/MAX/MIN,
    ERA5_MEANS/STD, ERA5_DIFF_MEAN/DIFF_STD,
    ANALYSIS_* / REANALYSIS_* (empty in the reference too).

Dict-valued tables map variable name -> float (or per-pressure-level list
for the ERA5 entries).
"""

from __future__ import annotations

import json
import os
from functools import lru_cache

import numpy as np

_NPZ_PATH = os.path.join(os.path.dirname(__file__), "constants.npz")


@lru_cache(maxsize=1)
def _load():
    data = np.load(_NPZ_PATH, allow_pickle=False)
    out = {}
    for key in data.files:
        if key == "__scalars__":
            out.update(json.loads(str(data[key])))
        elif key.endswith("__keys"):
            name = key[: -len("__keys")]
            keys = json.loads(str(data[key]))
            values = data[name + "__values"]
            out[name] = dict(zip(keys, values.tolist()))
        elif key.endswith("__values"):
            continue
        elif key.endswith("__json"):
            table = json.loads(str(data[key]))
            # scalar-valued entries were stored as length-1 lists; unwrap
            out[key[: -len("__json")]] = {
                k: (v[0] if isinstance(v, list) and len(v) == 1 else v)
                for k, v in table.items()
            }
        else:
            out[key] = data[key]
    # empty placeholder lists present in the reference
    for name in (
        "ANALYSIS_MEANS", "ANALYSIS_STD", "ANALYSIS_MAX", "ANALYSIS_MIN",
        "ANALYSIS_VARIANCE", "REANALYSIS_MEANS", "REANALYSIS_STD",
        "REANALYSIS_MAX", "REANALYSIS_MIN", "REANALYSIS_VARIANCE",
    ):
        out.setdefault(name, [])
    return out


def __getattr__(name: str):
    table = _load()
    if name in table:
        return table[name]
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")


def __dir__():
    return sorted(_load().keys())
