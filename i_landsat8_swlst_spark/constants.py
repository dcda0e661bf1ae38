"""Physical constants and coefficient tables.

Reference parity targets (all [U] — /root/reference was empty, SURVEY.md §0):

- split-window coefficients b0..b7 per CWV subrange: reference ships them as
  a CSV parsed by ``csv_to_dictionary.py`` into namedtuples; acceptance is
  bit-for-bit CSV equality (BASELINE.json:6). Until the mount appears the
  values in ``data/sw_coefficients.csv`` are transcribed from Du et al. 2015
  (Remote Sensing 7(1):647-665, Table 1) and the bit-for-bit pytest is xfail.
- emissivity-by-landcover-class: reference ``average_emissivities.csv``
  ([U] csv_to_dictionary.py); transcribed values, same swap rule.
- CWV retrieval (MSWCVM, Ren et al. 2015): CWV = c2*R^2 + c1*R + c0 with the
  band-ratio R = cov(T10,T11)/var(T10) over an NxN moving window
  ([U] column_water_vapor.py :: Column_Water_Vapor). OQ-2: verify the sign
  convention against the source on mount.
"""

from __future__ import annotations

import csv
from pathlib import Path
from typing import NamedTuple

_DATA = Path(__file__).parent / "data"

# --- MTL constants (typical Landsat-8; per-scene values come from scene_meta,
#     these are only synthesis defaults; [U] i.landsat8.swlst.py :: MTL parse) ---
K1_B10 = 774.8853
K2_B10 = 1321.0789
K1_B11 = 480.8883
K2_B11 = 1201.1442
ML_DEFAULT = 3.342e-4  # RADIANCE_MULT_BAND_10/11
AL_DEFAULT = 0.1       # RADIANCE_ADD_BAND_10/11

ABSOLUTE_ZERO_C = 273.15  # Kelvin -> Celsius offset ([U] -c flag, C10)

# --- MSWCVM column-water-vapor quadratic (Ren et al. 2015; OQ-2) ---
# cwv = CWV_C2 * R^2 + CWV_C1 * R + CWV_C0
CWV_C0 = 9.087
CWV_C1 = 0.653
CWV_C2 = -9.674

CWV_MIN = 0.0
CWV_MAX = 6.3  # reference raises outside [0, 6.3]; we yield NULL (C14)

DEFAULT_CWV_WINDOW = 7  # [U] window= option, odd, >=7 recommended

# QA-band values treated as cloud -> NULL (C4; OQ-4: read the exact set from
# [U] i.landsat8.swlst.py :: clouds option on mount). 61440 is the Landsat-8
# BQA high-confidence cloud code commonly used by the module's examples.
DEFAULT_CLOUD_QA_VALUES = (61440, 59424, 57344)


class SWCoefficients(NamedTuple):
    """One subrange row of the split-window coefficient table (C8/C9)."""

    subrange: str
    cwv_min: float
    cwv_max: float
    b0: float
    b1: float
    b2: float
    b3: float
    b4: float
    b5: float
    b6: float
    b7: float
    rmse: float


class Emissivity(NamedTuple):
    landcover_class: str
    emissivity_b10: float
    emissivity_b11: float


def load_sw_coefficients(path: str | Path | None = None) -> list[SWCoefficients]:
    """Load the split-window coefficient CSV (reference-CSV-swappable).

    Mirrors [U] csv_to_dictionary.py — keep the CSV layout identical to the
    reference so dropping its file in here closes the bit-for-bit criterion
    as a data change only.
    """
    path = Path(path) if path else _DATA / "sw_coefficients.csv"
    out: list[SWCoefficients] = []
    with open(path, newline="") as fh:
        for row in csv.DictReader(fh):
            out.append(
                SWCoefficients(
                    subrange=row["subrange"],
                    **{k: float(row[k]) for k in SWCoefficients._fields if k != "subrange"},
                )
            )
    return out


def load_emissivities(path: str | Path | None = None) -> list[Emissivity]:
    path = Path(path) if path else _DATA / "emissivities.csv"
    out: list[Emissivity] = []
    with open(path, newline="") as fh:
        for row in csv.DictReader(fh):
            out.append(
                Emissivity(
                    landcover_class=row["landcover_class"],
                    emissivity_b10=float(row["emissivity_b10"]),
                    emissivity_b11=float(row["emissivity_b11"]),
                )
            )
    return out


def sw_coefficients_by_subrange() -> dict[str, SWCoefficients]:
    return {c.subrange: c for c in load_sw_coefficients()}


def emissivities_by_class() -> dict[str, Emissivity]:
    return {e.landcover_class: e for e in load_emissivities()}


# Selection order for overlapping subranges (OQ-1, SURVEY.md §2.1 C8):
# deterministic documented rule = first matching range in ascending order
# Range_1..Range_5 (half-open [lo, hi), last range closed). Range_6 is the
# whole-range fallback used only when explicitly requested (cwv unknown).
SUBRANGE_ORDER = ["Range_1", "Range_2", "Range_3", "Range_4", "Range_5"]
FALLBACK_SUBRANGE = "Range_6"
