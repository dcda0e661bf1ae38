"""Scalar reference oracle — pure-Python transliteration of the published
algorithm, mirroring the reference's *eager scalar* paths
([U] split_window_lst.py :: SplitWindowLST.compute_lst and the scalar helpers
of column_water_vapor.py; SURVEY.md §5.2 item 1).

Deliberately written as naive per-pixel loops with no numpy vectorization so
it shares no code with i_landsat8_swlst_spark.kernels. When /root/reference
mounts, re-transcribe these bodies from the source verbatim (SURVEY.md §0).
"""

from __future__ import annotations

import math

from i_landsat8_swlst_spark import constants as C

_SW = C.sw_coefficients_by_subrange()


def radiance(dn: float, ml: float, al: float) -> float:
    return ml * dn + al


def brightness_temperature(dn: float, ml: float, al: float, k1: float, k2: float) -> float:
    L = radiance(dn, ml, al)
    if L <= 0:
        return math.nan
    return k2 / math.log(k1 / L + 1.0)


def cwv_ratio_window(t10_win: list[float], t11_win: list[float]) -> float:
    """Rji over one full window (lists of N*N scalars); NaN if any NULL."""
    n = len(t10_win)
    if any(math.isnan(v) for v in t10_win) or any(math.isnan(v) for v in t11_win):
        return math.nan
    m10 = sum(t10_win) / n
    m11 = sum(t11_win) / n
    num = sum((a - m10) * (b - m11) for a, b in zip(t10_win, t11_win))
    den = sum((a - m10) ** 2 for a in t10_win)
    if den == 0:
        return math.nan
    return num / den


def cwv_from_ratio(r: float) -> float:
    if math.isnan(r):
        return math.nan
    return C.CWV_C2 * r * r + C.CWV_C1 * r + C.CWV_C0


def select_subrange(cwv: float) -> str | None:
    """OQ-1 rule: first matching range ascending; Range_5 upper bound closed."""
    if math.isnan(cwv):
        return None
    for name in C.SUBRANGE_ORDER:
        c = _SW[name]
        last = name == C.SUBRANGE_ORDER[-1]
        if c.cwv_min <= cwv < c.cwv_max or (last and cwv == c.cwv_max):
            return name
    return None


def compute_lst(t10: float, t11: float, cwv: float, e10: float, e11: float) -> float:
    """Du et al. 2015 eq. (quadratic split-window model), scalar."""
    name = select_subrange(cwv)
    if name is None:
        return math.nan
    b = _SW[name]
    e = (e10 + e11) / 2.0
    de = e10 - e11
    avg = (t10 + t11) / 2.0
    diff = (t10 - t11) / 2.0
    w1 = b.b1 + b.b2 * (1.0 - e) / e + b.b3 * de / (e * e)
    w2 = b.b4 + b.b5 * (1.0 - e) / e + b.b6 * de / (e * e)
    return b.b0 + w1 * avg + w2 * diff + b.b7 * (t10 - t11) ** 2


def compute_lst_whole_range(t10: float, t11: float, e10: float, e11: float) -> float:
    b = _SW[C.FALLBACK_SUBRANGE]
    e = (e10 + e11) / 2.0
    de = e10 - e11
    w1 = b.b1 + b.b2 * (1.0 - e) / e + b.b3 * de / (e * e)
    w2 = b.b4 + b.b5 * (1.0 - e) / e + b.b6 * de / (e * e)
    return b.b0 + w1 * (t10 + t11) / 2.0 + w2 * (t10 - t11) / 2.0 + b.b7 * (t10 - t11) ** 2


def cwv_grid(t10, t11, window: int):
    """Per-pixel CWV over a 2-D grid by direct window loops (slow, exact)."""
    h = len(t10)
    w = len(t10[0])
    r = window // 2
    out = [[math.nan] * w for _ in range(h)]
    for y in range(h):
        for x in range(w):
            if y - r < 0 or x - r < 0 or y + r >= h or x + r >= w:
                continue  # off-map window cell -> NULL
            w10, w11 = [], []
            for dy in range(-r, r + 1):
                for dx in range(-r, r + 1):
                    w10.append(t10[y + dy][x + dx])
                    w11.append(t11[y + dy][x + dx])
            out[y][x] = cwv_from_ratio(cwv_ratio_window(w10, w11))
    return out
