"""M17: FIDE performance-rating scalar function, vectorized.

Semantics from the reference (old_scripts/performanceCalculator.py:9-178):
for 8-11 games the FIDE dp lookup maps the exact half-point score to a
delta added to the opponents' average rating; for any other game count
the closed form ``round((ratingSum + 400*(wins - losses)) / n)`` applies
(0 games → 0). The dp deltas are antisymmetric (delta(n, p) =
-delta(n, n-p)), so only the lower half is tabulated here.

Implemented as a dense (n-8, points*2) numpy lookup so whole columns
evaluate in one shot inside ``map_batches`` — no per-row Python.
"""

from __future__ import annotations

import numpy as np

# lower half (points*2 = 0 .. n) of the dp delta table per game count;
# mirrored to the upper half below. Values are the FIDE dp table the
# reference hard-codes per (n, points).
_HALF = {
    8: [-800, -444, -322, -251, -193, -141, -95, -43, 0],
    9: [-800, -444, -351, -273, -220, -166, -125, -80, -43, 0],
    10: [-800, -470, -366, -296, -240, -193, -149, -110, -72, -36, 0],
    11: [-800, -470, -383, -309, -262, -211, -175, -133, -102, -65, -36, 0],
}

_TABLE = np.full((4, 23), np.nan)  # rows: n=8..11; cols: points*2 = 0..22
for _n, _low in _HALF.items():
    for _i, _d in enumerate(_low):
        _TABLE[_n - 8, _i] = _d
        _TABLE[_n - 8, 2 * _n - _i] = -_d


def rating_performance(
    n_games: np.ndarray,
    points: np.ndarray,
    opp_avg_rating: np.ndarray,
    rating_sum: np.ndarray,
    wins: np.ndarray,
    losses: np.ndarray,
) -> np.ndarray:
    """Vectorized performance rating. Inputs are equal-length arrays; the
    output is float64 (NaN where the reference falls through without a
    return: n in 8..11 with a non-tabulated points value)."""
    n = np.asarray(n_games, dtype=np.int64)
    p_raw = np.asarray(points, dtype=np.float64) * 2
    p2 = np.round(p_raw).astype(np.int64)
    is_half = np.abs(p_raw - p2) < 1e-9  # non-half-point scores fall through
    avg = np.asarray(opp_avg_rating, dtype=np.float64)
    out = np.full(len(n), np.nan)

    in_tab = (n >= 8) & (n <= 11) & (p2 >= 0) & (p2 <= 22) & is_half
    if in_tab.any():
        idx_n = np.clip(n[in_tab] - 8, 0, 3)
        delta = _TABLE[idx_n, p2[in_tab]]
        out[in_tab] = avg[in_tab] + delta  # NaN delta stays NaN (fall-through)

    closed = ~((n >= 8) & (n <= 11))
    nz = closed & (n > 0)
    rs = np.asarray(rating_sum, dtype=np.float64)
    w = np.asarray(wins, dtype=np.float64)
    l = np.asarray(losses, dtype=np.float64)
    with np.errstate(invalid="ignore", divide="ignore"):
        vals = (rs + 400.0 * (w - l)) / np.where(n == 0, 1, n)
    # python round() = banker's rounding; np.round matches it on .5 ties
    out[nz] = np.round(vals[nz])
    out[closed & (n == 0)] = 0.0
    return out
