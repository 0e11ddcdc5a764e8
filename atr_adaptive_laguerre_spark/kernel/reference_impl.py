"""Oracle implementation of the core recurrence (C1-C8).

A deliberately simple, loop-per-bar implementation of the ATR-Adaptive
Laguerre RSI pipeline, mirroring the semantics of the reference's fused
kernel (``/root/reference/src/atr_adaptive_laguerre/core/_numba_kernel.py:14-166``)
and its stateful classes:

* True Range      — ``core/true_range.py:22-52``
* ATR + min/max   — ``core/atr.py:31-93`` (simple rolling mean of TR with
  warm-up denominator ``min(bars_seen, period)``; min/max over the means of
  the k most-recent TRs for k = 1..min(bars_seen, period); for the first
  bar min = max = atr)
* adaptive coeff  — ``core/adaptive.py:4-44``
  (``_max = max(max_atr, atr)``, ``_min = min(min_atr, atr)``; 0.5 when
  degenerate, else ``1 - (atr - _min) / (_max - _min)``)
* adaptive period — ``core/adaptive.py:47-69``: ``atr_period * (coeff + offset)``
* gamma           — ``core/laguerre_filter.py:89-106``: ``1 - 10 / (period + 9)``
* Laguerre cascade— ``core/laguerre_filter.py:37-70`` with time-varying gamma.
  NOTE: the production path (the numba kernel invoked at
  ``features/atr_adaptive_rsi.py:430-438``) starts the cascade from
  L0=L1=L2=L3=0.0 and applies the update recurrence on the first bar too
  (no ``initialize(price)`` special case) — the golden snapshots pin that
  behavior, so we replicate it.
* Laguerre RSI    — ``core/laguerre_rsi.py:4-54``: CU/(CU+CD), 0.0 when flat.

This module is the single-entity ground truth; the distributed engine's
batched kernel is tested against it (exact float64 equality where the
operation order matches, allclose 1e-12 elsewhere).
"""

from __future__ import annotations

import numpy as np

#: Names/order of the 10 output series (rsi + 9 intermediates + close
#: carried for downstream features), matching the reference's
#: ``IntermediateValues`` (``features/intermediates.py:14-42``).
CORE_OUTPUTS = (
    "rsi", "adaptive_coeff", "gamma", "L0", "L1", "L2", "L3",
    "min_atr", "max_atr", "atr",
)


def core_loop(high: np.ndarray, low: np.ndarray, close: np.ndarray,
              atr_period: int, adaptive_offset: float = 0.75,
              ) -> dict[str, np.ndarray]:
    """Run the fused recurrence over one entity's bars, oldest first.

    Returns a dict of float64 arrays keyed by :data:`CORE_OUTPUTS`.
    """
    high = np.asarray(high, dtype=np.float64)
    low = np.asarray(low, dtype=np.float64)
    close = np.asarray(close, dtype=np.float64)
    n = high.shape[0]
    base_period = float(atr_period)

    out = {k: np.empty(n, dtype=np.float64) for k in CORE_OUTPUTS}

    prev_close = 0.0
    tr_hist: list[float] = []      # full TR history; we slice the tail
    tr_sum = 0.0
    fL0 = fL1 = fL2 = fL3 = 0.0

    for i in range(n):
        h, lo, c = high[i], low[i], close[i]

        # C1 true range
        if i == 0:
            tr = h - lo
        else:
            hv = h if h > prev_close else prev_close
            lv = lo if lo < prev_close else prev_close
            tr = hv - lv
        prev_close = c

        # C2 ATR: rolling mean with warm-up denominator min(seen, period)
        tr_hist.append(tr)
        if len(tr_hist) > atr_period:
            tr_sum = tr_sum + tr - tr_hist[-atr_period - 1]
        else:
            tr_sum += tr
        buf_len = min(len(tr_hist), atr_period)
        atr = tr_sum / buf_len

        # C3 min/max over suffix means (k most recent TRs, k=1..buf_len)
        if buf_len < 2:
            min_atr = max_atr = atr
        else:
            running = 0.0
            min_atr, max_atr = np.inf, -np.inf
            for k in range(1, buf_len + 1):
                running += tr_hist[-k]
                atr_k = running / k
                if atr_k < min_atr:
                    min_atr = atr_k
                if atr_k > max_atr:
                    max_atr = atr_k

        # C4 adaptive coefficient
        _max = max_atr if max_atr > atr else atr
        _min = min_atr if min_atr < atr else atr
        coeff = 0.5 if _min == _max else 1.0 - (atr - _min) / (_max - _min)

        # C5 adaptive period & gamma
        period = base_period * (coeff + adaptive_offset)
        gamma = 1.0 - 10.0 / (period + 9.0)

        # C6 Laguerre cascade (time-varying gamma, zero-initialized state)
        p0, p1, p2 = fL0, fL1, fL2
        fL0 = c + gamma * (fL0 - c)
        fL1 = p0 + gamma * (fL1 - fL0)
        fL2 = p1 + gamma * (fL2 - fL1)
        fL3 = p2 + gamma * (fL3 - fL2)

        # C7 Laguerre RSI
        cu = cd = 0.0
        if fL0 >= fL1:
            cu += fL0 - fL1
        else:
            cd += fL1 - fL0
        if fL1 >= fL2:
            cu += fL1 - fL2
        else:
            cd += fL2 - fL1
        if fL2 >= fL3:
            cu += fL2 - fL3
        else:
            cd += fL3 - fL2
        tot = cu + cd
        rsi = 0.0 if tot == 0.0 else cu / tot

        out["rsi"][i] = rsi
        out["adaptive_coeff"][i] = coeff
        out["gamma"][i] = gamma
        out["L0"][i] = fL0
        out["L1"][i] = fL1
        out["L2"][i] = fL2
        out["L3"][i] = fL3
        out["min_atr"][i] = min_atr
        out["max_atr"][i] = max_atr
        out["atr"][i] = atr

    return out


def rolling_percentile(values: np.ndarray, window: int) -> np.ndarray:
    """Percent of strictly-smaller values among the previous ``window-1``
    bars, with denominator including the current bar.

    Mirrors ``core/_numba_kernel.py:169-202``
    (``gt_count / count * 100`` with ``count = i - max(0, i-window+1) + 1``
    and ``gt_count`` counted over ``j in [start, i)``).
    """
    values = np.asarray(values, dtype=np.float64)
    n = values.shape[0]
    out = np.empty(n, dtype=np.float64)
    for i in range(n):
        start = max(0, i - window + 1)
        count = i - start + 1
        gt = 0
        for j in range(start, i):
            if values[i] > values[j]:
                gt += 1
        out[i] = gt / count * 100.0
    return out


def ewm_mean(values: np.ndarray, span: int) -> np.ndarray:
    """EWM mean with ``adjust=False`` pandas semantics: ``y[0] = x[0]``,
    ``y[i] = alpha*x[i] + (1-alpha)*y[i-1]``, ``alpha = 2/(span+1)``.

    Used for ``rsi_velocity`` (reference ``feature_expander.py:329``).
    """
    values = np.asarray(values, dtype=np.float64)
    n = values.shape[0]
    out = np.empty(n, dtype=np.float64)
    if n == 0:
        return out
    alpha = 2.0 / (span + 1.0)
    y = values[0]
    out[0] = y
    for i in range(1, n):
        y = alpha * values[i] + (1.0 - alpha) * y
        out[i] = y
    return out
