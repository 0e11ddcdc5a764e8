"""Oracle implementation of the 43-column feature expansion.

Pandas-idiom implementation mirroring the reference's
``FeatureExpander.expand`` (``/root/reference/src/atr_adaptive_laguerre/
features/feature_expander.py:83-607``): 31 RSI-derived features plus 12
intermediate-based features.  Used as the ground truth for the batched
NumPy expander (``expander_batched``), which shares no rolling/ewm code
with pandas.

Column order matches the reference exactly (golden snapshot order,
``feature_expander.py:134-151``).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from atr_adaptive_laguerre_spark.config import FeatureConfig
from atr_adaptive_laguerre_spark.kernel.reference_impl import rolling_percentile

#: the 43 output columns, in reference order
FEATURE_COLUMNS = (
    # base + regimes (feature_expander.py:157-216)
    "rsi", "regime", "regime_bearish", "regime_neutral", "regime_bullish",
    "regime_changed", "bars_in_regime", "regime_strength",
    # thresholds (:218-240)
    "dist_overbought", "dist_oversold", "dist_midline",
    "abs_dist_overbought", "abs_dist_oversold",
    # crossings (:242-275)
    "cross_above_oversold", "cross_below_overbought",
    "cross_above_midline", "cross_below_midline",
    # temporal (:277-311)
    "bars_since_oversold", "bars_since_overbought", "bars_since_extreme",
    # rate of change (:313-337)
    "rsi_change_1", "rsi_change_5", "rsi_velocity",
    # rolling statistics (:339-383)
    "rsi_percentile_20", "rsi_zscore_20", "rsi_volatility_20", "rsi_range_20",
    # tail risk (:385-454)
    "rsi_shock_1bar", "extreme_regime_persistence", "rsi_volatility_spike",
    "tail_risk_score",
    # adaptive (:458-483)
    "adaptive_coeff", "adaptive_coeff_roc_1", "gamma_value", "gamma_spread",
    # laguerre stages (:485-523)
    "laguerre_spread", "laguerre_mid_convergence", "laguerre_slope",
    # atr range (:525-538)
    "atr_range_width",
    # efficiency (:540-569)
    "efficiency_ratio", "efficiency_trend",
    # cycle phase (:571-607)
    "cycle_phase", "cycle_phase_changed",
)

INT_COLUMNS = frozenset({
    "regime", "regime_bearish", "regime_neutral", "regime_bullish",
    "regime_changed", "bars_in_regime",
    "cross_above_oversold", "cross_below_overbought",
    "cross_above_midline", "cross_below_midline",
    "bars_since_oversold", "bars_since_overbought", "bars_since_extreme",
    "rsi_shock_1bar", "extreme_regime_persistence", "rsi_volatility_spike",
    "efficiency_trend", "cycle_phase", "cycle_phase_changed",
})


def expand_features(rsi: np.ndarray, inter: dict[str, np.ndarray],
                    close: np.ndarray,
                    cfg: FeatureConfig | None = None) -> pd.DataFrame:
    """Expand one entity's rsi + intermediates into the 43-column frame."""
    cfg = cfg or FeatureConfig()
    up, down = cfg.level_up, cfg.level_down
    sw, vspan = cfg.stats_window, cfg.velocity_span

    r = pd.Series(np.asarray(rsi, dtype=np.float64))
    n = len(r)
    out = pd.DataFrame(index=r.index)
    out["rsi"] = r

    # --- regimes (feature_expander.py:157-216) ---
    regime = pd.Series(np.int64(1), index=r.index)
    regime[r < down] = 0
    regime[r > up] = 2
    out["regime"] = regime
    out["regime_bearish"] = (regime == 0).astype(np.int64)
    out["regime_neutral"] = (regime == 1).astype(np.int64)
    out["regime_bullish"] = (regime == 2).astype(np.int64)
    out["regime_changed"] = (
        regime != regime.shift(1).fillna(regime.iloc[0])).astype(np.int64)
    g = (regime != regime.shift(1)).cumsum()
    out["bars_in_regime"] = (g.groupby(g).cumcount() + 1).astype(np.int64)
    out["regime_strength"] = np.where(
        regime == 0, np.maximum(down - r.values, 0),
        np.where(regime == 2, np.maximum(r.values - up, 0), 0.0))

    # --- thresholds (:218-240) ---
    out["dist_overbought"] = r - up
    out["dist_oversold"] = r - down
    out["dist_midline"] = r - 0.5
    out["abs_dist_overbought"] = np.abs(r - up)
    out["abs_dist_oversold"] = np.abs(r - down)

    # --- crossings (:242-275) ---
    prev = r.shift(1).fillna(r.iloc[0])
    out["cross_above_oversold"] = ((prev <= down) & (r > down)).astype(np.int64)
    out["cross_below_overbought"] = ((prev >= up) & (r < up)).astype(np.int64)
    out["cross_above_midline"] = ((prev <= 0.5) & (r > 0.5)).astype(np.int64)
    out["cross_below_midline"] = ((prev >= 0.5) & (r < 0.5)).astype(np.int64)

    # --- temporal (:277-311) ---
    is_os = r < down
    is_ob = r > up
    not_os = (~is_os).astype(np.int64)
    out["bars_since_oversold"] = (
        not_os.groupby(is_os.cumsum()).cumsum().astype(np.int64))
    not_ob = (~is_ob).astype(np.int64)
    out["bars_since_overbought"] = (
        not_ob.groupby(is_ob.cumsum()).cumsum().astype(np.int64))
    out["bars_since_extreme"] = np.minimum(
        out["bars_since_oversold"], out["bars_since_overbought"])

    # --- rate of change (:313-337) ---
    ch1 = r - prev
    out["rsi_change_1"] = ch1
    out["rsi_change_5"] = r - r.shift(5).fillna(r.iloc[0])
    out["rsi_velocity"] = ch1.ewm(span=vspan, adjust=False).mean()

    # --- rolling statistics (:339-383) ---
    roll = r.rolling(window=sw, min_periods=1)
    rmean = roll.mean()
    rstd = roll.std().fillna(0)
    out["rsi_percentile_20"] = rolling_percentile(r.values, sw)
    out["rsi_zscore_20"] = (r - rmean) / rstd.replace(0, 1)
    out["rsi_volatility_20"] = rstd
    out["rsi_range_20"] = roll.max() - roll.min()

    # --- tail risk (:385-454) ---
    out["rsi_shock_1bar"] = (np.abs(ch1) > 0.3).astype(np.int64)
    out["extreme_regime_persistence"] = (
        (regime != 1) & (out["bars_in_regime"] > 10)).astype(np.int64)
    vroll = rstd.rolling(window=100, min_periods=20)
    vmean = vroll.mean()
    vstd = vroll.std().fillna(0)
    out["rsi_volatility_spike"] = (rstd > (vmean + 2 * vstd)).astype(np.int64)
    out["tail_risk_score"] = (
        out["rsi_shock_1bar"] * 0.4
        + out["extreme_regime_persistence"] * 0.3
        + out["rsi_volatility_spike"] * 0.3).clip(0, 1)

    # --- adaptive features (:458-483) ---
    coeff = pd.Series(np.asarray(inter["adaptive_coeff"], dtype=np.float64))
    gamma = pd.Series(np.asarray(inter["gamma"], dtype=np.float64))
    out["adaptive_coeff"] = coeff
    out["adaptive_coeff_roc_1"] = coeff - coeff.shift(1).fillna(coeff.iloc[0])
    out["gamma_value"] = gamma
    out["gamma_spread"] = gamma - gamma.rolling(sw, min_periods=1).mean()

    # --- laguerre stage features (:485-523) ---
    L0, L1 = inter["L0"], inter["L1"]
    L2, L3 = inter["L2"], inter["L3"]
    eps = 1e-10
    out["laguerre_spread"] = (L0 - L3) / (np.abs(L0) + np.abs(L3) + eps)
    out["laguerre_mid_convergence"] = (
        np.abs(L1 - L2) / (np.abs(L0 - L1) + np.abs(L2 - L3) + eps))
    L0s = pd.Series(np.asarray(L0, dtype=np.float64))
    L0d = L0s - L0s.shift(1).fillna(L0s.iloc[0])
    L0std = L0d.rolling(sw, min_periods=1).std().fillna(0).replace(0, 1)
    out["laguerre_slope"] = (L0d / L0std).values

    # --- atr range width (:525-538) ---
    out["atr_range_width"] = (
        (inter["max_atr"] - inter["min_atr"]) / (inter["max_atr"] + eps))

    # --- efficiency (:540-569) ---
    c = pd.Series(np.asarray(close, dtype=np.float64))
    direction = np.abs(c - c.shift(sw).fillna(c.iloc[0]))
    abs_ch = np.abs(c - c.shift(1).fillna(c.iloc[0]))
    vol = abs_ch.rolling(sw, min_periods=1).sum()
    er = (direction / vol.replace(0, 1)).clip(0, 1)
    out["efficiency_ratio"] = er.values
    out["efficiency_trend"] = (er > 0.5).astype(np.int64).values

    # --- cycle phase (:571-607) ---
    g01 = np.asarray(L0) > np.asarray(L1)
    g23 = np.asarray(L2) > np.asarray(L3)
    phase = np.where(~g01 & ~g23, 0,
                     np.where(g01 & ~g23, 1, np.where(g01 & g23, 2, 3)))
    ps = pd.Series(phase)
    out["cycle_phase"] = phase
    out["cycle_phase_changed"] = (
        ps != ps.shift(1).fillna(ps.iloc[0])).astype(np.int64).values

    assert list(out.columns) == list(FEATURE_COLUMNS), list(out.columns)
    return out
