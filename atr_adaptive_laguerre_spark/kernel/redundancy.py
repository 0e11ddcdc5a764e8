"""Redundancy filter: the fixed 48-name drop list.

Spec constants from the reference's IC/correlation analysis
(``/root/reference/src/atr_adaptive_laguerre/features/redundancy_filter.py:52-101``):
feature names with |rho| > 0.9 against a retained feature, or constant on
typical datasets.  169 columns -> 121 after dropping.
"""

from __future__ import annotations

REDUNDANT_FEATURES: tuple[str, ...] = (
    "all_intervals_bearish",
    "all_intervals_crossed_overbought",
    "all_intervals_crossed_oversold",
    "all_intervals_neutral",
    "cascade_crossing_up",
    "gradient_up",
    "bars_since_overbought_mult1",
    "bars_since_oversold_mult2",
    "cascade_crossing_down",
    "cross_above_oversold_mult2",
    "dist_midline_base",
    "dist_midline_mult1",
    "dist_midline_mult2",
    "dist_overbought_base",
    "dist_overbought_mult1",
    "dist_overbought_mult2",
    "dist_oversold_base",
    "dist_oversold_mult1",
    "dist_oversold_mult2",
    "higher_crossed_first",
    "momentum_direction",
    "regime_base",
    "regime_bullish_mult1",
    "regime_change_cascade",
    "regime_changed_base",
    "regime_changed_mult2",
    "regime_mult1",
    "regime_neutral_base",
    "regime_neutral_mult1",
    "regime_persistence_ratio",
    "regime_strength_base",
    "regime_strength_mult1",
    "regime_strength_mult2",
    "regime_transition_pattern",
    "regime_unanimity",
    "rsi_base",
    "rsi_mult1",
    "rsi_mult2",
    "rsi_percentile_20_mult1",
    "rsi_range_across_intervals",
    "rsi_skew_across_intervals",
    "rsi_spread_base_mult2",
    "rsi_spread_mult1_mult2",
    "rsi_velocity_base",
    "rsi_velocity_mult1",
    "rsi_volatility_20_base",
    "rsi_zscore_20_base",
    "rsi_zscore_20_mult1",
)

assert len(REDUNDANT_FEATURES) == 48


def filter_columns(columns: list[str]) -> list[str]:
    """Column list after the redundancy drop."""
    drop = set(REDUNDANT_FEATURES)
    return [c for c in columns if c not in drop]
