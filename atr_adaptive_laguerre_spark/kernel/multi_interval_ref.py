"""Oracle implementation of the multi-interval 169/121-column pipeline.

Pandas per-entity implementation mirroring the reference flow
(``/root/reference/src/atr_adaptive_laguerre/features/atr_adaptive_rsi.py:
754-905`` and ``features/multi_interval.py``, ``features/cross_interval.py``):

1. core loop + 43-col expansion on the base grid;
2. resample to multiplier_1/multiplier_2 grains — positional tumbling
   windows of exactly ``m`` bars, incomplete trailing window dropped
   (the complete-window gate, ``multi_interval.py:210-217``; on an
   offset-aligned grid pandas' epoch-anchored ``resample`` bins reduce to
   ``offset // m``);
3. same expansion per resampled grain;
4. align to the base grid positionally: base row i takes resampled row
   ``min(i, n_resampled-1)`` — the reference's ``reindex(base_index,
   method='ffill')`` over RangeIndexes (``multi_interval.py:227-255``
   with ``_resample_ohlcv``'s ``reset_index``);
5. 40 cross-interval interaction columns (``cross_interval.py:35-441``);
6. optional redundancy filter: 169 -> 121.

Docs with fewer than ``m`` bars have no complete resampled window; the
reference's lookback gate rejects such inputs outright
(``atr_adaptive_rsi.py:812-824``) — this engine instead emits NaN for
their mult features (documented deviation; tested separately).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from atr_adaptive_laguerre_spark.config import FeatureConfig
from atr_adaptive_laguerre_spark.kernel.expander_ref import (
    FEATURE_COLUMNS, expand_features,
)
from atr_adaptive_laguerre_spark.kernel.redundancy import (
    REDUNDANT_FEATURES, filter_columns,
)
from atr_adaptive_laguerre_spark.kernel.reference_impl import core_loop

INTERACTION_COLUMNS = (
    # regime alignment (cross_interval.py:91-148)
    "all_intervals_bullish", "all_intervals_bearish", "all_intervals_neutral",
    "regime_agreement_count", "regime_majority", "regime_unanimity",
    # regime divergence (:150-213)
    "base_bull_higher_bear", "base_bear_higher_bull", "divergence_strength",
    "divergence_direction", "base_extreme_higher_neutral",
    "base_neutral_higher_extreme", "gradient_up", "gradient_down",
    # momentum (:215-257)
    "rsi_spread_base_mult1", "rsi_spread_base_mult2", "rsi_spread_mult1_mult2",
    "momentum_direction", "momentum_magnitude", "momentum_consistency",
    # crossings (:259-334)
    "any_interval_crossed_overbought", "all_intervals_crossed_overbought",
    "any_interval_crossed_oversold", "all_intervals_crossed_oversold",
    "base_crossed_while_higher_extreme", "cascade_crossing_up",
    "cascade_crossing_down", "higher_crossed_first",
    # temporal (:336-441)
    "regime_persistence_ratio", "regime_change_cascade",
    "regime_stability_score", "bars_since_alignment", "alignment_duration",
    "higher_interval_leads", "regime_transition_pattern",
    "mean_rsi_across_intervals", "std_rsi_across_intervals",
    "rsi_range_across_intervals", "rsi_skew_across_intervals",
    "interval_momentum_agreement",
)


def multi_interval_columns(filter_redundancy: bool = True) -> list[str]:
    cols = ([f"{c}_base" for c in FEATURE_COLUMNS]
            + [f"{c}_mult1" for c in FEATURE_COLUMNS]
            + [f"{c}_mult2" for c in FEATURE_COLUMNS]
            + list(INTERACTION_COLUMNS))
    return filter_columns(cols) if filter_redundancy else cols


def _resample(h, l, c, m):
    """Positional tumbling OHLC resample, complete windows only."""
    n = len(c) // m
    if n == 0:
        return None
    hh = h[: n * m].reshape(n, m).max(axis=1)
    ll = l[: n * m].reshape(n, m).min(axis=1)
    cc = c[: n * m].reshape(n, m)[:, -1]
    return hh, ll, cc


def _features_for(h, l, c, cfg) -> pd.DataFrame:
    core = core_loop(h, l, c, cfg.atr_period, cfg.adaptive_offset)
    return expand_features(core["rsi"], core, c, cfg)


def _align(feats: pd.DataFrame | None, n: int) -> pd.DataFrame:
    """Positional reindex+ffill onto the base RangeIndex."""
    if feats is None:
        return pd.DataFrame(np.nan, index=range(n), columns=FEATURE_COLUMNS)
    return feats.reindex(range(n), method="ffill")


def extract_interactions(base: pd.DataFrame, m1: pd.DataFrame,
                         m2: pd.DataFrame) -> pd.DataFrame:
    """40 cross-interval interactions (cross_interval.py:35-441)."""
    out = pd.DataFrame(index=base.index)
    rb, r1, r2 = base["regime"], m1["regime"], m2["regime"]
    ib, i1, i2 = base["rsi"], m1["rsi"], m2["rsi"]

    # alignment (:91-148)
    out["all_intervals_bullish"] = ((rb == 2) & (r1 == 2) & (r2 == 2)).astype(np.int64)
    out["all_intervals_bearish"] = ((rb == 0) & (r1 == 0) & (r2 == 0)).astype(np.int64)
    out["all_intervals_neutral"] = ((rb == 1) & (r1 == 1) & (r2 == 1)).astype(np.int64)
    bm1 = (rb == r1)
    bm2 = (rb == r2)
    m1m2 = (r1 == r2)
    all_same = bm1 & bm2
    any_pair = bm1 | bm2 | m1m2
    out["regime_agreement_count"] = np.where(
        all_same, 3, np.where(any_pair, 2, 1)).astype(np.int64)
    out["regime_majority"] = np.where(
        bm1, rb, np.where(bm2, rb, np.where(
            m1m2, r1, np.minimum(np.minimum(rb, r1), r2)))).astype(np.int64)
    out["regime_unanimity"] = all_same.astype(np.int64)

    # divergence (:150-213)
    out["base_bull_higher_bear"] = ((rb == 2) & ((r1 == 0) | (r2 == 0))).astype(np.int64)
    out["base_bear_higher_bull"] = ((rb == 0) & ((r1 == 2) | (r2 == 2))).astype(np.int64)
    out["divergence_strength"] = (
        np.maximum(np.maximum(ib, i1), i2) - np.minimum(np.minimum(ib, i1), i2))
    out["divergence_direction"] = np.sign(ib - i2).astype(np.int64)
    out["base_extreme_higher_neutral"] = (
        ((rb == 0) | (rb == 2)) & (r2 == 1)).astype(np.int64)
    out["base_neutral_higher_extreme"] = (
        (rb == 1) & ((r2 == 0) | (r2 == 2))).astype(np.int64)
    out["gradient_up"] = ((ib > i1) & (i1 > i2)).astype(np.int64)
    out["gradient_down"] = ((ib < i1) & (i1 < i2)).astype(np.int64)

    # momentum (:215-257)
    chb, ch1, ch2 = (base["rsi_change_1"], m1["rsi_change_1"],
                     m2["rsi_change_1"])
    out["rsi_spread_base_mult1"] = ib - i1
    out["rsi_spread_base_mult2"] = ib - i2
    out["rsi_spread_mult1_mult2"] = i1 - i2
    out["momentum_direction"] = np.sign(ib - i2).astype(np.int64)
    out["momentum_magnitude"] = np.abs(ib - i2)
    out["momentum_consistency"] = (np.sign(chb) == np.sign(ch2)).astype(np.int64)

    # crossings (:259-334)
    cob, co1, co2 = (base["cross_below_overbought"],
                     m1["cross_below_overbought"], m2["cross_below_overbought"])
    csb, cs1, cs2 = (base["cross_above_oversold"],
                     m1["cross_above_oversold"], m2["cross_above_oversold"])
    out["any_interval_crossed_overbought"] = (
        (cob == 1) | (co1 == 1) | (co2 == 1)).astype(np.int64)
    out["all_intervals_crossed_overbought"] = (
        (cob == 1) & (co1 == 1) & (co2 == 1)).astype(np.int64)
    out["any_interval_crossed_oversold"] = (
        (csb == 1) | (cs1 == 1) | (cs2 == 1)).astype(np.int64)
    out["all_intervals_crossed_oversold"] = (
        (csb == 1) & (cs1 == 1) & (cs2 == 1)).astype(np.int64)
    out["base_crossed_while_higher_extreme"] = (
        (csb == 1) & (r2.isin([0, 2]))).astype(np.int64)
    out["cascade_crossing_up"] = (
        (cs2.shift(2) == 1) & (cs1.shift(1) == 1) & (csb == 1)).astype(np.int64)
    out["cascade_crossing_down"] = (
        (co2.shift(2) == 1) & (co1.shift(1) == 1) & (cob == 1)).astype(np.int64)
    m2_recent = cs2.rolling(10, min_periods=1).sum().shift(1).fillna(0)
    out["higher_crossed_first"] = ((csb == 1) & (m2_recent > 0)).astype(np.int64)

    # temporal (:336-441)
    bib, bi2 = base["bars_in_regime"], m2["bars_in_regime"]
    rcb, rc1, rc2 = (base["regime_changed"], m1["regime_changed"],
                     m2["regime_changed"])
    out["regime_persistence_ratio"] = bib / bi2.replace(0, 1)
    rc2_recent = rc2.rolling(5, min_periods=1).sum().shift(1).fillna(0)
    out["regime_change_cascade"] = ((rcb == 1) & (rc2_recent > 0)).astype(np.int64)
    out["regime_stability_score"] = 1 - (rcb + rc1 + rc2) / 3
    unanimity = (rb == r1) & (r1 == r2)
    not_u = (~unanimity).astype(np.int64)
    out["bars_since_alignment"] = (
        not_u.groupby(unanimity.cumsum()).cumsum().astype(np.int64))
    out["alignment_duration"] = (
        unanimity.astype(np.int64).groupby(not_u.cumsum()).cumsum()
        .astype(np.int64))
    out["higher_interval_leads"] = ((rcb == 1) & (rc2_recent > 0)).astype(np.int64)
    out["regime_transition_pattern"] = (rcb * 4 + rc1 * 2 + rc2).astype(np.int64)
    stack = np.column_stack([ib.values, i1.values, i2.values])
    mean_rsi = stack.mean(axis=1)
    std_rsi = stack.std(axis=1, ddof=1)
    out["mean_rsi_across_intervals"] = mean_rsi
    out["std_rsi_across_intervals"] = std_rsi
    out["rsi_range_across_intervals"] = stack.max(axis=1) - stack.min(axis=1)
    out["rsi_skew_across_intervals"] = (
        (ib.values - mean_rsi) / np.where(std_rsi == 0, 1, std_rsi))
    out["interval_momentum_agreement"] = (
        (chb > 0).astype(int) + (ch1 > 0).astype(int) + (ch2 > 0).astype(int)
    ).astype(np.int64)

    assert list(out.columns) == list(INTERACTION_COLUMNS)
    return out


def _align_availability(feats: pd.DataFrame | None, avail: np.ndarray,
                        m: int, n: int) -> pd.DataFrame:
    """Strict point-in-time alignment (reference A2 semantics,
    ``atr_adaptive_rsi.py:999-1043``): resampled bar j becomes available at
    the availability of its *last* constituent base bar; base row i maps to
    the last bar with availability strictly below the row's own
    (``searchsorted(..., side='left') - 1``; the v1.0.4->v1.0.5 strictness
    fix), clamped into range (so pre-warm-up rows reuse bar 0 — the
    reference's effective ffill/bfill, ``:1012,1020-1021,1045-1049``)."""
    if feats is None:
        return pd.DataFrame(np.nan, index=range(n), columns=FEATURE_COLUMNS)
    n_m = len(feats)
    avail_m = avail[np.arange(1, n_m + 1) * m - 1]
    idx = np.searchsorted(avail_m, avail[:n], side="left") - 1
    idx = np.clip(idx, 0, n_m - 1)
    return feats.iloc[idx].reset_index(drop=True)


def multi_interval_features(h, l, c, cfg: FeatureConfig,
                            avail: np.ndarray | None = None) -> pd.DataFrame:
    """Full per-entity 169/121-column pipeline (oracle).

    With ``avail`` (monotonic availability timestamps per row), higher-
    grain features are aligned by the strict as-of rule instead of
    positionally (reference ``_fit_transform_features_with_availability``).
    """
    assert cfg.is_multi_interval
    n = len(c)
    base = _features_for(h, l, c, cfg)

    def grain(m):
        r = _resample(np.asarray(h, dtype=np.float64),
                      np.asarray(l, dtype=np.float64),
                      np.asarray(c, dtype=np.float64), m)
        if r is None:
            return None
        return _features_for(*r, cfg)

    if avail is None:
        a1 = _align(grain(cfg.multiplier_1), n)
        a2 = _align(grain(cfg.multiplier_2), n)
    else:
        avail = np.asarray(avail, dtype=np.float64)
        a1 = _align_availability(grain(cfg.multiplier_1), avail,
                                 cfg.multiplier_1, n)
        a2 = _align_availability(grain(cfg.multiplier_2), avail,
                                 cfg.multiplier_2, n)

    inter = extract_interactions(base, a1, a2)
    all_f = pd.concat([base.add_suffix("_base"), a1.add_suffix("_mult1"),
                       a2.add_suffix("_mult2"), inter], axis=1)
    if cfg.filter_redundancy:
        all_f = all_f.drop(columns=[f for f in REDUNDANT_FEATURES
                                    if f in all_f.columns])
    return all_f
