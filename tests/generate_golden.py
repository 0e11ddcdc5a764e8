"""Generate golden snapshot fixtures.

Reproduces the reference's golden-snapshot recipe exactly
(``/root/reference/tests/test_features/generate_golden_snapshots.py:24-36``):
seed-42, 600 bars, the same OHLCV construction — then pins this engine's
43-, 169- and 121-column outputs as .npy files.  Because the input recipe
and formulas match the reference, these snapshots are directly comparable
to the reference's own golden files (allclose; bit-for-bit up to
numba-vs-numpy instruction ordering).

Run once: python tests/generate_golden.py
"""

import os
import sys

import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from atr_adaptive_laguerre_spark.config import FeatureConfig  # noqa: E402
from atr_adaptive_laguerre_spark.kernel.batched import (  # noqa: E402
    core_loop_batched,
)
from atr_adaptive_laguerre_spark.kernel.expander_batched import (  # noqa: E402
    expand_batched,
)
from atr_adaptive_laguerre_spark.kernel.expander_ref import (  # noqa: E402
    FEATURE_COLUMNS,
)
from atr_adaptive_laguerre_spark.kernel.multi_interval_batched import (  # noqa: E402
    multi_interval_long,
)
from atr_adaptive_laguerre_spark.kernel.multi_interval_ref import (  # noqa: E402
    multi_interval_columns,
)

FIXTURES = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "fixtures")


def golden_ohlcv(n_bars: int = 600):
    """The reference's golden OHLCV recipe, bit-for-bit
    (generate_golden_snapshots.py:24-36)."""
    np.random.seed(42)
    base_price = 100 + np.cumsum(np.random.randn(n_bars) * 0.5)
    close = base_price
    open_ = close + np.random.randn(n_bars) * 0.3
    high = np.maximum(close, open_) + np.abs(np.random.randn(n_bars) * 0.2)
    low = np.minimum(close, open_) - np.abs(np.random.randn(n_bars) * 0.2)
    volume = np.random.randint(1000, 10000, n_bars)
    dates = pd.date_range("2024-01-01", periods=n_bars, freq="5min")
    return high, low, close, open_, volume, dates


def compute_single_43(h, l, c, cfg):
    core = core_loop_batched(h[None, :], l[None, :], c[None, :],
                             cfg.atr_period, cfg.adaptive_offset)
    core["close"] = np.asarray(c, dtype=np.float64)[None, :]
    feats = expand_batched(core, cfg)
    return np.column_stack([feats[col][0] for col in FEATURE_COLUMNS])


def compute_multi(h, l, c, cfg):
    cols = multi_interval_columns(cfg.filter_redundancy)
    out = multi_interval_long(h[None, :], l[None, :], c[None, :],
                              np.array([len(c)]), cfg)
    return np.column_stack([out[col] for col in cols]), cols


def main():
    os.makedirs(FIXTURES, exist_ok=True)
    h, l, c, *_ = golden_ohlcv()

    cfg43 = FeatureConfig.single_interval(atr_period=14)
    m43 = compute_single_43(h, l, c, cfg43)
    assert m43.shape == (600, 43), m43.shape
    np.save(os.path.join(FIXTURES, "golden_single_43.npy"), m43)
    np.save(os.path.join(FIXTURES, "golden_columns_43.npy"),
            np.array(FEATURE_COLUMNS))

    cfg169 = FeatureConfig.multi_interval(multiplier_1=3, multiplier_2=12,
                                          atr_period=14,
                                          filter_redundancy=False)
    m169, cols169 = compute_multi(h, l, c, cfg169)
    assert m169.shape == (600, 169), m169.shape
    np.save(os.path.join(FIXTURES, "golden_multi_169.npy"), m169)
    np.save(os.path.join(FIXTURES, "golden_columns_169.npy"),
            np.array(cols169))

    cfg121 = cfg169.with_(filter_redundancy=True)
    m121, cols121 = compute_multi(h, l, c, cfg121)
    assert m121.shape == (600, 121), m121.shape
    np.save(os.path.join(FIXTURES, "golden_multi_121.npy"), m121)
    np.save(os.path.join(FIXTURES, "golden_columns_121.npy"),
            np.array(cols121))
    print("golden snapshots written to", FIXTURES)


if __name__ == "__main__":
    main()
